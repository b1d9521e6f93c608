package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

/** Specs for the model-evaluation band: each metric is re-derived by an
  * independent brute-force formula over the collected sf0.001 fixture and
  * must match the distributed query EXACTLY (both sides are one IEEE
  * division of the same exact integers, so == on doubles is the correct
  * assertion, not a tolerance).
  */
class EvalOpsSpec extends AnyFunSuite with SparkTestBase {

  test("auc_event_scores equals the O(n²) pairwise Mann–Whitney brute force") {
    val rows = Tables.events(spark, sf0001)
      .select(col("event_type"), expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = EvalOps.aucEventScores(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val types = rows.map(_._1).distinct.sorted
    assert(out.keySet == types.toSet)
    for (t <- types) {
      val pos = rows.filter(_._1 == t).map(_._2)
      val neg = rows.filter(_._1 != t).map(_._2)
      var gt = 0L; var eq = 0L
      for (p <- pos; n <- neg) { if (p > n) gt += 1 else if (p == n) eq += 1 }
      val (nPos, nNeg, auc) = out(t)
      assert(nPos == pos.length.toLong && nNeg == neg.length.toLong)
      // same exact-integer numerator/denominator → bit-identical double
      assert(auc == (2 * gt + eq).toDouble / (2L * pos.length * neg.length).toDouble)
      assert(auc >= 0.0 && auc <= 1.0)
    }
  }

  test("calibration_bins partitions all events; rates and means are exact and in-bin") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = EvalOps.calibrationBins(spark, sf0001).collect()
    assert(out.map(_.getLong(1)).sum == ev.length.toLong) // exhaustive partition
    out.foreach { r =>
      val (bin, n, nPos) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val members = ev.filter(e => math.min(e._2 / 5000, 9L) == bin)
      assert(n == members.length.toLong)
      assert(nPos == members.count(_._1 == "purchase").toLong)
      assert(r.getDouble(3) == members.map(_._2).sum.toDouble / (n * 50000L).toDouble)
      assert(r.getDouble(4) == nPos.toDouble / n.toDouble)
      // mean predicted probability lies inside the bin's [lo, hi) range
      // (top bin is clamped open-ended)
      assert(r.getDouble(3) >= bin * 0.1 && (bin == 9L || r.getDouble(3) < (bin + 1) * 0.1))
    }
  }

  test("cohens_kappa_lang matches the cleared-fraction formula on the confusion matrix") {
    val conf = TextAnalysisOps.langIdConfusion(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val n = conf.map(_._2).sum
    val agree = conf.filter { case ((a, b), _) => a == b }.map(_._2).sum
    val rowM = conf.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val colM = conf.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val sumRc = rowM.map { case (k, a) => a * colM.getOrElse(k, 0L) }.sum
    val out = EvalOps.cohensKappaLang(spark, sf0001).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == n && out(0).getLong(1) == agree)
    val kappa = out(0).getDouble(2)
    assert(kappa == (n * agree - sumRc).toDouble / (n * n - sumRc).toDouble)
    assert(kappa <= 1.0 && kappa >= -1.0)
  }

  test("calibration_ece: telescoped sum equals the per-bin weighted brute force; ece <= mce") {
    val bins = EvalOps.calibrationBins(spark, sf0001).collect()
    val out = EvalOps.calibrationEce(spark, sf0001).collect()
    assert(out.length == 1)
    val n = bins.map(_.getLong(1)).sum
    assert(out(0).getLong(0) == n && out(0).getLong(1) == bins.length.toLong)
    // recompute the exact-integer numerator from the (independently
    // verified) bins table: Σ|50000·pos_b − Σcents_b|
    val devs = bins.map { b =>
      // sum_c is not surfaced by calibration_bins; recover it exactly from
      // mean_pred = sum_c / (n_b·50000), which is a lossless division here
      // (sum_c ≤ 2^53) — multiply back and round to kill the one ulp
      val sumC = math.round(b.getDouble(3) * b.getLong(1) * 50000L)
      math.abs(50000L * b.getLong(2) - sumC)
    }
    assert(out(0).getDouble(2) == devs.sum.toDouble / (50000L * n).toDouble)
    assert(out(0).getDouble(3) >= out(0).getDouble(2)) // max ≥ weighted mean
    assert(out(0).getDouble(2) >= 0.0 && out(0).getDouble(3) <= 1.0)
  }

  test("confusion_prf_lang: exact per-class report consistent with the confusion matrix") {
    val conf = TextAnalysisOps.langIdConfusion(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val out = EvalOps.confusionPrfLang(spark, sf0001).collect()
    assert(out.map(_.getString(0)).toSeq == conf.map(_._1._1).distinct.sorted.toSeq)
    out.foreach { r =>
      val k = r.getString(0)
      val tp = conf.collectFirst { case ((a, b), n) if a == k && b == k => n }.getOrElse(0L)
      val nTrue = conf.filter(_._1._1 == k).map(_._2).sum
      val nPred = conf.filter(_._1._2 == k).map(_._2).sum
      assert(r.getLong(1) == tp && r.getLong(2) == nTrue && r.getLong(3) == nPred)
      if (nPred == 0L) assert(r.isNullAt(4))
      else assert(r.getDouble(4) == tp.toDouble / nPred.toDouble)
      assert(r.getDouble(5) == tp.toDouble / nTrue.toDouble)
      assert(r.getDouble(6) == (2L * tp).toDouble / (nTrue + nPred).toDouble)
    }
  }

  test("rank_eval_bm25 matches a collected-corpus brute force of MRR/recall/NDCG") {
    val terms = Map(
      1L -> Set("scan", "filter", "fast"),
      2L -> Set("join", "key", "merge"),
      3L -> Set("stream", "window", "batch"))
    val wts = Map(1L -> 1000000L, 2L -> 630930L, 3L -> 500000L, 4L -> 430677L,
      5L -> 386853L, 6L -> 356207L, 7L -> 333333L, 8L -> 315465L,
      9L -> 301030L, 10L -> 289065L)
    val docs = Tables.documents(spark, sf0001).filter(col("lang") === "en")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSet))
    // ranked lists come from bm25Topk, which is independently oracled
    val ranked = TextAnalysisOps.bm25Topk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = EvalOps.rankEvalBm25(spark, sf0001).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    out.foreach { r =>
      val qid = r.getLong(0)
      val rel = docs.map { case (id, toks) => id -> terms(qid).count(toks).toLong }
        .filter(_._2 > 0L).toMap
      val top = ranked.filter(_._1 == qid).sortBy(_._2).map(_._3)
      assert(top.length == 10)
      val hits = top.count(d => rel.getOrElse(d, 0L) >= 2L).toLong
      val nRel = rel.count(_._2 >= 2L).toLong
      val firstRel = top.zipWithIndex.collectFirst {
        case (d, i) if rel.getOrElse(d, 0L) >= 2L => i + 1L }
      val dcg = top.zipWithIndex.map { case (d, i) =>
        rel.getOrElse(d, 0L) * wts(i + 1L) }.sum
      val idcg = rel.toSeq.sortBy { case (id, g) => (-g, id) }.take(10)
        .zipWithIndex.map { case ((_, g), i) => g * wts(i + 1L) }.sum
      assert(r.getLong(1) == hits && r.getLong(2) == nRel)
      assert(r.getDouble(3) == firstRel.map(1.0 / _.toDouble).getOrElse(0.0))
      assert(r.getDouble(4) == hits.toDouble / nRel.toDouble)
      assert(r.getLong(5) == dcg && r.getLong(6) == idcg)
      assert(r.getDouble(7) == dcg.toDouble / idcg.toDouble)
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
    }
  }

  test("gini_revenue_segments equals the mean-absolute-difference identity") {
    // independent identity: G = Σᵢⱼ|xᵢ−xⱼ| / (2·n·Σx) — no ranks involved
    val rev = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("o_custkey").agg(sum("c").as("x"))
      .join(Tables.customer(spark, sf0001).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "x").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val out = EvalOps.giniRevenueSegments(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val xs = rev.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(1) == xs.length.toLong)
      assert(r.getLong(2) == xs.sum)
      var mad = BigInt(0)
      for (a <- xs; b <- xs) mad += (BigInt(a) - BigInt(b)).abs
      // pairwise identity: Σᵢⱼ|xᵢ−xⱼ| = 2·(2Σ i·x₍ᵢ₎ − (n+1)Σx), so
      // mad/2 is EXACTLY the query's rank-sum numerator and the division
      // below is the same one-IEEE-division of the same exact integers —
      // bit-identical doubles, no tolerance needed
      val n = BigInt(xs.length); val sx = BigInt(xs.sum)
      assert(mad % 2 == BigInt(0))
      assert(r.getDouble(3) == (mad / 2).toDouble / (n * sx).toDouble)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
    }
  }
}
