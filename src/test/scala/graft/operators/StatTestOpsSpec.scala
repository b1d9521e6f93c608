package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

/** Specs for the k-sample / association-strength band. Brute forces
  * replicate not just the math but the engine's FLOAT OPERATION ORDER
  * (fixed five-term chain for Kruskal–Wallis, (lang, source)-ordered
  * left fold for Cramér's V²), so == on doubles is exact — the
  * MiningOpsSpec policy extended to multi-step IEEE expressions.
  */
class StatTestOpsSpec extends AnyFunSuite with SparkTestBase {

  private val types = Seq("click", "error", "purchase", "signup", "view")

  private lazy val eventRows: Array[(Long, String, Long)] =
    Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("kruskal_wallis_value: 2x-midrank H equals the textbook statistic, ties corrected") {
    val byVal = eventRows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val sortedVals = byVal.keys.toSeq.sorted
    // 2x average rank per distinct value: cum_prev + 1 + cum
    var cum = 0L
    val ar2 = sortedVals.map { v =>
      val cnt = byVal(v); val prev = cum; cum += cnt
      v -> (prev + 1 + cum)
    }.toMap
    val n = eventRows.length.toLong
    val r2 = types.map(t =>
      t -> eventRows.filter(_._2 == t).map(r => ar2(r._3)).sum).toMap
    val nT = types.map(t => t -> eventRows.count(_._2 == t).toLong).toMap
    val tieSum = byVal.values.map(c => c * c * c - c).sum
    val sumTerm = types.map(t =>
      r2(t).toDouble * r2(t).toDouble / (4.0 * nT(t).toDouble))
      .reduceLeft(_ + _)
    val h = (12.0 / (n.toDouble * (n.toDouble + 1.0))) * sumTerm -
      3.0 * (n.toDouble + 1.0)
    val corr = 1.0 - tieSum.toDouble /
      (n.toDouble * n.toDouble * n.toDouble - n.toDouble)
    val r = StatTestOps.kruskalWallisValue(spark, sf0001).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == 5L && r.getLong(2) == tieSum)
    assert(r.getDouble(3) == h)
    assert(r.getDouble(4) == h / corr)
    assert(h > 0.0) // the five types do differ in value distribution
  }

  test("odds_ratio_ab: 2x2 cells and ratios match the brute force") {
    val conv = eventRows.groupBy(_._1).view.mapValues(rs =>
      if (rs.exists(r => r._2 == "purchase" && r._3 >= 9000L)) 1L else 0L).toMap
    def cell(arm: Long, c: Long): Long =
      conv.count { case (u, cv) => u % 2 == arm && cv == c }.toLong
    val (a, b, c, d) = (cell(1, 1), cell(1, 0), cell(0, 1), cell(0, 0))
    val r = StatTestOps.oddsRatioAb(spark, sf0001).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((a, b, c, d)))
    if (b * c == 0) assert(r.isNullAt(4))
    else assert(r.getDouble(4) == (a * d).toDouble / (b * c).toDouble)
    if (c * (a + b) == 0) assert(r.isNullAt(5))
    else assert(r.getDouble(5) == (a * (c + d)).toDouble / (c * (a + b)).toDouble)
  }

  test("cramers_v2_lang_source: ordered-fold chi2 and V2 match the brute force") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("lang"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val rTot = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cTot = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val obs = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // left fold in (lang, source) order — the engine's addition chain
    var chi2 = 0.0
    for (l <- rTot.keys.toSeq.sorted; s <- cTot.keys.toSeq.sorted) {
      val o = obs.getOrElse((l, s), 0L)
      val dev = o * n - rTot(l) * cTot(s)
      chi2 += dev.toDouble * dev.toDouble /
        (n.toDouble * rTot(l).toDouble * cTot(s).toDouble)
    }
    val v2 = chi2 / (n.toDouble * (math.min(rTot.size, cTot.size).toDouble - 1.0))
    val r = StatTestOps.cramersV2LangSource(spark, sf0001).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == rTot.size.toLong && r.getLong(2) == cTot.size.toLong)
    assert(r.getDouble(3) == chi2)
    assert(r.getDouble(4) == v2)
  }

  private lazy val daily: Seq[(Long, Long)] = {
    val byDay = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us DIV 86400000000"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    byDay.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
  }

  test("mann_kendall_trend: pairwise sign sum and tie-aware variance match") {
    val s = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong).sum
    val n = daily.length.toLong
    val tie = daily.groupBy(_._2).values.map(_.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val r = StatTestOps.mannKendallTrend(spark, sf0001).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == s)
    assert(r.getLong(2) == n * (n - 1) * (2 * n + 5) - tie)
    assert(r.getDouble(3) == s.toDouble / (n.toDouble * (n.toDouble - 1.0) / 2.0))
  }

  test("runs_test_daily: run count around the lower median matches") {
    val med = daily.map(_._2).zip(daily.map(_._1)).sorted
      .apply((daily.length + 1) / 2 - 1)._1
    val signs = daily.filter(_._2 != med).map(d => if (d._2 > med) 1L else -1L)
    val nRuns = signs.indices.count(i => i == 0 || signs(i) != signs(i - 1)).toLong
    val n1 = signs.count(_ == 1L).toLong
    val n2 = signs.count(_ == -1L).toLong
    val r = StatTestOps.runsTestDaily(spark, sf0001).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((n1, n2, nRuns)))
    assert(r.getDouble(3) ==
      1.0 + 2.0 * n1.toDouble * n2.toDouble / (n1.toDouble + n2.toDouble))
    assert(r.getLong(4) == 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2))
    assert(r.getLong(5) == (n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
  }

  test("bowley_skew_types: rank-pick quartiles match the sorted brute force") {
    val got = StatTestOps.bowleySkewTypes(spark, sf0001).collect().map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for ((t, rows) <- eventRows.groupBy(_._2)) {
      val vs = rows.map(_._3).sorted
      val n = vs.length.toLong
      def pick(rank: Long): Long = vs(math.max(1L, rank).toInt - 1)
      val (q1, q2, q3) = (pick((n + 3) / 4), pick((n + 1) / 2), pick((3 * n + 1) / 4))
      assert(got(t) == ((n, q1, q2, q3)))
    }
  }

  test("qq_deciles_pair: exact rank-pick deciles for both types") {
    val got = StatTestOps.qqDecilesPair(spark, sf0001).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def dec(t: String): Map[Long, Long] = {
      val vs = eventRows.filter(_._2 == t).map(_._3).sorted
      val n = vs.length.toLong
      (1L to 9L).map(k => k -> vs(math.max(1L, k * n / 10).toInt - 1)).toMap
    }
    val (p, c) = (dec("purchase"), dec("click"))
    assert(got == (1L to 9L).map(k => k -> ((p(k), c(k), p(k) - c(k)))).toMap)
  }

  test("gini_split_stump: the split minimizes weighted impurity over the full grid") {
    val n = eventRows.length.toLong
    val tTot = types.map(t => t -> eventRows.count(_._2 == t).toLong).toMap
    val grid = eventRows.groupBy(_._3).view.mapValues(rs =>
      types.map(t => rs.count(_._2 == t).toLong)).toMap
    val sortedVals = grid.keys.toSeq.sorted
    var l = types.map(_ => 0L)
    var best: Option[(Double, Long, Long, Long)] = None
    for (v <- sortedVals) {
      l = l.zip(grid(v)).map { case (x, y) => x + y }
      val nLeft = l.sum
      val nRight = n - nLeft
      if (nRight > 0) {
        val sumL = l.map(x => x.toDouble * x.toDouble).reduceLeft(_ + _)
        val sumR = types.zip(l)
          .map { case (t, x) => (tTot(t) - x).toDouble * (tTot(t) - x).toDouble }
          .reduceLeft(_ + _)
        val score = ((nLeft.toDouble - sumL / nLeft.toDouble)
          + (nRight.toDouble - sumR / nRight.toDouble)) / n.toDouble
        if (best.isEmpty || score < best.get._1) best = Some((score, v, nLeft, nRight))
      }
    }
    val (score, v, nLeft, nRight) = best.get
    val r = StatTestOps.giniSplitStump(spark, sf0001).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((v, nLeft, nRight, n)))
    assert(r.getDouble(4) == score)
  }
}
