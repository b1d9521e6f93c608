package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

/** Specs for the sequence-analytics / curation-planning band: each
  * operator is re-derived by an independent in-memory brute force over
  * the collected sf0.001 fixture and must match EXACTLY (declared
  * ratios are ONE IEEE division of exact integers on both sides, so
  * == on doubles is the right assertion — the MiningOpsSpec policy).
  */
class SeqStatOpsSpec extends AnyFunSuite with SparkTestBase {

  private val dayUs = 86400000000L

  private lazy val eventRows: Array[(Long, Long, Long, String, Long)] =
    Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))

  private lazy val docRows: Array[(Long, String, String, String, Long)] =
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  test("streak_active_days matches brute-force gaps-and-islands") {
    val got = SeqStatOps.streakActiveDays(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val byUser = eventRows.groupBy(_._1)
    assert(got.keySet == byUser.keySet)
    for ((u, rows) <- byUser) {
      val days = rows.map(_._2 / dayUs).distinct.sorted
      // island lengths: split where the next day isn't consecutive
      val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
      var runLen = 0L
      for (i <- days.indices) {
        runLen += 1
        if (i == days.length - 1 || days(i + 1) != days(i) + 1) {
          lens += runLen; runLen = 0
        }
      }
      assert(got(u) == ((days.length.toLong, lens.length.toLong, lens.max)))
    }
  }

  test("second_order_transitions matches brute-force trigrams") {
    val tri = scala.collection.mutable.Map.empty[(String, String, String), Long]
    for ((_, rows) <- eventRows.groupBy(_._1)) {
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4)
      for (i <- 2 until seq.length) {
        val k = (seq(i - 2), seq(i - 1), seq(i))
        tri(k) = tri.getOrElse(k, 0L) + 1L
      }
    }
    val ctx = tri.groupBy { case ((p2, p1, _), _) => (p2, p1) }
      .view.mapValues(_.values.sum).toMap
    val expect = tri.toSeq.map { case ((p2, p1, nx), n) =>
      (p2, p1, nx, n, ctx((p2, p1)), n.toDouble / ctx((p2, p1)).toDouble)
    }.sortBy(t => (t._1, t._2, t._3))
    val got = SeqStatOps.secondOrderTransitions(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect)
  }

  test("time_to_first_purchase matches brute-force first-event deltas") {
    val byUser = eventRows.groupBy(_._1)
    val deltas = byUser.toSeq.flatMap { case (_, rows) =>
      val t0 = rows.map(_._2).min
      val buys = rows.filter(_._4 == "purchase")
      if (buys.isEmpty) None else Some((buys.map(_._2).min - t0) / dayUs)
    }
    val hist = deltas.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = deltas.size.toLong
    val expect = hist.toSeq.map { case (d, n) =>
      (d, n, total, n.toDouble / total.toDouble)
    }.sortBy(_._1)
    val got = SeqStatOps.timeToFirstPurchase(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
  }

  test("ks_purchase_click equals the brute-force sup-distance") {
    val a = eventRows.filter(_._4 == "purchase").map(_._5).sorted
    val b = eventRows.filter(_._4 == "click").map(_._5).sorted
    val (n1, n2) = (a.length.toLong, b.length.toLong)
    val grid = (a ++ b).distinct.sorted
    val dNum = grid.map { v =>
      math.abs(n2 * a.count(_ <= v) - n1 * b.count(_ <= v))
    }.max
    val row = SeqStatOps.ksPurchaseClick(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((n1, n2, dNum)))
    assert(row.getDouble(3) == dNum.toDouble / (n1 * n2).toDouble)
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
  }

  private lazy val dailyXY: Seq[(Long, Long, Long)] =
    eventRows.groupBy(_._2 / dayUs).toSeq.map { case (d, rows) =>
      (d, rows.length.toLong, rows.map(_._5).sum)
    }.sortBy(_._1)

  test("spearman_daily equals the brute-force rank statistic") {
    val rx = dailyXY.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val ry = dailyXY.sortBy(t => (t._3, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val n = dailyXY.length.toLong
    val sumD2 = dailyXY.map(t => { val d = rx(t._1) - ry(t._1); d * d }).sum
    val row = SeqStatOps.spearmanDaily(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1)) == ((n, sumD2)))
    assert(row.getDouble(2) ==
      (n * (n * n - 1) - 6 * sumD2).toDouble / (n * (n * n - 1)).toDouble)
  }

  test("kendall_tau_daily equals the brute-force pair counts") {
    var (c, d, p) = (0L, 0L, 0L)
    for (i <- dailyXY.indices; j <- (i + 1) until dailyXY.length) {
      val (l, r) = (dailyXY(i), dailyXY(j))
      p += 1
      if ((l._2 < r._2 && l._3 < r._3) || (l._2 > r._2 && l._3 > r._3)) c += 1
      else if ((l._2 < r._2 && l._3 > r._3) || (l._2 > r._2 && l._3 < r._3)) d += 1
    }
    val row = SeqStatOps.kendallTauDaily(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((p, c, d)))
    assert(row.getDouble(3) == (c - d).toDouble / p.toDouble)
  }

  test("quality_filter_funnel stages are cumulative and match brute force") {
    val md5s = docRows.map(d =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(d._2.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val firstByFp = docRows.zip(md5s).groupBy(_._2)
      .view.mapValues(_.map(_._1._1).min).toMap
    val flags = docRows.zip(md5s).map { case (d, fp) =>
      val len = d._2.length.toLong
      val alpha = d._2.count(ch => (ch >= 'a' && ch <= 'z') || ch == ' ').toLong
      val wordsN = d._2.split(" ").count(_.nonEmpty).toLong
      (len >= 100, alpha * 10 >= len * 5, wordsN >= 20, firstByFp(fp) == d._1)
    }
    val s0 = flags.length.toLong
    val s1 = flags.count(_._1).toLong
    val s2 = flags.count(f => f._1 && f._2).toLong
    val s3 = flags.count(f => f._1 && f._2 && f._3).toLong
    val s4 = flags.count(f => f._1 && f._2 && f._3 && f._4).toLong
    val got = SeqStatOps.qualityFilterFunnel(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._3).toSeq == Seq(s0, s1, s2, s3, s4))
    assert(got.forall(r => r._4 == r._3.toDouble / s0.toDouble))
    // cumulative conjunction ⇒ monotone nonincreasing
    assert(got.map(_._3).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("dedup_yield_source and dedup_cluster_sizes agree with brute force") {
    val md5s = docRows.map(d =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(d._2.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val firstByFp = docRows.zip(md5s).groupBy(_._2)
      .view.mapValues(_.map(_._1._1).min).toMap
    val yields = SeqStatOps.dedupYieldSource(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    for ((src, nDocs, nKept, raw, kept) <- yields) {
      val rows = docRows.zip(md5s).filter(_._1._4 == src)
      assert(nDocs == rows.length.toLong)
      assert(nKept == rows.count { case (d, fp) => firstByFp(fp) == d._1 }.toLong)
      assert(kept <= raw && nKept <= nDocs)
    }
    val sizes = SeqStatOps.dedupClusterSizes(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clusters = md5s.groupBy(identity).values.map(_.length.toLong)
    assert(sizes.map(_._3).sum == docRows.length.toLong)
    for ((k, nCl, nDocs) <- sizes) {
      assert(clusters.count(_ == k).toLong == nCl && nDocs == k * nCl)
    }
  }

  test("hhi_concentration equals the brute-force index on both dimensions") {
    val got = SeqStatOps.hhiConcentration(spark, sf0001).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    def check(groups: Map[String, Long], key: String): Unit = {
      val sumSq = groups.values.map(c => c * c).sum
      val total = groups.values.sum
      assert(got(key) == ((groups.size.toLong, sumSq, total,
        sumSq.toDouble / (total * total).toDouble,
        (total * total).toDouble / sumSq.toDouble)))
    }
    check(docRows.groupBy(_._3).view.mapValues(_.length.toLong).toMap, "lang")
    check(docRows.groupBy(_._4).view.mapValues(_.length.toLong).toMap, "source")
  }

  test("curriculum_deciles matches in-memory ntile over the exact order") {
    def score(text: String): Long =
      text.count(ch => (ch >= 'a' && ch <= 'z') || ch == ' ').toLong * 2 +
        text.split(" ").count(_.nonEmpty).toLong
    val ordered = docRows.map(d => (score(d._2), d._1, d._5))
      .sortBy(t => (-t._1, t._2))
    val n = ordered.length
    val b = 10
    val big = (n + b - 1) / b
    val small = n / b
    val cut = (n % b) * big
    val expect = ordered.zipWithIndex.map { case ((s, _, ch), i) =>
      val rn = i + 1
      val dec = if (rn <= cut) (rn - 1) / big + 1
        else (n % b) + (rn - cut - 1) / small + 1
      (dec.toLong, s, ch)
    }.groupBy(_._1).toSeq.map { case (dec, rows) =>
      (dec, rows.length.toLong, rows.map(_._2).min, rows.map(_._2).max,
        rows.map(_._3).sum)
    }.sortBy(_._1)
    val got = SeqStatOps.curriculumDeciles(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    // curriculum order: decile d's min_score ≥ decile d+1's max_score
    assert(got.sliding(2).forall(w => w(0)._3 >= w(1)._4))
  }

  test("mixture_epochs_plan obeys the integer budget arithmetic") {
    val rows = SeqStatOps.mixtureEpochsPlan(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    val nSources = rows.length.toLong
    for ((_, tokens, target, epochsMilli, planned, share) <- rows) {
      assert(target == 2000000L / nSources)
      assert(epochsMilli == math.min(4000L, target * 1000L / tokens))
      assert(planned == tokens * epochsMilli / 1000L)
      assert(share == planned.toDouble / 2000000.0)
      assert(epochsMilli <= 4000L) // repetition cap
    }
  }

  test("session_paths_topk matches brute-force session cutting") {
    val paths = scala.collection.mutable.Map.empty[String, Long]
    for ((_, rows) <- eventRows.groupBy(_._1)) {
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var prevTs = Long.MinValue
      for ((_, ts, _, tpe, _) <- sorted) {
        if (prevTs != Long.MinValue && ts - prevTs > 1800000000L)
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += tpe
        prevTs = ts
      }
      for (s <- sessions if s.nonEmpty) {
        val p = s.take(8).mkString(">")
        paths(p) = paths.getOrElse(p, 0L) + 1L
      }
    }
    val expect = paths.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = SeqStatOps.sessionPathsTopk(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("zipf_rank_profile matches brute-force rank bucketing") {
    val freqs = docRows.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val ranked = freqs.sortBy { case (t, f) => (-f, t) }.zipWithIndex
      .map { case ((_, f), i) => (i + 1L, f) }
    val corpus = freqs.map(_._2).sum
    val expect = ranked
      .groupBy { case (rk, _) => (64 - java.lang.Long.numberOfLeadingZeros(rk)).toLong }
      .toSeq.map { case (b, rows) =>
        (b, rows.length.toLong, rows.map(_._1).min, rows.map(_._1).max,
          rows.map(_._2).sum, corpus,
          rows.map(_._2).sum.toDouble / corpus.toDouble)
      }.sortBy(_._1)
    val got = SeqStatOps.zipfRankProfile(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expect)
    // Zipf profile covers every rank exactly once
    assert(expect.map(_._2).sum == ranked.length.toLong)
  }

  test("feed_freshness_report matches brute-force window counts") {
    val gmax = eventRows.map(_._2).max
    val dayL = 86400000000L
    val got = SeqStatOps.feedFreshnessReport(spark, sf0001).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    val byType = eventRows.groupBy(_._4)
    assert(got.keySet == byType.keySet)
    for ((tpe, rows) <- byType) {
      val last = rows.map(_._2).max
      val cLast = rows.count(_._2 > gmax - dayL).toLong
      val cPrev = rows.count(r => r._2 > gmax - 2 * dayL && r._2 <= gmax - dayL).toLong
      val dod = if (cPrev == 0) None else Some(cLast.toDouble / cPrev.toDouble)
      assert(got(tpe) == ((rows.length.toLong, last, (gmax - last) / 1000000L,
        cLast, cPrev, dod)))
    }
  }

  test("cohort_ltv_curve matches brute-force cohort folding; cum is monotone") {
    val cohorts = eventRows.filter(_._4 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._2 / dayUs).min).toMap
    val weekly = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((u, ts, _, tpe, c) <- eventRows if tpe == "purchase";
        cd <- cohorts.get(u); day = ts / dayUs; if day >= cd) {
      val k = (cd, (day - cd) / 7)
      val (n0, c0) = weekly.getOrElse(k, (0L, 0L))
      weekly(k) = (n0 + 1, c0 + c)
    }
    val expect = weekly.toSeq.sortBy(t => (t._1._1, t._1._2))
      .groupBy(_._1._1).toSeq.flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(_._1._2).map { case ((cd, wk), (n, c)) =>
          cum += c; (cd, wk, n, c, cum)
        }
      }.sortBy(t => (t._1, t._2))
    val got = SeqStatOps.cohortLtvCurve(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
  }

  test("local_clustering_docs matches a brute-force per-node count") {
    val n = docRows.length.toLong
    val edges = docRows.flatMap { d =>
      Seq((d._1, d._5 % n), (d._1, (d._5 * 31 + d._1) % n))
    }.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val deg = nodes.map(v => v -> edges.count(e => e._1 == v || e._2 == v).toLong).toMap
    val adj = nodes.map(v => v -> edges.collect {
      case (a, bb) if a == v => bb
      case (a, bb) if bb == v => a
    }).toMap
    val triPerNode = nodes.map { v =>
      val nb = adj(v).toSeq.sorted
      v -> (for (i <- nb.indices; j <- (i + 1) until nb.length
        if edges.contains((math.min(nb(i), nb(j)), math.max(nb(i), nb(j)))))
        yield 1).size.toLong
    }.toMap
    val expect = deg.toSeq.filter(_._2 >= 2).map { case (v, dg) =>
      (v, dg, triPerNode(v), triPerNode(v) * 2.0 / (dg * (dg - 1)).toDouble)
    }.sortBy(t => (-t._3, t._2, t._1)).take(100)
    val got = SeqStatOps.localClusteringDocs(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
  }

  test("growth_accounting_weekly: the four-way decomposition balances and matches") {
    val weekUs = dayUs * 7
    val byUser = eventRows.groupBy(_._1).view
      .mapValues(_.map(_._2 / weekUs).distinct.sorted).toMap
    val counts = scala.collection.mutable.Map.empty[Long, Array[Long]]
    def row(w: Long): Array[Long] =
      counts.getOrElseUpdate(w, Array(0L, 0L, 0L, 0L))
    for ((_, weeks) <- byUser) {
      for (i <- weeks.indices) {
        val w = weeks(i)
        if (i == 0) row(w)(0) += 1
        else if (weeks(i - 1) == w - 1) row(w)(1) += 1
        else row(w)(2) += 1
        if (i == weeks.length - 1 || weeks(i + 1) > w + 1) row(w + 1)(3) += 1
      }
    }
    val expect = counts.toSeq.sortBy(_._1)
      .map { case (w, a) => (w, a(0), a(1), a(2), a(3)) }
    val got = SeqStatOps.growthAccountingWeekly(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    // ledger identity: churned(w) = actives(w−1) − retained(w)
    val actives = expect.map(t => t._1 -> (t._2 + t._3 + t._4)).toMap
    for ((w, _, ret, _, churned) <- expect if actives.contains(w - 1))
      assert(churned == actives(w - 1) - ret)
  }
}
