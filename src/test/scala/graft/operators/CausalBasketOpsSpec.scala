package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

/** Specs for the market-basket and causal/robust-statistics band: each
  * operator is re-derived by an independent in-memory brute force over
  * the collected sf0.001 fixture and must match EXACTLY (declared
  * doubles are IEEE expression trees over exact-integer casts on both
  * sides, so == on doubles is the right assertion — the MiningOpsSpec
  * policy).
  */
class CausalBasketOpsSpec extends AnyFunSuite with SparkTestBase {

  private val dayUs = 86400000000L

  private lazy val eventRows: Array[(Long, Long, Long, String, Long)] =
    Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))

  private lazy val baskets: Set[(Long, Long, String)] =
    eventRows.map(r => (r._1, r._2 / dayUs, r._4)).toSet

  private lazy val pairCounts: Map[(String, String), Long] = {
    val byBasket = baskets.groupBy(b => (b._1, b._2))
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, members) <- byBasket) {
      val ts = members.map(_._3).toSeq.sorted
      for (i <- ts.indices; j <- (i + 1) until ts.length) {
        val k = (ts(i), ts(j))
        m(k) = m.getOrElse(k, 0L) + 1L
      }
    }
    m.toMap
  }

  test("basket_freq_pairs matches brute-force basket pair counts") {
    val got = BasketOps.basketFreqPairs(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == pairCounts)
  }

  test("basket_rules_lift: support/confidence/lift match the textbook formulas") {
    val perType = baskets.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nBaskets = baskets.map(b => (b._1, b._2)).size.toLong
    val expect = pairCounts.toSeq.flatMap { case ((a, b), nab) =>
      Seq((a, b, nab), (b, a, nab))
    }.filter(_._3 >= 5).map { case (ante, cons, nab) =>
      (ante, cons, nab, perType(ante), perType(cons), nBaskets,
        nab.toDouble / perType(ante).toDouble,
        (nab * nBaskets).toDouble / (perType(ante) * perType(cons)).toDouble)
    }.sortBy(t => (t._1, t._2))
    val got = BasketOps.basketRulesLift(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6), r.getDouble(7))).toSeq
    assert(got == expect)
  }

  test("cuped_adjusted_ab matches the pooled-theta brute force") {
    val mid = (eventRows.map(_._2).min + eventRows.map(_._2).max) / 2
    val perUser = eventRows.groupBy(_._1).view.mapValues { rows =>
      (rows.filter(_._2 < mid).map(_._5).sum, rows.filter(_._2 >= mid).map(_._5).sum)
    }.toMap
    val n = perUser.size.toLong
    val sx = perUser.values.map(_._1).sum
    val sy = perUser.values.map(_._2).sum
    val sxy = perUser.values.map(v => v._1 * v._2).sum
    val sxx = perUser.values.map(v => v._1 * v._1).sum
    val theta = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val expect = perUser.groupBy(_._1 % 2).toSeq.map { case (arm, us) =>
      val nu = us.size.toLong
      val sxa = us.values.map(_._1).sum
      val sya = us.values.map(_._2).sum
      val adj = sya.toDouble / nu.toDouble -
        theta * (sxa.toDouble / nu.toDouble - sx.toDouble / n.toDouble)
      (arm, nu, sxa, sya, sya.toDouble / nu.toDouble, theta, adj)
    }.sortBy(_._1)
    val got = CausalOps.cupedAdjustedAb(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expect)
  }

  test("cuped pooled moments overflow errors, never wraps (ANSI contract)") {
    // The Scaladoc on cupedAdjustedAb promises that when x·y approaches
    // 2^63 the Spark side RAISES (ANSI multiply/sum overflow) instead of
    // silently wrapping — the same failure mode as the DuckDB oracle's
    // HUGEINT→BIGINT cast. Pin it: the exact expression shape used by the
    // pooled-moments aggregate must throw on an overflowing product.
    import spark.implicits._
    val big = Seq((3100000000L, 3100000000L)).toDF("x", "y") // x*y ≈ 2^63.06
    val ex = intercept[Exception] {
      big.agg(org.apache.spark.sql.functions.sum($"x" * $"y")).collect()
    }
    val msg = ex.toString.toUpperCase
    assert(msg.contains("OVERFLOW") || msg.contains("ARITHMETIC"), ex.toString)
  }

  test("diff_in_diff matches the four-cell brute force") {
    val mid = (eventRows.map(_._2).min + eventRows.map(_._2).max) / 2
    def cell(arm: Long, post: Boolean): (Long, Long) = {
      val rs = eventRows.filter(r =>
        r._1 % 2 == arm && (if (post) r._2 >= mid else r._2 < mid))
      (rs.length.toLong, rs.map(_._5).sum)
    }
    val (ntp, stp) = cell(1, post = false); val (nto, sto) = cell(1, post = true)
    val (ncp, scp) = cell(0, post = false); val (nco, sco) = cell(0, post = true)
    val did = (sto.toDouble / nto.toDouble - stp.toDouble / ntp.toDouble) -
      (sco.toDouble / nco.toDouble - scp.toDouble / ncp.toDouble)
    val r = CausalOps.diffInDiff(spark, sf0001).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((ntp, stp, nto, sto)))
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) == ((ncp, scp, nco, sco)))
    assert(r.getDouble(8) == stp.toDouble / ntp.toDouble)
    assert(r.getDouble(12) == did)
  }

  test("theil_sen_daily matches the median-of-slopes brute force") {
    val daily = eventRows.filter(_._4 == "purchase")
      .groupBy(_._2 / dayUs).view.mapValues(_.map(_._5).sum).toSeq.sortBy(_._1)
    val slopes = for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield ((daily(j)._2 - daily(i)._2).toDouble / (daily(j)._1 - daily(i)._1).toDouble,
      daily(i)._1, daily(j)._1)
    val sorted = slopes.sortBy(identity)
    val medSlope = sorted((sorted.length + 1) / 2 - 1)._1
    val residuals = daily.map { case (d, c) =>
      (c.toDouble - medSlope * d.toDouble, d)
    }.sortBy(identity)
    val intercept = residuals((residuals.length + 1) / 2 - 1)._1
    val r = CausalOps.theilSenDaily(spark, sf0001).collect().head
    assert(r.getLong(0) == daily.length.toLong)
    assert(r.getLong(1) == slopes.length.toLong)
    assert(r.getDouble(2) == medSlope)
    assert(r.getDouble(3) == intercept)
  }

  test("km_survival_purchase matches the textbook product-limit estimator") {
    val byUser = eventRows.groupBy(_._1)
    val durations = byUser.values.map { rows =>
      val t0 = rows.map(_._2 / dayUs).min
      val evs = rows.filter(r => r._4 == "purchase" && r._5 >= 9000L)
      if (evs.nonEmpty) (evs.map(_._2 / dayUs).min - t0, true)
      else (rows.map(_._2 / dayUs).max - t0, false)
    }.toSeq
    val n = durations.length.toLong
    val evTimes = durations.filter(_._2).map(_._1).distinct.sorted
    var s = 1.0
    val expect = evTimes.map { t =>
      val risk = durations.count(_._1 >= t).toLong
      val deaths = durations.count(d => d._2 && d._1 == t).toLong
      s = s * ((risk - deaths).toDouble / risk.toDouble)
      (t, risk, deaths, deaths.toDouble / risk.toDouble, s)
    }
    val got = CausalOps.kmSurvivalPurchase(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expect)
    // survival is a proper non-increasing curve in (0, 1]
    assert(expect.map(_._5) == expect.map(_._5).sorted.reverse)
  }

  test("winsorized_stats matches the sorted-clip brute force, ties included") {
    val got = CausalOps.winsorizedStats(spark, sf0001).collect().map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))).toMap
    val byType = eventRows.groupBy(_._4)
    assert(got.keySet == byType.keySet)
    for ((t, rows) <- byType) {
      val vs = rows.map(_._5).sorted
      val n = vs.length.toLong
      val k = (5 * n / 100).toInt
      val lo = vs(k) // rank k+1, 1-based
      val hi = vs((n - k).toInt - 1) // rank n-k, 1-based
      val winsorMean = vs.map(v => math.max(lo, math.min(hi, v))).sum.toDouble / n.toDouble
      val trimmed = vs.slice(k, (n - k).toInt)
      val trimMean = trimmed.sum.toDouble / trimmed.length.toDouble
      assert(got(t) == ((n, lo, hi, winsorMean, trimMean, trimmed.length.toLong)))
    }
  }
}
