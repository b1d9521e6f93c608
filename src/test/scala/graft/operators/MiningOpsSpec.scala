package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

/** Specs for the mining/governance band: every operator is re-derived by an
  * independent in-memory brute force over the collected sf0.001 fixture and
  * must match EXACTLY (the declared ratios are one IEEE division of exact
  * integers on both sides, so == on doubles is the right assertion).
  */
class MiningOpsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val eventRows: Array[(Long, Long, Long, Long)] =
    Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("assoc_rules_brands matches the brute-force basket counts") {
    val baskets = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemCnt = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = byOrder.size.toLong
    val support = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, bs) <- byOrder; a <- bs; b <- bs if a < b)
      support((a, b)) = support.getOrElse((a, b), 0L) + 1L
    val expect = support.toSeq.filter(_._2 >= 50).map { case ((a, b), s) =>
      (a, b, s, itemCnt(a), itemCnt(b), n,
        s.toDouble / itemCnt(a).toDouble,
        (s * n).toDouble / (itemCnt(a) * itemCnt(b)).toDouble)
    }.sortBy(t => (-t._3, t._1, t._2))
    val got = MiningOps.assocRulesBrands(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))).toSeq
    assert(got == expect)
    // the un-thresholded pair grid must be dense enough to be meaningful
    assert(support.size > 100)
  }

  test("ols_trend_user slope equals the closed-form least squares per user") {
    val got = MiningOps.olsTrendUser(spark, sf0001).collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val byUser = eventRows.groupBy(_._1)
    var checked = 0
    for ((u, rows) <- byUser if rows.length >= 20) {
      val ys = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val xs = (1 to ys.length).map(_.toLong)
      val nn = ys.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val (num, den) = (nn * sxy - sx * sy, nn * sxx - sx * sx)
      val (gn, gnum, gden, gslope) = got(u)
      assert(gn == nn && gnum == num && gden == den)
      assert(gslope == num.toDouble / den.toDouble)
      checked += 1
    }
    assert(checked == got.size && checked > 0)
  }

  test("cosine_tf_pairs equals the brute-force blocked TF cosine") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tf = docs.map { case (id, lang, text) =>
      val m = text.split(" ").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      (id, lang, m)
    }
    val blk = tf.map { case (id, lang, m) =>
      // dominant term: max tf, lexicographically smallest token on ties
      val top = m.toSeq.minBy { case (tok, cnt) => (-cnt, tok) }._1
      (id, lang, m.values.map(v => v * v).sum, (m.values.sum / 8, top), m)
    }
    val expect = (for {
      (ia, la, n2a, ba, ma) <- blk
      (ib, lb, n2b, bb, mb) <- blk
      if la == lb && ba == bb && ia < ib
      dot = ma.keysIterator.map(k => ma(k) * mb.getOrElse(k, 0L)).sum
      if dot * dot.toDouble / (n2a * n2b).toDouble >= 0.81
    } yield (ia, ib, dot, n2a, n2b,
      (dot * dot).toDouble / (n2a * n2b).toDouble))
      .sortBy(t => (t._1, t._2)).toSeq
    val got = MiningOps.cosineTfPairs(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSeq
    assert(got == expect)
  }

  test("chi2_event_dow cells: marginals consistent, contributions exact") {
    val types = Tables.events(spark, sf0001)
      .select(col("event_type"), expr("(ts_us DIV 86400000000 + 4) % 7"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nTot = types.length.toLong
    val got = MiningOps.chi2EventDow(spark, sf0001).collect()
    assert(got.map(_.getLong(2)).sum == nTot) // cells partition the table
    got.foreach { r =>
      val (t, d, o) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(o == types.count(x => x._1 == t && x._2 == d).toLong)
      val rTot = types.count(_._1 == t).toLong
      val cTot = types.count(_._2 == d).toLong
      assert(r.getLong(3) == rTot && r.getLong(4) == cTot && r.getLong(5) == nTot)
      val dev = o * nTot - rTot * cTot
      assert(r.getLong(6) == dev)
      assert(r.getDouble(7) ==
        dev.toDouble * dev.toDouble
          / (nTot.toDouble * rTot.toDouble * cTot.toDouble))
    }
    assert(got.map(_.getLong(6)).sum == 0L) // deviations cancel by identity
  }

  test("forget_user_cascade counts match the brute-force two-hop fan-out") {
    val del = eventRows.map(_._1).filter(_ % 23 == 0).toSet
    val custs = Tables.customer(spark, sf0001).select(col("c_custkey"))
      .collect().map(_.getLong(0))
    val ords = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val delOrders = ords.filter(o => del.contains(o._2)).map(_._1).toSet
    val lines = Tables.lineitem(spark, sf0001).select(col("l_orderkey"))
      .collect().map(_.getLong(0))
    val got = MiningOps.forgetUserCascade(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("events") == ((eventRows.length.toLong,
      eventRows.count(e => del.contains(e._1)).toLong,
      eventRows.count(e => !del.contains(e._1)).toLong)))
    assert(got("customer") == ((custs.length.toLong,
      custs.count(del.contains).toLong,
      custs.count(c => !del.contains(c)).toLong)))
    assert(got("orders") == ((ords.length.toLong, delOrders.size.toLong,
      ords.length.toLong - delOrders.size)))
    assert(got("lineitem") == ((lines.length.toLong,
      lines.count(delOrders.contains).toLong,
      lines.count(l => !delOrders.contains(l)).toLong)))
  }

  test("percentile_bands_value: explicit type-1 quantiles and integer Tukey fence") {
    val daily = eventRows.groupBy(_._2 / 86400000000L).view
      .mapValues(_.map(_._4).sum).toSeq.sortBy(_._1)
    val sorted = daily.sortBy(d => (d._2, d._1)).map(_._2)
    val n = sorted.length
    val q1 = sorted((25 * n + 99) / 100 - 1)
    val q3 = sorted((75 * n + 99) / 100 - 1)
    val got = MiningOps.percentileBandsValue(spark, sf0001).collect()
    assert(got.length == n)
    got.foreach { r =>
      val (day, dc) = (r.getLong(0), r.getLong(1))
      assert(dc == daily.toMap.apply(day))
      assert(r.getLong(2) == q1 && r.getLong(3) == q3)
      assert(r.getBoolean(4) ==
        (dc * 2 < q1 * 2 - (q3 - q1) * 3 || dc * 2 > q3 * 2 + (q3 - q1) * 3))
    }
  }

  test("width_bucket_hist: counts partition the table, bounds match the id") {
    val cs = eventRows.map(_._4)
    val got = MiningOps.widthBucketHist(spark, sf0001).collect()
    assert(got.map(_.getLong(3)).sum == cs.length.toLong)
    got.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) == (b - 1) * 2500 && r.getLong(2) == b * 2500)
      assert(r.getLong(3) ==
        cs.count(c => math.min(c / 2500, 20L) + 1 == b).toLong)
    }
  }

  test("time_weighted_avg_user equals the brute-force duration-weighted mean") {
    val got = MiningOps.timeWeightedAvgUser(spark, sf0001).collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    var checked = 0
    for ((u, rows) <- eventRows.groupBy(_._1)) {
      val ordered = rows.sortBy(r => (r._2, r._3))
      val holds = ordered.zip(ordered.tail).map { case (a, b) =>
        (a._4, (b._2 - a._2) / 1000000L)
      }
      val (num, den) = (holds.map(h => h._1 * h._2).sum, holds.map(_._2).sum)
      if (holds.nonEmpty && den > 0) {
        val (gn, gnum, gden, gtwa) = got(u)
        assert(gn == holds.length.toLong && gnum == num && gden == den)
        assert(gtwa == num.toDouble / den.toDouble)
        checked += 1
      }
    }
    assert(checked == got.size && checked > 0)
  }

  test("table_checksum_diff: xor fingerprints flag exactly the perturbed days") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long, t: String, c: Long): Long = {
      val hex = md.digest(s"$id:$t:$c".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val types = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = eventRows.map { case (_, us, id, c) =>
      (us / 86400000000L, id, types(id), c)
    }
    val got = MiningOps.tableChecksumDiff(spark, sf0001).collect()
    assert(got.map(_.getLong(3)).sum == rows.length.toLong)
    got.foreach { r =>
      val day = r.getLong(0)
      val members = rows.filter(_._1 == day)
      val fpA = members.map(m => h(m._2, m._3, m._4)).reduce(_ ^ _)
      val fpB = members.map { m =>
        val c = if (m._3 == "purchase" && day % 7 == 3) m._4 * 2 else m._4
        h(m._2, m._3, c)
      }.reduce(_ ^ _)
      assert(r.getLong(1) == fpA && r.getLong(2) == fpB)
      assert(r.getBoolean(4) == (fpA == fpB))
      // a day drifts iff it is a perturbed day containing a purchase
      assert(r.getBoolean(4) !=
        (day % 7 == 3 && members.exists(_._3 == "purchase")))
    }
  }

  test("benford_first_digit: counts partition orders, shares exact, digits 1-9") {
    val cents = Tables.orders(spark, sf0001)
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val got = MiningOps.benfordFirstDigit(spark, sf0001).collect()
    assert(got.map(_.getLong(1)).sum == cents.length.toLong)
    got.foreach { r =>
      val d = r.getString(0)
      assert(d >= "1" && d <= "9")
      val expectN = cents.count(_.toString.startsWith(d)).toLong
      assert(r.getLong(1) == expectN && r.getLong(2) == cents.length.toLong)
      assert(r.getDouble(3) == expectN.toDouble / cents.length.toDouble)
    }
  }

  test("rfm_segments: segments partition customers; ntile scores match brute force") {
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_custkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perCust = orders.groupBy(_._1).map { case (c, rows) =>
      (c, rows.map(_._2).max, rows.length.toLong, rows.map(_._3).sum)
    }.toSeq
    // SQL-standard ntile: equal buckets, remainder to the leading ones
    def ntile4[K](keys: Seq[(Long, K)])(implicit o: Ordering[K]): Map[Long, Long] = {
      val sorted = keys.sortBy(_._2).map(_._1)
      val n = sorted.length; val base = n / 4; val rem = n % 4
      sorted.zipWithIndex.map { case (c, i) =>
        var (tile, seen) = (1, 0)
        while (seen + base + (if (tile <= rem) 1 else 0) <= i) {
          seen += base + (if (tile <= rem) 1 else 0); tile += 1
        }
        c -> tile.toLong
      }.toMap
    }
    val r = ntile4(perCust.map(p => p._1 -> ((p._2, p._1))))
    val f = ntile4(perCust.map(p => p._1 -> ((p._3, p._1))))
    val m = ntile4(perCust.map(p => p._1 -> ((p._4, p._1))))
    val expect = perCust.groupBy(p => r(p._1) * 100 + f(p._1) * 10 + m(p._1))
      .map { case (seg, ps) =>
        (seg, (ps.length.toLong, ps.map(_._4).sum,
          ps.map(_._4).sum.toDouble / ps.length.toDouble))
      }
    val got = MiningOps.rfmSegments(spark, sf0001).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == perCust.length.toLong)
  }

  test("pattern_profile_columns: three columns, ranks 1-3, count-ordered") {
    val got = MiningOps.patternProfileColumns(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.map(_._1).distinct.sorted.toSeq ==
      Seq("c_name", "o_orderpriority", "p_type"))
    // c_name is a single fixed scheme: Aaaaaaaa#999999999 covers all rows
    val cn = got.filter(_._1 == "c_name")
    assert(cn.head._3 == "Aaaaaaaa#999999999")
    assert(cn.head._4 == Tables.customer(spark, sf0001).count())
    for ((_, grp) <- got.groupBy(_._1)) {
      assert(grp.map(_._2).sorted.toSeq == (1L to grp.length.toLong))
      // ranks follow (n desc, pattern asc)
      val sorted = grp.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
      }
    }
  }

  test("attribution_first_last: credits match a sequential per-user replay") {
    val types = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // replay each user's timeline, tracking first/last non-purchase touch
    val firstAgg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val lastAgg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((_, rows) <- eventRows.groupBy(_._1)) {
      var firstTouch: String = null; var lastTouch: String = null
      for ((_, _, id, c) <- rows.sortBy(r => (r._2, r._3))) {
        val t = types(id)
        if (t == "purchase") {
          val fk = Option(firstTouch).getOrElse("none")
          val lk = Option(lastTouch).getOrElse("none")
          val (fn, fc) = firstAgg.getOrElse(fk, (0L, 0L))
          firstAgg(fk) = (fn + 1, fc + c)
          val (ln, lc) = lastAgg.getOrElse(lk, (0L, 0L))
          lastAgg(lk) = (ln + 1, lc + c)
        } else {
          if (firstTouch == null) firstTouch = t
          lastTouch = t
        }
      }
    }
    val got = MiningOps.attributionFirstLast(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val expect =
      firstAgg.map { case (ch, v) => ("first_touch", ch) -> v }.toMap ++
        lastAgg.map { case (ch, v) => ("last_touch", ch) -> v }
    assert(got == expect)
    // both models must credit every purchase exactly once
    val nPurch = types.values.count(_ == "purchase").toLong
    assert(got.filter(_._1._1 == "first_touch").values.map(_._1).sum == nPurch)
    assert(got.filter(_._1._1 == "last_touch").values.map(_._1).sum == nPurch)
  }

  test("interarrival_hist_type: buckets are the integer log2 of real gaps") {
    val types = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gaps = eventRows.map(e => (types(e._3), e._2, e._3))
      .groupBy(_._1).toSeq.flatMap { case (t, rows) =>
        val s = rows.sortBy(r => (r._2, r._3))
        s.zip(s.tail).map { case (a, b) => (t, (b._2 - a._2) / 1000000L) }
      }
    def bucket(g: Long): Long =
      if (g <= 0) 0L else 64L - java.lang.Long.numberOfLeadingZeros(g)
    val expect = gaps.groupBy(g => (g._1, bucket(g._2))).view
      .mapValues(_.length.toLong).toMap
    val got = MiningOps.interarrivalHistType(spark, sf0001).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
      == expect)
    got.foreach { r =>
      val (b, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hi == (1L << b) && (if (b == 0) lo == 0 else lo == (1L << (b - 1))))
    }
    assert(got.map(_.getLong(4)).sum == gaps.length.toLong)
  }

  test("temporal_split_embargo partitions rows; test users leak-checked") {
    val lo = eventRows.map(_._2).min
    val hi = eventRows.map(_._2).max
    val trainEnd = lo + ((hi - lo) * 7) / 10
    val gap = 86400000000L
    def split(us: Long): String =
      if (us <= trainEnd) "train"
      else if (us <= trainEnd + gap) "embargo" else "test"
    val trainUsers = eventRows.filter(e => split(e._2) == "train")
      .map(_._1).toSet
    val got = MiningOps.temporalSplitEmbargo(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.values.map(_._1).sum == eventRows.length.toLong)
    for ((name, (nRows, nUsers, nInTrain)) <- got) {
      val members = eventRows.filter(e => split(e._2) == name)
      assert(nRows == members.length.toLong)
      assert(nUsers == members.map(_._1).distinct.length.toLong)
      assert(nInTrain ==
        members.map(_._1).distinct.count(trainUsers.contains).toLong)
    }
    // train must strictly precede test in time with the embargo between
    assert(got("train")._1 > 0 && got("test")._1 > 0)
  }
}
