package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

/** Specs for the corpus-curation band v3 (CurationOps + semdedup). Each
  * operator is checked against an independent in-memory brute force at
  * sf0.001 — same policy as StatTestOpsSpec: replicate the semantics, not
  * the plan.
  */
class CurationOpsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs: Array[(Long, Array[String], String)] =
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1).split(" "), r.getString(2)))

  test("phrase_search_pos: overlapping-occurrence counts match a sequential scan") {
    val ph = CurationOps.PhraseTokens
    val expected = docs.flatMap { case (id, t, _) =>
      val starts = (0 to t.length - ph.length)
        .filter(s => ph.indices.forall(i => t(s + i) == ph(i)))
      if (starts.isEmpty) None else Some(id -> (starts.length.toLong, starts.min.toLong))
    }.toMap
    val got = CurationOps.phraseSearchPositional(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(expected.nonEmpty) // the fixture must actually exercise the phrase
    // the overlap case regexp misses: at least one doc with n_hits > 1 has
    // fewer NON-overlapping matches than hits
    val t3 = docs.collect { case (id, t, _)
      if t.sliding(3).exists(_.forall(_ == ph.head)) => id }
    if (t3.nonEmpty) assert(t3.forall(id => expected(id)._1 >= 2))
  }

  test("gopher_rules_source: rule counts match the per-doc brute force") {
    import CurationOps._
    val perDoc = docs.map { case (_, t, src) =>
      val n = t.length.toLong
      val chars = t.map(_.length.toLong).sum
      val stop = t.count(x => x == "the" || x == "a").toLong
      val mx = t.distinct.map(x => t.count(_ == x)).max.toLong
      val rShort = n < MinTokens
      val mwl = chars.toDouble / n.toDouble
      val rWord = mwl < WordLenLo || mwl > WordLenHi
      val rStop = stop < MinStopwords
      val rDom = mx.toDouble / n.toDouble > MaxDominance
      (src, rShort, rWord, rStop, rDom)
    }
    val expected = perDoc.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong, rs.count(_._2).toLong, rs.count(_._3).toLong,
        rs.count(_._4).toLong, rs.count(_._5).toLong,
        rs.count(r => !r._2 && !r._3 && !r._4 && !r._5).toLong)
    }.toMap
    val got = CurationOps.gopherRulesSource(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == expected)
    // every rule must split the fixture non-trivially in aggregate
    val tot = expected.values.toSeq
    assert(tot.map(_._2).sum > 0 && tot.map(_._3).sum > 0 &&
      tot.map(_._4).sum > 0 && tot.map(_._5).sum > 0 && tot.map(_._6).sum > 0)
  }

  test("dup_token_coverage: covered positions match the brute-force span union") {
    val grams = docs.filter(_._2.length >= 8).flatMap { case (id, t, _) =>
      (0 to t.length - 8).map(s => (t.slice(s, s + 8).mkString(" "), id, s))
    }
    val dup = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 2).keySet
    val covered = grams.filter(g => dup(g._1))
      .groupBy(_._2).view
      .mapValues(_.flatMap(g => g._3 until g._3 + 8).distinct.length.toLong)
      .toMap
    val expected = docs.filter(_._2.length >= 8).map { case (id, t, _) =>
      val c = covered.getOrElse(id, 0L)
      id -> (t.length.toLong, c, c.toDouble / t.length.toDouble)
    }.toMap
    val got = CurationOps.dupTokenCoverage(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == expected)
    assert(expected.values.exists(_._2 > 0L)) // some duplicated spans exist
    // coverage is never below the dup-START count's implied floor of 8
    // tokens per isolated dup gram: any doc with >0 coverage has >= 8
    assert(expected.values.forall(v => v._2 == 0L || v._2 >= 8L))
  }

  test("semdedup_decisions: consistent with the embedding_near_dup pair relation") {
    val pairs = VectorOps.embeddingNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byV2 = pairs.groupBy(_._2)
    val nVec = Tables.embeddings(spark, sf0001).count()
    val rows = VectorOps.semdedupDecisions(spark, sf0001).collect()
    assert(rows.length.toLong == nVec)
    val dropped = rows.filter(!_.getBoolean(1))
    assert(dropped.map(_.getLong(0)).toSet == byV2.keySet)
    dropped.foreach { r =>
      val cand = byV2(r.getLong(0))
      val best = cand.maxBy(p => (p._3, -p._1))
      assert(r.getLong(2) == best._1 && r.getDouble(3) == best._3)
    }
    // kept rows carry NULL dominator columns
    rows.filter(_.getBoolean(1)).foreach(r => assert(r.isNullAt(2) && r.isNullAt(3)))
  }

  test("ann_recall_ivf: recall equals the set intersection of the two rankings") {
    val exact = VectorOps.cosTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val approx = VectorOps.cosTopkIvf(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val rows = VectorOps.annRecallIvf(spark, sf0001).collect()
    assert(rows.length == exact.size)
    rows.foreach { r =>
      val q = r.getLong(0)
      val hit = exact(q).intersect(approx.getOrElse(q, Set.empty)).size.toLong
      assert(r.getLong(1) == exact(q).size.toLong && r.getLong(2) == hit)
      assert(r.getDouble(3) == hit.toDouble / exact(q).size.toDouble)
    }
    // the 5-probe IVF must find a substantial share of exact neighbors on
    // the fixture (measured 0.472 at sf0.001 — 5 of 16 cells probed; the
    // declared recall QUERY is the point here, the index's own recall
    // curves live in EXPERIMENTS.md)
    val total = rows.map(_.getLong(2)).sum.toDouble / rows.map(_.getLong(1)).sum.toDouble
    assert(total >= 0.4, s"aggregate recall $total")
  }

  test("stream_quality_gate: micro-batched verdicts equal the batch rule map on the slice") {
    import org.apache.spark.sql.functions.col
    val batch = CurationOps.gopherPerDoc(
      Tables.documents(spark, sf0001)
        .filter(col("doc_id") % 5 === 4)
        .select(col("doc_id"), col("text"), col("source"))
        .orderBy(col("doc_id")).limit(2000))
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    val streamed = graft.streaming.StreamingEntry.streamQualityGate(spark, sf0001)
      .select("doc_id", "source", "r_short", "r_wordlen", "r_stop", "r_dom", "pass")
      .collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
    assert(batch.nonEmpty)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("epoch_shuffle_manifest equals the in-JVM md5 replay; heads bounded and ordered") {
    val ids = docs.map(_._1)
    val expected = Seq(1L, 2L).flatMap { epoch =>
      ids.map { id =>
        val h = md5Hex(s"$epoch:$id")
        val d = h.charAt(0)
        val shard = (if (d <= '9') d - '0' else d - 'a' + 10) % 8
        (epoch, shard.toLong, h, id)
      }.groupBy(_._2).toSeq.flatMap { case (shard, rows) =>
        rows.sortBy(r => (r._3, r._4)).take(25).zipWithIndex
          .map { case ((e, s, _, id), i) => (e, s, i + 1L, id) }
      }
    }.sorted
    val out = CurationOps.epochShuffleManifest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(out == expected)
    // epochs shuffle INDEPENDENTLY: the two epochs' shard-1 heads differ
    val byEpoch = out.groupBy(_._1).map { case (e, rs) =>
      e -> rs.filter(_._2 == 1L).map(_._4).toSeq
    }
    assert(byEpoch(1L) != byEpoch(2L))
  }

  test("epoch_shard_balance: counts partition the corpus, deviations recomputed exactly") {
    val out = CurationOps.epochShardBalance(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = docs.length.toLong
    for ((epoch, rows) <- out.groupBy(_._1)) {
      assert(rows.map(_._3).sum == n, s"epoch $epoch counts must sum to corpus")
      for ((_, _, nd, dev) <- rows)
        assert(dev == math.floor((nd.toDouble * 8.0 / n - 1.0) * 1000 + 0.5).toLong)
    }
    assert(out.map(t => (t._1, t._2)).distinct.length == out.length)
  }
}
