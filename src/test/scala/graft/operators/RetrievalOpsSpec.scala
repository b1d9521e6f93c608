package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

/** Specs for the retrieval fusion/diversification band: the RRF fusion is
  * re-derived from its own rank columns plus the independent bm25_topk
  * output, and the MMR selection is replayed by a sequential in-JVM greedy
  * over brute-force Jaccard — exact integer equality everywhere (all
  * scores are BIGINT micro-units by construction).
  */
class RetrievalOpsSpec extends AnyFunSuite with SparkTestBase {

  private def tokenSets(): Map[Long, Set[String]] =
    Tables.documents(spark, sf0001)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSet)
      .toMap

  private def jacMicro(a: Set[String], b: Set[String]): Long = {
    val inter = (a & b).size
    math.floor(1000000.0 * inter / (a.size + b.size - inter) + 0.5).toLong
  }

  test("hybrid_rrf_topk: rrf_micro is exactly the integer fusion of its two rank columns") {
    val out = RetrievalOps.hybridRrfTopk(spark, sf0001).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val bm = if (r.isNullAt(4)) 0L else 1000000L / (60L + r.getLong(4))
      val jc = if (r.isNullAt(5)) 0L else 1000000L / (60L + r.getLong(5))
      assert(r.getLong(3) == bm + jc, s"row $r")
      assert(!(r.isNullAt(4) && r.isNullAt(5)), "doc in neither ranker's top-10")
    }
    // ranks are contiguous 1..n(≤10) per qid and ordered by (rrf desc, doc_id)
    for ((_, rows) <- out.groupBy(_.getLong(0))) {
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 10)
      val key = sorted.map(r => (-r.getLong(3), r.getLong(2))).toSeq
      assert(key == key.sorted, "fused order must be (rrf_micro desc, doc_id)")
    }
  }

  test("hybrid_rrf_topk: bm25_rank column agrees with bm25_topk's own ranking") {
    val bm = TextAnalysisOps.bm25Topk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val out = RetrievalOps.hybridRrfTopk(spark, sf0001).collect()
    for (r <- out if !r.isNullAt(4))
      assert(bm((r.getLong(0), r.getLong(2))) == r.getLong(4))
    // and every bm25 top-10 doc carries its rank somewhere in the fusion
    // input — docs can drop out of the fused TOP-10, but any doc that
    // SURVIVED with a bm25_rank must match; spot the reverse too for rank 1
    for (((qid, doc), rank) <- bm if rank == 1L) {
      val row = out.find(r => r.getLong(0) == qid && r.getLong(2) == doc)
      assert(row.forall(_.getLong(4) == 1L))
    }
  }

  test("mmr_rerank_k8 equals the sequential greedy over brute-force Jaccard") {
    val toks = tokenSets()
    val cand = TextAnalysisOps.bm25Topk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // qid, doc, rel
    val out = RetrievalOps.mmrRerankK8(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = cand.groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
      var remaining = cs.map(c => c._2 -> c._3).toMap
      var selected = List.empty[Long]
      val picks = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      while (selected.size < 8 && remaining.nonEmpty) {
        val scored = remaining.toSeq.map { case (d, rel) =>
          val maxJ = selected.map(s => jacMicro(toks(d), toks(s)))
            .foldLeft(0L)(math.max)
          (d, rel - maxJ)
        }
        val (doc, score) = scored.minBy { case (d, s) => (-s, d) }
        selected ::= doc
        remaining -= doc
        picks += ((qid, picks.count(_._1 == qid) + 1L, doc, score))
      }
      picks
    }
    assert(out.sorted.toSeq == expected.sorted.toSeq)
  }

  test("mmr picks are distinct bm25 candidates and rank 1 is the bm25 argmax") {
    val bmTop = TextAnalysisOps.bm25Topk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = RetrievalOps.mmrRerankK8(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val candSet = bmTop.map(t => (t._1, t._3)).toSet
    assert(out.forall(t => candSet((t._1, t._3))))
    for ((qid, rows) <- out.groupBy(_._1)) {
      assert(rows.map(_._3).distinct.length == rows.length)
      val first = rows.minBy(_._2)
      val bmFirst = bmTop.filter(_._1 == qid).minBy(_._2)
      assert(first._3 == bmFirst._3, "MMR's first pick must be the most relevant")
    }
  }
}
