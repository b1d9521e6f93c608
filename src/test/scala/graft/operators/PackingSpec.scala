package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Invariant specs for sequence packing and rarity-weighted top terms
  * (exact-value correctness is driver-oracled; these pin the structural
  * guarantees the oracle can't express).
  */
class PackingSpec extends AnyFunSuite with SparkTestBase {

  test("pack_token_bins: offsets in [0, cap), bins contiguous per shard, mass conserved") {
    val rows = TextOps.packTokenBins(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, _, off) => assert(off >= 0 && off < 2048) }
    rows.groupBy(_._1).foreach { case (_, shardRows) =>
      val ordered = shardRows.sortBy(_._2)
      // contiguous fill: each doc starts exactly where the previous ended
      ordered.sliding(2).foreach {
        case Array((_, _, n1, b1, o1), (_, _, _, b2, o2)) =>
          val endAbs = b1 * 2048 + o1 + n1
          assert(b2 * 2048 + o2 == endAbs, s"gap or overlap at $endAbs")
        case _ =>
      }
      // bin ids start at 0 and never decrease
      assert(ordered.head._4 == 0L && ordered.head._5 == 0L)
    }
    // mass conservation: last doc's end == total token count per shard
    val totals = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    rows.groupBy(_._1).foreach { case (shard, shardRows) =>
      val last = shardRows.maxBy(_._2)
      assert(last._4 * 2048 + last._5 + last._3 == totals(shard))
    }
  }

  test("rarity_top_terms: ≤3 terms per doc, rank-1 carries the max score, ranks dense") {
    val rows = TextAnalysisOps.rarityTopTerms(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docRows) =>
      val byRank = docRows.sortBy(_._2)
      assert(byRank.length <= 3)
      assert(byRank.map(_._2).toSeq == (1 to byRank.length))
      // scores non-increasing down the ranks (ties broken by token asc)
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 > b._5 || (a._5 == b._5 && a._3 < b._3))
        case _ =>
      }
    }
  }
}
