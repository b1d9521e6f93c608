package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.diversity.Diversity

/** Declared-path checks for the R4 evaluator queries: the driver only sees
  * rows-only green for these, so the value-level assertions live here —
  * each declared frame must agree with the evaluator run directly on the
  * same selected set, and the classic metric inequalities must hold.
  */
class DiversityOpsSpec extends AnyFunSuite with SparkTestBase {

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("remote_star_div: declared values equal the evaluator on the GMM prefix sets") {
    val sel32 = DiversityOps.selectDiverse(spark, sf0001, 32)
    val rows = DiversityOps.remoteStarDiv(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set(8L, 16L, 32L))
    Seq(8, 16, 32).foreach { k =>
      assert(rows(k.toLong) == r6(Diversity.remoteStar(sel32.take(k))),
        s"declared remote_star at k=$k must match the evaluator")
    }
  }

  test("remote_tree_div: declared values equal the evaluator; MST inequalities hold") {
    val sel32 = DiversityOps.selectDiverse(spark, sf0001, 32)
    val tree = DiversityOps.remoteTreeDiv(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(tree.keySet == Set(8L, 16L, 32L))
    Seq(8, 16, 32).foreach { k =>
      val sel = sel32.take(k)
      assert(tree(k.toLong) == r6(Diversity.remoteTree(sel)),
        s"declared remote_tree at k=$k must match the evaluator")
      // MST weight dominates (k-1) copies of the min edge and is dominated
      // by the full clique sum — the standard sandwich for a spanning tree.
      assert(tree(k.toLong) >= (k - 1) * Diversity.remoteEdge(sel) - 1e-6)
      assert(tree(k.toLong) <= Diversity.remoteClique(sel) + 1e-6)
    }
    // more points can only grow the spanning tree of a prefix-greedy set
    assert(tree(8L) <= tree(16L) && tree(16L) <= tree(32L))
  }

  test("remote_bipartition_cycle_div: declared values equal the evaluators; heuristic bounds hold") {
    val sel32 = DiversityOps.selectDiverse(spark, sf0001, 32)
    val rows = DiversityOps.remoteBipartitionCycleDiv(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(rows.keySet == Set(8L, 16L, 32L))
    Seq(8, 16, 32).foreach { k =>
      val sel = sel32.take(k)
      val (bip, cyc) = rows(k.toLong)
      assert(bip == r6(Diversity.remoteBipartitionGreedy(sel)),
        s"declared remote_bipartition at k=$k must match the evaluator")
      assert(cyc == r6(Diversity.remoteCycleApprox(sel)),
        s"declared remote_cycle at k=$k must match the evaluator")
      // cross-cut is a subset of the clique's pairs; the preorder tour is
      // sandwiched by the MST it walks (standard 2-approx bounds)
      assert(bip <= Diversity.remoteClique(sel) + 1e-6)
      val mst = Diversity.remoteTree(sel)
      assert(cyc >= mst - 1e-6 && cyc <= 2 * mst + 1e-6)
    }
  }

  test("remote_star_div and remote_edge_div agree at k=32") {
    val edgeRow = DiversityOps.remoteEdgeDiv(spark, sf0001).collect()(0)
    val star32 = DiversityOps.remoteStarDiv(spark, sf0001).collect()
      .find(_.getLong(0) == 32L).get.getDouble(1)
    val tree32 = DiversityOps.remoteTreeDiv(spark, sf0001).collect()
      .find(_.getLong(0) == 32L).get.getDouble(1)
    assert(edgeRow.getDouble(2) == star32, "remote_star column must match the dedicated query")
    assert(edgeRow.getDouble(3) == tree32, "remote_tree column must match the dedicated query")
  }
}
