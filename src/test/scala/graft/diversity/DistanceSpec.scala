package graft.diversity

import org.scalatest.funsuite.AnyFunSuite

/** The metric-generic surface: distance functions as first-class values
  * (reference §1.1) and GMM over bag-of-words with generalized Jaccard.
  */
class DistanceSpec extends AnyFunSuite {

  test("cosine distance: 0 for identical, 1 for orthogonal, 2 for opposite") {
    val a = Array(1f, 0f)
    val b = Array(0f, 1f)
    val c = Array(-1f, 0f)
    assert(math.abs(Distance.cosineDist(a, a)) < 1e-12)
    assert(math.abs(Distance.cosineDist(a, b) - 1.0) < 1e-12)
    assert(math.abs(Distance.cosineDist(a, c) - 2.0) < 1e-12)
  }

  test("generalized Jaccard: identity, disjoint, partial overlap with counts") {
    val a = Distance.bagOfWords(Seq("x", "x", "y"))
    val b = Distance.bagOfWords(Seq("x", "y", "y"))
    val c = Distance.bagOfWords(Seq("z"))
    assert(Distance.generalizedJaccardDist(a, a) == 0.0)
    assert(Distance.generalizedJaccardDist(a, c) == 1.0)
    // min-sum = 1(x)+1(y) = 2; max-sum = 2(x)+2(y) = 4 -> dist 0.5
    assert(math.abs(Distance.generalizedJaccardDist(a, b) - 0.5) < 1e-12)
  }

  test("GMM over bag-of-words with Jaccard picks the distinct document first") {
    // docs 0,1 near-identical; doc 2 disjoint; doc 3 half-overlapping 0
    val docs = Seq(
      0L -> Distance.bagOfWords(Seq("a", "b", "c", "d")),
      1L -> Distance.bagOfWords(Seq("a", "b", "c", "e")),
      2L -> Distance.bagOfWords(Seq("x", "y", "z", "w")),
      3L -> Distance.bagOfWords(Seq("a", "b", "x", "y")))
    val sel = Gmm.selectBy(docs, 2)(Distance.generalizedJaccardDist)
    // seed = 0 (min id); farthest from 0 is the disjoint doc 2
    assert(sel.map(_._1) == Vector(0L, 2L))
  }

  test("bagOfWords: distinct tokens are never merged (string keys, no hash collisions)") {
    val toks = (0 until 500).map(i => s"tok$i")
    val bag = Distance.bagOfWords(toks ++ toks.take(10))
    assert(bag.size == 500)
    assert(toks.take(10).forall(t => bag(t) == 2) && bag("tok499") == 1)
  }

  test("doc path: composed selection stable across p when local coresets cover") {
    // The [[CoresetSpec]] determinism-under-p anchor, replayed on the
    // bag-of-words/Jaccard path: with k' >= n/p each local coreset is "all
    // points", so the final selection must be p-invariant.
    val docs: Vector[(Long, Map[String, Int])] = (0 until 48).map { i =>
      i.toLong -> Distance.bagOfWords(
        Seq("w" + (i % 7), "w" + (i % 11), "w" + (i % 13), "x" + (i / 8), "y" + (i % 5)))
    }.toVector
    def selectWithP(p: Int): Seq[Long] = {
      val parts = docs.groupBy(_._1 % p).values.toVector
      val union = parts.flatMap(part =>
        Gmm.selectBy(part, part.length)(Distance.generalizedJaccardDist))
      Gmm.selectBy(union.sortBy(_._1), 6)(Distance.generalizedJaccardDist).map(_._1)
    }
    assert(selectWithP(1) == selectWithP(2))
    assert(selectWithP(1) == selectWithP(4))
    assert(selectWithP(1) == selectWithP(8))
  }

  test("metric-generic GMM equals the dense fast path under euclideanSq") {
    val pts = TestPoints.randomPoints(80, 6, 9)
    val fast = Gmm.select(pts, 10).map(_.id)
    val generic = Gmm.selectBy(pts.map(p => (p.id, p.vec)), 10)(Distance.euclideanSq).map(_._1)
    assert(fast == generic)
  }
}
