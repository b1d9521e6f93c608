package graft.diversity

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property suite (sbt runs Properties natively — the
  * scalatestplus bridge is not in the offline cache).
  */
object GmmProps extends Properties("Gmm") {

  private val genCase: Gen[(Vector[Pt], Int)] = for {
    n <- Gen.choose(3, 120)
    k <- Gen.choose(1, 16)
    seed <- Gen.choose(0L, 10000L)
  } yield (TestPoints.randomPoints(n, 6, seed), k)

  property("size and uniqueness") = forAll(genCase) { case (pts, k) =>
    val sel = Gmm.select(pts, k)
    sel.length == math.min(k, pts.length) &&
      sel.map(_.id).distinct.length == sel.length
  }

  property("remote-edge of selection >= remote-edge of any suffix-extended set") =
    forAll(genCase) { case (pts, k) =>
      // adding any point can only shrink (or keep) the min pairwise distance
      val sel = Gmm.select(pts, k)
      val extra = pts.filterNot(p => sel.exists(_.id == p.id)).take(1)
      sel.length < 2 || extra.isEmpty ||
        Diversity.remoteEdge(sel ++ extra) <= Diversity.remoteEdge(sel) + 1e-12
    }

  property("streaming coreset: budget respected and mass conserved") =
    forAll(genCase) { case (pts, _) =>
      val m = 8
      val sc = new StreamingCoreset(m)
      pts.sortBy(_.id).foreach(sc.update)
      val res = sc.result()
      res.length <= m && res.map(_.weight).sum == pts.length.toLong
    }
}
