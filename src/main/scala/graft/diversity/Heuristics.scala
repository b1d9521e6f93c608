package graft.diversity

import scala.collection.mutable.ArrayBuffer

/** Sequential remote-clique heuristics (reference operators R2/R3,
  * SURVEY.md §2.1 [P core/.../LocalSearch.scala, MatchingHeuristic.scala]).
  * Both run driver-side over a coreset, never over raw data.
  */
object Heuristics {

  /** Matching heuristic (R3): greedily add the farthest remaining *pair*
    * until k points are chosen; ½-approx for remote-clique. Deterministic:
    * pair ties resolved by (lower id, lower id).
    */
  def matching(points: Seq[Pt], k: Int): IndexedSeq[Pt] = {
    val pts = points.toArray.sortBy(_.id)
    val n = pts.length
    if (n == 0 || k <= 0) return Vector.empty
    val kk = math.min(k, n)
    val used = Array.fill(n)(false)
    val out = new ArrayBuffer[Pt](kk)
    while (out.size + 1 < kk) {
      var bi = -1; var bj = -1; var bd = -1.0
      var i = 0
      while (i < n) {
        if (!used(i)) {
          var j = i + 1
          while (j < n) {
            if (!used(j)) {
              val d = Metric.r12(Metric.sqDist(pts(i).vec, pts(j).vec))
              if (d > bd) { bd = d; bi = i; bj = j } // strict > + ascending scan = lowest-id ties
            }
            j += 1
          }
        }
        i += 1
      }
      used(bi) = true; used(bj) = true
      out += pts(bi) += pts(bj)
    }
    if (out.size < kk) { // odd k: add the lowest-id unused point
      val i = pts.indices.find(!used(_)).get
      out += pts(i)
    }
    out.toIndexedSeq
  }

  /** Local search (R2): start from GMM's k-set, repeatedly swap a chosen
    * point for an unchosen one if it improves remote-clique by more than
    * eps; deterministic scan order (ascending ids), first-improvement.
    */
  def localSearch(points: Seq[Pt], k: Int, eps: Double = 1e-9, maxIter: Int = 100): IndexedSeq[Pt] = {
    val pts = points.toArray.sortBy(_.id)
    if (pts.isEmpty || k <= 0) return Vector.empty
    var current = Gmm.select(pts.toIndexedSeq, k).toArray
    val currentIds = scala.collection.mutable.Set(current.map(_.id): _*)
    var improved = true
    var iter = 0
    while (improved && iter < maxIter) {
      improved = false
      iter += 1
      var ci = 0
      while (!improved && ci < current.length) {
        // clique contribution of current(ci) to the rest
        val contrib = current.indices.filter(_ != ci)
          .map(j => Metric.dist(current(ci).vec, current(j).vec)).sum
        var pi = 0
        while (!improved && pi < pts.length) {
          val cand = pts(pi)
          if (!currentIds.contains(cand.id)) {
            val candContrib = current.indices.filter(_ != ci)
              .map(j => Metric.dist(cand.vec, current(j).vec)).sum
            if (candContrib > contrib + eps) {
              currentIds -= current(ci).id
              currentIds += cand.id
              current(ci) = cand
              improved = true
            }
          }
          pi += 1
        }
        ci += 1
      }
    }
    current.toIndexedSeq.sortBy(_.id)
  }
}
