package graft.diversity

import scala.collection.mutable.ArrayBuffer

/** GMM / farthest-first traversal (Gonzalez): greedily pick k points, each
  * maximizing the minimum distance to the already-picked set. 2-approximation
  * for remote-edge diversity ([VLDB17] §3; reference operator R1,
  * SURVEY.md §2.1 [P core/.../FarthestPointHeuristic.scala]).
  *
  * Deterministic protocol (SURVEY.md §7.3.4):
  *  - seed = the point with the minimum id;
  *  - candidates scanned in ascending id order;
  *  - distances compared after rounding to 12 dp (squared distances);
  *  - argmax ties resolved to the lowest id (strict `>` over an
  *    ascending-id scan).
  */
object Gmm {

  /** Select k points; O(k·n) time, O(n) space. Input order is irrelevant —
    * the points are re-sorted by id internally. Dense-euclidean fast path;
    * see [[selectBy]] for the metric-generic form.
    */
  def select(points: Seq[Pt], k: Int): IndexedSeq[Pt] =
    selectBy[Array[Float]](points.map(p => (p.id, p.vec)), k)(Metric.sqDist)
      .map { case (id, v) => Pt(id, v) }

  /** Metric-generic farthest-first (the reference passes distances as
    * first-class functions — SURVEY.md §1.1): `dist` is any symmetric
    * dissimilarity, e.g. [[Distance.euclideanSq]],
    * [[Distance.cosineDist]], or [[Distance.generalizedJaccardDist]] for
    * bag-of-words. Same determinism protocol: min-id seed, ascending-id
    * scan, 12-dp-rounded comparisons, lowest-id ties.
    */
  def selectBy[T](points: Seq[(Long, T)], k: Int)(dist: (T, T) => Double): IndexedSeq[(Long, T)] = {
    if (points.isEmpty || k <= 0) return Vector.empty
    val pts = points.toArray.sortBy(_._1)
    val n = pts.length
    val kk = math.min(k, n)
    val chosen = new ArrayBuffer[(Long, T)](kk)
    val minSq = Array.fill(n)(Double.PositiveInfinity)
    var last = pts(0) // seed: global min id
    chosen += last
    val taken = Array.fill(n)(false)
    taken(0) = true
    while (chosen.size < kk) {
      var best = -1
      var bestD = -1.0
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val d = Metric.r12(dist(pts(i)._2, last._2))
          if (d < minSq(i)) minSq(i) = d
          if (minSq(i) > bestD) { bestD = minSq(i); best = i }
        }
        i += 1
      }
      taken(best) = true
      last = pts(best)
      chosen += last
    }
    chosen.toIndexedSeq
  }

  /** Weight-preserving re-coreset step: assign every already-weighted point
    * to its nearest center and SUM the delegate masses (where [[weighted]]
    * counts each raw point as 1). This is what a second coreset level needs
    * — re-coresetting a union of weighted coresets must conserve total mass,
    * not reset it to point counts.
    */
  def weightedMass(points: Seq[WeightedPt], centers: IndexedSeq[Pt]): IndexedSeq[WeightedPt] = {
    val mass = Array.fill(centers.length)(0L)
    points.foreach { p =>
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < centers.length) {
        val d = Metric.r12(Metric.sqDist(p.vec, centers(j).vec))
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      mass(best) += p.weight
    }
    centers.zipWithIndex.map { case (c, j) => WeightedPt(c.id, c.vec, mass(j)) }
  }

  /** Assign every point to its nearest center (ties → lowest center id);
    * returns the centers with delegate counts. This is the weighting step of
    * the composable coreset ([VLDB17] §4).
    */
  def weighted(points: Seq[Pt], centers: IndexedSeq[Pt]): IndexedSeq[WeightedPt] = {
    val counts = Array.fill(centers.length)(0L)
    points.foreach { p =>
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < centers.length) {
        val d = Metric.r12(Metric.sqDist(p.vec, centers(j).vec))
        if (d < bestD) { bestD = d; best = j } // centers pre-sorted by id → first-wins = lowest id
        j += 1
      }
      counts(best) += 1
    }
    centers.zipWithIndex.map { case (c, j) => WeightedPt(c.id, c.vec, counts(j)) }
  }
}
