package graft.diversity

/** Composable MapReduce coreset ([VLDB17] §4; reference operator R5,
  * SURVEY.md §2.1 [P core/.../MapReduceCoreset.scala]).
  *
  * Partition the input randomly into p parts; in each part run GMM to k′ ≥ k
  * centers and weight them by delegate counts; the union of the p coresets
  * (p·k′ points ≪ N) is a composable coreset on which the sequential
  * heuristics run driver-side. One shuffle + one coreset-sized collect is
  * the entire distributed footprint — this is what makes the diversity ops
  * 100 TB-safe (SURVEY.md §7.3.5): the driver never sees raw data.
  */
object MapReduceCoreset {

  /** Per-partition map task: local GMM(k′) + delegate weighting.
    * Deterministic for a fixed partition content (local seed = partition-min
    * id, so the global-min-id point is always in some partition's coreset).
    */
  def localCoreset(points: Iterator[Pt], kPrime: Int): Iterator[WeightedPt] = {
    val pts = points.toVector
    if (pts.isEmpty) Iterator.empty
    else {
      val centers = Gmm.select(pts, kPrime)
      Gmm.weighted(pts, centers).iterator
    }
  }
}
