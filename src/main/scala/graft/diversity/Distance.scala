package graft.diversity

/** First-class distance functions (reference §1.1: "distances passed as
  * first-class functions `(T, T) => Double`; all algorithms are
  * metric-generic" — [P core/.../Distance.scala]). The generic kernels in
  * [[Gmm.selectBy]] / [[Heuristics]] accept any of these; the dense
  * euclidean fast path in [[Metric]] stays the default for the fixture
  * embeddings.
  */
object Distance {

  /** Squared euclidean over dense float vectors (comparison-safe: use with
    * r12 rounding for tie decisions).
    */
  val euclideanSq: (Array[Float], Array[Float]) => Double = Metric.sqDist

  /** Cosine distance 1 - a·b/(‖a‖‖b‖) over dense float vectors. Not a
    * metric (no triangle inequality) but a standard diversity measure for
    * unit-norm text/embedding data ([VLDB17] §6 uses cosine-style
    * distances for bag-of-words experiments).
    */
  def cosineDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0
    else 1.0 - dot / math.sqrt(na * nb)
  }

  /** Generalized Jaccard distance over sparse term-count vectors
    * (bag-of-words): 1 - Σ min(a_t, b_t) / Σ max(a_t, b_t). This is the
    * reference's sparse text-data model (§1.1 BagOfWords row). Generic in
    * the term-key type: [[bagOfWords]] keys by the token string itself.
    */
  def generalizedJaccardDist[K](a: Map[K, Int], b: Map[K, Int]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    var mins = 0L
    var maxs = 0L
    (a.keySet ++ b.keySet).foreach { t =>
      val av = a.getOrElse(t, 0).toLong
      val bv = b.getOrElse(t, 0).toLong
      mins += math.min(av, bv)
      maxs += math.max(av, bv)
    }
    if (maxs == 0L) 0.0 else 1.0 - mins.toDouble / maxs.toDouble
  }

  /** Tokenized text → bag-of-words term counts, keyed by the token string
    * itself. (An earlier form keyed by `String.hashCode`: 32-bit collisions
    * silently merged distinct terms — deterministic but lossy. The string
    * key is exact; the per-doc map is small, so there is no storage
    * argument for hashing.)
    */
  def bagOfWords(tokens: Seq[String]): Map[String, Int] =
    tokens.groupBy(identity).map { case (t, ts) => t -> ts.length }
}
