package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.diversity._

/** DataFrame-facing diversity operators (SURVEY.md §2.2 group W — the
  * reference's own surface, re-expressed Spark-first).
  *
  * Execution shape ([VLDB17] §4, SURVEY.md §3.1): exactly one deliberate
  * shuffle (`repartition(p)` on a deterministic key) + one executor→driver
  * crossing (`collect()` of the p·k′-point coreset). The driver-side
  * heuristics then run on ≤ a few hundred points. Raw embeddings are never
  * collected — the coreset IS the scalability argument, at 100 TB exactly as
  * at sf0.001.
  *
  * Determinism (SURVEY.md §7.3.4): partition = vec_id % p (not round-robin),
  * local GMM seeded at partition-min id, global GMM seeded at coreset-min
  * id, all tie-breaks by lowest id, distance comparisons on 12-dp-rounded
  * squared values. Fixed p=8, k′=64.
  */
object DiversityOps {

  val P = 8
  val KPrime = 64

  private def points(spark: SparkSession, sfDir: String) = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => Pt(id, v) }
  }

  /** The distributed coreset: repartition(p) → per-partition GMM(k′) with
    * delegate weights → coreset-only collect, sorted by id.
    */
  def coreset(spark: SparkSession, sfDir: String): IndexedSeq[WeightedPt] = {
    import spark.implicits._
    points(spark, sfDir)
      .repartition(P, pmod(col("id"), lit(P)))
      .mapPartitions(it => MapReduceCoreset.localCoreset(it, KPrime))
      .collect()
      .sortBy(_.id)
      .toIndexedSeq
  }

  /** GMM selection of k from the composable coreset. */
  def selectDiverse(spark: SparkSession, sfDir: String, k: Int): IndexedSeq[Pt] =
    Gmm.select(coreset(spark, sfDir).map(w => Pt(w.id, w.vec)), k)

  /** W: deterministic GMM k=32 → (rank, vec_id). No oracle (not
    * SQL-expressible); invariants are property-tested in scalatest.
    */
  def gmmDiverseK32(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sel = selectDiverse(spark, sfDir, 32)
    sel.zipWithIndex
      .map { case (p, i) => ((i + 1).toLong, p.id) }
      .toDF("rank", "vec_id")
  }

  /** W: remote-edge (plus star/tree) objective values of the chosen k=32. */
  def remoteEdgeDiv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sel = selectDiverse(spark, sfDir, 32)
    Seq((
      sel.size.toLong,
      math.rint(Diversity.remoteEdge(sel) * 1e6) / 1e6,
      math.rint(Diversity.remoteStar(sel) * 1e6) / 1e6,
      math.rint(Diversity.remoteTree(sel) * 1e6) / 1e6
    )).toDF("k", "remote_edge", "remote_star", "remote_tree")
  }

  /** W: remote-clique objectives — GMM set vs matching-heuristic set vs
    * local-search set, plus heuristic bipartition/cycle values.
    */
  def remoteCliqueDiv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cs = coreset(spark, sfDir).map(w => Pt(w.id, w.vec))
    val gmmSet = Gmm.select(cs, 32)
    val matchSet = Heuristics.matching(cs, 32)
    val lsSet = Heuristics.localSearch(cs, 32)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    Seq((
      32L,
      r6(Diversity.remoteClique(gmmSet)),
      r6(Diversity.remoteClique(matchSet)),
      r6(Diversity.remoteClique(lsSet)),
      r6(Diversity.remoteBipartitionGreedy(gmmSet)),
      r6(Diversity.remoteCycleApprox(gmmSet))
    )).toDF("k", "clique_gmm", "clique_matching", "clique_localsearch",
      "bipartition_greedy", "cycle_mst2approx")
  }

  /** W+: diverse DOCUMENT selection — the reference's algorithm applied to
    * the sparse text model: bag-of-words per doc, generalized-Jaccard
    * distance, composable-coreset path (per-partition GMM(32) via
    * [[Gmm.selectBy]], coreset-only collect, final GMM k=16). This is the
    * diversity-sampling step of a training-data curation pipeline: pick
    * maximally-unlike documents, never collecting raw text beyond the
    * coreset. No oracle (not SQL-expressible); determinism as §7.3.4.
    */
  def diverseDocsK16(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, Distance.bagOfWords(text.split(' ').toSeq.filter(_.nonEmpty)))
      }
    val coreset = docs
      .repartition(4, pmod(col("_1"), lit(4)))
      .mapPartitions { it =>
        val pts = it.toVector
        if (pts.isEmpty) Iterator.empty
        else Gmm.selectBy(pts, 32)(Distance.generalizedJaccardDist).iterator
      }
      .collect()
      .sortBy(_._1)
    val sel = Gmm.selectBy(coreset.toSeq, 16)(Distance.generalizedJaccardDist)
    sel.zipWithIndex
      .map { case ((id, _), i) => ((i + 1).toLong, id) }
      .toDF("rank", "doc_id")
  }

  /** W+: end-to-end corpus curation — the composed training-data pipeline
    * run as ONE query: (1) quality gate (type-token ratio × doc length,
    * pure codegen'd expressions), (2) exact dedup keeping the min-doc_id
    * survivor (one hash shuffle), (3) diversity sampling k=16 via the
    * bag-of-words Jaccard coreset path of [[diverseDocsK16]]. Shows the
    * engine's operators compose: at 100 TB each stage keeps its own scale
    * posture (map-side filters → keyed shuffle → coreset-only collect).
    * Deterministic; rows-only (diversity selection is not SQL-expressible).
    */
  def curateCorpusK16(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val survivors = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("double"))
      .withColumn("ttr", size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
      // quality gate: enough tokens and vocabulary actually varies
      .filter(col("n_tokens") >= 8 && col("ttr") >= 0.3)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
    val docs = survivors
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, Distance.bagOfWords(text.split(' ').toSeq.filter(_.nonEmpty)))
      }
    val coreset = docs
      .repartition(4, pmod(col("_1"), lit(4)))
      .mapPartitions { it =>
        val pts = it.toVector
        if (pts.isEmpty) Iterator.empty
        else Gmm.selectBy(pts, 32)(Distance.generalizedJaccardDist).iterator
      }
      .collect()
      .sortBy(_._1)
    val sel = Gmm.selectBy(coreset.toSeq, 16)(Distance.generalizedJaccardDist)
    sel.zipWithIndex
      .map { case ((id, _), i) => ((i + 1).toLong, id) }
      .toDF("rank", "doc_id")
  }

  /** W: one-pass streaming coreset (kernel budget 64) over the embeddings in
    * ascending vec_id order → (vec_id, weight) kernels. Single-partition
    * fold — the streaming model is sequential by definition ([VLDB17] §5);
    * the scale path is per-partition streaming coresets composed by
    * [[coreset]].
    */
  def coresetStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    points(spark, sfDir)
      .repartition(1)
      .sortWithinPartitions(col("id"))
      .mapPartitions { it =>
        val sc = new StreamingCoreset(64)
        it.foreach(sc.update)
        sc.result().iterator
      }
      .select(col("id").as("vec_id"), col("weight"))
      .orderBy(col("vec_id"))
  }
}
