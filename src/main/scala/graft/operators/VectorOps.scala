package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over the embedding column (SURVEY.md §2.2 group V).
  *
  * Scale posture: the query side (50 vectors) is **broadcast** against the
  * target table — each executor scans its slice of targets once against the
  * in-memory query set; no shuffle of the big side, no unpartitioned
  * crossJoin. At 100 TB with a large query set, the same kernel runs behind
  * an LSH/IVF bucket join (bucket targets and queries by a coarse hash of
  * the vector, join on bucket, then exact-score within bucket) — the
  * banded-join pattern of [[TextOps.dedupDocsMinhash]].
  */
object VectorOps {

  /** Broadcast-joined (query × target) pairs with exact double dot-product
    * similarity, rounded to 6 dp for the cross-engine protocol. The dot
    * product is the native codegen expression
    * [[graft.functions.DotProductF32]] — identical semantics to
    * [[graft.functions.VectorFunctions.dotD]] (the pure-built-in fallback)
    * but without the per-row intermediate array of `zip_with`.
    */
  private def simPairs(spark: SparkSession, sfDir: String, nQueries: Int): DataFrame = {
    graft.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val t = emb.select(
      col("vec_id").as("t_id"), col("embedding").as("t_emb"), col("label").as("t_label"))
    t.crossJoin(broadcast(q))
      .filter(col("t_id") =!= col("q_id"))
      .withColumn("sim", round(expr("dot_f32(q_emb, t_emb)"), 6))
  }

  /** V: top-5 most-similar vectors for each of the first 50 query vectors.
    * Rank on the **rounded** similarity with vec_id tie-break so both
    * engines rank identically (SURVEY.md §7.4).
    */
  def cosTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("t_id"))
    simPairs(spark, sfDir, 50)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("t_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** V: 10-NN majority label vote per query vector (ties → smallest label). */
  def knnLabelVote(spark: SparkSession, sfDir: String): DataFrame = {
    val wNn = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("t_id"))
    val wVote = Window.partitionBy(col("q_id")).orderBy(col("n_votes").desc, col("t_label"))
    simPairs(spark, sfDir, 50)
      .withColumn("nn_rank", row_number().over(wNn))
      .filter(col("nn_rank") <= 10)
      .groupBy(col("q_id"), col("t_label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vote_rank", row_number().over(wVote))
      .filter(col("vote_rank") === 1)
      .select(col("q_id"), col("t_label").cast("long").as("pred_label"), col("n_votes"))
      .orderBy(col("q_id"))
  }
}
