package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN router eval on a CLUSTERED corpus (r14 verdict task #4): the
  * router contract (IVF routes steady-state traffic, rplsh is the
  * index-free fallback — EXPERIMENTS.md r14, SCALING.md) was pinned from
  * sf100 measurements over fresh-uniform sphere draws, a distribution
  * the rplsh grid itself showed is unrepresentative (true neighbors are
  * weak-similarity pairs). This main re-runs the same contestants on the
  * [[GenClusteredEmbeddings]] mixture-of-Gaussians fixture:
  *
  *  - exact broadcast top-5 (truth);
  *  - `cos_topk_ivf` — untrained sign-bucket IVF (16 cells, 5 probes);
  *  - `cos_topk_ivf_kmeans` — IVF with the GMM-coreset-trained coarse
  *    quantizer (16 learned cells, 4 probes) — the variant clustering
  *    should reward;
  *  - rplsh at the shipped point (L=6, B=9) and the occupancy-rule point
  *    (B ≈ log₂ n − 6).
  *
  * Reports wall seconds and recall@5 per contestant, plus the corpus'
  * own clustering sharpness (mean within- vs cross-cluster sim over the
  * query set) so the fixture's "clustered-ness" is itself on record.
  *
  * Usage: runMain graft.ClusteredAnnExperiment [sfDir] [nQueries]
  */
object ClusteredAnnExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfc10")
    val nQ = args.lift(1).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // see EXPERIMENTS.md r14 "union output partitioning"
      .config("spark.sql.unionOutputPartitioning", "false")
      // Sorted bucketed scans (r15): bucket sort-order propagation is
      // legacy-flagged since Spark 3.0; with Materialize.bucketedTable
      // guaranteeing ONE file per bucket it is safe (Spark keeps the
      // Sort for multi-file buckets even under the flag - verified) and
      // it elides the per-task re-sort under every co-bucketed SMJ.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.minPartitionNum", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.register(spark)

    val n = graft.sources.Tables.rowCount(spark, sfDir, "embeddings")
    println(s"== clustered ANN router eval, sf=$sfDir, n=$n vectors, $nQ queries ==")

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < nQ).select(col("vec_id"), col("embedding"))

    // fixture sharpness: mean within-cluster vs cross-cluster sim of the
    // query rows against a 2,000-row deterministic sample
    val sample = emb.filter(pmod(col("vec_id"), lit(n / 2000L + 1L)) === 0)
      .select(col("vec_id").as("s_id"), col("embedding").as("s_emb"), col("label").as("s_lbl"))
    val sharp = emb.filter(col("vec_id") < nQ)
      .join(broadcast(sample), col("vec_id") =!= col("s_id"))
      .select((col("label") === col("s_lbl")).as("within"),
        expr("dot_f32(embedding, s_emb)").as("sim"))
      .groupBy(col("within")).agg(avg(col("sim")).as("mean_sim"), count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    println(f"cluster sharpness: within-sim=${sharp.getOrElse(true, Double.NaN)}%.3f " +
      f"cross-sim=${sharp.getOrElse(false, Double.NaN)}%.3f")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, tEx) = timed(
      graft.operators.VectorOps.topkForQueries(spark, sfDir, queries)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    println(f"exact broadcast top-5:          ${tEx}%8.1f s (truth, ${exact.size} pairs)")

    def report(name: String, rows: Array[org.apache.spark.sql.Row], dt: Double): Unit = {
      val hits = rows.count(r => exact.contains((r.getLong(0), r.getLong(2))))
      println(f"$name%-30s ${dt}%8.1f s  recall=${hits.toDouble / math.max(1, exact.size)}%.3f")
    }
    locally {
      val (rows, t) = timed(graft.operators.VectorOps.cosTopkIvf(spark, sfDir).collect())
      report("cos_topk_ivf (untrained)", rows, t)
    }
    locally {
      val (rows, t) = timed(graft.operators.VectorOps.cosTopkIvfKmeans(spark, sfDir).collect())
      report("cos_topk_ivf_kmeans (trained)", rows, t)
    }
    val occRule = math.max(4, (63 - java.lang.Long.numberOfLeadingZeros(n)) - 6).toInt
    locally {
      val (rows, t) = timed(
        graft.operators.VectorOps.cosTopkRplshTuned(spark, sfDir, 6, 9, 9, 7, nQ).collect())
      report("rplsh shipped (L=6,B=9)", rows, t)
    }
    locally {
      val (rows, t) = timed(
        graft.operators.VectorOps.cosTopkRplshTuned(spark, sfDir, 6, occRule, occRule, 7, nQ).collect())
      report(s"rplsh occupancy (L=6,B=$occRule)", rows, t)
    }
    spark.stop()
  }
}
