package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Clustered embedding fixture (r14 verdict task #4): the sf100 ANN
  * router measurements all ran on GenData's fresh-UNIFORM sphere draws,
  * and the rplsh grid itself showed that distribution distorts sizing
  * intuitions (recall 0.96 at B=9 vs 0.43 at B=14, because uniform
  * "true neighbors" are weak-similarity pairs). Real embedding corpora
  * are CLUSTERED. This main writes a mixture-of-Gaussians corpus:
  * `k` unit-norm centers (deterministic hashed gaussians), each point =
  * L2-normalize(center(label) + σ·z) with z a hashed Box–Muller
  * standard normal — fully deterministic, no RNG object, no clock, like
  * every graft generator. label = true cluster id (vec_id % k), so
  * recall evals can also report cluster containment.
  *
  * Usage: runMain graft.GenClusteredEmbeddings <outDir> [n] [k] [sigmaMilli]
  * Defaults: n=500000 (sf10-equivalent volume), k=64, σ=0.25, d=64.
  * Writes <outDir>/embeddings.parquet (vec_id, embedding, label) — the
  * standard fixture schema, readable by every vector operator.
  */
object GenClusteredEmbeddings {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/sfc10")
    val n = args.lift(1).map(_.toLong).getOrElse(500000L)
    val k = args.lift(2).map(_.toInt).getOrElse(64)
    val sigma = args.lift(3).map(_.toInt).getOrElse(250) / 1000.0
    val dim = 64
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Hashed standard normal: Box–Muller over two xxhash64 uniforms in
    // (0, 1) — deterministic per (seed string, index).
    def gauss(seed: String) =
      s"""sqrt(-2.0D * ln((pmod(xxhash64(concat($seed, ':a')), 1000000L) + 0.5D) / 1000000.0D))
         | * cos(6.283185307179586D *
         |   (pmod(xxhash64(concat($seed, ':b')), 1000000L) + 0.5D) / 1000000.0D)""".stripMargin

    val df = spark.range(n)
      .select(col("id").as("vec_id"), (col("id") % k).cast("int").as("label"))
      // cluster center (un-normalized): hashed gaussian per (label, dim)
      .withColumn("craw", expr(
        s"transform(sequence(0, ${dim - 1}), j -> ${gauss("concat('c:', label, ':', j)")})"))
      .withColumn("cn", expr("sqrt(aggregate(craw, 0D, (s, x) -> s + x * x))"))
      // point = unit center + sigma * z, re-normalized (fixture contract:
      // unit-norm vectors — raw-dot thresholds assume it)
      .withColumn("praw", expr(
        s"""zip_with(craw,
           |  transform(sequence(0, ${dim - 1}), j -> ${gauss("concat('z:', vec_id, ':', j)")}),
           |  (c, z) -> c / cn + $sigma * z)""".stripMargin))
      .withColumn("pn", expr("sqrt(aggregate(praw, 0D, (s, x) -> s + x * x))"))
      .select(
        col("vec_id"),
        expr("transform(praw, x -> cast(x / pn AS float))").as("embedding"),
        col("label"))
    df.repartition(8).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[genclustered] wrote n=$n k=$k sigma=$sigma d=$dim -> $outDir/embeddings.parquet")
    spark.stop()
  }
}
