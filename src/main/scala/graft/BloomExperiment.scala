package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

/** A/B measurement for the bloom runtime filter (EXPERIMENTS.md): with
  * broadcast disabled (forcing the shuffle anti-join a corpus-sized
  * catalog would force anyway), compare (a) catalog rows entering the
  * anti-join exchange without the bloom stage vs with it, and (b)
  * end-to-end times of `dedup_incremental` vs `dedup_bloom_prune`.
  * The row factor is the scale claim; the local timing is a sanity bound
  * (at sf0.1 both are sub-second — the exchange is tiny either way).
  */
object BloomExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Spark 4.1 UnionExec can CLAIM its children's shared output
      // partitioning while still executing as the plain concatenation
      // (left-semi-join-shaped union children; see EXPERIMENTS.md r14
      // "union output partitioning") — downstream operators then skip
      // their exchanges and zip-crash (or worse, mis-aggregate). Pinned
      // off in every session this library builds until fixed upstream.
      .config("spark.sql.unionOutputPartitioning", "false")
      // Sorted bucketed scans (r15): bucket sort-order propagation is
      // legacy-flagged since Spark 3.0; with Materialize.bucketedTable
      // guaranteeing ONE file per bucket it is safe (Spark keeps the
      // Sort for multi-file buckets even under the flag - verified) and
      // it elides the per-task re-sort under every co-bucketed SMJ.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    def fp(df: DataFrame): DataFrame = df.select(
      col("doc_id"),
      length(col("text")).as("fp_len"),
      xxhash64(col("text")).as("fp_x"),
      md5(col("text")).as("fp_m"))
    val docs = Tables.documents(spark, sfDir)
    val catalog = fp(docs.filter(col("doc_id") % 5 =!= 4))
      .select(col("fp_len"), col("fp_x"), col("fp_m")).distinct()
    val incoming = fp(docs.filter(col("doc_id") % 5 === 4))

    val catalogRows = catalog.count()
    val incomingRows = incoming.count()
    val bloom = incoming.stat.bloomFilter("fp_x", math.max(64L, incomingRows), 0.01)
    val bytesOut = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytesOut)
    val bloomBytes = bytesOut.toByteArray
    val prunedRows = catalog.filter(
      call_function("bloom_might_contain", lit(bloomBytes), col("fp_x"))).count()

    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = body
      (n, (System.nanoTime() - t0) / 1e9)
    }
    // Warm both paths once (scan cache, codegen), then measure best-of-3.
    def run(df: => DataFrame): Double = {
      df.count()
      (1 to 3).map(_ => timed(df.count())._2).min
    }
    val tExact = run(TextOps.dedupIncremental(spark, sfDir))
    val tBloom = run(TextOps.dedupBloomPrune(spark, sfDir))

    println(f"bloom_filter_bytes=${bloomBytes.length}")
    println(f"catalog_rows=$catalogRows incoming_rows=$incomingRows " +
      f"pruned_catalog_rows=$prunedRows factor=${catalogRows.toDouble / math.max(1, prunedRows)}%.1f")
    println(f"t_exact_best3=$tExact%.3f s  t_bloom_best3=$tBloom%.3f s (broadcast disabled)")
    spark.stop()
  }
}
