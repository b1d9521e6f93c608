package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** A/B measurement for the Z-order layout (EXPERIMENTS.md): the same 2-D
  * box query over (a) a time-sorted layout (the default lake layout) and
  * (b) the Morton-clustered layout, comparing rows the parquet scan
  * actually DELIVERS after row-group/file pruning (the scan node's
  * numOutputRows, read post-execution) against the table size. AQE off so
  * the executed plan is the static one and metrics attribution is direct.
  */
object LayoutExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
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
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cents = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    val raw = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_us"), cents.as("cents"))
    val (umin, umax, tmin, tmax) =
      raw.agg(min(col("user_id")), max(col("user_id")), min(col("ts_us")), max(col("ts_us")))
        .as[(Long, Long, Long, Long)].collect()(0)
    val uSpan = umax - umin + 1
    val tSpan = tmax - tmin + 1
    val total = raw.count()

    def morton8(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      (0 until 8).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1))
      }.reduce(_ bitwiseOR _)

    val base = java.nio.file.Files.createTempDirectory("graft-layout").toString
    raw.orderBy(col("ts_us")).write.mode("overwrite").parquet(s"$base/bytime")
    raw.withColumn("z", morton8(
        expr(s"CAST(((user_id - $umin) * 256) DIV $uSpan AS INT)"),
        expr(s"CAST(((ts_us - $tmin) * 256) DIV $tSpan AS INT)")))
      .orderBy(col("z")).drop("z")
      .write.mode("overwrite").parquet(s"$base/zorder")
    GraftFunctions.register(spark)
    raw.withColumn("h", expr(
        s"hilbert_d(CAST(((user_id - $umin) * 256) DIV $uSpan AS INT), " +
          s"CAST(((ts_us - $tmin) * 256) DIV $tSpan AS INT))"))
      .orderBy(col("h")).drop("h")
      .write.mode("overwrite").parquet(s"$base/hilbert")

    // narrow slices (1/16 of each dimension) — the dashboard-query shape
    val (uLo, uHi) = (umin + uSpan / 4, umin + uSpan / 4 + uSpan / 16)
    val (tLo, tHi) = (tmin + tSpan / 4, tmin + tSpan / 4 + tSpan / 16)
    val userSlice = col("user_id") >= uLo && col("user_id") < uHi
    val timeSlice = col("ts_us") >= tLo && col("ts_us") < tHi
    def scanRows(path: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(path).filter(pred)
      val returned = df.count()
      // count() plans its own tree; re-run through execute() on the same
      // queryExecution so the scan metric belongs to this exact execution
      val qe = df.queryExecution
      qe.executedPlan.execute().count(): Unit
      val scanned = qe.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
      (scanned, returned)
    }
    println(f"total_rows=$total")
    Seq(
      ("2d_box", userSlice && timeSlice),
      ("user_slice", userSlice),
      ("time_slice", timeSlice)).foreach { case (name, pred) =>
      val (scanT, retT) = scanRows(s"$base/bytime", pred)
      val (scanZ, retZ) = scanRows(s"$base/zorder", pred)
      val (scanH, retH) = scanRows(s"$base/hilbert", pred)
      require(retT == retZ && retT == retH, s"$name: layouts disagree: $retT vs $retZ vs $retH")
      println(f"$name%-10s rows=$retT  bytime_scan=$scanT (${100.0 * scanT / total}%.1f%%)" +
        f"  zorder_scan=$scanZ (${100.0 * scanZ / total}%.1f%%)" +
        f"  hilbert_scan=$scanH (${100.0 * scanH / total}%.1f%%)" +
        f"  factor_z=${scanT.toDouble / math.max(1, scanZ)}%.1f" +
        f"  factor_h=${scanT.toDouble / math.max(1, scanH)}%.1f")
    }
    spark.stop()
  }
}
