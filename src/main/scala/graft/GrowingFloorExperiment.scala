package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Floor attribution for `stream_dedup_growing`'s bench time (r14
  * verdict task #6: "trim or floor-document the 11 s — now 2× the
  * next-slowest key"). Runs the declared entry's EXACT loop — the same
  * 2,000-doc sf slice in 3 MemoryStream triggers through
  * [[graft.streaming.GrowingCatalog.processTrigger]] with
  * compactEvery=2 — with per-phase wall clocks inside each trigger
  * (bkts collect / admission write / two delta writes / compaction) and
  * the MemoryStream+query machinery timed as the remainder. The stage_*
  * asset build is reported separately, exactly like Bench's stage_
  * accounting. The question this answers: how much of the bench number
  * is the admission plan (the thing that scales) vs fixed per-action
  * dispatch and harness (the thing that doesn't).
  *
  * Usage: runMain graft.GrowingFloorExperiment [sfDir]
  */
object GrowingFloorExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      .config("spark.sql.files.minPartitionNum", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // untimed staging, mirroring Bench's stage_ accounting
    val tStage0 = System.nanoTime()
    graft.operators.TextOps.stageDedupInputs(spark, sfDir)
    val tStage = (System.nanoTime() - tStage0) / 1e9

    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def hook(name: String, sec: Double): Unit =
      phases.updateWith(name)(v => Some(v.getOrElse(0.0) + sec)): Unit

    val base = new java.io.File("target/graft-floor-growing").getAbsoluteFile
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe); f.delete(): Unit
    }
    wipe(base); base.mkdirs()

    val slice = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(2000)
      .as[(Long, String)].collect().toSeq

    val t0 = System.nanoTime()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.streaming.GrowingCatalog.processTrigger(
          batch.sparkSession, sfDir, base,
          batch.select(col("doc_id"), col("text")), batchId,
          compactEvery = 2, phaseHook = hook): Unit
      }
      .start()
    try
      slice.grouped(math.max(1, (slice.size + 2) / 3)).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    finally q.stop()
    spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    val tTotal = (System.nanoTime() - t0) / 1e9
    val read = spark.read.parquet(new java.io.File(base, "decisions/b*").getPath).count()

    val tPhases = phases.values.sum
    println(s"== stream_dedup_growing floor attribution, sf=$sfDir, $read decisions ==")
    println(f"stage_dedup_inputs (untimed by Bench key): $tStage%6.2f s")
    phases.foreach { case (k, v) => println(f"  $k%-14s $v%6.2f s") }
    println(f"  ${"phases_total"}%-14s $tPhases%6.2f s")
    println(f"  ${"harness_rest"}%-14s ${tTotal - tPhases}%6.2f s  (MemoryStream/query machinery + decision readback)")
    println(f"  ${"wall_total"}%-14s $tTotal%6.2f s")
    spark.stop()
  }
}
