package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Spill-forcing scale probe (driver VERDICT r8 #6): run the heaviest
  * relational queries under a DELIBERATELY small executor budget and
  * measure whether the engine's plans degrade gracefully to disk instead
  * of dying — the property a 100 TB run actually depends on (every real
  * shuffle sort exceeds memory somewhere; the question is spill, not
  * crash).
  *
  * Knobs (env): `SPARK_GRAFT_SF_DIR` (fixture), `SPARK_DRIVER_MEM`
  * (heap — the build's fork option; use e.g. 2g to force spills at
  * sf10), `GRAFT_SPILL_PARTITIONS` (shuffle width, default 8 — small on
  * purpose: fewer, larger sort runs per task).
  *
  * Output: one JSON line per query with wall seconds and the stage-metric
  * spill totals (`memoryBytesSpilled` = bytes that left the in-memory
  * sorter, `diskBytesSpilled` = bytes actually written), then a summary
  * line. Spill metrics come from the TaskEnd listener — the same numbers
  * the Spark UI shows.
  */
object SpillExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val parts = sys.env.getOrElse("GRAFT_SPILL_PARTITIONS", "8")
    // GRAFT_BROADCAST_THRESHOLD (bytes) sizes broadcast builds against the
    // heap under test: the 2 g run proved sort spill degrades gracefully
    // while an AQE broadcast build is a hard OOM — capping the threshold
    // flips those joins to SMJ, which spills instead.
    val bcast = sys.env.getOrElse("GRAFT_BROADCAST_THRESHOLD", "10485760")
    // r13: optional extra pressure — shrink the unified-memory region so
    // execution memory starves even under a roomier heap (the r12 verdict's
    // spill prescription for the exchange-heavy dedup/ANN band)
    val memFraction = sys.env.getOrElse("GRAFT_MEMORY_FRACTION", "0.6")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
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
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.minPartitionNum", "1")
      .config("spark.sql.autoBroadcastJoinThreshold", bcast)
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", bcast)
      .config("spark.memory.fraction", memFraction)
      .getOrCreate()

    val memSpilled = new java.util.concurrent.atomic.AtomicLong
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled): Unit
          diskSpilled.addAndGet(m.diskBytesSpilled): Unit
        }
      }
    })

    // r13: GRAFT_SPILL_BAND=dedup runs the exchange-heaviest dedup/ANN
    // plans instead (the shuffle-hash rescore pins from the sf10 OOM fix
    // made these the most exchange-intensive subplans in the repo); their
    // results are written to GRAFT_SPILL_OUT for value-equality comparison
    // against an unforced Verify run — "completes" is not enough, the
    // spilled plans must MATCH.
    val band = sys.env.getOrElse("GRAFT_SPILL_BAND", "relational")
    val outDir = sys.env.get("GRAFT_SPILL_OUT")
    val dedupQueries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "dedup_docs_minhash" -> operators.TextOps.dedupDocsMinhash _,
      "jaccard_join_exact" -> operators.TextOps.jaccardJoinExact _,
      "embedding_near_dup" -> operators.VectorOps.embeddingNearDup _,
      "semdedup_decisions" -> operators.VectorOps.semdedupDecisions _)
    val relationalQueries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "q1_pricing_summary" -> operators.Relational.q1PricingSummary _,
      "join_nation_revenue" -> operators.Relational.joinNationRevenue _,
      "q3_top_orders" -> operators.Relational.q3TopOrders _,
      "q5_local_supplier" -> operators.Relational.q5LocalSupplier _,
      "outer_join_orders" -> operators.Relational.outerJoinOrders _,
      // r10 additions — the round's aggregation/window-heavy new queries:
      // the CMS token-stream aggregate and the per-type z-score window
      // (WindowExec buffers whole partitions → the classic sort-spill path)
      "cms_token_counts" -> operators.TextAnalysisOps.cmsTokenCounts _,
      "win_zscore_events" -> operators.EventOps.winZscoreEvents _,
      // r10 continuation — the two reshaped heavy queries (profile must
      // stay HashAggregate under pressure; the auto-rewritten band join
      // must never fall back to a nested loop) plus the robust-stats scan
      "table_profile_lineitem" -> operators.Relational.tableProfileLineitem _,
      "band_join_auto" -> operators.EventOps.bandJoinAuto _,
      "mad_outliers" -> operators.EventOps.madOutliers _)
    val queries = if (band == "dedup") dedupQueries else relationalQueries

    var totalSec = 0.0
    val lines = queries.map { case (name, q) =>
      memSpilled.set(0); diskSpilled.set(0)
      val t0 = System.nanoTime()
      val n = outDir match {
        case Some(dir) =>
          q(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
          spark.read.parquet(s"$dir/$name").count().toInt
        case None => q(spark, sfDir).collect().length
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are posted async; drain before reading counters
      org.apache.spark.sql.graftbridge.GraftListenerBridge.drain(spark.sparkContext)
      totalSec += sec
      val line = f"""{"query":"$name","sec":$sec%.3f,"rows":$n,""" +
        s""""mem_spilled":${memSpilled.get},"disk_spilled":${diskSpilled.get}}"""
      println(line)
      line
    }
    println(s"""{"metric":"spill_total","sec":$totalSec,"sf":"$sfDir",""" +
      s""""heap":"${Runtime.getRuntime.maxMemory() / (1 << 20)}m","parts":$parts,""" +
      s""""queries":${lines.size}}""")
    spark.stop()
  }
}
