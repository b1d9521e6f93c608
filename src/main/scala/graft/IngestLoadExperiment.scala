package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-ingest load scaling (r12 verdict task: the declared
  * stream_dedup_minhash / stream_ann_topk entries ride bounded 2000-row
  * harness slices — measure how the PER-TRIGGER cost actually grows with
  * |batch|, the claimed contract of SCALING.md's ingest section).
  *
  * Times the exact foreachBatch bodies the streaming entries run —
  * [[graft.operators.TextOps.admitAgainstCatalog]] (signatures computed
  * on the arriving rows, banded batch × STAGED-catalog join, exact verify
  * on implicated docs) and cos_topk's broadcast-queries kernel — at
  * doubling batch sizes against the same standing catalog/corpus. The
  * MemoryStream plumbing is deliberately excluded: it is harness, its
  * cost is per-trigger-constant, and the production contract is about the
  * admission JOIN's growth, which these bodies are.
  *
  * Usage: runMain graft.IngestLoadExperiment [sfDir] [maxDocs]
  */
object IngestLoadExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxDocs = args.lift(1).map(_.toInt).getOrElse(16000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      .config("spark.sql.files.minPartitionNum", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = body; (n, (System.nanoTime() - t0) / 1e9)
    }

    // the standing assets a production ingest maintains: staged signature
    // catalog (dedup) — built once, untimed, like the entries do
    graft.operators.TextOps.stageDedupInputs(spark, sfDir)

    val arrivals = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
    val available = arrivals.count()

    println(s"== dedup admission per-trigger cost, sf=$sfDir, catalog staged, " +
      s"${available} arrival docs available ==")
    println(f"${"batch"}%8s ${"decisions"}%10s ${"dups"}%6s ${"sec"}%8s ${"sec/1k"}%8s")
    var size = 500
    while (size <= maxDocs && size <= available * 2) {
      val n = math.min(size.toLong, available).toInt
      val batch = arrivals.limit(n)
      val sigs = graft.operators.TextOps.signatures(batch)
      val (dups, t) = timed {
        val d = graft.operators.TextOps
          .admitAgainstCatalog(spark, sfDir, batch, sigs)
          .groupBy(col("status")).agg(count(lit(1)).as("c"))
          .collect()
        d.find(_.getString(0) == "dup").map(_.getLong(1)).getOrElse(0L)
      }
      println(f"$n%8d ${n}%10d $dups%6d $t%8.2f ${t * 1000 / n}%8.3f")
      size *= 2
    }

    // Growing-catalog maintenance (r13 verdict task #1): the r13 shape
    // re-read the FULL catalog/b* glob every trigger and added one dir
    // per trigger, so per-trigger cost grew with trigger COUNT. Drive the
    // r14 bucketed+compacted catalog (GrowingCatalog) over 24 triggers of
    // FIXED batch size and a steady-state catalog (each trigger re-feeds
    // the same texts under fresh doc_ids, so trigger 0 admits them and
    // every later trigger resolves them as dups of the trigger-0
    // admissions — catalog content stops growing, isolating the
    // trigger-COUNT axis, exactly the axis the old shape degraded on).
    // Evidence = per-trigger seconds flat from trigger 2 to trigger 23,
    // and catalog data-file count sawtoothing within O(buckets), not
    // O(triggers).
    val growRoot = new java.io.File("target/graft-ingest-growing").getAbsoluteFile
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe); f.delete(): Unit
    }
    wipe(growRoot); growRoot.mkdirs()
    val triggers = args.lift(2).map(_.toInt).getOrElse(24)
    val perTrigger = 500
    val feed = arrivals.limit(perTrigger)
      .select(col("doc_id"), col("text")).cache()
    feed.count(): Unit
    println(s"== growing-catalog per-trigger cost over $triggers triggers " +
      s"($perTrigger docs/trigger, compaction every 4) ==")
    println(f"${"trigger"}%8s ${"decisions"}%10s ${"sec"}%8s ${"cat_files"}%10s")
    (0 until triggers).foreach { t =>
      val batch = feed.select(
        (col("doc_id") + lit(t.toLong * 10000000L)).as("doc_id"), col("text"))
      val (_, sec) = timed {
        graft.streaming.GrowingCatalog.processTrigger(
          spark, sfDir, growRoot, batch, t.toLong, compactEvery = 4)
        0L
      }
      val n = spark.read.parquet(new java.io.File(growRoot, s"decisions/b$t").getPath).count()
      println(f"$t%8d $n%10d $sec%8.2f ${graft.streaming.GrowingCatalog.dataFileCount(growRoot)}%10d")
    }
    feed.unpersist(): Unit

    // ANN sibling: per-trigger cost = one corpus scan x |batch| broadcast
    // queries (the stream_ann_topk body)
    val queries = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id"))
    println(s"== ann top-k per-trigger cost (broadcast queries x corpus scan) ==")
    println(f"${"batch"}%8s ${"answers"}%10s ${"sec"}%8s ${"sec/query"}%10s")
    Seq(50, 100, 200, 400).foreach { q =>
      val batch = queries.limit(q)
      val (rows, t) = timed {
        graft.operators.VectorOps.topkForQueries(spark, sfDir, batch).count()
      }
      println(f"$q%8d $rows%10d $t%8.2f ${t / q}%10.4f")
    }
    spark.stop()
  }
}
