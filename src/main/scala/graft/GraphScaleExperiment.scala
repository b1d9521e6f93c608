package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distributed connected-components on REAL dedup data (r13 verdict task
  * #3): the large-graph label-propagation path of
  * [[graft.operators.TextOps.componentLabels]] had only ever run on a
  * synthetic closed-form graph (PipelineOpsSpec), because even the sf100
  * dedup graph (≈0.7 M edges) rides under the 1 M driver-union-find gate.
  * This main drives BOTH paths on the actual sf100 MinHash candidate
  * graph — skewed cluster sizes, real diameter — times them, and
  * cross-checks the label relations EXCEPT-empty both ways.
  *
  * Usage: runMain graft.GraphScaleExperiment [sfDir]
  * (The graph BAND keys — pagerank_docs, kcore_docs, doc_hop_distance,
  * dedup_clusters — run through graft.BandRun, which already handles
  * probe-scale outputs; this main covers the forced-distributed seam
  * BandRun can't reach, since the declared keys choose the path by edge
  * count.)
  */
object GraphScaleExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf100")
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
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.minPartitionNum", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pairs = graft.operators.TextOps.minhashCandidates(spark, sfDir)
      .select(col("doc1"), col("doc2")).persist()
    val nEdges = pairs.count()
    println(s"== componentLabels on the real $sfDir dedup graph: $nEdges edges ==")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
    }
    // driver union-find (the small path — reference labels)
    val (small, tSmall) = timed {
      val df = graft.operators.TextOps.componentLabels(spark, pairs).persist()
      (df, df.count())
    }
    println(f"small path (driver union-find):      ${tSmall}%8.1f s, ${small._2} labeled ids")
    // forced distributed label propagation on the SAME real graph
    val (large, tLarge) = timed {
      val df = graft.operators.TextOps.componentLabels(spark, pairs, smallLimit = 0L).persist()
      (df, df.count())
    }
    println(f"large path (label propagation):      ${tLarge}%8.1f s, ${large._2} labeled ids")
    val onlySmall = small._1.exceptAll(large._1).count()
    val onlyLarge = large._1.exceptAll(small._1).count()
    println(s"label diff: small∖large=$onlySmall, large∖small=$onlyLarge " +
      (if (onlySmall == 0 && onlyLarge == 0) "(IDENTICAL)" else "(MISMATCH!)"))
    val nClusters = small._1.select(col("lbl")).distinct().count()
    val maxCluster = small._1.groupBy(col("lbl")).count().agg(max(col("count"))).collect()(0).getLong(0)
    println(s"graph shape: $nClusters components, largest=$maxCluster members")
    spark.stop()
  }
}
