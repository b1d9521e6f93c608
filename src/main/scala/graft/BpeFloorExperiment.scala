package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** stage_bpe cost attribution (r12 verdict task: "fold the remaining 8
  * sequential jobs or write the floor argument"): is the ~3 s a data term
  * (optimizable plan work) or the fixed per-action dispatch cost of the 8
  * inherently sequential argmax jobs (a local-mode floor)?
  *
  * Prints four numbers on one fixture:
  *   1. cold stage_bpe end-to-end (Materialize reset first — the exact
  *      thing Bench times);
  *   2. the one-off vocab-collapse action (corpus → distinct-word table);
  *   3. 8 argmax-SHAPED jobs over the CACHED vocab without the fold
  *      chain — the same explode→groupBy→top-1 job the trainer runs per
  *      round, minus the merge recurrence, so the delta vs (4) is the
  *      per-round DATA term;
  *   4. 8 trivial actions (count() on a cached 1-row DF) — pure
  *      scheduler/dispatch floor.
  *
  * BPE's greedy recurrence makes round r+1's counting job depend on round
  * r's argmax, so the trainer cannot run fewer than one action per merge
  * round without changing the merge table; if (3) ≈ (4), the residual is
  * local-mode dispatch, not plan work, and vanishes at real data volume
  * where the counting job's data term dominates.
  *
  * Usage: runMain graft.BpeFloorExperiment [sfDir]
  */
object BpeFloorExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // (1) cold end-to-end, twice (second run shows staging-cache warmth)
    graft.sources.Materialize.reset(spark)
    val tCold = timed(graft.operators.TextOps.stageBpeArtifacts(spark, sfDir))
    graft.sources.Materialize.reset(spark)
    val tCold2 = timed(graft.operators.TextOps.stageBpeArtifacts(spark, sfDir))

    // (2) vocab collapse alone
    val vocab = graft.operators.TextOps.bpeVocab(spark, sfDir)
    val tVocab = timed(vocab.count(): Unit)

    // (3) 8 argmax-shaped jobs over the cached vocab, no fold chain
    val cached = vocab.persist()
    cached.count() // materialize the cache outside the timed region
    val perRound = (1 to 8).map { _ =>
      timed {
        cached.filter(size(col("syms")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(slice(syms, 1, size(syms) - 1), (x, i) -> concat(x, ' ', element_at(syms, i + 2)))"))
            .as("pair"))
          .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(1).collect(): Unit
      }
    }
    cached.unpersist()

    // (4) trivial-action dispatch floor
    val one = spark.range(1).toDF("x").persist()
    one.count()
    val perTrivial = (1 to 8).map(_ => timed(one.count(): Unit))
    one.unpersist()

    println(f"stage_bpe cold: $tCold%.2f s (repeat: $tCold2%.2f s)")
    println(f"vocab collapse: $tVocab%.2f s")
    println(f"argmax-shaped jobs on cached vocab: total ${perRound.sum}%.2f s, " +
      f"per-round ${perRound.sum / 8}%.3f s (${perRound.map(t => f"$t%.3f").mkString(",")})")
    println(f"trivial cached count() x8: total ${perTrivial.sum}%.2f s, " +
      f"per-action ${perTrivial.sum / 8}%.3f s")
    spark.stop()
  }
}
