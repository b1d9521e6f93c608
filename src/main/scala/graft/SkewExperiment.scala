package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Salting
import graft.sources.Generators

/** Empirical skew study (EXPERIMENTS.md "skew" section): measures, on an
  * actually-skewed key distribution, when the [[Salting]] utilities win
  * over the naive plan and over AQE's runtime skew-split — replacing
  * SCALING.md's prior assertion with numbers.
  *
  * Fixture: [[Generators.zipfKeyed]] — deterministic power-law keys where
  * the single heaviest key draws ~18% of all rows, so one reducer/join
  * task gets ~6× the average partition at 32 shuffle partitions.
  *
  * Three questions, each naive-vs-mitigated:
  *  1. Aggregation: does salted two-phase count/sum beat a naive
  *     groupBy? (Expectation: NO — hash aggregation already runs a
  *     partial aggregate per mapper, so at most |keys| rows per mapper
  *     cross the shuffle regardless of skew. Salting only pays off when
  *     partial aggregation is ineffective.)
  *  2. Shuffle join vs a non-broadcastable dim: naive SMJ (AQE off) vs
  *     AQE skew-split vs salted join. Here the heavy key's rows all land
  *     in ONE join task — the real skew victim.
  *  3. The same join with the dim BROADCAST — the plan that sidesteps the
  *     shuffle entirely and is the first choice whenever the dim fits.
  *
  * Usage: runMain graft.SkewExperiment [nRows] [nKeys]
  * (AQE/broadcast settings are toggled per-variant at runtime.)
  */
object SkewExperiment {

  private def timeNoop(df: => DataFrame, reps: Int = 3): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val keys = args.lift(1).map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
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
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.minPartitionNum", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.conf

    val fact = Generators.zipfKeyed(spark, n, keys, alpha = 4.0)
    val dim = spark.range(keys.toLong).select(
      col("id").as("key"),
      concat(lit("attr_"), col("id") % 17).as("attr"))

    // verify the skew is real before measuring anything against it
    val top = fact.groupBy("key").count().orderBy(desc("count")).limit(3).collect()
    val heavyShare = top.head.getLong(1).toDouble / n
    println(f"fixture: n=$n keys=$keys heavy_key=${top.head.getLong(0)} share=${heavyShare * 100}%.1f%%")

    def aqe(on: Boolean, skewSplit: Boolean = false): Unit = {
      conf.set("spark.sql.adaptive.enabled", on.toString)
      conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit.toString)
      // the default 256 MB trigger never fires at this fixture size; at
      // cluster scale partitions are sized near the default target, so a
      // proportionally scaled-down trigger is the faithful local model
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    }
    def broadcastJoins(on: Boolean): Unit =
      conf.set("spark.sql.autoBroadcastJoinThreshold", if (on) "10MB" else "-1")

    val results = collection.mutable.LinkedHashMap.empty[String, Double]

    // 1. aggregation: partial agg already defeats key skew
    aqe(on = false); broadcastJoins(on = false)
    results("agg_naive") = timeNoop(
      fact.groupBy("key").agg(count(lit(1)).as("n"), sum("value").as("sum")))
    results("agg_salted") = timeNoop(Salting.saltedCountSum(fact, "key", "value", 32))

    // 2. shuffle join (dim declared non-broadcastable)
    broadcastJoins(on = false)
    aqe(on = false)
    results("join_smj_naive") = timeNoop(fact.join(dim, "key"))
    aqe(on = true, skewSplit = true)
    results("join_smj_aqe_skewsplit") = timeNoop(fact.join(dim, "key"))
    aqe(on = false)
    results("join_salted") = timeNoop(Salting.saltedJoin(fact, dim, "key", 32))

    // 3. the broadcast escape hatch
    aqe(on = false); broadcastJoins(on = true)
    results("join_broadcast") = timeNoop(fact.join(broadcast(dim), "key"))

    results.foreach { case (k, v) => println(f"$k%-24s $v%8.2f s") }
    spark.stop()
  }
}
