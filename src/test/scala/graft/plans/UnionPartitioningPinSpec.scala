package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.{SparkPlan, UnionExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Guard for the `spark.sql.unionOutputPartitioning=false` pin (r14
  * found-at-scale; EXPERIMENTS.md "union output partitioning").
  *
  * Root cause, pinned down precisely this round by bytecode inspection
  * and a deterministic repro: with the flag on, `UnionExec
  * .outputPartitioning` CLAIMS the children's shared hash partitioning,
  * and the row path (`doExecute`) honors it via
  * `SQLPartitioningAwareUnionRDD` — consistent. But
  * **`doExecuteColumnar` ignores the claim** and always executes the
  * plain `sparkContext.union` concatenation (p+p partitions), so ANY
  * columnar union under the claim mis-executes: downstream consumers
  * skip their exchange (the claim says the data is already partitioned)
  * while the rows actually arrive concatenated — a zip crash when the
  * consumer is an SMJ (the loud sf100 form), silently split groups when
  * it is an aggregate (the form that returns WRONG ANSWERS). The
  * minimal deterministic repro is a union of two same-bucketing bucketed
  * table scans (columnar FileScans reporting HashPartitioning) with
  * overlapping keys, aggregated: under the claim every group that
  * straddles the two sides comes back duplicated.
  *
  * Two cases: (1) under the pin the exchange is restored and the result
  * correct — the property every session builder relies on; (2) a
  * tripwire that re-runs the repro with the pin LIFTED — while the bug
  * is present it asserts the wrong answer is exactly the known
  * split-groups form; the day a Spark upgrade makes it pass, it
  * `cancel`s with instructions to re-evaluate the pin (visible in every
  * run without going red).
  */
class UnionPartitioningPinSpec extends AnyFunSuite with SparkTestBase {

  private val Rows = 400L

  /** Two bucketed tables with IDENTICAL doc_id sets (every group
    * straddles the union), bucketed by the aggregate key so both scans
    * are columnar and report HashPartitioning(doc_id, 4).
    */
  private def ensureTables(): Unit = {
    val spark2 = spark
    import spark2.implicits._
    if (!spark.catalog.tableExists("upin_static")) {
      // the warehouse DIR outlives the in-memory catalog (fresh per JVM):
      // drop any orphaned location from a previous test JVM or CTAS
      // errors with LOCATION_ALREADY_EXISTS
      Seq("upin_static", "upin_admit").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        def wipe(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe); f.delete(): Unit
        }
        wipe(loc)
      }
      (0L until Rows).map(i => (i, s"s$i")).toDF("doc_id", "text")
        .write.mode("overwrite").bucketBy(4, "doc_id").saveAsTable("upin_static")
      (0L until Rows).map(i => (i, s"a$i")).toDF("doc_id", "text")
        .write.mode("overwrite").bucketBy(4, "doc_id").saveAsTable("upin_admit")
    }
  }

  private def reproShape(): DataFrame =
    spark.table("upin_static").unionByName(spark.table("upin_admit"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))

  private def withConf[A](unionPin: Boolean)(f: DataFrame => A): A = {
    ensureTables()
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.unionOutputPartitioning").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.unionOutputPartitioning", unionPin.toString)
      f(reproShape())
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  private def findUnion(p: SparkPlan): Option[UnionExec] =
    p.collectFirst { case u: UnionExec => u }

  private def collectCounts(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("pinned (=false): bucketed-scan union claims nothing; exchange restored; groups merge correctly") {
    withConf(unionPin = false) { df =>
      val plan = df.queryExecution.executedPlan
      val union = findUnion(plan).getOrElse(fail(s"repro lost its UnionExec:\n$plan"))
      // repro preconditions: both children are bucketed columnar scans
      // reporting hash(doc_id, 4) — or the guard is vacuous
      assert(union.children.size == 2)
      union.children.foreach { c =>
        assert(c.outputPartitioning.isInstanceOf[HashPartitioning],
          s"child no longer bucket-partitioned — repro drifted:\n$c")
      }
      assert(union.supportsColumnar,
        "union children stopped being columnar — repro drifted")
      // the pin's effect: no claimed hash partitioning on the union…
      assert(!union.outputPartitioning.isInstanceOf[HashPartitioning],
        s"pin inactive: union claims ${union.outputPartitioning}")
      // …so the aggregate's exchange is present above the union
      def exchangeAboveUnion(p: SparkPlan): Boolean = p match {
        case _: UnionExec => false
        case e: ShuffleExchangeExec =>
          e.exists(_.isInstanceOf[UnionExec]) || e.children.exists(exchangeAboveUnion)
        case other => other.children.exists(exchangeAboveUnion)
      }
      assert(exchangeAboveUnion(plan), s"no exchange above the union:\n$plan")
      // and every straddling group merges
      assert(collectCounts(df) == (0L until Rows).map(i => (i, 2L)))
    }
  }

  test("tripwire (=true): Spark 4.1 columnar-union split-groups bug still present — lift the pin when this cancels") {
    withConf(unionPin = true) { df =>
      val plan = df.queryExecution.executedPlan
      val union = findUnion(plan).getOrElse(fail(s"repro lost its UnionExec:\n$plan"))
      val claimed = union.outputPartitioning
      val got = collectCounts(df)
      val want = (0L until Rows).map(i => (i, 2L))
      if (got == want)
        cancel("the bucketed columnar-union repro now aggregates CORRECTLY under " +
          "unionOutputPartitioning=true — Spark may have fixed UnionExec." +
          "doExecuteColumnar ignoring the claimed partitioning; re-evaluate " +
          "lifting the pin (EXPERIMENTS.md 'union output partitioning') from " +
          "all session builders.")
      // while the bug lives, it must be EXACTLY the known one: the union
      // claims the children's hash partitioning, the aggregate skips its
      // exchange, and every straddling group splits in two
      assert(claimed.isInstanceOf[HashPartitioning],
        s"result wrong but union claims $claimed — different bug?\n$plan")
      assert(got.length == 2 * Rows && got.forall(_._2 == 1L),
        s"expected fully split groups, got ${got.take(5)}... (${got.length} rows)")
    }
  }
}
