package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The sf100 heavy-relational drive (r14 verdict task #1): q9/q18/q21,
  * the outer joins, and the skew/salting paths had only ever run to sf10
  * — and the last two sf100 probes each caught a real scale defect (r13
  * pair-exchange rescore, r14 union output partitioning), so this band
  * is where the next one is most likely to live.
  *
  * For every key the drive (a) times the DECLARED query at sf100
  * (600 M lineitem / 150 M orders / 100 M events) and (b) proves the
  * answer with a PARITY leg:
  *
  *  - ×10 parity — GenData copies are FK-closed disjoint key ranges, so
  *    when a query's groups are keyed by REPLICATED attributes (names,
  *    types, categories, dates — not offset keys), each copy contributes
  *    exactly the sf10 result and the sf100 answer is the sf10 answer
  *    with ×10 counts/sums. Exact for q21 (s_name), q13 (c_count
  *    distribution), outer_join_orders (category), salted_heavy_hitters
  *    (event_type).
  *  - alt-plan parity — where values are copy-dependent (q9's derived
  *    partsupp cost, null_skew_join's user/customer domain mismatch,
  *    q18's global top-100), the same query re-runs with the shuffled
  *    join ALGORITHM flipped (shuffle-hash preferred over sort-merge,
  *    AQE coalescing off; broadcasts stay broadcasts — disabling them at
  *    sf100 re-shuffles 600 M lineitem rows per join and filled the
  *    disk on the first attempt) and must agree row-for-row: the defect
  *    class scale drives hunt (skipped exchanges, wrong partitioning
  *    claims, mis-zipped partitions) is plan-level, so two disagreeing
  *    plans would expose it.
  *  - direct-recompute parity — skew_join_zipf's right side is exactly
  *    the keys 0..996 = the full range of `k`, so the join is
  *    row-preserving by construction and a no-join aggregate over the
  *    left side must reproduce it.
  *
  * PER-LEG JVMs: a single q9 leg leaves ~30 GB of shuffle files that
  * only die with the process, so running default+alt in one JVM doubles
  * the disk footprint past this box's budget (measured: the in-process
  * form died ENOSPC on q9-alt twice). Each invocation therefore runs ONE
  * key in ONE plan mode, dumps its sorted rows to
  * /tmp/relscale/<key>.<mode>.tsv, and compares against the other leg's
  * dump when it exists.
  *
  * Usage: runMain graft.RelationalScaleExperiment <sf100Dir> <sf10Dir> <key> <mode>
  *   key  ∈ q9 | q18 | q21 | q13 | outer | nullskew | zipf | salted
  *   mode ∈ default | alt   (×10/direct-parity keys use default only)
  */
object RelationalScaleExperiment {
  def main(args: Array[String]): Unit = {
    val sf100 = args(0)
    val sf10 = args(1)
    val key = args(2)
    val mode = args.lift(3).getOrElse("default")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 4 * cpus.toInt)
      // see EXPERIMENTS.md r14 "union output partitioning" + the r15
      // UnionPartitioningPinSpec: UnionExec.doExecuteColumnar ignores the
      // claimed partitioning — pinned off in every session we build.
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (mode == "alt") {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    }

    val outDir = new File("/tmp/relscale"); outDir.mkdirs()
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
    }
    def rowsOf(df: DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    def dump(rows: Seq[Seq[Any]]): Unit =
      Files.write(Paths.get(s"/tmp/relscale/$key.$mode.tsv"),
        rows.map(_.mkString("\t")).mkString("\n").getBytes): Unit
    def cmp(got: Seq[Seq[Any]], want: Seq[Seq[Any]], how: String): Unit =
      if (got == want) println(s"  parity[$how] PASS (${got.length} rows)")
      else {
        println(s"  parity[$how] FAIL: got ${got.length} rows, want ${want.length}")
        got.diff(want).take(3).foreach(r => println(s"    got-only:  $r"))
        want.diff(got).take(3).foreach(r => println(s"    want-only: $r"))
      }
    /** Compare this leg's dump with the OTHER leg's, if already present. */
    def cmpLegs(rows: Seq[Seq[Any]]): Unit = {
      dump(rows)
      val other = new File(outDir, s"$key.${if (mode == "alt") "default" else "alt"}.tsv")
      if (other.exists()) {
        val want = scala.io.Source.fromFile(other).getLines().toSeq
        val got = rows.map(_.mkString("\t"))
        if (got == want) println(s"  parity[default-vs-alt] PASS (${got.length} rows)")
        else println(s"  parity[default-vs-alt] FAIL: ${got.length} vs ${want.length} rows; " +
          s"first diff: ${got.zipAll(want, "<missing>", "<missing>").find(p => p._1 != p._2)}")
      } else println(s"  (other leg not present yet — dumped ${rows.length} rows)")
    }
    def x10(df: DataFrame, scaleCols: Seq[Int]): Seq[Seq[Any]] =
      rowsOf(df).map(_.zipWithIndex.map {
        case (v: Long, i) if scaleCols.contains(i) => v * 10L
        case (v, _) => v
      })

    println(s"== $key [$mode] at $sf100 ==")
    import graft.operators.{EventOps, Relational, TpchOps}

    key match {
      case "q9" =>
        val (got, t) = timed(rowsOf(TpchOps.q9ProductProfit(spark, sf100)))
        println(f"q9_product_profit      ${t}%8.1f s  ${got.length} rows")
        cmpLegs(got)
      case "q18" =>
        val (got, t) = timed(rowsOf(Relational.q18LargeOrders(spark, sf100)))
        println(f"q18_large_orders       ${t}%8.1f s  ${got.length} rows")
        cmpLegs(got)
      case "q21" =>
        val (got, t) = timed(rowsOf(TpchOps.q21WaitingSupplier(spark, sf100)))
        println(f"q21_waiting_supplier   ${t}%8.1f s  ${got.length} rows")
        cmp(got, x10(TpchOps.q21WaitingSupplier(spark, sf10), Seq(1)), "sf10 x10")
      case "q13" =>
        val (got, t) = timed(rowsOf(TpchOps.q13CustomerDistribution(spark, sf100)))
        println(f"q13_customer_distrib   ${t}%8.1f s  ${got.length} rows")
        cmp(got, x10(TpchOps.q13CustomerDistribution(spark, sf10), Seq(1)), "sf10 x10")
      case "outer" =>
        val (got, t) = timed(rowsOf(Relational.outerJoinOrders(spark, sf100)))
        println(f"outer_join_orders      ${t}%8.1f s  ${got.length} rows")
        cmp(got, x10(Relational.outerJoinOrders(spark, sf10), Seq(1, 2, 3)), "sf10 x10")
      case "nullskew" =>
        val (got, t) = timed(rowsOf(EventOps.nullSkewJoin(spark, sf100)))
        println(f"null_skew_join         ${t}%8.1f s  ${got.length} rows")
        cmpLegs(got)
      case "zipf" =>
        val (got, t) = timed(rowsOf(EventOps.skewJoinZipf(spark, sf100)))
        println(f"skew_join_zipf         ${t}%8.1f s  ${got.length} rows")
        val nRight = graft.sources.Tables.orders(spark, sf100)
          .filter(col("o_orderkey") < 997).count()
        println(s"  right-side keys: $nRight (want 997)")
        val direct = rowsOf(
          graft.sources.Tables.events(spark, sf100).select(
            col("event_type"),
            when(pmod(col("event_id"), lit(10)) < 9, 0L)
              .otherwise(pmod(col("event_id"), lit(997))).as("k"))
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"))
            .orderBy(col("event_type")))
        cmp(got, direct, "direct no-join")
        val want10 = x10(EventOps.skewJoinZipf(spark, sf10), Seq(1))
          .map(r => Seq(r(0), r(1))) // n_events scales x10; sum_k is offset-dependent
        cmp(got.map(r => Seq(r(0), r(1))), want10, "sf10 x10 (n only)")
      // --- Expand band (r15 extension): rollup/grouping-sets push the
      // 150 M-order / 600 M-lineitem facts through ×3 Expand projections.
      // Groups key on replicated attributes → sf10 ×10 parity is exact
      // (quantity sums are integral doubles, exact under ×10 to 2^53).
      case "rollup" =>
        val (got, t) = timed(rowsOf(Relational.rollupOrders(spark, sf100)))
        println(f"rollup_orders          ${t}%8.1f s  ${got.length} rows")
        cmp(got, x10(Relational.rollupOrders(spark, sf10), Seq(2, 3)), "sf10 x10")
      case "gsets" =>
        val (got, t) = timed(rowsOf(Relational.groupingSetsLineitem(spark, sf100)))
        println(f"grouping_sets_lineitem ${t}%8.1f s  ${got.length} rows")
        val want = rowsOf(Relational.groupingSetsLineitem(spark, sf10)).map(_.zipWithIndex.map {
          case (v: Long, 2) => v * 10L
          case (v: Double, 3) => v * 10.0
          case (v, _) => v
        })
        cmp(got, want, "sf10 x10")

      // --- window band (r15 extension): per-user windows over 100 M
      // events. GenData offsets user_id per copy, so user partitions are
      // copy-disjoint and the sf100 result restricted to copy-0 users
      // (user_id < sf10's max+1) must equal the sf10 result EXACTLY.
      // Outputs are fact-sized (100 M rows), so the comparison is an
      // aggregate: row count + unordered sum of xxhash64 over all
      // columns (same engine both sides → a valid cross-SF hash), plus
      // total rows == 10× the sf10 count.
      case "winrun" | "winlag" | "sess" =>
        val (qname, q) = key match {
          case "winrun" => ("win_running_user", EventOps.winRunningUser _)
          case "winlag" => ("win_lag_delta", EventOps.winLagDelta _)
          case _ => ("sessionize", EventOps.sessionize _)
        }
        val nUser10 = graft.sources.Tables.events(spark, sf10)
          .agg(max(col("user_id"))).head().getLong(0) + 1
        def digest(df: DataFrame): (Long, String) = {
          val cols = df.columns.map(col)
          // decimal(38,0) sum: a Long sum of 100 M 64-bit hashes
          // overflows immediately under ANSI mode
          val r = df.agg(count(lit(1)),
            sum(xxhash64(cols: _*).cast("decimal(38,0)"))).head()
          (r.getLong(0), String.valueOf(r.getDecimal(1)))
        }
        val (big, t) = timed(digest(q(spark, sf100)))
        println(f"$qname%-22s ${t}%8.1f s  ${big._1} rows (digest ${big._2})")
        val small = digest(q(spark, sf10))
        val c0 = digest(q(spark, sf100).filter(col("user_id") < nUser10))
        println(if (c0 == small) s"  parity[copy-0 == sf10] PASS (${small._1} rows)"
          else s"  parity[copy-0 == sf10] FAIL: sf100-copy0 $c0 vs sf10 $small")
        println(if (big._1 == 10 * small._1) s"  parity[rows == 10x sf10] PASS"
          else s"  parity[rows == 10x sf10] FAIL: ${big._1} vs 10*${small._1}")
      case "salted" =>
        val (got, t) = timed(rowsOf(Relational.saltedHeavyHitters(spark, sf100)))
        println(f"salted_heavy_hitters   ${t}%8.1f s  ${got.length} rows")
        cmp(got, x10(Relational.saltedHeavyHitters(spark, sf10), Seq(1, 2)), "sf10 x10")
        val unsalted = rowsOf(
          graft.sources.Tables.events(spark, sf100).select(col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc"))
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_cents"))
            .orderBy(col("event_type")))
        cmp(got, unsalted, "unsalted direct")
      case other => sys.error(s"unknown key $other")
    }
    println("== leg complete ==")
    spark.stop()
  }
}
