package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  *
  * Queries are executed through the `noop` sink, not `count()`: count lets
  * Catalyst prune the entire projection (a scan-project query would measure
  * an empty aggregate), while noop evaluates every output column — the same
  * work DuckDB's fetchall-based BASELINE numbers include.
  *
  * Each query is timed on three round-robin passes over the whole set and
  * the best time reported — BASELINE.md's DuckDB numbers are best-of-3.
  * Passes (rather than back-to-back repeats) de-correlate the repeats from
  * transient host noise, and pass 1 absorbs every plan's Janino/JIT
  * compilation (±1 s on 25-row queries).
  *
  * File-staging policy: some queries stage intermediates to parquet via
  * [[graft.sources.Materialize]] (the MinHash signature table shared by
  * three dedup queries; the bucketed join's table writes). Staged FILES
  * survive `clearCache`, so every pass starts with `Materialize.reset` —
  * a stage computed in one pass can never subsidize the next. Within a
  * pass, the shared MinHash stage, the co-bucketed table writes and the
  * BPE tokenizer artifacts (merge table + encoded vocabulary) are
  * forced and timed as their own "stage_minhash" / "stage_bucketed" /
  * "stage_bpe" lines
  * (counted once in the total, like production signature-write and
  * bucketed-layout jobs — so bucketed_join_orders reports the steady-state
  * shuffle-free join, not the writes); self-contained stages (ngram
  * shingles, curate survivors) are paid inside their owning query's time.
  * The executor cache is additionally cleared before every query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    ScratchDirs.preferTmpfs() // no-op unless GRAFT_SCRATCH=tmpfs (timed run)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
      // Local-mode default inflates minPartitionNum to defaultParallelism,
      // splitting each ~5 MB fixture file 32 ways — pure task overhead.
      // 1 replicates cluster behavior (splits come from maxPartitionBytes,
      // so a 100 TB table still fans out); measured 33 s → 27 s total.
      .config("spark.sql.files.minPartitionNum", "1")
      // The Janino compiled-class cache defaults to 100 entries; this
      // session executes 320 queries × several codegen units × 3 passes,
      // so the cache thrashes and passes 2-3 RE-COMPILE every plan — the
      // best-of-3 protocol explicitly intends pass 1 to absorb
      // compilation (see the scaladoc above). Sized to hold the whole
      // suite's generated classes. This caches BYTECODE keyed on
      // generated source, never data or results; a production session
      // running a repeated query mix wants the same headroom (driver-side
      // memory, a few KB per entry).
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // 150 actions in one session accumulate status-store state whose
      // bookkeeping slows late job submission (measured 61 s → 37 s total);
      // cap retention — this is a metrics buffer, not execution state.
      .config("spark.sql.ui.retainedExecutions", "10")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: exercise codegen, the parquet reader and the whole query
    // machinery once, so the first timed query (Map order is arbitrary)
    // doesn't absorb session-startup JIT — BASELINE.md's DuckDB numbers are
    // best-of-3 and carry no such cost.
    spark.range(1 << 20).selectExpr("sum(id) AS s").collect()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Failure honesty: a query that throws must never appear as a (fast)
    // green line. `once` returns Left(error) on exception; a pass records a
    // time only on success, and a query that failed EVERY pass is omitted
    // from `queries`/total and reported under a top-level "errors" object.
    def errStr(e: Throwable): String =
      s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable => Left(errStr(e)) }
    }
    // args: [queryName ...] — optional subset filter for fast local
    // iteration on one query's timing; the driver passes no args and gets
    // the full suite (stages always run: staged queries need their files).
    val only = args.toSet
    val ordered = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
    val best = collection.mutable.Map.empty[String, Double]
    val errs = collection.mutable.Map.empty[String, String]
    def record(name: String, r: Either[String, Double]): Unit = r match {
      case Right(t) => if (t < best.getOrElse(name, Double.MaxValue)) best(name) = t
      case Left(e)  => errs(name) = e
    }
    for (_ <- 1 to 3) {
      graft.sources.Materialize.reset(spark)
      val t0 = System.nanoTime()
      record("stage_minhash",
        try { graft.operators.TextOps.stageDedupInputs(spark, sfDir); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => Left(errStr(e)) })
      val t1 = System.nanoTime()
      record("stage_bucketed",
        try { graft.operators.Relational.stageBucketedTables(spark, sfDir); Right((System.nanoTime() - t1) / 1e9) }
        catch { case e: Throwable => Left(errStr(e)) })
      val t2 = System.nanoTime()
      record("stage_stats",
        try { graft.operators.Relational.stageStatsTable(spark, sfDir); Right((System.nanoTime() - t2) / 1e9) }
        catch { case e: Throwable => Left(errStr(e)) })
      val t3 = System.nanoTime()
      record("stage_bpe",
        try { graft.operators.TextOps.stageBpeArtifacts(spark, sfDir); Right((System.nanoTime() - t3) / 1e9) }
        catch { case e: Throwable => Left(errStr(e)) })
      for ((name, fn) <- ordered) {
        spark.catalog.clearCache()
        record(name, once(fn))
      }
    }
    val results = (ordered.map(_._1) ++ Seq("stage_minhash", "stage_bucketed", "stage_stats", "stage_bpe"))
      .flatMap(name => best.get(name).map(name -> _)).toMap
    // escape ALL control chars too: exception messages routinely contain
    // newlines (ParseException prints the SQL), which would otherwise break
    // the one-line metric JSON and lose every successful timing with it
    def jstr(s: String) = "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
    // ASCENDING (slowest LAST): the driver's bounded capture keeps the END
    // of the line (a tail), so the slowest queries — the ones a reader
    // actually needs — must sit at the line's end. (r11 shipped this
    // descending, which put the slowest at the truncated FRONT; the
    // committed BENCH_LOCAL files carried the full record.)
    val qs = results.toSeq.sortBy { case (k, v) => (v, k) }
      .map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val failed = errs.keySet.diff(best.keySet)
    val errJson = failed.toSeq.sorted.map(k => jstr(k) + ":" + jstr(errs(k)))
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Regression visibility: diff this run against the PINNED per-SF
    // baseline BENCH_BASE-<sf>.json when present (refreshed deliberately
    // at round end, so every mid-round run diffs against the ROUND-START
    // state — r13's only real mover hid because the diff base was a
    // mid-round refresh of BENCH_LOCAL), else against the committed
    // BENCH_LOCAL artifact (read BEFORE it is overwritten below). Keys
    // >1.5x their baseline time surface in the metric line itself, so
    // ambient-vs-real is inspectable every run without cross-round
    // archaeology. Sub-0.5 s keys are skipped — at that scale the fixed
    // per-action scheduler cost dominates and 1.5x is pure jitter.
    val sfName = new java.io.File(sfDir).getName
    val baseFile = java.nio.file.Paths.get(s"BENCH_BASE-$sfName.json")
    val prevFile =
      if (java.nio.file.Files.exists(baseFile)) baseFile
      else java.nio.file.Paths.get(s"BENCH_LOCAL-$sfName.json")
    val regressions: Seq[(String, Double, Double)] =
      if (!java.nio.file.Files.exists(prevFile)) Seq.empty
      else try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(prevFile.toFile).get("queries")
        results.toSeq.flatMap { case (k, now) =>
          Option(node.get(k)).map(_.asDouble()) match {
            case Some(prev) if now > 0.5 && prev > 0 && now / prev > 1.5 =>
              Some((k, prev, now))
            case _ => None
          }
        }.sortBy { case (_, prev, now) => -(now / prev) }
      } catch { case _: Throwable => Seq.empty }
    val regJson = regressions.map { case (k, prev, now) =>
      jstr(k) + ":" + f"""{"prev":$prev%.3f,"now":$now%.3f,"ratio":${now / prev}%.2f}"""
    }.mkString("{", ",", "}")
    // n_queries makes a silently-omitted erroring query visible in the
    // metric line itself: a total over fewer queries than last round can't
    // masquerade as a speedup (driver ADVICE r6).
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},""" +
        s""""incomplete":${failed.nonEmpty},"scratch":${jstr(ScratchDirs.scratchRoot)},""" +
        s""""regressions":$regJson,"errors":$errJson,"sf":"$sfDir","queries":$qs}"""
    println(line)
    // Driver-parseable SUMMARY (r16): the driver captures a bounded stdout
    // TAIL, and the full line above (~12 KB with the 320-entry per-query
    // map inline) starts mid-JSON inside that tail — BENCH_r14/BENCH_r15
    // both carry parsed:null for exactly this reason. This second, compact,
    // FINAL line repeats the headline numbers and as many of the SLOWEST
    // per-query timings (ms precision) as fit a ~1.4 KB budget, so a
    // bounded tail always ends with one complete parseable JSON line. The
    // full-precision record of every key stays in the full line and in the
    // committed BENCH_LOCAL artifacts; nothing is measured differently.
    val summaryBudget = 1400
    val slowDesc = results.toSeq.sortBy { case (k, v) => (-v, k) }
    def summaryLine(nKeys: Int): String = {
      val kept = slowDesc.take(nKeys).sortBy { case (k, v) => (v, k) }
        .map { case (k, v) => jstr(k) + ":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},""" +
        s""""incomplete":${failed.nonEmpty},"n_errors":${failed.size},""" +
        s""""n_regressions":${regressions.size},"sf":"$sfDir","queries":$kept}"""
    }
    val summary = (results.size to 0 by -1).iterator.map(summaryLine)
      .find(_.length <= summaryBudget).getOrElse(summaryLine(0))
    println(summary)
    // The driver captures stdout with a bounded tail that has truncated
    // ~17 per-query timings per round; the full line committed as a repo
    // artifact keeps every timing comparable across rounds. The per-SF
    // file survives a later run at another SF (plain BENCH_LOCAL.json is
    // always the LATEST run and would otherwise silently replace it).
    // A filtered run is an iteration aid — never let it replace the
    // full-suite artifacts the rounds compare against.
    // Write the per-SF BENCH_LOCAL artifact, NEVER the pinned BENCH_BASE
    // (prevFile may point there — it is the round-start diff baseline and
    // only round-end bookkeeping refreshes it).
    if (only.isEmpty) try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), line + "\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"BENCH_LOCAL-$sfName.json"), line + "\n"): Unit
    } catch { case e: Throwable => System.err.println(s"[bench] BENCH_LOCAL write failed: $e") }
    spark.stop()
  }
}
