package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase

/** Streaming ↔ batch parity (SURVEY.md §5.2.4): the same rows fed through
  * MemoryStream with the streaming aggregation must equal the batch
  * aggregation, and `session_window` must agree with the lag+cumsum
  * sessionize on session counts.
  */
case class Ev(event_id: Long, ts_us: Long, user_id: Long, event_type: String, value: Double)

class StreamingParitySpec extends AnyFunSuite with SparkTestBase {

  test("tumbling window: MemoryStream result == batch result") {
    import spark.implicits._
    val batchEvents = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq

    val stream = MemoryStream[Ev](spark)
    stream.addData(batchEvents)
    val streamingDf = stream.toDF().withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val q = StreamingQueries.tumblingStream(streamingDf)
      .writeStream.format("memory").queryName("graft_tumbling_parity")
      .outputMode("complete").trigger(Trigger.Once()).start()
    q.awaitTermination(120000)

    val streamed = spark.sql(
      "SELECT ws_us, event_type, n, sum_cents FROM graft_tumbling_parity ORDER BY ws_us, event_type")
      .collect().toSeq
    val batch = StreamingQueries.tumblingAgg(
        graft.sources.Tables.events(spark, sf0001))
      .orderBy(col("ws_us"), col("event_type")).collect().toSeq
    assert(streamed == batch)
  }

  test("sliding window: MemoryStream result == batch result") {
    import spark.implicits._
    val batchEvents = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq

    val stream = MemoryStream[Ev](spark)
    stream.addData(batchEvents)
    val streamingDf = stream.toDF().withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val q = StreamingQueries.slidingStream(streamingDf)
      .writeStream.format("memory").queryName("graft_sliding_parity")
      .outputMode("complete").trigger(Trigger.Once()).start()
    q.awaitTermination(120000)

    val streamed = spark.sql(
      "SELECT ws_us, event_type, n, sum_cents FROM graft_sliding_parity ORDER BY ws_us, event_type")
      .collect().toSeq
    val batch = StreamingQueries.slidingAgg(
        graft.sources.Tables.events(spark, sf0001))
      .orderBy(col("ws_us"), col("event_type")).collect().toSeq
    assert(streamed == batch)
  }

  test("stream-stream interval join: MemoryStream result == batch result") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts_utc", timestamp_micros(col("ts_us")))

    val pStream = MemoryStream[Ev](spark)
    val sStream = MemoryStream[Ev](spark)
    pStream.addData(ev.filter(_.event_type == "purchase"))
    sStream.addData(ev.filter(_.event_type == "signup"))
    val q = StreamingQueries.purchaseSignupStream(
        withTs(pStream.toDF()), withTs(sStream.toDF()))
      .writeStream.format("memory").queryName("graft_ssj_parity")
      .outputMode("append").trigger(Trigger.Once()).start()
    q.awaitTermination(120000)

    val streamed = spark.sql(
      "SELECT p_id, s_id, user_id FROM graft_ssj_parity ORDER BY p_id, s_id")
      .collect().toSeq
    val all = graft.sources.Tables.events(spark, sf0001)
    val batch = StreamingQueries.purchaseSignupJoin(
        all.filter(col("event_type") === "purchase"),
        all.filter(col("event_type") === "signup"))
      .orderBy(col("p_id"), col("s_id")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("stream-stream LEFT OUTER join: entry == batch left join, sentinel rows emitted") {
    import spark.implicits._
    val entry = graft.streaming.StreamingEntry.streamOuterJoinEvents(spark, sf0001)
      .collect().toSeq
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val slice = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
    val batch = StreamingQueries.purchaseSignupLeftJoin(
        withTs(slice.filter(col("event_type") === "purchase")),
        withTs(slice.filter(col("event_type") === "signup")))
      .orderBy(col("p_id"), col("s_id")).collect().toSeq
    assert(entry.nonEmpty && entry == batch)
    // The outer path must actually fire: at least one purchase with no
    // preceding signup inside the 7-day bound emits the −1 sentinel.
    assert(entry.exists(_.getLong(1) == -1L),
      "no unmatched purchase in the fixture — outer emission untested")
  }

  test("stream-stream FULL OUTER join: entry == batch FULL JOIN, both sentinel sides fire") {
    val entry = graft.streaming.StreamingEntry.streamFullOuterJoinEvents(spark, sf0001)
      .collect().toSeq
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val slice = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
    val batch = StreamingQueries.purchaseSignupFullJoin(
        withTs(slice.filter(col("event_type") === "purchase")),
        withTs(slice.filter(col("event_type") === "signup")))
      .orderBy(col("p_id"), col("s_id")).collect().toSeq
    assert(entry.nonEmpty && entry == batch)
    // Both deferred paths must actually fire: an unmatched purchase
    // (s_id = −1) and an unmatched signup (p_id = −1).
    assert(entry.exists(_.getLong(1) == -1L),
      "no unmatched purchase in the fixture — purchase-side eviction untested")
    assert(entry.exists(_.getLong(0) == -1L),
      "no unmatched signup in the fixture — signup-side eviction untested")
  }

  test("update mode: final per-key max == batch counts, and re-emissions actually happened") {
    val entry = graft.streaming.StreamingEntry.streamUpdateCounts(spark, sf0001)
      .collect().toSeq
    val slice = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val batch = StreamingQueries.tumblingAgg(slice)
      .select(col("ws_us"), col("event_type"), col("n"))
      .orderBy(col("ws_us"), col("event_type")).collect().toSeq
    assert(entry.nonEmpty && entry == batch)
    // Update semantics must be visible: the raw sink holds MORE rows than
    // keys (some window was updated by a later batch and re-emitted) —
    // this is exactly why an append-only sink under update mode
    // double-counts.
    val raw = spark.table("graft_stream_update").count()
    assert(raw > entry.size, s"expected re-emissions: sink=$raw keys=${entry.size}")
  }

  test("stream-stream LEFT SEMI join: entry == batch EXISTS, one row per matched purchase") {
    import spark.implicits._
    val entry = graft.streaming.StreamingEntry.streamSemiJoinEvents(spark, sf0001)
      .collect().toSeq
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val slice = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
    val batch = StreamingQueries.purchaseSignupSemiJoin(
        withTs(slice.filter(col("event_type") === "purchase")),
        withTs(slice.filter(col("event_type") === "signup")))
      .orderBy(col("p_id")).collect().toSeq
    assert(entry.nonEmpty && entry == batch)
    // semi semantics: p_id unique even where several signups qualify
    assert(entry.map(_.getLong(0)).distinct.length == entry.length)
  }

  test("stream-static join: enrichment entry == batch join+aggregate over the slice") {
    val entry = graft.streaming.StreamingEntry.streamStaticEnrich(spark, sf0001)
      .collect().toSeq
    val slice = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
    val batch = StreamingQueries.enrichAgg(
        slice, graft.sources.Tables.customer(spark, sf0001))
      .orderBy(col("nationkey")).collect().toSeq
    assert(entry.nonEmpty && entry == batch)
  }

  test("session_window agrees with lag+cumsum sessionize on per-user session counts") {
    val native = StreamingQueries.sessionCounts(graft.sources.Tables.events(spark, sf0001))
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaLag = graft.operators.EventOps.sessionize(spark, sf0001)
      .select(col("user_id"), col("n_sessions"), col("n_events_total"))
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(native == viaLag)
  }

  test("streaming dedup: duplicated firehose collapses to the distinct event set") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    val stream = MemoryStream[Ev](spark)
    stream.addData(ev ++ ev.take(50) ++ ev.take(10)) // replay some events
    val q = StreamingQueries.dedupStream(
        stream.toDF().withColumn("ts_utc", timestamp_micros(col("ts_us"))))
      .writeStream.format("memory").queryName("graft_dedup_stream")
      .outputMode("append").trigger(Trigger.Once()).start()
    q.awaitTermination(120000)
    val out = spark.sql("SELECT event_id FROM graft_dedup_stream").collect().map(_.getLong(0))
    assert(out.length == ev.length && out.distinct.length == ev.length)
    assert(out.toSet == ev.map(_.event_id).toSet)
  }

  test("declared streaming entry == batch tumbling agg over the same slice") {
    val streamed = graft.streaming.StreamingEntry.streamTumblingEvents(spark, sf0001)
      .collect().toSeq
    val batch = StreamingQueries.tumblingAgg(
        graft.sources.Tables.events(spark, sf0001).orderBy(col("event_id")).limit(5000))
      .orderBy(col("ws_us"), col("event_type")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("session_window gap-tie: event at exactly prev+gap MERGES (matches the > gap oracle)") {
    // Pins the boundary convention (driver ADVICE r5/r6): MEASURED on
    // Spark 4.1, an event at exactly prev+gap is merged into the SAME
    // session — session_window treats the touching windows [prev,
    // prev+gap) and [prev+gap, prev+2gap) as overlapping for merge
    // purposes. That is exactly the lag+cumsum convention the
    // `stream_session_events` oracle uses (`diff > gap` starts a new
    // session, so == gap stays in-session), and the same `> gap` used by
    // the batch `sessionize` pair — all four sides agree, so a fixture
    // regeneration with coarser (tie-producing) timestamps cannot flip
    // the driver compare. If a Spark upgrade ever changes the tie rule,
    // this test fails before the oracle does.
    import spark.implicits._
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    val gapUs = 1800L * 1000000L
    val df = Seq(
      (1L, base), (1L, base + gapUs),      // exactly the gap apart → merged
      (2L, base), (2L, base + gapUs + 1L)  // 1 µs beyond the gap → 2 sessions
    ).toDF("user_id", "ts_us").withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val sessions = df
      .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sessions == Map(1L -> 1L, 2L -> 2L), sessions.toString)
  }

  test("append-mode finalization: windows emit exactly once, mid-stream, = batch agg on the finalized set") {
    import spark.implicits._
    val slice = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id")).limit(5000).as[Ev].collect().toSeq
    val stream = MemoryStream[Ev](spark)
    val q = StreamingQueries.tumblingStream(
        stream.toDF().withColumn("ts_utc", timestamp_micros(col("ts_us"))))
      .writeStream.format("memory").queryName("graft_append_final")
      .outputMode("append").start()
    val sinkCounts = collection.mutable.ArrayBuffer.empty[Long]
    try {
      slice.grouped(math.max(1, (slice.size + 2) / 3)).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
        sinkCounts += spark.table("graft_append_final").count()
      }
      stream.addData(Seq(slice.last)) // deterministic finalization pass
      q.processAllAvailable()
      sinkCounts += spark.table("graft_append_final").count()
    } finally q.stop()
    // windows finalize MID-stream (some emission before the last batch)
    // and the sink only ever grows (append = emit-once, no rewrites)
    assert(sinkCounts.init.exists(_ > 0L), sinkCounts.toString)
    assert(sinkCounts.zip(sinkCounts.tail).forall { case (a, b) => a <= b }, sinkCounts.toString)
    val emitted = spark.sql(
        "SELECT ws_us, event_type, n, sum_cents FROM graft_append_final ORDER BY ws_us, event_type")
      .collect().toSeq
    // exactly once: no window key appears twice
    assert(emitted.map(r => (r.getLong(0), r.getString(1))).distinct.size == emitted.size)
    // final content = batch tumbling agg restricted to finalized windows
    // (window end <= max event time - 1 h watermark)
    val mx = slice.map(_.ts_us).max
    val hourUs = 3600L * 1000000L
    val batch = StreamingQueries.tumblingAgg(
        graft.sources.Tables.events(spark, sf0001).orderBy(col("event_id")).limit(5000))
      .filter(col("ws_us") + hourUs <= mx - hourUs)
      .orderBy(col("ws_us"), col("event_type")).collect().toSeq
    assert(emitted.nonEmpty && emitted == batch)
  }

  test("stream_distinct_users_tws: MapState dedup equals batch COUNT(DISTINCT)") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingEntry.streamDistinctUsersTws(spark, sf0001).collect()
    val expect = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"), count(lit(1)).as("n"))
      .orderBy(col("event_type")).collect()
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (a, b) =>
      assert((a.getString(0), a.getLong(1), a.getLong(2)) ==
        ((b.getString(0), b.getLong(1), b.getLong(2))))
    }
  }

  test("stream_attribution_tws: cross-batch touch carry equals a sequential replay") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingEntry.streamAttributionTws(spark, sf0001)
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val slice = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val firstAgg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val lastAgg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((_, rows) <- slice.groupBy(_._1)) {
      var f: String = null; var l: String = null
      for ((_, _, t, c) <- rows.sortBy(_._2)) {
        if (t == "purchase") {
          val (fn, fc) = firstAgg.getOrElse(Option(f).getOrElse("none"), (0L, 0L))
          firstAgg(Option(f).getOrElse("none")) = (fn + 1, fc + c)
          val (ln, lc) = lastAgg.getOrElse(Option(l).getOrElse("none"), (0L, 0L))
          lastAgg(Option(l).getOrElse("none")) = (ln + 1, lc + c)
        } else { if (f == null) f = t; l = t }
      }
    }
    val expect =
      firstAgg.map { case (ch, v) => ("first_touch", ch) -> v }.toMap ++
        lastAgg.map { case (ch, v) => ("last_touch", ch) -> v }
    assert(out == expect)
  }

  test("stream_streaks_tws: cross-batch run carry equals batch gaps-and-islands") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingEntry.streamStreaksTws(spark, sf0001)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val slice = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
      .select(col("user_id"), col("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / 86400000000L))
    val expect = slice.groupBy(_._1).map { case (u, rows) =>
      val days = rows.map(_._2).distinct.sorted
      val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
      var run = 0L
      for (i <- days.indices) {
        run += 1
        if (i == days.length - 1 || days(i + 1) != days(i) + 1) {
          lens += run; run = 0
        }
      }
      u -> ((days.length.toLong, lens.length.toLong, lens.max))
    }
    assert(out == expect)
  }

  test("stream_cusum_tws: cross-batch S carry equals a sequential recurrence replay") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingEntry.streamCusumTws(spark, sf0001)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val slice = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
      .select(col("user_id"), col("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = slice.groupBy(_._1).map { case (u, rows) =>
      var s = 0L; var peak = 0L; var peakId = 0L
      for ((_, id, c) <- rows.sortBy(_._2)) {
        s = math.max(0L, s + (c - 2500L))
        if (s > peak) { peak = s; peakId = id }
      }
      u -> ((rows.length.toLong, peak, peakId))
    }
    assert(out == expect)
  }

  test("stream_recent_events_tws: ListState buffer holds exactly the last 3 arrivals") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingEntry.streamRecentEventsTws(spark, sf0001).collect()
    val byUser = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, g) => u -> g.map(_._2).sorted.takeRight(3) }
    assert(out.length == byUser.size)
    out.foreach { r =>
      assert(r.getString(1) == byUser(r.getLong(0)).mkString(","))
    }
  }

  test("stream_initial_state: warm start is seam-free — equals one batch aggregate") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingEntry.streamInitialState(spark, sf0001).collect()
    val expect = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("s"))
      .orderBy(col("event_type")).collect()
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (a, b) =>
      assert((a.getString(0), a.getLong(1), a.getLong(2)) ==
        ((b.getString(0), b.getLong(1), b.getLong(2))))
    }
    // the warm half is strictly positive — the initial state genuinely
    // contributes (a processor ignoring it would report ~half the counts)
    assert(out.map(_.getLong(1)).sum == math.min(5000,
      graft.sources.Tables.events(spark, sf0001).count()))
  }

  test("stream_state_reader: store snapshot = windows past the batch-start watermark") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingEntry.streamStateReader(spark, sf0001).collect()
    assert(out.nonEmpty)
    val slice = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
      .select(col("event_id"), col("ts_us"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val hourUs = 3600L * 1000000L
    // eviction threshold of the LAST commit: watermark captured at batch
    // start = max event time of the first two chunks − 1 h delay
    val sz = math.max(1, (slice.length + 2) / 3)
    val wm = slice.sortBy(_._1).take(2 * sz).map(_._2).max - hourUs
    val expect = slice
      .groupBy(e => ((e._2 / hourUs) * hourUs, e._3))
      .map { case ((ws, t), g) => (ws, t, g.length.toLong, g.map(_._4).sum) }
      .filter { case (ws, _, _, _) => ws + hourUs > wm }
      .toSeq.sortBy(e => (e._1, e._2))
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (a, b) =>
      assert((a.getLong(0), a.getString(1), a.getLong(2), a.getLong(3)) == b)
    }
  }

  test("stream_chained_agg: finalized daily rows equal the batch hour→day cascade") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingEntry.streamChainedAgg(spark, sf0001).collect()
    assert(out.nonEmpty)
    // batch twin: the same two-level rollup over the slice, restricted to
    // days ending at or before the final watermark (max ts − 1 hour)
    val slice = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
      .select(col("ts_us"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
    val hourUs = 3600L * 1000000L; val dayUs = 24L * hourUs
    val mx = slice.agg(max(col("ts_us"))).collect()(0).getLong(0)
    val expect = slice
      .withColumn("hb", expr(s"(ts_us DIV $hourUs) * $hourUs"))
      .groupBy(col("hb"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      .withColumn("db", expr(s"(hb DIV $dayUs) * $dayUs"))
      .groupBy(col("db"), col("event_type"))
      .agg(count(lit(1)).as("n_hours"), max(col("n")).as("max_hourly_n"),
        sum(col("n")).as("n_events"), sum(col("sc")).as("sum_cents"))
      .filter(col("db") + dayUs <= mx - hourUs)
      .orderBy(col("db"), col("event_type"))
      .collect()
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (a, b) =>
      assert((a.getLong(0), a.getString(1), a.getLong(2), a.getLong(3), a.getLong(4),
        a.getLong(5)) ==
        ((b.getLong(0), b.getString(1), b.getLong(2), b.getLong(3), b.getLong(4),
          b.getLong(5))))
    }
    out.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 24L) // hours per day
      assert(r.getLong(4) >= r.getLong(3)) // day total ≥ its max hour
    }
  }

  test("stream_observe_metrics: per-batch observed metrics partition the slice exactly") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingEntry.streamObserveMetrics(spark, sf0001).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // the three batches must partition the slice: totals equal the batch
    // aggregate over the same ordered prefix, exactly (integer sums)
    val agg = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("event_id")).limit(5000)
      .agg(count(lit(1)), sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)))
      .collect()(0)
    assert(out.map(_.getLong(1)).sum == agg.getLong(0))
    assert(out.map(_.getLong(2)).sum == agg.getLong(1))
    assert(out.map(_.getLong(3)).sum == agg.getLong(2))
    // deterministic chunking: batch sizes are the harness ⌈n/3⌉ split
    val sz = math.max(1, (agg.getLong(0) + 2) / 3)
    assert(out.map(_.getLong(1)).toSeq ==
      Seq(sz, sz, agg.getLong(0) - 2 * sz).filter(_ > 0))
  }

  test("late data beyond the watermark is dropped in append mode") {
    import spark.implicits._
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    val hour = 3600L * 1000000L
    val stream = MemoryStream[Ev](spark)
    val streamingDf = stream.toDF().withColumn("ts_utc", timestamp_micros(col("ts_us")))
    // one continuous query — the watermark lives in the running query's
    // state, so the two micro-batches see it advance
    val q = StreamingQueries.tumblingStream(streamingDf)
      .writeStream.format("memory").queryName("graft_late_drop")
      .outputMode("append").start()
    try {
      // batch 1: events in hours 0 and 5 — watermark advances to h5 - 1h = h4
      stream.addData(Seq(
        Ev(1, base + 10, 1, "click", 1.0),
        Ev(2, base + 5 * hour, 1, "click", 1.0)))
      q.processAllAvailable()
      // batch 2: a late event back in hour 0 (behind watermark) + fresh h6
      stream.addData(Seq(
        Ev(3, base + 20, 1, "click", 1.0),
        Ev(4, base + 6 * hour, 1, "click", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val counts = spark.sql(
      "SELECT ws_us, sum(n) AS n FROM graft_late_drop GROUP BY ws_us ORDER BY ws_us").collect()
    val h0 = counts.find(_.getLong(0) == base)
    // hour-0 closed when the watermark passed h4: it must contain only the
    // on-time event (id 1); the late event (id 3) is dropped
    assert(h0.forall(_.getLong(1) == 1L), s"late event leaked into closed window: ${counts.mkString(",")}")
  }

  test("stream_ann_topk: per-micro-batch top-5 == one-shot cos_topk") {
    val streamed = graft.streaming.StreamingEntry.streamAnnTopk(spark, sf0001)
      .collect().toSeq
    val batch = graft.operators.VectorOps.cosTopk(spark, sf0001)
      .collect().toSeq
    assert(streamed == batch)
    assert(streamed.size == 250) // 50 queries x top-5
  }

  test("stream_dedup_minhash: per-micro-batch admission == batch incremental gate") {
    // decisions must be batching-invariant (arrivals only compare against
    // the catalog), so the three-chunk streaming ingest must reproduce the
    // one-shot batch form row for row — including at least one real dup
    // decision, or the test proves nothing
    val streamed = graft.streaming.StreamingEntry.streamDedupMinhash(spark, sf0001)
      .collect().toSeq
    val batch = graft.operators.TextOps.dedupIncrementalMinhash(spark, sf0001)
      .collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("growing catalog catches a cross-batch dup the static form misses") {
    // The admission-loop semantics stream_dedup_growing adds: an arrival
    // duplicating an earlier-ADMITTED arrival from a previous micro-batch
    // is a dup, where the static-catalog form admits both as 'new'. Drive
    // the shared kernel exactly as the entry's foreachBatch does — batch 0
    // admits doc 900004 (text alien to the corpus → admitted 'new'),
    // batch 1 presents the identical text as doc 900009.
    val spark2 = spark
    import spark2.implicits._
    val alien = "zqa zqb zqc zqd zqe zqf zqg zqh"
    val b0 = Seq((900004L, alien)).toDF("doc_id", "text")
    val b1 = Seq((900009L, alien)).toDF("doc_id", "text")
    val s0 = graft.operators.TextOps.signatures(b0)
    val s1 = graft.operators.TextOps.signatures(b1)
    val d0 = graft.operators.TextOps.admitAgainstCatalog(spark, sf0001, b0, s0, None)
      .collect().toSeq
    assert(d0.map(r => (r.getLong(0), r.getString(1))) == Seq((900004L, "new")))
    // static form: batch 1 compared against the UNCHANGED catalog → 'new'
    val dStatic = graft.operators.TextOps.admitAgainstCatalog(spark, sf0001, b1, s1, None)
      .collect().toSeq
    assert(dStatic.map(r => (r.getLong(0), r.getString(1))) == Seq((900009L, "new")),
      "static catalog unexpectedly knows the first-batch arrival")
    // growing form: batch 0's admitted doc joined the catalog → 'dup'
    // (band rows + verify text, the two catalog assets)
    val dGrow = graft.operators.TextOps.admitAgainstCatalog(spark, sf0001, b1, s1,
      Some(graft.operators.TextOps.signatureBands(s0)), Some(b0))
      .collect().toSeq
    assert(dGrow.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))) ==
      Seq((900009L, "dup", 1L, 900004L)))
  }

  /** The growing-ingest trigger loop over explicit doc batches: the
    * entry's foreachBatch body, driven directly so a spec can replay and
    * interleave triggers. Chunks carry an injected cross-batch dup pair
    * (alien text in chunk 0 re-arriving in chunk 1), so a broken catalog
    * (self-matching retry, lost admission) flips at least one decision.
    */
  private def growChunks(): Seq[org.apache.spark.sql.DataFrame] = {
    val spark2 = spark
    import spark2.implicits._
    val alien = "zqa zqb zqc zqd zqe zqf zqg zqh"
    val base = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(60)
      .as[(Long, String)].collect().toSeq
    val chunks = base.grouped(20).toSeq
    Seq(
      (chunks(0) :+ ((900004L, alien))).toDF("doc_id", "text"),
      (chunks(1) :+ ((900009L, alien))).toDF("doc_id", "text"),
      chunks(2).toDF("doc_id", "text"))
  }

  private def runTriggers(root: java.io.File, plan: Seq[Long]): Map[Long, (String, Long, Long)] = {
    val chunks = growChunks()
    plan.foreach { b =>
      GrowingCatalog.processTrigger(
        spark, sf0001, root, chunks(b.toInt), b, compactEvery = 2): Unit
    }
    spark.read.parquet(new java.io.File(root, "decisions/b*").getPath)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
  }

  private def freshDir(name: String): java.io.File = {
    val f = new java.io.File(s"target/graft-test-$name").getAbsoluteFile
    def wipe(x: java.io.File): Unit = {
      Option(x.listFiles()).getOrElse(Array.empty).foreach(wipe); x.delete(): Unit
    }
    wipe(f); f.mkdirs(); f
  }

  test("growing ingest: micro-batch RETRY replays idempotently, incl. after compaction") {
    // Structured Streaming re-invokes foreachBatch with the SAME batchId
    // after a failure — possibly after the first attempt already appended
    // its delta AND compacted it into the base (compactEvery=2 compacts
    // at the end of trigger 1, so re-running trigger 1 is exactly the
    // adversarial case: the catalog already contains batch 1's own rows).
    // The src_b < batchId read fence + the kernel's doc_id ≠ cat_id
    // invariant must make every replay reproduce the first attempt — the
    // r13 shape failed this (self-match J=1 flips every admitted doc to
    // dup of itself).
    val clean = runTriggers(freshDir("grow-clean"), Seq(0L, 1L, 2L))
    // the injected cross-batch dup must actually be exercised
    assert(clean(900009L)._1 == "dup" && clean(900009L)._3 == 900004L)
    val retried = runTriggers(freshDir("grow-retry"), Seq(0L, 0L, 1L, 1L, 2L, 2L))
    assert(retried == clean, "retried triggers changed decisions")
  }

  test("growing ingest: kill after trigger 0, restart from checkpoint, decisions unchanged") {
    // The catalog lives OUTSIDE Spark's state store, so checkpoint
    // recovery is the untested seam: stop the query after the first
    // trigger commits, start a NEW query on the same checkpoint + the
    // same source, feed the remaining chunks — the restarted query must
    // continue at batchId 1 against the batch-0 catalog and produce the
    // uninterrupted run's decisions.
    val spark2 = spark
    import spark2.implicits._
    val chunks = growChunks()
    val clean = runTriggers(freshDir("grow-clean2"), Seq(0L, 1L, 2L))
    val root = freshDir("grow-restart")
    val ckpt = new java.io.File(root, "ckpt").getPath
    val stream = MemoryStream[DocEvent](spark)
    def startQ() = stream.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        GrowingCatalog.processTrigger(
          batch.sparkSession, sf0001, root,
          batch.select(col("doc_id"), col("text")), batchId, compactEvery = 2): Unit
      }
      .start()
    def feed(q: org.apache.spark.sql.streaming.StreamingQuery,
        df: org.apache.spark.sql.DataFrame): Unit = {
      stream.addData(df.as[DocEvent].collect().toSeq)
      q.processAllAvailable()
    }
    val q1 = startQ()
    try feed(q1, chunks(0)) finally q1.stop()
    val q2 = startQ() // the restart: same checkpoint, same source
    try { feed(q2, chunks(1)); feed(q2, chunks(2)) } finally q2.stop()
    val restarted = spark.read.parquet(new java.io.File(root, "decisions/b*").getPath)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(restarted == clean, "restart from checkpoint changed decisions")
  }

  test("stream_dedup_growing vs static: dup decisions grow monotonically") {
    // On any slice the growing form can only ADD dup verdicts relative to
    // the static form (its catalog is a superset at every trigger):
    // status flips are new→dup only, n_near_dups never decreases, and a
    // shared dup's best_match can only move down (min over a larger set).
    val g = graft.streaming.StreamingEntry.streamDedupGrowing(spark, sf0001)
      .collect().toSeq.map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val s = graft.streaming.StreamingEntry.streamDedupMinhash(spark, sf0001)
      .collect().toSeq.map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(g.keySet == s.keySet && g.nonEmpty)
    g.keySet.foreach { id =>
      val (gs, gn, gb) = g(id); val (ss, sn, sb) = s(id)
      if (ss == "dup") assert(gs == "dup", s"doc $id: growing lost a static dup")
      assert(gn >= sn, s"doc $id: n_near_dups shrank $sn -> $gn")
      if (ss == "dup" && gs == "dup") assert(gb <= sb, s"doc $id: best_match rose")
    }
  }
}
