package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the S-group operators (SURVEY.md §2.2-S,
  * PR5). The aggregation bodies are shared with the batch forms in
  * [[graft.operators.EventOps]] — t2 oracles stay bound to the batch
  * results; parity between the two is asserted in StreamingParitySpec via
  * MemoryStream.
  *
  * Scale posture: watermark + windowed aggregation keeps state bounded to
  * open windows; `session_window` is state-store-backed with state =
  * O(open sessions per user).
  */
object StreamingQueries {

  private val cents = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")

  /** Shared tumbling aggregation: input needs `ts_utc`, `event_type`,
    * `value`. Works on both batch and streaming DataFrames.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents).as("sum_cents"))
      .select(
        unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n"), col("sum_cents"))

  /** Streaming tumbling window: 1-hour watermark, append-safe. */
  def tumblingStream(events: DataFrame): DataFrame =
    tumblingAgg(events.withWatermark("ts_utc", "1 hour"))

  /** Shared sliding aggregation (1-hour window every 15 minutes): each event
    * lands in 4 overlapping windows. Batch- and stream-compatible.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_utc"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents).as("sum_cents"))
      .select(
        unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n"), col("sum_cents"))

  /** Streaming sliding window: state = open windows only (≤ 4 per slide
    * period per event_type once the watermark advances).
    */
  def slidingStream(events: DataFrame): DataFrame =
    slidingAgg(events.withWatermark("ts_utc", "1 hour"))

  /** Streaming deduplication: drop repeated event_ids arriving within the
    * watermark horizon (`dropDuplicatesWithinWatermark`) — the streaming
    * form of exact dedup for an event firehose. State holds one entry per
    * distinct key seen inside the horizon and is GC'd as the watermark
    * advances, so it is O(keys per hour), not O(stream).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts_utc", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Shared purchase↔signup interval join: every purchase matched to the
    * same user's signups in the preceding 7 days. Batch- and
    * stream-compatible; the two-sided event-time bound is what lets the
    * streaming form garbage-collect join state.
    */
  def purchaseSignupJoin(purchases: DataFrame, signups: DataFrame): DataFrame =
    purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts_utc").as("p_ts"))
      .join(
        signups.select(col("event_id").as("s_id"), col("user_id").as("s_user"), col("ts_utc").as("s_ts")),
        expr("""p_user = s_user AND
               |s_ts <= p_ts AND
               |s_ts >= p_ts - INTERVAL 7 DAYS""".stripMargin))
      .select(col("p_id"), col("s_id"), col("p_user").as("user_id"))

  /** Stream-stream inner join: both sides watermarked, state bounded by the
    * 7-day interval condition — Spark drops buffered rows once the other
    * side's watermark passes the bound, so state is O(events in window),
    * independent of stream length.
    */
  def purchaseSignupStream(purchases: DataFrame, signups: DataFrame): DataFrame =
    purchaseSignupJoin(
      purchases.withWatermark("ts_utc", "1 hour"),
      signups.withWatermark("ts_utc", "1 hour"))

  /** LEFT OUTER variant of [[purchaseSignupJoin]]: every purchase appears,
    * matched or not; the missing signup id surfaces as −1 (not NULL — a
    * concrete sentinel keeps the presentation sort and the engine-vs-oracle
    * compare free of null-ordering divergence). Batch- and
    * stream-compatible.
    */
  def purchaseSignupLeftJoin(purchases: DataFrame, signups: DataFrame): DataFrame =
    purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts_utc").as("p_ts"))
      .join(
        signups.select(col("event_id").as("s_id"), col("user_id").as("s_user"), col("ts_utc").as("s_ts")),
        expr("""p_user = s_user AND
               |s_ts <= p_ts AND
               |s_ts >= p_ts - INTERVAL 7 DAYS""".stripMargin),
        "left_outer")
      .select(
        col("p_id"),
        coalesce(col("s_id"), lit(-1L)).as("s_id"),
        col("p_user").as("user_id"))

  /** Stream-stream LEFT OUTER join — the production "did this purchase
    * have a preceding signup?" semantics: matches emit on arrival (inner
    * path), and an unmatched purchase emits its null-padded row exactly
    * once, when the watermark proves no qualifying signup can still
    * arrive (signup-side watermark past the purchase's event time). Same
    * state bound as the inner form; the outer path adds no state, only a
    * deferred emission at eviction.
    */
  def purchaseSignupLeftStream(purchases: DataFrame, signups: DataFrame): DataFrame =
    purchaseSignupLeftJoin(
      purchases.withWatermark("ts_utc", "1 hour"),
      signups.withWatermark("ts_utc", "1 hour"))

  /** FULL OUTER variant of [[purchaseSignupJoin]]: every purchase AND every
    * signup appears — matched rows carry both ids; the absent side of an
    * unmatched row surfaces as −1 (not NULL, same sentinel discipline as
    * the left variant: concrete values keep the presentation sort and the
    * engine-vs-oracle compare free of null-ordering divergence). Batch- and
    * stream-compatible.
    */
  def purchaseSignupFullJoin(purchases: DataFrame, signups: DataFrame): DataFrame =
    purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts_utc").as("p_ts"))
      .join(
        signups.select(col("event_id").as("s_id"), col("user_id").as("s_user"), col("ts_utc").as("s_ts")),
        expr("""p_user = s_user AND
               |s_ts <= p_ts AND
               |s_ts >= p_ts - INTERVAL 7 DAYS""".stripMargin),
        "full_outer")
      .select(
        coalesce(col("p_id"), lit(-1L)).as("p_id"),
        coalesce(col("s_id"), lit(-1L)).as("s_id"),
        coalesce(col("p_user"), col("s_user")).as("user_id"))

  /** Stream-stream FULL OUTER join — the reconciliation shape: matches emit
    * on arrival, and EACH side's unmatched rows emit their sentinel-padded
    * row exactly once, when the OTHER side's watermark proves no qualifying
    * partner can still arrive. The interval condition bounds event time in
    * both directions (s_ts ∈ [p_ts − 7d, p_ts] ⇔ p_ts ∈ [s_ts, s_ts + 7d]),
    * which is what lets Spark evict both state stores — full-outer adds no
    * state over the inner form, only the two deferred emission passes.
    */
  def purchaseSignupFullStream(purchases: DataFrame, signups: DataFrame): DataFrame =
    purchaseSignupFullJoin(
      purchases.withWatermark("ts_utc", "1 hour"),
      signups.withWatermark("ts_utc", "1 hour"))

  /** LEFT SEMI variant of [[purchaseSignupJoin]] — the existence check:
    * each purchase appears EXACTLY ONCE if any qualifying signup exists,
    * no matter how many match (semi semantics deduplicate the fan-out a
    * plain join would produce). Batch- and stream-compatible.
    */
  def purchaseSignupSemiJoin(purchases: DataFrame, signups: DataFrame): DataFrame =
    purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts_utc").as("p_ts"))
      .join(
        signups.select(col("user_id").as("s_user"), col("ts_utc").as("s_ts")),
        expr("""p_user = s_user AND
               |s_ts <= p_ts AND
               |s_ts >= p_ts - INTERVAL 7 DAYS""".stripMargin),
        "left_semi")
      .select(col("p_id"), col("p_user").as("user_id"))

  /** Stream-stream LEFT SEMI join — exactly-once existence alerts: a
    * purchase emits the moment its first qualifying signup is seen and
    * never again (no fan-out to deduplicate downstream, unlike the inner
    * join), and an unmatched purchase emits nothing. Same state bound as
    * the inner form; semi is the shape for "has this key ever..." alerts
    * where emitting per-match would double-fire downstream actions.
    */
  def purchaseSignupSemiStream(purchases: DataFrame, signups: DataFrame): DataFrame =
    purchaseSignupSemiJoin(
      purchases.withWatermark("ts_utc", "1 hour"),
      signups.withWatermark("ts_utc", "1 hour"))

  /** Stream-STATIC enrichment: the event stream joined to a static
    * dimension table (customers) with per-nation spend aggregated — the
    * standard streaming-enrichment pattern, distinct from stream-stream
    * joins: the static side needs no watermark and holds NO join state
    * (it is re-planned per micro-batch, which is also what lets a
    * file-backed dimension pick up slowly-changing updates), so the only
    * state is the aggregation's. Works identically on a batch events
    * DataFrame, which is what the oracle checks.
    */
  def enrichAgg(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(customers.select(col("c_custkey"), col("c_nationkey")),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(cents).as("sum_cents"))
      .select(col("c_nationkey").cast("long").as("nationkey"), col("n"), col("sum_cents"))

  /** Session windows (30-minute gap) — native `session_window`, usable on
    * batch (cross-validates the lag+cumsum sessionize) and on streams
    * (state-store backed).
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events_total"))

  /** Streaming sessionization with watermark. */
  def sessionStream(events: DataFrame): DataFrame =
    events.withWatermark("ts_utc", "1 hour")
      .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))
}
