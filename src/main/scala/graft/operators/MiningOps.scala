package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-mining / dataset-governance operators for the pipeline surface:
  * association rules (market basket), exact per-group OLS trend, blocked
  * TF-cosine similarity join, chi-square independence cells, GDPR-style
  * deletion cascade, and temporal train/test split with an embargo gap.
  *
  * Determinism protocol (see COVERAGE.md "Oracle-parity convention"):
  * every declared output is BIGINT counts/sums plus class-2 ratios —
  * exactly ONE IEEE-754 division of two exactly-representable BIGINT
  * operands, emitted UNROUNDED (int/int quotients are precisely the
  * values that can land on reachable 6-dp rounding ties, so round() is
  * banned here) — bit-identical between Spark and the DuckDB oracle
  * regardless of partitioning.
  */
object MiningOps {

  /** events.value quantized to integer cents (the repo-wide money
    * convention — EventOps.scala:22 uses the identical expression).
    */
  private val cents = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")

  /** Association-rule mining over (order → part-brand) baskets: pairwise
    * co-occurrence support, confidence and lift. The brand dimension is
    * joined in by BROADCAST (part is a dim table), baskets are the
    * distinct (order, brand) pairs, and the candidate pairs are emitted
    * MAP-SIDE from each order's sorted brand set (`transform`/`slice`
    * combination expansion — same discipline as token_cooccurrence), so
    * the only shuffles are the per-order set build and the pair count.
    * Per-item counts (≤ #brands rows) and the basket total (1 row) come
    * back as broadcasts for the confidence/lift arithmetic.
    *
    * 100 TB posture: pair fan-out per basket is C(distinct items, 2) with
    * items bounded by the brand-dimension cardinality (25 here) — never
    * corpus²; the heavy shuffle keys are (brand_a, brand_b) with at most
    * #brands² groups, so the final aggregate is tiny regardless of fact
    * size. lift = support·N / (cnt_a·cnt_b) — the numerator and
    * denominator are exact BIGINT products, then one division.
    */
  def assocRulesBrands(spark: SparkSession, sfDir: String): DataFrame = {
    // r16: ONE per-order aggregate replaces distinct + three re-derived
    // branches. collect_set dedups on its own, so the pre-r16
    // distinct-then-collect_set chain paid two fact-scale exchanges
    // ((orderkey, brand), then orderkey) where one suffices — and the
    // item counts and basket total re-derived the joined/distinct basket
    // table once more EACH (as broadcast-side jobs). All three consumers
    // now read the same per-order set table: item count = explode the
    // sets and count (same "# orders containing brand" — the sets are
    // per-order distinct), basket total = row count of the set table
    // (= count_distinct(l_orderkey)), pairs = the same combination
    // expansion as before. Guide §2.4 (share one exchange) + §1.2 step 1.
    // The VERDICT-suggested frequent-item prefilter is a deliberate
    // no-op here: p_brand has 25 values, every one far above the support
    // floor at every SF, so the prefilter would add a pass and prune
    // nothing (see OPTIMIZATION_r16.md).
    val basketSets = Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("p_brand"))).as("brands"))
    val itemCnt = basketSets
      .select(explode(col("brands")).as("p_brand"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("c"))
    val totals = basketSets.agg(count(lit(1)).as("n_orders"))
    val pairs = basketSets
      .select(explode(expr(
        """flatten(transform(brands, (a, i) ->
          |  transform(slice(brands, i + 2, size(brands)), b ->
          |    struct(a AS brand_a, b AS brand_b))))""".stripMargin))
        .as("p"))
      .select(col("p.brand_a"), col("p.brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("support"))
    pairs
      .join(broadcast(itemCnt.select(col("p_brand").as("brand_a"),
        col("c").as("cnt_a"))), Seq("brand_a"))
      .join(broadcast(itemCnt.select(col("p_brand").as("brand_b"),
        col("c").as("cnt_b"))), Seq("brand_b"))
      .crossJoin(broadcast(totals))
      .filter(col("support") >= 50)
      .select(
        col("brand_a"), col("brand_b"), col("support"),
        col("cnt_a"), col("cnt_b"), col("n_orders"),
        (col("support").cast("double") / col("cnt_a").cast("double"))
          .as("confidence"),
        ((col("support") * col("n_orders")).cast("double")
          / (col("cnt_a") * col("cnt_b")).cast("double")).as("lift"))
      .orderBy(col("support").desc, col("brand_a"), col("brand_b"))
  }

  /** Exact per-user OLS trend of event value over arrival order: slope of
    * the least-squares line through (rank, value_cents), computed from the
    * closed form (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) where x is the 1-based
    * event rank within the user (ts then event_id tie-break) and y is
    * integer cents. Every sum is an exact BIGINT, so the slope is one
    * IEEE division of two exact integers — the feature-engineering
    * "per-entity trend" primitive with zero floating-point accumulation.
    *
    * 100 TB posture: one shuffle on user_id serves both the rank window
    * and the groupBy (same key, exchange reused); per-user state is five
    * integers. Ranks are bounded by per-user event counts, keeping the
    * BIGINT products far from overflow for any realistic entity history
    * (n·Σxy < 2^63 up to ~40M events/user at max cents).
    */
  def olsTrendUser(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents.as("y"))
      .withColumn("x", row_number().over(w).cast("long"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("x")).as("sum_x"),
        sum(col("y")).as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_xx"))
      .filter(col("n_events") >= 20)
      .select(
        col("user_id"), col("n_events"),
        (col("n_events") * col("sum_xy") - col("sum_x") * col("sum_y"))
          .as("slope_num"),
        (col("n_events") * col("sum_xx") - col("sum_x") * col("sum_x"))
          .as("slope_den"),
        ((col("n_events") * col("sum_xy") - col("sum_x") * col("sum_y"))
          .cast("double")
          / (col("n_events") * col("sum_xx") - col("sum_x") * col("sum_x"))
            .cast("double")).as("slope_cents_per_rank"))
      .orderBy(col("user_id"))
  }

  /** Blocked exact TF-cosine similarity join over documents: candidate
    * pairs come from a (lang, token-length band, dominant term) blocking
    * key — near-identical docs share language, length AND their most
    * frequent term (max tf, lexicographically smallest on ties, encoded
    * as a min() over zero-padded "inverse-tf:token" strings so the argmax
    * is a plain aggregate) — then the EXACT squared cosine over full
    * term-frequency vectors decides. cos² = dot² / (‖a‖²·‖b‖²) with dot
    * and both squared norms exact BIGINTs (integer TFs), so the declared
    * ratio is one IEEE division; squaring sidesteps the non-deterministic
    * sqrt. Threshold 0.81 ≡ cosine ≥ 0.9.
    *
    * 100 TB posture: the self-join runs INSIDE blocks only (never
    * corpus²). The content-derived third key is what keeps block
    * population from growing quadratic with the corpus: (lang, band)
    * alone went 3 001 → ~3M candidates from sf0.01 to sf1 (measured 30×
    * wall for 10× data — a scale-killer), with the dominant term it is
    * 120 → 104 192 with accepted-pair yield preserved (5 of 7 / 920 of
    * 1 510 — lost pairs differ in their top term). At larger corpora the
    * same dial extends (top-2 terms, narrower bands). The dot product
    * re-joins candidate pairs to the tf table on (doc, token) — fan-out
    * bounded by candidates × tokens-per-doc. Same candidates-then-verify
    * shape as jaccard_join_exact.
    */
  def cosineTfPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val blk = tf.groupBy(col("doc_id"), col("lang"))
      .agg(
        sum(col("tf") * col("tf")).as("n2"),
        sum(col("tf")).as("ntok"),
        // Sentinel 10^12 keeps the inverse-tf key a fixed-width positive
        // numeric for any realistic tf (a doc would need 10^12 copies of
        // one token to go negative); the r10 sentinel 10^5 silently broke
        // the argmax ordering for tf >= 100000.
        expr("min(concat(lpad(CAST(1000000000000 - tf AS STRING), 13, '0'), "
          + "':', tok))").as("top_key"))
      .select(col("doc_id"), col("lang"), col("n2"),
        expr("ntok DIV 8").as("band"),
        expr("substring(top_key, 15)").as("top_tok"))
    val pairs = blk.as("a").join(blk.as("b"),
        col("a.lang") === col("b.lang") && col("a.band") === col("b.band")
          && col("a.top_tok") === col("b.top_tok")
          && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n2").as("n2a"), col("b.n2").as("n2b"))
    pairs
      .join(tf.select(col("doc_id"), col("tok"), col("tf")).as("x"),
        col("doc_a") === col("x.doc_id"))
      .join(tf.select(col("doc_id"), col("tok"), col("tf")).as("y"),
        col("doc_b") === col("y.doc_id") && col("x.tok") === col("y.tok"))
      .groupBy(col("doc_a"), col("doc_b"), col("n2a"), col("n2b"))
      .agg(sum(col("x.tf") * col("y.tf")).as("dot"))
      .filter((col("dot") * col("dot")).cast("double")
        / (col("n2a") * col("n2b")).cast("double") >= 0.81)
      .select(
        col("doc_a"), col("doc_b"), col("dot"), col("n2a"), col("n2b"),
        ((col("dot") * col("dot")).cast("double")
          / (col("n2a") * col("n2b")).cast("double")).as("cos2"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Chi-square independence cells for event_type × day-of-week: the
    * contingency table with, per cell, the observed BIGINT count and the
    * exact-integer chi-square contribution (O·N − R·C)² / (N·R·C) as one
    * division. Emitting per-CELL contributions (instead of the summed
    * statistic) keeps the output deterministic — a cross-engine Σ of 35
    * doubles would depend on accumulation order — and is what a drift
    * dashboard plots anyway. Day-of-week is derived from epoch-µs integer
    * arithmetic ((day + 4) mod 7, 0 = Sunday — epoch day 0 was a
    * Thursday) because Spark and DuckDB disagree on native dow numbering.
    *
    * 100 TB posture: one pass, one shuffle with ≤ types×7 groups;
    * marginals are broadcast back. Overflow discipline (hit at sf10 —
    * dev² reaches ~1e22 at 10M rows): dev = O·N − R·C stays BIGINT
    * (safe to ~3e9 rows), but the square and the N·R·C product are
    * computed in DOUBLE as the identical left-associated IEEE sequence
    * on both engines — each operand is an exactly-represented integer
    * (< 2^53 up to ~90M rows) and each multiply/divide is correctly
    * rounded, so the result is still bit-deterministic cross-engine.
    */
  def chi2EventDow(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("(ts_us DIV 86400000000 + 4) % 7").as("dow"))
    val cells = e.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("observed"))
    val rowTot = e.groupBy(col("event_type")).agg(count(lit(1)).as("r_tot"))
    val colTot = e.groupBy(col("dow")).agg(count(lit(1)).as("c_tot"))
    val total = e.agg(count(lit(1)).as("n_total"))
    cells
      .join(broadcast(rowTot), Seq("event_type"))
      .join(broadcast(colTot), Seq("dow"))
      .crossJoin(broadcast(total))
      .select(
        col("event_type"), col("dow"), col("observed"),
        col("r_tot"), col("c_tot"), col("n_total"),
        (col("observed") * col("n_total") - col("r_tot") * col("c_tot"))
          .as("dev_scaled"),
        ((col("observed") * col("n_total") - col("r_tot") * col("c_tot"))
            .cast("double")
          * (col("observed") * col("n_total") - col("r_tot") * col("c_tot"))
            .cast("double")
          / (col("n_total").cast("double") * col("r_tot").cast("double")
            * col("c_tot").cast("double")))
          .as("chi2_cell"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** GDPR-style deletion cascade: given a deletion request list (the
    * distinct event users with user_id ≡ 0 mod 23 — a stand-in for an
    * erasure queue), report per table how many rows the cascade removes:
    * events and customer directly by user key, orders through the
    * customer FK, lineitem through the order FK (two-hop fan-out). One
    * summary row per table — the audit artifact a right-to-be-forgotten
    * job must produce before committing the delete.
    *
    * 100 TB posture: the request list is broadcast to every fact scan
    * (erasure queues are small by nature); the lineitem hop semi-joins
    * against the DELETED orders only — also broadcast-sized, bounded by
    * requests × orders-per-customer — so no fact-to-fact shuffle exists
    * anywhere in the cascade.
    */
  def forgetUserCascade(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val del = events.filter(col("user_id") % 23 === 0)
      .select(col("user_id")).distinct()
    val eventsRow = events
      .join(broadcast(del), Seq("user_id"), "left_semi")
      .agg(count(lit(1)).as("n_deleted"))
      .crossJoin(events.agg(count(lit(1)).as("n_total")))
      .select(lit("events").as("table_name"), col("n_total"), col("n_deleted"))
    val customer = Tables.customer(spark, sfDir)
    val custRow = customer
      .join(broadcast(del), col("c_custkey") === col("user_id"), "left_semi")
      .agg(count(lit(1)).as("n_deleted"))
      .crossJoin(customer.agg(count(lit(1)).as("n_total")))
      .select(lit("customer").as("table_name"), col("n_total"),
        col("n_deleted"))
    val orders = Tables.orders(spark, sfDir)
    val delOrders = orders
      .join(broadcast(del), col("o_custkey") === col("user_id"), "left_semi")
      .select(col("o_orderkey"))
    val ordersRow = delOrders.agg(count(lit(1)).as("n_deleted"))
      .crossJoin(orders.agg(count(lit(1)).as("n_total")))
      .select(lit("orders").as("table_name"), col("n_total"), col("n_deleted"))
    val lineitem = Tables.lineitem(spark, sfDir)
    val lineRow = lineitem
      .join(broadcast(delOrders), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .agg(count(lit(1)).as("n_deleted"))
      .crossJoin(lineitem.agg(count(lit(1)).as("n_total")))
      .select(lit("lineitem").as("table_name"), col("n_total"),
        col("n_deleted"))
    eventsRow.unionByName(custRow).unionByName(ordersRow).unionByName(lineRow)
      .select(col("table_name"), col("n_total"), col("n_deleted"),
        (col("n_total") - col("n_deleted")).as("n_surviving"))
      .orderBy(col("table_name"))
  }

  /** Temporal train/test split with an embargo gap: the train window ends
    * at 70% of the event time range (pure integer µs arithmetic on
    * min/max — no quantile estimation, so the boundary is scale-free and
    * engine-exact), a 1-day embargo absorbs label lookahead, and the rest
    * is test. Per split: row count, distinct users, and how many of those
    * users also appear in train — the entity-leakage number that decides
    * whether a temporal split is honest for per-user features.
    *
    * 100 TB posture: min/max is a cheap full-scan aggregate (or free from
    * parquet footer stats); the train-user set for the leakage join is a
    * distinct-key aggregate, broadcast when small and a plain shuffled
    * semi-flag join otherwise. Everything else is one pass over events.
    */
  def temporalSplitEmbargo(spark: SparkSession, sfDir: String): DataFrame = {
    val gapUs = 86400000000L
    val e = Tables.events(spark, sfDir)
      .select(col("ts_us").as("us"), col("user_id"))
    val bounds = e.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val tagged = e.crossJoin(broadcast(bounds))
      .withColumn("train_end",
        expr("lo + CAST(((hi - lo) * 7) DIV 10 AS BIGINT)"))
      .withColumn("split",
        when(col("us") <= col("train_end"), "train")
          .when(col("us") <= col("train_end") + gapUs, "embargo")
          .otherwise("test"))
    val trainUsers = tagged.filter(col("split") === "train")
      .select(col("user_id").as("t_user")).distinct()
    tagged
      .join(broadcast(trainUsers), col("user_id") === col("t_user"), "left")
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("user_id")).as("n_users"),
        count_distinct(when(col("t_user").isNotNull, col("user_id")))
          .as("n_users_in_train"))
      .orderBy(col("split"))
  }

  /** Exact type-1 quantile IQR outlier gate over the daily revenue series:
    * daily cents sums, Q1/Q3 picked by an EXPLICIT discrete rule (the
    * value at row ⌈p·n⌉ of the (cents, day)-ordered series — spelled out
    * because Spark's percentile_disc and DuckDB's quantile_disc disagree
    * on index rounding), and the Tukey 1.5·IQR fence evaluated in pure
    * integer arithmetic (the whole inequality ×2, so the 3/2 factor never
    * leaves ℤ). Per-day verdicts — the anomaly gate a daily-partition
    * quality monitor runs before admitting a partition to training.
    *
    * 100 TB posture: the quantile runs over the DAILY aggregate (one row
    * per partition-day — thousands, not billions), so the sort is trivial
    * regardless of fact size; the single fact-side pass is the daily sum.
    */
  def percentileBandsValue(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(expr("ts_us DIV 86400000000").as("day"))
      .agg(sum(cents).as("day_cents"))
    val ranked = daily.withColumn("rn",
        row_number().over(Window.orderBy(col("day_cents"), col("day"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    val q = ranked
      .select(col("day_cents"), col("rn"),
        expr("(25 * n + 99) DIV 100").as("rn_q1"),
        expr("(75 * n + 99) DIV 100").as("rn_q3"))
      .agg(
        max(when(col("rn") === col("rn_q1"), col("day_cents"))).as("q1_cents"),
        max(when(col("rn") === col("rn_q3"), col("day_cents"))).as("q3_cents"))
    daily.crossJoin(broadcast(q))
      .select(
        col("day"), col("day_cents"), col("q1_cents"), col("q3_cents"),
        (col("day_cents") * 2 < col("q1_cents") * 2
          - (col("q3_cents") - col("q1_cents")) * 3
          || col("day_cents") * 2 > col("q3_cents") * 2
          + (col("q3_cents") - col("q1_cents")) * 3).as("is_outlier"))
      .orderBy(col("day"))
  }

  /** Fixed-width histogram of event cents via the SQL-standard
    * width_bucket — 20 buckets over [0, 50000), integer bucket bounds
    * recomputed from the bucket id so the output carries no
    * floating-point. The one-pass profile a feature store materializes
    * per column per partition.
    *
    * 100 TB posture: map-side partial aggregation into ≤ n_buckets + 2
    * groups — the shuffle is constant-size no matter the fact rows.
    */
  def widthBucketHist(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .select(cents.as("c"))
      .groupBy(expr("CAST(width_bucket(c, 0, 50000, 20) AS BIGINT)")
        .as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        ((col("bucket") - 1) * 2500).as("lo_cents"),
        // Bucket n+1 (= 21) is the unbounded overflow bucket (values
        // >= 50000); a finite hi recomputed from the id misrepresents
        // it, so the upper bound is NULL there (same on the oracle).
        when(col("bucket") <= 20, col("bucket") * 2500).as("hi_cents"),
        col("n"))
      .orderBy(col("bucket"))
  }

  /** Time-weighted average event value per user: each event's cents held
    * until the next event (lead over the per-user timeline), weighted by
    * the gap in WHOLE SECONDS (µs DIV 1e6 — integer, and it keeps
    * Σ cents·gap < 2^63 for decade-long histories), one division at the
    * end. The duration-weighted mean is the correct aggregate for
    * state-like signals (a value that persists between observations) —
    * the plain mean over-weights bursts.
    *
    * 100 TB posture: one shuffle on user_id reused by the lead window and
    * the groupBy; per-user state is three integers.
    */
  def timeWeightedAvgUser(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents.as("y"))
      .withColumn("gap_s",
        expr("(lead(ts_us) OVER (PARTITION BY user_id "
          + "ORDER BY ts_us, event_id) - ts_us) DIV 1000000"))
      .filter(col("gap_s").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_holds"),
        sum(col("y") * col("gap_s")).as("twa_num"),
        sum(col("gap_s")).as("twa_den"))
      .filter(col("twa_den") > 0)
      .select(col("user_id"), col("n_holds"), col("twa_num"), col("twa_den"),
        (col("twa_num").cast("double") / col("twa_den").cast("double"))
          .as("twa_cents"))
      .orderBy(col("user_id"))
  }

  /** Constant-size table-integrity diff: per-day bit_xor fingerprint of a
    * canonical 60-bit row hash, computed for the events table AND for a
    * deliberately perturbed replica (purchase values doubled on one day)
    * — the output says exactly which daily partitions drifted without
    * moving any rows. The replication/backfill audit that normally powers
    * a Merkle-style comparison: one BIGINT per partition per side.
    *
    * 100 TB posture: each side is a single map-side-combinable xor
    * aggregate (xor is commutative/associative — partitioning-proof);
    * comparing replicas exchanges ≤ one row per partition-day. The
    * perturbed side here stands in for "the other cluster's copy".
    */
  def tableChecksumDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.events(spark, sfDir)
      .select(expr("ts_us DIV 86400000000").as("day"), col("event_id"),
        col("event_type"), cents.as("c"))
    val perturbed = base.withColumn("c",
      when(col("event_type") === "purchase" && col("day") % 7 === 3,
        col("c") * 2).otherwise(col("c")))
    def fp(df: DataFrame, name: String) = df
      .withColumn("h", expr("CAST(conv(substr(md5(concat(CAST(event_id AS "
        + "STRING), ':', event_type, ':', CAST(c AS STRING))), 1, 15), 16, "
        + "10) AS BIGINT)"))
      .groupBy(col("day"))
      .agg(expr("bit_xor(h)").as(name), count(lit(1)).as(s"n_$name"))
    fp(base, "fp_a").join(fp(perturbed, "fp_b"), Seq("day"))
      .select(col("day"), col("fp_a"), col("fp_b"),
        col("n_fp_a").as("n_rows"),
        (col("fp_a") === col("fp_b")).as("matches"))
      .orderBy(col("day"))
  }

  /** Benford first-digit screen over order totals: the distribution of
    * the leading digit of o_totalprice cents — the classic fraud /
    * fabricated-data screen (organic money amounts lean on small leading
    * digits; uniform or spiky distributions flag synthesis). Digit taken
    * from the BIGINT's decimal string so there is no float log10
    * anywhere; share is one class-2 division.
    *
    * 100 TB posture: map-side partial aggregation into ≤ 9 groups, the
    * 1-row total broadcast back — constant-size everything.
    */
  def benfordFirstDigit(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.orders(spark, sfDir)
      .select(expr("substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS "
        + "BIGINT) AS STRING), 1, 1)").as("digit"))
    val tot = d.agg(count(lit(1)).as("n_total"))
    d.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"), col("n_total"),
        (col("n").cast("double") / col("n_total").cast("double")).as("share"))
      .orderBy(col("digit"))
  }

  /** RFM customer segmentation: per customer, Recency (latest order day),
    * Frequency (order count) and Monetary (cents sum), each scored 1–4 by
    * ntile(4) over a TOTAL order (metric, then custkey — the tie-break
    * makes ntile engine-deterministic; SQL-standard ntile splits equally
    * with the remainder to the leading buckets, identical in Spark and
    * DuckDB). Output is the per-segment rollup — the marketing/curation
    * segmentation every CRM pipeline materializes.
    *
    * 100 TB posture: the per-customer rollup is one fact shuffle; the
    * three ntile windows run over the CUSTOMER aggregate (entity-level,
    * orders-of-magnitude smaller than facts). A global ntile window is a
    * single-partition sort of that entity table — fine at dimension
    * scale; at billions of entities the same scores come from a
    * quantile-boundary broadcast instead.
    */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(
        max(expr("CAST(datediff(CAST(o_orderdate AS DATE), "
          + "DATE'1970-01-01') AS BIGINT)")).as("r_day"),
        count(lit(1)).as("f_orders"),
        sum(cents).as("m_cents"))
    val scored = perCust
      .withColumn("r", ntile(4).over(
        Window.orderBy(col("r_day"), col("o_custkey"))).cast("long"))
      .withColumn("f", ntile(4).over(
        Window.orderBy(col("f_orders"), col("o_custkey"))).cast("long"))
      .withColumn("m", ntile(4).over(
        Window.orderBy(col("m_cents"), col("o_custkey"))).cast("long"))
    scored
      .groupBy((col("r") * 100 + col("f") * 10 + col("m")).as("segment"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("m_cents")).as("sum_m_cents"))
      .select(col("segment"), col("n_customers"), col("sum_m_cents"),
        (col("sum_m_cents").cast("double")
          / col("n_customers").cast("double")).as("avg_m_cents"))
      .orderBy(col("segment"))
  }

  /** Structural pattern profiling over three string dimensions: every
    * value maps to its character-class signature (digits→9, upper→A,
    * lower→a), and the top-3 signatures per column are reported — the DQ
    * profiler output that catches format drift (a new ID scheme, a
    * truncated code) without enumerating values. Rank ties break on the
    * lexicographic pattern so the top-3 is total-order deterministic.
    *
    * 100 TB posture: the signature map is per-row compute; per-column
    * distinct signatures are few (format families), so the aggregate and
    * the rank window run on tiny data. Dimension scans here; on facts the
    * same profile is one pass.
    */
  def patternProfileColumns(spark: SparkSession, sfDir: String): DataFrame = {
    def profile(df: DataFrame, colName: String): DataFrame = df
      .select(expr(s"regexp_replace(regexp_replace(regexp_replace($colName,"
        + " '[0-9]', '9'), '[A-Z]', 'A'), '[a-z]', 'a')").as("pattern"))
      .groupBy(col("pattern")).agg(count(lit(1)).as("n"))
      .select(lit(colName).as("col_name"), col("pattern"), col("n"))
    val all = profile(Tables.customer(spark, sfDir), "c_name")
      .unionByName(profile(Tables.part(spark, sfDir), "p_type"))
      .unionByName(profile(Tables.orders(spark, sfDir), "o_orderpriority"))
    all
      .withColumn("rank", row_number().over(Window.partitionBy(col("col_name"))
        .orderBy(col("n").desc, col("pattern"))).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("col_name"), col("rank"), col("pattern"), col("n"))
      .orderBy(col("col_name"), col("rank"))
  }

  /** First-touch / last-touch revenue attribution: every purchase's cents
    * credit the user's FIRST and MOST RECENT non-purchase event (the
    * marketing channel) strictly before it — first_value / last_value
    * IGNORE NULLS over the per-user timeline with an UNBOUNDED..1
    * PRECEDING frame; purchases with no prior touch land in the 'none'
    * channel. Output is one row per (model, channel) — the two canonical
    * single-touch attribution models every growth team reconciles.
    *
    * 100 TB posture: one hashpartitioning(user_id) exchange serves both
    * window functions (same key+order), then a constant-size
    * (model × channels) aggregate. No joins at all.
    */
  def attributionFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    val touched = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"), cents.as("c"))
      .selectExpr(
        "event_type", "c",
        """first_value(CASE WHEN event_type <> 'purchase' THEN event_type END)
          |  IGNORE NULLS OVER (
          |  PARTITION BY user_id ORDER BY ts_us, event_id
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |  AS first_touch""".stripMargin,
        """last_value(CASE WHEN event_type <> 'purchase' THEN event_type END)
          |  IGNORE NULLS OVER (
          |  PARTITION BY user_id ORDER BY ts_us, event_id
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |  AS last_touch""".stripMargin)
      .filter(col("event_type") === "purchase")
    val first = touched
      .groupBy(coalesce(col("first_touch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("c")).as("cents"))
      .select(lit("first_touch").as("model"), col("channel"),
        col("n_purchases"), col("cents"))
    val last = touched
      .groupBy(coalesce(col("last_touch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("c")).as("cents"))
      .select(lit("last_touch").as("model"), col("channel"),
        col("n_purchases"), col("cents"))
    first.unionByName(last).orderBy(col("model"), col("channel"))
  }

  /** Power-of-two inter-arrival histogram per event type: consecutive
    * gaps (whole seconds) on each type's global timeline, bucketed by the
    * gap's binary magnitude — bucket = length(bin(gap)), an INTEGER log2
    * (no float log anywhere), with the [2^(b−1), 2^b) bounds recomputed
    * from the bucket id. The traffic-cadence profile that separates
    * steady telemetry from bursty user action and catches dead feeds
    * (mass in high buckets).
    *
    * 100 TB posture: one shuffle on event_type for the lag window (at
    * planet scale the timeline would partition further by day and stitch
    * boundaries), then a ≤ types × 64 bucket aggregate. Zero-second gaps
    * (sub-second arrivals) get bucket 0 explicitly.
    */
  def interarrivalHistType(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_us"), col("event_id"))
      .withColumn("gap_s",
        expr("(ts_us - lag(ts_us) OVER (PARTITION BY event_type "
          + "ORDER BY ts_us, event_id)) DIV 1000000"))
      .filter(col("gap_s").isNotNull)
      .groupBy(col("event_type"),
        when(col("gap_s") <= 0, lit(0L))
          .otherwise(expr("CAST(length(bin(gap_s)) AS BIGINT)")).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("bucket"),
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("CAST(pow(2, bucket - 1) AS BIGINT)")).as("lo_s"),
        expr("CAST(pow(2, bucket) AS BIGINT)").as("hi_s"),
        col("n"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** DuckDB oracle twins (dialect: epoch_us, `//` integer division,
    * string_split / list lambdas).
    */
  // Output-type protocol (COVERAGE.md header): every integer aggregate
  // reaching an output list is CAST(... AS BIGINT) on both engines —
  // DuckDB types bare integer sums HUGEINT, which hash-mismatches
  // Spark's BIGINT at the driver even on equal values (r10 incident:
  // 16 red queries). tools/local_check.py enforces this by type-gate.
  /** D+/forecast: HOLT LINEAR TREND (double-exponential smoothing) over
    * the daily revenue series, α = β = 1/2 in integer-cents fixed point —
    * the trend-aware upgrade of the per-user EWMA and the level/trend
    * complement of the seasonal-naive backtest: level' = ⌊(y + level +
    * trend)/2⌋, trend' = ⌊(trend + (level' − level))/2⌋, one-step-ahead
    * fit = level + trend. Halving is `floor(x / 2.0)` — an EXACT IEEE
    * operation on integer-valued doubles — on BOTH engines, because
    * Spark's `DIV` truncates toward zero while DuckDB's `//` floors, and
    * trend deltas go negative.
    *
    * Shape: the recurrence is inherently sequential, so it folds a
    * SINGLE `aggregate()` over the sorted calendar-bounded daily array
    * (≤366 elements/year at ANY corpus size — the ewma_user_value idiom
    * lifted to the global series); the fact scan only feeds the day
    * aggregate. The oracle replays the identical recursion as a DuckDB
    * RECURSIVE CTE.
    */
  def holtLinearDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .select(expr("ts_us DIV 86400000000").as("day"), cents.as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("y"))
    daily
      .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("ds"))
      .select(explode(expr(
        """aggregate(ds,
          |  named_struct('init', false,
          |    'level', CAST(0 AS BIGINT), 'trend', CAST(0 AS BIGINT),
          |    'out', CAST(array() AS ARRAY<STRUCT<day: BIGINT, y: BIGINT,
          |      level: BIGINT, trend: BIGINT, fitted: BIGINT>>)),
          |  (acc, e) -> CASE WHEN NOT acc.init THEN
          |      named_struct('init', true, 'level', e.y,
          |        'trend', CAST(0 AS BIGINT),
          |        'out', array(named_struct('day', e.day, 'y', e.y,
          |          'level', e.y, 'trend', CAST(0 AS BIGINT), 'fitted', e.y)))
          |    ELSE named_struct('init', true,
          |      'level', CAST(floor((e.y + acc.level + acc.trend) / 2.0) AS BIGINT),
          |      'trend', CAST(floor((acc.trend
          |        + (CAST(floor((e.y + acc.level + acc.trend) / 2.0) AS BIGINT)
          |           - acc.level)) / 2.0) AS BIGINT),
          |      'out', array_append(acc.out, named_struct('day', e.day, 'y', e.y,
          |        'level', CAST(floor((e.y + acc.level + acc.trend) / 2.0) AS BIGINT),
          |        'trend', CAST(floor((acc.trend
          |          + (CAST(floor((e.y + acc.level + acc.trend) / 2.0) AS BIGINT)
          |             - acc.level)) / 2.0) AS BIGINT),
          |        'fitted', acc.level + acc.trend)))
          |    END,
          |  acc -> acc.out)""".stripMargin)).as("h"))
      .select(col("h.day").as("day"), col("h.y").as("y_cents"),
        col("h.level").as("level_cents"), col("h.trend").as("trend_cents"),
        col("h.fitted").as("fitted_cents"),
        abs(col("h.y") - col("h.fitted")).as("abs_err_cents"))
      .orderBy(col("day"))
  }

  object Oracle {

    val holtLinearDaily: String =
      """WITH RECURSIVE d AS (
        |  SELECT row_number() OVER (ORDER BY day) AS rn, day, y
        |  FROM (SELECT epoch_us(ts) // 86400000000 AS day,
        |          CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |            AS y
        |        FROM events GROUP BY 1)),
        |h AS (
        |  SELECT rn, day, y, y AS level, CAST(0 AS BIGINT) AS trend,
        |    y AS fitted
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.rn, d.day, d.y,
        |    CAST(floor((d.y + h.level + h.trend) / 2.0) AS BIGINT),
        |    CAST(floor((h.trend
        |      + (CAST(floor((d.y + h.level + h.trend) / 2.0) AS BIGINT)
        |         - h.level)) / 2.0) AS BIGINT),
        |    h.level + h.trend
        |  FROM h JOIN d ON d.rn = h.rn + 1)
        |SELECT day, y AS y_cents, level AS level_cents, trend AS trend_cents,
        |  fitted AS fitted_cents, abs(y - fitted) AS abs_err_cents
        |FROM h ORDER BY day""".stripMargin

    val assocRulesBrands: String =
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |cnt AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
        |tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM b),
        |pr AS (
        |  SELECT x.p_brand AS brand_a, y.p_brand AS brand_b
        |  FROM b x JOIN b y
        |    ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand),
        |s AS (SELECT brand_a, brand_b, CAST(count(*) AS BIGINT) AS support
        |      FROM pr GROUP BY 1, 2)
        |SELECT s.brand_a, s.brand_b, s.support,
        |  ca.c AS cnt_a, cb.c AS cnt_b, tot.n_orders,
        |  CAST(s.support AS DOUBLE) / CAST(ca.c AS DOUBLE) AS confidence,
        |  CAST(s.support * tot.n_orders AS DOUBLE)
        |    / CAST(ca.c * cb.c AS DOUBLE) AS lift
        |FROM s
        |JOIN cnt ca ON ca.p_brand = s.brand_a
        |JOIN cnt cb ON cb.p_brand = s.brand_b
        |CROSS JOIN tot
        |WHERE s.support >= 50
        |ORDER BY s.support DESC, s.brand_a, s.brand_b""".stripMargin

    val olsTrendUser: String =
      """WITH r AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS BIGINT) AS x,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        |  FROM events),
        |s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |    CAST(sum(x * y) AS BIGINT) AS sum_xy, CAST(sum(x * x) AS BIGINT) AS sum_xx
        |  FROM r GROUP BY 1)
        |SELECT user_id, n_events,
        |  CAST(n_events * sum_xy - sum_x * sum_y AS BIGINT) AS slope_num,
        |  CAST(n_events * sum_xx - sum_x * sum_x AS BIGINT) AS slope_den,
        |  CAST(n_events * sum_xy - sum_x * sum_y AS DOUBLE)
        |    / CAST(n_events * sum_xx - sum_x * sum_x AS DOUBLE)
        |    AS slope_cents_per_rank
        |FROM s
        |WHERE n_events >= 20
        |ORDER BY user_id""".stripMargin

    val cosineTfPairs: String =
      """WITH tk0 AS (
        |  SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM tk0 WHERE length(tok) > 0 GROUP BY 1, 2, 3),
        |blk AS (
        |  SELECT doc_id, lang, CAST(sum(tf * tf) AS BIGINT) AS n2, sum(tf) // 8 AS band,
        |    substr(min(lpad(CAST(1000000000000 - tf AS VARCHAR), 13, '0')
        |      || ':' || tok), 15) AS top_tok
        |  FROM tf GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.n2 AS n2a, b.n2 AS n2b
        |  FROM blk a JOIN blk b
        |    ON a.lang = b.lang AND a.band = b.band
        |    AND a.top_tok = b.top_tok AND a.doc_id < b.doc_id),
        |dots AS (
        |  SELECT p.doc_a, p.doc_b, p.n2a, p.n2b, CAST(sum(x.tf * y.tf) AS BIGINT) AS dot
        |  FROM pairs p
        |  JOIN tf x ON x.doc_id = p.doc_a
        |  JOIN tf y ON y.doc_id = p.doc_b AND y.tok = x.tok
        |  GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b, dot, n2a, n2b,
        |  CAST(dot * dot AS DOUBLE) / CAST(n2a * n2b AS DOUBLE) AS cos2
        |FROM dots
        |WHERE CAST(dot * dot AS DOUBLE) / CAST(n2a * n2b AS DOUBLE) >= 0.81
        |ORDER BY doc_a, doc_b""".stripMargin

    val chi2EventDow: String =
      """WITH e AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
        |  FROM events),
        |cells AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS observed
        |          FROM e GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS r_tot FROM e GROUP BY 1),
        |ct AS (SELECT dow, CAST(count(*) AS BIGINT) AS c_tot FROM e GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM e)
        |SELECT cells.event_type, cells.dow, cells.observed,
        |  rt.r_tot, ct.c_tot, tot.n_total,
        |  cells.observed * tot.n_total - rt.r_tot * ct.c_tot AS dev_scaled,
        |  CAST(cells.observed * tot.n_total - rt.r_tot * ct.c_tot AS DOUBLE)
        |    * CAST(cells.observed * tot.n_total - rt.r_tot * ct.c_tot AS DOUBLE)
        |    / (CAST(tot.n_total AS DOUBLE) * CAST(rt.r_tot AS DOUBLE)
        |      * CAST(ct.c_tot AS DOUBLE)) AS chi2_cell
        |FROM cells
        |JOIN rt ON rt.event_type = cells.event_type
        |JOIN ct ON ct.dow = cells.dow
        |CROSS JOIN tot
        |ORDER BY cells.event_type, cells.dow""".stripMargin

    val forgetUserCascade: String =
      """WITH del AS (
        |  SELECT DISTINCT user_id FROM events WHERE user_id % 23 = 0),
        |del_orders AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT user_id FROM del)),
        |t AS (
        |  SELECT 'events' AS table_name,
        |    CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(count(*) FILTER (user_id IN (SELECT user_id FROM del))
        |      AS BIGINT) AS n_deleted
        |  FROM events
        |  UNION ALL
        |  SELECT 'customer',
        |    CAST(count(*) AS BIGINT),
        |    CAST(count(*) FILTER (c_custkey IN (SELECT user_id FROM del))
        |      AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'orders',
        |    CAST(count(*) AS BIGINT),
        |    CAST(count(*) FILTER (o_custkey IN (SELECT user_id FROM del))
        |      AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem',
        |    CAST(count(*) AS BIGINT),
        |    CAST(count(*) FILTER (l_orderkey IN
        |      (SELECT o_orderkey FROM del_orders)) AS BIGINT)
        |  FROM lineitem)
        |SELECT table_name, n_total, n_deleted,
        |  n_total - n_deleted AS n_surviving
        |FROM t
        |ORDER BY table_name""".stripMargin

    val percentileBandsValue: String =
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT day_cents,
        |    row_number() OVER (ORDER BY day_cents, day) AS rn,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM daily),
        |q AS (
        |  SELECT
        |    max(CASE WHEN rn = (25 * n + 99) // 100 THEN day_cents END) AS q1_cents,
        |    max(CASE WHEN rn = (75 * n + 99) // 100 THEN day_cents END) AS q3_cents
        |  FROM r)
        |SELECT d.day, d.day_cents, q.q1_cents, q.q3_cents,
        |  (d.day_cents * 2 < q.q1_cents * 2 - (q.q3_cents - q.q1_cents) * 3
        |   OR d.day_cents * 2 > q.q3_cents * 2 + (q.q3_cents - q.q1_cents) * 3)
        |   AS is_outlier
        |FROM daily d CROSS JOIN q
        |ORDER BY d.day""".stripMargin

    /** DuckDB has no width_bucket; for cents ≥ 0 the SQL-standard bucket
      * is exactly least(c // 2500, 20) + 1 (values ≥ hi clamp into the
      * overflow bucket n+1) — an independent formulation that
      * cross-checks Spark's width_bucket arithmetic, including the
      * overflow clamp that scaled fixtures exercise.
      */
    val widthBucketHist: String =
      """WITH c AS (
        |  SELECT least(CAST(floor(value * 100 + 0.5) AS BIGINT) // 2500, 20)
        |    + 1 AS bucket
        |  FROM events)
        |SELECT bucket,
        |  (bucket - 1) * 2500 AS lo_cents,
        |  CASE WHEN bucket <= 20 THEN bucket * 2500 END AS hi_cents,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM c
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin

    val timeWeightedAvgUser: String =
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        |  FROM events),
        |g AS (
        |  SELECT user_id, y,
        |    (lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      - ts_us) // 1000000 AS gap_s
        |  FROM e),
        |s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_holds,
        |    CAST(sum(y * gap_s) AS BIGINT) AS twa_num, CAST(sum(gap_s) AS BIGINT) AS twa_den
        |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_holds, twa_num, twa_den,
        |  CAST(twa_num AS DOUBLE) / CAST(twa_den AS DOUBLE) AS twa_cents
        |FROM s
        |WHERE twa_den > 0
        |ORDER BY user_id""".stripMargin

    val tableChecksumDiff: String =
      """WITH base AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |pert AS (
        |  SELECT day, event_id, event_type,
        |    CASE WHEN event_type = 'purchase' AND day % 7 = 3
        |      THEN c * 2 ELSE c END AS c
        |  FROM base),
        |fa AS (
        |  SELECT day,
        |    bit_xor(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
        |      || event_type || ':' || CAST(c AS VARCHAR)), 1, 15))::BIGINT)
        |      AS fp_a,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM base GROUP BY 1),
        |fb AS (
        |  SELECT day,
        |    bit_xor(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
        |      || event_type || ':' || CAST(c AS VARCHAR)), 1, 15))::BIGINT)
        |      AS fp_b
        |  FROM pert GROUP BY 1)
        |SELECT fa.day, fa.fp_a, fb.fp_b, fa.n_rows,
        |  fa.fp_a = fb.fp_b AS matches
        |FROM fa JOIN fb ON fa.day = fb.day
        |ORDER BY fa.day""".stripMargin

    val attributionFirstLast: String =
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |t AS (
        |  SELECT event_type, c,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS first_touch,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_touch
        |  FROM e),
        |p AS (SELECT * FROM t WHERE event_type = 'purchase')
        |SELECT 'first_touch' AS model,
        |  coalesce(first_touch, 'none') AS channel,
        |  CAST(count(*) AS BIGINT) AS n_purchases, CAST(sum(c) AS BIGINT) AS cents
        |FROM p GROUP BY 2
        |UNION ALL
        |SELECT 'last_touch', coalesce(last_touch, 'none'),
        |  CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT)
        |FROM p GROUP BY 2
        |ORDER BY model, channel""".stripMargin

    val interarrivalHistType: String =
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS ts_us, event_id FROM events),
        |g AS (
        |  SELECT event_type,
        |    (ts_us - lag(ts_us) OVER (PARTITION BY event_type
        |      ORDER BY ts_us, event_id)) // 1000000 AS gap_s
        |  FROM e),
        |b AS (
        |  SELECT event_type,
        |    CASE WHEN gap_s <= 0 THEN 0
        |      ELSE CAST(length(bin(gap_s)) AS BIGINT) END AS bucket
        |  FROM g WHERE gap_s IS NOT NULL)
        |SELECT event_type, bucket,
        |  CASE WHEN bucket = 0 THEN 0
        |    ELSE CAST(pow(2, bucket - 1) AS BIGINT) END AS lo_s,
        |  CAST(pow(2, bucket) AS BIGINT) AS hi_s,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM b
        |GROUP BY 1, 2
        |ORDER BY event_type, bucket""".stripMargin

    val benfordFirstDigit: String =
      """WITH d AS (
        |  SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS digit
        |  FROM orders),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d)
        |SELECT digit, CAST(count(*) AS BIGINT) AS n, tot.n_total,
        |  CAST(count(*) AS DOUBLE) / CAST(tot.n_total AS DOUBLE) AS share
        |FROM d CROSS JOIN tot
        |GROUP BY digit, tot.n_total
        |ORDER BY digit""".stripMargin

    val rfmSegments: String =
      """WITH pc AS (
        |  SELECT o_custkey,
        |    CAST(max(date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE))) AS BIGINT) AS r_day,
        |    CAST(count(*) AS BIGINT) AS f_orders,
        |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS m_cents
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT
        |    CAST(ntile(4) OVER (ORDER BY r_day, o_custkey) AS BIGINT) AS r,
        |    CAST(ntile(4) OVER (ORDER BY f_orders, o_custkey) AS BIGINT) AS f,
        |    CAST(ntile(4) OVER (ORDER BY m_cents, o_custkey) AS BIGINT) AS m,
        |    m_cents
        |  FROM pc)
        |SELECT r * 100 + f * 10 + m AS segment,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(m_cents) AS BIGINT) AS sum_m_cents,
        |  CAST(sum(m_cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS avg_m_cents
        |FROM s
        |GROUP BY 1
        |ORDER BY segment""".stripMargin

    val patternProfileColumns: String =
      """WITH p AS (
        |  SELECT 'c_name' AS col_name,
        |    regexp_replace(regexp_replace(regexp_replace(c_name,
        |      '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g')
        |      AS pattern
        |  FROM customer
        |  UNION ALL
        |  SELECT 'p_type',
        |    regexp_replace(regexp_replace(regexp_replace(p_type,
        |      '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g')
        |  FROM part
        |  UNION ALL
        |  SELECT 'o_orderpriority',
        |    regexp_replace(regexp_replace(regexp_replace(o_orderpriority,
        |      '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g')
        |  FROM orders),
        |c AS (SELECT col_name, pattern, CAST(count(*) AS BIGINT) AS n
        |      FROM p GROUP BY 1, 2),
        |r AS (SELECT col_name, pattern, n,
        |    CAST(row_number() OVER (PARTITION BY col_name
        |      ORDER BY n DESC, pattern) AS BIGINT) AS rank
        |  FROM c)
        |SELECT col_name, rank, pattern, n
        |FROM r
        |WHERE rank <= 3
        |ORDER BY col_name, rank""".stripMargin

    val temporalSplitEmbargo: String =
      """WITH e AS (SELECT epoch_us(ts) AS us, user_id FROM events),
        |b AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
        |tagged AS (
        |  SELECT e.us, e.user_id,
        |    CASE
        |      WHEN e.us <= b.lo + ((b.hi - b.lo) * 7) // 10 THEN 'train'
        |      WHEN e.us <= b.lo + ((b.hi - b.lo) * 7) // 10 + 86400000000
        |        THEN 'embargo'
        |      ELSE 'test' END AS split
        |  FROM e CROSS JOIN b),
        |tu AS (SELECT DISTINCT user_id FROM tagged WHERE split = 'train')
        |SELECT split,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(DISTINCT user_id)
        |    FILTER (user_id IN (SELECT user_id FROM tu)) AS BIGINT)
        |    AS n_users_in_train
        |FROM tagged
        |GROUP BY split
        |ORDER BY split""".stripMargin
  }
}
