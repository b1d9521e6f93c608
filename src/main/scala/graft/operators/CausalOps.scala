package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Experimentation / causal-inference and robust-statistics band: CUPED
  * variance-reduced A/B readout, difference-in-differences, the Theil–Sen
  * robust trend, and winsorized/trimmed means — the estimators an
  * experimentation platform and a data-quality monitor actually serve,
  * in the repo's integer-exact form.
  *
  * Determinism protocol notes (COVERAGE.md classes):
  *  - Every sum/count reaching an output is an exact BIGINT over integer
  *    cents; simple ratios are ONE IEEE division (class 2).
  *  - CUPED's theta and the adjusted means are MULTI-STEP double
  *    arithmetic; both engines evaluate the IDENTICAL expression tree
  *    over doubles that are exact casts of BIGINTs, and IEEE +,−,×,/ are
  *    deterministic operations, so the results are bit-identical — same
  *    argument as the Holt recurrence (EXPERIMENTS.md r11 band B). The
  *    BIGINT-overflow-prone products (n·Sxy) are deliberately done in
  *    double on BOTH engines.
  *  - Arm assignment is `user_id % 2` — the repo's deterministic-split
  *    idiom (hash_sample_stratified), so the experiment is reproducible.
  *  - The pre/post split point is (min+max) DIV 2 of the event-time range:
  *    a data-derived constant, exact integer µs on both engines.
  */
object CausalOps {

  private val dayUs = 86400000000L
  private val cents = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")

  /** Per-user pre/post cents with the global midpoint split. */
  private def userPrePost(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).select(col("user_id"), col("ts_us"), cents.as("c"))
    val mid = e.agg(expr("CAST((min(ts_us) + max(ts_us)) DIV 2 AS BIGINT)").as("mid"))
    e.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts_us") < col("mid"), col("c")).otherwise(0L)).as("x"),
        sum(when(col("ts_us") >= col("mid"), col("c")).otherwise(0L)).as("y"))
  }

  /** X+: CUPED A/B READOUT — the industry-standard variance-reduced
    * experiment estimator (Deng et al., WSDM'13): adjust each arm's
    * post-period metric by theta × (pre-period deviation), with theta
    * the pooled OLS slope of post on pre. Arms are `user_id % 2`; the
    * pre/post periods are the two halves of the event-time range.
    * Output: per arm, the exact BIGINT ingredients (n, Σx, Σy) plus
    * mean_y, theta, and the CUPED-adjusted mean.
    *
    * Scale: one fact scan → one user-keyed aggregate (the only
    * fact-scale exchange) → a 1-row pooled-moments aggregate broadcast
    * back → a 2-row arm aggregate. theta's products run in double to
    * dodge BIGINT overflow at corpus scale (n·Σxy exceeds 2^63 around
    * 10^5 users × decade histories); both engines share the expression
    * tree so IEEE determinism carries the hash.
    *
    * Overflow contract for the pooled moments Σxy/Σxx themselves: they
    * accumulate EXACT BIGINTs (a double sum would be shuffle-order-
    * dependent and break the hash protocol). Past ~10^9-cent user
    * lifetimes the x·y terms approach 2^63 — and BOTH engines then fail
    * loudly rather than diverge: Spark 4 runs ANSI mode (repo default,
    * never overridden), so the multiply and the running sum raise
    * ARITHMETIC_OVERFLOW, while DuckDB's HUGEINT accumulator raises on
    * the final CAST(... AS BIGINT). Terms are non-negative (cents ≥ 0),
    * so Spark's partial-sum overflow point coincides with DuckDB's
    * final-total overflow point. Pinned by the "cuped pooled moments
    * overflow errors, never wraps" spec in CausalBasketOpsSpec.
    */
  def cupedAdjustedAb(spark: SparkSession, sfDir: String): DataFrame = {
    val u = userPrePost(spark, sfDir)
    val pooled = u.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val arms = u
      .groupBy(expr("user_id % 2").as("arm"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("x")).as("sum_x_cents"),
        sum(col("y")).as("sum_y_cents"))
    arms.crossJoin(broadcast(pooled))
      .select(
        col("arm"), col("n_users"), col("sum_x_cents"), col("sum_y_cents"),
        expr("CAST(sum_y_cents AS DOUBLE) / CAST(n_users AS DOUBLE)").as("mean_y"),
        expr("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
          + " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
          .as("theta"),
        expr("CAST(sum_y_cents AS DOUBLE) / CAST(n_users AS DOUBLE)"
          + " - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
          + "    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
          + "   * (CAST(sum_x_cents AS DOUBLE) / CAST(n_users AS DOUBLE)"
          + "      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))").as("adj_mean_y"))
      .orderBy(col("arm"))
  }

  /** X+: DIFFERENCE-IN-DIFFERENCES — the four-cell (arm × period)
    * panel readout: exact event counts and cents sums per cell, the four
    * per-event means (one division each), and the DiD estimate
    * (m_t_post − m_t_pre) − (m_c_post − m_c_pre). One row out.
    *
    * Scale: ONE conditional aggregate over one fact scan — the whole
    * panel collapses map-side into 8 longs per partition.
    */
  def diffInDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).select(col("user_id"), col("ts_us"), cents.as("c"))
    val mid = e.agg(expr("CAST((min(ts_us) + max(ts_us)) DIV 2 AS BIGINT)").as("mid"))
    def cell(name: String, arm: Int, post: Boolean): Seq[org.apache.spark.sql.Column] = {
      val in =
        col("user_id") % 2 === arm &&
          (if (post) col("ts_us") >= col("mid") else col("ts_us") < col("mid"))
      Seq(
        sum(when(in, 1L).otherwise(0L)).as(s"n_$name"),
        sum(when(in, col("c")).otherwise(0L)).as(s"s_$name"))
    }
    val cells =
      cell("t_pre", 1, post = false) ++ cell("t_post", 1, post = true) ++
        cell("c_pre", 0, post = false) ++ cell("c_post", 0, post = true)
    e.crossJoin(broadcast(mid))
      .agg(cells.head, cells.tail: _*)
      .select(
        col("n_t_pre"), col("s_t_pre"), col("n_t_post"), col("s_t_post"),
        col("n_c_pre"), col("s_c_pre"), col("n_c_post"), col("s_c_post"),
        expr("CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE)").as("m_t_pre"),
        expr("CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)").as("m_t_post"),
        expr("CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE)").as("m_c_pre"),
        expr("CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)").as("m_c_post"),
        expr("(CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)"
          + " - CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))"
          + " - (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)"
          + "    - CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE))").as("did"))
  }

  /** R+: THEIL–SEN ROBUST TREND — the median-of-pairwise-slopes trend of
    * daily purchase revenue, the breakdown-point-0.29 alternative to OLS
    * (`ols_trend_user`) that one outlier day cannot move. Slope = LOWER
    * median (deterministic rank pick, (n+1) DIV 2 with (slope, d_i, d_j)
    * tie order); intercept = lower median of the per-day residuals at
    * that slope. Each slope is ONE division of exact integers; the
    * medians are rank picks, not averages, so no second rounding.
    *
    * Scale: the O(days²) pair join and the rank windows run on the
    * CALENDAR-BOUNDED daily aggregate (≤366 rows/year at any corpus
    * size) — the `kendall_tau_daily` posture; the only fact-scale work
    * is the daily rollup.
    */
  def theilSenDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr(s"ts_us DIV $dayUs").as("d"), cents.as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("c"))
    val pairs = daily.as("a").join(daily.as("b"), col("a.d") < col("b.d"))
      .select(
        col("a.d").as("di"), col("b.d").as("dj"),
        ((col("b.c") - col("a.c")).cast("double")
          / (col("b.d") - col("a.d")).cast("double")).as("slope"))
    val wS = Window.orderBy(col("slope"), col("di"), col("dj"))
    val med = pairs
      .withColumn("rn", row_number().over(wS))
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_pairs"))))
      .filter(col("rn") === expr("(n_pairs + 1) DIV 2"))
      .select(col("n_pairs"), col("slope").as("med_slope"))
    val wR = Window.orderBy(col("r"), col("d"))
    daily.crossJoin(broadcast(med))
      .withColumn("r", col("c").cast("double") - col("med_slope") * col("d").cast("double"))
      .withColumn("rn", row_number().over(wR))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
      .filter(col("rn") === expr("(n_days + 1) DIV 2"))
      .select(
        col("n_days"), col("n_pairs"),
        col("med_slope").as("slope_cents_per_day"),
        col("r").as("intercept_cents"))
  }

  /** R+: WINSORIZED / TRIMMED MEANS — per event type: the exact 5th/95th
    * percentile bounds BY RANK (k = (5n) DIV 100 ranks clipped each
    * side), the winsorized mean (values clamped to the bounds), and the
    * trimmed mean (ranks outside [k+1, n−k] dropped) — the robust
    * location estimates a metrics platform reports next to the raw mean.
    *
    * Scale: the rank arithmetic runs over the DISTINCT-CENTS GRID per
    * type (the `ks_purchase_click` posture — cumulative window over the
    * bounded value grid, never raw facts): per grid cell the number of
    * its ranks inside the trim window is exact integer arithmetic on the
    * cumulative counts, so ties at the boundary are handled identically
    * on both engines and the fact table is touched exactly once.
    */
  def winsorizedStats(spark: SparkSession, sfDir: String): DataFrame = {
    val g = Tables.events(spark, sfDir)
      .select(col("event_type"), cents.as("c"))
      .groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("c"))
    val wAll = Window.partitionBy(col("event_type"))
    val grid = g
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("cum_prev", col("cum") - col("cnt"))
      .withColumn("k", expr("(5 * n) DIV 100"))
      .withColumn("lo_rank", col("k") + 1L)
      .withColumn("hi_rank", col("n") - col("k"))
    val bounds = grid
      .filter(col("lo_rank") > col("cum_prev") && col("lo_rank") <= col("cum"))
      .select(col("event_type"), col("c").as("lo_cents"))
      .join(
        grid.filter(col("hi_rank") > col("cum_prev") && col("hi_rank") <= col("cum"))
          .select(col("event_type"), col("c").as("hi_cents")),
        "event_type")
    grid.join(broadcast(bounds), "event_type")
      .withColumn("inc",
        greatest(lit(0L),
          least(col("cum"), col("hi_rank")) - greatest(col("cum_prev"), col("lo_rank") - 1L)))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n"),
        max(col("lo_cents")).as("lo_cents"),
        max(col("hi_cents")).as("hi_cents"),
        sum(col("cnt") * greatest(least(col("c"), col("hi_cents")), col("lo_cents")))
          .as("winsor_sum"),
        sum(col("inc") * col("c")).as("trim_sum"),
        max(col("n") - lit(2L) * col("k")).as("trim_n"))
      .select(
        col("event_type"), col("n"), col("lo_cents"), col("hi_cents"),
        (col("winsor_sum").cast("double") / col("n").cast("double")).as("winsor_mean"),
        (col("trim_sum").cast("double") / col("trim_n").cast("double")).as("trim_mean"),
        col("trim_n"))
      .orderBy(col("event_type"))
  }

  /** S+: KAPLAN–MEIER SURVIVAL — the product-limit estimator of
    * time-to-first-high-value-purchase (≥ 9000 cents, the odds_ratio_ab
    * conversion) in whole days from each user's first event, with users
    * who never convert right-censored at their last observed day. Per
    * event time: the risk set from the cumulative duration histogram
    * (risk(t) = n − #durations < t — a suffix count, no per-t rescan),
    * deaths, the hazard d/n (one division), and S(t) = Π (1 − d/n)
    * folded LEFT-TO-RIGHT in ascending t — Spark as aggregate() over the
    * broadcast event-time array, DuckDB as the recursive-CTE fold whose
    * per-row accumulator IS the running product — so the float
    * multiplication chain is bit-identical (the cramers_v2 convention
    * applied to Π).
    *
    * Scale: one user-keyed aggregate (the only fact-scale exchange),
    * then everything runs on the ≤span-days duration grid; the O(grid²)
    * per-row fold is over event times, calendar-bounded at any corpus
    * size.
    */
  def kmSurvivalPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val users = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts_us DIV $dayUs").as("day"),
        col("event_type"), cents.as("c"))
      .groupBy(col("user_id"))
      .agg(
        min(col("day")).as("t0"),
        max(col("day")).as("tmax"),
        min(when(col("event_type") === "purchase" && col("c") >= 9000L,
          col("day"))).as("ev_day"))
    val dur = users.select(
      when(col("ev_day").isNotNull, col("ev_day") - col("t0"))
        .otherwise(col("tmax") - col("t0")).as("d"),
      col("ev_day").isNotNull.as("converted"))
    val hist = dur.groupBy(col("d"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("deaths"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("d"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(lit(1))))
      .withColumn("n_risk", col("n") - (col("cum") - col("cnt")))
    val ev = hist.filter(col("deaths") > 0L)
      .withColumn("factor",
        (col("n_risk") - col("deaths")).cast("double") / col("n_risk").cast("double"))
    val arr = ev.agg(expr(
      "sort_array(collect_list(struct(d, factor)))").as("arr"))
    ev.crossJoin(broadcast(arr))
      .select(
        col("d").as("t_days"), col("n_risk"), col("deaths"),
        (col("deaths").cast("double") / col("n_risk").cast("double")).as("hazard"),
        expr("aggregate(filter(arr, x -> x.d <= d), CAST(1.0 AS DOUBLE)," +
          " (acc, x) -> acc * x.factor)").as("survival"))
      .orderBy(col("t_days"))
  }

  object Oracle {

    val kmSurvivalPurchase: String =
      """WITH RECURSIVE u AS (
        |  SELECT user_id,
        |    min(epoch_us(ts) // 86400000000) AS t0,
        |    max(epoch_us(ts) // 86400000000) AS tmax,
        |    min(CASE WHEN event_type = 'purchase'
        |          AND CAST(floor(value * 100 + 0.5) AS BIGINT) >= 9000
        |        THEN epoch_us(ts) // 86400000000 END) AS ev_day
        |  FROM events GROUP BY 1),
        |dur AS (
        |  SELECT CASE WHEN ev_day IS NOT NULL THEN ev_day - t0
        |              ELSE tmax - t0 END AS d,
        |         (ev_day IS NOT NULL) AS converted
        |  FROM u),
        |hist AS (
        |  SELECT d, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS deaths
        |  FROM dur GROUP BY 1),
        |hc AS (
        |  SELECT *,
        |    sum(cnt) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS n
        |  FROM hist),
        |ev AS (
        |  SELECT d, CAST(n - (cum - cnt) AS BIGINT) AS n_risk, deaths,
        |    row_number() OVER (ORDER BY d) AS rn,
        |    CAST(n - (cum - cnt) - deaths AS DOUBLE)
        |      / CAST(n - (cum - cnt) AS DOUBLE) AS factor
        |  FROM hc WHERE deaths > 0),
        |f AS (
        |  SELECT rn, d, n_risk, deaths, factor AS acc FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.rn, e.d, e.n_risk, e.deaths, f.acc * e.factor
        |  FROM f JOIN ev e ON e.rn = f.rn + 1)
        |SELECT d AS t_days, n_risk, deaths,
        |  CAST(deaths AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
        |  acc AS survival
        |FROM f ORDER BY t_days""".stripMargin

    val cupedAdjustedAb: String =
      """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        |           FROM events),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN epoch_us(ts) < m.mid
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN epoch_us(ts) >= m.mid
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events, m GROUP BY user_id),
        |pool AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM u),
        |arms AS (
        |  SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(x) AS BIGINT) AS sum_x_cents,
        |    CAST(sum(y) AS BIGINT) AS sum_y_cents
        |  FROM u GROUP BY 1)
        |SELECT arm, n_users, sum_x_cents, sum_y_cents,
        |  CAST(sum_y_cents AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_y,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    AS theta,
        |  CAST(sum_y_cents AS DOUBLE) / CAST(n_users AS DOUBLE)
        |    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |      * (CAST(sum_x_cents AS DOUBLE) / CAST(n_users AS DOUBLE)
        |         - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS adj_mean_y
        |FROM arms, pool
        |ORDER BY arm""".stripMargin

    val diffInDiff: String =
      """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        |           FROM events),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) < m.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) < m.mid
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_t_pre,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) >= m.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) >= m.mid
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_t_post,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) < m.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) < m.mid
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_c_pre,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) >= m.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) >= m.mid
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_c_post
        |  FROM events, m)
        |SELECT n_t_pre, s_t_pre, n_t_post, s_t_post,
        |       n_c_pre, s_c_pre, n_c_post, s_c_post,
        |  CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE) AS m_t_pre,
        |  CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE) AS m_t_post,
        |  CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE) AS m_c_pre,
        |  CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE) AS m_c_post,
        |  (CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)
        |   - CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))
        |  - (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)
        |     - CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE)) AS did
        |FROM c""".stripMargin

    val theilSenDaily: String =
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |p AS (
        |  SELECT a.d AS di, b.d AS dj,
        |    CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |ps AS (
        |  SELECT slope, row_number() OVER (ORDER BY slope, di, dj) AS rn,
        |         count(*) OVER () AS n_pairs
        |  FROM p),
        |ms AS (SELECT CAST(n_pairs AS BIGINT) AS n_pairs, slope AS med_slope
        |       FROM ps WHERE rn = (n_pairs + 1) // 2),
        |res AS (
        |  SELECT CAST(daily.c AS DOUBLE) - ms.med_slope * CAST(daily.d AS DOUBLE) AS r,
        |         daily.d, ms.n_pairs, ms.med_slope,
        |         count(*) OVER () AS n_days
        |  FROM daily, ms),
        |rr AS (
        |  SELECT *, row_number() OVER (ORDER BY r, d) AS rn FROM res)
        |SELECT CAST(n_days AS BIGINT) AS n_days, n_pairs,
        |       med_slope AS slope_cents_per_day, r AS intercept_cents
        |FROM rr WHERE rn = (n_days + 1) // 2""".stripMargin

    val winsorizedStats: String =
      """WITH g AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT *,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM g),
        |grid2 AS (
        |  SELECT *, cum - cnt AS cum_prev, (5 * n) // 100 AS k,
        |    (5 * n) // 100 + 1 AS lo_rank, n - (5 * n) // 100 AS hi_rank
        |  FROM grid),
        |bounds AS (
        |  SELECT lo.event_type, lo.c AS lo_cents, hi.c AS hi_cents
        |  FROM (SELECT event_type, c FROM grid2
        |        WHERE lo_rank > cum_prev AND lo_rank <= cum) lo
        |  JOIN (SELECT event_type, c FROM grid2
        |        WHERE hi_rank > cum_prev AND hi_rank <= cum) hi
        |    ON lo.event_type = hi.event_type)
        |SELECT g2.event_type, CAST(max(g2.n) AS BIGINT) AS n,
        |  max(b.lo_cents) AS lo_cents, max(b.hi_cents) AS hi_cents,
        |  CAST(sum(g2.cnt * greatest(least(g2.c, b.hi_cents), b.lo_cents)) AS DOUBLE)
        |    / CAST(max(g2.n) AS DOUBLE) AS winsor_mean,
        |  CAST(sum(greatest(0, least(g2.cum, g2.hi_rank)
        |        - greatest(g2.cum_prev, g2.lo_rank - 1)) * g2.c) AS DOUBLE)
        |    / CAST(max(g2.n - 2 * g2.k) AS DOUBLE) AS trim_mean,
        |  CAST(max(g2.n - 2 * g2.k) AS BIGINT) AS trim_n
        |FROM grid2 g2 JOIN bounds b ON g2.event_type = b.event_type
        |GROUP BY g2.event_type
        |ORDER BY g2.event_type""".stripMargin
  }
}
