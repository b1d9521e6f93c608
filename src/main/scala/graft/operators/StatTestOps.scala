package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Statistical-testing band two: the k-sample and association-strength
  * statistics that complete the repo's nonparametric suite (KS / Spearman
  * / Kendall / Mann–Whitney are two-sample or bivariate; these are k-way)
  * plus the decision-stump split audit a feature-readiness check runs.
  *
  * Determinism protocol notes (COVERAGE.md classes):
  *  - Rank statistics use 2×-scaled average ranks so midranks stay exact
  *    BIGINTs (a tied cell's average rank is a half-integer; doubling
  *    clears the fraction) — the Spearman/ACF "cleared fraction" idiom.
  *  - k-way sums of double terms are aggregation-order-dependent, so no
  *    declared float ever crosses a groupBy: Kruskal–Wallis folds its
  *    five per-type terms in a FIXED expression order (the five fixture
  *    event types, spelled out), and Cramér's V² folds its 100 cell
  *    terms LEFT-TO-RIGHT in (lang, source) order — Spark as
  *    `aggregate(sort_array(collect_list(...)))`, DuckDB as the
  *    holt-style recursive-CTE fold — so both engines run the identical
  *    IEEE addition chain.
  *  - Everything else is exact BIGINT with the usual one-division
  *    quotients; n³ products run in double on BOTH engines (overflow).
  */
object StatTestOps {

  private val cents = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** K+: KRUSKAL–WALLIS H — the k-sample rank ANOVA across the five
    * event types on integer cents, with the ties correction. The overall
    * value grid carries 2×-midranks (2·cum − cnt + 1, exact BIGINT); the
    * per-type doubled rank sums R2_i are exact; H and its tie-corrected
    * form are fixed IEEE expressions over the five per-type terms in
    * spelled-out type order. One output row: n, k, the tie cube sum, H,
    * and H corrected.
    *
    * Scale: one fact-scale aggregate onto the (type × distinct-cents)
    * grid; the rank window runs over the DISTINCT-CENTS grid (the KS
    * posture), and everything after is ≤5-key arithmetic.
    */
  def kruskalWallisValue(spark: SparkSession, sfDir: String): DataFrame = {
    val typeCells = Tables.events(spark, sfDir)
      .select(col("event_type"), cents.as("c"))
      .groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("cnt_t"))
    val grid = typeCells.groupBy(col("c")).agg(sum(col("cnt_t")).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("c"))))
      .withColumn("ar2", lit(2L) * col("cum") - col("cnt") + 1L)
    val perType = typeCells.join(grid.select(col("c"), col("ar2")), "c")
      .groupBy(col("event_type"))
      .agg(sum(col("cnt_t")).as("n_t"), sum(col("cnt_t") * col("ar2")).as("r2"))
    val ties = grid.agg(
      sum(col("cnt")).as("n"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie_cube_sum"))
    // five fixed terms, spelled out, so the float sum has ONE order
    val pivotCols: Seq[Column] = eventTypes.flatMap(t => Seq(
      max(when(col("event_type") === t, col("n_t"))).as(s"n_$t"),
      max(when(col("event_type") === t, col("r2"))).as(s"r2_$t")))
    val pivoted = perType.agg(pivotCols.head, pivotCols.tail: _*)
    val sumTerm = eventTypes.map(t =>
      s"(CAST(r2_$t AS DOUBLE) * CAST(r2_$t AS DOUBLE) / (4.0 * CAST(n_$t AS DOUBLE)))")
      .mkString(" + ")
    val h = s"(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))) * ($sumTerm)" +
      " - 3.0 * (CAST(n AS DOUBLE) + 1.0)"
    val corr = "(1.0 - CAST(tie_cube_sum AS DOUBLE)" +
      " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))"
    pivoted.crossJoin(broadcast(ties))
      .select(
        col("n"), lit(5L).as("k"), col("tie_cube_sum"),
        expr(h).as("h"),
        expr(s"($h) / $corr").as("h_tie_corrected"))
  }

  /** K+: ODDS / RISK RATIO — the 2×2 conversion readout of the
    * `user_id % 2` experiment: exposure arm × converted (user produced
    * at least one HIGH-VALUE purchase, ≥ 9000 cents — plain "any
    * purchase" is universally true of the fixture, which degenerates
    * the table). Exact BIGINT cells; the odds ratio
    * (a·d)/(b·c) and risk ratio are each ONE division of exact integer
    * products (cell counts are user counts, so the products stay far
    * under 2^63). One output row.
    *
    * Scale: one user-keyed conversion aggregate (the only fact-scale
    * exchange), then 2×2 arithmetic.
    */
  def oddsRatioAb(spark: SparkSession, sfDir: String): DataFrame = {
    val u = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && cents >= 9000L, 1L)
        .otherwise(0L)).as("conv"))
    u.agg(
        sum(when(col("user_id") % 2 === 1 && col("conv") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("user_id") % 2 === 1 && col("conv") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("user_id") % 2 === 0 && col("conv") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("user_id") % 2 === 0 && col("conv") === 0, 1L).otherwise(0L)).as("d"))
      .select(
        col("a").as("n_t_conv"), col("b").as("n_t_not"),
        col("c").as("n_c_conv"), col("d").as("n_c_not"),
        // NULL-guarded: a universal-conversion cohort (b = d = 0, true of
        // the fixture at small SF) has no defined odds ratio — the
        // feed_freshness day_over_day convention, and Spark's ANSI /0
        // would error rather than yield DuckDB's value anyway.
        expr("CASE WHEN b * c = 0 THEN NULL" +
          " ELSE CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE) END").as("odds_ratio"),
        expr("CASE WHEN c * (a + b) = 0 THEN NULL" +
          " ELSE CAST(a * (c + d) AS DOUBLE) / CAST(c * (a + b) AS DOUBLE) END")
          .as("risk_ratio"))
  }

  /** K+: CRAMÉR'S V² — the normalized association strength of the
    * documents lang × source contingency table: V² = χ² / (n·(min(r,c)−1)),
    * the effect size that makes χ² comparable across table shapes (V
    * itself needs sqrt, banned; V² is the declared form, standard in
    * meta-analysis). Per-cell χ² terms use the exact cleared-fraction
    * deviation (O·N − R·C)² / (N·R·C) — the `chi2_event_dow` arithmetic —
    * and the 100-cell total is folded LEFT-TO-RIGHT in (lang, source)
    * order on both engines (Spark: aggregate over a sorted collect_list;
    * DuckDB: recursive-CTE fold), so the float addition chain is
    * bit-identical. ZERO cells contribute their expected-count term
    * (R·C)²/(N·R·C) = R·C/N, so missing combinations are generated.
    *
    * Scale: three bounded aggregates (cells, row totals, column totals —
    * ≤ r·c keys each) off one fact scan; the fold runs on ≤100 rows.
    */
  def cramersV2LangSource(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select(col("lang"), col("source"))
    val rowTot = d.groupBy(col("lang")).agg(count(lit(1)).as("r_tot"))
    val colTot = d.groupBy(col("source")).agg(count(lit(1)).as("c_tot"))
    val obs = d.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val total = d.agg(count(lit(1)).as("n_total"))
    // full r×c lattice so zero cells still carry their E term
    val cells = rowTot.crossJoin(colTot)
      .join(obs, Seq("lang", "source"), "left")
      .withColumn("observed", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("dev_scaled",
        col("observed") * col("n_total") - col("r_tot") * col("c_tot"))
      .withColumn("term",
        col("dev_scaled").cast("double") * col("dev_scaled").cast("double")
          / (col("n_total").cast("double") * col("r_tot").cast("double")
            * col("c_tot").cast("double")))
    cells.agg(
        expr("aggregate(sort_array(collect_list(struct(lang, source, term))), " +
          "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)").as("chi2"),
        max(col("n_total")).as("n"),
        countDistinct(col("lang")).as("r_cnt"),
        countDistinct(col("source")).as("c_cnt"))
      .select(
        col("n"), col("r_cnt"), col("c_cnt"), col("chi2"),
        expr("chi2 / (CAST(n AS DOUBLE) * (CAST(least(r_cnt, c_cnt) AS DOUBLE) - 1.0))")
          .as("cramers_v2"))
  }

  /** K+: GINI DECISION STUMP — the best single split of integer cents
    * predicting event_type: for every candidate threshold on the
    * distinct-cents grid, the weighted Gini impurity of the ≤/> sides
    * from exact cumulative class counts, taking the (impurity, split)
    * minimum. The feature-quality audit a GBDT/feature-store pipeline
    * runs before training — "does this column split the label at all".
    * Class counts are exact BIGINTs; each side's impurity is the fixed
    * IEEE expression n_side − Σ_k n_k²/n_side, so the weighted score
    * (g_left + g_right)/n needs no cross-row float sum; the argmin
    * tie-breaks on the split value.
    *
    * Scale: one aggregate onto the distinct-cents grid with five pivoted
    * class counts, cumulative windows over the GRID (KS posture), argmin
    * by window rank. Last grid cell is excluded (an empty right side is
    * not a split).
    */
  def giniSplitStump(spark: SparkSession, sfDir: String): DataFrame = {
    val classCols: Seq[Column] = eventTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val grid = Tables.events(spark, sfDir)
      .select(col("event_type"), cents.as("c"))
      .groupBy(col("c"))
      .agg(classCols.head, classCols.tail: _*)
    val wCum = Window.orderBy(col("c"))
    val wAll = Window.partitionBy(lit(1))
    val cum = eventTypes.foldLeft(grid) { (df, t) =>
      df.withColumn(s"l_$t", sum(col(s"n_$t")).over(wCum))
        .withColumn(s"t_$t", sum(col(s"n_$t")).over(wAll))
    }
      .withColumn("n_left", eventTypes.map(t => col(s"l_$t")).reduce(_ + _))
      .withColumn("n", eventTypes.map(t => col(s"t_$t")).reduce(_ + _))
      .withColumn("n_right", col("n") - col("n_left"))
    val sumL = eventTypes.map(t =>
      s"CAST(l_$t AS DOUBLE) * CAST(l_$t AS DOUBLE)").mkString(" + ")
    val sumR = eventTypes.map(t =>
      s"CAST(t_$t - l_$t AS DOUBLE) * CAST(t_$t - l_$t AS DOUBLE)").mkString(" + ")
    cum
      .filter(col("n_right") > 0L)
      .withColumn("gini_weighted", expr(
        s"((CAST(n_left AS DOUBLE) - ($sumL) / CAST(n_left AS DOUBLE))" +
          s" + (CAST(n_right AS DOUBLE) - ($sumR) / CAST(n_right AS DOUBLE)))" +
          " / CAST(n AS DOUBLE)"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("gini_weighted"), col("c"))))
      .filter(col("rk") === 1)
      .select(col("c").as("split_cents"), col("n_left"), col("n_right"),
        col("n"), col("gini_weighted"))
  }

  /** K+: MANN–KENDALL TREND — the distribution-free monotone-trend test
    * on daily purchase revenue: S = Σ_{i<j} sign(c_j − c_i), pure BIGINT
    * over the calendar-bounded daily pairs, plus the tie-aware variance
    * numerator 18·Var(S) = n(n−1)(2n+5) − Σ t(t−1)(2t+5) kept EXACT (the
    * ×18 clearing avoids the division; the z-score needs sqrt, banned),
    * and tau-a = S/(n(n−1)/2) as the ONE-division effect size. The
    * significance companion to `theil_sen_daily`'s slope.
    *
    * Scale: daily rollup is the only fact-scale exchange; the O(days²)
    * pair join is the kendall_tau posture.
    */
  def mannKendallTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us DIV 86400000000").as("d"), cents.as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("c"))
    val s = daily.as("a").join(daily.as("b"), col("a.d") < col("b.d"))
      .agg(sum(signum(col("b.c") - col("a.c")).cast("long")).as("s_stat"))
    val ties = daily.groupBy(col("c")).agg(count(lit(1)).as("t"))
      .agg(
        sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L)).as("tie_term"))
    s.crossJoin(broadcast(ties))
      .select(
        col("n").as("n_days"), col("s_stat"),
        (col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L) - col("tie_term"))
          .as("var_s_x18"),
        expr("CAST(s_stat AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)")
          .as("tau_a"))
  }

  /** K+: WALD–WOLFOWITZ RUNS TEST — randomness of the daily revenue
    * series around its (lower) median: days strictly above/below the
    * median form a ± sequence; the statistic is the observed run count
    * vs the expectation 1 + 2·n1·n2/(n1+n2) (ONE division; the variance
    * is emitted as its exact integer numerator/denominator pair since
    * the z-score would need sqrt). Median-equal days are dropped, the
    * standard convention.
    *
    * Scale: everything after the daily rollup runs on ≤366 rows.
    */
  def runsTestDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us DIV 86400000000").as("d"), cents.as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("c"))
    val med = daily
      .withColumn("rn", row_number().over(Window.orderBy(col("c"), col("d"))))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("nd"))))
      .filter(col("rn") === expr("(nd + 1) DIV 2"))
      .select(col("c").as("median_c"))
    val signs = daily.crossJoin(broadcast(med))
      .filter(col("c") =!= col("median_c"))
      .withColumn("sgn", when(col("c") > col("median_c"), 1L).otherwise(-1L))
    val runs = signs
      .withColumn("prev", lag(col("sgn"), 1).over(Window.orderBy(col("d"))))
      .agg(
        sum(when(col("prev").isNull || col("prev") =!= col("sgn"), 1L)
          .otherwise(0L)).as("n_runs"),
        sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("n2"))
    runs.select(
      col("n1"), col("n2"), col("n_runs"),
      expr("1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
        + " / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))").as("expected_runs"),
      expr("CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS BIGINT)").as("var_num"),
      expr("CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS BIGINT)").as("var_den"))
  }

  /** K+: BOWLEY QUARTILE SKEWNESS — per event type, the sqrt-free robust
    * skewness (Q1 + Q3 − 2·Q2)/(Q3 − Q1) from exact rank-pick quartiles
    * (ranks (n+3) DIV 4, (n+1) DIV 2, (3n+1) DIV 4 — lower-quantile
    * convention) over the distinct-cents grid. The shape complement of
    * `winsorized_stats`' location estimates; moment skewness needs a
    * 3/2-power, banned.
    *
    * Scale: all rank picks are cumulative-count intersections on the
    * value grid (KS posture); output ≤ǀtypesǀ rows.
    */
  def bowleySkewTypes(spark: SparkSession, sfDir: String): DataFrame = {
    val grid = Tables.events(spark, sfDir)
      .select(col("event_type"), cents.as("c"))
      .groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("event_type")).orderBy(col("c"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
      .withColumn("cum_prev", col("cum") - col("cnt"))
    def pick(rank: String, name: String): DataFrame =
      grid.filter(expr(rank) > col("cum_prev") && expr(rank) <= col("cum"))
        .select(col("event_type"), col("c").as(name), col("n"))
    pick("(n + 3) DIV 4", "q1").drop("n")
      .join(pick("(n + 1) DIV 2", "q2").drop("n"), "event_type")
      .join(pick("(3 * n + 1) DIV 4", "q3"), "event_type")
      .select(
        col("event_type"), col("n"), col("q1"), col("q2"), col("q3"),
        when(col("q3") === col("q1"), lit(null).cast("double"))
          .otherwise((col("q1") + col("q3") - lit(2L) * col("q2")).cast("double")
            / (col("q3") - col("q1")).cast("double")).as("bowley_skew"))
      .orderBy(col("event_type"))
  }

  /** K+: QQ DECILES — the quantile–quantile table of purchase vs click
    * cents at the nine deciles (exact rank picks, rank max(1, (k·n) DIV
    * 10)): the distribution-comparison readout behind a QQ plot, all
    * BIGINT. Where `ks_purchase_click` gives the max CDF gap, this gives
    * the shape of the mismatch.
    *
    * Scale: two per-type value grids, nine rank picks each — the KS
    * posture; 9-row output.
    */
  def qqDecilesPair(spark: SparkSession, sfDir: String): DataFrame = {
    def deciles(t: String, name: String): DataFrame = {
      val grid = Tables.events(spark, sfDir)
        .filter(col("event_type") === t)
        .select(cents.as("c"))
        .groupBy(col("c")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("c"))))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy(lit(1))))
        .withColumn("cum_prev", col("cum") - col("cnt"))
      spark.range(1, 10).select(col("id").as("decile"))
        .join(grid, expr("greatest(CAST(1 AS BIGINT), (decile * n) DIV 10)") > col("cum_prev")
          && expr("greatest(CAST(1 AS BIGINT), (decile * n) DIV 10)") <= col("cum"))
        .select(col("decile"), col("c").as(name))
    }
    deciles("purchase", "purchase_cents")
      .join(deciles("click", "click_cents"), "decile")
      .select(col("decile"), col("purchase_cents"), col("click_cents"),
        (col("purchase_cents") - col("click_cents")).as("gap_cents"))
      .orderBy(col("decile"))
  }

  object Oracle {

    private val types = Seq("click", "error", "purchase", "signup", "view")

    val kruskalWallisValue: String = {
      val sumTerm = types.map(t =>
        s"(CAST(r2_$t AS DOUBLE) * CAST(r2_$t AS DOUBLE) / (4.0 * CAST(n_$t AS DOUBLE)))")
        .mkString(" + ")
      val h = s"(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))) * ($sumTerm)" +
        " - 3.0 * (CAST(n AS DOUBLE) + 1.0)"
      val corr = "(1.0 - CAST(tie_cube_sum AS DOUBLE)" +
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))"
      val pivot = types.flatMap(t => Seq(
        s"CAST(max(CASE WHEN event_type = '$t' THEN n_t END) AS BIGINT) AS n_$t",
        s"CAST(max(CASE WHEN event_type = '$t' THEN r2 END) AS BIGINT) AS r2_$t"))
        .mkString(",\n        |    ")
      s"""WITH tc AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
        |         CAST(count(*) AS BIGINT) AS cnt_t
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT c, cnt,
        |    2 * sum(cnt) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt + 1 AS ar2
        |  FROM (SELECT c, CAST(sum(cnt_t) AS BIGINT) AS cnt FROM tc GROUP BY 1)),
        |pt AS (
        |  SELECT event_type, CAST(sum(cnt_t) AS BIGINT) AS n_t,
        |         CAST(sum(cnt_t * ar2) AS BIGINT) AS r2
        |  FROM tc JOIN grid USING (c) GROUP BY 1),
        |pv AS (
        |  SELECT $pivot
        |  FROM pt),
        |ti AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_cube_sum
        |  FROM grid)
        |SELECT n, CAST(5 AS BIGINT) AS k, tie_cube_sum,
        |  $h AS h,
        |  ($h) / $corr AS h_tie_corrected
        |FROM pv, ti""".stripMargin
    }

    val mannKendallTrend: String =
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |s AS (
        |  SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1
        |                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
        |    AS s_stat
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |ti AS (
        |  SELECT CAST(sum(t) AS BIGINT) AS n,
        |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY c))
        |SELECT n AS n_days, s_stat,
        |  CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT) AS var_s_x18,
        |  CAST(s_stat AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)
        |    AS tau_a
        |FROM s, ti""".stripMargin

    val runsTestDaily: String =
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |med AS (
        |  SELECT c AS median_c FROM (
        |    SELECT c, row_number() OVER (ORDER BY c, d) AS rn,
        |           count(*) OVER () AS nd
        |    FROM daily)
        |  WHERE rn = (nd + 1) // 2),
        |sg AS (
        |  SELECT d, CASE WHEN c > median_c THEN 1 ELSE -1 END AS sgn
        |  FROM daily, med WHERE c <> median_c),
        |r AS (
        |  SELECT sgn, lag(sgn) OVER (ORDER BY d) AS prev FROM sg),
        |agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN prev IS NULL OR prev <> sgn THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_runs
        |  FROM r)
        |SELECT n1, n2, n_runs,
        |  1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) AS expected_runs,
        |  CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS BIGINT) AS var_num,
        |  CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS BIGINT) AS var_den
        |FROM agg""".stripMargin

    val bowleySkewTypes: String =
      """WITH grid AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |g2 AS (
        |  SELECT *,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM grid),
        |g3 AS (SELECT *, cum - cnt AS cum_prev FROM g2),
        |q1 AS (SELECT event_type, c AS q1 FROM g3
        |       WHERE (n + 3) // 4 > cum_prev AND (n + 3) // 4 <= cum),
        |q2 AS (SELECT event_type, c AS q2 FROM g3
        |       WHERE (n + 1) // 2 > cum_prev AND (n + 1) // 2 <= cum),
        |q3 AS (SELECT event_type, c AS q3, CAST(n AS BIGINT) AS n FROM g3
        |       WHERE (3 * n + 1) // 4 > cum_prev AND (3 * n + 1) // 4 <= cum)
        |SELECT q1.event_type, q3.n, q1.q1, q2.q2, q3.q3,
        |  CASE WHEN q3.q3 = q1.q1 THEN NULL
        |    ELSE CAST(q1.q1 + q3.q3 - 2 * q2.q2 AS DOUBLE)
        |      / CAST(q3.q3 - q1.q1 AS DOUBLE) END AS bowley_skew
        |FROM q1 JOIN q2 USING (event_type) JOIN q3 USING (event_type)
        |ORDER BY event_type""".stripMargin

    val qqDecilesPair: String =
      """WITH gp AS (
        |  SELECT c, cnt,
        |    sum(cnt) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS n
        |  FROM (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
        |          CAST(count(*) AS BIGINT) AS cnt
        |        FROM events WHERE event_type = 'purchase' GROUP BY 1)),
        |gc AS (
        |  SELECT c, cnt,
        |    sum(cnt) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS n
        |  FROM (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
        |          CAST(count(*) AS BIGINT) AS cnt
        |        FROM events WHERE event_type = 'click' GROUP BY 1)),
        |dk AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT) AS decile),
        |dp AS (
        |  SELECT dk.decile, gp.c AS purchase_cents
        |  FROM dk JOIN gp
        |    ON greatest(1, (dk.decile * gp.n) // 10) > gp.cum - gp.cnt
        |   AND greatest(1, (dk.decile * gp.n) // 10) <= gp.cum),
        |dc AS (
        |  SELECT dk.decile, gc.c AS click_cents
        |  FROM dk JOIN gc
        |    ON greatest(1, (dk.decile * gc.n) // 10) > gc.cum - gc.cnt
        |   AND greatest(1, (dk.decile * gc.n) // 10) <= gc.cum)
        |SELECT decile, purchase_cents, click_cents,
        |  CAST(purchase_cents - click_cents AS BIGINT) AS gap_cents
        |FROM dp JOIN dc USING (decile)
        |ORDER BY decile""".stripMargin

    val oddsRatioAb: String =
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase'
        |          AND CAST(floor(value * 100 + 0.5) AS BIGINT) >= 9000
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM u)
        |SELECT a AS n_t_conv, b AS n_t_not, c AS n_c_conv, d AS n_c_not,
        |  CASE WHEN b * c = 0 THEN NULL
        |    ELSE CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE) END AS odds_ratio,
        |  CASE WHEN c * (a + b) = 0 THEN NULL
        |    ELSE CAST(a * (c + d) AS DOUBLE) / CAST(c * (a + b) AS DOUBLE) END
        |    AS risk_ratio
        |FROM c""".stripMargin

    // The 100-cell chi2 total folds left-to-right in (lang, source) order
    // via the holt-style recursive CTE — the same IEEE addition chain as
    // Spark's aggregate() over the sorted collect_list.
    val cramersV2LangSource: String =
      """WITH RECURSIVE rt AS (SELECT lang, CAST(count(*) AS BIGINT) AS r_tot
        |            FROM documents GROUP BY 1),
        |ct AS (SELECT source, CAST(count(*) AS BIGINT) AS c_tot
        |       FROM documents GROUP BY 1),
        |ob AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |       FROM documents GROUP BY 1, 2),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
        |cells AS (
        |  SELECT rt.lang, ct.source,
        |    row_number() OVER (ORDER BY rt.lang, ct.source) AS rn,
        |    CAST(coalesce(ob.o, 0) * nt.n_total - rt.r_tot * ct.c_tot AS DOUBLE)
        |      * CAST(coalesce(ob.o, 0) * nt.n_total - rt.r_tot * ct.c_tot AS DOUBLE)
        |      / (CAST(nt.n_total AS DOUBLE) * CAST(rt.r_tot AS DOUBLE)
        |         * CAST(ct.c_tot AS DOUBLE)) AS term
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN ob ON ob.lang = rt.lang AND ob.source = ct.source
        |  CROSS JOIN nt),
        |f AS (
        |  SELECT rn, term AS acc FROM cells WHERE rn = 1
        |  UNION ALL
        |  SELECT c.rn, f.acc + c.term FROM f JOIN cells c ON c.rn = f.rn + 1)
        |SELECT nt.n_total AS n,
        |  (SELECT CAST(count(*) AS BIGINT) FROM rt) AS r_cnt,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ct) AS c_cnt,
        |  f.acc AS chi2,
        |  f.acc / (CAST(nt.n_total AS DOUBLE)
        |    * (CAST(least((SELECT count(*) FROM rt),
        |                  (SELECT count(*) FROM ct)) AS DOUBLE) - 1.0)) AS cramers_v2
        |FROM f, nt
        |WHERE f.rn = (SELECT max(rn) FROM cells)""".stripMargin

    val giniSplitStump: String = {
      val classCols = types.map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
        .mkString(",\n        |         ")
      val cumCols = types.map(t =>
        s"CAST(sum(n_$t) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS l_$t")
        .mkString(",\n        |    ")
      val nLeft = types.map(t => s"l_$t").mkString(" + ")
      val sumL = types.map(t =>
        s"CAST(l_$t AS DOUBLE) * CAST(l_$t AS DOUBLE)").mkString(" + ")
      val totCols = types.map(t =>
        s"CAST(sum(n_$t) OVER () AS BIGINT) AS t_$t").mkString(",\n        |    ")
      val sumR2 = types.map(t =>
        s"CAST(t_$t - l_$t AS DOUBLE) * CAST(t_$t - l_$t AS DOUBLE)").mkString(" + ")
      s"""WITH g AS (
        |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
        |         $classCols
        |  FROM events GROUP BY 1),
        |cum AS (
        |  SELECT c,
        |    $cumCols,
        |    $totCols
        |  FROM g),
        |sc AS (
        |  SELECT c, ($nLeft) AS n_left,
        |    (t_click + t_error + t_purchase + t_signup + t_view) AS n,
        |    (t_click + t_error + t_purchase + t_signup + t_view)
        |      - ($nLeft) AS n_right,
        |    ((CAST(($nLeft) AS DOUBLE) - ($sumL) / CAST(($nLeft) AS DOUBLE))
        |     + (CAST((t_click + t_error + t_purchase + t_signup + t_view)
        |         - ($nLeft) AS DOUBLE)
        |        - ($sumR2) / CAST((t_click + t_error + t_purchase + t_signup + t_view)
        |            - ($nLeft) AS DOUBLE)))
        |      / CAST((t_click + t_error + t_purchase + t_signup + t_view) AS DOUBLE)
        |      AS gini_weighted
        |  FROM cum),
        |rk AS (
        |  SELECT *, row_number() OVER (ORDER BY gini_weighted, c) AS rk
        |  FROM sc WHERE n_right > 0)
        |SELECT c AS split_cents, CAST(n_left AS BIGINT) AS n_left,
        |  CAST(n_right AS BIGINT) AS n_right, CAST(n AS BIGINT) AS n,
        |  gini_weighted
        |FROM rk WHERE rk = 1""".stripMargin
    }
  }
}
