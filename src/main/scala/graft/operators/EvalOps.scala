package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Model/label evaluation operators for the LLM-data-pipeline surface:
  * the metrics a training pipeline computes over scored or labeled data —
  * ranking quality (AUC), probability calibration (reliability bins),
  * inter-annotator agreement (Cohen's kappa), and concentration
  * (Gini/Lorenz). All follow the repo's engine-portability protocol
  * (COVERAGE.md determinism classes): every metric is assembled from
  * exact 64-bit integer aggregates with exactly ONE IEEE division at the
  * end, so Spark and the DuckDB oracle produce bit-identical doubles with
  * no rounding step and no libm surface.
  */
object EvalOps {

  private val cents: Column = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")

  /** V+/eval: ROC AUC per class via the Mann–Whitney rank-sum identity —
    * for each event_type taken as the positive class, the probability that
    * a uniformly random positive outscores a random negative (ties count
    * half), with score = integer cents of `value`. The one-vs-rest ranking
    * quality a pipeline reports for any per-example scorer (quality
    * classifier, reward model, dedup score).
    *
    * Shape: AUC needs only per-distinct-score class counts, never a global
    * per-row sort. One map-side-combined shuffle builds the
    * (score, class) histogram — |distinct scores|·|classes| groups — then
    * two windows (per-class prefix and all-class prefix over the score
    * axis) and an integer fold:
    * U·2 = Σ_s n_pos(s)·(2·negBelow(s) + neg(s)); AUC = U·2 / (2·P·N).
    * The all-scores RANGE windows are a single-partition pass over the
    * HISTOGRAM frame only — bounded by score domain × classes (≤ 49k·5
    * rows here, invariant of row count), the same bounded-domain argument
    * as `equi_depth_buckets`. Every count is an exact BIGINT
    * (overflow at ~3·10⁹ rows per class pair — switch the U fold to
    * DECIMAL(38,0) beyond that); the final AUC is one IEEE division of
    * exact integers, bit-identical on any engine.
    */
  def aucEventScores(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("event_type"), cents.as("s"))
    // ONE aggregation builds the (score, class) histogram; every other
    // quantity is a window over it, so the base scan+shuffle runs once and
    // there are NO joins. RANGE frames keyed on the score value give the
    // all-class prefix (strictly-below) and same-score totals off a single
    // global sort; n_all rides the same single-partition stage as a
    // whole-frame sum. The per-class prefix window then re-partitions by
    // class, and the final aggregate reuses that partitioning — zero
    // additional exchanges after the histogram.
    val hist = ev.groupBy(col("s"), col("event_type")).agg(count(lit(1)).as("n_st"))
    val allBelowW = Window.orderBy(col("s")).rangeBetween(Window.unboundedPreceding, -1)
    val atScoreW = Window.orderBy(col("s")).rangeBetween(Window.currentRow, Window.currentRow)
    val typeW = Window.partitionBy(col("event_type")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("all_below", coalesce(sum(col("n_st")).over(allBelowW), lit(0L)))
      .withColumn("n_s", sum(col("n_st")).over(atScoreW))
      .withColumn("n_all", sum(col("n_st")).over(Window.partitionBy()))
      .withColumn("pos_below", coalesce(sum(col("n_st")).over(typeW), lit(0L)))
      .select(
        col("event_type"), col("n_st"), col("n_all"),
        (col("n_st") * (lit(2L) * (col("all_below") - col("pos_below")) +
          (col("n_s") - col("n_st")))).as("u2c"))
      .groupBy(col("event_type"))
      .agg(sum(col("n_st")).as("n_pos"), sum(col("u2c")).as("u2"), max(col("n_all")).as("n_all"))
      .select(
        col("event_type"), col("n_pos"), (col("n_all") - col("n_pos")).as("n_neg"),
        (col("u2").cast("double") /
          (lit(2L) * col("n_pos") * (col("n_all") - col("n_pos"))).cast("double")).as("auc"))
      .orderBy(col("event_type"))
  }

  /** V+/eval: probability calibration (reliability diagram) — bucket a
    * [0,1] model score into 10 equal-width bins and report, per bin, the
    * mean predicted probability beside the observed positive rate
    * (positive = 'purchase'). The score is value-cents / 50000 (a
    * deterministic stand-in for a classifier head; 49 002 is the fixture
    * max). ONE map-side-combined aggregation over 10 groups; mean_pred =
    * Σcents / (n·50000) and obs_rate = pos/n are each a single IEEE
    * division of exact integers — the whole reliability table is
    * engine-portable with zero rounding.
    */
  def calibrationBins(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .select(
        least(expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 5000"), lit(9L)).as("bin"),
        cents.as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"), sum(col("c")).as("sum_cents"))
      .select(
        col("bin"), col("n"), col("n_pos"),
        (col("sum_cents").cast("double") / (col("n") * lit(50000L)).cast("double"))
          .as("mean_pred"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("obs_rate"))
      .orderBy(col("bin"))
  }

  /** V+/eval: Cohen's kappa between the stored `lang` label and the
    * unigram language-ID heuristic ([[TextAnalysisOps.langIdConfusion]]) —
    * chance-corrected inter-annotator agreement, THE statistic for judging
    * whether two labelers (human vs heuristic, model vs model) agree
    * beyond base-rate luck. Computed entirely from the 5×5 confusion
    * counts: with N = Σn, agree = Σ diagonal, and expected co-agreement
    * Σ_k rowₖ·colₖ,
    *   κ = (N·agree − Σ rowₖ·colₖ) / (N² − Σ rowₖ·colₖ)
    * — the textbook (p_o − p_e)/(1 − p_e) cleared of fractions, so both
    * operands are exact BIGINTs and κ is ONE IEEE division. Pipeline cost
    * is the confusion matrix's single shuffle (25 groups); everything
    * after is constant-size.
    */
  def cohensKappaLang(spark: SparkSession, sfDir: String): DataFrame = {
    val conf = TextAnalysisOps.langIdConfusion(spark, sfDir)
      .select(col("lang"), col("pred_lang"), col("n_docs"))
    val totals = conf.agg(
      sum(col("n_docs")).as("n"),
      sum(when(col("lang") === col("pred_lang"), col("n_docs")).otherwise(0L)).as("agree"))
    val rowM = conf.groupBy(col("lang")).agg(sum(col("n_docs")).as("row_n"))
    val colM = conf.groupBy(col("pred_lang")).agg(sum(col("n_docs")).as("col_n"))
    val pe = rowM.join(colM, col("lang") === col("pred_lang"))
      .agg(coalesce(sum(col("row_n") * col("col_n")), lit(0L)).as("sum_rc"))
    totals.crossJoin(pe)
      .select(
        col("n").as("n_docs"), col("agree").as("n_agree"),
        ((col("n") * col("agree") - col("sum_rc")).cast("double") /
          (col("n") * col("n") - col("sum_rc")).cast("double")).as("kappa"))
  }

  /** V+/eval: expected + maximum calibration error over the
    * [[calibrationBins]] table, collapsed to one row — the two summary
    * numbers a model card reports. ECE = Σ_b (n_b/N)·|obs_b − pred_b|
    * telescopes to (Σ_b |50000·pos_b − Σcents_b|) / (50000·N): the
    * per-bin numerators are exact BIGINTs, their sum is exact, and the
    * whole statistic is ONE IEEE division — no order-dependent float
    * accumulation anywhere. MCE is the max over per-bin |obs−pred|, each
    * itself one exact-int division, and max over exact doubles is
    * order-free — so both engines agree bit-for-bit. Two constant-size
    * aggregations after the 10-group bin shuffle.
    */
  def calibrationEce(spark: SparkSession, sfDir: String): DataFrame = {
    val bins = Tables.events(spark, sfDir)
      .select(
        least(expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 5000"), lit(9L)).as("bin"),
        cents.as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"), sum(col("c")).as("sum_c"))
    val dev = abs(lit(50000L) * col("n_pos") - col("sum_c"))
    bins.agg(
      sum(col("n")).as("n_events"),
      count(lit(1)).as("n_bins"),
      sum(dev).as("dev_sum"),
      max(dev.cast("double") / (col("n") * lit(50000L)).cast("double")).as("mce"))
      .select(
        col("n_events"), col("n_bins"),
        (col("dev_sum").cast("double") / (lit(50000L) * col("n_events")).cast("double"))
          .as("ece"),
        col("mce"))
  }

  /** V+/eval: per-class precision / recall / F1 for the lang-ID heuristic —
    * the classification report beside [[cohensKappaLang]]'s single
    * agreement number. From the confusion matrix alone: per true label k,
    * tp = n(k,k), n_true = Σ_pred n(k,·), n_pred = Σ_true n(·,k);
    * precision = tp/n_pred, recall = tp/n_true and F1 = 2tp/(n_true+n_pred)
    * — the harmonic mean cleared of fractions so each metric stays ONE
    * IEEE division of exact BIGINTs. A label never predicted has
    * undefined precision → NULL on both engines (guarded division, since
    * Spark's non-ANSI x/0 is Infinity while SQL yields NULL). Constant
    * size after the 25-group confusion shuffle.
    */
  def confusionPrfLang(spark: SparkSession, sfDir: String): DataFrame = {
    val conf = TextAnalysisOps.langIdConfusion(spark, sfDir)
      .select(col("lang"), col("pred_lang"), col("n_docs"))
    val tp = conf.filter(col("lang") === col("pred_lang"))
      .select(col("lang"), col("n_docs").as("tp"))
    val rowM = conf.groupBy(col("lang")).agg(sum(col("n_docs")).as("n_true"))
    val colM = conf.groupBy(col("pred_lang")).agg(sum(col("n_docs")).as("n_pred"))
    rowM.join(colM, col("lang") === col("pred_lang"), "left")
      .join(tp, Seq("lang"), "left")
      .select(
        col("lang"), coalesce(col("tp"), lit(0L)).as("tp"), col("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .select(
        col("lang"), col("tp"), col("n_true"), col("n_pred"),
        when(col("n_pred") =!= 0L,
          col("tp").cast("double") / col("n_pred").cast("double")).as("precision"),
        (col("tp").cast("double") / col("n_true").cast("double")).as("recall"),
        when(col("n_true") + col("n_pred") =!= 0L,
          (lit(2L) * col("tp")).cast("double") /
            (col("n_true") + col("n_pred")).cast("double")).as("f1"))
      .orderBy(col("lang"))
  }

  /** V+/eval: Gini concentration of customer revenue per market segment —
    * the Lorenz-curve summary a curation pipeline uses to quantify how
    * concentrated a corpus is on few sources (here: how concentrated
    * order revenue is on few customers). Rank-sum identity over ascending
    * per-customer revenue x₁≤…≤x_n:
    *   G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)
    * Ties are rank-order-invariant (equal x contribute x·Σi over the tied
    * rank range either way), so row_number with a custkey tie-break is
    * deterministic AND value-correct. Shape: one groupBy(custkey) revenue
    * rollup, a broadcast-scale join to the customer dim for the segment,
    * then the rank window runs PARTITIONED by segment — parallel, no
    * global sort. All sums exact BIGINT; G is one IEEE division.
    */
  def giniRevenueSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy(col("o_custkey")).agg(sum(col("c")).as("x"))
      .join(
        broadcast(Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("x"), col("o_custkey"))
    // Σ i·x and the Gini numerator/denominator exceed 2^63 once n_customers
    // × per-customer cents passes ~10^18 (hit at the sf10 campaign: ANSI
    // long overflow). All rank-moment arithmetic therefore runs in exact
    // DECIMAL(38,0) — the engine twin of DuckDB's HUGEINT sum (the oracle
    // casts its per-row product to HUGEINT so both engines stay exact to
    // ~10^38 and fail at the same point beyond it). Outputs are unchanged:
    // BIGINT counts/totals, one double division of exact integers.
    rev.withColumn("i", row_number().over(w).cast("decimal(19,0)"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("x")).as("total_cents"),
        sum(col("i") * col("x").cast("decimal(19,0)")).as("six"))
      .select(
        col("c_mktsegment"), col("n_customers"), col("total_cents"),
        ((lit(2L).cast("decimal(19,0)") * col("six")
          - (col("n_customers") + lit(1L)).cast("decimal(19,0)")
            * col("total_cents").cast("decimal(19,0)"))
          .cast("double") /
          (col("n_customers").cast("decimal(19,0)")
            * col("total_cents").cast("decimal(19,0)")).cast("double")).as("gini"))
      .orderBy(col("c_mktsegment"))
  }

  /** V+/eval: RANKING-RETRIEVAL QUALITY — MRR@10, hits/recall@10 and
    * NDCG@10 for the [[TextAnalysisOps.bm25Topk]] ranked lists, the metric
    * row a retrieval pipeline reports next to its index build. Graded
    * relevance is derived deterministically from the corpus itself: rel(q,
    * d) = number of DISTINCT q-terms present in d (1..3; binary-relevant
    * means rel ≥ 2), so both engines label identically with no external
    * qrels file. Discount weights are INTEGER CONSTANTS w_i =
    * round(10⁶/log₂(i+1)) baked into the query text — log₂ never executes
    * at query time (the house no-libm rule), DCG/IDCG become exact BIGINT
    * dot products, and NDCG / MRR / recall are each ONE IEEE division of
    * exact integers. IDCG ranks the FULL relevant set by (rel desc,
    * doc_id) — a per-query window whose rank ≤ 10 filter Spark pushes into
    * the sort via WindowGroupLimit, so the ideal ranking never
    * materializes beyond the top slice per query. Scale: the ranked side
    * is the bm25 plan (token-keyed joins, broadcast query table); the
    * relevance side is one distinct (doc, term) projection joined to the
    * 9-row broadcast — everything downstream of the corpus scans is
    * bounded by |queries|·10.
    */
  def rankEvalBm25(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ranked = TextAnalysisOps.bm25Topk(spark, sfDir)
      .select(col("qid"), col("rank").as("rnk"), col("doc_id"))
    val queries = Seq(
      (1L, "scan"), (1L, "filter"), (1L, "fast"),
      (2L, "join"), (2L, "key"), (2L, "merge"),
      (3L, "stream"), (3L, "window"), (3L, "batch")).toDF("qid", "q_term")
    val wts = Seq(
      (1L, 1000000L), (2L, 630930L), (3L, 500000L), (4L, 430677L),
      (5L, 386853L), (6L, 356207L), (7L, 333333L), (8L, 315465L),
      (9L, 301030L), (10L, 289065L)).toDF("rnk", "wt")
    // Per-doc DISTINCT terms dedup MAP-SIDE (r16): global distinct over
    // (doc_id, term) pairs is per-doc distinct because doc_id is in the
    // pair, so `array_distinct` before the explode replaces a corpus-wide
    // distinct exchange with a per-row array op (guide §2.4); the 9-term
    // broadcast join then filters the stream inside the same scan pass.
    val docTerms = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en")
      .select(col("doc_id"),
        explode(expr("array_distinct(filter(split(text, ' '), x -> length(x) > 0))")).as("term"))
    val rel = docTerms.join(broadcast(queries), col("term") === col("q_term"))
      .groupBy(col("qid"), col("doc_id")).agg(count(lit(1)).as("rel"))
    val dcg = ranked
      .join(rel, Seq("qid", "doc_id"), "left")
      .select(col("qid"), col("rnk"), coalesce(col("rel"), lit(0L)).as("rel"))
      .join(broadcast(wts), Seq("rnk"))
      .groupBy(col("qid"))
      .agg(
        sum(col("rel") * col("wt")).as("dcg_micro"),
        sum(when(col("rel") >= 2L, 1L).otherwise(0L)).as("hits_at_10"),
        min(when(col("rel") >= 2L, col("rnk"))).as("first_rel"))
    val iw = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("doc_id"))
    val ideal = rel
      .withColumn("rnk", row_number().over(iw).cast("long"))
      .filter(col("rnk") <= 10)
      .join(broadcast(wts), Seq("rnk"))
      .groupBy(col("qid")).agg(sum(col("rel") * col("wt")).as("idcg_micro"))
    val nrel = rel.filter(col("rel") >= 2L)
      .groupBy(col("qid")).agg(count(lit(1)).as("n_relevant"))
    dcg.join(ideal, Seq("qid")).join(nrel, Seq("qid"), "left")
      .select(
        col("qid"),
        col("hits_at_10"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        when(col("first_rel").isNotNull,
          lit(1.0) / col("first_rel").cast("double")).otherwise(lit(0.0)).as("mrr_at_10"),
        when(coalesce(col("n_relevant"), lit(0L)) =!= 0L,
          col("hits_at_10").cast("double") / col("n_relevant").cast("double")).as("recall_at_10"),
        col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") =!= 0L,
          col("dcg_micro").cast("double") / col("idcg_micro").cast("double")).as("ndcg_at_10"))
      .orderBy(col("qid"))
  }

  /** DuckDB oracle SQL for the eval band — same integer-exact,
    * one-division construction per metric.
    */
  object Oracle {
    val aucEventScores: String =
      """WITH ev AS (SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT) AS s FROM events),
        |st AS (SELECT s, event_type, count(*) AS n_st FROM ev GROUP BY 1, 2),
        |sc AS (SELECT s, CAST(sum(n_st) AS BIGINT) AS n_s,
        |    CAST(coalesce(sum(sum(n_st)) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS all_below
        |  FROM st GROUP BY s),
        |j AS (SELECT st.event_type, st.n_st, sc.n_s, sc.all_below,
        |    CAST(coalesce(sum(st.n_st) OVER (PARTITION BY st.event_type ORDER BY st.s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pos_below
        |  FROM st JOIN sc USING (s)),
        |pt AS (SELECT event_type, CAST(sum(n_st) AS BIGINT) AS n_pos,
        |    CAST(sum(n_st * (2*(all_below - pos_below) + (n_s - n_st))) AS BIGINT) AS u2
        |  FROM j GROUP BY 1),
        |tot AS (SELECT count(*) AS n_all FROM ev)
        |SELECT event_type, n_pos, CAST(n_all - n_pos AS BIGINT) AS n_neg,
        |  CAST(u2 AS DOUBLE) / CAST(2*n_pos*(n_all - n_pos) AS DOUBLE) AS auc
        |FROM pt, tot
        |ORDER BY event_type""".stripMargin

    val calibrationBins: String =
      """WITH ev AS (SELECT least(CAST(floor(value*100 + 0.5) AS BIGINT) // 5000, 9) AS bin,
        |    CAST(floor(value*100 + 0.5) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
        |  CAST(sum(c) AS DOUBLE) / CAST(count(*)*50000 AS DOUBLE) AS mean_pred,
        |  CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS obs_rate
        |FROM ev GROUP BY bin
        |ORDER BY bin""".stripMargin

    val cohensKappaLang: String = {
      val conf = TextAnalysisOps.Oracle.langIdConfusion
        .replace("ORDER BY lang, pred_lang", "")
      s"""WITH conf AS ($conf),
         |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN lang = pred_lang THEN n_docs ELSE 0 END) AS BIGINT) AS agree
         |  FROM conf),
         |r AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS row_n FROM conf GROUP BY 1),
         |c AS (SELECT pred_lang, CAST(sum(n_docs) AS BIGINT) AS col_n FROM conf GROUP BY 1),
         |pe AS (SELECT CAST(coalesce(sum(row_n * col_n), 0) AS BIGINT) AS sum_rc
         |  FROM r JOIN c ON r.lang = c.pred_lang)
         |SELECT n AS n_docs, agree AS n_agree,
         |  CAST(n*agree - sum_rc AS DOUBLE) / CAST(n*n - sum_rc AS DOUBLE) AS kappa
         |FROM t, pe""".stripMargin
    }

    val calibrationEce: String =
      """WITH ev AS (SELECT least(CAST(floor(value*100 + 0.5) AS BIGINT) // 5000, 9) AS bin,
        |    CAST(floor(value*100 + 0.5) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(c) AS BIGINT) AS sum_c
        |  FROM ev GROUP BY bin)
        |SELECT CAST(sum(n) AS BIGINT) AS n_events, CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(abs(50000*n_pos - sum_c)) AS DOUBLE)
        |    / CAST(50000*sum(n) AS DOUBLE) AS ece,
        |  max(CAST(abs(50000*n_pos - sum_c) AS DOUBLE) / CAST(n*50000 AS DOUBLE)) AS mce
        |FROM b""".stripMargin

    val confusionPrfLang: String = {
      val conf = TextAnalysisOps.Oracle.langIdConfusion
        .replace("ORDER BY lang, pred_lang", "")
      s"""WITH conf AS ($conf),
         |r AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS n_true FROM conf GROUP BY 1),
         |c AS (SELECT pred_lang, CAST(sum(n_docs) AS BIGINT) AS n_pred FROM conf GROUP BY 1),
         |d AS (SELECT lang, CAST(n_docs AS BIGINT) AS tp FROM conf WHERE lang = pred_lang)
         |SELECT r.lang, coalesce(d.tp, 0) AS tp, r.n_true,
         |  coalesce(c.n_pred, 0) AS n_pred,
         |  CASE WHEN coalesce(c.n_pred, 0) <> 0
         |    THEN CAST(coalesce(d.tp, 0) AS DOUBLE) / CAST(c.n_pred AS DOUBLE) END AS precision,
         |  CAST(coalesce(d.tp, 0) AS DOUBLE) / CAST(r.n_true AS DOUBLE) AS recall,
         |  CASE WHEN r.n_true + coalesce(c.n_pred, 0) <> 0
         |    THEN CAST(2*coalesce(d.tp, 0) AS DOUBLE)
         |      / CAST(r.n_true + coalesce(c.n_pred, 0) AS DOUBLE) END AS f1
         |FROM r LEFT JOIN c ON r.lang = c.pred_lang
         |  LEFT JOIN d ON r.lang = d.lang
         |ORDER BY r.lang""".stripMargin
    }

    val rankEvalBm25: String =
      """WITH q(qid, q_term) AS (VALUES (1, 'scan'), (1, 'filter'), (1, 'fast'),
        |  (2, 'join'), (2, 'key'), (2, 'merge'),
        |  (3, 'stream'), (3, 'window'), (3, 'batch')),
        |d AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
        |      FROM documents WHERE lang = 'en'),
        |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |              CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
        |tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |        FROM (SELECT doc_id, unnest(toks) AS term FROM d) GROUP BY 1, 2),
        |dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1),
        |sc AS (
        |  SELECT qid, tfc.doc_id,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |      ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) +
        |      1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))) * 1000000 + 0.5) AS BIGINT)
        |      AS score_micro
        |  FROM tfc JOIN q ON term = q_term JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = tfc.doc_id CROSS JOIN st),
        |qd AS (SELECT CAST(qid AS BIGINT) AS qid, doc_id, sum(score_micro) AS score_micro
        |       FROM sc GROUP BY 1, 2),
        |rk AS (SELECT qid, doc_id,
        |         CAST(row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id)
        |           AS BIGINT) AS rnk
        |       FROM qd),
        |w(rnk, wt) AS (VALUES (1, 1000000), (2, 630930), (3, 500000), (4, 430677),
        |  (5, 386853), (6, 356207), (7, 333333), (8, 315465), (9, 301030), (10, 289065)),
        |dt AS (SELECT DISTINCT doc_id, term
        |       FROM (SELECT doc_id, unnest(toks) AS term FROM d)),
        |rel AS (SELECT CAST(qid AS BIGINT) AS qid, doc_id, CAST(count(*) AS BIGINT) AS rel
        |        FROM dt JOIN q ON term = q_term GROUP BY 1, 2),
        |dcg AS (
        |  SELECT rk.qid,
        |    CAST(sum(coalesce(rel.rel, 0) * CAST(w.wt AS BIGINT)) AS BIGINT) AS dcg_micro,
        |    CAST(sum(CASE WHEN coalesce(rel.rel, 0) >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS hits_at_10,
        |    min(CASE WHEN coalesce(rel.rel, 0) >= 2 THEN rk.rnk END) AS first_rel
        |  FROM rk JOIN w ON rk.rnk = w.rnk
        |  LEFT JOIN rel ON rk.qid = rel.qid AND rk.doc_id = rel.doc_id
        |  WHERE rk.rnk <= 10 GROUP BY 1),
        |irk AS (SELECT qid, rel,
        |          CAST(row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id)
        |            AS BIGINT) AS rnk
        |        FROM rel),
        |ideal AS (
        |  SELECT qid, CAST(sum(rel * CAST(wt AS BIGINT)) AS BIGINT) AS idcg_micro
        |  FROM irk JOIN w ON irk.rnk = w.rnk WHERE irk.rnk <= 10 GROUP BY 1),
        |nrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_relevant
        |         FROM rel WHERE rel >= 2 GROUP BY 1)
        |SELECT dcg.qid, dcg.hits_at_10, coalesce(nrel.n_relevant, 0) AS n_relevant,
        |  CASE WHEN dcg.first_rel IS NOT NULL
        |    THEN CAST(1 AS DOUBLE) / CAST(dcg.first_rel AS DOUBLE) ELSE 0.0 END AS mrr_at_10,
        |  CASE WHEN coalesce(nrel.n_relevant, 0) <> 0
        |    THEN CAST(dcg.hits_at_10 AS DOUBLE) / CAST(nrel.n_relevant AS DOUBLE) END
        |    AS recall_at_10,
        |  dcg.dcg_micro, ideal.idcg_micro,
        |  CASE WHEN ideal.idcg_micro <> 0
        |    THEN CAST(dcg.dcg_micro AS DOUBLE) / CAST(ideal.idcg_micro AS DOUBLE) END
        |    AS ndcg_at_10
        |FROM dcg JOIN ideal ON dcg.qid = ideal.qid
        |LEFT JOIN nrel ON dcg.qid = nrel.qid
        |ORDER BY dcg.qid""".stripMargin

    val giniRevenueSegments: String =
      """WITH rev AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |seg AS (SELECT c_mktsegment, o_custkey, x,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY x, o_custkey) AS BIGINT) AS i
        |  FROM rev JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(x) AS BIGINT) AS total_cents,
        |  CAST(2*sum(CAST(i AS HUGEINT)*x) - (count(*) + 1)*sum(CAST(x AS HUGEINT)) AS DOUBLE)
        |    / CAST(count(*)*sum(CAST(x AS HUGEINT)) AS DOUBLE) AS gini
        |FROM seg GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
  }
}
