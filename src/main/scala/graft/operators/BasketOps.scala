package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Market-basket association mining over the event log — the co-occurrence
  * family (frequent itemset pairs, association rules with confidence and
  * lift) every recommendation / cross-sell pipeline starts from, in the
  * repo's integer-exact form.
  *
  * A "basket" is one (user_id, calendar day): the distinct set of event
  * types the user produced that day. With a bounded type vocabulary the
  * pair lattice is |types|² no matter the fact count, so the mining output
  * is constant-size at any corpus scale — the Apriori first pass is really
  * a fact-scale dedup plus a basket-local self-join.
  *
  * Scale posture: baskets materialize as collect_set over ONE hash
  * exchange on (user, day) — the set is ≤|types| elements, bounded
  * state; pairs are generated INSIDE each basket with array transforms
  * (map-side after the exchange), so no self-join and no second
  * fact-scale shuffle exists. Everything after is an aggregate onto
  * ≤|types|² keys. Counts stay BIGINT; confidence and lift are each ONE
  * IEEE division of exact integer numerator/denominator (COVERAGE.md
  * class 2), so both engines hash bit-identically.
  */
object BasketOps {

  private val dayUs = 86400000000L

  /** (user, day) → sorted distinct event-type array, one exchange. */
  private def baskets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts_us DIV $dayUs").as("day"),
        col("event_type"))
      .groupBy(col("user_id"), col("day"))
      .agg(expr("array_sort(collect_set(event_type))").as("types"))

  /** All unordered in-basket pairs (a < b), generated map-side. */
  private val pairGen =
    "flatten(transform(types, (x, i) ->" +
      " transform(slice(types, i + 2, size(types)), y ->" +
      " named_struct('type_a', x, 'type_b', y))))"

  /** B+: FREQUENT PAIRS — support counts for every unordered event-type
    * pair co-occurring in a basket (type_a < type_b lexicographically).
    * Pure BIGINT counts: the integer first half of the association-rule
    * query, declared separately so the support lattice itself is
    * oracle-pinned before any ratio arithmetic. Pairs come from the
    * sorted in-basket set (≤C(|types|,2) per basket), not a self-join —
    * the r11 rewrite that cut the plan from three fact-scale exchanges
    * (distinct + two join sides) to one.
    */
  def basketFreqPairs(spark: SparkSession, sfDir: String): DataFrame = {
    baskets(spark, sfDir)
      .select(explode(expr(pairGen)).as("p"))
      .groupBy(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** B+: ASSOCIATION RULES — directional rules `ante → cons` over the
    * frequent pairs, with the three classical measures: support count
    * (exact BIGINT), confidence = n_both / n_ante, and lift =
    * (n_both · N) / (n_ante · n_cons) where N is the total basket count.
    * Both ratios are ONE division with exact-integer numerator and
    * denominator (n_both·N and n_ante·n_cons stay well under 2^63 —
    * both factors are basket counts). Rules below support 5 are pruned,
    * the standard Apriori min-support gate.
    *
    * Scale: the per-type basket counts are a second aggregate over the
    * SAME basket table (≤|types| rows), broadcast into the pair lattice;
    * N is a 1-row cross join. Output ≤ |types|·(|types|−1) rows.
    */
  def basketRulesLift(spark: SparkSession, sfDir: String): DataFrame = {
    // localCheckpoint pins the user×day basket table (fact-scale) so the
    // three consumers below reuse ONE exchange. Memory contract: the
    // blocks are MEMORY_AND_DISK executor-distributed — under pressure
    // they spill, never OOM — but they DO occupy the executors for the
    // query's lifetime; a pipeline running this against a 100 TB fact
    // would stage the basket table to parquet instead (Materialize.stage,
    // the dedup family's pattern) and trade the rewrite for zero pinned
    // state.
    val b = baskets(spark, sfDir).localCheckpoint(true)
    val pairs = b
      .select(explode(expr(pairGen)).as("p"))
      .groupBy(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    val perType = b.select(explode(col("types")).as("event_type"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    // N = distinct BASKETS (user-days), not basket memberships — lift's
    // P(cons) denominator is a probability over baskets.
    val total = b.agg(count(lit(1)).as("nn"))
    val rules = pairs
      .select(col("type_a").as("ante"), col("type_b").as("cons"), col("n_ab"))
      .unionByName(pairs.select(
        col("type_b").as("ante"), col("type_a").as("cons"), col("n_ab")))
    rules
      .join(broadcast(perType.select(col("event_type").as("ante"), col("n_t").as("n_ante"))), "ante")
      .join(broadcast(perType.select(col("event_type").as("cons"), col("n_t").as("n_cons"))), "cons")
      .crossJoin(broadcast(total))
      .filter(col("n_ab") >= 5)
      .select(
        col("ante"), col("cons"),
        col("n_ab").as("n_both"), col("n_ante"), col("n_cons"),
        col("nn").as("n_baskets"),
        (col("n_ab").cast("double") / col("n_ante").cast("double"))
          .as("confidence"),
        ((col("n_ab") * col("nn")).cast("double")
          / (col("n_ante") * col("n_cons")).cast("double")).as("lift"))
      .orderBy(col("ante"), col("cons"))
  }

  object Oracle {

    val basketFreqPairs: String =
      """WITH b AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day,
        |         event_type
        |  FROM events)
        |SELECT x.event_type AS type_a, y.event_type AS type_b,
        |       CAST(count(*) AS BIGINT) AS n_ab
        |FROM b x JOIN b y
        |  ON x.user_id = y.user_id AND x.day = y.day
        | AND x.event_type < y.event_type
        |GROUP BY 1, 2
        |ORDER BY type_a, type_b""".stripMargin

    val basketRulesLift: String =
      """WITH b AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day,
        |         event_type
        |  FROM events),
        |p AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |         CAST(count(*) AS BIGINT) AS n_ab
        |  FROM b x JOIN b y
        |    ON x.user_id = y.user_id AND x.day = y.day
        |   AND x.event_type < y.event_type
        |  GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
        |      FROM b GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets
        |       FROM (SELECT DISTINCT user_id, day FROM b)),
        |r AS (
        |  SELECT type_a AS ante, type_b AS cons, n_ab FROM p
        |  UNION ALL
        |  SELECT type_b, type_a, n_ab FROM p)
        |SELECT r.ante, r.cons,
        |  r.n_ab AS n_both, ta.n_t AS n_ante, tc.n_t AS n_cons,
        |  nn.n_baskets,
        |  CAST(r.n_ab AS DOUBLE) / CAST(ta.n_t AS DOUBLE) AS confidence,
        |  CAST(r.n_ab * nn.n_baskets AS DOUBLE)
        |    / CAST(ta.n_t * tc.n_t AS DOUBLE) AS lift
        |FROM r
        |JOIN t ta ON ta.event_type = r.ante
        |JOIN t tc ON tc.event_type = r.cons
        |CROSS JOIN nn
        |WHERE r.n_ab >= 5
        |ORDER BY ante, cons""".stripMargin
  }
}
