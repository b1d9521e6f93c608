package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7.3.5 / builder prompt: "salting
  * for skew").
  *
  * `saltedJoin` implements the classic hot-key split: the skewed (large)
  * side gets a deterministic salt in [0, buckets) derived from a stable
  * hash of its whole row key-tuple, the small side is exploded `buckets`×,
  * and the join key becomes (key, salt). Result rows are identical to the
  * plain join; the shuffle spreads each hot key over `buckets` reducers.
  *
  * AQE's skew-join split (on by default in Spark 4) handles most cases at
  * runtime; explicit salting remains the tool when a single key exceeds
  * what one task can hold even after AQE splitting (e.g. a null-key flood
  * or a power-law entity), or for aggregations (AQE does not split skewed
  * groupBy keys — use `saltedAgg`'s two-phase form).
  */
object Salting {

  /** Deterministic salt column in [0, buckets): xxhash64 of the given
    * columns (NOT rand() — reproducible under retries and re-partitioning).
    */
  def saltCol(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong))

  /** Inner equi-join of a skewed large side against a small side with the
    * salt trick. `large` is salted by a hash of all its columns; `small` is
    * replicated `buckets` times.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val saltedLarge = large.withColumn(
      "__salt", saltCol(buckets, large.columns.map(col).toIndexedSeq: _*))
    val replicatedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedLarge.join(replicatedSmall,
        saltedLarge(key) === replicatedSmall(key) &&
          saltedLarge("__salt") === replicatedSmall("__salt"))
      .drop(replicatedSmall(key))
      .drop(saltedLarge("__salt")).drop(replicatedSmall("__salt"))
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt), then
    * final aggregate on key. For algebraic aggregates (sum/count/min/max)
    * this is exact and caps any single reducer's group size at
    * |group| / buckets.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, buckets: Int): DataFrame = {
    df.withColumn("__salt", saltCol(buckets, df.columns.map(col).toIndexedSeq: _*))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum"))
  }
}
