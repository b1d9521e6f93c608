package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar / date / array-and-map function coverage (SURVEY.md §2.2 group H).
  * All expressions are Catalyst built-ins — whole-stage-codegen'd, no UDFs.
  */
object ScalarOps {

  /** H: string, math and conditional scalar functions over nation. */
  def scalarFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.nation(spark, sfDir)
      .select(
        col("n_nationkey").cast("long").as("n_nationkey"),
        upper(col("n_name")).as("upper_name"),
        length(col("n_name")).cast("long").as("name_len"),
        substring(col("n_name"), 1, 6).as("name_pfx"),
        concat(col("n_name"), lit("_"), col("n_regionkey").cast("string")).as("name_region"),
        (col("n_nationkey") % 7).cast("long").as("mod7"),
        round(sqrt(col("n_nationkey").cast("double")), 6).as("sqrt_key"),
        when(col("n_nationkey") % 2 === 0, "even").otherwise("odd").as("parity"))
      .orderBy(col("n_nationkey"))
  }

  /** H: date_trunc / extract / date_add / datediff over o_orderdate, grouped
    * by (year, month). Day-of-week normalized to DuckDB's 0=Sunday.
    */
  def dateFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(
        count(lit(1)).as("n"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_day"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_day"),
        datediff(to_date(max(col("o_orderdate"))), to_date(min(col("o_orderdate"))))
          .cast("long").as("span_days"),
        date_format(date_trunc("month", min(col("o_orderdate"))), "yyyy-MM-dd").as("month_start"),
        sum((dayofweek(col("o_orderdate")) - 1).cast("long")).as("dow_sum"),
        date_format(date_add(to_date(max(col("o_orderdate"))), 30), "yyyy-MM-dd").as("plus30"))
      .orderBy(col("y"), col("m"))
  }

  /** H: higher-order array functions over the embedding column — size,
    * slice, transform, aggregate. Accumulates in DOUBLE on both engines
    * (float math would drift at the 6-dp rounding boundary).
    */
  def arrayMapFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(expr(
          "aggregate(embedding, 0D, (s, x) -> s + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"), 6).as("ssq"),
        round(expr(
          "aggregate(slice(embedding, 1, 4), 0D, (s, x) -> s + CAST(x AS DOUBLE))"), 6).as("head4_sum"),
        round(expr(
          "aggregate(transform(embedding, x -> CAST(abs(x) AS DOUBLE)), 0D, (s, x) -> s + x)"), 6).as("l1_norm"))
      .orderBy(col("vec_id"))
  }

  /** H+: ANSI-mode error tolerance — Spark 4 throws on bad casts and
    * division by zero; `try_cast`/`try_divide` restore SQL's permissive
    * NULL-on-error semantics where the query wants them. The oracle
    * mirrors try_divide's divide-by-zero → NULL with an explicit CASE
    * (DuckDB float division by zero yields inf, not NULL).
    */
  def tryFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        expr("try_cast(substring(text, 1, 3) AS BIGINT)").as("head_int"),
        expr("try_cast(CAST(n_chars AS STRING) AS BIGINT)").as("chars_int"),
        round(expr("try_divide(CAST(n_chars AS DOUBLE), CAST(doc_id % 3 AS DOUBLE))"), 6).as("div3"))
      .orderBy(col("doc_id"))
  }

  /** H+: MapType round-trip — per-user event counts packed into a
    * map<string,long> (map_from_entries over sorted struct entries), then
    * exploded back to rows. The map construction/explosion must be an exact
    * identity of the plain aggregate, which is what the oracle checks.
    */
  def mapRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(expr("map_from_entries(array_sort(collect_list(struct(event_type, n))))").as("m"))
      .select(col("user_id"), explode(col("m")).as(Seq("event_type", "n")))
      .orderBy(col("user_id"), col("event_type"))
  }
}
