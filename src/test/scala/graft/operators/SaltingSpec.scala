package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

class SaltingSpec extends AnyFunSuite with SparkTestBase {

  test("saltedJoin result == plain join result on a genuinely skewed (zipf) key distribution") {
    // zipfKeyed's head key draws ~32% of all rows at keys=100, alpha=4
    // (head share ≈ (1/keys)^(1/alpha)) — the distribution the salt trick
    // exists for (EXPERIMENTS.md "skew mitigation")
    // integer micro-units: double summation order differs between the two
    // plans, so only an exact integer measure can be compared for equality
    val fact = graft.sources.Generators.zipfKeyed(spark, 50000, 100, 4.0)
      .select(col("key"), expr("CAST(floor(value * 1000000) AS BIGINT)").as("v_micro"))
    val dim = spark.range(100).select(col("id").as("key"), (col("id") % 7).as("attr"))
    val plain = fact.join(dim, "key")
      .groupBy(col("attr")).agg(count(lit(1)).as("n"), sum(col("v_micro")).as("v"))
      .orderBy(col("attr")).collect().toSeq
    val salted = Salting.saltedJoin(fact, dim, "key", buckets = 8)
      .groupBy(col("attr")).agg(count(lit(1)).as("n"), sum(col("v_micro")).as("v"))
      .orderBy(col("attr")).collect().toSeq
    assert(salted == plain)
  }

  test("saltedCountSum is exact for algebraic aggregates") {
    val e = Tables.events(spark, sf0001)
      .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
    val plain = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val salted = Salting.saltedCountSum(e, "event_type", "cents", buckets = 16)
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(salted == plain)
  }

  test("salt is deterministic, not rand(): same input -> same salt") {
    val df = Tables.part(spark, sf0001).limit(50)
    val a = df.withColumn("s", Salting.saltCol(8, col("p_partkey"))).select("p_partkey", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = df.repartition(13).withColumn("s", Salting.saltCol(8, col("p_partkey"))).select("p_partkey", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a.sortBy(_._1) == b)
  }
}
