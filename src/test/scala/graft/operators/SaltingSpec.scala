package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

class SaltingSpec extends AnyFunSuite with SparkTestBase {

  test("saltedJoin result == plain join result on a skewed key distribution") {
    val li = Tables.lineitem(spark, sf0001).select(col("l_orderkey"), col("l_quantity"))
    val ords = Tables.orders(spark, sf0001).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ords, "l_orderkey")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    val salted = Salting.saltedJoin(li, ords, "l_orderkey", buckets = 8)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    assert(salted == plain)
  }

  test("saltedCountSum is exact for algebraic aggregates") {
    val e = Tables.events(spark, sf0001)
      .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)"))
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
