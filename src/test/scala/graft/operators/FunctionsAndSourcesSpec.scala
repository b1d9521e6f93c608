package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

/** Coverage for the function/source surface not carried by a declared t2
  * query: map functions, approximate distinct (HLL — excluded from the
  * hash-compare per SURVEY §7.4), CSV/JSON source round-trips, and the
  * bucketed-table co-located join (the no-shuffle join evidence at scale).
  */
class FunctionsAndSourcesSpec extends AnyFunSuite with SparkTestBase {

  test("map functions: build token->count map, lookup, keys/values/filter") {
    import spark.implicits._
    val df = Seq("a b a c a b").toDF("text")
      .select(expr("split(text, ' ')").as("t"))
      .select(expr(
        "map_from_arrays(array_distinct(t), transform(array_distinct(t), x -> size(filter(t, y -> y = x))))").as("m"))
    val r = df.select(
      expr("element_at(m, 'a')").as("a_count"),
      expr("size(m)").as("n_keys"),
      expr("array_sort(map_keys(m))").as("keys"),
      expr("aggregate(map_values(m), 0, (s, x) -> s + x)").as("total"),
      expr("size(map_filter(m, (k, v) -> v > 1))").as("n_repeated")
    ).collect()(0)
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 3)
    assert(r.getSeq[String](2) == Seq("a", "b", "c"))
    assert(r.getInt(3) == 6)
    assert(r.getInt(4) == 2)
  }

  test("approx_count_distinct (HLL) lands within 5% of exact") {
    val e = Tables.events(spark, sf0001)
    val row = e.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("CSV, JSON and ORC sources round-trip with schema") {
    val dir = "/tmp/graft_sources_test"
    val nation = Tables.nation(spark, sf0001)
    nation.write.mode("overwrite").option("header", "true").csv(s"$dir/nation_csv")
    nation.write.mode("overwrite").json(s"$dir/nation_json")
    nation.write.mode("overwrite").orc(s"$dir/nation_orc")
    val fromCsv = spark.read.option("header", "true").schema(nation.schema).csv(s"$dir/nation_csv")
    val fromJson = spark.read.schema(nation.schema).json(s"$dir/nation_json")
    val fromOrc = spark.read.orc(s"$dir/nation_orc")
    assert(fromCsv.orderBy("n_nationkey").collect().toSeq
      == nation.orderBy("n_nationkey").collect().toSeq)
    assert(fromJson.orderBy("n_nationkey").collect().toSeq
      == nation.orderBy("n_nationkey").collect().toSeq)
    assert(fromOrc.orderBy("n_nationkey").collect().toSeq
      == nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("partitionBy write prunes partitions on read (PartitionFilters, not data filters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.documents(spark, sf0001)
      .write.mode("overwrite").partitionBy("lang").parquet(s"$dir/docs_by_lang")
    val one = spark.read.parquet(s"$dir/docs_by_lang").filter(col("lang") === "en")
    val scan = one.queryExecution.executedPlan.toString
    // the lang predicate must resolve at the directory level: it shows up in
    // PartitionFilters and never reaches the parquet row-group filters
    assert(scan.contains("PartitionFilters") &&
      scan.split("PartitionFilters", 2)(1).takeWhile(_ != ']').contains("lang"), scan)
    assert(!scan.split("PushedFilters", 2)(1).takeWhile(_ != ']').contains("lang"), scan)
    val expected = Tables.documents(spark, sf0001).filter(col("lang") === "en").count()
    assert(one.count() == expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is set to /tmp/graft_warehouse in SparkTestBase (static
    // conf); the in-memory catalog is fresh each JVM but the directory is
    // not — clear both so overwrite never trips on an orphaned location
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    new scala.reflect.io.Directory(new java.io.File("/tmp/graft_warehouse/graft_li_bucketed")).deleteRecursively()
    new scala.reflect.io.Directory(new java.io.File("/tmp/graft_warehouse/graft_ord_bucketed")).deleteRecursively()
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val ords = Tables.orders(spark, sf0001).select("o_orderkey", "o_orderpriority")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_li_bucketed")
    ords.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_ord_bucketed")
    // disable auto-broadcast so the planner must pick the co-located
    // sort-merge path (at real scale neither side would broadcast anyway)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: no Exchange on either side
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() == Tables.lineitem(spark, sf0001).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
