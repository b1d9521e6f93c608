package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class VectorSourceSpec extends AnyFunSuite with SparkTestBase {

  private def load(n: Int, parts: Int) =
    spark.read.format("graft-vectors")
      .option("n", n).option("dim", 8).option("seed", 7).option("partitions", parts)
      .load()

  test("DSv2 source: row count, schema, partition planning") {
    val df = load(1000, 4)
    assert(df.count() == 1000L)
    assert(df.schema.fieldNames.toSeq == Seq("vec_id", "embedding", "label"))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select(countDistinct(col("vec_id"))).collect()(0).getLong(0) == 1000L)
  }

  test("deterministic: identical rows for any partition count") {
    val a = load(500, 1).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toVector, r.getInt(2))).toSeq
    val b = load(500, 7).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toVector, r.getInt(2))).toSeq
    assert(a == b)
  }

  test("vectors are unit-norm and labels balanced-ish over 10 classes") {
    val rows = load(2000, 4)
      .select(
        expr("aggregate(embedding, 0D, (s, x) -> s + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("n2"),
        col("label"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-5))
    val byLabel = rows.groupBy(_.getInt(1)).view.mapValues(_.length)
    assert(byLabel.keySet == (0 until 10).toSet)
    byLabel.values.foreach(n => assert(n > 100 && n < 300))
  }

  test("column pruning reaches the scan: id/label query reads no embedding") {
    val df = load(1000, 4).select(col("vec_id"), col("label"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("vec_id") && !scan.contains("embedding"), scan)
    assert(df.count() == 1000L)
  }

  test("vec_id range pushdown prunes at planning: billion-row table, tiny filter, fast") {
    // Without range pushdown this would generate 10^9 gaussian vectors.
    val t0 = System.nanoTime()
    val df = spark.read.format("graft-vectors")
      .option("n", 1000000000L).option("dim", 8).option("seed", 7).option("partitions", 4)
      .load()
      .filter(col("vec_id") >= 500 && col("vec_id") < 1500)
    assert(df.count() == 1000L)
    assert(df.agg(min("vec_id"), max("vec_id")).collect()(0).toSeq == Seq(500L, 1499L))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30, s"range pushdown not effective: took $sec s")
    // vec_id comparisons are fully CONSUMED by the scan (exact range
    // clamp — which is what unlocks aggregate pushdown), and the scan
    // reports the clamped range via Scan.description (formatted explain)
    assert(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      .contains("IdRange: [500, 1500)"), "no pushdown reported in formatted explain")
  }

  test("Long.MaxValue bounds saturate instead of wrapping (no silent empty scan)") {
    // regression: `v + 1` overflowed at MaxValue, planning zero partitions
    val all = load(1000, 4).filter(col("vec_id") <= Long.MaxValue)
    assert(all.count() == 1000L, "vec_id <= Long.MaxValue must match every row")
    val eq = load(1000, 4).filter(col("vec_id") === Long.MaxValue)
    assert(eq.count() == 0L)
    val gt = load(1000, 4).filter(col("vec_id") > Long.MaxValue)
    assert(gt.count() == 0L)
  }

  test("aggregate pushdown: count/min/max answered from partition bounds, no rows generated") {
    import org.apache.spark.sql.functions.{count => cnt, lit, max => mx, min => mn}
    // 2 billion ids: generating even pruned rows would take minutes —
    // completing fast proves the aggregate was answered at the source
    val t0 = System.nanoTime()
    val df = spark.read.format("graft-vectors")
      .option("n", 2000000000L).option("dim", 8).option("seed", 7).option("partitions", 4)
      .load()
      .filter(col("vec_id") >= 1000000L && col("vec_id") < 1900000000L)
      .agg(cnt(lit(1)).as("n"), mn(col("vec_id")).as("lo"), mx(col("vec_id")).as("hi"))
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1899000000L, 1000000L, 1899999999L))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30, s"aggregate pushdown not effective: took $sec s")
    assert(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      .contains("PushedAggregates: [COUNT(*), MIN(vec_id), MAX(vec_id)]"),
      "no aggregate pushdown reported")
    // empty clamped range: zero partitions -> count 0, null min/max
    val empty = spark.read.format("graft-vectors")
      .option("n", 1000).option("dim", 8).option("seed", 7).option("partitions", 4)
      .load()
      .filter(col("vec_id") > 5000L)
      .agg(cnt(lit(1)).as("n"), mn(col("vec_id")).as("lo")).collect()(0)
    assert(empty.getLong(0) == 0L && empty.isNullAt(1), empty.toString)
  }

  test("micro-batch stream: source-paced batches drain the id space, result == batch scan") {
    import org.apache.spark.sql.functions.{count => cnt, lit, sum}
    val q = spark.readStream.format("graft-vectors")
      .option("n", 10000).option("dim", 8).option("seed", 7)
      .option("partitions", 4).option("rowsPerBatch", 3000)
      .load()
      .groupBy(col("label"))
      .agg(cnt(lit(1)).as("n_vecs"), sum(col("vec_id")).as("id_sum"))
      .writeStream.format("memory").queryName("vec_stream_spec")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    // the source admitted 3000 ids per trigger: multiple genuine data
    // batches, not one swallow (10000/3000 → at least 2 even if a trigger
    // ever saw two admission steps)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      q.recentProgress.map(_.numInputRows).mkString(","))
    val streamed = spark.table("vec_stream_spec")
      .orderBy(col("label")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = load(10000, 4)
      .groupBy(col("label"))
      .agg(cnt(lit(1)).as("n_vecs"), sum(col("vec_id")).as("id_sum"))
      .orderBy(col("label")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("restart from checkpoint: a grown source resumes at the committed offset, file sink exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val base = new java.io.File("target/vec-restart-spec").getAbsoluteFile
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe); f.delete(): Unit
    }
    wipe(base); base.mkdirs()
    val out = new java.io.File(base, "out").getPath
    val ck = new java.io.File(base, "ck").getPath
    // Each incarnation is a fresh query over the SAME checkpoint,
    // Trigger.AvailableNow: drain what the source has, in rowsPerBatch
    // steps (AvailableNow paces by getDefaultReadLimit but must reach the
    // snapshot target — the honored-ReadLimit contract), then terminate.
    // Run 2 sees a GROWN source (n 6000 → 10000, i.e. new data arrived
    // while the job was down) and must resume exactly at the committed
    // offset — latestOffset is a pure function of the start offset Spark
    // replays from the checkpoint, not of an in-memory cursor a crash
    // would reset.
    def drain(n: Int): Unit = {
      val q = spark.readStream.format("graft-vectors")
        .option("n", n).option("dim", 8).option("seed", 7)
        .option("partitions", 4).option("rowsPerBatch", 3000)
        .load()
        .select(col("vec_id"), col("label"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000): Unit
    }
    drain(6000)
    assert(spark.read.parquet(out).count() == 6000L) // run 1 drained fully
    drain(10000) // "new data arrived while down": resumes at 6000
    val read = spark.read.parquet(out) // via the _spark_metadata commit log
    assert(read.count() == 10000L)
    assert(read.select(countDistinct(col("vec_id"))).collect()(0).getLong(0) == 10000L,
      "restart re-emitted or skipped ids")
    drain(10000) // a third incarnation finds the source drained: no new rows
    assert(spark.read.parquet(out).count() == 10000L)
  }

  test("source feeds the diversity pipeline end-to-end") {
    import spark.implicits._
    val pts = load(300, 4)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect().map { case (id, v) => graft.diversity.Pt(id, v) }.toVector
    val sel = graft.diversity.Gmm.select(pts, 12)
    assert(sel.length == 12)
    assert(graft.diversity.Diversity.remoteEdge(sel) > 0.5) // random unit vectors are spread
  }
}
