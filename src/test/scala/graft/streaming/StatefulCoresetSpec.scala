package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.diversity.Pt
import graft.streaming.StatefulCoreset.{KernelOut, VecEvent}

class StatefulCoresetSpec extends AnyFunSuite with SparkTestBase {

  private def fixturePoints(): Seq[Pt] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect().map { case (id, v) => Pt(id, v) }.toSeq
  }

  test("streaming kernels across micro-batches == sequential batch fold") {
    import spark.implicits._
    val pts = fixturePoints().sortBy(_.id)
    val (b1, b2) = pts.splitAt(pts.length / 2)

    val stream = MemoryStream[VecEvent](spark)
    val q = StatefulCoreset.kernels(stream.toDS(), m = 32)
      .writeStream.format("memory").queryName("graft_stateful_coreset")
      .outputMode("update").start()
    try {
      stream.addData(b1.map(p => VecEvent(0, p.id, p.vec)))
      q.processAllAvailable()
      stream.addData(b2.map(p => VecEvent(0, p.id, p.vec)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.sql("SELECT * FROM graft_stateful_coreset").as[KernelOut].collect()
    // the final snapshot is the rows tagged with the full consumed count
    val fin = out.filter(_.consumed == pts.length.toLong)
      .map(k => (k.vec_id, k.weight)).sortBy(_._1).toSeq
    val expected = StatefulCoreset.batchFold(pts, 32)
      .map(w => (w.id, w.weight)).sortBy(_._1)
    assert(fin == expected)
    assert(fin.map(_._2).sum == pts.length.toLong)
  }

  test("keys are independent: two groups, two coresets") {
    import spark.implicits._
    val pts = fixturePoints().take(200)
    val stream = MemoryStream[VecEvent](spark)
    val q = StatefulCoreset.kernels(stream.toDS(), m = 8)
      .writeStream.format("memory").queryName("graft_stateful_two_keys")
      .outputMode("update").start()
    try {
      stream.addData(pts.map(p => VecEvent((p.id % 2).toInt, p.id, p.vec)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT * FROM graft_stateful_two_keys").as[KernelOut].collect()
    val byKey = out.groupBy(_.key)
    assert(byKey.keySet == Set(0, 1))
    byKey.foreach { case (k, rows) =>
      assert(rows.length <= 8)
      assert(rows.map(_.weight).sum == pts.count(_.id % 2 == k).toLong)
      // kernels of key k came only from points of key k
      rows.foreach(r => assert(r.vec_id % 2 == k))
    }
  }

  test("transformWithState entry == flatMapGroupsWithState entry == batch fold") {
    import org.apache.spark.sql.functions._
    val tws = graft.streaming.StreamingEntry.streamCoresetTws(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val fgws = graft.streaming.StreamingEntry.streamCoresetKeys(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tws.nonEmpty && tws == fgws,
      s"state-API divergence: tws=${tws.take(5)} fgws=${fgws.take(5)}")
    import spark.implicits._
    val pts = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(1024)
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => graft.diversity.Pt(id, v) }
    for (k <- 0 until 4) {
      val expect = StatefulCoreset.batchFold(pts.filter(_.id % 4 == k).toSeq, 16)
        .map(w => (k, w.id, w.weight)).sortBy(_._2)
      assert(tws.filter(_._1 == k).sortBy(_._2) == expect)
    }
  }

  test("declared entry: final per-key kernels equal the sequential batch fold") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingEntry.streamCoresetKeys(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // chunks ascend by vec_id and each batch sorts, so the stream fold is
    // the sequential fold — compare per key against batchFold
    import spark.implicits._
    val pts = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(1024)
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => graft.diversity.Pt(id, v) }
    for (k <- 0 until 4) {
      val expect = StatefulCoreset.batchFold(pts.filter(_.id % 4 == k).toSeq, 16)
        .map(w => (k, w.id, w.weight)).sortBy(_._2)
      assert(out.filter(_._1 == k).sortBy(_._2).toSeq == expect)
    }
  }
}
