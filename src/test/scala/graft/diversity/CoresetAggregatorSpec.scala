package graft.diversity

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkTestBase

class CoresetAggregatorSpec extends AnyFunSuite with SparkTestBase {

  private def points() = {
    import spark.implicits._
    graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => Pt(id, v) }
  }

  test("aggregator coreset: budget respected, mass conserved, kernels are input points") {
    val res = points().select(new CoresetAggregator(32).toColumn).collect()(0)
    assert(res.length <= 32 && res.nonEmpty)
    assert(res.map(_.weight).sum == 500L)
    val inputIds = (0L until 500L).toSet
    assert(res.forall(k => inputIds.contains(k.id)))
    // separation: kernels pairwise distinct points
    assert(res.map(_.id).distinct.length == res.length)
  }

  test("grouped coresets: one bounded coreset per key, per-key mass") {
    import spark.implicits._
    val grouped = points()
      .groupByKey(p => (p.id % 3).toInt)
      .agg(new CoresetAggregator(8).toColumn.name("coreset"))
      .collect().toMap
    assert(grouped.keySet == Set(0, 1, 2))
    grouped.foreach { case (k, cs) =>
      assert(cs.length <= 8)
      val expectedMass = (0L until 500L).count(_ % 3 == k).toLong
      assert(cs.map(_.weight).sum == expectedMass)
      cs.foreach(w => assert(w.id % 3 == k))
    }
  }
}
