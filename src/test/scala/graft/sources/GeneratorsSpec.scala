package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class GeneratorsSpec extends AnyFunSuite with SparkTestBase {

  test("uniformCube: deterministic across runs and partitionings, in-range") {
    val a = Generators.uniformCube(spark, 200, 4).orderBy("id").collect()
    val b = Generators.uniformCube(spark, 200, 4).repartition(7).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
    a.foreach { r =>
      r.getSeq[Double](1).foreach(x => assert(x >= 0.0 && x < 1.0))
    }
    // the sample must SPAN [0,1), not just sit inside it — guards against
    // the signed-shift regression that collapsed the range to [0.25,0.75)
    val flat = a.flatMap(_.getSeq[Double](1))
    assert(flat.min < 0.1 && flat.max > 0.9)
  }

  test("zipfKeyed: deterministic, heavy head, exact in-range keys") {
    val df = Generators.zipfKeyed(spark, 100000, 1000, 4.0)
    val a = df.orderBy("id").collect()
    val b = Generators.zipfKeyed(spark, 100000, 1000, 4.0).repartition(5).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
    a.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) < 1000L)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
    }
    // power-law head: key 0 draws ≈ (1/1000)^(1/4) ≈ 17.8% of all rows
    val share0 = a.count(_.getLong(1) == 0L).toDouble / a.length
    assert(share0 > 0.15 && share0 < 0.21, s"head share $share0")
  }

  test("uniformSphere: unit norm, deterministic") {
    val rows = Generators.uniformSphere(spark, 100, 8)
      .select(expr("aggregate(vec, 0D, (s, x) -> s + x * x)").as("n2")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
    val a = Generators.uniformSphere(spark, 50, 8).orderBy("id").collect()
    val b = Generators.uniformSphere(spark, 50, 8).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("generated points feed the diversity kernels") {
    import spark.implicits._
    val pts = Generators.uniformSphere(spark, 300, 8)
      .select(col("id"), expr("transform(vec, x -> CAST(x AS FLOAT))").as("vec"))
      .as[(Long, Array[Float])]
      .collect().map { case (id, v) => graft.diversity.Pt(id, v) }.toVector
    val sel = graft.diversity.Gmm.select(pts, 16)
    assert(sel.length == 16)
    assert(graft.diversity.Diversity.remoteEdge(sel) > 0)
  }
}
