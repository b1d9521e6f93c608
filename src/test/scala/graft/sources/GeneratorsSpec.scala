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
