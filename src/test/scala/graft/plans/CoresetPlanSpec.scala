package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.DiversityOps

/** Specs for the custom LogicalPlan/Strategy/SparkPlan coreset path. */
class CoresetPlanSpec extends AnyFunSuite with SparkTestBase {

  test("CoresetExec plans through the custom strategy and prints in explain") {
    val df = DiversityOps.coresetExecK64(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("CoresetExec"), p)
  }

  test("plan-node coreset ≡ mapPartitions coreset (same kernel, same partitioning)") {
    import graft.diversity.{MapReduceCoreset, Pt}
    val viaPlan = DiversityOps.coresetExecK64(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // Same hashed-pmod repartition the exec path's child uses (NOT the
    // exact ModPartitioner of DiversityOps.coreset — partition contents
    // differ, so kernels would too); the assertion is exec node ≡ the
    // opaque-lambda fold over the identical partitioning.
    val p = DiversityOps.coresetParallelism(spark)
    val child = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding"))
      .repartition(p, pmod(col("id"), lit(p)))
    val viaMapPartitions = child
      .select(col("id"), col("embedding"))
      .rdd
      .mapPartitions { rows =>
        val pts = rows.map(r => Pt(r.getLong(0), r.getSeq[Float](1).toArray)).toVector
        MapReduceCoreset.localCoreset(pts.iterator, 64)
      }
      .collect()
      .map { wp =>
        val norm = math.sqrt(wp.vec.map(x => x.toDouble * x.toDouble).sum)
        (wp.id, wp.weight, math.rint(norm * 1e6) / 1e6)
      }.sortBy(_._1)
    assert(viaPlan.nonEmpty && viaPlan.toSeq == viaMapPartitions.toSeq)
  }

  test("weight mass conservation: kernel weights sum to the input row count") {
    val total = graft.sources.Tables.embeddings(spark, sf0001).count()
    val mass = DiversityOps.coresetExecK64(spark, sf0001)
      .agg(sum(col("weight"))).collect()(0).getLong(0)
    assert(mass == total)
  }
}
