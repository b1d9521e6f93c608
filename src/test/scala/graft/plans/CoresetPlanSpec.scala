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
    val viaPlan = DiversityOps.coresetExecK64(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val viaMapPartitions = DiversityOps.coreset(spark, sf0001)
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
