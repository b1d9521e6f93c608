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
    // The exec node OWNS the exact `id % p` distribution since r9 (it
    // previously leaned on a child-side hashed pmod repartition that
    // lumped residue groups) — so the replica uses the SAME ModPartitioner
    // as DiversityOps.coreset's collect path: exec node ≡ opaque-lambda
    // fold over identical partition contents.
    val p = DiversityOps.coresetParallelism(spark)
    val viaMapPartitions = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding"))
      .rdd
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .partitionBy(new graft.plans.ModPartitioner(p))
      .mapPartitions { rows =>
        val pts = rows.map { case (id, vec) => Pt(id, vec) }.toVector
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
