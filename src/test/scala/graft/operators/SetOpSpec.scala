package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables

/** The Dataset set operators (except / intersect / union-distinct) must
  * agree with the single-scan flag-aggregation plan that `setop_parts`
  * ships (Relational.setopParts) — the operators are the semantics, the
  * flag plan is the scale implementation.
  */
class SetOpSpec extends AnyFunSuite with SparkTestBase {

  test("except/intersect/union counts match the flag-aggregation plan") {
    val li = Tables.lineitem(spark, sf0001)
    val r = li.filter(col("l_returnflag") === "R").select(col("l_partkey")).distinct()
    val a = li.filter(col("l_returnflag") === "A").select(col("l_partkey")).distinct()
    val nExcept = r.except(a).count()
    val nIntersect = r.intersect(a).count()
    val nUnion = r.union(a).distinct().count()
    val flags = Relational.setopParts(spark, sf0001).collect()(0)
    assert(flags.getLong(0) == nExcept)
    assert(flags.getLong(1) == nIntersect)
    assert(flags.getLong(2) == nUnion)
  }

  test("unionByName handles column order; except is multiset-distinct") {
    import spark.implicits._
    val x = Seq((1, "a"), (2, "b"), (2, "b")).toDF("k", "v")
    val y = Seq(("b", 2)).toDF("v", "k")
    assert(x.unionByName(y.select(col("v"), col("k"))).count() == 4)
    // EXCEPT is distinct semantics: duplicate (2,b) collapses, then is removed
    assert(x.except(y.select(col("k"), col("v"))).collect().toSeq
      == Seq(org.apache.spark.sql.Row(1, "a")))
  }

  test("setop_all_parts: multiset identity |R exceptAll A| + |R intersectAll A| = |R|") {
    val r = Relational.setopAllParts(spark, sf0001).collect()(0)
    val nR = graft.sources.Tables.lineitem(spark, sf0001)
      .filter(col("l_returnflag") === "R").count()
    assert(r.getLong(0) + r.getLong(2) == nR)
  }
}
