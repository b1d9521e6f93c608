package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Specs for the Misra-Gries sketch and the two-pass heavy-hitters plan. */
class HeavyHitterSpec extends AnyFunSuite with SparkTestBase {

  test("misra-gries: bounded counters, no false negative above n/(k+1)") {
    // 400 "hot" among 1000 items, k=4 → threshold n/(k+1) = 200, so "hot"
    // MUST survive; 600 unique fillers force constant eviction pressure.
    val rnd = new scala.util.Random(42)
    val items = rnd.shuffle(
      Seq.fill(400)("hot") ++ (0 until 600).map(i => s"filler_$i"))
    val out = TextOps.misraGries(items.iterator, 4).toSet
    assert(out.size <= 4, s"counter table exceeded k: $out")
    assert(out.contains("hot"), s"false negative for a 40% item: $out")
  }

  test("misra-gries: second-place survivor too when both clear the bound") {
    // two heavy items at 30% each, k=8 → both > n/(k+1) = 11.1%
    val rnd = new scala.util.Random(7)
    val items = rnd.shuffle(
      Seq.fill(300)("a") ++ Seq.fill(300)("b") ++ (0 until 400).map(i => s"u$i"))
    val out = TextOps.misraGries(items.iterator, 8).toSet
    assert(out.contains("a") && out.contains("b"), out.toString)
  }

  test("heavy_hitters_tokens == exact φ=1/512 heavy hitters (sketch is candidates-only)") {
    val sketched = TextOps.heavyHittersTokens(spark, sf0001).collect().toSeq
    val toks = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val total = toks.count()
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .filter(col("n") * 512 > lit(total))
      .select(col("tok"), col("n"))
      .orderBy(col("n").desc, col("tok")).collect().toSeq
    assert(sketched.nonEmpty && sketched == exact)
  }
}
