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

  test("value_quantiles_sketch: GK estimates honor the rank-error guarantee") {
    val approx = Relational.valueQuantilesSketch(spark, sf0001).collect()
    assert(approx.nonEmpty)
    val values = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { r =>
      val vs = values(r.getString(0))
      val n = vs.length
      // GK guarantee at accuracy=10000: the returned value's rank is
      // within n/10000 (+1 for boundary arithmetic) of the target rank.
      def rankOk(p: Double, est: Double): Boolean = {
        val lo = vs.count(_ < est - 1e-6) // est is rounded to 6 dp
        val hi = vs.count(_ <= est + 1e-6)
        val target = p * n
        val tol = n / 10000.0 + 1.0
        target >= lo - tol && target <= hi + tol
      }
      assert(n.toLong == r.getLong(1))
      assert(rankOk(0.50, r.getDouble(2)), s"p50 ${r}")
      assert(rankOk(0.95, r.getDouble(3)), s"p95 ${r}")
      assert(rankOk(0.99, r.getDouble(4)), s"p99 ${r}")
    }
  }

  test("bitmap distinct pattern: bucket-boundary ids count exactly once") {
    import spark.implicits._
    // ids straddling the 32768-bit bucket edges, with duplicates — the
    // two-level bitmap pipeline must count each distinct id exactly once
    // across bucket boundaries (same expressions as bitmap_distinct_users)
    val ids = Seq(0L, 32767L, 32768L, 65535L, 65536L, 0L, 32768L, 32769L)
    val n = ids.toDF("user_id")
      .groupBy(expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))")
        .as("c"))
      .agg(sum(col("c"))).collect()(0).getLong(0)
    assert(n == ids.distinct.length.toLong, s"got $n")
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

  test("cms_token_counts: estimates dominate exact counts within the CMS bound") {
    val rows = TextAnalysisOps.cmsTokenCounts(spark, sf0001).collect()
    assert(rows.length == 20)
    val total = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0).count()
    rows.foreach { r =>
      val (exact, cms, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cms >= exact, s"CMS never undercounts: ${r.getString(0)}")
      assert(over == cms - exact)
      // Markov bound per row: overcount ≤ N/w in expectation; min over
      // d=4 independent rows — allow 8× slack over the expectation, far
      // below any plausible flake while still catching a broken hash/width.
      assert(over <= 8L * total / TextAnalysisOps.CmsWidth + 8,
        s"overcount $over exceeds the CMS bound for ${r.getString(0)} (N=$total)")
    }
    // descending exact order with token tie-break, unique tokens
    val ex = rows.map(_.getLong(1)).toSeq
    assert(ex == ex.sortBy(-_))
    assert(rows.map(_.getString(0)).distinct.length == 20)
  }
}
