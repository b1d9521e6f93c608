package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM properties of the mergeable top-k state: any partitioning of
  * the input into chunks, reduced independently and merged in any tree
  * order, must equal the reference sort-take-k — the exact property that
  * makes the state safe to persist per-day and re-merge per-month.
  */
class TopKAggSpec extends AnyFunSuite {

  private val k = 5
  private val agg = new TopKAgg(k)

  private def ref(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    xs.sortBy { case (c, id) => (-c, id) }.take(k)

  private def toPairs(s: TopKState): Seq[(Long, Long)] =
    s.cs.toSeq.zip(s.ids.toSeq)

  private def reduceAll(xs: Seq[(Long, Long)]): TopKState =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("fold == reference on random input, duplicates and ties included") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val n = rnd.nextInt(40)
      // small value range forces (c) ties so the id tie-break is exercised
      val xs = Seq.fill(n)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
      assert(toPairs(reduceAll(xs)) == ref(xs), s"trial $trial: $xs")
    }
  }

  test("merge of chunked partials == fold of the whole, any chunking") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 50) {
      val xs = Seq.fill(rnd.nextInt(60) + 1)(
        (rnd.nextInt(10).toLong, rnd.nextLong(10000)))
      val nChunks = rnd.nextInt(6) + 1
      val partials = xs.grouped(math.max(1, xs.size / nChunks)).map(reduceAll).toSeq
      // left fold AND right fold of the merge tree — order must not matter
      val l = partials.reduceLeft(agg.merge)
      val r = partials.reduceRight(agg.merge)
      assert(toPairs(l) == ref(xs), s"trial $trial left")
      assert(toPairs(r) == ref(xs), s"trial $trial right")
    }
  }

  test("state never exceeds k and stays sorted by (c desc, id asc)") {
    val xs = (1L to 100L).map(i => (i % 9, i))
    val s = reduceAll(xs)
    assert(s.cs.length <= k && s.ids.length == s.cs.length)
    val ps = toPairs(s)
    assert(ps == ps.sortBy { case (c, id) => (-c, id) })
  }
}
