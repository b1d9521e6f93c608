package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded top-k state: parallel arrays sorted by (value desc, id asc),
  * never longer than k. Selection top-k under a STATIC total order is
  * exactly mergeable — top-k(X ∪ Y) = top-k(top-k(X) ∪ top-k(Y)) — which
  * is what makes the state both shuffle-bounded AND incremental: a stored
  * per-day state merges into the weekly/monthly answer without re-reading
  * rows (the `agg_incremental_users` contract, for rankings).
  */
case class TopKState(cs: Array[Long], ids: Array[Long])

/** Typed `Aggregator` computing per-group top-k by (value desc, id asc)
  * with O(k) partial state. Spark 3.5+'s WindowGroupLimit already prunes a
  * rank-limit window map-side, so the WINDOW form of top-k (see
  * `win_topk_parts`) no longer sorts whole groups — the Aggregator form's
  * remaining edge is the mergeable STATE: it is a value you can persist,
  * re-merge, and union across corpus slices, not just a query plan. Both
  * insert and merge are O(k) per call; the exchange carries ≤ k (value,
  * id) pairs per (group × partition) at any row count.
  */
class TopKAgg(k: Int) extends Aggregator[(Long, Long), TopKState, TopKState] {

  def zero: TopKState = TopKState(Array.emptyLongArray, Array.emptyLongArray)

  /** (c, id) sorts before position i's entry under (c desc, id asc). */
  @inline private def beats(s: TopKState, i: Int, c: Long, id: Long): Boolean =
    c > s.cs(i) || (c == s.cs(i) && id < s.ids(i))

  def reduce(b: TopKState, a: (Long, Long)): TopKState = {
    val n = b.cs.length
    if (n == k && !beats(b, k - 1, a._1, a._2)) return b
    // insertion position by linear scan — k is small by contract
    var p = 0
    while (p < n && !beats(b, p, a._1, a._2)) p += 1
    val m = math.min(n + 1, k)
    val cs = new Array[Long](m); val ids = new Array[Long](m)
    System.arraycopy(b.cs, 0, cs, 0, p); System.arraycopy(b.ids, 0, ids, 0, p)
    cs(p) = a._1; ids(p) = a._2
    val tail = m - p - 1
    if (tail > 0) {
      System.arraycopy(b.cs, p, cs, p + 1, tail)
      System.arraycopy(b.ids, p, ids, p + 1, tail)
    }
    TopKState(cs, ids)
  }

  def merge(x: TopKState, y: TopKState): TopKState = {
    val m = math.min(x.cs.length + y.cs.length, k)
    val cs = new Array[Long](m); val ids = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeX = j >= y.cs.length ||
        (i < x.cs.length &&
          (x.cs(i) > y.cs(j) || (x.cs(i) == y.cs(j) && x.ids(i) < y.ids(j))))
      if (takeX) { cs(o) = x.cs(i); ids(o) = x.ids(i); i += 1 }
      else { cs(o) = y.cs(j); ids(o) = y.ids(j); j += 1 }
      o += 1
    }
    TopKState(cs, ids)
  }

  def finish(r: TopKState): TopKState = r

  def bufferEncoder: Encoder[TopKState] = Encoders.product[TopKState]
  def outputEncoder: Encoder[TopKState] = Encoders.product[TopKState]
}
