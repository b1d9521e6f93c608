package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Per-cell Lloyd-iteration state: point count, exact per-dimension
  * micro-unit sums (the [[CentroidState]] algebra), and the cell's
  * within-cluster squared-distance mass in micro-units — everything one
  * k-means update step needs, merged by pure addition so the result is
  * bit-identical under any partitioning or merge order.
  */
case class KmeansCellState(n: Long, sums: Array[Long], wcssMicro: Long)

/** Typed Aggregator over (embedding, point-d² micro) pairs, grouped by
  * assigned cell: one (8d + 16)-byte state per (cell × partition) crosses
  * the exchange — the same no-posexplode rationale as
  * [[LabelCentroidAgg]], plus the objective mass folded into the same
  * pass so an iteration is ONE scan + ONE k-group shuffle.
  */
class KmeansCellAgg(dim: Int)
    extends Aggregator[(Int, Array[Float], Long), KmeansCellState, KmeansCellState] {

  def zero: KmeansCellState = KmeansCellState(0L, Array.fill(dim)(0L), 0L)

  def reduce(b: KmeansCellState, a: (Int, Array[Float], Long)): KmeansCellState = {
    val s = b.sums
    val v = a._2
    var i = 0
    while (i < dim) {
      s(i) += math.floor(v(i).toDouble * 1000000d + 0.5d).toLong
      i += 1
    }
    KmeansCellState(b.n + 1L, s, b.wcssMicro + a._3)
  }

  def merge(x: KmeansCellState, y: KmeansCellState): KmeansCellState = {
    val s = new Array[Long](dim)
    var i = 0
    while (i < dim) { s(i) = x.sums(i) + y.sums(i); i += 1 }
    KmeansCellState(x.n + y.n, s, x.wcssMicro + y.wcssMicro)
  }

  def finish(r: KmeansCellState): KmeansCellState = r

  def bufferEncoder: Encoder[KmeansCellState] = Encoders.product[KmeansCellState]
  def outputEncoder: Encoder[KmeansCellState] = Encoders.product[KmeansCellState]
}
