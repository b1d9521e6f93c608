package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Exact centroid state: row count + per-dimension sums in integer
  * MICRO-UNITS (`floor(x·10⁶ + 0.5)` per element — the tie-mode-free
  * quantizer of the money convention, COVERAGE.md class 1), so the state
  * is a plain `(Long, Array[Long])` that merges by addition and is
  * bit-identical under ANY aggregation order or partitioning.
  */
case class CentroidState(n: Long, sums: Array[Long])

/** Typed `Aggregator` (UDAF) computing [[CentroidState]] over an embedding
  * column in ONE pass — the extension point the expression/plan-node/DSv2
  * family was missing a DECLARED query for. The scale rationale vs the
  * obvious `posexplode → groupBy(label, dim)` plan: exploding a d-dim
  * embedding multiplies the exchange by d (64 rows per doc here, 768+ in
  * production); the Aggregator's partial state is ONE `Array[Long]` per
  * (group × partition), so the shuffle carries |labels| × partitions ×
  * (8d + 8) bytes regardless of row count. The explode happens AFTER the
  * aggregate, on |labels| rows.
  */
class LabelCentroidAgg(dim: Int)
    extends Aggregator[Array[Float], CentroidState, CentroidState] {

  def zero: CentroidState = CentroidState(0L, Array.fill(dim)(0L))

  def reduce(b: CentroidState, a: Array[Float]): CentroidState = {
    val s = b.sums
    var i = 0
    while (i < dim) {
      s(i) += math.floor(a(i).toDouble * 1000000d + 0.5d).toLong
      i += 1
    }
    CentroidState(b.n + 1L, s)
  }

  def merge(x: CentroidState, y: CentroidState): CentroidState = {
    val s = new Array[Long](dim)
    var i = 0
    while (i < dim) { s(i) = x.sums(i) + y.sums(i); i += 1 }
    CentroidState(x.n + y.n, s)
  }

  def finish(r: CentroidState): CentroidState = r

  def bufferEncoder: Encoder[CentroidState] = Encoders.product[CentroidState]
  def outputEncoder: Encoder[CentroidState] = Encoders.product[CentroidState]
}
