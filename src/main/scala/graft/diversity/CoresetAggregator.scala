package graft.diversity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** GMM-style coreset as a typed `Aggregator` UDAF (SURVEY.md §4.3 "plan B";
  * the UDAF slot of the §2.2 UDF/UDAF/UDTF mapping). Usable anywhere an
  * aggregate fits — `ds.select(agg.toColumn)`, `groupBy(...).agg(...)` —
  * including grouped coresets per key.
  *
  * Buffer = a live [[StreamingCoreset]] behind a Kryo encoder (mutable
  * in-place per-row updates; serialized only at shuffle boundaries).
  * `merge` folds the smaller coreset's kernels into the larger with their
  * delegate weights — the composable-coreset property ([VLDB17] §4).
  *
  * Determinism note: `reduce` order within a partition follows scan order,
  * but `merge` order across partitions is scheduler-dependent, so the
  * exact kernel SET may vary run-to-run (mass/size/separation invariants
  * hold regardless — tested). The t2-declared diversity ops therefore use
  * the deterministic `repartition + mapPartitions` path in
  * [[graft.operators.DiversityOps]]; this Aggregator is the drop-in form
  * for pipelines that don't need bit-identical reruns.
  */
class CoresetAggregator(m: Int)
    extends Aggregator[Pt, StreamingCoreset, Seq[WeightedPt]] {

  override def zero: StreamingCoreset = new StreamingCoreset(m)

  override def reduce(buf: StreamingCoreset, p: Pt): StreamingCoreset = {
    buf.update(p)
    buf
  }

  override def merge(a: StreamingCoreset, b: StreamingCoreset): StreamingCoreset = {
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    // fold in ascending id order — removes the intra-merge ordering wobble
    from.result().sortBy(_.id).foreach(w => into.updateWeighted(Pt(w.id, w.vec), w.weight))
    into
  }

  override def finish(buf: StreamingCoreset): Seq[WeightedPt] =
    buf.result().sortBy(_.id)

  override def bufferEncoder: Encoder[StreamingCoreset] =
    Encoders.kryo[StreamingCoreset]

  override def outputEncoder: Encoder[Seq[WeightedPt]] =
    ExpressionEncoder[Seq[WeightedPt]]()
}
