package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch source `graft-vectors`: a deterministic synthetic
  * embedding table (reference operator R8 — dataset generators — exposed
  * the idiomatic Spark way, as a real table instead of a helper method).
  *
  * {{{
  *   spark.read.format("graft-vectors")
  *     .option("n", 10000).option("dim", 64)
  *     .option("seed", 42).option("partitions", 8)
  *     .load()   // => (vec_id: long, embedding: array<float>, label: int)
  * }}}
  *
  * Rows are derived purely from (vec_id, dim-index, seed) via splitmix64 —
  * the same row set for any partition count, task retry, or speculation
  * (never `rand()`). Unit-normalized gaussian vectors, like the fixture
  * embeddings. Scale posture: `planInputPartitions` splits the id range, so
  * a 10¹²-row table is just more partitions — no driver materialization.
  * The scan implements BOTH V2 pushdowns that matter here:
  *
  *  - column pruning ([[SupportsPushDownRequiredColumns]]): an id/label-only
  *    query never pays the O(dim) gaussian generation per row;
  *  - vec_id range pushdown ([[SupportsPushDownFilters]]): comparisons on
  *    vec_id clamp the generated id range at PLANNING time, so
  *    `n=10⁹, WHERE vec_id < 1000` plans one tiny partition instead of
  *    generating a billion rows. Filters are still returned as residual, so
  *    Spark re-checks them — pruning is an optimization, never a semantics
  *    change.
  */
class VectorSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-vectors"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VectorSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new VectorTable(properties.asScala.toMap)
}

object VectorSource {
  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("label", IntegerType, nullable = false)))

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def u01(h: Long): Double =
    ((h >>> 11).toDouble + 0.5) / 9007199254740992.0 // 53-bit mantissa -> (0,1)

  /** The deterministic row kernel shared by every partition reader. */
  def vectorFor(id: Long, dim: Int, seed: Long): Array[Float] = {
    val g = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val h1 = splitmix64(seed ^ (id * 1000003L) ^ (2L * i))
      val h2 = splitmix64(seed ^ (id * 1000003L) ^ (2L * i + 1L))
      g(i) = math.sqrt(-2.0 * math.log(u01(h1))) * math.cos(2.0 * math.Pi * u01(h2))
      i += 1
    }
    val norm = math.sqrt(g.map(x => x * x).sum)
    g.map(x => (x / norm).toFloat)
  }

  def labelFor(id: Long, seed: Long): Int =
    (math.floorMod(splitmix64(seed ^ id), 10L)).toInt
}

class VectorTable(props: Map[String, String]) extends Table with SupportsRead {
  private val n = props.getOrElse("n", "1000").toLong
  private val dim = props.getOrElse("dim", "16").toInt
  private val seed = props.getOrElse("seed", "42").toLong
  private val partitions = props.getOrElse("partitions", "4").toInt

  private val rowsPerBatch = props.getOrElse("rowsPerBatch", "1000").toLong

  override def name(): String = s"graft-vectors(n=$n, dim=$dim, seed=$seed)"
  override def schema(): StructType = VectorSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
      with SupportsPushDownRequiredColumns with SupportsPushDownFilters
      with SupportsPushDownAggregates { self =>

      private var required: StructType = VectorSource.schema
      private var lo: Long = 0L            // inclusive id lower bound
      private var hi: Long = n             // exclusive id upper bound
      private var pushed: Array[Filter] = Array.empty
      private var pushedAggs: Seq[AggregateFunc] = Nil
      private var aggSchema: StructType = new StructType()

      /** Aggregate pushdown (PARTIAL contract): COUNT(*)/MIN(vec_id)/
        * MAX(vec_id) with no GROUP BY are closed-form over the planned id
        * range, so each partition answers from its [start, end) bounds in
        * O(1) — no row, let alone a vector, is ever generated. Spark
        * merges the per-partition partials (sum of counts, min of mins,
        * max of maxes); an empty clamped range plans zero partitions and
        * the final aggregate correctly yields 0/NULL/NULL.
        */
      private def isVecId(f: AggregateFunc): Boolean = f match {
        case m: Min => m.column() match {
          case r: NamedReference => r.fieldNames.sameElements(Array("vec_id"))
          case _ => false
        }
        case m: Max => m.column() match {
          case r: NamedReference => r.fieldNames.sameElements(Array("vec_id"))
          case _ => false
        }
        case _ => false
      }

      override def pushAggregation(agg: Aggregation): Boolean = {
        val ok = agg.groupByExpressions().isEmpty &&
          agg.aggregateExpressions().nonEmpty &&
          agg.aggregateExpressions().forall {
            case _: CountStar => true
            case f => isVecId(f)
          }
        if (ok) {
          pushedAggs = agg.aggregateExpressions().toSeq
          aggSchema = StructType(pushedAggs.zipWithIndex.map {
            case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
            case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
          })
        }
        ok
      }

      override def pruneColumns(requiredSchema: StructType): Unit =
        // preserve source field order; empty projection (count(*)) is legal
        required = StructType(
          VectorSource.schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

      // Saturating successor: at v == Long.MaxValue a plain `v + 1` wraps
      // negative, planning ZERO partitions — a silent wrong-answer path
      // (`vec_id <= Long.MaxValue` matches every row, ids never exceed
      // MaxValue - 1 so MaxValue itself is a safe saturation point).
      private def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        // vec_id comparisons are ACCEPTED (not residual): the range clamp
        // is an exact evaluation — generated ids are precisely [lo, hi) —
        // and fully-consumed filters are what unlocks aggregate pushdown
        // (Spark refuses to push an aggregate over post-scan filters).
        // Anything else (other columns, IN/OR shapes) stays residual.
        val (accepted, residual) = filters.partition {
          case GreaterThan("vec_id", _: Long) => true
          case GreaterThanOrEqual("vec_id", _: Long) => true
          case LessThan("vec_id", _: Long) => true
          case LessThanOrEqual("vec_id", _: Long) => true
          case EqualTo("vec_id", _: Long) => true
          case _ => false
        }
        accepted.foreach {
          case GreaterThan("vec_id", v: Long) => lo = math.max(lo, succ(v))
          case GreaterThanOrEqual("vec_id", v: Long) => lo = math.max(lo, v)
          case LessThan("vec_id", v: Long) => hi = math.min(hi, v)
          case LessThanOrEqual("vec_id", v: Long) => hi = math.min(hi, succ(v))
          case EqualTo("vec_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, succ(v))
          case _ => ()
        }
        pushed = accepted
        residual
      }

      override def pushedFilters(): Array[Filter] = pushed

      override def build(): Scan = this
      override def readSchema(): StructType =
        if (pushedAggs.nonEmpty) aggSchema else required
      override def toBatch: Batch = this
      override def description(): String =
        s"PushedFilters: [${pushed.mkString(", ")}], IdRange: [$lo, $hi)" +
          (if (pushedAggs.nonEmpty)
            s", PushedAggregates: [${pushedAggs.map(_.describe()).mkString(", ")}]"
          else "")

      override def planInputPartitions(): Array[InputPartition] = {
        val first = math.max(0L, lo)
        val last = math.min(n, hi)
        val span = math.max(0L, last - first)
        val per = math.max(1L, (span + partitions - 1) / partitions)
        (first until last by per)
          .map(start => VectorRange(start, math.min(start + per, last), dim, seed))
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        if (pushedAggs.nonEmpty) {
          // one O(1) partial row per planned range: count/min/max are
          // functions of the bounds, not of generated rows
          val kinds = pushedAggs.map {
            case _: CountStar => 'c'
            case _: Min => 'n'
            case _ => 'x'
          }.toArray
          return (partition: InputPartition) => {
            val r = partition.asInstanceOf[VectorRange]
            new PartitionReader[InternalRow] {
              private var emitted = false
              override def next(): Boolean = { val go = !emitted; emitted = true; go }
              override def get(): InternalRow = InternalRow.fromSeq(
                kinds.toIndexedSeq.map {
                  case 'c' => r.end - r.start
                  case 'n' => r.start
                  case _   => r.end - 1
                })
              override def close(): Unit = ()
            }
          }
        }
        val fields = required.fieldNames
        (partition: InputPartition) => {
          val r = partition.asInstanceOf[VectorRange]
          new PartitionReader[InternalRow] {
            private var id = r.start - 1
            override def next(): Boolean = { id += 1; id < r.end }
            override def get(): InternalRow = InternalRow.fromSeq(
              fields.map {
                case "vec_id" => id
                case "embedding" =>
                  ArrayData.toArrayData(VectorSource.vectorFor(id, r.dim, r.seed))
                case "label" => VectorSource.labelFor(id, r.seed)
              }.toIndexedSeq)
            override def close(): Unit = ()
          }
        }
      }

      /** MICRO_BATCH_READ: the same deterministic id space served as a
        * stream — offsets are positions in [0, n], each trigger admits the
        * next `rowsPerBatch` ids, and a batch's rows come from the SAME
        * row kernel and reader as the batch scan (an id yields identical
        * rows in either mode, any partitioning, any retry). Admission is
        * the proper [[SupportsAdmissionControl]] contract: `latestOffset`
        * is a pure function of the START offset Spark passes in (no
        * mutable cursor), so a query restarted from its checkpoint resumes
        * exactly at the committed position — proven by the
        * restart-from-checkpoint spec in VectorSourceSpec. It saturates at
        * n, so `processAllAvailable()` terminates — a bounded replay of an
        * unbounded-source contract, like a Kafka topic read end-to-end.
        */
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MicroBatchStream with SupportsAdmissionControl {
          override def initialOffset(): Offset = VectorOffset(0L)
          override def latestOffset(): Offset =
            throw new UnsupportedOperationException(
              "latestOffset(Offset, ReadLimit) should be called instead")
          override def getDefaultReadLimit: ReadLimit =
            ReadLimit.maxRows(rowsPerBatch)
          // Honors the limit Spark passes (the admission-control CONTRACT,
          // not just the default): Trigger.AvailableNow/Once may ask for
          // allAvailable and must get everything — answering with the
          // default pace there would commit a PARTIAL batch that a
          // terminating trigger reports as complete (silent data loss).
          private def capFor(s: Long, limit: ReadLimit): Long = limit match {
            case m: ReadMaxRows      => s + m.maxRows()
            case _: ReadAllAvailable => n
            case c: CompositeReadLimit =>
              c.getReadLimits.map(capFor(s, _)).min
            case _                   => s + rowsPerBatch
          }
          override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
            val s = start.asInstanceOf[VectorOffset].pos
            VectorOffset(math.min(n, capFor(s, limit)))
          }
          override def deserializeOffset(json: String): Offset =
            VectorOffset(json.trim.toLong)
          override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
            val s = start.asInstanceOf[VectorOffset].pos
            val e = end.asInstanceOf[VectorOffset].pos
            val span = math.max(0L, e - s)
            val per = math.max(1L, (span + partitions - 1) / partitions)
            (s until e by per)
              .map(st => VectorRange(st, math.min(st + per, e), dim, seed))
              .toArray
          }
          override def createReaderFactory(): PartitionReaderFactory =
            self.createReaderFactory()
          override def commit(end: Offset): Unit = ()
          override def stop(): Unit = ()
        }
    }
}

case class VectorRange(start: Long, end: Long, dim: Int, seed: Long) extends InputPartition

/** Stream offset = position in the id space, serialized as the bare
  * number (the checkpoint-log format).
  */
case class VectorOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}
