package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
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

  override def name(): String = s"graft-vectors(n=$n, dim=$dim, seed=$seed)"
  override def schema(): StructType = VectorSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = VectorSource.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1L, (n + partitions - 1) / partitions)
        (0L until n by per)
          .map(start => VectorRange(start, math.min(start + per, n), dim, seed))
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val r = partition.asInstanceOf[VectorRange]
          new PartitionReader[InternalRow] {
            private var id = r.start - 1
            override def next(): Boolean = { id += 1; id < r.end }
            override def get(): InternalRow = InternalRow(
              id,
              ArrayData.toArrayData(VectorSource.vectorFor(id, r.dim, r.seed)),
              VectorSource.labelFor(id, r.seed))
            override def close(): Unit = ()
          }
        }
    }
}

case class VectorRange(start: Long, end: Long, dim: Int, seed: Long) extends InputPartition
