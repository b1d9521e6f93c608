package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 BATCH SINK with a real two-phase commit — the write-side
  * counterpart of [[VectorSource]], completing the connector surface
  * (read, micro-batch read, and now transactional write). The protocol is
  * the part production sinks get wrong, so it is the part this models
  * precisely:
  *  - every task writes to a PRIVATE staging file named by (partition,
  *    task attempt) — concurrent attempts of the same partition never
  *    collide;
  *  - `DataWriter.commit` hands the driver a [[StagedFile]] message; only
  *    the driver's `BatchWrite.commit` PUBLISHES, moving each staged file
  *    to its partition-named final file (`ATOMIC_MOVE`) — a retried task's
  *    loser attempt is never visible because only the winning attempt's
  *    message reaches commit;
  *  - readers trust ONLY the `_MANIFEST` (itself staged + atomically
  *    moved, written LAST): a crash between file moves and manifest
  *    publish leaves a readable-by-nobody directory, never a torn table;
  *  - `abort` deletes staged files — failed jobs leave no partial output.
  * Rows are CSV of primitive columns (the payload is deliberately simple;
  * the protocol is the point). At 100 TB the same protocol carries any
  * file format — this is exactly the commit dance FileOutputCommitter v1
  * / Iceberg-style manifest commits perform.
  */
class AtomicDirSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-atomic-dir"
  // Write-only source: the schema always comes from the query via getTable
  // (supportsExternalMetadata is what makes Spark pass it through).
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      props: java.util.Map[String, String]): Table =
    new AtomicDirTable(schema, props.get("path"))
}

object AtomicDirSink {
  val ManifestName = "_MANIFEST"

  /** One committed file as the manifest records it: name, rows, and the
    * per-column min/max stats (keyed by schema ordinal) the writer
    * collected for integral columns — the Iceberg-style file-level stats
    * that make manifest reads PRUNABLE without opening data files.
    */
  case class ManifestEntry(name: String, rows: Long, stats: Map[Int, (Long, Long)])

  /** Committed file names (with row counts) from the manifest — the ONLY
    * sanctioned way to enumerate the table's files.
    */
  def manifest(dir: String): Seq[(String, Long)] =
    manifestEntries(dir).map(e => (e.name, e.rows))

  /** Full manifest incl. file stats. Line format:
    * `name,rows[,colIdx:min:max ...]` — the stats fields are optional, so
    * v1 manifests (and epoch lines written before stats existed) parse
    * unchanged with empty stats (= unprunable, always read: safe).
    */
  def manifestEntries(dir: String): Seq[ManifestEntry] = {
    val p = Paths.get(dir, ManifestName)
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
      .map { line =>
        val parts = line.split(",")
        val stats = parts.drop(2).iterator.map { s =>
          val Array(i, mn, mx) = s.split(":", 3)
          i.toInt -> (mn.toLong, mx.toLong)
        }.toMap
        ManifestEntry(parts(0), parts(1).toLong, stats)
      }
  }

  /** File skipping on manifest stats: the files whose [min, max] range for
    * schema ordinal `colIdx` intersects [lo, hi]. Files without stats for
    * the column are KEPT (cannot prove them empty — correctness first).
    * This is the scan-planning half of lakehouse pruning: at 100 TB the
    * win is not reading 7/8ths of the data files at all, decided from a
    * manifest that is O(files), not O(rows).
    */
  def prunedFiles(dir: String, colIdx: Int, lo: Long, hi: Long): Seq[String] =
    manifestEntries(dir)
      .filter(_.stats.get(colIdx).forall { case (mn, mx) => mx >= lo && mn <= hi })
      .map(_.name)

  private[sources] def statsSuffix(stats: Seq[(Int, Long, Long)]): String =
    stats.map { case (i, mn, mx) => s",$i:$mn:$mx" }.mkString
}

class AtomicDirTable(schema0: StructType, path: String) extends Table with SupportsWrite {
  require(path != null, "graft-atomic-dir requires option 'path'")
  override def name(): String = s"graft-atomic-dir($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AtomicDirBatchWrite(info.schema(), path, doTruncate)
        override def toStreaming: streaming.StreamingWrite =
          new AtomicDirStreamingWrite(info.schema(), path)
      }
    }
}

/** Epoch-committed streaming form: same staging discipline per
  * micro-batch, with the two extra obligations streaming adds —
  *  - **epoch-scoped publish names** (`part-e<epoch>-p<partition>.csv`):
  *    a batch's files can never collide with another epoch's;
  *  - **idempotent epoch re-commit**: after a failure the engine may
  *    re-run and re-commit an epoch it already committed; if the manifest
  *    already lists this epoch the staged duplicates are DISCARDED, not
  *    published twice — the property that makes the sink exactly-once
  *    under micro-batch replay (the foreachBatch batchId convention,
  *    inside the connector).
  * The manifest is rewritten (staged + ATOMIC_MOVE) with prior epochs'
  * lines preserved, so a reader always sees a complete prefix of epochs.
  */
class AtomicDirStreamingWrite(schema: StructType, dir: String)
    extends streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    new AtomicDirStreamingWriterFactory(schema, dir)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val manifestPath = d.resolve(AtomicDirSink.ManifestName)
    val prior: Seq[String] =
      if (Files.exists(manifestPath))
        Files.readAllLines(manifestPath, StandardCharsets.UTF_8).asScala.toSeq
      else Seq.empty
    val epochPrefix = f"part-e$epochId%05d-"
    if (prior.exists(_.startsWith(epochPrefix))) {
      // epoch already committed — replay: drop the duplicate attempt
      abort(epochId, messages)
      return
    }
    val published = messages.toSeq.map { case sf: StagedFile =>
      val name = f"${epochPrefix}p${sf.partitionId}%05d.csv"
      Files.move(Paths.get(sf.stagedPath), d.resolve(name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      s"$name,${sf.rows}" + AtomicDirSink.statsSuffix(sf.stats)
    }
    val tmp = d.resolve(s".${AtomicDirSink.ManifestName}.tmp")
    Files.write(tmp, (prior ++ published.sorted).asJava, StandardCharsets.UTF_8,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, manifestPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case sf: StagedFile => Files.deleteIfExists(Paths.get(sf.stagedPath))
      case _                        => ()
    }
}

/** Commit message: the staged file a task attempt wrote, its rows, and
  * the integral-column min/max stats gathered during the write (schema
  * ordinal, min, max) — columns that stayed all-NULL are omitted.
  */
case class StagedFile(stagedPath: String, partitionId: Int, rows: Long,
    stats: Seq[(Int, Long, Long)] = Nil)
    extends WriterCommitMessage

class AtomicDirBatchWrite(schema: StructType, dir: String, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AtomicDirWriterFactory(schema, dir)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    if (truncate) {
      Files.list(d).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-") ||
          p.getFileName.toString == AtomicDirSink.ManifestName)
        .foreach(Files.delete)
    }
    val published = messages.toSeq.map { case sf: StagedFile =>
      val name = f"part-${sf.partitionId}%05d.csv"
      Files.move(Paths.get(sf.stagedPath), d.resolve(name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      s"$name,${sf.rows}" + AtomicDirSink.statsSuffix(sf.stats)
    }
    // Manifest LAST, itself staged-then-moved: publish is atomic.
    val tmp = d.resolve(s".${AtomicDirSink.ManifestName}.tmp")
    Files.write(tmp,
      published.sorted.asJava,
      StandardCharsets.UTF_8,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, d.resolve(AtomicDirSink.ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case sf: StagedFile => Files.deleteIfExists(Paths.get(sf.stagedPath))
      case _                        => ()
    }
}

class AtomicDirStreamingWriterFactory(schema: StructType, dir: String)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new AtomicDirWriterFactory(schema, dir).createWriter(partitionId, taskId)
}

class AtomicDirWriterFactory(schema: StructType, dir: String) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val staging = {
        val s = Paths.get(dir, ".staging")
        Files.createDirectories(s)
        s.resolve(s"attempt-$partitionId-$taskId.csv")
      }
      private val out = Files.newBufferedWriter(staging, StandardCharsets.UTF_8,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      private var n = 0L
      // file-level min/max stats for integral columns (manifest pruning);
      // gathered inline — one compare pair per integral cell, no extra pass
      private val statIdx: Array[Int] = schema.fields.zipWithIndex.collect {
        case (f, i) if f.dataType == LongType || f.dataType == IntegerType => i
      }
      private val statMin = Array.fill(statIdx.length)(Long.MaxValue)
      private val statMax = Array.fill(statIdx.length)(Long.MinValue)

      private val getters: Array[InternalRow => String] =
        schema.fields.zipWithIndex.map { case (f, i) =>
          f.dataType match {
            case LongType    => (r: InternalRow) => if (r.isNullAt(i)) "" else r.getLong(i).toString
            case IntegerType => (r: InternalRow) => if (r.isNullAt(i)) "" else r.getInt(i).toString
            case DoubleType  => (r: InternalRow) => if (r.isNullAt(i)) "" else r.getDouble(i).toString
            case StringType  => (r: InternalRow) => if (r.isNullAt(i)) "" else r.getUTF8String(i).toString
            case other => throw new IllegalArgumentException(
              s"graft-atomic-dir supports primitive columns only, got $other")
          }
        }

      override def write(row: InternalRow): Unit = {
        out.write(getters.map(_(row)).mkString(","))
        out.write("\n")
        var k = 0
        while (k < statIdx.length) {
          val i = statIdx(k)
          if (!row.isNullAt(i)) {
            val v = schema.fields(i).dataType match {
              case LongType => row.getLong(i)
              case _        => row.getInt(i).toLong
            }
            if (v < statMin(k)) statMin(k) = v
            if (v > statMax(k)) statMax(k) = v
          }
          k += 1
        }
        n += 1
      }

      override def commit(): WriterCommitMessage = {
        out.close()
        val stats = statIdx.indices.collect {
          case k if statMin(k) <= statMax(k) => (statIdx(k), statMin(k), statMax(k))
        }
        StagedFile(staging.toString, partitionId, n, stats.toSeq)
      }

      override def abort(): Unit = {
        out.close()
        Files.deleteIfExists(staging)
      }

      override def close(): Unit = ()
    }
}
