package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Protocol-level tests of the DSv2 atomic sink, driving the write API
  * directly (no Spark job) so the failure paths a job can't cheaply
  * simulate — aborted attempts, speculative duplicates, torn jobs — are
  * pinned one by one.
  */
class AtomicDirSinkSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  private def row(id: Long, s: String): InternalRow =
    InternalRow(id, org.apache.spark.unsafe.types.UTF8String.fromString(s))

  private def freshDir(): String =
    Files.createTempDirectory("graft_sink_spec").toString

  private def batchWrite(dir: String, truncate: Boolean = false) =
    new AtomicDirBatchWrite(schema, dir, truncate)

  private def factory(dir: String) =
    new AtomicDirWriterFactory(schema, dir)

  test("commit publishes exactly the committed attempts, manifest-listed") {
    val dir = freshDir()
    val f = factory(dir)
    val w0 = f.createWriter(0, 100L)
    w0.write(row(1, "a")); w0.write(row(2, "b"))
    val m0 = w0.commit()
    val w1 = f.createWriter(1, 101L)
    w1.write(row(3, "c"))
    val m1 = w1.commit()
    batchWrite(dir).commit(Array(m0, m1))

    assert(AtomicDirSink.manifest(dir) ==
      Seq(("part-00000.csv", 2L), ("part-00001.csv", 1L)))
    val lines = AtomicDirSink.manifest(dir).flatMap { case (n, _) =>
      Files.readAllLines(Paths.get(dir, n)).asScala }
    assert(lines.sorted == Seq("1,a", "2,b", "3,c"))
    // no staging leftovers
    assert(!Files.list(Paths.get(dir, ".staging")).iterator().hasNext)
  }

  test("speculative duplicate: only the winning attempt's file is published") {
    val dir = freshDir()
    val f = factory(dir)
    val win = f.createWriter(0, 200L)
    win.write(row(1, "winner"))
    val mWin = win.commit()
    // the loser attempt of the SAME partition aborts (speculation killed)
    val lose = f.createWriter(0, 201L)
    lose.write(row(1, "loser"))
    lose.abort()
    batchWrite(dir).commit(Array(mWin))

    val (name, n) = AtomicDirSink.manifest(dir).head
    assert(n == 1L)
    assert(Files.readAllLines(Paths.get(dir, name)).asScala == Seq("1,winner"))
    assert(!Files.list(Paths.get(dir, ".staging")).iterator().hasNext)
  }

  test("job abort deletes every staged attempt; nothing published") {
    val dir = freshDir()
    val f = factory(dir)
    val msgs = (0 to 2).map { p =>
      val w = f.createWriter(p, 300L + p)
      w.write(row(p.toLong, s"p$p"))
      w.commit()
    }
    batchWrite(dir).abort(msgs.toArray[WriterCommitMessage])
    assert(!Files.exists(Paths.get(dir, AtomicDirSink.ManifestName)))
    assert(!Files.list(Paths.get(dir, ".staging")).iterator().hasNext)
  }

  test("streaming: epochs accumulate; a replayed epoch commit is a no-op") {
    val dir = freshDir()
    val sw = new AtomicDirStreamingWrite(schema, dir)
    val f = new AtomicDirStreamingWriterFactory(schema, dir)
    val w0 = f.createWriter(0, 500L, epochId = 0L); w0.write(row(1, "e0"))
    sw.commit(0L, Array(w0.commit()))
    val w1 = f.createWriter(0, 501L, epochId = 1L); w1.write(row(2, "e1"))
    sw.commit(1L, Array(w1.commit()))
    assert(AtomicDirSink.manifest(dir).map(_._1) ==
      Seq("part-e00000-p00000.csv", "part-e00001-p00000.csv"))

    // micro-batch replay: epoch 1 re-runs and re-commits after a failure
    val wr = f.createWriter(0, 502L, epochId = 1L); wr.write(row(2, "e1-replay"))
    sw.commit(1L, Array(wr.commit()))
    assert(AtomicDirSink.manifest(dir).size == 2, "replayed epoch must not re-publish")
    assert(Files.readAllLines(Paths.get(dir, "part-e00001-p00000.csv")).asScala ==
      Seq("2,e1"), "original epoch-1 contents must survive the replay")
    assert(!Files.list(Paths.get(dir, ".staging")).iterator().hasNext)
  }

  test("time travel: every epoch-prefix snapshot is complete and consistent") {
    // protocol-level form of the declared stream_sink_time_travel query:
    // after 3 epoch commits, the files with epoch ≤ e are exactly epochs
    // 0..e — the "reader always sees a complete prefix" guarantee that
    // makes read-at-epoch a consistent snapshot
    val dir = freshDir()
    val sw = new AtomicDirStreamingWrite(schema, dir)
    val f = new AtomicDirStreamingWriterFactory(schema, dir)
    (0 to 2).foreach { e =>
      val w = f.createWriter(0, 600L + e, epochId = e.toLong)
      (0 to e).foreach(i => w.write(row(10L * e + i, s"e$e-r$i")))
      sw.commit(e.toLong, Array(w.commit()))
    }
    val entries = AtomicDirSink.manifest(dir)
    (0 to 2).foreach { bound =>
      val snap = entries.filter { case (n, _) => n.split("-")(1).drop(1).toInt <= bound }
      assert(snap.map(_._1).sorted ==
        (0 to bound).map(e => f"part-e$e%05d-p00000.csv"), s"bound=$bound")
      // row counts in the manifest are per-epoch truth: snapshot size is
      // the prefix sum — monotone, final == everything
      assert(snap.map(_._2).sum == (0 to bound).map(_ + 1).sum.toLong, s"bound=$bound")
    }
  }

  test("truncate replaces prior contents atomically at commit time") {
    val dir = freshDir()
    val f = factory(dir)
    val w = f.createWriter(0, 400L); w.write(row(1, "old"))
    batchWrite(dir).commit(Array(w.commit()))

    val f2 = factory(dir)
    val w2 = f2.createWriter(0, 401L); w2.write(row(2, "new"))
    batchWrite(dir, truncate = true).commit(Array(w2.commit()))

    assert(AtomicDirSink.manifest(dir) == Seq(("part-00000.csv", 1L)))
    assert(Files.readAllLines(Paths.get(dir, "part-00000.csv")).asScala == Seq("2,new"))
  }

  test("file stats land in the manifest; pruning skips disjoint files and keeps overlapping/statless ones") {
    val dir = freshDir()
    val f = factory(dir)
    // partition 0: ids 1..10, partition 1: ids 100..110, partition 2: all-NULL ids
    val w0 = f.createWriter(0, 500L); (1L to 10L).foreach(i => w0.write(row(i, s"a$i")))
    val w1 = f.createWriter(1, 501L); (100L to 110L).foreach(i => w1.write(row(i, s"b$i")))
    val w2 = f.createWriter(2, 502L)
    w2.write(InternalRow(null, org.apache.spark.unsafe.types.UTF8String.fromString("z")))
    batchWrite(dir).commit(Array(w0.commit(), w1.commit(), w2.commit()))

    val entries = AtomicDirSink.manifestEntries(dir)
    assert(entries.map(_.name) ==
      Seq("part-00000.csv", "part-00001.csv", "part-00002.csv"))
    assert(entries(0).stats(0) == ((1L, 10L)))
    assert(entries(1).stats(0) == ((100L, 110L)))
    assert(entries(2).stats.get(0).isEmpty) // all-NULL column: no stat

    // band [5, 50]: file 0 overlaps, file 1 is provably disjoint (skipped),
    // file 2 has no stats (kept — correctness first)
    assert(AtomicDirSink.prunedFiles(dir, 0, 5L, 50L) ==
      Seq("part-00000.csv", "part-00002.csv"))
    // full-range band keeps everything
    assert(AtomicDirSink.prunedFiles(dir, 0, Long.MinValue, Long.MaxValue).length == 3)
    // row counts unaffected by the stats suffix
    assert(AtomicDirSink.manifest(dir).map(_._2) == Seq(10L, 11L, 1L))
  }

  test("streaming epochs carry file stats too; pruning composes with time travel") {
    val dir = freshDir()
    val sw = new AtomicDirStreamingWrite(schema, dir)
    def epoch(e: Long, ids: Range): Unit = {
      val w = new AtomicDirStreamingWriterFactory(schema, dir).createWriter(0, 900L + e, e)
      ids.foreach(i => w.write(row(i.toLong, s"e$e-$i")))
      sw.commit(e, Array(w.commit()))
    }
    epoch(0, 1 to 5)
    epoch(1, 200 to 210)
    val entries = AtomicDirSink.manifestEntries(dir)
    assert(entries.map(_.stats(0)) == Seq((1L, 5L), (200L, 210L)))
    // a band over epoch 0's range prunes epoch 1's file — file skipping
    // works identically on epoch-scoped names
    assert(AtomicDirSink.prunedFiles(dir, 0, 1L, 10L) == Seq("part-e00000-p00000.csv"))
  }
}
