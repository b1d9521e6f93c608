package graft

/** Route the JVM's temp directory — where Spark places ad-hoc streaming
  * CHECKPOINTS (memory-sink queries without an explicit location) and its
  * shuffle/spill local dirs — onto tmpfs when the host has one.
  *
  * This is HARNESS placement, not engine semantics: the streaming floor for
  * a bounded feed is per-micro-batch state-store commit latency, and on
  * this box /tmp is ext4 while /dev/shm is RAM — the commit's
  * write+rename rounds are pure disk latency for kilobyte-sized state. A
  * production deployment sets real durable locations (`spark.local.dir`,
  * `checkpointLocation` on cluster storage) and never goes through this
  * path; checkpoint durability on tmpfs is exactly as strong as the
  * single-box /tmp default it replaces.
  */
object ScratchDirs {

  private def wipe(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
    f.delete(): Unit
  }

  /** Idempotent; call FIRST in a main, before the SparkSession builds. */
  def preferTmpfs(): Unit = synchronized {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite &&
        !sys.props.get("java.io.tmpdir").exists(_.startsWith("/dev/shm/"))) {
      val d = new java.io.File(shm, s"graft-tmp-${ProcessHandle.current().pid()}")
      if (d.mkdirs() || d.isDirectory) {
        sys.props("java.io.tmpdir") = d.getAbsolutePath
        Runtime.getRuntime.addShutdownHook(new Thread(() => wipe(d)))
      }
    }
  }
}
