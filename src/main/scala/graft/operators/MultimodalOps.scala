package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Decoded (stubbed) per-media features. Width/height/duration come from
  * the STUB decoder below — deterministic fakes, not real codec output.
  */
case class MediaFeatures(
    doc_id: Long,
    mime: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    duration_ms: Long,
    byte_mean: Double)

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus a decode/feature-extract stage (SURVEY/builder north
  * star: "multimodal columns").
  *
  * The media table is derived deterministically from the `documents`
  * fixture (content = UTF-8 bytes of `text`, mime assigned by doc_id) —
  * the container has no image/audio codecs and no binary fixture, so the
  * DECODE STEP IS A STUB: `decodeStub` fabricates width/height/duration
  * from the content hash. Everything around it — binary schema, batch
  * shape, partition-parallel decode via mapPartitions, typed Dataset
  * output — is the real Spark plumbing a production decoder (or a
  * `mapInPandas`/`mapInArrow` Python UDF) would plug into, and is tested.
  *
  * Scale posture: decode is embarrassingly parallel per partition; binary
  * payloads never shuffle (feature extraction happens before any
  * aggregation), and metadata-only queries never read `content` thanks to
  * parquet column pruning.
  */
object MultimodalOps {

  /** The media table: (doc_id, mime, content: binary, n_bytes, content_hash). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        expr("CASE WHEN doc_id % 3 = 0 THEN 'image/png' " +
          "WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END").as("mime"),
        col("text").cast("binary").as("content"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_hash"))
  }

  /** STUB decoder — deterministic fake in place of a real codec.
    * A production build replaces the body with e.g. javax.imageio /
    * ffmpeg bindings; the signature (bytes in, features out, executed
    * per-partition with no driver involvement) is the real contract.
    */
  def decodeStub(mime: String, content: Array[Byte]): (Int, Int, Long) = {
    // ??? <- real decode goes here; deterministic fake below
    val h = java.util.Arrays.hashCode(content)
    val w = 16 + math.abs(h % 1024)
    val ht = 16 + math.abs((h / 1024) % 1024)
    val dur = if (mime.startsWith("image")) 0L else 1000L + math.abs(h.toLong % 60000L)
    (w, ht, dur)
  }

  /** STUB resize — a real implementation rescales pixel buffers; the fake
    * deterministically re-derives dimensions capped to the target box,
    * preserving the decode contract (bytes + params in, features out).
    */
  def resizeStub(mime: String, content: Array[Byte], maxW: Int, maxH: Int): (Int, Int) = {
    // ??? <- real rescale goes here; deterministic fake below
    val (w, h, _) = decodeStub(mime, content)
    val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
  }

  /** STUB frame sampling — a real implementation seeks keyframes; the fake
    * slices `n` evenly-spaced byte windows, which exercises the real
    * plumbing (per-frame rows exploded from one media row, bounded output).
    */
  def frameSampleStub(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
    // ??? <- real keyframe extraction goes here; deterministic fake below
    if (content.isEmpty || n <= 0) Seq.empty
    else {
      val win = math.max(1, content.length / n)
      (0 until math.min(n, content.length)).map { i =>
        val start = i * win
        content.slice(start, math.min(start + win, content.length))
      }.filter(_.nonEmpty)
    }
  }

  /** Frames table: one row per sampled frame (video/audio only), with a
    * per-frame hash — the shape a frame-level feature extractor consumes.
    * Binary payloads stay where they are; only (doc_id, frame_no, hash)
    * leave the partition.
    */
  def frameFeatures(spark: SparkSession, sfDir: String, nFrames: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("mime"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.filter(!_._2.startsWith("image")).flatMap { case (id, mime, bytes) =>
          frameSampleStub(bytes, nFrames).zipWithIndex.map { case (frame, i) =>
            (id, mime, i.toLong, frame.length.toLong,
              java.security.MessageDigest.getInstance("MD5").digest(frame)
                .map("%02x".format(_)).mkString)
          }
        }
      }
      .toDF("doc_id", "mime", "frame_no", "frame_bytes", "frame_hash")
  }

  /** Partition-parallel decode + feature extraction into a typed Dataset. */
  def decodeFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("mime"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mime, bytes) =>
          val (w, h, dur) = decodeStub(mime, bytes)
          val mean = if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
          MediaFeatures(id, mime, bytes.length.toLong, w, h, dur, mean)
        }
      }
  }

  /** V+: metadata aggregate per mime type — the oracled query (binary
    * length/hash plumbing; the stub-decoded fields stay out of the oracle).
    */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    mediaTable(spark, sfDir)
      .groupBy(col("mime"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("content_hash")).as("n_distinct_content"),
        min(col("content_hash")).as("min_hash"))
      .orderBy(col("mime"))
  }
}
