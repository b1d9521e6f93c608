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
