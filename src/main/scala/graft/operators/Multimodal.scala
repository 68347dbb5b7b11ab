package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, and a decode/feature-extract stage as a
  * partition-local transform.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[StubDecoder]]); the Spark-side
  * plumbing — binary schema, batched partition-local processing, fixed
  * feature shape — is real and tested. Swapping the stub for a JNI/codec
  * call changes nothing structurally.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, content: Array[Byte], media_type: String)
  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, features: Array[Float])

  /** STUB decoder: stands in for an image/audio codec. Deterministic so
    * the pipeline is testable; partition-local so a real decoder slots in
    * with the same batching shape. */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val len = r.content.length.toLong
      // ??? real codec goes here — fake dims/features from the bytes
      val width = (len % 640).toInt
      val height = (len * 7 % 480).toInt
      val feats = Array.tabulate(4)(i => ((len + i * 31) % 256).toFloat / 255f)
      MediaFeatures(r.doc_id, r.media_type, len, width, height, feats)
    }
  }

  /** documents.text reinterpreted as an opaque binary payload — the
    * binary-column ingestion path. */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"),
        lit("text/plain").as("media_type"))
      .as[MediaRecord]
  }

  /** Decode / feature-extract over partitions (the mapInPandas analog:
    * batched, partition-local, fixed output schema). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(StubDecoder.decode))
  }

  /** Oracle-checkable slice of the multimodal path: binary length, content
    * hash, and the stub "decode" dims (pure integer arithmetic → exact in
    * both engines). */
  val features = OracleQuery(
    "multimodal_features",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("byte_len", octet_length(col("text")).cast("long"))
        .select(
          col("doc_id"),
          col("byte_len"),
          md5(col("text")).as("content_hash"),
          (col("byte_len") % 640).cast("int").as("width"),
          (col("byte_len") * 7 % 480).cast("int").as("height"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
      |  md5(text) AS content_hash,
      |  CAST(octet_length(CAST(text AS BLOB)) % 640 AS INT) AS width,
      |  CAST(octet_length(CAST(text AS BLOB)) * 7 % 480 AS INT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin))

  /** Frame sampling (the video/audio frame-extraction analog): fixed
    * 64-char frames sampled every 256 chars of the payload, each frame
    * fingerprinted. The plumbing — per-record frame fan-out via
    * `explode(sequence(...))`, frame addressing arithmetic, per-frame
    * hash — is exactly what a real codec-backed sampler needs; only the
    * "decode" (here: substring) is the stub. Map-side only: no shuffle
    * until the final presentation sort. */
  val frameSample = {
    val frameLen = 64
    val stride = 256
    OracleQuery(
      "multimodal_framesample",
      (s, d) => {
        val doc = Tables.documents(s, d)
          .withColumn("len", length(col("text")))
          .withColumn("nframes",
            greatest(lit(1L), floor((col("len") - frameLen) / lit(stride.toDouble)) + 1L))
        doc
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0L), col("nframes") - 1)).as("frame_idx"))
          .withColumn("frame",
            col("text").substr(col("frame_idx") * stride + 1, lit(frameLen)))
          .select(col("doc_id"), col("frame_idx"),
            md5(col("frame")).as("frame_hash"),
            length(col("frame")).as("frame_len"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some(s"""SELECT doc_id, fi AS frame_idx,
        |       md5(substring(text, CAST(fi * $stride + 1 AS INT), $frameLen)) AS frame_hash,
        |       length(substring(text, CAST(fi * $stride + 1 AS INT), $frameLen)) AS frame_len
        |FROM (
        |  SELECT doc_id, text,
        |         unnest(generate_series(0,
        |           greatest(1, CAST(floor((length(text) - $frameLen) / $stride.0) AS BIGINT) + 1) - 1)) AS fi
        |  FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin))
  }

  /** Resize (the image-downscale analog on a 1-D payload): 4:1
    * nearest-neighbor stride sampling — keep the first of every 4 payload
    * positions — with the resized length and content hash as the audit
    * columns. The regex is the deterministic stand-in where a real
    * resampling codec would sit; per-row, map-side, linear. `[\s\S]`
    * instead of `.`: the engines' dot differ on line terminators (Java
    * excludes CR, NEL, LS, PS; RE2 excludes only LF), while the explicit
    * class matches EVERY character identically in both. */
  val resize = OracleQuery(
    "multimodal_resize",
    (s, d) => {
      val resized = regexp_replace(col("text"), "([\\s\\S])[\\s\\S]{0,3}", "$1")
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("orig_len"),
          length(resized).cast("long").as("resized_len"),
          md5(resized).as("resized_hash"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      |       CAST(length(text) AS BIGINT) AS orig_len,
      |       CAST(length(resized) AS BIGINT) AS resized_len,
      |       md5(resized) AS resized_hash
      |FROM (
      |  SELECT doc_id, text,
      |         regexp_replace(text, '([\s\S])[\s\S]{0,3}', '\1', 'g') AS resized
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin))

  val all: Seq[OracleQuery] = Seq(features, frameSample, resize)
}
