package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star surface; BASELINE.json): media
  * payloads are opaque `BinaryType` columns with typed metadata, processed
  * per-partition in batches — the Spark-side shape a real image/audio
  * pipeline has (decode / feature-extract / resize in a vectorized UDF).
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (md5-derived pseudo-dimensions); the
  * schema, the per-partition batch iteration, the typed Encoder round-trip
  * and the partitioning are the real thing and are what get tested. Swap
  * [[decodeStub]] for a JNI/codec call and nothing else changes.
  *
  * The media "table" derives from `documents` (payload = UTF-8 bytes of
  * text) so the whole path is oracle-checkable in DuckDB.
  */
object MediaQueries {

  /** Typed media row: binary payload + metadata, as a real pipeline would
    * model an image/frame column. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], source: String)
  case class DecodedRow(doc_id: Long, payload_bytes: Long, width: Long,
                        height: Long, n_frames: Long, format: String)

  /** documents → media table: binary payload column + metadata. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      col("source"))

  /** STUB decode kernel — deterministic pseudo-decode of a payload.
    * Real implementation would call an image codec here; everything
    * around it (batching, schema, encoders) is production-shaped.
    * Math mirrors md5-60bit so the oracle can replicate it. */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    val width = 16L + h % 1280L
    val height = 16L + (h >> 11) % 720L
    val nFrames = 1L + (h >> 22) % 32L
    val format = if (h % 2 == 0) "png" else "jpeg"
    (width, height, nFrames, format)
  }

  /** The mapPartitions decode pass: one iterator pass per partition
    * (the Scala analogue of a vectorized/pandas UDF batch), typed
    * Encoders end-to-end. */
  def decode(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select(col("doc_id"), col("payload"), col("source")).as[MediaRow]
      .mapPartitions { it =>
        it.map { m =>
          val (w, h, f, fmt) = decodeStub(m.payload)
          DecodedRow(m.doc_id, m.payload.length.toLong, w, h, f, fmt)
        }
      }.toDF()
  }

  /** Oracle-checked query: media metadata + stub-decoded dimensions. */
  def mediaDecode(s: SparkSession, dir: String): DataFrame =
    decode(s, mediaTable(s, dir)).orderBy("doc_id")

  /** Frame sampling plan: every k-th frame index per media row —
    * the explode-side of a video pipeline (frame table with
    * (doc_id, frame_idx), partition-friendly). */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    mediaDecode(s, dir)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(8L)))
          .as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  case class FeatureRow(doc_id: Long, features: Array[Long])

  /** STUB feature-extraction kernel: k deterministic pseudo-features from
    * the payload hash (a real pipeline runs the image model here; the
    * mapPartitions batch shape, typed Encoders and downstream plumbing are
    * the real thing). Integer-valued so the oracle comparison is exact. */
  val nFeatures = 8
  def featureStub(payload: Array[Byte]): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    Array.tabulate(nFeatures)(j => (h + j * 2654435761L) % 1000000007L)
  }

  /** Feature extraction over the media table — one iterator pass per
    * partition; features surfaced as a joined string (the persisted form
    * would be an array<float> column feeding SimilarityQueries' ANN). */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = mediaTable(s, dir)
      .select(col("doc_id"), col("payload"), col("source")).as[MediaRow]
      .mapPartitions(_.map(m => FeatureRow(m.doc_id, featureStub(m.payload))))
      .toDF()
    feats.select(col("doc_id"),
        concat_ws(",", transform(col("features"), _.cast("string")))
          .as("features"))
      .orderBy("doc_id")
  }

  /** Resize planning: fit each frame into a 224×224 box preserving aspect
    * ratio (integer math — the metadata half of a thumbnail pass; the
    * pixel kernel lives behind the same stub boundary as decode). */
  val fitBox = 224L
  def mediaResize(s: SparkSession, dir: String): DataFrame =
    mediaDecode(s, dir)
      .withColumn("long_side", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        when(col("long_side") <= fitBox, col("width"))
          .otherwise(floor(col("width") * fitBox / col("long_side")).cast("long"))
          .as("out_w"),
        when(col("long_side") <= fitBox, col("height"))
          .otherwise(floor(col("height") * fitBox / col("long_side")).cast("long"))
          .as("out_h"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_decode" -> (mediaDecode _),
    "media_frame_sample" -> (frameSample _),
    "media_features" -> (mediaFeatures _),
    "media_resize" -> (mediaResize _))

  private val decodedCte =
    """decoded AS (
      |  SELECT doc_id,
      |    CAST(octet_length(text::BLOB) AS BIGINT) AS payload_bytes,
      |    16 + h % 1280 AS width,
      |    16 + (h >> 11) % 720 AS height,
      |    1 + (h >> 22) % 32 AS n_frames,
      |    CASE WHEN h % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
      |  FROM (SELECT doc_id, text,
      |          ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
      |        FROM documents))""".stripMargin

  val oracles: Map[String, String] = Map(
    "media_decode" ->
      s"""WITH $decodedCte
         |SELECT doc_id, payload_bytes, width, height, n_frames, format
         |FROM decoded ORDER BY doc_id""".stripMargin,
    "media_features" ->
      s"""SELECT doc_id,
         |  array_to_string(list_transform(generate_series(0, ${nFeatures - 1}),
         |    j -> (h + j * 2654435761) % 1000000007), ',') AS features
         |FROM (SELECT doc_id,
         |        ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "media_resize" ->
      s"""WITH $decodedCte
         |SELECT doc_id, width, height,
         |  CASE WHEN greatest(width, height) <= $fitBox THEN width
         |       ELSE CAST(floor(width * $fitBox / greatest(width, height))
         |                 AS BIGINT) END AS out_w,
         |  CASE WHEN greatest(width, height) <= $fitBox THEN height
         |       ELSE CAST(floor(height * $fitBox / greatest(width, height))
         |                 AS BIGINT) END AS out_h
         |FROM decoded ORDER BY doc_id""".stripMargin,
    "media_frame_sample" ->
      s"""WITH $decodedCte
         |SELECT doc_id, unnest(generate_series(0, n_frames - 1, 8)) AS frame_idx
         |FROM decoded ORDER BY doc_id, frame_idx""".stripMargin)
}
