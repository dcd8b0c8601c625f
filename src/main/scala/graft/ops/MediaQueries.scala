package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * The GENERIC media surface (`media_decode` / `media_frame_sample` /
  * `media_features` / `media_resize`) runs a MIXED-FORMAT table of real
  * encoded payloads (PNG / WAV / BMP, one per document, format chosen by
  * doc_id) through magic-byte sniffing ([[sniffFormat]]) into the real
  * codecs — no pseudo-decode anywhere (the round-8 md5 stubs are gone).
  * Formats a JVM genuinely cannot decode (video containers, model-based
  * featurizers) are simply absent from the table rather than faked; the
  * dispatch in [[decodeAny]] is the documented seam where a JNI-backed
  * codec would slot in, with schema/batching/Encoders unchanged.
  *
  * Payload CONTENT is synthesized from deterministic integer ramps over
  * doc_id/n_chars, so every decoded dimension, sample statistic and
  * histogram is recomputable by the DuckDB oracle in pure SQL while the
  * bytes on the wire are genuine compressed/container formats.
  */
object MediaQueries {

  /** Typed media row: binary payload + metadata, as a real pipeline would
    * model an image/audio column. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], source: String)

  /** Unified decode output: images fill width/height (one frame), audio
    * fills n_samples/duration_ms and chunks into fixed
    * [[audioFrameLen]]-sample frames. `checksum` is the format's exact
    * decoded-payload digest (sum of blue bytes / sum of |PCM samples|) —
    * integer-exact, so the oracle recomputes it from the synthesis
    * arithmetic and a decoder that skipped the pixel/PCM walk fails the
    * hash. */
  case class MediaMeta(doc_id: Long, format: String, width: Long,
                       height: Long, n_frames: Long, n_samples: Long,
                       duration_ms: Long, checksum: Long)

  /** Audio analysis-frame length: 64 samples = 8 ms at the 8 kHz synth
    * rate (sized so the synthetic corpus's 44-577-sample clips span 1-10
    * frames). */
  val audioFrameLen = 64L
  /** Every k-th frame survives [[frameSample]]. */
  val frameStep = 4L

  /** documents → media table with REAL encoded payloads: PNG for
    * doc_id ≡ 0 (mod 3), WAV (n_chars samples) for ≡ 1, BMP for ≡ 2 —
    * every byte string a spec-complete file produced by this object's
    * encoders. The format is deliberately NOT carried as a column:
    * downstream operators must sniff it from the bytes, like a pipeline
    * fed a mixed object-store bucket. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"), col("source"))
      .as[(Long, Long, String)]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { case (id, n, src) =>
          val payload = (id % 3) match {
            case 0 => encodePng(id)
            case 1 => encodeWav(id, n.toInt)
            case _ => encodeBmp(id)
          }
          MediaRow(id, payload, src)
        }
      }.toDF()
  }

  /** Container sniffing from magic bytes — the dispatch a mixed-format
    * pipeline runs before choosing a codec. */
  def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E') "wav"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else "unknown"

  /** Format-dispatching REAL decode: sniff the container, run the
    * matching codec ([[decodePng]] / [[decodeWav]] / [[decodeBmp]]).
    * This dispatch is the extension seam for codecs a JVM lacks: a video
    * container would add a case calling out to JNI, with the schema and
    * batch shape unchanged. */
  def decodeAny(id: Long, payload: Array[Byte]): MediaMeta =
    sniffFormat(payload) match {
      case "png" =>
        val m = decodePng(id, payload)
        MediaMeta(id, "png", m.width, m.height, 1L, 0L, 0L, m.sum_blue)
      case "bmp" =>
        val m = decodeBmp(id, payload)
        MediaMeta(id, "bmp", m.width, m.height, 1L, 0L, 0L, m.sum_blue)
      case "wav" =>
        val m = decodeWav(id, payload)
        MediaMeta(id, "wav", 0L, 0L,
          (m.n_samples + audioFrameLen - 1) / audioFrameLen,
          m.n_samples, m.duration_ms, m.sum_abs)
      case other =>
        throw new IllegalArgumentException(s"doc $id: unknown container $other")
    }

  /** The mapPartitions decode pass: one iterator pass per partition (the
    * Scala analogue of a vectorized/pandas UDF batch), typed Encoders
    * end-to-end, REAL codecs in the kernel. */
  def decode(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select(col("doc_id"), col("payload"), col("source")).as[MediaRow]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map(m => decodeAny(m.doc_id, m.payload))
      }.toDF()
  }

  /** Oracle-checked query: the mixed-format media table through the
    * format-sniffing real-codec decode dispatch. */
  def mediaDecode(s: SparkSession, dir: String): DataFrame =
    // sortWithinPartitions: comparator sorts rows; a global orderBy would
    // re-run the map-only pipeline for range-bound sampling (round-16)
    decode(s, mediaTable(s, dir)).sortWithinPartitions("doc_id")

  /** Frame sampling from REAL decoded metadata: every [[frameStep]]-th
    * frame per media row — images contribute their single frame, audio
    * one frame per [[audioFrameLen]]-sample window (the explode-side of
    * a frame pipeline: a (doc_id, frame_idx) table, partition-friendly).
    * A zero-sample clip carries no frames, hence the guard (Spark's
    * `sequence` rejects an empty descending range). */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    mediaDecode(s, dir)
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("format"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(frameStep)))
          .as("frame_idx"))
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id", "frame_idx")

  case class FeatureRow(doc_id: Long, format: String, features: String)

  /** REAL feature kernel: an 8-bin histogram over the DECODED payload —
    * pixel intensity for images, PCM amplitude (offset to unsigned
    * 16-bit range) for audio. Integer-exact, so the oracle recomputes
    * every bin from the synthesis ramps. Features surface as a joined
    * string (the persisted form would be an array<float> column feeding
    * SimilarityQueries' ANN; the comparator can't sort array columns). */
  def featuresAny(id: Long, payload: Array[Byte]): FeatureRow = {
    val hist = new Array[Long](histBins)
    val fmt = sniffFormat(payload)
    fmt match {
      case "png" =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            hist((img.getRGB(x, y) & 0xff) * histBins / 256) += 1
            x += 1
          }
          y += 1
        }
      case "bmp" =>
        decodeBmp(id, payload, v => hist(v * histBins / 256) += 1)
      case "wav" =>
        decodeWav(id, payload, v => hist((v + 32768) * histBins / 65536) += 1)
      case other =>
        throw new IllegalArgumentException(s"doc $id: unknown container $other")
    }
    FeatureRow(id, fmt, hist.mkString(","))
  }

  /** Feature extraction over the mixed-format media table — one iterator
    * pass per partition, real decode in the kernel. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("payload"), col("source")).as[MediaRow]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map(m => featuresAny(m.doc_id, m.payload))
      }.toDF()
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
  }

  case class ResampleRow(doc_id: Long, format: String, in_w: Long,
                         in_h: Long, out_w: Long, out_h: Long,
                         in_samples: Long, out_samples: Long,
                         in_checksum: Long, out_checksum: Long)

  /** Format-dispatching REAL resize/resample: images decode and scale
    * into a [[resizeBox]]-box with bilinear interpolation (out dims are
    * exact integer aspect-fit; the interpolated pixel VALUES are
    * JVM-interpolator-specific, so image `out_checksum` is 0 and the
    * mean-preservation bound is pinned per-JVM in OpsSpec — round-8
    * advice: never oracle-pin an approximation flag); audio decimates by
    * 2 — keep every even-index sample, the integer-exact half-rate
    * resample — so BOTH wav checksums are oracle-checked. */
  def resampleAny(id: Long, payload: Array[Byte]): ResampleRow =
    sniffFormat(payload) match {
      case fmt @ ("png" | "bmp") =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        val w = img.getWidth
        val h = img.getHeight
        val longSide = math.max(w, h).toLong
        val (ow, oh) =
          if (longSide <= resizeBox) (w.toLong, h.toLong)
          else (w * resizeBox / longSide, h * resizeBox / longSide)
        bilinearResize(img, ow.toInt, oh.toInt) // the real kernel runs
        var inSum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { inSum += img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        ResampleRow(id, fmt, w.toLong, h.toLong, ow, oh, 0L, 0L, inSum, 0L)
      case "wav" =>
        var i = 0L
        var outSum = 0L
        val m = decodeWav(id, payload, v => {
          if (i % 2 == 0) outSum += math.abs(v.toLong)
          i += 1
        })
        ResampleRow(id, "wav", 0L, 0L, 0L, 0L, m.n_samples,
          (m.n_samples + 1) / 2, m.sum_abs, outSum)
      case other =>
        throw new IllegalArgumentException(s"doc $id: unknown container $other")
    }

  /** Resize/resample the mixed-format media table with the real kernels. */
  def mediaResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("payload"), col("source")).as[MediaRow]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map(m => resampleAny(m.doc_id, m.payload))
      }.toDF()
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
  }

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
  def encodeWav(docId: Long, nSamples: Int): Array[Byte] =
    encodeWavSamples(nSamples, i => ((docId * 31 + i) % 256 - 128).toInt)

  /** The WAV writer behind [[encodeWav]], generalized over the sample
    * source like [[encodeBmpPixels]] (the audio-fingerprint fixtures
    * encode TEXTURED sample streams through the same real container). */
  def encodeWavSamples(nSamples: Int, sample: Int => Int): Array[Byte] = {
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
      bb.putShort(sample(i).toShort)
      i += 1
    }
    bb.array()
  }

  /** REAL decode: validate the RIFF/WAVE container, WALK the chunk list
    * (not fixed offsets — handles extra chunks like LIST/fact), parse the
    * fmt block, then stream the PCM samples for the payload stats. This
    * is a genuine spec-compliant reader — point it at a recorded WAV and
    * it returns that file's true metadata. `onSample` sees each decoded
    * PCM value in stream order (the seam the histogram featurizer and
    * the decimating resampler hook into). */
  def decodeWav(docId: Long, bytes: Array[Byte],
                onSample: Int => Unit = _ => ()): WavMeta = {
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
    var sawData = false
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
          sawData = true
          var i = 0L
          while (i < nSamples * channels) {
            val v = bb.getShort.toInt
            sumAbs += math.abs(v.toLong)
            onSample(v)
            i += 1
          }
        case _ => () // skip LIST/fact/etc.
      }
      bb.position(next.min(bytes.length))
    }
    // a foreign WAV with rate=0 (or no fmt/data chunk at all) must fail
    // with the parser's clean contract error, not ArithmeticException on
    // the duration division (round-8 advice)
    require(sawData, "no data chunk in WAVE form")
    require(rate > 0, s"invalid sample_rate $rate in fmt chunk")
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
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
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
    encodeBmpPixels(w, h, i => ((docId + i) % 256).toInt)
  }

  /** The BMP writer behind [[encodeBmp]], generalized over the pixel
    * source (`px` takes the top-down row-major index) so the phash
    * fixtures can encode TEXTURED pixmaps through the same real codec. */
  def encodeBmpPixels(w: Int, h: Int, px: Int => Int): Array[Byte] = {
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
        val v = (px(row * w + x) & 0xff).toByte
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
    * fixed-layout fake would break on any stride ≠ 3w file). `onBlue`
    * sees each pixel's blue byte in top-down row-major order (the
    * histogram featurizer's hook). */
  def decodeBmp(docId: Long, bytes: Array[Byte],
                onBlue: Int => Unit = _ => ()): BmpMeta = {
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
      while (x < w) {
        val v = bytes(base + 3 * x) & 0xff
        sumBlue += v
        onBlue(v)
        x += 1
      }
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
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
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
    val w = (8 + docId % 9).toInt
    val h = (8 + docId % 7).toInt
    encodePngPixels(w, h, i => ((docId + i) % 256).toInt)
  }

  /** The PNG writer behind [[encodePng]], generalized over the pixel
    * source like [[encodeBmpPixels]]. */
  def encodePngPixels(w: Int, h: Int, px: Int => Int): Array[Byte] = {
    imageIoNoDiskCache()
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = px(i) & 0xff
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
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
  }

  case class JpegMeta(doc_id: Long, width: Long, height: Long,
                      n_pixels: Long)

  /** LOSSY codec path — real JPEG (DCT + quantization + huffman) through
    * the JDK encoder/decoder. Dimensions survive exactly and the oracle
    * pins only them; the decoded-mean error bound ([[jpegMeanTolerance]],
    * measured headroom ~4×) is asserted per-JVM in OpsSpec via
    * [[jpegProbe]] — round-8 advice: an oracle-pinned approximation flag
    * couples the correctness gate to one JVM's quantization tables. */
  val jpegMeanTolerance = 16.0

  /** JPEG round-trip kernel: synthesized image → JPEG encode → decode.
    * Returns (width, height, |decoded mean blue − synthesized mean|). */
  def jpegProbe(id: Long): (Long, Long, Double) = {
    imageIoNoDiskCache()
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encodePng(id)))
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
    (w.toLong, h.toLong, math.abs(sum.toDouble / n - expected))
  }

  def mediaJpegDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, _) = jpegProbe(id) // the real lossy codec runs
        JpegMeta(id, w, h, w * h)
      })
      .toDF()
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
  }

  case class ResizeMeta(doc_id: Long, width: Long, height: Long,
                        out_w: Long, out_h: Long)

  /** Graphics2D bilinear scale into (ow, oh) — the REAL pixel kernel
    * behind [[mediaResizeReal]] and the generic [[mediaResize]]. */
  def bilinearResize(img: java.awt.image.BufferedImage,
                     ow: Int, oh: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(
      java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, ow, oh, null)
    g.dispose()
    out
  }

  def meanBlue(b: java.awt.image.BufferedImage): Double = {
    var s = 0L
    for (y <- 0 until b.getHeight; x <- 0 until b.getWidth)
      s += b.getRGB(x, y) & 0xff
    s.toDouble / (b.getWidth * b.getHeight)
  }

  /** REAL pixel resize: decode the synthesized PNG, scale it into a
    * [[resizeBox]]-box with [[bilinearResize]]. Output dims pin exactly
    * in the oracle (integer aspect-fit math); the mean-preservation
    * bound ([[resizeMeanTolerance]]) is asserted per-JVM in OpsSpec via
    * [[resizeProbe]] — round-8 advice: never oracle-pin a bound flag
    * that depends on one JVM's interpolator. */
  val resizeBox = 12L
  val resizeMeanTolerance = 24.0

  /** Resize kernel probe: (width, height, out_w, out_h,
    * |resized mean blue − original mean blue|). */
  def resizeProbe(id: Long): (Long, Long, Long, Long, Double) = {
    imageIoNoDiskCache()
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encodePng(id)))
    val w = img.getWidth
    val h = img.getHeight
    val longSide = math.max(w, h).toLong
    val (ow, oh) =
      if (longSide <= resizeBox) (w.toLong, h.toLong)
      else (w * resizeBox / longSide, h * resizeBox / longSide)
    val out = bilinearResize(img, ow.toInt, oh.toInt)
    (w.toLong, h.toLong, ow, oh, math.abs(meanBlue(out) - meanBlue(img)))
  }

  def mediaResizeReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, ow, oh, _) = resizeProbe(id) // the real kernel runs
        ResizeMeta(id, w, h, ow, oh)
      })
      .toDF()
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
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
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
  }

  // ---- perceptual hashing / multimodal dedup ---------------------------

  /** dHash geometry: an 11×6 sample grid → 10 horizontal gradient bits ×
    * 6 rows = 60 bits — 60, not the textbook 64, for the same reason as
    * [[DedupQueries.simhashBits]]: a 60-bit hash stays non-negative in a
    * BIGINT on BOTH engines (bit 63 would sign-flip Spark's LongType and
    * overflow DuckDB's `sum(2^bit)` packing), and it splits into the
    * house 4×15-bit pigeonhole bands verbatim. */
  val phashGridW = 11
  val phashGridH = 6
  /** Verified near-dup threshold. Measured on the (xor-mixed) motif
    * fixture: same-motif pairs have hamming ≤ 5 at sf0.01 / ≤ 8 at
    * sf0.1 with mean ~1.4, cross-motif pairs mean ~32 — ≤ 4 keeps
    * 99.7% (sf0.01) / 98.9% (sf0.1) of true near-dups with zero
    * cross-motif accidentals at either sf. */
  val phashMaxHamming = 4

  /** Per-motif textured pixel (top-down row-major index `i`), shared by
    * the encoder and the DuckDB oracle: an XOR-SHIFT-mixed integer hash
    * so the gradient SIGNS are genuinely pseudo-random per (motif, i).
    * Two designs were measured and REJECTED on the x100 candidate
    * profile before this one (BASELINE.md round-13): the plain doc_id
    * ramp (monotone in i → every dHash near-all-ones → O(n²) pairs) and
    * a LINEAR multiplicative texture `(i+1)·(m·8191+127) mod 65521 mod
    * 256` — linear in i means the sign pattern is decided by the
    * multiplier's residue class, collapsing 60 nominal bits to ~2.5k
    * distinct values per 15-bit band at 41k motifs (max band df 2057;
    * 720M banded candidate pairs at x100, measured 376 s). The xor-mix
    * restores near-uniform bands (max df 29, 25M pairs — linear in the
    * corpus). Documents sharing a motif differ only at sparse perturbed
    * positions (i ≡ doc_id mod 97 → +128 gray flip), the "same image,
    * small edit" regime perceptual hashing exists for. */
  def texturePixel(motif: Long, docId: Long, i: Int): Int = {
    val x0 = (i + 1).toLong * 2654435761L + (motif + 1L) * 40503L
    val x = x0 ^ (x0 / 8192L)
    val v = (x % 256L).toInt
    if (i % 97 == (docId % 97).toInt) (v + 128) % 256 else v
  }

  /** Motif count for [[phashSigs]]: ~8 images per motif, floored at 25 —
    * sized from the corpus (one count(), the
    * [[SimilarityQueries.seedStrideOf]] precedent) so near-dup GROUP
    * size stays constant as the corpus grows and total near-dup pairs
    * scale LINEARLY (a fixed motif count would grow groups — and the
    * pair output — quadratically with the corpus). */
  def phashMotifs(nImages: Long): Long = math.max(25L, nImages / 8L)

  /** 60-bit dHash over a decoded grayscale pixmap: nearest-neighbor
    * sample the [[phashGridW]]×[[phashGridH]] grid, bit = left < right
    * per horizontal neighbor pair (Krawetz's difference hash — the
    * LAION-style perceptual dedup gate). Integer-exact: grid positions
    * are floor divisions, so the DuckDB oracle recomputes every bit from
    * the synthesis arithmetic. */
  def dhash60(w: Int, h: Int, px: Array[Int]): Long = {
    var bits = 0L
    var yi = 0
    while (yi < phashGridH) {
      val gy = yi * h / phashGridH
      var xi = 0
      while (xi < phashGridW - 1) {
        val l = px(gy * w + xi * w / phashGridW)
        val r = px(gy * w + (xi + 1) * w / phashGridW)
        if (l < r) bits |= 1L << (yi * (phashGridW - 1) + xi)
        xi += 1
      }
      yi += 1
    }
    bits
  }

  case class PhashMeta(doc_id: Long, format: String, width: Long,
                       height: Long, dhash: Long)

  /** The textured image table → REAL encoded bytes (PNG for doc_id ≡ 0
    * mod 3, BMP for ≡ 2; audio rows are a different modality — an
    * amplitude fingerprint, not a pixmap hash — and are excluded), then
    * REAL decode → grayscale pixmap → [[dhash60]]. Dimensions and
    * texture derive from the MOTIF (doc_id mod [[phashMotifs]]), so
    * same-motif documents are genuine near-duplicate images: same size,
    * same texture, sparse per-document pixel edits. */
  private def phashSigs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nImages = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 =!= 1).count()
    val nm = phashMotifs(nImages)
    Tables.documents(s, dir)
      .filter(col("doc_id") % 3 =!= 1)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { id =>
          val m = id % nm
          // dims STRICTLY WIDER than the sample grid: an image narrower
          // than the 11-col grid repeats sampled pixels, forcing
          // structurally-zero bits shared by every image of those dims
          // (part of the measured band-entropy collapse — see
          // [[texturePixel]])
          val w = (16 + m % 17).toInt
          val h = (8 + m % 9).toInt
          val bytes =
            if (id % 3 == 0) encodePngPixels(w, h, texturePixel(m, id, _))
            else encodeBmpPixels(w, h, texturePixel(m, id, _))
          // REAL decode back to the pixmap (blue channel = gray)
          val px = new Array[Int](w * h)
          if (id % 3 == 0) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            var i = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { px(i) = img.getRGB(x, y) & 0xff; x += 1; i += 1 }
              y += 1
            }
          } else {
            var i = 0
            decodeBmp(id, bytes, b => { px(i) = b; i += 1 })
          }
          PhashMeta(id, if (id % 3 == 0) "png" else "bmp",
            w.toLong, h.toLong, dhash60(w, h, px))
        }
      }.toDF()
  }

  /** Oracle-checked query: the perceptual signature table. */
  def mediaPhash(s: SparkSession, dir: String): DataFrame =
    // sortWithinPartitions: comparator sorts rows; a global orderBy would
    // re-run the map-only pipeline for range-bound sampling (round-16)
    phashSigs(s, dir).sortWithinPartitions("doc_id")

  /** JPEG re-encode at an explicit quality — the real lossy codec (DCT
    * + quantization + huffman) the cross-codec robustness face runs
    * through. Quality [[jpegPhashQuality]] ≈ the web-serving default. */
  def encodeJpeg(img: java.awt.image.BufferedImage,
                 quality: Float): Array[Byte] = {
    imageIoNoDiskCache()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  val jpegPhashQuality = 0.92f

  case class PhashJpegMeta(doc_id: Long, dhash: Long, dhash_jpeg: Long,
                           hamming: Long)

  /** CROSS-CODEC phash robustness — surviving lossy recompression is
    * the point of a perceptual hash (the same image re-served as JPEG
    * must land within the dedup threshold of its PNG original), and
    * until round 14 [[dhash60]] only ever saw lossless codecs. Per
    * image doc: motif-textured pixmap → REAL PNG encode → decode →
    * REAL JPEG re-encode ([[encodeJpeg]], quality
    * [[jpegPhashQuality]]) → decode → [[dhash60]] of the luma plane,
    * against the PNG-path hash. JPEG quantization is JVM-specific, so
    * the face is bench-only (the sketch-twin split): OpsSpec pins the
    * per-JVM bound — hamming(png, jpeg) ≤ [[phashMaxHamming]] for
    * ≥ 98% of images and ≤ [[jpegPhashWorst]] always (measured
    * headroom in the spec) — and the plumbing (map-only, one iterator
    * pass, two real codecs per row) is the production shape.
    * NOTE: the comparison samples the decoded JPEG's GREEN channel as
    * luma — JPEG converts to YCbCr and quantizes chroma hardest;
    * green carries ~59% of Y, so it is the stable plane (using blue,
    * the BMP convention elsewhere, doubles the tail hamming). */
  def mediaPhashJpeg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nImages = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 =!= 1).count()
    val nm = phashMotifs(nImages)
    Tables.documents(s, dir)
      .filter(col("doc_id") % 3 =!= 1)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { id =>
          val m = id % nm
          val w = (16 + m % 17).toInt
          val h = (8 + m % 9).toInt
          val png = encodePngPixels(w, h, texturePixel(m, id, _))
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          val jpg = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              encodeJpeg(img, jpegPhashQuality)))
          def gray(b: java.awt.image.BufferedImage): Array[Int] = {
            val px = new Array[Int](w * h)
            var i = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                px(i) = (b.getRGB(x, y) >> 8) & 0xff // green ~ luma
                x += 1; i += 1
              }
              y += 1
            }
            px
          }
          val hp = dhash60(w, h, gray(img))
          val hj = dhash60(w, h, gray(jpg))
          PhashJpegMeta(id, hp, hj, java.lang.Long.bitCount(hp ^ hj).toLong)
        }
      }.toDF().orderBy("doc_id")
  }

  /** PERCEPTUAL image dedup — the first gate a LAION-style multimodal
    * pipeline runs: near-dup image pairs via the exact
    * [[DedupQueries.dedupSimhash]] machinery over [[dhash60]] signatures
    * (4×15-bit pigeonhole bands → candidate equi-join → exact
    * `bit_count(xor)` verify ≤ [[phashMaxHamming]]). Same recall trade
    * as simhash: hamming ≤ 4 across 4 bands is not pigeonhole-guaranteed
    * a shared band; candidates are pairs agreeing on ≥ 1 band. Scale:
    * signature build is map-only real-codec work; the join is banded
    * equi-join with group sizes bounded by the motif design (~8) on the
    * fixture AND by [[maxBandDf]] in the plan — a degenerate band value
    * on a real corpus (all-black thumbnails) cannot regenerate the
    * round-13 720M-pair blowup. */
  def dedupMedia(s: SparkSession, dir: String): DataFrame =
    bandPairs(phashSigs(s, dir), "dhash").orderBy("a", "b")

  /** Document-frequency cap on band postings — the [[DedupQueries
    * .maxShingleDf]] rule applied to the media band join (round-13
    * verdict #1: the 720M-pair blowup that round's fixture fix
    * side-stepped must be impossible in the PLAN, because a real corpus
    * HAS degenerate perceptual classes — all-black thumbnails, silent
    * audio — whose band values go corpus-frequent). A band value held by
    * more than this many documents is dropped from candidate generation
    * entirely: per-key join work is then ≤ cap² (bounded, corpus-
    * independent), and the anti-join's broadcast side is provably
    * ≤ |postings|/cap keys. Recall cost: only pairs whose EVERY shared
    * band is over-cap lose their candidacy — on perceptual hashes that
    * is the near-constant junk class itself, which a curation pipeline
    * wants gated by a quality rule, not enumerated pairwise (measured:
    * MediaCapProbe — candidates stay linear with the cap, blow up
    * quadratically without; healthy-fixture pairs are IDENTICAL capped
    * vs uncapped since its max band df is ~29, MediaSpec pins this).
    * Sized ~10× the healthy fixture's max df and ~2.5× the minhash cap:
    * high enough that any genuinely near-dup GROUP (bounded by design)
    * keeps all its pairs, low enough that cap² per-key work stays
    * trivial. */
  val maxBandDf = 256
  private val bandCount = 4

  /** The shared banded near-dup pair join: 4×15-bit pigeonhole bands →
    * df-cap ([[maxBandDf]], broadcast anti-join — the
    * [[DedupQueries.invertedIndex]] shape) → candidate equi-join →
    * exact `bit_count(xor)` ≤ [[phashMaxHamming]] verify, over any
    * (doc_id, `hashCol`) signature table — the image, audio, and
    * cluster faces all call this one plan. `cap` is parameterized only
    * for MediaSpec's capped ≡ uncapped pin. */
  private[graft] def bandPairs(sigRaw: DataFrame, hashCol: String,
                               cap: Long = maxBandDf): DataFrame = {
    val chunkArr = array((0 until bandCount).map(c =>
      struct(lit(c).as("chunk"),
        (shiftright(col(hashCol), c * 15) % 32768).as("key"))): _*)
    // checkpoint the POSTINGS (not the sigs): they feed the df count,
    // the anti-join probe, and both sides of the candidate join
    val chunks = sigRaw
      .select(col("doc_id"), col(hashCol).as("h"), explode(chunkArr).as("ck"))
      .select(col("doc_id"), col("h"),
        col("ck.chunk").as("chunk"), col("ck.key").as("key"))
      .localCheckpoint()
    val drop = chunks.groupBy(col("chunk"), col("key"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > cap).select("chunk", "key")
    val kept = chunks.join(broadcast(drop), Seq("chunk", "key"), "left_anti")
    kept.as("x").join(kept.as("y"), Seq("chunk", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.h").as("ha"), col("y.h").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= phashMaxHamming)
      .select("a", "b", "hamming")
  }

  // ---- audio fingerprinting / audio dedup -------------------------------

  /** Textured PCM sample for the audio-fingerprint fixtures — the audio
    * twin of [[texturePixel]]: the same multiplicative hash, offset to
    * signed 8-bit amplitude (the mediaTable ramp is monotone-periodic —
    * its delta signs are near-constant, the same degeneracy the image
    * ramp had). Same-motif clips differ only at sparse perturbed sample
    * positions. */
  def textureSample(motif: Long, docId: Long, i: Int): Int =
    texturePixel(motif, docId, i) - 128

  /** Clip length per motif: 64–256 samples (1–4 analysis frames at the
    * synth rate) — derived from the MOTIF so same-motif clips align. */
  def audioFpSamples(motif: Long): Int = 64 + (motif % 193).toInt

  /** 60-bit amplitude-envelope fingerprint over a decoded PCM stream:
    * nearest-neighbor sample 61 positions, bit = sign of the successive
    * delta — the Haitsma–Kalker audio-fingerprint scheme (ISMIR'02:
    * sign of energy differences across frames) reduced to the amplitude
    * envelope; 60 bits for the same BIGINT/band reasons as [[dhash60]].
    * A real deployment would fingerprint band energies from an FFT —
    * that swaps the sampled SIGNAL, not this operator's shape. */
  def audioFp60(n: Int, pcm: Array[Int]): Long = {
    var bits = 0L
    var j = 0
    while (j < 60) {
      val l = pcm(j * n / 61)
      val r = pcm((j + 1) * n / 61)
      if (l < r) bits |= 1L << j
      j += 1
    }
    bits
  }

  case class AudioFpMeta(doc_id: Long, n_samples: Long, afp: Long)

  /** Textured audio → REAL WAV bytes → REAL chunk-walking decode →
    * [[audioFp60]] — the audio rows (doc_id ≡ 1 mod 3) [[phashSigs]]
    * excludes, fingerprinted by their own modality's kernel. Same motif
    * design: ~8 clips per motif, corpus-scaled motif count. */
  private def audioSigs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nAudio = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 1).count()
    val nm = phashMotifs(nAudio)
    Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val m = id % nm
        val n = audioFpSamples(m)
        val bytes = encodeWavSamples(n, textureSample(m, id, _))
        val pcm = new Array[Int](n)
        var i = 0
        decodeWav(id, bytes, v => { pcm(i) = v; i += 1 })
        AudioFpMeta(id, n.toLong, audioFp60(n, pcm))
      }).toDF()
  }

  /** Oracle-checked query: the audio fingerprint table. */
  def mediaAudioFp(s: SparkSession, dir: String): DataFrame =
    // sortWithinPartitions: comparator sorts rows; a global orderBy would
    // re-run the map-only pipeline for range-bound sampling (round-16)
    audioSigs(s, dir).sortWithinPartitions("doc_id")

  /** The textured MULTIMODAL payload table (doc_id, payload) — the
    * ingest-stream face of the [[phashSigs]]/[[audioSigs]] fixtures:
    * identical motif arithmetic and REAL encoded bytes (PNG/BMP for
    * doc_id ≢ 1 mod 3, WAV for ≡ 1), so
    * [[graft.streaming.MediaStream]]'s gate fingerprints exactly the
    * corpus the batch dedup faces verify — the stream ≡ batch spec pin
    * rests on this byte-for-byte equality. */
  def texturedMediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val nImages = docs.filter(col("doc_id") % 3 =!= 1).count()
    val nAudio = docs.filter(col("doc_id") % 3 === 1).count()
    val nmI = phashMotifs(nImages)
    val nmA = phashMotifs(nAudio)
    docs.as[Long].mapPartitions { it =>
      imageIoNoDiskCache()
      it.map { id =>
        val payload =
          if (id % 3 == 1) {
            val m = id % nmA
            encodeWavSamples(audioFpSamples(m), textureSample(m, id, _))
          } else {
            val m = id % nmI
            val w = (16 + m % 17).toInt
            val h = (8 + m % 9).toInt
            if (id % 3 == 0) encodePngPixels(w, h, texturePixel(m, id, _))
            else encodeBmpPixels(w, h, texturePixel(m, id, _))
          }
        (id, payload)
      }
    }.toDF("doc_id", "payload")
  }

  /** AUDIO near-dup dedup — [[dedupMedia]]'s machinery over
    * [[audioFp60]] signatures (4×15-bit bands, exact hamming ≤
    * [[phashMaxHamming]] verify). With this, every modality in the
    * corpus (text → simhash et al., image → dhash, audio → envelope
    * fingerprint) has a near-dup gate. */
  def dedupAudio(s: SparkSession, dir: String): DataFrame =
    bandPairs(audioSigs(s, dir), "afp").orderBy("a", "b")

  /** MULTIMODAL near-dup CLUSTERS — the step the pairwise faces leave
    * open (pairs alone don't dedupe; a curation pass needs one canonical
    * id per connected group): the large-star/small-star connected-
    * components loop ([[DedupQueries.starLabelsOver]] — Kiveris et al.'s
    * CC-MR, the same machinery as `dedup_cluster_star`) over the UNION
    * of the image and audio near-dup pair sets. Image and audio doc
    * sets are disjoint, so components never mix modalities — one
    * operator still covers the whole media corpus, and every document
    * gets (cluster_id, keep) with min-doc_id canonical, exactly the
    * text clusters' contract. */
  def dedupMediaClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = bandPairs(phashSigs(s, dir), "dhash")
      .unionByName(bandPairs(audioSigs(s, dir), "afp"))
      .select("a", "b")
    Tables.documents(s, dir).select(col("doc_id"))
      .join(DedupQueries.starLabelsOver(s, pairs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }

  /** Minimum pixel count for a training-worthy pair image — the
    * LAION-style size floor (tiny thumbnails carry no signal a vision
    * tower can use; LAION-400M gated on min dimension the same way).
    * Sized mid-range for the motif geometry (128–512 px) so the gate
    * measurably fires without dominating. */
  val minPairPixels = 256L

  /** MULTIMODAL PAIR CURATION — the cross-modal verdict table a
    * (caption, image) training-set build runs (the LAION-style filter
    * chain, Schuhmann et al. 2021): for every image-modality document,
    * the TEXT gates ([[CurationQueries.curationPipeline]]'s rule chain —
    * too_short → non_en → low_quality → near_dup, reused verbatim so
    * text semantics can never diverge between the text-only and
    * pair-curation faces) then the IMAGE gates — a pixel-count floor
    * ([[minPairPixels]]) and the perceptual near-dup drop (appears as
    * the higher-doc_id side of a verified [[dedupMedia]] pair: keep
    * first occurrence, the dedup-family convention). One row per pair
    * with every gate's input and the final verdict — the per-row audit
    * trail the funnel face aggregates.
    *
    * Scale shape: text verdict and image signatures are both corpus-wide
    * scans joined on the doc_id equi-key (co-partitioned shuffle join —
    * at 100 TB both sides bucket by doc_id); the drop set is the
    * verified pair table's b-side (linear, df-capped by
    * [[bandPairs]]) — an equi left-join, never broadcast-assumed. */
  def multimodalPairs(s: SparkSession, dir: String): DataFrame = {
    val text = CurationQueries.curationPipeline(s, dir)
      .select(col("doc_id"), col("pred_lang"), col("quality"),
        col("reject_reason").as("text_reject"))
    // ONE real-codec decode pass, materialized: the signature table
    // feeds both the dims gate and the near-dup pair join — without the
    // checkpoint the per-image PNG/BMP decode (the family's dominant
    // cost) executes twice
    val allSigs = phashSigs(s, dir).localCheckpoint()
    val sigs = allSigs.select("doc_id", "format", "width", "height")
    val dupB = bandPairs(allSigs, "dhash")
      .select(col("b").as("doc_id")).distinct()
      .withColumn("is_dup", lit(true))
    val reason = coalesce(col("text_reject"),
      when(col("width") * col("height") < minPairPixels, "image_too_small"),
      when(col("is_dup"), "image_near_dup"))
    sigs.join(text, Seq("doc_id"))
      .join(dupB, Seq("doc_id"), "left")
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("pred_lang"), col("quality"),
        reason.isNull.as("keep"), reason.as("reject_reason"))
      .orderBy("doc_id")
  }

  /** PAIR-CURATION FUNNEL — [[CurationQueries.curationFunnel]]'s
    * attrition dashboard over the multimodal gate chain: pairs caught
    * per sequential gate, corpus shares, running survivors. The corpus
    * collapses to ≤7 stage rows in one hash aggregate; totals are a
    * 1-row broadcast and the cumulative sum windows over the ≤7 rows
    * (the allowlisted funnel class). */
  def multimodalPairFunnel(s: SparkSession, dir: String): DataFrame =
    pairFunnelFromCounts(pairFunnelCounts(multimodalPairs(s, dir)))

  /** Stage index of a pair reject reason — the 7-stage gate order,
    * shared with [[graft.streaming.PairStream]]'s per-batch count
    * collapse (the [[CurationQueries.stageIdxOf]] pattern). */
  private[graft] def pairStageIdxOf(reason: Column): Column =
    when(reason === "too_short", 1)
      .when(reason === "non_en", 2)
      .when(reason === "low_quality", 3)
      .when(reason === "near_dup", 4)
      .when(reason === "image_too_small", 5)
      .when(reason === "image_near_dup", 6)
      .otherwise(7)

  /** Per-stage (stage_idx, stage, n_pairs) counts over pair verdict
    * rows — what the streaming gate commits per micro-batch. */
  private[graft] def pairFunnelCounts(verdicts: DataFrame): DataFrame =
    verdicts
      .select(pairStageIdxOf(col("reject_reason")).as("stage_idx"),
        coalesce(col("reject_reason"), lit("kept")).as("stage"))
      .groupBy("stage_idx", "stage")
      .agg(count(lit(1)).as("n_pairs"))

  /** The pair-funnel arithmetic over a (stage_idx, stage, n_pairs)
    * count table — ONE tail shared by the batch funnel and the
    * streaming monitor's summed committed counts, so live ≡ batch is
    * structural (counts ADD). */
  private[graft] def pairFunnelFromCounts(g: DataFrame): DataFrame = {
    val tot = g.agg(sum(col("n_pairs")).as("tp"))
    val cum = Window.orderBy("stage_idx")
      .rowsBetween(Window.unboundedPreceding, 0) // ≤7 stage rows
    g.crossJoin(broadcast(tot))
      .select(col("stage_idx"), col("stage"), col("n_pairs"),
        round(col("n_pairs").cast("double") / col("tp"), 6).as("pair_share"),
        (col("tp") - sum(when(col("stage") === "kept", 0L)
          .otherwise(col("n_pairs"))).over(cum)).as("surviving_pairs"))
      .orderBy("stage_idx")
  }

  /** MULTIMODAL TRAINING MANIFEST — the artifact a (caption, image)
    * trainer actually reads: the kept pairs from [[multimodalPairs]]
    * assigned a reproducible global order by the seeded-hash epoch
    * shuffle ([[PrepQueries.epochShuffle]]'s scheme verbatim: shard =
    * hash mod shards, position = rank within shard — no RNG, no global
    * sort; ordering work is per-shard), each row carrying what a data
    * loader needs to budget a batch (caption tokens, pixel count). The
    * text-corpus analog is `pipeline_e2e`; this face closes the same
    * gate → manifest loop for the multimodal corpus.
    *
    * Scale shape: the gate chain's own cost plus one seeded-hash
    * projection and a per-shard rank window (thousands of independent
    * streams at corpus scale — never a global sort). */
  def multimodalManifest(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{md5Long, whitespaceTokenCount}
    val kept = multimodalPairs(s, dir).filter(col("keep"))
      .select("doc_id", "format", "width", "height")
    val caps = Tables.documents(s, dir).select(col("doc_id"),
      whitespaceTokenCount(col("text")).cast("long").as("caption_tokens"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ph"), col("doc_id"))
    kept.join(caps, Seq("doc_id"))
      .withColumn("ph", md5Long(concat(
        lit(s"pairs:${PrepQueries.epochSeed}:"),
        col("doc_id").cast("string"))))
      .withColumn("shard", pmod(col("ph"), lit(PrepQueries.epochShards)))
      .withColumn("pos", row_number().over(w))
      .select(col("shard"), col("pos"), col("doc_id"), col("format"),
        col("width"), col("height"),
        (col("width") * col("height")).as("n_pixels"),
        col("caption_tokens"))
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
    "media_resize" -> (mediaResize _),
    "media_phash" -> (mediaPhash _),
    "dedup_media" -> (dedupMedia _),
    "media_audio_fp" -> (mediaAudioFp _),
    "dedup_audio" -> (dedupAudio _),
    "dedup_media_clusters" -> (dedupMediaClusters _),
    "multimodal_pairs" -> (multimodalPairs _),
    "multimodal_pair_funnel" -> (multimodalPairFunnel _),
    "multimodal_manifest" -> (multimodalManifest _),
    "media_gate_drift" ->
      (graft.streaming.MediaStream.mediaGateDriftQuery _),
    "multimodal_funnel_live" ->
      (graft.streaming.PairStream.multimodalFunnelLive _),
    "multimodal_funnel_drift" ->
      (graft.streaming.PairStream.multimodalFunnelDrift _),
    "takedown_replay_pairs" ->
      (graft.streaming.PairStream.takedownReplayPairs _))

  /** Shared oracle CTE chain ending in `afps(doc_id, n, afp)` — the
    * DuckDB replica of [[audioSigs]] (AS MATERIALIZED: dedup_audio's
    * band legs read it 4×). */
  private val audioFpCte: String =
    s"""anm AS (
       |  SELECT greatest(25, count(*) // 8) AS nm
       |  FROM documents WHERE doc_id % 3 = 1),
       |adim AS (
       |  SELECT doc_id, doc_id % nm AS m, 64 + (doc_id % nm) % 193 AS n
       |  FROM documents, anm WHERE doc_id % 3 = 1),
       |ajs AS (SELECT unnest(generate_series(0, 60)) AS j),
       |asv AS (
       |  SELECT d.doc_id, d.m, j, (j * d.n // 61) AS i
       |  FROM adim d CROSS JOIN ajs),
       |amix AS (
       |  SELECT doc_id, j, i,
       |    (i + 1) * 2654435761 + (m + 1) * 40503 AS x0
       |  FROM asv),
       |apx AS (
       |  SELECT doc_id, j,
       |    CASE WHEN i % 97 = doc_id % 97
       |         THEN (xor(x0, x0 // 8192) % 256 + 128) % 256 - 128
       |         ELSE xor(x0, x0 // 8192) % 256 - 128 END AS v
       |  FROM amix),
       |abits AS (
       |  SELECT doc_id, j, v,
       |    lead(v) OVER (PARTITION BY doc_id ORDER BY j) AS nxt
       |  FROM apx),
       |afps AS MATERIALIZED (
       |  SELECT a.doc_id, d.n,
       |    CAST(coalesce(sum(CASE WHEN j < 60 AND v < nxt
       |      THEN (CAST(1 AS BIGINT) << j) ELSE 0 END), 0) AS BIGINT) AS afp
       |  FROM abits a JOIN adim d USING (doc_id)
       |  GROUP BY a.doc_id, d.n)""".stripMargin

  /** Shared oracle CTE chain ending in `hsh(doc_id, dhash)` (+`pdim`):
    * the DuckDB replica of [[phashSigs]] — dims/texture from the motif
    * arithmetic, the 11×6 grid sample, gradient bits packed with
    * bigint shifts. `pdim`/`hsh` are AS MATERIALIZED: both are
    * referenced more than once downstream (dedup_media's 4 band legs). */
  private val phashCte: String =
    s"""nmv AS (
       |  SELECT greatest(25, count(*) // 8) AS nm
       |  FROM documents WHERE doc_id % 3 != 1),
       |pdim AS MATERIALIZED (
       |  SELECT doc_id, doc_id % nm AS m,
       |    16 + (doc_id % nm) % 17 AS w, 8 + (doc_id % nm) % 9 AS h
       |  FROM documents, nmv WHERE doc_id % 3 != 1),
       |gxs AS (SELECT unnest(generate_series(0, ${phashGridW - 1})) AS gx),
       |gys AS (SELECT unnest(generate_series(0, ${phashGridH - 1})) AS gy),
       |sv AS (
       |  SELECT d.doc_id, d.m, gy, gx,
       |    (gy * d.h // $phashGridH) * d.w + (gx * d.w // $phashGridW) AS i
       |  FROM pdim d CROSS JOIN gxs CROSS JOIN gys),
       |pmix AS (
       |  SELECT doc_id, gy, gx, i,
       |    (i + 1) * 2654435761 + (m + 1) * 40503 AS x0
       |  FROM sv),
       |pxv AS (
       |  SELECT doc_id, gy, gx,
       |    CASE WHEN i % 97 = doc_id % 97
       |         THEN (xor(x0, x0 // 8192) % 256 + 128) % 256
       |         ELSE xor(x0, x0 // 8192) % 256 END AS v
       |  FROM pmix),
       |gbits AS (
       |  SELECT doc_id, gy, gx, v,
       |    lead(v) OVER (PARTITION BY doc_id, gy ORDER BY gx) AS nxt
       |  FROM pxv),
       |hsh AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(coalesce(sum(CASE WHEN gx < ${phashGridW - 1} AND v < nxt
       |      THEN (CAST(1 AS BIGINT) << (gy * ${phashGridW - 1} + gx))
       |      ELSE 0 END), 0) AS BIGINT) AS dhash
       |  FROM gbits GROUP BY doc_id)""".stripMargin

  /** [[phashCte]] extended through the banded near-dup join to the
    * VERIFIED image pair set `ipairs(a, b, hamming)` — the oracle twin
    * of `bandPairs(phashSigs, "dhash")`, shared by the dedup_media and
    * multimodal pair oracles so the pair semantics replay identically
    * everywhere they gate. */
  private lazy val imagePairCtes: String = {
    val chunkRows = (0 until bandCount).map { c =>
      s"SELECT doc_id, dhash, $c AS chunk, (dhash >> ${c * 15}) % 32768 AS key FROM hsh"
    }.mkString("\n  UNION ALL ")
    s"""$phashCte,
       |chunks AS MATERIALIZED (
       |  $chunkRows),
       |kept AS MATERIALIZED (
       |  SELECT c.* FROM chunks c
       |  JOIN (SELECT chunk, key FROM chunks GROUP BY chunk, key
       |        HAVING count(*) <= $maxBandDf) d USING (chunk, key)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |         x.dhash AS ha, y.dhash AS hb
       |  FROM kept x JOIN kept y
       |    ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id),
       |ipairs AS MATERIALIZED (
       |  SELECT a, b, bit_count(xor(ha, hb)) AS hamming
       |  FROM cand WHERE bit_count(xor(ha, hb)) <= $phashMaxHamming)"""
      .stripMargin
  }

  /** The pair VERDICT CTE chain ending in `pg(doc_id, ..., reject_reason)`
    * — the batch gate replay shared by the multimodal_pairs, funnel,
    * manifest, live-funnel and funnel-drift oracles. */
  private lazy val pairVerdictCtes: String =
    s"""$imagePairCtes,
       |${CurationQueries.curationCtes},
       |dupb AS (SELECT DISTINCT b AS doc_id FROM ipairs),
       |pg AS (
       |  SELECT p.doc_id,
       |    CASE WHEN r.reject_reason IS NOT NULL THEN r.reject_reason
       |         WHEN p.w * p.h < $minPairPixels THEN 'image_too_small'
       |         WHEN dupb.doc_id IS NOT NULL THEN 'image_near_dup'
       |    END AS reject_reason
       |  FROM pdim p JOIN r ON r.doc_id = p.doc_id
       |  LEFT JOIN dupb ON dupb.doc_id = p.doc_id)""".stripMargin

  /** SQL stage mapping of [[pairStageIdxOf]]. */
  private val pairStageCaseSql: String =
    """CASE coalesce(reject_reason, 'kept')
      |      WHEN 'too_short' THEN 1 WHEN 'non_en' THEN 2
      |      WHEN 'low_quality' THEN 3 WHEN 'near_dup' THEN 4
      |      WHEN 'image_too_small' THEN 5 WHEN 'image_near_dup' THEN 6
      |      ELSE 7 END""".stripMargin

  /** The pair-funnel SQL — shared verbatim by the batch face and the
    * streaming live face. */
  private lazy val pairFunnelOracleSql: String =
    s"""WITH $pairVerdictCtes,
       |st AS (
       |  SELECT $pairStageCaseSql AS stage_idx,
       |    coalesce(reject_reason, 'kept') AS stage
       |  FROM pg),
       |g AS (
       |  SELECT stage_idx, stage, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM st GROUP BY stage_idx, stage),
       |tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS tp FROM g)
       |SELECT stage_idx, stage, n_pairs,
       |  round(CAST(n_pairs AS DOUBLE) / tp, 6) AS pair_share,
       |  tp - CAST(sum(CASE WHEN stage = 'kept' THEN 0
       |                     ELSE n_pairs END)
       |       OVER (ORDER BY stage_idx
       |             ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |    AS surviving_pairs
       |FROM g CROSS JOIN tot ORDER BY stage_idx""".stripMargin

  /** Shared oracle scaffolding for the mixed-format table: per-doc dims
    * + format class, and an index series long enough for both the
    * largest image (16×14 px) and the longest audio clip (n_chars
    * samples). */
  private val mixedCte =
    """dims AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      |    8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
      |    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
      |         ELSE 'bmp' END AS format
      |  FROM documents),
      |s AS (SELECT unnest(generate_series(0,
      |  greatest(16 * 14 - 1,
      |    (SELECT CAST(max(n_chars) AS BIGINT) - 1 FROM documents)))) AS i)"""
      .stripMargin

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
         |FROM documents d LEFT JOIN s ON s.i < d.n_chars
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
         |       ELSE h * $resizeBox // greatest(w, h) END AS BIGINT) AS out_h
         |FROM dims ORDER BY doc_id""".stripMargin,
    "media_jpeg_decode" ->
      """SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS width,
        |  CAST(8 + doc_id % 7 AS BIGINT) AS height,
        |  CAST((8 + doc_id % 9) * (8 + doc_id % 7) AS BIGINT) AS n_pixels
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
      s"""WITH $mixedCte,
         |img AS (
         |  SELECT d.doc_id, d.format,
         |    CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
         |    CAST(1 AS BIGINT) AS n_frames, CAST(0 AS BIGINT) AS n_samples,
         |    CAST(0 AS BIGINT) AS duration_ms,
         |    CAST(coalesce(sum((d.doc_id + s.i) % 256), 0) AS BIGINT)
         |      AS checksum
         |  FROM dims d LEFT JOIN s ON s.i < d.w * d.h
         |  WHERE d.format <> 'wav' GROUP BY d.doc_id, d.format, d.w, d.h),
         |aud AS (
         |  SELECT d.doc_id, d.format,
         |    CAST(0 AS BIGINT) AS width, CAST(0 AS BIGINT) AS height,
         |    CAST((d.n_chars + $audioFrameLen - 1) // $audioFrameLen
         |         AS BIGINT) AS n_frames,
         |    d.n_chars AS n_samples,
         |    CAST(d.n_chars * 1000 // $wavRate AS BIGINT) AS duration_ms,
         |    CAST(coalesce(sum(abs((d.doc_id * 31 + s.i) % 256 - 128)), 0)
         |         AS BIGINT) AS checksum
         |  FROM dims d LEFT JOIN s ON s.i < d.n_chars
         |  WHERE d.format = 'wav' GROUP BY d.doc_id, d.format, d.n_chars)
         |SELECT * FROM img UNION ALL SELECT * FROM aud
         |ORDER BY doc_id""".stripMargin,
    "media_features" ->
      s"""WITH $mixedCte,
         |px AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.format = 'wav'
         |      THEN ((d.doc_id * 31 + s.i) % 256 - 128 + 32768)
         |           * $histBins // 65536
         |      ELSE ((d.doc_id + s.i) % 256) * $histBins // 256 END AS bin
         |  FROM dims d JOIN s
         |    ON s.i < CASE WHEN d.format = 'wav' THEN d.n_chars
         |             ELSE d.w * d.h END),
         |bins AS (SELECT unnest(generate_series(0, ${histBins - 1})) AS bin),
         |hist AS (
         |  SELECT d.doc_id, d.format, b.bin, count(p.bin) AS c
         |  FROM dims d CROSS JOIN bins b
         |  LEFT JOIN px p ON p.doc_id = d.doc_id AND p.bin = b.bin
         |  GROUP BY d.doc_id, d.format, b.bin)
         |SELECT doc_id, format,
         |  string_agg(CAST(c AS VARCHAR), ',' ORDER BY bin) AS features
         |FROM hist GROUP BY doc_id, format ORDER BY doc_id""".stripMargin,
    "media_resize" ->
      s"""WITH $mixedCte,
         |img AS (
         |  SELECT d.doc_id, d.format,
         |    CAST(d.w AS BIGINT) AS in_w, CAST(d.h AS BIGINT) AS in_h,
         |    CAST(CASE WHEN greatest(d.w, d.h) <= $resizeBox THEN d.w
         |         ELSE d.w * $resizeBox // greatest(d.w, d.h) END AS BIGINT)
         |      AS out_w,
         |    CAST(CASE WHEN greatest(d.w, d.h) <= $resizeBox THEN d.h
         |         ELSE d.h * $resizeBox // greatest(d.w, d.h) END AS BIGINT)
         |      AS out_h,
         |    CAST(0 AS BIGINT) AS in_samples, CAST(0 AS BIGINT) AS out_samples,
         |    CAST(coalesce(sum((d.doc_id + s.i) % 256), 0) AS BIGINT)
         |      AS in_checksum,
         |    CAST(0 AS BIGINT) AS out_checksum
         |  FROM dims d LEFT JOIN s ON s.i < d.w * d.h
         |  WHERE d.format <> 'wav' GROUP BY d.doc_id, d.format, d.w, d.h),
         |aud AS (
         |  SELECT d.doc_id, d.format,
         |    CAST(0 AS BIGINT) AS in_w, CAST(0 AS BIGINT) AS in_h,
         |    CAST(0 AS BIGINT) AS out_w, CAST(0 AS BIGINT) AS out_h,
         |    d.n_chars AS in_samples,
         |    CAST((d.n_chars + 1) // 2 AS BIGINT) AS out_samples,
         |    CAST(coalesce(sum(abs((d.doc_id * 31 + s.i) % 256 - 128)), 0)
         |         AS BIGINT) AS in_checksum,
         |    CAST(coalesce(sum(CASE WHEN s.i % 2 = 0
         |         THEN abs((d.doc_id * 31 + s.i) % 256 - 128) END), 0)
         |         AS BIGINT) AS out_checksum
         |  FROM dims d LEFT JOIN s ON s.i < d.n_chars
         |  WHERE d.format = 'wav' GROUP BY d.doc_id, d.format, d.n_chars)
         |SELECT * FROM img UNION ALL SELECT * FROM aud
         |ORDER BY doc_id""".stripMargin,
    "media_frame_sample" ->
      s"""WITH meta AS (
         |  SELECT doc_id,
         |    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
         |         ELSE 'bmp' END AS format,
         |    CASE WHEN doc_id % 3 = 1
         |         THEN (CAST(n_chars AS BIGINT) + $audioFrameLen - 1)
         |              // $audioFrameLen
         |         ELSE 1 END AS n_frames
         |  FROM documents)
         |SELECT doc_id, format,
         |  unnest(generate_series(0, n_frames - 1, $frameStep)) AS frame_idx
         |FROM meta WHERE n_frames > 0
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "media_phash" ->
      s"""WITH $phashCte
         |SELECT h.doc_id,
         |  CASE WHEN h.doc_id % 3 = 0 THEN 'png' ELSE 'bmp' END AS format,
         |  CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
         |  h.dhash
         |FROM hsh h JOIN pdim d USING (doc_id) ORDER BY h.doc_id""".stripMargin,
    "dedup_media" ->
      s"""WITH $imagePairCtes
         |SELECT a, b, hamming FROM ipairs ORDER BY a, b""".stripMargin,
    // the STREAM gate's per-batch tallies under the deterministic
    // 4-quartile id-ordered ingest: dropped(d) ⇔ d is the higher id of
    // a verified image/audio pair (the MediaStreamSpec-pinned stream ≡
    // batch contract); the trailing-2 window is exactly the top half of
    // the doc_id range
    "media_gate_drift" -> {
      val achunkRows = (0 until 4).map { c =>
        s"SELECT doc_id, afp, $c AS chunk, (afp >> ${c * 15}) % 32768 AS key FROM afps"
      }.mkString("\n  UNION ALL ")
      s"""WITH $imagePairCtes,
         |$audioFpCte,
         |achunks AS MATERIALIZED (
         |  $achunkRows),
         |akept AS MATERIALIZED (
         |  SELECT c.* FROM achunks c
         |  JOIN (SELECT chunk, key FROM achunks GROUP BY chunk, key
         |        HAVING count(*) <= $maxBandDf) d USING (chunk, key)),
         |apairs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM akept x JOIN akept y
         |    ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.afp, y.afp)) <= $phashMaxHamming),
         |droppedd AS (
         |  SELECT DISTINCT b AS doc_id FROM
         |    (SELECT b FROM ipairs UNION ALL SELECT b FROM apairs)),
         |verd AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 3 = 1 THEN 'aud' ELSE 'img' END
         |      AS modality,
         |    CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dropped
         |  FROM documents d LEFT JOIN droppedd dr USING (doc_id)),
         |bnds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
         |         FROM documents),
         |life AS (
         |  SELECT modality, count(*) AS n_life,
         |    CAST(sum(dropped) AS BIGINT) AS n_dropped_life
         |  FROM verd GROUP BY modality),
         |win AS (
         |  SELECT modality, count(*) AS n_window,
         |    CAST(sum(dropped) AS BIGINT) AS n_dropped_window
         |  FROM verd, bnds
         |  WHERE doc_id >= lo + (2 * (hi - lo + 1)) // 4
         |  GROUP BY modality)
         |SELECT l.modality, l.n_life, l.n_dropped_life,
         |  round(l.n_dropped_life / CAST(l.n_life AS DOUBLE), 6)
         |    AS drop_rate_life,
         |  coalesce(w.n_window, 0) AS n_window,
         |  coalesce(w.n_dropped_window, 0) AS n_dropped_window,
         |  round(coalesce(w.n_dropped_window, 0) /
         |    CAST(greatest(coalesce(w.n_window, 0), 1) AS DOUBLE), 6)
         |    AS drop_rate_window,
         |  round(round(coalesce(w.n_dropped_window, 0) /
         |      CAST(greatest(coalesce(w.n_window, 0), 1) AS DOUBLE), 6)
         |    - round(l.n_dropped_life / CAST(l.n_life AS DOUBLE), 6), 6)
         |    AS drop_delta
         |FROM life l LEFT JOIN win w USING (modality)
         |ORDER BY l.modality""".stripMargin
    },
    "multimodal_pairs" ->
      s"""WITH $imagePairCtes,
         |${CurationQueries.curationCtes},
         |dupb AS (SELECT DISTINCT b AS doc_id FROM ipairs),
         |pg AS (
         |  SELECT p.doc_id,
         |    CASE WHEN p.doc_id % 3 = 0 THEN 'png' ELSE 'bmp' END AS format,
         |    CAST(p.w AS BIGINT) AS width, CAST(p.h AS BIGINT) AS height,
         |    r.pred_lang, r.quality,
         |    CASE WHEN r.reject_reason IS NOT NULL THEN r.reject_reason
         |         WHEN p.w * p.h < $minPairPixels THEN 'image_too_small'
         |         WHEN dupb.doc_id IS NOT NULL THEN 'image_near_dup'
         |    END AS reject_reason
         |  FROM pdim p JOIN r ON r.doc_id = p.doc_id
         |  LEFT JOIN dupb ON dupb.doc_id = p.doc_id)
         |SELECT doc_id, format, width, height, pred_lang, quality,
         |  reject_reason IS NULL AS keep, reject_reason
         |FROM pg ORDER BY doc_id""".stripMargin,
    // the PAIR gate under takedown: the multimodal_pairs verdict chain
    // over the SURVIVORS. Image payloads are content-determined, so the
    // signature synthesis (nmv/pdim/hsh) stays FULL-corpus; the near-dup
    // join, the text gates and canonicality run over survivors only.
    "takedown_replay_pairs" -> {
      val stride = graft.streaming.Takedown.replayRemovalStride
      val survPairs = imagePairCtes
        .replace("FROM hsh", "FROM hshs")
        .replace("chunks AS MATERIALIZED (",
          s"hshs AS (SELECT * FROM hsh WHERE doc_id % $stride != 0),\n" +
            "chunks AS MATERIALIZED (")
      val survCuration = CurationQueries.curationCtes
        .replace("FROM documents", "FROM surv")
      s"""WITH surv AS (SELECT doc_id, text FROM documents
         |              WHERE doc_id % $stride != 0),
         |$survPairs,
         |$survCuration,
         |dupb AS (SELECT DISTINCT b AS doc_id FROM ipairs),
         |pg AS (
         |  SELECT p.doc_id,
         |    CASE WHEN p.doc_id % 3 = 0 THEN 'png' ELSE 'bmp' END AS format,
         |    CAST(p.w AS BIGINT) AS width, CAST(p.h AS BIGINT) AS height,
         |    r.pred_lang, r.quality,
         |    CASE WHEN r.reject_reason IS NOT NULL THEN r.reject_reason
         |         WHEN p.w * p.h < $minPairPixels THEN 'image_too_small'
         |         WHEN dupb.doc_id IS NOT NULL THEN 'image_near_dup'
         |    END AS reject_reason
         |  FROM pdim p JOIN r ON r.doc_id = p.doc_id
         |  LEFT JOIN dupb ON dupb.doc_id = p.doc_id)
         |SELECT doc_id, format, width, height, pred_lang, quality,
         |  reject_reason IS NULL AS keep, reject_reason
         |FROM pg ORDER BY doc_id""".stripMargin
    },
    "multimodal_manifest" ->
      s"""WITH $imagePairCtes,
         |${CurationQueries.curationCtes},
         |dupb AS (SELECT DISTINCT b AS doc_id FROM ipairs),
         |keptp AS (
         |  SELECT p.doc_id,
         |    CASE WHEN p.doc_id % 3 = 0 THEN 'png' ELSE 'bmp' END AS format,
         |    CAST(p.w AS BIGINT) AS width, CAST(p.h AS BIGINT) AS height,
         |    r.n_tokens AS caption_tokens
         |  FROM pdim p JOIN r ON r.doc_id = p.doc_id
         |  LEFT JOIN dupb ON dupb.doc_id = p.doc_id
         |  WHERE r.reject_reason IS NULL
         |    AND p.w * p.h >= $minPairPixels AND dupb.doc_id IS NULL),
         |hh AS (
         |  SELECT *, ('0x' || substr(md5('pairs:${PrepQueries.epochSeed}:'
         |    || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ph
         |  FROM keptp)
         |SELECT ph % ${PrepQueries.epochShards} AS shard,
         |  row_number() OVER (PARTITION BY ph % ${PrepQueries.epochShards}
         |                     ORDER BY ph, doc_id) AS pos,
         |  doc_id, format, width, height,
         |  width * height AS n_pixels, caption_tokens
         |FROM hh ORDER BY doc_id""".stripMargin,
    "multimodal_pair_funnel" -> pairFunnelOracleSql,
    // the STREAMING gate's live funnel replays the batch funnel SQL
    // verbatim (counts ADD — the curation_funnel_live precedent)
    "multimodal_funnel_live" -> pairFunnelOracleSql,
    "multimodal_funnel_drift" ->
      s"""WITH $pairVerdictCtes,
         |bnds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
         |         FROM documents),
         |stl AS (
         |  SELECT $pairStageCaseSql AS stage_idx,
         |    coalesce(reject_reason, 'kept') AS stage
         |  FROM pg),
         |gl AS (SELECT stage_idx, stage,
         |         CAST(count(*) AS BIGINT) AS n_life
         |       FROM stl GROUP BY stage_idx, stage),
         |totl AS (SELECT CAST(sum(n_life) AS BIGINT) AS tl FROM gl),
         |stw AS (
         |  SELECT $pairStageCaseSql AS stage_idx
         |  FROM pg, bnds WHERE doc_id >= lo + (2 * (hi - lo + 1)) // 4),
         |gw AS (SELECT stage_idx, CAST(count(*) AS BIGINT) AS n_window
         |       FROM stw GROUP BY stage_idx),
         |totw AS (SELECT CAST(sum(n_window) AS BIGINT) AS tw FROM gw)
         |SELECT l.stage_idx, l.stage, l.n_life,
         |  coalesce(w.n_window, 0) AS n_window,
         |  round(CAST(l.n_life AS DOUBLE) / totl.tl, 6) AS share_life,
         |  coalesce(round(CAST(w.n_window AS DOUBLE) / totw.tw, 6), 0.0)
         |    AS share_window,
         |  round(coalesce(round(CAST(w.n_window AS DOUBLE) / totw.tw, 6),
         |      0.0) - round(CAST(l.n_life AS DOUBLE) / totl.tl, 6), 6)
         |    AS share_delta
         |FROM gl l CROSS JOIN totl CROSS JOIN totw
         |LEFT JOIN gw w ON w.stage_idx = l.stage_idx
         |ORDER BY l.stage_idx""".stripMargin,
    "media_audio_fp" ->
      s"""WITH $audioFpCte
         |SELECT doc_id, CAST(n AS BIGINT) AS n_samples, afp
         |FROM afps ORDER BY doc_id""".stripMargin,
    "dedup_audio" -> {
      val chunkRows = (0 until 4).map { c =>
        s"SELECT doc_id, afp, $c AS chunk, (afp >> ${c * 15}) % 32768 AS key FROM afps"
      }.mkString("\n  UNION ALL ")
      s"""WITH $audioFpCte,
         |chunks AS MATERIALIZED (
         |  $chunkRows),
         |kept AS MATERIALIZED (
         |  SELECT c.* FROM chunks c
         |  JOIN (SELECT chunk, key FROM chunks GROUP BY chunk, key
         |        HAVING count(*) <= $maxBandDf) d USING (chunk, key)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |         x.afp AS ha, y.afp AS hb
         |  FROM kept x JOIN kept y
         |    ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id)
         |SELECT a, b, bit_count(xor(ha, hb)) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= $phashMaxHamming
         |ORDER BY a, b""".stripMargin
    },
    // the transitive-closure cluster oracle over the UNION of the image
    // and audio verified pair sets (the dedup_cluster_star oracle shape)
    "dedup_media_clusters" -> {
      val iChunks = (0 until 4).map { c =>
        s"SELECT doc_id, dhash, $c AS chunk, (dhash >> ${c * 15}) % 32768 AS key FROM hsh"
      }.mkString("\n  UNION ALL ")
      val aChunks = (0 until 4).map { c =>
        s"SELECT doc_id, afp, $c AS chunk, (afp >> ${c * 15}) % 32768 AS key FROM afps"
      }.mkString("\n  UNION ALL ")
      s"""WITH RECURSIVE $phashCte,
         |$audioFpCte,
         |ichunks AS MATERIALIZED (
         |  $iChunks),
         |ikept AS MATERIALIZED (
         |  SELECT c.* FROM ichunks c
         |  JOIN (SELECT chunk, key FROM ichunks GROUP BY chunk, key
         |        HAVING count(*) <= $maxBandDf) d USING (chunk, key)),
         |ipairs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM ikept x JOIN ikept y
         |    ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.dhash, y.dhash)) <= $phashMaxHamming),
         |achunks AS MATERIALIZED (
         |  $aChunks),
         |akept AS MATERIALIZED (
         |  SELECT c.* FROM achunks c
         |  JOIN (SELECT chunk, key FROM achunks GROUP BY chunk, key
         |        HAVING count(*) <= $maxBandDf) d USING (chunk, key)),
         |apairs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM akept x JOIN akept y
         |    ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.afp, y.afp)) <= $phashMaxHamming),
         |edges AS (
         |  SELECT a AS src, b AS dst FROM ipairs
         |  UNION SELECT b, a FROM ipairs
         |  UNION SELECT a, b FROM apairs
         |  UNION SELECT b, a FROM apairs),
         |reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |minreach AS (SELECT src, min(dst) AS m FROM reach GROUP BY src)
         |SELECT d.doc_id,
         |  least(d.doc_id, coalesce(mr.m, d.doc_id)) AS cluster_id,
         |  d.doc_id = least(d.doc_id, coalesce(mr.m, d.doc_id)) AS keep
         |FROM documents d LEFT JOIN minreach mr ON d.doc_id = mr.src
         |ORDER BY d.doc_id""".stripMargin
    })
}
