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
    decode(s, mediaTable(s, dir)).orderBy("doc_id")

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
      .orderBy("doc_id", "frame_idx")

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
      .orderBy("doc_id")
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
      .orderBy("doc_id")
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
      .orderBy("doc_id")
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
         |ORDER BY doc_id, frame_idx""".stripMargin)
}
