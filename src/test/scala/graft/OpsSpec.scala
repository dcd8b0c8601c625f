package graft

import graft.ops._
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {

  test("lookup matched/unmatched partition the probe set") {
    val m = LookupQueries.lookupMatched(spark, sf).count()
    val u = LookupQueries.lookupUnmatched(spark, sf).count()
    val maxId = Tables.events(spark, sf)
      .agg(max(col("event_id"))).first().getLong(0)
    val probes = Tables.events(spark, sf)
      .filter(col("event_id") > maxId / 2 && col("event_type") === "purchase")
      .count()
    assert(m + u === probes)
    assert(u > 0, "unmatched route must be non-trivial")
  }

  test("withResultSet nests the old row as a struct") {
    val df = LookupQueries.withResultSet(spark, sf)
    assert(df.schema("resultSet").dataType.typeName === "struct")
    assert(df.count() > 0)
  }

  test("snapshot diff replayed through the delete-aware merge = new snapshot") {
    import graft.cdc.Cdc
    import graft.scd2.Scd2
    val base = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val oldSnap = base.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
    val newSnap = base.filter(pmod(col("o_orderkey"), lit(11)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(5)) === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    val diff = Cdc.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey")).cache()
    // the three routes are all live in this fixture
    assert(diff.filter(col("op") === "insert").count() > 0)
    assert(diff.filter(col("op") === "update").count() > 0)
    assert(diff.filter(col("op") === "delete").count() > 0)
    // unchanged keys produce NO event (the noop filter)
    val unchanged = oldSnap.join(newSnap, Seq("o_orderkey", "o_totalprice"), "left_semi")
    assert(diff.count() + unchanged.count() === oldSnap.join(newSnap,
      Seq("o_orderkey"), "full_outer").count())
    // replay: history of the old snapshot + the diff as a CDC batch
    val hist = Scd2.withScd2Columns(oldSnap, to_timestamp(lit("2024-01-01 00:00:00")))
    val batch = diff.select(col("o_orderkey"),
      col("new.o_totalprice").as("o_totalprice"), col("op"),
      to_timestamp(lit("2024-02-01 00:00:00")).as("ts"),
      col("o_orderkey").as("event_seq"))
    val merged = Scd2.applyBatchWithDeletes(hist, batch,
      Seq("o_orderkey"), "ts", "event_seq", "op")
    val current = merged.filter(col(Scd2.IsCurrent) === "Y")
      .select("o_orderkey", "o_totalprice")
    assert(current.exceptAll(newSnap).isEmpty && newSnap.exceptAll(current).isEmpty)
  }

  test("exact dedup keeps exactly one canonical row per content hash") {
    val d = DedupQueries.dedupExact(spark, sf)
    val perHash = d.groupBy("content_hash")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"))
    assert(perHash.filter(col("keepers") =!= 1).isEmpty)
  }

  test("jaccard near-dups are symmetric-free (a<b) and above threshold") {
    val d = DedupQueries.dedupJaccard(spark, sf).cache()
    assert(d.filter(col("a") >= col("b")).isEmpty)
    assert(d.filter(col("jaccard") < DedupQueries.jaccardThreshold).isEmpty)
  }

  test("sorted_common_count ≡ the relational postings equi-join (multiset)") {
    import graft.functions.SetSimExpressions.sortedCommonCount
    import spark.implicits._
    // edge cases incl. within-array duplicates: join semantics = Σ ca·cb
    val rows = Seq(
      (Seq(1L, 2L, 2L, 5L), Seq(2L, 2L, 2L, 5L, 9L), 7L), // 2·3 + 1·1
      (Seq.empty[Long], Seq(1L, 2L), 0L),
      (Seq(3L), Seq(3L), 1L),
      (Seq(1L, 4L, 7L), Seq(2L, 5L, 8L), 0L))
      .toDF("x", "y", "want")
    assert(rows.filter(
      sortedCommonCount(col("x"), col("y")) =!= col("want")).isEmpty)
    // equivalence on real docs: kernel over sorted per-doc posting arrays
    // == the all-pairs postings equi-join count, for every co-occurring pair
    val post = Tables.documents(spark, sf).select(col("doc_id"),
        explode(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3))
          .as("s"))
      .select(col("doc_id"), (TextFunctions.md5Long(col("s")) % 1000000007L).as("h"))
    val joinCounts = post.select(col("h"), col("doc_id").as("a"))
      .join(post.select(col("h"), col("doc_id").as("b")), Seq("h"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    val arrs = post.groupBy("doc_id")
      .agg(sort_array(collect_list(col("h"))).as("hs"))
    val kernelCounts = joinCounts.select("a", "b")
      .join(arrs.select(col("doc_id").as("a"), col("hs").as("ha")), Seq("a"))
      .join(arrs.select(col("doc_id").as("b"), col("hs").as("hb")), Seq("b"))
      .select(col("a"), col("b"),
        sortedCommonCount(col("ha"), col("hb")).as("common"))
    assert(joinCounts.exceptAll(kernelCounts).isEmpty &&
      kernelCounts.exceptAll(joinCounts).isEmpty)
  }

  test("minhash LSH candidates recover the true jaccard near-dups") {
    val truth = DedupQueries.dedupJaccard(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.dedupMinhashLsh(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(lsh),
      s"LSH missed ${truth -- lsh} of the jaccard>=0.8 pairs")
  }

  test("ann_ivf recall vs brute force at sf0.01 (Voronoi cells, nprobe=4)") {
    val dir = "/root/testdata/sf0.01" // 500 vectors, ~17 cells
    val bf = SimilarityQueries.annBruteForce(spark, dir)
      .select("q", "neighbor").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries.annIvf(spark, dir)
      .select("q", "neighbor").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    // this synthetic corpus has weak cluster structure (max cosine ~0.5),
    // so probing ~24% of cells geometrically yields ~2x random coverage
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("ann_recall_report ≡ per-query overlap of its two inputs") {
    val exact = SimilarityQueries.annBruteForce(spark, sf)
      .select("q", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ivf = SimilarityQueries.annIvf(spark, sf)
      .select("q", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = exact.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (q, ns) =>
        val hit = ns.count(ivf)
        (q, ns.length.toLong, hit.toLong, r6(hit.toDouble / ns.length))
    }
    val got = SimilarityQueries.annRecallReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
    // sanity: recall bounded, and the report covers every query exactly once
    assert(got.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(got.map(_._1).distinct.length === got.length)
  }

  test("media decode: mixed-format table dispatches to the real codecs") {
    val d = MediaQueries.mediaDecode(spark, sf).cache()
    assert(d.count() === Tables.documents(spark, sf).count())
    // sniffed format must agree with the doc_id-chosen encoder
    assert(d.filter(
      (pmod(col("doc_id"), lit(3)) === 0 && col("format") =!= "png") ||
      (pmod(col("doc_id"), lit(3)) === 1 && col("format") =!= "wav") ||
      (pmod(col("doc_id"), lit(3)) === 2 && col("format") =!= "bmp")).isEmpty)
    // image dims come from the REAL decoders and match the synth ranges
    val img = d.filter(col("format") =!= "wav")
    assert(img.filter(col("width") < 8 || col("width") > 16 ||
      col("height") < 8 || col("height") > 14).isEmpty)
    // audio sample count round-trips through the RIFF chunk walk
    val joined = d.filter(col("format") === "wav")
      .join(Tables.documents(spark, sf), "doc_id")
    assert(joined.filter(col("n_samples") =!= col("n_chars")).isEmpty)
    assert(joined.filter(col("n_frames") =!=
      ((col("n_chars") + MediaQueries.audioFrameLen - 1) / MediaQueries.audioFrameLen)
        .cast("long")).isEmpty)
    d.unpersist()
  }

  test("media sniffing rejects unknown containers instead of guessing") {
    assert(MediaQueries.sniffFormat("not a media file".getBytes) === "unknown")
    intercept[IllegalArgumentException] {
      MediaQueries.decodeAny(1L, Array[Byte](1, 2, 3))
    }
  }

  test("jpeg round-trip mean error stays within tolerance on this JVM") {
    // the bound lives HERE, per-JVM, not in the oracle (round-8 advice:
    // an oracle-pinned flag couples the gate to one codec's tables)
    val errs = (0L until 40L).map(id => MediaQueries.jpegProbe(id)._3)
    assert(errs.max <= MediaQueries.jpegMeanTolerance,
      s"max jpeg mean error ${errs.max}")
  }

  test("bilinear resize is mean-preserving within tolerance on this JVM") {
    val errs = (0L until 40L).map(id => MediaQueries.resizeProbe(id)._5)
    assert(errs.max <= MediaQueries.resizeMeanTolerance,
      s"max resize mean error ${errs.max}")
  }

  test("wav decimation halves the stream exactly (even-index samples)") {
    val n = 101
    val r = MediaQueries.resampleAny(9L, MediaQueries.encodeWav(9L, n))
    assert(r.in_samples === n.toLong && r.out_samples === (n + 1) / 2L)
    val expected = (0 until n).filter(_ % 2 == 0)
      .map(i => math.abs((9L * 31 + i) % 256 - 128)).sum
    assert(r.out_checksum === expected)
  }

  test("WAV codec is spec-compliant: foreign chunks, arbitrary PCM, encode⊣decode") {
    // hand-build a WAV the ENCODER never produces: a LIST chunk between
    // fmt and data (word-aligned, odd payload) plus arbitrary samples —
    // a chunk-walking parser must skip it; a fixed-offset one would break
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, -1, 7)
    val listPayload = 5 // odd → exercises word alignment
    val bb = java.nio.ByteBuffer
      .allocate(44 + listPayload + 1 + 8 + 2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + listPayload + 1 + 8 + 2 * samples.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(44100).putInt(44100 * 2).putShort(2).putShort(16)
    bb.put("LIST".getBytes("US-ASCII")).putInt(listPayload)
      .put(Array.fill[Byte](listPayload + 1)(0x7f)) // +1 = alignment pad
    bb.put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
    samples.foreach(bb.putShort)
    val meta = MediaQueries.decodeWav(42L, bb.array())
    assert(meta.sample_rate === 44100L && meta.channels === 1L &&
      meta.bits === 16L && meta.n_samples === samples.length.toLong)
    assert(meta.sum_abs === samples.map(s => math.abs(s.toLong)).sum)
    assert(meta.duration_ms === samples.length * 1000L / 44100L)
    // and the library's own encoder round-trips through the same parser
    val own = MediaQueries.decodeWav(7L, MediaQueries.encodeWav(7L, 300))
    assert(own.n_samples === 300L && own.sample_rate === 8000L)
    assert(own.sum_abs ===
      (0 until 300).map(i => math.abs((7L * 31 + i) % 256 - 128)).sum)
  }

  test("WAV parser agrees with the JDK's independent AudioSystem decoder") {
    // javax.sound.sampled is a SECOND, independent RIFF/WAVE reader in
    // the JDK — decodeWav's format fields and frame count must match it
    val bytes = MediaQueries.encodeWav(123L, 777)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    val mine = MediaQueries.decodeWav(123L, bytes)
    assert(fmt.getSampleRate.toLong === mine.sample_rate)
    assert(fmt.getChannels.toLong === mine.channels)
    assert(fmt.getSampleSizeInBits.toLong === mine.bits)
    assert(ais.getFrameLength === mine.n_samples)
    // and the PCM payload itself: AudioSystem's little-endian samples
    // sum to the same |sum| the chunk-walking parser computed
    val raw = ais.readAllBytes()
    val sb = java.nio.ByteBuffer.wrap(raw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    var sum = 0L
    while (sb.hasRemaining) sum += math.abs(sb.get().toLong)
    assert(sum === mine.sum_abs)
  }

  test("BMP codec: bottom-up padded rows, arbitrary pixels, encode⊣decode") {
    // hand-build a 3×2 BMP (stride 12 ≠ 3w=9 → exercises row padding)
    // with arbitrary blue values; green/red differ so a parser summing
    // the wrong channel fails
    val blues = Array(Array(10, 20, 30), Array(200, 0, 255)) // top-down rows
    val w = 3; val h = 2; val stride = 12
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
      .putInt(stride * h).putInt(0).putInt(0).putInt(0).putInt(0)
    for (row <- h - 1 to 0 by -1) { // bottom-up storage
      for (x <- 0 until w)
        bb.put(blues(row)(x).toByte).put(1.toByte).put(2.toByte)
      bb.put(Array.fill[Byte](stride - 3 * w)(0x77))
    }
    val meta = MediaQueries.decodeBmp(9L, bb.array())
    assert(meta.width === 3L && meta.height === 2L && meta.bpp === 24L)
    assert(meta.n_pixels === 6L)
    assert(meta.sum_blue === blues.flatten.sum.toLong)
    // the library's own encoder round-trips through the same parser
    val own = MediaQueries.decodeBmp(5L, MediaQueries.encodeBmp(5L))
    assert(own.width === (8 + 5 % 9).toLong && own.height === (8 + 5 % 7).toLong)
    assert(own.sum_blue ===
      (0L until own.n_pixels).map(i => (5L + i) % 256).sum)
  }

  test("PNG codec: real JDK decode across color types; JPEG dims decode") {
    // grayscale-typed PNG (different PNG color type than the encoder's
    // RGB) with arbitrary pixels — the real codec normalizes both
    val w = 6; val h = 4
    val gray = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val vals = Array.tabulate(h, w)((y, x) => (y * 53 + x * 17) % 256)
    // raw raster samples both ways — setRGB/getRGB would run sRGB<->gray
    // colorspace conversion and corrupt the values under test
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, vals(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gray, "png", bos)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(img.getWidth === w && img.getHeight === h)
    val sum = (for (y <- 0 until h; x <- 0 until w)
      yield img.getRaster.getSample(x, y, 0).toLong).sum
    assert(sum === vals.flatten.map(_.toLong).sum)
    // the library round-trip flags losslessness in the result itself
    val meta = MediaQueries.decodePng(11L, MediaQueries.encodePng(11L))
    assert(meta.lossless_roundtrip, "PNG must round-trip bit-exactly")
    assert(meta.width === (8 + 11 % 9).toLong)
    // JPEG (lossy): dimensions survive, pixels only approximately
    bos.reset()
    javax.imageio.ImageIO.write(gray, "jpg", bos)
    val jpg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(jpg.getWidth === w && jpg.getHeight === h)
  }

  test("shingles produce n-grams and handle short docs") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "").toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(List("a b c", "b c d"), Nil, Nil))
  }

  test("native expressions are registered on the SQL surface") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |       word_shingles(array('a', 'b', 'c'), 2) AS sh""".stripMargin)
      .head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getSeq[String](1).toList === List("a b", "b c"))
  }

  test("dot_product matches the zip_with+aggregate fold on mismatch/null inputs") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d, 5.0d)) AS mismatch,
        |       dot_product(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)) AS withnull,
        |       dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(3.0d)) AS nullarr,
        |       dot_product(CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)) AS empty""".stripMargin)
      .head()
    // dimension mismatch and null elements poison the sum exactly like the
    // HOF fold: NULL, never a plausible-but-wrong similarity
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) === 0.0)
  }

  test("word_shingles / dot_product misuse fails with a clear analysis error") {
    def msgOf(sql: String): String = {
      val t = intercept[Throwable](spark.sql(sql).collect())
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    }
    assert(msgOf("SELECT word_shingles(array('a'))").contains("exactly 2 arguments"))
    assert(msgOf("SELECT word_shingles(array('a'), '3')").contains("must be integral"))
    assert(msgOf("SELECT word_shingles(array('a','b','c'), 0)").contains(">= 1"))
    // long and folded-expression sizes are accepted
    val ok = spark.sql(
      "SELECT word_shingles(array('a','b','c'), 2L) AS a, word_shingles(array('a','b','c'), 1+1) AS b").head()
    assert(ok.getSeq[String](0).toList === List("a b", "b c"))
    assert(ok.getSeq[String](1).toList === List("a b", "b c"))
    assert(msgOf("SELECT dot_product(array(1.0d))").contains("exactly 2 arguments"))
  }

  test("codegen word_shingles ≡ the built-in HOF formulation on real docs") {
    import org.apache.spark.sql.functions._
    val toks = TextFunctions.tokens(col("text"))
    val hof = array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => array_join(slice(toks, i, lit(3)), " ")))
        .otherwise(array().cast("array<string>")))
    val d = Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"),
        TextFunctions.shingles(toks, 3).as("fast"), hof.as("ref"))
    assert(d.filter(not(col("fast") === col("ref"))).isEmpty)
  }

  test("codegen word_ngrams ≡ the transform+slice HOF formulation (multiset, in order)") {
    val toks = TextFunctions.tokens(col("text"))
    val hof = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => array_join(slice(toks, i, lit(2)), " ")))
      .otherwise(array().cast("array<string>"))
    val d = Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"),
        TextFunctions.wordNgrams(toks, 2).as("fast"), hof.as("ref"))
    assert(d.filter(not(col("fast") === col("ref"))).isEmpty)
    // multiset semantics: a repeated bigram must appear repeatedly
    import spark.implicits._
    val rep = Seq("a b a b a").toDF("text")
      .select(TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), 2))
      .head().getSeq[String](0)
    assert(rep === Seq("a b", "b a", "a b", "b a"))
  }

  test("quantize_i8: codes bounded, error within half a step, null element poisons") {
    import graft.functions.QuantizeFunctions.quantizeI8
    val qz = Tables.embeddings(spark, sf)
      .select(quantizeI8(col("embedding").cast("array<double>")).as("z"))
      .select(col("z.scale").as("s"), col("z.q").as("q"),
        col("z.max_err").as("e"))
    assert(qz.filter(col("s") <= 0).isEmpty) // real vectors: positive scale
    assert(qz.filter(array_max(transform(col("q"), abs(_))) > 127).isEmpty)
    // round-to-nearest: reconstruction error can never exceed scale/2
    assert(qz.filter(col("e") > col("s") / 2 * 1.0000001).isEmpty)
    // a null element must poison the result, not yield a plausible code
    import spark.implicits._
    val poisoned = Seq(Tuple1(Seq[java.lang.Double](1.0, null, 3.0)))
      .toDF("v").select(quantizeI8(col("v").cast("array<double>")).as("z"))
    assert(poisoned.filter(col("z").isNotNull).isEmpty)
    // and the SQL surface sees the function
    assert(spark.sql("SELECT quantize_i8(array(3.0D, -1.5D)).q").head()
      .getSeq[Int](0) === Seq(127, -64))
  }

  test("codegen simhash60 ≡ the explode/groupBy relational formulation") {
    val toks = TextFunctions.tokens(col("text"))
    val docs = Tables.documents(spark, sf).limit(200)
    val tf = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", TextFunctions.md5Long(col("tok")))
    val bitSums = (0 until 60).map { j =>
      sum(when((shiftright(col("h"), j) % 2) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"s$j")
    }
    val packed = (0 until 60).map { j =>
      when(col(s"s$j") > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_ + _)
    val ref = tf.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("ref"))
    val fast = docs.filter(size(toks) > 0)
      .select(col("doc_id"), call_function("simhash60", toks).as("fast"))
    assert(fast.count() === ref.count())
    assert(fast.join(ref, "doc_id").filter(col("fast") =!= col("ref")).isEmpty)
  }

  test("simhash60 skips null array elements instead of crashing") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq[String]("a", "b", "a"))).toDF("toks")
      .select(call_function("simhash60",
        concat(col("toks"), array(lit(null).cast("string")))).as("with_null"),
        call_function("simhash60", col("toks")).as("without"))
    val r = df.first()
    assert(r.getLong(0) === r.getLong(1)) // null token contributes nothing
  }

  test("embedding LSH pairs are a subset of brute-force pairs, nonempty") {
    val brute = DedupQueries.dedupEmbedding(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.dedupEmbeddingLsh(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(brute))
  }

  test("approx_percentile_check: exact cols match percentile_agg, tol proven") {
    val rows = AnalyticsQueries.queries("approx_percentile_check")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(4))).toMap
    val exact = AnalyticsQueries.queries("percentile_agg")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (t, (p50, p90)) =>
      assert(rows(t)._1 === p50, s"$t p50_exact")
      assert(rows(t)._2 === p90, s"$t p90_exact")
      // the plan itself attests the GK estimates sit in the ±5%-rank
      // exact windows — this is the hash-checked oracle column
      assert(rows(t)._3, s"$t within_tol")
    }
  }

  test("approx_percentile production face: estimates in ±5%-rank windows") {
    // the benchOnly sketch-only face, pinned against exact windows
    // computed here — GK merge order varies with partitioning, so the
    // pin is the rank-tolerance window, not bit-equality with the
    // estimate the _check twin happened to compute
    val est = AnalyticsQueries.approxPercentile(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val win = Tables.events(spark, sf).groupBy("event_type")
      .agg(expr("percentile(value, array(0.45, 0.55, 0.85, 0.95, 0.98, 1.0))")
        .as("w"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    win.foreach { case (t, w) =>
      val (p50, p90, p99) = est(t)
      assert(p50 >= w(0) && p50 <= w(1), s"$t est_p50 outside ±5% rank")
      assert(p90 >= w(2) && p90 <= w(3), s"$t est_p90 outside ±5% rank")
      assert(p99 >= w(4) && p99 <= w(5), s"$t est_p99 outside ±5% rank")
    }
  }

  test("quantile_bottomk: sample size exact, estimates rank-accurate") {
    val est = AnalyticsQueries.quantileBottomK(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val sizes = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (t, n) =>
      assert(est(t)._1 === math.min(n, AnalyticsQueries.qbK.toLong),
        s"$t sample size")
    }
    // rank accuracy: each estimated quantile must fall inside the exact
    // ±10%-rank window (expected error ~1.3/sqrt(1000) ≈ 4.1%)
    val bounds = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.40, 0.60, 0.80, 0.95))").as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    bounds.foreach { case (t, b) =>
      assert(est(t)._2 >= b(0) && est(t)._2 <= b(1),
        s"$t p50 est ${est(t)._2} outside exact [p40, p60]")
      assert(est(t)._3 >= b(2) && est(t)._3 <= b(3),
        s"$t p90 est ${est(t)._3} outside exact [p80, p95]")
    }
  }

  test("quantile_bottomk_thinned: pre-thinned scan equals windowed form") {
    // sf0.1: n_g ≈ 20k > margin·k = 4000, so the h < cutoff filter
    // genuinely bites (~96% of rows dropped before the window) — at the
    // spec's usual sf0.001 every group takes the keep-all branch and
    // the test would prove nothing
    val dir = "/root/testdata/sf0.1"
    val windowed = AnalyticsQueries.quantileBottomK(spark, dir)
      .collect().toSeq
    val thinned = AnalyticsQueries.quantileBottomKThinned(spark, dir)
      .collect().toSeq
    assert(windowed == thinned,
      "two-phase pre-thinning must be result-invisible")
    // prove the thinning path was actually exercised
    import graft.functions.TextFunctions.md5Long
    val ev = Tables.events(spark, dir)
      .withColumn("h",
        md5Long(concat(lit("qbk:"), col("event_id").cast("string"))))
    val total = ev.count()
    val cutRows = ev
      .join(ev.groupBy("event_type").agg(count(lit(1)).as("n_g")),
        Seq("event_type"))
      .filter(col("n_g") > AnalyticsQueries.qbMargin * AnalyticsQueries.qbK)
      .filter(col("h") <
        lit(1L << 60) / col("n_g") *
          (AnalyticsQueries.qbMargin * AnalyticsQueries.qbK))
      .count()
    assert(cutRows.toDouble / total < 0.3,
      s"filter must drop most rows at sf0.1 (kept $cutRows of $total)")
  }

  test("approx_distinct_check: exact counts right, HLL within tol attested") {
    val rows = AnalyticsQueries.approxDistinctCheck(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(rows(t)._1 === n, s"$t exact_users")
      // the plan attests |HLL est − exact| ≤ 10% (5σ at rsd=0.02) — the
      // hash-checked column
      assert(rows(t)._2, s"$t within_tol")
    }
  }

  test("approx_distinct production face: HLL within 10% of exact") {
    // the benchOnly sketch-only face — HLL register-max merge is
    // order-independent, so the estimate is stable; pin it against the
    // exact counts under the same 5σ gate the _check twin attests
    val est = AnalyticsQueries.approxDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(est(t) - n) * 100 <= n * 10,
        s"$t HLL est ${est(t)} vs exact $n")
    }
  }

  test("sessions are disjoint per user and gap-bounded") {
    val rows = AnalyticsQueries.sessionize(spark, sf)
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).getTime, r.getTimestamp(2).getTime))
    rows.groupBy(_._1).values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(s2 >= e1)
        case _ =>
      }
    }
    val gapMs = 30L * 60 * 1000
    rows.foreach { case (_, s, e) => assert(e - s >= gapMs) }
  }

  test("asof join: every purchase maps to the latest prior view") {
    val d = RelationalQueries.asofJoin(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    // spot-check one user end-to-end
    val row = d.filter(col("asof_view_id").isNotNull).orderBy("event_id").first()
    val (uid, eid, viewId) = (row.getLong(0), row.getLong(1), row.getLong(3))
    val purchase = ev.filter(col("event_id") === eid).first()
    val view = ev.filter(col("event_id") === viewId).first()
    assert(view.getAs[String]("event_type") === "view")
    assert(view.getAs[java.sql.Timestamp]("ts").compareTo(
      purchase.getAs[java.sql.Timestamp]("ts")) <= 0)
  }

  test("substring dedup: exact-dup docs fully covered, span algebra holds") {
    val d = DedupQueries.substringDedup(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(d.count() === docs.count(), "one row per document")
    // span algebra: spans only exist where windows do; each span covers
    // at least one full window; coverage never exceeds the doc
    assert(d.filter(col("n_spans") > col("n_dup_windows")).isEmpty)
    assert(d.filter(col("n_dup_windows") > 0 &&
      col("dup_chars") < DedupQueries.ssdWindow).isEmpty)
    assert(d.filter(col("n_dup_windows") === 0 &&
      (col("n_spans") =!= 0 || col("dup_chars") =!= 0)).isEmpty)
    val withLen = d.join(docs.select(col("doc_id"),
      length(col("text")).as("len")), Seq("doc_id"))
    assert(withLen.filter(col("dup_chars") > col("len")).isEmpty)
    // exact textual duplicates (present from sf0.01 up) are 100% covered
    val exactDup = docs.groupBy("text").agg(count(lit(1)).as("c"),
        min(length(col("text"))).as("len"))
      .filter(col("c") > 1 && col("len") >= DedupQueries.ssdWindow)
      .join(docs, Seq("text")).select("doc_id")
    assert(d.join(exactDup, Seq("doc_id"))
      .filter(col("dup_frac") < 1.0).isEmpty,
      "exact duplicates must be fully covered (dup_frac = 1)")
    d.unpersist()
    ()
  }

  test("substring dedup: planted duplicates produce exactly-known spans") {
    import spark.implicits._
    val w = DedupQueries.ssdWindow
    // repeat-free building blocks: 4-char tokens bracketed by a per-seed
    // letter, so different-seed blocks share NO boundary characters (a
    // common token prefix/suffix would silently widen the duplicated
    // context past the planted block)
    def blk(seed: Int, n: Int): String = {
      val c = ('a' + seed).toChar
      (0 until n).map(i => f"$c$i%02d$c").mkString(" ")
    }
    val shared = blk(7, 7) // 34 chars >= window, so it can repeat
    val docA = blk(1, 15) // unique -> all zeros
    val docB = blk(2, 15) // exact dup of docC -> full coverage
    val docC = docB
    val docD = s"${blk(3, 8)} $shared ${blk(4, 8)}" // shared mid-block
    val docE = s"${blk(5, 8)} $shared ${blk(6, 8)}"
    val tmp = java.nio.file.Files.createTempDirectory("ssd").toString
    Seq((0L, docA), (1L, docB), (2L, docC), (3L, docD), (4L, docE))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("t").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = DedupQueries.substringDedup(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) === ((0L, 0L, 0L)), "unique doc has no duplication")
    // exact dups: every window duplicated, one span, whole doc covered
    val lenB = docB.length.toLong
    assert(got(1L) === ((lenB - w + 1, 1L, lenB)))
    assert(got(2L) === got(1L))
    // mid-block sharing: the duplicated substring between D and E is the
    // shared block PLUS its two flanking spaces (the surrounding tokens
    // differ); only windows fully inside that context repeat
    val ctx = shared.length + 2
    val expWins = (ctx - w + 1).toLong
    assert(got(3L) === ((expWins, 1L, ctx.toLong)),
      s"docD spans: got ${got(3L)}")
    assert(got(4L) === got(3L), "docE mirrors docD")
  }

  test("substring dedup sampled: a content-selected subset of the exact signal") {
    val exact = DedupQueries.substringDedup(spark, sf)
      .select(col("doc_id"), col("n_dup_windows"))
    val sampled = DedupQueries.substringDedupSampled(spark, sf).cache()
    val j = sampled.join(exact, Seq("doc_id")).cache()
    // content-defined selection keeps a SUBSET of the duplicated windows
    assert(j.filter(col("n_dup_sel") > col("n_dup_windows")).isEmpty)
    assert(j.filter(col("n_dup_sel") > 0 && col("n_dup_windows") === 0)
      .isEmpty, "a duplicated selected window is a duplicated window")
    assert(j.filter(col("n_dup_sel") > col("n_sel_windows")).isEmpty)
    // expectation check: mod-8 sampling keeps ~1/8 of windows (binomial
    // bounds are loose at corpus size; 3x is far outside them)
    val tot = j.agg(sum("n_sel_windows"), sum("n_dup_windows")).first()
    val docsLen = Tables.documents(spark, sf)
      .agg(sum(greatest(length(col("text")) - (DedupQueries.ssdWindow - 1),
        lit(0)))).first().getLong(0)
    val selFrac = tot.getLong(0).toDouble / docsLen
    assert(selFrac > 1.0 / (3 * DedupQueries.ssdSampleMod) &&
      selFrac < 3.0 / DedupQueries.ssdSampleMod,
      s"selection rate $selFrac far from 1/${DedupQueries.ssdSampleMod}")
    j.unpersist(); sampled.unpersist()
    ()
  }

  test("embedding_pca ≡ Scala brute force; unit component; variance bounds") {
    import SimilarityQueries.{embeddingDim => d, pcaRounds}
    def r(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    def decSum(xs: Iterable[Double], dp: Int): Double =
      xs.map(x => BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _).toDouble
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length
    // full brute-force mirror of query + oracle: nano-unit BIGINT
    // component sums, left-fold dots, 12dp renormalize per round
    def nano(x: Double): Long = r(x * 1e9, 0).toLong
    val mean = (0 until d).map(j =>
      vecs.map(x => nano(x(j))).sum / 1e9 / n).toArray
    val totVar = vecs.flatMap(x => x.map(e => nano(e * e))).sum / 1e9 / n -
      decSum(mean.map(m => m * m), 12)
    var v = Array.fill(d)(r(1.0 / math.sqrt(d), 12))
    var lambda = 0.0
    for (_ <- 1 to pcaRounds) {
      var mv = 0.0
      (0 until d).foreach(k => mv += mean(k) * v(k))
      val s = vecs.map { x =>
        var acc = 0.0
        (0 until d).foreach(k => acc += x(k) * v(k))
        r(acc - mv, 9)
      }
      val w = (0 until d).map { j =>
        vecs.indices.map(i => nano(s(i) * vecs(i)(j))).sum / 1e9 -
          mean(j) * (s.map(nano).sum / 1e9)
      }.toArray
      val norm = math.sqrt(decSum(w.map(wj => wj * wj), 12))
      lambda = norm / n
      v = w.map(wj => r(wj / norm, 12))
    }
    val got = SimilarityQueries.embeddingPca(spark, sf).head()
    assert(got.getLong(0) === n.toLong)
    assert(got.getString(1) ===
      v.map(c => r(c * 1e6, 0).toLong).mkString(","))
    assert(got.getDouble(2) === r(lambda, 9))
    assert(got.getDouble(3) === r(lambda / totVar, 6))
    // semantic invariants: unit component (micro rounding slack), Rayleigh
    // estimate within (0, totVar], and v explains at least as much
    // variance as the best coordinate axis would suggest on average
    val vd = got.getString(1).split(",").map(_.toLong / 1e6)
    assert(math.abs(vd.map(c => c * c).sum - 1.0) < 1e-4)
    assert(lambda > 0 && lambda <= totVar + 1e-9)
    assert(lambda >= totVar / d * 0.5,
      "top-PC estimate should not fall below half the average eigenvalue")
  }

  test("embedding_abtt ≡ Scala brute force; top components removed") {
    val d = SimilarityQueries.embeddingDim
    val m = SimilarityQueries.abttComponents
    val rounds = SimilarityQueries.pcaRounds
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def rh(x: Double, dp: Int) =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    def nano(x: Double) = rh(x * 1e9, 0).toLong
    def decSum12(xs: Iterable[Double]) =
      xs.map(x => BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _).toDouble
    def fold(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var k = 0
      while (k < d) { s += a(k) * b(k); k += 1 }
      s
    }
    val n = rows.length
    val mean = Array.tabulate(d)(j => rows.map(r => nano(r._2(j))).sum / 1e9 / n)
    // round-9 projection score of component c for row e, with the same
    // sequential prior removal the library's scoreCol builds
    def score(e: Array[Double], c: Int, vs: Seq[Array[Double]]): Double = {
      var sc = fold(e, vs(c)) - fold(mean, vs(c))
      (0 until c).foreach(p => sc -= score(e, p, vs) * fold(vs(p), vs(c)))
      rh(sc, 9)
    }
    var comps = Seq.empty[Array[Double]]
    (0 until m).foreach { c =>
      var v = Array.fill(d)(rh(1.0 / math.sqrt(d), 12))
      (1 to rounds).foreach { _ =>
        val vsCand = comps :+ v
        val swx = Array.fill(d)(0L)
        var ss = 0L
        val ssp = Array.fill(c)(0L)
        rows.foreach { case (_, e) =>
          val sc = score(e, c, vsCand)
          (0 until d).foreach(j => swx(j) += nano(sc * e(j)))
          ss += nano(sc)
          (0 until c).foreach(p => ssp(p) += nano(sc * score(e, p, comps)))
        }
        val w = Array.tabulate(d) { j =>
          var wj = swx(j) / 1e9 - mean(j) * (ss / 1e9)
          (0 until c).foreach(p => wj = wj - comps(p)(j) * (ssp(p) / 1e9))
          wj
        }
        val norm = math.sqrt(decSum12(w.map(x => x * x)))
        v = w.map(x => rh(x / norm, 12))
      }
      comps = comps :+ v
    }
    val expected = rows.map { case (id, e) =>
      val scs = comps.indices.map(c => score(e, c, comps))
      val micro = Array.tabulate(d) { j =>
        var acc = e(j) - 1.0 * mean(j)
        comps.indices.foreach(c => acc -= scs(c) * comps(c)(j))
        rh(acc * 1e6, 0).toLong
      }
      (id, micro.mkString(","))
    }.toSeq
    val got = SimilarityQueries.embeddingAbtt(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === expected)
    // semantic invariant: the transformed corpus carries ~no mass along
    // the removed components (micro rounding slack only)
    comps.foreach { v =>
      val maxProj = got.map { case (_, s) =>
        val xt = s.split(",").map(_.toLong / 1e6)
        math.abs(fold(xt, v))
      }.max
      assert(maxProj < 2e-3,
        s"residual projection onto a removed component: $maxProj")
    }
  }

  test("html_extract: plain docs byte-identical; every line rule fires") {
    import graft.functions.HtmlExtractUtil
    import org.apache.spark.unsafe.types.UTF8String
    def x(s: String): (String, Long, Long) = {
      val r = HtmlExtractUtil.extract(UTF8String.fromString(s))
      (r.get(0, null).toString, r.getLong(1), r.getLong(2))
    }
    // the safety contract: markup-free prose passes through BYTE-IDENTICAL
    val plain = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    assert(plain.nonEmpty && plain.forall(t => x(t)._1 == t))
    // registered query: plain slice unchanged, injected slice extracts
    val out = TextQueries.htmlExtract(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.filter(_._1 % 5 != 0).forall(!_._4), "plain docs unchanged")
    val inj = out.filter(_._1 % 5 == 0)
    assert(inj.nonEmpty && inj.forall(r => r._2 == 5 && r._3 == 2 && r._4),
      "injected docs: 5 lines, exactly prose + decoded paragraph kept")
    // kernel edges, one per rule
    assert(x("one two <b>three</b> four")._1 === "one two three four")
    assert(x("keep the < sign if unclosed")._1 === "keep the < sign if unclosed")
    assert(x("amp last: &amp;lt; stays &lt; not a tag")._1
      === "amp last: &lt; stays < not a tag")
    assert(x("too  many   spaces here")._1 === "too many spaces here")
    assert(x("<a href=\"x\">one two three</a> <a href=\"y\">four</a>")
      ._3 === 0L, "2-href nav line dropped despite word count")
    assert(x("Enable JAVASCRIPT to see more")._3 === 0L)
    assert(x("two words")._3 === 0L, "short line dropped")
    assert(x("") === (("", 1L, 0L)), "empty doc: one line, none kept")
    assert(x("good line one two\nbad {x}\nmore good prose here")
      ._1 === "good line one two\nmore good prose here")
  }

  test("media_phash: planted near-dup images collide; distinct motifs don't") {
    import graft.ops.MediaQueries._
    // kernel-level plant: two REAL encodes of the same motif differing
    // only in the sparse perturbation (the near-dup pair), plus a third
    // image from a different motif (the far pair) — through the real
    // PNG and BMP codecs, mixed
    def sig(motif: Long, docId: Long, png: Boolean): Long = {
      val w = (8 + motif % 9).toInt
      val h = (8 + motif % 7).toInt
      val bytes =
        if (png) encodePngPixels(w, h, texturePixel(motif, docId, _))
        else encodeBmpPixels(w, h, texturePixel(motif, docId, _))
      val px = new Array[Int](w * h)
      if (png) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        var i = 0
        (0 until h).foreach(y => (0 until w).foreach { x =>
          px(i) = img.getRGB(x, y) & 0xff; i += 1 })
      } else {
        var i = 0
        decodeBmp(docId, bytes, b => { px(i) = b; i += 1 })
      }
      dhash60(w, h, px)
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = ham(sig(7, 100, png = true), sig(7, 297, png = false))
    val far = ham(sig(7, 100, png = true), sig(8, 100, png = true))
    assert(near <= phashMaxHamming, s"same-motif pair too far: $near")
    assert(far > phashMaxHamming, s"cross-motif pair too close: $far")
    // identical perturbation residue => identical image => hamming 0
    assert(ham(sig(7, 3, png = true), sig(7, 3 + 97, png = false)) === 0)
    // registered faces: every verified pair is within threshold, pairs
    // overwhelmingly share a motif, and signatures match the plan's dims
    val ph = mediaPhash(spark, sf).collect()
    assert(ph.length > 0 && ph.forall(r => r.getLong(4) >= 0 &&
      r.getLong(4) < (1L << 60)), "60-bit non-negative hashes")
    val nm = phashMotifs(ph.length.toLong)
    val pairs = dedupMedia(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty && pairs.forall(_._3 <= phashMaxHamming))
    assert(pairs.forall(p => p._1 % nm == p._2 % nm),
      "at this sf every verified pair shares a motif")
    // the cluster face ≡ brute-force connected components over the
    // UNION of the image and audio pair sets (min-id canonical)
    val allPairs = pairs.map(p => (p._1, p._2)) ++
      dedupAudio(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    allPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = dedupMediaClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.forall { case (id, cl, keep) =>
      cl == find(id) && keep == (id == cl) })
    assert(got.exists(g => !g._3), "some docs must fold into clusters")
  }

  test("dedup_media df-cap: degenerate band class bounded in the PLAN; healthy pairs unchanged") {
    import graft.ops.MediaQueries
    import spark.implicits._
    // 1) the cap must cost ZERO recall on the healthy corpus fixture
    //    (max band df ~8 here, ~29 at x100 — far under maxBandDf):
    //    capped ≡ uncapped pair set, row for row
    val sigs = MediaQueries.mediaPhash(spark, sf).select("doc_id", "dhash")
      .localCheckpoint()
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val capped = pairSet(MediaQueries.bandPairs(sigs, "dhash"))
    val uncapped = pairSet(
      MediaQueries.bandPairs(sigs, "dhash", cap = Long.MaxValue))
    assert(capped === uncapped, "cap changed healthy-fixture pairs")
    assert(capped.nonEmpty)
    // 2) a planted DEGENERATE class (the all-black-thumbnail regime:
    //    one dhash value held by 300 > maxBandDf docs) contributes ZERO
    //    pairs under the cap — and the quadratic 300*299/2 without it —
    //    while a planted healthy near-dup pair survives both ways
    def mix(i: Long): Long = {
      val x0 = (i + 1) * 2654435761L + 40503L
      (x0 ^ (x0 >>> 13)) & ((1L << 60) - 1)
    }
    val healthy = (100L until 600L).map(i => (i, mix(i)))
    val near = (9000L, mix(150L) ^ 3L) // hamming 2 from doc 150
    val degenerate = (10000L until 10300L).map(i => (i, 0x0123456789ABCL))
    val planted = spark.createDataset(healthy ++ Seq(near) ++ degenerate)
      .toDF("doc_id", "dhash")
    val cappedP = pairSet(MediaQueries.bandPairs(planted, "dhash"))
    val uncappedP = pairSet(
      MediaQueries.bandPairs(planted, "dhash", cap = Long.MaxValue))
    def degPairs(s: Set[(Long, Long, Int)]) =
      s.count(p => p._1 >= 10000L && p._2 >= 10000L)
    assert(degPairs(uncappedP) === 300 * 299 / 2,
      "uncapped: the degenerate class IS the quadratic blowup")
    assert(degPairs(cappedP) === 0,
      "capped: over-cap band values generate no candidates")
    assert(cappedP.contains((150L, 9000L, 2)) &&
      uncappedP.contains((150L, 9000L, 2)),
      "the healthy near-dup pair survives the cap")
    assert(cappedP === uncappedP.filterNot(p => p._1 >= 10000L))
  }

  test("media_phash_jpeg: the hash survives real lossy recompression (per-JVM bound)") {
    import graft.ops.MediaQueries
    // the point of a perceptual hash: the SAME image re-served through
    // a lossy codec must land within the dedup threshold of its
    // original. Real JPEG (DCT + quantization) at the face's quality;
    // bound pinned per-JVM (quantization tables are JVM-specific — the
    // jpegProbe/resizeProbe precedent, never an oracle row). Measured
    // at sf0.01: max 3, mean 0.48, 98% <= 2 — headroom inside the
    // <= phashMaxHamming assertion.
    val rows = MediaQueries.mediaPhashJpeg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 <= MediaQueries.phashMaxHamming),
      s"jpeg twin outside the dedup threshold: ${rows.maxBy(_._4)}")
    val mean = rows.map(_._4).sum.toDouble / rows.length
    assert(mean <= 1.5, s"jpeg hamming mean drifted: $mean")
    // hamming is consistent with the emitted hashes
    assert(rows.forall(r =>
      java.lang.Long.bitCount(r._2 ^ r._3).toLong == r._4))
  }

  test("media_audio_fp: planted near-dup clips collide; distinct motifs don't") {
    import graft.ops.MediaQueries._
    def sig(motif: Long, docId: Long): Long = {
      val n = audioFpSamples(motif)
      val bytes = encodeWavSamples(n, textureSample(motif, docId, _))
      val pcm = new Array[Int](n)
      var i = 0
      decodeWav(docId, bytes, v => { pcm(i) = v; i += 1 })
      audioFp60(n, pcm)
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(7, 100), sig(7, 297)) <= phashMaxHamming,
      "same-motif clips must be near")
    assert(ham(sig(7, 100), sig(8, 100)) > phashMaxHamming,
      "cross-motif clips must be far")
    assert(ham(sig(7, 3), sig(7, 3 + 97)) === 0,
      "same perturbation residue => identical clip")
    val nm = phashMotifs(mediaAudioFp(spark, sf).count())
    val pairs = dedupAudio(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty && pairs.forall(_._3 <= phashMaxHamming))
    assert(pairs.forall(p => p._1 % nm == p._2 % nm),
      "at this sf every verified pair shares a motif")
  }

  test("url_canonicalize: every rule fires; aliased URLs collide; dedup keys on them") {
    import graft.functions.UrlCanonUtil
    import org.apache.spark.unsafe.types.UTF8String
    def c(s: String): String =
      UrlCanonUtil.canonicalize(UTF8String.fromString(s)).toString
    // one assertion per rule, on FOREIGN urls (not the synthesized corpus)
    assert(c("HTTPS://WWW.Example.COM/Path") === "https://www.example.com/Path",
      "scheme+host lowercase; path case preserved")
    assert(c("http://a.com:80/x") === "http://a.com/x", "default http port")
    assert(c("https://a.com:443/x") === "https://a.com/x", "default https port")
    assert(c("https://a.com:8443/x") === "https://a.com:8443/x", "non-default kept")
    assert(c("http://a.com/x#frag") === "http://a.com/x", "fragment dropped")
    assert(c("http://a.com/x?utm_source=s&q=1&fbclid=F&gclid=G&msclkid=M")
      === "http://a.com/x?q=1", "tracking params stripped")
    assert(c("http://a.com/x?b=2&a=1") === "http://a.com/x?a=1&b=2",
      "query keys sorted")
    assert(c("http://a.com/x?utm_source=s") === "http://a.com/x",
      "empty residual query loses its ?")
    assert(c("http://u:p@A.com/x") === "http://u:p@a.com/x",
      "userinfo preserved, host still lowercased")
    assert(c("http://[::1]:8080/x") === "http://[::1]:8080/x", "ipv6 + port")
    assert(c("not a url") === "not a url", "non-hierarchical passes through")
    // two ALIASES of one resource collide; a third resource does not
    val a1 = c("HTTP://Example.com:80/p?utm_campaign=x&b=2&a=1#top")
    val a2 = c("http://example.com/p?a=1&b=2&fbclid=zzz")
    assert(a1 === a2 && a1 === "http://example.com/p?a=1&b=2")
    assert(c("http://example.com/p?a=1&b=3") !== a1)
    // the registered dedup face groups the synthesized 5-way aliases:
    // canonical_url is a function of doc_id % 100 BY CONSTRUCTION
    val d = DedupQueries.dedupUrl(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    val byCanon = d.groupBy(_._2)
    assert(byCanon.size === 100, s"expected 100 url groups, ${byCanon.size}")
    assert(byCanon.values.forall(g =>
      g.map(_._1 % 100).distinct.size === 1), "aliases share doc_id % 100")
    assert(byCanon.values.forall(g =>
      g.count(_._4) === 1 && g.filter(_._4).head._1 === g.map(_._1).min),
      "exactly the min doc_id per group keeps")
  }

  test("host_filter: badlist hosts always drop; mean gate splits the rest") {
    val stats = TextQueries.urlHostStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.length === 50 && stats.forall(_._2 > 0))
    val rows = TextQueries.hostFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), r.getBoolean(3)))
    assert(rows.length === Tables.documents(spark, sf).count())
    // badlist precedence: every doc on a blocked host drops with that reason
    val blocked = rows.filter(r => TextQueries.blockedHosts.contains(r._2))
    assert(blocked.nonEmpty &&
      blocked.forall(r => r._3.contains("blocked_domain") && !r._4))
    // the mean gate fires on SOME unblocked hosts and spares others
    val unblocked = rows.filterNot(r => TextQueries.blockedHosts.contains(r._2))
    assert(unblocked.exists(r => r._3.contains("low_quality_host")))
    assert(unblocked.exists(r => r._3.isEmpty && r._4))
    // the verdict is host-consistent: one outcome per host
    assert(rows.groupBy(_._2).values.forall(_.map(_._3).distinct.size == 1))
    // and it matches brute force: host mean n_chars vs the corpus mean
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byHost = docs.groupBy(d => s"example${d._1 % 50}.com")
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    rows.foreach { case (id, host, reason, keep) =>
      val hm = byHost(host)
      val mean = hm.map(_._2).sum.toDouble / hm.length
      val expect =
        if (TextQueries.blockedHosts.contains(host)) Some("blocked_domain")
        else if (mean < corpusMean) Some("low_quality_host")
        else None
      assert(reason === expect && keep === expect.isEmpty, s"doc $id")
    }
  }

  test("blocklist_filter ≡ Scala brute force; never-occurring term silent") {
    // brute force enumerates n-grams for EVERY distinct blocked-term
    // length — so the trigram path has positive coverage, not just the
    // vacuous silence of a term that never occurs
    val byLen = CurationQueries.blockedTerms
      .groupBy(_.split(" ").length).toSeq.sortBy(_._1)
    val expected = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty).toSeq
        val hits = byLen.flatMap { case (len, ts) =>
          val set = ts.toSet
          toks.sliding(len).filter(_.size == len).map(_.mkString(" "))
            .filter(set).toSeq
        }
        (r.getLong(0), hits.size.toLong,
          hits.distinct.sorted.mkString(","), hits.isEmpty)
      }.sortBy(_._1).toSeq
    val got = CurationQueries.blocklistFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
      .toSeq
    assert(got === expected)
    // both gate faces fire, and the never-occurring phrase never matches
    assert(got.exists(!_._4) && got.exists(_._4))
    assert(!got.exists(_._3.contains("zz")), "absent term must never match")
    // the ≥3-token matching path fires on a real corpus occurrence
    assert(got.exists(_._3.contains("scan group big")),
      "trigram term must match somewhere in the corpus")
    // the bench-only 10³-term face: 995 never-occurring terms change
    // the probe COST, never the result
    assert(CurationQueries.blockedTermsLarge.size === 1000)
    val big = CurationQueries.blocklistFilter1k(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
      .toSeq
    assert(big === got, "1k-term face must be row-for-row the 5-term face")
  }

  test("classifier: model shape, smoothing floor, total-coverage scoring") {
    val wts = CurationQueries.classifierWeights(spark, sf).cache()
    val train = Tables.documents(spark, sf).filter(col("doc_id") % 2 === 0)
    val langs = train.select("lang").distinct().count()
    val vocabSize = math.min(
      train.select(explode(TextFunctions.tokens(col("text"))).as("t"))
        .select("t").distinct().count(),
      CurationQueries.clfVocabK.toLong)
    // dense grid: (vocab + <oov>) × trained langs, every weight positive
    assert(wts.count() === (vocabSize + 1) * langs)
    assert(wts.filter(col("w") <= 0).isEmpty, "Laplace floor keeps w > 0")
    assert(wts.filter(col("token") === CurationQueries.clfOov)
      .count() === langs)
    // within a class, more evidence never lowers the weight
    val viol = wts.as("a").join(wts.as("b"),
      col("a.lang") === col("b.lang") && col("a.cnt") > col("b.cnt") &&
        col("a.w") < col("b.w"))
    assert(viol.isEmpty, "w must be monotone in cnt within a class")
    wts.unpersist()
    val pred = CurationQueries.textClassify(spark, sf).cache()
    val nTest = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1).count()
    assert(pred.count() === nTest,
      "every test doc (token-less included) gets exactly one prediction")
    assert(pred.filter(col("score") <= 0).isEmpty)
    assert(pred.filter(col("correct") =!=
      (col("pred_lang") === col("labeled_lang"))).isEmpty)
    pred.unpersist()
    ()
  }

  test("k-core: converged, min-degree invariant, covers every graph node") {
    val core = DedupQueries.dedupKcore(spark, sf).cache()
    val pairs = DedupQueries.queries("dedup_jaccard")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    assert(core.count() === nodes.length, "one row per graph node")
    // reference peel run to convergence on the collected (small) graph
    var keep = nodes.toSet
    var changed = true
    while (changed) {
      val deg = pairs.filter(p => keep(p._1) && keep(p._2))
        .flatMap(p => Seq(p._1, p._2)).groupBy(identity).map { case (n, o) => n -> o.size }
      val next = keep.filter(n => deg.getOrElse(n, 0) >= DedupQueries.kCoreK)
      changed = next != keep
      keep = next
    }
    val got = core.filter(col("in_core")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === keep,
      s"fixed ${DedupQueries.kCoreRounds} rounds must reach the true core here")
    // invariant: inside the core every member keeps >= k core neighbors
    val gotDeg = core.filter(col("in_core"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    gotDeg.foreach { case (n, d) =>
      val trueDeg = pairs.count(p =>
        (p._1 == n && keep(p._2)) || (p._2 == n && keep(p._1)))
      assert(d === trueDeg.toLong && d >= DedupQueries.kCoreK, s"node $n")
    }
    core.unpersist()
    ()
  }

  test("winnowing: guarantee, density bounds, summary consistency") {
    import spark.implicits._
    val k = TextQueries.winnowK
    val w = TextQueries.winnowW
    // (1) the SIGMOD'03 guarantee: sharing a substring of length
    // >= w + k - 1 forces a shared selected fingerprint
    val shared = "Q" * (w + k - 1) // 23 chars
    val fixture = Seq(
      (0L, s"alpha bravo charlie $shared delta echo fox"),
      (1L, s"zulu yankee $shared xray whiskey victor uniform"),
      (2L, "romeo sierra tango papa oscar november mike lima"))
      .toDF("doc_id", "text")
    val fp = TextQueries.winnowFingerprintsOf(fixture).cache()
    val common = fp.filter(col("doc_id") === 0).select("h")
      .intersect(fp.filter(col("doc_id") === 1).select("h"))
    assert(common.count() >= 1,
      "docs sharing a (w+k-1)-char substring must share a fingerprint")
    fp.unpersist()
    // (2) structural bounds on the real corpus: every doc with grams
    // selects at least ceil(n_grams/w) and at most n_grams fingerprints
    val d = TextQueries.winnow(spark, sf).cache()
    assert(d.filter(col("n_grams") > 0 && col("n_selected") === 0).isEmpty)
    assert(d.filter(col("n_selected") > col("n_grams")).isEmpty)
    assert(d.filter(col("n_selected") * w < col("n_grams")).isEmpty,
      "each fingerprint covers at most w windows")
    // expected density 2/(w+1) ~ 0.22 on non-degenerate text
    val mean = d.agg(sum("n_selected"), sum("n_grams")).first()
    val density = mean.getLong(0).toDouble / mean.getLong(1)
    assert(density > 1.0 / w && density < 3.0 / (w + 1),
      s"corpus density $density far from 2/(w+1)")
    // (3) the summary agrees with the fingerprint set it condenses
    val cnt = TextQueries.winnowFingerprintsOf(Tables.documents(spark, sf))
      .groupBy("doc_id").agg(count(lit(1)).as("c"))
    assert(d.join(cnt, Seq("doc_id"))
      .filter(col("n_selected") =!= col("c")).isEmpty)
    d.unpersist()
    ()
  }

  test("ivf_assign kernel ≡ the argmax-window formulation on the real corpus") {
    import graft.functions.VectorFunctions.dotProduct
    import org.apache.spark.sql.expressions.Window
    val v = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(dotProduct(col("e"), col("e"))))
      .cache()
    val stride = SimilarityQueries.seedStrideOf(v.count())
    val cents = v.filter(col("vec_id") % stride === 1)
      .select(col("vec_id").as("cell"), col("e").as("ce"),
        col("norm").as("cn"))
    // the pre-kernel formulation: n×|cells| candidates + argmax window
    val w = Window.partitionBy("vec_id")
      .orderBy(col("scos").desc, col("cell"))
    val expected = v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        round(dotProduct(col("e"), col("ce")) / (col("norm") * col("cn")), 4)
          .as("scos"))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("vec_id"), col("cell").as("exp_cell"))
    val got = SimilarityQueries.semDedup(spark, sf).select("vec_id", "cell")
    assert(got.count() === expected.count())
    assert(got.join(expected, Seq("vec_id"))
      .filter(col("cell") =!= col("exp_cell")).isEmpty,
      "kernel assignment must match the window argmax incl. 4dp ties")
    v.unpersist()
    ()
  }

  test("ivf_assign kernel: rounding-window ties, NaN, null/dim guards") {
    import graft.functions.IvfUtil
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // 1-dim vectors with norm 1 make raw cosine = the centroid value
    def cb(entries: (Long, Array[Double], Double)*): GenericArrayData =
      new GenericArrayData(entries.map {
        case (cell, ce, cn) =>
          InternalRow(cell, new GenericArrayData(ce), cn)
      }.toArray[Any])
    val e1 = new GenericArrayData(Array(1.0))
    def assign(c: GenericArrayData) = IvfUtil.ivfAssign(e1, 1.0, c)
    // plain argmax
    assert(assign(cb((10L, Array(0.5), 1.0), (20L, Array(0.6), 1.0))) === 20L)
    // 4dp tie: 0.91236 and 0.91239 both round to 0.9124 — the SMALLER
    // cell wins even though the larger cell has the higher raw cosine
    // (the two-pass window must surface both candidates)
    assert(assign(cb((20L, Array(0.91239), 1.0),
      (10L, Array(0.91236), 1.0))) === 10L)
    // just over the rounding boundary: 0.91234 → 0.9123 loses to
    // 0.91236 → 0.9124 despite being within the 2e-4 window
    assert(assign(cb((10L, Array(0.91234), 1.0),
      (20L, Array(0.91236), 1.0))) === 20L)
    // NaN sorts above everything (Spark's desc order), min cell on ties
    assert(assign(cb((30L, Array(Double.NaN), 1.0),
      (20L, Array(0.99), 1.0), (10L, Array(Double.NaN), 1.0))) === 10L)
    // guards: empty codebook, null entry, mixed dims, dim mismatch
    assert(IvfUtil.ivfAssign(e1, 1.0, new GenericArrayData(Array.empty[Any])) === null)
    assert(IvfUtil.ivfAssign(e1, 1.0, new GenericArrayData(
      Array[Any](InternalRow(10L, new GenericArrayData(Array(0.5)), 1.0), null))) === null)
    assert(assign(cb((10L, Array(0.5), 1.0),
      (20L, Array(0.5, 0.5), 1.0))) === null)
    assert(assign(cb((10L, Array(0.5, 0.5), 1.0),
      (20L, Array(0.6, 0.6), 1.0))) === null)
  }

  test("ivf_assign decode cache survives in-place buffer reuse") {
    import graft.functions.IvfUtil
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, UnsafeProjection}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.Platform
    // serialize two same-shape codebooks (only the winning cell differs)
    val schema = StructType(Seq(StructField("cb", ArrayType(StructType(Seq(
      StructField("cell", LongType), StructField("ce", ArrayType(DoubleType)),
      StructField("cn", DoubleType)))))))
    val proj = UnsafeProjection.create(schema)
    def bytesOf(win: Long): (Array[Byte], Int) = {
      val arr = new GenericArrayData(Array[Any](
        InternalRow(win, new GenericArrayData(Array(0.9)), 1.0),
        InternalRow(99L, new GenericArrayData(Array(0.1)), 1.0)))
      val u = proj(InternalRow(arr)).getArray(0)
        .asInstanceOf[UnsafeArrayData]
      val b = new Array[Byte](u.getSizeInBytes)
      Platform.copyMemory(u.getBaseObject, u.getBaseOffset, b,
        Platform.BYTE_ARRAY_OFFSET, u.getSizeInBytes.toLong)
      (b, u.getSizeInBytes)
    }
    val (bytesA, size) = bytesOf(10L)
    val (bytesB, sizeB) = bytesOf(20L)
    assert(size === sizeB)
    // ONE buffer, ONE UnsafeArrayData — refilled in place between calls,
    // the task-iterator row-reuse pattern a (base, offset, size)- or
    // identity-keyed cache would serve stale
    val buf = new Array[Byte](size)
    val u = new UnsafeArrayData
    val e1 = new GenericArrayData(Array(1.0))
    // pointTo AFTER each refill (it caches the element-count header at
    // call time) with identical (base, offset, size) — the row-reader
    // reuse pattern
    System.arraycopy(bytesA, 0, buf, 0, size)
    u.pointTo(buf, Platform.BYTE_ARRAY_OFFSET, size)
    assert(IvfUtil.ivfAssign(e1, 1.0, u) === 10L)
    System.arraycopy(bytesB, 0, buf, 0, size)
    u.pointTo(buf, Platform.BYTE_ARRAY_OFFSET, size)
    assert(IvfUtil.ivfAssign(e1, 1.0, u) === 20L,
      "refilled buffer must not serve the stale decoded codebook")
    System.arraycopy(bytesA, 0, buf, 0, size)
    u.pointTo(buf, Platform.BYTE_ARRAY_OFFSET, size)
    assert(IvfUtil.ivfAssign(e1, 1.0, u) === 10L)
  }

  test("winnow_dedup: completeness on exact dups, consistency with text_winnow") {
    val wd = TextQueries.winnowDedup(spark, sf).cache()
    assert(wd.filter(col("n_shared") > col("n_fingerprints")).isEmpty)
    // the MOSS guarantee, exercised on exact duplicates (cross-doc by
    // construction): two identical docs select identical fingerprint
    // sets, so EVERY fingerprint is shared
    val docs = Tables.documents(spark, sf)
    val exactDup = docs.groupBy("text")
      .agg(count(lit(1)).as("c"), min(length(col("text"))).as("len"))
      .filter(col("c") > 1 &&
        col("len") >= TextQueries.winnowW + TextQueries.winnowK - 1)
      .join(docs, Seq("text")).select("doc_id")
    assert(wd.join(exactDup, Seq("doc_id"))
      .filter(col("shared_frac") < 1.0).isEmpty,
      "exact duplicates must share their whole fingerprint set")
    // the fingerprint universe is text_winnow's selected set
    val tw = TextQueries.winnow(spark, sf)
      .select(col("doc_id"), col("n_selected"))
    assert(wd.join(tw, Seq("doc_id"))
      .filter(col("n_fingerprints") =!= col("n_selected")).isEmpty)
    wd.unpersist()
    ()
  }

  test("semdedup: every drop is justified by an in-cell smaller-id near-dup") {
    val d = SimilarityQueries.semDedup(spark, sf).cache()
    val emb = Tables.embeddings(spark, sf)
    assert(d.count() === emb.count(), "one row per vector")
    val dropped = d.filter(!col("keep")).cache()
    assert(dropped.count() > 0, "fixture should contain semantic near-dups")
    assert(dropped.filter(col("dup_of") >= col("vec_id")).isEmpty,
      "dup_of is always a SMALLER id (greedy min-id keeper)")
    // dup_of lives in the same cell and really is >= threshold similar
    import graft.functions.VectorFunctions.dotProduct
    val v = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(dotProduct(col("e"), col("e"))))
    val cells = d.select(col("vec_id"), col("cell"))
    val pair = dropped
      .join(v.select(col("vec_id"), col("e").as("eb"), col("norm").as("nb")),
        Seq("vec_id"))
      .join(v.select(col("vec_id").as("dup_of"), col("e").as("ea"),
        col("norm").as("na")), Seq("dup_of"))
      .join(cells.select(col("vec_id").as("dup_of"),
        col("cell").as("cell_of")), Seq("dup_of"))
      .withColumn("cos",
        round(dotProduct(col("ea"), col("eb")) / (col("na") * col("nb")), 4))
    assert(pair.filter(col("cell") =!= col("cell_of")).isEmpty,
      "dup_of must sit in the same IVF cell")
    assert(pair.filter(col("cos") < SimilarityQueries.semThreshold).isEmpty,
      "dup_of must actually clear the cosine threshold")
    dropped.unpersist(); d.unpersist()
    ()
  }

  test("lm_ppl_buckets: exact tertiles, monotone buckets, CCNet keep rule") {
    val rows = TextQueries.lmPplBuckets(spark, sf).collect()
    val scored = TextQueries.bigramLm(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(rows.length === scored.size)
    // bucket membership is exactly the score's position vs the tertile
    // thresholds: every head score > every middle score > every tail score
    def scoresOf(b: String) = rows
      .filter(_.getString(2) == b).flatMap(r => scored(r.getLong(0)))
    val (hd, md, tl) = (scoresOf("head"), scoresOf("middle"), scoresOf("tail"))
    if (hd.nonEmpty && md.nonEmpty) assert(hd.min > md.max)
    if (md.nonEmpty && tl.nonEmpty) assert(md.min > tl.max)
    // tertile balance: cut points at ⌈n/3⌉ ranks (ties may shift a bucket
    // by the tie-group size; near-unique means ±1 here)
    val n = rows.count(!_.isNullAt(1))
    assert(Seq(hd.length, md.length, tl.length).forall(c =>
      math.abs(c - n / 3) <= n / 6 + 1), "tertiles wildly unbalanced")
    // CCNet keep: head+middle kept, tail and empty dropped; empty ⟺ NULL
    for (r <- rows) {
      val b = r.getString(2)
      assert(r.getBoolean(3) === (b == "head" || b == "middle"))
      assert((b == "empty") === r.isNullAt(1))
    }
  }

  test("ann_filtered: predicate holds, ranks contiguous, top-k sound in-probe") {
    val got = SimilarityQueries.annFiltered(spark, sf).collect()
    assert(got.nonEmpty)
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every returned neighbor satisfies the query's metadata predicate —
    // the property a post-top-k filter would silently break
    for (r <- got)
      assert(labels(r.getLong(2)) === labels(r.getLong(0)),
        s"neighbor ${r.getLong(2)} breaks query ${r.getLong(0)}'s filter")
    // per-query: ranks 1..n with no gaps, cosine non-increasing, k capped
    for ((q, rs0) <- got.groupBy(_.getLong(0))) {
      val rs = rs0.sortBy(_.getInt(1))
      assert(rs.map(_.getInt(1)).toSeq === (1 to rs.length),
        s"query $q has rank gaps")
      assert(rs.length <= SimilarityQueries.topK)
      val cos = rs.map(_.getDouble(3)).toSeq
      assert(cos.sliding(2).forall(w => w.size < 2 || w(0) >= w(1)))
      assert(rs.map(_.getLong(2)).distinct.length === rs.length)
    }
  }

  test("ann_filtered_recall: exact when the over-probe covers every cell") {
    val rows = SimilarityQueries.annFilteredRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(1) <= SimilarityQueries.topK)     // k
      assert(r.getLong(2) <= r.getLong(1))               // overlap ≤ k
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val n = Tables.embeddings(spark, sf).count()
    val nCells = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % SimilarityQueries.seedStrideOf(n) === 1).count()
    if (SimilarityQueries.filteredNprobe >= nCells)
      // probing every cell makes filtered IVF ≡ filtered brute force:
      // recall must be EXACTLY 1 — the monitor's own sanity anchor
      assert(rows.forall(_.getDouble(3) === 1.0),
        s"full probe ($nCells cells) must give perfect recall")
    // the budgeted twin is the full report restricted to its query
    // sample — identical rows for every query it keeps
    val budget = SimilarityQueries.annFilteredRecallBudget(spark, sf)
      .collect().map(_.toSeq).toSeq
    val expectB = rows.filter(
      _.getLong(0) % SimilarityQueries.recallBudgetStride == 0)
      .map(_.toSeq).toSeq
    assert(budget === expectB && budget.nonEmpty)
  }

  test("dedup_communities_report ≡ Scala brute force over the partition") {
    val labels = DedupQueries.dedupLabelprop(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = DedupQueries.dedupJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val members = labels.values.groupBy(identity)
      .map { case (c, xs) => c -> xs.size.toLong }
    val internal = pairs.filter(p => labels(p._1) == labels(p._2))
      .groupBy(p => labels(p._1)).map { case (c, xs) => c -> xs.size.toLong }
    val external = pairs.filter(p => labels(p._1) != labels(p._2))
      .flatMap(p => Seq(labels(p._1), labels(p._2)))
      .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    def rh(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = members.keys.toSeq.sorted.map { c =>
      val (i, x) = (internal.getOrElse(c, 0L), external.getOrElse(c, 0L))
      val cond = if (i * 2 + x == 0) 0.0 else rh(x.toDouble / (i * 2 + x))
      (c, members(c), i, x, cond)
    }
    val got = DedupQueries.dedupCommunitiesReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1).toSeq
    assert(got === expect)
    // the fixture exercises both shapes: some dense community with
    // internal pairs, and at least one with external (crossing) edges
    assert(got.exists(_._3 > 0))
  }

  test("dedup_labelprop ≡ Scala brute-force synchronous mode propagation") {
    val pairs = DedupQueries.dedupJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must have a near-dup graph")
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).sorted
    val nbrs = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    var lbl = ids.map(i => i -> i).toMap
    for (_ <- 1 to DedupQueries.lpIters) {
      val prev = lbl
      lbl = ids.map { i =>
        // self-inclusive mode: neighbors' labels plus the node's own
        i -> (nbrs.getOrElse(i, Seq.empty).map(prev) :+ prev(i))
          .groupBy(identity).map { case (l, xs) => (l, xs.size) }
          .toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val got = DedupQueries.dedupLabelprop(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === ids.map(i => (i, lbl(i))).toSeq)
    // the partition is non-trivial on this fixture: some doc adopted
    // another's label, and isolated docs all kept their own
    assert(got.exists { case (i, c) => i != c })
  }

  test("dedup_recall_sampled: sane block-sample of the full monitor") {
    val full = DedupQueries.dedupRecallReport(spark, sf).collect()(0)
    val samp = DedupQueries.dedupRecallSampled(spark, sf).collect()(0)
    for (i <- 0 to 4) // counts: a quarter-block can't exceed the corpus
      assert(samp.getLong(i) <= full.getLong(i),
        s"sampled count $i exceeds the full monitor's")
    for (i <- 5 to 7)
      assert(samp.getDouble(i) >= 0.0 && samp.getDouble(i) <= 1.0)
  }

  test("dedup_recall_report reconciles with the graded operators") {
    val r = DedupQueries.dedupRecallReport(spark, sf).collect()(0)
    val nTrue = DedupQueries.dedupJaccard(spark, sf).count()
    val nVerdict = DedupQueries.dedupMinhashLsh(spark, sf).count()
    assert(r.getLong(0) === nTrue, "n_true = dedup_jaccard rows")
    assert(r.getLong(3) === nVerdict, "n_verdict = dedup_minhash_lsh rows")
    assert(r.getLong(2) <= math.min(r.getLong(0), r.getLong(1)))
    assert(r.getLong(4) <= math.min(r.getLong(3), r.getLong(2)))
    assert(r.getDouble(6) <= r.getDouble(5),
      "verdict recall cannot exceed candidate recall")
    assert(nTrue > 0, "fixture must have true near-dup pairs to grade")
    // LSH banding at 4×3 over jaccard ≥ 0.8 pairs: candidate recall is
    // probabilistically ~1 on this fixture — pin a sane floor, not 1.0
    assert(r.getDouble(5) >= 0.9, s"candidate recall collapsed: $r")
  }

  // sf0.001 has ~50 vectors over ~10 labels, so n_rel < k for some
  // queries — the IDCG-truncation branch (m = n_rel < k) is exercised
  // there; sf0.01 exercises the m = k regime
  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
  test(s"retrieval_eval ≡ independent MRR/NDCG recomputation ($dir)") {
    val labels = Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nPerLabel = labels.values.groupBy(identity).map {
      case (l, xs) => l -> xs.size
    }
    val ann = SimilarityQueries.annBruteForce(spark, dir)
      .select("q", "rank", "neighbor").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val d = (1 to SimilarityQueries.topK)
      .map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))
    val expected = ann.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (q, rows) =>
        val ql = labels(q)
        val rels = rows.sortBy(_._2).map(t => labels(t._3) == ql)
        val hits = rels.count(identity).toLong
        val dcg = rels.zipWithIndex.collect {
          case (true, i) => d(i)
        }.sum
        val nRel = nPerLabel(ql).toLong - 1
        val m = math.min(nRel, SimilarityQueries.topK.toLong).toInt
        val idcg = d.take(m).sum
        val firstRank = rels.indexOf(true) + 1
        (q, ql, nRel, hits,
          if (firstRank == 0) 0L else math.round(1e6 / firstRank),
          math.round(hits * 1e6 / SimilarityQueries.topK),
          if (m == 0) 0L else math.round(dcg * 1e6 / idcg.toDouble))
    }
    val got = SimilarityQueries.retrievalEval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // metric invariants: all micro values bounded, hits consistent
    assert(got.forall(r => r._7 >= 0 && r._7 <= 1000000))
    assert(got.forall(r => r._5 >= 0 && r._5 <= 1000000))
    assert(got.forall(r => r._4 <= math.min(r._3, SimilarityQueries.topK)))
    // and the larger fixture must exercise a non-trivial spread (the
    // sf0.001 dir has a single query — spread is not guaranteed there)
    if (dir.endsWith("sf0.01"))
      assert(got.exists(_._4 > 0), "no query found any relevant neighbor")
  }

  test("retrieval_eval_ivf: same metric tail over the IVF candidates") {
    val dir = "/root/testdata/sf0.01"
    val brute = SimilarityQueries.retrievalEval(spark, dir).collect()
    val ivf = SimilarityQueries.retrievalEvalIvf(spark, dir).collect()
    // same query set, same per-label relevance denominators
    assert(brute.map(_.getLong(0)).toSeq === ivf.map(_.getLong(0)).toSeq)
    assert(brute.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      ivf.map(r => (r.getLong(0), r.getLong(2))).toSeq)
    // macro ranking quality: the exact index is the ceiling in aggregate
    // (per-query inversions are possible; the fixture's totals are not)
    assert(brute.map(_.getLong(6)).sum >= ivf.map(_.getLong(6)).sum,
      "IVF macro-NDCG exceeded the exact baseline")
  }

  test("retrieval_eval_hybrid ≡ independent recomputation at k=rerankK") {
    val dir = "/root/testdata/sf0.01"
    val labels = Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nPerLabel = labels.values.groupBy(identity).map {
      case (l, xs) => l -> xs.size
    }
    val k = SimilarityQueries.rerankK
    val d = (1 to k)
      .map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))
    val ranked = SimilarityQueries.hybridSearchIvf(spark, dir)
      .select("q", "rerank", "neighbor").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expected = ranked.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (q, rows) =>
        val ql = labels(q)
        val rels = rows.sortBy(_._2).map(t => labels(t._3) == ql)
        val hits = rels.count(identity).toLong
        val dcg = rels.zipWithIndex.collect { case (true, i) => d(i) }.sum
        val nRel = nPerLabel(ql).toLong - 1
        val m = math.min(nRel, k.toLong).toInt
        val firstRank = rels.indexOf(true) + 1
        (q, ql, nRel, hits,
          if (firstRank == 0) 0L else math.round(1e6 / firstRank),
          math.round(hits * 1e6 / k),
          if (m == 0) 0L else math.round(dcg * 1e6 / d.take(m).sum.toDouble))
    }
    val got = SimilarityQueries.retrievalEvalHybrid(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // the graded depth is the pipeline's own output depth
    assert(ranked.groupBy(_._1).values.forall(_.length <= k))
  }

  test("retrieval_eval_budget ≡ the full report on the queries it keeps") {
    val dir = "/root/testdata/sf0.01"
    val full = SimilarityQueries.retrievalEval(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val budget = SimilarityQueries.retrievalEvalBudget(spark, dir)
      .collect()
    assert(budget.nonEmpty, "budget query set empty at sf0.01")
    budget.foreach { r =>
      assert(r.getLong(0) % SimilarityQueries.recallBudgetStride === 0L)
      assert(full(r.getLong(0)) === r.toSeq,
        s"budget row for q=${r.getLong(0)} diverged from the full report")
    }
  }

  test("multimodal_pairs: gate chain reconciles with its source operators") {
    val pairs = MediaQueries.multimodalPairs(spark, sf).collect()
    // exactly the image-modality docs, each exactly once
    val imgDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 =!= 1).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(pairs.map(_.getLong(0)).toSet === imgDocs)
    assert(pairs.length === imgDocs.size)
    // text rejects replay curationPipeline verbatim
    val textReject = CurationQueries.curationPipeline(spark, sf)
      .select("doc_id", "reject_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // image near-dup drop set = the b-side of dedup_media's pairs
    val dupB = MediaQueries.dedupMedia(spark, sf)
      .select("b").collect().map(_.getLong(0)).toSet
    pairs.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val expect = textReject(id).orElse(
        if (w * h < MediaQueries.minPairPixels) Some("image_too_small")
        else if (dupB(id)) Some("image_near_dup") else None)
      assert(Option(r.getString(7)) === expect, s"doc $id verdict")
      assert(r.getBoolean(6) === expect.isEmpty)
    }
  }

  test("multimodal_manifest: exactly the kept pairs, dense shard order") {
    val kept = MediaQueries.multimodalPairs(spark, sf)
      .filter(col("keep")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val m = MediaQueries.multimodalManifest(spark, sf).collect()
    assert(m.map(_.getLong(2)).toSet === kept)
    assert(m.length === kept.size)
    // (shard, pos) is a dense rank within each shard — a loader can
    // stream shard files independently
    m.groupBy(_.getLong(0)).foreach { case (shard, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to rows.length),
        s"shard $shard positions not dense")
    }
    // pixel/token budgets carried per row
    assert(m.forall(r => r.getLong(6) === r.getLong(4) * r.getLong(5)))
    assert(m.forall(_.getLong(7) > 0))
  }

  test("multimodal_pair_funnel: shares sum to 1, survivors monotone") {
    val f = MediaQueries.multimodalPairFunnel(spark, sf).collect()
    val nPairs = MediaQueries.multimodalPairs(spark, sf).count()
    assert(f.map(_.getLong(2)).sum === nPairs)
    assert(math.abs(f.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    val surv = f.map(_.getLong(4))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b },
      "surviving_pairs must be non-increasing down the funnel")
    val kept = MediaQueries.multimodalPairs(spark, sf)
      .filter(col("keep")).count()
    assert(surv.last === kept)
  }

  test("pii detectors: positives fire once, dates/longs/bad checksums never") {
    import spark.implicits._
    val rows = TextQueries.piiScrubOf(Seq(
      // over-fire probes: timestamp (3 colon groups), date, a 12-digit
      // id (too short for a card), a 16-digit run FAILING Luhn, a bare
      // long number without '+' (not a phone)
      1L -> ("meeting 2026-08-16 12:30:45 order 123456789012 " +
        "ref 4539578763621487 seq 99999999"),
      // true positives, one of each type
      2L -> "mail a.b@example.org now",
      3L -> "from 192.168.10.20 today",
      4L -> "call +14155550123 now",
      5L -> "node 2001:db8:85a3:8d3:1319:8a2e:370:7348 up",
      6L -> "card 4539578763621486 on file").toDF("doc_id", "t2"))
      .select("doc_id", "n_emails", "n_ips", "n_phones", "n_ipv6",
        "n_cards", "has_pii")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(rows(0) === ((1L, 0L, 0L, 0L, 0L, 0L, false)),
      s"dates/timestamps/long ids/bad checksums must not fire: ${rows(0)}")
    assert(rows(1)._2 === 1L && rows(2)._3 === 1L && rows(3)._4 === 1L &&
      rows(4)._5 === 1L && rows(5)._6 === 1L,
      s"each positive must fire its own detector exactly once: ${rows.toSeq}")
    assert(rows.drop(1).forall(_._7), "positives must flag has_pii")
    // the detectors stay mutually exclusive on these shapes
    assert(rows.drop(1).map(r => r._2 + r._3 + r._4 + r._5 + r._6)
      .forall(_ === 1L), s"no cross-detector double fire: ${rows.toSeq}")
  }
}
