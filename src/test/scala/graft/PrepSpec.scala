package graft

import graft.functions.TextFunctions._
import graft.functions.ZOrderFunctions.zorder2
import graft.functions.ZOrderUtil
import graft.ops.{AnalyticsQueries, DedupQueries, PrepQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Invariants for the corpus-preparation operators (PrepQueries) plus the
  * bucketed range join and cluster-retention dedup added alongside. */
class PrepSpec extends SparkSpec {

  test("zorder2 expression ≡ the built-in shift/or fold, incl. masking") {
    import spark.implicits._
    val xs = Seq(0L, 1L, 149L, (1L << 30) - 1, 1L << 30, -1L, 123456789L)
    val rows = (for (x <- xs; y <- xs) yield (x, y)).toDF("x", "y")
    // reference formulation from built-ins only (60 codegen'd terms)
    val ref = (0 until 30).map { i =>
      (shiftleft(shiftright(col("x"), i) % 2, 2 * i) +
        shiftleft(shiftright(col("y"), i) % 2, 2 * i + 1))
    }.reduce(_ + _)
    // % on negatives differs from bit-masking, so mask before the fold
    val masked = rows
      .withColumn("x", col("x").bitwiseAND(lit(ZOrderUtil.DimMask)))
      .withColumn("y", col("y").bitwiseAND(lit(ZOrderUtil.DimMask)))
    val bad = masked
      .withColumn("z_expr", zorder2(col("x"), col("y")))
      .withColumn("z_ref", ref)
      .filter(col("z_expr") =!= col("z_ref"))
    assert(bad.isEmpty)
    // negative inputs fold to their low 30 bits rather than poisoning z
    assert(ZOrderUtil.zorder2(-1L, 0L) === ZOrderUtil.zorder2(ZOrderUtil.DimMask, 0L))
    // null propagates
    val n = rows.select(zorder2(lit(null).cast("long"), col("y")).as("z"))
    assert(n.filter(col("z").isNotNull).isEmpty)
  }

  test("zorder layout: file ranges are contiguous z ranges (locality)") {
    val df = PrepQueries.zorderLayout(spark, sf).cache()
    // file_id = top bits of z ⇒ files partition the z space into
    // non-overlapping ranges: max(z) of file k < min(z) of file k+1
    val byFile = df.groupBy("file_id")
      .agg(min("zval").as("lo"), max("zval").as("hi"))
      .orderBy("file_id").collect()
    byFile.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) < b.getLong(1),
          s"file ${a.get(0)} overlaps file ${b.get(0)} in z space")
      case _ =>
    }
    assert(byFile.length > 1, "layout must spread rows over multiple files")
  }

  test("hilbert2: bijective, unit-step adjacent, layout mirrors zorder geometry") {
    import graft.functions.HilbertUtil
    // curve contract, proven via the d2xy inverse on a deterministic
    // sample of the full 30-bit index space: round-trip identity and
    // consecutive indexes exactly one grid step apart (the property
    // Morton order lacks — and the reason the layout zones are tighter)
    val n = 1L << (2 * HilbertUtil.BitsPerDim)
    val samples = (0 until 5000).map(i => (i.toLong * 214741L) % (n - 1))
    samples.foreach { d =>
      val (x, y) = HilbertUtil.d2xy(d)
      assert(HilbertUtil.hilbert2(x, y) === d, s"round-trip failed at d=$d")
      val (x1, y1) = HilbertUtil.d2xy(d + 1)
      assert(math.abs(x1 - x) + math.abs(y1 - y) === 1L,
        s"d=$d -> d+1 is not a unit grid step: ($x,$y)->($x1,$y1)")
    }
    // corners: first cell is the origin; masking folds negatives
    assert(HilbertUtil.d2xy(0L) === ((0L, 0L)))
    assert(HilbertUtil.hilbert2(-1L, 0L) ===
      HilbertUtil.hilbert2(HilbertUtil.DimMask, 0L))
    // layout twin: same bucketing as zorder (same rows, same file
    // geometry), files partition the hilbert space into disjoint ranges
    val h = PrepQueries.hilbertLayout(spark, sf).cache()
    val z = PrepQueries.zorderLayout(spark, sf)
      .select(col("event_id"), col("user_id").as("zu"),
        col("epoch_min").as("zm"))
    assert(h.join(z, Seq("event_id"))
      .filter(col("user_id") =!= col("zu") || col("epoch_min") =!= col("zm"))
      .isEmpty, "twin layouts must bucket identical rows")
    val byFile = h.groupBy("file_id")
      .agg(min("hval").as("lo"), max("hval").as("hi"))
      .orderBy("file_id").collect()
    byFile.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) < b.getLong(1),
          s"file ${a.get(0)} overlaps file ${b.get(0)} in hilbert space")
      case _ =>
    }
    assert(byFile.length > 1, "layout must spread rows over multiple files")
    h.unpersist()
    ()
  }

  test("zone map: stats cover every row and the probe band prunes files") {
    val events = graft.Tables.events(spark, sf).count()
    val zm = PrepQueries.queries("zone_map")(spark, sf).cache()
    assert(zm.agg(sum("n_rows")).head.getLong(0) === events,
      "zone rows must cover the table exactly")
    val files = zm.count()
    val hit = zm.filter(col("band_hit")).count()
    assert(hit >= 1, "the probe band must intersect at least one zone")
    assert(hit.toDouble / files < 0.5,
      s"z-order zones must let a 1/8-span time band skip most files " +
        s"(hit $hit of $files) — a hash layout would hit all of them")
    zm.unpersist()
    ()
  }

  test("chunking covers every token and respects window/stride geometry") {
    import spark.implicits._
    val chunks = PrepQueries.chunkDocuments(spark, sf).cache()
    val w = PrepQueries.chunkWindow
    val st = PrepQueries.chunkStride
    // geometry: start_tok advances by stride; len ≤ window; only the last
    // chunk of a doc may be shorter than the window
    assert(chunks.filter(col("start_tok") =!= col("chunk_idx") * st + 1).isEmpty)
    assert(chunks.filter(col("chunk_len") > w).isEmpty)
    val lastIdx = chunks.groupBy("doc_id").agg(max("chunk_idx").as("last"))
    val short = chunks.join(lastIdx, Seq("doc_id"))
      .filter(col("chunk_len") < w && col("chunk_idx") =!= col("last"))
    assert(short.isEmpty, "only the final chunk may be partial")
    // coverage: last chunk reaches the end of the token stream
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n"))
    val tail = chunks.join(lastIdx, Seq("doc_id")).filter(col("chunk_idx") === col("last"))
      .join(toks, Seq("doc_id"))
      .filter(col("start_tok") + col("chunk_len") - 1 =!= col("n"))
    assert(tail.isEmpty, "final chunk must end at the last token")
    // the chunk text really is the token slice it claims to be
    val probe = chunks.as[(Long, Long, Long, Long, String)].head()
    val docToks = Tables.documents(spark, sf)
      .filter(col("doc_id") === probe._1)
      .select(tokens(col("text"))).as[Seq[String]].head()
    assert(probe._5 === docToks.slice(probe._3.toInt - 1,
      probe._3.toInt - 1 + w).mkString(" "))
  }

  test("decontaminate: benchmark excluded; flags ⟺ a shared benchmark gram") {
    val d = PrepQueries.decontaminate(spark, sf).cache()
    assert(d.filter(pmod(col("doc_id"), lit(PrepQueries.benchmarkMod)) === 0).isEmpty)
    // recompute hits independently with a plain (non-broadcast) join
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(shingles(tokens(col("text")), PrepQueries.contamNgramN)).as("g"))
    val bench = sh.filter(pmod(col("doc_id"), lit(PrepQueries.benchmarkMod)) === 0)
      .select("g").distinct()
    val want = sh.filter(pmod(col("doc_id"), lit(PrepQueries.benchmarkMod)) =!= 0)
      .join(bench, Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("want_n"))
    val joined = d.join(want, Seq("doc_id"), "left")
      .withColumn("want_n", coalesce(col("want_n"), lit(0L)))
    assert(joined.filter(col("n_contaminated") =!= col("want_n")).isEmpty)
    assert(joined.filter(col("contaminated") =!= (col("want_n") > 0)).isEmpty)
  }

  test("budget_select ≡ global greedy cumsum (bucket decomposition exact)") {
    val q = TextQueries.qualityScore(spark, sf)
      .select("doc_id", "n_tokens", "quality").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val budget = q.map(_._2).sum / TextQueries.bsBudgetDenom
    var cum = 0L
    val expected = q.sortBy(t => (-t._3, t._1)).map { t =>
      cum += t._2; (t._1, t._2, t._3, cum <= budget)
    }.sortBy(_._1).toSeq
    val got = TextQueries.budgetSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got === expected)
    // the budget must actually bite: both faces occur, and the selected
    // token mass is within one document of the budget
    assert(got.exists(_._4) && got.exists(!_._4))
    val selTok = got.filter(_._4).map(_._2).sum
    assert(selTok <= budget)
    assert(budget - selTok < got.map(_._2).max,
      "greedy fill must leave less than one max-doc of slack")
  }

  test("decontaminate_fuzzy ≡ Scala brute force (argmax, ties, flag)") {
    import org.apache.spark.sql.Row
    val shMap = Tables.documents(spark, sf)
      .select(col("doc_id"),
        shingles(tokens(col("text")), PrepQueries.contamNgramN).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val (bench, train) = shMap.partition(_._1 % PrepQueries.benchmarkMod == 0)
    val expected = train.toSeq.sortBy(_._1).map { case (id, sh) =>
      val cands = bench.toSeq
        .map { case (bid, bsh) => (bid, (sh & bsh).size.toLong, bsh.size.toLong) }
        .filter(_._2 > 0)
        .map { case (bid, shared, nb) =>
          (bid, shared, shared * 1000000L / (sh.size + nb - shared)) }
      if (cands.isEmpty) (id, sh.size.toLong, null, 0L, 0L, false)
      else {
        val (bid, shared, jm) =
          cands.maxBy { case (bid, _, jm) => (jm, -bid) }
        (id, sh.size.toLong, bid, shared, jm,
          jm >= PrepQueries.contamJaccardTauMicro)
      }
    }
    val got = PrepQueries.decontaminateFuzzy(spark, sf).collect().map {
      case Row(id: Long, n: Long, b, s: Long, j: Long, c: Boolean) =>
        (id, n, b, s, j, c)
    }.toSeq
    assert(got === expected)
    // the fixture must exercise both faces of the gate
    assert(got.exists(_._6), "some train doc should be flagged")
    assert(got.exists(r => !r._6 && r._4 > 0),
      "some doc should overlap without crossing the threshold")
  }

  test("bucketed range join ≡ naive cross join with the range predicate") {
    val got = AnalyticsQueries.rangeJoin(spark, sf).cache()
    val bkt = AnalyticsQueries.rangeJoinBucketSec
    val ev = Tables.events(spark, sf)
    val windows = ev.filter(col("event_type") === "signup" && col("user_id") === 0)
      .select(col("event_id").as("window_id"),
        (unix_timestamp(col("ts")) - bkt).as("w_start"),
        (unix_timestamp(col("ts")) + bkt).as("w_end"))
    val probes = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
    val naive = windows.crossJoin(probes)
      .filter(col("sec") >= col("w_start") && col("sec") < col("w_end"))
      .groupBy("window_id").agg(count(lit(1)).as("n_errors2"),
        countDistinct(col("user_id")).as("n_users2"))
    val cmp = got.join(naive, Seq("window_id"), "left")
      .withColumn("n_errors2", coalesce(col("n_errors2"), lit(0L)))
      .withColumn("n_users2", coalesce(col("n_users2"), lit(0L)))
    assert(cmp.filter(col("n_errors") =!= col("n_errors2") ||
      col("n_users") =!= col("n_users2")).isEmpty)
    assert(got.count() === windows.count(), "zero-match windows must surface")
  }

  test("keep-best retention: exactly one keeper per cluster, the longest") {
    val k = DedupQueries.dedupKeepBest(spark, sf).cache()
    val perCluster = k.groupBy("cluster_id").agg(
      sum(when(col("keep"), 1).otherwise(0)).as("keepers"),
      max(col("n_chars")).as("max_chars"))
    assert(perCluster.filter(col("keepers") =!= 1).isEmpty)
    // every keeper has its cluster's max length
    val kept = k.filter(col("keep")).join(perCluster, Seq("cluster_id"))
    assert(kept.filter(col("n_chars") =!= col("max_chars")).isEmpty)
    // same membership as the clustering it retains over
    val clusters = DedupQueries.dedupCluster(spark, sf).select("doc_id", "cluster_id")
    assert(k.select("doc_id", "cluster_id").exceptAll(clusters).isEmpty)
  }

  test("large-star/small-star clustering ≡ HashMin labels (incl. a long path graph)") {
    // the testdata pair graph
    val hashMin = DedupQueries.dedupCluster(spark, sf)
    val star = DedupQueries.dedupClusterStar(spark, sf)
    assert(star.exceptAll(hashMin).isEmpty && hashMin.exceptAll(star).isEmpty,
      "both CC algorithms must assign identical min-id labels")
    // a synthetic HIGH-DIAMETER component (path of 64 nodes) + isolated
    // nodes — the topology large-star/small-star exists for; exercised
    // through the same star loop via a seam on the pair source
    import spark.implicits._
    val path = (0L until 63L).map(i => (i, i + 1))
    val twoCliques = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val labels = DedupQueries.starLabelsOver(
      spark, (path ++ twoCliques).toDF("a", "b"))
    val got = labels.as[(Long, Long)].collect().toMap
    (0L to 63L).foreach(i => assert(got(i) === 0L, s"path node $i"))
    Seq(100L, 101L, 102L).foreach(i => assert(got(i) === 100L))
  }

  test("strip_accents_nfc: precomposed ≡ decomposed ≡ plain; ASCII untouched; null propagates") {
    import graft.functions.NormalizeFunctions.stripAccentsNfc
    import spark.implicits._
    val pre = "Caf\u00e9"            // precomposed é
    val dec = "Cafe\u0301"           // e + combining acute
    val rows = Seq((1L, pre), (2L, dec), (3L, "Cafe"), (4L, "Zürich naïve"))
      .toDF("id", "s")
      .select(col("id"), stripAccentsNfc(col("s")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(rows(1L) === "Cafe" && rows(2L) === "Cafe" && rows(3L) === "Cafe")
    assert(rows(4L) === "Zurich naive")
    val n = Seq(Tuple1(null: String)).toDF("s")
      .select(stripAccentsNfc(col("s")).as("n"))
    assert(n.filter(col("n").isNotNull).isEmpty)
  }

  test("compression ratio: sane bounds on the corpus; separates repetition from variety") {
    import spark.implicits._
    val c = TextQueries.compressionRatio(spark, sf).cache()
    assert(c.filter(col("deflate_bytes") <= 0 || col("ratio_pct") <= 0).isEmpty)
    assert(c.filter(col("ratio_pct") > 120).isEmpty,
      "deflate never inflates prose-sized docs past header overhead")
    // known-entropy fixtures through the same kernel: pure repetition must
    // compress far below varied text of the same length
    val rep = ("spam ham " * 300).trim
    val varied = (1 to 600).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")
      .take(rep.length)
    val fix = TextQueries.compressionRatioOf(spark,
        Seq((1L, rep), (2L, varied)).toDF("doc_id", "text"))
      .select("doc_id", "ratio_pct").as[(Long, Long)].collect().toMap
    assert(fix(1L) < fix(2L) / 3,
      s"repetition must compress ≥3× better: rep=${fix(1L)} varied=${fix(2L)}")
    assert(c.filter(col("low_entropy") =!= (col("ratio_pct") < 35)).isEmpty)
  }

  test("compression ratio: exact deflate bytes on fixed strings (this JVM's zlib)") {
    import spark.implicits._
    // the emitted stream size for a fixed input at level 6 is a property
    // of the JVM's zlib build — pinned here so a silent Deflater-config
    // change (level, strategy, dictionary) fails loudly; the empty doc
    // exercises the greatest(raw,1) guard (defined ratio, not null)
    val rep = "abcabcabc" * 40 // 360 bytes of pure repetition
    val uniq = "The five boxing wizards jump quickly over 13 lazy dogs near a quiet pond at dawn."
    val got = TextQueries.compressionRatioOf(spark,
        Seq((1L, rep), (2L, uniq), (3L, "")).toDF("doc_id", "text"))
      .select("doc_id", "raw_bytes", "deflate_bytes", "ratio_pct", "low_entropy")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) === ((360L, 15L, 4L, true)))
    assert(got(2L) === ((81L, 80L, 98L, false)))
    assert(got(3L) === ((0L, 8L, 800L, false)),
      "empty doc: defined bucketed ratio via the greatest(raw,1) guard, never null")
  }

  test("oov rate: rational n_oov/n_tokens against an independent vocab") {
    import spark.implicits._
    val o = PrepQueries.oovRate(spark, sf).cache()
    assert(o.filter(col("n_oov") > col("n_tokens")).isEmpty)
    assert(o.filter(col("oov_rate") < 0 || col("oov_rate") > 1).isEmpty)
    // vocab covers the top tokens: total OOV mass < half the corpus here
    val tot = o.agg(sum("n_tokens"), sum("n_oov")).as[(Long, Long)].head()
    assert(tot._2 > 0, "some OOV mass must exist (vocab is a strict top-K)")
    assert(tot._2 * 2 < tot._1, "top-K vocab must cover the majority mass")
  }

  test("dsir_select ≡ Scala brute-force hashed-bigram rate model") {
    def md5Long60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val B = PrepQueries.dsirB
    def buckets(text: String): Seq[Long] = {
      val t = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      t.sliding(2).filter(_.length == 2)
        .map(bg => md5Long60("dsir:" + bg.mkString(" ")) % B).toSeq
    }
    val all = docs.flatMap { case (_, lang, text) =>
      buckets(text).map(b => (b, lang))
    }
    val cr = all.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = all.filter(_._2 == PrepQueries.dsirTargetLang)
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val (rTot, tTot) = (all.length.toLong,
      all.count(_._2 == PrepQueries.dsirTargetLang).toLong)
    def lam(b: Long): Long =
      1000000L * (ct.getOrElse(b, 0L) + 1) / (tTot + B) -
        1000000L * (cr.getOrElse(b, 0L) + 1) / (rTot + B)
    val expected = docs.map { case (id, lang, text) =>
      val bs = buckets(text)
      (id, lang, bs.length.toLong, bs.map(lam).sum)
    }.sortBy(_._1)
    val got = PrepQueries.dsirSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.length === expected.length)
    got.zip(expected).foreach { case ((id, lg, nb, sc, sel), (ei, el, en, es)) =>
      assert((id, lg, nb, sc) === ((ei, el, en, es)), s"doc $id")
      assert(sel === (sc > 0), s"selected must be score>0 for doc $id")
    }
    // the rule is discriminating on this corpus: both classes non-empty
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("temperature_mixture ≡ Scala brute force; smoothing flattens shares") {
    import graft.ops.CurationQueries
    val perLang = Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.trim.split("\\s+").count(_.nonEmpty).toLong))
      .groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val sTok = perLang.view.mapValues { case (_, t) =>
      math.floor(math.sqrt(t.toDouble) * 1e6).toLong
    }.toMap
    val totT = perLang.values.map(_._2).sum
    val totS = sTok.values.sum
    val expected = perLang.keys.toSeq.sorted.map { l =>
      val (nd, nt) = perLang(l)
      val nat = 1000000L * nt / math.max(totT, 1)
      val tmp = 1000000L * sTok(l) / math.max(totS, 1)
      (l, nd, nt, nat, tmp, 1000000L * tmp / math.max(nat, 1))
    }
    val got = CurationQueries.temperatureMixture(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expected)
    // α-temperature smoothing FLATTENS: the spread of temp shares is
    // strictly inside the spread of natural shares (non-degenerate corpus)
    val nats = got.map(_._4).filter(_ > 0)
    val tmps = got.map(_._5).filter(_ > 0)
    assert(tmps.max.toDouble / tmps.min <= nats.max.toDouble / nats.min)
  }

  test("dataset split: exhaustive, consistent with buckets, ~90/5/5") {
    import graft.ops.CurationQueries
    val sp = CurationQueries.queries("dataset_split")(spark, sf).cache()
    val n = sp.count()
    assert(n === Tables.documents(spark, sf).count(), "every doc assigned")
    // split is exactly the bucket mapping (no row can disagree)
    assert(sp.filter(
      (col("bucket") < 90 && col("split") =!= "train") ||
        (col("bucket") >= 90 && col("bucket") < 95 && col("split") =!= "val") ||
        (col("bucket") >= 95 && col("split") =!= "test")).isEmpty)
    val train = sp.filter(col("split") === "train").count().toDouble / n
    assert(train > 0.8 && train < 0.97, s"train share $train ≈ 0.9")
    assert(sp.filter(col("split") === "val").count() > 0)
    assert(sp.filter(col("split") === "test").count() > 0)
    sp.unpersist()
    ()
  }

  test("training manifest agrees with each standalone signal") {
    import graft.ops.CurationQueries
    val m = CurationQueries.queries("training_manifest")(spark, sf).cache()
    val q = TextQueries.queries("quality_filter")(spark, sf)
      .select(col("doc_id"), col("keep").as("q_keep"))
    val d = DedupQueries.queries("dedup_exact")(spark, sf)
      .select(col("doc_id"), col("keep").as("d_keep"))
    val sp = CurationQueries.queries("dataset_split")(spark, sf)
      .select(col("doc_id"), col("split").as("s_split"))
    val j = m.join(q, Seq("doc_id")).join(d, Seq("doc_id"))
      .join(sp, Seq("doc_id"))
    assert(j.filter(col("keep_quality") =!= col("q_keep")).isEmpty,
      "manifest quality gate ≡ quality_filter.keep")
    assert(j.filter(col("is_canonical") =!= col("d_keep")).isEmpty,
      "manifest canonicality ≡ dedup_exact.keep")
    assert(j.filter(col("split") =!= col("s_split")).isEmpty,
      "manifest split ≡ dataset_split.split")
    assert(j.filter(col("keep") =!=
      (col("is_canonical") && col("keep_quality"))).isEmpty)
    m.unpersist()
    ()
  }

  test("dict encode round-trips: decoding ids reproduces every document") {
    val enc = PrepQueries.queries("dict_encode")(spark, sf)
    // rebuild the id→token table exactly as the operator ranks it
    val tok = Tables.documents(spark, sf)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "token")
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("token").asc)))
      .select(col("id").cast("string").as("id"), col("token"))
    val decoded = enc
      .select(col("doc_id"), posexplode(split(col("ids"), " ")))
      .toDF("doc_id", "pos", "id")
      .join(vocab, Seq("id"))
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token")), " ").as("decoded"))
    val orig = Tables.documents(spark, sf)
      .select(col("doc_id"), array_join(tokens(col("text")), " ").as("orig"))
    assert(decoded.join(orig, Seq("doc_id"))
      .filter(col("decoded") =!= col("orig")).isEmpty,
      "id sequences must decode back to the exact token stream")
  }

  test("dedup_span_scrub ≡ Scala brute-force first-occurrence span removal") {
    import spark.implicits._
    val L = PrepQueries.scrubSpanLen
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // brute force: global first-occurrence over (doc_id, span_idx)-ordered
    // fixed-length token spans, then per-doc reassembly of the kept spans
    val seen = scala.collection.mutable.Set.empty[String]
    val expect = docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val spans = if (toks.isEmpty) Seq("")
        else toks.grouped(L).map(_.mkString(" ")).toSeq
      val kept = spans.map(sp => seen.add(sp)) // add = true iff first
      (id, spans.size.toLong, kept.count(!_).toLong,
        spans.zip(kept).collect { case (sp, true) => sp }.mkString(" "))
    }.toSeq
    val got = PrepQueries.dedupSpanScrub(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(got === expect)
    // scrub invariant: each distinct span survives exactly once corpus-wide
    val total = expect.map(_._2).sum
    val dropped = expect.map(_._3).sum
    val distinctSpans = docs.flatMap { case (_, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) Seq("") else toks.grouped(L).map(_.mkString(" ")).toSeq
    }.distinct.size
    assert(total - dropped === distinctSpans.toLong)
    assert(dropped > 0, "fixture must actually exercise span removal")
  }
}
