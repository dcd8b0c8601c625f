package graft

import graft.ops.ProfileQueries
import org.apache.spark.sql.functions._

/** [[ProfileQueries.profile]] — generic column profiling. */
class ProfileSpec extends SparkSpec {

  test("profile counts nulls, distincts (null-excluded), typed min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(2.5)),
      (2L, None, Some(10.25)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(2.5))).toDF("id", "s", "v")
    val p = ProfileQueries.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "s", "v"))
    assert(p.values.forall(_.getLong(1) === 4L), "n_rows")
    assert(p("s").getLong(2) === 1L && p("v").getLong(2) === 1L, "n_nulls")
    assert(p("s").getLong(3) === 2L, "distinct excludes nulls")
    // numeric min/max are the NUMERIC extrema rendered fixed-point —
    // the lexicographic min of the renderings would be "10.25"
    assert(p("v").getString(4) === "2.50" && p("v").getString(5) === "10.25")
    assert(p("id").getString(4) === "1" && p("id").getString(5) === "4")
  }

  test("profile of an EMPTY table still yields one row per column") {
    // round-8 advice: the melt-derived stats side has no rows on empty
    // input; the min/max side (keyless agg → always 1 row) must be the
    // preserved side of the stitch
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val p = ProfileQueries.profile(empty).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "s"))
    for (r <- p.values) {
      assert(r.getLong(1) === 0L, "n_rows")
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L, "nulls/distincts")
      assert(r.isNullAt(4) && r.isNullAt(5), "min/max null on empty input")
    }
  }

  test("dq_audit: one row per constraint, pass iff zero violations, " +
      "and the audit can FAIL (corpus has pre-order shipdates)") {
    val rows = ProfileQueries.queries("dq_audit")(spark, sf).collect()
    assert(rows.length === 11, "one row per declared constraint")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1),
        s"violations within [0, checked]: $r")
      assert(r.getBoolean(3) === (r.getLong(2) == 0L),
        s"passed must mean zero violations: $r")
    }
    val byName = rows.map(r => r.getString(0) -> r).toMap
    // referential integrity and key uniqueness hold on this corpus
    for (c <- Seq("fk_orders_customer", "fk_lineitem_orders",
        "fk_lineitem_part", "fk_lineitem_supplier",
        "unique_orderkey", "unique_custkey"))
      assert(byName(c).getBoolean(3), s"$c should pass")
    // the cross-field order rule is genuinely violated — proves the
    // audit reports failures instead of rubber-stamping
    assert(!byName("order_before_ship").getBoolean(3) &&
      byName("order_before_ship").getLong(2) > 0)
  }

  test("profile: hash-aggregated melt + keyless min/max, broadcast stitch") {
    val df = ProfileQueries.queries("data_profile")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // two deliberate scans (distinct-stats melt + keyless typed min/max);
    // the stitch of the 1-row min/max side must broadcast, never shuffle
    assert(p.linesIterator.count(_.contains("Scan parquet")) === 2,
      s"expected the two profiling passes:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"min/max stitch must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join in profiling:\n$p")
    // every GROUPED aggregate is hash-based — the old single-pass form
    // planned SortAggregate (string min/max buffers over the countDistinct
    // Expand) and sorted #cols × n wide rows three times (3.9 s -> 1.2 s)
    assert(!p.contains("Expand"), s"no countDistinct Expand:\n$p")
    val sortAggWithKeys = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec
        if s.groupingExpressions.nonEmpty => s
    }
    assert(sortAggWithKeys.isEmpty,
      s"grouped aggregates must be hash-based:\n$p")
  }

  test("kmv: small-cardinality groups fall back to the exact count") {
    // sf0.001 has fewer distinct users than k=64, so every group takes
    // the exact-fallback branch — h_k sentinel 0, estimate == exact
    val d = ProfileQueries.kmvDistinct(spark, sf).cache()
    assert(d.count() > 0)
    val nUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(nUsers < ProfileQueries.kmvK, "fixture premise: NDV < k")
    assert(d.filter(col("h_k") =!= 0).isEmpty)
    assert(d.filter(col("n_est") =!= col("n_exact").cast("double")).isEmpty)
    d.unpersist()
    ()
  }

  private def tokenize(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Kirsch–Mitzenmacher row bucket: (h1 + j·h2) mod w over the digest's
    * two 60-bit halves — must mirror ProfileQueries.cmsJBucket. */
  private def cmsBucket(j: Int, token: String): Long = {
    val hx = md5Hex(token)
    val h1 = java.lang.Long.parseLong(hx.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hx.substring(15, 30), 16)
    (h1 + j * h2) % ProfileQueries.cmsWidth
  }

  test("vocab_cms ≡ Scala brute force; overestimate holds for EVERY token") {
    val docs = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val exact = docs.flatMap(tokenize).groupBy(identity)
      .map { case (t, o) => t -> o.length.toLong }
    // brute-force cell table + per-token min-over-rows estimate
    val cells = new scala.collection.mutable.HashMap[(Int, Long), Long]()
    for ((t, c) <- exact; j <- 0 until ProfileQueries.cmsDepth) {
      val b = cmsBucket(j, t)
      cells((j, b)) = cells.getOrElse((j, b), 0L) + c
    }
    def est(t: String): Long = (0 until ProfileQueries.cmsDepth)
      .map(j => cells((j, cmsBucket(j, t))))
      .min
    // the one-sided CMS guarantee, checked on the WHOLE vocabulary (the
    // query's in-plan `overestimate` column only attests the probed top-k)
    for ((t, c) <- exact)
      assert(est(t) >= c, s"CMS must never underestimate: $t")
    val expected = exact.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(ProfileQueries.cmsTopK)
      .map { case (t, c) => (t, c, est(t), true) }
    val got = ProfileQueries.vocabCms(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got === expected)
  }

  test("cms cells are LINEAR: disjoint shards add to the union's cells") {
    // the mergeability claim behind the 100 TB story — cells aggregated
    // per executor / per ingest day combine by plain addition
    import graft.functions.TextFunctions.tokens
    val docs = Tables.documents(spark, sf)
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(tokens(col("text"))).as("token"))
    def cellMap(df: org.apache.spark.sql.DataFrame) =
      ProfileQueries.cmsCells(toks(df)).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val even = cellMap(docs.filter(col("doc_id") % 2 === 0))
    val odd = cellMap(docs.filter(col("doc_id") % 2 === 1))
    val all = cellMap(docs)
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))).toMap
    assert(merged === all)
  }

  test("corpus_divergence ≡ Scala brute force (smoothing, rounding, sums)") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val v = ProfileQueries.cdVocabK
    val rows = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .flatMap(r => tokenize(r.getString(1)).map(t => (r.getString(0), t)))
    val c = rows.groupBy(identity).map { case (k, o) => k -> o.length.toLong }
    val ct = c.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val vocab = ct.toSeq.sortBy { case (t, n) => (-n, t) }.take(v).toMap
    val vsz = vocab.size // actual vocabulary ≤ the cap (31 at sf0.001)
    val srcs = c.keySet.map(_._1)
    val ns = srcs.map(s0 => s0 ->
      vocab.keySet.toSeq.map(t => c.getOrElse((s0, t), 0L)).sum).toMap
    val n = vocab.values.sum
    def term(x: Double): JBD =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).bigDecimal
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = srcs.toSeq.sorted.map { s0 =>
      var kl = new JBD(0); var jp = new JBD(0); var jq = new JBD(0)
      for ((t, ctv) <- vocab) {
        val p = (c.getOrElse((s0, t), 0L) + 1).toDouble / (ns(s0) + vsz)
        val q = (ctv + 1).toDouble / (n + vsz)
        val m = (p + q) / 2
        kl = kl.add(term(p * math.log(p / q)))
        jp = jp.add(term(p * math.log(p / m)))
        jq = jq.add(term(q * math.log(q / m)))
      }
      (s0, ns(s0), round9(kl.doubleValue),
        round9(jp.add(jq).doubleValue / 2))
    }
    val got = ProfileQueries.corpusDivergence(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // semantic bounds: Gibbs (KL ≥ 0) and JS ≤ ln 2, modulo the ≤256·5e-13
    // accumulated term-rounding slack
    for ((_, _, kl, js) <- got) {
      assert(kl >= -1e-9, "KL must be non-negative")
      assert(js >= -1e-9 && js <= math.log(2) + 1e-9, "JS within [0, ln 2]")
    }
  }

  test("corpus_divergence: a single-source corpus has exactly zero drift") {
    // p ≡ q when one source carries the whole corpus, so every rounded
    // term is ln(1)·p = 0 — the output must be EXACTLY 0.0, not merely
    // small (catches any smoothing-denominator asymmetry)
    val tmp = java.nio.file.Files.createTempDirectory("cdzero").toString
    Tables.documents(spark, sf).withColumn("source", lit("only"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = ProfileQueries.corpusDivergence(spark, tmp).collect()
    assert(r.length === 1 && r(0).getString(0) === "only")
    assert(r(0).getDouble(2) === 0.0 && r(0).getDouble(3) === 0.0)
  }

  test("kmv: sketch estimate lands within 3 standard errors at NDV >> k") {
    // synthesize an events table with a known large cardinality; the KMV
    // standard error is ~1/sqrt(k-2), so 3σ at k=64 is ~38%
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kmv").toString
    val n = 5000
    (0 until n).map(i => (i.toLong, java.sql.Timestamp.valueOf(
        "2024-01-01 00:00:00"), i.toLong, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val d = ProfileQueries.kmvDistinct(spark, tmp)
    val row = d.filter(col("event_type") === "click").first()
    assert(row.getAs[Long]("n_exact") === n.toLong)
    val est = row.getAs[Double]("n_est")
    val sigma = 1.0 / math.sqrt(ProfileQueries.kmvK - 2.0)
    assert(math.abs(est - n) / n <= 3 * sigma,
      s"KMV estimate $est vs true $n outside 3 sigma")
  }
}
