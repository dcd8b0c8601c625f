package graft.ops

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`
  * (north-star surface beyond the reference; BASELINE.json): token
  * counting, language ID, quality scoring, document fingerprinting.
  *
  * Everything is a narrow, codegen'd projection — at 100 TB these run at
  * parquet scan speed, column-pruned to (doc_id, text). No UDFs: the
  * heuristics are regex/array Catalyst expressions, bit-identical to the
  * DuckDB oracles.
  */
object TextQueries {

  /** Whitespace + BPE-ish token counts. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      whitespaceTokenCount(col("text")).cast("long").as("ws_tokens"),
      bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions(col("doc_id"))

  /** Stopword-hit language ID. Each language scores by occurrences of its
    * marker words (word-boundary regex count over the lowered text);
    * argmax wins, ties broken by language code. Real pipelines use n-gram
    * models; the *operator shape* (N regex counts + greatest + argmax) is
    * identical. */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|a)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "es" -> "\\b(el|la|de|que|y)\\b",
    "fr" -> "\\b(le|la|et|les|des)\\b",
    "zh" -> "\\b(de|shi|le|wo|ni)\\b")

  /** The argmax language struct {score, lang} over a text column —
    * (score desc, lang asc tiebreak); reused by [[langId]] and the
    * composed curation pipeline. array_sort + element_at because argmax
    * with a secondary tiebreak isn't expressible as array_max. */
  private[ops] def langBest(textCol: Column): Column = {
    val lowered = lower(textCol)
    val scored = langMarkers.map { case (lang, re) =>
      struct(countMatches(lowered, re).as("score"), lit(lang).as("lang"))
    }
    element_at(
      array_sort(array(scored: _*),
        (a, b) => when(a("score") > b("score"), -1)
          .when(a("score") < b("score"), 1)
          .when(a("lang") < b("lang"), -1)
          .when(a("lang") > b("lang"), 1)
          .otherwise(0)), 1)
  }

  def langId(s: SparkSession, dir: String): DataFrame = {
    val best = langBest(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      best("lang").as("pred_lang"),
      best("score").cast("long").as("pred_score"))
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions(col("doc_id"))
  }

  /** The composite 0-100 quality score over a text column — reused by
    * [[qualityScore]] and the composed curation pipeline. */
  private[ops] def qualityExpr(txt: Column): Column = {
    val nTokens = whitespaceTokenCount(txt).cast("double")
    val punct = countMatches(txt, "[^A-Za-z0-9\\s]").cast("double")
    val stop = countMatches(lower(txt), "\\b(the|a|and|of|to)\\b").cast("double")
    round(
      least(nTokens / lit(4.0), lit(50.0))
        + least(stop * lit(5.0), lit(30.0))
        - least(punct, lit(20.0)) + lit(20.0), 6)
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean word
    * length, and a composite 0-100 score — the standard cheap filters. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    val nChars = length(txt).cast("double")
    val nTokens = whitespaceTokenCount(txt).cast("double")
    val punct = countMatches(txt, "[^A-Za-z0-9\\s]").cast("double")
    val stop = countMatches(lower(txt), "\\b(the|a|and|of|to)\\b").cast("double")
    val punctRatio = round(punct / greatest(nChars, lit(1.0)), 6)
    val stopRatio = round(stop / greatest(nTokens, lit(1.0)), 6)
    val meanWordLen = round(nChars / greatest(nTokens, lit(1.0)), 6)
    val score = qualityExpr(txt)
    Tables.documents(s, dir).select(
      col("doc_id"), nTokens.cast("long").as("n_tokens"),
      punctRatio.as("punct_ratio"), stopRatio.as("stopword_ratio"),
      meanWordLen.as("mean_word_len"), score.as("quality"))
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions(col("doc_id"))
  }

  /** Token budget = total corpus tokens div [[bsBudgetDenom]]. */
  val bsBudgetDenom = 4
  /** Quality-bucket width in micro points (5 quality points/bucket). */
  val bsBucketMicro = 5000000L

  /** TOKEN-BUDGET-CONSTRAINED corpus selection — "give me the best
    * documents that fit a 25%-of-corpus token budget", the greedy
    * knapsack every data-mixing recipe runs (quality-ranked selection up
    * to a fixed token count, e.g. the quality-filtered subset sizing in
    * the Llama/phi-style data reports): order docs by (quality desc,
    * doc_id), select while the running token total stays ≤ budget.
    *
    * Shape at 100 TB — the naive form is a GLOBAL sort + global running
    * sum (one partition sees everything). Instead, quality (integer
    * micro points — the 6dp score ×10⁶ is exact) buckets into
    * ≤(100/5)+1 fixed ranges; per-bucket token totals aggregate in one
    * map-side-combined pass, and running bucket totals are a window over
    * the ≤21-row BUCKET table (broadcast-sized, documented bounded).
    * Buckets wholly inside the budget select map-only (true), wholly
    * outside reject map-only (false) — only the ONE boundary bucket pays
    * a within-bucket ordered window, whose input is that bucket's docs,
    * not the corpus. Selection is identical to the global cumsum because
    * buckets are contiguous quality ranges: every higher-bucket doc
    * precedes every lower-bucket doc in greedy order. */
  def budgetSelect(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // localCheckpoint: the regex-heavy quality scan has THREE consumers
    // (budget total, bucket totals, the per-doc join) — without it the
    // scan runs three times (measured 182 s vs a 69 s single-scan floor
    // at x100); the checkpoint is 4 small columns × n rows, paid once
    val q = qualityScore(s, dir)
      .select(col("doc_id"), col("n_tokens"),
        round(col("quality") * 1e6, 0).cast("long").as("q_micro"))
      .withColumn("bkt", expr(s"q_micro div $bsBucketMicro"))
      .localCheckpoint()
    val budget = q.agg(
      expr(s"sum(n_tokens) div $bsBudgetDenom").as("budget"))
    // running totals over the bounded bucket table (≤21 rows: quality is
    // capped at 100 points) — the only unpartitioned window in the plan
    val wB = Window.orderBy(col("bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = q.groupBy("bkt").agg(sum("n_tokens").as("btok"))
      .withColumn("cum_before", coalesce(sum("btok").over(wB), lit(0L)))
      .crossJoin(broadcast(budget))
    val classed = q.join(
      broadcast(buckets.select(col("bkt"), col("cum_before"), col("btok"),
        col("budget"))), Seq("bkt"))
    val isFull = col("cum_before") + col("btok") <= col("budget")
    val isNone = col("cum_before") > col("budget")
    val decided = classed.filter(isFull || isNone)
      .select(col("doc_id"), col("n_tokens"), col("q_micro"),
        isFull.as("selected"))
    val wD = Window.partitionBy("bkt")
      .orderBy(col("q_micro").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = classed.filter(!isFull && !isNone)
      .withColumn("cum", col("cum_before") + sum("n_tokens").over(wD))
      .select(col("doc_id"), col("n_tokens"), col("q_micro"),
        (col("cum") <= col("budget")).as("selected"))
    decided.unionByName(boundary).orderBy("doc_id")
  }

  /** Document fingerprint: min-k sketch (k smallest 60-bit shingle hashes,
    * ascending) — the winnowing-style selection of a stable, order-free
    * content signature; two documents sharing most of their sketch are
    * near-duplicates. Exposed as the sketch's elements for oracle
    * comparability. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    // round-16: md5_longs kernel instead of the interpreted
    // transform(_, md5Long) HOF (guide §1.2 per-task work), and
    // sortWithinPartitions instead of a global orderBy whose range
    // sampling re-ran the whole hash pipeline (the comparator sorts rows
    // itself; same values either way)
    val sketch = slice(
      array_sort(call_function("md5_longs", shingles(tokens(col("text")), 3))),
      1, 8)
    Tables.documents(s, dir).select(
      col("doc_id"),
      concat_ws(",", transform(sketch, _.cast("string"))).as("sketch"))
      .sortWithinPartitions(col("doc_id"))
  }

  /** Gopher-style within-document repetition signals — the standard
    * quality gate a training pipeline runs before dedup (repetitious docs
    * are boilerplate/spam even when globally unique):
    *  - dup_token_frac: 1 − distinct/total tokens,
    *  - top_bigram_frac: occurrences of the most frequent bigram / all
    *    bigram occurrences,
    *  - dup_trigram_frac: occurrences of trigrams seen ≥2× in the doc /
    *    all trigram occurrences.
    *
    * Shape at scale: tokenization happens ONCE (the checkpointed token
    * table); the three n-gram streams union into a single
    * (doc_id, n, gram) count — one map-side-combined shuffle whose keys
    * are per-doc grams (unskewable: a group is one gram of one doc) —
    * followed by one doc_id-keyed pivot agg. The n-gram explode is the
    * codegen'd [[graft.functions.WordNgrams]] multiset kernel (distinct
    * shingles would erase exactly the signal measured here). */
  def repetition(s: SparkSession, dir: String): DataFrame =
    // round-16 (guide §2.4): the 1/2/3-gram counts are per-document, yet
    // the relational form exploded 3× the token stream and shuffled it
    // all on (doc_id, n, gram) + a second doc-keyed pivot aggregate. The
    // repetition_stats kernel counts the three multisets in one local
    // pass per document (exact integers; null total2/total3 for
    // bigram-less docs reproduce the pivot's nulls → same coalesce(0.0)).
    Tables.documents(s, dir)
      .select(col("doc_id"),
        call_function("repetition_stats", tokens(col("text"))).as("st"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"),
        col("st.total1").as("n_tokens"),
        round(lit(1.0) - col("st.dis1") / col("st.total1"), 6)
          .as("dup_token_frac"),
        round(coalesce(col("st.max2") / col("st.total2"), lit(0.0)), 6)
          .as("top_bigram_frac"),
        round(coalesce(col("st.dup3") / col("st.total3"), lit(0.0)), 6)
          .as("dup_trigram_frac"))
      .sortWithinPartitions("doc_id")

  /** PII detection + redaction — the anonymization pass every public-data
    * training pipeline runs before anything else: count and redact emails,
    * IPv4 and IPv6 addresses, E.164 phone numbers, and Luhn-validated
    * card-shaped numbers; flag documents that carried any. Pure codegen'd
    * regex/array projections (regexp_extract_all + regexp_replace + a
    * declarative Luhn fold), so the scrub runs at parquet scan speed at
    * 100 TB — no shuffle, no UDF, per-rule counts for the audit trail.
    *
    * Detector scope, stated precisely (the no-over-fire contract, edge
    * cases pinned in OpsSpec):
    *  - phone: strict E.164 — literal `+` then 8-15 digits, so dates,
    *    timestamps and long ids never fire;
    *  - ipv6: ≥5 colon groups (full or trailing-compressed) — `12:30:45`
    *    has three groups and never fires; leading-compressed `::1` forms
    *    are documented out of scope;
    *  - card: 13-16 digit runs COUNTED only when the Luhn checksum
    *    passes (n_cards is the validated audit count), while the scrub
    *    masks EVERY such run — over-scrubbing is the safe direction for
    *    redaction, over-counting is not for the audit.
    *
    * The synthetic corpus is PII-free, so deterministic slices get PII
    * INJECTED first (first matching rule wins: email mod 7, IPv4 mod 11,
    * phone mod 13, IPv6 mod 17, a Luhn-VALID card mod 19 and a Luhn-
    * INVALID near-twin mod 23 — the invalid plant exercises the checksum
    * rejecting a 16-digit run) — the detectors must then find exactly
    * those and the scrubbed text must hash-match the oracle's redaction
    * (md5 keeps the compared result small; the full scrubbed text is
    * what a real pipeline would emit). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\+[1-9]\\d{7,14}\\b"
  val ipv6Re = "\\b(?:[0-9A-Fa-f]{1,4}:){4,7}(?:[0-9A-Fa-f]{1,4}\\b|:)"
  val cardRe = "\\b\\d{13,16}\\b"

  /** Luhn-valid plant and its checksum-broken near-twin (last digit
    * bumped) — shared with the oracle SQL. */
  private val luhnValidPlant = "4539578763621486"
  private val luhnInvalidPlant = "4539578763621487"

  /** Declarative Luhn checksum over a digit-string column: from the
    * RIGHT, double every second digit (−9 when >9), sum, check mod 10 —
    * transform + aggregate stay inside codegen. */
  private def luhnValid(s: Column): Column = {
    val digits = filter(split(reverse(s), ""), ch => ch =!= "")
    val total = aggregate(
      zip_with(digits,
        sequence(lit(0), size(digits) - 1),
        (ch, i) => {
          val d = ch.cast("int")
          when(i % 2 === 0, d)
            .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
        }),
      lit(0), (acc, x) => acc + x)
    total % 10 === 0
  }

  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val injected = when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com for details")))
      .when(pmod(col("doc_id"), lit(11)) === 0,
        concat(col("text"), lit(" served from 10."),
          pmod(col("doc_id"), lit(256)), lit(".0."),
          pmod(col("doc_id"), lit(100))))
      .when(pmod(col("doc_id"), lit(13)) === 0,
        concat(col("text"), lit(" call +14155550"),
          pmod(col("doc_id"), lit(100))))
      .when(pmod(col("doc_id"), lit(17)) === 0,
        concat(col("text"), lit(" node 2001:db8:85a3:8d3:1319:8a2e:370:"),
          pmod(col("doc_id"), lit(9999))))
      .when(pmod(col("doc_id"), lit(19)) === 0,
        concat(col("text"), lit(s" card $luhnValidPlant")))
      .when(pmod(col("doc_id"), lit(23)) === 0,
        concat(col("text"), lit(s" ref $luhnInvalidPlant")))
      .otherwise(col("text"))
    piiScrubOf(Tables.documents(s, dir)
      .select(col("doc_id"), injected.as("t2")))
  }

  /** The detector/redaction body over (doc_id, t2) — the registered
    * face plants fixtures first; OpsSpec drives this seam with crafted
    * edge strings (timestamps, long ids, checksum-broken cards). */
  private[graft] def piiScrubOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        size(regexp_extract_all(col("t2"), lit(emailRe), lit(0))).cast("long")
          .as("n_emails"),
        size(regexp_extract_all(col("t2"), lit(ipv4Re), lit(0))).cast("long")
          .as("n_ips"),
        size(regexp_extract_all(col("t2"), lit(phoneRe), lit(0))).cast("long")
          .as("n_phones"),
        size(regexp_extract_all(col("t2"), lit(ipv6Re), lit(0))).cast("long")
          .as("n_ipv6"),
        size(filter(regexp_extract_all(col("t2"), lit(cardRe), lit(0)),
          x => luhnValid(x))).cast("long").as("n_cards"),
        md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(col("t2"),
            emailRe, "[EMAIL]"), phoneRe, "[PHONE]"), ipv6Re, "[IPV6]"),
          ipv4Re, "[IP]"), cardRe, "[NUM]")).as("scrub_md5"))
      .withColumn("has_pii", (col("n_emails") + col("n_ips") +
        col("n_phones") + col("n_ipv6") + col("n_cards")) > 0)
      .select("doc_id", "n_emails", "n_ips", "n_phones", "n_ipv6",
        "n_cards", "has_pii", "scrub_md5")
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")

  /** Compression-ratio quality signal — the classic cheap boilerplate/spam
    * detector (highly repetitive text deflates far below prose; Gopher and
    * CCNet both gate on it). No Catalyst expression deflates, so this is
    * the one TEXT operator implemented at the `mapPartitions` batch
    * boundary (same seam as the media codecs — but with a REAL kernel:
    * JDK zlib), one reused Deflater + buffer per partition, zero
    * allocation growth with partition size. Still a narrow per-row pass —
    * scan-speed at 100 TB, no shuffle.
    *
    * Oracle: DuckDB exposes no deflate scalar, so the deflate-derived
    * columns check against a content-addressed FIXTURE
    * (`fixtures/compression_oracle.parquet`, built by
    * `tools/make_compression_fixture.py` with PYTHON's zlib — an
    * independent runtime from the JVM Deflater, verified byte-identical
    * on this corpus: zlib 1.2.13 both sides) joined on md5(text). A
    * zlib-build divergence or text regeneration surfaces as a loud
    * mismatch, exactly like any other content drift; OpsSpec
    * additionally pins the signal's semantic properties (repetitive
    * text deflates below prose, ratio bounds, determinism) per-JVM. */
  def compressionRatio(s: SparkSession, dir: String): DataFrame =
    compressionRatioOf(s, Tables.documents(s, dir).select("doc_id", "text"))

  private[graft] def compressionRatioOf(s: SparkSession, d: DataFrame): DataFrame = {
    import s.implicits._
    val rows = d.select("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          (id, raw.length.toLong, compressed)
        }
      }
      .toDF("doc_id", "raw_bytes", "deflate_bytes")
    // greatest(raw,1): an empty document gets a defined (if degenerate)
    // ratio instead of null poisoning low_entropy. The ratio buckets to
    // integer PERCENT via integer division — exact in both engines,
    // where a 2-decimal double round diverges on half cases (Spark
    // rounds the decimal string, DuckDB the binary double: 0.575 →
    // 0.58 vs 0.57, measured at sf0.1)
    rows.select(col("doc_id"), col("raw_bytes"), col("deflate_bytes"),
        expr("deflate_bytes * 100 DIV greatest(raw_bytes, 1L)")
          .as("ratio_pct"))
      .withColumn("low_entropy", col("ratio_pct") < 35)
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
  }

  /** Unicode normalization (accent strip, NFD→drop marks→NFC) — the pass
    * every multilingual pipeline runs before tokenization/hashing so that
    * `Café` and `Café` (precomposed vs decomposed) and `Cafe` dedupe and
    * tokenize identically. Codegen'd native expression
    * ([[graft.functions.StripAccentsNfc]], with an allocation-free ASCII
    * fast path) — scan speed at 100 TB. The synthetic corpus is pure
    * ASCII, so a deterministic slice gets accented text INJECTED
    * (doc_id ≡ 0 mod 13) and the normalized md5 must match DuckDB's
    * `strip_accents`. */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.NormalizeFunctions.stripAccentsNfc
    val injected = when(pmod(col("doc_id"), lit(13)) === 0,
        concat(col("text"), lit(" Café Zürich naïve São Paulo résumé")))
      .otherwise(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), injected.as("t2"))
      .select(col("doc_id"),
        md5(stripAccentsNfc(col("t2"))).as("norm_md5"),
        (stripAccentsNfc(col("t2")) =!= col("t2")).as("changed"))
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
  }

  /** Deterministic per-document URL synthesis — the corpus carries no
    * URL column (`source` is an opaque label), so, exactly like the
    * media payloads ([[MediaQueries.mediaTable]]) and the injected
    * accents above, each document gets a URL built from doc_id
    * arithmetic: mixed-case schemes and hosts, explicit default and
    * non-default ports, `utm_*`/`fbclid` tracking params, unsorted
    * query keys, fragments, and percent-escapes in the path —
    * unreserved ones (`%7E`/`%41` → `~`/`A`, decoded) and a reserved
    * one (`%2f` → `%2F`, hex-uppercased only), so the §6.2.2
    * normalization is exercised by the ORACLE, not just the property
    * suite. The DuckDB oracle re-synthesizes BOTH the
    * raw url and its expected canonical form from the same arithmetic
    * ([[urlSynthSql]]), so the Spark side's real parser
    * ([[graft.functions.UrlCanonUtil]]) is checked end to end. By
    * construction the canonical form is a function of doc_id mod 100
    * (every varying residue divides 100), so a 500-doc corpus carries
    * genuine 5-way URL aliases for [[DedupQueries]]'s `dedup_url`. */
  private[ops] def syntheticUrl: Column = {
    val id = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    val schemeRaw = when(id % 4 === 0, "https").when(id % 4 === 1, "HTTP")
      .when(id % 4 === 2, "http").otherwise("HTTPS")
    val host = concat(lit("example"), s(id % 50), lit(".com"))
    val hostRaw = when(id % 3 === 1, upper(host)).otherwise(host)
    val portRaw = when(id % 5 === 0,
        when(id % 4 === 0 || id % 4 === 3, ":443").otherwise(":80"))
      .when(id % 5 === 1, lit(":8080")).otherwise(lit(""))
    val utm = when(id % 3 === 0,
        concat(lit("utm_source=feed&utm_campaign=c"), s(id % 9), lit("&")))
      .otherwise(lit(""))
    val kept = when(id % 2 === 1, concat(lit("ref=nav&id="), s(id % 100)))
      .otherwise(concat(lit("id="), s(id % 100)))
    val fb = when(id % 7 === 0, concat(lit("&fbclid=F"), s(id)))
      .otherwise(lit(""))
    val frag = when(id % 4 === 0, concat(lit("#sec"), s(id % 5)))
      .otherwise(lit(""))
    val pathPfx = when(id % 10 === 3, lit("/p/%7Eu%41/"))
      .when(id % 10 === 7, lit("/p/a%2fb/"))
      .otherwise(lit("/p/"))
    concat(schemeRaw, lit("://"), hostRaw, portRaw,
      pathPfx, s(id % 20), lit("?"), utm, kept, fb, frag)
  }

  /** DuckDB mirror of [[syntheticUrl]] + the EXPECTED canonical form —
    * a CTE `u(doc_id, url, canonical_url)` over `documents`. The
    * canonical side is recomputed from the generative parameters (the
    * media-checksum oracle trick), not by string surgery, so any parser
    * deviation fails the hash. */
  // NOTE: no line in this block may BEGIN with '||' — the consuming
  // oracle templates interpolate it and then run their own stripMargin,
  // which would eat the first '|' of a line-leading concat operator
  private[ops] val urlSynthSql: String =
    """u AS (
      |  SELECT doc_id,
      |    (CASE doc_id % 4 WHEN 0 THEN 'https' WHEN 1 THEN 'HTTP'
      |          WHEN 2 THEN 'http' ELSE 'HTTPS' END) || '://' ||
      |    (CASE WHEN doc_id % 3 = 1
      |          THEN upper('example' || CAST(doc_id % 50 AS VARCHAR) || '.com')
      |          ELSE 'example' || CAST(doc_id % 50 AS VARCHAR) || '.com' END) ||
      |    (CASE WHEN doc_id % 5 = 0
      |          THEN (CASE WHEN doc_id % 4 IN (0, 3) THEN ':443' ELSE ':80' END)
      |          WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END) ||
      |    (CASE WHEN doc_id % 10 = 3 THEN '/p/%7Eu%41/'
      |          WHEN doc_id % 10 = 7 THEN '/p/a%2fb/' ELSE '/p/' END) ||
      |    CAST(doc_id % 20 AS VARCHAR) || '?' ||
      |    (CASE WHEN doc_id % 3 = 0
      |          THEN 'utm_source=feed&utm_campaign=c' ||
      |               CAST(doc_id % 9 AS VARCHAR) || '&' ELSE '' END) ||
      |    (CASE WHEN doc_id % 2 = 1
      |          THEN 'ref=nav&id=' || CAST(doc_id % 100 AS VARCHAR)
      |          ELSE 'id=' || CAST(doc_id % 100 AS VARCHAR) END) ||
      |    (CASE WHEN doc_id % 7 = 0
      |          THEN '&fbclid=F' || CAST(doc_id AS VARCHAR) ELSE '' END) ||
      |    (CASE WHEN doc_id % 4 = 0
      |          THEN '#sec' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END)
      |      AS url,
      |    (CASE WHEN doc_id % 4 IN (0, 3) THEN 'https' ELSE 'http' END) ||
      |    '://example' || CAST(doc_id % 50 AS VARCHAR) || '.com' ||
      |    (CASE WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END) ||
      |    (CASE WHEN doc_id % 10 = 3 THEN '/p/~uA/'
      |          WHEN doc_id % 10 = 7 THEN '/p/a%2Fb/' ELSE '/p/' END) ||
      |    CAST(doc_id % 20 AS VARCHAR) ||
      |    '?id=' || CAST(doc_id % 100 AS VARCHAR) ||
      |    (CASE WHEN doc_id % 2 = 1 THEN '&ref=nav' ELSE '' END)
      |      AS canonical_url
      |  FROM documents)""".stripMargin

  /** URL CANONICALIZATION — C4's stage-one preprocessing (Raffel et al.
    * JMLR'20 §2.2 dedups Common Crawl BY URL before anything touches
    * the text): lowercase scheme/host, strip default ports / fragments
    * / tracking params (`utm_*`, `fbclid`, `gclid`, `msclkid`), sort
    * the surviving query params. One codegen'd projection on the scan
    * path ([[graft.functions.UrlCanon]] — the html_extract kernel
    * pattern; a regex chain would be N interpreted passes), so at
    * 100 TB this is a map-only scan: no shuffle, no state. */
  def urlNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), syntheticUrl.as("url"))
      .select(col("doc_id"), col("url"),
        call_function("url_canonicalize", col("url")).as("canonical_url"))
      .withColumn("changed", col("url") =!= col("canonical_url"))
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")

  /** The host of each document's canonical URL — one codegen projection
    * (canonicalize, then slice between `://` and the next `/`), shared
    * by the two host-level operators below. Canonical host here =
    * `example{doc_id % 50}.com` by the synthesis arithmetic, which is
    * what the oracle recomputes. */
  private def urlHost: Column = {
    val canon = call_function("url_canonicalize", syntheticUrl)
    val afterScheme = substring_index(canon, "://", -1)
    // authority up to the path, then drop any non-default port
    substring_index(substring_index(afterScheme, "/", 1), ":", 1)
  }

  /** HOST-LEVEL corpus statistics — the aggregation behind every
    * domain-level curation decision (CCNet groups Common Crawl by
    * domain for its per-domain quality view; C4 maintains domain
    * badlists): docs, chars, mean length, languages per canonical host.
    * One hash aggregate keyed by host (map-side combined). A hot host —
    * real in any crawl — skews only this groupBy's reduce side; the
    * aggregate is sum-shaped, so AQE's skew handling applies and
    * nothing downstream re-touches per-doc rows. */
  def urlHostStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(urlHost.as("host"), col("n_chars"), col("lang"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(sum(col("n_chars")) / count(lit(1)), 6).as("mean_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("host")

  /** Hosts dropped outright by [[hostFilter]] — the C4-style domain
    * badlist (tiny, broadcast). */
  val blockedHosts = Seq("example7.com", "example13.com")

  /** DOMAIN-LEVEL document gate — the CCNet per-domain quality rule:
    * drop a document if its host is on the badlist, or if its host's
    * MEAN document length falls below the corpus mean (short-doc farms —
    * link lists, tag pages — are a domain-level phenomenon; per-doc
    * gates can't see them). Reason precedence: blocked_domain first.
    * Shape at 100 TB: one host-keyed aggregate (the [[urlHostStats]]
    * plan) joined back to the docs on the host key — an equi-join
    * against a #hosts-sized side (millions of rows at crawl scale, so
    * NOT forced broadcast; AQE picks), plus a 1-row corpus-mean
    * broadcast. */
  def hostFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), urlHost.as("host"), col("n_chars"))
      .localCheckpoint() // feeds the host aggregate AND the verdict join
    val hostMeans = docs.groupBy("host")
      .agg((sum(col("n_chars")) / count(lit(1))).as("host_mean"))
    val corpusMean = docs.agg(
      (sum(col("n_chars")) / count(lit(1))).as("corpus_mean"))
    docs.join(hostMeans, Seq("host"))
      .crossJoin(broadcast(corpusMean)) // 1-row threshold (allowlisted)
      .select(col("doc_id"), col("host"),
        when(col("host").isin(blockedHosts: _*), "blocked_domain")
          .when(col("host_mean") < col("corpus_mean"), "low_quality_host")
          .as("reason"))
      .withColumn("keep", col("reason").isNull)
      .orderBy("doc_id")
  }

  /** Bigram LANGUAGE-MODEL likelihood — the CCNet/KenLM-style fluency
    * filter at n=2, self-trained on the corpus: MLE p(w₂|w₁) =
    * c(w₁w₂)/c(w₁); per-document score = mean ln p over its bigram
    * OCCURRENCES (multiset, the codegen `word_ngrams` kernel). Documents
    * whose word transitions are corpus-typical score near 0; gibberish /
    * wrong-language / shuffled text scores strongly negative — the
    * model-based quality gate the heuristic filters ([[qualityScore]],
    * repetition, compression) can't express.
    *
    * Shape at scale: tokenize ONCE (checkpoint), two count aggregates
    * (unigram + bigram vocab — vocabulary-sized, map-side combined), the
    * prob table joins postings ON THE GRAM (the tfidf join shape, skew
    * bounded by bigram df), one per-doc mean. ln on both engines is libm;
    * round(6) absorbs the ≤1-ulp divergence. */
  def bigramLm(s: SparkSession, dir: String): DataFrame =
    bigramLmScores(s, dir).orderBy("doc_id")

  /** [[bigramLm]] without the presentation sort — the scored corpus
    * [[lmPplBuckets]] consumes (a range sort it would immediately
    * re-shuffle away is pure waste at corpus scale). */
  private def bigramLmScores(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .localCheckpoint()
    val big = toks.select(col("doc_id"), explode(wordNgrams(col("t"), 2)).as("g"))
    val uni = toks.select(explode(col("t")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val prob = big.groupBy("g").agg(count(lit(1)).as("c2"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(uni, Seq("w1"))
      .select(col("g"),
        (log(col("c2").cast("double")) - log(col("c1").cast("double")))
          .as("lnp"))
    val perDoc = big.join(prob, Seq("g"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(col("lnp")), 6).as("avg_lnp"))
    Tables.documents(s, dir).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_lnp"))
  }

  /** CCNet PERPLEXITY BUCKETS — the head/middle/tail split of Wenzek
    * et al. (LREC 2020 §4.3): score every document with the self-trained
    * bigram LM ([[bigramLm]]'s mean ln p), cut the corpus at its exact
    * score TERTILES, and keep head+middle (CCNet trains on them; the
    * tail is the gibberish/wrong-language third). The model-based
    * counterpart of the rule gates ([[qualityFilter]]) — this is the
    * operator CCNet actually ships, with the bucket label kept so a
    * mixture policy can also weight buckets instead of dropping.
    *
    * Tertile thresholds are EXACT rank statistics, not sketches: the
    * score histogram (NDV can reach corpus scale — per-doc means are
    * near-unique) runs through the eval family's DISTRIBUTED two-pass
    * prefix sum ([[EvalQueries.prefixedHistogram]] — no global ordered
    * window), and each threshold is a 1-row min-aggregate over the
    * cumulative counts (t1 = min score with 3·cum ≥ n; t2 = min score
    * with 3·cum ≥ 2n), broadcast back onto the corpus scan. Documents
    * too short to have a bigram score (avg_lnp NULL) bucket as 'empty'
    * and are dropped — CCNet has no evidence to keep them. Determinism:
    * scores are round(,6) doubles identical in both engines, and the
    * thresholds are mins over that same grid under integer-count
    * conditions, so every `>=` comparison is engine-exact. */
  def lmPplBuckets(s: SparkSession, dir: String): DataFrame = {
    val scored = bigramLmScores(s, dir).localCheckpoint()
    val hist = scored.filter(col("avg_lnp").isNotNull)
      .groupBy(col("avg_lnp").as("score"))
      .agg(count(lit(1)).as("np"))
      .withColumn("nn", lit(0L))
    val cum = EvalQueries.prefixedHistogram(hist, desc = false)
      .localCheckpoint() // two threshold consumers + the totals row
    val tot = cum.agg(sum(col("np")).as("n_docs"))
    def cutAt(mult: Int, name: String) =
      cum.crossJoin(broadcast(tot)) // 1-row totals (allowlisted class)
        .filter(col("cum_np") * 3 >= col("n_docs") * mult)
        .agg(min(col("score")).as(name))
    scored
      .crossJoin(broadcast(cutAt(1, "t1"))) // 1-row thresholds
      .crossJoin(broadcast(cutAt(2, "t2")))
      .select(col("doc_id"), col("avg_lnp"),
        when(col("avg_lnp").isNull, lit("empty"))
          .when(col("avg_lnp") >= col("t2"), lit("head"))
          .when(col("avg_lnp") >= col("t1"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .withColumn("keep", col("bucket").isin("head", "middle"))
      // presentation order only: a global orderBy would sample-execute
      // the LM + threshold chain twice (the debezium_ingest lesson)
      .sortWithinPartitions("doc_id")
  }

  /** Gopher/C4-style composite RULE filter — the document-admission gate a
    * training pipeline runs before dedup, emitting one boolean per rule
    * plus the conjunction (so downstream can both filter and audit WHY a
    * document dropped):
    *  - r_len: token count within [[qfMinTokens]], [[qfMaxTokens]];
    *  - r_wordlen: mean non-space word length within sane bounds (garbled
    *    or agglutinated text fails);
    *  - r_repeat: duplicate-token fraction ≤ [[qfMaxDupFrac]] (Gopher's
    *    core repetition gate, the doc-local twin of `text_repetition`);
    *  - r_stop: ≥ [[qfMinStopwords]] distinct stopword markers present
    *    (C4's "natural language, not keyword soup" heuristic);
    *  - r_quality: the composite [[qualityExpr]] score ≥ [[qfMinQuality]].
    *
    * Shape at scale: a single codegen'd projection over (doc_id, text) —
    * no shuffle, no aggregate; rule thresholds compare UNROUNDED doubles
    * computed identically here and in the oracle, so no boundary row can
    * flip between engines. */
  val qfMinTokens = 20
  val qfMaxTokens = 80
  val qfMaxDupFrac = 0.6
  val qfMinStopwords = 2
  val qfMinQuality = 50.0

  /** The five rule booleans ANDed into one admission predicate — the
    * reusable form of [[qualityFilter]]'s gate (CurationQueries'
    * training manifest composes it). Same codegen projection. */
  private[ops] def qualityKeepCol(text: Column): Column = {
    val t = tokens(text)
    val nTokens = size(t).cast("double")
    val wchars = length(regexp_replace(text, "\\s+", "")).cast("double")
    val meanWlen = wchars / greatest(nTokens, lit(1.0))
    val dupFrac =
      lit(1.0) - size(array_distinct(t)).cast("double") / greatest(nTokens, lit(1.0))
    val nStop = Seq("the", "a", "and", "of", "to")
      .map(w => array_contains(t, w).cast("int")).reduce(_ + _)
    nTokens.between(qfMinTokens, qfMaxTokens) &&
      meanWlen.between(3.5, 4.6) && (dupFrac <= qfMaxDupFrac) &&
      (nStop >= qfMinStopwords) && (qualityExpr(text) >= qfMinQuality)
  }

  def qualityFilter(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val nTokens = size(t).cast("double")
    val wchars = length(regexp_replace(col("text"), "\\s+", "")).cast("double")
    val meanWlen = wchars / greatest(nTokens, lit(1.0))
    val dupFrac =
      lit(1.0) - size(array_distinct(t)).cast("double") / greatest(nTokens, lit(1.0))
    val nStop = Seq("the", "a", "and", "of", "to")
      .map(w => array_contains(t, w).cast("int")).reduce(_ + _)
    val rLen = nTokens.between(qfMinTokens, qfMaxTokens)
    val rWordlen = meanWlen.between(3.5, 4.6)
    val rRepeat = dupFrac <= qfMaxDupFrac
    val rStop = nStop >= qfMinStopwords
    val rQuality = qualityExpr(col("text")) >= qfMinQuality
    Tables.documents(s, dir).select(
      col("doc_id"),
      nTokens.cast("long").as("n_tokens"),
      round(meanWlen, 6).as("mean_word_len"),
      round(dupFrac, 6).as("dup_token_frac"),
      nStop.cast("long").as("n_stopwords"),
      rLen.as("r_len"), rWordlen.as("r_wordlen"), rRepeat.as("r_repeat"),
      rStop.as("r_stop"), rQuality.as("r_quality"),
      (rLen && rWordlen && rRepeat && rStop && rQuality).as("keep"))
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
  }

  /** Per-document unigram Shannon entropy — the information-density QC
    * signal ([[compressionRatio]]'s model-free cousin): low entropy =
    * repetitive/templated text, high ≈ ln(n_distinct) = diverse. Also
    * emits entropy normalized by its ln(n_tokens) ceiling.
    *
    * Determinism: each token's −p·ln p term is a fixed IEEE tree
    * (p = tf/dl in doubles, libm ln), rounded to 9 dp and summed in
    * DECIMAL — order-independent, same trick as [[CurationQueries
    * .bm25Topk]]. Shape: tokenize once, two doc_id-keyed aggregates and
    * one co-partitioned join — no corpus-global state at all, so the
    * operator is embarrassingly parallel at any scale. */
  def textEntropy(s: SparkSession, dir: String): DataFrame =
    textEntropyOf(Tables.documents(s, dir))

  def textEntropyOf(docsDf: DataFrame): DataFrame = {
    // round-16 (guide §2.4): the per-document Shannon entropy needed NO
    // cross-document state, yet the relational form shuffled every token
    // on (doc_id, token) twice (tf groupBy + doc-length groupBy + join).
    // The entropy_stats kernel folds the whole tf pass into the scan —
    // exact integer counts, the per-distinct-token term frozen at the
    // identical round(_, 9) before an exact integer-nanos sum (the same
    // free-reassociation argument as the decimal(28,9) sum it replaces).
    // hsum_nanos/1e9 as double == the old decimal→double cast: both are
    // one correctly-rounded IEEE operation from the same exact rational.
    val hsumD = col("st.hsum_nanos").cast("double") / lit(1e9)
    docsDf
      .select(col("doc_id"),
        call_function("entropy_stats", tokens(col("text"))).as("st"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"), col("st.n_tokens").as("n_tokens"),
        col("st.n_distinct").as("n_distinct"),
        round(hsumD, 6).as("entropy"),
        round(when(col("st.n_tokens") > 1,
          hsumD / log(col("st.n_tokens").cast("double")))
          .otherwise(lit(0.0)), 6).as("norm_entropy"))
      .sortWithinPartitions("doc_id")
  }

  /** Winnowing gram length (chars) and hash-window size; expected
    * fingerprint density is 2/([[winnowW]]+1). */
  val winnowK = 16
  val winnowW = 8

  /** The selected-fingerprint set (doc_id, h, pos) of winnowing
    * (Schleimer–Wilkerson–Aiken, SIGMOD'03 — the MOSS algorithm): hash
    * every [[winnowK]]-char gram, slide a [[winnowW]]-hash window, keep
    * each window's MINIMUM hash, rightmost position on ties (the
    * `(h, -pos)` struct min — Spark and DuckDB share lexicographic
    * struct ordering, so the oracle replicates it exactly). Leading
    * partial windows select from what is present, so any doc with ≥ 1
    * gram yields ≥ 1 fingerprint.
    *
    * Guarantee (the reason to prefer this over 0-mod-p sampling,
    * [[DedupQueries.substringDedupSampled]]): two documents sharing any
    * substring of length ≥ winnowW + winnowK − 1 share at least one
    * selected fingerprint — deterministic, not just in expectation.
    * Shape: a ZERO-SHUFFLE scan projection — the whole gram-hash +
    * sliding-min + distinct pass is the codegen'd
    * [[graft.functions.WinnowFps]] kernel (round-16 optimization,
    * guide §2.4/§1.2: the relational form shuffled EVERY gram hash
    * doc-keyed and sorted it for the window; the kernel computes the
    * identical selected set — pinned by OpsSpec fixtures and the
    * unchanged DuckDB oracles — inside the scan, and only the
    * 2/(w+1)-sampled fingerprints ever leave the map side). */
  def winnowFingerprintsOf(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"),
        explode(call_function("winnow_fps", col("text"),
          lit(winnowK), lit(winnowW))).as("fp"))
      .select(col("doc_id"), col("fp.h").as("h"), col("fp.pos").as("pos"))

  /** Per-document winnowing fingerprint summary: gram count, selected
    * count, density (≈ 2/(w+1) on random text; bounded in [1/w, 1]
    * for docs with ≥ winnowW grams), and the 8 smallest selected hashes
    * as the exchangeable sketch. */
  def winnow(s: SparkSession, dir: String): DataFrame =
    winnowOf(Tables.documents(s, dir))

  def winnowOf(docsDf: DataFrame): DataFrame =
    // single-scan projection: the [[graft.functions.WinnowSummary]] kernel
    // folds the per-doc selected set to (n_selected, 8-smallest-distinct
    // sketch) inline, so the former groupBy + fan-back join (and their
    // exchanges) vanish entirely; sortWithinPartitions because the
    // comparator sorts rows itself and a global orderBy would sample the
    // child for range bounds, running the kernel twice (round-15 lesson)
    docsDf
      .select(col("doc_id"),
        greatest(length(col("text")) - (winnowK - 1), lit(0))
          .cast("long").as("n_grams"),
        call_function("winnow_summary", col("text"),
          lit(winnowK), lit(winnowW), lit(8)).as("s"))
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("s.n_selected"), lit(0L)).as("n_selected"),
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(round(coalesce(col("s.n_selected"), lit(0L)) /
            col("n_grams").cast("double"), 6)).as("density"),
        coalesce(col("s.sketch"), lit("")).as("sketch"))
      .sortWithinPartitions("doc_id")

  /** Cross-document duplication signal on the winnowed fingerprints —
    * MOSS proper (Schleimer et al. §4): a fingerprint selected in ≥ 2
    * documents marks shared text, and winnowing's guarantee makes the
    * detector COMPLETE for shared substrings ≥ winnowW + winnowK − 1
    * chars — the deterministic-recall twin of
    * [[DedupQueries.substringDedupSampled]] (whose 0-mod-p selection
    * detects the same length only in expectation). Same per-doc QC
    * columns (selected / duplicated-selected / ratio) a corpus gate
    * thresholds on; same scale shape — the postings table is the
    * already-2/(w+1)-sampled fingerprint set, so the shuffle is ~4×
    * smaller than the exact substring_dedup postings pass. */
  def winnowDedup(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val fp = winnowFingerprintsOf(d).localCheckpoint() // count + fan-back
    val dupH = fp.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("c"))
      .filter(col("c") > 1).select("h")
    val agg = fp.join(dupH.withColumn("is_dup", lit(1L)), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fingerprints"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_shared"))
    d.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_fingerprints"), lit(0L)).as("n_fingerprints"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("n_fingerprints"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(coalesce(col("n_shared"), lit(0L)) /
            col("n_fingerprints").cast("double"), 6)).as("shared_frac"))
      .orderBy("doc_id")
  }

  /** Ingestion-order winnow dedup — the BATCH face of
    * [[graft.streaming.WinnowStream]] and the keep/drop decision a
    * pipeline actually executes over [[winnowDedup]]'s signal: a document
    * is DROPPED when at least half of its winnow fingerprints were
    * already selected by an earlier (smaller doc_id) document — i.e.
    * `2·n_shared_prior ≥ n_fingerprints`, an integer rule with no
    * float division, bit-exact in both engines. Because the fingerprint
    * index a stream maintains contains EVERY processed document, the
    * keep set is a pure function of the id-ordered corpus
    * (`first_id(h) < doc_id` ⟺ h was already indexed when the doc
    * arrived), which is what makes the streaming face batching-invariant
    * (WinnowStreamSpec pins stream ≡ this query across splits).
    * Fingerprint-less docs (text < [[winnowK]] chars) keep — nothing to
    * match on. Shape: the 2/(w+1)-sampled fingerprint table, one
    * min-groupBy on h, one fan-back groupBy on doc_id — all linear,
    * h-keyed shuffles (the substring_dedup postings geometry). */
  def winnowIngest(s: SparkSession, dir: String): DataFrame =
    winnowIngestOf(Tables.documents(s, dir))

  def winnowIngestOf(docsDf: DataFrame): DataFrame = {
    val fp = winnowFingerprintsOf(docsDf).localCheckpoint() // first + fan-back
    val first = fp.groupBy("h").agg(min(col("doc_id")).as("first_id"))
    val agg = fp.join(first, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fingerprints"),
        sum(when(col("first_id") < col("doc_id"), 1L).otherwise(0L))
          .as("n_shared_prior"))
    docsDf.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_fingerprints"), lit(0L)).as("n_fingerprints"),
        coalesce(col("n_shared_prior"), lit(0L)).as("n_shared_prior"),
        (coalesce(col("n_fingerprints"), lit(0L)) === 0 ||
          coalesce(col("n_shared_prior"), lit(0L)) * 2 <
            coalesce(col("n_fingerprints"), lit(0L))).as("keep"))
      .orderBy("doc_id")
  }

  /** The markup/boilerplate block [[htmlExtract]] appends to a
    * deterministic corpus slice (doc_id ≡ 0 mod 5) — one line per
    * extraction rule: a 2-href nav bar (link density), a javascript
    * notice, a 2-word footer (short line), and one REAL content line
    * wrapped in tags with entities (must survive, decoded). */
  private val htmlMarkup =
    "\n<div class=\"nav\"><a href=\"/home\">Home</a> " +
      "<a href=\"/about\">About</a></div>" +
      "\nPlease enable javascript to continue browsing." +
      "\nCopyright 2023" +
      "\n<p>Paragraph text extracted from &quot;markup&quot; " +
      "&amp; entities kept here.</p>"

  /** HTML/boilerplate extraction — the FIRST real step on web crawl
    * (C4, Raffel et al. JMLR'20 §2.2; CCNet, Wenzek et al. LREC'20):
    * strip tags, decode entities, drop boilerplate lines (short lines,
    * javascript notices, link-dense nav bars), keep prose. The whole
    * recipe is the single codegen'd pass of
    * [[graft.functions.HtmlExtractUtil]] — scan speed at 100 TB, no
    * shuffle, no per-line lambda (the blocklist_hits lesson). The
    * synthetic corpus is markup-free, so a deterministic slice gets
    * [[htmlMarkup]] INJECTED (the pii_scrub pattern); plain documents
    * must pass through byte-identical (`changed = false` here, byte
    * equality pinned in OpsSpec), which is what makes the extractor
    * safe to run unconditionally at the head of a pipeline. */
  def htmlExtract(s: SparkSession, dir: String): DataFrame = {
    val injected = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"), lit(htmlMarkup)))
      .otherwise(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), injected.as("t2"))
      .withColumn("h", call_function("html_extract", col("t2")))
      .select(col("doc_id"), col("h.n_lines").as("n_lines"),
        col("h.n_kept").as("n_kept"),
        (col("h.clean") =!= col("t2")).as("changed"),
        md5(col("h.clean")).as("clean_md5"))
      // sortWithinPartitions: comparator sorts rows; a global orderBy would
      // re-run the map-only pipeline for range-bound sampling (round-16)
      .sortWithinPartitions("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "html_extract" -> (htmlExtract _),
    "text_winnow" -> (winnow _),
    "winnow_dedup" -> (winnowDedup _),
    "winnow_ingest" -> (winnowIngest _),
    "takedown_replay_winnow" ->
      (graft.streaming.Takedown.takedownReplayWinnow _),
    "text_entropy" -> (textEntropy _),
    "quality_filter" -> (qualityFilter _),
    "text_bigram_lm" -> (bigramLm _),
    "lm_ppl_buckets" -> (lmPplBuckets _),
    "text_normalize" -> (textNormalize _),
    "url_normalize" -> (urlNormalize _),
    "url_host_stats" -> (urlHostStats _),
    "host_filter" -> (hostFilter _),
    "text_compression" -> (compressionRatio _),
    "pii_scrub" -> (piiScrub _),
    "text_token_count" -> (tokenCount _),
    "text_lang_id" -> (langId _),
    "text_quality" -> (qualityScore _),
    "budget_select" -> (budgetSelect _),
    "text_fingerprint" -> (fingerprint _),
    "text_repetition" -> (repetition _))

  private def duckCount(input: String, re: String) =
    s"length(regexp_extract_all($input, '$re'))"

  /** Shared oracle CTE block ending in `fp(doc_id, h, pos)` — the DuckDB
    * replica of [[winnowFingerprintsOf]]. fp MATERIALIZED: winnow_dedup
    * references it twice. */
  private lazy val winnowFpCtes =
    s"""idx AS (
       |  SELECT unnest(generate_series(1,
       |    (SELECT max(length(text)) FROM documents) - ${winnowK - 1}))
       |    AS pos),
       |g AS (
       |  SELECT d.doc_id, i.pos,
       |    ('0x' || substr(md5(substr(d.text, i.pos, $winnowK)), 1, 15))
       |      ::BIGINT AS h
       |  FROM documents d
       |  JOIN idx i ON i.pos <= length(d.text) - ${winnowK - 1}),
       |sel AS (
       |  SELECT doc_id, min({'h': h, 'npos': -pos}) OVER
       |    (PARTITION BY doc_id ORDER BY pos
       |     ROWS BETWEEN ${winnowW - 1} PRECEDING AND CURRENT ROW) AS m
       |  FROM g),
       |fp AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, m.h AS h, -m.npos AS pos FROM sel)""".stripMargin

  /** quality_filter's rule CTE chain ending in
    * `f(doc_id, n_tokens, mean_wlen, dup_frac, n_stop, quality)` and the
    * ANDed keep predicate over `f`'s columns — shared with the
    * training-manifest oracle in CurationQueries. */
  private[ops] lazy val qualityCtes =
    s"""m AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'),
       |                t -> t != '') AS t,
       |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
       |      AS wchars,
       |    CAST(${duckCount("text", "[^A-Za-z0-9\\s]")} AS DOUBLE) AS punct,
       |    CAST(${duckCount("lower(text)", "\\b(the|a|and|of|to)\\b")} AS DOUBLE)
       |      AS stop
       |  FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    CAST(length(t) AS DOUBLE) AS n_tokens,
       |    wchars / greatest(CAST(length(t) AS DOUBLE), 1.0) AS mean_wlen,
       |    1.0 - CAST(length(list_distinct(t)) AS DOUBLE)
       |          / greatest(CAST(length(t) AS DOUBLE), 1.0) AS dup_frac,
       |    (CASE WHEN list_contains(t, 'the') THEN 1 ELSE 0 END +
       |     CASE WHEN list_contains(t, 'a')   THEN 1 ELSE 0 END +
       |     CASE WHEN list_contains(t, 'and') THEN 1 ELSE 0 END +
       |     CASE WHEN list_contains(t, 'of')  THEN 1 ELSE 0 END +
       |     CASE WHEN list_contains(t, 'to')  THEN 1 ELSE 0 END) AS n_stop,
       |    round(least(n_tokens_q / 4.0, 50.0) + least(stop * 5.0, 30.0)
       |      - least(punct, 20.0) + 20.0, 6) AS quality
       |  FROM (SELECT *, CAST(length(t) AS DOUBLE) AS n_tokens_q FROM m))""".stripMargin

  private[ops] lazy val qualityKeepSql =
    s"""(n_tokens BETWEEN $qfMinTokens AND $qfMaxTokens)
       |    AND (mean_wlen BETWEEN 3.5 AND 4.6)
       |    AND dup_frac <= $qfMaxDupFrac
       |    AND n_stop >= $qfMinStopwords
       |    AND quality >= $qfMinQuality""".stripMargin

  /** [[htmlMarkup]] as a DuckDB literal ('\n' → chr(10) so the string
    * is byte-identical to the Spark injection). */
  private lazy val htmlMarkupSql = htmlMarkup.split("\n", -1).drop(1)
    .map(l => s"chr(10) || '$l'").mkString(" || ")

  /** Shared bigram-LM oracle CTE block ending in `per(doc_id,
    * n_bigrams, avg_lnp)` — the DuckDB replica of [[bigramLmScores]],
    * shared by the text_bigram_lm and lm_ppl_buckets oracles so the
    * gate grades exactly the scores the LM face reports. */
  private lazy val bigramLmCtes =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             t -> t != '') AS t
      |  FROM documents),
      |big AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, length(t) - 1),
      |           i -> array_to_string(t[i:i+1], ' '))) AS g
      |  FROM toks WHERE length(t) >= 2),
      |uni AS (
      |  SELECT w1, count(*) AS c1 FROM
      |    (SELECT unnest(t) AS w1 FROM toks) GROUP BY w1),
      |prob AS (
      |  SELECT c2t.g, ln(CAST(c2t.c2 AS DOUBLE)) - ln(CAST(u.c1 AS DOUBLE))
      |      AS lnp
      |  FROM (SELECT g, count(*) AS c2 FROM big GROUP BY g) c2t
      |  JOIN uni u ON split_part(c2t.g, ' ', 1) = u.w1),
      |per AS (
      |  SELECT b.doc_id, count(*) AS n_bigrams, round(avg(p.lnp), 6)
      |      AS avg_lnp
      |  FROM big b JOIN prob p USING (g) GROUP BY b.doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "html_extract" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || $htmlMarkupSql
         |         ELSE text END AS t2
         |  FROM documents),
         |ls AS (SELECT doc_id, t2, string_split(t2, chr(10)) AS raw FROM t),
         |-- per line: strip <...> tags to one space, decode entities
         |-- (amp LAST), collapse space runs, trim -- then the C4 line
         |-- rules: >= 3 words, no 'javascript', < 2 raw href attributes
         |proc AS (
         |  SELECT doc_id, t2, len(raw) AS n_lines,
         |    list_transform(generate_series(1, len(raw)), i -> {
         |      'c': trim(regexp_replace(
         |             replace(replace(replace(replace(replace(
         |               regexp_replace(raw[i], '<[^>]*>', ' ', 'g'),
         |               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |               '&nbsp;', ' '), '&amp;', '&'),
         |             ' +', ' ', 'g'), ' '),
         |      'r': raw[i]}) AS pl
         |  FROM ls),
         |kept AS (
         |  SELECT doc_id, t2, n_lines,
         |    list_transform(list_filter(pl, p ->
         |      length(list_filter(string_split(p.c, ' '), w -> w != '')) >= 3
         |      AND NOT contains(lower(p.c), 'javascript')
         |      AND (length(p.r) - length(replace(p.r, 'href', ''))) // 4 < 2),
         |      p -> p.c) AS cl
         |  FROM proc)
         |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
         |  CAST(len(cl) AS BIGINT) AS n_kept,
         |  coalesce(array_to_string(cl, chr(10)), '') != t2 AS changed,
         |  md5(coalesce(array_to_string(cl, chr(10)), '')) AS clean_md5
         |FROM kept ORDER BY doc_id""".stripMargin,
    "text_compression" ->
      """WITH f AS (
        |  SELECT * FROM
        |    read_parquet('/root/repo/fixtures/compression_oracle.parquet'))
        |SELECT d.doc_id,
        |  CAST(octet_length(CAST(d.text AS BLOB)) AS BIGINT) AS raw_bytes,
        |  f.deflate_bytes,
        |  CAST(f.deflate_bytes * 100 // greatest(
        |    octet_length(CAST(d.text AS BLOB)), 1) AS BIGINT) AS ratio_pct,
        |  f.deflate_bytes * 100 // greatest(
        |    octet_length(CAST(d.text AS BLOB)), 1) < 35 AS low_entropy
        |FROM documents d JOIN f ON md5(d.text) = f.text_md5
        |ORDER BY d.doc_id""".stripMargin,
    "text_winnow" ->
      s"""WITH $winnowFpCtes,
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected,
         |    array_to_string(
         |      list_sort(list_distinct(list(h)))[1:8], ',') AS sketch
         |  FROM fp GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(greatest(length(d.text) - ${winnowK - 1}, 0) AS BIGINT)
         |    AS n_grams,
         |  coalesce(n_selected, 0) AS n_selected,
         |  CASE WHEN greatest(length(d.text) - ${winnowK - 1}, 0) = 0
         |       THEN 0.0
         |       ELSE round(coalesce(n_selected, 0) /
         |         CAST(length(d.text) - ${winnowK - 1} AS DOUBLE), 6) END
         |    AS density,
         |  coalesce(sketch, '') AS sketch
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "winnow_dedup" ->
      s"""WITH $winnowFpCtes,
         |dup AS (
         |  SELECT h FROM fp GROUP BY h
         |  HAVING count(DISTINCT doc_id) > 1),
         |agg AS (
         |  SELECT fp.doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
         |    CAST(sum(CASE WHEN dup.h IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_shared
         |  FROM fp LEFT JOIN dup ON fp.h = dup.h
         |  GROUP BY fp.doc_id)
         |SELECT d.doc_id,
         |  coalesce(n_fingerprints, 0) AS n_fingerprints,
         |  coalesce(n_shared, 0) AS n_shared,
         |  CASE WHEN coalesce(n_fingerprints, 0) = 0 THEN 0.0
         |       ELSE round(coalesce(n_shared, 0) /
         |                  CAST(n_fingerprints AS DOUBLE), 6) END
         |    AS shared_frac
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "winnow_ingest" ->
      s"""WITH $winnowFpCtes,
         |fs AS (SELECT h, min(doc_id) AS first_id FROM fp GROUP BY 1),
         |agg AS (
         |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
         |    CAST(sum(CASE WHEN fs.first_id < f.doc_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_shared_prior
         |  FROM fp f JOIN fs USING (h) GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(a.n_fingerprints, 0) AS n_fingerprints,
         |  coalesce(a.n_shared_prior, 0) AS n_shared_prior,
         |  (coalesce(a.n_fingerprints, 0) = 0 OR
         |   2 * coalesce(a.n_shared_prior, 0) < coalesce(a.n_fingerprints, 0))
         |    AS keep
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // post-takedown corpus ≡ from-scratch winnow ingest of the SURVIVING
    // docs (the re-election contract): the winnow_ingest CTEs verbatim
    // over `surv` — a quarantined doc whose shared ratio drops below
    // half without the removed witnesses must reappear
    "takedown_replay_winnow" -> {
      val survFp = winnowFpCtes.replace("FROM documents", "FROM surv")
      s"""WITH surv AS (SELECT doc_id, text FROM documents
         |              WHERE doc_id % ${graft.streaming.Takedown
                            .replayRemovalStride} != 0),
         |$survFp,
         |fs AS (SELECT h, min(doc_id) AS first_id FROM fp GROUP BY 1),
         |agg AS (
         |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
         |    CAST(sum(CASE WHEN fs.first_id < f.doc_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_shared_prior
         |  FROM fp f JOIN fs USING (h) GROUP BY 1)
         |SELECT d.doc_id
         |FROM surv d LEFT JOIN agg a USING (doc_id)
         |WHERE coalesce(a.n_fingerprints, 0) = 0 OR
         |  2 * coalesce(a.n_shared_prior, 0) < coalesce(a.n_fingerprints, 0)
         |ORDER BY d.doc_id""".stripMargin
    },
    "text_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), t -> t != '')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |              count(*) AS n_distinct FROM tf GROUP BY 1),
        |terms AS (
        |  SELECT tf.doc_id, dl.n_tokens, dl.n_distinct,
        |    round(-((CAST(tf AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |        * ln(CAST(tf AS DOUBLE) / CAST(n_tokens AS DOUBLE))), 9)
        |      AS term
        |  FROM tf JOIN dl USING (doc_id))
        |SELECT doc_id, n_tokens, n_distinct,
        |  round(CAST(sum(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6)
        |    AS entropy,
        |  round(CASE WHEN n_tokens > 1
        |    THEN CAST(sum(CAST(term AS DECIMAL(28,9))) AS DOUBLE)
        |         / ln(CAST(n_tokens AS DOUBLE))
        |    ELSE 0.0 END, 6) AS norm_entropy
        |FROM terms GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,
    "quality_filter" ->
      s"""WITH $qualityCtes
         |SELECT doc_id,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  round(mean_wlen, 6) AS mean_word_len,
         |  round(dup_frac, 6) AS dup_token_frac,
         |  CAST(n_stop AS BIGINT) AS n_stopwords,
         |  n_tokens BETWEEN $qfMinTokens AND $qfMaxTokens AS r_len,
         |  mean_wlen BETWEEN 3.5 AND 4.6 AS r_wordlen,
         |  dup_frac <= $qfMaxDupFrac AS r_repeat,
         |  n_stop >= $qfMinStopwords AS r_stop,
         |  quality >= $qfMinQuality AS r_quality,
         |  $qualityKeepSql AS keep
         |FROM f ORDER BY doc_id""".stripMargin,
    "text_bigram_lm" ->
      s"""WITH $bigramLmCtes
         |SELECT d.doc_id,
         |  CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  per.avg_lnp
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "lm_ppl_buckets" ->
      s"""WITH $bigramLmCtes,
         |scored AS (
         |  SELECT d.doc_id, per.avg_lnp
         |  FROM documents d LEFT JOIN per USING (doc_id)),
         |hist AS (
         |  SELECT avg_lnp AS score, count(*) AS c FROM scored
         |  WHERE avg_lnp IS NOT NULL GROUP BY 1),
         |cum AS (
         |  SELECT score, sum(c) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
         |  FROM hist),
         |tot AS (SELECT sum(c) AS n_docs FROM hist),
         |th AS (
         |  SELECT
         |    (SELECT min(score) FROM cum CROSS JOIN tot
         |     WHERE cum_c * 3 >= n_docs) AS t1,
         |    (SELECT min(score) FROM cum CROSS JOIN tot
         |     WHERE cum_c * 3 >= n_docs * 2) AS t2)
         |SELECT doc_id, avg_lnp,
         |  CASE WHEN avg_lnp IS NULL THEN 'empty'
         |       WHEN avg_lnp >= t2 THEN 'head'
         |       WHEN avg_lnp >= t1 THEN 'middle'
         |       ELSE 'tail' END AS bucket,
         |  CASE WHEN avg_lnp IS NULL THEN FALSE
         |       WHEN avg_lnp >= t1 THEN TRUE ELSE FALSE END AS keep
         |FROM scored CROSS JOIN th ORDER BY doc_id""".stripMargin,
    "text_normalize" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0
        |         THEN text || ' Café Zürich naïve São Paulo résumé'
        |         ELSE text END AS t2
        |  FROM documents)
        |SELECT doc_id, md5(strip_accents(t2)) AS norm_md5,
        |  strip_accents(t2) != t2 AS changed
        |FROM t ORDER BY doc_id""".stripMargin,
    "url_normalize" ->
      s"""WITH $urlSynthSql
         |SELECT doc_id, url, canonical_url,
         |  url != canonical_url AS changed
         |FROM u ORDER BY doc_id""".stripMargin,
    "url_host_stats" ->
      """SELECT 'example' || CAST(doc_id % 50 AS VARCHAR) || '.com' AS host,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "host_filter" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'example' || CAST(doc_id % 50 AS VARCHAR) || '.com' AS host,
        |    n_chars
        |  FROM documents),
        |hm AS (
        |  SELECT host, CAST(sum(n_chars) AS DOUBLE) / count(*) AS host_mean
        |  FROM d GROUP BY 1),
        |cm AS (
        |  SELECT CAST(sum(n_chars) AS DOUBLE) / count(*) AS corpus_mean
        |  FROM d)
        |SELECT doc_id, host,
        |  CASE WHEN host IN ('example7.com', 'example13.com')
        |         THEN 'blocked_domain'
        |       WHEN host_mean < corpus_mean THEN 'low_quality_host'
        |       END AS reason,
        |  CASE WHEN host IN ('example7.com', 'example13.com') THEN FALSE
        |       WHEN host_mean < corpus_mean THEN FALSE
        |       ELSE TRUE END AS keep
        |FROM d JOIN hm USING (host) CROSS JOIN cm
        |ORDER BY doc_id""".stripMargin,
    "pii_scrub" -> {
      val luhnDigit = "CAST(substr(reverse(x), i, 1) AS INTEGER)"
      val luhnSum =
        s"""list_aggregate(list_transform(generate_series(1, length(x)),
           |    i -> CASE WHEN (i - 1) % 2 = 0 THEN $luhnDigit
           |         ELSE CASE WHEN $luhnDigit * 2 > 9
           |              THEN $luhnDigit * 2 - 9
           |              ELSE $luhnDigit * 2 END END), 'sum')""".stripMargin
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0
         |           THEN text || ' contact user' || doc_id ||
         |                '@example.com for details'
         |         WHEN doc_id % 11 = 0
         |           THEN text || ' served from 10.' || (doc_id % 256) ||
         |                '.0.' || (doc_id % 100)
         |         WHEN doc_id % 13 = 0
         |           THEN text || ' call +14155550' || (doc_id % 100)
         |         WHEN doc_id % 17 = 0
         |           THEN text || ' node 2001:db8:85a3:8d3:1319:8a2e:370:'
         |                || (doc_id % 9999)
         |         WHEN doc_id % 19 = 0 THEN text || ' card $luhnValidPlant'
         |         WHEN doc_id % 23 = 0 THEN text || ' ref $luhnInvalidPlant'
         |         ELSE text END AS t2
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, t2,
         |    CAST(length(regexp_extract_all(t2, '$emailRe')) AS BIGINT)
         |      AS n_emails,
         |    CAST(length(regexp_extract_all(t2, '$ipv4Re')) AS BIGINT)
         |      AS n_ips,
         |    CAST(length(regexp_extract_all(t2, '$phoneRe')) AS BIGINT)
         |      AS n_phones,
         |    CAST(length(regexp_extract_all(t2, '$ipv6Re')) AS BIGINT)
         |      AS n_ipv6,
         |    CAST(length(list_filter(regexp_extract_all(t2, '$cardRe'),
         |      x -> $luhnSum % 10 = 0)) AS BIGINT) AS n_cards
         |  FROM t)
         |SELECT doc_id, n_emails, n_ips, n_phones, n_ipv6, n_cards,
         |  (n_emails + n_ips + n_phones + n_ipv6 + n_cards) > 0 AS has_pii,
         |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(t2,
         |      '$emailRe', '[EMAIL]', 'g'), '$phoneRe', '[PHONE]', 'g'),
         |    '$ipv6Re', '[IPV6]', 'g'), '$ipv4Re', '[IP]', 'g'),
         |    '$cardRe', '[NUM]', 'g')) AS scrub_md5
         |FROM c ORDER BY doc_id""".stripMargin
    },
    "text_token_count" ->
      s"""SELECT doc_id,
         |  CAST(length(list_filter(string_split_regex(lower(text), '\\s+'),
         |       t -> t != '')) AS BIGINT) AS ws_tokens,
         |  CAST(${duckCount("text", "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")} AS BIGINT)
         |    AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_lang_id" -> {
      val scores = langMarkers.map { case (lang, re) =>
        s"{'score': ${duckCount("lower(text)", re.replace("\\", "\\"))}, 'lang': '$lang'}"
      }.mkString("[", ", ", "]")
      s"""WITH scored AS (
         |  SELECT doc_id, lang AS labeled_lang,
         |         unnest($scores) AS sc
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, labeled_lang, sc.lang AS pred_lang,
         |         CAST(sc.score AS BIGINT) AS pred_score,
         |         row_number() OVER (PARTITION BY doc_id
         |             ORDER BY sc.score DESC, sc.lang) AS rn
         |  FROM scored)
         |SELECT doc_id, labeled_lang, pred_lang, pred_score
         |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin
    },
    "budget_select" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS DOUBLE) AS n_chars,
         |    CAST(length(list_filter(string_split_regex(lower(text), '\\s+'),
         |         t -> t != '')) AS DOUBLE) AS n_tokens,
         |    CAST(${duckCount("text", "[^A-Za-z0-9\\s]")} AS DOUBLE) AS punct,
         |    CAST(${duckCount("lower(text)", "\\b(the|a|and|of|to)\\b")} AS DOUBLE) AS stop
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |    CAST(round(round(least(n_tokens / 4.0, 50.0)
         |                     + least(stop * 5.0, 30.0)
         |                     - least(punct, 20.0) + 20.0, 6) * 1e6, 0)
         |         AS BIGINT) AS q_micro
         |  FROM m),
         |tot AS (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) // $bsBudgetDenom AS budget
         |  FROM q),
         |c AS (
         |  SELECT doc_id, n_tokens, q_micro,
         |    sum(n_tokens) OVER (ORDER BY q_micro DESC, doc_id
         |                        ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM q)
         |SELECT c.doc_id, c.n_tokens, c.q_micro,
         |  c.cum <= t.budget AS selected
         |FROM c CROSS JOIN tot t ORDER BY c.doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS DOUBLE) AS n_chars,
         |    CAST(length(list_filter(string_split_regex(lower(text), '\\s+'),
         |         t -> t != '')) AS DOUBLE) AS n_tokens,
         |    CAST(${duckCount("text", "[^A-Za-z0-9\\s]")} AS DOUBLE) AS punct,
         |    CAST(${duckCount("lower(text)", "\\b(the|a|and|of|to)\\b")} AS DOUBLE) AS stop
         |  FROM documents)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  round(punct / greatest(n_chars, 1.0), 6) AS punct_ratio,
         |  round(stop / greatest(n_tokens, 1.0), 6) AS stopword_ratio,
         |  round(n_chars / greatest(n_tokens, 1.0), 6) AS mean_word_len,
         |  round(least(n_tokens / 4.0, 50.0) + least(stop * 5.0, 30.0)
         |        - least(punct, 20.0) + 20.0, 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
         |                             t -> t != '') AS t
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, 1 AS n, unnest(t) AS g FROM toks
         |  UNION ALL
         |  SELECT doc_id, 2 AS n,
         |         unnest(list_transform(generate_series(1, length(t) - 1),
         |                i -> array_to_string(t[i:i+1], ' '))) AS g
         |  FROM toks
         |  UNION ALL
         |  SELECT doc_id, 3 AS n,
         |         unnest(list_transform(generate_series(1, length(t) - 2),
         |                i -> array_to_string(t[i:i+2], ' '))) AS g
         |  FROM toks),
         |counts AS (
         |  SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3),
         |stats AS (
         |  SELECT doc_id, n, sum(c) AS total, count(*) AS dis, max(c) AS maxc,
         |         sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup
         |  FROM counts GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(first(total) FILTER (n = 1) AS BIGINT) AS n_tokens,
         |  round(1.0 - CAST(first(dis) FILTER (n = 1) AS DOUBLE)
         |              / first(total) FILTER (n = 1), 6) AS dup_token_frac,
         |  round(coalesce(CAST(first(maxc) FILTER (n = 2) AS DOUBLE)
         |              / first(total) FILTER (n = 2), 0.0), 6) AS top_bigram_frac,
         |  round(coalesce(CAST(first(dup) FILTER (n = 3) AS DOUBLE)
         |              / first(total) FILTER (n = 3), 0.0), 6) AS dup_trigram_frac
         |FROM stats GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\s+'),
        |                     t -> t != '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN length(t) >= 3
        |      THEN list_transform(generate_series(1, length(t) - 2),
        |           i -> array_to_string(t[i:i+2], ' '))
        |      ELSE [] END) AS shingles
        |  FROM toks)
        |SELECT doc_id,
        |  array_to_string(
        |    list_sort(list_transform(shingles,
        |      s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))[1:8], ',')
        |    AS sketch
        |FROM sh ORDER BY doc_id""".stripMargin)
}
