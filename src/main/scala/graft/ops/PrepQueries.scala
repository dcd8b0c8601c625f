package graft.ops

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.ZOrderFunctions.zorder2
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus PREPARATION operators — the steps between a curated
  * corpus and a training run: benchmark decontamination, sliding-window
  * chunking, vocabulary-coverage (OOV) scoring, and multi-dimensional
  * data layout (Z-ordering).
  *
  * Scale design (the 100 TB story, tested at sf*):
  *  - [[decontaminate]]: the benchmark/eval side of the n-gram overlap is
  *    SMALL by construction (eval sets are thousands of docs, the corpus
  *    is billions), so its distinct-gram set BROADCASTS and the train
  *    side is a scan + map-side semi-probe — no shuffle of corpus
  *    postings at all. This is the asymmetric shape that distinguishes
  *    decontamination from all-pairs dedup ([[DedupQueries]]): one side
  *    is fixed and tiny, the other is the whole corpus.
  *  - [[chunkDocuments]]: a pure per-row explode (`sequence` + `slice`) —
  *    no shuffle; output size is corpus/stride, the cost any chunking
  *    pass must pay. Stride < window gives the overlap LLM context
  *    packing wants.
  *  - [[oovRate]]: the vocabulary is a bounded top-K (heavy hitters), so
  *    it broadcasts; per-doc token counts are map-side combined before
  *    the single (doc, token) aggregation.
  *  - [[zorderLayout]]: the Z-value is a codegen'd per-row projection
  *    ([[graft.functions.ZOrder2]]); file assignment is fixed-width
  *    Z-range bucketing (top bits), i.e. NO global sort is needed to
  *    decide placement — writing is `repartitionByRange` on z, the same
  *    one exchange any sorted write costs.
  */
object PrepQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select("doc_id", "text")

  // ---- benchmark decontamination -----------------------------------------

  /** Docs whose id ≡ 0 (mod 10) play the held-out benchmark; the rest are
    * the training corpus. */
  val benchmarkMod = 10
  val contamNgramN = 5

  /** Benchmark decontamination: for every TRAINING document, the number
    * and fraction of its distinct [[contamNgramN]]-gram shingles that
    * appear anywhere in the BENCHMARK split — the standard eval-leakage
    * check run before training. A single shared gram flags the doc (the
    * conservative policy; the fraction supports softer thresholds). */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val isBench = pmod(col("doc_id"), lit(benchmarkMod)) === 0
    val shingled = docs(s, dir)
      .select(col("doc_id"), isBench.as("is_bench"),
        shingles(tokens(col("text")), contamNgramN).as("sh"))
    // eval sets are tiny next to the corpus: distinct grams broadcast
    val benchGrams = shingled.filter(col("is_bench"))
      .select(explode(col("sh")).as("g")).distinct()
    val train = shingled.filter(!col("is_bench"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"), col("sh"))
    val hits = train
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    train.select("doc_id", "n_grams")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination",
        when(col("n_grams") > 0,
          round(col("n_contaminated") / col("n_grams"), 6)).otherwise(lit(0.0)))
      .withColumn("contaminated", col("n_contaminated") > 0)
      .orderBy("doc_id")
  }

  /** Fuzzy-contamination flag threshold: Jaccard ≥ 0.5 in micro units.
    * (Published gates run 0.5–0.8 on word n-gram shingles; the tight
    * synthetic vocabulary makes 0.5 the discriminating choice here.) */
  val contamJaccardTauMicro = 500000L

  /** FUZZY benchmark decontamination — the near-duplicate leakage gate
    * ([[decontaminate]] flags ANY shared n-gram; real eval-set checks,
    * e.g. GPT-3 appendix C and the Llama 2 analysis, also ask "is some
    * training document a light REWRITE of a benchmark item", which a
    * single-gram hit badly over-triggers on and exact-match misses).
    * For every training document: the benchmark document with the
    * highest shingle-set Jaccard, that similarity (micro units), and a
    * `contaminated` flag at [[contamJaccardTauMicro]].
    *
    * Shape at 100 TB — same asymmetry as [[decontaminate]]: the
    * benchmark side is tiny by construction, so its (gram → bench_doc,
    * |bench_sh|) POSTINGS broadcast; the corpus is scanned once, each
    * train gram probes the broadcast map, and the only shuffle is the
    * (train_doc, bench_doc) hit-pair count — bounded by actual overlap
    * mass, not |corpus|×|bench|. The per-pair Jaccard
    * `shared·10⁶ div (n_t + n_b − shared)` is BIGINT floor division
    * (bit-equal cross-engine); argmax is a HASH aggregate: the
    * (jaccard desc, bench_doc asc) order packs into one 63-bit long
    * (jaccard ≤ 10⁶ is 20 bits; bench ids get 43 — ~8.8×10¹² documents,
    * ~880× a 100 TB corpus at 10 KB/doc), because scalar `max_by` keeps
    * a mutable agg buffer where a struct max degrades to a grouped
    * SortAggregate (caught by PlanSpec's whole-surface audit — the
    * first formulation shipped exactly that). The packed key is UNIQUE
    * per (train, bench) row, so every max_by picks the same row
    * deterministically. */
  def decontaminateFuzzy(s: SparkSession, dir: String): DataFrame = {
    val isBench = pmod(col("doc_id"), lit(benchmarkMod)) === 0
    val shingled = docs(s, dir)
      .select(col("doc_id"), isBench.as("is_bench"),
        shingles(tokens(col("text")), contamNgramN).as("sh"))
    val benchPostings = shingled.filter(col("is_bench"))
      .select(col("doc_id").as("bench_doc"),
        size(col("sh")).cast("long").as("n_bench"), explode(col("sh")).as("g"))
    val train = shingled.filter(!col("is_bench"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"),
        col("sh"))
    val best = train
      .select(col("doc_id"), col("n_grams"), explode(col("sh")).as("g"))
      .join(broadcast(benchPostings), Seq("g"))
      .groupBy(col("doc_id"), col("bench_doc"), col("n_grams"), col("n_bench"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard_micro",
        expr("shared * 1000000 div (n_grams + n_bench - shared)"))
      // packed argmax order: highest jaccard, ties → lowest bench id.
      // The 43-bit bench_doc bound is GUARDED, not assumed: an id past
      // 2^43−1 would silently corrupt the order, so assert_true makes it
      // fail loudly instead (jaccard_micro ≤ 10⁶ needs no guard — it is
      // structural: shared ≤ union ⇒ the floor-div is ≤ 10⁶).
      .withColumn("po",
        expr("""CASE WHEN assert_true(bench_doc <= 8796093022207L,
               |  'bench_doc exceeds the 43-bit packed-argmax bound') IS NULL
               |THEN jaccard_micro * 8796093022208L
               |     + (8796093022207L - bench_doc) END""".stripMargin))
      .groupBy("doc_id")
      .agg(max_by(col("bench_doc"), col("po")).as("bench_doc"),
        max_by(col("shared"), col("po")).as("shared"),
        max_by(col("jaccard_micro"), col("po")).as("jaccard_micro"))
    train.select("doc_id", "n_grams").join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), col("bench_doc"),
        coalesce(col("shared"), lit(0L)).as("shared"),
        coalesce(col("jaccard_micro"), lit(0L)).as("jaccard_micro"),
        (coalesce(col("jaccard_micro"), lit(0L)) >= contamJaccardTauMicro)
          .as("contaminated"))
      .orderBy("doc_id")
  }

  // ---- sliding-window chunking -------------------------------------------

  val chunkWindow = 32
  val chunkStride = 24

  /** Sliding-window chunking: split each document's token stream into
    * [[chunkWindow]]-token chunks every [[chunkStride]] tokens (overlap =
    * window − stride), materializing the chunk text — the
    * context-window-preparation step of an LLM data pipeline. Chunk count
    * is 1 + ⌈(n − W)/S⌉ so the final partial window is kept. */
  def chunkDocuments(s: SparkSession, dir: String): DataFrame =
    chunksOf(docs(s, dir))

  /** [[chunkDocuments]] over an arbitrary (doc_id, text) DataFrame — the
    * chunking stage the end-to-end pipeline compose reuses. */
  private[ops] def chunksOf(d: DataFrame): DataFrame = {
    val (w, st) = (chunkWindow, chunkStride)
    d.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        when(col("n_toks") <= w, lit(1L))
          .otherwise(lit(1L) + ceil((col("n_toks") - w) / lit(st.toDouble)).cast("long")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_tok", lit(1L) + col("chunk_idx") * st)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        least(lit(w.toLong), col("n_toks") - col("start_tok") + 1).as("chunk_len"),
        array_join(slice(col("toks"), col("start_tok").cast("int"), lit(w)), " ")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** SPAN-LEVEL exact dedup — dedupe the corpus at CHUNK granularity:
    * repeated passages (boilerplate headers, license blocks, templated
    * paragraphs) hide inside documents that are globally unique, so
    * document-level dedup never sees them. Chunks hash to 60 bits;
    * canonical = min (doc_id, chunk_idx) per hash; per-document output is
    * the duplicated-span share — the filter/trim signal. One chunk
    * explode (narrow) + one hash-keyed window — the shuffle moves 8-byte
    * hashes, never chunk text. Complements [[graft.ops.DedupQueries
    * .dedupSharedNgrams]] (n-gram overlap score) with exact span
    * identity at a trainable-window granularity. */
  def chunkDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ch = chunkDocuments(s, dir).select(col("doc_id"), col("chunk_idx"),
      md5Long(col("chunk_text")).as("h"))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("chunk_idx"))
    ch.withColumn("is_canonical", row_number().over(w) === 1)
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_canonical"), 0L).otherwise(1L)).as("n_dup_chunks"))
      .withColumn("dup_chunk_frac",
        round(col("n_dup_chunks") / col("n_chunks"), 6))
      .orderBy("doc_id")
  }

  // ---- exact-span scrub (C4 line dedup, acted on) --------------------------

  val scrubSpanLen = 16

  /** EXACT-SPAN SCRUB — the ACTING twin of [[chunkDedup]]: where
    * chunk_dedup REPORTS each document's duplicated-span share, this
    * operator REMOVES every repeated span and reassembles the cleaned
    * text — C4's "discard all but one of any three-sentence span
    * occurring more than once" (Raffel et al., JMLR 2020 §2.2) at a
    * fixed [[scrubSpanLen]]-token span granularity (the fixture corpus
    * has no sentence boundaries; a production corpus swaps the span
    * splitter, the machinery is identical). Canonical occurrence = min
    * (doc_id, span_idx) per span hash — every later occurrence is cut.
    *
    * Shape at 100 TB: one narrow span explode (`sequence` + `slice`,
    * no overlap so spans partition the token stream), ONE shuffle on
    * the 60-bit span hash for the first-occurrence window (span text
    * rides along once — it must reach the reassembly anyway), one
    * doc_id aggregate to rebuild the text in span order. Window groups
    * are per-hash (boilerplate hashes are big groups but the window is
    * a streaming row_number, no buffering beyond the frame row).
    * Zero-token documents keep one empty span so they survive to the
    * output with text_clean = '' (and dedupe among themselves —
    * cutting an empty span is a no-op on the reassembled text). */
  def dedupSpanScrub(s: SparkSession, dir: String): DataFrame =
    // sortWithinPartitions, not orderBy: a global sort SAMPLES its
    // child for range bounds — the whole scrub would execute twice
    // (the debezium_ingest lesson; measured 32.8 → ~19 s at x100) —
    // and the oracle comparator sorts rows itself
    scrubAssemble(firstOccurrence(spansOf(docs(s, dir))))
      .sortWithinPartitions("doc_id")

  /** The hashed span table (doc_id, span_idx, span_text, h) of a
    * (doc_id, text) corpus — the span splitter [[dedupSpanScrub]] and
    * the ingest gate ([[graft.streaming.ScrubStream]]) share. */
  private[graft] def spansOf(d: DataFrame): DataFrame = {
    val L = scrubSpanLen
    d.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_spans",
        when(col("n_toks") === 0, lit(1L))
          .otherwise(ceil(col("n_toks") / lit(L.toDouble)).cast("long")))
      .withColumn("span_idx", explode(sequence(lit(0L), col("n_spans") - 1)))
      .select(col("doc_id"), col("span_idx"),
        array_join(slice(col("toks"),
          (col("span_idx") * L + 1).cast("int"), lit(L)), " ").as("span_text"))
      .withColumn("h", md5Long(col("span_text")))
  }

  /** Mark each span row's global first occurrence: ONE shuffle on the
    * 60-bit span hash, canonical = rank 1 of (doc_id, span_idx) — the
    * [[graft.ops.DedupQueries.dedupExact]] window shape on the span
    * grain.
    *
    * Hot-span skew was HYPOTHESIZED here and MEASURED AWAY
    * (SpanSkewProbe, BASELINE.md round-14 cells): a boilerplate span
    * planted on 20% of all documents is still only ~0.4% of span ROWS
    * (docs carry ~50 spans each), `row_number` streams its window
    * group through one reducer with no buffering, and the
    * skew-splittable alternative — map-side-combined packed-BIGINT min
    * joined back on `h` — pays a SECOND full scan+explode+md5 of the
    * corpus, measuring 2× slower at every probed size (x100 planted:
    * 11.5 s window vs 24.8 s agg+join). The window stays the shipped
    * plan; the packed-min formulation lives in the probe as the
    * documented fallback for a corpus whose boilerplate mass
    * approaches the span-row scale where one reducer's group becomes
    * a single-task ceiling. */
  private[graft] def firstOccurrence(spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("span_idx"))
    spans.withColumn("keep_span", row_number().over(w) === 1)
  }

  /** Reassemble per-doc cleaned text from marked span rows — the shared
    * tail that makes the batch scrub and the streamed scrub emit
    * literally the same shape from the same `keep_span` verdicts. */
  private[graft] def scrubAssemble(marked: DataFrame): DataFrame =
    marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_spans"),
      sum(when(col("keep_span"), 0L).otherwise(1L)).as("n_dropped"),
      array_join(
        sort_array(collect_list(when(col("keep_span"),
          struct(col("span_idx"), col("span_text")))))
          .getField("span_text"), " ").as("text_clean"))

  // ---- vocabulary coverage (OOV rate) --------------------------------------

  val oovVocabSize = 20

  /** Out-of-vocabulary rate: per-document fraction of token OCCURRENCES
    * outside the corpus top-[[oovVocabSize]] vocabulary (ties broken by
    * token asc) — the coverage score a tokenizer/vocab choice is judged
    * by, and a standard quality filter (high OOV ⇒ noise). */
  def oovRate(s: SparkSession, dir: String): DataFrame = {
    // top-K vocab via orderBy+limit = TakeOrderedAndProject (distributed
    // per-partition top-k + merge), NOT a rank window, which would drag
    // the whole distinct-token table into one partition at corpus scale
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val vocab = tok.groupBy("token").agg(sum(col("c")).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(oovVocabSize)
      .select(col("token"))
    val perDoc = tok
      .join(broadcast(vocab).withColumn("in_vocab", lit(1)), Seq("token"), "left")
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("c")).otherwise(lit(0L))).as("n_oov"))
    docs(s, dir).select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        round(coalesce(col("n_oov") / col("n_tokens"), lit(0.0)), 6).as("oov_rate"))
      .orderBy("doc_id")
  }

  // ---- deterministic epoch shuffle -----------------------------------------

  val epochSeed = 1
  val epochShards = 16

  /** Deterministic EPOCH SHUFFLE: every document gets a pseudorandom shard
    * and a position within it from a seeded hash — the reproducible global
    * permutation a training run reads the corpus in. No RNG (retries can't
    * change the epoch) and NO global sort: ordering work is per-shard
    * (thousands of independent streams at corpus scale); bumping
    * [[epochSeed]] reshuffles everything. */
  def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs(s, dir).select(col("doc_id"))
      .withColumn("h",
        md5Long(concat(lit(s"epoch:$epochSeed:"), col("doc_id").cast("string"))))
      .withColumn("shard", pmod(col("h"), lit(epochShards)))
      .withColumn("pos", row_number().over(w))
      .select("doc_id", "shard", "pos")
      .orderBy("doc_id")
  }

  // ---- Z-order data layout --------------------------------------------------

  /** Per-dimension bucket resolution (15 bits ⇒ a 30-bit Z value). */
  val zorderDimBits = 15
  /** Top-k Z-value bits = the file id: fixed-width Z-range bucketing. */
  val zorderFileBits = 8

  /** Z-order layout assignment over `events`: normalize (user_id,
    * epoch-minute) to [[zorderDimBits]]-bit bucket ids over each column's
    * OBSERVED min/max (raw values would waste the interleave on bits that
    * never vary — the same reason Delta's OPTIMIZE ZORDER range-partitions
    * each column before interleaving), Morton-interleave the bucket ids
    * ([[graft.functions.ZOrder2]], codegen'd), and derive the target file
    * from the top [[zorderFileBits]] bits. Rows close in BOTH user and
    * time land in the same file, so file-level min/max statistics prune
    * scans for predicates on EITHER column. The min/max bounds are one
    * 1-row aggregate broadcast onto the scan; bucketing is integer-exact
    * ((v − min)·2^bits div span), so the whole layout is reproducible and
    * oracle-checkable. Writing = `repartitionByRange` on `zval` — the one
    * exchange any sorted write costs. */
  private def curveAssigned(s: SparkSession, dir: String,
      curve: (Column, Column) => Column): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_timestamp(ts) div 60").as("epoch_min"))
    val bounds = e.agg(
      min("user_id").as("u_lo"), max("user_id").as("u_hi"),
      min("epoch_min").as("m_lo"), max("epoch_min").as("m_hi"))
    val buckets = 1L << zorderDimBits
    // divide-FIRST: bucket = (v − lo) div ⌈span/2^bits⌉. The multiply-first
    // form ((v − lo)·2^bits div span) overflows Long once the observed key
    // span exceeds 2^(63−bits) — silently corrupting bucket ids on wide
    // domains (e.g. snowflake ids). Width is computed once per column from
    // the broadcast bounds; max bucket stays ≤ 2^bits − 1 by construction.
    e.crossJoin(broadcast(bounds))
      .withColumn("xb", expr(
        s"(user_id - u_lo) div ((u_hi - u_lo + $buckets) div $buckets)"))
      .withColumn("yb", expr(
        s"(epoch_min - m_lo) div ((m_hi - m_lo + $buckets) div $buckets)"))
      .withColumn("zval", curve(col("xb"), col("yb")))
      .withColumn("file_id",
        shiftright(col("zval"), 2 * zorderDimBits - zorderFileBits))
      .select("event_id", "user_id", "epoch_min", "zval", "file_id",
        "m_lo", "m_hi")
  }

  private def zorderAssigned(s: SparkSession, dir: String): DataFrame =
    curveAssigned(s, dir, zorder2)

  def zorderLayout(s: SparkSession, dir: String): DataFrame =
    zorderAssigned(s, dir)
      .drop("m_lo", "m_hi")
      .orderBy("event_id")

  /** Hilbert-curve twin of [[zorderLayout]] — identical bucketing and
    * file geometry, only the space-filling curve differs
    * ([[graft.functions.Hilbert2]], codegen'd). Hilbert's unit-step
    * adjacency (consecutive indexes are always grid neighbors — Morton
    * order jumps at every quadrant boundary) gives tighter per-file
    * min/max zones on the same file count, which is why Iceberg offers
    * it next to Z-order; the write cost is the same single range
    * exchange. PrepSpec proves the curve contract (bijectivity +
    * unit-step adjacency) against the [[graft.functions.HilbertUtil
    * .d2xy]] inverse. */
  def hilbertLayout(s: SparkSession, dir: String): DataFrame =
    curveAssigned(s, dir, graft.functions.HilbertFunctions.hilbert2)
      .drop("m_lo", "m_hi")
      .withColumnRenamed("zval", "hval")
      .orderBy("event_id")

  /** Zone-map (data-skipping) statistics over the Z-order layout — the
    * maintenance pass a lakehouse runs after OPTIMIZE ZORDER: per target
    * file, row count and min/max of each layout column (the parquet
    * row-group / Delta file-stats equivalent), plus whether the file's
    * zone intersects a fixed probe band on `epoch_min` (the observed
    * span's [1/8, 1/4) quartile slice — deterministic at any SF; the
    * time column, because divide-first bucketing leaves narrow-span
    * columns in the LOW interleave bits, so only the wide-span column
    * reaches the file-id bits — the probe must target a column the
    * layout can discriminate, exactly as a real zone-map consumer
    * checks). `band_hit` measures the pruning rate directly (PrepSpec
    * asserts it ≪ 1, i.e. the layout actually skips; a hash layout
    * would hit every file). One shuffle on `file_id` (≤ 2^[[zorderFileBits]]
    * groups); at 100 TB these stats ride the write path per file and
    * this query is their audit/rebuild. */
  def zoneMap(s: SparkSession, dir: String): DataFrame =
    zorderAssigned(s, dir)
      .withColumn("band_lo", expr("m_lo + (m_hi - m_lo + 1) div 8"))
      .withColumn("band_hi", expr("m_lo + (m_hi - m_lo + 1) div 4"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("user_id").as("u_min"), max("user_id").as("u_max"),
        min("epoch_min").as("m_min"), max("epoch_min").as("m_max"),
        min("band_lo").as("blo"), min("band_hi").as("bhi"))
      .withColumn("band_hit",
        !(col("m_max") < col("blo") || col("m_min") > col("bhi")))
      .select("file_id", "n_rows", "u_min", "u_max", "m_min", "m_max",
        "band_hit")
      .sortWithinPartitions("file_id")

  /** Dictionary encoding — the categorical-feature staple: assign every
    * token a dense integer id by (frequency desc, token) rank and encode
    * each document as its id sequence (emitted space-joined — the
    * comparator contract forbids array columns). The id table is a total
    * order over the WORD-TYPE table, which Heaps' law bounds ≪ corpus
    * size (the same argument as `bpe_vocab`'s merge ranking — and like
    * there, the global rank window runs on that bounded table, never the
    * corpus). The encode join carries no hint: at test size Spark
    * broadcasts it, at 100 TB AQE shuffle-joins on token — both correct,
    * and the per-doc reassembly sorts each doc's own positions only. */
  def dictEncode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs(s, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "token")
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("id", row_number().over(
        Window.orderBy(col("freq").desc, col("token").asc)))
    tok.join(vocab.select("token", "id"), Seq("token"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("id")))),
            x => x.getField("id").cast("string")), " ").as("ids"))
      .orderBy("doc_id")
  }

  // ---- DSIR-shaped data selection ----------------------------------------

  /** Hashed-bigram feature space dimension (DSIR uses 10⁴; 2¹⁰ keeps the
    * dense λ grid comfortably broadcastable at any corpus size — the
    * grid is B rows REGARDLESS of n). */
  val dsirB = 1024

  /** The target distribution: the corpus's English subset stands in for
    * DSIR's high-quality target corpus (Wikipedia/books in the paper). */
  val dsirTargetLang = "en"

  /** Data Selection via Importance Resampling (DSIR; Xie et al., NeurIPS
    * 2023), integer-exact: score every pool document by how much more
    * probable its hashed-bigram bag is under the TARGET distribution
    * ([[dsirTargetLang]] docs) than under the RAW pool distribution, and
    * keep documents that lean target.
    *
    * The paper's per-feature weight is the log-ratio
    * ln p_target(b) − ln p_raw(b) of Laplace-smoothed hashed-bigram
    * unigram models; as in [[CurationQueries.textClassify]] (the same
    * substitution, documented there), the transcendental log is replaced
    * by integer ppm RATES — λ_b = ppm_target(b) − ppm_raw(b) with
    * ppm(b) = (10⁶·(cnt_b+1)) div (total+B) — so scoring is bit-exact
    * across engines and row orders. The selection rule `score > 0` is
    * the rate-space analog of the paper's importance weight w > 1
    * (p_target > p_raw); it needs NO global rank: selection is decided
    * per document from the broadcast model, the shape that survives
    * 100 TB (a top-k selection would add one quantile-threshold pass —
    * the [[AnalyticsQueries]] sketch substrate — not a global sort).
    *
    * Shape at scale: ONE corpus tokenize+bigram explode, materialized
    * once (localCheckpoint — a persisted postings table at deployment
    * scale) feeding both the model aggregation (map-side combined to
    * ≤ B·partitions partials) and the scoring join against the
    * broadcast B-row λ grid; one (doc) hash aggregation; a final
    * broadcast-probed left join back to the doc spine. No corpus-global
    * state beyond the B-row model. The only nested-loop join is the
    * 1-row totals aggregate crossed onto the B-row grid build (the
    * PlanSpec-allowlisted provably-tiny-broadcast class) — nothing
    * corpus-sized ever meets a non-equi join. */
  /** GATE EVALUATION of [[dsirSelect]]'s keep rule (`score > 0`) against
    * the corpus `lang` labels — positive class = [[dsirTargetLang]], the
    * distribution DSIR is steering toward, so AUC measures how well the
    * hashed-bigram importance weights separate target-like documents and
    * precision/recall grade the shipped threshold. Metric arithmetic is
    * [[EvalQueries.gateEval]] (exact Mann–Whitney over the integer ppm
    * scores; ordered window over the collapsed histogram only). */
  def dsirEval(s: SparkSession, dir: String): DataFrame =
    EvalQueries.gateEval("dsir_keep", dsirSelect(s, dir)
      .select(col("score"), (col("lang") === dsirTargetLang).as("label"),
        col("selected").as("decision")))

  def dsirSelect(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val bg = d.select(col("doc_id"), col("lang"),
        explode(wordNgrams(tokens(col("text")), 2)).as("g"))
      .select(col("doc_id"), col("lang"),
        pmod(md5Long(concat(lit("dsir:"), col("g"))), lit(dsirB.toLong))
          .as("b"))
      .localCheckpoint() // tokenize once: feeds the model AND the scoring
    val cnt = bg.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === dsirTargetLang, 1L).otherwise(0L)).as("ct"))
    val tot = cnt.agg(sum(col("cr")).as("r_tot"), sum(col("ct")).as("t_tot"))
    // DENSE grid: buckets no bigram hashed into still carry smoothing
    // mass, exactly like an unseen token under Laplace smoothing
    val lam = s.range(dsirB).select(col("id").as("b"))
      .join(cnt, Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"),
        (expr(s"(1000000 * (coalesce(ct, 0) + 1)) div (t_tot + $dsirB)")
          - expr(s"(1000000 * (coalesce(cr, 0) + 1)) div (r_tot + $dsirB)"))
          .as("lam"))
    val scores = bg.join(broadcast(lam), Seq("b"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"),
        sum(col("lam")).as("score"))
    d.select("doc_id", "lang").join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score"), lit(0L)).as("score"),
        (coalesce(col("score"), lit(0L)) > 0).as("selected"))
      .orderBy("doc_id")
  }

  // ---- sequence packing (concat-and-chunk) ---------------------------------

  /** Context length for [[sequencePack]] — tokens per training
    * sequence. */
  val packContextLen = 256L

  /** SEQUENCE PACKING — the concat-and-chunk layout every LLM training
    * run performs last: documents are concatenated in a deterministic
    * global order (doc_id — compose with [[epochShuffle]] for a
    * shuffled epoch) and the token stream is cut into fixed
    * [[packContextLen]]-token bins; a document whose tokens straddle a
    * cut spans several bins. Emits one row per document: its global
    * token offset, first/last bin and span width — the placement table
    * a packer materializes so any worker can slice its bins without
    * coordination. A zero-token document attaches to the bin at its
    * offset (span 1, zero tokens), so every doc_id stays addressable.
    *
    * Shape at 100 TB: the global running offset is the ONLY global
    * state, and it runs as the [[graft.ops.EvalQueries]] two-pass
    * distributed prefix sum — range-partition by doc_id, per-partition
    * totals to a P-row offset table (P = shuffle partitions,
    * corpus-independent — the family's single bounded window),
    * broadcast back, add the per-partition local cumsum. Integer sums
    * reassociate freely, so the split prefix equals a single global
    * window bit for bit (PackSpec pins it). No global sort of data
    * rows, no corpus-wide window, nothing driver-side. */
  def sequencePack(s: SparkSession, dir: String): DataFrame =
    packOf(docs(s, dir)).sortWithinPartitions("doc_id")

  private[graft] def packOf(d: DataFrame): DataFrame = packOfFrom(d, 0L)

  /** [[packOf]] with the token stream starting at `offset` — the
    * incremental form [[graft.streaming.PackStream]] extends placement
    * with, one committed batch at a time. */
  private[graft] def packOfFrom(d: DataFrame, offset: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val C = packContextLen
    val parts = d.sparkSession.sessionState.conf.numShufflePartitions
    val nt = d.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    // two-pass distributed EXCLUSIVE prefix sum in doc_id order (the
    // prefixedHistogram pattern; localCheckpoint freezes the sampled
    // range assignment for the two consumers)
    val ranged = nt.repartitionByRange(parts, col("doc_id").asc)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val byPid = Window.orderBy("pid") // P rows — the bounded window
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("pid").agg(sum("n_tokens").as("pt"))
      .select(col("pid"),
        coalesce(sum(col("pt")).over(byPid), lit(0L)).as("off"))
    val local = Window.partitionBy(col("pid")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offsets), Seq("pid"))
      .withColumn("start", lit(offset) + col("off") +
        coalesce(sum(col("n_tokens")).over(local), lit(0L)))
      .withColumn("first_bin", expr(s"start div $C"))
      .withColumn("last_bin",
        expr(s"(start + greatest(n_tokens, 1) - 1) div $C"))
      .select(col("doc_id"), col("n_tokens"), col("start"),
        col("first_bin"), col("last_bin"),
        (col("last_bin") - col("first_bin") + 1).as("n_bins"))
  }

  /** PACK MANIFEST — the per-bin side of [[sequencePack]]: how many
    * documents and tokens land in each [[packContextLen]]-token bin,
    * how many documents START there, and how many of its documents
    * straddle a bin boundary (the attention-masking / document-leakage
    * accounting a packed-training config needs). Row count is linear
    * in documents + total_tokens/C — the explode is over each doc's
    * spanned bins, never a cross product. */
  def packManifest(s: SparkSession, dir: String): DataFrame = {
    val C = packContextLen
    packOf(docs(s, dir))
      .withColumn("bin_id",
        explode(sequence(col("first_bin"), col("last_bin"))))
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("start") + col("n_tokens"), (col("bin_id") + 1) * C) -
          greatest(col("start"), col("bin_id") * C)).as("n_tokens"),
        sum(when(col("first_bin") === col("bin_id"), 1L).otherwise(0L))
          .as("n_started"),
        sum(when(col("last_bin") > col("first_bin"), 1L).otherwise(0L))
          .as("n_crossing"))
      .sortWithinPartitions("bin_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dict_encode" -> (dictEncode _),
    "decontaminate" -> (decontaminate _),
    "decontaminate_fuzzy" -> (decontaminateFuzzy _),
    "dsir_select" -> (dsirSelect _),
    "dsir_eval" -> (dsirEval _),
    "chunk_documents" -> (chunkDocuments _),
    "chunk_dedup" -> (chunkDedup _),
    "dedup_span_scrub" -> (dedupSpanScrub _),
    "dedup_span_scrub_stream" ->
      ((s: SparkSession, dir: String) =>
        graft.streaming.ScrubStream.dedupSpanScrubStream(s, dir)),
    "takedown_replay_scrub" ->
      ((s: SparkSession, dir: String) =>
        graft.streaming.ScrubStream.takedownReplayScrub(s, dir)),
    "oov_rate" -> (oovRate _),
    "sequence_pack" -> (sequencePack _),
    "sequence_pack_stream" ->
      ((s: SparkSession, dir: String) =>
        graft.streaming.PackStream.sequencePackStream(s, dir)),
    "pack_manifest" -> (packManifest _),
    "epoch_shuffle" -> (epochShuffle _),
    "zorder_layout" -> (zorderLayout _),
    "hilbert_layout" -> (hilbertLayout _),
    "zone_map" -> (zoneMap _))

  private val toksCte =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             t -> t != '') AS t
      |  FROM documents)""".stripMargin

  /** Distinct word n-gram CTE over `toks` (mirrors TextFunctions.shingles). */
  private def shCte(n: Int) =
    s"""sh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN length(t) >= $n
       |      THEN list_transform(generate_series(1, length(t) - ${n - 1}),
       |           i -> array_to_string(t[i:i+${n - 1}], ' '))
       |      ELSE CAST([] AS VARCHAR[]) END) AS sh
       |  FROM toks)""".stripMargin

  /** The span-scrub oracle — shared VERBATIM by dedup_span_scrub and
    * dedup_span_scrub_stream (id-ordered ingest makes the stream's
    * output the batch operator's, so one SQL grades both). */
  private lazy val spanScrubOracle =
    s"""WITH $toksCte,
       |d AS (
       |  SELECT doc_id, t,
       |    CASE WHEN length(t) = 0 THEN 1
       |      ELSE CAST(ceil(length(t) / $scrubSpanLen.0) AS BIGINT)
       |    END AS n_spans
       |  FROM toks),
       |sp AS (
       |  SELECT doc_id, i AS span_idx,
       |    array_to_string(t[CAST(i * $scrubSpanLen + 1 AS INT)
       |      : CAST(i * $scrubSpanLen + $scrubSpanLen AS INT)], ' ')
       |      AS span_text
       |  FROM d, unnest(range(0, n_spans)) AS u(i)),
       |k AS (
       |  SELECT doc_id, span_idx, span_text,
       |    row_number() OVER (
       |      PARTITION BY ('0x' || substr(md5(span_text), 1, 15))::BIGINT
       |      ORDER BY doc_id, span_idx) = 1 AS keep_span
       |  FROM sp)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(CASE WHEN keep_span THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_dropped,
       |  coalesce(array_to_string(
       |    list(span_text ORDER BY span_idx) FILTER (keep_span), ' '), '')
       |    AS text_clean
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The [[dsirSelect]] oracle chain as CTEs ending in
    * `scores(doc_id, n_bigrams, score)` — shared by the dsir_select and
    * dsir_eval oracles so the gate and its evaluation replay the SAME
    * hashed-bigram model. */
  private lazy val dsirCtes =
    s"""toksl AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split_regex(lower(text), '\\s+'),
       |                t -> t != '') AS t
       |  FROM documents),
       |bg AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5('dsir:' || g), 1, 15))::BIGINT % $dsirB AS b
       |  FROM (
       |    SELECT doc_id, lang,
       |      unnest(list_transform(generate_series(1, length(t) - 1),
       |        i -> array_to_string(t[i:i+1], ' '))) AS g
       |    FROM toksl)),
       |cnt AS (
       |  SELECT b, count(*) AS cr,
       |    sum(CASE WHEN lang = '$dsirTargetLang' THEN 1 ELSE 0 END) AS ct
       |  FROM bg GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(cr) AS BIGINT) AS r_tot,
       |    CAST(sum(ct) AS BIGINT) AS t_tot FROM cnt),
       |lam AS (
       |  SELECT gs.b,
       |    ((1000000 * (coalesce(cnt.ct, 0) + 1)) // (tot.t_tot + $dsirB))
       |    - ((1000000 * (coalesce(cnt.cr, 0) + 1)) // (tot.r_tot + $dsirB))
       |      AS lam
       |  FROM (SELECT unnest(range(0, $dsirB)) AS b) gs
       |  LEFT JOIN cnt ON cnt.b = gs.b CROSS JOIN tot),
       |scores AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |    CAST(sum(lam.lam) AS BIGINT) AS score
       |  FROM bg JOIN lam ON lam.b = bg.b GROUP BY 1)""".stripMargin

  /** Shared verbatim by sequence_pack and sequence_pack_stream —
    * id-ordered ingest makes the stream's committed placement the
    * batch operator's output, so one SQL grades both. */
  private lazy val sequencePackOracle: String =
    s"""WITH $toksCte,
         |nt AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS n_tokens
         |       FROM toks),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS start
         |  FROM nt)
         |SELECT doc_id, n_tokens, CAST(start AS BIGINT) AS start,
         |  CAST(start // $packContextLen AS BIGINT) AS first_bin,
         |  CAST((start + greatest(n_tokens, 1) - 1) // $packContextLen
         |    AS BIGINT) AS last_bin,
         |  CAST((start + greatest(n_tokens, 1) - 1) // $packContextLen
         |    - start // $packContextLen + 1 AS BIGINT) AS n_bins
         |FROM o ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "dsir_select" ->
      s"""WITH $dsirCtes
         |SELECT d.doc_id, d.lang,
         |  coalesce(s.n_bigrams, 0) AS n_bigrams,
         |  coalesce(s.score, 0) AS score,
         |  coalesce(s.score, 0) > 0 AS selected
         |FROM documents d LEFT JOIN scores s USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "dsir_eval" ->
      s"""WITH $dsirCtes,
         |scored AS (
         |  SELECT coalesce(s.score, 0) AS score,
         |         d.lang = '$dsirTargetLang' AS label,
         |         coalesce(s.score, 0) > 0 AS decision
         |  FROM documents d LEFT JOIN scores s USING (doc_id)),
         |${EvalQueries.gateEvalSql("dsir_keep")}""".stripMargin,
    "dict_encode" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             t -> t != '') AS t
        |  FROM documents),
        |flat AS (
        |  SELECT doc_id, u.pos AS pos, u.tok AS token
        |  FROM (SELECT doc_id, unnest(list_transform(
        |          generate_series(1, length(t)),
        |          i -> {'pos': i, 'tok': t[i]})) AS u
        |        FROM toks)),
        |vocab AS (SELECT token, count(*) AS freq FROM flat GROUP BY 1),
        |ids AS (SELECT token,
        |          row_number() OVER (ORDER BY freq DESC, token) AS id
        |        FROM vocab),
        |enc AS (SELECT f.doc_id, f.pos, i.id
        |        FROM flat f JOIN ids i USING (token))
        |SELECT doc_id, count(*) AS n_tokens,
        |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos) AS ids
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "decontaminate_fuzzy" ->
      s"""WITH $toksCte, ${shCte(contamNgramN)},
         |bench AS (
         |  SELECT doc_id AS bench_doc, CAST(length(sh) AS BIGINT) AS n_bench,
         |         unnest(sh) AS g
         |  FROM sh WHERE doc_id % $benchmarkMod = 0),
         |train AS (
         |  SELECT doc_id, CAST(length(sh) AS BIGINT) AS n_grams, sh
         |  FROM sh WHERE doc_id % $benchmarkMod != 0),
         |pairs AS (
         |  SELECT t.doc_id, b.bench_doc, t.n_grams, b.n_bench,
         |    count(*) AS shared
         |  FROM (SELECT doc_id, n_grams, unnest(sh) AS g FROM train) t
         |  JOIN bench b USING (g) GROUP BY 1, 2, 3, 4),
         |scored AS (
         |  SELECT doc_id, bench_doc, shared,
         |    shared * 1000000 // (n_grams + n_bench - shared) AS jaccard_micro
         |  FROM pairs),
         |best AS (
         |  SELECT doc_id, bench_doc, shared, jaccard_micro FROM (
         |    SELECT *, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY jaccard_micro DESC, bench_doc) AS rn
         |    FROM scored) WHERE rn = 1)
         |SELECT t.doc_id, t.n_grams, b.bench_doc,
         |  coalesce(b.shared, 0) AS shared,
         |  coalesce(b.jaccard_micro, 0) AS jaccard_micro,
         |  coalesce(b.jaccard_micro, 0) >= $contamJaccardTauMicro
         |    AS contaminated
         |FROM train t LEFT JOIN best b USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    "decontaminate" ->
      s"""WITH $toksCte, ${shCte(contamNgramN)},
         |bench AS (
         |  SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % $benchmarkMod = 0),
         |train AS (SELECT doc_id, sh FROM sh WHERE doc_id % $benchmarkMod != 0),
         |hits AS (
         |  SELECT t.doc_id, count(*) AS n_contaminated
         |  FROM (SELECT doc_id, unnest(sh) AS g FROM train) t
         |  JOIN bench USING (g) GROUP BY t.doc_id)
         |SELECT t.doc_id, CAST(length(t.sh) AS BIGINT) AS n_grams,
         |  coalesce(h.n_contaminated, 0) AS n_contaminated,
         |  round(coalesce(CAST(h.n_contaminated AS DOUBLE) / length(t.sh), 0.0), 6)
         |    AS contamination,
         |  coalesce(h.n_contaminated, 0) > 0 AS contaminated
         |FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    "chunk_documents" ->
      s"""WITH $toksCte,
         |d AS (
         |  SELECT doc_id, t, CAST(length(t) AS BIGINT) AS n_toks,
         |    CASE WHEN length(t) <= $chunkWindow THEN 1
         |      ELSE 1 + CAST(ceil((length(t) - $chunkWindow) / $chunkStride.0) AS BIGINT)
         |    END AS n_chunks
         |  FROM toks)
         |SELECT doc_id, i AS chunk_idx,
         |  1 + i * $chunkStride AS start_tok,
         |  least($chunkWindow, n_toks - (1 + i * $chunkStride) + 1) AS chunk_len,
         |  array_to_string(
         |    t[CAST(1 + i * $chunkStride AS INT)
         |      : CAST(i * $chunkStride + $chunkWindow AS INT)], ' ') AS chunk_text
         |FROM d, unnest(range(0, n_chunks)) AS u(i)
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "chunk_dedup" ->
      s"""WITH $toksCte,
         |d AS (
         |  SELECT doc_id, t, CAST(length(t) AS BIGINT) AS n_toks,
         |    CASE WHEN length(t) <= $chunkWindow THEN 1
         |      ELSE 1 + CAST(ceil((length(t) - $chunkWindow) / $chunkStride.0) AS BIGINT)
         |    END AS n_chunks
         |  FROM toks),
         |ch AS (
         |  SELECT doc_id, i AS chunk_idx,
         |    ('0x' || substr(md5(array_to_string(
         |      t[CAST(1 + i * $chunkStride AS INT)
         |        : CAST(i * $chunkStride + $chunkWindow AS INT)], ' ')),
         |      1, 15))::BIGINT AS h
         |  FROM d, unnest(range(0, n_chunks)) AS u(i)),
         |c AS (
         |  SELECT doc_id,
         |    row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) = 1
         |      AS is_canonical
         |  FROM ch)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN is_canonical THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_dup_chunks,
         |  round(CAST(sum(CASE WHEN is_canonical THEN 0 ELSE 1 END) AS DOUBLE)
         |        / count(*), 6) AS dup_chunk_frac
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_span_scrub" -> spanScrubOracle,
    // id-ordered 4-batch ingest ⇒ the stream's trimmed corpus IS the
    // batch operator's output — the two faces share one oracle
    "dedup_span_scrub_stream" -> spanScrubOracle,
    // post-takedown trimmed corpus ≡ the batch scrub of the SURVIVING
    // docs (span restitution contract): the spanScrubOracle CTEs
    // verbatim over `surv` — a span whose first carrier is removed must
    // reappear in the earliest surviving holder's text_clean
    "takedown_replay_scrub" -> {
      s"""WITH surv AS (SELECT doc_id, text FROM documents
         |              WHERE doc_id % ${graft.streaming.Takedown
                            .replayRemovalStride} != 0),
         |""".stripMargin +
        spanScrubOracle.stripPrefix("WITH ")
          .replace("FROM documents", "FROM surv")
    },
    // concat-and-chunk placement: the oracle's single global window is
    // the brute-force twin of the engine's two-pass distributed prefix
    // sum — integer sums reassociate, so they agree bit for bit
    "sequence_pack" -> sequencePackOracle,
    "sequence_pack_stream" -> sequencePackOracle,
    "pack_manifest" ->
      s"""WITH $toksCte,
         |nt AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS n_tokens
         |       FROM toks),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS start
         |  FROM nt),
         |b AS (
         |  SELECT doc_id, n_tokens, CAST(start AS BIGINT) AS start,
         |    CAST(start // $packContextLen AS BIGINT) AS first_bin,
         |    CAST((start + greatest(n_tokens, 1) - 1) // $packContextLen
         |      AS BIGINT) AS last_bin
         |  FROM o),
         |sp AS (
         |  SELECT doc_id, n_tokens, start, first_bin, last_bin,
         |         u.b AS bin_id
         |  FROM b, unnest(generate_series(first_bin, last_bin)) AS u(b))
         |SELECT CAST(bin_id AS BIGINT) AS bin_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(least(start + n_tokens, (bin_id + 1) * $packContextLen)
         |    - greatest(start, bin_id * $packContextLen)) AS BIGINT)
         |    AS n_tokens,
         |  CAST(sum(CASE WHEN first_bin = bin_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_started,
         |  CAST(sum(CASE WHEN last_bin > first_bin THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_crossing
         |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,
    "oov_rate" ->
      s"""WITH $toksCte,
         |tok AS (
         |  SELECT doc_id, unnest(t) AS token FROM toks),
         |counts AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
         |vocab AS (
         |  SELECT token FROM (
         |    SELECT token, sum(c) AS n,
         |      row_number() OVER (ORDER BY sum(c) DESC, token) AS rank
         |    FROM counts GROUP BY token)
         |  WHERE rank <= $oovVocabSize),
         |per_doc AS (
         |  SELECT c.doc_id, sum(c.c) AS n_tokens,
         |    sum(CASE WHEN v.token IS NULL THEN c.c ELSE 0 END) AS n_oov
         |  FROM counts c LEFT JOIN vocab v ON c.token = v.token
         |  GROUP BY c.doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
         |  round(coalesce(CAST(p.n_oov AS DOUBLE) / p.n_tokens, 0.0), 6) AS oov_rate
         |FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "epoch_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5('epoch:$epochSeed:' || CAST(doc_id AS VARCHAR)),
         |     1, 15))::BIGINT AS h
         |  FROM documents)
         |SELECT doc_id, h % $epochShards AS shard,
         |  row_number() OVER (PARTITION BY h % $epochShards
         |                     ORDER BY h, doc_id) AS pos
         |FROM h ORDER BY doc_id""".stripMargin,
    "hilbert_layout" -> {
      // the canonical xy2d walk (15 levels), mechanically unrolled into
      // chained CTEs — each level tests one bit, accumulates the
      // quadrant index, and applies the rot() flip/swap
      val mask = (1L << zorderDimBits) - 1
      val steps = (0 until zorderDimBits).map { i =>
        val s = 1L << (zorderDimBits - 1 - i)
        s"""h${i + 1} AS (
           |  SELECT event_id, user_id, epoch_min,
           |    CASE WHEN (y & $s) = 0 THEN
           |      (CASE WHEN (x & $s) != 0 THEN $mask - y ELSE y END)
           |    ELSE x END AS x,
           |    CASE WHEN (y & $s) = 0 THEN
           |      (CASE WHEN (x & $s) != 0 THEN $mask - x ELSE x END)
           |    ELSE y END AS y,
           |    d + ${s * s} *
           |      xor(3 * (CASE WHEN (x & $s) != 0 THEN 1 ELSE 0 END),
           |          (CASE WHEN (y & $s) != 0 THEN 1 ELSE 0 END)) AS d
           |  FROM h$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT event_id, user_id,
         |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 60 AS epoch_min
         |  FROM events),
         |bounds AS (
         |  SELECT min(user_id) AS u_lo, max(user_id) AS u_hi,
         |         min(epoch_min) AS m_lo, max(epoch_min) AS m_hi
         |  FROM e),
         |h0 AS (
         |  SELECT event_id, user_id, epoch_min,
         |    (user_id - u_lo) // ((u_hi - u_lo + ${1L << zorderDimBits}) // ${1L << zorderDimBits}) AS x,
         |    (epoch_min - m_lo) // ((m_hi - m_lo + ${1L << zorderDimBits}) // ${1L << zorderDimBits}) AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM e, bounds),
         |$steps
         |SELECT event_id, user_id, epoch_min, CAST(d AS BIGINT) AS hval,
         |  CAST(d >> ${2 * zorderDimBits - zorderFileBits} AS BIGINT)
         |    AS file_id
         |FROM h$zorderDimBits ORDER BY event_id""".stripMargin
    },
    "zorder_layout" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id,
         |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 60 AS epoch_min
         |  FROM events),
         |bounds AS (
         |  SELECT min(user_id) AS u_lo, max(user_id) AS u_hi,
         |         min(epoch_min) AS m_lo, max(epoch_min) AS m_hi
         |  FROM e),
         |b AS (
         |  SELECT event_id, user_id, epoch_min,
         |    (user_id - u_lo) // ((u_hi - u_lo + ${1L << zorderDimBits}) // ${1L << zorderDimBits}) AS xb,
         |    (epoch_min - m_lo) // ((m_hi - m_lo + ${1L << zorderDimBits}) // ${1L << zorderDimBits}) AS yb
         |  FROM e, bounds),
         |z AS (
         |  SELECT event_id, user_id, epoch_min,
         |    CAST(list_sum(list_transform(range(0, 30), i ->
         |      (((xb >> i) & 1) << (2 * i))
         |      | (((yb >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS zval
         |  FROM b)
         |SELECT event_id, user_id, epoch_min, zval,
         |  zval >> ${2 * zorderDimBits - zorderFileBits} AS file_id
         |FROM z ORDER BY event_id""".stripMargin,
    "zone_map" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id,
         |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 60 AS epoch_min
         |  FROM events),
         |bounds AS (
         |  SELECT min(user_id) AS u_lo, max(user_id) AS u_hi,
         |         min(epoch_min) AS m_lo, max(epoch_min) AS m_hi
         |  FROM e),
         |b AS (
         |  SELECT event_id, user_id, epoch_min,
         |    (user_id - u_lo) // ((u_hi - u_lo + ${1L << zorderDimBits}) // ${1L << zorderDimBits}) AS xb,
         |    (epoch_min - m_lo) // ((m_hi - m_lo + ${1L << zorderDimBits}) // ${1L << zorderDimBits}) AS yb
         |  FROM e, bounds),
         |z AS (
         |  SELECT user_id, epoch_min,
         |    CAST(list_sum(list_transform(range(0, 30), i ->
         |      (((xb >> i) & 1) << (2 * i))
         |      | (((yb >> i) & 1) << (2 * i + 1)))) AS BIGINT)
         |      >> ${2 * zorderDimBits - zorderFileBits} AS file_id
         |  FROM b),
         |g AS (
         |  SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
         |         min(user_id) AS u_min, max(user_id) AS u_max,
         |         min(epoch_min) AS m_min, max(epoch_min) AS m_max
         |  FROM z GROUP BY file_id)
         |SELECT file_id, n_rows, u_min, u_max, m_min, m_max,
         |  NOT (m_max < m_lo + (m_hi - m_lo + 1) // 8
         |    OR m_min > m_lo + (m_hi - m_lo + 1) // 4) AS band_hit
         |FROM g, bounds ORDER BY file_id""".stripMargin)
}
