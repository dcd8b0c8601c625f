package graft.ops

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over `documents`
  * and `embeddings` (north-star surface; BASELINE.json): exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (the 100 TB story, tested at sf*):
  *  - Exact dedup is a single hash aggregation on a 60-bit content hash —
  *    one shuffle of (hash, doc_id), no text movement.
  *  - Jaccard runs on an *inverted index* (explode shingles → equi-join on
  *    shingle → per-pair counts): work is proportional to shared-shingle
  *    pairs, not n². Shingles with document frequency > [[maxShingleDf]]
  *    are dropped (standard stopword-shingle cap) which both bounds skew
  *    (the hot-key problem at scale) and keeps candidate sets tight.
  *  - MinHash compresses each doc to a k=12 signature (k map-side passes
  *    over the shingle array, no extra shuffle), LSH bands the signature
  *    4×3 so candidate generation is an equi-join on band keys — the
  *    classic shingle→minhash→band→bucket-join pipeline.
  *  - SimHash compresses to one 60-bit int; near-dup candidates come from
  *    a pigeonhole band join (4 chunks of 15 bits: any pair within
  *    hamming ≤ 3 must agree on ≥1 chunk), verified with bit_count(xor).
  *  - Embedding near-dup: brute-force is the correctness baseline;
  *    blocking joins belong to SimilarityQueries' IVF path.
  *
  * Hash conventions: EXACT dedup keys are the full 128-bit md5 hex (a
  * prefix key would falsely merge novel docs at 1e9-doc scale); the
  * similarity families (minhash/simhash/shingles) ride the portable
  * md5-60bit (TextFunctions.md5Long), where collisions are part of the
  * approximation by design. Both have exact DuckDB oracles.
  */
object DedupQueries {
  val maxShingleDf = 100
  val jaccardThreshold = 0.8
  val minhashK = 12
  val lshBands = 4 // × 3 rows per band
  /** Universal-hash family for MinHash: h_k = (a_k·h + b_k) mod p over the
    * md5-60bit base hash reduced mod p. One md5 per shingle instead of k —
    * the family itself is codegen'd integer arithmetic. p is prime,
    * 30-bit, so a_k·h stays well inside BIGINT in both engines. */
  val minhashP = 1000000007L
  val minhashA: Seq[Long] = (0 until minhashK).map(k => ((2L * k + 1) * 2654435761L) % minhashP)
  val minhashB: Seq[Long] = (0 until minhashK).map(k => (k * 1779033703L) % minhashP)
  val simhashBits = 60
  val simhashMaxHamming = 8
  val cosineThreshold = 0.45

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select("doc_id", "text")

  /** Exact dedup: canonical = min doc_id per FULL 128-bit md5 content
    * hash (hex string — the exact gates' key; a 60-bit prefix would
    * falsely merge ~n^2/2^61 novel docs at 1e9-doc scale). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs(s, dir)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("canonical_id",
        min(col("doc_id")).over(Window.partitionBy(col("content_hash"))))
      .select(col("doc_id"), col("content_hash"),
        col("canonical_id"), (col("doc_id") === col("canonical_id")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** URL-level dedup — C4's FIRST dedup stage (Raffel et al. JMLR'20
    * §2.2: one page per URL before any content hashing): group by the
    * CANONICALIZED url ([[TextQueries.urlNormalize]]'s codegen kernel —
    * mixed-case hosts, default ports, tracking params and fragments all
    * collapse), smallest doc_id per group is canonical — exactly
    * [[dedupExact]]'s window keyed on the canonical URL instead of the
    * content hash. At 100 TB: one map-only canonicalize projection +
    * one hash shuffle on the canonical URL (the same shape and skew
    * profile as exact dedup; no text is read at all). */
  def dedupUrl(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, dir)
      .select(col("doc_id"),
        call_function("url_canonicalize", TextQueries.syntheticUrl)
          .as("canonical_url"))
      .withColumn("canonical_id",
        min(col("doc_id")).over(Window.partitionBy(col("canonical_url"))))
      .select(col("doc_id"), col("canonical_url"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** doc_id → distinct 3-gram shingles + count (shared subplan). */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    shingledOf(docs(s, dir))

  private def shingledOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .withColumn("n_sh", size(col("sh")))

  /** Exploded shingle-hash postings: ONE md5 per shingle (codegen'd
    * projection after a codegen'd explode — no interpreted higher-order
    * lambdas), reduced mod [[minhashP]]. Everything downstream (jaccard
    * join keys, the whole MinHash family) is integer arithmetic on `h`. */
  private def hashPostings(s: SparkSession, dir: String): DataFrame =
    hashPostingsOf(docs(s, dir))

  private def hashPostingsOf(d: DataFrame): DataFrame =
    shingledOf(d)
      .select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("n_sh"),
        (md5Long(col("shingle")) % minhashP).as("h"))

  /** N-gram Jaccard near-dup pairs (a < b, jaccard ≥ τ).
    *
    * Inverted-index formulation: the hashed postings are materialized
    * ONCE (`localCheckpoint` — at production scale this is the persisted
    * index table), the document-frequency cap is applied with a broadcast
    * semi-join (no postings shuffle), and the pair join + per-pair count
    * are fully whole-stage-codegen'd. Work is proportional to
    * Σ df² over kept shingles, bounded by [[maxShingleDf]] — the
    * standard stopword-shingle/skew cap. */
  def dedupJaccard(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(s, dir).orderBy("a", "b")

  /** DF-capped inverted shingle index (h, doc_id, n_sh, df) — the shared
    * candidate-generation substrate for [[jaccardPairs]] and
    * [[dedupContainment]]. Postings materialize once (the index feeds
    * prefix build, candidate generation AND verification). The document-
    * frequency cap is a broadcast ANTI-join against the over-cap keys —
    * provably ≤ |postings|/[[maxShingleDf]] of them, so the broadcast is
    * bounded at any corpus size (broadcasting the KEPT keys would be ≈
    * every distinct shingle — unbounded). `df` then rides in via an
    * equi-join on the already-capped postings, whose groups are ≤ cap
    * rows — the hot keys that could skew an h-join are exactly the ones
    * the anti-join just removed. */
  private def invertedIndex(s: SparkSession, dir: String): DataFrame =
    invertedIndexOf(docs(s, dir))

  private def invertedIndexOf(d: DataFrame): DataFrame = {
    val post = hashPostingsOf(d).localCheckpoint()
    val dfTab = post.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val drop = dfTab.filter(col("df") > maxShingleDf).select("h")
    post.join(broadcast(drop), Seq("h"), "left_anti")
      .join(dfTab, Seq("h"))
      .localCheckpoint()
  }

  /** PREFIX FILTER (Chaudhuri et al. / Bayardo et al. / the classic
    * MapReduce set-similarity-join formulation): order each document's
    * shingles by a global canonical order — rarest-first, (df, h)
    * ascending — and keep only the first `m − t + 1` postings, where m is
    * the doc's (df-capped) posting count and t its minimum required
    * overlap. If |A∩B| ≥ t, the first `m_A − t + 1` elements of A in ANY
    * fixed global order must intersect B (otherwise all common elements
    * sit in A's last `t − 1`), so joining PREFIX(A) against the FULL
    * index generates a superset of the qualifying pairs — candidates are
    * then verified exactly, so results are bit-identical, only cheaper.
    * Rarest-first makes the surviving join keys the LOW-df shingles,
    * which both shrinks Σ df_prefix·df and removes the hottest keys from
    * the candidate shuffle entirely.
    *
    * `t` per measure (n = full posting count, the denominator basis of
    * both scores), in the collision-free case (cg = 1 below):
    *  - jaccard ≥ τ with the length filter (nb ≥ τ·na) in force:
    *    common ≥ τ·(na+nb)/(1+τ) ≥ τ·na  ⟹  t = ⌈τ·n⌉ on either side;
    *  - containment ≥ τ: common ≥ τ·min(na,nb) = τ·n_small  ⟹
    *    t = ⌈τ·n⌉ sound only for the pair's SMALLER side, so the prefix
    *    side of the candidate join is constrained to the smaller set.
    *
    * MULTISET CORRECTION (ADVICE r4): `common` is the equi-join's
    * multiset count Σ cₐ(h)·c_b(h) — md5 % p collisions can give a doc
    * duplicate h values (c > 1), inflating `common` past the DISTINCT
    * overlap d the pigeonhole argument bounds. Soundness is restored by
    * a global multiplicity bound cg ≥ max per-doc c (computed as
    * 1 + max(|hs| − |array_distinct(hs)|), a one-row broadcast): from
    * common ≤ cg²·d and common ≤ cg²·min(na, nb),
    *  - the length filter loosens to min ≥ L·max with
    *    L = τ/((1+τ)·cg² − τ)  (L = τ when cg = 1);
    *  - jaccard prefix: common ≥ τ·(na+nb)/(1+τ) ≥ τ·(1+L)·na/(1+τ) ⟹
    *    d ≥ t = ⌈τ·(1+L)·n/((1+τ)·cg²)⌉  (= ⌈τ·n⌉ when cg = 1);
    *  - containment prefix: d ≥ t = ⌈τ·n/cg²⌉ on the smaller side.
    * τ carries a 1e-6 slack for the round(…, 6) in the final filters.
    * Slicing `m − t + 1` ENTRIES stays sound with duplicate entries: the
    * dropped t − 1 entries cover ≤ t − 1 distinct values, so d ≥ t
    * distinct common values still intersect the kept prefix. With no
    * collisions anywhere (the normal case) cg = 1 and every bound
    * reduces exactly to the classic set-semantics form above. */
  /** Per-doc view of the capped index, built in ONE doc_id shuffle:
    * `by_rarity` = postings ascending by (df, h) — the canonical global
    * order, sliced for prefixes; `hs` = postings ascending by h — the
    * sorted list the verify kernel walks; `m` = capped posting count. */
  private def docIndex(idx: DataFrame): DataFrame =
    idx.groupBy(col("doc_id")).agg(
      first(col("n_sh")).as("n_sh"),
      sort_array(collect_list(struct(col("df"), col("h")))).as("by_rarity"),
      sort_array(collect_list(col("h"))).as("hs"))

  /** Attach the global duplicate-multiplicity bound `cg` (see the
    * MULTISET CORRECTION note): a one-row aggregate broadcast onto every
    * doc row. cg = 1 whenever no doc has two shingles hashing to the
    * same h — the overwhelmingly common case (p ≈ 10⁹). */
  private def withDupBound(docTab: DataFrame): DataFrame = {
    val cg = docTab.agg((coalesce(max(
      size(col("hs")) - size(array_distinct(col("hs")))), lit(0)) + 1)
      .cast("double").as("cg"))
    docTab.crossJoin(broadcast(cg))
  }

  /** Prefix postings under a per-row minimum-distinct-overlap bound
    * `t` (may reference `n_sh` and `cg`): keep the first `m − t + 1`
    * entries of `by_rarity`. */
  private def prefixIndex(docTab: DataFrame, t: Column): DataFrame =
    docTab
      .withColumn("plen", greatest(
        (size(col("by_rarity")) - t.cast("int") + 1), lit(0)))
      .select(col("doc_id"), col("n_sh"), col("cg"),
        explode(slice(col("by_rarity"), lit(1), col("plen"))).as("p"))
      .select(col("p.h").as("h"), col("doc_id"), col("n_sh"), col("cg"))

  /** Exact common-shingle counts for an (a, b) candidate-pair set —
    * (a, b, common, na, nb). Verification is the classic per-pair
    * sorted-list merge walk ([[graft.functions.SortedCommonCount]], a
    * codegen'd kernel with the equi-join's multiset semantics — hash
    * collisions double-count on both engines alike): two equi-joins fetch
    * the docs' sorted posting arrays, the count itself is a scalar
    * projection — O(|cand|·|doc|) compute, no verification shuffle. */
  private def verifyPairs(cand: DataFrame, docTab: DataFrame): DataFrame = {
    import graft.functions.SetSimExpressions.sortedCommonCount
    cand
      .join(docTab.select(col("doc_id").as("a"), col("hs").as("ha"),
        col("n_sh").as("na")), Seq("a"))
      .join(docTab.select(col("doc_id").as("b"), col("hs").as("hb"),
        col("n_sh").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        sortedCommonCount(col("ha"), col("hb")).as("common"),
        col("na"), col("nb"))
  }

  /** Common-shingle counts for all candidate pairs (a < b) from the
    * inverted index — (a, b, common, na, nb). Candidates come from the
    * prefix⋈full join ([[prefixIndex]]); verification recounts exactly. */
  private def pairCounts(idx: DataFrame, lengthFilter: Boolean): DataFrame = {
    val docTab = withDupBound(docIndex(idx)).localCheckpoint()
    val cg2 = col("cg") * col("cg")
    if (lengthFilter) {
      // jaccard (bounds: MULTISET CORRECTION note; cg = 1 ⟹ t = ⌈τ·n⌉,
      // L = τ): the candidate join keys on the LOWER doc_id's prefix;
      // the length filter (min ≥ L·max) prunes before the distinct
      // shuffle. τ carries the round(…, 6) slack.
      val tau = lit(jaccardThreshold - 1e-6)
      val lb = tau / ((lit(1.0) + tau) * cg2 - tau)
      val t = ceil(tau * (lit(1.0) + lb) * col("n_sh") / ((lit(1.0) + tau) * cg2))
      val x = prefixIndex(docTab, t)
        .select(col("h"), col("doc_id").as("a"), col("n_sh").as("na"), col("cg"))
      val y = idx.select(col("h"), col("doc_id").as("b"), col("n_sh").as("nb"))
      val cand = x.join(y, Seq("h")).filter(col("a") < col("b") &&
          col("na") >= col("nb") * lb &&
          col("nb") >= col("na") * lb)
        .select("a", "b").distinct()
      verifyPairs(cand, docTab)
    } else {
      // containment: the prefix bound holds only for the pair's smaller
      // set (t = ⌈τ·n/cg²⌉), so the prefix side is pinned to it (ties by
      // doc_id); no length pruning — size-mismatched pairs are the point.
      val tau = lit(containmentThreshold - 1e-6)
      val x = prefixIndex(docTab, ceil(tau * col("n_sh") / cg2))
        .select(col("h"), col("doc_id").as("xa"), col("n_sh").as("xn"))
      val y = idx.select(col("h"), col("doc_id").as("yb"), col("n_sh").as("yn"))
      val cand = x.join(y, Seq("h"))
        .filter(col("xn") < col("yn") ||
          (col("xn") === col("yn") && col("xa") < col("yb")))
        .select(least(col("xa"), col("yb")).as("a"),
          greatest(col("xa"), col("yb")).as("b"))
        .distinct()
      verifyPairs(cand, docTab)
    }
  }

  /** The pair computation behind [[dedupJaccard]] and [[dedupCluster]],
    * without the presentation sort (the cluster path consumes unordered
    * pairs, so it must not pay a range-partition sort). */
  private def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    jaccardPairsOf(docs(s, dir))

  private def jaccardPairsOf(d: DataFrame): DataFrame =
    pairCounts(invertedIndexOf(d), lengthFilter = true)
      .withColumn("jaccard",
        round(col("common") / (col("na") + col("nb") - col("common")), 6))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("a", "b", "common", "jaccard")

  /** Asymmetric near-dup: shingle CONTAINMENT |A∩B| / min(|A|,|B|) ≥ τ —
    * catches a short document wholly embedded in a longer one, which
    * Jaccard structurally misses (the size mismatch caps J at min/max).
    * Same inverted index; no length pruning (the whole point is size-
    * mismatched pairs). */
  val containmentThreshold = 0.7

  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    pairCounts(invertedIndex(s, dir), lengthFilter = false)
      .withColumn("containment",
        round(col("common") / least(col("na"), col("nb")), 6))
      .filter(col("containment") >= containmentThreshold)
      .select(col("a"), col("b"), col("common"), col("na"), col("nb"),
        col("containment"))
      .orderBy("a", "b")

  /** Incremental dedup: a NEW batch of documents checked against the
    * EXISTING corpus's content-hash index (here: the lower doc_id half
    * plays the persisted corpus). Each new doc either is fresh content
    * (`is_new`) or names the corpus doc it duplicates (`dup_of`). At
    * 100 TB this is THE ingestion-time shape: the corpus index is a
    * (hash → canonical id) table bucketed by hash, the batch equi-joins
    * it on the hash — batch-sized work, never a corpus rescan. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("content_hash", md5(col("text")))
    val mid = d.agg(max(col("doc_id"))).first().getLong(0) / 2
    val corpusIndex = d.filter(col("doc_id") <= mid)
      .groupBy("content_hash").agg(min(col("doc_id")).as("dup_of"))
    d.filter(col("doc_id") > mid).select("doc_id", "content_hash")
      .join(corpusIndex, Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"), col("dup_of"),
        col("dup_of").isNull.as("is_new"))
      .orderBy("doc_id")
  }

  /** MinHash signatures: min over shingles of each affine family member.
    * explode → project → 12 partial min-aggregates: every stage is
    * whole-stage-codegen'd, and the map-side combine reduces each
    * partition to one row per doc before the (tiny) shuffle. */
  private def minhashSigs(s: SparkSession, dir: String): DataFrame =
    minhashSigsOf(docs(s, dir))

  /** [[minhashSigs]] over an arbitrary (doc_id, text) DataFrame — the
    * signature kernel the streaming near-dup ingester
    * ([[graft.streaming.NearDupStream]]) shares with the batch operators. */
  private[graft] def minhashSigsOf(d: DataFrame): DataFrame = {
    val sigCols = (0 until minhashK).map { k =>
      min((col("h") * minhashA(k) + minhashB(k)) % minhashP).as(s"mh$k")
    }
    d.select(col("doc_id"), explode(shingles(tokens(col("text")), 3)).as("shingle"))
      .select(col("doc_id"), (md5Long(col("shingle")) % minhashP).as("h"))
      .groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
  }

  /** The LSH band keys for a `sig` array column — (band, joined row key)
    * structs; shared with the streaming ingester. */
  private[graft] def lshBandKeys: Column =
    array((0 until lshBands).map(b =>
      struct(lit(b).as("band"),
        concat_ws("-",
          element_at(col("sig"), b * 3 + 1).cast("string"),
          element_at(col("sig"), b * 3 + 2).cast("string"),
          element_at(col("sig"), b * 3 + 3).cast("string")).as("key"))): _*)

  /** Per-doc MinHash signature (oracle-checks the sketch math itself). */
  def dedupMinhashSig(s: SparkSession, dir: String): DataFrame =
    minhashSigs(s, dir).orderBy("doc_id")

  /** LSH candidates: pairs agreeing on ≥1 of 4 bands (3 rows each),
    * scored by full-signature agreement (est. jaccard = matches/k).
    *
    * The full signature rides along the band rows (one explode, not a
    * 4-way union), so the band self-join verifies candidates in-row —
    * signatures are computed once per join side and there are NO extra
    * verification joins. */
  /** Signature-agreement floor for an LSH candidate to become a verdict
    * (est. jaccard ≥ 8/12 ≈ 0.67 against [[jaccardThreshold]] = 0.8). */
  val lshVerifyMin = 8

  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    lshScoredPairs(s, dir)
      .filter(col("sig_matches") >= lshVerifyMin)
      .orderBy("a", "b")

  /** The LSH candidate pairs BEFORE the [[lshVerifyMin]] verdict filter
    * — every (a < b) pair agreeing on ≥1 band, scored by signature
    * agreement. [[dedupMinhashLsh]] is its filtered face;
    * [[dedupRecallReport]] grades both layers against exact truth. */
  private def lshScoredPairs(s: SparkSession, dir: String): DataFrame =
    lshScoredPairsOf(docs(s, dir))

  private def lshScoredPairsOf(d: DataFrame): DataFrame = {
    // signatures materialized once (the persisted-signature-table pattern)
    val sig = minhashSigsOf(d).select(col("doc_id"),
      array((0 until minhashK).map(k => col(s"mh$k")): _*).as("sig"))
      .localCheckpoint()
    val bandKeys = array((0 until lshBands).map(b =>
      struct(lit(b).as("band"),
        concat_ws("-",
          element_at(col("sig"), b * 3 + 1).cast("string"),
          element_at(col("sig"), b * 3 + 2).cast("string"),
          element_at(col("sig"), b * 3 + 3).cast("string")).as("key"))): _*)
    val bands = sig
      .select(col("doc_id"), col("sig"), explode(bandKeys).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val matches = aggregate(
      zip_with(col("x.sig"), col("y.sig"),
        (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), _ + _)
    bands.as("x").join(bands.as("y"), Seq("band", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        matches.as("sig_matches"))
      .distinct()
      .withColumn("est_jaccard", round(col("sig_matches") / lit(minhashK.toDouble), 6))
  }

  /** SKETCH-RECALL MONITOR — grades the MinHash/LSH machinery against
    * EXACT n-gram Jaccard truth on the same corpus, in one row:
    * candidate-layer recall (did banding SURFACE the true near-dup
    * pairs — the recall LSH banding probabilistically promises) and
    * verdict-layer recall/precision (what the shipped ≥[[lshVerifyMin]]
    * filter keeps of the truth / how much of what it keeps is true).
    * The number a curation team watches before trusting a sketch-based
    * dedup pass — the dedup twin of `ann_recall_report`, closing the
    * same loop for the near-dup family.
    *
    * Shape at 100 TB: the truth side is the prefix-filtered exact pair
    * join ([[jaccardPairs]] — linear by the df-cap + prefix-filter
    * argument), the sketch side the banded join; both are the operators
    * being graded, run as they ship. On a production corpus this
    * monitor runs over a deterministic SAMPLE BLOCK (doc_id range) —
    * recall is a ratio, not an inventory, and a block preserves the
    * within-block pair distribution; the registered face grades the
    * whole sf corpus. The three assembly crossJoins are 1-row × 1-row
    * (the allowlisted class). */
  def dedupRecallReport(s: SparkSession, dir: String): DataFrame =
    recallReportOf(docs(s, dir))

  /** BENCH-ONLY sample-block twin of [[dedupRecallReport]] — the shape
    * the monitor actually runs at 100 TB: recall is a RATIO, not an
    * inventory, so it is estimated on a deterministic contiguous
    * doc_id block (the first quarter — a block preserves the
    * within-block pair distribution that scattered sampling like
    * `id % 4` would destroy, since near-dup pairs concentrate among
    * nearby ids). Same code as the registered face over the block;
    * Bench times what a production monitor pass costs. */
  def dedupRecallSampled(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (lo, hi) = d.agg(min(col("doc_id")), max(col("doc_id"))).collect()
      .headOption.map(r => (r.getLong(0), r.getLong(1))).getOrElse((0L, 0L))
    recallReportOf(d.filter(col("doc_id") < lo + (hi - lo + 1) / 4))
  }

  private def recallReportOf(d: DataFrame): DataFrame = {
    val dd = d.localCheckpoint() // truth + sketch sides share the scan
    val truth = jaccardPairsOf(dd).select("a", "b").localCheckpoint()
    val cand = lshScoredPairsOf(dd).localCheckpoint()
    val verdictN = sum(when(col("sig_matches") >= lshVerifyMin, 1L)
      .otherwise(0L))
    val t = truth.agg(count(lit(1)).as("n_true"))
    val c = cand.agg(count(lit(1)).as("n_cand"),
      coalesce(verdictN, lit(0L)).as("n_verdict"))
    val h = cand.join(truth, Seq("a", "b")).agg(
      count(lit(1)).as("n_cand_hit"),
      coalesce(verdictN, lit(0L)).as("n_verdict_hit"))
    t.crossJoin(c).crossJoin(h) // 1-row × 1-row assembly (allowlisted)
      .select(col("n_true"), col("n_cand"), col("n_cand_hit"),
        col("n_verdict"), col("n_verdict_hit"),
        when(col("n_true") === 0, lit(1.0))
          .otherwise(round(col("n_cand_hit").cast("double") / col("n_true"), 6))
          .as("recall_cand"),
        when(col("n_true") === 0, lit(1.0))
          .otherwise(round(col("n_verdict_hit").cast("double") / col("n_true"), 6))
          .as("recall_verdict"),
        when(col("n_verdict") === 0, lit(0.0))
          .otherwise(round(col("n_verdict_hit").cast("double") / col("n_verdict"), 6))
          .as("precision_verdict"))
  }

  /** INCREMENTAL NEAR-dup: the ingestion-time twin of [[dedupMinhashLsh]]
    * and the near-dup upgrade of [[dedupIncremental]] — a new batch
    * (doc_id > mid) probes the PERSISTED corpus band index (doc_id ≤ mid)
    * and each new doc gets a duplicate verdict: its lowest-id verified
    * near-match, how many corpus docs it collides with, and the best
    * signature agreement. The corpus side is touched only through its
    * (band, key) index — batch-sized work per ingest, no corpus rescan,
    * exactly the [[graft.streaming.DedupStream]] shape with LSH replacing
    * the exact hash. */
  def dedupIncrementalLsh(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSigs(s, dir).select(col("doc_id"),
      array((0 until minhashK).map(k => col(s"mh$k")): _*).as("sig"))
      .localCheckpoint()
    val mid = docs(s, dir).agg(max(col("doc_id"))).first().getLong(0) / 2
    val bandKeys = array((0 until lshBands).map(b =>
      struct(lit(b).as("band"),
        concat_ws("-",
          element_at(col("sig"), b * 3 + 1).cast("string"),
          element_at(col("sig"), b * 3 + 2).cast("string"),
          element_at(col("sig"), b * 3 + 3).cast("string")).as("key"))): _*)
    def bandsOf(df: DataFrame) = df
      .select(col("doc_id"), col("sig"), explode(bandKeys).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val corpus = bandsOf(sig.filter(col("doc_id") <= mid))
    val batch = bandsOf(sig.filter(col("doc_id") > mid))
    val matches = aggregate(
      zip_with(col("x.sig"), col("y.sig"),
        (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), _ + _)
    val hits = batch.as("x").join(corpus.as("y"), Seq("band", "key"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("dup_of"),
        matches.as("sig_matches"))
      .distinct()
      .filter(col("sig_matches") >= 8)
      .groupBy("doc_id").agg(
        min(col("dup_of")).as("dup_of"),
        count(lit(1)).as("n_dups"),
        round(max(col("sig_matches")) / lit(minhashK.toDouble), 6)
          .as("max_est_jaccard"))
    sig.filter(col("doc_id") > mid).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("max_est_jaccard"), lit(0.0)).as("max_est_jaccard"),
        col("dup_of").isNull.as("is_new"))
      .orderBy("doc_id")
  }

  /** 60-bit SimHash per doc: sign-sum of token-hash bits weighted by
    * term frequency — computed entirely map-side by the codegen'd
    * [[graft.functions.SimHash60]] kernel (one tight loop per document,
    * ZERO shuffles; the relational explode→groupBy×2 formulation it
    * replaces is pinned as its equivalence spec). Docs with no tokens are
    * excluded, matching the explode-based formulation and the oracle. */
  private def simhash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), call_function("simhash60", col("toks")).as("simhash"))

  def dedupSimhashSig(s: SparkSession, dir: String): DataFrame =
    simhash(s, dir).orderBy("doc_id")

  /** SimHash near-dup pairs: pigeonhole-banded join (hamming ≤ 8 over 60
    * bits can't be guaranteed by 4 bands; candidates are pairs agreeing on
    * ≥1 15-bit chunk — the standard recall/cost trade — then verified
    * exactly with bit_count(xor). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val sig = simhash(s, dir).localCheckpoint()
    // explode, not a 4-way union: the simhash aggregation runs once per
    // join side instead of 4x
    val chunkArr = array((0 until 4).map(c =>
      struct(lit(c).as("chunk"),
        (shiftright(col("simhash"), c * 15) % 32768).as("key"))): _*)
    val chunks = sig
      .select(col("doc_id"), col("simhash"), explode(chunkArr).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    chunks.as("x").join(chunks.as("y"), Seq("chunk", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= simhashMaxHamming)
      .select("a", "b", "hamming")
      .orderBy("a", "b")
  }

  /** Embedding-cosine near-dup pairs (brute-force baseline). The inner
    * loop is the codegen'd [[graft.functions.DotProduct]] expression —
    * same left-fold accumulation order as the oracle, ~10x the throughput
    * of the interpreted higher-order-function formulation. */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.dotProduct
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(dotProduct(col("e"), col("e"))))
    val a = v.select(col("vec_id").as("a"), col("e").as("ea"), col("norm").as("nna"))
    val b = v.select(col("vec_id").as("b"), col("e").as("eb"), col("norm").as("nnb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("cosine",
        round(dotProduct(col("ea"), col("eb")) / (col("nna") * col("nnb")), 4))
      .filter(col("cosine") >= cosineThreshold)
      .select("a", "b", "cosine")
      .orderBy("a", "b")
  }

  /** Random-hyperplane LSH over embeddings — the scale path that replaces
    * [[dedupEmbedding]]'s O(n²) cross join with a band equi-join.
    *
    * 16 sign bits (dot against deterministic pseudo-random hyperplanes,
    * integer-arithmetic-generated so the DuckDB oracle reproduces them
    * bit-for-bit) → 4 bands × 4 bits → candidates = pairs agreeing on ≥1
    * band → exact cosine verification. At 100 TB the signature table is
    * materialized once and the band join shuffles only (band, key,
    * vec_id) rows — work scales with collisions, not n². */
  val lshPlanes = 16
  val embeddingDim = 64

  private[ops] def planeVec(j: Int): Seq[Double] =
    (0 until embeddingDim).map(d =>
      ((j * embeddingDim.toLong + d) * 2654435761L % 1000000007L)
        / 1000000007.0 - 0.5)

  def dedupEmbeddingLsh(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.dotProduct
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(dotProduct(col("e"), col("e"))))
    val sigBits = (0 until lshPlanes).map { j =>
      when(dotProduct(col("e"), typedLit(planeVec(j))) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val sig = v.withColumn("sig", sigBits)
    val bandArr = array((0 until 4).map(b =>
      struct(lit(b).as("band"),
        (shiftright(col("sig"), b * 4) % 16).as("key"))): _*)
    val bands = sig
      .select(col("vec_id"), col("e"), col("norm"), explode(bandArr).as("bk"))
      .select(col("vec_id"), col("e"), col("norm"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("x").join(bands.as("y"), Seq("band", "key"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(dotProduct(col("x.e"), col("y.e"))
          / (col("x.norm") * col("y.norm")), 4).as("cosine"))
      .filter(col("cosine") >= cosineThreshold)
      .distinct()
      .orderBy("a", "b")
  }

  /** Near-dup CLUSTERING: connected components over the Jaccard pair
    * graph, assigning every document to its cluster's min doc_id (and
    * `keep` = cluster representative) — the operator that actually drops
    * duplicates in a training pipeline.
    *
    * HashMin label propagation: labels start as own id; each round every
    * node takes the min of its neighbors' labels; converges in
    * O(component diameter) rounds. Each round is one equi-join + one
    * aggregate, with `localCheckpoint` truncating the growing lineage —
    * the classic iterative-connected-components shape (at extreme scale
    * swap in large-star/small-star; the round structure is identical).
    * Deterministic, so it oracle-checks against a recursive-CTE closure. */
  def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardPairs(s, dir).select("a", "b").localCheckpoint()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    // iterate only over nodes that appear in the pair graph; isolated
    // docs are their own cluster by definition and join back at the end
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"),
          col("cluster_id").as("dst_label")), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("dst_label")).as("nbr_min"))
      val hashMin = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id").as("old_label"),
          least(col("cluster_id"),
            coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
      // pointer jumping: label := label(label) — halves the rounds to
      // O(log diameter) by following one indirection per round
      val jumped = hashMin.as("l")
        .join(hashMin.select(col("doc_id").as("cluster_id"),
          col("cluster_id").as("parent_label")).as("p"),
          Seq("cluster_id"), "left")
        .select(col("doc_id"), col("old_label"),
          least(col("cluster_id"),
            coalesce(col("parent_label"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint()
      // jumped is already materialized (eager localCheckpoint): the
      // convergence count and next round's labels both read its cached
      // partitions — no further checkpoint job needed
      changed = jumped.filter(col("cluster_id") =!= col("old_label")).count()
      labels = jumped.select("doc_id", "cluster_id")
    }
    docs(s, dir).select(col("doc_id"))
      .join(labels.withColumnRenamed("cluster_id", "linked"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("linked"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }

  /** [[dedupCluster]]'s EXTREME-SCALE twin: alternating large-star /
    * small-star connected components (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) over the same Jaccard
    * pair graph. HashMin pays O(log d) rounds with the FULL edge set
    * joined every round; large-star/small-star instead REWRITES the edge
    * set each round — large-star hangs every larger neighbor off the
    * neighborhood min, small-star flattens the smaller ones — converging
    * in O(log n) rounds on any topology while the edge set itself
    * collapses toward stars (so later rounds touch less data, and
    * high-diameter components don't dominate the round count). Each half
    * round is one groupBy(min) + one equi-join on the CURRENT edge set;
    * per-key skew is bounded because large-star detaches the heavy
    * neighborhoods it creates. Same deterministic min-id labels as
    * [[dedupCluster]] (spec'd identical; shares its recursive-CTE oracle).
    */
  def dedupClusterStar(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardPairs(s, dir).select("a", "b").localCheckpoint()
    docs(s, dir).select(col("doc_id"))
      .join(starLabels(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }

  /** The star loop over an arbitrary (a, b) pair graph — the seam the
    * spec drives directly and [[MediaQueries.dedupMediaClusters]] reuses
    * over the multimodal near-dup pairs. */
  private[graft] def starLabelsOver(s: SparkSession, pairs: DataFrame): DataFrame =
    starLabels(pairs.localCheckpoint())

  /** The alternating large-star/small-star loop: (doc_id, cluster_id) for
    * every node APPEARING in `pairs` (isolated docs join back upstream). */
  private def starLabels(pairs: DataFrame): DataFrame = {
    // large-star: ∀u, m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("nmin"))
        .select(col("u"), least(col("u"), col("nmin")).as("m"))
      sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }

    // small-star: orient edges high→low; ∀u, m = min(Γ<(u) ∪ {u}); emit
    // (v, m) for the other small neighbors and (u, m) itself
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val mins = dir.groupBy("u").agg(min("v").as("m"))
      dir.join(mins, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }

    var edges = pairs.select(col("a").as("u"), col("b").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // fixed point = identical edge set (both are distinct sets, so one
      // symmetric-difference count decides exactly — a single action per
      // round over the already-materialized sets)
      changed = next.exceptAll(edges).unionByName(edges.exceptAll(next)).count()
      edges = next
    }
    // converged edge set is a star forest: u → its component min; the
    // roots themselves label as their own id
    edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .unionByName(edges.select(col("v").as("doc_id"), col("v").as("cluster_id"))
        .distinct())
  }

  /** Cluster RETENTION: the policy step after [[dedupCluster]] — keep
    * exactly one representative per near-dup cluster, chosen by a quality
    * criterion rather than the arbitrary min-id: the LONGEST member
    * (`n_chars` desc, doc_id asc tiebreak), the standard "keep the most
    * complete copy" rule. Cost on top of clustering is one broadcast-able
    * join of the (doc, cluster) labels with the doc metadata plus a
    * per-cluster rank window — the window input is one row per document
    * with bounded cluster sizes, so no skew concern at scale. */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = dedupCluster(s, dir).select("doc_id", "cluster_id")
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    Tables.documents(s, dir).select("doc_id", "n_chars")
      .join(labels, Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "n_chars", "keep")
      .orderBy("doc_id")
  }

  /** Per-document corpus-overlap score: the fraction of a doc's distinct
    * 5-gram shingles that appear in ANY other document — the standard
    * repeated-passage / benchmark-contamination signal (the document-level
    * read of what exact-substring dedup removes span-level). A doc with
    * shared_frac ≥ 0.5 is flagged `likely_dup` for the downstream filter.
    *
    * Shape at scale: distinct-shingle postings materialize once
    * (checkpoint), df is one gram-keyed count, and the postings⋈df
    * equi-join groups are bounded by each gram's df — 5-gram df
    * distributions have no stopword-style heads, so no cap is needed
    * (3-gram paths above do need one). Docs too short for a 5-gram
    * surface with zero counts via the left join, not dropped rows. */
  val sharedNgramN = 5

  def dedupSharedNgrams(s: SparkSession, dir: String): DataFrame = {
    val post = docs(s, dir)
      .select(col("doc_id"),
        explode(shingles(tokens(col("text")), sharedNgramN)).as("g"))
      .localCheckpoint()
    val dfTab = post.groupBy("g").agg(count(lit(1)).as("df"))
    val perDoc = post.join(dfTab, Seq("g")).groupBy("doc_id").agg(
      count(lit(1)).as("n_ngrams"),
      sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
    docs(s, dir).select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared") / col("n_ngrams"), lit(0.0)), 6)
          .as("shared_frac"),
        (round(coalesce(col("n_shared") / col("n_ngrams"), lit(0.0)), 6) >= 0.5)
          .as("likely_dup"))
      .orderBy("doc_id")
  }

  /** Edit-distance fuzzy near-dup — the entity-resolution verifier the
    * hash families can't provide: prefix BLOCKING (first
    * [[fuzzyBlockTokens]] tokens — the sorted-neighborhood staple; real
    * pipelines run several complementary blocking passes) generates
    * candidates via an equi-join on the block key, then `levenshtein`
    * verifies pairs at ≤ [[fuzzyMaxRatio]] of the longer text. The
    * quadratic edit-distance kernel only ever runs on within-block pairs;
    * block sizes are naturally df-capped the same way the shingle indexes
    * are (a giant block = boilerplate prefix = cap-and-drop at scale).
    * Spark 3.5+'s 3-arg `levenshtein(l, r, threshold)` bounds the kernel
    * to a k-band at scale; the 2-arg form here keeps DuckDB parity. */
  val fuzzyBlockTokens = 3
  val fuzzyMaxRatio = 0.25

  def dedupFuzzy(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"),
      concat_ws(" ", slice(tokens(col("text")), 1, fuzzyBlockTokens))
        .as("bkey"),
      length(col("text")).cast("double").as("n"))
    val a = d.select(col("doc_id").as("doc_a"), col("text").as("text_a"),
      col("bkey"), col("n").as("n_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("text").as("text_b"),
      col("bkey"), col("n").as("n_b"))
    a.join(b, Seq("bkey")).filter(col("doc_a") < col("doc_b"))
      .withColumn("ed", levenshtein(col("text_a"), col("text_b")))
      .filter(col("ed") <= lit(fuzzyMaxRatio) * greatest(col("n_a"), col("n_b")))
      .select(col("doc_a"), col("doc_b"),
        col("ed").cast("long").as("edit_distance"),
        round(col("ed") / greatest(col("n_a"), col("n_b")), 6).as("edit_ratio"))
      .orderBy("doc_a", "doc_b")
  }

  /** PageRank over the near-dup pair graph — redundancy CENTRALITY: which
    * documents sit at the center of duplication clusters (boilerplate
    * hubs) vs on the periphery; the link-analysis quality prior a
    * web-corpus curation pipeline computes, exercised on the graph this
    * engine already builds. [[prIters]] fixed power iterations in
    * INTEGER micro-units ([[prScale]]; damping 0.85 as ×85 div 100, and
    * per-edge shares as `rank div deg`) — floor division keeps every
    * step EXACT and order-independent in both engines, where a float
    * PageRank would drift by summation order. No dangling nodes by
    * construction (every graph node has an edge); isolated docs are
    * excluded (their rank is the closed-form base, no iteration needed).
    * Scale shape: each round is one edge⋈rank equi-join + one dst-keyed
    * sum — the canonical distributed PageRank; `localCheckpoint` pins
    * each round like [[dedupCluster]]. */
  val prIters = 10
  val prScale = 1000000000000L

  def dedupPagerank(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardPairs(s, dir).select("a", "b").localCheckpoint()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // max(·,1): an EMPTY pair graph is legitimate (the DF cap can kill
    // every shingle on a low-entropy corpus replicated far enough — the
    // 100× probe hit exactly this) and must yield an empty rank table,
    // not a driver-side division by zero
    val nNodes = math.max(deg.count(), 1L)
    val base = (prScale * 15 / 100) / nNodes
    var rank = deg.select(col("src").as("doc_id"),
      lit(prScale / nNodes).as("rank"))
    for (_ <- 1 to prIters) {
      val inbound = edges
        .join(rank.withColumnRenamed("doc_id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("doc_id"), expr("rank div deg").as("share"))
        .groupBy("doc_id").agg(sum(col("share")).as("s"))
      rank = rank.select("doc_id")
        .join(inbound, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(base) + expr("(coalesce(s, CAST(0 AS BIGINT)) * 85) div 100"))
            .as("rank"))
        .localCheckpoint()
    }
    rank.select(col("doc_id"), col("rank").as("rank_micro"))
      .orderBy("doc_id")
  }

  /** Per-document triangle census over the near-dup pair graph: degree,
    * open wedges d·(d−1)/2, closed triangles, and the local clustering
    * coefficient T / wedges. High clustering marks dense duplicate
    * neighborhoods (template farms, mirror clusters) that pairwise
    * thresholds under-report — the standard graph-quality signal on top
    * of [[dedupCluster]]'s mere connectivity.
    *
    * Shape at scale: triangles are enumerated once each via the ORIENTED
    * edge join — edges stored as a<b, so (a,b)⋈(b,c)⋈(a,c) matches each
    * triangle exactly at its a<b<c orientation. Two equi-joins + one
    * explode-groupBy; no vertex ever sees more than its out-neighborhood
    * squared, and at deployment scale the orientation flips to
    * degree-order (lowest-degree vertex first), the classic bound that
    * keeps heavy hitters from quadratic fan-out. All counts integer. */
  /** k-core threshold and fixed peel rounds (both engines run EXACTLY
    * [[kCoreRounds]] rounds, so results agree converged or not; OpsSpec
    * proves convergence on the real corpus). */
  val kCoreK = 3
  val kCoreRounds = 8

  /** k-core decomposition of the near-dup pair graph — the density
    * grading on top of [[dedupTriangles]]' local clustering: the k-core
    * (maximal subgraph of minimum degree ≥ k) isolates template farms /
    * mirror clusters whose members are MUTUALLY near-duplicate, where
    * mere connectivity ([[dedupCluster]]) also sweeps up chains of
    * borderline pairs. Standard iterative peel (Matula–Beck): drop
    * nodes with degree < k, remove their edges, repeat — each round is
    * one degree aggregate + two semi-joins, `localCheckpoint`-pinned
    * like the CC loops; the edge set only shrinks, so at 100 TB round
    * cost decays geometrically on real graphs. Fixed [[kCoreRounds]]
    * rounds (not until-stable) keep the Spark and DuckDB computations
    * identical by construction. */
  def dedupKcore(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardPairs(s, dir).select("a", "b").localCheckpoint()
    val allNodes = pairs.select(col("a").as("doc_id"))
      .unionByName(pairs.select(col("b").as("doc_id"))).distinct()
      .localCheckpoint()
    var edges = pairs
    for (_ <- 1 to kCoreRounds) {
      val keep = edges.select(col("a").as("doc_id"))
        .unionByName(edges.select(col("b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= kCoreK).select("doc_id")
      edges = edges
        .join(keep.withColumnRenamed("doc_id", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint()
    }
    val coreDeg = edges.select(col("a").as("doc_id"))
      .unionByName(edges.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("core_deg"))
    allNodes.join(coreDeg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"),
        (coalesce(col("core_deg"), lit(0L)) >= kCoreK).as("in_core"))
      .orderBy("doc_id")
  }

  def dedupTriangles(s: SparkSession, dir: String): DataFrame = {
    val e = jaccardPairs(s, dir).select("a", "b").localCheckpoint()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("ta"), col("e1.b").as("tb"), col("e2.b").as("tc"))
    val triPerNode = tri
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("triangles"))
    e.select(col("a").as("doc_id")).unionByName(e.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      .join(triPerNode, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        expr("(degree * (degree - 1)) div 2").as("wedges"))
      .withColumn("clustering",
        round(when(col("degree") >= 2,
          col("triangles") / (col("degree") * (col("degree") - 1) / lit(2.0)))
          .otherwise(lit(0.0)), 6))
      .orderBy("doc_id")
  }

  /** Synchronous label-propagation rounds — fixed so Spark and DuckDB
    * run the identical computation, converged or not (the kCore
    * convention; OpsSpec brute-forces the same 3 rounds). */
  val lpIters = 3

  /** LABEL-PROPAGATION COMMUNITIES over the near-dup pair graph
    * (Raghavan et al., Phys. Rev. E 2007) — the density-sensitive
    * complement of [[dedupCluster]]'s connectivity: connected
    * components sweep a whole chain of borderline pairs into one
    * cluster, while propagation labels converge within DENSE cores and
    * leave weakly-attached bridges in their own communities — the
    * grouping a curation pass wants when picking one representative
    * per template farm without gluing farms bridged by a single
    * borderline pair. Deterministic synchronous variant: every node
    * starts as its own label; each round every node adopts the MODE
    * over its neighbors' labels PLUS its own (self-inclusive — the
    * pure synchronous rule oscillates forever on an isolated pair,
    * a↔b swapping labels each round; the self vote turns that into a
    * tie the smallest-label rule settles), ties → smallest label;
    * isolated nodes therefore keep their own. [[lpIters]] rounds
    * exactly.
    *
    * Shape at 100 TB: per round ONE edge⋈label equi-join, one
    * (node, label) count aggregate, one per-node argmax window
    * (bounded by the node's distinct neighbor labels ≤ degree) — the
    * canonical distributed LPA; `localCheckpoint` pins each round like
    * [[dedupPagerank]]. Window groups are per-node: no global order,
    * no skew beyond max degree, which the pair graph's df-cap already
    * bounds. */
  def dedupLabelprop(s: SparkSession, dir: String): DataFrame =
    // labels are checkpointed, so a global orderBy's sampling pass
    // would be cheap — but the comparator sorts rows itself, so
    // partition-local presentation order suffices (house convention)
    propagateLabels(jaccardPairs(s, dir).select("a", "b"), docs(s, dir))
      .sortWithinPartitions("doc_id")

  /** The [[lpIters]]-round propagation over an (a, b) pair set —
    * shared by the label face and [[dedupCommunitiesReport]] so the
    * report grades exactly the partition the face emits. */
  private def propagateLabels(pairsRaw: DataFrame,
      allDocs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = pairsRaw.localCheckpoint()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var lbl = allDocs
      .select(col("doc_id"), col("doc_id").as("community"))
      .localCheckpoint()
    for (_ <- 1 to lpIters) {
      val cand = edges
        .join(lbl.select(col("doc_id").as("dst"), col("community")),
          Seq("dst"))
        .select(col("src"), col("community"))
        .unionByName(lbl.select(col("doc_id").as("src"), col("community")))
      lbl = cand.groupBy("src", "community").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("src"))
          .orderBy(col("c").desc, col("community"))))
        .filter(col("rk") === 1)
        .select(col("src").as("doc_id"), col("community"))
        .localCheckpoint()
    }
    lbl
  }

  /** PER-COMMUNITY COHERENCE REPORT over the [[dedupLabelprop]]
    * partition: members, internal pairs (both endpoints inside),
    * external pairs (crossing — counted once per touched community)
    * and conductance ext/(2·int + ext) — the artifact that says
    * whether a community is a dense template farm (conductance → 0)
    * or a chain fragment still bleeding edges to its neighbors. The
    * community-grain roll-up of [[dedupTriangles]]' node-local
    * clustering.
    *
    * Shape at 100 TB: the pair set builds ONCE (checkpointed) and
    * feeds both the propagation and the report; the report itself is
    * two label equi-joins onto the pairs + three community-keyed hash
    * aggregates — all map-side combinable, output = one row per
    * community. */
  def dedupCommunitiesReport(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardPairs(s, dir).select("a", "b").localCheckpoint()
    val labels = propagateLabels(pairs, docs(s, dir)).localCheckpoint()
    val lp = pairs
      .join(labels.select(col("doc_id").as("a"), col("community").as("ca")),
        Seq("a"))
      .join(labels.select(col("doc_id").as("b"), col("community").as("cb")),
        Seq("b"))
      .localCheckpoint() // internal + external consumers
    val members = labels.groupBy("community")
      .agg(count(lit(1)).as("n_members"))
    val internal = lp.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("n_internal"))
    val external = lp.filter(col("ca") =!= col("cb"))
      .select(explode(array(col("ca"), col("cb"))).as("community"))
      .groupBy("community").agg(count(lit(1)).as("n_external"))
    members.join(internal, Seq("community"), "left")
      .join(external, Seq("community"), "left")
      .select(col("community"), col("n_members"),
        coalesce(col("n_internal"), lit(0L)).as("n_internal"),
        coalesce(col("n_external"), lit(0L)).as("n_external"))
      .withColumn("conductance",
        when(col("n_internal") * 2 + col("n_external") === 0, lit(0.0))
          .otherwise(round(col("n_external").cast("double") /
            (col("n_internal") * 2 + col("n_external")), 6)))
      .sortWithinPartitions("community")
  }

  /** Source-overlap matrix: pairwise Jaccard between each SOURCE's
    * distinct 3-shingle set — the corpus-diversity report a curation run
    * reads before deciding mixture weights (two mirrors/scrapes of the
    * same site show up as a high-overlap pair; [[dedupSharedNgrams]] is
    * the doc-grain view, this is the corpus-grain roll-up).
    *
    * Shape at scale: the (source, shingle) table is distinct-reduced
    * BEFORE the self-join, and a shingle's join fan-out is bounded by the
    * number of SOURCES (a handful), not its document frequency — so the
    * pair counting is skew-free by construction; sizes ride a
    * sources-sized broadcast. */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val ss = graft.Tables.documents(s, dir)
      .select(col("source"),
        explode(shingles(tokens(col("text")), 3)).as("shingle"))
      .distinct()
    val sizes = ss.groupBy("source").agg(count(lit(1)).as("n_sh"))
    ss.as("a")
      .join(ss.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("common"))
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n_sh").as("na"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n_sh").as("nb"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("common"),
        col("na"), col("nb"),
        round(col("common") / (col("na") + col("nb") - col("common")), 6)
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Fixed fingerprint-window length for [[substringDedup]]: ~5 words of
    * this corpus, long enough that chance 32-char collisions don't occur
    * in natural text (the Lee et al. 2021 paper uses 50 BPE tokens at
    * web scale; the signal is the same). */
  val ssdWindow = 32

  /** Exact repeated-substring detection — the suffix-array dedup signal
    * of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    * Models Better") re-expressed as a distributed fingerprint join: a
    * char position is DUPLICATED iff the [[ssdWindow]]-char window
    * starting there occurs ≥ 2 times anywhere in the corpus (another doc
    * or elsewhere in the same doc); per doc the covered positions merge
    * into maximal contiguous spans. Because every window has the same
    * length, span-merge needs no gaps-and-islands machinery: one lag —
    * a window opens a new span iff pos − prev > window, and contributes
    * min(pos − prev, window) fresh covered chars.
    *
    * Scale shape: ONE shuffle of (window-hash, doc_id, pos) postings,
    * linear in corpus chars; the ≥2-occurrences filter is a partial-
    * aggregated count on the same key (co-partitioned with the fan-back
    * semi-join — no second exchange of the postings); span-merge is one
    * doc-keyed window. At 100 TB the fingerprint pass strides (stride s
    * with window 2·[[ssdWindow]] still catches every repeat ≥ 2·window+s
    * — the CCNet/SlimPajama trick) to cut posting volume s-fold; stride
    * 1 here keeps the operator exactly oracle-checkable. */
  def substringDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    // per-position hashes from the codegen'd gram_md5s kernel (round-16
    // optimization, guide §1.2 per-task work): one incremental md5 per
    // byte-slice instead of substring-copy → md5 → 32-char hex → conv
    // per gram; identical 60-bit values, pinned by the unchanged oracle
    val wins = d.filter(length(col("text")) >= ssdWindow)
      .select(col("doc_id"),
        posexplode(call_function("gram_md5s", col("text"), lit(ssdWindow))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("h"))
      .localCheckpoint() // postings feed both the count and the fan-back
    val dupH = wins.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("h")
    val wlag = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = wins.join(dupH, Seq("h"), "left_semi")
      .withColumn("delta", col("pos") - lag(col("pos"), 1).over(wlag))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(when(col("delta").isNull || col("delta") > ssdWindow, 1L)
          .otherwise(0L)).as("n_spans"),
        sum(when(col("delta").isNull || col("delta") >= ssdWindow,
          lit(ssdWindow)).otherwise(col("delta")).cast("long"))
          .as("dup_chars"))
    d.select(col("doc_id"), length(col("text")).as("n_chars"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        round(coalesce(col("dup_chars"), lit(0L)) /
          col("n_chars").cast("double"), 6).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** Fingerprint-sampling modulus for [[substringDedupSampled]]: keeps
    * every p-th window IN EXPECTATION, selected by content. */
  val ssdSampleMod = 8

  /** The SCALE twin of [[substringDedup]]: Manber-style 0-mod-p
    * content-defined fingerprint sampling (sif, USENIX '94 — the
    * precursor of winnowing). Instead of shuffling every window
    * fingerprint, only windows whose hash ≡ 0 (mod [[ssdSampleMod]])
    * enter the postings — and because selection depends on window
    * CONTENT, two occurrences of the same substring select the same
    * windows regardless of their phase/offset in each document (the
    * property a fixed-stride sample lacks). Map-side work is unchanged
    * (every window still hashes once, linear, codegen'd); the shuffle,
    * count and fan-back shrink ~p-fold. The per-doc output is the
    * duplication SIGNAL (selected / duplicated-selected counts and
    * their ratio) rather than exact span geometry — the QC columns a
    * corpus-scale dedup gate actually thresholds on. */
  def substringDedupSampled(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val sel = d.filter(length(col("text")) >= ssdWindow)
      .select(col("doc_id"),
        explode(call_function("gram_md5s", col("text"), lit(ssdWindow)))
          .as("h"))
      .filter(col("h") % ssdSampleMod === 0)
      .localCheckpoint() // feeds both the count and the fan-back
    val dupH = sel.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("h")
    val agg = sel.join(dupH.withColumn("is_dup", lit(1L)), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sel_windows"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_sel"))
    d.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sel_windows"), lit(0L)).as("n_sel_windows"),
        coalesce(col("n_dup_sel"), lit(0L)).as("n_dup_sel"),
        when(coalesce(col("n_sel_windows"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(coalesce(col("n_dup_sel"), lit(0L)) /
            col("n_sel_windows").cast("double"), 6)).as("est_dup_frac"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "substring_dedup" -> (substringDedup _),
    "substring_dedup_sampled" -> (substringDedupSampled _),
    "source_overlap" -> (sourceOverlap _),
    "dedup_triangles" -> (dedupTriangles _),
    "dedup_kcore" -> (dedupKcore _),
    "dedup_pagerank" -> (dedupPagerank _),
    "dedup_fuzzy" -> (dedupFuzzy _),
    "dedup_cluster" -> (dedupCluster _),
    "dedup_cluster_star" -> (dedupClusterStar _),
    "dedup_keep_best" -> (dedupKeepBest _),
    "dedup_shared_ngrams" -> (dedupSharedNgrams _),
    "dedup_exact" -> (dedupExact _),
    "dedup_url" -> (dedupUrl _),
    "dedup_url_stream" -> (graft.streaming.UrlStream.dedupUrlStream _),
    "url_gate_drift" -> (graft.streaming.UrlStream.urlGateDriftQuery _),
    "dedup_jaccard" -> (dedupJaccard _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_incremental_lsh" -> (dedupIncrementalLsh _),
    "dedup_minhash_sig" -> (dedupMinhashSig _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_recall_report" -> (dedupRecallReport _),
    "dedup_labelprop" -> (dedupLabelprop _),
    "dedup_communities_report" -> (dedupCommunitiesReport _),
    "dedup_simhash_sig" -> (dedupSimhashSig _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_embedding_lsh" -> (dedupEmbeddingLsh _),
    "takedown_replay_exact" ->
      (graft.streaming.Takedown.takedownReplayExact _),
    "takedown_replay" -> (graft.streaming.Takedown.takedownReplay _),
    "takedown_replay_url" -> (graft.streaming.Takedown.takedownReplayUrl _))

  // ---- oracles ----------------------------------------------------------

  private val shingleCte =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             t -> t != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN length(t) >= 3
      |      THEN list_transform(generate_series(1, length(t) - 2),
      |           i -> array_to_string(t[i:i+2], ' '))
      |      ELSE CAST([] AS VARCHAR[]) END) AS sh
      |  FROM toks)""".stripMargin

  private def duckMd5Long(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  private val hashedCte =
    s"""$shingleCte,
       |hsh AS (
       |  SELECT doc_id, length(sh) AS n_sh,
       |         list_transform(sh, s -> ${duckMd5Long("s")} % $minhashP) AS hs
       |  FROM sh)""".stripMargin

  /** The exact-pair CTE tail (given `hsh`) ending in
    * `jpairs(a, b, common, jaccard)`. */
  private val jaccardPairsTail =
    s"""ex AS (SELECT doc_id, n_sh, unnest(hs) AS shingle FROM hsh),
       |keep AS (SELECT shingle FROM ex GROUP BY shingle
       |         HAVING count(*) <= $maxShingleDf),
       |idx AS (SELECT ex.* FROM ex JOIN keep USING (shingle)),
       |jpairs AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common,
       |    round(CAST(count(*) AS DOUBLE) /
       |          (any_value(a.n_sh) + any_value(b.n_sh) - count(*)), 6)
       |      AS jaccard
       |  FROM idx a JOIN idx b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |  HAVING jaccard >= $jaccardThreshold)""".stripMargin

  /** dedup_jaccard's full pair computation as a CTE chain ending in
    * `jpairs(a, b, common, jaccard)` (shared with dedup_cluster). */
  private val jaccardPairsCte =
    s"""$hashedCte,
       |$jaccardPairsTail""".stripMargin

  /** The MinHash-signature CTE tail (given `hsh`) ending in `sigs`. */
  private val sigsTail = {
    val sigExprs = (0 until minhashK).map { k =>
      s"list_min(list_transform(hs, h -> (h * ${minhashA(k)} + ${minhashB(k)}) % $minhashP)) AS mh$k"
    }.mkString(",\n         ")
    s"""sigs AS (
       |  SELECT doc_id,
       |         $sigExprs
       |  FROM hsh)""".stripMargin
  }

  private val sigCte =
    s"""$hashedCte,
       |$sigsTail""".stripMargin

  /** The LSH band/candidate CTE tail (given `sigs`) ending in
    * `lpairs(a, b, sig_matches)` — the PRE-verdict candidate pairs. */
  private val lshPairsTail = {
    val bandRows = (0 until lshBands).map { bnd =>
      val key = (0 until 3).map(r => s"mh${bnd * 3 + r}").mkString(" || '-' || ")
      s"SELECT doc_id, $bnd AS band, $key AS key FROM sigs"
    }.mkString("\n  UNION ALL ")
    val matches = (0 until minhashK)
      .map(k => s"CASE WHEN xs.mh$k = ys.mh$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""bands AS (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |lpairs AS (
       |  SELECT a, b, $matches AS sig_matches
       |  FROM cand JOIN sigs xs ON cand.a = xs.doc_id
       |            JOIN sigs ys ON cand.b = ys.doc_id)""".stripMargin
  }

  private val simhashCte = {
    val bitSums = (0 until simhashBits)
      .map(j => s"sum(CASE WHEN (h >> $j) % 2 = 1 THEN cnt ELSE -cnt END) AS s$j")
      .mkString(",\n         ")
    val packed = (0 until simhashBits)
      .map(j => s"CASE WHEN s$j > 0 THEN (1::BIGINT << $j) ELSE 0 END")
      .mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |                             t -> t != '') AS t
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, tok, count(*) AS cnt
       |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2),
       |hashed AS (SELECT doc_id, cnt, ${duckMd5Long("tok")} AS h FROM tf),
       |bitsums AS (
       |  SELECT doc_id,
       |         $bitSums
       |  FROM hashed GROUP BY doc_id),
       |sig AS (SELECT doc_id, $packed AS simhash FROM bitsums)""".stripMargin
  }

  private lazy val clusterOracleSql =
    s"""WITH RECURSIVE $jaccardPairsCte,
       |edges AS (SELECT a AS src, b AS dst FROM jpairs
       |          UNION SELECT b, a FROM jpairs),
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

  /** One unrolled synchronous label-propagation round for the
    * [[dedupLabelprop]] oracle — mode via count-desc/label-asc
    * row_number, isolated nodes carried by the LEFT join. */
  private def lpStepSql(i: Int): String =
    s"""l$i AS MATERIALIZED (
       |  SELECT src AS doc_id, community FROM (
       |    SELECT src, community, count(*) AS c,
       |      row_number() OVER (PARTITION BY src
       |        ORDER BY count(*) DESC, community) AS rk
       |    FROM (
       |      SELECT e.src, l.community
       |      FROM e JOIN l${i - 1} l ON e.dst = l.doc_id
       |      UNION ALL SELECT doc_id AS src, community FROM l${i - 1})
       |    GROUP BY src, community)
       |  WHERE rk = 1)""".stripMargin

  /** One unrolled PageRank power iteration for the [[dedupPagerank]]
    * oracle — integer floor division matches Spark's `div` exactly. */
  private def prStepSql(i: Int): String =
    s"""r$i AS MATERIALIZED (
       |  SELECT r.doc_id,
       |    (SELECT ${prScale * 15 / 100} // nn FROM n)
       |      + (coalesce(s.s, 0) * 85) // 100 AS rank
       |  FROM r${i - 1} r LEFT JOIN (
       |    SELECT e.dst AS doc_id, sum(r2.rank // dg.deg) AS s
       |    FROM e JOIN r${i - 1} r2 ON e.src = r2.doc_id
       |    JOIN dg ON dg.src = e.src
       |    GROUP BY e.dst) s USING (doc_id))""".stripMargin

  val oracles: Map[String, String] = Map(
    "substring_dedup" ->
      s"""WITH idx AS (
         |  SELECT unnest(generate_series(1,
         |    (SELECT max(length(text)) FROM documents) - ${ssdWindow - 1}))
         |    AS pos),
         |w AS (
         |  SELECT d.doc_id, i.pos,
         |    ${duckMd5Long(s"substr(d.text, i.pos, $ssdWindow)")} AS h
         |  FROM documents d
         |  JOIN idx i ON i.pos <= length(d.text) - ${ssdWindow - 1}),
         |c AS (SELECT h FROM w GROUP BY h HAVING count(*) > 1),
         |lg AS (
         |  SELECT doc_id, pos,
         |    pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS delta
         |  FROM w JOIN c USING (h)),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
         |    CAST(sum(CASE WHEN delta IS NULL OR delta > $ssdWindow
         |         THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
         |    CAST(sum(CASE WHEN delta IS NULL OR delta >= $ssdWindow
         |         THEN $ssdWindow ELSE delta END) AS BIGINT) AS dup_chars
         |  FROM lg GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(n_dup_windows, 0) AS n_dup_windows,
         |  coalesce(n_spans, 0) AS n_spans,
         |  coalesce(dup_chars, 0) AS dup_chars,
         |  round(coalesce(dup_chars, 0) / CAST(length(d.text) AS DOUBLE), 6)
         |    AS dup_frac
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "substring_dedup_sampled" ->
      s"""WITH idx AS (
         |  SELECT unnest(generate_series(1,
         |    (SELECT max(length(text)) FROM documents) - ${ssdWindow - 1}))
         |    AS pos),
         |w AS (
         |  SELECT d.doc_id,
         |    ${duckMd5Long(s"substr(d.text, i.pos, $ssdWindow)")} AS h
         |  FROM documents d
         |  JOIN idx i ON i.pos <= length(d.text) - ${ssdWindow - 1}),
         |sel AS (SELECT doc_id, h FROM w WHERE h % $ssdSampleMod = 0),
         |c AS (SELECT h FROM sel GROUP BY h HAVING count(*) > 1),
         |agg AS (
         |  SELECT sel.doc_id, CAST(count(*) AS BIGINT) AS n_sel_windows,
         |    CAST(sum(CASE WHEN c.h IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_dup_sel
         |  FROM sel LEFT JOIN c ON sel.h = c.h
         |  GROUP BY sel.doc_id)
         |SELECT d.doc_id,
         |  coalesce(n_sel_windows, 0) AS n_sel_windows,
         |  coalesce(n_dup_sel, 0) AS n_dup_sel,
         |  CASE WHEN coalesce(n_sel_windows, 0) = 0 THEN 0.0
         |       ELSE round(coalesce(n_dup_sel, 0) /
         |                  CAST(n_sel_windows AS DOUBLE), 6) END
         |    AS est_dup_frac
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "source_overlap" ->
      s"""WITH $shingleCte,
         |ss AS (
         |  SELECT DISTINCT d.source, u.shingle
         |  FROM (SELECT doc_id, unnest(sh) AS shingle FROM sh) u
         |  JOIN documents d USING (doc_id)),
         |sz AS (SELECT source, count(*) AS n_sh FROM ss GROUP BY 1),
         |pc AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |         count(*) AS common
         |  FROM ss a JOIN ss b
         |    ON a.shingle = b.shingle AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, common, za.n_sh AS na, zb.n_sh AS nb,
         |  round(common / CAST(za.n_sh + zb.n_sh - common AS DOUBLE), 6)
         |    AS jaccard
         |FROM pc JOIN sz za ON source_a = za.source
         |        JOIN sz zb ON source_b = zb.source
         |ORDER BY source_a, source_b""".stripMargin,
    "dedup_kcore" -> {
      // the Matula–Beck peel, mechanically unrolled to kCoreRounds
      // chained CTEs (aggregates are barred from recursive CTE terms)
      // every CTE MATERIALIZED: each round references its predecessor
      // three times, so plain (inlined) CTEs would expand the chain
      // 3^rounds-fold
      val rounds = (0 until kCoreRounds).map { i =>
        s"""n${i + 1} AS MATERIALIZED (
           |  SELECT doc_id FROM (
           |    SELECT a AS doc_id FROM e$i UNION ALL SELECT b FROM e$i)
           |  GROUP BY doc_id HAVING count(*) >= $kCoreK),
           |e${i + 1} AS MATERIALIZED (
           |  SELECT a, b FROM e$i
           |  WHERE a IN (SELECT doc_id FROM n${i + 1})
           |    AND b IN (SELECT doc_id FROM n${i + 1}))""".stripMargin
      }.mkString(",\n")
      s"""WITH $jaccardPairsCte,
         |e0 AS MATERIALIZED (SELECT a, b FROM jpairs),
         |$rounds,
         |allnodes AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT a AS doc_id FROM e0 UNION ALL SELECT b FROM e0)),
         |cd AS (
         |  SELECT doc_id, count(*) AS core_deg FROM (
         |    SELECT a AS doc_id FROM e$kCoreRounds
         |    UNION ALL SELECT b FROM e$kCoreRounds)
         |  GROUP BY doc_id)
         |SELECT an.doc_id,
         |  CAST(coalesce(core_deg, 0) AS BIGINT) AS core_deg,
         |  coalesce(core_deg, 0) >= $kCoreK AS in_core
         |FROM allnodes an LEFT JOIN cd USING (doc_id)
         |ORDER BY an.doc_id""".stripMargin
    },
    "dedup_triangles" ->
      s"""WITH $jaccardPairsCte,
         |e AS MATERIALIZED (SELECT a, b FROM jpairs),
         |tri AS (
         |  SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
         |  FROM e e1 JOIN e e2 ON e1.b = e2.a
         |            JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b),
         |tn AS (
         |  SELECT doc_id, count(*) AS triangles FROM (
         |    SELECT ta AS doc_id FROM tri
         |    UNION ALL SELECT tb FROM tri
         |    UNION ALL SELECT tc FROM tri) GROUP BY doc_id),
         |dg AS (
         |  SELECT doc_id, count(*) AS degree FROM (
         |    SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e)
         |  GROUP BY doc_id)
         |SELECT dg.doc_id, CAST(degree AS BIGINT) AS degree,
         |  CAST(coalesce(triangles, 0) AS BIGINT) AS triangles,
         |  CAST((degree * (degree - 1)) // 2 AS BIGINT) AS wedges,
         |  round(CASE WHEN degree >= 2
         |    THEN coalesce(triangles, 0) / (degree * (degree - 1) / 2.0)
         |    ELSE 0.0 END, 6) AS clustering
         |FROM dg LEFT JOIN tn USING (doc_id) ORDER BY dg.doc_id""".stripMargin,
    "dedup_pagerank" ->
      s"""WITH $jaccardPairsCte,
         |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM jpairs
         |      UNION ALL SELECT b AS src, a AS dst FROM jpairs),
         |dg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |n AS MATERIALIZED (SELECT count(*) AS nn FROM dg),
         |r0 AS MATERIALIZED (
         |  SELECT src AS doc_id, (SELECT $prScale // nn FROM n) AS rank
         |  FROM dg),
         |${(1 to prIters).map(prStepSql).mkString(",\n")}
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank_micro
         |FROM r$prIters ORDER BY doc_id""".stripMargin,
    "dedup_fuzzy" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, CAST(length(text) AS DOUBLE) AS n,
         |    array_to_string(
         |      (list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                   t -> t != ''))[1:$fuzzyBlockTokens], ' ') AS bkey
         |  FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance,
         |  round(levenshtein(a.text, b.text) / greatest(a.n, b.n), 6)
         |    AS edit_ratio
         |FROM d a JOIN d b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
         |WHERE levenshtein(a.text, b.text) <= $fuzzyMaxRatio * greatest(a.n, b.n)
         |ORDER BY doc_a, doc_b""".stripMargin,
    // TAKEDOWN replays: post-takedown corpus ≡ from-scratch ingest of
    // the SURVIVING docs (the re-election contract) — each oracle is the
    // gate's own from-scratch SQL over `documents`/`u` minus the
    // deterministic removal stride
    "takedown_replay_exact" ->
      s"""WITH surv AS (SELECT doc_id, text FROM documents
         |              WHERE doc_id % ${graft.streaming.Takedown
                            .replayRemovalStride} != 0)
         |SELECT doc_id, md5(text) AS content_hash FROM (
         |  SELECT doc_id, text,
         |    min(doc_id) OVER (PARTITION BY md5(text)) AS cid
         |  FROM surv)
         |WHERE doc_id = cid ORDER BY doc_id""".stripMargin,
    "takedown_replay" -> {
      val survSig = sigCte.replace("FROM documents", "FROM surv")
      s"""WITH surv AS (SELECT doc_id, text FROM documents
         |              WHERE doc_id % ${graft.streaming.Takedown
                            .replayRemovalStride} != 0),
         |$survSig,
         |$lshPairsTail
         |SELECT doc_id FROM surv
         |WHERE doc_id NOT IN (SELECT b FROM lpairs
         |                     WHERE sig_matches >= $lshVerifyMin)
         |ORDER BY doc_id""".stripMargin
    },
    "takedown_replay_url" ->
      s"""WITH ${TextQueries.urlSynthSql},
         |surv AS (SELECT doc_id, url, canonical_url FROM u
         |         WHERE doc_id % ${graft.streaming.Takedown
                        .replayUrlRemovalStride} != 0)
         |SELECT doc_id, url, canonical_url FROM (
         |  SELECT doc_id, url, canonical_url,
         |    min(doc_id) OVER (PARTITION BY canonical_url) AS cid
         |  FROM surv)
         |WHERE doc_id = cid ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      s"""SELECT doc_id, md5(text) AS content_hash,
         |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
         |  doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
         |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_url" ->
      s"""WITH ${TextQueries.urlSynthSql}
         |SELECT doc_id, canonical_url,
         |  min(doc_id) OVER (PARTITION BY canonical_url) AS canonical_id,
         |  doc_id = min(doc_id) OVER (PARTITION BY canonical_url) AS keep
         |FROM u ORDER BY doc_id""".stripMargin,
    // the STREAM face's admitted corpus: under id-ordered batching the
    // first-seen canonical is the min doc_id — the batch face's keep set
    "dedup_url_stream" ->
      s"""WITH ${TextQueries.urlSynthSql}
         |SELECT doc_id, url, canonical_url FROM (
         |  SELECT doc_id, url, canonical_url,
         |    min(doc_id) OVER (PARTITION BY canonical_url) AS cid
         |  FROM u)
         |WHERE doc_id = cid ORDER BY doc_id""".stripMargin,
    // the URL gate's per-batch tallies under the 4-quartile id-ordered
    // ingest: admitted ⇔ min doc_id per canonical; the trailing-2
    // window ⇔ the top half of the doc_id range
    "url_gate_drift" ->
      s"""WITH ${TextQueries.urlSynthSql},
         |adm AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY
         |      canonical_url) THEN 1 ELSE 0 END AS admitted
         |  FROM u),
         |bnds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM u),
         |life AS (
         |  SELECT count(*) AS n_life,
         |    CAST(sum(admitted) AS BIGINT) AS n_admitted_life
         |  FROM adm),
         |win AS (
         |  SELECT count(*) AS n_window,
         |    CAST(sum(admitted) AS BIGINT) AS n_admitted_window
         |  FROM adm, bnds
         |  WHERE doc_id >= lo + (2 * (hi - lo + 1)) // 4)
         |SELECT n_life, n_admitted_life,
         |  round(n_admitted_life / CAST(greatest(n_life, 1) AS DOUBLE), 6)
         |    AS admit_rate_life,
         |  n_window, n_admitted_window,
         |  round(n_admitted_window /
         |    CAST(greatest(n_window, 1) AS DOUBLE), 6) AS admit_rate_window,
         |  round(round(n_admitted_window /
         |      CAST(greatest(n_window, 1) AS DOUBLE), 6)
         |    - round(n_admitted_life /
         |      CAST(greatest(n_life, 1) AS DOUBLE), 6), 6) AS admit_delta
         |FROM life CROSS JOIN win""".stripMargin,
    "dedup_jaccard" ->
      s"""WITH $jaccardPairsCte
         |SELECT a, b, common, jaccard FROM jpairs ORDER BY a, b""".stripMargin,
    "dedup_containment" ->
      s"""WITH $hashedCte,
         |ex AS (SELECT doc_id, n_sh, unnest(hs) AS shingle FROM hsh),
         |keep AS (SELECT shingle FROM ex GROUP BY shingle
         |         HAVING count(*) <= $maxShingleDf),
         |idx AS (SELECT ex.* FROM ex JOIN keep USING (shingle)),
         |pairs AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common,
         |         any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb
         |  FROM idx a JOIN idx b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, common, na, nb,
         |  round(CAST(common AS DOUBLE) / least(na, nb), 6) AS containment
         |FROM pairs
         |WHERE round(CAST(common AS DOUBLE) / least(na, nb), 6)
         |      >= $containmentThreshold
         |ORDER BY a, b""".stripMargin,
    // HashMin and large-star/small-star compute the same labels by
    // contract — both share the transitive-closure oracle
    "dedup_cluster" -> clusterOracleSql,
    "dedup_cluster_star" -> clusterOracleSql,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $jaccardPairsCte,
         |edges AS (SELECT a AS src, b AS dst FROM jpairs
         |          UNION SELECT b, a FROM jpairs),
         |reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |minreach AS (SELECT src, min(dst) AS m FROM reach GROUP BY src),
         |lab AS (
         |  SELECT d.doc_id,
         |    least(d.doc_id, coalesce(mr.m, d.doc_id)) AS cluster_id, d.n_chars
         |  FROM documents d LEFT JOIN minreach mr ON d.doc_id = mr.src)
         |SELECT doc_id, cluster_id, n_chars,
         |  row_number() OVER (PARTITION BY cluster_id
         |                     ORDER BY n_chars DESC, doc_id) = 1 AS keep
         |FROM lab ORDER BY doc_id""".stripMargin,
    "dedup_shared_ngrams" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
         |                             t -> t != '') AS t
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN length(t) >= $sharedNgramN
         |      THEN list_transform(generate_series(1, length(t) - ${sharedNgramN - 1}),
         |           i -> array_to_string(t[i:i+${sharedNgramN - 1}], ' '))
         |      ELSE CAST([] AS VARCHAR[]) END) AS sh
         |  FROM toks),
         |post AS (SELECT doc_id, unnest(sh) AS g FROM sh),
         |dft AS (SELECT g, count(*) AS df FROM post GROUP BY g),
         |per_doc AS (
         |  SELECT doc_id, count(*) AS n_ngrams,
         |         sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_shared
         |  FROM post JOIN dft USING (g) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(n_ngrams, 0) AS BIGINT) AS n_ngrams,
         |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
         |  round(coalesce(CAST(n_shared AS DOUBLE) / n_ngrams, 0.0), 6)
         |    AS shared_frac,
         |  round(coalesce(CAST(n_shared AS DOUBLE) / n_ngrams, 0.0), 6) >= 0.5
         |    AS likely_dup
         |FROM documents d LEFT JOIN per_doc USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "dedup_incremental" ->
      s"""WITH d AS (SELECT doc_id, md5(text) AS content_hash
         |           FROM documents),
         |mid AS (SELECT max(doc_id) // 2 AS m FROM d),
         |corpus AS (
         |  SELECT content_hash, min(doc_id) AS dup_of
         |  FROM d, mid WHERE doc_id <= m GROUP BY 1)
         |SELECT d.doc_id, d.content_hash, c.dup_of,
         |       c.dup_of IS NULL AS is_new
         |FROM d JOIN mid ON true
         |LEFT JOIN corpus c ON d.content_hash = c.content_hash
         |WHERE d.doc_id > mid.m
         |ORDER BY d.doc_id""".stripMargin,
    "dedup_minhash_sig" ->
      s"""WITH $sigCte
         |SELECT * FROM sigs ORDER BY doc_id""".stripMargin,
    "dedup_incremental_lsh" -> {
      val bandRows = (0 until lshBands).map { bnd =>
        val key = (0 until 3).map(r => s"mh${bnd * 3 + r}").mkString(" || '-' || ")
        s"SELECT doc_id, $bnd AS band, $key AS key FROM sigs"
      }.mkString("\n  UNION ALL ")
      val matches = (0 until minhashK)
        .map(k => s"CASE WHEN xs.mh$k = ys.mh$k THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $sigCte,
         |mid AS (SELECT max(doc_id) // 2 AS m FROM documents),
         |bands AS (
         |  $bandRows),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS dup_of
         |  FROM bands x JOIN mid ON true JOIN bands y
         |    ON x.band = y.band AND x.key = y.key
         |  WHERE x.doc_id > mid.m AND y.doc_id <= mid.m),
         |ver AS (
         |  SELECT c.doc_id, c.dup_of, $matches AS sig_matches
         |  FROM cand c JOIN sigs xs ON c.doc_id = xs.doc_id
         |              JOIN sigs ys ON c.dup_of = ys.doc_id
         |  WHERE $matches >= 8),
         |hits AS (
         |  SELECT doc_id, min(dup_of) AS dup_of, count(*) AS n_dups,
         |    round(CAST(max(sig_matches) AS DOUBLE) / $minhashK, 6)
         |      AS max_est_jaccard
         |  FROM ver GROUP BY doc_id)
         |SELECT s.doc_id, h.dup_of,
         |  coalesce(h.n_dups, 0) AS n_dups,
         |  coalesce(h.max_est_jaccard, 0.0) AS max_est_jaccard,
         |  h.dup_of IS NULL AS is_new
         |FROM sigs s JOIN mid ON true LEFT JOIN hits h ON s.doc_id = h.doc_id
         |WHERE s.doc_id > mid.m
         |ORDER BY s.doc_id""".stripMargin
    },
    "dedup_minhash_lsh" ->
      s"""WITH $sigCte,
         |$lshPairsTail
         |SELECT a, b, sig_matches,
         |       round(CAST(sig_matches AS DOUBLE) / $minhashK, 6)
         |         AS est_jaccard
         |FROM lpairs
         |WHERE sig_matches >= $lshVerifyMin
         |ORDER BY a, b""".stripMargin,
    "dedup_labelprop" ->
      s"""WITH $jaccardPairsCte,
         |e AS MATERIALIZED (
         |  SELECT a AS src, b AS dst FROM jpairs
         |  UNION ALL SELECT b, a FROM jpairs),
         |l0 AS MATERIALIZED (
         |  SELECT doc_id, doc_id AS community FROM documents),
         |${(1 to lpIters).map(lpStepSql).mkString(",\n")}
         |SELECT doc_id, community FROM l$lpIters
         |ORDER BY doc_id""".stripMargin,
    "dedup_communities_report" ->
      s"""WITH $jaccardPairsCte,
         |e AS MATERIALIZED (
         |  SELECT a AS src, b AS dst FROM jpairs
         |  UNION ALL SELECT b, a FROM jpairs),
         |l0 AS MATERIALIZED (
         |  SELECT doc_id, doc_id AS community FROM documents),
         |${(1 to lpIters).map(lpStepSql).mkString(",\n")},
         |lab AS (SELECT doc_id, community FROM l$lpIters),
         |m AS (SELECT community, count(*) AS n_members FROM lab GROUP BY 1),
         |lp AS MATERIALIZED (
         |  SELECT la.community AS ca, lb.community AS cb
         |  FROM jpairs j
         |  JOIN lab la ON j.a = la.doc_id
         |  JOIN lab lb ON j.b = lb.doc_id),
         |i AS (SELECT ca AS community, count(*) AS n_internal
         |      FROM lp WHERE ca = cb GROUP BY 1),
         |x AS (SELECT community, count(*) AS n_external FROM (
         |        SELECT ca AS community FROM lp WHERE ca != cb
         |        UNION ALL SELECT cb FROM lp WHERE ca != cb)
         |      GROUP BY 1)
         |SELECT m.community, CAST(m.n_members AS BIGINT) AS n_members,
         |  CAST(coalesce(i.n_internal, 0) AS BIGINT) AS n_internal,
         |  CAST(coalesce(x.n_external, 0) AS BIGINT) AS n_external,
         |  CASE WHEN coalesce(i.n_internal, 0) * 2
         |            + coalesce(x.n_external, 0) = 0 THEN 0.0
         |       ELSE round(CAST(coalesce(x.n_external, 0) AS DOUBLE) /
         |            (coalesce(i.n_internal, 0) * 2
         |             + coalesce(x.n_external, 0)), 6)
         |       END AS conductance
         |FROM m LEFT JOIN i USING (community) LEFT JOIN x USING (community)
         |ORDER BY community""".stripMargin,
    "dedup_recall_report" ->
      s"""WITH $hashedCte,
         |$jaccardPairsTail,
         |$sigsTail,
         |$lshPairsTail,
         |t AS (SELECT count(*) AS n_true FROM jpairs),
         |c AS (
         |  SELECT count(*) AS n_cand,
         |    coalesce(sum(CASE WHEN sig_matches >= $lshVerifyMin
         |                      THEN 1 ELSE 0 END), 0) AS n_verdict
         |  FROM lpairs),
         |h AS (
         |  SELECT count(*) AS n_cand_hit,
         |    coalesce(sum(CASE WHEN sig_matches >= $lshVerifyMin
         |                      THEN 1 ELSE 0 END), 0) AS n_verdict_hit
         |  FROM lpairs JOIN jpairs USING (a, b))
         |SELECT CAST(n_true AS BIGINT) AS n_true,
         |  CAST(n_cand AS BIGINT) AS n_cand,
         |  CAST(n_cand_hit AS BIGINT) AS n_cand_hit,
         |  CAST(n_verdict AS BIGINT) AS n_verdict,
         |  CAST(n_verdict_hit AS BIGINT) AS n_verdict_hit,
         |  CASE WHEN n_true = 0 THEN 1.0
         |       ELSE round(CAST(n_cand_hit AS DOUBLE) / n_true, 6)
         |       END AS recall_cand,
         |  CASE WHEN n_true = 0 THEN 1.0
         |       ELSE round(CAST(n_verdict_hit AS DOUBLE) / n_true, 6)
         |       END AS recall_verdict,
         |  CASE WHEN n_verdict = 0 THEN 0.0
         |       ELSE round(CAST(n_verdict_hit AS DOUBLE) / n_verdict, 6)
         |       END AS precision_verdict
         |FROM t CROSS JOIN c CROSS JOIN h""".stripMargin,
    "dedup_simhash_sig" ->
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin,
    "dedup_simhash" -> {
      val chunkRows = (0 until 4).map { c =>
        s"SELECT doc_id, simhash, $c AS chunk, (simhash >> ${c * 15}) % 32768 AS key FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH $simhashCte,
         |chunks AS (
         |  $chunkRows),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |         x.simhash AS ha, y.simhash AS hb
         |  FROM chunks x JOIN chunks y
         |    ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id)
         |SELECT a, b, bit_count(xor(ha, hb)) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= $simhashMaxHamming
         |ORDER BY a, b""".stripMargin
    },
    "dedup_embedding" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e,
         |         sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
         |              x -> x * x), 'sum')) AS norm
         |  FROM embeddings)
         |SELECT a.vec_id AS a, b.vec_id AS b,
         |  round(list_aggregate(list_transform(generate_series(1, length(a.e)),
         |          i -> a.e[i] * b.e[i]), 'sum') / (a.norm * b.norm), 4)
         |    AS cosine
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |WHERE round(list_aggregate(list_transform(generate_series(1, length(a.e)),
         |          i -> a.e[i] * b.e[i]), 'sum') / (a.norm * b.norm), 4)
         |      >= $cosineThreshold
         |ORDER BY a, b""".stripMargin,
    "dedup_embedding_lsh" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e,
         |         sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
         |              x -> x * x), 'sum')) AS norm
         |  FROM embeddings),
         |bits AS (
         |  SELECT vec_id, j,
         |    CASE WHEN list_aggregate(list_transform(
         |           generate_series(1, $embeddingDim),
         |           i -> e[i] * ((((j * $embeddingDim + i - 1) * 2654435761)
         |                         % 1000000007) / 1000000007.0 - 0.5)),
         |         'sum') > 0
         |      THEN (1::BIGINT << j) ELSE 0 END AS bit
         |  FROM v, (SELECT unnest(generate_series(0, ${lshPlanes - 1})) AS j)),
         |sig AS (SELECT vec_id, sum(bit)::BIGINT AS sig FROM bits GROUP BY vec_id),
         |bands AS (
         |  SELECT vec_id, b AS band, (sig >> (4 * b)) % 16 AS key
         |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS b)),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id)
         |SELECT a, b, cosine FROM (
         |  SELECT cand.a, cand.b,
         |    round(list_aggregate(list_transform(generate_series(1, $embeddingDim),
         |            i -> va.e[i] * vb.e[i]), 'sum') / (va.norm * vb.norm), 4)
         |      AS cosine
         |  FROM cand JOIN v va ON cand.a = va.vec_id
         |            JOIN v vb ON cand.b = vb.vec_id)
         |WHERE cosine >= $cosineThreshold
         |ORDER BY a, b""".stripMargin)
}
