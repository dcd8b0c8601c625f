package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DETERMINISTIC BPE TOKENIZER — byte-pair-encoding merge training and
  * token-id-level corpus statistics as first-class relational operators,
  * exactly replayable by the DuckDB oracle.
  *
  * Training (the classic Sennrich et al. 2016 procedure, made relational):
  * word types (lowercased `[a-z0-9]+` runs) weighted by corpus frequency
  * start as character sequences plus a `</w>` terminal; each of
  * [[bpeMerges]] FIXED iterations (no data-dependent stopping — the
  * oracle unrolls the same count) then
  *
  *   1. counts adjacent symbol pairs weighted by type frequency (a lead()
  *      window over the symbol table + one map-side-combinable aggregate),
  *   2. picks the argmax pair — ties broken (count DESC, left ASC,
  *      right ASC), so both engines pick the same pair bit-for-bit
  *      (integer counts, string compares),
  *   3. merges that pair LEFT-TO-RIGHT NON-OVERLAPPING everywhere: for
  *      runs of overlapping matches (only possible when left = right) the
  *      kept occurrences are the odd-indexed ones within each maximal run
  *      ("island") of consecutive match positions — a window-function
  *      restatement of the sequential scan that needs no recursion, so
  *      the SQL replay is plain windows + joins too.
  *
  * Scale shape (100 TB): everything keys on the word-TYPE table, whose
  * size is Heaps-law bounded (millions of rows when the corpus is
  * billions of documents) — the corpus itself is touched once to build
  * type frequencies and once to join token lengths back per document.
  * Each iteration is windows partitioned by word (thousands of tiny
  * independent partitions, never a global sort) plus one scalar argmax.
  * Iterations are `localCheckpoint`ed: the loop's lineage stays linear
  * (each state computed exactly once) instead of doubling per iteration
  * through the two consumers (pair counts + rewrite) of each state.
  *
  * The reference has no tokenizer (its flow is CDC plumbing); this is
  * part of the engine's training-data surface: `pack_sequences` /
  * `oov_rate` shapes re-expressed over REAL subword token ids.
  */
object BpeQueries {

  /** Fixed merge count — small enough for the oracle to unroll, enough to
    * learn the corpus's dominant subwords. */
  val bpeMerges = 8
  val vocabTopK = 100
  val packBudget = 256
  val packShards = 8

  /** (doc_id, word) occurrence rows. */
  private def occurrences(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("word"))

  /** One BPE merge iteration over the (word, freq, pos, sym) state. */
  private[graft] def mergeStep(state: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("word").orderBy("pos")
    val withNext = state.withColumn("nxt", lead(col("sym"), 1).over(wOrd))
    val best = withNext.filter(col("nxt").isNotNull)
      .groupBy("sym", "nxt").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("sym").asc, col("nxt").asc).limit(1)
      .select(col("sym").as("L"), col("nxt").as("R"))
    // left-to-right non-overlapping keep rule as ONE stacked window chain
    // (no self-join): a maximal run of consecutive match positions keeps
    // its 1st, 3rd, 5th… occurrence — i.e. matches at even offsets from
    // the run start; a row is consumed when its predecessor was kept
    val run = Window.partitionBy("word").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withNext.crossJoin(broadcast(best))
      .withColumn("m",
        (col("sym") === col("L") && col("nxt") === col("R")).cast("int"))
      .withColumn("runStart",
        (col("m") === 1 &&
          coalesce(lag(col("m"), 1).over(wOrd), lit(0)) === 0).cast("int"))
      .withColumn("startPos",
        max(when(col("runStart") === 1, col("pos"))).over(run))
      .withColumn("k",
        col("m") === 1 && pmod(col("pos") - col("startPos"), lit(2)) === 0)
      .withColumn("consumed", coalesce(lag(col("k"), 1).over(wOrd), lit(false)))
      .filter(!col("consumed"))
      .select(col("word"), col("freq"),
        row_number().over(wOrd).as("pos"),
        when(col("k"), concat(col("L"), col("R"))).otherwise(col("sym")).as("sym"))
  }

  /** The trained symbol table: every word type fully encoded by the
    * [[bpeMerges]] learned merges — (word, freq, pos, sym). */
  private[graft] def trainedSyms(s: SparkSession, dir: String): DataFrame = {
    val ty = occurrences(s, dir).groupBy("word").agg(count(lit(1)).as("freq"))
    var state = ty.select(col("word"), col("freq"),
        posexplode(concat(
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
          array(lit("</w>")))))
      .toDF("word", "freq", "pos", "sym")
    for (_ <- 1 to bpeMerges)
      state = mergeStep(state).localCheckpoint(true)
    state
  }

  /** The learned subword vocabulary: top-[[vocabTopK]] tokens by corpus
    * frequency (type-freq-weighted occurrences in the encoded corpus),
    * ties by token — the `vocab_topk` shape over REAL subword units. */
  def bpeVocab(s: SparkSession, dir: String): DataFrame =
    trainedSyms(s, dir)
      .groupBy(col("sym").as("token"))
      .agg(countDistinct(col("word")).as("n_types"),
        sum(col("freq")).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(vocabTopK)
      .select("token", "n_types", "freq")

  /** Sequence packing over REAL BPE token counts — the
    * [[CurationQueries.packSequences]] layout with the whitespace proxy
    * replaced by the trained tokenizer's per-word subword counts (the
    * merge-trained symbol table broadcasts; the corpus joins it once). */
  def packSequencesBpe(s: SparkSession, dir: String): DataFrame = {
    val wl = trainedSyms(s, dir).groupBy("word")
      .agg(count(lit(1)).as("n_sym"))
    val perDoc = occurrences(s, dir)
      .join(broadcast(wl), Seq("word"))
      .groupBy("doc_id").agg(sum("n_sym").as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    Tables.documents(s, dir).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(packShards)).as("shard"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("start_tok") / lit(packBudget)).as("chunk_id"),
        (col("start_tok") % lit(packBudget)).as("chunk_offset"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_vocab" -> (bpeVocab _),
    "pack_sequences_bpe" -> (packSequencesBpe _))

  // ---- oracle SQL: the same training unrolled as CTEs ----------------------

  private def mergeStepSql(i: Int): String = {
    val prev = if (i == 1) "s0" else s"s${i - 1}"
    s"""n$i AS MATERIALIZED (
       |  SELECT word, freq, pos, sym,
       |         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
       |  FROM $prev),
       |b$i AS (
       |  SELECT sym AS l, nxt AS r FROM n$i WHERE nxt IS NOT NULL
       |  GROUP BY sym, nxt ORDER BY sum(freq) DESC, sym ASC, nxt ASC LIMIT 1),
       |f$i AS MATERIALIZED (SELECT n.*, b.l, b.r FROM n$i n CROSS JOIN b$i b),
       |m$i AS (
       |  SELECT word, pos,
       |         pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS island
       |  FROM f$i WHERE sym = l AND nxt = r),
       |k$i AS (
       |  SELECT word, pos FROM (
       |    SELECT word, pos,
       |           row_number() OVER (PARTITION BY word, island ORDER BY pos) AS kr
       |    FROM m$i) WHERE kr % 2 = 1),
       |r$i AS (
       |  SELECT f.word, f.freq, f.pos,
       |         CASE WHEN k.pos IS NOT NULL THEN f.l || f.r ELSE f.sym END AS sym,
       |         (k.pos IS NOT NULL) AS iskept
       |  FROM f$i f LEFT JOIN k$i k USING (word, pos)),
       |s$i AS MATERIALIZED (
       |  SELECT word, freq,
       |         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
       |  FROM (SELECT *, coalesce(lag(iskept) OVER (PARTITION BY word ORDER BY pos),
       |                           false) AS consumed
       |        FROM r$i)
       |  WHERE NOT consumed)""".stripMargin
  }

  private val trainCtes =
    s"""occ AS MATERIALIZED (
       |  SELECT doc_id, u.w AS word
       |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS u(w)),
       |ty AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM occ GROUP BY word),
       |s0 AS MATERIALIZED (
       |  SELECT word, freq, pos,
       |         CASE WHEN pos <= length(word) THEN word[pos] ELSE '</w>' END AS sym
       |  FROM (SELECT word, freq,
       |          unnest(generate_series(1, length(word) + 1)) AS pos
       |        FROM ty)),
       |${(1 to bpeMerges).map(mergeStepSql).mkString(",\n")}""".stripMargin

  val oracles: Map[String, String] = Map(
    "bpe_vocab" ->
      s"""WITH $trainCtes
         |SELECT sym AS token,
         |  CAST(count(DISTINCT word) AS BIGINT) AS n_types,
         |  CAST(sum(freq) AS BIGINT) AS freq
         |FROM s$bpeMerges GROUP BY sym
         |ORDER BY freq DESC, token ASC LIMIT $vocabTopK""".stripMargin,
    "pack_sequences_bpe" ->
      s"""WITH $trainCtes,
         |wl AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sym
         |       FROM s$bpeMerges GROUP BY word),
         |pd AS (SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS n_tokens
         |       FROM occ JOIN wl USING (word) GROUP BY doc_id),
         |d AS (SELECT d.doc_id, d.doc_id % $packShards AS shard,
         |             coalesce(pd.n_tokens, 0) AS n_tokens
         |      FROM documents d LEFT JOIN pd USING (doc_id)),
         |p AS (SELECT doc_id, shard, n_tokens,
         |             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
         |                  - n_tokens AS BIGINT) AS start_tok
         |      FROM d)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(floor(start_tok / $packBudget.0) AS BIGINT) AS chunk_id,
         |  CAST(start_tok % $packBudget AS BIGINT) AS chunk_offset
         |FROM p ORDER BY doc_id""".stripMargin)
}
