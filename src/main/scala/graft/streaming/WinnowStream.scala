package graft.streaming

import graft.ops.TextQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** INGESTION-TIME streaming winnow dedup — the streaming face of
  * [[graft.ops.TextQueries.winnowIngest]], completing the ingest-filter
  * trio: [[DedupStream]] (exact doc hashes), [[NearDupStream]]
  * (MinHash/LSH near-dups), and now MOSS winnow fingerprints with their
  * DETERMINISTIC shared-substring guarantee (any ≥ winnowW+winnowK−1-char
  * share selects a common fingerprint — recall is guaranteed, not
  * probabilistic).
  *
  * Drop rule — stream ≡ batch holds for ID-ORDERED ARRIVAL (every doc
  * in a batch has a larger doc_id than every previously committed doc;
  * that is the condition WinnowStreamSpec pins, and what "equals the
  * one-shot batch operator" means below): a document is dropped when
  * at least half its winnow fingerprints already exist in the PERSISTED
  * fingerprint index or were first selected by an earlier-id document of
  * the same batch (`2·n_shared ≥ n_fingerprints`; fingerprint-less short
  * docs keep). The index stores the fingerprints of EVERY processed
  * document — kept and dropped alike — so for id-ordered arrival the
  * keep decision for doc x depends only on the set of smaller-id docs,
  * never on batch boundaries: the stream is batching-invariant and
  * equals the one-shot [[TextQueries.winnowIngest]] keep set
  * (WinnowStreamSpec pins both, plus replay idempotence).
  *
  * Storage layout, marker-file commit protocol, idempotent replay and
  * crash-orphan sweep are exactly [[DedupStream]]'s (docs/batch=N +
  * index/batch=N, staged write + `_GRAFT_COMMIT` marker on the docs dir
  * as the commit point, all I/O through [[StreamFs]]).
  *
  * Scale notes (100 TB): the probe is a broadcast SEMI-join of the
  * ever-growing h-keyed index against the batch's own distinct
  * fingerprint set (batch-sized) — the index is filtered map-side and
  * never shuffled, so per-batch cost is proportional to the batch plus
  * one index scan (bucketed by h at production scale → the scan prunes
  * too; [[DedupStream.compact]] bounds the file count). The index
  * carries distinct (doc_id, h) only — the corpus text is never
  * rescanned, and no per-batch work touches previously committed
  * batches' text. Steady-state per-batch wall-clock is measured flat in
  * BASELINE.md's round-11 table.
  */
object WinnowStream {

  /** Start the ingest stream: `docs` must carry (doc_id long, text string). */
  def start(spark: SparkSession, docs: DataFrame, corpusDir: String,
            checkpoint: String, triggerMs: Long = 200L): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMicroBatch(spark, batch, corpusDir, batchId)
      }
      .start()

  /** One micro-batch: fingerprint, probe (index ∪ earlier-in-batch),
    * keep docs below the half-shared threshold; index EVERY document's
    * fingerprints. Idempotent per `batchId` via the corpus commit
    * marker. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame, corpusDir: String,
                      batchId: Long): Unit = {
    // same layout → same compact() + Takedown, so the same ingest guard
    CompactionLock.requireFree(corpusDir, "WinnowStream.applyMicroBatch")
    DedupStream.recover(corpusDir) // same layout → same orphan sweep
    if (StreamFs.exists(s"$corpusDir/docs/batch=$batchId/${DedupStream.Marker}"))
      return // replay
    val fp = TextQueries.winnowFingerprintsOf(batch)
      .select("doc_id", "h").persist()
    try {
      // probe the index BY THE BATCH'S OWN fingerprint set: a broadcast
      // semi-join keyed on the batch's distinct h (batch-sized) filters
      // the index scan map-side — per-batch cost stays proportional to
      // the BATCH, not to the ever-growing committed index. The old form
      // (full-index select("h").distinct()) re-shuffled the whole index
      // every batch — O(index) per batch, unbounded in steady state
      // (round-11 steady-state table in BASELINE.md measures the fix).
      // Index batches are written pre-distinct, so the post-filter
      // distinct dedups only cross-batch repeats of batch-local keys.
      val batchH = fp.select("h").distinct()
      val idxH = readIndex(spark, corpusDir)
        .join(broadcast(batchH), Seq("h"), "left_semi")
        .select("h").distinct().withColumn("in_idx", lit(1))
      val firstB = fp.groupBy("h").agg(min(col("doc_id")).as("first_id"))
      val scored = fp
        .join(firstB, Seq("h"))
        .join(idxH, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"),
          sum(when(col("in_idx").isNotNull ||
            col("first_id") < col("doc_id"), 1L).otherwise(0L)).as("n_sh"))
      val dropped = scored
        .filter(col("n_sh") * 2 >= col("n_fp")).select("doc_id")
      val kept = batch.join(dropped, Seq("doc_id"), "left_anti")
      // index first (ALL docs' fingerprints — cross-batch witnesses),
      // corpus last (kept docs only; its marker is the commit point).
      // One row per (doc_id, h) — the probe only tests h existence —
      // with the POSITIONAL MULTIPLICITY as `cnt`: fp repeats a pair
      // once per selecting window position, and carrying the count in
      // the index lets a later [[Takedown]] re-run the threshold
      // recount as pure index arithmetic, never re-reading text (the
      // round-16 probe measured the re-fingerprint leg at 143 s for a
      // 50-doc removal on a 500k-doc corpus — all of it avoidable)
      DedupStream.writeAtomically(
        fp.groupBy("doc_id", "h").agg(count(lit(1)).as("cnt"))
          .withColumn("arrival_seq", lit(batchId)),
        s"$corpusDir/index/batch=$batchId", mark = false)
      // drops QUARANTINE (full rows): a later [[Takedown]] re-counts a
      // dropped doc's shared-fingerprint verdict from this text when the
      // witnesses that dropped it are removed — selection, not deletion
      DedupStream.writeAtomically(
        batch.join(dropped, Seq("doc_id"), "left_semi")
          .select("doc_id", "text")
          .withColumn("arrival_seq", lit(batchId)),
        s"$corpusDir/drops/batch=$batchId", mark = false)
      DedupStream.writeAtomically(
        kept.select("doc_id", "text"),
        s"$corpusDir/docs/batch=$batchId", mark = true)
    } finally { fp.unpersist(); () }
  }

  /** The kept corpus so far — committed batches only, committed
    * takedowns applied ([[Takedown.view]]: removed docs gone, re-counted
    * promoted docs unioned in). */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame = {
    val dirs = DedupStream.committedDirs(corpusDir, "docs")
      .filter(StreamFs.hasDataFiles)
    val base =
      if (dirs.isEmpty)
        spark.range(0).select(col("id").as("doc_id"),
          lit("").as("text")).limit(0)
      else
        spark.read.option("basePath", s"$corpusDir/docs").parquet(dirs: _*)
          .select("doc_id", "text")
    Takedown.view(spark, corpusDir, base, "docs")
  }

  /** The committed (doc_id, h, cnt, arrival_seq) fingerprint index —
    * every processed document of every committed batch, committed
    * takedowns applied: a removed doc's fingerprints are DERIVED DATA
    * and go with the content — they stop witnessing future arrivals
    * the moment the tombstone commits. `cnt` is the selected-position
    * multiplicity of the pair (the takedown recount's exact n_fp/n_sh
    * weights). */
  def readIndex(spark: SparkSession, corpusDir: String): DataFrame = {
    val dirs = DedupStream.committedDirs(corpusDir, "index")
      .filter(StreamFs.hasDataFiles)
    val base =
      if (dirs.isEmpty)
        spark.range(0).select(col("id").as("doc_id"), col("id").as("h"),
          col("id").as("cnt"), col("id").as("arrival_seq")).limit(0)
      else
        spark.read.option("basePath", s"$corpusDir/index").parquet(dirs: _*)
          .select("doc_id", "h", "cnt", "arrival_seq")
    Takedown.view(spark, corpusDir, base, "index")
  }
}
