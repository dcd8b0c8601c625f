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
  * Drop rule (integer, order-deterministic): a document is dropped when
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
  * Scale notes (100 TB): the probe is ONE equi-join of the batch's
  * ~2/(w+1)-sampled fingerprints against the h-keyed index (bucketed by
  * h at production scale → co-located probe); the index carries (doc_id,
  * h) only — the corpus text is never rescanned, and no per-batch work
  * touches previously committed batches' text.
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
    DedupStream.recover(corpusDir) // same layout → same orphan sweep
    if (StreamFs.exists(s"$corpusDir/docs/batch=$batchId/${DedupStream.Marker}"))
      return // replay
    val fp = TextQueries.winnowFingerprintsOf(batch)
      .select("doc_id", "h").persist()
    try {
      val idxH = readIndex(spark, corpusDir)
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
      // corpus last (kept docs only; its marker is the commit point)
      DedupStream.writeAtomically(
        fp, s"$corpusDir/index/batch=$batchId", mark = false)
      DedupStream.writeAtomically(
        kept.select("doc_id", "text"),
        s"$corpusDir/docs/batch=$batchId", mark = true)
    } finally { fp.unpersist(); () }
  }

  /** The kept corpus so far — committed batches only. */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame = {
    val dirs = DedupStream.committedDirs(corpusDir, "docs")
    if (dirs.isEmpty)
      spark.range(0).select(col("id").as("doc_id"),
        lit("").as("text")).limit(0)
    else
      spark.read.option("basePath", s"$corpusDir/docs").parquet(dirs: _*)
        .select("doc_id", "text")
  }

  /** The committed (doc_id, h) fingerprint index — every processed
    * document of every committed batch. */
  def readIndex(spark: SparkSession, corpusDir: String): DataFrame = {
    val dirs = DedupStream.committedDirs(corpusDir, "index")
    if (dirs.isEmpty)
      spark.range(0).select(col("id").as("doc_id"), col("id").as("h"))
        .limit(0)
    else
      spark.read.option("basePath", s"$corpusDir/index").parquet(dirs: _*)
        .select("doc_id", "h")
  }
}
