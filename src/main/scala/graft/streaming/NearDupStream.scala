package graft.streaming

import java.io.File

import graft.ops.DedupQueries
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** INGESTION-TIME streaming NEAR-dup filtering — the streaming face of
  * [[graft.ops.DedupQueries.dedupIncrementalLsh]], completing
  * [[DedupStream]] (exact hashes) with MinHash/LSH: each micro-batch's
  * documents are signed (12 MinHashes), banded (4×3), probed against the
  * PERSISTED band index, and only documents with NO near-duplicate among
  * previously seen documents (or earlier-id documents of the same batch)
  * are appended — the index gains exactly the kept documents' band rows.
  *
  * Drop policy (deterministic, documented): a document is dropped when a
  * band collision with an earlier document (committed corpus, or same
  * batch with smaller doc_id) verifies at ≥ [[DedupQueries.minhashK]]·2/3
  * signature agreement. "Earlier" includes earlier documents that were
  * themselves dropped — near-duplicate similarity is treated as an
  * equivalence for retention purposes (standard ingestion-dedup
  * behavior); the kept corpus is guaranteed pairwise near-dup-free, which
  * is the invariant that matters and what the spec pins.
  *
  * Storage layout, commit protocol, idempotent replay, crash-orphan sweep
  * and the POSIX/HDFS rename contract are exactly [[DedupStream]]'s
  * (docs/batch=N + index/batch=N, temp-dir + atomic rename, index first /
  * corpus-last-as-commit-marker).
  *
  * Scale notes (100 TB): per batch, ONE equi-join of the batch's ~4 band
  * rows/doc against the band-keyed index (bucketed by (band, key) at
  * production scale, so the probe co-locates); signatures ride the band
  * rows so verification is in-row — no second join, and the corpus text
  * is never rescanned.
  */
object NearDupStream {

  private val sigAgreeMin = DedupQueries.minhashK * 2 / 3 // 8 of 12

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

  /** One micro-batch: sign, band, probe (index ∪ earlier-in-batch), keep
    * the novel documents. Idempotent per `batchId` via the committed
    * corpus batch directory. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame, corpusDir: String,
                      batchId: Long): Unit = {
    val corpusBatchDir = new File(s"$corpusDir/docs/batch=$batchId")
    val indexBatchDir = new File(s"$corpusDir/index/batch=$batchId")
    DedupStream.recover(corpusDir) // same layout → same orphan sweep
    if (corpusBatchDir.exists() && indexBatchDir.exists()) return // replay
    val sigs = DedupQueries.minhashSigsOf(batch)
      .select(col("doc_id"),
        array((0 until DedupQueries.minhashK).map(k => col(s"mh$k")): _*)
          .as("sig"))
    val bands = sigs
      .select(col("doc_id"), col("sig"),
        explode(DedupQueries.lshBandKeys).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .persist()
    try {
      val agree = aggregate(
        zip_with(col("x.sig"), col("y.sig"),
          (a, b) => when(a === b, 1).otherwise(0)),
        lit(0), (acc, m) => acc + m)
      // witnesses: committed index rows + earlier-id rows of this batch
      val earlier = bands.as("x").join(bands.as("y"), Seq("band", "key"))
        .filter(col("x.doc_id") > col("y.doc_id"))
        .filter(agree >= sigAgreeMin)
        .select(col("x.doc_id").as("doc_id"))
      val indexed = bands.as("x").join(readIndex(spark, corpusDir).as("y"),
        Seq("band", "key"))
        .filter(agree >= sigAgreeMin)
        .select(col("x.doc_id").as("doc_id"))
      val dropped = earlier.unionByName(indexed).distinct()
      val kept = batch.join(sigs, Seq("doc_id"))
        .join(dropped, Seq("doc_id"), "left_anti")
        .persist()
      try {
        // index first, corpus last (the corpus dir is the commit marker)
        DedupStream.writeAtomically(
          kept.select(col("doc_id"), col("sig"),
              explode(DedupQueries.lshBandKeys).as("bk"))
            .select(col("doc_id"), col("sig"),
              col("bk.band").as("band"), col("bk.key").as("key")),
          indexBatchDir)
        DedupStream.writeAtomically(
          kept.select("doc_id", "text"), corpusBatchDir)
      } finally { kept.unpersist(); () }
    } finally { bands.unpersist(); () }
  }

  /** The kept (near-dup-free) corpus so far. */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(s"$corpusDir/docs")

  /** The committed (band, key, sig, doc_id) index — committed batch dirs
    * only, read by path (no unbounded In-list; see DedupStream.readIndex). */
  def readIndex(spark: SparkSession, corpusDir: String): DataFrame = {
    val committed = Option(new File(s"$corpusDir/docs").list())
      .getOrElse(Array.empty).filter(_.startsWith("batch="))
      .filter(b => new File(s"$corpusDir/index/$b").exists())
      .map(b => s"$corpusDir/index/$b").toSeq
    if (committed.isEmpty)
      spark.range(0).select(col("id").as("doc_id"),
        array().cast("array<bigint>").as("sig"),
        lit(0).as("band"), lit("").as("key"))
    else
      spark.read.option("basePath", s"$corpusDir/index")
        .parquet(committed: _*)
        .select("doc_id", "sig", "band", "key")
  }
}
