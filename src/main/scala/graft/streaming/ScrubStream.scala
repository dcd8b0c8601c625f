package graft.streaming

import graft.ops.PrepQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** INGESTION-TIME exact-span scrub — the streaming face of
  * [[graft.ops.PrepQueries.dedupSpanScrub]] (C4's span dedup, Raffel et
  * al. JMLR'20 §2.2), and a different SHAPE of ingest gate than the
  * dedup trio: [[DedupStream]]/[[NearDupStream]]/[[UrlStream]] admit or
  * drop WHOLE documents, while a span gate TRIMS each admitted document
  * — every document survives, minus the spans some earlier document
  * already carried (boilerplate headers, license blocks, templated
  * paragraphs). A crawl pipeline wants this at ingest because the
  * repeated spans are exactly what balloons raw crawl bytes.
  *
  * Per micro-batch: split to hashed spans ([[PrepQueries.spansOf]] —
  * the batch operator's splitter verbatim), mark within-batch first
  * occurrences (the batch operator's window, batch-sized), anti-probe
  * the PERSISTED span-hash index, reassemble cleaned text through the
  * shared tail ([[PrepQueries.scrubAssemble]]), commit the batch's
  * novel span hashes. The index key is the 60-bit span hash ALONE —
  * unlike [[UrlStream]]'s canonical strings this loses nothing: the
  * batch operator itself canonicalizes BY the hash (its
  * first-occurrence window partitions on `h`), so hash-keyed state is
  * the batch semantics, at 8 bytes per distinct span.
  *
  * Under id-ordered batching the concatenated scrubbed output is
  * EXACTLY the batch operator on the full corpus (global first
  * occurrence = first in SOME earlier batch ∨ first within this batch;
  * ScrubStreamSpec pins it for 1/3/5-way batchings, the registered
  * `dedup_span_scrub_stream` face pins it against the batch face's own
  * DuckDB oracle).
  *
  * Storage layout, marker commit protocol, idempotent replay, crash
  * sweep, compaction ([[DedupStream.compact]], schema-agnostic) and the
  * [[CompactionLock]] ingest guard are [[DedupStream]]'s verbatim.
  *
  * Scale notes (100 TB): the span explode is narrow; the only batch
  * shuffle is the within-batch window on `h`; the index probe is ONE
  * equi-join pre-filtered map-side by a broadcast semi-join on the
  * batch's own distinct hashes — the ever-growing index is never
  * shuffled, the batch side is. Steady-state ingest cost is batch-sized
  * regardless of history. */
object ScrubStream {

  /** Start the ingest stream: `docs` must carry
    * (doc_id long, text string). */
  def start(spark: SparkSession, docs: DataFrame, corpusDir: String,
            checkpoint: String, triggerMs: Long = 200L): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMicroBatch(spark, batch, corpusDir, batchId)
      }
      .start()

  /** One micro-batch: split, mark batch-first spans, anti-probe the
    * index, emit trimmed docs, commit novel span hashes. Idempotent per
    * `batchId` via the docs commit marker. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame,
                      corpusDir: String, batchId: Long): Unit = {
    CompactionLock.requireFree(corpusDir, "ScrubStream.applyMicroBatch")
    DedupStream.recover(corpusDir) // same layout → same orphan sweep
    if (StreamFs.exists(
        s"$corpusDir/docs/batch=$batchId/${DedupStream.Marker}"))
      return // replay
    val spans = PrepQueries.firstOccurrence(
      PrepQueries.spansOf(batch.select("doc_id", "text")))
      .withColumnRenamed("keep_span", "first_in_batch")
      .persist()
    try {
      // hashes already committed by earlier batches: index ⋉ batch keys
      // (broadcast the BATCH side — bounded; the index is never moved)
      val seen =
        if (StreamFs.listNames(s"$corpusDir/index").nonEmpty)
          readIndex(spark, corpusDir)
            .join(broadcast(spans.select("h").distinct()), Seq("h"),
              "left_semi")
            .distinct()
        else spark.range(0).select(col("id").as("h"))
      val marked = spans
        .join(broadcast(seen.withColumn("__seen", lit(1))), Seq("h"), "left")
        .withColumn("keep_span",
          col("first_in_batch") && col("__seen").isNull)
        .persist()
      try {
        // index first, docs last — the docs marker is the commit point;
        // a crash between leaves an orphan index dir recover() sweeps
        DedupStream.writeAtomically(
          marked.filter(col("keep_span")).select("h").distinct(),
          s"$corpusDir/index/batch=$batchId", mark = false)
        DedupStream.writeAtomically(
          PrepQueries.scrubAssemble(
            marked.select("doc_id", "span_idx", "span_text", "keep_span")),
          s"$corpusDir/docs/batch=$batchId", mark = true)
      } finally { marked.unpersist(); () }
    } finally { spans.unpersist(); () }
  }

  /** The trimmed corpus so far: (doc_id, n_spans, n_dropped,
    * text_clean) — one row per ingested document. */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame = {
    val dirs = DedupStream.committedDirs(corpusDir, "docs")
      .filter(StreamFs.hasDataFiles)
    if (dirs.isEmpty)
      spark.range(0).select(col("id").as("doc_id"), col("id").as("n_spans"),
        col("id").as("n_dropped"), lit("").as("text_clean"))
    else
      spark.read.option("basePath", s"$corpusDir/docs").parquet(dirs: _*)
        .select("doc_id", "n_spans", "n_dropped", "text_clean")
  }

  /** The committed span-hash index. */
  def readIndex(spark: SparkSession, corpusDir: String): DataFrame = {
    val dirs = DedupStream.committedDirs(corpusDir, "index")
      .filter(StreamFs.hasDataFiles)
    if (dirs.isEmpty) spark.range(0).select(col("id").as("h"))
    else spark.read.option("basePath", s"$corpusDir/index").parquet(dirs: _*)
      .select("h")
  }

  // ---- registered face ------------------------------------------------

  /** Same staleness assumption and orphan story as the other bench
    * states (GraphStream note). */
  private val streamedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** REGISTERED + DuckDB-oracled: the trimmed corpus after ingesting
    * the documents table in 4 CONTIGUOUS id-range batches — id-ordered,
    * so the output is EXACTLY [[graft.ops.PrepQueries.dedupSpanScrub]]
    * and the face shares that operator's oracle SQL verbatim. State
    * builds once per (JVM, dir); Verify sees the deterministic corpus,
    * Bench times the committed-corpus read. */
  def dedupSpanScrubStream(s: SparkSession, dir: String): DataFrame = {
    val st = streamedDirs.getOrElseUpdate(dir, {
      val d = StreamFs.benchTempDir("graft-scrub-stream") + "/corpus"
      val docs = graft.Tables.documents(s, dir)
        .select("doc_id", "text").localCheckpoint()
      val (lo, hi) = docs.agg(min("doc_id"), max("doc_id")).collect()
        .headOption.map(r => (r.getLong(0), r.getLong(1))).getOrElse((0L, 0L))
      val span = hi - lo + 1
      (0 until 4).foreach { i =>
        val b = docs.filter(col("doc_id") >= lo + i * span / 4 &&
          col("doc_id") < lo + (i + 1) * span / 4 + (if (i == 3) 1 else 0))
        applyMicroBatch(s, b, d, i.toLong)
      }
      d
    })
    readCorpus(s, st).orderBy("doc_id")
  }
}
