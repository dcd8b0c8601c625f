package graft.streaming

import java.io.File

import graft.functions.TextFunctions.md5Long
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** INGESTION-TIME streaming dedup — the streaming face of
  * [[graft.ops.DedupQueries.dedupIncremental]]: each micro-batch of
  * documents is deduplicated within itself, probed against the PERSISTED
  * corpus hash index, and only novel documents are appended; the index
  * gains exactly their hashes. The corpus thus never holds two documents
  * with the same content hash, no matter how input batches interleave.
  *
  * Exactly-once without a commit log: each batch writes to its OWN
  * `batch=<id>` subdirectory via temp-dir + atomic rename, so a replayed
  * batch id (foreachBatch redelivery after a crash) sees its committed
  * directory and no-ops. The corpus/index reads union the committed batch
  * directories — a plain recursive parquet read.
  *
  * Scale notes (100 TB): the per-batch work is ONE equi-join of a
  * batch-sized probe against the index keyed by content hash — the index
  * at production scale is bucketed by hash so the probe co-locates
  * (`streaming/Scd2Stream.applyMicroBatchBucketed` shows that layout);
  * nothing ever rescans the corpus text. Within-batch dedup is a window
  * over the batch only. Appends are new files — no rewrite of history.
  *
  * FILESYSTEM CONTRACT: the commit protocol's correctness rests on
  * directory `rename` being atomic and on consistent listings — true on a
  * local POSIX filesystem (what this sink targets; renames never cross a
  * filesystem boundary because tmp and dst share a parent) and on HDFS;
  * NOT true on object stores (S3 "rename" is copy+delete and can be
  * observed half-done). On an object store, back the corpus with a
  * transactional table format and make the batch-id check a table
  * transaction — the dedup plan (hash window + index anti-join) is
  * unchanged; only this commit plumbing is FS-specific.
  */
object DedupStream {

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

  /** One micro-batch: within-batch dedup (min doc_id per hash wins, the
    * same canonical rule as the batch operators), anti-probe of the
    * persisted index, append novel docs + their index entries. Idempotent
    * per `batchId`: a committed batch directory is the commit marker. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame, corpusDir: String,
                      batchId: Long): Unit = {
    val corpusBatchDir = new File(s"$corpusDir/docs/batch=$batchId")
    val indexBatchDir = new File(s"$corpusDir/index/batch=$batchId")
    recover(corpusDir)
    if (corpusBatchDir.exists() && indexBatchDir.exists()) return // replay
    val hashed = batch
      .withColumn("content_hash", md5Long(col("text")))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))))
      .filter(col("__rank") === 1).drop("__rank")
      .persist()
    try {
      val novel = (if (indexBatchDir.getParentFile.exists() &&
          indexBatchDir.getParentFile.list().nonEmpty)
        hashed.join(readIndex(spark, corpusDir), Seq("content_hash"), "left_anti")
      else hashed).persist()
      try {
        // index first, corpus last: the corpus batch dir is the commit
        // marker, so a crash between the two leaves an orphan index dir
        // that recover() sweeps — never a corpus doc missing its index
        writeAtomically(novel.select("content_hash", "doc_id"), indexBatchDir)
        writeAtomically(novel.select("doc_id", "content_hash", "text"), corpusBatchDir)
      } finally { novel.unpersist(); () }
    } finally { hashed.unpersist(); () }
  }

  /** COMPACTION — the small-files maintenance pass: a long-lived ingest
    * stream accumulates one `batch=N` directory per micro-batch; this
    * rewrites all committed data into the single highest-id batch
    * directory and leaves every other committed `batch=N` as an EMPTY
    * MARKER directory, because a batch id's committed-ness (the replay
    * no-op check, and readIndex's twin check) is exactly "the directory
    * exists" — compaction must not forget ids. Works on any corpus with
    * this layout ([[DedupStream]] and [[graft.streaming.NearDupStream]]);
    * the rewrite is schema-agnostic.
    *
    * Crash-safe via the root-level rename-aside swap (same shape as
    * `Scd2Stream.applyMicroBatch`): the rebuilt corpus is staged at
    * `<dir>.ctmp`, the live root renamed aside, the stage renamed in;
    * [[recover]] completes or rolls back an interrupted swap. CONTRACT:
    * run while the ingest stream is idle (between micro-batches or with
    * the query stopped) — same as any table-maintenance operation. */
  def compact(spark: SparkSession, corpusDir: String): Unit = {
    recover(corpusDir)
    val committed = Option(new File(s"$corpusDir/docs").list())
      .getOrElse(Array.empty).filter(_.startsWith("batch="))
      .filter(b => new File(s"$corpusDir/index/$b").exists())
      .sortBy(_.stripPrefix("batch=").toLong)
    if (committed.length <= 1) return
    val target = committed.last
    val stage = new File(corpusDir + ".ctmp")
    if (stage.exists()) FileUtils.deleteDirectory(stage)
    spark.read.parquet(s"$corpusDir/docs").drop("batch")
      .write.parquet(s"${stage.getPath}/docs/$target")
    spark.read.option("basePath", s"$corpusDir/index")
      .parquet(committed.map(b => s"$corpusDir/index/$b").toIndexedSeq: _*)
      .drop("batch")
      .write.parquet(s"${stage.getPath}/index/$target")
    // empty marker dirs keep every committed id recognizable on replay
    committed.init.foreach { b =>
      new File(s"${stage.getPath}/docs/$b").mkdirs()
      new File(s"${stage.getPath}/index/$b").mkdirs()
    }
    val old = new File(corpusDir + ".cold")
    renameOrThrow(new File(corpusDir), old)
    renameOrThrow(stage, new File(corpusDir))
    FileUtils.deleteDirectory(old)
  }

  private def renameOrThrow(src: File, dst: File): Unit =
    if (!src.renameTo(dst))
      throw new java.io.IOException(s"atomic rename failed: $src -> $dst")

  /** Drop index batch dirs with no committed corpus twin (crash between
    * the two writes), any stale temp dirs, and complete or roll back an
    * interrupted [[compact]] swap. Safe to call any time. */
  def recover(corpusDir: String): Unit = {
    // compaction swap recovery first: the root itself may be mid-rename
    val root = new File(corpusDir)
    val cold = new File(corpusDir + ".cold")
    val ctmp = new File(corpusDir + ".ctmp")
    if (cold.exists()) {
      if (root.exists()) FileUtils.deleteDirectory(cold) // new root live
      else renameOrThrow(cold, root) // crash between the two renames
    }
    if (ctmp.exists()) FileUtils.deleteDirectory(ctmp) // uncommitted stage
    val index = new File(s"$corpusDir/index")
    val dirs = Option(index.listFiles()).getOrElse(Array.empty)
    dirs.filter(_.getName.startsWith("batch=")).foreach { d =>
      if (!new File(s"$corpusDir/docs/${d.getName}").exists())
        FileUtils.deleteDirectory(d)
    }
    Seq("docs", "index").foreach { sub =>
      val parent = new File(s"$corpusDir/$sub")
      Option(parent.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".tmp"))
        .foreach(FileUtils.deleteDirectory)
    }
  }

  private[streaming] def writeAtomically(df: DataFrame, dst: File): Unit = {
    val tmp = new File(dst.getPath + ".tmp")
    if (tmp.exists()) FileUtils.deleteDirectory(tmp)
    df.write.mode("overwrite").parquet(tmp.getPath)
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(s"rename ${tmp.getPath} -> ${dst.getPath} failed")
  }

  /** The deduplicated corpus so far (committed batches only). */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(s"$corpusDir/docs")

  /** The (content_hash, doc_id) index the probes run against. Only hashes
    * whose corpus twin committed count as "seen": the read lists exactly
    * the committed batch directories (partition pruning by path), rather
    * than filtering with an `isin` over every batch id — an In-list that
    * would grow the plan linearly with stream lifetime. The driver-side
    * directory listing is the same O(#batches) the old filter paid, paid
    * once, off the executor path. */
  def readIndex(spark: SparkSession, corpusDir: String): DataFrame = {
    val committed = Option(new File(s"$corpusDir/docs").list())
      .getOrElse(Array.empty).filter(_.startsWith("batch="))
      .filter(b => new File(s"$corpusDir/index/$b").exists())
      .map(b => s"$corpusDir/index/$b").toSeq
    if (committed.isEmpty) {
      import spark.implicits._
      spark.emptyDataset[(Long, Long)].toDF("content_hash", "doc_id")
    } else
      spark.read.option("basePath", s"$corpusDir/index")
        .parquet(committed: _*)
        .select("content_hash", "doc_id")
  }
}
