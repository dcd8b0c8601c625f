package graft.streaming

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
  * `batch=<id>` subdirectory, and the batch is committed exactly when the
  * corpus batch directory carries the `_GRAFT_COMMIT` marker file — a
  * replayed batch id (foreachBatch redelivery after a crash) sees its
  * marker and no-ops. The corpus/index reads union the committed batch
  * directories — a plain parquet read over their paths.
  *
  * Scale notes (100 TB): the per-batch work is ONE equi-join of a
  * batch-sized probe against the index keyed by content hash — the index
  * at production scale is bucketed by hash so the probe co-locates
  * (`streaming/Scd2Stream.applyMicroBatchBucketed` shows that layout);
  * nothing ever rescans the corpus text. Within-batch dedup is a window
  * over the batch only. Appends are new files — no rewrite of history.
  *
  * FILESYSTEM CONTRACT: all protocol I/O goes through
  * [[StreamFs]] (`org.apache.hadoop.fs.FileContext`), so the layout works
  * on any Hadoop-reachable store. On local POSIX filesystems and HDFS the
  * batch-dir renames are atomic; on object stores (S3-style, where
  * "rename" is copy+delete and can be observed half-done) correctness
  * comes from the MARKER protocol instead: data first, one marker-file
  * PUT as the commit point, and readers/recovery treat any unmarked
  * directory as uncommitted debris. [[compact]] additionally swaps the
  * corpus ROOT via two renames and so still wants rename atomicity — on
  * an object store run compaction through a transactional table format;
  * the ingest commit path above does not need it.
  */
object DedupStream {

  /** Leading '_' → invisible to parquet reads, like _SUCCESS. */
  private[streaming] val Marker = "_GRAFT_COMMIT"

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

  /** Is this batch directory pair committed? The corpus-side marker is
    * the single commit point (index is written before it). */
  private def committed(corpusDir: String, batchName: String): Boolean =
    StreamFs.exists(s"$corpusDir/docs/$batchName/$Marker")

  /** One micro-batch: within-batch dedup (min doc_id per hash wins, the
    * same canonical rule as the batch operators), anti-probe of the
    * persisted index, append novel docs + their index entries; dropped
    * docs are QUARANTINED to `drops/batch=N` (full rows) so a later
    * [[Takedown]] can re-elect a representative when a kept canonical
    * is removed — the gate's job is selection, not deletion (a crawl
    * pipeline keeps the raw arrivals anyway). Idempotent per `batchId`:
    * the committed marker is the replay check. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame, corpusDir: String,
                      batchId: Long): Unit = {
    // the compact/ingest exclusion is a loud error, not a doc contract
    // (round-13 verdict #6); a STALE lock doesn't block — recover sweeps
    CompactionLock.requireFree(corpusDir, "DedupStream.applyMicroBatch")
    recover(corpusDir)
    if (committed(corpusDir, s"batch=$batchId")) return // replay
    // FULL 128-bit md5 hex as the claim/index key (the CurationStream
    // rule, round-15 verdict #3): a 60-bit prefix key silently FALSELY
    // REJECTS ~n^2/2^61 novel docs at the 1e9-doc target — data loss for
    // an exact gate. 60-bit keys stay where collisions are by design
    // (minhash/simhash/sketch families).
    val all = batch
      .withColumn("content_hash", md5(col("text")))
      .persist()
    val hashed = all
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))))
      .filter(col("__rank") === 1).drop("__rank")
      .persist()
    try {
      // anti-probe keyed by the BATCH's hash set: the broadcast
      // semi-join filters the ever-growing index map-side down to the
      // (≤ batch-sized) hits, which then broadcast as the anti-join's
      // build side — the index is never shuffled, per-batch cost stays
      // proportional to the batch + one index scan (the round-11
      // WinnowStream review, applied to all three ingest streams)
      val novel = (if (StreamFs.listNames(s"$corpusDir/index").nonEmpty) {
        val hits = readIndex(spark, corpusDir)
          .join(broadcast(hashed.select("content_hash").distinct()),
            Seq("content_hash"), "left_semi")
          .select("content_hash").distinct()
        hashed.join(broadcast(hits), Seq("content_hash"), "left_anti")
      } else hashed).persist()
      try {
        // index first, drops second, corpus last: the corpus marker is
        // the commit point, so a crash between the writes leaves orphan
        // index/drops dirs that recover() sweeps — never a corpus doc
        // missing its index
        // arrival_seq (= the committing batch id, monotone per gate)
        // rides every index/drops row so [[Takedown]] re-election can
        // replay the TRUE arrival order under ANY batching, and the
        // ordering survives compaction's single-dir fold (round-15
        // verdict #5 — the partition dir alone dies with compact)
        writeAtomically(novel.select("content_hash", "doc_id")
            .withColumn("arrival_seq", lit(batchId)),
          s"$corpusDir/index/batch=$batchId", mark = false)
        writeAtomically(
          all.join(novel.select("doc_id"), Seq("doc_id"), "left_anti")
            .select("doc_id", "content_hash", "text")
            .withColumn("arrival_seq", lit(batchId)),
          s"$corpusDir/drops/batch=$batchId", mark = false)
        writeAtomically(novel.select("doc_id", "content_hash", "text"),
          s"$corpusDir/docs/batch=$batchId", mark = true)
      } finally { novel.unpersist(); () }
    } finally { hashed.unpersist(); all.unpersist(); () }
  }

  /** COMPACTION — the small-files maintenance pass: a long-lived ingest
    * stream accumulates one `batch=N` directory per micro-batch; this
    * rewrites all committed data into the single highest-id batch
    * directory and leaves every other committed `batch=N` as an empty
    * MARKER directory (just the `_GRAFT_COMMIT` file), because a batch
    * id's committed-ness — the replay no-op check, and the readers' twin
    * check — is exactly "the marker exists"; compaction must not forget
    * ids. Works on any corpus with this layout ([[DedupStream]] and
    * [[NearDupStream]]); the rewrite is schema-agnostic.
    *
    * Crash-safe via the root-level rename-aside swap (same shape as
    * `Scd2Stream.applyMicroBatch`): the rebuilt corpus is staged at
    * `<dir>.ctmp`, the live root renamed aside, the stage renamed in;
    * [[recover]] completes or rolls back an interrupted swap. CONTRACT:
    * run while the ingest stream is idle (between micro-batches or with
    * the query stopped) — same as any table-maintenance operation, and
    * ENFORCED: [[applyMicroBatch]] throws while the [[CompactionLock]]
    * is live. The lock is acquired atomically and heartbeated, so a
    * long-running compaction is never falsely reclaimed while a stray
    * concurrent recover() would otherwise sweep the stage mid-build. */
  def compact(spark: SparkSession, corpusDir: String): Unit =
    CompactionLock.withLock(corpusDir) {
      recover(corpusDir)
      val committedBatches = StreamFs.listNames(s"$corpusDir/docs")
        .filter(_.startsWith("batch="))
        .filter(b => committed(corpusDir, b) &&
          StreamFs.exists(s"$corpusDir/index/$b"))
        .sortBy(_.stripPrefix("batch=").toLong)
      val hasTakedowns = Takedown.committedDirs(corpusDir).nonEmpty
      // a takedown can exist against an all-swept corpus (removal-only
      // tombstone); with no committed batch there is nothing to fold
      if (committedBatches.isEmpty) return
      if (committedBatches.length <= 1 && !hasTakedowns) return
      val target = committedBatches.last
      val stage = corpusDir + ".ctmp"
      StreamFs.delete(stage)
      // read ONLY dirs with data files (a re-compaction sees the prior
      // pass's marker-only tombstones; Spark's hidden-file filter is
      // not the contract — round-13 ADVICE); the MARKER enumeration
      // below still covers every committed id
      def dataDirs(sub: String): Seq[String] =
        committedBatches.map(b => s"$corpusDir/$sub/$b")
          .filter(d => StreamFs.exists(d) && StreamFs.hasDataFiles(d))
      def readSub(sub: String): DataFrame =
        spark.read.option("basePath", s"$corpusDir/$sub")
          .parquet(dataDirs(sub): _*).drop("batch")
      // takedowns FOLD physically here: removed rows are anti-joined
      // out of every sub-table, promoted rows (staged by Takedown.apply
      // in the docs/index schemas) merge into docs/index, and the staged
      // root carries no takedown dirs — the logical tombstone view and
      // this physical rewrite are pinned equal in TakedownSpec. The
      // rewrite is still schema-agnostic: all gate knowledge lives in
      // the td dirs' pre-shaped tables. An ALL-SWEPT base (every
      // committed dir marker-only after a takedown removed everything +
      // a prior compact) has no parquet to read — parquet(Nil) throws —
      // so the fold degrades to just the surviving promoted rows
      // (round-15 ADVICE).
      def foldSub(sub: String, promotedName: String): Unit =
        if (dataDirs(sub).nonEmpty)
          Takedown.view(spark, corpusDir, readSub(sub), sub)
            .write.parquet(s"$stage/$sub/$target")
        else
          Takedown.promotedSurvivors(spark, corpusDir, promotedName)
            .foreach(_.write.parquet(s"$stage/$sub/$target"))
      foldSub("docs", "promoted_docs")
      foldSub("index", "promoted_index")
      if (dataDirs("drops").nonEmpty)
        Takedown.view(spark, corpusDir, readSub("drops"), "drops")
          .write.parquet(s"$stage/drops/$target")
      // counts rows are ADDITIVE and ingest-time history: concatenate
      // (readers sum at read time; takedowns deliberately don't touch
      // them — see MediaStream.mediaGateDrift)
      if (dataDirs("counts").nonEmpty)
        readSub("counts").write.parquet(s"$stage/counts/$target")
      StreamFs.createMarker(s"$stage/docs/$target/$Marker")
      // marker-only dirs keep every committed id recognizable on replay
      committedBatches.init.foreach { b =>
        StreamFs.mkdirs(s"$stage/index/$b")
        StreamFs.createMarker(s"$stage/docs/$b/$Marker")
      }
      val old = corpusDir + ".cold"
      StreamFs.renameOrThrow(corpusDir, old)
      StreamFs.renameOrThrow(stage, corpusDir)
      StreamFs.delete(old)
    }

  /** Drop batch dirs that never reached their commit marker (crash before
    * the corpus write completed), index dirs with no committed corpus
    * twin (crash between the two writes), any stale temp dirs, and
    * complete or roll back an interrupted [[compact]] swap. Safe to call
    * any time. */
  def recover(corpusDir: String): Unit = {
    // compaction swap recovery first: the root itself may be mid-rename
    val cold = corpusDir + ".cold"
    val ctmp = corpusDir + ".ctmp"
    if (StreamFs.exists(cold)) {
      if (StreamFs.exists(corpusDir)) StreamFs.delete(cold) // new root live
      else StreamFs.renameOrThrow(cold, corpusDir) // crash between renames
    }
    // the stage is uncommitted — but not while a live compaction builds it
    if (StreamFs.exists(ctmp) && !CompactionLock.heldLive(corpusDir))
      StreamFs.delete(ctmp)
    // uncommitted corpus dirs (no marker) and their index/drops twins
    StreamFs.listNames(s"$corpusDir/docs").filter(_.startsWith("batch="))
      .foreach { b =>
        if (!committed(corpusDir, b)) {
          StreamFs.delete(s"$corpusDir/docs/$b")
          StreamFs.delete(s"$corpusDir/index/$b")
          StreamFs.delete(s"$corpusDir/drops/$b")
        }
      }
    // orphan index/drops/counts dirs: no committed corpus twin
    Seq("index", "drops", "counts").foreach { sub =>
      StreamFs.listNames(s"$corpusDir/$sub").filter(_.startsWith("batch="))
        .foreach { b =>
          if (!committed(corpusDir, b)) StreamFs.delete(s"$corpusDir/$sub/$b")
        }
    }
    // uncommitted takedowns (crash before the td marker — the single
    // commit point of Takedown.apply) are debris
    StreamFs.listNames(s"$corpusDir/${Takedown.Sub}")
      .filter(_.startsWith("td="))
      .foreach { t =>
        if (!StreamFs.exists(s"$corpusDir/${Takedown.Sub}/$t/$Marker"))
          StreamFs.delete(s"$corpusDir/${Takedown.Sub}/$t")
      }
    Seq("docs", "index", "drops", "counts", Takedown.Sub).foreach { sub =>
      StreamFs.listNames(s"$corpusDir/$sub").filter(_.endsWith(".tmp"))
        .foreach(n => StreamFs.delete(s"$corpusDir/$sub/$n"))
    }
  }

  /** Stage to `dst.tmp`, rename in, then (optionally) PUT the commit
    * marker — the marker create is the commit point on every store; the
    * rename keeps the local/HDFS path as tight as before. */
  private[streaming] def writeAtomically(df: DataFrame, dst: String,
                                         mark: Boolean): Unit = {
    val tmp = dst + ".tmp"
    StreamFs.delete(tmp)
    df.write.mode("overwrite").parquet(tmp)
    StreamFs.delete(dst) // debris from a pre-marker crash; never committed
    StreamFs.renameOrThrow(tmp, dst)
    if (mark) StreamFs.createMarker(s"$dst/$Marker")
  }

  /** The deduplicated corpus so far (committed batches only, committed
    * takedowns applied — [[Takedown.view]]). */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame =
    Takedown.view(spark, corpusDir,
      readCommitted(spark, corpusDir, "docs",
        Seq("doc_id", "content_hash", "text")), "docs")

  /** The (content_hash, doc_id) index the probes run against. Only hashes
    * whose corpus twin committed count as "seen": the read lists exactly
    * the committed batch directories (partition pruning by path), rather
    * than filtering with an `isin` over every batch id — an In-list that
    * would grow the plan linearly with stream lifetime. The driver-side
    * directory listing is the same O(#batches) the old filter paid, paid
    * once, off the executor path. */
  def readIndex(spark: SparkSession, corpusDir: String): DataFrame =
    Takedown.view(spark, corpusDir,
      readCommitted(spark, corpusDir, "index",
        Seq("content_hash", "doc_id", "arrival_seq")), "index")

  private[streaming] def committedDirs(corpusDir: String,
                                       sub: String): Seq[String] =
    StreamFs.listNames(s"$corpusDir/docs").filter(_.startsWith("batch="))
      .filter(b => committed(corpusDir, b) &&
        (sub == "docs" || StreamFs.exists(s"$corpusDir/$sub/$b")))
      .map(b => s"$corpusDir/$sub/$b")

  private def readCommitted(spark: SparkSession, corpusDir: String,
                            sub: String, cols: Seq[String]): DataFrame = {
    // marker-only dirs (post-compaction id tombstones) excluded
    // explicitly, not via Spark's hidden-file filter (round-13 ADVICE)
    val dirs = committedDirs(corpusDir, sub)
      .filter(StreamFs.hasDataFiles)
    if (dirs.isEmpty) {
      import org.apache.spark.sql.types._
      val schema = StructType(cols.map {
        case "text" => StructField("text", StringType)
        case "content_hash" => StructField("content_hash", StringType)
        case c => StructField(c, LongType)
      })
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else
      spark.read.option("basePath", s"$corpusDir/$sub").parquet(dirs: _*)
        .select(cols.map(col): _*)
  }
}
