package graft.streaming

import graft.ops.CurationQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingest-time CURATION — the flagship text pipeline
  * ([[CurationQueries.curationPipeline]]: too_short → non_en →
  * low_quality → near_dup) run as ONE pass over each arriving
  * micro-batch, with the funnel monitor riding the same pass. This is
  * the shape a crawl pipeline actually ships: gate documents as they
  * arrive, keep the attrition dashboard live, never re-read history.
  *
  * Semantics vs the batch pipeline, made explicit:
  *  - the three stateless gates are the batch operator's OWN
  *    expressions ([[CurationQueries.scoredDocs]] /
  *    [[CurationQueries.rejectReason]] — one seam, divergence
  *    structurally impossible);
  *  - canonicality is FIRST-ARRIVAL (within a batch: min doc_id — the
  *    [[DedupStream]] convention; the batch operator's corpus-wide
  *    min-doc_id rule coincides exactly when batches arrive in
  *    nondecreasing doc_id ranges, which CurationStreamSpec pins
  *    row-for-row). A hash is CLAIMED by every document that carries
  *    it, gated or not — matching the batch rule, where a too_short
  *    doc still owns canonicality and its later twin rejects as
  *    near_dup.
  *
  * Per-batch committed state (marker protocol, verdicts carry the
  * commit point):
  *  - `claims/batch=N`  — novel (content_hash, doc_id) ownership rows,
  *    probed by later batches (the DedupStream broadcast
  *    semi-then-anti join: the ever-growing claims index is never
  *    shuffled; per-batch cost stays proportional to the batch);
  *  - `counts/batch=N`  — the batch's ≤5-row funnel count table
  *    (counts ADD — [[funnelLive]] is the batch funnel arithmetic over
  *    the summed committed counts, the [[EvalStream]] linearity);
  *  - `verdicts/batch=N` — the per-doc verdict rows (the stream's data
  *    output; kept docs flow to the next stage from here).
  *
  * Crash safety: claims and counts are written BEFORE the verdicts
  * marker, so a crash mid-batch leaves orphans [[recover]] sweeps —
  * never a committed verdict missing its claims. Replay of a committed
  * batchId no-ops. Compact/ingest exclusion is enforced via the
  * heartbeated [[CompactionLock]]. */
object CurationStream {

  /** Start the ingest stream: `docs` must carry (doc_id long,
    * text string). */
  def start(spark: SparkSession, docs: DataFrame, stateDir: String,
            checkpoint: String, triggerMs: Long = 200L): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMicroBatch(spark, batch, stateDir, batchId)
      }
      .start()

  private def committed(stateDir: String, b: String): Boolean =
    StreamFs.exists(s"$stateDir/verdicts/$b/${DedupStream.Marker}")

  /** One micro-batch: score, claim hashes, gate, commit. Idempotent
    * per `batchId`. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame,
                      stateDir: String, batchId: Long): Unit = {
    CompactionLock.requireFree(stateDir, "CurationStream.applyMicroBatch")
    recover(stateDir)
    if (committed(stateDir, s"batch=$batchId")) return // replay
    val scored = CurationQueries.scoredDocs(
        batch.select(col("doc_id"), col("text")))
      // FULL 128-bit md5 hex, exactly the batch pipeline's partition key
      // (CurationQueries md5(text)) — a 60-bit prefix hash would make
      // stream ≡ batch only up to ~n²/2^61 prefix collisions, material
      // at the 1e9-doc target (round-14 ADVICE); claims rows stay tiny
      .withColumn("content_hash", md5(col("text")))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))))
      .withColumn("batch_first", col("__rank") === 1).drop("__rank")
      .persist()
    try {
      // probe committed claims, batch-keyed (semi → broadcast anti)
      val hasClaims = StreamFs.listNames(s"$stateDir/claims").nonEmpty
      val withCanon = (if (hasClaims) {
        val hits = spark.read.parquet(
            claimDirs(stateDir).filter(StreamFs.hasDataFiles): _*)
          .join(broadcast(scored.select("content_hash").distinct()),
            Seq("content_hash"), "left_semi")
          .select("content_hash").distinct().withColumn("__hit", lit(true))
        scored.join(broadcast(hits), Seq("content_hash"), "left")
          .withColumn("is_canonical",
            col("batch_first") && col("__hit").isNull)
          .drop("__hit")
      } else scored.withColumn("is_canonical", col("batch_first")))
        .persist()
      try {
        val verdicts = withCanon.select(col("doc_id"), col("n_tokens"),
          col("pred_lang"), col("quality"), col("is_canonical"),
          CurationQueries.rejectReason.isNull.as("keep"),
          CurationQueries.rejectReason.as("reject_reason"))
        // claims first, counts second, verdicts (with marker) last:
        // the verdicts marker is the single commit point
        DedupStream.writeAtomically(
          withCanon.filter(col("is_canonical"))
            .select("content_hash", "doc_id"),
          s"$stateDir/claims/batch=$batchId", mark = false)
        DedupStream.writeAtomically(
          CurationQueries.funnelCounts(verdicts),
          s"$stateDir/counts/batch=$batchId", mark = false)
        DedupStream.writeAtomically(verdicts,
          s"$stateDir/verdicts/batch=$batchId", mark = true)
      } finally { withCanon.unpersist(); () }
    } finally { scored.unpersist(); () }
  }

  /** Sweep crash debris (claims/counts without a committed verdicts
    * twin, marker-less verdicts, stale temps) and finish or roll back
    * an interrupted [[compact]] swap. */
  def recover(stateDir: String): Unit = {
    val cold = stateDir + ".cold"
    val ctmp = stateDir + ".ctmp"
    if (StreamFs.exists(cold)) {
      if (StreamFs.exists(stateDir)) StreamFs.delete(cold)
      else StreamFs.renameOrThrow(cold, stateDir)
    }
    if (StreamFs.exists(ctmp) && !CompactionLock.heldLive(stateDir))
      StreamFs.delete(ctmp)
    Seq("verdicts", "claims", "counts").foreach { sub =>
      StreamFs.listNames(s"$stateDir/$sub").filter(_.startsWith("batch="))
        .foreach { b =>
          if (!committed(stateDir, b)) StreamFs.delete(s"$stateDir/$sub/$b")
        }
      StreamFs.listNames(s"$stateDir/$sub").filter(_.endsWith(".tmp"))
        .foreach(n => StreamFs.delete(s"$stateDir/$sub/$n"))
    }
  }

  /** Merge all committed batch dirs into the highest id per sub-table,
    * earlier ids surviving as marker-only tombstones — the
    * [[DedupStream.compact]] pass over this stream's three sub-tables,
    * same heartbeated lock and crash-safe root swap. */
  def compact(spark: SparkSession, stateDir: String): Unit =
    CompactionLock.withLock(stateDir) {
      recover(stateDir)
      val batches = StreamFs.listNames(s"$stateDir/verdicts")
        .filter(_.startsWith("batch="))
        .filter(b => committed(stateDir, b))
        .sortBy(_.stripPrefix("batch=").toLong)
      if (batches.length <= 1) return
      val target = batches.last
      val stage = stateDir + ".ctmp"
      StreamFs.delete(stage)
      Seq("verdicts", "claims").foreach { sub =>
        val dirs = batches.map(b => s"$stateDir/$sub/$b")
          .filter(StreamFs.hasDataFiles)
        spark.read.option("basePath", s"$stateDir/$sub")
          .parquet(dirs: _*).drop("batch")
          .write.parquet(s"$stage/$sub/$target")
      }
      // counts COLLAPSE under the sum, not just concatenate
      sumCounts(spark, stateDir,
          batches.map(b => s"$stateDir/counts/$b")
            .filter(StreamFs.hasDataFiles))
        .write.parquet(s"$stage/counts/$target")
      StreamFs.createMarker(s"$stage/verdicts/$target/${DedupStream.Marker}")
      batches.init.foreach(b =>
        StreamFs.createMarker(s"$stage/verdicts/$b/${DedupStream.Marker}"))
      val old = stateDir + ".cold"
      StreamFs.renameOrThrow(stateDir, old)
      StreamFs.renameOrThrow(stage, stateDir)
      StreamFs.delete(old)
    }

  private def claimDirs(stateDir: String): Seq[String] =
    StreamFs.listNames(s"$stateDir/claims").filter(_.startsWith("batch="))
      .filter(b => committed(stateDir, b))
      .map(b => s"$stateDir/claims/$b")

  private def committedDirsAll(stateDir: String, sub: String): Seq[String] =
    StreamFs.listNames(s"$stateDir/$sub").filter(_.startsWith("batch="))
      .filter(b => committed(stateDir, b))
      .map(b => s"$stateDir/$sub/$b")

  private def committedDirs(stateDir: String, sub: String): Seq[String] =
    committedDirsAll(stateDir, sub).filter(StreamFs.hasDataFiles)

  /** Every committed verdict row so far — the stream's data output. */
  def readVerdicts(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.option("basePath", s"$stateDir/verdicts")
      .parquet(committedDirs(stateDir, "verdicts"): _*)
      .drop("batch")

  private def sumCounts(spark: SparkSession, stateDir: String,
                        dirs: Seq[String]): DataFrame =
    if (dirs.isEmpty) // every window member was a zero-row batch
      spark.range(0).select(col("id").cast("int").as("stage_idx"),
        lit("").as("stage"), col("id").as("n_docs"),
        col("id").as("n_tokens"))
    else
      spark.read.option("basePath", s"$stateDir/counts").parquet(dirs: _*)
        .groupBy("stage_idx", "stage")
        .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))

  /** The LIVE funnel — the batch funnel arithmetic
    * ([[CurationQueries.funnelFromCounts]]) over the summed committed
    * count tables: by count linearity it equals the batch
    * [[CurationQueries.curationFunnel]] over the ingested rows
    * (under id-ordered batching; spec-pinned), and it reads ≤5-row
    * tables per batch dir, never the corpus. */
  def funnelLive(spark: SparkSession, stateDir: String): DataFrame =
    CurationQueries.funnelFromCounts(sumCounts(spark, stateDir,
      committedDirs(stateDir, "counts")))

  /** Trailing-`lastK`-batch funnel — the same tail over the subset sum
    * ([[EvalStream.readCountsWindow]]'s semantics: fewer dirs than the
    * window degrades to lifetime; a full [[compact]] collapses batch
    * boundaries, so a drift consumer compacts on a horizon or accepts
    * the documented degradation). */
  def funnelWindow(spark: SparkSession, stateDir: String,
                   lastK: Int): DataFrame = {
    require(lastK > 0, s"window must be positive, got $lastK")
    // window membership over ALL committed batch ids first, data-file
    // filter second — a committed zero-row batch is an empty window
    // member, not a shift of the window into history (round-14 ADVICE)
    CurationQueries.funnelFromCounts(sumCounts(spark, stateDir,
      committedDirsAll(stateDir, "counts")
        .sortBy(_.split('/').last.stripPrefix("batch=").toLong)
        .takeRight(lastK)
        .filter(StreamFs.hasDataFiles)))
  }

  /** FUNNEL DRIFT — "did a gate's share of the intake move on RECENT
    * data?": the question a curation operator actually watches (a
    * non_en spike = a crawler drifted into the wrong domain; a
    * near_dup spike = a feed started replaying). Per stage: lifetime
    * and trailing-window doc shares with the delta — both legs the
    * identical funnel arithmetic over subset sums of the same
    * committed count dirs (the [[EvalStream.gateEvalDrift]] shape;
    * window stages are LEFT-joined and zero-filled — a stage absent
    * from the window genuinely has share 0 there). */
  def funnelDrift(spark: SparkSession, stateDir: String,
                  lastK: Int): DataFrame = {
    val life = funnelLive(spark, stateDir)
      .select(col("stage_idx"), col("stage"),
        col("n_docs").as("n_life"), col("doc_share").as("share_life"))
    val win = funnelWindow(spark, stateDir, lastK)
      .select(col("stage_idx"), col("n_docs").as("n_window"),
        col("doc_share").as("share_window"))
    life.join(win, Seq("stage_idx"), "left")
      .select(col("stage_idx"), col("stage"), col("n_life"),
        coalesce(col("n_window"), lit(0L)).as("n_window"),
        col("share_life"),
        coalesce(col("share_window"), lit(0.0)).as("share_window"),
        round(coalesce(col("share_window"), lit(0.0))
          - col("share_life"), 6).as("share_delta"))
      // ≤5 rows: a GLOBAL order is free here, and unlike the expensive
      // faces' sortWithinPartitions it makes the registered face's row
      // order deterministic (round-14 ADVICE)
      .orderBy("stage_idx")
  }

  // ---- registered deterministic face -------------------------------------

  /** Process-lifetime state cache keyed by corpus dir — the
    * [[EvalStream.streamedDirs]] staleness assumption and orphan story
    * (verify/bench-only; immutable testdata). */
  private val streamedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Deterministic 4-batch ingest: batch i = the i-th CONTIGUOUS
    * doc_id quartile, so batches arrive in nondecreasing id order and
    * first-arrival canonicality coincides exactly with the batch
    * operator's corpus-wide min-doc_id rule — the live funnel is then
    * the curation_funnel oracle's own SQL, replayed against the
    * streaming path. */
  private def curationState(s: SparkSession, dir: String): String =
    streamedDirs.getOrElseUpdate(dir, {
      val d = StreamFs.benchTempDir("graft-curation-stream") + "/state"
      val docs = graft.Tables.documents(s, dir)
        .select("doc_id", "text").localCheckpoint()
      val n = docs.count()
      val span = math.max(1L, (n + 3) / 4)
      (0 until 4).foreach(i => applyMicroBatch(s,
        docs.filter(col("doc_id") >= i * span &&
          col("doc_id") < (i + 1) * span), d, i.toLong))
      d
    })

  /** REGISTERED live-funnel face (DuckDB-oracled): the streaming
    * monitor's funnel over the deterministic id-ordered ingest — the
    * oracle is the batch curation_funnel SQL verbatim, which the
    * streamed path must reproduce bit-for-bit. Bench times the
    * dashboard refresh (≤5-row tables per committed dir + the funnel
    * tail), not the ingest (warmup pays that once per JVM). */
  def curationFunnelLive(s: SparkSession, dir: String): DataFrame =
    funnelLive(s, curationState(s, dir))

  /** REGISTERED funnel-drift face (DuckDB-oracled): trailing-2-of-4
    * quartile batches vs lifetime over the deterministic id-ordered
    * ingest — the window is exactly the docs in the TOP HALF of the
    * doc_id range, which the oracle recomputes with the batch funnel
    * arithmetic over that predicate. */
  def curationFunnelDrift(s: SparkSession, dir: String): DataFrame =
    funnelDrift(s, curationState(s, dir), lastK = 2)
}
