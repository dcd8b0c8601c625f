package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming EMBEDDING-CENTROID DRIFT monitor — the embedding-modality
  * member of the monitor family ([[EvalStream]] watches gate scores;
  * this watches the vector space itself): a 100 TB ingest drifts when
  * the encoder version changes, a new source enters the mix, or a
  * crawler starts feeding junk — all of which move per-label centroids
  * long before any downstream gate notices. The deployment question is
  * "is RECENT data pointing where lifetime data pointed?", answered per
  * label as the cosine between the trailing-window centroid and the
  * lifetime centroid, plus a norm ratio (magnitude drift).
  *
  * Exactness: per-batch state is the (label, dim, s_micro, n) table
  * where s_micro sums each component QUANTIZED to integer micro-units
  * (round(x·1e6) — the house all-BIGINT rule). Integer sums are
  * associative and commutative, so state over a union of batches is
  * the SUM of per-batch state under ANY batching — stream ≡ batch
  * EXACTLY, not approximately (EmbedStreamSpec pins it), and the
  * quantization is part of the OPERATOR's definition (documented,
  * 1e-6 per component — far below any drift a monitor would alarm on),
  * not an implementation error. The only doubles are the final cosine
  * and norm folds, both over ≤[[graft.ops.SimilarityQueries.embeddingDim]]
  * values in fixed dim order — bit-identical in both engines (the
  * duckCos precedent).
  *
  * Scale shape: a micro-batch collapses to |labels|·dim count rows (a
  * few KB) in one hash aggregate — state-BLIND ingest like
  * [[CmsStream]]/[[EvalStream]], so steady-state cost never grows with
  * history; the report is a subset sum over committed dirs plus a
  * ≤|labels|-row fold. Crash safety, replay, compaction horizon, and
  * the ingest/compact lock are [[EvalStream]]'s protocol verbatim. */
object EmbedStream {

  /** Collapse a batch of (label, embedding) rows to its integer-micro
    * component-sum table — THE state row shape, and the linear unit the
    * merge sums. Quantization happens here, per component, BEFORE any
    * aggregation, so every downstream sum is exact. */
  def embedCounts(batch: DataFrame): DataFrame =
    batch.select(col("label"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg(sum(round(col("x") * 1e6).cast("long")).as("s_micro"),
        count(lit(1)).as("n"))

  /** Start the monitor stream: `vecs` must carry (label int,
    * embedding array<float|double>). */
  def start(spark: SparkSession, vecs: DataFrame, stateDir: String,
            checkpoint: String, triggerMs: Long = 200L): StreamingQuery =
    vecs.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMicroBatch(spark, batch, stateDir, batchId)
      }
      .start()

  /** One micro-batch: collapse to the component-sum table, commit under
    * `counts/batch=N`. Idempotent per `batchId`. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame,
                      stateDir: String, batchId: Long): Unit = {
    CompactionLock.requireFree(stateDir, "EmbedStream.applyMicroBatch")
    recover(stateDir)
    val dst = s"$stateDir/counts/batch=$batchId"
    if (StreamFs.exists(s"$dst/${DedupStream.Marker}")) return // replay
    DedupStream.writeAtomically(
      embedCounts(batch.select("label", "embedding")), dst, mark = true)
  }

  /** Sweep marker-less batch dirs; finish or roll back an interrupted
    * [[compact]] swap — [[EvalStream.recover]]'s steps verbatim. */
  def recover(stateDir: String): Unit = {
    val cold = stateDir + ".cold"
    val ctmp = stateDir + ".ctmp"
    if (StreamFs.exists(cold)) {
      if (StreamFs.exists(stateDir)) StreamFs.delete(cold)
      else StreamFs.renameOrThrow(cold, stateDir)
    }
    if (StreamFs.exists(ctmp) && !CompactionLock.heldLive(stateDir))
      StreamFs.delete(ctmp)
    StreamFs.listNames(s"$stateDir/counts").filter(_.startsWith("batch="))
      .filterNot(b =>
        StreamFs.exists(s"$stateDir/counts/$b/${DedupStream.Marker}"))
      .foreach(b => StreamFs.delete(s"$stateDir/counts/$b"))
    StreamFs.listNames(s"$stateDir/${Takedown.Sub}").foreach { t =>
      val p = s"$stateDir/${Takedown.Sub}/$t"
      if (t.endsWith(".tmp") || (t.startsWith("td=") &&
          !StreamFs.exists(s"$p/${DedupStream.Marker}")))
        StreamFs.delete(p)
    }
  }

  // ---- takedown: doc-grain subtraction by integer linearity ------------

  /** TAKEDOWN over the centroid monitor — DOC-GRAIN, unlike the
    * batch-grain [[CmsStream]]/[[EvalStream]] folds, because this
    * monitor's state is LINEAR in documents, not just in batches: the
    * per-batch cell is a sum of per-document integer-micro
    * contributions, so subtracting a removed document's quantized
    * components is EXACT (the same `round(x·1e6)` each ingest added —
    * bit-identical cancellation, no epsilon). The monitor never stored
    * the documents, so the CALLER supplies the removed rows' (doc_id,
    * batch, label, embedding) — an RTBF request names its docs, and the
    * source gate's `arrival_seq` names the batch.
    *
    * The correction is written as NEGATED cell tables PER BATCH
    * (`takedown/td=<id>/cells/batch=N`), so trailing windows subtract
    * exactly the removed mass that fell INSIDE the window — timelines
    * never shift (the zero-row-batch stance). A doc already removed by
    * an earlier committed takedown is skipped (the per-td removed-id
    * log makes resubmission a no-op, not a double subtraction), and a
    * correction against an uncommitted batch id fails loudly rather
    * than corrupting a sum that batch never joined. Idempotent per
    * takedownId; cost ∝ |removed| (one narrow explode + a ≤ |labels|·dim
    * aggregate), never the corpus. */
  def applyTakedown(spark: SparkSession, stateDir: String,
                    removed: DataFrame, takedownId: Long): Unit =
    CompactionLock.withLock(stateDir) {
      recover(stateDir)
      val dst = s"$stateDir/${Takedown.Sub}/td=$takedownId"
      if (StreamFs.exists(s"$dst/${DedupStream.Marker}")) return // replay
      val ids = committedDirs(stateDir)
        .map(_.split('/').last.stripPrefix("batch=").toLong).toSet
      val r = removed.select("doc_id", "batch", "label", "embedding")
        .localCheckpoint()
      val badBatch = r.select("batch").distinct().collect()
        .map(_.getLong(0)).filterNot(ids)
      require(badBatch.isEmpty,
        s"takedown targets uncommitted batch ids ${badBatch.toSeq.sorted}")
      // resubmission guard: drop docs an earlier committed td removed
      val fresh = priorRemoved(spark, stateDir) match {
        case None => r
        case Some(prev) =>
          r.join(broadcast(prev), Seq("doc_id"), "left_anti")
      }
      val neg = fresh
        .select(col("batch"), col("label"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "x")))
        .groupBy("batch", "label", "dim")
        .agg((-sum(round(col("x") * 1e6).cast("long"))).as("s_micro"),
          (-count(lit(1))).as("n"))
      val tmp = dst + ".tmp"
      StreamFs.delete(tmp)
      fresh.select("doc_id").distinct().write.parquet(s"$tmp/removed")
      neg.write.partitionBy("batch").parquet(s"$tmp/cells")
      StreamFs.delete(dst)
      StreamFs.renameOrThrow(tmp, dst)
      StreamFs.createMarker(s"$dst/${DedupStream.Marker}")
    }

  /** doc_ids removed by every COMMITTED takedown so far. */
  private def priorRemoved(spark: SparkSession,
                           stateDir: String): Option[DataFrame] = {
    val dirs = StreamFs.listNames(s"$stateDir/${Takedown.Sub}")
      .filter(_.startsWith("td="))
      .filter(t => StreamFs.exists(
        s"$stateDir/${Takedown.Sub}/$t/${DedupStream.Marker}"))
      .map(t => s"$stateDir/${Takedown.Sub}/$t/removed")
      .filter(d => StreamFs.exists(d) && StreamFs.hasDataFiles(d))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).select("doc_id").distinct())
  }

  /** Committed negated-correction cell dirs restricted to the batch ids
    * a reader is summing — window subtraction stays window-true. */
  private def tdCellDirs(stateDir: String, ids: Set[Long]): Seq[String] =
    StreamFs.listNames(s"$stateDir/${Takedown.Sub}")
      .filter(_.startsWith("td="))
      .filter(t => StreamFs.exists(
        s"$stateDir/${Takedown.Sub}/$t/${DedupStream.Marker}"))
      .flatMap { t =>
        StreamFs.listNames(s"$stateDir/${Takedown.Sub}/$t/cells")
          .filter(_.startsWith("batch="))
          .filter(b => ids.contains(b.stripPrefix("batch=").toLong))
          .map(b => s"$stateDir/${Takedown.Sub}/$t/cells/$b")
      }
      .filter(StreamFs.hasDataFiles)

  /** Merge committed per-batch dirs older than the `keepLast` horizon
    * into one summed dir — [[EvalStream.compact]]'s linearity-as-
    * maintenance, heartbeated lock and crash-safe root swap included.
    * `keepLast ≥` the drift window preserves trailing-window reports
    * exactly (spec-pinned). */
  def compact(spark: SparkSession, stateDir: String,
              keepLast: Int = 0): Unit =
    CompactionLock.withLock(stateDir) {
      recover(stateDir)
      val batches = committedDirs(stateDir).map(_.split('/').last)
        .sortBy(_.stripPrefix("batch=").toLong)
      val tds = StreamFs.listNames(s"$stateDir/${Takedown.Sub}")
        .filter(_.startsWith("td="))
        .filter(t => StreamFs.exists(
          s"$stateDir/${Takedown.Sub}/$t/${DedupStream.Marker}"))
      val merge = batches.dropRight(keepLast)
      if (merge.length <= 1 && tds.isEmpty) return
      val stage = stateDir + ".ctmp"
      StreamFs.delete(stage)
      // takedowns FOLD physically: every written dir is the base+
      // correction sum for its batch ids; fully-cancelled cells vanish
      def fold(names: Seq[String], target: String): Unit =
        if (names.nonEmpty) sumWithTd(spark, stateDir,
            names.map(b => s"$stateDir/counts/$b"))
          .write.parquet(s"$stage/counts/$target")
      fold(merge, if (merge.nonEmpty) merge.last else "")
      batches.takeRight(keepLast).foreach(b => fold(Seq(b), b))
      batches.foreach(b =>
        StreamFs.createMarker(s"$stage/counts/$b/${DedupStream.Marker}"))
      // td ids stay replay-recognizable; removed-id logs survive so the
      // resubmission guard keeps holding after the fold
      tds.foreach { t =>
        val rm = s"$stateDir/${Takedown.Sub}/$t/removed"
        if (StreamFs.exists(rm) && StreamFs.hasDataFiles(rm))
          spark.read.parquet(rm).write
            .parquet(s"$stage/${Takedown.Sub}/$t/removed")
        else StreamFs.mkdirs(s"$stage/${Takedown.Sub}/$t")
        StreamFs.createMarker(
          s"$stage/${Takedown.Sub}/$t/${DedupStream.Marker}")
      }
      val old = stateDir + ".cold"
      StreamFs.renameOrThrow(stateDir, old)
      StreamFs.renameOrThrow(stage, stateDir)
      StreamFs.delete(old)
    }

  private def committedDirs(stateDir: String): Seq[String] =
    StreamFs.listNames(s"$stateDir/counts").filter(_.startsWith("batch="))
      .filter(b =>
        StreamFs.exists(s"$stateDir/counts/$b/${DedupStream.Marker}"))
      .map(b => s"$stateDir/counts/$b")

  /** Merged component sums over every committed batch (marker-only
    * tombstones excluded explicitly, never via the hidden-file
    * filter), committed takedown corrections folded in. */
  def readCounts(spark: SparkSession, stateDir: String): DataFrame =
    sumWithTd(spark, stateDir, committedDirs(stateDir))

  /** Merged sums over the trailing `lastK` committed data dirs —
    * integer linearity makes the window a subset sum
    * ([[EvalStream.readCountsWindow]]'s semantics, including the
    * fewer-dirs-than-window degradation to lifetime). */
  def readCountsWindow(spark: SparkSession, stateDir: String,
                       lastK: Int): DataFrame = {
    require(lastK > 0, s"window must be positive, got $lastK")
    // takeRight over ALL committed ids first, THEN drop data-less dirs:
    // a committed zero-row batch counts as an empty window member
    // instead of shifting the window into history (round-14 ADVICE)
    sumWithTd(spark, stateDir,
      committedDirs(stateDir)
        .sortBy(_.split('/').last.stripPrefix("batch=").toLong)
        .takeRight(lastK))
  }

  /** The effective component sums of a batch-dir member set: base cells
    * plus the committed takedown corrections FOR THOSE BATCH IDS (so a
    * window subtracts exactly the removed mass that fell inside it).
    * Fully-cancelled cells (n = 0 ⇒ every integer contribution
    * cancelled ⇒ s_micro = 0 too) drop out, exactly as a survivors-only
    * rebuild never emits them. */
  private def sumWithTd(spark: SparkSession, stateDir: String,
                        memberDirs: Seq[String]): DataFrame = {
    val ids = memberDirs
      .map(_.split('/').last.stripPrefix("batch=").toLong).toSet
    val base = memberDirs.filter(StreamFs.hasDataFiles)
    val tds = tdCellDirs(stateDir, ids)
    val parts = Seq(
      if (base.isEmpty) None
      else Some(spark.read.option("basePath", s"$stateDir/counts")
        .parquet(base: _*).select("label", "dim", "s_micro", "n")),
      if (tds.isEmpty) None
      else Some(spark.read.parquet(tds: _*)
        .select("label", "dim", "s_micro", "n"))).flatten
    if (parts.isEmpty)
      spark.range(0).select(col("id").cast("int").as("label"),
        col("id").cast("int").as("dim"), col("id").as("s_micro"),
        col("id").as("n"))
    else
      parts.reduce(_.unionByName(_))
        .groupBy("label", "dim")
        .agg(sum("s_micro").as("s_micro"), sum("n").as("n"))
        .filter(col("n") =!= 0)
  }

  /** The drift report over two component-sum tables: per label, the
    * cosine between the window and lifetime centroids and the ratio of
    * their norms. Cosine is scale-invariant, so it is computed directly
    * on the integer sums (centroid = sum/n only rescales); the norm
    * ratio divides by the counts explicitly. Both folds run over the
    * per-label dim-ordered array (≤ embedding-dim values — bounded,
    * deterministic order; the duckCos fold pairing). A label absent
    * from the window reports n_window = 0 with zeroed metrics rather
    * than NaN. */
  def driftFromCounts(life: DataFrame, win: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.dotProduct
    val j = life.select(col("label"), col("dim"),
        col("s_micro").as("sl"), col("n").as("nl"))
      .join(win.select(col("label"), col("dim"),
        col("s_micro").as("sw"), col("n").as("nw")),
        Seq("label", "dim"), "left")
    val g = j.groupBy("label")
      .agg(max(col("nl")).as("n_life"),
        max(coalesce(col("nw"), lit(0L))).as("n_window"),
        array_sort(collect_list(struct(col("dim"),
          col("sl").cast("double").as("a"),
          coalesce(col("sw"), lit(0L)).cast("double").as("b")))).as("vs"))
    def comp(f: Column => Column): Column = f(col("vs"))
    val a = comp(v => transform(v, _("a")))
    val b = comp(v => transform(v, _("b")))
    val dot = dotProduct(a, b)
    val a2 = sqrt(dotProduct(a, a))
    val b2 = sqrt(dotProduct(b, b))
    g.select(col("label"), col("n_life"), col("n_window"),
        when(col("n_window") > 0 && a2 > 0 && b2 > 0,
          round(dot / (a2 * b2), 6)).otherwise(lit(0.0))
          .as("centroid_cos"),
        when(col("n_window") > 0 && a2 > 0,
          round((b2 / col("n_window")) / (a2 / col("n_life")), 6))
          .otherwise(lit(0.0)).as("norm_ratio"))
      .orderBy("label")
  }

  /** The live drift report: trailing `lastK` batches vs lifetime. */
  def embeddingDriftLive(spark: SparkSession, stateDir: String,
                         lastK: Int): DataFrame =
    driftFromCounts(readCounts(spark, stateDir),
      readCountsWindow(spark, stateDir, lastK))

  // ---- registered deterministic face -------------------------------------

  /** Process-lifetime monitor-state cache keyed by corpus dir — same
    * staleness assumption and orphan story as
    * [[EvalStream.streamedDirs]] (bench/verify-only; immutable
    * testdata; leaked temp dirs reaped by the
    * [[StreamFs.benchTempDir]] shutdown hook). */
  private val streamedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The deterministic 4-batch monitor state: batch i holds the
    * vectors with vec_id ≡ i (mod 4), so the trailing-2 window is
    * exactly `vec_id % 4 IN (2, 3)` — a DuckDB-expressible predicate,
    * making the registered face oracle-checkable end to end (the
    * [[EvalStream.highNdvState]] scheme). */
  private def embedState(s: SparkSession, dir: String): String =
    streamedDirs.getOrElseUpdate(dir, {
      val d = StreamFs.benchTempDir("graft-embed-stream") + "/state"
      val vecs = graft.Tables.embeddings(s, dir)
        .select("vec_id", "label", "embedding").localCheckpoint()
      (0 until 4).foreach(i => applyMicroBatch(s,
        vecs.filter(pmod(col("vec_id"), lit(4)) === i), d, i.toLong))
      d
    })

  /** REGISTERED drift face (DuckDB-oracled): per-label trailing-2-of-4
    * vs lifetime centroid drift over the deterministic [[embedState]].
    * Verify checks the report against the oracle's replay of the same
    * integer-micro sums; Bench times the dashboard-refresh cost (two
    * subset sums over committed count dirs + a ≤|labels| fold). */
  def embeddingDriftQuery(s: SparkSession, dir: String): DataFrame =
    embeddingDriftLive(s, embedState(s, dir), lastK = 2)

  /** Separate state cache for the takedown face — [[applyTakedown]]
    * mutates, so it must never share [[embedState]]'s ingest. */
  private val takedownStateDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** REGISTERED + DuckDB-oracled — the centroid monitor under DOC-GRAIN
    * takedown: the deterministic 4-batch ingest, then a takedown of
    * every [[Takedown.replayRemovalStride]]-th vec_id (batch = vec_id
    * mod 4, the id its ingest actually fell in); the post-takedown
    * drift report must equal the oracle's survivors-only replay of the
    * integer-micro sums — lifetime AND trailing-window legs both, or
    * the subtraction missed (or double-counted) mass. */
  def takedownReplayEmbed(s: SparkSession, dir: String): DataFrame = {
    val st = takedownStateDirs.getOrElseUpdate(dir, {
      val d = StreamFs.benchTempDir("graft-embed-takedown") + "/state"
      val vecs = graft.Tables.embeddings(s, dir)
        .select("vec_id", "label", "embedding").localCheckpoint()
      (0 until 4).foreach(i => applyMicroBatch(s,
        vecs.filter(pmod(col("vec_id"), lit(4)) === i), d, i.toLong))
      applyTakedown(s, d,
        vecs.filter(col("vec_id") % Takedown.replayRemovalStride === 0)
          .select(col("vec_id").as("doc_id"),
            pmod(col("vec_id"), lit(4)).cast("long").as("batch"),
            col("label"), col("embedding")),
        takedownId = 0L)
      d
    })
    embeddingDriftLive(s, st, lastK = 2)
  }
}
