package graft.streaming

import graft.ops.PrepQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** INCREMENTAL SEQUENCE PACKING — the streaming face of
  * [[PrepQueries.sequencePack]]: a long-lived ingest extends the
  * concat-and-chunk placement one micro-batch at a time, never
  * recomputing earlier batches. Per batch, the running token offset is
  * the SUM of the committed batches' 1-row total tables (prefix-sum
  * associativity — the same integer linearity every monitor here
  * leans on), and the batch's own placement is the batch operator's
  * two-pass prefix shifted by that offset. Under id-ordered batching
  * the union of committed placements IS [[PrepQueries.sequencePack]]
  * of the whole corpus (PackStreamSpec pins 1/3/5-way batchings; the
  * registered face shares the batch oracle verbatim).
  *
  * Steady-state per-batch cost: the batch's own tokenize + prefix
  * plus a ≤-batch-count read of 1-row total tables — history never
  * rescanned, nothing corpus-sized moves. [[compact]] bounds the
  * total-table count ([[EvalStream.compact]]'s shape).
  *
  * TAKEDOWN is deliberately ABSENT here: placement is an EPOCH
  * artifact — removing a document shifts every later offset by
  * construction (the layout is a bijection with the surviving token
  * stream), so the honest removal story is "rebuild the next epoch's
  * placement from the surviving corpus", not an in-place correction;
  * the corpus-side gates own the removal itself. */
object PackStream {

  private val Marker = DedupStream.Marker

  /** Start the ingest stream: `docs` must carry
    * (doc_id long, text string). */
  def start(spark: SparkSession, docs: DataFrame, stateDir: String,
            checkpoint: String, triggerMs: Long = 200L): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMicroBatch(spark, batch, stateDir, batchId)
      }
      .start()

  /** One micro-batch: read the committed running offset, place this
    * batch's docs from it, commit placement + the batch's 1-row total.
    * Idempotent per `batchId` via the placement marker. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame,
                      stateDir: String, batchId: Long): Unit = {
    CompactionLock.requireFree(stateDir, "PackStream.applyMicroBatch")
    recover(stateDir)
    val dst = s"$stateDir/place/batch=$batchId"
    if (StreamFs.exists(s"$dst/$Marker")) return // replay
    val offset = committedDirs(stateDir, "counts")
      .filter(StreamFs.hasDataFiles) match {
      case Nil => 0L
      case dirs => spark.read.parquet(dirs: _*)
        .agg(coalesce(sum("n_tokens"), lit(0L))).collect()(0).getLong(0)
    }
    val placed = PrepQueries
      .packOfFrom(batch.select("doc_id", "text"), offset)
    // counts first (unmarked), placement last — its marker commits both
    DedupStream.writeAtomically(
      placed.agg(count(lit(1)).as("n_docs"),
        coalesce(sum("n_tokens"), lit(0L)).as("n_tokens")),
      s"$stateDir/counts/batch=$batchId", mark = false)
    DedupStream.writeAtomically(placed, dst, mark = true)
  }

  /** Sweep marker-less batch dirs (either sub) and stale temps; finish
    * or roll back an interrupted [[compact]] swap. */
  def recover(stateDir: String): Unit = {
    val cold = stateDir + ".cold"
    val ctmp = stateDir + ".ctmp"
    if (StreamFs.exists(cold)) {
      if (StreamFs.exists(stateDir)) StreamFs.delete(cold)
      else StreamFs.renameOrThrow(cold, stateDir)
    }
    if (StreamFs.exists(ctmp) && !CompactionLock.heldLive(stateDir))
      StreamFs.delete(ctmp)
    Seq("place", "counts").foreach { sub =>
      StreamFs.listNames(s"$stateDir/$sub").filter(_.startsWith("batch="))
        .filterNot(b => StreamFs.exists(s"$stateDir/place/$b/$Marker"))
        .foreach(b => StreamFs.delete(s"$stateDir/$sub/$b"))
      StreamFs.listNames(s"$stateDir/$sub").filter(_.endsWith(".tmp"))
        .foreach(n => StreamFs.delete(s"$stateDir/$sub/$n"))
    }
  }

  private def committedDirs(stateDir: String, sub: String): Seq[String] =
    StreamFs.listNames(s"$stateDir/place").filter(_.startsWith("batch="))
      .filter(b => StreamFs.exists(s"$stateDir/place/$b/$Marker"))
      .map(b => s"$stateDir/$sub/$b")
      .filter(d => StreamFs.exists(d))

  /** The committed placement so far — one row per ingested doc, the
    * [[PrepQueries.sequencePack]] schema. */
  def readPlacement(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = committedDirs(stateDir, "place")
      .filter(StreamFs.hasDataFiles)
    if (dirs.isEmpty)
      spark.range(0).select(col("id").as("doc_id"),
        col("id").as("n_tokens"), col("id").as("start"),
        col("id").as("first_bin"), col("id").as("last_bin"),
        col("id").as("n_bins"))
    else spark.read.option("basePath", s"$stateDir/place")
      .parquet(dirs: _*).drop("batch")
      .select("doc_id", "n_tokens", "start", "first_bin", "last_bin",
        "n_bins")
  }

  /** COMPACTION — merge all committed placement rows into the highest
    * committed batch dir and the totals into one summed row; earlier
    * ids survive as marker-only tombstones (replay no-op). */
  def compact(spark: SparkSession, stateDir: String): Unit =
    CompactionLock.withLock(stateDir) {
      recover(stateDir)
      val batches = StreamFs.listNames(s"$stateDir/place")
        .filter(_.startsWith("batch="))
        .filter(b => StreamFs.exists(s"$stateDir/place/$b/$Marker"))
        .sortBy(_.stripPrefix("batch=").toLong)
      if (batches.length <= 1) return
      val target = batches.last
      val stage = stateDir + ".ctmp"
      StreamFs.delete(stage)
      readPlacement(spark, stateDir)
        .write.parquet(s"$stage/place/$target")
      val countDirs = committedDirs(stateDir, "counts")
        .filter(StreamFs.hasDataFiles)
      if (countDirs.nonEmpty)
        spark.read.parquet(countDirs: _*)
          .agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
            coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))
          .write.parquet(s"$stage/counts/$target")
      StreamFs.createMarker(s"$stage/place/$target/$Marker")
      batches.init.foreach(b =>
        StreamFs.createMarker(s"$stage/place/$b/$Marker"))
      val old = stateDir + ".cold"
      StreamFs.renameOrThrow(stateDir, old)
      StreamFs.renameOrThrow(stage, stateDir)
      StreamFs.delete(old)
    }

  // ---- registered face --------------------------------------------------

  /** Same staleness assumption and orphan story as the other bench
    * states (GraphStream note). */
  private val streamedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** REGISTERED + DuckDB-oracled: the committed placement after the
    * deterministic 4-quartile id-ordered ingest — EXACTLY
    * [[PrepQueries.sequencePack]], so the face shares that operator's
    * oracle SQL verbatim. Bench times the committed-placement read
    * (the dashboard/packer-restart cost); the batch face re-tokenizes
    * the corpus per refresh. */
  def sequencePackStream(s: SparkSession, dir: String): DataFrame = {
    val st = streamedDirs.getOrElseUpdate(dir, {
      val d = StreamFs.benchTempDir("graft-pack-stream") + "/state"
      val docs = graft.Tables.documents(s, dir)
        .select("doc_id", "text").localCheckpoint()
      Takedown.quartiles(docs).zipWithIndex.foreach { case (b, i) =>
        applyMicroBatch(s, b, d, i.toLong)
      }
      d
    })
    readPlacement(s, st).orderBy("doc_id")
  }
}
