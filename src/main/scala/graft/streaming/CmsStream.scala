package graft.streaming

import graft.functions.TextFunctions.tokens
import graft.ops.ProfileQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming Count–Min sketch — the sketch family's STREAMING face,
  * making the mergeability that [[graft.ops.ProfileQueries.cmsCells]]'s
  * linearity spec proves algebraically OPERATIONAL: each micro-batch
  * writes its own d×w cell table (≤ d·w = 4096 rows per batch, whatever
  * the batch holds), and the committed sketch is the plain SUM of the
  * per-batch cells — Cormode & Muthukrishnan '05's linearity is the
  * whole commit protocol. Nothing ever rewrites or rescans an earlier
  * batch's cells, and the token stream itself is never persisted.
  *
  * Contrast with the ingest-filter trio ([[DedupStream]] /
  * [[NearDupStream]] / [[WinnowStream]]): those must PROBE committed
  * state to decide per-document outcomes, so their micro-batch reads
  * the index. A sketch has no per-document verdict — the per-batch
  * write is state-blind, so steady-state cost is exactly the batch
  * tokenize+hash with no dependence on history size at all (the ideal
  * every streaming operator here approximates).
  *
  * Crash safety: the per-batch cell dir commits via [[DedupStream]]'s
  * marker protocol (staged tmp write → rename → `_GRAFT_COMMIT`);
  * [[recover]] sweeps marker-less orphans; replay of a committed
  * `batchId` is a no-op, so foreachBatch retries are idempotent.
  *
  * Scale note (100 TB): per-batch state is ≤4096 BIGINT cells — the
  * merged read ([[readSketch]]) aggregates #batches · 4096 rows, so a
  * year of 5-minute batches is ~430M tiny rows, one cheap sum; compact
  * by replacing committed batch dirs with their sum if ever needed
  * (the same linearity). Estimates serve from the merged 4096-row
  * table as a broadcast. */
object CmsStream {

  /** Start the sketch stream: `docs` must carry a `text` column. */
  def start(spark: SparkSession, docs: DataFrame, stateDir: String,
            checkpoint: String, triggerMs: Long = 200L): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMicroBatch(spark, batch, stateDir, batchId)
      }
      .start()

  /** One micro-batch: tokenize, aggregate this batch's d×w cells, commit
    * them under `cells/batch=N`. Idempotent per `batchId`. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                      batchId: Long): Unit = {
    recover(stateDir)
    val dst = s"$stateDir/cells/batch=$batchId"
    if (StreamFs.exists(s"$dst/${DedupStream.Marker}")) return // replay
    val toks = batch.select(explode(tokens(col("text"))).as("token"))
    DedupStream.writeAtomically(ProfileQueries.cmsCells(toks), dst,
      mark = true)
  }

  /** Sweep marker-less (crashed mid-write) batch cell dirs. */
  def recover(stateDir: String): Unit =
    StreamFs.listNames(s"$stateDir/cells").filter(_.startsWith("batch="))
      .filterNot(b =>
        StreamFs.exists(s"$stateDir/cells/$b/${DedupStream.Marker}"))
      .foreach(b => StreamFs.delete(s"$stateDir/cells/$b"))

  private def committedCellDirs(stateDir: String): Seq[String] =
    StreamFs.listNames(s"$stateDir/cells").filter(_.startsWith("batch="))
      .filter(b => StreamFs.exists(s"$stateDir/cells/$b/${DedupStream.Marker}"))
      .map(b => s"$stateDir/cells/$b")

  /** The merged sketch over every committed batch: cells ADD. */
  def readSketch(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = committedCellDirs(stateDir)
    if (dirs.isEmpty)
      spark.range(0).select(col("id").cast("int").as("j"),
        col("id").as("bucket"), col("id").as("cell"))
    else
      spark.read.option("basePath", s"$stateDir/cells").parquet(dirs: _*)
        .groupBy("j", "bucket").agg(sum("cell").as("cell"))
  }

  /** CMS point-frequency estimates for `probe` (a `token` column)
    * against the committed sketch: min over the d row cells, 0 for a
    * never-seen token (its cells were never incremented). The sketch's
    * one-sided guarantee survives the merge: n_est ≥ the token's true
    * count over every committed batch. */
  def estimate(spark: SparkSession, stateDir: String,
               probe: DataFrame): DataFrame =
    ProfileQueries.cmsProbeRows(probe)
      .join(broadcast(readSketch(spark, stateDir)), Seq("j", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cell"), lit(0L))).as("n_est"))
}
