package graft.streaming

import graft.scd2.Scd2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming wiring for the CDC → SCD2 pipeline (SURVEY.md §7.1
  * item 4) — the Spark-first restatement of the reference's NiFi flow:
  *
  *  - source: any streaming DataFrame of CDC events (files/Kafka/Debezium
  *    JSON via `spark.readStream.schema(Cdc.eventSchema).json(dir)`); the
  *    reference's `CaptureChangeMySQL` 200 ms poll
  *    (final_template.xml:4363) maps to `Trigger.ProcessingTime(200ms)`;
  *  - state: the reference persists its binlog position in a
  *    DistributedMapCache (final_template.xml:1510-1519); Spark's
  *    checkpointLocation/offset log plays exactly that role;
  *  - per micro-batch: ONE transactional [[Scd2.applyBatch]] merge — the
  *    insert and update routes of the reference collapse into a single
  *    idempotent history rewrite, eliminating the reference's Task1/Task2
  *    race (README.md:190-195) by construction.
  *
  * Scale notes: the history table is read/written per micro-batch as
  * parquet; at scale the sink should be a transactional table format with
  * MERGE support, but the merge itself ([[Scd2.applyBatch]]) stays
  * identical — history is only ever touched by a broadcast join against
  * the batch's key set, so micro-batch cost is O(batch) + one history
  * scan, never a history shuffle.
  */
object Scd2Stream {

  /** Start the SCD2 maintenance stream over a CDC event stream.
    *
    * @param events     streaming DataFrame with Cdc.eventSchema-shaped rows
    *                   already flattened+typed (columns: keys ++ payload ++
    *                   tsCol ++ seqCol)
    * @param historyDir parquet dir holding the SCD2 history table
    * @param checkpoint checkpoint dir (replaces the reference's MapCache)
    */
  def start(spark: SparkSession, events: DataFrame, historyDir: String,
            checkpoint: String, keys: Seq[String], tsCol: String,
            seqCol: String, triggerMs: Long = 200L): StreamingQuery =
    events.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMicroBatch(spark, batch, historyDir, keys, tsCol, seqCol,
          batchId = Some(batchId))
      }
      .start()

  /** One micro-batch against a BUCKETED history: the table is laid out as
    * `historyDir/__bucket=N/` (N = murmur3(key) mod nBuckets) and a batch
    * only reads + rewrites the buckets its keys hash into — the 100 TB
    * answer to [[applyMicroBatch]]'s full-table rewrite. With k touched
    * buckets out of B, a micro-batch costs O(history·k/B + batch), and
    * partition pruning serves point-lookups by key from one bucket.
    * Untouched buckets are never opened (dynamic partition overwrite).
    *
    * Same exactly-once commit-log contract as [[applyMicroBatch]]. */
  def applyMicroBatchBucketed(spark: SparkSession, batch: DataFrame,
                              historyDir: String, keys: Seq[String],
                              tsCol: String, seqCol: String, nBuckets: Int = 64,
                              batchId: Option[Long] = None): Unit = {
    val commitLog = new java.io.File(historyDir + ".commits")
    if (batchId.exists(committedIds(commitLog).contains)) return
    if (batch.isEmpty) return
    val bucket = pmod(hash(keys.map(col): _*), lit(nBuckets))
    val tagged = batch.withColumn("__bucket", bucket)
    val touched = tagged.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val dirs = touched.map(b => s"$historyDir/__bucket=$b")
      .filter(d => new java.io.File(d).exists())
    val merged =
      if (dirs.nonEmpty) {
        val hist = spark.read.option("basePath", historyDir)
          .parquet(dirs.toIndexedSeq: _*)
        Scd2.applyBatch(hist.drop("__bucket"), batch, keys, tsCol, seqCol)
      } else {
        Scd2.fromEvents(batch, keys, tsCol, seqCol)
      }
    merged.withColumn("__bucket", bucket)
      .write.partitionBy("__bucket")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(historyDir)
    batchId.foreach(appendCommit(commitLog, _))
  }

  /** Read a bucketed history back as a plain SCD2 table. */
  def readBucketed(spark: SparkSession, historyDir: String): DataFrame =
    spark.read.parquet(historyDir).drop("__bucket")

  private def committedIds(commitLog: java.io.File): Set[Long] =
    if (commitLog.exists())
      scala.io.Source.fromFile(commitLog).getLines().map(_.toLong).toSet
    else Set.empty

  private def appendCommit(commitLog: java.io.File, id: Long): Unit = {
    val w = new java.io.FileWriter(commitLog, true)
    try w.write(s"$id\n") finally w.close()
  }

  /** One micro-batch: read current history, merge, atomically replace.
    *
    * Exactly-once on replay: with a `batchId` (foreachBatch supplies one),
    * an already-committed id is a no-op — the standard idempotent-sink
    * pattern for non-transactional stores (commit log kept next to the
    * table). */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame, historyDir: String,
                      keys: Seq[String], tsCol: String, seqCol: String,
                      batchId: Option[Long] = None): Unit = {
    val commitLog = new java.io.File(historyDir + ".commits")
    if (batchId.exists(committedIds(commitLog).contains)) return
    if (batch.isEmpty) return
    val dir = new java.io.File(historyDir)
    val merged =
      if (dir.exists() && dir.list().exists(_.endsWith(".parquet"))) {
        val history = spark.read.parquet(historyDir)
        Scd2.applyBatch(history, batch, keys, tsCol, seqCol)
      } else {
        Scd2.fromEvents(batch, keys, tsCol, seqCol)
      }
    // local-FS two-phase swap; on a real deployment the sink is a
    // transactional table format and this is a MERGE
    val tmp = historyDir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val fresh = new java.io.File(tmp)
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    if (!fresh.renameTo(dir))
      throw new java.io.IOException(s"atomic swap failed: $tmp -> $historyDir")
    batchId.foreach(appendCommit(commitLog, _))
  }
}
