package graft

import java.nio.file.Files

import graft.ops.PrepQueries
import graft.streaming.{CompactionLock, PackStream, StreamFs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental sequence packing: the committed placement equals the
  * batch operator under id-ordered batching at any batch count, replay
  * no-ops, compaction folds, the lock guards ingest. */
class PackStreamSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-packstream").toString + "/state"

  private lazy val docs: DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text").localCheckpoint()

  private lazy val batchOut: Seq[Seq[Any]] =
    PrepQueries.sequencePack(spark, sf).collect().toSeq
      .sortBy(_.getLong(0)).map(_.toSeq)

  private def streamOut(d: String): Seq[Seq[Any]] =
    PackStream.readPlacement(spark, d).orderBy("doc_id")
      .collect().toSeq.map(_.toSeq)

  private def ingestSplit(d: String, parts: Int): Unit = {
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val bounds = (1 until parts).map(i => ids(i * ids.length / parts))
    val ranges = (Long.MinValue +: bounds) :+ Long.MaxValue
    ranges.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      PackStream.applyMicroBatch(spark,
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi), d, i.toLong)
    }
  }

  test("1/3/5-batch id-ordered ingests equal the batch packer") {
    for (parts <- Seq(1, 3, 5)) {
      val d = freshDir()
      ingestSplit(d, parts)
      assert(streamOut(d) === batchOut,
        s"$parts-batch placement diverged from the batch operator")
    }
  }

  test("replay no-ops; compact folds; a live lock blocks ingest loudly") {
    val d = freshDir()
    ingestSplit(d, 3)
    val before = streamOut(d)
    PackStream.applyMicroBatch(spark, docs.limit(7), d, 0L) // replay
    assert(streamOut(d) === before)
    PackStream.compact(spark, d)
    assert(streamOut(d) === before, "compact changed the placement")
    assert(StreamFs.listNames(s"$d/place")
      .count(_.startsWith("batch=")) === 3,
      "every committed id survives as at least a tombstone")
    PackStream.applyMicroBatch(spark, docs.limit(7), d, 1L) // still replays
    assert(streamOut(d) === before)
    StreamFs.writeAtomicString(d + ".clock", "")
    intercept[IllegalStateException](
      PackStream.applyMicroBatch(spark, docs.limit(1), d, 9L))
    StreamFs.touchAt(d + ".clock",
      System.currentTimeMillis() - CompactionLock.StaleMs - 1000)
    PackStream.applyMicroBatch(spark, docs.limit(0), d, 9L) // stale ⇒ ok
  }

  test("appending a batch after compact continues the offset exactly") {
    val d = freshDir()
    val (low, high) = {
      val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
      val mid = ids(ids.length / 2)
      (docs.filter(col("doc_id") < mid), docs.filter(col("doc_id") >= mid))
    }
    PackStream.applyMicroBatch(spark, low, d, 0L)
    PackStream.compact(spark, d)
    PackStream.applyMicroBatch(spark, high, d, 1L)
    assert(streamOut(d) === batchOut,
      "post-compact append diverged from the batch operator")
  }
}
