package graft

import java.nio.file.Files

import graft.ops.PrepQueries
import graft.streaming.{CompactionLock, DedupStream, ScrubStream, StreamFs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time exact-span scrub: the trimmed corpus equals the batch
  * dedup_span_scrub output under id-ordered batching, batch-count-
  * invariant, replay idempotent, compaction/lock semantics shared with
  * the DedupStream layout. */
class ScrubStreamSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-scrubstream").toString + "/corpus"

  private lazy val docs: DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text").localCheckpoint()

  private lazy val batchOut: Seq[Seq[Any]] =
    PrepQueries.dedupSpanScrub(spark, sf).collect().toSeq
      .sortBy(_.getLong(0)).map(_.toSeq)

  private def streamOut(d: String): Seq[Seq[Any]] =
    ScrubStream.readCorpus(spark, d).orderBy("doc_id")
      .collect().toSeq.map(_.toSeq)

  private def ingestSplit(d: String, parts: Int): Unit = {
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val bounds = (1 until parts).map(i => ids(i * ids.length / parts))
    val ranges = (Long.MinValue +: bounds) :+ Long.MaxValue
    ranges.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      ScrubStream.applyMicroBatch(spark,
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi), d, i.toLong)
    }
  }

  test("one-shot, 3-batch and 5-batch id-ordered ingests equal the batch scrub") {
    assert(batchOut.exists(_(2).asInstanceOf[Long] > 0),
      "fixture must actually drop spans")
    for (parts <- Seq(1, 3, 5)) {
      val d = freshDir()
      ingestSplit(d, parts)
      assert(streamOut(d) === batchOut,
        s"$parts-batch trimmed corpus diverged from the batch operator")
    }
  }

  test("replay no-ops; a trimmed doc keeps only globally-novel spans") {
    val d = freshDir()
    ingestSplit(d, 2)
    val before = streamOut(d)
    // replaying a committed batch id with DIFFERENT data must not apply
    ScrubStream.applyMicroBatch(spark, docs, d, 0L)
    assert(streamOut(d) === before)
    // the committed span index holds exactly the distinct span hashes
    val nIdx = ScrubStream.readIndex(spark, d).distinct().count()
    val kept = before.map(r => r(1).asInstanceOf[Long]).sum -
      before.map(r => r(2).asInstanceOf[Long]).sum
    assert(nIdx === kept, "index size = kept (globally novel) span count")
  }

  test("compaction preserves the corpus; a live lock blocks ingest loudly") {
    val d = freshDir()
    ingestSplit(d, 3)
    val before = streamOut(d)
    DedupStream.compact(spark, d)
    assert(streamOut(d) === before)
    StreamFs.writeAtomicString(d + ".clock", "")
    intercept[IllegalStateException](
      ScrubStream.applyMicroBatch(spark, docs.limit(1), d, 9L))
    StreamFs.touchAt(d + ".clock",
      System.currentTimeMillis() - CompactionLock.StaleMs - 1000)
    ScrubStream.applyMicroBatch(spark, docs.limit(0), d, 9L) // stale ⇒ proceeds
  }

  test("registered face equals the batch operator row-for-row") {
    val got = ScrubStream.dedupSpanScrubStream(spark, sf)
      .collect().toSeq.sortBy(_.getLong(0)).map(_.toSeq)
    assert(got === batchOut)
  }
}
