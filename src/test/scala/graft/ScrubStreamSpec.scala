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

  // ---- takedown: span restitution ---------------------------------------

  test("takedown restitutes a removed owner's span; stacked chains and " +
      "re-admission replay exactly") {
    import spark.implicits._
    val S = (0 until PrepQueries.scrubSpanLen).map("s" + _).mkString(" ")
    def doc(id: Long, text: String) = Seq((id, text)).toDF("doc_id", "text")
    def corpus(d: String): Map[Long, (Long, Long, String)] =
      ScrubStream.readCorpus(spark, d).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getString(3)))).toMap
    val d = freshDir()
    ScrubStream.applyMicroBatch(spark, doc(10, S), d, 0L)
    ScrubStream.applyMicroBatch(spark, doc(20, S + " btail"), d, 1L)
    ScrubStream.applyMicroBatch(spark, doc(30, S + " ctail"), d, 2L)
    assert(corpus(d) === Map(
      10L -> ((1L, 0L, S)), 20L -> ((2L, 1L, "btail")),
      30L -> ((2L, 1L, "ctail"))))
    // removing the owner restitutes S to B (earliest survivor), not C
    ScrubStream.applyTakedown(spark, d, Seq(10L).toDF("doc_id"), 0L)
    val post = corpus(d)
    assert(post === Map(
      20L -> ((2L, 0L, S + " btail")), 30L -> ((2L, 1L, "ctail"))))
    // replaying a committed takedownId with DIFFERENT data must no-op
    ScrubStream.applyTakedown(spark, d, Seq(30L).toDF("doc_id"), 0L)
    assert(corpus(d) === post)
    // stacked: removing the PROMOTED owner passes S on to C
    ScrubStream.applyTakedown(spark, d, Seq(20L).toDF("doc_id"), 1L)
    assert(corpus(d) === Map(30L -> ((2L, 0L, S + " ctail"))))
    // full-class removal re-opens the class: a later arrival keeps S
    ScrubStream.applyTakedown(spark, d, Seq(30L).toDF("doc_id"), 2L)
    ScrubStream.applyMicroBatch(spark, doc(40, S + " dtail"), d, 3L)
    assert(corpus(d) === Map(40L -> ((2L, 0L, S + " dtail"))))
  }

  test("post-takedown corpus ≡ from-scratch survivors ingest; compact " +
      "folds physically and later takedowns still elect") {
    val d = freshDir()
    ingestSplit(d, 3)
    val rm = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
    ScrubStream.applyTakedown(spark, d, rm, 0L)
    val view = streamOut(d)
    // from-scratch twin: the SAME 3-way id bounds over the survivors
    def survIngest(mods: Seq[Long]): Seq[Seq[Any]] = {
      val d2 = freshDir()
      val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
      val bounds = (1 until 3).map(i => ids(i * ids.length / 3))
      val ranges = (Long.MinValue +: bounds) :+ Long.MaxValue
      val surv = mods.foldLeft(docs)((b, m) => b.filter(col("doc_id") % m =!= 0))
      ranges.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
        ScrubStream.applyMicroBatch(spark,
          surv.filter(col("doc_id") >= lo && col("doc_id") < hi), d2, i.toLong)
      }
      streamOut(d2)
    }
    assert(view === survIngest(Seq(7L)),
      "takedown view diverged from the survivors-only rebuild")
    assert(view.exists(_(2).asInstanceOf[Long] > 0),
      "fixture must still drop spans after the takedown")
    ScrubStream.compact(spark, d)
    assert(streamOut(d) === view, "compact changed the corpus")
    assert(StreamFs.listNames(s"$d/takedown").isEmpty,
      "compact left takedown dirs behind")
    // election from the FOLDED index/drops (owners survive the fold)
    val rm2 = docs.filter(col("doc_id") % 11 === 0).select("doc_id")
    ScrubStream.applyTakedown(spark, d, rm2, 7L)
    assert(streamOut(d) === survIngest(Seq(7L, 11L)),
      "post-compact takedown diverged from the survivors-only rebuild")
  }
}
