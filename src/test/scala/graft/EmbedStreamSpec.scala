package graft

import graft.streaming.{EmbedStream, StreamFs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.streaming.EmbedStream]] — streaming embedding-centroid
  * drift: integer-micro component sums make the merged state EXACTLY
  * the batch operator's under any batching; replay no-ops; compaction
  * honors the drift horizon; the ingest/compact lock is enforced. */
class EmbedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-embedstream")
      .toString + "/state"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** 300 vectors, 5 labels, 8 dims — components mix signs and
    * magnitudes so quantization and the cosine folds are exercised. */
  private val fixture: Seq[(Long, Int, Array[Float])] =
    (0 until 300).map { i =>
      val e = Array.tabulate(8) { d =>
        (((i * 2654435761L + d * 40503L) % 2001L) - 1000L).toFloat / 997f
      }
      (i.toLong, i % 5, e)
    }

  private def vecsDf(s: Seq[(Long, Int, Array[Float])]): DataFrame =
    s.toDF("vec_id", "label", "embedding")

  /** The BATCH twin: lifetime and window legs each collapsed by the
    * same embedCounts the stream writes per batch. */
  private def batchDrift(all: Seq[(Long, Int, Array[Float])],
                         win: Seq[(Long, Int, Array[Float])]): Seq[Seq[Any]] =
    rows(EmbedStream.driftFromCounts(
      EmbedStream.embedCounts(vecsDf(all)),
      EmbedStream.embedCounts(vecsDf(win))))

  test("stream-merged drift ≡ batch operator, any batching") {
    // window = everything (lastK ≥ dirs): lifetime vs lifetime
    Seq(1, 3, 5).foreach { parts =>
      val d = freshDir()
      (0 until parts).foreach(i => EmbedStream.applyMicroBatch(spark,
        vecsDf(fixture.zipWithIndex.filter(_._2 % parts == i).map(_._1)),
        d, i.toLong))
      assert(rows(EmbedStream.embeddingDriftLive(spark, d, lastK = 99))
        === batchDrift(fixture, fixture),
        s"$parts-batch merged drift diverged from the batch operator")
    }
  }

  test("trailing window ≡ batch legs over exactly the window's rows") {
    val d = freshDir()
    val slices = (0 until 4).map(i =>
      fixture.zipWithIndex.filter(_._2 % 4 == i).map(_._1))
    slices.zipWithIndex.foreach { case (s, i) =>
      EmbedStream.applyMicroBatch(spark, vecsDf(s), d, i.toLong) }
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, lastK = 2))
      === batchDrift(fixture, slices(2) ++ slices(3)))
    // self-comparison sanity: window == lifetime ⇒ cosine exactly 1
    val self = EmbedStream.embeddingDriftLive(spark, d, lastK = 99)
      .collect()
    assert(self.forall(r => r.getDouble(3) === 1.0 &&
      r.getDouble(4) === 1.0), "self-drift must be exactly (1, 1)")
    // a genuine subset window must not be a perfect match on this
    // random fixture
    val sub = EmbedStream.embeddingDriftLive(spark, d, lastK = 2)
      .collect()
    assert(sub.exists(r => r.getDouble(3) < 1.0))
  }

  test("replay no-ops; unmarked crash debris is swept") {
    val d = freshDir()
    EmbedStream.applyMicroBatch(spark, vecsDf(fixture), d, 0L)
    val before = rows(EmbedStream.embeddingDriftLive(spark, d, 1))
    EmbedStream.applyMicroBatch(spark, vecsDf(fixture.take(10)), d, 0L)
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, 1)) === before)
    StreamFs.createMarker(s"$d/counts/batch=9/part-junk")
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, 1)) === before)
    EmbedStream.recover(d)
    assert(!StreamFs.exists(s"$d/counts/batch=9"))
  }

  test("a real StreamingQuery drives the monitor end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-embedstream-q").toString
    val mem = MemoryStream[(Long, Int, Array[Float])]
    val q = EmbedStream.start(spark,
      mem.toDF().toDF("vec_id", "label", "embedding"),
      s"$tmp/state", s"$tmp/ckpt")
    try {
      val (h1, h2) = fixture.splitAt(fixture.length / 2)
      mem.addData(h1: _*)
      q.processAllAvailable()
      mem.addData(h2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(EmbedStream.embeddingDriftLive(spark, s"$tmp/state", 99))
      === batchDrift(fixture, fixture),
      "stream-driven monitor diverged from the batch operator")
  }

  test("compaction with keepLast ≥ window preserves the drift report") {
    val d = freshDir()
    val slices = (0 until 6).map(i =>
      fixture.zipWithIndex.filter(_._2 % 6 == i).map(_._1))
    slices.zipWithIndex.foreach { case (s, i) =>
      EmbedStream.applyMicroBatch(spark, vecsDf(s), d, i.toLong) }
    val before = rows(EmbedStream.embeddingDriftLive(spark, d, 2))
    EmbedStream.compact(spark, d, keepLast = 2)
    assert(StreamFs.listNames(s"$d/counts")
      .count(_.startsWith("batch=")) === 6,
      "every committed id survives as at least a tombstone")
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, 2)) === before,
      "window boundaries inside the horizon must survive compaction")
    // replay of a compacted-away id still no-ops
    EmbedStream.applyMicroBatch(spark, vecsDf(fixture), d, 0L)
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, 2)) === before)
    // full merge: the documented window-degrades-to-lifetime semantics
    EmbedStream.compact(spark, d)
    val life = EmbedStream.embeddingDriftLive(spark, d, 2).collect()
    assert(life.forall(r => r.getDouble(3) === 1.0))
  }

  test("a live compaction lock blocks ingest loudly; a stale one doesn't") {
    import graft.streaming.CompactionLock
    val d = freshDir()
    EmbedStream.applyMicroBatch(spark, vecsDf(fixture.take(100)), d, 0L)
    StreamFs.writeAtomicString(d + ".clock", "")
    intercept[IllegalStateException](EmbedStream.applyMicroBatch(spark,
      vecsDf(fixture.drop(100)), d, 1L))
    StreamFs.touchAt(d + ".clock",
      System.currentTimeMillis() - CompactionLock.StaleMs - 1000)
    EmbedStream.applyMicroBatch(spark, vecsDf(fixture.drop(100)), d, 1L)
    // lifetime report: invariant across the full merge below (a
    // trailing window is NOT — it degrades to lifetime by design)
    val before = rows(EmbedStream.embeddingDriftLive(spark, d, 99))
    EmbedStream.compact(spark, d)
    assert(!StreamFs.exists(d + ".clock"), "lock released after compact")
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, 99)) === before)
  }

  test("doc-grain takedown: exact subtraction, resubmission guard, " +
      "loud bad-batch, compact fold") {
    val d = freshDir()
    val slices = (0 until 4).map(i => fixture.filter(_._1 % 4 == i))
    slices.zipWithIndex.foreach { case (s, i) =>
      EmbedStream.applyMicroBatch(spark, vecsDf(s), d, i.toLong) }
    val removed = fixture.filter(_._1 % 13 == 0)
    val removedDf = removed
      .map { case (id, lab, e) => (id, id % 4, lab, e) }
      .toDF("doc_id", "batch", "label", "embedding")
    EmbedStream.applyTakedown(spark, d, removedDf, 0L)
    val surv = fixture.filter(_._1 % 13 != 0)
    val survWin = surv.filter(v => v._1 % 4 == 2 || v._1 % 4 == 3)
    val post = rows(EmbedStream.embeddingDriftLive(spark, d, 2))
    assert(post === batchDrift(surv, survWin),
      "post-takedown drift diverged from the survivors-only rebuild")
    // replaying the committed td id no-ops
    EmbedStream.applyTakedown(spark, d, removedDf, 0L)
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, 2)) === post)
    // resubmitting already-removed docs in a LATER td must not
    // subtract twice
    EmbedStream.applyTakedown(spark, d, removedDf.limit(5), 1L)
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, 2)) === post,
      "resubmission double-subtracted")
    // a correction against a batch that never committed fails loudly
    intercept[IllegalArgumentException](EmbedStream.applyTakedown(spark, d,
      Seq((9999L, 9L, 0, Array.fill(8)(1f)))
        .toDF("doc_id", "batch", "label", "embedding"), 2L))
    // compact folds the corrections physically, report unchanged, and
    // the resubmission guard survives the fold
    EmbedStream.compact(spark, d, keepLast = 2)
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, 2)) === post,
      "compact changed the post-takedown report")
    EmbedStream.applyTakedown(spark, d, removedDf.limit(5), 3L)
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, 2)) === post,
      "resubmission guard lost across compact")
    // a FRESH doc-grain takedown still lands after the fold
    val more = fixture.filter(_._1 % 13 != 0).take(1)
      .map { case (id, lab, e) => (id, id % 4, lab, e) }
    EmbedStream.applyTakedown(spark, d,
      more.toDF("doc_id", "batch", "label", "embedding"), 4L)
    val surv2 = surv.filterNot(v => v._1 == more.head._1)
    assert(rows(EmbedStream.embeddingDriftLive(spark, d, 2)) ===
      batchDrift(surv2, surv2.filter(v => v._1 % 4 == 2 || v._1 % 4 == 3)),
      "post-compact takedown diverged")
  }

  test("removing a label's every doc removes its row, as a rebuild would") {
    val d = freshDir()
    EmbedStream.applyMicroBatch(spark, vecsDf(fixture), d, 0L)
    val lab3 = fixture.filter(_._2 == 3)
    EmbedStream.applyTakedown(spark, d,
      lab3.map { case (id, lab, e) => (id, 0L, lab, e) }
        .toDF("doc_id", "batch", "label", "embedding"), 0L)
    val surv = fixture.filter(_._2 != 3)
    val got = rows(EmbedStream.embeddingDriftLive(spark, d, 1))
    assert(got === batchDrift(surv, surv))
    assert(!got.exists(_.head == 3), "fully-cancelled label row leaked")
  }

  test("registered face ≡ batch twin over the vec_id%4 window") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding")
    val all = vecs.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val win = all.filter(v => v._1 % 4 == 2 || v._1 % 4 == 3)
    assert(rows(graft.ops.SimilarityQueries.embeddingDrift(spark, sf))
      === batchDrift(all.toSeq, win.toSeq),
      "registered face diverged from the batch twin")
  }
}
