package graft

import java.nio.file.Files

import graft.ops.MediaQueries
import graft.streaming.{CompactionLock, DedupStream, MediaStream, StreamFs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time streaming MULTIMODAL near-dup filtering: the kept
  * corpus equals the batch dedup faces' verdicts, id-ordered batching
  * equals one-shot ingestion, the dry-run gate agrees with the ingest,
  * replay is idempotent, and compaction/lock semantics carry over from
  * the shared DedupStream layout. */
class MediaStreamSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-mediastream").toString + "/corpus"

  private lazy val media: DataFrame =
    MediaQueries.texturedMediaTable(spark, sf).localCheckpoint()

  private lazy val allIds: Seq[Long] =
    media.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  /** The BATCH faces' verdict: a doc is dropped iff it appears as the
    * HIGHER id of a verified dedup_media or dedup_audio pair. */
  private lazy val batchKept: Set[Long] = {
    val droppedB = (MediaQueries.dedupMedia(spark, sf).collect() ++
      MediaQueries.dedupAudio(spark, sf).collect()).map(_.getLong(1)).toSet
    allIds.toSet -- droppedB
  }

  private def keptIds(dir: String): Set[Long] =
    MediaStream.readCorpus(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  /** Split into k CONTIGUOUS id ranges — the id-ordered batching the
    * equivalence claim is stated for (the NearDupStream contract). */
  private def ranges(k: Int): Seq[DataFrame] = {
    val bounds = (0 to k).map(i => allIds((i * (allIds.size - 1)) / k))
    (0 until k).map { i =>
      val hi = bounds(i + 1)
      media.filter(col("doc_id") >= bounds(i) &&
        (if (i == k - 1) col("doc_id") <= hi else col("doc_id") < hi))
    }
  }

  test("one-shot ingest keeps exactly the batch faces' verdicts") {
    val d = freshDir()
    MediaStream.applyMicroBatch(spark, media, d, 0L)
    assert(keptIds(d) === batchKept)
    // both modalities are present and both actually folded some docs
    val kept = MediaStream.readCorpus(spark, d)
    assert(kept.filter(col("modality") === "img").count() > 0)
    assert(kept.filter(col("modality") === "aud").count() > 0)
    assert((allIds.toSet -- batchKept).nonEmpty, "fixture must have dups")
    // the kept payloads round-trip: fingerprints recompute from bytes
    val reFp = MediaStream.gateProbe(spark,
      kept.select("doc_id", "payload"), freshDir())
      .select("doc_id", "fp").collect().map(r => r.getLong(0) -> r.getLong(1))
    val storedFp = kept.select("doc_id", "fp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reFp.forall { case (id, fp) => storedFp(id) == fp })
  }

  test("id-ordered 3-batch ingest equals one-shot; replay no-ops") {
    val d = freshDir()
    val rs = ranges(3)
    rs.zipWithIndex.foreach { case (r, i) =>
      MediaStream.applyMicroBatch(spark, r, d, i.toLong) }
    assert(keptIds(d) === batchKept,
      "batching must not change the kept set")
    // replaying a committed id (even with different data) is a no-op
    MediaStream.applyMicroBatch(spark, rs(1), d, 0L)
    assert(keptIds(d) === batchKept)
    // the index holds band rows for EVERY processed doc (kept+dropped):
    // 4 band rows per doc per modality
    assert(MediaStream.readIndex(spark, d).count() === allIds.size * 4L)
  }

  test("gateProbe (dry-run) agrees with what ingesting the batch would keep") {
    val d = freshDir()
    val rs = ranges(3)
    MediaStream.applyMicroBatch(spark, rs(0), d, 0L)
    MediaStream.applyMicroBatch(spark, rs(1), d, 1L)
    val probed = MediaStream.gateProbe(spark, rs(2), d).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    MediaStream.applyMicroBatch(spark, rs(2), d, 2L)
    val keptNow = keptIds(d)
    assert(probed.forall { case (id, keep) => keep == keptNow.contains(id) })
    // and the probe wrote nothing: exactly 3 committed batches
    assert(StreamFs.listNames(s"$d/docs").count(_.startsWith("batch=")) === 3)
  }

  test("compaction (shared DedupStream layout) preserves the corpus; lock guards ingest") {
    val d = freshDir()
    ranges(2).zipWithIndex.foreach { case (r, i) =>
      MediaStream.applyMicroBatch(spark, r, d, i.toLong) }
    val before = keptIds(d)
    DedupStream.compact(spark, d)
    assert(keptIds(d) === before)
    assert(MediaStream.readIndex(spark, d).count() === allIds.size * 4L)
    // live lock blocks ingest loudly; stale lock doesn't
    StreamFs.writeAtomicString(d + ".clock", "")
    intercept[IllegalStateException](
      MediaStream.applyMicroBatch(spark, media.limit(1), d, 9L))
    StreamFs.touchAt(d + ".clock",
      System.currentTimeMillis() - CompactionLock.StaleMs - 1000)
    MediaStream.applyMicroBatch(spark, media.limit(0), d, 9L)
  }
}
