package graft

import java.nio.file.Files

import graft.ops.{DedupQueries, TextQueries}
import graft.streaming.{CompactionLock, DedupStream, StreamFs, UrlStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time URL dedup: the admitted corpus equals the batch
  * dedup_url keep set under id-ordered batching, batch-count-invariant,
  * replay idempotent, compaction/lock semantics shared with the
  * DedupStream layout. */
class UrlStreamSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-urlstream").toString + "/corpus"

  private lazy val urls: DataFrame =
    TextQueries.urlNormalize(spark, sf).select("doc_id", "url")
      .localCheckpoint()

  private lazy val batchKeep: Set[Long] =
    DedupQueries.dedupUrl(spark, sf).filter(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet

  private def keptIds(d: String): Set[Long] =
    UrlStream.readCorpus(spark, d).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  test("one-shot and id-ordered 3-batch ingest both equal the batch keep set") {
    val one = freshDir()
    UrlStream.applyMicroBatch(spark, urls, one, 0L)
    assert(keptIds(one) === batchKeep)
    assert(batchKeep.size < urls.count(), "fixture must carry aliases")
    val three = freshDir()
    val ids = urls.select("doc_id").collect().map(_.getLong(0)).sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    Seq(
      urls.filter(col("doc_id") < cuts(0)),
      urls.filter(col("doc_id") >= cuts(0) && col("doc_id") < cuts(1)),
      urls.filter(col("doc_id") >= cuts(1)))
      .zipWithIndex.foreach { case (b, i) =>
        UrlStream.applyMicroBatch(spark, b, three, i.toLong) }
    assert(keptIds(three) === batchKeep, "batching must not change the set")
    // admitted rows carry the canonical the codegen kernel computes
    val bad = UrlStream.readCorpus(spark, three)
      .filter(call_function("url_canonicalize", col("url")) =!=
        col("canonical_url")).count()
    assert(bad === 0)
    // replay of a committed id no-ops
    UrlStream.applyMicroBatch(spark, urls, three, 1L)
    assert(keptIds(three) === batchKeep)
  }

  test("registered face equals the oracle's min-id rule; compaction and lock carry over") {
    val got = UrlStream.dedupUrlStream(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === batchKeep)
    // compaction (shared layout) preserves the corpus; live lock blocks
    val d = freshDir()
    UrlStream.applyMicroBatch(spark, urls.filter(col("doc_id") < 100), d, 0L)
    UrlStream.applyMicroBatch(spark, urls.filter(col("doc_id") >= 100), d, 1L)
    val before = keptIds(d)
    DedupStream.compact(spark, d)
    assert(keptIds(d) === before)
    StreamFs.writeAtomicString(d + ".clock", "")
    intercept[IllegalStateException](
      UrlStream.applyMicroBatch(spark, urls.limit(1), d, 9L))
    StreamFs.touchAt(d + ".clock",
      System.currentTimeMillis() - CompactionLock.StaleMs - 1000)
    UrlStream.applyMicroBatch(spark, urls.limit(0), d, 9L) // stale ⇒ proceeds
  }
}
