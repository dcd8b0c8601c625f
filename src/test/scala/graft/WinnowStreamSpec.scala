package graft

import java.nio.file.Files

import graft.ops.TextQueries
import graft.streaming.WinnowStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time streaming winnow dedup: the kept corpus equals the
  * batch winnow_ingest keep set for every id-ordered batch split, the
  * index covers every processed document, and replay is idempotent. */
class WinnowStreamSpec extends SparkSpec {

  private def documents(): DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text")

  /** doc_ids the batch face keeps — the stream's contract. */
  private def batchKeepSet(d: DataFrame): Set[Long] =
    TextQueries.winnowIngestOf(d)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  private def streamKeepSet(splits: Seq[DataFrame]): Set[Long] = {
    val tmp = Files.createTempDirectory("graft-winnow").toString
    splits.zipWithIndex.foreach { case (b, i) =>
      WinnowStream.applyMicroBatch(spark, b, s"$tmp/corpus", batchId = i.toLong)
    }
    WinnowStream.readCorpus(spark, s"$tmp/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("stream ≡ batch winnow_ingest across id-ordered batch splits") {
    val all = documents().cache()
    val expect = batchKeepSet(all)
    assert(expect.nonEmpty && expect.size < all.count(),
      "testdata contains shared text; some docs must drop, most must stay")
    val cut = all.agg(max("doc_id")).first().getLong(0)
    // three different interleavings: one-shot, thirds, uneven head+tail
    val splitsList = Seq(
      Seq(all),
      Seq((-1L, cut / 3), (cut / 3, 2 * cut / 3), (2 * cut / 3, cut)).map {
        case (lo, hi) => all.filter(col("doc_id") > lo && col("doc_id") <= hi)
      },
      Seq(all.filter(col("doc_id") <= 7), all.filter(col("doc_id") > 7)))
    splitsList.zipWithIndex.foreach { case (splits, i) =>
      assert(streamKeepSet(splits) === expect,
        s"interleaving #$i must keep exactly the batch-face keep set")
    }
  }

  test("replay is a no-op; index covers every processed doc's fingerprints") {
    val tmp = Files.createTempDirectory("graft-winnow-replay").toString
    val b = documents().filter(col("doc_id") < 100).cache()
    WinnowStream.applyMicroBatch(spark, b, s"$tmp/corpus", batchId = 0L)
    val before = WinnowStream.readCorpus(spark, s"$tmp/corpus").count()
    WinnowStream.applyMicroBatch(spark, b, s"$tmp/corpus", batchId = 0L)
    assert(WinnowStream.readCorpus(spark, s"$tmp/corpus").count() === before)
    // index rows = the winnow fingerprint set of ALL processed docs —
    // dropped docs stay indexed as cross-batch witnesses
    val idx = WinnowStream.readIndex(spark, s"$tmp/corpus")
      .select("doc_id", "h")
    // the index is written pre-distinct (the probe only tests h
    // existence), so compare as sets of (doc_id, h) pairs
    val fp = TextQueries.winnowFingerprintsOf(b).select("doc_id", "h")
      .distinct()
    assert(idx.count() === fp.count())
    assert(idx.exceptAll(fp).isEmpty && fp.exceptAll(idx).isEmpty,
      "index must hold exactly the processed fingerprint pairs")
  }

  test("fingerprint-less short docs always keep") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a" * 200), // long, first — keeps
      (2L, "a" * 200), // identical text — all fingerprints shared → drops
      (3L, "short"), // < winnowK chars → no fingerprints → keeps
      (4L, "")).toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("graft-winnow-short").toString
    WinnowStream.applyMicroBatch(spark, docs, s"$tmp/corpus", batchId = 0L)
    val kept = WinnowStream.readCorpus(spark, s"$tmp/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L))
    // and the batch face agrees
    assert(batchKeepSet(docs) === Set(1L, 3L, 4L))
  }
}
