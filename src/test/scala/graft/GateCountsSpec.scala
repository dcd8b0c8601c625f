package graft

import java.nio.file.Files

import graft.ops.MediaQueries
import graft.streaming.{DedupStream, MediaStream, UrlStream}
import org.apache.spark.sql.functions._

/** Per-batch kept/dropped count tables of the media and URL gates:
  * counts ADD (lifetime = sum over committed dirs, window = subset
  * sum), a committed zero-row batch is an empty window member, and
  * compaction preserves the lifetime tally while (documented) windows
  * degrade to lifetime once batch boundaries collapse. */
class GateCountsSpec extends SparkSpec {

  import spark.implicits._

  test("media gate counts: lifetime = sum of batches; window = trailing subset; compaction preserves the tally") {
    val media = MediaQueries.texturedMediaTable(spark, sf).localCheckpoint()
    val dir = Files.createTempDirectory("graft-media-counts").toString +
      "/corpus"
    val cut = media.agg(max("doc_id")).first().getLong(0) / 2
    MediaStream.applyMicroBatch(spark,
      media.filter(col("doc_id") <= cut), dir, 0L)
    MediaStream.applyMicroBatch(spark,
      media.filter(col("doc_id") > cut), dir, 1L)
    val life = MediaStream.readCounts(spark, dir)
      .as[(String, Long, Long)].collect()
      .map { case (m, n, d) => m -> (n, d) }.toMap
    val n = media.count()
    assert(life.values.map(_._1).sum === n,
      "every processed doc must be tallied exactly once")
    val kept = MediaStream.readCorpus(spark, dir).count()
    assert(life.values.map(_._2).sum === n - kept,
      "dropped tally must equal processed - kept")
    // trailing-1 window = batch 1 only (strictly smaller than lifetime)
    val w1 = MediaStream.readCountsWindow(spark, dir, 1)
      .agg(sum("n_processed")).first().getLong(0)
    assert(w1 === media.filter(col("doc_id") > cut).count())
    // drift face shape: one row per modality, window ⊆ lifetime
    val drift = MediaStream.mediaGateDrift(spark, dir, lastK = 1)
    assert(drift.count() === 2)
    assert(drift.filter(col("n_window") > col("n_life")).isEmpty)
    // compaction: lifetime tally unchanged (counts concatenate; the
    // window degrades to lifetime — the documented boundary collapse)
    DedupStream.compact(spark, dir)
    val lifeAfter = MediaStream.readCounts(spark, dir)
      .as[(String, Long, Long)].collect()
      .map { case (m, nn, d) => m -> (nn, d) }.toMap
    assert(lifeAfter === life, "compaction must preserve the tally")
    val wAfter = MediaStream.readCountsWindow(spark, dir, 1)
      .agg(sum("n_processed")).first().getLong(0)
    assert(wAfter === n, "post-compact the window degrades to lifetime")
  }

  test("url gate counts: admit tally adds; drift is a 1-row subset-sum report") {
    val dir = Files.createTempDirectory("graft-url-counts").toString +
      "/corpus"
    UrlStream.applyMicroBatch(spark, Seq(
      1L -> "https://a.com/x", 2L -> "https://a.com/x?utm_source=t",
      3L -> "https://b.com/y").toDF("doc_id", "url"), dir, 0L)
    UrlStream.applyMicroBatch(spark, Seq(
      5L -> "https://a.com/x", 6L -> "https://c.com/z")
      .toDF("doc_id", "url"), dir, 1L)
    val drift = UrlStream.urlGateDrift(spark, dir, lastK = 1)
      .as[(Long, Long, Double, Long, Long, Double, Double)].collect()(0)
    // batch 0: 3 processed, 2 admitted (2 is a dup of 1); batch 1:
    // 2 processed, 1 admitted (5 is a dup of the indexed canonical)
    assert(drift._1 === 5L && drift._2 === 3L)
    assert(drift._4 === 2L && drift._5 === 1L)
    assert(drift._3 === 0.6 && drift._6 === 0.5)
    assert(math.abs(drift._7 - (-0.1)) < 1e-9)
    // an empty committed batch is an EMPTY WINDOW MEMBER (the round-14
    // ADVICE rule): trailing-1 after it sees zero rows, not batch 1
    UrlStream.applyMicroBatch(spark,
      spark.range(0).select(col("id").as("doc_id"),
        lit("").as("url")), dir, 2L)
    val w = UrlStream.urlGateDrift(spark, dir, lastK = 1)
      .select("n_window").as[Long].collect()(0)
    assert(w === 0L, "the empty batch must not shift the window back")
  }
}
