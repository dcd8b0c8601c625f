package graft

import java.nio.file.Files

import graft.ops.MediaQueries
import graft.streaming.PairStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time multimodal pair gate: the streamed verdicts equal the
  * batch [[MediaQueries.multimodalPairs]] rows under id-ordered
  * batching (any split count), text-only docs feed caption claims
  * without emitting pair verdicts, the live funnel equals the batch
  * funnel, and replay is idempotent. */
class PairStreamSpec extends SparkSpec {

  import spark.implicits._

  /** documents + image payloads (textured corpus slice), text-only
    * docs carrying a NULL payload. */
  private def pairInput(): DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text")
      .join(MediaQueries.texturedMediaTable(spark, sf)
        .filter(col("doc_id") % 3 =!= 1), Seq("doc_id"), "left")
      .select("doc_id", "text", "payload")

  private def ingest(docs: DataFrame, nBatches: Int): String = {
    val dir = Files.createTempDirectory("graft-pair").toString + "/state"
    val (lo, hi) = docs.agg(min("doc_id"), max("doc_id")).collect()
      .headOption.map(r => (r.getLong(0), r.getLong(1))).getOrElse((0L, 0L))
    val span = hi - lo + 1
    (0 until nBatches).foreach { i =>
      PairStream.applyMicroBatch(spark,
        docs.filter(col("doc_id") >= lo + i * span / nBatches &&
          col("doc_id") < lo + (i + 1) * span / nBatches +
            (if (i == nBatches - 1) 1 else 0)),
        dir, i.toLong)
    }
    dir
  }

  test("streamed pair verdicts == batch multimodalPairs rows, for 2 and 4 batches") {
    val docs = pairInput().localCheckpoint()
    val batchRows = MediaQueries.multimodalPairs(spark, sf)
      .select("doc_id", "format", "width", "height", "pred_lang",
        "quality", "keep", "reject_reason")
    for (n <- Seq(2, 4)) {
      val dir = ingest(docs, n)
      val streamed = PairStream.readVerdicts(spark, dir)
        .select("doc_id", "format", "width", "height", "pred_lang",
          "quality", "keep", "reject_reason")
      assert(streamed.exceptAll(batchRows).isEmpty &&
        batchRows.exceptAll(streamed).isEmpty,
        s"verdicts must match the batch face under $n-way batching")
      // live funnel == batch funnel, bit for bit
      val live = PairStream.pairFunnelLive(spark, dir).collect().toSeq
      val batch = MediaQueries.multimodalPairFunnel(spark, sf)
        .collect().toSeq
      assert(live === batch, s"live funnel must equal batch under $n-way")
    }
  }

  test("text-only docs claim caption canonicality but emit no pair verdict") {
    val dir = Files.createTempDirectory("graft-pair-claims").toString +
      "/state"
    val img = MediaQueries.texturedMediaTable(spark, sf)
      .filter(col("doc_id") % 3 === 0).limit(1)
      .select("payload").as[Array[Byte]].collect()(0)
    // doc 1 (text-only) and doc 5 (image) share a caption: the image
    // doc must reject as near_dup even though the canonical never
    // produced a pair row
    val b = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again " +
        "and then some more words to pass the too-short gate easily " +
        "the quick brown fox jumps over the lazy dog again and again",
        null.asInstanceOf[Array[Byte]]),
      (5L, "the quick brown fox jumps over the lazy dog again and again " +
        "and then some more words to pass the too-short gate easily " +
        "the quick brown fox jumps over the lazy dog again and again",
        img)).toDF("doc_id", "text", "payload")
    PairStream.applyMicroBatch(spark, b, dir, 0L)
    val v = PairStream.readVerdicts(spark, dir)
      .select("doc_id", "reject_reason").as[(Long, String)].collect().toMap
    assert(v.keySet === Set(5L), "only the image doc emits a pair verdict")
    assert(v(5L) === "near_dup",
      "the caption claim of the text-only doc must reject the image twin")
  }

  test("takedown: post-takedown verdicts == from-scratch pair ingest of survivors") {
    val docs = pairInput().localCheckpoint()
    val removals = docs.filter(col("doc_id") % 13 === 0).select("doc_id")
      .localCheckpoint()
    val dir = ingest(docs, 3)
    PairStream.applyTakedown(spark, dir, removals, takedownId = 0L)
    def rows(d: String) = PairStream.readVerdicts(spark, d)
      .select("doc_id", "format", "width", "height", "pred_lang",
        "quality", "keep", "reject_reason")
      .as[(Long, String, Long, Long, String, Double, Boolean,
        Option[String])].collect().toSet
    val after = rows(dir)
    // from-scratch: one-shot pair ingest of the SURVIVORS only — both
    // modalities must re-elect (caption claims to any surviving holder,
    // image near-dups against surviving witnesses)
    val fresh = ingest(docs.join(removals, Seq("doc_id"), "left_anti"), 1)
    assert(after === rows(fresh),
      s"diverged: only-takedown=${(after -- rows(fresh)).take(3)} " +
        s"only-replay=${(rows(fresh) -- after).take(3)}")
    assert(after.forall(_._1 % 13 != 0), "removed docs must purge")
    // idempotent replay
    PairStream.applyTakedown(spark, dir, removals, takedownId = 0L)
    assert(rows(dir) === after)
    // a re-arrival of a surviving doc's caption stays rejected: the
    // post-takedown claims view still holds the class
    val probe = docs
      .filter(col("doc_id") % 13 =!= 0 && col("payload").isNotNull)
      .orderBy("doc_id").limit(1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("payload"))
    PairStream.applyMicroBatch(spark, probe, dir, 3L)
    val probed = PairStream.readVerdicts(spark, dir)
      .filter(col("doc_id") >= 1000000L)
      .select("reject_reason").as[Option[String]].collect()
    assert(probed.length === 1 && probed.head.nonEmpty,
      "a duplicate caption must stay gated after the takedown")
  }

  test("replaying a committed batch id is a no-op") {
    val docs = pairInput().filter(col("doc_id") < 100).localCheckpoint()
    val dir = Files.createTempDirectory("graft-pair-replay").toString +
      "/state"
    PairStream.applyMicroBatch(spark, docs, dir, 0L)
    val before = PairStream.readVerdicts(spark, dir).count()
    PairStream.applyMicroBatch(spark, docs, dir, 0L)
    assert(PairStream.readVerdicts(spark, dir).count() === before)
  }
}
