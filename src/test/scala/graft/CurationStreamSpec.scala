package graft

import graft.ops.CurationQueries
import graft.streaming.{CurationStream, StreamFs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.streaming.CurationStream]] — ingest-time curation: stream
  * verdicts ≡ the batch pipeline under id-ordered batching, the live
  * funnel ≡ the batch funnel by count linearity, first-arrival
  * canonicality on out-of-order input, replay/crash/compact/lock
  * protocol. */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-curationstream")
      .toString + "/state"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def verdictRows(df: DataFrame): Seq[Seq[Any]] =
    rows(df.select("doc_id", "n_tokens", "pred_lang", "quality",
      "is_canonical", "keep", "reject_reason").orderBy("doc_id"))

  /** Docs with planted exact dups: ids 0..59 get one of 20 texts (ids
    * sharing i % 20 are exact dups), with enough variety to trip every
    * stateless gate. */
  private val fixture: Seq[(Long, String)] = (0 until 60).map { i =>
    val m = i % 20
    val words = m match {
      case 0 => "short one" // too_short
      case 1 => ("le chat et le chien et " * 8).trim // non_en-ish
      case _ => (s"the quick brown fox m$m jumps over the lazy dog and " +
        s"then the fox m$m rests by the river bank for a while ") * 3
    }
    (i.toLong, words)
  }

  private def docsDf(s: Seq[(Long, String)]): DataFrame =
    s.toDF("doc_id", "text")

  private def batchPipeline(s: Seq[(Long, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = CurationQueries.scoredDocs(docsDf(s))
      .withColumn("is_canonical", col("doc_id") ===
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
    base.select(col("doc_id"), col("n_tokens"), col("pred_lang"),
      col("quality"), col("is_canonical"),
      CurationQueries.rejectReason.isNull.as("keep"),
      CurationQueries.rejectReason.as("reject_reason"))
  }

  test("stream verdicts ≡ batch pipeline under id-ordered batching") {
    val batch = verdictRows(batchPipeline(fixture))
    Seq(1, 3).foreach { parts =>
      val d = freshDir()
      val span = (fixture.length + parts - 1) / parts
      (0 until parts).foreach(i => CurationStream.applyMicroBatch(spark,
        docsDf(fixture.filter(x =>
          x._1 >= i * span && x._1 < (i + 1) * span)), d, i.toLong))
      assert(verdictRows(CurationStream.readVerdicts(spark, d)) === batch,
        s"$parts-batch stream verdicts diverged from the batch pipeline")
      // live funnel = batch funnel over the same rows (count linearity)
      assert(rows(CurationStream.funnelLive(spark, d)) ===
        rows(CurationQueries.funnelFromCounts(
          CurationQueries.funnelCounts(batchPipeline(fixture)))))
    }
  }

  test("out-of-order arrival: first-arrival claims canonicality") {
    val d = freshDir()
    // the HIGHER-id copy of each dup pair arrives first
    val (early, late) = fixture.partition(_._1 >= 20)
    CurationStream.applyMicroBatch(spark, docsDf(early), d, 0L)
    CurationStream.applyMicroBatch(spark, docsDf(late), d, 1L)
    val v = CurationStream.readVerdicts(spark, d).collect()
    // exactly one canonical per content hash
    val byText = fixture.toMap
    val canon = v.filter(_.getAs[Boolean]("is_canonical"))
      .map(r => byText(r.getAs[Long]("doc_id")))
    assert(canon.distinct.length === canon.length,
      "two canonicals for one content hash")
    // ids 0, 20, 40 share one text; 20 and 40 arrive in batch 0 (within
    // the batch min doc_id wins → 20), 0 arrives in batch 1 — the
    // first-arrival convention makes 20 canonical and 0 a near-dup
    // DESPITE its lower doc_id (the documented divergence from the
    // batch operator on out-of-order input)
    val vm = v.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Boolean]("is_canonical")).toMap
    assert(vm(20L), "first-arrival doc must claim the hash")
    assert(!vm(40L), "same-batch higher id must lose to the batch min")
    assert(!vm(0L), "a late-arriving lower id must lose the claim")
  }

  test("replay no-ops; unmarked crash debris is swept") {
    val d = freshDir()
    CurationStream.applyMicroBatch(spark, docsDf(fixture), d, 0L)
    val before = verdictRows(CurationStream.readVerdicts(spark, d))
    CurationStream.applyMicroBatch(spark, docsDf(fixture.take(5)), d, 0L)
    assert(verdictRows(CurationStream.readVerdicts(spark, d)) === before)
    // claims/counts without a committed verdicts twin are swept
    StreamFs.createMarker(s"$d/claims/batch=9/part-junk")
    StreamFs.createMarker(s"$d/counts/batch=9/part-junk")
    CurationStream.recover(d)
    assert(!StreamFs.exists(s"$d/claims/batch=9"))
    assert(!StreamFs.exists(s"$d/counts/batch=9"))
  }

  test("a real StreamingQuery drives the ingest end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-curationstream-q").toString
    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.start(spark,
      mem.toDF().toDF("doc_id", "text"), s"$tmp/state", s"$tmp/ckpt")
    try {
      val (h1, h2) = fixture.splitAt(fixture.length / 2)
      mem.addData(h1: _*)
      q.processAllAvailable()
      mem.addData(h2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(verdictRows(CurationStream.readVerdicts(spark, s"$tmp/state"))
      === verdictRows(batchPipeline(fixture)),
      "stream-driven verdicts diverged from the batch pipeline")
  }

  test("compact: one data dir per sub-table, reports unchanged") {
    val d = freshDir()
    val span = 15
    (0 until 4).foreach(i => CurationStream.applyMicroBatch(spark,
      docsDf(fixture.filter(x =>
        x._1 >= i * span && x._1 < (i + 1) * span)), d, i.toLong))
    val verdictsBefore = verdictRows(CurationStream.readVerdicts(spark, d))
    val funnelBefore = rows(CurationStream.funnelLive(spark, d))
    CurationStream.compact(spark, d)
    val dataDirs = StreamFs.listNames(s"$d/verdicts")
      .filter(_.startsWith("batch="))
      .filter(b => StreamFs.hasDataFiles(s"$d/verdicts/$b"))
    assert(dataDirs === Seq("batch=3"))
    (0 until 4).foreach(i => assert(
      StreamFs.exists(s"$d/verdicts/batch=$i/_GRAFT_COMMIT")))
    assert(verdictRows(CurationStream.readVerdicts(spark, d))
      === verdictsBefore, "compaction changed the verdicts")
    assert(rows(CurationStream.funnelLive(spark, d)) === funnelBefore,
      "compaction changed the live funnel")
    // replay of a compacted-away id no-ops; new batches land and the
    // compacted claims still gate them
    CurationStream.applyMicroBatch(spark, docsDf(fixture.take(15)), d, 0L)
    assert(verdictRows(CurationStream.readVerdicts(spark, d))
      === verdictsBefore)
    CurationStream.applyMicroBatch(spark,
      docsDf(Seq((900L, fixture(5)._2))), d, 9L)
    val v900 = CurationStream.readVerdicts(spark, d)
      .filter(col("doc_id") === 900L).collect()
    assert(v900.length === 1 &&
      !v900.head.getAs[Boolean]("is_canonical"),
      "a post-compaction dup must still lose to the compacted claim")
  }

  test("a live compaction lock blocks ingest loudly; a stale one doesn't") {
    import graft.streaming.CompactionLock
    val d = freshDir()
    CurationStream.applyMicroBatch(spark, docsDf(fixture.take(30)), d, 0L)
    StreamFs.writeAtomicString(d + ".clock", "")
    intercept[IllegalStateException](CurationStream.applyMicroBatch(spark,
      docsDf(fixture.drop(30)), d, 1L))
    StreamFs.touchAt(d + ".clock",
      System.currentTimeMillis() - CompactionLock.StaleMs - 1000)
    CurationStream.applyMicroBatch(spark, docsDf(fixture.drop(30)), d, 1L)
    val before = verdictRows(CurationStream.readVerdicts(spark, d))
    CurationStream.compact(spark, d)
    assert(!StreamFs.exists(d + ".clock"), "lock released after compact")
    assert(verdictRows(CurationStream.readVerdicts(spark, d)) === before)
  }

  test("funnel drift: window leg ≡ batch funnel over the window's rows") {
    val d = freshDir()
    val span = 15
    val slices = (0 until 4).map(i =>
      fixture.filter(x => x._1 >= i * span && x._1 < (i + 1) * span))
    slices.zipWithIndex.foreach { case (s, i) =>
      CurationStream.applyMicroBatch(spark, docsDf(s), d, i.toLong) }
    // the window leg must equal the batch funnel over EXACTLY the last
    // two slices' rows — with canonicality from the full stream state
    // (a window doc whose canonical twin arrived before the window is
    // near_dup in the stream; rebuild that by keeping claims global)
    val drift = CurationStream.funnelDrift(spark, d, lastK = 2).collect()
      .sortBy(_.getInt(0))
    val life = CurationStream.funnelLive(spark, d).collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getDouble(4))).toMap
    val win = CurationStream.funnelWindow(spark, d, 2).collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getDouble(4))).toMap
    for (r <- drift) {
      val idx = r.getInt(0)
      assert((r.getLong(2), r.getDouble(4)) === life(idx))
      val (nw, sw) = win.getOrElse(idx, (0L, 0.0))
      assert(r.getLong(3) === nw)
      assert(r.getDouble(5) === sw)
      assert(r.getDouble(6) === BigDecimal(sw - life(idx)._2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // fewer dirs than the window: degrades to lifetime (delta 0)
    val all = CurationStream.funnelDrift(spark, d, lastK = 99).collect()
    assert(all.forall(_.getDouble(6) === 0.0))
  }

  test("registered face ≡ the batch funnel on the real corpus") {
    assert(rows(CurationQueries.curationFunnelLive(spark, sf)) ===
      rows(CurationQueries.curationFunnel(spark, sf)),
      "streamed funnel diverged from the batch funnel")
  }
}
