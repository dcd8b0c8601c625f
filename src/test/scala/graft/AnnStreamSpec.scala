package graft

import java.nio.file.Files

import graft.streaming.AnnStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming IVF-PQ index maintenance: batch-count invariance (the index
  * and its query results don't depend on how ingestion was batched),
  * idempotent replay, live-index queries equal a batch rebuild, and
  * crash-debris sweep — the contracts that make an incrementally
  * maintained ANN index trustworthy. */
class AnnStreamSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(): DataFrame =
    Tables.embeddings(spark, sf).select("vec_id", "embedding")

  private def queries(): DataFrame =
    Tables.embeddings(spark, sf).filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))

  private def results(indexDir: String): Set[(Long, Int, Long, Double)] =
    AnnStream.search(spark, queries(), indexDir)
      .as[(Long, Int, Long, Double)].collect().toSet

  test("batched ingestion equals one-shot rebuild: same index, same search results") {
    val all = corpus().cache()
    val tmp3 = Files.createTempDirectory("graft-ann-3b").toString + "/index"
    AnnStream.init(spark, all, tmp3)
    Seq((-1L, 150L), (150L, 350L), (350L, Long.MaxValue)).zipWithIndex
      .foreach { case ((lo, hi), i) =>
        AnnStream.applyMicroBatch(spark,
          all.filter(col("vec_id") > lo && col("vec_id") <= hi), tmp3, i.toLong)
      }
    val tmp1 = Files.createTempDirectory("graft-ann-1b").toString + "/index"
    AnnStream.init(spark, all, tmp1)
    AnnStream.applyMicroBatch(spark, all, tmp1, 0L)
    // the coded corpus is identical vector-for-vector
    def codedSet(d: String) = AnnStream.readCoded(spark, d)
      .select(col("vec_id"), col("cell"),
        concat_ws(",", col("codes").cast("array<string>")).as("c"))
      .as[(Long, Long, String)].collect().toSet
    assert(codedSet(tmp3) === codedSet(tmp1),
      "cell assignment and codes must not depend on batch boundaries")
    assert(codedSet(tmp3).size === all.count(),
      "every ingested vector is in the index exactly once")
    // and so are the search results over the live index
    val r3 = results(tmp3)
    assert(r3 === results(tmp1),
      "queries over the live index must equal a batch rebuild")
    assert(r3.nonEmpty && r3.map(_._1).size >= 1)
    // self-retrieval sanity: most queries find themselves at rank 1
    // (ADC distance of a vector to its own code is the subspace residual,
    // near-minimal by construction)
    val selfTop = r3.filter(r => r._2 === 1 && r._1 === r._3)
    assert(selfTop.size * 2 > r3.map(_._1).toSeq.distinct.size,
      s"most queries should self-retrieve at rank 1, got ${selfTop.size}")
  }

  test("bench-only prebuilt twin equals the per-run annIvfPq rebuild row-for-row") {
    import graft.ops.SimilarityQueries
    val rebuild = SimilarityQueries.annIvfPq(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSet
    val prebuilt = AnnStream.annIvfPqPrebuilt(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(prebuilt === rebuild,
      "steady-state index search must return the rebuild query's results")
    // memoization: a second call reuses the same index directory
    val again = AnnStream.annIvfPqPrebuilt(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(again === rebuild)
  }

  test("committed-index recall report equals the rebuilt report when fresh") {
    import graft.ops.SimilarityQueries
    // the monitor-the-monitor gap closed: same recallOf tail, committed
    // index instead of a per-run rebuild — on a fresh index the two are
    // row-for-row equal (the prebuilt twin is search-equal to annIvfPq)
    val exact = SimilarityQueries.annBruteForce(spark, sf)
      .select("q", "neighbor")
    val rebuilt = SimilarityQueries.recallOf(exact,
        SimilarityQueries.annIvfPq(spark, sf).select("q", "neighbor"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val committed = AnnStream.annRecallReportPrebuilt(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(committed === rebuilt,
      "fresh committed index must report the rebuild's recall")
  }

  test("takedown purges codes; post-takedown index == survivors-only ingest; compact folds") {
    val all = corpus().cache()
    val removed = all.filter(col("vec_id") % 13 === 0).select("vec_id")
      .localCheckpoint()
    val td = Files.createTempDirectory("graft-ann-td").toString + "/index"
    AnnStream.init(spark, all, td)
    (0 until 3).foreach(i => AnnStream.applyMicroBatch(spark,
      all.filter(pmod(col("vec_id"), lit(3)) === i), td, i.toLong))
    AnnStream.applyTakedown(spark, td, removed, takedownId = 0L)
    def codedSet(d: String) = AnnStream.readCoded(spark, d)
      .select(col("vec_id"), col("cell"),
        concat_ws(",", col("codes").cast("array<string>")).as("c"))
      .as[(Long, Long, String)].collect().toSet
    // same meta, survivors-only ingest from scratch — identical index
    val fresh = Files.createTempDirectory("graft-ann-td-fresh").toString +
      "/index"
    AnnStream.init(spark, all, fresh) // train-once: same full bootstrap
    AnnStream.applyMicroBatch(spark,
      all.join(removed, Seq("vec_id"), "left_anti"), fresh, 0L)
    val after = codedSet(td)
    assert(after === codedSet(fresh),
      "post-takedown coded corpus must equal a survivors-only rebuild")
    assert(after.forall(_._1 % 13 != 0), "removed vectors' codes must purge")
    // idempotent replay
    AnnStream.applyTakedown(spark, td, removed, takedownId = 0L)
    assert(codedSet(td) === after)
    // compact folds physically: same view, no td dirs, and the staged
    // parquet genuinely carries no removed vector's codes
    AnnStream.compact(spark, td)
    assert(codedSet(td) === after)
    assert(!new java.io.File(s"$td/takedown").exists() ||
      new java.io.File(s"$td/takedown").listFiles().forall(
        !_.getName.startsWith("td=")))
    val raw = spark.read.parquet(s"$td/coded/batch=2")
      .select("vec_id").as[Long].collect().toSet
    assert(raw.forall(_ % 13 != 0), "the physical fold must drop removed rows")
    // ingest continues after compaction
    AnnStream.applyMicroBatch(spark, all.limit(0), td, 3L)
  }

  test("replaying a committed batch id is a no-op; crash debris is swept") {
    val all = corpus()
    val tmp = Files.createTempDirectory("graft-ann-replay").toString + "/index"
    AnnStream.init(spark, all, tmp)
    AnnStream.applyMicroBatch(spark, all.filter(col("vec_id") <= 250), tmp, 0L)
    val before = AnnStream.readCoded(spark, tmp).count()
    AnnStream.applyMicroBatch(spark, all.filter(col("vec_id") <= 250), tmp, 0L)
    assert(AnnStream.readCoded(spark, tmp).count() === before)
    // an unmarked coded dir (crash between write and marker) is invisible
    // to readers and swept by recover
    Seq((9999L, 0L, Seq(0, 0, 0, 0))).toDF("vec_id", "cell", "codes")
      .write.parquet(s"$tmp/coded/batch=7/cell=0")
    assert(AnnStream.readCoded(spark, tmp).count() === before,
      "uncommitted batch dirs must not be readable")
    AnnStream.recover(tmp)
    assert(!new java.io.File(s"$tmp/coded/batch=7").exists())
    // re-init is a no-op (meta committed)
    AnnStream.init(spark, all, tmp)
    assert(AnnStream.readCoded(spark, tmp).count() === before)
  }
}
