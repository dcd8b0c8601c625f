package graft

import java.nio.file.Files

import graft.ops.DedupQueries
import graft.streaming.NearDupStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time streaming NEAR-dup filtering: the kept corpus is
  * pairwise near-dup-free, every drop has an earlier witness, id-ordered
  * batching equals one-shot ingestion, and replay is idempotent. */
class NearDupStreamSpec extends SparkSpec {

  import spark.implicits._

  private def documents(): DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text")

  /** ≥8-of-12 signature-agreement pairs (a < b) among `d`, via the same
    * band-candidate route the ingester uses — the independent checker. */
  private def nearDupPairs(d: DataFrame): DataFrame = {
    val sigs = DedupQueries.minhashSigsOf(d)
      .select(col("doc_id"),
        array((0 until DedupQueries.minhashK).map(k => col(s"mh$k")): _*)
          .as("sig"))
    val bands = sigs.select(col("doc_id"), col("sig"),
        explode(DedupQueries.lshBandKeys).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val agree = aggregate(
      zip_with(col("x.sig"), col("y.sig"),
        (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, m) => acc + m)
    bands.as("x").join(bands.as("y"), Seq("band", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .filter(agree >= 8)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  test("streamed near-dup ingest: kept corpus pairwise clean; drops have earlier witnesses; batching-invariant") {
    val all = documents().cache()
    // id-ordered thirds (the witness set for any doc is then identical
    // batched or one-shot: exactly the smaller-id docs)
    val cut = all.agg(max("doc_id")).first().getLong(0)
    val splits = Seq((-1L, cut / 3), (cut / 3, 2 * cut / 3), (2 * cut / 3, cut))
    val tmp = Files.createTempDirectory("graft-neardup").toString
    splits.zipWithIndex.foreach { case ((lo, hi), i) =>
      NearDupStream.applyMicroBatch(spark,
        all.filter(col("doc_id") > lo && col("doc_id") <= hi),
        s"$tmp/corpus", batchId = i.toLong)
    }
    val kept = NearDupStream.readCorpus(spark, s"$tmp/corpus").cache()
    assert(kept.count() > 0 && kept.count() < all.count(),
      "the testdata contains near-dups; some must drop, most must stay")
    // 1. kept corpus is pairwise near-dup-free
    assert(nearDupPairs(kept.select("doc_id", "text")).isEmpty,
      "no two kept documents may agree on >= 8/12 minhashes via a band")
    // 2. every dropped doc has a smaller-id near-dup witness in the input
    val dropped = all.select("doc_id")
      .join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val witnessed = nearDupPairs(all).select(col("b").as("doc_id")).distinct()
    assert(dropped.join(witnessed, Seq("doc_id"), "left_anti").isEmpty,
      "every drop needs an earlier (smaller-id) witness")
    // 3. one-shot ingestion keeps exactly the same set
    val tmp1 = Files.createTempDirectory("graft-neardup-oneshot").toString
    NearDupStream.applyMicroBatch(spark, all, s"$tmp1/corpus", batchId = 0L)
    val oneShot = NearDupStream.readCorpus(spark, s"$tmp1/corpus")
    assert(kept.select("doc_id").exceptAll(oneShot.select("doc_id")).isEmpty &&
      oneShot.select("doc_id").exceptAll(kept.select("doc_id")).isEmpty,
      "id-ordered batching must equal one-shot ingestion")
  }

  test("replaying a committed batch id is a no-op; index rows cover every processed doc") {
    val tmp = Files.createTempDirectory("graft-neardup-replay").toString
    val b = documents().filter(col("doc_id") < 100)
    val processed = b.count()
    NearDupStream.applyMicroBatch(spark, b, s"$tmp/corpus", batchId = 0L)
    val before = NearDupStream.readCorpus(spark, s"$tmp/corpus").count()
    NearDupStream.applyMicroBatch(spark, b, s"$tmp/corpus", batchId = 0L)
    assert(NearDupStream.readCorpus(spark, s"$tmp/corpus").count() === before)
    // the index holds exactly lshBands rows per PROCESSED doc — dropped
    // docs stay indexed as cross-batch witnesses (kept ⊂ indexed)
    val idx = NearDupStream.readIndex(spark, s"$tmp/corpus")
    assert(idx.count() === processed * DedupQueries.lshBands)
    assert(idx.select("doc_id").distinct().count() === processed)
  }

  test("ingest during a live compaction lock fails loudly (shared DedupStream layout)") {
    import graft.streaming.{CompactionLock, StreamFs}
    val d = Files.createTempDirectory("graft-ndstream-lk").toString + "/c"
    val docs = documents().limit(5)
    NearDupStream.applyMicroBatch(spark, docs, d, 0L)
    StreamFs.writeAtomicString(d + ".clock", "")
    intercept[IllegalStateException](
      NearDupStream.applyMicroBatch(spark, docs, d, 1L))
    StreamFs.touchAt(d + ".clock",
      System.currentTimeMillis() - CompactionLock.StaleMs - 1000)
    NearDupStream.applyMicroBatch(spark, docs, d, 1L) // stale ⇒ proceeds
  }

  test("cross-batch near-dup chains drop via an indexed-but-dropped witness") {
    // chain A~B (same batch: B drops) then C~B in a LATER batch: C must
    // still drop even though its witness B never reached the corpus —
    // the semantics that make id-ordered batching equal one-shot
    // ingestion for chains that straddle a batch boundary
    val tmp = Files.createTempDirectory("graft-neardup-chain").toString
    val base = "the quick brown fox jumps over the lazy dog again and again " * 8
    val a = base + "tail one alpha"
    val bTxt = base + "tail one beta"
    val cTxt = base + "tail one betz"
    val b1 = Seq((1L, a), (2L, bTxt)).toDF("doc_id", "text")
    val b2 = Seq((3L, cTxt)).toDF("doc_id", "text")
    // preflight: the fixture must actually chain A~B and B~C
    val pairs = nearDupPairs(b1.unionByName(b2)).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)),
      s"fixture must chain 1~2 and 2~3, got $pairs")
    NearDupStream.applyMicroBatch(spark, b1, s"$tmp/corpus", batchId = 0L)
    NearDupStream.applyMicroBatch(spark, b2, s"$tmp/corpus", batchId = 1L)
    val kept = NearDupStream.readCorpus(spark, s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    // one-shot over the union keeps the same set
    val tmp1 = Files.createTempDirectory("graft-neardup-chain-oneshot").toString
    NearDupStream.applyMicroBatch(spark, b1.unionByName(b2),
      s"$tmp1/corpus", batchId = 0L)
    val oneShot = NearDupStream.readCorpus(spark, s"$tmp1/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === oneShot, "batching must equal one-shot across the chain")
    assert(kept === Set(1L), "2 drops via 1; 3 drops via the dropped 2")
  }
}
