package graft

import java.nio.file.Files

import graft.functions.TextFunctions.md5Long
import graft.streaming.DedupStream
import org.apache.spark.sql.functions._

/** The ingestion-time streaming dedup: corpus uniqueness across arbitrary
  * batch interleavings, idempotent replay, crash-orphan recovery. */
class DedupStreamSpec extends SparkSpec {

  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  test("streamed ingest keeps exactly the batch-dedup canonical set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-dedupstream").toString
    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.start(spark,
      mem.toDF().toDF("doc_id", "text"), s"$tmp/corpus", s"$tmp/ckpt")
    try {
      // batch 1 has a WITHIN-batch dup (2 ≡ 5); batch 2 re-sends content
      // already ingested (7 ≡ 1) plus novel docs; batch 3 is all dupes
      mem.addData(doc(1, "alpha"), doc(2, "beta"), doc(5, "beta"), doc(3, "gamma"))
      q.processAllAvailable()
      mem.addData(doc(7, "alpha"), doc(8, "delta"), doc(9, "epsilon"))
      q.processAllAvailable()
      mem.addData(doc(10, "beta"), doc(11, "gamma"), doc(12, "delta"))
      q.processAllAvailable()
    } finally q.stop()
    val corpus = DedupStream.readCorpus(spark, s"$tmp/corpus")
    // exactly one doc per distinct content, the minimum id that arrived
    // in the earliest batch containing that content
    val got = corpus.select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (8L, "delta"), (9L, "epsilon")))
    // the index is exactly the corpus's hash set
    val idx = DedupStream.readIndex(spark, s"$tmp/corpus")
    val corpusHashes = corpus.select("content_hash").as[Long].collect().sorted
    assert(idx.select("content_hash").as[Long].collect().sorted
      .sameElements(corpusHashes))
    // and hashes really are the canonical 60-bit content hash
    val recomputed = corpus
      .filter(col("content_hash") =!= md5Long(col("text"))).count()
    assert(recomputed === 0)
  }

  test("replaying a committed batch id is a no-op") {
    val tmp = Files.createTempDirectory("graft-dedupstream-replay").toString
    val b = Seq(doc(1, "a"), doc(2, "b")).toDF("doc_id", "text")
    DedupStream.applyMicroBatch(spark, b, s"$tmp/corpus", batchId = 0L)
    val before = DedupStream.readCorpus(spark, s"$tmp/corpus").count()
    DedupStream.applyMicroBatch(spark, b, s"$tmp/corpus", batchId = 0L)
    assert(DedupStream.readCorpus(spark, s"$tmp/corpus").count() === before)
  }

  test("an orphan index dir (crash between writes) is swept, then re-ingested") {
    val tmp = Files.createTempDirectory("graft-dedupstream-crash").toString
    val corpusDir = s"$tmp/corpus"
    DedupStream.applyMicroBatch(spark,
      Seq(doc(1, "a")).toDF("doc_id", "text"), corpusDir, batchId = 0L)
    // simulate the crash window: batch 1's index committed, corpus not
    Seq((99L, 123L)).toDF("content_hash", "doc_id")
      .write.parquet(s"$corpusDir/index/batch=1")
    // a hash that never reached the corpus must not block future ingest
    DedupStream.recover(corpusDir)
    assert(!new java.io.File(s"$corpusDir/index/batch=1").exists())
    DedupStream.applyMicroBatch(spark,
      Seq(doc(4, "b")).toDF("doc_id", "text"), corpusDir, batchId = 1L)
    val got = DedupStream.readCorpus(spark, corpusDir)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 4L))
  }
}
