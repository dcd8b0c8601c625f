package graft

import java.nio.file.Files

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
    val corpusHashes = corpus.select("content_hash").as[String].collect().sorted
    assert(idx.select("content_hash").as[String].collect().sorted
      .sameElements(corpusHashes))
    // and hashes really are the full 128-bit md5 content hash
    val recomputed = corpus
      .filter(col("content_hash") =!= md5(col("text"))).count()
    assert(recomputed === 0)
  }

  test("compaction collapses batch dirs, preserves content, replay and ingest continue") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft-dedup-compact").toString
    val corpus = s"$tmp/corpus"
    Seq(
      Seq(doc(1, "alpha"), doc(2, "beta")),
      Seq(doc(3, "gamma"), doc(4, "beta")), // 4 dups 2
      Seq(doc(5, "delta"))
    ).zipWithIndex.foreach { case (b, i) =>
      DedupStream.applyMicroBatch(spark, b.toDF("doc_id", "text"),
        corpus, batchId = i.toLong)
    }
    val before = DedupStream.readCorpus(spark, corpus)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    val idxBefore = DedupStream.readIndex(spark, corpus)
      .as[(String, Long, Long)].collect().toSet
    DedupStream.compact(spark, corpus)
    // content identical, through the same readers
    assert(DedupStream.readCorpus(spark, corpus)
      .select("doc_id", "text").as[(Long, String)].collect().toSet === before)
    assert(DedupStream.readIndex(spark, corpus)
      .as[(String, Long, Long)].collect().toSet === idxBefore)
    // exactly one batch dir still holds files; the rest are empty markers
    def dataDirs(sub: String) = new java.io.File(s"$corpus/$sub").listFiles()
      .filter(_.getName.startsWith("batch=")).toSeq
      .filter(_.listFiles().exists(_.getName.endsWith(".parquet")))
    assert(dataDirs("docs").size === 1 && dataDirs("index").size === 1)
    // replaying an already-committed (now marker) batch id stays a no-op
    DedupStream.applyMicroBatch(spark,
      Seq(doc(1, "alpha"), doc(2, "beta")).toDF("doc_id", "text"),
      corpus, batchId = 0L)
    assert(DedupStream.readCorpus(spark, corpus).count() === before.size)
    // new batches keep deduping against the compacted index
    DedupStream.applyMicroBatch(spark,
      Seq(doc(6, "alpha"), doc(7, "zeta")).toDF("doc_id", "text"),
      corpus, batchId = 3L)
    val after = DedupStream.readCorpus(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(after === before.map(_._1) + 7L, "6 dups 1; 7 is novel")
    // interrupted swap (root renamed aside, stage not yet in) rolls back
    val cold = new java.io.File(corpus + ".cold")
    assert(new java.io.File(corpus).renameTo(cold))
    DedupStream.recover(corpus)
    assert(new java.io.File(corpus).exists() && !cold.exists())
    assert(DedupStream.readCorpus(spark, corpus).count() === after.size)
  }

  test("a live compaction lock blocks ingest loudly; a stale one doesn't") {
    import graft.streaming.{CompactionLock, StreamFs}
    val d = Files.createTempDirectory("graft-dedupstream-lk").toString + "/c"
    DedupStream.applyMicroBatch(spark,
      Seq(doc(1, "alpha")).toDF("doc_id", "text"), d, 0L)
    StreamFs.writeAtomicString(d + ".clock", "")
    intercept[IllegalStateException](DedupStream.applyMicroBatch(spark,
      Seq(doc(2, "beta")).toDF("doc_id", "text"), d, 1L))
    intercept[java.io.IOException](DedupStream.compact(spark, d))
    // dead holder: no heartbeat for StaleMs ⇒ both paths proceed
    StreamFs.touchAt(d + ".clock",
      System.currentTimeMillis() - CompactionLock.StaleMs - 1000)
    DedupStream.applyMicroBatch(spark,
      Seq(doc(2, "beta")).toDF("doc_id", "text"), d, 1L)
    DedupStream.compact(spark, d)
    assert(!StreamFs.exists(d + ".clock"), "lock released after compact")
    assert(DedupStream.readCorpus(spark, d).count() === 2)
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
    Seq(("no-corpus-twin", 123L)).toDF("content_hash", "doc_id")
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
