package graft

import java.nio.file.{Files, Paths}

import graft.sources.JsonlCorpus
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL interchange: round-trip fidelity, shard size bounds, and
  * parse-failure routing (the NiFi record reader/writer parity surface). */
class JsonlCorpusSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("documents round-trip JSONL bit-for-bit") {
    val tmp = Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sf)
    JsonlCorpus.write(docs, s"$tmp/corpus")
    val back = JsonlCorpus.read(spark, s"$tmp/corpus", docSchema)
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("maxRecordsPerFile bounds every shard") {
    val tmp = Files.createTempDirectory("graft-jsonl-shards").toString
    JsonlCorpus.write(Tables.documents(spark, sf), s"$tmp/corpus",
      maxRecordsPerFile = 100L)
    val files = Files.list(Paths.get(s"$tmp/corpus")).toArray.map(_.toString)
      .filter(f => f.endsWith(".txt"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.text(f).count()
      assert(n <= 100, s"shard $f holds $n rows > 100")
    }
    // shards jointly hold the whole corpus
    val total = spark.read.text(s"$tmp/corpus").count()
    assert(total === Tables.documents(spark, sf).count())
  }

  test("malformed lines route to rejects instead of failing the read") {
    val tmp = Files.createTempDirectory("graft-jsonl-bad").toString
    JsonlCorpus.write(Tables.documents(spark, sf).limit(5), s"$tmp/corpus")
    // corrupt the corpus: append a truncated line and a non-JSON line
    Files.write(Paths.get(s"$tmp/corpus/part-corrupt.txt"),
      "{\"doc_id\": 999, \"text\":\nnot json at all".getBytes)
    val (good, bad) = JsonlCorpus.readWithRejects(spark, s"$tmp/corpus", docSchema)
    assert(good.count() === 5)
    assert(bad.count() === 2)
    assert(good.filter(col("doc_id") === 999).isEmpty)
  }
}
