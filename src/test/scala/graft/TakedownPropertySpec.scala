package graft

import java.nio.file.Files

import graft.streaming.{DedupStream, ScrubStream, Takedown}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based takedown invariants: for ARBITRARY duplicate-heavy
  * corpora, arbitrary contiguous batchings, and arbitrary (stacked)
  * removal sets — including never-ingested ids — the post-takedown
  * view must equal a from-scratch ingest of the survivors, before AND
  * after the physical compact fold, with a compact interleaved between
  * stacked takedowns (the maintenance schedule a deployment actually
  * runs). Covers the whole-doc exact gate and the span-restitution
  * scrub gate — the two removal semantics (re-election vs
  * restitution). Deterministic scalacheck sampling, the
  * [[Scd2PropertySpec]] harness. */
class TakedownPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[T](gen: Gen[T], n: Int)(body: T => Unit): Unit = {
    var seed = Seed(4242L)
    (0 until n).foreach { _ =>
      body(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  /** 6 phrases of 16 distinct tokens each — one full scrub span per
    * phrase, so repeated phrases collide at both the doc grain (exact
    * dedup of identical 2-phrase docs) and the span grain. */
  private def phrase(i: Int): String =
    (0 until 16).map(j => s"t${i}_$j").mkString(" ")

  private case class Sample(docs: Seq[(Long, String)], parts: Int,
                            removals: Seq[Set[Long]])

  private val genSample: Gen[Sample] = for {
    n <- Gen.choose(4, 24)
    pairs <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 5)))
    parts <- Gen.choose(1, 4)
    nTd <- Gen.choose(1, 2)
    removals <- Gen.listOfN(nTd,
      Gen.listOf(Gen.choose(0L, (n + 4).toLong)).map(_.toSet))
  } yield Sample(
    pairs.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, phrase(a) + " " + phrase(b)) },
    parts, removals)

  private def batchesOf(docs: Seq[(Long, String)],
                        parts: Int): Seq[Seq[(Long, String)]] = {
    val sorted = docs.sortBy(_._1)
    (0 until parts).map(i => sorted.slice(
      i * sorted.length / parts, (i + 1) * sorted.length / parts))
  }

  private def df(rows: Seq[(Long, String)]): DataFrame =
    if (rows.isEmpty)
      spark.range(0).select(col("id").as("doc_id"), lit("").as("text"))
    else rows.toDF("doc_id", "text")

  private def rowsOf(d: DataFrame): Seq[Seq[Any]] =
    d.collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-tdprop-$tag").toString + "/c"

  private def runGate(tag: String,
      ingest: (DataFrame, String, Long) => Unit,
      read: String => DataFrame,
      takedown: (String, Set[Long], Long) => Unit,
      compact: String => Unit): Unit =
    forSamples(genSample, 6) { s =>
      val live = fresh(tag)
      batchesOf(s.docs, s.parts).zipWithIndex.foreach { case (b, i) =>
        ingest(df(b), live, i.toLong) }
      // apply removals with a compact interleaved between stacked tds
      s.removals.zipWithIndex.foreach { case (r, i) =>
        takedown(live, r, i.toLong)
        if (i == 0 && s.removals.length > 1) compact(live)
      }
      val got = rowsOf(read(live))
      // from-scratch twin: same batch boundaries over the survivors
      val removedAll = s.removals.reduce(_ ++ _)
      val rebuild = fresh(tag + "-rb")
      batchesOf(s.docs, s.parts).zipWithIndex.foreach { case (b, i) =>
        ingest(df(b.filterNot(d => removedAll(d._1))), rebuild, i.toLong) }
      val want = rowsOf(read(rebuild))
      assert(got === want,
        s"$tag view diverged from survivors rebuild " +
          s"(n=${s.docs.length}, parts=${s.parts}, rm=${s.removals})")
      compact(live)
      assert(rowsOf(read(live)) === want,
        s"$tag compact fold diverged (rm=${s.removals})")
    }

  test("exact gate: arbitrary removals replay the survivors, pre and " +
      "post compact") {
    runGate("exact",
      (b, d, i) => DedupStream.applyMicroBatch(spark, b, d, i),
      d => DedupStream.readCorpus(spark, d).select("doc_id", "text"),
      (d, r, i) => Takedown(spark, d,
        r.toSeq.toDF("doc_id"), Takedown.Gate.Exact, i),
      d => DedupStream.compact(spark, d))
  }

  test("scrub gate: arbitrary removals restitute spans like the " +
      "survivors rebuild, pre and post compact") {
    runGate("scrub",
      (b, d, i) => ScrubStream.applyMicroBatch(spark, b, d, i),
      d => ScrubStream.readCorpus(spark, d),
      (d, r, i) => ScrubStream.applyTakedown(spark, d,
        r.toSeq.toDF("doc_id"), i),
      d => ScrubStream.compact(spark, d))
  }
}
