package graft

import graft.ops.PrepQueries
import org.apache.spark.sql.functions._

/** Sequence packing (concat-and-chunk): the distributed two-pass
  * prefix sum equals the brute single-window cumsum bit for bit,
  * placement is a partition of the token stream (every bin but the
  * last exactly full), and zero-token documents stay addressable. */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private val C = PrepQueries.packContextLen

  test("distributed prefix ≡ brute global-window cumsum; stream partition") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.tokens
    val got = PrepQueries.sequencePack(spark, sf)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val nt = Tables.documents(spark, sf).select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    val brute = nt.withColumn("start",
        coalesce(sum(col("n_tokens")).over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("first_bin", expr(s"start div $C"))
      .withColumn("last_bin", expr(s"(start + greatest(n_tokens,1) - 1) div $C"))
      .withColumn("n_bins", col("last_bin") - col("first_bin") + 1)
      .select("doc_id", "n_tokens", "start", "first_bin", "last_bin", "n_bins")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(got === brute,
      "two-pass distributed prefix diverged from the global window")
    // offsets partition the stream: each start = previous start + n
    val rows = got.map(r => (r(2).asInstanceOf[Long], r(1).asInstanceOf[Long]))
    rows.sliding(2).foreach {
      case Seq((s1, n1), (s2, _)) => assert(s2 === s1 + n1)
      case _ => ()
    }
  }

  test("manifest conserves tokens; every bin but the last is exactly full") {
    val pack = PrepQueries.sequencePack(spark, sf).collect()
    val man = PrepQueries.packManifest(spark, sf)
      .orderBy("bin_id").collect()
    val totalTokens = pack.map(_.getLong(1)).sum
    assert(man.map(_.getLong(2)).sum === totalTokens,
      "manifest token sum must equal the corpus token count")
    assert(man.map(_.getLong(1)).sum === pack.map(_.getLong(5)).sum,
      "manifest doc-span sum must equal the pack table's n_bins sum")
    val lastBin = man.last.getLong(0)
    man.foreach { r =>
      val (bin, toks) = (r.getLong(0), r.getLong(2))
      if (bin < lastBin) assert(toks === C,
        s"bin $bin not full: $toks") // contiguous stream ⇒ interior full
      else assert(toks <= C)
    }
    assert(man.exists(_.getLong(4) > 0),
      "fixture must contain boundary-straddling docs")
  }

  test("zero-token docs attach to their offset's bin; straddlers span") {
    val d = Seq(
      (1L, Seq.fill(300)("a").mkString(" ")), // bins 0..1
      (2L, ""),                               // zero tokens at offset 300
      (3L, Seq.fill(10)("b").mkString(" ")),  // 300..309, bin 1
      (4L, Seq.fill(210)("c").mkString(" "))  // 310..519, bins 1..2
    ).toDF("doc_id", "text")
    val got = PrepQueries.packOf(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, 300L, 0L, 0L, 1L, 2L),
      (2L, 0L, 300L, 1L, 1L, 1L),
      (3L, 10L, 300L, 1L, 1L, 1L),
      (4L, 210L, 310L, 1L, 2L, 2L)))
  }
}
