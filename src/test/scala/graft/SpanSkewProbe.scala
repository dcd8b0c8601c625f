package graft

import graft.ops.PrepQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only HOT-SPAN skew probe for the exact-span scrub:
  *
  *   sbt 'Test/runMain graft.SpanSkewProbe <sfDir> [hotFrac=0.2]'
  *
  * Real corpora carry BOILERPLATE spans (license headers, cookie
  * banners, templated footers) repeated across a large fraction of all
  * documents — the span-hash analogue of the media family's
  * all-black-thumbnail class. This probe PLANTS one: a fixed
  * boilerplate span appended to every ⌈1/hotFrac⌉-th document, then
  * times the scrub's first-occurrence step both ways on the same
  * planted corpus:
  *
  *   - window:   row_number over (partition by h) — every row of the
  *     hot hash lands in ONE window partition: a single reducer owns
  *     hotFrac of the corpus, and no optimizer can split a window
  *     group (the formulation shipped through round 14's first half);
  *   - agg+join: groupBy(h).min(struct(doc_id, span_idx)) — map-side
  *     partial min collapses the hot group to one row per input
  *     partition BEFORE the shuffle — then an equi-join back that AQE
  *     can skew-split. Semantically identical (lexicographic min ≡
  *     rank-1 of the same order); PrepSpec pins the scrub against
  *     brute force either way.
  *
  * Prints min-of-2 wall seconds per formulation; BASELINE.md records
  * the cells. */
object SpanSkewProbe {

  /** The round-14-first-half formulation, kept HERE (test scope) only
    * as the probe's baseline arm. */
  private def firstOccurrenceWindow(spans: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("span_idx"))
    spans.withColumn("keep_span", row_number().over(w) === 1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/x10"
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.2
    val every = math.max(1L, math.round(1.0 / hotFrac))
    val spark = GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val boiler = (1 to PrepQueries.scrubSpanLen).map(i => s"boiler$i")
      .mkString(" ")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .withColumn("text",
        when(col("doc_id") % every === 0,
          concat(col("text"), lit(" " + boiler))).otherwise(col("text")))
      .localCheckpoint()
    val n = docs.count()
    println(s"[spanskew] $sfDir: $n docs, boilerplate span on every " +
      s"${every}th doc (~${100 / every}% hot-span mass)")

    def time(tag: String, mk: DataFrame => DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        PrepQueries.scrubAssemble(mk(PrepQueries.spansOf(docs)))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warmup
      val best = Seq(run(), run()).min
      println(f"[spanskew] $tag min=$best%.2f s")
    }
    time("window  (single-reducer hot group)", firstOccurrenceWindow)
    time("agg+join (map-side combined min)   ",
      sp => PrepQueries.firstOccurrence(sp))
    spark.stop()
  }
}
