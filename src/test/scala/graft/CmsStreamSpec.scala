package graft

import java.nio.file.Files

import graft.functions.TextFunctions.tokens
import graft.ops.ProfileQueries
import graft.streaming.CmsStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming CMS: the merged per-batch cells equal the one-shot batch
  * sketch EXACTLY (linearity is the commit protocol), estimates keep the
  * one-sided guarantee across the merge, and replay/crash recovery hold. */
class CmsStreamSpec extends SparkSpec {

  private def documents(): DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text")

  private def cellMap(df: DataFrame): Map[(Int, Long), Long] =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("stream-merged cells ≡ one-shot sketch; estimate stays one-sided") {
    val all = documents().cache()
    val cut = all.agg(max("doc_id")).first().getLong(0)
    val splits = Seq((-1L, cut / 3), (cut / 3, 2 * cut / 3), (2 * cut / 3, cut))
      .map { case (lo, hi) =>
        all.filter(col("doc_id") > lo && col("doc_id") <= hi) }
    val tmp = Files.createTempDirectory("graft-cms").toString
    splits.zipWithIndex.foreach { case (b, i) =>
      CmsStream.applyMicroBatch(spark, b, tmp, batchId = i.toLong)
    }
    val toks = all.select(explode(tokens(col("text"))).as("token"))
    val oneShot = cellMap(ProfileQueries.cmsCells(toks))
    assert(cellMap(CmsStream.readSketch(spark, tmp)) === oneShot)
    // one-sided point-query guarantee against the merged sketch, for
    // EVERY distinct token of the whole corpus
    val exact = toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
    val est = CmsStream.estimate(spark, tmp, exact.select("token"))
    val viol = exact.join(est, Seq("token"))
      .filter(col("n_est") < col("n_exact"))
    assert(viol.isEmpty, "merged CMS must never underestimate")
    // a never-seen token estimates exactly 0
    import spark.implicits._
    val ghost = CmsStream.estimate(spark, tmp,
      Seq("zz-ghost-token").toDF("token")).collect()
    assert(ghost.length === 1 && ghost(0).getLong(1) === 0L)
    all.unpersist()
    ()
  }

  test("takedown subtracts a batch exactly; compact folds it physically") {
    val all = documents().cache()
    val cut = all.agg(max("doc_id")).first().getLong(0)
    val splits = Seq((-1L, cut / 3), (cut / 3, 2 * cut / 3), (2 * cut / 3, cut))
      .map { case (lo, hi) =>
        all.filter(col("doc_id") > lo && col("doc_id") <= hi) }
    val tmp = Files.createTempDirectory("graft-cms-td").toString
    splits.zipWithIndex.foreach { case (b, i) =>
      CmsStream.applyMicroBatch(spark, b, tmp, batchId = i.toLong)
    }
    CmsStream.applyTakedown(spark, tmp, Seq(1L), takedownId = 0L)
    // post-takedown sketch ≡ a from-scratch sketch over the SURVIVING
    // batches' docs (linearity: exclusion IS subtraction)
    val survToks = splits(0).union(splits(2))
      .select(explode(tokens(col("text"))).as("token"))
    val fromScratch = cellMap(ProfileQueries.cmsCells(survToks))
    val after = cellMap(CmsStream.readSketch(spark, tmp))
    assert(after === fromScratch,
      "post-takedown sketch must equal a survivors-only rebuild")
    // idempotent replay
    CmsStream.applyTakedown(spark, tmp, Seq(1L), takedownId = 0L)
    assert(cellMap(CmsStream.readSketch(spark, tmp)) === after)
    // compact: same merged cells through the same reader, td dirs gone,
    // the removed batch's cells physically absent from the staged root
    CmsStream.compact(spark, tmp)
    assert(cellMap(CmsStream.readSketch(spark, tmp)) === after)
    assert(!new java.io.File(s"$tmp/takedown").exists() ||
      new java.io.File(s"$tmp/takedown").listFiles().forall(
        !_.getName.startsWith("td=")))
    // ingest continues; the compacted + new cells still merge linearly
    CmsStream.applyMicroBatch(spark, splits(1), tmp, batchId = 3L)
    val allToks = splits(0).union(splits(2)).union(splits(1))
      .select(explode(tokens(col("text"))).as("token"))
    assert(cellMap(CmsStream.readSketch(spark, tmp)) ===
      cellMap(ProfileQueries.cmsCells(allToks)))
    all.unpersist()
    ()
  }

  test("replay is a no-op; marker-less crash debris is swept") {
    val tmp = Files.createTempDirectory("graft-cms-replay").toString
    val b = documents().filter(col("doc_id") < 50).cache()
    CmsStream.applyMicroBatch(spark, b, tmp, batchId = 0L)
    val before = cellMap(CmsStream.readSketch(spark, tmp))
    CmsStream.applyMicroBatch(spark, b, tmp, batchId = 0L)
    assert(cellMap(CmsStream.readSketch(spark, tmp)) === before)
    // a crashed (marker-less) batch dir must be ignored and swept
    val orphanToks = b.limit(1).select(lit("orphan").as("token"))
    ProfileQueries.cmsCells(orphanToks)
      .write.mode("overwrite").parquet(s"$tmp/cells/batch=9")
    assert(cellMap(CmsStream.readSketch(spark, tmp)) === before,
      "uncommitted cells must not contribute to the merged sketch")
    CmsStream.recover(tmp)
    assert(!graft.streaming.StreamFs.exists(s"$tmp/cells/batch=9"))
    b.unpersist()
    ()
  }
}
