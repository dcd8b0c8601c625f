package graft

import java.nio.file.Files

import graft.ops.MediaQueries
import graft.streaming._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Takedown.retentionScan]] — the RTBF end state verified on the
  * BYTES: per gate, after applyTakedown the reader views hide removed
  * rows but the physical files still reference them (the scan bites);
  * after the gate's compact() folds the tombstones, every data file
  * under the state root carries ZERO rows referencing a removed id
  * (the `removed/` suppression logs excluded by the scan's contract —
  * and gone entirely for the DedupStream-layout gates, whose compact
  * drops the td dirs). */
class RetentionAuditSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text").localCheckpoint()
  private lazy val removedDocs: DataFrame =
    docs.filter(col("doc_id") % 13 === 0).select("doc_id").localCheckpoint()
  private lazy val vecs: DataFrame = Tables.embeddings(spark, sf)
    .select("vec_id", "label", "embedding").localCheckpoint()
  private lazy val removedVecs: DataFrame =
    vecs.filter(col("vec_id") % 13 === 0).select("vec_id").localCheckpoint()

  private def referencing(st: String, removed: DataFrame): Long =
    Takedown.retentionScan(spark, st, removed).collect()
      .map(_.getLong(2)).sum

  private def audit(st: String, removed: DataFrame)(
      compact: => Unit): Unit = {
    assert(referencing(st, removed) > 0,
      "pre-compact bytes must still reference removed ids (scan bites)")
    compact
    assert(referencing(st, removed) === 0,
      "post-compact bytes still reference removed ids")
  }

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-retention-$tag").toString + "/state"

  test("exact gate: zero removed-id bytes after compact") {
    val d = fresh("exact")
    Takedown.quartiles(docs).zipWithIndex.foreach { case (b, i) =>
      DedupStream.applyMicroBatch(spark, b, d, i.toLong) }
    Takedown(spark, d, removedDocs, Takedown.Gate.Exact, 0L)
    audit(d, removedDocs)(DedupStream.compact(spark, d))
  }

  test("winnow gate: zero removed-id bytes after compact") {
    val d = fresh("winnow")
    Takedown.quartiles(docs).zipWithIndex.foreach { case (b, i) =>
      WinnowStream.applyMicroBatch(spark, b, d, i.toLong) }
    Takedown(spark, d, removedDocs, Takedown.Gate.Winnow, 0L)
    audit(d, removedDocs)(DedupStream.compact(spark, d))
  }

  test("span-scrub gate: zero removed-id bytes after compact") {
    val d = fresh("scrub")
    Takedown.quartiles(docs).zipWithIndex.foreach { case (b, i) =>
      ScrubStream.applyMicroBatch(spark, b, d, i.toLong) }
    ScrubStream.applyTakedown(spark, d, removedDocs, 0L)
    audit(d, removedDocs)(ScrubStream.compact(spark, d))
  }

  test("ann index: zero removed-id bytes after compact") {
    val d = fresh("ann") + "/index"
    AnnStream.init(spark, vecs, d)
    (0 until 4).foreach(i => AnnStream.applyMicroBatch(spark,
      vecs.filter(pmod(col("vec_id"), lit(4)) === i), d, i.toLong))
    AnnStream.applyTakedown(spark, d, removedVecs, 0L)
    audit(d, removedVecs)(AnnStream.compact(spark, d))
  }

  test("graph index: zero removed-id bytes after compact") {
    val d = fresh("graph") + "/index"
    GraphStream.init(spark, vecs, d)
    (0 until 4).foreach(i => GraphStream.applyMicroBatch(spark,
      vecs.filter(pmod(col("vec_id"), lit(4)) === i), d, i.toLong))
    GraphStream.applyTakedown(spark, d, removedVecs, 0L)
    audit(d, removedVecs)(GraphStream.compact(spark, d))
  }

  test("pair gate: zero removed-id bytes after compact") {
    val d = fresh("pairs")
    val paired = docs
      .join(MediaQueries.texturedMediaTable(spark, sf)
        .filter(col("doc_id") % 3 =!= 1), Seq("doc_id"), "left")
      .select("doc_id", "text", "payload").localCheckpoint()
    Takedown.quartiles(paired).zipWithIndex.foreach { case (b, i) =>
      PairStream.applyMicroBatch(spark, b, d, i.toLong) }
    PairStream.applyTakedown(spark, d, removedDocs, 0L)
    val before = PairStream.readVerdicts(spark, d).orderBy("doc_id")
      .collect().toSeq.map(_.toSeq)
    audit(d, removedDocs)(PairStream.compact(spark, d))
    // the new compact is behavior-preserving, and replay still no-ops
    assert(PairStream.readVerdicts(spark, d).orderBy("doc_id")
      .collect().toSeq.map(_.toSeq) === before,
      "pair compact changed the verdicts view")
    PairStream.applyMicroBatch(spark, paired, d, 0L)
    assert(PairStream.readVerdicts(spark, d).orderBy("doc_id")
      .collect().toSeq.map(_.toSeq) === before,
      "compacted-away batch id replayed")
  }
}
