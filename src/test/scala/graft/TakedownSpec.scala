package graft

import java.nio.file.Files

import graft.ops.MediaQueries
import graft.streaming.{DedupStream, MediaStream, NearDupStream, Takedown,
  UrlStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Takedown/RTBF propagation through the dedup claims: the contract is
  * REPLAY EQUIVALENCE — after `Takedown.apply(removals)`, every gate's
  * kept corpus equals a from-scratch ingest of the surviving arrivals
  * (re-election hands a removed canonical's claim to the doc a fresh
  * run would have kept), removed docs stop witnessing, promoted docs
  * re-enter the exact-key indexes, the operation is idempotent per
  * takedown id, and compaction folds the tombstones physically without
  * changing the view. */
class TakedownSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/corpus"

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  private def docsOf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // ---- near-dup gate: replay equivalence on the real corpus ----------

  test("near-dup gate: post-takedown corpus == from-scratch ingest of survivors") {
    val all = Tables.documents(spark, sf).select("doc_id", "text")
      .localCheckpoint()
    val cut = all.agg(max("doc_id")).first().getLong(0)
    val dir = tmp("graft-td-neardup")
    Seq((-1L, cut / 3), (cut / 3, 2 * cut / 3), (2 * cut / 3, cut))
      .zipWithIndex.foreach { case ((lo, hi), i) =>
        NearDupStream.applyMicroBatch(spark,
          all.filter(col("doc_id") > lo && col("doc_id") <= hi), dir,
          i.toLong)
      }
    val removals = all.filter(col("doc_id") % 13 === 0).select("doc_id")
    Takedown(spark, dir, removals, Takedown.Gate.NearDup, takedownId = 0L)
    val after = ids(NearDupStream.readCorpus(spark, dir))
    // from-scratch: one-shot ingest of the survivors into a fresh dir
    val fresh = tmp("graft-td-neardup-fresh")
    NearDupStream.applyMicroBatch(spark,
      all.join(removals, Seq("doc_id"), "left_anti"), fresh, 0L)
    val replay = ids(NearDupStream.readCorpus(spark, fresh))
    assert(after === replay,
      s"diverged: only-takedown=${(after -- replay).toSeq.sorted.take(5)} " +
        s"only-replay=${(replay -- after).toSeq.sorted.take(5)}")
    // the takedown genuinely promoted something (the corpus has near-dup
    // classes crossing the removal stride) and removed docs are gone
    assert(after.intersect(ids(removals)).isEmpty, "removed ids must purge")
  }

  // ---- exact gate: promotion, suppression, chained takedowns ----------

  test("exact gate: claim re-election, index re-entry, chained takedowns") {
    val dir = tmp("graft-td-exact")
    DedupStream.applyMicroBatch(spark,
      docsOf(1L -> "xx", 2L -> "yy", 3L -> "zz"), dir, 0L)
    DedupStream.applyMicroBatch(spark,
      docsOf(5L -> "xx", 6L -> "yy", 9L -> "xx"), dir, 1L)
    assert(ids(DedupStream.readCorpus(spark, dir)) === Set(1L, 2L, 3L))
    // remove the "xx" canonical: the min-id quarantined twin (5) flips
    Takedown(spark, dir, Seq(1L).toDF("doc_id"), Takedown.Gate.Exact, 0L)
    assert(ids(DedupStream.readCorpus(spark, dir)) === Set(2L, 3L, 5L))
    // the promoted doc re-entered the index: a fresh identical arrival
    // is rejected against it
    DedupStream.applyMicroBatch(spark, docsOf(20L -> "xx"), dir, 2L)
    assert(ids(DedupStream.readCorpus(spark, dir)) === Set(2L, 3L, 5L),
      "re-arrival of a re-elected claim key must stay rejected")
    // chained takedown: removing the promoted rep re-elects the next
    // surviving quarantined holder (9, then 20 — min id wins)
    Takedown(spark, dir, Seq(5L).toDF("doc_id"), Takedown.Gate.Exact, 1L)
    assert(ids(DedupStream.readCorpus(spark, dir)) === Set(2L, 3L, 9L))
    // removing the WHOLE class (expandExactClass) empties it; a new
    // arrival of that content is admitted again
    val cls = Takedown.expandExactClass(spark, dir,
      Seq(9L).toDF("doc_id"), Takedown.Gate.Exact)
    assert(ids(cls) === Set(9L, 20L), "class expansion finds quarantined twins")
    Takedown(spark, dir, cls, Takedown.Gate.Exact, 2L)
    assert(ids(DedupStream.readCorpus(spark, dir)) === Set(2L, 3L))
    DedupStream.applyMicroBatch(spark, docsOf(30L -> "xx"), dir, 3L)
    assert(ids(DedupStream.readCorpus(spark, dir)) === Set(2L, 3L, 30L),
      "an emptied class admits fresh content")
  }

  test("takedown is idempotent per id; replay of the same td is a no-op") {
    val dir = tmp("graft-td-idem")
    DedupStream.applyMicroBatch(spark,
      docsOf(1L -> "xx", 5L -> "xx", 7L -> "yy"), dir, 0L)
    Takedown(spark, dir, Seq(1L).toDF("doc_id"), Takedown.Gate.Exact, 0L)
    val once = ids(DedupStream.readCorpus(spark, dir))
    Takedown(spark, dir, Seq(1L).toDF("doc_id"), Takedown.Gate.Exact, 0L)
    assert(ids(DedupStream.readCorpus(spark, dir)) === once)
    assert(once === Set(5L, 7L))
  }

  // ---- URL gate -------------------------------------------------------

  test("url gate: canonical claim passes to the min-id surviving holder") {
    val dir = tmp("graft-td-url")
    val urls = Seq(
      1L -> "https://example.com/a?utm_source=x",
      4L -> "https://example.com/a",
      6L -> "https://EXAMPLE.com/a/",
      2L -> "https://example.com/b").toDF("doc_id", "url")
    UrlStream.applyMicroBatch(spark, urls, dir, 0L)
    val kept0 = ids(UrlStream.readCorpus(spark, dir))
    assert(kept0.contains(1L) && kept0.contains(2L),
      s"min-id per canonical must win at ingest, got $kept0")
    assert(!kept0.contains(4L), "4 shares 1's canonical and must drop")
    Takedown(spark, dir, Seq(1L).toDF("doc_id"), Takedown.Gate.Url, 0L)
    val kept1 = ids(UrlStream.readCorpus(spark, dir))
    assert(kept1.contains(4L) && !kept1.contains(1L),
      s"the canonical claim must pass to doc 4, got $kept1")
    // promoted doc's index row guards re-admission
    UrlStream.applyMicroBatch(spark,
      Seq(9L -> "https://example.com/a").toDF("doc_id", "url"), dir, 1L)
    assert(!ids(UrlStream.readCorpus(spark, dir)).contains(9L),
      "a re-arrival of the re-elected canonical must stay rejected")
  }

  // ---- media gate -----------------------------------------------------

  test("media gate: post-takedown corpus == from-scratch ingest of survivors") {
    val media = MediaQueries.texturedMediaTable(spark, sf).localCheckpoint()
    val dir = tmp("graft-td-media")
    // id-ordered halves: the gates' canonicality is FIRST-ARRIVAL, which
    // coincides with the takedown witness rule (smaller doc_id wins)
    // exactly under nondecreasing id batching — the house ingest
    // convention every stream spec pins
    val cut = media.agg(max("doc_id")).first().getLong(0) / 2
    MediaStream.applyMicroBatch(spark,
      media.filter(col("doc_id") <= cut), dir, 0L)
    MediaStream.applyMicroBatch(spark,
      media.filter(col("doc_id") > cut), dir, 1L)
    val removals = media.filter(col("doc_id") % 7 === 0).select("doc_id")
    Takedown(spark, dir, removals, Takedown.Gate.Media, 0L)
    val after = ids(MediaStream.readCorpus(spark, dir))
    val fresh = tmp("graft-td-media-fresh")
    MediaStream.applyMicroBatch(spark,
      media.join(removals, Seq("doc_id"), "left_anti"), fresh, 0L)
    assert(after === ids(MediaStream.readCorpus(spark, fresh)))
  }

  // ---- curation gate (claims + verdicts layout) ------------------------

  test("curation gate: claim re-election, verdict correction, compaction fold") {
    import graft.streaming.CurationStream
    val long = "the quick brown fox jumps over the lazy dog again and " +
      "again and then some more words to pass the too short gate " +
      "easily the quick brown fox jumps over the lazy dog once more"
    val dir = Files.createTempDirectory("graft-td-curation").toString +
      "/state"
    CurationStream.applyMicroBatch(spark,
      docsOf(1L -> long, 2L -> "too short"), dir, 0L)
    CurationStream.applyMicroBatch(spark,
      docsOf(5L -> long, 7L -> long), dir, 1L)
    def verdictOf(id: Long): (Boolean, Boolean, String) =
      CurationStream.readVerdicts(spark, dir)
        .filter(col("doc_id") === id)
        .select("is_canonical", "keep", "reject_reason")
        .as[(Boolean, Boolean, String)].collect()(0)
    assert(verdictOf(1L)._2 && verdictOf(5L)._3 === "near_dup")
    // remove the canonical: the min-id surviving twin (5) takes the
    // claim and its verdict corrects to the stateless outcome (keep)
    CurationStream.applyTakedown(spark, dir, Seq(1L).toDF("doc_id"), 0L)
    val v5 = verdictOf(5L)
    assert(v5._1 && v5._2 && v5._3 == null,
      s"doc 5 must become the kept canonical, got $v5")
    assert(verdictOf(7L)._3 === "near_dup", "doc 7 stays rejected (5 < 7)")
    assert(CurationStream.readVerdicts(spark, dir)
      .filter(col("doc_id") === 1L).isEmpty, "removed doc purged")
    // a NEW arrival of the same content stays rejected — the claim
    // passed to 5, it did not evaporate
    CurationStream.applyMicroBatch(spark, docsOf(9L -> long), dir, 2L)
    assert(verdictOf(9L)._3 === "near_dup",
      "re-arrival of a re-elected claim must stay near_dup")
    // compaction folds the takedown physically: same verdicts view
    val before = CurationStream.readVerdicts(spark, dir)
      .select("doc_id", "is_canonical", "keep")
      .as[(Long, Boolean, Boolean)].collect().toSet
    CurationStream.compact(spark, dir)
    val after = CurationStream.readVerdicts(spark, dir)
      .select("doc_id", "is_canonical", "keep")
      .as[(Long, Boolean, Boolean)].collect().toSet
    assert(after === before, "compaction must not change the verdict view")
    assert(new java.io.File(s"$dir/takedown").listFiles() == null ||
      !new java.io.File(s"$dir/takedown").listFiles().exists(
        _.getName.startsWith("td=")),
      "compaction must fold curation takedown dirs away")
  }

  // ---- winnow gate: threshold recount on the real corpus --------------

  test("winnow gate: post-takedown corpus == from-scratch ingest of survivors") {
    import graft.streaming.WinnowStream
    val all = Tables.documents(spark, sf).select("doc_id", "text")
      .localCheckpoint()
    val cut = all.agg(max("doc_id")).first().getLong(0)
    val dir = tmp("graft-td-winnow")
    Seq((-1L, cut / 3), (cut / 3, 2 * cut / 3), (2 * cut / 3, cut))
      .zipWithIndex.foreach { case ((lo, hi), i) =>
        WinnowStream.applyMicroBatch(spark,
          all.filter(col("doc_id") > lo && col("doc_id") <= hi), dir,
          i.toLong)
      }
    val removals = all.filter(col("doc_id") % 13 === 0).select("doc_id")
      .localCheckpoint()
    Takedown(spark, dir, removals, Takedown.Gate.Winnow, takedownId = 0L)
    val after = ids(WinnowStream.readCorpus(spark, dir))
    val fresh = tmp("graft-td-winnow-fresh")
    WinnowStream.applyMicroBatch(spark,
      all.join(removals, Seq("doc_id"), "left_anti"), fresh, 0L)
    val replay = ids(WinnowStream.readCorpus(spark, fresh))
    assert(after === replay,
      s"diverged: only-takedown=${(after -- replay).toSeq.sorted.take(5)} " +
        s"only-replay=${(replay -- after).toSeq.sorted.take(5)}")
    assert(after.intersect(ids(removals)).isEmpty, "removed ids must purge")
    // fingerprints are derived data: removed docs' index rows are gone
    assert(WinnowStream.readIndex(spark, dir)
      .join(removals, Seq("doc_id"), "left_semi").isEmpty,
      "a removed doc's fingerprints must stop witnessing")
    // and the fold is physical: compact leaves the same view, no td dirs
    graft.streaming.DedupStream.compact(spark, dir)
    assert(ids(WinnowStream.readCorpus(spark, dir)) === after)
    assert(!new java.io.File(s"$dir/takedown").exists() ||
      new java.io.File(s"$dir/takedown").listFiles().forall(
        !_.getName.startsWith("td=")))
  }

  // ---- out-of-order arrival: re-election replays the TRUE order -------

  test("exact gate: out-of-order arrival — re-election follows arrival_seq, not doc_id") {
    val dir = tmp("graft-td-ooo-exact")
    // ids arrive out of order across batches: 10 first, then 7, then 2
    DedupStream.applyMicroBatch(spark, docsOf(10L -> "xx", 11L -> "yy"), dir, 0L)
    DedupStream.applyMicroBatch(spark, docsOf(7L -> "xx"), dir, 1L)
    DedupStream.applyMicroBatch(spark, docsOf(2L -> "xx"), dir, 2L)
    assert(ids(DedupStream.readCorpus(spark, dir)) === Set(10L, 11L))
    Takedown(spark, dir, Seq(10L).toDF("doc_id"), Takedown.Gate.Exact, 0L)
    // literal replay of the surviving arrival order keeps 7 (arrived in
    // batch 1, before 2's batch 2) — the doc_id proxy would pick 2
    assert(ids(DedupStream.readCorpus(spark, dir)) === Set(11L, 7L),
      "the claim must pass to the earliest-ARRIVED survivor")
  }

  test("near-dup gate: out-of-order arrival — witness order is arrival order") {
    val dir = tmp("graft-td-ooo-neardup")
    val t = "the quick brown fox jumps over the lazy dog again and again"
    NearDupStream.applyMicroBatch(spark, docsOf(10L -> t), dir, 0L)
    NearDupStream.applyMicroBatch(spark, docsOf(7L -> t), dir, 1L)
    NearDupStream.applyMicroBatch(spark, docsOf(2L -> t), dir, 2L)
    assert(ids(NearDupStream.readCorpus(spark, dir)) === Set(10L))
    Takedown(spark, dir, Seq(10L).toDF("doc_id"), Takedown.Gate.NearDup, 0L)
    // replay of survivors in arrival order: 7 (batch 1) re-ingests first
    // and keeps; 2 (batch 2) still drops against the surviving 7. The
    // doc_id proxy would instead promote 2 and keep 7 dropped.
    assert(ids(NearDupStream.readCorpus(spark, dir)) === Set(7L),
      "re-election must replay the true arrival order")
  }

  // ---- compaction folds tombstones physically --------------------------

  test("compact folds takedowns: same view, no td dirs, quarantine rewritten") {
    val dir = tmp("graft-td-compact")
    DedupStream.applyMicroBatch(spark,
      docsOf(1L -> "xx", 5L -> "xx", 7L -> "yy"), dir, 0L)
    DedupStream.applyMicroBatch(spark,
      docsOf(8L -> "yy", 9L -> "zz", 11L -> "xx"), dir, 1L)
    Takedown(spark, dir, Seq(1L, 7L).toDF("doc_id"),
      Takedown.Gate.Exact, 0L)
    val before = DedupStream.readCorpus(spark, dir)
      .select("doc_id", "content_hash", "text").as[(Long, String, String)]
      .collect().toSet
    DedupStream.compact(spark, dir)
    val after = DedupStream.readCorpus(spark, dir)
      .select("doc_id", "content_hash", "text").as[(Long, String, String)]
      .collect().toSet
    assert(after === before, "compaction must not change the corpus view")
    assert(new java.io.File(s"$dir/takedown").listFiles() == null ||
      !new java.io.File(s"$dir/takedown").listFiles().exists(
        _.getName.startsWith("td=")),
      "compaction must fold takedown dirs away")
    // the fold kept the quarantine consistent: a takedown AFTER
    // compaction still re-elects correctly
    Takedown(spark, dir, Seq(5L).toDF("doc_id"), Takedown.Gate.Exact, 1L)
    assert(ids(DedupStream.readCorpus(spark, dir)) === Set(8L, 9L, 11L),
      "post-compact re-election must promote the surviving xx twin (11)")
  }
}
