package graft

import graft.cdc.{Cdc, ProductsFixture}
import graft.ops._
import graft.scd2.Scd2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's end-to-end scenario (README.md:271-307) as
    * one declarative batch program — seed the history table, stream one
    * insert event and one update event through
    * route → flatten → SCD2 merge, return the resulting history.
    * Self-contained (inline fixtures) so it runs under any session. */
  def entry(spark: SparkSession): DataFrame = {
    val seedHistory = Scd2.withScd2Columns(
      ProductsFixture.seed(spark), to_timestamp(lit("2023-08-01 00:00:00")))

    val insertEv = Cdc.toEvents(ProductsFixture.insertProbe(spark), Cdc.Insert,
      seqStart = 1, ts = to_timestamp(lit("2023-09-27 10:00:00")))
    val updateEv = Cdc.toEvents(ProductsFixture.updateProbe(spark), Cdc.Update,
      seqStart = 2, ts = to_timestamp(lit("2023-09-27 11:00:00")))
    val cdcStream = insertEv.unionByName(updateEv)

    val routed = Cdc.route(cdcStream)
    val processed = routed(Cdc.Insert).unionByName(routed(Cdc.Update))
    val flat = Cdc.castTo(
      Cdc.flatten(processed, ProductsFixture.schema.fieldNames.toSeq),
      ProductsFixture.schema)
    val batch = flat.select(
      (ProductsFixture.schema.fieldNames.toSeq :+ "ts" :+ "seq").map(col): _*)

    Scd2.applyBatch(seedHistory, batch.withColumnRenamed("seq", "event_seq"),
      Seq("ProductID"), "ts", "event_seq")
  }

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data-pipeline surface (dedup / similarity / text). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scd2Queries.queries ++ LookupQueries.queries ++ ExtractQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ RelationalQueries.queries ++
      MediaQueries.queries ++ AnalyticsQueries.queries ++
      CurationQueries.queries ++ PrepQueries.queries ++ BpeQueries.queries ++
      ProfileQueries.queries

  /** Bench-only twins: operators whose RESULTS are spec-verified against
    * a registered query (so a DuckDB oracle row would be redundant or
    * impossible) but whose STEADY-STATE COST is the number a deployment
    * sees — Bench times these alongside `queries`; Verify skips them. */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rfm_segments_sketch" -> (AnalyticsQueries.rfmSegmentsSketch _),
    "ann_ivf_pq_prebuilt" -> (graft.streaming.AnnStream.annIvfPqPrebuilt _),
    "quantile_bottomk_thinned" -> (AnalyticsQueries.quantileBottomKThinned _),
    "ann_recall_report_prebuilt" ->
      (graft.streaming.AnnStream.annRecallReportPrebuilt _),
    "blocklist_filter_1k" -> (CurationQueries.blocklistFilter1k _),
    "ann_graph_search_prebuilt" ->
      (SimilarityQueries.annGraphSearchPrebuilt _),
    "ann_graph_search_streamed" ->
      (graft.streaming.GraphStream.annGraphSearchStreamed _),
    "ann_graph_search_compacted" ->
      (graft.streaming.GraphStream.annGraphSearchCompacted _),
    "approx_distinct" -> (AnalyticsQueries.approxDistinct _),
    "approx_percentile" -> (AnalyticsQueries.approxPercentile _),
    "gate_eval_live" -> (graft.streaming.EvalStream.gateEvalLiveBench _),
    "media_phash_jpeg" -> (MediaQueries.mediaPhashJpeg _),
    "media_gate_probe" -> (graft.streaming.MediaStream.mediaGateProbe _),
    "dedup_recall_sampled" -> (DedupQueries.dedupRecallSampled _),
    "ann_filtered_recall_budget" ->
      (SimilarityQueries.annFilteredRecallBudget _),
    "retrieval_eval_budget" ->
      (SimilarityQueries.retrievalEvalBudget _))

  /** Verify-only twins — the INVERSE of [[benchOnly]]: registered in
    * `queries` (DuckDB-oracled) but skipped by Bench, because their
    * plans deliberately compute an EXACT companion next to a sketch so
    * the oracle can pin the row. Timing them under the approx name
    * would report the exact path's cost as the sketch's; Bench times
    * the sketch-only production faces (same unsuffixed names, in
    * [[benchOnly]]) instead. */
  def verifyOnly: Set[String] =
    Set("approx_distinct_check", "approx_percentile_check")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scd2Queries.oracles ++ LookupQueries.oracles ++ ExtractQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ RelationalQueries.oracles ++
      MediaQueries.oracles ++ AnalyticsQueries.oracles ++
      CurationQueries.oracles ++ PrepQueries.oracles ++ BpeQueries.oracles ++
      ProfileQueries.oracles
}
