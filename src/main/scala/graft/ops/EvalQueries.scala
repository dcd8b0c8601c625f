package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gate-evaluation core — grades a binary keep/drop gate against labels.
  *
  * The engine ships a dozen keep/drop gates (`quality_filter`,
  * `text_classify`, `dsir_select`, `blocklist_filter`, the
  * decontamination family); threshold tuning against held-out labels is
  * the daily loop of corpus curation, and this is the operator that
  * closes it: exact ROC AUC via the Mann–Whitney U statistic plus the
  * confusion matrix and precision/recall/F1 at the gate's SHIPPED
  * decision rule. Registered faces: `classifier_eval` (the Naive-Bayes
  * is-English gate of [[CurationQueries.textClassify]]), `dsir_eval`
  * ([[PrepQueries.dsirSelect]]'s keep rule) — both graded against the
  * corpus `lang` labels — and `gate_eval_highndv` (near-unique scores:
  * the corpus-scale-histogram witness); the streaming monitor
  * ([[graft.streaming.EvalStream]]) shares the tail below the counts
  * collapse.
  *
  * Exactness: scores are integer ppm (BIGINT), so AUC reduces to integer
  * rank arithmetic — U = #{(p,n): s_p > s_n} + ½·#{s_p = s_n}, computed
  * from the per-score histogram as 2U = Σ_s np_s·(2·cum_nn_below + nn_s)
  * (all BIGINT; ties get the exact ½ credit of the average-rank
  * convention). Confusion counts are BIGINTs; the final ratios are
  * single IEEE divisions of integers, identical in both engines (F1 uses
  * the algebraic identity 2PR/(P+R) = 2·tp/(2·tp+fp+fn), so no
  * intermediate rounding exists to diverge).
  *
  * Shape at 100 TB: one corpus-wide hash aggregate to the per-score
  * histogram (map-side combined; ≤ NDV(score) rows) + one global
  * confusion aggregate (4 counters). The histogram is usually small
  * (integer ppm grid), but for SUM-shaped scores on an open vocabulary
  * — e.g. [[CurationQueries.classifierEval]]'s per-doc Σ of token
  * weights — NDV(score) grows with the corpus, so NOTHING here may
  * order the whole histogram in one partition. The cumulative sums both
  * faces need therefore run as a DISTRIBUTED two-pass prefix sum
  * ([[prefixedHistogram]]): range-partition by score, local per-
  * partition cumsum, plus a broadcast per-partition offset table whose
  * size is the PARTITION COUNT (a Spark config, corpus-independent) —
  * the only single-partition ordered window left in the family runs
  * over those P rows. The final 1-row × 1-row crossJoin is the
  * PlanSpec-allowlisted provably-tiny broadcast class. */
object EvalQueries {

  /** The (score, label, decision, n) count table a scored corpus
    * collapses to — the family's ONE shared reduction (round-12 verdict
    * ask #8), and the exact state [[graft.streaming.EvalStream]]
    * persists per batch: counts are LINEAR (they sum across batches —
    * the CmsStream mergeability argument), so the streamed monitor and
    * the batch operator literally share the code below the counts. */
  private[graft] def scoredCounts(scored: DataFrame): DataFrame =
    scored.groupBy("score", "label", "decision")
      .agg(count(lit(1)).as("n"))

  /** The per-score (score, np, nn) histogram over a counts table. */
  private def scoreHistogram(counts: DataFrame): DataFrame =
    counts.groupBy("score").agg(
      sum(when(col("label"), col("n")).otherwise(0L)).as("np"),
      sum(when(col("label"), 0L).otherwise(col("n"))).as("nn"))

  /** DISTRIBUTED prefix sums over the score histogram — the textbook
    * two-pass scan: (1) range-partition the histogram by score (desc
    * for the PR sweep, asc for the rank sum), freeze the assignment
    * with a localCheckpoint so both consumers see identical partitions,
    * (2) per-PARTITION totals → a P-row offset table (P = shuffle
    * partition count, corpus-INDEPENDENT) whose exclusive prefix runs
    * in the family's only single-partition window, (3) broadcast the
    * offsets back and add the per-partition local cumsum (a window
    * bounded by NDV/P rows, partitioned by pid so no global order).
    * Adds `cum_np`/`cum_nn` — INCLUSIVE prefix sums in the given score
    * order; callers subtract the current row for the exclusive form.
    * Exactness: integer sums reassociate freely, so the split prefix
    * equals the single-partition window bit for bit (EvalSpec pins
    * brute-force equality, including a high-NDV fixture). */
  private[graft] def prefixedHistogram(hist: DataFrame, desc: Boolean): DataFrame = {
    val parts = hist.sparkSession.sessionState.conf.numShufflePartitions
    val ord = if (desc) col("score").desc else col("score").asc
    val ranged = hist.repartitionByRange(parts, ord)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val byPid = Window.orderBy("pid") // P rows — the bounded window
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("pid")
      .agg(sum("np").as("pnp"), sum("nn").as("pnn"))
      .select(col("pid"),
        coalesce(sum(col("pnp")).over(byPid), lit(0L)).as("off_np"),
        coalesce(sum(col("pnn")).over(byPid), lit(0L)).as("off_nn"))
    val local = Window.partitionBy(col("pid")).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, 0)
    ranged.join(broadcast(offsets), Seq("pid"))
      .withColumn("cum_np", col("off_np") + sum(col("np")).over(local))
      .withColumn("cum_nn", col("off_nn") + sum(col("nn")).over(local))
      .drop("pid", "off_np", "off_nn")
  }

  /** Evaluate one gate. `scored` must have columns
    * `(score: BIGINT, label: BOOLEAN, decision: BOOLEAN)` — one row per
    * evaluated document. Returns ONE row:
    * (gate, n_pos, n_neg, auc, tp, fp, fn, tn, precision, recall, f1).
    * Degenerate inputs follow the standard conventions: single-class
    * labels ⇒ auc = 0.5; an empty predicted-positive (or positive-label)
    * set ⇒ precision (recall) = 0. */
  def gateEval(gate: String, scoredRaw: DataFrame): DataFrame =
    // ONE aggregate evaluates the gate's scoring pipeline; the tiny
    // counts table is what the two consumers (histogram + confusion)
    // re-read (the budget_select multi-consumer lesson, now paid on the
    // collapsed state instead of the corpus)
    gateEvalFromCounts(gate, scoredCounts(scoredRaw))

  /** [[gateEval]] below the corpus collapse: `counts` is a
    * (score, label, decision, n) table — the registered faces build it
    * from their scored rows, [[graft.streaming.EvalStream]] from the SUM
    * of its committed per-batch tables (linearity makes the two
    * identical, which is the whole stream ≡ batch proof). */
  private[graft] def gateEvalFromCounts(gate: String,
      countsRaw: DataFrame): DataFrame = {
    val counts = countsRaw.localCheckpoint()
    // cnn = #neg strictly below this score: the distributed inclusive
    // prefix minus the row's own nn (no global ordered window — see
    // the object scaladoc's open-vocabulary NDV note)
    val agg = prefixedHistogram(scoreHistogram(counts), desc = false)
      .withColumn("cnn", col("cum_nn") - col("nn"))
      .agg(sum(col("np") * (col("cnn") * 2 + col("nn"))).as("u2"),
        sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
    val conf = counts.agg(confusionCols.head, confusionCols.tail: _*)
    agg.crossJoin(conf) // 1-row × 1-row metric assembly (allowlisted)
      .select(lit(gate).as("gate") +: metricCols: _*)
  }

  /** The four confusion counters over a (label, decision, n) count
    * table — shared by the whole-corpus and per-slice eval tails. */
  private def confusionCols: Seq[Column] = Seq(
    sum(when(col("decision") && col("label"), col("n")).otherwise(0L))
      .as("tp"),
    sum(when(col("decision") && !col("label"), col("n")).otherwise(0L))
      .as("fp"),
    sum(when(!col("decision") && col("label"), col("n")).otherwise(0L))
      .as("fn"),
    sum(when(!col("decision") && !col("label"), col("n")).otherwise(0L))
      .as("tn"))

  /** The metric projection over assembled (u2, n_pos, n_neg, tp, fp,
    * fn, tn) columns — the ONE place the AUC / precision / recall / F1
    * arithmetic and its degenerate-input conventions live, so the
    * whole-corpus and per-slice faces cannot diverge. */
  private def metricCols: Seq[Column] = Seq(
    col("n_pos"), col("n_neg"),
    when(col("n_pos") * col("n_neg") === 0, lit(0.5))
      .otherwise(round(
        col("u2") / (lit(2.0) * col("n_pos") * col("n_neg")), 6))
      .as("auc"),
    col("tp"), col("fp"), col("fn"), col("tn"),
    when(col("tp") + col("fp") === 0, lit(0.0))
      .otherwise(round(
        col("tp").cast("double") / (col("tp") + col("fp")), 6))
      .as("precision"),
    when(col("tp") + col("fn") === 0, lit(0.0))
      .otherwise(round(
        col("tp").cast("double") / (col("tp") + col("fn")), 6))
      .as("recall"),
    when(col("tp") * 2 + col("fp") + col("fn") === 0, lit(0.0))
      .otherwise(round(
        lit(2.0) * col("tp") / (col("tp") * 2 + col("fp") + col("fn")),
        6))
      .as("f1"))

  /** PER-SLICE gate evaluation — [[gateEval]] graded independently
    * within each value of a `slice` column (source, domain, language,
    * length bucket): ONE row per slice with the same metric schema.
    * "Is my gate biased against a slice of the corpus" is the fairness
    * /regression question a lifetime aggregate structurally hides — a
    * gate can hold AUC 0.9 overall while collapsing to 0.5 on one
    * source whose volume is small.
    *
    * `scored` must have columns `(slice, score: BIGINT,
    * label: BOOLEAN, decision: BOOLEAN)`.
    *
    * Shape at 100 TB: the corpus collapses to per-(slice, score)
    * counts (map-side combined), and the rank prefix sums run as the
    * SLICE-AWARE generalization of [[prefixedHistogram]]: range-
    * partition by (slice, score) — each slice occupies a contiguous
    * partition run — with per-(partition, slice) offsets whose prefix
    * windows are bounded by the PARTITION COUNT per slice, never by
    * NDV(score). No global ordered window at any slice cardinality;
    * the final per-slice assembly is an equi-join on slice. */
  private[graft] def gateEvalBy(gate: String, scoredRaw: DataFrame): DataFrame = {
    val counts = scoredRaw.groupBy("slice", "score", "label", "decision")
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val hist = counts.groupBy("slice", "score").agg(
      sum(when(col("label"), col("n")).otherwise(0L)).as("np"),
      sum(when(col("label"), 0L).otherwise(col("n"))).as("nn"))
    val agg = prefixedHistogramBy(hist)
      .withColumn("cnn", col("cum_nn") - col("nn"))
      .groupBy("slice").agg(
        sum(col("np") * (col("cnn") * 2 + col("nn"))).as("u2"),
        sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
    val conf = counts.groupBy("slice").agg(confusionCols.head,
      confusionCols.tail: _*)
    agg.join(conf, Seq("slice")) // per-slice assembly: equi-join, ≤|slices| rows
      .select(lit(gate).as("gate") +: col("slice") +: metricCols: _*)
      // sortWithinPartitions: a global orderBy would sample-execute
      // the assembly's prefix-sum child a second time for ≤|slices|
      // output rows; the comparator sorts rows itself
      .sortWithinPartitions("slice")
  }

  /** [[prefixedHistogram]] generalized to per-slice prefix sums over a
    * (slice, score, np, nn) histogram: range-partition by (slice,
    * score) asc — every slice is a contiguous run of partitions, so
    * per-(pid, slice) totals prefix-sum within slice over ≤ P pids
    * (the offsets table holds ≤ P + |slices| − 1 rows: one per
    * (partition, slice) incidence), and the local cumsum windows stay
    * partition-bounded exactly as in the unsliced form. Same integer
    * reassociation argument ⇒ bit-equal to a per-slice ordered window
    * (EvalSpec pins it). */
  private def prefixedHistogramBy(hist: DataFrame): DataFrame = {
    val parts = hist.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = hist
      .repartitionByRange(parts, col("slice").asc, col("score").asc)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val byPid = Window.partitionBy(col("slice")).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1) // ≤ P rows per slice
    val offsets = ranged.groupBy("pid", "slice")
      .agg(sum("np").as("pnp"), sum("nn").as("pnn"))
      .select(col("pid"), col("slice"),
        coalesce(sum(col("pnp")).over(byPid), lit(0L)).as("off_np"),
        coalesce(sum(col("pnn")).over(byPid), lit(0L)).as("off_nn"))
    val local = Window.partitionBy(col("pid"), col("slice"))
      .orderBy(col("score").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    ranged.join(broadcast(offsets), Seq("pid", "slice"))
      .withColumn("cum_np", col("off_np") + sum(col("np")).over(local))
      .withColumn("cum_nn", col("off_nn") + sum(col("nn")).over(local))
      .drop("pid", "off_np", "off_nn")
  }

  /** SCORE-BAND RELIABILITY (calibration) REPORT — the per-band health
    * table behind a shipped gate: bucket the score axis into fixed
    * `binWidth` bands and report, per band, the volume, the observed
    * positive rate, the gate's decision rate, and the mean score. The
    * artifact an engineer reads to see WHERE on the score axis the
    * gate's decisions and the labels disagree (reliability-diagram
    * bins; Murphy/DeGroot calibration decomposition) — [[gateEval]]'s
    * one-row summary can hold steady while a single band inverts.
    *
    * Contract: scores must be non-negative (every registered grid is —
    * ppm rates, Σ of non-negative model weights, md5-derived grids);
    * `div` truncation and DuckDB `//` floor agree only there.
    *
    * Shape at 100 TB: counts collapse (map-side) → one ≤(range/width)-
    * row hash aggregate. The score·n dot product accumulates in
    * DECIMAL(30,0) — BIGINT would overflow at ppm-score × trillion-doc
    * scale. Counts are LINEAR, so the streamed monitor can serve the
    * same report from summed batch tables ([[calibrationFromCounts]]). */
  private[graft] def calibrationReport(gate: String, scoredRaw: DataFrame,
      binWidth: Long): DataFrame =
    calibrationFromCounts(gate, scoredCounts(scoredRaw), binWidth)

  /** [[calibrationReport]] below the corpus collapse — see
    * [[gateEvalFromCounts]] for the counts contract. */
  private[graft] def calibrationFromCounts(gate: String, counts: DataFrame,
      binWidth: Long): DataFrame =
    counts
      .withColumn("bin", expr(s"score div ${binWidth}L"))
      .groupBy("bin").agg(
        sum(col("n")).as("n"),
        sum(when(col("label"), col("n")).otherwise(0L)).as("n_pos"),
        sum(when(col("decision"), col("n")).otherwise(0L)).as("n_dec"),
        sum(col("score").cast("decimal(30,0)") * col("n")).as("ssum"))
      .select(lit(gate).as("gate"), col("bin"),
        (col("bin") * lit(binWidth)).as("score_lo"),
        col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
        round(col("n_dec").cast("double") / col("n"), 6).as("dec_rate"),
        round(col("ssum").cast("double") / col("n"), 6).as("mean_score"))
      // sortWithinPartitions: `counts` is NOT checkpointed here, so a
      // global orderBy's sampling pass would re-execute the caller's
      // whole scoring chain for ≤(range/width) output rows
      .sortWithinPartitions("bin")

  /** PRECISION/RECALL CURVE — the full threshold sweep behind
    * [[gateEval]]'s single shipped-threshold row: one output row per
    * DISTINCT score, grading the rule `decision = (score ≥ threshold)`
    * with the same integer confusion counts and the same
    * division/rounding conventions. This is the artifact a curation
    * engineer actually reads to PICK a threshold; [[gateEval]] then
    * monitors the one they shipped.
    *
    * Shape: identical to [[gateEval]] — the corpus collapses to the
    * per-score histogram (map-side combined), and the sweep is the
    * distributed prefix sum of [[prefixedHistogram]] in score-DESC
    * order (running tp/fp; fn/tn from the broadcast totals). Output
    * size = NDV(score). */
  def prCurve(scoredRaw: DataFrame): DataFrame =
    prCurveFromCounts(
      scoredRaw.withColumn("decision", lit(false)) // unused by the sweep
        .transform(EvalQueries.scoredCounts))

  /** [[prCurve]] below the corpus collapse — see [[gateEvalFromCounts]]. */
  private[graft] def prCurveFromCounts(countsRaw: DataFrame): DataFrame = {
    val counts = countsRaw.localCheckpoint() // histogram + totals consumers
    val tot = counts.agg(
      sum(when(col("label"), col("n")).otherwise(0L)).as("n_pos"),
      sum(when(col("label"), 0L).otherwise(col("n"))).as("n_neg"))
    // running tp/fp down the sweep = the distributed inclusive prefix
    // in score-DESC order (no global ordered window — gateEval note)
    prefixedHistogram(scoreHistogram(counts), desc = true)
      .withColumnRenamed("cum_np", "tp")
      .withColumnRenamed("cum_nn", "fp")
      .crossJoin(broadcast(tot)) // 1-row totals (allowlisted class)
      .select(col("score").as("threshold"), col("tp"), col("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        (col("n_neg") - col("fp")).as("tn"),
        when(col("tp") + col("fp") === 0, lit(0.0))
          .otherwise(round(
            col("tp").cast("double") / (col("tp") + col("fp")), 6))
          .as("precision"),
        when(col("n_pos") === 0, lit(0.0))
          .otherwise(round(col("tp").cast("double") / col("n_pos"), 6))
          .as("recall"),
        when(col("tp") * 2 + col("fp") + (col("n_pos") - col("tp")) === 0,
            lit(0.0))
          .otherwise(round(lit(2.0) * col("tp") /
            (col("tp") * 2 + col("fp") + (col("n_pos") - col("tp"))), 6))
          .as("f1"))
      .orderBy("threshold")
  }

  /** The DuckDB tail of a PR-curve oracle — expects `scored(score,
    * label)`; the EXACT SQL mirror of [[prCurve]]. */
  def prCurveSql: String =
    s"""hist AS (
       |  SELECT score, sum(CASE WHEN label THEN 1 ELSE 0 END) AS np,
       |         sum(CASE WHEN label THEN 0 ELSE 1 END) AS nn
       |  FROM scored GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |         CAST(sum(nn) AS BIGINT) AS n_neg FROM hist),
       |cum AS (
       |  SELECT score,
       |    CAST(sum(np) OVER (ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS tp,
       |    CAST(sum(nn) OVER (ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS fp
       |  FROM hist)
       |SELECT score AS threshold, tp, fp,
       |  n_pos - tp AS fn, n_neg - fp AS tn,
       |  CASE WHEN tp + fp = 0 THEN 0.0
       |       ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
       |  CASE WHEN n_pos = 0 THEN 0.0
       |       ELSE round(CAST(tp AS DOUBLE) / n_pos, 6) END AS recall,
       |  CASE WHEN tp * 2 + fp + (n_pos - tp) = 0 THEN 0.0
       |       ELSE round(2.0 * tp / (tp * 2 + fp + (n_pos - tp)), 6)
       |       END AS f1
       |FROM cum CROSS JOIN tot ORDER BY threshold""".stripMargin

  /** The DuckDB tail of a DRIFT oracle: expects preceding CTEs
    * `scored(score, label, decision)` (lifetime) and `scored_w` (the
    * window subset) and emits the one-row lifetime-vs-window report —
    * the EXACT SQL mirror of [[graft.streaming.EvalStream
    * .gateEvalDrift]]: both legs are the [[gateEvalSql]] arithmetic
    * verbatim (suffixed CTE names), deltas are IEEE subtractions of
    * the already-rounded doubles, identical in both engines. */
  def gateEvalDriftSql(gate: String): String = {
    def leg(sfx: String, src: String): String =
      s"""hist$sfx AS (
         |  SELECT score, sum(CASE WHEN label THEN 1 ELSE 0 END) AS np,
         |         sum(CASE WHEN label THEN 0 ELSE 1 END) AS nn
         |  FROM $src GROUP BY 1),
         |cum$sfx AS (
         |  SELECT np, nn, coalesce(sum(nn) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnn
         |  FROM hist$sfx),
         |agg$sfx AS (
         |  SELECT CAST(sum(np * (cnn * 2 + nn)) AS BIGINT) AS u2,
         |         CAST(sum(np) AS BIGINT) AS n_pos,
         |         CAST(sum(nn) AS BIGINT) AS n_neg
         |  FROM cum$sfx),
         |conf$sfx AS (
         |  SELECT
         |    CAST(sum(CASE WHEN decision AND label THEN 1 ELSE 0 END)
         |         AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN decision AND NOT label THEN 1 ELSE 0 END)
         |         AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN NOT decision AND label THEN 1 ELSE 0 END)
         |         AS BIGINT) AS fn
         |  FROM $src),
         |row$sfx AS (
         |  SELECT n_pos + n_neg AS n,
         |    CASE WHEN n_pos * n_neg = 0 THEN 0.5
         |         ELSE round(u2 / (2.0 * n_pos * n_neg), 6) END AS auc,
         |    CASE WHEN tp + fp = 0 THEN 0.0
         |         ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS prc,
         |    CASE WHEN tp + fn = 0 THEN 0.0
         |         ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS rec,
         |    CASE WHEN tp * 2 + fp + fn = 0 THEN 0.0
         |         ELSE round(2.0 * tp / (tp * 2 + fp + fn), 6) END AS f1
         |  FROM agg$sfx CROSS JOIN conf$sfx)"""
    s"""${leg("_l", "scored")},
       |${leg("_w", "scored_w")}
       |SELECT '$gate' AS gate, l.n AS n_life, w.n AS n_window,
       |  l.auc AS auc_life, w.auc AS auc_window,
       |  round(w.auc - l.auc, 6) AS auc_delta,
       |  l.prc AS precision_life, w.prc AS precision_window,
       |  l.rec AS recall_life, w.rec AS recall_window,
       |  l.f1 AS f1_life, w.f1 AS f1_window,
       |  round(w.f1 - l.f1, 6) AS f1_delta
       |FROM row_l l CROSS JOIN row_w w""".stripMargin
  }

  /** The DuckDB tail of a gate-eval oracle: expects a preceding CTE
    * `scored(score, label, decision)` and appends the histogram /
    * rank-sum / confusion arithmetic — the EXACT SQL mirror of
    * [[gateEval]], shared by every gate's oracle so the two faces can
    * never diverge. */
  def gateEvalSql(gate: String): String =
    s"""hist AS (
       |  SELECT score, sum(CASE WHEN label THEN 1 ELSE 0 END) AS np,
       |         sum(CASE WHEN label THEN 0 ELSE 1 END) AS nn
       |  FROM scored GROUP BY 1),
       |cum AS (
       |  SELECT np, nn, coalesce(sum(nn) OVER (ORDER BY score
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnn
       |  FROM hist),
       |agg AS (
       |  SELECT CAST(sum(np * (cnn * 2 + nn)) AS BIGINT) AS u2,
       |         CAST(sum(np) AS BIGINT) AS n_pos,
       |         CAST(sum(nn) AS BIGINT) AS n_neg
       |  FROM cum),
       |conf AS (
       |  SELECT
       |    CAST(sum(CASE WHEN decision AND label THEN 1 ELSE 0 END)
       |         AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN decision AND NOT label THEN 1 ELSE 0 END)
       |         AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN NOT decision AND label THEN 1 ELSE 0 END)
       |         AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN NOT decision AND NOT label THEN 1 ELSE 0 END)
       |         AS BIGINT) AS tn
       |  FROM scored)
       |SELECT '$gate' AS gate, n_pos, n_neg,
       |  CASE WHEN n_pos * n_neg = 0 THEN 0.5
       |       ELSE round(u2 / (2.0 * n_pos * n_neg), 6) END AS auc,
       |  tp, fp, fn, tn,
       |  CASE WHEN tp + fp = 0 THEN 0.0
       |       ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
       |  CASE WHEN tp + fn = 0 THEN 0.0
       |       ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
       |  CASE WHEN tp * 2 + fp + fn = 0 THEN 0.0
       |       ELSE round(2.0 * tp / (tp * 2 + fp + fn), 6) END AS f1
       |FROM agg CROSS JOIN conf""".stripMargin

  /** The DuckDB tail of a PER-SLICE gate-eval oracle: expects a
    * preceding CTE `scored(slice, score, label, decision)` — the EXACT
    * SQL mirror of [[gateEvalBy]] (the per-slice windows replace the
    * distributed slice-aware prefix sum, bit-equal by integer
    * reassociation). */
  def gateEvalBySql(gate: String): String =
    s"""hist AS (
       |  SELECT slice, score,
       |         sum(CASE WHEN label THEN 1 ELSE 0 END) AS np,
       |         sum(CASE WHEN label THEN 0 ELSE 1 END) AS nn
       |  FROM scored GROUP BY 1, 2),
       |cum AS (
       |  SELECT slice, np, nn,
       |    coalesce(sum(nn) OVER (PARTITION BY slice ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnn
       |  FROM hist),
       |agg AS (
       |  SELECT slice, CAST(sum(np * (cnn * 2 + nn)) AS BIGINT) AS u2,
       |         CAST(sum(np) AS BIGINT) AS n_pos,
       |         CAST(sum(nn) AS BIGINT) AS n_neg
       |  FROM cum GROUP BY 1),
       |conf AS (
       |  SELECT slice,
       |    CAST(sum(CASE WHEN decision AND label THEN 1 ELSE 0 END)
       |         AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN decision AND NOT label THEN 1 ELSE 0 END)
       |         AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN NOT decision AND label THEN 1 ELSE 0 END)
       |         AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN NOT decision AND NOT label THEN 1 ELSE 0 END)
       |         AS BIGINT) AS tn
       |  FROM scored GROUP BY 1)
       |SELECT '$gate' AS gate, slice, n_pos, n_neg,
       |  CASE WHEN n_pos * n_neg = 0 THEN 0.5
       |       ELSE round(u2 / (2.0 * n_pos * n_neg), 6) END AS auc,
       |  tp, fp, fn, tn,
       |  CASE WHEN tp + fp = 0 THEN 0.0
       |       ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
       |  CASE WHEN tp + fn = 0 THEN 0.0
       |       ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
       |  CASE WHEN tp * 2 + fp + fn = 0 THEN 0.0
       |       ELSE round(2.0 * tp / (tp * 2 + fp + fn), 6) END AS f1
       |FROM agg JOIN conf USING (slice) ORDER BY slice""".stripMargin

  /** The DuckDB tail of a calibration oracle: expects a preceding CTE
    * `scored(score, label, decision)` — the EXACT SQL mirror of
    * [[calibrationReport]] (DuckDB `//` floor ≡ Spark `div` truncation
    * on the non-negative score contract; the HUGEINT Σscore·1 equals
    * the DECIMAL dot product exactly, both cast to DOUBLE once). */
  /** The DuckDB tail of a band-grain drift oracle: expects preceding
    * CTEs `scored(score, label, decision)` (lifetime) and `scored_w`
    * (the window subset) — the EXACT SQL mirror of
    * [[graft.streaming.EvalStream.calibrationDrift]] (window bins ⊆
    * lifetime bins, LEFT join + zero-fill; deltas are IEEE
    * subtractions of the already-rounded doubles). */
  def calibrationDriftSql(gate: String, binWidth: Long): String = {
    def leg(sfx: String, src: String): String =
      s"""g$sfx AS (
         |  SELECT score // $binWidth AS bin, count(*) AS n,
         |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS np,
         |    sum(CASE WHEN decision THEN 1 ELSE 0 END) AS nd
         |  FROM $src GROUP BY 1)"""
    s"""${leg("_l", "scored")},
       |${leg("_w", "scored_w")}
       |SELECT '$gate' AS gate, CAST(l.bin AS BIGINT) AS bin,
       |  CAST(l.bin * $binWidth AS BIGINT) AS score_lo,
       |  CAST(l.n AS BIGINT) AS n_life,
       |  CAST(coalesce(w.n, 0) AS BIGINT) AS n_window,
       |  round(CAST(l.np AS DOUBLE) / l.n, 6) AS pos_rate_life,
       |  coalesce(round(CAST(w.np AS DOUBLE) / w.n, 6), 0.0)
       |    AS pos_rate_window,
       |  round(coalesce(round(CAST(w.np AS DOUBLE) / w.n, 6), 0.0)
       |        - round(CAST(l.np AS DOUBLE) / l.n, 6), 6) AS pos_rate_delta,
       |  round(CAST(l.nd AS DOUBLE) / l.n, 6) AS dec_rate_life,
       |  coalesce(round(CAST(w.nd AS DOUBLE) / w.n, 6), 0.0)
       |    AS dec_rate_window
       |FROM g_l l LEFT JOIN g_w w USING (bin) ORDER BY bin""".stripMargin
  }

  def calibrationSql(gate: String, binWidth: Long): String =
    s"""g AS (
       |  SELECT score // $binWidth AS bin, count(*) AS n,
       |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
       |    sum(CASE WHEN decision THEN 1 ELSE 0 END) AS n_dec,
       |    sum(score) AS ssum
       |  FROM scored GROUP BY 1)
       |SELECT '$gate' AS gate, CAST(bin AS BIGINT) AS bin,
       |  CAST(bin * $binWidth AS BIGINT) AS score_lo,
       |  CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       |  round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate,
       |  round(CAST(n_dec AS DOUBLE) / n, 6) AS dec_rate,
       |  round(CAST(ssum AS DOUBLE) / n, 6) AS mean_score
       |FROM g ORDER BY bin""".stripMargin
}
