package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series / OLAP analytics over the `events` stream table — the
  * batch faces of the streaming surface (SURVEY.md §2.10 lists these
  * categories as absent from the reference) plus aggregation breadth a
  * training-data pipeline needs at 100 TB.
  *
  * Scale notes:
  *  - `sessionize` uses Spark's native `session_window` — one shuffle by
  *    (user, window) with partial merge; the same operator drives the
  *    streaming path with watermarked state eviction.
  *  - `windowAgg` is a tumbling event-time window: at scale this is the
  *    canonical pre-aggregation (one partial+final hash agg; window start
  *    is a pure projection of ts, so no blow-up).
  *  - `saltedAgg` demonstrates the hot-key pattern: 5 event types over
  *    billions of rows would reduce to 5 final-stage keys; salting fans
  *    the partial aggregate over 16× more reducers, the final combine is
  *    over (types × 16) rows. Results are bit-identical to the direct
  *    group-by (sums go through DECIMAL — order-independent).
  *  - `approxDistinct` is the sketch path (HLL++): mergeable partial
  *    state, constant memory per group — the only viable distinct-count
  *    at 100 TB. Its row carries the exact count + a within-tolerance
  *    boolean the plan proves about its own estimate, so even the
  *    sketch path is hash-oracled (see the method scaladoc).
  */
object AnalyticsQueries {
  val sessionGap = "30 minutes"

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  /** Session windows per user (gap = 30 min), Spark-native
    * `session_window`. Oracle is the classic gaps-and-islands SQL —
    * boundary semantics line up exactly (a gap of precisely 30:00 starts
    * a new session in both formulations: Spark windows are end-exclusive). */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), sessionGap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** Tumbling 1-hour event-time windows × event_type: count, exact
    * distinct users, value sum. The batch twin of the streaming
    * watermarked window aggregate. */
  def windowAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("n_users"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** CUBE over (event_type, hour-of-day): all 4 grouping-set combinations
    * in one pass (partial-aggregated per set). */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .cube(col("event_type"), hour(col("ts")).as("hour_of_day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .orderBy(col("event_type").asc_nulls_first,
        col("hour_of_day").asc_nulls_first)

  /** Exact interpolated percentiles of value per event_type (p50/p90/p99,
    * rounded 6dp — Spark `percentile` and DuckDB `quantile_cont` share the
    * (1-f)·a + f·b interpolation). At 100 TB the sketch twin is
    * approx_percentile; the exact form is the oracle-checkable baseline. */
  def percentileAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(percentile(col("value"), array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
      .select(col("event_type"),
        round(element_at(col("p"), 1), 6).as("p50"),
        round(element_at(col("p"), 2), 6).as("p90"),
        round(element_at(col("p"), 3), 6).as("p99"))
      .orderBy("event_type")

  /** Exact Pearson correlation matrix over lineitem's numeric columns in
    * ONE scan: a single aggregate computes every Σx / Σx² / Σxy in
    * DECIMAL (exact, order-independent — the [[trendFit]] normal-equation
    * trick), the 3 output pairs are then a tiny projection of that one
    * row. The closed form n·Σxy − Σx·Σy over sqrt of the variances runs
    * in doubles on the EXACT sums; IEEE sqrt is correctly rounded, so the
    * oracle's identical tree yields identical bits. Built-in `corr()` is
    * a running-moment implementation whose result depends on partition
    * order — useless under a hash gate; this is the deterministic twin.
    * Shape at 100 TB: one partial+final hash aggregate, no shuffle of
    * facts, O(columns²) state per partition. */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity" -> "q", "l_extendedprice" -> "e",
      "l_discount" -> "d")
    // exact integer micro-units: Pearson r is scale-invariant, so the 1e6
    // factor cancels; decimal(38,0) sums/products stay exact (max value
    // ~1e11, squared ~1e22 ≪ 1e38) and DuckDB mirrors them in HUGEINT
    def dec(c: String) = round(col(c) * lit(1000000.0)).cast("decimal(38,0)")
    val sums =
      cols.map { case (c, a) => sum(dec(c)).as(s"s_$a") } ++
        cols.map { case (c, a) => sum(dec(c) * dec(c)).as(s"s_${a}${a}") } ++
        cols.combinations(2).toSeq.map { case Seq((c1, a1), (c2, a2)) =>
          sum(dec(c1) * dec(c2)).as(s"s_$a1$a2")
        }
    // materialize the single stats row once — without this, the 3-way
    // union of pair projections would re-run the aggregate (and rescan
    // lineitem) once per pair
    val a = Tables.lineitem(s, dir)
      .agg(count(lit(1)).as("n"), sums: _*)
      .localCheckpoint()
    def dbl(name: String) = col(name).cast("double")
    def varTerm(x: String) =
      dbl("n") * dbl(s"s_$x$x") - dbl(s"s_$x") * dbl(s"s_$x")
    def pairRow(p1: (String, String), p2: (String, String)) = {
      val (c1, a1) = p1; val (c2, a2) = p2
      a.select(lit(c1).as("col_a"), lit(c2).as("col_b"), col("n"),
        round((dbl("n") * dbl(s"s_$a1$a2") - dbl(s"s_$a1") * dbl(s"s_$a2"))
          / sqrt(varTerm(a1) * varTerm(a2)), 6).as("r"))
    }
    cols.combinations(2).toSeq
      .map { case Seq(p1, p2) => pairRow(p1, p2) }
      .reduce(_ unionByName _)
      .orderBy("col_a", "col_b")
  }

  /** Fixed-depth EWMA: the exponentially-weighted moving average every
    * monitoring/feature pipeline computes, truncated at [[ewmaDepth]]
    * lags so it is a PURE WINDOW EXPRESSION — no recursion, no state.
    * α = 1/2, so every weight α(1−α)^j = 2^−(j+1) is an EXACT binary
    * fraction: each product is a float exponent shift, and with the
    * summation order fixed (ascending lag, identical tree in the
    * oracle), the result is bit-deterministic. Leading edges renormalize
    * over the weights actually present (num/den), so row j < depth uses
    * its full available history instead of phantom zeros.
    *
    * Shape at scale: one shuffle by user_id, then per-row O(depth) lags
    * inside a single Window — the same cost envelope as [[windowLag]];
    * the truncation error vs the infinite EWMA is (1−α)^depth < 0.4%. */
  val ewmaDepth = 8

  def windowEwma(s: SparkSession, dir: String): DataFrame =
    windowEwmaOf(events(s, dir))

  def windowEwmaOf(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val terms = (0 until ewmaDepth).map { j =>
      val x = if (j == 0) col("value") else lag(col("value"), j).over(w)
      val wt = math.pow(0.5, j + 1)
      (when(x.isNotNull, x * lit(wt)).otherwise(lit(0.0)),
        when(x.isNotNull, lit(wt)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    eventsDf
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("ewma", round(num / den, 6))
      .withColumn("seq_in_user", row_number().over(w))
      .orderBy("user_id", "seq_in_user")
  }

  /** Robust per-group outlier detection: median + MAD (median absolute
    * deviation), flagging events where |value − median| exceeds
    * [[madK]] · 1.4826 · MAD — the standard robust z-score, immune to the
    * outliers it hunts (unlike mean/stddev, which the tail drags). The
    * data-quality gate a training pipeline runs over telemetry/metrics
    * columns before they poison a reward model.
    *
    * Determinism: exact interpolating medians (no transcendentals), IEEE
    * subtract/multiply/divide — identical bits in both engines; the flag
    * compares UNROUNDED doubles so no boundary row can disagree with the
    * oracle. Shape: two grouped exact-percentile passes over the stream +
    * two broadcast joins of the group-count-sized stats rows; at 100 TB
    * the exact percentile swaps for [[approxPercentile]]'s mergeable
    * sketch, same plan shape. mad is floored at 1e-12 so a degenerate
    * constant-valued group yields finite scores instead of ±Inf. */
  val madK = 3.0
  val madConsistency = 1.4826

  /** The (event_type, med, mad, madf) threshold table [[outlierMad]]
    * scores against — exposed so the STREAMING gate
    * ([[graft.streaming.EventStream.outlierGate]]) can probe the same
    * batch-computed artifact per micro-batch. */
  private[graft] def madThresholds(ev: DataFrame): DataFrame = {
    val med = ev.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    ev.join(broadcast(med), Seq("event_type"))
      .withColumn("absdev", abs(col("value") - col("med")))
      .groupBy("event_type")
      .agg(first(col("med")).as("med"),
        percentile(col("absdev"), lit(0.5)).as("mad"))
      .withColumn("madf", greatest(col("mad"), lit(1e-12)))
  }

  def outlierMad(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select("event_id", "event_type", "value")
    ev.join(broadcast(madThresholds(ev)), Seq("event_type"))
      .withColumn("absdev", abs(col("value") - col("med")))
      .filter(col("absdev") > lit(madK) * lit(madConsistency) * col("madf"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        round(col("absdev") / (lit(madConsistency) * col("madf")), 6)
          .as("robust_z"))
      .orderBy("event_id")
  }

  /** Quantile normalization — map each value to its empirical CDF
    * position (rank−1)/(n−1) within its event_type: the rank→uniform
    * feature transform (robust to any monotone distortion) every
    * feature-engineering pass reaches for. Deterministic: ranking breaks
    * value ties by event_id, and the emitted quantile is an exact
    * rational of two integers. Shape: one shuffle by group, two window
    * functions over the SAME partitioning (no second exchange). The
    * per-group total order is the oracle-checkable contract; at
    * deployment scale the transform swaps to inverse-CDF bucketing off
    * [[approxPercentile]]'s mergeable sketch, same output schema. */
  def quantileNormalize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
      .orderBy(col("value"), col("event_id"))
    val wAll = Window.partitionBy("event_type")
    events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("rk") - 1).cast("double") /
          (col("n") - 1).cast("double"), 6).as("quantile"))
      .orderBy("event_id")
  }

  /** Pivot: order counts + total price per priority × status (explicit
    * pivot values → deterministic schema, map-side combined). */
  def pivotAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("f_cnt"),
        col("O").as("o_cnt"), col("P").as("p_cnt"))
      .orderBy("o_orderpriority")

  /** UNPIVOT/melt — [[pivotAgg]]'s inverse and the other half of the
    * reshape pair every BI/feature layer needs: the per-user feature row
    * ([[userFeatures]]' per-type counts) melts to (user_id, metric,
    * value) long form. `stack` evaluates per row inside the scan
    * projection — ×#metrics row growth, zero shuffle added beyond the
    * upstream aggregate (scan-shaped at 100 TB, like every generator). */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    val metrics = userFeatureTypes.map(t => s"n_$t")
    val stackArgs = metrics.map(m => s"'$m', `$m`").mkString(", ")
    userFeatures(s, dir)
      .select(col("user_id"),
        expr(s"stack(${metrics.length}, $stackArgs) AS (metric, value)"))
      .filter(col("value") > 0) // long form drops absent measures
      .orderBy("user_id", "metric")
  }

  /** Hot-key-safe aggregation: salt the partial stage 16 ways, combine
    * partials. Bit-identical to the direct group-by (DECIMAL sums). */
  def saltedAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pc"),
        sum(col("value").cast("decimal(18,6)")).as("pv"))
      .groupBy(col("event_type"))
      .agg(sum(col("pc")).as("n_events"),
        sum(col("pv")).cast("double").as("total_value"))
      .orderBy("event_type")

  /** SALTED JOIN — the declarative hot-key mitigation for joins
    * ([[saltedAgg]] is the aggregation twin; PlanSpec pins the AQE
    * runtime half): the fact side derives a deterministic salt from a
    * per-ROW attribute, the dim side replicates ×[[joinSaltBuckets]] via
    * a `sequence` explode, and the join key widens to (key, salt) — a
    * hot key's rows spread over [[joinSaltBuckets]] tasks instead of one.
    * Result-identical to the plain join (each fact row matches exactly
    * its own salt replica); the oracle is the UNSALTED join. Dim
    * replication cost = ×B rows on the SMALL side only. */
  val joinSaltBuckets = 8

  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select("user_id", "event_id", "value")
    val dim = events(s, dir).groupBy("user_id")
      .agg(min(col("ts")).as("first_seen"), count(lit(1)).as("n_user_events"))
    val salted = ev.withColumn("salt",
      pmod(col("event_id"), lit(joinSaltBuckets)))
    val dimReplicated = dim.withColumn("salt",
      explode(sequence(lit(0L), lit(joinSaltBuckets - 1L))))
    salted.join(dimReplicated, Seq("user_id", "salt"))
      .select("user_id", "event_id", "value", "first_seen", "n_user_events")
      .orderBy("event_id")
  }

  /** Time-series resample + forward fill: each user's event values on a
    * regular hourly grid (min..max hour of their activity), gaps carried
    * forward from the last observation — the standard
    * gap-filling/regularization step before feature windows or model
    * training. Grid generation is a per-user `sequence` explode (rows ∝
    * activity span); the fill is one `last(ignoreNulls)` running window —
    * a single shuffle by user. */
  def resampleFfill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(s, dir)
    val span = e.groupBy("user_id").agg(
      date_trunc("hour", min(col("ts"))).as("t0"),
      date_trunc("hour", max(col("ts"))).as("t1"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR"))).as("grid_ts"))
    val perHour = Window.partitionBy(col("user_id"), date_trunc("hour", col("ts")))
      .orderBy(col("ts").desc, col("event_id").desc)
    val obs = e.withColumn("rn", row_number().over(perHour))
      .filter(col("rn") === 1)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("grid_ts"),
        col("value"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("grid_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "grid_ts"), "left")
      .withColumn("value_ffill", last(col("value"), ignoreNulls = true).over(fill))
      .withColumn("observed", col("value").isNotNull)
      .select("user_id", "grid_ts", "value_ffill", "observed")
      .orderBy("user_id", "grid_ts")
  }

  /** GK-sketch percentiles per event_type — the constant-memory twin of
    * [[percentileAgg]] (exact percentile sorts each group; the sketch is
    * the only viable form at 100 TB). ONE aggregation pass, mergeable
    * bounded partial state per group — at 100 TB the map-side combine
    * ships a ~10000-entry summary per (partition, group), never the
    * values. This sketch-only plan is the PRODUCTION face Bench times
    * under `approx_percentile`; the estimate is engine-specific, so the
    * DuckDB row lives on the verify-only twin
    * [[approxPercentileCheck]], which re-runs the sketch next to the
    * exact percentiles and attests the tolerance in-plan. The raw
    * estimates also stay observable via [[quantileBottomK]]'s
    * hash-oracled sketch twin. */
  def approxPercentile(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("pa"))
      .select(col("event_type"),
        element_at(col("pa"), 1).as("est_p50"),
        element_at(col("pa"), 2).as("est_p90"),
        element_at(col("pa"), 3).as("est_p99"))
      .orderBy("event_type")

  /** VERIFY-ONLY twin of [[approxPercentile]] (the inverse of the
    * benchOnly pattern: oracled by DuckDB, skipped by Bench so the
    * benched cost is the sketch's, not the exact sort's). Re-runs the
    * same GK sketch NEXT TO the exact interpolated percentiles and
    * emits the exact values plus a `within_tol` boolean proving, inside
    * the same plan, that each estimate falls in the exact ±5%-RANK
    * window (est_p50 ∈ [exact_p45, exact_p55], …, est_p99 ∈ [exact_p98,
    * max]). The boolean is hash-stable because the window is GENEROUS
    * relative to the estimator, not because the merge is deterministic:
    * QuantileSummaries merge results vary with partitioning/merge
    * order, but at accuracy=10000 the rank error bound is ~1e-4 —
    * orders of magnitude inside the ±5%-rank window — so any legal
    * merge order lands inside it. DuckDB pins the whole row as
    * `(type, exact_p50/p90/p99, TRUE)`. */
  def approxPercentileCheck(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("pa"),
        expr("percentile(value, array(0.45, 0.5, 0.55, 0.85, 0.9, " +
          "0.95, 0.98, 0.99, 1.0))").as("pe"))
      .select(col("event_type"),
        round(element_at(col("pe"), 2), 6).as("p50_exact"),
        round(element_at(col("pe"), 5), 6).as("p90_exact"),
        round(element_at(col("pe"), 8), 6).as("p99_exact"),
        (element_at(col("pa"), 1).between(
            element_at(col("pe"), 1), element_at(col("pe"), 3)) &&
          element_at(col("pa"), 2).between(
            element_at(col("pe"), 4), element_at(col("pe"), 6)) &&
          element_at(col("pa"), 3).between(
            element_at(col("pe"), 7), element_at(col("pe"), 9)))
          .as("within_tol"))
      .orderBy("event_type")

  /** Bottom-k sample size for [[quantileBottomK]]. Kept ≤ 1000 — Spark's
    * `spark.sql.optimizer.windowGroupLimitThreshold` (default 1000) only
    * rewrites `row_number ≤ k` filters into WindowGroupLimit below it;
    * at 1024 the plan silently fell back to a full per-group sort+shuffle
    * of every event (caught by `.explain`), at 1000 each partition prunes
    * to its local bottom-k before the exchange. */
  val qbK = 1000

  /** Bottom-k-by-hash quantile estimation per event_type — the
    * hash-ORACLED sketch twin of [[approxPercentile]], the same move
    * `kmv_distinct` makes for the HLL `approx_distinct`: keep each
    * group's [[qbK]] smallest md5-of-key hashes (a deterministic
    * uniform sample — mergeable: the bottom-k of a union is the
    * bottom-k of the bottom-ks, constant memory per group exactly like
    * a GK sketch), then take EXACT interpolated percentiles over the
    * sample. Expected rank error ~1.3/√k ≈ 4.1% at k=1000. Unlike the
    * engine-specific GK/KLL estimate, every step (hash order, sample
    * membership, interpolation) is replicable in DuckDB bit-for-bit
    * (quantile_cont ≡ Spark percentile, proven by rfm_segments'
    * boundaries) — so the sketch path itself gets a hash-checked row.
    * Scale: the per-group window is the oracle-exact face; at 100 TB
    * the scan pre-thins with `h < k·margin·2^60/n_g` before the window
    * (the negative_sample two-phase trick) — same results, no full
    * sort. */
  def quantileBottomK(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Long
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("h"), col("event_id"))
    events(s, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("h",
        md5Long(concat(lit("qbk:"), col("event_id").cast("string"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= qbK)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sample"),
        expr("percentile(value, array(0.5, 0.9, 0.99))").as("p"))
      .select(col("event_type"), col("n_sample"),
        round(element_at(col("p"), 1), 6).as("p50"),
        round(element_at(col("p"), 2), 6).as("p90"),
        round(element_at(col("p"), 3), 6).as("p99"))
      .orderBy("event_type")
  }

  /** Pre-thinning safety margin for [[quantileBottomKThinned]]: the scan
    * keeps h < margin·k·2^60/n_g, ~margin·k expected survivors per
    * group. The true k-th-smallest hash sits near k·2^60/n_g, so margin
    * 4 puts the cutoff 4× past it — P(any bottom-k hash above the
    * cutoff) is Chernoff-small (< e^{-k}), and the equality spec pins
    * the result bit-for-bit on the actual data anyway. 4·k·2^60/n_g
    * also cannot overflow: the branch below only divides when
    * n_g > margin·k, bounding the product by ~2^60. */
  val qbMargin = 4L

  /** The PRODUCTION face of [[quantileBottomK]] — the two-phase scan the
    * scaladoc there promises for 100 TB (the negative_sample trick): a
    * tiny per-group count, then a broadcast-join filter `h < cutoff`
    * that drops ~all rows BEFORE the per-group window, so the sort that
    * ranks bottom-k hashes sees ~margin·k rows per group instead of
    * n_g. Groups with n_g ≤ margin·k keep every row (cutoff = 2^60 ≥
    * any 60-bit hash). Results are row-for-row equal to the windowed
    * form — OpsSpec pins it at sf0.1 where the filter genuinely bites
    * (~96% of rows dropped) — so this rides Bench as a bench-only twin
    * (the rfm_segments_sketch pattern), not a second oracle row. */
  def quantileBottomKThinned(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Long
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("h",
        md5Long(concat(lit("qbk:"), col("event_id").cast("string"))))
    val counts = ev.groupBy("event_type").agg(count(lit(1)).as("n_g"))
    val cutoff = when(col("n_g") <= lit(qbMargin * qbK), lit(1L << 60))
      .otherwise(lit(1L << 60) / col("n_g") * lit(qbMargin * qbK))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("h"), col("event_id"))
    ev.join(broadcast(counts), Seq("event_type"))
      .filter(col("h") < cutoff)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= qbK)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sample"),
        expr("percentile(value, array(0.5, 0.9, 0.99))").as("p"))
      .select(col("event_type"), col("n_sample"),
        round(element_at(col("p"), 1), 6).as("p50"),
        round(element_at(col("p"), 2), 6).as("p90"),
        round(element_at(col("p"), 3), 6).as("p99"))
      .orderBy("event_type")
  }

  /** HLL++ approximate distinct users per event_type — the mergeable
    * constant-memory sketch path, and the reason it exists: exact
    * distinct-count at 100 TB shuffles every (type, user) pair; the HLL
    * register array is a few KB per group and merges by register-max
    * (commutative, associative — the estimate is independent of merge
    * order). This sketch-only plan is the PRODUCTION face Bench times
    * under `approx_distinct`; the estimate is engine-specific, so the
    * DuckDB row lives on the verify-only twin [[approxDistinctCheck]].
    * rsd is pinned at 0.02 (the default 0.05 sketch misses a 5% gate at
    * NDV=1500 — sf0.1, measured). The raw estimate also stays
    * observable via [[graft.ops.ProfileQueries.kmvDistinct]]'s
    * hash-oracled twin. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("est"))
      .orderBy("event_type")

  /** VERIFY-ONLY twin of [[approxDistinct]] (the inverse of the
    * benchOnly pattern: oracled by DuckDB, skipped by Bench so the
    * benched cost is the sketch's, not the exact countDistinct's the
    * sketch exists to avoid). Computes the same rsd=0.02 HLL next to
    * the EXACT distinct count and emits the exact count plus a
    * `within_tol` boolean comparing them inside the same plan
    * (|est − exact|·100 ≤ 10·exact, all BIGINT — a 5σ gate at
    * rsd=0.02; rsd is a STANDARD-DEVIATION target, not a bound).
    * HLL's register-max merge is order-independent, so the boolean is
    * bit-stable under any partitioning and DuckDB pins the full row as
    * `(type, exact, TRUE)` — a hash-exact oracle for the sketch path. */
  def approxDistinctCheck(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("est"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("est") - col("exact_users")) * 100 <=
          col("exact_users") * 10).as("within_tol"))
      .orderBy("event_type")

  /** Explicit GROUPING SETS ((type, hour), (type), ()) — the general form
    * behind rollup/cube, one pass over the fact with per-set partial
    * aggregation. The aggregation level is derived from the key null
    * pattern (the group keys are never null in the data), which is
    * portable across engines — no grouping_id() bit-order dependency. */
  def groupingSetsAgg(s: SparkSession, dir: String): DataFrame = {
    val lvl = when(col("event_type").isNull, 2)
      .when(col("hour_of_day").isNull, 1).otherwise(0)
    events(s, dir)
      .withColumn("hour_of_day", hour(col("ts")))
      .groupingSets(
        Seq(Seq(col("event_type"), col("hour_of_day")),
          Seq(col("event_type")), Seq()),
        col("event_type"), col("hour_of_day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .withColumn("lvl", lvl)
      .select("lvl", "event_type", "hour_of_day", "n_events", "total_value")
      .orderBy(col("lvl"), col("event_type").asc_nulls_first,
        col("hour_of_day").asc_nulls_first)
  }

  /** ROLLING event-time window (RANGE frame): per user, the count and
    * value-sum of their events in the trailing hour — rate-limit /
    * burst-detection features, the frame ROWS BETWEEN can't express
    * (events are irregular; the lookback is TIME, not row count). One
    * shuffle by user; the range frame slides two pointers over each
    * sorted partition — linear, no per-row rescan. Ties on the sort key
    * (same epoch second) are RANGE-frame peers on both engines. */
  def windowRolling(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-3600L, 0L)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        round(sum(col("value").cast("decimal(18,6)")).over(w)
          .cast("double"), 6))
      .orderBy("event_id")
  }

  /** Per-user event-time navigation: previous value (lag), delta, running
    * total, and position — the feature-engineering window suite. One
    * shuffle by user, one sort per partition serves all four functions. */
  def windowLag(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("delta", col("value") - col("prev_value"))
      .withColumn("running_value",
        sum(col("value").cast("decimal(18,6)")).over(wRun).cast("double"))
      .withColumn("seq_in_user", row_number().over(w))
      .orderBy("user_id", "seq_in_user")
  }

  /** Window half-width and the range-join bucket width (both 2h). */
  val rangeJoinBucketSec = 7200L

  /** RANGE JOIN, bucketed: count the `error` events (any user) falling
    * inside ±2h windows anchored at user 0's `signup` events — a genuine
    * NON-equi interval join (no shared key between the sides).
    *
    * The naive plan is a cartesian product with a range residual — O(n·m)
    * at any scale. The bucketed formulation synthesizes an equi key: each
    * window EXPLODES into the fixed-width time buckets it overlaps
    * (window span / bucket width rows — here ≤ 3), each probe row has
    * exactly ONE bucket, and the join runs on the bucket id with the
    * range predicate left as the residual. Work becomes O(m·k + matching
    * pairs) with per-key skew bounded by events-per-bucket — the standard
    * interval-join shape (Flink's interval join / Databricks' range-join
    * hints do exactly this). The window side here is tiny, so it also
    * broadcasts: the fact side never shuffles at all.
    *
    * The same rewrite is ALSO available declaratively: with
    * `spark.graft.rangeJoin.bucketWidth` set, the
    * [[graft.plans.RangeJoinBucketing]] optimizer rule turns a naive
    * `p >= lo && p < hi` join into this plan automatically. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bkt = rangeJoinBucketSec
    val windows = events(s, dir)
      .filter(col("event_type") === "signup" && col("user_id") === 0)
      .select(col("event_id").as("window_id"),
        (unix_timestamp(col("ts")) - bkt).as("w_start"),
        (unix_timestamp(col("ts")) + bkt).as("w_end"))
    val wBuckets = windows.withColumn("bucket",
      explode(sequence(expr(s"w_start div $bkt"), expr(s"w_end div $bkt"))))
    val probes = events(s, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("sec"))
      .withColumn("bucket", expr(s"sec div $bkt"))
    val matched = probes
      .join(broadcast(wBuckets), Seq("bucket"))
      .filter(col("sec") >= col("w_start") && col("sec") < col("w_end"))
      .groupBy("window_id").agg(
        count(lit(1)).as("n_errors"),
        countDistinct(col("user_id")).as("n_users"))
    windows.join(matched, Seq("window_id"), "left")
      .select(col("window_id"), col("w_start"), col("w_end"),
        coalesce(col("n_errors"), lit(0L)).as("n_errors"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy("window_id")
  }

  /** The same interval join as [[rangeJoin]], but written as the NAIVE
    * band join (`sec >= w_start && sec < w_end`) and executed under the
    * [[graft.plans.RangeJoinBucketing]] optimizer rule — proving the
    * declarative path end-to-end under the driver gate, not just in
    * RangeJoinRuleSpec: the user writes the O(n·m) formulation, the engine
    * plans the bucketed one. Runs on a child session (shared context,
    * isolated conf) so the rule's conf can't leak into sibling queries. */
  def rangeJoinAuto(s: SparkSession, dir: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.graft.rangeJoin.bucketWidth", rangeJoinBucketSec.toString)
    val bkt = rangeJoinBucketSec
    val windows = events(s2, dir)
      .filter(col("event_type") === "signup" && col("user_id") === 0)
      .select(col("event_id").as("window_id"),
        (unix_timestamp(col("ts")) - bkt).as("w_start"),
        (unix_timestamp(col("ts")) + bkt).as("w_end"))
    val probes = events(s2, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("sec"))
    val matched = probes
      .join(windows, col("sec") >= col("w_start") && col("sec") < col("w_end"))
      .groupBy("window_id").agg(
        count(lit(1)).as("n_errors"),
        countDistinct(col("user_id")).as("n_users"))
    windows.join(matched, Seq("window_id"), "left")
      .select(col("window_id"), col("w_start"), col("w_end"),
        coalesce(col("n_errors"), lit(0L)).as("n_errors"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy("window_id")
  }

  /** Ordered-stage conversion funnel (signup → view → purchase) with a
    * per-stage conversion window of [[funnelWindowHours]] — the product-
    * analytics staple. Each stage is "first qualifying event strictly
    * after the previous stage, within the window", computed as a
    * filter + join + min-aggregate; every join and aggregate keys on
    * user_id, so AQE reuses ONE hash partitioning across all three
    * stages and the funnel costs a single logical shuffle of the event
    * stream regardless of stage count. */
  val funnelWindowHours = 24

  def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select("user_id", "event_type", "ts")
    def stage(prev: DataFrame, prevT: String, etype: String, out: String) =
      e.filter(col("event_type") === etype)
        .join(prev.select("user_id", prevT), Seq("user_id"))
        .filter(col("ts") > col(prevT) &&
          col("ts") <= col(prevT) + expr(s"INTERVAL $funnelWindowHours HOURS"))
        .groupBy("user_id").agg(min(col("ts")).as(out))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t_signup"))
    val s2 = stage(s1, "t_signup", "view", "t_view")
    val s3 = stage(s2, "t_view", "purchase", "t_purchase")
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_signup"), col("t_view"), col("t_purchase"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_view").isNotNull, 2).otherwise(1).as("stage_depth"))
      .orderBy("user_id")
  }

  /** Cohort retention by acquisition channel: cohort = the user's FIRST
    * event's type (deterministic argmin by (ts, event_id) — a window, not
    * an unstable arg_min); cells = distinct active users per (channel,
    * weeks since the cohort week), plus the retention ratio against the
    * cohort size. First-touch window, activity distinct, and the cell
    * aggregate all key on user_id / small keys; cohort sizes ride back in
    * as a broadcast. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select("user_id", "event_id", "event_type", "ts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val first = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("channel"),
        date_trunc("week", col("ts")).as("cohort_week"))
    val active = e
      .select(col("user_id"), date_trunc("week", col("ts")).as("active_week"))
      .distinct()
    val sizes = first.groupBy("channel")
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    first.join(active, Seq("user_id"))
      .groupBy(col("channel"),
        ((unix_timestamp(col("active_week"))
          - unix_timestamp(col("cohort_week"))) / 604800).cast("long")
          .as("week_n"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), Seq("channel"))
      .select(col("channel"), col("week_n"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
      .orderBy("channel", "week_n")
  }

  /** Exact per-group OLS trend: slope/intercept of value over event DAY
    * via the closed-form normal equations, with every sum computed in
    * DECIMAL/BIGINT (order-independent — a float Σxy would differ across
    * engines at the last ulp) and ONE double division at the end:
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
    * intercept = (Σy·den − num·Σx) / (n·den). One partial+final hash
    * aggregate — the regression never sees a second pass or a window. */
  val trendEpoch = "2024-01-01"

  def trendFit(s: SparkSession, dir: String): DataFrame =
    trendFitOf(events(s, dir))

  private[graft] def trendFitOf(e: DataFrame): DataFrame = {
    val x = datediff(col("ts").cast("date"), lit(trendEpoch).cast("date"))
      .cast("long")
    val y = col("value").cast("decimal(18,6)")
    val agg = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(x * x).as("sxx"),
      sum(y).as("sy"), sum(y * x).as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    agg.select(col("event_type"), col("n"),
      round(num.cast("double") / den.cast("double"), 6).as("slope"),
      round((col("sy") * den - num * col("sx")).cast("double")
        / (col("n") * den).cast("double"), 6).as("intercept"))
      .orderBy("event_type")
  }

  /** First-order Markov transition matrix over each user's event
    * sequence: P(next event type | current event type) — the sequence-
    * analytics primitive behind next-action prediction, path analysis,
    * and behavioral anomaly scoring. One window pass (lead over the
    * per-user timeline — shuffle by user_id, unskewable at per-user
    * grain), one count aggregate at (from,to) grain, and the row-
    * normalizing total rides a tiny window over the aggregated matrix
    * (≤ |types|² rows), never the event stream. Ordering ties break on
    * event_id, so the sequence — and the matrix — is deterministic. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val t = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(seq))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val row = Window.partitionBy("from_type")
    t.select(col("from_type"), col("to_type"), col("n_transitions"),
        round(col("n_transitions").cast("double") /
          sum(col("n_transitions")).over(row), 6).as("prob"))
      .orderBy("from_type", "to_type")
  }

  /** Chi-square contingency table: is event type independent of ISO
    * weekday? Observed cell counts, expected counts under independence
    * (row·col margins / N), and each cell's χ² contribution — the
    * categorical-association test behind drift detection and feature
    * screening. One count aggregate at cell grain; both margins and the
    * grand total are re-aggregates of the ≤|types|·7 CELL table (never a
    * second pass over events) riding in as broadcasts. Margins are exact
    * BIGINTs, so expected/contrib are single deterministic IEEE
    * divisions per cell — no FP-order ambiguity anywhere. */
  def chiSquare(s: SparkSession, dir: String): DataFrame = {
    val obs = events(s, dir)
      .groupBy(col("event_type"), (weekday(col("ts")) + 1).as("isodow"))
      .agg(count(lit(1)).as("observed"))
    val rowM = obs.groupBy("event_type").agg(sum("observed").as("row_tot"))
    val colM = obs.groupBy("isodow").agg(sum("observed").as("col_tot"))
    val n = obs.agg(sum("observed").as("n_total"))
    val expected = col("row_tot") * col("col_tot") / col("n_total")
    obs.join(broadcast(rowM), Seq("event_type"))
      .join(broadcast(colM), Seq("isodow"))
      .crossJoin(broadcast(n))
      .select(col("event_type"), col("isodow"), col("observed"),
        round(expected, 6).as("expected"),
        round(pow(col("observed") - expected, 2) / expected, 6)
          .as("chi2_contrib"))
      .orderBy("event_type", "isodow")
  }

  /** Time-weighted average value per user (TWAP — the IoT/finance
    * aggregate where a reading holds until the next one): each event's
    * value is weighted by the MICROSECOND interval to the user's next
    * event; the last event carries no interval. One lead window by
    * user, then one aggregate; Σ(value·dt) accumulates in DECIMAL ×
    * BIGINT so the sum is exact and order-independent (a double Σ over
    * thousands of intervals differs across engines by summation order),
    * with ONE double division at the end. */
  def twap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val dt = unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))
    events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("dt_us", dt)
      .filter(col("dt_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt_us")).as("span_us"),
        sum(col("v") * col("dt_us")).as("vdt"))
      .select(col("user_id"), col("n_intervals"), col("span_us"),
        round(col("vdt").cast("double") / col("span_us").cast("double"), 6)
          .as("twap"))
      .orderBy("user_id")
  }

  /** Top-k session paths: the ordered event-type journey of each
    * 30-minute-gap session, ranked by how many sessions follow it — the
    * clickstream path-analysis operator behind funnels you haven't
    * declared yet. Sessionization here is the WINDOW formulation (lag
    * gap flag + running sum = session id) rather than `session_window`,
    * because it keeps every step SQL-oracle-expressible; `sessionize`
    * covers the native-operator path. Both windows and the per-session
    * collect share ONE user-keyed shuffle; the path popularity aggregate
    * runs over session-grain rows (|sessions| ≪ |events|), and the
    * top-k is a TakeOrderedAndProject over path-grain rows. The ordered
    * path is built engine-side via array_sort on (ts, event_id) structs
    * — bounded by session length, deterministic because the sort key is
    * unique. */
  val sessionPathTopK = 20

  def sessionPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = unix_micros(col("ts")) -
      unix_micros(lag(col("ts"), 1).over(w))
    val e = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_sess",
        when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(w))
    e.groupBy(col("user_id"), col("session_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))), x => x.getField("event_type")), ">")
        .as("path"),
        count(lit(1)).as("n_events"))
      .groupBy(col("path"), col("n_events"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(sessionPathTopK)
  }

  /** RFM customer segmentation — recency / frequency / monetary
    * quintiles and the concatenated segment label, the marketing-BI
    * staple. One per-customer aggregate of orders (monetary in DECIMAL,
    * exact), then three ntile(5) windows over the CUSTOMER-grain rows —
    * the deliberate single-partition global ranking of an aggregated
    * side (|customers| ≪ |orders|; at true scale swap ntile for
    * percentile-bucket joins, the approx_percentile path). Every window
    * orders with c_custkey as the tiebreak, so quintile assignment is
    * deterministic. The recency anchor is the corpus max order date
    * (one broadcast row), not wall-clock — rerunnable. */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
    val anchor = Tables.orders(s, dir)
      .agg(max(col("o_orderdate")).as("anchor"))
    val scored = perCust.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("anchor"), col("last_order")).cast("long"))
    // score 5 = best (most recent / most frequent / highest spend)
    val r = ntile(5).over(Window.orderBy(col("recency_days").desc,
      col("o_custkey")))
    val f = ntile(5).over(Window.orderBy(col("frequency"), col("o_custkey")))
    val m = ntile(5).over(Window.orderBy(col("monetary"), col("o_custkey")))
    scored.select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary").cast("double").as("monetary"),
        r.as("r_score"), f.as("f_score"), m.as("m_score"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .orderBy("o_custkey")
  }

  /** Customer-grain RFM base for the bucket-join variants: recency /
    * frequency / monetary per customer, anchor = corpus max order date. */
  private def rfmScored(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
    val anchor = Tables.orders(s, dir)
      .agg(max(col("o_orderdate")).as("anchor"))
    perCust.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("anchor"), col("last_order")).cast("long"))
      .withColumn("monetary", col("monetary").cast("double"))
  }

  /** Score every customer against a broadcast 1-row boundary table.
    * bucket(v) = 1 + #boundaries strictly below v; recency inverts
    * (smaller = more recent = better) to keep 5 = best on every axis. */
  private def rfmBucketJoin(scored: DataFrame, bounds: DataFrame): DataFrame = {
    def above(v: Column, b: Column): Column =
      (1 to 4).map(i => when(v > element_at(b, i), 1).otherwise(0))
        .reduce(_ + _)
    scored.crossJoin(broadcast(bounds))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"),
        (lit(5) - above(col("recency_days"), col("rq"))).as("r_score"),
        (lit(1) + above(col("frequency"), col("fq"))).as("f_score"),
        (lit(1) + above(col("monetary"), col("mq"))).as("m_score"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .orderBy("o_custkey")
  }

  private val rfmQuantiles = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))

  /** Window-free twin of [[rfmSegments]] — the BUCKET-JOIN variant:
    * quintile boundaries come from one keyless EXACT `percentile`
    * aggregate over the customer-grain rows (still a single 1-row
    * reduction — no global sort, no window; DuckDB's `quantile_cont`
    * reproduces the linear-interpolation boundaries bit-for-bit, so this
    * row is hash-checked by the driver), broadcast as one row, and each
    * customer scores itself against the four boundaries. ZERO window
    * operators in the plan (the spec pins this), so the single-partition
    * ntile ranking the exact form deliberately accepts at customer grain
    * disappears entirely. At true 100 TB grain the exact percentile's
    * per-value-map state is the limiting factor; [[rfmSegmentsSketch]]
    * swaps it for the GK sketch with identical downstream shape. */
  def rfmSegmentsBucketed(s: SparkSession, dir: String): DataFrame = {
    val scored = rfmScored(s, dir)
    val bounds = scored.agg(
      percentile(col("recency_days"), rfmQuantiles).as("rq"),
      percentile(col("frequency"), rfmQuantiles).as("fq"),
      percentile(col("monetary"), rfmQuantiles).as("mq"))
    rfmBucketJoin(scored, bounds)
  }

  /** The 100 TB form of [[rfmSegmentsBucketed]]: boundaries from the
    * GK approx_percentile sketch (mergeable bounded partial states — one
    * shuffle of sketches regardless of cardinality). Sketch boundaries
    * aren't reproducible in DuckDB (different algorithm), so this twin is
    * spec-verified instead of oracled: AnalyticsSpec pins ≥90%
    * per-dimension agreement with the exact ntile form and Bench carries
    * it as a bench-only query. */
  def rfmSegmentsSketch(s: SparkSession, dir: String): DataFrame = {
    val scored = rfmScored(s, dir)
    val bounds = scored.agg(
      percentile_approx(col("recency_days"), rfmQuantiles, lit(10000)).as("rq"),
      percentile_approx(col("frequency"), rfmQuantiles, lit(10000)).as("fq"),
      percentile_approx(col("monetary"), rfmQuantiles, lit(10000)).as("mq"))
    rfmBucketJoin(scored, bounds)
  }

  /** Per-user FEATURE-STORE assembly — the feature-engineering operator
    * every ML pipeline runs before training: one row per user with
    * activity counts, per-type rates (conditional aggregation over the
    * known type enum — no pivot shuffle), recency span, active days,
    * and exact value statistics. EVERYTHING rides ONE partial+final
    * hash aggregate keyed by user — zero joins, zero windows — so at
    * 100 TB the operator costs exactly one shuffle of partial aggregate
    * states. Value sums go through DECIMAL (order-independent); ratios
    * divide exact integers once at the end. */
  val userFeatureTypes = Seq("click", "error", "purchase", "signup", "view")

  def userFeatures(s: SparkSession, dir: String): DataFrame = {
    val typeCounts = userFeatureTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      countDistinct(col("ts").cast("date")).as("active_days"),
      min(col("ts")).as("first_seen"),
      max(col("ts")).as("last_seen"),
      sum(col("value").cast("decimal(18,6)")).as("sum_value"),
      max(col("value")).as("max_value")) ++ typeCounts
    events(s, dir)
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(Seq(col("user_id"), col("n_events"), col("active_days"),
        col("first_seen"), col("last_seen"),
        round(col("sum_value").cast("double") / col("n_events"), 6)
          .as("mean_value"),
        col("max_value"),
        round(col("n_events").cast("double") / col("active_days"), 6)
          .as("events_per_active_day")) ++
        userFeatureTypes.map(t => col(s"n_$t")): _*)
      .orderBy("user_id")
  }

  /** Consecutive-duplicate suppression — the sensor/event-stream
    * cleaning primitive (collapse repeated identical readings, keep the
    * first of each run): drop an event when its type equals the
    * PREVIOUS event's type on the same user timeline. One lag window by
    * user (unskewable per-user grain), then a scan-side filter — the
    * batch twin of streaming `dropDuplicatesWithinWatermark` for the
    * run-length case it can't express. */
  def dedupConsecutive(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("event_type") =!= col("prev_type"))
      .select("event_id", "user_id", "ts", "event_type")
      .orderBy("event_id")
  }

  /** Multi-touch attribution over the event stream: every 'purchase'
    * conversion credits the user's touch events (click / view / signup)
    * falling strictly inside its (previous purchase, purchase) interval
    * — so each touch maps to at most one conversion. Three standard
    * models in one pass: first-touch, last-touch (integer counts), and
    * linear with credit in exact integer PARTS-PER-MILLION — floor(1e6 ·
    * channel-count / n) per conversion, integer division in BOTH engines
    * — so every output is an order-independent BIGINT sum; no float
    * accumulation anywhere (same micro-unit trick as dedup_pagerank).
    *
    * Shape: one user-keyed window for conversion intervals, one per-user
    * equi-join with range predicates (fan bounded by per-user event
    * counts — the sessionize skew profile), one conv-keyed window stack
    * (one exchange, three sorts), two hash aggs. The conversion side of
    * the join is a per-user slice of events — co-partitioned with the
    * touch side on user_id, no broadcast needed at any scale. */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, dir)
    val wconv = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val conv = ev.filter(col("event_type") === "purchase")
      .withColumn("prev_ts", lag(col("ts"), 1).over(wconv))
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"), col("prev_ts"))
    val touch = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("ts").as("touch_ts"), col("event_id").as("touch_eid"))
    val mapped = touch.join(conv, Seq("user_id"))
      .filter(col("touch_ts") < col("conv_ts") &&
        (col("prev_ts").isNull || col("touch_ts") > col("prev_ts")))
    val byConv = Window.partitionBy(col("conv_id"))
    val ranked = mapped
      .withColumn("n", count(lit(1)).over(byConv))
      .withColumn("ra", row_number().over(
        byConv.orderBy(col("touch_ts"), col("touch_eid"))))
      .withColumn("rd", row_number().over(
        byConv.orderBy(col("touch_ts").desc, col("touch_eid").desc)))
    ranked.groupBy(col("conv_id"), col("channel"))
      .agg(count(lit(1)).as("cnt"), max(col("n")).as("n"),
        sum(when(col("ra") === 1, 1L).otherwise(0L)).as("first_t"),
        sum(when(col("rd") === 1, 1L).otherwise(0L)).as("last_t"))
      .withColumn("lin_ppm", expr("(1000000 * cnt) div n"))
      .groupBy(col("channel"))
      .agg(sum(col("cnt")).as("n_touches"),
        sum(col("first_t")).as("first_touch"),
        sum(col("last_t")).as("last_touch"),
        sum(col("lin_ppm")).as("linear_ppm"))
      .orderBy("channel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "attribution" -> (attribution _),
    "user_features" -> (userFeatures _),
    "dedup_consecutive" -> (dedupConsecutive _),
    "rfm_segments" -> (rfmSegments _),
    "rfm_segments_bucketed" -> (rfmSegmentsBucketed _),
    "session_paths" -> (sessionPaths _),
    "chi_square" -> (chiSquare _),
    "twap" -> (twap _),
    "event_transitions" -> (eventTransitions _),
    "funnel" -> (funnel _),
    "cohort_retention" -> (cohortRetention _),
    "trend_fit" -> (trendFit _),
    "range_join_auto" -> (rangeJoinAuto _),
    "range_join" -> (rangeJoin _),
    "window_rolling" -> (windowRolling _),
    "salted_join" -> (saltedJoin _),
    "grouping_sets_agg" -> (groupingSetsAgg _),
    "window_lag" -> (windowLag _),
    "sessionize" -> (sessionize _),
    "window_agg" -> (windowAgg _),
    "cube_agg" -> (cubeAgg _),
    "percentile_agg" -> (percentileAgg _),
    "outlier_mad" -> (outlierMad _),
    "window_ewma" -> (windowEwma _),
    "corr_matrix" -> (corrMatrix _),
    "quantile_normalize" -> (quantileNormalize _),
    "pivot_agg" -> (pivotAgg _),
    "unpivot_metrics" -> (unpivotMetrics _),
    "salted_agg" -> (saltedAgg _),
    "approx_distinct_check" -> (approxDistinctCheck _),
    "approx_percentile_check" -> (approxPercentileCheck _),
    "quantile_bottomk" -> (quantileBottomK _),
    "resample_ffill" -> (resampleFfill _))

  // range_join and range_join_auto compute the same result by contract —
  // one hand-bucketed, one rewritten by the optimizer rule — so they share
  // one oracle
  private val rangeJoinSql =
      s"""WITH w AS (
         |  SELECT event_id AS window_id,
         |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) - $rangeJoinBucketSec AS w_start,
         |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + $rangeJoinBucketSec AS w_end
         |  FROM events WHERE event_type = 'signup' AND user_id = 0),
         |p AS (
         |  SELECT event_id, user_id,
         |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
         |  FROM events WHERE event_type = 'error'),
         |m AS (
         |  SELECT w.window_id, count(*) AS n_errors,
         |    count(DISTINCT p.user_id) AS n_users
         |  FROM p JOIN w ON p.sec >= w.w_start AND p.sec < w.w_end
         |  GROUP BY w.window_id)
         |SELECT w.window_id, w.w_start, w.w_end,
         |  coalesce(m.n_errors, 0) AS n_errors,
         |  coalesce(m.n_users, 0) AS n_users
         |FROM w LEFT JOIN m ON w.window_id = m.window_id
         |ORDER BY w.window_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // The sketch *_check twins oracle their EXACT companions + a
    // within_tol boolean the Spark plan proves about its own estimate;
    // DuckDB pins (group, exact, TRUE) bit-for-bit. quantile_cont ≡
    // Spark percentile (established by rfm_segments' boundary
    // equality). The sketch-only production faces ride Bench as
    // benchOnly entries under the unsuffixed names.
    "approx_distinct_check" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS within_tol
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "approx_percentile_check" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.50), 6) AS p50_exact,
        |  round(quantile_cont(value, 0.90), 6) AS p90_exact,
        |  round(quantile_cont(value, 0.99), 6) AS p99_exact,
        |  TRUE AS within_tol
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "attribution" ->
      """WITH conv AS (
        |  SELECT user_id, event_id AS conv_id, ts AS conv_ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_type AS channel, ts AS touch_ts,
        |         event_id AS touch_eid
        |  FROM events WHERE event_type IN ('click', 'view', 'signup')),
        |mapped AS (
        |  SELECT t.channel, t.touch_ts, t.touch_eid, c.conv_id
        |  FROM touch t JOIN conv c USING (user_id)
        |  WHERE t.touch_ts < c.conv_ts
        |    AND (c.prev_ts IS NULL OR t.touch_ts > c.prev_ts)),
        |ranked AS (
        |  SELECT channel, conv_id,
        |    count(*) OVER (PARTITION BY conv_id) AS n,
        |    row_number() OVER (PARTITION BY conv_id
        |                       ORDER BY touch_ts, touch_eid) AS ra,
        |    row_number() OVER (PARTITION BY conv_id
        |                       ORDER BY touch_ts DESC, touch_eid DESC) AS rd
        |  FROM mapped),
        |pc AS (
        |  SELECT conv_id, channel, CAST(count(*) AS BIGINT) AS cnt,
        |    max(n) AS n,
        |    CAST(sum(CASE WHEN ra = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS first_t,
        |    CAST(sum(CASE WHEN rd = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS last_t
        |  FROM ranked GROUP BY 1, 2)
        |SELECT channel, CAST(sum(cnt) AS BIGINT) AS n_touches,
        |  CAST(sum(first_t) AS BIGINT) AS first_touch,
        |  CAST(sum(last_t) AS BIGINT) AS last_touch,
        |  CAST(sum((1000000 * cnt) // n) AS BIGINT) AS linear_ppm
        |FROM pc GROUP BY channel ORDER BY channel""".stripMargin,
    "user_features" -> {
      val typeCols = userFeatureTypes.map(t =>
        s"""  CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)
           |       AS BIGINT) AS n_$t""".stripMargin).mkString(",\n")
      s"""SELECT user_id, count(*) AS n_events,
         |  count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
         |    AS active_days,
         |  min(CAST(ts AS TIMESTAMP)) AS first_seen,
         |  max(CAST(ts AS TIMESTAMP)) AS last_seen,
         |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |        / count(*), 6) AS mean_value,
         |  max(value) AS max_value,
         |  round(CAST(count(*) AS DOUBLE) /
         |        count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)), 6)
         |    AS events_per_active_day,
         |$typeCols
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },
    "dedup_consecutive" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |FROM l
        |WHERE prev_type IS NULL OR event_type <> prev_type
        |ORDER BY event_id""".stripMargin,
    "rfm_segments_bucketed" -> {
      // quantile_cont reproduces Spark's exact `percentile` (both are
      // linear interpolation at index p*(n-1)); bucket = count of
      // boundaries strictly below the value
      def above(v: String, arr: String): String =
        (1 to 4).map(i => s"(CASE WHEN $v > $arr[$i] THEN 1 ELSE 0 END)")
          .mkString(" + ")
      val r = s"5 - (${above("sc.recency_days", "b.rq")})"
      val f = s"1 + (${above("sc.frequency", "b.fq")})"
      val m = s"1 + (${above("sc.monetary", "b.mq")})"
      s"""WITH pc AS (
         |  SELECT o_custkey, max(o_orderdate) AS last_order,
         |         count(*) AS frequency,
         |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
         |  FROM orders GROUP BY 1),
         |a AS (SELECT max(o_orderdate) AS anchor FROM orders),
         |sc AS (
         |  SELECT o_custkey,
         |    CAST(date_diff('day', last_order, anchor) AS BIGINT)
         |      AS recency_days,
         |    frequency, CAST(monetary AS DOUBLE) AS monetary
         |  FROM pc CROSS JOIN a),
         |b AS (
         |  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rq,
         |         quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fq,
         |         quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mq
         |  FROM sc)
         |SELECT sc.o_custkey, sc.recency_days,
         |  CAST(sc.frequency AS BIGINT) AS frequency, sc.monetary,
         |  $r AS r_score, $f AS f_score, $m AS m_score,
         |  CAST($r AS VARCHAR) || CAST($f AS VARCHAR) || CAST($m AS VARCHAR)
         |    AS segment
         |FROM sc CROSS JOIN b ORDER BY sc.o_custkey""".stripMargin
    },
    "rfm_segments" ->
      """WITH pc AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order,
        |         count(*) AS frequency,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |  FROM orders GROUP BY 1),
        |a AS (SELECT max(o_orderdate) AS anchor FROM orders),
        |sc AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', last_order, anchor) AS BIGINT)
        |      AS recency_days,
        |    frequency, monetary
        |  FROM pc CROSS JOIN a)
        |SELECT o_custkey, recency_days, frequency,
        |  CAST(monetary AS DOUBLE) AS monetary,
        |  ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
        |  ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
        |  ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score,
        |  CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
        |       AS VARCHAR) ||
        |  CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS VARCHAR) ||
        |  CAST(ntile(5) OVER (ORDER BY monetary, o_custkey) AS VARCHAR)
        |    AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin,
    "session_paths" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |         OR epoch_us(CAST(ts AS TIMESTAMP))
         |            - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
         |            > 1800000000
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
         |                                ORDER BY ts, event_id) AS session_id
         |  FROM g),
         |p AS (
         |  SELECT user_id, session_id,
         |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
         |    count(*) AS n_events
         |  FROM s GROUP BY 1, 2)
         |SELECT path, n_events, count(*) AS n_sessions
         |FROM p GROUP BY 1, 2
         |ORDER BY n_sessions DESC, path LIMIT $sessionPathTopK""".stripMargin,
    "chi_square" ->
      """WITH obs AS (
        |  SELECT event_type, isodow(CAST(ts AS TIMESTAMP)) AS isodow,
        |         count(*) AS observed
        |  FROM events GROUP BY 1, 2),
        |rm AS (SELECT event_type, CAST(sum(observed) AS BIGINT) AS row_tot
        |       FROM obs GROUP BY 1),
        |cm AS (SELECT isodow, CAST(sum(observed) AS BIGINT) AS col_tot
        |       FROM obs GROUP BY 1),
        |n AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM obs)
        |SELECT obs.event_type, obs.isodow, observed,
        |  round(CAST(row_tot AS DOUBLE) * col_tot / n_total, 6) AS expected,
        |  round(pow(observed - CAST(row_tot AS DOUBLE) * col_tot / n_total, 2)
        |        / (CAST(row_tot AS DOUBLE) * col_tot / n_total), 6)
        |    AS chi2_contrib
        |FROM obs JOIN rm USING (event_type) JOIN cm USING (isodow)
        |CROSS JOIN n
        |ORDER BY event_type, isodow""".stripMargin,
    "twap" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(CAST(ts AS TIMESTAMP)) AS dt_us
        |  FROM events)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(dt_us) AS BIGINT) AS span_us,
        |  round(CAST(sum(v * dt_us) AS DOUBLE) /
        |        CAST(sum(dt_us) AS DOUBLE), 6) AS twap
        |FROM iv WHERE dt_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "event_transitions" ->
      """WITH seq AS (
        |  SELECT event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type, to_type, count(*) AS n_transitions
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_transitions,
        |  round(CAST(n_transitions AS DOUBLE) /
        |        sum(n_transitions) OVER (PARTITION BY from_type), 6) AS prob
        |FROM t ORDER BY from_type, to_type""".stripMargin,
    "funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
         |           FROM events),
         |s1 AS (SELECT user_id, min(ts) AS t_signup FROM e
         |       WHERE event_type = 'signup' GROUP BY user_id),
         |s2 AS (SELECT e.user_id, min(ts) AS t_view
         |       FROM e JOIN s1 USING (user_id)
         |       WHERE event_type = 'view' AND ts > t_signup
         |         AND ts <= t_signup + INTERVAL $funnelWindowHours HOURS
         |       GROUP BY e.user_id),
         |s3 AS (SELECT e.user_id, min(ts) AS t_purchase
         |       FROM e JOIN s2 USING (user_id)
         |       WHERE event_type = 'purchase' AND ts > t_view
         |         AND ts <= t_view + INTERVAL $funnelWindowHours HOURS
         |       GROUP BY e.user_id)
         |SELECT s1.user_id, s1.t_signup, s2.t_view, s3.t_purchase,
         |  CASE WHEN s3.t_purchase IS NOT NULL THEN 3
         |       WHEN s2.t_view IS NOT NULL THEN 2 ELSE 1 END AS stage_depth
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         |ORDER BY s1.user_id""".stripMargin,
    "cohort_retention" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |            CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT user_id, event_type AS channel,
        |        date_trunc('week', ts) AS cohort_week
        |      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id) AS rn FROM e)
        |      WHERE rn = 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        |      FROM e),
        |sz AS (SELECT channel, count(DISTINCT user_id) AS cohort_size
        |       FROM f GROUP BY channel),
        |cells AS (
        |  SELECT channel,
        |    CAST((epoch(active_week) - epoch(cohort_week)) // 604800 AS BIGINT)
        |      AS week_n,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |  FROM f JOIN a USING (user_id) GROUP BY 1, 2)
        |SELECT channel, week_n, n_active, cohort_size,
        |  round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
        |FROM cells JOIN sz USING (channel)
        |ORDER BY channel, week_n""".stripMargin,
    "trend_fit" ->
      s"""WITH m AS (
         |  SELECT event_type, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
         |    sum(y) AS sy, sum(y * x) AS sxy
         |  FROM (SELECT event_type,
         |          datediff('day', DATE '$trendEpoch',
         |                   CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS x,
         |          CAST(value AS DECIMAL(18,6)) AS y
         |        FROM events)
         |  GROUP BY event_type)
         |SELECT event_type, n,
         |  round(CAST(n * sxy - sx * sy AS DOUBLE)
         |        / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
         |  round(CAST(sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx
         |             AS DOUBLE)
         |        / CAST(n * (n * sxx - sx * sx) AS DOUBLE), 6) AS intercept
         |FROM m ORDER BY event_type""".stripMargin,
    "range_join" -> rangeJoinSql,
    "range_join_auto" -> rangeJoinSql,
    "salted_join" ->
      """WITH dim AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_seen,
        |    count(*) AS n_user_events
        |  FROM events GROUP BY user_id)
        |SELECT e.user_id, e.event_id, e.value, d.first_seen, d.n_user_events
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |ORDER BY e.event_id""".stripMargin,
    "window_rolling" ->
      """SELECT user_id, event_id, ts, value,
        |  count(*) OVER w AS n_1h,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6)
        |    AS sum_1h
        |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |        CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "resample_ffill" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |span AS (SELECT user_id, date_trunc('hour', min(ts)) AS t0,
        |                date_trunc('hour', max(ts)) AS t1
        |         FROM e GROUP BY 1),
        |grid AS (SELECT user_id,
        |                unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS grid_ts
        |         FROM span),
        |obs AS (
        |  SELECT user_id, date_trunc('hour', ts) AS grid_ts, value FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |j AS (SELECT g.user_id, g.grid_ts, o.value
        |      FROM grid g LEFT JOIN obs o
        |        ON g.user_id = o.user_id AND g.grid_ts = o.grid_ts)
        |SELECT user_id, grid_ts,
        |  last_value(value IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY grid_ts
        |    ROWS UNBOUNDED PRECEDING) AS value_ffill,
        |  value IS NOT NULL AS observed
        |FROM j ORDER BY user_id, grid_ts""".stripMargin,
    "grouping_sets_agg" ->
      """SELECT CASE WHEN event_type IS NULL THEN 2
        |            WHEN hour_of_day IS NULL THEN 1 ELSE 0 END AS lvl,
        |  event_type, hour_of_day, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM (SELECT event_type,
        |        CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS INT)
        |          AS hour_of_day, value
        |      FROM events)
        |GROUP BY GROUPING SETS ((event_type, hour_of_day), (event_type), ())
        |ORDER BY lvl, event_type NULLS FIRST, hour_of_day NULLS FIRST""".stripMargin,
    "window_lag" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lag(value) OVER w AS prev_value,
        |  value - lag(value) OVER w AS delta,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value,
        |  row_number() OVER w AS seq_in_user
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, seq_in_user""".stripMargin,
    "sessionize" ->
      s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
         |           FROM events),
         |brk AS (
         |  SELECT *, CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         |                 OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS b
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |grp AS (
         |  SELECT *, sum(b) OVER (PARTITION BY user_id ORDER BY ts
         |                         ROWS UNBOUNDED PRECEDING) AS g
         |  FROM brk)
         |SELECT user_id, min(ts) AS session_start,
         |  max(ts) + INTERVAL 30 MINUTE AS session_end,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
         |FROM grp GROUP BY user_id, g
         |ORDER BY user_id, session_start""".stripMargin,
    "window_agg" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |  event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "cube_agg" ->
      """SELECT event_type,
        |  CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS INT) AS hour_of_day,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY CUBE (1, 2)
        |ORDER BY event_type NULLS FIRST, hour_of_day NULLS FIRST""".stripMargin,
    "corr_matrix" -> {
      // generated from the same column list as the Spark side so the
      // decimal sums and the double closed-form share one expression tree
      val cols = Seq("l_quantity" -> "q", "l_extendedprice" -> "e",
        "l_discount" -> "d")
      def dec(c: String) = s"CAST(round($c * 1000000.0) AS HUGEINT)"
      def dbl(n: String) = s"CAST($n AS DOUBLE)"
      val sumSelects = (cols.map { case (c, a) => s"sum(${dec(c)}) AS s_$a" } ++
        cols.map { case (c, a) =>
          s"sum(${dec(c)} * ${dec(c)}) AS s_$a$a" } ++
        cols.combinations(2).toSeq.map { case Seq((c1, a1), (c2, a2)) =>
          s"sum(${dec(c1)} * ${dec(c2)}) AS s_$a1$a2"
        }).mkString(",\n  ")
      def varT(x: String) =
        s"(${dbl("n")} * ${dbl(s"s_$x$x")} - ${dbl(s"s_$x")} * ${dbl(s"s_$x")})"
      val rows = cols.combinations(2).toSeq.map { case Seq((c1, a1), (c2, a2)) =>
        s"""SELECT '$c1' AS col_a, '$c2' AS col_b, n,
           |  round((${dbl("n")} * ${dbl(s"s_$a1$a2")}
           |      - ${dbl(s"s_$a1")} * ${dbl(s"s_$a2")})
           |    / sqrt(${varT(a1)} * ${varT(a2)}), 6) AS r
           |FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH a AS (SELECT count(*) AS n,
         |  $sumSelects
         |FROM lineitem)
         |$rows
         |ORDER BY col_a, col_b""".stripMargin
    },
    "window_ewma" -> {
      // identical summation tree as the Spark side: ascending-lag terms,
      // left-associative +; weights are exact binary fractions so the
      // decimal literals parse to the identical doubles
      val over =
        "OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)"
      val terms = (0 until ewmaDepth).map { j =>
        val x = if (j == 0) "value" else s"lag(value, $j) $over"
        val wt = math.pow(0.5, j + 1)
        (s"CASE WHEN ($x) IS NOT NULL THEN ($x) * $wt ELSE 0.0 END",
          s"CASE WHEN ($x) IS NOT NULL THEN $wt ELSE 0.0 END")
      }
      s"""SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         |  round((${terms.map(_._1).mkString("\n     + ")})
         |      / (${terms.map(_._2).mkString("\n     + ")}), 6) AS ewma,
         |  row_number() $over AS seq_in_user
         |FROM events ORDER BY user_id, seq_in_user""".stripMargin
    },
    "quantile_normalize" ->
      """SELECT event_id, event_type, value,
        |  round(CAST(row_number() OVER (PARTITION BY event_type
        |          ORDER BY value, event_id) - 1 AS DOUBLE)
        |      / CAST(count(*) OVER (PARTITION BY event_type) - 1 AS DOUBLE),
        |    6) AS quantile
        |FROM events ORDER BY event_id""".stripMargin,
    "outlier_mad" ->
      """WITH m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |d AS (
        |  SELECT e.event_id, e.event_type, e.value, m.med,
        |         abs(e.value - m.med) AS absdev
        |  FROM events e JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type,
        |         greatest(quantile_cont(absdev, 0.5), 1e-12) AS madf,
        |         quantile_cont(absdev, 0.5) AS mad
        |  FROM d GROUP BY event_type)
        |SELECT d.event_id, d.event_type, d.value,
        |  round(d.med, 6) AS med, round(md.mad, 6) AS mad,
        |  round(d.absdev / (1.4826 * md.madf), 6) AS robust_z
        |FROM d JOIN md USING (event_type)
        |WHERE d.absdev > 3.0 * 1.4826 * md.madf
        |ORDER BY d.event_id""".stripMargin,
    "percentile_agg" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "quantile_bottomk" ->
      s"""WITH h AS (
         |  SELECT event_type, value, event_id,
         |    ('0x' || substr(md5('qbk:' || CAST(event_id AS VARCHAR)),
         |                    1, 15))::BIGINT AS h
         |  FROM events),
         |s AS (
         |  SELECT event_type, value FROM (
         |    SELECT event_type, value, row_number() OVER
         |      (PARTITION BY event_type ORDER BY h, event_id) AS rk
         |    FROM h) WHERE rk <= $qbK)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
         |  round(quantile_cont(value, 0.5), 6) AS p50,
         |  round(quantile_cont(value, 0.9), 6) AS p90,
         |  round(quantile_cont(value, 0.99), 6) AS p99
         |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,
    "pivot_agg" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // melting the per-type count columns and dropping zeros ≡ grouping by
    // the present (user, type) pairs directly
    "unpivot_metrics" ->
      s"""SELECT user_id, 'n_' || event_type AS metric,
         |  CAST(count(*) AS BIGINT) AS value
         |FROM events
         |WHERE event_type IN (${userFeatureTypes.map(t => s"'$t'").mkString(", ")})
         |GROUP BY user_id, event_type
         |ORDER BY user_id, metric""".stripMargin)
}
