package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the "describe my table" operator a user runs before
  * building any pipeline: one row per column with row/null/distinct counts
  * and typed min/max, over any DataFrame.
  *
  * Shape: TWO hash-aggregate passes over the scan, zero sorts.
  * (a) Distinct stats: `stack`-melt to (col_name, value) rows, then
  * groupBy(col_name, value) → groupBy(col_name) — both HashAggregates
  * with map-side combine, so the shuffle carries per-partition DISTINCT
  * pairs, not raw rows. (b) Typed min/max + row count: one keyless global
  * aggregate (min/max in the column's NATIVE type — numeric min, not the
  * lexicographic min of the rendering — rendered only at the end, doubles
  * through DECIMAL(18,2) so both engines print fixed-point); its 1-row
  * result stacks to per-column rows and broadcast-joins the stats.
  *
  * Why not the single-pass multi-countDistinct `agg`: string-typed
  * min/max buffers are not HashAggregate-mutable, so Catalyst plans the
  * whole thing as SortAggregate over the countDistinct Expand — three
  * sorts of #cols × n wide rows (measured 3.9 s vs 0.6 s for this shape
  * at sf0.1). The second scan is the better trade at 100 TB too: columnar
  * IO is cheap next to sorting the ×#cols expansion, and the melt
  * shuffle is bounded by per-partition NDV. Exact NDV is kept because it
  * is oracle-checkable; at 100 TB swap the distinct pass for
  * `approx_count_distinct` (the `approx_distinct` query is that scale
  * path, spec-bounded).
  */
object ProfileQueries {

  private def render(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast("decimal(18,2)").cast("string")
    case _ => c.cast("string")
  }

  /** Generic profiler: one row per column of `df`. */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    // (a) melt → distinct stats. CAST(x AS STRING) preserves distinctness
    // for every profiled type (Spark renders doubles via Java's
    // round-trip Double.toString; timestamps keep full µs precision).
    val stackArgs = fields.map(f =>
      s"'${f.name}', CAST(`${f.name}` AS STRING)").mkString(", ")
    val stats = df
      .select(expr(s"stack(${fields.length}, $stackArgs) AS (col_name, value)"))
      .groupBy("col_name", "value").agg(count(lit(1)).as("cnt"))
      .groupBy("col_name").agg(
        sum(when(col("value").isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
        count(when(col("value").isNotNull, 1)).as("n_distinct"))
    // (b) keyless global typed min/max + row count (1 row)
    val mmCols = fields.flatMap { f =>
      Seq(render(min(col(f.name)), f.dataType).as(s"${f.name}__min"),
        render(max(col(f.name)), f.dataType).as(s"${f.name}__max"))
    } :+ count(lit(1)).as("__n")
    val mm = df.agg(mmCols.head, mmCols.tail: _*)
    val mmStack = fields.map(f =>
      s"'${f.name}', `${f.name}__min`, `${f.name}__max`").mkString(", ")
    val mmRows = mm.select(
      expr(s"stack(${fields.length}, $mmStack) AS (col_name, min_value, max_value)"),
      col("__n").as("n_rows"))
    // mmRows is the PRESERVED side: it always has one row per column
    // (a keyless aggregate yields a row even on empty input), so an
    // empty table still profiles as n_rows=0 per column instead of the
    // inner-join's zero rows (round-8 advice). Both sides are tiny by
    // the time they meet (≤ #cols rows each); broadcast the stats side.
    mmRows.join(broadcast(stats), Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"),
        coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
      .orderBy("col_name")
  }

  def dataProfile(s: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(s, dir))

  /** Declarative data-quality constraint audit (the Deequ/
    * expectations-suite operator): one row per constraint with checked/
    * violation counts and a pass flag, covering the four constraint
    * families a warehouse gate needs — referential integrity (every
    * fact FK resolves), key uniqueness, completeness (no nulls), and
    * domain/range rules (accepted values, bounds, cross-field order).
    *
    * Shape: each constraint is ONE aggregate over its scan; FK checks
    * are left joins against the (unique-keyed) dim counting unmatched
    * rows — broadcast when the dim is small, shuffle otherwise; the
    * per-constraint 1-row results union into the report. Nothing ever
    * materializes violating ROWS (that's a debugging query, not the
    * gate), so the audit output is O(#constraints) regardless of data
    * size. The corpus genuinely violates `order_before_ship` (events
    * data has pre-order shipdates), so the audit proves it can FAIL. */
  def dqAudit(s: SparkSession, dir: String): DataFrame = {
    def report(name: String, agg: DataFrame): DataFrame =
      agg.select(lit(name).as("check_name"), col("n_checked"),
        col("n_violations"), (col("n_violations") === 0L).as("passed"))

    def fk(fact: DataFrame, fkCol: String, dim: DataFrame, pkCol: String,
        name: String, bcast: Boolean): DataFrame = {
      val d = dim.select(pkCol)
      report(name, fact.select(fkCol)
        .join(if (bcast) broadcast(d) else d, col(fkCol) === col(pkCol), "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col(pkCol).isNull, 1L).otherwise(0L)).as("n_violations")))
    }

    def unique(df: DataFrame, key: String, name: String): DataFrame =
      report(name, df.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(col(key))).as("n_violations")))

    def rule(df: DataFrame, violated: Column, name: String): DataFrame =
      report(name, df.agg(count(lit(1)).as("n_checked"),
        sum(when(violated, 1L).otherwise(0L)).as("n_violations")))

    val orders = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val checks = Seq(
      fk(orders, "o_custkey", Tables.customer(s, dir), "c_custkey",
        "fk_orders_customer", bcast = true),
      fk(li, "l_orderkey", orders, "o_orderkey",
        "fk_lineitem_orders", bcast = false),
      fk(li, "l_partkey", Tables.part(s, dir), "p_partkey",
        "fk_lineitem_part", bcast = true),
      fk(li, "l_suppkey", Tables.supplier(s, dir), "s_suppkey",
        "fk_lineitem_supplier", bcast = true),
      unique(orders, "o_orderkey", "unique_orderkey"),
      unique(Tables.customer(s, dir), "c_custkey", "unique_custkey"),
      rule(orders, col("o_orderdate").isNull, "complete_orderdate"),
      rule(orders, !col("o_orderstatus").isin("F", "O", "P"),
        "domain_orderstatus"),
      rule(li, !col("l_discount").between(0.0, 1.0), "range_discount"),
      rule(li, col("l_quantity") <= 0, "range_quantity"),
      rule(li.select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey")),
        col("l_shipdate") < col("o_orderdate"), "order_before_ship"))
    checks.reduce(_ unionByName _).orderBy("check_name")
  }

  /** Join-key skew report — the diagnostic a user runs BEFORE picking a
    * salt factor or enabling a skew-join hint: the top-k heaviest values
    * of a join key with each key's share and its ratio to the mean
    * rows-per-key. One count aggregate at key grain; the corpus-wide
    * stats (n_keys, n_rows) re-aggregate the KEY-grain counts and ride
    * in as one broadcast row; the top-k is a TakeOrderedAndProject over
    * key-grain rows (never a global sort of facts). Exact BIGINT counts
    * make ratio/share single deterministic divisions. This is the
    * measurement face of `salted_join`/`salted_agg`/AQE-skew handling
    * elsewhere in this library. */
  val skewTopK = 10

  def skewReport(s: SparkSession, dir: String): DataFrame = {
    val cnts = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
    val stats = cnts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"))
    cnts.crossJoin(broadcast(stats))
      .select(col("l_suppkey"), col("cnt"),
        round(col("cnt").cast("double") * col("n_keys") / col("n_rows"), 6)
          .as("skew_ratio"),
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share"))
      .orderBy(col("cnt").desc, col("l_suppkey"))
      .limit(skewTopK)
  }

  val kmvK = 64

  /** KMV (k-minimum-values) distinct-count sketch — the mergeable
    * cardinality estimator of Bar-Yossef et al. 2002, made exactly
    * oracle-checkable: hashes are the portable md5-60bit, and the
    * estimate is the DETERMINISTIC (k−1)·2^60 / h_k with h_k the k-th
    * smallest distinct hash per group (falling back to the exact count
    * when a group has < k distinct values — the KMV small-cardinality
    * rule). The production 100 TB aggregate is HLL
    * (`approx_count_distinct`, the within-tol-oracled `approx_distinct`);
    * THIS query pins the sketch arithmetic with a hash oracle. Shape:
    * one (group, hash)-distinct shuffle bounded by true cardinality,
    * then a per-group rank-k window over ≤ NDV rows; `n_exact` rides
    * the same distinct set, so the error column is self-auditing. */
  def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Long
    import org.apache.spark.sql.expressions.Window
    val dh = Tables.events(s, dir)
      .select(col("event_type"),
        md5Long(col("user_id").cast("string")).as("h"))
      .distinct()
    val exact = dh.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val kth = dh.withColumn("r", row_number().over(w))
      .filter(col("r") === kmvK)
      .select(col("event_type"), col("h").as("h_k"))
    exact.join(kth, Seq("event_type"), "left")
      .select(col("event_type"), col("n_exact"),
        coalesce(col("h_k"), lit(0L)).as("h_k"),
        when(col("h_k").isNull, col("n_exact").cast("double"))
          .otherwise(round(
            lit((kmvK - 1).toDouble) * pow(lit(2.0), 60) / col("h_k"), 3))
          .as("n_est"))
      .orderBy("event_type")
  }

  /** CMS geometry: depth (independent md5 hash rows) × width (buckets).
    * Point-query error bound ε = e/w ≈ 0.27% of total token mass at
    * w=1024, failure probability δ = e^−d ≈ 1.8% at d=4. */
  val cmsDepth = 4
  val cmsWidth = 1024
  val cmsTopK = 20

  /** Count–Min sketch term-frequency audit (Cormode & Muthukrishnan,
    * J. Algorithms '05) — the POINT-QUERY member of this library's sketch
    * family (HLL/KMV estimate distinct counts, GK/bottom-k estimate
    * ranks; CMS answers "how often does token t occur" from constant
    * state). Made exactly oracle-checkable the same way `kmv_distinct`
    * pins HLL's role: row hashes derive from one portable md5 via
    * Kirsch–Mitzenmacher double hashing (see [[cmsJBucket]]), counts
    * are BIGINT, so both engines compute the identical cell table and
    * the identical estimates bit-for-bit.
    *
    * Shape at 100 TB — the production branch aggregates the d×w cell
    * table STRAIGHT from the token stream: the groupBy key space is
    * FIXED at d·w = 4096 cells, so map-side combine ships ≤4096 partial
    * rows per partition no matter how large the corpus or its vocabulary
    * grows — the entire point of CMS (the exact `vocab_topk` shuffles
    * per-partition DISTINCT tokens, which scales with vocabulary). Cells
    * from disjoint corpus shards ADD (linearity — spec-proven), which is
    * what makes the sketch mergeable across executors, days, or corpora.
    * The exact-count branch here is the AUDIT companion (same move as
    * `approx_distinct_check`): it derives the probe set (top-k tokens)
    * and attests, in-plan, the one-sided CMS guarantee `n_est ≥ n_exact`
    * that holds for EVERY query key. The probe itself is a tiny
    * (k·d)-row equi-join against the ≤4096-row cell table. */
  /** Row hashes are Kirsch–Mitzenmacher DOUBLE hashing (ESA'06):
    * bucket_j = (h1 + j·h2) mod w, where h1/h2 are the two independent
    * 60-bit halves of ONE md5 digest per token. The naive per-row
    * seeded-md5 form (`md5(j || token)` × d) was MEASURED 25× slower
    * than the exact vocabulary aggregate at x100 (169.6 s vs 6.8 s for
    * `vocab_topk`): d md5s per token is the dominant cost of the whole
    * sketch, and K–M's guarantee is that derived rows preserve the CMS
    * bound. Both halves parse as non-negative (60 < 63 bits), so
    * h1 + 3·h2 < 2⁶² never overflows and `pmod`/`%` agree cross-engine. */
  private def cmsJBucket(j: Column, h1: Column, h2: Column): Column =
    pmod(h1 + j * h2, lit(cmsWidth.toLong))

  private def cmsH(hx: Column, from: Int): Column =
    conv(substring(hx, from, 15), 16, 10).cast("long")

  private val cmsJs = array((0 until cmsDepth).map(lit(_)): _*)

  /** The production CMS aggregation alone: (j, bucket) → count over any
    * token frame — exposed so the spec can prove cell LINEARITY (cells
    * of disjoint shards add to the cells of the union), the property
    * that makes the sketch mergeable across executors and ingest days. */
  def cmsCells(toks: DataFrame): DataFrame =
    toks.select(md5(col("token")).as("hx"))
      .select(cmsH(col("hx"), 1).as("h1"), cmsH(col("hx"), 16).as("h2"))
      .select(explode(cmsJs).as("j"), col("h1"), col("h2"))
      .select(col("j"), cmsJBucket(col("j"), col("h1"), col("h2")).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cell"))

  /** (j, bucket) probe rows for a frame carrying a `token` column (other
    * columns ride along) — the READ side of the sketch, shared with the
    * streaming face [[graft.streaming.CmsStream]]. */
  private[graft] def cmsProbeRows(d: DataFrame): DataFrame =
    d.withColumn("hx", md5(col("token")))
      .withColumn("j", explode(cmsJs))
      .withColumn("bucket",
        cmsJBucket(col("j"), cmsH(col("hx"), 1), cmsH(col("hx"), 16)))
      .drop("hx")

  def vocabCms(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val toks = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
    val cells = cmsCells(toks)
    val top = toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token")).limit(cmsTopK)
    cmsProbeRows(top)
      .join(cells, Seq("j", "bucket"))
      .groupBy("token", "n_exact")
      .agg(min(col("cell")).as("n_est"))
      .select(col("token"), col("n_exact"), col("n_est"),
        (col("n_est") >= col("n_exact")).as("overestimate"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** Restricted-vocabulary size for divergence: the shared top-V tokens
    * by corpus frequency define the comparison domain. */
  val cdVocabK = 256

  /** Per-source distribution drift — KL(source ‖ corpus) and
    * Jensen–Shannon divergence over the corpus top-[[cdVocabK]]
    * unigram vocabulary, add-one smoothed (Laplace) so every grid cell
    * has positive mass. The "did this crawl snapshot / data vendor
    * drift" monitor a training-data pipeline runs per ingest: KL spikes
    * on a source whose token mix diverges from the pool; JS is its
    * bounded (≤ ln 2) symmetric companion, robust when a source has
    * near-zero overlap. Restricting to the shared top-V vocabulary is
    * the standard move (out-of-vocab mass is ignored equally for all
    * sources), and makes every downstream frame vocabulary-bounded.
    *
    * Determinism across engines: counts are exact BIGINT; each term
    * p·ln(p/q) is one double division + one IEEE ln + one multiply,
    * rounded to 12 dp and DECIMAL(38,12)-summed (order-independent —
    * the same move as `bm25_topk`'s score sum); the engine-identical
    * decimal total casts to double once at the end.
    *
    * Shape at 100 TB: one token explode → (source, token) hash
    * aggregation with map-side combine (the only corpus-sized shuffle,
    * bounded by |sources|·NDV per partition); everything after is
    * |sources|×V ≤ a few thousand rows — the V-row vocabulary and the
    * 1-row corpus total ride as broadcasts (the PlanSpec-allowlisted
    * provably-tiny nested-loop class). */
  def corpusDivergence(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
    val st = toks.groupBy("source", "token").agg(count(lit(1)).as("c"))
    val vocab = st.groupBy("token").agg(sum("c").as("ct"))
      .orderBy(col("ct").desc, col("token")).limit(cdVocabK)
    val grid = st.select("source").distinct().crossJoin(broadcast(vocab))
    val cs = grid.join(st, Seq("source", "token"), "left")
      .select(col("source"), col("token"), col("ct"),
        coalesce(col("c"), lit(0L)).as("c"))
    val ns = cs.groupBy("source").agg(sum("c").as("ns"))
    // v = the ACTUAL vocabulary size (≤ cdVocabK — a small corpus can
    // have fewer distinct tokens than the cap): add-one smoothing must
    // add exactly one count per REAL vocabulary cell or p and q stop
    // summing to 1 and Gibbs' inequality (KL ≥ 0) silently breaks —
    // caught by the spec's bounds check on the sf0.001 fixture (31
    // distinct tokens), where the capped denominator gave KL = −0.0996
    val n = vocab.agg(sum("ct").as("n"), count(lit(1)).as("v"))
    val terms = cs.join(ns, "source").crossJoin(broadcast(n))
      .withColumn("p",
        (col("c") + 1).cast("double") / (col("ns") + col("v")))
      .withColumn("q",
        (col("ct") + 1).cast("double") / (col("n") + col("v")))
      .withColumn("m", (col("p") + col("q")) / 2)
      .select(col("source"), col("ns"),
        round(col("p") * log(col("p") / col("q")), 12)
          .cast("decimal(38,12)").as("kl_t"),
        round(col("p") * log(col("p") / col("m")), 12)
          .cast("decimal(38,12)").as("jp_t"),
        round(col("q") * log(col("q") / col("m")), 12)
          .cast("decimal(38,12)").as("jq_t"))
    terms.groupBy("source", "ns").agg(
        round(sum("kl_t").cast("double"), 9).as("kl_nats"),
        round((sum("jp_t") + sum("jq_t")).cast("double") / 2, 9)
          .as("js_nats"))
      .select(col("source"), col("ns").as("n_tokens"),
        col("kl_nats"), col("js_nats"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "data_profile" -> (dataProfile _),
    "skew_report" -> (skewReport _),
    "kmv_distinct" -> (kmvDistinct _),
    "vocab_cms" -> (vocabCms _),
    "takedown_replay_cms" ->
      ((s: SparkSession, dir: String) =>
        graft.streaming.CmsStream.takedownReplayCms(s, dir)),
    "corpus_divergence" -> (corpusDivergence _),
    "dq_audit" -> (dqAudit _))

  private def colSql(name: String, minMax: String => String) =
    s"""SELECT '$name' AS col_name, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_nulls,
       |  CAST(count(DISTINCT $name) AS BIGINT) AS n_distinct,
       |  ${minMax(s"min($name)")} AS min_value,
       |  ${minMax(s"max($name)")} AS max_value
       |FROM orders""".stripMargin

  private val plain = (e: String) => s"CAST($e AS VARCHAR)"
  private val fixed = (e: String) => s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)"

  private def fkSql(name: String, fact: String, fk: String, dim: String,
      pk: String) =
    s"""SELECT '$name' AS check_name, count(*) AS n_checked,
       |  CAST(sum(CASE WHEN $pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_violations,
       |  sum(CASE WHEN $pk IS NULL THEN 1 ELSE 0 END) = 0 AS passed
       |FROM $fact LEFT JOIN $dim ON $fk = $pk""".stripMargin

  private def uniqueSql(name: String, table: String, key: String) =
    s"""SELECT '$name' AS check_name, count(*) AS n_checked,
       |  count(*) - count(DISTINCT $key) AS n_violations,
       |  count(*) = count(DISTINCT $key) AS passed
       |FROM $table""".stripMargin

  private def ruleSql(name: String, from: String, violated: String) =
    s"""SELECT '$name' AS check_name, count(*) AS n_checked,
       |  CAST(sum(CASE WHEN $violated THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_violations,
       |  sum(CASE WHEN $violated THEN 1 ELSE 0 END) = 0 AS passed
       |FROM $from""".stripMargin

  /** The vocab_cms oracle chain, parameterized by a survivor predicate
    * over `documents` — "" for the one-shot sketch face, a WHERE clause
    * for the streaming takedown replay (batch-grain subtraction must
    * reproduce the one-shot sketch of the survivors by linearity). */
  private def vocabCmsOracle(pred: String): String =
    s"""WITH toks AS (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |                t -> t != '')) AS token
         |  FROM documents $pred),
         |js AS (SELECT unnest([${(0 until cmsDepth).mkString(", ")}]) AS j),
         |th AS (
         |  SELECT token,
         |    ('0x' || substr(md5(token), 1, 15))::BIGINT AS h1,
         |    ('0x' || substr(md5(token), 16, 15))::BIGINT AS h2
         |  FROM toks),
         |cells AS (
         |  SELECT j, (h1 + j * h2) % $cmsWidth AS bucket, count(*) AS cell
         |  FROM th CROSS JOIN js GROUP BY 1, 2),
         |top AS (
         |  SELECT token, count(*) AS n_exact FROM toks GROUP BY 1
         |  ORDER BY n_exact DESC, token LIMIT $cmsTopK),
         |probe AS (
         |  SELECT token, n_exact, j,
         |    (('0x' || substr(md5(token), 1, 15))::BIGINT +
         |     j * ('0x' || substr(md5(token), 16, 15))::BIGINT)
         |      % $cmsWidth AS bucket
         |  FROM top CROSS JOIN js)
         |SELECT p.token, p.n_exact, min(c.cell) AS n_est,
         |  min(c.cell) >= p.n_exact AS overestimate
         |FROM probe p JOIN cells c USING (j, bucket)
         |GROUP BY 1, 2 ORDER BY n_exact DESC, token""".stripMargin

  val oracles: Map[String, String] = Map(
    "kmv_distinct" ->
      s"""WITH dh AS (
         |  SELECT DISTINCT event_type,
         |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |      AS h
         |  FROM events),
         |ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
         |       FROM dh GROUP BY 1),
         |kth AS (
         |  SELECT event_type, h AS h_k FROM (
         |    SELECT event_type, h,
         |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
         |    FROM dh) WHERE r = $kmvK)
         |SELECT ex.event_type, ex.n_exact, coalesce(kth.h_k, 0) AS h_k,
         |  CASE WHEN kth.h_k IS NULL THEN CAST(ex.n_exact AS DOUBLE)
         |       ELSE round(${(kmvK - 1).toDouble} * power(2.0, 60) / kth.h_k,
         |                  3) END AS n_est
         |FROM ex LEFT JOIN kth USING (event_type)
         |ORDER BY ex.event_type""".stripMargin,
    "data_profile" -> Seq(
      colSql("o_orderkey", plain), colSql("o_custkey", plain),
      colSql("o_orderstatus", plain), colSql("o_totalprice", fixed),
      colSql("o_orderdate", plain), colSql("o_orderpriority", plain))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "skew_report" ->
      s"""WITH c AS (
         |  SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1),
         |st AS (SELECT count(*) AS n_keys,
         |              CAST(sum(cnt) AS BIGINT) AS n_rows FROM c)
         |SELECT l_suppkey, cnt,
         |  round(CAST(cnt AS DOUBLE) * n_keys / n_rows, 6) AS skew_ratio,
         |  round(CAST(cnt AS DOUBLE) / n_rows, 6) AS share
         |FROM c CROSS JOIN st
         |ORDER BY cnt DESC, l_suppkey LIMIT $skewTopK""".stripMargin,
    "vocab_cms" -> vocabCmsOracle(""),
    "takedown_replay_cms" -> vocabCmsOracle("WHERE doc_id % 4 != 1"),
    "corpus_divergence" ->
      s"""WITH toks AS (
         |  SELECT source,
         |    unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |           t -> t != '')) AS token
         |  FROM documents),
         |st AS (SELECT source, token, count(*) AS c FROM toks GROUP BY 1, 2),
         |vocab AS (
         |  SELECT token, CAST(sum(c) AS BIGINT) AS ct FROM st GROUP BY 1
         |  ORDER BY ct DESC, token LIMIT $cdVocabK),
         |grid AS (
         |  SELECT s.source, v.token, v.ct
         |  FROM (SELECT DISTINCT source FROM st) s CROSS JOIN vocab v),
         |cs AS (
         |  SELECT g.source, g.token, g.ct, coalesce(st.c, 0) AS c
         |  FROM grid g LEFT JOIN st
         |    ON g.source = st.source AND g.token = st.token),
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
         |       FROM cs GROUP BY 1),
         |n AS (SELECT CAST(sum(ct) AS BIGINT) AS n,
         |             CAST(count(*) AS BIGINT) AS v FROM vocab),
         |pq AS (
         |  SELECT cs.source, ns.ns,
         |    CAST(cs.c + 1 AS DOUBLE) / (ns.ns + n.v) AS p,
         |    CAST(cs.ct + 1 AS DOUBLE) / (n.n + n.v) AS q
         |  FROM cs JOIN ns ON cs.source = ns.source CROSS JOIN n),
         |terms AS (
         |  SELECT source, ns,
         |    CAST(round(p * ln(p / q), 12) AS DECIMAL(38,12)) AS kl_t,
         |    CAST(round(p * ln(p / ((p + q) / 2)), 12) AS DECIMAL(38,12))
         |      AS jp_t,
         |    CAST(round(q * ln(q / ((p + q) / 2)), 12) AS DECIMAL(38,12))
         |      AS jq_t
         |  FROM pq)
         |SELECT source, ns AS n_tokens,
         |  round(CAST(sum(kl_t) AS DOUBLE), 9) AS kl_nats,
         |  round(CAST(sum(jp_t) + sum(jq_t) AS DOUBLE) / 2, 9) AS js_nats
         |FROM terms GROUP BY source, ns ORDER BY source""".stripMargin,
    "dq_audit" -> Seq(
      fkSql("fk_orders_customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      fkSql("fk_lineitem_orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      fkSql("fk_lineitem_part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      fkSql("fk_lineitem_supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      uniqueSql("unique_orderkey", "orders", "o_orderkey"),
      uniqueSql("unique_custkey", "customer", "c_custkey"),
      ruleSql("complete_orderdate", "orders", "o_orderdate IS NULL"),
      ruleSql("domain_orderstatus", "orders",
        "o_orderstatus NOT IN ('F', 'O', 'P')"),
      ruleSql("range_discount", "lineitem",
        "l_discount NOT BETWEEN 0.0 AND 1.0"),
      ruleSql("range_quantity", "lineitem", "l_quantity <= 0"),
      ruleSql("order_before_ship",
        "lineitem JOIN orders ON l_orderkey = o_orderkey",
        "l_shipdate < o_orderdate"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY check_name"))
}
