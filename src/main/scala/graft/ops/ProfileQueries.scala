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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "data_profile" -> (dataProfile _),
    "skew_report" -> (skewReport _),
    "kmv_distinct" -> (kmvDistinct _),
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
