package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface over the TPC-H-ish testdata — the engine
  * breadth a user of the reference would reach for next (SURVEY.md §2.10
  * lists these categories as absent from the reference; they're the
  * natural extension surface): scan+filter+aggregate, multi-way joins
  * with broadcast dims, ranking windows, rollup, set ops, as-of join.
  *
  * Scale notes per query are inline; the common rules: dims are
  * broadcast, aggregates are partial (map-side combine is automatic for
  * hash aggregates), the as-of join is the union+window formulation (one
  * shuffle by key — no range-explosion), filters sit directly on the scan
  * so parquet row-group pruning and column pruning apply.
  */
object RelationalQueries {

  /** TPC-H Q1-shaped: pricing summary over lineitem. One scan, one
    * partial+final hash aggregate; no join. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // money sums go through DECIMAL so the aggregate is EXACT and
        // independent of accumulation order (float sums of 100k+ values
        // differ across engines/runs at ~1e-4 — not oracle-safe)
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,6)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped: top-10 unshipped-revenue orders. lineitem (big)
    * joins orders (mid) then customer (small, broadcast); revenue agg is
    * partial; top-k is a sort of the aggregated (small) side only. */
  def q3Join(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(22,6)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped: revenue per nation for one region — the 6-table
    * star join. Fact (lineitem) streams map-side through a chain of
    * BROADCAST dims (supplier→nation→region collapses to a tiny key set;
    * customer is semi-filtered by the same nation set); the only shuffle
    * is the final per-nation aggregate. */
  def q5Join(s: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(s, dir)
      .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = Tables.supplier(s, dir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(22,6)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q14-shaped: promo revenue share per brand (fact × broadcast
    * part dim, conditional aggregation — exact DECIMAL ratio). */
  def q14Agg(s: SparkSession, dir: String): DataFrame = {
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(22,6)")
    Tables.lineitem(s, dir)
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(22,6)")))
          .cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .withColumn("promo_share",
        round(lit(100) * col("promo_revenue") / col("total_revenue"), 6))
      .orderBy("p_brand")
  }

  /** Ranking-DISTRIBUTION window suite: quartile (ntile), percent_rank
    * and cume_dist of each event's value within its event_type — the
    * score-normalization window family (feature scaling, decile reports);
    * one shuffle, one sort, three functions. */
  def windowNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy("event_type", "event_id")
  }

  /** Ranking window: top-3 orders by totalprice per customer. */
  def windowTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rank")
  }

  /** Rollup aggregate over (priority, status). */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** Bag-semantics set operations (UNION ALL / INTERSECT ALL / EXCEPT
    * ALL) over per-user event multisets — the multiplicity-preserving
    * forms ([[setOps]] covers the distinct forms): INTERSECT ALL keeps
    * min(countA, countB) copies, EXCEPT ALL keeps countA − countB.
    * Spark plans these as a count-aggregate + generate rather than a
    * naive self-join — one shuffle each, no row explosion. */
  def setOpsAll(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id"))
    val inter = users("login").intersectAll(users("error"))
      .withColumn("set_op", lit("intersect_all"))
    val exc = users("login").exceptAll(users("error"))
      .withColumn("set_op", lit("except_all"))
    inter.unionByName(exc)
      .groupBy("set_op", "user_id").agg(count(lit(1)).as("multiplicity"))
      .orderBy("set_op", "user_id")
  }

  /** Set ops on the event stream: signup∩purchase and signup∖purchase
    * user sets, tagged and unioned (one result set). */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id")).distinct()
    val both = users("signup").intersect(users("purchase"))
      .withColumn("set_op", lit("intersect"))
    val only = users("signup").except(users("purchase"))
      .withColumn("set_op", lit("except"))
    both.unionByName(only).orderBy("set_op", "user_id")
  }

  /** As-of join: for each purchase event, the most recent prior-or-same
    * (ts, event_id) 'view' event of the same user. Union+window
    * formulation: ONE shuffle by user_id, no range-join explosion —
    * the scalable as-of pattern. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select("user_id", "event_id", "event_type", "ts")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viewId = when(col("event_type") === "view", col("event_id"))
    ev.withColumn("asof_view_id", last(viewId, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "asof_view_id")
      .orderBy("event_id")
  }

  /** TPC-H Q4-shaped: order-priority count for orders with a late-shipping
    * line. The EXISTS subquery is a LEFT SEMI join with a non-equi
    * residual — probe side streams, no duplicate blow-up (semi joins emit
    * each order at most once regardless of matching line count). */
  def q4Exists(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    Tables.orders(s, dir)
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q18-shaped: large customers (lifetime order value above a
    * threshold — GROUP BY + HAVING), joined back to the customer dim for
    * attributes. The HAVING filter runs on the aggregated (small) side;
    * the dim join is broadcast. */
  val largeCustomerThreshold = 400000.0

  def q18Having(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_spend"))
      .filter(col("total_spend") > largeCustomerThreshold)
      .join(broadcast(Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_orders"), col("total_spend"))
      .orderBy(col("total_spend").desc, col("c_custkey"))

  /** TPC-H Q17-shaped: small-quantity orders below 20% of their part's
    * average quantity. Written in the DECORRELATED form (per-part
    * threshold aggregate joined back) — what Catalyst rewrites a
    * correlated scalar subquery into anyway; the ORACLE uses the
    * correlated form, so the oracle match proves the decorrelation
    * equivalence. Quantities are integral doubles, so the per-part avg is
    * exact in both engines (no FP-order ambiguity). */
  def q17Correlated(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_partkey", "l_quantity", "l_extendedprice")
    val thr = li.groupBy("l_partkey")
      .agg((avg(col("l_quantity")) * 0.2).as("thr"))
    li.join(thr, Seq("l_partkey"))
      .filter(col("l_quantity") < col("thr"))
      .agg(count(lit(1)).as("n_small"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          / 7.0, 6).as("avg_yearly"))
  }

  /** TPC-H Q6-shaped: forecast revenue change — the pure scan-side query.
    * Every predicate (date range, discount band, quantity cap) sits on
    * scan columns, so parquet row-group stats prune before any compute;
    * the aggregate is one partial+final over the surviving rows. The
    * benchmark's canonical "is pushdown working" probe. */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
        .cast("decimal(22,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q7-shaped: shipping volume between two nations by year. The
    * fact table streams through FOUR broadcast dims (supplier+nation,
    * customer+nation are both tiny); the nation-pair disjunction filters
    * after the joins; the only shuffle is the 3-key aggregate. At 100 TB
    * the nation-pair filter would be pushed into the dim joins (each
    * broadcast side pre-filtered to the two nations), which this does:
    * both dim sides are filtered to the pair BEFORE broadcast. */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val supp = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir).filter(col("n_name").isin(pair: _*)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, dir)
      .join(Tables.nation(s, dir).filter(col("n_name").isin(pair: _*)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(year(col("l_shipdate")).isin(1996, 1997))
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(22,6)")).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8-shaped: one nation's market share within a region for one
    * part type, by order year. Conditional-share aggregation (same CASE
    * trick as [[q14Agg]]) over a 6-table star; all dims broadcast, the
    * two big tables (lineitem⋈orders) are the one shuffle join, and the
    * part-type + region filters semi-reduce the fact stream before it. */
  def q8Share(s: SparkSession, dir: String): DataFrame = {
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(22,6)")
    val asiaNations = Tables.nation(s, dir)
      .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(s, dir)
      .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supp = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", rev)
          .otherwise(lit(0).cast("decimal(22,6)"))).cast("double")
          .as("nation_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .withColumn("mkt_share",
        round(col("nation_revenue") / col("total_revenue"), 6))
      .orderBy("o_year")
  }

  /** TPC-H Q10-shaped: top-20 customers by returned-item revenue in one
    * quarter. The returnflag + quarter filters land on the two scans;
    * customer+nation broadcast; the top-k sorts only the aggregated
    * per-customer rows (TakeOrderedAndProject, no global sort of facts). */
  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(22,6)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13-shaped: distribution of orders-per-customer. Orders are
    * pre-aggregated per custkey BEFORE the customer join (the join input
    * shrinks from |orders| to |customers|), then the distribution is a
    * second tiny aggregate. Customers with no orders surface via the
    * left join as count 0. */
  def q13Distribution(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    Tables.customer(s, dir).select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .groupBy("n_orders").agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("n_orders").desc)
  }

  /** TPC-H Q19-shaped: disjunctive brand/size/quantity predicates. The
    * OR of conjunctions stays one residual filter on a single broadcast
    * join — Catalyst extracts the common `p_partkey` equi-condition and
    * pushes the brand/size disjunction to the part side and the quantity
    * bounds (1..30 hull) to the lineitem scan. */
  def q19Disjunct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) &&
          col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) &&
          col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
          col("p_size").between(1, 15)))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(22,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q22-shaped: lapsed high-balance customers — above the average
    * positive balance with NO order since [[lapsedCutoff]], per segment.
    * The scalar-subquery threshold is compared EXACTLY via the
    * rearrangement `acctbal·n > sum` in DECIMAL (an avg-as-double
    * threshold could flip a borderline customer between engines); the
    * NOT EXISTS is a left-anti join against the date-filtered orders. */
  val lapsedCutoff = "1999-01-01"

  def q22Lapsed(s: SparkSession, dir: String): DataFrame = {
    val bal = col("c_acctbal").cast("decimal(18,2)")
    val thr = Tables.customer(s, dir).filter(col("c_acctbal") > 0)
      .agg(sum(bal).as("pos_sum"), count(lit(1)).as("pos_n"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(lapsedCutoff).cast("timestamp"))
      .select("o_custkey")
    Tables.customer(s, dir)
      .join(broadcast(thr))
      .filter(bal * col("pos_n") > col("pos_sum"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(bal).cast("double").as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  /** Incremental materialized-view maintenance: a per-customer order MV
    * (count, exact DECIMAL revenue, latest order date) is materialized
    * over the pre-[[mvCutoff]] base, then a delta batch (orders ≥ cutoff)
    * is folded in WITHOUT rescanning the base — partial-aggregate the
    * delta alone, full-outer merge the two aggregate states by key, add
    * counts/sums, `greatest` the max. This is the maintenance loop every
    * warehouse MV / streaming total runs on each refresh; correctness
    * contract (and the oracle): merged MV ≡ recompute over base ∪ delta.
    * All merged aggregates are decomposable (count/sum/max — the same
    * partial-state algebra Spark's own partial aggregation uses), so the
    * merge is exact.
    *
    * Shape at 100 TB: the base never moves — work is O(|delta| +
    * |touched keys|); `localCheckpoint` stands in for the stored MV. Both
    * sides aggregate before the merge join, so the shuffle carries
    * key-grain rows, not order-grain. */
  val mvCutoff = "1997-01-01"

  def mvIncremental(s: SparkSession, dir: String): DataFrame = {
    def agg(df: DataFrame): DataFrame = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"),
        max(col("o_orderdate")).as("last_order"))
    val orders = Tables.orders(s, dir)
    val cut = lit(mvCutoff).cast("timestamp")
    // the stored MV: materialized once, never rescanned by the refresh
    val baseMv = agg(orders.filter(col("o_orderdate") < cut)).localCheckpoint()
    val deltaMv = agg(orders.filter(col("o_orderdate") >= cut))
    val b = baseMv.select(col("o_custkey"), col("n_orders").as("bn"),
      col("revenue").as("br"), col("last_order").as("bl"))
    val d = deltaMv.select(col("o_custkey"), col("n_orders").as("dn"),
      col("revenue").as("dr"), col("last_order").as("dl"))
    b.join(d, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("br"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("dr"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        greatest(col("bl"), col("dl")).as("last_order"))
      .orderBy("o_custkey")
  }

  /** Bloom-filter SEMI-JOIN REDUCTION — the declarative form of the
    * runtime filtering Spark's optimizer injects only when it decides to:
    * aggregate the selective dim's keys into ONE bloom filter
    * (`graft_bloom_agg`, a scalar subquery → broadcast one binary row),
    * probe it at the FACT SCAN (`graft_might_contain`, codegen'd), and
    * only then shuffle-join the survivors. At 100 TB the fact shuffle —
    * the dominant cost of any selective dim join — shrinks to roughly
    * the true match rate (+ false positives); the real join afterwards
    * removes false positives, so the result is EXACT: the oracle is the
    * plain join. PlanSpec pins the probe below the join and
    * result-equality with the unfiltered join. */
  val bloomDimBalance = 9000.0

  def bloomJoin(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).filter(col("c_acctbal") > bloomDimBalance)
      .createOrReplaceTempView("graft_bloom_dim")
    Tables.orders(s, dir).createOrReplaceTempView("graft_bloom_fact")
    s.sql(
      """WITH pruned AS (
        |  SELECT o_custkey, o_totalprice FROM graft_bloom_fact
        |  WHERE graft_might_contain(
        |    (SELECT graft_bloom_agg(xxhash64(c_custkey)) FROM graft_bloom_dim),
        |    xxhash64(o_custkey)))
        |SELECT d.c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM pruned f JOIN graft_bloom_dim d ON f.o_custkey = d.c_custkey
        |GROUP BY d.c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  /** Co-purchase pair mining (frequent itemsets at pair grain, with
    * LIFT): which parts ship together in the same order more than chance
    * predicts — the association-rule primitive behind recommenders and
    * basket analysis. Support counting self-joins the (order, part)
    * table ON THE ORDER KEY, so fan-out is bounded by basket size
    * (≤ C(|order|,2) pair rows per order — skew-free regardless of how
    * popular a part is); part frequencies and the order count ride
    * dim-sized broadcasts. lift = n_co·N / (n_a·n_b), exact integers
    * until one final double division. */
  val copMinSupport = 2

  def copurchasePairs(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val freq = li.groupBy("pk").agg(count(lit(1)).as("cnt"))
    val n = li.agg(countDistinct(col("ok")).as("n_orders"))
    li.as("a")
      .join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= copMinSupport)
      .join(broadcast(freq.select(col("pk").as("part_a"),
        col("cnt").as("n_a"))), Seq("part_a"))
      .join(broadcast(freq.select(col("pk").as("part_b"),
        col("cnt").as("n_b"))), Seq("part_b"))
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("n_co"), col("n_a"),
        col("n_b"),
        round(col("n_co").cast("double") * col("n_orders")
          / (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy("part_a", "part_b")
  }

  /** TPC-H Q2-shaped: minimum-cost supplier per part. This corpus has no
    * partsupp table, so the supply relation is OBSERVED from lineitem:
    * the unit cost of a (part, supplier) edge is the minimum
    * extendedprice/quantity it ever shipped at. For each EUROPE-supplied
    * part of one type, return the supplier(s) achieving that part's
    * minimum unit cost — Q2's correlated-min scalar subquery, written
    * DECORRELATED (per-part min joined back); the oracle keeps the
    * correlated form, so the match proves the rewrite. Unit costs divide
    * in IEEE double identically in both engines, so the min-equality is
    * bit-exact. Both aggregates and the min-join share one partitioning
    * by part key; the part/supplier dims ride in as broadcasts. */
  def q2MinCost(s: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "n_name")
    val costs = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "LARGE")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("s_suppkey"), col("s_name"), col("n_name"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val minc = costs.groupBy(col("p_partkey").as("mc_partkey"))
      .agg(min(col("unit_cost")).as("min_cost"))
    costs.join(minc, col("p_partkey") === col("mc_partkey") &&
        col("unit_cost") === col("min_cost"))
      .select(col("p_partkey"), col("s_name"), col("n_name"),
        round(col("unit_cost"), 6).as("unit_cost"))
      .orderBy("p_partkey", "s_name")
  }

  /** TPC-H Q9-shaped: profit per supplier nation per year for one part
    * family. No ps_supplycost here — the cost proxy is 60% of the part's
    * retail price per unit, which preserves Q9's shape exactly: fact ×
    * two broadcast dims (name-filtered part, supplier→nation), profit
    * as an exact DECIMAL sum, grouped by (nation, year). */
  def q9Profit(s: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val profit = (col("l_extendedprice") * (lit(1) - col("l_discount")) -
      lit(0.6) * col("p_retailprice") * col("l_quantity"))
      .cast("decimal(22,6)")
    Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice",
        "l_discount", "l_quantity")
      .join(broadcast(Tables.part(s, dir).filter(col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).as("l_year"))
      .agg(sum(profit).cast("double").as("profit"))
      .orderBy(col("n_name"), col("l_year").desc)
  }

  /** TPC-H Q11-shaped: important parts by observed supply value from one
    * nation group's suppliers — keep parts whose value exceeds
    * 1/[[q11ShareMult]] of the group total. Q11's HAVING-vs-scalar-
    * subquery shape; the threshold compares EXACTLY via the
    * rearrangement `value·mult > total` in DECIMAL (an avg-as-double
    * threshold could flip borderline parts between engines). One shuffle
    * (per-part aggregate); the grand total is one broadcast row. */
  val q11ShareMult = 600

  def q11Important(s: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir)
        .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val value = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum((col("l_quantity") * col("l_extendedprice"))
        .cast("decimal(22,2)")).as("value"))
    val total = value.agg(sum(col("value")).as("total"))
    value.join(broadcast(total))
      .filter(col("value") * q11ShareMult > col("total"))
      .select(col("p_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** TPC-H Q12-shaped: priority mix of LATE shipments. No l_shipmode or
    * commit/receipt dates in this corpus: a line is late if it shipped
    * more than [[q12LateDays]] days after its order date, and linestatus
    * stands in for shipmode. Q12's conditional pivot (urgent+high vs
    * other) over one join; both date predicates sit on scan columns. */
  val q12LateDays = 60

  def q12Priority(s: SparkSession, dir: String): DataFrame = {
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(year(col("l_shipdate")) === 1997)
      .select("l_orderkey", "l_shipdate", "l_linestatus")
      .join(Tables.orders(s, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > q12LateDays)
      .groupBy(col("l_linestatus"))
      .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!urgent, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q15-shaped: top supplier(s) by revenue over one quarter. The
    * max-revenue threshold is Q15's scalar subquery over the revenue
    * view — revenue stays DECIMAL until after the equality so the
    * tie-set is exact; the max is one broadcast row, the supplier dim a
    * broadcast join against the aggregated (tiny) side. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(22,6)")).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
    rev.join(broadcast(mx)).filter(col("total_revenue") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16-shaped: supplier diversity per part slice — DISTINCT
    * suppliers observed shipping each (brand, type, size) combination,
    * excluding one brand, a size list, and "complaint" suppliers
    * (negative account balance stands in for the comment scan; Q16's
    * NOT IN is the left-anti join — exact here because supplier keys
    * are non-null). count(DISTINCT) shuffles at (group, suppkey) grain
    * first, so no group ever materializes its supplier set in memory. */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val badSupp = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20-shaped: dominant suppliers of a part family — suppliers
    * in a nation group whose 1997 shipped quantity of some 'gear' part
    * exceeds HALF that part's total 1997 shipments (Q20's
    * availqty > ½·demand probe re-expressed over observed supply). The
    * nested-IN chain becomes: broadcast name-filtered parts → one
    * shuffle by part key feeding BOTH the per-(part,supplier) and
    * per-part totals → threshold join → DISTINCT suppliers → broadcast
    * supplier/nation dims. Quantities are integral doubles, so the
    * half-total comparison is exact. */
  def q20Dominant(s: SparkSession, dir: String): DataFrame = {
    val li97 = Tables.lineitem(s, dir)
      .filter(year(col("l_shipdate")) === 1997)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_name").like("%gear%")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
    val perPS = li97.groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity")).as("qty"))
    val perP = perPS.groupBy("l_partkey")
      .agg(sum(col("qty")).as("total_qty"))
    val natSupp = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir).filter(col("n_name")
        .isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
    perPS.join(perP, Seq("l_partkey"))
      .filter(col("qty") * 2 > col("total_qty"))
      .select("l_suppkey").distinct()
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "n_name")
      .orderBy("s_name")
  }

  /** TPC-H Q21-shaped: suppliers who kept orders waiting. For
    * 'F'-status multi-supplier orders, count each supplier's lines that
    * shipped LAST: EXISTS another supplier's line in the order (semi
    * join) ∧ NOT EXISTS another supplier's line shipping strictly later
    * (anti join) — Q21's double correlated subquery as two self-joins.
    * All three joins key on l_orderkey, so the fact stream shuffles
    * ONCE and the sort-merge partitioning is reused; the supplier dim
    * broadcasts; top-20 sorts only the per-supplier aggregate. */
  def q21Waiting(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val others = li.select(col("l_orderkey").as("o2_orderkey"),
      col("l_suppkey").as("o2_suppkey"), col("l_shipdate").as("o2_shipdate"))
    li.join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .join(others, col("l_orderkey") === col("o2_orderkey") &&
        col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
      .join(others, col("l_orderkey") === col("o2_orderkey") &&
        col("l_suppkey") =!= col("o2_suppkey") &&
        col("o2_shipdate") > col("l_shipdate"), "left_anti")
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost" -> (q2MinCost _),
    "q9_profit" -> (q9Profit _),
    "q11_important" -> (q11Important _),
    "q12_priority" -> (q12Priority _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_supplier_cnt" -> (q16SupplierCnt _),
    "q20_dominant" -> (q20Dominant _),
    "q21_waiting" -> (q21Waiting _),
    "copurchase_pairs" -> (copurchasePairs _),
    "bloom_join" -> (bloomJoin _),
    "mv_incremental" -> (mvIncremental _),
    "q6_forecast" -> (q6Forecast _),
    "q7_volume" -> (q7Volume _),
    "q8_share" -> (q8Share _),
    "q10_returns" -> (q10Returns _),
    "q13_distribution" -> (q13Distribution _),
    "q19_disjunct" -> (q19Disjunct _),
    "q22_lapsed" -> (q22Lapsed _),
    "set_ops_all" -> (setOpsAll _),
    "window_ntile" -> (windowNtile _),
    "q17_correlated" -> (q17Correlated _),
    "q1_agg" -> (q1Agg _),
    "q3_join" -> (q3Join _),
    "q4_exists" -> (q4Exists _),
    "q5_join" -> (q5Join _),
    "q14_agg" -> (q14Agg _),
    "q18_having" -> (q18Having _),
    "window_topk" -> (windowTopk _),
    "rollup_agg" -> (rollupAgg _),
    "set_ops" -> (setOps _),
    "asof_join" -> (asofJoin _))

  val oracles: Map[String, String] = Map(
    // the Spark side is decorrelated; the oracle keeps Q2's correlated
    // scalar-min subquery, so the green row proves the rewrite
    "q2_min_cost" ->
      """WITH supp AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |                JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |costs AS (
        |  SELECT l_partkey AS pk, s_suppkey, s_name, n_name,
        |         min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |                JOIN supp ON l_suppkey = s_suppkey
        |  WHERE p_type = 'LARGE'
        |  GROUP BY 1, 2, 3, 4)
        |SELECT pk AS p_partkey, s_name, n_name,
        |       round(unit_cost, 6) AS unit_cost
        |FROM costs c1
        |WHERE unit_cost = (SELECT min(unit_cost) FROM costs c2
        |                   WHERE c2.pk = c1.pk)
        |ORDER BY p_partkey, s_name""".stripMargin,
    "q9_profit" ->
      """SELECT n_name, year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                - 0.6 * p_retailprice * l_quantity
        |                AS DECIMAL(22,6))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
    "q11_important" ->
      s"""WITH val AS (
         |  SELECT l_partkey AS p_partkey,
         |         sum(CAST(l_quantity * l_extendedprice AS DECIMAL(22,2)))
         |           AS value
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |                JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
         |  GROUP BY 1)
         |SELECT p_partkey, CAST(value AS DOUBLE) AS value
         |FROM val
         |WHERE value * $q11ShareMult > (SELECT sum(value) FROM val)
         |ORDER BY value DESC, p_partkey""".stripMargin,
    "q12_priority" ->
      s"""SELECT l_linestatus,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE year(l_shipdate) = 1997
         |  AND date_diff('day', o_orderdate, l_shipdate) > $q12LateDays
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         sum(CAST(l_extendedprice * (1 - l_discount)
        |             AS DECIMAL(22,6))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE)
        |  AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_dominant" ->
      """WITH li97 AS (
        |  SELECT l_partkey, l_suppkey, l_quantity
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%gear%' AND year(l_shipdate) = 1997),
        |per_ps AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        |  FROM li97 GROUP BY 1, 2),
        |per_p AS (
        |  SELECT l_partkey, sum(l_quantity) AS total_qty
        |  FROM li97 GROUP BY 1)
        |SELECT DISTINCT s_name, n_name
        |FROM per_ps
        |JOIN per_p USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE qty * 2 > total_qty
        |  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        |ORDER BY s_name""".stripMargin,
    "q21_waiting" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "copurchase_pairs" ->
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |freq AS (SELECT pk, count(*) AS cnt FROM li GROUP BY 1),
         |n AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
         |pairs AS (
         |  SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_co
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= $copMinSupport)
         |SELECT part_a, part_b, n_co, fa.cnt AS n_a, fb.cnt AS n_b,
         |  round(CAST(n_co AS DOUBLE) * n.n_orders / (fa.cnt * fb.cnt), 6)
         |    AS lift
         |FROM pairs JOIN freq fa ON part_a = fa.pk
         |           JOIN freq fb ON part_b = fb.pk
         |CROSS JOIN n
         |ORDER BY part_a, part_b""".stripMargin,
    // the bloom pre-filter is semantically transparent (the join removes
    // false positives), so the oracle is the plain selective-dim join
    "bloom_join" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_acctbal > $bloomDimBalance
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // the MV maintenance contract IS "merged state ≡ full recompute",
    // so the oracle is the plain recompute over base ∪ delta
    "mv_incremental" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  max(o_orderdate) AS last_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q6_forecast" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(22,6)))
        |       AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |       AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND year(l_shipdate) IN (1996, 1997)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
        |       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))
        |       ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE) AS nation_revenue,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |       AS DOUBLE) AS total_revenue,
        |  round(CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
        |       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))
        |       ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE) /
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |            AS DOUBLE), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |  AND year(o_orderdate) IN (1996, 1997)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_returns" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |       AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q13_distribution" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY n_orders
        |ORDER BY n_customers DESC, n_orders DESC""".stripMargin,
    "q19_disjunct" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |       AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
        |       AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
        |       AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
        |       AND p_size BETWEEN 1 AND 15)""".stripMargin,
    "q22_lapsed" ->
      s"""WITH thr AS (
         |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS pos_sum,
         |         count(*) AS pos_n
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c_mktsegment, count(*) AS n_customers,
         |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         |    AS total_acctbal
         |FROM customer, thr
         |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * pos_n > pos_sum
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '$lapsedCutoff')
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |       AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "set_ops_all" ->
      """WITH l AS (SELECT user_id FROM events WHERE event_type = 'login'),
        |e AS (SELECT user_id FROM events WHERE event_type = 'error'),
        |u AS (
        |  SELECT 'intersect_all' AS set_op, user_id FROM
        |    (SELECT user_id FROM l INTERSECT ALL SELECT user_id FROM e)
        |  UNION ALL
        |  SELECT 'except_all' AS set_op, user_id FROM
        |    (SELECT user_id FROM l EXCEPT ALL SELECT user_id FROM e))
        |SELECT set_op, user_id, count(*) AS multiplicity
        |FROM u GROUP BY set_op, user_id ORDER BY set_op, user_id""".stripMargin,
    "window_ntile" ->
      """SELECT event_type, event_id, value,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, event_id""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |       AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |       AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1994-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q17_correlated" ->
      """SELECT count(*) AS n_small,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / 7.0, 6) AS avg_yearly
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    "q4_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q18_having" ->
      s"""SELECT c_custkey, c_name, c_mktsegment, n_orders, total_spend
         |FROM (
         |  SELECT o_custkey, count(*) AS n_orders,
         |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |           AS total_spend
         |  FROM orders GROUP BY o_custkey
         |  HAVING CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         > $largeCustomerThreshold) agg
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY total_spend DESC, c_custkey""".stripMargin,
    "q14_agg" ->
      """SELECT p_brand,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))
        |       ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |       AS DOUBLE) AS total_revenue,
        |  round(100 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))
        |       ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE) /
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |            AS DOUBLE), 6) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "window_topk" ->
      """SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders)
        |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,
    "rollup_agg" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""
        .stripMargin,
    "set_ops" ->
      """WITH s AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'signup'),
        |     p AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'purchase')
        |SELECT user_id, 'intersect' AS set_op
        |FROM (SELECT user_id FROM s INTERSECT SELECT user_id FROM p)
        |UNION ALL
        |SELECT user_id, 'except' AS set_op
        |FROM (SELECT user_id FROM s EXCEPT SELECT user_id FROM p)
        |ORDER BY set_op, user_id""".stripMargin,
    "asof_join" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, asof_view_id
        |FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'view' THEN event_id END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS asof_view_id
        |  FROM events WHERE event_type IN ('view', 'purchase'))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)
}
