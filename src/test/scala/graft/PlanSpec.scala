package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions — the scale claims in COVERAGE.md §plan-audit
  * pinned as tests, so a regression that silently de-optimizes a plan
  * (lost pushdown, broadcast→shuffle flip, codegen fallback) fails CI
  * instead of surfacing as a 10× slowdown at deployment scale. */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out) { df.explain("formatted") }
    out.toString
  }

  test("dimension joins resolve to broadcast, fact-fact joins to shuffle") {
    val q3 = planOf(ops.RelationalQueries.queries("q3_join")(spark, sf))
    assert(q3.contains("BroadcastHashJoin"), "q3 customer dim must broadcast")
    // big-big: lineitem ⋈ orders on orderkey with no broadcast hint and
    // thresholds beaten — must be a shuffle join, not a broadcast of a fact
    val big = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try {
      val p = planOf(Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey")))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"fact-fact join must shuffle, got:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", big)
  }

  test("filters and projections reach the parquet scan") {
    val f = formatted(ops.RelationalQueries.queries("q1_agg")(spark, sf))
    assert(f.contains("PushedFilters: [IsNotNull(l_shipdate)")
      || f.contains("LessThanOrEqual(l_shipdate"), s"q1 shipdate filter must push down:\n$f")
    // ReadSchema pruned: q1 needs 6 lineitem columns, not all 11
    val readSchema = f.linesIterator.filter(_.startsWith("ReadSchema")).mkString
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_tax"),
      s"q1 scan must prune unused columns:\n$readSchema")
  }

  test("top-k never globally sorts: TakeOrderedAndProject / WindowGroupLimit") {
    val q3 = planOf(ops.RelationalQueries.queries("q3_join")(spark, sf))
    assert(q3.contains("TakeOrderedAndProject"), "q3 limit 10 must be top-k")
    val topk = planOf(ops.RelationalQueries.queries("window_topk")(spark, sf))
    assert(topk.contains("WindowGroupLimit"),
      "ranking-window filter must push the group limit below the window")
  }

  test("native expressions stay inside whole-stage codegen") {
    // AQE finalizes (and reveals WholeStageCodegen spans) only on execution
    def finalPlan(df: DataFrame): String = { df.collect(); planOf(df) }
    // "*(n)" is the whole-stage-codegen stage marker in plan strings
    val sig = finalPlan(ops.DedupQueries.queries("dedup_simhash_sig")(spark, sf))
    assert(sig.contains("*(1) Project") && sig.contains("simhash60"),
      s"the simhash projection must sit inside a codegen stage:\n$sig")
    assert(!sig.contains("CodegenFallback"), "no interpreted fallback on the hot path")
    val fp = finalPlan(ops.TextQueries.queries("text_fingerprint")(spark, sf))
    assert(fp.contains("*("), s"fingerprint must have codegen stages:\n$fp")
  }

  test("PQ inner loops are codegen kernels, not interpreted HOF folds") {
    def finalPlan(df: DataFrame): String = { df.collect(); planOf(df) }
    // encode: one pq_code call per row inside a codegen Project
    val pq = finalPlan(ops.SimilarityQueries.queries("embedding_pq")(spark, sf))
    assert(pq.contains("pq_code"), s"embedding_pq must use the pq_code kernel:\n$pq")
    assert(!pq.contains("CodegenFallback"), "no interpreted fallback on the encode path")
    assert(!pq.contains("lambdafunction"),
      s"no interpreted HOF lambda may remain on the encode path:\n$pq")
    // search: the per-candidate ADC score — the true hot loop — must be a
    // kernel call inside a whole-stage-codegen span
    for (q <- Seq("ann_pq_adc", "ann_ivf_pq")) {
      val p = finalPlan(ops.SimilarityQueries.queries(q)(spark, sf))
      val adcLine = p.linesIterator.find(_.contains("pq_adc"))
      assert(adcLine.isDefined, s"$q must score via the pq_adc kernel:\n$p")
      assert(adcLine.get.contains("*("),
        s"$q ADC scoring must sit inside a codegen stage:\n${adcLine.get}")
      assert(p.contains("pq_lut"), s"$q queries must carry pq_lut tables:\n$p")
    }
  }

  test("embedding_centroids never collects a whole label into one buffer") {
    // the scale contract: every collect_list aggregation is keyed by
    // (label, bkt) — buffers bounded by the bucket size — and only the
    // bucket PARTIALS (one row per bucket) aggregate per label
    val plan = planOf(ops.SimilarityQueries.queries("embedding_centroids")(spark, sf))
    val collectAggs = plan.linesIterator
      .filter(l => l.contains("collect_list(struct(vec_id"))
      .filter(_.contains("keys="))
      .toList
    assert(collectAggs.nonEmpty, s"expected a vector collect aggregate in:\n$plan")
    collectAggs.foreach { l =>
      assert(l.contains("bkt"),
        s"vector collect must be keyed by (label, bkt), got:\n$l")
    }
  }

  test("tfidf bounds its broadcast: heavy hitters broadcast, tail shuffle-joins") {
    val p = planOf(ops.CurationQueries.queries("tfidf_top_terms")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"heavy-hitter df side must broadcast:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"long-tail df side must shuffle-join (merge hint), not broadcast:\n$p")
  }

  test("the SCD2 merge never shuffles the history side") {
    import graft.scd2.Scd2
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value", "ts")
    val hist = Scd2.fromEvents(ev.filter(col("event_id") <= 500),
      Seq("user_id"), "ts", "event_id")
    val merged = Scd2.applyBatch(hist, ev.filter(col("event_id") > 500),
      Seq("user_id"), "ts", "event_id")
    val p = planOf(merged)
    assert(p.contains("BroadcastHashJoin"),
      s"history×batch-keys join must broadcast the key set:\n$p")
  }

  test("decontaminate broadcasts the benchmark grams, never the corpus") {
    // the asymmetric contract: the benchmark side (tiny eval set) feeds a
    // BroadcastHashJoin LeftSemi probe; the corpus postings never shuffle
    // for candidate generation
    val p = planOf(ops.PrepQueries.queries("decontaminate")(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"benchmark gram set must broadcast into a semi probe:\n$p")
  }

  test("decontaminate_fuzzy: bench postings broadcast; argmax is a hash agg") {
    // same asymmetry as decontaminate, but an INNER broadcast probe that
    // keeps the benchmark doc identity; best-match selection must be the
    // struct-max hash aggregate, never a rank window (no sort at scale)
    val p = planOf(ops.PrepQueries.queries("decontaminate_fuzzy")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark postings must broadcast:\n$p")
    assert(!p.contains("Window"), s"argmax must be an aggregate, not a window:\n$p")
    // the packed-long max_by regression: a struct max here silently
    // degrades to a grouped SortAggregate (immutable agg buffer)
    assert(!p.contains("SortAggregate"),
      s"argmax must stay a mutable-buffer hash aggregate:\n$p")
  }

  test("range join: windows broadcast; probes join on the bucket key") {
    val p = planOf(ops.AnalyticsQueries.queries("range_join")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"the exploded window-bucket side must broadcast:\n$p")
    assert(p.contains("bucket"), s"join must run on the synthesized bucket key:\n$p")
  }

  test("oov vocab selection is a distributed top-k, not a global rank window") {
    val p = planOf(ops.PrepQueries.queries("oov_rate")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K vocab must be TakeOrderedAndProject, not a single-partition window:\n$p")
  }

  test("AQE splits a skewed join partition at runtime (the hot-key safety net)") {
    // one key carries ~100× the rows of any other; with skew-join
    // thresholds scaled to local data sizes, AQE must mark the sort-merge
    // join skew-handled and split the hot partition — the runtime half of
    // the skew story (the declarative half is the salted_agg pattern)
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val hot = spark.range(200000).select(lit(7L).as("k"),
        concat(lit("payload-"), col("id")).as("v"))
      val cold = spark.range(2000).select(pmod(col("id"), lit(500)).as("k"),
        col("id").cast("string").as("v"))
      val left = hot.unionByName(cold)
      val dim = spark.range(500).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("d"))
      // keep the wide payload through the join: column pruning would
      // otherwise shrink the hot partition below the skew threshold
      val j = left.join(dim, Seq("k")).select("k", "v", "d")
      // collect() executes THIS queryExecution (count() would build a new
      // one and leave j's plan unfinalized)
      assert(j.collect().length === 202000)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark the hot partition skew-handled:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join co-located: no shuffle on either side") {
    // the 100 TB claim behind "pre-bucket big joins" (SURVEY §scale notes),
    // pinned: two tables bucketed+sorted on the join key sort-merge-join
    // with ZERO Exchange — the shuffle happened once at write time
    val big = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("g_orders_bkt")
      Tables.customer(spark, sf).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("g_cust_bkt")
      val j = spark.table("g_orders_bkt").join(spark.table("g_cust_bkt"),
        col("o_custkey") === col("c_custkey"))
      val p = planOf(j)
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$p")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", big)
      spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS g_cust_bkt")
      ()
    }
  }

  test("pii_scrub is a pure scan-speed projection (no aggregate, pruned scan)") {
    val f = formatted(ops.TextQueries.queries("pii_scrub")(spark, sf))
    assert(!f.contains("HashAggregate"),
      s"scrubbing must not aggregate:\n$f")
    val readSchema = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan must prune to (doc_id, text):\n$readSchema")
  }

  test("quality_filter is a pure scan-speed projection (no aggregate, no shuffle)") {
    val f = formatted(ops.TextQueries.queries("quality_filter")(spark, sf))
    assert(!f.contains("HashAggregate"), s"rule filter must not aggregate:\n$f")
    assert(!f.contains("Exchange hashpartitioning"),
      s"rule filter must not shuffle:\n$f")
    val readSchema = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan must prune to (doc_id, text):\n$readSchema")
  }

  test("blocklist_filter is a pure scan-speed projection (no aggregate, no shuffle)") {
    val f = formatted(ops.CurationQueries.queries("blocklist_filter")(spark, sf))
    assert(!f.contains("HashAggregate"), s"blocklist gate must not aggregate:\n$f")
    assert(!f.contains("Exchange hashpartitioning"),
      s"blocklist gate must not shuffle:\n$f")
    val readSchema = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan must prune to (doc_id, text):\n$readSchema")
  }

  test("html_extract is a pure scan-speed projection (no aggregate, no shuffle)") {
    val f = formatted(ops.TextQueries.queries("html_extract")(spark, sf))
    assert(!f.contains("HashAggregate"), s"extractor must not aggregate:\n$f")
    assert(!f.contains("Exchange hashpartitioning"),
      s"extractor must not shuffle:\n$f")
    val readSchema = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan must prune to (doc_id, text):\n$readSchema")
  }

  test("curation pipeline pays exactly one hash shuffle (the content-hash window)") {
    val p = planOf(ops.CurationQueries.queries("curation_pipeline")(spark, sf))
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toList
    assert(hashEx.size === 1,
      s"rules 1-3 ride the scan; only the dedup window may shuffle:\n$p")
  }

  test("embedding_pq: codebook broadcasts, assignment never shuffles the corpus") {
    val p = planOf(ops.SimilarityQueries.queries("embedding_pq")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row codebook must ride in as a broadcast:\n$p")
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toList
    assert(hashEx.isEmpty, s"no corpus-side hash shuffle expected:\n$hashEx")
    assert(p.contains("TakeOrderedAndProject"),
      s"codebook seed selection must be a top-k, not a global sort:\n$p")
  }

  test("ANN query batch is bounded: the stride cap binds at maxQueries") {
    // the constant that makes broadcast(q) a bounded class — on a corpus
    // big enough that stride multiples exceed the cap, exactly maxQueries
    // queries survive, all of them the FIRST stride multiples
    val st = ops.SimilarityQueries.queryStride.toLong
    val cap = ops.SimilarityQueries.maxQueries
    val ids = spark.range(0, st * cap * 3).select(col("id").as("vec_id"))
      .filter(ops.SimilarityQueries.queryPred(st))
      .select(col("vec_id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(ids.length === cap, s"cap must bind at $cap, got ${ids.length}")
    assert(ids.forall(_ % st == 0) && ids.last < st * cap,
      "capped query set must be the first maxQueries stride multiples")
    // and below the cap the predicate is the plain stride (every test sf):
    val small = spark.range(0, st * 10).select(col("id").as("vec_id"))
      .filter(ops.SimilarityQueries.queryPred(st)).count()
    assert(small === 10, "cap must be non-binding below maxQueries queries")
  }

  test("ANN equi seams keep a shuffle fallback (no forced query broadcast)") {
    // round-15 rule: corpus-side equi-joins in the ANN spine carry NO
    // broadcast hint — with auto-broadcast off they must plan as shuffle
    // joins, proving the strategy is AQE's choice, not a forced hint that
    // would OOM if the joined side ever grew
    val big = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf(
        ops.SimilarityQueries.queries("ann_filtered_recall")(spark, sf))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"the label equi-join must shuffle when broadcast is off:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", big)
  }

  test("zorder layout is one scan + a 1-row bounds broadcast, no shuffle of facts") {
    val p = planOf(ops.PrepQueries.queries("zorder_layout")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"min/max bounds must ride in as a broadcast:\n$p")
    assert(p.contains("zorder2"), s"the Morton kernel must appear in the plan:\n$p")
    // the only exchange allowed is the presentation sort + bounds agg:
    // no hash-partitioning of the event scan by any column
    val hashEx = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(hashEx.isEmpty, s"no fact-side hash shuffle expected:\n$hashEx")
  }

  test("TPC-H completion suite: subquery shapes plan as joins, dims broadcast") {
    // q21: both correlated subqueries become self-joins (semi + anti),
    // never a per-row re-scan; the top-20 is a top-k of the aggregate
    val q21 = planOf(ops.RelationalQueries.queries("q21_waiting")(spark, sf))
    assert(q21.contains("LeftSemi"), s"q21 EXISTS must plan semi:\n$q21")
    assert(q21.contains("LeftAnti"), s"q21 NOT EXISTS must plan anti:\n$q21")
    assert(q21.contains("TakeOrderedAndProject"),
      s"q21 limit must be a top-k:\n$q21")
    // q16: the NOT IN supplier exclusion is a broadcast anti join
    val q16 = planOf(ops.RelationalQueries.queries("q16_supplier_cnt")(spark, sf))
    assert(q16.contains("BroadcastHashJoin") && q16.contains("LeftAnti"),
      s"q16 exclusion must be a broadcast anti join:\n$q16")
    // q15/q11: the scalar-subquery threshold rides in as a broadcast of
    // ONE aggregated row, not a shuffle join
    for (name <- Seq("q15_top_supplier", "q11_important")) {
      val p = planOf(ops.RelationalQueries.queries(name)(spark, sf))
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("BroadcastHashJoin"),
        s"$name threshold row must broadcast:\n$p")
    }
    // q2: the part-type filter reaches the part scan (semi-reduces the
    // fact stream before any aggregate)
    val q2 = formatted(ops.RelationalQueries.queries("q2_min_cost")(spark, sf))
    assert(q2.contains("EqualTo(p_type,LARGE)"),
      s"q2 part filter must push to the part scan:\n$q2")
  }

  test("deep TPC-H suite: scan pushdown, broadcast dims, top-k, anti-join") {
    // q6: every predicate sits on the scan — the canonical pushdown probe
    val q6 = formatted(ops.RelationalQueries.queries("q6_forecast")(spark, sf))
    assert(q6.contains("GreaterThanOrEqual(l_shipdate") &&
      q6.contains("LessThan(l_quantity,24.0)"),
      s"q6 date+quantity predicates must push to the parquet scan:\n$q6")
    // q7/q8: every dim rides in as a broadcast; the only shuffle join is
    // lineitem ⋈ orders
    for (name <- Seq("q7_volume", "q8_share")) {
      val p = planOf(ops.RelationalQueries.queries(name)(spark, sf))
      assert(p.contains("BroadcastHashJoin"), s"$name dims must broadcast:\n$p")
    }
    // q10: the top-20 sorts only aggregated rows, never the fact stream
    val q10 = planOf(ops.RelationalQueries.queries("q10_returns")(spark, sf))
    assert(q10.contains("TakeOrderedAndProject"),
      s"q10 limit must be a top-k, not a global sort:\n$q10")
    // q19: the brand/size disjunction reaches the part scan as an Or filter
    val q19 = formatted(ops.RelationalQueries.queries("q19_disjunct")(spark, sf))
    assert(q19.contains("Or(") && q19.contains("EqualTo(p_brand,Brand#1)"),
      s"q19 disjunction must push its part-side predicates to the scan:\n$q19")
    // q22: NOT EXISTS plans as an anti join (no correlated re-scan per row)
    val q22 = planOf(ops.RelationalQueries.queries("q22_lapsed")(spark, sf))
    assert(q22.contains("LeftAnti"), s"q22 must plan a left-anti join:\n$q22")
  }

  test("training manifest pays exactly one hash shuffle (the dedup window)") {
    val p = planOf(ops.CurationQueries.queries("training_manifest")(spark, sf))
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toList
    assert(hashEx.size === 1,
      s"split/quality/token signals ride the scan; only canonicality " +
        s"may shuffle:\n$p")
  }

  test("bloom_join: the membership probe filters the fact BELOW the join") {
    val df = ops.RelationalQueries.queries("bloom_join")(spark, sf)
    val p = planOf(df)
    assert(p.contains("graft_might_contain") || p.contains("might_contain"),
      s"bloom probe must survive into the physical plan:\n$p")
    // the probe is a Filter on the fact scan side, strictly below the join
    val probeIdx = p.indexOf("might_contain")
    val joinIdx = math.max(p.indexOf("SortMergeJoin"),
      math.max(p.indexOf("ShuffledHashJoin"), p.indexOf("BroadcastHashJoin")))
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"probe (plan-text offset $probeIdx) must be in the join's subtree " +
        s"(join at $joinIdx):\n$p")
    // transparency: bloom-pruned result ≡ the plain selective-dim join
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
          .filter(col("c_acctbal") > ops.RelationalQueries.bloomDimBalance),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .select("c_mktsegment", "n_orders", "revenue")
    assert(df.exceptAll(plain).isEmpty && plain.exceptAll(df).isEmpty,
      "bloom pre-filter must be semantically transparent")
  }

  test("adaptive query execution is on for every graft session") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    val df = Tables.lineitem(spark, sf).groupBy("l_returnflag").count()
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("AdaptiveSparkPlan"))
  }

  /** Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
    * every entry is either a broadcast of a PROVABLY-TINY side (a 1-row
    * stats/bounds/total/scalar-subquery result or a codebook) or a
    * documented pinned all-pairs baseline whose scale twin lives in the
    * same file. An addition to this list needs the same justification in
    * the operator's scaladoc. */
  private val nljAllowlist: Set[String] = Set(
    "ann_brute_force", "ann_ivf", "ann_ivf_pq", "ann_ivf_trained",
    // ann_filtered: the same broadcast query-set × √n-centroid probe
    // product as ann_ivf, with the label predicate folded in-cell;
    // its recall monitor composes it (the brute side joins on the
    // label equi-key — no NLJ of its own)
    "ann_filtered", "ann_filtered_recall",
    // ann_recall_report composes two allowlisted operators (the pinned
    // brute baseline's broadcast-query NLJ rides along by construction)
    // ann_graph_search's entry scoring is the |Q|×√n broadcast product
    // (the IVF probe cost) on top of the graph build's allowlisted plan
    "ann_graph_search",
    // retrieval_eval(_ivf): the graded candidate stage is the pinned
    // brute / IVF retrieval (their allowlisted broadcast-query NLJ
    // rides along); the metric tail itself is equi-joins + one hash
    // aggregate over |queries|·k rows
    "retrieval_eval", "retrieval_eval_ivf",
    // retrieval_eval_hybrid grades hybrid_search_ivf's own (allowlisted)
    // plan; the metric tail adds only equi-joins + a hash aggregate
    "retrieval_eval_hybrid",
    // multimodal_pair_funnel ends in curation_funnel's 1-row totals
    // broadcast (≤7 stage rows × 1 row)
    "multimodal_pair_funnel",
    // ann_graph_search_hnsw: the same bounded entry-scoring product at
    // the 8×-coarser nested layer (|Q| × √n/8)
    "ann_graph_search_hnsw",
    // takedown_replay_ann searches the post-takedown AnnStream index —
    // the ann_ivf_pq plan class (1-row codebook crossJoins + the
    // bounded-query × streaming-centroid probe product)
    "takedown_replay_ann",
    // ann_ivf_capped: ann_ivf's plan over the replica-expanded corpus —
    // the extra crossJoin is the 10-row replica table, and the probe
    // product is the CAPPED query batch (4096) × √(R·n) centroids
    "ann_ivf_capped",
    "ann_pq_adc", "ann_recall_report", "bm25_topk", "budget_select",
    "chi_square", "classifier_weights",
    // the eval faces end in EvalQueries.gateEval's 1-row × 1-row metric
    // assembly (and classifier_eval composes text_classify's chain);
    // gate_eval_highndv is the same tail over a near-unique score grid
    "classifier_eval", "classifier_pr_curve", "curation_funnel", "dsir_eval",
    // curation_funnel_live: the same ≤5-row × 1-row funnel-totals
    // broadcast, served from the streaming monitor's committed counts
    "curation_funnel_live",
    // curation_funnel_drift: two funnel tails (each the 1-row totals
    // broadcast) over subset sums of the committed counts
    "curation_funnel_drift",
    "gate_eval_highndv",
    // classifier_calibration rides the same classifier chain (the
    // |V|×L model grid and 1-row prior broadcasts); its own tail is
    // a pure hash aggregate
    "classifier_calibration",
    // gate_eval_drift: two gateEval tails (each the allowlisted 1-row
    // metric assembly) plus the 1-row × 1-row lifetime-vs-window join
    "gate_eval_drift",
    // takedown_replay_eval wraps the same gateEvalDrift 1-row assembly
    // over the post-takedown monitor state
    "takedown_replay_eval",
    // round-15 counts-backed monitors: the ≤7-row funnel/count tables
    // crossJoin their 1-row totals (pairFunnelFromCounts) and
    // url_gate_drift assembles two 1-row tallies — the same 1-row
    // assembly class as the funnel faces above
    "multimodal_funnel_live", "multimodal_funnel_drift", "url_gate_drift",
    // host_filter's 1-row corpus-mean threshold broadcast
    "host_filter",
    // lm_ppl_buckets: 1-row totals + two 1-row tertile-threshold
    // broadcasts over the distributed prefix-summed histogram
    "lm_ppl_buckets",
    // dedup_recall_report: three 1-row × 1-row metric-assembly joins
    // over the graded operators' own (allowlist-clean) pair plans
    "dedup_recall_report",
    "copurchase_pairs", "corpus_divergence", "dedup_embedding",
    "doc_keywords", "dsir_select",
    "embedding_pq", "embedding_pq_trained", "hilbert_layout",
    "hybrid_search", "hybrid_search_ivf", "knn_graph", "knn_graph_blocked",
    "negative_sample", "q11_important", "q22_lapsed", "rfm_segments",
    "rfm_segments_bucketed", "sample_mixture", "skew_report",
    "temperature_mixture", "text_classify", "tfidf_top_terms", "token_pmi",
    "zone_map", "zorder_layout")

  test("whole-surface plan audit: no grouped SortAggregate, no cartesian, " +
      "nested-loop joins only on the documented allowlist") {
    // sparkPlan, not executedPlan: AQE's AdaptiveSparkPlanExec hides its
    // children from collect() (the round-8 data_profile SortAggregate
    // cost 3.9 s and was invisible through the adaptive wrapper)
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf).queryExecution.sparkPlan
      plan.foreach {
        case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec
          if s.groupingExpressions.nonEmpty =>
          bad += s"$name: grouped SortAggregate (non-mutable agg buffer?)"
        case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
          bad += s"$name: CartesianProduct (join lost its equi-condition?)"
        case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
          if !nljAllowlist.contains(name) =>
          bad += s"$name: BroadcastNestedLoopJoin not on the allowlist"
        case _ => ()
      }
    }
    assert(bad.isEmpty, s"\n${bad.distinct.mkString("\n")}")
  }
}
