package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The conf-gated bucketed-range-join optimizer rule
  * ([[graft.plans.RangeJoinBucketing]]): plan shape flips from
  * nested-loop to an equi join on the synthesized bucket, results stay
  * bit-identical, and non-matching joins are untouched. */
class RangeJoinRuleSpec extends SparkSpec {

  private val ConfKey = "spark.graft.rangeJoin.bucketWidth"

  private def probes() = Tables.events(spark, sf)
    .filter(col("event_type") === "error")
    .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("sec"))

  private def windows() = Tables.events(spark, sf)
    .filter(col("event_type") === "signup" && col("user_id") === 0)
    .select(col("event_id").as("window_id"),
      (unix_timestamp(col("ts")) - 7200L).as("w_start"),
      (unix_timestamp(col("ts")) + 7200L).as("w_end"))

  private def naiveJoin(p: DataFrame, w: DataFrame): DataFrame =
    p.join(w, p("sec") >= w("w_start") && p("sec") < w("w_end"))
      .select("window_id", "event_id", "user_id", "sec")

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def withConf[A](v: String)(body: => A): A = {
    spark.conf.set(ConfKey, v)
    try body finally spark.conf.unset(ConfKey)
  }

  test("band join rewrites to a bucketed equi join; results bit-identical") {
    val off = naiveJoin(probes(), windows())
    val offPlan = plan(off)
    assert(offPlan.contains("BroadcastNestedLoopJoin") ||
      offPlan.contains("CartesianProduct"),
      s"without the rule the band join must be a nested loop:\n$offPlan")
    val want = off.collect().toSet
    withConf("7200") {
      val on = naiveJoin(probes(), windows())
      val onPlan = plan(on)
      assert(onPlan.contains("__graft_bkt"),
        s"rewritten plan must join on the synthesized bucket:\n$onPlan")
      assert(!onPlan.contains("BroadcastNestedLoopJoin") &&
        !onPlan.contains("CartesianProduct"),
        s"rewritten plan must not nested-loop:\n$onPlan")
      assert(on.collect().toSet === want)
      assert(on.schema === off.schema, "rewrite must not leak bucket columns")
    }
  }

  test("swapped sides (windows on the left) rewrite too") {
    val p = probes(); val w = windows()
    val off = w.join(p, p("sec") >= w("w_start") && p("sec") < w("w_end"))
      .select("window_id", "event_id")
    val want = off.collect().toSet
    withConf("7200") {
      val on = w.join(p, p("sec") >= w("w_start") && p("sec") < w("w_end"))
        .select("window_id", "event_id")
      assert(plan(on).contains("__graft_bkt"))
      assert(on.collect().toSet === want)
    }
  }

  test("degenerate windows (end < start) stay empty instead of erroring") {
    import spark.implicits._
    val w = Seq((1L, 100L, 50L), (2L, 0L, 200L)).toDF("window_id", "w_start", "w_end")
    val p = Seq((10L, 75L), (11L, 150L)).toDF("event_id", "sec")
    withConf("60") {
      val on = p.join(w, p("sec") >= w("w_start") && p("sec") < w("w_end"))
        .select("window_id", "event_id")
      assert(plan(on).contains("__graft_bkt"))
      // window 1 is empty (end < start); window 2 catches both probes
      assert(on.as[(Long, Long)].collect().toSet === Set((2L, 10L), (2L, 11L)))
    }
  }

  test("equi joins and other conditions are left untouched") {
    withConf("7200") {
      val p = probes(); val w = windows()
      val equi = p.join(w, p("event_id") === w("window_id"))
      assert(!plan(equi).contains("__graft_bkt"))
      // extra conjunct → out of the rule's narrow scope → untouched
      val extra = p.join(w, p("sec") >= w("w_start") && p("sec") < w("w_end")
        && p("user_id") =!= w("window_id"))
      assert(!plan(extra).contains("__graft_bkt"))
    }
  }

  test("rule is inert when the conf is unset") {
    val p = probes(); val w = windows()
    assert(!plan(naiveJoin(p, w)).contains("__graft_bkt"))
  }

  test("all band shapes rewrite: strictness variants, flipped sides, swapped conjuncts") {
    val p = probes(); val w = windows()
    def q(cond: org.apache.spark.sql.Column) =
      p.join(w, cond).select("window_id", "event_id", "user_id", "sec")
    val shapes = Seq(
      ("> and <=", p("sec") > w("w_start") && p("sec") <= w("w_end")),
      (">= and <=", p("sec") >= w("w_start") && p("sec") <= w("w_end")),
      ("> and <", p("sec") > w("w_start") && p("sec") < w("w_end")),
      ("flipped sides", w("w_start") <= p("sec") && w("w_end") > p("sec")),
      ("swapped conjuncts", p("sec") < w("w_end") && p("sec") >= w("w_start")))
    shapes.foreach { case (name, cond) =>
      val want = q(cond).collect().toSet
      withConf("7200") {
        val on = q(cond)
        assert(plan(on).contains("__graft_bkt"), s"shape '$name' must rewrite")
        assert(!plan(on).contains("BroadcastNestedLoopJoin") &&
          !plan(on).contains("CartesianProduct"), s"shape '$name' must not nested-loop")
        assert(on.collect().toSet === want, s"shape '$name' must stay result-identical")
      }
    }
    // one-sided predicates stay out of scope
    withConf("7200") {
      val oneSided = p.join(w, p("sec") >= w("w_start"))
      assert(!plan(oneSided).contains("__graft_bkt"))
    }
  }

  test("a window spanning >= maxBucketsPerWindow buckets fails loudly, not quadratically") {
    import spark.implicits._
    val w = Seq((1L, 0L, 1000000L)).toDF("window_id", "w_start", "w_end")
    val p = Seq((10L, 75L)).toDF("event_id", "sec")
    def q() = p.join(w, p("sec") >= w("w_start") && p("sec") < w("w_end"))
      .select("window_id", "event_id")
    withConf("60") { // span / width ≈ 16667 buckets
      spark.conf.set("spark.graft.rangeJoin.maxBucketsPerWindow", "1000")
      try {
        val e = intercept[Exception](q().collect())
        def msgs(t: Throwable): Seq[String] =
          Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
        assert(msgs(e).exists(m => m != null && m.contains("graft range join")),
          s"expected the guard's message, got: $e")
        // same query under the default cap (65536 > 16667) completes
        spark.conf.unset("spark.graft.rangeJoin.maxBucketsPerWindow")
        assert(q().as[(Long, Long)].collect().toSet === Set((1L, 10L)))
      } finally spark.conf.unset("spark.graft.rangeJoin.maxBucketsPerWindow")
    }
  }

  test("the driver-facing range_join_auto query plans without a nested loop") {
    val df = graft.ops.AnalyticsQueries.rangeJoinAuto(spark, sf)
    val s = plan(df)
    assert(s.contains("__graft_bkt"), s"rule did not fire:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"naive formulation must plan as the bucketed join:\n$s")
    // the child-session conf must not leak into the caller's session
    assert(spark.conf.getOption(ConfKey).isEmpty)
    assert(df.count() > 0)
  }
}
