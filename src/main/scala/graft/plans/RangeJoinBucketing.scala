package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: BUCKETED RANGE JOIN rewrite.
  *
  * An inner join whose only condition is a band predicate
  * `p >= lo AND p < hi` has no equi key, so Spark executes it as a
  * broadcast nested-loop / cartesian product — O(n·m) comparisons, the
  * classic scale cliff for interval joins. When
  * `spark.graft.rangeJoin.bucketWidth` is set (> 0), this rule rewrites
  * the join into the bucketed form (the shape behind Databricks' range
  * join hint and Flink's interval join):
  *
  *   probe side:  __bkt = p div W                (one bucket per row)
  *   window side: __bkt = explode(sequence(lo div W, hi div W))
  *   join:        equi on __bkt  AND  the original band residual
  *
  * Each qualifying (probe, window) pair agrees on exactly ONE bucket (the
  * probe row has one), so the rewrite emits no duplicates and is
  * result-identical to the naive join; work drops to
  * O(m · span/W + matching pairs) with skew bounded by rows-per-bucket.
  * The window side pays ⌈span/W⌉+1 index rows per window — the user picks
  * W close to the typical span via the conf (exactly the knob the range
  * join hint exposes). The bound `sequence(.., greatest(lo, hi) div W)`
  * keeps degenerate windows (hi < lo — empty in the naive join) from
  * erroring in `sequence`; their buckets produce no residual matches.
  *
  * Scope (deliberately narrow, fail-closed): INNER joins, condition
  * EXACTLY `GreaterThanOrEqual(p, lo) && LessThan(p, hi)` over LONG
  * attributes with `p` from one side and `lo`/`hi` from the other, no
  * other conjuncts. Anything else is left untouched.
  *
  * GUARD: a window whose span covers ≥ `spark.graft.rangeJoin
  * .maxBucketsPerWindow` buckets (default 65536) would materialize an
  * unbounded index array — past Spark's max array length for wide-enough
  * spans, and silently quadratic in memory before that. The rewrite fails
  * those rows LOUDLY at runtime with the remedy in the message (raise the
  * bucket width, or the cap) instead of letting `sequence` blow up deep
  * inside codegen. Row-level, so null bounds (no match in the naive join
  * either) still produce no rows rather than an error.
  */
case class RangeJoinBucketing(spark: SparkSession) extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rangeJoin.bucketWidth"
  val MaxBucketsKey = "spark.graft.rangeJoin.maxBucketsPerWindow"
  val MaxBucketsDefault = 65536L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a malformed width must disable the rule, not fail every query plan
    val width = spark.conf.getOption(ConfKey).flatMap(_.toLongOption).getOrElse(0L)
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        matchBand(cond, left, right) match {
          case Some((probe, lo, hi, probeIsLeft)) =>
            rewrite(j, probe, lo, hi, probeIsLeft, width, hint)
          case None => j
        }
    }
  }

  /** cond ≡ p >= lo && p < hi with p on one side, lo/hi on the other →
    * (p, lo, hi, probeIsLeft). */
  private def matchBand(cond: Expression, left: LogicalPlan,
                        right: LogicalPlan): Option[(Attribute, Attribute, Attribute, Boolean)] =
    cond match {
      case And(GreaterThanOrEqual(p1: Attribute, lo: Attribute),
               LessThan(p2: Attribute, hi: Attribute))
          if p1.semanticEquals(p2) && p1.dataType == LongType &&
             lo.dataType == LongType && hi.dataType == LongType =>
        val (lOut, rOut) = (left.outputSet, right.outputSet)
        if (lOut.contains(p1) && rOut.contains(lo) && rOut.contains(hi))
          Some((p1, lo, hi, true))
        else if (rOut.contains(p1) && lOut.contains(lo) && lOut.contains(hi))
          Some((p1, lo, hi, false))
        else None
      case _ => None
    }

  private def rewrite(j: Join, probe: Attribute, lo: Attribute, hi: Attribute,
                      probeIsLeft: Boolean, width: Long,
                      hint: JoinHint): LogicalPlan = {
    val w = Literal(width, LongType)
    val (probeSide, windowSide) = if (probeIsLeft) (j.left, j.right) else (j.right, j.left)

    // probe side: one bucket per row
    val pBkt = AttributeReference("__graft_bkt_p", LongType)()
    val probePlan = Project(
      probeSide.output :+ Alias(IntegralDivide(probe, w), pBkt.name)(pBkt.exprId),
      probeSide)

    // window side: every bucket the window overlaps
    val wBkt = AttributeReference("__graft_bkt_w", LongType)()
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // stays unresolved and the optimizer rejects the rewritten plan
    val seq = new Sequence(
      IntegralDivide(lo, w),
      IntegralDivide(Greatest(Seq(lo, hi)), w),
      Literal(1L, LongType))
      .withTimeZone(spark.sessionState.conf.sessionLocalTimeZone)
      .asInstanceOf[Sequence]
    // guard: refuse to materialize an unbounded per-window bucket array
    // (class doc). Null span (null lo/hi) fails the comparison → takes the
    // sequence branch, which is null on null bounds → explode emits no rows.
    val cap = spark.conf.getOption(MaxBucketsKey).flatMap(_.toLongOption)
      .getOrElse(MaxBucketsDefault)
    val nBuckets = Subtract(IntegralDivide(Greatest(Seq(lo, hi)), w),
      IntegralDivide(lo, w))
    val guarded = If(GreaterThanOrEqual(nBuckets, Literal(cap, LongType)),
      Cast(new RaiseError(Literal(
        s"graft range join: a window spans >= $cap buckets at $ConfKey=$width" +
          s"; raise $ConfKey toward the typical window span, or raise " +
          s"$MaxBucketsKey if the span is intended")), seq.dataType),
      seq)
    val windowPlan = Generate(Explode(guarded), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(wBkt), windowSide)

    val newCond = And(EqualTo(pBkt, wBkt), j.condition.get)
    val (newLeft, newRight) =
      if (probeIsLeft) (probePlan, windowPlan) else (windowPlan, probePlan)
    // restore the original output (drop the synthesized bucket columns)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
  }
}
