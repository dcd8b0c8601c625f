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
  * Scope (deliberately narrow, fail-closed): INNER joins whose condition
  * is EXACTLY a two-sided band over LONG attributes — any strictness
  * (`>=`/`>` below, `<`/`<=` above), either conjunct order, either
  * written direction (`p >= lo` or `lo <= p`) — with `p` from one side
  * and `lo`/`hi` from the other, no other conjuncts. Anything else is
  * left untouched. Strictness never affects the rewrite: buckets only
  * COVER [lo div W, hi div W] and the ORIGINAL condition rides along as
  * the residual, so open/closed endpoints are enforced exactly.
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

  /** cond ≡ a two-sided band over one attribute — any strictness
    * combination and either conjunct order:
    *   (p >= lo | p > lo) && (p < hi | p <= hi), or each side written
    *   flipped (lo <= p, hi > p, ...).
    * Requires p from one join side and lo/hi from the other, all LONG →
    * (p, lo, hi, probeIsLeft). The bucket rewrite is strictness-agnostic:
    * buckets only need to COVER [lo div W, hi div W]; the original
    * condition rides along as the residual, so `>` vs `>=` correctness is
    * untouched (a `> lo` probe in lo's bucket simply fails the residual). */
  private def matchBand(cond: Expression, left: LogicalPlan,
                        right: LogicalPlan): Option[(Attribute, Attribute, Attribute, Boolean)] = {
    // every reading of one comparison as "probe has a lower/upper bound":
    // a >= b bounds a below by b AND bounds b above by a, etc. — emit both
    // and let the cross-conjunct agreement + side-membership checks pick
    // the (unique) valid assignment.
    def readings(e: Expression): Seq[(Attribute, Attribute, Boolean)] = e match {
      case GreaterThanOrEqual(a: Attribute, b: Attribute) =>
        Seq((a, b, true), (b, a, false))
      case GreaterThan(a: Attribute, b: Attribute) =>
        Seq((a, b, true), (b, a, false))
      case LessThan(a: Attribute, b: Attribute) =>
        Seq((a, b, false), (b, a, true))
      case LessThanOrEqual(a: Attribute, b: Attribute) =>
        Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
    }
    cond match {
      case And(c1, c2) =>
        val (lOut, rOut) = (left.outputSet, right.outputSet)
        val candidates = for {
          (cLo, cHi) <- Seq((c1, c2), (c2, c1))
          (p1, lo, isLower) <- readings(cLo) if isLower
          (p2, hi, isLower2) <- readings(cHi) if !isLower2
          if p1.semanticEquals(p2) &&
            p1.dataType == LongType && lo.dataType == LongType &&
            hi.dataType == LongType
        } yield (p1, lo, hi)
        candidates.collectFirst {
          case (p, lo, hi)
              if lOut.contains(p) && rOut.contains(lo) && rOut.contains(hi) =>
            (p, lo, hi, true)
          case (p, lo, hi)
              if rOut.contains(p) && lOut.contains(lo) && lOut.contains(hi) =>
            (p, lo, hi, false)
        }
      case _ => None
    }
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
