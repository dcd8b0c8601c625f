package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's own runtime-filter bloom expressions.
  *
  * Catalyst ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its automatic runtime filtering but does not register them in the
  * public `FunctionRegistry`, so a USER cannot express the classic
  * bloom semi-join reduction declaratively. These descriptors expose
  * them under `graft_` names (leaving Spark's internal registrations,
  * if any, untouched):
  *
  *  - `graft_bloom_agg(xxhash64(key)[, est_items[, num_bits]])` →
  *    one BINARY bloom filter aggregated over the build side (mergeable
  *    partial state — scales like any hash aggregate);
  *  - `graft_might_contain(<scalar-subquery bloom>, xxhash64(key))` →
  *    BOOLEAN membership probe, codegen'd, usable as a scan-level
  *    pre-filter. The bloom argument must be foldable or a scalar
  *    subquery (enforced by the expression's own type check) — exactly
  *    the broadcast-one-row shape that keeps the probe on the scan.
  */
object BloomExpressions {
  val bloomAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
    (children: Seq[Expression]) => children match {
      case Seq(c)              => new BloomFilterAggregate(c)
      case Seq(c, items)       => new BloomFilterAggregate(c, items)
      case Seq(c, items, bits) => new BloomFilterAggregate(c, items, bits)
      case _ => throw new IllegalArgumentException(
        "graft_bloom_agg(xxhash64(key)[, est_items[, num_bits]]): 1-3 arguments, " +
          s"got ${children.length}")
    })

  val mightContainDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName,
      "graft_might_contain"),
    (children: Seq[Expression]) => children match {
      case Seq(bf, v) => BloomFilterMightContain(bf, v)
      case _ => throw new IllegalArgumentException(
        "graft_might_contain(bloom, xxhash64(key)): exactly 2 arguments, " +
          s"got ${children.length}")
    })
}
