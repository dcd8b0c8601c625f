package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Runtime kernel for [[ZOrder2]]: one static call per row from the
  * generated code (the [[ShingleUtil]] pattern). */
object ZOrderUtil {
  final val BitsPerDim = 30
  final val DimMask = (1L << BitsPerDim) - 1

  /** 60-bit Morton (Z-order) interleave of the low 30 bits of each input:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Inputs are
    * masked to [[BitsPerDim]] bits first so negative values fold
    * deterministically instead of poisoning the sign bit. */
  def zorder2(x: Long, y: Long): Long = {
    val xm = x & DimMask
    val ym = y & DimMask
    var z = 0L
    var i = 0
    while (i < BitsPerDim) {
      z |= ((xm >> i) & 1L) << (2 * i)
      z |= ((ym >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** Codegen'd 2-D Z-order (Morton) curve value —
  * `zorder2(x bigint, y bigint) -> bigint` (60 bits used).
  *
  * The data-LAYOUT primitive: writing files range-partitioned / sorted by
  * a Z-value clusters rows that are close in BOTH dimensions into the
  * same files, so min/max file statistics prune scans for predicates on
  * EITHER column — the multi-dimensional clustering trick behind
  * Delta/Iceberg Z-ordering. The kernel is a single 30-iteration integer
  * loop inside whole-stage codegen: computing the value is a pure per-row
  * projection at parquet scan speed; the layout itself is then just
  * `repartitionByRange(z) + sortWithinPartitions(z)` — one range
  * exchange, which is what any sorted write costs anyway.
  *
  * Registered as SQL `zorder2` via [[graft.GraftExtensions]].
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderUtil.zorder2(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrderUtil.zorder2($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpressions {
  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val zorder2Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("zorder2"),
    new ExpressionInfo(classOf[ZOrder2].getName, "zorder2"),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"zorder2(x bigint, y bigint): requires exactly 2 arguments, got ${children.length}")
      ZOrder2(children.head, children(1))
    })
}

object ZOrderFunctions {
  /** Codegen'd 60-bit Morton interleave of two long columns (requires the
    * session to be built with graft.GraftExtensions). */
  def zorder2(x: Column, y: Column): Column = call_function("zorder2", x, y)
}
