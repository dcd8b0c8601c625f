package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Runtime kernel for [[Hilbert2]]: one static call per row from the
  * generated code (the [[ZOrderUtil]] pattern). */
object HilbertUtil {
  /** 15 bits/dim = a 30-bit curve index — matches the layout queries'
    * bucket resolution ([[graft.ops.PrepQueries.zorderDimBits]]), so the
    * two curves are compared on identical grids. */
  final val BitsPerDim = 15
  final val DimMask = (1L << BitsPerDim) - 1

  /** xy → d on the order-[[BitsPerDim]] Hilbert curve (the classic
    * quadrant-rotation walk; Hilbert 1891, algorithm as in Warren,
    * Hacker's Delight §16-1). Inputs masked to [[BitsPerDim]] bits.
    *
    * Unlike Morton order, consecutive d values are always Manhattan
    * distance 1 apart (no quadrant-boundary jumps), which is why
    * Hilbert-sorted layouts skip slightly better than Z-ordered ones on
    * the same file geometry. */
  def hilbert2(x: Long, y: Long): Long = {
    var xm = x & DimMask
    var ym = y & DimMask
    var d = 0L
    var s = 1L << (BitsPerDim - 1)
    while (s > 0) {
      val rx = if ((xm & s) != 0) 1L else 0L
      val ry = if ((ym & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { // flip over the FULL grid (canonical xy2d rot)
          xm = DimMask - xm
          ym = DimMask - ym
        }
        val t = xm; xm = ym; ym = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (d → xy), same rotation state machine run bottom-up.
    * Not used in any query plan — it exists so the spec can prove the
    * curve contract (bijectivity + unit-step adjacency) directly. */
  def d2xy(d: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d
    var s = 1L
    while (s < (1L << BitsPerDim)) {
      val rx = (t / 2) & 1L
      val ry = (t ^ rx) & 1L
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** Codegen'd 2-D Hilbert curve value —
  * `hilbert2(x bigint, y bigint) -> bigint` (30 bits used).
  *
  * The locality-preserving alternative to [[ZOrder2]] for data layout:
  * both cluster rows close in EITHER dimension into the same files, but
  * the Hilbert walk never jumps across quadrant boundaries, so file
  * min/max zones are tighter for the same file count (the reason
  * Iceberg added a Hilbert option next to Z-order). Same cost shape: a
  * pure per-row integer loop inside whole-stage codegen, then one range
  * exchange to write.
  *
  * Registered as SQL `hilbert2` via [[graft.GraftExtensions]].
  */
case class Hilbert2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertUtil.hilbert2(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HilbertUtil.hilbert2($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hilbert2 =
    copy(left = newLeft, right = newRight)
}

object HilbertExpressions {
  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val hilbert2Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert2"),
    new ExpressionInfo(classOf[Hilbert2].getName, "hilbert2"),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"hilbert2(x bigint, y bigint): requires exactly 2 arguments, got ${children.length}")
      Hilbert2(children.head, children(1))
    })
}

object HilbertFunctions {
  /** Codegen'd 30-bit Hilbert index of two long columns (requires the
    * session to be built with graft.GraftExtensions). */
  def hilbert2(x: Column, y: Column): Column = call_function("hilbert2", x, y)
}
