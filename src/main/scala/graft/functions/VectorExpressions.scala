package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector-similarity hot path.
  *
  * The built-in higher-order functions (`zip_with` + `aggregate`) evaluate
  * a lambda per element through an interpreted projection — fine for
  * correctness, but the inner loop of brute-force cosine over millions of
  * pairs wants a tight loop. [[DotProduct]] is a `BinaryExpression` with
  * `doGenCode`: whole-stage codegen inlines a primitive double loop (no
  * virtual calls, no per-element allocation).
  *
  * Semantics are EXACTLY those of `aggregate(zip_with(x, y, (a,b) -> a*b),
  * 0D, (acc,e) -> acc+e)` (and of the DuckDB oracle's unrolled sum):
  *   - equal-length, null-free inputs → the left-to-right fold, bit-for-bit
  *     identical accumulation order;
  *   - length mismatch → NULL (`zip_with` pads the shorter side with null,
  *     poisoning the sum) — a dimension-mismatched embedding pair can never
  *     yield a plausible-but-wrong similarity;
  *   - any null element → NULL (null propagates through `+`).
  * When both input array types carry `containsNull=false` the per-element
  * null checks are elided AT CODEGEN TIME, so the parquet fast path is the
  * same tight loop as before.
  *
  * Registered through the public `SparkSessionExtensions` hook
  * ([[graft.GraftExtensions]]) so `SELECT dot_product(a, b)` works in SQL
  * and [[VectorFunctions.dotProduct]] works on Columns.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // null on length mismatch / null element, even for non-null inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i); i += 1
      }
    } else {
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // per-element null checks elided when the schema guarantees no nulls
      val nullCheck = if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"dot_product(x array<double>, y array<double>): requires exactly 2 arguments, got ${children.length}")
      DotProduct(children(0), children(1))
    })
}

object VectorFunctions {
  /** Codegen'd dot product of two array<double> columns (requires the
    * session to be built with graft.GraftExtensions). */
  def dotProduct(a: Column, b: Column): Column =
    call_function("dot_product", a, b)
}
