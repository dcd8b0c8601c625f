package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for set-similarity-join VERIFICATION.
  *
  * Every prefix-filtered similarity join ends with "given a candidate
  * pair, count the common elements of the two (pre-sorted) posting
  * lists". Doing that relationally (re-join both docs' postings on the
  * element) re-expands each candidate by its full posting list — a
  * shuffle proportional to |candidates|·|doc|. The standard answer in the
  * set-sim-join literature is a per-pair sorted-list merge walk; this
  * expression is that walk as a whole-stage-codegen'd kernel, so the
  * verify stage becomes a scalar projection riding the candidate join —
  * zero extra shuffles.
  *
  * MULTISET semantics, matching the relational equi-join it replaces: the
  * result is Σ over distinct values v of count_left(v) · count_right(v)
  * (an element appearing twice on each side contributes 4, exactly like
  * the 2×2 join rows it would have produced). Hash-collision duplicates
  * inside one document therefore count identically to the join-based
  * formulation and to the DuckDB oracle.
  *
  * PRECONDITION: both arrays ascending-sorted (e.g. via `sort_array`),
  * null-free. Inputs are LongType arrays (the engine's 60-bit content
  * hashes). A null element poisons the result to NULL rather than
  * silently miscounting.
  */
case class SortedCommonCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_common_count"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
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
    val nx = x.numElements()
    val ny = y.numElements()
    if (elementsNullable) {
      var k = 0
      while (k < nx) { if (x.isNullAt(k)) return null; k += 1 }
      k = 0
      while (k < ny) { if (y.isNullAt(k)) return null; k += 1 }
    }
    var i = 0
    var j = 0
    var s = 0L
    while (i < nx && j < ny) {
      val vi = x.getLong(i)
      val vj = y.getLong(j)
      if (vi < vj) i += 1
      else if (vi > vj) j += 1
      else {
        // count the run of vi on each side; contributes ca·cb
        val v = vi
        var ci = 0L
        while (i < nx && x.getLong(i) == v) { ci += 1; i += 1 }
        var cj = 0L
        while (j < ny && y.getLong(j) == v) { cj += 1; j += 1 }
        s += ci * cj
      }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val w = ctx.freshName("w")
      val ci = ctx.freshName("ci")
      val cj = ctx.freshName("cj")
      val k = ctx.freshName("k")
      // per-element null scan elided when the schema guarantees no nulls
      val nullCheck = if (elementsNullable)
        s"""
           |for (int $k = 0; $k < $nx && !${ev.isNull}; $k++) {
           |  if ($a.isNullAt($k)) ${ev.isNull} = true;
           |}
           |for (int $k = 0; $k < $ny && !${ev.isNull}; $k++) {
           |  if ($b.isNullAt($k)) ${ev.isNull} = true;
           |}
         """.stripMargin
      else ""
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |$nullCheck
         |if (!${ev.isNull}) {
         |  long $s = 0L;
         |  int $i = 0, $j = 0;
         |  while ($i < $nx && $j < $ny) {
         |    long $v = $a.getLong($i);
         |    long $w = $b.getLong($j);
         |    if ($v < $w) { $i++; }
         |    else if ($v > $w) { $j++; }
         |    else {
         |      long $ci = 0L; long $cj = 0L;
         |      while ($i < $nx && $a.getLong($i) == $v) { $ci++; $i++; }
         |      while ($j < $ny && $b.getLong($j) == $v) { $cj++; $j++; }
         |      $s += $ci * $cj;
         |    }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedCommonCount =
    copy(left = newLeft, right = newRight)
}

object SetSimExpressions {
  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val sortedCommonCountDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_common_count"),
    new ExpressionInfo(classOf[SortedCommonCount].getName, "sorted_common_count"),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"sorted_common_count(x array<bigint>, y array<bigint>): requires exactly 2 arguments, got ${children.length}")
      SortedCommonCount(children(0), children(1))
    })

  /** Codegen'd multiset common-element count of two ascending-sorted
    * array<bigint> columns (requires graft.GraftExtensions). */
  def sortedCommonCount(a: Column, b: Column): Column =
    call_function("sorted_common_count", a, b)
}
