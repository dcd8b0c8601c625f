package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[AbttMicro]] — the all-but-the-top corpus
  * projection writer (Mu & Viswanath, ICLR'18): per vector, emit the
  * MICRO-unit components of `x − Σ_k coeffs_k · basis_k` as a
  * comma-joined string (the library's deterministic vector-emission
  * convention). basis_0 is the mean (coeff 1.0), basis_{1..m} the top
  * components with per-row projection coefficients — so the whole
  * transform is one codegen'd pass over the embedding, no per-element
  * lambda, no shuffle.
  *
  * Rounding uses `BigDecimal.valueOf` (the shortest-decimal-string
  * HALF_UP convention of Spark's own `round`), so the kernel is
  * bit-identical to the `round(x*1e6, 0)` the driver-side loop and the
  * DuckDB oracle compute. */
object AbttUtil {
  def project(e: ArrayData, coeffs: ArrayData, basis: Array[Double],
      d: Int): UTF8String = {
    val m = coeffs.numElements()
    require(m * d <= basis.length,
      s"abtt_micro basis carries ${basis.length} values, need ${m * d}")
    val sb = new java.lang.StringBuilder(d * 8)
    var j = 0
    while (j < d) {
      var acc = e.getDouble(j)
      var k = 0
      while (k < m) { acc -= coeffs.getDouble(k) * basis(k * d + j); k += 1 }
      val micro = java.math.BigDecimal.valueOf(acc * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      if (j > 0) sb.append(',')
      sb.append(micro)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd ABTT projection —
  * `abtt_micro(e array<double>, coeffs array<double>, basis literal
  * array<double> (flattened rows of length d), d literal int) -> string`.
  * See [[AbttUtil]]. Registered via [[graft.GraftExtensions]]. */
case class AbttMicro(left: Expression, right: Expression,
    basis: Seq[Double], d: Int) extends BinaryExpression {

  require(d > 0 && basis.length % d == 0,
    s"abtt_micro basis length ${basis.length} must be a multiple of d=$d")

  override def dataType: DataType = StringType
  override def prettyName: String = "abtt_micro"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val basisArr: Array[Double] = basis.toArray

  override def nullSafeEval(e: Any, coeffs: Any): Any =
    AbttUtil.project(e.asInstanceOf[ArrayData],
      coeffs.asInstanceOf[ArrayData], basisArr, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NOTE: the JVM name of double[] is "[D", which is not valid Java
    // SOURCE — addReferenceObj splices the type into a cast, so it needs
    // the source form "double[]" (Janino parse error otherwise, which
    // silently drops the whole stage to interpreted mode)
    val ref = ctx.addReferenceObj("abttBasis", basisArr, "double[]")
    defineCodeGen(ctx, ev,
      (e, c) => s"graft.functions.AbttUtil.project($e, $c, $ref, $d)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AbttMicro = copy(left = newLeft, right = newRight)
}

object AbttExpressions {
  val abttMicroDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("abtt_micro"),
    new ExpressionInfo(classOf[AbttMicro].getName, "abtt_micro"),
    (children: Seq[Expression]) => {
      def bad(reason: String): Nothing = throw new IllegalArgumentException(
        s"abtt_micro(e, coeffs, basis literal, d literal): $reason")
      if (children.length != 4)
        bad(s"requires exactly 4 arguments, got ${children.length}")
      val basisExpr = children(2)
      val dExpr = children(3)
      if (!basisExpr.foldable || !dExpr.foldable)
        bad("basis and d must be literals")
      val basis = basisExpr.eval() match {
        case a: ArrayData => a.toDoubleArray().toSeq
        case other => bad(s"basis must be array<double>, got $other")
      }
      val d = dExpr.eval() match {
        case i: Int => i
        case other => bad(s"d must be int, got $other")
      }
      AbttMicro(children.head, children(1), basis, d)
    })
}
