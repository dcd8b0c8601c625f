package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Runtime kernel for [[QuantizeI8]]: one static call per row from the
  * generated code (the [[ShingleUtil]] pattern). */
object QuantizeUtil {
  /** Symmetric int8 quantization of one vector: scale = max|x| / 127,
    * q_i = round-half-away-from-zero(x_i / scale) ∈ [−127, 127],
    * max_err = max|q_i·scale − x_i|. Empty or all-zero vectors quantize
    * to scale 0 with q_i = 0 and zero error. Returns null on a null
    * element (a partial vector must not yield a plausible code). All
    * arithmetic is double, bit-identical to the DuckDB oracle's
    * list-lambda formulation. */
  def quantizeI8(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val a = Math.abs(arr.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Any](n)
    var maxErr = 0.0
    i = 0
    while (i < n) {
      val x = arr.getDouble(i)
      val v = if (scale == 0.0) 0.0 else x / scale
      // round half away from zero — what both JVM and DuckDB round() do
      val r = if (v >= 0) Math.floor(v + 0.5) else Math.ceil(v - 0.5)
      q(i) = r.toInt
      val err = Math.abs(r * scale - x)
      if (err > maxErr) maxErr = err
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new GenericArrayData(q), maxErr))
  }
}

/** Codegen'd symmetric int8 vector quantization —
  * `quantize_i8(v array<double>)` →
  * `struct<scale double, q array<int>, max_err double>`.
  *
  * The training-data shape: embeddings shipped to a trainer or an ANN
  * index at 1/4 the bytes. The HOF formulation (three `transform`s + two
  * `aggregate`s) is interpreted per element; this expression is one tight
  * loop inside whole-stage codegen, so quantization runs at parquet scan
  * speed with NO shuffle — the per-row cost is the whole cost at 100 TB.
  * Registered as SQL `quantize_i8` via [[graft.GraftExtensions]].
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("max_err", DoubleType, nullable = false)))

  override def prettyName: String = "quantize_i8"
  // null on a null element, even for a non-null input array
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(arr: Any): Any =
    QuantizeUtil.quantizeI8(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.QuantizeUtil.quantizeI8($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)
}

object QuantizeExpressions {
  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val quantizeI8Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("quantize_i8"),
    new ExpressionInfo(classOf[QuantizeI8].getName, "quantize_i8"),
    (children: Seq[Expression]) => {
      if (children.length != 1) throw new IllegalArgumentException(
        s"quantize_i8(v array<double>): requires exactly 1 argument, got ${children.length}")
      QuantizeI8(children.head)
    })
}

object QuantizeFunctions {
  /** Codegen'd int8 quantization of an array<double> column (requires the
    * session to be built with graft.GraftExtensions). */
  def quantizeI8(v: Column): Column = call_function("quantize_i8", v)
}
