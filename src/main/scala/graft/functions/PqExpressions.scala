package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Runtime kernels for the product-quantization inner loops — the hot path
  * of the IVF-PQ ANN stack (`embedding_pq` / `ann_pq_adc` / `ann_ivf_pq`,
  * ops/SimilarityQueries.scala). These were previously higher-order-
  * function folds (`aggregate`/`zip_with`/`transform`), which Catalyst
  * evaluates through an interpreted projection per element; at production
  * scale the ADC scoring loop runs once per (query, candidate) pair over
  * the whole probed corpus, so it must be one tight primitive loop inside
  * whole-stage codegen. Each kernel is a static call per row (the
  * [[QuantizeUtil]] pattern), preserving the exact left-to-right float
  * accumulation order of the HOF formulation and of the DuckDB oracle —
  * hashes are unchanged, only the per-row constant factor drops.
  */
object PqUtil {
  /** Squared L2 distance ‖a−b‖² as a strict left fold (i ascending) —
    * bit-identical to `aggregate(zip_with(a, b, (x,y) -> (x−y)²), 0D, +)`
    * and to the oracle's `list_aggregate(..., 'sum')`. Null on length
    * mismatch (a dimension-mismatched pair must not score plausibly). */
  def sqDist(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Codebook decoded to primitive arrays. `uniformDim` is the shared
    * entry dimension (−1 when mixed — then every query length mismatches
    * some entry and the per-row checks below yield null for any input,
    * the original per-entry check's fixed point). A null entry keeps the
    * original behavior of failing loudly when walked (the codebooks are
    * `collect_list` outputs, which never contain nulls). */
  private final class Decoded(val entries: Array[Array[Double]],
                              val uniformDim: Int)

  private def doDecode(cb: ArrayData): Decoded = {
    val k = cb.numElements()
    val entries = new Array[Array[Double]](k)
    var uniformDim = -1
    var i = 0
    while (i < k) {
      entries(i) = cb.getArray(i).toDoubleArray()
      if (i == 0) uniformDim = entries(0).length
      else if (entries(i).length != uniformDim) uniformDim = -1
      i += 1
    }
    new Decoded(entries, uniformDim)
  }

  /** Byte-validated per-thread decode cache ([[DecodeCache]]) — the PQ
    * codebook arrives as the same broadcast value on every corpus row;
    * walking it through the generic accessors allocated m·k wrappers
    * per encoded vector. */
  private val cache = new DecodeCache[Decoded](doDecode)

  /** Per-subspace squared distance between primitive vectors `e` and `c`
    * restricted to subspace j of m (subDim = len/m), strict left fold
    * over the subspace elements — bit-identical accumulation order to
    * the HOF formulation and the DuckDB oracle. */
  private def subDist(e: Array[Double], c: Array[Double], j: Int,
                      subDim: Int): Double = {
    var s = 0.0
    var i = j * subDim
    val end = i + subDim
    while (i < end) {
      val d = e(i) - c(i)
      s += d * d
      i += 1
    }
    s
  }

  /** PQ encode one vector against a k-entry codebook of full-dim vectors:
    * for each of m subspaces pick the argmin-distance centroid (ties → the
    * smallest cid, matching the oracle's `ORDER BY d, cid`), return
    * struct(codes array<int>, dsum double) where dsum left-folds the m
    * best distances in subspace order (the reconstruction-MSE numerator).
    * Null when the vector length is not divisible by m or any codebook
    * entry's length differs. */
  def pqCode(e: ArrayData, cb: ArrayData, m: Int): InternalRow = {
    val len = e.numElements()
    if (m <= 0 || len % m != 0) return null
    val subDim = len / m
    val dec = cache.get(cb)
    val k = dec.entries.length
    if (k == 0) return null
    if (dec.uniformDim != len) return null
    val ea = e.toDoubleArray()
    val codes = new Array[Any](m)
    var dsum = 0.0
    var j = 0
    while (j < m) {
      var bestD = Double.PositiveInfinity
      var bestC = -1
      var cid = 0
      while (cid < k) {
        val d = subDist(ea, dec.entries(cid), j, subDim)
        // strict < keeps the first (= smallest) cid on ties
        if (d < bestD) { bestD = d; bestC = cid }
        cid += 1
      }
      codes(j) = bestC
      dsum += bestD
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(codes), dsum))
  }

  /** ADC lookup table for one query: flat array<double> of length m·k with
    * lut[j·k + cid] = subspace-j squared distance from the query to
    * codebook entry cid. Computed once per query, broadcast with it. */
  def pqLut(e: ArrayData, cb: ArrayData, m: Int): ArrayData = {
    val len = e.numElements()
    if (m <= 0 || len % m != 0) return null
    val subDim = len / m
    val dec = cache.get(cb)
    val k = dec.entries.length
    if (k > 0 && dec.uniformDim != len) return null
    val ea = e.toDoubleArray()
    val lut = new Array[Any](m * k)
    var j = 0
    while (j < m) {
      var cid = 0
      while (cid < k) {
        lut(j * k + cid) = subDist(ea, dec.entries(cid), j, subDim)
        cid += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  /** Asymmetric distance: m table lookups + adds, left-folded in subspace
    * order — the entire per-candidate cost of a PQ search. */
  def pqAdc(lut: ArrayData, codes: ArrayData, k: Int): Any = {
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      val idx = j * k + codes.getInt(j)
      if (idx < 0 || idx >= lut.numElements()) return null
      s += lut.getDouble(idx)
      j += 1
    }
    s
  }
}

/** `sq_dist(a array<double>, b array<double>) -> double` — squared L2
  * distance as one codegen'd loop; the k-means assignment metric for PQ
  * codebook training (and generally useful next to `dot_product`). */
case class SqDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist"
  override def nullable: Boolean = true // null on length mismatch

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqUtil.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |Object r = graft.functions.PqUtil.sqDist($a, $b);
       |if (r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ((Double) r).doubleValue(); }
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

/** `pq_code(e array<double>, cb array<array<double>>, m int) ->
  * struct<codes array<int>, dsum double>` — PQ-encode a vector. */
case class PqCode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("dsum", DoubleType, nullable = false)))
  override def prettyName: String = "pq_code"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<array<double>>, int), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, ${third.dataType.catalogString})")
    }

  override def nullSafeEval(e: Any, cb: Any, m: Any): Any =
    PqUtil.pqCode(e.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cb, m) => s"""
       |${ev.value} = graft.functions.PqUtil.pqCode($e, $cb, $m);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqCode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `pq_lut(e array<double>, cb array<array<double>>, m int) ->
  * array<double>` — the per-query ADC lookup table, flat m·k layout. */
case class PqLut(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<array<double>>, int), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, ${third.dataType.catalogString})")
    }

  override def nullSafeEval(e: Any, cb: Any, m: Any): Any =
    PqUtil.pqLut(e.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cb, m) => s"""
       |${ev.value} = graft.functions.PqUtil.pqLut($e, $cb, $m);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqLut =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `pq_adc(lut array<double>, codes array<int>, k int) -> double` — the
  * per-candidate asymmetric-distance score: m lookups + adds. */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<int>, int), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, ${third.dataType.catalogString})")
    }

  override def nullSafeEval(lut: Any, codes: Any, k: Any): Any =
    PqUtil.pqAdc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes, k) => s"""
       |Object r = graft.functions.PqUtil.pqAdc($lut, $codes, $k);
       |if (r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ((Double) r).doubleValue(); }
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdc =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqExpressions {
  private def arity(n: Int, name: String, mk: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      if (children.length != n) throw new IllegalArgumentException(
        s"$name: requires exactly $n arguments, got ${children.length}")
      mk(children)
    }

  val sqDistDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sq_dist"),
    new ExpressionInfo(classOf[SqDist].getName, "sq_dist"),
    arity(2, "sq_dist(a array<double>, b array<double>)",
      c => SqDist(c(0), c(1))))

  val pqCodeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_code"),
    new ExpressionInfo(classOf[PqCode].getName, "pq_code"),
    arity(3, "pq_code(e array<double>, cb array<array<double>>, m int)",
      c => PqCode(c(0), c(1), c(2))))

  val pqLutDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_lut"),
    new ExpressionInfo(classOf[PqLut].getName, "pq_lut"),
    arity(3, "pq_lut(e array<double>, cb array<array<double>>, m int)",
      c => PqLut(c(0), c(1), c(2))))

  val pqAdcDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_adc"),
    new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
    arity(3, "pq_adc(lut array<double>, codes array<int>, k int)",
      c => PqAdc(c(0), c(1), c(2))))
}

object PqFunctions {
  /** Codegen'd PQ kernels (require a session built with
    * [[graft.GraftExtensions]]). */
  def sqDist(a: Column, b: Column): Column = call_function("sq_dist", a, b)
  def pqCode(e: Column, cb: Column, m: Column): Column =
    call_function("pq_code", e, cb, m)
  def pqLut(e: Column, cb: Column, m: Column): Column =
    call_function("pq_lut", e, cb, m)
  def pqAdc(lut: Column, codes: Column, k: Column): Column =
    call_function("pq_adc", lut, codes, k)
}
