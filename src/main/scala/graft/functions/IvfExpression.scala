package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Runtime kernel for [[IvfAssign]] — the IVF cell-assignment inner loop.
  *
  * Previously the assignment materialized the full n×|cells| candidate
  * stream (corpus ⋈ broadcast centroids) and ran a per-vector argmax
  * window over it — an n^1.5-row SORT + shuffle that the round-9 100×
  * probe measured as the dominant term of `knn_graph_blocked` (419 s at
  * 100×). This kernel is the FAISS shape instead: the √n centroid table
  * rides in as ONE broadcast codebook row and each vector picks its cell
  * in a tight codegen loop — n rows in, n rows out, zero intermediate
  * rows, zero shuffle. Flops are identical; only the data movement is
  * gone.
  */
object IvfUtil {
  /** Replicates Spark's `round(x, 4)` on doubles bit-for-bit
    * (BigDecimal HALF_UP — the exact codegen Spark's Round emits), so
    * argmax ties fall exactly where the previous
    * `round(dot/(na·nb), 4)`-ordered window put them. */
  def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Codebook decoded to primitive arrays, plus a private copy of the
    * source bytes for sound cache validation. `uniformDim` is the shared
    * centroid dimension, or −1 when dimensions are mixed (then EVERY
    * query dimension mismatches some entry, so every row yields null —
    * the original per-cell dim check's fixed point). */
  private final class Decoded(val cells: Array[Long],
                              val ces: Array[Array[Double]],
                              val cns: Array[Double],
                              val uniformDim: Int,
                              val anyNull: Boolean)

  private val scratch = new ThreadLocal[Array[Double]]

  private def doDecode(cb: ArrayData): Decoded = {
    val k = cb.numElements()
    val cells = new Array[Long](k)
    val ces = new Array[Array[Double]](k)
    val cns = new Array[Double](k)
    var anyNull = false
    var uniformDim = -1
    var i = 0
    while (i < k && !anyNull) {
      if (cb.isNullAt(i)) anyNull = true
      else {
        val entry = cb.getStruct(i, 3)
        cells(i) = entry.getLong(0)
        ces(i) = entry.getArray(1).toDoubleArray()
        cns(i) = entry.getDouble(2)
        if (i == 0) uniformDim = ces(0).length
        else if (ces(i).length != uniformDim) uniformDim = -1
      }
      i += 1
    }
    new Decoded(cells, ces, cns, uniformDim, anyNull)
  }

  /** Byte-validated per-thread decode cache ([[DecodeCache]]): the old
    * per-(row, cell) accessor walk (~5 allocations each) measured 76.6 s
    * of the 92 s x100 assignment; decoded it is ~4 s (BASELINE.md r11). */
  private val cache = new DecodeCache[Decoded](doDecode)

  /** Nearest cell of `e` over the codebook `cb` =
    * array<struct<cell bigint, ce array<double>, cn double>>: maximum
    * 4dp-rounded cosine, smallest cell id on ties — exactly the old
    * `(scos desc, cell asc)` window order. Null on an empty codebook, a
    * dimension mismatch, or a null element (a malformed centroid must
    * not win silently).
    *
    * Two-pass selection so [[round4]] (a BigDecimal allocation) leaves
    * the O(k) inner loop: pass 1 computes RAW cosines over the decoded
    * primitive arrays tracking the raw maximum; pass 2 rounds only the
    * cells within 2e-4 of it. Sound because round4 is monotone with
    * bucket width 1e-4: round4(x) = round4(max) implies
    * |x − max| ≤ 1e-4 + ulp slack < 2e-4, so every cell that can tie
    * the rounded winner survives pass 1's window (for |x| large enough
    * that ulp > 1e-4, distinct doubles can't share a rounded value and
    * the degenerate window {max} is exact). NaN/±Inf pass through
    * unrounded exactly as before: `Double.compare` treats NaN as the
    * maximum, and NaN − 2e-4 = NaN keeps the candidate window
    * NaN-only, matching the original scan order. */
  def ivfAssign(e: ArrayData, norm: Double, cb: ArrayData): java.lang.Long = {
    val dec = cache.get(cb)
    val k = dec.cells.length
    if (k == 0 || dec.anyNull) return null
    val ea = e.toDoubleArray()
    if (dec.uniformDim != ea.length) return null
    var raws = scratch.get()
    if (raws == null || raws.length < k) {
      raws = new Array[Double](k); scratch.set(raws)
    }
    val n = ea.length
    var maxRaw = Double.NegativeInfinity
    var i = 0
    while (i < k) {
      val ce = dec.ces(i)
      var d = 0.0
      var j = 0
      while (j < n) { d += ea(j) * ce(j); j += 1 }
      val raw = d / (norm * dec.cns(i))
      raws(i) = raw
      if (java.lang.Double.compare(raw, maxRaw) > 0) maxRaw = raw
      i += 1
    }
    val thr = maxRaw - 2e-4
    var bestS = Double.NegativeInfinity
    var bestC = Long.MaxValue
    var found = false
    i = 0
    while (i < k) {
      val raw = raws(i)
      if (java.lang.Double.compare(raw, thr) >= 0) {
        val s = if (java.lang.Double.isFinite(raw)) round4(raw) else raw
        val cmp = java.lang.Double.compare(s, bestS)
        if (cmp > 0 || (cmp == 0 && dec.cells(i) < bestC)) {
          bestS = s; bestC = dec.cells(i); found = true
        }
      }
      i += 1
    }
    if (found) java.lang.Long.valueOf(bestC) else null
  }
}

/** Codegen'd IVF cell assignment —
  * `ivf_assign(e array<double>, norm double, cb array<struct<cell bigint,
  * ce array<double>, cn double>>) -> bigint`.
  *
  * Registered as SQL `ivf_assign` via [[graft.GraftExtensions]]. See
  * [[IvfUtil.ivfAssign]] for semantics and the scale rationale.
  */
case class IvfAssign(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ivf_assign"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType,
            ArrayType(StructType(Array(
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(DoubleType, _), _, _),
              StructField(_, DoubleType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double, array<struct<bigint, " +
          s"array<double>, double>>), got (${a.catalogString}, " +
          s"${b.catalogString}, ${c.catalogString})")
    }

  override def nullSafeEval(e: Any, norm: Any, cb: Any): Any =
    IvfUtil.ivfAssign(e.asInstanceOf[ArrayData],
      norm.asInstanceOf[Double], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, norm, cb) => {
      // freshName: two ivf_assign calls can land in one codegen scope; a
      // fixed local name would be a duplicate declaration → interpreted
      // fallback.
      val r = ctx.freshName("ivfRes")
      s"""
       |java.lang.Long $r = graft.functions.IvfUtil.ivfAssign($e, $norm, $cb);
       |if ($r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $r.longValue(); }
     """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): IvfAssign =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object IvfExpressions {
  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val ivfAssignDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ivf_assign"),
    new ExpressionInfo(classOf[IvfAssign].getName, "ivf_assign"),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"ivf_assign(e, norm, cb): requires exactly 3 arguments, got ${children.length}")
      IvfAssign(children(0), children(1), children(2))
    })
}

object IvfFunctions {
  /** Codegen'd IVF cell assignment (requires the session to be built with
    * graft.GraftExtensions). */
  def ivfAssign(e: Column, norm: Column, cb: Column): Column =
    call_function("ivf_assign", e, norm, cb)
}
