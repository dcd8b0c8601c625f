package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernels for the winnowing (Schleimer–Wilkerson–Aiken) and
  * fixed-window substring-fingerprint operators — the whole per-document
  * gram-hash + sliding-min pass in one static call from generated code.
  *
  * Replaces the relational formulation (explode one row per char position →
  * md5 → hex → conv per gram → Exchange(doc_id) of EVERY gram → Sort →
  * Window min → distinct) with a zero-shuffle map-side pass: per document,
  * one UTF-8 offset walk, one incremental MD5 per gram over the raw byte
  * slice (no substring copy, no 32-char hex round-trip), and the w-window
  * minimum computed inline. At 100 TB this turns the fingerprint stage from
  * a full-corpus gram-level shuffle + per-doc sort into a pure scan
  * projection (guide §2.4 remove shuffles outright + §1.2 per-task work).
  *
  * Bit parity is pinned by the existing oracles and OpsSpec fixtures: the
  * hash is the portable 60-bit md5 prefix of the k-char (code-point)
  * substring's UTF-8 bytes (== `conv(substr(md5(substring(text,pos,k)),1,15),
  * 16,10)` == DuckDB `('0x' || substr(md5(substr(text,pos,k)),1,15))::BIGINT`),
  * and the selection rule is the exact `min(struct(h, -pos))` over
  * `rowsBetween(-(w-1), currentRow)` ordered by pos, distinct — smallest h,
  * ties to the RIGHTMOST position, leading partial windows included.
  */
object WinnowUtil {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5 prefix of bytes[off, off+len) as a non-negative long —
    * byte-slice twin of [[SimHashUtil.md5Long60]]. */
  private def md5Long60(md: java.security.MessageDigest,
      bytes: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Per-position 60-bit gram hashes: h(p) = md5Long60 of the UTF-8 bytes
    * of the k-code-point substring starting at 1-based position p, for
    * p in 1..numChars-k+1. Empty for shorter texts. */
  private def gramHashArray(text: UTF8String, k: Int): Array[Long] = {
    val nChars = text.numChars()
    val nGrams = nChars - k + 1
    if (nGrams <= 0) return Array.emptyLongArray
    val bytes = text.getBytes
    val nBytes = bytes.length
    // byte offset of each code point start (+ terminal)
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (ci < nChars && bi < nBytes) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    // malformed tails: clamp remaining offsets to end-of-buffer
    while (ci <= nChars) { offs(ci) = nBytes; ci += 1 }
    val md = md5Local.get()
    val hs = new Array[Long](nGrams)
    var p = 0
    while (p < nGrams) {
      val o = offs(p)
      hs(p) = md5Long60(md, bytes, o, math.min(offs(p + k), nBytes) - o)
      p += 1
    }
    hs
  }

  /** [[gramHashArray]] as Catalyst array<long> (index i ↔ 1-based pos i+1). */
  def gramHashes(text: UTF8String, k: Int): GenericArrayData = {
    val hs = gramHashArray(text, k)
    val out = new Array[Any](hs.length)
    var i = 0
    while (i < hs.length) { out(i) = hs(i); i += 1 }
    new GenericArrayData(out)
  }

  /** The selected winnow fingerprint set: distinct minima of
    * `struct(h, -pos)` over every w-gram sliding window (leading partials
    * included), as parallel (h, pos) arrays packed by [[winnowFps]] /
    * folded by [[winnowSummary]]. Selection runs are consecutive (an
    * element displaced by a later-entering smaller/equal hash can never
    * be a window minimum again), so distinct == skip-if-same-as-last. */
  private def selected(hs: Array[Long], w: Int): (Array[Long], Array[Int], Int) = {
    val n = hs.length
    val selH = new Array[Long](n)
    val selP = new Array[Int](n)
    var m = 0
    var g = 0
    while (g < n) {
      val lo = math.max(0, g - (w - 1))
      // min of (h asc, pos desc) over hs[lo..g]
      var bestH = hs(g)
      var bestP = g
      var j = g - 1
      while (j >= lo) {
        if (hs(j) < bestH) { bestH = hs(j); bestP = j }
        j -= 1
      }
      if (m == 0 || selH(m - 1) != bestH || selP(m - 1) != bestP + 1) {
        selH(m) = bestH
        selP(m) = bestP + 1 // 1-based
        m += 1
      }
      g += 1
    }
    (selH, selP, m)
  }

  /** array<struct<h:long, pos:int>> of the selected fingerprints. */
  def winnowFps(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val hs = gramHashArray(text, k)
    val (selH, selP, m) = selected(hs, w)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(selH(i), selP(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** struct<n_selected:long, sketch:string>: the per-document summary of
    * [[TextQueries.winnowOf]] — selected-count plus the `sketchLen`
    * smallest DISTINCT selected hashes, comma-joined ascending (==
    * `concat_ws(",", transform(slice(array_sort(collect_set(h)), 1,
    * sketchLen), cast_to_string))`). */
  def winnowSummary(text: UTF8String, k: Int, w: Int,
      sketchLen: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val hs = gramHashArray(text, k)
    val (selH, _, m) = selected(hs, w)
    val distinct = java.util.Arrays.copyOf(selH, m)
    java.util.Arrays.sort(distinct)
    val sb = new java.lang.StringBuilder
    var taken = 0
    var i = 0
    while (i < m && taken < sketchLen) {
      if (i == 0 || distinct(i) != distinct(i - 1)) {
        if (taken > 0) sb.append(',')
        sb.append(distinct(i))
        taken += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      m.toLong, UTF8String.fromString(sb.toString))
  }
}

/** Codegen'd element-wise 60-bit md5 over a string array:
  * `md5_longs(arr)[i] == conv(substr(md5(arr[i]),1,15),16,10)`. Replaces
  * the interpreted `transform(arr, x -> md5Long(x))` higher-order form on
  * hot paths (HOF lambdas evaluate per element in interpreted mode).
  * Null elements pass through as null. */
case class Md5Longs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "md5_longs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(arr: Any): Any =
    Md5LongsUtil.eval(
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData)" +
        s"graft.functions.Md5LongsUtil.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Longs =
    copy(child = newChild)
}

object Md5LongsUtil {
  def eval(in: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val n = in.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!in.isNullAt(i)) out(i) = SimHashUtil.md5Long60(in.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd per-document gram-hash vector: `gram_md5s(text)` at the fixed
  * [[graft.ops.DedupQueries.ssdWindow]] length is parameterized here as
  * k via the function's second literal argument. Registered as SQL
  * function `gram_md5s(text, k)` via [[graft.GraftExtensions]]. */
case class GramMd5s(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_md5s"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(t: Any): Any =
    WinnowUtil.gramHashes(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowUtil.gramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramMd5s =
    copy(child = newChild)
}

/** Codegen'd per-document winnow fingerprint selection — the whole
  * [[graft.ops.TextQueries.winnowFingerprintsOf]] inner pass (gram md5s +
  * sliding `min(struct(h,-pos))` + distinct) as one scan-speed projection.
  * Registered as SQL function `winnow_fps(text, k, w)`. */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(t: Any): Any =
    WinnowUtil.winnowFps(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowUtil.winnowFps($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** Codegen'd per-document winnow summary (n_selected + 8-smallest-distinct
  * sketch csv) — lets `text_winnow` run as a single-scan projection with
  * no aggregation at all. Registered as `winnow_summary(text, k, w, len)`. */
case class WinnowSummary(child: Expression, k: Int, w: Int, sketchLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_selected", LongType, nullable = false),
    StructField("sketch", StringType, nullable = false)))
  override def prettyName: String = "winnow_summary"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(t: Any): Any =
    WinnowUtil.winnowSummary(t.asInstanceOf[UTF8String], k, w, sketchLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowUtil.winnowSummary($c, $k, $w, $sketchLen)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSummary =
    copy(child = newChild)
}

object WinnowExpressions {
  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an int literal, got $other")
  }

  val md5LongsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_longs"),
    new ExpressionInfo(classOf[Md5Longs].getName, "md5_longs"),
    (children: Seq[Expression]) => {
      if (children.length != 1) throw new IllegalArgumentException(
        s"md5_longs(arr array<string>): requires exactly 1 argument, got ${children.length}")
      Md5Longs(children.head)
    })

  val gramMd5sDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gram_md5s"),
    new ExpressionInfo(classOf[GramMd5s].getName, "gram_md5s"),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"gram_md5s(text, k): requires exactly 2 arguments, got ${children.length}")
      GramMd5s(children.head, litInt(children(1), "gram_md5s k"))
    })

  val winnowFpsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_fps"),
    new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"winnow_fps(text, k, w): requires exactly 3 arguments, got ${children.length}")
      WinnowFps(children.head, litInt(children(1), "winnow_fps k"),
        litInt(children(2), "winnow_fps w"))
    })

  val winnowSummaryDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_summary"),
    new ExpressionInfo(classOf[WinnowSummary].getName, "winnow_summary"),
    (children: Seq[Expression]) => {
      if (children.length != 4) throw new IllegalArgumentException(
        s"winnow_summary(text, k, w, len): requires exactly 4 arguments, got ${children.length}")
      WinnowSummary(children.head, litInt(children(1), "winnow_summary k"),
        litInt(children(2), "winnow_summary w"),
        litInt(children(3), "winnow_summary len"))
    })
}
