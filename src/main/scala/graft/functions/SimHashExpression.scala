package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[SimHash60]] — the whole per-document SimHash in one
  * static call from generated code.
  *
  * Replaces the relational formulation (explode tokens → groupBy(doc, tok)
  * [shuffle #1] → 60 conditional bit-sums groupBy(doc) [shuffle #2]) with a
  * zero-shuffle map-side pass: term frequencies in a local hash map, one
  * md5 per DISTINCT token, sign-sum into 60 accumulators, pack. At 100 TB
  * this turns the SimHash signature stage from two full-corpus token-level
  * shuffles into a pure scan projection.
  *
  * Bit parity is pinned by spec + oracle: the hash is the portable 60-bit
  * md5 prefix (== `conv(substr(md5(s),1,15),16,10)` == DuckDB
  * `('0x' || substr(md5(s),1,15))::BIGINT`), TF weighting and sign-sum
  * semantics match the groupBy formulation exactly (sum > 0 → bit set).
  */
object SimHashUtil {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits (60 bits) of md5 as a non-negative long. */
  def md5Long60(s: UTF8String): Long = {
    val d = md5Local.get().digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** TF-weighted 60-bit SimHash of a token array. Null elements are
    * skipped — same as the relational explode/groupBy formulation this
    * kernel replaces, where a null token contributes no hash. */
  def simhash60(toks: ArrayData): Long = {
    val m = toks.numElements()
    val tf = new java.util.HashMap[UTF8String, Integer](math.max(16, m * 2))
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val c = tf.get(t)
        tf.put(t, if (c == null) Integer.valueOf(1) else Integer.valueOf(c.intValue() + 1))
      }
      i += 1
    }
    val sums = new Array[Long](60)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = md5Long60(e.getKey)
      val cnt = e.getValue.toLong
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) sums(j) += cnt else sums(j) -= cnt
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (sums(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }
}

/** Codegen'd per-document 60-bit TF-weighted SimHash over a token array.
  * Registered as SQL function `simhash60(tokens)` via
  * [[graft.GraftExtensions]]. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(arr: Any): Any =
    SimHashUtil.simhash60(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHashExpressions {
  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val simhash60Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash60"),
    new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
    (children: Seq[Expression]) => {
      if (children.length != 1) throw new IllegalArgumentException(
        s"simhash60(tokens array<string>): requires exactly 1 argument, got ${children.length}")
      SimHash60(children.head)
    })
}
