package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token-statistic kernels (round-16 optimization, guide
  * §2.4): `text_entropy` and `text_repetition` computed PER-DOCUMENT
  * statistics by exploding every token / n-gram into rows and shuffling
  * the whole corpus on (doc, gram) keys — a full-corpus token-level
  * exchange to compute numbers that depend on one document at a time.
  * These kernels fold the counting into the scan (the [[SimHashUtil]]
  * precedent: local hash map per document, zero shuffle).
  *
  * Bit parity with the relational formulations is pinned by
  * TokenStatsKernelSpec and the unchanged DuckDB oracles: every count is
  * an exact integer; the single float per distinct token in the entropy
  * path is frozen at 9 dp through the identical
  * `BigDecimal.valueOf(x).setScale(9, HALF_UP)` rounding Spark's
  * `round(_, 9)` applies, then summed as exact integer nano units (the
  * decimal(28,9) sum it replaces reassociates freely for the same
  * reason). */
object TokenStatsUtil {

  /** (n_tokens, n_distinct, hsum_nanos): token count, distinct-token
    * count, and Σ round(−p·ln p, 9) in exact 1e-9 units over distinct
    * tokens — the [[graft.ops.TextQueries.textEntropyOf]] aggregate.
    * Null array elements are skipped (explode of a null token emits no
    * row in the relational form... null elements cannot arise from
    * `tokens()`, but the kernel must not NPE). Returns null for an
    * empty/absent token set — callers filter those docs out, matching
    * the inner-join shape of the relational form. */
  def entropyStats(toks: ArrayData): InternalRow = {
    val m = toks.numElements()
    val tf = new java.util.HashMap[UTF8String, long2]
    var nTokens = 0L
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val c = tf.get(t)
        if (c == null) tf.put(t, new long2) else c.v += 1L
        nTokens += 1L
      }
      i += 1
    }
    if (nTokens == 0L) return null
    val n = nTokens.toDouble
    var hnanos = 0L
    val it = tf.values().iterator()
    while (it.hasNext) {
      val c = it.next().v
      val p = c.toDouble / n
      val term = -(p * java.lang.Math.log(p))
      hnanos += java.math.BigDecimal.valueOf(term)
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
    InternalRow(nTokens, tf.size().toLong, hnanos)
  }

  // one mutable box per map entry (initial count 1) — avoids Integer
  // boxing churn in the per-token hot loop
  private final class long2 { var v: Long = 1L }

  /** The six aggregates behind [[graft.ops.TextQueries.repetition]]'s
    * pivot: (total1, dis1, total2, max2, total3, dup3) where total_n =
    * n-gram occurrences, dis1 = distinct tokens, max2 = occurrences of
    * the most frequent bigram, dup3 = occurrences of trigrams seen ≥ 2×.
    * total2/max2 (resp. total3/dup3) are null when the doc has no
    * bigrams (trigrams) — the exact null the relational pivot's
    * `first(when(n === 2, ...))` produced, which the query's coalesce
    * turns into 0.0. Null for an empty token set (doc absent from the
    * relational output). */
  def repetitionStats(toks: ArrayData): InternalRow = {
    val m = toks.numElements()
    // drop null elements once up front (cannot arise from tokens(); the
    // relational explode would skip them)
    val ts = new java.util.ArrayList[UTF8String](m)
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) ts.add(toks.getUTF8String(i))
      i += 1
    }
    val n = ts.size()
    if (n == 0) return null
    def gramCounts(g: Int): java.util.HashMap[UTF8String, long2] = {
      val cnt = new java.util.HashMap[UTF8String, long2]
      var j = 0
      while (j + g <= n) {
        val key =
          if (g == 1) ts.get(j)
          else {
            val sb = new java.lang.StringBuilder(ts.get(j).toString)
            var q = 1
            while (q < g) { sb.append(' ').append(ts.get(j + q)); q += 1 }
            UTF8String.fromString(sb.toString)
          }
        val c = cnt.get(key)
        if (c == null) cnt.put(key, new long2) else c.v += 1L
        j += 1
      }
      cnt
    }
    val c1 = gramCounts(1)
    val total1 = n.toLong
    val dis1 = c1.size().toLong
    var total2: Any = null; var max2: Any = null
    if (n >= 2) {
      val c2 = gramCounts(2)
      var mx = 0L; var tot = 0L
      val it = c2.values().iterator()
      while (it.hasNext) { val v = it.next().v; tot += v; if (v > mx) mx = v }
      total2 = tot; max2 = mx
    }
    var total3: Any = null; var dup3: Any = null
    if (n >= 3) {
      val c3 = gramCounts(3)
      var tot = 0L; var dup = 0L
      val it = c3.values().iterator()
      while (it.hasNext) { val v = it.next().v; tot += v; if (v >= 2L) dup += v }
      total3 = tot; dup3 = dup
    }
    InternalRow(total1, dis1, total2, max2, total3, dup3)
  }
}

/** `entropy_stats(tokens)` → struct<n_tokens:long, n_distinct:long,
  * hsum_nanos:long>, null when the token set is empty. */
case class EntropyStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("hsum_nanos", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "entropy_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(arr: Any): Any =
    TokenStatsUtil.entropyStats(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = "graft.functions.TokenStatsUtil"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $u.entropyStats($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): EntropyStats =
    copy(child = newChild)
}

/** `repetition_stats(tokens)` → struct<total1, dis1, total2, max2,
  * total3, dup3> (all long; total2/max2/total3/dup3 nullable), null when
  * the token set is empty. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("total1", LongType, nullable = false),
    StructField("dis1", LongType, nullable = false),
    StructField("total2", LongType, nullable = true),
    StructField("max2", LongType, nullable = true),
    StructField("total3", LongType, nullable = true),
    StructField("dup3", LongType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(arr: Any): Any =
    TokenStatsUtil.repetitionStats(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = "graft.functions.TokenStatsUtil"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $u.repetitionStats($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object TokenStatsExpressions {
  val entropyStatsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("entropy_stats"),
    new ExpressionInfo(classOf[EntropyStats].getName, "entropy_stats"),
    (children: Seq[Expression]) => {
      if (children.length != 1) throw new IllegalArgumentException(
        s"entropy_stats(tokens array<string>): requires exactly 1 argument, got ${children.length}")
      EntropyStats(children.head)
    })

  val repetitionStatsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("repetition_stats"),
    new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
    (children: Seq[Expression]) => {
      if (children.length != 1) throw new IllegalArgumentException(
        s"repetition_stats(tokens array<string>): requires exactly 1 argument, got ${children.length}")
      RepetitionStats(children.head)
    })
}
