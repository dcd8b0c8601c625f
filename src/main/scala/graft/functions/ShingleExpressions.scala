package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[WordShingles]] — one static call per row from the
  * generated code (the standard Catalyst runtime-helper pattern), so shingle
  * construction costs a single tight loop instead of an interpreted lambda
  * per n-gram. */
object ShingleUtil {
  private val space = UTF8String.fromString(" ")

  /** Distinct space-joined word n-grams, first-occurrence order —
    * bit-identical to
    * `array_distinct(transform(sequence(1, size-n+1), i -> array_join(slice(toks,i,n),' ')))`. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= m) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  /** NON-distinct space-joined word n-grams, in order — the multiset
    * variant repetition analysis needs (a repeated n-gram must appear as
    * many times as the text repeats it). Bit-identical to
    * `transform(sequence(1, size-n+1), i -> array_join(slice(toks,i,n),' '))`. */
  def ngrams(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= m) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd word n-gram shingling.
  *
  * The built-in formulation (`transform` + `slice` + `array_join` +
  * `array_distinct`) runs through interpreted higher-order lambdas — the
  * single hottest inner loop of the dedup/fingerprint family. This
  * expression emits one static helper call inside whole-stage codegen.
  * Registered as SQL function `word_shingles(tokens, n)` via
  * [[graft.GraftExtensions]].
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(arr: Any): Any =
    ShingleUtil.shingles(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** [[WordShingles]]' multiset sibling: NON-distinct in-order n-grams
  * (`ShingleUtil.ngrams`) — same codegen shape, for repetition analysis
  * where duplicate n-grams are the signal, not noise. Registered as SQL
  * `word_ngrams(tokens, n)`. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(arr: Any): Any =
    ShingleUtil.ngrams(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object ShingleExpressions {
  /** Registration triple for SparkSessionExtensions.injectFunction.
    *
    * The builder validates its own argument shape so misuse surfaces as a
    * clear analysis-time message, not a raw internal exception: exactly two
    * arguments, and the shingle size must be a foldable integral
    * (byte/short/int/long) expression — `word_shingles(t, 3)`,
    * `word_shingles(t, 3L)`, `word_shingles(t, 1+2)` all work;
    * `word_shingles(t)`, `word_shingles(t, '3')`, or a per-row column for
    * `n` are rejected with the reason. */
  val wordShinglesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    (children: Seq[Expression]) => {
      def bad(reason: String): Nothing = throw new IllegalArgumentException(
        s"word_shingles(tokens array<string>, n integral literal): $reason")
      if (children.length != 2)
        bad(s"requires exactly 2 arguments, got ${children.length}")
      val nExpr = children(1)
      if (!nExpr.foldable)
        bad(s"shingle size must be a literal, got non-foldable ${nExpr.sql}")
      val n = nExpr.eval() match {
        case v: Int => v
        case v: Long =>
          if (v < Int.MinValue || v > Int.MaxValue) bad(s"shingle size $v out of int range")
          v.toInt
        case v: Short => v.toInt
        case v: Byte => v.toInt
        case null => bad("shingle size must not be null")
        case other => bad(
          s"shingle size must be integral, got ${nExpr.dataType.catalogString} value $other")
      }
      if (n < 1) bad(s"shingle size must be >= 1, got $n")
      WordShingles(children.head, n)
    })

  /** `word_ngrams(tokens, n)` — same argument contract as
    * `word_shingles`, multiset output. */
  val wordNgramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_ngrams"),
    new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
    (children: Seq[Expression]) => {
      def bad(reason: String): Nothing = throw new IllegalArgumentException(
        s"word_ngrams(tokens array<string>, n integral literal): $reason")
      if (children.length != 2)
        bad(s"requires exactly 2 arguments, got ${children.length}")
      val nExpr = children(1)
      if (!nExpr.foldable)
        bad(s"n-gram size must be a literal, got non-foldable ${nExpr.sql}")
      val n = nExpr.eval() match {
        case v: Int => v
        case v: Long =>
          if (v < Int.MinValue || v > Int.MaxValue) bad(s"n-gram size $v out of int range")
          v.toInt
        case v: Short => v.toInt
        case v: Byte => v.toInt
        case null => bad("n-gram size must not be null")
        case other => bad(
          s"n-gram size must be integral, got ${nExpr.dataType.catalogString} value $other")
      }
      if (n < 1) bad(s"n-gram size must be >= 1, got $n")
      WordNgrams(children.head, n)
    })
}
