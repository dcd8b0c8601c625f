package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[StripAccentsNfc]] — one static call per row from
  * the generated code (the [[ZOrderUtil]] pattern). */
object NormalizeUtil {
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  /** Canonical text normalization for corpus prep: NFD-decompose, drop
    * every combining mark, NFC-recompose — `Café Zürich` → `Cafe Zurich`.
    * ASCII fast path: pure-ASCII text is NFC/NFD-invariant and mark-free
    * (and is virtually all corpus text), so it returns the input without
    * allocating; only rows that need it pay the normalize+regex cost. */
  def stripAccentsNfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { // UTF8String bytes: ASCII ⟺ every byte >= 0
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val stripped = Marks.matcher(nfd).replaceAll("")
    UTF8String.fromString(
      java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd accent-strip normalization —
  * `strip_accents_nfc(s string) -> string`.
  *
  * The Unicode-normalization pass every multilingual corpus pipeline runs
  * before tokenization/hashing (DuckDB ships it as `strip_accents`, which
  * is exactly the oracle twin): NFD → remove `\p{M}` → NFC. A native
  * expression rather than a UDF so it stays inside whole-stage codegen on
  * the scan path. Registered as SQL `strip_accents_nfc` via
  * [[graft.GraftExtensions]].
  */
case class StripAccentsNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${t.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    NormalizeUtil.stripAccentsNfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NormalizeUtil.stripAccentsNfc($s);")

  override protected def withNewChildInternal(newChild: Expression): StripAccentsNfc =
    copy(child = newChild)
}

object NormalizeExpressions {
  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val stripAccentsNfcDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("strip_accents_nfc"),
    new ExpressionInfo(classOf[StripAccentsNfc].getName, "strip_accents_nfc"),
    (children: Seq[Expression]) => {
      if (children.length != 1) throw new IllegalArgumentException(
        s"strip_accents_nfc(s string): requires exactly 1 argument, got ${children.length}")
      StripAccentsNfc(children.head)
    })
}

object NormalizeFunctions {
  /** Codegen'd NFD→strip-marks→NFC normalization (requires the session to
    * be built with graft.GraftExtensions). */
  def stripAccentsNfc(s: Column): Column = call_function("strip_accents_nfc", s)
}
