package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[HtmlExtract]] — one static call per row inside
  * whole-stage codegen (the [[BlocklistUtil]] pattern). Implements the
  * public C4/CCNet web-extraction recipe (Raffel et al. JMLR'20 §2.2;
  * Wenzek et al. LREC'20) as ONE pass over the document:
  *
  *  1. tag strip — every `<[^>]*>` span becomes one space (an unclosed
  *     `<` is kept literally, matching the regex semantics);
  *  2. entity decode — `&lt; &gt; &quot; &nbsp; &amp;` IN THAT ORDER
  *     (amp last: the standard sequential-replace convention, so
  *     `&amp;lt;` decodes to the literal `&lt;`, not `<`);
  *  3. whitespace normalize — runs of spaces collapse to one, ends
  *     trimmed (space characters only, mirroring DuckDB `trim(s, ' ')`);
  *  4. boilerplate line rules — a line survives iff it has ≥ 3 words,
  *     does not mention `javascript` (case-insensitive), and its RAW
  *     form carries fewer than 2 `href` attributes (the link-density
  *     nav-bar rule).
  *
  * A plain prose document (no markup, single spaces) passes through
  * BYTE-IDENTICAL — pinned by OpsSpec — so the extractor is safe to run
  * unconditionally at the front of a crawl pipeline. */
object HtmlExtractUtil {
  private val NL = UTF8String.fromString("\n")

  private def cleanLine(line: String): String = {
    val n = line.length
    val sb = new java.lang.StringBuilder(n)
    // pass 1: tag strip (each complete <...> span -> one space)
    var i = 0
    while (i < n) {
      val c = line.charAt(i)
      if (c == '<') {
        val close = line.indexOf('>', i + 1)
        if (close >= 0) { sb.append(' '); i = close + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    // pass 2: entity decode, amp LAST (sequential-replace convention)
    var s = sb.toString
    s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&nbsp;", " ").replace("&amp;", "&")
    // pass 3: collapse space runs, trim spaces at both ends
    val out = new java.lang.StringBuilder(s.length)
    var j = 0
    var prevSpace = false
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == ' ') { if (!prevSpace) out.append(c); prevSpace = true }
      else { out.append(c); prevSpace = false }
      j += 1
    }
    var b = 0
    var e = out.length
    if (e > b && out.charAt(b) == ' ') b += 1
    if (e > b && out.charAt(e - 1) == ' ') e -= 1
    out.substring(b, e)
  }

  private def wordCount(s: String): Int = {
    // after the space collapse, words = space-separated non-empty runs
    if (s.isEmpty) 0
    else {
      var c = 1
      var i = 0
      while (i < s.length) { if (s.charAt(i) == ' ') c += 1; i += 1 }
      c
    }
  }

  private def countOf(s: String, sub: String): Int = {
    var c = 0
    var i = s.indexOf(sub)
    while (i >= 0) { c += 1; i = s.indexOf(sub, i + sub.length) }
    c
  }

  /** struct(clean, n_lines, n_kept): per-line clean + keep over the
    * '\n'-split document, kept lines '\n'-joined back. */
  def extract(text: UTF8String): GenericInternalRow = {
    val lines = text.toString.split("\n", -1)
    val kept = new java.util.ArrayList[UTF8String](lines.length)
    var li = 0
    while (li < lines.length) {
      val raw = lines(li)
      val c = cleanLine(raw)
      if (wordCount(c) >= 3 &&
          !c.toLowerCase(java.util.Locale.ROOT).contains("javascript") &&
          countOf(raw, "href") < 2)
        kept.add(UTF8String.fromString(c))
      li += 1
    }
    val clean =
      if (kept.isEmpty) UTF8String.EMPTY_UTF8
      else UTF8String.concatWs(NL,
        kept.toArray(new Array[UTF8String](kept.size)): _*)
    new GenericInternalRow(
      Array[Any](clean, lines.length.toLong, kept.size.toLong))
  }
}

/** Codegen'd HTML/boilerplate extraction over a raw document —
  * `html_extract(text) -> struct(clean string, n_lines long, n_kept
  * long)`. See [[HtmlExtractUtil]] for the exact recipe. A native
  * expression rather than per-line HOF lambdas so the whole extraction
  * is one codegen'd pass on the scan path (the blocklist_hits lesson:
  * interpreted lambdas in the hottest scan measured 1.9× a plain
  * tokenize floor). Registered as SQL `html_extract` via
  * [[graft.GraftExtensions]]. */
case class HtmlExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
  override def prettyName: String = "html_extract"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(text: Any): Any =
    HtmlExtractUtil.extract(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlExtractUtil.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)
}

object HtmlExtractExpressions {
  val htmlExtractDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("html_extract"),
    new ExpressionInfo(classOf[HtmlExtract].getName, "html_extract"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"html_extract(text) requires exactly 1 argument, got ${children.length}")
      HtmlExtract(children.head)
    })
}
