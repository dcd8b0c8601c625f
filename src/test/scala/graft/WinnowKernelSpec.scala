package graft

import graft.ops.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 optimization parity net: the codegen'd winnow / gram-hash
  * kernels ([[graft.functions.WinnowUtil]]) must be BIT-IDENTICAL to the
  * relational formulation they replaced (explode grams → md5Long →
  * doc-keyed window min(struct(h,-pos)) → distinct). The relational
  * replica lives here, verbatim from the pre-round-16 TextQueries, and is
  * compared on fixtures chosen to stress the edges: multi-byte UTF-8
  * (code-point vs byte offsets), repeated text (window-min ties → rightmost
  * pos), texts at/below the k boundary, nulls, and the real sf0.001 corpus.
  */
class WinnowKernelSpec extends SparkSpec {
  import graft.functions.TextFunctions.md5Long

  private val k = TextQueries.winnowK
  private val w = TextQueries.winnowW

  /** The pre-kernel relational winnow selection, verbatim. */
  private def relationalFps(docsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docsDf.filter(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (k - 1))).as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"),
        md5Long(expr(s"substring(text, pos, $k)")).as("h"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), Window.currentRow)
    grams
      .select(col("doc_id"),
        min(struct(col("h"), (-col("pos")).as("npos"))).over(win).as("m"))
      .select(col("doc_id"), col("m.h").as("h"), (-col("m.npos")).as("pos"))
      .distinct()
  }

  private lazy val edgeFixture = {
    import spark.implicits._
    Seq(
    (0L, "plain ascii text long enough for several grams and windows"),
    (1L, "exactly sixteen!"), // == k chars: exactly one gram
    (2L, "short"), // < k chars: no fingerprints
    (3L, ""), // empty
    (4L, null.asInstanceOf[String]), // null text
    (5L, "ababababababababababababababababababab"), // heavy repetition → ties
    (6L, "QQQQQQQQQQQQQQQQQQQQQQQQQQQQQQQQ"), // one distinct gram, all ties
    (7L, "héllo wörld — çödé pöints beyond ascii ññññ ü береза 木漏れ日 and more"),
    (8L, "日本語のテキストで十六文字以上になる長さの行です"), // all multi-byte
    (9L, "mixed 漢字 and ascii across the gram boundary ok?"))
      .toDF("doc_id", "text")
  }

  test("winnow_fps kernel == relational window formulation (edge fixture)") {
    val kernel = TextQueries.winnowFingerprintsOf(edgeFixture)
    val rel = relationalFps(edgeFixture)
    assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty,
      "kernel and relational fingerprint sets must match row-for-row")
  }

  test("winnow_fps kernel == relational window formulation (sf0.001 corpus)") {
    val d = Tables.documents(spark, sf)
    val kernel = TextQueries.winnowFingerprintsOf(d)
    val rel = relationalFps(d)
    assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty)
  }

  test("gram_md5s kernel == md5Long(substring) per position") {
    val viaKernel = edgeFixture
      .filter(length(col("text")) >= 32)
      .select(col("doc_id"),
        posexplode(call_function("gram_md5s", col("text"), lit(32))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("h"))
    val viaSql = edgeFixture.filter(length(col("text")) >= 32)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - 31)).as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"),
        md5Long(expr("substring(text, pos, 32)")).as("h"))
    assert(viaKernel.exceptAll(viaSql).isEmpty &&
      viaSql.exceptAll(viaKernel).isEmpty)
  }

  test("md5_longs kernel == transform(_, md5Long) HOF") {
    import graft.functions.TextFunctions.{shingles, tokens}
    val viaHof = Tables.documents(spark, sf).select(col("doc_id"),
      transform(shingles(tokens(col("text")), 3), sh => md5Long(sh)).as("a"))
    val viaKernel = Tables.documents(spark, sf).select(col("doc_id"),
      call_function("md5_longs", shingles(tokens(col("text")), 3)).as("a"))
    assert(viaKernel.exceptAll(viaHof).isEmpty &&
      viaHof.exceptAll(viaKernel).isEmpty)
  }

  test("winnow_summary == groupBy summary over the fingerprint set") {
    val viaAgg = {
      val agg = TextQueries.winnowFingerprintsOf(edgeFixture)
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_selected"),
          concat_ws(",",
            transform(slice(array_sort(collect_set(col("h"))), 1, 8),
              _.cast("string"))).as("sketch"))
      edgeFixture.select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_selected"), lit(0L)).as("n_selected"),
          coalesce(col("sketch"), lit("")).as("sketch"))
    }
    val viaKernel = edgeFixture
      .select(col("doc_id"),
        call_function("winnow_summary", col("text"),
          lit(k), lit(w), lit(8)).as("s"))
      .select(col("doc_id"),
        coalesce(col("s.n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("s.sketch"), lit("")).as("sketch"))
    assert(viaKernel.exceptAll(viaAgg).isEmpty &&
      viaAgg.exceptAll(viaKernel).isEmpty)
  }
}
