package graft

import graft.ops.DedupQueries
import org.apache.spark.sql.functions._

/** The SQL entry point: every capability reachable from the DataFrame API
  * is equally reachable from `spark.sql` over registered views — including
  * the engine's native expressions (registered session-wide through
  * `SparkSessionExtensions`, not per-DataFrame). A user of the reference
  * migrating SQL-first gets the identical engine. */
class SqlSurfaceSpec extends SparkSpec {

  private def view(name: String): Unit =
    Tables(spark, sf, name).createOrReplaceTempView(name)

  test("spark.sql relational query equals its DataFrame twin") {
    view("lineitem")
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    val viaDf = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }

  test("native expressions run from pure SQL and match the operator library") {
    view("documents")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  simhash60(CASE WHEN trim(lower(text)) = '' THEN array()
        |            ELSE split(trim(lower(text)), '\\s+') END) AS simhash
        |FROM documents
        |WHERE size(split(trim(lower(text)), '\\s+')) > 0
        |ORDER BY doc_id""".stripMargin)
    val viaOps = DedupQueries.dedupSimhashSig(spark, sf)
    assert(viaSql.exceptAll(viaOps).isEmpty && viaOps.exceptAll(viaSql).isEmpty)
  }

  test("round-6 native expressions are reachable from pure SQL") {
    import spark.implicits._
    val got = spark.sql(
      """SELECT zorder2(5L, 3L) AS z,
        |  strip_accents_nfc('Café Zürich') AS n,
        |  quantize_i8(array(1.0D, -0.5D, 0.25D)).scale > 0 AS q
        |""".stripMargin).as[(Long, String, Boolean)].head()
    // bits of 5 (101) at even positions, 3 (11) at odd: 1,4,16 | 2,8 = 0b11111 with gaps
    assert(got._1 === graft.functions.ZOrderUtil.zorder2(5L, 3L))
    assert(got._2 === "Cafe Zurich")
    assert(got._3)
  }

  test("window + join SQL equals the DataFrame window_topk") {
    view("orders")
    val viaSql = spark.sql(
      """SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders) WHERE rank <= 3""".stripMargin)
    val viaDf = graft.ops.RelationalQueries.queries("window_topk")(spark, sf)
    assert(viaSql.count() === viaDf.count())
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }
}
