package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the "describe my table" operator a user runs before
  * building any pipeline: one row per column with row/null/distinct counts
  * and typed min/max, over any DataFrame.
  *
  * Shape: ONE aggregate pass over the table (all per-column measures in a
  * single `agg`), then a driver-free `stack` unpivot of the 1-row result.
  * Exact distinct counts make Spark plan an Expand (×#columns row
  * replication into one shuffle) — the honest cost of exact NDV, kept
  * because it is oracle-checkable; at 100 TB swap `countDistinct` for
  * `approx_count_distinct` (the `approx_distinct` query is that scale
  * path, spec-bounded).
  *
  * min/max are computed in the column's NATIVE type (numeric min, not the
  * lexicographic min of the string rendering) and only then rendered:
  * doubles through DECIMAL(18,2) so both engines print fixed-point.
  */
object ProfileQueries {

  private def render(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast("decimal(18,2)").cast("string")
    case _ => c.cast("string")
  }

  /** Generic profiler: one row per column of `df`. */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggCols = fields.flatMap { f =>
      Seq(
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        countDistinct(col(f.name)).as(s"${f.name}__distinct"),
        render(min(col(f.name)), f.dataType).as(s"${f.name}__min"),
        render(max(col(f.name)), f.dataType).as(s"${f.name}__max"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = fields.map(f =>
      s"'${f.name}', `${f.name}__nulls`, `${f.name}__distinct`, " +
        s"`${f.name}__min`, `${f.name}__max`").mkString(", ")
    one.select(
      expr(s"stack(${fields.length}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_value, max_value)"),
      col("__n").as("n_rows"))
      .select("col_name", "n_rows", "n_nulls", "n_distinct",
        "min_value", "max_value")
      .orderBy("col_name")
  }

  def dataProfile(s: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "data_profile" -> (dataProfile _))

  private def colSql(name: String, minMax: String => String) =
    s"""SELECT '$name' AS col_name, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_nulls,
       |  CAST(count(DISTINCT $name) AS BIGINT) AS n_distinct,
       |  ${minMax(s"min($name)")} AS min_value,
       |  ${minMax(s"max($name)")} AS max_value
       |FROM orders""".stripMargin

  private val plain = (e: String) => s"CAST($e AS VARCHAR)"
  private val fixed = (e: String) => s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)"

  val oracles: Map[String, String] = Map(
    "data_profile" -> Seq(
      colSql("o_orderkey", plain), colSql("o_custkey", plain),
      colSql("o_orderstatus", plain), colSql("o_totalprice", fixed),
      colSql("o_orderdate", plain), colSql("o_orderpriority", plain))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"))
}
