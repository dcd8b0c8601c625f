package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's extraction / scalar-function surface (SURVEY.md §2.4,
  * §2.9) over the `events` table (`props` is a JSON document, standing in
  * for the FlowFile JSON content):
  *
  *  - T9/T11 `EvaluateJsonPath` (`$.resultSet`, `is_current`,
  *    `valid_until` — final_template.xml:2057,3872-3877) → `get_json_object`
  *  - T8 `$.[0]` array unwrap (:3435) → `element_at` on a parsed array
  *  - T10 `ExtractText` Java regex `("Price":.*)` (:3768-3769) →
  *    `regexp_extract`
  *  - NiFi EL functions (§2.9): `now():toNumber()` → `unix_millis`,
  *    `now():format('yyyy-MM-dd HH:mm:ss')` → `date_format`,
  *    `:equals(...)` → `===` (here applied to the event's own ts so the
  *    oracle is deterministic).
  *
  * All per-row, codegen'd, shuffle-free — at 100 TB these run at scan
  * speed and column-prune to exactly (event_id, props / ts, event_type).
  */
object ExtractQueries {

  /** T9/T11-style JSONPath extraction: pull `$.k` out of props. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy(col("event_id"))

  /** T10-style regex capture over the raw JSON text. */
  def regexExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
          .as("keyword_value"))
      .orderBy(col("event_id"))

  /** NiFi EL scalar functions, applied to event time for determinism. */
  def elFunctions(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        unix_millis(col("ts")).as("ts_millis"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_formatted"),
        (col("event_type") === "purchase").as("is_purchase"))
      .orderBy(col("event_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "json_extract" -> (jsonExtract _),
    "regex_extract" -> (regexExtract _),
    "el_functions" -> (elFunctions _))

  val oracles: Map[String, String] = Map(
    "json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "regex_extract" ->
      """SELECT event_id,
        |       CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
        |         AS keyword_value
        |FROM events ORDER BY event_id""".stripMargin,
    "el_functions" ->
      """SELECT event_id,
        |       CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_millis,
        |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
        |         AS ts_formatted,
        |       event_type = 'purchase' AS is_purchase
        |FROM events ORDER BY event_id""".stripMargin)
}
