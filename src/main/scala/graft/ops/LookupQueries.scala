package graft.ops

import graft.Tables
import graft.scd2.Scd2
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J1 `LookupRecord` + `DatabaseRecordLookupService` (SURVEY.md §2.5;
  * reference: nifi/templates/final_template.xml:3216-3361 processor,
  * :1363-1471 service): for each update event, look up the key in the
  * pre-filtered current-history dimension
  * `(SELECT * FROM products_catalog_history WHERE Is_current='Y')`
  * (final_template.xml:1440), route `matched`/`unmatched`
  * (route-to-matched-unmatched, :3316).
  *
  * Spark-first restatement: the dimension is a *per-batch* DataFrame
  * broadcast to every task — one broadcast-hash join instead of the
  * reference's one-JDBC-round-trip-per-event (lookup cache disabled,
  * :1451). At 100 TB the probe side streams map-side only: no shuffle of
  * the big table, and the matched/unmatched split shares the single scan.
  *
  * The reference nests the looked-up row at record path `/resultSet`
  * (insert-entire-record, :3311-3320); we expose both shapes: nested
  * struct ([[withResultSet]]) for shape parity, and flattened `old_*`
  * columns for the oracle (parquet/pandas struct compare is lossy).
  */
object LookupQueries {

  private def split(s: SparkSession, dir: String): (DataFrame, DataFrame, Long) = {
    val ev = Tables.events(s, dir)
      .select("user_id", "event_id", "event_type", "value", "ts")
    // event_id is a dense sequence from 0; split the log at the midpoint
    val mid = ev.agg(max(col("event_id"))).first().getLong(0) / 2
    (ev.filter(col("event_id") <= mid), ev.filter(col("event_id") > mid), mid)
  }

  /** The current-rows dimension from the first half of the log, minus
    * every 7th user so the `unmatched` route is non-trivial. */
  private def currentDim(s: SparkSession, dir: String): DataFrame = {
    val (first, _, _) = split(s, dir)
    Scd2.current(
      Scd2.fromEvents(first.filter(col("user_id") % 7 =!= 0),
        Seq("user_id"), "ts", "event_id"))
      .select(col("user_id"), col("event_id").as("old_event_id"),
        col("event_type").as("old_event_type"), col("value").as("old_value"),
        col("valid_from").as("old_valid_from"))
  }

  private def probes(s: SparkSession, dir: String): DataFrame = {
    val (_, second, _) = split(s, dir)
    second.filter(col("event_type") === "purchase") // the update route
  }

  /** `matched` relationship: probe rows that found a current old row,
    * old row carried as flattened old_* columns. */
  def lookupMatched(s: SparkSession, dir: String): DataFrame =
    probes(s, dir)
      .join(broadcast(currentDim(s, dir)), Seq("user_id"), "inner")
      .orderBy(col("event_id"))

  /** `unmatched` relationship (no current row for the key). */
  def lookupUnmatched(s: SparkSession, dir: String): DataFrame =
    probes(s, dir)
      .join(broadcast(currentDim(s, dir)), Seq("user_id"), "left_anti")
      .orderBy(col("event_id"))

  /** Shape-parity variant: old row nested at `resultSet` (struct), as the
    * reference's result-record-path=/resultSet. Tested in specs; not
    * oracle-checked (struct columns don't round-trip pandas compare). */
  def withResultSet(s: SparkSession, dir: String): DataFrame = {
    val dim = currentDim(s, dir)
    val nested = dim.select(col("user_id"),
      struct(dim.columns.filterNot(_ == "user_id").map(col).toIndexedSeq: _*)
        .as("resultSet"))
    probes(s, dir).join(broadcast(nested), Seq("user_id"), "left")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lookup_matched" -> (lookupMatched _),
    "lookup_unmatched" -> (lookupUnmatched _))

  private val dimSql =
    """current_dim AS (
      |  SELECT user_id, event_id AS old_event_id,
      |         event_type AS old_event_type, value AS old_value,
      |         ts AS old_valid_from
      |  FROM (SELECT user_id, event_id, event_type, value,
      |               CAST(ts AS TIMESTAMP) AS ts,
      |               lead(ts) OVER (PARTITION BY user_id
      |                              ORDER BY ts, event_id) AS nxt
      |        FROM events
      |        WHERE event_id <= (SELECT max(event_id) // 2 FROM events)
      |          AND user_id % 7 != 0)
      |  WHERE nxt IS NULL),
      |probe AS (
      |  SELECT user_id, event_id, event_type, value,
      |         CAST(ts AS TIMESTAMP) AS ts
      |  FROM events
      |  WHERE event_id > (SELECT max(event_id) // 2 FROM events)
      |    AND event_type = 'purchase')""".stripMargin

  val oracles: Map[String, String] = Map(
    "lookup_matched" ->
      s"""WITH $dimSql
         |SELECT p.user_id, p.event_id, p.event_type, p.value, p.ts,
         |       d.old_event_id, d.old_event_type, d.old_value, d.old_valid_from
         |FROM probe p JOIN current_dim d USING (user_id)
         |ORDER BY p.event_id""".stripMargin,
    "lookup_unmatched" ->
      s"""WITH $dimSql
         |SELECT p.* FROM probe p
         |WHERE NOT EXISTS (SELECT 1 FROM current_dim d
         |                  WHERE d.user_id = p.user_id)
         |ORDER BY p.event_id""".stripMargin)
}
