package graft.ops

import graft.Tables
import graft.cdc.Cdc
import graft.scd2.Scd2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the CDC routing + SCD2 merge surface
  * (SURVEY.md §2.2, §2.3, §2.6, §3). The `events` testdata table plays the
  * CDC stream: `user_id` is the business key (⇄ ProductID), `ts` the change
  * time, `event_id` the binlog sequence id.
  */
object Scd2Queries {
  private val evCols = Seq("user_id", "event_id", "event_type", "value", "props")

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select((evCols :+ "ts").map(col): _*)

  /** Full SCD2 reconstruction of the per-user event history. */
  def scd2Snapshot(s: SparkSession, dir: String): DataFrame =
    Scd2.fromEvents(events(s, dir), Seq("user_id"), "ts", "event_id")
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))

  /** The merge path: seed history from the first half of the event log,
    * applyBatch the second half. Must equal the full reconstruction —
    * this is the executable form of the reference's Task1+Task2 update
    * handling (README.md:99-173) with both documented bugs fixed. */
  def scd2ApplyBatch(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val mid = ev.agg(max(col("event_id"))).first().getLong(0) / 2
    val history = Scd2.fromEvents(ev.filter(col("event_id") <= mid),
      Seq("user_id"), "ts", "event_id")
    val batch = ev.filter(col("event_id") > mid)
    Scd2.applyBatch(history, batch, Seq("user_id"), "ts", "event_id")
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** The current-rows dimension (lookup subquery, final_template.xml:1440). */
  def scd2Current(s: SparkSession, dir: String): DataFrame =
    Scd2.current(scd2Snapshot(s, dir))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))

  /** Delete-aware SCD2 reconstruction (the extension the reference's
    * router drops, SURVEY.md §7.4 item 6): `logout` plays the CDC delete —
    * it closes the user's open interval and contributes no version row;
    * later events re-open. */
  def scd2WithDeletes(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("op",
      when(col("event_type") === "logout", Scd2.DeleteOp).otherwise("update"))
    Scd2.fromEventsWithDeletes(ev, Seq("user_id"), "ts", "event_id", "op")
      .drop("op")
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  // R1 routing: signup ⇄ insert, purchase ⇄ update; the rest unmatched.
  private def cdcType = when(col("event_type") === "signup", "insert")
    .when(col("event_type") === "purchase", "update")
    .otherwise(col("event_type"))

  private def routed(s: SparkSession, dir: String): Map[String, DataFrame] =
    Cdc.route(events(s, dir), cdcType)

  def routeInsert(s: SparkSession, dir: String): DataFrame =
    routed(s, dir)("insert").orderBy(col("event_id"))
  def routeUpdate(s: SparkSession, dir: String): DataFrame =
    routed(s, dir)("update").orderBy(col("event_id"))
  def routeUnmatched(s: SparkSession, dir: String): DataFrame =
    routed(s, dir)("unmatched").orderBy(col("event_id"))

  /** T1/T2 pivot round-trip: events → CDC `columns` array → flatten. */
  def cdcFlattenPivot(s: SparkSession, dir: String): DataFrame = {
    val snap = Tables.events(s, dir).select("event_id", "user_id", "event_type")
    val cdc = Cdc.toEvents(snap, "insert", 0, current_timestamp(),
      database = "testdata", table = "events")
    Cdc.flatten(cdc, Seq("event_id", "user_id", "event_type"))
      .select("event_id", "user_id", "event_type")
      .orderBy(col("event_id").cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_snapshot" -> (scd2Snapshot _),
    "scd2_apply_batch" -> (scd2ApplyBatch _),
    "scd2_current" -> (scd2Current _),
    "scd2_with_deletes" -> (scd2WithDeletes _),
    "route_insert" -> (routeInsert _),
    "route_update" -> (routeUpdate _),
    "route_unmatched" -> (routeUnmatched _),
    "cdc_flatten_pivot" -> (cdcFlattenPivot _))

  private val scd2Sql =
    """WITH e AS (SELECT user_id, event_id, event_type, value, props,
      |            CAST(ts AS TIMESTAMP) AS ts FROM events)
      |SELECT user_id, event_id, event_type, value, props,
      |       ts AS valid_from,
      |       lead(ts) OVER w AS valid_until,
      |       CASE WHEN lead(ts) OVER w IS NULL THEN 'Y' ELSE 'N' END AS is_current
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  private def routeSql(pred: String) =
    s"""SELECT user_id, event_id, event_type, value, props,
       |       CAST(ts AS TIMESTAMP) AS ts
       |FROM events WHERE $pred ORDER BY event_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "scd2_snapshot" -> scd2Sql,
    "scd2_apply_batch" -> scd2Sql,
    "scd2_current" ->
      s"""SELECT * FROM ($scd2Sql) WHERE is_current = 'Y'
         |ORDER BY user_id, valid_from, event_id""".stripMargin,
    "scd2_with_deletes" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, props,
        |                  CAST(ts AS TIMESTAMP) AS ts,
        |                  CASE WHEN event_type = 'logout' THEN 'delete'
        |                       ELSE 'update' END AS op
        |           FROM events),
        |v AS (SELECT *, ts AS valid_from, lead(ts) OVER w AS valid_until
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id, event_type, value, props, valid_from,
        |       valid_until,
        |       CASE WHEN valid_until IS NULL THEN 'Y' ELSE 'N' END AS is_current
        |FROM v WHERE op != 'delete'
        |ORDER BY user_id, valid_from, event_id""".stripMargin,
    "route_insert" -> routeSql("event_type = 'signup'"),
    "route_update" -> routeSql("event_type = 'purchase'"),
    "route_unmatched" -> routeSql("event_type NOT IN ('signup', 'purchase')"),
    "cdc_flatten_pivot" ->
      """SELECT CAST(event_id AS VARCHAR) AS event_id,
        |       CAST(user_id AS VARCHAR) AS user_id, event_type
        |FROM events ORDER BY events.event_id""".stripMargin)
}
