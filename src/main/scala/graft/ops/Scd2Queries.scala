package graft.ops

import graft.Tables
import graft.cdc.{Cdc, Merge}
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

  /** TIME TRAVEL: the dimension AS OF an instant — the version row whose
    * validity interval contains T, per key ([[scd2AsofLookup]] answers
    * this per-fact; this reconstructs the whole table at T, the "what did
    * the dimension look like last Tuesday" query an SCD2 history exists
    * to answer). Pure scan-speed interval predicate over the versioned
    * history — with the history partitioned by valid_from date at scale,
    * partition pruning bounds the scan. Keys whose first version is after
    * T simply don't appear (they didn't exist yet). */
  def scd2AsOf(s: SparkSession, dir: String): DataFrame = {
    val t = to_timestamp(lit(retentionCutoff))
    scd2Snapshot(s, dir)
      .filter(col("valid_from") <= t &&
        (col("valid_until").isNull || col("valid_until") > t))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** History RETENTION: the maintenance pass every long-lived SCD2 table
    * eventually needs (time-travel horizon / storage cost / right-to-be-
    * forgotten): keep the current row per key plus versions still valid
    * after the cutoff; tag everything older for the archive tier. A pure
    * scan-speed predicate over the history (no shuffle beyond the window
    * the snapshot itself pays) — at 100 TB this is the operator that runs
    * as the partition-drop policy on a date-partitioned history. The row
    * set is PRESERVED with a `tier` column (hot/archive) rather than
    * filtered, so both the retained table and the archive manifest come
    * from one pass. */
  val retentionCutoff = "2024-01-16 00:00:00"

  def scd2Retention(s: SparkSession, dir: String): DataFrame =
    scd2Snapshot(s, dir)
      .withColumn("tier",
        when(col("is_current") === "Y" ||
          col("valid_until") >= to_timestamp(lit(retentionCutoff)), "hot")
          .otherwise("archive"))
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

  /** Deterministic OUT-OF-ORDER split for the late-event path: history is
    * seeded from the even event_ids, the batch is the odd ones — so a batch
    * row's ts can precede its user's open-row `valid_from` (the max-ts even
    * event), i.e. the batch genuinely contains late deliveries, unlike the
    * event-time-monotone mid split of [[scd2ApplyBatch]]. Parity is a pure
    * scan predicate — no driver action to find a split point. */
  private def lateSplit(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = events(s, dir)
    val history = Scd2.fromEvents(ev.filter(col("event_id") % 2 === 0),
      Seq("user_id"), "ts", "event_id")
    (history, ev.filter(col("event_id") % 2 === 1))
  }

  /** The late-event ROUTE: the batch rows [[Scd2.applyBatch]] would drop
    * under [[Scd2.LatePolicy.Drop]] — the capture side of the reference's
    * would-be dead-letter path (SURVEY.md §2.3; the reference silently
    * corrupts on these, README.md:190-195). */
  def scd2LateEvents(s: SparkSession, dir: String): DataFrame = {
    val (history, batch) = lateSplit(s, dir)
    Scd2.lateEvents(history, batch, Seq("user_id"), "ts")
      .orderBy(col("event_id"))
  }

  /** The merge under [[Scd2.LatePolicy.Drop]]: late rows excluded, the
    * open row expires at its user's earliest NON-late event — proves the
    * Drop-path routing semantics end-to-end (not just the Error path). */
  def scd2ApplyDrop(s: SparkSession, dir: String): DataFrame = {
    val (history, batch) = lateSplit(s, dir)
    Scd2.applyBatch(history, batch, Seq("user_id"), "ts", "event_id",
      Scd2.LatePolicy.Drop)
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** POINT-IN-TIME dimension lookup (temporal join): enrich each fact
    * with the SCD2 version valid AT THE FACT'S EVENT TIME — the pattern a
    * versioned dimension exists for (J1's current-row lookup reads only
    * the latest; this reads history). Dim = even event_ids reconstructed
    * to versions; facts = odd event_ids. The join is equi on the key plus
    * the interval residual; versions partition each key's timeline, so a
    * fact matches AT MOST one version (no dedup step). Cost = one
    * co-partitioned key shuffle, the same as any fact⋈dim join; facts
    * predating the key's first version surface with nulls, not dropped. */
  def scd2AsofLookup(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val dim = Scd2.fromEvents(ev.filter(col("event_id") % 2 === 0),
      Seq("user_id"), "ts", "event_id")
      .select(col("user_id").as("dim_user_id"),
        col("event_id").as("dim_event_id"), col("value").as("dim_value"),
        col("valid_from"), col("valid_until"))
    val facts = ev.filter(col("event_id") % 2 === 1)
      .select("user_id", "event_id", "ts")
    facts.join(dim,
        col("user_id") === col("dim_user_id") &&
          col("ts") >= col("valid_from") &&
          (col("valid_until").isNull || col("ts") < col("valid_until")),
        "left")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("dim_event_id"), col("dim_value"), col("valid_from"))
      .orderBy("event_id")
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

  /** Batch CDC derivation over two deterministic snapshots of `orders`:
    * old = keys ∉ 0 (mod 7); new = keys ∉ 0 (mod 11) with totalprice
    * doubled on keys ≡ 0 (mod 5) — so all three change routes (insert /
    * update / delete) surface, and unchanged rows prove the noop filter. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
    val oldSnap = base.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
    val newSnap = base.filter(pmod(col("o_orderkey"), lit(11)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(5)) === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    Cdc.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("op"),
        col("old.o_totalprice").as("old_totalprice"),
        col("new.o_totalprice").as("new_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Debezium wire-format ingestion end-to-end: orders rows are wrapped in
    * real Debezium-envelope JSON (op c/u/d by key mod 3, before/after row
    * images, source.pos = the order key, ts_ms), parsed back with
    * `from_json(debeziumSchema)`, adapted by [[Cdc.fromDebezium]], then run
    * through the same route → flatten → cast pipeline every other CDC query
    * uses — proving the engine ingests the standard public CDC format the
    * reference's `CaptureChangeMySQL` plays the role of. Deletes route to
    * unmatched (reference parity) so only c/u rows surface. */
  def debeziumIngest(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val row = struct(base.schema.fieldNames.map(col).toIndexedSeq: _*)
    val opCode = when(pmod(col("o_orderkey"), lit(3)) === 0, "c")
      .when(pmod(col("o_orderkey"), lit(3)) === 1, "u")
      .otherwise("d")
    val json = base.select(to_json(struct(
      when(opCode =!= "c", row).as("before"),
      when(opCode =!= "d", row).as("after"),
      struct(lit("mysql").as("connector"), lit("sample_data").as("db"),
        lit("orders").as("table"), lit("mysql-bin.000003").as("file"),
        col("o_orderkey").as("pos"), lit(0).as("row")).as("source"),
      opCode.as("op"),
      (lit(1700000000000L) + col("o_orderkey")).as("ts_ms"))).as("json"))
    val events = Cdc.fromDebezium(
      json.select(from_json(col("json"), Cdc.debeziumSchema(base.schema)).as("e"))
        .select("e.*"))
    val routed = Cdc.route(events)
    val flat = Cdc.castTo(
      Cdc.flatten(routed(Cdc.Insert).unionByName(routed(Cdc.Update)),
        base.schema.fieldNames.toSeq),
      base.schema)
    flat.select(col("seq"), col("event_type"), col("ts"),
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      // sortWithinPartitions, not orderBy: a global range sort SAMPLES its
      // child to pick bounds, evaluating the whole JSON round-trip twice;
      // the driver compare is order-insensitive, so pay the pipeline once
      .sortWithinPartitions("seq")
  }

  /** The periodic-snapshot CDC lifecycle END-TO-END: two table snapshots
    * (the [[snapshotDiff]] fixtures) are diffed into a change set, and the
    * change set is merged into an SCD2 history seeded from the old snapshot
    * — [[Cdc.snapshotDiff]] composed with [[Scd2.applyBatchWithDeletes]],
    * so inserts open rows, updates expire-and-version, and deletes close
    * the key's interval with no successor. This is what replaces a binlog
    * tail when the upstream only offers periodic snapshots. */
  def snapshotCdcLifecycle(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
    val oldSnap = base.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
    val newSnap = base.filter(pmod(col("o_orderkey"), lit(11)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(5)) === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    val history = Scd2.withScd2Columns(oldSnap,
      to_timestamp(lit("2023-01-01 00:00:00")))
    val batch = Cdc.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("op"),
        col("new.o_totalprice").as("o_totalprice"),
        to_timestamp(lit("2023-06-01 00:00:00")).as("ts"),
        col("o_orderkey").as("seq"))
    Scd2.applyBatchWithDeletes(history, batch, Seq("o_orderkey"),
        "ts", "seq", "op")
      .orderBy("o_orderkey", "valid_from")
  }

  /** Generic last-write-wins MERGE over the [[snapshotDiff]] fixtures —
    * [[Merge.merge]] exercised on all four rule arms plus intra-batch
    * ordering: wave 1 is the old→new snapshot diff (insert/update/delete,
    * seq 1); wave 2 (seq 2) re-updates keys ≡ 0 (mod 13) of the new
    * snapshot at triple price, overriding wave 1 for those keys. The
    * merged current state must equal newSnap except where wave 2 won —
    * the invariant MergeSpec pins; here the full merge replays in SQL. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
    val oldSnap = base.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
    val newSnap = base.filter(pmod(col("o_orderkey"), lit(11)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(5)) === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    val wave1 = Cdc.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("op"),
        col("new.o_totalprice").as("o_totalprice"), lit(1L).as("seq"))
    val wave2 = newSnap.filter(pmod(col("o_orderkey"), lit(13)) === 0)
      .select(col("o_orderkey"), lit(Cdc.Update).as("op"),
        (col("o_totalprice") * 3).as("o_totalprice"), lit(2L).as("seq"))
    Merge.merge(oldSnap, wave1.unionByName(wave2), Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "merge_upsert" -> (mergeUpsert _),
    "snapshot_cdc_lifecycle" -> (snapshotCdcLifecycle _),
    "debezium_ingest" -> (debeziumIngest _),
    "snapshot_diff" -> (snapshotDiff _),
    "scd2_asof_lookup" -> (scd2AsofLookup _),
    "scd2_retention" -> (scd2Retention _),
    "scd2_as_of" -> (scd2AsOf _),
    "scd2_snapshot" -> (scd2Snapshot _),
    "scd2_apply_batch" -> (scd2ApplyBatch _),
    "scd2_current" -> (scd2Current _),
    "scd2_with_deletes" -> (scd2WithDeletes _),
    "scd2_late_events" -> (scd2LateEvents _),
    "scd2_apply_drop" -> (scd2ApplyDrop _),
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

  /** DuckDB twin of [[lateSplit]] + the open-row lookup: CTEs ending in
    * `b` (the odd-event batch), `open` (per-user open-row valid_from from
    * the even-event history) — shared by both late-path oracles. */
  private val lateSplitCtes =
    """e AS (SELECT user_id, event_id, event_type, value, props,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |hist AS (
      |  SELECT user_id, event_id, event_type, value, props,
      |         ts AS valid_from, lead(ts) OVER w AS valid_until,
      |         CASE WHEN lead(ts) OVER w IS NULL THEN 'Y' ELSE 'N' END
      |           AS is_current
      |  FROM e WHERE event_id % 2 = 0
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |open_row AS (SELECT user_id, valid_from AS open_from
      |             FROM hist WHERE is_current = 'Y'),
      |b AS (SELECT e.*, o.open_from FROM e
      |      LEFT JOIN open_row o ON e.user_id = o.user_id
      |      WHERE e.event_id % 2 = 1)""".stripMargin

  val lateEventsSql: String =
    s"""WITH $lateSplitCtes
       |SELECT user_id, event_id, event_type, value, props, ts
       |FROM b WHERE ts < open_from ORDER BY event_id""".stripMargin

  val applyDropSql: String =
    s"""WITH $lateSplitCtes,
       |kept AS (SELECT user_id, event_id, event_type, value, props, ts
       |         FROM b WHERE open_from IS NULL OR ts >= open_from),
       |first_new AS (SELECT user_id, min(ts) AS first_ts
       |              FROM kept GROUP BY user_id),
       |updated AS (
       |  SELECT h.user_id, h.event_id, h.event_type, h.value, h.props,
       |         h.valid_from,
       |         CASE WHEN h.is_current = 'Y' AND f.first_ts IS NOT NULL
       |              THEN f.first_ts ELSE h.valid_until END AS valid_until,
       |         CASE WHEN h.is_current = 'Y' AND f.first_ts IS NOT NULL
       |              THEN 'N' ELSE h.is_current END AS is_current
       |  FROM hist h LEFT JOIN first_new f ON h.user_id = f.user_id),
       |newv AS (
       |  SELECT user_id, event_id, event_type, value, props,
       |         ts AS valid_from, lead(ts) OVER w AS valid_until,
       |         CASE WHEN lead(ts) OVER w IS NULL THEN 'Y' ELSE 'N' END
       |           AS is_current
       |  FROM kept WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT * FROM (SELECT * FROM updated UNION ALL SELECT * FROM newv)
       |ORDER BY user_id, valid_from, event_id""".stripMargin

  private def routeSql(pred: String) =
    s"""SELECT user_id, event_id, event_type, value, props,
       |       CAST(ts AS TIMESTAMP) AS ts
       |FROM events WHERE $pred ORDER BY event_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "snapshot_cdc_lifecycle" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 != 0),
        |new AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 11 != 0),
        |d AS (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |         WHEN n.o_orderkey IS NULL THEN 'delete'
        |         WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'update'
        |         ELSE 'noop' END AS op,
        |    n.o_totalprice AS new_price
        |  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey),
        |ch AS (SELECT * FROM d WHERE op != 'noop'),
        |updated AS (
        |  SELECT o.o_orderkey, o.o_totalprice,
        |    TIMESTAMP '2023-01-01 00:00:00' AS valid_from,
        |    CASE WHEN c.o_orderkey IS NOT NULL
        |         THEN TIMESTAMP '2023-06-01 00:00:00' END AS valid_until,
        |    CASE WHEN c.o_orderkey IS NOT NULL THEN 'N' ELSE 'Y' END
        |      AS is_current
        |  FROM old o LEFT JOIN ch c ON o.o_orderkey = c.o_orderkey),
        |newv AS (
        |  SELECT o_orderkey, new_price AS o_totalprice,
        |    TIMESTAMP '2023-06-01 00:00:00' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_until, 'Y' AS is_current
        |  FROM ch WHERE op != 'delete')
        |SELECT * FROM (SELECT * FROM updated UNION ALL SELECT * FROM newv)
        |ORDER BY o_orderkey, valid_from""".stripMargin,
    "debezium_ingest" ->
      """SELECT o_orderkey AS seq,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'insert' ELSE 'update' END
        |    AS event_type,
        |  epoch_ms(1700000000000 + o_orderkey) AS ts,
        |  o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 3 != 2 ORDER BY o_orderkey""".stripMargin,
    "merge_upsert" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 != 0),
        |new AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 11 != 0),
        |w1 AS (
        |  SELECT o_orderkey, op, o_totalprice, 1 AS seq FROM (
        |    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |      CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |           WHEN n.o_orderkey IS NULL THEN 'delete'
        |           WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |             THEN 'update' ELSE 'noop' END AS op,
        |      n.o_totalprice AS o_totalprice
        |    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
        |  WHERE op != 'noop'),
        |w2 AS (
        |  SELECT o_orderkey, 'update' AS op, o_totalprice * 3 AS o_totalprice,
        |         2 AS seq
        |  FROM new WHERE o_orderkey % 13 = 0),
        |src AS (SELECT * FROM w1 UNION ALL SELECT * FROM w2),
        |latest AS (
        |  SELECT o_orderkey, op, o_totalprice FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |                                 ORDER BY seq DESC) AS rn
        |    FROM src) WHERE rn = 1)
        |SELECT o_orderkey, o_totalprice FROM old
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
        |UNION ALL
        |SELECT o_orderkey, o_totalprice FROM latest WHERE op != 'delete'
        |ORDER BY o_orderkey""".stripMargin,
    "snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 != 0),
        |new AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 11 != 0),
        |d AS (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |         WHEN n.o_orderkey IS NULL THEN 'delete'
        |         WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'update'
        |         ELSE 'noop' END AS op,
        |    o.o_totalprice AS old_totalprice,
        |    n.o_totalprice AS new_totalprice
        |  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
        |SELECT * FROM d WHERE op != 'noop' ORDER BY o_orderkey""".stripMargin,
    "scd2_asof_lookup" ->
      """WITH e AS (SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |v AS (
        |  SELECT user_id AS dim_user_id, event_id AS dim_event_id,
        |         value AS dim_value, ts AS valid_from,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS valid_until
        |  FROM e WHERE event_id % 2 = 0),
        |f AS (SELECT user_id, event_id, ts FROM e WHERE event_id % 2 = 1)
        |SELECT f.user_id, f.event_id, f.ts,
        |       v.dim_event_id, v.dim_value, v.valid_from
        |FROM f LEFT JOIN v ON f.user_id = v.dim_user_id
        |  AND f.ts >= v.valid_from
        |  AND (v.valid_until IS NULL OR f.ts < v.valid_until)
        |ORDER BY f.event_id""".stripMargin,
    "scd2_retention" ->
      s"""SELECT *, CASE WHEN is_current = 'Y'
         |  OR valid_until >= TIMESTAMP '$retentionCutoff'
         |  THEN 'hot' ELSE 'archive' END AS tier
         |FROM ($scd2Sql)
         |ORDER BY user_id, valid_from, event_id""".stripMargin,
    "scd2_as_of" ->
      s"""SELECT * FROM ($scd2Sql)
         |WHERE valid_from <= TIMESTAMP '$retentionCutoff'
         |  AND (valid_until IS NULL OR valid_until > TIMESTAMP '$retentionCutoff')
         |ORDER BY user_id, valid_from, event_id""".stripMargin,
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
    "scd2_late_events" -> lateEventsSql,
    "scd2_apply_drop" -> applyDropSql,
    "route_insert" -> routeSql("event_type = 'signup'"),
    "route_update" -> routeSql("event_type = 'purchase'"),
    "route_unmatched" -> routeSql("event_type NOT IN ('signup', 'purchase')"),
    "cdc_flatten_pivot" ->
      """SELECT CAST(event_id AS VARCHAR) AS event_id,
        |       CAST(user_id AS VARCHAR) AS user_id, event_type
        |FROM events ORDER BY events.event_id""".stripMargin)
}
