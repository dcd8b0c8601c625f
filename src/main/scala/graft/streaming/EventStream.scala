package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** A raw event row as fed to the streaming analytics operators. */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Running per-user aggregate maintained by [[EventStream.runningUserTotals]]. */
case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

/** Open-session accumulator for [[EventStream.closedSessions]] —
  * timestamps as MICROSECONDS since epoch (java.sql.Timestamp.getTime is
  * millisecond-precision and would silently truncate event times). */
case class SessionAcc(start: Long, last: Long, n: Long)

/** A closed session emitted by [[EventStream.closedSessions]]. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                         last_event: java.sql.Timestamp, n_events: Long)

/** Per-user funnel progress maintained by [[EventStream.funnelProgress]] —
  * stage timestamps as MICROSECONDS since epoch (state) / Timestamps
  * (output), mirroring the batch twin's columns. */
case class FunnelAcc(tSignup: Long, tView: Long, tPurchase: Long)

/** A funnel-progress update emitted by [[EventStream.funnelProgress]]. */
case class FunnelOut(user_id: Long, t_signup: java.sql.Timestamp,
                     t_view: java.sql.Timestamp,
                     t_purchase: java.sql.Timestamp, stage_depth: Int)

/** Streaming EWMA output — the streaming twin of
  * [[graft.ops.AnalyticsQueries.windowEwma]]. */
case class EwmaOut(user_id: Long, event_id: Long, ewma: Double)

/** Ring buffer of the last `ewmaDepth` values for one user, NEWEST
  * FIRST (index j = lag j — the exact layout of the batch twin's
  * lag-term sum). */
case class EwmaBuf(vals: Seq[Double])

/** Per-user fixed-depth EWMA as a StatefulProcessor: state is the
  * [[EwmaBuf]] ring buffer (O(depth) per user — bounded regardless of
  * stream length). Within a micro-batch rows are sorted by event-time
  * (µs) then event_id — the batch twin's window order; ACROSS batches
  * the source must deliver a user's events in event-time order (the
  * same in-order contract the other running-state twins document).
  * Arithmetic mirrors the batch tree term-for-term: ascending-lag
  * left-associative sum, α = 1/2 weights (exact binary fractions),
  * HALF_UP rounding at 6 dp — so streaming output is BIT-equal to
  * `window_ewma`, proven in EventStreamSpec. */
class EwmaProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, EwmaOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var state: ValueState[EwmaBuf] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[EwmaBuf]("ewma_buf",
      org.apache.spark.sql.Encoders.product[EwmaBuf], TTLConfig.NONE)

  private def usOf(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  override def handleInputRows(key: Long, rows: Iterator[Ev],
                               timerValues: TimerValues): Iterator[EwmaOut] = {
    val depth = graft.ops.AnalyticsQueries.ewmaDepth
    var buf = Option(state.get()).map(_.vals.toList).getOrElse(Nil)
    val out = rows.toSeq.sortBy(e => (usOf(e.ts), e.event_id)).map { e =>
      buf = (e.value :: buf).take(depth)
      // identical tree to the batch twin: Σ_j buf(j)·2^−(j+1), ascending
      // j, left-associative; renormalized by the weights present
      var num = 0.0; var den = 0.0; var j = 0
      buf.foreach { v =>
        val wt = math.pow(0.5, j + 1)
        num += v * wt; den += wt; j += 1
      }
      // java BigDecimal.valueOf = Spark Round's own double→decimal path
      // (canonical Double.toString, NOT the exact binary expansion)
      val ewma = java.math.BigDecimal.valueOf(num / den)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      EwmaOut(key, e.event_id, ewma)
    }
    state.update(EwmaBuf(buf))
    out.iterator
  }
}

/** Per-user running totals as a [[org.apache.spark.sql.streaming.StatefulProcessor]]
  * (the transformWithState API): one named ValueState per user. */
class RunningTotalProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserTotal] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var state: ValueState[UserTotal] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[UserTotal]("total",
      org.apache.spark.sql.Encoders.product[UserTotal], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Ev],
                               timerValues: TimerValues): Iterator[UserTotal] = {
    val prev = Option(state.get()).getOrElse(UserTotal(key, 0L, 0.0))
    var n = prev.n_events
    var tot = prev.total_value
    rows.foreach { e => n += 1; tot += e.value }
    val next = UserTotal(key, n, math.rint(tot * 1e6) / 1e6)
    state.update(next)
    Iterator.single(next)
  }
}

/** Structured Streaming analytics over the event stream — the streaming
  * twins of [[graft.ops.AnalyticsQueries]] (SURVEY.md §2.10: the reference
  * has no watermarks/event-time windows/session windows; these are the
  * operators a production version of its pipeline needs next).
  *
  * Each operator returns a transformed streaming DataFrame — the caller
  * picks sink/trigger/output-mode. State stores are keyed exactly like the
  * batch shuffles (window × group key), so executor state is bounded by
  * the watermark horizon, not the stream length:
  *
  *  - tumbling windows: state per (hour, event_type) — evicted once the
  *    watermark passes window end;
  *  - session windows: merging state per (user, open session) — the
  *    native `session_window` operator merges adjacent state on arrival;
  *  - dedup: one (event_id, ts) entry per in-horizon event — the
  *    streaming face of exact dedup, and the idempotence guard an
  *    at-least-once CDC source needs;
  *  - `mapGroupsWithState`: arbitrary per-key state (here: running user
  *    totals) — the extension point the reference's DistributedMapCache
  *    could never offer safely.
  */
object EventStream {

  /** Watermarked tumbling 1-hour window × event_type aggregate (the
    * streaming twin of AnalyticsQueries.windowAgg). */
  def windowedAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Watermarked SLIDING windows (1-hour span every 15 minutes): each
    * event contributes to span/slide = 4 overlapping windows — the
    * moving-average shape. State cost is windows-per-event × groups, and
    * the watermark evicts each window once its end passes the horizon;
    * the overlap factor is the span/slide ratio, fixed at plan time. */
  def slidingAgg(events: DataFrame, span: String = "1 hour",
                 slide: String = "15 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), span, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Watermarked session windows per user (the streaming twin of
    * AnalyticsQueries.sessionize; same gap → same sessions). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * state is one entry per in-horizon event, evicted by the watermark. */
  def dedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-STATIC lookup join — the streaming face of the reference's
    * `LookupRecord` + `DatabaseRecordLookupService` (J1,
    * final_template.xml:3216-3361): each micro-batch of events left-joins
    * a static current-dimension table. Stateless (nothing to watermark);
    * the static side is re-planned per micro-batch, so a broadcast dim
    * costs one broadcast per batch and the stream side never shuffles —
    * exactly the per-event JDBC lookup the reference does row-at-a-time,
    * done set-at-a-time. Misses surface with null dim columns (the
    * `unmatched` route = `filter(dimCol.isNull)` downstream). */
  def lookupEnrich(events: DataFrame, dim: DataFrame,
                   keys: Seq[String] = Seq("user_id")): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Watermarked stream-stream INNER join: each purchase joined to the
    * same user's signup that happened at or before it, within a bounded
    * event-time range. The time-range condition is what bounds the join
    * state (Spark derives each side's state watermark from it): signup
    * state is evicted once no future purchase can reach back to it, so
    * executor state scales with the horizon, not the stream length. */
  def purchaseAfterSignup(purchases: DataFrame, signups: DataFrame,
                          horizon: String = "2 hours",
                          watermark: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    val su = signups
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user_id"),
        col("ts").as("signup_ts"))
      .withWatermark("signup_ts", watermark)
    p.join(su,
      col("user_id") === col("s_user_id") &&
        col("signup_ts") <= col("purchase_ts") &&
        col("signup_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("purchase_value"), col("signup_id"), col("signup_ts"))
  }

  /** Streaming funnel — the incremental twin of
    * [[graft.ops.AnalyticsQueries.funnel]] (signup → view → purchase,
    * each stage within [[graft.ops.AnalyticsQueries.funnelWindowHours]]
    * of the previous stage's timestamp). State per user is THREE
    * microsecond timestamps ([[FunnelAcc]], -1 = unreached), updated by
    * a single forward pass; an update row is emitted for a user only
    * when their funnel actually advances (update-mode sink — the live
    * conversion dashboard feed).
    *
    * Equivalence argument (proven against the batch twin in
    * EventStreamSpec): the batch query takes the MIN qualifying
    * timestamp per stage; processing a user's events in event-time
    * order makes the FIRST qualifying event that minimum — each stage
    * locks at the same instant the batch query computes. Within a
    * micro-batch rows are sorted by (ts, event_id) before the pass;
    * ACROSS batches the source must deliver a user's events in
    * event-time order (the same in-order contract the other
    * running-state twins document — a signup arriving late, after a
    * same-user view was already rejected, can under-report a conversion
    * the batch query would count).
    *
    * State is 3 longs per signed-up user, never timed out here because
    * the batch twin's funnel has no expiry either; a production deploy
    * bounds it with `GroupStateTimeout.EventTimeTimeout` once users
    * stop converting (the window caps how late a stage can qualify). */
  def funnelProgress(events: Dataset[Ev]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val windowUs = graft.ops.AnalyticsQueries.funnelWindowHours * 3600L * 1000000L
    def usOf(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def tsOf(us: Long): java.sql.Timestamp =
      if (us < 0) null
      else {
        val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        t
      }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelAcc, FunnelOut](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) { (uid, evs, state) =>
        val prev = state.getOption.getOrElse(FunnelAcc(-1L, -1L, -1L))
        var acc = prev
        // (ts, event_id) sort = the batch query's deterministic order;
        // per-user batch slices are small (bounded by a user's events in
        // one trigger), so the in-memory sort is safe
        for (e <- evs.toSeq.sortBy(e => (usOf(e.ts), e.event_id))) {
          val ts = usOf(e.ts)
          e.event_type match {
            case "signup" if acc.tSignup < 0 =>
              acc = acc.copy(tSignup = ts)
            case "view" if acc.tSignup >= 0 && acc.tView < 0 &&
              ts > acc.tSignup && ts <= acc.tSignup + windowUs =>
              acc = acc.copy(tView = ts)
            case "purchase" if acc.tView >= 0 && acc.tPurchase < 0 &&
              ts > acc.tView && ts <= acc.tView + windowUs =>
              acc = acc.copy(tPurchase = ts)
            case _ => ()
          }
        }
        if (acc == prev) Iterator.empty
        else {
          state.update(acc)
          val depth = if (acc.tPurchase >= 0) 3 else if (acc.tView >= 0) 2 else 1
          Iterator.single(FunnelOut(uid, tsOf(acc.tSignup), tsOf(acc.tView),
            tsOf(acc.tPurchase), depth))
        }
      }
  }

  /** Custom per-key state via `mapGroupsWithState`: running event count
    * and value total per user, updated each micro-batch. Emits the new
    * running total for every user seen in the batch (update-mode sink). */
  def runningUserTotals(events: Dataset[Ev]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          evs.foreach { e => n += 1; tot += e.value }
          val next = UserTotal(uid, n, math.rint(tot * 1e6) / 1e6)
          state.update(next)
          next
      }
  }

  /** Session assembly with EXPLICIT state + event-time timeout
    * (`flatMapGroupsWithState`): sessions close either when a same-user
    * event arrives past the gap (emitted immediately) or when the
    * watermark passes last_event + gap (the timeout callback fires and
    * flushes the open session). This is the arbitrary-state twin of the
    * native `session_window` operator ([[sessionAgg]]) — the shape to
    * reach for when per-session logic outgrows an aggregate (e.g. emit
    * enriched session records, cap session length, side outputs). State
    * per key is ONE open session; the timeout bound makes eviction
    * watermark-driven exactly like the native operator.
    *
    * Assumes per-key arrival is event-time ordered ACROSS batches (the
    * usual per-key-ordered source); a cross-batch out-of-order event can
    * split a session this operator already closed, where the native
    * [[sessionAgg]] would re-merge — prefer sessionAgg unless the
    * per-session logic genuinely needs arbitrary state. */
  def closedSessions(events: Dataset[Ev], gapMinutes: Int = 30,
                     watermark: String = "2 hours"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    def usOf(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (uid, evs, state) =>
        def close(a: SessionAcc) =
          ClosedSession(uid, tsOf(a.start), tsOf(a.last), a.n)
        if (state.hasTimedOut) {
          val out = state.getOption.map(close).toIterator
          state.remove()
          out
        } else {
          val sorted = evs.map(e => usOf(e.ts)).toVector.sorted
          var acc = state.getOption
          val closed = Vector.newBuilder[ClosedSession]
          sorted.foreach { t =>
            acc match {
              case Some(a) if t - a.last < gapUs =>
                acc = Some(a.copy(last = math.max(a.last, t), n = a.n + 1))
              case Some(a) =>
                closed += close(a)
                acc = Some(SessionAcc(t, t, 1))
              case None =>
                acc = Some(SessionAcc(t, t, 1))
            }
          }
          acc.foreach { a =>
            state.update(a)
            // timeout is millisecond-granular; round UP so it can never
            // fire before the exact micro-precise gap has elapsed
            state.setTimeoutTimestamp(Math.floorDiv(a.last + gapUs, 1000L) + 1L)
          }
          closed.result().iterator
        }
      }
  }

  /** [[runningUserTotals]] on Spark 4's NEW arbitrary-state API
    * (`transformWithState` + typed `ValueState` handles — the successor
    * to mapGroupsWithState: composable named state, TTL, timers, and a
    * RocksDB-backed store for state larger than executor heap). Same
    * semantics as the mapGroupsWithState twin; the spec pins both to the
    * batch aggregate. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def runningUserTotalsTws(events: Dataset[Ev]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).transformWithState(
      new RunningTotalProcessor,
      org.apache.spark.sql.streaming.TimeMode.None(),
      org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Streaming robust-outlier gate — the stream-static composition of
    * [[graft.ops.AnalyticsQueries.outlierMad]]: the (med, MAD) threshold
    * table is a BATCH artifact (refreshed offline, exactly how
    * production anomaly gates run), broadcast-joined to each micro-batch;
    * the flag compares UNROUNDED doubles with the identical expression
    * tree, so the streaming flagged set equals the batch operator's rows
    * exactly (EventStreamSpec). Per-batch cost: one broadcast join + a
    * scan-speed projection — no streaming state at all. */
  def outlierGate(events: DataFrame, thresholds: DataFrame): DataFrame = {
    import graft.ops.AnalyticsQueries.{madConsistency, madK}
    events.join(broadcast(thresholds), Seq("event_type"))
      .withColumn("absdev", abs(col("value") - col("med")))
      .filter(col("absdev") > lit(madK) * lit(madConsistency) * col("madf"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        round(col("absdev") / (lit(madConsistency) * col("madf")), 6)
          .as("robust_z"))
  }

  /** Streaming fixed-depth EWMA per user ([[EwmaProcessor]]) — append
    * mode: every event emits exactly one (event_id, ewma) row, bit-equal to
    * the batch `window_ewma` under the in-order delivery contract. */
  def streamingEwma(events: Dataset[Ev]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).transformWithState(
      new EwmaProcessor,
      org.apache.spark.sql.streaming.TimeMode.None(),
      org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Convenience: the batch events table cast to Dataset[Ev]. */
  def asEvents(spark: SparkSession, df: DataFrame): Dataset[Ev] = {
    import spark.implicits._
    df.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value")).as[Ev]
  }
}
