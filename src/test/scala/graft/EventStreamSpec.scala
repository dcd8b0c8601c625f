package graft

import graft.ops.AnalyticsQueries
import graft.streaming.{Ev, EventStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming analytics operators driven through real StreamingQueries
  * (MemoryStream source, memory sink): the streaming results must agree
  * with their batch twins over the same data. */
class EventStreamSpec extends SparkSpec {

  private def evRows(limit: Long): Seq[Ev] = {
    Tables.events(spark, sf)
      .filter(col("event_id") <= limit)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .toIndexedSeq
  }

  private def ckpt(): String =
    Files.createTempDirectory("graft-es").toString

  test("streaming windowed agg (complete mode) equals the batch window agg") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.windowedAgg(mem.toDF())
      .writeStream.format("memory").queryName("wagg")
      .outputMode("complete").option("checkpointLocation", ckpt()).start()
    val rows = evRows(2000)
    mem.addData(rows.take(1000))
    mem.addData(rows.drop(1000))
    q.processAllAvailable(); q.stop()
    val got = spark.table("wagg")
    val want = Tables.events(spark, sf).filter(col("event_id") <= 2000)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming sliding windows equal the batch sliding agg (4× overlap)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.slidingAgg(mem.toDF())
      .writeStream.format("memory").queryName("slagg")
      .outputMode("complete").option("checkpointLocation", ckpt()).start()
    val rows = evRows(2000)
    mem.addData(rows.take(1000))
    mem.addData(rows.drop(1000))
    q.processAllAvailable(); q.stop()
    val got = spark.table("slagg")
    val want = Tables.events(spark, sf).filter(col("event_id") <= 2000)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // every tumbling hour appears as 4 overlapping sliding windows
    val perStartTum = Tables.events(spark, sf).filter(col("event_id") <= 2000)
      .select(window(col("ts"), "1 hour").as("w")).distinct().count()
    val perStartSlide = got.select("window_start").distinct().count()
    assert(perStartSlide > perStartTum, "sliding must emit more window starts")
  }

  test("streaming session windows equal the batch sessionize boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.sessionAgg(mem.toDF())
      .writeStream.format("memory").queryName("sagg")
      .outputMode("complete").option("checkpointLocation", ckpt()).start()
    mem.addData(evRows(1500))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sagg")
    val want = Tables.events(spark, sf).filter(col("event_id") <= 1500)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming dedup drops in-horizon duplicate event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.dedup(mem.toDF())
      .writeStream.format("memory").queryName("dedupq")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    val rows = evRows(300)
    mem.addData(rows)
    mem.addData(rows) // exact replay: at-least-once source
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedupq")
    assert(got.count() === rows.size)
    assert(got.select("event_id").distinct().count() === rows.size)
  }

  test("stream-static lookup join (J1 streaming) equals the batch left join; misses stay null") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = evRows(1500)
    // static current-dimension: a segment per user for 2/3 of users
    val dim = Tables.events(spark, sf).select(col("user_id")).distinct()
      .filter(col("user_id") % 3 =!= 0)
      .withColumn("segment", concat(lit("seg-"), pmod(col("user_id"), lit(5))))
    val mem = MemoryStream[Ev]
    val q = EventStream.lookupEnrich(mem.toDF(), dim)
      .writeStream.format("memory").queryName("lkpq")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    mem.addData(rows.take(rows.size / 2))
    q.processAllAvailable()
    mem.addData(rows.drop(rows.size / 2))
    q.processAllAvailable(); q.stop()
    val got = spark.table("lkpq")
    val want = Tables.events(spark, sf).filter(col("event_id") <= 1500)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
    assert(got.count() === rows.size, "left join preserves every event")
    assert(got.filter(col("user_id") % 3 === 0 && col("segment").isNotNull).isEmpty,
      "dimension misses must surface as nulls (the unmatched route)")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("stream-stream time-range join equals the batch join over the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memP = MemoryStream[Ev]
    val memS = MemoryStream[Ev]
    val q = EventStream.purchaseAfterSignup(memP.toDF(), memS.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    val rows = evRows(2000)
    val purchases = rows.filter(_.event_type == "purchase")
    val signups = rows.filter(_.event_type == "signup")
    // two micro-batches per side, interleaved arrival
    memP.addData(purchases.take(purchases.size / 2))
    memS.addData(signups.take(signups.size / 2))
    q.processAllAvailable()
    memP.addData(purchases.drop(purchases.size / 2))
    memS.addData(signups.drop(signups.size / 2))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssjoin")
    val ev = Tables.events(spark, sf).filter(col("event_id") <= 2000)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val su = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user_id"),
        col("ts").as("signup_ts"))
    val want = p.join(su,
      col("user_id") === col("s_user_id") &&
        col("signup_ts") <= col("purchase_ts") &&
        col("signup_ts") >= col("purchase_ts") - expr("INTERVAL 2 hours"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("purchase_value"), col("signup_id"), col("signup_ts"))
    assert(want.count() > 0, "fixture must produce at least one joined pair")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("flatMapGroupsWithState closed sessions equal the batch session boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.closedSessions(mem.toDS())
      .writeStream.format("memory").queryName("csess")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    val rows = evRows(1500)
    val (b1, b2) = rows.splitAt(700)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    // two sentinel batches: the first advances the watermark past every
    // open session's timeout, the second triggers the timeout callbacks
    // (watermark for batch N is computed from batch N-1)
    val maxTs = rows.map(_.ts.getTime).max
    Seq(10, 11).foreach { h =>
      mem.addData(Seq(Ev(-h.toLong, new java.sql.Timestamp(maxTs + h * 3600L * 1000L),
        -1L, "sentinel", 0.0)))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("csess").filter(col("user_id") =!= -1L)
    val want = Tables.events(spark, sf).filter(col("event_id") <= 1500)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("last_event"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "last_event", "n_events")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("transformWithState (new arbitrary-state API) matches the batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val q = EventStream.runningUserTotalsTws(mem.toDS())
        .writeStream.format("memory").queryName("twstotals")
        .outputMode("update").option("checkpointLocation", ckpt()).start()
      val rows = evRows(1000)
      val (b1, b2) = rows.splitAt(500)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      q.stop()
      val got = spark.table("twstotals")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"))
            .orderBy(col("n_events").desc)))
        .filter(col("rn") === 1)
        .select("user_id", "n_events")
      val want = Tables.events(spark, sf).filter(col("event_id") <= 1000)
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      assert(got.count() === want.count())
      assert(got.exceptAll(want).isEmpty)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming EWMA is bit-equal to the batch window_ewma across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // event-time-ordered delivery (the documented in-order contract);
      // split mid-stream so per-user state must survive a batch boundary
      def usOf(t: java.sql.Timestamp): Long =
        t.getTime / 1000 * 1000000 + t.getNanos / 1000
      val rows = evRows(1000).sortBy(e => (usOf(e.ts), e.event_id))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val mem = MemoryStream[Ev]
      val q = EventStream.streamingEwma(mem.toDS())
        .writeStream.format("memory").queryName("sewma")
        .outputMode("append").option("checkpointLocation", ckpt()).start()
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      q.stop()
      val got = spark.table("sewma").select("event_id", "ewma")
      val want = graft.ops.AnalyticsQueries.windowEwmaOf(
        Tables.events(spark, sf).filter(col("event_id") <= 1000))
        .select("event_id", "ewma")
      assert(got.count() === want.count())
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "streaming EWMA must reproduce the batch window bit-for-bit")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming outlier gate equals the batch MAD operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val th = graft.ops.AnalyticsQueries.madThresholds(
      Tables.events(spark, sf).select(col("event_type"), col("value")))
    val mem = MemoryStream[Ev]
    val q = EventStream.outlierGate(mem.toDF(), th)
      .writeStream.format("memory").queryName("ogate")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    val rows = evRows(Long.MaxValue)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("ogate")
    val want = graft.ops.AnalyticsQueries.queries("outlier_mad")(spark, sf)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream-static gate must flag exactly the batch outlier set")
  }

  test("mapGroupsWithState accumulates running user totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").option("checkpointLocation", ckpt()).start()
    val rows = evRows(1000)
    val (b1, b2) = rows.splitAt(500)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()
    // latest state per user must equal the one-shot batch aggregate
    val got = spark.table("totals")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("n_events").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "n_events")
    val want = Tables.events(spark, sf).filter(col("event_id") <= 1000)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty)
  }

  test("streaming funnel final state equals the batch funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // event-time-ordered feed (the operator's documented in-order
    // contract), split mid-stream so stages lock across batch boundaries
    val rows = evRows(Long.MaxValue).sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Ev]
    val q = EventStream.funnelProgress(mem.toDS())
      .writeStream.format("memory").queryName("funq")
      .outputMode("update").option("checkpointLocation", ckpt()).start()
    mem.addData(rows.take(rows.size / 3))
    q.processAllAvailable()
    mem.addData(rows.slice(rows.size / 3, 2 * rows.size / 3))
    q.processAllAvailable()
    mem.addData(rows.drop(2 * rows.size / 3))
    q.processAllAvailable(); q.stop()
    // per-user emissions carry strictly increasing stage_depth, so the
    // max-depth row is the final state
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("stage_depth").desc)
    val got = spark.table("funq")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "t_signup", "t_view", "t_purchase", "stage_depth")
    val want = AnalyticsQueries.queries("funnel")(spark, sf)
      .select(col("user_id"), col("t_signup"), col("t_view"),
        col("t_purchase"), col("stage_depth").cast("int"))
    assert(got.count() === want.count(), "one final row per signed-up user")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "incremental stage locks must equal the batch min-per-stage funnel")
  }
}
