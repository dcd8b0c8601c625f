package graft

import graft.ops.Scd2Queries
import graft.scd2.Scd2
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {

  test("entry reproduces the reference README probe: 4 history rows, correct SCD2 state") {
    val hist = SparkEntry.entry(spark).cache()
    assert(hist.count() === 4)
    // exactly one current row per key
    val perKey = hist.filter(col("is_current") === "Y")
      .groupBy("ProductID").count().collect()
    assert(perKey.forall(_.getLong(1) == 1L) && perKey.length == 3)
    // 9014: v1 expired at v2's valid_from, v2 current with Price=100
    val v9014 = hist.filter(col("ProductID") === 9014)
      .orderBy("valid_from").collect()
    assert(v9014.length === 2)
    val (old, cur) = (v9014(0), v9014(1))
    assert(old.getAs[String]("is_current") === "N")
    assert(old.getAs[java.sql.Timestamp]("valid_until") ===
      cur.getAs[java.sql.Timestamp]("valid_from"))
    assert(cur.getAs[String]("is_current") === "Y")
    assert(cur.getAs[java.sql.Timestamp]("valid_until") === null)
    assert(cur.getAs[Double]("Price") === 100.0)
    assert(old.getAs[Double]("Price") === 56.0)
  }

  test("applyBatch over a split log equals full reconstruction") {
    val full = Scd2Queries.scd2Snapshot(spark, sf)
    val merged = Scd2Queries.scd2ApplyBatch(spark, sf)
    assert(merged.count() === full.count())
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("SCD2 invariants: one current row per key; intervals chain") {
    val snap = Scd2Queries.scd2Snapshot(spark, sf).cache()
    val bad = snap.filter(col("is_current") === "Y")
      .groupBy("user_id").count().filter(col("count") =!= 1)
    assert(bad.isEmpty)
    // each non-current row's valid_until equals the successor's valid_from
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    val chained = snap.withColumn("next_from", lead(col("valid_from"), 1).over(w))
    assert(chained.filter(
      (col("is_current") === "N" && (col("valid_until") =!= col("next_from"))) ||
      (col("is_current") === "Y" && col("valid_until").isNotNull)).isEmpty)
  }

  test("late events: Error fails loudly, Drop excludes them, lateEvents routes them") {
    import spark.implicits._
    def ts(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_seconds(col("tsr"))).drop("tsr")
    // history: key 1 has versions at t=5 (expired) and t=10 (open)
    val hist = Scd2.fromEvents(
      ts(Seq((1, 5L, 0L, 1.0), (1, 10L, 1L, 2.0)).toDF("key", "tsr", "seq", "v")),
      Seq("key"), "ts", "seq")
    // batch: key 1 at t=7 — LATE (open row began at t=10); key 2 at t=3 —
    // fine (no open row for a fresh key)
    val batch = ts(Seq((1, 7L, 2L, 3.0), (2, 3L, 3L, 4.0)).toDF("key", "tsr", "seq", "v"))
    // lateEvents captures exactly the late row (the late-event routing path)
    val late = Scd2.lateEvents(hist, batch, Seq("key"), "ts").collect()
    assert(late.map(_.getAs[Long]("seq")).toSeq === Seq(2L))
    // default policy: fail the job loudly with a descriptive message
    val ex = intercept[Exception] {
      Scd2.applyBatch(hist, batch, Seq("key"), "ts", "seq").collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("SCD2 late event"), s"unexpected error: $msgs")
    // Drop: late row excluded, on-time rows merged; key 1's open row stays open
    val dropped = Scd2.applyBatch(hist, batch, Seq("key"), "ts", "seq",
      onLate = Scd2.LatePolicy.Drop).cache()
    assert(dropped.count() === 3)
    assert(dropped.filter(col("key") === 1 && col("is_current") === "Y")
      .select("valid_from").first().getTimestamp(0).getTime === 10000L)
    // Allow: documented-unsafe passthrough still keeps one current row per key
    val allowed = Scd2.applyBatch(hist, batch, Seq("key"), "ts", "seq",
      onLate = Scd2.LatePolicy.Allow).cache()
    assert(allowed.count() === 4)
    assert(allowed.filter(col("is_current") === "Y").groupBy("key").count()
      .collect().forall(_.getLong(1) === 1L))
  }

  test("deletes close intervals, re-inserts reopen; batch merge equals one-shot") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value", "ts")
      .withColumn("op",
        when(col("event_type") === "logout", Scd2.DeleteOp).otherwise("update"))
    val oneShot = Scd2.fromEventsWithDeletes(ev, Seq("user_id"), "ts", "event_id", "op")
      .drop("op").cache()
    // a key whose LAST event is a delete has no current row; all others one
    val lastOp = ev.withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1).select(col("user_id"), col("op").as("last_op"))
    val currentPerKey = oneShot.filter(col("is_current") === "Y")
      .groupBy("user_id").count()
    val joined = lastOp.join(currentPerKey, Seq("user_id"), "left")
    assert(joined.filter(col("last_op") === Scd2.DeleteOp &&
      col("count").isNotNull).isEmpty, "deleted keys must have no current row")
    assert(joined.filter(col("last_op") =!= Scd2.DeleteOp &&
      (col("count").isNull || col("count") =!= 1)).isEmpty)
    assert(oneShot.count() === ev.filter(col("op") =!= Scd2.DeleteOp).count())
    // split-merge equivalence (batches are event-time monotone by event_id)
    val mid = ev.agg(max(col("event_id"))).first().getLong(0) / 2
    val hist = Scd2.fromEventsWithDeletes(ev.filter(col("event_id") <= mid),
      Seq("user_id"), "ts", "event_id", "op").drop("op")
    val merged = Scd2.applyBatchWithDeletes(hist, ev.filter(col("event_id") > mid),
      Seq("user_id"), "ts", "event_id", "op")
    assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty)
  }

  test("routing partitions the stream: insert+update+unmatched = all") {
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val parts = Seq("route_insert", "route_update", "route_unmatched")
      .map(q => Scd2Queries.queries(q)(spark, sf).count())
    assert(parts.sum === n)
  }

  test("flatten pivot round-trips the snapshot") {
    val flat = Scd2Queries.cdcFlattenPivot(spark, sf)
    assert(flat.count() === Tables.events(spark, sf).count())
    assert(flat.columns.toSeq === Seq("event_id", "user_id", "event_type"))
  }
}
