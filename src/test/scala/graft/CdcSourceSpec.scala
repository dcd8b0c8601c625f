package graft

import graft.cdc.{Cdc, ProductsFixture}
import graft.scd2.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The `graft-cdc` DataSource V2 source: batch and micro-batch read paths
  * must agree, admission control must bound micro-batches, and the stream
  * must drive the SCD2 merge end-to-end (the reference's whole pipeline,
  * source included, in one test). */
class CdcSourceSpec extends SparkSpec {

  private val total = 250L
  private val products = 40

  private def opts(df: org.apache.spark.sql.DataFrameReader) = df
    .format("graft-cdc")
    .option("rows", total)
    .option("products", products)

  private def flatten(events: DataFrame): DataFrame =
    Cdc.castTo(Cdc.flatten(events, ProductsFixture.schema.fieldNames.toSeq),
      ProductsFixture.schema)

  test("batch read: deterministic snapshot-then-updates event log") {
    val ev = opts(spark.read).load()
    assert(ev.schema === Cdc.eventSchema)
    assert(ev.count() === total)
    // first `products` events are the initial snapshot (inserts), rest updates
    assert(ev.filter(col("event_type") === "insert").count() === products)
    assert(ev.filter(col("event_type") === "update").count() === total - products)
    val seqs = ev.select("seq").collect().map(_.getLong(0)).sorted
    assert(seqs === (0L until total).toArray)
    // payload flattens + casts cleanly to the products schema
    val flat = flatten(ev)
    assert(flat.filter(col("ProductID").isNull || col("Price").isNull).isEmpty)
  }

  test("micro-batch stream equals batch read; admission control bounds batches") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-cdc-src").toString
    val q = spark.readStream
      .format("graft-cdc")
      .option("rows", total).option("products", products)
      .option("maxEventsPerTrigger", 100)
      .load()
      .writeStream.format("memory").queryName("cdc_stream")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cdc_stream")
    assert(streamed.count() === total)
    // ≥3 micro-batches of ≤100 events (the MAX_EVENTS_PER_FLOWFILE analog)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3)
    assert(batches.forall(_.numInputRows <= 100))
    val batch = opts(spark.read).load()
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("full streaming pipeline: graft-cdc source -> flatten -> bucketed SCD2 sink") {
    import graft.streaming.Scd2Stream
    val tmp = Files.createTempDirectory("graft-cdc-e2e").toString
    val histDir = s"$tmp/history"
    val stream = spark.readStream
      .format("graft-cdc")
      .option("rows", total).option("products", products)
      .option("maxEventsPerTrigger", 60)
      .load()
    val q = flatten(stream).withColumnRenamed("seq", "event_seq")
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Scd2Stream.applyMicroBatchBucketed(spark, batch, histDir,
          Seq("ProductID"), "ts", "event_seq", nBuckets = 8,
          batchId = Some(id))
      }
      .start()
    q.processAllAvailable(); q.stop()
    val hist = Scd2Stream.readBucketed(spark, histDir)
    val oneShot = Scd2.fromEvents(
      flatten(opts(spark.read).load()).withColumnRenamed("seq", "event_seq"),
      Seq("ProductID"), "ts", "event_seq")
    assert(hist.count() === total)
    assert(hist.exceptAll(oneShot).isEmpty && oneShot.exceptAll(hist).isEmpty)
  }

  test("full-log stream: route drops ddl/begin/commit, deletes close intervals through the bucketed sink") {
    // r3 advice #5: the reference's WHOLE §3 lifecycle — full binlog
    // surface included — in one streaming composition: fullEventLog V2
    // source → route (markers out) → flatten → delete-aware bucketed merge
    import graft.streaming.Scd2Stream
    val tmp = Files.createTempDirectory("graft-cdc-full").toString
    val histDir = s"$tmp/history"
    val rowChanges = Seq(Cdc.Insert, Cdc.Update, Cdc.Delete)
    val q = spark.readStream
      .format("graft-cdc")
      .option("rows", total).option("products", products)
      .option("fullEventLog", true)
      .option("maxEventsPerTrigger", 60)
      .load()
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val routed = Cdc.route(batch)
        val changes = routed(Cdc.Insert)
          .unionByName(routed(Cdc.Update))
          .unionByName(batch.filter(col("event_type") === Cdc.Delete))
        Scd2Stream.applyMicroBatchBucketed(spark,
          flatten(changes).withColumnRenamed("seq", "event_seq"), histDir,
          Seq("ProductID"), "ts", "event_seq", nBuckets = 8,
          batchId = Some(id), opCol = Some("event_type"))
      }
      .start()
    q.processAllAvailable(); q.stop()

    val full = opts(spark.read).option("fullEventLog", true).load()
    // the synthetic log really exercises the whole binlog event surface
    val types = full.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types === Set(Cdc.Insert, Cdc.Update, Cdc.Delete,
      Cdc.Begin, Cdc.Commit, Cdc.Ddl))
    val flatFull = flatten(full.filter(col("event_type").isin(rowChanges: _*)))
      .withColumnRenamed("seq", "event_seq")
    assert(flatFull.filter(col("event_type") === Cdc.Delete).count() > 0)
    val oneShot = Scd2.fromEventsWithDeletes(flatFull, Seq("ProductID"),
      "ts", "event_seq", "event_type").drop("event_type")
    val hist = Scd2Stream.readBucketed(spark, histDir)
    assert(hist.count() === oneShot.count())
    assert(hist.exceptAll(oneShot).isEmpty && oneShot.exceptAll(hist).isEmpty)
    // delete-closed keys have NO current row; every other key exactly one
    val lastOp = flatFull
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("ProductID")
          .orderBy(col("ts").desc, col("event_seq").desc)))
      .filter(col("rn") === 1)
    val deletedKeys = lastOp.filter(col("event_type") === Cdc.Delete).count()
    val liveKeys = lastOp.count() - deletedKeys
    assert(deletedKeys > 0, "fixture must end at least one key on a delete")
    assert(hist.filter(col("is_current") === "Y").count() === liveKeys)
  }

  test("cdc source -> flatten -> SCD2 merge end-to-end keeps invariants") {
    val hist = Scd2.fromEvents(
      flatten(opts(spark.read).load())
        .withColumnRenamed("seq", "event_seq"),
      Seq("ProductID"), "ts", "event_seq")
    // one current row per product; version count = events per product
    val current = hist.filter(col("is_current") === "Y")
    assert(current.count() === products)
    assert(hist.count() === total)
    // the current row carries the newest price (highest version)
    val expected = (total - 1) / products * 10.0 // version gap for product 9000+...
    val p0 = current.filter(col("ProductID") === 9000)
      .select("Price").head().getDouble(0)
    assert(p0 === 50.0 + expected)
  }
}
