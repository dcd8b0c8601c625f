package graft

import java.nio.file.Files
import java.util.Properties

import graft.scd2.Scd2
import graft.sources.JdbcHistory
import org.apache.spark.sql.functions._

/** SURVEY §2.8 `DBCPConnectionPool` parity: the SCD2 history append +
  * expiry round-trip through a REAL JDBC database (embedded Derby — the
  * in-JVM stand-in for the reference's MySQL pool), proven bit-for-bit
  * equal to the engine's parquet-path merge. */
class JdbcSpec extends SparkSpec {

  private def derbyUrl(): String = {
    val dir = Files.createTempDirectory("graft-derby")
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    s"jdbc:derby:$dir/db;create=true"
  }

  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  // Derby maps StringType to CLOB, which Derby cannot compare in WHERE —
  // pin the string columns to VARCHAR (the reference's DDL uses VARCHAR
  // too, mysql/sql-scripts/03-create-table.sql.txt)
  private val colTypes = "event_type VARCHAR(64), is_current VARCHAR(1)"

  private def ev = Tables.events(spark, sf)
    .select("user_id", "event_id", "event_type", "value", "ts")

  test("JDBC append+expiry round-trip equals the parquet-path merge bit-for-bit") {
    val mid = ev.agg(max(col("event_id"))).first().getLong(0) / 2
    val history = Scd2.fromEvents(ev.filter(col("event_id") <= mid),
      Seq("user_id"), "ts", "event_id")
    val batch = ev.filter(col("event_id") > mid)

    val url = derbyUrl()
    JdbcHistory.seed(history, url, "products_catalog_history", props,
      Some(colTypes))
    JdbcHistory.applyBatch(spark, url, "products_catalog_history", batch,
      Seq("user_id"), "ts", "event_id", props)

    val expect = Scd2.applyBatch(history, batch, Seq("user_id"), "ts",
      "event_id")
    val got = JdbcHistory.read(spark, url, "products_catalog_history", props)
      .select(expect.columns.map(col).toIndexedSeq: _*)
    assert(got.count() === expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    // the expiry really went through UPDATE: exactly one open row per key
    val opens = got.filter(col("is_current") === "Y")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(opens.filter(col("n") =!= 1).isEmpty)
  }

  test("JDBC merge honors LatePolicy: Error raises, Drop excludes late rows") {
    import spark.implicits._
    val history = Scd2.fromEvents(
      Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
          (1L, 2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))
        .toDF("user_id", "event_id", "ts"),
      Seq("user_id"), "ts", "event_id")
    val late = Seq(
      (1L, 3L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00")), // LATE
      (1L, 4L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00")))
      .toDF("user_id", "event_id", "ts")

    val url = derbyUrl()
    JdbcHistory.seed(history, url, "hist", props, Some("is_current VARCHAR(1)"))
    intercept[Exception] {
      JdbcHistory.applyBatch(spark, url, "hist", late,
        Seq("user_id"), "ts", "event_id", props)
    }
    val url2 = derbyUrl()
    JdbcHistory.seed(history, url2, "hist", props, Some("is_current VARCHAR(1)"))
    JdbcHistory.applyBatch(spark, url2, "hist", late,
      Seq("user_id"), "ts", "event_id", props, Scd2.LatePolicy.Drop)
    val got = JdbcHistory.read(spark, url2, "hist", props)
    assert(got.count() === 3) // event 3 dropped
    assert(got.filter(col("event_id") === 3L).isEmpty)
    val open = got.filter(col("is_current") === "Y")
    assert(open.count() === 1 && open.first().getLong(1) === 4L)
  }

  test("JDBC delete events close intervals like the parquet merge, bit-for-bit") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val history = Scd2.fromEvents(
      Seq((1L, 1L, t("2024-01-01 10:00:00"), 5.0),
          (2L, 2L, t("2024-01-01 10:30:00"), 7.0))
        .toDF("user_id", "event_id", "ts", "value"),
      Seq("user_id"), "ts", "event_id")
    // key 1: delete then re-insert (interval chains through the delete);
    // key 2: update then delete (ends with NO current row)
    val batch = Seq(
      (1L, 3L, t("2024-01-01 11:00:00"), 0.0, "delete"),
      (1L, 4L, t("2024-01-01 12:00:00"), 6.0, "insert"),
      (2L, 5L, t("2024-01-01 11:30:00"), 8.0, "update"),
      (2L, 6L, t("2024-01-01 13:00:00"), 0.0, "delete"))
      .toDF("user_id", "event_id", "ts", "value", "op")

    val url = derbyUrl()
    JdbcHistory.seed(history, url, "hist", props, Some("is_current VARCHAR(1)"))
    JdbcHistory.applyBatchWithDeletes(spark, url, "hist", batch,
      Seq("user_id"), "ts", "event_id", "op", props)

    val expect = Scd2.applyBatchWithDeletes(history, batch,
      Seq("user_id"), "ts", "event_id", "op")
    val got = JdbcHistory.read(spark, url, "hist", props)
      .select(expect.columns.map(col).toIndexedSeq: _*)
    assert(got.count() === expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    // key 2's trailing delete leaves it with no open row; key 1 re-opened
    val open = got.filter(col("is_current") === "Y")
    assert(open.count() === 1 && open.select("user_id").first().getLong(0) === 1L)
    // and the delete events themselves never became version rows
    assert(got.filter(col("event_id").isin(3L, 6L)).isEmpty)
  }

  test("JDBC ADD COLUMN evolution matches the parquet typed-null widening") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val history = Scd2.fromEvents(
      Seq((1L, 1L, t("2024-01-01 10:00:00"), 5.0))
        .toDF("user_id", "event_id", "ts", "value"),
      Seq("user_id"), "ts", "event_id")
    // upstream ALTER TABLE ADD COLUMN note: the batch carries a column
    // the live table lacks
    val batch = Seq(
      (1L, 2L, t("2024-01-01 11:00:00"), 6.0, "hello"),
      (2L, 3L, t("2024-01-01 12:00:00"), 9.0, "world"))
      .toDF("user_id", "event_id", "ts", "value", "note")

    val url = derbyUrl()
    JdbcHistory.seed(history, url, "hist", props, Some("is_current VARCHAR(1)"))
    val added = JdbcHistory.evolveSchema(spark, url, "hist", batch, props,
      Map("note" -> "VARCHAR(32)"), // Derby CLOB caveat, as in seed
      exclude = Seq("ts")) // tsCol is merge input, not a table column
    assert(added === Seq("note"))
    // idempotent: a second call sees the column and adds nothing
    assert(JdbcHistory.evolveSchema(spark, url, "hist", batch, props,
      exclude = Seq("ts")).isEmpty)
    JdbcHistory.applyBatch(spark, url, "hist", batch,
      Seq("user_id"), "ts", "event_id", props)

    val expect = Scd2.applyBatch(
      history.withColumn("note", lit(null).cast("string")), batch,
      Seq("user_id"), "ts", "event_id")
    val got = JdbcHistory.read(spark, url, "hist", props)
      .select(expect.columns.map(col).toIndexedSeq: _*)
    assert(got.count() === expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    // pre-evolution rows read back with the typed-null backfill
    assert(got.filter(col("event_id") === 1L && col("note").isNotNull).isEmpty)
  }

  test("expiry UPDATE quotes identifiers per the connection's dialect") {
    // MySQL's default sql_mode reads ANSI double-quoted tokens as string
    // literals — the UPDATE must use backticks there (ADVICE r4); ANSI
    // databases (Derby here) get standard double quotes
    val mysql = JdbcHistory.expiryUpdateSql(
      "jdbc:mysql://db:3306/meta", "products_catalog_history", Seq("ProductID"))
    assert(mysql.contains("`ProductID` = ?") && mysql.contains("`is_current`"),
      s"MySQL dialect must backtick-quote:\n$mysql")
    assert(!mysql.contains("\""), s"no ANSI quotes on MySQL:\n$mysql")
    val derby = JdbcHistory.expiryUpdateSql(
      "jdbc:derby:/tmp/db", "hist", Seq("user_id"))
    assert(derby.contains("\"user_id\" = ?") && derby.contains("\"is_current\""),
      s"ANSI dialect must double-quote:\n$derby")
  }

  test("current-rows read pushes the is_current predicate into the database") {
    val url = derbyUrl()
    val history = Scd2.fromEvents(
      ev.filter(col("event_id") <= 100), Seq("user_id"), "ts", "event_id")
    JdbcHistory.seed(history, url, "hist", props, Some(colTypes))
    val plan = Scd2.current(JdbcHistory.read(spark, url, "hist", props))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("is_current"),
      s"predicate not pushed into JDBC scan:\n$plan")
  }
}
