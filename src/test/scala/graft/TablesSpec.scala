package graft

import org.apache.spark.sql.functions._

/** Drift tripwire for the driver-provided testdata loaders.
  *
  * Round-7 lesson: the driver regenerated /root/testdata and events.ts
  * changed physical type (INT64 nanos → timestamp[us]), which the old
  * hard-coded loader turned into 50 opaque per-query analysis failures.
  * These tests pin (a) the loader tolerating every known ts flavor, (b)
  * the expected-schema map matching the live testdata, and (c) the
  * assertion producing ONE clear error naming the drifted column.
  */
class TablesSpec extends SparkSpec {

  test("live testdata matches expectedSchemas (no drift)") {
    val drift = Tables.checkSchemas(spark, sf)
    assert(drift.isEmpty, s"\n${drift.mkString("\n")}")
  }

  test("events.ts normalizes to session-TZ TimestampType at µs") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ev.filter(col("ts").isNull).count() == 0)
    // values are sane epoch-range timestamps, not misparsed nanos
    val yr = ev.agg(min(year(col("ts"))), max(year(col("ts"))))
      .collect()(0)
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100, yr.toString)
  }

  test("events loader handles INT64-nanos files (legacy testdata flavor)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/events.parquet"
    // Build a nanos-as-long file the way the legacy generator did:
    // INT64 column named ts holding nanos since epoch. Writing a plain
    // LongType column yields physical INT64, which the nanosAsLong read
    // path treats identically.
    val base = Tables.events(spark, sf).limit(100)
      .withColumn("ts", expr("unix_micros(ts) * 1000L"))
    base.write.mode("overwrite").parquet(path)
    val ev = Tables.events(spark, dir.getAbsolutePath)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val expect = Tables.events(spark, sf).limit(100)
      .agg(sum(unix_micros(col("ts")))).collect()(0).getLong(0)
    val got = ev.agg(sum(unix_micros(col("ts")))).collect()(0).getLong(0)
    assert(got == expect)
  }

  test("events loader reads a true TIMESTAMP(NANOS) file (conf fallback path)") {
    // a real parquet timestamp[ns] fixture (src/test/resources, written by
    // pyarrow): plain read throws ILLEGAL_PARQUET_TYPE, the loader turns
    // on nanosAsLong and re-reads as long — the r6-era testdata flavor
    val dir = java.nio.file.Files.createTempDirectory("graft-truenanos").toFile
    dir.deleteOnExit()
    val res = getClass.getResource("/events_nanos.parquet")
    assert(res != null, "missing events_nanos.parquet test fixture")
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"),
      java.nio.file.Paths.get(res.toURI))
    val ev = Tables.events(spark, dir.getAbsolutePath)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ev.count() === 50)
    // ns → µs truncation keeps the wall-clock value (2024-03-01T12:00:00.123456)
    val first = ev.orderBy("event_id")
      .selectExpr("date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS')")
      .collect()(0).getString(0)
    assert(first === "2024-03-01 12:00:00.123456", first)
  }

  test("assertSchemas names the drifted column in one error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toFile
    dir.deleteOnExit()
    // copy the real sf dir's parquet links except region, which we re-type
    for (n <- Tables.names if n != "region") {
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(dir.getAbsolutePath, s"$n.parquet"),
        java.nio.file.Paths.get(sf, s"$n.parquet"))
    }
    Tables.raw(spark, sf, "region")
      .withColumn("r_regionkey", col("r_regionkey").cast("string"))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/region.parquet")
    val e = intercept[IllegalStateException] {
      Tables.assertSchemas(spark, dir.getAbsolutePath)
    }
    assert(e.getMessage.contains("region.r_regionkey"), e.getMessage)
    assert(e.getMessage.contains("expected INT"), e.getMessage)
  }

  test("timestamp TZ-vs-NTZ flavor drift is tolerated as benign") {
    val ev = Tables.events(spark, sf)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    assert(Tables.schemaDrift("events", ev).isEmpty)
  }
}
