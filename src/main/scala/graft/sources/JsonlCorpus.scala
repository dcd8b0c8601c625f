package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) corpus interchange — the de-facto
  * format training corpora ship in. Mirrors the reference's record
  * reader/writer services (`JsonTreeReader`/`JsonRecordSetWriter`,
  * final_template.xml:1243-1380) as a FILE-level surface: schema-explicit
  * reads, size-bounded shard writes, and parse-failure ROUTING (NiFi
  * record readers route unparseable records to a failure relationship
  * rather than killing the flow — same policy here).
  *
  * Scale notes (100 TB):
  *  - Reads take an EXPLICIT schema. Schema inference is a full extra
  *    pass over every byte before the real job starts — never acceptable
  *    at corpus scale, and inferred types drift batch-to-batch.
  *  - `from_json` is a codegen'd expression: parse happens inside the
  *    scan stage, no shuffle. Malformed lines surface as a null struct
  *    and are split out with a filter, not an exception — one bad line in
  *    a billion must not kill the job (route-and-continue, audit later).
  *  - Writes bound shard size with `maxRecordsPerFile` so downstream
  *    loaders see uniform shards regardless of upstream partitioning.
  */
object JsonlCorpus {

  /** Write `docs` as JSONL shards under `dir` (one line per row,
    * ≤ `maxRecordsPerFile` rows per shard file). */
  def write(docs: DataFrame, dir: String, maxRecordsPerFile: Long = 100000L): Unit =
    docs
      .select(to_json(struct(docs.columns.map(col).toSeq: _*)).as("value"))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .text(dir)

  /** Read JSONL under `dir` with the given schema; malformed lines are
    * DROPPED (the common fast path — use [[readWithRejects]] to keep them). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    readWithRejects(spark, dir, schema)._1

  /** Read JSONL splitting good rows from reject lines. Returns
    * (parsed rows in schema order, raw reject lines as `line`). Detection
    * rides PERMISSIVE mode's corrupt-record column (an all-null struct is
    * NOT a reliable malformed signal — a legitimate all-null object looks
    * identical); rejects keep their raw text for auditing — the NiFi
    * parse-failure relationship. */
  def readWithRejects(spark: SparkSession, dir: String,
                      schema: StructType): (DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    require(!schema.fieldNames.contains(corrupt),
      s"schema must not already carry $corrupt")
    val parseSchema = schema.add(corrupt, "string")
    val raw = spark.read.text(dir)
      .withColumn("doc", from_json(col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt)))
    val isBad = col("doc").isNull || col(s"doc.$corrupt").isNotNull
    val good = raw.filter(!isBad).select("doc.*").drop(corrupt)
    val bad = raw.filter(isBad).select(col("value").as("line"))
    (good, bad)
  }
}
