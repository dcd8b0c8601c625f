package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC event model and the reference's restructuring operators, Spark-first.
  *
  * The reference tails a MySQL binlog with `CaptureChangeMySQL`
  * (reference: nifi/templates/final_template.xml:4100-4382) producing one
  * JSON document per row-change event with a `columns` array of
  * `{id,name,column_type,value}` structs, then:
  *   - routes by `cdc.event.type` (`RouteOnAttribute`, final_template.xml:1901-1983),
  *   - pivots the columns array into a flat object (Jolt shift
  *     `"columns":{"*":{"@(value)":"[#1].@(1,name)"}}`, final_template.xml:5160-5172).
  *
  * Here the event stream is just a DataFrame with this schema; the pivot is
  * `map_from_arrays` + field expansion (all whole-stage-codegen'd Catalyst
  * expressions — no per-event JSON re-parsing, no row-at-a-time transform).
  */
object Cdc {

  /** CDC event schema (FIXTURES.md §A.4). */
  val columnStruct: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = true),
    StructField("name", StringType, nullable = false),
    StructField("column_type", IntegerType, nullable = true),
    StructField("value", StringType, nullable = true)))

  val eventSchema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("database", StringType, nullable = true),
    StructField("table_name", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false),
    StructField("columns", ArrayType(columnStruct), nullable = true)))

  /** Event types the flow processes; delete/begin/commit/ddl are emitted by
    * the source but dropped by routing (reference README.md:28). The full
    * surface a binlog tail emits (reference final_template.xml:4325-4331)
    * is insert/update/delete row changes plus begin/commit transaction
    * markers and ddl statements; [[graft.sources.CdcSource]] synthesizes
    * all of them under its `fullEventLog` option. Note `Delete` equals
    * [[graft.scd2.Scd2.DeleteOp]], so `event_type` threads straight into
    * the delete-aware SCD2 merge as the op column. */
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  val Begin = "begin"
  val Commit = "commit"
  val Ddl = "ddl"
  val processedTypes: Seq[String] = Seq(Insert, Update)

  /** R1 `RouteOnAttribute`: multi-way route on the event-type column.
    * Returns the named relationships as filtered views of one scan —
    * Catalyst shares/prunes the underlying plan, so this is routing
    * without a NiFi-style queue per edge. */
  def route(events: DataFrame, eventType: Column = col("event_type")): Map[String, DataFrame] = Map(
    Insert -> events.filter(eventType === Insert),
    Update -> events.filter(eventType === Update),
    "unmatched" -> events.filter(!eventType.isin(processedTypes: _*)))

  /** T1/T2 Jolt-shift equivalent: pivot `columns` (array of {name,value})
    * into one flat column per field name. Column values are strings (the
    * binlog wire format); callers cast to the target schema with
    * [[castTo]]. Purely narrow — no shuffle. */
  def flatten(events: DataFrame, fields: Seq[String]): DataFrame = {
    val m = map_from_arrays(col("columns.name"), col("columns.value"))
    val flat = fields.map(f => m.getItem(f).as(f))
    // The Jolt shift replaces the event content entirely; envelope columns
    // survive only when they don't collide with a pivoted field name.
    val passthrough = events.columns
      .filterNot(c => c == "columns" || fields.contains(c)).map(col).toSeq
    events.select(passthrough ++ flat: _*)
  }

  /** Reference `Translate Field Names=true` (final_template.xml:1843-1844):
    * JDBC sinks match JSON field names to table columns case- and
    * underscore-insensitively. Explicit, tested equivalent: rename the
    * DataFrame's columns to the target schema's names under that
    * normalization. Unmatched fields are dropped (the sink's
    * `Ignore Unmatched Fields` policy). */
  def normalize(name: String): String = name.toLowerCase.replace("_", "")

  def translateFieldNames(df: DataFrame, target: Seq[String]): DataFrame = {
    val byNorm = target.map(t => normalize(t) -> t).toMap
    val cols = df.columns.toSeq.flatMap { c =>
      byNorm.get(normalize(c)).map(t => col(c).as(t))
    }
    df.select(cols: _*)
  }

  /** Cast the string-valued flattened CDC fields to a typed schema. */
  def castTo(df: DataFrame, schema: StructType): DataFrame = {
    val cols = schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq
    val passthrough = df.columns.filterNot(schema.fieldNames.contains)
      .map(col).toSeq
    df.select(passthrough ++ cols: _*)
  }

  /** BATCH CDC derivation — diff two snapshots of the same table into a
    * change set: the operator that GENERATES the event stream when no
    * binlog exists (periodic-snapshot sources). Full outer join on the
    * key; presence pattern decides insert/delete, a null-safe struct
    * compare over the non-key columns decides update vs noop; noops are
    * dropped. Old/new values ride as structs (callers flatten what they
    * need). One co-partitioned key shuffle — the minimum any diff pays;
    * at scale both snapshots bucketed by key make it shuffle-free. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val valCols = oldDf.columns.filterNot(keys.contains).toSeq
    require(newDf.columns.filterNot(keys.contains).toSeq == valCols,
      "snapshots must share one schema")
    def pack(df: DataFrame, side: String) = df.select(
      keys.map(col) ++ Seq(struct(valCols.map(col): _*).as(s"__$side"),
        lit(true).as(s"__in_$side")): _*)
    pack(oldDf, "old").join(pack(newDf, "new"), keys, "full_outer")
      .withColumn("op",
        when(col("__in_old").isNull, Insert)
          .when(col("__in_new").isNull, Delete)
          .when(!(col("__old") <=> col("__new")), Update)
          .otherwise("noop"))
      .filter(col("op") =!= "noop")
      .select(keys.map(col) ++ Seq(col("op"),
        col("__old").as("old"), col("__new").as("new")): _*)
  }

  /** Parse a binlog DDL statement for the one online schema evolution a
    * long-running CDC pipeline must absorb: `ALTER TABLE t ADD [COLUMN] c
    * TYPE ...`. The reference's source emits ddl events
    * (final_template.xml:4329-4331) and its flow drops them; here the
    * parsed (table, column, sparkType) lets a caller widen its flatten
    * field list mid-stream, and [[graft.streaming.Scd2Stream]] null-backfills
    * the history on the next micro-batch. Statements that aren't an
    * ADD COLUMN (or use a type we don't map) return None — the caller
    * keeps the reference's drop-ddl behavior for them. */
  def ddlAddColumn(statement: String): Option[(String, String, DataType)] =
    statement match {
      case AddColumnRe(table, column, typ) =>
        mysqlTypeToSpark(typ).map((table, column, _))
      case _ => None
    }

  private val AddColumnRe =
    """(?is)\s*ALTER\s+TABLE\s+[`"]?(\w+)[`"]?\s+ADD\s+(?:COLUMN\s+)?[`"]?(\w+)[`"]?\s+(\w+(?:\s*\([^)]*\))?(?:\s+unsigned)?).*""".r

  /** MySQL column type → Spark type, for the types the reference's table
    * uses (mysql/sql-scripts/02-table-creation.sql.txt) plus the common
    * binlog surface. `unsigned` integer modifiers widen to the next
    * signed type that holds the full range (int unsigned → long, bigint
    * unsigned → decimal(20,0)); `bit(1)` is a boolean but `bit(n>1)` is
    * an n-bit field (≤ 64 in MySQL) → long. */
  def mysqlTypeToSpark(mysqlType: String): Option[DataType] = {
    val t = mysqlType.toLowerCase.trim
    val unsigned = t.split('(').head.contains("unsigned") ||
      t.dropWhile(_ != ')').contains("unsigned")
    val base = t.takeWhile(c => c.isLetter)
    base match {
      case "tinyint" | "smallint" | "mediumint" =>
        Some(IntegerType) // unsigned still fits in int32
      case "int" | "integer" =>
        Some(if (unsigned) LongType else IntegerType)
      case "bigint" =>
        Some(if (unsigned) DecimalType(20, 0) else LongType)
      case "float" => Some(FloatType)
      case "double" | "real" => Some(DoubleType)
      case "decimal" | "numeric" =>
        val args = t.dropWhile(_ != '(').stripPrefix("(").takeWhile(_ != ')')
          .split(",").map(_.trim).filter(_.nonEmpty)
        args match {
          case Array(p, s) => Some(DecimalType(p.toInt, s.toInt))
          case Array(p) => Some(DecimalType(p.toInt, 0))
          case _ => Some(DecimalType(10, 0))
        }
      case "varchar" | "char" | "text" | "tinytext" | "mediumtext" |
           "longtext" | "enum" | "set" | "json" => Some(StringType)
      case "date" => Some(DateType)
      case "datetime" | "timestamp" => Some(TimestampType)
      case "boolean" | "bool" => Some(BooleanType)
      case "bit" =>
        val width = t.dropWhile(_ != '(').stripPrefix("(").takeWhile(_ != ')').trim
        if (width.nonEmpty && width.forall(_.isDigit) && width.toInt > 1)
          Some(LongType) // BIT(n>1): an n-bit field, not a flag
        else Some(BooleanType) // BIT / BIT(1)
      case "blob" | "tinyblob" | "mediumblob" | "longblob" | "binary" |
           "varbinary" => Some(BinaryType)
      case _ => None
    }
  }

  /** Debezium envelope schema for a given row schema — the standard public
    * CDC wire format the reference's `CaptureChangeMySQL` source plays the
    * role of (reference: nifi/templates/final_template.xml:4100-4382). A
    * Debezium MySQL record value carries `before`/`after` row images, an
    * `op` code (`c`reate / `u`pdate / `d`elete / `r`ead-snapshot), the
    * connector `source` block (db, table, binlog file/pos) and the event
    * `ts_ms`. Feed JSON through `from_json(col, debeziumSchema(rowSchema))`
    * and then [[fromDebezium]]. */
  def debeziumSchema(row: StructType): StructType = StructType(Seq(
    StructField("before", row, nullable = true),
    StructField("after", row, nullable = true),
    StructField("source", StructType(Seq(
      StructField("connector", StringType, nullable = true),
      StructField("db", StringType, nullable = true),
      StructField("table", StringType, nullable = true),
      StructField("file", StringType, nullable = true),
      StructField("pos", LongType, nullable = true),
      StructField("row", IntegerType, nullable = true))), nullable = true),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = true)))

  /** Adapter from a Debezium-enveloped change stream to [[eventSchema]]:
    * `c`/`r` → insert, `u` → update, `d` → delete; the row image is `after`
    * except for deletes (`before`); `seq` is the binlog position
    * (`source.pos`), `ts` the envelope `ts_ms`. Everything downstream
    * (route → flatten → SCD2 merge, batch or streaming) is wire-format
    * agnostic from here. Purely narrow — codegen'd projections, no
    * shuffle, safe on a streaming DataFrame. */
  def fromDebezium(df: DataFrame): DataFrame = {
    val rowT = df.schema("after").dataType.asInstanceOf[StructType]
    val image = when(col("op") === "d", col("before")).otherwise(col("after"))
    val cols = rowT.fields.zipWithIndex.map { case (f, i) =>
      struct(lit(i).as("id"), lit(f.name).as("name"),
        lit(0).as("column_type"),
        image.getField(f.name).cast(StringType).as("value"))
    }
    df.select(
      col("source.pos").as("seq"),
      when(col("op").isin("c", "r"), Insert)
        .when(col("op") === "u", Update)
        .when(col("op") === "d", Delete)
        .otherwise(col("op")).as("event_type"),
      col("source.db").as("database"),
      col("source.table").as("table_name"),
      timestamp_millis(col("ts_ms")).as("ts"),
      array(cols.toIndexedSeq: _*).as("columns"))
  }

  /** Build synthetic CDC events from a snapshot DataFrame: one event per
    * row, `columns` carrying every field as {name,value} strings. This is
    * the initial-snapshot path (`retrieve-all-records=true`,
    * final_template.xml:4321-4323) and the test-fixture generator. */
  def toEvents(snapshot: DataFrame, eventType: String, seqStart: Long,
               ts: Column, database: String = "sample_data",
               table: String = "products_catalog"): DataFrame = {
    val cols = snapshot.columns.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("id"), lit(c).as("name"),
        lit(0).as("column_type"), col(c).cast(StringType).as("value"))
    }
    snapshot.select(
      (monotonically_increasing_id() + lit(seqStart)).as("seq"),
      lit(eventType).as("event_type"),
      lit(database).as("database"),
      lit(table).as("table_name"),
      ts.as("ts"),
      array(cols.toIndexedSeq: _*).as("columns"))
  }
}
