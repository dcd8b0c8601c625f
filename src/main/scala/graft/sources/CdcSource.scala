package graft.sources

import java.util

import graft.cdc.Cdc
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-cdc`: a DataSource V2 CDC event source — the Spark-native
  * re-expression of the reference's `CaptureChangeMySQL` binlog tail
  * (reference: nifi/templates/final_template.xml:4100-4382).
  *
  * What maps to what:
  *  - binlog position persisted in a DistributedMapCache
  *    (final_template.xml:1510-1519, 4317-4318) → the streaming offset
  *    log: offsets here are plain event sequence numbers, serialized to
  *    the checkpoint by the engine — restart resumes exactly where the
  *    last committed batch ended;
  *  - `MAX_EVENTS_PER_FLOWFILE` / 200 ms poll (final_template.xml:4294-4299,
  *    4363) → [[ReadLimit]] admission control: `maxEventsPerTrigger`
  *    bounds each micro-batch;
  *  - `retrieve-all-records=true` initial snapshot (final_template.xml:
  *    4321-4323) → the first `products` events are `insert`s (one per
  *    product), everything after is an `update` — same shape the binlog
  *    replay would produce;
  *  - one JSON doc per row-change with a `columns` array of {name,value}
  *    → rows of [[Cdc.eventSchema]], ready for `Cdc.flatten`.
  *
  * The event payload is a deterministic function of the sequence number
  * (seeded product catalog), so tests and both read paths (batch +
  * micro-batch) agree bit-for-bit. Partition planning splits the offset
  * range evenly — each executor synthesizes its slice independently, no
  * driver materialization, no shuffle.
  *
  * Options: `rows` (total events), `products` (catalog size),
  * `maxEventsPerTrigger` (admission cap), `numPartitions`,
  * `fullEventLog` (default false: insert/update only — the surface the
  * reference flow processes; true: the surface the binlog tail EMITS,
  * reference final_template.xml:4325-4331 — begin/commit transaction
  * markers every `txSize` row changes, a leading ddl event, and periodic
  * delete row-changes. Downstream, `Cdc.route` sends begin/commit/ddl to
  * `unmatched` and the delete-aware SCD2 merge consumes `event_type` as
  * its op column), `txSize` (row changes per begin/commit pair).
  */
class CdcSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Cdc.eventSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CdcTable(new CaseInsensitiveStringMap(properties))
}

private[sources] class CdcTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft-cdc"
  override def schema(): StructType = Cdc.eventSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val conf = CdcConf(
      rows = opts.getLong("rows", 1000L),
      products = opts.getInt("products", 100),
      maxPerTrigger = opts.getLong("maxEventsPerTrigger", 1000L),
      numPartitions = opts.getInt("numPartitions", 4),
      fullLog = opts.getBoolean("fullEventLog", false),
      txSize = opts.getInt("txSize", 10))
    () => new CdcScan(conf)
  }
}

private[sources] case class CdcConf(rows: Long, products: Int,
                                    maxPerTrigger: Long, numPartitions: Int,
                                    fullLog: Boolean = false, txSize: Int = 10)

private[sources] class CdcScan(conf: CdcConf) extends Scan {
  override def readSchema(): StructType = Cdc.eventSchema
  override def description(): String = s"graft-cdc(rows=${conf.rows})"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      CdcSource.splitRange(0L, conf.rows, conf.numPartitions)
    override def createReaderFactory(): PartitionReaderFactory =
      CdcReaderFactory(conf.products, conf.fullLog, conf.txSize)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(conf)
}

private[sources] case class CdcOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class CdcMicroBatchStream(conf: CdcConf)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = CdcOffset(0L)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(conf.maxPerTrigger)

  override def latestOffset(): Offset = CdcOffset(conf.rows)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CdcOffset].n
    val cap = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => conf.maxPerTrigger
    }
    CdcOffset(math.min(from + cap, conf.rows))
  }

  override def reportLatestOffset(): Offset = CdcOffset(conf.rows)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    CdcSource.splitRange(start.asInstanceOf[CdcOffset].n,
      end.asInstanceOf[CdcOffset].n, conf.numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    CdcReaderFactory(conf.products, conf.fullLog, conf.txSize)

  override def deserializeOffset(json: String): Offset = CdcOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class CdcRange(start: Long, end: Long) extends InputPartition

private[sources] case class CdcReaderFactory(products: Int, fullLog: Boolean,
                                             txSize: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[CdcRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow =
        if (fullLog) CdcSource.fullEventRow(i, products, txSize)
        else CdcSource.eventRow(i, products)
      override def close(): Unit = ()
    }
  }
}

/** Deterministic event generator + partition math (shared by both read
  * paths and by the test oracle). */
object CdcSource {
  /** 2023-09-01T00:00:00Z, the stream's epoch (micros). */
  val baseMicros: Long = 1693526400L * 1000000L

  def splitRange(start: Long, end: Long, parts: Int): Array[InputPartition] = {
    val n = math.max(1, math.min(parts.toLong, end - start)).toInt
    (0 until n).map { p =>
      val lo = start + (end - start) * p / n
      val hi = start + (end - start) * (p + 1) / n
      CdcRange(lo, hi): InputPartition
    }.toArray
  }

  /** Catalog row values for event `i` (strings — the binlog wire format). */
  def productOf(i: Long, products: Int): (Int, Int, Double) = {
    val pid = 9000 + (i % products).toInt
    val version = (i / products).toInt
    val price = 50.0 + (i % products) + 10.0 * version
    (pid, version, price)
  }

  private val dbName = UTF8String.fromString("sample_data")
  private val tableName = UTF8String.fromString("products_catalog")
  // event-type constants cached once: eventRow/fullEventRow run in the
  // per-row reader hot loop — no per-event UTF8String allocation
  private val insertT = UTF8String.fromString(Cdc.Insert)
  private val updateT = UTF8String.fromString(Cdc.Update)
  private val deleteT = UTF8String.fromString(Cdc.Delete)
  private val beginT = UTF8String.fromString(Cdc.Begin)
  private val commitT = UTF8String.fromString(Cdc.Commit)
  private val ddlT = UTF8String.fromString(Cdc.Ddl)
  private def typeUtf8(t: String): UTF8String = t match {
    case Cdc.Insert => insertT
    case Cdc.Update => updateT
    case Cdc.Delete => deleteT
    case Cdc.Begin => beginT
    case Cdc.Commit => commitT
    case Cdc.Ddl => ddlT
    case other => UTF8String.fromString(other)
  }

  private def payloadCols(pid: Int, version: Int, price: Double): GenericArrayData = {
    def colRow(id: Int, name: String, value: String): InternalRow =
      new GenericInternalRow(Array[Any](id, UTF8String.fromString(name), 0,
        if (value == null) null else UTF8String.fromString(value)))
    new GenericArrayData(Array[Any](
      colRow(0, "ProductID", pid.toString),
      colRow(1, "ProductName", s"product-$pid"),
      colRow(2, "ProductBrand", s"brand-${pid % 7}"),
      colRow(3, "Target_Gender", if (pid % 2 == 0) "Female" else "Male"),
      colRow(4, "Price", price.toString),
      colRow(5, "Currency", "Euro"),
      colRow(6, "Description", s"catalog item $pid v$version"),
      colRow(7, "Launch_date", "2023-07-01"),
      colRow(8, "Loaded_at", "2023-08-01")))
  }

  def eventRow(i: Long, products: Int): InternalRow = {
    val (pid, version, price) = productOf(i, products)
    new GenericInternalRow(Array[Any](
      i,
      if (version == 0) insertT else updateT,
      dbName,
      tableName,
      baseMicros + i * 1000000L,
      payloadCols(pid, version, price)))
  }

  // ---- full binlog surface (fullEventLog=true) ---------------------------
  //
  // Deterministic seq → event mapping mirroring what CaptureChangeMySQL
  // emits (reference final_template.xml:4325-4331): seq 0 is a ddl event;
  // after it, row changes arrive in transactions of `txSize`, each wrapped
  // by a begin and a commit marker, so the cycle length is txSize + 2.
  // Every 13th row change (after the initial `products`-row snapshot) is a
  // DELETE carrying the deleted row's last payload; the rest are the same
  // insert-then-update catalog walk as the plain log. begin/commit/ddl
  // carry no `columns` payload and a null table_name (begin/commit are not
  // table-scoped).

  /** Pure seq → event-type mapping for the full log (shared with specs —
    * the test oracle is this function, not a copy of the reader loop). */
  def fullEventTypeOf(i: Long, products: Int, txSize: Int): String =
    if (i == 0L) Cdc.Ddl
    else {
      val j = (i - 1) % (txSize + 2)
      if (j == 0) Cdc.Begin
      else if (j == txSize + 1) Cdc.Commit
      else {
        val k = changeIndexOf(i, txSize)
        if (k < products) Cdc.Insert
        else if (k % 13 == 12) Cdc.Delete
        else Cdc.Update
      }
    }

  /** The row-change ordinal of seq `i` (only defined when
    * [[fullEventTypeOf]] says `i` is a row change). */
  def changeIndexOf(i: Long, txSize: Int): Long = {
    val j = (i - 1) % (txSize + 2)
    (i - 1) / (txSize + 2) * txSize + (j - 1)
  }

  /** The change index whose payload a delete at change index `k` carries:
    * the pid's most recent PRIOR insert/update (walking past any prior
    * deletes for the same pid) — so the delete really carries the deleted
    * row's last emitted payload, never a version that was never inserted. */
  def deletePayloadIndexOf(k: Long, products: Int): Long = {
    var p = k - products // same pid, one catalog walk earlier
    while (p >= products && p % 13 == 12) p -= products // skip prior deletes
    p
  }

  def fullEventRow(i: Long, products: Int, txSize: Int): InternalRow = {
    val t = fullEventTypeOf(i, products, txSize)
    val ts = baseMicros + i * 1000000L
    t match {
      case Cdc.Begin | Cdc.Commit =>
        new GenericInternalRow(Array[Any](
          i, typeUtf8(t), dbName, null, ts, null))
      case Cdc.Ddl =>
        new GenericInternalRow(Array[Any](
          i, typeUtf8(t), dbName, tableName, ts, null))
      case _ =>
        val k = changeIndexOf(i, txSize)
        val payloadIdx = if (t == Cdc.Delete) deletePayloadIndexOf(k, products) else k
        val (pid, version, price) = productOf(payloadIdx, products)
        new GenericInternalRow(Array[Any](
          i, typeUtf8(t), dbName, tableName, ts,
          payloadCols(pid, version, price)))
    }
  }
}
