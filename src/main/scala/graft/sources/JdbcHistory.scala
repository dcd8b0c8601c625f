package graft.sources

import java.sql.DriverManager
import java.util.Properties

import graft.scd2.Scd2
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** JDBC SCD2 history sink/source — the literal shape of the reference's
  * database leg: a `DBCPConnectionPool` feeding `ConvertJSONToSQL`+`PutSQL`
  * INSERTs into `products_catalog_history` and a `PutDatabaseRecord`
  * UPDATE for expiry (reference: nifi/templates/final_template.xml:951-1146
  * pool service, :1833 insert target table, :4515-4797 UPDATE sink;
  * mysql/sql-scripts/03-create-table.sql.txt for the DDL).
  *
  * Spark-first restatement: the merge itself stays the declarative
  * [[Scd2.applyBatchDelta]] plan; only the APPLICATION of the change set
  * goes through JDBC —
  *  - Task 2 (expiry): per-partition batched `UPDATE … SET valid_until=?,
  *    is_current='N' WHERE <keys>=? AND is_current='Y'`, executed FIRST so
  *    its predicate can never touch the incoming rows. Keying the UPDATE on
  *    `is_current='Y'` (not just the business key) fixes the reference's
  *    documented clobber bug (README.md:186) at the SQL level, and running
  *    expiry strictly before the insert removes its Task1/Task2 race
  *    (README.md:190-195).
  *  - Task 1 (append): `df.write.mode("append").jdbc` — Spark's standard
  *    parallel JDBC insert (one connection per partition, batched).
  *
  * Scale/transactionality: each partition commits its own JDBC
  * transaction — the same per-connection semantics as the reference's
  * PutSQL — so exactly-once belongs to the database's idempotence (the
  * expiry UPDATE is naturally idempotent; replayed inserts need a primary
  * key on (keys, valid_from, seq), exactly as the reference relies on its
  * MySQL schema). The parquet sink ([[graft.streaming.Scd2Stream]]) is the
  * engine's own crash-safe path; this class exists for parity with
  * deployments whose history lives in an RDBMS.
  *
  * Reads push down: `spark.read.jdbc` + `filter(is_current='Y')` ships the
  * predicate into the database (PushedFilters — JdbcSpec asserts it), the
  * Spark-side of the reference's lookup subquery `(SELECT * FROM
  * products_catalog_history WHERE Is_current='Y')` (final_template.xml:1440).
  */
object JdbcHistory {

  /** Seed/overwrite the history table. `columnTypes` pins SQL types where
    * the dialect default is wrong for the workload (e.g. Derby maps
    * StringType to CLOB, which Derby refuses to compare in a WHERE clause —
    * pass `"is_current VARCHAR(1), event_type VARCHAR(64)"`). */
  def seed(history: DataFrame, url: String, table: String, props: Properties,
           columnTypes: Option[String] = None): Unit = {
    val w = history.write.mode("overwrite")
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(url, table, props)
  }

  def read(spark: SparkSession, url: String, table: String,
           props: Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** The expiry UPDATE, quoted by the CONNECTION's dialect
    * (`JdbcDialects.get(url).quoteIdentifier`) — MySQL's default sql_mode
    * treats ANSI double-quoted tokens as string literals, so hard-coded
    * `"` quoting would be a syntax error against the reference's own
    * target database (final_template.xml:4515-4797 UPDATE sink); the
    * dialect gives backticks there and `"` on ANSI databases
    * (Derby/H2/Postgres), matching however `df.write.jdbc` quoted the
    * identifiers at CREATE time. */
  private[graft] def expiryUpdateSql(url: String, table: String,
                                     keys: Seq[String]): String = {
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier _
    s"""UPDATE $table SET ${q(Scd2.ValidUntil)} = ?, ${q(Scd2.IsCurrent)} = 'N'
       | WHERE ${keys.map(k => s"${q(k)} = ?").mkString(" AND ")}
       |   AND ${q(Scd2.IsCurrent)} = 'Y'""".stripMargin
  }

  /** One SCD2 merge against a live JDBC history table: expiry UPDATE
    * (Task 2) then version INSERT (Task 1). Row-for-row equal to the
    * parquet path's [[Scd2.applyBatch]] rewrite (JdbcSpec). */
  def applyBatch(spark: SparkSession, url: String, table: String,
                 batch: DataFrame, keys: Seq[String], tsCol: String,
                 seqCol: String, props: Properties,
                 onLate: Scd2.LatePolicy = Scd2.LatePolicy.Error): Unit =
    applyDelta(url, table, keys, props,
      Scd2.applyBatchDelta(read(spark, url, table, props), batch, keys,
        tsCol, seqCol, onLate))

  /** [[applyBatch]] with DELETE events (parquet-path parity:
    * [[Scd2.applyBatchWithDeletes]]): a delete expires the key's open
    * row via the same Task-2 UPDATE and inserts nothing, so the key has
    * no current row until a later re-insert. */
  def applyBatchWithDeletes(spark: SparkSession, url: String, table: String,
                            batch: DataFrame, keys: Seq[String], tsCol: String,
                            seqCol: String, opCol: String, props: Properties,
                            onLate: Scd2.LatePolicy = Scd2.LatePolicy.Error)
      : Unit =
    applyDelta(url, table, keys, props,
      Scd2.applyBatchDeltaWithDeletes(read(spark, url, table, props), batch,
        keys, tsCol, seqCol, opCol, onLate))

  private def applyDelta(url: String, table: String, keys: Seq[String],
                         props: Properties,
                         delta: (DataFrame, DataFrame)): Unit = {
    val (expiriesPlan, newVersionsPlan) = delta
    // MATERIALIZE the change set against the PRE-merge history before any
    // write: both halves are lazy plans over the live JDBC table, and the
    // expiry UPDATE flips the very is_current rows the Drop-policy late
    // filter reads — evaluating newVersions after the UPDATE would compute
    // it against post-merge history (late rows would silently pass).
    // localCheckpoint is eager: this snapshot also fires the Error-policy
    // raise_error guard before the database is touched at all.
    val expiries = expiriesPlan.localCheckpoint()
    val newVersions = newVersionsPlan.localCheckpoint()
    val sql = expiryUpdateSql(url, table, keys)
    val nKeys = keys.size
    val connProps = new Properties()
    connProps.putAll(props)
    expiries.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url, connProps)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          try {
            rows.foreach { r =>
              st.setTimestamp(1, r.getTimestamp(nKeys)) // valid_until is last
              (0 until nKeys).foreach(i => st.setObject(i + 2, r.get(i)))
              st.addBatch()
            }
            st.executeBatch()
            conn.commit()
          } finally st.close()
        } finally conn.close()
      }
    }
    newVersions.write.mode("append").jdbc(url, table, props)
  }

  /** Online schema evolution, JDBC leg (parquet-path parity:
    * `Scd2Stream`'s typed-null widening): `ALTER TABLE … ADD COLUMN` for
    * every batch column the live table lacks, so a subsequent
    * [[applyBatch]] INSERT can carry it (pre-evolution rows read back as
    * NULL — the same typed-null backfill the parquet path gives).
    * Spark's JDBC INSERT lists columns BY NAME, so a batch that lacks
    * table columns needs no handling here. `typeOverrides` pins SQL
    * types where the dialect default is wrong (e.g. Derby maps
    * StringType to CLOB — same caveat as [[seed]]'s `columnTypes`).
    * `exclude` lists batch columns the MERGE consumes rather than
    * stores — tsCol (rewritten to valid_from/valid_until) and opCol —
    * which must not become table columns. Returns the added names. */
  def evolveSchema(spark: SparkSession, url: String, table: String,
                   batch: DataFrame, props: Properties,
                   typeOverrides: Map[String, String] = Map.empty,
                   exclude: Seq[String] = Nil): Seq[String] = {
    val existing = read(spark, url, table, props)
      .schema.fieldNames.map(_.toLowerCase).toSet ++
      exclude.map(_.toLowerCase)
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    val added = batch.schema.fields
      .filterNot(f => existing.contains(f.name.toLowerCase))
    if (added.nonEmpty) {
      val connProps = new Properties()
      connProps.putAll(props)
      val conn = DriverManager.getConnection(url, connProps)
      try {
        added.foreach { f =>
          val sqlType = typeOverrides.getOrElse(f.name,
            dialect.getJDBCType(f.dataType)
              .orElse(org.apache.spark.sql.execution.datasources.jdbc
                .JdbcUtils.getCommonJDBCType(f.dataType))
              .getOrElse(throw new IllegalArgumentException(
                s"no JDBC type for ${f.name}: ${f.dataType}"))
              .databaseTypeDefinition)
          val st = conn.createStatement()
          try st.executeUpdate(
            s"ALTER TABLE $table ADD COLUMN " +
              s"${dialect.quoteIdentifier(f.name)} $sqlType")
          finally st.close()
        }
      } finally conn.close()
    }
    added.map(_.name).toSeq
  }
}
