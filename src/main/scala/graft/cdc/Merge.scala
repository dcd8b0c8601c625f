package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic last-write-wins MERGE (the Delta-Lake-style `MERGE INTO`
  * semantics as a batch operator) — maintains a CURRENT-STATE table from a
  * change feed, the no-history counterpart of `Scd2.applyBatchWithDeletes`
  * (reference's U1/`PutDatabaseRecord` UPDATE path keeps history; a plain
  * mirror table — the other common sink — wants exactly this):
  *
  *  - matched key, latest op = upsert → row replaced with source values
  *  - matched key, latest op = delete → row removed
  *  - unmatched key, upsert           → row inserted
  *  - unmatched key, delete           → no-op
  *
  * Intra-batch, the LATEST change per key wins (`seqCol` descending, the
  * binlog position / Debezium `ts_ms` in a real feed); callers ensure the
  * sequence is unique per key, as every CDC log's position is.
  *
  * Scale shape: one window + two key-equi-joins, all hash-partitioned by
  * the SAME key, so AQE/exchange-reuse pays ONE shuffle of each input and
  * no full-outer join; with target and feed bucketed by key it is
  * shuffle-free. Copy-on-write, like every snapshot-isolation merge. */
object Merge {

  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
            seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val latest = source.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val untouched = target.join(
      source.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val upserts = latest.filter(col(opCol) =!= Cdc.Delete)
      .select(target.columns.map(col).toIndexedSeq: _*)
    untouched.unionByName(upserts)
  }
}
