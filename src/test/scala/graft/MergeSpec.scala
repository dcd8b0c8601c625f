package graft

import graft.cdc.{Cdc, Merge}
import org.apache.spark.sql.functions._

/** [[Merge.merge]] — the last-write-wins current-state MERGE. */
class MergeSpec extends SparkSpec {

  private def snaps = {
    val base = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val oldSnap = base.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
    val newSnap = base.filter(pmod(col("o_orderkey"), lit(11)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(5)) === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    (oldSnap, newSnap)
  }

  test("merging a snapshot diff reproduces the new snapshot exactly") {
    val (oldSnap, newSnap) = snaps
    val diff = Cdc.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("op"),
        col("new.o_totalprice").as("o_totalprice"), lit(1L).as("seq"))
    val merged = Merge.merge(oldSnap, diff, Seq("o_orderkey"))
    assert(merged.exceptAll(newSnap).isEmpty && newSnap.exceptAll(merged).isEmpty,
      "merge(old, diff(old, new)) must equal new")
  }

  test("latest op per key wins; delete removes; delete-on-absent is a no-op") {
    val (oldSnap, _) = snaps
    import spark.implicits._
    val k1 = oldSnap.select(min("o_orderkey")).first().getLong(0)
    val absent = -1L // never a real order key
    val feed = Seq(
      (k1, Cdc.Update, 111.0, 1L),    // overridden by seq 3 delete
      (k1, Cdc.Update, 222.0, 2L),
      (k1, Cdc.Delete, 0.0, 3L),
      (absent, Cdc.Delete, 0.0, 1L))  // delete of an absent key: no-op
      .toDF("o_orderkey", "op", "o_totalprice", "seq")
    val merged = Merge.merge(oldSnap, feed, Seq("o_orderkey")).cache()
    assert(merged.filter(col("o_orderkey").isin(k1, absent)).isEmpty,
      "deleted and never-present keys must not surface")
    assert(merged.count() === oldSnap.count() - 1)
    merged.unpersist()
    ()
  }

  test("merge plan: key-partitioned joins only, no broadcast of the target") {
    val df = ops.Scd2Queries.queries("merge_upsert")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(ex.forall(_.contains("o_orderkey")),
      s"every shuffle must be by the merge key:\n${ex.mkString("\n")}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"no cross products in a merge:\n$p")
  }

  test("an update on an unmatched key inserts (upsert semantics)") {
    val (oldSnap, _) = snaps
    import spark.implicits._
    val feed = Seq((-5L, Cdc.Update, 42.5, 1L))
      .toDF("o_orderkey", "op", "o_totalprice", "seq")
    val merged = Merge.merge(oldSnap, feed, Seq("o_orderkey"))
    val row = merged.filter(col("o_orderkey") === -5L).collect()
    assert(row.length === 1 && row(0).getDouble(1) === 42.5)
  }
}
