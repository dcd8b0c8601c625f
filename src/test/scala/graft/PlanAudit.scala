package graft

/** Dev-only whole-surface plan audit (test scope — not part of the lib):
  *
  *   sbt 'Test/runMain graft.PlanAudit [sfDir]'
  *
  * Builds (but does not execute) every SparkEntry query's physical plan
  * and flags the operator shapes that are usually accidents:
  *   - SortAggregate WITH grouping keys (a non-mutable agg buffer type —
  *     string/decimal min-max — silently degrades HashAggregate; this is
  *     exactly how data_profile was costing 3.9 s before round 8);
  *   - CartesianProduct (a join that lost its equi-condition);
  *   - BroadcastNestedLoopJoin on a non-trivial build side.
  * Queries with a documented pinned-baseline crossJoin are expected to
  * show up here — the point is that every flagged line has a KNOWN
  * reason; an unexplained new entry is a regression.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        // sparkPlan, not executedPlan: AQE wraps the latter in an
        // AdaptiveSparkPlanExec whose children collect() cannot see
        val plan = fn(spark, sfDir).queryExecution.sparkPlan
        val hits = plan.collect {
          case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec
            if s.groupingExpressions.nonEmpty =>
            s"SortAggregate(keys=${s.groupingExpressions.size})"
          case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
            "CartesianProduct"
          case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
            s"BroadcastNestedLoopJoin(${j.joinType})"
        }
        if (hits.nonEmpty) {
          flagged += 1
          println(s"[planaudit] $name: ${hits.groupBy(identity)
            .map { case (k, v) => s"$k x${v.size}" }.mkString(", ")}")
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"[planaudit] $name: PLAN ERROR ${e.getMessage.take(120)}")
      }
    }
    println(s"[planaudit] done: $flagged/${SparkEntry.queries.size} flagged")
    spark.stop()
  }
}
