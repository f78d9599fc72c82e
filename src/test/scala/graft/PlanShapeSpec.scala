package graft

/** Plan-shape regression guards: the scale properties the engine relies
  * on must hold in the PLAN, not just in benchmark numbers — column
  * pruning and filter pushdown reaching the parquet scan, dimension
  * joins broadcasting, and no Cartesian products anywhere in the
  * registry. Complements the manual tools/Explain audit with CI-level
  * enforcement on the pinned Spark version. */
class PlanShapeSpec extends SparkTestBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

  test("q1 scan is pruned to the single grouped column") {
    val plan = planOf("q1_group_count_sort")
    assert(plan.contains("ReadSchema: struct<c_mktsegment:string>"),
      s"scan not pruned:\n$plan")
  }

  test("q7's dimension filter is pushed into the parquet scan") {
    val plan = planOf("q7_join_anti")
    assert(plan.contains("EqualTo(o_orderpriority,1-URGENT)"),
      s"filter not pushed:\n$plan")
  }

  test("q5/q6 dimension joins broadcast (no sort-merge on dims)") {
    Seq("q5_join_broadcast", "q6_join_star").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q lacks broadcast")
      assert(!plan.contains("SortMergeJoin"), s"$q fell back to SMJ")
    }
  }

  test("no registered query plans a CartesianProduct") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf0001).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        catch { case _: Throwable => "" } // ML fits run jobs; skip errors
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
    }
  }
}
