// scratch plan probe — prints where an expensive kernel lands relative
// to a generator in the optimized plan (the guide-§4.4 duplication
// check: CollapseProject/ExtractGenerator can hoist a projection above
// a Generate, re-evaluating it per generated row).
package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, appName = "graft-plan-probe")
    val df = spark.range(10).select(col("id").as("vec_id"),
      array(col("id"), col("id") + 1, col("id") + 2, col("id") + 3)
        .as("qv"))
    val cents = Map((0, 0) -> Array(1L, 2L, 0L, 0L),
      (0, 1) -> Array(3L, 4L, 0L, 0L))
    // the fitOnSample update shape: encode beside a posexplode
    val enc = graft.functions.PqEncodeLong(col("qv"), cents, 1, 4)
    val fitShape = df.select(enc.as("codes"),
      posexplode(col("qv")).as(Seq("dg", "qk")))
    println("=== fitOnSample update shape ===")
    println(fitShape.queryExecution.optimizedPlan.treeString)

    // kernel as DIRECT generator input: does InferFiltersFromGenerate
    // duplicate it into a size()>0 filter (pre-SPARK-36715 behavior)?
    val gen = df.select(col("vec_id"),
      explode(enc).as("code"))
    println("=== kernel-as-generator-input shape ===")
    println(gen.queryExecution.optimizedPlan.treeString)

    // kernel aliased in the same select as another generator, consumed
    // by a second explode (the ivfNearDup keyed shape pre-fix)
    val two = df.select(col("vec_id"), enc.as("codes"),
        posexplode(col("qv")).as(Seq("dg", "qk")))
      .select(col("vec_id"), explode(col("codes")).as("code"), col("dg"))
    println("=== alias-beside-generator then explode shape ===")
    println(two.queryExecution.optimizedPlan.treeString)

    // persist barrier: does InMemoryRelation stop the hoist?
    val cached = df.select(col("qv"), enc.as("codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val upd = cached.select(col("codes"),
      posexplode(col("qv")).as(Seq("dg", "qk")))
    println("=== persist-barrier fit shape ===")
    println(upd.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
