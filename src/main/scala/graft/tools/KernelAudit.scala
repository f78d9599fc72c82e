// scratch plan auditor — counts per-query occurrences of the custom
// codegen kernels in the OPTIMIZED logical plan. A kernel that appears
// more times than the query's intent (e.g. hoisted above a Generate by
// CollapseProject, or duplicated into an inferred filter — the
// guide-§4.4 trap PlanProbe demonstrated) multiplies its per-row cost
// by the generator fanout. Occurrence counts are a cheap tripwire; the
// flagged plans get read by hand.
package graft.tools

import graft.{GraftSession, SparkEntry}

object KernelAudit {
  private val kernels = Seq("ivf_assign_topn", "pq_encode_long",
    "simhash60", "word_shingle_hashes", "word_shingle_poly_hashes",
    "sign_lsh_keys", "array_dot", "jaro_winkler", "rolling_hash",
    "word_shingles")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val prefix = args.headOption.getOrElse("")
    val spark = GraftSession.local(8, appName = "graft-kernel-audit")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.optimizedPlan.treeString
          val counts = kernels.map(k => k -> ("\\b" + k + "\\b").r
              .findAllMatchIn(plan).size)
            .filter(_._2 > 0)
          if (counts.nonEmpty)
            println(s"[kernel-audit] $name: " +
              counts.map { case (k, n) => s"$k=$n" }.mkString(", "))
        } catch {
          case e: Throwable =>
            println(s"[kernel-audit] $name: PLAN FAILED ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
