// scratch plan-capture main — prints the formatted physical plan of the
// ROUTED (IVF) near-dup path: corpusN pinned to a refusing scale so the
// banded branch is bypassed regardless of the actual corpus size.
package graft.tools

import graft.{GraftSession, Tables}

object ExplainNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(8, appName = "graft-explain-neardup")
    val emb = Tables(spark, sfDir, "embeddings")
    val df = graft.ops.Similarity.lshNearDup(emb, 0.4, corpusN = 200000L)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
