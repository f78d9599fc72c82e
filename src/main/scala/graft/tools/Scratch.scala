// scratch profiling main — not part of the library
package graft.tools

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "graft-scratch")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
    }
    spark.range(0, 2000000).selectExpr("sum(id * 2)").collect()
    t("pq r2 run1")(graft.ops.Similarity.pqTopK(emb, 20, 5, m = 8,
      codebookSize = 256, shortlist = 64, fitSampleCap = 1000).count())
    t("pq r2 run2")(graft.ops.Similarity.pqTopK(emb, 20, 5, m = 8,
      codebookSize = 256, shortlist = 64, fitSampleCap = 1000).count())
    t("pq r0")(graft.ops.Similarity.pqTopK(emb, 20, 5, m = 8,
      codebookSize = 256, shortlist = 64, rounds = 0,
      fitSampleCap = 1000).count())
    t("pq r1")(graft.ops.Similarity.pqTopK(emb, 20, 5, m = 8,
      codebookSize = 256, shortlist = 64, rounds = 1,
      fitSampleCap = 1000).count())
    t("ivf np4 r2")(graft.ops.Similarity.ivfTopK(emb, 20, 5,
      fitSampleCap = 1000).count())
    spark.stop()
  }
}
