// scratch profiling main — not part of the library
package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Similarity

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "graft-scratch")
    spark.range(0, 2000000).selectExpr("sum(id * 2)").collect()
    val emb = spark.read.parquet("/tmp/graft_x100/embeddings.parquet")

    // x100 IVFADC/PQ shortlist restore point: sl=64/128 measured under
    // the 6000bp floor at 200k vectors; sweep the shortlist up.
    val exact = Similarity.bruteTopK(emb, 20, 5).select("q_id", "vec_id")
      .withColumn("in_e", lit(1L)).persist()
    println(s"[scratch] exact pairs = ${exact.count()}")
    def grade(label: String)(approx: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val row = exact.join(approx.select("q_id", "vec_id")
          .withColumn("in_a", lit(1L)), Seq("q_id", "vec_id"), "full")
        .agg(coalesce(sum("in_e"), lit(0L)),
          coalesce(sum(col("in_e") * col("in_a")), lit(0L))).head()
      val bp = row.getLong(1) * 10000 / math.max(1L, row.getLong(0))
      println(f"[scratch] $label recall_bp=$bp (${(System.nanoTime() - t0) / 1e9}%.1f s)")
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.id <= 10).foreach(_.unpersist(true))
    }
    grade("ivfpq np=12 sl=256")(Similarity.ivfPqTopK(emb, 20, 5,
      nProbe = 12, shortlist = 256, fitSampleCap = 1000))
    grade("ivfpq np=12 sl=512")(Similarity.ivfPqTopK(emb, 20, 5,
      nProbe = 12, shortlist = 512, fitSampleCap = 1000))
    grade("pq sl=512")(Similarity.pqTopK(emb, 20, 5, m = 8,
      codebookSize = 256, shortlist = 512, fitSampleCap = 1000))
    spark.stop()
  }
}
