// scratch scale-timing main for the routed near-dup path — not part of
// the library (the Stress ladder covers the full op matrix; this one
// isolates lshNearDup's IVF route so a before/after of the assignment
// kernel is one 2-minute run, not a 30-minute ladder)
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

object NearDupScale {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-neardup-scale")

    def replicate(df: DataFrame, idCol: String): DataFrame = {
      val maxId = df.agg(max(col(idCol))).head
      val shift = (if (maxId.isNullAt(0)) 0L else maxId.getLong(0)) + 1L
      (0 until factor).map { r =>
        df.withColumn(idCol, col(idCol) + lit(r * shift))
      }.reduce(_.union(_))
    }

    val emb = replicate(Tables(spark, sfDir, "embeddings"), "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    println(s"corpus: $n vectors (${factor}x $sfDir)")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val rows = graft.ops.Similarity.lshNearDup(emb, 0.4, corpusN = n).count()
      println(f"[neardup-scale] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s"   pairs=$rows")
    }
    spark.stop()
  }
}
