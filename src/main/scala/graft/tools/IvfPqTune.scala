package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Calibration for the composed IVFADC path ([[Similarity.ivfPqTopK]])
  * and the bounded codebook-fit sample: prints recall@k vs bruteTopK
  * across an nProbe sweep, at both the full-corpus fit and the sampled
  * fit the registered queries pin — run per-sf before moving the
  * `ann_recall_ivfpq` floor (the PqTune discipline applied to the
  * composition). `SPARK_GRAFT_SF_DIR=... runMain graft.tools.IvfPqTune
  * [nProbes...]`; `SPARK_GRAFT_FIT_CAP` overrides the sampled cap. */
object IvfPqTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cap = sys.env.get("SPARK_GRAFT_FIT_CAP").map(_.toInt).getOrElse(1000)
    val nc = sys.env.get("SPARK_GRAFT_IVF_NC").map(_.toInt).getOrElse(16)
    val sl = sys.env.get("SPARK_GRAFT_IVFPQ_SL").map(_.toInt).getOrElse(64)
    val sweep = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 4, 8, 16)
    val spark = graft.GraftSession.local(8, appName = "graft-ivfpqtune")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val exact = Similarity.bruteTopK(emb, 20, 5).select("q_id", "vec_id")
      .withColumn("in_e", lit(1L)).cache()
    println(s"corpus=$n fit_cap=$cap exact_pairs=${exact.count()}")
    def recall(approx: org.apache.spark.sql.DataFrame): Long = {
      val row = exact.join(approx.select("q_id", "vec_id")
          .withColumn("in_a", lit(1L)), Seq("q_id", "vec_id"), "full")
        .agg(coalesce(sum("in_e"), lit(0L)).as("n_exact"),
          coalesce(sum(col("in_e") * col("in_a")), lit(0L)).as("n_cap"))
        .head()
      row.getLong(1) * 10000 / math.max(1L, row.getLong(0))
    }
    // sampled-fit flat PQ (the registered sim_pq_topk configuration)
    println(s"pq m=8 cb=256 sl=64 full_fit   recall_bp=" +
      recall(Similarity.pqTopK(emb, 20, 5, m = 8, codebookSize = 256,
        shortlist = 64)))
    println(s"pq m=8 cb=256 sl=64 cap=$cap  recall_bp=" +
      recall(Similarity.pqTopK(emb, 20, 5, m = 8, codebookSize = 256,
        shortlist = 64, fitSampleCap = cap)))
    // sampled-fit IVF (the registered sim_ivf_topk configuration)
    println(s"ivf nc=16 np=4 full_fit        recall_bp=" +
      recall(Similarity.ivfTopK(emb, 20, 5)))
    println(s"ivf nc=16 np=4 cap=$cap       recall_bp=" +
      recall(Similarity.ivfTopK(emb, 20, 5, fitSampleCap = cap)))
    // the composition across the probe sweep, sampled fit
    sweep.foreach { np =>
      println(s"ivfpq nc=$nc np=$np m=8 cb=256 sl=$sl cap=$cap recall_bp=" +
        recall(Similarity.ivfPqTopK(emb, 20, 5, nCentroids = nc,
          nProbe = np, shortlist = sl, fitSampleCap = cap)))
    }
    spark.stop()
  }
}
