package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.ops.Dedup

/** Ad-hoc stage profiler for the shingle-based dedup ops (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same session posture as Bench — profile numbers must reflect the
    // configuration actually benchmarked
    val spark = graft.GraftSession.local(32, appName = "graft-profile")
    val docs = Tables(spark, sfDir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("explode only") {
      docs.select(org.apache.spark.sql.functions.explode(
        graft.functions.Texty.wordShingles(
          org.apache.spark.sql.functions.col("text"), 3)).as("s")).count()
    }
    time("shingles (df-capped)") { Dedup.shingles(docs, 3, 100).count() }
    time("shingle hashes (df-capped)") { Dedup.shingleHashes(docs, 3, 100).count() }
    time("minhash signatures") {
      Dedup.minhashSignatures(Dedup.shinglePolyHashes(docs, 3, 100)).count()
    }
    time("minhash full") { Dedup.minhashLsh(docs).count() }
    time("ngram jaccard full") { Dedup.ngramJaccard(docs).count() }
    time("simhash full") { Dedup.simhashPairs(docs).count() }
    spark.stop()
  }
}
