// scratch: sequential vs batched BPE at merges=20, sf0.1 + sf0.01 equality
package graft.tools
import graft.GraftSession
import graft.ops.TextAnalysis
object BpeBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, appName = "graft-bpebench")
    import spark.implicits._
    spark.range(0, 2000000).selectExpr("sum(id * 2)").collect()
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      def run(tag: String, f: => Seq[(Long, String, Long)]): Seq[(Long, String, Long)] = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[bpe] $sf $tag ${(System.nanoTime() - t0) / 1e9}%.2f s merges=${r.size}")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        r
      }
      val s1 = run("sequential", TextAnalysis.bpeTrain(docs, 20).as[(Long, String, Long)].collect().toSeq)
      val b1 = run("batched   ", TextAnalysis.bpeTrainBatched(docs, 20).as[(Long, String, Long)].collect().toSeq)
      println(s"[bpe] $sf equal=${s1 == b1}")
    }
    spark.stop()
  }
}
