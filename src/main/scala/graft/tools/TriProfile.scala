package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for triangleCounts (dev tool). */
object TriProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, appName = "graft-triprofile")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[tri] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val pairs = graft.Tables(spark, sfDir, "lineitem")
      .groupBy("l_orderkey")
      .agg(slice(array_sort(collect_set(col("l_partkey"))),
        1, graft.SparkEntry.CopurchaseMaxBasket).as("parts"))
      .select(explode(flatten(transform(col("parts"), a =>
        transform(filter(col("parts"), b => b > a),
          b => struct(a.as("da"), b.as("db")))))).as("p"))
      .select(col("p.da").as("da"), col("p.db").as("db"))
      .distinct()
    time("pairs distinct")(pairs.count())
    val canon = pairs
      .select(least(col("da"), col("db")).as("u"), greatest(col("da"), col("db")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = canon.select(col("u").as("node"))
      .union(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(broadcast(deg.select(col("node").as("u"), col("deg").as("du"))), "u")
      .join(broadcast(deg.select(col("node").as("v"), col("deg").as("dv"))), "v")
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val orientedPlain = withDeg.select(
      when(lowFirst, col("u")).otherwise(col("v")).as("src"),
      when(lowFirst, col("v")).otherwise(col("u")).as("dst"))
    time("oriented (no ckpt)")(orientedPlain.count())
    val t0 = System.nanoTime()
    val oriented = orientedPlain.localCheckpoint()
    println(f"[tri] localCheckpoint           ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    val adj = oriented.groupBy(col("src").as("node"))
      .agg(collect_list(col("dst")).as("nbrs"))
    time("adj")(adj.count())
    val tris = oriented
      .join(adj.select(col("node").as("src"), col("nbrs").as("nv")), "src")
      .join(adj.select(col("node").as("dst"), col("nbrs").as("nw")), "dst")
      .select(col("src"), col("dst"),
        array_intersect(col("nv"), col("nw")).as("xs"))
      .filter(size(col("xs")) > 0)
    time("tris")(tris.count())
    val corners = tris
      .select(explode(concat(col("xs"),
        array_repeat(col("src"), size(col("xs"))),
        array_repeat(col("dst"), size(col("xs"))))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    time("corners")(corners.count())
    spark.stop()
  }
}
