package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual registered queries in one session, in the given order
  * (repeats allowed): `runMain graft.tools.BenchOne q1 q2 q1`. Prints
  * per-run seconds — the isolation/interference companion to graft.Bench
  * (which times the whole registry in map order). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSessionRef.session(cpus)
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // same block-store hygiene as Bench/Verify: localCheckpoint blocks
      // are invisible to clearCache and would inflate repeat timings
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      println(f"[benchone] $name%-28s $dt%8.3f s  ($n rows)  aqe=${spark.conf.get("spark.sql.adaptive.enabled")}")
    }
    spark.stop()
  }
}

private object GraftSessionRef {
  def session(cpus: Int): SparkSession =
    graft.GraftSession.local(cpus, appName = "graft-benchone")
}
