package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Materialize an N×-scaled copy of a testdata directory as parquet, so
  * the FULL registered-query suite can run a second measured decade
  * (sf0.1 × 10 ≈ sf1) under identical harness conditions — the
  * `BENCH_full` companion to [[Curve]]'s in-memory op curves.
  *
  * Replication model (the TPC-H SF growth shape):
  *  - region/nation copy as-is (fixed dimensions at every SF);
  *  - customer/supplier/part/orders/lineitem replicate with ALL their
  *    keys shifted consistently per replica (r·shift added to both the
  *    primary key and every FK referencing a replicated table), so each
  *    replica is a self-consistent star and joins scale like a bigger
  *    corpus, not like a keyspace collision;
  *  - events shift event_id/user_id (same time range at 10× the rate —
  *    what a busier product does);
  *  - documents shift doc_id and prefix every token of replica r ≥ 1
  *    with `r<r>x` ([[Curve]]'s disjoint-token-space model: per-shingle
  *    df unchanged, true near-dup pairs grow linearly);
  *  - embeddings shift vec_id and CYCLICALLY ROTATE dimensions by 7·r
  *    per replica: a permutation preserves every intra-replica distance
  *    and norm EXACTLY (each replica keeps the base corpus's true
  *    neighbor structure) while rotated copies of near-iid components
  *    are close to orthogonal across replicas — so true pairs grow
  *    linearly. Plain copies would make every vector a 10-way exact
  *    duplicate (quadratic pair inflation); an additive spike (the
  *    first draft) distorted norms and codebook geometry enough to trip
  *    the PQ recall floor on corpus shape alone.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.MakeScaled
  *          <outDir> [N] [tables]
  * The optional comma-list `tables` restricts which tables materialize
  * (e.g. `documents,embeddings,events` for a ×100 LLM-core run where
  * writing a 60M-row lineitem buys nothing).
  */
object MakeScaled {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      sys.error("usage: MakeScaled <outDir> [factor] [tables]"))
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val only: Set[String] = args.drop(2).headOption
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    def wanted(t: String): Boolean = only.isEmpty || only(t)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-makescaled")

    def shiftOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head match {
        case r if r.isNullAt(0) => 1L
        case r => r.getLong(0) + 1L
      }
    def replicated(df: DataFrame)(per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => per(df, r)).reduce(_.unionByName(_))
    // single-FILE parquet per table, matching the driver's testdata
    // layout exactly — the streaming parity runs Files.copy the table as
    // a file (a directory copy stages an empty dir and the stream reads
    // nothing), and schema probes expect a file path
    def write(df: DataFrame, name: String): Unit = {
      import java.nio.file.{Files, Path, Paths, StandardCopyOption}
      import scala.jdk.CollectionConverters._
      def ls(p: Path): Seq[Path] = {
        val s = Files.list(p)
        try s.iterator().asScala.toSeq finally s.close()
      }
      val tmp = Paths.get(s"$outDir/.stage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = ls(tmp).find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file staged for $name"))
      Files.move(f, Paths.get(s"$outDir/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      ls(tmp).foreach(p => Files.deleteIfExists(p))
      Files.deleteIfExists(tmp)
      println(s"[makescaled] $name done")
    }

    Seq("region", "nation").filter(wanted).foreach { t =>
      write(Tables(spark, sfDir, t), t)
    }

    val cust = Tables(spark, sfDir, "customer")
    val custShift = shiftOf(cust, "c_custkey")
    if (wanted("customer"))
      write(replicated(cust)((d, r) =>
        d.withColumn("c_custkey", col("c_custkey") + lit(r * custShift))),
        "customer")

    val supp = Tables(spark, sfDir, "supplier")
    val suppShift = shiftOf(supp, "s_suppkey")
    if (wanted("supplier"))
      write(replicated(supp)((d, r) =>
        d.withColumn("s_suppkey", col("s_suppkey") + lit(r * suppShift))),
        "supplier")

    val part = Tables(spark, sfDir, "part")
    val partShift = shiftOf(part, "p_partkey")
    if (wanted("part"))
      write(replicated(part)((d, r) =>
        d.withColumn("p_partkey", col("p_partkey") + lit(r * partShift))),
        "part")

    val orders = Tables(spark, sfDir, "orders")
    val orderShift = shiftOf(orders, "o_orderkey")
    if (wanted("orders"))
      write(replicated(orders)((d, r) =>
        d.withColumn("o_orderkey", col("o_orderkey") + lit(r * orderShift))
          .withColumn("o_custkey", col("o_custkey") + lit(r * custShift))),
        "orders")

    val li = Tables(spark, sfDir, "lineitem")
    if (wanted("lineitem"))
      write(replicated(li)((d, r) =>
        d.withColumn("l_orderkey", col("l_orderkey") + lit(r * orderShift))
          .withColumn("l_partkey", col("l_partkey") + lit(r * partShift))
          .withColumn("l_suppkey", col("l_suppkey") + lit(r * suppShift))),
        "lineitem")

    val ev = Tables(spark, sfDir, "events")
    val evShift = shiftOf(ev, "event_id")
    val userShift = shiftOf(ev, "user_id")
    if (wanted("events"))
      write(replicated(ev)((d, r) =>
        d.withColumn("event_id", col("event_id") + lit(r * evShift))
          .withColumn("user_id", col("user_id") + lit(r * userShift))),
        "events")

    val docs = Tables(spark, sfDir, "documents")
    val docShift = shiftOf(docs, "doc_id")
    if (wanted("documents"))
      write(replicated(docs)((d, r) =>
        d.withColumn("doc_id", col("doc_id") + lit(r * docShift))
          .withColumn("text",
            if (r == 0) col("text")
            else array_join(transform(split(col("text"), " "),
              t => concat(lit(s"r${r}x"), t)), " "))),
        "documents")

    val emb = Tables(spark, sfDir, "embeddings")
    val vecShift = shiftOf(emb, "vec_id")
    // rotations of a 64-dim vector only have 64 distinct values, so at
    // factor > 64 the cycle would repeat and later replicas would be
    // EXACT copies of earlier ones (quadratic pair inflation — the
    // failure the rotation model exists to avoid). The second cycle
    // composes a GLOBAL SIGN FLIP: distances and norms inside a replica
    // are still preserved exactly, and a flipped copy sits at cosine −1
    // from its same-rotation sibling — maximally far from duplicate.
    // Two cycles bound factor at 128.
    require(factor <= 128 || !wanted("embeddings"),
      s"embedding replication supports factor <= 128, got $factor")
    if (wanted("embeddings"))
      write(replicated(emb)((d, r) =>
        d.withColumn("vec_id", col("vec_id") + lit(r * vecShift))
          .withColumn("embedding",
            if (r == 0) col("embedding")
            else {
              val n = size(col("embedding"))
              val sign = if (r < 64) 1.0f else -1.0f
              transform(sequence(lit(0), n - 1), i =>
                (element_at(col("embedding"), pmod(i + lit(7 * r), n) + 1)
                  * lit(sign)).cast("float"))
            })),
        "embeddings")

    spark.stop()
  }
}
