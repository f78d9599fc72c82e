package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("groupCountSortDesc: count desc, key asc tie-break (ref O1)") {
    val df = Seq("b", "a", "a", "c", "b").toDF("k")
    val got = Relational.groupCountSortDesc(df, "k")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("bucketHistogram: left-closed [lo,hi) buckets, ref label format (P11/P12)") {
    val df = Seq(0.0, 999.99, 1000.0, 1500.5, 2000.0).toDF("v")
    val got = Relational.bucketHistogram(df, "v", 1000L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("(0,1000)", 0L, 2L), ("(1000,2000)", 1000L, 2L), ("(2000,3000)", 2000L, 1L)))
  }

  test("groupRatio: exact count/total with bround scale 4 (ref T3-1)") {
    // 3 a's of 4 rows => 0.75 exactly; ref's sum-of-1/N would accumulate FP error
    val df = Seq("a", "a", "a", "b").toDF("k")
    val got = Relational.groupRatio(df, "k")
      .select("k", "ratio").as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 0.75), ("b", 0.25)))
  }

  test("bround is HALF_EVEN like the reference's f.bround (P9)") {
    val df = Seq(0.09998333).toDF("v").select(bround($"v", 4).as("r"))
    assert(df.as[Double].head() == 0.1) // the work3-1 golden's 0.1
  }

  test("parseWorkYear: null/-1, 10+/11, </0, leading-int semantics (P13)") {
    val df = Seq(Some("10+ years"), Some("< 1 year"), Some("6 years"),
      Some("1 year"), None).toDF("w")
      .select(Relational.parseWorkYear($"w").as("n"))
    assert(df.as[Int].collect().toSeq == Seq(11, 0, 6, 1, -1))
  }

  test("topNPerGroup: n rows max per group, unique-key tie-break") {
    val df = Seq((1, 10, 5.0), (1, 11, 5.0), (1, 12, 4.0), (2, 20, 1.0))
      .toDF("g", "id", "v")
    val got = Relational.topNPerGroup(df, "g", "v", "id", 2)
      .select("g", "id", "rn").as[(Int, Int, Int)].collect().toSeq
    assert(got == Seq((1, 10, 1), (1, 11, 2), (2, 20, 1)))
  }

  test("saltedJoin equals the plain equi-join (skew spreading only)") {
    val fact = Tables(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Tables(spark, sf0001, "customer")
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = fact.join(dim, "o_custkey")
      .groupBy("c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    val salted = graft.ops.Skew.saltedJoin(fact, dim, "o_custkey", 7)
      .groupBy("c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("all registered queries run at sf0.001 and every oracle key exists") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, name)
      df.count() // must execute
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
