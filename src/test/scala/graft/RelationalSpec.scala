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

  test("rollupCounts: subtotal rows carry grouping_id, grand total = n") {
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("k1", "k2")
    val out = Relational.rollupCounts(df, "k1", "k2").collect()
    // 3 leaf rows + 2 k1 subtotals + 1 grand total
    assert(out.length == 6)
    val grand = out.filter(_.getInt(3) == 3)
    assert(grand.length == 1 && grand.head.getLong(2) == 3)
    val k1Subtotals = out.filter(_.getInt(3) == 1).map(r =>
      r.getString(0) -> r.getLong(2)).toMap
    assert(k1Subtotals == Map("a" -> 2L, "b" -> 1L))
  }

  test("pivotCounts: declared values become columns, missing combos are 0") {
    val df = Seq(("s1", "p1"), ("s1", "p1"), ("s2", "p2")).toDF("seg", "pri")
    val out = Relational.pivotCounts(df, "seg", "pri", Seq("p1", "p2"))
    assert(out.columns.toSeq == Seq("seg", "p1", "p2"))
    val rows = out.as[(String, Long, Long)].collect().toSeq
    assert(rows == Seq(("s1", 2L, 0L), ("s2", 0L, 1L)))
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

  test("bandedRangeJoin equals the brute non-equi interval join") {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}
    val events = Tables(spark, sf0001, "events")
    val banded = graft.ops.Events.bandedRangeJoin(events)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // brute force: plain theta join, same window arithmetic
    val us = org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), us.as("us"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), us.as("vus"), col("value"))
    val brute = clicks.join(views,
        col("vu") === col("user_id") &&
          col("vus") >= col("us") - 3600000000L && col("vus") < col("us"),
        "left")
      .groupBy("user_id", "event_id", "us")
      .agg(count(col("vus")).as("n"),
        coalesce(sum(col("value")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double"),
          lit(0.0d)).as("s"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(banded == brute)
  }

  test("Cdc.apply: latest version wins, deletes remove, inserts survive") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", 1L, "U"), // update key 2
      (3L, "c", 1L, "D"),  // delete key 3
      (4L, "d", 1L, "I"),  // insert key 4
      (2L, "b3", 2L, "U")  // later update wins over earlier
    ).toDF("k", "v", "version", "op")
    val out = graft.ops.Cdc.apply(base, changes, "k")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b3", 4L -> "d"))
  }

  test("topTerms ranks by tf desc then term asc, stopwords excluded") {
    val docs = Seq((1L, "b b x the the the c")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.topTerms(docs)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, "b", 2L), (1L, 2L, "c", 1L), (1L, 3L, "x", 1L)))
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
