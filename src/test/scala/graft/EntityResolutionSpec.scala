package graft

import org.apache.spark.sql.functions._

import graft.ops.EntityResolution

/** The ops/EntityResolution bounded-candidate contract: single-edit
  * recall via the prefix/suffix pigeonhole, deterministic caps, honest
  * drop accounting. The cross-engine value checks (JW scores, capped
  * candidate sets) live in the driver oracle gate (er_fuzzy_match,
  * er_block_stats). */
class EntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def ents = Tables(spark, sf001, "part")
    .select(col("p_partkey").as("cand_key"),
      concat(col("p_name"), lit("-"),
        (col("p_partkey") % 1000).cast("string")).as("name"))

  test("recall theorem: every single-deletion corruption shares a block " +
      "with its source entity, at EVERY deletion position") {
    // exhaustive over positions, not just the registered query's one
    // deterministic position per entity: corrupt a sample of entities at
    // every legal deletion position d in [2, len] and require the
    // (q_key=cand_key) pair to survive blocking. prefix+suffix = 10 <=
    // min name length is the theorem's precondition — assert it too.
    val sample = ents.filter(col("cand_key") % 101 === 0)
    val minLen = sample.agg(min(length(col("name")))).head.getInt(0)
    assert(minLen >= 10, s"corpus precondition broken: min name len $minLen")
    val dirty = sample
      .select(col("cand_key"), col("name"),
        explode(sequence(lit(2), length(col("name")))).as("d"))
      .select(col("cand_key").as("q_key"),
        concat(expr("substring(name, 1, d - 1)"),
          expr("substring(name, d + 1, 1000000)")).as("dirty"))
      .distinct() // deleting either of two equal adjacent chars
                  // yields the same dirty string
    val nDirty = dirty.count()
    val selfPairs = EntityResolution
      .blockedCandidates(ents, dirty)
      .filter(col("q_key") === col("cand_key"))
      .select("q_key", "dirty").distinct().count()
    assert(selfPairs == nDirty,
      s"blocking missed ${nDirty - selfPairs} of $nDirty corruptions")
  }

  test("candidate volume is bounded by queries x passes x maxBlock") {
    val dirty = ents.filter(col("cand_key") % 37 === 0)
      .select(col("cand_key").as("q_key"),
        expr("substring(name, 1, length(name) - 1)").as("dirty"))
    val nQ = dirty.count()
    val cap = 8
    val cands = EntityResolution
      .blockedCandidates(ents, dirty, maxBlock = cap)
    assert(cands.count() <= nQ * 2 * cap)
  }

  test("cap is deterministic: capped candidates are a stable subset " +
      "(first cand_keys per block), not an arbitrary one") {
    val dirty = ents.filter(col("cand_key") % 37 === 0)
      .select(col("cand_key").as("q_key"),
        expr("substring(name, 1, length(name) - 1)").as("dirty"))
    val a = EntityResolution.blockedCandidates(ents, dirty, maxBlock = 8)
      .select("q_key", "cand_key").as[(Long, Long)].collect().toSet
    val b = EntityResolution.blockedCandidates(ents, dirty, maxBlock = 8)
      .select("q_key", "cand_key").as[(Long, Long)].collect().toSet
    assert(a == b)
    // capped set is contained in the uncapped set
    val full = EntityResolution
      .blockedCandidates(ents, dirty, maxBlock = Int.MaxValue)
      .select("q_key", "cand_key").as[(Long, Long)].collect().toSet
    assert(a.subsetOf(full))
  }

  test("blockStats drop accounting matches the capped candidate loss") {
    val stats = EntityResolution.blockStats(ents, maxBlock = 8)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats.keySet == Set("p", "s"))
    val (_, _, nEnts, maxBlk, dropped) = stats("p")
    assert(nEnts == ents.count())
    assert(maxBlk > 8, "test premise: prefix blocks exceed the toy cap")
    assert(dropped > 0, "a binding cap must report drops")
    // uncapped stats report zero drops
    val clean = EntityResolution.blockStats(ents, maxBlock = 1000000)
      .agg(sum("n_dropped")).head.getLong(0)
    assert(clean == 0L)
  }

  test("globalRank equals a plain global row_number (distributed rank " +
      "construction, string keys)") {
    import org.apache.spark.sql.expressions.Window
    val rows = ents.limit(500)
      .select(col("name"), lit("e").as("side"), col("cand_key").as("key"))
    val got = EntityResolution.globalRank(rows, Seq("side", "key"))
      .select("key", "rn").as[(Long, Long)].collect().toMap
    // oracle: the single-partition window (fine in a TEST)
    val want = rows.withColumn("rn",
        row_number().over(Window.orderBy("name", "side", "key")).cast("long"))
      .select("key", "rn").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("sortedNeighborhood: candidate volume is a hard O(q x 2w); the " +
      "registered corruption is found when it sorts within the window") {
    val dirty = ents.filter(col("cand_key") % 37 === 0)
      .withColumn("pos", (lit(5) +
        col("cand_key") % (length(col("name")) - lit(5))).cast("int"))
      .select(col("cand_key").as("q_key"),
        concat(expr("substring(name, 1, pos)"),
          expr("substring(name, pos + 2, 1000000)")).as("dirty"))
    val w = 10
    val out = EntityResolution.sortedNeighborhood(ents, dirty, window = w)
    val nq = dirty.count()
    assert(out.count() <= nq * (2 * w + 1))
    // heuristic recall: a deletion inside the name stem jumps the whole
    // same-stem suffix block (~N/64 rows — larger than any fixed
    // window), so SN alone finds ~45% here (measured). The assertion
    // guards collapse-to-zero, not totality — full recall is the
    // prefix/suffix passes' theorem; production unions both.
    val self = out.filter(col("q_key") === col("cand_key")).count()
    assert(self * 10 >= nq * 3, s"self-recall collapsed: $self of $nq")
  }

  test("er clusters: every surviving match pair shares a cluster") {
    val dirty = ents.filter(col("cand_key") % 37 === 0)
      .withColumn("pos", (lit(5) +
        col("cand_key") % (length(col("name")) - lit(5))).cast("int"))
      .select(col("cand_key").as("q_key"),
        concat(expr("substring(name, 1, pos)"),
          expr("substring(name, pos + 2, 1000000)")).as("dirty"))
    val pairs = EntityResolution.fuzzyMatch(ents, dirty)
      .filter(col("q_key") =!= col("cand_key"))
      .select(col("q_key").as("da"), col("cand_key").as("db"))
    val clusters = graft.ops.Dedup.resolveClusters(pairs)
      .as[(Long, Long)].collect().toMap
    pairs.as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("fuzzyMatch finds the registered corruption set at >= 9000 bp") {
    val dirty = ents.filter(col("cand_key") % 37 === 0)
      .withColumn("pos", (lit(5) +
        col("cand_key") % (length(col("name")) - lit(5))).cast("int"))
      .select(col("cand_key").as("q_key"),
        concat(expr("substring(name, 1, pos)"),
          expr("substring(name, pos + 2, 1000000)")).as("dirty"))
    val matches = EntityResolution.fuzzyMatch(ents, dirty)
    val self = matches.filter(col("q_key") === col("cand_key"))
    assert(self.count() == dirty.count(),
      "every one-char-deleted name must match its source at >= 9000 bp")
    val bad = matches.agg(min("jw_bp")).head.getLong(0)
    assert(bad >= 9000L)
  }

  test("goldenRecords: field-level survivorship, not row-wise winner-take-all") {
    // cluster 1: best name on r1, best amount on r2 — the golden record
    // must combine fields from DIFFERENT members; r3's null never wins
    // cluster 2: name-length tie -> lexicographically smaller survives;
    // category mode ties -> smaller value
    val rec = Seq(
      (1L, "alice anderson", Some(100L), "gold"),
      (1L, "alice", Some(900L), "gold"),
      (1L, "alice a", None: Option[Long], "silver"),
      (2L, "bob b", Some(5L), "tin"),
      (2L, "bob a", Some(5L), "zinc"))
      .toDF("cluster_key", "name", "amount", "category")
    val got = EntityResolution.goldenRecords(rec,
        "cluster_key", "name", "amount", "category")
      .as[(Long, Long, String, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, "alice anderson", 900L, 1L, "gold"),
      (2L, 2L, "bob a", 5L, 0L, "tin")))
  }
}
