package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Relational

/** Property tests (SURVEY.md §5 strategy (4)): bucket-label round-trip,
  * work-year parser totality, top-group sort stability. Raw ScalaCheck
  * generators sampled with fixed seeds (the scalatest bridge artifact is
  * not on the offline classpath). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("bucket label parses back to its own bucket_lo (P11/P12 round-trip)") {
    samples(Gen.listOfN(30, Gen.choose(0.0, 500000.0)), 5).foreach { vs =>
      val out = Relational
        .bucketHistogram(vs.toDF("v"), "v", 1000L)
        .as[(String, Long, Long)].collect()
      out.foreach { case (label, lo, _) =>
        // label "(lo,hi)" must parse back to exactly lo, hi = lo+1000
        val inner = label.stripPrefix("(").stripSuffix(")").split(",")
        assert(inner(0).toLong == lo && inner(1).toLong == lo + 1000)
      }
      assert(out.map(_._3).sum == vs.length)
      // every value's floor-bucket appears
      vs.foreach { v =>
        val lo = (math.floor(v / 1000) * 1000).toLong
        assert(out.exists(_._2 == lo))
      }
    }
  }

  test("parseWorkYear is total: any string, null, or numeric form maps to an int") {
    val gen = Gen.oneOf(
      Gen.const(null: String),
      Gen.const("10+ years"),
      Gen.const("< 1 year"),
      Gen.choose(1, 9).map(n => s"$n years"),
      Gen.alphaStr.map(s => s.take(8) + " years"))
    samples(Gen.listOfN(25, gen), 5).foreach { ws =>
      val out = ws.toDF("w")
        .select(Relational.parseWorkYear(col("w")).as("n"))
        .collect()
      assert(out.length == ws.length)
      ws.zip(out).foreach { case (w, r) =>
        if (w == null) assert(r.getInt(0) == -1)
        else if (w.contains("10+")) assert(r.getInt(0) == 11)
        else if (w.contains("<")) assert(r.getInt(0) == 0)
        else if (w.nonEmpty && w.head.isDigit)
          assert(r.getInt(0) == w.split(" ")(0).toInt)
        else assert(r.isNullAt(0)) // unparseable "xyz years" -> null int
      }
    }
  }

  test("groupCountSortDesc is a stable total order (O1 tie-break)") {
    samples(Gen.listOfN(60, Gen.oneOf("a", "b", "c", "d", "e")), 5)
      .foreach { ks =>
        val out = Relational.groupCountSortDesc(ks.toDF("k"), "k")
          .as[(String, Long)].collect().toSeq
        assert(out == out.sortBy(r => (-r._2, r._1)))
        assert(out.map(_._2).sum == ks.length)
      }
  }

  test("jaccardPrefix is lossless vs brute pairwise Jaccard on random corpora") {
    // random small docs over a tiny vocabulary => dense high-jaccard
    // pairs, plus planted exact duplicates to force the group expansion
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.choose(4, 9).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    samples(Gen.listOfN(12, doc), 4).zipWithIndex.foreach { case (texts, si) =>
      val docs = (texts :+ texts.head) // planted duplicate of doc 0
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ops.Dedup.jaccardPrefix(docs)
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, j) => ((a, b), j) }.toMap
      // brute force in Scala on the same distinct-shingle sets
      def sh(t: String): Set[String] = {
        val w = t.split(" ")
        (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
      }
      val byId = (texts :+ texts.head).zipWithIndex
        .map { case (t, i) => i.toLong -> sh(t) }.toMap
      val want = (for {
        a <- byId.keys; b <- byId.keys if a < b
        sa = byId(a); sb = byId(b)
        c = (sa & sb).size
        u = (sa | sb).size
        if u > 0
        j = c.toLong * 10000L / u
        if j >= 5000L
      } yield ((a, b), j)).toMap
      assert(got == want, s"seed $si: prefix join diverged from brute")
    }
  }

  test("containmentPrefix is lossless vs brute directed containment on random corpora") {
    // same adversarial regime as the jaccardPrefix property: tiny
    // vocabulary => dense overlaps, plus a planted exact duplicate
    // (duplicates contain each other at 10000 both directions)
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.choose(4, 9).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    samples(Gen.listOfN(12, doc), 4).zipWithIndex.foreach { case (texts, si) =>
      val docs = (texts :+ texts.head)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ops.Dedup.containmentPrefix(docs)
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, c) => ((a, b), c) }.toMap
      def sh(t: String): Set[String] = {
        val w = t.split(" ")
        (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
      }
      val byId = (texts :+ texts.head).zipWithIndex
        .map { case (t, i) => i.toLong -> sh(t) }.toMap
      val want = (for {
        a <- byId.keys; b <- byId.keys if a != b
        sa = byId(a); sb = byId(b)
        if sa.nonEmpty
        c = (sa & sb).size
        bp = c.toLong * 10000L / sa.size
        if bp >= 8000L
      } yield ((a, b), bp)).toMap
      assert(got == want, s"seed $si: containment prefix join diverged from brute")
    }
  }

  test("NfcNormalize is idempotent and length-bounded on arbitrary unicode") {
    val gen = Gen.listOfN(12,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('\u00e9', '\u0301', '\u00fc',
        '\u0308', '\u00c5', 'A', '\u030a'))).map(_.mkString)
    samples(Gen.listOfN(20, gen), 4).foreach { ss =>
      val out = ss.toDF("t")
        .select(graft.functions.NfcNormalize(col("t")).as("n1"))
        .select(col("n1"),
          graft.functions.NfcNormalize(col("n1")).as("n2"))
        .as[(String, String)].collect()
      out.foreach { case (n1, n2) =>
        assert(n1 == n2, "NFC must be idempotent")
        assert(java.text.Normalizer
          .isNormalized(n1, java.text.Normalizer.Form.NFC))
      }
    }
  }

  test("funnel laws on random event streams: stages shrink, gaps only cut") {
    import graft.ops.Events
    val evGen = Gen.listOfN(120, for {
      u <- Gen.choose(1L, 6L)
      t <- Gen.choose(0L, 5000L)
      s <- Gen.oneOf("view", "click", "purchase", "other")
    } yield (u, t, s))
    samples(evGen, 3).foreach { rows =>
      val ev = rows.zipWithIndex.map { case ((u, t, s), i) =>
        (i.toLong, u, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(t)), s)
      }.toDF("event_id", "user_id", "ts", "event_type")
      def counts(df: org.apache.spark.sql.DataFrame) =
        df.select("n_users").as[Long].collect().toSeq
      val untimed = counts(Events.funnel(ev))
      val timed = counts(Events.funnelTimed(ev, maxGapMinutes = 10))
      val wide = counts(Events.funnelTimed(ev, maxGapMinutes = 1000000))
      // stage counts never increase along the funnel
      assert(untimed == untimed.sorted.reverse)
      assert(timed == timed.sorted.reverse)
      // a time gap can only CUT conversions, stage by stage...
      timed.zip(untimed).foreach { case (t, u) => assert(t <= u) }
      // ...and a gap wider than the whole stream cuts nothing
      assert(wide == untimed)
      // inter-arrival bookkeeping: one gap per event beyond each
      // user's first, every gap non-negative
      val ia = Events.interArrival(ev)
        .select("n_gaps", "min_gap_us").as[(Long, Long)].collect()
      val nUsers = rows.map(_._1).distinct.length
      assert(ia.map(_._1).sum == rows.length - nUsers)
      assert(ia.forall(_._2 >= 0L))
    }
  }

  test("temporalJoin totality: every fact joins exactly one version") {
    import graft.ops.{Cdc, Events => Ev}
    val evGen = Gen.listOfN(80, for {
      u <- Gen.choose(1L, 5L)
      t <- Gen.choose(0L, 2000L)
      s <- Gen.oneOf("A", "B", "C")
    } yield (u, t, s))
    samples(evGen, 3).foreach { rows =>
      val ev = rows.zipWithIndex.map { case ((u, t, s), i) =>
        (i.toLong, u, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(t)), s)
      }.toDF("event_id", "user_id", "ts", "event_type")
      val evU = ev.select(col("user_id"), col("event_id"),
        col("event_type"), Ev.tsUs(ev).as("us"))
      val dim = Cdc.scd2(evU, "user_id", "event_type", "us", "event_id")
        .select(col("user_id"), col("event_type").as("state"),
          col("valid_from_us"), col("valid_to_us"))
      val joined = Cdc.temporalJoin(
        evU.select("user_id", "event_id", "us"), dim, "user_id", "us")
      // the version windows partition each user's timeline from their
      // first event on, so every fact matches EXACTLY one version
      assert(joined.count() == rows.length.toLong)
      assert(joined.select("event_id").distinct().count() == rows.length)
    }
  }

  test("sketch merge laws hold on random key multisets and shardings") {
    import graft.ops.Sketches
    val keysGen = Gen.listOfN(400,
      Gen.oneOf(Gen.choose(0L, 50L), Gen.choose(0L, 1000000L)))
    samples(keysGen, 3).zipWithIndex.foreach { case (keys, i) =>
      val df = keys.toDF("k")
      val splitBit = 2 + i // vary the sharding, not just the data
      val odd = df.filter(col("k") % splitBit =!= 0)
      val even = df.filter(col("k") % splitBit === 0)
      // HLL: register-wise max of shard sketches ≡ sketch of the whole
      val hllFull = Sketches.hllRegisters(df, "k")
      val hllMerged = Sketches.hllMergeRegisters(
        Sketches.hllRegisters(odd, "k"), Sketches.hllRegisters(even, "k"))
      assert(hllMerged.exceptAll(hllFull).isEmpty
        && hllFull.exceptAll(hllMerged).isEmpty)
      // histogram: shard bin counts ADD; histQuantilesBy re-sums, so
      // feeding it the raw shard UNION equals the whole-data build
      val (lo, width, bins) = (0L, 4096L, 256)
      val hFull = Sketches.histQuantiles(
        Sketches.histCounts(df, "k", lo, width, bins),
        Seq(2500, 9900), lo, width, bins)
      val hShards = Sketches.histQuantiles(
        Sketches.histCounts(odd, "k", lo, width, bins).unionByName(
          Sketches.histCounts(even, "k", lo, width, bins)),
        Seq(2500, 9900), lo, width, bins)
      assert(hShards.exceptAll(hFull).isEmpty
        && hFull.exceptAll(hShards).isEmpty)
      // KMV: occurrence multiplicity is invisible; estimate exact < k
      val est = Sketches.kmvSummary(Sketches.kmvBottom(df, "k"))
        .select("est_distinct").as[Long].collect().head
      val dupEst = Sketches
        .kmvSummary(Sketches.kmvBottom(df.unionByName(df), "k"))
        .select("est_distinct").as[Long].collect().head
      assert(est == dupEst)
      val trueDistinct = keys.distinct.length.toLong
      if (trueDistinct < Sketches.KmvK)
        assert(est == trueDistinct,
          s"KMV must be exact below k: $est vs $trueDistinct")
    }
  }
}
