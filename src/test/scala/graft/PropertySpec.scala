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
}
