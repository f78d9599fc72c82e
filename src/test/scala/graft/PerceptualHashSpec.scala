package graft

import graft.ops.Multimodal

/** The perceptual-hash (dHash) multimodal-dedup family:
  * mm_dhash_real / mm_phash_neardup. */
class PerceptualHashSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent closed-form recompute of the dHash halves — the same
    * arithmetic the DuckDB oracle runs, written without touching the
    * kernel (no ImageIO, no resample code shared). */
  private def expectedHash(id: Long, v: Int): (Long, Long) = {
    val w = 9 + (id % 8).toInt
    val h = 8 + ((id % 8) * 5 % 8).toInt
    val a = ((id % 256) * 31 % 256).toInt
    val pj = (id % (w * h)).toInt
    def px(x: Int, y: Int): Int = {
      val i = (y * h / 8) * w + (x * w / 9)
      val base = ((a + 73L * i) % 256).toInt
      if (v == 1 && i == pj) (base + 96) % 256 else base
    }
    var hi = 0L; var lo = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      val idx = y * 8 + x
      if (px(x + 1, y) > px(x, y)) {
        if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
      }
    }
    (hi, lo)
  }

  private val docs = (0L until 150L).toDF("doc_id")

  test("real decode→resample→hash chain matches the closed form") {
    val got = Multimodal.dhashReal(spark, docs)
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 300)
    for (id <- 0L until 150L; v <- 0 to 1)
      assert(got((id, v)) == expectedHash(id, v),
        s"hash mismatch for doc_id=$id variant=$v")
  }

  test("variant twins are byte-different but Hamming-near (dist <= 2)") {
    for (id <- 0L until 150L) {
      val b0 = Multimodal.synthHashPngBytes(id, 0)
      val b1 = Multimodal.synthHashPngBytes(id, 1)
      assert(!java.util.Arrays.equals(b0, b1),
        s"variants of $id should differ at the byte level")
      val (h0, l0) = expectedHash(id, 0)
      val (h1, l1) = expectedHash(id, 1)
      val dist = java.lang.Long.bitCount(h0 ^ h1) +
        java.lang.Long.bitCount(l0 ^ l1)
      assert(dist <= 2, s"twin distance $dist > 2 for doc_id=$id")
    }
  }

  test("banded near-dup join == brute-force pairs at dist <= 3") {
    // ground truth over DISTINCT hashes (identical images collapse to
    // their min-key representative, like the operator)
    val hashes = (for (id <- 0L until 150L; v <- 0 to 1)
      yield (id * 2 + v, expectedHash(id, v)))
    val groups = hashes.groupBy(_._2).map { case (h, ks) =>
      (ks.map(_._1).min, h) }.toSeq
    val brute = (for {
      (lr, (lh, ll)) <- groups; (rr, (rh, rl)) <- groups
      if lr < rr
      d = java.lang.Long.bitCount(lh ^ rh) + java.lang.Long.bitCount(ll ^ rl)
      if d <= 3
    } yield (lr, rr, d)).toSet
    assert(brute.nonEmpty, "corpus should contain near-dup pairs")
    val got = Multimodal.phashNearDup(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // pigeonhole: <= 3 differing bits leave one of 4 bands intact, so the
    // banded join reaches EVERY brute pair — equality, not containment
    assert(got == brute)
  }

  test("hot-band cap bounds candidates and reports the drop volume") {
    // default cap (64) never fires on this corpus: stats row is zeros
    // and the capped result equals the uncapped brute equality above
    val quiet = Multimodal.phashCapStats(spark, docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(quiet.toSeq == Seq(("phash_band", 0L, 0L)))

    // force the cap with maxBucket = 0: every band bucket is hot, so no
    // candidates survive, and the stats at the same threshold account
    // for every banded row of every distinct hash (4 bands per rep)
    val capped = Multimodal.phashNearDup(spark, docs, maxBucket = 0)
    assert(capped.count() == 0)
    val nReps = Multimodal.dhashReal(spark, docs)
      .select("hash_hi", "hash_lo").distinct().count()
    val stats = Multimodal.phashCapStats(spark, docs, maxBucket = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.length == 1 && stats.head._3 == nReps * 4,
      s"dropped-row accounting should cover all ${nReps * 4} banded rows: $stats")
  }

  test("audioFingerprint: decoded energies recover the planted pattern; flip = hamming 1") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(0L, 1L, 3L, 4L, 7L, 8L).toDF("doc_id")
    val got = graft.ops.Multimodal.audioFingerprint(spark, docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    def pat(id: Long) = (id * 37 + 11) % 65536
    assert(got.map(_._1) == Seq(0L, 1L, 3L, 4L, 7L, 8L))
    got.foreach { case (id, fp0, fp1, h) =>
      assert(fp0 == pat(id), s"doc $id fp0")
      if (id % 4 == 0) {
        assert(fp1 == (pat(id) ^ (1L << (id % 16).toInt)) && h == 1L,
          s"doc $id should be a planted hamming-1 near-dup")
      } else assert(fp1 == fp0 && h == 0L, s"doc $id variants identical")
    }
  }
}
