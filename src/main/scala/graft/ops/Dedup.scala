package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Texty

/** Deduplication operators for a training-data pipeline (BASELINE.json
  * north star — SURVEY.md §2h EXT). Exact, n-gram-Jaccard, MinHash-LSH
  * and SimHash variants, all built from native Catalyst expressions
  * (xxhash64, higher-order array functions) — no UDFs, no driver loops.
  *
  * Scale design: every variant is shuffle-bounded by (a) a doc-frequency
  * cap on shingles and (b) a bucket-size cap on LSH bands, so a pathological
  * hot key (boilerplate text repeated across millions of docs) degrades to
  * dropped candidates, never to an executor-OOM quadratic join. Dropped
  * volume is observable in the `*_capped` counters of capStats.
  */
object Dedup {

  /** Exact dedup: group identical text, keep the smallest id. Hash-groupBy
    * on the full text value — at scale, group on md5(text) instead of the
    * raw value to keep shuffle rows narrow; both are exposed here. */
  def exact(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame =
    docs.groupBy(md5(col(text)).as("fp"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("keep_id")

  /** Distinct (doc, shingle) pairs with a document-frequency cap: shingles
    * appearing in more than `maxDf` docs are boilerplate — they generate
    * O(df²) candidate pairs for no signal, so they are dropped (standard
    * stop-shingle trick; the cap is part of the operator contract).
    *
    * The cap is an aggregate to a (small) hot-list + broadcast anti-join,
    * NOT a count-over-window: a window would sort-shuffle every shingle
    * row, while the hot-list is bounded by the number of boilerplate
    * shingles regardless of corpus size. */
  def shingles(docs: DataFrame, k: Int, maxDf: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val sh = docs
      .select(col(id).as("doc_id"),
        explode(Texty.wordShingles(col(text), k)).as("s"))
    val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("s")
    sh.join(broadcast(hot), Seq("s"), "left_anti")
      .select("doc_id", "s")
  }

  /** Exact n-gram Jaccard near-dup pairs: candidate pairs share >=1 kept
    * shingle; jaccard = |A∩B| / (|A|+|B|-|A∩B|), reported in exact basis
    * points. The shingle-equijoin is a plain shuffle hash join on `s` —
    * partitioned by shingle, so co-occurrence counting is local. */
  def ngramJaccard(docs: DataFrame, k: Int = 3, maxDf: Int = 100,
      minJaccardBp: Long = 5000): DataFrame = {
    val sh = shingles(docs, k, maxDf)
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("c"))
    common
      .join(n.withColumnRenamed("doc_id", "da").withColumnRenamed("n_sh", "na"), "da")
      .join(n.withColumnRenamed("doc_id", "db").withColumnRenamed("n_sh", "nb"), "db")
      .withColumn("jaccard_bp",
        Texty.ratioBp(col("c"), col("na") + col("nb") - col("c")))
      .filter(col("jaccard_bp") >= minJaccardBp)
      .select("da", "db", "jaccard_bp")
      .orderBy("da", "db")
  }

  val MinhashK = 32 // signature length
  val MinhashBands = 8 // bands of 4 rows => catches jaccard >≈ 0.5

  /** MinHash signatures: column m0..m31 = min over shingles of a seeded
    * 64-bit hash. One partial/final aggregate over the exploded shingles —
    * the signature never leaves the executors un-aggregated. */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val aggs = (0 until MinhashK).map(k =>
      min(xxhash64(lit(k), col("s"))).as(s"m$k"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash+LSH near-dup candidates: band signatures into 8 buckets of 4
    * components, join docs sharing a bucket, then score candidates by
    * matching signature components (sig_matches/32 estimates jaccard).
    * `maxBucket` caps pathological buckets (see class doc). */
  def minhashLsh(docs: DataFrame, k: Int = 3, maxDf: Int = 100,
      maxBucket: Int = 50, minSigMatches: Int = 16): DataFrame = {
    val sig = minhashSignatures(shingles(docs, k, maxDf))
    val bandCols = (0 until MinhashBands).map { b =>
      xxhash64((lit(b) +: (0 until 4).map(j => col(s"m${4 * b + j}"))): _*)
    }
    val banded = sig.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
    val hotBuckets = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bs")).filter(col("bs") > maxBucket)
      .select("band_idx", "band_hash")
    val kept = banded
      .join(broadcast(hotBuckets), Seq("band_idx", "band_hash"), "left_anti")
    val cand = kept.as("a").join(kept.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val matches = (0 until MinhashK)
      .map(j => when(col(s"sa.m$j") === col(s"sb.m$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sig.as("sa"), col("da") === col("sa.doc_id"))
      .join(sig.as("sb"), col("db") === col("sb.doc_id"))
      .withColumn("sig_matches", matches)
      .filter(col("sig_matches") >= minSigMatches)
      .select("da", "db", "sig_matches")
      .orderBy("da", "db")
  }

  /** 64-bit SimHash per document: weighted token hashes vote per bit.
    * Implemented as one 64-expression aggregate over (doc, token, weight) —
    * wide but single-pass and fully codegen'd. */
  def simhash(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val tok = docs
      .select(col(id).as("doc_id"),
        explode(Texty.tokens(col(text))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("w"))
      .withColumn("h", xxhash64(col("tok")))
    val bitAggs = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("w"))
        .otherwise(-col("w"))).as(s"b$i"))
    val bits = tok.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val sh = (0 until 64)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    bits.select(col("doc_id"), sh.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming, blocked
    * on 4 x 16-bit chunks (pigeonhole: any pair within hamming 3 shares at
    * least one exact chunk). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 100): DataFrame = {
    val sh = simhash(docs)
    val chunks = (0 until 4).map(j =>
      shiftrightunsigned(col("simhash"), j * 16).bitwiseAND(0xFFFFL))
    val blocked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array(chunks: _*)).as(Seq("chunk_idx", "chunk")))
    val hotChunks = blocked.groupBy("chunk_idx", "chunk")
      .agg(count(lit(1)).as("bs")).filter(col("bs") > maxBucket)
      .select("chunk_idx", "chunk")
    val kept = blocked
      .join(broadcast(hotChunks), Seq("chunk_idx", "chunk"), "left_anti")
    kept.as("a").join(kept.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("da", "db")
  }
}
