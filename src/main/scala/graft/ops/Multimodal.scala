package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north star; SURVEY.md §2h).
  *
  * Media (image/audio/video) is carried as an opaque `binary` column plus
  * typed metadata. The container has no image/audio codecs, so the decode
  * kernel is a clearly-marked DETERMINISTIC STUB — but everything Spark
  * cares about is real: the schema, the binary column lifecycle, the
  * per-partition batched execution shape (mapPartitions with fixed-size
  * batches, exactly how a vectorized decoder is driven), and partitioning.
  *
  * The corpus has no media files, so the binary payload is synthesized
  * from documents.text (UTF-8 bytes) — stands in for any blob column.
  */
object Multimodal {

  /** Decoded-media metadata produced by the (stub) decode kernel. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, checksum: Long)

  /** Batch size a real vectorized decoder would be driven at. */
  val DecodeBatch = 64

  /** Attach the opaque binary column + cheap native metadata. Everything
    * here is a codegen'd projection — no decode needed for byte length /
    * content hash, so filters on these never touch the (expensive) kernel. */
  def withBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      md5(col("text")).as("fp"))

  /** ====== STUB ====== Deterministic fake decode of one payload.
    * A real implementation would hand `bytes` to an image/audio library
    * (not present in this container) and return true dimensions; the fake
    * derives plausible values purely from the byte content so tests are
    * stable. Swap this single function for the real kernel. */
  private def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xFF).toLong * 31 + 7; i += 1 }
    MediaMeta(
      doc_id = docId,
      n_bytes = bytes.length.toLong,
      width = 64 + (bytes.length % 512),
      height = 64 + ((bytes.length * 31) % 512),
      n_frames = 1 + (sum % 16).toInt,
      checksum = sum)
  }

  /** Batched per-partition decode: the real execution shape for a media
    * kernel (grouped iterator => one kernel invocation per DecodeBatch
    * payloads, results streamed out — constant memory per partition).
    * Stays distributed: no collect, no driver involvement. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val bin = withBinary(docs).select("doc_id", "payload")
      .as[(Long, Array[Byte])]
    bin.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        // one "kernel call" per batch (stubbed per-element here)
        batch.map { case (id, bytes) => decodeStub(id, bytes) }
      }
    }.toDF().orderBy("doc_id")
  }

  /** Native-expression twin of the stub's size-derived fields (no kernel,
    * pure Catalyst arithmetic) — oracle-checkable, and shows that metadata
    * predicates can be evaluated without decoding. */
  def binaryMeta(docs: DataFrame): DataFrame =
    withBinary(docs)
      .withColumn("stub_width", (lit(64) + col("n_bytes") % 512).cast("int"))
      .withColumn("stub_height", (lit(64) + (col("n_bytes") * 31) % 512).cast("int"))
      .drop("payload")
      .orderBy("doc_id")
}
