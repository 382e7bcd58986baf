package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The decode step is a STUB — this container has no image/audio codecs —
  * but the Spark-side plumbing is real and tested: binary payload column,
  * schema of the decoded features, batched per-partition processing with an
  * iterator (never materializing a partition in memory), and deterministic
  * output so tests and oracles stay stable. At scale you swap
  * `fakeDecode` for a real codec call and nothing else changes; the
  * per-partition iterator shape is exactly how a JNI/FFmpeg/JPEG decoder
  * would be amortized (init once per partition, stream rows through).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                        channels: Int, checksum: Long)

  /** Attach a binary payload column (UTF-8 bytes of the text stand in for
    * real media bytes) plus byte-level metadata. Pure projection.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"))

  /** ??? in spirit: a deterministic fake decoder. Derives fake
    * image dimensions from the payload bytes. REPLACE with a real codec at
    * deployment; signature and batch shape are the contract.
    */
  private[operators] def fakeDecode(payload: Array[Byte]): (Int, Int, Int, Long) = {
    var cs = 0L
    var i = 0
    while (i < payload.length) { cs = (cs * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
    val w = 16 + (cs % 240).toInt
    val h = 16 + ((cs / 240) % 240).toInt
    ((w, h, 3, cs))
  }

  /** Batched per-partition "decode": one decoder init per partition, rows
    * streamed through an iterator. Output is a typed Dataset with the
    * decoded-feature schema.
    */
  def decodePartitions(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: init codec/session HERE, once per partition
      rows.map { r =>
        val (w, h, c, cs) = fakeDecode(r.payload)
        DecodedRow(r.doc_id, r.payload.length, w, h, c, cs)
      }
    }
  }
}
