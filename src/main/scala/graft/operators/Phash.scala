package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-duplicate detection — the multimodal face of
  * the dedup family: text dedups on MinHash/SimHash, images dedup on a
  * pixel-content fingerprint that survives re-encoding (the SAME gradient
  * stored as BMP vs PNG hashes identically, because the hash sees decoded
  * luma, not container bytes).
  *
  * The fingerprint is an average hash (aHash): nearest-neighbor-downsample
  * the luma plane to 8×8, set bit i iff sample i is brighter than the mean
  * of the 64 samples. Kept INTEGER-exact end-to-end (the bit test is
  * `64·sample > Σsamples`, no float mean) so another engine can recompute
  * the hash from pixel arithmetic and verify ours bit-for-bit.
  *
  * Scale shape (100 TB of images):
  *  - decode + hash is a map-only `mapPartitions` pass — the payload bytes
  *    move ZERO times; only (doc_id, 4×16-bit bands) ever shuffles;
  *  - candidate generation is the banded equi-join of the MinHash-LSH
  *    family (`expressions/MinHash.scala`): 4 bands of 16 bits, a pair
  *    collides iff some band matches — by pigeonhole this catches every
  *    pair within hamming distance 3, and in practice nearly everything
  *    within the rescore radius; never an all-pairs product;
  *  - the exact hamming rescore joins band rows back per candidate pair:
  *    4 rows per side per pair, `bit_count(xor)` partial-aggregated.
  */
object Phash {

  val Bands = 4
  val BandBits = 16

  /** 8×8 nearest-neighbor average hash of a luma plane as four 16-bit band
    * values (band b bit j ⇔ sample 16b+j brighter than the mean). Bands
    * are first-class rather than packed into one i64 because they are the
    * LSH join key anyway — and 16-bit shifts sidestep engine-specific
    * sign-bit semantics at bit 63.
    */
  def aHashBands(px: MediaCodec.Pixels): Array[Long] = {
    val s = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val sx = ((i % 8) * px.width) / 8
      val sy = ((i / 8) * px.height) / 8
      val v = px.luma(sy * px.width + sx)
      s(i) = v; sum += v; i += 1
    }
    val bands = new Array[Long](Bands)
    i = 0
    while (i < 64) {
      if (s(i) * 64L > sum) bands(i / BandBits) |= 1L << (i % BandBits)
      i += 1
    }
    bands
  }

  final case class BandRow(doc_id: Long, band: Int, bv: Long)

  /** Decode payloads and hash, one codec pass per partition: doc →
    * [[Bands]] (band, value) rows. This is the only stage that touches
    * image bytes.
    *
    * One malformed image in 100 TB must not fail the job: each row's
    * decode is tried individually, failures are counted in `quarantined`
    * and excluded (MediaCodec's "quarantine, don't guess" posture — the
    * codec throws IllegalArgumentException on anything it can't decode
    * exactly; here that row is routed out instead of crashing the pass).
    */
  def hashBands(media: Dataset[Multimodal.MediaRow]): DataFrame =
    hashBands(media,
      media.sparkSession.sparkContext.longAccumulator("phash.quarantined"))

  /** [[hashBands]] with a caller-owned quarantine counter (readable after
    * the action; in a streaming query, cumulative across triggers).
    * AT-LEAST-ONCE semantics, inherent to accumulators updated inside a
    * transformation: a task retry or speculative duplicate re-counts its
    * partition's failures. Use it as a non-zero alert and an order of
    * magnitude, not an exact tally — the exact set of quarantined ids is
    * the anti-join of input ids against the output (exactly-once, it IS
    * the data).
    */
  def hashBands(media: Dataset[Multimodal.MediaRow],
                quarantined: org.apache.spark.util.LongAccumulator): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        scala.util.Try(aHashBands(MediaCodec.decodePixels(r.payload))) match {
          case scala.util.Success(bands) =>
            (0 until Bands).iterator.map(b => BandRow(r.doc_id, b, bands(b)))
          case scala.util.Failure(_) =>
            quarantined.add(1L)
            Iterator.empty
        }
      }
    }.toDF()
  }

  /** Near-dup pairs at `hamming ≤ maxHamming`: banded candidate equi-join,
    * then exact hamming over the four bands. Input is `hashBands` output.
    */
  def nearDupPairs(hb: DataFrame, maxHamming: Int): DataFrame = {
    val left = hb.select(col("doc_id").as("doc_a"), col("band"), col("bv"))
    val right = hb.select(col("doc_id").as("doc_b"),
      col("band").as("band_r"), col("bv").as("bv_r"))
    val cand = left.join(right,
        col("band") === col("band_r") && col("bv") === col("bv_r") &&
          col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val xa = hb.select(col("doc_id").as("doc_a"), col("band").as("xb"), col("bv").as("xv"))
    val ya = hb.select(col("doc_id").as("yid"), col("band").as("yb"), col("bv").as("yv"))
    cand
      .join(xa, "doc_a")
      .join(ya, col("doc_b") === col("yid") && col("xb") === col("yb"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(bit_count(col("xv").bitwiseXOR(col("yv")))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Arriving-vs-index near-dup: which arriving images already exist
    * (hamming ≤ `maxHamming`) in a STATIC band index — the incremental /
    * streaming face of [[nearDupPairs]] (`incremental_dedup`'s shape with
    * a similarity rescore instead of exact fp equality). Arriving band
    * rows equi-join the index's banded buckets; only collision candidates
    * are hamming-rescored.
    */
  def dupAgainstIndex(arriving: DataFrame, index: DataFrame,
                      maxHamming: Int): DataFrame = {
    val cand = arriving.select(col("doc_id").as("new_id"), col("band"), col("bv"))
      .join(index.select(col("doc_id").as("old_id"), col("band"), col("bv")),
        Seq("band", "bv"))
      .select(col("new_id"), col("old_id")).distinct()
    val xa = arriving.select(col("doc_id").as("new_id"),
      col("band").as("xb"), col("bv").as("xv"))
    val ya = index.select(col("doc_id").as("yid"),
      col("band").as("yb"), col("bv").as("yv"))
    cand
      .join(xa, "new_id")
      .join(ya, col("old_id") === col("yid") && col("xb") === col("yb"))
      .groupBy(col("new_id"), col("old_id"))
      .agg(sum(bit_count(col("xv").bitwiseXOR(col("yv")))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
