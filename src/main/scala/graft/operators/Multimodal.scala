package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * Round 2 replaced the round-1 decode stub with [[MediaCodec]] — a real
  * pure-JVM PNG/BMP encoder+decoder — so `decodePartitions` now parses
  * actual image container headers. The execution shape is unchanged and is
  * the part that matters at 100 TB: binary payload column, batched
  * per-partition processing through an iterator (never materializing a
  * partition), decoder state initialized once per partition. A JNI/FFmpeg
  * decoder for richer formats drops into the same loop.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, fmt: String, width: Int, height: Int,
                        channels: Int, n_bytes: Int)

  /** Attach a binary payload column (UTF-8 bytes of the text stand in for
    * real media bytes) plus byte-level metadata. Pure projection.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"))

  /** Synthesize REAL image payloads deterministically from (doc_id,
    * n_chars): even ids become 24bpp BMPs, odd ids PNGs (grayscale or RGBA
    * by id mod 4). Dimensions are arithmetic in the row's columns — which
    * is what makes the decode query oracle-able: DuckDB recomputes the
    * expected dims from the columns while Spark parses them back out of the
    * actual encoded bytes; a hash match proves the encode→decode roundtrip.
    */
  def synthesizeMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val w = 1 + (id % 31).toInt
        val h = 1 + (nChars % 29).toInt
        val payload =
          if (id % 2 == 0) MediaCodec.encodeBmp(w, h)
          else MediaCodec.encodePng(w, h, colorType = if (id % 4 == 1) 0 else 6)
        MediaRow(id, payload)
      }
  }

  case class AudioRow(doc_id: Long, payload: Array[Byte])
  case class DecodedAudio(doc_id: Long, fmt: String, sample_rate: Int,
                          n_channels: Int, n_frames: Int, duration_ms: Long)

  /** Synthesize REAL PCM16 WAV payloads deterministically from (doc_id,
    * n_chars) — the audio face of the multimodal column. Same oracle trick
    * as the image path: DuckDB recomputes the parameters arithmetically,
    * Spark parses them back out of the RIFF container bytes.
    */
  def synthesizeAudio(docs: DataFrame): Dataset[AudioRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val rate = 8000 + (id % 3).toInt * 4000       // 8/12/16 kHz
        val channels = 1 + (id % 2).toInt             // mono/stereo
        val frames = 50 + (nChars % 200).toInt
        AudioRow(id, MediaCodec.encodeWav(rate, channels, frames))
      }
  }

  /** Per-partition audio header decode (same batched-iterator shape as the
    * image path).
    */
  def decodeAudioPartitions(media: Dataset[AudioRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val d = MediaCodec.decodeWav(r.payload)
        DecodedAudio(r.doc_id, "wav", d.sampleRate, d.channels, d.nFrames,
          d.nFrames * 1000L / d.sampleRate)
      }
    }
  }

  case class AudioFeatures(doc_id: Long, n_samples: Int, peak: Int,
                           sumsq: Long, rms: Double, zero_crossings: Int)

  /** SAMPLE-LEVEL audio feature extraction — the audio twin of the image
    * path's pixel decode: walk the PCM16 data chunk of each WAV payload and
    * compute the standard signal statistics a curation pipeline filters on
    * (peak/RMS for clipping and silence gates, zero-crossing count as the
    * cheap voicing/noisiness proxy). All integer arithmetic except the
    * final RMS, which is rounded at the boundary (HALF_UP, 4 dp) so the
    * oracle's replay compares exactly.
    *
    * A zero crossing is counted per channel when consecutive frames'
    * samples have strictly opposite signs (product < 0) — the convention
    * the oracle replays verbatim.
    *
    * 100 TB shape: map-only over the binary column (mapPartitions is the
    * right tool for a codec loop — same posture as the image decoders);
    * per-row output is 5 scalars, so the payload bytes never shuffle.
    */
  def audioFeatures(media: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val d = MediaCodec.decodeWav(r.payload)
        val b = java.nio.ByteBuffer.wrap(r.payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val ch = d.channels
        val n = d.nFrames * ch
        var peak = 0
        var sumsq = 0L
        var zc = 0
        var f = 0
        while (f < d.nFrames) {
          var c = 0
          while (c < ch) {
            val s = b.getShort(44 + 2 * (f * ch + c)).toInt
            val a = math.abs(s)
            if (a > peak) peak = a
            sumsq += s.toLong * s
            if (f + 1 < d.nFrames) {
              val next = b.getShort(44 + 2 * ((f + 1) * ch + c)).toLong
              if (s.toLong * next < 0L) zc += 1
            }
            c += 1
          }
          f += 1
        }
        val rms =
          if (n == 0) 0.0
          else BigDecimal(math.sqrt(sumsq.toDouble / n))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        AudioFeatures(r.doc_id, n, peak, sumsq, rms, zc)
      }
    }
  }

  case class VideoRow(doc_id: Long, payload: Array[Byte])
  case class DecodedVideo(doc_id: Long, fmt: String, fps: Int, n_frames: Int,
                          width: Int, height: Int, duration_ms: Long,
                          n_sampled: Int, last_sampled: Int)

  /** Synthesize REAL RIFF/AVI headers deterministically from (doc_id,
    * n_chars) — the video face of the multimodal column. fps values are
    * exact divisors of 1e6 so frame period ↔ fps round-trips losslessly.
    */
  def synthesizeVideo(docs: DataFrame): Dataset[VideoRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val fps = (id % 3) match { case 0 => 10; case 1 => 20; case _ => 25 }
        val frames = 30 + (nChars % 120).toInt
        val w = 16 * (1 + (id % 4).toInt)
        val h = 16 * (1 + (nChars % 3).toInt)
        VideoRow(id, MediaCodec.encodeAvi(1000000 / fps, frames, w, h))
      }
  }

  /** Per-partition video header decode + 1 Hz frame sampling: every
    * fps-th frame index is a keyframe candidate — the sampling PLUMBING
    * (which indices, batched per partition) is real; a production codec
    * would seek and decode those frames here.
    */
  def decodeVideoPartitions(media: Dataset[VideoRow]): Dataset[DecodedVideo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val d = MediaCodec.decodeAvi(r.payload)
        val fps = 1000000 / d.usPerFrame
        val lastSampled = ((d.totalFrames - 1) / fps) * fps
        DecodedVideo(r.doc_id, "avi", fps, d.totalFrames, d.width, d.height,
          d.totalFrames.toLong * d.usPerFrame / 1000,
          (d.totalFrames - 1) / fps + 1, lastSampled)
      }
    }
  }

  /** Batched per-partition decode: one decoder init per partition, rows
    * streamed through an iterator. Output is a typed Dataset with the
    * decoded-feature schema.
    */
  def decodePartitions(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // heavier codecs init per-partition state HERE (JNI handles, buffers)
      rows.map { r =>
        val d = MediaCodec.decode(r.payload)
        DecodedRow(r.doc_id, d.fmt, d.width, d.height, d.channels, r.payload.length)
      }
    }
  }
}
