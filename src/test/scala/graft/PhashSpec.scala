package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodec, Multimodal, Phash}

/** Pixel-level decode + perceptual-hash near-dup: the decode must reproduce
  * the synthesis gradient exactly (it parses real container bytes), the
  * hash must be container-invariant (same luma ⇒ same hash regardless of
  * PNG vs BMP), and the banded pair search must equal brute force.
  */
class PhashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def gradientLuma(w: Int, h: Int, fmtClass: String)(x: Int, y: Int): Int =
    fmtClass match {
      case "bmp" =>
        // the encoder writes its gradient by FILE row in a bottom-up
        // container: decoded top-down row y carries gradient row h-1-y
        val fy = h - 1 - y
        ((x * 5 + fy * 17) & 0xff) + ((x * 11 + fy * 3) & 0xff) + ((x * 7 + fy * 13) & 0xff)
      case "png0" => 3 * ((x * 7 + y * 13) & 0xff)
      case "png6" =>
        ((4 * x * 7 + y * 13) & 0xff) + (((4 * x + 1) * 7 + y * 13) & 0xff) +
          (((4 * x + 2) * 7 + y * 13) & 0xff)
    }

  test("BMP pixel decode reproduces the encode gradient") {
    for ((w, h) <- Seq((1, 1), (3, 2), (7, 5), (31, 29))) {
      val px = MediaCodec.decodePixels(MediaCodec.encodeBmp(w, h))
      assert(px.width === w && px.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(px.luma(y * w + x) === gradientLuma(w, h, "bmp")(x, y) / 3,
          s"bmp ($x,$y) of ${w}x$h")
    }
  }

  test("PNG pixel decode (gray and RGBA) reproduces the encode gradient") {
    for ((w, h) <- Seq((1, 1), (4, 3), (31, 29)); ct <- Seq(0, 6)) {
      val px = MediaCodec.decodePixels(MediaCodec.encodePng(w, h, ct))
      val cls = if (ct == 0) "png0" else "png6"
      for (y <- 0 until h; x <- 0 until w)
        assert(px.luma(y * w + x) === gradientLuma(w, h, cls)(x, y) / 3,
          s"png ct=$ct ($x,$y) of ${w}x$h")
    }
  }

  test("PNG defilter handles all five filter types") {
    // hand-build a 3x3 gray PNG whose rows use filters 1 (Sub), 2 (Up),
    // 4 (Paeth) over a known reference image, and check the decode
    // recovers the reference — exercising the paths the encoder never emits
    val w = 3; val h = 3
    val ref = Array(10, 200, 13, 77, 140, 255, 0, 9, 250)
    val raw = new java.io.ByteArrayOutputStream()
    // row 0: Sub — raw(x) = v(x) - v(x-1)
    raw.write(1)
    for (x <- 0 until w) raw.write((ref(x) - (if (x > 0) ref(x - 1) else 0)) & 0xff)
    // row 1: Up — raw(x) = v(x) - up(x)
    raw.write(2)
    for (x <- 0 until w) raw.write((ref(w + x) - ref(x)) & 0xff)
    // row 2: Paeth
    raw.write(4)
    for (x <- 0 until w) {
      val a = if (x > 0) ref(2 * w + x - 1) else 0
      val b = ref(w + x)
      val c = if (x > 0) ref(w + x - 1) else 0
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      raw.write((ref(2 * w + x) - pred) & 0xff)
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val defl = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) defl.write(buf, 0, d.deflate(buf))
    d.end()
    def chunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val png = new java.io.ByteArrayOutputStream()
    png.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk(png, "IHDR", ihdr.array())
    chunk(png, "IDAT", defl.toByteArray)
    chunk(png, "IEND", Array.emptyByteArray)
    val px = MediaCodec.decodePixels(png.toByteArray)
    assert(px.luma.toSeq === ref.toSeq)
  }

  test("hash is container-invariant: same luma as BMP and as gray PNG") {
    // hand-build a BMP whose r=g=b equal the PNG gray gradient, so both
    // containers carry the IDENTICAL image; the hash must not see the format
    val w = 9; val h = 7
    val rowSize = ((w * 3 + 3) / 4) * 4
    val bmp = java.nio.ByteBuffer.allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h).putInt(0).putInt(54)
    bmp.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    bmp.putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- h - 1 to 0 by -1) { // bottom-up
      for (x <- 0 until w) {
        val v = ((x * 7 + y * 13) & 0xff).toByte
        bmp.put(v).put(v).put(v)
      }
      for (_ <- 0 until rowSize - w * 3) bmp.put(0.toByte)
    }
    val hBmp = Phash.aHashBands(MediaCodec.decodePixels(bmp.array()))
    val hPng = Phash.aHashBands(MediaCodec.decodePixels(MediaCodec.encodePng(w, h, 0)))
    assert(hBmp.toSeq === hPng.toSeq)
  }

  test("banded pair search equals brute-force hamming over all pairs") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val hb = Phash.hashBands(Multimodal.synthesizeMedia(docs))
    hb.cache()
    val got = Phash.nearDupPairs(hb, maxHamming = 2)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    // brute force from the same band rows
    val bands = hb.as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val brute = (for {
      a <- bands.keys; b <- bands.keys if a < b
      ham = (0 until 4).map(i => java.lang.Long.bitCount(bands(a)(i) ^ bands(b)(i))).sum
      if ham <= 2
    } yield (a, b) -> ham.toLong).toMap
    hb.unpersist()
    assert(got === brute)
    assert(got.nonEmpty, "sf0.001 fixture should contain near-dup images")
    // identical dims + format class ⇒ identical image ⇒ hamming 0 present
    assert(got.values.exists(_ == 0L))
  }

  test("malformed payloads are quarantined, not job-fatal") {
    import spark.implicits._
    val goodPng = MediaCodec.encodePng(8, 8, 0)
    // a PNG whose first chunk claims more bytes than the payload holds —
    // the chunk walk must reject it as IllegalArgumentException (bounds
    // check), and hashBands must route it out instead of failing the job
    val truncated = goodPng.take(20)
    val garbage = Array.tabulate[Byte](40)(i => (i * 7).toByte)
    val liar = goodPng.clone()
    liar(8 + 3) = 127 // IHDR length byte: claims 127-byte chunk in a tiny file
    intercept[IllegalArgumentException](MediaCodec.decodePixels(liar))
    val rows = Seq(
      Multimodal.MediaRow(1L, goodPng),
      Multimodal.MediaRow(2L, truncated),
      Multimodal.MediaRow(3L, garbage),
      Multimodal.MediaRow(4L, liar)).toDS()
    val quarantined = spark.sparkContext.longAccumulator("test.quarantined")
    val out = Phash.hashBands(rows, quarantined).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L), "only the good image hashes")
    assert(out.length === Phash.Bands)
    assert(quarantined.value === 3L, "each bad payload counted once")
  }
}
