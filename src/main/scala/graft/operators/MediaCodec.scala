package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Pure-JVM image codec: a real encoder/decoder pair for the two formats
  * whose containers are simple enough to implement from the public specs —
  * PNG (RFC 2083 / ISO 15948) and BMP (BITMAPINFOHEADER). No native libs,
  * no managed dependencies: `java.util.zip.Deflater` + `CRC32` cover PNG's
  * zlib layer.
  *
  * This replaces the round-1 `fakeDecode` stub: payloads are now REAL,
  * standards-valid image files (any external viewer could open them), and
  * the decode path parses actual container headers. The decode output is
  * exactly what a production media pipeline extracts first (format,
  * dimensions, channel count) before handing pixels to heavier stages.
  *
  * Reference analogy: the reference keeps media out of scope entirely; this
  * is north-star surface (multimodal columns for a training-data pipeline,
  * brief §"Multimodal columns").
  */
object MediaCodec {

  final case class Decoded(fmt: String, width: Int, height: Int, channels: Int)

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  // ---------------------------------------------------------------- encode

  /** 24bpp uncompressed BMP (BITMAPINFOHEADER, BI_RGB, bottom-up rows padded
    * to 4 bytes). Pixels are a deterministic gradient of (x, y).
    */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val imageSize = rowSize * height
    val fileSize = 54 + imageSize
    val b = java.nio.ByteBuffer.allocate(fileSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    b.putInt(0).putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        b.put(((x * 7 + y * 13) & 0xff).toByte)  // B
        b.put(((x * 11 + y * 3) & 0xff).toByte)  // G
        b.put(((x * 5 + y * 17) & 0xff).toByte)  // R
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y += 1
    }
    b.array()
  }

  /** 8-bit PNG with the given color type (0=gray, 2=rgb, 4=gray+alpha,
    * 6=rgba). Scanlines use filter 0; IDAT is standard zlib deflate.
    */
  def encodePng(width: Int, height: Int, colorType: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val channels = pngChannels(colorType)
    val raw = new Array[Byte](height * (1 + width * channels))
    var i = 0
    var y = 0
    while (y < height) {
      raw(i) = 0; i += 1 // filter type: None
      var x = 0
      while (x < width * channels) {
        raw(i) = ((x * 7 + y * 13) & 0xff).toByte; i += 1; x += 1
      }
      y += 1
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)

    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val typB = typ.getBytes("US-ASCII")
    out.write(typB); out.write(data)
    val crc = new CRC32()
    crc.update(typB); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // rgba
    case t => throw new IllegalArgumentException(s"PNG color type $t")
  }

  // ----------------------------------------------------------------- audio

  final case class DecodedWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                              nFrames: Int)

  /** Canonical 44-byte-header PCM16 WAV (RIFF/WAVE fmt+data). Samples are a
    * deterministic sawtooth of the frame index.
    */
  def encodeWav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0,
      s"bad wav params $sampleRate/$channels/$nFrames")
    val blockAlign = channels * 2
    val dataSize = nFrames * blockAlign
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort)
      .putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        b.putShort(((f * 257 + c * 1031) % 65536 - 32768).toShort)
        c += 1
      }
      f += 1
    }
    b.array()
  }

  def isWav(p: Array[Byte]): Boolean =
    p.length >= 44 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Parse the fmt chunk + data size out of a canonical-layout WAV. */
  def decodeWav(p: Array[Byte]): DecodedWav = {
    require(isWav(p), "not a RIFF/WAVE container")
    val b = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.getInt(16) == 16 && b.getShort(20) == 1, "not canonical PCM")
    val channels = b.getShort(22).toInt
    val sampleRate = b.getInt(24)
    val bits = b.getShort(34).toInt
    val dataSize = b.getInt(40)
    DecodedWav(sampleRate, channels, bits, dataSize / (channels * bits / 8))
  }

  // ----------------------------------------------------------------- video

  final case class DecodedAvi(usPerFrame: Int, totalFrames: Int, width: Int,
                              height: Int)

  /** Minimal canonical RIFF/AVI container: RIFF('AVI ') wrapping a
    * LIST('hdrl') that holds the 56-byte 'avih' main header (the fields a
    * frame sampler needs: frame period, frame count, dimensions). The same
    * real-bytes RIFF discipline as the WAV path — a full AVI adds stream
    * lists and a 'movi' payload after the header, which metadata
    * extraction never touches.
    */
  def encodeAvi(usPerFrame: Int, totalFrames: Int, width: Int, height: Int): Array[Byte] = {
    require(usPerFrame > 0 && totalFrames >= 0 && width > 0 && height > 0,
      s"bad avi params $usPerFrame/$totalFrames/$width/$height")
    val b = java.nio.ByteBuffer.allocate(88)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(80)
      .put("AVI ".getBytes("US-ASCII"))
    b.put("LIST".getBytes("US-ASCII")).putInt(68)
      .put("hdrl".getBytes("US-ASCII"))
    b.put("avih".getBytes("US-ASCII")).putInt(56)
      .putInt(usPerFrame) // dwMicroSecPerFrame
      .putInt(0)          // dwMaxBytesPerSec
      .putInt(0)          // dwPaddingGranularity
      .putInt(0x10)       // dwFlags (AVIF_HASINDEX)
      .putInt(totalFrames)
      .putInt(0)          // dwInitialFrames
      .putInt(1)          // dwStreams
      .putInt(0)          // dwSuggestedBufferSize
      .putInt(width)
      .putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    b.array()
  }

  def isAvi(p: Array[Byte]): Boolean =
    p.length >= 88 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

  /** Parse the avih main header out of a canonical-layout AVI. */
  def decodeAvi(p: Array[Byte]): DecodedAvi = {
    require(isAvi(p), "not a RIFF/AVI container")
    val b = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fourcc = new String(Array(p(24), p(25), p(26), p(27)), "US-ASCII")
    require(fourcc == "avih", s"first hdrl chunk $fourcc, want avih")
    require(b.getInt(28) == 56, s"bad avih length ${b.getInt(28)}")
    DecodedAvi(b.getInt(32), b.getInt(48), b.getInt(64), b.getInt(68))
  }

  // ---------------------------------------------------------------- decode

  /** Sniff the container and parse format + dimensions + channel count from
    * the header bytes. Throws on anything that isn't a PNG or BMP — a real
    * pipeline routes such rows to a quarantine sink rather than guessing.
    */
  def decode(payload: Array[Byte]): Decoded =
    if (isPng(payload)) decodePngHeader(payload)
    else if (isBmp(payload)) decodeBmpHeader(payload)
    else throw new IllegalArgumentException(
      s"unrecognized media container (${payload.length} bytes)")

  def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && (0 until 8).forall(i => p(i) == PngSig(i))

  def isBmp(p: Array[Byte]): Boolean =
    p.length >= 54 && p(0) == 'B'.toByte && p(1) == 'M'.toByte

  private def decodePngHeader(p: Array[Byte]): Decoded = {
    // Signature(8) + IHDR length(4) + "IHDR"(4) → width at 16, height at 20,
    // bit depth at 24, color type at 25. All big-endian per spec.
    require(p.length >= 26, "truncated PNG")
    val b = java.nio.ByteBuffer.wrap(p)
    val ihdrLen = b.getInt(8)
    require(ihdrLen == 13, s"bad IHDR length $ihdrLen")
    val typ = new String(Array(p(12), p(13), p(14), p(15)), "US-ASCII")
    require(typ == "IHDR", s"first chunk $typ, want IHDR")
    val w = b.getInt(16); val h = b.getInt(20)
    val colorType = p(25) & 0xff
    Decoded("png", w, h, pngChannels(colorType))
  }

  private def decodeBmpHeader(p: Array[Byte]): Decoded = {
    val b = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dibSize = b.getInt(14)
    require(dibSize >= 40, s"need BITMAPINFOHEADER, got DIB size $dibSize")
    val w = b.getInt(18)
    val hRaw = b.getInt(22) // negative ⇒ top-down row order; magnitude is height
    val bpp = b.getShort(28) & 0xffff
    Decoded("bmp", w, math.abs(hRaw), bpp / 8)
  }

  // ---------------------------------------------------------------- pixels

  /** A decoded luma (grayscale) plane, row-major top-down. Luma is the
    * integer mean (r+g+b)/3 for color images and the gray sample itself
    * for grayscale — integer arithmetic end-to-end so every downstream
    * fingerprint is exactly recomputable by another engine.
    */
  final case class Pixels(width: Int, height: Int, luma: Array[Int])

  /** FULL-payload pixel decode (headers were round 2; this walks the pixel
    * data): BMP 24bpp BI_RGB (bottom-up or top-down, 4-byte row padding)
    * and 8-bit PNG color types 0/2/4/6 — chunk walk, zlib inflate, and all
    * five scanline filters per RFC 2083 §6. Palette PNGs are rejected, as
    * is any non-8-bit depth: quarantine, don't guess.
    */
  def decodePixels(p: Array[Byte]): Pixels =
    if (isPng(p)) decodePngPixels(p)
    else if (isBmp(p)) decodeBmpPixels(p)
    else throw new IllegalArgumentException(
      s"unrecognized media container (${p.length} bytes)")

  private def decodeBmpPixels(p: Array[Byte]): Pixels = {
    val b = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.getInt(14) >= 40, "need BITMAPINFOHEADER")
    require((b.getShort(28) & 0xffff) == 24 && b.getInt(30) == 0,
      "only 24bpp BI_RGB pixel decode")
    val off = b.getInt(10)
    val w = b.getInt(18)
    val hRaw = b.getInt(22)
    val h = math.abs(hRaw)
    val rowSize = ((w * 3 + 3) / 4) * 4
    require(p.length >= off + rowSize * h, "truncated BMP pixel data")
    val luma = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val fileRow = if (hRaw < 0) y else h - 1 - y // bottom-up unless negative height
      val base = off + fileRow * rowSize
      var x = 0
      while (x < w) {
        val i = base + x * 3
        val bl = p(i) & 0xff; val g = p(i + 1) & 0xff; val r = p(i + 2) & 0xff
        luma(y * w + x) = (r + g + bl) / 3
        x += 1
      }
      y += 1
    }
    Pixels(w, h, luma)
  }

  private def decodePngPixels(p: Array[Byte]): Pixels = {
    val hdr = decodePngHeader(p)
    val b = java.nio.ByteBuffer.wrap(p)
    val bitDepth = p(24) & 0xff
    val colorType = p(25) & 0xff
    require(bitDepth == 8, s"only 8-bit PNG pixel decode, got depth $bitDepth")
    require(colorType != 3, "palette PNG unsupported")
    require((p(26) | p(27) | p(28)) == 0, "only deflate/adaptive/no-interlace")
    val w = hdr.width; val h = hdr.height; val ch = hdr.channels
    // chunk walk: concatenate every IDAT payload (spec allows splitting the
    // zlib stream across chunks at arbitrary byte boundaries)
    val idat = new ByteArrayOutputStream()
    var pos = 8
    var end = false
    while (!end && pos + 8 <= p.length) {
      val len = b.getInt(pos)
      // the chunk length field is untrusted input: a truncated/corrupt
      // file must fail as the declared IllegalArgumentException (which
      // quarantine routing catches), not an IndexOutOfBoundsException
      // long arithmetic: len near Int.MaxValue would wrap pos + 8 + len
      // negative and sneak past an int-typed bound check
      require(len >= 0 && pos.toLong + 8 + len <= p.length,
        s"PNG chunk at $pos claims $len bytes beyond end of payload")
      val typ = new String(p, pos + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(p, pos + 8, len)
      if (typ == "IEND") end = true
      pos += 12 + len // length + type + data + crc
    }
    val stride = w * ch
    val raw = inflateExact(idat.toByteArray, h * (1 + stride))
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride) // zeros stand in for the row above row 0
    val luma = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val rowBase = y * (1 + stride)
      val filter = raw(rowBase) & 0xff
      var i = 0
      while (i < stride) {
        val v = raw(rowBase + 1 + i) & 0xff
        val a = if (i >= ch) cur(i - ch) else 0 // left
        val up = prev(i)                        // above
        val c = if (i >= ch) prev(i - ch) else 0 // upper-left
        cur(i) = filter match {
          case 0 => v
          case 1 => (v + a) & 0xff
          case 2 => (v + up) & 0xff
          case 3 => (v + (a + up) / 2) & 0xff
          case 4 => (v + paeth(a, up, c)) & 0xff
          case t => throw new IllegalArgumentException(s"PNG filter type $t")
        }
        i += 1
      }
      var x = 0
      while (x < w) {
        val base = x * ch
        luma(y * w + x) = colorType match {
          case 0 | 4 => cur(base) // gray (+alpha ignored)
          case _     => (cur(base) + cur(base + 1) + cur(base + 2)) / 3
        }
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Pixels(w, h, luma)
  }

  /** RFC 2083 §6.6 Paeth predictor. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val pv = a + b - c
    val pa = math.abs(pv - a); val pb = math.abs(pv - b); val pc = math.abs(pv - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflateExact(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (!inf.finished() && off < expected) {
      val n = inf.inflate(out, off, expected - off)
      require(n > 0 || inf.finished(), "truncated zlib stream")
      off += n
    }
    inf.end()
    require(off == expected, s"inflated $off of $expected raw bytes")
    out
  }
}
