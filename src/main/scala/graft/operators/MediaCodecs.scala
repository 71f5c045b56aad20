package graft.operators

/** Real decoders for the uncompressed media containers — pure JVM
  * byte parsing, no external codec libraries (which this environment
  * lacks; JPEG/PNG/MP4 stay behind the documented fallback seam).
  *
  *  - WAV: RIFF/WAVE with a PCM `fmt ` chunk + `data` chunk
  *    (16-bit LE or 8-bit unsigned samples) — the raw-audio staple.
  *  - PPM: binary P6 (magic, whitespace/comment header, maxval < 256,
  *    raw RGB triplets) — the raw-image staple.
  *
  * Both parsers are strict (magic + internally consistent sizes), so
  * arbitrary text/binary payloads fail cleanly to `None` and the
  * caller's deterministic fallback — a corpus can mix real media and
  * opaque blobs in one column. All math is integer/IEEE-deterministic:
  * the same bytes give the same features on any executor. */
object MediaCodecs {

  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nFrames: Long, durationSec: Double,
                           rms: Double, peak: Double)

  final case class PpmInfo(width: Int, height: Int, maxVal: Int,
                           meanR: Double, meanG: Double, meanB: Double,
                           meanLuma: Double)

  /** Minimal PCM WAV writer (16-bit mono) — the inverse of
    * [[parseWav]], used by the in-engine media-synthesis queries and
    * as a raw-audio sink primitive. */
  def buildPcmWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1); buf.putShort(1)       // PCM, mono
    buf.putInt(rate); buf.putInt(rate * 2) // byte rate
    buf.putShort(2); buf.putShort(16)      // block align, bits
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Minimal binary-P6 PPM writer — the inverse of [[parsePpm]]. */
  def buildPpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"raster must be ${w * h * 3} bytes")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Strict PCM WAV parse; None on anything that isn't a consistent
    * RIFF/WAVE container with PCM 8/16-bit samples. */
  def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Option[(Int, Int)] = None     // (offset, length)
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, off, 4, "US-ASCII")
      val len = le32(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = le16(b, off + 8)
          if (audioFormat != 1) return None // PCM only
          val channels = le16(b, off + 10)
          val rate = le32(b, off + 12).toInt
          val bits = le16(b, off + 22)
          if (channels < 1 || rate <= 0 || (bits != 8 && bits != 16)) return None
          fmt = Some((channels, rate, bits))
        case "data" =>
          data = Some((off + 8, len.toInt))
        case _ => ()
      }
      off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    for ((channels, rate, bits) <- fmt; (dOff, dLen) <- data) yield {
      val bytesPerSample = bits / 8
      val frameBytes = channels * bytesPerSample
      val nFrames = if (frameBytes == 0) 0L else dLen.toLong / frameBytes
      val nSamples = nFrames * channels
      var sumSq = 0.0
      var peak = 0.0
      var i = 0L
      while (i < nSamples) {
        val sOff = dOff + (i * bytesPerSample).toInt
        val v =
          if (bits == 16) le16(b, sOff).toShort.toDouble / 32768.0
          else ((b(sOff) & 0xff) - 128).toDouble / 128.0
        sumSq += v * v
        val a = math.abs(v)
        if (a > peak) peak = a
        i += 1
      }
      val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
      WavInfo(rate, channels, bits, nFrames,
        nFrames.toDouble / rate, rms, peak)
    }
  }

  final case class PgmInfo(width: Int, height: Int, maxVal: Int,
                           mean: Double, min: Int, max: Int)

  /** Strict binary-PGM (P5, grayscale) parse — same header grammar as
    * P6 with a 1-byte-per-pixel raster; features are mean/min/max
    * intensity. */
  def parsePgm(b: Array[Byte]): Option[PgmInfo] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '5') return None
    parseNetpbmHeader(b, 2).collect {
      case (w, h, maxv, start) if b.length - start == w.toLong * h =>
        var s = 0.0; var mn = 255; var mx = 0
        var i = start
        while (i < b.length) {
          val v = b(i) & 0xff
          s += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        PgmInfo(w, h, maxv, s / (w.toDouble * h), mn, mx)
    }
  }

  /** Shared netpbm header grammar after the magic: whitespace/comment-
    * separated width, height, maxval (< 256), then EXACTLY one
    * whitespace byte before the raster. Returns (w, h, maxv,
    * rasterStart). */
  private def parseNetpbmHeader(b: Array[Byte], startOff: Int)
      : Option[(Int, Int, Int, Int)] = {
    var off = startOff
    def skipSpaceAndComments(): Boolean = {
      var sawSpace = false
      var continue = true
      while (continue && off < b.length) {
        val c = b(off).toChar
        if (c == '#') {
          while (off < b.length && b(off) != '\n') off += 1
        } else if (c.isWhitespace) { sawSpace = true; off += 1 }
        else continue = false
      }
      sawSpace
    }
    def readInt(): Option[Int] = {
      if (!skipSpaceAndComments()) return None
      var v = 0L
      var digits = 0
      while (off < b.length && b(off) >= '0' && b(off) <= '9') {
        v = v * 10 + (b(off) - '0'); digits += 1; off += 1
        if (v > Int.MaxValue) return None
      }
      if (digits == 0) None else Some(v.toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxv <- readInt()
      if w > 0 && h > 0 && maxv > 0 && maxv < 256
      if off < b.length && b(off).toChar.isWhitespace
    } yield (w, h, maxv, off + 1)
  }

  final case class AuInfo(sampleRate: Int, channels: Int, nFrames: Long,
                          durationSec: Double, rms: Double, peak: Double)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Minimal Sun/NeXT AU writer (16-bit big-endian PCM mono,
    * encoding 3) — the inverse of [[parseAu]]. The AU container is
    * the PUBLIC .snd header: magic, data offset, data size, encoding,
    * rate, channels. */
  def buildAu(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(24 + dataLen)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putInt(0x2e736e64) // ".snd"
    buf.putInt(24)         // data offset
    buf.putInt(dataLen)
    buf.putInt(3)          // 16-bit linear PCM
    buf.putInt(rate)
    buf.putInt(1)          // mono
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Strict AU parse (16-bit big-endian linear PCM only). Header
    * fields gate hard — ASCII payloads can't satisfy the offset/rate/
    * channel ranges, so text blobs fall through to the deterministic
    * fallback like every other codec here. */
  def parseAu(b: Array[Byte]): Option[AuInfo] = {
    if (b.length < 24 || be32(b, 0) != 0x2e736e64L) return None
    val dataOff = be32(b, 4)
    val dataSize = be32(b, 8)
    val enc = be32(b, 12)
    val rate = be32(b, 16)
    val channels = be32(b, 20)
    if (enc != 3 || dataOff < 24 || dataOff > b.length ||
        rate < 1 || rate > 1000000 || channels < 1 || channels > 8) return None
    val avail = b.length - dataOff.toInt
    val dLen = if (dataSize == 0xffffffffL) avail.toLong
               else math.min(dataSize, avail.toLong)
    val frameBytes = channels.toInt * 2
    val nFrames = dLen / frameBytes
    val nSamples = nFrames * channels
    var sumSq = 0.0
    var peak = 0.0
    var i = 0L
    while (i < nSamples) {
      val at = dataOff.toInt + (i * 2).toInt
      val v = (((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)).toShort.toDouble / 32768.0
      sumSq += v * v
      val a = math.abs(v)
      if (a > peak) peak = a
      i += 1
    }
    val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
    Some(AuInfo(rate.toInt, channels.toInt, nFrames,
      nFrames.toDouble / rate, rms, peak))
  }

  final case class AiffInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                            nFrames: Long, durationSec: Double,
                            rms: Double, peak: Double)

  /** 80-bit IEEE 754 extended float encode for INTEGRAL sample rates
    * (the AIFF COMM field's one quirk): sign 0, 15-bit biased
    * exponent, explicit-leading-1 64-bit mantissa. */
  private def extended80(rate: Int): Array[Byte] = {
    require(rate > 0)
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong)
    val exp = 16383 + msb
    val mantissa = rate.toLong << (63 - msb)
    val out = new Array[Byte](10)
    out(0) = ((exp >> 8) & 0x7f).toByte
    out(1) = (exp & 0xff).toByte
    var i = 0
    while (i < 8) { out(2 + i) = ((mantissa >>> (56 - 8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  /** Inverse of [[extended80]] — integral rates only (a fractional or
    * out-of-range rate fails the parse, by design). */
  private def parseExtended80(b: Array[Byte], off: Int): Option[Int] = {
    if ((b(off) & 0x80) != 0) return None // negative rate
    val exp = ((b(off) & 0x7f) << 8) | (b(off + 1) & 0xff)
    var mantissa = 0L
    var i = 0
    while (i < 8) { mantissa = (mantissa << 8) | (b(off + 2 + i) & 0xffL); i += 1 }
    // mantissa is UNSIGNED: a normalized extended float always has
    // its explicit leading 1 in bit 63, so the signed Long is
    // negative — use >>> and bit-pattern equality only
    val shift = exp - 16383 - 63
    if (shift > 0 || shift < -63 || mantissa == 0L) return None
    val rate = mantissa >>> -shift
    // integral check: shifting back must lose no bits
    if ((rate << -shift) != mantissa || rate < 1 || rate > 1000000) None
    else Some(rate.toInt)
  }

  /** Minimal AIFF writer (16-bit big-endian PCM mono): FORM/AIFF with
    * a COMM chunk (channels, frames, bits, 80-bit extended rate) and
    * an SSND chunk — the third PUBLIC uncompressed-audio container
    * next to WAV and AU. */
  def buildAiff(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val formLen = 4 + (8 + 18) + (8 + 8 + dataLen) // AIFF + COMM + SSND
    val buf = java.nio.ByteBuffer.allocate(8 + formLen)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put("FORM".getBytes("US-ASCII")); buf.putInt(formLen)
    buf.put("AIFF".getBytes("US-ASCII"))
    buf.put("COMM".getBytes("US-ASCII")); buf.putInt(18)
    buf.putShort(1)                  // channels
    buf.putInt(samples.length)       // numSampleFrames (mono)
    buf.putShort(16)                 // bits
    buf.put(extended80(rate))
    buf.put("SSND".getBytes("US-ASCII")); buf.putInt(8 + dataLen)
    buf.putInt(0); buf.putInt(0)     // offset, blockSize
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Strict AIFF parse (16-bit big-endian PCM). Walks the FORM chunk
    * list for COMM + SSND; header fields gate hard like the other
    * codecs so non-AIFF payloads fall through to the fallback. */
  def parseAiff(b: Array[Byte]): Option[AiffInfo] = {
    if (b.length < 12) return None
    if (!(b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
          b(8) == 'A' && b(9) == 'I' && b(10) == 'F' && b(11) == 'F')) return None
    var off = 12
    var comm: Option[(Int, Long, Int, Int)] = None // (channels, frames, bits, rate)
    var ssnd: Option[(Int, Int)] = None            // (dataOffset, dataLen)
    while (off + 8 <= b.length && (comm.isEmpty || ssnd.isEmpty)) {
      val id = new String(b, off, 4, "US-ASCII")
      val len = be32(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return None
      id match {
        case "COMM" =>
          if (len < 18) return None
          val channels = ((b(off + 8) & 0xff) << 8) | (b(off + 9) & 0xff)
          val frames = be32(b, off + 10)
          val bits = ((b(off + 14) & 0xff) << 8) | (b(off + 15) & 0xff)
          if (channels < 1 || channels > 8 || bits != 16) return None
          parseExtended80(b, off + 16) match {
            case Some(rate) => comm = Some((channels, frames, bits, rate))
            case None       => return None
          }
        case "SSND" =>
          if (len < 8) return None
          val dataOff = be32(b, off + 8) // offset into the sound data
          if (dataOff < 0 || dataOff > len - 8) return None
          ssnd = Some((off + 16 + dataOff.toInt, (len - 8 - dataOff).toInt))
        case _ => ()
      }
      off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    for ((channels, frames, bits, rate) <- comm; (dOff, dLen) <- ssnd) yield {
      val frameBytes = channels * 2
      val nFrames = math.min(frames, if (frameBytes == 0) 0L else dLen.toLong / frameBytes)
      val nSamples = nFrames * channels
      var sumSq = 0.0
      var peak = 0.0
      var i = 0L
      while (i < nSamples) {
        val at = dOff + (i * 2).toInt
        val v = (((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)).toShort.toDouble / 32768.0
        sumSq += v * v
        val a = math.abs(v)
        if (a > peak) peak = a
        i += 1
      }
      val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
      AiffInfo(rate, channels, bits, nFrames, nFrames.toDouble / rate, rms, peak)
    }
  }

  /** P6 green-channel pixel values in raster order (the grayscale
    * plane for r=g=b images) — the pixel-level accessor the
    * perceptual-hash path needs beyond [[parsePpm]]'s means. */
  def ppmGrayPixels(b: Array[Byte]): Option[Array[Int]] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    parseNetpbmHeader(b, 2).collect {
      case (w, h, _, start) if b.length - start == w.toLong * h * 3 =>
        Array.tabulate(w * h)(i => b(start + 3 * i + 1) & 0xff)
    }
  }

  /** Strict binary-PPM (P6) parse; None unless the header is valid
    * and the payload holds exactly width·height RGB triplets
    * (maxval < 256 — the 1-byte-per-channel form). */
  def parsePpm(b: Array[Byte]): Option[PpmInfo] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    parseNetpbmHeader(b, 2).collect {
      case (w, h, maxv, start) if b.length - start == w.toLong * h * 3 =>
        var sr = 0.0; var sg = 0.0; var sb = 0.0
        var i = start
        while (i < b.length) {
          sr += (b(i) & 0xff); sg += (b(i + 1) & 0xff); sb += (b(i + 2) & 0xff)
          i += 3
        }
        val n = w.toDouble * h
        val (mr, mg, mb) = (sr / n, sg / n, sb / n)
        PpmInfo(w, h, maxv, mr, mg, mb,
          0.299 * mr + 0.587 * mg + 0.114 * mb)
    }
  }

  // ---- PNG (RFC 2083): the first COMPRESSED container through the
  // seam — chunk walk with CRC-32 verification, zlib inflate
  // (java.util.zip — in the JDK, no external codec), and the full
  // five-filter reconstruction (None/Sub/Up/Average/Paeth). Strictly
  // 8-bit RGB (colorType 2), non-interlaced; anything else fails to
  // None and the deterministic fallback like every other parser here.

  final case class PngInfo(width: Int, height: Int, bitDepth: Int,
                           meanR: Double, meanG: Double, meanB: Double,
                           meanLuma: Double)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def paeth(a: Int, bUp: Int, c: Int): Int = {
    val p = a + bUp - c
    val pa = math.abs(p - a); val pb = math.abs(p - bUp); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) bUp else c
  }

  /** Minimal RGB-8 PNG writer — the inverse of [[decodePngPixels]].
    * `filterType` (0..4) is applied to EVERY scanline, so the
    * synthesis queries can exercise each reconstruction path while
    * the decoded pixels stay filter-independent (the closed-form
    * oracle relies on exactly that). */
  def buildPng(w: Int, h: Int, rgb: Array[Byte], filterType: Int = 0): Array[Byte] = {
    require(rgb.length == w * h * 3, s"raster must be ${w * h * 3} bytes")
    require(filterType >= 0 && filterType <= 4, s"bad filter $filterType")
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte]((1 + stride) * h)
    for (y <- 0 until h) {
      raw(y * (1 + stride)) = filterType.toByte
      for (x <- 0 until stride) {
        val cur = rgb(y * stride + x) & 0xff
        val left = if (x >= bpp) rgb(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) rgb((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len, 0, 4)
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Strict PNG decode to raw RGB pixels: signature, CRC-verified
    * chunk walk, IHDR constraints (8-bit RGB, no interlace), IDAT
    * concat + inflate to the exact scanline length, all five filter
    * reconstructions. None on any violation. */
  def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < PngSig.length + 12) return None
    var i = 0
    while (i < PngSig.length) { if (b(i) != PngSig(i)) return None; i += 1 }
    var off = PngSig.length
    var wh: Option[(Int, Int)] = None
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    var first = true
    while (!ended && off + 12 <= b.length) {
      val len = be32(b, off)
      if (len < 0 || off + 12 + len > b.length) return None
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, off + 4, 4 + len.toInt)
      if ((crc.getValue & 0xffffffffL) != be32(b, off + 8 + len.toInt)) return None
      typ match {
        case "IHDR" =>
          if (!first || len != 13) return None
          val w = be32(b, off + 8).toInt
          val h = be32(b, off + 12).toInt
          val bitDepth = b(off + 16) & 0xff
          val colorType = b(off + 17) & 0xff
          val (comp, filt, inter) =
            (b(off + 18) & 0xff, b(off + 19) & 0xff, b(off + 20) & 0xff)
          if (w <= 0 || h <= 0 || bitDepth != 8 || colorType != 2 ||
              comp != 0 || filt != 0 || inter != 0) return None
          wh = Some((w, h))
        case "IDAT" =>
          if (wh.isEmpty) return None
          idat.write(b, off + 8, len.toInt)
        case "IEND" => ended = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      first = false
      off += 12 + len.toInt
    }
    for ((w, h) <- wh if ended) yield {
      val stride = w * 3
      val raw = new Array[Byte]((1 + stride) * h)
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !inflater.finished()) {
          val n = inflater.inflate(raw, got, raw.length - got)
          if (n == 0 && inflater.needsInput()) return None // truncated
          got += n
        }
        if (got != raw.length || !inflater.finished()) return None
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inflater.end()
      val px = new Array[Byte](stride * h)
      val bpp = 3
      for (y <- 0 until h) {
        val ft = raw(y * (1 + stride)) & 0xff
        if (ft > 4) return None
        for (x <- 0 until stride) {
          val f = raw(y * (1 + stride) + 1 + x) & 0xff
          val left = if (x >= bpp) px(y * stride + x - bpp) & 0xff else 0
          val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
          val ul = if (y > 0 && x >= bpp) px((y - 1) * stride + x - bpp) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          px(y * stride + x) = ((f + pred) & 0xff).toByte
        }
      }
      (w, h, px)
    }
  }

  /** PNG feature parse — channel means + luma over the decoded
    * pixels, the PpmInfo shape for the compressed container. */
  def parsePng(b: Array[Byte]): Option[PngInfo] =
    decodePngPixels(b).map { case (w, h, px) =>
      var sr = 0.0; var sg = 0.0; var sb2 = 0.0
      var i = 0
      while (i < px.length) {
        sr += (px(i) & 0xff); sg += (px(i + 1) & 0xff); sb2 += (px(i + 2) & 0xff)
        i += 3
      }
      val n = w.toDouble * h
      val (mr, mg, mb) = (sr / n, sg / n, sb2 / n)
      PngInfo(w, h, 8, mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb)
    }
}
