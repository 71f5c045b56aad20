package graft.operators

/** Pure-JVM FITS reader/writer — headers + BINTABLE extensions, the
  * reference's native input format (df_utils.py:11-74 fits_to_df;
  * metadata.py:106-175 load_header_meta). Implemented from the public
  * FITS Standard 4.0: 2880-byte blocks of 80-char ASCII header cards,
  * big-endian binary-table payloads. No external library — the same
  * strict-parse shape as [[MediaCodecs]]: magic + internally
  * consistent sizes or a clean failure.
  *
  * Supported TFORM codes: L (logical), B (unsigned byte), I (int16),
  * J (int32), K (int64), E (float32), D (float64), A (characters —
  * repeat = string width, trailing blanks stripped like astropy),
  * and the variable-length array descriptors P (32-bit) / Q (64-bit)
  * over any of those element codes — `rPt(emax)`: the main-table
  * cell holds (count, heap offset) and the elements live in the
  * PCOUNT-sized heap after the table (FITS 4.0 §7.3.5; astropy keeps
  * these cells, df_utils.py:62-66). X is the packed bit-array code
  * (§7.3.3, bool array). Non-A repeats > 1 are array columns.
  * C/M (complex) are rejected. Gzipped FITS (astropy-transparent)
  * is handled by [[maybeGunzip]] at the byte boundary.
  */
object FitsCodec {

  val Block = 2880
  val CardLen = 80

  /** `heap` is the element code for variable-length columns (tcode
    * P or Q); the canonical [[tform]] omits the optional `(emax)` so
    * cross-file layout checks don't reject files that differ only in
    * their per-file maximum. X is the bit-array code: `rX` packs r
    * bits MSB-first into ceil(r/8) bytes (FITS 4.0 §7.3.3; astropy
    * reads it as a bool array). */
  final case class FitsCol(name: String, repeat: Int, tcode: Char,
                           heap: Option[Char] = None) {
    private def codeBytes(c: Char): Int = c match {
      case 'L' | 'B' | 'A' => 1
      case 'I' => 2
      case 'J' | 'E' => 4
      case 'K' | 'D' => 8
      case other => throw new IllegalArgumentException(
        s"unsupported TFORM code '$other' for column $name")
    }
    def elemBytes: Int = tcode match {
      case 'P' => 8  // (int32 count, int32 offset)
      case 'Q' => 16 // (int64 count, int64 offset)
      case 'X' => 1  // fieldBytes overridden: bits pack 8-per-byte
      case c => codeBytes(c)
    }
    /** element width of the HEAP data for P/Q columns. */
    def heapElemBytes: Int = codeBytes(heap.getOrElse(
      throw new IllegalStateException(s"$name is not variable-length")))
    def fieldBytes: Int =
      if (tcode == 'X') (repeat + 7) / 8 else repeat * elemBytes
    def isVar: Boolean = tcode == 'P' || tcode == 'Q'
    def isArray: Boolean = (repeat > 1 && tcode != 'A') ||
      (isVar && !heap.contains('A'))
    def tform: String =
      if (isVar) s"$repeat$tcode${heap.get}" else s"$repeat$tcode"
  }

  final case class Hdu(header: Vector[(String, Any)], dataOff: Int,
                       dataLen: Int) {
    lazy val hmap: Map[String, Any] = header.toMap
    def longKey(k: String): Option[Long] = hmap.get(k).collect {
      case l: Long => l
    }
  }

  // ---------------------------------------------------------------
  // writer
  // ---------------------------------------------------------------

  private def renderValue(v: Any): String = v match {
    case b: Boolean => (if (b) "T" else "F").reverse.padTo(20, ' ').reverse
    case l: Long => l.toString.reverse.padTo(20, ' ').reverse
    case i: Int => i.toString.reverse.padTo(20, ' ').reverse
    case d: Double =>
      // shortest round-trip decimal: parses back to the same IEEE
      // double on any engine
      val s = if (d == d.floor && math.abs(d) < 1e15 && !d.isInfinite)
        f"$d%.1f" else d.toString
      s.reverse.padTo(20, ' ').reverse
    case s: String =>
      val esc = s.replace("'", "''")
      "'" + esc.padTo(8, ' ') + "'"
    case other => throw new IllegalArgumentException(
      s"unsupported header value type: $other")
  }

  private def card(key: String, value: Any): String = {
    require(key.length <= 8, s"FITS keyword too long: $key")
    val s = key.padTo(8, ' ') + "= " + renderValue(value)
    require(s.length <= CardLen, s"card overflows 80 chars: $s")
    s.padTo(CardLen, ' ')
  }

  private def bareCard(text: String): String = text.padTo(CardLen, ' ')

  private def headerBytes(cards: Seq[String]): Array[Byte] = {
    val all = cards :+ bareCard("END")
    val blocks = (all.size * CardLen + Block - 1) / Block
    val sb = new StringBuilder(blocks * Block)
    all.foreach(sb ++= _)
    while (sb.length < blocks * Block) sb ++= bareCard("")
    sb.toString.getBytes("US-ASCII")
  }

  private val SupportedCodes = "LBIJKAEDX".toSet

  /** Parses "rT" / "rPt(emax)" / "rQt(emax)" (repeat optional,
    * default 1; `(emax)` optional on read). Only the supported codes
    * are accepted (C/M rejected here, eagerly); P/Q require a
    * supported heap element code (X can't be heaped — its packing is
    * row-relative). Returns (repeat, code, heapCode). */
  def parseTform(tform: String): (Int, Char, Option[Char]) = {
    val m = "^([0-9]*)([A-Z])([A-Z])?(?:\\((\\d+)\\))?$".r
      .findFirstMatchIn(tform.trim).getOrElse(
        throw new IllegalArgumentException(s"bad TFORM: '$tform'"))
    val code = m.group(2).head
    val heap = Option(m.group(3)).map(_.head)
    val r = if (m.group(1).isEmpty) 1 else m.group(1).toInt
    if (code == 'P' || code == 'Q') {
      val h = heap.getOrElse(throw new IllegalArgumentException(
        s"variable-length TFORM '$tform' lacks an element code"))
      require(SupportedCodes.contains(h) && h != 'X',
        s"unsupported heap element code '$h' in '$tform'")
      require(r <= 1, s"descriptor repeat > 1 unsupported: '$tform'")
      (r, code, Some(h))
    } else {
      require(SupportedCodes.contains(code), s"unsupported TFORM code '$code'")
      require(heap.isEmpty && m.group(4) == null, s"bad TFORM: '$tform'")
      (r, code, None)
    }
  }

  /** Builds a complete 2-HDU FITS file: a minimal primary HDU carrying
    * `primaryKeys` (the header-scan surface) and one BINTABLE
    * extension with `cols`/`rows` (the table-scan surface). Row cells
    * must match the column code: L→Boolean, B/I/J→Int, K→Long,
    * E→Float, D→Double, A→String (truncated/padded to the width);
    * fixed array columns take a Seq of exactly `repeat` elements.
    * Variable-length columns ("1PJ(…)", "1QD(…)" — the `(emax)` is
    * derived, don't pass it) take a Seq of ANY length (PA/QA take a
    * String); their elements go to the heap, PCOUNT-sized after the
    * table, with (count, offset) descriptors in the cells. */
  def buildFits(primaryKeys: Seq[(String, Any)], cols: Seq[(String, String)],
                rows: Seq[Seq[Any]]): Array[Byte] = {
    val parsed = cols.map { case (n, tf) =>
      val (r, c, h) = parseTform(tf); FitsCol(n, r, c, h)
    }
    val rowBytes = parsed.map(_.fieldBytes).sum

    // heap pass: per-varlen-cell element count, in row-major cell
    // order — offsets then accumulate in the same order
    def varLen(c: FitsCol, cell: Any): Int = (c.heap, cell) match {
      case (Some('A'), s: String) => s.length
      case (Some(_), xs: Seq[_])  => xs.size
      case other => throw new IllegalArgumentException(
        s"varlen cell/TFORM mismatch on ${c.name}: $other")
    }
    var heapSize = 0L
    val maxElems = scala.collection.mutable.Map[String, Int]()
    rows.foreach { r =>
      require(r.size == parsed.size, s"row arity ${r.size} != ${parsed.size}")
      r.lazyZip(parsed).foreach { (cell, c) =>
        if (c.isVar) {
          val n = varLen(c, cell)
          maxElems(c.name) = math.max(maxElems.getOrElse(c.name, 0), n)
          heapSize += n.toLong * c.heapElemBytes
        }
      }
    }
    require(heapSize <= Int.MaxValue - Block, s"heap too large: $heapSize")

    val primary = headerBytes(
      Seq(card("SIMPLE", true), card("BITPIX", 8L), card("NAXIS", 0L),
        card("EXTEND", true)) ++ primaryKeys.map { case (k, v) => card(k, v) })
    val tblHeader = headerBytes(
      Seq(card("XTENSION", "BINTABLE"), card("BITPIX", 8L),
        card("NAXIS", 2L), card("NAXIS1", rowBytes.toLong),
        card("NAXIS2", rows.size.toLong), card("PCOUNT", heapSize),
        card("GCOUNT", 1L), card("TFIELDS", parsed.size.toLong)) ++
        parsed.zipWithIndex.flatMap { case (c, i) =>
          val tf = if (c.isVar) s"${c.tform}(${maxElems.getOrElse(c.name, 0)})"
                   else c.tform
          Seq(card(s"TTYPE${i + 1}", c.name), card(s"TFORM${i + 1}", tf))
        })
    val tableLen = rowBytes * rows.size
    val dataLen = tableLen + heapSize.toInt // THEAP default: heap abuts table
    val padded = (dataLen + Block - 1) / Block * Block
    val buf = java.nio.ByteBuffer.allocate(
      primary.length + tblHeader.length + padded)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(primary).put(tblHeader)
    val tableStart = buf.position()
    val heapStart = tableStart + tableLen
    var heapAt = 0 // next free heap offset (bytes, relative)

    def putElem(code: Char, name: String)(v: Any): Unit = (code, v) match {
      case ('L', b: Boolean) => buf.put((if (b) 'T' else 'F').toByte)
      case ('B', i: Int) => buf.put(i.toByte)
      case ('I', i: Int) => buf.putShort(i.toShort)
      case ('J', i: Int) => buf.putInt(i)
      case ('K', l: Long) => buf.putLong(l)
      case ('E', f: Float) => buf.putFloat(f)
      case ('D', d: Double) => buf.putDouble(d)
      case other => throw new IllegalArgumentException(
        s"cell/TFORM mismatch on $name: $other")
    }

    rows.foreach { r =>
      r.lazyZip(parsed).foreach { (cell, c) =>
        (c.tcode, cell) match {
          case ('X', b: Boolean) => // 1X scalar bit
            require(c.repeat == 1, s"scalar bit cell on ${c.name} needs repeat 1")
            buf.put((if (b) 0x80 else 0x00).toByte)
          case ('X', bits: Seq[_]) =>
            require(bits.size == c.repeat,
              s"bit cell size ${bits.size} != repeat ${c.repeat} on ${c.name}")
            // MSB-first packing, zero-padded to the byte boundary
            val packed = new Array[Byte](c.fieldBytes)
            bits.zipWithIndex.foreach {
              case (b: Boolean, i) =>
                if (b) packed(i / 8) = (packed(i / 8) | (0x80 >> (i % 8))).toByte
              case (other, _) => throw new IllegalArgumentException(
                s"bit cell on ${c.name} must hold Booleans, got $other")
            }
            buf.put(packed)
          case ('P' | 'Q', _) =>
            val n = varLen(c, cell)
            // descriptor in the cell, elements at the heap cursor
            if (c.tcode == 'P') { buf.putInt(n); buf.putInt(heapAt) }
            else { buf.putLong(n.toLong); buf.putLong(heapAt.toLong) }
            val cellAt = buf.position()
            buf.position(heapStart + heapAt)
            (c.heap.get, cell) match {
              case ('A', s: String) => buf.put(s.getBytes("US-ASCII"))
              case (h, xs: Seq[_])  => xs.foreach(putElem(h, c.name))
              case _ => // varLen already rejected this shape
            }
            heapAt += n * c.heapElemBytes
            buf.position(cellAt)
          case ('A', s: String) =>
            val fixed = s.take(c.repeat).padTo(c.repeat, ' ')
            buf.put(fixed.getBytes("US-ASCII"))
          case (_, xs: Seq[_]) if c.isArray =>
            require(xs.size == c.repeat,
              s"array cell size ${xs.size} != repeat ${c.repeat} on ${c.name}")
            xs.foreach(putElem(c.tcode, c.name))
          case (_, v) => putElem(c.tcode, c.name)(v)
        }
      }
    }
    buf.array()
  }

  /** Transparent gzip unwrap at the byte boundary (astropy reads
    * `.fits.gz` the same way): gzip magic → inflate, else identity.
    * Callers must pass the SAME (unwrapped) bytes to [[hdus]] and
    * [[readRows]] — offsets are relative to the uncompressed image. */
  def maybeGunzip(b: Array[Byte]): Array[Byte] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) b
    else {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 64 * 1024)
      try in.readAllBytes() finally in.close()
    }
  }

  // ---------------------------------------------------------------
  // parser
  // ---------------------------------------------------------------

  private def parseCardValue(raw: String): Any = {
    val t = raw.dropWhile(_ == ' ')
    if (t.startsWith("'")) {
      // string: scan to the closing quote, '' = escaped quote
      val sb = new StringBuilder
      var i = 1
      var closed = false
      while (i < t.length && !closed) {
        if (t(i) == '\'') {
          if (i + 1 < t.length && t(i + 1) == '\'') { sb += '\''; i += 2 }
          else { closed = true; i += 1 }
        } else { sb += t(i); i += 1 }
      }
      if (!closed) throw new IllegalArgumentException(s"unterminated string: $raw")
      // FITS strings are blank-padded: trailing blanks insignificant
      sb.toString.reverse.dropWhile(_ == ' ').reverse
    } else {
      val noComment = t.indexOf('/') match {
        case -1 => t
        case i => t.substring(0, i)
      }
      val v = noComment.trim
      if (v == "T") true
      else if (v == "F") false
      else if (v.matches("[+-]?[0-9]+")) v.toLong
      else if (v.nonEmpty)
        try v.replace('D', 'E').replace('d', 'E').toDouble
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(s"unparseable value: $raw") }
      else null
    }
  }

  /** Parses one header starting at `off`; returns (cards-in-order,
    * offset of the data area = next 2880 boundary after END). */
  def parseHeader(b: Array[Byte], off: Int): (Vector[(String, Any)], Int) = {
    require(off % Block == 0 && off < b.length, s"bad header offset $off")
    val cards = Vector.newBuilder[(String, Any)]
    var i = off
    var ended = false
    while (!ended) {
      if (i + CardLen > b.length)
        throw new IllegalArgumentException("truncated header (no END card)")
      val card = new String(b, i, CardLen, "US-ASCII")
      val key = card.substring(0, 8).trim
      if (key == "END") ended = true
      else if (card.length >= 10 && card(8) == '=' && card(9) == ' ') {
        val v = parseCardValue(card.substring(10))
        if (v != null) cards += key -> v
      }
      i += CardLen
    }
    val dataOff = (i - off + Block - 1) / Block * Block + off
    (cards.result(), dataOff)
  }

  private def dataBytes(hmap: Map[String, Any]): Int = {
    def l(k: String, dflt: Long = 0L): Long = hmap.get(k) match {
      case Some(v: Long) => v
      case _ => dflt
    }
    val naxis = l("NAXIS")
    if (naxis == 0) 0
    else {
      val shape = (1L to naxis).map(i => l(s"NAXIS$i"))
      val bitpix = math.abs(l("BITPIX", 8L))
      val g = l("GCOUNT", 1L)
      val p = l("PCOUNT", 0L)
      val n = bitpix / 8 * g * (p + shape.product)
      require(n >= 0 && n <= Int.MaxValue, s"data area too large: $n")
      n.toInt
    }
  }

  /** All HDUs of the file: (header cards, data offset, data length).
    * Strict: a malformed header or a data area running past EOF
    * throws (the header-scan caller maps that to "skip corrupted
    * file", matching the reference's OSError handling). */
  def hdus(b: Array[Byte]): Vector[Hdu] = {
    require(b.length >= Block &&
      new String(b, 0, 6, "US-ASCII") == "SIMPLE", "not a FITS file")
    val out = Vector.newBuilder[Hdu]
    var off = 0
    while (off < b.length) {
      val (cards, dataOff) = parseHeader(b, off)
      val len = dataBytes(cards.toMap)
      require(dataOff + len <= b.length, "data area runs past EOF")
      out += Hdu(cards, dataOff, len)
      off = dataOff + (len + Block - 1) / Block * Block
    }
    out.result()
  }

  /** BINTABLE column layout of an HDU (order = TFORM index order). */
  def bintableCols(h: Hdu): Vector[FitsCol] = {
    require(h.hmap.get("XTENSION").contains("BINTABLE"),
      "HDU is not a BINTABLE")
    val n = h.longKey("TFIELDS").getOrElse(0L).toInt
    val cols = (1 to n).toVector.map { i =>
      val name = h.hmap.get(s"TTYPE$i") match {
        case Some(s: String) => s
        case _ => s"col$i"
      }
      val tf = h.hmap.get(s"TFORM$i") match {
        case Some(s: String) => s
        case _ => throw new IllegalArgumentException(s"missing TFORM$i")
      }
      val (r, c, hp) = parseTform(tf)
      FitsCol(name, r, c, hp)
    }
    val rowBytes = h.longKey("NAXIS1").getOrElse(0L)
    require(cols.map(_.fieldBytes.toLong).sum == rowBytes,
      s"TFORM widths ${cols.map(_.fieldBytes).sum} != NAXIS1 $rowBytes")
    cols
  }

  /** Iterates the rows of a BINTABLE HDU, materializing only the
    * columns in `wanted` (indices into [[bintableCols]] order) — the
    * projection reaches the byte parser: unselected fields are never
    * decoded. Cell types: L→Boolean, B/I/J→Int, K→Long, E→Float,
    * D→Double, A→String (trailing blanks stripped); array columns
    * yield Seq of the element type. Variable-length (P/Q) cells
    * resolve through their (count, offset) descriptor into the heap
    * (THEAP, default = NAXIS1·NAXIS2) and yield a Seq of the heap
    * element type — PA/QA yield a String (no blank stripping: the
    * length is explicit). */
  def readRows(b: Array[Byte], h: Hdu, wanted: Array[Int]): Iterator[Array[Any]] = {
    val cols = bintableCols(h)
    val offsets = cols.scanLeft(0)(_ + _.fieldBytes).toArray
    val rowBytes = h.longKey("NAXIS1").getOrElse(0L).toInt
    val nRows = h.longKey("NAXIS2").getOrElse(0L).toInt
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.BIG_ENDIAN)
    val heapBase = h.dataOff +
      h.longKey("THEAP").getOrElse(rowBytes.toLong * nRows).toInt

    def readCode(code: Char, at: Int): Any = code match {
      case 'L' => b(at) == 'T'
      case 'B' => b(at) & 0xff
      case 'I' => bb.getShort(at).toInt
      case 'J' => bb.getInt(at)
      case 'K' => bb.getLong(at)
      case 'E' => bb.getFloat(at)
      case 'D' => bb.getDouble(at)
      case other => throw new IllegalArgumentException(s"unsupported code $other")
    }

    def readVar(c: FitsCol, at: Int): Any = {
      val (n, off) =
        if (c.tcode == 'P') (bb.getInt(at).toLong, bb.getInt(at + 4).toLong)
        else (bb.getLong(at), bb.getLong(at + 8))
      require(n >= 0 && off >= 0 &&
        heapBase + off + n * c.heapElemBytes <= b.length &&
        heapBase + off + n * c.heapElemBytes <= h.dataOff + h.dataLen,
        s"varlen descriptor (n=$n, off=$off) on ${c.name} runs past the heap")
      val start = heapBase + off.toInt
      c.heap.get match {
        case 'A' => new String(b, start, n.toInt, "US-ASCII")
        case hc  =>
          val w = c.heapElemBytes
          (0 until n.toInt).map(k => readCode(hc, start + k * w))
      }
    }

    Iterator.tabulate(nRows) { r =>
      val base = h.dataOff + r * rowBytes
      wanted.map { ci =>
        val c = cols(ci)
        val at = base + offsets(ci)
        if (c.isVar) readVar(c, at)
        else if (c.tcode == 'X') {
          // MSB-first bit unpack; repeat == 1 yields a scalar Boolean
          // (astropy's bool), larger repeats a Seq[Boolean]
          def bit(i: Int): Boolean = (b(at + i / 8) & (0x80 >> (i % 8))) != 0
          if (c.repeat == 1) bit(0) else (0 until c.repeat).map(bit)
        } else if (c.tcode == 'A') {
          val s = new String(b, at, c.repeat, "US-ASCII")
          s.reverse.dropWhile(_ == ' ').reverse
        } else if (c.isArray) {
          (0 until c.repeat).map(k => readCode(c.tcode, at + k * c.elemBytes))
        } else readCode(c.tcode, at)
      }
    }
  }
}
