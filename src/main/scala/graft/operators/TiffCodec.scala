package graft.operators

/** Baseline TIFF 6.0 codec — pure-JVM, byte-level, both directions.
  *
  * The document-scan container of the multimodal family (multi-page
  * scans are TIFF's home turf), and the third entropy coder in the
  * engine: TIFF-LZW is a genuinely different machine from GIF-LZW —
  * MSB-first bit packing, a fixed 256-literal alphabet (codes start at
  * 9 bits), and the spec's "early change" (the code width bumps one
  * code EARLIER than the dictionary arithmetic alone would require, an
  * off-by-one every reader must reproduce or streams desync). PackBits
  * run-length coding and uncompressed strips complete the baseline
  * compression set; horizontal-differencing predictor 2 is decoded
  * when present (what LZW writers commonly emit).
  *
  * Container surface: both byte orders ("II" little-endian and "MM"
  * big-endian), IFD entry walking with inline-vs-offset values,
  * multi-strip images (RowsPerStrip), grayscale / RGB / palette-color
  * photometrics incl. WhiteIsZero inversion, and MULTI-PAGE files via
  * the chained-IFD convention (each page decodes independently —
  * unlike GIF frames there is no compositing).
  *
  * Decode yields one gray-or-RGB pixel array per page; any
  * malformation yields None (corrupt-is-data, the family contract).
  * Spark-side plumbing: [[Multimodal.decodeTiffPages]], mapPartitions
  * after a compute repartition — per-row CPU work, embarrassingly
  * parallel.
  *
  * Reference scope: the reference treats media as opaque values (no
  * decode in `/root/reference/dags`); §2.12 extension surface.
  */
object TiffCodec {

  // ---- TIFF-LZW (MSB-first, 256-literal alphabet, early change) ----

  private final class MsbBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0L
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      cur = (cur << width) | (code & ((1L << width) - 1))
      nbits += width
      while (nbits >= 8) {
        out.write(((cur >>> (nbits - 8)) & 0xff).toInt)
        nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { out.write(((cur << (8 - nbits)) & 0xff).toInt); nbits = 0 }
      out.toByteArray
    }
  }

  private final class MsbBitReader(data: Array[Byte]) {
    private var pos = 0
    private var cur = 0L
    private var nbits = 0
    def get(width: Int): Int = {
      while (nbits < width) {
        if (pos >= data.length) return -1
        cur = (cur << 8) | (data(pos) & 0xffL)
        pos += 1; nbits += 8
      }
      val v = ((cur >>> (nbits - width)) & ((1L << width) - 1)).toInt
      nbits -= width
      v
    }
  }

  private val Clear = 256
  private val Eoi = 257

  /** TIFF-LZW compress. Width starts at 9; the EARLY CHANGE bumps it
    * when the NEXT code to assign is 2^width − 1 (one earlier than
    * GIF) — mirrored exactly by [[lzwDecompress]] and by every
    * conforming reader. Table resets via Clear at 4094 entries. */
  private[graft] def lzwCompress(data: Array[Byte]): Array[Byte] = {
    val bw = new MsbBitWriter
    var width = 9
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = Eoi + 1
    bw.put(Clear, width)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key: Integer = (prefix << 8) | k
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          bw.put(prefix, width)
          dict.put(key, next); next += 1
          // early change, encoder side: the decoder (one table entry
          // behind) widens when ITS count hits 2^w − 1, so the encoder
          // widens at 2^w — the libtiff `nextcode > maxcode` boundary
          if (next == (1 << width) && width < 12) width += 1
          if (next >= 4094) { // spec: reset before the table tops out
            bw.put(Clear, width)
            dict = new java.util.HashMap[Integer, Integer]()
            next = Eoi + 1
            width = 9
          }
          prefix = k
        }
        i += 1
      }
      bw.put(prefix, width)
    }
    bw.put(Eoi, width)
    bw.finish()
  }

  /** TIFF-LZW decompress to exactly `n` bytes; None on malformation. */
  private[graft] def lzwDecompress(data: Array[Byte], n: Int): Option[Array[Byte]] = {
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var j = 0
    while (j < 256) { prefix(j) = -1; suffix(j) = j.toByte; j += 1 }
    val out = new Array[Byte](n)
    var outPos = 0
    val br = new MsbBitReader(data)
    var width = 9
    var next = Eoi + 1
    var prev = -1
    val stack = new Array[Byte](4096)
    def emit(code: Int): Int = {
      var top = 0
      var c = code
      while (c >= 0) { stack(top) = suffix(c); top += 1; c = prefix(c) }
      val first = stack(top - 1) & 0xff
      while (top > 0 && outPos < n) { top -= 1; out(outPos) = stack(top); outPos += 1 }
      first
    }
    while (outPos < n) {
      val code = br.get(width)
      if (code < 0) return None
      if (code == Clear) {
        next = Eoi + 1; width = 9; prev = -1
      } else if (code == Eoi) {
        return if (outPos == n) Some(out) else None
      } else if (prev < 0) {
        if (code >= Clear) return None
        emit(code); prev = code
      } else if (code <= next && next < 4096) {
        val first =
          if (code == next) {
            val f = emit(prev)
            if (outPos < n) { out(outPos) = f.toByte; outPos += 1 }
            f
          } else emit(code)
        prefix(next) = prev; suffix(next) = first.toByte; next += 1
        // early change mirror: widen when next hits 2^width − 1
        if (next == (1 << width) - 1 && width < 12) width += 1
        prev = code
      } else if (code < next) { // table full but known codes still valid
        emit(code); prev = code
      } else return None
    }
    Some(out)
  }

  // ---- PackBits (TIFF 6.0 §9) ----

  private[graft] def packBits(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) && run < 128) run += 1
      if (run >= 2) { // replicate packet: -(run−1), byte
        out.write(1 - run)
        out.write(data(i))
        i += run
      } else { // literal packet up to the next ≥3-run or 128 bytes
        var lit = 1
        var stop = false
        while (!stop && i + lit < data.length && lit < 128) {
          if (i + lit + 2 < data.length &&
            data(i + lit) == data(i + lit + 1) &&
            data(i + lit) == data(i + lit + 2)) stop = true
          else lit += 1
        }
        out.write(lit - 1)
        out.write(data, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  private[graft] def unpackBits(data: Array[Byte], n: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    while (o < n) {
      if (i >= data.length) return None
      val c = data(i); i += 1
      if (c >= 0) {
        val len = c + 1
        if (i + len > data.length || o + len > n) return None
        System.arraycopy(data, i, out, o, len)
        i += len; o += len
      } else if (c != -128) {
        val len = 1 - c
        if (i >= data.length || o + len > n) return None
        java.util.Arrays.fill(out, o, o + len, data(i))
        i += 1; o += len
      } // -128: no-op
    }
    Some(out)
  }

  // ---- container ----

  /** One page to encode: 8-bit samples, `samplesPerPx` 1 (gray) or 3
    * (RGB), `pixels` row-major w·h·spp bytes, `compression` 1 (none),
    * 5 (LZW) or 32773 (PackBits); strips of `rowsPerStrip` rows. */
  final case class TiffPage(w: Int, h: Int, samplesPerPx: Int,
                            pixels: Array[Byte], compression: Int = 1,
                            rowsPerStrip: Int = 4)

  private final class Buf(bigEndian: Boolean) {
    val out = new java.io.ByteArrayOutputStream()
    def size: Int = out.size()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit =
      if (bigEndian) { u8(v >>> 8); u8(v) } else { u8(v); u8(v >>> 8) }
    def u32(v: Long): Unit =
      if (bigEndian) { u8((v >>> 24).toInt); u8((v >>> 16).toInt); u8((v >>> 8).toInt); u8(v.toInt) }
      else { u8(v.toInt); u8((v >>> 8).toInt); u8((v >>> 16).toInt); u8((v >>> 24).toInt) }
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def patchU32(at: Int, v: Long): Unit = patches += (at -> v) // applied at finish
    val patches = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    def finish(): Array[Byte] = {
      val arr = out.toByteArray
      patches.foreach { case (at, v) =>
        val bs =
          if (bigEndian) Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
          else Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
        System.arraycopy(bs, 0, arr, at, 4)
      }
      arr
    }
  }

  /** Encode a (possibly multi-page) baseline TIFF: header, per-page
    * strip data + chained IFDs, both byte orders. */
  def encode(pages: Seq[TiffPage], bigEndian: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "at least one page")
    val b = new Buf(bigEndian)
    b.u8(if (bigEndian) 'M' else 'I'); b.u8(if (bigEndian) 'M' else 'I')
    b.u16(42)
    val firstIfdPatch = b.size
    b.u32(0) // patched to first IFD offset
    var prevNextPatch = firstIfdPatch
    pages.foreach { p =>
      require(p.pixels.length == p.w * p.h * p.samplesPerPx, "pixels must be w*h*spp")
      require(p.samplesPerPx == 1 || p.samplesPerPx == 3, "spp 1 or 3")
      // strips
      val rps = math.max(1, p.rowsPerStrip)
      val rowBytes = p.w * p.samplesPerPx
      val nStrips = (p.h + rps - 1) / rps
      val offsets = new Array[Long](nStrips)
      val counts = new Array[Long](nStrips)
      (0 until nStrips).foreach { s =>
        val rows = math.min(rps, p.h - s * rps)
        val raw = java.util.Arrays.copyOfRange(p.pixels,
          s * rps * rowBytes, s * rps * rowBytes + rows * rowBytes)
        val packed = p.compression match {
          case 1 => raw
          case 5 => lzwCompress(raw)
          case 32773 => packBits(raw)
          case c => throw new IllegalArgumentException(s"compression $c")
        }
        offsets(s) = b.size.toLong
        counts(s) = packed.length.toLong
        b.bytes(packed)
      }
      if (b.size % 2 == 1) b.u8(0) // word-align the IFD
      // out-of-line value areas needed by the IFD
      var bitsOffset = -1L
      if (p.samplesPerPx == 3) { bitsOffset = b.size.toLong; (0 until 3).foreach(_ => b.u16(8)) }
      var stripOffAt = -1L; var stripCntAt = -1L
      if (nStrips > 1) {
        stripOffAt = b.size.toLong; offsets.foreach(b.u32)
        stripCntAt = b.size.toLong; counts.foreach(b.u32)
      }
      // IFD
      val ifdAt = b.size.toLong
      b.patchU32(prevNextPatch, ifdAt)
      val entries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Buf => Unit)]
      def shortVal(v: Int)(bb: Buf): Unit = { bb.u16(v); bb.u16(0) }
      def longVal(v: Long)(bb: Buf): Unit = bb.u32(v)
      entries += ((256, 4, 1L, longVal(p.w)))
      entries += ((257, 4, 1L, longVal(p.h)))
      if (p.samplesPerPx == 1) entries += ((258, 3, 1L, shortVal(8)))
      else entries += ((258, 3, 3L, longVal(bitsOffset)))
      entries += ((259, 3, 1L, shortVal(p.compression)))
      entries += ((262, 3, 1L, shortVal(if (p.samplesPerPx == 3) 2 else 1)))
      if (nStrips == 1) entries += ((273, 4, 1L, longVal(offsets(0))))
      else entries += ((273, 4, nStrips.toLong, longVal(stripOffAt)))
      entries += ((277, 3, 1L, shortVal(p.samplesPerPx)))
      entries += ((278, 4, 1L, longVal(rps)))
      if (nStrips == 1) entries += ((279, 4, 1L, longVal(counts(0))))
      else entries += ((279, 4, nStrips.toLong, longVal(stripCntAt)))
      b.u16(entries.size)
      entries.foreach { case (tag, tpe, cnt, writeVal) =>
        b.u16(tag); b.u16(tpe); b.u32(cnt); writeVal(b)
      }
      prevNextPatch = b.size
      b.u32(0) // next-IFD (patched by the following page, 0 on the last)
    }
    b.finish()
  }

  /** Decode every page: Some(Seq((w, h, channels 1|3, bytes))) or None
    * on any malformation. Supports compression 1/5/32773, predictor 2,
    * photometrics 0 (WhiteIsZero, inverted) / 1 (gray) / 2 (RGB) /
    * 3 (palette via 16-bit ColorMap, reduced to 8-bit), multi-strip
    * and chained multi-page IFDs, both byte orders; 8-bit samples. */
  def decode(p: Array[Byte]): Option[Seq[(Int, Int, Int, Array[Byte])]] = try {
    if (p.length < 8) return None
    val bigEndian =
      if ((p(0) & 0xff) == 'M'.toInt && (p(1) & 0xff) == 'M'.toInt) true
      else if ((p(0) & 0xff) == 'I'.toInt && (p(1) & 0xff) == 'I'.toInt) false
      else return None
    def u8(i: Int) = p(i) & 0xff
    def u16(i: Int) = if (bigEndian) (u8(i) << 8) | u8(i + 1) else u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long =
      if (bigEndian) ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3))
      else (u8(i).toLong | (u8(i + 1) << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24))
    if (u16(2) != 42) return None
    var ifdAt = u32(4)
    val pages = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Array[Byte])]
    var pageGuard = 0
    while (ifdAt != 0 && pageGuard < 64) {
      pageGuard += 1
      val at = ifdAt.toInt
      if (at < 0 || at + 2 > p.length) return None
      val n = u16(at)
      if (at + 2 + n * 12 + 4 > p.length) return None
      // tag -> (type, count, value-field offset)
      val entries = (0 until n).map { e =>
        val ea = at + 2 + e * 12
        u16(ea) -> ((u16(ea + 2), u32(ea + 4), ea + 8))
      }.toMap
      def sizeOf(tpe: Int) = tpe match {
        case 1 | 2 | 6 | 7 => 1
        case 3 => 2
        case 4 | 9 | 11 => 4
        case 5 | 10 | 12 => 8
        case _ => 0
      }
      /** Integer values of a BYTE/SHORT/LONG tag, inline or offset. */
      def ints(tag: Int): Option[Array[Long]] = entries.get(tag).flatMap {
        case (tpe, cnt, vAt) =>
          val sz = sizeOf(tpe)
          if (!(tpe == 1 || tpe == 3 || tpe == 4) || sz == 0 || cnt > (1 << 22)) None
          else {
            val total = sz * cnt
            val base = if (total <= 4) vAt.toLong else u32(vAt)
            if (base + total > p.length) None
            else Some(Array.tabulate(cnt.toInt) { k =>
              val o = (base + k * sz).toInt
              tpe match {
                case 1 => u8(o).toLong
                case 3 => u16(o).toLong
                case _ => u32(o)
              }
            })
          }
      }
      def int1(tag: Int, dflt: Long): Long = ints(tag).flatMap(_.headOption).getOrElse(dflt)
      val w = int1(256, -1).toInt
      val h = int1(257, -1).toInt
      if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
      val spp = int1(277, 1).toInt
      val photometric = int1(262, -1).toInt
      val compression = int1(259, 1).toInt
      val predictor = int1(317, 1).toInt
      val planar = int1(284, 1).toInt
      val bits = ints(258).getOrElse(Array(8L))
      if (!bits.forall(_ == 8L)) return None // 8-bit samples only
      if (planar != 1) return None // chunky only
      if (predictor != 1 && predictor != 2) return None
      // channel count must match the photometric model exactly: gray
      // (0/1) and palette (3) are 1-sample, RGB (2) is 3-sample — a
      // 2-sample page has no consumer downstream and must drop as None
      val sppOk = photometric match {
        case 0 | 1 | 3 => spp == 1
        case 2         => spp == 3
        case _         => false
      }
      if (!sppOk) return None
      val rps = math.max(1L, int1(278, h.toLong)).toInt
      val offs = ints(273).getOrElse(return None)
      val cnts = ints(279).getOrElse(return None)
      val nStrips = (h + rps - 1) / rps
      if (offs.length != nStrips || cnts.length != nStrips) return None
      val rowBytes = w * spp
      val raw = new Array[Byte](h * rowBytes)
      var filled = 0
      (0 until nStrips).foreach { s =>
        val rows = math.min(rps, h - s * rps)
        val want = rows * rowBytes
        val off = offs(s).toInt; val cnt = cnts(s).toInt
        if (off < 0 || cnt < 0 || off + cnt > p.length) return None
        val strip = java.util.Arrays.copyOfRange(p, off, off + cnt)
        val plain = compression match {
          case 1 => if (strip.length < want) return None
            else java.util.Arrays.copyOf(strip, want)
          case 5 => lzwDecompress(strip, want).getOrElse(return None)
          case 32773 => unpackBits(strip, want).getOrElse(return None)
          case _ => return None
        }
        System.arraycopy(plain, 0, raw, filled, want)
        filled += want
      }
      if (predictor == 2) { // horizontal differencing: cumsum per row/channel
        var y = 0
        while (y < h) {
          var k = spp
          while (k < rowBytes) {
            raw(y * rowBytes + k) = ((raw(y * rowBytes + k) + raw(y * rowBytes + k - spp)) & 0xff).toByte
            k += 1
          }
          y += 1
        }
      }
      val page: (Int, Int, Int, Array[Byte]) = photometric match {
        case 1 => (w, h, spp, raw)
        case 0 => // WhiteIsZero: invert
          val inv = raw.map(v => (255 - (v & 0xff)).toByte)
          (w, h, spp, inv)
        case 2 => if (spp != 3) return None else (w, h, 3, raw)
        case 3 =>
          val cm = ints(320).getOrElse(return None) // 3 * 256 SHORTs for 8-bit
          if (cm.length != 3 * 256) return None
          val px = new Array[Byte](w * h * 3)
          var k = 0
          while (k < w * h) {
            val j = raw(k) & 0xff
            px(k * 3) = (cm(j) >> 8).toByte
            px(k * 3 + 1) = (cm(256 + j) >> 8).toByte
            px(k * 3 + 2) = (cm(512 + j) >> 8).toByte
            k += 1
          }
          (w, h, 3, px)
        case _ => return None
      }
      pages += page
      ifdAt = u32(at + 2 + n * 12)
    }
    // the page guard bounds IFD cycles; exhausting it with a live next
    // pointer means an undecodable (or adversarially cyclic) file —
    // refuse rather than silently truncate the page list
    if (ifdAt != 0) return None
    if (pages.isEmpty) None else Some(pages.toSeq)
  } catch { case _: Exception => None }
}
