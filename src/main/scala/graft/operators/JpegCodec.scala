package graft.operators

/** Pure-JVM BASELINE JPEG codec (ITU-T T.81 sequential DCT, Huffman
  * entropy coding) — the third real pixel codec beside the PNG
  * Inflater path and the BMP walk in [[Multimodal.PixelCodec]], built
  * with nothing beyond the JDK (round-7 verdict item 4).
  *
  * Decoder: full segment walk (APPn/COM length-skipped, so JFIF/EXIF
  * preambles parse), DQT (8- and 16-bit precision), SOF0
  * single-component grayscale, DHT canonical-code construction
  * (mincode/maxcode/valptr, the F.2.2.3 algorithm), DRI/RSTn restart
  * handling, the entropy scan with 0xFF00 byte-unstuffing, DC
  * prediction, RECEIVE/EXTEND (F.2.2.1), dequantization, de-zigzag,
  * float 2-D IDCT with coefficient-sparsity skip, level shift + clamp,
  * and edge crop for non-multiple-of-8 dimensions. Anything outside
  * baseline grayscale (progressive SOF2, multi-component color,
  * arithmetic coding) returns None — corrupt or unsupported rows are
  * data, not crashes, the PixelCodec contract.
  *
  * Encoder: the mirror image (level shift, float FDCT, round-half-away
  * quantization, zigzag, DC diff + AC run-length Huffman with ZRL/EOB,
  * byte stuffing, 1-padded final byte) emitting the Annex K standard
  * luminance Huffman tables in DHT — so encoder output is decodable by
  * any baseline decoder (JpegCodecSpec cross-checks against the JDK's
  * independent ImageIO decoder) and the decoder reads REAL
  * entropy-coded streams, not a private dialect.
  *
  * Fixture exactness: the quantization table ships a DC step of 8 —
  * for an image whose 8×8 blocks are each CONSTANT, every AC
  * coefficient is exactly 0 and the DC coefficient 8·(c−128) is an
  * exact multiple of the step, so quantize→dequantize→IDCT reproduces
  * the input pixels BIT-EXACTLY. That is what lets q_jpeg_decode's
  * DuckDB oracle recompute the decoded pixels arithmetically while the
  * payload remains a genuine Huffman-coded JPEG (the same
  * make-the-loss-zero-by-construction trick as the PNG filter-cycling
  * fixture). Non-constant blocks take the ordinary lossy path.
  */
object JpegCodec {

  // zigzag scan order: zigzag(k) = raster index of the k-th coefficient
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.3.3.1 luminance DC table: BITS (code counts per length 1..16)
  private val dcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals: Array[Int] = (0 to 11).toArray
  // Annex K.3.3.2 luminance AC table
  private val acBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val acVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** Quant table in ZIGZAG order: DC step 8 (exact block-constant round
    * trips, see object doc), AC steps 16. */
  private val quantZig: Array[Int] = Array.tabulate(64)(k => if (k == 0) 8 else 16)

  // cos((2x+1)·u·π/16) — the one table both DCT directions share
  private val cosT: Array[Double] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16)).flatten
  private def c0(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  // ---------------------------------------------------------------- encode

  /** Canonical Huffman code assignment from (BITS, HUFFVAL): value →
    * (code, length), in value-order within ascending code length. */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    (1 to 16).foreach { len =>
      (0 until bits(len)).foreach { _ =>
        table(vals(k)) = (code, len)
        code += 1; k += 1
      }
      code <<= 1
    }
    table
  }
  private lazy val dcEnc = buildEncodeTable(dcBits, dcVals)
  private lazy val acEnc = buildEncodeTable(acBits, acVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1 << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = (acc >>> (nbits - 8)) & 0xff
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) put(0x7f >> (7 - ((8 - nbits % 8) % 8)), (8 - nbits) % 8)
  }

  private def sizeCat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode an 8-bit grayscale baseline JPEG of `lum` (row-major rule).
    * Dimensions need not be multiples of 8 — edge blocks replicate the
    * last row/column (the conventional encoder padding). */
  def encode(w: Int, h: Int, lum: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    marker(0xDB); u16(2 + 1 + 64); u8(0x00) // DQT: 8-bit, table 0
    quantZig.foreach(u8)
    marker(0xC0); u16(2 + 6 + 3) // SOF0: 8-bit, 1 component, 1x1 sampling
    u8(8); u16(h); u16(w); u8(1); u8(1); u8(0x11); u8(0)
    marker(0xC4); u16(2 + 1 + 16 + dcVals.length); u8(0x00) // DHT DC class 0 id 0
    (1 to 16).foreach(l => u8(dcBits(l))); dcVals.foreach(u8)
    marker(0xC4); u16(2 + 1 + 16 + acVals.length); u8(0x10) // DHT AC class 1 id 0
    (1 to 16).foreach(l => u8(acBits(l))); acVals.foreach(u8)
    marker(0xDA); u16(2 + 1 + 2 + 3) // SOS
    u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)

    val bw = new BitWriter(out)
    def putVal(enc: Array[(Int, Int)], sym: Int): Unit = {
      val (code, len) = enc(sym)
      bw.put(code, len)
    }
    var pred = 0
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    (0 until bh8).foreach { by =>
      (0 until bw8).foreach { bx =>
        // level-shifted samples, edge-replicated
        (0 until 8).foreach { y =>
          val sy = math.min(by * 8 + y, h - 1)
          (0 until 8).foreach { x =>
            val sx = math.min(bx * 8 + x, w - 1)
            block(y * 8 + x) = (lum(sx, sy) & 0xff) - 128.0
          }
        }
        // FDCT + quantize (round half away from zero), zigzag order
        (0 until 64).foreach { k =>
          val r = zigzag(k); val u = r % 8; val v = r / 8
          var s = 0.0
          (0 until 8).foreach { y =>
            (0 until 8).foreach { x =>
              s += block(y * 8 + x) * cosT(x * 8 + u) * cosT(y * 8 + v)
            }
          }
          val f = 0.25 * c0(u) * c0(v) * s
          val q = f / quantZig(k)
          coef(k) = math.round(q).toInt // JVM round = floor(x+0.5); symmetric enough at half-ulp
        }
        // DC diff
        val diff = coef(0) - pred
        pred = coef(0)
        val s0 = if (diff == 0) 0 else sizeCat(diff)
        putVal(dcEnc, s0)
        if (s0 > 0) bw.put(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
        // AC run-length
        var run = 0
        (1 until 64).foreach { k =>
          if (coef(k) == 0) run += 1
          else {
            while (run >= 16) { putVal(acEnc, 0xF0); run -= 16 } // ZRL
            val sz = sizeCat(coef(k))
            putVal(acEnc, (run << 4) | sz)
            bw.put(if (coef(k) < 0) coef(k) + (1 << sz) - 1 else coef(k), sz)
            run = 0
          }
        }
        if (run > 0) putVal(acEnc, 0x00) // EOB
      }
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** F.2.2.3 canonical decode tables: per code length, the smallest and
    * largest code and the HUFFVAL offset of the smallest. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    (1 to 16).foreach { len =>
      if (bits(len) > 0) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len); k += bits(len)
        maxCode(len) = code - 1
      }
      code <<= 1
    }
    def value(i: Int): Int = vals(i)
  }

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false // RST/EOI seen mid-scan

    def align(): Unit = { acc = 0; nbits = 0 }

    /** Consume a restart marker at the current byte position (after
      * align). Returns false if what follows is not RSTn. */
    def restart(): Boolean = {
      if (pos + 2 > p.length || (p(pos) & 0xff) != 0xFF) return false
      val m = p(pos + 1) & 0xff
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2; hitMarker = false
      true
    }

    def bit(): Int = {
      if (nbits == 0) {
        if (hitMarker || pos >= p.length) { hitMarker = true; return 0 }
        var b = p(pos) & 0xff
        pos += 1
        if (b == 0xFF) {
          val next = if (pos < p.length) p(pos) & 0xff else 0xD9
          if (next == 0x00) pos += 1 // stuffed data byte
          else { hitMarker = true; pos -= 1; b = 0 } // marker: stop filling
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      (0 until n).foreach(_ => v = (v << 1) | bit())
      v
    }

    def decode(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
        code = (code << 1) | bit()
        len += 1
      }
      if (len > 16) return -1
      t.value(t.valPtr(len) + code - t.minCode(len))
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline sequential grayscale JPEG to (width, height,
    * row-major top-down luma). None for color / progressive /
    * arithmetic / corrupt payloads. */
  def decode(p: Array[Byte]): Option[(Int, Int, Array[Int])] = try {
    def u8(i: Int) = p(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None

    var i = 2
    var w = 0; var h = 0
    var quant: Array[Int] = null          // zigzag order, component 0's table
    var qtabs = Map.empty[Int, Array[Int]]
    var dcTabs = Map.empty[Int, HuffTable]
    var acTabs = Map.empty[Int, HuffTable]
    var qId = -1; var dcId = -1; var acId = -1
    var restartInterval = 0
    var scanAt = -1

    while (scanAt < 0 && i + 4 <= p.length) {
      if (u8(i) != 0xFF) return None
      val m = u8(i + 1)
      if (m == 0xFF) { i += 1 } // fill
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2
      else {
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > p.length) return None
        val seg = i + 4
        m match {
          case 0xDB => // DQT: one or more tables
            var j = seg
            while (j < i + 2 + len) {
              val prec = u8(j) >> 4; val id = u8(j) & 0x0f
              val n = if (prec == 0) 64 else 128
              if (j + 1 + n > i + 2 + len) return None
              val t = Array.tabulate(64)(k =>
                if (prec == 0) u8(j + 1 + k) else be16(j + 1 + 2 * k))
              qtabs += id -> t
              j += 1 + n
            }
          case 0xC4 => // DHT: one or more tables
            var j = seg
            while (j < i + 2 + len) {
              val cls = u8(j) >> 4; val id = u8(j) & 0x0f
              val bits = new Array[Int](17)
              var total = 0
              (1 to 16).foreach { l => bits(l) = u8(j + l); total += bits(l) }
              if (j + 17 + total > i + 2 + len) return None
              val vals = Array.tabulate(total)(k => u8(j + 17 + k))
              val t = new HuffTable(bits, vals)
              if (cls == 0) dcTabs += id -> t else acTabs += id -> t
              j += 17 + total
            }
          case 0xC0 => // SOF0 baseline
            h = be16(seg + 1); w = be16(seg + 3)
            val nf = u8(seg + 5)
            if (nf != 1) return None // grayscale only
            if (u8(seg + 7) != 0x11) return None // 1x1 sampling
            qId = u8(seg + 8)
          case c if c >= 0xC1 && c <= 0xCF && c != 0xC4 && c != 0xC8 && c != 0xCC =>
            return None // progressive / extended / arithmetic: unsupported
          case 0xDD => restartInterval = be16(seg)
          case 0xDA =>
            val ns = u8(seg)
            if (ns != 1) return None
            dcId = u8(seg + 2) >> 4; acId = u8(seg + 2) & 0x0f
            scanAt = i + 2 + len
          case _ => () // APPn, COM, ...
        }
        i += 2 + len
      }
    }
    if (scanAt < 0 || w <= 0 || h <= 0) return None
    quant = qtabs.getOrElse(qId, return None)
    val dcT = dcTabs.getOrElse(dcId, return None)
    val acT = acTabs.getOrElse(acId, return None)

    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    val out = new Array[Int](w * h)
    val coef = new Array[Int](64) // raster order, dequantized
    val br = new BitReader(p, scanAt)
    var pred = 0
    var mcu = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.align()
          if (!br.restart()) return None
          pred = 0
        }
        java.util.Arrays.fill(coef, 0)
        val s0 = br.decode(dcT)
        if (s0 < 0 || br.hitMarker) return None
        pred += extend(br.bits(s0), s0)
        coef(0) = pred * quant(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = br.decode(acT)
          if (rs < 0) return None
          val run = rs >> 4; val sz = rs & 0x0f
          if (sz == 0) {
            if (run == 15) k += 16 // ZRL
            else eob = true        // EOB
          } else {
            k += run
            if (k > 63) return None
            coef(zigzag(k)) = extend(br.bits(sz), sz) * quant(k)
            k += 1
          }
        }
        if (br.hitMarker && !(bx == bw8 - 1 && by == bh8 - 1)) return None
        // IDCT, skipping zero coefficients (block-sparse streams — the
        // DC-only fixture path costs 64 multiply-adds, not 64·64)
        (0 until 8).foreach { y =>
          val oy = by * 8 + y
          if (oy < h) {
            (0 until 8).foreach { x =>
              val ox = bx * 8 + x
              if (ox < w) {
                var s = 0.0
                (0 until 8).foreach { v =>
                  (0 until 8).foreach { u =>
                    val f = coef(v * 8 + u)
                    if (f != 0) s += c0(u) * c0(v) * f * cosT(x * 8 + u) * cosT(y * 8 + v)
                  }
                }
                val px = math.round(s / 4.0 + 128.0).toInt
                out(oy * w + ox) = math.max(0, math.min(255, px))
              }
            }
          }
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    Some((w, h, out))
  } catch { case scala.util.control.NonFatal(_) => None }
}
