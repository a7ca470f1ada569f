package graft.operators

/** GIF87a/GIF89a codec — pure-JVM, byte-level, both directions.
  *
  * Completes the image half of the multimodal family (PNG gray /
  * truecolor / indexed, BMP, baseline + progressive JPEG): GIF is the
  * remaining header format the corpus synthesizer emits
  * (`Multimodal.syntheticImage` id % 3 == 2) whose PIXELS were not yet
  * decodable. The interesting part is the LZW entropy coder — GIF's
  * variable-code-width LSB-first LZW with CLEAR/EOI codes and the
  * 4096-entry dictionary reset — plus the container's animation
  * surface: multiple image descriptors with sub-rectangle placement,
  * per-frame graphic-control extensions (transparency index, disposal
  * method), local color tables overriding the global one, and the
  * 4-pass row interlace.
  *
  * Decode semantics: frames are returned as full-canvas ARGB states
  * AFTER each image is drawn (the animation view), with disposal
  * applied between frames — none/keep (0, 1) leave the canvas,
  * restore-background (2) clears the frame rectangle to transparent,
  * restore-previous (3) rewinds to the pre-draw canvas. A transparent
  * pixel never overdraws the canvas; on a never-drawn cell it reads as
  * packed 0 (a = r = g = b = 0). Undecodable payloads yield None —
  * corrupt-is-data, same contract as the PNG/JPEG/WAVE/AVI codecs.
  *
  * Spark-side plumbing lives in [[Multimodal.decodeGifFrames]]
  * (mapPartitions over binary payloads after a compute repartition) —
  * byte-level codecs are per-row CPU work, embarrassingly parallel at
  * any scale.
  *
  * Reference scope: the reference pipeline treats media as opaque
  * values (no decode anywhere in `/root/reference/dags`); this is
  * §2.12 extension surface.
  */
object GifCodec {

  /** One frame to encode: palette `indices` for a `fw`×`fh` rectangle
    * at (`left`, `top`); `transparentIdx` < 0 = opaque frame;
    * `disposal` 0..3 per GIF89a; `interlaced` writes the 4-pass row
    * order; `delayCs` in centiseconds (animation pacing metadata). */
  final case class GifFrame(left: Int, top: Int, fw: Int, fh: Int,
                            indices: Array[Byte], transparentIdx: Int = -1,
                            disposal: Int = 0, interlaced: Boolean = false,
                            delayCs: Int = 0)

  // ---- LZW bit plumbing (GIF is LSB-first, unlike JPEG's MSB-first) ----

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      cur |= code << nbits
      nbits += width
      while (nbits >= 8) { out.write(cur & 0xff); cur >>>= 8; nbits -= 8 }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { out.write(cur & 0xff); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var cur = 0L
    private var nbits = 0
    /** Next `width`-bit code, or -1 on exhausted input (truncated
      * streams surface as decode failure, not an exception). */
    def get(width: Int): Int = {
      while (nbits < width) {
        if (pos >= data.length) return -1
        cur |= (data(pos) & 0xffL) << nbits
        pos += 1; nbits += 8
      }
      val v = (cur & ((1L << width) - 1)).toInt
      cur >>>= width; nbits -= width
      v
    }
  }

  /** GIF LZW compress: emits CLEAR, then codes at the variable width
    * the decoder expects (encoder's dictionary runs one entry ahead,
    * so the width bumps at next > 2^width), resetting with CLEAR when
    * the 4096-entry table fills. */
  private[graft] def lzwCompress(minCodeSize: Int, data: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bw = new BitWriter
    var width = minCodeSize + 1
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    bw.put(clear, width)
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
          if (next < 4096) {
            dict.put(key, next); next += 1
            if (next > (1 << width) && width < 12) width += 1
          } else { // table full: reset (decoder mirrors on CLEAR)
            bw.put(clear, width)
            dict = new java.util.HashMap[Integer, Integer]()
            next = eoi + 1
            width = minCodeSize + 1
          }
          prefix = k
        }
        i += 1
      }
      bw.put(prefix, width)
    }
    bw.put(eoi, width)
    bw.finish()
  }

  /** GIF LZW decompress to exactly `nPixels` palette indices (extra
    * codes past the pixel budget are ignored, per every renderer).
    * None on malformed input: code beyond the table, truncated stream
    * before the budget, or a first-code that isn't a literal. */
  private[graft] def lzwDecompress(minCodeSize: Int, data: Array[Byte],
                                       nPixels: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var j = 0
    while (j < clear) { prefix(j) = -1; suffix(j) = j.toByte; j += 1 }
    val out = new Array[Byte](nPixels)
    var outPos = 0
    val br = new BitReader(data)
    var width = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    val stack = new Array[Byte](4096)
    def emit(code: Int): Int = { // writes expansion, returns its FIRST byte
      var top = 0
      var c = code
      while (c >= 0) { stack(top) = suffix(c); top += 1; c = prefix(c) }
      val first = stack(top - 1) & 0xff
      while (top > 0 && outPos < nPixels) { top -= 1; out(outPos) = stack(top); outPos += 1 }
      first
    }
    while (outPos < nPixels) {
      val code = br.get(width)
      if (code < 0) return None // truncated
      if (code == clear) {
        next = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return if (outPos == nPixels) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a literal
        emit(code); prev = code
      } else if (code <= next) {
        if (code > next || (code == next && next >= 4096)) return None
        val first =
          if (code == next) { // KwKwK: entry being defined right now
            val f = emit(prev)
            if (outPos < nPixels) { out(outPos) = f.toByte; outPos += 1 }
            f
          } else emit(code)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte; next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else return None // code beyond the table: corrupt
    }
    Some(out)
  }

  // ---- interlace (4 passes: rows 0%8, 4%8, 2%4, 1%2) ----

  private val passStart = Array(0, 4, 2, 1)
  private val passStep = Array(8, 8, 4, 2)

  /** Row order the stream stores for an `h`-row interlaced image. */
  private[graft] def interlacedRows(h: Int): Array[Int] = {
    val order = new Array[Int](h)
    var o = 0
    var p = 0
    while (p < 4) {
      var y = passStart(p)
      while (y < h) { order(o) = y; o += 1; y += passStep(p) }
      p += 1
    }
    order
  }

  // ---- container encode ----

  private def bitsFor(n: Int): Int = { // GCT size field: 2^(b+1) >= n
    var b = 0
    while ((2 << b) < n) b += 1
    b
  }

  /** Encode a (possibly animated) GIF89a: global color table from
    * `palette` (0xRRGGBB entries, padded to the power-of-two table
    * size), one image descriptor per frame with a graphic-control
    * extension carrying transparency/disposal/delay. */
  def encode(w: Int, h: Int, palette: Array[Int], frames: Seq[GifFrame]): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256, "palette must be 1..256 entries")
    require(frames.nonEmpty, "at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { u8(v); u8(v >>> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    val gctBits = bitsFor(palette.length)
    u8(0x80 | (gctBits << 4) | gctBits) // GCT present, color resolution
    u8(0) // background color index
    u8(0) // aspect ratio
    val padded = 2 << gctBits
    var i = 0
    while (i < padded) {
      val rgb = if (i < palette.length) palette(i) else 0
      u8(rgb >>> 16); u8(rgb >>> 8); u8(rgb)
      i += 1
    }
    frames.foreach { f =>
      require(f.indices.length == f.fw * f.fh, "frame indices must be fw*fh")
      // graphic control extension
      u8(0x21); u8(0xf9); u8(4)
      u8(((f.disposal & 7) << 2) | (if (f.transparentIdx >= 0) 1 else 0))
      le16(f.delayCs)
      u8(math.max(f.transparentIdx, 0))
      u8(0) // terminator
      // image descriptor (GCT reused; no LCT emitted)
      u8(0x2c)
      le16(f.left); le16(f.top); le16(f.fw); le16(f.fh)
      u8(if (f.interlaced) 0x40 else 0x00)
      val rows =
        if (f.interlaced) interlacedRows(f.fh)
        else Array.tabulate(f.fh)(identity)
      val seq = new Array[Byte](f.indices.length)
      var o = 0
      rows.foreach { y =>
        System.arraycopy(f.indices, y * f.fw, seq, o, f.fw)
        o += f.fw
      }
      val minCode = math.max(2, gctBits + 1)
      u8(minCode)
      val lzw = lzwCompress(minCode, seq)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        u8(n); out.write(lzw, off, n)
        off += n
      }
      u8(0) // data sub-block terminator
    }
    u8(0x3b) // trailer
    out.toByteArray
  }

  // ---- container decode ----

  /** Decode every frame: Some((w, h, full-canvas ARGB per frame)) or
    * None on any malformation (bad signature, truncated tables,
    * missing color table, LZW corruption, unterminated stream). */
  def decode(p: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] = try {
    if (p.length < 14) return None
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    val w = le16(6)
    val h = le16(8)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    val packed = u8(10)
    var pos = 13
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (pos + 3 * n > p.length) return None
        val t = Array.tabulate(n)(j =>
          (u8(pos + 3 * j) << 16) | (u8(pos + 3 * j + 1) << 8) | u8(pos + 3 * j + 2))
        pos += 3 * n
        t
      } else null
    val canvas = new Array[Int](w * h) // starts transparent (packed 0)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    var transparentIdx = -1
    var disposal = 0
    while (true) {
      if (pos >= p.length) return None // ran off the end before trailer
      u8(pos) match {
        case 0x3b =>
          return if (frames.nonEmpty) Some((w, h, frames.toArray)) else None
        case 0x21 => // extension: parse GCE, skip everything generically
          if (pos + 2 > p.length) return None
          val label = u8(pos + 1)
          var q = pos + 2
          if (label == 0xf9 && q < p.length && u8(q) == 4 && q + 5 <= p.length) {
            val pk = u8(q + 1)
            disposal = (pk >>> 2) & 7
            transparentIdx = if ((pk & 1) != 0) u8(q + 4) else -1
          }
          var len = if (q < p.length) u8(q) else return None
          while (len != 0) {
            q += 1 + len
            if (q >= p.length) return None
            len = u8(q)
          }
          pos = q + 1
        case 0x2c => // image descriptor
          if (pos + 10 > p.length) return None
          val left = le16(pos + 1); val top = le16(pos + 3)
          val fw = le16(pos + 5); val fh = le16(pos + 7)
          val pk = u8(pos + 9)
          pos += 10
          if (fw <= 0 || fh <= 0) return None
          val lct: Array[Int] =
            if ((pk & 0x80) != 0) {
              val n = 2 << (pk & 7)
              if (pos + 3 * n > p.length) return None
              val t = Array.tabulate(n)(j =>
                (u8(pos + 3 * j) << 16) | (u8(pos + 3 * j + 1) << 8) | u8(pos + 3 * j + 2))
              pos += 3 * n
              t
            } else gct
          if (lct == null) return None // no color table anywhere
          if (pos >= p.length) return None
          val minCode = u8(pos); pos += 1
          val data = new java.io.ByteArrayOutputStream()
          var len = if (pos < p.length) u8(pos) else return None
          while (len != 0) {
            if (pos + 1 + len > p.length) return None
            data.write(p, pos + 1, len)
            pos += 1 + len
            len = if (pos < p.length) u8(pos) else return None
          }
          pos += 1 // the 0 terminator
          val seq = lzwDecompress(minCode, data.toByteArray, fw * fh).getOrElse(return None)
          val rows =
            if ((pk & 0x40) != 0) interlacedRows(fh)
            else Array.tabulate(fh)(identity)
          val before = if (disposal == 3) canvas.clone() else null
          var r = 0
          while (r < fh) {
            val y = top + rows(r)
            var x = 0
            while (x < fw) {
              val idx = seq(r * fw + x) & 0xff
              if (idx != transparentIdx && y >= 0 && y < h) {
                val cx = left + x
                if (cx >= 0 && cx < w) {
                  if (idx >= lct.length) return None // index beyond table: corrupt
                  canvas(y * w + cx) = 0xff000000 | lct(idx)
                }
              }
              x += 1
            }
            r += 1
          }
          frames += canvas.clone()
          disposal match {
            case 2 => // restore to background: frame rect → transparent
              var y = math.max(top, 0)
              val yEnd = math.min(top + fh, h)
              while (y < yEnd) {
                var x = math.max(left, 0)
                val xEnd = math.min(left + fw, w)
                while (x < xEnd) { canvas(y * w + x) = 0; x += 1 }
                y += 1
              }
            case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
            case _ => () // none / keep
          }
          transparentIdx = -1 // GCE scopes to one image
          disposal = 0
        case _ => return None // unknown block: corrupt
      }
    }
    None // unreachable
  } catch { case _: Exception => None }
}
