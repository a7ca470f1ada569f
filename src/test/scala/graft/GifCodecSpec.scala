package graft

import graft.operators.{GifCodec, Multimodal}
import graft.operators.GifCodec.GifFrame
import org.scalatest.funsuite.AnyFunSuite

/** GIF codec correctness. Lossless format, so every comparison is
  * BIT-exact. Cross-checked BOTH directions against the JDK's
  * INDEPENDENT ImageIO GIF implementation: ImageIO reads this
  * encoder's output (LZW widths, sub-block framing, GCT, GCE
  * transparency, interlace must all be spec-true or the JDK reader
  * rejects/garbles), and this decoder reads ImageIO-written GIFs
  * (foreign LZW stream + whatever extensions the JDK emits).
  * Self-roundtrips additionally cover what ImageIO's writer won't
  * produce: multi-frame animation with sub-rectangle placement and
  * all four disposal methods, and dictionary-reset streams (>4096
  * LZW entries). */
class GifCodecSpec extends AnyFunSuite {

  private def det(seed: Long): Long => Int = { // tiny deterministic LCG
    var s = seed
    _ => { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 33) & 0x7fffffff).toInt }
  }

  private def palette(n: Int, seed: Int): Array[Int] =
    Array.tabulate(n)(j => (((seed * 31 + j * 97) & 0xff) << 16) |
      (((seed * 17 + j * 59) & 0xff) << 8) | ((seed * 13 + j * 41) & 0xff))

  test("LZW roundtrip: random index streams at every min code size, incl. dictionary reset") {
    val rnd = det(42L)
    for (minCode <- 2 to 8; n <- Seq(1, 7, 255, 4096, 20000)) {
      val maxSym = 1 << minCode
      val data = Array.tabulate(n) { i =>
        // runs + noise: exercises both dictionary hits and misses
        (if (rnd(0) % 3 == 0) rnd(0) % maxSym else (i / 5) % maxSym).toByte
      }
      val packed = GifCodec.lzwCompress(minCode, data)
      val back = GifCodec.lzwDecompress(minCode, packed, n)
      assert(back.isDefined, s"minCode=$minCode n=$n failed to decode")
      assert(java.util.Arrays.equals(back.get, data), s"minCode=$minCode n=$n mismatch")
    }
  }

  test("single-frame roundtrip: sequential and interlaced, exact pixels") {
    for (seed <- 1 to 8; interlaced <- Seq(false, true)) {
      val rnd = det(seed.toLong)
      val w = 3 + rnd(0) % 30
      val h = 2 + rnd(0) % 25
      val p = 2 + rnd(0) % 255
      val pal = palette(p, seed)
      val idx = Array.tabulate(w * h)(_ => (rnd(0) % p).toByte)
      val gif = GifCodec.encode(w, h, pal, Seq(GifFrame(0, 0, w, h, idx, interlaced = interlaced)))
      val Some((dw, dh, frames)) = GifCodec.decode(gif)
      assert((dw, dh, frames.length) == (w, h, 1))
      (0 until w * h).foreach { i =>
        assert(frames(0)(i) == (0xff000000 | pal(idx(i) & 0xff)), s"pixel $i seed=$seed interlaced=$interlaced")
      }
    }
  }

  test("animation: sub-rect frames, all four disposal methods, transparency compositing") {
    val pal = palette(8, 3)
    val bg = Array.fill(6 * 5)(1.toByte)
    // frame 2 draws a 2x2 patch at (1,1) with index 3, disposal restore-previous
    val patch = Array.fill(2 * 2)(3.toByte)
    // frame 3: transparent index 5 must NOT overdraw
    val mix = Array[Byte](5, 2, 5, 2)
    val gif = GifCodec.encode(6, 5, pal, Seq(
      GifFrame(0, 0, 6, 5, bg, disposal = 1), // keep
      GifFrame(1, 1, 2, 2, patch, disposal = 3), // restore-previous
      GifFrame(2, 2, 2, 2, mix, transparentIdx = 5, disposal = 2), // restore-bg
      GifFrame(0, 0, 6, 5, bg, disposal = 0)))
    val Some((_, _, frames)) = GifCodec.decode(gif)
    assert(frames.length == 4)
    val c1 = 0xff000000 | pal(1)
    assert(frames(0).forall(_ == c1))
    // frame 2 view: patch over background
    assert(frames(1)(1 * 6 + 1) == (0xff000000 | pal(3)))
    assert(frames(1)(0) == c1)
    // frame 3 starts from RESTORED-previous canvas (all background):
    // transparent cells keep background, opaque cells take index 2
    assert(frames(2)(2 * 6 + 2) == c1) // transparent → background shows
    assert(frames(2)(2 * 6 + 3) == (0xff000000 | pal(2)))
    // frame 4 draws after disposal-2 cleared the 2x2 rect — full redraw covers it
    assert(frames(3).forall(_ == c1))
  }

  test("disposal 2 clears only the frame rect to transparent") {
    val pal = palette(4, 9)
    val full = Array.fill(4 * 4)(2.toByte)
    val patch = Array.fill(2 * 2)(1.toByte)
    val tiny = Array.fill(1 * 1)(3.toByte)
    val gif = GifCodec.encode(4, 4, pal, Seq(
      GifFrame(0, 0, 4, 4, full, disposal = 1),
      GifFrame(1, 1, 2, 2, patch, disposal = 2),
      GifFrame(0, 0, 1, 1, tiny, disposal = 0)))
    val Some((_, _, frames)) = GifCodec.decode(gif)
    // frame 3's canvas: rect (1,1)-(2,2) transparent (packed 0), rest kept
    assert(frames(2)(1 * 4 + 1) == 0 && frames(2)(2 * 4 + 2) == 0)
    assert(frames(2)(3 * 4 + 3) == (0xff000000 | pal(2)))
    assert(frames(2)(0) == (0xff000000 | pal(3)))
  }

  test("ImageIO reads this encoder's output bit-exactly (sequential + interlaced + transparent)") {
    for (seed <- 1 to 6) {
      val rnd = det(seed * 100L)
      val w = 5 + rnd(0) % 20
      val h = 4 + rnd(0) % 15
      val p = 4 + rnd(0) % 60
      val pal = palette(p, seed)
      val tIdx = if (seed % 2 == 0) 1 else -1
      val idx = Array.tabulate(w * h)(_ => (rnd(0) % p).toByte)
      val gif = GifCodec.encode(w, h, pal,
        Seq(GifFrame(0, 0, w, h, idx, transparentIdx = tIdx, interlaced = seed % 3 == 0)))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val expected =
          if ((idx(y * w + x) & 0xff) == tIdx) 0x00000000
          else 0xff000000 | pal(idx(y * w + x) & 0xff)
        val got = img.getRGB(x, y)
        if ((expected >>> 24) == 0) assert((got >>> 24) == 0, s"alpha at ($x,$y) seed=$seed")
        else assert(got == expected, s"pixel ($x,$y) seed=$seed: got=${got.toHexString} want=${expected.toHexString}")
      }}
    }
  }

  test("this decoder reads ImageIO-written GIFs bit-exactly (foreign LZW stream)") {
    for (seed <- 1 to 6) {
      val rnd = det(seed * 999L)
      val w = 6 + rnd(0) % 40
      val h = 5 + rnd(0) % 30
      val pal = palette(16, seed)
      val cm = new java.awt.image.IndexColorModel(4, 16,
        pal.map(c => ((c >> 16) & 0xff).toByte),
        pal.map(c => ((c >> 8) & 0xff).toByte),
        pal.map(c => (c & 0xff).toByte))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val idx = Array.tabulate(w * h)(_ => rnd(0) % 16)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.getRaster.setSample(x, y, 0, idx(y * w + x))))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", bos))
      val Some((dw, dh, frames)) = GifCodec.decode(bos.toByteArray)
      assert((dw, dh, frames.length) == (w, h, 1))
      (0 until w * h).foreach { i =>
        assert(frames(0)(i) == (0xff000000 | pal(idx(i))), s"pixel $i seed=$seed")
      }
    }
  }

  test("synthetic corpus payloads decode to the closed-form pattern (the q_gif_decode kernel)") {
    for (id <- 0L to 40L) {
      val w = 6 + (id % 11).toInt; val h = 4 + (id % 7).toInt
      val p = 8 + (id % 9).toInt; val nf = 1 + (id % 3).toInt
      val t = if (id % 2 == 1) (id % p).toInt else -1
      val Some((dw, dh, frames)) = GifCodec.decode(Multimodal.syntheticGifImage(id))
      assert((dw, dh, frames.length) == (w, h, nf), s"id=$id dims")
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
        val j = ((id + 3 * x + 5 * y + 7 * f) % p).toInt
        val want =
          if (j == t) 0
          else 0xff000000 | ((((5 * id + 3 * j) % 256).toInt) << 16) |
            ((((7 * id + 5 * j) % 256).toInt) << 8) | (((11 * id + 7 * j) % 256).toInt)
        assert(frames(f)(y * w + x) == want, s"id=$id f=$f ($x,$y)")
      }
    }
  }

  test("corrupt-is-data: malformed payloads yield None, never throw") {
    val good = Multimodal.syntheticGifImage(5L)
    assert(GifCodec.decode(Array.emptyByteArray).isEmpty)
    assert(GifCodec.decode("NOTAGIF89a".getBytes).isEmpty)
    assert(GifCodec.decode(good.take(20).toArray).isEmpty) // truncated mid-table
    assert(GifCodec.decode(good.dropRight(1).toArray).isEmpty) // missing trailer
    val noTable = good.clone(); noTable(10) = (noTable(10) & 0x7f).toByte // GCT flag off
    assert(GifCodec.decode(noTable).isEmpty) // no color table anywhere
    val badBlock = good.clone(); badBlock(13 + 3 * 16) = 0x7e // neither ext/img/trailer
    // (byte position is inside the block stream only when the GCT is 16 entries;
    //  id=5 → p=13, padded table 16 → offset holds the first block introducer)
    assert(GifCodec.decode(badBlock).isEmpty)
  }

  test("LZW dictionary reset survives a container roundtrip (large noisy frame)") {
    val rnd = det(7L)
    val w = 120; val h = 90
    val pal = palette(256, 11)
    val idx = Array.tabulate(w * h)(_ => (rnd(0) % 256).toByte)
    val gif = GifCodec.encode(w, h, pal, Seq(GifFrame(0, 0, w, h, idx)))
    val Some((_, _, frames)) = GifCodec.decode(gif)
    (0 until w * h).foreach(i => assert(frames(0)(i) == (0xff000000 | pal(idx(i) & 0xff))))
    // and ImageIO agrees on the same stream
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    (0 until h).foreach(y => (0 until w).foreach(x =>
      assert(img.getRGB(x, y) == (0xff000000 | pal(idx(y * w + x) & 0xff)))))
  }
}
