package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.PixelCodec
import org.scalatest.funsuite.AnyFunSuite

/** Deep-format PNG coverage (16-bit, gray+alpha, packed sub-byte) —
  * lossless, so every comparison is bit-exact. Cross-checked both
  * directions against the JDK's INDEPENDENT ImageIO PNG codec:
  * ImageIO reads this encoder's 16-bit / sub-byte / gray-alpha
  * streams sample-exactly, and this decoder reads ImageIO-written
  * TYPE_USHORT_GRAY (16-bit) and TYPE_BYTE_BINARY (1/2/4-bit packed)
  * files. */
class PngDepthSpec extends AnyFunSuite {

  test("synthetic deep corpus decodes to the closed-form pattern (the q_png_depth kernel)") {
    for (id <- 0L to 47L) {
      val w = 5 + (id % 12).toInt; val h = 4 + (id % 8).toInt
      val Some((dw, dh, argb)) =
        PixelCodec.decodePngArgb(Multimodal.syntheticDeepPngImage(id))
      assert((dw, dh) == (w, h), s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val m = Array(2, 4, 16)((id % 3).toInt)
        val (a, r, g, b) = (id % 4).toInt match {
          case 0 =>
            val v = ((3 * id + 5 * x + 7 * y) % 256).toInt; (255, v, v, v)
          case 1 => (255,
            ((5 * id + 3 * x + 7 * y) % 256).toInt,
            ((7 * id + 5 * x + 11 * y) % 256).toInt,
            ((11 * id + 7 * x + 13 * y) % 256).toInt)
          case 2 =>
            val v = ((3 * id + 5 * x + 7 * y) % 256).toInt
            (((5 * id + 3 * x + 11 * y) % 256).toInt, v, v, v)
          case _ =>
            val v = ((id + x + y) % m).toInt * 255 / (m - 1); (255, v, v, v)
        }
        val want = (a << 24) | (r << 16) | (g << 8) | b
        assert(argb(y * w + x) == want,
          s"id=$id ($x,$y): got=${argb(y * w + x).toHexString} want=${want.toHexString}")
      }
    }
  }

  test("ImageIO reads this 16-bit gray encoder sample-exactly (full 16-bit raster)") {
    def s16(x: Int, y: Int): Int = (x * 947 + y * 1973 + 311) % 65536
    val (w, h) = (19, 13)
    val png = PixelCodec.encodePngDeep(w, h, 16, 0, (x, y, _) => s16(x, y))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      assert(img.getRaster.getSample(x, y, 0) == s16(x, y), s"($x,$y)")))
  }

  test("this decoder reads ImageIO-written 16-bit gray PNGs (high-byte reduction)") {
    def s16(x: Int, y: Int): Int = (x * 1237 + y * 733 + 99) % 65536
    val (w, h) = (17, 11)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.getRaster.setSample(x, y, 0, s16(x, y))))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val Some((dw, dh, argb)) = PixelCodec.decodePngArgb(bos.toByteArray)
    assert((dw, dh) == (w, h))
    (0 until h).foreach(y => (0 until w).foreach(x => {
      val hi = s16(x, y) >>> 8
      assert(argb(y * w + x) == (0xff000000 | (hi << 16) | (hi << 8) | hi), s"($x,$y)")
    }))
  }

  test("16-bit truecolor roundtrips through ImageIO's reader channel-exactly") {
    def ch(x: Int, y: Int, c: Int): Int = (x * 401 + y * 877 + c * 5081 + 17) % 65536
    val (w, h) = (9, 7)
    val png = PixelCodec.encodePngDeep(w, h, 16, 2, ch)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    (0 until h).foreach(y => (0 until w).foreach(x =>
      (0 until 3).foreach(c =>
        assert(img.getRaster.getSample(x, y, c) == ch(x, y, c), s"($x,$y,$c)"))))
  }

  test("gray+alpha (type 4): ImageIO agrees on gray and alpha") {
    def gv(x: Int, y: Int): Int = (x * 31 + y * 57) % 256
    def av(x: Int, y: Int): Int = (x * 11 + y * 83 + 5) % 256
    val (w, h) = (14, 9)
    val png = PixelCodec.encodePngDeep(w, h, 8, 4,
      (x, y, c) => if (c == 0) gv(x, y) else av(x, y))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    // raw raster samples, not getRGB: ImageIO color-manages gray→sRGB
    // (gamma), which would distort the comparison without testing the
    // codec — band 0 is gray, band 1 alpha
    (0 until h).foreach(y => (0 until w).foreach(x => {
      assert(img.getRaster.getSample(x, y, 0) == gv(x, y), s"gray ($x,$y)")
      assert(img.getRaster.getSample(x, y, 1) == av(x, y), s"alpha ($x,$y)")
    }))
    val Some((_, _, argb)) = PixelCodec.decodePngArgb(png)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      assert(argb(y * w + x) ==
        ((av(x, y) << 24) | (gv(x, y) << 16) | (gv(x, y) << 8) | gv(x, y)))))
  }

  test("packed sub-byte gray: both directions vs ImageIO at depths 1, 2, 4") {
    for (d <- Seq(1, 2, 4)) {
      val m = (1 << d) - 1
      def v(x: Int, y: Int): Int = (x * 3 + y * 5 + 1) % (m + 1)
      val (w, h) = (21, 10) // width NOT a multiple of 8/d: exercises row-tail bits
      // mine → ImageIO
      val png = PixelCodec.encodePngDeep(w, h, d, 0, (x, y, _) => v(x, y))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      (0 until h).foreach(y => (0 until w).foreach(x =>
        assert(img.getRaster.getSample(x, y, 0) == v(x, y), s"d=$d ($x,$y)")))
      // ImageIO → mine: gray IndexColorModel so indices ARE gray levels
      val ramp = Array.tabulate(m + 1)(i => (i * 255 / m).toByte)
      val cm = new java.awt.image.IndexColorModel(d, m + 1, ramp, ramp, ramp)
      val bin = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_BINARY, cm)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        bin.getRaster.setSample(x, y, 0, v(x, y))))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bin, "png", bos))
      val decoded = PixelCodec.decodePngArgb(bos.toByteArray)
      assert(decoded.isDefined, s"d=$d: ImageIO sub-byte stream refused")
      val Some((_, _, argb)) = decoded
      (0 until h).foreach(y => (0 until w).foreach(x => {
        val gl = v(x, y) * 255 / m
        assert(argb(y * w + x) == (0xff000000 | (gl << 16) | (gl << 8) | gl),
          s"d=$d ($x,$y)")
      }))
    }
  }
}
