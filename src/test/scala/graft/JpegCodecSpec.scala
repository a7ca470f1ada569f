package graft

import graft.operators.{JpegCodec, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec correctness. The decoder is cross-checked
  * against the JDK's INDEPENDENT ImageIO JPEG implementation (present
  * in every JDK, no external codec): ImageIO-encoded files carry JFIF
  * APP0 preambles and the Annex K standard tables, so decoding them
  * proves the segment walk, canonical Huffman construction, and
  * entropy decode against a stream this codebase did not produce.
  * IDCT implementations legitimately differ by ±1–2 luma steps
  * (libjpeg fixed-point vs float), hence the tolerance on lossy
  * comparisons; the block-constant fixture path must be BIT-exact.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def imageIoDecode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    val out = Array.tabulate(w * h)(i => img.getRaster.getSample(i % w, i / w, 0))
    (w, h, out)
  }

  private def imageIoEncode(w: Int, h: Int, lum: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.getRaster.setSample(x, y, 0, lum(x, y) & 0xff)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  test("block-constant images round-trip bit-exactly (the oracle contract)") {
    Seq(0L, 1L, 5L, 42L, 997L).foreach { id =>
      val bytes = Multimodal.syntheticJpegImage(id)
      // a real JPEG: SOI..entropy-coded scan..EOI, not a header stub
      assert((bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xD8)
      assert((bytes(bytes.length - 2) & 0xff) == 0xFF &&
        (bytes(bytes.length - 1) & 0xff) == 0xD9)
      val Some((w, h, lum)) = JpegCodec.decode(bytes)
      assert(w == 8 * (2 + (id % 4).toInt) && h == 8 * (1 + (id % 3).toInt))
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val expect = ((7 * id + 11 * (x / 8) + 13 * (y / 8)) % 256).toInt
        assert(lum(y * w + x) == expect,
          s"id=$id ($x,$y): got ${lum(y * w + x)}, want $expect")
      })
    }
  }

  test("own encoder output with real AC content: decoder agrees with ImageIO") {
    val (w, h) = (40, 24)
    def lum(x: Int, y: Int): Int = (x * 37 + y * 91 + (x * y) % 17) % 256
    val bytes = JpegCodec.encode(w, h, lum)
    val Some((dw, dh, mine)) = JpegCodec.decode(bytes)
    val (iw, ih, theirs) = imageIoDecode(bytes)
    assert((dw, dh) == (w, h) && (iw, ih) == (w, h))
    val maxDiff = mine.zip(theirs).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 2, s"IDCT divergence $maxDiff > 2 luma steps")
  }

  test("ImageIO-encoded stream (JFIF preamble, standard tables) decodes within tolerance") {
    val (w, h) = (32, 32)
    def lum(x: Int, y: Int): Int = (x * 5 + y * 11) % 256
    val bytes = imageIoEncode(w, h, lum)
    val Some((dw, dh, mine)) = JpegCodec.decode(bytes)
    val (_, _, theirs) = imageIoDecode(bytes)
    assert((dw, dh) == (w, h))
    val maxDiff = mine.zip(theirs).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 2, s"IDCT divergence $maxDiff > 2 luma steps")
  }

  test("non-multiple-of-8 dimensions: edge blocks crop correctly") {
    val (w, h) = (21, 13)
    def lum(x: Int, y: Int): Int = (x * 7 + y * 3) % 256
    val bytes = JpegCodec.encode(w, h, lum)
    val Some((dw, dh, mine)) = JpegCodec.decode(bytes)
    assert((dw, dh) == (w, h) && mine.length == w * h)
    val (_, _, theirs) = imageIoDecode(bytes)
    val maxDiff = mine.zip(theirs).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 2)
  }

  test("corrupt and unsupported payloads are data, not crashes") {
    val good = Multimodal.syntheticJpegImage(3L)
    assert(JpegCodec.decode(good.take(good.length / 2)).isEmpty) // truncated scan
    assert(JpegCodec.decode(good.take(8)).isEmpty)               // header only
    assert(JpegCodec.decode(Array[Byte](0x12, 0x34)).isEmpty)    // not a JPEG
    val noise = Array.tabulate[Byte](256)(i => (i * 37 % 251).toByte)
    assert(JpegCodec.decode(Array[Byte](0xFF.toByte, 0xD8.toByte) ++ noise).isEmpty)
  }

  test("PixelCodec sniff routes JPEG payloads to the baseline decoder") {
    val bytes = Multimodal.syntheticJpegImage(7L)
    val Some((sw, sh, slum)) = Multimodal.PixelCodec.decode(bytes)
    val Some((jw, jh, jlum)) = JpegCodec.decode(bytes)
    assert((sw, sh) == (jw, jh) && slum.sameElements(jlum))
  }

  // ------------------------------------------------------------ color

  private def imageIoDecodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    (w, h, Array.tabulate(w * h)(i => img.getRGB(i % w, i / w) & 0xffffff))
  }

  /** (max, mean) per-channel divergence. Two tolerances because 4:2:0
    * chroma upsampling is implementation-defined: this codec uses
    * sample REPLICATION (the choice the macroblock-constant oracle
    * fixture's exactness depends on — any interpolation would blend
    * chroma across macroblock borders), libjpeg/ImageIO use triangular
    * "fancy" upsampling — so at chroma block borders a few pixels
    * legitimately differ by several steps while the mean divergence
    * stays near zero. */
  private def channelDiff(a: Array[Int], b: Array[Int]): (Int, Double) = {
    val ds = a.zip(b).flatMap { case (p, q) =>
      Seq(math.abs((p >> 16 & 0xff) - (q >> 16 & 0xff)),
        math.abs((p >> 8 & 0xff) - (q >> 8 & 0xff)),
        math.abs((p & 0xff) - (q & 0xff)))
    }
    (ds.max, ds.sum.toDouble / ds.length)
  }

  test("macroblock-constant COLOR images round-trip exactly through both subsamplings") {
    Seq(0L, 1L, 2L, 5L, 42L, 997L).foreach { id => // even = 4:2:0, odd = 4:4:4
      val bytes = Multimodal.syntheticColorJpegImage(id)
      val Some((w, h, rgb)) = JpegCodec.decodeColor(bytes)
      assert(w == 16 * (1 + (id % 3).toInt) && h == 16 * (1 + (id % 2).toInt))
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val mx = x / 16; val my = y / 16
        val (er, eg, eb) = JpegCodec.yccToRgb(
          ((7 * id + 11 * mx + 13 * my) % 256).toInt,
          ((5 * id + 17 * mx + 19 * my) % 256).toInt,
          ((3 * id + 23 * mx + 29 * my) % 256).toInt)
        val expect = (er << 16) | (eg << 8) | eb
        assert(rgb(y * w + x) == expect,
          s"id=$id ($x,$y): got ${rgb(y * w + x).toHexString}, want ${expect.toHexString}")
      })
      // the gray decode surface hands back the full-res Y plane
      val Some((_, _, lum)) = JpegCodec.decode(bytes)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        assert(lum(y * w + x) == ((7 * id + 11 * (x / 16) + 13 * (y / 16)) % 256).toInt)
      })
    }
  }

  test("own color encoder with real AC content: ImageIO agrees, both 4:4:4 and 4:2:0") {
    val (w, h) = (48, 32)
    // smooth gradients: IDCT/conversion implementations differ by a
    // couple of steps, ringing-free content keeps that bounded
    def ycc(x: Int, y: Int): (Int, Int, Int) =
      (40 + 3 * x + 2 * y, 60 + 2 * x + y, 200 - 2 * x - y)
    Seq(false, true).foreach { sub =>
      val bytes = JpegCodec.encodeColor(w, h, ycc, chroma420 = sub)
      val Some((dw, dh, mine)) = JpegCodec.decodeColor(bytes)
      val (iw, ih, theirs) = imageIoDecodeRgb(bytes)
      assert((dw, dh) == (w, h) && (iw, ih) == (w, h))
      val (dMax, dMean) = channelDiff(mine, theirs)
      val tol = if (sub) 8 else 4 // 4:2:0 border pixels: upsampler choice
      assert(dMax <= tol && dMean <= 1.5,
        s"chroma420=$sub: RGB divergence max=$dMax mean=$dMean vs ImageIO")
    }
  }

  test("4:2:2 (asymmetric 2x1 sampling): exact on macroblock-constant fixtures, ImageIO agrees on gradients") {
    // constant 16×8 cells (constant per Y block AND per x-decimated
    // chroma block) → the lossy path is exact, pinning the 16×8 MCU
    // geometry and the x-only replicate upsample
    val (w, h) = (48, 24)
    def cell(x: Int, y: Int): (Int, Int, Int) = {
      val mx = x / 16; val my = y / 8
      (((11 * mx + 13 * my + 40) % 256), ((17 * mx + 19 * my + 60) % 256),
        ((23 * mx + 29 * my + 80) % 256))
    }
    val bytes = JpegCodec.encodeColorSampled(w, h, cell, sfH = 2, sfV = 1)
    val Some((dw, dh, rgb)) = JpegCodec.decodeColor(bytes)
    assert((dw, dh) == (w, h))
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val (cy, cb, cr) = cell(x, y)
      val (er, eg, eb) = JpegCodec.yccToRgb(cy, cb, cr)
      assert(rgb(y * w + x) == ((er << 16) | (eg << 8) | eb), s"($x,$y)")
    })
    // an independent decoder reads the same 4:2:2 stream
    def ycc(x: Int, y: Int): (Int, Int, Int) =
      (40 + 3 * x + 2 * y, 60 + 2 * x + y, 200 - 2 * x - y)
    val grad = JpegCodec.encodeColorSampled(48, 32, ycc, sfH = 2, sfV = 1)
    val Some((_, _, mine)) = JpegCodec.decodeColor(grad)
    val (_, _, theirs) = imageIoDecodeRgb(grad)
    val (dMax, dMean) = channelDiff(mine, theirs)
    assert(dMax <= 8 && dMean <= 1.5, s"4:2:2 vs ImageIO max=$dMax mean=$dMean")
  }

  test("restart markers (DRI/RSTn): restart-coded streams decode pixel-identically and ImageIO agrees") {
    val (w, h) = (40, 24) // 15 blocks → 4 RSTs at interval 3
    def lum(x: Int, y: Int): Int = (x * 37 + y * 91 + (x * y) % 17) % 256
    val plain = JpegCodec.encode(w, h, lum)
    val rsted = JpegCodec.encode(w, h, lum, restartInterval = 3)
    // the stream genuinely carries DRI + RSTn
    assert(rsted.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xFF && (s(1) & 0xff) == 0xDD), "DRI present")
    assert(rsted.sliding(2).count(s => (s(0) & 0xff) == 0xFF &&
      (s(1) & 0xff) >= 0xD0 && (s(1) & 0xff) <= 0xD7) >= 4, "RSTn present")
    // DC prediction changes only the ENCODING of DC, never its value
    val Some((_, _, a)) = JpegCodec.decode(plain)
    val Some((_, _, b)) = JpegCodec.decode(rsted)
    assert(a.sameElements(b), "restart-coded decode must be pixel-identical")
    // ...and an independent decoder reads the same restart stream
    val (_, _, theirs) = imageIoDecode(rsted)
    assert(b.zip(theirs).map { case (x, y) => math.abs(x - y) }.max <= 2)
    // color MCU path: interval 2 across a 4:2:0 grid
    def ycc(x: Int, y: Int): (Int, Int, Int) =
      (40 + 3 * x + 2 * y, 60 + 2 * x + y, 200 - 2 * x - y)
    val cPlain = JpegCodec.encodeColor(48, 32, ycc, chroma420 = true)
    val cRsted = JpegCodec.encodeColor(48, 32, ycc, chroma420 = true,
      restartInterval = 2)
    val Some((_, _, ca)) = JpegCodec.decodeColor(cPlain)
    val Some((_, _, cb)) = JpegCodec.decodeColor(cRsted)
    assert(ca.sameElements(cb), "color restart decode must be pixel-identical")
    val (_, _, ioRgb) = imageIoDecodeRgb(cRsted)
    assert(channelDiff(cb, ioRgb)._1 <= 8)
  }

  private def imageIoEncodeProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    // prove the fixture really is progressive (SOF2 present)
    assert(bytes.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xFF && (s(1) & 0xff) == 0xC2), "fixture must be SOF2")
    bytes
  }

  test("PROGRESSIVE grayscale (ImageIO SOF2: spectral selection + successive approximation) decodes within tolerance") {
    val (w, h) = (37, 29) // non-multiple-of-8 exercises the true-block-grid geometry
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.getRaster.setSample(x, y, 0, (x * 6 + y * 9 + (x * y) % 13) % 256)))
    val bytes = imageIoEncodeProgressive(img)
    val Some((dw, dh, mine)) = JpegCodec.decode(bytes)
    val (_, _, theirs) = imageIoDecode(bytes)
    assert((dw, dh) == (w, h))
    val maxDiff = mine.zip(theirs).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 2, s"progressive gray divergence $maxDiff > 2 luma steps")
  }

  test("PROGRESSIVE color (ImageIO SOF2, subsampled, multi-scan AC refinement) decodes within tolerance") {
    val (w, h) = (48, 40)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      img.setRGB(x, y, ((x * 4 + 40) << 16) | ((y * 4 + 30) << 8) | (240 - 2 * x - y))
    })
    val bytes = imageIoEncodeProgressive(img)
    val Some((dw, dh, mine)) = JpegCodec.decodeColor(bytes)
    val (_, _, theirs) = imageIoDecodeRgb(bytes)
    assert((dw, dh) == (w, h))
    val (dMax, dMean) = channelDiff(mine, theirs)
    assert(dMax <= 10 && dMean <= 2.5,
      s"progressive color divergence max=$dMax mean=$dMean vs ImageIO")
  }

  test("ImageIO-encoded COLOR stream (its own subsampling choice) decodes within tolerance") {
    val (w, h) = (40, 40)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      img.setRGB(x, y, ((x * 5 + 30) << 16) | ((y * 5 + 20) << 8) | (250 - 3 * x))
    })
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val Some((dw, dh, mine)) = JpegCodec.decodeColor(bytes)
    val (_, _, theirs) = imageIoDecodeRgb(bytes)
    assert((dw, dh) == (w, h))
    // ImageIO writes 4:2:0 by default, and this fixture has a STEEP
    // chroma gradient (several steps per pixel) — replicate vs fancy
    // upsampling then differs by ~slope/2 on ordinary pixels, not just
    // at borders, so the mean bound is looser here than in the
    // own-encoder test above (whose 4:2:0 leg holds mean ≤ 1.5)
    val (dMax, dMean) = channelDiff(mine, theirs)
    assert(dMax <= 10 && dMean <= 2.5,
      s"RGB divergence max=$dMax mean=$dMean vs ImageIO's own decode")
  }
}
