package graft

import graft.operators.{Multimodal, TiffCodec}
import graft.operators.TiffCodec.TiffPage
import org.scalatest.funsuite.AnyFunSuite

/** Baseline TIFF codec correctness — lossless, so every comparison is
  * BIT-exact. Cross-checked BOTH directions against the JDK's
  * INDEPENDENT ImageIO TIFF plugin (standard since Java 9): ImageIO
  * reads this encoder's none/LZW/PackBits multi-strip streams, and
  * this decoder reads ImageIO-written TIFFs — including its LZW
  * streams with horizontal-differencing predictor 2, which is the
  * stress test for the early-change width arithmetic. */
class TiffCodecSpec extends AnyFunSuite {

  private def det(seed: Long): Long => Int = {
    var s = seed
    n => {
      s = s * 6364136223846793005L + 1442695040888963407L
      val v = ((s >>> 33) & 0x7fffffff).toInt
      if (n > 0) v % n.toInt else v
    }
  }

  test("TIFF-LZW roundtrip: random and runny streams, incl. table reset") {
    val rnd = det(7L)
    for (n <- Seq(0, 1, 9, 255, 511, 4093, 30000)) {
      val data = Array.tabulate(n)(i =>
        (if (rnd(0) % 4 == 0) rnd(0) % 256 else (i / 7) % 256).toByte)
      val packed = TiffCodec.lzwCompress(data)
      val back = TiffCodec.lzwDecompress(packed, n)
      assert(back.isDefined, s"n=$n failed")
      assert(java.util.Arrays.equals(back.get, data), s"n=$n mismatch")
    }
  }

  test("PackBits roundtrip: runs, literals, alternations, long runs") {
    val cases = Seq(
      Array.emptyByteArray,
      Array.fill(300)(7.toByte), // >128 run splits
      Array.tabulate(257)(_.toByte), // pure literal >128
      Array[Byte](1, 1, 2, 3, 3, 3, 4, 5, 5, 5, 5, 6),
      Array.tabulate(1000)(i => ((i * i) % 5).toByte))
    cases.foreach { data =>
      val packed = TiffCodec.packBits(data)
      val back = TiffCodec.unpackBits(packed, data.length)
      assert(back.isDefined && java.util.Arrays.equals(back.get, data),
        s"len=${data.length}")
    }
  }

  test("container roundtrip: gray + RGB, all three compressions, multi-strip, both byte orders") {
    val rnd = det(99L)
    for (comp <- Seq(1, 5, 32773); spp <- Seq(1, 3); be <- Seq(false, true)) {
      val w = 5 + rnd(20); val h = 4 + rnd(15)
      val px = Array.tabulate(w * h * spp)(_ => (rnd(0) % 256).toByte)
      val tiff = TiffCodec.encode(
        Seq(TiffPage(w, h, spp, px, comp, rowsPerStrip = 3)), bigEndian = be)
      val Some(pages) = TiffCodec.decode(tiff)
      assert(pages.length == 1)
      val (dw, dh, ch, bytes) = pages.head
      assert((dw, dh, ch) == (w, h, spp), s"comp=$comp spp=$spp be=$be dims")
      assert(java.util.Arrays.equals(bytes, px), s"comp=$comp spp=$spp be=$be pixels")
    }
  }

  test("multi-page: chained IFDs decode independently in order") {
    val p1 = TiffPage(4, 3, 1, Array.tabulate(12)(_.toByte), 5)
    val p2 = TiffPage(6, 2, 3, Array.tabulate(36)(i => (i * 3).toByte), 32773)
    val p3 = TiffPage(2, 2, 1, Array[Byte](9, 8, 7, 6), 1)
    val Some(pages) = TiffCodec.decode(TiffCodec.encode(Seq(p1, p2, p3)))
    assert(pages.length == 3)
    assert(pages(0)._1 == 4 && pages(1)._3 == 3 && pages(2)._4.toSeq == Seq[Byte](9, 8, 7, 6))
  }

  test("ImageIO reads this encoder's output bit-exactly (every compression, gray + RGB)") {
    val rnd = det(5L)
    for (comp <- Seq(1, 5, 32773); spp <- Seq(1, 3)) {
      val w = 9 + rnd(12); val h = 6 + rnd(9)
      val px = Array.tabulate(w * h * spp)(_ => (rnd(0) % 256).toByte)
      val tiff = TiffCodec.encode(Seq(TiffPage(w, h, spp, px, comp, rowsPerStrip = 4)))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tiff))
      assert(img != null, s"ImageIO refused comp=$comp spp=$spp")
      assert(img.getWidth == w && img.getHeight == h)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        (0 until spp).foreach(c =>
          assert(img.getRaster.getSample(x, y, c) == (px((y * w + x) * spp + c) & 0xff),
            s"comp=$comp spp=$spp ($x,$y,$c)"))))
    }
  }

  test("this decoder reads ImageIO-written TIFFs (LZW with predictor, PackBits, none)") {
    val rnd = det(17L)
    for (ctype <- Seq(null, "LZW", "PackBits"); gray <- Seq(true, false)) {
      val w = 10 + rnd(20); val h = 8 + rnd(12)
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val spp = if (gray) 1 else 3
      val px = Array.tabulate(w * h * spp)(_ => (rnd(0) % 256).toByte)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        (0 until spp).foreach(c =>
          img.getRaster.setSample(x, y, c, px((y * w + x) * spp + c) & 0xff))))
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      if (ctype != null) {
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(ctype)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val decoded = TiffCodec.decode(bos.toByteArray)
      assert(decoded.isDefined, s"refused ImageIO stream ctype=$ctype gray=$gray")
      val (dw, dh, ch, bytes) = decoded.get.head
      assert((dw, dh, ch) == (w, h, spp), s"ctype=$ctype gray=$gray dims ($dw,$dh,$ch)")
      assert(java.util.Arrays.equals(bytes, px), s"ctype=$ctype gray=$gray pixels")
    }
  }

  test("synthetic corpus payloads decode to the closed-form pattern (the q_tiff_decode kernel)") {
    for (id <- 0L to 40L) {
      val w = 7 + (id % 10).toInt; val h = 5 + (id % 6).toInt
      val np = 1 + (id % 2).toInt
      val Some(pages) = TiffCodec.decode(Multimodal.syntheticTiffImage(id))
      assert(pages.length == np, s"id=$id pages")
      for (g <- 0 until np) {
        val (dw, dh, ch, bytes) = pages(g)
        val gray = (id + g) % 2 == 0
        assert((dw, dh, ch) == (w, h, if (gray) 1 else 3), s"id=$id g=$g")
        for (y <- 0 until h; x <- 0 until w) {
          if (gray)
            assert((bytes(y * w + x) & 0xff) ==
              ((3 * id + 5 * x + 7 * y + 11 * g) % 256).toInt, s"id=$id g=$g ($x,$y)")
          else {
            val at = (y * w + x) * 3
            assert((bytes(at) & 0xff) == ((5 * id + 3 * x + 7 * y + g) % 256).toInt)
            assert((bytes(at + 1) & 0xff) == ((7 * id + 5 * x + 11 * y + 3 * g) % 256).toInt)
            assert((bytes(at + 2) & 0xff) == ((11 * id + 7 * x + 13 * y + 5 * g) % 256).toInt)
          }
        }
      }
    }
  }

  test("corrupt-is-data: malformed payloads yield None, never throw") {
    val good = Multimodal.syntheticTiffImage(3L)
    assert(TiffCodec.decode(Array.emptyByteArray).isEmpty)
    assert(TiffCodec.decode("JUNKJUNKJUNK".getBytes).isEmpty)
    assert(TiffCodec.decode(good.take(6)).isEmpty)
    val badMagic = good.clone(); badMagic(2) = 41
    assert(TiffCodec.decode(badMagic).isEmpty)
    // truncated mid-strip: flip the first IFD offset past the end
    val badIfd = good.clone()
    badIfd(4) = 0xff.toByte; badIfd(5) = 0xff.toByte
    badIfd(6) = 0xff.toByte; badIfd(7) = 0x7f.toByte
    assert(TiffCodec.decode(badIfd).isEmpty)
  }
}
