package graft

import graft.operators.{JpegCodec, Multimodal}
import graft.operators.Multimodal.{AudioCodec, VideoCodec}
import org.scalatest.funsuite.AnyFunSuite

/** G.711 companding + Motion-JPEG container correctness. The G.711
  * tables are cross-checked byte-for-byte against the JDK's
  * INDEPENDENT javax.sound ULAW/ALAW converters (present in every
  * JDK): all 256 μ-law and all 256 A-law code points must expand to
  * the same linear PCM16 value the JDK's codec produces. */
class AvCodecSpec extends AnyFunSuite {

  private def jdkExpand(bytes: Array[Byte], aLaw: Boolean): Array[Int] = {
    import javax.sound.sampled._
    val enc = if (aLaw) AudioFormat.Encoding.ALAW else AudioFormat.Encoding.ULAW
    val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), src, bytes.length.toLong)
    val dst = new AudioFormat(8000f, 16, 1, true, false) // PCM16 LE
    val conv = AudioSystem.getAudioInputStream(dst, ais)
    val out = conv.readAllBytes()
    Array.tabulate(out.length / 2)(i =>
      ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort.toInt)
  }

  test("u-law: all 256 code points match the JDK converter exactly") {
    val all = Array.tabulate(256)(_.toByte)
    val jdk = jdkExpand(all, aLaw = false)
    (0 until 256).foreach { b =>
      assert(AudioCodec.ulawToPcm(b) == jdk(b),
        s"u-law byte $b: mine=${AudioCodec.ulawToPcm(b)} jdk=${jdk(b)}")
    }
  }

  test("A-law: all 256 code points match the JDK converter exactly") {
    val all = Array.tabulate(256)(_.toByte)
    val jdk = jdkExpand(all, aLaw = true)
    (0 until 256).foreach { b =>
      assert(AudioCodec.alawToPcm(b) == jdk(b),
        s"A-law byte $b: mine=${AudioCodec.alawToPcm(b)} jdk=${jdk(b)}")
    }
  }

  test("G.711 WAV container roundtrip: fmt tags 6/7, odd data lengths pad") {
    for (aLaw <- Seq(false, true); n <- Seq(47, 48)) { // odd + even
      val bytes = Array.tabulate(n)(i => ((i * 37 + 5) % 256).toByte)
      val wav = AudioCodec.encodeWavG711(8000, bytes, aLaw)
      val Some((rate, pcm)) = AudioCodec.decodeWav(wav)
      assert(rate == 8000 && pcm.length == n)
      (0 until n).foreach { i =>
        val want =
          if (aLaw) AudioCodec.alawToPcm(bytes(i) & 0xff)
          else AudioCodec.ulawToPcm(bytes(i) & 0xff)
        assert(pcm(i) == want, s"aLaw=$aLaw sample $i")
      }
    }
    // PCM16 path unchanged
    val pcmWav = AudioCodec.encodeWav(16000, Array.tabulate(10)(i => (i * 1000).toShort))
    assert(AudioCodec.decodeWav(pcmWav).exists(_._2.toSeq == (0 until 10).map(_ * 1000)))
  }

  test("synthetic G.711 corpus decodes to the closed-form table values (q_audio_g711 kernel)") {
    for (id <- 0L to 20L) {
      val n = 48 + (id % 80).toInt
      val Some((rate, pcm)) = AudioCodec.decodeWav(Multimodal.syntheticG711Wav(id))
      assert(rate == 8000 && pcm.length == n, s"id=$id")
      (0 until n).foreach { i =>
        val b = ((3 * id + 7 * i) % 256).toInt
        val want = if (id % 2 == 1) AudioCodec.alawToPcm(b) else AudioCodec.ulawToPcm(b)
        assert(pcm(i) == want, s"id=$id i=$i")
      }
    }
  }

  test("IMA ADPCM: smooth signals reconstruct within tolerance, block heads verbatim") {
    for (id <- 0L to 40L) {
      val (n, heads, tol) = Multimodal.adpcmRoundtrip(id)
      assert(n == 9 * (2 + (id % 3).toInt), s"id=$id count")
      assert(heads, s"id=$id: block header must carry its first sample verbatim")
      assert(tol, s"id=$id: reconstruction outside the 256 bound")
    }
  }

  test("IMA ADPCM: extreme swings clamp (predictor at int16 rails, index at 0/88) without error") {
    // full-scale square wave: the hardest case for an adaptive
    // quantizer — must stay defined (clamped), never exact
    val src = Array.tabulate(101)(i => (if ((i / 4) % 2 == 0) 32767 else -32768).toShort)
    val wav = AudioCodec.encodeWavAdpcm(8000, src, samplesPerBlock = 101)
    val Some((_, pcm)) = AudioCodec.decodeWav(wav)
    assert(pcm.length == 101)
    assert(pcm.forall(v => v >= -32768 && v <= 32767))
    assert(pcm(0) == 32767) // header sample verbatim even at the rail
    // and a constant-silence stream decodes to near-silence
    val flat = AudioCodec.encodeWavAdpcm(8000, Array.fill(33)(0.toShort), 33)
    val Some((_, quiet)) = AudioCodec.decodeWav(flat)
    assert(quiet.forall(v => math.abs(v) <= 8), s"silence drifted: ${quiet.max}")
  }

  test("IMA ADPCM container: per-block primed headers, corrupt step index refuses") {
    val src = Array.tabulate(27)(i => (i * 400).toShort)
    val wav = AudioCodec.encodeWavAdpcm(8000, src, samplesPerBlock = 9)
    val Some((rate, pcm)) = AudioCodec.decodeWav(wav)
    assert(rate == 8000 && pcm.length == 27)
    assert(pcm(9) == src(9) && pcm(18) == src(18)) // block heads
    // corrupt a block's step index past 88 → decode refuses
    val dataAt = wav.indexOfSlice("data".getBytes) + 8
    val bad = wav.clone(); bad(dataAt + 2) = 120.toByte
    assert(AudioCodec.decodeWav(bad).isEmpty)
  }

  test("MJPEG: block-constant frames decode pixel-exactly through the 00dc walk") {
    for (id <- 0L to 15L) {
      val nf = 2 + (id % 3).toInt
      val w = 16 * (1 + (id % 2).toInt); val h = 16
      val Some((cw, ch, total, frames)) =
        VideoCodec.decodeMjpegAvi(Multimodal.syntheticMjpegAvi(id))
      assert((cw, ch, total) == (w, h, nf), s"id=$id container")
      (0 until nf).foreach { f =>
        val Some((dw, dh, lum)) = JpegCodec.decode(frames(f))
        assert((dw, dh) == (w, h))
        for (y <- 0 until h; x <- 0 until w) {
          val want = ((7 * id + 11 * (x / 8) + 13 * (y / 8) + 17 * f) % 256).toInt
          assert(lum(y * w + x) == want, s"id=$id f=$f ($x,$y)")
        }
      }
    }
  }

  test("MJPEG corrupt-is-data at FRAME granularity: one bad frame drops alone") {
    val good = JpegCodec.encode(16, 16, (x, y) => (40 + 8 * (x / 8) + 16 * (y / 8)))
    val bad = good.clone()
    bad(bad.length / 2) = 0x00 // stomp mid-entropy-stream
    bad(bad.length / 2 + 1) = 0x00
    val avi = VideoCodec.encodeMjpegAvi(40000, 16, 16, Array(good, bad, good))
    val Some((_, _, total, frames)) = VideoCodec.decodeMjpegAvi(avi)
    assert(total == 3 && frames.length == 3)
    val decoded = frames.flatMap(JpegCodec.decode(_))
    // the container walk keeps all three; the pixel decode drops at
    // most the stomped one and never throws
    assert(decoded.length >= 2, s"decoded ${decoded.length} of 3")
    // raw-frame AVI decode still refuses 00dc-only files (and vice versa)
    assert(VideoCodec.decodeAvi(avi).isEmpty)
  }

  // ---- round 12: multi-channel (stereo) WAVE ----

  test("stereo PCM16: javax.sound reads this writer's interleave; this reader splits JDK-shaped frames") {
    import javax.sound.sampled._
    val l = Array.tabulate(25)(i => (i * 700 - 8000).toShort)
    val r = Array.tabulate(25)(i => (3000 - i * 550).toShort)
    val wav = AudioCodec.encodeWavPcm16Multi(16000, Array(l, r))
    // 1) JDK parses the container and sees interleaved L,R frames
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getChannels === 2)
    assert(ais.getFormat.getSampleRate === 16000f)
    val raw = ais.readAllBytes()
    assert(raw.length === 25 * 2 * 2)
    (0 until 25).foreach { i =>
      def s16(off: Int) = ((raw(off) & 0xff) | (raw(off + 1) << 8)).toShort
      assert(s16(4 * i) === l(i), s"left frame $i")
      assert(s16(4 * i + 2) === r(i), s"right frame $i")
    }
    // 2) our reader deinterleaves the same frames per channel
    val Some((rate, chans)) = AudioCodec.decodeWavMulti(wav)
    assert(rate === 16000 && chans.length === 2)
    assert(chans(0).toSeq === l.map(_.toInt).toSeq)
    assert(chans(1).toSeq === r.map(_.toInt).toSeq)
    // 3) the mono view refuses a stereo stream (no silent channel pick)
    assert(AudioCodec.decodeWav(wav).isEmpty)
  }

  test("stereo G.711: per-channel expansion matches the JDK's 2-channel converter") {
    import javax.sound.sampled._
    for (aLaw <- Seq(false, true)) {
      val cl = Array.tabulate(31)(i => ((i * 37 + 5) % 256).toByte)
      val cr = Array.tabulate(31)(i => ((i * 91 + 160) % 256).toByte)
      val wav = AudioCodec.encodeWavG711Multi(8000, Array(cl, cr), aLaw)
      val Some((rate, chans)) = AudioCodec.decodeWavMulti(wav)
      assert(rate === 8000 && chans.length === 2 && chans(0).length === 31)
      // JDK: decode the same interleaved companded stream as 2-channel
      val enc = if (aLaw) AudioFormat.Encoding.ALAW else AudioFormat.Encoding.ULAW
      val interleaved = (0 until 31).flatMap(i => Seq(cl(i), cr(i))).toArray
      val src = new AudioFormat(enc, 8000f, 8, 2, 2, 8000f, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(interleaved), src, 31L)
      val dst = new AudioFormat(8000f, 16, 2, true, false)
      val pcm = AudioSystem.getAudioInputStream(dst, ais).readAllBytes()
      (0 until 31).foreach { i =>
        def s16(off: Int) = ((pcm(off) & 0xff) | (pcm(off + 1) << 8)).toShort.toInt
        assert(chans(0)(i) === s16(4 * i), s"aLaw=$aLaw left $i")
        assert(chans(1)(i) === s16(4 * i + 2), s"aLaw=$aLaw right $i")
      }
    }
  }

  test("stereo IMA ADPCM: per-channel headers + interleaved nibble groups roundtrip within tolerance") {
    val n = 27 // 3 blocks of 9
    val l = Array.tabulate(n)(i => Multimodal.adpcmSourceSample(3L, i, n))
    val r = Array.tabulate(n)(i => Multimodal.adpcmSourceSample(8L, i, n))
    val wav = AudioCodec.encodeWavAdpcmMulti(8000, Array(l, r), samplesPerBlock = 9)
    val Some((rate, chans)) = AudioCodec.decodeWavMulti(wav)
    assert(rate === 8000 && chans.length === 2)
    assert(chans(0).length === n && chans(1).length === n)
    // every block header carries its first sample VERBATIM, per channel
    Seq(0, 9, 18).foreach { h =>
      assert(chans(0)(h) === l(h).toInt, s"left block head at $h")
      assert(chans(1)(h) === r(h).toInt, s"right block head at $h")
    }
    // adaptive tracking of the smooth source stays within the mono bound
    (0 until n).foreach { i =>
      assert(math.abs(chans(0)(i) - l(i)) <= 256, s"left $i drifted")
      assert(math.abs(chans(1)(i) - r(i)) <= 256, s"right $i drifted")
    }
    // stereo encode refuses a block size that tears nibble groups
    intercept[IllegalArgumentException] {
      AudioCodec.encodeWavAdpcmMulti(8000, Array(l, r), samplesPerBlock = 11)
    }
  }

  test("syntheticMultiWav corpus: mono/stereo mix decodes with exact channel counts") {
    (0L until 12L).foreach { id =>
      val Some((_, chans)) = AudioCodec.decodeWavMulti(Multimodal.syntheticMultiWav(id))
      assert(chans.length === 1 + (id % 2).toInt, s"id=$id channels")
      assert(chans(0).length === 40 + (id % 50).toInt, s"id=$id samples")
    }
  }
}
