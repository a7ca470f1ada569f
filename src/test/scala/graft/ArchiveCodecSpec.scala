package graft

import graft.operators.ArchiveCodec
import graft.operators.ArchiveCodec.{WarcRecord, ZipMember}
import org.scalatest.funsuite.AnyFunSuite

/** Archive-ingestion correctness. ZIP is cross-checked BOTH directions
  * against the JDK's INDEPENDENT java.util.zip stream classes (this
  * codec shares only the raw DEFLATE primitive with them, never the
  * container logic); WARC is pinned by length-exact parsing tests
  * including adversarial bodies that embed record separators. */
class ArchiveCodecSpec extends AnyFunSuite {

  private def members(seed: Int): Seq[ZipMember] =
    (0 until 4).map(j => ZipMember(
      s"dir/file_${seed}_$j.txt",
      (s"content $seed $j " * (j + 1)).getBytes("UTF-8"),
      deflate = j % 2 == 0))

  test("zip roundtrip: stored + deflate members, names, bytes, method flags") {
    val ms = members(1)
    val Some(out) = ArchiveCodec.zipDecode(ArchiveCodec.zipEncode(ms))
    assert(out.length == 4)
    out.zip(ms).foreach { case ((name, data, deflated), m) =>
      assert(name == m.name && deflated == m.deflate)
      assert(java.util.Arrays.equals(data, m.data), name)
    }
  }

  test("JDK ZipInputStream reads this writer's archives") {
    val ms = members(2)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(ArchiveCodec.zipEncode(ms)))
    var got = List.empty[(String, Array[Byte])]
    var e = zin.getNextEntry
    while (e != null) {
      got = got :+ (e.getName -> zin.readAllBytes())
      e = zin.getNextEntry
    }
    assert(got.map(_._1) == ms.map(_.name).toList)
    got.zip(ms).foreach { case ((_, data), m) =>
      assert(java.util.Arrays.equals(data, m.data), m.name)
    }
  }

  test("this reader walks JDK ZipOutputStream archives (incl. STORED entries)") {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    val deflated = "jdk deflated payload ".getBytes("UTF-8")
    zout.putNextEntry(new java.util.zip.ZipEntry("a.txt"))
    zout.write(deflated); zout.closeEntry()
    val stored = "jdk stored".getBytes("UTF-8")
    val se = new java.util.zip.ZipEntry("b.txt")
    se.setMethod(java.util.zip.ZipOutputStream.STORED)
    se.setSize(stored.length)
    se.setCompressedSize(stored.length)
    val c = new java.util.zip.CRC32(); c.update(stored)
    se.setCrc(c.getValue)
    zout.putNextEntry(se); zout.write(stored); zout.closeEntry()
    zout.close()
    val Some(out) = ArchiveCodec.zipDecode(bos.toByteArray)
    assert(out.map(_._1) == Seq("a.txt", "b.txt"))
    assert(java.util.Arrays.equals(out(0)._2, deflated))
    assert(java.util.Arrays.equals(out(1)._2, stored) && !out(1)._3)
  }

  test("a CRC-corrupt member drops ALONE; structural damage drops the archive") {
    val ms = Seq(
      ZipMember("keep0.txt", "aaaa".getBytes, deflate = false),
      ZipMember("bad.txt", "bbbbbbbb".getBytes, deflate = false),
      ZipMember("keep1.txt", "cccc".getBytes, deflate = false))
    val zip = ArchiveCodec.zipEncode(ms)
    // stomp one byte of bad.txt's STORED data (its local data follows
    // the 30-byte header + name); find it by scanning for the content
    val idx = zip.indexOfSlice("bbbbbbbb".getBytes)
    val corrupt = zip.clone(); corrupt(idx) = 'X'.toByte
    val Some(out) = ArchiveCodec.zipDecode(corrupt)
    assert(out.map(_._1) == Seq("keep0.txt", "keep1.txt"), "bad member must drop alone")
    // no EOCD → archive-level None
    assert(ArchiveCodec.zipDecode(zip.takeWhile(_ != 0x50)).isEmpty)
    assert(ArchiveCodec.zipDecode(Array.emptyByteArray).isEmpty)
  }

  test("warc roundtrip: record types, URIs, statuses, bodies") {
    val recs = Seq(
      WarcRecord("warcinfo", "", -1, "crawler=graft"),
      WarcRecord("response", "https://a.example/x", 200, "<html>hello</html>"),
      WarcRecord("response", "https://a.example/y", 404, ""),
      WarcRecord("request", "https://a.example/x", -1, "GET /x HTTP/1.1"))
    val Some(out) = ArchiveCodec.warcDecode(ArchiveCodec.warcEncode(recs))
    assert(out == recs)
  }

  test("length-exact parsing survives bodies that embed record separators") {
    val evil = "line1\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a record"
    val recs = Seq(
      WarcRecord("response", "https://t/e", 301, evil),
      WarcRecord("warcinfo", "", -1, "tail"))
    val Some(out) = ArchiveCodec.warcDecode(ArchiveCodec.warcEncode(recs))
    assert(out.length == 2, "embedded separators must not split the record")
    assert(out.head.body == evil && out(1).body == "tail")
  }

  test("non-ASCII bodies: Content-Length is BYTES, record boundaries stay synced") {
    // 'café' is 4 chars / 5 UTF-8 bytes; a char-space walk would read
    // one char past the body and lose the next record's version line
    val recs = Seq(
      WarcRecord("response", "https://t/u", 200, "café ←☃ done"),
      WarcRecord("response", "https://t/v", 404, "päge"),
      WarcRecord("warcinfo", "", -1, "ascii tail"))
    val Some(out) = ArchiveCodec.warcDecode(ArchiveCodec.warcEncode(recs))
    assert(out == recs, s"got $out")
  }

  test("malformed HTTP envelope inside a response yields status -1, raw payload kept") {
    val raw = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 7\r\n\r\nnothttp\r\n\r\n"
    val Some(out) = ArchiveCodec.warcDecode(raw.getBytes("UTF-8"))
    assert(out.head.httpStatus == -1 && out.head.body == "nothttp")
    // structural damage: missing version line / bad length → None
    assert(ArchiveCodec.warcDecode("JUNK/1.0\r\n\r\n".getBytes).isEmpty)
    assert(ArchiveCodec.warcDecode(
      "WARC/1.0\r\nContent-Length: 99\r\n\r\nshort".getBytes).isEmpty)
  }

  // ---- round 12: gzip members (.warc.gz) + ZIP64 ----

  test("warc.gz roundtrip: per-record gzip members, auto-dispatch on magic") {
    val recs = Seq(
      ArchiveCodec.WarcRecord("warcinfo", "", -1, "crawl 1"),
      ArchiveCodec.WarcRecord("response", "https://ex.com/a", 200, "hello \u00e9t\u00e9"),
      ArchiveCodec.WarcRecord("response", "https://ex.com/b", 404, "nope"))
    val gz = ArchiveCodec.warcEncodeGz(recs)
    assert((gz(0) & 0xff) === 0x1f && (gz(1) & 0xff) === 0x8b)
    val Some(back) = ArchiveCodec.warcDecodeAuto(gz)
    assert(back === recs)
    // bare form still dispatches
    assert(ArchiveCodec.warcDecodeAuto(ArchiveCodec.warcEncode(recs))
      === Some(recs))
  }

  test("JDK GZIPInputStream reads this writer's member stream end-to-end") {
    val recs = Seq(
      ArchiveCodec.WarcRecord("response", "https://x/1", 200, "alpha"),
      ArchiveCodec.WarcRecord("response", "https://x/2", 301, "beta"))
    val gz = ArchiveCodec.warcEncodeGz(recs)
    // GZIPInputStream natively concatenates sequential members
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz))
    val all = in.readAllBytes()
    assert(ArchiveCodec.warcDecode(all) === Some(recs))
  }

  test("this reader walks JDK GZIPOutputStream members (incl. FNAME/FEXTRA foreign headers)") {
    val r1 = ArchiveCodec.warcEncode(Seq(
      ArchiveCodec.WarcRecord("response", "https://y/1", 200, "one")))
    val r2 = ArchiveCodec.warcEncode(Seq(
      ArchiveCodec.WarcRecord("metadata", "", -1, "two")))
    def jdkGz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val concat = jdkGz(r1) ++ jdkGz(r2)
    val Some(recs) = ArchiveCodec.warcDecodeAuto(concat)
    assert(recs.map(_.body) === Seq("one", "two"))
    // hand-build a member with FNAME + FEXTRA + FHCRC-free options set
    val payload = ArchiveCodec.warcEncode(Seq(
      ArchiveCodec.WarcRecord("response", "https://y/3", 404, "three")))
    val member = ArchiveCodec.gzipMember(payload)
    val deflated = java.util.Arrays.copyOfRange(member, 10, member.length)
    val named = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (4 | 8).toByte,
      0, 0, 0, 0, 0, 255.toByte) ++
      Array[Byte](3, 0, 1, 2, 3) ++ // FEXTRA len=3 + payload
      "f.warc\u0000".getBytes("ISO-8859-1") ++ // FNAME, NUL-terminated
      deflated
    val Some(viaOpts) = ArchiveCodec.warcDecodeAuto(named)
    assert(viaOpts.map(_.body) === Seq("three"))
  }

  test("gz member with a corrupt CRC drops alone; truncated deflate drops the stream") {
    val a = ArchiveCodec.gzipMember(ArchiveCodec.warcEncode(Seq(
      ArchiveCodec.WarcRecord("response", "https://z/1", 200, "keep1"))))
    val b = ArchiveCodec.gzipMember(ArchiveCodec.warcEncode(Seq(
      ArchiveCodec.WarcRecord("response", "https://z/2", 200, "drop"))))
    val c = ArchiveCodec.gzipMember(ArchiveCodec.warcEncode(Seq(
      ArchiveCodec.WarcRecord("response", "https://z/3", 200, "keep2"))))
    val bBad = b.clone()
    bBad(b.length - 8) = (bBad(b.length - 8) ^ 0xff).toByte // flip CRC byte
    val Some(recs) = ArchiveCodec.warcDecodeAuto(a ++ bBad ++ c)
    assert(recs.map(_.body) === Seq("keep1", "keep2"))
    // truncated final member: boundary lost -> whole stream refuses
    val cut = (a ++ b).dropRight(12)
    assert(ArchiveCodec.warcDecodeAuto(cut).isEmpty)
  }

  test("ZIP64: JDK-written archive with > 65535 entries decodes exactly (no sentinel misparse)") {
    val n = 70000
    val bo = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bo)
    (0 until n).foreach { i =>
      zo.putNextEntry(new java.util.zip.ZipEntry(s"e$i"))
      zo.write(s"v$i".getBytes("UTF-8"))
      zo.closeEntry()
    }
    zo.close()
    val Some(members) = ArchiveCodec.zipDecode(bo.toByteArray)
    assert(members.size === n)
    assert(members.head._1 === "e0" &&
      new String(members.head._2, "UTF-8") === "v0")
    assert(members.last._1 === s"e${n - 1}" &&
      new String(members.last._2, "UTF-8") === s"v${n - 1}")
  }

  test("ZIP sentinel fields without a zip64 locator refuse instead of misparsing") {
    // hand-corrupt a small archive's EOCD entry count to the sentinel
    val z = ArchiveCodec.zipEncode(Seq(
      ArchiveCodec.ZipMember("a.txt", "alpha".getBytes("UTF-8"))))
    // EOCD is the last 22 bytes (no comment): counts at +8/+10
    val bad = z.clone()
    val eocd = z.length - 22
    bad(eocd + 10) = 0xff.toByte; bad(eocd + 11) = 0xff.toByte
    assert(ArchiveCodec.zipDecode(bad).isEmpty)
    // and the baseline writer refuses entry counts it cannot represent
    intercept[IllegalArgumentException] {
      ArchiveCodec.zipEncode(
        (0 to 0xffff).map(i => ArchiveCodec.ZipMember(s"$i", Array[Byte]())))
    }
  }
}
