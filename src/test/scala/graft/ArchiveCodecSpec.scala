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
}
