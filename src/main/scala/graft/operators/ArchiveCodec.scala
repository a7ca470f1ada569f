package graft.operators

/** Archive-ingestion codecs — the container formats a pretraining
  * acquisition pipeline actually unpacks at scale: ZIP (bulk dataset
  * drops, code corpora) and WARC (web crawls — Common Crawl's format).
  * Byte-level, both directions, pure JVM (DEFLATE via java.util.zip's
  * raw Deflater/Inflater, the same public primitive the PNG codec
  * uses).
  *
  * ZIP surface: local file headers walked via the CENTRAL DIRECTORY
  * (the spec's source of truth — self-describing streams can lie in
  * their local headers), end-of-central-directory locator scanned
  * backwards past an optional comment, STORED (0) and DEFLATE (8)
  * methods, CRC-32 of every extracted member VERIFIED against the
  * directory entry (a mismatch drops the member — corrupt-is-data at
  * member granularity).
  *
  * WARC surface (ISO 28500): version line, named headers, exact
  * Content-Length payload read, CRLF CRLF record separation;
  * `response` records additionally split the embedded HTTP envelope
  * (status line + headers) from the body. Parsing is strict on
  * structure, tolerant on unknown headers.
  *
  * Scale shape: archives are values in a binary column; decode runs
  * per-row in mapPartitions after a compute repartition. Members/
  * records explode to one row each — the fan-out an ingestion job
  * wants, bounded by archive content, never by corpus size.
  *
  * Reference scope: the reference scrapes live pages (out of scope per
  * FIXTURES.md); archive unpacking is §2.12 extension surface.
  */
object ArchiveCodec {

  // ---- DEFLATE plumbing (raw streams, no gzip/zlib wrapper) ----

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private def inflateRaw(data: Array[Byte], n: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(data)
      val out = new Array[Byte](n)
      var o = 0
      while (o < n && !inf.finished()) {
        val k = inf.inflate(out, o, n - o)
        if (k == 0 && inf.needsInput()) return None
        o += k
      }
      if (o == n) Some(out) else None
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  private def crc32(data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(data)
    c.getValue
  }

  // ---- ZIP ----

  /** One member to pack: `deflate` = method 8, else STORED. */
  final case class ZipMember(name: String, data: Array[Byte], deflate: Boolean = true)

  /** Minimal spec-true ZIP writer: local headers + central directory +
    * end record. No zip64, no encryption — the baseline every reader
    * accepts. */
  def zipEncode(members: Seq[ZipMember]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write(v.toInt & 0xff); out.write((v >>> 8).toInt & 0xff)
      out.write((v >>> 16).toInt & 0xff); out.write((v >>> 24).toInt & 0xff)
    }
    val central = new java.io.ByteArrayOutputStream()
    def c16(v: Int): Unit = { central.write(v & 0xff); central.write((v >>> 8) & 0xff) }
    def c32(v: Long): Unit = {
      central.write(v.toInt & 0xff); central.write((v >>> 8).toInt & 0xff)
      central.write((v >>> 16).toInt & 0xff); central.write((v >>> 24).toInt & 0xff)
    }
    members.foreach { m =>
      val nameB = m.name.getBytes("UTF-8")
      val packed = if (m.deflate) deflateRaw(m.data) else m.data
      val method = if (m.deflate) 8 else 0
      val crc = crc32(m.data)
      val off = out.size().toLong
      u32(0x04034b50L); u16(20); u16(0); u16(method)
      u16(0); u16(0) // dos time/date (fixed zero — determinism)
      u32(crc); u32(packed.length.toLong); u32(m.data.length.toLong)
      u16(nameB.length); u16(0)
      out.write(nameB, 0, nameB.length)
      out.write(packed, 0, packed.length)
      c32(0x02014b50L); c16(20); c16(20); c16(0); c16(method)
      c16(0); c16(0)
      c32(crc); c32(packed.length.toLong); c32(m.data.length.toLong)
      c16(nameB.length); c16(0); c16(0)
      c16(0); c16(0) // disk, internal attrs
      c32(0L) // external attrs
      c32(off)
      central.write(nameB, 0, nameB.length)
    }
    val cdOff = out.size().toLong
    val cd = central.toByteArray
    out.write(cd, 0, cd.length)
    u32(0x06054b50L); u16(0); u16(0)
    u16(members.size); u16(members.size)
    u32(cd.length.toLong); u32(cdOff)
    u16(0) // no comment
    out.toByteArray
  }

  /** Walk the central directory (located via the backward EOCD scan),
    * extract and CRC-verify every member. A member that fails to
    * inflate or mismatches its directory CRC/size drops ALONE;
    * structural damage (no EOCD, truncated directory) drops the
    * archive. Returns (name, bytes, wasDeflated). */
  def zipDecode(p: Array[Byte]): Option[Seq[(String, Array[Byte], Boolean)]] = try {
    def u16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    // EOCD: scan backwards (comment can displace it up to 64 KiB)
    var eocd = -1
    var i = p.length - 22
    val floor = math.max(0, p.length - 22 - 65535)
    while (eocd < 0 && i >= floor) {
      if (u32(i) == 0x06054b50L) eocd = i
      i -= 1
    }
    if (eocd < 0) return None
    val n = u16(eocd + 10)
    val cdOff = u32(eocd + 16).toInt
    if (cdOff < 0 || cdOff > p.length) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte], Boolean)]
    var at = cdOff
    var k = 0
    while (k < n) {
      if (at + 46 > p.length || u32(at) != 0x02014b50L) return None
      val method = u16(at + 10)
      val crc = u32(at + 16)
      val csize = u32(at + 20).toInt
      val usize = u32(at + 24).toInt
      val nameLen = u16(at + 28)
      val extraLen = u16(at + 30)
      val commentLen = u16(at + 32)
      val lho = u32(at + 42).toInt
      if (at + 46 + nameLen > p.length) return None
      val name = new String(p, at + 46, nameLen, "UTF-8")
      // local header: skip its own (possibly different-length) name/extra
      if (lho + 30 > p.length || u32(lho) != 0x04034b50L) return None
      val lNameLen = u16(lho + 26)
      val lExtraLen = u16(lho + 28)
      val dataAt = lho + 30 + lNameLen + lExtraLen
      if (csize < 0 || usize < 0 || dataAt + csize > p.length) return None
      val packed = java.util.Arrays.copyOfRange(p, dataAt, dataAt + csize)
      val data = method match {
        case 0 => if (packed.length == usize) Some(packed) else None
        case 8 => inflateRaw(packed, usize)
        case _ => None // unsupported method: drop the member
      }
      data.filter(d => crc32(d) == crc)
        .foreach(d => out += ((name, d, method == 8)))
      at += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    Some(out.toSeq)
  } catch { case _: Exception => None }

  // ---- WARC ----

  /** One parsed WARC record: type, target URI (empty when absent),
    * the embedded HTTP status (−1 for non-response records), and the
    * payload body (for responses: past the HTTP envelope). */
  final case class WarcRecord(recordType: String, targetUri: String,
                              httpStatus: Int, body: String)

  /** Serialize records as spec-shaped WARC/1.0 (version line, headers,
    * Content-Length-exact payload, CRLF CRLF separators). `response`
    * records wrap the body in an HTTP/1.1 envelope. */
  def warcEncode(records: Seq[WarcRecord]): Array[Byte] = {
    val sb = new StringBuilder
    records.foreach { r =>
      val payload = r.recordType match {
        case "response" =>
          s"HTTP/1.1 ${r.httpStatus} OK\r\nContent-Type: text/html\r\n\r\n${r.body}"
        case _ => r.body
      }
      val pBytes = payload.getBytes("UTF-8")
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: ${r.recordType}\r\n")
      if (r.targetUri.nonEmpty) sb.append(s"WARC-Target-URI: ${r.targetUri}\r\n")
      sb.append(s"Content-Length: ${pBytes.length}\r\n")
      sb.append("\r\n")
      sb.append(payload)
      sb.append("\r\n\r\n")
    }
    sb.toString.getBytes("UTF-8")
  }

  /** Parse a WARC stream into records. Strict structure (version line,
    * Content-Length-exact reads, CRLF CRLF separation), tolerant
    * content (unknown headers pass through; a malformed HTTP envelope
    * inside a response yields status −1 with the raw payload as body).
    * None only on structural damage.
    *
    * All offsets are BYTE offsets — Content-Length counts bytes, so
    * the walk must stay in byte space (a char-space walk desyncs on
    * the first non-ASCII body); header regions are ASCII by spec and
    * payload bytes decode to UTF-8 only after the length-exact cut. */
  def warcDecode(bytes: Array[Byte]): Option[Seq[WarcRecord]] = try {
    def startsWith(at: Int, lit: String): Boolean =
      at + lit.length <= bytes.length &&
        (0 until lit.length).forall(k => bytes(at + k) == lit.charAt(k).toByte)
    def indexOfCrlfCrlf(from: Int): Int = {
      var i = from
      while (i + 3 < bytes.length) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var at = 0
    while (at < bytes.length) {
      // skip inter-record blank space
      while (at < bytes.length && (bytes(at) == '\r' || bytes(at) == '\n')) at += 1
      if (at >= bytes.length) return Some(out.toSeq)
      if (!startsWith(at, "WARC/")) return None
      val headEnd = indexOfCrlfCrlf(at)
      if (headEnd < 0) return None
      val headerLines = new String(bytes, at, headEnd - at, "UTF-8").split("\r\n").toSeq
      if (!headerLines.head.startsWith("WARC/1.")) return None
      val headers = headerLines.tail.flatMap { l =>
        val c = l.indexOf(':')
        if (c <= 0) None else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
      }.toMap
      val len = headers.get("content-length").flatMap(v =>
        scala.util.Try(v.toInt).toOption).getOrElse(return None)
      val bodyStart = headEnd + 4
      if (len < 0 || bodyStart + len > bytes.length) return None
      val payload = new String(bytes, bodyStart, len, "UTF-8")
      val rType = headers.getOrElse("warc-type", "unknown")
      val uri = headers.getOrElse("warc-target-uri", "")
      val (status, body) =
        if (rType == "response" && payload.startsWith("HTTP/")) {
          val envEnd = payload.indexOf("\r\n\r\n")
          if (envEnd < 0) (-1, payload)
          else {
            val statusLine = payload.substring(0, payload.indexOf("\r\n"))
            val st = statusLine.split(' ')
            val code = if (st.length >= 2) scala.util.Try(st(1).toInt).getOrElse(-1) else -1
            (code, payload.substring(envEnd + 4))
          }
        } else (-1, payload)
      out += WarcRecord(rType, uri, status, body)
      at = bodyStart + len
    }
    Some(out.toSeq)
  } catch { case _: Exception => None }
}
