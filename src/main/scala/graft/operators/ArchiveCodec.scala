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

  // ---- gzip members (RFC 1952) ----
  // Common Crawl's .warc.gz is PER-RECORD gzip members concatenated —
  // a reader seeks to a member boundary and inflates one record
  // without touching the rest. Encoder writes the minimal spec header
  // (no name/extra/comment, MTIME 0 for determinism, OS 255);
  // the decoder accepts the full optional-field set (FEXTRA / FNAME /
  // FCOMMENT / FHCRC) so foreign members (GZIPOutputStream, real
  // crawls) walk correctly.

  /** Wrap `data` as one gzip member. */
  def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    out.write(0x1f); out.write(0x8b); out.write(8) // magic, CM=deflate
    out.write(0) // FLG: no optional fields
    (0 until 4).foreach(_ => out.write(0)) // MTIME = 0
    out.write(0) // XFL
    out.write(255) // OS = unknown
    val packed = deflateRaw(data)
    out.write(packed, 0, packed.length)
    val crc = crc32(data); val n = data.length.toLong
    Seq(crc, n).foreach { v =>
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }
    out.toByteArray
  }

  /** Inflate a stream of CONCATENATED gzip members. A member whose
    * CRC-32 or ISIZE trailer disagrees with its inflated bytes drops
    * ALONE (the boundary is still exact — inflate consumption marks
    * it); a member that fails to INFLATE loses the boundary and drops
    * the stream (None) — the zip member-granularity contract adapted
    * to a self-delimiting stream. */
  def gunzipMembers(bytes: Array[Byte]): Option[Array[Byte]] = try {
    // inflation bound: deflate compresses at most ~1032:1, so a stream
    // expanding far beyond that is a deflate bomb, not data — refuse
    // BEFORE allocation grows unbounded (zipDecode gets the same
    // protection from its declared-usize check; gzip's ISIZE trailer
    // is only readable after full inflation, hence the running cap)
    val cap = math.min(bytes.length.toLong * 1100L + (1L << 20), 1L << 30)
    var total = 0L
    val out = new java.io.ByteArrayOutputStream(bytes.length * 3)
    var at = 0
    while (at < bytes.length) {
      if (at + 10 > bytes.length ||
        (bytes(at) & 0xff) != 0x1f || (bytes(at + 1) & 0xff) != 0x8b ||
        bytes(at + 2) != 8) return None
      val flg = bytes(at + 3) & 0xff
      var h = at + 10
      if ((flg & 4) != 0) { // FEXTRA: u16 length + payload
        if (h + 2 > bytes.length) return None
        val xlen = (bytes(h) & 0xff) | ((bytes(h + 1) & 0xff) << 8)
        h += 2 + xlen
      }
      if ((flg & 8) != 0) { while (h < bytes.length && bytes(h) != 0) h += 1; h += 1 } // FNAME
      if ((flg & 16) != 0) { while (h < bytes.length && bytes(h) != 0) h += 1; h += 1 } // FCOMMENT
      if ((flg & 2) != 0) h += 2 // FHCRC
      if (h >= bytes.length) return None
      val inf = new java.util.zip.Inflater(true)
      val member = new java.io.ByteArrayOutputStream()
      val consumed = try {
        inf.setInput(bytes, h, bytes.length - h)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val k = inf.inflate(buf)
          if (k > 0) {
            total += k
            if (total > cap) return None // deflate bomb: refuse, never OOM
            member.write(buf, 0, k)
          }
          else if (inf.needsInput()) return None // truncated deflate
        }
        (bytes.length - h) - inf.getRemaining
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inf.end()
      val trailerAt = h + consumed
      if (trailerAt + 8 > bytes.length) return None
      def u32le(i: Int): Long = (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      val data = member.toByteArray
      val crcOk = u32le(trailerAt) == crc32(data)
      val sizeOk = u32le(trailerAt + 4) == (data.length & 0xffffffffL)
      if (crcOk && sizeOk) out.write(data, 0, data.length)
      at = trailerAt + 8
    }
    Some(out.toByteArray)
  } catch { case _: Exception => None }

  // ---- ZIP ----

  /** One member to pack: `deflate` = method 8, else STORED. */
  final case class ZipMember(name: String, data: Array[Byte], deflate: Boolean = true)

  /** Minimal spec-true ZIP writer: local headers + central directory +
    * end record. No zip64, no encryption — the baseline every reader
    * accepts. */
  def zipEncode(members: Seq[ZipMember]): Array[Byte] = {
    require(members.size <= 0xfffe,
      s"zipEncode writes the non-zip64 baseline: ${members.size} members " +
        "exceed the 16-bit entry count — split the archive")
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
    def u64(i: Int): Long = u32(i) | (u32(i + 4) << 32)
    // EOCD: scan backwards (comment can displace it up to 64 KiB)
    var eocd = -1
    var i = p.length - 22
    val floor = math.max(0, p.length - 22 - 65535)
    while (eocd < 0 && i >= floor) {
      if (u32(i) == 0x06054b50L) eocd = i
      i -= 1
    }
    if (eocd < 0) return None
    // ZIP64: a locator 20 bytes before the EOCD points at the zip64
    // EOCD record, whose 64-bit count/offset OVERRIDE the (possibly
    // 0xFFFF / 0xFFFFFFFF sentinel-capped) EOCD fields. Sentinels
    // WITHOUT a locator mean a foreign writer we can't follow: refuse
    // rather than walk a wrong offset.
    val (n: Long, cdOff: Int) = {
      val locAt = eocd - 20
      if (locAt >= 0 && u32(locAt) == 0x07064b50L) {
        val z64 = u64(locAt + 8)
        if (z64 < 0 || z64 + 56 > p.length || u32(z64.toInt) != 0x06064b50L)
          return None
        // single-disk only (a spanning archive can't live in one value)
        if (u32(z64.toInt + 16) != 0L || u32(z64.toInt + 20) != 0L) return None
        (u64(z64.toInt + 32), u64(z64.toInt + 48).toInt)
      } else {
        val en = u16(eocd + 10)
        val eo = u32(eocd + 16)
        if (en == 0xffff || eo == 0xffffffffL) return None // sentinel, no locator
        (en.toLong, eo.toInt)
      }
    }
    if (cdOff < 0 || cdOff > p.length) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte], Boolean)]
    var at = cdOff
    var k = 0L
    while (k < n) {
      if (at + 46 > p.length || u32(at) != 0x02014b50L) return None
      val method = u16(at + 10)
      val crc = u32(at + 16)
      val nameLen = u16(at + 28)
      val extraLen = u16(at + 30)
      val commentLen = u16(at + 32)
      if (at + 46 + nameLen + extraLen > p.length) return None
      val name = new String(p, at + 46, nameLen, "UTF-8")
      // zip64 extended information (extra id 0x0001): 64-bit values for
      // exactly the fields the 32-bit entry capped at their sentinels,
      // in spec order usize, csize, local-header offset, disk-start
      var csize = u32(at + 20)
      var usize = u32(at + 24)
      var lho = u32(at + 42)
      if (csize == 0xffffffffL || usize == 0xffffffffL || lho == 0xffffffffL) {
        var xa = at + 46 + nameLen
        val xEnd = xa + extraLen
        var found = false
        while (xa + 4 <= xEnd && !found) {
          val id = u16(xa); val len = u16(xa + 2)
          if (id == 0x0001) {
            var f = xa + 4
            if (usize == 0xffffffffL) { usize = u64(f); f += 8 }
            if (csize == 0xffffffffL) { csize = u64(f); f += 8 }
            if (lho == 0xffffffffL) { lho = u64(f); f += 8 }
            if (f > xa + 4 + len) return None // extra block shorter than its fields
            found = true
          } else xa += 4 + len
        }
        if (!found) return None // sentinel with no zip64 extra: refuse
      }
      if (lho < 0 || lho + 30 > p.length) return None
      // local header: skip its own (possibly different-length) name/extra
      val lhoI = lho.toInt
      if (u32(lhoI) != 0x04034b50L) return None
      val lNameLen = u16(lhoI + 26)
      val lExtraLen = u16(lhoI + 28)
      val dataAt = lhoI + 30 + lNameLen + lExtraLen
      if (csize < 0 || usize < 0 || usize > Int.MaxValue ||
        dataAt + csize > p.length) return None
      val packed = java.util.Arrays.copyOfRange(p, dataAt, dataAt + csize.toInt)
      val data = method match {
        case 0 => if (packed.length.toLong == usize) Some(packed) else None
        case 8 => inflateRaw(packed, usize.toInt)
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

  /** Serialize records as `.warc.gz` — ONE gzip member PER RECORD,
    * concatenated: the Common Crawl wire format (a reader can inflate
    * any single record from a member offset). */
  def warcEncodeGz(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val m = gzipMember(warcEncode(Seq(r)))
      out.write(m, 0, m.length)
    }
    out.toByteArray
  }

  /** Decode a WARC stream in either wire form: gzip-member streams
    * (magic 1f 8b) inflate member-by-member first, bare streams parse
    * directly — the dispatch an acquisition job needs when a corpus
    * mixes `.warc` and `.warc.gz` drops. */
  def warcDecodeAuto(bytes: Array[Byte]): Option[Seq[WarcRecord]] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
      gunzipMembers(bytes).flatMap(warcDecode)
    else warcDecode(bytes)

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
