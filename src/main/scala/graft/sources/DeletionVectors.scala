package graft.sources

import java.util.Base64

/** MERGE-ON-READ DELETION VECTORS for [[SnapshotTable]] — the position-
  * delete sidecar every modern table format grew once copy-on-write
  * write amplification became the dominant cost of trickle deletes
  * (Delta's deletion vectors, Iceberg v2 position deletes, Hudi's
  * merge-on-read log): instead of rewriting a whole immutable data
  * file to remove a few rows, the commit records the DELETED ROW
  * POSITIONS of that file and the read path subtracts them.
  *
  * Representation: one manifest line per DV'd file,
  *
  *   #dv=<urlenc relative path>:<n>:<base64 delta-varint positions>
  *
  * Positions are the parquet ROW INDEXES within the file (the same
  * domain as Spark's `_metadata.row_index` and Iceberg's `pos` column),
  * sorted ascending, delta-encoded, varint-packed, base64'd — a dense
  * run of k deletions costs ~1 byte per position. The line rides
  * INSIDE the manifest like `#zm=`/`#bfl=` stats, so a DV commit is
  * the same single atomic publish as every other commit: no separate
  * sidecar file to tear, and time travel / RESTORE get DV history for
  * free because each manifest pins its own DV state.
  *
  * Scale contract: inline lines bound the DV size per file (the
  * [[SnapshotTable.deleteWhere]] `dvMaxRowsPerFile` cap — beyond it
  * the file rewrites copy-on-write, Delta's own fallback heuristic).
  * At 100 TB with larger caps the encoded bitmap would move to a
  * sidecar FILE and the `#dv=` line would carry its path — the line
  * format (path:count:payload) was shaped so that swap changes only
  * encode/decode here, not the protocol.
  *
  * Read-time application is a BROADCAST ANTI-JOIN of (file, position)
  * against the scan — see [[SnapshotTable.readAt]]: clean files keep
  * the full DSv2 zone-map scan path; only DV'd files take the
  * metadata-column read + anti-join, and compaction/OPTIMIZE
  * materializes DVs away, restoring the fast path.
  */
object DeletionVectors {

  val Prefix = "#dv="

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Encode sorted-distinct `positions` of `relPath` as a manifest
    * line. Positions are normalized (sorted, deduped) here so decode
    * can rely on ascending order. */
  def encodeLine(relPath: String, positions: Array[Long]): String = {
    val ps = positions.distinct.sorted
    require(ps.nonEmpty && ps.head >= 0, s"deletion vector for $relPath needs non-negative positions")
    val bytes = new java.io.ByteArrayOutputStream(ps.length + 8)
    var prev = -1L
    ps.foreach { p =>
      var d = p - prev // >= 1: strictly ascending after distinct+sort
      prev = p
      while (d >= 0x80L) { bytes.write(((d & 0x7f) | 0x80).toInt); d >>>= 7 }
      bytes.write(d.toInt)
    }
    Prefix + enc(relPath) + ":" + ps.length + ":" +
      Base64.getEncoder.encodeToString(bytes.toByteArray)
  }

  /** Decode a `#dv=` line → (relPath, ascending positions); None on
    * malformed input — but unlike zone maps a DV is a CORRECTNESS
    * artifact, so [[SnapshotTable]] treats a decode failure on a line
    * it knows exists as an error, not a skip. */
  def decodeLine(line: String): Option[(String, Array[Long])] =
    scala.util.Try {
      val body = line.stripPrefix(Prefix)
      val Array(rel, nStr, b64) = body.split(':')
      val n = nStr.toInt
      val bytes = Base64.getDecoder.decode(b64)
      val out = new Array[Long](n)
      var i = 0; var off = 0; var prev = -1L
      while (i < n) {
        var shift = 0; var d = 0L; var b = 0
        do {
          b = bytes(off) & 0xff; off += 1
          d |= (b & 0x7fL) << shift; shift += 7
        } while ((b & 0x80) != 0)
        prev += d
        out(i) = prev
        i += 1
      }
      require(off == bytes.length, "trailing bytes in deletion vector")
      (dec(rel), out)
    }.toOption

  /** Union two position sets of the same file (a second DELETE landing
    * on an already-DV'd file). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).distinct.sorted
}
