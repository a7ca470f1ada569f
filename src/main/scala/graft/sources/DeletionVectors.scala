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
  *   #dv=<urlenc relative path>:<n>:<payload>
  *
  * where `<payload>` is either the positions INLINE (base64 of the
  * delta-varint encoding below) or, past [[InlineMaxPayloadBytes]],
  * `@<urlenc sidecar rel path>` — a pointer to a binary sidecar FILE
  * holding the same bytes, written from the EXECUTOR that aggregated
  * that file's positions (Delta's own split: tiny vectors inline in
  * the log, big ones in `deletion_vector_*` files). Either way the
  * manifest line is O(1)–O(KB), the commit stays one atomic publish,
  * and time travel / RESTORE get DV history for free because each
  * manifest pins its own DV state. Sidecar files live under `data/`
  * like any batch — invisible until the manifest referencing them
  * publishes, reaped by vacuum when no retained manifest points at
  * them.
  *
  * Positions are the parquet ROW INDEXES within the file (the same
  * domain as Spark's `_metadata.row_index` and Iceberg's `pos` column),
  * sorted ascending, delta-encoded, varint-packed — a dense run of k
  * deletions costs ~1 byte per position.
  *
  * Scale contract: positions are grouped, unioned with the prior
  * vector, encoded, and (when big) written per-file ON THE EXECUTORS
  * ([[SnapshotTable]]'s `dvMaterialize`); the driver handles only
  * O(DV'd files) fixed-size descriptors — no path materializes
  * O(deleted positions) rows on the driver, however many files a
  * delete touches. Read-time application decodes the payloads back
  * into (file, position) pairs DISTRIBUTED (an RDD flatMap over the
  * descriptors) and anti-joins them against the scan — broadcast when
  * the total position count is small, an ordinary shuffled anti-join
  * beyond [[SnapshotTable.DvBroadcastMaxPositions]].
  */
object DeletionVectors {

  val Prefix = "#dv="

  /** Encoded payload size (bytes, pre-base64) above which the vector
    * moves from an inline manifest line to a per-file sidecar file.
    * ~2 KB inline keeps trickle-delete manifests byte-cheap while a
    * retention sweep's dense vectors go to sidecars. */
  val InlineMaxPayloadBytes: Int = 2048

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** One file's deletion vector as the MANIFEST carries it: the
    * position count plus the raw payload token (inline base64, or
    * `@<urlenc sidecar rel>`). Descriptor-sized on purpose — decoding
    * to positions is explicit ([[positions]]) so driver-side planning
    * never pays it by accident. Equality is descriptor equality, which
    * is exact for lines carried forward verbatim (the only way a
    * vector survives a commit unchanged). */
  final case class Dv(count: Long, payload: String) {
    def isSidecar: Boolean = payload.startsWith("@")
    /** Sidecar rel path under the table root, when the payload is a
      * pointer. */
    def sidecarRel: Option[String] =
      if (isSidecar) Some(dec(payload.substring(1))) else None
    /** Decode to ascending positions. `root` resolves a sidecar
      * pointer through `store` (the table's commit-plane client —
      * sidecars are MANIFEST-plane artifacts, so their reads must ride
      * the same [[LogStore]] their writes did); inline payloads ignore
      * both. Runs wherever the caller is — executor tasks capture the
      * serializable store in their closure. */
    def positions(root: String, store: LogStore = LogStore.posix): Array[Long] =
      decodeBytes(payloadBytes(root, store), count.toInt)
    private def payloadBytes(root: String, store: LogStore): Array[Byte] =
      sidecarRel match {
        case Some(rel) =>
          store.readBytes(java.nio.file.Paths.get(root).resolve(rel))
        case None => Base64.getDecoder.decode(payload)
      }
  }

  /** Delta-varint encode sorted-distinct ascending positions. */
  def encodeBytes(positions: Array[Long]): Array[Byte] = {
    require(positions.nonEmpty && positions.head >= 0,
      "deletion vector needs non-negative positions")
    val bytes = new java.io.ByteArrayOutputStream(positions.length + 8)
    var prev = -1L
    positions.foreach { p =>
      var d = p - prev // >= 1: strictly ascending
      require(d >= 1, s"positions not strictly ascending at $p")
      prev = p
      while (d >= 0x80L) { bytes.write(((d & 0x7f) | 0x80).toInt); d >>>= 7 }
      bytes.write(d.toInt)
    }
    bytes.toByteArray
  }

  /** Decode `n` delta-varint positions; refuses trailing bytes — a DV
    * is a CORRECTNESS artifact, a half-read one must never pass. */
  def decodeBytes(bytes: Array[Byte], n: Int): Array[Long] = {
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
    out
  }

  /** Encode `positions` of `relPath` as an INLINE manifest line.
    * Positions are normalized (sorted, deduped) here so decode can
    * rely on ascending order. */
  def encodeLine(relPath: String, positions: Array[Long]): String = {
    val ps = positions.distinct.sorted
    require(ps.nonEmpty && ps.head >= 0,
      s"deletion vector for $relPath needs non-negative positions")
    lineOf(relPath,
      Dv(ps.length, Base64.getEncoder.encodeToString(encodeBytes(ps))))
  }

  /** Render a descriptor back to its manifest line. */
  def lineOf(relPath: String, dv: Dv): String =
    Prefix + enc(relPath) + ":" + dv.count + ":" + dv.payload

  /** Build the descriptor for already-merged ascending `positions`,
    * writing a sidecar via `writeSidecar` when the encoding exceeds
    * the inline budget — the executor-side encode primitive. */
  def descriptorOf(positions: Array[Long],
                   writeSidecar: Array[Byte] => String): Dv = {
    val bytes = encodeBytes(positions)
    if (bytes.length <= InlineMaxPayloadBytes)
      Dv(positions.length, Base64.getEncoder.encodeToString(bytes))
    else
      Dv(positions.length, "@" + enc(writeSidecar(bytes)))
  }

  /** Decode a `#dv=` line → (relPath, descriptor); None on malformed
    * input — but unlike zone maps a DV is a CORRECTNESS artifact, so
    * [[SnapshotTable]] treats a decode failure on a line it knows
    * exists as an error, not a skip. Payload bytes are NOT touched
    * here: line decode is O(1) driver planning work. */
  def decodeLine(line: String): Option[(String, Dv)] =
    scala.util.Try {
      val body = line.stripPrefix(Prefix)
      val Array(rel, nStr, payload) = body.split(':')
      val n = nStr.toLong
      require(n > 0, "empty deletion vector")
      require(payload.nonEmpty, "missing payload")
      (dec(rel), Dv(n, payload))
    }.toOption

  /** Union two position sets of the same file (a second DELETE landing
    * on an already-DV'd file). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).distinct.sorted
}
