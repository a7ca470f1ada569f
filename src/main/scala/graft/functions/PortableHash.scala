package graft.functions

import java.security.MessageDigest

/** The one implementation of the cross-engine hash contract the oracle
  * gate depends on: the first `nibbles` hex characters of md5 as an
  * unsigned long, exactly equal to SQL's
  * `CAST('0x' || substr(md5(s), 1, nibbles) AS BIGINT)`.
  * [[HllSketch]] (15 nibbles → 60-bit) and [[CmsSketch]] (8 nibbles →
  * 32-bit) both route through here so the SQL-equivalence invariant
  * lives in one place.
  */
object PortableHash {
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** md5 digest bytes of a string's UTF-8 form (thread-local digest —
    * no per-call provider lookup). */
  def md5Bytes(s: String): Array[Byte] = mdLocal.get().digest(s.getBytes("UTF-8"))

  /** First `nibbles` (≤ 15) md5 hex chars of `s` as an unsigned long. */
  def md5Prefix(s: String, nibbles: Int): Long = {
    require(nibbles >= 1 && nibbles <= 15, "nibbles must be in [1, 15]")
    val digest = md5Bytes(s)
    val nBytes = (nibbles + 1) / 2
    var h = 0L
    var i = 0
    while (i < nBytes) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    if (nibbles % 2 == 1) h >>> 4 else h
  }
}
