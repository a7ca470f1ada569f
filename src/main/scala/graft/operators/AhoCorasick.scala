package graft.operators

/** Aho–Corasick multi-pattern string matching — the blocklist-scrub
  * primitive a pretraining hygiene pass needs at corpus scale.
  *
  * Why not `contains`/`rlike` per term: a K-term blocklist scanned
  * naively costs O(K · chars) (K regex passes over every document) and
  * a single alternation regex backtracks or rescans per position. The
  * automaton matches ALL K patterns in ONE left-to-right pass —
  * O(chars + matches) regardless of K — including overlapping
  * occurrences and patterns nested inside other patterns ("tab" inside
  * "table"), which per-term `replace`-based counting misses or
  * miscounts.
  *
  * Scale shape: the automaton is built once from the (bounded)
  * blocklist and BROADCAST; each executor scans its partition's
  * documents in a tight per-char loop over primitive arrays. State
  * count ≤ total pattern chars + 1; transitions are resolved through
  * failure links at scan time (goto miss → fail chain), so memory is
  * O(Σ|pattern|) — a million-term blocklist broadcasts in megabytes.
  * Output lists are merged into each node at build time (node output =
  * own terminal + fail node's output), so emission is O(matches), not
  * O(depth) per position.
  *
  * Classic construction (Aho & Corasick, CACM 1975): trie + BFS
  * failure links, the textbook algorithm — no external code.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "patterns must be non-empty")
  // a duplicate pattern would silently overwrite the earlier one's
  // terminal marker, attributing all its occurrences to the later index
  require(patterns.distinct.length == patterns.length,
    "duplicate patterns are not allowed: " +
      patterns.groupBy(identity).collect { case (p, g) if g.length > 1 => p }.mkString(", "))

  // trie: per-node char→child map (vocab-sparse, so a hash map per
  // node beats a 64k-wide array); node 0 = root
  private val children = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Character, Integer]())
  private val terminal = scala.collection.mutable.ArrayBuffer(-1) // pattern idx ending here
  patterns.zipWithIndex.foreach { case (p, pi) =>
    var node = 0
    var i = 0
    while (i < p.length) {
      val c: Character = p.charAt(i)
      var nxt = children(node).get(c)
      if (nxt == null) {
        children += new java.util.HashMap[Character, Integer]()
        terminal += -1
        nxt = children.size - 1
        children(node).put(c, nxt)
      }
      node = nxt
      i += 1
    }
    terminal(node) = pi
  }

  private val n = children.size
  private val fail = new Array[Int](n)
  // merged output lists: pattern indices ending at this node, own
  // terminal first then the fail chain's (order irrelevant to counts)
  private val out: Array[Array[Int]] = new Array[Array[Int]](n)
  locally {
    val queue = new java.util.ArrayDeque[Int]()
    out(0) = if (terminal(0) >= 0) Array(terminal(0)) else Array.emptyIntArray
    children(0).forEach { (_, v) =>
      fail(v) = 0
      out(v) = if (terminal(v) >= 0) Array(terminal(v)) else Array.emptyIntArray
      queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      children(u).forEach { (c, v) =>
        // failure: longest proper suffix of v's string that is a trie node
        var f = fail(u)
        var hop = children(f).get(c)
        while (hop == null && f != 0) { f = fail(f); hop = children(f).get(c) }
        fail(v) = if (hop != null && hop != v) hop.intValue() else 0
        out(v) =
          if (terminal(v) >= 0) terminal(v) +: out(fail(v))
          else out(fail(v))
        queue.add(v)
      }
    }
  }

  /** One pass over `text`: for every pattern occurrence (overlapping
    * included) call `onMatch(patternIdx, endPosZeroBased)`. */
  def scan(text: String, onMatch: (Int, Int) => Unit): Unit = {
    var node = 0
    var i = 0
    while (i < text.length) {
      val c: Character = text.charAt(i)
      var hop = children(node).get(c)
      while (hop == null && node != 0) { node = fail(node); hop = children(node).get(c) }
      node = if (hop != null) hop.intValue() else 0
      val o = out(node)
      var j = 0
      while (j < o.length) { onMatch(o(j), i); j += 1 }
      i += 1
    }
  }

  /** Per-pattern (occurrence count, Σ 1-based end positions) over
    * `text` — the aggregate shape the oracle recomputes positionally. */
  def counts(text: String): (Array[Long], Array[Long]) = {
    val hits = new Array[Long](patterns.length)
    val endSum = new Array[Long](patterns.length)
    scan(text, (pi, end) => { hits(pi) += 1; endSum(pi) += end + 1L })
    (hits, endSum)
  }
}
