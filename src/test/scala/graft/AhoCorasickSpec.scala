package graft

import graft.operators.AhoCorasick
import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick correctness, pinned against a naive O(chars · terms)
  * positional matcher (the oracle's own method): every occurrence of
  * every pattern, overlapping and nested included, at the right end
  * position. */
class AhoCorasickSpec extends AnyFunSuite {

  private def naive(text: String, patterns: Array[String]): Map[Int, List[Int]] =
    patterns.zipWithIndex.flatMap { case (p, pi) =>
      (0 to text.length - p.length)
        .filter(i => text.regionMatches(i, p, 0, p.length))
        .map(i => pi -> (i + p.length - 1))
    }.groupBy(_._1).map { case (pi, v) => pi -> v.map(_._2).sorted.toList }

  private def acAll(text: String, patterns: Array[String]): Map[Int, List[Int]] = {
    val ac = new AhoCorasick(patterns)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    ac.scan(text, (pi, end) => buf += (pi -> end))
    buf.groupBy(_._1).map { case (pi, v) => pi -> v.map(_._2).sorted.toList }
  }

  test("nested and overlapping patterns: every occurrence, correct end positions") {
    val patterns = Array("table", "tab", "ab", " a ", "an", "scan", "aa", "aaa")
    val text = "a table scans a a a tab, aaaa ab table"
    assert(acAll(text, patterns) == naive(text, patterns))
    // " a " self-overlap inside " a a a ": ends at 15, 17, 19
    val sp = acAll(text, Array(" a "))
    assert(sp(0).size >= 3, s"self-overlap undercounted: $sp")
    // "aa" in "aaaa": 3 overlapping occurrences; "aaa": 2
    val aa = acAll("aaaa", Array("aa", "aaa"))
    assert(aa(0) == List(1, 2, 3) && aa(1) == List(2, 3))
  }

  test("randomized cross-check vs the naive matcher (small alphabet forces dense failure links)") {
    var seed = 12345L
    def rnd(n: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; (((seed >>> 33) % n) + n).toInt % n }
    (1 to 60).foreach { _ =>
      val alpha = "ab c"
      val text = new String(Array.fill(80 + rnd(200))(alpha(rnd(alpha.length))))
      val patterns = Array.fill(2 + rnd(8))(
        new String(Array.fill(1 + rnd(5))(alpha(rnd(alpha.length))))).distinct
      assert(acAll(text, patterns) == naive(text, patterns),
        s"text=$text patterns=${patterns.mkString("|")}")
    }
  }

  test("counts() aggregates match scan(): totals and 1-based end sums") {
    val patterns = Array("value", "alu", "lu", "batch table", "q")
    val text = "value alu value batch table qq"
    val ac = new AhoCorasick(patterns)
    val (hits, ends) = ac.counts(text)
    val all = naive(text, patterns)
    patterns.indices.foreach { pi =>
      assert(hits(pi) == all.get(pi).map(_.size).getOrElse(0).toLong, s"count $pi")
      assert(ends(pi) == all.get(pi).map(_.map(_ + 1L).sum).getOrElse(0L), s"endSum $pi")
    }
  }

  test("no false positives on a text avoiding the patterns") {
    val ac = new AhoCorasick(Array("xyz", "zzz"))
    val (hits, _) = ac.counts("a b c table scan value " * 10)
    assert(hits.forall(_ == 0L))
  }
}
