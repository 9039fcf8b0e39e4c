package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.AhoCorasick

/** The automaton must agree with naive per-pattern leftmost
  * non-overlapping counting (replace() semantics) on everything —
  * overlap-capable patterns, shared prefixes, patterns that are
  * substrings of other patterns, and seeded fuzz. */
class AhoCorasickSpec extends AnyFunSuite {

  /** Reference counter: leftmost non-overlapping via indexOf. */
  private def naive(text: String, p: String): Long = {
    var i = 0L
    var from = 0
    var at = text.indexOf(p, from)
    while (at >= 0) {
      i += 1
      from = at + p.length
      at = text.indexOf(p, from)
    }
    i
  }

  private def check(text: String, patterns: Seq[String]): Unit = {
    val got = AhoCorasick.countHits(text, patterns.toArray)
    val want = patterns.map(naive(text, _))
    assert(got.toSeq == want, s"text=$text patterns=$patterns")
  }

  test("overlap-capable and nested patterns") {
    check("aaaa", Seq("aa", "aaa", "a"))          // self-border greed
    check("ababab", Seq("ab", "aba", "bab"))       // overlapping pair
    check("table table table", Seq("table", "table table", "le t"))
    check("xyx", Seq("xyx", "x", "yx"))
    check("", Seq("a", "ab"))
    check("no hits here", Seq("zz", "qq"))
  }

  test("seeded fuzz over a 3-char alphabet agrees with naive counting") {
    val rng = new scala.util.Random(7)
    val alpha = "abc"
    def s(n: Int) = (1 to n).map(_ => alpha(rng.nextInt(3))).mkString
    for (_ <- 1 to 300) {
      val text = s(1 + rng.nextInt(60))
      val pats = (1 to (1 + rng.nextInt(6))).map(_ => s(1 + rng.nextInt(4)))
        .distinct
      check(text, pats)
    }
  }

  test("one automaton instance per plan-broadcast array") {
    val arr = Array("ab", "bc")
    assert(AhoCorasick.automaton(arr) eq AhoCorasick.automaton(arr))
  }
}
