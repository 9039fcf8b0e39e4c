package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Porter2

/** Fidelity table for the Snowball English (Porter2) stemmer — each
  * pair hand-derived from the published algorithm (snowballstem.org)
  * step by step, covering every step's rules, the exception lists,
  * the y/Y consonant marking, and the R1/R2 edge cases (gener-,
  * commun-, arsen- prefixes; short-word e restoration; the famous
  * porter1-vs-porter2 divergence on "argument").
  *
  * Cross-engine parity of the SQL mirror is established separately by
  * tools.Porter2Dump + tools/porter2_diff.py over the corpus
  * vocabulary plus a 13k-token fuzz set (run green before any oracle
  * landed on Porter2.sql).
  */
class Porter2Spec extends AnyFunSuite {

  private val pairs = Seq(
    // length guard + invariants + exception1 mappings
    "a" -> "a", "by" -> "by", "is" -> "is",
    "sky" -> "sky", "news" -> "news", "atlas" -> "atlas", "bias" -> "bias",
    "cosmos" -> "cosmos", "andes" -> "andes", "howe" -> "howe",
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // exception2: stop after step 1a
    "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
    "herring" -> "herring", "earring" -> "earring",
    "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed",
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "tie",
    "dies" -> "die", "flies" -> "fli", "studies" -> "studi",
    "caress" -> "caress", "cats" -> "cat", "gas" -> "gas", "this" -> "this",
    "kiwis" -> "kiwi", "gaps" -> "gap",
    // step 1b: eed/eedly in R1; ed/ing family with at/bl/iz, double,
    // short-word restoration
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
    "hoping" -> "hope", "running" -> "run", "bowling" -> "bowl",
    "exceeded" -> "exceed", "employed" -> "employ",
    // step 1c: y→i after a non-initial consonant
    "happy" -> "happi", "cry" -> "cri", "dry" -> "dri", "say" -> "say",
    "enjoy" -> "enjoy", "employ" -> "employ", "studying" -> "studi",
    // step 2
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
    "digitizer" -> "digit", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "generously" -> "generous",
    "fluently" -> "fluentli", "consistency" -> "consist",
    // step 3 / step 4
    "conventional" -> "convent", "national" -> "nation",
    "argument" -> "argument", "communism" -> "communism",
    "conformabli" -> "conform", "hesitancy" -> "hesit",
    "knackeries" -> "knackeri", "consignment" -> "consign",
    // step 5 + R1/R2 prefixes + misc
    "generate" -> "generat", "abate" -> "abat", "cease" -> "ceas",
    "hope" -> "hope", "consign" -> "consign", "consigned" -> "consign",
    "consigning" -> "consign", "consist" -> "consist",
    "conspicuous" -> "conspicu", "convention" -> "convent")

  test("porter2 word→stem table") {
    val bad = pairs.collect {
      case (w, want) if Porter2.stem(w) != want =>
        s"$w -> ${Porter2.stem(w)} (want $want)"
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  test("null and marking edge cases") {
    assert(Porter2.stem(null) == null)
    assert(Porter2.stem("") == "")
    assert(Porter2.stem("y") == "y")
    assert(Porter2.stem("yyy") == "yyy")
    // digit/underscore tokens (tokenizer emits them) pass through the
    // algorithm as all-consonant words
    assert(Porter2.stem("x1_2") == "x1_2")
  }
}
