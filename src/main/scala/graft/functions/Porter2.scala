package graft.functions

/** The English (Porter2) Snowball stemmer — faithful implementation
  * of the published algorithm (snowballstem.org, "The English
  * stemming algorithm"), twice:
  *
  *   - [[stem]]: imperative Scala, the engine-side fast path (called
  *     from the codegen'd [[graft.expressions.Porter2Stem]]
  *     expression);
  *   - [[sql]]: a mechanically mirrored DuckDB scalar expression over
  *     a token variable, built from the SAME step structure, so the
  *     cross-engine oracle can hash-match stemmed queries exactly
  *     (DuckDB's own `stem()` lives in the fts extension, which is
  *     not loadable offline — so the oracle carries the algorithm
  *     itself).
  *
  * The reference gets this behavior from Postgres
  * `to_tsquery('english', …)` (`search.py:61`), whose english
  * dictionary is this same Snowball stemmer.
  *
  * Parity between the two renderings is enforced two ways:
  * Porter2Spec's published word→stem table, and a corpus+fuzz
  * differential run (tools.Porter2Dump + tools/porter2_diff.py)
  * executed before any oracle landed on this code.
  *
  * Region convention: `r1`/`r2` hold the 0-based index where the
  * region starts (== word length when the region is null). They are
  * computed once after the prelude and stay valid as the word only
  * ever shrinks from the right.
  */
object Porter2 {

  private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private val Doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

  private val Exception1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val Exception2 = Set("inning", "outing", "canning", "herring",
    "earring", "proceed", "exceed", "succeed")

  /** Prelude: strip one initial apostrophe; mark consonant-y (initial
    * y, or y after a vowel) as Y. */
  private def prelude(word: String): String = {
    val w0 = if (word.startsWith("'")) word.substring(1) else word
    val a = w0.toCharArray
    var i = 0
    while (i < a.length) {
      if (a(i) == 'y' && (i == 0 || isV(a(i - 1)))) a(i) = 'Y'
      i += 1
    }
    new String(a)
  }

  /** 0-based start of the region after the first non-vowel following
    * a vowel in w.substring(from); == w.length if none. */
  private def regionStart(w: String, from: Int): Int = {
    var i = from + 1
    while (i < w.length && !(isV(w(i - 1)) && !isV(w(i)))) i += 1
    if (i >= w.length) w.length else i + 1
  }

  private def markR1(w: String): Int =
    if (w.startsWith("gener")) 5
    else if (w.startsWith("commun")) 6
    else if (w.startsWith("arsen")) 5
    else regionStart(w, 0)

  /** Suffix (of the given length) lies in the region starting at r. */
  private def inR(w: String, r: Int, sufLen: Int): Boolean =
    w.length - sufLen >= r

  private def containsVowel(s: String): Boolean = s.exists(isV)

  /** Short syllable at the END of w: non-vowel + vowel + non-vowel
    * (last ≠ w/x/Y), or word-initial vowel + non-vowel. */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    (n >= 3 && !isV(w(n - 3)) && isV(w(n - 2)) && !isV(w(n - 1)) &&
      w(n - 1) != 'w' && w(n - 1) != 'x' && w(n - 1) != 'Y') ||
    (n == 2 && isV(w(0)) && !isV(w(1)))
  }

  /** A word is short iff R1 is null and it ends in a short syllable. */
  private def isShort(w: String, r1: Int): Boolean =
    r1 >= w.length && endsShortSyllable(w)

  private def step0(w: String): String =
    if (w.endsWith("'s'")) w.dropRight(3)
    else if (w.endsWith("'s")) w.dropRight(2)
    else if (w.endsWith("'")) w.dropRight(1)
    else w

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      // replace by i if preceded by more than one letter, else by ie
      (if (w.length > 4) w.dropRight(2) else w.dropRight(1))
    else if (w.endsWith("us") || w.endsWith("ss")) w
    else if (w.endsWith("s") && containsVowel(w.substring(0, math.max(0, w.length - 2))))
      w.dropRight(1)
    else w

  private def step1b(w: String, r1: Int): String = {
    def afterDelete(d: String): String =
      if (d.endsWith("at") || d.endsWith("bl") || d.endsWith("iz")) d + "e"
      else if (d.length >= 2 && Doubles.contains(d.substring(d.length - 2)))
        d.dropRight(1)
      else if (isShort(d, r1)) d + "e"
      else d
    def del(k: Int): String = {
      val d = w.dropRight(k)
      if (containsVowel(d)) afterDelete(d) else w
    }
    // longest of: eedly ingly edly eed ing ed
    if (w.endsWith("eedly")) { if (inR(w, r1, 5)) w.dropRight(3) else w }
    else if (w.endsWith("ingly")) del(5)
    else if (w.endsWith("edly")) del(4)
    else if (w.endsWith("eed")) { if (inR(w, r1, 3)) w.dropRight(1) else w }
    else if (w.endsWith("ing")) del(3)
    else if (w.endsWith("ed")) del(2)
    else w
  }

  private def step1c(w: String): String = {
    val n = w.length
    if (n >= 3 && (w(n - 1) == 'y' || w(n - 1) == 'Y') && !isV(w(n - 2)))
      w.substring(0, n - 1) + "i"
    else w
  }

  /** Step 2 rules as (suffix, replacement, extraGuard) — longest
    * match wins, then the in-R1 (+ guard) condition decides between
    * replace and no-op. Guards: `ogi` needs a preceding l; `li` needs
    * a valid li-ending (c d e g h k m n r t). */
  private[functions] val Step2: Seq[(String, String, Option[String])] = Seq(
    ("ational", "ate", None), ("ization", "ize", None),
    ("fulness", "ful", None), ("ousness", "ous", None),
    ("iveness", "ive", None),
    ("tional", "tion", None), ("biliti", "ble", None),
    ("lessli", "less", None),
    ("entli", "ent", None), ("ation", "ate", None), ("alism", "al", None),
    ("aliti", "al", None), ("ousli", "ous", None), ("iviti", "ive", None),
    ("fulli", "ful", None),
    ("enci", "ence", None), ("anci", "ance", None), ("abli", "able", None),
    ("izer", "ize", None), ("ator", "ate", None), ("alli", "al", None),
    ("bli", "ble", None), ("ogi", "og", Some("l")),
    ("li", "", Some("cdeghkmnrt")))

  private def step2(w: String, r1: Int): String = {
    Step2.find { case (suf, _, _) => w.endsWith(suf) } match {
      case Some((suf, rep, guard)) =>
        val pre = w.length - suf.length - 1
        val guardOk = guard.forall(g => pre >= 0 && g.contains(w(pre)))
        if (inR(w, r1, suf.length) && guardOk)
          w.dropRight(suf.length) + rep
        else w
      case None => w
    }
  }

  /** Step 3: (suffix, replacement, needsR2) — `ative` deletes only in
    * R2. */
  private[functions] val Step3: Seq[(String, String, Boolean)] = Seq(
    ("ational", "ate", false), ("tional", "tion", false),
    ("alize", "al", false), ("icate", "ic", false), ("iciti", "ic", false),
    ("ative", "", true), ("ical", "ic", false), ("ness", "", false),
    ("ful", "", false))

  private def step3(w: String, r1: Int, r2: Int): String = {
    Step3.find { case (suf, _, _) => w.endsWith(suf) } match {
      case Some((suf, rep, needsR2)) =>
        val r = if (needsR2) r2 else r1
        if (inR(w, r, suf.length)) w.dropRight(suf.length) + rep else w
      case None => w
    }
  }

  /** Step 4 suffixes (delete in R2); `ion` additionally requires a
    * preceding s or t. */
  private[functions] val Step4: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic")

  private def step4(w: String, r2: Int): String = {
    Step4.find(w.endsWith) match {
      case Some(suf) =>
        val pre = w.length - suf.length - 1
        val ionOk = suf != "ion" ||
          (pre >= 0 && (w(pre) == 's' || w(pre) == 't'))
        if (inR(w, r2, suf.length) && ionOk) w.dropRight(suf.length) else w
      case None => w
    }
  }

  private def step5(w: String, r1: Int, r2: Int): String =
    if (w.endsWith("e") &&
        (inR(w, r2, 1) ||
          (inR(w, r1, 1) && !endsShortSyllable(w.dropRight(1)))))
      w.dropRight(1)
    else if (w.endsWith("ll") && inR(w, r2, 1)) w.dropRight(1)
    else w

  /** Stem one lowercase token. Null-safe (null → null); tokens of ≤ 2
    * chars and the exception list pass through per the algorithm. */
  def stem(token: String): String = {
    if (token == null) return null
    val word = token
    Exception1.get(word) match {
      case Some(s) => s
      case None =>
        if (word.length <= 2) word
        else {
          var w = prelude(word)
          val r1 = markR1(w)
          val r2 = regionStart(w, r1)
          w = step1a(step0(w))
          if (Exception2.contains(w)) w
          else {
            w = step1b(w, r1)
            w = step1c(w)
            w = step2(w, r1)
            w = step3(w, r1, r2)
            w = step4(w, r2)
            w = step5(w, r1, r2)
            w.replace('Y', 'y')
          }
        }
    }
  }

  // ----------------------------------------------------------- SQL mirror

  /** Fresh-variable counter for the let-binding combinator. Reset per
    * [[sql]] call; generation happens once at oracle-build time. */
  private def sqlBody(t: String): String = {
    var ctr = 0
    def let(expr: String)(body: String => String): String = {
      ctr += 1
      val v = s"p$ctr"
      s"list_transform([$expr], $v -> ${body(v)})[1]"
    }
    def suf(w: String, s: String) = s"ends_with($w, '$s')"
    def cut(w: String, k: Int) = s"substr($w, 1, length($w) - $k)"
    def repl(w: String, sl: Int, r: String) =
      if (r.isEmpty) cut(w, sl) else s"(${cut(w, sl)} || '$r')"
    // 1-based region starts in SQL (r holds markR1+1)
    def inR(w: String, r: String, sl: Int) =
      s"(length($w) - $sl + 1 >= $r)"
    def hasVowel(e: String) = s"regexp_matches($e, '[aeiouy]')"
    def endsShort(w: String) =
      s"regexp_matches($w, '([^aeiouy][aeiouy][^aeiouywxY]|^[aeiouy][^aeiouy])$$')"
    def isShort(w: String, r1: String) =
      s"($r1 >= length($w) + 1 AND ${endsShort(w)})"

    val marked =
      s"regexp_replace(regexp_replace(CASE WHEN starts_with($t, '''') " +
        s"THEN substr($t, 2) ELSE $t END, '^y', 'Y'), " +
        s"'([aeiouy])y', '\\1Y', 'g')"

    let(marked) { w0 =>
      val r1Expr =
        s"CASE WHEN starts_with($w0, 'gener') THEN 6 " +
          s"WHEN starts_with($w0, 'commun') THEN 7 " +
          s"WHEN starts_with($w0, 'arsen') THEN 6 " +
          s"WHEN regexp_matches($w0, '[aeiouy][^aeiouy]') " +
          s"THEN length(regexp_extract($w0, '^(.*?[aeiouy][^aeiouy])', 1)) + 1 " +
          s"ELSE length($w0) + 1 END"
      let(r1Expr) { r1 =>
        val r2Expr =
          s"CASE WHEN regexp_matches(substr($w0, $r1), '[aeiouy][^aeiouy]') " +
            s"THEN $r1 - 1 + length(regexp_extract(substr($w0, $r1), '^(.*?[aeiouy][^aeiouy])', 1)) + 1 " +
            s"ELSE length($w0) + 1 END"
        let(r2Expr) { r2 =>
          val s0 =
            s"CASE WHEN ${suf(w0, "''s''")} THEN ${cut(w0, 3)} " +
              s"WHEN ${suf(w0, "''s")} THEN ${cut(w0, 2)} " +
              s"WHEN ${suf(w0, "''")} THEN ${cut(w0, 1)} ELSE $w0 END"
          let(s0) { wA =>
            val s1a =
              s"CASE WHEN ${suf(wA, "sses")} THEN ${cut(wA, 2)} " +
                s"WHEN ${suf(wA, "ied")} OR ${suf(wA, "ies")} THEN " +
                s"(CASE WHEN length($wA) > 4 THEN ${cut(wA, 2)} ELSE ${cut(wA, 1)} END) " +
                s"WHEN ${suf(wA, "us")} OR ${suf(wA, "ss")} THEN $wA " +
                s"WHEN ${suf(wA, "s")} AND ${hasVowel(s"substr($wA, 1, length($wA) - 2)")} " +
                s"THEN ${cut(wA, 1)} ELSE $wA END"
            let(s1a) { w1 =>
              val exc2 = Exception2.toSeq.sorted
                .map(e => s"'$e'").mkString(", ")
              val rest = let({
                // step 1b
                def del(k: Int): String =
                  let(cut(w1, k)) { d =>
                    s"CASE WHEN NOT ${hasVowel(d)} THEN $w1 " +
                      s"WHEN ${suf(d, "at")} OR ${suf(d, "bl")} OR ${suf(d, "iz")} THEN ($d || 'e') " +
                      s"WHEN ${Doubles.toSeq.sorted.map(x => suf(d, x)).mkString(" OR ")} THEN ${cut(d, 1)} " +
                      s"WHEN ${isShort(d, r1)} THEN ($d || 'e') ELSE $d END"
                  }
                s"CASE WHEN ${suf(w1, "eedly")} THEN " +
                  s"(CASE WHEN ${inR(w1, r1, 5)} THEN ${cut(w1, 3)} ELSE $w1 END) " +
                  s"WHEN ${suf(w1, "ingly")} THEN ${del(5)} " +
                  s"WHEN ${suf(w1, "edly")} THEN ${del(4)} " +
                  s"WHEN ${suf(w1, "eed")} THEN " +
                  s"(CASE WHEN ${inR(w1, r1, 3)} THEN ${cut(w1, 1)} ELSE $w1 END) " +
                  s"WHEN ${suf(w1, "ing")} THEN ${del(3)} " +
                  s"WHEN ${suf(w1, "ed")} THEN ${del(2)} ELSE $w1 END"
              }) { w2 =>
                val s1c =
                  s"CASE WHEN length($w2) >= 3 AND " +
                    s"(${suf(w2, "y")} OR ${suf(w2, "Y")}) AND " +
                    s"NOT regexp_matches(substr($w2, length($w2) - 1, 1), '[aeiouy]') " +
                    s"THEN (${cut(w2, 1)} || 'i') ELSE $w2 END"
                let(s1c) { w3 =>
                  val s2 = Step2.map { case (sfx, rep, guard) =>
                    val g = guard match {
                      case None => ""
                      case Some(chars) =>
                        s" AND regexp_matches(substr($w3, length($w3) - ${sfx.length}, 1), '[$chars]')"
                    }
                    s"WHEN ${suf(w3, sfx)} THEN " +
                      s"(CASE WHEN ${inR(w3, r1, sfx.length)}$g " +
                      s"THEN ${repl(w3, sfx.length, rep)} ELSE $w3 END)"
                  }.mkString("CASE ", " ", s" ELSE $w3 END")
                  let(s2) { w4 =>
                    val s3 = Step3.map { case (sfx, rep, needsR2) =>
                      val r = if (needsR2) r2 else r1
                      s"WHEN ${suf(w4, sfx)} THEN " +
                        s"(CASE WHEN ${inR(w4, r, sfx.length)} " +
                        s"THEN ${repl(w4, sfx.length, rep)} ELSE $w4 END)"
                    }.mkString("CASE ", " ", s" ELSE $w4 END")
                    let(s3) { w5 =>
                      val s4 = Step4.map { sfx =>
                        val ion =
                          if (sfx == "ion")
                            s" AND regexp_matches(substr($w5, length($w5) - 3, 1), '[st]')"
                          else ""
                        s"WHEN ${suf(w5, sfx)} THEN " +
                          s"(CASE WHEN ${inR(w5, r2, sfx.length)}$ion " +
                          s"THEN ${cut(w5, sfx.length)} ELSE $w5 END)"
                      }.mkString("CASE ", " ", s" ELSE $w5 END")
                      let(s4) { w6 =>
                        val s5 =
                          s"CASE WHEN ${suf(w6, "e")} AND (${inR(w6, r2, 1)} OR " +
                            s"(${inR(w6, r1, 1)} AND NOT ${endsShort(cut(w6, 1))})) " +
                            s"THEN ${cut(w6, 1)} " +
                            s"WHEN ${suf(w6, "ll")} AND ${inR(w6, r2, 1)} " +
                            s"THEN ${cut(w6, 1)} ELSE $w6 END"
                        s"replace($s5, 'Y', 'y')"
                      }
                    }
                  }
                }
              }
              s"CASE WHEN $w1 IN ($exc2) THEN $w1 ELSE $rest END"
            }
          }
        }
      }
    }
  }

  /** DuckDB scalar expression computing [[stem]] of token expression
    * `t` (a lowercase varchar). Single-sourced from the same step
    * tables as the Scala implementation. */
  def sql(t: String): String = {
    val exc1 = Exception1.toSeq.sorted.map { case (k, v) =>
      s"WHEN $t = '$k' THEN '$v'"
    }.mkString(" ")
    s"(CASE $exc1 WHEN length($t) <= 2 THEN $t ELSE ${sqlBody(t)} END)"
  }
}
