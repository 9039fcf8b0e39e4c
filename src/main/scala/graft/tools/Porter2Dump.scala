package graft.tools

import org.apache.spark.sql.functions._
import graft.{Corpus, GraftSession, Tables}
import graft.functions.{Porter2, TextOps}

/** Differential-test harness for the Porter2 SQL mirror (dev tool,
  * not a driver surface). Dumps:
  *
  *   - `<out>/tokens.csv`: (token, Scala stem) for every distinct
  *     tokenizer token of the corpus text columns at the given sfDir,
  *     plus a deterministic fuzz set (random-ish letter strings,
  *     y-heavy forms, digit/underscore tokens — seeded, so runs are
  *     reproducible);
  *   - `<out>/porter2_sql.txt`: the generated DuckDB expression over
  *     a column named `token`.
  *
  * `tools/porter2_diff.py` then evaluates the SQL in DuckDB against
  * the same CSV and reports any token where the two renderings
  * disagree. Run before ANY oracle depends on Porter2.
  */
object Porter2Dump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "/tmp/porter2_dump"
    val spark = GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val wp = Corpus.webPages(spark, sfDir)
      .select(explode(TextOps.tokens(
        concat_ws(" ", col("title"), col("domain"), col("url"), col("content"))))
        .as("token"))
    val docs = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val corpus = wp.unionByName(docs).distinct().as[String].collect()

    // deterministic fuzz: all short letter strings hit the region/
    // syllable edge cases; suffix-grafted forms hit every step rule
    val rng = new scala.util.Random(42)
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val sufs = Seq("s", "es", "ies", "ied", "sses", "ed", "eed", "eedly",
      "ing", "ingly", "edly", "y", "ly", "ational", "tional", "enci",
      "anci", "izer", "abli", "alli", "entli", "eli", "ousli", "ization",
      "ation", "ator", "alism", "iveness", "fulness", "ousness", "aliti",
      "iviti", "biliti", "logi", "fulli", "lessli", "li", "alize",
      "icate", "iciti", "ical", "ful", "ness", "ative", "al", "ance",
      "ence", "er", "ic", "able", "ible", "ant", "ement", "ment", "ent",
      "ion", "ism", "ate", "iti", "ous", "ive", "ize", "e", "ll")
    val fuzz = scala.collection.mutable.ArrayBuffer[String]()
    for (_ <- 1 to 4000) {
      val n = 1 + rng.nextInt(8)
      fuzz += (1 to n).map(_ => letters(rng.nextInt(26))).mkString
    }
    for (_ <- 1 to 6000) {
      val n = 1 + rng.nextInt(5)
      val stemPart = (1 to n).map(_ => letters(rng.nextInt(26))).mkString
      fuzz += stemPart + sufs(rng.nextInt(sufs.length))
    }
    for (_ <- 1 to 2000) { // y-heavy and vowel-heavy forms
      val n = 2 + rng.nextInt(6)
      fuzz += (1 to n).map(_ => "aeiouy" (rng.nextInt(6))).mkString
    }
    for (_ <- 1 to 1000) { // digits/underscores (tokenizer emits these)
      val n = 1 + rng.nextInt(6)
      fuzz += (1 to n).map(_ => "abc123_xyz" (rng.nextInt(10))).mkString
    }
    fuzz ++= Seq("gener", "generate", "generously", "communicate",
      "communism", "arsenal", "arsenic", "sky", "skies", "dying",
      "inning", "proceed", "exceeded", "herring", "y", "yy", "ayy",
      "oyoy", "by", "say", "cry", "enjoy", "employ")

    val all = (corpus ++ fuzz).distinct.sorted
    val rows = all.map(t => (t, Porter2.stem(t)))
    val w = new java.io.PrintWriter(s"$out.csv")
    w.println("token,stem")
    rows.foreach { case (t, s) => w.println(s"$t,$s") }
    w.close()
    val ws = new java.io.PrintWriter(s"$out.sql")
    ws.print(Porter2.sql("token"))
    ws.close()
    println(s"[porter2] ${rows.length} tokens -> $out.csv / $out.sql")
    spark.stop()
  }
}
