package graft

import graft.functions.Embeddings
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class HashFeaturizeSpec extends SparkSpec {
  import spark.implicits._

  test("native featurizer is bit-identical to the HOF formulation") {
    // random word soups incl. casing, punctuation, digits, unicode
    val word = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("Fast", "MERGE", "window", "café", "a_b", "42", "x!y"))
    val gen = Gen.listOfN(12, word).map(_.mkString(" "))
    val texts = (1 to 30).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq("", "   ", "!!! ??? ...", "the the the", "a")
    val df = texts.toDF("t")
    val rows = df.select(
        Embeddings.featurize($"t").as("n"),
        Embeddings.featurizeHof($"t").as("h"))
      .as[(Seq[Double], Seq[Double])].collect()
    rows.foreach { case (n, h) => assert(n === h) }
  }

  test("deterministic, unit norm (when non-empty), fixed dims") {
    val v1 = Seq("alpha beta gamma").toDF("t")
      .select(Embeddings.featurize($"t")).as[Seq[Double]].head()
    val v2 = Seq("alpha beta gamma").toDF("t")
      .select(Embeddings.featurize($"t")).as[Seq[Double]].head()
    assert(v1 === v2)
    assert(v1.length === Embeddings.Dims)
    assert(math.abs(v1.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("zero tokens -> all-zero vector (zero-norm passthrough)") {
    val v = Seq("!!! ???").toDF("t")
      .select(Embeddings.featurize($"t")).as[Seq[Double]].head()
    assert(v.forall(_ === 0.0))
    assert(v.length === Embeddings.Dims)
  }

  test("null text -> null vector") {
    val r = Seq(Option.empty[String]).toDF("t")
      .select(Embeddings.featurize($"t")).collect().head
    assert(r.isNullAt(0))
  }

  test("matches the oracle hash rule on a known token") {
    // bucket/sign must agree with TextOps.hash60 semantics
    val df = Seq("merge").toDF("t")
    val h = df.select(graft.functions.TextOps.hash60($"t")).as[Long].head()
    val v = df.select(Embeddings.featurize($"t")).as[Seq[Double]].head()
    val bucket = (h % Embeddings.Dims).toInt
    val sign = if (((h >> 6) & 1L) == 0L) 1.0 else -1.0
    assert(v(bucket) === sign) // single token -> unit vector on its bucket
  }

  test("vec_featurize registers through GraftExtensions for SQL") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val sessionState = spark.getClass.getMethod("sessionState").invoke(spark)
    val registry = sessionState.getClass.getMethod("functionRegistry")
      .invoke(sessionState)
      .asInstanceOf[org.apache.spark.sql.catalyst.analysis.FunctionRegistry]
    ext.getClass.getMethod("registerFunctions",
        classOf[org.apache.spark.sql.catalyst.analysis.FunctionRegistry])
      .invoke(ext, registry)
    val out = spark.sql(
      "SELECT size(vec_featurize('hello world')) AS d64, " +
        "size(vec_featurize('hello world', 16)) AS d16")
      .collect().head
    assert(out.getInt(0) === 64)
    assert(out.getInt(1) === 16)
  }
}
