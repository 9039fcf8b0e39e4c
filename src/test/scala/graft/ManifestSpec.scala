package graft

import graft.ops.{Bayes, Manifest}
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Build manifest (q200): stage composition contracts — the filter
  * trains on the DEDUPED corpus (not raw), only kept docs are
  * sharded, mixture weights normalize to 1, and the manifest's doc
  * accounting ties back to the stage outputs. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  test("manifest accounting ties back to the composed stages") {
    val m = Manifest.buildManifest(spark, sfDir).collect()
    assert(m.nonEmpty)
    // mixture weights: one value per source, summing to ~1
    val perSource = m.map(r => r.getString(0) -> r.getDouble(4))
      .groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).distinct }
    assert(perSource.values.forall(_.length == 1),
      "p_mix must be constant within a source")
    val psum = perSource.values.map(_.head).sum
    assert(math.abs(psum - 1.0) < 1e-4, s"mixture weights sum to $psum")
    // shards within range; doc counts positive
    assert(m.forall(r => r.getLong(1) >= 0 && r.getLong(1) < Manifest.Shards))
    assert(m.forall(_.getLong(2) > 0))

    // stage tie-back: total sharded docs == deduped docs passing the
    // trained gate (recomputed independently from the stage pieces)
    val d = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
    val fps = d.withColumn("fp", TextOps.fingerprint($"text"))
    val canon = fps.groupBy($"fp").agg(min($"doc_id").as("doc_id"))
    val docs2 = fps.join(canon, Seq("fp", "doc_id"), "left_semi")
    val toks = docs2.select($"doc_id", $"source",
      $"source".isin(Bayes.CuratedSources: _*).as("curated"),
      explode(TextOps.tokens($"text")).as("tok"))
    val mdl = Bayes.model(spark, toks)
    val w = mdl.groupBy($"bin").agg(
      (sum(when($"curated", $"lp").otherwise(lit(0.0)))
        - sum(when(!$"curated", $"lp").otherwise(lit(0.0)))).as("w"))
    val keptCount = toks
      .select($"doc_id",
        pmod(TextOps.hash60($"tok"), lit(Bayes.Bins)).as("bin"))
      .join(w, Seq("bin"))
      .groupBy($"doc_id")
      .agg(round(sum($"w".cast("decimal(28,12)")).cast("double")
        / count(lit(1)), 6).as("llr"))
      .filter($"llr" > 0.0).count()
    assert(m.map(_.getLong(2)).sum == keptCount,
      "every kept doc is sharded exactly once, nothing else is")
  }
}
