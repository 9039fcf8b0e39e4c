package graft.tools

/** Mechanical regeneration of [[graft.BenchTiers]] (VERDICT r11 #6):
  * the certified-steady table was hand-regenerated from canonical
  * records, and a stale entry mis-tiers a query — a query that got
  * SLOWER could hide in a grouped child until the regroup backstop
  * fires (new queries default solo, which is safe). This tool emits
  * the table from the canonical idle record(s) themselves, so the
  * provenance is executable:
  *
  * {{{
  * sbt "runMain graft.tools.GenBenchTiers BENCH_LOCAL_r12.json[,more.json] r12"
  * }}}
  *
  * Per-query value = MIN across every rep array of every given
  * record (the certified idle steady state — minima only, the same
  * rule the bench's min-of-reps reporting uses). Declared queries
  * absent from every record are emitted into `newThisRound` — they
  * run on the SOLO protocol until a canonical record certifies them.
  * BenchTiersSpec asserts the declared set is exactly covered by
  * `certifiedSteady ∪ newThisRound`, so a rename or a dropped query
  * fails the suite instead of silently mis-tiering.
  *
  * No JSON library ships with the repo's main classpath beyond
  * Spark's shaded ones; the record format is our own single line, so
  * extraction is a targeted regex over `"qNN":[a,b,...]` in the
  * `query_reps` map (written by [[graft.Bench]] itself).
  */
object GenBenchTiers {

  private val RepArray = """"(q\d+)":\[([0-9.,]*)\]""".r
  private val FailedName = """"(q\d+)"""".r

  def main(args: Array[String]): Unit = {
    val records = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val roundTag = if (args.length > 1) args(1) else "unversioned"
    val mins = scala.collection.mutable.Map.empty[String, Double]
    records.foreach { path =>
      val line = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      if (!line.contains("\"failed\":["))
        sys.error(s"$path: no failed list — not a bench record")
      // a record may hold SEVERAL runs ({"runs":[...]}, e.g.
      // BENCH_LOCAL_r10_addendum2): every run contributes its minima,
      // and each run's failed/below_band exclusions are scoped to
      // THAT run's object (from its query_reps to the next run's) —
      // a whole-file grep would both drop later runs' rows and apply
      // one run's flags to another's measurements.
      val starts = "\"query_reps\":".r.findAllMatchIn(line)
        .map(_.start).toList
      if (starts.isEmpty)
        sys.error(s"$path: no query_reps map — not a bench record")
      starts.zipWithIndex.foreach { case (i, idx) =>
        val bound =
          if (idx + 1 < starts.length) starts(idx + 1) else line.length
        val runRegion = line.substring(i, bound)
        // only the query_reps map contains rep ARRAYS keyed by qNN —
        // restrict the min scan to it so the `queries` min map (same
        // keys, scalar values) cannot double-feed
        val repsRegion = runRegion.substring(0,
          runRegion.indexOf("}", runRegion.indexOf("{")) + 1)
        def flagged(tag: String): Set[String] = {
          val j = runRegion.indexOf(s""""$tag":[""")
          if (j == -1) Set.empty
          else FailedName.findAllMatchIn(
            runRegion.substring(j, runRegion.indexOf("]", j) + 1))
            .map(_.group(1)).toSet
        }
        // FAILED rep arrays are residual-wall shares, not
        // measurements; BELOW_BAND rows are ones the protocol itself
        // flagged as anomalously warm-fast (< 0.7× certified) — a
        // measurement the record disclaims must never become the
        // certified floor (a spuriously low floor lands honest future
        // runs above the regroup cutoff and burns solo re-runs).
        val skip = flagged("failed") ++ flagged("below_band")
        if (skip.nonEmpty)
          System.err.println(s"[gen] $path run ${idx + 1}: skipping " +
            s"${skip.size} failed/below_band rows")
        RepArray.findAllMatchIn(repsRegion).foreach { m =>
          val name = m.group(1)
          val reps = m.group(2).split(",").filter(_.nonEmpty)
            .map(_.toDouble)
          if (reps.nonEmpty && !skip.contains(name)) {
            val v = reps.min
            mins.updateWith(name)(prev =>
              Some(prev.fold(v)(math.min(_, v))))
          }
        }
      }
    }
    require(mins.nonEmpty, s"no rep arrays parsed from ${records.mkString(",")}")
    val declared = graft.SparkEntry.queries.keys
      .map(_.takeWhile(_ != '_')).toSet
    val stale = mins.keySet.diff(declared).toSeq.sorted
    if (stale.nonEmpty)
      System.err.println(s"[gen] dropping ${stale.size} record entries for " +
        s"no-longer-declared queries: ${stale.mkString(",")}")
    val certified = mins.view.filterKeys(declared).toMap
    val fresh = declared.diff(certified.keySet).toSeq
      .sortBy(n => n.drop(1).toInt)
    def ms3(v: Double) = math.rint(v * 1000) / 1000
    val entries = certified.toSeq.sortBy(t => t._1.drop(1).toInt)
      .map { case (n, v) => s"""    "$n" -> ${ms3(v)},""" }
      .mkString("\n")
    val freshEntries =
      if (fresh.isEmpty) ""
      else fresh.map(n => s""""$n"""").mkString("    ", ", ", "")
    val out =
      s"""package graft
         |
         |/** Certified idle steady-state seconds per declared query (qNN
         |  * key) — per-query MIN across the canonical idle record(s):
         |  * ${records.mkString(", ")} ($roundTag).
         |  *
         |  * GENERATED by `graft.tools.GenBenchTiers` — do not hand-edit;
         |  * regenerate from the latest canonical idle record when the
         |  * suite changes. This table picks each query's BENCH PROTOCOL
         |  * TIER only — it never appears in any reported number: a query
         |  * at-or-above [[Bench.SoloThresholdSec]] (or in [[newThisRound]])
         |  * keeps the fresh-JVM 2-rep protocol; queries certified faster
         |  * than that share a child JVM in small batches, and any batched
         |  * measurement landing far above its certified band is re-run on
         |  * the fresh-JVM protocol anyway (see [[Bench]]).
         |  */
         |object BenchTiers {
         |
         |  /** Declared queries with no canonical record yet — they run
         |    * SOLO until a record certifies them (safe default). */
         |  val newThisRound: Set[String] = Set(
         |$freshEntries)
         |
         |  val certifiedSteady: Map[String, Double] = Map(
         |$entries
         |  )
         |}
         |""".stripMargin
    val target = java.nio.file.Paths.get("src/main/scala/graft/BenchTiers.scala")
    java.nio.file.Files.write(target, out.getBytes("UTF-8"))
    println(s"[gen] wrote ${certified.size} certified + ${fresh.size} new " +
      s"entries to $target from ${records.size} record(s)")
  }
}
