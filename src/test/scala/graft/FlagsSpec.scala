package graft

import org.apache.spark.sql.functions._

import graft.ops.Flags

/** The flag cache mirrors the reference's lru_cache semantics
  * (`feature_flags.py:12-30`): reads are served from the process
  * cache — stale across underlying writes — until the clear-cache
  * endpoint invalidates it. */
class FlagsSpec extends SparkSpec {

  test("cached reads are stale across a flag toggle until clear-cache") {
    Flags.clearCache()
    val first = Flags.cachedFlagMap(Flags.featureFlags(spark, sfDir))
    // the toggle UPDATE lands... but the cache still serves the old map
    val stale = Flags.cachedFlagMap(Flags.updatedFlags(spark, sfDir))
    assert(stale === first)
    Flags.clearCache() // POST /api/flags/clear-cache
    val fresh = Flags.cachedFlagMap(Flags.updatedFlags(spark, sfDir))
    assert(fresh("structured_data_extraction")
      !== first("structured_data_extraction"))
    assert((fresh - "structured_data_extraction")
      === (first - "structured_data_extraction"))
    Flags.clearCache() // leave no state for other suites
  }

  test("flagReload query reports the stale and reloaded gate outcomes") {
    val rows = Flags.flagReload(spark, sfDir).collect()
    val sde = rows.find(_.getAs[String]("name")
      === "structured_data_extraction").get
    assert(sde.getAs[Boolean]("enabled_cached")
      !== sde.getAs[Boolean]("enabled_reloaded"))
    // the gate only ran rows under whichever state was enabled
    val cached = sde.getAs[Long]("gated_rows_cached")
    val reloaded = sde.getAs[Long]("gated_rows_reloaded")
    assert((cached == 0L) !== (reloaded == 0L))
  }
}
