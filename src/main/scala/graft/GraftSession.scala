package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults — every main (Verify,
  * Bench, tools) builds through here instead of repeating the conf
  * block.
  *
  * Local defaults: GraftExtensions (native expressions in SQL),
  * shuffle partitions = cores (not Spark's 200 — local[N] has N slots),
  * AQE + partition coalescing, UTC, nanos-as-long (the events table is
  * INT64 TIMESTAMP(NANOS)), UI off.
  *
  * A cluster deployment keeps the same confs minus `master`, sizes
  * `spark.sql.shuffle.partitions` to ~2-3× total executor cores, and
  * adds `spark.sql.adaptive.skewJoin.enabled=true` (AQE skew-split) —
  * the engine's operators assume nothing beyond these.
  */
object GraftSession {

  def local(cores: Int, adaptive: Boolean = true): SparkSession =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", adaptive)
      .config("spark.sql.adaptive.coalescePartitions.enabled", adaptive)
      .config("spark.sql.session.timeZone", "UTC")
      // runtime-bloom caps govern EVERY BloomFilterAggregate, including
      // the ReplayGuard's admission filters (which clamp to these so
      // driver-built and aggregate-built filters stay mergeable). The
      // defaults (4M items / 64 Mbit) cap the exact-fpp envelope at
      // ~5M ids; raise to ~1e9 items / 1 Gbit ≈ 110M ids at 1% fpp —
      // past that the guard degrades fpp gracefully, never crashes.
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 1000000000L)
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 1073741824L)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
