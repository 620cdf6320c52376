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
      // the engine's bucketed stores (ReplayGuard ledgers, signature/
      // band stores, BM25 postings/doclen) all use 64 buckets — above
      // the default parallel-listing threshold (32), so EVERY read of
      // any such store paid a distributed "listing leaf files" JOB for
      // a path set a driver lists in microseconds (measured: 17 listing
      // jobs ≈ 1.9 s inside one qs9 run). 512 keeps sub-thousand
      // partition listings driver-side; genuinely large partitioned
      // tables (>512 dirs) still use the distributed path, so the
      // setting is scale-adaptive, not a local[32] hack.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", 512)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
