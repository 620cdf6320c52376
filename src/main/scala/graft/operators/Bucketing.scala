package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage for co-located joins — the storage-layout lever
  * that removes the shuffle from repeated large-table equi-joins.
  *
  * Writing both sides bucketed by the join key with the same bucket
  * count hash-partitions the FILES; Spark's scan then reports the
  * bucketing as its output partitioning, and a sort-merge join needs no
  * Exchange on either side (BucketingSpec asserts exactly that on the
  * physical plan). At 100 TB this is the difference between shuffling
  * the fact table on every consumer join and shuffling it once at
  * write time — the analog of the reference's btree FK indexes
  * (SURVEY §4 "Access-path indexes"), re-expressed as a Spark storage
  * layout.
  *
  * Guidance: bucket the big synced tables by their dominant join key
  * (orders/lineitem by order key; events by user; charges/invoices by
  * customer), bucket count sized so a bucket ≈ one task's worth of data
  * (128-512 MB), and keep counts EQUAL (or integer multiples, with
  * spark.sql.bucketing.coalesceBucketsInJoin.enabled) across tables
  * joined together.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plain join
    * code; the shuffle elimination comes from the storage layout, not
    * from a special operator. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
