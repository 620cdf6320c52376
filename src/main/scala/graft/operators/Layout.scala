package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.QuantileRank

/** Multi-column clustered (Z-order) parquet layout — the second half of
  * the storage-access-path story started by [[Bucketing]].
  *
  * The reference serves point and range lookups through per-column
  * btree indexes (`packages/sync-engine/src/database/migrations/
  * 0016_add_invoice_indexes.sql:1-2`, `0035_checkout_sessions.sql:66-70`
  * — FK indexes on `customer`, `invoice`, `subscription`). Parquet has
  * no secondary indexes; the lake-native equivalent is file-level
  * min/max skipping, which only helps for columns the data is CLUSTERED
  * on. Sorting by one key gives skipping on that key alone; interleaving
  * the bits of several keys' quantile ranks (a Morton / Z-order curve)
  * gives useful min/max locality on EVERY interleaved column at once —
  * one layout serving several single-column access paths, exactly what
  * the reference's several btrees provide.
  *
  * At 100 TB the scan saving is the whole game: a predicate on the
  * second clustering column prunes ~(1 - 2^-b) of files under Z-order
  * (b = matching rank-prefix bits) versus reading EVERY file under a
  * single-key sort (LayoutSpec proves the gap on real files). Ranks come
  * from `approxQuantile` so skewed columns still fill their 2^bits
  * buckets evenly; the only driver-side state is (2^bits - 1) doubles
  * per column.
  */
object Layout {

  /** Morton z-value of `cols` (long-castable, each already in
    * [0, 2^bits)): bit j of column c lands at result bit
    * j*n + (n-1-c) — columns interleaved MSB-first, earlier columns in
    * the higher bit of each group. Composed purely from codegen'd
    * builtin expressions (shift/and/sum), so it rides whole-stage
    * codegen with no custom kernel. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && bits >= 1 && n * bits <= 63,
      s"zValue: need 1 <= n*bits <= 63, got n=$n bits=$bits")
    val longs = cols.map(_.cast("long"))
    val terms =
      for (j <- 0 until bits; c <- 0 until n)
        yield shiftleft(shiftrightunsigned(longs(c), j).bitwiseAND(lit(1L)),
          j * n + (n - 1 - c))
    terms.reduce(_ + _)
  }

  /** Quantile-rank boundaries for each of `cols`: the 2^bits - 1
    * interior cut points per column, ALL columns in one scan
    * (approxQuantile's multi-column form — at 100 TB the boundary pass
    * is a full-table read, so it must not repeat per column).
    * Driver-side state is (2^bits - 1) doubles per column. */
  def rankBoundaries(df: DataFrame, cols: Seq[String], bits: Int,
                     relativeError: Double = 0.001): Seq[Array[Double]] = {
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    df.stat.approxQuantile(cols.toArray, probs, relativeError)
      .map(_.distinct.sorted).toSeq
  }

  /** z-value over quantile RANKS of `cols` — the production form: each
    * column is first bucketed into 2^bits near-equal-frequency buckets
    * (native binary-search [[QuantileRank]]), so skew in raw values
    * can't collapse the curve onto a few prefixes. */
  def zValueRanked(df: DataFrame, cols: Seq[String], bits: Int): Column =
    zValue(cols.zip(rankBoundaries(df, cols, bits)).map { case (c, bounds) =>
      QuantileRank.quantile_rank(col(c).cast("double"), bounds).cast("long")
    }, bits)

  /** Write `df` as `numFiles` parquet files clustered on the Z-order
    * curve of `cols`: range-partition by z (so each file owns a
    * contiguous curve segment) and sort within partitions (so row-group
    * min/max stay tight inside each file). The helper column never
    * reaches the files. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    bits: Int = 8, numFiles: Int = 32): Unit =
    df.withColumn("__z", zValueRanked(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Single-key clustered write — the baseline layout Z-order is
    * measured against; right when there is exactly one access path. */
  def writeSorted(df: DataFrame, path: String, key: String,
                  numFiles: Int = 32): Unit =
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)
}
