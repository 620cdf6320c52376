package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval / range join: pair left rows with right rows of the same key
  * whose ordering value falls in [left.lo, left.hi].
  *
  * Physical shape: equi-join on the key columns (shuffle or broadcast —
  * Catalyst's choice), with the range predicate applied as a join
  * condition so it filters *during* the join, not after materializing
  * the per-key cross product... which is the best Spark can do for a
  * keyed interval join without a custom physical operator. At 100 TB the
  * keyed form is fine when per-key groups are bounded (events per user);
  * for UNkeyed interval joins, add a coarse bucket key first
  * ([[bucketedIntervalJoin]]) so the join is an equi-join on the bucket
  * and each row only meets candidates in overlapping buckets — that is
  * the standard distributed range-join decomposition.
  */
object RangeJoin {

  /** Keyed interval join. `lo`/`hi` are columns of `left`; `ord` of
    * `right`. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   lo: Column, hi: Column, ord: Column): DataFrame = {
    val cond = keys.map(k => left(k) === right(k)).reduce(_ && _) &&
      ord >= lo && ord <= hi
    left.join(right, cond)
  }

  /** Unkeyed (or weakly keyed) interval join at scale: quantize the
    * ordering dimension into buckets of `bucketWidth`; a right row at
    * ord=v lands in bucket v/width, a left interval [lo,hi] is exploded
    * to every bucket it overlaps, and the join becomes an equi-join on
    * the bucket id + the exact range predicate. Shuffle is then keyed by
    * (bucket), so candidate pairs are bounded by bucket co-residency
    * instead of the full cross product. Intervals must satisfy
    * hi-lo ≤ maxSpanBuckets·bucketWidth (enforced by the caller). */
  def bucketedIntervalJoin(left: DataFrame, right: DataFrame,
                           lo: Column, hi: Column, ord: Column,
                           bucketWidth: Long): DataFrame = {
    // DIV (not /): epoch-ns values exceed 2^53, double division would
    // corrupt bucket ids.
    val l = left.withColumn("_lo", lo.cast("long")).withColumn("_hi", hi.cast("long"))
      .withColumn("_bkt", explode(sequence(
        expr(s"_lo DIV $bucketWidth"), expr(s"_hi DIV $bucketWidth"))))
    val r = right.withColumn("_ord", ord.cast("long"))
      .withColumn("_bkt_r", expr(s"_ord DIV $bucketWidth"))
    l.join(r, col("_bkt") === col("_bkt_r")
        && col("_ord") >= col("_lo") && col("_ord") <= col("_hi"))
      .drop("_bkt", "_bkt_r", "_lo", "_hi", "_ord")
  }
}
