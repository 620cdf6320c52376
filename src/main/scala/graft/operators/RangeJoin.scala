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
    * hi-lo ≤ maxSpanBuckets·bucketWidth (enforced inside the operator). */
  /** An interval spanning more than `maxSpanBuckets` buckets fails the
    * run with an explicit error instead of silently multiplying the row
    * count (each overlapped bucket emits a copy of its row). Helper
    * columns are prefixed `__graft_rj_` and rejected if the inputs
    * already use those names.
    *
    * NULL lo/hi intervals are DROPPED before the span check: a NULL
    * bound can never satisfy `ord >= lo && ord <= hi` (the predicate is
    * NULL), so dropping them reproduces what the inner join would do
    * anyway — without the NULL span expression falling into the
    * span-violation `raise_error` branch and failing the job. */
  def bucketedIntervalJoin(left: DataFrame, right: DataFrame,
                           lo: Column, hi: Column, ord: Column,
                           bucketWidth: Long,
                           maxSpanBuckets: Long = 64): DataFrame = {
    val (cLo, cHi, cBkt, cOrd, cBktR) = ("__graft_rj_lo", "__graft_rj_hi",
      "__graft_rj_bkt", "__graft_rj_ord", "__graft_rj_bkt_r")
    val reserved = Seq(cLo, cHi, cBkt, cOrd, cBktR)
    require((left.columns ++ right.columns).intersect(reserved).isEmpty,
      s"input columns collide with reserved ${reserved.mkString(", ")}")
    // DIV (not /): epoch-ns values exceed 2^53, double division would
    // corrupt bucket ids.
    val l = left.filter(lo.isNotNull && hi.isNotNull)
      .withColumn(cLo, lo.cast("long")).withColumn(cHi, hi.cast("long"))
      .withColumn(cBkt, explode(sequence(
        when(expr(s"$cHi DIV $bucketWidth - $cLo DIV $bucketWidth") <= maxSpanBuckets,
          expr(s"$cLo DIV $bucketWidth"))
          .otherwise(raise_error(concat(
            lit("bucketedIntervalJoin: interval ["),
            col(cLo), lit(","), col(cHi),
            lit(s"] spans more than $maxSpanBuckets buckets of width $bucketWidth")))),
        expr(s"$cHi DIV $bucketWidth"))))
    val r = right.withColumn(cOrd, ord.cast("long"))
      .withColumn(cBktR, expr(s"$cOrd DIV $bucketWidth"))
    l.join(r, col(cBkt) === col(cBktR)
        && col(cOrd) >= col(cLo) && col(cOrd) <= col(cHi))
      .drop(cBkt, cBktR, cLo, cHi, cOrd)
  }
}
