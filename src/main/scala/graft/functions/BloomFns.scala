package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column-level access to Spark's internal bloom-filter expressions
  * (the machinery behind runtime join filtering, which Spark does not
  * expose in the public API or SQL registry). Used for EXPLICIT bloom
  * semi-join reduction: build a compact filter on the (small) dim side,
  * broadcast it, and prune the fact side before the shuffle — at 100 TB
  * this turns a full-fact shuffle into a shuffle of just the matching
  * fraction, with the exact join afterwards removing the bloom's false
  * positives (the final result stays exact).
  *
  * `graft.plans.GraftExtensions` additionally registers both as SQL
  * functions (`bloom_filter_agg`, `might_contain`).
  */
object BloomFns {

  /** Aggregate: build a bloom filter over xxhash64 values. */
  def bloom_filter_agg(hashes: Column, estItems: Long): Column =
    GraftFunctions.toColumn(
      new BloomFilterAggregate(GraftFunctions.toExpression(hashes), estItems)
        .toAggregateExpression())

  /** Aggregate with EXPLICIT bit size: two filters built with the same
    * (estItems, numBits) have identical bit arrays and hash counts, so
    * they are merge-compatible BY CONSTRUCTION — the contract
    * [[graft.streaming.ReplayGuard]] relies on to fold a per-batch
    * filter into its persisted one across sessions (the two-arg form
    * derives numBits from session conf, which may drift). */
  def bloom_filter_agg(hashes: Column, estItems: Long, numBits: Long): Column =
    GraftFunctions.toColumn(
      new BloomFilterAggregate(GraftFunctions.toExpression(hashes),
        Literal(estItems), Literal(numBits))
        .toAggregateExpression())

  /** Membership probe against a built filter (false positives possible,
    * false negatives not). */
  def might_contain(bloom: Column, hash: Column): Column =
    GraftFunctions.toColumn(BloomFilterMightContain(
      GraftFunctions.toExpression(bloom), GraftFunctions.toExpression(hash)))
}
