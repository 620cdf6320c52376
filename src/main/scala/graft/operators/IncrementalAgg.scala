package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HyperLogLog

/** Incremental aggregate maintenance — algebraic partial states that
  * merge across batches so rollups are MAINTAINED, never recomputed
  * from raw data.
  *
  * The reference recomputes its analytics straight off the mirror on
  * every query (SURVEY §2.9 — the Postgres mirror IS the serving
  * layer); at mirror scale that's fine, at 100 TB a `GROUP BY` over
  * raw history per dashboard refresh is the anti-pattern. The state
  * here is a tiny keyed table per rollup: count/sum/min/max are
  * trivially algebraic, and approximate distinct rides the
  * [[graft.functions.HyperLogLog]] register table, whose merge is
  * max-per-bucket — so `merge(state(A), state(B)) == state(A ∪ B)`
  * EXACTLY (IncrementalAggSpec proves value equality, and q93 proves
  * it against the oracle's full-rescan aggregate). Each incoming batch
  * touches only its own rows plus the state table; raw history is
  * never re-read.
  *
  * sum is maintained over caller-scaled BIGINT (micros), keeping the
  * merge order-independent — a double sum would make merged and
  * rescanned states differ in low bits.
  */
object IncrementalAgg {

  /** Scalar state of one batch: (keys..., n, sum_v, min_v, max_v) over
    * a long-valued column. */
  def scalarState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.head, keys.tail: _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge scalar states (any number, any grouping of the data into
    * batches): counts and sums add, bounds take min/max. Keys present
    * in only one state pass through untouched. */
  def mergeScalar(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.head, keys.tail: _*)
      .agg(sum("n").as("n"),
        sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"),
        max("max_v").as("max_v"))

  /** Distinct-count state of one batch: the HLL register table. */
  def distinctState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    HyperLogLog.registers(df, keys, valueCol)

  /** Merge distinct-count states; overlapping batches are safe (max is
    * idempotent — at-least-once delivery cannot inflate the estimate). */
  def mergeDistinct(keys: Seq[String], states: DataFrame*): DataFrame =
    HyperLogLog.mergeRegisters(keys, states: _*)

  /** Final rollup row per key from the two state tables. */
  def finalizeState(scalar: DataFrame, distinct: DataFrame, keys: Seq[String],
                    distinctAlias: String): DataFrame =
    scalar.join(HyperLogLog.estimate(distinct, keys, distinctAlias), keys)

  /** Quantile state of one batch: per (keys, bucket = v DIV width)
    * count — a fixed-width histogram, the mergeable form of
    * [[graft.llm.Corpus.histogramQuantiles]]. State size per key is
    * bounded by the value range over the width, independent of row
    * count, and the merge (sum per bucket) is exact and
    * order-independent: merge(state(A), state(B)) == state(A ∪ B) for
    * ANY batch split, so maintained percentile dashboards never re-read
    * raw history. */
  def histogramState(df: DataFrame, keys: Seq[String], valueCol: String,
                     width: Long): DataFrame =
    df.select(keys.map(col) :+ col(valueCol).cast("long").as("__v"): _*)
      // FLOOR division, not Spark's toward-zero DIV: for negative values
      // DIV would send -5 to bucket 0 while DuckDB's // floors to -1 —
      // bucket edges must mean [b·w, (b+1)·w) for every sign or the
      // oracle hash-match (and est_upper) silently breaks on negatives
      .withColumn("bucket",
        expr(s"__v DIV $width - (CASE WHEN __v % $width < 0 THEN 1 ELSE 0 END)"))
      .groupBy("bucket", keys: _*)
      .agg(count(lit(1)).as("n"))

  /** Merge histogram states: counts add per (keys, bucket). */
  def mergeHistogram(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy("bucket", keys: _*)
      .agg(sum("n").as("n"))

  /** Uniform-sample state: an EXACT-SIZE uniform-without-replacement
    * sample of everything ever ingested, maintained incrementally — the
    * streaming "reservoir" in its deterministic, mergeable form. Every
    * row ranks by a fixed modular hash of its id; the sample IS the n
    * smallest (rank, id) rows, so
    *   merge(state(A), state(B)) = topN(dedup(state(A) ∪ state(B)))
    * equals state(A ∪ B) EXACTLY for any batch split — the sample over
    * an unbounded stream costs O(batch + n) per batch and never
    * re-reads history. Replay-safe: a redelivered id collapses in the
    * dedup (idempotent, like the HLL max-merge). Uniformity is the
    * usual hash argument — the rank is a fixed pseudo-random
    * permutation of the id space — and, unlike `rand()` reservoirs,
    * the result is deterministic (same corpus, same sample, any batch
    * order) and oracle-replayable: plain modular arithmetic, no engine
    * hash (q142). The multiplier stays below 2³⁰ so
    * (id mod p)·a never overflows BIGINT on either engine.
    *
    * `stratum = Some(col)` keeps n PER STRATUM via per-group rank
    * windows (the scalable form — no global order); the global form
    * is a distributed top-n (TakeOrdered), never a full sort. */
  def sampleState(df: DataFrame, idCol: String, n: Int,
                  stratum: Option[String] = None): DataFrame =
    sampleStateKeys(df, idCol, n, stratum.toSeq)

  /** Merge sample states (any number, any split, overlaps safe). */
  def mergeSamples(idCol: String, n: Int, stratum: Option[String],
                   states: DataFrame*): DataFrame =
    mergeSamplesKeys(idCol, n, stratum.toSeq, states: _*)

  /** Multi-key strata form: n exemplars PER key combination (the
    * rollup-store shape — same determinism and merge law). `idCol`
    * must be integral: the rank is modular arithmetic over it. */
  def sampleStateKeys(df: DataFrame, idCol: String, n: Int,
                      keys: Seq[String]): DataFrame =
    sampleTopN(
      df.select(keys.map(col) :+ col(idCol): _*)
        .withColumn("rank", expr(
          s"(($idCol % 4294967311) * 1103515245 + 12345) % 4294967311")),
      idCol, n, keys)

  def mergeSamplesKeys(idCol: String, n: Int, keys: Seq[String],
                       states: DataFrame*): DataFrame =
    sampleTopN(states.reduce(_ unionByName _), idCol, n, keys)

  private def sampleTopN(ranked: DataFrame, idCol: String, n: Int,
                         keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deduped = ranked.dropDuplicates(keys :+ idCol)
    if (keys.nonEmpty) {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("rank"), col(idCol))
      deduped.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= n).drop("__rn")
    } else
      deduped.orderBy(col("rank"), col(idCol)).limit(n)
  }

  /** Per-key quantile estimates read off a (merged) histogram state:
    * for each requested permille q, the upper edge of the smallest
    * bucket whose cumulative count reaches ceil(q·N/1000) — integer
    * comparison `cum·1000 ≥ N·q`, no division, engine-portable. The
    * state is already aggregated (tiny vs raw data), so the window +
    * min-bucket aggregate cost is per-key-histogram, not per-row. */
  def quantilesFromState(state: DataFrame, keys: Seq[String], width: Long,
                         quantilesPermille: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = keys.map(col)
    val wCum = Window.partitionBy(keyCols: _*).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(keyCols: _*)
    state
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("n_total", sum("n").over(wTot))
      .withColumn("quantile_permille",
        explode(array(quantilesPermille.map(q => lit(q.toLong)): _*)))
      .filter(col("cum") * 1000 >= col("n_total") * col("quantile_permille"))
      .groupBy("quantile_permille", keys: _*)
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("est_upper", (col("bucket") + 1) * width - 1)
      .drop("bucket")
  }
}
