package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg

/** The incremental-maintenance contract: merging per-batch partial
  * states equals recomputing from all the data — for any split, and
  * (for the distinct sketch) even with overlapping redelivery. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")

  private def data(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(1000).toLong, s"u${rnd.nextInt(200)}"))
      .toDF("g", "v", "u")
  }

  test("merge(state(A), state(B)) == state(A ∪ B) for random 3-way splits") {
    val df = data(1, 2000).cache()
    val parts = Seq(
      df.filter(abs(hash($"u")) % 3 === 0),
      df.filter(abs(hash($"u")) % 3 === 1),
      df.filter(abs(hash($"u")) % 3 === 2))

    val mergedScalar = IncrementalAgg.mergeScalar(keys,
      parts.map(IncrementalAgg.scalarState(_, keys, "v")): _*)
    val fullScalar = IncrementalAgg.scalarState(df, keys, "v")
    assert(mergedScalar.orderBy("g").collect().toSeq ==
      fullScalar.orderBy("g").collect().toSeq)

    val mergedDist = IncrementalAgg.mergeDistinct(keys,
      parts.map(IncrementalAgg.distinctState(_, keys, "u")): _*)
    val fullDist = IncrementalAgg.distinctState(df, keys, "u")
    assert(mergedDist.orderBy("g", "bucket").collect().toSeq ==
      fullDist.orderBy("g", "bucket").collect().toSeq)
  }

  test("distinct state is redelivery-proof; finalize matches one-shot rollup") {
    val df = data(2, 1500).cache()
    val half = df.filter($"v" % 2 === 0)
    // redelivered overlap: half the rows appear in both states
    val overlapped = IncrementalAgg.mergeDistinct(keys,
      IncrementalAgg.distinctState(df, keys, "u"),
      IncrementalAgg.distinctState(half, keys, "u"))
    assert(overlapped.orderBy("g", "bucket").collect().toSeq ==
      IncrementalAgg.distinctState(df, keys, "u")
        .orderBy("g", "bucket").collect().toSeq)

    val fin = IncrementalAgg.finalizeState(
      IncrementalAgg.scalarState(df, keys, "v"),
      IncrementalAgg.distinctState(df, keys, "u"), keys, "d")
    val oneShot = graft.functions.HyperLogLog.approxDistinct(df, keys, "u", "d")
      .join(df.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v")), "g")
    assert(fin.select("g", "n", "sum_v", "min_v", "max_v", "d").orderBy("g")
      .collect().toSeq ==
      oneShot.select("g", "n", "sum_v", "min_v", "max_v", "d").orderBy("g")
        .collect().toSeq)
  }

  test("histogram buckets FLOOR negative values (DuckDB // semantics)") {
    // Spark's DIV truncates toward zero: -5 DIV 10 = 0 would collide
    // with bucket 0 while the oracle floors to -1
    val df = Seq(("g", -5L), ("g", -10L), ("g", 5L)).toDF("g", "v")
    val buckets = IncrementalAgg.histogramState(df, keys, "v", 10L)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(buckets == Map(-1L -> 2L, 0L -> 1L),
      s"expected floor buckets {-1: 2 (-5,-10), 0: 1 (5)}, got $buckets")
  }

  test("histogram state merges exactly and quantiles match the one-shot path") {
    val df = data(7, 3000).cache()
    val parts = Seq(
      df.filter(abs(hash($"u")) % 3 === 0),
      df.filter(abs(hash($"u")) % 3 === 1),
      df.filter(abs(hash($"u")) % 3 === 2))
    val width = 50L

    val merged = IncrementalAgg.mergeHistogram(keys,
      parts.map(IncrementalAgg.histogramState(_, keys, "v", width)): _*)
    val full = IncrementalAgg.histogramState(df, keys, "v", width)
    assert(merged.orderBy("g", "bucket").collect().toSeq ==
      full.orderBy("g", "bucket").collect().toSeq)

    // quantiles off the merged state == quantiles off the full state,
    // and each estimate's bucket really contains the exact percentile
    val qs = Seq(250, 500, 900)
    val est = IncrementalAgg.quantilesFromState(merged, keys, width, qs)
    assert(est.orderBy("g", "quantile_permille").collect().toSeq ==
      IncrementalAgg.quantilesFromState(full, keys, width, qs)
        .orderBy("g", "quantile_permille").collect().toSeq)
    val exact = df.groupBy("g").agg(
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY v)").as("p50"))
      .as[(String, Double)].collect().toMap
    est.filter($"quantile_permille" === 500)
      .select("g", "est_upper").as[(String, Long)].collect()
      .foreach { case (g, upper) =>
        assert(exact(g) <= upper && exact(g) > upper - width,
          s"$g: exact median ${exact(g)} outside bucket (${upper - width}, $upper]")
      }
  }

  test("sample state: merge == one-shot on random splits; replays never bias") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 300L).map(i => (i, s"src${i % 4}"))
    val docs = rows.toDF("doc_id", "source")
    val oneShot = IncrementalAgg.sampleState(docs, "doc_id", 7, Some("source"))
      .as[(String, Long, Long)].collect().toSet
    // exact size per stratum (every stratum has ≥ 7 rows here)
    assert(oneShot.groupBy(_._1).forall(_._2.size == 7))
    for (seed <- Seq(1, 2)) {
      val r2 = new scala.util.Random(seed)
      val tag = rows.map(r => (r._1, r._2, r2.nextInt(3)))
      val parts = (0 until 3).map(p =>
        tag.filter(_._3 == p).map(t => (t._1, t._2)).toDF("doc_id", "source"))
      val states = parts.map(b => IncrementalAgg.sampleState(b, "doc_id", 7, Some("source")))
      // a replayed batch state merged IN TWICE must change nothing
      val merged = IncrementalAgg.mergeSamples("doc_id", 7, Some("source"),
        (states :+ states.head): _*)
        .as[(String, Long, Long)].collect().toSet
      assert(merged == oneShot, s"seed=$seed: incremental sample diverged")
    }
    // global (no stratum) form: distributed top-n, same determinism
    val g1 = IncrementalAgg.sampleState(docs.select("doc_id"), "doc_id", 10)
      .as[(Long, Long)].collect().toSet
    val g2 = IncrementalAgg.mergeSamples("doc_id", 10, None,
      IncrementalAgg.sampleState(docs.filter($"doc_id" < 100).select("doc_id"), "doc_id", 10),
      IncrementalAgg.sampleState(docs.filter($"doc_id" >= 100).select("doc_id"), "doc_id", 10))
      .as[(Long, Long)].collect().toSet
    assert(g1 == g2 && g1.size == 10)
  }
}
