package graft

import org.apache.spark.sql.functions._
import graft.functions.GramCounts._
import graft.functions.TokenNgrams.token_ngrams

/** Edge semantics of the native gram-count expressions (the round-10
  * replacements for the interpreted HOF folds) — the oracle queries pin
  * corpus-level behavior; this pins the boundaries: empty text, text
  * shorter than n, all-duplicate text, overlapping and adjacent spans. */
class GramCountsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).head().getAs[T]("v")

  test("max_multiplicity counts the most frequent element; empty array is 0") {
    assert(one[Long](max_multiplicity(split(col("text"), " ")), "a b a c a") == 3L)
    assert(one[Long](max_multiplicity(split(col("text"), " ")), "x") == 1L)
    // token_ngrams of a too-short doc is the empty array
    assert(one[Long](max_multiplicity(token_ngrams(col("text"), 3)), "a b") == 0L)
  }

  test("duplicated_strings emits each ≥2-count value once, ascending") {
    val got = one[scala.collection.Seq[String]](
      duplicated_strings(split(col("text"), " ")), "b a b c a b z")
    assert(got.toSeq == Seq("a", "b"), got.toString)
    assert(one[scala.collection.Seq[String]](
      duplicated_strings(split(col("text"), " ")), "a b c").isEmpty)
  }

  test("dup_span_coverage: overlap counted once; sentinel for too-short docs") {
    // "a b a b a b": dup bigrams "a b" (x3? occurrences at 0,2,4... with
    // overlaps) and "b a" (0-based starts 1,3) — every position is a
    // duplicated bigram start except none excluded → all 6 tokens covered
    assert(one[Long](dup_span_coverage(col("text"), 2), "a b a b a b") == 6L)
    // disjoint dup spans: "x y ... x y" covers 4 of 6
    assert(one[Long](dup_span_coverage(col("text"), 2), "x y q w x y") == 4L)
    // no duplicates → zero coverage
    assert(one[Long](dup_span_coverage(col("text"), 2), "a b c d") == 0L)
    // shorter than n → the −1 sentinel
    assert(one[Long](dup_span_coverage(col("text"), 5), "a b c") == -1L)
  }

  test("remove_covered_tokens + covered_count agree with the span union") {
    val df = Seq(("a b c d e f", Seq(1, 2))).toDF("text", "s")
    // spans [1,3) and [2,4) merge to [1,4): keep tokens 0, 4, 5
    val r = df.select(
      remove_covered_tokens(col("text"), col("s"), 2).as("clean"),
      covered_count(col("s"), 2).as("n")).head()
    assert(r.getString(0) == "a e f")
    assert(r.getLong(1) == 3L)
    // adjacent spans: [0,2) + [2,4) = 4 covered, none double-counted
    val adj = Seq(("a b c d e", Seq(0, 2))).toDF("text", "s")
      .select(remove_covered_tokens(col("text"), col("s"), 2).as("clean"),
        covered_count(col("s"), 2).as("n")).head()
    assert(adj.getString(0) == "e" && adj.getLong(1) == 4L)
    // empty starts: everything kept, nothing counted
    val none = Seq(("a b", Seq.empty[Int])).toDF("text", "s")
      .select(remove_covered_tokens(col("text"), col("s"), 2).as("clean"),
        covered_count(col("s"), 2).as("n")).head()
    assert(none.getString(0) == "a b" && none.getLong(1) == 0L)
  }
}
