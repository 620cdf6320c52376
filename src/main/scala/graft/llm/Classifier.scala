package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the "quality classifier" stage of the
  * public LLM data recipes (GPT-3 trained a classifier on WebText-vs-CC,
  * CCNet/LLaMA a fastText model on Wikipedia-vs-CC) in its closed-form
  * Naive Bayes / linear shape: token log-likelihood-ratio weights
  * trained from a labeled split of the corpus itself, applied to every
  * document as a mean-log-ratio score. The heuristic filters
  * ([[TextAnalysis.gopherRules]], [[TextAnalysis.gopherRepetition]])
  * catch structure; this catches DISTRIBUTION — a fluent doc whose
  * vocabulary looks like the reference class scores high even when no
  * single rule fires.
  *
  * Determinism contract: weights are the log2-floor-quantized Laplace
  * ratio (the [[Corpus.dsirWeights]] `bin()`-length trick), with the
  * class-prior correction folded in as a per-corpus scalar — every
  * intermediate is BIGINT, so scores hash-match a DuckDB oracle exactly.
  */
object Classifier {

  /** Per-document Naive-Bayes quality score and keep flag.
    *
    * Training: `goodPred` labels the reference class (the "Wikipedia"
    * side — here typically a curated source set). Token weight
    *   w(t) = qlog2((c_g(t)+1)·2^20 / (c_b(t)+1)) + PRIOR,  where
    *   qlog2(x) = length(bin(x)) − 21  (floor-log2 at 2^20 scale) and
    *   PRIOR   = qlog2((T_b+V)·2^20 / (T_g+V))
    * — the quantized log P(t|good)/P(t|bad) with Laplace smoothing; the
    * class-size normalization rides as one scalar (computed driver-side
    * in BigInt, overflow-free at any corpus size; the per-token product
    * stays < 2^63 for class counts up to 2^42). Floor-log2 of each
    * factor separately is within ±1 bit of the joint log — documented
    * quantization, exact cross-engine.
    *
    * Scoring: score_mbits = mean weight per token occurrence in
    * milli-bits; the sum can be negative, and both engines TRUNCATE
    * integer division toward zero (Spark `DIV`, DuckDB `//`), so the
    * plain quotient is cross-engine exact. kept = score ≥
    * `minScoreMbits`.
    *
    * Shape: one token scan staged once (feeds the count aggregate AND
    * the scoring join), one vocab-keyed aggregate (map-side combined,
    * Zipf-small output), a 1-row totals collect (the KMeans pattern),
    * and a doc-keyed score aggregate. `broadcastVocab=true` broadcasts
    * the weight table (right for bounded vocabularies); at web scale
    * raw-token vocab has a heavy typo tail — pass false and the scoring
    * join becomes a shuffled equi-join co-partitioned with the token
    * explode. */
  def nbQualityScores(docs: DataFrame, goodPred: Column,
                      minScoreMbits: Long = 0L,
                      broadcastVocab: Boolean = true): DataFrame = {
    val toks = Stage(docs.select(col("doc_id"), goodPred.as("is_good"),
      explode(split(col("text"), " ")).as("tok")))
    val counts = toks.groupBy("tok").agg(
      count(when(col("is_good"), 1)).as("c_g"),
      count(when(!col("is_good"), 1)).as("c_b"))
    val w = weightsFromCounts(counts).select("tok", "w_bits")
    scoreTokens(toks, w, minScoreMbits, broadcastVocab)
  }

  /** shared scoring tail: weight join → doc aggregate → mean milli-bits
    * → keep flag. ONE owner, so train-time ([[nbQualityScores]]) and
    * deploy-time ([[scoreWithWeights]]) scores cannot diverge.
    *
    * Every input doc gets an EXPLICIT output row: a document whose
    * every token is out-of-vocabulary (possible only on the deploy
    * path, where the scored corpus can outrun the training vocab)
    * scores 0 — no evidence either way, the NB neutral — and takes the
    * same threshold decision as any other doc. The earlier inner-join
    * form emitted NO row for such docs: neither kept nor rejected, and
    * silently dropped by any pipeline composing keep-filters by
    * doc_id join. `n_tokens` counts IN-VOCAB occurrences (0 for an
    * all-OOV doc), unchanged. */
  private def scoreTokens(toks: DataFrame, weights: DataFrame,
                          minScoreMbits: Long,
                          broadcastVocab: Boolean): DataFrame = {
    val wSide = if (broadcastVocab) broadcast(weights) else weights
    val scored = toks.join(wSide, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w_bits").cast("long").as("sum_bits"))
      .withColumn("score_mbits", expr("(sum_bits * 1000) DIV n_tokens"))
    toks.select("doc_id").distinct().join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        coalesce(col("score_mbits"), lit(0L)).as("score_mbits"))
      .withColumn("kept", (col("score_mbits") >= lit(minScoreMbits)).cast("long"))
      .select("doc_id", "n_tokens", "sum_bits", "score_mbits", "kept")
  }

  // --- incremental training (the IncrementalAgg pattern) -----------------

  /** Mergeable NB training state: per-token class counts (tok, c_g,
    * c_b). Counts are associative sums, so
    * merge(state(A), state(B)) == state(A ∪ B) EXACTLY — the classifier
    * retrains as the corpus grows without rescanning history (the q93 /
    * q101 maintenance guarantee applied to model training). One token
    * scan + one vocab-keyed map-side-combined aggregate per batch. */
  def countState(docs: DataFrame, goodPred: Column): DataFrame =
    docs.select(goodPred.as("is_good"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(
        count(when(col("is_good"), 1)).as("c_g"),
        count(when(!col("is_good"), 1)).as("c_b"))

  /** Fold state B into state A: per-token sum of the class counts.
    * Shuffle is vocab-bounded (Zipf-small), never corpus-bounded. */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("tok")
      .agg(sum("c_g").as("c_g"), sum("c_b").as("c_b"))

  /** Derive the weight table from a count state: (tok, c_g, c_b,
    * w_bits) with the quantized log-ratio + prior of
    * [[nbQualityScores]]. Totals collect as one row (the KMeans
    * pattern); the prior rides as a BigInt driver scalar. */
  def weightsFromCounts(counts: DataFrame): DataFrame = {
    val c = Stage(counts)
    val t = c.agg(sum("c_g").cast("long"), sum("c_b").cast("long"),
      count(lit(1))).head()
    require(!t.isNullAt(0) && !t.isNullAt(1) && t.getLong(0) > 0 && t.getLong(1) > 0,
      "classifier training needs at least one token in each class")
    val (tg, tb, v) = (t.getLong(0), t.getLong(1), t.getLong(2))
    // max(_, 1): length(bin(0)) is 1, BigInt(0).bitLength is 0 — the
    // zero-quotient case (one class > 2^20x the other) must still
    // mirror the oracle's bin()-length exactly
    val q = ((BigInt(tb) + v) * 1048576L) / (BigInt(tg) + v)
    val prior = math.max(q.bitLength, 1) - 21
    c.withColumn("w_bits",
      expr("CAST(length(bin(((c_g + 1) * 1048576) DIV (c_b + 1))) AS BIGINT)" +
        s" - 21 + ${prior}L"))
  }

  /** Score a corpus with an ALREADY-TRAINED weight table — the deploy
    * half (train on the labeled reference split once, apply to any
    * corpus; tokens absent from the vocabulary contribute nothing, and
    * a doc with NO in-vocab token scores an explicit 0 — see
    * [[scoreTokens]]). Same shapes and flags as [[nbQualityScores]]. */
  def scoreWithWeights(docs: DataFrame, weights: DataFrame,
                       minScoreMbits: Long = 0L,
                       broadcastVocab: Boolean = true): DataFrame =
    scoreTokens(
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok")),
      weights.select("tok", "w_bits"), minScoreMbits, broadcastVocab)
}
