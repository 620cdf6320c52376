package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Corpus-construction operators for a training-data pipeline: TF-IDF
  * term scoring, vocabulary building, deterministic sampling, length
  * histograms, and sequence packing.
  *
  * Determinism contract (same as [[TextAnalysis]]): integer arithmetic
  * only (ppm scaling, DIV), so every output hash-matches a DuckDB
  * oracle. Scale notes per operator.
  */
object Corpus {

  private def words(text: Column): Column = split(text, " ")

  /** The engine-portable uniform fold ((x pmod 1000000007) · 2654435761)
    * mod 1000000007 ∈ [0, 1000000007) — pmod-first so the multiply
    * cannot overflow on 2^63-range ids (Spark would wrap silently; the
    * DuckDB oracle would error) AND the result is non-negative for
    * NEGATIVE keys too (`%` keeps the dividend's sign; a negative fold
    * would pin weighted-sample priorities the same way u = 0 did). ONE
    * owner: every sampling/split operator and its oracle must stay
    * bit-identical to this expression — the oracles write plain `%`,
    * identical to pmod for the non-negative ids the fixtures hold. */
  private def portableFold(c: Column): Column =
    (pmod(c, lit(1000000007L)) * lit(2654435761L)) % lit(1000000007L)

  /** Top-k terms per document by integer TF-IDF score
    * tf · 1e6 · N DIV df (a log-free idf: rarer term ⇒ larger score;
    * monotone in the classic tf·log(N/df), and exact in BIGINT).
    * Ties break on term ascending.
    *
    * Shape: explode → (doc,term) counts → df per term (map-side combined
    * aggregate) → join back → per-doc top-k window. The df table is
    * vocabulary-sized (≪ corpus) and the join key is the term — at
    * 100 TB broadcast the df table if the vocabulary fits, else it is
    * one hash join keyed by term. */
  def tfIdfTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct("doc_id").as("n_docs"))
    val scored = tf.join(df_, "term").crossJoin(broadcast(n))
      // DECIMAL(38,0) intermediate: tf·1e6·n_docs overflows BIGINT once
      // tf·n_docs ≳ 9.2e12 (a 10^9-doc corpus with tf 10^4); the wide
      // product then floor-divides exactly. The oracle mirrors this with
      // a HUGEINT cast. The RESULT must still fit in BIGINT — true
      // whenever df ≳ tf·n_docs/9.2e12, i.e. for every non-vanishing df.
      .withColumn("score",
        expr("CAST(tf AS DECIMAL(38,0)) * 1000000 * n_docs DIV df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("score").cast("long").as("score"), col("rnk"))
  }

  /** BM25 ranked retrieval (Robertson/Spärck Jones; k1 = 1.2, b = 0.75)
    * — the lexical ranker next to [[tfIdfTopK]]'s per-doc term scoring:
    * score(q, D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl)),
    * idf(t) = (N−df+½)/(df+½) (log-free Robertson idf: monotone in the
    * classic form, exact in integers).
    *
    * Every term score is ONE integer division of exact products —
    * clearing denominators with T = total corpus tokens (avgdl = T/N):
    *   denom·10T = 10T·tf + 3T + 9·dl·N,   numer·10T = 22T·tf
    *   idf as a rational: (2(N−df)+1) / (2df+1)
    *   score_ppm = (2(N−df)+1)·22·T·tf·1e6 DIV ((2df+1)·(10T·tf+3T+9·dl·N))
    * in DECIMAL(38,0) (the oracle mirrors with HUGEINT), so per-term
    * scores are cross-engine exact BIGINTs and the per-query sum is an
    * order-free integer sum.
    *
    * Shape: tokens semi-join the (tiny, broadcast) query-term set BEFORE
    * the tf aggregate, so the shuffle carries only matching terms; df
    * comes from the same restricted tf table (df = docs containing t —
    * restriction keeps it exact); doc lengths and the 1-row (N, T)
    * globals join back broadcast. Final top-k is a per-query rank
    * window. At 100 TB: one corpus scan, aggregates keyed by term /
    * (doc, term), no all-pairs anything. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
    val qterms = broadcast(queries.select("term").distinct())
    val tf = toks.join(qterms, "term")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = docs.select(col("doc_id"), size(words(col("text"))).cast("long").as("dl"))
    val globals = docs.select(count(lit(1)).as("n_docs"),
      sum(size(words(col("text"))).cast("long")).as("t_tokens"))
    bm25FromStats(tf, dl, globals, queries, k)
  }

  /** The BM25 scorer over its SUFFICIENT STATISTICS — shared by the
    * one-shot [[bm25TopK]] and the maintained-state server
    * ([[graft.streaming.Bm25Ingest]]), which is the whole point of the
    * split: every input is a mergeable count, so ranked retrieval can
    * serve off maintained state without rescanning the corpus.
    * `tf` must already be restricted to the query's terms (doc_id,
    * term, tf); df derives from it (df(t) = docs containing t — the
    * restriction keeps it exact); `dl` is (doc_id, dl) for at least the
    * tf docs; `globals` is the 1-row (n_docs, t_tokens). */
  private[graft] def bm25FromStats(tf: DataFrame, dl: DataFrame,
                                   globals: DataFrame, queries: DataFrame,
                                   k: Int): DataFrame =
    bm25FromStatsDl(tf.join(dl, "doc_id"), globals, queries, k)

  /** [[bm25FromStats]] with the doc length already ON the tf rows —
    * the denormalized-postings serving path
    * ([[graft.streaming.Bm25Ingest]]) skips the doclen join entirely:
    * at corpus scale that join shuffles one row per document ever
    * indexed just to fetch a constant the posting can carry. */
  private[graft] def bm25FromStatsDl(tfDl: DataFrame, globals: DataFrame,
                                     queries: DataFrame, k: Int): DataFrame = {
    val df_ = tfDl.groupBy("term").agg(count(lit(1)).as("df"))
    val termScore = tfDl.join(broadcast(df_), "term")
      .crossJoin(broadcast(globals))
      // every grouped product must enter DECIMAL(38,0) BEFORE it can
      // exceed Long range: the denominator's 10·T·tf term passes 2^63
      // at corpus tokens T ~ 1e13 with tf ~ 1e5 — exactly the regime
      // the exactness claim covers — and a Long-typed subgroup would
      // wrap (legacy) or throw (ANSI) before the outer cast applied
      .withColumn("score", expr(
        """CAST((2*(n_docs - df) + 1) AS DECIMAL(38,0)) * 22 * t_tokens * tf * 1000000
          | DIV (CAST((2*df + 1) AS DECIMAL(38,0))
          |      * (CAST(10 AS DECIMAL(38,0))*t_tokens*tf
          |         + CAST(3 AS DECIMAL(38,0))*t_tokens
          |         + CAST(9 AS DECIMAL(38,0))*dl*n_docs))"""
          .stripMargin.replace("\n", "")))
    val perQuery = broadcast(queries).join(termScore, "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("score")).cast("long").as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    perQuery.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "doc_id", "score", "rnk")
  }

  /** Adjacent-pair column over a segmentation array, keyed
    * "lhs rhs" (single space — the one character no segment can
    * contain, so the key splits back losslessly). Implemented as the
    * codegen'd [[graft.functions.TokenNgrams]] over the space-joined
    * segments (segments are space-free, so the join/split round-trip
    * is lossless and bigrams of the joined string ARE the adjacent
    * pairs — empty segments included: they contribute zero bytes
    * between two delimiters and split(-1) keeps them); the former
    * `transform(sequence(...))` was CodegenFallback, interpreted per
    * token in the per-round count job. <2 segments → empty array on
    * both forms.
    *
    * PRECONDITION (shared with [[applyMerge]]): segment elements are
    * NON-NULL, as every producer in this engine guarantees (split()
    * never yields null elements). array_join SKIPS nulls, so a null
    * element would make its neighbors look adjacent where the old
    * transform/aggregate forms propagated null — if a future producer
    * can emit null segments, filter them before calling. */
  private def adjacentPairs(seg: Column): Column =
    graft.functions.TokenNgrams.token_ngrams(array_join(seg, " "), 2)

  /** One BPE merge applied left-to-right greedy (the standard
    * non-overlapping rule: "a a a" under merge(a,a) → ["a~a", "a"]).
    *
    * Implemented as WHOLE-STAGE-CODEGEN string ops instead of the
    * earlier `aggregate` array fold: higher-order functions are
    * CodegenFallback (interpreted lambda per element, a fresh array
    * copy per token — measured 1.2–1.6 s per staged merge round at
    * sf0.1, ~90 % of BPE training wall). The tokens are joined with a
    * TWO-space delimiter and flanked by one space, so the pattern
    * " lhs  rhs " is delimiter-anchored on both sides and
    * `replace` — which substitutes non-overlapping occurrences left to
    * right — IS the greedy rule: after " a  a " matches in
    * " a  a  a  a ", the scan resumes at the next token's own leading
    * space, so runs merge at alternating positions exactly like the
    * fold ("a a a a" → ["a~a", "a~a"], "a a a" → ["a~a", "a"]).
    * Segments cannot contain a space (the key contract above), so the
    * delimiter never collides with token bytes; empty-string tokens
    * keep the convention (they contribute zero bytes between two
    * delimiters) and CorpusOpsSpec pins fold-equality on them. */
  private def applyMerge(seg: Column, lhs: String, rhs: String,
                         sep: String): Column =
    // the space-anchored pattern below needs NON-EMPTY, space-free
    // tokens to align on token boundaries; an empty lhs/rhs (a corpus
    // of empty-string segments — double spaces in the raw text) makes
    // the pattern all-spaces and ambiguous, so that degenerate pair
    // keeps the exact fold (CorpusOpsSpec pins equality on both paths)
    if (lhs.isEmpty || rhs.isEmpty || lhs.contains(" ") ||
        rhs.contains(" ") || sep.contains(" "))
      aggregate(seg, array().cast("array<string>"),
        (acc, x) =>
          when(size(acc) > 0 &&
               element_at(acc, -1) === lit(lhs) && x === lit(rhs),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(lit(lhs + sep + rhs))))
          .otherwise(concat(acc, array(x))))
    else {
      val joined = concat(lit(" "), array_join(seg, "  "), lit(" "))
      val merged = replace(joined,
        lit(s" $lhs  $rhs "), lit(s" $lhs$sep$rhs "))
      val trimmed = merged.substr(lit(2), length(merged) - 2)
      when(size(seg) <= 0, seg)
        .otherwise(split(trimmed, java.util.regex.Pattern.quote("  "), -1))
    }

  /** BPE-style merge learning (Sennrich et al. 2016) over ANY initial
    * segmentation: nMerges rounds of [count adjacent pairs → take the
    * global argmax (ties on pair string ascending) → fuse that pair
    * everywhere, left-to-right greedy]. Word-level segments learn
    * phrase merges; character-level segments give classic BPE
    * (CorpusOpsSpec runs the canonical char-level example).
    *
    * Returns the merge table (rank, lhs, rhs, pair_cnt) — the trained
    * tokenizer artifact; [[mergeApply]] replays it over a corpus.
    *
    * Scale shape: each round is one explode + one map-side-combined
    * count aggregate + a 1-ROW collect (the argmax — the KMeans
    * driver-side pattern, k rows total over the whole run) + one
    * narrow fold, with the segmentation re-staged per round so round
    * i's plan does not re-run rounds 0..i−1. Vocabulary training at
    * 100 TB runs on a sample (as every production tokenizer does);
    * full-corpus APPLICATION is [[mergeApply]]'s nMerges narrow folds
    * at scan speed.
    *
    * One trainer core: this is [[mergeTrainBatched]] at batchSize = 1
    * — a 1-slot batch has no token-exclusion filter and one argmax per
    * round, i.e. exactly the sequential algorithm (CorpusOpsSpec pins
    * the equality), so the argmax/fold machinery lives in one place. */
  def mergeTrain(segs: DataFrame, nMerges: Int,
                 sep: String = "~"): DataFrame =
    mergeTrainBatched(segs, nMerges, batchSize = 1, sep = sep)

  /** MULTI-MERGE BPE training (the SentencePiece/YouTokenToMe batching):
    * per corpus scan, select up to `batchSize` NON-CONFLICTING merges —
    * greedy by (cnt DESC, pair ASC), skipping any pair sharing a token
    * (lhs or rhs) with an earlier pick in the batch — and apply them in
    * ONE staged pass. Token-disjoint merges have INVARIANT pair counts
    * under each other (merging "a b" elsewhere can neither create nor
    * destroy a "c d" adjacency when {a,b} ∩ {c,d} = ∅ and the product
    * "a~b" is a token no counted pair can contain), so within a batch
    * each pick is exactly what a re-count would have ranked first among
    * token-disjoint candidates. Training cost drops from nMerges corpus
    * scans ([[mergeTrain]]'s one job chain per merge) to
    * ceil(nMerges/batchSize) — the per-batch argmax re-reads the SMALL
    * staged pair-count table, not the corpus.
    *
    * Equality contract vs the sequential trainer: identical merge
    * tables whenever no batch-applied merge creates a NEW pair whose
    * count beats the batch's next pick (CorpusOpsSpec asserts equality
    * on such corpora and pins the documented divergence case).
    *
    * Ranks are SLOT ids (round·batchSize + pick) so the DuckDB oracle
    * ([[mergeTrainBatchedSql]]) can replay them with a static unroll;
    * a round that finds fewer than batchSize disjoint pairs leaves a
    * rank gap (degenerate corpora only — every remaining pair shares a
    * token with a pick). */
  /** One BPE round's adjacent-pair count frame over the (staged)
    * current segmentation — THE per-round corpus-scale job of the
    * trainer, factored out so plan evidence can explain exactly the
    * frame the training loop collects (round-15 ADVICE: explaining the
    * trainer's RETURN value shows a driver-side LocalTableScan and
    * proves nothing about the count plan). Consumed once per round by
    * the top-K collect, so it is deliberately not staged. */
  private[graft] def pairCountFrame(segs: DataFrame): DataFrame =
    segs.select(explode(adjacentPairs(col("seg"))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .select(col("pair"), col("cnt"),
        expr("split_part(pair, ' ', 1)").as("lhs"),
        expr("split_part(pair, ' ', 2)").as("rhs"))

  def mergeTrainBatched(segs: DataFrame, nMerges: Int, batchSize: Int = 4,
                        sep: String = "~"): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = segs.sparkSession
    import spark.implicits._
    var cur = segs
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    val rounds = (nMerges + batchSize - 1) / batchSize
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      // Lazy vocabulary-sized pair-count plan over the (staged) current
      // segmentation — consumed ONCE per round by the top-K collect
      // below, so it is not staged itself (round 15: the former
      // Stage(counts) materialization plus one argmax job PER PICK was
      // 2 corpus-scale jobs + batchSize small jobs per round; the
      // driver-side greedy runs the same (cnt DESC, pair ASC) order
      // over one collected head, one job per round).
      val counts = pairCountFrame(cur)
      val slots = math.min(batchSize, nMerges - r * batchSize)
      val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      // ONE argmax job per round: the token-disjoint greedy only ever
      // inspects candidates in (cnt DESC, pair ASC) order, so running it
      // driver-side over the collected top-K head is EXACTLY the
      // distributed per-pick argmax-with-exclusion (the order is total —
      // pair is unique — and the exclusion test is the same). K bounds
      // the head: only when every one of K candidates conflicts with an
      // earlier pick does the (rare, degenerate-corpus) fallback below
      // re-query with the exclusion filter pushed down.
      val topK = math.max(64, slots * 32)
      val head = counts.orderBy(col("cnt").desc, col("pair")).limit(topK)
        .select("lhs", "rhs", "cnt").as[(String, String, Long)].collect()
      val sawAll = head.length < topK // shorter head ⇒ the whole vocabulary
      var hi = 0
      while (picked.size < slots && hi < head.length) {
        val t = head(hi)
        val conflict = picked.exists(p =>
          p._1 == t._1 || p._1 == t._2 || p._2 == t._1 || p._2 == t._2)
        if (!conflict) {
          out += ((r.toLong * batchSize + picked.size, t._1, t._2, t._3))
          picked += t
        }
        hi += 1
      }
      var more = !sawAll // beyond-K candidates may still be disjoint
      while (more && picked.size < slots) {
        val used = picked.iterator.flatMap(p => Seq(p._1, p._2)).toSeq
        val cand = if (used.isEmpty) counts
          else counts.filter(!col("lhs").isin(used: _*) &&
            !col("rhs").isin(used: _*))
        cand.orderBy(col("cnt").desc, col("pair")).limit(1)
          .select("lhs", "rhs", "cnt").as[(String, String, Long)]
          .collect().headOption match {
          case None => more = false // no disjoint pair left this round
          case Some(t) =>
            out += ((r.toLong * batchSize + picked.size, t._1, t._2, t._3))
            picked += t
        }
      }
      if (picked.isEmpty) exhausted = true // counts empty: fully merged
      else cur = Stage(picked.foldLeft(cur) { case (df, (l, rr, _)) =>
        df.withColumn("seg", applyMerge(col("seg"), l, rr, sep))
      })
      r += 1
    }
    out.toSeq.toDF("rank", "lhs", "rhs", "pair_cnt")
  }

  /** [[mergeTrainBatched]] as DuckDB SQL — statically unrolled rounds ×
    * picks. Each pick k excludes the tokens of picks 0..k−1 via NOT IN
    * (empty-safe: NOT IN over an empty set is TRUE); each applied merge
    * rides a 1-row coalesced placeholder table ('' when the pick is
    * empty — '' equals no real pair, so the fold is a no-op and the
    * CROSS JOIN never zeroes the corpus). */
  def mergeTrainBatchedSql(segExpr: String, from: String, nMerges: Int,
                           batchSize: Int = 4, sep: String = "~"): String = {
    val rounds = (nMerges + batchSize - 1) / batchSize
    val ctes = new scala.collection.mutable.ArrayBuffer[String]
    val emits = new scala.collection.mutable.ArrayBuffer[String]
    (0 until rounds).foreach { r =>
      val slots = math.min(batchSize, nMerges - r * batchSize)
      ctes += s""" c$r AS (SELECT pair, cnt, split_part(pair, ' ', 1) AS lhs,
         |   split_part(pair, ' ', 2) AS rhs
         |  FROM (SELECT pair, CAST(count(*) AS BIGINT) AS cnt
         |        FROM (SELECT unnest(list_transform(range(1, len(seg)),
         |                j -> seg[j] || ' ' || seg[j+1])) AS pair FROM seg$r) p
         |        GROUP BY pair) g)""".stripMargin
      (0 until slots).foreach { k =>
        val excl = if (k == 0) "" else {
          val toks = (0 until k).map(j =>
            s"SELECT lhs AS t FROM b${r}_$j UNION SELECT rhs FROM b${r}_$j")
            .mkString(" UNION ")
          s"WHERE lhs NOT IN ($toks) AND rhs NOT IN ($toks)\n  "
        }
        ctes += s""" b${r}_$k AS (SELECT pair, lhs, rhs, cnt FROM c$r
           |  ${excl}ORDER BY cnt DESC, pair LIMIT 1),
           | m${r}_$k AS (SELECT coalesce((SELECT pair FROM b${r}_$k), '') AS pair)""".stripMargin
        emits += s"""SELECT CAST(${r.toLong * batchSize + k} AS BIGINT) AS rank,
           | lhs, rhs, cnt AS pair_cnt FROM b${r}_$k""".stripMargin
      }
      val folds = (0 until slots).map { k =>
        val src = if (k == 0) s"seg$r" else s"s${r}_${k - 1}"
        val dst = if (k == slots - 1) s"seg${r + 1}" else s"s${r}_$k"
        s""" $dst AS (SELECT doc_id, list_reduce(list_transform(seg, t -> [t]),
           |   (acc, x) -> CASE WHEN len(acc) > 0 AND (acc[-1] || ' ' || x[1]) = m.pair
           |               THEN acc[1:len(acc)-1] || [acc[-1] || '$sep' || x[1]]
           |               ELSE acc || x END) AS seg
           |   FROM $src CROSS JOIN m${r}_$k m)""".stripMargin
      }
      ctes ++= folds
    }
    s"""(WITH seg0 AS (SELECT doc_id, $segExpr AS seg FROM $from),
       |${ctes.mkString(",\n")}
       |SELECT * FROM (${emits.mkString("\nUNION ALL ")}))""".stripMargin
  }

  /** Apply a trained merge table in rank order: one narrow fold per
    * rank, no shuffle — the full-corpus tokenization pass. */
  def mergeApply(segs: DataFrame, merges: Seq[(String, String)],
                 sep: String = "~"): DataFrame =
    merges.foldLeft(segs) { case (df, (lhs, rhs)) =>
      df.withColumn("seg", applyMerge(col("seg"), lhs, rhs, sep))
    }

  /** The whole [[mergeTrain]] loop as DuckDB SQL for oracle queries —
    * nMerges statically unrolled CTE rounds over `segExpr` drawn from
    * `from`; each round's fold mirrors [[applyMerge]]'s greedy rule
    * and each argmax mirrors the (cnt DESC, pair ASC) tie-break. */
  def mergeTrainSql(segExpr: String, from: String, nMerges: Int,
                    sep: String = "~"): String = {
    val rounds = (0 until nMerges).map { i =>
      s""" p$i AS (SELECT unnest(list_transform(range(1, len(seg)),
         |   j -> seg[j] || ' ' || seg[j+1])) AS pair FROM seg$i),
         | b$i AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM p$i
         |         GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
         | seg${i + 1} AS (SELECT doc_id, list_reduce(list_transform(seg, t -> [t]),
         |   (acc, x) -> CASE WHEN len(acc) > 0 AND (acc[-1] || ' ' || x[1]) = b.pair
         |               THEN acc[1:len(acc)-1] || [acc[-1] || '$sep' || x[1]]
         |               ELSE acc || x END) AS seg
         |   FROM seg$i CROSS JOIN b$i b)""".stripMargin
    }.mkString(",\n")
    val unioned = (0 until nMerges).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, split_part(pair, ' ', 1) AS lhs,
         | split_part(pair, ' ', 2) AS rhs, cnt AS pair_cnt FROM b$i""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""(WITH seg0 AS (SELECT doc_id, $segExpr AS seg FROM $from),
       |$rounds
       |SELECT * FROM ($unioned))""".stripMargin
  }

  /** Global top-n bigrams by document frequency then raw count —
    * vocabulary building. One explode + one aggregate; the final top-n
    * is a single-partition sort of an already-aggregated (small)
    * table. */
  def topBigrams(docs: DataFrame, n: Int = 20): DataFrame = {
    // native one-pass n-gram expression (the old sequence/transform HOF
    // chain also needed a size >= 2 guard against sequence(1,0)'s
    // descending surprise; TokenNgrams just returns an empty array)
    val bigrams = docs.select(col("doc_id"),
      explode(graft.functions.TokenNgrams.token_ngrams(col("text"), 2)).as("bigram"))
    bigrams.groupBy("bigram")
      .agg(count(lit(1)).as("n_occur"), countDistinct("doc_id").as("n_docs"))
      .orderBy(col("n_occur").desc, col("bigram"))
      .limit(n)
  }

  /** Deterministic hash sampling: keep rows where
    * poly_hash(key) mod 100 < pct — the reproducible, engine-portable
    * replacement for `TABLESAMPLE`/`rand()`. Stratification is free:
    * the predicate is uniform within any stratum. Pure narrow filter,
    * runs at scan speed at any scale. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(PolyHash.poly_hash(col(keyCol).cast("string")) % 100 < pct)

  /** Balanced training-mix sampling: keep the `perStratum` documents
    * with the smallest poly_hash(doc_id) within each stratum (e.g.
    * language) — a deterministic, engine-portable "random N per group".
    * Strata with fewer than N docs keep everything, so the output is the
    * closest achievable balance. One rank window per stratum; at corpus
    * scale the shuffle is keyed by the stratum and each partition sorts
    * only its stratum's (hash, id) pairs. */
  def balancedSample(df: DataFrame, strataCol: String, perStratum: Int,
                     keyCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(PolyHash.poly_hash(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= perStratum)
      .drop("rnk")
  }

  /** Benchmark DECONTAMINATION — the overlap check every serious
    * training pipeline runs before release (n-gram collision against
    * held-out evaluation sets, GPT-3 appendix-C style): flag corpus
    * documents sharing at least one k-token shingle with any benchmark
    * document, with the count of distinct shared shingles as the
    * contamination score. Returns (doc_id, n_shared) for flagged docs
    * only; the clean corpus is the anti-join against it.
    *
    * Shape: one shingle scan per side (codegen'd
    * [[graft.functions.ShingleHashes]], 8-byte join keys), benchmark
    * shingle set deduped then semi-joined — benchmark suites are tiny
    * relative to a corpus, so the set BROADCASTS and the corpus is
    * never shuffled; cost is one scan + one broadcast semi-join +
    * one doc-keyed aggregate, at any corpus size. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, k: Int = 5): DataFrame = {
    def shingled(df: DataFrame) = df.select(col("doc_id"),
      explode(graft.functions.ShingleHashes.shingle_hashes(col("text"), k)).as("h"))
    val benchSet = shingled(benchmark).select("h").distinct()
    shingled(corpus)
      .join(broadcast(benchSet), Seq("h"), "left_semi")
      .groupBy("doc_id")
      .agg(countDistinct("h").as("n_shared"))
  }

  /** DSIR importance weights (Xie et al., NeurIPS 2023 — "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much its hashed-n-gram distribution looks
    * like a TARGET corpus (the rows matching `targetPred`) versus the
    * raw pool. Feature = token bigram hashed into `buckets` buckets;
    * per-bucket weight = floor(log2((c_target+1)/(c_raw+1))) computed
    * exactly in integers as length(bin((c_tgt+1)·2^20 DIV (c_raw+1)))
    * − 21 ∈ [−20, 0] (Laplace-smoothed, log-floor-quantized — monotone
    * in DSIR's log importance ratio and cross-engine exact, where a
    * float log2 would not hash-match). Doc score = Σ over its bigram
    * occurrences of the bucket weight: near 0 ⇒ target-like, strongly
    * negative ⇒ off-target; resample by thresholding or top-k on the
    * score. Docs with < 2 tokens produce no row.
    *
    * Shape at 100 TB: one explode per pass; the weight table is ONE
    * map-side-combined aggregate producing ≤ `buckets` rows (c_raw and
    * c_tgt counted in the same pass) that then BROADCASTS back onto the
    * occurrence stream; final agg is keyed by doc_id with partial
    * aggregation. The corpus is never joined to itself and the only
    * full shuffle is the doc_id agg. */
  def dsirWeights(docs: DataFrame, targetPred: Column,
                  buckets: Int = 1024): DataFrame = {
    val feat = docs.select(col("doc_id"), targetPred.as("is_target"),
        explode(graft.functions.TokenNgrams.token_ngrams(col("text"), 2)).as("gram"))
      .withColumn("bucket", PolyHash.poly_hash(col("gram")) % lit(buckets.toLong))
      .select("doc_id", "is_target", "bucket")
    val w = feat.groupBy("bucket").agg(
        count(lit(1)).as("c_raw"),
        count(when(col("is_target"), 1)).as("c_tgt"))
      .withColumn("w_bits",
        expr("CAST(length(bin((c_tgt + 1) * 1048576 DIV (c_raw + 1))) AS BIGINT) - 21"))
      .select("bucket", "w_bits")
    feat.join(broadcast(w), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum("w_bits").cast("long").as("dsir_score"))
  }

  /** QUALITY-STRATIFIED sampling: bucket documents into score strata at
    * the requested permille cut points, then take a deterministic
    * per-stratum sample — the anti-mode-collapse mix rule (sampling
    * only top-quality docs narrows the distribution; strata keep every
    * quality band represented at a controlled rate).
    *
    * SCALE-SAFE stratification: cut points come from the mergeable
    * histogram ([[graft.operators.IncrementalAgg.quantilesFromState]]
    * — one aggregate, never a global rank window, which in Spark is a
    * single-partition sort); the ≤ |quantiles| thresholds collect to
    * the driver (k-row collect, the KMeans pattern) and stratum
    * assignment is a narrow per-row expression. Per-stratum pick is a
    * fold-ordered rank window keyed by stratum. All integer: oracle-
    * exact. */
  def scoreStratifiedSample(scored: DataFrame, scoreCol: String,
                            histWidth: Long, cutsPermille: Seq[Int],
                            perStratum: Int): DataFrame = {
    import graft.operators.IncrementalAgg
    // the scored input is typically a whole scoring pipeline; it is read
    // twice (threshold collect + sample pass) — materialize once
    val scoredM = Stage(scored)
    val keyed = scoredM.withColumn("__k", lit(1))
    val thresholds = IncrementalAgg.quantilesFromState(
        IncrementalAgg.histogramState(keyed, Seq("__k"), scoreCol, histWidth),
        Seq("__k"), histWidth, cutsPermille)
      .orderBy("quantile_permille")
      .collect().map(_.getAs[Long]("est_upper")).toSeq
    val stratum = thresholds.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(col(scoreCol) > t, 1L).otherwise(0L)
    }
    val w = Window.partitionBy("stratum").orderBy(col("__rnd"), col("doc_id"))
    scoredM.withColumn("stratum", stratum)
      .withColumn("__rnd", portableFold(col("doc_id")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= perStratum)
      .select(col("doc_id"), col(scoreCol), col("stratum"), col("rnk"))
  }

  /** TEMPERATURE-based multilingual sampling (the p^α mixing rule of
    * mBERT/XLM-R, Conneau et al. 2020 §3): sample quotas proportional
    * to n_stratum^α instead of n_stratum, flattening the language
    * distribution so high-resource languages stop drowning out
    * low-resource ones. α is fixed at 0.5 — sqrt is the one power both
    * engines compute as the SAME correctly-rounded IEEE double, so
    * quotas stay hash-exact (general α via pow() is the same shape but
    * not cross-engine-reproducible). Quotas are floor shares of
    * `totalSample` (the ≤|strata| remainder is deliberately left
    * unassigned rather than distributed by an arbitrary rule); a quota
    * exceeding its stratum keeps the whole stratum.
    *
    * Scale shape: stratum counts + weights + quotas are one map-side-
    * combined aggregate collapsing to a strata-sized table that
    * BROADCASTS back (the 1-row total rides a broadcast cross join,
    * the [[histogramQuantiles]] pattern); the pick is the fold-ordered
    * per-stratum rank window of [[balancedSample]] — parallel across
    * strata, never a global sort. */
  def temperatureSample(docs: DataFrame, strataCol: String,
                        totalSample: Long): DataFrame = {
    val n = docs.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val w = n.withColumn("__w",
      floor(sqrt(col("__n").cast("double")) * lit(1000000.0)).cast("long"))
    val tw = w.agg(sum("__w").as("__tw"))
    val quota = w.crossJoin(broadcast(tw))
      // the product enters DECIMAL before it can exceed Long range:
      // __w ~ 1e11 at 1e10-doc strata, so totalSample ~ 1e8 would wrap
      // a Long product (the targetShareMix overflow class)
      .withColumn("quota", expr(
        s"CAST(CAST($totalSample AS DECIMAL(38,0)) * __w DIV __tw AS BIGINT)"))
      .select(col(strataCol), col("quota"))
    val wdw = Window.partitionBy(strataCol).orderBy(col("__rnd"), col("doc_id"))
    docs.join(broadcast(quota), Seq(strataCol))
      .withColumn("__rnd", portableFold(col("doc_id")))
      .withColumn("rnk", row_number().over(wdw).cast("long"))
      .filter(col("rnk") <= col("quota"))
      .select(col("doc_id"), col(strataCol), col("rnk"), col("quota"))
  }

  /** TARGET-SHARE corpus mixing with upsampling epochs — the data
    * recipe table of the LLaMA/GPT reports made executable: each
    * stratum gets a quota of `totalDocs · share‰`, filled by
    * `quota DIV n` FULL passes over the stratum (the "epochs > 1 on
    * small high-value domains" rule) plus a deterministic fold-ordered
    * pick of the `quota MOD n` remainder docs. Output is one row per
    * selected doc with its copy count: Σ n_copies over a stratum equals
    * its quota EXACTLY, so the materialized mix hits the recipe to the
    * document. Strata missing from the recipe are dropped; a recipe
    * entry with no docs contributes nothing.
    *
    * Scale shape: the recipe and stratum counts meet in a strata-sized
    * table that BROADCASTS back; copy counts are a narrow expression
    * over the per-stratum rank window ([[balancedSample]]'s shape) —
    * parallel across strata, never a global sort, and the corpus is
    * never physically replicated (downstream reads `n_copies`). */
  def targetShareMix(docs: DataFrame, strataCol: String,
                     sharesPermille: Seq[(String, Int)],
                     totalDocs: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val shares = sharesPermille.toDF(strataCol, "__share")
    val n = docs.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val recipe = shares.join(n, strataCol)
      // CAST the total BEFORE multiplying: an IntegerType literal times
      // the IntegerType share overflows Int at totalDocs ~ 5M·share —
      // ANSI mode throws, legacy mode silently drops whole strata
      .withColumn("quota",
        expr(s"CAST($totalDocs AS BIGINT) * __share DIV 1000"))
      .withColumn("__epochs", expr("quota DIV __n"))
      .withColumn("__rem", expr("quota % __n"))
      .select(col(strataCol), col("quota"), col("__epochs"), col("__rem"))
    val w = Window.partitionBy(strataCol).orderBy(col("__rnd"), col("doc_id"))
    docs.join(broadcast(recipe), Seq(strataCol))
      .withColumn("__rnd", portableFold(col("doc_id")))
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_copies", (col("__epochs") +
        when(col("rnk") <= col("__rem"), 1L).otherwise(0L)).cast("long"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col(strataCol), col("n_copies"), col("quota"))
  }

  /** CCNet-style perplexity BUCKETING (Wenzek et al. 2020 §4.3): split
    * each language's documents into head / middle / tail thirds by LM
    * quality score — the standard "keep head+middle, drop tail" corpus
    * gate, with cut points calibrated PER LANGUAGE so low-resource
    * languages aren't judged on the dominant language's score scale.
    * `bucket` counts how many of the language's cut points the score
    * exceeds (0 = head = best/lowest score … |cuts| = tail), mirroring
    * [[scoreStratifiedSample]]'s stratum rule but grouped by key.
    *
    * Scale shape: cut points come off the mergeable histogram state
    * ([[graft.operators.IncrementalAgg.histogramState]] — one map-side-
    * combined aggregate, state bounded by langs × score range / width,
    * never a per-language rank window). The per-language threshold
    * table (langs × |cuts| rows) collapses to one sorted-array row per
    * language and BROADCASTS back; bucket assignment is then a narrow
    * array expression — the corpus shuffles once (the scoring join),
    * never for the bucketing itself. All integer: oracle-exact. */
  def ccnetBuckets(scored: DataFrame, keyCol: String, scoreCol: String,
                   histWidth: Long,
                   cutsPermille: Seq[Int] = Seq(333, 667)): DataFrame = {
    import graft.operators.IncrementalAgg
    // scoring pipelines are expensive — materialize once, read twice
    // (histogram pass + bucket-assignment pass)
    val scoredM = Stage(scored)
    val cuts = IncrementalAgg.quantilesFromState(
        IncrementalAgg.histogramState(scoredM, Seq(keyCol), scoreCol, histWidth),
        Seq(keyCol), histWidth, cutsPermille)
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("est_upper"))).as("__cuts"))
    scoredM.join(broadcast(cuts), Seq(keyCol))
      .withColumn("bucket",
        size(filter(col("__cuts"), u => col(scoreCol) > u)).cast("long"))
      .drop("__cuts")
  }

  /** CONTRASTIVE triplet mining — training data for embedding models
    * (SimCSE/SBERT-style): (anchor, positive) = a near-duplicate pair
    * from the dedup pipeline, negative = a deterministic "random" other
    * document. Negative choice is seed-free and scale-safe: documents
    * hash into `buckets` buckets by the portable fold; the negative for
    * an anchor is the min-fold document of the NEXT bucket — one tiny
    * (≤ buckets rows) aggregate that BROADCASTS, no global sort, no
    * per-row randomness. Degenerate negatives (== anchor/positive) and
    * false negatives (the pair list knows negative ≈ anchor OR
    * ≈ positive) are dropped by filter + anti-joins — the standard
    * contrastive-mining hygiene. A pair whose candidate negative is
    * dropped (or whose next bucket is empty — possible when the corpus
    * has fewer docs than `buckets`) yields NO triplet rather than a
    * dirty one; compare output count to the pair count if completeness
    * matters and lower `buckets` accordingly.
    *
    * Shape at 100 TB: pair list (already corpus-sparse) + one broadcast
    * join + four anti-joins on the pair list itself. */
  def contrastiveTriplets(docs: DataFrame, pairs: DataFrame,
                          buckets: Int = 64): DataFrame = {
    val b = docs.select(col("doc_id"), portableFold(col("doc_id")).as("f"))
      .withColumn("bucket", col("f") % buckets)
    val negs = b.groupBy("bucket")
      .agg(min(struct(col("f"), col("doc_id"))).as("m"))
      .select(col("bucket").as("nbucket"), col("m.doc_id").as("neg_id"))
    pairs.select(col("id_a").as("anchor_id"), col("id_b").as("pos_id"))
      .join(b.select(col("doc_id").as("anchor_id"), col("bucket")), "anchor_id")
      .withColumn("nbucket", (col("bucket") + 1) % buckets)
      .join(broadcast(negs), "nbucket")
      .filter(col("neg_id") =!= col("anchor_id") && col("neg_id") =!= col("pos_id"))
      .join(pairs.select(col("id_a").as("anchor_id"), col("id_b").as("neg_id")),
        Seq("anchor_id", "neg_id"), "left_anti")
      .join(pairs.select(col("id_b").as("anchor_id"), col("id_a").as("neg_id")),
        Seq("anchor_id", "neg_id"), "left_anti")
      // ...and negatives the pair list knows are near-dups of the
      // POSITIVE (Jaccard is not transitive: (A,B),(B,C) without (A,C)
      // would otherwise push apart two flagged near-duplicates)
      .join(pairs.select(col("id_a").as("pos_id"), col("id_b").as("neg_id")),
        Seq("pos_id", "neg_id"), "left_anti")
      .join(pairs.select(col("id_b").as("pos_id"), col("id_a").as("neg_id")),
        Seq("pos_id", "neg_id"), "left_anti")
      .select("anchor_id", "pos_id", "neg_id")
  }

  /** WEIGHTED sampling without replacement, deterministic and seed-free:
    * each row draws the engine-portable uniform u = fold(key) ∈
    * [0, 1000000007) and a PRIORITY u·1e6 DIV weight; the sample is the
    * n smallest priorities. Monotone in weight (doubling a row's weight
    * halves its priority — twice the selection pressure), reproducible
    * across runs/engines, and the u/w-rank form of the exponential-
    * clocks construction for weighted sampling without replacement
    * (exact E-S priorities u^(1/w) need a float pow that would not
    * hash-match; the rank approximation keeps every value BIGINT).
    * Weights are clamped to ≥ 1 (a zero/negative weight would DIV-by-
    * zero under ANSI or invert the ordering, both silently wrong).
    *
    * Shape at 100 TB: a narrow per-row expression + global top-n —
    * Spark plans sort+limit as per-partition partial top-n
    * (TakeOrderedAndProject), so no full-sort shuffle ever runs. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: Column,
                     n: Int): DataFrame = {
    // +1 lifts u into [1, 1000000007]: u = 0 would pin priority to 0 and
    // select that key in EVERY sample regardless of weight (doc_id 0 is
    // congruent to 0 — a real key, not a corner case)
    val u = portableFold(col(keyCol)) + lit(1L)
    df.withColumn("weight", greatest(weightCol.cast("long"), lit(1L)))
      .withColumn("__u", u)
      .withColumn("priority", expr("__u * 1000000 DIV weight"))
      .orderBy(col("priority"), col(keyCol))
      .limit(n)
      .select(col(keyCol), col("weight"), col("priority"))
  }

  /** LEAKAGE-SAFE train/eval split: assign every document to a split by
    * its near-duplicate CLUSTER, not its own id — the guard against
    * eval contamination (a near-copy of a training doc in the eval set
    * inflates every metric; per-doc hash splits leak exactly those
    * pairs across the boundary). Pair list in → connected components
    * ([[Clusters.connectedComponents]]) → singleton docs are their own
    * cluster → the CLUSTER id (not the doc id) hashes into the split,
    * so a whole duplicate class lands on one side by construction.
    * Hash is the engine-portable integer fold (mod-first so the
    * multiply cannot overflow on 2^63-range ids).
    *
    * Shape at 100 TB: CC cost is bounded by the duplicate-pair list
    * (never the corpus); the split itself is one left join (dup-cluster
    * membership is corpus-scale-sparse, so the CC table broadcasts when
    * it fits) plus a narrow per-row expression. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       trainPermille: Int = 800): DataFrame = {
    val cc = Clusters.connectedComponents(pairs)
      .select(col("doc_id"), col("cluster_id").as("__cc"))
    docs.select("doc_id").join(cc, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("__cc"), col("doc_id")))
      .withColumn("split",
        when(portableFold(col("cluster_id")) % 1000 < trainPermille, lit("train"))
          .otherwise(lit("eval")))
      .select("doc_id", "cluster_id", "split")
  }

  /** TOKEN-BUDGET mixture sampling — build a training mix by taking,
    * per stratum (language/source/domain), documents in deterministic
    * pseudo-random order until the stratum's token budget is filled
    * (the document that crosses the budget is kept: every stratum
    * reaches ≥ budget tokens when it has them — the data-mixing rule
    * corpora like The Pile weight sources by). Order key is the exact
    * integer fold ((doc_id mod 1000000007) · 2654435761) mod 1000000007 — engine-
    * portable, seed-free, uniform. Returns the sampled rows with
    * n_tokens and the running cum within the stratum.
    *
    * Shape: one window per stratum (shuffle keyed by the stratum
    * column, each partition sorts only its stratum) — the same
    * parallel form as [[seqPackingSharded]]; no global order, no
    * driver loop. */
  def tokenBudgetMix(docs: DataFrame, strataCol: String,
                     budgetTokens: Long): DataFrame = {
    val t = docs.select(col("doc_id"), col(strataCol),
      size(words(col("text"))).cast("long").as("n_tokens"),
      portableFold(col("doc_id")).as("__rnd"))
    val w = Window.partitionBy(strataCol).orderBy(col("__rnd"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum("n_tokens").over(w))
      .filter(col("cum") - col("n_tokens") < budgetTokens)
      .drop("__rnd")
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
    * denoising-objective TRAINING-PAIR constructor: tokens partition
    * into fixed `blockLen` blocks, a deterministic integer hash masks
    * ~1/`rateMod` of them, the input replaces each masked block with an
    * ordinal sentinel (`<extra_id_k>`, T5's convention) and the target
    * is the sentinel-delimited concatenation of exactly the masked
    * spans. Deterministic by construction — (doc_id, block) decides the
    * mask, so the same corpus yields the same pairs on any cluster, any
    * partitioning, and the whole constructor is SQL-replayable (q168)
    * where a rand()-based masker could never be.
    *
    * Shape at 100 TB: narrow per-row array expressions, no shuffle, no
    * UDF — pair construction runs at scan speed and composes downstream
    * of the curation/packing stages (q64/q79). Per-row cost is
    * O(blocks · masked) from the ordinal lookups (≈ B²/rateMod): fine
    * for chunked corpora (B ≤ ~10³); chunk ultra-long documents first
    * (chunkDocuments) rather than masking megatoken rows whole. */
  def spanCorruptionPairs(docs: DataFrame, blockLen: Int = 8,
                          rateMod: Int = 5): DataFrame = {
    val sent =
      "concat('<extra_id_', CAST(array_position(mb, b) - 1 AS STRING), '>')"
    docs.select(col("doc_id"), words(col("text")).as("l"))
      .withColumn("n_blocks",
        expr(s"CAST((size(l) + ${blockLen - 1}) DIV $blockLen AS BIGINT)"))
      .withColumn("mb", expr(
        s"filter(sequence(0, n_blocks - 1), b -> " +
          s"(pmod(pmod(doc_id, 1000000007) * 1021 + b * 2039 + 17, " +
          s"1000000007) * 2654435761 % 1000000007) % $rateMod = 0)"))
      .select(col("doc_id"), col("n_blocks"),
        size(col("mb")).cast("long").as("n_masked"),
        expr(s"array_join(flatten(transform(sequence(0, n_blocks - 1), b -> " +
          s"CASE WHEN array_position(mb, b) > 0 THEN array($sent) " +
          s"ELSE slice(l, CAST(b * $blockLen + 1 AS INT), $blockLen) END)), ' ')")
          .as("input_text"),
        expr(s"array_join(flatten(transform(mb, b -> " +
          s"concat(array($sent), " +
          s"slice(l, CAST(b * $blockLen + 1 AS INT), $blockLen)))), ' ')")
          .as("target_text"))
  }

  /** BERT-style MLM masking (Devlin et al. 2019 §3.1) — the masked-LM
    * TRAINING-PAIR constructor, [[spanCorruptionPairs]]'s sibling:
    * ~15% of token positions select (position hash mod 20 < 3), and a
    * selected position masks to `[MASK]` (8/10), swaps for another
    * token (1/10), or stays unchanged (1/10) — the 80/10/10 rule that
    * stops the model from only ever seeing `[MASK]` at prediction
    * slots. Labels carry `position:original` pairs for exactly the
    * selected slots. The swap draws the DOCUMENT's own token at a
    * hashed position — corpus-global draws need a vocab join; the
    * doc-local draw keeps the whole constructor one narrow pass, and
    * for MLM the distributional difference is negligible. Deterministic
    * throughout (the q168 argument): same corpus ⇒ same pairs on any
    * cluster, SQL-replayable string-for-string. */
  def mlmMaskPairs(docs: DataFrame): DataFrame = {
    // pmod-first (the portableFold discipline): reduce BEFORE the
    // 2654435761 multiply so 2^63-range doc_ids can't wrap the Long —
    // a silent negative h would make `h % 20 < 3` true for every
    // position (all 20 negative residues) and degenerate the 80/10/10.
    val h = "(pmod(pmod(doc_id, 1000000007) * 1021 + p * 2039 + 23, " +
      "1000000007) * 2654435761 % 1000000007)"
    docs.select(col("doc_id"), words(col("text")).as("l"))
      .withColumn("nt", size(col("l")).cast("long"))
      .withColumn("sel",
        expr(s"filter(sequence(1, nt), p -> $h % 20 < 3)"))
      .select(col("doc_id"), col("nt").as("n_tokens"),
        size(col("sel")).cast("long").as("n_selected"),
        expr(s"CAST(size(filter(sel, p -> ($h DIV 20) % 10 < 8)) AS BIGINT)")
          .as("n_mask"),
        expr(s"array_join(transform(sequence(1, nt), p -> " +
          s"CASE WHEN NOT array_contains(sel, p) THEN element_at(l, CAST(p AS INT)) " +
          s"WHEN ($h DIV 20) % 10 < 8 THEN '[MASK]' " +
          s"WHEN ($h DIV 20) % 10 = 8 " +
          s"THEN element_at(l, CAST(($h DIV 200) % nt AS INT) + 1) " +
          s"ELSE element_at(l, CAST(p AS INT)) END), ' ')").as("masked_text"),
        expr(s"array_join(transform(sel, p -> " +
          s"concat(CAST(p AS STRING), ':', element_at(l, CAST(p AS INT)))), ' ')")
          .as("labels_text"))
  }

  /** Length histogram: bucket documents by n_chars DIV width; per bucket
    * doc count and total tokens. Single map-side-combined aggregate. */
  def lengthHistogram(docs: DataFrame, width: Int = 50): DataFrame =
    docs.select(expr(s"CAST(length(text) AS BIGINT) DIV $width").as("bucket"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))

  /** Sequence packing: assign documents (in doc_id order) to training
    * batches of `capacity` tokens by cumulative fill —
    * batch = (cumsum(n_tokens) - n_tokens) DIV capacity, i.e. the batch
    * the document STARTS in. Exact integers; a total order makes it
    * reproducible.
    *
    * Scale note: a global running sum is inherently sequential; the
    * single-ordering window is the honest cost. At 100 TB, pack within
    * shards instead: partitionBy(shard) windows (embarrassingly
    * parallel) — same code with a shard key prepended to the window. */
  def seqPacking(docs: DataFrame, capacity: Int = 4096): DataFrame = {
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    docs.select(col("doc_id"), size(words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("batch_id", expr(s"(cum_tokens - n_tokens) DIV $capacity"))
  }

  /** Shard-keyed sequence packing — the 100 TB form of [[seqPacking]]:
    * documents are assigned to `nShards` deterministic shards
    * (doc_id mod nShards) and packed independently within each shard by
    * the same cumulative-fill rule. The window partitions by shard, so
    * every shard sorts and packs in parallel — no global single-reducer
    * ordering; within a shard the result is exactly [[seqPacking]] of
    * that shard's documents. Batches are (shard, batch_in_shard)
    * pairs. */
  def seqPackingSharded(docs: DataFrame, capacity: Int = 4096,
                        nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.select(col("doc_id"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("batch_in_shard", expr(s"(cum_tokens - n_tokens) DIV $capacity"))
  }

  /** COMPETENCE-BASED CURRICULUM schedule (Platanios et al. 2019): the
    * data-ORDERING op between sampling (balanced/temperature mixes) and
    * packing — training proceeds in `buckets` phases, and phase b
    * admits exactly the documents whose difficulty percentile is within
    * the model's competence c(b) = b/buckets (linear pacing): early
    * phases train on the easiest slice, the full corpus unlocks by the
    * final phase. Emits one row per (phase, admitted doc):
    * (bucket, doc_id, difficulty, rank_ppm) — each phase's training set
    * is a direct filter, and rank_ppm (exact integer permille-of-a-
    * thousand rank, rnk·10⁶ DIV n) makes the whole schedule
    * SQL-replayable: same corpus ⇒ same curriculum on any cluster.
    * Ties break on doc_id, so the rank is total and deterministic.
    *
    * This EXACT-RANK form is the calibration/oracle shape — one global
    * window (single-reducer sort, the honest cost of an exact global
    * percentile; fine at calibration-sample scale). The 100 TB serving
    * form is [[curriculumFromThresholds]]: difficulty CUTOFFS (from
    * this form over a sample, or q96's maintained histogram quantiles)
    * broadcast into a narrow comparison — no sort anywhere near the
    * corpus, the [[perSourceTiers]]/tiersFromThresholds discipline. */
  def curriculumSchedule(docs: DataFrame, difficulty: Column,
                         buckets: Int = 4): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val w = Window.orderBy(col("__diff"), col("doc_id"))
    val all = Window.partitionBy(lit(1))
    val ranked = docs.select(col("doc_id"), difficulty.cast("long").as("__diff"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("rank_ppm", expr("rnk * 1000000 DIV n"))
    val phases = docs.sparkSession.range(1, buckets + 1).toDF("bucket")
    ranked.join(broadcast(phases),
        col("rank_ppm") <= expr(s"bucket * 1000000 DIV $buckets"))
      .select(col("bucket"), col("doc_id"), col("__diff").as("difficulty"),
        col("rank_ppm"))
  }

  /** The 100 TB serving form of [[curriculumSchedule]]: per-phase
    * difficulty CUTOFFS (bucket → max admitted difficulty, from a
    * calibration sample's exact ranks or maintained histograms)
    * broadcast against the corpus — phase b admits difficulty ≤
    * cutoff(b). One narrow comparison per phase, no global sort, no
    * window. Equal to the exact form whenever the cutoffs are the
    * exact form's per-phase difficulty maxima and difficulty values
    * are distinct at the phase boundaries (ties straddling a cutoff
    * admit by VALUE here, by rank there — the standard
    * threshold-serving caveat, same as tiersFromThresholds). */
  def curriculumFromThresholds(docs: DataFrame, difficulty: Column,
                               cutoffs: Seq[(Long, Long)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cuts = cutoffs.toDF("bucket", "cutoff")
    docs.select(col("doc_id"), difficulty.cast("long").as("difficulty"))
      .join(broadcast(cuts), col("difficulty") <= col("cutoff"))
      .select(col("bucket"), col("doc_id"), col("difficulty"))
  }

  /** SFT PROMPT-MASKED training pairs — the supervised-fine-tuning
    * sibling of [[spanCorruptionPairs]]/[[mlmMaskPairs]]: instruction
    * tuning trains ONLY on completion tokens (loss on the prompt would
    * teach the model to parrot inputs), so each document splits at a
    * deterministic boundary — prompt_len = clamp(1, n−1,
    * n·promptPermille DIV 1000) — into a zero-loss prompt slice and a
    * trained completion slice, with the per-token 0/1 `loss_mask`
    * emitted alongside (the exact column a packed trainer multiplies
    * into its per-token loss). One-token documents carry prompt_len 0:
    * an SFT pair needs at least one trained token. Integer arithmetic
    * end to end — same corpus ⇒ same masks on any cluster, and the
    * whole constructor is SQL-replayable string-for-string (q175).
    *
    * Shape at 100 TB: narrow per-row array expressions, no shuffle, no
    * UDF — like its siblings it composes downstream of curation and
    * upstream of packing (q64) at scan speed. */
  def sftLossMaskPairs(docs: DataFrame, promptPermille: Int = 500): DataFrame = {
    require(promptPermille >= 0 && promptPermille <= 1000,
      s"promptPermille must be in [0, 1000], got $promptPermille")
    docs.select(col("doc_id"), words(col("text")).as("l"))
      .withColumn("n_tokens", size(col("l")).cast("long"))
      .filter(col("n_tokens") >= 1)
      .withColumn("prompt_len", expr(
        s"CASE WHEN n_tokens = 1 THEN CAST(0 AS BIGINT) " +
          s"ELSE greatest(CAST(1 AS BIGINT), least(n_tokens - 1, " +
          s"n_tokens * $promptPermille DIV 1000)) END"))
      .select(col("doc_id"), col("n_tokens"), col("prompt_len"),
        expr("array_join(slice(l, 1, CAST(prompt_len AS INT)), ' ')")
          .as("prompt_text"),
        expr("array_join(slice(l, CAST(prompt_len AS INT) + 1, " +
          "CAST(n_tokens - prompt_len AS INT)), ' ')").as("target_text"),
        // '0 '×prompt_len ++ '1 '×(n−prompt_len), trailing space
        // trimmed — byte-identical to the former per-position
        // transform(sequence(...)) (every token is one digit + one
        // space; n_tokens ≥ 1 so the string always ends '1 '), but
        // repeat/concat/rtrim are whole-stage-codegen where the
        // higher-order transform was CodegenFallback, interpreted per
        // token (guide: expressions & codegen; the q111 playbook)
        expr("rtrim(concat(repeat('0 ', CAST(prompt_len AS INT)), " +
          "repeat('1 ', CAST(n_tokens - prompt_len AS INT))))")
          .as("loss_mask"))
  }

  /** PREFERENCE PAIRS from weak quality supervision — the DPO/RLHF
    * training-pair constructor (Rafailov et al. 2023 consume exactly
    * this shape): near-duplicate documents are two renderings of the
    * same underlying content, so a significant quality gap between
    * them is a (chosen, rejected) comparison no human had to label —
    * the standard weak-supervision recipe for bootstrapping preference
    * data from a crawl. `pairs` is ANY candidate generator's (id_a,
    * id_b) output (inverted-index Jaccard, LSH bands, SimHash — all
    * hot-key-capped); `scores` any per-doc integer quality score (the
    * q94 bigram-LM score, Gopher composite, a classifier). chosen =
    * higher score, ties broken to the lower id (gap 0 only survives a
    * zero threshold); pairs below `minGapPpm` are dropped — a small
    * gap is noise, not preference signal.
    *
    * Shape: two keyed joins of the (bounded) candidate set against the
    * score table and a narrow select — no new quadratic surface, the
    * pair generator owns the candidate bound. */
  def preferencePairs(pairs: DataFrame, scores: DataFrame,
                      minGapPpm: Long = 100000L): DataFrame = {
    val sa = scores.select(col("doc_id").as("id_a"), col("score_ppm").as("s_a"))
    val sb = scores.select(col("doc_id").as("id_b"), col("score_ppm").as("s_b"))
    val aWins = col("s_a") > col("s_b") ||
      (col("s_a") === col("s_b") && col("id_a") < col("id_b"))
    pairs.select("id_a", "id_b").join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .withColumn("gap_ppm", abs(col("s_a") - col("s_b")))
      .filter(col("gap_ppm") >= minGapPpm)
      .select(when(aWins, col("id_a")).otherwise(col("id_b")).as("chosen_id"),
        when(aWins, col("id_b")).otherwise(col("id_a")).as("rejected_id"),
        col("gap_ppm"))
  }

  /** Multi-epoch training-order manifest — the deterministic global
    * shuffle a DataLoader needs: for each epoch, every document gets a
    * (shard, pos) slot from a seed-free hash permutation, so epoch e's
    * read order is reproducible on any worker count, yet epochs see the
    * corpus in DIFFERENT orders (the fold input shifts by epoch ·
    * 7919). Consumers stream shard files sequentially; restart resumes
    * from (epoch, shard, pos) with no saved RNG state.
    *
    * Scale shape: one narrow fold expression, shard = fold mod
    * `nShards`, then a row_number window PARTITIONED by (epoch, shard)
    * — shards order in parallel, never a global single-reducer sort
    * (the same reasoning as [[seqPackingSharded]]). Manifest rows are
    * epochs × docs; at 100 TB emit one epoch at a time (the per-epoch
    * plan is identical), unioned here so the gate checks cross-epoch
    * decorrelation too. */
  def epochShuffle(docs: DataFrame, nShards: Int = 8,
                   epochs: Int = 2): DataFrame = {
    val w = Window.partitionBy("epoch", "shard")
      .orderBy(col("__rnd"), col("doc_id"))
    docs.select(col("doc_id"),
        explode(array((0 until epochs).map(i => lit(i.toLong)): _*)).as("epoch"))
      // reduce doc_id mod P BEFORE the epoch shift: portableFold's
      // pmod-first contract covers 2^63-range ids, and a raw Long add
      // here would reopen the wrap window right above it (mod
      // arithmetic makes the two forms equal for every in-range input)
      .withColumn("__rnd", portableFold(
        pmod(col("doc_id"), lit(1000000007L)) + col("epoch") * lit(7919L)))
      .withColumn("shard", col("__rnd") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
  }

  /** Sliding-window document chunking — the preprocessing step that
    * turns long documents into training/embedding chunks of
    * `chunkTokens` tokens overlapping by `overlap`: chunk i covers
    * tokens [i·stride, i·stride + chunkTokens) with
    * stride = chunkTokens − overlap; the last chunk may be short; a doc
    * shorter than one chunk yields itself. Pure array arithmetic
    * (sequence + slice) exploded per doc — no shuffle, and the chunk
    * count per doc is ⌈max(n−overlap, 1)/stride⌉ so output size is
    * predictable. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 64,
                     overlap: Int = 16): DataFrame = {
    require(overlap < chunkTokens, "overlap must be smaller than chunkTokens")
    val stride = chunkTokens - overlap
    val w = words(col("text"))
    val nChunks = greatest(lit(1L),
      ceil((size(w).cast("long") - overlap) / lit(stride.toDouble)).cast("long"))
    docs.select(col("doc_id"), w.as("toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_no"))
      .select(col("doc_id"), col("chunk_no"),
        array_join(slice(col("toks"),
          (col("chunk_no") * stride + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"))
      .withColumn("n_tokens",
        size(words(col("chunk_text"))).cast("long"))
  }

  /** Snapshot diff — change detection between two corpus versions (the
    * SCD step of corpus versioning): FULL OUTER join on doc_id, content
    * compared by the rolling token fingerprint
    * ([[TextAnalysis.fingerprint]] — integer, oracle-replayable) so the
    * join carries two longs per doc, never the texts. Emits only
    * changed rows (`added` / `removed` / `changed`); unchanged docs —
    * the overwhelming mass at corpus scale — are filtered before any
    * downstream work. */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = TextAnalysis.fingerprint(oldDocs)
      .select(col("doc_id").as("o_id"), col("fingerprint").as("o_fp"))
    val n = TextAnalysis.fingerprint(newDocs)
      .select(col("doc_id").as("n_id"), col("fingerprint").as("n_fp"))
    o.join(n, col("o_id") === col("n_id"), "full_outer")
      .withColumn("status",
        when(col("o_id").isNull, lit("added"))
          .when(col("n_id").isNull, lit("removed"))
          .when(col("o_fp") =!= col("n_fp"), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("status") =!= "same")
      .select(coalesce(col("n_id"), col("o_id")).as("doc_id"), col("status"))
  }

  /** Histogram-based approximate quantiles: bucket the value by
    * `width`, cumulative-sum the bucket counts, and report the upper
    * bound of the first bucket whose cumulative count reaches
    * ceil(q·N) — the scalable percentile path (one map-side-combined
    * aggregate + a vocabulary-sized window) versus an exact global
    * sort. Error is bounded by `width`; all arithmetic is integer, so
    * the estimate is engine-portable. Quantiles are given in permille
    * (500 = median). */
  def histogramQuantiles(df: DataFrame, valueExpr: Column, width: Long,
                         quantilesPermille: Seq[Int]): DataFrame = {
    val hist = df.select(valueExpr.cast("long").as("v"))
      .select(expr(s"v DIV $width").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum("n").over(w))
      .crossJoin(broadcast(df.select(count(lit(1)).as("n_total"))))
    quantilesPermille.map { q =>
      // smallest bucket with cum·1000 ≥ q·N — for integer cum this IS
      // cum ≥ ceil(q·N/1000), with no division at all
      cum.filter(col("cum") * 1000 >= col("n_total") * q)
        .orderBy("bucket")
        .limit(1)
        .select(lit(q).cast("long").as("quantile_permille"),
          ((col("bucket") + 1) * width - 1).as("est_upper"))
    }.reduce(_ unionAll _)
  }

  /** Int8 symmetric quantization of an embedding column (the standard
    * vector-compression step before ANN indexing): per-vector scale =
    * max |e_i|, code_i = floor(e_i·127/scale + 0.5). All doubles derive
    * from exact float→double casts and identical IEEE ops, so codes are
    * engine-portable. Output keeps the first 4 codes + integer summary
    * stats (sum/min/max) — wide-array outputs don't survive value-level
    * cross-engine compares, summaries do. Narrow per-row expression:
    * scan-speed at scale. */
  /** Per-DIMENSION int8 calibration + quantization — the
    * post-training-quantization (PTQ) shape real vector stores use:
    * one calibration pass finds each dimension's |max| over the corpus,
    * then every vector quantizes against its dimension's own scale.
    * Against [[int8Quantize]]'s per-vector scale this preserves
    * cross-vector comparability per dimension (dot products of codes
    * are meaningful) and stops one hot dimension from crushing the
    * resolution of quiet ones.
    *
    * Scale shape: calibration is ONE aggregate of `dim` max-expressions
    * (map-side combined, zero shuffle beyond the 1-row reduce) whose
    * result collects driver-side — state bounded by the embedding
    * dimension, not the row count (the KMeans-pattern collect).
    * Quantization is then a narrow per-row `transform` against the
    * literal scale vector: scan speed, no join, no broadcast. All-zero
    * dimensions quantize to 0 (the scale-0 guard both engines state
    * identically). Codes derive from identical IEEE double ops on both
    * engines, so outputs are hash-exact. First 4 codes + integer
    * summaries survive the value-level compare; the first 4 calibration
    * scales ride along in micros so the calibration itself is checked. */
  def int8QuantizePerDim(emb: DataFrame, dim: Int = 64): DataFrame = {
    require(dim >= 4, s"output schema carries s0..s3/c0..c3, so dim must be >= 4 (got $dim)")
    // an empty corpus aggregates null maxes — treat as scale 0 so the
    // (empty) select still builds instead of NPE-ing on the driver
    val maxes = emb.agg(array((0 until dim).map(i =>
        max(abs(element_at(col("embedding"), i + 1).cast("double")))): _*).as("m"))
      .collect()(0).getSeq[Any](0)
      .map(v => if (v == null) 0.0 else v.asInstanceOf[Double])
    val scales = array(maxes.map(lit): _*)
    val codes = transform(col("embedding"), (e, i) =>
      when(element_at(scales, i + 1) === 0.0, lit(0L))
        .otherwise(floor(e.cast("double") * lit(127.0) / element_at(scales, i + 1)
          + lit(0.5)).cast("long")))
    def sMicros(i: Int) =
      lit(math.floor(maxes(i) * 1000000.0 + 0.5).toLong).as(s"s${i}_micros")
    emb.select(col("vec_id"), codes.as("codes"))
      .select(col("vec_id"),
        sMicros(0), sMicros(1), sMicros(2), sMicros(3),
        element_at(col("codes"), 1).as("c0"),
        element_at(col("codes"), 2).as("c1"),
        element_at(col("codes"), 3).as("c2"),
        element_at(col("codes"), 4).as("c3"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("sum_codes"),
        array_min(col("codes")).as("min_code"),
        array_max(col("codes")).as("max_code"))
  }

  def int8Quantize(emb: DataFrame): DataFrame = {
    val absMax = array_max(transform(col("embedding"), e => abs(e.cast("double"))))
    val codes = transform(col("embedding"),
      e => floor(e.cast("double") * lit(127.0) / col("scale") + lit(0.5)).cast("long"))
    emb.select(col("vec_id"), col("embedding"), absMax.as("scale"))
      .withColumn("codes", codes)
      .select(col("vec_id"),
        floor(col("scale") * lit(1000000.0) + lit(0.5)).cast("long").as("scale_micros"),
        element_at(col("codes"), 1).as("c0"),
        element_at(col("codes"), 2).as("c1"),
        element_at(col("codes"), 3).as("c2"),
        element_at(col("codes"), 4).as("c3"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("sum_codes"),
        array_min(col("codes")).as("min_code"),
        array_max(col("codes")).as("max_code"))
  }

  /** SOURCE-LEVEL CURATION — the hierarchical filter of the
    * RefinedWeb/FineWeb recipes: quality decisions made per SOURCE
    * (domain, crawl, feed), not per document, because a source whose
    * aggregate signals are bad poisons even its individually-plausible
    * documents. Per group: doc count, mean document length, and
    * exact-duplicate share (1 − distinct texts / docs, in ppm — a high
    * share marks template/boilerplate farms); a source is kept iff
    * `mean_chars ≥ minMeanChars` and `dup_ppm ≤ maxDupPpm`, and every
    * document inherits its source's verdict via a BROADCAST join (the
    * stats table has one row per source — tiny at any corpus size).
    * Shape: one group aggregate + one broadcast join back. The distinct
    * count runs on xxhash64(text), not the text itself, so the
    * distinct-aggregate shuffle carries (source, 8-byte hash) — never
    * the corpus's strings (the q29/exact-dedup standard; a 64-bit
    * collision first perturbs the count near 10⁹ distinct texts per
    * source, far beyond any real source). Exact integers → oracle
    * (q124, whose DuckDB side counts distinct texts directly —
    * hash-identical short of that collision). */
  def sourceCuration(docs: DataFrame, groupCol: String = "source",
                     minMeanChars: Long = 250L,
                     maxDupPpm: Long = 100000L): DataFrame = {
    val stats = docs.groupBy(groupCol).agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("chars_total"),
        countDistinct(xxhash64(col("text"))).as("n_distinct"))
      .withColumn("mean_chars", expr("chars_total DIV n_docs"))
      .withColumn("dup_ppm", expr("(n_docs - n_distinct) * 1000000 DIV n_docs"))
      .withColumn("src_kept",
        when(col("mean_chars") >= minMeanChars && col("dup_ppm") <= maxDupPpm,
          1L).otherwise(0L))
    docs.select(col("doc_id"), col(groupCol))
      .join(broadcast(stats.select(col(groupCol), col("n_docs"),
        col("mean_chars"), col("dup_ppm"), col("src_kept"))), Seq(groupCol))
      .select("doc_id", groupCol, "n_docs", "mean_chars", "dup_ppm", "src_kept")
  }

  /** CCNet-style per-source quality tiers (Wenzek et al. 2020 §4.4:
    * per-LANGUAGE perplexity terciles — each domain judged against its
    * OWN score distribution, because a fixed global cut keeps only the
    * easy languages/domains and guts the rest): every doc gets its
    * within-source rank over `scores` (higher score = better, doc_id
    * tiebreak), the rank's position as exact ppm, and a
    * head/middle/tail label at the caller's cut points. A source with
    * one doc ranks 0 ppm = head.
    *
    * Shape: one shuffle on the source key + a within-source sort — the
    * EXACT form, right for calibration runs and the oracle. At 100 TB
    * with a handful of sources the per-source sort is the skew
    * bottleneck; the serving path is [[tiersFromThresholds]]: derive
    * per-source SCORE cutoffs once (from this form on a sample, or
    * from [[graft.operators.IncrementalAgg.quantilesFromState]]'s
    * maintained histograms), then label with a broadcast join + narrow
    * CASE — no sort anywhere near the corpus. */
  def perSourceTiers(docs: DataFrame, scores: DataFrame,
                     keyCol: String = "source",
                     headPpm: Long = 300000L,
                     midPpm: Long = 650000L): DataFrame = {
    val j = scores.select("doc_id", "score_ppm")
      .join(docs.select(col("doc_id"), col(keyCol)), "doc_id")
    val byScore = Window.partitionBy(keyCol)
      .orderBy(col("score_ppm").desc, col("doc_id"))
    j.withColumn("rnk", row_number().over(byScore).cast("long"))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy(keyCol)))
      .withColumn("rank_ppm", expr("(rnk - 1) * 1000000 DIV n_src"))
      .withColumn("tier", when(col("rank_ppm") < headPpm, "head")
        .when(col("rank_ppm") < midPpm, "middle").otherwise("tail"))
      .select("doc_id", keyCol, "score_ppm", "rnk", "n_src", "rank_ppm", "tier")
  }

  /** [[perSourceTiers]]'s serving form: label against PRECOMPUTED
    * per-source score cutoffs — `thresholds` rows are (key,
    * head_min, mid_min) with tier = head when score_ppm ≥ head_min,
    * middle when ≥ mid_min, else tail. Broadcast join + narrow CASE:
    * no sort, no skew, scan-bound — cutoffs move to a calibration
    * pass that runs on a sample or off maintained histogram state.
    * Equals the exact form whenever the cutoffs are the exact tier
    * boundaries and no tie straddles one (a tie ACROSS a rank cut is
    * unresolvable by score alone — rank forms split it arbitrarily,
    * threshold forms keep the whole tie on one side).
    *
    * A source with NO cutoff row (it appeared after calibration) is
    * labeled `defaultTier` ('uncalibrated') — never silently dropped:
    * an inner join here would make a new source vanish from the
    * labeled corpus with no signal, the worst failure mode a serving
    * path can have. Callers route 'uncalibrated' to the next
    * calibration pass (or gate on it). */
  def tiersFromThresholds(docs: DataFrame, scores: DataFrame,
                          thresholds: DataFrame,
                          keyCol: String = "source",
                          defaultTier: String = "uncalibrated"): DataFrame =
    scores.select("doc_id", "score_ppm")
      .join(docs.select(col("doc_id"), col(keyCol)), "doc_id")
      .join(broadcast(thresholds), Seq(keyCol), "left")
      .withColumn("tier",
        when(col("head_min").isNull && col("mid_min").isNull,
          lit(defaultTier))
        .when(col("score_ppm") >= col("head_min"), "head")
        .when(col("score_ppm") >= col("mid_min"), "middle")
        .otherwise("tail"))
      .select("doc_id", keyCol, "score_ppm", "tier")

  /** Corpus COMPOSITION REPORT — the "data card" table every corpus
    * release publishes (The Pile / ROOTS / Dolma composition tables):
    * per (source, language): document count, token count, and the
    * exact token share of the whole corpus in ppm. The table a data
    * recipe ([[targetShareMix]], [[temperatureSample]]) is tuned
    * against and the release artifact auditors read.
    *
    * Shape: one map-side-combined group aggregate; the corpus total
    * rides back as a broadcast 1-row cross join (the established
    * count-table pattern); share is integer-exact. Scan-bound at any
    * corpus size. */
  def compositionReport(docs: DataFrame, srcCol: String = "source",
                        langCol: String = "lang"): DataFrame = {
    val byGrp = docs.groupBy(srcCol, langCol).agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val tot = byGrp.agg(sum("n_tokens").as("t_tokens"))
    byGrp.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("n_tokens * 1000000 DIV t_tokens"))
      .select(col(srcCol), col(langCol), col("n_docs"), col("n_tokens"),
        col("share_ppm"))
  }

  /** Per-benchmark CONTAMINATION MATRIX — the release data-card
    * decontamination table: for each named benchmark set, how many
    * corpus docs share more than `maxShared` distinct k-gram shingles
    * with it, plus the total and worst per-doc overlap. One
    * [[decontaminate]] pass per benchmark (each a broadcast semi-join —
    * benchmark shingle sets are small by definition); the corpus is
    * never self-joined, and the per-benchmark aggregate is one row. */
  def contaminationMatrix(corpus: DataFrame,
                          benchmarks: Seq[(String, DataFrame)],
                          k: Int = 5, maxShared: Long = 0L): DataFrame = {
    // reduce over an empty list throws a bare UnsupportedOperationException
    // — fail with the actual mistake named instead
    require(benchmarks.nonEmpty,
      "contaminationMatrix needs at least one (name, benchmark) pair")
    benchmarks.map { case (name, b) =>
      decontaminate(corpus, b, k)
        .agg(count(when(col("n_shared") > maxShared, 1)).as("n_contaminated"),
          coalesce(sum("n_shared"), lit(0L)).as("total_shared"),
          coalesce(max("n_shared"), lit(0L)).as("max_shared"))
        .withColumn("benchmark", lit(name))
    }.reduce(_ unionByName _)
      .select("benchmark", "n_contaminated", "total_shared", "max_shared")
  }

  /** [[contaminationMatrix]]'s sufficient statistics as MERGEABLE state
    * — the maintained form for a corpus that arrives in batches (the
    * q93/q110/q142/q152 discipline): per (benchmark, doc_id), the
    * distinct-shared-shingle count of every flagged document in THIS
    * batch. A document's overlap with a fixed benchmark set depends
    * only on its own text, so for doc-disjoint batches
    * merge(state(A), state(B)) == state(A ∪ B) exactly, and a replayed
    * batch's identical rows collapse on (benchmark, doc_id) identity —
    * the matrix is maintained per batch without ever rescanning corpus
    * history. Cost per batch = one [[decontaminate]] pass per benchmark
    * over the BATCH (broadcast benchmark shingle sets). */
  def contaminationState(corpusBatch: DataFrame,
                         benchmarks: Seq[(String, DataFrame)],
                         k: Int = 5): DataFrame = {
    require(benchmarks.nonEmpty,
      "contaminationState needs at least one (name, benchmark) pair")
    benchmarks.map { case (name, b) =>
      decontaminate(corpusBatch, b, k).withColumn("benchmark", lit(name))
    }.reduce(_ unionByName _)
      .select("benchmark", "doc_id", "n_shared")
  }

  /** Fold two contamination states — union + identity dedup (replays
    * and overlapping re-sends of identical docs collapse; genuinely
    * doc-disjoint batches just concatenate). */
  def mergeContaminationState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).dropDuplicates("benchmark", "doc_id")

  /** Serve the release matrix off maintained state — one aggregate over
    * the (small) flagged-doc table, never the corpus. `benchmarkNames`
    * pins the output universe so a benchmark with zero flagged docs
    * still reads an explicit all-zero row, exactly as
    * [[contaminationMatrix]] emits it. */
  def matrixFromState(state: DataFrame, benchmarkNames: Seq[String],
                      maxShared: Long = 0L): DataFrame = {
    require(benchmarkNames.nonEmpty,
      "matrixFromState needs at least one benchmark name")
    val spark = state.sparkSession
    import spark.implicits._
    val agg = state.groupBy("benchmark")
      .agg(count(when(col("n_shared") > maxShared, 1)).as("n_contaminated"),
        sum("n_shared").as("total_shared"),
        max("n_shared").as("max_shared"))
    benchmarkNames.toDF("benchmark").join(agg, Seq("benchmark"), "left")
      .select(col("benchmark"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("total_shared"), lit(0L)).as("total_shared"),
        coalesce(col("max_shared"), lit(0L)).as("max_shared"))
  }

  /** Distribution DRIFT between two corpus snapshots — the ops monitor
    * for composition regressions between releases (a source whose share
    * moved is a recipe change, intended or not): per key, each
    * snapshot's exact integer share in ppm and the absolute drift.
    * Two map-side-combined counts + a broadcast 1-row total each (the
    * [[compositionReport]] pattern) + one key-keyed full-outer join;
    * a key present in only one snapshot reads share 0 in the other —
    * appearing/vanishing sources are drift, not errors. */
  def distributionDrift(snapA: DataFrame, snapB: DataFrame,
                        keyCol: String): DataFrame = {
    def shares(df: DataFrame, as: String) = {
      val c = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
      c.crossJoin(broadcast(c.agg(sum("n").as("tot"))))
        .select(col(keyCol), expr("n * 1000000 DIV tot").as(as))
    }
    shares(snapA, "share_a_ppm")
      .join(shares(snapB, "share_b_ppm"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        coalesce(col("share_a_ppm"), lit(0L)).as("share_a_ppm"),
        coalesce(col("share_b_ppm"), lit(0L)).as("share_b_ppm"))
      .withColumn("drift_ppm", abs(col("share_a_ppm") - col("share_b_ppm")))
  }

  /** Token FREQUENCY SPECTRUM (count-of-counts) with Good–Turing
    * adjusted counts — the classic corpus statistic (Gale & Sampson's
    * "frequency of frequencies") that feeds Good–Turing smoothing and
    * reads off vocabulary health at a glance (N₁/N = unseen-mass
    * estimate; a fat singleton tail means OCR noise or unsegmented
    * text). Per occurrence count r: N_r = number of vocabulary types
    * seen exactly r times, and the GT adjusted count
    * r* = (r+1)·N_{r+1}/N_r in exact ppm (0 where N_{r+1} is empty —
    * the raw-spectrum convention; smoothing of the gappy tail is the
    * caller's choice).
    *
    * Scale shape: one token scan → vocab-keyed count (map-side
    * combined) → count-keyed spectrum aggregate; the spectrum is tiny
    * (≤ distinct r values ≈ hundreds at any corpus size), so the r+1
    * self-join is free. NO global rank/sort anywhere — this is the
    * Zipf view that does not need the Zipf ranking. */
  def frequencySpectrum(docs: DataFrame): DataFrame = {
    val cnt = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("r"))
    val spec = cnt.groupBy("r").agg(count(lit(1)).as("n_r"))
    // a spectrum row for count r' supplies N_{r+1} to the row r = r'−1
    val next = spec.select((col("r") - 1).as("r"), col("n_r").as("n_next"))
    // (r+1)·N_{r+1}·10⁶ accumulates in DECIMAL(38,0) (the
    // centroidOutliers discipline): r·N_{r+1} is bounded by total
    // tokens T, so a BIGINT product would wrap silently past T ≈ 9e12
    // — decimal keeps the ppm exact at any corpus size (the BIGINT
    // result column itself is safe: DIV by n_r ≥ 1 lands back under T·10⁶
    // only when the product fit, and with decimal it always computes
    // exactly first)
    spec.join(next, Seq("r"), "left")
      .select(col("r"), col("n_r"),
        expr("coalesce(CAST((CAST(r AS DECIMAL(38,0)) + 1) * n_next * 1000000 " +
          "DIV n_r AS BIGINT), 0)")
          .as("gt_star_ppm"))
  }

  /** Deterministic unigram-tokenizer VOCABULARY from the corpus itself:
    * every character substring (length 1..`maxPieceLen`) of every word,
    * occurrence-weighted, kept at `minFreq`+, scored
    * floor(log2(freq)) + 1 − 64 via exact `length(bin(freq))` (the DSIR
    * bin()-trick — a frequent piece is a cheap piece, and every piece
    * costs ≤ −43, so the [[unigramSegmentWords]] DP prefers FEW,
    * FREQUENT pieces exactly like a unigram LM's Σ log p). Real
    * SentencePiece trains this table by EM — the derivation here is the
    * deterministic stand-in that keeps the whole tokenizer oracle-
    * replayable; swap any (piece, score) table in, the DP doesn't care.
    *
    * Shape: the substring explode runs over the DISTINCT-word table
    * (occurrence counts ride along), so its row count is
    * |word vocab|·len·maxPieceLen, not the token stream; one
    * map-side-combined piece count. */
  def unigramVocab(docs: DataFrame, maxPieceLen: Int = 4,
                   minFreq: Long = 8L): DataFrame = {
    val wcnt = docs.select(explode(split(col("text"), " ")).as("wd"))
      .filter(col("wd") =!= "")
      .groupBy("wd").agg(count(lit(1)).as("cnt"))
    wcnt.select(col("wd"), col("cnt"),
        explode(sequence(lit(1), length(col("wd")))).as("st"))
      .select(col("wd"), col("cnt"), col("st"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("ln"))
      .filter(col("st") + col("ln") - 1 <= length(col("wd")))
      .select(expr("substring(wd, st, ln)").as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("freq"))
      .filter(col("freq") >= minFreq)
      .select(col("piece"),
        (length(bin(col("freq"))) - 64).cast("long").as("score"))
  }

  /** Unigram-LM Viterbi segmentation of a word table — the
    * SentencePiece APPLY step ([[graft.functions.UnigramViterbi]], a
    * codegen'd native expression; q111's BPE is the TRAIN-side
    * counterpart). `words` needs a `wd` column; `vocab` is any
    * (piece, score) table — [[unigramVocab]] or an externally-trained
    * model. Returns (wd, score, n_pieces, pieces): the optimal
    * (max Σ score, then fewest pieces) segmentation, single unknown
    * characters falling back to `unkScore`.
    *
    * Scale shape: the vocab COLLECTS driver-side (tokenizer vocabs are
    * ~10⁴–10⁵ rows by construction — the KMeans/threshold-table collect
    * pattern) and rides the generated code as a sorted reference array;
    * segmentation is then a narrow per-row expression — no join, no
    * shuffle. Call it on DISTINCT words and equi-join the result back
    * to the token stream: at 100 TB the DP runs |word vocab| times,
    * never per token. */
  def unigramSegmentWords(words: DataFrame, vocab: DataFrame,
                          maxPieceLen: Int = 4,
                          unkScore: Long = -1000L): DataFrame = {
    import org.apache.spark.unsafe.types.UTF8String
    val entries = vocab.select(col("piece").cast("string"),
        col("score").cast("long")).collect()
      .map(r => (UTF8String.fromString(r.getString(0)), r.getLong(1)))
      .sortBy(_._1) // UTF8String binary order — the lookup's search order
    val seg = graft.functions.UnigramViterbi.unigram_viterbi(
      col("wd"), entries.map(_._1), entries.map(_._2), maxPieceLen, unkScore)
    // decode the additive DP key (sign-safe: pmod, then an exact DIV)
    words.withColumn("seg", seg)
      .withColumn("m", pmod(col("seg.key"), lit(1024L)))
      .select(col("wd"),
        expr("CAST((seg.key - m) DIV 1024 AS BIGINT)").as("score"),
        (lit(1023L) - col("m")).cast("long").as("n_pieces"),
        col("seg.pieces").as("pieces"))
  }

  /** Per-document token counts under the unigram tokenizer — the
    * REAL-tokenizer replacement for the whitespace token counts the
    * budget/packing operators default to (a token budget measured in
    * whitespace words misprices code, CJK, and URL-heavy documents).
    * Exactly the documented scale pattern: Viterbi runs ONCE per
    * distinct word ([[unigramSegmentWords]] — |word vocab| DP calls),
    * then one equi-join back onto the word-occurrence stream and a
    * doc-keyed sum. Returns (doc_id, n_tokens): Σ over the doc's word
    * occurrences of the word's optimal piece count. Empty/whitespace
    * docs read 0. */
  def unigramTokenCount(docs: DataFrame, vocab: DataFrame,
                        maxPieceLen: Int = 4,
                        unkScore: Long = -1000L): DataFrame = {
    val occ = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("wd"))
      .filter(col("wd") =!= "")
    val perWord = unigramSegmentWords(occ.select("wd").distinct(), vocab,
      maxPieceLen, unkScore).select("wd", "n_pieces")
    docs.select("doc_id")
      .join(occ.join(perWord, Seq("wd"))
          .groupBy("doc_id").agg(sum("n_pieces").as("n_tokens")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** DATA-CONSTRAINED EPOCH PLAN — water-filling token allocation
    * (the mixture-EXECUTION step after a DoReMi-style reweighting,
    * under the Muennighoff et al. 2023 data-constrained scaling rule
    * that repeating a domain beyond ~4 epochs stops helping): allocate
    * `budgetTokens` across domains proportionally to `weight_ppm`,
    * capping each domain at `tokens·maxEpochsPpm/scale`; excess from
    * capped domains redistributes among the uncapped ones
    * proportionally to their weights, iterated to fixpoint (≤ one new
    * cap per round, so `iters` ≥ domain count converges; default 6).
    * BIGINT floor division throughout — same corpus ⇒ same plan on any
    * engine. Budget overflow bound: rem·weight_ppm < 2⁶³ ⇒ budgets up
    * to ~9.2e12 tokens at scale 10⁶ (pass a smaller scale beyond) —
    * ENFORCED per row (round-13 ADVICE: the non-ANSI long product
    * would wrap silently where the DuckDB oracle promotes to HUGEINT,
    * so an oversized budget raises instead of silently misallocating).
    *
    * Input: one row per domain (domain, tokens, weight_ppm). Output:
    * (domain, tokens, weight_ppm, alloc_tokens, epochs_ppm, capped).
    * Floor-division remainders stay unallocated (deterministic).
    *
    * Scale shape: the domain table is bounded (sources, not documents)
    * — each round is a one-partition window over that tiny frame; the
    * corpus-scale work (per-domain token counts) is the caller's one
    * scan. Same cost model as [[Rlhf.domainMixtureMW]]. */
  def epochPlan(domains: DataFrame, budgetTokens: Long,
                maxEpochsPpm: Long = 4000000L, iters: Int = 6,
                scale: Long = 1000000L,
                maxLocalDomains: Long = 1L << 12): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    // COUNT-GATED LOCAL FINISH (the Rlhf.fitFromState discipline): the
    // domain table is source-bounded by contract — when it fits the
    // knob, the iters checkpointed window rounds collapse to one
    // collect + identical Long floor-division arithmetic on the driver
    // (spec-pinned bit-equal); 0 forces the distributed loop.
    val staged = Stage(domains.select(col("domain"),
      col("tokens").cast("long").as("tokens"),
      col("weight_ppm").cast("long").as("weight_ppm")))
    if (maxLocalDomains > 0 && staged.count() <= maxLocalDomains)
      return epochPlanLocal(staged, budgetTokens, maxEpochsPpm, iters, scale)
    // loud overflow guard on the one long-typed product (see scaladoc)
    val shareExpr =
      s"CASE WHEN weight_ppm > 0 AND rem > ${Long.MaxValue}L DIV weight_ppm " +
        "THEN CAST(raise_error('epochPlan: rem*weight_ppm overflows BIGINT " +
        "(rem ' || rem || ', weight_ppm ' || weight_ppm || ') — pass a " +
        "smaller scale or budget') AS BIGINT) " +
        "ELSE rem * weight_ppm DIV greatest(sumw, 1L) END"
    val all = Window.partitionBy(lit(1))
    var cur = staged
      .withColumn("cap", expr(s"tokens * ${maxEpochsPpm}L DIV ${scale}L"))
      .withColumn("capped", lit(false))
    for (_ <- 1 to iters) {
      cur = Stage(cur
        .withColumn("used",
          sum(when(col("capped"), col("cap")).otherwise(lit(0L))).over(all))
        .withColumn("sumw",
          sum(when(!col("capped"), col("weight_ppm")).otherwise(lit(0L))).over(all))
        .withColumn("rem", greatest(lit(budgetTokens) - col("used"), lit(0L)))
        // capped rows skip the guarded product entirely (round-14
        // ADVICE: the local path only calls share() for uncapped rows,
        // so in the rem*weight overflow regime an ungated expression
        // would raise here where the local path succeeds — the paths
        // must fail identically to keep the bit-equal contract)
        .withColumn("share",
          expr(s"CASE WHEN capped THEN 0L ELSE ($shareExpr) END"))
        .withColumn("capped", col("capped") || col("share") >= col("cap"))
        .select("domain", "tokens", "weight_ppm", "cap", "capped"))
    }
    // final allocation against the fixpoint capped set
    cur
      .withColumn("used",
        sum(when(col("capped"), col("cap")).otherwise(lit(0L))).over(all))
      .withColumn("sumw",
        sum(when(!col("capped"), col("weight_ppm")).otherwise(lit(0L))).over(all))
      .withColumn("rem", greatest(lit(budgetTokens) - col("used"), lit(0L)))
      .withColumn("alloc", when(col("capped"), col("cap"))
        .otherwise(expr(shareExpr)))
      .select(col("domain"), col("tokens"), col("weight_ppm"),
        col("alloc").as("alloc_tokens"),
        expr(s"alloc * ${scale}L DIV greatest(tokens, 1L)").as("epochs_ppm"),
        col("capped"))
  }

  /** Driver-local water-fill over a collected (count-gated) domain
    * table — Long arithmetic matching the distributed plan's BIGINT
    * ops exactly, including the rem·weight_ppm overflow guard.
    * Spec-pinned bit-equal to the distributed rounds. */
  private def epochPlanLocal(domains: DataFrame, budgetTokens: Long,
                             maxEpochsPpm: Long, iters: Int,
                             scale: Long): DataFrame = {
    val spark = domains.sparkSession
    val rows = domains.collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2)))
    val cap = rows.map(r => r._2 * maxEpochsPpm / scale)
    val capped = rows.map(_ => false)
    def share(rem: Long, weight: Long, sumw: Long): Long = {
      if (weight > 0 && rem > Long.MaxValue / weight)
        throw new IllegalArgumentException(
          s"epochPlan: rem*weight_ppm overflows BIGINT (rem $rem, " +
            s"weight_ppm $weight) — pass a smaller scale or budget")
      rem * weight / math.max(sumw, 1L)
    }
    def pools(): (Long, Long) = {
      var used = 0L; var sumw = 0L
      rows.indices.foreach { i =>
        if (capped(i)) used += cap(i) else sumw += rows(i)._3
      }
      (math.max(budgetTokens - used, 0L), sumw)
    }
    for (_ <- 1 to iters) {
      val (rem, sumw) = pools()
      rows.indices.foreach { i =>
        if (!capped(i) && share(rem, rows(i)._3, sumw) >= cap(i))
          capped(i) = true
      }
    }
    val (rem, sumw) = pools()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      domains.schema("domain"),
      org.apache.spark.sql.types.StructField("tokens",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("weight_ppm",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("alloc_tokens",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("epochs_ppm",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("capped",
        org.apache.spark.sql.types.BooleanType, nullable = false)))
    val out = rows.indices.map { i =>
      val alloc = if (capped(i)) cap(i)
        else share(rem, rows(i)._3, sumw)
      org.apache.spark.sql.Row(rows(i)._1, rows(i)._2, rows(i)._3,
        alloc, alloc * scale / math.max(rows(i)._2, 1L), capped(i))
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava), schema)
  }

  /** DuckDB CTE chain replaying [[epochPlan]] round for round. Expects
    * an `ep0(domain, tokens, weight_ppm)` CTE in scope; emits
    * `ep(domain, tokens, weight_ppm, alloc_tokens, epochs_ppm, capped)`.
    * `budgetSql` is a SQL expression (literal or scalar subquery, e.g.
    * `"(SELECT 2*sum(tokens) FROM ep0)"`) so a data-derived budget
    * replays exactly — the Spark entry computes the same scalar. */
  def epochPlanSql(budgetSql: String, maxEpochsPpm: Long = 4000000L,
                   iters: Int = 6, scale: Long = 1000000L): String = {
    val sb = new StringBuilder
    sb.append(s" epc0 AS MATERIALIZED (SELECT domain, tokens, weight_ppm,\n")
    sb.append(s"    tokens * $maxEpochsPpm // $scale AS cap, FALSE AS capped FROM ep0),\n")
    (1 to iters).foreach { t =>
      // sums over the capped/uncapped split are HUGEINT in DuckDB —
      // CAST the derived share back to BIGINT at every round boundary
      sb.append(s" epc$t AS MATERIALIZED (SELECT domain, tokens, weight_ppm, cap,\n")
      sb.append(s"    capped OR CAST(g.rem * weight_ppm // greatest(g.sumw, 1) AS BIGINT) >= cap AS capped\n")
      sb.append(s"   FROM epc${t - 1}, (SELECT\n")
      sb.append(s"      greatest($budgetSql - sum(CASE WHEN capped THEN cap ELSE 0 END), 0) AS rem,\n")
      sb.append(s"      sum(CASE WHEN capped THEN 0 ELSE weight_ppm END) AS sumw\n")
      sb.append(s"     FROM epc${t - 1}) g),\n")
    }
    sb.append(s" ep AS (SELECT domain, tokens, weight_ppm,\n")
    sb.append(s"    CAST(CASE WHEN capped THEN cap\n")
    sb.append(s"         ELSE g.rem * weight_ppm // greatest(g.sumw, 1) END AS BIGINT) AS alloc_tokens,\n")
    sb.append(s"    CAST(CASE WHEN capped THEN cap\n")
    sb.append(s"         ELSE g.rem * weight_ppm // greatest(g.sumw, 1) END\n")
    sb.append(s"      * $scale // greatest(tokens, 1) AS BIGINT) AS epochs_ppm, capped\n")
    sb.append(s"   FROM epc$iters, (SELECT\n")
    sb.append(s"      greatest($budgetSql - sum(CASE WHEN capped THEN cap ELSE 0 END), 0) AS rem,\n")
    sb.append(s"      sum(CASE WHEN capped THEN 0 ELSE weight_ppm END) AS sumw\n")
    sb.append(s"     FROM epc$iters) g)")
    sb.toString
  }

  /** STRIDE-SCHEDULED MIXTURE INTERLEAVING — the deterministic
    * training ORDER a weighted mixture implies (stride scheduling /
    * weighted round-robin, Waldspurger's lottery-stride form in
    * integer fixed-point): doc d with within-domain rank r (by the
    * [[PolyHash]] order — the repo's deterministic shuffle) gets
    * virtual time v = r·scale²/w_domain, and the global order sorts by
    * (v, domain, doc_id). A domain with twice the weight appears twice
    * as often in any window of the resulting stream — the property
    * per-shard mixture consumers need so every training window sees
    * the planned mixture, not whole domains back to back.
    *
    * Scale shape: one window per domain (rank), then the global dense
    * position via RANGE partitioning + per-partition offsets — NOT a
    * partition-less row_number window (which funnels the whole corpus
    * through one task): the stream range-exchanges on the unique total
    * key (v, domain, doc_id), sorts within partitions, and each row's
    * position = its local rank + the broadcast running offset of the
    * partitions before it. The offset table is one row per PARTITION
    * (never data-scale), and the dense position is invariant to where
    * the sampled range boundaries fall, so the result is deterministic
    * even though the partitioner samples. Overflow: r·scale² < 2⁶³ ⇒
    * per-domain ranks up to ~9.2e6 at scale 10⁶; larger corpora pass a
    * smaller scale — ENFORCED at runtime (round-13 ADVICE: Spark's
    * non-ANSI long product wraps silently while the DuckDB oracle
    * computes v in HUGEINT, so an oversized corpus would reorder with
    * no error; the per-row guard raises instead). */
  def strideInterleave(docs: DataFrame, domainCol: String,
                       weights: DataFrame,
                       scale: Long = 1000000L): DataFrame =
    globalDensePos(strideKeyed(docs.select(col("doc_id"), col(domainCol)),
      domainCol, weights, scale), domainCol)
      .select(col("pos"), col("doc_id"), col(domainCol), col("r"), col("v"))

  /** The stride-keying stage shared by [[strideInterleave]] and
    * [[plannedInterleave]]: join the broadcast weight table, rank each
    * domain by the PolyHash shuffle order, and compute the guarded
    * virtual time v = r·scale²/w (raise_error past the documented
    * rank bound — round-13 ADVICE). Extra input columns pass through. */
  private def strideKeyed(docs: DataFrame, domainCol: String,
                          weights: DataFrame, scale: Long): DataFrame = {
    require(scale >= 1 && scale <= 3037000499L,
      s"scale must be in [1, 3037000499] so scale*scale fits a Long, got $scale")
    val maxRank = Long.MaxValue / (scale * scale)
    val byDomain = Window.partitionBy(domainCol)
      .orderBy(PolyHash.poly_hash(col("doc_id").cast("string")),
        col("doc_id"))
    docs.join(broadcast(weights), Seq(domainCol))
      .withColumn("r", row_number().over(byDomain).cast("long"))
      .withColumn("v", expr(
        s"CASE WHEN r > ${maxRank}L THEN CAST(raise_error(" +
          s"'strideInterleave: per-domain rank ' || r || ' overflows " +
          s"r*scale*scale at scale $scale — pass a smaller scale') AS BIGINT) " +
          s"ELSE r * ${scale}L * ${scale}L DIV greatest(weight_ppm, 1L) END"))
  }

  /** Global DENSE position over `rows` by (v, domain, doc_id) — the
    * no-single-reducer core shared by the interleave operators: the
    * stream range-exchanges on the unique total key, sorts within
    * partitions, and each row's position = its local rank + the
    * broadcast running offset of the partitions before it. The offset
    * table is one row per PARTITION (never data-scale) and the result
    * is invariant to where the sampled range boundaries fall. Keeps
    * every input column; adds `pos`. */
  private def globalDensePos(rows: DataFrame, domainCol: String): DataFrame = {
    val sorted = Stage(rows
      .repartitionByRange(col("v"), col(domainCol), col("doc_id"))
      .sortWithinPartitions(col("v"), col(domainCol), col("doc_id"))
      .withColumn("__pid", spark_partition_id().cast("long")))
    // running offset per range partition: partition-count rows, tiny
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(offW), lit(0L)))
      .select("__pid", "__off")
    val localW = Window.partitionBy("__pid")
      .orderBy(col("v"), col(domainCol), col("doc_id"))
    sorted
      .withColumn("__lr", row_number().over(localW).cast("long"))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("pos", col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
  }

  /** EPOCH-PLAN-CONSTRAINED INTERLEAVE — execute the mixture plan:
    * the [[strideInterleave]] order with each domain's stream CAPPED
    * at its [[epochPlan]] token allocation, closing the mixture-
    * execution arc (loss → DoReMi weights → water-filled allocations →
    * the budget-capped training stream a DataLoader consumes). A
    * domain's docs are admitted in stride order while the running
    * token total has not yet crossed alloc_tokens, crossing the budget
    * once ([[tokenBudgetMix]]'s convention: keep while cum − n_tokens
    * < alloc), then the global dense position is recomputed over the
    * SURVIVORS — so the emitted stream is exactly the planned mixture,
    * ends when the plan says it ends, and every window of it still
    * sees the weight-proportional interleave while domains last.
    *
    * Scale shape: [[strideKeyed]]'s one rank window per domain, ONE
    * more per-domain cumsum window (same partitioning — no extra
    * shuffle class), a broadcast join against the bounded plan table,
    * and the shared range-partition + per-partition-offset position
    * core — never a single-reducer window. */
  def plannedInterleave(docs: DataFrame, domainCol: String,
                        weights: DataFrame, plan: DataFrame,
                        tokenCol: String = "n_tokens",
                        scale: Long = 1000000L): DataFrame = {
    val keyed = strideKeyed(
      docs.select(col("doc_id"), col(domainCol), col(tokenCol)),
      domainCol, weights, scale)
    val cumW = Window.partitionBy(domainCol).orderBy("r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val capped = keyed
      .join(broadcast(plan.select(col("domain").as(domainCol),
        col("alloc_tokens"))), Seq(domainCol))
      .withColumn("__cum", sum(col(tokenCol)).over(cumW))
      .filter(col("__cum") - col(tokenCol) < col("alloc_tokens"))
      // narrow BEFORE the range exchange + checkpoint: the weight,
      // allocation and cumsum columns are spent once the gate passed
      .select(col("doc_id"), col(domainCol), col("r"), col("v"),
        col(tokenCol))
    globalDensePos(capped, domainCol)
      .select(col("pos"), col("doc_id"), col(domainCol), col("r"),
        col("v"), col(tokenCol))
  }
}
