package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token stats,
  * quality scoring, language ID, document fingerprinting.
  *
  * Determinism contract: every derived metric is either pure integer
  * arithmetic or an identical-IEEE double op, so results hash-match a
  * DuckDB oracle exactly. Ratios are scaled integers (ppm) computed with
  * integer division (`DIV`), never floating division.
  *
  * Scale: all operators are narrow per-row expressions inside whole-stage
  * codegen — no shuffle, no UDF. A 100 TB corpus runs these at scan speed.
  */
object TextAnalysis {

  /** words of `text` split on single spaces (the corpus convention). */
  def words(text: Column): Column = split(text, " ")

  /** exact count of tokens equal to `w` (list-filter, not substring —
    * avoids overlapping-match ambiguity between engines). */
  def tokenCount(text: Column, w: String): Column =
    size(filter(words(text), x => x === lit(w)))

  /** doc_id, n_tokens, n_chars, avg token length in ppm (integer). */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"),
      expr("(CAST(length(text) AS BIGINT) * 1000000) DIV CAST(size(split(text, ' ')) AS BIGINT)")
        .as("avg_tok_len_ppm"))

  private val stopwords = Seq("the", "a", "of", "and", "to")

  /** Quality score: stopword ratio (ppm) + short-doc flag. Mirrors the
    * length/stopword-ratio heuristics used in public corpus-cleaning
    * pipelines (e.g. C4/Gopher rules), kept integer-exact. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val stopCnt = stopwords.map(w => tokenCount(col("text"), w).cast("long"))
      .reduce(_ + _)
    docs.select(
        col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"),
        stopCnt.as("stop_cnt"))
      .withColumn("stop_ppm", expr("(stop_cnt * 1000000) DIV n_tokens"))
      .withColumn("is_short", (col("n_tokens") < 20).cast("int"))
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "la"),
    "es" -> Seq("el", "y", "los"))

  /** Marker-token language ID (n-gram-heuristic family): score each
    * language by marker-token hits, argmax with a fixed precedence order
    * so ties are deterministic. */
  def langId(docs: DataFrame): DataFrame = {
    val scored = langMarkers.foldLeft(docs.select(col("doc_id"), col("text"))) {
      case (d, (lang, ms)) =>
        d.withColumn(s"score_$lang",
          ms.map(w => tokenCount(col("text"), w).cast("long")).reduce(_ + _))
    }
    val pred = when(col("score_en") >= col("score_de") && col("score_en") >= col("score_fr")
        && col("score_en") >= col("score_es"), lit("en"))
      .when(col("score_de") >= col("score_fr") && col("score_de") >= col("score_es"), lit("de"))
      .when(col("score_fr") >= col("score_es"), lit("fr"))
      .otherwise(lit("es"))
    scored.withColumn("pred_lang", pred).drop("text")
  }

  /** Repetition metrics — the distinct-token-ratio family of quality
    * rules (Gopher-style corpus cleaning): machine-generated / looping
    * text collapses to few distinct tokens. Outputs per doc: n_tokens,
    * n_distinct, distinct_ppm = n_distinct·1e6 DIV n_tokens, and the
    * max single-token share in ppm (a doc that is 40% one token is
    * boilerplate whatever its distinct ratio). Narrow per-row array
    * expressions, all linear/linearithmic in the token count — a
    * per-distinct-token rescan would be O(distinct·n) and melt on
    * exactly the long degenerate documents this filter targets. */
  /** most frequent element's count — NATIVE one-pass hash count
    * ([[graft.functions.GramCounts]]). Was an array_sort + interpreted
    * fold: HOFs are CodegenFallback and interpreted subtrees get no
    * CSE, so every projection referencing one re-ran the sort — the
    * honest-bench sweep measured q127 at 73 s over 5,000 hundred-token
    * docs before this. Same value exactly (a count, order-free). */
  private def longestRun(arr: Column): Column =
    graft.functions.GramCounts.max_multiplicity(arr)

  /** the distinct values occurring ≥2 times in `arr` — NATIVE one-pass
    * hash count, emitted in the ascending order the old sorted-fold
    * produced. */
  private def duplicatedValues(arr: Column): Column =
    graft.functions.GramCounts.duplicated_strings(arr)

  def repetitionStats(docs: DataFrame, maxRepPpmFlag: Long = 300000L): DataFrame = {
    val w = words(col("text"))
    val topCnt = longestRun(w)
    docs.select(
        col("doc_id"),
        size(w).cast("long").as("n_tokens"),
        size(array_distinct(w)).cast("long").as("n_distinct"),
        topCnt.as("top_tok_cnt"))
      .withColumn("distinct_ppm", expr("(n_distinct * 1000000) DIV n_tokens"))
      .withColumn("top_tok_ppm", expr("(top_tok_cnt * 1000000) DIV n_tokens"))
      .withColumn("is_repetitive",
        (col("top_tok_ppm") >= maxRepPpmFlag).cast("int"))
  }

  /** pure-Column form of one Gopher top-n-gram rule — the share (ppm)
    * of token mass in the most frequent n-gram, −1 when the doc is
    * shorter than n. A narrow expression usable inside admission gates
    * ([[graft.streaming.CorpusIngest]]) without a DataFrame round-trip.
    * Identical semantics to [[gopherRepetition]]'s top signals (the
    * double division is exact: products stay ≤ ~4e12 < 2^53). */
  def topGramSharePpm(text: Column, n: Int): Column = {
    val g = graft.functions.TokenNgrams.token_ngrams(text, n)
    val nt = size(words(text)).cast("long")
    when(size(g) === 0, lit(-1L))
      .otherwise(floor(longestRun(g) * lit(n.toLong) * lit(1000000L) / nt)
        .cast("long"))
  }

  /** admission-gate predicate: doc passes the top-`n`-gram repetition
    * rule (too-short docs pass — nothing to judge). The expensive
    * sort+fold subtree appears ONCE: HOF expressions are interpreted,
    * so `share === -1 || share <= max` would evaluate it twice per
    * admitted row. */
  def repetitionGate(text: Column, n: Int = 2, maxPpm: Long = 200000L): Column = {
    val g = graft.functions.TokenNgrams.token_ngrams(text, n)
    val nt = size(words(text)).cast("long")
    when(size(g) === 0, lit(true))
      .otherwise(floor(longestRun(g) * lit(n.toLong) * lit(1000000L) / nt)
        .cast("long") <= maxPpm)
  }

  /** Gopher REPETITION signals (Rae et al. 2021 §A1.1, the repetition
    * half the structural [[gopherRules]] leave out; same thresholds
    * family as NeMo-Curator / RefinedWeb reimplementations), token-
    * weighted under the corpus single-space convention:
    *   - top-n-gram share, n ∈ `topNs` (paper: 2,3,4): occurrence mass
    *     of the doc's most frequent n-gram, count·n·1e6 DIV n_tokens —
    *     overlapping occurrences each count, so degenerate docs can
    *     exceed 1e6 (the paper's definition, no coverage dedup);
    *   - duplicate-n-gram coverage, n ∈ `dupNs` (paper: 5..10): tokens
    *     covered by ANY n-gram occurring ≥2 times WITHIN the doc, as
    *     ppm — overlap counted once (coverage, the paper's char-level
    *     dedup rule), the within-doc dual of the cross-document
    *     [[graft.llm.Dedup.removeDuplicateSpans]].
    * Docs shorter than n emit the −1 sentinel for that signal (the
    * [[qualityFeatures]] convention) and the sentinel passes its rule.
    * `rep_pass` = every signal within its threshold.
    *
    * Shape: narrow per-row array expressions only — sort + linear fold
    * for top counts, a duplicated-values fold + exists-over-starts
    * coverage lambda (the q119 rebuild) for duplicate coverage. No
    * shuffle, no join: scan speed at 100 TB, O(len·dups) worst case on
    * exactly the degenerate docs it removes. */
  def gopherRepetition(docs: DataFrame,
                       topNs: Seq[Int] = Seq(2, 3, 4),
                       topMaxPpm: Seq[Long] = Seq(200000L, 180000L, 160000L),
                       dupNs: Seq[Int] = Seq(5, 10),
                       dupMaxPpm: Seq[Long] = Seq(150000L, 100000L)): DataFrame = {
    require(topNs.length == topMaxPpm.length && dupNs.length == dupMaxPpm.length,
      "thresholds must align with their n lists")
    val w = words(col("text"))
    var d = docs.select(col("doc_id"), col("text"),
      size(w).cast("long").as("n_tokens"))
    topNs.foreach { n =>
      d = d.withColumn(s"top${n}_ppm", topGramSharePpm(col("text"), n))
    }
    dupNs.foreach { n =>
      // the whole dup signal (gram counts + duplicated-gram detection +
      // ascending interval merge, −1 sentinel for too-short docs) is ONE
      // native pass — [[graft.functions.GramCounts.dupSpanCoverage]].
      // The HOF pipeline it replaces (filter-over-sequence with an
      // array_contains probe feeding an exists-coverage lambda) was
      // interpreted AND re-evaluated per referencing projection (no CSE
      // outside codegen): q127 measured 73 s over 5,000 hundred-token
      // docs under the honest bench sink before this, scan-speed after.
      d = d.withColumn(s"dup${n}_cov",
        graft.functions.GramCounts.dup_span_coverage(col("text"), n))
      d = d.withColumn(s"dup${n}_ppm",
        when(col(s"dup${n}_cov") < 0L, lit(-1L))
          .otherwise(expr(s"(dup${n}_cov * 1000000) DIV n_tokens")))
        .drop(s"dup${n}_cov")
    }
    val rules =
      topNs.zip(topMaxPpm).map { case (n, t) =>
        col(s"top${n}_ppm") === -1L || col(s"top${n}_ppm") <= t } ++
      dupNs.zip(dupMaxPpm).map { case (n, t) =>
        col(s"dup${n}_ppm") === -1L || col(s"dup${n}_ppm") <= t }
    d.withColumn("rep_pass", rules.reduce(_ && _).cast("long")).drop("text")
  }

  /** Composite rule-based quality filter — the Gopher-rules family
    * (Rae et al. 2021 §A1.1; also C4's heuristics): a document passes
    * only if EVERY structural rule holds. Rules, all integer-exact:
    *   r1 word count within [minTokens, maxTokens];
    *   r2 mean word length within [3, 10] chars (ppm bounds) — under
    *      the corpus single-space convention the token characters are
    *      n_chars − (n_tokens − 1);
    *   r3 symbol-to-word ratio below 10% — '#' characters plus '...'
    *      runs, counted by length-difference after replace (substring
    *      counting that every engine reproduces exactly);
    *   r4 at least 80% of tokens contain an alphabetic character;
    *   r5 at least `minStopKinds` DISTINCT stopwords appear (the
    *      "real prose contains function words" test).
    * Output keeps each rule as a 0/1 column plus a packed bitmask
    * (r1·1 + r2·2 + r3·4 + r4·8 + r5·16) and the conjunction `pass` —
    * downstream filters read one BIGINT, audits read the mask.
    * Narrow per-row expressions, no shuffle: scan speed at 100 TB. */
  def gopherRules(docs: DataFrame, minTokens: Long = 30L,
                  maxTokens: Long = 100000L,
                  minStopKinds: Int = 2): DataFrame = {
    val w = words(col("text"))
    val stopKinds = stopwords.map(s =>
      when(array_contains(w, s), 1L).otherwise(0L)).reduce(_ + _)
    val hashCnt = length(col("text")) -
      length(regexp_replace(col("text"), "#", ""))
    val ellipsisCnt = (length(col("text")) -
      length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / lit(3L)
    val alphaCnt = size(filter(w, t => t.rlike("[A-Za-z]")))
    docs.select(
        col("doc_id"),
        size(w).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        (hashCnt + ellipsisCnt).cast("long").as("sym_cnt"),
        alphaCnt.cast("long").as("alpha_cnt"),
        stopKinds.as("stop_kinds"))
      .withColumn("mwl_ppm",
        expr("(n_chars - n_tokens + 1) * 1000000 DIV n_tokens"))
      .withColumn("sym_ppm", expr("sym_cnt * 1000000 DIV n_tokens"))
      .withColumn("alpha_ppm", expr("alpha_cnt * 1000000 DIV n_tokens"))
      .withColumn("r1",
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens).cast("long"))
      .withColumn("r2",
        (col("mwl_ppm") >= 3000000L && col("mwl_ppm") <= 10000000L).cast("long"))
      .withColumn("r3", (col("sym_ppm") < 100000L).cast("long"))
      .withColumn("r4", (col("alpha_ppm") >= 800000L).cast("long"))
      .withColumn("r5", (col("stop_kinds") >= minStopKinds).cast("long"))
      .withColumn("rule_mask",
        col("r1") + col("r2") * 2 + col("r3") * 4 + col("r4") * 8 + col("r5") * 16)
      .withColumn("pass",
        (col("r1") + col("r2") + col("r3") + col("r4") + col("r5") === 5L).cast("long"))
      .select("doc_id", "n_tokens", "mwl_ppm", "sym_ppm", "alpha_ppm",
        "stop_kinds", "rule_mask", "pass")
  }

  /** Per-document QUALITY FEATURE MATRIX — the feature-extraction step
    * that trains/serves a document-quality classifier (the fastText-
    * style filters of the GPT-3/LLaMA data pipelines): every scan-bound
    * quality signal this library already proves individually —
    * [[tokenStats]] surface stats, [[lexicalDiversity]] vocabulary
    * richness, [[gopherRules]] structural mask, [[ngramNovelty]]
    * cross-corpus originality, [[bigramLmScore]] LM fluency — joined
    * into one doc-keyed table. Signals undefined for short docs
    * (novelty needs ≥ n tokens, the LM score ≥ 2) surface as −1
    * sentinels rather than dropped rows, so the matrix always covers
    * the whole corpus.
    *
    * Shape at 100 TB: each component is one scan + Zipf-small count
    * tables (their own docs); the composition adds only doc-keyed
    * equi-joins of doc-sized aggregates — same-key joins that co-
    * partition after the first shuffle. */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val ts = tokenStats(docs).select("doc_id", "n_tokens", "n_chars",
      "avg_tok_len_ppm")
    val ld = lexicalDiversity(docs).select("doc_id", "ttr_ppm", "hapax_ppm")
    val gr = gopherRules(docs).select(col("doc_id"),
      col("rule_mask").as("gopher_mask"), col("pass").as("gopher_pass"))
    val nv = ngramNovelty(docs, 3).select("doc_id", "novelty_ppm")
    val lm = bigramLmScore(docs).select(col("doc_id"),
      col("score_ppm").as("lm_score_ppm"))
    ts.join(ld, "doc_id").join(gr, "doc_id")
      .join(nv, Seq("doc_id"), "left")
      .join(lm, Seq("doc_id"), "left")
      .na.fill(-1L, Seq("novelty_ppm", "lm_score_ppm"))
  }

  /** PII detection / redaction: flag and mask email-shaped and long-
    * digit-run (phone/card-shaped) tokens. Patterns are deliberately in
    * the common regex subset Java (Spark) and RE2 (other engines) parse
    * identically — character classes, +, {m,}, no backrefs or
    * lookaround. Redaction replaces each match with a fixed tag, so
    * downstream token counts stay aligned. Narrow per-row expressions —
    * scan speed. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val DigitRunRe = "[0-9]{9,}"
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(DigitRunRe), lit(0)))
          .cast("long").as("n_digit_runs"),
        regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          DigitRunRe, "<NUM>").as("scrubbed"))
      .withColumn("has_pii",
        ((col("n_emails") + col("n_digit_runs")) > 0).cast("int"))

  /** Rolling polynomial fingerprint over the token stream:
    * h = fold(tokens, 0; acc*31 + (ascii(first char)*1000 + len)) mod p.
    * Word-level Rabin-Karp-style hash; pure integer arithmetic so it is
    * reproducible in any engine (DuckDB: list_reduce on the same lambda).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      aggregate(
        transform(words(col("text")),
          w => ascii(w).cast("long") * lit(1000L) + length(w).cast("long")),
        lit(0L),
        (acc, h) => (acc * lit(31L) + h) % lit(1000000007L)
      ).as("fingerprint"))

  /** Lexical diversity — the vocabulary-richness quality signals next
    * to the surface stats (q25) and LM score (q94): type-token ratio
    * (distinct/total, low = repetitive boilerplate) and hapax rate
    * (once-occurring / distinct, low = template text), both integer
    * ppm. Two-level aggregate — (doc, token) counts then per-doc rollup
    * — map-side combined on both levels; scan-speed at corpus scale. */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(words(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        count(when(col("c") === 1, 1)).as("n_hapax"))
      .withColumn("ttr_ppm", expr("n_distinct * 1000000 DIV n_tokens"))
      .withColumn("hapax_ppm", expr("n_hapax * 1000000 DIV n_distinct"))

  /** Bigram-LM quality score — the CCNet-shape perplexity filter
    * (score a doc by how typical its token transitions are under a
    * corpus-trained n-gram model), integerized so the estimate is
    * cross-engine exact: per bigram occurrence (w1, w2), MLE
    * p(w2|w1) ≈ c(w1 w2) / c(w1·) in ppm via integer DIV (c(w1·) =
    * occurrences of w1 as a bigram prefix), doc score = integer mean
    * over its occurrences. Boilerplate scores high; text that continues
    * COMMON prefixes in rare ways scores low. Caveat of unsmoothed MLE:
    * a never-seen prefix has p = 1 (its one observed continuation is
    * its whole distribution), so pure-gibberish docs of globally-unique
    * tokens score HIGH, not low — pair with [[lexicalDiversity]] /
    * langId when gibberish is the target (CCNet's trained+smoothed LM
    * does not have this artifact; an exact-integer oracle cannot carry
    * smoothing over an open vocabulary). Threshold downstream. Scale shape: one explode, two count
    * aggregates, two equi-joins back to occurrences (count tables are
    * Zipf-small vs the corpus; broadcast when they fit), one final
    * keyed agg. Docs with fewer than 2 tokens produce no row. */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val bg = docs.select(col("doc_id"),
        explode(graft.functions.TokenNgrams.token_ngrams(col("text"), 2)).as("gram"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
    val cb = bg.groupBy("gram").agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy("w1").agg(count(lit(1)).as("cu"))
    bg.join(cb, "gram").join(cu, "w1")
      .withColumn("term", expr("cb * 1000000 DIV cu"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(term) DIV count(*)").as("score_ppm"))
  }

  /** STUPID BACKOFF trigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the score Google used at
    * web scale precisely BECAUSE it needs no normalization pass):
    * trained on the `trainPred` reference subset (the CCNet
    * arrangement: LM on Wikipedia, applied to Common Crawl), scored
    * over every doc. Per trigram position:
    *   S(w3|w1w2) = c3/c2p            if the trigram was seen in train,
    *              = 0.4 · c2/c1p      else if bigram (w2 w3) was seen,
    *              = 0.4² · c1/T       else (unigram relative frequency;
    *                                  an unseen w3 scores 0).
    * All terms are exact integer ppm — 0.4 = 2/5 clears denominators,
    * truncation is the documented quantization (cross-engine identical).
    * Backoff genuinely fires because train ⊊ corpus, unlike
    * [[bigramLmScore]]'s self-trained counts where every gram is seen.
    * Per doc: mean term ppm + the branch mix (tri/bi/uni hit counts) —
    * the mix itself is a quality signal (fluent in-domain text resolves
    * at the trigram level). Docs with < 3 tokens emit no row.
    *
    * Scale shape: counts are three map-side-combined aggregates over
    * the TRAIN subset (Zipf-small outputs). Scoring happens on the
    * DISTINCT-TRIGRAM-TYPE table, not on occurrences: the five
    * count-table lookups shuffle only the type table (≪ occurrences —
    * Zipf puts most of the occurrence mass on few types), and the
    * corpus-sized occurrence table shuffles exactly ONCE, joining the
    * scored types back by trigram before the doc-keyed agg. Nothing is
    * ever all-pairs; the corpus text is scanned once. */
  def stupidBackoffScore(docs: DataFrame,
                         trainPred: Column): DataFrame = {
    import graft.functions.TokenNgrams.token_ngrams
    val train = docs.filter(trainPred)
    val c3 = train.select(explode(token_ngrams(col("text"), 3)).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("c3"))
    val c2 = train.select(explode(token_ngrams(col("text"), 2)).as("bi"))
      .groupBy("bi").agg(count(lit(1)).as("c2"))
    val c1 = train.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val tTokens = train.select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    require(tTokens > 0, "stupidBackoffScore needs a nonempty train subset")
    // corpus occurrences, pre-aggregated per (doc, tri): map-side
    // combine collapses repeated trigrams before the one type join
    val occ = docs.select(col("doc_id"),
        explode(token_ngrams(col("text"), 3)).as("tri"))
      .groupBy("doc_id", "tri").agg(count(lit(1)).as("occ"))
    // score each DISTINCT trigram type once
    val types = occ.select("tri").distinct()
      .withColumn("w3", substring_index(col("tri"), " ", -1))
      .withColumn("bip", substring_index(col("tri"), " ", 2))
      .withColumn("w2", substring_index(col("bip"), " ", -1))
      .withColumn("bi", concat_ws(" ", col("w2"), col("w3")))
    val scoredTypes = types
      .join(c3, Seq("tri"), "left")
      .join(c2.withColumnRenamed("bi", "bip").withColumnRenamed("c2", "c2p"),
        Seq("bip"), "left")
      .join(c2, Seq("bi"), "left")
      .join(c1.withColumnRenamed("w", "w2").withColumnRenamed("c1", "c1p"),
        Seq("w2"), "left")
      .join(c1.withColumnRenamed("w", "w3").withColumnRenamed("c1", "c1c"),
        Seq("w3"), "left")
      // a seen trigram implies its prefix bigram was seen (c2p ≥ c3);
      // a seen bigram implies w2 was seen (c1p ≥ c2): no null divisors
      .withColumn("term", expr(
        s"""CASE WHEN c3 IS NOT NULL THEN c3 * 1000000 DIV c2p
           | WHEN c2 IS NOT NULL THEN (2 * c2 * 1000000) DIV (5 * c1p)
           | ELSE (4 * coalesce(c1c, 0) * 1000000) DIV (25 * ${tTokens}L)
           |END""".stripMargin))
      .withColumn("branch", when(col("c3").isNotNull, lit(0))
        .when(col("c2").isNotNull, lit(1)).otherwise(lit(2)))
      .select("tri", "term", "branch")
    occ.join(scoredTypes, Seq("tri"))
      .groupBy("doc_id")
      .agg(sum("occ").as("n_trigrams"),
        sum(when(col("branch") === 0, col("occ")).otherwise(0L)).as("tri_hits"),
        sum(when(col("branch") === 1, col("occ")).otherwise(0L)).as("bi_hits"),
        sum(when(col("branch") === 2, col("occ")).otherwise(0L)).as("uni_backoffs"),
        expr("sum(term * occ) DIV sum(occ)").as("sb_score_ppm"))
  }

  /** Per-doc n-gram NOVELTY — the memorization/near-dup risk signal
    * that complements [[lexicalDiversity]] (within-doc) with a
    * cross-corpus axis: of a doc's distinct token n-grams, what
    * fraction appears in NO other document (corpus doc-frequency 1)?
    * Boilerplate and near-copies score low; original text scores high.
    * Integer ppm so the oracle hash-matches.
    *
    * Scale shape: explode → per-doc-distinct grams → gram df aggregate
    * (map-side combined) → one keyed join back. The df table is
    * gram-vocabulary-sized (Zipf-long but keyed — the same shape as
    * [[bigramLmScore]]'s count tables); nothing is ever all-pairs.
    * Docs with fewer than n tokens have no grams and emit no row. */
  def ngramNovelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val g = docs.select(col("doc_id"),
        explode(graft.functions.TokenNgrams.token_ngrams(col("text"), n)).as("gram"))
      .distinct()
    val df_ = g.groupBy("gram").agg(count(lit(1)).as("df"))
    g.join(df_, "gram").groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("df") === 1, 1)).as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 DIV n_grams"))
  }

  /** WINNOWING fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    * the MOSS algorithm): hash every positional k-token gram, slide a
    * window of `w` consecutive hashes, keep each window's minimum.
    * Guarantees: any shared run of w+k−1 tokens yields at least one
    * shared fingerprint (detection floor), while storing only ~2/(w+1)
    * of the gram hashes — the LOCAL fingerprinting that whole-doc
    * hashing (q28) and random sampling can't give. One narrow window
    * per doc (shuffle keyed by doc_id), fingerprints deduped per doc.
    * poly_hash grams keep the oracle replayable. */
  def winnowingFingerprints(docs: DataFrame, k: Int = 4, w: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(col("doc_id"),
        graft.functions.TokenNgrams.token_ngrams(col("text"), k).as("gs"))
      .filter(size(col("gs")) >= w)
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_g"),
        posexplode(col("gs")).as(Seq("pos", "gram")))
      .withColumn("hv", graft.functions.PolyHash.poly_hash(col("gram")))
    val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    grams.withColumn("fp", min("hv").over(win))
      .filter(col("pos") <= col("n_g") - w) // full windows only
      .select("doc_id", "fp").distinct()
  }

  /** Candidate pairs by shared winnowing fingerprints (≥ `minShared`) —
    * MOSS's similarity-detection join: an equi-join on the fingerprint
    * value over the (sparse) fingerprint table, never the grams. The
    * same hot-bucket caveat as every inverted index applies: run
    * [[Dedup.exactReps]] first on duplicate-heavy corpora. */
  def winnowingPairs(docs: DataFrame, k: Int = 4, w: Int = 5,
                     minShared: Long = 2L): DataFrame = {
    val fps = Stage(winnowingFingerprints(docs, k, w))
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** DICTIONARY BLOCKLIST scan — the wordlist content filter every web
    * pipeline runs (the C4/LDNOOBW "bad words" stage): per document,
    * total occurrences and distinct kinds of blocklist terms in the
    * lowercased token stream, plus the keep decision (`n_hits ≤
    * maxHits`). Shape: one token explode joined against the BROADCAST
    * term list (blocklists are thousands of terms — driver-trivial at
    * any corpus size), one doc-keyed aggregate; docs with zero hits
    * survive via the left join, so the output covers the whole corpus.
    * Exact integer counts → oracle-checkable (q123). */
  def blocklistHits(docs: DataFrame, terms: Seq[String],
                    maxHits: Long = 0L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("term"))
    val hits = toks.join(broadcast(terms.toDF("term")), Seq("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("term")).as("n_terms"))
    docs.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        when(coalesce(col("n_hits"), lit(0L)) <= maxHits, 1L).otherwise(0L)
          .as("kept"))
  }
}
