package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline:
  * exact, normalized-key, n-gram Jaccard (inverted index), MinHash+LSH,
  * SimHash. All deterministic (fixed hash constants, xxhash64 — never
  * Math.random), all shuffle-minimal.
  */
object Dedup {

  /** Sentinel default for every hot-key cap (`maxShingleDf` /
    * `maxBandDf`): DERIVE the cap from the corpus itself —
    * max([[DerivedCapFloor]], n DIV 1000), the ~0.1%-of-corpus
    * stop-key rule the scaladocs recommend. The 100 TB-safe default is
    * a cap that ENGAGES without being asked: a user calling the public
    * API with defaults on a duplicate-heavy corpus must not get the
    * Σdf² candidate blowup (one 10⁴-copy boilerplate class = 5·10⁷
    * pairs from a single bucket). `Long.MaxValue` is the explicit
    * opt-out — the oracle-checked query forms pass it (or a literal
    * cap) so their DuckDB replays stay uncut.
    *
    * Resolving the sentinel costs one count() job over an
    * already-staged frame — O(metadata) next to the pair join it
    * bounds. The floor keeps small corpora exact: below ~128k docs the
    * derived cap is the floor, far above any honest df there. */
  val CorpusDerivedCap: Long = -1L

  /** Floor for the derived cap: buckets this small emit ≤ floor²/2 ≈
    * 8k candidate pairs each — harmless — and every SF of the test
    * corpus stays far below it (max observed 3-shingle df at sf0.1 is
    * 25), so deriving never changes small-corpus results. */
  private[graft] val DerivedCapFloor: Long = 128L

  private[graft] def deriveCap(n: Long): Long =
    math.max(DerivedCapFloor, n / 1000L)

  /** Resolve a cap argument: the sentinel counts `perDoc` (one row per
    * document — pass the STAGED frame so the count replays cheap). */
  private def resolveCap(perDoc: DataFrame, cap: Long): Long =
    if (cap == CorpusDerivedCap) deriveCap(perDoc.count()) else cap

  /** Session override for [[DupBroadcastMaxRowsDefault]] — the member-
    * row count above which pair re-expansion stops broadcasting the
    * duplicate-class membership and falls back to a rep-keyed shuffle
    * join. Tests set it tiny to exercise the fallback on small corpora. */
  private[graft] val DupBroadcastMaxRowsConf = "spark.graft.dedup.dupBroadcastMaxRows"

  /** Default gate for the membership broadcast: 2M (rep_id, doc_id)
    * rows ≈ 32 MB serialized — comfortably inside executor broadcast
    * budgets, far under Spark's 8 GB broadcast hard limit. Above it the
    * expansion joins shuffle on rep_id instead (correct either way —
    * the hint is the only difference). */
  private[graft] val DupBroadcastMaxRowsDefault = 2000000L

  /** Duplicate-class membership for the pair-core re-expansion, plus
    * whether it is small enough to broadcast. `members` is the full
    * (doc_id, rep_id) map; only rows whose class has n_copies > 1
    * survive — a singleton's rep IS its only member, so its side of a
    * rep pair needs no expansion row at all ([[expandMemberPairs]]'
    * left join + coalesce covers it). The joined table is therefore
    * bounded by DUPLICATE MASS, not corpus size, and the broadcast
    * decision is gated on `dupMassRows` — exactly the surviving row
    * count, Σ n_copies over classes with n_copies > 1, which the
    * caller reads off the class-size aggregate it ALREADY computes
    * (round-12 ADVICE: the previous count() here materialized the
    * semi-join eagerly and launched an extra job per pair-generator
    * call, ~30-50% of the sf0.1 entries' wall): above the gate the
    * same plan runs as a rep-keyed shuffle join automatically. */
  private def dupMembership(members: DataFrame, dupRepIds: DataFrame,
                            dupMassRows: Long): (DataFrame, Boolean) = {
    val dm = Stage(members.join(dupRepIds, Seq("rep_id"), "left_semi"))
    val gate = dm.sparkSession.conf.getOption(DupBroadcastMaxRowsConf)
      .map(_.toLong).getOrElse(DupBroadcastMaxRowsDefault)
    (dm, dupMassRows <= gate)
  }

  /** One scalar pass over a staged class-size frame: (corpus rows,
    * duplicate-mass rows). Corpus rows resolve [[CorpusDerivedCap]];
    * dup mass — Σ n_copies over classes with n_copies > 1 — is by
    * construction the exact row count of [[dupMembership]]'s table,
    * so the broadcast gate needs no second job. */
  private def classStats(reps: DataFrame, nCopiesCol: String): (Long, Long) = {
    val r = reps.agg(
      sum(col(nCopiesCol)).as("n"),
      sum(when(col(nCopiesCol) > 1L, col(nCopiesCol))).as("dm")).head()
    (if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Re-expand collapsed representative pairs to member pairs — the
    * shared tail of both exact-dup-pre-collapsed pair cores. Each side
    * left-joins the dup-class membership on its rep id; a null means
    * the rep is a singleton and stands for itself (coalesce). With
    * `broadcastOk` the dup membership (bounded by duplicate mass, see
    * [[dupMembership]]) is broadcast and the pair stream flows through
    * with no shuffle; without it both joins shuffle on rep id.
    * Output: the input columns plus resolved member ids `da`, `db`. */
  private def expandMemberPairs(repPairs: DataFrame, dupMembers: DataFrame,
                                broadcastOk: Boolean): DataFrame = {
    val hint: DataFrame => DataFrame =
      if (broadcastOk) broadcast else identity[DataFrame]
    val ma = hint(dupMembers.select(col("rep_id").as("rep_a"), col("doc_id").as("mda")))
    val mb = hint(dupMembers.select(col("rep_id").as("rep_b"), col("doc_id").as("mdb")))
    repPairs.join(ma, Seq("rep_a"), "left").join(mb, Seq("rep_b"), "left")
      .withColumn("da", coalesce(col("mda"), col("rep_a")))
      .withColumn("db", coalesce(col("mdb"), col("rep_b")))
      .drop("mda", "mdb")
  }

  /** Exact dedup: hash-groupBy on the full text, keep min doc_id as the
    * representative. One shuffle on the (hashed) text. At 100 TB you
    * group on xxhash64(text) first and only compare texts within a hash
    * bucket — Spark's hash aggregate already does exactly that. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_dups"))
      .drop("text")

  /** One representative (min doc_id) per distinct text, text kept — the
    * EXACT-DUP PRE-PASS every band-join operator wants in front of it:
    * an exact-duplicate class of m documents shares ALL bands/chunks, so
    * one band bucket would hold all m and emit m²/2 candidate pairs
    * (10⁵ copies of one boilerplate page → 5·10⁹ pairs from a single
    * key). Collapsed to one representative the class emits none, and the
    * collapse is RESULT-PRESERVING for keep-list / keep-best dedup:
    * members have identical signatures (hence exactly their rep's
    * candidate edges), equal length, and higher ids than their rep, so
    * they can never be a cluster survivor under min-id or
    * longest-then-min-id policies — dropping them up front changes
    * nothing downstream (q68/q70 do this; their oracles don't and hash
    * identically). Members rejoin as an anti-join against the rep set. */
  def exactReps(docs: DataFrame): DataFrame =
    docs.groupBy(col("text")).agg(min("doc_id").as("doc_id"))
      .select("doc_id", "text")

  /** Normalized-key dedup: dedup on a canonical key (here: first k
    * tokens). The groupBy shuffles only (key, doc_id). */
  def byKey(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, k), " ").as("norm_key"))
      .groupBy("norm_key")
      .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_dups"))

  /** Distinct k-token shingles per doc: (doc_id, shingle). */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(col("doc_id"),
        array_distinct(graft.functions.TokenNgrams.token_ngrams(col("text"), k)).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))

  /** All-pairs n-gram Jaccard via an inverted index — NOT a cross join.
    * (doc, shingle-hash) self-joined on the hash → common-shingle counts
    * per pair; |A ∪ B| = |A| + |B| − common. Returns jaccard in ppm
    * (exact integer arithmetic).
    *
    * Plan shape choices (each removes a shuffle or shrinks one):
    *   - join key is xxhash64 of the shingle, not the string: 8-byte
    *     fixed-width shuffle keys (a 64-bit collision across a corpus's
    *     shingle vocabulary is ~2^-25 even at 10^9 distinct shingles);
    *   - each doc's set size n_sh is computed on the array BEFORE the
    *     explode and travels with the rows, so there is no separate
    *     sizes aggregate and no post-join size lookups — one self-join
    *     + one aggregate total.
    * Cost: Σ_shingle df² pair-candidates — the quadratic term is owned
    * entirely by high-df shingles, so `maxShingleDf` applies the
    * standard stop-shingle cut: shingles appearing in more than
    * `maxShingleDf` documents are treated as boilerplate stopwords and
    * removed from the Jaccard universe (both intersections AND set
    * sizes — the result is the true Jaccard over the filtered shingle
    * sets, identically reproducible by an oracle with the same HAVING
    * stage). One shared boilerplate shingle across 10^6 docs would
    * otherwise contribute 10^12 candidates; with the cut its
    * contribution is zero. The stop set is vocabulary-scale-tiny
    * (only shingles with df > cap), so it broadcasts.
    *
    * The DEFAULT is [[CorpusDerivedCap]] — max(128, n DIV 1000), the
    * ~0.1% rule, derived from one count of `docs`; pass Long.MaxValue
    * to explicitly disable the cut (exact all-shingle Jaccard — the
    * oracle-checked forms do).
    */
  def ngramJaccardPairs(docs: DataFrame, k: Int = 3,
                        maxShingleDf: Long = CorpusDerivedCap): DataFrame =
    shinglePairCounts(docs, k, maxShingleDf)
      .withColumn("jaccard_ppm",
        expr("(common * 1000000) DIV (n_a + n_b - common)"))
      .select("id_a", "id_b", "common", "jaccard_ppm")

  /** Containment pairs over the same inverted index: containment =
    * common DIV min(|A|, |B|) — catches a short document EMBEDDED in a
    * long one (quotes, boilerplate wrappers, prompt templates), which
    * symmetric Jaccard under-scores because the union is dominated by
    * the longer side. Same cost and scale shape as
    * [[ngramJaccardPairs]].
    *
    * Tension to know: containment hunts boilerplate, and the stop cut
    * removes exactly the highest-df shingles such templates are made
    * of — but an UNCAPPED default is the Σdf² blowup by construction
    * on precisely the corpora containment targets, so the default is
    * still [[CorpusDerivedCap]] (scale-safe first). To keep the
    * boilerplate shingles in the universe, pass Long.MaxValue
    * explicitly AND restrict the input to an LSH candidate set via
    * [[containmentPairsFromCandidates]] — linear in |cand|, full
    * shingle universe, no cut. */
  def containmentPairs(docs: DataFrame, k: Int = 3,
                       minContainPpm: Long = 800000L,
                       maxShingleDf: Long = CorpusDerivedCap): DataFrame =
    shinglePairCounts(docs, k, maxShingleDf)
      .withColumn("contain_ppm",
        expr("(common * 1000000) DIV least(n_a, n_b)"))
      .filter(col("contain_ppm") >= minContainPpm)
      .select("id_a", "id_b", "common", "contain_ppm")

  /** CANDIDATE-BOUNDED containment — the scale-safe call shape for
    * [[containmentPairs]], whose full inverted-index form carries the
    * Σdf² exposure with its stop-shingle cut deliberately off: compute
    * containment only for the pairs in `cand` (id_a, id_b — e.g. LSH
    * band candidates from [[minHashBands]], or any recall-oriented
    * candidate generator). Cost is |cand| × shingles-per-doc keyed-join
    * rows — linear in the candidate set, never quadratic in any bucket.
    * For every candidate pair the returned containment is IDENTICAL to
    * [[containmentPairs]]' (same shingle universe, no cut); pairs
    * outside `cand` are simply not scored. */
  def containmentPairsFromCandidates(docs: DataFrame, cand: DataFrame,
                                     k: Int = 3,
                                     minContainPpm: Long = 800000L): DataFrame = {
    // duplicate candidate rows would double the common counts
    val candD = cand.select("id_a", "id_b").distinct()
    val involved = candD.select(col("id_a").as("doc_id"))
      .union(candD.select(col("id_b").as("doc_id"))).distinct()
    // only candidate-touched docs are shingled at all
    val base = docs.join(involved, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        graft.functions.ShingleHashes.shingle_hashes(col("text"), k).as("hs"))
      .filter(size(col("hs")) > 0)
    // joined twice below (a-side and b-side) — materialize once
    val sh = Stage(base.select(col("doc_id"),
      size(col("hs")).cast("long").as("n_sh"), explode(col("hs")).as("h")))
    candD.join(sh.select(col("doc_id").as("id_a"), col("n_sh").as("n_a"),
        col("h")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("n_sh").as("n_b"),
        col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("contain_ppm",
        expr("(common * 1000000) DIV least(n_a, n_b)"))
      .filter(col("contain_ppm") >= minContainPpm)
      .select("id_a", "id_b", "common", "contain_ppm")
  }

  /** DUPLICATE-SPAN flagging — the k-gram building block of exact-
    * substring dedup (the "dedup training data at the substring level"
    * result: repeated ≥k-token spans across a corpus are memorization
    * fuel even when whole documents differ): for every document, count
    * the distinct k-token shingles whose corpus document-frequency is
    * ≥ `minDf`. A flagged span is text shared verbatim with at least
    * one other document; (doc_id, n_dup_spans) ranks documents by how
    * much boilerplate/quotation they carry, and the anti-join against
    * the flagged set is the clean corpus.
    *
    * Shape: one shingle scan (codegen'd, 8-byte keys), one df
    * aggregate keyed by shingle hash (map-side combined), one semi-join
    * back, one doc-keyed count — two shuffles total, both keyed; the
    * df≥2 set at web scale is LARGE (most boilerplate repeats), so it
    * stays a shuffled semi-join, never a broadcast. */
  def duplicateSpans(docs: DataFrame, k: Int = 8, minDf: Long = 2L): DataFrame = {
    // feeds both the df aggregate and the semi-join probe — stage once
    val sh = Stage(docs.select(col("doc_id"),
      explode(graft.functions.ShingleHashes.shingle_hashes(col("text"), k)).as("h")))
    val dup = sh.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("h")
    sh.join(dup, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_spans"))
  }

  /** LSH parameter selection off the S-curve (Leskovec/Rajaraman/Ullman,
    * MMDS §3.4.3): for a signature of `numPerms` rows, pick the
    * (bands, rowsPerBand) factorization whose candidate-probability
    * threshold (1/b)^(1/r) — the Jaccard similarity at which a pair
    * becomes ~50% likely to collide in some band — lands closest to
    * `targetJaccard`. More bands ⇒ lower threshold (more candidates,
    * fewer false negatives); fewer bands ⇒ the reverse. Driver-side
    * arithmetic over the ≤ d(numPerms) divisors: pick parameters BEFORE
    * the banding job, no data touched. */
  def lshTuning(numPerms: Int, targetJaccard: Double): (Int, Int) = {
    require(numPerms > 0 && targetJaccard > 0.0 && targetJaccard < 1.0)
    (1 to numPerms).filter(numPerms % _ == 0)
      .map(b => (b, numPerms / b))
      .minBy { case (b, r) =>
        math.abs(math.pow(1.0 / b, 1.0 / r) - targetJaccard)
      }
  }

  /** REMOVE cross-document duplicate spans — the surgery step on top of
    * [[duplicateSpans]]'s flags (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": cut the repeated
    * substring, keep the rest of the document). A token is removed iff
    * it is covered by any k-gram occurrence whose gram appears in
    * ≥ `minDf` DISTINCT documents (the cross-document boilerplate
    * signal; a span repeated only within one document is kept — that is
    * [[graft.llm.TextAnalysis.repetitionStats]]' axis). Docs shorter
    * than k have no grams and pass through whole.
    *
    * Shape: one positional-gram scan staged once (feeds the df
    * aggregate AND the semi-join probe), a gram-keyed df aggregate over
    * per-doc-distinct grams (map-side combined), a semi-join back, one
    * doc-keyed collect of flagged start positions (bounded by doc
    * length), and a narrow array rebuild — coverage is an
    * exists-over-starts lambda, no per-token join. Two keyed shuffles
    * total, the [[duplicateSpans]] budget. */
  def removeDuplicateSpans(docs: DataFrame, k: Int = 8,
                           minDf: Long = 2L): DataFrame = {
    val grams = Stage(docs.select(col("doc_id"),
      posexplode(graft.functions.TokenNgrams.token_ngrams(col("text"), k))
        .as(Seq("pos", "gram"))))
    val dup = grams.select(col("doc_id"), col("gram")).distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("gram")
    val starts = grams.join(dup, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("starts"))
    docs.join(starts, Seq("doc_id"), "left")
      .withColumn("s", coalesce(col("starts"), array().cast("array<int>")))
      // NATIVE rebuild ([[graft.functions.GramCounts]]): one merged
      // sweep over (tokens, ascending starts) keeps uncovered tokens,
      // and the removed count is the interval-union size over the same
      // starts (gram starts never exceed T−k, so the union needs no
      // clipping and n_removed = tokens − kept exactly). The previous
      // per-token exists lambda was interpreted HOF eval —
      // O(tokens·spans) per doc on exactly the boilerplate-heavy
      // documents this operator exists to clean.
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        graft.functions.GramCounts.covered_count(col("s"), k).as("n_removed"),
        graft.functions.GramCounts.remove_covered_tokens(
          col("text"), col("s"), k).as("text_clean"))
  }

  /** VARIABLE-LENGTH duplicate-run removal + extents — the Lee et al.
    * 2022 suffix-array pass ("remove every maximal substring of ≥ L
    * tokens appearing in more than one document") restated scalably:
    * a token lies inside a cross-document duplicated run of length
    * ≥ `minRun` IFF some duplicated `minRun`-gram covers it (a run of
    * m ≥ L tokens is the union of its m−L+1 L-grams, and any
    * duplicated L-gram is itself a duplicated substring of length L),
    * so ONE positional-gram pass at k = minRun plus run-merging of
    * CONSECUTIVE flagged starts recovers every maximal run and its
    * extent — no suffix array, no all-pairs, the exact
    * [[removeDuplicateSpans]] shuffle budget (two keyed shuffles:
    * gram df, doc-keyed start collect). Where the fixed-k surgery
    * only deletes, this REPORTS the runs (count, longest extent) the
    * analysis side of the Lee et al. pipeline reads, alongside the
    * same cleaned text.
    *
    * Run semantics: a maximal set of CONSECUTIVE flagged starts
    * [a..b] is one maximal duplicated substring of length b−a+minRun
    * (chained grams may pair with different partner docs — the
    * substring is still duplicated at every window, which is the Lee
    * et al. removal criterion). Two runs separated by a start gap
    * < minRun overlap in coverage but are distinct maximal runs;
    * `dup_tokens` is the interval-UNION coverage (what removal
    * deletes), so Σ run lengths ≥ dup_tokens. Docs under minRun
    * tokens pass through whole with zero runs. */
  def duplicateRunStats(docs: DataFrame, minRun: Int = 16,
                        minDf: Long = 2L): DataFrame = {
    val k = minRun
    val grams = Stage(docs.select(col("doc_id"),
      posexplode(graft.functions.TokenNgrams.token_ngrams(col("text"), k))
        .as(Seq("pos", "gram"))))
    val dup = grams.select(col("doc_id"), col("gram")).distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("gram")
    val starts = grams.join(dup, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("starts"))
    docs.join(starts, Seq("doc_id"), "left")
      .withColumn("s", coalesce(col("starts"), array().cast("array<int>")))
      // maximal-run extents from the sorted starts, narrow expressions:
      // a run BREAK is a start with no predecessor start+1; a run END a
      // start with no successor start+1 — element_at is 1-based, the
      // lambda index 0-based, so element_at(s, i) is the previous
      // element and element_at(s, i+2) the next
      .withColumn("breaks", filter(col("s"),
        (x, i) => i === 0 || x =!= element_at(col("s"), i) + 1))
      .withColumn("ends", filter(col("s"),
        (x, i) => i === size(col("s")) - 1 ||
          x + 1 =!= element_at(col("s"), i + 2)))
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(col("breaks")).cast("long").as("n_runs"),
        coalesce(array_max(zip_with(col("breaks"), col("ends"),
            (a, b) => b - a + lit(k))), lit(0)).cast("long").as("max_run_len"),
        graft.functions.GramCounts.covered_count(col("s"), k).as("dup_tokens"),
        graft.functions.GramCounts.remove_covered_tokens(
          col("text"), col("s"), k).as("text_clean"))
  }

  /** Remove corpus-duplicate BLOCKS — the C4 "line dedup" stage (Raffel
    * et al. 2020 §2.2 removed any three-sentence span occurring more
    * than once in the corpus) restated for this corpus's single-space
    * convention: the document is cut into NON-OVERLAPPING `blockLen`-
    * token blocks ("lines"), and every block whose exact text occurs in
    * ≥ `minDf` DISTINCT documents is deleted from all of them. The
    * within-doc-only repeat is kept — that axis belongs to
    * [[graft.llm.TextAnalysis.gopherRepetition]]. Complements
    * [[removeDuplicateSpans]]: overlapping k-grams catch any shared run
    * but cost k rows per token; disjoint blocks cost 1/blockLen row per
    * token — the cheap boilerplate pass you run corpus-wide BEFORE the
    * expensive gram surgery. A trailing partial block (< blockLen
    * tokens) is never removed; docs shorter than one block pass whole.
    *
    * Shape: one block scan staged once (feeds the df aggregate AND the
    * semi-join probe) carrying 8-byte block hashes, a per-doc-distinct
    * df aggregate (map-side combined), a shuffled semi-join back (the
    * df≥2 boilerplate set at web scale is LARGE — never broadcast), one
    * doc-keyed collect of removed block indexes (bounded by
    * doc length / blockLen), and a narrow array rebuild. Two keyed
    * shuffles, both ~1/blockLen of [[removeDuplicateSpans]]' volume. */
  def removeDuplicateBlocks(docs: DataFrame, blockLen: Int = 8,
                            minDf: Long = 2L): DataFrame = {
    require(blockLen >= 1, s"blockLen=$blockLen must be >= 1")
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("l"))
      .withColumn("nb", expr(s"CAST(size(l) DIV $blockLen AS INT)"))
    val blocks = Stage(base.filter(col("nb") > 0)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), col("nb") - 1),
        i => concat_ws(" ", slice(col("l"), i * blockLen + 1, lit(blockLen)))))
        .as(Seq("p", "blk")))
      .select(col("doc_id"), col("p"), xxhash64(col("blk")).as("bh")))
    val dup = blocks.select("doc_id", "bh").distinct()
      .groupBy("bh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("bh")
    val removed = blocks.join(dup, Seq("bh"), "left_semi")
      .groupBy("doc_id").agg(sort_array(collect_list(col("p"))).as("dups"))
    docs.join(removed, Seq("doc_id"), "left")
      .withColumn("l", split(col("text"), " "))
      .withColumn("d", coalesce(col("dups"), array().cast("array<int>")))
      // token i (0-based) dies iff its block index is a removed block;
      // trailing tokens have block index nb, never collected → kept
      .withColumn("kept", filter(col("l"),
        (_, i) => !array_contains(col("d"), floor(i / lit(blockLen)).cast("int"))))
      .select(col("doc_id"),
        expr(s"CAST(size(l) DIV $blockLen AS BIGINT)").as("n_blocks"),
        size(col("d")).cast("long").as("n_removed"),
        concat_ws(" ", col("kept")).as("text_clean"))
  }

  /** Shared inverted-index pair core: (id_a, id_b, n_a, n_b, common)
    * for every pair with ≥1 shared (surviving) shingle. The shingle
    * hashing is the codegen'd [[graft.functions.ShingleHashes]] — one
    * compiled scan per doc instead of the interpreted HOF chain
    * (measured 1.7× on the sf0.1 inverted-index build, identical distinct counts). */
  private def shinglePairCounts(docs: DataFrame, k: Int,
                                maxShingleDf0: Long): DataFrame = {
    // EXACT-DUP PRE-COLLAPSE, result-preserving (round 11 — the sf1
    // sweep's q80 pathology): members of an exact-duplicate class have
    // IDENTICAL shingle sets, so every pair statistic involving a
    // member replicates its representative's. The inverted index and
    // the quadratic self-join therefore run over DISTINCT TEXTS only —
    // a 10-way replicated corpus pays class-count df², not member-count
    // df² (100× less join work; measured 257 s → seconds at sf1) — and
    // member pairs are re-expanded afterwards: cross-class pairs by a
    // two-sided membership join (output-sized), within-class pairs
    // directly from the membership table (identical sets ⇒ common =
    // n_a = n_b = the class's post-cut set size). The stop-shingle df
    // stays MEMBER-counted (sum of class sizes per shingle), so capped
    // results are bit-identical to the uncollapsed form too.
    val reps = Stage(docs.groupBy(col("text"))
      .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_copies")))
    // ONE scalar pass over the staged class sizes yields both the
    // corpus row count (cap resolution) and the duplicate mass (the
    // broadcast gate) — no separate docs.count(), no membership count()
    val (nDocs, dupMass) = classStats(reps, "n_copies")
    val maxShingleDf =
      if (maxShingleDf0 == CorpusDerivedCap) deriveCap(nDocs) else maxShingleDf0
    val members = Stage(docs.select(col("doc_id"), col("text"))
      .join(reps, Seq("text")).select(col("doc_id"), col("rep_id")))
    val base = reps
      .select(col("rep_id").as("doc_id"), col("n_copies"),
        graft.functions.ShingleHashes.shingle_hashes(col("text"), k).as("hs"))
      .filter(size(col("hs")) > 0)
    val shRows =
      if (maxShingleDf == Long.MaxValue)
        // no cut: set size is the array size, computed before the explode
        base.select(col("doc_id"), size(col("hs")).cast("long").as("n_sh"),
          explode(col("hs")).as("h"))
      else {
        // staged: sh0 feeds BOTH the stop aggregate and the anti-join —
        // unstaged it would re-run the scan + shingle hash twice
        val sh0 = Stage(base.select(col("doc_id"), col("n_copies"),
          explode(col("hs")).as("h")))
        val stop = sh0.groupBy("h").agg(sum("n_copies").as("df"))
          .filter(col("df") > maxShingleDf).select("h")
        // post-cut set size: count over the doc's surviving shingles
        sh0.join(broadcast(stop), Seq("h"), "left_anti")
          .withColumn("n_sh",
            count(lit(1)).over(Window.partitionBy("doc_id")).cast("long"))
          .drop("n_copies")
      }
    // Materialize the shingle table once: both self-join sides would
    // otherwise re-run the scan + split + shingle-hash + explode
    // (measured ~2x the hash work of the whole query at sf0.1).
    // Stage() honors the reliable-checkpoint switch for cluster runs.
    val sh = Stage(shRows)
    val a = sh.as("a"); val b = sh.as("b")
    val repPairs = a.join(b,
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("rep_a"), col("b.doc_id").as("rep_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("common"))
    // cross-class expansion: (id_a, id_b) order by MEMBER id — the set
    // sizes follow the swap. Only DUP-CLASS membership joins in
    // (singleton reps pass through the left joins unexpanded), so the
    // broadcast is bounded by duplicate mass and count-gated — above
    // [[DupBroadcastMaxRowsDefault]] the expansion shuffle-joins on
    // rep id instead of broadcasting.
    val (dupMembers, bcastOk) = dupMembership(members,
      reps.filter(col("n_copies") > 1L).select("rep_id"), dupMass)
    val cross = expandMemberPairs(repPairs, dupMembers, bcastOk)
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"),
        when(col("da") < col("db"), col("na")).otherwise(col("nb")).as("n_a"),
        when(col("da") < col("db"), col("nb")).otherwise(col("na")).as("n_b"),
        col("common"))
    // within-class pairs: classes whose post-cut set is empty have no
    // sizes row and correctly emit nothing (matching the uncollapsed
    // form, where such docs vanish from the index entirely). Only dup
    // members can pair within a class — singletons would self-join to
    // nothing anyway, so the join runs over duplicate mass, not corpus.
    val sizes = sh.select(col("doc_id").as("rep_id"), col("n_sh")).distinct()
    val wm = dupMembers.join(sizes, Seq("rep_id"))
    val within = wm.as("x").join(wm.as("y"),
        col("x.rep_id") === col("y.rep_id") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.n_sh").as("n_a"), col("y.n_sh").as("n_b"),
        col("x.n_sh").as("common"))
    cross.unionByName(within)
  }

  // --- MinHash + LSH ------------------------------------------------------

  /** prime > 2^32; with a < 2^31 and x < 2^32, a*x+b stays < 2^63. */
  private val P = 4294967311L
  private def hashA(j: Int): Long = ((1103515245L * (j + 1) + 12345L) % (1L << 31)) | 1L
  private def hashB(j: Int): Long = (2654435761L * (j + 7)) % P

  /** Band-combine constants: acc = (acc*BandMult + h) mod BandMod, acc0 =
    * BandSeed. All intermediates < 1.32e18 < 2^63, so engines that error
    * on BIGINT overflow (DuckDB) reproduce it exactly. */
  private[llm] val BandMult = 1315423911L
  private[llm] val BandMod = 1000000007L
  private[llm] val BandSeed = 7L

  /** MinHash signatures: numPerms universal hashes h_j(x) = (a_j·x+b_j) mod P
    * over polynomial shingle hashes ([[graft.functions.PolyHash]], < 2^32 —
    * chosen over xxhash64 so a DuckDB oracle can recompute the signature
    * bit-for-bit). One wide aggregate — numPerms min() columns over the
    * exploded shingle table — instead of a numPerms× row explosion: the
    * shuffle carries one row per doc with map-side partial mins,
    * independent of corpus size. Output is wide: doc_id, h0..h{numPerms-1}. */
  def minHashSignatures(docs: DataFrame, k: Int = 3, numPerms: Int = 32): DataFrame = {
    // one native pass ([[graft.functions.PolyShingleHashes]]) instead of
    // the interpreted shingle-string chain — values are bit-identical to
    // poly_hash over the joined shingle strings, so oracles are unmoved
    val hashed = docs.select(col("doc_id"),
        graft.functions.PolyShingleHashes.poly_shingle_hashes(col("text"), k).as("xs"))
      .filter(size(col("xs")) > 0)
      .select(col("doc_id"), explode(col("xs")).as("x"))
    val mins = (0 until numPerms).map(j =>
      min((lit(hashA(j)) * col("x") + lit(hashB(j))) % lit(P)).as(s"h$j"))
    hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** GROUP-level MinHash signatures — the same wide min-aggregate as
    * [[minHashSignatures]] keyed by `groupCol` instead of doc_id: the
    * group's signature is the min over the UNION of its documents'
    * shingle hashes (min is insensitive to the per-doc distinctness),
    * i.e. the MinHash sketch of the whole group's shingle SET. One
    * map-side-combined aggregate whose shuffle carries one row per
    * group — the corpus-level sketch a source/crawl/snapshot overlap
    * analysis wants at 100 TB, where the exact distinct-shingle
    * intersection is the thing you cannot afford. */
  def minHashSignaturesBy(docs: DataFrame, groupCol: String,
                          k: Int = 3, numPerms: Int = 32): DataFrame = {
    val hashed = docs.select(col(groupCol),
        graft.functions.PolyShingleHashes.poly_shingle_hashes(col("text"), k).as("xs"))
      .filter(size(col("xs")) > 0)
      .select(col(groupCol), explode(col("xs")).as("x"))
    val mins = (0 until numPerms).map(j =>
      min((lit(hashA(j)) * col("x") + lit(hashB(j))) % lit(P)).as(s"h$j"))
    hashed.groupBy(groupCol).agg(mins.head, mins.tail: _*)
  }

  /** CORPUS-OVERLAP ESTIMATION: pairwise estimated Jaccard between the
    * shingle sets of every two groups (sources, crawls, dumps) from
    * their group-level MinHash signatures — "how much does source A
    * overlap source B", the curation question behind dump-to-dump
    * dedup ordering and source diversity audits. The pair join is a
    * deliberate broadcast nested-loop over the GROUP table (one row per
    * group — a source taxonomy is hundreds of rows, never corpus-
    * sized); the corpus itself is touched exactly once, by the
    * signature aggregate. Exact integer estimate arithmetic
    * (matches·1e6 DIV numPerms over replayable poly-hash mins) →
    * oracle-checkable end to end (q125). */
  def groupOverlapEstimates(docs: DataFrame, groupCol: String = "source",
                            k: Int = 3, numPerms: Int = 32): DataFrame = {
    // self-joined — materialize the one-row-per-group aggregate once
    val sig = Stage(minHashSignaturesBy(docs, groupCol, k, numPerms))
    val a = sig.select(col(groupCol).as("grp_a") +:
      (0 until numPerms).map(j => col(s"h$j").as(s"a$j")): _*)
    val b = sig.select(col(groupCol).as("grp_b") +:
      (0 until numPerms).map(j => col(s"h$j").as(s"b$j")): _*)
    val matches = (0 until numPerms)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    a.join(broadcast(b), col("grp_a") < col("grp_b"))
      .withColumn("matches", matches)
      .withColumn("est_jaccard_ppm", expr(s"matches * 1000000 DIV $numPerms"))
      .select("grp_a", "grp_b", "matches", "est_jaccard_ppm")
  }

  /** Band hashes from an already-computed signature table (doc_id,
    * h0..h{numPerms-1}) — the signature table is the ARTIFACT a corpus
    * pipeline persists; banding it is a narrow projection, so candidate
    * generation against stored signatures never re-reads text. */
  def bandsFromSignatures(sig: DataFrame, numPerms: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPerBand = numPerms / bands
    val bandHashes = (0 until bands).map { b =>
      (b * rowsPerBand until (b + 1) * rowsPerBand).foldLeft(lit(BandSeed)) {
        (acc, j) => (acc * lit(BandMult) + col(s"h$j")) % lit(BandMod)
      }
    }
    sig.select(col("doc_id"),
        posexplode(array(bandHashes: _*)).as(Seq("band", "band_hash")))
      .select("doc_id", "band", "band_hash")
  }

  /** Drop buckets shared by more than `cap` rows from a banded table —
    * the band-join dual of the stop-shingle cut: a bucket of df docs
    * emits df²/2 candidate pairs, and the biggest buckets at corpus
    * scale are exact/near-exact duplicate CLASSES (which share every
    * band). Pairs connected ONLY through a dropped bucket are missed,
    * so [[exactReps]] first (collapsing the classes the cap would
    * otherwise blind the join to), then size `cap` around the largest
    * near-dup class you still want resolved pairwise. Public callers
    * default to [[CorpusDerivedCap]]; Long.MaxValue (the explicit
    * opt-out the oracle-checked forms pass) runs uncut. The over-cap
    * key set is tiny by construction → broadcast anti-join. */
  private def capBucketDf(banded: DataFrame, cap: Long, keys: Seq[String],
                          weightCol: Option[String] = None): DataFrame = {
    // a leaked sentinel would read as "df > -1" and drop EVERY bucket
    require(cap > 0, s"bucket-df cap must be resolved and positive, got $cap")
    if (cap == Long.MaxValue) Stage(banded)
    else {
      val b = Stage(banded)
      // weightCol: when the banded rows are COLLAPSED representatives
      // (one row per distinct signature), the df must still count
      // MEMBERS — sum of class sizes — to stay bit-identical to the
      // uncollapsed cap semantics
      val hot = b.groupBy(keys.map(col): _*)
        .agg(weightCol.map(w => sum(col(w)).as("df"))
          .getOrElse(count(lit(1)).as("df")))
        .filter(col("df") > cap)
        .select(keys.map(col): _*)
      b.join(broadcast(hot), keys, "left_anti")
    }
  }

  /** LSH banding: split the signature into `bands` bands of
    * numPerms/bands values each; band hash = polynomial fold of the
    * band's values in j order. Docs sharing any band hash are candidate
    * near-duplicates; the candidate join is an equi-join on
    * (band, band_hash) — broadcastable / bucketable, never a cross join. */
  def minHashBands(docs: DataFrame, k: Int = 3, numPerms: Int = 32, bands: Int = 8): DataFrame =
    bandsFromSignatures(minHashSignatures(docs, k, numPerms), numPerms, bands)

  /** Distinct candidate pairs (id_a < id_b) sharing any (band,
    * band_hash) bucket — THE band-candidate self-join every LSH path
    * runs (pairs, estimates, keep-lists, bounded containment). One
    * owner so a contract change (cap policy, tie-break) lands
    * everywhere at once. `bh` is self-joined: pass a staged/stored
    * table. */
  def bandCandidates(bh: DataFrame): DataFrame =
    bh.as("x").join(bh.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()

  /** Candidate pairs from LSH banding, verified with exact shingle
    * Jaccard (ppm). `minJaccardPpm` filters the verified pairs.
    * `maxBandDf` bounds any one band bucket's df (see [[capBucketDf]]):
    * the hot-bucket guard for duplicate-heavy corpora. */
  def minHashLshPairs(docs: DataFrame, k: Int = 3, numPerms: Int = 32,
                      bands: Int = 8, minJaccardPpm: Long = 500000L,
                      maxShingleDf: Long = CorpusDerivedCap,
                      maxBandDf: Long = CorpusDerivedCap): DataFrame = {
    // self-joined below — materialize the band table once.
    val bh = capBucketDf(minHashBands(docs, k, numPerms, bands),
      resolveCap(docs, maxBandDf), Seq("band", "band_hash"))
    val cand = bandCandidates(bh)
    val verified = ngramJaccardPairs(docs, k, maxShingleDf)
    cand.join(verified, Seq("id_a", "id_b"))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
  }

  /** Sketch-based similarity ESTIMATION: for each LSH candidate pair,
    * estimate Jaccard as (matching signature positions)·1e6 DIV numPerms
    * — the classic MinHash property E[matches/numPerms] = J(A,B), no
    * shingle-set intersection needed. At 100 TB this is the cheap
    * verify: candidates touch only the (numPerms+1)-column signature
    * table (corpus-row-sized), never the exploded shingle table the
    * exact verify (ngramJaccardPairs) re-joins. Exact integer output →
    * oracle-checkable. */
  def minHashEstimates(docs: DataFrame, k: Int = 3, numPerms: Int = 32,
                       bands: Int = 8): DataFrame =
    // Referenced three times inside (band explode + both join sides) —
    // materialize the signature aggregate once instead of re-running
    // the shingle+min pipeline per reference.
    minHashEstimatesFromSignatures(Stage(minHashSignatures(docs, k, numPerms)),
      numPerms, bands)

  /** [[minHashEstimates]] over an ALREADY-PERSISTED signature table
    * (doc_id, h0..h{numPerms-1}) — the artifact-first form: a corpus
    * pipeline stores signatures once ([[minHashSignatures]]) and every
    * later pairs/cluster/keep-list pass starts here, never re-reading
    * text. `sig` should be a stored table or otherwise cheap to rescan
    * (it is referenced three times). */
  def minHashEstimatesFromSignatures(sig: DataFrame, numPerms: Int = 32,
                                     bands: Int = 8): DataFrame = {
    val bh = bandsFromSignatures(sig, numPerms, bands)
    val cand = bandCandidates(bh)
    val a = sig.select(col("doc_id").as("id_a") +:
      (0 until numPerms).map(j => col(s"h$j").as(s"a$j")): _*)
    val b = sig.select(col("doc_id").as("id_b") +:
      (0 until numPerms).map(j => col(s"h$j").as(s"b$j")): _*)
    val matches = (0 until numPerms)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("matches", matches)
      .withColumn("est_jaccard_ppm", expr(s"matches * 1000000 DIV $numPerms"))
      .select("id_a", "id_b", "matches", "est_jaccard_ppm")
  }

  /** INCREMENTAL dedup — the operation a production corpus pipeline runs
    * on every ingest batch: decide which NEW documents to keep, given
    * only the persisted signature table of the existing corpus
    * (doc_id, h0..h{numPerms-1} — see [[minHashSignatures]]). The
    * existing corpus TEXT is never read: its signatures band via a
    * narrow projection, candidates meet in (band, band_hash) equi-joins,
    * and the verify is signature agreement ([[minHashEstimates]]'
    * arithmetic). Cost scales with the NEW batch + the signature table,
    * not with corpus text size — the property that makes daily dedup
    * of a 100 TB corpus feasible.
    *
    * Drop policy (greedy by id, the streaming-ingest standard): a new
    * document is dropped iff its estimated Jaccard ≥ `minEstPpm`
    * against ANY existing document, or against a LOWER-id document of
    * the same batch (so within-batch duplicate groups keep exactly
    * their min id, matching q68's keep-list policy for chains of
    * directly-similar docs). Precondition: new and existing doc_ids
    * are disjoint.
    *
    * Returns the kept subset of `newDocs`, all columns intact. */
  def dedupIncremental(newDocs: DataFrame, existingSigs: DataFrame,
                       k: Int = 3, numPerms: Int = 32, bands: Int = 8,
                       minEstPpm: Long = 500000L,
                       maxBandDf: Long = CorpusDerivedCap): DataFrame =
    dedupIncrementalSigs(newDocs, Stage(minHashSignatures(newDocs, k, numPerms)),
      existingSigs, numPerms, bands, minEstPpm, maxBandDf)

  /** [[dedupIncremental]] with the new batch's signatures PRECOMPUTED by
    * the caller — the streaming-ingest path ([[graft.streaming.CorpusIngest]])
    * computes them once and reuses them for its admission-ledger append,
    * so each micro-batch shingles its documents exactly once. `newSigs`
    * must be [[minHashSignatures]]-shaped over exactly `newDocs` (and
    * already materialized if the caller reuses it — it is referenced
    * three times here). `maxBandDf` caps any one (band, band_hash)
    * bucket's population across new+existing (see [[capBucketDf]]). */
  def dedupIncrementalSigs(newDocs: DataFrame, newSigs: DataFrame,
                           existingSigs: DataFrame,
                           numPerms: Int = 32, bands: Int = 8,
                           minEstPpm: Long = 500000L,
                           maxBandDf: Long = CorpusDerivedCap): DataFrame = {
    // derived cap spans the JOINT population (a duplicate class is part
    // persisted, part incoming) — one count per signature table, each
    // one row per doc
    val cap = if (maxBandDf == CorpusDerivedCap)
      deriveCap(newSigs.count() + existingSigs.count()) else maxBandDf
    val nb0 = bandsFromSignatures(newSigs, numPerms, bands)
    val eb0 = bandsFromSignatures(existingSigs, numPerms, bands)
    val (nb, eb) = capJointBuckets(nb0, eb0, cap)
    // candidates: (new, existing) on any shared band; (new, earlier new)
    val cand = crossSideCandidates(nb, eb)
      .union(withinBatchCandidates(nb)).distinct()
    // signature-agreement verify — the "other" side may be an existing or
    // a new doc, so probe the union of both signature tables. (The
    // streaming ingest's banded-store path partition-prunes this probe
    // instead — [[graft.streaming.CorpusIngest]]; here the store is an
    // in-memory frame and the union is the honest shape.)
    val allSigs = existingSigs.select(newSigs.columns.toIndexedSeq.map(col): _*)
      .unionByName(newSigs)
    val drop = sigAgreementDrops(cand, newSigs, allSigs, numPerms, minEstPpm)
    newDocs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Joint hot-bucket cap for the incremental band join: the hot-bucket
    * population spans BOTH sides (a duplicate class is part persisted,
    * part incoming), so the df count runs on the union and the same
    * over-cap key set prunes both band tables. With the store side
    * already bucket-pruned to the batch's band buckets the counts are
    * unchanged — every store row sharing a batch band hash lives in a
    * touched bucket by construction. */
  private[graft] def capJointBuckets(nb0: DataFrame, eb0: DataFrame,
                                     maxBandDf: Long): (DataFrame, DataFrame) = {
    require(maxBandDf > 0,
      s"bucket-df cap must be resolved and positive, got $maxBandDf")
    if (maxBandDf == Long.MaxValue) (nb0, eb0)
    else {
      val hot = Stage(
        nb0.select("band", "band_hash").union(eb0.select("band", "band_hash"))
          .groupBy("band", "band_hash").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxBandDf).select("band", "band_hash"))
      (nb0.join(broadcast(hot), Seq("band", "band_hash"), "left_anti"),
       eb0.join(broadcast(hot), Seq("band", "band_hash"), "left_anti"))
    }
  }

  /** (new_id, other_id) candidates: a new doc sharing any (band,
    * band_hash) bucket with a stored doc. NOT distinct — multi-band
    * collisions repeat; callers distinct after the union. */
  private[graft] def crossSideCandidates(nb: DataFrame, eb: DataFrame): DataFrame =
    nb.as("n").join(eb.as("o"),
        col("n.band") === col("o.band") && col("n.band_hash") === col("o.band_hash"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("other_id"))

  /** (new_id, other_id) candidates within the batch itself, other_id
    * strictly lower (greedy min-id-wins drop policy). NOT distinct. */
  private[graft] def withinBatchCandidates(nb: DataFrame): DataFrame =
    nb.as("n").join(nb.as("o"),
        col("n.band") === col("o.band") && col("n.band_hash") === col("o.band_hash")
          && col("o.doc_id") < col("n.doc_id"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("other_id"))

  /** Signature-agreement verify ([[minHashEstimates]]' arithmetic) over
    * candidate pairs: new_ids whose estimated Jaccard against some
    * candidate other reaches `minEstPpm` — the drop set. `otherSigs`
    * must cover every other_id in `cand` (missing rows silently clear
    * the candidate — the fail-open shape the crash-ordering analysis
    * requires: a stored band whose signature was lost belongs to a doc
    * that never reached the corpus). */
  private[graft] def sigAgreementDrops(cand: DataFrame, newSigs: DataFrame,
                                       otherSigs: DataFrame, numPerms: Int,
                                       minEstPpm: Long): DataFrame = {
    val a = newSigs.select(col("doc_id").as("new_id") +:
      (0 until numPerms).map(j => col(s"h$j").as(s"a$j")): _*)
    val b = otherSigs.select(col("doc_id").as("other_id") +:
      (0 until numPerms).map(j => col(s"h$j").as(s"b$j")): _*)
    val matches = (0 until numPerms)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand.join(a, "new_id").join(b, "other_id")
      .withColumn("matches", matches)
      .filter(expr(s"matches * 1000000 DIV $numPerms") >= minEstPpm)
      .select(col("new_id").as("doc_id"))
      .distinct()
  }

  // --- SimHash -------------------------------------------------------------

  /** SimHash width: the polynomial token hash is < 2^32, giving 32
    * meaningful bits (cross-engine-reproducible; 64-bit xxhash would not
    * be recomputable by the DuckDB oracle). */
  private[llm] val SimHashBits = 32

  /** 32-bit SimHash over the token stream: each token votes ±1 on each bit
    * of poly_hash(token); bit of the fingerprint = sign of the tally.
    * Computed as 32 conditional-sum aggregate columns over the exploded
    * token table — one shuffle keyed by doc_id, partial aggregation
    * map-side, no row blow-up. */
  def simHash(docs: DataFrame): DataFrame = {
    val tokens = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", graft.functions.PolyHash.poly_hash(col("tok")))
    val tallies = (0 until SimHashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val agg = tokens.groupBy("doc_id").agg(tallies.head, tallies.tail: _*)
    val sig = (0 until SimHashBits).map { b =>
      when(col(s"b$b") > 0, lit(1L).cast("long") * lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** Chunk-banded hamming pairs over a per-doc signature column
    * (pigeonhole: hamming ≤ nChunks−1 ⇒ some chunk equal) — candidate
    * generation is an equi-join on (chunk index, chunk value), then an
    * exact popcount verify. Bucket count per chunk position is
    * 2^chunkBits: the candidate tail at corpus scale is n²/2^chunkBits
    * per position, so WIDER chunks (more bits) shrink the quadratic
    * tail. `maxBandDf` caps any one (chunk, value) bucket — identical
    * SimHashes (exact-dup classes) share all chunks, the same hot-bucket
    * blowup the MinHash band join has (see [[capBucketDf]]). */
  private[llm] def chunkBandPairs(sh: DataFrame, sigCol: String, nChunks: Int,
                                  chunkBits: Int, maxHamming: Int,
                                  maxBandDf0: Long = Long.MaxValue): DataFrame = {
    // IDENTICAL-SIGNATURE PRE-COLLAPSE, result-preserving (the
    // shinglePairCounts discipline): pairs depend only on signatures,
    // so the chunk join runs over DISTINCT SIGNATURES — a duplicate-
    // heavy corpus pays class-count df², not member-count df² (q71 at
    // the sf1 sweep: 79 s → seconds). Bit-identical under caps too:
    // the bucket df sums class sizes (member-counted), and within-class
    // pairs emit only for classes retaining ≥1 surviving chunk bucket
    // — exactly when the uncollapsed join would have connected them.
    val s0 = Stage(sh.select(col("doc_id"), col(sigCol)))
    val reps = Stage(s0.groupBy(sigCol)
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies")))
    // cap resolution + broadcast gate off ONE scalar pass over the
    // staged class sizes (no per-call membership count job)
    val (nDocs, dupMass) = classStats(reps, "n_copies")
    val maxBandDf =
      if (maxBandDf0 == CorpusDerivedCap) deriveCap(nDocs) else maxBandDf0
    val members = s0
      .join(reps.select(col(sigCol), col("doc_id").as("rep_id")), Seq(sigCol))
      .select(col("doc_id"), col("rep_id"))
    val mask = (1L << chunkBits) - 1
    val chunked = capBucketDf(
      reps.select(col("doc_id"), col(sigCol), col("n_copies"),
        posexplode(array((0 until nChunks).map(c =>
          shiftrightunsigned(col(sigCol), c * chunkBits).bitwiseAND(lit(mask))): _*))
          .as(Seq("chunk", "ch"))),
      maxBandDf, Seq("chunk", "ch"), weightCol = Some("n_copies"))
    val repPairs = chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ch") === col("y.ch")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("rep_a"), col("y.doc_id").as("rep_b"),
        col(s"x.$sigCol").as("sh_a"), col(s"y.$sigCol").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
    // dup-class membership only (singleton reps flow through the left
    // joins unexpanded): the broadcast is bounded by duplicate mass and
    // count-gated — above the gate the expansion shuffle-joins on rep
    // id automatically instead of broadcasting a corpus-sized map.
    val (dupMembers, bcastOk) = dupMembership(members,
      reps.filter(col("n_copies") > 1L).select(col("doc_id").as("rep_id")),
      dupMass)
    val cross = expandMemberPairs(repPairs, dupMembers, bcastOk)
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"), col("hamming"))
    // classes whose every chunk bucket was capped away pair with nobody
    // — including their own members (the uncollapsed behavior); only
    // dup members can pair within a class, so singletons stay out of
    // the join entirely
    val surviving = chunked.select(col("doc_id").as("rep_id")).distinct()
    val wm = dupMembers.join(surviving, Seq("rep_id"))
    val within = wm.as("x").join(wm.as("y"),
        col("x.rep_id") === col("y.rep_id") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        lit(0L).as("hamming"))
    cross.unionByName(within).select("id_a", "id_b", "hamming")
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming, found via
    * chunk-banding over the 32-bit signature (4 chunks of 8 bits ⇒
    * exact for maxHamming ≤ 3). Oracle-checkable (q71) — but 8-bit
    * chunks mean only 256 buckets per position, an n²/256 candidate
    * tail: at corpus scale use [[simHashPairs64]]. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
                   maxBandDf: Long = CorpusDerivedCap): DataFrame = {
    // chunked self-joins inside — materialize the simhash aggregate once.
    val sh = Stage(simHash(docs))
    chunkBandPairs(sh, "simhash",
      nChunks = 4, chunkBits = 8, maxHamming = maxHamming,
      maxBandDf0 = maxBandDf) // sentinel resolves inside, fused with the gate stats
  }

  /** 64-bit SimHash over xxhash64 token hashes — the SCALE variant of
    * [[simHash]]: twice the signature entropy and (via
    * [[simHashPairs64]]) 16-bit chunks = 65,536 buckets per position,
    * cutting the banding candidate tail 256× vs the 32-bit form.
    * xxhash64 is not replayable by the SQL oracle, so this variant is
    * spec-tested rather than oracle-checked (the 32-bit [[simHash]] is
    * the oracle-exact form). The signature is assembled with bitwise OR
    * (bit 63 would overflow an additive build under ANSI arithmetic). */
  def simHash64(docs: DataFrame): DataFrame = {
    val tokens = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val tallies = (0 until 64).map { b =>
      sum(when(shiftrightunsigned(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val agg = tokens.groupBy("doc_id").agg(tallies.head, tallies.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ bitwiseOR _)
    agg.select(col("doc_id"), sig.as("simhash64"))
  }

  /** Near-dup pairs over the 64-bit SimHash: 4 chunks of 16 bits (exact
    * for maxHamming ≤ 3), 65,536 buckets per chunk position — the
    * corpus-scale banding. */
  def simHashPairs64(docs: DataFrame, maxHamming: Int = 3,
                     maxBandDf: Long = CorpusDerivedCap): DataFrame = {
    val sh = Stage(simHash64(docs))
    chunkBandPairs(sh, "simhash64",
      nChunks = 4, chunkBits = 16, maxHamming = maxHamming,
      maxBandDf0 = maxBandDf) // sentinel resolves inside, fused with the gate stats
  }

  /** SOFT dedup — duplicate-aware loss REWEIGHTING instead of dropping
    * (the SoftDeDup observation: hard removal throws away the signal
    * that popular content carries, while keeping every copy at weight 1
    * over-trains on it; down-weighting each copy of an n-way duplicate
    * family to 1/n keeps the family's TOTAL gradient mass equal to one
    * document's). Every document gets a row:
    * (doc_id, cluster_id, n_copies, weight_ppm) with
    * weight_ppm = 10⁶ DIV n_copies — singletons read 10⁶, a 4-copy
    * family reads 250000 per copy. The weights multiply straight into a
    * per-example loss scale or a sampling probability.
    *
    * Composition of scalable stages only: near-dup pairs from the
    * inverted index ([[ngramJaccardPairs]] with the stop-shingle cut),
    * [[Clusters.connectedComponents]] over the edge list, one
    * cluster-keyed count broadcast back by equi-join. The corpus is
    * never self-joined; at 100 TB swap the pair source for LSH-band
    * candidates ([[minHashLshPairs]]) — any (id_a, id_b) table works
    * via the `pairs` overload. */
  def softDedupWeights(docs: DataFrame, k: Int = 3,
                       thresholdPpm: Long = 500000L,
                       maxShingleDf: Long = CorpusDerivedCap): DataFrame =
    softDedupWeightsFromPairs(docs,
      ngramJaccardPairs(docs, k, maxShingleDf)
        .filter(col("jaccard_ppm") >= thresholdPpm))

  /** [[softDedupWeights]] over ANY near-dup pair table (id_a, id_b) —
    * the candidate-fed form LSH banding / SimHash chunks feed at
    * corpus scale. */
  def softDedupWeightsFromPairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = Clusters.connectedComponents(pairs.select("id_a", "id_b"))
    val lab = docs.select(col("doc_id")).join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = lab.groupBy("cluster_id").agg(count(lit(1)).as("n_copies"))
    lab.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_copies"),
        expr("1000000 DIV n_copies").as("weight_ppm"))
  }
}
