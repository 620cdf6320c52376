package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{Clusters, Corpus, Dedup, Stage, TextAnalysis}
import graft.operators.Layout

/** Round-3 training-pipeline operators: dedup-cluster resolution
  * (connected components), TF-IDF term scoring, vocabulary building,
  * deterministic sampling, length histograms, sequence packing, int8
  * embedding quantization — plus the relational subquery surface
  * (EXISTS semi-join, scalar subquery, multi-nation volume shipping).
  * Determinism rules as in [[Q]].
  */
object PipelineQueries {

  /** The q31 shingle/pair pipeline as DuckDB CTE text (shared by the
    * cluster oracle), including q31's df > 64 stop-shingle cut. */
  private[queries] val pairCtes =
    """w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      | sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1),
      |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
      |        FROM w WHERE len(l) >= 3),
      | stop AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 64),
      | sh AS (SELECT doc_id, shingle FROM sh0
      |        WHERE shingle NOT IN (SELECT shingle FROM stop)),
      | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      | p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      |        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |        GROUP BY 1, 2),
      | pairs AS (SELECT id_a, id_b FROM p0
      |           JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |           WHERE (CAST(common AS BIGINT) * 1000000)
      |                 // (sa.n_sh + sb.n_sh - common) >= 300000)""".stripMargin

  /** The codegen'd dot product as an ascending-index double fold (the
    * LlmQueries.dotSql convention) — q162's chunk-retrieval stage. */
  private def ragDotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  val all: Seq[Q] = Seq(

    // Connected components over the near-duplicate pair graph — the
    // canonical-representative step of a dedup pipeline. The oracle walks
    // reachability with a recursive CTE; Spark runs iterative min-label
    // propagation ([[graft.llm.Clusters]]), whose per-round cost is two
    // shuffles over the EDGE LIST only.
    Q("q55_dedup_clusters",
      s"""WITH RECURSIVE $pairCtes,
         | edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |           UNION SELECT id_b, id_a FROM pairs),
         | reach AS (SELECT src AS id, dst AS r FROM edges
         |           UNION
         |           SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst)
         |SELECT id AS doc_id, CAST(min(least(id, r)) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val pairs = Dedup.ngramJaccardPairs(Tables(s, dir, "documents"), 3,
          maxShingleDf = 64L)
        .filter(col("jaccard_ppm") >= 300000L)
        .select("id_a", "id_b")
      Clusters.connectedComponents(pairs).orderBy("doc_id")
    },

    // Contrastive triplets: (anchor, positive) = near-dup pair,
    // negative = min-fold doc of the anchor's NEXT hash bucket —
    // deterministic, broadcastable, no global sort; degenerate and
    // false negatives dropped. The oracle replays buckets + hygiene.
    Q("q103_contrastive_triplets",
      s"""WITH RECURSIVE $pairCtes,
         | b AS (SELECT doc_id,
         |        ((doc_id % 1000000007) * 2654435761) % 1000000007 AS f
         |       FROM documents),
         | bb AS (SELECT doc_id, f, f % 64 AS bucket FROM b),
         | negs AS (SELECT bucket, doc_id AS neg_id FROM (
         |           SELECT bucket, doc_id,
         |            row_number() OVER (PARTITION BY bucket ORDER BY f, doc_id) AS rn
         |           FROM bb) WHERE rn = 1),
         | t AS (SELECT p.id_a AS anchor_id, p.id_b AS pos_id, n.neg_id
         |       FROM pairs p JOIN bb a ON a.doc_id = p.id_a
         |       JOIN negs n ON n.bucket = (a.bucket + 1) % 64
         |       WHERE n.neg_id <> p.id_a AND n.neg_id <> p.id_b)
         |SELECT anchor_id, pos_id, neg_id FROM t
         |WHERE NOT EXISTS (SELECT 1 FROM pairs q
         |  WHERE (q.id_a = anchor_id AND q.id_b = neg_id)
         |     OR (q.id_b = anchor_id AND q.id_a = neg_id)
         |     OR (q.id_a = pos_id AND q.id_b = neg_id)
         |     OR (q.id_b = pos_id AND q.id_a = neg_id))
         |ORDER BY anchor_id, pos_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val pairs = Stage(Dedup.ngramJaccardPairs(docs, 3, maxShingleDf = 64L)
        .filter(col("jaccard_ppm") >= 300000L)
        .select("id_a", "id_b"))
      Corpus.contrastiveTriplets(docs, pairs, buckets = 64)
        .orderBy("anchor_id", "pos_id")
    },

    // Incremental cluster maintenance: the near-dup pair list arrives in
    // two batches; batch 2 folds into batch 1's LABELS via rep-contracted
    // CC (Clusters.mergeComponents) — history edges never reread. The
    // oracle recomputes components over ALL pairs: a hash match proves
    // merge(cc(E1), E2) == cc(E1 ∪ E2) on real data.
    Q("q101_incremental_clusters",
      s"""WITH RECURSIVE $pairCtes,
         | edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |           UNION SELECT id_b, id_a FROM pairs),
         | reach AS (SELECT src AS id, dst AS r FROM edges
         |           UNION
         |           SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst)
         |SELECT id AS doc_id, CAST(min(least(id, r)) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      // Stage: e1 and e2 both read the pair list — without it the
      // dominant shingle-join pipeline would run twice
      val pairs = Stage(Dedup.ngramJaccardPairs(Tables(s, dir, "documents"), 3,
          maxShingleDf = 64L)
        .filter(col("jaccard_ppm") >= 300000L)
        .select("id_a", "id_b"))
      val e1 = pairs.filter((col("id_a") + col("id_b")) % 2 === 0)
      val e2 = pairs.filter((col("id_a") + col("id_b")) % 2 =!= 0)
      Clusters.mergeComponents(Clusters.connectedComponents(e1), e2)
        .orderBy("doc_id")
    },

    // CAPSTONE — the artifact a trainer actually consumes: leakage-safe
    // train split (q98) → per-language token-budget mix (q84) → sharded
    // sequence packing (q72) → shard/batch MANIFEST (doc + token counts
    // per training batch). Every stage is the library operator; the
    // oracle replays the whole composition in one statement.
    Q("q100_shard_manifest",
      s"""WITH RECURSIVE $pairCtes,
         | edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |           UNION SELECT id_b, id_a FROM pairs),
         | reach AS (SELECT src AS id, dst AS r FROM edges
         |           UNION
         |           SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
         | cc AS (SELECT id, min(least(id, r)) AS cluster_id FROM reach GROUP BY id),
         | sp AS (SELECT d.doc_id, d.lang, d.text,
         |         CAST(coalesce(cc.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
         |        FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
         | train AS (SELECT doc_id, lang, text FROM sp
         |           WHERE ((cluster_id % 1000000007) * 2654435761) % 1000000007 % 1000 < 800),
         | t AS (SELECT doc_id, lang,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |        ((doc_id % 1000000007) * 2654435761) % 1000000007 AS rnd
         |       FROM train),
         | c AS (SELECT doc_id, lang, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY rnd, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |       FROM t),
         | mix AS (SELECT doc_id, n_tokens FROM c WHERE cum - n_tokens < 3000),
         | pk AS (SELECT doc_id, doc_id % 4 AS shard, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY doc_id % 4 ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |        FROM mix)
         |SELECT shard, (cum_tokens - n_tokens) // 4096 AS batch_in_shard,
         | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM pk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, 3, maxShingleDf = 64L)
        .filter(col("jaccard_ppm") >= 300000L)
        .select("id_a", "id_b")
      val train = docs.join(
        Corpus.leakageSafeSplit(docs, pairs, trainPermille = 800)
          .filter(col("split") === "train").select("doc_id"), "doc_id")
      val mixed = Corpus.tokenBudgetMix(train, "lang", budgetTokens = 3000L)
        .select("doc_id")
      Corpus.seqPackingSharded(docs.join(mixed, "doc_id"), 4096, nShards = 4)
        .groupBy("shard", "batch_in_shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("shard", "batch_in_shard")
    },

    // Deterministic weighted sampling without replacement: priority =
    // portable-uniform(doc_id) · 1e6 DIV weight, smallest n win — longer
    // docs proportionally likelier, fully reproducible, all-BIGINT.
    Q("q99_weighted_sample",
      """WITH t AS (SELECT doc_id,
        |            greatest(CAST(n_chars AS BIGINT), 1) AS weight,
        |            (((doc_id % 1000000007) * 2654435761) % 1000000007 + 1) * 1000000
        |              // greatest(CAST(n_chars AS BIGINT), 1) AS priority
        |           FROM documents)
        |SELECT doc_id, weight, priority FROM t
        |ORDER BY priority, doc_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      Corpus.weightedSample(Tables(s, dir, "documents"), "doc_id",
        col("n_chars"), n = 50)
    },

    // Leakage-safe train/eval split: the SPLIT hash runs on the
    // near-dup CLUSTER id, so whole duplicate classes land on one side
    // — the eval-contamination guard per-doc hash splits don't give.
    // Oracle replays the pair pipeline + recursive reachability (as
    // q55) then the same mod-first integer fold.
    Q("q98_leakage_safe_split",
      s"""WITH RECURSIVE $pairCtes,
         | edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |           UNION SELECT id_b, id_a FROM pairs),
         | reach AS (SELECT src AS id, dst AS r FROM edges
         |           UNION
         |           SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
         | cc AS (SELECT id, min(least(id, r)) AS cluster_id FROM reach GROUP BY id),
         | s AS (SELECT d.doc_id,
         |        CAST(coalesce(cc.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
         |       FROM documents d LEFT JOIN cc ON cc.id = d.doc_id)
         |SELECT doc_id, cluster_id,
         | CASE WHEN ((cluster_id % 1000000007) * 2654435761) % 1000000007 % 1000 < 800
         |      THEN 'train' ELSE 'eval' END AS split
         |FROM s ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, 3, maxShingleDf = 64L)
        .filter(col("jaccard_ppm") >= 300000L)
        .select("id_a", "id_b")
      Corpus.leakageSafeSplit(docs, pairs, trainPermille = 800)
        .orderBy("doc_id")
    },

    Q("q56_tfidf_topk",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        | s AS (SELECT doc_id, term,
        |        (CAST(tf AS HUGEINT) * 1000000 * n_docs) // df AS score
        |       FROM tf JOIN df USING (term) CROSS JOIN n),
        | r AS (SELECT doc_id, term, CAST(score AS BIGINT) AS score,
        |        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rnk
        |       FROM s)
        |SELECT doc_id, term, score, rnk FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin
    ) { (s, dir) =>
      Corpus.tfIdfTopK(Tables(s, dir, "documents"), 3).orderBy("doc_id", "rnk")
    },

    // BM25 ranked retrieval (k1=1.2, b=0.75) over a 2-query term set —
    // every term score one exact integer division after clearing
    // denominators (see Corpus.bm25TopK); the oracle replays the same
    // HUGEINT arithmetic, so scores hash-match bit for bit.
    Q("q108_bm25_topk",
      """WITH qt(query_id, term) AS (VALUES (1, 'join'), (1, 'hash'),
        |   (2, 'vector'), (2, 'stream'), (2, 'window')),
        | toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |        JOIN (SELECT DISTINCT term FROM qt) USING (term) GROUP BY 1, 2),
        | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
        | g AS (SELECT count(*) AS n_docs,
        |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_tokens FROM documents),
        | s AS (SELECT doc_id, term,
        |        (CAST((2*(n_docs - df) + 1) AS HUGEINT) * 22 * t_tokens * tf * 1000000)
        |          // (CAST((2*df + 1) AS HUGEINT)
        |              * (10*t_tokens*tf + 3*t_tokens + 9*dl*n_docs)) AS score
        |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g),
        | p AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |        CAST(sum(score) AS BIGINT) AS score
        |       FROM qt JOIN s USING (term) GROUP BY 1, 2),
        | r AS (SELECT query_id, doc_id, score,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
        |       FROM p)
        |SELECT query_id, doc_id, score, rnk FROM r WHERE rnk <= 10
        |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val qt = Seq((1L, "join"), (1L, "hash"),
        (2L, "vector"), (2L, "stream"), (2L, "window")).toDF("query_id", "term")
      Corpus.bm25TopK(Tables(s, dir, "documents"), qt, k = 10)
        .orderBy("query_id", "rnk")
    },

    // MAINTAINED BM25 (round 10) — q108's statistics are all mergeable
    // counts (postings tf, doc lengths, corpus totals), so retrieval
    // serves off maintained state without rescanning the corpus (the
    // q93/q96/q110/q142 discipline). This entry folds a two-batch split
    // of the state tables and scores off the fold — the oracle is
    // q108's ONE-SHOT arithmetic verbatim, so hash-equality IS the
    // merge-correctness proof.
    Q("q152_bm25_maintained",
      """WITH qt(query_id, term) AS (VALUES (1, 'join'), (1, 'hash'),
        |   (2, 'vector'), (2, 'stream'), (2, 'window')),
        | toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |        JOIN (SELECT DISTINCT term FROM qt) USING (term) GROUP BY 1, 2),
        | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
        | g AS (SELECT count(*) AS n_docs,
        |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_tokens FROM documents),
        | s AS (SELECT doc_id, term,
        |        (CAST((2*(n_docs - df) + 1) AS HUGEINT) * 22 * t_tokens * tf * 1000000)
        |          // (CAST((2*df + 1) AS HUGEINT)
        |              * (10*t_tokens*tf + 3*t_tokens + 9*dl*n_docs)) AS score
        |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g),
        | p AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |        CAST(sum(score) AS BIGINT) AS score
        |       FROM qt JOIN s USING (term) GROUP BY 1, 2),
        | r AS (SELECT query_id, doc_id, score,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
        |       FROM p)
        |SELECT query_id, doc_id, score, rnk FROM r WHERE rnk <= 10
        |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      import graft.streaming.Bm25Ingest
      val qt = Seq((1L, "join"), (1L, "hash"),
        (2L, "vector"), (2L, "stream"), (2L, "window")).toDF("query_id", "term")
      val docs = Tables(s, dir, "documents")
      def part(m: Int) = docs.filter(col("doc_id") % 2 === m)
      val postings = Bm25Ingest.postingsState(part(0), 64)
        .unionByName(Bm25Ingest.postingsState(part(1), 64))
      val doclen = Bm25Ingest.doclenState(part(0), 64)
        .unionByName(Bm25Ingest.doclenState(part(1), 64))
      val globals = Bm25Ingest.mergeGlobals(
        Bm25Ingest.globalsState(part(0)), Bm25Ingest.globalsState(part(1)))
      Bm25Ingest.serveFromState(postings, doclen, globals, qt, k = 10)
        .orderBy("query_id", "rnk")
    },

    // HYBRID RETRIEVAL capstone (round 10) — the textbook MMR setting
    // (Carbonell & Goldstein: relevance from the IR engine, redundancy
    // from document similarity): BM25 supplies each query's top-6
    // lexical candidates with sim_q = score/1e6, the embedding table
    // supplies candidate-pair cosines, and the SAME candidate-fed greedy
    // as q148/q149 picks 3 diverse results — the query-targeted diverse
    // example selection a training pipeline runs for few-shot pools and
    // eval picking. Composes q108's exact integer arithmetic with q148's
    // statically-unrolled rounds; every double on both sides is the same
    // fold, so the selection is hash-exact. A lexical candidate WITHOUT
    // an embedding row drops from the candidate set after the top-6 cut
    // (MMR cannot diversity-rank a vectorless doc) — both sides apply
    // the same rule; the sf0.1 hardening sweep caught the oracle keeping
    // such candidates in its relevance-only first step.
    Q("q153_hybrid_retrieval", {
      val dot = (a: String, b: String) =>
        s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), " +
          s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"
      s"""WITH qt(query_id, term) AS (VALUES (1, 'join'), (1, 'hash'),
        |   (2, 'vector'), (2, 'stream'), (2, 'window')),
        | toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |        JOIN (SELECT DISTINCT term FROM qt) USING (term) GROUP BY 1, 2),
        | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
        | g AS (SELECT count(*) AS n_docs,
        |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_tokens FROM documents),
        | sterm AS (SELECT doc_id, term,
        |        (CAST((2*(n_docs - df) + 1) AS HUGEINT) * 22 * t_tokens * tf * 1000000)
        |          // (CAST((2*df + 1) AS HUGEINT)
        |              * (10*t_tokens*tf + 3*t_tokens + 9*dl*n_docs)) AS score
        |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g),
        | p AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |        CAST(sum(score) AS BIGINT) AS score
        |       FROM qt JOIN sterm USING (term) GROUP BY 1, 2),
        | r AS (SELECT query_id, doc_id, score,
        |        row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
        |       FROM p),
        | v AS (SELECT vec_id, embedding,
        |        sqrt(${dot("embedding", "embedding")}) AS nrm FROM embeddings),
        | cand AS (SELECT query_id, doc_id AS cand_id,
        |           CAST(score AS DOUBLE) / 1000000.0 AS sim_q
        |          FROM r JOIN v ON v.vec_id = r.doc_id AND v.nrm > 0
        |          WHERE rnk <= 6),
        | pair AS (SELECT x.query_id, x.cand_id AS a_id, y.cand_id AS b_id,
        |           ${dot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS sim_ab
        |          FROM cand x JOIN cand y ON x.query_id = y.query_id
        |            AND x.cand_id <> y.cand_id
        |          JOIN v ea ON ea.vec_id = x.cand_id
        |          JOIN v eb ON eb.vec_id = y.cand_id),
        | s1 AS (SELECT query_id, cand_id FROM (SELECT query_id, cand_id,
        |          row_number() OVER (PARTITION BY query_id
        |            ORDER BY sim_q DESC, cand_id) AS rn FROM cand) WHERE rn = 1),
        | m2 AS (SELECT c.query_id, c.cand_id, c.sim_q, max(p.sim_ab) AS msel
        |        FROM cand c JOIN s1 ON s1.query_id = c.query_id
        |          AND c.cand_id <> s1.cand_id
        |        JOIN pair p ON p.query_id = c.query_id
        |          AND p.a_id = c.cand_id AND p.b_id = s1.cand_id
        |        GROUP BY 1, 2, 3),
        | s2 AS (SELECT query_id, cand_id FROM (SELECT query_id, cand_id,
        |          row_number() OVER (PARTITION BY query_id
        |            ORDER BY 0.7 * sim_q - 0.3 * msel DESC, cand_id) AS rn
        |         FROM m2) WHERE rn = 1),
        | m3 AS (SELECT c.query_id, c.cand_id, c.sim_q, max(p.sim_ab) AS msel
        |        FROM cand c JOIN s1 ON s1.query_id = c.query_id
        |          AND c.cand_id <> s1.cand_id
        |        JOIN s2 ON s2.query_id = c.query_id AND c.cand_id <> s2.cand_id
        |        JOIN pair p ON p.query_id = c.query_id AND p.a_id = c.cand_id
        |          AND (p.b_id = s1.cand_id OR p.b_id = s2.cand_id)
        |        GROUP BY 1, 2, 3),
        | s3 AS (SELECT query_id, cand_id FROM (SELECT query_id, cand_id,
        |          row_number() OVER (PARTITION BY query_id
        |            ORDER BY 0.7 * sim_q - 0.3 * msel DESC, cand_id) AS rn
        |         FROM m3) WHERE rn = 1)
        |SELECT query_id, cand_id, step FROM (
        |  SELECT query_id, cand_id, CAST(1 AS BIGINT) AS step FROM s1
        |  UNION ALL SELECT query_id, cand_id, 2 FROM s2
        |  UNION ALL SELECT query_id, cand_id, 3 FROM s3)
        |ORDER BY query_id, step""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      import graft.llm.Similarity
      val qt = Seq((1L, "join"), (1L, "hash"),
        (2L, "vector"), (2L, "stream"), (2L, "window")).toDF("query_id", "term")
      val cands = Corpus.bm25TopK(Tables(s, dir, "documents"), qt, k = 6)
        .select(col("query_id"), col("doc_id").as("cand_id"),
          (col("score").cast("double") / lit(1000000.0)).as("sim_q"))
      Similarity.mmrRerankFromCandidates(cands,
          Tables(s, dir, "embeddings"), kOut = 3, lambda = 0.7)
        .orderBy("query_id", "step")
    },

    // RECIPROCAL RANK FUSION (round 10; Cormack et al. 2009) — the
    // other standard hybrid-search composition next to q153's MMR:
    // BM25 lexical top-10 fused with exact dense cosine top-10 for the
    // same query ids by score = Σ 1/(60+rank). Every fused term is the
    // INTEGER floor(1e12/(60+rnk)) and the per-doc score an order-free
    // integer sum, so fusion is hash-exact however many lists join.
    Q("q154_rrf_fusion", {
      val dot = (a: String, b: String) =>
        s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), " +
          s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"
      s"""WITH qt(query_id, term) AS (VALUES (1, 'join'), (1, 'hash'),
        |   (2, 'vector'), (2, 'stream'), (2, 'window')),
        | toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |        JOIN (SELECT DISTINCT term FROM qt) USING (term) GROUP BY 1, 2),
        | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
        | g AS (SELECT count(*) AS n_docs,
        |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_tokens FROM documents),
        | sterm AS (SELECT doc_id, term,
        |        (CAST((2*(n_docs - df) + 1) AS HUGEINT) * 22 * t_tokens * tf * 1000000)
        |          // (CAST((2*df + 1) AS HUGEINT)
        |              * (10*t_tokens*tf + 3*t_tokens + 9*dl*n_docs)) AS score
        |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g),
        | p AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |        CAST(sum(score) AS BIGINT) AS score
        |       FROM qt JOIN sterm USING (term) GROUP BY 1, 2),
        | lex AS (SELECT query_id, doc_id,
        |          row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
        |         FROM p QUALIFY rnk <= 10),
        | v AS (SELECT vec_id, embedding,
        |        sqrt(${dot("embedding", "embedding")}) AS nrm FROM embeddings),
        | dn AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY ${dot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) DESC,
        |             c.vec_id) AS rnk
        |        FROM v q JOIN v c ON q.vec_id IN (1, 2) AND q.vec_id <> c.vec_id
        |        QUALIFY rnk <= 10),
        | terms AS (SELECT query_id, doc_id, 1000000000000 // (60 + rnk) AS t FROM lex
        |           UNION ALL
        |           SELECT query_id, doc_id, 1000000000000 // (60 + rnk) FROM dn),
        | f AS (SELECT query_id, doc_id, CAST(sum(t) AS BIGINT) AS fused_score
        |       FROM terms GROUP BY 1, 2),
        | rr AS (SELECT query_id, doc_id, fused_score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY fused_score DESC, doc_id) AS BIGINT) AS rnk
        |        FROM f)
        |SELECT query_id, doc_id, fused_score, rnk FROM rr WHERE rnk <= 10
        |ORDER BY query_id, rnk""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      import graft.llm.Similarity
      val qt = Seq((1L, "join"), (1L, "hash"),
        (2L, "vector"), (2L, "stream"), (2L, "window")).toDF("query_id", "term")
      val lex = Corpus.bm25TopK(Tables(s, dir, "documents"), qt, k = 10)
        .select("query_id", "doc_id", "rnk")
      val emb = Tables(s, dir, "embeddings")
      val dense = Similarity.bruteForceKnn(emb,
          emb.filter(col("vec_id").isin(1L, 2L)), k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rnk"))
      Similarity.rrfFuse(Seq(lex, dense), kConst = 60, topK = 10)
        .orderBy("query_id", "rnk")
    },

    // BPE-style merge learning (tokenizer training): 5 rounds of
    // global-argmax pair fusion over word-level segments. The oracle
    // statically unrolls the same loop — per-round pair counts,
    // (cnt DESC, pair ASC) argmax, and the greedy left-to-right fold —
    // so the learned merge table matches rank for rank.
    Q("q111_bpe_merges",
      Corpus.mergeTrainSql("string_split(text, ' ')", "documents",
        nMerges = 5) + " ORDER BY rank"
    ) { (s, dir) =>
      Corpus.mergeTrain(
        Tables(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("seg")),
        nMerges = 5).orderBy("rank")
    },

    // Multi-merge BPE training (SentencePiece/YouTokenToMe batching):
    // 6 merges in 3 corpus scans — each round picks the top-2
    // TOKEN-DISJOINT pairs (greedy by cnt DESC, pair ASC; disjointness
    // makes their counts invariant under each other) and applies both
    // in one pass. The oracle statically unrolls rounds × picks,
    // mirroring the exclusion NOT-INs and the greedy folds, so the
    // merge table matches slot for slot.
    Q("q171_bpe_batched",
      Corpus.mergeTrainBatchedSql("string_split(text, ' ')", "documents",
        nMerges = 6, batchSize = 2) + " ORDER BY rank"
    ) { (s, dir) =>
      Corpus.mergeTrainBatched(
        Tables(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("seg")),
        nMerges = 6, batchSize = 2).orderBy("rank")
    },

    // SFT prompt-masked training pairs: instruction tuning trains only
    // on completion tokens, so each doc splits at the deterministic
    // clamp(1, n-1, n/2) boundary into a zero-loss prompt and a
    // trained completion, with the per-token 0/1 loss mask emitted
    // alongside. The oracle rebuilds every slice and mask string.
    Q("q175_sft_mask",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | m AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n_tokens,
        |        CASE WHEN len(l) = 1 THEN CAST(0 AS BIGINT)
        |             ELSE greatest(CAST(1 AS BIGINT),
        |               least(CAST(len(l) - 1 AS BIGINT),
        |                 CAST(len(l) AS BIGINT) * 500 // 1000)) END AS prompt_len
        |       FROM t WHERE len(l) >= 1)
        |SELECT doc_id, n_tokens, prompt_len,
        | coalesce(array_to_string(l[1:CAST(prompt_len AS INTEGER)], ' '), '')
        |   AS prompt_text,
        | array_to_string(l[CAST(prompt_len + 1 AS INTEGER):CAST(n_tokens AS INTEGER)], ' ')
        |   AS target_text,
        | array_to_string(list_transform(range(1, CAST(n_tokens + 1 AS INTEGER)),
        |   p -> CASE WHEN p <= prompt_len THEN '0' ELSE '1' END), ' ') AS loss_mask
        |FROM m ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Corpus.sftLossMaskPairs(Tables(s, dir, "documents"), promptPermille = 500)
        .orderBy("doc_id")
    },

    // DPO-style preference pairs from weak quality supervision:
    // near-duplicate docs (q31's capped Jaccard pairs at >= 300000 ppm)
    // are two renderings of the same content, so a bigram-LM quality
    // gap >= 1000 ppm between them is a (chosen, rejected) comparison
    // nobody had to label. The gap floor is calibrated to the synthetic
    // corpus (round-12 finding 3: at 100000 ppm the sf0.01 AND sf0.1
    // compares were vacuous — near-dup renderings of the same content
    // legitimately score within ~1% of each other, so the old floor
    // admitted nothing; 1000 ppm keeps ties and sub-noise gaps out
    // while giving the driver-checked SF real rows: 9 at sf0.01, 77 at
    // sf0.1). The oracle replays the pair pipeline, the LM retrain,
    // and the gap/tie arithmetic.
    Q("q174_preference_pairs",
      s"""WITH $pairCtes,
        | t2 AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | bg2 AS (SELECT doc_id, s.w1 AS w1, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |            i -> {'w1': l[i], 'gram': l[i] || ' ' || l[i+1]})) AS s
        |          FROM t2 WHERE len(l) >= 2)),
        | cb2 AS (SELECT gram, count(*) AS cb FROM bg2 GROUP BY 1),
        | cu2 AS (SELECT w1, count(*) AS cu FROM bg2 GROUP BY 1),
        | sc AS (SELECT b.doc_id,
        |         CAST(sum((cb2.cb * 1000000) // cu2.cu) // count(*) AS BIGINT) AS s
        |        FROM bg2 b JOIN cb2 USING (gram) JOIN cu2 USING (w1)
        |        GROUP BY b.doc_id),
        | g AS (SELECT p.id_a, p.id_b, a.s AS s_a, c.s AS s_b,
        |        abs(a.s - c.s) AS gap_ppm
        |       FROM pairs p JOIN sc a ON a.doc_id = p.id_a
        |        JOIN sc c ON c.doc_id = p.id_b)
        |SELECT CASE WHEN s_a > s_b OR (s_a = s_b AND id_a < id_b)
        |            THEN id_a ELSE id_b END AS chosen_id,
        | CASE WHEN s_a > s_b OR (s_a = s_b AND id_a < id_b)
        |      THEN id_b ELSE id_a END AS rejected_id,
        | gap_ppm
        |FROM g WHERE gap_ppm >= 1000
        |ORDER BY chosen_id, rejected_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, 3, maxShingleDf = 64L)
        .filter(col("jaccard_ppm") >= 300000L)
      Corpus.preferencePairs(pairs,
          TextAnalysis.bigramLmScore(docs).select("doc_id", "score_ppm"),
          minGapPpm = 1000L)
        .orderBy("chosen_id", "rejected_id")
    },

    // Competence-based curriculum (Platanios et al. 2019): 4 linear
    // phases, phase b admits the docs whose exact difficulty-percentile
    // rank (tokens-per-doc as the difficulty proxy; ties on doc_id) is
    // within b/4. The oracle replays the rank window and the integer
    // competence gate row for row.
    Q("q173_curriculum",
      """WITH s AS (SELECT doc_id,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS diff
        |       FROM documents),
        | r AS (SELECT doc_id, diff,
        |        CAST(row_number() OVER (ORDER BY diff, doc_id) AS BIGINT) AS rnk,
        |        CAST(count(*) OVER () AS BIGINT) AS n FROM s),
        | b AS (SELECT unnest(range(1, 5)) AS bucket)
        |SELECT CAST(b.bucket AS BIGINT) AS bucket, r.doc_id,
        | r.diff AS difficulty, rnk * 1000000 // n AS rank_ppm
        |FROM r JOIN b ON rnk * 1000000 // n <= b.bucket * 1000000 // 4
        |ORDER BY bucket, doc_id""".stripMargin
    ) { (s, dir) =>
      Corpus.curriculumSchedule(Tables(s, dir, "documents"),
          size(split(col("text"), " ")), buckets = 4)
        .orderBy("bucket", "doc_id")
    },

    Q("q57_hash_sample",
      """SELECT doc_id, lang FROM documents
        |WHERE list_reduce(list_prepend(CAST(7 AS BIGINT),
        |    list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr(CAST(doc_id AS VARCHAR), CAST(i AS INTEGER), 1)) AS BIGINT))),
        |  (a, c) -> (a * 131 + c) % 4294967291) % 100 < 20
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Corpus.hashSample(Tables(s, dir, "documents"), "doc_id", 20)
        .select("doc_id", "lang").orderBy("doc_id")
    },

    // Balanced training mix: the 20 hash-smallest docs per language —
    // deterministic "random N per group" (portable TABLESAMPLE-per-
    // stratum). The oracle replays the poly_hash rank.
    Q("q78_balanced_mix",
      """WITH h AS (SELECT doc_id, lang,
        |  list_reduce(list_prepend(CAST(7 AS BIGINT),
        |    list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr(CAST(doc_id AS VARCHAR), CAST(i AS INTEGER), 1)) AS BIGINT))),
        |   (a, c) -> (a * 131 + c) % 4294967291) AS hv
        |  FROM documents),
        | r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rnk
        |       FROM h)
        |SELECT doc_id, lang FROM r WHERE rnk <= 20 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Corpus.balancedSample(Tables(s, dir, "documents"), "lang", 20)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Sliding-window chunking (32-token chunks, 8-token overlap):
    // chunk i = tokens [i·24, i·24+32); both engines slice the same
    // token array, so chunk text and counts are byte-identical.
    Q("q79_chunking",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | n AS (SELECT doc_id, l,
        |        greatest(1, CAST(ceil((len(l) - 8) / 24.0) AS BIGINT)) AS nc
        |       FROM w),
        | c AS (SELECT doc_id, l, unnest(range(0, nc)) AS chunk_no FROM n)
        |SELECT doc_id, chunk_no,
        | array_to_string(l[CAST(chunk_no*24 + 1 AS INTEGER) : CAST(chunk_no*24 + 32 AS INTEGER)], ' ') AS chunk_text,
        | CAST(len(l[CAST(chunk_no*24 + 1 AS INTEGER) : CAST(chunk_no*24 + 32 AS INTEGER)]) AS BIGINT) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_no""".stripMargin
    ) { (s, dir) =>
      Corpus.chunkDocuments(Tables(s, dir, "documents"),
          chunkTokens = 32, overlap = 8)
        .orderBy("doc_id", "chunk_no")
    },

    Q("q58_length_histogram",
      """WITH b AS (SELECT CAST(length(text) AS BIGINT) // 50 AS bucket,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents)
        |SELECT bucket, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      Corpus.lengthHistogram(Tables(s, dir, "documents"), 50).orderBy("bucket")
    },

    Q("q59_top_bigrams",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | bg AS (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |          i -> l[i] || ' ' || l[i+1])) AS bigram
        |        FROM w WHERE len(l) >= 2)
        |SELECT bigram, count(*) AS n_occur, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM bg GROUP BY bigram ORDER BY n_occur DESC, bigram LIMIT 20""".stripMargin
    ) { (s, dir) =>
      Corpus.topBigrams(Tables(s, dir, "documents"), 20)
    },

    // TPC-H Q4 shape: EXISTS decorrelates to a left-semi join; Catalyst
    // does this rewrite automatically for the SQL form — the DataFrame
    // side states the semi-join directly.
    Q("q60_exists_semijoin",
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        | AND EXISTS (SELECT 1 FROM lineitem
        |             WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1996-01-01").cast("timestamp_ntz"))
        .join(Tables(s, dir, "lineitem").filter(col("l_discount") > 0.05),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // Scalar-subquery shape, kept in exact integers: price·N > Σprice
    // avoids the average's division entirely.
    Q("q61_scalar_subquery",
      """SELECT p_partkey, CAST(round(p_retailprice * 1000000.0) AS BIGINT) AS price_micros
        |FROM part
        |WHERE CAST(round(p_retailprice * 1000000.0) AS BIGINT) * (SELECT count(*) FROM part)
        |      > (SELECT CAST(sum(CAST(round(p_retailprice * 1000000.0) AS BIGINT)) AS BIGINT) FROM part)
        |ORDER BY p_partkey""".stripMargin
    ) { (s, dir) =>
      val part = Tables(s, dir, "part")
        .select(col("p_partkey"),
          round(col("p_retailprice") * lit(1000000.0)).cast("long").as("price_micros"))
      val tot = part.agg(sum("price_micros").as("sum_micros"),
        count(lit(1)).as("n_parts"))
      part.crossJoin(broadcast(tot))
        .filter(col("price_micros") * col("n_parts") > col("sum_micros"))
        .select("p_partkey", "price_micros")
        .orderBy("p_partkey")
    },

    // TPC-H Q7 shape (volume shipping between two nations): the two
    // nation dims broadcast; lineitem⋈orders⋈customer/supplier are the
    // real shuffles and AQE picks their sides.
    Q("q62_volume_shipping",
      """SELECT supp_nation, cust_nation, l_year, CAST(sum(vol) AS BIGINT) AS revenue_micros
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |        CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |        CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT) AS vol
        |      FROM lineitem
        |      JOIN supplier ON s_suppkey = l_suppkey
        |      JOIN orders ON o_orderkey = l_orderkey
        |      JOIN customer ON c_custkey = o_custkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) t
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    ) { (s, dir) =>
      val n1 = broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation")))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(Tables(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("s_nkey"))
        .join(n2, col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .select(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(1000000.0))
            .cast("long").as("vol"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum("vol").as("revenue_micros"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Int8 symmetric quantization — identical IEEE double ops on both
    // engines (float→double casts are exact; floor(x·127/scale + 0.5)).
    Q("q63_int8_quant",
      """WITH q AS (SELECT vec_id,
        |  list_max(list_transform(embedding, e -> abs(CAST(e AS DOUBLE)))) AS scale,
        |  list_transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * 127.0
        |    / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) + 0.5) AS BIGINT)) AS codes
        | FROM embeddings)
        |SELECT vec_id, CAST(floor(scale * 1000000.0 + 0.5) AS BIGINT) AS scale_micros,
        | codes[1] AS c0, codes[2] AS c1, codes[3] AS c2, codes[4] AS c3,
        | CAST(list_sum(codes) AS BIGINT) AS sum_codes,
        | CAST(list_min(codes) AS BIGINT) AS min_code,
        | CAST(list_max(codes) AS BIGINT) AS max_code
        |FROM q ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      Corpus.int8Quantize(Tables(s, dir, "embeddings")).orderBy("vec_id")
    },

    // Per-dimension int8 calibration (the PTQ shape): a corpus-wide
    // calibration pass finds each dimension's |max|, then every vector
    // quantizes against its dimension's own scale — codes stay
    // comparable across vectors per dimension, unlike q63's per-vector
    // scale. The oracle rebuilds the per-dim calibration from a lockstep
    // unnest and replays the identical double arithmetic.
    Q("q115_int8_perdim",
      """WITH pd AS (SELECT unnest(embedding) AS e, unnest(range(1, 65)) AS i
        |            FROM embeddings),
        | sc AS (SELECT i, max(abs(CAST(e AS DOUBLE))) AS m FROM pd GROUP BY i),
        | sl AS (SELECT list(m ORDER BY i) AS scales FROM sc),
        | q AS (SELECT vec_id, sl.scales AS scales,
        |   list_transform(range(1, 65), i -> CASE WHEN sl.scales[i] = 0
        |     THEN CAST(0 AS BIGINT)
        |     ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) * 127.0 / sl.scales[i]
        |       + 0.5) AS BIGINT) END) AS codes
        |  FROM embeddings, sl)
        |SELECT vec_id,
        | CAST(floor(scales[1] * 1000000.0 + 0.5) AS BIGINT) AS s0_micros,
        | CAST(floor(scales[2] * 1000000.0 + 0.5) AS BIGINT) AS s1_micros,
        | CAST(floor(scales[3] * 1000000.0 + 0.5) AS BIGINT) AS s2_micros,
        | CAST(floor(scales[4] * 1000000.0 + 0.5) AS BIGINT) AS s3_micros,
        | codes[1] AS c0, codes[2] AS c1, codes[3] AS c2, codes[4] AS c3,
        | CAST(list_sum(codes) AS BIGINT) AS sum_codes,
        | CAST(list_min(codes) AS BIGINT) AS min_code,
        | CAST(list_max(codes) AS BIGINT) AS max_code
        |FROM q ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      Corpus.int8QuantizePerDim(Tables(s, dir, "embeddings")).orderBy("vec_id")
    },

    // Sketch-based similarity estimation: MinHash signature agreement
    // for LSH candidate pairs — the cheap verify (touches only the
    // signature table) next to q31's exact shingle verify. The oracle
    // replays the identical signature arithmetic (poly_hash shingles,
    // (a·x+b) mod P permutations, band fold), so even the ESTIMATE is
    // hash-checked.
    Q("q65_minhash_est",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
        |        FROM w WHERE len(l) >= 3),
        | hx AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(shingle) + 1),
        |            i -> CAST(ascii(substr(shingle, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |          (a, c) -> (a * 131 + c) % 4294967291) AS x
        |        FROM sh),
        | perms AS (SELECT j, ((1103515245 * (j + 1) + 12345) % 2147483648) | 1 AS a,
        |                  (2654435761 * (j + 7)) % 4294967311 AS b
        |           FROM range(0, 32) t(j)),
        | mh AS (SELECT doc_id, j, min((a * x + b) % 4294967311) AS h
        |        FROM hx CROSS JOIN perms GROUP BY doc_id, j),
        | bh AS (SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
        |          list_reduce(list_prepend(CAST(7 AS BIGINT), list(h ORDER BY j)),
        |            (acc, v) -> (acc * 1315423911 + v) % 1000000007) AS band_hash
        |        FROM mh GROUP BY doc_id, band),
        | cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |          FROM bh x JOIN bh y ON x.band = y.band AND x.band_hash = y.band_hash
        |           AND x.doc_id < y.doc_id),
        | est AS (SELECT c.id_a, c.id_b,
        |          CAST(sum(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS BIGINT) AS matches
        |         FROM cand c JOIN mh ma ON ma.doc_id = c.id_a
        |          JOIN mh mb ON mb.doc_id = c.id_b AND mb.j = ma.j
        |         GROUP BY 1, 2)
        |SELECT id_a, id_b, matches, (matches * 1000000) // 32 AS est_jaccard_ppm
        |FROM est ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      Dedup.minHashEstimates(Tables(s, dir, "documents"), k = 3, numPerms = 32, bands = 8)
        .orderBy("id_a", "id_b")
    },

    // Histogram-based approximate quantiles — the 100 TB percentile
    // path (one aggregate over value DIV width) next to q44's exact
    // rank-arithmetic percentile. Integer arithmetic end to end.
    Q("q66_hist_quantiles",
      """WITH h AS (SELECT CAST(length(text) AS BIGINT) // 25 AS bucket, count(*) AS n
        |           FROM documents GROUP BY bucket),
        | c AS (SELECT bucket, CAST(sum(n) OVER (ORDER BY bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |       FROM h),
        | t AS (SELECT count(*) AS n_total FROM documents)
        |SELECT CAST(q.q AS BIGINT) AS quantile_permille,
        | (SELECT min((bucket + 1) * 25 - 1) FROM c, t
        |  WHERE cum * 1000 >= n_total * q.q) AS est_upper
        |FROM (SELECT unnest([500, 900, 990]) AS q) q
        |ORDER BY quantile_permille""".stripMargin
    ) { (s, dir) =>
      Corpus.histogramQuantiles(Tables(s, dir, "documents"),
          length(col("text")), width = 25L, quantilesPermille = Seq(500, 900, 990))
        .orderBy("quantile_permille")
    },

    // Explicit bloom semi-join reduction: build a bloom filter over the
    // qualifying order keys (dim side), broadcast it, pre-filter
    // lineitem BEFORE the join, then run the exact semi-join — false
    // positives are removed by the join, so the result is exact and the
    // oracle is the plain semi-join. At 100 TB the bloom probe prunes
    // the fact shuffle to the matching fraction; Spark's own runtime
    // filtering does this implicitly, here it is a first-class operator
    // (internal Catalyst expressions surfaced via GraftExtensions).
    Q("q67_bloom_prejoin",
      """SELECT l_returnflag,
        | count(*) AS n_items,
        | CAST(sum(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_qty_micros
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l_orderkey AND o_totalprice > 200000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      // might_contain requires its bloom input to be a constant or a
      // scalar subquery (BLOOM_FILTER_BINARY_OP_WRONG_TYPE otherwise),
      // so the probe is SQL; the functions come from GraftExtensions.
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      Tables(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT l_returnflag,
          | count(*) AS n_items,
          | sum(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS sum_qty_micros
          |FROM lineitem
          |WHERE might_contain(
          |        (SELECT bloom_filter_agg(xxhash64(o_orderkey), 100000L)
          |         FROM orders WHERE o_totalprice > 200000),
          |        xxhash64(l_orderkey))
          |  AND l_orderkey IN (SELECT o_orderkey FROM orders
          |                     WHERE o_totalprice > 200000)
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // The end-to-end dedup KEEP LIST — what a training pipeline actually
    // materializes: LSH band candidates → MinHash-estimate verify
    // (cheap, signature-only) → connected components → keep only each
    // cluster's representative (plus all untouched docs) via anti-join.
    // Every stage is the scalable variant; the corpus-sized table is
    // touched only by the narrow signature scan and the final anti-join.
    Q("q68_dedup_keeplist",
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
        |        FROM w WHERE len(l) >= 3),
        | hx AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(shingle) + 1),
        |            i -> CAST(ascii(substr(shingle, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |          (a, c) -> (a * 131 + c) % 4294967291) AS x
        |        FROM sh),
        | perms AS (SELECT j, ((1103515245 * (j + 1) + 12345) % 2147483648) | 1 AS a,
        |                  (2654435761 * (j + 7)) % 4294967311 AS b
        |           FROM range(0, 32) t(j)),
        | mh AS (SELECT doc_id, j, min((a * x + b) % 4294967311) AS h
        |        FROM hx CROSS JOIN perms GROUP BY doc_id, j),
        | bh AS (SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
        |          list_reduce(list_prepend(CAST(7 AS BIGINT), list(h ORDER BY j)),
        |            (acc, v) -> (acc * 1315423911 + v) % 1000000007) AS band_hash
        |        FROM mh GROUP BY doc_id, band),
        | cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |          FROM bh x JOIN bh y ON x.band = y.band AND x.band_hash = y.band_hash
        |           AND x.doc_id < y.doc_id),
        | est AS (SELECT c.id_a, c.id_b,
        |          sum(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS matches
        |         FROM cand c JOIN mh ma ON ma.doc_id = c.id_a
        |          JOIN mh mb ON mb.doc_id = c.id_b AND mb.j = ma.j
        |         GROUP BY 1, 2),
        | pairs AS (SELECT id_a, id_b FROM est
        |           WHERE (matches * 1000000) // 32 >= 500000),
        | edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |           UNION SELECT id_b, id_a FROM pairs),
        | reach AS (SELECT src AS id, dst AS r FROM edges
        |           UNION
        |           SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
        | comp AS (SELECT id, min(least(id, r)) AS cluster_id FROM reach GROUP BY id)
        |SELECT d.doc_id, d.lang FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM comp c
        |                  WHERE c.id = d.doc_id AND c.id <> c.cluster_id)
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      // exact-dup pre-pass (hot-bucket guard): only one representative
      // per distinct text enters the band join, so an exact-dup class of
      // m docs contributes 0 candidate pairs instead of m²/2. Result-
      // preserving (Dedup.exactReps scaladoc) — the oracle runs uncut
      // over all docs and hashes identically.
      val reps = Stage(Dedup.exactReps(docs.select("doc_id", "text")))
      val exactLosers = docs.select("doc_id")
        .join(reps, Seq("doc_id"), "left_anti")
      val edges = Dedup.minHashEstimates(reps, k = 3, numPerms = 32, bands = 8)
        .filter(col("est_jaccard_ppm") >= 500000L)
        .select("id_a", "id_b")
      val cc = Clusters.connectedComponents(edges)
      val ccLosers = cc.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
      docs.join(ccLosers.union(exactLosers), Seq("doc_id"), "left_anti")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // FULL OUTER join — the one join type the inventory lacked: the
    // orders-per-customer aggregate against the high-balance customer
    // set, preserving unmatched rows on BOTH sides (customers with
    // orders but modest balances, and high-balance customers with no
    // orders).
    // Keep-BEST dedup: same cluster resolution as q68 but the survivor
    // is the longest document (ties → lowest doc_id) — the policy real
    // corpus pipelines use (quality/length beats arrival order). One
    // extra rank window over the (tiny) cluster membership table.
    Q("q70_dedup_keep_best",
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
        |        FROM w WHERE len(l) >= 3),
        | hx AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(shingle) + 1),
        |            i -> CAST(ascii(substr(shingle, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |          (a, c) -> (a * 131 + c) % 4294967291) AS x
        |        FROM sh),
        | perms AS (SELECT j, ((1103515245 * (j + 1) + 12345) % 2147483648) | 1 AS a,
        |                  (2654435761 * (j + 7)) % 4294967311 AS b
        |           FROM range(0, 32) t(j)),
        | mh AS (SELECT doc_id, j, min((a * x + b) % 4294967311) AS h
        |        FROM hx CROSS JOIN perms GROUP BY doc_id, j),
        | bh AS (SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
        |          list_reduce(list_prepend(CAST(7 AS BIGINT), list(h ORDER BY j)),
        |            (acc, v) -> (acc * 1315423911 + v) % 1000000007) AS band_hash
        |        FROM mh GROUP BY doc_id, band),
        | cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |          FROM bh x JOIN bh y ON x.band = y.band AND x.band_hash = y.band_hash
        |           AND x.doc_id < y.doc_id),
        | est AS (SELECT c.id_a, c.id_b,
        |          sum(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS matches
        |         FROM cand c JOIN mh ma ON ma.doc_id = c.id_a
        |          JOIN mh mb ON mb.doc_id = c.id_b AND mb.j = ma.j
        |         GROUP BY 1, 2),
        | pairs AS (SELECT id_a, id_b FROM est
        |           WHERE (matches * 1000000) // 32 >= 500000),
        | edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |           UNION SELECT id_b, id_a FROM pairs),
        | reach AS (SELECT src AS id, dst AS r FROM edges
        |           UNION
        |           SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
        | comp AS (SELECT id, min(least(id, r)) AS cluster_id FROM reach GROUP BY id),
        | ranked AS (SELECT c.id, c.cluster_id,
        |             row_number() OVER (PARTITION BY c.cluster_id
        |               ORDER BY length(d.text) DESC, c.id) AS rk
        |            FROM comp c JOIN documents d ON d.doc_id = c.id)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
        |FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM ranked r
        |                  WHERE r.id = d.doc_id AND r.rk > 1)
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      // exact-dup pre-pass as in q68 — result-preserving for keep-best
      // too: class members tie their rep on length and lose on id, so
      // none can be a cluster survivor (Dedup.exactReps scaladoc).
      val reps = Stage(Dedup.exactReps(docs.select("doc_id", "text")))
      val exactLosers = docs.select("doc_id")
        .join(reps, Seq("doc_id"), "left_anti")
      val edges = Dedup.minHashEstimates(reps, k = 3, numPerms = 32, bands = 8)
        .filter(col("est_jaccard_ppm") >= 500000L)
        .select("id_a", "id_b")
      val cc = Clusters.connectedComponents(edges)
      val ranked = cc.join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
      val w = Window.partitionBy("cluster_id").orderBy(col("len").desc, col("doc_id"))
      val losers = ranked.withColumn("rk", row_number().over(w))
        .filter(col("rk") > 1).select("doc_id")
      docs.join(losers.union(exactLosers), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    Q("q69_full_outer",
      """SELECT COALESCE(o.c, b.c) AS custkey, o.n_orders, b.acctbal_micros
        |FROM (SELECT o_custkey AS c, count(*) AS n_orders FROM orders GROUP BY 1) o
        |FULL OUTER JOIN (SELECT c_custkey AS c,
        |                   CAST(round(c_acctbal * 1000000.0) AS BIGINT) AS acctbal_micros
        |                 FROM customer WHERE c_acctbal > 5000) b
        |ON o.c = b.c
        |ORDER BY custkey""".stripMargin
    ) { (s, dir) =>
      val o = Tables(s, dir, "orders")
        .groupBy(col("o_custkey").as("c_o"))
        .agg(count(lit(1)).as("n_orders"))
      val b = Tables(s, dir, "customer")
        .filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey").as("c_b"),
          round(col("c_acctbal") * lit(1000000.0)).cast("long").as("acctbal_micros"))
      o.join(b, col("c_o") === col("c_b"), "full_outer")
        .select(coalesce(col("c_o"), col("c_b")).as("custkey"),
          col("n_orders"), col("acctbal_micros"))
        .orderBy("custkey")
    },

    // INCREMENTAL dedup: the even-id docs play the existing corpus (only
    // their SIGNATURE table is given to the operator), the odd-id docs
    // are the ingest batch. A new doc is dropped when its MinHash
    // estimate reaches 0.5 against any existing doc or a lower-id
    // batchmate. The oracle replays signatures for both sides and the
    // same greedy-by-id policy.
    Q("q73_dedup_incremental",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
        |        FROM w WHERE len(l) >= 3),
        | hx AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(shingle) + 1),
        |            i -> CAST(ascii(substr(shingle, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |          (a, c) -> (a * 131 + c) % 4294967291) AS x
        |        FROM sh),
        | perms AS (SELECT j, ((1103515245 * (j + 1) + 12345) % 2147483648) | 1 AS a,
        |                  (2654435761 * (j + 7)) % 4294967311 AS b
        |           FROM range(0, 32) t(j)),
        | mh AS (SELECT doc_id, j, min((a * x + b) % 4294967311) AS h
        |        FROM hx CROSS JOIN perms GROUP BY doc_id, j),
        | bh AS (SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
        |          list_reduce(list_prepend(CAST(7 AS BIGINT), list(h ORDER BY j)),
        |            (acc, v) -> (acc * 1315423911 + v) % 1000000007) AS band_hash
        |        FROM mh GROUP BY doc_id, band),
        | cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS other_id
        |          FROM bh n JOIN bh o ON n.band = o.band AND n.band_hash = o.band_hash
        |          WHERE n.doc_id % 2 = 1 AND o.doc_id <> n.doc_id
        |           AND (o.doc_id % 2 = 0 OR o.doc_id < n.doc_id)),
        | est AS (SELECT c.new_id, c.other_id,
        |          sum(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS matches
        |         FROM cand c JOIN mh ma ON ma.doc_id = c.new_id
        |          JOIN mh mb ON mb.doc_id = c.other_id AND mb.j = ma.j
        |         GROUP BY 1, 2),
        | dropped AS (SELECT DISTINCT new_id FROM est
        |             WHERE (matches * 1000000) // 32 >= 500000)
        |SELECT d.doc_id, d.lang FROM documents d
        |WHERE d.doc_id % 2 = 1
        | AND NOT EXISTS (SELECT 1 FROM dropped WHERE new_id = d.doc_id)
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val existingSigs = Dedup.minHashSignatures(
        docs.filter(col("doc_id") % 2 === 0), k = 3, numPerms = 32)
      Dedup.dedupIncremental(docs.filter(col("doc_id") % 2 === 1), existingSigs,
          k = 3, numPerms = 32, bands = 8, minEstPpm = 500000L,
          maxBandDf = Long.MaxValue)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Shard-keyed sequence packing: q64's cumulative fill, but windowed
    // per shard (doc_id mod 8) — the embarrassingly-parallel form that
    // replaces q64's global single-reducer ordering at corpus scale.
    Q("q72_seq_packing_sharded",
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        | c AS (SELECT doc_id, shard, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |       FROM t)
        |SELECT doc_id, shard, n_tokens, cum_tokens,
        | (cum_tokens - n_tokens) // 4096 AS batch_in_shard
        |FROM c ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Corpus.seqPackingSharded(Tables(s, dir, "documents"), 4096, nShards = 8)
        .orderBy("doc_id")
    },

    // Multi-epoch training-order manifest: seed-free hash permutation
    // per epoch (fold input shifted by epoch·7919) → (shard, pos) slots,
    // ordered by per-(epoch, shard) windows — the DataLoader shuffle as
    // a deterministic table, different order every epoch.
    Q("q116_epoch_shuffle",
      """WITH e AS (SELECT unnest(range(0, 2)) AS epoch),
        | f AS (SELECT d.doc_id, e.epoch,
        |        (((d.doc_id + e.epoch * 7919) % 1000000007) * 2654435761)
        |          % 1000000007 AS rnd
        |       FROM documents d, e),
        | s AS (SELECT epoch, doc_id, rnd, rnd % 8 AS shard FROM f)
        |SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
        | CAST(row_number() OVER (PARTITION BY epoch, shard
        |      ORDER BY rnd, doc_id) AS BIGINT) AS pos,
        | doc_id
        |FROM s ORDER BY epoch, shard, pos""".stripMargin
    ) { (s, dir) =>
      Corpus.epochShuffle(Tables(s, dir, "documents"), nShards = 8, epochs = 2)
        .orderBy("epoch", "shard", "pos")
    },

    // Corpus snapshot diff: old = ids not divisible by 7, new = ids not
    // divisible by 11 with every %5 doc's text amended — added/removed/
    // changed detected by fingerprint compare over a FULL OUTER join.
    Q("q77_snapshot_diff",
      """WITH old AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
        | neu AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
        |                             ELSE text END AS text
        |         FROM documents WHERE doc_id % 11 <> 0),
        | ofp AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split(text, ' '),
        |             w -> CAST(ascii(w) AS BIGINT) * 1000 + length(w))),
        |          (a, b) -> (a * 31 + b) % 1000000007) AS fp FROM old),
        | nfp AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split(text, ' '),
        |             w -> CAST(ascii(w) AS BIGINT) * 1000 + length(w))),
        |          (a, b) -> (a * 31 + b) % 1000000007) AS fp FROM neu)
        |SELECT doc_id, status FROM (
        | SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp <> n.fp THEN 'changed' ELSE 'same' END AS status
        | FROM ofp o FULL OUTER JOIN nfp n ON o.doc_id = n.doc_id) t
        |WHERE status <> 'same' ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 7 =!= 0)
      val neu = docs.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" updated"))).otherwise(col("text")))
      Corpus.snapshotDiff(old, neu).orderBy("doc_id")
    },

    // Benchmark decontamination: docs with doc_id % 10 = 0 play the
    // held-out evaluation set; corpus docs sharing any 5-token shingle
    // with it are flagged with their distinct-shared-shingle count.
    // Spark joins on 8-byte shingle hashes (broadcast bench set, corpus
    // never shuffled); the oracle replays it on the shingle strings.
    Q("q83_decontam",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 3),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
        |               || ' ' || l[i+4]))) AS shingle
        |        FROM w WHERE len(l) >= 5),
        | bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
        | corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0)
        |SELECT c.doc_id, count(DISTINCT c.shingle) AS n_shared
        |FROM corp c JOIN bench b ON c.shingle = b.shingle
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      Corpus.decontaminate(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0), k = 5)
        .orderBy("doc_id")
    },

    // Token-budget mixture sampling: per language, take docs in
    // deterministic pseudo-random order until 3000 tokens are reached
    // (the crossing doc kept) — the per-source weighting rule of
    // training-mix construction, as per-stratum windows (no global
    // order, no driver loop).
    Q("q84_token_mix",
      """WITH t AS (SELECT doc_id, lang,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |             ((doc_id % 1000000007) * 2654435761) % 1000000007 AS rnd
        |           FROM documents),
        | c AS (SELECT doc_id, lang, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY rnd, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |       FROM t)
        |SELECT doc_id, lang, n_tokens, cum FROM c
        |WHERE cum - n_tokens < 3000 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Corpus.tokenBudgetMix(Tables(s, dir, "documents"), "lang", 3000L)
        .orderBy("doc_id")
    },

    // LSH-candidate-bounded containment — q80's scale-safe form: the
    // candidate set comes from MinHash banding (cost linear in band
    // buckets), containment is scored only over those pairs
    // (Dedup.containmentPairsFromCandidates — linear in |cand|, never
    // Σdf²). On this corpus the result EQUALS the full q80 (the bands
    // catch every ≥0.8-containment pair); at 100 TB this is the only
    // responsible call shape. Oracle replays bands + string-shingle
    // containment.
    Q("q87_containment_lsh",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
        |        FROM w WHERE len(l) >= 3),
        | hx AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(shingle) + 1),
        |            i -> CAST(ascii(substr(shingle, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |          (a, c) -> (a * 131 + c) % 4294967291) AS x
        |        FROM sh),
        | perms AS (SELECT j, ((1103515245 * (j + 1) + 12345) % 2147483648) | 1 AS a,
        |                  (2654435761 * (j + 7)) % 4294967311 AS b
        |           FROM range(0, 32) t(j)),
        | mh AS (SELECT doc_id, j, min((a * x + b) % 4294967311) AS h
        |        FROM hx CROSS JOIN perms GROUP BY doc_id, j),
        | bh AS (SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
        |          list_reduce(list_prepend(CAST(7 AS BIGINT), list(h ORDER BY j)),
        |            (acc, v) -> (acc * 1315423911 + v) % 1000000007) AS band_hash
        |        FROM mh GROUP BY doc_id, band),
        | cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |          FROM bh x JOIN bh y ON x.band = y.band AND x.band_hash = y.band_hash
        |           AND x.doc_id < y.doc_id),
        | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        | com AS (SELECT c.id_a, c.id_b, count(*) AS common
        |         FROM cand c JOIN sh a ON a.doc_id = c.id_a
        |                     JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        |         GROUP BY 1, 2)
        |SELECT m.id_a, m.id_b, m.common,
        | (m.common * 1000000) // least(sa.n_sh, sb.n_sh) AS contain_ppm
        |FROM com m JOIN sz sa ON sa.doc_id = m.id_a JOIN sz sb ON sb.doc_id = m.id_b
        |WHERE (m.common * 1000000) // least(sa.n_sh, sb.n_sh) >= 800000
        |ORDER BY m.id_a, m.id_b""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val bh = Stage(Dedup.minHashBands(docs, k = 3, numPerms = 32, bands = 8))
      val cand = Dedup.bandCandidates(bh)
      Dedup.containmentPairsFromCandidates(docs, cand, k = 3,
          minContainPpm = 800000L)
        .orderBy("id_a", "id_b")
    },

    // Duplicate-span flagging: per doc, the count of distinct 8-token
    // shingles appearing in ≥2 documents — the exact-substring-dedup
    // building block (verbatim-repeated spans are memorization fuel
    // even when whole docs differ). Spark works on 8-byte shingle
    // hashes; the oracle replays on the strings.
    Q("q85_dup_spans",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 6),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
        |               l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7]))) AS shingle
        |        FROM w WHERE len(l) >= 8),
        | df AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 2)
        |SELECT s.doc_id, count(*) AS n_dup_spans
        |FROM sh s JOIN df USING (shingle)
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      Dedup.duplicateSpans(Tables(s, dir, "documents"), k = 8, minDf = 2L)
        .orderBy("doc_id")
    },

    // Duplicate-span REMOVAL (Lee et al. 2022): cut every token covered
    // by a cross-document k-gram occurrence (df ≥ 2 over distinct
    // docs), keep the rest — the surgery q85 only flags. The oracle
    // rebuilds positional grams, flagged starts, and the coverage
    // lambda; note the inner lambda variable must not shadow the outer
    // position (the q117 lesson).
    Q("q119_span_removal",
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
        | g AS (SELECT doc_id, s.p AS p, s.gram AS gram
        |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(l) - 6),
        |           i -> {'p': i, 'gram': l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
        |                 l[i+3] || ' ' || l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' ||
        |                 l[i+7]})) AS s
        |         FROM w WHERE len(l) >= 8)),
        | dup AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
        |         GROUP BY gram HAVING count(*) >= 2),
        | st AS (SELECT doc_id, list_sort(list(p)) AS starts
        |        FROM g JOIN dup USING (gram) GROUP BY doc_id),
        | res AS (SELECT w.doc_id, len(w.l) AS n_tokens,
        |          list_filter(list_transform(range(1, len(w.l) + 1),
        |            i -> CASE WHEN len(list_filter(COALESCE(st.starts, []),
        |                   stt -> stt <= i AND i < stt + 8)) > 0
        |                 THEN NULL ELSE w.l[i] END), x -> x IS NOT NULL) AS kept
        |         FROM w LEFT JOIN st USING (doc_id))
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
        | COALESCE(list_aggregate(kept, 'string_agg', ' '), '') AS text_clean
        |FROM res ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Dedup.removeDuplicateSpans(Tables(s, dir, "documents"), k = 8, minDf = 2L)
        .orderBy("doc_id")
    },

    // VARIABLE-LENGTH duplicate-run removal (round-14 judge task 7; Lee
    // et al. 2022's suffix-array pass): maximal cross-document runs
    // ≥ 16 tokens, recovered from ONE positional 16-gram pass +
    // run-merging of consecutive flagged starts (a length-m run is the
    // union of its m−15 16-grams — no suffix array, no all-pairs, the
    // q119 two-shuffle budget). Reports run count + longest extent per
    // doc next to the union-coverage removal. The oracle merges runs
    // with the gaps-and-islands window (p − row_number) and rebuilds
    // the cleaned text with q119's coverage lambda.
    Q("q191_duplicate_runs",
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
        | g AS (SELECT doc_id, s.p AS p, s.gram AS gram
        |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(l) - 14),
        |           i -> {'p': i, 'gram': array_to_string(l[i : i + 15], ' ')})) AS s
        |         FROM w WHERE len(l) >= 16)),
        | dup AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
        |         GROUP BY gram HAVING count(*) >= 2),
        | fl AS (SELECT doc_id, p FROM g JOIN dup USING (gram)),
        | isl AS (SELECT doc_id, p,
        |          p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        |         FROM fl),
        | runs AS (SELECT doc_id, count(*) + 15 AS run_len
        |          FROM isl GROUP BY doc_id, grp),
        | rs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
        |         CAST(max(run_len) AS BIGINT) AS max_run_len
        |        FROM runs GROUP BY 1),
        | st AS (SELECT doc_id, list_sort(list(p)) AS starts FROM fl GROUP BY doc_id),
        | res AS (SELECT w.doc_id, len(w.l) AS n_tokens,
        |          list_filter(list_transform(range(1, len(w.l) + 1),
        |            i -> CASE WHEN len(list_filter(COALESCE(st.starts, []),
        |                   stt -> stt <= i AND i < stt + 16)) > 0
        |                 THEN NULL ELSE w.l[i] END), x -> x IS NOT NULL) AS kept
        |         FROM w LEFT JOIN st USING (doc_id))
        |SELECT r.doc_id, CAST(r.n_tokens AS BIGINT) AS n_tokens,
        | CAST(COALESCE(rs.n_runs, 0) AS BIGINT) AS n_runs,
        | CAST(COALESCE(rs.max_run_len, 0) AS BIGINT) AS max_run_len,
        | CAST(r.n_tokens - len(kept) AS BIGINT) AS dup_tokens,
        | COALESCE(list_aggregate(kept, 'string_agg', ' '), '') AS text_clean
        |FROM res r LEFT JOIN rs USING (doc_id) ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Dedup.duplicateRunStats(Tables(s, dir, "documents"), minRun = 16,
          minDf = 2L)
        .orderBy("doc_id")
    },

    // ROUND-7 CAPSTONE — the multilingual corpus release: CCNet gate
    // (q114, keep head+middle per language) → cross-doc span removal
    // over the survivors (q119) → temperature-based sampling (q118) →
    // multi-epoch training-order manifest (q116). Every stage is the
    // library operator at its scalable shape; the oracle replays the
    // entire composition in one statement.
    Q("q121_corpus_release",
      """WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS l FROM documents),
        | bg AS (SELECT doc_id, s.w1 AS w1, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |            i -> {'w1': l[i], 'gram': l[i] || ' ' || l[i+1]})) AS s
        |          FROM t WHERE len(l) >= 2)),
        | cb AS (SELECT gram, count(*) AS cb FROM bg GROUP BY 1),
        | cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
        | scores AS (SELECT b.doc_id,
        |             CAST(sum((cb.cb * 1000000) // cu.cu) // count(*) AS BIGINT) AS score_ppm
        |            FROM bg b JOIN cb USING (gram) JOIN cu USING (w1) GROUP BY 1),
        | sc AS (SELECT s.doc_id, d.lang, s.score_ppm
        |        FROM scores s JOIN documents d USING (doc_id)),
        | h AS (SELECT lang, score_ppm // 10000 AS bucket, count(*) AS n
        |       FROM sc GROUP BY 1, 2),
        | c AS (SELECT lang, bucket,
        |        CAST(sum(n) OVER (PARTITION BY lang ORDER BY bucket
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |        CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS nt
        |       FROM h),
        | thr AS (SELECT lang, qq.q, min((bucket + 1) * 10000 - 1) AS u
        |         FROM c, (SELECT unnest([333, 667]) AS q) qq
        |         WHERE cum * 1000 >= nt * qq.q GROUP BY 1, 2),
        | keep AS (SELECT s.doc_id, s.lang FROM sc s
        |          WHERE (SELECT count(*) FROM thr
        |                 WHERE thr.lang = s.lang AND s.score_ppm > thr.u) <= 1),
        | kd AS (SELECT t.doc_id, t.l FROM t JOIN keep USING (doc_id)),
        | g2 AS (SELECT doc_id, s.p AS p, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l) - 6),
        |            i -> {'p': i, 'gram': l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
        |                  l[i+3] || ' ' || l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' ||
        |                  l[i+7]})) AS s
        |          FROM kd WHERE len(l) >= 8)),
        | dup AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g2)
        |         GROUP BY gram HAVING count(*) >= 2),
        | st AS (SELECT doc_id, list_sort(list(p)) AS starts
        |        FROM g2 JOIN dup USING (gram) GROUP BY doc_id),
        | clean AS (SELECT kd.doc_id,
        |            CAST(len(kd.l) - len(list_filter(list_transform(range(1, len(kd.l) + 1),
        |              i -> CASE WHEN len(list_filter(COALESCE(st.starts, []),
        |                     stt -> stt <= i AND i < stt + 8)) > 0
        |                   THEN NULL ELSE kd.l[i] END), x -> x IS NOT NULL)) AS BIGINT) AS n_removed
        |           FROM kd LEFT JOIN st USING (doc_id)),
        | n AS (SELECT lang, count(*) AS n FROM keep GROUP BY 1),
        | w AS (SELECT lang, CAST(floor(sqrt(n) * 1000000.0) AS BIGINT) AS w FROM n),
        | tw AS (SELECT sum(w) AS tw FROM w),
        | qta AS (SELECT lang, CAST((100 * w) // tw AS BIGINT) AS quota FROM w, tw),
        | r AS (SELECT doc_id, lang,
        |        ((doc_id % 1000000007) * 2654435761) % 1000000007 AS rnd FROM keep),
        | rk AS (SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang
        |          ORDER BY rnd, doc_id) AS BIGINT) AS rnk FROM r),
        | samp AS (SELECT rk.doc_id, rk.lang FROM rk JOIN qta USING (lang)
        |          WHERE rk.rnk <= qta.quota),
        | e AS (SELECT unnest(range(0, 2)) AS epoch),
        | f AS (SELECT s.doc_id, e.epoch,
        |        (((s.doc_id + e.epoch * 7919) % 1000000007) * 2654435761)
        |          % 1000000007 AS rnd
        |       FROM samp s, e),
        | sh AS (SELECT epoch, doc_id, rnd, rnd % 4 AS shard FROM f),
        | m AS (SELECT epoch, shard,
        |        row_number() OVER (PARTITION BY epoch, shard ORDER BY rnd, doc_id) AS pos,
        |        doc_id
        |       FROM sh)
        |SELECT CAST(m.epoch AS BIGINT) AS epoch, CAST(m.shard AS BIGINT) AS shard,
        | CAST(m.pos AS BIGINT) AS pos, m.doc_id, s.lang, c.n_removed
        |FROM m JOIN samp s USING (doc_id) JOIN clean c USING (doc_id)
        |ORDER BY epoch, shard, pos""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val scored = TextAnalysis.bigramLmScore(docs)
        .select("doc_id", "score_ppm")
        .join(docs.select("doc_id", "lang"), "doc_id")
      val keepIds = Corpus.ccnetBuckets(scored, "lang", "score_ppm", 10000L)
        .filter(col("bucket") <= 1).select("doc_id", "lang")
      val kept = docs.join(keepIds.select("doc_id"), "doc_id")
      val cleaned = Dedup.removeDuplicateSpans(kept, k = 8, minDf = 2L)
        .select("doc_id", "n_removed")
      val sample = Corpus.temperatureSample(keepIds, "lang", totalSample = 100L)
        .select("doc_id", "lang")
      Corpus.epochShuffle(sample.select("doc_id"), nShards = 4, epochs = 2)
        .join(sample, "doc_id")
        .join(cleaned, "doc_id")
        .select(col("epoch"), col("shard"), col("pos"), col("doc_id"),
          col("lang"), col("n_removed"))
        .orderBy("epoch", "shard", "pos")
    },

    // END-TO-END corpus build — the three-stage composition a training
    // pipeline actually ships: quality gate (≥20 tokens, q26's is_short
    // rule) → exact dedup to min-id representatives (q30) → per-language
    // token-budget mix (q84). Every stage is the scalable variant; the
    // whole chain stays oracle-exact (no recursion, no sketches).
    Q("q86_corpus_build",
      """WITH ok AS (SELECT doc_id, lang, text FROM documents
        |            WHERE CAST(len(string_split(text, ' ')) AS BIGINT) >= 20),
        | reps AS (SELECT min(doc_id) AS doc_id FROM ok GROUP BY text),
        | surv AS (SELECT o.doc_id, o.lang,
        |            CAST(len(string_split(o.text, ' ')) AS BIGINT) AS n_tokens,
        |            ((o.doc_id % 1000000007) * 2654435761) % 1000000007 AS rnd
        |          FROM ok o JOIN reps r ON r.doc_id = o.doc_id),
        | c AS (SELECT doc_id, lang, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY rnd, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |       FROM surv)
        |SELECT doc_id, lang, n_tokens, cum FROM c
        |WHERE cum - n_tokens < 2000 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val ok = docs.filter(size(split(col("text"), " ")).cast("long") >= 20)
      val reps = Dedup.exactReps(ok.select("doc_id", "text"))
      val surv = ok.join(reps.select("doc_id"), Seq("doc_id"), "left_semi")
      Corpus.tokenBudgetMix(surv, "lang", 2000L).orderBy("doc_id")
    },

    // Winnowing (MOSS) fingerprint pairs: positional 4-gram poly
    // hashes, min per 5-window, shared-fingerprint candidates with
    // shared-count ≥ 2. The oracle replays grams, hashes, the window
    // min, the full-window filter, and the pair join.
    Q("q89_winnowing",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | g0 AS (SELECT doc_id, CAST(len(l) - 3 AS BIGINT) AS n_g,
        |         unnest(list_transform(range(1, len(l) - 2),
        |           i -> {'pos': CAST(i - 1 AS BIGINT),
        |                 'gram': l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]})) AS s
        |        FROM w WHERE len(l) >= 4),
        | h AS (SELECT doc_id, s.pos AS pos, n_g, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(s.gram) + 1),
        |            i -> CAST(ascii(substr(s.gram, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |          (a, c) -> (a * 131 + c) % 4294967291) AS hv
        |       FROM g0),
        | wm AS (SELECT doc_id, pos, n_g, min(hv) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
        |        FROM h),
        | fps AS (SELECT DISTINCT doc_id, fp FROM wm WHERE pos <= n_g - 5),
        | pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |           FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT id_a, id_b, n_shared FROM pairs WHERE n_shared >= 2
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.winnowingPairs(Tables(s, dir, "documents"),
          k = 4, w = 5, minShared = 2L)
        .orderBy("id_a", "id_b")
    },

    // Z-order curve values (operators.Layout) over two independent
    // order keys — the clustered-layout write path's bit math,
    // oracle-replayed as explicit shift/mask/sum terms in DuckDB.
    Q("q90_zorder_curve", {
      val terms = (0 until 8).map(j =>
        s"(((x >> $j) & 1) << ${2 * j + 1}) + (((y >> $j) & 1) << ${2 * j})")
        .mkString(" + ")
      s"""WITH m AS (SELECT o_orderkey, o_orderkey % 256 AS x, o_custkey % 256 AS y
         |           FROM orders)
         |SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         |       CAST($terms AS BIGINT) AS z
         |FROM m ORDER BY o_orderkey""".stripMargin
    }) { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          Layout.zValue(
            Seq(pmod(col("o_orderkey"), lit(256)),
                pmod(col("o_custkey"), lit(256))), 8).as("z"))
        .orderBy("o_orderkey")
    },

    Q("q64_seq_packing",
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        | c AS (SELECT doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |       FROM t)
        |SELECT doc_id, n_tokens, cum_tokens, (cum_tokens - n_tokens) // 4096 AS batch_id
        |FROM c ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Corpus.seqPacking(Tables(s, dir, "documents"), 4096).orderBy("doc_id")
    },

    // Cross-encoder re-ranking (round 10) — the second stage of the
    // production retrieve-then-rerank stack, hash-green end to end:
    // a cheap first-stage retriever (top-6 by shared-distinct-token
    // count — one corpus token scan semi-joined against the broadcast
    // query tokens, the q108 shape) hands its candidates to
    // Inference.rerankCrossEncoder, whose deterministic stub scores
    // exact integer-ppm token-set Jaccard — the normalization penalizes
    // long documents, so the rerank genuinely REORDERS the count-ranked
    // candidates and the oracle replays both stages. The model seam is
    // mapPartitions + grouped forward passes over candidate-bounded
    // pairs only (|queries|·6 scores, never a corpus pair).
    Q("q158_cross_encoder_rerank",
      """WITH toks AS (SELECT doc_id,
        |        list_distinct(list_filter(string_split(text, ' '),
        |          tk -> tk <> '')) AS ts
        |       FROM documents),
        | qt AS (SELECT doc_id AS query_id, unnest(ts) AS tok FROM toks
        |        WHERE doc_id < 8),
        | dt AS (SELECT doc_id AS cand_id, unnest(ts) AS tok FROM toks),
        | ov AS (SELECT query_id, cand_id, count(*) AS n_common
        |        FROM qt JOIN dt USING (tok) WHERE query_id <> cand_id
        |        GROUP BY 1, 2),
        | cand AS (SELECT query_id, cand_id FROM (SELECT query_id, cand_id,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY n_common DESC, cand_id) AS r0 FROM ov)
        |          WHERE r0 <= 6),
        | ce AS (SELECT c.query_id, c.cand_id,
        |         CAST(len(list_intersect(tq.ts, td.ts)) * 1000000 //
        |              len(list_distinct(list_concat(tq.ts, td.ts))) AS BIGINT)
        |           AS ce_ppm
        |        FROM cand c JOIN toks tq ON tq.doc_id = c.query_id
        |          JOIN toks td ON td.doc_id = c.cand_id)
        |SELECT query_id, cand_id, ce_ppm,
        | CAST(row_number() OVER (PARTITION BY query_id
        |   ORDER BY ce_ppm DESC, cand_id) AS BIGINT) AS rnk
        |FROM ce ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.llm.Inference
      val docs = Tables(s, dir, "documents")
      def toks(df: org.apache.spark.sql.DataFrame, as: String) =
        df.select(col("doc_id").as(as),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
          .filter(col("tok") =!= "")
      val overlap = toks(docs.filter(col("doc_id") < 8), "query_id")
        .join(toks(docs, "cand_id"), "tok")
        .filter(col("query_id") =!= col("cand_id"))
        .groupBy("query_id", "cand_id").agg(count(lit(1)).as("n_common"))
      val w0 = Window.partitionBy("query_id")
        .orderBy(col("n_common").desc, col("cand_id"))
      val cands = overlap.withColumn("r0", row_number().over(w0))
        .filter(col("r0") <= 6)
      Inference.rerankCrossEncoder(cands, docs).orderBy("query_id", "rnk")
    },

    // Unigram-LM Viterbi tokenization (round 10; Kudo 2018 — the
    // SentencePiece APPLY step, q111's BPE being the train-side
    // counterpart): per distinct corpus word, the optimal segmentation
    // into vocabulary pieces under (max Σ score, then fewest pieces),
    // vocab derived deterministically from the corpus (substring freq ≥
    // 8, score = exact bin()-length log2 floor − 64) and unknown chars
    // falling back to −1000. Both engines run the IDENTICAL additive
    // DP key (1024·Σscore − n + 1023): Spark as a codegen'd native
    // expression over the driver-collected sorted vocab, DuckDB as a
    // recursive CTE carrying the 4-cell sliding window — decoded with
    // sign-safe modular arithmetic, every value an exact BIGINT.
    Q("q159_unigram_tokenizer",
      """WITH RECURSIVE
        | w AS (SELECT unnest(string_split(text, ' ')) AS wd FROM documents),
        | wn AS (SELECT wd, count(*) AS cnt FROM w WHERE wd <> '' GROUP BY wd),
        | s1 AS (SELECT wd, cnt, unnest(range(1, len(wd) + 1)) AS st FROM wn),
        | s2 AS (SELECT wd, cnt, st, unnest([1, 2, 3, 4]) AS ln FROM s1),
        | sub AS (SELECT substr(wd, st, ln) AS piece,
        |          CAST(sum(cnt) AS BIGINT) AS freq
        |         FROM s2 WHERE st + ln - 1 <= len(wd)
        |         GROUP BY 1),
        | vocab AS (SELECT piece, CAST(length(bin(freq)) - 64 AS BIGINT) AS score
        |           FROM sub WHERE freq >= 8),
        | dp AS (
        |   SELECT wd, 0 AS pos, CAST(1023 AS BIGINT) AS b0,
        |          CAST(NULL AS BIGINT) AS b1, CAST(NULL AS BIGINT) AS b2,
        |          CAST(NULL AS BIGINT) AS b3
        |   FROM wn
        |   UNION ALL
        |   SELECT d.wd, d.pos + 1,
        |     greatest(
        |       d.b0 + COALESCE(v1.score, -1000) * 1024 - 1,
        |       COALESCE(d.b1 + v2.score * 1024 - 1, -4611686018427387904),
        |       COALESCE(d.b2 + v3.score * 1024 - 1, -4611686018427387904),
        |       COALESCE(d.b3 + v4.score * 1024 - 1, -4611686018427387904)),
        |     d.b0, d.b1, d.b2
        |   FROM dp d
        |   LEFT JOIN vocab v1 ON v1.piece = substr(d.wd, d.pos + 1, 1)
        |   LEFT JOIN vocab v2 ON d.pos >= 1 AND v2.piece = substr(d.wd, d.pos, 2)
        |   LEFT JOIN vocab v3 ON d.pos >= 2 AND v3.piece = substr(d.wd, d.pos - 1, 3)
        |   LEFT JOIN vocab v4 ON d.pos >= 3 AND v4.piece = substr(d.wd, d.pos - 2, 4)
        |   WHERE d.pos < len(d.wd)),
        | fin AS (SELECT wd, b0 AS key FROM dp WHERE pos = len(wd)),
        | dec AS (SELECT wd, key, ((key % 1024) + 1024) % 1024 AS m FROM fin)
        |SELECT wd, CAST((key - m) // 1024 AS BIGINT) AS score,
        | CAST(1023 - m AS BIGINT) AS n_pieces
        |FROM dec ORDER BY wd""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Corpus
      val docs = Tables(s, dir, "documents")
      val vocab = Corpus.unigramVocab(docs, maxPieceLen = 4, minFreq = 8L)
      val words = docs.select(explode(split(col("text"), " ")).as("wd"))
        .filter(col("wd") =!= "").distinct()
      Corpus.unigramSegmentWords(words, vocab, maxPieceLen = 4,
          unkScore = -1000L)
        .select("wd", "score", "n_pieces")
        .orderBy("wd")
    },

    // Per-document REAL-tokenizer token counts (round 10): q159's DP
    // run once per DISTINCT word, joined back onto the word-occurrence
    // stream, summed per doc — the scale pattern (|word vocab| Viterbi
    // calls, never per-token) proven hash-green end to end. These are
    // the counts a token-budget mix or packing pass should price with
    // when whitespace words misprice the corpus.
    Q("q160_unigram_token_counts",
      """WITH RECURSIVE
        | w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
        |       FROM documents),
        | occ AS (SELECT doc_id, wd FROM w WHERE wd <> ''),
        | wn AS (SELECT wd, count(*) AS cnt FROM occ GROUP BY wd),
        | s1 AS (SELECT wd, cnt, unnest(range(1, len(wd) + 1)) AS st FROM wn),
        | s2 AS (SELECT wd, cnt, st, unnest([1, 2, 3, 4]) AS ln FROM s1),
        | sub AS (SELECT substr(wd, st, ln) AS piece,
        |          CAST(sum(cnt) AS BIGINT) AS freq
        |         FROM s2 WHERE st + ln - 1 <= len(wd)
        |         GROUP BY 1),
        | vocab AS (SELECT piece, CAST(length(bin(freq)) - 64 AS BIGINT) AS score
        |           FROM sub WHERE freq >= 8),
        | dp AS (
        |   SELECT wd, 0 AS pos, CAST(1023 AS BIGINT) AS b0,
        |          CAST(NULL AS BIGINT) AS b1, CAST(NULL AS BIGINT) AS b2,
        |          CAST(NULL AS BIGINT) AS b3
        |   FROM wn
        |   UNION ALL
        |   SELECT d.wd, d.pos + 1,
        |     greatest(
        |       d.b0 + COALESCE(v1.score, -1000) * 1024 - 1,
        |       COALESCE(d.b1 + v2.score * 1024 - 1, -4611686018427387904),
        |       COALESCE(d.b2 + v3.score * 1024 - 1, -4611686018427387904),
        |       COALESCE(d.b3 + v4.score * 1024 - 1, -4611686018427387904)),
        |     d.b0, d.b1, d.b2
        |   FROM dp d
        |   LEFT JOIN vocab v1 ON v1.piece = substr(d.wd, d.pos + 1, 1)
        |   LEFT JOIN vocab v2 ON d.pos >= 1 AND v2.piece = substr(d.wd, d.pos, 2)
        |   LEFT JOIN vocab v3 ON d.pos >= 2 AND v3.piece = substr(d.wd, d.pos - 1, 3)
        |   LEFT JOIN vocab v4 ON d.pos >= 3 AND v4.piece = substr(d.wd, d.pos - 2, 4)
        |   WHERE d.pos < len(d.wd)),
        | np AS (SELECT wd, 1023 - ((b0 % 1024) + 1024) % 1024 AS n_pieces
        |        FROM dp WHERE pos = len(wd))
        |SELECT d.doc_id, CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens
        |FROM documents d LEFT JOIN (
        |  SELECT o.doc_id, sum(np.n_pieces) AS n_tokens
        |  FROM occ o JOIN np USING (wd) GROUP BY 1) s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Corpus
      val docs = Tables(s, dir, "documents")
      Corpus.unigramTokenCount(docs,
          Corpus.unigramVocab(docs, maxPieceLen = 4, minFreq = 8L))
        .orderBy("doc_id")
    },

    // Per-source tokenizer FERTILITY (round 10): the multilingual-
    // equity metric every tokenizer eval reports — tokens per word and
    // chars per token, per source, off the REAL unigram-LM tokenizer
    // (q159/q160), not whitespace counts. A source whose text costs 2x
    // the tokens per word pays 2x the context budget; this is the table
    // that decision reads from. Exact-ppm integer ratios over the q160
    // DP replay + one keyed rollup.
    Q("q169_tokenizer_fertility",
      """WITH RECURSIVE
        | w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
        |       FROM documents),
        | occ AS (SELECT doc_id, wd FROM w WHERE wd <> ''),
        | wn AS (SELECT wd, count(*) AS cnt FROM occ GROUP BY wd),
        | s1 AS (SELECT wd, cnt, unnest(range(1, len(wd) + 1)) AS st FROM wn),
        | s2 AS (SELECT wd, cnt, st, unnest([1, 2, 3, 4]) AS ln FROM s1),
        | sub AS (SELECT substr(wd, st, ln) AS piece,
        |          CAST(sum(cnt) AS BIGINT) AS freq
        |         FROM s2 WHERE st + ln - 1 <= len(wd)
        |         GROUP BY 1),
        | vocab AS (SELECT piece, CAST(length(bin(freq)) - 64 AS BIGINT) AS score
        |           FROM sub WHERE freq >= 8),
        | dp AS (
        |   SELECT wd, 0 AS pos, CAST(1023 AS BIGINT) AS b0,
        |          CAST(NULL AS BIGINT) AS b1, CAST(NULL AS BIGINT) AS b2,
        |          CAST(NULL AS BIGINT) AS b3
        |   FROM wn
        |   UNION ALL
        |   SELECT d.wd, d.pos + 1,
        |     greatest(
        |       d.b0 + COALESCE(v1.score, -1000) * 1024 - 1,
        |       COALESCE(d.b1 + v2.score * 1024 - 1, -4611686018427387904),
        |       COALESCE(d.b2 + v3.score * 1024 - 1, -4611686018427387904),
        |       COALESCE(d.b3 + v4.score * 1024 - 1, -4611686018427387904)),
        |     d.b0, d.b1, d.b2
        |   FROM dp d
        |   LEFT JOIN vocab v1 ON v1.piece = substr(d.wd, d.pos + 1, 1)
        |   LEFT JOIN vocab v2 ON d.pos >= 1 AND v2.piece = substr(d.wd, d.pos, 2)
        |   LEFT JOIN vocab v3 ON d.pos >= 2 AND v3.piece = substr(d.wd, d.pos - 1, 3)
        |   LEFT JOIN vocab v4 ON d.pos >= 3 AND v4.piece = substr(d.wd, d.pos - 2, 4)
        |   WHERE d.pos < len(d.wd)),
        | np AS (SELECT wd, 1023 - ((b0 % 1024) + 1024) % 1024 AS n_pieces
        |        FROM dp WHERE pos = len(wd)),
        | per_doc AS (SELECT o.doc_id, sum(np.n_pieces) AS n_tokens
        |             FROM occ o JOIN np USING (wd) GROUP BY 1)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS n_words,
        | CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
        | CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
        | CAST(sum(p.n_tokens) * 1000000 // sum(len(string_split(d.text, ' '))) AS BIGINT)
        |   AS toks_per_word_ppm,
        | CAST(sum(length(d.text)) * 1000000 // sum(p.n_tokens) AS BIGINT)
        |   AS chars_per_tok_ppm
        |FROM documents d JOIN per_doc p USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Corpus
      val docs = Tables(s, dir, "documents")
      val counts = Corpus.unigramTokenCount(docs,
        Corpus.unigramVocab(docs, maxPieceLen = 4, minFreq = 8L))
      docs.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("nw"),
          length(col("text")).cast("long").as("nc"))
        .join(counts, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nw").as("n_words"),
          sum("nc").as("n_chars"), sum("n_tokens").as("n_tokens"))
        .withColumn("toks_per_word_ppm",
          expr("n_tokens * 1000000 DIV n_words"))
        .withColumn("chars_per_tok_ppm",
          expr("n_chars * 1000000 DIV n_tokens"))
        .orderBy("source")
    },

    // RAG chunk-index capstone (round 10): the ingestion-to-retrieval
    // pipeline every retrieval-augmented stack runs — sliding-window
    // chunking (q79), per-chunk embedding (q161's replayable embedder),
    // exact retrieval of the 5 nearest chunks per query chunk — every
    // stage's ARITHMETIC replayed by the oracle in one statement.
    // Chunk key = doc_id·1000 + chunk_no (stride-24 chunks: safe to
    // 24k-token documents). Queries are each of docs 0–7's first
    // chunks; same-doc sibling chunks may legitimately rank as
    // neighbors (overlap makes them near-duplicates — the RAG dedup
    // motivation, and exactly what MMR downstream would prune).
    Q("q162_rag_chunk_retrieve",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | n AS (SELECT doc_id, l,
        |        greatest(1, CAST(ceil((len(l) - 8) / 24.0) AS BIGINT)) AS nc
        |       FROM w),
        | ch AS (SELECT doc_id * 1000 + unnest(range(0, nc)) AS cid, doc_id, l
        |        FROM n),
        | chunks AS (SELECT cid AS doc_id,
        |        array_to_string(l[CAST((cid % 1000)*24 + 1 AS INTEGER) :
        |                         CAST((cid % 1000)*24 + 32 AS INTEGER)], ' ')
        |          AS text
        |       FROM ch),
        | toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM chunks),
        | th AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(regexp_extract_all(tok, '.'),
        |            chx -> CAST(ascii(chx) AS BIGINT))),
        |          (a, b) -> (a * 131 + b) % 4294967291) AS h
        |        FROM toks),
        | dims AS (SELECT doc_id, h % 64 AS d,
        |           CAST(sum(h % 1000 + 1) AS BIGINT) AS v
        |          FROM th GROUP BY 1, 2),
        | ids AS (SELECT DISTINCT doc_id FROM dims),
        | grid AS (SELECT ids.doc_id, gd.range AS d
        |          FROM ids CROSS JOIN range(0, 64) gd),
        | cell AS (SELECT g.doc_id, g.d, COALESCE(dims.v, 0) AS v
        |          FROM grid g LEFT JOIN dims
        |            ON dims.doc_id = g.doc_id AND dims.d = g.d),
        | nrm AS (SELECT doc_id, greatest(1, CAST(sum(v * v) AS BIGINT)) AS n2
        |         FROM cell GROUP BY 1),
        | vec AS (SELECT c.doc_id,
        |          list(CAST(c.v / sqrt(n.n2) AS REAL) ORDER BY c.d) AS embedding
        |         FROM cell c JOIN nrm n USING (doc_id) GROUP BY c.doc_id),
        | vv AS (SELECT doc_id, embedding,
        |         sqrt(${ragDotSql("embedding", "embedding")}) AS nrm FROM vec),
        | scored AS (SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
        |             ${ragDotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS sim
        |            FROM vv q JOIN vv c
        |              ON q.doc_id < 8000 AND q.doc_id % 1000 = 0
        |               AND q.doc_id <> c.doc_id
        |            WHERE q.nrm > 0 AND c.nrm > 0)
        |SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM (
        |  SELECT query_id, neighbor_id,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY sim DESC, neighbor_id) AS rnk
        |  FROM scored) WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      import graft.llm.{Corpus, Inference, Similarity}
      val chunks = Corpus.chunkDocuments(Tables(s, dir, "documents"),
          chunkTokens = 32, overlap = 8)
        .select((col("doc_id") * 1000 + col("chunk_no")).as("doc_id"),
          col("chunk_text").as("text"))
      val emb = Inference.embedDocuments(chunks, dim = 64, batchSize = 32)
        .withColumnRenamed("doc_id", "vec_id")
      Similarity.bruteForceKnn(emb,
          emb.filter(col("vec_id") < 8000 && col("vec_id") % 1000 === 0),
          k = 5)
        .orderBy("query_id", "rnk")
    }
  )
}
