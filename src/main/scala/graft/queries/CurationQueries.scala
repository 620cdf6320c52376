package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{Classifier, Dedup, TextAnalysis}

/** Round-8 corpus-curation operators: the C4 line-dedup analog, the
  * Gopher repetition signals, and the model-based quality classifier —
  * the three public-recipe stages (Raffel 2020, Rae 2021, GPT-3/CCNet)
  * the heuristic + dedup suites did not yet cover. */
object CurationQueries {

  /** Exact BIGINT squared distance between two per-dim-micros list
    * columns (the q155 k-center arithmetic): bounded by 64·(2·10⁶)², so
    * BIGINT never wraps and the fold needs no HUGEINT. */
  private def kcDistSql(v: String, c: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), " +
      s"di -> ($v.m[di] - $c.m[di]) * ($v.m[di] - $c.m[di]))) AS BIGINT)"

  /** Bounded-round min-label-propagation connected components in plain
    * SQL over a symmetric `edges(src, dst)` CTE — the scalable oracle
    * replacement for the transitive-closure `reach` CTE, whose
    * reachability set is O(Σ component²) pairs and dies on duplicate-
    * heavy corpora (round-11 judge finding 2: q140's oracle at sf1,
    * ~76 M edges). Each round costs one neighbor-min propagate (O(E)
    * join + group) and one pointer jump (label := label's label,
    * O(V)); with the jump, min-label coverage grows multiplicatively
    * on monotone chains and the propagate alone guarantees radius
    * `rounds` worst-case, so 32 rounds converge for every component
    * the banding pair generators produce (clique classes bridged by
    * short near-dup chains; diameters ≤ 10 observed through sf1). A
    * non-converged component would surface as a hash MISMATCH against
    * the engine's exact fixpoint CC — loud, never silently green.
    * Emits `cl(doc_id, cluster_id)`, identical to the reach form:
    * min node id per component.
    *
    * Every multiply-referenced CTE is MATERIALIZED: DuckDB inlines
    * plain CTEs per reference, so an unmarked `edges` would re-derive
    * the whole pair pipeline (and re-open the parquet) once per round
    * — fd exhaustion before it even got slow. The caller's `edges`
    * CTE must be MATERIALIZED for the same reason. */
  private def ccLabelPropCtes(rounds: Int = 32): String = {
    val sb = new StringBuilder
    sb.append(" n0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),\n")
    sb.append(" l0 AS MATERIALIZED (SELECT id, id AS lab FROM n0),\n")
    (1 to rounds).foreach { k =>
      sb.append(s" p$k AS MATERIALIZED (SELECT n.id, least(n.lab, m.nl) AS lab FROM l${k - 1} n\n")
      sb.append(s"   JOIN (SELECT e.src AS id, min(l.lab) AS nl FROM edges e\n")
      sb.append(s"     JOIN l${k - 1} l ON l.id = e.dst GROUP BY 1) m USING (id)),\n")
      sb.append(s" l$k AS MATERIALIZED (SELECT a.id, b.lab AS lab FROM p$k a JOIN p$k b ON b.id = a.lab),\n")
    }
    sb.append(s" cl AS (SELECT id AS doc_id, lab AS cluster_id FROM l$rounds)")
    sb.toString
  }

  val all: Seq[Q] = Seq(

    // C4 "line dedup" (Raffel et al. §2.2) under the corpus single-space
    // convention: non-overlapping 8-token blocks removed from EVERY doc
    // when the block text occurs in ≥2 distinct docs. Spark works on
    // 8-byte block hashes; the oracle replays on the block strings.
    Q("q126_block_dedup",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | b AS (SELECT doc_id, s.p AS p, s.blk AS blk
        |       FROM (SELECT doc_id, unnest(list_transform(range(0, len(l) // 8),
        |           i -> {'p': i, 'blk': array_to_string(l[i*8+1 : i*8+8], ' ')})) AS s
        |         FROM w WHERE len(l) >= 8)),
        | dup AS (SELECT blk FROM (SELECT DISTINCT doc_id, blk FROM b)
        |         GROUP BY blk HAVING count(*) >= 2),
        | st AS (SELECT doc_id, list_sort(list(p)) AS dups
        |        FROM b JOIN dup USING (blk) GROUP BY doc_id),
        | res AS (SELECT w.doc_id, len(w.l) // 8 AS n_blocks,
        |          COALESCE(len(st.dups), 0) AS n_removed,
        |          list_filter(list_transform(range(1, len(w.l) + 1),
        |            i -> CASE WHEN list_contains(COALESCE(st.dups, []), (i - 1) // 8)
        |                 THEN NULL ELSE w.l[i] END), x -> x IS NOT NULL) AS kept
        |         FROM w LEFT JOIN st USING (doc_id))
        |SELECT doc_id, CAST(n_blocks AS BIGINT) AS n_blocks,
        | CAST(n_removed AS BIGINT) AS n_removed,
        | COALESCE(list_aggregate(kept, 'string_agg', ' '), '') AS text_clean
        |FROM res ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Dedup.removeDuplicateBlocks(Tables(s, dir, "documents"),
          blockLen = 8, minDf = 2L)
        .orderBy("doc_id")
    },

    // Gopher repetition signals (Rae et al. §A1.1), token-weighted:
    // top-{2,3,4}-gram occurrence share + duplicate-{5,10}-gram
    // coverage, −1 sentinels for docs shorter than n, conjunction pass.
    Q("q127_gopher_repetition",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | base AS (SELECT doc_id, len(l) AS nt FROM w),
        | g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |          i -> l[i] || ' ' || l[i+1])) AS gram FROM w WHERE len(l) >= 2),
        | g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS gram
        |        FROM w WHERE len(l) >= 3),
        | g4 AS (SELECT doc_id, unnest(list_transform(range(1, len(l) - 2),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3])) AS gram
        |        FROM w WHERE len(l) >= 4),
        | t2 AS (SELECT doc_id, max(c) AS mc FROM
        |         (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
        | t3 AS (SELECT doc_id, max(c) AS mc FROM
        |         (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1),
        | t4 AS (SELECT doc_id, max(c) AS mc FROM
        |         (SELECT doc_id, gram, count(*) AS c FROM g4 GROUP BY 1, 2) GROUP BY 1),
        | p5 AS (SELECT doc_id, s.p AS p, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l) - 3),
        |            i -> {'p': i, 'gram': l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
        |                  l[i+3] || ' ' || l[i+4]})) AS s
        |          FROM w WHERE len(l) >= 5)),
        | d5 AS (SELECT doc_id, gram FROM p5 GROUP BY doc_id, gram HAVING count(*) >= 2),
        | s5 AS (SELECT p5.doc_id, list_sort(list(p)) AS st
        |        FROM p5 JOIN d5 USING (doc_id, gram) GROUP BY 1),
        | c5 AS (SELECT w.doc_id, len(list_filter(range(1, len(w.l) + 1),
        |          i -> len(list_filter(COALESCE(s5.st, []),
        |            stt -> stt <= i AND i < stt + 5)) > 0)) AS cov
        |        FROM w LEFT JOIN s5 USING (doc_id)),
        | p10 AS (SELECT doc_id, s.p AS p, s.gram AS gram
        |         FROM (SELECT doc_id, unnest(list_transform(range(1, len(l) - 8),
        |             i -> {'p': i, 'gram': l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
        |                   l[i+3] || ' ' || l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' ||
        |                   l[i+7] || ' ' || l[i+8] || ' ' || l[i+9]})) AS s
        |           FROM w WHERE len(l) >= 10)),
        | d10 AS (SELECT doc_id, gram FROM p10 GROUP BY doc_id, gram HAVING count(*) >= 2),
        | s10 AS (SELECT p10.doc_id, list_sort(list(p)) AS st
        |         FROM p10 JOIN d10 USING (doc_id, gram) GROUP BY 1),
        | c10 AS (SELECT w.doc_id, len(list_filter(range(1, len(w.l) + 1),
        |           i -> len(list_filter(COALESCE(s10.st, []),
        |             stt -> stt <= i AND i < stt + 10)) > 0)) AS cov
        |         FROM w LEFT JOIN s10 USING (doc_id))
        |SELECT b.doc_id, CAST(b.nt AS BIGINT) AS n_tokens,
        | CAST(CASE WHEN t2.mc IS NULL THEN -1
        |   ELSE (t2.mc * 2 * 1000000) // b.nt END AS BIGINT) AS top2_ppm,
        | CAST(CASE WHEN t3.mc IS NULL THEN -1
        |   ELSE (t3.mc * 3 * 1000000) // b.nt END AS BIGINT) AS top3_ppm,
        | CAST(CASE WHEN t4.mc IS NULL THEN -1
        |   ELSE (t4.mc * 4 * 1000000) // b.nt END AS BIGINT) AS top4_ppm,
        | CAST(CASE WHEN b.nt < 5 THEN -1
        |   ELSE (c5.cov * 1000000) // b.nt END AS BIGINT) AS dup5_ppm,
        | CAST(CASE WHEN b.nt < 10 THEN -1
        |   ELSE (c10.cov * 1000000) // b.nt END AS BIGINT) AS dup10_ppm,
        | CAST(CASE WHEN
        |   (t2.mc IS NULL OR (t2.mc * 2 * 1000000) // b.nt <= 200000) AND
        |   (t3.mc IS NULL OR (t3.mc * 3 * 1000000) // b.nt <= 180000) AND
        |   (t4.mc IS NULL OR (t4.mc * 4 * 1000000) // b.nt <= 160000) AND
        |   (b.nt < 5 OR (c5.cov * 1000000) // b.nt <= 150000) AND
        |   (b.nt < 10 OR (c10.cov * 1000000) // b.nt <= 100000)
        |  THEN 1 ELSE 0 END AS BIGINT) AS rep_pass
        |FROM base b
        |LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
        |LEFT JOIN t4 USING (doc_id) LEFT JOIN c5 USING (doc_id)
        |LEFT JOIN c10 USING (doc_id)
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.gopherRepetition(Tables(s, dir, "documents"))
        .orderBy("doc_id")
    },

    // Naive-Bayes quality classifier (the GPT-3/CCNet "reference corpus
    // vs the rest" filter): token log2-ratio weights with Laplace
    // smoothing + class prior, mean milli-bits per token, floor-divided.
    Q("q128_nb_quality_classifier",
      """WITH toks AS (SELECT doc_id,
        |        source IN ('src0', 'src1', 'src2', 'src3') AS is_good,
        |        unnest(string_split(text, ' ')) AS tok FROM documents),
        | c AS (SELECT tok, count(*) FILTER (WHERE is_good) AS c_g,
        |        count(*) FILTER (WHERE NOT is_good) AS c_b
        |       FROM toks GROUP BY 1),
        | t AS (SELECT sum(c_g) AS tg, sum(c_b) AS tb, count(*) AS v FROM c),
        | w AS (SELECT tok,
        |        CAST(length(bin((c_g + 1) * 1048576 // (c_b + 1))) AS BIGINT) - 21
        |        + (SELECT CAST(length(bin((tb + v) * 1048576 // (tg + v))) AS BIGINT) - 21
        |           FROM t) AS w_bits
        |       FROM c),
        | s AS (SELECT doc_id, count(*) AS n_tokens, sum(w_bits) AS sum_bits
        |       FROM toks JOIN w USING (tok) GROUP BY 1)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(sum_bits AS BIGINT) AS sum_bits,
        | CAST(sum_bits * 1000 // n_tokens AS BIGINT) AS score_mbits,
        | CAST(CASE WHEN sum_bits * 1000 // n_tokens >= -1225 THEN 1 ELSE 0 END
        |   AS BIGINT) AS kept
        |FROM s ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Classifier.nbQualityScores(Tables(s, dir, "documents"),
          col("source").isin("src0", "src1", "src2", "src3"),
          minScoreMbits = -1225L)
        .orderBy("doc_id")
    },

    // Incremental classifier training: the NB count state is a
    // mergeable aggregate (per-token class-count sums), so training
    // folds batch by batch — merge(state(A), state(B)) == state(A ∪ B)
    // EXACTLY, the q93/q101 maintenance guarantee applied to model
    // training. Spark trains on a parity split folded together; the
    // oracle trains once over the full corpus — hash equality IS the
    // incremental-equals-rescan proof.
    Q("q130_nb_incremental_train",
      """WITH toks AS (SELECT doc_id,
        |        source IN ('src0', 'src1', 'src2', 'src3') AS is_good,
        |        unnest(string_split(text, ' ')) AS tok FROM documents),
        | c AS (SELECT tok, count(*) FILTER (WHERE is_good) AS c_g,
        |        count(*) FILTER (WHERE NOT is_good) AS c_b
        |       FROM toks GROUP BY 1),
        | t AS (SELECT sum(c_g) AS tg, sum(c_b) AS tb, count(*) AS v FROM c)
        |SELECT tok, CAST(c_g AS BIGINT) AS c_g, CAST(c_b AS BIGINT) AS c_b,
        | CAST(length(bin((c_g + 1) * 1048576 // (c_b + 1))) AS BIGINT) - 21
        |  + (SELECT CAST(length(bin((tb + v) * 1048576 // (tg + v))) AS BIGINT) - 21
        |     FROM t) AS w_bits
        |FROM c ORDER BY tok""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val pred = col("source").isin("src0", "src1", "src2", "src3")
      val even = Classifier.countState(docs.filter(col("doc_id") % 2 === 0), pred)
      val odd = Classifier.countState(docs.filter(col("doc_id") % 2 === 1), pred)
      Classifier.weightsFromCounts(Classifier.mergeCounts(even, odd))
        .select(col("tok"), col("c_g").cast("long").as("c_g"),
          col("c_b").cast("long").as("c_b"), col("w_bits"))
        .orderBy("tok")
    },

    // Centroid-distance pruning (the D4 / SSL-prototypes shape): rank
    // every vector by squared Euclidean distance to its label-group
    // mean; flag the farthest 10% (outliers) and nearest 10%
    // (redundant prototypes). Division-free ranking: dist2 =
    // Σ(n·v − S)² over per-dim micros, HUGEINT in the oracle,
    // DECIMAL(38,0) in Spark.
    Q("q131_centroid_pruning",
      """WITH vm AS (SELECT vec_id, label, list_transform(range(1, 65),
        |        di -> CAST(round(CAST(embedding[di] AS DOUBLE) * 1000000.0) AS BIGINT)) AS m
        |      FROM embeddings),
        | comp AS (SELECT vec_id, label, di, m[di] AS v
        |          FROM vm, range(1, 65) t(di)),
        | cent AS (SELECT label, di, sum(v) AS s FROM comp GROUP BY 1, 2),
        | nn AS (SELECT label, count(*) AS n FROM vm GROUP BY 1),
        | d AS (SELECT c.vec_id, c.label,
        |        sum(CAST(nn.n * c.v - ct.s AS HUGEINT)
        |            * CAST(nn.n * c.v - ct.s AS HUGEINT)) AS dist2
        |       FROM comp c JOIN cent ct USING (label, di) JOIN nn USING (label)
        |       GROUP BY 1, 2),
        | r AS (SELECT d.vec_id, d.label, nn.n,
        |        CAST(d.dist2 // CAST(nn.n * nn.n AS HUGEINT) AS BIGINT) AS dist2m,
        |        row_number() OVER (PARTITION BY d.label
        |          ORDER BY d.dist2 DESC, d.vec_id) AS rank_far
        |       FROM d JOIN nn USING (label))
        |SELECT vec_id, label, CAST(n AS BIGINT) AS n, dist2m,
        | CAST(rank_far AS BIGINT) AS rank_far,
        | CAST(CASE WHEN rank_far * 1000 <= n * 100 THEN 1 ELSE 0 END
        |   AS BIGINT) AS is_outlier,
        | CAST(CASE WHEN (n - rank_far + 1) * 1000 <= n * 100 THEN 1 ELSE 0 END
        |   AS BIGINT) AS is_prototype
        |FROM r ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Similarity
      Similarity.centroidOutliers(Tables(s, dir, "embeddings"),
          groupCol = "label", dim = 64,
          outlierPermille = 100, protoPermille = 100)
        .orderBy("vec_id")
    },

    // Stupid-backoff trigram LM scoring (Brants et al. 2007) — the
    // web-scale LM filter in its CCNet arrangement: counts trained on
    // the English reference subset, every doc scored with genuine
    // backoff (train ⊊ corpus, so unseen trigrams/bigrams really
    // occur). 0.4 = 2/5 keeps every term an exact integer ppm.
    Q("q132_stupid_backoff",
      """WITH trl AS (SELECT string_split(text, ' ') AS l FROM documents
        |             WHERE lang = 'en'),
        | c3 AS (SELECT tri, count(*) AS c3 FROM
        |         (SELECT unnest(list_transform(range(1, len(l) - 1),
        |            i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS tri
        |          FROM trl WHERE len(l) >= 3) GROUP BY 1),
        | c2 AS (SELECT bi, count(*) AS c2 FROM
        |         (SELECT unnest(list_transform(range(1, len(l)),
        |            i -> l[i] || ' ' || l[i+1])) AS bi
        |          FROM trl WHERE len(l) >= 2) GROUP BY 1),
        | c1 AS (SELECT w, count(*) AS c1 FROM
        |         (SELECT unnest(l) AS w FROM trl) GROUP BY 1),
        | t AS (SELECT sum(len(l)) AS tt FROM trl),
        | dl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | pos AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2, s.w3 AS w3
        |         FROM (SELECT doc_id, unnest(list_transform(range(1, len(l) - 1),
        |             i -> {'w1': l[i], 'w2': l[i+1], 'w3': l[i+2]})) AS s
        |           FROM dl WHERE len(l) >= 3)),
        | j AS (SELECT p.doc_id, c3.c3, c2p.c2 AS c2p, c2b.c2 AS c2b,
        |        c1p.c1 AS c1p, c1c.c1 AS c1c
        |       FROM pos p
        |       LEFT JOIN c3 ON c3.tri = p.w1 || ' ' || p.w2 || ' ' || p.w3
        |       LEFT JOIN c2 c2p ON c2p.bi = p.w1 || ' ' || p.w2
        |       LEFT JOIN c2 c2b ON c2b.bi = p.w2 || ' ' || p.w3
        |       LEFT JOIN c1 c1p ON c1p.w = p.w2
        |       LEFT JOIN c1 c1c ON c1c.w = p.w3),
        | s AS (SELECT doc_id,
        |        CASE WHEN c3 IS NOT NULL THEN c3 * 1000000 // c2p
        |             WHEN c2b IS NOT NULL THEN (2 * c2b * 1000000) // (5 * c1p)
        |             ELSE (4 * COALESCE(c1c, 0) * 1000000)
        |                  // (25 * (SELECT tt FROM t)) END AS term,
        |        CASE WHEN c3 IS NOT NULL THEN 0
        |             WHEN c2b IS NOT NULL THEN 1 ELSE 2 END AS br
        |       FROM j)
        |SELECT doc_id, count(*) AS n_trigrams,
        | CAST(count(*) FILTER (WHERE br = 0) AS BIGINT) AS tri_hits,
        | CAST(count(*) FILTER (WHERE br = 1) AS BIGINT) AS bi_hits,
        | CAST(count(*) FILTER (WHERE br = 2) AS BIGINT) AS uni_backoffs,
        | CAST(sum(term) // count(*) AS BIGINT) AS sb_score_ppm
        |FROM s GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.stupidBackoffScore(Tables(s, dir, "documents"),
          col("lang") === "en")
        .orderBy("doc_id")
    },

    // Language-ID confusion matrix — the eval table every classifier
    // stage ships with: predicted vs ground-truth language counts over
    // the marker-token langId (q26's operator). The oracle replays the
    // marker scores and the fixed precedence argmax exactly.
    Q("q133_langid_confusion",
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
        | s AS (SELECT doc_id, lang,
        |        len(list_filter(l, x -> x = 'the')) + len(list_filter(l, x -> x = 'and'))
        |         + len(list_filter(l, x -> x = 'of')) AS s_en,
        |        len(list_filter(l, x -> x = 'der')) + len(list_filter(l, x -> x = 'und'))
        |         + len(list_filter(l, x -> x = 'die')) AS s_de,
        |        len(list_filter(l, x -> x = 'le')) + len(list_filter(l, x -> x = 'et'))
        |         + len(list_filter(l, x -> x = 'la')) AS s_fr,
        |        len(list_filter(l, x -> x = 'el')) + len(list_filter(l, x -> x = 'y'))
        |         + len(list_filter(l, x -> x = 'los')) AS s_es
        |       FROM t),
        | p AS (SELECT doc_id, lang,
        |        CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |             WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS pred_lang
        |       FROM s)
        |SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      docs.select(col("doc_id"), col("lang"))
        .join(TextAnalysis.langId(docs).select("doc_id", "pred_lang"), "doc_id")
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred_lang")
    },

    // Classifier calibration buckets — the reliability diagram as a
    // table: per score band, how often is the doc actually from the
    // reference class? Buckets are fixed-width over SHIFTED scores:
    // both engines TRUNCATE integer division toward zero (verified —
    // see Classifier's scoring note), but truncation makes the bucket
    // around zero twice as wide as the rest; the shift keeps every
    // score positive so the bands are uniform (and non-negative).
    Q("q134_classifier_calibration",
      """WITH toks AS (SELECT doc_id,
        |        source IN ('src0', 'src1', 'src2', 'src3') AS is_good,
        |        unnest(string_split(text, ' ')) AS tok FROM documents),
        | c AS (SELECT tok, count(*) FILTER (WHERE is_good) AS c_g,
        |        count(*) FILTER (WHERE NOT is_good) AS c_b
        |       FROM toks GROUP BY 1),
        | t AS (SELECT sum(c_g) AS tg, sum(c_b) AS tb, count(*) AS v FROM c),
        | w AS (SELECT tok,
        |        CAST(length(bin((c_g + 1) * 1048576 // (c_b + 1))) AS BIGINT) - 21
        |        + (SELECT CAST(length(bin((tb + v) * 1048576 // (tg + v))) AS BIGINT) - 21
        |           FROM t) AS w_bits
        |       FROM c),
        | sc AS (SELECT doc_id, count(*) AS n_tokens, sum(w_bits) AS sum_bits
        |        FROM toks JOIN w USING (tok) GROUP BY 1),
        | sb AS (SELECT d.doc_id,
        |         (sc.sum_bits * 1000 // sc.n_tokens + 100000) // 50 AS bucket,
        |         CASE WHEN d.source IN ('src0', 'src1', 'src2', 'src3')
        |           THEN 1 ELSE 0 END AS ig
        |        FROM sc JOIN documents d USING (doc_id))
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(ig) AS BIGINT) AS n_good,
        | CAST(sum(ig) * 1000000 // count(*) AS BIGINT) AS good_ppm
        |FROM sb GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val pred = col("source").isin("src0", "src1", "src2", "src3")
      Classifier.nbQualityScores(docs, pred)
        .join(docs.select(col("doc_id"), pred.cast("long").as("ig")), "doc_id")
        .withColumn("bucket", expr("(score_mbits + 100000) DIV 50"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("ig").as("n_good"),
          expr("sum(ig) * 1000000 DIV count(*)").as("good_ppm"))
        .orderBy("bucket")
    },

    // Perceptual-hash near-dup pairs over the multimodal payloads (the
    // LAION-style image dedup, aHash form): 64-bit hash from decoded-
    // content slot sums, 4x16-bit pigeonhole banding (exact to hamming
    // 3), popcount verify. The oracle replays slot sums, the packed
    // BIGINT (bit 63 via the signed constant), chunks, and the verify.
    Q("q135_perceptual_neardup",
      """WITH chars AS (SELECT doc_id, s.p AS p, s.c AS c
        |      FROM (SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
        |          i -> {'p': i, 'c': ascii(substr(text, CAST(i AS INTEGER), 1))})) AS s
        |        FROM documents)),
        | slots AS (SELECT doc_id, (p - 1) % 64 AS slot, sum(c) AS sc
        |           FROM chars GROUP BY 1, 2),
        | tot AS (SELECT doc_id, sum(sc) AS t FROM slots GROUP BY 1),
        | bits AS (SELECT s.doc_id, s.slot,
        |        CASE WHEN s.sc * 64 >= tot.t THEN 1 ELSE 0 END AS bit
        |       FROM slots s JOIN tot USING (doc_id)),
        | ph AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN slot = 63 AND bit = 1 THEN -9223372036854775808
        |                 WHEN bit = 1 THEN (CAST(1 AS BIGINT) << CAST(slot AS INTEGER))
        |                 ELSE 0 END) AS BIGINT) AS h
        |       FROM bits GROUP BY 1),
        | ck AS (SELECT doc_id, h, k, (h >> CAST(k * 16 AS INTEGER)) & 65535 AS cv
        |        FROM ph, range(0, 4) t(k)),
        | pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |        bit_count(xor(a.h, b.h)) AS hamming
        |       FROM ck a JOIN ck b ON a.k = b.k AND a.cv = b.cv
        |         AND a.doc_id < b.doc_id
        |       WHERE bit_count(xor(a.h, b.h)) <= 3)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM pairs ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Multimodal
      Multimodal.perceptualNearDupPairs(Tables(s, dir, "documents"),
          maxHamming = 3, maxBandDf = Long.MaxValue)
        .orderBy("id_a", "id_b")
    },

    // Multimodal quality gates (round 10) — the LAION-style filter stage
    // next to q135's perceptual hash: decode failure (stub: payload too
    // short for its 2-byte header), decoded dimensions, aspect ratio,
    // and a max-byte-share entropy proxy, each an exact-ppm 0/1 gate
    // packed q109-style. The oracle replays the stub decoder's header
    // arithmetic and the byte histogram (the q135 ascii machinery) —
    // all integer, so the mask is hash-exact.
    Q("q151_multimodal_quality",
      """WITH b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |  CASE WHEN length(text) >= 2 THEN 1 ELSE 0 END AS g1,
        |  CAST(CASE WHEN length(text) >= 2
        |       THEN (ascii(substr(text, 1, 1)) * 7) % 256 ELSE 0 END AS BIGINT) AS width,
        |  CAST(CASE WHEN length(text) >= 2
        |       THEN (ascii(substr(text, 2, 1)) * 13) % 256 ELSE 0 END AS BIGINT) AS height
        | FROM documents),
        | chars AS (SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
        |      i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) AS c
        |    FROM documents),
        | mx AS (SELECT doc_id, max(cnt) AS mc FROM
        |    (SELECT doc_id, c, count(*) AS cnt FROM chars GROUP BY 1, 2)
        |   GROUP BY 1),
        | m AS (SELECT b.doc_id, b.n_bytes, b.width, b.height, b.g1,
        |   CASE WHEN b.height > 0 THEN b.width * 1000000 // b.height
        |        ELSE 0 END AS aspect_ppm,
        |   CASE WHEN b.n_bytes > 0 THEN mx.mc * 1000000 // b.n_bytes
        |        ELSE 1000000 END AS maxbyte_ppm
        |  FROM b LEFT JOIN mx USING (doc_id)),
        | r AS (SELECT *,
        |   CASE WHEN width >= 8 AND height >= 8 THEN 1 ELSE 0 END AS g2,
        |   CASE WHEN aspect_ppm BETWEEN 250000 AND 4000000 THEN 1 ELSE 0 END AS g3,
        |   CASE WHEN maxbyte_ppm <= 500000 THEN 1 ELSE 0 END AS g4
        |  FROM m)
        |SELECT doc_id, n_bytes, width, height,
        | CAST(aspect_ppm AS BIGINT) AS aspect_ppm,
        | CAST(maxbyte_ppm AS BIGINT) AS maxbyte_ppm,
        | CAST(g1 + g2*2 + g3*4 + g4*8 AS BIGINT) AS rule_mask,
        | CAST(CASE WHEN g1 + g2 + g3 + g4 = 4 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM r ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      graft.llm.Multimodal.qualityStats(Tables(s, dir, "documents"))
        .orderBy("doc_id")
    },

    // Token frequency spectrum (count-of-counts) + Good–Turing adjusted
    // counts — the Gale/Sampson table: N_r types seen exactly r times,
    // r* = (r+1)·N_{r+1}/N_r in exact ppm. No global sort — the Zipf
    // view without the Zipf ranking.
    Q("q136_frequency_spectrum",
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        | c AS (SELECT tok, count(*) AS r FROM toks GROUP BY 1),
        | sp AS (SELECT r, count(*) AS n_r FROM c GROUP BY 1)
        |SELECT CAST(sp.r AS BIGINT) AS r, CAST(sp.n_r AS BIGINT) AS n_r,
        | CAST(COALESCE((sp.r + 1) * nx.n_r * 1000000 // sp.n_r, 0) AS BIGINT)
        |   AS gt_star_ppm
        |FROM sp LEFT JOIN sp nx ON nx.r = sp.r + 1
        |ORDER BY r""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Corpus
      Corpus.frequencySpectrum(Tables(s, dir, "documents"))
        .orderBy("r")
    },

    // kNN label probe — the representation-quality eval: per-class
    // accuracy of majority-vote nearest-neighbor label prediction over
    // a bounded probe set. Ranks are cross-engine identical
    // (sequential-fold dots, the q34 contract); votes exact integers.
    Q("q137_knn_label_probe",
      """WITH knn AS (SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |          c.vec_id) AS rnk
        |    FROM embeddings q JOIN embeddings c
        |      ON q.vec_id < 200 AND q.vec_id <> c.vec_id) t
        |   WHERE rnk <= 5),
        | v AS (SELECT k.query_id, e.label, count(*) AS votes
        |       FROM knn k JOIN embeddings e ON e.vec_id = k.neighbor_id
        |       GROUP BY 1, 2),
        | p AS (SELECT query_id, label AS pred_label FROM (
        |        SELECT query_id, label, row_number() OVER (PARTITION BY query_id
        |          ORDER BY votes DESC, label) AS rn FROM v) t2 WHERE rn = 1),
        | j AS (SELECT p.pred_label, e.label AS true_label
        |       FROM p JOIN embeddings e ON e.vec_id = p.query_id)
        |SELECT CAST(true_label AS BIGINT) AS true_label,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) FILTER (WHERE pred_label = true_label) AS BIGINT) AS n_correct,
        | CAST(count(*) FILTER (WHERE pred_label = true_label) * 1000000 // count(*)
        |   AS BIGINT) AS acc_ppm
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Similarity
      val emb = Tables(s, dir, "embeddings")
      Similarity.knnLabelProbe(emb, emb.filter(col("vec_id") < 200), k = 5)
        .orderBy("true_label")
    },

    // Corpus composition report — the release "data card": per
    // (source, lang) doc/token counts and the exact token share of the
    // corpus in ppm (the table data recipes are tuned against).
    Q("q138_composition_report",
      """WITH g AS (SELECT source, lang, count(*) AS n_docs,
        |        sum(len(string_split(text, ' '))) AS n_tokens
        |       FROM documents GROUP BY 1, 2),
        | t AS (SELECT sum(n_tokens) AS t_tokens FROM g)
        |SELECT source, lang, CAST(n_docs AS BIGINT) AS n_docs,
        | CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(n_tokens * 1000000 // t_tokens AS BIGINT) AS share_ppm
        |FROM g, t ORDER BY source, lang""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Corpus
      Corpus.compositionReport(Tables(s, dir, "documents"))
        .orderBy("source", "lang")
    },

    // Per-source quality DASHBOARD — the round-8 eval suite composed
    // into the one table an ops review reads: per source, corpus mass
    // (docs/tokens/share), language-ID accuracy, NB-classifier keep
    // rate, and blocklist keep rate, all exact ppm. The oracle stitches
    // the q138/q133/q128/q123 component oracles source-keyed.
    Q("q139_source_dashboard",
      """WITH m AS (SELECT source, count(*) AS n_docs,
        |        sum(len(string_split(text, ' '))) AS n_tokens
        |       FROM documents GROUP BY 1),
        | t AS (SELECT sum(n_tokens) AS tt FROM m),
        | li AS (SELECT doc_id, lang, source, string_split(text, ' ') AS l
        |        FROM documents),
        | sc AS (SELECT doc_id, lang, source,
        |        len(list_filter(l, x -> x = 'the')) + len(list_filter(l, x -> x = 'and'))
        |         + len(list_filter(l, x -> x = 'of')) AS s_en,
        |        len(list_filter(l, x -> x = 'der')) + len(list_filter(l, x -> x = 'und'))
        |         + len(list_filter(l, x -> x = 'die')) AS s_de,
        |        len(list_filter(l, x -> x = 'le')) + len(list_filter(l, x -> x = 'et'))
        |         + len(list_filter(l, x -> x = 'la')) AS s_fr,
        |        len(list_filter(l, x -> x = 'el')) + len(list_filter(l, x -> x = 'y'))
        |         + len(list_filter(l, x -> x = 'los')) AS s_es
        |       FROM li),
        | lacc AS (SELECT source, count(*) FILTER (WHERE lang =
        |        CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |             WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END) AS n_ok
        |       FROM sc GROUP BY 1),
        | toks AS (SELECT doc_id, source IN ('src0', 'src1', 'src2', 'src3') AS is_good,
        |        unnest(string_split(text, ' ')) AS tok FROM documents),
        | c AS (SELECT tok, count(*) FILTER (WHERE is_good) AS c_g,
        |        count(*) FILTER (WHERE NOT is_good) AS c_b FROM toks GROUP BY 1),
        | tc AS (SELECT sum(c_g) AS tg, sum(c_b) AS tb, count(*) AS v FROM c),
        | w AS (SELECT tok,
        |        CAST(length(bin((c_g + 1) * 1048576 // (c_b + 1))) AS BIGINT) - 21
        |        + (SELECT CAST(length(bin((tb + v) * 1048576 // (tg + v))) AS BIGINT) - 21
        |           FROM tc) AS w_bits FROM c),
        | nb AS (SELECT doc_id, count(*) AS nt, sum(w_bits) AS sb
        |        FROM toks JOIN w USING (tok) GROUP BY 1),
        | nbk AS (SELECT d.source, count(*) FILTER (
        |          WHERE nb.sb * 1000 // nb.nt >= -1225) AS n_kept
        |        FROM nb JOIN documents d USING (doc_id) GROUP BY 1),
        | blterms(term) AS (VALUES ('slow'), ('merge'), ('vector')),
        | bl AS (SELECT doc_id, count(*) AS nh
        |        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |              FROM documents) x JOIN blterms USING (term) GROUP BY 1),
        | blk AS (SELECT d.source, count(*) FILTER (WHERE COALESCE(bl.nh, 0) <= 2)
        |          AS n_clean
        |        FROM documents d LEFT JOIN bl USING (doc_id) GROUP BY 1)
        |SELECT m.source, CAST(m.n_docs AS BIGINT) AS n_docs,
        | CAST(m.n_tokens AS BIGINT) AS n_tokens,
        | CAST(m.n_tokens * 1000000 // t.tt AS BIGINT) AS share_ppm,
        | CAST(lacc.n_ok * 1000000 // m.n_docs AS BIGINT) AS langid_acc_ppm,
        | CAST(nbk.n_kept * 1000000 // m.n_docs AS BIGINT) AS nb_kept_ppm,
        | CAST(blk.n_clean * 1000000 // m.n_docs AS BIGINT) AS bl_kept_ppm
        |FROM m
        |JOIN lacc USING (source) JOIN nbk USING (source) JOIN blk USING (source)
        |CROSS JOIN t
        |ORDER BY source""".stripMargin
    ) { (s, dir) =>
      import graft.llm.{Classifier => Cls, Corpus => Crp}
      val docs = Tables(s, dir, "documents")
      val m = Crp.compositionReport(docs).groupBy("source")
        .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
      val tot = m.agg(sum("n_tokens").as("tt"))
      val lacc = docs.select(col("doc_id"), col("lang"), col("source"))
        .join(TextAnalysis.langId(docs).select("doc_id", "pred_lang"), "doc_id")
        .groupBy("source")
        .agg(count(when(col("lang") === col("pred_lang"), 1)).as("n_ok"))
      val nbk = Cls.nbQualityScores(docs,
          col("source").isin("src0", "src1", "src2", "src3"),
          minScoreMbits = -1225L)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source").agg(count(when(col("kept") === 1L, 1)).as("n_kept"))
      val blk = TextAnalysis.blocklistHits(docs,
          Seq("slow", "merge", "vector"), maxHits = 2L)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source").agg(count(when(col("kept") === 1L, 1)).as("n_clean"))
      m.crossJoin(broadcast(tot))
        .join(lacc, "source").join(nbk, "source").join(blk, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("n_tokens * 1000000 DIV tt").as("share_ppm"),
          expr("n_ok * 1000000 DIV n_docs").as("langid_acc_ppm"),
          expr("n_kept * 1000000 DIV n_docs").as("nb_kept_ppm"),
          expr("n_clean * 1000000 DIV n_docs").as("bl_kept_ppm"))
        .orderBy("source")
    },

    // ROUND-8 CAPSTONE — the curation pipeline end to end: source-level
    // gate (q124) → blocklist (q123, hits ≤ 5) → NB classifier keep
    // (q128, trained on the RAW corpus labels, applied to survivors —
    // the recipe order: the model sees the full distribution, the
    // filter runs downstream) → C4 block dedup over the SURVIVOR set
    // (block df counted after filtering, so a block held up only by
    // removed docs is kept). Every stage the library operator at its
    // scalable shape; the oracle replays the whole composition.
    Q("q129_curation_pipeline",
      """WITH src AS (SELECT source, count(*) AS n_docs,
        |        sum(length(text)) AS chars_total,
        |        count(DISTINCT text) AS n_distinct
        |       FROM documents GROUP BY 1),
        | sv AS (SELECT source FROM src
        |        WHERE chars_total // n_docs >= 290
        |          AND (n_docs - n_distinct) * 1000000 // n_docs <= 100000),
        | blterms(term) AS (VALUES ('slow'), ('merge'), ('vector')),
        | bl AS (SELECT doc_id, count(*) AS n_hits
        |        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |              FROM documents) tt JOIN blterms USING (term) GROUP BY 1),
        | toks AS (SELECT doc_id, source IN ('src0', 'src1', 'src2', 'src3') AS is_good,
        |        unnest(string_split(text, ' ')) AS tok FROM documents),
        | c AS (SELECT tok, count(*) FILTER (WHERE is_good) AS c_g,
        |        count(*) FILTER (WHERE NOT is_good) AS c_b FROM toks GROUP BY 1),
        | t AS (SELECT sum(c_g) AS tg, sum(c_b) AS tb, count(*) AS v FROM c),
        | w AS (SELECT tok,
        |        CAST(length(bin((c_g + 1) * 1048576 // (c_b + 1))) AS BIGINT) - 21
        |        + (SELECT CAST(length(bin((tb + v) * 1048576 // (tg + v))) AS BIGINT) - 21
        |           FROM t) AS w_bits
        |       FROM c),
        | nb AS (SELECT doc_id, count(*) AS n_tokens, sum(w_bits) AS sum_bits
        |        FROM toks JOIN w USING (tok) GROUP BY 1),
        | surv AS (SELECT d.doc_id, d.source, d.text FROM documents d
        |          JOIN sv USING (source)
        |          JOIN nb ON nb.doc_id = d.doc_id
        |          LEFT JOIN bl ON bl.doc_id = d.doc_id
        |          WHERE COALESCE(bl.n_hits, 0) <= 5
        |            AND nb.sum_bits * 1000 // nb.n_tokens >= -1225),
        | wl AS (SELECT doc_id, source, string_split(text, ' ') AS l FROM surv),
        | b AS (SELECT doc_id, s.p AS p, s.blk AS blk
        |       FROM (SELECT doc_id, unnest(list_transform(range(0, len(l) // 8),
        |           i -> {'p': i, 'blk': array_to_string(l[i*8+1 : i*8+8], ' ')})) AS s
        |         FROM wl WHERE len(l) >= 8)),
        | dup AS (SELECT blk FROM (SELECT DISTINCT doc_id, blk FROM b)
        |         GROUP BY blk HAVING count(*) >= 2),
        | st AS (SELECT doc_id, list_sort(list(p)) AS dups
        |        FROM b JOIN dup USING (blk) GROUP BY doc_id),
        | res AS (SELECT wl.doc_id, wl.source, len(wl.l) // 8 AS n_blocks,
        |          COALESCE(len(st.dups), 0) AS n_removed,
        |          list_filter(list_transform(range(1, len(wl.l) + 1),
        |            i -> CASE WHEN list_contains(COALESCE(st.dups, []), (i - 1) // 8)
        |                 THEN NULL ELSE wl.l[i] END), x -> x IS NOT NULL) AS kept
        |         FROM wl LEFT JOIN st USING (doc_id))
        |SELECT doc_id, source, CAST(n_blocks AS BIGINT) AS n_blocks,
        | CAST(n_removed AS BIGINT) AS n_removed,
        | COALESCE(list_aggregate(kept, 'string_agg', ' '), '') AS text_clean
        |FROM res ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Corpus
      val docs = Tables(s, dir, "documents")
      val srcKeep = Corpus.sourceCuration(docs, "source",
          minMeanChars = 290L, maxDupPpm = 100000L)
        .filter(col("src_kept") === 1L).select("doc_id")
      val blKeep = TextAnalysis.blocklistHits(docs,
          Seq("slow", "merge", "vector"), maxHits = 5L)
        .filter(col("kept") === 1L).select("doc_id")
      val nbKeep = Classifier.nbQualityScores(docs,
          col("source").isin("src0", "src1", "src2", "src3"),
          minScoreMbits = -1225L)
        .filter(col("kept") === 1L).select("doc_id")
      val survivors = docs.join(srcKeep, "doc_id").join(blKeep, "doc_id")
        .join(nbKeep, "doc_id")
      Dedup.removeDuplicateBlocks(survivors, blockLen = 8, minDf = 2L)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .select("doc_id", "source", "n_blocks", "n_removed", "text_clean")
        .orderBy("doc_id")
    },

    // TWO-MODALITY joint dedup (round-9): a doc pair is a duplicate if
    // it is near-dup in EITHER modality — image (perceptual-hash
    // pigeonhole banding over the payload seam, q135's operator) OR
    // text (SimHash chunk banding, q71's) — and connected components
    // over the UNION edge list collapses chains that cross modalities
    // (a≈b by image, b≈c by text ⇒ {a,b,c} one cluster), exactly how a
    // production multimodal pipeline (LAION-style) dedups caption+image
    // pairs. Keep-list = min-id representative per cluster. The oracle
    // replays BOTH fingerprint families and folds the union edge list
    // with bounded-round min-label propagation ([[ccLabelPropCtes]] —
    // O(E·rounds), sf1-checkable; the old reachability CTE was
    // O(Σ component²) and infeasible at 10× the correctness gate).
    // The oracle runs ENTIRELY at the distinct-text representative
    // level, which is exact here because (a) both fingerprint families
    // are functions of `text` alone (the image payload seam derives
    // from it), so identical text ⇒ identical phash AND simhash, and
    // (b) this entry bands UNCAPPED (maxBandDf = ∞), so doc-level
    // pairing is exactly "signatures share a chunk value AND hamming
    // ≤ 3" — every same-text pair pairs (hamming 0), and cross-class
    // doc pairs exist iff the class reps' signatures pair. Hence the
    // member-level component structure is the rep-level structure
    // expanded by text classes, the component MIN doc is the rep-level
    // cluster label (reps are class minima), and a doc survives iff it
    // IS its class rep and its rep's label is itself. The member-level
    // replay (both quadratic band joins + CC in one query) OOM'd
    // DuckDB at sf1; this form is rep-cardinality end to end.
    Q("q140_multimodal_joint_dedup",
      """WITH
        | cls AS MATERIALIZED (SELECT doc_id,
        |        min(doc_id) OVER (PARTITION BY text) AS rep_id FROM documents),
        | rep AS MATERIALIZED (SELECT min(doc_id) AS doc_id, text
        |       FROM documents GROUP BY text),
        | chars AS (SELECT doc_id, s.p AS p, s.c AS c
        |      FROM (SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
        |          i -> {'p': i, 'c': ascii(substr(text, CAST(i AS INTEGER), 1))})) AS s
        |        FROM rep)),
        | slots AS (SELECT doc_id, (p - 1) % 64 AS slot, sum(c) AS sc
        |           FROM chars GROUP BY 1, 2),
        | tot AS (SELECT doc_id, sum(sc) AS t FROM slots GROUP BY 1),
        | pbits AS (SELECT s.doc_id, s.slot,
        |        CASE WHEN s.sc * 64 >= tot.t THEN 1 ELSE 0 END AS bit
        |       FROM slots s JOIN tot USING (doc_id)),
        | ph AS MATERIALIZED (SELECT doc_id,
        |        CAST(sum(CASE WHEN slot = 63 AND bit = 1 THEN -9223372036854775808
        |                 WHEN bit = 1 THEN (CAST(1 AS BIGINT) << CAST(slot AS INTEGER))
        |                 ELSE 0 END) AS BIGINT) AS h
        |       FROM pbits GROUP BY 1),
        | ck AS (SELECT doc_id, h, k, (h >> CAST(k * 16 AS INTEGER)) & 65535 AS cv
        |        FROM ph, range(0, 4) t(k)),
        | ppairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |       FROM ck a JOIN ck b ON a.k = b.k AND a.cv = b.cv
        |         AND a.doc_id < b.doc_id
        |       WHERE bit_count(xor(a.h, b.h)) <= 3),
        | toks AS (SELECT r.doc_id, unnest(string_split(r.text, ' ')) AS tok FROM rep r),
        | hx AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(tok) + 1),
        |            i -> CAST(ascii(substr(tok, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |          (a, c) -> (a * 131 + c) % 4294967291) AS h
        |        FROM toks),
        | tbits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS tally
        |          FROM hx CROSS JOIN range(0, 32) t(b) GROUP BY doc_id, b),
        | sims AS MATERIALIZED (SELECT doc_id, CAST(sum(CASE WHEN tally > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS simhash
        |          FROM tbits GROUP BY doc_id),
        | sch AS (SELECT doc_id, simhash, c AS chunk,
        |          (simhash >> CAST(c * 8 AS INTEGER)) & 255 AS chv
        |        FROM sims CROSS JOIN range(0, 4) t(c)),
        | tpairs AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |          FROM sch x JOIN sch y ON x.chunk = y.chunk AND x.chv = y.chv
        |           AND x.doc_id < y.doc_id
        |          WHERE bit_count(xor(x.simhash, y.simhash)) <= 3),
        | up AS MATERIALIZED (SELECT id_a, id_b FROM ppairs
        |           UNION SELECT id_a, id_b FROM tpairs),
        | edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM up
        |           UNION SELECT id_b, id_a FROM up),
        |""".stripMargin + ccLabelPropCtes() + """
        |SELECT d.doc_id FROM documents d
        |JOIN cls c ON c.doc_id = d.doc_id
        |WHERE d.doc_id = c.rep_id
        |  AND c.rep_id NOT IN (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.llm.{Clusters, Multimodal, Stage}
      val docs = Tables(s, dir, "documents")
      // Exact-dup pre-collapse BEFORE pair-gen + CC — the engine-side
      // twin of the oracle's rep-level form, and the composition a
      // production pipeline runs (exact dedup precedes near-dup):
      // both fingerprints are functions of text and banding is
      // uncapped, so the member-level components are the rep-level
      // components expanded by text classes and the min-id keep-list
      // is invariant. Pair-gen + CC cost becomes DISTINCT-TEXT
      // cardinality — on a duplicate-heavy corpus (the x10/x30 sweep
      // replicas) the member-level CC chewed ~10^8 expanded edges for
      // an identical answer (x30: 1068 s -> seconds).
      val reps = Stage(Dedup.exactReps(docs))
      val img = Multimodal.perceptualNearDupPairs(reps, maxHamming = 3,
          maxBandDf = Long.MaxValue)
        .select("id_a", "id_b")
      val txt = Dedup.simHashPairs(reps, maxHamming = 3,
          maxBandDf = Long.MaxValue)
        .select("id_a", "id_b")
      // rep survives iff its component label is itself; non-rep class
      // members always drop (their class rep is a smaller duplicate)
      val droppedReps = Clusters.connectedComponents(img.union(txt))
        .filter(col("doc_id") =!= col("cluster_id"))
        .select("doc_id")
      val keptReps = reps.select("doc_id")
        .join(droppedReps, Seq("doc_id"), "left_anti")
      docs.select("doc_id")
        .join(keptReps, Seq("doc_id"), "left_semi")
        .orderBy("doc_id")
    },

    // Per-benchmark contamination matrix (round 9): the release
    // data-card decontamination table — for each benchmark holdout, how
    // many corpus docs share any 5-gram shingle with it, total and
    // worst per-doc overlap. Two pseudo-benchmarks carved from the
    // corpus by id (the q83 convention), corpus = the rest.
    Q("q143_contamination_matrix",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 3),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
        |               || ' ' || l[i+4]))) AS shingle
        |        FROM w WHERE len(l) >= 5),
        | b0 AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
        | b1 AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 1),
        | corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 >= 2),
        | s0 AS (SELECT c.doc_id, count(DISTINCT c.shingle) AS n_shared
        |        FROM corp c JOIN b0 USING (shingle) GROUP BY 1),
        | s1 AS (SELECT c.doc_id, count(DISTINCT c.shingle) AS n_shared
        |        FROM corp c JOIN b1 USING (shingle) GROUP BY 1),
        | r0 AS (SELECT 'holdout_a' AS benchmark,
        |         CAST(count(*) AS BIGINT) AS n_contaminated,
        |         CAST(COALESCE(sum(n_shared), 0) AS BIGINT) AS total_shared,
        |         CAST(COALESCE(max(n_shared), 0) AS BIGINT) AS max_shared FROM s0),
        | r1 AS (SELECT 'holdout_b', CAST(count(*) AS BIGINT),
        |         CAST(COALESCE(sum(n_shared), 0) AS BIGINT),
        |         CAST(COALESCE(max(n_shared), 0) AS BIGINT) FROM s1)
        |SELECT * FROM r0 UNION ALL SELECT * FROM r1 ORDER BY benchmark""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Corpus
      val docs = Tables(s, dir, "documents")
      Corpus.contaminationMatrix(
          docs.filter(col("doc_id") % 10 >= 2),
          Seq("holdout_a" -> docs.filter(col("doc_id") % 10 === 0),
            "holdout_b" -> docs.filter(col("doc_id") % 10 === 1)),
          k = 5)
        .orderBy("benchmark")
    },

    // Cluster label propagation (round 9): a quality verdict reached on
    // ONE copy of a near-duplicate document must apply to EVERY copy —
    // otherwise the cluster re-enters the corpus through its unflagged
    // members. Near-dup pairs (q31's inverted-index Jaccard) → connected
    // components → per-cluster verdict = AND of member gates (the
    // Gopher length rule stands in as the per-doc gate) → every member
    // inherits it; singletons keep their own verdict. The oracle
    // replays pairs, recursive-CTE CC, and the cluster aggregate.
    Q("q145_cluster_label_propagation",
      """WITH RECURSIVE
        | w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
        |        FROM w WHERE len(l) >= 3),
        | df AS (SELECT shingle FROM (SELECT DISTINCT doc_id, shingle FROM sh)
        |        GROUP BY shingle HAVING count(*) <= 64),
        | shf AS (SELECT s.doc_id, s.shingle FROM sh s JOIN df USING (shingle)),
        | nsh AS (SELECT doc_id, count(DISTINCT shingle) AS n FROM shf GROUP BY 1),
        | inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |            count(DISTINCT a.shingle) AS n_common
        |           FROM shf a JOIN shf b ON a.shingle = b.shingle
        |            AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2),
        | pairs AS (SELECT id_a, id_b FROM inter
        |           JOIN nsh na ON na.doc_id = id_a
        |           JOIN nsh nb ON nb.doc_id = id_b
        |           WHERE n_common * 1000000 >=
        |             (na.n + nb.n - n_common) * 500000),
        | edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |           UNION SELECT id_b, id_a FROM pairs),
        | reach AS (SELECT src AS id, dst AS r FROM edges
        |           UNION
        |           SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
        | cl AS (SELECT id AS doc_id, min(least(id, r)) AS cluster_id
        |        FROM reach GROUP BY id),
        | gate AS (SELECT doc_id, CASE WHEN len(string_split(text, ' ')) >= 30
        |            THEN 1 ELSE 0 END AS own_kept
        |          FROM documents),
        | lab AS (SELECT g.doc_id, COALESCE(cl.cluster_id, g.doc_id) AS cluster_id,
        |          g.own_kept FROM gate g LEFT JOIN cl USING (doc_id)),
        | verdict AS (SELECT cluster_id, min(own_kept) AS cluster_kept
        |             FROM lab GROUP BY 1)
        |SELECT l.doc_id, l.cluster_id, CAST(l.own_kept AS BIGINT) AS own_kept,
        | CAST(v.cluster_kept AS BIGINT) AS cluster_kept
        |FROM lab l JOIN verdict v USING (cluster_id)
        |ORDER BY l.doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.llm.{Clusters, Dedup, TextAnalysis}
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, k = 3, maxShingleDf = 64L)
        .filter(col("jaccard_ppm") >= 500000L)
      val cc = Clusters.connectedComponents(pairs.select("id_a", "id_b"))
      val gate = docs.select(col("doc_id"),
        (size(split(col("text"), " ")) >= 30).cast("long").as("own_kept"))
      val lab = gate.join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
          col("own_kept"))
      val verdict = lab.groupBy("cluster_id")
        .agg(min("own_kept").as("cluster_kept"))
      lab.join(verdict, Seq("cluster_id"))
        .select("doc_id", "cluster_id", "own_kept", "cluster_kept")
        .orderBy("doc_id")
    },

    // Quality-ranked dedup survivor (round 9): q70 keeps the LONGEST
    // copy per near-dup cluster; production recipes keep the
    // BEST-QUALITY copy (dup families often pair a clean original with
    // ad-wrapped or truncated mirrors, and length rewards the wrapper).
    // Same dedup machinery — exact-rep pre-pass, MinHash estimate
    // pairs, CC — with the rank window keyed on the q26 quality score
    // (stop-word density, ties to the lower id). The pre-pass stays
    // result-preserving: exact dups share text, hence score, so the
    // min-id rep wins its family under this key too.
    Q("q146_dedup_keep_quality",
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
        | qsc AS (SELECT doc_id,
        |          (CAST(len(list_filter(string_split(text, ' '), x -> x = 'the'))
        |           + len(list_filter(string_split(text, ' '), x -> x = 'a'))
        |           + len(list_filter(string_split(text, ' '), x -> x = 'of'))
        |           + len(list_filter(string_split(text, ' '), x -> x = 'and'))
        |           + len(list_filter(string_split(text, ' '), x -> x = 'to')) AS BIGINT)
        |           * 1000000) // CAST(len(string_split(text, ' ')) AS BIGINT) AS stop_ppm
        |         FROM documents),
        | ranked AS (SELECT c.id, c.cluster_id,
        |             row_number() OVER (PARTITION BY c.cluster_id
        |               ORDER BY q.stop_ppm DESC, c.id) AS rk
        |            FROM comp c JOIN qsc q ON q.doc_id = c.id)
        |SELECT d.doc_id, q.stop_ppm FROM documents d JOIN qsc q USING (doc_id)
        |WHERE NOT EXISTS (SELECT 1 FROM ranked r
        |                  WHERE r.id = d.doc_id AND r.rk > 1)
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.llm.Clusters
      val docs = Tables(s, dir, "documents")
      val reps = graft.llm.Stage(Dedup.exactReps(docs.select("doc_id", "text")))
      val exactLosers = docs.select("doc_id")
        .join(reps, Seq("doc_id"), "left_anti")
      val edges = Dedup.minHashEstimates(reps, k = 3, numPerms = 32, bands = 8)
        .filter(col("est_jaccard_ppm") >= 500000L)
        .select("id_a", "id_b")
      val cc = Clusters.connectedComponents(edges)
      val quality = TextAnalysis.qualityScore(docs).select("doc_id", "stop_ppm")
      val ranked = cc.join(quality, "doc_id")
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("stop_ppm").desc, col("doc_id"))
      val losers = ranked.withColumn("rk", row_number().over(w))
        .filter(col("rk") > 1).select("doc_id")
      docs.select("doc_id").join(losers.union(exactLosers), Seq("doc_id"), "left_anti")
        .join(quality, Seq("doc_id"))
        .select("doc_id", "stop_ppm")
        .orderBy("doc_id")
    },

    // Maintained top-k neighbor lists (round 9): the continuously-
    // adaptive similarity-search shape — per registered query, exact
    // cosine top-k over everything ingested so far, updated per batch
    // against ONLY the new vectors (top-k under a total order is an
    // exactly mergeable aggregate). Spark folds THREE vec_id-split
    // batches through VectorIngest.maintainTopK; the oracle is the
    // ONE-SHOT brute-force top-k — they must hash-match exactly, the
    // q130/q142 parity-split discipline.
    Q("q147_maintained_topk",
      """SELECT query_id, neighbor_id, rnk FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS BIGINT) AS rnk
        | FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id) t
        |WHERE rnk <= 7 ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val topkDir = java.nio.file.Files.createTempDirectory("graft_topk")
        .toString + "/state"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      try {
        (0 until 3).foreach(p => graft.streaming.VectorIngest.maintainTopK(
          s, topkDir, queries, emb.filter(col("vec_id") % 3 === p), k = 7))
        // collected shape only after the folds; read the final state
        val out = s.read.parquet(topkDir)
          .select("query_id", "neighbor_id", "rnk")
          .orderBy("query_id", "rnk")
        // materialize before the temp dir dies in the finally
        val rows = out.collect()
        s.createDataFrame(
          s.sparkContext.parallelize(rows.toIndexedSeq), out.schema)
          .orderBy("query_id", "rnk")
      } finally rm(new java.io.File(
        new java.io.File(topkDir).getParent))
    },

    // Snapshot distribution drift (round 9): per-source share in exact
    // ppm for two corpus snapshots (carved by id parity) and the
    // absolute drift — the ops monitor for composition regressions
    // between releases; a key in only one snapshot reads 0 in the
    // other (appearing/vanishing sources are drift, not errors).
    Q("q144_distribution_drift",
      """WITH a AS (SELECT source, count(*) AS n FROM documents
        |           WHERE doc_id % 2 = 0 GROUP BY 1),
        | ash AS (SELECT source, n * 1000000 // (SELECT sum(n) FROM a) AS p FROM a),
        | b AS (SELECT source, count(*) AS n FROM documents
        |       WHERE doc_id % 2 = 1 GROUP BY 1),
        | bsh AS (SELECT source, n * 1000000 // (SELECT sum(n) FROM b) AS p FROM b)
        |SELECT COALESCE(ash.source, bsh.source) AS source,
        | CAST(COALESCE(ash.p, 0) AS BIGINT) AS share_a_ppm,
        | CAST(COALESCE(bsh.p, 0) AS BIGINT) AS share_b_ppm,
        | CAST(abs(COALESCE(ash.p, 0) - COALESCE(bsh.p, 0)) AS BIGINT) AS drift_ppm
        |FROM ash FULL JOIN bsh USING (source) ORDER BY source""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Corpus
      val docs = Tables(s, dir, "documents")
      Corpus.distributionDrift(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), "source")
        .orderBy("source")
    },

    // k-center greedy coreset selection (Gonzalez / Sener & Savarese):
    // 5 farthest-point picks over the embedding table, every distance an
    // exact BIGINT over per-dim micros. The oracle statically UNROLLS
    // the greedy rounds (the q111/q148 discipline): seed = min vec_id,
    // then 4 rounds of argmax-of-min-distance with the state shrinking
    // by the picked row each round; ties break on the lower vec_id,
    // far_d2 is the coverage-radius sequence.
    Q("q155_kcenter_coreset",
      s"""WITH vm AS (SELECT vec_id, list_transform(range(1, 65),
        |        di -> CAST(round(CAST(embedding[di] AS DOUBLE) * 1000000.0) AS BIGINT)) AS m
        |      FROM embeddings),
        | c1 AS (SELECT vec_id, m FROM vm ORDER BY vec_id LIMIT 1),
        | d1 AS (SELECT v.vec_id, v.m, ${kcDistSql("v", "c")} AS d2
        |        FROM vm v CROSS JOIN c1 c WHERE v.vec_id <> c.vec_id),
        | c2 AS (SELECT vec_id, m, d2 FROM d1 ORDER BY d2 DESC, vec_id LIMIT 1),
        | d2s AS (SELECT v.vec_id, v.m, least(v.d2, ${kcDistSql("v", "c")}) AS d2
        |         FROM d1 v CROSS JOIN c2 c WHERE v.vec_id <> c.vec_id),
        | c3 AS (SELECT vec_id, m, d2 FROM d2s ORDER BY d2 DESC, vec_id LIMIT 1),
        | d3s AS (SELECT v.vec_id, v.m, least(v.d2, ${kcDistSql("v", "c")}) AS d2
        |         FROM d2s v CROSS JOIN c3 c WHERE v.vec_id <> c.vec_id),
        | c4 AS (SELECT vec_id, m, d2 FROM d3s ORDER BY d2 DESC, vec_id LIMIT 1),
        | d4s AS (SELECT v.vec_id, v.m, least(v.d2, ${kcDistSql("v", "c")}) AS d2
        |         FROM d3s v CROSS JOIN c4 c WHERE v.vec_id <> c.vec_id),
        | c5 AS (SELECT vec_id, m, d2 FROM d4s ORDER BY d2 DESC, vec_id LIMIT 1)
        |SELECT step, CAST(vec_id AS BIGINT) AS vec_id, far_d2 FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, vec_id, CAST(-1 AS BIGINT) AS far_d2 FROM c1
        |  UNION ALL SELECT 2, vec_id, d2 FROM c2
        |  UNION ALL SELECT 3, vec_id, d2 FROM c3
        |  UNION ALL SELECT 4, vec_id, d2 FROM c4
        |  UNION ALL SELECT 5, vec_id, d2 FROM c5)
        |ORDER BY step""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Similarity
      Similarity.kCenterGreedy(Tables(s, dir, "embeddings"), k = 5, dim = 64)
        .orderBy("step")
    },

    // Soft dedup (duplicate-aware loss reweighting): every doc keeps a
    // row, each copy of an n-way near-dup family weighted 10⁶ DIV n —
    // the family's total gradient mass equals one document's. Pairs /
    // CC replay exactly as q145 (inverted-index Jaccard ≥ 0.5,
    // recursive-CTE components), then one cluster-size count.
    Q("q156_soft_dedup_weights",
      """WITH RECURSIVE
        | w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
        |        FROM w WHERE len(l) >= 3),
        | df AS (SELECT shingle FROM (SELECT DISTINCT doc_id, shingle FROM sh)
        |        GROUP BY shingle HAVING count(*) <= 64),
        | shf AS (SELECT s.doc_id, s.shingle FROM sh s JOIN df USING (shingle)),
        | nsh AS (SELECT doc_id, count(DISTINCT shingle) AS n FROM shf GROUP BY 1),
        | inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |            count(DISTINCT a.shingle) AS n_common
        |           FROM shf a JOIN shf b ON a.shingle = b.shingle
        |            AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2),
        | pairs AS (SELECT id_a, id_b FROM inter
        |           JOIN nsh na ON na.doc_id = id_a
        |           JOIN nsh nb ON nb.doc_id = id_b
        |           WHERE n_common * 1000000 >=
        |             (na.n + nb.n - n_common) * 500000),
        | edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |           UNION SELECT id_b, id_a FROM pairs),
        | reach AS (SELECT src AS id, dst AS r FROM edges
        |           UNION
        |           SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
        | cl AS (SELECT id AS doc_id, min(least(id, r)) AS cluster_id
        |        FROM reach GROUP BY id),
        | lab AS (SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
        |         FROM documents d LEFT JOIN cl USING (doc_id)),
        | sz AS (SELECT cluster_id, count(*) AS n_copies FROM lab GROUP BY 1)
        |SELECT l.doc_id, l.cluster_id, CAST(sz.n_copies AS BIGINT) AS n_copies,
        | CAST(1000000 // sz.n_copies AS BIGINT) AS weight_ppm
        |FROM lab l JOIN sz USING (cluster_id)
        |ORDER BY l.doc_id""".stripMargin
    ) { (s, dir) =>
      Dedup.softDedupWeights(Tables(s, dir, "documents"), k = 3,
          thresholdPpm = 500000L, maxShingleDf = 64L)
        .orderBy("doc_id")
    },

    // Maintained contamination state: q143's matrix served off a
    // MERGEABLE per-doc overlap state folded over three doc-disjoint
    // corpus batches — with one batch REPLAYED into the fold (identity
    // dedup makes the redelivery a no-op). Hash-equals the one-shot
    // oracle, which is exactly q143's statement: the maintained path
    // must be indistinguishable from the rescan.
    Q("q157_contamination_fold",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 3),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
        |               || ' ' || l[i+4]))) AS shingle
        |        FROM w WHERE len(l) >= 5),
        | b0 AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
        | b1 AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 1),
        | corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 >= 2),
        | s0 AS (SELECT c.doc_id, count(DISTINCT c.shingle) AS n_shared
        |        FROM corp c JOIN b0 USING (shingle) GROUP BY 1),
        | s1 AS (SELECT c.doc_id, count(DISTINCT c.shingle) AS n_shared
        |        FROM corp c JOIN b1 USING (shingle) GROUP BY 1),
        | r0 AS (SELECT 'holdout_a' AS benchmark,
        |         CAST(count(*) AS BIGINT) AS n_contaminated,
        |         CAST(COALESCE(sum(n_shared), 0) AS BIGINT) AS total_shared,
        |         CAST(COALESCE(max(n_shared), 0) AS BIGINT) AS max_shared FROM s0),
        | r1 AS (SELECT 'holdout_b', CAST(count(*) AS BIGINT),
        |         CAST(COALESCE(sum(n_shared), 0) AS BIGINT),
        |         CAST(COALESCE(max(n_shared), 0) AS BIGINT) FROM s1)
        |SELECT * FROM r0 UNION ALL SELECT * FROM r1 ORDER BY benchmark""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Corpus
      val docs = Tables(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 >= 2)
      val benches = Seq(
        "holdout_a" -> docs.filter(col("doc_id") % 10 === 0),
        "holdout_b" -> docs.filter(col("doc_id") % 10 === 1))
      val parts = (0 until 3).map(i => corpus.filter(col("doc_id") % 3 === i))
      val folded = parts.map(p => Corpus.contaminationState(p, benches, k = 5))
        .reduce(Corpus.mergeContaminationState)
      val withReplay = Corpus.mergeContaminationState(folded,
        Corpus.contaminationState(parts(1), benches, k = 5))
      Corpus.matrixFromState(withReplay, Seq("holdout_a", "holdout_b"))
        .orderBy("benchmark")
    },

    // Maintained per-source tier thresholds (round 10): the q165 tier
    // SERVING path end to end off mergeable state — per-source score
    // histograms fold across two batches (the q96 machinery), the
    // 750/500-permille upper edges become (head_min, mid_min), and
    // tiersFromThresholds labels the corpus with a broadcast CASE.
    // The oracle computes the one-shot histogram + quantile + label —
    // so the Spark-side two-batch FOLD is proven equal to one-shot,
    // the maintained-state claim, by the hash itself.
    Q("q166_maintained_tiers",
      """WITH s AS (SELECT doc_id, source,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS score_ppm
        |       FROM documents),
        | h AS (SELECT source, score_ppm // 4 AS bucket, count(*) AS n
        |       FROM s GROUP BY 1, 2),
        | c AS (SELECT source, bucket,
        |         CAST(sum(n) OVER (PARTITION BY source ORDER BY bucket) AS BIGINT) AS cum,
        |         CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS n_total
        |       FROM h),
        | qq AS (SELECT unnest([750, 500]) AS q),
        | thr0 AS (SELECT source, qq.q AS q, min((bucket + 1) * 4 - 1) AS est
        |          FROM c CROSS JOIN qq WHERE cum * 1000 >= n_total * qq.q
        |          GROUP BY 1, 2),
        | thr AS (SELECT source,
        |          max(CASE WHEN q = 750 THEN est END) AS head_min,
        |          max(CASE WHEN q = 500 THEN est END) AS mid_min
        |         FROM thr0 GROUP BY 1)
        |SELECT s.doc_id, s.source, s.score_ppm,
        | CASE WHEN s.score_ppm >= t.head_min THEN 'head'
        |      WHEN s.score_ppm >= t.mid_min THEN 'middle'
        |      ELSE 'tail' END AS tier
        |FROM s JOIN thr t USING (source) ORDER BY s.doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.operators.IncrementalAgg
      val docs = Tables(s, dir, "documents")
      val scored = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("score_ppm"))
      val keys = Seq("source")
      val folded = IncrementalAgg.mergeHistogram(keys,
        IncrementalAgg.histogramState(
          scored.filter(col("doc_id") % 2 === 0), keys, "score_ppm", 4L),
        IncrementalAgg.histogramState(
          scored.filter(col("doc_id") % 2 =!= 0), keys, "score_ppm", 4L))
      val thr = IncrementalAgg.quantilesFromState(folded, keys, 4L,
          Seq(750, 500))
        .groupBy("source").agg(
          max(when(col("quantile_permille") === 750, col("est_upper")))
            .as("head_min"),
          max(when(col("quantile_permille") === 500, col("est_upper")))
            .as("mid_min"))
      graft.llm.Corpus.tiersFromThresholds(docs, scored, thr)
        .orderBy("doc_id")
    },

    // ROUND-10 CAPSTONE — the CCNet recipe end to end (Wenzek et al.:
    // LM-score the corpus, bucket per source, train on head+middle,
    // mix under a token budget): q94's bigram-LM scores → q165's
    // within-source tiers → tail dropped → q84's per-language
    // token-budget windows over the SURVIVORS (budget cumsum computed
    // after filtering, so a tail doc never eats budget). Every stage
    // the library operator at its exact shape; one oracle statement
    // replays the whole composition.
    Q("q167_ccnet_mix",
      """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | bg AS (SELECT doc_id, s.w1 AS w1, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |            i -> {'w1': l[i], 'gram': l[i] || ' ' || l[i+1]})) AS s
        |          FROM t0 WHERE len(l) >= 2)),
        | cb AS (SELECT gram, count(*) AS cb FROM bg GROUP BY 1),
        | cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
        | terms AS (SELECT b.doc_id, (cb.cb * 1000000) // cu.cu AS term
        |           FROM bg b JOIN cb USING (gram) JOIN cu USING (w1)),
        | scores AS (SELECT doc_id, CAST(sum(term) // count(*) AS BIGINT) AS score_ppm
        |            FROM terms GROUP BY doc_id),
        | r AS (SELECT s.doc_id,
        |        CAST(row_number() OVER (PARTITION BY d.source
        |          ORDER BY s.score_ppm DESC, s.doc_id) AS BIGINT) AS rnk,
        |        CAST(count(*) OVER (PARTITION BY d.source) AS BIGINT) AS n_src
        |       FROM scores s JOIN documents d USING (doc_id)),
        | keep AS (SELECT doc_id FROM r
        |          WHERE (rnk - 1) * 1000000 // n_src < 650000),
        | sv AS (SELECT d.doc_id, d.lang,
        |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |         ((d.doc_id % 1000000007) * 2654435761) % 1000000007 AS rnd
        |        FROM documents d JOIN keep USING (doc_id)),
        | c AS (SELECT doc_id, lang, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY rnd, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |       FROM sv)
        |SELECT doc_id, lang, n_tokens, cum FROM c
        |WHERE cum - n_tokens < 3000 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Corpus
      val docs = Tables(s, dir, "documents")
      val keep = Corpus.perSourceTiers(docs,
          TextAnalysis.bigramLmScore(docs))
        .filter(col("tier") =!= "tail").select("doc_id")
      Corpus.tokenBudgetMix(docs.join(keep, Seq("doc_id"), "left_semi"),
          "lang", 3000L)
        .orderBy("doc_id")
    },

    // T5 span corruption (Raffel et al. §3.1.4): the denoising
    // training-pair constructor — 8-token blocks, a deterministic
    // (doc_id, block) hash masks ~20%, input swaps masked blocks for
    // ordinal <extra_id_k> sentinels, target concatenates exactly the
    // masked spans behind their sentinels. The mask is modular integer
    // arithmetic (never rand()), so the oracle rebuilds every pair
    // string-for-string.
    Q("q168_span_corruption",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | b0 AS (SELECT doc_id, l, (len(l) + 7) // 8 AS n_blocks FROM w),
        | m AS (SELECT doc_id, l, n_blocks,
        |        list_filter(range(0, n_blocks), b ->
        |          ((((doc_id % 1000000007 * 1021 + b*2039 + 17) % 1000000007 + 1000000007) % 1000000007)
        |           * 2654435761 % 1000000007) % 5 = 0) AS mb
        |       FROM b0)
        |SELECT doc_id, CAST(n_blocks AS BIGINT) AS n_blocks,
        | CAST(len(mb) AS BIGINT) AS n_masked,
        | array_to_string(flatten(list_transform(range(0, n_blocks), b ->
        |   CASE WHEN list_position(mb, b) > 0
        |        THEN ['<extra_id_' || CAST(list_position(mb, b) - 1 AS VARCHAR) || '>']
        |        ELSE l[b*8+1 : b*8+8] END)), ' ') AS input_text,
        | coalesce(array_to_string(flatten(list_transform(mb, b ->
        |   list_prepend('<extra_id_' || CAST(list_position(mb, b) - 1 AS VARCHAR) || '>',
        |     l[b*8+1 : b*8+8]))), ' '), '') AS target_text
        |FROM m ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      graft.llm.Corpus.spanCorruptionPairs(Tables(s, dir, "documents"),
          blockLen = 8, rateMod = 5)
        .orderBy("doc_id")
    },

    // BERT MLM masking (Devlin et al. §3.1): q168's sibling for
    // encoder pretraining — ~15% positions select by hash, 80/10/10
    // mask/swap/keep, labels = position:original pairs. Deterministic
    // modular arithmetic throughout; the oracle rebuilds every masked
    // string and label list.
    Q("q170_mlm_mask",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | m AS (SELECT doc_id, l, len(l) AS nt,
        |        list_filter(range(1, len(l) + 1), p ->
        |          (((doc_id % 1000000007 * 1021 + p*2039 + 23) % 1000000007 + 1000000007) % 1000000007 * 2654435761 % 1000000007) % 20 < 3) AS sel
        |       FROM t)
        |SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
        | CAST(len(sel) AS BIGINT) AS n_selected,
        | CAST(len(list_filter(sel, p ->
        |   (((((doc_id % 1000000007 * 1021 + p*2039 + 23) % 1000000007 + 1000000007) % 1000000007 * 2654435761 % 1000000007) // 20) % 10) < 8))
        |   AS BIGINT) AS n_mask,
        | array_to_string(list_transform(range(1, nt + 1), p ->
        |   CASE WHEN NOT list_contains(sel, p) THEN l[p]
        |        WHEN (((((doc_id % 1000000007 * 1021 + p*2039 + 23) % 1000000007 + 1000000007) % 1000000007 * 2654435761 % 1000000007) // 20) % 10) < 8
        |          THEN '[MASK]'
        |        WHEN (((((doc_id % 1000000007 * 1021 + p*2039 + 23) % 1000000007 + 1000000007) % 1000000007 * 2654435761 % 1000000007) // 20) % 10) = 8
        |          THEN l[CAST(((((doc_id % 1000000007 * 1021 + p*2039 + 23) % 1000000007 + 1000000007) % 1000000007 * 2654435761 % 1000000007) // 200) % nt AS INTEGER) + 1]
        |        ELSE l[p] END), ' ') AS masked_text,
        | coalesce(array_to_string(list_transform(sel, p ->
        |   CAST(p AS VARCHAR) || ':' || l[p]), ' '), '') AS labels_text
        |FROM m ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      graft.llm.Corpus.mlmMaskPairs(Tables(s, dir, "documents"))
        .orderBy("doc_id")
    },

    // CLIP-STYLE CROSS-MODAL RETRIEVAL EVAL (round-13 judge task 7) —
    // the representation-quality probe a paired image/caption corpus
    // runs before training: per language, recall@1/@5 and summed
    // reciprocal rank of text→image retrieval, where the "image" side
    // embeds the full payload and the "caption" side its second half
    // (byte-bigram histograms in the mapPartitions decode seam — the
    // stub caption sees part of the content, so the metric measures
    // real discrimination). Probes are the q78 balanced sample (8 per
    // language, broadcast); the true pair's rank is COUNTED (candidates
    // beating it), never a global top-k sort. All sums integer-valued
    // doubles < 2^53, so cosine ranks are bit-identical cross-engine.
    Q("q186_cross_modal_eval",
      """WITH bgx AS (SELECT doc_id, s.p AS p, s.sl AS slot
        |      FROM (SELECT doc_id, unnest(list_transform(range(1, length(text)),
        |          i -> {'p': i, 'sl': (ascii(substr(text, CAST(i AS INTEGER), 1)) * 31
        |                + ascii(substr(text, CAST(i + 1 AS INTEGER), 1))) % 16})) AS s
        |        FROM documents WHERE length(text) >= 2)),
        | imgs AS MATERIALIZED (SELECT doc_id, slot, CAST(count(*) AS BIGINT) AS v
        |       FROM bgx GROUP BY 1, 2),
        | txts AS MATERIALIZED (SELECT b.doc_id, b.slot, CAST(count(*) AS BIGINT) AS v
        |       FROM bgx b JOIN (SELECT doc_id, length(text) AS n FROM documents) d
        |         USING (doc_id)
        |       WHERE b.p > d.n // 2 GROUP BY 1, 2),
        | qn AS MATERIALIZED (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2
        |       FROM txts GROUP BY 1),
        | cn AS MATERIALIZED (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2
        |       FROM imgs GROUP BY 1),
        | h AS (SELECT doc_id, lang,
        |        list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
        |            i -> CAST(ascii(substr(CAST(doc_id AS VARCHAR), CAST(i AS INTEGER), 1)) AS BIGINT))),
        |         (a, c) -> (a * 131 + c) % 4294967291) AS hv
        |       FROM documents),
        | rsel AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rnk
        |       FROM h),
        | probe AS MATERIALIZED (SELECT r.doc_id, r.lang FROM rsel r
        |       JOIN qn ON qn.doc_id = r.doc_id
        |       WHERE r.rnk <= 8 AND qn.n2 > 0),
        | dots AS (SELECT t.doc_id AS query_id, i.doc_id AS cand_id,
        |        CAST(sum(t.v * i.v) AS DOUBLE) AS dp
        |       FROM txts t JOIN probe p ON p.doc_id = t.doc_id
        |        JOIN imgs i ON i.slot = t.slot
        |       GROUP BY 1, 2),
        | sims AS MATERIALIZED (SELECT d.query_id, d.cand_id,
        |        d.dp / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS sim
        |       FROM dots d JOIN qn q ON q.doc_id = d.query_id
        |        JOIN cn c ON c.doc_id = d.cand_id WHERE c.n2 > 0),
        | tru AS (SELECT query_id, sim AS sim_true FROM sims WHERE query_id = cand_id),
        | rnk2 AS (SELECT s.query_id, CAST(1 + count(*) FILTER (WHERE s.sim > t.sim_true
        |        OR (s.sim = t.sim_true AND s.cand_id < s.query_id)) AS BIGINT) AS rank
        |       FROM sims s JOIN tru t USING (query_id) GROUP BY 1)
        |SELECT p.lang, CAST(count(*) AS BIGINT) AS n_queries,
        | CAST(count(*) FILTER (WHERE r.rank = 1) AS BIGINT) AS hits_at1,
        | CAST(count(*) FILTER (WHERE r.rank <= 5) AS BIGINT) AS hits_at5,
        | CAST(sum(1000000 // r.rank) AS BIGINT) AS rr_sum_ppm
        |FROM rnk2 r JOIN probe p ON p.doc_id = r.query_id
        |GROUP BY 1 ORDER BY lang""".stripMargin
    ) { (s, dir) =>
      graft.llm.Multimodal.crossModalEval(Tables(s, dir, "documents"),
          k = 5, dim = 16, perLang = 8)
        .orderBy("lang")
    },

    // MULTIMODAL DATA CARD (round 14) — the q138 composition report
    // over the decode seam: per (decoded format × q151 quality
    // verdict), asset counts, byte mass, exact integer mean decoded
    // dimensions, and corpus share in ppm — the keep/quarantine table
    // an ops review reads before training. The oracle replays the stub
    // decoder's header arithmetic, the byte histogram, all four gates
    // (the q151 machinery) and the grouping — all integer, hash-exact.
    Q("q187_mm_datacard",
      """WITH b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |  CASE WHEN length(text) >= 2 THEN 1 ELSE 0 END AS g1,
        |  CAST(CASE WHEN length(text) >= 2
        |       THEN (ascii(substr(text, 1, 1)) * 7) % 256 ELSE 0 END AS BIGINT) AS width,
        |  CAST(CASE WHEN length(text) >= 2
        |       THEN (ascii(substr(text, 2, 1)) * 13) % 256 ELSE 0 END AS BIGINT) AS height
        | FROM documents),
        | chars AS (SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
        |      i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) AS c
        |    FROM documents),
        | mx AS (SELECT doc_id, max(cnt) AS mc FROM
        |    (SELECT doc_id, c, count(*) AS cnt FROM chars GROUP BY 1, 2)
        |   GROUP BY 1),
        | m AS (SELECT b.doc_id, b.n_bytes, b.width, b.height, b.g1,
        |   CASE WHEN b.height > 0 THEN b.width * 1000000 // b.height
        |        ELSE 0 END AS aspect_ppm,
        |   CASE WHEN b.n_bytes > 0 THEN mx.mc * 1000000 // b.n_bytes
        |        ELSE 1000000 END AS maxbyte_ppm
        |  FROM b LEFT JOIN mx USING (doc_id)),
        | r AS (SELECT *,
        |   CASE WHEN width >= 8 AND height >= 8 THEN 1 ELSE 0 END AS g2,
        |   CASE WHEN aspect_ppm BETWEEN 250000 AND 4000000 THEN 1 ELSE 0 END AS g3,
        |   CASE WHEN maxbyte_ppm <= 500000 THEN 1 ELSE 0 END AS g4
        |  FROM m),
        | f AS (SELECT doc_id, CASE WHEN length(text) < 2 THEN 'none'
        |        WHEN ascii(substr(text, 1, 1)) % 2 = 0 THEN 'png'
        |        ELSE 'jpg' END AS fmt FROM documents),
        | p AS (SELECT r.doc_id, f.fmt, r.n_bytes, r.width, r.height,
        |        CAST(CASE WHEN g1 + g2 + g3 + g4 = 4 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |       FROM r JOIN f USING (doc_id)),
        | g AS (SELECT fmt, pass, count(*) AS n_assets,
        |        sum(n_bytes) AS bytes_total, sum(width) AS ws, sum(height) AS hs
        |       FROM p GROUP BY 1, 2),
        | t AS (SELECT sum(n_assets) AS t_assets FROM g)
        |SELECT fmt, pass, CAST(n_assets AS BIGINT) AS n_assets,
        | CAST(bytes_total AS BIGINT) AS bytes_total,
        | CAST(ws // n_assets AS BIGINT) AS avg_width,
        | CAST(hs // n_assets AS BIGINT) AS avg_height,
        | CAST(n_assets * 1000000 // greatest(t_assets, 1) AS BIGINT) AS share_ppm
        |FROM g, t ORDER BY fmt, pass""".stripMargin
    ) { (s, dir) =>
      graft.llm.Multimodal.dataCard(Tables(s, dir, "documents"))
        .orderBy("fmt", "pass")
    },

    // CAPTION–IMAGE AGREEMENT FILTER (round-14 judge task 3) — the
    // LAION-style curation step after q186's eval: per asset, the
    // cross-modal cosine between the two stub embeddings (full payload
    // = image, second half = caption; ONE fused decode-seam scan), and
    // a keep/drop verdict against a PER-LANGUAGE threshold calibrated
    // off maintained histogram state (the q166 discipline: two
    // doc-disjoint batches fold mergeably — the oracle's one-shot
    // histogram proves fold == one-shot by the hash). The gate itself
    // is a broadcast join + narrow CASE: no sort anywhere near the
    // corpus. All counts are integer-valued doubles, so dot/norm/floor
    // are bit-identical cross-engine.
    Q("q189_caption_agreement",
      """WITH bgx AS (SELECT doc_id, s.p AS p, s.sl AS slot
        |      FROM (SELECT doc_id, unnest(list_transform(range(1, length(text)),
        |          i -> {'p': i, 'sl': (ascii(substr(text, CAST(i AS INTEGER), 1)) * 31
        |                + ascii(substr(text, CAST(i + 1 AS INTEGER), 1))) % 16})) AS s
        |        FROM documents WHERE length(text) >= 2)),
        | imgs AS MATERIALIZED (SELECT doc_id, slot, CAST(count(*) AS BIGINT) AS v
        |       FROM bgx GROUP BY 1, 2),
        | txts AS MATERIALIZED (SELECT b.doc_id, b.slot, CAST(count(*) AS BIGINT) AS v
        |       FROM bgx b JOIN (SELECT doc_id, length(text) AS n FROM documents) d
        |         USING (doc_id)
        |       WHERE b.p > d.n // 2 GROUP BY 1, 2),
        | fn AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2 FROM imgs GROUP BY 1),
        | hn AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2 FROM txts GROUP BY 1),
        | dp AS (SELECT i.doc_id, CAST(sum(i.v * t.v) AS DOUBLE) AS dp
        |        FROM imgs i JOIN txts t ON i.doc_id = t.doc_id AND i.slot = t.slot
        |        GROUP BY 1),
        | sc AS (SELECT d.doc_id, d.lang,
        |         CASE WHEN f.n2 IS NULL OR h.n2 IS NULL OR f.n2 = 0 OR h.n2 = 0
        |                OR p.dp IS NULL THEN 0
        |              ELSE CAST(floor(p.dp / (sqrt(CAST(f.n2 AS DOUBLE))
        |                * sqrt(CAST(h.n2 AS DOUBLE))) * 1000000) AS BIGINT)
        |         END AS agree_ppm
        |        FROM documents d LEFT JOIN fn f USING (doc_id)
        |         LEFT JOIN hn h USING (doc_id) LEFT JOIN dp p USING (doc_id)),
        | h2 AS (SELECT lang, agree_ppm // 50000 AS bucket, count(*) AS n
        |        FROM sc GROUP BY 1, 2),
        | c2 AS (SELECT lang, bucket,
        |         CAST(sum(n) OVER (PARTITION BY lang ORDER BY bucket) AS BIGINT) AS cum,
        |         CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_total
        |        FROM h2),
        | thr AS (SELECT lang, CAST(min((bucket + 1) * 50000 - 1) AS BIGINT) AS thr_ppm
        |         FROM c2 WHERE cum * 1000 >= n_total * 250 GROUP BY 1)
        |SELECT s.doc_id, s.lang, s.agree_ppm, t.thr_ppm,
        | CAST(CASE WHEN s.agree_ppm >= t.thr_ppm THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM sc s JOIN thr t USING (lang) ORDER BY s.doc_id""".stripMargin
    ) { (s, dir) =>
      graft.llm.Multimodal.captionAgreementFilter(
          Tables(s, dir, "documents"), dim = 16,
          dropPermille = 250, bucketPpm = 50000L)
        .orderBy("doc_id")
    },

    // ANN-FED CROSS-MODAL EVAL (round-14 judge task 6) — q186's eval
    // served off the LSH index instead of a full corpus scan: probes'
    // caption histograms hash into the single-table 4-plane composite
    // index (hamming ≤ 1 probing), the true pair ranks WITHIN the
    // retrieved candidates, and a probe whose true pair the index
    // missed reports through n_retrieved (index recall on true pairs)
    // without contributing hits/rr. The oracle replays the plane
    // weights (the q36 ±1 construction at dim 16), both sides'
    // buckets, the hamming-1 candidate set, and the counted rank —
    // dot products are integer-valued doubles, bit-identical.
    Q("q190_cross_modal_ann",
      """WITH bgx AS (SELECT doc_id, s.p AS p, s.sl AS slot
        |      FROM (SELECT doc_id, unnest(list_transform(range(1, length(text)),
        |          i -> {'p': i, 'sl': (ascii(substr(text, CAST(i AS INTEGER), 1)) * 31
        |                + ascii(substr(text, CAST(i + 1 AS INTEGER), 1))) % 16})) AS s
        |        FROM documents WHERE length(text) >= 2)),
        | imgs AS MATERIALIZED (SELECT doc_id, slot, CAST(count(*) AS BIGINT) AS v
        |       FROM bgx GROUP BY 1, 2),
        | txts AS MATERIALIZED (SELECT b.doc_id, b.slot, CAST(count(*) AS BIGINT) AS v
        |       FROM bgx b JOIN (SELECT doc_id, length(text) AS n FROM documents) d
        |         USING (doc_id)
        |       WHERE b.p > d.n // 2 GROUP BY 1, 2),
        | qn AS MATERIALIZED (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2
        |       FROM txts GROUP BY 1),
        | cn AS MATERIALIZED (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2
        |       FROM imgs GROUP BY 1),
        | h AS (SELECT doc_id, lang,
        |        list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
        |            i -> CAST(ascii(substr(CAST(doc_id AS VARCHAR), CAST(i AS INTEGER), 1)) AS BIGINT))),
        |         (a, c) -> (a * 131 + c) % 4294967291) AS hv
        |       FROM documents),
        | rsel AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rnk
        |       FROM h),
        | probe AS MATERIALIZED (SELECT r.doc_id, r.lang FROM rsel r
        |       JOIN qn ON qn.doc_id = r.doc_id
        |       WHERE r.rnk <= 8 AND qn.n2 > 0),
        | planes AS (SELECT p, list_transform(range(0, 16),
        |    d -> CASE WHEN ((CAST(p*1021 + d*2039 + 1 AS BIGINT) * 2654435761) >> 13) & 1 = 1
        |         THEN 1.0 ELSE -1.0 END) AS w
        |  FROM range(0, 4) t(p)),
        | imgd AS (SELECT i.doc_id, p.p,
        |         sum(CAST(i.v AS DOUBLE) * p.w[i.slot + 1]) AS dp
        |        FROM imgs i JOIN cn ON cn.doc_id = i.doc_id AND cn.n2 > 0
        |         CROSS JOIN planes p GROUP BY 1, 2),
        | imgb AS MATERIALIZED (SELECT doc_id,
        |         CAST(sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |        FROM imgd GROUP BY 1),
        | txtd AS (SELECT t.doc_id, p.p,
        |         sum(CAST(t.v AS DOUBLE) * p.w[t.slot + 1]) AS dp
        |        FROM txts t JOIN probe pr ON pr.doc_id = t.doc_id
        |         CROSS JOIN planes p GROUP BY 1, 2),
        | txtb AS MATERIALIZED (SELECT doc_id,
        |         CAST(sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |        FROM txtd GROUP BY 1),
        | cand AS MATERIALIZED (SELECT t.doc_id AS query_id, i.doc_id AS cand_id
        |        FROM txtb t JOIN imgb i
        |         ON bit_count(xor(t.bucket, i.bucket)) <= 1),
        | dots AS (SELECT c.query_id, c.cand_id,
        |         CAST(sum(t.v * i.v) AS DOUBLE) AS dp
        |        FROM cand c JOIN txts t ON t.doc_id = c.query_id
        |         JOIN imgs i ON i.doc_id = c.cand_id AND i.slot = t.slot
        |        GROUP BY 1, 2),
        | sims AS MATERIALIZED (SELECT d.query_id, d.cand_id,
        |        d.dp / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS sim
        |       FROM dots d JOIN qn q ON q.doc_id = d.query_id
        |        JOIN cn c ON c.doc_id = d.cand_id),
        | tru AS (SELECT query_id, sim AS sim_true FROM sims WHERE query_id = cand_id),
        | rnk2 AS (SELECT s.query_id, CAST(1 + count(*) FILTER (WHERE s.sim > t.sim_true
        |        OR (s.sim = t.sim_true AND s.cand_id < s.query_id)) AS BIGINT) AS rank
        |       FROM sims s JOIN tru t USING (query_id) GROUP BY 1)
        |SELECT p.lang, CAST(count(*) AS BIGINT) AS n_queries,
        | CAST(count(r.rank) AS BIGINT) AS n_retrieved,
        | CAST(count(*) FILTER (WHERE r.rank = 1) AS BIGINT) AS hits_at1,
        | CAST(count(*) FILTER (WHERE r.rank <= 5) AS BIGINT) AS hits_at5,
        | CAST(coalesce(sum(1000000 // r.rank), 0) AS BIGINT) AS rr_sum_ppm
        |FROM probe p LEFT JOIN rnk2 r ON r.query_id = p.doc_id
        |GROUP BY 1 ORDER BY lang""".stripMargin
    ) { (s, dir) =>
      graft.llm.Multimodal.crossModalEvalAnn(Tables(s, dir, "documents"),
          k = 5, dim = 16, perLang = 8, planes = 4, tables = 1,
          probeHamming = 1)
        .orderBy("lang")
    }
  )
}
