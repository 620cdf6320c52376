package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{Clusters, Corpus, Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM training-data pipeline operators (builder mandate, beyond the
  * reference's own surface): dedup, similarity search, text analysis,
  * multimodal plumbing. Each query drives the implementation in
  * [[graft.llm]]. Approximate/sketch operators (MinHash, SimHash, LSH-ANN)
  * have no SQL oracle — the driver records a rows-only check; their
  * correctness is covered by ScalaTest specs on synthetic corpora.
  */
object LlmQueries {

  /** The exact dot product the engine's codegen'd expression computes —
    * an ascending-index sequential fold in double over float inputs — as
    * DuckDB SQL, so cosine comparisons in oracles are bit-identical
    * (list_dot_product's summation order is unspecified; a fold is not). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  val all: Seq[Q] = Seq(

    Q("q25_token_stats",
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | CAST(length(text) AS BIGINT) AS n_chars,
        | (CAST(length(text) AS BIGINT) * 1000000) // CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_tok_len_ppm
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.tokenStats(Tables(s, dir, "documents")).orderBy("doc_id")
    },

    Q("q26_quality_score",
      """WITH q AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x = 'the'))
        |   + len(list_filter(string_split(text, ' '), x -> x = 'a'))
        |   + len(list_filter(string_split(text, ' '), x -> x = 'of'))
        |   + len(list_filter(string_split(text, ' '), x -> x = 'and'))
        |   + len(list_filter(string_split(text, ' '), x -> x = 'to')) AS BIGINT) AS stop_cnt
        | FROM documents)
        |SELECT doc_id, n_tokens, stop_cnt, (stop_cnt * 1000000) // n_tokens AS stop_ppm,
        | CAST(n_tokens < 20 AS INTEGER) AS is_short
        |FROM q ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.qualityScore(Tables(s, dir, "documents")).orderBy("doc_id")
    },

    Q("q27_langid",
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text,' '), x -> x='the')) + len(list_filter(string_split(text,' '), x -> x='and')) + len(list_filter(string_split(text,' '), x -> x='of')) AS BIGINT) AS score_en,
        | CAST(len(list_filter(string_split(text,' '), x -> x='der')) + len(list_filter(string_split(text,' '), x -> x='und')) + len(list_filter(string_split(text,' '), x -> x='die')) AS BIGINT) AS score_de,
        | CAST(len(list_filter(string_split(text,' '), x -> x='le')) + len(list_filter(string_split(text,' '), x -> x='et')) + len(list_filter(string_split(text,' '), x -> x='la')) AS BIGINT) AS score_fr,
        | CAST(len(list_filter(string_split(text,' '), x -> x='el')) + len(list_filter(string_split(text,' '), x -> x='y')) + len(list_filter(string_split(text,' '), x -> x='los')) AS BIGINT) AS score_es,
        | CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
        |      WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
        |      WHEN score_fr >= score_es THEN 'fr' ELSE 'es' END AS pred_lang
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.langId(Tables(s, dir, "documents")).orderBy("doc_id")
    },

    Q("q28_fingerprint",
      """SELECT doc_id,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(string_split(text, ' '), w -> CAST(ascii(w) AS BIGINT) * 1000 + length(w))),
        |  (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.fingerprint(Tables(s, dir, "documents")).orderBy("doc_id")
    },

    // Repetition metrics (Gopher-style distinct-token-ratio rules).
    Q("q75_repetition",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | m AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
        |        CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct,
        |        CAST(list_max(list_transform(list_distinct(l),
        |          t -> len(list_filter(l, x -> x = t)))) AS BIGINT) AS top_tok_cnt
        |       FROM w)
        |SELECT doc_id, n_tokens, n_distinct, top_tok_cnt,
        | (n_distinct * 1000000) // n_tokens AS distinct_ppm,
        | (top_tok_cnt * 1000000) // n_tokens AS top_tok_ppm,
        | CAST((top_tok_cnt * 1000000) // n_tokens >= 300000 AS INTEGER) AS is_repetitive
        |FROM m ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.repetitionStats(Tables(s, dir, "documents")).orderBy("doc_id")
    },

    // PII detection / redaction. Patterns live in the Java∩RE2 regex
    // subset so both engines match identically; the oracle needs the 'g'
    // flag (DuckDB replaces first-match-only by default, Spark replaces
    // all).
    Q("q76_pii_scrub",
      s"""SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text, '${TextAnalysis.DigitRunRe}')) AS BIGINT) AS n_digit_runs,
        | regexp_replace(regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
        |   '${TextAnalysis.DigitRunRe}', '<NUM>', 'g') AS scrubbed,
        | CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}'))
        |   + len(regexp_extract_all(text, '${TextAnalysis.DigitRunRe}')) > 0 AS INTEGER) AS has_pii
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.piiScrub(Tables(s, dir, "documents")).orderBy("doc_id")
    },

    Q("q29_dedup_key",
      """SELECT array_to_string(string_split(text, ' ')[1:3], ' ') AS norm_key,
        | min(doc_id) AS rep_id, count(*) AS n_dups
        |FROM documents GROUP BY norm_key ORDER BY norm_key""".stripMargin
    ) { (s, dir) =>
      Dedup.byKey(Tables(s, dir, "documents"), 3)
        .select("norm_key", "rep_id", "n_dups")
        .orderBy("norm_key")
    },

    Q("q30_exact_dedup",
      """SELECT min(doc_id) AS rep_id, count(*) AS n_dups
        |FROM documents GROUP BY text ORDER BY rep_id""".stripMargin
    ) { (s, dir) =>
      Dedup.exact(Tables(s, dir, "documents")).orderBy("rep_id")
    },

    // The df > 64 stop-shingle cut (HAVING stage) is a no-op at the test
    // SFs (max observed df: 7 at sf0.01, 25 at sf0.1) but keeps the
    // Σdf² candidate set bounded at corpus scale — the oracle applies
    // the identical cut, so the hash-match holds at ANY cap value.
    Q("q31_jaccard_pairs",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
        |        FROM w WHERE len(l) >= 3),
        | stop AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 64),
        | sh AS (SELECT doc_id, shingle FROM sh0
        |        WHERE shingle NOT IN (SELECT shingle FROM stop)),
        | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        | pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
        | (CAST(common AS BIGINT) * 1000000) // (sa.n_sh + sb.n_sh - common) AS jaccard_ppm
        |FROM pairs JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |ORDER BY jaccard_ppm DESC, id_a, id_b LIMIT 20""".stripMargin
    ) { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables(s, dir, "documents"), 3, maxShingleDf = 64L)
        .orderBy(col("jaccard_ppm").desc, col("id_a"), col("id_b"))
        .limit(20)
    },

    // Containment over the same inverted index: common DIV min(|A|,|B|)
    // catches short-doc-embedded-in-long-doc (quotes, templates) that
    // symmetric Jaccard under-scores.
    Q("q80_containment_pairs",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
        |        FROM w WHERE len(l) >= 3),
        | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        | pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
        | (CAST(common AS BIGINT) * 1000000) // least(sa.n_sh, sb.n_sh) AS contain_ppm
        |FROM pairs JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE (CAST(common AS BIGINT) * 1000000) // least(sa.n_sh, sb.n_sh) >= 800000
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      Dedup.containmentPairs(Tables(s, dir, "documents"), 3,
          minContainPpm = 800000L, maxShingleDf = Long.MaxValue)
        .orderBy("id_a", "id_b")
    },

    // MinHash signatures + LSH banding, fully oracle-checked: the shingle
    // hash is poly_hash (Rabin-Karp mod 4294967291), the permutations are
    // (a_j·x+b_j) mod 4294967311, the band hash a polynomial fold — every
    // step exact BIGINT arithmetic DuckDB reproduces bit-for-bit.
    Q("q32_minhash_bands",
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
        |        FROM mh GROUP BY doc_id, band)
        |SELECT doc_id, band, band_hash FROM bh ORDER BY doc_id, band""".stripMargin
    ) { (s, dir) =>
      Dedup.minHashBands(Tables(s, dir, "documents"), k = 3, numPerms = 32, bands = 8)
        .orderBy("doc_id", "band")
    },

    // 32-bit SimHash over poly_hash(token) — exact ±1 bit tallies, so the
    // oracle recomputes the full fingerprint.
    Q("q33_simhash",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        | hx AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(tok) + 1),
        |            i -> CAST(ascii(substr(tok, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |          (a, c) -> (a * 131 + c) % 4294967291) AS h
        |        FROM toks),
        | bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS tally
        |          FROM hx CROSS JOIN range(0, 32) t(b) GROUP BY doc_id, b)
        |SELECT doc_id, CAST(sum(CASE WHEN tally > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Dedup.simHash(Tables(s, dir, "documents")).orderBy("doc_id")
    },

    // SimHash near-dup pairs via 8-bit chunk banding + popcount verify —
    // the oracle recomputes the full 32-bit fingerprints (as q33), replays
    // the banding equi-join, and verifies hamming ≤ 3 with bit_count.
    // Banding is exact for hamming ≤ 3 (pigeonhole over 4 chunks), so
    // this equals the all-pairs popcount filter.
    Q("q71_simhash_pairs",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        | hx AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(tok) + 1),
        |            i -> CAST(ascii(substr(tok, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |          (a, c) -> (a * 131 + c) % 4294967291) AS h
        |        FROM toks),
        | bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS tally
        |          FROM hx CROSS JOIN range(0, 32) t(b) GROUP BY doc_id, b),
        | sims AS (SELECT doc_id, CAST(sum(CASE WHEN tally > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS simhash
        |          FROM bits GROUP BY doc_id),
        | ch AS (SELECT doc_id, simhash, c AS chunk,
        |          (simhash >> CAST(c * 8 AS INTEGER)) & 255 AS chv
        |        FROM sims CROSS JOIN range(0, 4) t(c)),
        | cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
        |            x.simhash AS sa, y.simhash AS sb
        |          FROM ch x JOIN ch y ON x.chunk = y.chunk AND x.chv = y.chv
        |           AND x.doc_id < y.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      Dedup.simHashPairs(Tables(s, dir, "documents"), maxHamming = 3,
          maxBandDf = Long.MaxValue)
        .orderBy("id_a", "id_b")
    },

    Q("q34_cosine_knn",
      """SELECT query_id, neighbor_id, rnk FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS BIGINT) AS rnk
        | FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id) t
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 10), k = 5)
        .orderBy("query_id", "rnk")
    },

    Q("q35_embed_neardup",
      """SELECT id_a, id_b FROM (
        | SELECT a.vec_id AS id_a, b.vec_id AS id_b
        | FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < b.vec_id AND a.vec_id < 1000 AND b.vec_id < 1000
        | ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, a.vec_id, b.vec_id
        | LIMIT 10) t ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      Similarity.nearDupPairs(Tables(s, dir, "embeddings").filter(col("vec_id") < 1000), topN = 10)
        .orderBy("id_a", "id_b")
    },

    // LSH ANN, fully oracle-checked: the hyperplanes are the deterministic
    // ±1 planeWeight construction, and every dot product in the oracle is
    // the same ascending-index double fold the codegen'd expression runs —
    // bucket bits and cosine ranks are bit-identical across engines.
    // MULTI-PROBE at hamming 1: Spark explodes the query's probe buckets
    // (equi-join stays); the oracle states the same candidate set as
    // bit_count(xor(buckets)) <= 1.
    Q("q36_ann_lsh",
      s"""WITH planes AS (SELECT p, list_transform(range(0, 64),
        |    d -> CASE WHEN ((CAST(p*1021 + d*2039 + 1 AS BIGINT) * 2654435761) >> 13) & 1 = 1
        |         THEN 1.0 ELSE -1.0 END) AS w
        |  FROM range(0, 6) t(p)),
        | b AS (SELECT e.vec_id, e.embedding,
        |        sqrt(${dotSql("e.embedding", "e.embedding")}) AS nrm,
        |        CAST(sum(CASE WHEN ${dotSql("e.embedding", "p.w")} > 0
        |                      THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |       FROM embeddings e CROSS JOIN planes p GROUP BY ALL),
        | pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |            ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS sim
        |           FROM b q JOIN b c ON bit_count(xor(q.bucket, c.bucket)) <= 1
        |            AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
        | r AS (SELECT query_id, neighbor_id, CAST(row_number() OVER (
        |         PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
        |       FROM pairs)
        |SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 3
        |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshKnn(emb, emb.filter(col("vec_id") < 10), k = 3, planes = 6, dim = 64,
          probeHamming = 1)
        .orderBy("query_id", "rnk")
    },

    // COMPOSED multi-table × multi-probe ANN, fully oracle-checked:
    // 2 independent tables (table t uses plane indices 6t..6t+5 of the
    // same deterministic construction), each probed at hamming ≤ 1 —
    // candidate iff SOME table's buckets are within hamming 1. The
    // oracle replays the plane weights, per-table buckets, and the
    // exact-cosine rank.
    Q("q88_ann_multitable",
      s"""WITH planes AS (SELECT t, p, list_transform(range(0, 64),
        |    d -> CASE WHEN ((CAST((t*6 + p)*1021 + d*2039 + 1 AS BIGINT) * 2654435761) >> 13) & 1 = 1
        |         THEN 1.0 ELSE -1.0 END) AS w
        |  FROM range(0, 2) tt(t) CROSS JOIN range(0, 6) pp(p)),
        | b AS (SELECT e.vec_id, p.t,
        |        CAST(sum(CASE WHEN ${dotSql("e.embedding", "p.w")} > 0
        |                      THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |       FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id, p.t),
        | cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |          FROM b q JOIN b c ON q.t = c.t
        |           AND bit_count(xor(q.bucket, c.bucket)) <= 1
        |          WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        | n AS (SELECT vec_id, embedding,
        |        sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
        | pairs AS (SELECT cd.query_id, cd.neighbor_id,
        |            ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS sim
        |           FROM cand cd JOIN n q ON q.vec_id = cd.query_id
        |            JOIN n c ON c.vec_id = cd.neighbor_id),
        | r AS (SELECT query_id, neighbor_id, CAST(row_number() OVER (
        |         PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
        |       FROM pairs)
        |SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 3
        |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshKnnComposite(emb, emb.filter(col("vec_id") < 10), k = 3,
          planes = 6, dim = 64, tables = 2, probeHamming = 1)
        .orderBy("query_id", "rnk")
    },

    // IVF ANN, fully oracle-checked: Voronoi assignment to the 16
    // deterministic centroids and the probe ranking replay the exact
    // double arithmetic of the Spark plan.
    Q("q42_ann_ivf",
      s"""WITH v AS (SELECT vec_id, embedding,
        |        sqrt(${dotSql("embedding", "embedding")}) AS nrm
        |       FROM embeddings),
        | cents AS (SELECT vec_id AS list_id, embedding AS cent, nrm AS cn
        |           FROM v WHERE vec_id < 16),
        | asg0 AS (SELECT v.vec_id, v.embedding, v.nrm, c.list_id,
        |           ${dotSql("v.embedding", "c.cent")} / (v.nrm * c.cn) AS c_sim
        |          FROM v CROSS JOIN cents c),
        | asg AS (SELECT vec_id, embedding, nrm, list_id,
        |          row_number() OVER (PARTITION BY vec_id
        |            ORDER BY c_sim DESC, list_id) AS c_rnk
        |         FROM asg0),
        | corpus AS (SELECT vec_id AS neighbor_id, embedding, nrm, list_id
        |            FROM asg WHERE c_rnk = 1),
        | qs AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS qn, list_id
        |        FROM asg WHERE vec_id < 10 AND c_rnk <= 4),
        | pairs AS (SELECT q.query_id, c.neighbor_id,
        |            ${dotSql("q.q_emb", "c.embedding")} / (q.qn * c.nrm) AS sim
        |           FROM qs q JOIN corpus c USING (list_id)
        |           WHERE q.query_id <> c.neighbor_id),
        | r AS (SELECT query_id, neighbor_id, CAST(row_number() OVER (
        |         PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
        |       FROM pairs)
        |SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 3
        |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfKnn(emb, emb.filter(col("vec_id") < 10), k = 3,
        nLists = 16, nProbe = 4)
        .orderBy("query_id", "rnk")
    },

    // Bucketed embedding near-dup pairs — q35's scale path as a first-
    // class oracle entry: candidates = bucket hamming ≤ 1 (stated
    // directly as bit_count(xor(...)) in the oracle; Spark explodes the
    // probe buckets to keep an equi-join), verify = exact cosine ≥ 0.4
    // over the same double fold both engines run.
    Q("q74_bucketed_neardup",
      s"""WITH planes AS (SELECT p, list_transform(range(0, 64),
        |    d -> CASE WHEN ((CAST(p*1021 + d*2039 + 1 AS BIGINT) * 2654435761) >> 13) & 1 = 1
        |         THEN 1.0 ELSE -1.0 END) AS w
        |  FROM range(0, 6) t(p)),
        | b AS (SELECT e.vec_id, e.embedding,
        |        sqrt(${dotSql("e.embedding", "e.embedding")}) AS nrm,
        |        CAST(sum(CASE WHEN ${dotSql("e.embedding", "p.w")} > 0
        |                      THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |       FROM embeddings e CROSS JOIN planes p GROUP BY ALL)
        |SELECT a.vec_id AS id_a, c.vec_id AS id_b
        |FROM b a JOIN b c ON bit_count(xor(a.bucket, c.bucket)) <= 1
        | AND a.vec_id < c.vec_id
        |WHERE ${dotSql("a.embedding", "c.embedding")} / (a.nrm * c.nrm) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      Similarity.bucketedNearDupPairs(Tables(s, dir, "embeddings"),
          planes = 6, dim = 64, minSim = 0.4, probeHamming = 1)
        .orderBy("id_a", "id_b")
    },

    // Bigram-LM quality score (CCNet's perplexity-filter shape,
    // integerized): MLE transition probabilities in ppm via integer
    // DIV, doc score = integer mean over bigram occurrences. The
    // oracle retrains the same counts and replays the arithmetic.
    Q("q94_bigram_lm_score",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | bg AS (SELECT doc_id, s.w1 AS w1, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |            i -> {'w1': l[i], 'gram': l[i] || ' ' || l[i+1]})) AS s
        |          FROM t WHERE len(l) >= 2)),
        | cb AS (SELECT gram, count(*) AS cb FROM bg GROUP BY 1),
        | cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
        | terms AS (SELECT b.doc_id, (cb.cb * 1000000) // cu.cu AS term
        |           FROM bg b JOIN cb USING (gram) JOIN cu USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        | CAST(sum(term) // count(*) AS BIGINT) AS score_ppm
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.bigramLmScore(Tables(s, dir, "documents"))
        .orderBy("doc_id")
    },

    // Quality-stratified sampling: q94's LM scores bucketed at
    // histogram-derived quintile cut points (the scale-safe q96
    // machinery — no global rank window), then a fold-ordered
    // per-stratum pick. The anti-mode-collapse mixing rule.
    Q("q105_quality_strata",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | bg AS (SELECT doc_id, s.w1 AS w1, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |            i -> {'w1': l[i], 'gram': l[i] || ' ' || l[i+1]})) AS s
        |          FROM t WHERE len(l) >= 2)),
        | cb AS (SELECT gram, count(*) AS cb FROM bg GROUP BY 1),
        | cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
        | terms AS (SELECT b.doc_id, (cb.cb * 1000000) // cu.cu AS term
        |           FROM bg b JOIN cb USING (gram) JOIN cu USING (w1)),
        | scores AS (SELECT doc_id, CAST(sum(term) // count(*) AS BIGINT) AS score_ppm
        |            FROM terms GROUP BY doc_id),
        | h AS (SELECT score_ppm // 10000 AS bucket, count(*) AS n FROM scores GROUP BY 1),
        | c AS (SELECT bucket, CAST(sum(n) OVER (ORDER BY bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |       FROM h),
        | tot AS (SELECT count(*) AS nt FROM scores),
        | thr AS (SELECT q.q, (SELECT min((bucket + 1) * 10000 - 1) FROM c, tot
        |                      WHERE cum * 1000 >= nt * q.q) AS u
        |         FROM (SELECT unnest([200, 400, 600, 800]) AS q) q),
        | st AS (SELECT s.doc_id, s.score_ppm,
        |         (SELECT count(*) FROM thr WHERE s.score_ppm > thr.u) AS stratum,
        |         ((s.doc_id % 1000000007) * 2654435761) % 1000000007 AS rnd
        |        FROM scores s),
        | r AS (SELECT doc_id, score_ppm, CAST(stratum AS BIGINT) AS stratum,
        |        CAST(row_number() OVER (PARTITION BY stratum ORDER BY rnd, doc_id) AS BIGINT) AS rnk
        |       FROM st)
        |SELECT doc_id, score_ppm, stratum, rnk FROM r WHERE rnk <= 20
        |ORDER BY stratum, rnk""".stripMargin
    ) { (s, dir) =>
      Corpus.scoreStratifiedSample(
          TextAnalysis.bigramLmScore(Tables(s, dir, "documents"))
            .select("doc_id", "score_ppm"),
          "score_ppm", histWidth = 10000L,
          cutsPermille = Seq(200, 400, 600, 800), perStratum = 20)
        .orderBy("stratum", "rnk")
    },

    // Lexical diversity: type-token ratio + hapax rate in ppm — the
    // vocabulary-richness quality filters (low TTR = boilerplate).
    Q("q102_lexical_diversity",
      """WITH tc AS (SELECT doc_id, tok, count(*) AS c
        |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |                  FROM documents) GROUP BY 1, 2),
        | d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |        count(*) AS n_distinct,
        |        count(*) FILTER (c = 1) AS n_hapax
        |       FROM tc GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct, n_hapax,
        | n_distinct * 1000000 // n_tokens AS ttr_ppm,
        | n_hapax * 1000000 // n_distinct AS hapax_ppm
        |FROM d ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.lexicalDiversity(Tables(s, dir, "documents"))
        .orderBy("doc_id")
    },

    // DSIR importance weights (hashed-bigram target/raw ratio, log2-floor
    // quantized in integers): the oracle re-hashes every bigram with the
    // poly_hash fold, rebuilds the 1024-bucket weight table in one
    // FILTER aggregate, and replays the bin()-length log2.
    Q("q95_dsir_weights",
      """WITH t AS (SELECT doc_id, lang = 'en' AS is_target, string_split(text, ' ') AS l
        |           FROM documents),
        | bg AS (SELECT doc_id, is_target,
        |          unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS gram
        |        FROM t WHERE len(l) >= 2),
        | hx AS (SELECT doc_id, is_target,
        |          list_reduce(list_prepend(CAST(7 AS BIGINT),
        |            list_transform(range(1, length(gram) + 1),
        |              i -> CAST(ascii(substr(gram, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |            (a, c) -> (a * 131 + c) % 4294967291) % 1024 AS bucket
        |        FROM bg),
        | w AS (SELECT bucket, count(*) AS c_raw, count(*) FILTER (is_target) AS c_tgt
        |       FROM hx GROUP BY 1),
        | ws AS (SELECT bucket,
        |          CAST(length(bin((c_tgt + 1) * 1048576 // (c_raw + 1))) AS BIGINT) - 21 AS w_bits
        |        FROM w)
        |SELECT h.doc_id, count(*) AS n_grams, CAST(sum(w_bits) AS BIGINT) AS dsir_score
        |FROM hx h JOIN ws USING (bucket)
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      Corpus.dsirWeights(Tables(s, dir, "documents"),
          targetPred = col("lang") === "en")
        .orderBy("doc_id")
    },

    // Index-quality eval: per-LSH-bucket label purity — majority-label
    // share per bucket over the same deterministic hyperplanes the ANN
    // path hashes with; ties toward the larger label id on both sides.
    Q("q104_bucket_purity",
      s"""WITH planes AS (SELECT p, list_transform(range(0, 64),
        |    d -> CASE WHEN ((CAST(p*1021 + d*2039 + 1 AS BIGINT) * 2654435761) >> 13) & 1 = 1
        |         THEN 1.0 ELSE -1.0 END) AS w
        |  FROM range(0, 6) t(p)),
        | b AS (SELECT e.vec_id, e.label,
        |        CAST(sum(CASE WHEN ${dotSql("e.embedding", "p.w")} > 0
        |                      THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |       FROM embeddings e CROSS JOIN planes p GROUP BY ALL),
        | bl AS (SELECT bucket, label, count(*) AS c FROM b GROUP BY 1, 2),
        | r AS (SELECT bucket, label, c,
        |        CAST(sum(c) OVER (PARTITION BY bucket) AS BIGINT) AS n_vectors,
        |        row_number() OVER (PARTITION BY bucket ORDER BY c DESC, label DESC) AS rn
        |       FROM bl)
        |SELECT bucket, n_vectors, CAST(label AS BIGINT) AS majority_label,
        | c * 1000000 // n_vectors AS purity_ppm
        |FROM r WHERE rn = 1 ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      Similarity.bucketPurity(Tables(s, dir, "embeddings"), planes = 6, dim = 64)
        .orderBy("bucket")
    },

    // Margin-based pair mining (Artetxe & Schwenk ratio margin, the
    // CCMatrix bitext filter) — margins are EXACT micros, not ranks:
    // sims are the sequential-fold dot, and both sides' k-NN averages
    // fold in rank order on both engines (ordered list_reduce), so the
    // full margin arithmetic is bit-identical.
    Q("q97_margin_mining",
      s"""WITH a AS (SELECT vec_id AS src_id, embedding,
        |            sqrt(${dotSql("embedding", "embedding")}) AS nrm
        |           FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 64),
        | b AS (SELECT vec_id AS tgt_id, embedding,
        |        sqrt(${dotSql("embedding", "embedding")}) AS nrm
        |       FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < 64),
        | sims AS (SELECT src_id, tgt_id,
        |           ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS sim
        |          FROM a CROSS JOIN b),
        | rk AS (SELECT src_id, tgt_id, sim,
        |         row_number() OVER (PARTITION BY src_id ORDER BY sim DESC, tgt_id) AS rf,
        |         row_number() OVER (PARTITION BY tgt_id ORDER BY sim DESC, src_id) AS rb
        |        FROM sims),
        | ka AS (SELECT src_id, list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list(sim ORDER BY rf)), (acc, x) -> acc + x) / count(*) AS avg_a
        |        FROM rk WHERE rf <= 4 GROUP BY 1),
        | kb AS (SELECT tgt_id, list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list(sim ORDER BY rb)), (acc, x) -> acc + x) / count(*) AS avg_b
        |        FROM rk WHERE rb <= 4 GROUP BY 1),
        | m AS (SELECT r.src_id, r.tgt_id,
        |        2.0 * r.sim / (ka.avg_a + kb.avg_b) AS margin
        |       FROM rk r JOIN ka USING (src_id) JOIN kb USING (tgt_id)),
        | best AS (SELECT src_id, tgt_id,
        |           CAST(floor(margin * 1000000.0 + 0.5) AS BIGINT) AS margin_micros,
        |           row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rnk
        |          FROM m)
        |SELECT src_id, tgt_id, margin_micros FROM best WHERE rnk = 1
        |ORDER BY src_id""".stripMargin
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.marginMine(
          emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 64),
          emb.filter(col("vec_id") % 2 =!= 0 && col("vec_id") < 64), kAvg = 4)
        .orderBy("src_id")
    },

    // Semantic (embedding-space) dedup keep-list — SemDeDup's shape:
    // LSH-bucketed cosine near-dup pairs (q74) → connected components
    // (q55's loop) → keep the min-id representative per cluster,
    // anti-join the rest away. Embeddings get the same end-to-end
    // keep-list text dedup has in q68; every stage is the scalable
    // variant (bucketed candidates, edge-list CC, final anti-join).
    Q("q92_semantic_keeplist",
      s"""WITH RECURSIVE planes AS (SELECT p, list_transform(range(0, 64),
        |    d -> CASE WHEN ((CAST(p*1021 + d*2039 + 1 AS BIGINT) * 2654435761) >> 13) & 1 = 1
        |         THEN 1.0 ELSE -1.0 END) AS w
        |  FROM range(0, 6) t(p)),
        | b AS (SELECT e.vec_id, e.embedding,
        |        sqrt(${dotSql("e.embedding", "e.embedding")}) AS nrm,
        |        CAST(sum(CASE WHEN ${dotSql("e.embedding", "p.w")} > 0
        |                      THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |       FROM embeddings e CROSS JOIN planes p GROUP BY ALL),
        | pairs AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b
        |           FROM b a JOIN b c ON bit_count(xor(a.bucket, c.bucket)) <= 1
        |            AND a.vec_id < c.vec_id
        |           WHERE ${dotSql("a.embedding", "c.embedding")} / (a.nrm * c.nrm) >= 0.4),
        | edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |           UNION SELECT id_b, id_a FROM pairs),
        | reach AS (SELECT src AS id, dst AS r FROM edges
        |           UNION
        |           SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
        | cl AS (SELECT id AS vec_id, min(least(id, r)) AS cluster_id
        |        FROM reach GROUP BY id)
        |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label FROM embeddings e
        |WHERE e.vec_id NOT IN (SELECT vec_id FROM cl WHERE vec_id <> cluster_id)
        |ORDER BY e.vec_id""".stripMargin
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val pairs = Similarity.bucketedNearDupPairs(emb,
        planes = 6, dim = 64, minSim = 0.4, probeHamming = 1)
      val dropped = Clusters.connectedComponents(pairs)
        .filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id").as("vec_id"))
      emb.join(dropped, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label").cast("long").as("label"))
        .orderBy("vec_id")
    },

    Q("q37_multimodal_meta",
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST((ascii(text) * 7) % 256 AS INTEGER) AS width,
        | CAST((ascii(substr(text, 2, 1)) * 13) % 256 AS INTEGER) AS height,
        | CASE WHEN ascii(text) % 2 = 0 THEN 'png' ELSE 'jpg' END AS fmt
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.extractMeta(Tables(s, dir, "documents")).orderBy("doc_id")
    },

    Q("q38_frame_sample",
      """WITH f AS (SELECT doc_id, hex(encode(text)) AS hx,
        |  unnest(range(0, ((octet_length(encode(text)) - 1) // 64) + 1)) AS i
        | FROM documents)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_no,
        | substr(hx, CAST(i AS INTEGER) * 128 + 1, 16) AS frame_sig
        |FROM f ORDER BY doc_id, frame_no""".stripMargin
    ) { (s, dir) =>
      Multimodal.sampleFrames(Tables(s, dir, "documents"), stride = 64)
        .orderBy("doc_id", "frame_no")
    },

    // Gopher-rules composite quality filter (Rae et al. §A1.1): five
    // structural rules as 0/1 columns + packed bitmask + conjunction.
    // The oracle replays every rule in the same integer arithmetic.
    Q("q109_gopher_rules",
      """WITH b AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) - length(replace(text, '#', ''))
        |   + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS sym_cnt,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS alpha_cnt,
        |  CAST((CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 1 ELSE 0 END)
        |   + (CASE WHEN list_contains(string_split(text, ' '), 'a') THEN 1 ELSE 0 END)
        |   + (CASE WHEN list_contains(string_split(text, ' '), 'of') THEN 1 ELSE 0 END)
        |   + (CASE WHEN list_contains(string_split(text, ' '), 'and') THEN 1 ELSE 0 END)
        |   + (CASE WHEN list_contains(string_split(text, ' '), 'to') THEN 1 ELSE 0 END) AS BIGINT) AS stop_kinds
        | FROM documents),
        | m AS (SELECT doc_id, n_tokens,
        |   (n_chars - n_tokens + 1) * 1000000 // n_tokens AS mwl_ppm,
        |   sym_cnt * 1000000 // n_tokens AS sym_ppm,
        |   alpha_cnt * 1000000 // n_tokens AS alpha_ppm,
        |   stop_kinds FROM b),
        | r AS (SELECT *,
        |   CASE WHEN n_tokens >= 30 AND n_tokens <= 100000 THEN 1 ELSE 0 END AS r1,
        |   CASE WHEN mwl_ppm BETWEEN 3000000 AND 10000000 THEN 1 ELSE 0 END AS r2,
        |   CASE WHEN sym_ppm < 100000 THEN 1 ELSE 0 END AS r3,
        |   CASE WHEN alpha_ppm >= 800000 THEN 1 ELSE 0 END AS r4,
        |   CASE WHEN stop_kinds >= 2 THEN 1 ELSE 0 END AS r5
        |  FROM m)
        |SELECT doc_id, n_tokens, mwl_ppm, sym_ppm, alpha_ppm, stop_kinds,
        | CAST(r1 + r2*2 + r3*4 + r4*8 + r5*16 AS BIGINT) AS rule_mask,
        | CAST(CASE WHEN r1 + r2 + r3 + r4 + r5 = 5 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM r ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.gopherRules(Tables(s, dir, "documents")).orderBy("doc_id")
    },

    // Trigram novelty: fraction of a doc's distinct trigrams appearing
    // in no other doc — the cross-corpus originality signal next to
    // q102's within-doc diversity. Low = boilerplate / near-copy.
    Q("q112_trigram_novelty",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | g AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(l) - 1),
        |           i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS gram
        |       FROM t WHERE len(l) >= 3),
        | df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
        | s AS (SELECT doc_id, count(*) AS n_grams,
        |        count(*) FILTER (df = 1) AS n_novel
        |       FROM g JOIN df USING (gram) GROUP BY 1)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        | CAST(n_novel AS BIGINT) AS n_novel,
        | CAST(n_novel * 1000000 // n_grams AS BIGINT) AS novelty_ppm
        |FROM s ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.ngramNovelty(Tables(s, dir, "documents"), 3)
        .orderBy("doc_id")
    },

    // JL ±1 random projection to 8 dims over the SAME deterministic
    // hyperplanes the LSH family uses. Projections are sequential-fold
    // dots (bit-identical on both engines); floor(x·1e6) integerizes.
    Q("q113_random_projection",
      s"""WITH planes AS (SELECT p, list_transform(range(0, 64),
        |    d -> CASE WHEN ((CAST(p*1021 + d*2039 + 1 AS BIGINT) * 2654435761) >> 13) & 1 = 1
        |         THEN 1.0 ELSE -1.0 END) AS w
        |  FROM range(0, 8) t(p))
        |SELECT e.vec_id, CAST(pl.p AS BIGINT) AS dim,
        | CAST(floor(${dotSql("e.embedding", "pl.w")} * 1000000.0) AS BIGINT) AS proj_micros
        |FROM embeddings e CROSS JOIN planes pl
        |ORDER BY vec_id, dim""".stripMargin
    ) { (s, dir) =>
      Similarity.randomProject(Tables(s, dir, "embeddings"), outDim = 8, dim = 64)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "p")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          expr("CAST(floor(p * 1000000.0) AS BIGINT)").as("proj_micros"))
        .orderBy("vec_id", "dim")
    },

    // CCNet head/middle/tail buckets (Wenzek et al. 2020): per-LANGUAGE
    // tercile cut points over the bigram-LM score (low = head = keep),
    // read off the mergeable histogram state — the standard trained-LM
    // corpus gate with per-language calibration. The oracle replays the
    // scoring chain (q94), the per-lang cumulative histogram, and the
    // count-of-exceeded-cuts bucket rule.
    Q("q114_ccnet_buckets",
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
        | bg AS (SELECT doc_id, s.w1 AS w1, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |            i -> {'w1': l[i], 'gram': l[i] || ' ' || l[i+1]})) AS s
        |          FROM t WHERE len(l) >= 2)),
        | cb AS (SELECT gram, count(*) AS cb FROM bg GROUP BY 1),
        | cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
        | terms AS (SELECT b.doc_id, (cb.cb * 1000000) // cu.cu AS term
        |           FROM bg b JOIN cb USING (gram) JOIN cu USING (w1)),
        | scores AS (SELECT doc_id, CAST(sum(term) // count(*) AS BIGINT) AS score_ppm
        |            FROM terms GROUP BY doc_id),
        | sc AS (SELECT s.doc_id, d.lang, s.score_ppm
        |        FROM scores s JOIN documents d USING (doc_id)),
        | h AS (SELECT lang, score_ppm // 10000 AS bucket, count(*) AS n
        |       FROM sc GROUP BY 1, 2),
        | c AS (SELECT lang, bucket,
        |        CAST(sum(n) OVER (PARTITION BY lang ORDER BY bucket
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |        CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS nt
        |       FROM h),
        | thr AS (SELECT lang, q.q, min((bucket + 1) * 10000 - 1) AS u
        |         FROM c, (SELECT unnest([333, 667]) AS q) q
        |         WHERE cum * 1000 >= nt * q.q GROUP BY 1, 2)
        |SELECT s.doc_id, s.lang, s.score_ppm,
        | CAST((SELECT count(*) FROM thr
        |       WHERE thr.lang = s.lang AND s.score_ppm > thr.u) AS BIGINT) AS bucket
        |FROM sc s ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val scored = TextAnalysis.bigramLmScore(docs)
        .select("doc_id", "score_ppm")
        .join(docs.select("doc_id", "lang"), "doc_id")
      Corpus.ccnetBuckets(scored, "lang", "score_ppm", histWidth = 10000L)
        .select("doc_id", "lang", "score_ppm", "bucket")
        .orderBy("doc_id")
    },

    // Temperature-based multilingual sampling (p^0.5 mixing rule):
    // quotas proportional to sqrt(stratum size) flatten the language
    // distribution; sqrt is correctly-rounded IEEE on both engines, so
    // even the weights are hash-exact. Fold-ordered per-language picks.
    Q("q118_temperature_mix",
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        | w AS (SELECT lang, CAST(floor(sqrt(n) * 1000000.0) AS BIGINT) AS w FROM n),
        | tw AS (SELECT sum(w) AS tw FROM w),
        | q AS (SELECT lang, CAST((150 * w) // tw AS BIGINT) AS quota FROM w, tw),
        | r AS (SELECT doc_id, lang,
        |        ((doc_id % 1000000007) * 2654435761) % 1000000007 AS rnd
        |       FROM documents),
        | rk AS (SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang
        |          ORDER BY rnd, doc_id) AS BIGINT) AS rnk FROM r)
        |SELECT rk.doc_id, rk.lang, rk.rnk, q.quota
        |FROM rk JOIN q USING (lang) WHERE rk.rnk <= q.quota
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Corpus.temperatureSample(Tables(s, dir, "documents"), "lang",
          totalSample = 150L)
        .orderBy("doc_id")
    },

    // Target-share mixing with upsampling epochs (the LLaMA recipe
    // table): per-language quotas of 900 docs at fixed permille shares,
    // filled by whole passes over small languages plus deterministic
    // remainder picks — sum of n_copies per language equals its quota
    // exactly.
    Q("q122_target_share_mix",
      """WITH shares(lang, share) AS (VALUES ('en', 400), ('de', 200),
        |   ('es', 150), ('fr', 150), ('zh', 100)),
        | n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        | e AS (SELECT s.lang, CAST((900 * s.share) // 1000 AS BIGINT) AS quota,
        |        CAST((900 * s.share) // 1000 // n.n AS BIGINT) AS full_epochs,
        |        CAST((900 * s.share) // 1000 % n.n AS BIGINT) AS rem
        |       FROM shares s JOIN n USING (lang)),
        | r AS (SELECT doc_id, lang,
        |        ((doc_id % 1000000007) * 2654435761) % 1000000007 AS rnd
        |       FROM documents),
        | rk AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |          ORDER BY rnd, doc_id) AS rnk FROM r)
        |SELECT rk.doc_id, rk.lang,
        | CAST(e.full_epochs + CASE WHEN rk.rnk <= e.rem THEN 1 ELSE 0 END
        |   AS BIGINT) AS n_copies,
        | e.quota
        |FROM rk JOIN e USING (lang)
        |WHERE e.full_epochs + CASE WHEN rk.rnk <= e.rem THEN 1 ELSE 0 END > 0
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Corpus.targetShareMix(Tables(s, dir, "documents"), "lang",
          Seq("en" -> 400, "de" -> 200, "es" -> 150, "fr" -> 150, "zh" -> 100),
          totalDocs = 900L)
        .orderBy("doc_id")
    },

    // Quality feature matrix: every proven per-doc quality signal
    // (surface stats, lexical diversity, Gopher mask, trigram novelty,
    // bigram-LM fluency) joined into the classifier-training feature
    // table; short-doc-undefined signals surface as -1 sentinels. The
    // oracle stitches the component oracles (q25/q102/q109/q112/q94).
    Q("q120_quality_features",
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
        | ts AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
        |         CAST(length(text) AS BIGINT) AS n_chars,
        |         (CAST(length(text) AS BIGINT) * 1000000)
        |           // CAST(len(l) AS BIGINT) AS avg_tok_len_ppm
        |        FROM t),
        | tc AS (SELECT doc_id, tok, count(*) AS c
        |        FROM (SELECT doc_id, unnest(l) AS tok FROM t) GROUP BY 1, 2),
        | ld AS (SELECT doc_id,
        |         CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_ppm,
        |         CAST(count(*) FILTER (c = 1) * 1000000 // count(*) AS BIGINT) AS hapax_ppm
        |        FROM tc GROUP BY 1),
        | gb AS (SELECT doc_id,
        |   CAST(len(l) AS BIGINT) AS n_tokens,
        |   CAST(length(text) AS BIGINT) AS n_chars,
        |   CAST(length(text) - length(replace(text, '#', ''))
        |    + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS sym_cnt,
        |   CAST(len(list_filter(l, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS alpha_cnt,
        |   CAST((CASE WHEN list_contains(l, 'the') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(l, 'a') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(l, 'of') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(l, 'and') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(l, 'to') THEN 1 ELSE 0 END) AS BIGINT) AS stop_kinds
        |  FROM t),
        | gm AS (SELECT doc_id,
        |   CASE WHEN n_tokens >= 30 AND n_tokens <= 100000 THEN 1 ELSE 0 END AS r1,
        |   CASE WHEN (n_chars - n_tokens + 1) * 1000000 // n_tokens
        |     BETWEEN 3000000 AND 10000000 THEN 1 ELSE 0 END AS r2,
        |   CASE WHEN sym_cnt * 1000000 // n_tokens < 100000 THEN 1 ELSE 0 END AS r3,
        |   CASE WHEN alpha_cnt * 1000000 // n_tokens >= 800000 THEN 1 ELSE 0 END AS r4,
        |   CASE WHEN stop_kinds >= 2 THEN 1 ELSE 0 END AS r5
        |  FROM gb),
        | g AS (SELECT doc_id,
        |   CAST(r1 + r2*2 + r3*4 + r4*8 + r5*16 AS BIGINT) AS gopher_mask,
        |   CAST(CASE WHEN r1 + r2 + r3 + r4 + r5 = 5 THEN 1 ELSE 0 END AS BIGINT) AS gopher_pass
        |  FROM gm),
        | ng AS (SELECT DISTINCT doc_id,
        |          unnest(list_transform(range(1, len(l) - 1),
        |            i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS gram
        |        FROM t WHERE len(l) >= 3),
        | ndf AS (SELECT gram, count(*) AS df FROM ng GROUP BY 1),
        | nv AS (SELECT doc_id,
        |         CAST(count(*) FILTER (df = 1) * 1000000 // count(*) AS BIGINT) AS novelty_ppm
        |        FROM ng JOIN ndf USING (gram) GROUP BY 1),
        | bg AS (SELECT doc_id, s.w1 AS w1, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |            i -> {'w1': l[i], 'gram': l[i] || ' ' || l[i+1]})) AS s
        |          FROM t WHERE len(l) >= 2)),
        | cb AS (SELECT gram, count(*) AS cb FROM bg GROUP BY 1),
        | cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
        | lm AS (SELECT b.doc_id,
        |         CAST(sum((cb.cb * 1000000) // cu.cu) // count(*) AS BIGINT) AS lm_score_ppm
        |        FROM bg b JOIN cb USING (gram) JOIN cu USING (w1) GROUP BY 1)
        |SELECT ts.doc_id, ts.n_tokens, ts.n_chars, ts.avg_tok_len_ppm,
        | ld.ttr_ppm, ld.hapax_ppm, g.gopher_mask, g.gopher_pass,
        | CAST(COALESCE(nv.novelty_ppm, -1) AS BIGINT) AS novelty_ppm,
        | CAST(COALESCE(lm.lm_score_ppm, -1) AS BIGINT) AS lm_score_ppm
        |FROM ts JOIN ld USING (doc_id) JOIN g USING (doc_id)
        |LEFT JOIN nv USING (doc_id) LEFT JOIN lm USING (doc_id)
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.qualityFeatures(Tables(s, dir, "documents"))
        .orderBy("doc_id")
    },

    // Dictionary blocklist filter (the C4/LDNOOBW "bad words" stage):
    // per-doc hit totals + distinct kinds against a broadcast wordlist,
    // zero-hit docs surviving the left join, keep = n_hits <= 2.
    Q("q123_blocklist_filter",
      """WITH terms(term) AS (VALUES ('slow'), ('merge'), ('vector')),
        | toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |          FROM documents),
        | h AS (SELECT doc_id, count(*) AS n_hits, count(DISTINCT term) AS n_terms
        |       FROM toks JOIN terms USING (term) GROUP BY 1)
        |SELECT d.doc_id,
        | CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
        | CAST(COALESCE(h.n_terms, 0) AS BIGINT) AS n_terms,
        | CAST(CASE WHEN COALESCE(h.n_hits, 0) <= 2 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM documents d LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.blocklistHits(Tables(s, dir, "documents"),
          Seq("slow", "merge", "vector"), maxHits = 2L)
        .orderBy("doc_id")
    },

    // Source-level curation (the RefinedWeb/FineWeb recipe shape):
    // per-source doc count, mean length, exact-duplicate share; every
    // doc inherits its source's keep verdict via a broadcast join.
    Q("q124_source_curation",
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |        sum(length(text)) AS chars_total,
        |        count(DISTINCT text) AS n_distinct
        |       FROM documents GROUP BY 1),
        | v AS (SELECT source, n_docs, chars_total // n_docs AS mean_chars,
        |        (n_docs - n_distinct) * 1000000 // n_docs AS dup_ppm FROM s)
        |SELECT d.doc_id, d.source, CAST(v.n_docs AS BIGINT) AS n_docs,
        | CAST(v.mean_chars AS BIGINT) AS mean_chars,
        | CAST(v.dup_ppm AS BIGINT) AS dup_ppm,
        | CAST(CASE WHEN v.mean_chars >= 290 AND v.dup_ppm <= 100000
        |   THEN 1 ELSE 0 END AS BIGINT) AS src_kept
        |FROM documents d JOIN v USING (source) ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Corpus.sourceCuration(Tables(s, dir, "documents"), "source",
          minMeanChars = 290L, maxDupPpm = 100000L)
        .orderBy("doc_id")
    },

    // Corpus-overlap estimation: pairwise estimated Jaccard between
    // sources' shingle SETS from group-level MinHash signatures — the
    // sketch answer to "how much does source A overlap source B" (at
    // 100 TB the exact distinct-shingle intersection is unaffordable;
    // the sketch touches the corpus once). Oracle replays the poly-hash
    // mins per source and the pairwise match counts exactly.
    Q("q125_source_overlap",
      """WITH w AS (SELECT source, string_split(text, ' ') AS l FROM documents),
        | sh AS (SELECT source, unnest(list_transform(range(1, len(l) - 1),
        |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS shingle
        |        FROM w WHERE len(l) >= 3),
        | hx AS (SELECT source, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(range(1, length(shingle) + 1),
        |            i -> CAST(ascii(substr(shingle, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |          (a, c) -> (a * 131 + c) % 4294967291) AS x
        |        FROM sh),
        | perms AS (SELECT j, ((1103515245 * (j + 1) + 12345) % 2147483648) | 1 AS a,
        |                  (2654435761 * (j + 7)) % 4294967311 AS b
        |           FROM range(0, 32) t(j)),
        | mh AS (SELECT source, j, min((a * x + b) % 4294967311) AS h
        |        FROM hx CROSS JOIN perms GROUP BY 1, 2),
        | p AS (SELECT a.source AS grp_a, b.source AS grp_b,
        |        sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS matches
        |       FROM mh a JOIN mh b ON a.j = b.j AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT grp_a, grp_b, CAST(matches AS BIGINT) AS matches,
        | CAST(matches * 1000000 // 32 AS BIGINT) AS est_jaccard_ppm
        |FROM p ORDER BY grp_a, grp_b""".stripMargin
    ) { (s, dir) =>
      Dedup.groupOverlapEstimates(Tables(s, dir, "documents"), "source",
          k = 3, numPerms = 32)
        .orderBy("grp_a", "grp_b")
    },

    // Product-quantization ADC top-k, HASH-GREEN (round 9): the PQ
    // family's trained codebooks keep q42-style oracles out of reach
    // (k-means sums drift with partition order), so this entry fixes
    // the codebook by an integer hash formula — the q36/q92 LSH-plane
    // trick applied to PQ — and then encode (per-subspace argmin,
    // score = |c|² − 2·q·c, ties to the lower cell id) and ADC
    // (per-query distance tables, m lookups summed in subspace order)
    // are replayed TERM-FOR-TERM in the oracle: every double on both
    // sides is the same ascending-index fold, so ranks hash-match
    // exactly. m=8 × ksub=8 × subDim=8 over the 64-dim embeddings.
    Q("q141_pq_adc",
      s"""WITH cents AS (SELECT s, c, list_transform(range(0, 8),
        |      d -> CAST((c * 2654435761 + s * 40503 + d * 2246822519) % 1048576
        |               AS DOUBLE) / 1048576.0 - 0.5) AS w
        |    FROM range(0, 8) ts(s) CROSS JOIN range(0, 8) tc(c)),
        | cc AS (SELECT s, c, w, list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list_transform(range(1, 9), wi -> w[wi] * w[wi])),
        |          (a, x) -> a + x) AS c2
        |        FROM cents),
        | sc AS (SELECT e.vec_id, cc.s, cc.c,
        |         cc.c2 - 2.0 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, 9),
        |             di -> CAST(e.embedding[cc.s * 8 + di] AS DOUBLE) * cc.w[di])),
        |           (a, x) -> a + x) AS score
        |        FROM embeddings e CROSS JOIN cc),
        | code AS (SELECT vec_id, s, c FROM (SELECT vec_id, s, c,
        |           row_number() OVER (PARTITION BY vec_id, s
        |             ORDER BY score, c) AS rn FROM sc)
        |          WHERE rn = 1),
        | adc0 AS (SELECT sq.vec_id AS query_id, cd.vec_id AS neighbor_id,
        |           sq.s AS s, sq.score AS t
        |          FROM code cd JOIN sc sq ON sq.s = cd.s AND sq.c = cd.c
        |          WHERE sq.vec_id < 12 AND sq.vec_id <> cd.vec_id),
        | adc AS (SELECT query_id, neighbor_id,
        |          list_reduce(list(t ORDER BY s), (a, x) -> a + x) AS dist
        |         FROM adc0 GROUP BY 1, 2),
        | r AS (SELECT query_id, neighbor_id, CAST(row_number() OVER (
        |         PARTITION BY query_id ORDER BY dist, neighbor_id) AS BIGINT) AS rnk
        |       FROM adc)
        |SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      import graft.llm.ProductQuantizer
      val cb = ProductQuantizer.Codebook(8, 8, 8,
        (0 until 8).map(sp => (0 until 8).map(c => (c.toLong,
          Array.tabulate(8)(d =>
            ((c * 2654435761L + sp * 40503L + d * 2246822519L) % 1048576L)
              .toDouble / 1048576.0 - 0.5))).toSeq).toSeq)
      val emb = Tables(s, dir, "embeddings")
      val coded = ProductQuantizer.encode(emb, cb)
      ProductQuantizer.adcTopK(coded, emb.filter(col("vec_id") < 12), cb, k = 5)
        .orderBy("query_id", "rnk")
    },

    // MMR diversity re-rank (round 9; Carbonell & Goldstein 1998):
    // greedily pick 3 of each query's 6 nearest candidates, each step
    // argmax of 0.7·sim(q,d) − 0.3·max_sel sim(d,s) — plain top-k would
    // happily return three near-copies of one document. The oracle
    // statically UNROLLS the three greedy rounds (the q111 BPE
    // discipline): every double on both sides is the same ascending
    // fold, max is order-free, ties break on the lower id.
    Q("q148_mmr_rerank",
      s"""WITH v AS (SELECT vec_id, embedding,
        |        sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
        | c0 AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS sim_q,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) DESC,
        |             c.vec_id) AS rnk
        |        FROM v q JOIN v c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
        | cand AS (SELECT query_id, cand_id, sim_q FROM c0 WHERE rnk <= 6),
        | pair AS (SELECT x.query_id, x.cand_id AS a_id, y.cand_id AS b_id,
        |           ${dotSql("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS sim_ab
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
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.mmrRerank(emb, emb.filter(col("vec_id") < 8),
          kCand = 6, kOut = 3, lambda = 0.7)
        .orderBy("query_id", "step")
    },

    // ANN-candidate-fed MMR (round 10) — q148's 100 TB form as its own
    // hash-green entry: candidates come from single-table LSH buckets at
    // hamming ≤ 1 (the q36 replay — the oracle states the candidate set
    // as bit_count(xor(buckets)) ≤ 1 over the same deterministic
    // planes), exact-cosine scored and cut to each query's top 6, then
    // the SAME statically-unrolled greedy rounds as q148 run over that
    // retrieved set. Every stage downstream of candidate generation is
    // candidate-bounded — nothing rescans the corpus.
    Q("q149_mmr_ann",
      s"""WITH planes AS (SELECT p, list_transform(range(0, 64),
        |    d -> CASE WHEN ((CAST(p*1021 + d*2039 + 1 AS BIGINT) * 2654435761) >> 13) & 1 = 1
        |         THEN 1.0 ELSE -1.0 END) AS w
        |  FROM range(0, 6) t(p)),
        | b AS (SELECT e.vec_id, e.embedding,
        |        sqrt(${dotSql("e.embedding", "e.embedding")}) AS nrm,
        |        CAST(sum(CASE WHEN ${dotSql("e.embedding", "p.w")} > 0
        |                      THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |       FROM embeddings e CROSS JOIN planes p GROUP BY ALL),
        | c0 AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS sim_q,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) DESC,
        |             c.vec_id) AS rnk
        |        FROM b q JOIN b c ON bit_count(xor(q.bucket, c.bucket)) <= 1
        |         AND q.vec_id < 8 AND q.vec_id <> c.vec_id),
        | cand AS (SELECT query_id, cand_id, sim_q FROM c0 WHERE rnk <= 6),
        | pair AS (SELECT x.query_id, x.cand_id AS a_id, y.cand_id AS b_id,
        |           ${dotSql("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS sim_ab
        |          FROM cand x JOIN cand y ON x.query_id = y.query_id
        |            AND x.cand_id <> y.cand_id
        |          JOIN b ea ON ea.vec_id = x.cand_id
        |          JOIN b eb ON eb.vec_id = y.cand_id),
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
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.mmrRerankAnn(emb, emb.filter(col("vec_id") < 8),
          kCand = 6, kOut = 3, lambda = 0.7, planes = 6, dim = 64,
          tables = 1, probeHamming = 1)
        .orderBy("query_id", "step")
    },

    // ANN-fed margin mining (round 10) — q97's 100 TB form as its own
    // hash-green entry: the ratio margin computed over LSH-RETRIEVED
    // neighborhoods (bit_count(xor(buckets)) ≤ 1 across the even/odd
    // split, the q36 plane replay), exactly as the production bitext
    // miners do — the k-NN averages are over the retrieved k. Margins
    // are exact micros: same sequential-fold dot and rank-ordered
    // averages as q97, just over the candidate sims.
    Q("q150_margin_ann",
      s"""WITH planes AS (SELECT p, list_transform(range(0, 64),
        |    d -> CASE WHEN ((CAST(p*1021 + d*2039 + 1 AS BIGINT) * 2654435761) >> 13) & 1 = 1
        |         THEN 1.0 ELSE -1.0 END) AS w
        |  FROM range(0, 6) t(p)),
        | bk AS (SELECT e.vec_id, e.embedding,
        |         sqrt(${dotSql("e.embedding", "e.embedding")}) AS nrm,
        |         CAST(sum(CASE WHEN ${dotSql("e.embedding", "p.w")} > 0
        |                       THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |        FROM embeddings e CROSS JOIN planes p
        |        WHERE e.vec_id < 64 GROUP BY ALL),
        | a AS (SELECT vec_id AS src_id, embedding, nrm, bucket FROM bk
        |       WHERE vec_id % 2 = 0),
        | b AS (SELECT vec_id AS tgt_id, embedding, nrm, bucket FROM bk
        |       WHERE vec_id % 2 = 1),
        | sims AS (SELECT src_id, tgt_id,
        |           ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS sim
        |          FROM a JOIN b ON bit_count(xor(a.bucket, b.bucket)) <= 1),
        | rk AS (SELECT src_id, tgt_id, sim,
        |         row_number() OVER (PARTITION BY src_id ORDER BY sim DESC, tgt_id) AS rf,
        |         row_number() OVER (PARTITION BY tgt_id ORDER BY sim DESC, src_id) AS rb
        |        FROM sims),
        | ka AS (SELECT src_id, list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list(sim ORDER BY rf)), (acc, x) -> acc + x) / count(*) AS avg_a
        |        FROM rk WHERE rf <= 4 GROUP BY 1),
        | kb AS (SELECT tgt_id, list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list(sim ORDER BY rb)), (acc, x) -> acc + x) / count(*) AS avg_b
        |        FROM rk WHERE rb <= 4 GROUP BY 1),
        | m AS (SELECT r.src_id, r.tgt_id,
        |        2.0 * r.sim / (ka.avg_a + kb.avg_b) AS margin
        |       FROM rk r JOIN ka USING (src_id) JOIN kb USING (tgt_id)),
        | best AS (SELECT src_id, tgt_id,
        |           CAST(floor(margin * 1000000.0 + 0.5) AS BIGINT) AS margin_micros,
        |           row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rnk
        |          FROM m)
        |SELECT src_id, tgt_id, margin_micros FROM best WHERE rnk = 1
        |ORDER BY src_id""".stripMargin
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.marginMineAnn(
          emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 64),
          emb.filter(col("vec_id") % 2 =!= 0 && col("vec_id") < 64),
          kAvg = 4, planes = 6, dim = 64, tables = 1, probeHamming = 1)
        .orderBy("src_id")
    },

    // Embed-and-retrieve, value-checked end to end (round 10): the
    // inference seam was spec-proven only — here the oracle REPLAYS the
    // deterministic embedder itself (per-token char fold
    // h = (131·h + c) mod 4294967291 via list_reduce, dim-bucketed
    // weight sums, float-rounded L2-ish normalization — every step the
    // same IEEE op on both engines) and then runs the q34 brute-force
    // retrieval over the embeddings IT built. Documents go in, ranked
    // neighbors come out, hash-green — the corpus-embedding pipeline's
    // arithmetic is pinned, not just its plumbing.
    Q("q161_embed_retrieve",
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents),
        | th AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
        |          list_transform(regexp_extract_all(tok, '.'),
        |            ch -> CAST(ascii(ch) AS BIGINT))),
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
        |         sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM vec),
        | scored AS (SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
        |             ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS sim
        |            FROM vv q JOIN vv c ON q.doc_id < 8 AND q.doc_id <> c.doc_id
        |            WHERE q.nrm > 0 AND c.nrm > 0)
        |SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM (
        |  SELECT query_id, neighbor_id,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY sim DESC, neighbor_id) AS rnk
        |  FROM scored) WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      import graft.llm.Inference
      val emb = Inference.embedDocuments(Tables(s, dir, "documents"),
          dim = 64, batchSize = 32)
        .withColumnRenamed("doc_id", "vec_id")
      Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 8), k = 5)
        .orderBy("query_id", "rnk")
    },

    // Late-interaction retrieval (round 10; ColBERT MaxSim — Khattab &
    // Zaharia 2020): docs and queries as BAGS of chunk vectors, scored
    // Σ per query chunk of the max cosine over the candidate's chunks —
    // multi-topic documents match on the right PART where single-vector
    // retrieval averages topics away. Chunks and embeddings replay via
    // the q162 machinery; each per-chunk max floors to micros BEFORE
    // the sum, so scores are order-free integers. Queries = docs 0–7's
    // chunk sets; top-5 candidates per query doc.
    Q("q163_late_interaction",
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
        | vv AS (SELECT doc_id // 1000 AS owner, doc_id AS cid, embedding,
        |         sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM vec),
        | sims AS (SELECT q.owner AS query_id, q.cid AS q_chunk,
        |           c.owner AS cand_id,
        |           ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS sim
        |          FROM vv q JOIN vv c
        |            ON q.owner < 8 AND q.owner <> c.owner
        |          WHERE q.nrm > 0 AND c.nrm > 0),
        | best AS (SELECT query_id, cand_id, q_chunk,
        |           CAST(floor(max(sim) * 1000000) AS BIGINT) AS mx
        |          FROM sims GROUP BY 1, 2, 3),
        | sc AS (SELECT query_id, cand_id, CAST(sum(mx) AS BIGINT) AS maxsim_micros
        |        FROM best GROUP BY 1, 2)
        |SELECT query_id, cand_id, maxsim_micros, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT query_id, cand_id, maxsim_micros,
        |       row_number() OVER (PARTITION BY query_id
        |         ORDER BY maxsim_micros DESC, cand_id) AS rnk FROM sc)
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      import graft.llm.{Corpus, Inference}
      val chunks = Corpus.chunkDocuments(Tables(s, dir, "documents"),
          chunkTokens = 32, overlap = 8)
        .select((col("doc_id") * 1000 + col("chunk_no")).as("doc_id"),
          col("chunk_text").as("text"))
      val cemb = Inference.embedDocuments(chunks, dim = 64, batchSize = 32)
        .select(expr("doc_id DIV 1000").as("doc_id"),
          col("doc_id").as("chunk_id"), col("embedding"))
      Similarity.lateInteractionTopK(cemb,
          cemb.filter(col("doc_id") < 8), k = 5)
        .orderBy("query_id", "rnk")
    },

    // Quantization-drift report — the vector store's retrain trigger
    // (VectorIngest.quantizationDrift) value-checked end to end via its
    // pure form: 16 deterministic centroids (q42's discipline), per-
    // vector angular err = 1e6 − floor(1e6·best cosine), integer-DIV
    // means for the train ("baseline") and batch legs, ppm ratio with a
    // greatest() zero-guard, threshold verdict. The oracle replays the
    // identical double fold and every integer step.
    Q("q164_quantization_drift",
      s"""WITH v AS (SELECT vec_id, embedding,
        |        sqrt(${dotSql("embedding", "embedding")}) AS nrm
        |       FROM embeddings),
        | cents AS (SELECT embedding AS cent, nrm AS cn
        |           FROM v WHERE vec_id < 16 AND nrm > 0),
        | best AS (SELECT v.vec_id,
        |           max(${dotSql("v.embedding", "c.cent")} / (v.nrm * c.cn)) AS best
        |          FROM v CROSS JOIN cents c WHERE v.nrm > 0 GROUP BY v.vec_id),
        | err AS (SELECT vec_id,
        |          1000000 - CAST(floor(best * 1000000) AS BIGINT) AS e
        |         FROM best),
        | tr AS (SELECT sum(e) // count(*) AS base FROM err),
        | ba AS (SELECT count(*) AS n, sum(e) // count(*) AS berr
        |        FROM err WHERE vec_id % 5 = 0)
        |SELECT CAST(ba.n AS BIGINT) AS n_batch,
        | CAST(ba.berr AS BIGINT) AS batch_err_micros,
        | CAST(tr.base AS BIGINT) AS base_err_micros,
        | CAST(ba.berr * 1000000 // greatest(tr.base, 1) AS BIGINT) AS drift_ppm,
        | CAST(CASE WHEN ba.berr * 1000000 // greatest(tr.base, 1) > 2000000
        |      THEN 1 ELSE 0 END AS BIGINT) AS retrain_suggested
        |FROM ba CROSS JOIN tr""".stripMargin
    ) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < 16)
        .select(col("embedding").as("cent"),
          Similarity.norm(col("embedding")).as("cent_norm"))
        .filter(col("cent_norm") > 0)
      graft.streaming.VectorIngest.driftReport(
        batch = emb.filter(col("vec_id") % 5 === 0),
        train = emb, cents = cents)
    },

    // CCNet per-source quality tiers (Wenzek et al. §4.4): every doc's
    // within-source rank over the q94 bigram-LM score (desc, doc_id
    // tiebreak), exact rank ppm, head/middle/tail at 30%/65%. The
    // oracle retrains the same LM counts and replays rank + division.
    Q("q165_source_tiers",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | bg AS (SELECT doc_id, s.w1 AS w1, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |            i -> {'w1': l[i], 'gram': l[i] || ' ' || l[i+1]})) AS s
        |          FROM t WHERE len(l) >= 2)),
        | cb AS (SELECT gram, count(*) AS cb FROM bg GROUP BY 1),
        | cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
        | terms AS (SELECT b.doc_id, (cb.cb * 1000000) // cu.cu AS term
        |           FROM bg b JOIN cb USING (gram) JOIN cu USING (w1)),
        | scores AS (SELECT doc_id, CAST(sum(term) // count(*) AS BIGINT) AS score_ppm
        |            FROM terms GROUP BY doc_id),
        | r AS (SELECT s.doc_id, d.source, s.score_ppm,
        |        CAST(row_number() OVER (PARTITION BY d.source
        |          ORDER BY s.score_ppm DESC, s.doc_id) AS BIGINT) AS rnk,
        |        CAST(count(*) OVER (PARTITION BY d.source) AS BIGINT) AS n_src
        |       FROM scores s JOIN documents d USING (doc_id))
        |SELECT doc_id, source, score_ppm, rnk, n_src,
        | CAST((rnk - 1) * 1000000 // n_src AS BIGINT) AS rank_ppm,
        | CASE WHEN (rnk - 1) * 1000000 // n_src < 300000 THEN 'head'
        |      WHEN (rnk - 1) * 1000000 // n_src < 650000 THEN 'middle'
        |      ELSE 'tail' END AS tier
        |FROM r ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      Corpus.perSourceTiers(docs, TextAnalysis.bigramLmScore(docs))
        .orderBy("doc_id")
    }
  )
}
