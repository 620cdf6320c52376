package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{Corpus, Rlhf}

/** Round-12 RLHF-stage data constructors ([[graft.llm.Rlhf]]): the
  * post-training siblings of the q173-q175 pretraining constructors —
  * reward-model fitting from pairwise comparisons (Bradley–Terry),
  * DoReMi-style domain mixture reweighting, group-relative advantage
  * normalization (GRPO), and rejection-sampling selection. Integer
  * fixed-point throughout so fixed-iteration numerics replay
  * bit-identically in the DuckDB oracle (the [[Q]] determinism rules);
  * the iterative solvers' oracles are unrolled MATERIALIZED CTE chains
  * (the ccLabelPropCtes discipline).
  */
object RlhfQueries {

  /** q78's deterministic per-doc hash as DuckDB text (PolyHash over the
    * decimal id string) — the selection key for bounded response sets. */
  private val polyHashSql =
    """list_reduce(list_prepend(CAST(7 AS BIGINT),
      |    list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
      |      i -> CAST(ascii(substr(CAST(doc_id AS VARCHAR), CAST(i AS INTEGER), 1)) AS BIGINT))),
      |   (a, c) -> (a * 131 + c) % 4294967291)""".stripMargin

  /** Per-doc integer type-token ratio — the cheap deterministic reward
    * proxy these entries rank by (ppm of distinct whitespace tokens). */
  private val ttrCtes =
    """t AS (SELECT doc_id, source, string_split(text, ' ') AS l FROM documents),
      | ttr AS (SELECT doc_id, source,
      |          CAST(len(list_distinct(l)) AS BIGINT) * 1000000
      |            // greatest(len(l), 1) AS reward_ppm FROM t)""".stripMargin

  /** The same proxy on the Spark side. */
  private def ttrDf(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("l"))
      .withColumn("reward_ppm", expr(
        "CAST(size(array_distinct(l)) AS BIGINT) * 1000000L DIV greatest(size(l), 1)"))

  val all: Seq[Q] = Seq(

    // BRADLEY-TERRY reward fitting (Zermelo/MM, 8 fixed integer
    // rounds): comparisons are all within-language games among each
    // language's 8 hash-smallest docs (the q78 deterministic
    // selection), longer doc wins, ties to the lower id. The oracle
    // replays the selection, the games, and every MM round's
    // fixed-point arithmetic CTE for CTE.
    Q("q176_bradley_terry",
      s"""WITH h AS (SELECT doc_id, lang, text, $polyHashSql AS hv FROM documents),
        | r AS (SELECT doc_id, lang, text,
        |        row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rnk
        |       FROM h),
        | sel AS MATERIALIZED (SELECT doc_id, lang,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |       FROM r WHERE rnk <= 8),
        | comp AS MATERIALIZED (SELECT
        |        CASE WHEN x.nt > y.nt OR (x.nt = y.nt AND x.doc_id < y.doc_id)
        |             THEN x.doc_id ELSE y.doc_id END AS winner_id,
        |        CASE WHEN x.nt > y.nt OR (x.nt = y.nt AND x.doc_id < y.doc_id)
        |             THEN y.doc_id ELSE x.doc_id END AS loser_id
        |       FROM sel x JOIN sel y
        |        ON x.lang = y.lang AND x.doc_id < y.doc_id),
        |""".stripMargin + Rlhf.bradleyTerrySql(iters = 8) + """
        |SELECT item_id, bt_ppm FROM bt ORDER BY item_id""".stripMargin
    ) { (s, dir) =>
      val sel = Corpus.balancedSample(Tables(s, dir, "documents"), "lang", 8)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("nt"))
      val xWins = col("x.nt") > col("y.nt") ||
        (col("x.nt") === col("y.nt") && col("x.doc_id") < col("y.doc_id"))
      val comp = sel.as("x").join(sel.as("y"),
          col("x.lang") === col("y.lang") && col("x.doc_id") < col("y.doc_id"))
        .select(
          when(xWins, col("x.doc_id")).otherwise(col("y.doc_id")).as("winner_id"),
          when(xWins, col("y.doc_id")).otherwise(col("x.doc_id")).as("loser_id"))
      Rlhf.bradleyTerry(comp, iters = 8).orderBy("item_id")
    },

    // DoReMi-style domain reweighting (10 multiplicative-weights
    // rounds): per-source proxy loss = 1e6 - mean doc type-token
    // ratio; each round upweights sources whose loss exceeds the
    // CURRENT mixture mean, so the recursion is genuinely iterative.
    // The oracle unrolls all 10 rounds in fixed-point CTEs.
    Q("q177_domain_mw",
      s"""WITH $ttrCtes,
        | dl AS MATERIALIZED (SELECT source AS domain,
        |        CAST(1000000 - (sum(reward_ppm) // count(*)) AS BIGINT) AS loss_ppm
        |       FROM ttr GROUP BY 1),
        |""".stripMargin + Rlhf.domainMixtureMWSql(iters = 10, etaPpm = 300000L) + """
        |SELECT domain AS source, loss_ppm, weight_ppm FROM mw
        |ORDER BY source""".stripMargin
    ) { (s, dir) =>
      val dl = ttrDf(s, dir).groupBy(col("source").as("domain"))
        .agg(expr("CAST(1000000L - (sum(reward_ppm) DIV count(1)) AS BIGINT)")
          .as("loss_ppm"))
      Rlhf.domainMixtureMW(dl, iters = 10, etaPpm = 300000L)
        .select(col("domain").as("source"), col("loss_ppm"), col("weight_ppm"))
        .orderBy("source")
    },

    // GRPO group-relative advantages: groups are (source, doc_id % 4)
    // response sets, reward is the TTR proxy, advantage emitted as
    // n*(r - mean) = r*n - sum_r (integer-exact; sign and ranking
    // identical to the standard form), zero-variance groups dropped
    // whole. The oracle replays the grouping and the scaled statistic.
    Q("q178_grpo_advantage",
      s"""WITH $ttrCtes,
        | r AS (SELECT doc_id,
        |        source || '_' || CAST(doc_id % 4 AS VARCHAR) AS group_id,
        |        reward_ppm FROM ttr),
        | g AS (SELECT group_id, count(*) AS n, CAST(sum(reward_ppm) AS BIGINT) AS sum_r,
        |        max(reward_ppm) AS mx, min(reward_ppm) AS mn
        |       FROM r GROUP BY 1)
        |SELECT r.group_id, r.doc_id AS item_id, r.reward_ppm,
        | CAST(g.n AS BIGINT) AS n,
        | r.reward_ppm * CAST(g.n AS BIGINT) - g.sum_r AS adv_scaled
        |FROM r JOIN g USING (group_id) WHERE g.mx <> g.mn
        |ORDER BY group_id, item_id""".stripMargin
    ) { (s, dir) =>
      val rows = ttrDf(s, dir).select(
        concat(col("source"), lit("_"), (col("doc_id") % 4).cast("string"))
          .as("group_id"),
        col("doc_id").as("item_id"), col("reward_ppm"))
      Rlhf.groupAdvantages(rows).orderBy("group_id", "item_id")
    },

    // Rejection-sampling selection (Llama-2 RFT): per group keep the 2
    // highest-reward responses (ties to the lower id), zero-variance
    // groups dropped. The oracle replays the rank window and gates.
    Q("q179_rejection_sampling",
      s"""WITH $ttrCtes,
        | r AS (SELECT doc_id,
        |        source || '_' || CAST(doc_id % 4 AS VARCHAR) AS group_id,
        |        reward_ppm FROM ttr),
        | k AS (SELECT group_id, doc_id, reward_ppm,
        |        CAST(row_number() OVER (PARTITION BY group_id
        |          ORDER BY reward_ppm DESC, doc_id) AS BIGINT) AS rnk,
        |        max(reward_ppm) OVER (PARTITION BY group_id) AS mx,
        |        min(reward_ppm) OVER (PARTITION BY group_id) AS mn
        |       FROM r)
        |SELECT group_id, doc_id AS item_id, reward_ppm, rnk
        |FROM k WHERE mx <> mn AND rnk <= 2
        |ORDER BY group_id, rnk""".stripMargin
    ) { (s, dir) =>
      val rows = ttrDf(s, dir).select(
        concat(col("source"), lit("_"), (col("doc_id") % 4).cast("string"))
          .as("group_id"),
        col("doc_id").as("item_id"), col("reward_ppm"))
      Rlhf.rejectionSample(rows, k = 2).orderBy("group_id", "rnk")
    },

    // MERGEABLE reward-model state (round-12 judge task 5): the BT
    // sufficient statistic (per-pair games/wins_lo) folds additively,
    // so preference batches refresh the reward model without
    // rescanning comparison history. Two judge passes over each
    // source's 8 hash-smallest docs — longer-wins and TTR-wins — are
    // fitted as SEPARATE batch states folded with mergeBtState (pairs
    // judged by both passes genuinely merge: games=2), and the oracle
    // fits the one-shot union — fold == one-shot, bit for bit.
    Q("q180_bt_state_fold",
      s"""WITH h AS (SELECT doc_id, source, text, $polyHashSql AS hv FROM documents),
        | r AS (SELECT doc_id, source, text,
        |        row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rnk
        |       FROM h),
        | sel AS MATERIALIZED (SELECT doc_id, source,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |          * 1000000 // greatest(len(string_split(text, ' ')), 1) AS ttr
        |       FROM r WHERE rnk <= 8),
        | comp AS MATERIALIZED (
        |       SELECT CASE WHEN x.nt > y.nt OR (x.nt = y.nt AND x.doc_id < y.doc_id)
        |               THEN x.doc_id ELSE y.doc_id END AS winner_id,
        |              CASE WHEN x.nt > y.nt OR (x.nt = y.nt AND x.doc_id < y.doc_id)
        |               THEN y.doc_id ELSE x.doc_id END AS loser_id
        |        FROM sel x JOIN sel y
        |         ON x.source = y.source AND x.doc_id < y.doc_id
        |       UNION ALL
        |       SELECT CASE WHEN x.ttr > y.ttr OR (x.ttr = y.ttr AND x.doc_id < y.doc_id)
        |               THEN x.doc_id ELSE y.doc_id END,
        |              CASE WHEN x.ttr > y.ttr OR (x.ttr = y.ttr AND x.doc_id < y.doc_id)
        |               THEN y.doc_id ELSE x.doc_id END
        |        FROM sel x JOIN sel y
        |         ON x.source = y.source AND x.doc_id < y.doc_id),
        |""".stripMargin + Rlhf.bradleyTerrySql(iters = 8) + """
        |SELECT item_id, bt_ppm FROM bt ORDER BY item_id""".stripMargin
    ) { (s, dir) =>
      val sel = Corpus.balancedSample(Tables(s, dir, "documents"), "source", 8)
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), col("source"),
          size(col("l")).cast("long").as("nt"),
          expr("CAST(size(array_distinct(l)) AS BIGINT) * 1000000L" +
            " DIV greatest(size(l), 1)").as("ttr"))
      def pass(score: String) = {
        val xWins = col(s"x.$score") > col(s"y.$score") ||
          (col(s"x.$score") === col(s"y.$score") && col("x.doc_id") < col("y.doc_id"))
        sel.as("x").join(sel.as("y"),
            col("x.source") === col("y.source") && col("x.doc_id") < col("y.doc_id"))
          .select(
            when(xWins, col("x.doc_id")).otherwise(col("y.doc_id")).as("winner_id"),
            when(xWins, col("y.doc_id")).otherwise(col("x.doc_id")).as("loser_id"))
      }
      val folded = Rlhf.mergeBtState(Seq(
        Rlhf.btState(pass("nt")), Rlhf.btState(pass("ttr"))))
      Rlhf.fitFromState(folded, iters = 8).orderBy("item_id")
    },

    // KL-REGULARIZED BEST-OF-N (round-12 judge task 8): composes the
    // q176 reward fit with a q179-style selection, minus β times a
    // divergence proxy — here 1e6 − the bigram-LM likelihood score, so
    // a response the corpus reference model finds unlikely pays the
    // KL penalty. Groups are q176's per-language response sets; the
    // oracle unrolls the full composition (selection + 8 MM rounds +
    // the LM retrain + the objective window).
    Q("q181_kl_best_of_n",
      s"""WITH h AS (SELECT doc_id, lang, text, $polyHashSql AS hv FROM documents),
        | r AS (SELECT doc_id, lang, text,
        |        row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rnk
        |       FROM h),
        | sel AS MATERIALIZED (SELECT doc_id, lang,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |       FROM r WHERE rnk <= 8),
        | comp AS MATERIALIZED (SELECT
        |        CASE WHEN x.nt > y.nt OR (x.nt = y.nt AND x.doc_id < y.doc_id)
        |             THEN x.doc_id ELSE y.doc_id END AS winner_id,
        |        CASE WHEN x.nt > y.nt OR (x.nt = y.nt AND x.doc_id < y.doc_id)
        |             THEN y.doc_id ELSE x.doc_id END AS loser_id
        |       FROM sel x JOIN sel y
        |        ON x.lang = y.lang AND x.doc_id < y.doc_id),
        |""".stripMargin + Rlhf.bradleyTerrySql(iters = 8) + """,
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
        | cand AS (SELECT sel.lang AS group_id, bt.item_id,
        |          bt.bt_ppm AS reward_ppm,
        |          1000000 - coalesce(sc.s, CAST(0 AS BIGINT)) AS kl_ppm
        |         FROM bt JOIN sel ON sel.doc_id = bt.item_id
        |          LEFT JOIN sc ON sc.doc_id = bt.item_id),
        | obj AS (SELECT group_id, item_id, reward_ppm, kl_ppm,
        |          reward_ppm - 500000 * kl_ppm // 1000000 AS obj_ppm
        |         FROM cand)
        |SELECT group_id, item_id, reward_ppm, kl_ppm, obj_ppm,
        | CAST(row_number() OVER (PARTITION BY group_id
        |   ORDER BY obj_ppm DESC, item_id) AS BIGINT) AS rnk
        |FROM obj QUALIFY rnk <= 2
        |ORDER BY group_id, rnk""".stripMargin
    ) { (s, dir) =>
      import graft.llm.TextAnalysis
      val docs = Tables(s, dir, "documents")
      val sel = Corpus.balancedSample(docs, "lang", 8)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("nt"))
      val xWins = col("x.nt") > col("y.nt") ||
        (col("x.nt") === col("y.nt") && col("x.doc_id") < col("y.doc_id"))
      val comp = sel.as("x").join(sel.as("y"),
          col("x.lang") === col("y.lang") && col("x.doc_id") < col("y.doc_id"))
        .select(
          when(xWins, col("x.doc_id")).otherwise(col("y.doc_id")).as("winner_id"),
          when(xWins, col("y.doc_id")).otherwise(col("x.doc_id")).as("loser_id"))
      val rewards = Rlhf.bradleyTerry(comp, iters = 8)
      val lm = TextAnalysis.bigramLmScore(docs).select(col("doc_id"), col("score_ppm"))
      val rows = rewards
        .join(sel.select(col("doc_id"), col("lang")),
          rewards("item_id") === col("doc_id"))
        .join(lm, Seq("doc_id"), "left")
        .select(col("lang").as("group_id"), col("item_id"),
          col("bt_ppm").as("reward_ppm"),
          (lit(1000000L) - coalesce(col("score_ppm"), lit(0L))).as("kl_ppm"))
      Rlhf.klBestOfN(rows, betaPpm = 500000L, k = 2).orderBy("group_id", "rnk")
    },

    // DATA-CONSTRAINED EPOCH PLAN (round 13): the mixture-EXECUTION
    // step after q177's reweighting — water-fill a 2×-corpus token
    // budget across sources proportionally to the MW weights, capping
    // every source at 2.1 epochs of its own tokens (the Muennighoff
    // data-constrained rule); capped excess redistributes among
    // uncapped sources, iterated to fixpoint. Budget is data-derived
    // on BOTH sides (scalar subquery / one bounded aggregate), and the
    // oracle unrolls all 6 water-filling rounds in fixed-point CTEs.
    Q("q182_epoch_plan",
      s"""WITH $ttrCtes,
        | dl AS MATERIALIZED (SELECT source AS domain,
        |        CAST(1000000 - (sum(reward_ppm) // count(*)) AS BIGINT) AS loss_ppm
        |       FROM ttr GROUP BY 1),
        |""".stripMargin + Rlhf.domainMixtureMWSql(iters = 10, etaPpm = 300000L) + """,
        | tok AS MATERIALIZED (SELECT source AS domain,
        |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |       FROM documents GROUP BY 1),
        | ep0 AS MATERIALIZED (SELECT t.domain, t.tokens, m.weight_ppm
        |       FROM tok t JOIN mw m ON m.domain = t.domain),
        |""".stripMargin +
        Corpus.epochPlanSql(budgetSql = "(SELECT 2 * sum(tokens) FROM ep0)",
          maxEpochsPpm = 2100000L, iters = 6) + """
        |SELECT domain AS source, tokens, weight_ppm, alloc_tokens, epochs_ppm,
        | CAST(CASE WHEN capped THEN 1 ELSE 0 END AS BIGINT) AS capped
        |FROM ep ORDER BY source""".stripMargin
    ) { (s, dir) =>
      val dl = ttrDf(s, dir).groupBy(col("source").as("domain"))
        .agg(expr("CAST(1000000L - (sum(reward_ppm) DIV count(1)) AS BIGINT)")
          .as("loss_ppm"))
      val mw = Rlhf.domainMixtureMW(dl, iters = 10, etaPpm = 300000L)
        .select("domain", "weight_ppm")
      val tok = Tables(s, dir, "documents")
        .select(col("source").as("domain"),
          size(split(col("text"), " ")).cast("long").as("__t"))
        .groupBy("domain").agg(sum("__t").as("tokens"))
      val ep0 = graft.llm.Stage(tok.join(mw, Seq("domain")))
      // the SAME scalar the oracle's subquery computes — one aggregate
      // over the bounded domain table, never corpus-scale
      val budget = 2L * ep0.agg(sum("tokens")).head().getLong(0)
      Corpus.epochPlan(ep0, budget, maxEpochsPpm = 2100000L, iters = 6)
        .select(col("domain").as("source"), col("tokens"), col("weight_ppm"),
          col("alloc_tokens"), col("epochs_ppm"),
          col("capped").cast("long").as("capped"))
        .orderBy("source")
    },

    // STRIDE-SCHEDULED MIXTURE INTERLEAVING (round 13): the
    // deterministic training ORDER q177's weights imply — per-source
    // rank by the PolyHash shuffle order, virtual time r·scale²/w
    // (lottery-stride in integer fixed-point), global position by
    // (v, source, doc_id). A double-weight source appears twice as
    // often in every window of the stream. The oracle replays both
    // windows and the stride arithmetic row for row.
    Q("q183_stride_interleave",
      s"""WITH $ttrCtes,
        | dl AS MATERIALIZED (SELECT source AS domain,
        |        CAST(1000000 - (sum(reward_ppm) // count(*)) AS BIGINT) AS loss_ppm
        |       FROM ttr GROUP BY 1),
        |""".stripMargin + Rlhf.domainMixtureMWSql(iters = 10, etaPpm = 300000L) + s""",
        | h2 AS (SELECT doc_id, source, $polyHashSql AS hv FROM documents),
        | rr AS (SELECT doc_id, source, CAST(row_number() OVER (
        |         PARTITION BY source ORDER BY hv, doc_id) AS BIGINT) AS r
        |       FROM h2),
        | vv AS (SELECT rr.doc_id, rr.source, rr.r,
        |        r * 1000000 * 1000000 // greatest(m.weight_ppm, 1) AS v
        |       FROM rr JOIN mw m ON m.domain = rr.source)
        |SELECT CAST(row_number() OVER (ORDER BY v, source, doc_id) AS BIGINT) AS pos,
        | doc_id, source, r, v
        |FROM vv ORDER BY pos""".stripMargin
    ) { (s, dir) =>
      val dl = ttrDf(s, dir).groupBy(col("source").as("domain"))
        .agg(expr("CAST(1000000L - (sum(reward_ppm) DIV count(1)) AS BIGINT)")
          .as("loss_ppm"))
      val mw = Rlhf.domainMixtureMW(dl, iters = 10, etaPpm = 300000L)
        .select(col("domain").as("source"), col("weight_ppm"))
      Corpus.strideInterleave(
          Tables(s, dir, "documents").select("doc_id", "source"),
          "source", mw)
        .orderBy("pos")
    },

    // EPOCH-PLAN-CONSTRAINED INTERLEAVE (round 14) — the mixture-
    // execution arc CLOSED: q177's DoReMi weights → q182's water-filled
    // allocations → the budget-capped training stream itself. Each
    // source's docs are admitted in q183's stride order while the
    // running token total has not crossed its alloc (tokenBudgetMix's
    // crossing-once convention), and the global dense position is
    // recomputed over the survivors with the same range-partition +
    // offsets core (no single-reducer window). The oracle replays the
    // whole composition: MW rounds, 6 water-fill rounds, both windows,
    // the cumsum gate, and the final renumbering.
    Q("q188_planned_interleave",
      s"""WITH $ttrCtes,
        | dl AS MATERIALIZED (SELECT source AS domain,
        |        CAST(1000000 - (sum(reward_ppm) // count(*)) AS BIGINT) AS loss_ppm
        |       FROM ttr GROUP BY 1),
        |""".stripMargin + Rlhf.domainMixtureMWSql(iters = 10, etaPpm = 300000L) + """,
        | tok AS MATERIALIZED (SELECT source AS domain,
        |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |       FROM documents GROUP BY 1),
        | ep0 AS MATERIALIZED (SELECT t.domain, t.tokens, m.weight_ppm
        |       FROM tok t JOIN mw m ON m.domain = t.domain),
        |""".stripMargin +
        Corpus.epochPlanSql(budgetSql = "(SELECT 2 * sum(tokens) FROM ep0)",
          maxEpochsPpm = 2100000L, iters = 6) + s""",
        | h2 AS (SELECT doc_id, source,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |        $polyHashSql AS hv FROM documents),
        | rr AS (SELECT doc_id, source, nt, CAST(row_number() OVER (
        |         PARTITION BY source ORDER BY hv, doc_id) AS BIGINT) AS r
        |       FROM h2),
        | vv AS (SELECT rr.doc_id, rr.source, rr.nt, rr.r,
        |        r * 1000000 * 1000000 // greatest(m.weight_ppm, 1) AS v
        |       FROM rr JOIN mw m ON m.domain = rr.source),
        | cc AS (SELECT vv.*, ep.alloc_tokens,
        |        sum(nt) OVER (PARTITION BY source ORDER BY r) AS cum
        |       FROM vv JOIN ep ON ep.domain = vv.source),
        | keep AS (SELECT * FROM cc WHERE cum - nt < alloc_tokens)
        |SELECT CAST(row_number() OVER (ORDER BY v, source, doc_id) AS BIGINT) AS pos,
        | doc_id, source, r, v, nt AS n_tokens
        |FROM keep ORDER BY pos""".stripMargin
    ) { (s, dir) =>
      val dl = ttrDf(s, dir).groupBy(col("source").as("domain"))
        .agg(expr("CAST(1000000L - (sum(reward_ppm) DIV count(1)) AS BIGINT)")
          .as("loss_ppm"))
      val mw = Rlhf.domainMixtureMW(dl, iters = 10, etaPpm = 300000L)
        .select("domain", "weight_ppm")
      val docs = Tables(s, dir, "documents")
      val tok = docs.select(col("source").as("domain"),
          size(split(col("text"), " ")).cast("long").as("__t"))
        .groupBy("domain").agg(sum("__t").as("tokens"))
      val ep0 = graft.llm.Stage(tok.join(mw, Seq("domain")))
      val budget = 2L * ep0.agg(sum("tokens")).head().getLong(0)
      val plan = Corpus.epochPlan(ep0, budget, maxEpochsPpm = 2100000L, iters = 6)
      Corpus.plannedInterleave(
          docs.select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          "source", mw.select(col("domain").as("source"), col("weight_ppm")),
          plan.select("domain", "alloc_tokens"))
        .orderBy("pos")
    },

    // MAINTAINED DOMAIN-MIXTURE STATE (round-13 judge task 4): q177/
    // q182 computed their per-domain loss/token aggregates one-shot;
    // here the same decision chain runs off the MERGEABLE mixture
    // statistic (domain, sum_reward_ppm, n_docs, tokens) folded from
    // three corpus batches (doc_id mod 3) — the state RollupIngest
    // maintains behind its snapshot commit — so a DoReMi reweighting +
    // data-constrained epoch plan refreshes per ingest batch without
    // rescanning history. The oracle computes the ONE-SHOT aggregates
    // and replays MW + water-fill CTE for CTE: the hash itself proves
    // fold == one-shot. Budget 3× corpus tokens, caps at 2.5 epochs —
    // deliberately distinct from q182's knobs.
    Q("q184_maintained_mixture",
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS l FROM documents),
        | s0 AS (SELECT doc_id, source,
        |        CAST(len(list_distinct(l)) AS BIGINT) * 1000000
        |          // greatest(len(l), 1) AS reward_ppm,
        |        CAST(len(l) AS BIGINT) AS n_tokens FROM t),
        | st AS MATERIALIZED (SELECT source AS domain,
        |        CAST(sum(reward_ppm) AS BIGINT) AS sum_reward_ppm,
        |        CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(n_tokens) AS BIGINT) AS tokens
        |       FROM s0 GROUP BY 1),
        | dl AS MATERIALIZED (SELECT domain,
        |        CAST(1000000 - (sum_reward_ppm // greatest(n_docs, 1)) AS BIGINT)
        |          AS loss_ppm FROM st),
        |""".stripMargin + Rlhf.domainMixtureMWSql(iters = 10, etaPpm = 300000L) + """,
        | ep0 AS MATERIALIZED (SELECT st.domain, st.tokens, mw.weight_ppm
        |       FROM st JOIN mw USING (domain)),
        |""".stripMargin +
        Corpus.epochPlanSql(budgetSql = "(SELECT 3 * sum(tokens) FROM ep0)",
          maxEpochsPpm = 2500000L, iters = 6) + """
        |SELECT domain AS source, tokens, weight_ppm, alloc_tokens, epochs_ppm,
        | CAST(CASE WHEN capped THEN 1 ELSE 0 END AS BIGINT) AS capped
        |FROM ep ORDER BY source""".stripMargin
    ) { (s, dir) =>
      val scored = ttrDf(s, dir).select(col("doc_id"),
        col("source").as("domain"), col("reward_ppm"),
        size(col("l")).cast("long").as("n_tokens"))
      val folded = Rlhf.mergeMixtureState((0 to 2).map(i =>
        Rlhf.mixtureState(scored.filter(col("doc_id") % 3 === i))))
      Rlhf.mixturePlanFromState(folded,
          budgetFactorPpm = 3000000L, maxEpochsPpm = 2500000L)
        .select(col("domain").as("source"), col("tokens"), col("weight_ppm"),
          col("alloc_tokens"), col("epochs_ppm"),
          col("capped").cast("long").as("capped"))
        .orderBy("source")
    },

    // RLHF CAPSTONE (round-13 judge task 3) — the family end to end,
    // the way q121/q129 compose curation: q174's weakly-supervised
    // preference pairs (near-dup renderings + LM-quality gap) feed a
    // 3-batch btState fold (the PreferenceStore statistic), the merged
    // state fits Bradley–Terry rewards, q181's KL-regularized best-of-1
    // picks each source's winner against the bigram-LM divergence
    // proxy, and the winners become q175-style prompt-masked SFT pairs.
    // One oracle statement replays the whole chain (pair pipeline, LM
    // retrain, gap arithmetic, 8 MM rounds, the objective window, and
    // every slice/mask string); the 3-batch fold is oracle-invisible —
    // hash equality IS the fold == one-shot proof at capstone scope.
    Q("q185_rlhf_capstone",
      s"""WITH ${PipelineQueries.pairCtes},
        | t2 AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        | bg2 AS (SELECT doc_id, s.w1 AS w1, s.gram AS gram
        |        FROM (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |            i -> {'w1': l[i], 'gram': l[i] || ' ' || l[i+1]})) AS s
        |          FROM t2 WHERE len(l) >= 2)),
        | cb2 AS (SELECT gram, count(*) AS cb FROM bg2 GROUP BY 1),
        | cu2 AS (SELECT w1, count(*) AS cu FROM bg2 GROUP BY 1),
        | sc AS MATERIALIZED (SELECT b.doc_id,
        |         CAST(sum((cb2.cb * 1000000) // cu2.cu) // count(*) AS BIGINT) AS s
        |        FROM bg2 b JOIN cb2 USING (gram) JOIN cu2 USING (w1)
        |        GROUP BY b.doc_id),
        | g AS (SELECT p.id_a, p.id_b, a.s AS s_a, c.s AS s_b,
        |        abs(a.s - c.s) AS gap_ppm
        |       FROM pairs p JOIN sc a ON a.doc_id = p.id_a
        |        JOIN sc c ON c.doc_id = p.id_b),
        | comp AS MATERIALIZED (SELECT
        |        CASE WHEN s_a > s_b OR (s_a = s_b AND id_a < id_b)
        |             THEN id_a ELSE id_b END AS winner_id,
        |        CASE WHEN s_a > s_b OR (s_a = s_b AND id_a < id_b)
        |             THEN id_b ELSE id_a END AS loser_id
        |       FROM g WHERE gap_ppm >= 1000),
        |""".stripMargin + Rlhf.bradleyTerrySql(iters = 8) + """,
        | cand AS (SELECT d.source AS group_id, bt.item_id,
        |          bt.bt_ppm AS reward_ppm,
        |          1000000 - coalesce(s2.s, CAST(0 AS BIGINT)) AS kl_ppm
        |         FROM bt JOIN documents d ON d.doc_id = bt.item_id
        |          LEFT JOIN sc s2 ON s2.doc_id = bt.item_id),
        | obj AS (SELECT group_id, item_id, reward_ppm, kl_ppm,
        |          reward_ppm - 500000 * kl_ppm // 1000000 AS obj_ppm
        |         FROM cand),
        | win AS (SELECT group_id, item_id, reward_ppm, obj_ppm,
        |          CAST(row_number() OVER (PARTITION BY group_id
        |            ORDER BY obj_ppm DESC, item_id) AS BIGINT) AS rnk
        |         FROM obj QUALIFY rnk <= 1),
        | m AS (SELECT w.group_id, w.item_id AS doc_id, w.reward_ppm,
        |        w.obj_ppm, t2.l, CAST(len(t2.l) AS BIGINT) AS n_tokens,
        |        CASE WHEN len(t2.l) = 1 THEN CAST(0 AS BIGINT)
        |             ELSE greatest(CAST(1 AS BIGINT),
        |               least(CAST(len(t2.l) - 1 AS BIGINT),
        |                 CAST(len(t2.l) AS BIGINT) * 500 // 1000)) END AS prompt_len
        |       FROM win w JOIN t2 ON t2.doc_id = w.item_id
        |       WHERE len(t2.l) >= 1)
        |SELECT group_id, doc_id, reward_ppm, obj_ppm, n_tokens, prompt_len,
        | coalesce(array_to_string(l[1:CAST(prompt_len AS INTEGER)], ' '), '')
        |   AS prompt_text,
        | array_to_string(l[CAST(prompt_len + 1 AS INTEGER):CAST(n_tokens AS INTEGER)], ' ')
        |   AS target_text,
        | array_to_string(list_transform(range(1, CAST(n_tokens + 1 AS INTEGER)),
        |   p -> CASE WHEN p <= prompt_len THEN '0' ELSE '1' END), ' ') AS loss_mask
        |FROM m ORDER BY group_id, doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.llm.{Dedup, TextAnalysis}
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, 3, maxShingleDf = 64L)
        .filter(col("jaccard_ppm") >= 300000L)
      val lm = TextAnalysis.bigramLmScore(docs).select("doc_id", "score_ppm")
      val pref = Corpus.preferencePairs(pairs, lm, minGapPpm = 1000L)
      // 3-batch fold of the BT sufficient statistic — the
      // PreferenceStore ingest shape, proven == one-shot by the hash
      val folded = Rlhf.mergeBtState((0 to 2).map(i =>
        Rlhf.btState(pref.filter(
          pmod(col("chosen_id") + col("rejected_id"), lit(3)) === i)
          .select(col("chosen_id").as("winner_id"),
            col("rejected_id").as("loser_id")))))
      val rewards = Rlhf.fitFromState(folded, iters = 8)
      val cand = rewards
        .join(docs.select(col("doc_id"), col("source")),
          rewards("item_id") === col("doc_id"))
        .join(lm, Seq("doc_id"), "left")
        .select(col("source").as("group_id"), col("item_id"),
          col("bt_ppm").as("reward_ppm"),
          (lit(1000000L) - coalesce(col("score_ppm"), lit(0L))).as("kl_ppm"))
      val winners = Rlhf.klBestOfN(cand, betaPpm = 500000L, k = 1)
      val winDocs = docs.join(winners.select(col("item_id").as("doc_id"),
        col("group_id"), col("reward_ppm"), col("obj_ppm")), Seq("doc_id"))
      Corpus.sftLossMaskPairs(winDocs, promptPermille = 500)
        .join(winners.select(col("item_id").as("doc_id"), col("group_id"),
          col("reward_ppm"), col("obj_ppm")), Seq("doc_id"))
        .select(col("group_id"), col("doc_id"), col("reward_ppm"),
          col("obj_ppm"), col("n_tokens"), col("prompt_len"),
          col("prompt_text"), col("target_text"), col("loss_mask"))
        .orderBy("group_id", "doc_id")
    }
  )
}
