package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.Dedup
import graft.operators.{MergeOps, RangeJoin, SkewJoin}

/** Round-2 widening of the relational surface: range/interval join,
  * discrete percentiles, salted skew join, BPE-ish regex tokenization,
  * RANGE window frames, ntile distribution. Same determinism rules as
  * [[Q]] — exact integer outputs, total ORDER BY.
  */
object ExtendedQueries {

  private val HOUR_NS = 3600000000000L

  val all: Seq[Q] = Seq(

    // Funnel conversion: purchases preceded by a same-user view within
    // the hour — a keyed interval LEFT SEMI join (the event-sequence
    // pattern), aggregated per user.
    // µs precision on both sides: the oracle engine reads the TIMESTAMP
    // (NANOS) column µs-truncated, so comparisons and outputs use
    // ts_ns DIV 1000 = its epoch_us exactly (floor truncation commutes
    // with min and with the window bounds).
    Q("q81_funnel",
      """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS p_us FROM events
        |           WHERE event_type = 'purchase'),
        | v AS (SELECT user_id, epoch_us(ts) AS v_us FROM events
        |       WHERE event_type = 'view'),
        | conv AS (SELECT * FROM p WHERE EXISTS (
        |   SELECT 1 FROM v WHERE v.user_id = p.user_id
        |    AND v.v_us <= p.p_us AND p.p_us <= v.v_us + 3600000000))
        |SELECT user_id, count(*) AS n_conversions,
        | CAST(min(p_us) AS BIGINT) AS first_conv_us
        |FROM conv GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"),
          expr("ts_ns DIV 1000").as("v_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          expr("ts_ns DIV 1000").as("p_us"))
      purchases.join(views,
          col("user_id") === col("v_user")
            && col("v_us") <= col("p_us")
            && col("p_us") <= col("v_us") + (HOUR_NS / 1000L), "left_semi")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_conversions"),
          min("p_us").as("first_conv_us"))
        .orderBy("user_id")
    },

    // Weekly retention cohorts: cohort = integer week of a user's first
    // event (epoch ns DIV week-ns — exact), activity = distinct active
    // weeks per user; counts per (cohort, offset). Two aggregates and
    // one join keyed by user — no sessionization state needed.
    Q("q82_retention",
      """WITH f AS (SELECT user_id, min(epoch_us(ts)) // 604800000000 AS w0
        |           FROM events GROUP BY user_id),
        | a AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w
        |       FROM events)
        |SELECT CAST(f.w0 AS BIGINT) AS cohort_week,
        | CAST(a.w - f.w0 AS BIGINT) AS week_offset,
        | count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
      // DIV, not /: epoch values exceed 2^53, double division would
      // corrupt the week index; µs on both sides (see q81 note)
      val first = ev.groupBy("user_id")
        .agg(expr("min(ts_ns DIV 1000) DIV 604800000000").as("w0"))
      val active = ev.select(col("user_id"),
        expr("ts_ns DIV 1000 DIV 604800000000").as("w")).distinct()
      active.join(first, Seq("user_id"))
        .groupBy(col("w0").as("cohort_week"), (col("w") - col("w0")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },

    // SCD2 history build (MergeOps.scd2History): the change stream as
    // slowly-changing-dimension rows — per-user versions with
    // [valid_from, valid_to) intervals, current row open-ended. The
    // reference's mirror keeps only latest state (postgres.ts upsert);
    // this is the history-preserving sink mode. One keyed window.
    Q("q91_scd2_history",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        | v AS (SELECT user_id, event_id, ts_us,
        |        CAST(row_number() OVER w AS BIGINT) AS version,
        |        lead(ts_us) OVER w AS valid_to
        |       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id, event_id, version,
        |       CAST(ts_us AS BIGINT) AS valid_from_us,
        |       CAST(valid_to AS BIGINT) AS valid_to_us,
        |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        expr("ts_ns DIV 1000").as("ts_us"))
      MergeOps.scd2History(ev, Seq("user_id"), "ts_us", Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("version"),
          col("valid_from").as("valid_from_us"),
          col("valid_to").as("valid_to_us"),
          col("is_current").cast("long").as("is_current"))
        .orderBy("user_id", "version")
    },

    // Point-in-time FACT ENRICHMENT against SCD2 history — the
    // warehouse-canon temporal dimension join: each purchase picks up
    // the user's dimension version (built from their NON-purchase
    // events) valid AT purchase time. Keyed join on user_id + interval
    // predicates (never cartesian); facts before any version keep -1.
    Q("q107_scd2_asof_enrich",
      """WITH d AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type <> 'purchase'),
        | v AS (SELECT user_id, event_id, ts_us,
        |        CAST(row_number() OVER w AS BIGINT) AS version,
        |        lead(ts_us) OVER w AS valid_to
        |       FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        | f AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_ts
        |       FROM events WHERE event_type = 'purchase')
        |SELECT f.purchase_id, f.user_id,
        | CAST(coalesce(v.version, -1) AS BIGINT) AS version,
        | CAST(coalesce(v.event_id, -1) AS BIGINT) AS dim_event_id
        |FROM f LEFT JOIN v ON v.user_id = f.user_id AND v.ts_us <= f.p_ts
        |  AND (v.valid_to IS NULL OR f.p_ts < v.valid_to)
        |ORDER BY f.purchase_id""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts_ns DIV 1000").as("ts_us"))
      // rename the dimension side's key (q81's pattern): both frames
      // share ev's lineage, and a same-exprId equality would lean on
      // analyzer self-join disambiguation — fragile across refactors
      val hist = MergeOps.scd2History(
          ev.filter(col("event_type") =!= "purchase"),
          Seq("user_id"), "ts_us", Seq("event_id"))
        .select(col("user_id").as("h_user"), col("event_id").as("dim_event_id0"),
          col("version").as("version0"), col("valid_from"), col("valid_to"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("p_ts"))
      facts.join(hist,
          col("user_id") === col("h_user") &&
            col("valid_from") <= col("p_ts") &&
            (col("valid_to").isNull || col("p_ts") < col("valid_to")), "left")
        .select(col("purchase_id"), col("user_id"),
          coalesce(col("version0"), lit(-1L)).as("version"),
          coalesce(col("dim_event_id0"), lit(-1L)).as("dim_event_id"))
        .orderBy("purchase_id")
    },

    // Interval join (RangeJoin.intervalJoin): same-user clicks in the
    // hour before each purchase. The reference has no range joins (§2.3)
    // — this is part of the "relational surface beyond the mirror".
    Q("q43_range_join",
      """SELECT p.event_id AS purchase_id, count(*) AS n_clicks, min(c.event_id) AS first_click_id
        |FROM (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events WHERE event_type = 'click') c
        | ON c.user_id = p.user_id AND c.tns >= p.tns - 3600000000000 AND c.tns <= p.tns
        |GROUP BY purchase_id ORDER BY purchase_id""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_ns"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_ns").as("c_ts"))
      RangeJoin.intervalJoin(purchases, clicks, Seq("user_id"),
          col("ts_ns") - HOUR_NS, col("ts_ns"), clicks("c_ts"))
        .groupBy("purchase_id")
        .agg(count(lit(1)).as("n_clicks"), min("click_id").as("first_click_id"))
        .orderBy("purchase_id")
    },

    // Discrete percentiles by explicit rank arithmetic — the
    // nearest-rank-below definition (index floor((n-1)q), 0-based) is
    // pure integer selection, so it cross-checks exactly where
    // interpolating percentile_cont could differ in ulps.
    Q("q44_percentile_disc",
      """WITH x AS (SELECT event_type, CAST(round(value*100.0) AS BIGINT) AS cents,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY CAST(round(value*100.0) AS BIGINT), event_id) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events)
        |SELECT event_type,
        | max(CASE WHEN rn = ((n-1)*50)//100 + 1 THEN cents END) AS p50_cents,
        | max(CASE WHEN rn = ((n-1)*90)//100 + 1 THEN cents END) AS p90_cents,
        | max(CASE WHEN rn = ((n-1)*99)//100 + 1 THEN cents END) AS p99_cents
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val cents = round(col("value") * lit(100.0)).cast("long")
      val w = Window.partitionBy("event_type").orderBy(col("cents"), col("event_id"))
      val wc = Window.partitionBy("event_type")
      val ranked = Tables.events(s, dir)
        .select(col("event_type"), cents.as("cents"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wc))
      def pick(q: Int, alias: String) =
        max(when(col("rn") === expr(s"((n-1)*$q) DIV 100 + 1"), col("cents"))).as(alias)
      ranked.groupBy("event_type")
        .agg(pick(50, "p50_cents"), pick(90, "p90_cents"), pick(99, "p99_cents"))
        .orderBy("event_type")
    },

    // Salted skew join (SkewJoin.saltedInnerJoin): result must equal the
    // plain join — the oracle IS the plain join, proving salting is a
    // pure physical rewrite.
    Q("q45_salted_join",
      """SELECT c_nationkey, count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice*1000000.0) AS BIGINT)) AS BIGINT) AS total_micros
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
    ) { (s, dir) =>
      SkewJoin.saltedInnerJoin(
          Tables(s, dir, "orders").withColumnRenamed("o_custkey", "c_custkey"),
          Tables(s, dir, "customer"), "c_custkey", saltSource = "o_orderkey")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * lit(1000000.0)).cast("long")).as("total_micros"))
        .orderBy("c_nationkey")
    },

    // BPE-ish regex tokenization (mandate: "whitespace + a BPE-ish
    // regex"): runs of letters, runs of digits, single other non-space —
    // the GPT-2-style pre-tokenizer shape, minus unicode categories.
    Q("q46_regex_tokens",
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_pieces,
        | CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha,
        | CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents").select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n_pieces"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long").as("n_alpha"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).cast("long").as("n_num"))
        .orderBy("doc_id")
    },

    // RANGE window frame over event time: per event, same-user activity
    // in the trailing hour (value-based frame, not row-based).
    Q("q47_range_frame",
      """SELECT event_id,
        | CAST(count(*) OVER w AS BIGINT) AS cnt_1h,
        | CAST(sum(CAST(round(value*100.0) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
        |             RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts_ns")
        .rangeBetween(-HOUR_NS, 0)
      Tables.events(s, dir)
        .withColumn("cnt_1h", count(lit(1)).over(w))
        .withColumn("cents_1h", sum(round(col("value") * lit(100.0)).cast("long")).over(w))
        .select("event_id", "cnt_1h", "cents_1h")
        .orderBy("event_id")
    },

    // Array-column aggregation: per-label embedding component sums in
    // exact scaled integers (float→double is exact, round-to-micros then
    // integer-sum is order-independent — a float sum would hash-differ by
    // summation order).
    Q("q49_embedding_stats",
      """SELECT label, count(*) AS n,
        | CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS d0_micros,
        | CAST(sum(CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS d1_micros,
        | CAST(sum(CAST(round(CAST(embedding[3] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS d2_micros,
        | CAST(sum(CAST(round(CAST(embedding[4] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS d3_micros
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
    ) { (s, dir) =>
      def dMicros(i: Int) =
        sum(round(element_at(col("embedding"), i + 1).cast("double") * lit(1000000.0))
          .cast("long")).as(s"d${i}_micros")
      Tables(s, dir, "embeddings")
        .groupBy("label")
        .agg(count(lit(1)).as("n"), dMicros(0), dMicros(1), dMicros(2), dMicros(3))
        .orderBy("label")
    },

    // The dedup *materialization* step: keep one representative per exact
    // text group (min doc_id) — the filter a training pipeline actually
    // applies after dedup analysis. Broadcast-free: semi-join on
    // (text-hash, doc_id) pairs from the same aggregate.
    Q("q50_dedup_filter",
      """SELECT d.doc_id FROM documents d
        |JOIN (SELECT min(doc_id) AS rep_id FROM documents GROUP BY text) r
        | ON d.doc_id = r.rep_id
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val reps = Dedup.exact(docs).select(col("rep_id").as("doc_id"))
      docs.join(reps, Seq("doc_id"), "left_semi")
        .select("doc_id")
        .orderBy("doc_id")
    },

    // GROUPING SETS (the general form; q05/q39 cover its rollup/cube
    // specializations) with grouping_id to disambiguate null-vs-ALL.
    Q("q51_grouping_sets",
      """SELECT coalesce(o_orderstatus, '-') AS status,
        | coalesce(o_orderpriority, '-') AS priority,
        | CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        | count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, status, priority""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        // grouping() is only resolvable inside the grouping aggregate
        .agg(count(lit(1)).as("n"),
          (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast("long").as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("-")).as("status"),
          coalesce(col("o_orderpriority"), lit("-")).as("priority"),
          col("gid"), col("n"))
        .orderBy("gid", "status", "priority")
    },

    // Array functions over tokenized text: sort/distinct/slice/join —
    // deterministic string outputs on both engines.
    Q("q52_array_ops",
      """SELECT doc_id,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        | array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3,
        | array_to_string(list_reverse_sort(list_distinct(string_split(text, ' ')))[1:2], ',') AS last2
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val toks = array_distinct(split(col("text"), " "))
      Tables(s, dir, "documents").select(col("doc_id"),
          size(toks).cast("long").as("n_distinct"),
          concat_ws(",", slice(array_sort(toks), 1, 3)).as("first3"),
          concat_ws(",", slice(reverse(array_sort(toks)), 1, 2)).as("last2"))
        .orderBy("doc_id")
    },

    // Temporal extraction + aggregation (year/month are timezone-free on
    // both engines; day-of-week numbering differs cross-engine, so it is
    // deliberately excluded).
    Q("q53_date_extract",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        | CAST(month(o_orderdate) AS BIGINT) AS m, count(*) AS n,
        | CAST(sum(CAST(round(o_totalprice*100.0) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * lit(100.0)).cast("long")).as("cents"))
        .orderBy("y", "m")
    },

    // Fuzzy string matching: Levenshtein edit distance (same metric
    // definition on both engines) of each doc's prefix against a probe —
    // the data-cleaning primitive for near-match joins.
    Q("q54_edit_distance",
      """SELECT doc_id,
        | CAST(levenshtein(substr(text, 1, 20), 'the quick brown fox') AS BIGINT) AS dist
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents").select(col("doc_id"),
          levenshtein(substring(col("text"), 1, 20), lit("the quick brown fox"))
            .cast("long").as("dist"))
        .orderBy("doc_id")
    },

    // ntile quartiles (deterministic under a total ORDER BY) summarized
    // per bucket.
    Q("q48_ntile",
      """WITH x AS (SELECT event_type, CAST(round(value*100.0) AS BIGINT) AS cents,
        |  ntile(4) OVER (PARTITION BY event_type
        |    ORDER BY CAST(round(value*100.0) AS BIGINT), event_id) AS quartile
        | FROM events)
        |SELECT event_type, quartile, count(*) AS n,
        | min(cents) AS min_cents, max(cents) AS max_cents
        |FROM x GROUP BY event_type, quartile ORDER BY event_type, quartile""".stripMargin
    ) { (s, dir) =>
      val cents = round(col("value") * lit(100.0)).cast("long")
      val w = Window.partitionBy("event_type").orderBy(col("cents"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_type"), cents.as("cents"), col("event_id"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .groupBy("event_type", "quartile")
        .agg(count(lit(1)).as("n"), min("cents").as("min_cents"), max("cents").as("max_cents"))
        .orderBy("event_type", "quartile")
    }
  )
}
