package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.IncrementalAgg

/** The relational surface the reference delegates to its Postgres mirror
  * (SURVEY §2.9): scans, filters, equi-joins, aggregates (incl. rollup /
  * pivot / conditional), windows, sorts/limits/top-k, set ops, distinct.
  * Here that surface is native Catalyst over the synced tables.
  *
  * Money math: `round(x * 1e6) → BIGINT` ("micros"). The doubles carry
  * exact ≤6-decimal values, so scaling+rounding is exact and the integer
  * sums are order-independent — hash-identical to the DuckDB oracle.
  */
object AnalyticsQueries {

  /** micros(x) — exact scaled-integer money. */
  private def micros(c: org.apache.spark.sql.Column) =
    round(c * lit(1000000.0)).cast("long")

  val all: Seq[Q] = Seq(

    Q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(round(l_quantity*1000000.0) AS BIGINT)) AS BIGINT) AS sum_qty_micros,
        | CAST(sum(CAST(round(l_extendedprice*1000000.0) AS BIGINT)) AS BIGINT) AS sum_base_micros,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*1000000.0) AS BIGINT)) AS BIGINT) AS sum_disc_micros,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*1000000.0) AS BIGINT)) AS BIGINT) AS sum_charge_micros,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(micros(col("l_quantity"))).as("sum_qty_micros"),
          sum(micros(col("l_extendedprice"))).as("sum_base_micros"),
          sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_micros"),
          sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge_micros"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    Q("q02_revenue_by_nation",
      """SELECT n_name,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*1000000.0) AS BIGINT)) AS BIGINT) AS revenue_micros
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue_micros DESC, n_name""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"))
        .orderBy(col("revenue_micros").desc, col("n_name"))
    },

    Q("q03_top_orders",
      """WITH r AS (SELECT l_orderkey,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*1000000.0) AS BIGINT)) AS BIGINT) AS revenue_micros
        | FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderkey, o_orderdate, revenue_micros
        |FROM r JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY revenue_micros DESC, o_orderkey LIMIT 10""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("revenue_micros"))
        .orderBy(col("revenue_micros").desc, col("o_orderkey"))
        .limit(10)
    },

    Q("q04_order_rank_window",
      """SELECT o_custkey, o_orderkey, rnk FROM (
        | SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        | FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rnk", rank().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
        .orderBy("o_custkey", "rnk", "o_orderkey")
    },

    Q("q05_rollup",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice*1000000.0) AS BIGINT)) AS BIGINT) AS total_micros
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum(micros(col("o_totalprice"))).as("total_micros"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total_micros"))
        .orderBy("status", "priority")
    },

    Q("q06_distinct_counts",
      """SELECT count(DISTINCT l_partkey) AS d_parts, count(DISTINCT l_suppkey) AS d_supps,
        | count(DISTINCT l_orderkey) AS d_orders, count(*) AS n FROM lineitem""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("d_parts"),
        countDistinct(col("l_suppkey")).as("d_supps"),
        countDistinct(col("l_orderkey")).as("d_orders"),
        count(lit(1)).as("n"))
    },

    Q("q07_customers_no_orders",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    Q("q08_parts_high_qty",
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 48.0)
        |ORDER BY p_partkey""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "part")
        .join(Tables(s, dir, "lineitem").filter(col("l_quantity") >= 48.0).select("l_partkey"),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    Q("q09_set_ops",
      """SELECT 'only_f' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'both' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY tag, o_custkey""".stripMargin
    ) { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      val op = o.filter(col("o_orderstatus") === "O").select("o_custkey")
      f.except(op).withColumn("tag", lit("only_f"))
        .union(f.intersect(op).withColumn("tag", lit("both")))
        .select("tag", "o_custkey")
        .orderBy("tag", "o_custkey")
    },

    Q("q10_conditional_agg",
      """SELECT o_orderpriority, count(*) AS n,
        | CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        | CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN CAST(round(o_totalprice*1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS big_total_micros
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_totalprice") > 150000.0, 1L).otherwise(0L)).as("n_big"),
          sum(when(col("o_totalprice") > 150000.0, micros(col("o_totalprice"))).otherwise(0L)).as("big_total_micros"))
        .orderBy("o_orderpriority")
    },

    Q("q11_shipdate_range",
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(CAST(round(l_quantity*100.0) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * lit(100.0)).cast("long")).as("qty_cents"))
        .orderBy("l_returnflag")
    },

    Q("q39_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice*1000000.0) AS BIGINT)) AS BIGINT) AS total_micros
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum(micros(col("o_totalprice"))).as("total_micros"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total_micros"))
        .orderBy("status", "priority")
    },

    // HLL sketch — graft's own portable HyperLogLog
    // ([[graft.functions.HyperLogLog]]): poly_hash registers + an
    // all-integer estimator, so the DuckDB oracle replays the sketch
    // bit-for-bit (Spark's approx_count_distinct sketch is
    // engine-internal and could only ever be range-checked).
    // Estimator regime: raw HLL with m=1024 registers needs distinct
    // counts per group ≳ 2.5·m ≈ 2,560 to be meaningful (no
    // linear-counting branch — it would need ln(), which is not
    // cross-engine-exact). Per returnflag the true counts are:
    // sf0.001 → 200 parts / ~1.1k orders (both OUT of regime, estimates
    // collapse toward ~0.72·m ≈ 738 regardless of truth); sf0.01 →
    // 2k parts (borderline) / 11k orders (in regime); sf0.1 → 20k /
    // 110k (both in regime). Every SF still hash-matches the oracle —
    // both engines compute the identical sketch — but as a cardinality
    // SIGNAL trust q40 from sf0.1 up. Smoke reads at sf0.001 check
    // plumbing only.
    Q("q40_approx_distinct", {
      val parts = graft.functions.HyperLogLog.sketchSql(
        "l_returnflag", "l_partkey", "lineitem", "approx_parts")
      val orders = graft.functions.HyperLogLog.sketchSql(
        "l_returnflag", "l_orderkey", "lineitem", "approx_orders")
      s"""SELECT p.g AS l_returnflag, p.approx_parts, o.approx_orders
         |FROM $parts p JOIN $orders o ON p.g = o.g
         |ORDER BY l_returnflag""".stripMargin
    }) { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val parts = graft.functions.HyperLogLog.approxDistinct(
        li, Seq("l_returnflag"), "l_partkey", "approx_parts")
      val orders = graft.functions.HyperLogLog.approxDistinct(
        li, Seq("l_returnflag"), "l_orderkey", "approx_orders")
      parts.join(orders, "l_returnflag").orderBy("l_returnflag")
    },

    // Incremental rollup maintenance (operators.IncrementalAgg): the
    // Spark side builds TWO per-batch partial states (orders split by
    // key parity), merges them algebraically, and finalizes; the oracle
    // computes the same rollup in ONE full-table aggregate. A hash
    // match proves merge(state(A), state(B)) == state(A ∪ B) exactly —
    // including the HLL register merge behind approx_custkeys.
    Q("q93_incremental_rollup", {
      val hll = graft.functions.HyperLogLog.sketchSql(
        "o_orderstatus", "o_custkey", "orders", "approx_custkeys")
      s"""SELECT s.o_orderstatus, s.n, s.sum_micros, s.min_micros,
         | s.max_micros, h.approx_custkeys
         |FROM (SELECT o_orderstatus, count(*) AS n,
         |        CAST(sum(CAST(round(o_totalprice*1000000.0) AS BIGINT)) AS BIGINT) AS sum_micros,
         |        CAST(min(CAST(round(o_totalprice*1000000.0) AS BIGINT)) AS BIGINT) AS min_micros,
         |        CAST(max(CAST(round(o_totalprice*1000000.0) AS BIGINT)) AS BIGINT) AS max_micros
         |      FROM orders GROUP BY 1) s
         |JOIN $hll h ON h.g = s.o_orderstatus
         |ORDER BY s.o_orderstatus""".stripMargin
    }) { (s, dir) =>
      val o = Tables(s, dir, "orders")
        .withColumn("price_micros", micros(col("o_totalprice")))
      val a = o.filter(col("o_orderkey") % 2 === 0)
      val b = o.filter(col("o_orderkey") % 2 =!= 0)
      val keys = Seq("o_orderstatus")
      val scalar = IncrementalAgg.mergeScalar(keys,
        IncrementalAgg.scalarState(a, keys, "price_micros"),
        IncrementalAgg.scalarState(b, keys, "price_micros"))
      val dist = IncrementalAgg.mergeDistinct(keys,
        IncrementalAgg.distinctState(a, keys, "o_custkey"),
        IncrementalAgg.distinctState(b, keys, "o_custkey"))
      IncrementalAgg.finalizeState(scalar, dist, keys, "approx_custkeys")
        .select(col("o_orderstatus"), col("n"),
          col("sum_v").as("sum_micros"), col("min_v").as("min_micros"),
          col("max_v").as("max_micros"), col("approx_custkeys"))
        .orderBy("o_orderstatus")
    },

    // Count-Min frequency sketch (the frequency sketch next to q40's
    // HLL): the Spark side builds TWO per-batch register states (docs
    // split by id parity) and merges them (sum per cell); the oracle
    // builds ONE sketch over the full token stream. A hash match proves
    // merge(state(A), state(B)) == state(A ⊎ B) exactly, and the
    // emitted overcount column (est − true) is the sketch's one-sided
    // error made visible — always ≥ 0.
    Q("q110_count_min", {
      val est = graft.functions.CountMin.sketchSql(
        "unnest(string_split(text, ' '))", "documents",
        "(VALUES ('join'), ('hash'), ('scan'), ('the'), ('vector'), ('spark')) t(v)",
        "est")
      s"""WITH truth AS (SELECT term, count(*) AS true_cnt
         |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
         |  GROUP BY 1)
         |SELECT e.v AS term, e.est, CAST(t.true_cnt AS BIGINT) AS true_cnt,
         | CAST(e.est - t.true_cnt AS BIGINT) AS overcount
         |FROM $est e JOIN truth t ON t.term = e.v
         |ORDER BY term""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val regs = graft.functions.CountMin.mergeRegisters(
        graft.functions.CountMin.registers(
          toks.filter(col("doc_id") % 2 === 0), "term"),
        graft.functions.CountMin.registers(
          toks.filter(col("doc_id") % 2 =!= 0), "term"))
      val qt = Seq("join", "hash", "scan", "the", "vector", "spark").toDF("term")
      val est = graft.functions.CountMin.estimate(regs, qt, "term")
      val truth = toks.groupBy("term").agg(count(lit(1)).as("true_cnt"))
      est.join(truth, "term")
        .withColumn("overcount", (col("est") - col("true_cnt")).cast("long"))
        .orderBy("term")
    },

    // Heavy hitters end-to-end (q110's sketch put to work): bigrams at
    // ≥ 1200 ppm of the stream, found by a Count-Min prefilter (narrow
    // literal-table lookup, no join) + exact verification — the result
    // EQUALS the exact answer (one-sided estimates can't miss a true
    // heavy hitter; the exact count drops collision false positives),
    // but the count shuffle carries only candidate mass. The oracle
    // computes exact heavies directly and replays the sketch registers
    // for the est/overcount columns.
    Q("q117_heavy_hitters", {
      val bgExpr = "unnest(list_transform(range(1, len(string_split(text, ' '))), " +
        "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))"
      val est = graft.functions.CountMin.sketchSql(
        bgExpr, "documents", "(SELECT v FROM hh)", "est")
      s"""WITH tok AS (SELECT $bgExpr AS v FROM documents),
         | tot AS (SELECT count(*) AS n FROM tok),
         | cnt AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
         | hh AS (SELECT c.v, c.cnt FROM cnt c, tot
         |        WHERE c.cnt * 1000000 >= tot.n * 1200)
         |SELECT hh.v AS gram, hh.cnt, e.est,
         | CAST(e.est - hh.cnt AS BIGINT) AS overcount
         |FROM hh JOIN $est e ON e.v = hh.v
         |ORDER BY gram""".stripMargin
    }) { (s, dir) =>
      val grams = Tables(s, dir, "documents").select(
        explode(graft.functions.TokenNgrams.token_ngrams(col("text"), 2)).as("gram"))
      graft.functions.CountMin.heavyHitters(grams, "gram", thresholdPpm = 1200L)
        .orderBy("gram")
    },

    // Incremental QUANTILE maintenance: per-batch histogram states
    // (orders split by key parity) merge exactly — sum per (key,
    // bucket) — and per-status percentiles are read off the MERGED
    // state; the oracle buckets the full table in one pass. A hash
    // match proves the maintained histogram equals the full rescan for
    // any batch split, extending q93's count/sum/HLL states to
    // percentile dashboards.
    Q("q96_incremental_quantiles",
      """WITH v AS (SELECT o_orderstatus,
        |            CAST(round(o_totalprice*1000000.0) AS BIGINT) // 10000000000 AS bucket
        |           FROM orders),
        | h AS (SELECT o_orderstatus, bucket, count(*) AS n FROM v GROUP BY 1, 2),
        | c AS (SELECT o_orderstatus, bucket,
        |         CAST(sum(n) OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS BIGINT) AS cum,
        |         CAST(sum(n) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n_total
        |       FROM h),
        | q AS (SELECT unnest([250, 500, 900]) AS q)
        |SELECT o_orderstatus, CAST(q.q AS BIGINT) AS quantile_permille,
        | CAST(min((bucket + 1) * 10000000000 - 1) AS BIGINT) AS est_upper
        |FROM c CROSS JOIN q WHERE cum * 1000 >= n_total * q.q
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val o = Tables(s, dir, "orders")
        .withColumn("price_micros", micros(col("o_totalprice")))
      val keys = Seq("o_orderstatus")
      val merged = IncrementalAgg.mergeHistogram(keys,
        IncrementalAgg.histogramState(
          o.filter(col("o_orderkey") % 2 === 0), keys, "price_micros", 10000000000L),
        IncrementalAgg.histogramState(
          o.filter(col("o_orderkey") % 2 =!= 0), keys, "price_micros", 10000000000L))
      IncrementalAgg.quantilesFromState(merged, keys, 10000000000L,
          Seq(250, 500, 900))
        .select(col("o_orderstatus"), col("quantile_permille"), col("est_upper"))
        .orderBy("o_orderstatus", "quantile_permille")
    },

    Q("q12_pivot_status",
      """SELECT o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        | count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        | count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority")
    },

    // Maintained uniform sample (round 9): an exact-size per-source
    // sample of everything ever ingested, kept fresh across batches by
    // merging bounded states — the deterministic, mergeable form of
    // reservoir sampling (rank = fixed modular hash of the id; the
    // sample IS the n smallest ranks, so merge = top-n of unioned
    // states, exactly). The Spark side folds THREE doc_id-split batch
    // states through mergeSamples (the q130 parity-split trick: the
    // incremental fold must hash-equal the oracle's one-shot top-n);
    // replays collapse in the dedup, so at-least-once ingest cannot
    // bias the sample.
    Q("q142_maintained_sample",
      """WITH r AS (SELECT source, doc_id,
        |    ((doc_id % 4294967311) * 1103515245 + 12345) % 4294967311 AS rank
        |   FROM documents),
        | w AS (SELECT source, doc_id, rank, row_number() OVER (
        |         PARTITION BY source ORDER BY rank, doc_id) AS rn
        |        FROM r)
        |SELECT source, doc_id, CAST(rank AS BIGINT) AS rank
        |FROM w WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.operators.IncrementalAgg
      val docs = Tables(s, dir, "documents")
      val stratum = Some("source")
      def st(pred: org.apache.spark.sql.Column) = IncrementalAgg.sampleState(
        docs.filter(pred), "doc_id", 5, stratum)
      IncrementalAgg.mergeSamples("doc_id", 5, stratum,
          st(col("doc_id") % 3 === 0), st(col("doc_id") % 3 === 1),
          st(col("doc_id") % 3 === 2))
        .select(col("source"), col("doc_id"), col("rank").cast("long").as("rank"))
        .orderBy("source", "doc_id")
    }
  )
}
