package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: collapse a pair list (near-duplicate
  * edges from MinHash/SimHash/Jaccard verification) into connected
  * components, so each cluster keeps one canonical representative —
  * the final step of every large-scale dedup pipeline (the pair list
  * says "a≈b"; training-set construction needs "keep min(cluster)").
  *
  * Algorithm: min-label propagation WITH pointer doubling — each round
  * a node takes the min over (its label, its neighbors' labels, its
  * label's label). The third term halves the remaining path length, so
  * a chain of diameter d converges in O(log d) rounds instead of O(d)
  * (the same round-compression as Kiveris et al., "Connected Components
  * in MapReduce and Beyond"). Each round is two equi-joins + one
  * aggregate on the EDGE LIST ONLY — corpus size never enters the loop,
  * so at 100 TB the cost is bounded by the number of duplicate pairs,
  * not documents.
  *
  * Every round truncates lineage with [[Stage]] (localCheckpoint by
  * default): `persist` is NOT enough — it caches execution but the
  * LOGICAL plan still nests the whole history, and with labels
  * referenced ~4× per round the analyzer re-walks a 4^r tree
  * (observed: the driver hung in analysis after ~6 rounds with zero
  * jobs running). At cluster scale set [[Stage.ReliableConf]] (plus a
  * checkpoint dir) to swap every round to reliable `checkpoint` —
  * same semantics, executor-loss-safe.
  */
object Clusters {

  /** edges: (id_a, id_b) undirected, any orientation, dupes ok.
    * Returns (doc_id, cluster_id) for every node in at least one edge,
    * cluster_id = min node id reachable.
    *
    * FRONTIER-RESTRICTED rounds: labels only ever DECREASE, and a
    * node's candidate set is (own label, neighbors' labels, its label's
    * label) — all of which were folded in the round that produced them.
    * So a node can improve THIS round only if a neighbor's label, its
    * pointer target's label, or its own label changed LAST round; the
    * union of those three is the frontier, and each round's joins run
    * over frontier-adjacent edges only. On a planted long chain the
    * frontier collapses to the still-converging tail within a few
    * rounds, so late-round cost tracks the active frontier instead of
    * re-joining the full edge list every round (the early-freeze form
    * of Kiveris et al.'s optimization). Convergence = empty frontier
    * delta, read off the already-staged merge — no extra probe join.
    *
    * `roundTrace(round, frontierSize)`, when non-null, observes each
    * round's frontier cardinality (one count over the already-staged
    * frontier — instrumentation for specs/ops dashboards; the default
    * null adds zero actions). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          roundTrace: (Int, Long) => Unit = null): DataFrame = {
    val adj = edges.select(col("id_a").cast("long").as("src"),
        col("id_b").cast("long").as("dst"))
      .union(edges.select(col("id_b").cast("long").as("src"),
        col("id_a").cast("long").as("dst")))
      .distinct()
      .persist()
    var labels = Stage(adj.groupBy("src").agg(min("dst").as("nbr"))
      .select(col("src").as("id"), least(col("src"), col("nbr")).as("label")))
    // round 0: every node's label just changed (from "itself" to the
    // initial min) — the first frontier is the whole graph, as it must be
    var changed = Stage(labels.select("id"))
    var done = changed.isEmpty
    var it = 0
    while (!done && it < maxIter) {
      // nodes whose candidates moved: a neighbor changed, their pointer
      // target changed, or their own label changed (its new target's
      // label is a candidate never folded before)
      val frontier = Stage(
        adj.join(changed.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .select(col("src").as("id"))
          .union(labels.join(changed.select(col("id").as("label")),
            Seq("label"), "left_semi").select("id"))
          .union(changed.select("id"))
          .distinct())
      if (roundTrace != null) roundTrace(it, frontier.count())
      val fLabels = labels.join(frontier, Seq("id"), "left_semi")
      val fAdj = adj.join(frontier.select(col("id").as("src")), Seq("src"), "left_semi")
      // neighbors' labels, frontier sources only
      val viaEdges = fAdj.join(labels, fAdj("dst") === labels("id"))
        .select(fAdj("src").as("id"), col("label"))
      // pointer doubling: label(label(id)), frontier only
      val l2 = labels.select(col("id").as("pid"), col("label").as("plabel"))
      val viaPtr = fLabels.join(l2, fLabels("label") === l2("pid"))
        .select(fLabels("id"), col("plabel").as("label"))
      val cand = fLabels.select("id", "label")
        .union(viaEdges).union(viaPtr)
        .groupBy("id").agg(min("label").as("new_label"))
      // one staged merge feeds next round's labels AND the changed set
      val merged = Stage(labels.join(cand, Seq("id"), "left")
        .select(col("id"), col("label"),
          coalesce(col("new_label"), col("label")).as("nl")))
      labels = merged.select(col("id"), col("nl").as("label"))
      changed = Stage(merged.filter(col("nl") < col("label")).select("id"))
      done = changed.isEmpty
      it += 1
    }
    val out = labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
    adj.unpersist()
    out
  }

  /** INCREMENTAL component maintenance: fold a batch of NEW edges into
    * an existing (doc_id, cluster_id) label table without touching the
    * historical edge list — the streaming form of dedup-cluster upkeep
    * (pairs arrive batch-by-batch from [[Dedup.dedupIncremental]]-style
    * ingest; recomputing CC over all history per batch is the
    * anti-pattern this kills).
    *
    * Correctness by contraction: every existing component is connected,
    * so collapsing it to its representative preserves the connectivity
    * of (old ∪ new) — run CC over the REP-MAPPED new edges only, then
    * push the merged labels back onto the old table. Cost is bounded by
    * the new-edge batch + the labels it touches (the CC loop sees only
    * rep-mapped edges; the label update is one equi-join), never by
    * history size. mergeComponents(cc(E1), E2) == cc(E1 ∪ E2) for any
    * split — CorpusOpsSpec proves it on randomized graphs. */
  def mergeComponents(labels: DataFrame, newEdges: DataFrame): DataFrame = {
    val l = labels.select(col("doc_id").cast("long").as("id"),
      col("cluster_id").cast("long").as("rep"))
    // map each endpoint of each new edge to its existing rep (ids never
    // seen before rep themselves); intra-cluster edges collapse to
    // self-loops and drop
    val e = newEdges.select(col("id_a").cast("long").as("a"),
      col("id_b").cast("long").as("b"))
    val mapped = e
      .join(l.select(col("id").as("a"), col("rep").as("ra")), Seq("a"), "left")
      .join(l.select(col("id").as("b"), col("rep").as("rb")), Seq("b"), "left")
      .select(coalesce(col("ra"), col("a")).as("id_a"),
        coalesce(col("rb"), col("b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // CC over the contracted graph: nodes are old reps + brand-new ids.
    // Every old member id ≥ its rep (rep = min member), so the min over
    // merged reps IS the min over all merged members — labels stay the
    // global min id of their component.
    val repCc = connectedComponents(mapped)
      .select(col("doc_id").as("rep"), col("cluster_id").as("new_rep"))
    val updatedOld = l.join(repCc, Seq("rep"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("new_rep"), col("rep")).as("cluster_id"))
    // ids first seen in this batch: in the contracted CC but not in the
    // old label table (old reps are themselves labeled member ids)
    val newIds = repCc.select(col("rep").as("doc_id"),
        col("new_rep").as("cluster_id"))
      .join(l.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
    updatedOld.unionByName(newIds)
  }

  /** Per-cluster summary: representative (= cluster_id, the min id),
    * cluster size. */
  def clusterSummary(components: DataFrame): DataFrame =
    components.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"))
      .select(col("cluster_id").as("rep_id"), col("n_members"))
}
