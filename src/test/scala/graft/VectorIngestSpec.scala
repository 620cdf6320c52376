package graft

import org.apache.spark.sql.functions._
import graft.llm.Similarity
import graft.streaming.VectorIngest

/** The streaming ANN-index loop, driven batch-by-batch the way
  * foreachBatch would: frozen centroids, replay-proof cell appends, and
  * queries served entirely off the index. */
class VectorIngestSpec extends SparkSpec {
  import spark.implicits._

  // deterministic unit-ish vectors in 4-d: two well-separated clusters
  private def vec(cluster: Int, i: Int): Array[Float] = {
    val base = if (cluster == 0) Array(10f, 0f, 1f, 0f) else Array(0f, 10f, 0f, 1f)
    base.zipWithIndex.map { case (v, d) => v + ((i * (d + 1)) % 5) * 0.1f }
  }
  private def rows(ids: Range, cluster: Int): Seq[(Long, Array[Float])] =
    ids.map(i => (i.toLong, vec(cluster, i)))

  test("incremental index equals one-shot assignment; replays are no-ops") {
    val root = tmpDir("vindex")
    val all = (rows(0 until 8, 0) ++ rows(100 until 108, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(all, root, kCells = 2, iters = 5, dim = 4)

    val batch1 = (rows(0 until 8, 0) ++ rows(100 until 104, 1))
      .toDF("vec_id", "embedding")
    val batch2 = (rows(104 until 108, 1) ++ rows(0 until 2, 0)) // 0,1 replayed
      .toDF("vec_id", "embedding")
    assert(VectorIngest.processBatch(batch1, root) == 12L)
    assert(VectorIngest.processBatch(batch2, root) == 4L)
    // replaying a full batch is a no-op (idempotent restart)
    assert(VectorIngest.processBatch(batch2, root) == 0L)

    // incremental cells == one-shot assignment of the union against the
    // same frozen centroids
    val cells = spark.read.parquet(s"$root/cells")
      .select("vec_id", "list_id").as[(Long, Long)].collect().toMap
    val oneShot = Similarity.assignToCells(all,
        spark.read.parquet(s"$root/centroids"), "vec_id", keep = 1)
      .select("vec_id", "list_id").as[(Long, Long)].collect().toMap
    assert(cells == oneShot)
    // the two clusters landed in different cells
    assert(cells(0L) != cells(100L))
  }

  test("assumeFresh after a caller-side guard probe indexes the same set") {
    import graft.streaming.ReplayGuard
    val rootA = tmpDir("vindexA"); val rootB = tmpDir("vindexB")
    val all = (rows(0 until 8, 0) ++ rows(100 until 108, 1))
      .toDF("vec_id", "embedding")
    val batch1 = (rows(0 until 8, 0) ++ rows(100 until 104, 1))
      .toDF("vec_id", "embedding")
    val batch2 = (rows(104 until 108, 1) ++ rows(0 until 2, 0)) // 0,1 replayed
      .toDF("vec_id", "embedding")
    Seq(rootA, rootB).foreach(r =>
      VectorIngest.trainCentroids(all, r, kCells = 2, iters = 5, dim = 4))
    // A: the ingest's own internal guard probe
    assert(VectorIngest.processBatch(batch1, rootA) == 12L)
    assert(VectorIngest.processBatch(batch2, rootA) == 4L)
    // B: the composed-driver order — caller probes the SAME guard first,
    // ingest skips its duplicate internal probe
    def preFiltered(b: org.apache.spark.sql.DataFrame) = {
      val g = VectorIngest.guardDirOf(rootB)
      if (!ReplayGuard.exists(spark, g)) b
      else ReplayGuard.filterFresh(b, "vec_id", g)
    }
    assert(VectorIngest.processBatch(preFiltered(batch1), rootB,
      assumeFresh = true) == 12L)
    assert(VectorIngest.processBatch(preFiltered(batch2), rootB,
      assumeFresh = true) == 4L)
    // full-replay no-op holds through the caller-side probe too
    assert(VectorIngest.processBatch(preFiltered(batch2), rootB,
      assumeFresh = true) == 0L)
    def stored(r: String): Map[Long, Long] =
      spark.read.parquet(s"$r/cells").select("vec_id", "list_id")
        .as[(Long, Long)].collect().toMap
    assert(stored(rootA) == stored(rootB))
  }

  test("a compaction crash mid-swap heals; compacting an empty store is a no-op") {
    val root = tmpDir("vindex3")
    val all = (rows(0 until 4, 0) ++ rows(100 until 104, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(all, root, kCells = 2, iters = 3, dim = 4)
    // empty store: no-op, not FileNotFoundException
    assert(VectorIngest.compactCells(spark, root) == ((0, 0)))
    assert(VectorIngest.processBatch(all, root) == 8L)
    // simulate the crash window: cells retired to __old, nothing published
    import org.apache.hadoop.fs.Path
    val cells = s"$root/cells"
    val fs = new Path(cells).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(cells), new Path(cells + "__old")))
    // an unhealed replay would re-admit everything AND create a fresh
    // dir that blocks healing forever — processBatch must heal first
    assert(VectorIngest.processBatch(all, root) == 0L)
    assert(VectorIngest.ann(spark, root, all.filter($"vec_id" === 0L),
      k = 2, nProbe = 2).count() == 2L)
  }

  test("retrainAndSwap: old index until commit, new after; crash windows heal") {
    val root = tmpDir("vindex4")
    val all = (rows(0 until 8, 0) ++ rows(100 until 108, 1))
      .toDF("vec_id", "embedding")
    // deliberately BAD bootstrap: 1 cell trained on one cluster, so
    // nProbe=1 probes the single cell holding everything
    VectorIngest.trainCentroids(all.filter($"vec_id" < 8), root,
      kCells = 1, iters = 3, dim = 4)
    assert(VectorIngest.processBatch(all, root) == 16L)
    val queries = (rows(0 until 2, 0) ++ rows(100 until 102, 1))
      .toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceKnn(all, queries, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    val before = VectorIngest.ann(spark, root, queries, k = 3, nProbe = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(before == exact) // 1 cell = brute force, trivially

    // ── crash BEFORE the commit marker: staged __new trees exist but
    // probes must still serve the OLD index untouched (and not delete
    // the staging of what could be an in-flight retrain)
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$root/centroids__new"))
    fs.mkdirs(new Path(s"$root/cells__new"))
    assert(VectorIngest.ann(spark, root, queries, k = 3, nProbe = 1)
      .as[(Long, Long, Long)].collect().toSet == exact)
    assert(fs.exists(new Path(s"$root/centroids__new")),
      "a reader must not roll back an uncommitted retrain")

    // ── the real retrain: 2 cells over both clusters, swap commits
    val n = VectorIngest.retrainAndSwap(spark, root, all, kCells = 2,
      iters = 5, dim = 4)
    assert(n == 16L)
    assert(!fs.exists(new Path(s"$root/centroids__new")))
    assert(!fs.exists(new Path(s"$root/cells__new")))
    // post-swap, probing all cells is exact brute force again
    assert(VectorIngest.ann(spark, root, queries, k = 3, nProbe = 2)
      .as[(Long, Long, Long)].collect().toSet == exact)
    // and the retrain actually changed the layout: 2 cells now, the
    // clusters separated, nProbe=1 stays within the query's cluster
    assert(spark.read.parquet(s"$root/cells")
      .select("list_id").distinct().count() == 2L)
    VectorIngest.ann(spark, root, queries, k = 3, nProbe = 1)
      .as[(Long, Long, Long)].collect()
      .foreach { case (q, nb, _) => assert((q < 100) == (nb < 100)) }
    // replay guard survived the swap: the vector set is unchanged
    assert(VectorIngest.processBatch(all, root) == 0L)

    // ── crash AFTER the marker, before any rename: readers roll the
    // swap forward. Simulate by staging a 1-cell retrain by hand.
    val cents1 = graft.llm.KMeans.train(all, 1, 3, 4)
    Similarity.centroidTable(spark, cents1)
      .coalesce(1).write.parquet(s"$root/centroids__new")
    Similarity.assignToCells(
        spark.read.parquet(s"$root/cells").select("vec_id", "embedding"),
        spark.read.parquet(s"$root/centroids__new"), "vec_id", keep = 1)
      .write.partitionBy("list_id").parquet(s"$root/cells__new")
    fs.create(new Path(s"$root/__retrain_commit"), false).close()
    // first read heals forward to the committed 1-cell index
    assert(VectorIngest.ann(spark, root, queries, k = 3, nProbe = 1)
      .as[(Long, Long, Long)].collect().toSet == exact)
    assert(!fs.exists(new Path(s"$root/__retrain_commit")))
    assert(spark.read.parquet(s"$root/cells")
      .select("list_id").distinct().count() == 1L)
  }

  test("ann probing all cells is exact; nProbe=1 stays within the cluster") {
    val root = tmpDir("vindex2")
    val all = (rows(0 until 8, 0) ++ rows(100 until 108, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(all, root, kCells = 2, iters = 5, dim = 4)
    // four appends: a real small-file swamp for the compaction below
    (0 until 4).foreach { i =>
      assert(VectorIngest.processBatch(
        all.filter(pmod($"vec_id", lit(4)) === i), root) == 4L)
    }

    val queries = (rows(0 until 2, 0) ++ rows(100 until 102, 1))
      .toDF("vec_id", "embedding")
    // probe every cell → exact brute-force equality
    val exact = Similarity.bruteForceKnn(all, queries, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    val probedAll = VectorIngest.ann(spark, root, queries, k = 3, nProbe = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(probedAll == exact)

    // nProbe=1: every neighbor comes from the query's own cluster
    val one = VectorIngest.ann(spark, root, queries, k = 3, nProbe = 1)
      .as[(Long, Long, Long)].collect()
    assert(one.nonEmpty)
    one.foreach { case (q, n, _) =>
      assert((q < 100) == (n < 100),
        s"query $q got cross-cluster neighbor $n under nProbe=1")
    }

    // the flat compactor must refuse the partitioned cell store (its
    // rewrite would flatten list_id and destroy partition pruning)
    intercept[IllegalArgumentException] {
      graft.streaming.CorpusIngest.compact(spark, s"$root/cells")
    }

    // compaction: fewer files, identical results, pruning preserved
    val (nb, na) = VectorIngest.compactCells(spark, root)
    assert(na < nb, s"compaction did not shrink the store: $nb -> $na")
    val afterCompact = VectorIngest.ann(spark, root, queries, k = 3, nProbe = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(afterCompact == exact, "compaction changed ann results")

    // the scan-fraction claim made concrete: the probed-cell IN list
    // must reach the cells scan as a PartitionFilter (reading
    // nProbe/kCells of the files), not read-everything-then-filter
    val plan = VectorIngest.ann(spark, root, queries, k = 3, nProbe = 1)
      .queryExecution.executedPlan.toString
    // the filter must be INSIDE the PartitionFilters list — an empty
    // "PartitionFilters: []" plus list_id elsewhere must not pass
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(plan).isDefined,
      s"probed cells not partition-pruned at the scan: $plan")
  }

  test("malformed vectors quarantine without poisoning their ids") {
    val root = tmpDir("vindex_q")
    val all = (rows(0 until 8, 0) ++ rows(100 until 108, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(all, root, kCells = 2, iters = 5, dim = 4)

    // batch with a wrong-dim vector, a null embedding, TWO distinct
    // null-id rows (each must be audited — validation runs before the
    // id dedup), and a bad+good pair for the SAME id (the good row must
    // win deterministically: validation splits before dedup)
    val bad = Seq(
      (50L, Array(1f, 2f)),                       // wrong dim (2 != 4)
      (51L, null.asInstanceOf[Array[Float]]),     // null embedding
      (52L, Array(9f, 9f, 9f))                    // wrong dim, id also sent valid
    ).toDF("vec_id", "embedding")
      .union(Seq(
        (null.asInstanceOf[java.lang.Long], Array(1f, 2f, 3f, 4f)),
        (null.asInstanceOf[java.lang.Long], Array(5f, 6f, 7f, 8f)))
        .toDF("vec_id", "embedding"))
    val mixed = rows(0 until 4, 0).toDF("vec_id", "embedding")
      .union(Seq((52L, vec(0, 52))).toDF("vec_id", "embedding"))
      .union(bad)
    assert(VectorIngest.processBatch(mixed, root, batchId = 1L) == 5L)

    val q = spark.read.parquet(s"$root/_quarantine")
      .select("vec_id", "reason").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
    assert(q.length == 5) // every malformed row audited, incl. both null ids
    assert(q.count(_ == (-1L, "vec_id_null")) == 2)
    assert(q.toSet == Set((50L, "wrong_dim"), (51L, "embedding_null"),
      (52L, "wrong_dim"), (-1L, "vec_id_null")))
    // id 52's VALID row was indexed even though its bad twin quarantined
    assert(spark.read.parquet(s"$root/cells").filter(col("vec_id") === 52L)
      .count() == 1L)
    // at-least-once redelivery of the same batch id: audit stays exact
    assert(VectorIngest.processBatch(mixed, root, batchId = 1L) == 0L)
    assert(spark.read.parquet(s"$root/_quarantine").count() == 5L)

    // the invalid ids were NOT ledgered: a corrected re-send is admitted
    val fixed = Seq((50L, vec(0, 50)), (51L, vec(1, 51))).toDF("vec_id", "embedding")
    assert(VectorIngest.processBatch(fixed, root, batchId = 2L) == 2L)
    // and a genuine replay of it is still rejected
    assert(VectorIngest.processBatch(fixed, root, batchId = 3L) == 0L)
  }

  test("PQ-coded cell store: codes ride appends; annPq reranks exact at full coverage; replay + compaction intact") {
    val root = tmpDir("vindex_pq")
    val all = (rows(0 until 16, 0) ++ rows(100 until 116, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(all, root, kCells = 2, iters = 3, dim = 4)
    VectorIngest.trainCodebook(all, root, m = 2, ksub = 4, iters = 3, dim = 4)
    val b1 = (rows(0 until 16, 0) ++ rows(100 until 108, 1))
      .toDF("vec_id", "embedding")
    val b2 = (rows(108 until 116, 1) ++ rows(0 until 4, 0)) // 0-3 replayed
      .toDF("vec_id", "embedding")
    assert(VectorIngest.processBatch(b1, root) == 24L)
    assert(VectorIngest.processBatch(b2, root) == 8L)
    assert(VectorIngest.processBatch(b2, root) == 0L) // replay no-op, coded store
    val cells = spark.read.parquet(s"$root/cells")
    assert(cells.columns.contains("codes"))
    assert(cells.select(size(col("codes"))).distinct()
      .as[Int].collect().toSeq == Seq(2), "m codes per vector")
    // shortlist covering the store + all cells probed → the exact rerank
    // IS brute-force cosine top-k
    val queries = all.filter($"vec_id" < 4)
    val exact = Similarity.bruteForceKnn(all, queries, k = 3)
    val served = VectorIngest.annPq(spark, root, queries, k = 3,
      nProbe = 2, shortlist = 64)
    assert(served.exceptAll(exact).isEmpty && exact.exceptAll(served).isEmpty,
      "full-coverage annPq must equal brute force")
    // a narrow ADC shortlist still recalls most true neighbors (floor)
    val narrow = VectorIngest.annPq(spark, root, queries, k = 3,
      nProbe = 1, shortlist = 6)
    val hits = narrow.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits >= 8L, s"PQ recall floor: $hits/12 exact pairs recovered")
    // compaction preserves the coded layout and the served answer
    val (before, after) = VectorIngest.compactCells(spark, root)
    assert(after <= before)
    assert(spark.read.parquet(s"$root/cells").columns.contains("codes"))
    val reServed = VectorIngest.annPq(spark, root, queries, k = 3,
      nProbe = 2, shortlist = 64)
    assert(reServed.exceptAll(exact).isEmpty && exact.exceptAll(reServed).isEmpty)
    // orphan reconcile works on the coded store
    assert(VectorIngest.reconcile(spark, root).isEmpty)
    // a retrain must keep the store CODED (cells move, the frozen
    // codebook does not): annPq still serves — and still exactly —
    // off the swapped tree
    assert(VectorIngest.retrainAndSwap(spark, root, all,
      kCells = 2, iters = 3, dim = 4) == 32L)
    assert(spark.read.parquet(s"$root/cells").columns.contains("codes"),
      "retrain dropped the codes column — coded store broken")
    val postRetrain = VectorIngest.annPq(spark, root, queries, k = 3,
      nProbe = 2, shortlist = 64)
    assert(postRetrain.exceptAll(exact).isEmpty && exact.exceptAll(postRetrain).isEmpty)
  }

  test("retrainAndSwap retrains the PQ codebook through the same commit marker") {
    val root = tmpDir("vindex_pqrt")
    // DRIFTED bootstrap: centroids AND codebook trained on cluster 0
    // only — the stream then delivers both clusters, so the frozen
    // quantizer misrepresents half the data
    val boot = rows(0 until 16, 0).toDF("vec_id", "embedding")
    val all = (rows(0 until 16, 0) ++ rows(100 until 116, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(boot, root, kCells = 2, iters = 3, dim = 4)
    VectorIngest.trainCodebook(boot, root, m = 2, ksub = 4, iters = 3, dim = 4)
    assert(VectorIngest.processBatch(all, root) == 32L)
    val cbBefore = spark.read.parquet(s"$root/codebook").collect().toSet
    val queries = (rows(0 until 2, 0) ++ rows(100 until 102, 1))
      .toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceKnn(all, queries, k = 3)

    // ── pre-commit crash: a staged codebook__new with NO marker must
    // neither be served nor roll anything back
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$root/codebook__new"))
    val served = VectorIngest.annPq(spark, root, queries, k = 3,
      nProbe = 2, shortlist = 64)
    assert(served.exceptAll(exact).isEmpty && exact.exceptAll(served).isEmpty,
      "pre-commit crash: old codebook+codes must keep serving exactly")
    assert(spark.read.parquet(s"$root/codebook").collect().toSet == cbBefore,
      "uncommitted staging must not replace the live codebook")

    // ── the real retrain on the full (drifted) distribution: the
    // codebook commits WITH the centroids/cells through the one marker
    assert(VectorIngest.retrainAndSwap(spark, root, all,
      kCells = 2, iters = 3, dim = 4) == 32L)
    assert(!fs.exists(new Path(s"$root/codebook__new")))
    val cbAfter = spark.read.parquet(s"$root/codebook").collect().toSet
    assert(cbAfter != cbBefore,
      "codebook unchanged — retrain froze the bootstrap quantizer")
    // stored codes are consistent with the NEW codebook: re-encoding the
    // raw vectors with it reproduces the cell store's codes exactly
    def loadCb() = {
      val cbRows = spark.read.parquet(s"$root/codebook").collect()
      val cents = cbRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map(_._2
        .map(r => (r.getLong(1), r.getSeq[Double](2).toArray))
        .sortBy(_._1).toIndexedSeq)
      graft.llm.ProductQuantizer.Codebook(
        cents.size, cents.head.size, cents.head.head._2.length, cents)
    }
    val stored = spark.read.parquet(s"$root/cells").select("vec_id", "codes")
    val reEnc = graft.llm.ProductQuantizer.encode(
      spark.read.parquet(s"$root/cells").select("vec_id", "embedding"), loadCb())
      .select("vec_id", "codes")
    assert(stored.exceptAll(reEnc).isEmpty && reEnc.exceptAll(stored).isEmpty,
      "cell codes were not re-encoded with the retrained codebook")
    // and the swapped index still serves exactly at full coverage
    val post = VectorIngest.annPq(spark, root, queries, k = 3,
      nProbe = 2, shortlist = 64)
    assert(post.exceptAll(exact).isEmpty && exact.exceptAll(post).isEmpty)

    // ── post-commit crash: marker present + staged codebook__new heals
    // FORWARD on the next read (codebook participates in the roll)
    val cbDir = s"$root/codebook"
    fs.rename(new Path(cbDir), new Path(cbDir + "__new")) // stage
    // a marker with ONLY the codebook staged: centroids/cells stay
    fs.create(new Path(s"$root/__retrain_commit"), false).close()
    val healed = VectorIngest.annPq(spark, root, queries, k = 3,
      nProbe = 2, shortlist = 64)
    assert(healed.exceptAll(exact).isEmpty && exact.exceptAll(healed).isEmpty)
    assert(!fs.exists(new Path(s"$root/__retrain_commit")))
    assert(fs.exists(new Path(cbDir)) && !fs.exists(new Path(cbDir + "__new")),
      "heal must publish the staged codebook and drop the marker")
    assert(spark.read.parquet(cbDir).collect().toSet == cbAfter)
  }

  test("semantic admission gate rejects near-dups of indexed vectors, admits novelty") {
    val root = tmpDir("vindex_sem")
    val base = (rows(0 until 8, 0) ++ rows(100 until 108, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(base, root, kCells = 2, iters = 3, dim = 4)
    // empty index: the gate rejects nothing (first batch always admits)
    assert(VectorIngest.semanticRejects(spark, root, base, 990000L).count() == 0L)
    assert(VectorIngest.processBatch(base, root, batchId = 0L) == 16L)
    // batch 2: an EXACT copy of vector 3 under a new id (cos = 1), plus
    // a genuinely novel vector between the two clusters (the rows()
    // family repeats mod 5 within a cluster, so any generated index
    // would collide — cos ≈ 0.70 against both cluster bases here)
    val batch2 = Seq((500L, vec(0, 3)), (200L, Array(5f, 5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val (admitted, rejects) = VectorIngest.processBatchDeduped(
      batch2, root, minSimPpm = 999000L, nProbe = 2, batchId = 1L)
    val rej = rejects.as[(Long, Long, Long)].collect().toSeq
    assert(rej.map(r => (r._1, r._2)) == Seq((500L, 3L)),
      s"the exact copy must reject against its original: $rej")
    assert(rej.head._3 == 1000000L, s"exact copy scores 1e6 ppm: $rej")
    assert(admitted == 1L, "the novel vector must still be admitted")
    assert(spark.read.parquet(s"$root/cells")
      .filter(col("vec_id") === 500L).count() == 0L)
    assert(spark.read.parquet(s"$root/cells")
      .filter(col("vec_id") === 200L).count() == 1L)
    // the reject left no ledger row: once the blocker is gone (here:
    // re-send after raising the bar is moot — assert via replay instead)
    // a replay of batch2 is a no-op for the admitted id
    val (again, _) = VectorIngest.processBatchDeduped(
      batch2, root, minSimPpm = 999000L, nProbe = 2, batchId = 2L)
    assert(again == 0L)
  }

  test("an index probe feeds MMR directly: full-coverage annScored == exact mmrRerank") {
    val root = tmpDir("vindex_mmr")
    val all = (rows(0 until 12, 0) ++ rows(100 until 112, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(all, root, kCells = 2, iters = 3, dim = 4)
    assert(VectorIngest.processBatch(all, root) == 24L)
    val queries = all.filter($"vec_id" < 2)
    // nProbe = kCells → the probe IS exact top-kCand, so the candidate-fed
    // greedy must equal the exact operator bit-for-bit — the composition
    // the scored surface exists for (index probe → diversity re-rank,
    // no corpus rescan anywhere)
    val cand = VectorIngest.annScored(spark, root, queries, k = 6, nProbe = 2)
      .select(col("query_id"), col("neighbor_id").as("cand_id"),
        col("sim").as("sim_q"))
    val fed = Similarity.mmrRerankFromCandidates(cand, all, kOut = 3, lambda = 0.7)
      .as[(Long, Long, Long)].collect().toSet
    val exact = Similarity.mmrRerank(all, queries, kCand = 6, kOut = 3, lambda = 0.7)
      .as[(Long, Long, Long)].collect().toSet
    assert(fed == exact, s"probe-fed MMR diverged: $fed vs $exact")
  }

  test("filtered probe: allowed-set semi-join equals brute force over the allowed corpus") {
    val root = tmpDir("vindex_filtered")
    val all = (rows(0 until 12, 0) ++ rows(100 until 112, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(all, root, kCells = 2, iters = 3, dim = 4)
    assert(VectorIngest.processBatch(all, root) == 24L)
    val queries = all.filter($"vec_id" < 2)
    val allowed = all.filter($"vec_id" % 2 === 0).select("vec_id")
    // full coverage → the filtered probe is EXACT filtered search, and
    // it returns a full k rows where post-filtering unfiltered top-k
    // would come up short under a selective predicate
    val served = VectorIngest.annScored(spark, root, queries, k = 5,
        nProbe = 2, allowed = Some(allowed))
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Long)].collect().toSet
    val exact = Similarity.bruteForceKnn(
        all.join(allowed, Seq("vec_id"), "left_semi"), queries, k = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(served == exact, s"filtered probe diverged: $served vs $exact")
    assert(served.count(_._1 == 0L) == 5, "filtered probe must fill k")
    assert(served.forall(r => r._2 % 2 == 0), "disallowed id served")
  }

  test("a chunk-index probe feeds MaxSim: full-coverage probe == exact late interaction") {
    val root = tmpDir("vindex_maxsim")
    // chunk ids: owner = vec_id DIV 100 — doc 0 has chunks 0..11, doc 1
    // has chunks 100..111
    val all = (rows(0 until 12, 0) ++ rows(100 until 112, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(all, root, kCells = 2, iters = 3, dim = 4)
    assert(VectorIngest.processBatch(all, root) == 24L)
    val qChunks = all.filter($"vec_id" < 100)
    // exact operator over (owner, chunk) framing
    val exact = Similarity.lateInteractionTopK(
        all.select(expr("vec_id DIV 100").as("doc_id"), $"embedding"),
        qChunks.select(expr("vec_id DIV 100").as("doc_id"),
          $"vec_id".as("chunk_id"), $"embedding"),
        k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // probe the CHUNK index per query chunk (full coverage), re-key to
    // owners, aggregate through the candidate-fed form
    val probe = VectorIngest.annScored(spark, root, qChunks, k = 23, nProbe = 2)
      .select(expr("query_id DIV 100").as("query_id"),
        col("query_id").as("q_chunk"),
        expr("neighbor_id DIV 100").as("cand_id"), col("sim"))
      .filter($"query_id" =!= $"cand_id")
    val fed = Similarity.lateInteractionFromSims(probe, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fed == exact, s"probe-fed MaxSim diverged: $fed vs $exact")
  }

  test("maintainTopK: per-batch folds equal one-shot brute force; replays are no-ops") {
    val topkDir = tmpDir("vtopk") + "/state"
    val all = (rows(0 until 12, 0) ++ rows(100 until 112, 1))
      .toDF("vec_id", "embedding")
    val queries = all.filter($"vec_id" < 3)
    val batches = Seq(
      all.filter($"vec_id" % 3 === 0), all.filter($"vec_id" % 3 === 1),
      all.filter($"vec_id" % 3 === 2))
    batches.foreach(b => VectorIngest.maintainTopK(spark, topkDir, queries, b, k = 4))
    val maintained = spark.read.parquet(topkDir)
      .select("query_id", "neighbor_id", "rnk")
    val exact = Similarity.bruteForceKnn(all, queries, k = 4)
    assert(maintained.exceptAll(exact).isEmpty && exact.exceptAll(maintained).isEmpty,
      "maintained top-k must equal one-shot brute force")
    // at-least-once: replaying a batch changes nothing (same pair, same
    // double, dedup collapses it)
    val before = spark.read.parquet(topkDir).collect().toSet
    VectorIngest.maintainTopK(spark, topkDir, queries, batches.head, k = 4)
    assert(spark.read.parquet(topkDir).collect().toSet == before)
  }

  test("indexStats: cell balance, quarantine and coded flags off metadata") {
    val root = tmpDir("vindex_stats")
    val all = (rows(0 until 6, 0) ++ rows(100 until 104, 1))
      .toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(all, root, kCells = 2, iters = 5, dim = 4)
    // empty store: zeros, never a FileNotFoundException
    val empty = VectorIngest.indexStats(spark, root).collect().head
    assert(empty.getAs[Long]("n_cells") == 2L)
    assert(empty.getAs[Long]("n_vectors") == 0L)
    assert(empty.getAs[Long]("imbalance_ppm") == 0L)
    // 10 valid vectors (6 vs 4 per cluster) + 1 malformed (quarantined)
    val bad = Seq((999L, Array(1f, 2f))).toDF("vec_id", "embedding")
    assert(VectorIngest.processBatch(all.unionByName(bad), root) == 10L)
    val st = VectorIngest.indexStats(spark, root).collect().head
    assert(st.getAs[Long]("n_cells") == 2L)
    assert(st.getAs[Long]("n_cells_used") == 2L)
    assert(st.getAs[Long]("n_vectors") == 10L)
    assert(st.getAs[Long]("min_cell") == 4L)
    assert(st.getAs[Long]("max_cell") == 6L)
    assert(st.getAs[Long]("avg_cell") == 5L)
    // max/avg = 6/5 in ppm
    assert(st.getAs[Long]("imbalance_ppm") == 1200000L)
    assert(st.getAs[Long]("coded") == 0L)
    assert(st.getAs[Long]("n_quarantined") == 1L)
  }

  test("quantizationDrift: in-distribution batches stay calm, drifted data trips the retrain trigger, a retrain re-baselines") {
    val root = tmpDir("vindex_drift")
    val boot = rows(0 until 8, 0).toDF("vec_id", "embedding")
    VectorIngest.trainCentroids(boot, root, kCells = 2, iters = 5, dim = 4)
    assert(spark.read.parquet(s"$root/qbase").count() == 1L)
    // same-distribution batch: error comparable to the training fit
    val calm = VectorIngest.quantizationDrift(spark, root,
      rows(8 until 16, 0).toDF("vec_id", "embedding")).collect().head
    assert(calm.getAs[Long]("n_batch") == 8L)
    assert(calm.getAs[Long]("retrain_suggested") == 0L)
    // drifted batch (the OTHER cluster, never seen in training): the
    // frozen centroids fit it badly — err explodes past the threshold
    val drifted = rows(100 until 108, 1).toDF("vec_id", "embedding")
    val hot = VectorIngest.quantizationDrift(spark, root, drifted)
      .collect().head
    assert(hot.getAs[Long]("batch_err_micros") >
      calm.getAs[Long]("batch_err_micros"))
    assert(hot.getAs[Long]("retrain_suggested") == 1L)
    // empty / all-malformed batch: no signal, never a suggestion —
    // wrong-DIM rows excluded too (a model-version switch must not
    // score length-truncated dots and fire a pointless retrain)
    val none = VectorIngest.quantizationDrift(spark, root,
      Seq((1L, Array(0f, 0f, 0f, 0f)), (2L, Array(1f, 2f)))
        .toDF("vec_id", "embedding"))
      .collect().head
    assert(none.getAs[Long]("n_batch") == 0L)
    assert(none.isNullAt(none.fieldIndex("drift_ppm")))
    assert(none.getAs[Long]("retrain_suggested") == 0L)
    // act on the trigger: index the drifted data, retrain on a sample
    // covering both clusters — the staged qbase commits with the swap
    // and the same drifted batch now reads calm
    assert(VectorIngest.processBatch(boot.unionByName(drifted), root) == 16L)
    VectorIngest.retrainAndSwap(spark, root,
      boot.unionByName(drifted), kCells = 2, iters = 5, dim = 4)
    val after = VectorIngest.quantizationDrift(spark, root, drifted)
      .collect().head
    assert(after.getAs[Long]("batch_err_micros") <
      hot.getAs[Long]("batch_err_micros"))
    assert(after.getAs[Long]("retrain_suggested") == 0L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/qbase__new")))
  }

  test("streaming start: checkpointed file-drop folds batches across a restart; drift monitor rows ride along") {
    import org.apache.spark.sql.types._
    val root = tmpDir("vstream"); val cp = tmpDir("vstream_cp")
    val in = tmpDir("vstream_in"); val mon = tmpDir("vstream_mon")
    val all = rows(0 until 8, 0) ++ rows(100 until 108, 1)
    VectorIngest.trainCentroids(all.toDF("vec_id", "embedding"), root,
      kCells = 2, iters = 5, dim = 4)
    def drop(name: String, rs: Seq[(Long, Array[Float])]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$in/$name"),
        rs.map { case (id, e) =>
          s"""{"vec_id":$id,"embedding":[${e.mkString(",")}]}"""
        }.mkString("\n"))
    def mkStream = spark.readStream
      .schema(StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
      .json(in)
    drop("a.jsonl", all.take(8))
    val q1 = VectorIngest.start(spark, mkStream, root, cp, driftDir = Some(mon))
    try q1.processAllAvailable() finally q1.stop()
    drop("b.jsonl", all.drop(8))
    // restart from the checkpoint: a.jsonl must not re-fold
    val q2 = VectorIngest.start(spark, mkStream, root, cp, driftDir = Some(mon))
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$root/cells")
      .select("vec_id").distinct().count() == 16L)
    // one monitor row per checkpointed batch, measured on what arrived
    val m = spark.read.parquet(mon).select("batch_id", "n_batch")
      .as[(Long, Long)].collect().toSet
    assert(m == Set((0L, 8L), (1L, 8L)))
  }

  test("recordDrift: one monitor row per batch, replays overwrite instead of double-counting") {
    val root = tmpDir("vindex_mon")
    val mon = tmpDir("vindex_mon_tbl")
    VectorIngest.trainCentroids(rows(0 until 8, 0).toDF("vec_id", "embedding"),
      root, kCells = 2, iters = 5, dim = 4)
    val calm = rows(8 until 12, 0).toDF("vec_id", "embedding")
    val hot = rows(100 until 104, 1).toDF("vec_id", "embedding")
    VectorIngest.recordDrift(spark, root, calm, mon, batchId = 0L)
    VectorIngest.recordDrift(spark, root, hot, mon, batchId = 1L)
    // an at-least-once redelivery of batch 1 rewrites its subdir
    VectorIngest.recordDrift(spark, root, hot, mon, batchId = 1L)
    val rowsOut = spark.read.parquet(mon)
      .select("batch_id", "retrain_suggested")
      .as[(Long, Long)].collect().sorted
    assert(rowsOut.toSeq == Seq((0L, 0L), (1L, 1L)))
    // a store trained before baselines existed (no qbase): the monitor
    // must SKIP, never throw — a crash-looping ingest bought by turning
    // monitoring on is worse than no monitor
    val preQbase = tmpDir("vindex_mon_old")
    VectorIngest.trainCentroids(rows(0 until 8, 0).toDF("vec_id", "embedding"),
      preQbase, kCells = 2, iters = 3, dim = 4)
    val qb = new java.io.File(s"$preQbase/qbase")
    qb.listFiles().foreach(_.delete()); qb.delete()
    val mon2 = tmpDir("vindex_mon_old_tbl")
    VectorIngest.recordDrift(spark, preQbase, calm, mon2, batchId = 0L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$mon2/batch_id=0")))
  }
}
