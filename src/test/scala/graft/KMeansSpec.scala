package graft

import graft.llm.KMeans

/** Deterministic Lloyd's k-means: planted blobs recovered, runs
  * bit-reproducible. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated 4-d blobs: ids 0-4 near (1,1,1,1), 5-9 near
  // (10,10,10,10) — centers off the origin so cosine norms stay nonzero
  private def blob(center: Float, ids: Range) =
    ids.map(i => (i.toLong, Array(center + i * 0.01f, center - i * 0.01f,
      center + 0.02f * i, center)))
  private lazy val emb =
    (blob(1f, 0 until 5) ++ blob(10f, 5 until 10)).toDF("vec_id", "embedding")

  test("k-means recovers planted blobs") {
    val cents = KMeans.train(emb, k = 2, iters = 4, dim = 4)
    val cells = KMeans.assign(emb, cents)
      .as[(Long, Long)].collect().toMap
    val lowCell = cells(0L)
    assert((0L until 5L).forall(cells(_) == lowCell))
    val hiCell = cells(5L)
    assert((5L until 10L).forall(cells(_) == hiCell))
    assert(lowCell != hiCell)
    // centroids land near the blob centers
    val c = cents.toMap
    assert(math.abs(c(lowCell)(3) - 1.0) < 0.1)
    assert(math.abs(c(hiCell)(3) - 10.0) < 0.1)
  }

  test("trained-IVF ANN finds the identical vector within its cell") {
    // duplicate vec 7 as vec 20: its top neighbor must be the twin
    val twin = emb.as[(Long, Array[Float])].collect().find(_._1 == 7L).get._2
    val corpus = (emb.as[(Long, Array[Float])].collect().toSeq :+ (20L, twin))
      .toDF("vec_id", "embedding")
    val res = graft.llm.Similarity.ivfKnnTrained(
        corpus, corpus.filter($"vec_id" === 20L), k = 1,
        kCells = 2, nProbe = 1, iters = 3, dim = 4)
      .as[(Long, Long, Long)].collect()
    assert(res.toSeq == Seq((20L, 7L, 1L)))
  }

  test("literal-path and join-path assignment are bit-identical at k=64") {
    // 64 synthetic centroids over the 4-d space, including ones placed to
    // force score ties (identical centroids 10 and 11 → tie-break must
    // pick the lower cell on both paths)
    val cents: Seq[(Long, Array[Double])] = (0L until 64L).map { cid =>
      val base = (cid % 12).toDouble
      val c =
        // cells 10 and 11 identical → exact score ties; both paths must
        // break to the lower cell id
        if (cid == 10L || cid == 11L) Array(10.0, 10.0, 10.0, 10.0)
        else Array(base, base + 0.5 * (cid % 3), base - 0.25 * (cid % 5), base)
      (cid, c)
    }
    val lit = KMeans.assignLiteral(cents)(emb)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val join = KMeans.assignJoin(cents)(emb)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(lit == join)
    assert(lit.size == 10)
    // the high blob actually hits the planted tie and resolves low
    assert(lit(5L) == 10L)
  }

  test("training is bit-deterministic across runs") {
    val a = KMeans.train(emb, k = 2, iters = 3, dim = 4)
    val b = KMeans.train(emb, k = 2, iters = 3, dim = 4)
    assert(a.map(_._1) == b.map(_._1))
    assert(a.map(_._2.toSeq) == b.map(_._2.toSeq))
  }
}
