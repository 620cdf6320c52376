package graft

import graft.llm.KMeans

/** Deterministic Lloyd's k-means: planted blobs recovered, runs
  * bit-reproducible. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated 4-d blobs: ids 0-4 near (0,0,0,0), 5-9 near (10,10,10,10)
  private def blob(center: Float, ids: Range) =
    ids.map(i => (i.toLong, Array(center + i * 0.01f, center - i * 0.01f,
      center + 0.02f * i, center)))
  private lazy val emb =
    (blob(0f, 0 until 5) ++ blob(10f, 5 until 10)).toDF("vec_id", "embedding")

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
    assert(math.abs(c(lowCell)(3) - 0.0) < 0.1)
    assert(math.abs(c(hiCell)(3) - 10.0) < 0.1)
  }

  test("training is bit-deterministic across runs") {
    val a = KMeans.train(emb, k = 2, iters = 3, dim = 4)
    val b = KMeans.train(emb, k = 2, iters = 3, dim = 4)
    assert(a.map(_._1) == b.map(_._1))
    assert(a.map(_._2.toSeq) == b.map(_._2.toSeq))
  }
}
