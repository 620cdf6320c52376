package graft

import org.apache.spark.sql.functions._
import graft.llm.{Inference, Similarity}
import graft.streaming.VectorIngest

/** The embed-the-corpus seam: batching must be an implementation detail
  * (values identical across batch sizes and partition layouts), the
  * output must drop straight into the vector operators, and the fake
  * model must behave like an embedding (same text → same vector,
  * related texts closer than unrelated). */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffles partitioned data across executors"),
    (2L, "spark shuffles partitioned data across the cluster"),
    (3L, "sourdough depends on wild yeast and long fermentation"),
    (4L, "glaciers carve alpine valleys over millennia"),
    (5L, "spark shuffles partitioned data across executors")
  ).toDF("doc_id", "text")

  test("embeddings are batch-size and partition-layout invariant") {
    def run(bs: Int, parts: Int) =
      Inference.embedDocuments(docs.repartition(parts), dim = 16, batchSize = bs)
        .as[(Long, Array[Float])].collect().toMap
        .map { case (k, v) => k -> v.toSeq }
    val base = run(32, 1)
    assert(run(2, 1) == base, "batch split changed the vectors")
    assert(run(3, 4) == base, "partition layout changed the vectors")
    // identical text → identical vector; all vectors ~unit length
    assert(base(1L) == base(5L))
    base.values.foreach { v =>
      val n = v.map(x => x.toDouble * x).sum
      assert(n > 0.9 && n < 1.1, s"vector norm off: $n")
    }
  }

  test("output feeds the vector operators end to end") {
    val emb = Inference.embedDocuments(docs, dim = 16)
    // embedDocuments outputs doc_id; vector ops expect vec_id
    assert(emb.columns.toSeq == Seq("doc_id", "embedding"))
    // near-identical texts must be the closest pair under the same
    // cosine the ANN operators use
    val knn = Similarity.bruteForceKnn(
        emb.withColumnRenamed("doc_id", "vec_id"),
        emb.withColumnRenamed("doc_id", "vec_id").filter($"vec_id" === 1L), k = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._3).map(_._2).toSeq
    assert(Set(5L, 2L).contains(knn.head),
      s"nearest neighbor of doc 1 should be its copy or near-copy, got $knn")

    // and into the streaming index
    val root = tmpDir("inf-index")
    val vecs = emb.withColumnRenamed("doc_id", "vec_id")
    VectorIngest.trainCentroids(vecs, root, kCells = 2, iters = 3, dim = 16)
    assert(VectorIngest.processBatch(vecs, root) == 5L)
  }

  test("cross-encoder rerank: exact stub scores, invariant to batching, candidate-bounded") {
    // query 1's first-stage candidates in a deliberate WRONG order for
    // the CE metric: doc 5 is an exact copy (jaccard 1e6), doc 2 a
    // near-copy, docs 3/4 unrelated
    val cands = Seq((1L, 3L), (1L, 5L), (1L, 2L), (1L, 4L))
      .toDF("query_id", "cand_id")
    def run(bs: Int, parts: Int) =
      Inference.rerankCrossEncoder(cands.repartition(parts), docs, batchSize = bs)
        .orderBy("rnk").as[(Long, Long, Long, Long)].collect().toSeq
    val base = run(32, 1)
    // rank order: exact copy, near-copy, then the unrelated tail
    assert(base.map(_._2) == Seq(5L, 2L, 3L, 4L), base.toString)
    assert(base.head._3 == 1000000L, "exact copy must score 1e6 ppm")
    assert(base(1)._3 > base(2)._3)
    // batching and partition layout are implementation details
    assert(run(1, 1) == base)
    assert(run(3, 4) == base)
    // candidate-bounded: only listed pairs are scored
    assert(base.length == 4)
  }
}
