package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batched model-inference plumbing — the EMBED-THE-CORPUS step that
  * produces the vectors every ANN/dedup/semantic operator downstream
  * consumes. The model call is STUBBED ([[FakeEmbedder]] — no ML
  * runtime in this container); the Spark side is the real production
  * shape and is what's tested:
  *
  *   - `mapPartitions`, never a per-row UDF: a real embedder amortizes
  *     model load ONCE per partition and runs the forward pass over
  *     micro-batches of `batchSize` texts (the exact `mapInPandas`
  *     batching discipline, in Scala);
  *   - input partition count controls inference parallelism — at
  *     1000 executors `repartition(nTasks)` before this is the
  *     GPU-fleet sizing knob, and partitions are the retry unit;
  *   - output is (doc_id, embedding float[dim]) — the `embeddings`
  *     table schema, so the result drops straight into
  *     [[Similarity]] / [[graft.streaming.VectorIngest]].
  *
  * [[FakeEmbedder]] is deterministic (token-fold features, L2-ish
  * integer normalization) so specs assert exact values, batch-size
  * invariance, and schema — swap the object, keep the signature. */
object Inference {

  def embeddingSchema(dim: Int): StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Deterministic stand-in for a sentence-embedding model: feature
    * d = folded count-weighted hash of the tokens hitting dimension d.
    * Values depend only on the text — batch split and partition layout
    * must never change them (the spec's core assertion). */
  object FakeEmbedder {
    def embedBatch(texts: Seq[String], dim: Int): Seq[Array[Float]] =
      texts.map { t =>
        val acc = new Array[Long](dim)
        t.split(" ").foreach { tok =>
          var h = 7L
          tok.foreach(c => h = (h * 131 + c) % 4294967291L)
          val d = (h % dim).toInt
          acc(d) += (h % 1000) + 1
        }
        val norm = math.max(1L, acc.map(v => v * v).sum)
        val s = math.sqrt(norm.toDouble)
        acc.map(v => (v / s).toFloat)
      }
  }

  /** Embed a (doc_id, text) table. `batchSize` is the forward-pass
    * micro-batch: the iterator is consumed lazily in `grouped` chunks,
    * so peak memory per task is one batch of texts + vectors, not the
    * partition. */
  def embedDocuments(docs: DataFrame, dim: Int = 64,
                     batchSize: Int = 32): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(embeddingSchema(dim))
    // coerce at the boundary: an IntegerType doc_id or a NULL text must
    // not crash a task deep inside the partition loop
    docs.select(col("doc_id").cast("long").as("doc_id"),
        coalesce(col("text"), lit("")).as("text"))
      .mapPartitions { rows =>
        // a real implementation loads the model HERE, once per partition
        rows.grouped(batchSize).flatMap { batch =>
          val vecs = FakeEmbedder.embedBatch(batch.map(_.getString(1)), dim)
          batch.zip(vecs).map { case (r, v) => Row(r.getLong(0), v) }
        }
      }
  }

  /** Deterministic stand-in for a cross-encoder relevance model (the
    * monoBERT / MiniLM rerankers of production retrieval): score =
    * exact integer-ppm token-set Jaccard of the pair. The SEAM is the
    * point — a real cross-encoder is swapped in object-for-object; the
    * stub's arithmetic is SQL-replayable so q158 can hash-check the
    * whole retrieve-then-rerank pipeline, not just its row counts. */
  object FakeCrossEncoder {
    def scoreBatch(pairs: Seq[(String, String)]): Seq[Long] =
      pairs.map { case (q, d) =>
        val qs = q.split(" ").iterator.filter(_.nonEmpty).toSet
        val ds = d.split(" ").iterator.filter(_.nonEmpty).toSet
        val u = qs.union(ds).size
        if (u == 0) 0L else qs.intersect(ds).size.toLong * 1000000L / u
      }
  }

  /** CROSS-ENCODER re-ranking — the second stage of the production
    * retrieve-then-rerank stack (BM25 / ANN fetch a candidate set
    * cheaply; an expensive pairwise model re-orders only those
    * candidates). `cands` is (query_id, cand_id) from ANY retriever —
    * [[graft.llm.Corpus]] BM25 top-k, a [[graft.streaming.VectorIngest]]
    * probe, [[Similarity.rrfFuse]]d lists; `texts` is the (doc_id,
    * text) table both sides' text is fetched from BY ID, so the model
    * sees candidate-bounded pairs only — |queries|·k forward passes,
    * never a corpus scan.
    *
    * Same inference discipline as [[embedDocuments]]: `mapPartitions`
    * (model loads once per partition), lazily `grouped(batchSize)`
    * forward passes, partition count = the GPU-fleet sizing knob.
    * Returns (query_id, cand_id, ce_ppm, rnk) with rnk the per-query
    * rank under (score desc, cand_id) — deterministic, and exact with
    * the [[FakeCrossEncoder]] stub. */
  def rerankCrossEncoder(cands: DataFrame, texts: DataFrame,
                         batchSize: Int = 32): DataFrame = {
    val q = texts.select(col("doc_id").as("query_id"), col("text").as("q_text"))
    val d = texts.select(col("doc_id").as("cand_id"), col("text").as("d_text"))
    val joined = cands.select(col("query_id").cast("long").as("query_id"),
        col("cand_id").cast("long").as("cand_id"))
      .join(q, Seq("query_id")).join(d, Seq("cand_id"))
      .select(col("query_id"), col("cand_id"),
        coalesce(col("q_text"), lit("")).as("q_text"),
        coalesce(col("d_text"), lit("")).as("d_text"))
    implicit val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("query_id", LongType), StructField("cand_id", LongType),
      StructField("ce_ppm", LongType))))
    val scored = joined.mapPartitions { rows =>
      // a real implementation loads the cross-encoder HERE, once per task
      rows.grouped(batchSize).flatMap { batch =>
        val scores = FakeCrossEncoder.scoreBatch(
          batch.map(r => (r.getString(2), r.getString(3))))
        batch.zip(scores).map { case (r, sc) =>
          Row(r.getLong(0), r.getLong(1), sc)
        }
      }
    }
    val w = Window.partitionBy("query_id")
      .orderBy(col("ce_ppm").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
  }
}
