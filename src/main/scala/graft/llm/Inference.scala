package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
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
}
