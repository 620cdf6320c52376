package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, with decode / feature-extraction
  * running batch-wise in executor partitions (the Scala analog of
  * `mapInPandas`: mapPartitions over an explicit schema).
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): [[FakeDecoder]] is a deterministic placeholder that reads
  * header bytes — the Spark-side plumbing (binary column, schema,
  * partition-wise batch processing, metadata struct) is real and tested.
  */
object Multimodal {

  /** Metadata produced per asset by the (stub) decoder. */
  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("fmt", StringType)))

  /** Deterministic fake decoder: in a real deployment this calls the media
    * library on `bytes`; here width/height/format derive from header bytes
    * so tests and oracles are exact. Replace the body, keep the signature. */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      val b0 = if (bytes.length > 0) bytes(0) & 0xFF else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xFF else 0
      val w = (b0 * 7) % 256
      val h = (b1 * 13) % 256
      val fmt = if (b0 % 2 == 0) "png" else "jpg"
      (w, h, fmt)
    }
  }

  /** Attach a binary payload column. For the synthetic corpus the "image
    * bytes" are the UTF-8 text; in production this is the real media blob
    * (parquet BINARY — column remains opaque to Catalyst, metadata columns
    * carry the queryable surface). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Partition-wise decode → metadata table. mapPartitions (not a per-row
    * UDF) so a real decoder can amortize model/library init per batch,
    * exactly like mapInPandas batching. */
  def extractMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val withBytes = withPayload(docs).select(col("doc_id"), col("payload"))
    implicit val enc = RowEncoder.encoderFor(metaSchema)
    withBytes.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, fmt) = FakeDecoder.decode(bytes)
        Row(id, bytes.length.toLong, w, h, fmt)
      }
    }
  }

  /** Feature-extraction schema: fixed-length Array[Float] per asset —
    * the shape an embedding model produces; downstream similarity ops
    * ([[Similarity]]) consume it unchanged. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(FloatType))))

  /** Partition-wise feature extraction (STUB): a real deployment loads
    * the vision/audio model once per partition (amortized like
    * mapInPandas batches) and embeds `payload`; the stub emits a
    * deterministic `dim`-length byte-histogram-style vector so the
    * plumbing — batch init, fixed-length output, float schema — is
    * exercised end-to-end. */
  def extractFeatures(docs: DataFrame, dim: Int = 8): DataFrame = {
    val withBytes = withPayload(docs).select(col("doc_id"), col("payload"))
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    withBytes.mapPartitions { rows =>
      // per-partition init happens HERE in a real decoder (model load)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val acc = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) { acc(i % dim) += (bytes(i) & 0xFF) / 255.0f; i += 1 }
        Row(r.getLong(0), acc.toSeq)
      }
    }
  }

  /** Resize stub: clamp/pad the payload to exactly `outBytes` bytes (a
    * real implementation decodes, resamples to w×h, re-encodes — same
    * column contract: binary in, binary out, size bounded). Keeping the
    * byte budget explicit is what makes 100 TB planning possible:
    * downstream stages can size partitions by row count alone. */
  def resizePayload(docs: DataFrame, outBytes: Int = 64): DataFrame =
    withPayload(docs).select(col("doc_id"),
      // SQL form: rpad/substring keep their BINARY overloads (the Scala
      // rpad(Column,Int,String) would cast the payload to string)
      expr(s"rpad(substring(payload, 1, $outBytes), $outBytes, x'00')")
        .as("payload_resized"))

  /** Deterministic frame/patch sampling stub: every asset yields
    * ceil(n_bytes / stride) "frames", each a bounded slice of the payload —
    * the explode-shaped plumbing a video pipeline needs (asset → frames
    * child table), with partitioning on doc_id preserved. */
  def sampleFrames(docs: DataFrame, stride: Int = 64): DataFrame =
    withPayload(docs)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), expr(s"(length(payload) - 1) DIV $stride")),
          i => hex(col("payload")).substr(i * (stride * 2) + 1, lit(16))))
          .as(Seq("frame_no", "frame_sig")))
}
