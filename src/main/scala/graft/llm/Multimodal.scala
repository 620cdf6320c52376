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

  /** PERCEPTUAL HASH over the decoded payload — the aHash construction
    * (bit b = 1 iff region b's mass ≥ the global mean) every public
    * multimodal pipeline uses to dedup images before training (LAION's
    * pHash dedup): runs in the mapPartitions decode seam because a real
    * pHash needs the decoded pixels (here the payload bytes stand in —
    * deterministic integer slot sums, so the hash is oracle-exact).
    * 64 bits as one BIGINT: integer cross-multiplied mean comparison
    * (sum_b · 64 ≥ total), no float anywhere.
    *
    * Zero-length (and null) payloads are EXCLUDED: an empty asset has
    * no content to fingerprint — all slot sums 0 would make every
    * `0·64 ≥ 0` bit test true, hashing EVERY empty doc to -1L and
    * pairing them all at hamming 0 (and the q135 oracle generates no
    * slot rows for empty text, so the row would diverge cross-engine).
    * Dropping them matches the oracle's implicit drop. */
  def perceptualHash(docs: DataFrame, bits: Int = 64): DataFrame = {
    require(bits == 64, "the packed-BIGINT layout is 64-bit")
    val withBytes = withPayload(docs).select(col("doc_id"), col("payload"))
      .filter(length(col("payload")) > 0)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("phash", LongType)))
    implicit val enc = RowEncoder.encoderFor(schema)
    withBytes.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val sums = new Array[Long](64)
        var i = 0
        while (i < bytes.length) { sums(i % 64) += (bytes(i) & 0xFF); i += 1 }
        val total = sums.sum
        var h = 0L
        var b = 0
        while (b < 64) { if (sums(b) * 64 >= total) h |= (1L << b); b += 1 }
        Row(r.getLong(0), h)
      }
    }
  }

  /** Near-duplicate assets by perceptual-hash hamming distance — the
    * multimodal face of [[graft.llm.Dedup.simHashPairs64]]: pigeonhole
    * chunk banding (4 × 16-bit chunks; any pair within hamming ≤ 3
    * shares at least one chunk, so the candidate join is EXACT for the
    * default radius), then a popcount verify. One hash scan, one
    * chunk-keyed equi-join — never all-pairs. */
  def perceptualNearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole is exact only to hamming 3")
    val ph = graft.llm.Stage(perceptualHash(docs))
    val chunks = ph.select(col("doc_id"), col("phash"),
      posexplode(array((0 until 4).map(k =>
        expr(s"shiftright(phash, ${k * 16}) & 65535")): _*)).as(Seq("k", "cv")))
    val a = chunks.as("a"); val b = chunks.as("b")
    a.join(b, col("a.k") === col("b.k") && col("a.cv") === col("b.cv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
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
