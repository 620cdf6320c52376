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

    /** Decode with an explicit FAILURE mode — a real media decoder
      * throws on truncated/corrupt payloads; the stub fails on anything
      * too short to carry the 2-byte header it reads. None = quarantine
      * the asset, never guess dimensions. */
    def tryDecode(bytes: Array[Byte]): Option[(Int, Int, String)] =
      if (bytes == null || bytes.length < 2) None else Some(decode(bytes))
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
  def perceptualNearDupPairs(docs: DataFrame, maxHamming: Int = 3,
                             maxBandDf: Long = Dedup.CorpusDerivedCap): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole is exact only to hamming 3")
    val ph = graft.llm.Stage(perceptualHash(docs))
    // shared chunk-band core with the text SimHash family — one owner
    // for the candidate join, the popcount verify AND the hot-bucket
    // cap (an exact-dup asset class shares all 4 chunks, the same
    // bucket blowup; [[Dedup.CorpusDerivedCap]] bounds it by default,
    // Long.MaxValue opts out for the oracle-checked uncut forms; the
    // sentinel resolves inside the core, fused with the broadcast-gate
    // stats pass — no separate count job here).
    Dedup.chunkBandPairs(ph, "phash", nChunks = 4, chunkBits = 16,
      maxHamming = maxHamming, maxBandDf0 = maxBandDf)
  }

  /** Per-asset quality stats + gates — the LAION-style filter stage next
    * to [[perceptualHash]]: decode-failure detection, decoded dimensions,
    * aspect ratio, and a content-concentration proxy for entropy, each
    * gate an exact-ppm 0/1 column packed into a mask (the q109 Gopher
    * shape, so downstream curation composes identically for text and
    * media). Runs in the mapPartitions decode seam — a REAL pipeline
    * needs the decoded pixels for every one of these; the stub derives
    * them from the payload bytes so the oracle is exact.
    *
    * Gates (all integer arithmetic — a float entropy would differ in
    * ulps across engines; max-byte share catches the same near-constant
    * payloads exactly):
    *   g1 decodable        — [[FakeDecoder.tryDecode]] succeeded
    *   g2 min dimensions   — width ≥ minDim AND height ≥ minDim
    *   g3 aspect ratio     — width·1e6/height within [lo, hi] ppm
    *   g4 content entropy  — no byte value holds > maxBytePpm of the
    *                         payload (near-constant content ⇒ one value
    *                         dominates; an empty payload counts as fully
    *                         concentrated)
    * Undecodable assets carry zero dims/aspect and fail g1 (and so the
    * overall `pass`), but still emit a row — quarantine needs the
    * evidence. Output: (doc_id, n_bytes, width, height, aspect_ppm,
    * maxbyte_ppm, rule_mask, pass), all BIGINT. */
  def qualityStats(docs: DataFrame, minDim: Int = 8,
                   aspectLoPpm: Long = 250000L, aspectHiPpm: Long = 4000000L,
                   maxBytePpm: Long = 500000L): DataFrame =
    statsWithFmt(docs, minDim, aspectLoPpm, aspectHiPpm, maxBytePpm)
      .drop("fmt")

  /** The decode-seam pass behind [[qualityStats]] and [[dataCard]] —
    * one mapPartitions over the payloads produces the gate stats AND
    * the decoded format ('none' where tryDecode quarantines), so a
    * consumer needing both never scans or joins the corpus twice. */
  private def statsWithFmt(docs: DataFrame, minDim: Int,
                           aspectLoPpm: Long, aspectHiPpm: Long,
                           maxBytePpm: Long): DataFrame = {
    val withBytes = withPayload(docs).select(col("doc_id"), col("payload"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_bytes", LongType),
      StructField("width", LongType), StructField("height", LongType),
      StructField("aspect_ppm", LongType), StructField("maxbyte_ppm", LongType),
      StructField("rule_mask", LongType), StructField("pass", LongType),
      StructField("fmt", StringType)))
    implicit val enc = RowEncoder.encoderFor(schema)
    withBytes.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val n = if (bytes == null) 0L else bytes.length.toLong
        val dec = FakeDecoder.tryDecode(bytes)
        val (w, h) = dec match {
          case Some((dw, dh, _)) => (dw.toLong, dh.toLong)
          case None => (0L, 0L)
        }
        val aspect = if (h > 0) w * 1000000L / h else 0L
        var maxCount = 0L
        if (n > 0) {
          val counts = new Array[Long](256)
          var i = 0
          while (i < bytes.length) { counts(bytes(i) & 0xFF) += 1; i += 1 }
          var j = 0
          while (j < 256) { if (counts(j) > maxCount) maxCount = counts(j); j += 1 }
        }
        val share = if (n > 0) maxCount * 1000000L / n else 1000000L
        val g1 = if (dec.isDefined) 1L else 0L
        val g2 = if (w >= minDim && h >= minDim) 1L else 0L
        val g3 = if (aspect >= aspectLoPpm && aspect <= aspectHiPpm) 1L else 0L
        val g4 = if (share <= maxBytePpm) 1L else 0L
        Row(r.getLong(0), n, w, h, aspect, share,
          g1 + g2 * 2 + g3 * 4 + g4 * 8,
          if (g1 + g2 + g3 + g4 == 4) 1L else 0L,
          dec match { case Some((_, _, f)) => f case None => "none" })
      }
    }
  }

  /** [[qualityStats]]' verdict joined back onto the documents as
    * `mm_pass` — the composition seam into ingest: pass the result as
    * the batch with `qualityPred = Some(col("mm_pass") === 1)` and
    * [[graft.streaming.CorpusIngest.processBatch]] quarantines failing
    * assets with reason 'quality' at the door. The join is by doc_id
    * (the stats frame is 8 longs/row — tiny next to payloads). */
  def attachQualityVerdict(docs: DataFrame, minDim: Int = 8,
                           aspectLoPpm: Long = 250000L,
                           aspectHiPpm: Long = 4000000L,
                           maxBytePpm: Long = 500000L): DataFrame =
    docs.join(
      qualityStats(docs, minDim, aspectLoPpm, aspectHiPpm, maxBytePpm)
        .select(col("doc_id"), col("pass").as("mm_pass")),
      Seq("doc_id"), "left")

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

  /** Per-modality DATA CARD — the release-notes table a multimodal
    * corpus ships with (the q138 composition report over the decode
    * seam): one row per (decoded format × quality verdict) with asset
    * counts, byte mass, exact integer mean dimensions, and each
    * group's share of the corpus in ppm. Format reads the stub
    * decoder's header rule (b0 even → png, odd → jpg, undecodable →
    * 'none'); the verdict is [[qualityStats]]' composed gate, so the
    * card splits every format into its keep/quarantine masses — the
    * table an ops review reads before training on the corpus.
    *
    * Scale shape: ONE decode-seam scan produces stats AND format
    * ([[statsWithFmt]] — no second corpus scan, no corpus-size join),
    * a groupBy over a handful of (fmt, pass) groups (map-side partial
    * agg), and a 1-row broadcast total — no new corpus-scale surface. */
  def dataCard(docs: DataFrame): DataFrame = {
    val g = statsWithFmt(docs, minDim = 8, aspectLoPpm = 250000L,
        aspectHiPpm = 4000000L, maxBytePpm = 500000L)
      .groupBy("fmt", "pass")
      .agg(count(lit(1)).as("n_assets"),
        sum("n_bytes").as("bytes_total"),
        sum("width").as("__w"), sum("height").as("__h"))
    val total = g.agg(coalesce(sum("n_assets"), lit(0L)).as("__t"))
    g.crossJoin(broadcast(total))
      .select(col("fmt"), col("pass"), col("n_assets"), col("bytes_total"),
        expr("__w DIV n_assets").as("avg_width"),
        expr("__h DIV n_assets").as("avg_height"),
        expr("n_assets * 1000000L DIV greatest(__t, 1L)").as("share_ppm"))
  }

  /** Byte-BIGRAM histogram over the payload — the deterministic
    * embedding stub behind [[crossModalEval]]: slot (b_i·31 + b_{i+1})
    * mod `dim`, value = exact count (emitted as integer-valued DOUBLE,
    * so dot products and norms are bit-identical on any engine — every
    * sum stays far under 2⁵³). `fromHalf` embeds only the payload's
    * second half — the "caption" side, which sees part of the content:
    * correlated with the full-payload side but not identical, so the
    * retrieval eval measures something. Runs in the mapPartitions
    * decode seam (a real pipeline embeds pixels/caption tokens here;
    * the byte machinery stands in, oracle-exact). */
  def bigramHistogram(docs: DataFrame, dim: Int = 16,
                      fromHalf: Boolean = false): DataFrame = {
    val withBytes = withPayload(docs).select(col("doc_id"), col("payload"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(DoubleType))))
    implicit val enc = RowEncoder.encoderFor(schema)
    withBytes.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val n = if (bytes == null) 0 else bytes.length
        val acc = new Array[Double](dim)
        var i = if (fromHalf) n / 2 else 0
        while (i < n - 1) {
          acc(((bytes(i) & 0xFF) * 31 + (bytes(i + 1) & 0xFF)) % dim) += 1.0
          i += 1
        }
        Row(r.getLong(0), acc.toSeq)
      }
    }
  }

  /** CLIP-STYLE CROSS-MODAL RETRIEVAL EVAL — the representation-quality
    * probe a paired image/caption corpus runs before training on it
    * (recall@k / reciprocal rank of text→image retrieval, the CLIP and
    * LAION eval): for a bounded probe set of "caption" embeddings
    * ([[bigramHistogram]] fromHalf — the stub caption sees half the
    * content), rank every "image" embedding (full payload) by cosine
    * and score where the TRUE pair (same doc_id) lands. Emitted per
    * language: (lang, n_queries, hits_at1, hits_atk, rr_sum_ppm) with
    * rr_sum_ppm = Σ 10⁶ DIV rank — all exact integers.
    *
    * Scale shape: the probe set is bounded ([[Corpus.balancedSample]],
    * `perLang` per language) and BROADCAST against one scan of the
    * image side — the [[Similarity.bruteForceKnn]] eval shape, no
    * all-pairs shuffle. The true pair's rank is computed by COUNTING
    * candidates that beat it (sim >, or sim = with lower id), never by
    * materializing a global top-k sort: one groupBy per probe. Probes
    * or candidates with zero-norm embeddings are excluded on both
    * engines. At 100 TB the same probe-count-bounded plan holds; an
    * ANN-fed variant swaps the scan for [[Similarity.lshKnnComposite]]
    * candidates. */
  def crossModalEval(docs: DataFrame, k: Int = 5, dim: Int = 16,
                     perLang: Int = 8): DataFrame = {
    import graft.llm.{Corpus, Similarity, Stage}
    val img = Stage(bigramHistogram(docs, dim, fromHalf = false))
    val txt = bigramHistogram(docs, dim, fromHalf = true)
    val probeIds = Corpus.balancedSample(docs, "lang", perLang)
      .select(col("doc_id"), col("lang"))
    // the probe table is bounded (perLang × languages) and consumed by
    // BOTH the scoring cross join and the true-pair equi-join — stage
    // it once so the caption histogram + sample window run once, not
    // per consumer
    val probes = broadcast(Stage(txt.join(probeIds, Seq("doc_id"))
      .select(col("doc_id").as("query_id"), col("lang"),
        col("features").as("q_emb"))
      .withColumn("q_norm", Similarity.norm(col("q_emb")))
      .filter(col("q_norm") > 0)))
    val cands = img
      .select(col("doc_id").as("cand_id"), col("features").as("c_emb"))
      .withColumn("c_norm", Similarity.norm(col("c_emb")))
      .filter(col("c_norm") > 0)
    val scored = cands.crossJoin(probes)
      .withColumn("sim", Similarity.dot(col("q_emb"), col("c_emb")) /
        (col("q_norm") * col("c_norm")))
      .select("query_id", "lang", "cand_id", "sim")
    // the true pair's similarity — one NARROW equi-join of the probe
    // set against the image side (one row per surviving probe), never
    // a second pass over the probes × corpus stream; the identical
    // expression over the identical vectors yields the identical
    // double the cross-join row would carry
    val tru = broadcast(probes.join(cands,
        col("cand_id") === col("query_id"))
      .select(col("query_id"),
        (Similarity.dot(col("q_emb"), col("c_emb")) /
          (col("q_norm") * col("c_norm"))).as("sim_true")))
    val ranks = scored.join(tru, Seq("query_id"))
      .groupBy("query_id", "lang")
      .agg((lit(1L) + sum(when(col("sim") > col("sim_true") ||
          (col("sim") === col("sim_true") && col("cand_id") < col("query_id")),
        1L).otherwise(0L))).as("rank"))
    ranks.groupBy("lang")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("rank") === 1L, 1L).otherwise(0L)).as("hits_at1"),
        sum(when(col("rank") <= k, 1L).otherwise(0L)).as(s"hits_at$k"),
        sum(expr("1000000L DIV rank")).as("rr_sum_ppm"))
  }

  /** ANN-FED CROSS-MODAL RETRIEVAL EVAL — [[crossModalEval]]'s 100 TB
    * serving form (the promise in that scaladoc): instead of ranking
    * the true pair against EVERY image embedding (one full-corpus scan
    * per eval), candidates come from the composite LSH index
    * ([[Similarity.lshCompositeCandidates]] — the same deterministic
    * plane construction the ANN serving path hashes with), and the
    * true pair's rank is counted WITHIN the retrieved set. A probe
    * whose true pair the index fails to retrieve is a MISS — reported
    * through `n_retrieved` (< `n_queries` measures index recall on the
    * true pairs) and contributing nothing to hits/rr, exactly how a
    * production eval over an ANN index reads.
    *
    * Scale shape: the corpus-side bucket table is one narrow
    * projection of the image histograms (no shuffle), the probe side
    * is bounded × broadcast with its probe-bucket explosion
    * (L·Σ C(planes,i) rows per probe), and the candidate join is an
    * equi-join on (tbl, bucket) followed by id-equi-joins back to the
    * embeddings — never a probes × corpus cross join. Recall floors vs
    * the exact form are spec-asserted (AnnRecallSpec discipline);
    * `dropSelfPairs = false` because text and image sides share the
    * id namespace and (i,i) IS the true pair. */
  def crossModalEvalAnn(docs: DataFrame, k: Int = 5, dim: Int = 16,
                        perLang: Int = 8, planes: Int = 4,
                        tables: Int = 1, probeHamming: Int = 1): DataFrame = {
    import graft.llm.{Corpus, Similarity, Stage}
    val img = Stage(bigramHistogram(docs, dim, fromHalf = false))
    val txt = bigramHistogram(docs, dim, fromHalf = true)
    val probeIds = Corpus.balancedSample(docs, "lang", perLang)
      .select(col("doc_id"), col("lang"))
    val probes = broadcast(Stage(txt.join(probeIds, Seq("doc_id"))
      .select(col("doc_id").as("query_id"), col("lang"),
        col("features").as("q_emb"))
      .withColumn("q_norm", Similarity.norm(col("q_emb")))
      .filter(col("q_norm") > 0)))
    val cands = img
      .select(col("doc_id").as("cand_id"), col("features").as("c_emb"))
      .withColumn("c_norm", Similarity.norm(col("c_emb")))
      .filter(col("c_norm") > 0)
    val candPairs = Similarity.lshCompositeCandidates(
      cands.select(col("cand_id").as("vec_id"), col("c_emb").as("embedding")),
      probes.select(col("query_id").as("vec_id"), col("q_emb").as("embedding")),
      planes, dim, tables, probeHamming, dropSelfPairs = false)
      .select(col("query_id"), col("neighbor_id").as("cand_id"))
    val scored = candPairs
      .join(cands, Seq("cand_id"))
      .join(probes, Seq("query_id"))
      .withColumn("sim", Similarity.dot(col("q_emb"), col("c_emb")) /
        (col("q_norm") * col("c_norm")))
      .select("query_id", "lang", "cand_id", "sim")
    // the true pair counts only when the INDEX retrieved it — the whole
    // point of the ANN-fed form; rank is counted within the candidates
    val tru = scored.filter(col("cand_id") === col("query_id"))
      .select(col("query_id"), col("sim").as("sim_true"))
    val ranks = scored.join(tru, Seq("query_id"))
      .groupBy("query_id")
      .agg((lit(1L) + sum(when(col("sim") > col("sim_true") ||
          (col("sim") === col("sim_true") && col("cand_id") < col("query_id")),
        1L).otherwise(0L))).as("rank"))
    probes.select("query_id", "lang")
      .join(ranks, Seq("query_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("rank").isNotNull, 1L).otherwise(0L)).as("n_retrieved"),
        sum(when(col("rank") === 1L, 1L).otherwise(0L)).as("hits_at1"),
        sum(when(col("rank") <= k, 1L).otherwise(0L)).as(s"hits_at$k"),
        coalesce(sum(expr("1000000L DIV rank")), lit(0L)).as("rr_sum_ppm"))
  }

  /** CAPTION–IMAGE AGREEMENT SCORE — one decode-seam scan emitting the
    * cross-modal cosine per PAIRED asset (LAION / DataComp's curation
    * signal: CLIP similarity between an image and its caption; Schuhmann
    * et al. 2021 filter at cosine 0.3). Both modality embeddings are
    * the [[bigramHistogram]] stub computed in ONE mapPartitions pass
    * over the payload (full payload = "image", second half = "caption"
    * — the q186 construction), fused so the corpus is scanned once and
    * the output is the narrowest possible frame: (doc_id, lang,
    * agree_ppm) with agree_ppm = ⌊cosine·10⁶⌋. Counts are
    * integer-valued doubles, so dot/norm/floor are bit-identical on
    * any engine; zero-norm sides (payloads under 2 bytes, or an empty
    * half) score 0 — an asset with no caption content has no measurable
    * agreement and belongs below every calibrated threshold. */
  def captionAgreementScores(docs: DataFrame, dim: Int = 16): DataFrame = {
    val withBytes = withPayload(docs)
      .select(col("doc_id"), col("lang"), col("payload"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("agree_ppm", LongType)))
    implicit val enc = RowEncoder.encoderFor(schema)
    withBytes.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](2)
        val n = if (bytes == null) 0 else bytes.length
        val full = new Array[Double](dim)
        val half = new Array[Double](dim)
        var i = 0
        while (i < n - 1) {
          val slot = ((bytes(i) & 0xFF) * 31 + (bytes(i + 1) & 0xFF)) % dim
          full(slot) += 1.0
          if (i >= n / 2) half(slot) += 1.0
          i += 1
        }
        var dot = 0.0; var n2f = 0.0; var n2h = 0.0
        var j = 0
        while (j < dim) {
          dot += full(j) * half(j)
          n2f += full(j) * full(j)
          n2h += half(j) * half(j)
          j += 1
        }
        val agree =
          if (n2f == 0.0 || n2h == 0.0) 0L
          else math.floor(dot / (math.sqrt(n2f) * math.sqrt(n2h)) * 1e6).toLong
        Row(r.getLong(0), r.getString(1), agree)
      }
    }
  }

  /** CAPTION–IMAGE AGREEMENT FILTER — the curation step after the
    * eval ([[crossModalEval]] measures corpus-wide retrieval quality;
    * THIS drops the individual pairs whose modalities disagree): each
    * asset keeps iff its [[captionAgreementScores]] cosine clears a
    * PER-LANGUAGE calibrated threshold — the `dropPermille` lower tail
    * of that language's score distribution drops (a fixed global
    * cosine cut is miscalibrated across languages/stub-alphabets; the
    * q166 discipline calibrates per group). The threshold derives from
    * MAINTAINED histogram state: per-language bucket counts fold
    * mergeably across ingest batches ([[graft.operators
    * .IncrementalAgg]] — here two doc-disjoint batches, proving
    * fold == one-shot by the oracle hash), so at 100 TB the
    * calibration never rescans history.
    *
    * Scale shape: one decode-seam scan (the scores), one map-side
    * bucket aggregate per batch over (lang, bucket) — tiny state —
    * and a BROADCAST threshold join + narrow CASE back on the scores.
    * No sort, no window over the corpus. Returns (doc_id, lang,
    * agree_ppm, thr_ppm, keep) — `keep` = 1 iff agree_ppm ≥ the
    * language's threshold; languages with no calibrated bucket (never
    * at this arithmetic: every scored doc lands in some bucket) keep
    * by default, the [[graft.llm.Corpus.tiersFromThresholds]]
    * fail-open rule. */
  def captionAgreementFilter(docs: DataFrame, dim: Int = 16,
                             dropPermille: Int = 250,
                             bucketPpm: Long = 50000L): DataFrame = {
    import graft.operators.IncrementalAgg
    val scored = Stage(captionAgreementScores(docs, dim))
    val folded = IncrementalAgg.mergeHistogram(Seq("lang"),
      IncrementalAgg.histogramState(
        scored.filter(col("doc_id") % 2 === 0), Seq("lang"), "agree_ppm", bucketPpm),
      IncrementalAgg.histogramState(
        scored.filter(col("doc_id") % 2 =!= 0), Seq("lang"), "agree_ppm", bucketPpm))
    val thr = IncrementalAgg.quantilesFromState(folded, Seq("lang"),
        bucketPpm, Seq(dropPermille))
      .select(col("lang"), col("est_upper").as("thr_ppm"))
    scored.join(broadcast(thr), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("agree_ppm"),
        coalesce(col("thr_ppm"), lit(Long.MinValue)).as("thr_ppm"),
        when(col("thr_ppm").isNull || col("agree_ppm") >= col("thr_ppm"), 1L)
          .otherwise(0L).as("keep"))
  }

  /** [[captionAgreementFilter]]'s verdict joined back onto the batch as
    * `agree_pass` — the composition seam into ingest (the
    * [[attachQualityVerdict]] pattern): pass the result as the batch
    * with `qualityPred = Some(col("agree_pass") === 1)` and
    * [[graft.streaming.CorpusIngest.processBatch]] quarantines
    * disagreeing pairs with reason 'quality' at the door. `thresholds`
    * is the maintained (lang, thr_ppm) table — at serving time it
    * comes from folded histogram state, not a rescan, so this is a
    * broadcast join + narrow expression per batch row. */
  def attachAgreementVerdict(batch: DataFrame, thresholds: DataFrame,
                             dim: Int = 16): DataFrame =
    batch.join(
      captionAgreementScores(batch, dim)
        .join(broadcast(thresholds), Seq("lang"), "left")
        .select(col("doc_id"),
          when(col("thr_ppm").isNull || col("agree_ppm") >= col("thr_ppm"), 1L)
            .otherwise(0L).as("agree_pass")),
      Seq("doc_id"), "left")

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
