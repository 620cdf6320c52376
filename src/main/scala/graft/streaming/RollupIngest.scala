package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.IncrementalAgg

/** Streaming rollup maintenance — [[graft.operators.IncrementalAgg]]
  * wired into the micro-batch loop: an unbounded event stream keeps a
  * tiny keyed state store current (scalar aggregates + HLL-distinct
  * registers, optionally histogram-percentile buckets and Count-Min
  * frequency registers), and dashboards read the store; raw history is
  * never re-scanned.
  *
  * State commits are VERSIONED SNAPSHOT DIRECTORIES —
  * `<stateDir>/v<batchId>/{scalar,regs}` — committed by a single
  * directory rename, which makes the whole batch (both tables, plus
  * the applied-batch watermark that IS the version number) one atomic
  * unit: the poor-man's form of a transactional table format's commit
  * log. Replay safety follows for free — count/sum are NOT idempotent,
  * so at-least-once redelivery of a batch must be rejected, and it is:
  * a batch whose id is ≤ the latest committed version is skipped
  * (foreachBatch batchIds are monotonic per checkpoint). A crash
  * before the rename leaves only a staging dir the replay overwrites;
  * a crash after it leaves a committed state the replayed batch
  * recognizes. RollupIngestSpec drives all three paths.
  */
object RollupIngest {

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed (batchId, path), if any. */
  def latestVersion(spark: SparkSession, stateDir: String): Option[(Long, String)] = {
    val fs = fsOf(spark, stateDir)
    val root = new Path(stateDir)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .map(s => (s.getPath.getName.drop(1).toLong, s.getPath.toString))
      .sortBy(_._1).lastOption
  }

  /** Fold one micro-batch into the store. Returns false when the batch
    * was already applied (replay) and was skipped. foreachBatch-
    * compatible: `(df, id) => processBatch(df, dir, keys, v, u, id)`. */
  def processBatch(batch: DataFrame, stateDir: String, keys: Seq[String],
                   valueCol: String, distinctCol: String,
                   batchId: Long, keepVersions: Int = 2,
                   histWidth: Long = 0L, freqCol: String = ""): Boolean = {
    val spark = batch.sparkSession
    val latest = latestVersion(spark, stateDir)
    if (latest.exists(_._1 >= batchId)) return false // replayed batch

    val batchScalar = IncrementalAgg.scalarState(batch, keys, valueCol)
    val batchDist = IncrementalAgg.distinctState(batch, keys, distinctCol)
    val (scalar, dist) = latest match {
      case Some((_, p)) => (
        IncrementalAgg.mergeScalar(keys,
          spark.read.parquet(s"$p/scalar"), batchScalar),
        IncrementalAgg.mergeDistinct(keys,
          spark.read.parquet(s"$p/regs"), batchDist))
      case None => (batchScalar, batchDist)
    }
    // optional third state table: the mergeable histogram behind
    // percentile dashboards. Its WIDTH is part of the state (encoded in
    // the dir name, committed by the same rename): buckets computed at
    // different widths must never sum, and a caller that forgets the
    // knob must not silently destroy or fork the accumulated state.
    //   - enabled + prior hist: widths must match (else error) — merge.
    //   - enabled + prior snapshot WITHOUT hist: ERROR — a histogram
    //     started mid-stream would cover a fraction of the history and
    //     serve silently wrong percentiles; enable from the first batch
    //     or rebuild the store.
    //   - disabled + prior hist: CARRY the prior state forward unchanged
    //     (new batch's values are absent from it — the caller opted out
    //     for this batch — but pruning must not erase history). The
    //     opted-out batch id is RECORDED in the snapshot (committed by
    //     the same rename): the carried histogram now permanently
    //     under-covers history, and a reader who couldn't see that
    //     would trust silently-wrong percentiles — staleQuantileBatches
    //     exposes the gap.
    val priorHist: Option[(Long, String)] = latest.flatMap { case (_, p) =>
      fsOf(spark, stateDir).listStatus(new Path(p)).toSeq
        .map(_.getPath.getName).collectFirst {
          case n if n.startsWith("hist_w") => (n.drop(6).toLong, s"$p/$n")
        }
    }
    val hist: Option[(Long, DataFrame)] =
      if (histWidth > 0L) {
        val bh = IncrementalAgg.histogramState(batch, keys, valueCol, histWidth)
        (latest, priorHist) match {
          case (_, Some((w, p))) =>
            require(w == histWidth,
              s"histogram state at $p has width $w, batch uses $histWidth — " +
                "incompatible buckets must not merge")
            Some((histWidth,
              IncrementalAgg.mergeHistogram(keys, spark.read.parquet(p), bh)))
          case (Some(_), None) => throw new IllegalStateException(
            s"store $stateDir has committed history without histogram state; " +
              "a mid-stream histogram would cover partial history and serve " +
              "wrong percentiles — enable histWidth from the first batch")
          case (None, _) => Some((histWidth, bh))
        }
      } else priorHist.map { case (w, p) => (w, spark.read.parquet(p)) }
    // optional fourth state table: Count-Min registers — streaming
    // FREQUENCY maintenance (the sketch trilogy next to HLL-distinct
    // and histogram-percentiles). Same guard semantics as the
    // histogram, for the same reasons: the sketch merge is count
    // addition (not idempotent — the replay guard above protects it),
    // a sketch started mid-stream would under-cover history and serve
    // silently-low estimates (error), and an opted-out batch carries
    // the prior state forward but is RECORDED as stale. The sketch
    // geometry (Depth×Width) is encoded in the dir name and committed
    // by the same rename — registers from different geometries must
    // never sum.
    val freqDims = s"d${graft.functions.CountMin.Depth}w${graft.functions.CountMin.Width}"
    val priorFreq: Option[(String, String)] = latest.flatMap { case (_, p) =>
      fsOf(spark, stateDir).listStatus(new Path(p)).toSeq
        .map(_.getPath.getName).collectFirst {
          case n if n.startsWith("freq_d") => (n.drop(5), s"$p/$n")
        }
    }
    val freq: Option[(String, DataFrame)] =
      if (freqCol.nonEmpty) {
        val bf = graft.functions.CountMin.registers(batch, freqCol)
        (latest, priorFreq) match {
          case (_, Some((d, p))) =>
            require(d == freqDims,
              s"frequency state at $p has geometry $d, batch uses $freqDims — " +
                "incompatible registers must not merge")
            Some((freqDims,
              graft.functions.CountMin.mergeRegisters(spark.read.parquet(p), bf)))
          case (Some(_), None) => throw new IllegalStateException(
            s"store $stateDir has committed history without frequency state; " +
              "a mid-stream sketch would cover partial history and serve " +
              "silently-low estimates — enable freqCol from the first batch")
          case (None, _) => Some((freqDims, bf))
        }
      } else priorFreq.map { case (d, p) => (d, spark.read.parquet(p)) }

    // staleness ledger: ids of batches whose values the histogram is
    // missing (knob forgotten while hist state existed). Once stale,
    // forever stale — the list carries through every later snapshot.
    val priorSkipped = latest.map(l => staleQuantileBatches(spark, stateDir))
      .getOrElse(Seq.empty)
    val skipped =
      if (histWidth == 0L && priorHist.nonEmpty) priorSkipped :+ batchId
      else priorSkipped
    val priorFreqSkipped = latest.map(l => staleFrequencyBatches(spark, stateDir))
      .getOrElse(Seq.empty)
    val freqSkipped =
      if (freqCol.isEmpty && priorFreq.nonEmpty) priorFreqSkipped :+ batchId
      else priorFreqSkipped

    val fs = fsOf(spark, stateDir)
    val staging = new Path(s"$stateDir/.staging_v$batchId")
    if (fs.exists(staging)) fs.delete(staging, true) // prior crashed attempt
    scalar.write.parquet(s"$staging/scalar")
    dist.write.parquet(s"$staging/regs")
    hist.foreach { case (w, df) => df.write.parquet(s"$staging/hist_w$w") }
    freq.foreach { case (d, df) => df.write.parquet(s"$staging/freq_$d") }
    def writeLedger(file: String, ids: Seq[Long]): Unit = if (ids.nonEmpty) {
      val out = fs.create(new Path(s"$staging/$file"), true)
      try out.write(ids.mkString("\n").getBytes("UTF-8")) finally out.close()
    }
    writeLedger(SkippedFile, skipped)
    writeLedger(FreqSkippedFile, freqSkipped)
    // the commit point: one rename publishes both tables + the watermark.
    // rename reports failure as FALSE (dest exists, parent gone), not an
    // exception — ignoring it would drop the batch's non-idempotent
    // counts while the checkpoint advances, so surface it loudly
    if (!fs.rename(staging, new Path(s"$stateDir/v$batchId")))
      throw new java.io.IOException(
        s"rollup commit rename failed: $staging -> $stateDir/v$batchId")

    // retain a couple of snapshots for readers mid-flight, prune the rest
    val versions = fs.listStatus(new Path(stateDir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .sortBy(_.getPath.getName.drop(1).toLong)
    versions.dropRight(keepVersions).foreach(s => fs.delete(s.getPath, true))
    true
  }

  /** The rollup a dashboard reads: finalize the latest snapshot. */
  def currentRollup(spark: SparkSession, stateDir: String, keys: Seq[String],
                    distinctAlias: String): Option[DataFrame] =
    latestVersion(spark, stateDir).map { case (_, p) =>
      IncrementalAgg.finalizeState(
        spark.read.parquet(s"$p/scalar"),
        spark.read.parquet(s"$p/regs"), keys, distinctAlias)
    }

  private val SkippedFile = "hist_skipped_batches"
  private val FreqSkippedFile = "freq_skipped_batches"

  private def readLedger(spark: SparkSession, stateDir: String,
                         file: String): Seq[Long] =
    latestVersion(spark, stateDir).toSeq.flatMap { case (_, p) =>
      val fs = fsOf(spark, stateDir)
      val f = new Path(s"$p/$file")
      if (!fs.exists(f)) Seq.empty
      else {
        val in = fs.open(f)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).map(_.toLong).toList
        finally in.close()
      }
    }

  /** Ids of batches whose values are MISSING from the served histogram
    * (committed with histWidth forgotten while histogram state existed).
    * Non-empty means [[currentQuantiles]] under-covers history — the
    * dashboard-side staleness check for the carry-forward branch of
    * [[processBatch]]. */
  def staleQuantileBatches(spark: SparkSession, stateDir: String): Seq[Long] =
    readLedger(spark, stateDir, SkippedFile)

  /** Ids of batches missing from the served frequency sketch — the
    * [[currentFrequencies]] analog of [[staleQuantileBatches]]. */
  def staleFrequencyBatches(spark: SparkSession, stateDir: String): Seq[Long] =
    readLedger(spark, stateDir, FreqSkippedFile)

  /** Frequency estimates for `values` off the latest snapshot's
    * Count-Min state — the streaming form of q110/q117's sketch reads:
    * dashboards ask "how often has X occurred so far" and the store
    * answers from maintained registers, raw history never re-scanned.
    * Estimates are one-sided (≥ truth, [[graft.functions.CountMin]]).
    * None until a batch has committed with `freqCol` enabled. Pair with
    * [[staleFrequencyBatches]]. */
  def currentFrequencies(spark: SparkSession, stateDir: String,
                         values: DataFrame, valueCol: String): Option[DataFrame] =
    latestVersion(spark, stateDir).flatMap { case (_, p) =>
      fsOf(spark, stateDir).listStatus(new Path(p)).toSeq
        .map(_.getPath.getName).collectFirst {
          case n if n.startsWith("freq_d") =>
            // the read path must enforce the geometry the dir name
            // encodes, exactly like the write path: estimating stored
            // d4w2048 registers with different compile-time constants
            // would address cells the store never wrote, read coalesced
            // zeros, and silently break the one-sided est ≥ truth
            // contract
            val dims = s"d${graft.functions.CountMin.Depth}w${graft.functions.CountMin.Width}"
            if (n.drop(5) != dims) throw new IllegalStateException(
              s"frequency state $p/$n has geometry ${n.drop(5)}, this build " +
                s"estimates with $dims — mismatched registers would serve " +
                "silently-low estimates")
            graft.functions.CountMin.estimate(
              spark.read.parquet(s"$p/$n"), values, valueCol)
        }
    }

  /** Per-key percentile estimates off the latest snapshot's histogram
    * state — the streaming form of q96: dashboards read quantiles the
    * store maintained, raw history never re-scanned. The bucket width
    * is read from the state itself (it was committed with it), so a
    * caller cannot misinterpret the buckets at a different scale. None
    * until a batch has committed with `histWidth` enabled. Pair with
    * [[staleQuantileBatches]]: a non-empty list means batches were
    * folded in with the knob forgotten and these estimates under-cover
    * history. */
  def currentQuantiles(spark: SparkSession, stateDir: String,
                       keys: Seq[String],
                       quantilesPermille: Seq[Int]): Option[DataFrame] =
    latestVersion(spark, stateDir).flatMap { case (_, p) =>
      fsOf(spark, stateDir).listStatus(new Path(p)).toSeq
        .map(_.getPath.getName).collectFirst {
          case n if n.startsWith("hist_w") =>
            IncrementalAgg.quantilesFromState(
              spark.read.parquet(s"$p/$n"), keys, n.drop(6).toLong,
              quantilesPermille)
        }
    }

  /** Structured Streaming driver over a file-drop source. */
  def start(spark: SparkSession, inputDir: String,
            schema: org.apache.spark.sql.types.StructType,
            stateDir: String, checkpoint: String, keys: Seq[String],
            valueCol: String, distinctCol: String, histWidth: Long = 0L,
            freqCol: String = "") =
    spark.readStream.schema(schema).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, id: Long) =>
        processBatch(df, stateDir, keys, valueCol, distinctCol, id,
          histWidth = histWidth, freqCol = freqCol); ()
      }
      .start()
}
