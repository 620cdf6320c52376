package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.llm.Dedup

/** Streaming corpus ingest with incremental dedup — the LLM-pipeline
  * counterpart of [[WebhookPipeline]]: an unbounded stream of documents
  * is folded into a training corpus while near-duplicates are dropped
  * at the door.
  *
  * The persistent artifacts are the MinHash SIGNATURE STORE (a parquet
  * dir of doc_id, h0..h{numPerms-1}) and the [[ReplayGuard]] admission
  * ledger beside it: per micro-batch,
  *   1. replayed doc_ids are dropped by the guard (at-least-once
  *      delivery → at-most-once admission per id) — bloom-prefiltered
  *      and id-bucketed, so the replay check costs O(batch), never
  *      O(everything ever admitted) (the earlier form anti-joined each
  *      batch against the full store's doc_ids);
  *   2. [[Dedup.dedupIncremental]] drops batch docs near-duplicating
  *      the store or an earlier batchmate — cost scales with the batch
  *      plus the signature store, corpus TEXT is never re-read;
  *   3. the guard records the admitted ids, survivors' signatures
  *      append to the store, then the documents to the corpus dir.
  * The appends are not one transaction on plain parquet; ledger and
  * store are written FIRST (fail-closed): a crash between them leaves a
  * doc ledgered but absent from the corpus, so the replay guard drops
  * it — the corpus never holds a duplicate row. (The opposite order
  * would re-admit on replay: at-least-once duplicates downstream would
  * have to absorb.) [[reconcile]] detects those orphans and can evict
  * them so a corrected re-send is admitted. On a transactional table
  * format all appends join one commit and the pipeline is exactly-once
  * with no drop window.
  */
object CorpusIngest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** One micro-batch: returns the number of admitted documents.
    * foreachBatch-compatible.
    *
    * The [[ReplayGuard]] at `<sigDir>_guard` is the ADMISSION LEDGER:
    * every admitted doc_id is recorded, including documents too short
    * to shingle — without the ledger row a short doc would be
    * re-admitted on every at-least-once replay. (Their signature rows
    * still land in the store with NULL h-columns: null band hashes
    * never equi-join, so they contribute no dedup candidates, and the
    * store stays a complete signature archive of the corpus.) A store
    * created before the guard existed is migrated on first touch — a
    * one-time O(store) seed. Duplicate ids within one batch are
    * collapsed first (replayed lines are byte-identical, so which row
    * survives is immaterial).
    *
    * Production knobs:
    *   - `maxBandDf` caps any one (band, band_hash) bucket across
    *     store + batch ([[Dedup.dedupIncrementalSigs]]) — the store is
    *     deduped by construction, but families of just-below-threshold
    *     documents can still pile into shared buckets over months of
    *     ingest; the cap bounds that tail.
    *   - `benchmark` (doc_id, text) enables DECONTAMINATION AT THE
    *     DOOR: batch docs sharing more than `maxBenchShared` distinct
    *     `decontamK`-gram shingles with the benchmark set are rejected
    *     before dedup — cheaper than scrubbing the corpus later, and
    *     the rejection leaves no ledger row, so a cleaned-up re-send of
    *     the same doc_id can be admitted. */
  def processBatch(batch: DataFrame, corpusDir: String, sigDir: String,
                   k: Int = 3, numPerms: Int = 32, bands: Int = 8,
                   minEstPpm: Long = 500000L,
                   maxBandDf: Long = Long.MaxValue,
                   benchmark: Option[DataFrame] = None,
                   decontamK: Int = 8, maxBenchShared: Long = 0L,
                   batchId: Long = 0L): Long = {
    val spark = batch.sparkSession
    // a compact() crash mid-swap leaves the store retired as __old; heal
    // before the exists probe or the dedup store would look empty and
    // re-admit everything it ever rejected
    graft.operators.MergeSink.healInterruptedSwap(spark, sigDir)
    graft.operators.MergeSink.healInterruptedSwap(spark, corpusDir)
    val guardDir = guardPath(sigDir)
    if (!ReplayGuard.exists(spark, guardDir)) {
      ReplayGuard.bootstrap(spark, guardDir)
      if (Files.exists(Paths.get(sigDir))) // migrate a pre-guard store
        ReplayGuard.record(
          spark.read.parquet(sigDir).select("doc_id"), "doc_id", guardDir)
    }
    val existingSigs =
      if (Files.exists(Paths.get(sigDir))) spark.read.parquet(sigDir)
      else Dedup.minHashSignatures(
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          docSchema), k, numPerms)
    // INPUT VALIDATION with an audit trail (the VectorIngest pattern
    // and its discipline): validate BEFORE dropDuplicates so every
    // malformed row is audited (and so the row-wise validity flag
    // splits identically on every re-evaluation — no staging needed),
    // and OVERWRITE the batch_id quarantine subdir so at-least-once
    // re-runs are idempotent. A null doc_id would vanish silently inside the
    // guard's bloom probe; a null text would flow a junk row into the
    // corpus store with NULL signatures. Invalid rows are NOT ledgered,
    // so a corrected re-send is admitted, never a "replay".
    val wellFormed = col("doc_id").isNotNull && col("text").isNotNull
    val flagged = batch.select(col("doc_id"), col("text"))
      .withColumn("__ok", coalesce(wellFormed, lit(false)))
    if (flagged.filter(!col("__ok")).limit(1).count() > 0)
      flagged.filter(!col("__ok")).select(col("doc_id"),
          when(col("doc_id").isNull, "doc_id_null")
            .otherwise("text_null").as("reason"))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"${sigDir}_quarantine/batch_id=$batchId")
    val dedupedIds = ReplayGuard.filterFresh(
      flagged.filter(col("__ok")).select("doc_id", "text")
        .dropDuplicates("doc_id"),
      "doc_id", guardDir)
    val fresh = benchmark match {
      case Some(b) =>
        val contaminated = graft.llm.Corpus.decontaminate(dedupedIds, b, decontamK)
          .filter(col("n_shared") > maxBenchShared).select("doc_id")
        dedupedIds.join(contaminated, Seq("doc_id"), "left_anti")
      case None => dedupedIds
    }
    // ONE shingle+min pass per batch: the signatures feed the dedup AND
    // the ledger append below (round-4 cost: dedupIncremental computed
    // them internally and the ledger recomputed them for admitted docs)
    val freshSigs = graft.llm.Stage(Dedup.minHashSignatures(fresh, k, numPerms))
    val kept = Dedup.dedupIncrementalSigs(fresh, freshSigs, existingSigs,
      numPerms, bands, minEstPpm, maxBandDf)
    // Admission must be decided before the appends (kept is read
    // several times): one small batch-sized materialization.
    val admitted = graft.llm.Stage(kept)
    // ledger FIRST (fail-closed — see class doc); the admitted count
    // rides the guard's count+bloom aggregate
    val n = ReplayGuard.record(admitted.select("doc_id"), "doc_id", guardDir)
    if (n > 0) {
      // signature rows for ALL admitted ids, short docs carrying NULL
      // h-columns — the store stays the corpus's signature archive
      admitted.select("doc_id")
        .join(freshSigs, Seq("doc_id"), "left_outer")
        .write.mode(SaveMode.Append).parquet(sigDir)
      admitted.write.mode(SaveMode.Append).parquet(corpusDir)
    }
    n
  }

  /** The admission-ledger location beside a signature store — PUBLIC so
    * maintenance callers (bench lifecycles, ops jobs) compact the SAME
    * dir the ingest guards with instead of restating the suffix (a
    * drifted restatement would "compact" a nonexistent dir: silent
    * (0, 0) and a lifecycle phase that measures nothing). */
  def guardDirOf(sigDir: String): String = s"${sigDir}_guard"

  private def guardPath(sigDir: String): String = guardDirOf(sigDir)

  /** Ledgered-but-unstored doc_ids — admitted to the guard (and possibly
    * the signature store) but absent from the corpus: the fail-closed
    * crash window, during which a re-send of those ids is silently
    * dropped. `evict = true` clears them from the guard ledger AND the
    * signature store (both must go: a surviving signature row would
    * reject the re-send as a near-duplicate of itself), so a corrected
    * re-send is admitted. Run from maintenance, like [[compact]]. */
  def reconcile(spark: SparkSession, corpusDir: String, sigDir: String,
                evict: Boolean = false): Seq[Long] = {
    val guardDir = guardPath(sigDir)
    val corpusIds =
      if (Files.exists(Paths.get(corpusDir)))
        spark.read.parquet(corpusDir).select("doc_id")
      else {
        import spark.implicits._
        spark.emptyDataset[Long].toDF("doc_id")
      }
    val orphans = graft.llm.Stage(
      ReplayGuard.orphans(spark, guardDir, corpusIds, "doc_id"))
    if (evict) {
      // signature store first: once the guard row is gone the id is
      // re-admittable, so every earlier state must already be clean
      // (a crash between the two evictions leaves the guard row, which
      // keeps the id rejected until the next reconcile finishes the job)
      if (Files.exists(Paths.get(sigDir)))
        graft.operators.MergeSink.writeAtomic(
          spark.read.parquet(sigDir)
            .join(orphans, Seq("doc_id"), "left_anti"), sigDir)
      ReplayGuard.evict(spark, guardDir, orphans, "doc_id")
    }
    orphans.collect().map(_.getLong(0)).sorted.toSeq
  }

  /** SMALL-FILE COMPACTION for the append-based stores (corpus dir,
    * signature ledger): every micro-batch appends a handful of parquet
    * files, so a long-running ingest leaves thousands of KB-sized files
    * — the classic lakehouse operational debt (each scan pays per-file
    * open/footer cost; the NameNode/listing pays per-entry). Rewrites
    * the directory as ceil(bytes / targetBytes) files via an atomic
    * staging swap ([[graft.operators.MergeSink.writeAtomic]]), data
    * unchanged. Run it from a maintenance schedule, not the hot loop;
    * on a transactional table format this is OPTIMIZE/rewriteDataFiles.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    graft.operators.MergeSink.healInterruptedSwap(spark, dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // nothing ingested yet (maintenance schedule fired before the first
    // batch): a no-op, not a FileNotFoundException — mirrors compactCells
    if (!fs.exists(new Path(dir))) return (0, 0)
    val statuses = fs.listStatus(new Path(dir))
    // guard: this rewrite flattens — running it on a PARTITIONED store
    // (subdirectories = partition values, e.g. VectorIngest's cell
    // store) would silently destroy partition pruning; those stores
    // have their own partition-aware compaction. Hidden dirs (a crashed
    // append's _temporary, Spark's own convention for non-data paths)
    // are not partitions and must not block compaction.
    require(!statuses.exists(s => s.isDirectory &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")),
      s"$dir is a partitioned store — use its partition-aware compaction " +
        "(e.g. VectorIngest.compactCells), not the flat rewrite")
    val files = statuses
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    graft.operators.MergeSink.writeAtomic(
      spark.read.parquet(dir).repartition(n), dir)
    val after = fs.listStatus(new Path(dir))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }

  /** Structured Streaming driver: file-drop source of JSON documents
    * ({"doc_id": …, "text": …} per line). */
  def start(spark: SparkSession, inputDir: String, corpusDir: String,
            sigDir: String, checkpoint: String) = {
    spark.readStream
      .schema(docSchema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, id: Long) =>
        processBatch(df, corpusDir, sigDir, batchId = id); ()
      }
      .start()
  }
}
