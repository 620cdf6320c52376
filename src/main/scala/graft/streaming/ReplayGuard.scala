package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomFns

/** Scale-safe at-least-once replay guard — the admission ledger both
  * streaming ingests ([[CorpusIngest]], [[VectorIngest]]) consult per
  * micro-batch, built so the guard's cost is bounded by the BATCH, not
  * by the total history of ids ever admitted.
  *
  * The naive guard (anti-join each batch against the full persisted id
  * set) is O(index) per micro-batch: at 10¹¹ admitted ids the guard
  * scan dwarfs the batch work — the exact anti-pattern the incremental
  * suite (q93/q96/q101) exists to kill. This guard replaces it with two
  * layers:
  *
  *   - `bloom.bin` — ONE bloom filter over every admitted id, loaded
  *     driver-side (a few MB) and probed as a broadcast literal:
  *     "definitely new" rows (the vast majority of a healthy stream)
  *     never touch the ledger at all. No false negatives, so a miss is
  *     PROOF of novelty; false positives fall through to the exact
  *     layer. When the running count outgrows the filter's capacity it
  *     is rebuilt ~2× larger from the ledger — amortized O(1)/batch.
  *   - `ids/bucket=K/` — the exact ledger, one `id` column partitioned
  *     by `pmod(xxhash64(id), nBuckets)`: probable hits (true replays +
  *     bloom false positives) are verified by an anti-join whose ledger
  *     side is partition-pruned to the buckets those few ids hash into,
  *     so the exact scan reads ~hits/nBuckets of the ledger, not all of
  *     it. A batch with no probable hits skips the ledger entirely —
  *     the plan contains no ledger scan (ReplayGuardSpec asserts both).
  *
  * Crash ordering contract (the reason this is SAFE to put in front of
  * fail-closed ingests): [[record]] writes the bloom BEFORE appending
  * ids, and callers record the guard BEFORE appending payload to their
  * stores. The bloom therefore always over-approximates the ledger, and
  * the ledger always over-approximates the store — every crash window
  * degrades to either a spurious probable-hit (caught by the exact
  * layer) or a ledgered-but-unstored orphan, which [[orphans]] detects
  * and [[evict]] clears so a corrected re-send can be admitted. A false
  * NEGATIVE (duplicate admission) is impossible in every window. On a
  * transactional table format guard + store appends would be one commit
  * and the orphan window disappears.
  *
  * Mirrors the reference's own dedup-before-fetch instinct
  * (sync-engine/src/stripeSync.ts:38-46) applied to its at-least-once
  * delivery model (fastify-app/src/routes/webhooks.ts:10-17).
  *
  * Design envelope: ids are LONGs; the driver-resident bloom serves to
  * ~10⁹ admitted ids at the default 1 % fpp (~1.2 GB at the top end —
  * size `estItems` to the deployment); beyond that the bucketed exact
  * layer still bounds the scan to touched-buckets/nBuckets of the
  * ledger (raise `nBuckets` with scale), and the next step would be
  * per-bucket bloom sidecars.
  */
object ReplayGuard {

  private val Fpp = 0.01
  private def idsPath(g: String) = s"$g/ids"
  private def bloomPath(g: String) = s"$g/bloom.bin"
  private def metaPath(g: String) = s"$g/meta"

  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Same formula the sketch library uses: pinning numBits (rather than
    * trusting session conf defaults) makes every filter built for this
    * guard merge-compatible by construction. */
  private def numBits(estItems: Long): Long =
    math.max(64L,
      math.ceil(-estItems * math.log(Fpp) / (math.log(2) * math.log(2))).toLong)

  /** The (estItems, numBits) actually USED for every filter this guard
    * builds — BOTH construction paths clamped to the session's
    * runtime-bloom caps. Spark's BloomFilterAggregate Math.min-clamps
    * its arguments against `spark.sql.optimizer.runtime.bloomFilter.
    * {maxNumItems,maxNumBits}` (defaults 4M / 64 Mbit); a driver-side
    * BloomFilter.create with UNCLAMPED parameters would then be
    * merge-INCOMPATIBLE with the aggregate's batch filters
    * (IncompatibleMergeException on the first record() past the cap).
    * Clamping both sides identically keeps every filter mergeable by
    * construction; past the cap the fpp degrades gracefully instead of
    * crashing (raise the caps in session conf — GraftSession does — to
    * extend the exact envelope). */
  private def bloomParams(spark: SparkSession, estItems: Long): (Long, Long) = {
    def conf(k: String, dflt: Long): Long =
      try spark.conf.get(k).toLong catch { case _: Exception => dflt }
    val maxItems =
      conf("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
    val maxBits =
      conf("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L)
    val e = math.min(estItems, maxItems)
    (e, math.min(numBits(e), maxBits))
  }

  /** The guard exists once [[bootstrap]] has committed its meta file. */
  def exists(spark: SparkSession, guardDir: String): Boolean =
    fsOf(spark, guardDir).exists(new Path(metaPath(guardDir)))

  // meta: nBuckets + the capacity FLOOR (rebuilds never shrink below it).
  // Written once, atomically (tmp + rename) — exists() keys off it.
  private def writeMeta(spark: SparkSession, guardDir: String,
                        nBuckets: Int, estItemsFloor: Long): Unit = {
    val fs = fsOf(spark, guardDir)
    val tmp = new Path(metaPath(guardDir) + ".tmp")
    val out = new java.io.DataOutputStream(fs.create(tmp, true))
    try { out.writeInt(nBuckets); out.writeLong(estItemsFloor) }
    finally out.close()
    if (!fs.rename(tmp, new Path(metaPath(guardDir))))
      throw new java.io.IOException(s"meta commit failed: $guardDir")
  }

  private def readMeta(spark: SparkSession, guardDir: String): (Int, Long) = {
    val in = new java.io.DataInputStream(
      fsOf(spark, guardDir).open(new Path(metaPath(guardDir))))
    try (in.readInt(), in.readLong()) finally in.close()
  }

  // bloom.bin: capacity, applied-id count, sketch bytes. Rewritten every
  // record() via tmp + delete + rename; a crash that loses it is healed
  // by rebuilding from the ledger (the bloom is always DERIVABLE state).
  private def writeBloom(spark: SparkSession, guardDir: String,
                         estItems: Long, count: Long, bytes: Array[Byte]): Unit = {
    val fs = fsOf(spark, guardDir)
    val tmp = new Path(bloomPath(guardDir) + ".tmp")
    val out = new java.io.DataOutputStream(fs.create(tmp, true))
    try { out.writeLong(estItems); out.writeLong(count)
          out.writeInt(bytes.length); out.write(bytes) }
    finally out.close()
    val dst = new Path(bloomPath(guardDir))
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"bloom commit failed: $guardDir")
  }

  private def readBloom(spark: SparkSession,
                        guardDir: String): Option[(Long, Long, Array[Byte])] = {
    val fs = fsOf(spark, guardDir)
    val p = new Path(bloomPath(guardDir))
    if (!fs.exists(p)) None
    else {
      val in = new java.io.DataInputStream(fs.open(p))
      try {
        val est = in.readLong(); val count = in.readLong()
        val bytes = new Array[Byte](in.readInt())
        in.readFully(bytes)
        Some((est, count, bytes))
      } finally in.close()
    }
  }

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  private def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Distributed (count, bloom) over `ids` in ONE aggregate job — the
    * caller's "how many admitted" count rides along for free, so record()
    * replaces rather than adds a driver-visible job. Insertion key is
    * xxhash64(id), matching [[filterFresh]]'s probe and the bucket hash. */
  private def countAndBloom(ids: DataFrame, idCol: String,
                            estItems: Long): (Long, Option[Array[Byte]]) = {
    val (e, bits) = bloomParams(ids.sparkSession, estItems)
    val row = ids.agg(
      count(lit(1)),
      BloomFns.bloom_filter_agg(xxhash64(col(idCol)), e, bits)).head()
    (row.getLong(0),
      if (row.isNullAt(1)) None else Some(row.getAs[Array[Byte]](1)))
  }

  /** Rebuild the bloom from the full ledger — the self-heal (bloom file
    * lost mid-swap) and grow (count outgrew capacity) path. O(ledger),
    * but only on those rare events: amortized O(1) per batch. */
  private def rebuildBloom(spark: SparkSession, guardDir: String,
                           atLeast: Long): (Long, Long, Array[Byte]) = {
    val (_, floor) = readMeta(spark, guardDir)
    val fs = fsOf(spark, guardDir)
    val ledger =
      if (fs.exists(new Path(idsPath(guardDir))))
        spark.read.parquet(idsPath(guardDir)).select(col("id"))
      else {
        import spark.implicits._
        spark.emptyDataset[Long].toDF("id")
      }
    val n = ledger.count()
    var est = math.max(floor, 1L)
    while (est < math.max(n * 2, atLeast)) est *= 2
    val (_, bytesOpt) = countAndBloom(ledger, "id", est)
    val bytes = bytesOpt.getOrElse {
      val (e, bits) = bloomParams(spark, est)
      serialize(BloomFilter.create(e, bits))
    }
    writeBloom(spark, guardDir, est, n, bytes)
    (est, n, bytes)
  }

  /** Create an EMPTY guard. To migrate an existing store, follow with
    * `record(existingIds, …)` — a one-time O(store) seed. */
  def bootstrap(spark: SparkSession, guardDir: String, nBuckets: Int = 256,
                estItems: Long = 1L << 20): Unit = {
    require(!exists(spark, guardDir), s"guard already exists at $guardDir")
    require(nBuckets > 0 && estItems > 0, "nBuckets and estItems must be positive")
    writeMeta(spark, guardDir, nBuckets, estItems)
    val (e, bits) = bloomParams(spark, estItems)
    writeBloom(spark, guardDir, estItems, 0L,
      serialize(BloomFilter.create(e, bits)))
  }

  /** Split `batch` down to the rows whose id was never recorded.
    *
    * Plan shape (the 100 TB contract): rows the bloom rejects are new by
    * proof and never touch the ledger; rows the bloom flags are verified
    * by an anti-join against ONLY the ledger buckets their ids hash into
    * (a literal IN over partition values → partition-pruned scan). A
    * batch with zero probable hits yields a plan with NO ledger scan. */
  def filterFresh(batch: DataFrame, idCol: String, guardDir: String): DataFrame = {
    val spark = batch.sparkSession
    graft.operators.MergeSink.healInterruptedSwap(spark, idsPath(guardDir))
    val (nBuckets, _) = readMeta(spark, guardDir)
    val (_, cnt, bytes) = readBloom(spark, guardDir)
      .getOrElse(rebuildBloom(spark, guardDir, atLeast = 1L))
    if (cnt == 0L) return batch // empty guard: everything is new, zero probes
    val probe = BloomFns.might_contain(lit(bytes), xxhash64(col(idCol)))
    val definitelyNew = batch.filter(!probe)
    // probable hits = true replays + bloom false positives: tiny on a
    // healthy stream. Their buckets (≤ nBuckets values) become a literal
    // partition predicate — collected, like VectorIngest.ann's probed
    // cells, so the pruning is static and provable in the plan.
    val buckets = batch.filter(probe)
      .select(pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).as("bucket"))
      .distinct().collect().map(_.getLong(0)).sorted
    if (buckets.isEmpty) definitelyNew
    else if (!fsOf(spark, guardDir).exists(new Path(idsPath(guardDir))))
      // the documented crash window (bloom committed, ledger append
      // never ran) can leave cnt > 0 with NO ids/ dir at all; the
      // ledger is the truth and it is empty, so every probable hit is
      // a bloom-only artifact — admit the whole batch instead of
      // crashing on a nonexistent path on every retry
      batch
    else {
      val ledger = spark.read.parquet(idsPath(guardDir))
        .filter(col("bucket").isin(buckets.toIndexedSeq.map(_.asInstanceOf[Any]): _*))
        .select(col("id").as(idCol))
      definitelyNew.union(
        batch.filter(probe).join(ledger, Seq(idCol), "left_anti"))
    }
  }

  /** Record `ids` as admitted; returns how many there were (one combined
    * count+bloom aggregate — callers drop their own count job). Bloom is
    * committed BEFORE the ledger append: each crash window leaves the
    * bloom over-approximating the ledger, never under. */
  def record(ids: DataFrame, idCol: String, guardDir: String): Long = {
    val spark = ids.sparkSession
    graft.operators.MergeSink.healInterruptedSwap(spark, idsPath(guardDir))
    val (nBuckets, _) = readMeta(spark, guardDir)
    val (est, cnt, bytes) = readBloom(spark, guardDir)
      .getOrElse(rebuildBloom(spark, guardDir, atLeast = 1L))
    val (n, batchBytesOpt) = countAndBloom(ids, idCol, est)
    if (n == 0L) return 0L
    if (cnt + n > est) {
      // outgrew capacity: rebuild ≥2× from ledger, fold the batch in
      // (reuse the rebuild's own return — re-reading the multi-MB
      // bloom file it just wrote was pure waste plus an unguarded .get)
      val (est2, cnt2, bytes2) = rebuildBloom(spark, guardDir,
        atLeast = (cnt + n) * 2)
      val (_, grownOpt) = countAndBloom(ids, idCol, est2)
      val merged = deserialize(bytes2)
      grownOpt.foreach(b => merged.mergeInPlace(deserialize(b)))
      writeBloom(spark, guardDir, est2, cnt2 + n, serialize(merged))
    } else {
      val merged = deserialize(bytes)
      batchBytesOpt.foreach(b => merged.mergeInPlace(deserialize(b)))
      writeBloom(spark, guardDir, est, cnt + n, serialize(merged))
    }
    ids.select(col(idCol).as("id"),
        pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).as("bucket"))
      // repartition BY BUCKET before the partitioned write: without it
      // every task writes a file into every bucket it happens to hold —
      // ~tasks x buckets tiny files PER BATCH (measured ~4k at bench
      // scale); with it each bucket lives in exactly one task, so a
      // batch appends at most one file per touched bucket. The shuffle
      // is batch-sized — the cheap side of the trade at any scale.
      .repartition(col("bucket"))
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(idsPath(guardDir))
    n
  }

  /** LEDGER COMPACTION — the maintenance job the append-per-batch
    * layout needs over a long horizon (one file per touched bucket per
    * batch; [[VectorIngest.compactCells]]'s problem, same cure):
    * rewrite `ids/` to one file per bucket via the heal-safe atomic
    * swap, preserving the bucket partitioning the pruned anti-join
    * depends on. Quiesce record() while it runs (same contract as
    * every compactor here); filterFresh readers heal forward.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, guardDir: String): (Int, Int) = {
    val path = idsPath(guardDir)
    graft.operators.MergeSink.healInterruptedSwap(spark, path)
    val fs = fsOf(spark, guardDir)
    if (!fs.exists(new Path(path))) return (0, 0)
    def countFiles: Int = {
      val it = fs.listFiles(new Path(path), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val before = countFiles
    val df = spark.read.parquet(path)
    graft.operators.MergeSink.writeAtomic(
      df.repartition(col("bucket")), path, partitionBy = Seq("bucket"))
    (before, countFiles)
  }

  /** Every recorded id (the exact ledger), for reconciliation. */
  def knownIds(spark: SparkSession, guardDir: String, as: String): DataFrame = {
    graft.operators.MergeSink.healInterruptedSwap(spark, idsPath(guardDir))
    if (fsOf(spark, guardDir).exists(new Path(idsPath(guardDir))))
      spark.read.parquet(idsPath(guardDir)).select(col("id").as(as))
    else {
      import spark.implicits._
      spark.emptyDataset[Long].toDF(as)
    }
  }

  /** Ledgered-but-unstored ids: recorded here, absent from the caller's
    * store — the fail-closed crash window (guard committed, payload
    * append never ran). These ids are PERMANENTLY dropped until evicted:
    * the reconciliation hook for that silent-drop hazard. */
  def orphans(spark: SparkSession, guardDir: String, storeIds: DataFrame,
              idCol: String): DataFrame =
    knownIds(spark, guardDir, idCol)
      .join(storeIds.select(idCol).dropDuplicates(idCol), Seq(idCol), "left_anti")

  /** Remove ids from the exact ledger (atomic partitioned rewrite) so a
    * corrected re-send can be admitted. The bloom is deliberately NOT
    * rebuilt: it may only over-approximate, so the evicted id simply
    * takes the probable-hit path and passes the exact check. */
  def evict(spark: SparkSession, guardDir: String, victims: DataFrame,
            idCol: String): Unit = {
    graft.operators.MergeSink.healInterruptedSwap(spark, idsPath(guardDir))
    if (!fsOf(spark, guardDir).exists(new Path(idsPath(guardDir)))) return
    val keep = spark.read.parquet(idsPath(guardDir))
      .join(victims.select(col(idCol).as("id")), Seq("id"), "left_anti")
    if (keep.isEmpty)
      // a fully-evicted ledger must DELETE the dir: an empty
      // partitioned write emits no schema-bearing files, and every
      // later ledger read would die on schema inference
      fsOf(spark, guardDir).delete(new Path(idsPath(guardDir)), true)
    else graft.operators.MergeSink.writeAtomic(keep, idsPath(guardDir),
      partitionBy = Seq("bucket"))
  }
}
