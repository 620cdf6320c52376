package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.llm.{KMeans, Similarity}

/** Streaming ANN-index maintenance — the vector counterpart of
  * [[CorpusIngest]]: an unbounded stream of embeddings is folded into a
  * persistent IVF index that serves queries WITHOUT ever rescanning the
  * raw stream.
  *
  * Layout under one root dir:
  *   - `centroids/` — (list_id, cent array<double>, cent_norm), trained
  *     ONCE on a bootstrap sample ([[trainCentroids]]) and then frozen:
  *     IVF assignment must be stable across batches or the index would
  *     need rebuilding (production systems retrain offline and swap the
  *     whole index, never mutate centroids under live appends).
  *   - `cells/` — (vec_id, embedding, v_norm), written
  *     `partitionBy(list_id)`: the cell id is the PARTITION KEY, so a
  *     probe of p cells reads p/kCells of the data — partition pruning
  *     is the scan-fraction knob (PlanShapeSpec proves the predicate
  *     reaches the scan as a PartitionFilter).
  *
  * Per micro-batch: replayed vec_ids are anti-joined away against the
  * cells store (vec_id column only — column pruning keeps the guard
  * scan narrow), fresh vectors are assigned to their nearest frozen
  * centroid (broadcast BNLJ over ≤ kCells rows), and ONE append lands
  * them in their cell partitions. A Spark file write commits atomically
  * at job level, so a crash mid-batch leaves no partial visible state
  * and the replay guard makes redelivery a no-op: at-least-once in,
  * at-most-once indexed.
  */
object VectorIngest {

  /** Train k-means centroids on a bootstrap sample and freeze them
    * under `root/centroids`. Must run once before [[processBatch]]. */
  def trainCentroids(sample: DataFrame, root: String, kCells: Int = 16,
                     iters: Int = 5, dim: Int = 64): Unit = {
    val cents = KMeans.train(sample, kCells, iters, dim)
    Similarity.centroidTable(sample.sparkSession, cents)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/centroids")
  }

  private def centroids(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/centroids")

  private def cellsPath(root: String): String = s"$root/cells"

  /** One micro-batch of (vec_id, embedding): returns the number of
    * newly indexed vectors. foreachBatch-compatible. Zero-norm vectors
    * are rejected (they have no cell and no place in cosine ranking —
    * see [[Similarity]]); rejected rows leave no trace, so a corrected
    * re-send of the same vec_id can be admitted later. */
  def processBatch(batch: DataFrame, root: String): Long = {
    val spark = batch.sparkSession
    val path = cellsPath(root)
    // a compactCells crash mid-swap leaves the store retired as __old;
    // heal BEFORE the exists probe — an unhealed miss would skip the
    // replay guard AND create a fresh dir that blocks healing forever
    graft.operators.MergeSink.healInterruptedSwap(spark, path)
    val fresh0 = batch.select("vec_id", "embedding").dropDuplicates("vec_id")
    val fresh =
      if (Files.exists(Paths.get(path)))
        fresh0.join(spark.read.parquet(path).select("vec_id"),
          Seq("vec_id"), "left_anti")
      else fresh0
    val assigned = graft.llm.Stage(
      Similarity.assignToCells(fresh, centroids(spark, root), "vec_id", keep = 1))
    val n = assigned.count()
    if (n > 0)
      assigned.write.mode(SaveMode.Append).partitionBy("list_id").parquet(path)
    n
  }

  /** SMALL-FILE COMPACTION for the cell store — every micro-batch
    * appends a file per touched cell, so a long-running ingest leaves
    * the same append swamp [[CorpusIngest.compact]] fixes for flat
    * stores. The cell store is PARTITIONED (list_id is the pruning
    * key), so the generic flat rewrite would flatten it and silently
    * destroy partition pruning; this variant rewrites per cell —
    * repartitioned by list_id so each cell lands in few files — and
    * swaps with the same heal-safe staging renames. Returns
    * (filesBefore, filesAfter). */
  def compactCells(spark: SparkSession, root: String): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val path = cellsPath(root)
    graft.operators.MergeSink.healInterruptedSwap(spark, path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // nothing indexed yet (maintenance schedule fired before the first
    // append): a no-op, not a FileNotFoundException
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
      df.repartition(col("list_id")), path, partitionBy = Seq("list_id"))
    (before, countFiles)
  }

  /** Top-k cosine neighbors for each query vector, served entirely off
    * the index: queries assign to their `nProbe` nearest frozen
    * centroids, the probed cell ids (≤ kCells values) prune the cells
    * scan to those partitions, candidates meet in an equi-join on
    * list_id, and a rank window takes the top k. With
    * `nProbe = kCells` this probes every cell and is EXACT brute-force
    * cosine top-k over the indexed vectors (VectorIngestSpec asserts
    * equality with [[Similarity.bruteForceKnn]]). */
  def ann(spark: SparkSession, root: String, queries: DataFrame, k: Int,
          nProbe: Int = 4): DataFrame = {
    graft.operators.MergeSink.healInterruptedSwap(spark, cellsPath(root))
    val qs = Similarity.assignToCells(
        queries, centroids(spark, root), "query_id", keep = nProbe)
      .select(col("query_id"), col("embedding").as("q_emb"),
        col("v_norm").as("q_norm"), col("list_id"))
    // probed cell ids: bounded by kCells (tiny), collected so the cell
    // predicate is a literal IN list the scan can partition-prune on
    val probed = qs.select("list_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val cells = spark.read.parquet(cellsPath(root))
      .filter(col("list_id").isin(probed.toIndexedSeq.map(_.asInstanceOf[Any]): _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        col("v_norm").as("c_norm"), col("list_id"))
    val scored = qs.join(cells, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        Similarity.dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** Structured Streaming driver: fold a stream of embeddings into the
    * index. Centroids must already be trained. */
  def start(spark: SparkSession, stream: DataFrame, root: String,
            checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, root); ()
      }
      .start()
}
