package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dot_product

/** Deterministic Lloyd's k-means over an embedding column — the
  * centroid-training step the IVF index ([[Similarity.ivfKnn]]) assumes
  * as given. Design constraints, in order:
  *
  *   - **Seed-free determinism**: init = the k lowest-vec_id vectors
  *     (not kmeans||/random); ties in assignment break on the lower
  *     cell id. Same input ⇒ bit-identical centroids on every run.
  *   - **Scale shape**: each iteration is one broadcast of k·dim
  *     doubles + one map-side-combined aggregate over the corpus —
  *     no shuffle of the vectors themselves, the standard distributed
  *     k-means layout. Iteration count is FIXED (no driver-side
  *     convergence polling): at 100 TB an extra pass costs more than
  *     it saves, and fixed rounds keep lineage bounded.
  *   - Distance = squared-euclidean expanded as |v|² − 2·v·c + |c|²;
  *     |v|² is per-row constant and drops out of the argmin, so the
  *     per-cell score is just c·c − 2·v·c (one codegen'd dot product
  *     per cell).
  *
  * Returns (cell_id, n_members, centroid: Array[Double]).
  */
object KMeans {

  /** Literal-path budget in centroid doubles (k·dim): below it the
    * centroids inline as expression-tree literals (zero shuffle, whole-
    * stage codegen); above it — production k=4096·dim=1024 would be 4M
    * literals, an analyzer/codegen blowup — assignment switches to the
    * broadcast-DataFrame join ([[assignJoin]], the
    * [[Similarity.ivfKnnTrained]] centroid shape). */
  private[graft] val LiteralBudget: Long = 1L << 16

  /** One assignment pass: literal or join path by [[LiteralBudget]].
    * Both paths are bit-identical (same doubles, same lexicographic
    * (score, cell) tie-break — KMeansSpec proves it). */
  private def assignTo(cents: Seq[(Long, Array[Double])])(emb: DataFrame): DataFrame = {
    val doubles = cents.length.toLong * cents.headOption.map(_._2.length).getOrElse(0)
    if (doubles <= LiteralBudget) assignLiteral(cents)(emb)
    else assignJoin(cents)(emb)
  }

  /** Literal path: k structs of (score, cell) in the expression tree. */
  private[graft] def assignLiteral(cents: Seq[(Long, Array[Double])])(emb: DataFrame): DataFrame = {
    val scored = cents.map { case (cid, c) =>
      val cArr = array(scala.collection.immutable.ArraySeq.unsafeWrapArray(c.map(lit)): _*)
      val cc = c.map(x => x * x).sum
      struct((lit(cc) - lit(2.0) * dot_product(col("embedding"), cArr)).as("score"),
        lit(cid).as("cell"))
    }
    // array_min over (score, cell) structs: lexicographic → lowest score,
    // ties to the lowest cell id. Deterministic.
    emb.withColumn("cell", array_min(array(scored: _*)).getField("cell"))
  }

  /** Join path: centroids as a broadcast DataFrame (k rows), scored via
    * a broadcast nested-loop, argmin per vector as min(struct(score,
    * cell)) — the same lexicographic tie-break as the literal path, so
    * results are bit-identical. Cost vs the literal path: one shuffle
    * keyed by vec_id (map-side-combined min) plus the rejoin that
    * restores the caller's columns — the price of keeping k·dim out of
    * the expression tree. */
  private[graft] def assignJoin(cents: Seq[(Long, Array[Double])])(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centDf = broadcast(
      cents.map { case (cid, c) => (cid, c.toSeq, c.map(x => x * x).sum) }
        .toDF("__cell", "__cent", "__cc")
        .select(col("__cell"), col("__cent").cast("array<double>").as("__cent"),
          col("__cc")))
    val best = emb.select(col("vec_id"), col("embedding"))
      .join(centDf, expr("true"))
      .withColumn("__score",
        col("__cc") - lit(2.0) * dot_product(col("embedding"), col("__cent")))
      .groupBy("vec_id")
      .agg(min(struct(col("__score"), col("__cell"))).as("__mn"))
      .select(col("vec_id"), col("__mn.__cell").as("cell"))
    emb.join(best, Seq("vec_id"))
  }

  /** Train k centroids with `iters` fixed Lloyd iterations. */
  def train(emb: DataFrame, k: Int, iters: Int = 5, dim: Int = 64): Seq[(Long, Array[Double])] = {
    val init = emb.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        (i.toLong, r.getSeq[Float](1).map(_.toDouble).toArray)
      }.toSeq
    (0 until iters).foldLeft(init) { (cents, _) =>
      val assigned = assignTo(cents)(emb)
      val sums = (0 until dim).map(d =>
        sum(element_at(col("embedding"), d + 1).cast("double")).as(s"s$d"))
      val agg = assigned.groupBy("cell")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      val updated = agg.map { r =>
        val n = r.getAs[Long]("n").toDouble
        (r.getAs[Long]("cell"),
          (0 until dim).map(d => r.getAs[Double](s"s$d") / n).toArray)
      }.toMap
      // a cell that captured no vectors keeps its previous centroid
      // (standard Lloyd fallback) instead of silently vanishing and
      // shrinking k for every later iteration
      cents.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
        .sortBy(_._1)
    }
  }

  /** Assign every vector to its trained cell: (vec_id, cell). */
  def assign(emb: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame =
    assignTo(cents)(emb).select(col("vec_id"), col("cell"))

  /** Cluster summary: cell sizes after training. */
  def summary(emb: DataFrame, k: Int, iters: Int = 5, dim: Int = 64): DataFrame = {
    val cents = train(emb, k, iters, dim)
    assign(emb, cents).groupBy("cell").agg(count(lit(1)).as("n_members"))
  }
}
