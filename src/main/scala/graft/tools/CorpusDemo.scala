package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{Clusters, Corpus, Dedup, TextAnalysis}

/** End-to-end drive of the LLM corpus pipeline's public surface, in the
  * order a training-data build actually runs:
  *   quality filter (repetition + PII) → near-dup dedup (LSH bands →
  *   MinHash-estimate verify → connected components → keep-best) →
  *   chunk → pack → balanced mix → corpus stats.
  * Every stage is the corpus-scale variant of its operator family.
  *
  * Run: sbt "runMain graft.tools.CorpusDemo [sfdir]"
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables(spark, sfDir, "documents")
    println(s"[corpus] input docs:          ${docs.count()}")

    // 1. quality: drop repetitive docs, scrub PII from the rest
    val quality = TextAnalysis.repetitionStats(docs)
      .filter(col("is_repetitive") === 0).select("doc_id")
      .join(TextAnalysis.piiScrub(docs), Seq("doc_id"))
      .select(col("doc_id"), col("scrubbed").as("text"))
    println(s"[corpus] after quality gate:  ${quality.count()}")

    // 2. near-dup dedup, keep-best (longest survivor per cluster)
    val edges = Dedup.minHashEstimates(quality, k = 3, numPerms = 32, bands = 8)
      .filter(col("est_jaccard_ppm") >= 500000L)
      .select("id_a", "id_b")
    val cc = Clusters.connectedComponents(edges)
    val ranked = cc.join(quality.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("len").desc, col("doc_id"))
    val losers = ranked.withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1).select("doc_id")
    val deduped = quality.join(losers, Seq("doc_id"), "left_anti")
    println(s"[corpus] after dedup:         ${deduped.count()}")

    // 3. chunk long docs, pack chunks into batches, draw a balanced mix
    val chunks = Corpus.chunkDocuments(deduped, chunkTokens = 32, overlap = 8)
    println(s"[corpus] training chunks:     ${chunks.count()}")
    val packed = Corpus.seqPackingSharded(deduped, capacity = 1024, nShards = 8)
    val batches = packed.select("shard", "batch_in_shard").distinct().count()
    println(s"[corpus] packed batches:      $batches")
    val mixed = Corpus.balancedSample(
      deduped.join(docs.select("doc_id", "lang"), "doc_id"), "lang", 20)
    println(s"[corpus] balanced mix rows:   ${mixed.count()}")

    // 4. corpus stats over the final mix
    Corpus.lengthHistogram(deduped, 100).orderBy("bucket").show(5, truncate = false)
    spark.stop()
  }
}
