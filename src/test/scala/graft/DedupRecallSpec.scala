package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Retrieval-quality gate for the TEXT dedup path — the
  * [[AnnRecallSpec]] analog: on a corpus with planted near-duplicates,
  * measure what fraction of the exact-Jaccard pair set the banded LSH
  * path recovers, at parameters chosen by [[Dedup.lshTuning]]'s
  * S-curve rule. Locks in two facts the 100 TB story rests on: tuned
  * banding finds (nearly) everything the exact quadratic join would,
  * and recall is monotone in the band count — so the tuning knob moves
  * the quality dial the direction the S-curve predicts. */
class DedupRecallSpec extends SparkSpec {
  import spark.implicits._

  // 120 base docs of 20 tokens + 40 near-dup partners with ONE token
  // perturbed mid-doc: the change kills 3 of 18 3-gram shingles, so a
  // planted pair's Jaccard is 15/21 ≈ 714k ppm — far above the
  // background of unrelated docs (vocab 400 keeps accidents rare).
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val base = (0 until 120).map { i =>
      (i.toLong, Seq.fill(20)(s"w${rnd.nextInt(400)}"))
    }
    val dups = base.take(40).map { case (id, toks) =>
      val t = toks.toArray
      t(10) = s"p${rnd.nextInt(400)}"
      (id + 1000L, t.toSeq)
    }
    (base ++ dups).map { case (id, t) => (id, t.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("tuned LSH banding recovers the exact pair set; recall monotone in bands") {
    val thrPpm = 400000L
    val exact = pairSet(Dedup.ngramJaccardPairs(corpus, 3)
      .filter(col("jaccard_ppm") >= thrPpm))
    assert(exact.size >= 30, s"planting failed: only ${exact.size} exact pairs")

    // S-curve pick for target 0.4 on a 32-perm signature: (16, 2)
    val (bands, rows) = Dedup.lshTuning(32, 0.4)
    assert((bands, rows) == ((16, 2)))
    def lshAt(b: Int) = pairSet(Dedup.minHashLshPairs(corpus, k = 3,
      numPerms = 32, bands = b, minJaccardPpm = thrPpm))

    val tuned = lshAt(bands)
    val recallTuned = tuned.intersect(exact).size.toDouble / exact.size
    assert(recallTuned >= 0.9,
      s"tuned banding recall $recallTuned below floor (|exact|=${exact.size})")
    // verification is exact, so LSH can only MISS pairs, never add them
    assert(tuned.subsetOf(exact))

    // fewer bands -> higher collision threshold -> recall can only drop
    val recall4 = lshAt(4).intersect(exact).size.toDouble / exact.size
    val recall2 = lshAt(2).intersect(exact).size.toDouble / exact.size
    assert(recall4 <= recallTuned + 1e-9)
    assert(recall2 <= recall4 + 1e-9)
  }
}
