package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Multimodal, Similarity}

/** Correctness of the approximate/sketch operators on planted data —
  * these are the queries the driver can only rows-only check. */
class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val docs = Seq(
    (0L, base),
    (1L, base + " extra"),                       // near-dup of 0
    (2L, base.replace("quick", "slow")),          // near-dup of 0
    (3L, "completely different words about spark shuffles and partitions here"),
    (4L, "another unrelated document mentioning merge sinks and watermarks now")
  ).toDF("doc_id", "text")

  test("ngramJaccardPairs finds the planted near-duplicates with exact jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, 3)
      .filter(col("jaccard_ppm") > 500000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngramJaccardPairs stop-shingle cut prunes boilerplate-only pairs") {
    // every doc carries the same boilerplate suffix; only 0 and 1 share
    // real content. df(boilerplate interior shingles) = 6 > cap = 5.
    val boiler = "please call now to subscribe today"
    val dd = Seq(
      (0L, s"alpha beta gamma delta epsilon $boiler"),
      (1L, s"alpha beta gamma delta zeta $boiler"),
      (2L, s"one unique sentence here $boiler"),
      (3L, s"two distinct words there $boiler"),
      (4L, s"three separate tokens everywhere $boiler"),
      (5L, s"four other terms nowhere $boiler")
    ).toDF("doc_id", "text")
    val cap = 5L
    // Scala-side oracle: exact Jaccard over the df-filtered shingle sets.
    val sets: Map[Long, Set[Seq[String]]] = (0L to 5L).map { i =>
      val t = dd.filter(col("doc_id") === i).head().getString(1)
      i -> t.split(" ").sliding(3).map(_.toSeq).toSet
    }.toMap
    val df_ = sets.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val filtered = sets.map { case (i, s) => i -> s.filter(df_(_) <= cap) }
    val expected = (for {
      i <- 0L to 5L; j <- i + 1 to 5L
      common = (filtered(i) intersect filtered(j)).size.toLong
      if common > 0
      union = filtered(i).size + filtered(j).size - common
    } yield (i, j, common, common * 1000000L / union)).toSet
    val got = Dedup.ngramJaccardPairs(dd, 3, maxShingleDf = cap)
      .select("id_a", "id_b", "common", "jaccard_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.map(p => (p._1, p._2)) == Set((0L, 1L)))
    // without the cut the boilerplate connects every pair
    assert(Dedup.ngramJaccardPairs(dd, 3).count() == 15)
  }

  test("minHashLshPairs surfaces the planted near-duplicates and skips unrelated docs") {
    val pairs = Dedup.minHashLshPairs(docs, k = 3, numPerms = 32, bands = 16,
      minJaccardPpm = 400000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containmentPairs flags a short doc embedded in a long one that Jaccard misses") {
    val short_ = "alpha beta gamma delta epsilon"
    val long_ = short_ + " " + (1 to 40).map(i => s"filler$i").mkString(" ")
    val dd = Seq((0L, long_), (1L, short_), (2L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
    val contain = Dedup.containmentPairs(dd, 3, minContainPpm = 900000L)
      .as[(Long, Long, Long, Long)].collect().toList
    // all 3 of the short doc's shingles appear in the long doc → 1.0
    assert(contain == List((0L, 1L, 3L, 1000000L)))
    // symmetric Jaccard on the same pair is far below near-dup range
    val j = Dedup.ngramJaccardPairs(dd, 3)
      .filter(col("id_a") === 0 && col("id_b") === 1)
      .select("jaccard_ppm").as[Long].head()
    assert(j < 100000L)
  }

  test("containment bounds jaccard on a seeded random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 30).map(i => s"tok$i")
    val dd = (1L to 25L).map { i =>
      val n = 3 + rnd.nextInt(20)
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val jac = Dedup.ngramJaccardPairs(dd, 3)
      .select("id_a", "id_b", "jaccard_ppm")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val con = Dedup.containmentPairs(dd, 3, minContainPpm = 0L)
      .select("id_a", "id_b", "contain_ppm")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // same candidate pairs (shared inverted index), and for every pair
    // jaccard ≤ containment ≤ 1.0 (min ≤ union denominators)
    assert(jac.keySet == con.keySet)
    jac.foreach { case (pair, j) =>
      val c = con(pair)
      assert(j <= c && c <= 1000000L, s"pair $pair j=$j c=$c")
    }
  }

  test("dedupIncremental drops batch docs similar to the corpus or to earlier batchmates") {
    val existing = Seq((0L, base), (2L, "some other corpus document here today"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (1L, base + " extra"),                                   // dup of corpus 0 → drop
      (3L, "entirely new material nobody has seen before now"), // unique → keep
      (5L, "twin sentences that match their later sibling ok"), // kept (lowest of pair)
      (7L, "twin sentences that match their later sibling ok")  // dup of 5 → drop
    ).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(existing, k = 3, numPerms = 32)
    val kept = Dedup.dedupIncremental(fresh, sigs, k = 3, numPerms = 32,
        bands = 16, minEstPpm = 400000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L))
  }

  test("PolyShingleHashes matches poly_hash over joined shingle strings (random docs)") {
    val rnd = new scala.util.Random(11)
    val dd = (1L to 20L).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i, (0 until n).map(_ => s"w${rnd.nextInt(40)}").mkString(" "))
    }.toDF("doc_id", "text")
    val native = dd.select(col("doc_id"),
        graft.functions.PolyShingleHashes.poly_shingle_hashes(col("text"), 3).as("xs"))
      .as[(Long, Array[Long])].collect()
      .map { case (id, xs) => id -> xs.toSet }.toMap
    val viaStrings = Dedup.shingles(dd, 3)
      .withColumn("x", graft.functions.PolyHash.poly_hash(col("shingle")))
      .select("doc_id", "x").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    // docs with < 3 tokens: native yields empty array, string path no rows
    native.filter(_._2.nonEmpty).foreach { case (id, xs) =>
      assert(xs == viaStrings(id), s"doc $id value sets differ")
    }
    assert(native.filter(_._2.nonEmpty).keySet == viaStrings.keySet)
  }

  test("minhash signatures are deterministic across runs") {
    val a = Dedup.minHashBands(docs).orderBy("doc_id", "band").collect().toSeq
    val b = Dedup.minHashBands(docs).orderBy("doc_id", "band").collect().toSeq
    assert(a == b)
  }

  test("simHashPairs: identical docs at hamming 0, unrelated docs farther") {
    val dd = Seq((0L, base), (1L, base), (2L, "nothing shared at all whatsoever"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(dd, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0))
    assert(!pairs.exists(p => p._2 == 2L))
  }

  test("simHashPairs64: near-identical docs pair at low hamming, unrelated docs do not") {
    val dd = Seq(
      (0L, base), (1L, base), (2L, base + " extra"),
      (3L, "nothing shared at all whatsoever between these strange texts")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs64(dd, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0))
    assert(!pairs.exists(p => p._2 == 3L))
    // banding is exact for hamming ≤ 3: the verified pair set must equal
    // the brute-force popcount over all signature pairs
    val sigs = Dedup.simHash64(dd).as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(pairs.toSet == brute)
  }

  test("bruteForceKnn ranks an identical vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to 0
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val knn = Similarity.bruteForceKnn(vecs, vecs.filter(col("vec_id") === 0), 3)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(knn.head == ((0L, 1L, 1L)))
    assert(knn(1)._2 == 2L)
  }

  test("lshKnn returns same-bucket neighbors ranked by cosine") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 7.0 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.lshKnn(vecs, vecs.filter(col("vec_id") < 3), k = 3,
      planes = 4, dim = 8)
    assert(out.count() > 0)
    // deterministic across runs (seedless construction)
    assert(out.collect().toSeq == Similarity.lshKnn(vecs,
      vecs.filter(col("vec_id") < 3), k = 3, planes = 4, dim = 8).collect().toSeq)
  }

  test("bucketedNearDupPairs finds parallel vectors and skips orthogonal ones") {
    val vecs = Seq(
      (0L, Array.tabulate(8)(d => (d + 1).toFloat)),
      (1L, Array.tabulate(8)(d => (d + 1) * 2.0f)),  // parallel to 0 (cos=1)
      (2L, Array.tabulate(8)(d => if (d == 0) 1.0f else 0.0f)),
      (3L, Array.tabulate(8)(d => if (d == 7) 1.0f else -0.001f)) // ~orthogonal to 2
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.bucketedNearDupPairs(vecs, planes = 4, dim = 8,
        minSim = 0.9, probeHamming = 1)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))   // identical direction, same bucket
    assert(!pairs.contains((2L, 3L)))  // below threshold even if co-bucketed
    // deterministic across runs
    assert(pairs == Similarity.bucketedNearDupPairs(vecs, planes = 4, dim = 8,
      minSim = 0.9, probeHamming = 1).as[(Long, Long)].collect().toSet)
  }

  test("multimodal: payload bytes round-trip and frames cover the payload") {
    val d = Seq((0L, "abcdef"), (1L, "x" * 200)).toDF("doc_id", "text")
    val meta = Multimodal.extractMeta(d).orderBy("doc_id").collect()
    assert(meta(0).getAs[Long]("n_bytes") == 6L)
    assert(meta(0).getAs[Int]("width") == ('a'.toInt * 7) % 256)
    assert(meta(1).getAs[Long]("n_bytes") == 200L)
    val frames = Multimodal.sampleFrames(d, stride = 64).groupBy("doc_id")
      .agg(count(lit(1)).as("n")).orderBy("doc_id").collect()
    assert(frames(0).getAs[Long]("n") == 1L)   // 6 bytes → 1 frame
    assert(frames(1).getAs[Long]("n") == 4L)   // 200 bytes → ceil(200/64)=4
  }

  test("marginMine suppresses the hub that raw cosine top-1 falls for") {
    // targets: a HUB near every source (id 100) + one true partner per
    // source (ids 101-103). Raw cosine argmax is the hub for every
    // source; the ratio margin divides it away (the hub's own k-NN
    // average is high) and recovers each source's true partner — the
    // property margin mining exists for (Artetxe & Schwenk 2019).
    val h = Array(0.5f, 0.5f, 0.5f, 0.5f)
    def e(d: Int) = Array.tabulate(4)(i => if (i == d) 1f else 0f)
    def src(d: Int) = e(d).zip(h).map { case (a, b) => a + 1.5f * b }
    val srcs = (0 until 3).map(d => (d.toLong, src(d)))
      .toDF("vec_id", "embedding")
    val tgts = ((100L, h) +: (0 until 3).map(d => (101L + d, e(d))))
      .toDF("vec_id", "embedding")

    val raw = graft.llm.Similarity.bruteForceKnn(tgts, srcs, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert((0L until 3L).forall(raw(_) == 100L), s"hub is not the raw top-1: $raw")

    val mined = graft.llm.Similarity.marginMine(srcs, tgts, kAvg = 3)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toMap
    (0L until 3L).foreach { d =>
      assert(mined(d) == 101L + d,
        s"margin failed to suppress the hub for source $d: got ${mined(d)}")
    }
  }

  test("lshTuning picks the S-curve factorization nearest the target") {
    import graft.llm.Dedup
    // 32 perms: thresholds (1/b)^(1/r) are b=4→.841, b=8→.595, b=16→.25
    assert(Dedup.lshTuning(32, 0.5) == ((8, 4)))
    assert(Dedup.lshTuning(32, 0.8) == ((4, 8)))
    assert(Dedup.lshTuning(32, 0.2) == ((16, 2)))
    // monotone: a lower target never selects fewer bands
    val targets = Seq(0.9, 0.7, 0.5, 0.3, 0.1)
    val bandsAt = targets.map(t => Dedup.lshTuning(32, t)._1)
    assert(bandsAt.zip(bandsAt.tail).forall { case (a, b) => a <= b })
    // the factorization always spends the whole signature
    for (t <- targets; p <- Seq(16, 32, 64)) {
      val (b, r) = Dedup.lshTuning(p, t)
      assert(b * r == p)
    }
  }

  test("blocklistHits counts terms, covers zero-hit docs, keeps under the cap") {
    val d = Seq(
      (0L, "clean words only here"),
      (1L, "spam spam and more spam plus scam"),
      (2L, "one scam mention")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.blocklistHits(d, Seq("spam", "scam"), maxHits = 1L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 0L, 1L), (1L, 4L, 2L, 0L), (2L, 1L, 1L, 1L)))
  }

  test("sourceCuration flags duplicate-farm and short-doc sources") {
    val tpl = "identical template text repeated across this entire source"
    val d = (
      (0 until 10).map(i => (i.toLong, tpl, "farm")) ++                  // 90% dups
      (10 until 20).map(i =>
        (i.toLong, s"a reasonably long unique document number $i with varied words", "good")) ++
      (20 until 30).map(i => (i.toLong, s"tiny $i", "short"))            // short docs
    ).toDF("doc_id", "text", "source")
    val got = graft.llm.Corpus.sourceCuration(d, "source",
        minMeanChars = 20L, maxDupPpm = 100000L)
      .select("source", "src_kept").distinct()
      .as[(String, Long)].collect().toMap
    assert(got == Map("farm" -> 0L, "good" -> 1L, "short" -> 0L))
    // dup share is exact: 10 docs, 1 distinct text -> 900000 ppm
    val farm = graft.llm.Corpus.sourceCuration(d, "source", 20L, 100000L)
      .filter(col("source") === "farm").select("dup_ppm").distinct()
      .as[Long].head()
    assert(farm == 900000L)
  }

  test("groupOverlapEstimates ranks a planted overlap above disjoint sources") {
    // A and B share 5 of 10 docs; C is disjoint from both
    val shared = (0 until 5).map(i =>
      s"shared document number $i about spark shuffles merges and broadcast joins")
    val d = (
      shared.zipWithIndex.map { case (t, i) => (i.toLong, t, "A") } ++
      (5 until 10).map(i => (i.toLong, s"a-only document $i with its own vocabulary set", "A")) ++
      shared.zipWithIndex.map { case (t, i) => (100L + i, t, "B") } ++
      (5 until 10).map(i => (100L + i, s"b-only document $i using different filler words", "B")) ++
      (0 until 10).map(i => (200L + i, s"c document $i on wholly unrelated subject matter $i", "C"))
    ).toDF("doc_id", "text", "source")
    val est = Dedup.groupOverlapEstimates(d, "source", k = 3, numPerms = 32)
      .select("grp_a", "grp_b", "est_jaccard_ppm")
      .as[(String, String, Long)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    val ab = est(("A", "B")); val ac = est(("A", "C")); val bc = est(("B", "C"))
    assert(ab > ac && ab > bc,
      s"planted A-B overlap must dominate: ab=$ab ac=$ac bc=$bc")
    // true shingle Jaccard(A,B) is ~1/3 (5 shared of ~15 distinct doc
    // vocabularies); 32 perms puts the estimate well away from 0 and 1
    assert(ab >= 100000L && ab <= 700000L, s"ab=$ab out of plausible range")
  }
}
