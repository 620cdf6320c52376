package graft

import org.apache.spark.sql.functions._
import graft.llm.{Classifier, Dedup, TextAnalysis}

/** Value checks for the round-8 curation operators: C4-style block
  * dedup, Gopher repetition signals, and the NB quality classifier. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 8-token block shared VERBATIM AND ALIGNED between docs 0 and 1
  private val blk = "one two three four five six seven eight"

  test("removeDuplicateBlocks cuts a cross-doc block from every copy") {
    val docs = Seq(
      (0L, s"$blk alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$blk iota kappa lambda mu nu xi omicron pi"),
      (2L, "unique content tokens apple banana cherry date elderberry")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateBlocks(docs, blockLen = 8, minDf = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((0L, 2L, 1L,
      "alpha beta gamma delta epsilon zeta eta theta")))
    assert(out(1) == ((1L, 2L, 1L,
      "iota kappa lambda mu nu xi omicron pi")))
    // doc 2: 8 tokens = 1 block, unique → untouched
    assert(out(2) == ((2L, 1L, 0L,
      "unique content tokens apple banana cherry date elderberry")))
  }

  test("removeDuplicateBlocks keeps within-doc repeats and partial tails") {
    val docs = Seq(
      // the same block TWICE in one doc: corpus df = 1 distinct doc → kept
      (0L, s"$blk $blk tail"),
      (1L, "short doc only")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateBlocks(docs, blockLen = 8, minDf = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((0L, 2L, 0L, s"$blk $blk tail")))
    // shorter than one block: zero blocks, passes whole
    assert(out(1) == ((1L, 0L, 0L, "short doc only")))
  }

  test("removeDuplicateBlocks only cuts at block alignment") {
    // doc 1 contains doc 0's block SHIFTED by one token — different
    // block boundaries, so nothing is removed (the documented contrast
    // with removeDuplicateSpans, which would catch it)
    val docs = Seq(
      (0L, s"$blk suffix one suffix two suffix three suffix four"),
      (1L, s"prefix $blk other tokens follow here now then")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateBlocks(docs, blockLen = 8, minDf = 2L)
    assert(out.filter(col("n_removed") > 0).count() == 0)
  }

  test("gopherRepetition flags top-gram mass and duplicate-gram coverage") {
    // 40 distinct tokens: top4 share = 4/40 = 100000 ppm, under every rule
    // (an all-distinct doc of < 25 tokens would trip top4 = 4/n > 16 % —
    // the rules are calibrated for real doc lengths)
    val clean = (1 to 40).map("w" + _).mkString(" ")
    val loop2 = "x y x y x y x y x y x y x y x y x y x y"     // top2 dominates
    // a 5-gram repeated twice inside one 20-token doc → 10/20 covered
    val span5 = "v w x y z v w x y z a b c d e f g h i j"
    val docs = Seq((0L, clean), (1L, loop2), (2L, span5), (3L, "tiny"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRepetition(docs).orderBy("doc_id").collect()
    val clean0 = out(0)
    assert(clean0.getAs[Long]("rep_pass") == 1L, s"clean doc must pass: $clean0")
    val r1 = out(1)
    // "x y" occurs 10 times in 20 tokens → share 10·2·1e6/20 = 1e6
    assert(r1.getAs[Long]("top2_ppm") == 1000000L)
    assert(r1.getAs[Long]("rep_pass") == 0L)
    val r2 = out(2)
    // v w x y z repeated → its two occurrences cover 10 of 20 tokens
    assert(r2.getAs[Long]("dup5_ppm") == 500000L, s"dup5: $r2")
    assert(r2.getAs[Long]("rep_pass") == 0L)
    // also check dup10 is clean for the span doc (no repeated 10-gram)
    assert(r2.getAs[Long]("dup10_ppm") == 0L)
    val r3 = out(3)
    // 1 token: every signal is the −1 sentinel; sentinels pass
    assert(r3.getAs[Long]("top2_ppm") == -1L)
    assert(r3.getAs[Long]("top3_ppm") == -1L)
    assert(r3.getAs[Long]("dup5_ppm") == -1L)
    assert(r3.getAs[Long]("dup10_ppm") == -1L)
    assert(r3.getAs[Long]("rep_pass") == 1L)
  }

  test("nbQualityScores separates planted class vocabularies") {
    val good = (0L to 3L).map(i => (i, "alpha " * 19 + "alpha", true))
    val bad = (4L to 7L).map(i => (i, "beta " * 19 + "beta", false))
    val docs = (good ++ bad).toDF("doc_id", "text", "is_good")
    val out = Classifier.nbQualityScores(docs, col("is_good"))
      .orderBy("doc_id").collect()
    val goodScores = out.take(4).map(_.getAs[Long]("score_mbits"))
    val badScores = out.drop(4).map(_.getAs[Long]("score_mbits"))
    assert(goodScores.forall(_ > 0), s"good docs must score > 0: ${goodScores.toSeq}")
    assert(badScores.forall(_ < 0), s"bad docs must score < 0: ${badScores.toSeq}")
    assert(out.take(4).forall(_.getAs[Long]("kept") == 1L))
    assert(out.drop(4).forall(_.getAs[Long]("kept") == 0L))
    // balanced classes → prior ≈ 0; the alpha weight is symmetric to beta
    assert(goodScores.toSet.size == 1 && badScores.toSet.size == 1)
    assert(goodScores.head == -badScores.head ||
      math.abs(goodScores.head + badScores.head) <= 1000,
      s"symmetric classes should score near-symmetrically: " +
        s"${goodScores.head} vs ${badScores.head}")
  }

  test("incremental NB training folds to the one-shot state exactly") {
    val docs = Seq(
      (0L, "alpha beta alpha gamma", true), (1L, "beta beta delta", false),
      (2L, "alpha epsilon", true), (3L, "gamma gamma beta", false),
      (4L, "delta alpha beta", true), (5L, "epsilon epsilon", false)
    ).toDF("doc_id", "text", "is_good")
    val oneShot = Classifier.weightsFromCounts(
        Classifier.countState(docs, col("is_good")))
      .orderBy("tok").collect().toSeq
    // 3-way uneven split, folded pairwise in a different order
    val s1 = Classifier.countState(docs.filter(col("doc_id") < 2), col("is_good"))
    val s2 = Classifier.countState(docs.filter(col("doc_id") === 2), col("is_good"))
    val s3 = Classifier.countState(docs.filter(col("doc_id") > 2), col("is_good"))
    val folded = Classifier.weightsFromCounts(
        Classifier.mergeCounts(Classifier.mergeCounts(s3, s1), s2))
      .orderBy("tok").collect().toSeq
    assert(folded == oneShot)
  }

  test("scoreWithWeights applies a trained model to an unseen corpus") {
    val train = Seq(
      (0L, "alpha alpha alpha alpha", true), (1L, "beta beta beta beta", false)
    ).toDF("doc_id", "text", "is_good")
    val weights = Classifier.weightsFromCounts(
      Classifier.countState(train, col("is_good")))
    val apply = Seq(
      (10L, "alpha alpha unseen"),   // OOV token contributes nothing
      (11L, "beta beta unseen")
    ).toDF("doc_id", "text")
    val out = Classifier.scoreWithWeights(apply, weights)
      .orderBy("doc_id").collect()
    // n_tokens counts only in-vocabulary tokens
    assert(out(0).getAs[Long]("n_tokens") == 2L)
    assert(out(0).getAs[Long]("score_mbits") > 0)
    assert(out(1).getAs[Long]("score_mbits") < 0)
  }

  test("centroidOutliers ranks a planted outlier first and flags the core") {
    import graft.llm.Similarity
    // group 0: nine vectors hugging +e0, one planted at −e0 (outlier);
    // group 1: a second group proves independence
    val mk = (head: Float) => Array.fill(64)(0.01f).updated(0, head)
    val g0 = (0L to 8L).map(i => (i, mk(1.0f + 0.001f * i), 0))
    val out = Seq((9L, mk(-1.0f), 0))
    val g1 = (10L to 14L).map(i => (i, mk(0.5f), 1))
    val embs = (g0 ++ out ++ g1).toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidOutliers(embs, "label", dim = 64,
        outlierPermille = 100, protoPermille = 100)
      .orderBy("vec_id").collect()
    val byId = r.map(x => x.getAs[Long]("vec_id") -> x).toMap
    assert(byId(9L).getAs[Long]("rank_far") == 1L, "planted outlier must rank farthest")
    assert(byId(9L).getAs[Long]("is_outlier") == 1L)
    // exactly ceil-free permille flags: n=10, 100‰ → 1 outlier, 1 prototype
    assert(r.count(x => x.getAs[Int]("label") == 0 &&
      x.getAs[Long]("is_outlier") == 1L) == 1)
    assert(r.count(x => x.getAs[Int]("label") == 0 &&
      x.getAs[Long]("is_prototype") == 1L) == 1)
    // the prototype is NOT the outlier
    val proto = r.find(x => x.getAs[Int]("label") == 0 &&
      x.getAs[Long]("is_prototype") == 1L).get
    assert(proto.getAs[Long]("vec_id") != 9L)
    // group 1: all five identical vectors → dist2 0, ties broken by id
    val g1rows = r.filter(_.getAs[Int]("label") == 1)
    assert(g1rows.forall(_.getAs[Long]("dist2m") == 0L))
    assert(g1rows.map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("rank_far"))
      .sortBy(_._1).map(_._2).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // the shuffled-centroid form (large-k kmeans groupings) is identical
    val r2 = Similarity.centroidOutliers(embs, "label", dim = 64,
        outlierPermille = 100, protoPermille = 100,
        broadcastCentroids = false)
      .orderBy("vec_id").collect()
    assert(r2.toSeq == r.toSeq)
  }

  test("stupidBackoffScore resolves branches with exact rational terms") {
    // train "a b c d e": trigram/bigram/unigram counts all 1, T = 5
    val docs = Seq(
      (0L, "a b c d e", "en"),
      (1L, "a b c d e", "zh"),  // exact copy: every trigram seen → 1e6 each
      (2L, "c d x", "zh"),      // tri+bi+uni all unseen → term 0
      (3L, "x b c", "zh"),      // bigram (b,c) seen → 0.4·c2/c1p = 400000
      (4L, "x y a", "zh"),      // only unigram a seen → 0.16·1/5 = 32000
      (5L, "hi there", "zh")    // < 3 tokens → no row
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.stupidBackoffScore(docs, col("lang") === "en")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("tri_hits") == 3L)
    assert(byId(1L).getAs[Long]("sb_score_ppm") == 1000000L)
    assert(byId(2L).getAs[Long]("uni_backoffs") == 1L)
    assert(byId(2L).getAs[Long]("sb_score_ppm") == 0L)
    assert(byId(3L).getAs[Long]("bi_hits") == 1L)
    assert(byId(3L).getAs[Long]("sb_score_ppm") == 400000L)
    assert(byId(4L).getAs[Long]("uni_backoffs") == 1L)
    assert(byId(4L).getAs[Long]("sb_score_ppm") == 32000L)
  }

  test("perceptualNearDupPairs equals brute-force popcount at radius 3") {
    import graft.llm.Multimodal
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base), (1L, base),                       // identical → hamming 0
      (2L, base + " x"),                            // near-identical payload
      (3L, "completely different words about spark shuffles and partitions"),
      (4L, "another unrelated document mentioning merge sinks and floors")
    ).toDF("doc_id", "text")
    val got = Multimodal.perceptualNearDupPairs(docs, maxHamming = 3)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSet
    // brute force over the same hashes
    val hs = Multimodal.perceptualHash(docs).as[(Long, Long)].collect().toMap
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == want, s"pigeonhole must be exact: got=$got want=$want")
    assert(got.contains((0L, 1L, 0L)), "identical payloads must pair at hamming 0")
  }

  test("multimodal quality gates catch planted violations") {
    import graft.llm.Multimodal
    // planted: 1 healthy; 2 undecodable (payload shorter than the
    // 2-byte header); 3 near-constant content (one byte is the whole
    // payload); 4 extreme aspect ('z','d' header → 86×20, ratio 4.3 > 4)
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog 0123456789"),
      (2L, "x"),
      (3L, "a" * 40),
      (4L, "zd a varied payload holding many different letters 0123456789")
    ).toDF("doc_id", "text")
    val got = Multimodal.qualityStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // healthy: every gate set
    assert(got(1L).getAs[Long]("rule_mask") == 15L && got(1L).getAs[Long]("pass") == 1L)
    // undecodable: no dims, no aspect, fully-concentrated "empty" stats —
    // every gate fails, but the row still exists (quarantine evidence)
    assert(got(2L).getAs[Long]("rule_mask") == 0L)
    assert(got(2L).getAs[Long]("width") == 0L && got(2L).getAs[Long]("height") == 0L)
    // near-constant: decodes fine, dims/aspect fine, entropy gate trips
    assert(got(3L).getAs[Long]("maxbyte_ppm") == 1000000L)
    assert(got(3L).getAs[Long]("rule_mask") == 7L && got(3L).getAs[Long]("pass") == 0L)
    // extreme aspect: 86×20 decoded dims → 4.3e6 ppm, outside [0.25, 4]
    assert(got(4L).getAs[Long]("aspect_ppm") == 4300000L)
    assert(got(4L).getAs[Long]("rule_mask") == 11L && got(4L).getAs[Long]("pass") == 0L)
  }

  test("crossModalEval: distinct content retrieves its pair at rank 1; exact dups tie to the lower id") {
    import graft.llm.Multimodal
    // the byte-bigram slot is (b1·31 + b2) % 16 = (b2 − b1) % 16 (31 ≡
    // −1 mod 16), so alternating two-char docs concentrate on exactly
    // two slots determined by the char DIFFERENCE — docs built from
    // distinct differences have ORTHOGONAL embeddings, and a caption
    // (second half) has the same two slots as its image: sim(self) = 1,
    // sim(cross) = 0. Rank arithmetic is then exact, not probabilistic.
    val docs = Seq(
      (1L, "aa", "ababababab"), // slots {1, 15}
      (2L, "aa", "acacacacac"), // slots {2, 14}
      (3L, "aa", "adadadadad"), // slots {3, 13}
      (4L, "aa", "aeaeaeaeae"), // slots {4, 12} — exact dup pair with 5
      (5L, "aa", "aeaeaeaeae"),
      (6L, "aa", "a")           // no bigrams: zero norm, excluded
    ).toDF("doc_id", "lang", "text")
    val out = Multimodal.crossModalEval(docs, k = 5, dim = 16, perLang = 8)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length == 1)
    val (lang, n, h1, h5, rr) = out.head
    assert(lang == "aa")
    assert(n == 5L, "the zero-norm caption must be excluded from probes")
    // queries 1-3 retrieve their own image at rank 1 (orthogonal to all
    // else); the dup pair TIES at sim 1: query 4 keeps rank 1 (the tying
    // candidate 5 has the higher id), query 5 falls to rank 2
    assert(h1 == 4L && h5 == 5L)
    assert(rr == 4L * 1000000L + 500000L)
  }

  test("captionAgreementFilter: planted mismatched pairs drop, matched pairs survive the calibrated gate") {
    import graft.llm.Multimodal
    // periodic two-char docs concentrate on two slots set by the char
    // DIFFERENCE (31 ≡ −1 mod 16, see the crossModalEval test): a doc
    // whose second half repeats the SAME pattern as the whole has
    // caption ∝ image (cosine ≈ 1), while a doc whose halves use
    // DIFFERENT diffs splits the image mass across both slot pairs but
    // leaves the caption on one — cosine ≈ 0.5. Six matched + two
    // planted mismatched in one language: the 250-permille calibrated
    // threshold sits between the populations, so exactly the planted
    // pair drops.
    val matched = (1L to 6L).map(i => (i, "aa", "ab" * 20))
    val mismatched = Seq(
      (7L, "aa", "ab" * 10 + "ce" * 10),  // halves on slots {1,15} vs {2,14}
      (8L, "aa", "ab" * 10 + "cf" * 10))  // halves on slots {1,15} vs {3,13}
    val docs = (matched ++ mismatched).toDF("doc_id", "lang", "text")
    val out = Multimodal.captionAgreementFilter(docs, dim = 16,
        dropPermille = 250, bucketPpm = 50000L)
      .select("doc_id", "agree_ppm", "thr_ppm", "keep")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    // matched pairs: near-perfect agreement, all kept
    (1L to 6L).foreach { i =>
      assert(byId(i)._2 > 900000L, s"doc $i agree=${byId(i)._2}")
      assert(byId(i)._4 == 1L, s"doc $i must survive")
    }
    // planted mismatches: visibly lower cosine, both dropped by the
    // per-language threshold (one threshold for the whole lang group)
    Seq(7L, 8L).foreach { i =>
      assert(byId(i)._2 < 800000L, s"doc $i agree=${byId(i)._2}")
      assert(byId(i)._4 == 0L, s"doc $i must drop")
    }
    assert(out.map(_._3).distinct.length == 1, "one calibrated threshold per lang")
  }

  test("frequencySpectrum counts types per count with exact GT adjustment") {
    import graft.llm.Corpus
    // tokens: a×3, b×2, c×1 → N_1=1, N_2=1, N_3=1
    val docs = Seq((0L, "a a a b"), (1L, "b c")).toDF("doc_id", "text")
    val out = Corpus.frequencySpectrum(docs).orderBy("r")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 2000000L),   // r*=2·N_2/N_1 = 2 → 2e6 ppm
      (2L, 1L, 3000000L),   // r*=3·N_3/N_2 = 3 → 3e6 ppm
      (3L, 1L, 0L)))        // no N_4 → raw-spectrum 0
  }

  test("knnLabelProbe scores a label-respecting space perfectly") {
    import graft.llm.Similarity
    // two tight clusters along different axes, labels follow clusters
    def vec(axis: Int, jitter: Float) = {
      val a = Array.fill(64)(0.001f); a(axis) = 1.0f + jitter; a
    }
    val embs = ((0L to 5L).map(i => (i, vec(0, 0.01f * i), 0)) ++
      (6L to 11L).map(i => (i, vec(7, 0.01f * i), 1)))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelProbe(embs, embs, k = 3)
      .orderBy("true_label").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("acc_ppm") == 1000000L),
      s"clustered labels must probe perfectly: ${out.toSeq}")
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(6L, 6L))
  }

  test("compositionReport shares sum to ~1e6 with exact counts") {
    import graft.llm.Corpus
    val docs = Seq(
      (0L, "a b c d", "en", "s0"), (1L, "e f", "en", "s0"),
      (2L, "g h i j", "zh", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Corpus.compositionReport(docs).orderBy("source", "lang")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("s0", "en", 2L, 6L, 600000L),
      ("s1", "zh", 1L, 4L, 400000L)))
  }

  test("nbQualityScores shuffled-vocab join equals the broadcast form") {
    val docs = Seq(
      (0L, "alpha beta gamma", true), (1L, "delta epsilon zeta", false),
      (2L, "alpha delta theta", true), (3L, "beta epsilon iota", false)
    ).toDF("doc_id", "text", "is_good")
    val a = Classifier.nbQualityScores(docs, col("is_good"),
      broadcastVocab = true).orderBy("doc_id").collect().toSeq
    val b = Classifier.nbQualityScores(docs, col("is_good"),
      broadcastVocab = false).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("contaminationMatrix counts planted overlaps per benchmark; drift handles vanishing sources") {
    import graft.llm.Corpus
    val phrase = "the quick brown fox jumps over lazy dogs"
    val corpus = Seq(
      (0L, s"$phrase and then some extra words here"), // overlaps bench A
      (1L, "completely different content with unique tokens all around"),
      (2L, s"prefix words $phrase suffix words too")   // overlaps bench A
    ).toDF("doc_id", "text")
    val benchA = Seq((100L, s"intro $phrase outro tokens")).toDF("doc_id", "text")
    val benchB = Seq((200L, "nothing in common with that corpus at all ever")).toDF("doc_id", "text")
    val m = Corpus.contaminationMatrix(corpus,
        Seq("A" -> benchA, "B" -> benchB), k = 5)
      .orderBy("benchmark").collect()
    assert(m(0).getString(0) == "A" && m(0).getLong(1) == 2L,
      s"both planted docs must flag against A: ${m.toSeq}")
    assert(m(0).getAs[Long]("max_shared") >= 4L) // 8-token phrase → 4 5-grams
    assert(m(1).getString(0) == "B" && m(1).getLong(1) == 0L &&
      m(1).getAs[Long]("total_shared") == 0L)

    val snapA = Seq((0L, "s1"), (1L, "s1"), (2L, "s2"), (3L, "s2")).toDF("doc_id", "source")
    val snapB = Seq((0L, "s1"), (1L, "s3"), (2L, "s3"), (3L, "s3")).toDF("doc_id", "source")
    val d = Corpus.distributionDrift(snapA, snapB, "source")
      .orderBy("source").as[(String, Long, Long, Long)].collect().toSeq
    // s1: 50% -> 25%; s2 vanished (50% -> 0); s3 appeared (0 -> 75%)
    assert(d == Seq(("s1", 500000L, 250000L, 250000L),
      ("s2", 500000L, 0L, 500000L), ("s3", 0L, 750000L, 750000L)), d.toString)
  }

  test("cluster label propagation: one flagged copy poisons its whole dup cluster") {
    import graft.llm.{Clusters, Dedup}
    val long = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).trim
    val docs = Seq(
      (0L, long),                      // cluster {0,1,2}: near-identical
      (1L, long + " lambda"),
      (2L, "mu " + long),              // all pass a len>=30 gate...
      (3L, "short unrelated doc"),     // singleton, FAILS the gate
      (4L, ("one two three four five six seven " * 5).trim) // clean singleton
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, k = 3, maxShingleDf = 64L)
      .filter(col("jaccard_ppm") >= 500000L)
    val cc = Clusters.connectedComponents(pairs.select("id_a", "id_b"))
    // gate: fail doc 1 ONLY (planted per-copy verdict) — its cluster
    // mates 0 and 2 must inherit the rejection
    val gate = docs.select(col("doc_id"),
      (col("doc_id") =!= 1L && size(split(col("text"), " ")) >= 5)
        .cast("long").as("own_kept"))
    val lab = gate.join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"), col("own_kept"))
    val out = lab.join(
        lab.groupBy("cluster_id").agg(min("own_kept").as("cluster_kept")),
        Seq("cluster_id"))
      .select("doc_id", "own_kept", "cluster_kept")
      .as[(Long, Long, Long)].collect()
      .map { case (d, o, c) => d -> ((o, c)) }.toMap
    assert(out(0L) == ((1L, 0L)) && out(2L) == ((1L, 0L)),
      s"cluster mates must inherit the flag: $out")
    assert(out(1L) == ((0L, 0L)))
    assert(out(4L) == ((1L, 1L)), s"clean singleton unaffected: $out")
  }

  test("scoreWithWeights emits an explicit 0 row for an all-OOV doc") {
    val train = Seq((0L, "alpha beta", true), (1L, "gamma delta", false))
      .toDF("doc_id", "text", "is_good")
    val w = Classifier.weightsFromCounts(Classifier.countState(train, col("is_good")))
    // doc 11 is entirely out-of-vocabulary: it must still get a row —
    // score 0 (no evidence), the threshold decision explicit — instead
    // of silently vanishing from the scored output
    val apply = Seq((10L, "alpha zeta"), (11L, "omega psi")).toDF("doc_id", "text")
    val out = Classifier.scoreWithWeights(apply, w, minScoreMbits = 0L)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    val oov = out(1)
    assert(oov.getLong(0) == 11L && oov.getAs[Long]("n_tokens") == 0L &&
      oov.getAs[Long]("score_mbits") == 0L && oov.getAs[Long]("kept") == 1L)
  }

  test("multimodal joint dedup: planted cross-modality duplicates collapse via union CC") {
    import graft.llm.{Clusters, Multimodal}
    // PLANTS (q140's composition). For short lowercase text payloads the
    // perceptual hash reduces to the SPACE-POSITION pattern (every
    // letter's slot sum clears the mean, every space misses it), and
    // SimHash is order-free over the token multiset — which gives exact
    // single-modality constructions:
    //   image-ONLY pair (1,2): swapping the chars at distance 64 keeps
    //   every phash slot sum (slot i folds positions i and i+64) →
    //   identical phash, while the TOKENS change (cat/dog vs dat/cog) →
    //   far SimHash;
    //   text-ONLY pair (3,4): the same token multiset permuted → equal
    //   SimHash, but the word-length layout moves every space → phash
    //   hamming 8;
    //   image-ONLY bridge (3,5): different words with the SAME length
    //   structure → identical space pattern (phash hamming 0), disjoint
    //   tokens → far SimHash.
    // Expect clusters {1,2} and {3,4,5} — the latter merged by one edge
    // per modality (the chain CROSSES modalities); keep-list = min ids.
    val d1 = "cat " * 16 + "dog " * 16
    val d2 = "dat " * 16 + "cog " * 16
    val d3 = "red blue green yellow purple"
    val d4 = "purple yellow green blue red"
    val d5 = "tan pink coral violet orchid"
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4), (5L, d5),
      (6L, "unique zebra quartz violin meadow")).toDF("doc_id", "text")
    // planted provenance: each edge exists in exactly ONE modality
    val img = Multimodal.perceptualNearDupPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val txt = graft.llm.Dedup.simHashPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(img.contains((1L, 2L)) && !txt.contains((1L, 2L)),
      s"(1,2) must be image-only: img=$img txt=$txt")
    assert(txt.contains((3L, 4L)) && !img.contains((3L, 4L)),
      s"(3,4) must be text-only: img=$img txt=$txt")
    assert(img.contains((3L, 5L)) && !txt.contains((3L, 5L)),
      s"(3,5) must be image-only: img=$img txt=$txt")
    // the q140 composition: CC over the union edge list, keep min ids
    val edges = Multimodal.perceptualNearDupPairs(docs, maxHamming = 3)
      .select("id_a", "id_b")
      .union(graft.llm.Dedup.simHashPairs(docs, maxHamming = 3)
        .select("id_a", "id_b"))
    val cc = Clusters.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(cc(2L) == 1L, s"image pair must merge: $cc")
    assert(cc(4L) == 3L && cc(5L) == 3L,
      s"cross-modality chain must merge {3,4,5}: $cc")
    val dropped = cc.collect { case (id, rep) if id != rep => id }.toSet
    val kept = (1L to 6L).toSet -- dropped
    assert(kept == Set(1L, 3L, 6L))
  }

  // ---- k-center greedy coreset (q155) ----

  // three well-separated groups in 2-d: the greedy must COVER all of
  // them before densifying any (top-k/prototype sampling would not)
  private def kcEmb = {
    import graft.llm.Similarity
    Seq(
      (1L, Array(0.00f, 0.00f)), (2L, Array(0.01f, 0.00f)),   // group A
      (3L, Array(1.00f, 0.00f)), (4L, Array(1.00f, 0.01f)),   // group B
      (5L, Array(0.00f, 1.00f))                                // outlier C
    ).toDF("vec_id", "embedding")
  }

  test("kCenterGreedy covers every group before densifying; radius non-increasing") {
    import graft.llm.Similarity
    val picks = Similarity.kCenterGreedy(kcEmb, k = 3, dim = 2)
      .orderBy("step").as[(Long, Long, Long)].collect()
    // seed = min id (group A); then id 4 — (1, 0.01) is EXACTLY
    // (10⁶)² + (10⁴)² from the seed, a hair beyond id 3's (10⁶)² —
    // then the outlier: one pick per group, never two in one
    assert(picks.map(_._2).toSeq == Seq(1L, 4L, 5L), picks.toSeq.toString)
    assert(picks(0)._3 == -1L)
    assert(picks(1)._3 == 1000000L * 1000000L + 10000L * 10000L)
    assert(picks(2)._3 == 1000000L * 1000000L)
    // the coverage radius never grows as centers are added
    val radii = picks.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
  }

  test("kCenterGreedy: batched rounds and corpus exhaustion") {
    import graft.llm.Similarity
    // perRound=2 demonstrates the documented approximation: the round
    // ranks by distance to the round-START set, so it takes BOTH group-B
    // points (4, then the 3-vs-5 tie at (10⁶)² breaking to 3) and the
    // outlier at 5 is missed — the intra-batch redundancy exact greedy
    // (above) avoids by re-ranking after every pick
    val batched = Similarity.kCenterGreedy(kcEmb, k = 3, dim = 2, perRound = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(batched == Set(1L, 4L, 3L))
    // k beyond the corpus: every vector selected exactly once, then stop
    val all = Similarity.kCenterGreedy(kcEmb, k = 10, dim = 2)
      .select("vec_id").as[Long].collect()
    assert(all.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(all.length == all.distinct.length)
  }

  // ---- soft dedup weights (q156) ----

  test("softDedupWeights: copies of an n-way family each read 1e6/n, singletons 1e6") {
    val fam = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, fam), (2L, fam), (3L, fam + " extra"),               // 3-copy family
      (4L, "unique penguin quartz violin meadow oak river")     // singleton
    ).toDF("doc_id", "text")
    val w = Dedup.softDedupWeights(docs, k = 3, thresholdPpm = 500000L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(w.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // family {1,2,3} → cluster 1, n=3, weight 333333; singleton keeps 1e6
    assert(w.take(3).forall(r => r._2 == 1L && r._3 == 3L && r._4 == 333333L),
      w.toSeq.toString)
    assert(w(3) == ((4L, 4L, 1L, 1000000L)))
    // total mass: the family sums to ≈ one doc (floor division), not three
    assert(w.take(3).map(_._4).sum == 999999L)
  }

  // ---- maintained contamination state (q157) ----

  test("contamination state: random fold + replay == one-shot matrix") {
    import graft.llm.Corpus
    val bench = Seq((100L, "held out evaluation prompt tokens one two three four"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "held out evaluation prompt tokens one two aardvark baseline"),
      (2L, "completely unrelated content with no benchmark overlap at all"),
      (3L, "prompt tokens one two three four shared tail here yes"),
      (4L, "more clean text nothing shared with anything held elsewhere")
    ).toDF("doc_id", "text")
    val benches = Seq("bench_x" -> bench)
    val oneShot = Corpus.matrixFromState(
      Corpus.contaminationState(docs, benches, k = 5), Seq("bench_x"))
      .as[(String, Long, Long, Long)].collect().toSeq
    // 3-way uneven fold with batch 0 replayed
    val parts = Seq(docs.filter($"doc_id" <= 1), docs.filter($"doc_id" === 2),
      docs.filter($"doc_id" >= 3))
    val folded = parts.map(p => Corpus.contaminationState(p, benches, k = 5))
      .reduce(Corpus.mergeContaminationState)
    val replayed = Corpus.mergeContaminationState(folded,
      Corpus.contaminationState(parts(0), benches, k = 5))
    val fromState = Corpus.matrixFromState(replayed, Seq("bench_x"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(fromState == oneShot, s"$fromState vs $oneShot")
    // and the zero-overlap benchmark still gets its explicit row
    val zero = Corpus.matrixFromState(replayed, Seq("bench_x", "bench_empty"))
      .orderBy("benchmark").as[(String, Long, Long, Long)].collect()
    assert(zero(0) == (("bench_empty", 0L, 0L, 0L)))
  }

  test("perSourceTiers: within-source ranks, singleton sources rank head; threshold form equals the exact form off derived cutoffs") {
    import graft.llm.Corpus
    // src_a: 4 tie-free scores -> ranks 1..4 at 0/250k/500k/750k ppm =
    // head/head/middle/tail at the 30%/65% cuts; src_b: a singleton
    val docs = Seq((1L, "src_a"), (2L, "src_a"), (3L, "src_a"),
      (4L, "src_a"), (5L, "src_b")).toDF("doc_id", "source")
    val scores = Seq((1L, 900L), (2L, 700L), (3L, 500L), (4L, 300L),
      (5L, 42L)).toDF("doc_id", "score_ppm")
    val exact = Corpus.perSourceTiers(docs, scores)
    val got = exact.select("doc_id", "tier").as[(Long, String)]
      .collect().toMap
    assert(got == Map(1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "tail", 5L -> "head"))
    // rank_ppm arithmetic: (rnk-1)*1e6 DIV n
    assert(exact.filter($"doc_id" === 3L).select("rank_ppm")
      .as[Long].head() == 500000L)
    // the serving form: cutoffs = the exact form's per-source minimum
    // score of each tier (tie-free data, so the boundaries are clean)
    val thr = exact.groupBy("source").agg(
      coalesce(min(when($"tier" === "head", $"score_ppm")), lit(Long.MaxValue))
        .as("head_min"),
      coalesce(min(when($"tier" =!= "tail", $"score_ppm")), lit(Long.MaxValue))
        .as("mid_min"))
    val served = Corpus.tiersFromThresholds(docs, scores, thr)
      .select("doc_id", "tier").as[(Long, String)].collect().toMap
    assert(served == got)
    // a source that appeared AFTER calibration must surface as
    // 'uncalibrated', never silently vanish from the labeled corpus
    val grown = docs.unionByName(Seq((9L, "src_new")).toDF("doc_id", "source"))
    val grownScores = scores.unionByName(
      Seq((9L, 123L)).toDF("doc_id", "score_ppm"))
    val late = Corpus.tiersFromThresholds(grown, grownScores, thr)
      .select("doc_id", "tier").as[(Long, String)].collect().toMap
    assert(late(9L) == "uncalibrated" && late.size == 6)
  }
}
