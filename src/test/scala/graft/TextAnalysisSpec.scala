package graft

import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis

/** Planted-data checks for the corpus-quality operators whose oracle
  * runs see no interesting input (the synthetic docs carry no PII and
  * little repetition) — redaction and the repetition flags are proven
  * here. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats flags looping text and passes varied text") {
    val docs = Seq(
      (0L, "spam spam spam spam spam eggs"),           // 5/6 one token
      (1L, "each word here is completely different")   // all distinct
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs).orderBy("doc_id")
      .select("n_tokens", "n_distinct", "top_tok_cnt", "top_tok_ppm", "is_repetitive")
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(r(0) == ((6L, 2L, 5L, 5L * 1000000 / 6, 1)))
    assert(r(1) == ((6L, 6L, 1L, 1L * 1000000 / 6, 0)))
  }

  test("gopherRules: each rule trips on its planted violation") {
    val good = "the a of and to " + Seq.fill(25)("word").mkString(" ")
    val docs = Seq(
      (0L, good),                                   // all five rules pass
      (1L, "just five tiny words here"),            // r1 (count), r5 (stops)
      (2L, Seq.fill(30)("##").mkString(" ")),       // r2 (mwl), r3 (sym), r4, r5
      (3L, "the a " + Seq.fill(28)("12345").mkString(" "))) // r4 (alpha)
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs).orderBy("doc_id")
      .select("n_tokens", "rule_mask", "pass")
      .as[(Long, Long, Long)].collect()
    assert(r(0) == ((30L, 31L, 1L)))
    // doc1: r2+r3+r4 pass -> mask 2+4+8
    assert(r(1) == ((5L, 14L, 0L)))
    // doc2: only r1 passes (30 tokens): mwl 2e6 < 3e6, sym 2e6 >= 1e5,
    // alpha 0, stops 0 -> mask 1
    assert(r(2) == ((30L, 1L, 0L)))
    // doc3: 30 tokens, mwl = (3+1+28*5)/30 = 4.8e6 ok, sym 0 ok,
    // alpha 2/30 < 80%, stops the+a = 2 ok -> mask 1+2+4+16 = 23
    assert(r(3) == ((30L, 23L, 0L)))
  }

  test("ngramNovelty: copies score 0, originals score high, short docs emit no row") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),  // shares all grams with doc 1
      (1L, "alpha beta gamma delta epsilon"),  // exact copy
      (2L, "one two three four five"),         // fully original
      (3L, "too short")                        // < 3 tokens -> no row
    ).toDF("doc_id", "text")
    val r = TextAnalysis.ngramNovelty(docs, 3).orderBy("doc_id")
      .select("doc_id", "n_grams", "n_novel", "novelty_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq(
      (0L, 3L, 0L, 0L), (1L, 3L, 0L, 0L), (2L, 3L, 3L, 1000000L)))
  }

  test("piiScrub redacts emails and digit runs, keeps clean text intact") {
    val docs = Seq(
      (0L, "contact alice.smith+dev@example.co.uk or call 123456789 now"),
      (1L, "no personal data in this sentence at all"),
      (2L, "two mails a@b.io c@d.org and card 4111111111111111 here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(docs).orderBy("doc_id")
      .select("n_emails", "n_digit_runs", "scrubbed", "has_pii")
      .as[(Long, Long, String, Int)].collect()
    assert(r(0) == ((1L, 1L, "contact <EMAIL> or call <NUM> now", 1)))
    assert(r(1) == ((0L, 0L, "no personal data in this sentence at all", 0)))
    assert(r(2) == ((2L, 1L, "two mails <EMAIL> <EMAIL> and card <NUM> here", 1)))
  }

  test("winnowing guarantees a shared fingerprint for any shared w+k-1 token run") {
    // k=4, w=5 ⇒ any shared run of 8 tokens must produce ≥1 shared
    // fingerprint (the Schleimer et al. detection floor); disjoint docs
    // must produce none
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"left padding words before $shared"),
      (2L, s"$shared and then entirely different trailing content"),
      (3L, "zebra yak xylophone wombat vulture toucan salmon rabbit quail"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowingPairs(docs, k = 4, w = 5, minShared = 1L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // fingerprint density: ~2/(w+1) of gram count, never more than grams
    val fps = TextAnalysis.winnowingFingerprints(docs, k = 4, w = 5)
    val perDoc = fps.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perDoc.values.forall(n => n >= 1))
    assert(perDoc(3L) <= 6) // 9 tokens → 6 grams → ≤ 2 full windows... ≤ grams
  }

  test("bigramLmScore penalizes rare continuations of common prefixes") {
    // the corpus repeats one phrasing; a doc reusing its PREFIXES with
    // novel successors gets low MLE transition probabilities — the axis
    // the filter discriminates. (A doc of globally-unique tokens scores
    // 1e6: unsmoothed MLE rates never-seen prefixes as perfectly
    // predictable — see the operator scaladoc.)
    val docs = ((1L to 6L).map(i => (i, "the model trains on clean web text")) ++
      Seq((7L, "the qv model wm trains kt"))).toDF("doc_id", "text")
    val scores = graft.llm.TextAnalysis.bigramLmScore(docs)
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toMap
    assert(scores(1L) > 800000L, s"repeated phrasing should score high: ${scores(1L)}")
    assert(scores(7L) < scores(1L) * 2 / 3,
      s"rare continuations should score well below: ${scores(7L)} vs ${scores(1L)}")
  }

  test("qualityFeatures covers every doc; short docs get -1 sentinels") {
    import graft.llm.TextAnalysis
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog sat too while a bird flew over " +
        "the quiet garden of this small house to rest"),
      (2L, "solo"),          // 1 token: no novelty, no LM score
      (3L, "two words")      // 2 tokens: LM score yes, trigram novelty no
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityFeatures(docs)
      .select("doc_id", "n_tokens", "novelty_ppm", "lm_score_ppm")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(got.size == 3) // whole corpus covered, nothing dropped
    assert(got(2L)._3 == -1L && got(2L)._4 == -1L)
    assert(got(3L)._3 == -1L && got(3L)._4 >= 0L)
    assert(got(1L)._3 >= 0L && got(1L)._4 >= 0L)
    // features agree with their source operators
    val nov = TextAnalysis.ngramNovelty(docs, 3)
      .select("doc_id", "novelty_ppm").as[(Long, Long)].collect().toMap
    assert(got(1L)._3 == nov(1L))
  }
}
