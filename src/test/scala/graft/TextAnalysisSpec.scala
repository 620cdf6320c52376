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
}
