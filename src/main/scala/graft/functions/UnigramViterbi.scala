package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation (the SentencePiece/Kudo-2018 APPLY
  * step): per word, the segmentation into vocabulary pieces maximizing
  * the summed piece scores, found by the standard left-to-right DP with
  * backpointers. Single characters absent from the vocabulary fall back
  * to `unkScore` (the ⟨unk⟩ of real tokenizers), so every word segments.
  *
  * Determinism/exactness contract (what lets q159 hash-check this):
  * the DP maximizes the ADDITIVE key
  *
  *   key(segmentation) = 1024·Σscore − n_pieces + 1023
  *
  * i.e. lexicographic (max total score, then FEWER pieces), one long
  * per DP cell (base key(∅)=1023, transition key += 1024·score − 1).
  * The oracle replays the identical arithmetic in a recursive CTE and
  * decodes (score, n_pieces) with sign-safe modular arithmetic — no
  * floats anywhere. Envelope: |pieces| per word < 1024 and scores
  * bounded so 1024·Σscore fits BIGINT (any real tokenizer vocab is
  * orders of magnitude inside both). Piece ties inside an equal-key
  * cell break to the LONGER piece (affects only the emitted pieces —
  * the key is tie-free by construction).
  *
  * Execution shape: one codegen'd static call per word (the
  * [[QuantileRank]] discipline — the sorted vocab rides
  * `addReferenceObj`, never a literal expression tree, and lookup is
  * binary search: ~log₂|vocab| byte-compares per candidate piece).
  * The intended call pattern segments each DISTINCT word once
  * ([[graft.llm.Corpus.unigramSegmentWords]]) and joins back — at
  * 100 TB the Viterbi runs over the word vocabulary, not the token
  * stream. */
object UnigramViterbi {

  /** Binary search over the UTF8String-sorted piece array; MinValue =
    * absent. */
  private def lookup(pieces: Array[UTF8String], scores: Array[Long],
                     piece: UTF8String): Long = {
    var lo = 0
    var hi = pieces.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = pieces(mid).compareTo(piece)
      if (c == 0) return scores(mid)
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    Long.MinValue
  }

  /** The DP. Returns struct(key LONG, pieces ARRAY<STRING>).
    *
    * Index space is Unicode CODE POINTS, not UTF-16 code units — the
    * q159/q160/q169 DuckDB oracles segment with codepoint-based
    * len()/substr(), so non-BMP characters (emoji, rare CJK) must
    * occupy ONE DP cell on both engines, and the 1-char unk fallback
    * must emit a whole codepoint (a lone surrogate would be an invalid
    * UTF-8 string on the Spark side). `off` maps codepoint index →
    * UTF-16 offset so piece extraction stays O(1) per candidate. */
  def segment(word: UTF8String, pieces: Array[UTF8String],
              scores: Array[Long], maxLen: Int, unkScore: Long): InternalRow = {
    val s = word.toString
    val off = new Array[Int](s.codePointCount(0, s.length) + 1)
    var u = 0
    var k = 0
    while (u < s.length) {
      off(k) = u
      u += Character.charCount(s.codePointAt(u))
      k += 1
    }
    off(k) = s.length
    val n = k
    val key = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    key(0) = 1023L
    var j = 1
    while (j <= n) {
      var best = Long.MinValue
      var bestLn = 1
      val top = math.min(maxLen, j)
      var ln = 1
      while (ln <= top) {
        val sc = lookup(pieces, scores,
          UTF8String.fromString(s.substring(off(j - ln), off(j))))
        val eff = if (sc == Long.MinValue) {
          if (ln == 1) unkScore else Long.MinValue
        } else sc
        if (eff != Long.MinValue) {
          val cand = key(j - ln) + eff * 1024L - 1L
          // >= with ascending ln: equal-key ties emit the LONGER piece
          if (cand >= best) { best = cand; bestLn = ln }
        }
        ln += 1
      }
      key(j) = best
      bp(j) = bestLn
      j += 1
    }
    val out = new Array[UTF8String](countPieces(bp, n))
    var p = n
    var i = out.length - 1
    while (p > 0) {
      out(i) = UTF8String.fromString(s.substring(off(p - bp(p)), off(p)))
      p -= bp(p)
      i -= 1
    }
    InternalRow(key(n), new GenericArrayData(out.asInstanceOf[Array[Any]]))
  }

  private def countPieces(bp: Array[Int], n: Int): Int = {
    var p = n
    var c = 0
    while (p > 0) { p -= bp(p); c += 1 }
    c
  }

  def unigram_viterbi(word: Column, pieces: Array[UTF8String],
                      scores: Array[Long], maxLen: Int,
                      unkScore: Long): Column =
    GraftFunctions.toColumn(UnigramViterbiExpr(
      GraftFunctions.toExpression(word), pieces, scores, maxLen, unkScore))
}

case class UnigramViterbiExpr(child: Expression, pieces: Array[UTF8String],
                              scores: Array[Long], maxLen: Int, unkScore: Long)
    extends UnaryExpression {
  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
  require(pieces.length == scores.length,
    s"pieces/scores length mismatch: ${pieces.length} vs ${scores.length}")

  override def dataType: DataType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "unigram_viterbi"

  override protected def nullSafeEval(w: Any): Any =
    UnigramViterbi.segment(w.asInstanceOf[UTF8String], pieces, scores,
      maxLen, unkScore)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("uvPieces", pieces,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val sRef = ctx.addReferenceObj("uvScores", scores, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramViterbi.segment($c, $pRef, $sRef, $maxLen, ${unkScore}L)")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
