package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass multiplicity counts over string arrays — the
  * repetition-filter primitives ([[graft.llm.TextAnalysis]]'s top-gram
  * share and duplicate-gram coverage). The HOF form (array_sort + an
  * `aggregate` fold) computes the same values but evaluates INTERPRETED
  * (higher-order functions are CodegenFallback), with the whole
  * comparator an expression-tree call per element pair — and because
  * interpreted subtrees get no common-subexpression elimination, every
  * projection that referenced one re-ran it. One hash pass in plain JVM
  * code is two orders of magnitude cheaper on exactly the degenerate
  * documents these filters exist to catch. */
object GramCounts {

  /** count of the most frequent element; 0 for an empty array. */
  def maxMultiplicity(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val v = arr.getUTF8String(i)
      val c = counts.merge(v, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  /** distinct values occurring ≥ 2 times, in ascending (binary UTF8)
    * order — the order the sorted-fold form produced, kept so any
    * order-sensitive consumer is unmoved. */
  def duplicatedStrings(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var i = 0
    while (i < n) {
      counts.merge(arr.getUTF8String(i), 1, (a, b) => a + b)
      i += 1
    }
    val dups = new java.util.ArrayList[UTF8String]()
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue >= 2) dups.add(e.getKey)
    }
    java.util.Collections.sort(dups)
    new GenericArrayData(dups.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** duplicate-n-gram COVERAGE (Rae et al. 2021): tokens covered by any
    * n-gram occurring ≥ 2 times within the text, overlaps counted once —
    * the whole q127 dup signal in one native pass (gram counts + an
    * ascending interval merge). −1 when the text has no n-grams (the
    * too-short sentinel the callers use). */
  def dupSpanCoverage(text: UTF8String, n: Int): Long = {
    val toks = text.split(Space, -1)
    val cnt = toks.length - n + 1
    if (cnt <= 0) return -1L
    val grams = new Array[UTF8String](cnt)
    val counts = new java.util.HashMap[UTF8String, Int](cnt * 2)
    var i = 0
    while (i < cnt) {
      val g = UTF8String.concatWs(Space,
        java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      grams(i) = g
      counts.merge(g, 1, (a, b) => a + b)
      i += 1
    }
    var covered = 0L
    var end = -1L
    i = 0
    while (i < cnt) {
      if (counts.get(grams(i)) >= 2) {
        val e = i.toLong + n
        if (i >= end) covered += n
        else if (e > end) covered += e - end
        if (e > end) end = e
      }
      i += 1
    }
    covered
  }

  private val Space = UTF8String.fromString(" ")

  /** tokens of `text` NOT covered by any [s, s+k) span, rejoined with
    * single spaces — the rebuild step of
    * [[graft.llm.Dedup.removeDuplicateSpans]] in one native pass over
    * (tokens + ascending starts), replacing a per-token interpreted
    * exists lambda. Starts must be ascending (the caller sorts). */
  def removeCoveredTokens(text: UTF8String, starts: ArrayData,
                          k: Int): UTF8String = {
    val toks = text.split(Space, -1)
    val s = starts.numElements()
    val kept = new java.util.ArrayList[UTF8String](toks.length)
    var si = 0
    var end = -1L
    var i = 0
    while (i < toks.length) {
      // advance the span cursor: any span starting at or before i
      // extends the covered horizon
      while (si < s && starts.getInt(si) <= i) {
        val e = starts.getInt(si).toLong + k
        if (e > end) end = e
        si += 1
      }
      if (i >= end) kept.add(toks(i))
      i += 1
    }
    UTF8String.concatWs(Space, kept.toArray(new Array[UTF8String](0)): _*)
  }

  def max_multiplicity(arr: Column): Column =
    GraftFunctions.toColumn(MaxMultiplicity(GraftFunctions.toExpression(arr)))

  def dup_span_coverage(text: Column, n: Int): Column =
    GraftFunctions.toColumn(
      DupSpanCoverage(GraftFunctions.toExpression(text), n))

  def remove_covered_tokens(text: Column, starts: Column, k: Int): Column =
    GraftFunctions.toColumn(RemoveCoveredTokens(
      GraftFunctions.toExpression(text), GraftFunctions.toExpression(starts), k))

  /** |∪ [s, s+k)| over ascending starts — the removed-token count
    * companion of [[removeCoveredTokens]] (gram starts never exceed
    * T − k, so no clipping is needed). */
  def coveredCount(starts: ArrayData, k: Int): Long = {
    val n = starts.numElements()
    var covered = 0L
    var end = -1L
    var i = 0
    while (i < n) {
      val b = starts.getInt(i).toLong
      val e = b + k
      if (b >= end) covered += k
      else if (e > end) covered += e - end
      if (e > end) end = e
      i += 1
    }
    covered
  }

  def covered_count(starts: Column, k: Int): Column =
    GraftFunctions.toColumn(
      CoveredCount(GraftFunctions.toExpression(starts), k))

  def duplicated_strings(arr: Column): Column =
    GraftFunctions.toColumn(DuplicatedStrings(GraftFunctions.toExpression(arr)))
}

case class MaxMultiplicity(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "max_multiplicity"
  override protected def nullSafeEval(a: Any): Any =
    GramCounts.maxMultiplicity(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramCounts.maxMultiplicity($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class DupSpanCoverage(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size n=$n must be >= 1")
  override def dataType: DataType = LongType
  override def prettyName: String = "dup_span_coverage"
  override protected def nullSafeEval(t: Any): Any =
    GramCounts.dupSpanCoverage(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramCounts.dupSpanCoverage($c, $n)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class CoveredCount(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"span length k=$k must be >= 1")
  override def dataType: DataType = LongType
  override def prettyName: String = "covered_count"
  override protected def nullSafeEval(s: Any): Any =
    GramCounts.coveredCount(s.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramCounts.coveredCount($c, $k)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class RemoveCoveredTokens(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(k >= 1, s"span length k=$k must be >= 1")
  override def dataType: DataType = StringType
  override def prettyName: String = "remove_covered_tokens"
  override protected def nullSafeEval(t: Any, s: Any): Any =
    GramCounts.removeCoveredTokens(
      t.asInstanceOf[UTF8String], s.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.functions.GramCounts.removeCoveredTokens($t, $s, $k)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression) = copy(left = newLeft, right = newRight)
}

case class DuplicatedStrings(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "duplicated_strings"
  override protected def nullSafeEval(a: Any): Any =
    GramCounts.duplicatedStrings(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramCounts.duplicatedStrings($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
