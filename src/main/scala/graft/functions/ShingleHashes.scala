package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-token shingle hashes of a text column in ONE native pass —
  * the hot inner expression of the Jaccard/containment inverted index
  * (`Dedup.shinglePairCounts`).
  *
  * Replaces a 6-expression chain (`split` → `size` filter → `sequence` →
  * `transform` → k×`element_at` + `xxhash64` → `array_distinct`) whose
  * higher-order pieces are CodegenFallback: every shingle interpreted
  * lambda frames and re-walked the token array. Here the whole
  * computation is one compiled scan: split once, slide a k-window,
  * chain-seed XXH64 per token (the same x64 xxhash family the builtin
  * uses), first-occurrence dedup via an open hash set. The generated
  * code is a single static call, so the surrounding projection stays
  * inside whole-stage codegen.
  *
  * Hash values are internal join keys only (the oracle never recomputes
  * them — pair results expose ids and counts), so the ONLY contracts are
  * determinism and string-injectivity-sans-collision, identical to the
  * builtin-xxhash64 formulation this replaces.
  *
  * Docs with fewer than k tokens yield an EMPTY array (callers filter
  * `size(hs) > 0`, mirroring the previous `size(w) >= k` gate). */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size k=$k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(t: Any): Any =
    ShingleHashes.compute(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object ShingleHashes {

  private val Space = UTF8String.fromString(" ")
  private val Seed = 42L // same seed family as the builtin xxhash64

  /** Static entry shared by eval and generated code. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = text.split(Space, -1)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    val seen = new java.util.HashSet[java.lang.Long](out.length * 2)
    var m = 0
    var i = 0
    while (i <= n - k) {
      var h = Seed
      var j = 0
      while (j < k) {
        val t = toks(i + j)
        h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, h)
        j += 1
      }
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  def shingle_hashes(text: Column, k: Int): Column =
    GraftFunctions.toColumn(ShingleHashes(GraftFunctions.toExpression(text), k))
}
