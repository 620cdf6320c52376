package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-token shingle POLY-hashes in one native pass — the
  * MinHash-signature counterpart of [[ShingleHashes]]. Each window's
  * value is exactly `poly_hash(tok_i ++ " " ++ … ++ tok_{i+k-1})`,
  * computed incrementally: chain [[PolyHash.hash]] across the window's
  * tokens with the separator codepoint folded in between, so no shingle
  * string is ever materialized and the value matches what the DuckDB
  * oracle computes over the joined string — the signature pipelines
  * built on it (q32/q65/q68/q70/q73) stay hash-checked bit-for-bit.
  *
  * Dedup is by VALUE (first occurrence); the previous formulation
  * dedup'd shingle strings then hashed. The two differ only when two
  * distinct strings in one document collide mod 2^32 — and every
  * consumer takes min() over the value set, which duplicate values
  * cannot change, so the aggregate semantics are identical.
  *
  * Docs with fewer than k tokens yield an EMPTY array (callers filter
  * `size(xs) > 0`). */
case class PolyShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size k=$k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_shingle_hashes"

  override protected def nullSafeEval(t: Any): Any =
    PolyShingleHashes.compute(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object PolyShingleHashes {

  private val Space = UTF8String.fromString(" ")

  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = text.split(Space, -1)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    val seen = new java.util.HashSet[java.lang.Long](out.length * 2)
    var m = 0
    var i = 0
    while (i <= n - k) {
      var h = PolyHash.DefaultSeed
      var j = 0
      while (j < k) {
        if (j > 0)
          h = (h * PolyHash.DefaultMult + ' '.toInt) % PolyHash.Mod32
        h = PolyHash.hash(toks(i + j), PolyHash.DefaultMult, PolyHash.Mod32, h)
        j += 1
      }
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  def poly_shingle_hashes(text: Column, k: Int): Column =
    GraftFunctions.toColumn(PolyShingleHashes(GraftFunctions.toExpression(text), k))
}
