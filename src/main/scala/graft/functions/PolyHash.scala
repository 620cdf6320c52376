package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** poly_hash(s) = fold over the string's Unicode code points:
  * `h := seed; h = (h * mult + codepoint) mod modulus` — a deterministic,
  * cross-engine-reproducible string hash (a Rabin-Karp / polynomial
  * rolling hash). The point of this over `xxhash64`: an independent SQL
  * engine can recompute it exactly (`list_reduce` over `ascii(substr)`),
  * so sketch operators built on it (MinHash signatures, SimHash
  * fingerprints, LSH band hashes) become oracle-checkable end-to-end
  * instead of rows-only.
  *
  * Catalyst Expression with codegen (single static call — the loop lives
  * in [[PolyHash.hash]], JIT-compiled once, shared by interpreted and
  * generated paths so they cannot diverge).
  */
case class PolyHash(child: Expression, mult: Long, modulus: Long, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(s: Any): Any =
    PolyHash.hash(s.asInstanceOf[UTF8String], mult, modulus, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.PolyHash.hash($s, ${mult}L, ${modulus}L, ${seed}L)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object PolyHash {
  /** Largest prime < 2^32 — keeps `h * mult` (mult ≤ ~2^30) inside a
    * signed 64-bit range on any engine that checks overflow (DuckDB
    * BIGINT arithmetic errors on overflow rather than wrapping). */
  val Mod32: Long = 4294967291L
  val DefaultMult: Long = 131L
  val DefaultSeed: Long = 7L

  def hash(s: UTF8String, mult: Long, modulus: Long, seed: Long): Long = {
    // Iterate Unicode code points (== DuckDB ascii(substr(s,i,1)) per
    // character) — byte iteration would diverge on non-ASCII input.
    val str = s.toString
    var h = seed
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % modulus
      i += Character.charCount(cp)
    }
    h
  }

  /** Column API: 32-bit-range polynomial hash (DuckDB-reproducible). */
  def poly_hash(s: Column): Column =
    GraftFunctions.toColumn(PolyHash(
      GraftFunctions.toExpression(s), DefaultMult, Mod32, DefaultSeed))
}
