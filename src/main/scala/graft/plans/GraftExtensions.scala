package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, HmacSha256, PolyHash}

/** Session-extension entry point — the supported way to make the engine's
  * native expressions available in every session (including `spark.sql`
  * submitted by users) without per-session registration calls:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     // or: .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * All three functions are codegen'd Catalyst expressions (doGenCode), so
  * they inline into whole-stage codegen exactly like built-ins — this is
  * the (b) tier of the custom-operator ladder (Expression before
  * LogicalPlan/Strategy; nothing in the engine needs tier (c): the
  * operators compose from existing plans, which Catalyst already
  * optimizes and AQE re-plans).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("hmac_sha256"),
      info("hmac_sha256", "hmac_sha256(body, secret) - HMAC-SHA256 hex (webhook signatures)"),
      (exprs: Seq[Expression]) => HmacSha256(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "poly_hash(str) - cross-engine polynomial string hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head,
        PolyHash.DefaultMult, PolyHash.Mod32, PolyHash.DefaultSeed)))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(arr, arr) - double-precision dot product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
  }
}
