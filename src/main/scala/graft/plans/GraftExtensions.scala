package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate
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
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

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
    // Spark ships bloom_filter_agg / might_contain as Catalyst
    // expressions for its own runtime join filtering but does NOT
    // register them in the SQL function registry — surfacing them makes
    // explicit bloom semi-join reduction (build a filter on the dim
    // side, prune the fact scan before the shuffle) available to every
    // session. Both are codegen'd internals, not UDFs.
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(xxhash64(col)[, estItems[, numBits]]) - build a bloom filter"),
      (exprs: Seq[Expression]) => {
        val agg = exprs match {
          case Seq(c) => new aggregate.BloomFilterAggregate(c)
          case Seq(c, items) => new aggregate.BloomFilterAggregate(c, items)
          case Seq(c, items, bits) => new aggregate.BloomFilterAggregate(c, items, bits)
          case _ => throw new IllegalArgumentException(
            "bloom_filter_agg takes 1-3 arguments")
        }
        agg.toAggregateExpression()
      }))
    ext.injectFunction((FunctionIdentifier("might_contain"),
      info("might_contain",
        "might_contain(bloom, xxhash64(col)) - probabilistic membership test"),
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs.head, exprs(1))))
  }
}
