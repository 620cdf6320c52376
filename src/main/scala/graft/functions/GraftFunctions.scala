package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridging + SQL registration for the engine's
  * custom expressions. */
object GraftFunctions {

  def toExpression(c: Column): Expression = GraftSqlBridge.expression(c)

  def toColumn(e: Expression): Column = GraftSqlBridge.column(e)

  /** Register engine functions for SQL use (`SELECT hmac_sha256(...)`). */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hmac_sha256", exprs => HmacSha256(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head,
        PolyHash.DefaultMult, PolyHash.Mod32, PolyHash.DefaultSeed), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => {
        val kExpr = exprs(1)
        require(kExpr.foldable && kExpr.eval(null) != null,
          "shingle_hashes(text, k): k must be a non-null integer literal")
        // integral types only: shingle_hashes(text, 2.7) must error, not
        // silently truncate to k=2
        val k = kExpr.eval(null) match {
          case b: java.lang.Byte    => b.longValue()
          case s: java.lang.Short   => s.longValue()
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long    => l.longValue()
          case other => throw new IllegalArgumentException(
            s"shingle_hashes(text, k): k must be an integral literal, got " +
              s"$other: ${kExpr.dataType.simpleString}")
        }
        require(k >= 1 && k <= Int.MaxValue,
          s"shingle_hashes(text, k): k out of range: $k")
        ShingleHashes(exprs.head, k.toInt)
      }, "scala_udf")
  }
}
