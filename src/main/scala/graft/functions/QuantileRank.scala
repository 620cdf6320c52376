package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Bucket index of a double against a sorted boundary array — the
  * rank-normalization step of Z-order clustering (`operators.Layout`).
  *
  * `boundaries` holds the (2^bits - 1) interior quantile cut points of a
  * column; the result is the bucket in [0, boundaries.length], assigned
  * by binary search (a value equal to a cut point lands in the upper
  * bucket). O(log m) per row versus the O(m) chain of 2^bits-1
  * `when`-comparisons the same rank would need from builtins — at the
  * production bits=10..12 that chain is a thousands-term expression tree
  * (the same literal-tree blowup `llm.KMeans` guards against), while
  * this stays one compiled static call carrying the array as a codegen
  * reference object, keeping the surrounding projection inside
  * whole-stage codegen.
  *
  * The boundary array is bounded (2^bits - 1 doubles, collected once on
  * the driver by `approxQuantile`) — it rides the generated code's
  * references, not a shuffle, so the per-row cost is independent of data
  * scale.
  */
case class QuantileRank(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "quantile_rank: boundaries must be non-empty")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "quantile_rank"

  override protected def nullSafeEval(v: Any): Any =
    QuantileRank.rank(v.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", boundaries, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantileRank.rank($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object QuantileRank {

  /** Static entry shared by eval and generated code. Buckets:
    * v < bounds(0) -> 0; bounds(i-1) <= v < bounds(i) -> i (ties up);
    * v >= bounds(last) -> bounds.length. */
  def rank(v: Double, bounds: Array[Double]): Int = {
    val i = java.util.Arrays.binarySearch(bounds, v)
    if (i >= 0) i + 1 else -(i + 1)
  }

  def quantile_rank(c: Column, bounds: Array[Double]): Column =
    GraftFunctions.toColumn(
      QuantileRank(GraftFunctions.toExpression(c), bounds))
}
