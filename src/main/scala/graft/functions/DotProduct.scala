package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** dot(a, b) over numeric arrays, accumulated in double — a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions are
  * CodegenFallback — every element allocates lambda variables in
  * interpreted mode, which made brute-force KNN the bench hotspot. This
  * expression compiles to a tight primitive loop (the summation order is
  * the same ascending-index sequence, so results are bit-identical to
  * the HOF formulation and to a sequential oracle).
  *
  * Elements are assumed non-null (embedding vectors); the shorter length
  * wins if dims differ. NULL array in → NULL out.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val lf = elemIsFloat(left)
  @transient private lazy val rf = elemIsFloat(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$x.$lGet($i) * (double)$y.$rGet($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object DotProduct {
  def dot_product(a: Column, b: Column): Column =
    GraftFunctions.toColumn(DotProduct(
      GraftFunctions.toExpression(a), GraftFunctions.toExpression(b)))
}
