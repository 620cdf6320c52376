package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All consecutive n-token grams of a text as strings, in one native
  * pass — the string-producing sibling of [[ShingleHashes]] for
  * operators whose OUTPUT is the gram text itself (vocabulary building,
  * top-bigrams): split once, then concat each window with a single
  * space. Byte-identical to
  * `transform(sequence(...), i -> concat_ws(" ", element_at...))`, so
  * oracles joining/grouping on the gram strings are unmoved. NOT
  * deduplicated (occurrence counts need every instance); wrap in
  * `array_distinct` for set semantics. Fewer than n tokens → empty
  * array. */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size n=$n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_ngrams"

  override protected def nullSafeEval(t: Any): Any =
    TokenNgrams.compute(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object TokenNgrams {

  private val Space = UTF8String.fromString(" ")

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.split(Space, -1)
    val cnt = toks.length - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) {
      // concatWs(" ", window) — same bytes as the SQL concat_ws
      out(i) = UTF8String.concatWs(Space,
        java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def token_ngrams(text: Column, n: Int): Column =
    GraftFunctions.toColumn(TokenNgrams(GraftFunctions.toExpression(text), n))
}
