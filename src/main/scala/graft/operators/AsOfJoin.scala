package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of ("most recent prior event") join.
  *
  * Spark has no built-in as-of join; the naive formulation is a per-row
  * correlated subquery or a range join that explodes at scale. This
  * implementation uses the union+window trick: tag both sides, union,
  * and take `last(rightValue, ignoreNulls)` over a
  * (partition, order) window ending one row before the current row.
  *
  * Cost: ONE shuffle on the partition key + a sort within partitions —
  * the same cost as a plain window aggregate, independent of how many
  * right rows precede each left row. This is the formulation that
  * survives 100 TB (it is how stream processors implement temporal
  * joins); a broadcast-range-join would not.
  */
object AsOfJoin {

  /** For every row of `df` where `isLeft`, attach the value of `valueCol`
    * from the most recent strictly-prior row where `isRight`, within the
    * same `partitionCols` group, ordered by `orderCols` (must end with a
    * unique tiebreaker). Rows with no prior match get null.
    */
  def priorMatch(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
                 isLeft: Column, isRight: Column,
                 valueCol: String, asCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(asCol,
        last(when(isRight, col(valueCol)), ignoreNulls = true).over(w))
      .filter(isLeft)
  }
}
