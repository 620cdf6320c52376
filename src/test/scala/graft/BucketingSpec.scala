package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketing

/** Proof-of-layout: equal bucketing on the join key removes the
  * Exchange from both sides of a sort-merge join. (Own session: needs a
  * throw-away warehouse dir and broadcast joins disabled so the
  * bucketing — not a broadcast — is what kills the shuffle.) */
class BucketingSpec extends AnyFunSuite {

  test("same-bucketed tables sort-merge join with no shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    // Force a REAL new session: getOrCreate returns the shared SparkSpec
    // session otherwise, ignoring the static warehouse conf (observed:
    // tables landed in ./spark-warehouse inside the repo).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-bucketing-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    try {
      val orders = (1L to 1000L).map(k => (k, s"order_$k")).toDF("key", "o_payload")
      val items = (1L to 3000L).map(i => (i % 1000 + 1, s"item_$i")).toDF("key", "i_payload")
      Bucketing.writeBucketed(orders, "b_orders", "key", 4)
      Bucketing.writeBucketed(items, "b_items", "key", 4)

      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_items", "key")
      assert(joined.count() == 3000)

      def shuffles(p: SparkPlan): Int =
        p.collect { case _: ShuffleExchangeExec => 1 }.sum
      val bucketedShuffles = shuffles(joined.queryExecution.executedPlan)
      assert(bucketedShuffles == 0,
        s"bucketed join should have 0 shuffle exchanges, got $bucketedShuffles")

      // Control: the same data as plain (unbucketed) tables shuffles
      // both sides.
      orders.createOrReplaceTempView("p_orders")
      items.createOrReplaceTempView("p_items")
      val plain = spark.table("p_orders").join(spark.table("p_items"), "key")
      assert(shuffles(plain.queryExecution.executedPlan) == 2)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
