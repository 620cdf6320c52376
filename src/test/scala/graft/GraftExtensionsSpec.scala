package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions path: a session built with GraftExtensions
  * can call the engine's native expressions from plain SQL. (Own session
  * — extensions bind at session build time, so SparkSpec's shared
  * session can't be reused.) */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-registered functions work from spark.sql") {
    // getOrCreate would silently return the SparkSpec suites' shared
    // session and IGNORE withExtensions (observed: the bloom functions
    // resolved standalone but not in the full suite run) — clear the
    // active/default session so this builder really builds one.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT poly_hash('a') AS ph,
          |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
          |       length(hmac_sha256('body', 'secret')) AS hm
          |""".stripMargin).collect().head
      assert(row.getLong(0) == 1014L)       // (7*131 + 'a'=97) mod p
      assert(row.getDouble(1) == 11.0)
      assert(row.getInt(2) == 64)           // sha256 hex length

      // bloom_filter_agg / might_contain (Spark internals surfaced by
      // the extension): members hit, a non-member key is (with these
      // sizes) a clean miss.
      spark.sql("SELECT explode(sequence(1, 100)) AS k")
        .createOrReplaceTempView("keys")
      val bloom = spark.sql(
        """SELECT k FROM (SELECT explode(sequence(1, 200)) AS k)
          |WHERE might_contain(
          |  (SELECT bloom_filter_agg(xxhash64(k), 100L) FROM keys),
          |  xxhash64(k))""".stripMargin)
        .collect().map(_.getInt(0)).toSet
      assert((1 to 100).forall(bloom.contains)) // no false negatives
      assert(bloom.size < 150)                  // pruning actually happened
    } finally {
      spark.stop()
      // leave no stopped default session behind for later suites
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
