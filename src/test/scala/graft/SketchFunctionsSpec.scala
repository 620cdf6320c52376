package graft

import org.apache.spark.sql.functions._
import graft.functions.{HyperLogLog, PolyHash}

/** The portable hash/sketch primitives: poly_hash (the cross-engine
  * string hash under MinHash/SimHash/HLL) and the integer-exact
  * HyperLogLog. Expected hash values are computed by an independent
  * implementation of the fold (h = (h*131 + codepoint) mod 4294967291,
  * seed 7). */
class SketchFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("poly_hash matches the reference fold on known strings") {
    val df = Seq("hello world foo", "a", "", "the quick").toDF("s")
      .select(PolyHash.poly_hash(col("s")).as("h"))
    assert(df.as[Long].collect().toSeq ==
      Seq(1574210862L, 1014L, 7L, 2145824436L))
  }

  test("poly_hash is null-safe and codegen/interpreted agree") {
    val df = Seq(Some("x"), None).toDF("s")
      .select(PolyHash.poly_hash(col("s")).as("h"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == (7L * 131 + 'x'.toInt) % 4294967291L)
    assert(rows(1).isNullAt(0))
  }

  test("HyperLogLog estimate lands within 5% of the exact count") {
    // 20k distinct keys over 2 groups: n/m ≈ 20 — squarely in the raw-HLL
    // regime the estimator targets (stderr ≈ 1.04/sqrt(1024) ≈ 3.3%).
    val df = (0 until 60000).map(i => (i % 2, i % 20000)).toDF("g", "v")
    val est = HyperLogLog.approxDistinct(df, Seq("g"), "v", "d")
      .orderBy("g").as[(Int, Long)].collect()
    est.foreach { case (_, d) =>
      assert(math.abs(d - 10000.0) / 10000.0 < 0.05, s"estimate $d vs 10000")
    }
  }

  test("HyperLogLog registers merge associatively across partitioning") {
    val df = (0 until 50000).map(i => (1, i % 7919)).toDF("g", "v")
    val whole = HyperLogLog.approxDistinct(df, Seq("g"), "v", "d")
      .as[(Int, Long)].collect().head._2
    val repart = HyperLogLog.approxDistinct(df.repartition(17), Seq("g"), "v", "d")
      .as[(Int, Long)].collect().head._2
    assert(whole == repart)
  }
}
