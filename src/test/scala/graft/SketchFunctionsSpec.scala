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

  test("count-min: one-sided error, exact on a sparse sketch, merge == full build") {
    import graft.functions.CountMin
    val toks = (0 until 5000).map(i => (i.toLong, s"tok${i % 97}")).toDF("id", "term")
    val full = CountMin.registers(toks, "term")
    // merge of any batch split equals the one-shot sketch exactly
    val merged = CountMin.mergeRegisters(
      CountMin.registers(toks.filter(col("id") % 2 === 0), "term"),
      CountMin.registers(toks.filter(col("id") % 2 =!= 0), "term"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    // 97 distinct terms in 4x2048 cells: collisions are possible but the
    // estimate can only OVERcount; with uniform true counts (5000/97) the
    // min-over-4-rows is exact unless a term collides in every row
    val truth = toks.groupBy("term").agg(count(lit(1)).as("true_cnt"))
    val est = CountMin.estimate(full, toks.select("term").distinct(), "term")
    val joined = est.join(truth, "term")
      .select(col("est"), col("true_cnt")).as[(Long, Long)].collect()
    assert(joined.forall { case (e, t) => e >= t }, "count-min undercounted")
    assert(joined.count { case (e, t) => e == t } >= 90,
      "far more all-row collisions than 4 independent rows should give")
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

  test("count-min ignores nulls; heavy hitters stay exact beside them") {
    import graft.functions.CountMin
    // nulls interleaved with a heavy value: a null's null cell hash
    // once emitted a (row, NULL) register the driver table unboxed onto
    // column 0, clobbering a real register — the estimate could then
    // undercount and a true heavy hitter vanish before the exact verify
    val vals = (Seq.fill(60)(Some("hot")) ++ Seq.fill(40)(None) ++
      (0 until 20).map(i => Some(s"r$i"))).zipWithIndex
      .map { case (v, i) => (i.toLong, v.orNull) }.toDF("id", "v")
    val regs = CountMin.registers(vals, "v")
    assert(regs.filter(col("col_").isNull).count() == 0L)
    // register mass counts only non-null rows (80), Depth times
    assert(regs.agg(sum("n")).as[Long].head() == 80L * CountMin.Depth)
    val hh = CountMin.heavyHitters(vals, "v", thresholdPpm = 500000L)
      .select("v", "cnt").as[(String, Long)].collect().toSeq
    assert(hh == Seq(("hot", 60L))) // 60/80 non-null rows = 75% >= 50%
  }

  test("heavyHitters equals the exact answer on a planted skewed stream") {
    import graft.functions.CountMin
    // 50×hot1 + 40×hot2 + 100 singletons = 190 rows; 10% threshold →
    // exact heavies are precisely {hot1, hot2}
    val vals = (Seq.fill(50)("hot1") ++ Seq.fill(40)("hot2") ++
      (0 until 100).map(i => s"rare$i")).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = CountMin.heavyHitters(vals, "v", thresholdPpm = 100000L)
      .select("v", "cnt", "est", "overcount")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(t => t._1 -> t._2).toSeq == Seq("hot1" -> 50L, "hot2" -> 40L))
    got.foreach { t => assert(t._3 >= t._2 && t._4 >= 0L) } // one-sided
  }

  test("heavyHitters matches brute force across thresholds (zipf-ish stream)") {
    import graft.functions.CountMin
    val vals = (0 until 3000).map { i =>
      (i.toLong, s"w${(i * i + i / 3) % 211 % (1 + i % 47)}")
    }.toDF("id", "v")
    val exact = vals.groupBy("v").agg(count(lit(1)).as("cnt"))
    val n = vals.count()
    for (ppm <- Seq(5000L, 20000L, 100000L)) {
      val want = exact.filter(col("cnt") * 1000000L >= lit(n * ppm))
        .select("v", "cnt").as[(String, Long)].collect().sortBy(_._1).toSeq
      val gotT = CountMin.heavyHitters(vals, "v", ppm)
        .select("v", "cnt").as[(String, Long)].collect().sortBy(_._1).toSeq
      assert(gotT == want, s"ppm=$ppm")
    }
  }
}
