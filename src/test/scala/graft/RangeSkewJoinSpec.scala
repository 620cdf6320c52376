package graft

import org.apache.spark.sql.functions._
import graft.operators.{RangeJoin, SkewJoin}

/** RangeJoin and SkewJoin must be pure physical rewrites: their results
  * equal the naive (cross-join-filter / plain-join) formulations on the
  * same input. */
class RangeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq((1L, 100L, 200L), (2L, 150L, 260L), (3L, 900L, 950L))
    .toDF("lid", "lo", "hi")
  private val right = (0L until 40L).map(i => (i, i * 25L)).toDF("rid", "ord")

  test("bucketedIntervalJoin equals the naive cross-join filter") {
    val naive = left.crossJoin(right)
      .filter(col("ord") >= col("lo") && col("ord") <= col("hi"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val bucketed = RangeJoin.bucketedIntervalJoin(left, right,
        col("lo"), col("hi"), col("ord"), bucketWidth = 64)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("bucketedIntervalJoin fails loudly on intervals wider than maxSpanBuckets") {
    val wide = Seq((1L, 0L, 10000L)).toDF("lid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.bucketedIntervalJoin(wide, right, col("lo"), col("hi"),
        col("ord"), bucketWidth = 10, maxSpanBuckets = 4).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("spans more than")))
  }

  test("bucketedIntervalJoin rejects inputs using its reserved helper columns") {
    val clash = Seq((1L, 0L, 10L)).toDF("__graft_rj_lo", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.bucketedIntervalJoin(clash, right, col("lo"), col("hi"),
        col("ord"), bucketWidth = 10)
    }
  }

  test("intervalJoin (keyed) equals equi-join + range filter") {
    val l = Seq((1L, 1L, 10L, 20L), (2L, 1L, 30L, 40L), (3L, 2L, 10L, 20L))
      .toDF("lid", "k", "lo", "hi")
    val r = Seq((10L, 1L, 15L), (11L, 1L, 35L), (12L, 2L, 5L), (13L, 2L, 20L))
      .toDF("rid", "k", "ord")
    val got = RangeJoin.intervalJoin(l, r, Seq("k"),
        col("lo"), col("hi"), r("ord"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L), (3L, 13L)))
  }

  test("saltedInnerJoin equals the plain inner join, including duplicate keys") {
    val probe = (0 until 500).map(i => (i % 7L, i.toLong)).toDF("k", "pid")
    val build = Seq((0L, "a"), (1L, "b"), (1L, "b2"), (6L, "c")).toDF("k", "tag")
    val plain = probe.join(build, "k")
      .select("pid", "tag").as[(Long, String)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(probe, build, "k", saltSource = "pid")
      .select("pid", "tag").as[(Long, String)].collect().toSet
    assert(salted == plain)
    // duplicate-match multiplicity preserved, not just the set
    val plainCnt = probe.join(build, "k").count()
    val saltedCnt = SkewJoin.saltedInnerJoin(probe, build, "k", "pid").count()
    assert(plainCnt == saltedCnt)
  }

  test("multimodal feature/resize stubs keep schema and size contracts") {
    val d = Seq((0L, "abcdef"), (1L, "x" * 100)).toDF("doc_id", "text")
    val feats = graft.llm.Multimodal.extractFeatures(d, dim = 4)
      .orderBy("doc_id").collect()
    assert(feats.forall(_.getSeq[Float](1).length == 4))
    assert(feats(0).getSeq[Float](1).sum > 0f)
    val resized = graft.llm.Multimodal.resizePayload(d, outBytes = 16)
      .orderBy("doc_id").collect()
    assert(resized.forall(_.getAs[Array[Byte]]("payload_resized").length == 16))
  }
}
