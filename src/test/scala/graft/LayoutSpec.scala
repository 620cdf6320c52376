package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.functions.QuantileRank
import graft.operators.Layout

/** Z-order clustering: z-value bit math (vs an independent reference
  * implementation), quantile-rank bucketing, and the actual file-skipping
  * payoff measured on real parquet files. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Independent Morton reference: bit j of column c -> j*n + (n-1-c). */
  private def refZ(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    var z = 0L
    for (j <- 0 until bits; c <- 0 until n)
      z |= ((vals(c) >>> j) & 1L) << (j * n + (n - 1 - c))
    z
  }

  test("zValue matches the bit-interleave reference (2 and 3 columns)") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(64)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got2 = pairs.toDF("x", "y")
      .select($"x", $"y", Layout.zValue(Seq($"x", $"y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got2.foreach { case (x, y, z) => assert(z == refZ(Seq(x, y), 8), s"x=$x y=$y") }
    // interleave order: x (earlier column) owns the higher bit of each pair
    assert(refZ(Seq(1L, 0L), 1) == 2L && refZ(Seq(0L, 1L), 1) == 1L)

    val triples = Seq.fill(32)(
      (rnd.nextInt(16).toLong, rnd.nextInt(16).toLong, rnd.nextInt(16).toLong))
    val got3 = triples.toDF("a", "b", "c")
      .select(Layout.zValue(Seq($"a", $"b", $"c"), 4).as("z"), $"a", $"b", $"c")
      .collect()
    got3.foreach { r =>
      assert(r.getLong(0) == refZ(Seq(r.getLong(1), r.getLong(2), r.getLong(3)), 4))
    }
  }

  test("QuantileRank buckets by binary search, ties to the upper bucket") {
    val bounds = Array(10.0, 20.0, 30.0)
    assert(QuantileRank.rank(5.0, bounds) == 0)
    assert(QuantileRank.rank(10.0, bounds) == 1) // tie -> upper
    assert(QuantileRank.rank(15.0, bounds) == 1)
    assert(QuantileRank.rank(20.0, bounds) == 2)
    assert(QuantileRank.rank(35.0, bounds) == 3)

    // as a column (codegen path), monotonic over a skewed distribution
    val df = (0 until 1000).map(i => math.pow(i.toDouble, 2)).toDF("v")
    val ranked = df.select($"v",
      QuantileRank.quantile_rank($"v",
        Layout.rankBoundaries(df, Seq("v"), 4).head).as("r"))
      .orderBy("v").collect().map(r => r.getInt(1))
    assert(ranked.head == 0 && ranked.last == 15)
    assert(ranked.sliding(2).forall(p => p(0) <= p(1)), "ranks must be monotonic")
    // near-equal-frequency despite the quadratic skew: every bucket ~62
    val sizes = ranked.groupBy(identity).view.mapValues(_.length).values
    assert(sizes.min >= 40 && sizes.max <= 90, s"unbalanced: ${sizes.toSeq.sorted}")
  }

  test("z-ordered files skip on BOTH columns; single-key sort only on one") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 4096).map(i => (i, rnd.nextInt(256), rnd.nextInt(256)))
    val df = rows.toDF("id", "x", "y")
    val zPath = tmpDir("graft-zorder")
    val linPath = tmpDir("graft-linear")
    Layout.writeZOrdered(df, zPath, Seq("x", "y"), bits = 8, numFiles = 16)
    Layout.writeSorted(df, linPath, "x", numFiles = 16)

    def filesTouched(path: String, pred: String): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()

    // layouts lose no rows
    assert(spark.read.parquet(zPath).count() == 4096)
    assert(spark.read.parquet(linPath).count() == 4096)

    // primary-key predicate: both layouts skip
    assert(filesTouched(linPath, "x < 64") <= 8)
    assert(filesTouched(zPath, "x < 64") <= 8)

    // second-column predicate: z-order still skips, linear reads everything
    val zY = filesTouched(zPath, "y < 64")
    val linY = filesTouched(linPath, "y < 64")
    assert(linY >= 14, s"linear layout should touch ~all files, got $linY")
    assert(zY <= 8, s"z-order should prune most files on y, got $zY")
    assert(zY * 2 <= linY, s"z-order ($zY files) must at least halve linear ($linY)")
  }

  test("incremental maintenance: only the dirty partition is re-clustered, skipping restored, clean partition byte-identical") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4096).map(i => (i, i % 2, rnd.nextInt(256), rnd.nextInt(256)))
    val df = rows.toDF("id", "p", "x", "y")
    val root = tmpDir("graft-zmaint")
    Layout.writeZOrderedPartitioned(df, root, "p", Seq("x", "y"),
      bits = 8, numFiles = 32)

    def filesTouched(path: String, pred: String): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()
    def md5s(dir: String): Map[String, String] = {
      val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.list(d).iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map { p =>
          val md = java.security.MessageDigest.getInstance("MD5")
          p.getFileName.toString ->
            md.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString
        }.toMap
    }

    // fresh layout: both partitions skip on the second clustered column
    assert(filesTouched(s"$root/p=0", "y < 64") <= 8)
    assert(filesTouched(s"$root/p=1", "y < 64") <= 8)

    // raw appends land ONLY in p=1: 8 unclustered files spanning the full
    // y range → skipping decays there and only there
    val extra = (0 until 1024).map(i => (10000 + i, 1, rnd.nextInt(256), rnd.nextInt(256)))
    Layout.appendRaw(extra.toDF("id", "p", "x", "y").repartition(8), root, "p")
    assert(filesTouched(s"$root/p=1", "y < 64") > 8,
      "raw appends should degrade skipping in the appended partition")

    val p0Before = md5s(s"$root/p=0")
    val (re1, sk1) = Layout.maintain(spark, root, Seq("x", "y"),
      bits = 8, filesPerPartition = 16)
    assert(re1 == 1 && sk1 == 1, s"expected (1 reclustered, 1 skipped), got ($re1, $sk1)")
    // file-skipping bound restored in the dirty partition
    assert(filesTouched(s"$root/p=1", "y < 64") <= 8)
    // the clean partition was never rewritten: same files, byte-identical
    assert(md5s(s"$root/p=0") == p0Before, "clean partition must be untouched")
    // no rows lost; partition column still served by directory discovery
    assert(spark.read.parquet(root).count() == 4096 + 1024)
    assert(spark.read.parquet(root).filter("p = 1").count() == 2048 + 1024)
    // nothing dirty anymore → second tick is a full no-op
    val (re2, sk2) = Layout.maintain(spark, root, Seq("x", "y"))
    assert(re2 == 0 && sk2 == 2)
    assert(md5s(s"$root/p=0") == p0Before)
  }

  test("an all-null clustering column degrades to constant rank, no crash") {
    import spark.implicits._
    val dir = tmpDir("zorder_nullcol")
    val df = (1L to 100L)
      .map(i => (i, i % 10, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "x", "y")
    // y yields zero quantile boundaries (approxQuantile ignores nulls);
    // the curve must fall back to x-only ordering instead of failing
    // QuantileRank's nonEmpty require mid-write
    Layout.writeZOrdered(df, s"$dir/t", Seq("x", "y"), bits = 4, numFiles = 4)
    assert(spark.read.parquet(s"$dir/t").count() == 100L)
  }

  test("writeZOrderedPartitioned rejects fileBits that would collapse file prefixes") {
    import spark.implicits._
    val df = Seq((1L, 1L, 0L)).toDF("x", "y", "p")
    intercept[IllegalArgumentException] {
      // n*bits = 2 < fileBits = 4: the unguarded negative shift was
      // masked mod 64 and silently put every row in file-prefix 0
      Layout.writeZOrderedPartitioned(df, tmpDir("zorder_shift"), "p",
        Seq("x"), bits = 2, numFiles = 4, fileBits = 4)
    }
  }
}
