package graft.tools

import graft.SparkEntry

/** Dev profiler: time named queries (or all) at a given SF dir, optionally
  * printing the formatted physical plan. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.isEmpty) SparkEntry.inventory.map(_.name) else args.toSeq
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (explain) { println(s"=== $n plan ==="); df.explain("formatted") }
      val t0 = System.nanoTime()
      val cnt = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $n%-22s $dt%8.2fs  rows=$cnt")
    }
    spark.stop()
  }
}
