package graft.tools


/** Dump the formatted physical plan of named queries.
  * Run: sbt "runMain graft.tools.Explain q01_pricing_summary [sfdir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.filterNot(_.startsWith("/")).toSeq
      else Seq("q01_pricing_summary")
    val dir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
