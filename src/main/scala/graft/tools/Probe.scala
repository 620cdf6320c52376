package graft.tools


/** Ad-hoc SQL probe against the testdata tables:
  * sbt "runMain graft.tools.Probe <sfdir> <sql...>" */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sql = args.drop(1).mkString(" ")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, dir)
    spark.sql(sql).show(20, false)
    spark.stop()
  }
}
