package graft.tools


/** Driver-contract smoke: run SparkEntry.entry and print its row count
  * (the driver's t1 gate checks rows > 0).
  * Run: sbt "runMain graft.tools.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.show(20, 40)
    println(s"entry rows=${df.count()}")
    spark.stop()
  }
}
