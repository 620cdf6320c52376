package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: run SparkEntry.entry and print its row count
  * (the driver's t1 gate checks rows > 0).
  * Run: sbt "runMain graft.tools.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.show(20, 40)
    println(s"entry rows=${df.count()}")
    spark.stop()
  }
}
