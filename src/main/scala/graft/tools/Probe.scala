package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc SQL probe against the testdata tables:
  * sbt "runMain graft.tools.Probe <sfdir> <sql...>" */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sql = args.drop(1).mkString(" ")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, dir)
    spark.sql(sql).show(20, false)
    spark.stop()
  }
}
