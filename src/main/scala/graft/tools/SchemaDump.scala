package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug tool: print the Spark-side schema + a sample of every testdata table.
  * Run: sbt "runMain graft.tools.SchemaDump /root/testdata/sf0.001"
  */
object SchemaDump {
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tables.foreach { t =>
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"=== $t rows=${df.count()}")
        println(df.schema.treeString)
        df.show(2, 60)
      } catch {
        case e: Throwable => println(s"=== $t FAILED: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
