package graft.tools


/** Debug tool: print the Spark-side schema + a sample of every testdata table.
  * Run: sbt "runMain graft.tools.SchemaDump /root/testdata/sf0.001"
  */
object SchemaDump {
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.local(4)
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
