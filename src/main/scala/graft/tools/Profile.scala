package graft.tools

import graft.SparkEntry

/** Dev profiler: time named queries (or all) at a given SF dir, optionally
  * printing the formatted physical plan. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    // SPARK_GRAFT_JOBS=1: per-query Spark JOB breakdown (count + the
    // slowest jobs with call sites) — where a lifecycle query's time
    // goes: few big jobs (real compute) vs many small ones (launch
    // overhead), which .count() timing alone can't distinguish.
    val jobStats = sys.env.get("SPARK_GRAFT_JOBS").contains("1")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    // epoch-keyed attribution: the listener bus is async, so a job-end
    // event arriving after the next query started must not be credited
    // to it — each job carries the epoch it STARTED in, and the report
    // filters to the current epoch instead of trusting clear() timing
    val epoch = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String, Int)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    if (jobStats) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, (System.nanoTime(),
            Option(js.properties.getProperty("spark.job.description"))
              .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
              .orElse(Option(js.properties.getProperty("callSite.short")))
              .getOrElse("?"), epoch.get))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, site, ep) =>
            jobs.add((je.jobId, System.nanoTime() - t0, site, ep))
          }
        }
      })
    val names = if (args.isEmpty) SparkEntry.inventory.map(_.name) else args.toSeq
    names.foreach { n =>
      val ep = epoch.incrementAndGet()
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (explain) { println(s"=== $n plan ==="); df.explain("formatted") }
      val t0 = System.nanoTime()
      val cnt = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $n%-22s $dt%8.2fs  rows=$cnt")
      if (jobStats) {
        Thread.sleep(200) // let trailing job-end events drain
        val all = jobs.toArray(Array.empty[(Int, Long, String, Int)]).toSeq
          .filter(_._4 == ep)
        val total = all.map(_._2).sum / 1e9
        println(f"[profile]   jobs=${all.size} jobTime=$total%.2fs " +
          f"(query build may run jobs before count)")
        all.sortBy(-_._2).take(12).foreach { case (id, ns, site, _) =>
          println(f"[profile]   job#$id%-4d ${ns / 1e9}%6.2fs  $site")
        }
        // per-call-site aggregate: on job-count-bound lifecycles the
        // expensive thing is a SITE that launches 50 cheap jobs, which
        // the top-12 list above cannot show
        all.groupBy(_._3).toSeq
          .map { case (site, js) => (site, js.size, js.map(_._2).sum / 1e9) }
          .sortBy(-_._3).take(18).foreach { case (site, n, secs) =>
            println(f"[profile]   site $site%-46s n=$n%-4d sum=$secs%6.2fs")
          }
      }
    }
    spark.stop()
  }
}
