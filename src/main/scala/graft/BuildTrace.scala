package graft

/** One-off diagnostic for the optimization rounds: how many Spark jobs
  * fire during each phase of building ds_curate, and where the wall
  * time goes. Measurement tool only. */
object BuildTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-buildtrace")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).schema catch { case _: Throwable => }
    }
    SparkEntry.queries("q5_pricing_summary")(spark, sfDir).count()
    (1 to 3).foreach { i =>
      def phase[T](label: String)(f: => T): T = {
        val j0 = jobs.get(); val t0 = System.nanoTime()
        val r = f
        println(f"run$i $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s  jobs=${jobs.get() - j0}")
        r
      }
      val df = phase("build dsCurate") {
        graft.queries.DataOps.dsCurate(spark, sfDir)
      }
      phase("executedPlan") { df.queryExecution.executedPlan }
      phase("count") { df.count() }
      org.apache.spark.sql.GraftBridge.releaseStaged()
    }
    spark.stop()
  }
}
