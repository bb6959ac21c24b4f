package graft

/** Planner-cost diagnostic (optimization rounds): per query in
  * SPARK_GRAFT_ONLY, report the QueryPlanningTracker phase times and
  * the cumulative Catalyst rule-time table, to attribute
  * plan-construction seconds to specific optimizer rules. */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.create("graft-plantime")
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).schema catch { case _: Throwable => }
    }
    try SparkEntry.queries("q5_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    val names = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq.sortBy(_._1)
    names.foreach { case (name, fn) =>
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val qe = df.queryExecution
      qe.executedPlan
      val t1 = System.nanoTime()
      println(s"===== $name build+plan ${(t1 - t0) / 1e9}")
      qe.tracker.phases.foreach { case (ph, s) =>
        println(f"  phase $ph%-20s ${(s.endTimeMs - s.startTimeMs) / 1e3}%.3f s")
      }
      val dump = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
      // top 15 rules by time
      val lines = dump.linesIterator.toSeq
      println(lines.take(3).mkString("\n"))
      println(lines.drop(3).filter(_.nonEmpty).take(18).mkString("\n"))
      org.apache.spark.sql.GraftBridge.releaseStaged()
    }
    spark.stop()
  }
}
