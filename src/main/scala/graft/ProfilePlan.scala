package graft

/** Optimization-round measurement harness (guide §1): for each query
  * named in SPARK_GRAFT_ONLY (default: all), times PLANNING (build +
  * analyze + optimize + physical planning) separately from EXECUTION
  * (.count(), the bench's timed action), counts plan-shape markers
  * (Exchange / scans / codegen spans), and optionally writes the
  * formatted plan to SPARK_GRAFT_PLAN_DIR. Args: [sfDir].
  *
  * Measurement tool only — no query semantics live here. */
object ProfilePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val runs = sys.env.get("SPARK_GRAFT_RUNS").flatMap(_.toIntOption).getOrElse(2).max(1)
    val spark = GraftSession.create("graft-profile")
    // same warmup as Bench so first-query JIT isn't charged unevenly
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).schema catch { case _: Throwable => }
    }
    try SparkEntry.queries("q5_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => }

    val names = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq.sortBy(_._1)
    println(f"${"query"}%-32s ${"plan_s"}%8s ${"exec_s"}%8s ${"exch"}%5s ${"scan"}%5s ${"wsc"}%5s ${"nodes"}%6s")
    names.foreach { case (name, fn) =>
      try {
        val samples = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val qe = df.queryExecution
          qe.executedPlan // force planning
          val t1 = System.nanoTime()
          df.count()
          val t2 = System.nanoTime()
          org.apache.spark.sql.GraftBridge.releaseStaged()
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9, qe)
        }
        val planS = samples.map(_._1).min
        val execS = samples.map(_._2).min
        val qe = samples.last._3
        val txt = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
        val exch = "(?m)^\\s*[+:]?-? ?(\\* ?)?(Exchange|BroadcastExchange)".r
          .findAllIn(txt).size
        val scans = "Scan parquet".r.findAllIn(txt).size +
          "Scan ExistingRDD".r.findAllIn(txt).size
        val wsc = "WholeStageCodegen".r.findAllIn(txt).size
        val nodes = txt.linesIterator.count(_.matches("^\\(\\d+\\) .*"))
        println(f"$name%-32s $planS%8.3f $execS%8.3f $exch%5d $scans%5d $wsc%5d $nodes%6d")
        planDir.foreach { dir =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"$name.txt"), txt.getBytes("UTF-8"))
        }
      } catch { case e: Throwable =>
        println(f"$name%-32s FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
