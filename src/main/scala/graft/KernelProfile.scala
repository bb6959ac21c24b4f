package graft
import org.apache.spark.sql.functions._
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("kp4")
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val mult = 100
    val m = lit(mult.toLong)
    val base = Tables(spark, "/root/testdata/sf0.1", "documents")
    val docsR = base.crossJoin(spark.range(mult).select(col("id").as("__rep")))
      .select((col("doc_id") * m + col("__rep")).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1_"), col("__rep"))).as("text"),
        col("source")).repartition(32)
    val pages = docsR.select(col("doc_id"),
      graft.operators.Html.syntheticPage(col("text"), col("source")).as("html"))
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"KP4 $label sec=${(System.nanoTime()-t0)/1e9}%.1f")
    }
    // no filter, direct kernel call, one field consumed
    val direct = pages.select(
      call_function("graft_html_extract", col("html"), lit(5), lit(5)).as("__e"))
      .select(col("__e.main_text").as("mt"))
    t("direct_nofilter")(direct.agg(sum(length(col("mt")))).collect()(0).getLong(0))
    t("synthlen")(pages.agg(sum(length(col("html")))).collect()(0).getLong(0))
    val ext = graft.operators.Html.extractMainText(pages, col("html"), col("doc_id"))
    t("with_filter")(ext.agg(sum(length(col("main_text")))).collect()(0).getLong(0))
    println(ext.agg(sum(length(col("main_text")))).queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
