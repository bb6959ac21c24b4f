package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Smoke-drives the streaming surface end-to-end through the
  * micro-batch engine (MemoryStream → windowedAgg/sessionize →
  * memory sink) and prints the results. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val in = MemoryStream[Event]
    val win = EventStream.windowedAgg(in.toDF()).writeStream.format("memory")
      .queryName("win").outputMode(OutputMode.Append()).start()
    val sess = EventStream.sessionize(in.toDS(), gapUs = 10L * 60 * 1000000L)
      .writeStream.format("memory")
      .queryName("sess").outputMode(OutputMode.Append()).start()
    val dedup = EventStream.dedupWithinWatermark(in.toDF())
      .writeStream.format("memory")
      .queryName("dedup").outputMode(OutputMode.Append()).start()

    in.addData(
      Event(1, Timestamp.valueOf("2024-01-01 10:00:10"), 1, "click", 1.5),
      Event(1, Timestamp.valueOf("2024-01-01 10:00:11"), 1, "click", 1.5), // redelivery
      Event(2, Timestamp.valueOf("2024-01-01 10:02:00"), 1, "click", 2.5),
      Event(3, Timestamp.valueOf("2024-01-01 10:06:00"), 2, "view", 4.0))
    Seq(win, sess, dedup).foreach(_.processAllAvailable())
    in.addData(Event(4, Timestamp.valueOf("2024-01-01 11:30:00"), 1, "click", 1.0))
    Seq(win, sess, dedup).foreach(_.processAllAvailable())

    println("WINDOWS: " + spark.table("win").collect().sortBy(_.toString).mkString(" | "))
    println("SESSIONS: " + spark.table("sess").collect().sortBy(_.toString).mkString(" | "))
    println("DEDUP: " + spark.table("dedup").collect().map(_.getLong(0)).sorted.mkString(","))
    win.stop(); sess.stop(); dedup.stop(); spark.stop()
  }
}
