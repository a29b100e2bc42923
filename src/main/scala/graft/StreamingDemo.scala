package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingSessions
import graft.streaming.StreamingSessions.{ClosedSession, Ev}

/** End-to-end demo of the streaming surface: feeds events through a
  * MemoryStream into both sessionizers (declarative session_window and
  * custom flatMapGroupsWithState state machine) and prints what each
  * emits. Run: `sbt "runMain graft.StreamingDemo"`. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val in = MemoryStream[Ev]
    val q = StreamingSessions.sessionizeWithState(in.toDS(), gapMs = 10 * 60 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("sessions")
      .option("checkpointLocation", Files.createTempDirectory("sd-ck").toString)
      .start()

    val t0 = 1700000000000L
    in.addData(Ev(7, t0, 1.5), Ev(7, t0 + 60000, 2.5), Ev(8, t0, 4.0))
    q.processAllAvailable()
    in.addData(Ev(7, t0 + 3600000, 9.0), Ev(8, t0 + 3600000, 1.0)) // 1h later: closes both
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("sessions").as[ClosedSession].collect().sortBy(_.user_id)
    println(s"== closed sessions: ${closed.mkString("; ")}")
    require(closed.contains(ClosedSession(7L, t0, t0 + 60000, 2L, 4.0)),
      "expected user 7's first session sealed with 2 events / sum 4.0")
    require(closed.contains(ClosedSession(8L, t0, t0, 1L, 4.0)),
      "expected user 8's first session sealed with 1 event / sum 4.0")
    println("== custom-state sessionizer OK")
    spark.stop()
  }
}
