package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Demo main: drives [[EventStreams.windowedAgg]] as a real streaming
  * query over a MemoryStream source (two micro-batches), then prints the
  * windowed state. `sbt "runMain graft.streaming.StreamDemo"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    // the ONE shared session config (GraftSession) — a verbatim builder
    // copy here is the drifted-session bug class the shared def exists
    // to end: a conf added there (extension, codegen flag, timezone)
    // would silently not reach this entry point's streaming run
    val spark: SparkSession = graft.GraftSession.build("4")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val query = EventStreams.windowedAgg(events)
      .writeStream.format("memory").queryName("wagg")
      .outputMode("complete").start()

    // explicit UTC instants, never Timestamp.valueOf: valueOf parses in
    // the JVM DEFAULT zone (only spark.sql.session.timeZone is pinned),
    // so on a half-hour-offset host the demo's events would land in
    // different epoch-aligned windows and the printed state would
    // change per machine
    def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))
    mem.addData(
      (ts("2024-01-01T10:05:00Z"), "click", 1L, 1.5),
      (ts("2024-01-01T10:45:00Z"), "click", 2L, 2.5),
      (ts("2024-01-01T11:05:00Z"), "view", 1L, 3.0))
    query.processAllAvailable()
    println("--- after micro-batch 1 ---")
    spark.sql("SELECT * FROM wagg ORDER BY window_start, event_type").show(false)

    mem.addData((ts("2024-01-01T11:30:00Z"), "view", 3L, 1.0))
    query.processAllAvailable()
    println("--- after micro-batch 2 ---")
    spark.sql("SELECT * FROM wagg ORDER BY window_start, event_type").show(false)

    query.stop()
    spark.stop()
  }
}
