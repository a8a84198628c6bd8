package graft.exec

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Throughput monitor — reference `SmartBulkCopy.cs:665-766`: a side-channel
  * poll of `sys.dm_os_performance_counters` ('Log Bytes Flushed/sec')
  * reporting MB/s, running tasks and queue depth every ~5 s.
  *
  * Spark-native analog: a `SparkListener` on task-end events aggregating
  * records/bytes written and task time — the same signal, sourced from the
  * engine's own metrics instead of a server DMV.
  */
final class CopyMonitor extends SparkListener {
  val recordsWritten = new LongAdder
  val bytesWritten = new LongAdder
  val recordsRead = new LongAdder
  val tasksCompleted = new LongAdder
  val taskTimeMs = new LongAdder

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      recordsWritten.add(m.outputMetrics.recordsWritten)
      bytesWritten.add(m.outputMetrics.bytesWritten)
      recordsRead.add(m.inputMetrics.recordsRead)
      taskTimeMs.add(m.executorRunTime)
      tasksCompleted.increment()
    }
  }

  def mbPerSec: Double = {
    val secs = taskTimeMs.sum() / 1000.0
    if (secs <= 0) 0.0 else bytesWritten.sum() / (1024.0 * 1024.0) / secs
  }
}

object CopyMonitor {
  /** Run `body` with a listener attached; returns (result, monitor). */
  def monitored[T](spark: SparkSession)(body: => T): (T, CopyMonitor) = {
    val mon = new CopyMonitor
    spark.sparkContext.addSparkListener(mon)
    try {
      val r = body
      // give the async listener bus a moment to drain so counters are
      // complete (the bus is private[spark]; a short settle is enough for
      // the post-job snapshot this monitor reports)
      Thread.sleep(200)
      (r, mon)
    } finally spark.sparkContext.removeSparkListener(mon)
  }
}
