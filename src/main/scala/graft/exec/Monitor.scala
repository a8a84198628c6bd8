package graft.exec

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, LongAdder}

/** Throughput monitor — reference `SmartBulkCopy.cs:665-766`: a side-channel
  * poll of `sys.dm_os_performance_counters` ('Log Bytes Flushed/sec')
  * reporting MB/s, running tasks and queue depth every ~5 s.
  *
  * Spark-native analog: a `SparkListener` on task events aggregating
  * records/bytes written and task time — the same signal, sourced from the
  * engine's own metrics instead of a server DMV. [[CopyMonitor.monitored]]
  * optionally runs the reference's periodic report loop alongside the
  * copy: a sampler thread snapshots the counters every `reportEveryMs`
  * and emits interval rows/s + MB/s + active task count.
  */
final class CopyMonitor(
    groupId: Option[String] = None,
    includeUntagged: Boolean = false) extends SparkListener {
  val recordsWritten = new LongAdder
  val bytesWritten = new LongAdder
  val recordsRead = new LongAdder
  val tasksCompleted = new LongAdder
  val taskTimeMs = new LongAdder
  val activeTasks = new AtomicInteger(0)

  private val _samples =
    new java.util.concurrent.CopyOnWriteArrayList[CopyMonitor.Sample]

  // task ids this listener actually saw START: a task launched BEFORE
  // the listener attached still delivers its onTaskEnd, and decrementing
  // for it would under-report the gauge for the whole overlap (a floor
  // at 0 only hides the symptom once it reaches zero — mid-range the
  // count is still wrong)
  private val started =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

  // JOB-GROUP SCOPE: a SparkListener is context-global, so in a shared
  // session (the engine's normal shape — SqlGen's view naming defends
  // the same hazard) every concurrent job's tasks would land in these
  // counters and inflate the monitored copy's MB/s and rows. With a
  // groupId, onJobStart admits only stages of jobs tagged with that
  // group (setJobGroup is thread-local, so the monitored body's jobs
  // carry it; the listener bus is ordered, so a job's start precedes
  // its task events). groupId None keeps the legacy context-wide scope
  // for callers that attach the listener themselves. The group tag is
  // THREAD-LOCAL, so jobs a monitored body launches from its OWN
  // threads (futures, streaming micro-batch threads) inherit no tag and
  // fall outside the group scope: `includeUntagged` additionally admits
  // jobs carrying NO group tag at all — recovering those threads' work
  // at the cost of also counting a concurrent stranger's untagged jobs
  // (the context-global over-count, narrowed to untagged jobs only).
  // Jobs tagged with a DIFFERENT group are never counted either way.
  private val monitoredStages =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  override def onJobStart(
      jobStart: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
    if (groupId.isDefined) {
      val tag =
        if (jobStart.properties == null) null
        else jobStart.properties.getProperty("spark.jobGroup.id")
      if (groupId.contains(tag) || (includeUntagged && tag == null))
        jobStart.stageIds.foreach(id => monitoredStages.add(id))
    }

  private def inScope(stageId: Int): Boolean =
    groupId.isEmpty || monitoredStages.contains(stageId)

  override def onTaskStart(taskStart: SparkListenerTaskStart): Unit =
    if (inScope(taskStart.stageId)) {
      started.add(taskStart.taskInfo.taskId)
      activeTasks.incrementAndGet()
    }

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    // decrement ONLY for tasks this listener counted in (which also
    // enforces the group scope — an out-of-scope task never started)
    if (taskEnd.taskInfo != null && started.remove(taskEnd.taskInfo.taskId))
      activeTasks.decrementAndGet()
    val m = taskEnd.taskMetrics
    if (m != null && inScope(taskEnd.stageId) &&
        CopyMonitor.countsAttempt(taskEnd.reason)) {
      recordsWritten.add(m.outputMetrics.recordsWritten)
      bytesWritten.add(m.outputMetrics.bytesWritten)
      recordsRead.add(m.inputMetrics.recordsRead)
      taskTimeMs.add(m.executorRunTime)
      tasksCompleted.increment()
    }
  }

  private[exec] def record(s: CopyMonitor.Sample): Unit = _samples.add(s)

  /** Periodic samples captured while the monitored body ran (empty when
    * reporting was off).
    */
  def samples: Seq[CopyMonitor.Sample] = {
    import scala.jdk.CollectionConverters._
    _samples.asScala.toSeq
  }

}

object CopyMonitor {
  /** SUCCESSFUL attempts only: a failed/killed attempt still delivers
    * `onTaskEnd` with its partial `outputMetrics`, so counting it would
    * double-book the rows its retry writes again — `records_written`
    * would exceed the destination count on a copy that actually
    * succeeded (the exact over-count a throughput monitor exists to
    * catch, reported against itself). Local `maxFailures=1` can't stage
    * a live retry, so the predicate is exposed and spec-pinned directly.
    */
  private[graft] def countsAttempt(reason: org.apache.spark.TaskEndReason): Boolean =
    reason == org.apache.spark.Success

  /** One periodic report line — the fields of the reference's ~5 s
    * console report (`SmartBulkCopy.cs:723-743`: MB/s, tasks running,
    * queue depth): cumulative counters plus interval throughput.
    */
  final case class Sample(
      elapsedMs: Long,
      recordsWritten: Long,
      bytesWritten: Long,
      intervalRowsPerSec: Double,
      intervalMbPerSec: Double,
      activeTasks: Int)

  /** Run `body` with a listener attached; returns (result, monitor).
    *
    * With `reportEveryMs > 0`, a daemon sampler thread emits a [[Sample]]
    * every interval while the body runs (recorded on the monitor and
    * passed to `onReport`) — the live progress report of the reference's
    * monitor loop. The sampler reads lock-free counters, so it never
    * perturbs the copy; it is interrupted and joined before returning.
    *
    * SCOPE CONTRACT: the job group that scopes the counters is a
    * THREAD-LOCAL property on the CALLING thread, so only jobs the body
    * launches from that same thread are counted. A body that launches
    * jobs from its own threads (futures, streaming micro-batch threads)
    * must pass `includeUntagged = true`: those jobs inherit no group
    * tag, and the monitor then admits untagged jobs too — counting the
    * body's cross-thread work, at the documented cost of also counting
    * any concurrent stranger's UNTAGGED jobs in a shared session
    * (group-tagged strangers stay excluded either way).
    */
  def monitored[T](
      spark: SparkSession,
      reportEveryMs: Long = 0L,
      onReport: Sample => Unit = _ => (),
      includeUntagged: Boolean = false)(body: => T): (T, CopyMonitor) = {
    // a unique job group scopes the counters to THIS body's jobs (see
    // the listener's monitoredStages); the previous group id is
    // restored exactly, so a caller's own group tagging survives
    val group = s"graft-monitor-${java.util.UUID.randomUUID()}"
    val mon = new CopyMonitor(Some(group), includeUntagged)
    val sc = spark.sparkContext
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    sc.setLocalProperty("spark.jobGroup.id", group)
    spark.sparkContext.addSparkListener(mon)
    val stop = new AtomicBoolean(false)
    val sampler =
      if (reportEveryMs <= 0) None
      else Some(new Thread(() => {
        val t0 = System.nanoTime()
        var lastRecords = 0L
        var lastBytes = 0L
        var lastNs = t0
        try while (!stop.get()) {
          Thread.sleep(reportEveryMs)
          val now = System.nanoTime()
          val rec = mon.recordsWritten.sum()
          val bytes = mon.bytesWritten.sum()
          val dt = math.max((now - lastNs) / 1e9, 1e-9)
          val s = Sample(
            elapsedMs = (now - t0) / 1000000,
            recordsWritten = rec,
            bytesWritten = bytes,
            intervalRowsPerSec = (rec - lastRecords) / dt,
            intervalMbPerSec = (bytes - lastBytes) / (1024.0 * 1024.0) / dt,
            activeTasks = mon.activeTasks.get())
          lastRecords = rec; lastBytes = bytes; lastNs = now
          mon.record(s)
          // a throwing callback must not kill the sampler: reporting is
          // best-effort side-channel, the copy (and sampling) continue
          try onReport(s)
          catch { case scala.util.control.NonFatal(_) => () }
        } catch { case _: InterruptedException => () }
      }, "graft-copy-monitor"))
    sampler.foreach { t => t.setDaemon(true); t.start() }
    try {
      val r = body
      // drain the async listener bus so the counters are COMPLETE before
      // the post-job snapshot — a deterministic wait on the bus itself
      // (via the same-package bridge), falling back to a short timed
      // settle only if the bus refuses the wait (stopping context)
      if (!org.apache.spark.GraftSparkInternals.drainListenerBus(
          spark.sparkContext, 5000L))
        Thread.sleep(200)
      (r, mon)
    } finally {
      stop.set(true)
      sampler.foreach { t => t.interrupt(); t.join(1000) }
      spark.sparkContext.removeSparkListener(mon)
      sc.setLocalProperty("spark.jobGroup.id", prevGroup) // null clears
    }
  }
}
