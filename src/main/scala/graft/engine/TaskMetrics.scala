package graft.engine

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Aggregate task-level metrics across all jobs — the evidence channel for
  * the scaling protocol (per-phase CPU time vs wall time shows whether a
  * phase is compute-, memory-, or scheduling-bound; shuffle bytes show the
  * exchange volume a plan actually moved).
  */
final class TaskMetricsListener extends SparkListener {
  val cpuNs = new AtomicLong(0)
  val runMs = new AtomicLong(0)
  val shuffleReadBytes = new AtomicLong(0)
  val shuffleWriteBytes = new AtomicLong(0)
  val gcMs = new AtomicLong(0)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      cpuNs.addAndGet(m.executorCpuTime)
      runMs.addAndGet(m.executorRunTime)
      gcMs.addAndGet(m.jvmGCTime)
      shuffleReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  final case class Snap(cpuSec: Double, runSec: Double, gcSec: Double,
      shufReadMb: Double, shufWriteMb: Double) {
    def -(o: Snap): Snap = Snap(cpuSec - o.cpuSec, runSec - o.runSec, gcSec - o.gcSec,
      shufReadMb - o.shufReadMb, shufWriteMb - o.shufWriteMb)
  }

  /** Snapshot the counters after draining the listener bus (task-end
    * events are posted asynchronously). */
  def snap(sc: SparkContext): Snap = {
    org.apache.spark.GraftListenerBridge.waitUntilEmpty(sc)
    Snap(cpuNs.get / 1e9, runMs.get / 1e3, gcMs.get / 1e3,
      shuffleReadBytes.get / 1e6, shuffleWriteBytes.get / 1e6)
  }
}
