package graft.monitor

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Execution monitoring (reference: the per-node monitor thread + queue
  * gauges, node.py `thread_monitor`). Spark already emits everything the
  * reference polls for — this listener folds task metrics into a snapshot
  * the way the reference's monitor summarizes queue depth / liveness.
  * Backpressure itself needs no code here: bounded queues ≙
  * `maxFilesPerTrigger` + AQE.
  */
final class PipelineMetrics private (spark: SparkSession) {
  private val tasks = new LongAdder
  private val failedTasks = new LongAdder
  private val recordsRead = new LongAdder
  private val bytesRead = new LongAdder
  private val shuffleBytesWritten = new LongAdder
  private val shuffleBytesRead = new LongAdder
  private val cpuTimeNs = new LongAdder

  private val listener = new SparkListener {
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasks.increment()
      if (e.taskInfo != null && !e.taskInfo.successful) failedTasks.increment()
      val m = e.taskMetrics
      if (m != null) {
        recordsRead.add(m.inputMetrics.recordsRead)
        bytesRead.add(m.inputMetrics.bytesRead)
        shuffleBytesWritten.add(m.shuffleWriteMetrics.bytesWritten)
        shuffleBytesRead.add(m.shuffleReadMetrics.totalBytesRead)
        cpuTimeNs.add(m.executorCpuTime)
      }
    }
  }
  spark.sparkContext.addSparkListener(listener)

  def snapshot: Map[String, Long] = Map(
    "tasks" -> tasks.sum, "failed_tasks" -> failedTasks.sum,
    "records_read" -> recordsRead.sum, "bytes_read" -> bytesRead.sum,
    "shuffle_bytes_written" -> shuffleBytesWritten.sum,
    "shuffle_bytes_read" -> shuffleBytesRead.sum,
    "executor_cpu_ns" -> cpuTimeNs.sum)

  def detach(): Unit = spark.sparkContext.removeSparkListener(listener)
}

object PipelineMetrics {
  /** Attach a fresh metrics listener to the session. */
  def attach(spark: SparkSession): PipelineMetrics = new PipelineMetrics(spark)
}
