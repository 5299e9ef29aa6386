package graft

import org.apache.spark.sql.SparkSession

/** Job labeling (guide §1.5): multi-action operators set a description per
  * action so profiles and the UI attribute wall time to the right step.
  * Thread-local, restored on exit — safe under the concurrent-drain
  * streaming paths.
  */
object Jobs {
  def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }
}
