package graft

import org.apache.spark.sql.SparkSession

/** Smoke tool (not part of the library surface): runs the driver-contract
  * entry query, prints rows + the formatted physical plan.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(30, false)
    println("rows=" + df.count())
    df.explain("formatted")
    spark.stop()
  }
}
