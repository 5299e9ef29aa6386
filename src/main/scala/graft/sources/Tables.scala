package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the harness parquet tables.
  *
  * Message dicts in the reference (`metalpipe/node.py`) map to rows here; a
  * "table" is just a parquet-backed DataFrame whose scan Catalyst can prune
  * and push filters into — verified in `PlanSpec`.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from `dir` (e.g. /root/testdata/sf0.01). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  /** The `events` table carries a TIMESTAMP(NANOS) parquet column, which the
    * Spark parquet reader rejects outright. Public escape hatch: read nanos
    * as raw int64 (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a
    * microsecond timestamp (integer division — exactly what DuckDB does when
    * it truncates nanos, so oracle comparisons agree).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts_ns", col("ts"))
      // integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceed 2^53, so a
      // double-division round-trip would corrupt the microsecond value.
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Register every table as a temp view so `spark.sql` pipelines can run. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Write a bucketed (and optionally sort-ordered) catalog table: joins and
    * aggregations on the bucket columns then need NO shuffle on this side —
    * the co-located-join layout for fact tables that are joined repeatedly
    * on the same key (SURVEY §5). `numBuckets` should match across tables
    * joined together.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
