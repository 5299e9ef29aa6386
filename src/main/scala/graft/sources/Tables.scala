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

  /** The `events` table's `ts` column has shipped in two parquet encodings:
    * TIMESTAMP(NANOS) (which the Spark vectorized reader rejects outright)
    * and plain TIMESTAMP(MICROS). Normalize both to the same surface the
    * rest of graft consumes: `ts_ns` as an epoch-nanos BIGINT and `ts` as a
    * microsecond TIMESTAMP (session TZ is UTC, so `unix_micros` agrees with
    * DuckDB's `epoch_us` on the naive parquet value).
    *
    *  - NANOS files: public escape hatch `spark.sql.legacy.parquet
    *    .nanosAsLong` reads the raw int64; micros = `ts_ns div 1000`
    *    (integer `div`, NOT `/`: epoch-nanos ~1.7e18 exceed 2^53, a double
    *    round-trip would corrupt the value) — exactly DuckDB's truncation.
    *  - MICROS files: `ts` arrives as TIMESTAMP_NTZ (no UTC adjustment
    *    flag); cast to TIMESTAMP under the UTC session zone, nanos =
    *    micros × 1000.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        val tsUtc = col("ts").cast(org.apache.spark.sql.types.TimestampType)
        raw.withColumn("ts_ns", unix_micros(tsUtc) * lit(1000L))
          .withColumn("ts", tsUtc)
    }
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
