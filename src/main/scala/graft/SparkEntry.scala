package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Ops, Sinks}
import graft.sources.{Sources, Tables}
import graft.functions.Text
import graft.dedup.Dedup
import graft.similarity.{Ann, Search}
import graft.json.{MtlParser, TreeWalk}
import graft.multimodal.Multimodal
import graft.Caching.TrackedSyntax

/** Driver contract: one `queries` entry (+ DuckDB oracle SQL) per operator
  * from SURVEY.md §2 — assembled from the per-family registries
  * ([[EntryQueriesCore]]/[[EntryQueriesDedup]]/[[EntryQueriesSimilarity]]
  * and [[EntryOraclesCore]]/[[EntryOraclesScale]]; the r15 split of the
  * former 6,100-line single file — shared helpers in [[EntryFixtures]],
  * shared DuckDB fragments in [[OracleFixtures]]).
  *
  * Oracle-parity rules (SURVEY §6) used throughout the registries:
  *  - money/double sums accumulate in DECIMAL(18,2) (order-independent,
  *    engine-independent) and surface as double;
  *  - ratios are exact int ÷ int double divisions;
  *  - event timestamps compare as epoch-MICROS bigints (Spark: `ts_ns div
  *    1000`; DuckDB truncates nanos to micros on parquet read → `epoch_us`);
  *  - hashes are md5 hex (identical across engines), never engine hash().
  */
object SparkEntry {
  import EntryFixtures._

  // Flagship query on sf=0.001; driver smoke-checks rows>0.
  def entry(spark: SparkSession): DataFrame =
    revenuePerNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntryQueriesCore.m ++ EntryQueriesDedup.m ++ EntryQueriesSimilarity.m

  def oracleSql: Map[String, String] =
    EntryOraclesCore.m ++ EntryOraclesScale.m
}
