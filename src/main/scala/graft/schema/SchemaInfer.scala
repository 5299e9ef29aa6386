package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** String→typed schema inference and cross-system type mapping — the
  * reference's intermediate type system (`utils/data_structures.py:22-294`)
  * re-expressed for Spark.
  *
  * The reference wraps every VALUE in a typed object (`DataType` instances
  * with `to_intermediate_type` casts, one Python object per cell) and maps
  * MySQL schema strings onto that lattice (`data_structures.py:265`
  * `mysql_type`). Per-cell boxing is exactly what a columnar engine must
  * not do, so graft works at column granularity:
  *
  *  - [[infer]]: ONE aggregate pass computes, per column, how many non-null
  *    values fail to parse as each candidate type; the narrowest candidate
  *    with zero failures wins. The pass is partial-aggregation friendly
  *    (a handful of longs per column), so at 100 TB it is a single
  *    map-side-combined scan — and `sampleMod` keeps even that scan
  *    optional by inferring from a deterministic 1-in-N row sample.
  *  - [[applyTypes]]: pure projection casting each column to its inferred
  *    type (codegen'd, no shuffle).
  *  - [[mysqlType]]: MySQL type-string → Spark `DataType` (the
  *    `type_mapping` half of the reference's `MySQLTypeSystem`).
  *
  * Null-tolerant meet: nulls and empty strings are compatible with every
  * type (they cast to null), so they never widen a column; a column with no
  * parseable evidence at all stays `StringType`.
  */
object SchemaInfer {

  /** Candidate lattice, narrowest first. BIGINT precedes DOUBLE so integer
    * columns don't widen; DATE precedes TIMESTAMP so bare dates stay dates.
    * (Reference intermediate types: BOOL/INTEGER/FLOAT/DATETIME/STRING —
    * `data_structures.py:172-190` — plus DATE, which MySQL distinguishes.)
    */
  // try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast
  // THROWS on malformed input instead of returning null.
  private val candidates: Seq[(DataType, Column => Column)] = Seq(
    BooleanType -> (v => lower(v).isin("true", "false")),
    LongType -> (v => v.rlike("^[+-]?\\d{1,19}$") && v.try_cast(LongType).isNotNull),
    DoubleType -> (v =>
      v.rlike("^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$") &&
        v.try_cast(DoubleType).isNotNull),
    DateType -> (v =>
      v.rlike("^\\d{4}-\\d{2}-\\d{2}$") && v.try_cast(DateType).isNotNull),
    TimestampType -> (v =>
      v.rlike("^\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$") &&
        v.try_cast(TimestampType).isNotNull))

  /** Infer a type per (string-typed) column. `sampleMod` > 1 infers from the
    * deterministic 1-in-N sample `crc32(value-row-id) % N == 0`-free — we
    * use `monotonically_increasing_id` mod N, cheap and partition-stable.
    */
  def infer(df: DataFrame, columns: Seq[String] = Nil,
            sampleMod: Int = 1): Seq[(String, DataType)] = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val base =
      if (sampleMod <= 1) df
      else df.filter(pmod(monotonically_increasing_id(), lit(sampleMod)) === 0)
    // One flat aggregate: per column, per candidate, the count of non-null
    // non-empty values that do NOT parse; plus the count of parseable
    // evidence (so an all-null column falls back to STRING).
    val aggs: Seq[Column] = cols.flatMap { c =>
      val v = trim(col(c).cast(StringType))
      val present = v.isNotNull && v =!= ""
      // coalesce: sum over ZERO rows (empty input, or a sampleMod matching
      // nothing) is null, and getAs[Long] would NPE on unboxing
      candidates.zipWithIndex.map { case ((_, ok), i) =>
        coalesce(sum(when(present && !ok(v), 1L).otherwise(0L)), lit(0L))
          .as(s"__f_${c}_$i")
      } :+ coalesce(sum(when(present, 1L).otherwise(0L)), lit(0L)).as(s"__n_$c")
    }
    val row = base.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.map { c =>
      val n = row.getAs[Long](s"__n_$c")
      val chosen =
        if (n == 0L) StringType
        else candidates.zipWithIndex.collectFirst {
          case ((dt, _), i) if row.getAs[Long](s"__f_${c}_$i") == 0L => dt
        }.getOrElse(StringType)
      c -> chosen
    }
  }

  /** Cast each listed column to its type — a pure projection. try_cast so
    * that rows outside an inference sample degrade to null rather than
    * failing the job under ANSI mode.
    */
  def applyTypes(df: DataFrame, types: Seq[(String, DataType)]): DataFrame = {
    val byName = types.toMap
    df.select(df.columns.toSeq.map { c =>
      byName.get(c).fold(col(c))(dt => col(c).try_cast(dt).as(c))
    }: _*)
  }

  /** Infer + apply in one call (the inference collect is a tiny driver
    * round-trip: candidates × columns longs).
    */
  def inferAndApply(df: DataFrame, sampleMod: Int = 1): DataFrame =
    applyTypes(df, infer(df, sampleMod = sampleMod))

  /** Inferred schema as a DDL string (`name TYPE, ...`). */
  def ddl(types: Seq[(String, DataType)]): String =
    types.map { case (n, t) => s"$n ${t.sql}" }.mkString(", ")

  private val MysqlParam = "^([a-z]+)\\s*\\(\\s*(\\d+)(?:\\s*,\\s*(\\d+))?\\s*\\)$".r

  /** MySQL schema type-string → Spark type (reference `mysql_type`,
    * `data_structures.py:265`: `int(N)`/`varchar(N)`/`date`, with unknown
    * strings falling back to varchar). Display widths don't change storage,
    * with the classic exception `tinyint(1)` ≙ boolean.
    */
  def mysqlType(s: String): DataType = {
    val t = s.trim.toLowerCase
    val (name, p1, p2) = t match {
      case MysqlParam(n, a, b) => (n, Option(a).map(_.toInt), Option(b).map(_.toInt))
      case _                   => (t, None, None)
    }
    name match {
      case "tinyint" if p1.contains(1)         => BooleanType
      case "bool" | "boolean"                  => BooleanType
      case "tinyint"                           => ByteType
      case "smallint"                          => ShortType
      case "mediumint" | "int" | "integer"     => IntegerType
      case "bigint"                            => LongType
      case "float"                             => FloatType
      case "double" | "real"                   => DoubleType
      case "decimal" | "numeric"               => DecimalType(p1.getOrElse(10), p2.getOrElse(0))
      case "date"                              => DateType
      case "datetime" | "timestamp"            => TimestampType
      case "char" | "varchar" | "text" | "tinytext" | "mediumtext" | "longtext" |
           "enum" | "set"                      => StringType
      case "blob" | "binary" | "varbinary"     => BinaryType
      case _                                   => StringType // reference falls back to VARCHAR128
    }
  }

  /** Parse a full `(name, mysqlTypeString)` table description into a Spark
    * schema — the reference's `Row`-of-`DataType`s made static.
    */
  def mysqlSchema(cols: Seq[(String, String)]): StructType =
    StructType(cols.map { case (n, t) => StructField(n, mysqlType(t)) })
}
