package graft

import org.apache.spark.sql.types._

import graft.schema.SchemaInfer

/** SchemaInfer: string-sample → typed inference and the MySQL type-string
  * parser (SURVEY §2.C6; reference `utils/data_structures.py:22-294`).
  */
class SchemaInferSpec extends SparkSpec {
  import spark.implicits._

  test("infer picks the narrowest type per column across the lattice") {
    val df = Seq(
      ("1", "1.5", "true", "2020-01-02", "2020-01-02 03:04:05", "abc"),
      ("-42", "2", "false", "2021-12-31", "2021-12-31 23:59:59.123", "7x"))
      .toDF("i", "d", "b", "dt", "ts", "s")
    val got = SchemaInfer.infer(df).toMap
    assert(got("i") == LongType)
    assert(got("d") == DoubleType) // "2" alone is integral, "1.5" widens
    assert(got("b") == BooleanType)
    assert(got("dt") == DateType)
    assert(got("ts") == TimestampType)
    assert(got("s") == StringType)
  }

  test("nulls and empty strings never widen; all-null falls back to string") {
    val df = Seq(
      (Some("7"), Option.empty[String], Some("")),
      (None, None, Some("  ")),
      (Some("9"), None, None))
      .toDF("i", "allnull", "blank")
    val got = SchemaInfer.infer(df).toMap
    assert(got("i") == LongType)
    assert(got("allnull") == StringType)
    assert(got("blank") == StringType)
  }

  test("bigint overflow and malformed dates demote correctly") {
    val df = Seq(
      ("99999999999999999999", "2020-13-45"), // 20 digits; invalid month/day
      ("1", "2020-01-01"))
      .toDF("big", "baddate")
    val got = SchemaInfer.infer(df).toMap
    assert(got("big") == DoubleType)   // fails bigint, parses as double
    assert(got("baddate") == StringType) // regex matches but cast fails
  }

  test("inferAndApply yields the typed schema and exact values") {
    val df = Seq(("1", "1.5", "true"), ("2", "-2.25", "false")).toDF("a", "b", "c")
    val typed = SchemaInfer.inferAndApply(df)
    assert(typed.schema == StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("c", BooleanType))))
    val rows = typed.as[(Long, Double, Boolean)].collect().toSet
    assert(rows == Set((1L, 1.5, true), (2L, -2.25, false)))
    assert(SchemaInfer.ddl(SchemaInfer.infer(df)) == "a BIGINT, b DOUBLE, c BOOLEAN")
  }

  test("sampleMod infers from a deterministic row subset") {
    val df = (0 until 100).map(i => i.toString).toDF("n")
    assert(SchemaInfer.infer(df, sampleMod = 10).toMap.apply("n") == LongType)
  }

  test("empty input infers STRING for every column instead of NPEing") {
    val df = Seq.empty[(String, String)].toDF("a", "b")
    assert(SchemaInfer.infer(df).toMap ==
      Map("a" -> StringType, "b" -> StringType))
  }

  test("mysqlType maps MySQL schema strings onto Spark types") {
    assert(SchemaInfer.mysqlType("int(8)") == IntegerType)
    assert(SchemaInfer.mysqlType("INT") == IntegerType)
    assert(SchemaInfer.mysqlType("bigint(20)") == LongType)
    assert(SchemaInfer.mysqlType("tinyint(1)") == BooleanType)
    assert(SchemaInfer.mysqlType("tinyint(4)") == ByteType)
    assert(SchemaInfer.mysqlType("varchar(255)") == StringType)
    assert(SchemaInfer.mysqlType("decimal(10,2)") == DecimalType(10, 2))
    assert(SchemaInfer.mysqlType("datetime") == TimestampType)
    assert(SchemaInfer.mysqlType("date") == DateType)
    assert(SchemaInfer.mysqlType("blob") == BinaryType)
    assert(SchemaInfer.mysqlType("geometry") == StringType) // reference fallback
    assert(SchemaInfer.mysqlSchema(Seq("id" -> "int(11)", "name" -> "varchar(64)"))
      == StructType(Seq(StructField("id", IntegerType), StructField("name", StringType))))
  }
}
