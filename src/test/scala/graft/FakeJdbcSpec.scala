package graft

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** The executor-side JDBC path, without Derby's per-JVM limitation
  * (round-8 VERDICT item 3).
  *
  * plans/CLUSTER.md adjudicated 3 JDBC queries as environmental skips
  * under `local-cluster`: embedded in-memory Derby lives in the driver
  * JVM, so an executor that connects boots its own EMPTY instance — the
  * partitioned-read path Spark runs on executors was never exercised
  * against data. This spec closes that gap with a fake driver whose rows
  * are COMPUTED from the query text: zero stored state, zero driver-JVM
  * dependence — any JVM that loads the class can serve any partition,
  * which is exactly the property a network-reachable production database
  * has and embedded Derby lacks. What it proves:
  *
  *  - the partitioned-scan closure (options map, bounds, driver class
  *    name) serializes into tasks and reconstructs a working connection
  *    factory per partition (Spark instantiates the driver INSIDE the
  *    task via DriverRegistry, not from driver-JVM state);
  *  - each partition issues its own bounded WHERE query (observed by the
  *    driver), i.e. reads are pushed down per-partition, not
  *    driver-collected;
  *  - column pruning reaches the generated SQL.
  */
class FakeJdbcSpec extends SparkSpec {
  import spark.implicits._

  test("jdbcTable partitioned read against a process-independent driver") {
    FakeJdbc.seenSql.clear()
    val df = Sources.jdbcTable(spark, FakeJdbc.URL, "numbers",
      partitionColumn = Some("id"), lowerBound = 0L, upperBound = FakeJdbc.N,
      numPartitions = 4,
      extra = Map("driver" -> classOf[FakeJdbcDriver].getName))
    assert(df.rdd.getNumPartitions == 4)
    val got = df.select("id", "value", "name")
      .as[(Long, Long, String)].collect().toSet
    val want = (0L until FakeJdbc.N)
      .map(i => (i, FakeJdbc.value(i), FakeJdbc.fakeName(i))).toSet
    assert(got == want)
    // every partition ran its own bounded query (4 distinct WHEREs)
    val wheres = FakeJdbc.seenSql.toArray(Array.empty[String])
      .filter(s => s.contains("WHERE") && !s.contains("1=0")).toSet
    assert(wheres.size == 4, wheres.mkString("\n"))
    assert(wheres.count(_.contains(">=")) == 3, wheres.mkString("\n"))
  }

  test("column pruning reaches the generated per-partition SQL") {
    FakeJdbc.seenSql.clear()
    val df = Sources.jdbcTable(spark, FakeJdbc.URL, "numbers",
      partitionColumn = Some("id"), lowerBound = 0L, upperBound = FakeJdbc.N,
      numPartitions = 2,
      extra = Map("driver" -> classOf[FakeJdbcDriver].getName))
      .select("id", "value")
    assert(df.agg(sum("value")).head().getLong(0) ==
      (0L until FakeJdbc.N).map(FakeJdbc.value).sum)
    val parts = FakeJdbc.seenSql.toArray(Array.empty[String])
      .filter(s => s.contains("WHERE") && !s.contains("1=0"))
    assert(parts.nonEmpty && parts.forall(s => !s.contains("name")),
      "name column not pruned from partition SQL:\n" + parts.mkString("\n"))
  }
}

/** Deterministic 100-row table `numbers(id BIGINT, value BIGINT,
  * name VARCHAR)` computed on demand; `seenSql` records every query the
  * driver served (same-JVM visibility is fine — the property under test
  * is that serving needs NO cross-JVM state, which holds by construction:
  * connect() closes over nothing).
  */
object FakeJdbc {
  val URL = "jdbc:graftfake:numbers"
  val N = 100L
  def value(id: Long): Long = id * 7 % 13
  def fakeName(id: Long): String = s"row$id"
  val seenSql = new java.util.concurrent.CopyOnWriteArrayList[String]()

  private val cols = Seq(
    ("id", java.sql.Types.BIGINT, "BIGINT"),
    ("value", java.sql.Types.BIGINT, "BIGINT"),
    ("name", java.sql.Types.VARCHAR, "VARCHAR"))

  /** Reflective proxy with type-correct defaults for unhandled methods. */
  private def proxy[T](iface: Class[T])(
      handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    java.lang.reflect.Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      (_, m, args) => {
        val a = if (args == null) Array.empty[AnyRef] else args
        handle.applyOrElse((m.getName, a), (_: (String, Array[AnyRef])) =>
          m.getReturnType match {
            case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
            case java.lang.Integer.TYPE => Integer.valueOf(0)
            case java.lang.Long.TYPE    => java.lang.Long.valueOf(0L)
            case _                      => null
          })
      }).asInstanceOf[T]

  private def metaData(selected: Seq[Int]): java.sql.ResultSetMetaData =
    proxy(classOf[java.sql.ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(selected.size)
      case ("getColumnName", Array(i: Integer))     => cols(selected(i - 1))._1
      case ("getColumnLabel", Array(i: Integer))    => cols(selected(i - 1))._1
      case ("getColumnType", Array(i: Integer))     => Integer.valueOf(cols(selected(i - 1))._2)
      case ("getColumnTypeName", Array(i: Integer)) => cols(selected(i - 1))._3
      case ("getPrecision", Array(i: Integer)) =>
        Integer.valueOf(if (cols(selected(i - 1))._2 == java.sql.Types.VARCHAR) 128 else 19)
      case ("getScale", _)      => Integer.valueOf(0)
      case ("isSigned", _)      => java.lang.Boolean.TRUE
      case ("isNullable", _)    => Integer.valueOf(java.sql.ResultSetMetaData.columnNullable)
    }

  private def resultSet(selected: Seq[Int], ids: Seq[Long]): java.sql.ResultSet = {
    var pos = -1
    def cell(i: Int): AnyRef = cols(selected(i - 1))._1 match {
      case "id"    => java.lang.Long.valueOf(ids(pos))
      case "value" => java.lang.Long.valueOf(value(ids(pos)))
      case "name"  => fakeName(ids(pos))
    }
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) => pos += 1; java.lang.Boolean.valueOf(pos < ids.size)
      case ("getMetaData", _) => metaData(selected)
      case ("getLong", Array(i: Integer))   => cell(i)
      case ("getString", Array(i: Integer)) => String.valueOf(cell(i))
      case ("getObject", Array(i: Integer)) => cell(i)
      case ("wasNull", _) => java.lang.Boolean.FALSE
    }
  }

  /** Serve a query: parse the SELECT list and the partition bounds out of
    * the SQL Spark generated — data derives from the query alone.
    */
  private def serve(sql: String): java.sql.ResultSet = {
    seenSql.add(sql)
    val sel = sql.substring(sql.indexOf("SELECT") + 6, sql.indexOf("FROM")).trim
    val selected: Seq[Int] =
      if (sel == "*" || sel.isEmpty) cols.indices
      else sel.split(",").toSeq.map(c =>
        cols.indexWhere(_._1 == c.trim.stripPrefix("\"").stripSuffix("\"")))
    require(selected.forall(_ >= 0), s"unknown column in: $sql")
    if (sql.contains("1=0")) return resultSet(selected, Seq.empty)
    val lower = ">=\\s*(-?\\d+)".r.findFirstMatchIn(sql).map(_.group(1).toLong).getOrElse(0L)
    val upper = "<\\s*(-?\\d+)".r.findFirstMatchIn(sql).map(_.group(1).toLong).getOrElse(N)
    resultSet(selected, math.max(0L, lower) until math.min(N, upper))
  }

  private[graft] def connection(): java.sql.Connection =
    proxy(classOf[java.sql.Connection]) {
      case ("prepareStatement", args) if args.nonEmpty =>
        val sql = args(0).asInstanceOf[String]
        proxy(classOf[java.sql.PreparedStatement]) {
          case ("executeQuery", _) => serve(sql)
        }
      case ("createStatement", _) =>
        proxy(classOf[java.sql.Statement]) {
          case ("executeQuery", Array(sql: String)) => serve(sql)
        }
      case ("isValid", _) => java.lang.Boolean.TRUE
    }
}

/** Minimal JDBC driver over [[FakeJdbc]] — registered per-JVM by Spark's
  * DriverRegistry via the `driver` option, exactly like a production
  * driver on an executor.
  */
class FakeJdbcDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:graftfake:")
  override def connect(url: String, info: java.util.Properties): java.sql.Connection =
    if (acceptsURL(url)) FakeJdbc.connection() else null
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
