package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ops, Sinks}
import graft.sources.Sources
import graft.streaming.Streams

/** Gap sessionization (window-fn and stateful forms must agree) and the
  * embedded-Derby JDBC write → partitioned read-back round trip.
  */
class SessionizeJdbcSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits on gaps and counts events per session") {
    val df = Seq(
      (1L, 0L), (1L, 50L), (1L, 60L),   // session 1: 3 events, [0, 60]
      (1L, 200L),                        // session 2 (gap 140 > 100)
      (2L, 10L), (2L, 111L)              // user 2: two single-event sessions
    ).toDF("user_id", "ts_us")
    val got = Ops.sessionize(df, Seq("user_id"), "ts_us", gap = 100L)
      .select("user_id", "session_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0L, 60L, 3L), (1L, 2L, 200L, 200L, 1L),
      (2L, 1L, 10L, 10L, 1L), (2L, 2L, 111L, 111L, 1L)))
  }

  test("sessionizeSegmented ≡ sessionize: boundary merges, multi-segment " +
       "chains, exact-gap edges, and the real events table") {
    // hand-built edges around a segment size of 100: sessions that span
    // 2 and 3+ segments, a boundary gap EXACTLY equal to `gap` (merges),
    // one over (splits), empty segments between events, multiple keys
    val df = Seq(
      (1L, 0L), (1L, 95L), (1L, 105L), (1L, 215L), (1L, 299L), (1L, 301L),
      (1L, 900L),            // empty segments 4..8, new session
      (2L, 99L), (2L, 199L), // exact-gap boundary merge (gap = 100)
      (2L, 300L),            // gap 101 > 100: splits at a boundary
      (3L, 50L)
    ).toDF("user_id", "ts_us")
    def canon(d: org.apache.spark.sql.DataFrame) = d
      .select("user_id", "session_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val plain = canon(Ops.sessionize(df, Seq("user_id"), "ts_us", gap = 100L))
    for (segment <- Seq(100L, 64L, 1000L))
      assert(canon(Ops.sessionizeSegmented(df, Seq("user_id"), "ts_us",
        gap = 100L, segment = segment)) == plain, s"segment=$segment")
    // the real table, celebrity-skewed: remap ~10% of events onto one user
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .select(when(expr("ts_ns % 10 < 1"), lit(-1L)).otherwise(col("user_id"))
        .as("user_id"), expr("ts_ns div 1000").as("ts_us"))
    assert(canon(Ops.sessionizeSegmented(ev, Seq("user_id"), "ts_us",
        gap = 600000000L, segment = 3600000000L)) ==
      canon(Ops.sessionize(ev, Seq("user_id"), "ts_us", gap = 600000000L)))
  }

  test("sessionizeState (flatMapGroupsWithState) equals the window-fn form on batch") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"))
    val viaWindow = Ops.sessionize(ev, Seq("user_id"), "ts_us", gap = 600000000L)
      .select("user_id", "session_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val viaState = Streams.sessionizeState(
        ev.as[(Long, Long)], gap = 600000000L).collect().toSet
    assert(viaState == viaWindow && viaState.nonEmpty)
  }

  test("jdbc write then partitioned read-back round-trips values and types") {
    System.setProperty("derby.stream.error.path", "/tmp/derby.log")
    val url = "jdbc:derby:memory:graft_spec;create=true"
    val drv = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    Sinks.jdbcWrite(nation, url, "nation_rt", drv, mode = "overwrite")
    val back = Sources.jdbcTable(spark, url, "nation_rt",
      partitionColumn = Some("n_nationkey"), lowerBound = 0L, upperBound = 25L,
      numPartitions = 4, extra = drv)
    assert(back.rdd.getNumPartitions == 4) // the read really is partitioned
    assert(back.schema("n_nationkey").dataType == nation.schema("n_nationkey").dataType)
    val want = nation.as[(Int, String, Int)].collect().toSet
    val got = back.as[(Int, String, Int)].collect().toSet
    assert(got == want)
    // overwrite replaces, append duplicates
    Sinks.jdbcWrite(nation, url, "nation_rt", drv, mode = "append")
    assert(Sources.jdbcTable(spark, url, "nation_rt", extra = drv).count() == 2 * want.size)
    Sinks.jdbcWrite(nation, url, "nation_rt", drv, mode = "overwrite")
    assert(Sources.jdbcTable(spark, url, "nation_rt", extra = drv).count() == want.size)
  }

  test("jdbcColumns introspects types; jdbcTyped applies them and hexes blobs") {
    System.setProperty("derby.stream.error.path", "/tmp/derby.log")
    val url = "jdbc:derby:memory:graft_ty_spec;create=true"
    val drv = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val src = Seq((1L, "alice", 2.5), (2L, "bob", -1.0)).toDF("id", "name", "score")
      .withColumn("sig", unhex(md5(col("name"))))
    Sinks.jdbcWrite(src, url, "ty_tbl", drv, mode = "overwrite")
    // introspection: ordinal order, MySQL-ish type strings SchemaInfer parses
    val cols = Sources.jdbcColumns(url, "ty_tbl", drv)
    assert(cols.map(_._1) == Seq("id", "name", "score", "sig"))
    assert(cols.toMap.apply("id") == "bigint")
    assert(cols.toMap.apply("score") == "double")
    assert(cols.toMap.apply("sig") == "blob")
    val schema = graft.schema.SchemaInfer.mysqlSchema(cols)
    assert(schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(schema("sig").dataType == org.apache.spark.sql.types.BinaryType)
    // typed read: casts applied, binary surfaced as <name>_hex
    val back = Sources.jdbcTyped(spark, url, "ty_tbl", cols, extra = drv)
    assert(back.schema("sig_hex").dataType == org.apache.spark.sql.types.StringType)
    val got = back.select("id", "name", "score", "sig_hex")
      .as[(Long, String, Double, String)].collect().toSet
    val want = src.select(col("id"), col("name"), col("score"), upper(md5(col("name"))))
      .as[(Long, String, Double, String)].collect().toSet
    assert(got == want)
    // a missing table fails loudly, not with an empty schema
    intercept[IllegalArgumentException] { Sources.jdbcColumns(url, "nope_tbl", drv) }
  }

  test("jdbcColumns treats '_' in the table name literally, not as a LIKE wildcard") {
    System.setProperty("derby.stream.error.path", "/tmp/derby.log")
    val url = "jdbc:derby:memory:graft_wc_spec;create=true"
    val drv = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    // ORD_X and ORDAX both match the unescaped LIKE pattern 'ORD_X';
    // an unescaped getColumns call would interleave both tables' columns
    // into one wrong schema. The escape + exact-TABLE_NAME filter must
    // return only the requested table's columns.
    Sinks.jdbcWrite(Seq((1L, 2.0)).toDF("a", "b"), url, "ord_x", drv, mode = "overwrite")
    Sinks.jdbcWrite(Seq(("x", 1, 2, 3)).toDF("c", "d", "e", "f"),
      url, "ordax", drv, mode = "overwrite")
    val cols = Sources.jdbcColumns(url, "ord_x", drv)
    assert(cols.map(_._1.toLowerCase) == Seq("a", "b"))
  }
}
