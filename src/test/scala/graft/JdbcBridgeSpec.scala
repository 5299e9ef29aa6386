package graft

import graft.sources.JdbcBridge

/** The reflective JDBC-over-TCP bridge (r16) in isolation — the device
  * that lets executor JVMs reach the driver JVM's embedded Derby
  * (q_jdbc_roundtrip's multi-JVM enabler, plans/CLUSTER.md r16). The
  * Spark write→read path is oracled end-to-end by q_jdbc_roundtrip;
  * pinned here are the bridge's own laws: typed value round-trips
  * through the generic reflective loop, handle-typed results
  * (Statement/ResultSet/metadata), server-side SQLExceptions crossing
  * the wire as themselves, stale-handle rejection, and session
  * isolation (two concurrent client connections).
  */
class JdbcBridgeSpec extends SparkSpec {

  private def freshBridge(tag: String): (String, java.util.Properties) = {
    EntryFixtures.derbyEngineProps
    val (url, _) = JdbcBridge.ensure(s"jdbc:derby:memory:bridge_$tag;create=true")
    (url, new java.util.Properties)
  }

  test("typed values, handles, and exceptions round-trip the bridge") {
    val (url, props) = freshBridge("laws")
    val drv = new graft.sources.BridgeJdbcDriver
    assert(drv.acceptsURL(url) && !drv.acceptsURL("jdbc:derby:memory:x"))
    // JDBC contract: a foreign URL returns null, not an exception
    assert(drv.connect("jdbc:postgresql://nope", props) == null)
    val conn = drv.connect(url, props)
    try {
      val st = conn.createStatement() // handle-typed result
      st.executeUpdate(
        "CREATE TABLE t_laws (i BIGINT, d DOUBLE, s VARCHAR(32), " +
          "ts TIMESTAMP, b BLOB)")
      val ps = conn.prepareStatement("INSERT INTO t_laws VALUES (?,?,?,?,?)")
      ps.setLong(1, 42L)
      ps.setDouble(2, 2.5)
      ps.setString(3, "héllo")
      ps.setTimestamp(4, java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
      ps.setBytes(5, Array[Byte](1, 2, 3))
      assert(ps.executeUpdate() == 1)
      ps.setLong(1, 7L); ps.setDouble(2, -1.0)
      ps.setNull(3, java.sql.Types.VARCHAR)
      ps.setNull(4, java.sql.Types.TIMESTAMP)
      ps.setNull(5, java.sql.Types.BLOB)
      ps.addBatch()
      assert(ps.executeBatch().toSeq == Seq(1)) // int[] crosses as a value
      val rs = st.executeQuery(
        "SELECT i, d, s, ts, b FROM t_laws ORDER BY i DESC")
      assert(rs.next())
      assert(rs.getLong(1) == 42L && rs.getDouble(2) == 2.5 &&
        rs.getString(3) == "héllo" &&
        rs.getTimestamp(4) == java.sql.Timestamp.valueOf("2024-01-02 03:04:05") &&
        rs.getBytes(5).toSeq == Seq[Byte](1, 2, 3))
      val md = rs.getMetaData // nested handle
      assert(md.getColumnCount == 5 &&
        md.getColumnName(1).equalsIgnoreCase("i"))
      assert(rs.next())
      assert(rs.getLong(1) == 7L)
      assert(rs.getString(3) == null && rs.wasNull())
      assert(!rs.next())
      // a server-side SQL error crosses as a real SQLException
      val e = intercept[java.sql.SQLException] {
        st.executeQuery("SELECT * FROM no_such_table")
      }
      assert(e.getMessage != null && e.getMessage.nonEmpty)
      // DatabaseMetaData works (Spark's writer probes it)
      assert(conn.getMetaData.supportsTransactions())
    } finally conn.close()
  }

  test("sessions are isolated and survive a sibling's close; closing " +
       "the connection ends its socket session") {
    val (url, props) = freshBridge("iso")
    val drv = new graft.sources.BridgeJdbcDriver
    val c1 = drv.connect(url, props)
    val c2 = drv.connect(url, props)
    try {
      c1.createStatement().executeUpdate(
        "CREATE TABLE t_iso (i BIGINT)")
      c1.createStatement().executeUpdate("INSERT INTO t_iso VALUES (1)")
      // both sessions see the same served database
      val rs2 = c2.createStatement().executeQuery(
        "SELECT COUNT(*) AS n FROM t_iso")
      assert(rs2.next() && rs2.getLong(1) == 1L)
      // closing c1 must not break c2's live session
      val s1 = c1.createStatement()
      c1.close()
      val rs3 = c2.createStatement().executeQuery(
        "SELECT COUNT(*) AS n FROM t_iso")
      assert(rs3.next() && rs3.getLong(1) == 1L)
      // c1's handles are dead after close (its socket session ended)
      intercept[Exception] { s1.executeQuery("SELECT 1 FROM t_iso") }
    } finally c2.close()
  }
}
