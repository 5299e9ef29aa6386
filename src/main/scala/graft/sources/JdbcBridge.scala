package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.net.{InetAddress, ServerSocket, Socket}

/** A reflective JDBC-over-TCP bridge (r16) — the device that retires
  * the last multi-JVM environmental skip (plans/CLUSTER.md):
  * `q_jdbc_roundtrip` exercises Spark's EXECUTOR-side JDBC writer, but
  * the only database in this zero-egress environment is embedded Derby,
  * which accepts connections from exactly one JVM (no derbynet/H2/
  * hsqldb jar exists to run a real network server). The bridge serves
  * the driver JVM's embedded database over a loopback socket: the
  * server holds REAL JDBC objects (Connection/Statement/ResultSet/…)
  * in a per-socket registry, and the client is a `java.sql.Driver`
  * whose objects are `java.lang.reflect.Proxy`s forwarding every
  * interface call as (handle, method, args) — results come back either
  * as serialized values (primitives, strings, timestamps, byte[]) or
  * as new handles when the real result is itself a `java.sql.*`
  * interface. One generic reflective loop covers the whole JDBC
  * surface, so Spark's writer (prepare/setXXX/addBatch/executeBatch/
  * commit), its metadata probes (tableExists / WHERE 1=0 schema reads)
  * and its partitioned reader all work unchanged from any JVM that can
  * reach the port.
  *
  * Scope: a TEST FIXTURE. On a real cluster the JDBC URL points at a
  * network-reachable database and none of this is involved — which is
  * why the bridge lives beside the fixtures it serves, is
  * loopback-bound, serves exactly the one target URL it was
  * constructed with (a client cannot steer it at other databases), and
  * trades throughput for totality (one synchronous call per JDBC
  * method; object streams, not a wire protocol).
  *
  * Concurrency: one server thread per accepted socket; a JDBC
  * connection is single-threaded by contract and each client
  * connection maps to its own socket + registry, so no shared mutable
  * state crosses sockets. When a socket dies (client close or executor
  * exit), every registered object of that session is closed
  * best-effort.
  */
object JdbcBridge {

  val UrlPrefix = "jdbc:graftbridge://"

  // ---------------- wire protocol (java serialization) ----------------
  private[sources] case class Call(objId: Long, method: String,
                                   paramTypes: Array[String],
                                   args: Array[AnyRef]) extends Serializable
  private[sources] case class Value(v: AnyRef) extends Serializable
  private[sources] case class Handle(id: Long, ifaces: Array[String])
      extends Serializable
  private[sources] case class Fail(t: Throwable) extends Serializable

  /** every `java.sql`/`javax.sql` interface the class implements,
    * transitively — the proxy surface of a returned object.
    */
  private def sqlInterfaces(c: Class[_]): Array[Class[_]] = {
    val out = scala.collection.mutable.LinkedHashSet[Class[_]]()
    def addIfaces(k: Class[_]): Unit = k.getInterfaces.foreach { i =>
      if (i.getName.startsWith("java.sql.") ||
        i.getName.startsWith("javax.sql.")) out += i
      addIfaces(i)
    }
    var k: Class[_] = c
    while (k != null) { addIfaces(k); k = k.getSuperclass }
    out.toArray
  }

  private def classFor(name: String): Class[_] = name match {
    case "boolean" => java.lang.Boolean.TYPE
    case "byte"    => java.lang.Byte.TYPE
    case "short"   => java.lang.Short.TYPE
    case "int"     => java.lang.Integer.TYPE
    case "long"    => java.lang.Long.TYPE
    case "float"   => java.lang.Float.TYPE
    case "double"  => java.lang.Double.TYPE
    case "char"    => java.lang.Character.TYPE
    case n         => Class.forName(n)
  }

  // ------------------------------ server ------------------------------

  /** Serve `targetUrl` (opened lazily per client connect) on an
    * ephemeral loopback port; returns the bridge. Daemon threads — the
    * JVM exits freely.
    */
  final class Server(targetUrl: String) {
    private val ss = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
    val port: Int = ss.getLocalPort
    def url: String = s"$UrlPrefix${InetAddress.getLoopbackAddress.getHostAddress}:$port"

    private val acceptor = new Thread(() => {
      try while (true) {
        val s = ss.accept()
        val t = new Thread(() => handle(s), s"graft-jdbc-bridge-$port")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // socket closed: server stopped
    }, s"graft-jdbc-bridge-accept-$port")
    acceptor.setDaemon(true)
    acceptor.start()

    def close(): Unit = ss.close()

    private def handle(sock: Socket): Unit = {
      val registry = new java.util.HashMap[Long, AnyRef]()
      var nextId = 1L
      def register(o: AnyRef): Handle = {
        val id = nextId; nextId += 1
        registry.put(id, o)
        Handle(id, sqlInterfaces(o.getClass).map(_.getName))
      }
      val out = new ObjectOutputStream(sock.getOutputStream); out.flush()
      val in = new ObjectInputStream(sock.getInputStream)
      try {
        while (true) {
          val c = in.readObject().asInstanceOf[Call]
          val resp: AnyRef =
            try {
              val result =
                if (c.objId == 0L && c.method == "connect")
                  java.sql.DriverManager.getConnection(targetUrl)
                else {
                  val target = registry.get(c.objId)
                  require(target != null, s"stale bridge handle ${c.objId}")
                  val types = c.paramTypes.map(classFor)
                  // resolve on the PUBLIC java.sql interface — the
                  // implementing class (e.g. Derby's EmbedConnection) may
                  // be package-private, and Method.invoke through a
                  // non-public class fails even for public methods
                  val m: Method = sqlInterfaces(target.getClass).iterator
                    .flatMap(i => try Some(i.getMethod(c.method, types: _*))
                    catch { case _: NoSuchMethodException => None })
                    .nextOption()
                    .getOrElse {
                      val mm = target.getClass.getMethod(c.method, types: _*)
                      mm.setAccessible(true); mm
                    }
                  m.invoke(target, c.args: _*)
                }
              result match {
                case null => Value(null)
                case r if sqlInterfaces(r.getClass).nonEmpty => register(r)
                case r: java.io.Serializable => Value(r.asInstanceOf[AnyRef])
                case r => Fail(new java.sql.SQLException(
                  s"bridge cannot serialize ${r.getClass.getName}"))
              }
            } catch {
              case e: InvocationTargetException =>
                Fail(sendable(e.getCause))
              case e: Throwable => Fail(sendable(e))
            }
          out.writeObject(resp)
          out.flush()
          out.reset() // object identity must not leak across calls
        }
      } catch {
        case _: Throwable => () // EOF / client gone: fall through to cleanup
      } finally {
        registry.values.forEach {
          case a: AutoCloseable => try a.close() catch { case _: Throwable => () }
          case _ => ()
        }
        try sock.close() catch { case _: Throwable => () }
      }
    }

    private def sendable(t: Throwable): Throwable =
      try {
        // probe serializability — a cause chain holding a non-serializable
        // member must degrade to a plain SQLException, not kill the socket
        val bos = new java.io.ByteArrayOutputStream()
        new ObjectOutputStream(bos).writeObject(t)
        t
      } catch {
        case _: Throwable => new java.sql.SQLException(t.toString)
      }
  }

  // one bridge per (JVM, target URL): the fixture queries re-run in one
  // session and must reuse the same served database
  private val servers =
    new java.util.concurrent.ConcurrentHashMap[String, Server]()

  /** A bridge URL gets Spark's DEFAULT dialect, whose CREATE TABLE maps
    * StringType to TEXT — not a Derby type. This minimal dialect keeps
    * the DDL Derby-legal (VARCHAR/BLOB; the numeric/timestamp defaults
    * already are) for the bridged writes; registered once on the driver
    * (executor-side setters don't consult DDL types).
    */
  private object BridgeDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url != null && url.startsWith(UrlPrefix)
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType)
        : Option[org.apache.spark.sql.jdbc.JdbcType] = dt match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(1024)",
          java.sql.Types.VARCHAR))
      case org.apache.spark.sql.types.BinaryType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("BLOB",
          java.sql.Types.BLOB))
      case _ => None
    }
  }
  private lazy val dialectRegistered: Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(BridgeDialect)

  /** Serve `targetUrl` from this JVM (once), returning the bridge URL
    * for Spark's `jdbc` source/sink plus the driver option map.
    */
  def ensure(targetUrl: String): (String, Map[String, String]) = {
    dialectRegistered
    val s = servers.computeIfAbsent(targetUrl, u => new Server(u))
    (s.url, Map("driver" -> classOf[BridgeJdbcDriver].getName))
  }

  /** Bridge ONLY when executors run in separate JVMs. The bridge exists
    * to carry executor-side JDBC calls into the driver JVM's embedded
    * database; under a single-JVM master (`local[N]`) the executors SEE
    * that database directly, and routing every JDBC call through the
    * per-call reflective TCP loop is pure overhead — measured 0.13 s →
    * 21.6 s on the q_jdbc_roundtrip bench row when it was
    * unconditionally bridged (plans/BENCHNOTES.md r16). The test is
    * INVERTED from an allowlist (r16 ADVICE): only masters known
    * single-JVM (`local[N]` but not `local-cluster`) take the direct
    * path; every other master — including schemes this code has never
    * heard of — gets the bridge, so an unknown multi-JVM master
    * degrades to slow-but-correct instead of silently writing into
    * per-executor in-memory databases.
    */
  def ensureFor(spark: org.apache.spark.sql.SparkSession, targetUrl: String,
                directDriver: String): (String, Map[String, String]) = {
    val m = spark.sparkContext.master
    val singleJvm = m.startsWith("local") && !m.startsWith("local-cluster")
    if (singleJvm) (targetUrl, Map("driver" -> directDriver))
    else ensure(targetUrl)
  }

  // ------------------------------ client ------------------------------

  /** one socket session; a JDBC connection is single-threaded by
    * contract, but Spark closes statements from cleanup paths — the
    * lock keeps request/response frames paired.
    */
  private[sources] final class Session(host: String, port: Int) {
    private val sock = new Socket(host, port)
    private val out = new ObjectOutputStream(sock.getOutputStream)
    out.flush()
    private val in = new ObjectInputStream(sock.getInputStream)

    def call(objId: Long, method: String, paramTypes: Array[String],
             args: Array[AnyRef]): AnyRef = this.synchronized {
      out.writeObject(Call(objId, method, paramTypes, args))
      out.flush()
      out.reset()
      in.readObject() match {
        case Value(v)       => v
        case h: Handle      => proxy(h)
        case Fail(t)        => throw t
        case other          => throw new java.sql.SQLException(
          s"bridge protocol violation: $other")
      }
    }

    def proxy(h: Handle): AnyRef = {
      val ifaces = h.ifaces.map(Class.forName(_))
      Proxy.newProxyInstance(getClass.getClassLoader, ifaces,
        new BridgeHandler(this, h.id))
    }

    def shutdown(): Unit = this.synchronized {
      try sock.close() catch { case _: Throwable => () }
    }
  }

  private final class BridgeHandler(session: Session, objId: Long)
      extends InvocationHandler {
    override def invoke(proxy: AnyRef, method: Method,
                        args: Array[AnyRef]): AnyRef = {
      method.getName match {
        case "hashCode" if method.getParameterCount == 0 =>
          Integer.valueOf(System.identityHashCode(proxy))
        case "equals" if method.getParameterCount == 1 =>
          java.lang.Boolean.valueOf(proxy eq args(0))
        case "toString" if method.getParameterCount == 0 =>
          s"graft-jdbc-bridge handle $objId"
        case name =>
          val r = session.call(objId, name,
            method.getParameterTypes.map(_.getName),
            if (args == null) Array.empty else args)
          // closing the CONNECTION ends the session: the server's socket
          // cleanup closes everything registered under it
          if (name == "close" &&
            proxy.isInstanceOf[java.sql.Connection]) session.shutdown()
          r
      }
    }
  }
}

/** The client-side `java.sql.Driver` for [[JdbcBridge]] URLs
  * (`jdbc:graftbridge://host:port`). Spark's `DriverRegistry`
  * instantiates this class by name from the `driver` option and wraps
  * it, so no static DriverManager registration is required on
  * executors; the no-arg constructor is the whole contract.
  */
final class BridgeJdbcDriver extends java.sql.Driver {
  import JdbcBridge.UrlPrefix

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(UrlPrefix)

  override def connect(url: String,
                       info: java.util.Properties): java.sql.Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: not ours
    val hostPort = url.stripPrefix(UrlPrefix).takeWhile(_ != '/')
    val (host, port) = hostPort.splitAt(hostPort.lastIndexOf(':'))
    val session = new JdbcBridge.Session(host, port.drop(1).toInt)
    session.call(0L, "connect", Array.empty, Array.empty)
      .asInstanceOf[java.sql.Connection]
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: java.util.Properties)
      : Array[java.sql.DriverPropertyInfo] = Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
