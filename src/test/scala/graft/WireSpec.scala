package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Drives the PG wire server over a real socket with a minimal v3-protocol
  * client (the same dance psql's simple-query path performs). */
class WireSpec extends SparkSpecBase {

  /** minimal psql-like client */
  private class Client(port: Int) {
    val sock = new Socket("127.0.0.1", port)
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)

    def startup(): Unit = {
      val params = "user\u0000graft\u0000database\u0000graft\u0000\u0000".getBytes(UTF_8)
      out.writeInt(8 + params.length)
      out.writeInt(196608)
      out.write(params)
      out.flush()
      drainUntilReady()
    }

    def query(sql: String): Seq[(Char, Array[Byte])] = {
      val b = sql.getBytes(UTF_8)
      out.writeByte('Q')
      out.writeInt(4 + b.length + 1)
      out.write(b)
      out.writeByte(0)
      out.flush()
      drainUntilReady()
    }

    def drainUntilReady(): Seq[(Char, Array[Byte])] = {
      val msgs = Seq.newBuilder[(Char, Array[Byte])]
      var done = false
      while (!done) {
        val tpe = in.read().toChar
        val len = in.readInt()
        val body = new Array[Byte](len - 4)
        in.readFully(body)
        msgs += ((tpe, body))
        if (tpe == 'Z') done = true
      }
      msgs.result()
    }

    def close(): Unit = { out.writeByte('X'); out.writeInt(4); out.flush(); sock.close() }
  }

  private def dataRowValues(body: Array[Byte]): Seq[String] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val n = in.readShort()
    (0 until n).map { _ =>
      val len = in.readInt()
      if (len < 0) null
      else {
        val b = new Array[Byte](len); in.readFully(b); new String(b, UTF_8)
      }
    }
  }

  private lazy val store =
    new Store(spark, java.nio.file.Files.createTempDirectory("graft-wire").toString)

  private lazy val server: (PgWireServer, Int) = {
    Tables.registerAll(spark, sfDir)
    val s = new PgWireServer(spark, store, 0)
    (s, s.start())
  }

  test("startup handshake: auth ok, parameter status, ready") {
    val c = new Client(server._2)
    val params = "user\u0000graft\u0000database\u0000graft\u0000\u0000".getBytes(UTF_8)
    c.out.writeInt(8 + params.length); c.out.writeInt(196608); c.out.write(params); c.out.flush()
    val msgs = c.drainUntilReady()
    assert(msgs.map(_._1).startsWith(Seq('R')))
    assert(msgs.count(_._1 == 'S') >= 4)
    assert(msgs.exists(_._1 == 'K'))
    assert(msgs.last._1 == 'Z')
    c.close()
  }

  /** StartupMessage parameter block: NUL-terminated k/v pairs + final NUL. */
  private def startupParams(pairs: (String, String)*): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    pairs.foreach { case (k, v) =>
      bb.write(k.getBytes(UTF_8)); bb.write(0)
      bb.write(v.getBytes(UTF_8)); bb.write(0)
    }
    bb.write(0)
    bb.toByteArray
  }

  test("startup rejects a wrong database with 3D000 before auth") {
    val c = new Client(server._2)
    val params = "user\u0000graft\u0000database\u0000nosuchdb\u0000\u0000".getBytes(UTF_8)
    c.out.writeInt(8 + params.length); c.out.writeInt(196608); c.out.write(params); c.out.flush()
    val msgs = c.drainUntilReady()
    // ErrorResponse instead of AuthenticationOk, then ReadyForQuery
    assert(msgs.map(_._1) == Seq('E', 'Z'))
    val err = new String(msgs.head._2, UTF_8)
    assert(err.contains("3D000"), s"expected SQLSTATE 3D000 in $err")
    assert(err.contains("nosuchdb does not exist"))
    c.sock.close()
  }

  test("startup enforces a configured user; system user always connects") {
    val st = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-wire-auth").toString)
    val s = new PgWireServer(spark, st, 0, user = "alice")
    val port = s.start()
    try {
      def attempt(u: String): Seq[(Char, Array[Byte])] = {
        val c = new Client(port)
        val params = ("user\u0000" + u + "\u0000database\u0000graft\u0000\u0000").getBytes(UTF_8)
        c.out.writeInt(8 + params.length); c.out.writeInt(196608); c.out.write(params); c.out.flush()
        val msgs = c.drainUntilReady()
        c.sock.close()
        msgs
      }
      val bad = attempt("bob")
      assert(bad.map(_._1) == Seq('E', 'Z'))
      val err = new String(bad.head._2, UTF_8)
      assert(err.contains("28000") && err.contains("role \"bob\" does not exist"))
      // the configured user and the system auth user both get AuthenticationOk
      assert(attempt("alice").map(_._1).startsWith(Seq('R')))
      assert(attempt(PgWireServer.SystemAuthUser).map(_._1).startsWith(Seq('R')))
    } finally s.stop()
  }

  test("startup without a database parameter defaults it to the user name") {
    val c = new Client(server._2)
    val params = startupParams("user" -> "graft") // protocol: db defaults to user
    c.out.writeInt(8 + params.length); c.out.writeInt(196608); c.out.write(params); c.out.flush()
    val msgs = c.drainUntilReady()
    assert(msgs.map(_._1).startsWith(Seq('R')), "expected AuthenticationOk")
    c.close()
  }

  test("binary numeric and name params decode by declared OID") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def bb(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def cstr(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    // $1 numeric (1700) binary: 123.45 = base-1e4 digits [123, 4500],
    // weight 0, sign +, dscale 2; $2 name (19): binary == text bytes
    send('P', bb(cstr("np"),
      cstr("SELECT $1 AS n, $2 AS who"),
      i16(2), i32(1700), i32(19)))
    send('B', bb(cstr("npp"), cstr("np"),
      i16(1), i16(1),
      i16(2),
      i32(12), i16(2), i16(0), i16(0), i16(2), i16(123), i16(4500),
      i32(4), "abcd".getBytes(UTF_8),
      i16(0)))
    send('D', bb(Array('P'.toByte), cstr("npp")))
    send('E', bb(cstr("npp"), i32(0)))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    val row = dataRowValues(msgs.find(_._1 == 'D').get._2)
    assert(row == Seq("123.45", "abcd"), row)
    c.close()
  }

  test("simple query returns row description, rows, command tag") {
    val c = new Client(server._2); c.startup()
    val msgs = c.query("SELECT 1 AS one, 't'::bool AS flag, 'x' AS s")
    val types = msgs.map(_._1)
    assert(types.containsSlice(Seq('T', 'D', 'C')))
    val row = dataRowValues(msgs.find(_._1 == 'D').get._2)
    assert(row == Seq("1", "t", "x"))
    val tag = new String(msgs.find(_._1 == 'C').get._2, UTF_8).stripSuffix("\u0000")
    assert(tag == "SELECT 1")
    c.close()
  }

  test("query against real tables via dialect translation") {
    val c = new Client(server._2); c.startup()
    val msgs = c.query(
      "SELECT n_name FROM nation WHERE n_name ~ 'NATION_1$' ORDER BY n_name")
    val rows = msgs.filter(_._1 == 'D').map(m => dataRowValues(m._2))
    assert(rows == Seq(Seq("NATION_1")))
    c.close()
  }

  test("multi-statement, SET, SHOW and error handling") {
    val c = new Client(server._2); c.startup()
    val msgs = c.query("SET timezone = 'UTC'; SHOW server_version")
    val tags = msgs.filter(_._1 == 'C')
      .map(m => new String(m._2, UTF_8).stripSuffix("\u0000"))
    assert(tags.head == "SET")
    // TimeZone is GUC_REPORT: the SET must push a ParameterStatus
    assert(msgs.exists(m => m._1 == 'S' &&
      new String(m._2, UTF_8).startsWith("TimeZone")))
    val row = dataRowValues(msgs.find(_._1 == 'D').get._2)
    assert(row == Seq("17.0"))

    // RESET is GUC_REPORT too: restores UTC and reports it
    c.query("SET timezone = 'America/New_York'")
    val reset = c.query("RESET timezone")
    assert(reset.filter(_._1 == 'C')
      .exists(m => new String(m._2, UTF_8).stripSuffix("\u0000") == "RESET"))
    assert(reset.exists(m => m._1 == 'S' &&
      new String(m._2, UTF_8).startsWith("TimeZone\u0000UTC")))

    val err = c.query("INSERT INTO t VALUES (1)")
    assert(err.exists(_._1 == 'E'))
    assert(err.last._1 == 'Z') // server recovers
    val again = c.query("SELECT 2 AS two")
    assert(dataRowValues(again.find(_._1 == 'D').get._2) == Seq("2"))
    c.close()
  }

  test("timestamp and array text encoding") {
    val c = new Client(server._2); c.startup()
    val msgs = c.query(
      "SELECT TIMESTAMP '2024-01-02 03:04:05' AS ts, array(1, 2, 3) AS arr")
    val row = dataRowValues(msgs.find(_._1 == 'D').get._2)
    assert(row(0) == "2024-01-02 03:04:05")
    assert(row(1) == "{1,2,3}")
    c.close()
  }

  test("extended protocol: parse/bind/describe/execute/sync with text and binary params") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def bb(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()

    // Parse: named statement with $1 (text) and $2 (binary int4)
    send('P', bb(cstr("st1"),
      cstr("SELECT n_name FROM nation WHERE n_name = $1 OR n_nationkey = $2 ORDER BY n_name"),
      i16(0)))
    // Bind: portal p1; param 1 text "NATION_1", param 2 binary int4 = 5
    send('B', bb(cstr("p1"), cstr("st1"),
      i16(2), i16(0), i16(1),        // format codes: text, binary
      i16(2),
      i32(8), "NATION_1".getBytes(UTF_8),
      i32(4), i32(5),
      i16(0)))
    send('D', bb(Array('P'.toByte), cstr("p1")))
    send('E', bb(cstr("p1"), i32(0)))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    val types = msgs.map(_._1)
    assert(types.containsSlice(Seq('1', '2', 'T', 'D')))
    val rows = msgs.filter(_._1 == 'D' ).map(m => dataRowValues(m._2))
    assert(rows == Seq(Seq("NATION_1"), Seq("NATION_5")))
    c.close()
  }

  test("re-executing a prepared statement reuses the cached translation and plan") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def bb(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()

    send('P', bb(cstr("cst"),
      cstr("SELECT n_name FROM nation WHERE n_nationkey = $1"), i16(0)))
    def bindExec(portal: String): Unit = {
      send('B', bb(cstr(portal), cstr("cst"), i16(0),
        i16(1), i32(1), "7".getBytes(UTF_8), i16(0)))
      send('E', bb(cstr(portal), i32(0)))
    }
    bindExec("cp1")
    send('S', Array.emptyByteArray)
    c.out.flush()
    val first = c.drainUntilReady()
    val t1 = PgDialect.translations.get
    val p1 = PgDialect.planBuilds.get
    // same statement, same argument, new portal: full cache hit
    bindExec("cp2")
    send('S', Array.emptyByteArray)
    c.out.flush()
    val second = c.drainUntilReady()
    assert(PgDialect.translations.get == t1,
      "prepared re-execute must not re-translate")
    assert(PgDialect.planBuilds.get == p1,
      "prepared re-execute must not re-analyze")
    assert(second.filter(_._1 == 'D').map(m => dataRowValues(m._2)) ==
      first.filter(_._1 == 'D').map(m => dataRowValues(m._2)))
    c.close()
  }

  test("binary params decode by declared OID: bool, int2, float8, date") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def bb(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def f64(v: Double) = java.nio.ByteBuffer.allocate(8).putDouble(v).array()

    // Parse with declared OIDs: $1 bool(16), $2 int2(21), $3 float8(701),
    // $4 date(1082) — the shapes PgJDBC/psycopg send in binary mode
    send('P', bb(cstr("bp"),
      cstr("SELECT $1::boolean AS b, $2::int + 1 AS n, $3 * 2 AS d, $4::date AS dt"),
      i16(4), i32(16), i32(21), i32(701), i32(1082)))
    // all four params binary: true, 41, 1.25, 2000-01-11 (10 days past epoch)
    send('B', bb(cstr("pb2"), cstr("bp"),
      i16(1), i16(1), // one format code applying to all: binary
      i16(4),
      i32(1), Array[Byte](1),
      i32(2), i16(41),
      i32(8), f64(1.25),
      i32(4), i32(10),
      i16(0)))
    send('D', bb(Array('P'.toByte), cstr("pb2")))
    send('E', bb(cstr("pb2"), i32(0)))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    val row = dataRowValues(msgs.find(_._1 == 'D').get._2)
    assert(row == Seq("t", "42", "2.5", "2000-01-11"), row)
    c.close()
  }

  test("extended protocol: error skips until sync, then recovers") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    send('P', cstr("bad") ++ cstr("SELECT 1; SELECT 2") ++ i16(0)) // multi-statement
    send('B', cstr("pb") ++ cstr("bad") ++ i16(0) ++ i16(0) ++ i16(0))
    send('E', cstr("pb") ++ Array[Byte](0, 0, 0, 0))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    assert(msgs.count(_._1 == 'E') == 1) // one error, B/E skipped
    assert(msgs.last._1 == 'Z')
    val ok = c.query("SELECT 3 AS three")
    assert(dataRowValues(ok.find(_._1 == 'D').get._2) == Seq("3"))
    c.close()
  }

  test("describe statement reports parameter OIDs and row description") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    send('P', cstr("dsc") ++
      cstr("SELECT n_name FROM nation WHERE n_name = $1 OR n_nationkey = $2") ++ i16(0))
    send('D', Array('S'.toByte) ++ cstr("dsc"))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    val pd = msgs.find(_._1 == 't').get._2
    val pin = new DataInputStream(new java.io.ByteArrayInputStream(pd))
    assert(pin.readShort() == 2)
    assert(pin.readInt() == 25 && pin.readInt() == 25)
    assert(msgs.exists(_._1 == 'T'))
    c.close()
  }

  test("describe honors client-declared param OIDs and $n::type casts") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    // $1 declared int8 by the client; $2 undeclared (0) but cast to date;
    // $3 neither -> text fallback
    send('P', cstr("typed") ++
      cstr("SELECT o_orderkey FROM orders WHERE o_orderkey = $1 " +
        "OR o_orderdate < $2::date OR o_orderstatus = $3") ++
      i16(2) ++ i32(20) ++ i32(0))
    send('D', Array('S'.toByte) ++ cstr("typed"))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    val pd = msgs.find(_._1 == 't').get._2
    val pin = new DataInputStream(new java.io.ByteArrayInputStream(pd))
    assert(pin.readShort() == 3)
    assert(pin.readInt() == 20 && pin.readInt() == 1082 && pin.readInt() == 25)
    c.close()
  }

  test("execute with a row limit suspends the portal and resumes") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    send('P', cstr("sus") ++
      cstr("SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5") ++ i16(0))
    send('B', cstr("ps") ++ cstr("sus") ++ i16(0) ++ i16(0) ++ i16(0))
    send('E', cstr("ps") ++ i32(3)) // first portion: 3 rows, then suspend
    send('E', cstr("ps") ++ i32(0)) // resume: drain the remaining 2
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    assert(msgs.count(_._1 == 'D') == 5)
    assert(msgs.exists(_._1 == 's')) // PortalSuspended after the first portion
    val vals = msgs.filter(_._1 == 'D').map(m => dataRowValues(m._2).head)
    assert(vals == Seq("0", "1", "2", "3", "4"))
    val tag = new String(msgs.find(_._1 == 'C').get._2, UTF_8).stripSuffix("\u0000")
    assert(tag == "SELECT 2") // the completing Execute reports its portion
    c.close()
  }

  test("binary result format codes yield big-endian binary DataRows") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    send('P', cstr("bin") ++ cstr("SELECT 7::int4 AS a, 9::int8 AS b, 't'::bool AS c") ++ i16(0))
    // no param formats, no params, ONE result format code = binary for all
    send('B', cstr("pbin") ++ cstr("bin") ++ i16(0) ++ i16(0) ++ i16(1) ++ i16(1))
    send('E', cstr("pbin") ++ i32(0))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    val d = msgs.find(_._1 == 'D').get._2
    val in = new DataInputStream(new java.io.ByteArrayInputStream(d))
    assert(in.readShort() == 3)
    assert(in.readInt() == 4 && in.readInt() == 7)     // int4 binary
    assert(in.readInt() == 8 && in.readLong() == 9L)   // int8 binary
    assert(in.readInt() == 1 && in.readByte() == 1)    // bool binary
    c.close()
  }

  test("binary date/timestamp/numeric results are byte-exact PG encodings") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    send('P', cstr("bdt") ++ cstr(
      "SELECT DATE '2000-01-11' AS d, TIMESTAMP '2000-01-01 00:00:01' AS t, " +
        "123.45 AS n, 0.00 AS z, -7000.1 AS m") ++ i16(0))
    send('B', cstr("pbdt") ++ cstr("bdt") ++ i16(0) ++ i16(0) ++ i16(1) ++ i16(1))
    send('E', cstr("pbdt") ++ i32(0))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    val d = msgs.find(_._1 == 'D').get._2
    val in = new DataInputStream(new java.io.ByteArrayInputStream(d))
    assert(in.readShort() == 5)
    // date: int4 days since 2000-01-01
    assert(in.readInt() == 4 && in.readInt() == 10)
    // timestamp: int8 micros since 2000-01-01 (session tz = UTC)
    assert(in.readInt() == 8 && in.readLong() == 1000000L)
    // numeric 123.45: ndigits 2, weight 0, sign +, dscale 2, digits 123 4500
    assert(in.readInt() == 12)
    assert(Seq.fill(6)(in.readShort().toInt) == Seq(2, 0, 0, 2, 123, 4500))
    // numeric zero with scale: ndigits 0, weight 0, sign +, dscale 2
    assert(in.readInt() == 8)
    assert(Seq.fill(4)(in.readShort().toInt) == Seq(0, 0, 0, 2))
    // numeric -7000.1: digits are point-aligned (7000, 1000), negative sign
    assert(in.readInt() == 12)
    assert(Seq.fill(6)(in.readShort().toInt) == Seq(2, 0, 0x4000, 1, 7000, 1000))
    c.close()
  }

  test("COPY (query) TO STDOUT streams the copy-out subprotocol") {
    val c = new Client(server._2); c.startup()
    val msgs = c.query(
      "COPY (SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 2) " +
        "TO STDOUT WITH (FORMAT CSV, HEADER)")
    assert(msgs.exists(_._1 == 'H')) // CopyOutResponse
    val lines = msgs.filter(_._1 == 'd').map(m => new String(m._2, UTF_8))
    assert(lines == Seq("n_nationkey,n_name\n", "0,NATION_0\n", "1,NATION_1\n"), lines)
    assert(msgs.exists(_._1 == 'c')) // CopyDone
    val tag = new String(msgs.find(_._1 == 'C').get._2, UTF_8).stripSuffix("\u0000")
    assert(tag == "COPY 2")

    // PG default text format: tab delimiter, \N nulls, no header
    val txt = c.query(
      "COPY (SELECT n_nationkey, nullif(n_name, 'NATION_0') FROM nation " +
        "ORDER BY n_nationkey LIMIT 1) TO STDOUT")
    val tl = txt.filter(_._1 == 'd').map(m => new String(m._2, UTF_8))
    assert(tl == Seq("0\t\\N\n"), tl)

    // COPY FROM stays an unsupported write
    val err = c.query("COPY nation FROM STDIN")
    assert(err.exists(_._1 == 'E'))
    c.close()
  }

  test("cancel request with the backend key leaves the session usable") {
    val c = new Client(server._2); c.startup()
    // harvest pid/secret from BackendKeyData
    val c2 = new Client(server._2)
    val params = "user\u0000graft\u0000database\u0000graft\u0000\u0000".getBytes(UTF_8)
    c2.out.writeInt(8 + params.length); c2.out.writeInt(196608); c2.out.write(params); c2.out.flush()
    val k = c2.drainUntilReady().find(_._1 == 'K').get._2
    val kin = new DataInputStream(new java.io.ByteArrayInputStream(k))
    val (pid, secret) = (kin.readInt(), kin.readInt())
    // CancelRequest arrives on a NEW connection, then that socket closes
    val cs = new Socket("127.0.0.1", server._2)
    val cout = new DataOutputStream(cs.getOutputStream)
    cout.writeInt(16); cout.writeInt(80877102); cout.writeInt(pid); cout.writeInt(secret)
    cout.flush()
    assert(cs.getInputStream.read() == -1) // server closes without reply
    cs.close()
    // the cancelled backend and other sessions keep working afterwards
    val again = c2.query("SELECT 5 AS five")
    assert(dataRowValues(again.find(_._1 == 'D').get._2) == Seq("5"))
    c2.close(); c.close()
  }

  test("interval values encode in the reference's months/days/micros style") {
    // NullInterval.String(): "%d months %d days %d microseconds"
    // (response_handler.go:293-298)
    val c = new Client(server._2); c.startup()
    val msgs = c.query(
      "SELECT INTERVAL '2' DAY + INTERVAL '3' HOUR AS dt, INTERVAL '14' MONTH AS ym")
    val row = dataRowValues(msgs.find(_._1 == 'D').get._2)
    assert(row(0) == "0 months 2 days 10800000000 microseconds", row(0))
    assert(row(1) == "14 months 0 days 0 microseconds", row(1))
    c.close()
  }

  test("errors carry PG SQLSTATEs clients branch on") {
    val c = new Client(server._2); c.startup()
    def code(msgs: Seq[(Char, Array[Byte])]): String = {
      val body = msgs.find(_._1 == 'E').get._2
      // fields: 'S' cstr, 'C' cstr, ...
      val s = new String(body, UTF_8)
      val i = s.indexOf('C', s.indexOf(0.toChar))
      s.substring(i + 1, s.indexOf(0.toChar, i))
    }
    assert(code(c.query("SELECT * FROM no_such_table")) == "42P01")
    assert(code(c.query("SELECT no_such_col FROM nation")) == "42703")
    c.close()
  }

  test("concurrent clients interleave without corrupting each other") {
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 4).map { t =>
      new Thread(() => {
        try {
          val c = new Client(server._2); c.startup()
          (1 to 8).foreach { i =>
            val msgs = c.query(s"SELECT ${t * 100 + i} AS v")
            val row = dataRowValues(msgs.find(_._1 == 'D').get._2)
            results.add(row == Seq((t * 100 + i).toString))
          }
          c.close()
        } catch { case _: Throwable => results.add(false) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(results.size == 32 && results.asScala.forall(identity))
  }

  test("end-to-end session: SET, matview lifecycle, query, refresh, drop") {
    val c = new Client(server._2); c.startup()
    def tag(msgs: Seq[(Char, Array[Byte])]): String =
      new String(msgs.find(_._1 == 'C').get._2, UTF_8).takeWhile(_ != 0.toChar)
    assert(tag(c.query("SET statement_timeout = '30s'")) == "SET")
    assert(tag(c.query(
      "CREATE MATERIALIZED VIEW nation_counts AS " +
        "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey"))
      == "CREATE MATERIALIZED VIEW")
    val rows1 = c.query("SELECT sum(n)::int8 AS total FROM nation_counts")
      .filter(_._1 == 'D').map(m => dataRowValues(m._2))
    assert(rows1 == Seq(Seq("25")))
    assert(tag(c.query("REFRESH MATERIALIZED VIEW nation_counts"))
      == "REFRESH MATERIALIZED VIEW")
    assert(tag(c.query("DROP MATERIALIZED VIEW nation_counts"))
      == "DROP MATERIALIZED VIEW")
    val err = c.query("SELECT * FROM nation_counts")
    assert(err.exists(_._1 == 'E'))
    c.close()
  }

  test("ntz timestamps from real parquet tables encode in PG format") {
    val c = new Client(server._2); c.startup()
    val msgs = c.query("SELECT min(o_orderdate) AS d FROM orders")
    val row = dataRowValues(msgs.find(_._1 == 'D').get._2)
    assert(row(0).matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"))
    c.close()
  }

  test("a $1 inside a string literal is not a parameter") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def bb(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def cstr(str: String) = (str + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    send('P', bb(cstr(""),
      cstr("SELECT 'costs $1' AS lit, n_name FROM nation WHERE n_name = $1"),
      i16(0)))
    send('B', bb(cstr(""), cstr(""),
      i16(0), // no param format codes -> all text
      i16(1), i32(8), "NATION_2".getBytes(UTF_8),
      i16(0)))
    send('D', bb(Array('P'.toByte), cstr("")))
    send('E', bb(cstr(""), i32(0)))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    val rows = msgs.filter(_._1 == 'D').map(m => dataRowValues(m._2))
    assert(rows == Seq(Seq("costs $1", "NATION_2")), rows)
    c.close()
  }

  test("binary-format uuid parameter decodes to canonical text") {
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def bb(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def cstr(str: String) = (str + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    val uuid = java.util.UUID.fromString("a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")
    val ubytes = java.nio.ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array()
    send('P', bb(cstr(""), cstr("SELECT $1::uuid AS u"), i16(0)))
    send('B', bb(cstr(""), cstr(""),
      i16(1), i16(1), // one format code: binary
      i16(1), i32(16), ubytes,
      i16(0)))
    send('D', bb(Array('P'.toByte), cstr("")))
    send('E', bb(cstr(""), i32(0)))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    val rows = msgs.filter(_._1 == 'D').map(m => dataRowValues(m._2))
    assert(rows == Seq(Seq("a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")), rows)
    c.close()
  }

  test("cursors: DECLARE / FETCH n / MOVE / FETCH ALL / CLOSE") {
    val c = new Client(server._2); c.startup()
    def tag(ms: Seq[(Char, Array[Byte])]): String =
      new String(ms.find(_._1 == 'C').get._2, UTF_8).stripSuffix("\u0000")
    assert(tag(c.query(
      "DECLARE cur CURSOR FOR SELECT n_nationkey FROM nation ORDER BY n_nationkey"))
      == "DECLARE CURSOR")
    val f1 = c.query("FETCH 2 FROM cur")
    assert(f1.map(_._1).containsSlice(Seq('T', 'D', 'D', 'C')))
    assert(f1.filter(_._1 == 'D').map(m => dataRowValues(m._2))
      == Seq(Seq("0"), Seq("1")))
    assert(tag(f1) == "FETCH 2")
    // MOVE advances without emitting rows
    val mv = c.query("MOVE 1 FROM cur")
    assert(mv.count(_._1 == 'D') == 0 && tag(mv) == "MOVE 1")
    val rest = c.query("FETCH ALL FROM cur")
    val vals = rest.filter(_._1 == 'D').map(m => dataRowValues(m._2).head)
    // 25 nations: 0,1 fetched, 2 skipped by MOVE -> 3..24 remain
    assert(vals.take(2) == Seq("3", "4") && vals.size == 22, vals)
    assert(tag(c.query("CLOSE cur")) == "CLOSE CURSOR")
    // fetching a closed cursor errors like PG
    assert(c.query("FETCH 1 FROM cur").exists(_._1 == 'E'))
    c.close()
  }

  test("pg_stat_statements tracks calls, rows and time over the socket") {
    val c = new Client(server._2); c.startup()
    c.query("SELECT pg_stat_statements_reset()")
    val probe = "SELECT n_nationkey FROM nation WHERE n_nationkey < 7 ORDER BY n_nationkey"
    c.query(probe); c.query(probe) // two executions of the same statement
    val msgs = c.query(
      """SELECT calls, rows, mean_exec_time > 0 AS timed FROM pg_stat_statements
         WHERE query LIKE '%n_nationkey < 7%' AND query NOT LIKE '%pg_stat%'""")
    val rows = msgs.filter(_._1 == 'D').map(m => dataRowValues(m._2))
    assert(rows == Seq(Seq("2", "14", "t")), rows)
    // reset zeroes the view
    c.query("SELECT pg_stat_statements_reset()")
    val after = c.query(
      "SELECT count(*) AS n FROM pg_stat_statements WHERE query NOT LIKE '%pg_stat%'")
    assert(after.filter(_._1 == 'D').map(m => dataRowValues(m._2).head) == Seq("0"))
    c.close()
  }

  test("time travel works through the extended protocol") {
    import spark.implicits._
    store.replace("wire_tt", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val snap = store.currentVersion("wire_tt")
    store.upsert("wire_tt", Seq((2L, "B2")).toDF("k", "v"), "k")
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def bb(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def cstr(str: String) = (str + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    send('P', bb(cstr(""),
      cstr(s"SELECT v FROM wire_tt FOR VERSION AS OF $snap WHERE k = 2"), i16(0)))
    send('B', bb(cstr(""), cstr(""), i16(0), i16(0), i16(0)))
    send('E', bb(cstr(""), i32(0)))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    val vals = msgs.filter(_._1 == 'D').map(m => dataRowValues(m._2).head)
    assert(vals == Seq("b"), s"snapshot read over extended protocol got $vals")
    c.close()
  }

  test("sql-level PREPARE / EXECUTE / DEALLOCATE share the statement map") {
    val c = new Client(server._2); c.startup()
    def tag(ms: Seq[(Char, Array[Byte])]): String =
      new String(ms.find(_._1 == 'C').get._2, UTF_8).stripSuffix("\u0000")
    assert(tag(c.query(
      "PREPARE nat (int, text) AS SELECT n_name FROM nation WHERE n_nationkey = $1 OR n_name = $2"))
      == "PREPARE")
    val r1 = c.query("EXECUTE nat(3, 'NATION_7')")
    assert(r1.filter(_._1 == 'D').map(m => dataRowValues(m._2).head).sorted
      == Seq("NATION_3", "NATION_7"))
    // string literal with an embedded quote survives the round trip
    assert(tag(c.query("PREPARE one AS SELECT $1 AS v")) == "PREPARE")
    val r2 = c.query("EXECUTE one('it''s')")
    assert(r2.filter(_._1 == 'D').map(m => dataRowValues(m._2).head) == Seq("it's"))
    // duplicate name errors like PG; DEALLOCATE frees it
    assert(c.query("PREPARE one AS SELECT 2 AS v").exists(_._1 == 'E'))
    assert(tag(c.query("DEALLOCATE one")) == "DEALLOCATE")
    assert(tag(c.query("PREPARE one AS SELECT 2 AS v")) == "PREPARE")
    // DEALLOCATE ALL clears; executing a freed statement errors
    assert(tag(c.query("DEALLOCATE ALL")) == "DEALLOCATE ALL")
    assert(c.query("EXECUTE nat(1, 'x')").exists(_._1 == 'E'))
    c.close()
  }

  test("a synced store table is queryable over the wire and in pg_tables") {
    import spark.implicits._
    val port = server._2
    // the syncer write path: a full refresh into the server's store
    store.replace("wire_synced", (1L to 40L).map(k => (k, s"row$k")).toDF("id", "payload"))
    val c = new Client(port)
    c.startup()
    val rows = c.query("SELECT count(*) AS n, max(id) AS m FROM wire_synced")
      .filter(_._1 == 'D').map(b => dataRowValues(b._2))
    assert(rows == Seq(Seq("40", "40")))
    // catalog probes see it (pg_tables refresh runs on catalog probes)
    val cat = c.query(
      "SELECT tablename FROM pg_tables WHERE tablename = 'wire_synced'")
      .filter(_._1 == 'D').map(b => dataRowValues(b._2))
    assert(cat == Seq(Seq("wire_synced")))
    c.close()
  }

  /** RowDescription field OIDs from a 'T' message body. */
  private def rowDescriptionOids(body: Array[Byte]): Seq[Int] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val n = in.readShort()
    (0 until n.toInt).map { _ =>
      while (in.readByte() != 0) {} // cstring field name
      in.readInt(); in.readShort()
      val oid = in.readInt()
      in.readShort(); in.readInt(); in.readShort()
      oid
    }
  }

  test("golden corpus subset: RowDescription type OIDs over a real socket") {
    // the reference's own test suite pins every column's DataTypeOID
    // (query_handler_test.go "types"); CompatSpec asserts all 261 through
    // the encoder — this replays a 30-query sample END-TO-END over the
    // socket so the bytes on the wire are the thing checked
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/golden_expected.json")))
    val cases = root.fields.asScala.collect {
      case e if e.getValue.has("types") &&
          !e.getKey.toLowerCase.contains("test_table") =>
        e.getKey -> e.getValue.get("types").elements.asScala
          .map(_.asText.toInt).toSeq
    }.toSeq.sortBy(_._1).take(30)
    assert(cases.size == 30)
    val c = new Client(server._2); c.startup()
    cases.foreach { case (sql, want) =>
      val msgs = c.query(sql.linesIterator.mkString(" "))
      val t = msgs.find(_._1 == 'T')
      assert(t.isDefined, s"no RowDescription for: ${sql.take(100)}")
      // the reference harness prefix-compares types (its loop ranges over
      // the expected list), so match the same semantics
      val got = rowDescriptionOids(t.get._2).take(want.length)
      assert(got == want, s"${sql.take(100)}: got $got want $want")
    }
    c.close()
  }

  test("extended protocol runs DML via command portals (JDBC executeUpdate)") {
    import spark.implicits._
    store.replace("xdml_t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val c = new Client(server._2); c.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def bb(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()

    // INSERT with a $1 parameter — the JDBC executeUpdate shape
    send('P', bb(cstr("ins"), cstr("INSERT INTO xdml_t VALUES (3, $1)"), i16(0)))
    send('B', bb(cstr("pi"), cstr("ins"), i16(0),
      i16(1), i32(1), "c".getBytes(UTF_8), i16(0)))
    send('D', bb(Array('P'.toByte), cstr("pi"))) // Describe -> NoData
    send('E', bb(cstr("pi"), i32(0)))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val msgs = c.drainUntilReady()
    assert(msgs.map(_._1).containsSlice(Seq('1', '2', 'n', 'C')), msgs.map(_._1))
    val tag = new String(msgs.find(_._1 == 'C').get._2, UTF_8).stripSuffix("\u0000")
    assert(tag == "INSERT 0 1", tag)
    // re-Execute of the drained command portal must NOT re-run the write
    send('E', bb(cstr("pi"), i32(0)))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val replay = c.drainUntilReady()
    assert(new String(replay.find(_._1 == 'C').get._2, UTF_8)
      .stripSuffix("\u0000") == "INSERT 0 1")

    // UPDATE … RETURNING through the extended protocol streams rows + tag
    send('P', bb(cstr("upd"),
      cstr("UPDATE xdml_t SET v = upper(v) WHERE k <= 2 RETURNING k, v"), i16(0)))
    send('B', bb(cstr("pu"), cstr("upd"), i16(0), i16(0), i16(0)))
    send('E', bb(cstr("pu"), i32(0)))
    send('S', Array.emptyByteArray)
    c.out.flush()
    val umsgs = c.drainUntilReady()
    val urows = umsgs.filter(_._1 == 'D').map(m => dataRowValues(m._2))
    assert(urows == Seq(Seq("1", "A"), Seq("2", "B")), urows)
    assert(new String(umsgs.find(_._1 == 'C').get._2, UTF_8)
      .stripSuffix("\u0000") == "UPDATE 2")

    val check = c.query("SELECT k, v FROM xdml_t ORDER BY k")
    assert(check.filter(_._1 == 'D').map(m => dataRowValues(m._2)) ==
      Seq(Seq("1", "A"), Seq("2", "B"), Seq("3", "c")))
    c.close()
  }

  test("uncommitted writes are invisible to other connections until COMMIT") {
    val c1 = new Client(server._2); c1.startup()
    val c2 = new Client(server._2); c2.startup()
    def count(c: Client, sql: String): Long = {
      val rows = c.query(sql).filter(_._1 == 'D')
      assert(rows.size == 1, s"expected one row from $sql")
      dataRowValues(rows.head._2).head.toLong
    }
    try {
      c1.query("CREATE TABLE txv_t (k bigint, v text)")
      c1.query("INSERT INTO txv_t VALUES (1, 'a')")
      c1.query("BEGIN")
      c1.query("INSERT INTO txv_t VALUES (2, 'b')")
      // the txn sees its own staged write…
      assert(count(c1, "SELECT count(*) AS n FROM txv_t") == 2L,
        "a txn must see its own uncommitted writes")
      // …but NO other connection does — PG never permits dirty reads at
      // any isolation level (this was the old model's structural gap:
      // per-statement publishing leaked uncommitted rows)
      assert(count(c2, "SELECT count(*) AS n FROM txv_t") == 1L,
        "an open txn's INSERT must be invisible to other connections")
      c1.query("COMMIT")
      assert(count(c2, "SELECT count(*) AS n FROM txv_t") == 2L,
        "COMMIT publishes atomically")
      // ROLLBACK: the staged delete evaporates without ever being seen —
      // and the concurrent commit below can never make it throw (staged
      // dirs are private; nothing shared needs restoring)
      c1.query("BEGIN")
      c1.query("DELETE FROM txv_t WHERE k = 1")
      assert(count(c1, "SELECT count(*) AS n FROM txv_t") == 1L)
      assert(count(c2, "SELECT count(*) AS n FROM txv_t") == 2L,
        "an open txn's DELETE must be invisible to other connections")
      // a concurrent commit on ANOTHER table while the txn is open
      c2.query("CREATE TABLE txv_u (k bigint)")
      c2.query("INSERT INTO txv_u VALUES (1)")
      val rb = c1.query("ROLLBACK")
      assert(rb.exists(m => m._1 == 'C' &&
        new String(m._2, UTF_8).startsWith("ROLLBACK")),
        "ROLLBACK must succeed under concurrent commits, never error")
      assert(count(c2, "SELECT count(*) AS n FROM txv_t") == 2L)
      assert(count(c1, "SELECT count(*) AS n FROM txv_t") == 2L)
      c1.query("DROP TABLE txv_t"); c2.query("DROP TABLE txv_u")
    } finally { c1.close(); c2.close() }
  }

  test("a second writer queues on the txn write gate and proceeds after COMMIT") {
    val c1 = new Client(server._2); c1.startup()
    val c2 = new Client(server._2); c2.startup()
    try {
      c1.query("CREATE TABLE gate_t (k bigint, v text)")
      c1.query("INSERT INTO gate_t VALUES (1, 'orig')")
      c1.query("BEGIN")
      c1.query("UPDATE gate_t SET v = 'mine' WHERE k = 1") // claims the gate
      // a second connection's autocommit write QUEUES (PG sessions queue
      // on row locks the same way) instead of interleaving or aborting
      @volatile var done = false
      @volatile var err: Throwable = null
      val t = new Thread(() => {
        try { c2.query("UPDATE gate_t SET v = 'late' WHERE k = 1"); done = true }
        catch { case x: Throwable => err = x }
      })
      t.start()
      Thread.sleep(700)
      assert(!done && err == null,
        "the second writer must block while the txn holds the gate")
      c1.query("COMMIT")
      t.join(30000)
      assert(done && err == null, s"queued writer must proceed after COMMIT: $err")
      val rows = c1.query("SELECT v FROM gate_t WHERE k = 1").filter(_._1 == 'D')
      assert(dataRowValues(rows.head._2).head == "late",
        "the queued write applies AFTER the committed one, PG lock order")
      c1.query("DROP TABLE gate_t")
    } finally { c1.close(); c2.close() }
  }

  test("concurrent INSERT-only txns on one table both COMMIT (no serialization error)") {
    val c1 = new Client(server._2); c1.startup()
    val c2 = new Client(server._2); c2.startup()
    val rr = new Client(server._2); rr.startup()
    def count(c: Client): Long = {
      val rows = c.query("SELECT count(*) AS n FROM cins_t").filter(_._1 == 'D')
      dataRowValues(rows.head._2).head.toLong
    }
    def ok(c: Client, sql: String): Unit = {
      val msgs = c.query(sql)
      val err = msgs.find(_._1 == 'E').map(m => new String(m._2, UTF_8))
      assert(err.isEmpty, s"'$sql' must not error: $err")
    }
    try {
      ok(c1, "CREATE TABLE cins_t (k bigint, v text)")
      ok(c1, "INSERT INTO cins_t VALUES (0, 'base')")
      // an RR reader pins BEFORE either insert txn commits
      ok(rr, "BEGIN ISOLATION LEVEL REPEATABLE READ")
      assert(count(rr) == 1L) // pin
      // both sockets open txns and INSERT into the SAME table — PG's
      // row-level locking lets both proceed; neither blocks nor aborts
      ok(c1, "BEGIN"); ok(c2, "BEGIN")
      ok(c1, "INSERT INTO cins_t VALUES (1, 'a'), (2, 'a')")
      ok(c2, "INSERT INTO cins_t VALUES (3, 'b')")
      ok(c1, "COMMIT")
      ok(c2, "COMMIT") // base moved: merge commit, NOT 40001
      assert(count(c1) == 4L, "both txns' rows must survive the merge")
      val ks = c1.query("SELECT k FROM cins_t ORDER BY k").filter(_._1 == 'D')
        .map(m => dataRowValues(m._2).head)
      assert(ks == Seq("0", "1", "2", "3"), ks)
      // the pinned RR reader still sees NEITHER insert
      assert(count(rr) == 1L,
        "an RR txn pinned before both commits must see neither")
      ok(rr, "COMMIT")
      assert(count(rr) == 4L)
      ok(c1, "DROP TABLE cins_t")
    } finally { c1.close(); c2.close(); rr.close() }
  }

  test("exported snapshot adopted ACROSS connections pins both to one version") {
    val leader = new Client(server._2); leader.startup()
    val worker = new Client(server._2); worker.startup()
    def one(c: Client, sql: String): String = {
      val rows = c.query(sql).filter(_._1 == 'D')
      assert(rows.size == 1, s"expected one row from $sql")
      dataRowValues(rows.head._2).head
    }
    try {
      leader.query("CREATE TABLE snapw_t (k bigint)")
      leader.query("INSERT INTO snapw_t VALUES (1), (2), (3)")
      // the leader opens a txn, pins, and exports its snapshot — the
      // pg_dump -j leader/worker handshake over real sockets
      leader.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
      assert(one(leader, "SELECT count(*) AS n FROM snapw_t") == "3")
      val id = one(leader, "SELECT pg_export_snapshot()")
      // a third connection commits more rows AFTER the export
      val writer = new Client(server._2); writer.startup()
      writer.query("INSERT INTO snapw_t VALUES (4)")
      writer.close()
      // the worker adopts the exported snapshot: both connections now read
      // the SAME pinned version, whatever committed since
      worker.query("BEGIN")
      worker.query(s"SET TRANSACTION SNAPSHOT '$id'")
      assert(one(worker, "SELECT count(*) AS n FROM snapw_t") == "3",
        "the adopting connection must read the exported version")
      assert(one(leader, "SELECT count(*) AS n FROM snapw_t") == "3",
        "the exporting connection keeps its pin")
      worker.query("COMMIT"); leader.query("COMMIT")
      assert(one(leader, "SELECT count(*) AS n FROM snapw_t") == "4")
      leader.query("DROP TABLE snapw_t")
    } finally { leader.close(); worker.close() }
  }

  test("fat COPY streams as bounded partition-batched jobs, never truncating") {
    val c = new Client(server._2); c.startup()
    val srv = server._1
    val (m0, t0, j0) =
      (srv.copyParallelMinBytes, srv.copyTaskBytes, srv.copyJobBytes)
    try {
      c.query("CREATE TABLE fatcopy_t AS SELECT g AS k, 'v' || g AS v " +
        "FROM generate_series(1, 5000) g")
      // shrink the thresholds so this small table exercises the SAME
      // partition-batched multi-job path a 100 GB export takes (one job
      // collecting everything trips spark.driver.maxResultSize and
      // silently truncates — the SF10 bug this pins)
      srv.copyParallelMinBytes = 1L
      srv.copyTaskBytes = 4096L
      srv.copyJobBytes = 8192L
      val msgs = c.query("COPY (SELECT * FROM fatcopy_t) TO STDOUT")
      val rows = msgs.count(_._1 == 'd')
      assert(rows == 5000, s"batched COPY must deliver every row: $rows")
      val tag = msgs.reverse.collectFirst {
        case ('C', b) => new String(b, UTF_8).takeWhile(_ != '\u0000') }
      assert(tag.contains("COPY 5000"), s"tag: $tag")
      // content integrity across the batch boundaries: ids must cover the
      // full range exactly once
      val ids = msgs.filter(_._1 == 'd').map(m =>
        new String(m._2, UTF_8).split("\t")(0).trim.toLong).sorted
      assert(ids == (1L to 5000L), "no row may duplicate or vanish")
      c.query("DROP TABLE fatcopy_t")
    } finally {
      srv.copyParallelMinBytes = m0; srv.copyTaskBytes = t0; srv.copyJobBytes = j0
      c.close()
    }
  }

  test("COPY of a many-to-many expansion (output >> leaf bytes) delivers every row") {
    val c = new Client(server._2); c.startup()
    val srv = server._1
    val (m0, t0, j0) =
      (srv.copyParallelMinBytes, srv.copyTaskBytes, srv.copyJobBytes)
    try {
      // tiny leaves, huge output: a 200x200 cross join expands far past the
      // 8x leaf cap that partition sizing uses for fat/small classification
      // — the sizing floor (raw plan estimate, 64x-capped) must keep each
      // task's framed text bounded so no job result crosses the driver
      // ceiling (the advice-flagged explode/many-to-many cliff)
      c.query("CREATE TABLE xa_t AS SELECT g AS k, repeat('x', 100) AS pad " +
        "FROM generate_series(1, 200) g")
      srv.copyParallelMinBytes = 1L
      srv.copyTaskBytes = 4096L
      srv.copyJobBytes = 8192L
      val msgs = c.query(
        "COPY (SELECT a.k AS ka, b.k AS kb, a.pad FROM xa_t a, xa_t b) TO STDOUT")
      val rows = msgs.count(_._1 == 'd')
      assert(rows == 40000, s"expansion COPY must deliver every row: $rows")
      // every (ka, kb) pair exactly once
      val pairs = msgs.filter(_._1 == 'd').map { m =>
        val f = new String(m._2, UTF_8).split("\t"); (f(0).toInt, f(1).toInt) }
      assert(pairs.distinct.length == 40000, "pairs must not duplicate")
      c.query("DROP TABLE xa_t")
    } finally {
      srv.copyParallelMinBytes = m0; srv.copyTaskBytes = t0; srv.copyJobBytes = j0
      c.close()
    }
  }

  test("fat plain SELECT drains executor-parallel; ORDER BY (even under FETCH) stays ordered") {
    val c = new Client(server._2); c.startup()
    val srv = server._1
    val (m0, t0, j0) =
      (srv.copyParallelMinBytes, srv.copyTaskBytes, srv.copyJobBytes)
    try {
      c.query("CREATE TABLE fatsel_t AS SELECT g AS k, 'v' || g AS v " +
        "FROM generate_series(1, 5000) g")
      // shrink the thresholds so this table takes the SAME chunked path a
      // fat BI-tool SELECT takes
      srv.copyParallelMinBytes = 1L
      srv.copyTaskBytes = 4096L
      srv.copyJobBytes = 8192L
      // unordered: the parallel pump may emit any order, but every row
      // exactly once, and the tag must count them all
      val msgs = c.query("SELECT * FROM fatsel_t")
      val ids = msgs.filter(_._1 == 'D').map(m =>
        dataRowValues(m._2).head.toLong).sorted
      assert(ids == (1L to 5000L), "no row may duplicate or vanish")
      val tag = msgs.reverse.collectFirst {
        case ('C', b) => new String(b, UTF_8).stripSuffix("\u0000") }
      assert(tag.contains("SELECT 5000"), s"tag: $tag")
      // ORDER BY: output must arrive IN ORDER (the sorted stream path)
      val ordered = c.query("SELECT k FROM fatsel_t ORDER BY k DESC")
        .filter(_._1 == 'D').map(m => dataRowValues(m._2).head.toLong)
      assert(ordered == (5000L to 1L by -1L),
        "a big ORDER BY drain must stream range-partition order intact")
      // the detector must see a Sort under a FETCH/LIMIT wrapper too —
      // misclassifying would emit the limited sort out of order
      val fetched = c.query(
        "SELECT k FROM fatsel_t ORDER BY k OFFSET 10 FETCH FIRST 200 ROWS ONLY")
        .filter(_._1 == 'D').map(m => dataRowValues(m._2).head.toLong)
      assert(fetched == (11L to 210L),
        "LIMIT/OFFSET above a Sort must keep the ordered stream path")
      c.query("DROP TABLE fatsel_t")
    } finally {
      srv.copyParallelMinBytes = m0; srv.copyTaskBytes = t0; srv.copyJobBytes = j0
      c.close()
    }
  }

  test("a stalled client draining a fat SELECT must not block other connections") {
    val cA = new Client(server._2); cA.startup()
    val cB = new Client(server._2); cB.startup()
    val srv = server._1
    val (m0, t0, j0) =
      (srv.copyParallelMinBytes, srv.copyTaskBytes, srv.copyJobBytes)
    try {
      cA.query("CREATE TABLE stall_t AS SELECT g AS k, repeat('x', 200) AS v " +
        "FROM generate_series(1, 20000) g")
      srv.copyParallelMinBytes = 1L
      srv.copyTaskBytes = 4096L
      srv.copyJobBytes = 8192L
      // A sends the fat SELECT but READS NOTHING: its kernel socket buffer
      // fills and the server-side write blocks. Before r12 that write ran
      // in the Spark job's RESULT HANDLER — on the DAGScheduler event-loop
      // thread — so one stalled BI client froze job scheduling for every
      // connection. Now the connection thread owns the socket and only
      // memory-bounded buffers sit between job and writer.
      val q = "SELECT * FROM stall_t".getBytes(UTF_8)
      cA.out.writeByte('Q'); cA.out.writeInt(4 + q.length + 1)
      cA.out.write(q); cA.out.writeByte(0); cA.out.flush()
      Thread.sleep(1500) // let the drain start and the socket buffer fill
      // B must still get scheduled and answered promptly
      val t1 = System.nanoTime()
      val msgs = cB.query("SELECT count(*) FROM nation")
      val sec = (System.nanoTime() - t1) / 1e9
      assert(msgs.exists(_._1 == 'D'), "B got no rows")
      assert(sec < 30,
        f"small query took $sec%.1fs behind a stalled drain — scheduler blocked")
      cB.query("DROP TABLE stall_t")
    } finally {
      srv.copyParallelMinBytes = m0; srv.copyTaskBytes = t0; srv.copyJobBytes = j0
      cA.sock.close() // abandon the stalled drain; the server must survive
      cB.close()
    }
  }

  test("join-inflated plan stats must not job-storm the DataRow drain") {
    val c = new Client(server._2); c.startup()
    val srv = server._1
    try {
      // A stat-less multi-join MULTIPLIES cardinality estimates: the raw
      // plan sizeInBytes for this 3-way nation self-join lands in the
      // gigabytes while the result is 25 rows. Before the leaf-bytes cap,
      // that classified the query as a fat export, repartitioned it to
      // 4096 and drained it through 4096 one-task jobs — ~30 s for a
      // sub-second query, times 271 in the golden-corpus audit.
      val joined = spark.sql(
        """SELECT n1.n_name FROM nation n1
          |JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
          |JOIN nation n3 ON n2.n_regionkey = n3.n_regionkey
          |WHERE n2.n_nationkey = n1.n_nationkey
          |  AND n3.n_nationkey = n1.n_nationkey""".stripMargin)
      val raw = joined.queryExecution.optimizedPlan.stats.sizeInBytes
      assume(raw > srv.copyParallelMinBytes,
        s"precondition: the join estimate must be inflated, got $raw")
      assert(srv.estOutBytes(joined) <= srv.copyParallelMinBytes,
        "leaf-bytes cap must route a small-leaf join to the per-row path")
      // and through the socket: right answer, no job storm (the bug spent
      // >=4096 jobs on this; parallel suites may add noise, so the bound
      // is generous but far below the pathological count)
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val rows = c.query(
          "SELECT n1.n_name FROM nation n1 " +
            "JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey " +
            "JOIN nation n3 ON n2.n_regionkey = n3.n_regionkey " +
            "WHERE n2.n_nationkey = n1.n_nationkey " +
            "AND n3.n_nationkey = n1.n_nationkey").filter(_._1 == 'D')
        assert(rows.size == 25, s"got ${rows.size} rows")
        Thread.sleep(200) // listener events are async; a storm posts 1000s
        assert(jobs.get < 1000,
          s"drain ran ${jobs.get} jobs — estimate cap/adaptive batching lost")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally c.close()
  }

  test("an RR writer queued on the gate wakes to a serialization failure, PG-exactly") {
    val c1 = new Client(server._2); c1.startup()
    val c2 = new Client(server._2); c2.startup()
    try {
      c1.query("CREATE TABLE srl_t (k bigint, v text)")
      c1.query("INSERT INTO srl_t VALUES (1, 'a')")
      // c1 pins its snapshot, c2 claims the write gate
      c1.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
      c1.query("SELECT count(*) FROM srl_t") // pin
      c2.query("BEGIN")
      c2.query("UPDATE srl_t SET v = 'theirs' WHERE k = 1") // gate claimed
      // c1's write queues behind the gate on its own thread…
      @volatile var errMsg: String = null
      @volatile var done = false
      val t = new Thread(() => {
        val msgs = c1.query("UPDATE srl_t SET v = 'mine' WHERE k = 1")
        errMsg = msgs.find(_._1 == 'E').map(m => new String(m._2, UTF_8)).orNull
        done = true
      })
      t.start()
      Thread.sleep(600)
      assert(!done, "the RR writer must be queued while the gate is held")
      // …c2 commits, c1 wakes, finds the table moved past its pin: PG's
      // first-updater-wins raises serialization_failure AT THE STATEMENT
      c2.query("COMMIT")
      t.join(30000)
      assert(done, "queued writer must wake after the commit")
      assert(errMsg != null && errMsg.contains("could not serialize access"),
        s"woken RR writer must raise serialization failure, got: $errMsg")
      c1.query("ROLLBACK")
      val rows = c1.query("SELECT v FROM srl_t WHERE k = 1").filter(_._1 == 'D')
      assert(dataRowValues(rows.head._2).head == "theirs",
        "the first updater's committed write wins")
      c1.query("DROP TABLE srl_t")
    } finally { c1.close(); c2.close() }
  }

  test("a writer that cannot get the gate times out with PG's lock-timeout error") {
    val c1 = new Client(server._2); c1.startup()
    val c2 = new Client(server._2); c2.startup()
    val saved = store.gateTimeoutMs
    try {
      c1.query("CREATE TABLE gto_t (k bigint)")
      c1.query("INSERT INTO gto_t VALUES (1)")
      c1.query("BEGIN")
      c1.query("UPDATE gto_t SET k = 2") // claims the gate, never commits
      store.gateTimeoutMs = 300L
      val msgs = c2.query("UPDATE gto_t SET k = 3")
      val err = msgs.find(_._1 == 'E').map(m => new String(m._2, UTF_8))
      assert(err.exists(_.contains("lock timeout")),
        s"blocked writer must fail with the lock-timeout error, got: $err")
      c1.query("ROLLBACK")
      // gate released: the same write now proceeds
      store.gateTimeoutMs = saved
      c2.query("UPDATE gto_t SET k = 3")
      val rows = c2.query("SELECT k FROM gto_t").filter(_._1 == 'D')
      assert(dataRowValues(rows.head._2).head == "3")
      c1.query("DROP TABLE gto_t")
    } finally { store.gateTimeoutMs = saved; c1.close(); c2.close() }
  }

  test("aborted txn refuses statements until ROLLBACK; disconnect rolls back") {
    import spark.implicits._
    store.replace("ab_t", Seq((1L, "a")).toDF("k", "v"))
    val c = new Client(server._2); c.startup()
    c.query("BEGIN")
    c.query("UPDATE ab_t SET v = 'dirty' WHERE k = 1")
    val boom = c.query("SELECT * FROM no_such_table_xyz")
    assert(boom.exists(_._1 == 'E'))
    // aborted: ordinary statements refuse with 25P02
    val refused = c.query("SELECT 1 AS one")
    val err = new String(refused.find(_._1 == 'E').get._2, UTF_8)
    assert(err.contains("25P02") && err.contains("aborted"), err)
    // COMMIT of an aborted txn rolls back (PG reports ROLLBACK)
    val cm = c.query("COMMIT")
    val tag = new String(cm.find(_._1 == 'C').get._2, UTF_8).stripSuffix("\u0000")
    assert(tag == "ROLLBACK", tag)
    val v = c.query("SELECT v FROM ab_t WHERE k = 1")
    assert(v.filter(_._1 == 'D').map(m => dataRowValues(m._2)) == Seq(Seq("a")),
      "aborted txn's write must be undone")

    // disconnect mid-txn: the server rolls the open txn back
    val c2 = new Client(server._2); c2.startup()
    c2.query("BEGIN")
    c2.query("UPDATE ab_t SET v = 'zombie' WHERE k = 1")
    c2.sock.close() // vanish without COMMIT
    val c3 = new Client(server._2); c3.startup()
    val deadline = System.currentTimeMillis() + 10000
    var rolled = false
    while (!rolled && System.currentTimeMillis() < deadline) {
      val got = c3.query("SELECT v FROM ab_t WHERE k = 1")
        .filter(_._1 == 'D').map(m => dataRowValues(m._2))
      rolled = got == Seq(Seq("a"))
      if (!rolled) Thread.sleep(200)
    }
    assert(rolled, "disconnect must roll the open txn back")
    c.close(); c3.close()
  }

  test("statement_timeout cancels a runaway query with SQLSTATE 57014") {
    val c = new Client(server._2); c.startup()
    c.query("SET statement_timeout = '5ms'")
    // a quadratic join the 5ms watchdog will certainly cancel mid-flight
    val msgs = c.query(
      "SELECT count(*) AS n FROM lineitem a JOIN lineitem b ON a.l_orderkey <> b.l_orderkey")
    val err = msgs.find(_._1 == 'E')
    assert(err.isDefined, "timed-out statement must error")
    val fields = new String(err.get._2, UTF_8)
    assert(fields.contains("57014"), s"want query_canceled, got: $fields")
    // session stays usable and timeout resets cleanly
    c.query("SET statement_timeout = 0")
    val ok = c.query("SELECT 1 AS one")
    assert(ok.filter(_._1 == 'D').map(m => dataRowValues(m._2)) == Seq(Seq("1")))
    c.close()
  }

  test("BEGIN/ROLLBACK really undoes store writes on this connection") {
    import spark.implicits._
    store.replace("txn_t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val c = new Client(server._2); c.startup()
    def vals(msgs: Seq[(Char, Array[Byte])]) =
      msgs.filter(_._1 == 'D').map(m => dataRowValues(m._2))
    def status(msgs: Seq[(Char, Array[Byte])]) =
      msgs.find(_._1 == 'Z').get._2(0).toChar

    // autocommit unaffected: no txn -> write sticks
    c.query("INSERT INTO txn_t VALUES (3, 'c')")
    // txn: write + create-table, then roll both back
    assert(status(c.query("BEGIN")) == 'T', "ReadyForQuery must show in-txn")
    c.query("UPDATE txn_t SET v = 'XX' WHERE k = 1")
    c.query("CREATE TABLE txn_new AS SELECT 1 AS one")
    assert(vals(c.query("SELECT v FROM txn_t WHERE k = 1")) == Seq(Seq("XX")),
      "txn sees its own writes")
    assert(status(c.query("ROLLBACK")) == 'I')
    assert(vals(c.query("SELECT v FROM txn_t WHERE k = 1")) == Seq(Seq("a")),
      "rolled-back update must not stick")
    assert(vals(c.query("SELECT count(*) AS n FROM txn_t")) == Seq(Seq("3")),
      "pre-txn autocommit insert survives rollback")
    val gone = c.query("SELECT * FROM txn_new")
    assert(gone.exists(_._1 == 'E'), "table created in the txn must drop")

    // savepoints: partial rollback inside the txn
    c.query("BEGIN")
    c.query("UPDATE txn_t SET v = 'sp0' WHERE k = 1")
    c.query("SAVEPOINT s1")
    c.query("UPDATE txn_t SET v = 'sp1' WHERE k = 2")
    c.query("ROLLBACK TO SAVEPOINT s1")
    assert(vals(c.query("SELECT v FROM txn_t WHERE k = 2")) == Seq(Seq("b")),
      "post-savepoint write must undo")
    assert(vals(c.query("SELECT v FROM txn_t WHERE k = 1")) == Seq(Seq("sp0")),
      "pre-savepoint write must survive ROLLBACK TO")
    c.query("COMMIT")
    assert(vals(c.query("SELECT v FROM txn_t WHERE k = 1")) == Seq(Seq("sp0")))
    c.query("UPDATE txn_t SET v = 'a' WHERE k = 1") // restore for the next leg

    // txn: COMMIT keeps the writes
    c.query("BEGIN")
    val delMsgs = c.query("DELETE FROM txn_t WHERE k = 3")
    assert(!delMsgs.exists(_._1 == 'E'),
      "DELETE errored: " + delMsgs.filter(_._1 == 'E')
        .map(m => new String(m._2, UTF_8)).mkString)
    c.query("COMMIT")
    assert(vals(c.query("SELECT count(*) AS n FROM txn_t")) == Seq(Seq("2")))
    c.close()
  }

  test("COPY FROM STDIN ingests into a store table over the socket") {
    import spark.implicits._
    store.replace("copyin_t",
      Seq((0L, "seed", Option(1.5))).toDF("k", "nm", "score"))
    val c = new Client(server._2); c.startup()

    def copyData(s: String): Unit = {
      val b = s.getBytes(UTF_8)
      c.out.writeByte('d'); c.out.writeInt(4 + b.length); c.out.write(b)
    }
    def copyDone(): Seq[(Char, Array[Byte])] = {
      c.out.writeByte('c'); c.out.writeInt(4); c.out.flush()
      c.drainUntilReady()
    }

    // CSV with header, quoted field, empty-as-NULL
    c.out.writeByte('Q')
    val q1 = "COPY copyin_t FROM STDIN WITH (FORMAT CSV, HEADER)".getBytes(UTF_8)
    c.out.writeInt(4 + q1.length + 1); c.out.write(q1); c.out.writeByte(0); c.out.flush()
    // CopyInResponse arrives before any data is sent
    val g = c.in.read().toChar
    assert(g == 'G', s"expected CopyInResponse, got $g")
    val glen = c.in.readInt(); c.in.readFully(new Array[Byte](glen - 4))
    copyData("k,nm,score\n1,\"al,pha\",2.5\n")
    copyData("2,beta,\n") // frame boundary mid-stream, NULL score
    val msgs = copyDone()
    val tag = new String(msgs.find(_._1 == 'C').get._2, UTF_8).stripSuffix("\u0000")
    assert(tag == "COPY 2", tag)

    // PG default text format: tab delimiter, \N nulls, backslash escapes
    c.out.writeByte('Q')
    val q2 = "COPY copyin_t (k, nm) FROM STDIN".getBytes(UTF_8)
    c.out.writeInt(4 + q2.length + 1); c.out.write(q2); c.out.writeByte(0); c.out.flush()
    val g2 = c.in.read().toChar
    assert(g2 == 'G')
    val g2len = c.in.readInt(); c.in.readFully(new Array[Byte](g2len - 4))
    copyData("3\twith\\ttab\n4\t\\N\n")
    val msgs2 = copyDone()
    val tag2 = new String(msgs2.find(_._1 == 'C').get._2, UTF_8).stripSuffix("\u0000")
    assert(tag2 == "COPY 2", tag2)

    val sel = c.query("SELECT k, nm, score FROM copyin_t ORDER BY k")
    val got = sel.filter(_._1 == 'D').map(m => dataRowValues(m._2))
    assert(got == Seq(
      Seq("0", "seed", "1.5"),
      Seq("1", "al,pha", "2.5"),
      Seq("2", "beta", null),
      Seq("3", "with\ttab", null),
      Seq("4", null, null)), got)

    // CopyFail aborts cleanly and the session stays usable
    c.out.writeByte('Q')
    val q3 = "COPY copyin_t FROM STDIN".getBytes(UTF_8)
    c.out.writeInt(4 + q3.length + 1); c.out.write(q3); c.out.writeByte(0); c.out.flush()
    val g3 = c.in.read().toChar; assert(g3 == 'G')
    val g3len = c.in.readInt(); c.in.readFully(new Array[Byte](g3len - 4))
    copyData("9\tdoomed\t0\n")
    c.out.writeByte('f'); c.out.writeInt(5); c.out.writeByte(0); c.out.flush()
    val failMsgs = c.drainUntilReady()
    assert(failMsgs.exists(_._1 == 'E'), "CopyFail must surface an error")
    val after = c.query("SELECT count(*) AS n FROM copyin_t")
    assert(after.filter(_._1 == 'D').map(m => dataRowValues(m._2)) == Seq(Seq("5")),
      "failed COPY must not commit rows")
    c.close()
  }

  test("fat COPY FROM STDIN decodes on executor tasks (parallel ingest path)") {
    import spark.implicits._
    store.replace("copyin_par",
      Seq((0L, "seed", Option(1.0))).toDF("k", "nm", "score"))
    // force EVERY chunk through the executor-parallel decode (the default
    // 8 MB threshold would keep a test-size payload on the driver path)
    sys.props("graft.copyIn.parallelMinBytes") = "1"
    try {
      val c = new Client(server._2); c.startup()
      def copyData(s: String): Unit = {
        val b = s.getBytes(UTF_8)
        c.out.writeByte('d'); c.out.writeInt(4 + b.length); c.out.write(b)
      }
      def copyDone(): Seq[(Char, Array[Byte])] = {
        c.out.writeByte('c'); c.out.writeInt(4); c.out.flush()
        c.drainUntilReady()
      }
      def beginCopy(sql: String): Unit = {
        c.out.writeByte('Q')
        val q = sql.getBytes(UTF_8)
        c.out.writeInt(4 + q.length + 1); c.out.write(q); c.out.writeByte(0)
        c.out.flush()
        val g = c.in.read().toChar
        assert(g == 'G', s"expected CopyInResponse, got $g")
        val glen = c.in.readInt(); c.in.readFully(new Array[Byte](glen - 4))
      }

      beginCopy("COPY copyin_par FROM STDIN")
      val n = 500
      val sb = new StringBuilder
      (1 to n).foreach { i =>
        sb.append(s"$i\tname\\t$i\t${if (i % 7 == 0) "\\N" else s"$i.5"}\n")
      }
      copyData(sb.toString)
      val msgs = copyDone()
      val tag = new String(msgs.find(_._1 == 'C').get._2, UTF_8)
        .stripSuffix("\u0000")
      assert(tag == s"COPY $n", tag)
      // content through the executor decode: escapes, NULL markers, casts
      val sel = c.query(
        "SELECT nm, score FROM copyin_par WHERE k IN (1, 7) ORDER BY k")
      val got = sel.filter(_._1 == 'D').map(m => dataRowValues(m._2))
      assert(got == Seq(Seq("name\t1", "1.5"), Seq("name\t7", null)), got)
      val cnt = c.query("SELECT count(*) AS n FROM copyin_par WHERE k > 0")
      assert(cnt.filter(_._1 == 'D').map(m => dataRowValues(m._2)) ==
        Seq(Seq(n.toString)), "all parallel-decoded rows committed")

      // a malformed row inside an executor task surfaces the same
      // PG-shaped error the driver path raises, and nothing commits
      beginCopy("COPY copyin_par FROM STDIN")
      copyData("901\tonly-two-fields\n")
      val errMsgs = copyDone()
      val err = errMsgs.filter(_._1 == 'E')
        .map(m => new String(m._2, UTF_8)).mkString
      assert(err.contains("COPY row has 2 fields, expected 3"), err)
      val cnt2 = c.query("SELECT count(*) AS n FROM copyin_par WHERE k > 900")
      assert(cnt2.filter(_._1 == 'D').map(m => dataRowValues(m._2)) ==
        Seq(Seq("0")), "malformed COPY must not commit rows")
      assert(c.query("SELECT 1").exists(_._1 == 'D'), "session stays usable")

      // the parallel decode path joins transactions like the driver path:
      // staged while open, discarded by ROLLBACK
      c.query("BEGIN")
      beginCopy("COPY copyin_par FROM STDIN")
      copyData((1 to 50).map(i => s"${1000 + i}\ttx$i\t$i.5\n").mkString)
      val txMsgs = copyDone()
      assert(new String(txMsgs.find(_._1 == 'C').get._2, UTF_8)
        .stripSuffix("\u0000") == "COPY 50")
      val inTx = c.query("SELECT count(*) AS n FROM copyin_par WHERE k > 1000")
      assert(inTx.filter(_._1 == 'D').map(m => dataRowValues(m._2)) ==
        Seq(Seq("50")), "txn reads its own parallel-decoded COPY rows")
      c.query("ROLLBACK")
      val gone = c.query("SELECT count(*) AS n FROM copyin_par WHERE k > 1000")
      assert(gone.filter(_._1 == 'D').map(m => dataRowValues(m._2)) ==
        Seq(Seq("0")), "ROLLBACK discards the parallel-decoded COPY")
      c.close()
    } finally {
      sys.props.remove("graft.copyIn.parallelMinBytes")
      store.drop("copyin_par")
    }
  }

  test("a corrupt frame length is refused before the allocation it names") {
    val c = new Client(server._2); c.startup()
    // type 'Q' with a 2 GB length field: must answer a protocol-violation
    // error and close, never attempt the allocation or hang the read loop
    c.out.writeByte('Q'); c.out.writeInt(Int.MaxValue); c.out.flush()
    val tpe = c.in.read().toChar
    assert(tpe == 'E', s"expected ErrorResponse, got $tpe")
    val len = c.in.readInt()
    val body = new Array[Byte](len - 4); c.in.readFully(body)
    val err = new String(body, UTF_8)
    assert(err.contains("08P01") && err.contains("invalid message length"), err)
    assert(c.in.read() == -1, "connection must close after a corrupt frame")
    c.sock.close()
    // negative body length on a fresh connection: same refusal
    val c2 = new Client(server._2); c2.startup()
    c2.out.writeByte('Q'); c2.out.writeInt(3); c2.out.flush()
    assert(c2.in.read().toChar == 'E')
    c2.sock.close()
    // the server still accepts new connections afterwards
    val c3 = new Client(server._2); c3.startup()
    assert(c3.query("SELECT 1").exists(_._1 == 'D'))
    c3.close()
  }

  test("COPY FROM STDIN inside a transaction rolls back with it") {
    import spark.implicits._
    store.replace("copytx_t", Seq((0L, "seed")).toDF("k", "nm"))
    val c = new Client(server._2); c.startup()
    def copyData(s: String): Unit = {
      val b = s.getBytes(UTF_8)
      c.out.writeByte('d'); c.out.writeInt(4 + b.length); c.out.write(b)
    }
    def vals(msgs: Seq[(Char, Array[Byte])]) =
      msgs.filter(_._1 == 'D').map(m => dataRowValues(m._2))
    c.query("BEGIN")
    c.out.writeByte('Q')
    val q = "COPY copytx_t FROM STDIN".getBytes(UTF_8)
    c.out.writeInt(4 + q.length + 1); c.out.write(q); c.out.writeByte(0); c.out.flush()
    assert(c.in.read().toChar == 'G')
    val glen = c.in.readInt(); c.in.readFully(new Array[Byte](glen - 4))
    copyData("1\tone\n2\ttwo\n")
    c.out.writeByte('c'); c.out.writeInt(4); c.out.flush()
    c.drainUntilReady()
    // visible inside the txn…
    assert(vals(c.query("SELECT count(*) AS n FROM copytx_t")) == Seq(Seq("3")))
    c.query("ROLLBACK")
    // …and gone after ROLLBACK, like any other write in the txn
    assert(vals(c.query("SELECT count(*) AS n FROM copytx_t")) == Seq(Seq("1")))
    // a committed txn keeps its COPY
    c.query("BEGIN")
    c.out.writeByte('Q')
    c.out.writeInt(4 + q.length + 1); c.out.write(q); c.out.writeByte(0); c.out.flush()
    assert(c.in.read().toChar == 'G')
    val g2 = c.in.readInt(); c.in.readFully(new Array[Byte](g2 - 4))
    copyData("5\tkept\n")
    c.out.writeByte('c'); c.out.writeInt(4); c.out.flush()
    c.drainUntilReady()
    c.query("COMMIT")
    assert(vals(c.query("SELECT count(*) AS n FROM copytx_t")) == Seq(Seq("2")))
    c.close()
  }

  test("COPY failing in a later chunk still rolls back its published chunks") {
    import spark.implicits._
    // statement/txn atomicity for partial COPY: earlier 64MB-chunk appends
    // publish before a later malformed row errors — those appends must be
    // journaled into the txn so ROLLBACK reverts them, not stranded
    store.replace("copytx_f", Seq((0L, "seed")).toDF("k", "nm"))
    sys.props("graft.copy.chunkBytes") = "8" // force per-frame chunk flushes
    try {
      val c = new Client(server._2); c.startup()
      def copyData(s: String): Unit = {
        val b = s.getBytes(UTF_8)
        c.out.writeByte('d'); c.out.writeInt(4 + b.length); c.out.write(b)
      }
      def vals(msgs: Seq[(Char, Array[Byte])]) =
        msgs.filter(_._1 == 'D').map(m => dataRowValues(m._2))
      c.query("BEGIN")
      c.out.writeByte('Q')
      val q = "COPY copytx_f FROM STDIN".getBytes(UTF_8)
      c.out.writeInt(4 + q.length + 1); c.out.write(q); c.out.writeByte(0); c.out.flush()
      assert(c.in.read().toChar == 'G')
      val glen = c.in.readInt(); c.in.readFully(new Array[Byte](glen - 4))
      copyData("1\tone\n2\ttwo\n") // > 8 bytes: chunk publishes on arrival
      copyData("malformed-single-field\n") // wrong arity: errors at the tail
      c.out.writeByte('c'); c.out.writeInt(4); c.out.flush()
      val msgs = c.drainUntilReady()
      assert(msgs.exists(_._1 == 'E'), "the malformed row must error the COPY")
      c.query("ROLLBACK")
      assert(vals(c.query("SELECT count(*) AS n FROM copytx_f")) == Seq(Seq("1")),
        "ROLLBACK must revert the chunk that published before the failure")
      c.close()
    } finally sys.props.remove("graft.copy.chunkBytes")
  }

  test("repeatable-read conflicts surface SQLSTATE 40001 on the wire") {
    import spark.implicits._
    store.replace("rrw_t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val c1 = new Client(server._2); c1.startup()
    val c2 = new Client(server._2); c2.startup()
    c1.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
    c1.query("SELECT count(*) FROM rrw_t") // pins
    c2.query("UPDATE rrw_t SET v = 'moved' WHERE k = 1") // concurrent commit
    val msgs = c1.query("UPDATE rrw_t SET v = 'mine' WHERE k = 2")
    val err = msgs.find(_._1 == 'E').map(m => new String(m._2, UTF_8))
    assert(err.isDefined, "conflicting write must error")
    assert(err.get.contains("40001"),
      s"drivers retry on SQLSTATE 40001, got: ${err.get}")
    c1.query("ROLLBACK")
    // session stays usable and read-committed again
    val after = c1.query("SELECT v FROM rrw_t WHERE k = 1")
      .filter(_._1 == 'D').map(m => dataRowValues(m._2).head)
    assert(after == Seq("moved"))
    c1.close(); c2.close()
    store.drop("rrw_t")
  }

  test("READ ONLY transaction writes surface SQLSTATE 25006 on the wire") {
    import spark.implicits._
    store.replace("row_t", Seq((1L, "a")).toDF("k", "v"))
    val c = new Client(server._2); c.startup()
    c.query("BEGIN READ ONLY")
    val msgs = c.query("INSERT INTO row_t VALUES (2, 'b')")
    val err = msgs.find(_._1 == 'E').map(m => new String(m._2, UTF_8))
    assert(err.isDefined, "read-only write must error")
    assert(err.get.contains("25006"),
      s"clients branch on read_only_sql_transaction, got: ${err.get}")
    c.query("ROLLBACK")
    // the session is writable again outside the read-only block
    val ok = c.query("INSERT INTO row_t VALUES (2, 'b')")
      .find(_._1 == 'C').map(m => new String(m._2, UTF_8))
    assert(ok.exists(_.startsWith("INSERT 0 1")), s"tag: $ok")
    c.close()
    store.drop("row_t")
  }

  test("repeatable read pins the extended protocol (JDBC's Parse/Bind path)") {
    import spark.implicits._
    store.replace("rrx_t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val c = new Client(server._2); c.startup()
    val c2 = new Client(server._2); c2.startup()
    def send(tpe: Char, body: Array[Byte]): Unit = {
      c.out.writeByte(tpe); c.out.writeInt(4 + body.length); c.out.write(body)
    }
    def bb(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def runSql(sql: String): String = {
      // unnamed statement/portal — rebound each call like pgjdbc
      send('P', bb(cstr(""), cstr(sql), i16(0)))
      send('B', bb(cstr(""), cstr(""), i16(0), i16(0), i16(0)))
      send('E', bb(cstr(""), i32(0)))
      send('S', Array.emptyByteArray)
      c.out.flush()
      c.drainUntilReady().filter(_._1 == 'D').map(m => dataRowValues(m._2).head).head
    }
    def runCount(): String = runSql("SELECT count(*) FROM rrx_t")
    c.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
    // JDBC's getTransactionIsolation goes through Parse/Bind too
    assert(runSql("SHOW TRANSACTION ISOLATION LEVEL") == "repeatable read")
    assert(runCount() == "2") // pins at the first (extended) statement
    c2.query("INSERT INTO rrx_t VALUES (3, 'late')") // concurrent commit
    assert(runCount() == "2",
      "Parse/Bind reads must honor the repeatable-read pin like simple queries")
    c.query("COMMIT")
    assert(runCount() == "3")
    c.close(); c2.close()
    store.drop("rrx_t")
  }

  test("multi-chunk COPY inside repeatable read commits without spurious conflicts") {
    import spark.implicits._
    store.replace("rrc_t", Seq((0L, "seed")).toDF("k", "nm"))
    sys.props("graft.copy.chunkBytes") = "8" // every frame publishes a chunk
    try {
      val c = new Client(server._2); c.startup()
      def copyData(s: String): Unit = {
        val b = s.getBytes(UTF_8)
        c.out.writeByte('d'); c.out.writeInt(4 + b.length); c.out.write(b)
      }
      c.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
      c.query("SELECT count(*) FROM rrc_t") // pin
      c.out.writeByte('Q')
      val q = "COPY rrc_t FROM STDIN".getBytes(UTF_8)
      c.out.writeInt(4 + q.length + 1); c.out.write(q); c.out.writeByte(0); c.out.flush()
      assert(c.in.read().toChar == 'G')
      val glen = c.in.readInt(); c.in.readFully(new Array[Byte](glen - 4))
      copyData("1\tone\n2\ttwo\n")   // chunk 1 publishes
      copyData("3\tthree\n4\tfour\n") // chunk 2 publishes — own versions, no conflict
      c.out.writeByte('c'); c.out.writeInt(4); c.out.flush()
      val msgs = c.drainUntilReady()
      assert(!msgs.exists(_._1 == 'E'),
        "a multi-chunk COPY's own sequential publishes must not read as conflicts: " +
          msgs.filter(_._1 == 'E').map(m => new String(m._2, UTF_8)).mkString)
      assert(msgs.exists(m => m._1 == 'C' &&
        new String(m._2, UTF_8).startsWith("COPY 4")), "completion tag after checks")
      c.query("COMMIT")
      val n = c.query("SELECT count(*) FROM rrc_t")
        .filter(_._1 == 'D').map(m => dataRowValues(m._2).head).head
      assert(n == "5")
      c.close()
    } finally { sys.props.remove("graft.copy.chunkBytes"); store.drop("rrc_t") }
  }

  test("EXECUTE of a prepared DML joins the transaction: ROLLBACK reverts it") {
    import spark.implicits._
    store.replace("rre_t", Seq((1L, "a")).toDF("k", "v"))
    val c = new Client(server._2); c.startup()
    c.query("BEGIN")
    c.query("PREPARE rre_ins AS INSERT INTO rre_t VALUES (2, 'ghost')")
    c.query("EXECUTE rre_ins")
    def count(): String = c.query("SELECT count(*) FROM rre_t")
      .filter(_._1 == 'D').map(m => dataRowValues(m._2).head).head
    assert(count() == "2", "the executed insert is visible in the txn")
    c.query("ROLLBACK")
    assert(count() == "1",
      "a prepared-statement write must journal into the txn and revert")
    c.close(); store.drop("rre_t")
  }

  test("set_config on one connection is invisible to a concurrent connection") {
    // pg_dump opens with SELECT pg_catalog.set_config('search_path', '', false);
    // handled at the dialect layer on the connection-scoped thread — the UDF
    // path would evaluate on a task thread and leak into the session scope
    val c1 = new Client(server._2); c1.startup()
    val c2 = new Client(server._2); c2.startup()
    def shown(c: Client, name: String): String =
      c.query(s"SHOW $name").filter(_._1 == 'D')
        .map(m => dataRowValues(m._2).head).head
    val before = shown(c2, "search_path")
    val r = c1.query("SELECT pg_catalog.set_config('search_path', 'graft_x, public', false)")
      .filter(_._1 == 'D').map(m => dataRowValues(m._2).head).head
    assert(r == "graft_x, public", "set_config returns the new value")
    // SHOW prefixes "$user" like the reference (query_remapper_show.go:26)
    assert(shown(c1, "search_path") == "\"$user\", graft_x, public",
      "visible to its own connection")
    assert(shown(c2, "search_path") == before,
      "c1's set_config leaked into c2's scope")
    c1.close(); c2.close()
  }

  test("SET on one connection is invisible to a concurrent connection") {
    // the PG per-connection contract: each backend has its own GUC state
    val c1 = new Client(server._2); c1.startup()
    val c2 = new Client(server._2); c2.startup()
    def shown(c: Client, name: String): String =
      c.query(s"SHOW $name").filter(_._1 == 'D')
        .map(m => dataRowValues(m._2).head).head
    c1.query("SET application_name = 'conn_one'")
    c1.query("SET statement_timeout = '30s'")
    assert(shown(c1, "application_name") == "conn_one")
    assert(shown(c2, "application_name") == "", "c1's SET leaked into c2")
    assert(shown(c2, "statement_timeout") == "", "c1's timeout leaked into c2")
    c2.query("SET application_name = 'conn_two'")
    assert(shown(c1, "application_name") == "conn_one",
      "c2's SET clobbered c1's value")
    // RESET ALL clears only this connection's overrides
    c1.query("RESET ALL")
    assert(shown(c1, "application_name") == "")
    assert(shown(c2, "application_name") == "conn_two")
    c1.close(); c2.close()
  }
}
