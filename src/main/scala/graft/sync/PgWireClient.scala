package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal PostgreSQL v3 wire-protocol CLIENT (the mirror of
  * wire/PgWireServer): startup + cleartext/MD5/SCRAM-SHA-256
  * authentication, the simple query protocol, and COPY TO STDOUT.
  *
  * This exists because the reference's Postgres syncer talks libpq
  * directly (reference: /root/reference/src/syncer-postgres — pgx client,
  * snapshot'd COPY reads); the Spark-side analog needs a Postgres client
  * and the container ships no JDBC driver jar. Everything here is the
  * public protocol (PostgreSQL docs, "Frontend/Backend Protocol" + RFC
  * 5802/7677 for SCRAM) — ~300 lines buys the whole sync seam.
  *
  * Scale shape: ONE client per Spark task (PgWireSource opens one per
  * partition inside mapPartitions), all under one exported snapshot — the
  * parallel form of the reference's single-COPY-connection sync. The
  * partition count is the CONNECTION BUDGET, deliberately independent of
  * executor count: a Postgres server caps at max_connections (typically
  * 100-500), so a 1000-executor cluster still opens only `numPartitions`
  * sockets and the remaining executors take other work. Results stream
  * row-at-a-time off the socket (no whole-partition buffering).
  */
class PgWireClient(host: String, port: Int, user: String, database: String,
    password: Option[String] = None,
    extraParams: Seq[(String, String)] = Nil) extends AutoCloseable {

  import PgWireClient._

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream, 1 << 16))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream, 1 << 16))

  /** ParameterStatus values the server reported (server_version, ...). */
  val parameters = scala.collection.mutable.Map.empty[String, String]

  handshake()

  // ---- startup + auth ------------------------------------------------------

  private def handshake(): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeInt(196608) // protocol 3.0
    for ((k, v) <- Seq("user" -> user, "database" -> database,
        "application_name" -> "graft-sync") ++ extraParams) {
      b.write(k.getBytes(UTF_8)); b.write(0)
      b.write(v.getBytes(UTF_8)); b.write(0)
    }
    b.write(0)
    out.writeInt(4 + body.size())
    body.writeTo(out)
    out.flush()
    authenticate()
    // drain ParameterStatus/BackendKeyData until ReadyForQuery
    var t = readType()
    while (t != 'Z') {
      val body = readBody()
      t match {
        case 'S' =>
          val cs = cstrings(body)
          if (cs.length >= 2) parameters(cs(0)) = cs(1)
        case 'K' => // BackendKeyData: pid+secret, cancel unused here
        case 'N' => // NoticeResponse
        case 'E' => throw errorFrom(body)
        case _ =>
      }
      t = readType()
    }
    readBody() // ReadyForQuery status byte
  }

  private def authenticate(): Unit = {
    var done = false
    while (!done) {
      val t = readType()
      val body = readBody()
      if (t == 'E') throw errorFrom(body)
      require(t == 'R', s"expected Authentication message, got '$t'")
      val code = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
        ((body(2) & 0xff) << 8) | (body(3) & 0xff)
      code match {
        case 0 => done = true
        case 3 => // cleartext
          sendMsg('p') { b => b.write(pw.getBytes(UTF_8)); b.write(0) }
        case 5 => // md5: "md5" + md5hex(md5hex(password+user) + salt)
          val salt = java.util.Arrays.copyOfRange(body, 4, 8)
          val inner = md5hex((pw + user).getBytes(UTF_8))
          val outer = "md5" + md5hex(inner.getBytes(UTF_8) ++ salt)
          sendMsg('p') { b => b.write(outer.getBytes(UTF_8)); b.write(0) }
        case 10 => // SASL: pick SCRAM-SHA-256 (no channel binding)
          val mechs = cstrings(java.util.Arrays.copyOfRange(body, 4, body.length))
          require(mechs.contains("SCRAM-SHA-256"),
            s"server offers no SCRAM-SHA-256 (got ${mechs.mkString(",")})")
          scramAuth()
          done = true // scramAuth consumes through AuthenticationOk
        case other =>
          throw new IllegalStateException(s"unsupported auth request code $other")
      }
    }
  }

  private def pw: String = password.getOrElse(
    throw new IllegalStateException("server requires a password; none configured"))

  /** SCRAM-SHA-256 (RFC 7677) without channel binding — what a PG 10+
    * server asks for under password_encryption=scram-sha-256. */
  private def scramAuth(): Unit = {
    val nonce = {
      val r = new Array[Byte](18)
      new java.security.SecureRandom().nextBytes(r)
      java.util.Base64.getEncoder.encodeToString(r)
    }
    val clientFirstBare = s"n=,r=$nonce"
    val clientFirst = "n,," + clientFirstBare
    sendMsg('p') { b => // SASLInitialResponse
      b.write("SCRAM-SHA-256".getBytes(UTF_8)); b.write(0)
      val p = clientFirst.getBytes(UTF_8)
      b.writeInt(p.length); b.write(p)
    }
    val cont = expectAuth(11) // AuthenticationSASLContinue
    val serverFirst = new String(cont, UTF_8)
    val attrs = serverFirst.split(",").map(a => a.take(1) -> a.drop(2)).toMap
    val fullNonce = attrs("r")
    require(fullNonce.startsWith(nonce), "server nonce must extend client nonce")
    val salt = java.util.Base64.getDecoder.decode(attrs("s"))
    val iters = attrs("i").toInt
    val salted = pbkdf2(pw, salt, iters)
    val clientKey = hmac(salted, "Client Key")
    val storedKey = sha256(clientKey)
    val clientFinalNoProof = s"c=biws,r=$fullNonce" // biws = b64("n,,")
    val authMessage = s"$clientFirstBare,$serverFirst,$clientFinalNoProof"
    val clientSig = hmac(storedKey, authMessage)
    val proof = clientKey.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
    val proofB64 = java.util.Base64.getEncoder.encodeToString(proof)
    sendMsg('p') { b => // SASLResponse
      b.write(s"$clientFinalNoProof,p=$proofB64".getBytes(UTF_8))
    }
    val fin = expectAuth(12) // AuthenticationSASLFinal: "v=<b64 sig>"
    val serverKey = hmac(salted, "Server Key")
    val expect = java.util.Base64.getEncoder
      .encodeToString(hmac(serverKey, authMessage))
    val got = new String(fin, UTF_8).stripPrefix("v=")
    require(got == expect, "server signature mismatch — not the real server")
    expectAuth(0) // AuthenticationOk
  }

  /** Read one Authentication ('R') message, assert its code, return the
    * payload after the code. ErrorResponse surfaces as an exception. */
  private def expectAuth(code: Int): Array[Byte] = {
    val t = readType()
    val body = readBody()
    if (t == 'E') throw errorFrom(body)
    require(t == 'R', s"expected Authentication, got '$t'")
    val got = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
      ((body(2) & 0xff) << 8) | (body(3) & 0xff)
    require(got == code, s"expected auth code $code, got $got")
    java.util.Arrays.copyOfRange(body, 4, body.length)
  }

  // ---- simple query --------------------------------------------------------

  /** Run one simple-protocol query; collect described columns, text-format
    * rows (null cells are null) and command tags through ReadyForQuery. */
  def query(sql: String): PgResult = synchronized {
    sendMsg('Q') { b => b.write(sql.getBytes(UTF_8)); b.write(0) }
    out.flush()
    var cols: Seq[PgCol] = Nil
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    val tags = scala.collection.mutable.ArrayBuffer.empty[String]
    var err: PgClientException = null
    var t = readType()
    while (t != 'Z') {
      val body = readBody()
      t match {
        case 'T' => cols = parseRowDescription(body)
        case 'D' => rows += parseDataRow(body)
        case 'C' => tags += cstrings(body).headOption.getOrElse("")
        case 'E' => if (err == null) err = errorFrom(body)
        case 'I' => tags += "" // EmptyQueryResponse
        case 'N' | 'S' => // notices / parameter changes: ignore
        case _ =>
      }
      t = readType()
    }
    readBody()
    if (err != null) throw err
    PgResult(cols, rows.toSeq, tags.toSeq)
  }

  /** COPY ... TO STDOUT, fully materialized (small results / tests). */
  def copyOut(sql: String): Seq[String] = copyOutIter(sql).toVector

  /** COPY ... TO STDOUT as a LAZY line iterator (PG `text` COPY format:
    * tab-separated, backslash escapes, \N for NULL): rows decode
    * incrementally off the socket, so a partition-sized range never
    * buffers wholesale — the 100 TB sync shape. The iterator must be
    * exhausted (or the connection closed) before the client is reused. */
  def copyOutIter(sql: String): Iterator[String] = {
    sendMsg('Q') { b => b.write(sql.getBytes(UTF_8)); b.write(0) }
    out.flush()
    new Iterator[String] {
      // CopyData bodies are one-per-row in text mode but the protocol
      // doesn't promise it — carry partial lines across messages
      private var pending: scala.collection.Iterator[String] = Iterator.empty
      private var carry = new java.io.ByteArrayOutputStream()
      private var done = false
      private var err: PgClientException = null

      private def pump(): Unit = {
        while (!pending.hasNext && !done) {
          val t = readType()
          val body = readBody()
          t match {
            case 'H' => // CopyOutResponse
            case 'd' =>
              carry.write(body)
              val bytes = carry.toByteArray
              var last = bytes.length - 1
              while (last >= 0 && bytes(last) != '\n') last -= 1
              if (last >= 0) {
                val chunk = new String(bytes, 0, last, UTF_8)
                pending =
                  if (chunk.isEmpty) Iterator("") else chunk.split("\n", -1).iterator
                carry = new java.io.ByteArrayOutputStream()
                carry.write(bytes, last + 1, bytes.length - last - 1)
              }
            case 'c' => // CopyDone; drain through ReadyForQuery
            case 'E' => if (err == null) err = errorFrom(body)
            case 'Z' => done = true
            case _ =>
          }
        }
        if (done && err != null) throw err
      }

      def hasNext: Boolean = { pump(); pending.hasNext }
      def next(): String = { pump(); pending.next() }
    }
  }

  // ---- framing -------------------------------------------------------------

  private var pendingLen = 0

  private[graft] def readType(): Char = {
    val t = in.read()
    if (t < 0) throw new java.io.EOFException("server closed connection")
    pendingLen = in.readInt() - 4
    t.toChar
  }

  private[graft] def readBody(): Array[Byte] = {
    val b = new Array[Byte](pendingLen)
    in.readFully(b)
    b
  }

  /** Socket read timeout (ms; 0 = infinite) — the replication stream uses
    * a bounded timeout as its idle-detection mechanism. */
  private[graft] def setSoTimeout(ms: Int): Unit = socket.setSoTimeout(ms)

  /** Idle-aware frame-type read: wait up to `idleMillis` for the FIRST
    * byte (None = genuinely idle); once it arrives, the rest of the frame
    * header completes under a generous timeout — a timeout BETWEEN the
    * type byte and the length field must be a hard error, never a silent
    * return, or the consumed byte desynchronizes every later frame. */
  private[graft] def readTypeIdle(idleMillis: Int): Option[Char] = {
    socket.setSoTimeout(idleMillis)
    val t =
      try in.read()
      catch { case _: java.net.SocketTimeoutException => -2 }
      finally socket.setSoTimeout(30000)
    if (t == -2) None
    else if (t < 0) throw new java.io.EOFException("server closed connection")
    else {
      pendingLen = in.readInt() - 4
      Some(t.toChar)
    }
  }

  private[graft] def sendMsg(t: Char)(write: DataOutputStream => Unit): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    write(new DataOutputStream(body))
    out.writeByte(t)
    out.writeInt(4 + body.size())
    body.writeTo(out)
    out.flush()
  }

  override def close(): Unit = {
    try { out.writeByte('X'); out.writeInt(4); out.flush() }
    catch { case _: java.io.IOException => }
    socket.close()
  }
}

final case class PgCol(name: String, typeOid: Int, typmod: Int)

final case class PgResult(cols: Seq[PgCol], rows: Seq[Array[String]],
    tags: Seq[String]) {
  /** Single-value convenience for `SELECT one_thing` probes. */
  def scalar: String = rows.head(0)
}

final class PgClientException(val severity: String, val sqlState: String,
    message: String) extends RuntimeException(s"$severity $sqlState: $message")

object PgWireClient {

  private def cstrings(body: Array[Byte]): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < body.length) {
      if (body(i) == 0) {
        if (i > start) parts += new String(body, start, i - start, UTF_8)
        else if (i == start && i != body.length - 1) parts += ""
        start = i + 1
      }
      i += 1
    }
    parts.toSeq
  }

  private def parseRowDescription(body: Array[Byte]): Seq[PgCol] = {
    val bb = java.nio.ByteBuffer.wrap(body)
    val n = bb.getShort()
    (0 until n).map { _ =>
      val sb = new java.lang.StringBuilder()
      var c = bb.get()
      while (c != 0) { sb.append(c.toChar); c = bb.get() }
      val name = new String(sb.toString.getBytes("ISO-8859-1"), UTF_8)
      bb.getInt(); bb.getShort() // table oid, attnum
      val oid = bb.getInt()
      bb.getShort() // typlen
      val typmod = bb.getInt()
      bb.getShort() // format
      PgCol(name, oid, typmod)
    }
  }

  private def parseDataRow(body: Array[Byte]): Array[String] = {
    val bb = java.nio.ByteBuffer.wrap(body)
    val n = bb.getShort()
    Array.tabulate(n) { _ =>
      val len = bb.getInt()
      if (len < 0) null
      else {
        val v = new Array[Byte](len)
        bb.get(v)
        new String(v, UTF_8)
      }
    }
  }

  private[graft] def errorFrom(body: Array[Byte]): PgClientException = {
    var severity = "ERROR"; var code = "XX000"; var msg = ""
    var i = 0
    while (i < body.length && body(i) != 0) {
      val f = body(i).toChar
      var j = i + 1
      while (j < body.length && body(j) != 0) j += 1
      val v = new String(body, i + 1, j - i - 1, UTF_8)
      f match {
        case 'S' => severity = v
        case 'C' => code = v
        case 'M' => msg = v
        case _ =>
      }
      i = j + 1
    }
    new PgClientException(severity, code, msg)
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  private def hmac(key: Array[Byte], data: String): Array[Byte] =
    hmac(key, data.getBytes(UTF_8))

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data)
  }

  private def pbkdf2(password: String, salt: Array[Byte], iters: Int): Array[Byte] = {
    val f = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    f.generateSecret(new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, iters, 256)).getEncoded
  }

  /** Unescape one field of PG `text` COPY format (backslash escapes). */
  private[graft] def unescapeCopy(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        i += 1
        s.charAt(i) match {
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'v' => sb.append('\u000b')
          case o => sb.append(o)
        }
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }
}
