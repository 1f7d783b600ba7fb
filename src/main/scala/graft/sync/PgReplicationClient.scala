package graft

/** Streaming logical-replication client: the `START_REPLICATION` walsender
  * protocol production CDC uses, as an upgrade over SQL-function polling
  * (`pg_logical_slot_peek_changes`). Why it matters at scale: a polling
  * consumer only advances the slot's WAL anchors when it calls
  * `get_changes`, so a slow poll cadence holds `restart_lsn` back and the
  * upstream retains WAL for the gap (`max_slot_wal_keep_size` or
  * disk-full eventually kills the slot). The streaming protocol inverts
  * the flow — the server PUSHes XLogData as WAL commits and the consumer
  * acknowledges progress continuously via Standby Status Update feedback,
  * so WAL releases at apply speed, not poll cadence.
  *
  * Protocol (public, PG docs "Streaming Replication Protocol"):
  *  - connect with startup parameter `replication=database` (walsender
  *    mode; the auth flow is the normal one — reused from PgWireClient);
  *  - `START_REPLICATION SLOT s LOGICAL lsn` → CopyBothResponse ('W');
  *  - server → client CopyData('d') frames wrapping
  *      'w' XLogData      : start(8) end(8) clock(8) payload (one
  *                          test_decoding line per frame)
  *      'k' Keepalive     : end(8) clock(8) replyRequested(1)
  *  - client → server CopyData('d') wrapping
  *      'r' StandbyStatus : received(8) flushed(8) applied(8) clock(8)
  *                          replyRequested(1)
  * The `flushed` LSN in the feedback is what moves the slot's
  * `confirmed_flush_lsn`/`restart_lsn` — report it only AFTER the batch
  * is durably applied (the store's keyed COW apply), preserving the same
  * at-least-once-delivery / exactly-once-keyed-effect discipline the
  * polling path has.
  */
class PgReplicationClient(conn: PgConnInfo, slot: String)
    extends AutoCloseable {

  private val client = new PgWireClient(conn.host, conn.port, conn.user,
    conn.database, conn.password, extraParams = Seq("replication" -> "database"))

  private var streaming = false
  /** Highest walEnd observed from the server (XLogData or keepalive). */
  private var lastWalEnd = 0L
  /** Highest LSN this client has REPORTED as flushed/applied. */
  private var flushed = 0L

  /** micros since PG epoch (2000-01-01), the clock field's unit */
  private def pgClock: Long = (System.currentTimeMillis - 946684800000L) * 1000L

  def lsnText(l: Long): String = f"${l >>> 32}%X/${l & 0xffffffffL}%X"

  /** Cheap transport probe: the walsender connection is already
    * authenticated by construction (a pg_hba without a replication entry
    * fails right there); IDENTIFY_SYSTEM round-trips it to prove the
    * walsender command surface answers. [[PgCdc.mirror]] uses this to pick
    * streaming vs SQL-polling BEFORE committing to a transport. Closes the
    * connection — a probe is not a stream. */
  def probe(): Unit =
    try {
      client.sendMsg('Q')(b => {
        b.write("IDENTIFY_SYSTEM".getBytes("UTF-8")); b.write(0)
      })
      var done = false
      while (!done) {
        val t = client.readType()
        val body = client.readBody()
        if (t == 'E') throw PgWireClient.errorFrom(body)
        if (t == 'Z') done = true
      }
    } finally close()

  /** Enter CopyBoth streaming from `startLsn` ("0/0" = the slot's own
    * confirmed_flush position — the server clamps forward, so a restart
    * never re-reads acknowledged WAL). */
  def start(startLsn: String = "0/0"): Unit = {
    require(!streaming, "already streaming")
    client.sendMsg('Q')(b => {
      b.write(s"START_REPLICATION SLOT $slot LOGICAL $startLsn".getBytes("UTF-8"))
      b.write(0)
    })
    var t = client.readType()
    while (t != 'W') {
      val body = client.readBody()
      if (t == 'E') throw PgWireClient.errorFrom(body)
      t = client.readType()
    }
    client.readBody() // CopyBothResponse payload (format codes)
    streaming = true
  }

  /** Send Standby Status Update acknowledging everything applied up to
    * `lsn` (defaults to the last WAL position seen). */
  def sendStandbyStatus(lsn: Long = lastWalEnd, requestReply: Boolean = false): Unit = {
    require(streaming, "not streaming")
    flushed = math.max(flushed, lsn)
    client.sendMsg('d') { b =>
      b.writeByte('r')
      b.writeLong(lastWalEnd) // received
      b.writeLong(flushed)    // flushed (moves confirmed_flush/restart)
      b.writeLong(flushed)    // applied
      b.writeLong(pgClock)
      b.writeByte(if (requestReply) 1 else 0)
    }
  }

  /** Read pushed changes until `idleMillis` passes with nothing new or
    * `maxMessages` decoded lines arrive. Returns the payload lines (one
    * test_decoding line each, BEGIN/COMMIT markers included). Keepalives
    * are answered inline when the server requests a reply (prevents
    * wal_sender_timeout kills), reporting only what is already applied. */
  def poll(idleMillis: Int = 500, maxMessages: Int = 10000): Seq[String] = {
    require(streaming, "not streaming")
    val out = Seq.newBuilder[String]
    var n = 0
    try {
      var go = true
      while (go && n < maxMessages) {
        // idle-aware read: a timeout is only "idle" BEFORE any byte of a
        // frame arrives — mid-frame stalls raise instead of desyncing
        val tOpt = client.readTypeIdle(idleMillis)
        if (tOpt.isEmpty) go = false
        else {
          val t = tOpt.get
          val body = client.readBody()
          t match {
            case 'd' if body.nonEmpty && body(0) == 'w' =>
              // XLogData: skip start(8)+end(8)+clock(8) after the tag byte
              val end = java.nio.ByteBuffer.wrap(body, 9, 8).getLong
              lastWalEnd = math.max(lastWalEnd, end)
              out += new String(body, 25, body.length - 25, "UTF-8")
              n += 1
            case 'd' if body.nonEmpty && body(0) == 'k' =>
              val end = java.nio.ByteBuffer.wrap(body, 1, 8).getLong
              lastWalEnd = math.max(lastWalEnd, end)
              if (body.length >= 18 && body(17) == 1) sendStandbyStatus(flushed)
            case 'E' => throw PgWireClient.errorFrom(body)
            case _ => // CopyDone/Notice: ignore
          }
        }
      }
    } finally client.setSoTimeout(0)
    out.result()
  }

  /** The last WAL end position the server has sent (acknowledge up to
    * here AFTER applying). */
  def walEnd: Long = lastWalEnd

  override def close(): Unit = client.close()
}
