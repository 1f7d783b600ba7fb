package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Change-data-capture ingestion from live PostgreSQL logical decoding —
  * the incremental-sync upgrade the reference lacks (its Postgres syncer
  * is full-refresh / cursor-column only, `syncer-postgres/lib/config.go:88`;
  * cursor sync needs a monotonic column and misses UPDATE/DELETE; CDC
  * needs neither).
  *
  * Uses the `test_decoding` output plugin that ships with every Postgres
  * ≥ 9.4 via the SQL functions (`pg_create_logical_replication_slot`,
  * `pg_logical_slot_get_changes`) over the in-repo wire client, so no
  * replication-protocol connection and no driver jar are needed. The slot
  * is created BEFORE the initial snapshot sync, so every change after the
  * snapshot is captured; the apply path is keyed (upsert / delete-by-key,
  * both COW with footer pruning), which makes replay across the
  * slot-vs-snapshot boundary idempotent.
  *
  * Scale shape: each poll pulls a BOUNDED batch (`upto_nchanges`) to the
  * driver — O(batch), never O(table) — then compacts it scan-side
  * (last-wins per key by slot order) and applies via the store's pruned
  * COW merge, so a steady trickle of changes against a 100 TB table
  * rewrites O(touched files) per poll. The poll itself is one connection;
  * the heavy lifting (join to locate hit files, rewrite) is distributed.
  */
class PgCdc(spark: SparkSession, conn: PgConnInfo, store: Store,
    slot: String = "graft_cdc") {

  import PgCdc._

  private def withClient[A](f: PgWireClient => A): A = {
    val c = conn.connect()
    try f(c) finally c.close()
  }

  /** Create the logical slot (idempotent). Must precede [[initialSync]]
    * so no change between snapshot and first poll is lost. */
  def createSlot(): Unit = withClient { c =>
    val exists = c.query(
      s"SELECT 1 FROM pg_replication_slots WHERE slot_name = ${lit(slot)}")
      .rows.nonEmpty
    if (!exists)
      c.query(s"SELECT pg_create_logical_replication_slot(${lit(slot)}, 'test_decoding')")
  }

  def dropSlot(): Unit = withClient { c =>
    val exists = c.query(
      s"SELECT 1 FROM pg_replication_slots WHERE slot_name = ${lit(slot)}")
      .rows.nonEmpty
    if (exists) c.query(s"SELECT pg_drop_replication_slot(${lit(slot)})")
  }

  /** Snapshot-load `table` through the partitioned sync source. Changes
    * decoded later may overlap the snapshot edge; keyed apply absorbs the
    * overlap. */
  def initialSync(source: PgWireSource, table: String): Unit = {
    store.replace(table, source.read(table))
    source.releaseStaging()
  }

  /** Poll one bounded batch of decoded changes and apply them. Returns
    * (upserts, deletes) applied. Loop until (0,0) to drain. */
  def pump(table: String, key: String, batch: Int = 10000): (Long, Long) =
    pumpAll(Map(table -> key), batch)

  /** Poll one bounded batch and apply EVERY mirrored table's changes.
    *
    * Delivery discipline: the batch is PEEKed (non-destructive), applied
    * through the keyed idempotent store ops, and only then the slot is
    * advanced past the applied LSN — so a crash between apply and advance
    * re-applies the same batch (at-least-once delivery, exactly-once
    * effect), and a decoded change for a table absent from `keys` raises
    * BEFORE anything is consumed (a destructive read there would be
    * silent data loss; mirror the table or keep it out of the slot). */
  def pumpAll(keys: Map[String, String], batch: Int = 10000): (Long, Long) = {
    def peek(): (Seq[String], String) = withClient { c =>
      val r = c.query(
        s"""SELECT lsn::text, data FROM pg_logical_slot_peek_changes(
            ${lit(slot)}, NULL, $batch)""").rows
      (r.map(_(1)).toSeq, r.lastOption.map(_(0)).getOrElse(""))
    }
    // advance past fully-applied WAL. peek/get stop only at transaction
    // boundaries, so upto_lsn = last peeked lsn consumes exactly the
    // peeked batch (later commits have strictly higher lsns)
    def advance(upto: String): Unit = {
      require(upto.matches("[0-9A-Fa-f]+/[0-9A-Fa-f]+"), s"unexpected lsn: $upto")
      withClient(_.query(
        s"""SELECT count(*) FROM pg_logical_slot_get_changes(
            ${lit(slot)}, '$upto'::pg_lsn, NULL)"""))
    }
    // keep polling past batches that decode only BEGIN/COMMIT markers —
    // stopping there would strand real changes behind a marker burst
    var (lines, lastLsn) = peek()
    var changes = lines.flatMap(parseChanges)
    while (changes.isEmpty && lines.nonEmpty) {
      advance(lastLsn) // markers only: consume them, look further
      val n = peek()
      lines = n._1; lastLsn = n._2
      changes = lines.flatMap(parseChanges)
    }
    if (changes.isEmpty) return (0L, 0L)
    val unmirrored = changes.map(_.table).distinct.filterNot(keys.contains)
    require(unmirrored.isEmpty,
      s"slot '$slot' decoded changes for unmirrored tables ${unmirrored.mkString(", ")} — " +
        "consuming them would lose data; add them to the keys map")
    var (u, d) = (0L, 0L)
    for ((table, group) <- changes.groupBy(_.table)) {
      val (au, ad) = apply(table, keys(table), group)
      u += au; d += ad
    }
    advance(lastLsn)
    (u, d)
  }

  private def apply(table: String, key: String, changes: Seq[Change]): (Long, Long) = {
    // TRUNCATE wipes everything decoded before it: clear the mirror and
    // apply only the changes after the LAST truncate in slot order
    val lastTrunc = changes.lastIndexWhere(_.op == "TRUNCATE")
    val effective =
      if (lastTrunc < 0) changes
      else { store.truncate(table); changes.drop(lastTrunc + 1) }
    // last-wins compaction per key IN SLOT ORDER: a key inserted then
    // deleted in one batch must apply as a delete, and vice versa
    val lastByKey = scala.collection.mutable.LinkedHashMap.empty[String, Change]
    effective.foreach { ch => ch.cols.get(key).foreach(k => lastByKey(k) = ch) }
    val (dels, ups) = lastByKey.values.toSeq.partition(_.op == "DELETE")

    val schema = store.read(table).schema
    if (ups.nonEmpty) {
      // text values -> typed columns via Spark casts against the store
      // schema (same coercion path the COPY sync reader uses)
      val strSchema = StructType(schema.fields.map(f =>
        StructField(f.name, StringType, nullable = true)))
      val rows = ups.map(ch =>
        Row.fromSeq(schema.fields.toIndexedSeq.map(f => ch.cols.get(f.name).orNull)))
      val strDf = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), strSchema)
      val typed = strDf.select(schema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      store.upsert(table, typed, key)
    }
    if (dels.nonEmpty) {
      val keyField = schema(schema.fieldIndex(key))
      val keysDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          dels.map(ch => Row(ch.cols(key))), 1),
        StructType(Seq(StructField(key, StringType))))
        .select(col(key).cast(keyField.dataType).as(key))
      store.deleteByKey(table, keysDf, key)
    }
    (ups.size.toLong, dels.size.toLong)
  }

  /** Drain the slot via the STREAMING replication protocol
    * (START_REPLICATION + standby feedback) instead of SQL polling — the
    * production CDC transport. The server pushes XLogData as WAL commits;
    * this consumer applies each pushed batch through the same keyed
    * idempotent store ops and only then acknowledges the applied LSN, so
    * a crash between apply and ack replays the batch (at-least-once
    * delivery, exactly-once keyed effect — the polling path's exact
    * discipline). The win over polling is WAL-retention: feedback flows
    * continuously, so `restart_lsn`/`confirmed_flush_lsn` advance at
    * APPLY speed and upstream WAL never accumulates behind a poll
    * cadence. Returns (upserts, deletes); stops once the stream idles
    * with nothing new for `idleMillis`. */
  def streamDrain(keys: Map[String, String], idleMillis: Int = 500): (Long, Long) =
    streamCore(keys, idleMillis, stopOnIdle = true, stop = () => false)

  /** CONTINUOUS streaming mirror: one replication connection held open,
    * applying pushed batches until `stop()` flips — the long-running
    * Syncer transport ([[Syncer.cdcMirror]]). Idle periods just wait for
    * the next push (and keep feedback flowing so the walsender never
    * times the standby out); the drain variant above instead returns on
    * the first idle window. */
  def streamMirror(keys: Map[String, String], stop: () => Boolean,
      idleMillis: Int = 500): (Long, Long) =
    streamCore(keys, idleMillis, stopOnIdle = false, stop)

  private def streamCore(keys: Map[String, String], idleMillis: Int,
      stopOnIdle: Boolean, stop: () => Boolean): (Long, Long) = {
    val rep = new PgReplicationClient(conn, slot)
    try {
      rep.start() // "0/0": the server clamps to the slot's confirmed_flush
      var (u, d) = (0L, 0L)
      var go = true
      while (go && !stop()) {
        val lines = rep.poll(idleMillis)
        val changes = lines.flatMap(PgCdc.parseChanges)
        if (changes.nonEmpty) {
          val unmirrored = changes.map(_.table).distinct.filterNot(keys.contains)
          require(unmirrored.isEmpty,
            s"slot '$slot' streamed changes for unmirrored tables ${unmirrored.mkString(", ")}")
          for ((table, group) <- changes.groupBy(_.table)) {
            val (au, ad) = apply(table, keys(table), group)
            u += au; d += ad
          }
        } else if (lines.isEmpty && stopOnIdle) go = false
        // acknowledge everything received ONLY after it is applied
        // (marker-only batches — BEGIN/COMMIT — acknowledge immediately)
        rep.sendStandbyStatus(rep.walEnd)
      }
      (u, d)
    } finally rep.close()
  }

  /** The continuous mirror loop, transport-negotiated: STREAMING
    * replication by default — standby feedback advances the slot at APPLY
    * speed, so a mirror that runs for months never lets upstream WAL
    * accumulate behind a poll cadence — degrading to bounded SQL polling
    * of the same slot when the server refuses replication connections
    * (pg_hba without a `replication` line, missing REPLICATION privilege).
    * The fallback decision is made at stream OPEN; a mid-stream failure
    * propagates (the operator should see a dying transport, not a silent
    * downgrade). Both transports apply through the same keyed idempotent
    * store ops, so switching transports can never double-apply. */
  def mirror(keys: Map[String, String], stop: () => Boolean,
      idleMillis: Int = 500): (Long, Long) = {
    val streamable =
      try { new PgReplicationClient(conn, slot).probe(); true }
      catch { case _: Exception => false }
    if (streamable) streamMirror(keys, stop, idleMillis)
    else {
      var (u, d) = (0L, 0L)
      while (!stop()) {
        val (a, b) = drainAll(keys)
        u += a; d += b
        if (a + b == 0) Thread.sleep(idleMillis.toLong)
      }
      (u, d)
    }
  }

  /** Drain the slot completely (poll until a batch comes back empty). */
  def drain(table: String, key: String): (Long, Long) = drainAll(Map(table -> key))

  def drainAll(keys: Map[String, String]): (Long, Long) = {
    var (u, d) = (0L, 0L)
    var go = true
    while (go) {
      val (pu, pd) = pumpAll(keys)
      u += pu; d += pd
      go = pu + pd > 0
    }
    (u, d)
  }

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"
}

object PgCdc {

  /** One decoded row change: `cols` holds column name → text value
    * (DELETE carries only the replica identity / key columns). */
  final case class Change(table: String, op: String, cols: Map[String, String])

  private val head = """table\s+(?:"?[\w$]+"?)\.("?[\w$]+"?):\s+(INSERT|UPDATE|DELETE|TRUNCATE):\s*(.*)""".r

  /** Parse one `test_decoding` data line. BEGIN/COMMIT markers return
    * None. Format (public, stable since 9.4):
    * `table public.t: INSERT: k[bigint]:7 v[text]:'a b' n[integer]:null`;
    * TRUNCATE decodes as `table public.t: TRUNCATE: (no-flags)` — dropping
    * it silently would leave the mirror holding rows upstream wiped. */
  private[graft] def parseChange(line: String): Option[Change] =
    parseChanges(line).headOption

  /** Full parse of one line — a KEY-CHANGING UPDATE (`UPDATE: old-key:
    * k[int]:1 new-tuple: k[int]:2 …`) decodes as TWO effects: the old
    * identity's row is deleted and the new tuple upserts under the new
    * key. Collapsing it to one change (or worse, dropping the mangled
    * line) leaves the mirror holding the stale old-key row forever —
    * silent divergence. */
  private[graft] def parseChanges(line: String): Seq[Change] = line match {
    case head(tbl, op, rest) =>
      val t = tbl.replace("\"", "")
      if (op == "TRUNCATE") Seq(Change(t, op, Map.empty))
      else {
        val (oldKey, cols) = parseColsSeg(rest)
        if (op == "UPDATE" && oldKey.nonEmpty)
          Seq(Change(t, "DELETE", oldKey), Change(t, "UPDATE", cols))
        else Seq(Change(t, op, cols))
      }
    case _ => Nil
  }

  /** Tokenize `name[type]:value ...` — values are either unquoted (up to
    * the next space) or ''-escaped quoted strings that may contain spaces
    * and colons. `null` (unquoted) means SQL NULL and is omitted. */
  private[graft] def parseCols(s: String): Map[String, String] =
    parseColsSeg(s)._2

  /** Segment-aware tokenizer: `old-key:` / `new-tuple:` markers (emitted
    * by test_decoding only for key-changing UPDATEs) switch the target
    * map. The markers can only match at a token-start position followed
    * by a space — a real column name is always followed by `[type]`, and
    * a quoted value's content never reaches this scanner — so no payload
    * can spoof them. Returns (old-key cols, tuple cols). */
  private[graft] def parseColsSeg(s: String): (Map[String, String], Map[String, String]) = {
    val oldKey = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val tuple = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var out = tuple
    var i = 0
    val n = s.length
    def done() = (oldKey.toMap, tuple.toMap)
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i >= n) return done()
      if (s.startsWith("old-key:", i)) { out = oldKey; i += 8 }
      else if (s.startsWith("new-tuple:", i)) { out = tuple; i += 10 }
      else {
      val br = s.indexOf('[', i)
      if (br < 0) return done()
      val name = s.substring(i, br).replace("\"", "")
      val close = s.indexOf(']', br)
      if (close < 0 || close + 1 >= n || s.charAt(close + 1) != ':') return done()
      i = close + 2
      if (i < n && s.charAt(i) == '\'') { // quoted value, '' escapes
        val sb = new java.lang.StringBuilder()
        i += 1
        var closed = false
        while (i < n && !closed) {
          val c = s.charAt(i)
          if (c == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
            else { closed = true; i += 1 }
          } else { sb.append(c); i += 1 }
        }
        out(name) = sb.toString
      } else {
        val sp = s.indexOf(' ', i)
        val raw = if (sp < 0) s.substring(i) else s.substring(i, sp)
        i = if (sp < 0) n else sp
        if (raw != "null") out(name) = raw
      }
      }
    }
    done()
  }
}
