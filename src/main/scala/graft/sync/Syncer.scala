package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-sync layer (SURVEY §3.3; reference: the three syncers —
  * full-refresh Postgres, cursor-incremental Amplitude, full-refresh Attio).
  * Spark-first shape: a source exposes DataFrames; the Syncer writes them
  * through the Store's atomic-replace / cursor-append paths. Backpressure,
  * batching and parallel reads are Spark's job (the reference hand-rolls a
  * 32 MB capped buffer + goroutine; a partitioned DataFrame read subsumes
  * both).
  */
trait SyncSource {
  def listTables(): Seq[String]
  def read(table: String): DataFrame
  /** unique-key column, required for upsert/cursor sync (the reference
    * panics when absent — postgres.go:190-192; we surface an error). */
  def uniqueKey(table: String): Option[String]
  def cursorColumn(table: String): Option[String]
  /** Release any staging the last read() left behind (spool files etc.);
    * called by Syncer once the table is durably written. No-op by default. */
  def releaseStaging(): Unit = ()
}

/** Directory-of-parquet source (stands in for an external system in tests;
  * also the shape of a lake-to-lake sync). */
class ParquetDirSource(spark: SparkSession, dir: String,
    keys: Map[String, String] = Map.empty,
    cursors: Map[String, String] = Map.empty) extends SyncSource {
  def listTables(): Seq[String] =
    new java.io.File(dir).list().toSeq
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted
  def read(table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$table.parquet")
  }
  def uniqueKey(table: String): Option[String] = keys.get(table)
  def cursorColumn(table: String): Option[String] = cursors.get(table)
}

/** JDBC source (the Postgres-syncer analog; reference introspects then
  * streams — postgres.go:51-201). Spark-first shape:
  *
  *  - `listTables()` discovers user tables dynamically from JDBC metadata
  *    when no static list is given (reference: information_schema.tables
  *    with include/exclude, postgres.go:51-104). Only type `TABLE` is
  *    listed, which skips partitioned parents (pgjdbc reports relkind='p'
  *    as `PARTITIONED TABLE`) and system catalogs, like the reference.
  *  - `uniqueKey()` introspects the single-column primary key, falling back
  *    to the first single-column unique index (reference reads pg_index,
  *    postgres.go:149-198); explicit `keys` entries override. `strict`
  *    makes discovery fail fast when a table has no unique key — the
  *    reference's panic (postgres.go:190-192) as an error.
  *  - `read()` probes `SELECT min(k), max(k)` first (one JDBC round-trip,
  *    the introspect-before-COPY shape) and hands Spark REAL partition
  *    bounds, so a 1000-executor cluster pulls key ranges in parallel.
  *    Static 0..Long.MaxValue bounds would put every sane key set in
  *    stride 0 — all rows through one task.
  *  - On Postgres, a driver-side anchor transaction exports a snapshot id
  *    (pg_export_snapshot) and every partition connection adopts it via
  *    SET TRANSACTION SNAPSHOT — ALL strides read one table-wide point in
  *    time, matching the reference's single-COPY-connection consistency
  *    (postgres.go:203-223) while still pulling ranges in parallel. The
  *    anchor holds until `releaseStaging()` (after the store write lands).
  *
  * Exercised in SyncSpec against an embedded Derby database (the snapshot
  * export is Postgres-only and degrades to per-stride isolation off PG). */
class JdbcSource(spark: SparkSession, url: String,
    tables: Seq[String] = Nil,
    keys: Map[String, String] = Map.empty,
    cursors: Map[String, String] = Map.empty,
    numPartitions: Int = 16,
    schema: Option[String] = None,
    connProps: Map[String, String] = Map.empty,
    strict: Boolean = false) extends SyncSource {

  private def withConnection[A](f: java.sql.Connection => A): A = {
    val props = new java.util.Properties()
    connProps.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  def listTables(): Seq[String] = {
    val ts =
      if (tables.nonEmpty) tables
      else withConnection { conn =>
        val rs = conn.getMetaData.getTables(null, schema.orNull, "%", Array("TABLE"))
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) buf += rs.getString("TABLE_NAME")
        buf.toSeq.sorted
      }
    if (strict) {
      val keyless = ts.filter(uniqueKey(_).isEmpty)
      if (keyless.nonEmpty) throw new IllegalStateException(
        s"tables without a unique key: ${keyless.mkString(", ")} " +
          "(configure `keys` or drop `strict`)")
    }
    ts
  }

  /** Quote an (optionally schema-qualified) identifier with the driver's
    * own quote string, so mixed-case / reserved-word names from JDBC
    * metadata survive interpolation. */
  private def quoted(conn: java.sql.Connection, id: String): String = {
    val q = Option(conn.getMetaData.getIdentifierQuoteString)
      .map(_.trim).filter(_.nonEmpty).getOrElse("\"")
    // a caller addressing a mixed-case/reserved name must pass it
    // PRE-quoted (Spark's JDBC dbtable/partitionColumn options interpolate
    // verbatim, so that is the working spelling) — strip the existing
    // quotes per segment before re-quoting or they would double
    id.split('.').map { p0 =>
      val p =
        if (p0.length >= 2 * q.length && p0.startsWith(q) && p0.endsWith(q))
          p0.substring(q.length, p0.length - q.length)
        else p0
      q + p.replace(q, q + q) + q
    }.mkString(".")
  }

  /** min/max of the key, via one driver-side JDBC query. None when the
    * table is empty, the key is all-NULL, or the column isn't numeric —
    * all of which fall back to a single-partition read. Identifiers are
    * quoted (metadata-cased names, reserved words); a user-passed name in
    * the "wrong" case for a case-folding database retries unquoted so the
    * database's own folding resolves it. */
  private def keyBounds(table: String, k: String): Option[(Long, Long)] =
    try withConnection { conn =>
      def run(t: String, c: String): Option[(Long, Long)] = {
        val rs = conn.createStatement().executeQuery(
          s"SELECT MIN($c), MAX($c) FROM $t")
        if (!rs.next()) None
        else {
          val lo = rs.getLong(1); val loNull = rs.wasNull()
          val hi = rs.getLong(2); val hiNull = rs.wasNull()
          if (loNull || hiNull) None else Some((lo, hi))
        }
      }
      try run(quoted(conn, table), quoted(conn, k))
      catch { case _: java.sql.SQLException => run(table, k) }
    } catch { case _: java.sql.SQLException | _: NumberFormatException => None }

  // ---- consistent snapshot across partitioned connections ----------------
  // A partitioned JDBC read opens one connection PER PARTITION; a plain
  // `BEGIN REPEATABLE READ` in sessionInitStatement would give each its own
  // snapshot — consistent per stride, not per table (the reference avoids
  // this by streaming one COPY connection, postgres.go:203-223). Postgres
  // exports a snapshot id from a driver-side anchor transaction
  // (pg_export_snapshot); every partition connection then adopts THAT
  // snapshot with SET TRANSACTION SNAPSHOT, so all strides read one
  // table-wide point in time. The anchor connection must stay open until
  // the read is materialized — held here, closed by releaseStaging().
  private var anchorConn: Option[java.sql.Connection] = None

  /** Export a snapshot id on a held-open anchor connection (Postgres only;
    * None elsewhere or on any failure — reads still run, per-stride). */
  private def exportSnapshot(): Option[String] =
    if (!url.startsWith("jdbc:postgresql")) None
    else try {
      releaseStaging() // a prior unreleased anchor must not leak its txn
      val props = new java.util.Properties()
      connProps.foreach { case (k, v) => props.setProperty(k, v) }
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        conn.setAutoCommit(false)
        conn.setTransactionIsolation(java.sql.Connection.TRANSACTION_REPEATABLE_READ)
        val rs = conn.createStatement().executeQuery("SELECT pg_export_snapshot()")
        if (rs.next()) {
          val id = rs.getString(1)
          anchorConn = Some(conn)
          Some(id)
        } else { conn.close(); None }
      } catch { case e: java.sql.SQLException => conn.close(); throw e }
    } catch { case _: java.sql.SQLException => None }

  override def releaseStaging(): Unit = {
    anchorConn.foreach { c => try c.rollback() finally c.close() }
    anchorConn = None
  }

  def read(table: String): DataFrame = {
    var base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(connProps)
    exportSnapshot().foreach { snapId =>
      base = base.option("sessionInitStatement", JdbcSource.snapshotInitSql(snapId))
    }
    uniqueKey(table).flatMap(k => keyBounds(table, k).map((k, _))) match {
      case Some((k, (lo, hi))) if hi > lo =>
        base.option("partitionColumn", k)
          .option("numPartitions", numPartitions)
          .option("lowerBound", lo.toString)
          .option("upperBound", hi.toString)
          .load()
      case _ => base.load()
    }
  }

  private val introspectedKeys =
    scala.collection.mutable.Map.empty[String, Option[String]]

  def uniqueKey(table: String): Option[String] =
    keys.get(table).orElse(introspectedKeys.getOrElseUpdate(table,
      try withConnection { conn =>
        val md = conn.getMetaData
        // JDBC metadata lookups are exact-match on identifier case; probe
        // the configured spelling, then the store-uppercased one (Derby).
        val spellings = Seq(table, table.toUpperCase).distinct
        def pk(t: String): Seq[String] = {
          val rs = md.getPrimaryKeys(null, schema.orNull, t)
          val cols = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
          while (rs.next()) cols += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
          cols.sortBy(_._1).map(_._2).toSeq
        }
        def singleUniqueIndex(t: String): Option[String] = {
          val rs = md.getIndexInfo(null, schema.orNull, t, true, false)
          // (index name -> columns); usable only if some index has exactly 1
          val byIndex = scala.collection.mutable.LinkedHashMap
            .empty[String, scala.collection.mutable.ArrayBuffer[String]]
          while (rs.next()) {
            val idx = rs.getString("INDEX_NAME")
            val c = rs.getString("COLUMN_NAME")
            if (idx != null && c != null)
              byIndex.getOrElseUpdate(idx, scala.collection.mutable.ArrayBuffer.empty) += c
          }
          byIndex.values.collectFirst { case cols if cols.size == 1 => cols.head }
        }
        spellings.iterator.map { t =>
          pk(t) match {
            case Seq(one) => Some(one)
            case Seq() => singleUniqueIndex(t)
            case _ => None // composite PK: not upsert-able by single key
          }
        }.collectFirst { case Some(k) => k }
      } catch { case _: java.sql.SQLException => None }))

  def cursorColumn(table: String): Option[String] = cursors.get(table)
}

object JdbcSource {
  /** Per-partition-connection init: adopt the anchor's exported snapshot so
    * every stride reads the same table-wide point in time. Postgres snapshot
    * ids are server-generated (`NNNNNNNN-NNNNNNNN-N`-shaped, no quotes) —
    * validated here so a hostile id can't escape the literal. */
  private[graft] def snapshotInitSql(snapId: String): String = {
    require(snapId.matches("[A-Za-z0-9-]+"), s"unexpected snapshot id: $snapId")
    "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY; " +
      s"SET TRANSACTION SNAPSHOT '$snapId'"
  }
}

/** Orchestrates full-refresh and cursor-incremental syncs with
  * include/exclude filters (syncer_utils.go). */
class Syncer(store: Store, source: SyncSource,
    include: Seq[String] = Nil, exclude: Seq[String] = Nil) {

  def tables(): Seq[String] =
    source.listTables()
      .filter(t => include.isEmpty || include.contains(t))
      .filterNot(exclude.contains)

  /** Atomic replace of every selected table (the Postgres/Attio shape). */
  def fullRefresh(): Seq[String] = {
    val ts = tables()
    ts.foreach { t =>
      store.replace(t, source.read(t))
      source.releaseStaging() // table is durably written; spool can go
    }
    ts
  }

  /** Continuous CDC mirror (the live-Postgres shape, superseding cursor
    * polling for sources that can decode WAL): create the slot FIRST, then
    * snapshot-load any table the store does not hold yet (the slot-first
    * order means the snapshot edge is covered; the keyed apply absorbs the
    * overlap), then keep applying decoded changes until `stop()` flips.
    * Transport is negotiated by [[PgCdc.mirror]]: STREAMING replication by
    * default — standby feedback advances `restart_lsn` at apply speed, so
    * however long the mirror runs (and however slow the consumer), the
    * upstream's retained-WAL footprint stays bounded by the in-flight
    * batch, not by a poll cadence — with SQL slot polling as the fallback
    * when the server refuses replication connections. Returns the applied
    * (upserts, deletes) totals. */
  def cdcMirror(cdc: PgCdc, wireSource: PgWireSource,
      keys: Map[String, String], stop: () => Boolean,
      idleMillis: Int = 500): (Long, Long) = {
    cdc.createSlot()
    keys.keys.toSeq.sorted.filterNot(store.exists)
      .foreach(t => cdc.initialSync(wireSource, t))
    cdc.mirror(keys, stop, idleMillis)
  }

  /** Cursor-based append (the Amplitude shape): new rows at/after the stored
    * max(cursor), overlap deduplicated by unique key. First sync of a table
    * degenerates to full refresh. */
  def incrementalSync(table: String): Unit = {
    val cursor = source.cursorColumn(table).getOrElse(
      throw new IllegalArgumentException(s"no cursor column configured for $table"))
    val key = source.uniqueKey(table).getOrElse(
      throw new IllegalArgumentException(s"table $table has no unique key"))
    if (!store.exists(table)) store.replace(table, source.read(table))
    else store.cursorAppend(table, source.read(table), cursor, key)
    source.releaseStaging()
  }
}
