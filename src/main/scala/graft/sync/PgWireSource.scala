package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Connection coordinates for [[PgWireSource]] — serializable, so executor
  * tasks can open their own wire connections. */
final case class PgConnInfo(host: String, port: Int, user: String,
    database: String, password: Option[String] = None) {
  def connect(): PgWireClient =
    new PgWireClient(host, port, user, database, password)
}

/** Live-Postgres sync source over the in-repo wire client (no JDBC driver
  * needed): the Spark-first re-expression of the reference's Postgres
  * syncer (reference: /root/reference/src/syncer-postgres/lib/postgres.go
  * 51-223 — introspect schema + keys, then stream COPY under one
  * repeatable-read snapshot).
  *
  * Scale shape, designed for a 1000-executor pull of a large table:
  *  - The driver opens ONE anchor connection, takes a REPEATABLE READ
  *    snapshot and exports it (`pg_export_snapshot`). Every partition task
  *    then opens its own connection and adopts THAT snapshot with
  *    `SET TRANSACTION SNAPSHOT` — all partitions observe one table-wide
  *    point in time (the parallel form of the reference's single-COPY
  *    consistency), while rows flow over N sockets concurrently.
  *  - Each partition reads its key range via `COPY (SELECT …) TO STDOUT`
  *    — the same streaming mechanism the reference uses — decoded
  *    incrementally off the socket (never a whole-partition buffer).
  *  - Keyless tables degrade to one COPY partition, exactly the
  *    reference's shape.
  *  - Schema comes from pg_attribute introspection mapped through
  *    [[PgTypes]], so bytea→binary, numeric(p,s)→decimal, int8→
  *    decimal(38,0) etc. match the reference's column mapping.
  */
class PgWireSource(spark: SparkSession, conn: PgConnInfo,
    tables: Seq[String] = Nil,
    keys: Map[String, String] = Map.empty,
    cursors: Map[String, String] = Map.empty,
    numPartitions: Int = 16,
    pgSchema: String = "public") extends SyncSource {

  import PgWireSource._

  private def withClient[A](f: PgWireClient => A): A = {
    val c = conn.connect()
    try f(c) finally c.close()
  }

  def listTables(): Seq[String] =
    if (tables.nonEmpty) tables
    else withClient { c =>
      // relkind='r' only: skips partitioned parents ('p'), views, matviews
      c.query(
        s"""SELECT c.relname FROM pg_class c
            JOIN pg_namespace n ON c.relnamespace = n.oid
            WHERE n.nspname = ${lit(pgSchema)} AND c.relkind = 'r'
            ORDER BY 1""").rows.map(_(0)).toSeq
    }

  /** Column (name, type name, typmod) from pg_attribute — the reference's
    * introspection query shape (pg_schema_column.go). */
  private def columns(table: String): Seq[(String, String, Int)] = withClient { c =>
    val r = c.query(
      s"""SELECT a.attname, t.typname, a.atttypmod
          FROM pg_attribute a
          JOIN pg_class cl ON a.attrelid = cl.oid
          JOIN pg_namespace n ON cl.relnamespace = n.oid
          JOIN pg_type t ON a.atttypid = t.oid
          WHERE n.nspname = ${lit(pgSchema)} AND cl.relname = ${lit(table)}
            AND a.attnum > 0 AND NOT a.attisdropped
          ORDER BY a.attnum""")
    if (r.rows.isEmpty) throw new IllegalArgumentException(
      s"table not found: $pgSchema.$table")
    r.rows.map(row => (row(0), row(1), Option(row(2)).map(_.toInt).getOrElse(-1))).toSeq
  }

  def sparkSchema(table: String): StructType = toSchema(columns(table))

  private def toSchema(cols: Seq[(String, String, Int)]): StructType = StructType(
    cols.map { case (name, typ, typmod) =>
      // numeric typmod packs (precision << 16 | scale) + 4
      val (p, s) =
        if ((typ == "numeric" || typ == "decimal") && typmod >= 4)
          (((typmod - 4) >> 16) & 0xffff, (typmod - 4) & 0xffff)
        else (0, 0)
      PgTypes.toSpark(typ, p, s).copy(name = name)
    })

  def uniqueKey(table: String): Option[String] =
    keys.get(table).orElse(withClient { c =>
      // single-column primary key, else first single-column unique index
      val r = c.query(
        s"""SELECT a.attname, i.indisprimary
            FROM pg_index i
            JOIN pg_class cl ON i.indrelid = cl.oid
            JOIN pg_namespace n ON cl.relnamespace = n.oid
            JOIN pg_attribute a ON a.attrelid = i.indrelid
              AND a.attnum = i.indkey[0]
            WHERE n.nspname = ${lit(pgSchema)} AND cl.relname = ${lit(table)}
              AND i.indisunique AND i.indnkeyatts = 1
            ORDER BY i.indisprimary DESC, a.attname""")
      r.rows.headOption.map(_(0))
    })

  def cursorColumn(table: String): Option[String] = cursors.get(table)

  // ---- snapshot anchor -----------------------------------------------------

  private var anchor: Option[PgWireClient] = None

  /** Export a snapshot from a held-open repeatable-read anchor txn. The
    * anchor must outlive every partition read — held until
    * [[releaseStaging]] (Syncer calls it after the store write lands). */
  private def exportSnapshot(): String = {
    releaseStaging()
    val c = conn.connect()
    c.query("BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY")
    val id = c.query("SELECT pg_export_snapshot()").scalar
    require(id.matches("[A-Za-z0-9-]+"), s"unexpected snapshot id: $id")
    anchor = Some(c)
    id
  }

  override def releaseStaging(): Unit = {
    anchor.foreach { c =>
      try c.query("ROLLBACK") catch { case _: Exception => }
      c.close()
    }
    anchor = None
  }

  /** min/max of the key under the ANCHOR snapshot (bounds and rows observe
    * the same point in time). None → single-partition COPY. */
  private def keyBounds(table: String, k: String): Option[(Long, Long)] =
    anchor.flatMap { c =>
      try {
        val r = c.query(
          s"SELECT min(${q(k)}), max(${q(k)}) FROM ${q(pgSchema)}.${q(table)}")
        (Option(r.rows.head(0)), Option(r.rows.head(1))) match {
          case (Some(lo), Some(hi)) => Some((lo.toLong, hi.toLong))
          case _ => None
        }
      } catch { case _: PgClientException | _: NumberFormatException => None }
    }

  def read(table: String): DataFrame = {
    val colDefs = columns(table)
    val schema = toSchema(colDefs)
    val cols = colDefs.map(c => q(c._1)).mkString(", ")
    val from = s"${q(pgSchema)}.${q(table)}"
    val snapId = exportSnapshot()
    val slices: Seq[String] = uniqueKey(table)
      .flatMap(k => keyBounds(table, k).map((k, _))) match {
      case Some((k, (lo, hi))) if hi > lo =>
        val n = math.min(numPartitions.toLong, hi - lo + 1).toInt
        val stride = (hi - lo) / n + 1
        val kq = q(k)
        (0 until n).map { i =>
          val a = lo + i * stride
          val b = a + stride
          if (i == n - 1) s"SELECT $cols FROM $from WHERE $kq >= $a OR $kq IS NULL"
          else s"SELECT $cols FROM $from WHERE $kq >= $a AND $kq < $b"
        }
      case _ => Seq(s"SELECT $cols FROM $from")
    }
    val info = conn
    val fieldMeta = schema.fields.map(f =>
      (f.dataType, if (f.metadata.contains(PgTypes.LogicalKey))
        f.metadata.getString(PgTypes.LogicalKey) else ""))
    val rdd = spark.sparkContext
      .parallelize(slices, slices.length)
      .mapPartitions { it =>
        it.flatMap { sel =>
          val c = info.connect()
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => c.close()))
          c.query("BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY")
          c.query(s"SET TRANSACTION SNAPSHOT '$snapId'")
          c.query("SET TIME ZONE 'UTC'") // deterministic timestamptz text
          c.copyOutIter(s"COPY ($sel) TO STDOUT").map { line =>
            parseCopyLine(line, fieldMeta)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}

object PgWireSource {

  /** Quote an identifier (server-side names can be mixed-case/reserved). */
  private def q(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  /** Single-quoted SQL literal for introspection parameters. */
  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** One PG text-format COPY line → a Spark Row, per the PgTypes mapping.
    * Fields separate on RAW tabs (escaped \t inside a value survives),
    * then each field unescapes and converts. */
  private[graft] def parseCopyLine(line: String,
      fields: Array[(DataType, String)]): Row = {
    val raw = line.split("\t", -1)
    require(raw.length == fields.length,
      s"COPY row has ${raw.length} fields, schema expects ${fields.length}")
    Row.fromSeq(raw.toIndexedSeq.zip(fields.toIndexedSeq).map { case (cell, (dt, logical)) =>
      if (cell == "\\N") null
      else convert(PgWireClient.unescapeCopy(cell), dt, logical)
    })
  }

  private[graft] def convert(s: String, dt: DataType, logical: String): Any = dt match {
    case BooleanType => s == "t" || s == "true"
    case IntegerType =>
      if (logical == "bit") Integer.parseInt(s, 2) else s.toInt
    case LongType => logical match {
      case "time" | "timetz" => microsOfDay(s)
      case _ => s.toLong
    }
    case FloatType => s match {
      case "NaN" => Float.NaN
      case "Infinity" => Float.PositiveInfinity
      case "-Infinity" => Float.NegativeInfinity
      case _ => s.toFloat
    }
    case DoubleType => s match {
      case "NaN" => Double.NaN
      case "Infinity" => Double.PositiveInfinity
      case "-Infinity" => Double.NegativeInfinity
      case _ => s.toDouble
    }
    case _: DecimalType if logical == "interval" => intervalMicros(s)
    case _: DecimalType => BigDecimal(s)
    case DateType => java.sql.Date.valueOf(java.time.LocalDate.parse(s))
    case TimestampNTZType =>
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    case TimestampType =>
      // with the connection pinned to UTC the text is "… ±HH[:MM]"
      java.time.OffsetDateTime.parse(normalizeOffset(s).replace(' ', 'T')).toInstant
    case BinaryType =>
      require(s.startsWith("\\x"), s"unexpected bytea text: ${s.take(8)}")
      hexDecode(s.drop(2))
    case ArrayType(et, _) =>
      parseArray(s).map(e => if (e == null) null else convert(e, et, logical))
    case StringType if logical == "bpchar" =>
      s.replaceAll("\\s+$", "") // reference right-trims bpchar on ingest
    case _ => s
  }

  /** "HH:MM:SS[.ffffff][±TZ]" → micros of day (offset of timetz dropped —
    * the stored long is the local clock reading, reference convention). */
  private def microsOfDay(s: String): Long = {
    val local = s.takeWhile(c => c != '+' && c != '-')
    val t = java.time.LocalTime.parse(local)
    t.toNanoOfDay / 1000
  }

  /** PG interval text ("1 year 2 mons 3 days 04:05:06.789") → micros under
    * the reference's storage convention (months×30 days, days×24 h). */
  private[graft] def intervalMicros(s: String): BigDecimal = {
    var months = 0L; var days = 0L; var timeMicros = 0L; var sign = 1L
    val unit = """(-?\d+)\s+(year|years|mon|mons|day|days)""".r
    for (m <- unit.findAllMatchIn(s)) m.group(2) match {
      case "year" | "years" => months += m.group(1).toLong * 12
      case "mon" | "mons" => months += m.group(1).toLong
      case _ => days += m.group(1).toLong
    }
    val time = """(-?)(\d+):(\d+):(\d+(?:\.\d+)?)""".r
    time.findFirstMatchIn(s).foreach { m =>
      sign = if (m.group(1) == "-") -1 else 1
      val secs = BigDecimal(m.group(2)).*(3600) + BigDecimal(m.group(3)) * 60 +
        BigDecimal(m.group(4))
      timeMicros = (secs * 1000000).toLong
    }
    BigDecimal((months * 30 + days) * 86400000000L + sign * timeMicros)
  }

  /** "{a,b,NULL,"c,d"}" → elements (null for NULL), PG array text rules.
    * `trimUnquoted` is the INGEST mode (user-typed literals: PG ignores
    * whitespace around elements, and around the quotes of a quoted
    * element); the default (false) is the wire mode, where PG's canonical
    * output never pads and every byte is payload. */
  private[graft] def parseArray(s: String, trimUnquoted: Boolean = false): Seq[String] = {
    require(s.startsWith("{") && s.endsWith("}"),
      s"malformed array literal: ${s.take(32)}")
    val body = s.substring(1, s.length - 1)
    if (body.trim.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder()
    var quoted = false; var wasQuoted = false
    var qs = -1; var qe = -1 // cur offsets of the quoted span's bounds
    var i = 0
    def flush(): Unit = {
      var v = cur.toString
      if (trimUnquoted) {
        if (!wasQuoted) v = v.trim
        // whitespace around a quoted span sits OUTSIDE the quotes — strip
        // only that, preserving significant spaces the quoting protects
        else v = v.substring(0, qs).trim + v.substring(qs, qe) + v.substring(qe).trim
      }
      out += (if (!wasQuoted && v == "NULL") null else v)
      cur.setLength(0); wasQuoted = false; qs = -1; qe = -1
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (quoted) c match {
        case '\\' => cur.append(body.charAt(i + 1)); i += 1
        case '"' => quoted = false; qe = cur.length
        case _ => cur.append(c)
      } else c match {
        case '"' =>
          quoted = true
          if (!wasQuoted) qs = cur.length
          wasQuoted = true
        case ',' => flush()
        case '\\' => cur.append(body.charAt(i + 1)); i += 1
        case _ => cur.append(c)
      }
      i += 1
    }
    // an unterminated quote would leave qe at -1 and the trim-mode
    // substring math out of bounds — raise PG's error instead
    require(!quoted, s"malformed array literal: ${s.take(32)}")
    flush()
    out.toSeq
  }

  private def hexDecode(h: String): Array[Byte] = {
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  /** PG renders UTC as "+00"; OffsetDateTime needs "+00:00". */
  private def normalizeOffset(s: String): String =
    if (s.length >= 3 && (s.charAt(s.length - 3) == '+' || s.charAt(s.length - 3) == '-'))
      s + ":00"
    else s
}
