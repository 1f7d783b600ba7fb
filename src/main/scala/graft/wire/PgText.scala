package graft

import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** PG text-format value encoding (response_handler.go:148-233), factored
  * into a serializable OBJECT so the COPY TO STDOUT data phase can encode
  * rows into pre-framed CopyData chunks ON EXECUTORS
  * (PgWireServer.sendCopyOut): at cluster scale the text encode
  * parallelizes with the scan across every core/executor, and the driver's
  * only per-byte work is pumping framed chunks into the socket. */
object PgText {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Field-aware text encoding: the PgTypes logical tag turns micros-of-day
    * longs back into clock-time text; everything else defers to the
    * type-driven encoder. */
  private[graft] def textEncodeField(row: Row, i: Int, f: StructField): String = {
    val logical =
      if (f.metadata.contains(PgTypes.LogicalKey))
        f.metadata.getString(PgTypes.LogicalKey)
      else ""
    (f.dataType, logical) match {
      case (LongType, "time" | "timetz") =>
        val t = java.time.LocalTime.ofNanoOfDay(row.getLong(i) * 1000)
        timeFmt.format(t).replaceAll("\\.?0+$", "")
      case (TimestampType, "timestamptz") =>
        // STORED timestamptz is TIMESTAMP at rest (no offset on output,
        // response_handler.go:192-195 formats stored cols as TIMESTAMP);
        // only computed ::timestamptz values carry the +00:00 suffix
        val inst = row.getAs[java.sql.Timestamp](i).toInstant
        tsFmt.format(inst.atZone(java.time.ZoneOffset.UTC)).replaceAll("\\.?0+$", "")
      case _ => textEncode(row, i, f.dataType)
    }
  }

  private val timeFmt = DateTimeFormatter.ofPattern("HH:mm:ss.SSSSSS")

  // Temporal text-encode memo: COPY streams millions of cells through the
  // formatter+regex path below, and analytic temporal columns repeat
  // heavily (TPC-H dates span ~2500 distinct days) — a bounded map turns
  // the per-CELL DateTimeFormatter + trailing-zero regex into a per-VALUE
  // one. Size-capped clear keeps a pathological high-cardinality column
  // from growing it without bound; ConcurrentHashMap because connections
  // encode on their own threads.
  private val temporalMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), String]()
  private def memoized(kind: Int, key: Long)(render: => String): String = {
    if (temporalMemo.size > 65536) temporalMemo.clear()
    temporalMemo.computeIfAbsent((kind, key), _ => render)
  }
  // Injective nanosecond key for the memo: sec*1e9 + nanos. Outside the
  // ~±292-year Long-nanos range the multiply wraps and distinct instants
  // could collide, so signal the caller to skip the memo (PG timestamps
  // reach year 294276). NOTE: never key on getTime*1e6 + getNanos —
  // getTime already carries the millis, so that form double-counts them
  // and collides (e.g. 10:00:00.600 vs 10:00:01.100).
  private final val NoMemo = Long.MinValue
  private def nanoKey(epochSecond: Long, nanos: Int): Long =
    if (epochSecond > 9000000000L || epochSecond < -9000000000L) NoMemo
    else epochSecond * 1000000000L + nanos
  private def memoizedNs(kind: Int, key: Long)(render: => String): String =
    if (key == NoMemo) render else memoized(kind, key)(render)

  /** PG text-format value encoding (response_handler.go:148-233). */
  private[graft] def textEncode(row: Row, i: Int, dt: DataType): String = dt match {
    case BooleanType => if (row.getBoolean(i)) "t" else "f"
    case FloatType => goFloatF(row.getFloat(i))
    case DoubleType => goFloat(row.getDouble(i))
    case TimestampType =>
      // live TIMESTAMPTZ values render with the normalized-UTC offset
      // (response_handler.go:196: "2006-01-02 15:04:05.999999-07:00")
      val ts = row.getAs[java.sql.Timestamp](i)
      memoizedNs(1, nanoKey(Math.floorDiv(ts.getTime, 1000L), ts.getNanos)) {
        tsFmt.format(ts.toInstant.atZone(java.time.ZoneOffset.UTC))
          .replaceAll("\\.?0+$", "") + "+00:00"
      }
    case TimestampNTZType => { // surfaces as LocalDateTime, not Timestamp
      val ldt = row.getAs[java.time.LocalDateTime](i)
      memoizedNs(2, nanoKey(ldt.toEpochSecond(java.time.ZoneOffset.UTC), ldt.getNano)) {
        tsFmt.format(ldt).replaceAll("\\.?0+$", "")
      }
    }
    case DateType => { // java.sql.Date.toString truncates 5-digit years
      val d = row.getAs[java.sql.Date](i)
      memoized(3, d.getTime) {
        val ld = d.toLocalDate
        f"${ld.getYear}%04d-${ld.getMonthValue}%02d-${ld.getDayOfMonth}%02d"
      }
    }
    case _: ArrayType =>
      // the reference CSV-encodes array elements (response_handler.go:
      // 348-369: Go encoding/csv — quote only on , " or newline, doubling
      // inner quotes; elements themselves render through fmt "%v")
      row.getSeq[Any](i).map {
        case null => "NULL"
        case b: Boolean => b.toString
        case d: java.math.BigDecimal => goFloat(d.doubleValue)
        case d: org.apache.spark.sql.types.Decimal => goFloat(d.toDouble)
        case d: Double => goFloat(d)
        case f: Float => goFloatF(f)
        case v => v.toString
      }.map { s =>
        if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
          "\"" + s.replace("\"", "\"\"") + "\""
        else s
      }.mkString("{", ",", "}")
    case _: DecimalType =>
      // the reference scans every DECIMAL as duckdb.Decimal and emits
      // fmt.Sprintf("%v", value.Float64()) (response_handler.go:268-271) —
      // Go shortest-float formatting, scientific once the exponent hits 6
      goFloat(row.getDecimal(i).doubleValue)
    case BinaryType =>
      "\\x" + row.getAs[Array[Byte]](i).map("%02x".format(_)).mkString
    // intervals render through the reference's NullInterval.String():
    // "%d months %d days %d microseconds" (response_handler.go:293-298)
    case _: DayTimeIntervalType =>
      val d = row.getAs[java.time.Duration](i)
      val days = d.toDays
      val micros = (d.getSeconds - days * 86400L) * 1000000L + d.getNano / 1000
      s"0 months $days days $micros microseconds"
    case _: YearMonthIntervalType =>
      val p = row.getAs[java.time.Period](i)
      s"${p.toTotalMonths} months 0 days 0 microseconds"
    case CalendarIntervalType =>
      val ci = row.get(i).asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
      s"${ci.months} months ${ci.days} days ${ci.microseconds} microseconds"
    case _ => row.get(i).toString
  }

  /** Go `fmt.Sprintf("%v", float64)` — shortest round-trip digits, switching
    * to e-notation when the decimal exponent is < -4 or >= 6, two-digit
    * exponent field (strconv 'g' with shortest precision). */
  private[graft] def goFloat(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d == Double.PositiveInfinity) return "+Inf"
    if (d == Double.NegativeInfinity) return "-Inf"
    if (d == 0.0) return if (1 / d < 0) "-0" else "0"
    val sign = if (d < 0) "-" else ""
    sign + goDigits(java.lang.Double.toString(math.abs(d)))
  }

  /** Go "%v" of a float32: shortest digits for the FLOAT value (widening to
    * double first would add garbage digits). */
  private[graft] def goFloatF(f: Float): String = {
    if (f.isNaN) return "NaN"
    if (f == Float.PositiveInfinity) return "+Inf"
    if (f == Float.NegativeInfinity) return "-Inf"
    if (f == 0.0f) return if (1 / f < 0) "-0" else "0"
    val sign = if (f < 0) "-" else ""
    sign + goDigits(java.lang.Float.toString(math.abs(f)))
  }

  /** Shortest-digit Java float repr -> Go 'g' form (e-notation when the
    * decimal exponent is < -4 or >= 6). */
  private def goDigits(s: String): String = {
    // Fast path (COPY hot loop): Java already prints the shortest
    // round-trip digits, so for plain mid-range values — no exponent,
    // 1-6 integer digits, not 0.x — the Go form differs only in the
    // integer-valued ".0" suffix. Everything else (e-notation, subnormal,
    // 0.x, >= 1e6) takes the full rewrite below.
    val pt = s.indexOf('.')
    if (pt > 0 && pt <= 6 && s.charAt(0) != '0' && s.indexOf('E') < 0)
      return if (s.endsWith(".0")) s.substring(0, s.length - 2) else s
    val (mant, exp10) = s.indexOf('E') match {
      case -1 => (s, 0)
      case p => (s.substring(0, p), s.substring(p + 1).toInt)
    }
    val point = mant.indexOf('.')
    val digitsRaw = mant.replace(".", "")
    val digits = digitsRaw.dropWhile(_ == '0')
    val exp = (if (point < 0) mant.length else point) - 1 + exp10 -
      (digitsRaw.length - digits.length)
    val dd0 = digits.reverse.dropWhile(_ == '0').reverse
    val dd = if (dd0.isEmpty) "0" else dd0
    if (exp < -4 || exp >= 6) {
      val m = if (dd.length == 1) dd else dd.head + "." + dd.tail
      f"${m}e${if (exp < 0) "-" else "+"}${math.abs(exp)}%02d"
    } else if (exp >= 0) {
      if (dd.length > exp + 1) s"${dd.take(exp + 1)}.${dd.drop(exp + 1)}"
      else dd + "0" * (exp + 1 - dd.length)
    } else "0." + "0" * (-exp - 1) + dd
  }


  /** TSV cell escaping, single pass with a scan-first fast path (most
    * analytic cells escape nothing). */
  private def appendEscaped(sb: java.lang.StringBuilder, v: String): Unit = {
    var needs = false
    var i = 0
    while (!needs && i < v.length) {
      val c = v.charAt(i)
      needs = c == '\\' || c == '\t' || c == '\n' || c == '\r'
      i += 1
    }
    if (!needs) { sb.append(v); () }
    else {
      i = 0
      while (i < v.length) {
        v.charAt(i) match {
          case '\\' => sb.append("\\\\")
          case '\t' => sb.append("\\t")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case c => sb.append(c)
        }
        i += 1
      }
    }
  }

  private[graft] def csvQuote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** One row as a COPY text line (no trailing newline) into `sb`. */
  private def appendRow(sb: java.lang.StringBuilder, row: Row,
      fields: Array[StructField], csv: Boolean): Unit = {
    val delim = if (csv) ',' else '\t'
    var i = 0
    while (i < fields.length) {
      if (i > 0) sb.append(delim)
      if (row.isNullAt(i)) { if (!csv) sb.append("\\N") }
      else {
        val v = textEncode(row, i, fields(i).dataType)
        if (csv) sb.append(csvQuote(v)) else appendEscaped(sb, v)
      }
      i += 1
    }
  }

  /** One pre-framed CopyData message carrying `line` + newline. */
  private[graft] def frameLine(line: String): Array[Byte] = {
    val bytes = (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](bytes.length + 5)
    val len = bytes.length + 4
    out(0) = 'd'.toByte
    out(1) = ((len >>> 24) & 0xff).toByte; out(2) = ((len >>> 16) & 0xff).toByte
    out(3) = ((len >>> 8) & 0xff).toByte; out(4) = (len & 0xff).toByte
    System.arraycopy(bytes, 0, out, 5, bytes.length)
    out
  }

  /** Rows -> pre-framed CopyData ('d') chunks of ~1 MiB, each tagged with
    * its row count — the DISTRIBUTED half of COPY TO STDOUT. Runs inside
    * mapPartitions on executor tasks; the driver concatenates chunks in
    * partition order (which preserves any ORDER BY: a global sort
    * range-partitions, and within-partition order survives mapPartitions). */
  /** Executor-side DataRow framing for fat plain-SELECT drains: encodes
    * rows into ~1 MiB chunks of pre-framed 'D' (DataRow, text format)
    * messages, the protocol twin of [[encodeCopyChunks]]. The driver's
    * per-byte work collapses to pumping chunks into the socket — the same
    * scaling property COPY got, for the path a BI tool or
    * `psql -c "SELECT * FROM big"` actually uses. */
  def encodeDataRowChunks(rows: Iterator[Row], fields: Array[StructField])
      : Iterator[(Long, Array[Byte])] =
    new Iterator[(Long, Array[Byte])] {
      def hasNext: Boolean = rows.hasNext
      def next(): (Long, Array[Byte]) = {
        val buf = new java.io.ByteArrayOutputStream(1 << 20)
        val d = new java.io.DataOutputStream(buf)
        val cell = new java.io.ByteArrayOutputStream(256)
        val cd = new java.io.DataOutputStream(cell)
        var n = 0L
        while (rows.hasNext && buf.size < (1 << 20)) {
          val row = rows.next()
          cell.reset()
          cd.writeShort(fields.length)
          var i = 0
          while (i < fields.length) {
            if (row.isNullAt(i)) cd.writeInt(-1)
            else {
              val bytes = textEncodeField(row, i, fields(i))
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              cd.writeInt(bytes.length); cd.write(bytes)
            }
            i += 1
          }
          d.writeByte('D'); d.writeInt(4 + cell.size())
          cell.writeTo(buf)
          n += 1
        }
        (n, buf.toByteArray)
      }
    }

  def encodeCopyChunks(rows: Iterator[Row], fields: Array[StructField],
      csv: Boolean): Iterator[(Long, Array[Byte])] =
    new Iterator[(Long, Array[Byte])] {
      private val sb = new java.lang.StringBuilder(256)
      def hasNext: Boolean = rows.hasNext
      def next(): (Long, Array[Byte]) = {
        val buf = new java.io.ByteArrayOutputStream(1 << 20)
        var n = 0L
        while (rows.hasNext && buf.size < (1 << 20)) {
          sb.setLength(0)
          appendRow(sb, rows.next(), fields, csv)
          buf.write(frameLine(sb.toString))
          n += 1
        }
        (n, buf.toByteArray)
      }
    }
}
