package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.net.{HttpURLConnection, URL}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.zip.GZIPInputStream

/** Pagination strategy for an HTTP JSON export API. */
sealed trait HttpPaging

/** Offset/limit pages until an empty page — the Attio full-refresh shape
  * (reference: syncer-attio/lib/attio.go:41-90, ATTIO_API_LIMIT loop). */
final case class OffsetPaging(limit: Int = 500) extends HttpPaging

/** Fixed hourly export windows walked from `startHour` (format yyyyMMdd'T'HH)
  * until a 404/empty window — the Amplitude incremental shape (reference:
  * syncer-amplitude/lib/syncer.go:35-75 PAGINATION_TIME_INTERVAL walk,
  * amplitude.go:33-60 start/end query params). */
final case class HourlyWindowPaging(startHour: String, maxWindows: Int = 1000)
  extends HttpPaging

/** Paginated-HTTP JSON source (the Amplitude/Attio syncer shape re-expressed
  * as a SyncSource). The driver walks pages — an export API is a single
  * paginated stream, exactly as the reference's goroutine walks it — and
  * SPOOLS each page to NDJSON chunk files as it arrives, so driver memory
  * is bounded by ONE page regardless of table size (the reference streams
  * COPY output through a 32 MB capped buffer with blocking backpressure,
  * capped_buffer.go:9-22, and caps load batches at 1 GB,
  * iceberg_table_writer.go:14-17 — `maxChunkBytes` plays both roles here).
  * The expensive part, JSON decoding into typed rows, is distributed via
  * `spark.read.json` over the chunk files (one scan task per chunk).
  * Per-table `flatten` transforms map nested typed-value payloads to flat
  * columns (RestFlatten below carries the Attio extractors). Syncer handles
  * the write side: fullRefresh -> Store.replace, incrementalSync ->
  * Store.cursorAppend with overlap trim.
  */
class HttpJsonSource(
    spark: SparkSession,
    baseUrl: String,
    tables: Seq[String],
    keys: Map[String, String] = Map.empty,
    cursors: Map[String, String] = Map.empty,
    paging: HttpPaging = OffsetPaging(),
    headers: Map[String, String] = Map.empty,
    flatten: Map[String, DataFrame => DataFrame] = Map.empty,
    maxChunkBytes: Long = 32L * 1024 * 1024,
    spoolDir: Option[String] = None) extends SyncSource {

  def listTables(): Seq[String] = tables

  // spool filesystem resolved from the spoolDir path/URI (any configured
  // fs.* scheme — local tmp by default, hdfs://... on a multi-host master)
  private lazy val (spoolFs, spoolBase) = {
    val base = spoolDir.getOrElse(
      "file://" + System.getProperty("java.io.tmpdir"))
    val path = new org.apache.hadoop.fs.Path(base)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.setWriteChecksum(false)
    fs.setVerifyChecksum(false)
    fs.mkdirs(path)
    val qualified = fs.makeQualified(path)
    sweepStaleSpools(fs, qualified)
    (fs, qualified)
  }

  /** Crash-leak backstop: spool dirs are deleted by releaseStaging(), but a
    * process that dies mid-sync leaves its `graft-http-*` dirs behind
    * forever. The names are self-identifying, so on first spool use we
    * sweep siblings older than `staleSpoolMaxAgeMs` (default 24 h — far
    * beyond any live read, so a concurrent sync's active spool is never
    * touched). */
  private[graft] var staleSpoolMaxAgeMs: Long = 24L * 3600 * 1000
  private def sweepStaleSpools(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Unit =
    try {
      val cutoff = System.currentTimeMillis() - staleSpoolMaxAgeMs
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(base, "graft-http-*")))
        .getOrElse(Array.empty)
        .filter(st => st.isDirectory && st.getModificationTime < cutoff)
        .foreach(st => try fs.delete(st.getPath, true)
          catch { case _: Exception => () })
    } catch { case _: Exception => () }

  /** Chunk files the last read() spooled — observability for tests that
    * assert bounded buffering (pages >> chunk size => several chunks). */
  @volatile private[graft] var lastChunkCount: Int = 0

  /** Spool dirs of reads whose DataFrames may still be unconsumed. Syncer
    * calls releaseStaging() after each durable table write; without it a
    * long-running sync daemon would leak one on-disk table copy per read
    * until cleanup. The spool is written by the DRIVER (pages arrive on one
    * HTTP stream) through the Hadoop FileSystem of `spoolDir` — local tmp
    * by default; pass an `hdfs://`/shared-scheme URI on a multi-host
    * master so executors can read the chunks back, exactly as any
    * local-staging ingestion does. */
  private val staged =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.hadoop.fs.Path]()

  override def releaseStaging(): Unit = {
    var d = staged.poll()
    while (d != null) {
      try spoolFs.delete(d, true)
      catch { case _: Exception => () }
      d = staged.poll()
    }
  }

  def read(table: String): DataFrame = {
    val pages: Iterator[Seq[String]] = paging match {
      case OffsetPaging(limit) =>
        Iterator.from(0)
          .map(page => fetch(s"$baseUrl/$table?limit=$limit&offset=${page * limit}")
            .getOrElse(Seq.empty))
          .takeWhile(_.nonEmpty)
      case HourlyWindowPaging(startHour, maxWindows) =>
        val fmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HH")
        val start = LocalDateTime.parse(startHour, fmt)
        Iterator.range(0, maxWindows)
          .map { i =>
            val h = fmt.format(start.plusHours(i))
            fetch(s"$baseUrl/$table?start=$h&end=$h")
          }
          .takeWhile(_.isDefined) // 404 = no more exported hours yet
          .map(_.get)
    }
    // spool pages to NDJSON chunks, rotating at maxChunkBytes: memory stays
    // one-page-bounded and the decode parallelizes across chunks
    val dir = new org.apache.hadoop.fs.Path(spoolBase,
      s"graft-http-$table-${java.util.UUID.randomUUID()}")
    spoolFs.mkdirs(dir)
    staged.add(dir)
    var chunk = 0
    var bytes = 0L
    var out: java.io.Writer = null
    def rotate(): Unit = {
      if (out != null) out.close()
      val f = new org.apache.hadoop.fs.Path(dir, f"chunk-$chunk%05d.json")
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        spoolFs.create(f, true), java.nio.charset.StandardCharsets.UTF_8))
      chunk += 1
      bytes = 0L
    }
    try {
      pages.foreach { page =>
        page.foreach { line =>
          if (out == null || bytes >= maxChunkBytes) rotate()
          out.write(line)
          out.write('\n')
          // count ENCODED bytes, not UTF-16 chars — a multibyte payload
          // would otherwise overshoot the chunk cap by up to ~3x
          bytes += line.getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 1
        }
      }
    } finally if (out != null) out.close()
    lastChunkCount = chunk
    import spark.implicits._
    val raw =
      if (chunk == 0) spark.read.json(spark.createDataset(Seq.empty[String]))
      else spark.read.json(dir.toString)
    flatten.get(table).map(_(raw)).getOrElse(raw)
  }

  def uniqueKey(table: String): Option[String] = keys.get(table)
  def cursorColumn(table: String): Option[String] = cursors.get(table)

  /** GET one page; None on 404 (end of export), non-blank NDJSON lines
    * otherwise. Transparent gzip per the Amplitude export encoding. */
  private def fetch(url: String): Option[Seq[String]] = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestProperty("Accept-Encoding", "gzip")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      if (conn.getResponseCode == 404) return None
      if (conn.getResponseCode != 200)
        throw new java.io.IOException(s"HTTP ${conn.getResponseCode} from $url")
      val base = conn.getInputStream
      val is =
        if (conn.getContentEncoding == "gzip") new GZIPInputStream(base) else base
      try Some(scala.io.Source.fromInputStream(is, "UTF-8").getLines()
        .filter(_.trim.nonEmpty).toList)
      finally is.close()
    } finally conn.disconnect()
  }
}

/** Typed value flattening for Attio-style records (reference:
  * syncer-attio/lib/parser.go:1-193): every attribute arrives as an ARRAY of
  * typed wrapper objects; syncing takes the first element's payload field.
  * Columns are extracted scan-side (struct field access, codegen'd). */
object RestFlatten {
  // try_element_at: an EMPTY values array means "attribute unset" and must
  // flatten to NULL (parser.go FirstValue nil branch), not an ANSI error
  private def first(c: Column): Column = try_element_at(c, lit(1))
  def firstValue(c: Column): Column = first(c)("value")
  def firstDomain(c: Column): Column = first(c)("domain")
  def firstSelect(c: Column): Column = first(c)("option")("title")
  def firstStatus(c: Column): Column = first(c)("status")("title")
  def firstCurrency(c: Column): Column = first(c)("currency_value")
  def firstEmail(c: Column): Column = first(c)("email_address")
  def firstPhone(c: Column): Column = first(c)("phone_number")
  def firstName(c: Column): Column = first(c)("full_name")
  def firstRelationship(c: Column): Column = first(c)("target_record_id")
  def firstInteraction(c: Column): Column = first(c)("interacted_at")
  def firstUser(c: Column): Column = first(c)("referenced_actor_id")
}
