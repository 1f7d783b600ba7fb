package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

class SyncSpec extends SparkSpecBase with BeforeAndAfterAll {

  // syncing a table literally named "events" publishes it as a session view
  // (reference shell-table behavior), shadowing the testdata view other
  // suites resolve in SQL — restore it when this suite finishes
  override def afterAll(): Unit = {
    Tables.invalidate()
    Tables.registerAll(spark, sfDir)
  }

  test("pg type mapping follows the reference's table (SURVEY 1.4)") {
    import org.apache.spark.sql.types._
    def dt(pg: String, p: Int = 0, s: Int = 0) = PgTypes.toSpark(pg, p, s).dataType
    assert(dt("bool") == BooleanType)
    assert(dt("int4") == IntegerType)
    assert(dt("xid") == LongType)
    assert(dt("int8") == DecimalType(38, 0))   // unsigned-range safety
    assert(dt("interval") == DecimalType(38, 6))
    assert(dt("float4") == FloatType && dt("float8") == DoubleType)
    assert(dt("numeric", 10, 2) == DecimalType(10, 2))
    assert(dt("numeric", 99, 2) == DecimalType(38, 6))  // clamp like reference
    assert(dt("numeric") == DecimalType(38, 6))
    assert(dt("timestamp") == TimestampNTZType && dt("timestamptz") == TimestampType)
    assert(dt("jsonb") == StringType && dt("uuid") == StringType)
    assert(dt("bytea") == BinaryType)
    assert(dt("_int4") == ArrayType(IntegerType)) // PG arrays: single-level list
    assert(dt("custom_enum") == StringType)
    assert(PgTypes.toSpark("jsonb").metadata.getString(PgTypes.LogicalKey) == "jsonb")
  }

  private def freshStore(): Store =
    new Store(spark, java.nio.file.Files.createTempDirectory("graft-sync").toString)

  test("full refresh replicates all source tables, honoring filters") {
    val st = freshStore()
    val src = new ParquetDirSource(spark, sfDir)
    val synced = new Syncer(st, src, include = Seq("region", "nation")).fullRefresh()
    assert(synced == Seq("nation", "region"))
    assert(st.read("nation").count() == 25)
    assert(st.read("region").count() == 5)

    val excluded = new Syncer(st, src, exclude = Seq("lineitem", "events", "orders",
      "customer", "supplier", "part", "documents", "embeddings")).tables()
    assert(excluded == Seq("nation", "region"))
  }

  test("incremental sync converges to the full table across batches") {
    val st = freshStore()
    val src = new ParquetDirSource(spark, sfDir,
      keys = Map("events" -> "event_id"), cursors = Map("events" -> "ts"))
    val full = src.read("events")

    // batch 1: seed with the earlier (by ts — the cursor) half only. ts has
    // shipped both as raw long nanos and as timestamp[us]; order on a
    // numeric view of either
    val tsNum = full.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts").cast("double")
      case _ => expr("cast(unix_micros(cast(ts as timestamp)) as double)")
    }
    val cutoff = full.agg(percentile_approx(tsNum, lit(0.5), lit(10000)))
      .collect()(0).getDouble(0)
    st.replace("events", full.filter(tsNum < cutoff))
    val before = st.read("events").count()
    assert(before > 0 && before < full.count())

    // batch 2: re-deliver everything; cursor + key dedup must converge
    new Syncer(st, src).incrementalSync("events")
    assert(st.read("events").count() == full.count())
    // no duplicates
    assert(st.read("events").select("event_id").distinct().count() == full.count())
  }

  test("incremental sync without key or cursor errors like the reference") {
    val st = freshStore()
    val src = new ParquetDirSource(spark, sfDir)
    val e = intercept[IllegalArgumentException] {
      new Syncer(st, src).incrementalSync("events")
    }
    assert(e.getMessage.contains("cursor"))
  }

  test("first incremental sync of a missing table is a full refresh") {
    val st = freshStore()
    val src = new ParquetDirSource(spark, sfDir,
      keys = Map("events" -> "event_id"), cursors = Map("events" -> "ts"))
    new Syncer(st, src).incrementalSync("events")
    assert(st.read("events").count() == src.read("events").count())
  }

  // ---- HTTP sources against a local stub server -------------------------

  /** A local HTTP server serving `handler(path, query)` -> (status, body,
    * gzip). */
  private def withStubServer(handler: (String, String) => (Int, String, Boolean))
      (body: Int => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val (status, text, gz) = handler(ex.getRequestURI.getPath,
        Option(ex.getRequestURI.getQuery).getOrElse(""))
      val bytes =
        if (!gz) text.getBytes("UTF-8")
        else {
          val bos = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(bos)
          g.write(text.getBytes("UTF-8")); g.close()
          bos.toByteArray
        }
      if (gz) ex.getResponseHeaders.set("Content-Encoding", "gzip")
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(server.getAddress.getPort)
    finally server.stop(0)
  }

  test("hourly-window gzip HTTP source syncs incrementally with overlap trim") {
    // mutable "export": hour -> NDJSON events; starts with hours 0-2
    val hours = scala.collection.mutable.SortedMap(
      "20240101T00" -> (1 to 3).map(i => s"""{"id": $i, "ts": "2024-01-01T00:0$i:00"}"""),
      "20240101T01" -> (4 to 6).map(i => s"""{"id": $i, "ts": "2024-01-01T01:0${i - 3}:00"}"""),
      "20240101T02" -> (7 to 9).map(i => s"""{"id": $i, "ts": "2024-01-01T02:0${i - 6}:00"}"""))
    withStubServer { (_, query) =>
      val hour = query.split("&").collectFirst {
        case kv if kv.startsWith("start=") => kv.stripPrefix("start=")
      }.getOrElse("")
      hours.get(hour) match {
        case Some(lines) => (200, lines.mkString("\n"), true) // gzip frames
        case None => (404, "Raw data files were not found.", false)
      }
    } { port =>
      val st = freshStore()
      val src = new HttpJsonSource(spark, s"http://127.0.0.1:$port",
        Seq("events"), keys = Map("events" -> "id"),
        cursors = Map("events" -> "ts"),
        paging = HourlyWindowPaging("20240101T00"))
      val syncer = new Syncer(st, src)
      syncer.incrementalSync("events") // first sync = full load
      assert(st.read("events").count() == 9)
      // hour 3 lands upstream AND hour 2 is re-delivered (the overlap the
      // reference trims by cursor + key)
      hours("20240101T03") = (10 to 12).map(i =>
        s"""{"id": $i, "ts": "2024-01-01T03:0${i - 9}:00"}""")
      syncer.incrementalSync("events")
      assert(st.read("events").count() == 12)
      assert(st.read("events").select("id").distinct().count() == 12)
    }
  }

  test("offset-paginated REST source flattens typed values on full refresh") {
    // Attio-shaped records: attributes are arrays of typed wrapper objects
    val records = Seq(
      """{"record_id": "r1", "values": {"name": [{"full_name": "Acme"}], "domains": [{"domain": "acme.com"}], "status": [{"status": {"title": "Open"}}], "revenue": [{"currency_value": 10.5}]}}""",
      """{"record_id": "r2", "values": {"name": [{"full_name": "Globex"}], "domains": [{"domain": "globex.io"}], "status": [{"status": {"title": "Won"}}], "revenue": [{"currency_value": 99.0}]}}""",
      """{"record_id": "r3", "values": {"name": [{"full_name": "Initech"}], "domains": [], "status": [{"status": {"title": "Lost"}}], "revenue": [{"currency_value": 1.25}]}}""")
    withStubServer { (_, query) =>
      val params = query.split("&").map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v
      }.toMap
      val off = params.getOrElse("offset", "0").toInt
      val lim = params.getOrElse("limit", "500").toInt
      (200, records.slice(off, off + lim).mkString("\n"), false)
    } { port =>
      val st = freshStore()
      val flattenCompanies: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        df => df.select(
          col("record_id"),
          RestFlatten.firstName(col("values")("name")).as("name"),
          RestFlatten.firstDomain(col("values")("domains")).as("domain"),
          RestFlatten.firstStatus(col("values")("status")).as("status"),
          RestFlatten.firstCurrency(col("values")("revenue")).as("revenue"))
      val src = new HttpJsonSource(spark, s"http://127.0.0.1:$port",
        Seq("companies"), keys = Map("companies" -> "record_id"),
        paging = OffsetPaging(limit = 2), // forces 2 pages + empty third
        flatten = Map("companies" -> flattenCompanies))
      new Syncer(st, src).fullRefresh()
      val got = st.read("companies").orderBy("record_id")
        .collect().map(r => (r.getString(0), r.getString(1),
          Option(r.getString(2)), r.getString(3), r.getDouble(4))).toSeq
      assert(got == Seq(
        ("r1", "Acme", Some("acme.com"), "Open", 10.5),
        ("r2", "Globex", Some("globex.io"), "Won", 99.0),
        ("r3", "Initech", None, "Lost", 1.25)))
    }
  }

  test("HTTP source spools pages to bounded chunks, never the whole table") {
    // 500 rows over 25 pages, chunk cap 2 KB: the spool must rotate many
    // times (driver memory = one page, like the reference's capped buffer),
    // and the final table must be identical to an unbounded read
    val rows = (1 to 500).map(i => s"""{"id": $i, "v": "payload-$i-${"x" * 80}"}""")
    withStubServer { (_, query) =>
      val params = query.split("&").map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v
      }.toMap
      val off = params.getOrElse("offset", "0").toInt
      val lim = params.getOrElse("limit", "500").toInt
      (200, rows.slice(off, off + lim).mkString("\n"), false)
    } { port =>
      val st = freshStore()
      val spoolBase = java.nio.file.Files.createTempDirectory("graft-spool-test")
      val src = new HttpJsonSource(spark, s"http://127.0.0.1:$port",
        Seq("wide"), keys = Map("wide" -> "id"),
        paging = OffsetPaging(limit = 20), maxChunkBytes = 2048,
        spoolDir = Some("file://" + spoolBase))
      new Syncer(st, src).fullRefresh()
      // bounded buffering: the 500-row table rotated through many chunks
      // (~100 B/row, 2 KB cap => ~25), so no all-pages Seq ever existed
      assert(src.lastChunkCount >= 10,
        s"expected many spool chunks, got ${src.lastChunkCount}")
      val got = st.read("wide")
      assert(got.count() == 500)
      assert(got.select("id").distinct().count() == 500)
      assert(got.filter(col("v") === s"payload-42-${"x" * 80}").count() == 1)
      // staging released after the durable write: no spool dirs left behind
      // (a long-running sync daemon must not leak a table copy per sync)
      assert(!java.nio.file.Files.list(spoolBase).iterator().hasNext,
        "spool dirs leaked after sync")
    }
  }

  // ---- JDBC integration against embedded Derby (the in-container stand-in
  // for the reference's Postgres source; same JDBC metadata/read APIs) ----

  private def derbyUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  private def withDerby[A](url: String)(f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  test("jdbc introspection discovers tables and unique keys, no hand config") {
    val url = derbyUrl()
    withDerby(url) { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE users (id BIGINT PRIMARY KEY, name VARCHAR(40))")
      st.execute("CREATE TABLE tags (label VARCHAR(20))") // keyless
      st.execute("CREATE TABLE sessions (sid INT NOT NULL, note VARCHAR(10))")
      st.execute("CREATE UNIQUE INDEX sess_uq ON sessions(sid)")
    }
    val src = new JdbcSource(spark, url)
    assert(src.listTables() == Seq("SESSIONS", "TAGS", "USERS"))
    assert(src.uniqueKey("USERS") == Some("ID"))       // primary key
    assert(src.uniqueKey("SESSIONS") == Some("SID"))   // unique index fallback
    assert(src.uniqueKey("TAGS") == None)
    // reference panics on tables without a unique key (postgres.go:190-192)
    val strict = new JdbcSource(spark, url, strict = true)
    val err = intercept[IllegalStateException](strict.listTables())
    assert(err.getMessage.contains("TAGS"))
    // explicit keys override introspection and satisfy strict mode
    val overridden = new JdbcSource(spark, url,
      keys = Map("TAGS" -> "label"), strict = true)
    assert(overridden.listTables().size == 3)
  }

  test("jdbc read probes real key bounds and spreads rows across partitions") {
    val url = derbyUrl()
    withDerby(url) { c =>
      c.createStatement().execute(
        "CREATE TABLE measurements (id BIGINT PRIMARY KEY, v DOUBLE)")
      val ps = c.prepareStatement("INSERT INTO measurements VALUES (?, ?)")
      // ids start at 1000: static 0..Long.MaxValue bounds would stride
      // everything into partition 0 — real min/max bounds must not
      (1000 until 1400).foreach { i =>
        ps.setLong(1, i.toLong); ps.setDouble(2, i * 0.5); ps.addBatch()
      }
      ps.executeBatch()
    }
    val src = new JdbcSource(spark, url, numPartitions = 4)
    val df = src.read("MEASUREMENTS")
    assert(df.count() == 400)
    assert(df.rdd.getNumPartitions == 4)
    val perPartition = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPartition.count(_ > 0) == 4,
      s"rows not spread across partitions: ${perPartition.toSeq}")
    // balanced strides from the min/max probe, not one hot partition
    assert(perPartition.max <= 150, s"skewed strides: ${perPartition.toSeq}")
  }

  test("keyBounds survives case folding and quoted identifiers") {
    val url = derbyUrl()
    withDerby(url) { c =>
      // a quoted mixed-case table + reserved-word-ish column: the probe's
      // quoted form must hit it
      c.createStatement().execute(
        "CREATE TABLE \"CaseSensitive\" (\"Order\" BIGINT PRIMARY KEY, v INT)")
      val ps = c.prepareStatement("INSERT INTO \"CaseSensitive\" VALUES (?, ?)")
      (500 until 700).foreach { i => ps.setLong(1, i.toLong); ps.setInt(2, i); ps.addBatch() }
      ps.executeBatch()
      // a folded-case table the user addresses in lowercase: the quoted
      // probe fails ("casefolded" ≠ CASEFOLDED) and the unquoted retry
      // must resolve through Derby's own folding
      c.createStatement().execute(
        "CREATE TABLE casefolded (id BIGINT PRIMARY KEY, v INT)")
      val p2 = c.prepareStatement("INSERT INTO casefolded VALUES (?, ?)")
      (0 until 100).foreach { i => p2.setLong(1, i.toLong); p2.setInt(2, i); p2.addBatch() }
      p2.executeBatch()
    }
    // the working Spark-JDBC spelling for a mixed-case/reserved name is the
    // PRE-quoted one (dbtable/partitionColumn interpolate verbatim); the
    // probe must not double-quote it
    val exact = new JdbcSource(spark, url, numPartitions = 4,
      keys = Map("\"CaseSensitive\"" -> "\"Order\""))
    val df = exact.read("\"CaseSensitive\"")
    assert(df.count() == 200)
    assert(df.rdd.getNumPartitions == 4, "quoted-identifier bounds must partition")
    val folded = new JdbcSource(spark, url, numPartitions = 4,
      keys = Map("casefolded" -> "id"))
    val df2 = folded.read("casefolded")
    assert(df2.count() == 100)
    assert(df2.rdd.getNumPartitions == 4, "unquoted retry must partition")
  }

  test("jdbc source full-refreshes into the store end to end") {
    val url = derbyUrl()
    withDerby(url) { c =>
      c.createStatement().execute(
        "CREATE TABLE items (id INT PRIMARY KEY, label VARCHAR(20))")
      val ps = c.prepareStatement("INSERT INTO items VALUES (?, ?)")
      (1 to 57).foreach { i => ps.setInt(1, i); ps.setString(2, s"it-$i"); ps.addBatch() }
      ps.executeBatch()
    }
    val st = freshStore()
    val synced = new Syncer(st, new JdbcSource(spark, url)).fullRefresh()
    assert(synced == Seq("ITEMS"))
    assert(st.read("ITEMS").count() == 57)
    assert(st.read("ITEMS").select("LABEL").filter(col("LABEL") === "it-13").count() == 1)
  }

  test("snapshot-adoption init SQL pins the exported-snapshot contract") {
    // every partition connection must BEGIN repeatable-read and adopt the
    // anchor's snapshot id (Postgres pg_export_snapshot ids are
    // hyphen-separated hex); a malformed id must be rejected, not quoted in
    assert(JdbcSource.snapshotInitSql("00000004-00000tc7-1") ==
      "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY; " +
        "SET TRANSACTION SNAPSHOT '00000004-00000tc7-1'")
    intercept[IllegalArgumentException] {
      JdbcSource.snapshotInitSql("x'; DROP TABLE items; --")
    }
    // off-Postgres sources never export: releaseStaging is a harmless no-op
    new JdbcSource(spark, derbyUrl()).releaseStaging()
  }
}
