package graft

/** The wire server driven by REAL `pg_dump`: schema-only and full dumps of
  * the registered tables must succeed, and — when the container can boot a
  * scratch PostgreSQL ([[LivePg]]) — the dump must RESTORE into a genuine
  * server with every row intact. This is the strongest drop-in-parity
  * check available: pg_dump walks ~80 catalog queries (pg_namespace,
  * pg_class, pg_attribute + format_type, pg_depend, pg_init_privs, ACLs,
  * …) before it ever reads data, then exports through COPY TO STDOUT, so
  * one green round-trip covers the catalog surface, the dialect layer and
  * the COPY text escaping at once. Self-skips without pg_dump binaries.
  */
class PgDumpSpec extends SparkSpecBase {

  private def bin(name: String): Option[String] =
    Seq(s"/usr/bin/$name", s"/usr/local/bin/$name")
      .find(p => java.nio.file.Files.isExecutable(java.nio.file.Paths.get(p)))

  /** pg_dump refuses servers newer than itself, so the banner version must
    * match the container's client major (15.x here, 17.0 by default). */
  private lazy val store = new Store(spark,
    java.nio.file.Files.createTempDirectory("graft-dump").toString)
  private lazy val server: Int = {
    Tables.registerAll(spark, sfDir)
    new PgWireServer(spark, store, 0, serverVersion = "15.18").start()
  }

  private def run(cmd: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("PGCONNECT_TIMEOUT", "10")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def dump(args: String*): (Int, String) =
    run(Seq(bin("pg_dump").get, "-h", "127.0.0.1", "-p", server.toString,
      "-d", "graft", "-U", "graft") ++ args)

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("pg_dump --schema-only of one table emits its CREATE TABLE") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    val (rc, out) = dump("--schema-only", "-t", "nation")
    assert(rc == 0, out.takeRight(800))
    assert(out.contains("CREATE TABLE public.nation ("), out.takeRight(800))
    assert(out.contains("n_nationkey integer"), out)
    assert(!out.contains("anyarray"), "array columns must dump as elem[]")
  }

  test("full pg_dump walks the catalog and exports every table's rows") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    val (rc, out) = dump()
    assert(rc == 0, out.takeRight(1200))
    for (t <- tables) {
      assert(out.contains(s"CREATE TABLE public.$t ("), s"missing DDL for $t")
      // COPY block row count == table count (data lines sit between the
      // COPY header and the \. terminator)
      val lines = out.linesIterator.toSeq
      val start = lines.indexWhere(_.startsWith(s"COPY public.$t "))
      assert(start >= 0, s"missing COPY for $t")
      val n = lines.drop(start + 1).takeWhile(_ != "\\.").size
      val expected = spark.table(t).count()
      assert(n == expected, s"$t: dumped $n rows, table has $expected")
    }
  }

  test("dump restores into a real PostgreSQL with all data intact") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    assume(LivePg.info.isDefined, "no live PostgreSQL in this environment")
    val (rc, out) = dump()
    assert(rc == 0, out.takeRight(1200))
    val f = java.nio.file.Files.createTempFile("graft-dump", ".sql")
    java.nio.file.Files.write(f, out.getBytes("UTF-8"))

    val pg = LivePg.info.get
    def psqlLive(db: String, args: String*): (Int, String) =
      run(Seq(bin("psql").get, "-h", pg.host, "-p", pg.port.toString,
        "-U", pg.user, "-d", db, "-X", "-A", "-t", "-v",
        "ON_ERROR_STOP=1") ++ args)
    val dbName = "graft_restored"
    psqlLive("postgres", "-c", s"DROP DATABASE IF EXISTS $dbName")
    val (crc, cout) = psqlLive("postgres", "-c", s"CREATE DATABASE $dbName")
    assert(crc == 0, cout)
    val (rrc, rout) = psqlLive(dbName, "-f", f.toString)
    assert(rrc == 0, "restore failed:\n" + rout.takeRight(1500))

    // row counts per table, then value checksums over the type spectrum:
    // decimal sums (lineitem/orders), bigint sums + text lengths
    // (documents), timestamp/double (events), float4[] subscripts
    // (embeddings) — each computed in BOTH engines and compared as text
    def check(sql: String, viaSpark: String = null): Unit = {
      val (qrc, qout) = psqlLive(dbName, "-c", sql)
      assert(qrc == 0, qout)
      val ours = spark.sql(Option(viaSpark).getOrElse(sql))
        .collect().map(_.toSeq.map {
          case null => ""
          case v => v.toString
        }.mkString("|")).mkString("\n")
      assert(qout.trim == ours.trim, s"$sql\n  pg: ${qout.trim}\n  spark: $ours")
    }
    for (t <- tables)
      check(s"SELECT count(*) FROM $t")
    // double sums render differently (PG drops trailing .0, Spark prints
    // scientific) — compare as fixed-point DECIMAL text on both sides
    check("SELECT round(sum(l_quantity)::numeric, 2), " +
      "round(sum(l_extendedprice)::numeric, 2) FROM lineitem",
      "SELECT CAST(round(sum(l_quantity), 2) AS DECIMAL(24,2)), " +
        "CAST(round(sum(l_extendedprice), 2) AS DECIMAL(24,2)) FROM lineitem")
    check("SELECT round(sum(o_totalprice)::numeric, 2), " +
      "count(DISTINCT o_orderstatus) FROM orders",
      "SELECT CAST(round(sum(o_totalprice), 2) AS DECIMAL(24,2)), " +
        "count(DISTINCT o_orderstatus) FROM orders")
    check("SELECT sum(n_chars), sum(length(text)), count(DISTINCT lang) " +
      "FROM documents")
    check("SELECT count(DISTINCT event_type), sum(user_id), max(ts)::text " +
      "FROM events",
      "SELECT count(DISTINCT event_type), sum(user_id), " +
        "date_format(max(ts), 'yyyy-MM-dd HH:mm:ss.SSSSSS') FROM events")
    check("SELECT sum(array_length(embedding, 1)), max(label) FROM embeddings",
      "SELECT sum(size(embedding)), max(label) FROM embeddings")
    check("SELECT sum(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) " +
      "FROM embeddings",
      "SELECT sum(CASE WHEN embedding[0] > 0 THEN 1 ELSE 0 END) " +
        "FROM embeddings")
  }

  test("pg_dump handles views: SQL/matview bodies dump, anonymous session " +
      "views are skipped as temp") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    // an anonymous dataframe temp view has no SQL text — real PG would
    // hold it in pg_temp_N and pg_dump would skip it; an empty-bodied
    // CREATE VIEW in the dump is a hard pg_dump error
    spark.range(3).toDF("x").createOrReplaceTempView("dump_anon_view")
    store.createView("dump_sql_view",
      "SELECT r_regionkey AS k, r_name AS nm FROM region", Nil)
    store.createMatview("dump_mv", "SELECT count(*) AS n FROM nation")
    try {
      val (rc, out) = dump("--schema-only")
      assert(rc == 0, out.takeRight(1200))
      assert(!out.contains("dump_anon_view"), "anonymous view must be skipped")
      assert(out.contains("CREATE VIEW public.dump_sql_view"), out.takeRight(600))
      assert(out.contains("r_regionkey"), "view body must carry its SQL text")
      assert(out.contains("CREATE MATERIALIZED VIEW public.dump_mv"),
        out.takeRight(600))
    } finally {
      spark.catalog.dropTempView("dump_anon_view")
      store.dropView("dump_sql_view")
      store.dropMatview("dump_mv")
    }
  }

  test("custom-format dump (-Fc) feeds pg_restore into a real PostgreSQL") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    assume(bin("pg_restore").isDefined, "no pg_restore in this environment")
    assume(LivePg.info.isDefined, "no live PostgreSQL in this environment")
    val f = java.nio.file.Files.createTempFile("graft-dump", ".pgc")
    val (rc, out) = dump("-Fc", "-t", "nation", "-t", "orders",
      "-f", f.toString)
    assert(rc == 0, out.takeRight(1200))
    val pg = LivePg.info.get
    def psqlLive(db: String, args: String*): (Int, String) =
      run(Seq(bin("psql").get, "-h", pg.host, "-p", pg.port.toString,
        "-U", pg.user, "-d", db, "-X", "-A", "-t") ++ args)
    val dbName = "graft_fc_restored"
    psqlLive("postgres", "-c", s"DROP DATABASE IF EXISTS $dbName")
    val (crc, cout) = psqlLive("postgres", "-c", s"CREATE DATABASE $dbName")
    assert(crc == 0, cout)
    val (rrc, rout) = run(Seq(bin("pg_restore").get, "-h", pg.host,
      "-p", pg.port.toString, "-U", pg.user, "-d", dbName,
      "--no-owner", f.toString))
    assert(rrc == 0, "pg_restore failed:\n" + rout.takeRight(1500))
    for (t <- Seq("nation", "orders")) {
      val (qrc, qout) = psqlLive(dbName, "-c", s"SELECT count(*) FROM $t")
      assert(qrc == 0, qout)
      assert(qout.trim == spark.table(t).count().toString, s"$t: ${qout.trim}")
    }
  }

  test("pg_dump carries table and column comments, and a commented store " +
      "table round-trips through the dump") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    assume(bin("psql").isDefined, "no psql in this environment")
    def psqlSelf(args: String*): (Int, String) =
      run(Seq(bin("psql").get, "-h", "127.0.0.1", "-p", server.toString,
        "-U", "graft", "-d", "graft", "-X", "-A", "-t", "-v",
        "ON_ERROR_STOP=1") ++ args)
    val (src, sout) = psqlSelf("-c",
      "CREATE TABLE cdump (id bigint, note text);" +
        "INSERT INTO cdump VALUES (1, 'a'), (2, 'b');" +
        "COMMENT ON TABLE cdump IS 'the comment table';" +
        "COMMENT ON COLUMN cdump.note IS 'free text'")
    assert(src == 0, sout)
    try {
      val (rc, out) = dump("-t", "cdump")
      assert(rc == 0, out.takeRight(1200))
      assert(out.contains("COMMENT ON TABLE public.cdump IS 'the comment table';"),
        out.takeRight(800))
      assert(out.contains("COMMENT ON COLUMN public.cdump.note IS 'free text';"),
        out.takeRight(800))
      // and the dump lands back in a store table, comments applied
      val renamed = out.replaceAll("\\bpublic\\.", "public.rt2_")
      val f = java.nio.file.Files.createTempFile("graft-cdump", ".sql")
      java.nio.file.Files.write(f, renamed.getBytes("UTF-8"))
      val (rrc, rout) = psqlSelf("-f", f.toString)
      assert(rrc == 0, "restore failed:\n" + rout.takeRight(1200))
      val (qrc, qout) = psqlSelf("-c",
        "SELECT count(*), obj_description('rt2_cdump'::regclass) FROM rt2_cdump")
      assert(qrc == 0, qout)
      assert(qout.trim == "2|the comment table", qout)
    } finally {
      psqlSelf("-c", "DROP TABLE cdump")
      psqlSelf("-c", "DROP TABLE IF EXISTS rt2_cdump")
    }
  }

  test("directory-format dump with parallel workers restores with pg_restore -j") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    assume(bin("pg_restore").isDefined, "no pg_restore in this environment")
    assume(LivePg.info.isDefined, "no live PostgreSQL in this environment")
    // -Fd -j2: each parallel dump worker opens its OWN connection,
    // re-introspects the catalog and adopts the leader's exported snapshot
    // — a different access pattern from the single-connection formats
    val d = java.nio.file.Files.createTempDirectory("graft-dump-fd")
    java.nio.file.Files.delete(d) // pg_dump insists on creating the dir
    val (rc, out) = dump("-Fd", "-j", "2", "-t", "nation", "-t", "orders",
      "-t", "supplier", "-f", d.toString)
    assert(rc == 0, "parallel -Fd dump failed:\n" + out.takeRight(1500))
    assert(java.nio.file.Files.exists(d.resolve("toc.dat")), "directory TOC")
    val pg = LivePg.info.get
    def psqlLive(db: String, args: String*): (Int, String) =
      run(Seq(bin("psql").get, "-h", pg.host, "-p", pg.port.toString,
        "-U", pg.user, "-d", db, "-X", "-A", "-t") ++ args)
    val dbName = "graft_fd_restored"
    psqlLive("postgres", "-c", s"DROP DATABASE IF EXISTS $dbName")
    val (crc, cout) = psqlLive("postgres", "-c", s"CREATE DATABASE $dbName")
    assert(crc == 0, cout)
    // pg_restore -j2: parallel restore workers replay the TOC concurrently
    val (rrc, rout) = run(Seq(bin("pg_restore").get, "-h", pg.host,
      "-p", pg.port.toString, "-U", pg.user, "-d", dbName,
      "-j", "2", "--no-owner", d.toString))
    assert(rrc == 0, "pg_restore -j failed:\n" + rout.takeRight(1500))
    for (t <- Seq("nation", "orders", "supplier")) {
      val (qrc, qout) = psqlLive(dbName,
        "-c", s"SELECT count(*) FROM $t")
      assert(qrc == 0, qout)
      assert(qout.trim == spark.table(t).count().toString, s"$t: ${qout.trim}")
    }
    // checksum-grade parity beyond counts: aggregate over every orders row
    val (src, sout) = psqlLive(dbName,
      "-c", "SELECT sum(o_orderkey), sum(o_custkey), md5(string_agg(o_orderstatus, '' ORDER BY o_orderkey)) FROM orders")
    assert(src == 0, sout)
    import org.apache.spark.sql.functions._
    val parts = sout.trim.split("\\|")
    val lr = spark.table("orders")
      .agg(sum("o_orderkey").cast("string"), sum("o_custkey").cast("string"))
      .head()
    assert(parts(0) == lr.getString(0) && parts(1) == lr.getString(1),
      s"orders sums diverge: ${sout.trim}")
    val localMd5 = spark.table("orders").sort("o_orderkey")
      .agg(md5(concat_ws("", collect_list("o_orderstatus"))).as("h"))
      .head().getString(0)
    assert(parts(2) == localMd5, s"orders status md5 diverges: ${sout.trim}")
  }

  test("tar-format dump (-Ft) round-trips through pg_restore") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    assume(bin("pg_restore").isDefined, "no pg_restore in this environment")
    assume(LivePg.info.isDefined, "no live PostgreSQL in this environment")
    val f = java.nio.file.Files.createTempFile("graft-dump", ".tar")
    val (rc, out) = dump("-Ft", "-t", "region", "-t", "events", "-f", f.toString)
    assert(rc == 0, "tar dump failed:\n" + out.takeRight(1500))
    val pg = LivePg.info.get
    def psqlLive(db: String, args: String*): (Int, String) =
      run(Seq(bin("psql").get, "-h", pg.host, "-p", pg.port.toString,
        "-U", pg.user, "-d", db, "-X", "-A", "-t") ++ args)
    val dbName = "graft_ft_restored"
    psqlLive("postgres", "-c", s"DROP DATABASE IF EXISTS $dbName")
    val (crc, cout) = psqlLive("postgres", "-c", s"CREATE DATABASE $dbName")
    assert(crc == 0, cout)
    val (rrc, rout) = run(Seq(bin("pg_restore").get, "-h", pg.host,
      "-p", pg.port.toString, "-U", pg.user, "-d", dbName,
      "--no-owner", f.toString))
    assert(rrc == 0, "tar pg_restore failed:\n" + rout.takeRight(1500))
    for (t <- Seq("region", "events")) {
      val (qrc, qout) = psqlLive(dbName, "-c", s"SELECT count(*) FROM $t")
      assert(qrc == 0, qout)
      assert(qout.trim == spark.table(t).count().toString, s"$t: ${qout.trim}")
    }
  }

  test("parallel -Fd dump of store tables restores into graft itself with pg_restore -j") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    assume(bin("pg_restore").isDefined, "no pg_restore in this environment")
    def psqlSelf(args: String*): (Int, String) =
      run(Seq(bin("psql").get, "-h", "127.0.0.1", "-p", server.toString,
        "-U", "graft", "-d", "graft", "-X", "-A", "-t", "-v",
        "ON_ERROR_STOP=1") ++ args)
    // store tables sourced from the views (a -Fd archive can't be
    // text-rewritten like the plain-format self-restore, so dump real
    // store tables, drop them, and restore them back)
    psqlSelf("-c", "CREATE TABLE rt2_nation AS SELECT * FROM nation")
    psqlSelf("-c", "CREATE TABLE rt2_orders AS SELECT * FROM orders")
    val origN = spark.table("nation").count()
    val origO = spark.table("orders").count()
    val d = java.nio.file.Files.createTempDirectory("graft-selfdump-fd")
    java.nio.file.Files.delete(d)
    // parallel dump FROM graft: workers adopt the exported snapshot
    val (rc, out) = dump("-Fd", "-j", "2", "-t", "rt2_nation",
      "-t", "rt2_orders", "-f", d.toString)
    assert(rc == 0, "parallel self-dump failed:\n" + out.takeRight(1500))
    psqlSelf("-c", "DROP TABLE rt2_nation")
    psqlSelf("-c", "DROP TABLE rt2_orders")
    // parallel restore INTO graft: 2 concurrent wire connections replay
    // CREATE TABLE + COPY FROM STDIN through the store write path
    val (rrc, rout) = run(Seq(bin("pg_restore").get, "-h", "127.0.0.1",
      "-p", server.toString, "-U", "graft", "-d", "graft",
      "-j", "2", "--no-owner", d.toString))
    assert(rrc == 0, "pg_restore -j into graft failed:\n" + rout.takeRight(1500))
    for ((t, orig) <- Seq("rt2_nation" -> origN, "rt2_orders" -> origO)) {
      val (qrc, qout) = psqlSelf("-c", s"SELECT count(*) FROM $t")
      assert(qrc == 0, qout)
      assert(qout.trim == orig.toString, s"$t count: ${qout.trim} vs $orig")
    }
    // value-level checksum over orders through our own server. ::bigint on
    // both sides: the restored table's int8 columns live as numeric
    // (unsigned-range-safe ingest mapping) and the reference renders every
    // DECIMAL through Go float formatting ("1.12425e+06"), while the
    // source view's long renders plain — cast to compare values, not
    // type-specific renderings.
    val (arc, aout) = psqlSelf("-c",
      "SELECT sum(o_orderkey)::bigint, sum(o_custkey)::bigint FROM rt2_orders")
    val (brc, bout) = psqlSelf("-c",
      "SELECT sum(o_orderkey)::bigint, sum(o_custkey)::bigint FROM orders")
    assert(arc == 0 && brc == 0, aout + bout)
    assert(aout.trim == bout.trim, s"restored ${aout.trim} vs source ${bout.trim}")
    psqlSelf("-c", "DROP TABLE rt2_nation")
    psqlSelf("-c", "DROP TABLE rt2_orders")
  }

  test("parallel dump under live concurrent writes captures one consistent snapshot") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    assume(bin("pg_restore").isDefined, "no pg_restore in this environment")
    assume(LivePg.info.isDefined, "no live PostgreSQL in this environment")
    // sum-preserving churn: every UPDATE is one statement = one atomic
    // version flip, so EVERY version of the table holds sum(val) = 0.
    // The -Fd -j2 dump exports a snapshot, a churner keeps committing
    // while the workers read — the restored table must be internally
    // consistent (the invariant holds), proving the workers adopted ONE
    // version instead of reading whatever was latest mid-dump.
    def psqlSelf(args: String*): (Int, String) =
      run(Seq(bin("psql").get, "-h", "127.0.0.1", "-p", server.toString,
        "-U", "graft", "-d", "graft", "-X", "-A", "-t", "-v",
        "ON_ERROR_STOP=1") ++ args)
    psqlSelf("-c", "CREATE TABLE churn_acct AS " +
      "SELECT g AS k, CAST(0 AS BIGINT) AS val FROM generate_series(1, 200) g")
    @volatile var churning = true
    @volatile var churnErr: Throwable = null
    val churner = new Thread(() => {
      try {
        var i = 0
        while (churning) {
          // moves value between rows, never changes the sum
          val (rc, out) = psqlSelf("-c",
            s"UPDATE churn_acct SET val = val + CASE WHEN k % 2 = 0 THEN ${i + 1} ELSE -${i + 1} END")
          require(rc == 0, out.takeRight(300))
          i += 1
        }
      } catch { case t: Throwable => churnErr = t }
    })
    churner.start()
    try {
      Thread.sleep(300) // let some churn land before the export
      val d = java.nio.file.Files.createTempDirectory("graft-dump-churn")
      java.nio.file.Files.delete(d)
      val (rc, out) = dump("-Fd", "-j", "2", "-t", "churn_acct", "-f", d.toString)
      assert(rc == 0, "dump under churn failed:\n" + out.takeRight(1500))
      churning = false; churner.join(30000)
      assert(churnErr == null, s"churner died: $churnErr")
      val pg = LivePg.info.get
      def psqlLive(db: String, args: String*): (Int, String) =
        run(Seq(bin("psql").get, "-h", pg.host, "-p", pg.port.toString,
          "-U", pg.user, "-d", db, "-X", "-A", "-t") ++ args)
      val dbName = "graft_churn_restored"
      psqlLive("postgres", "-c", s"DROP DATABASE IF EXISTS $dbName")
      assert(psqlLive("postgres", "-c", s"CREATE DATABASE $dbName")._1 == 0)
      val (rrc, rout) = run(Seq(bin("pg_restore").get, "-h", pg.host,
        "-p", pg.port.toString, "-U", pg.user, "-d", dbName,
        "-j", "2", "--no-owner", d.toString))
      assert(rrc == 0, "restore failed:\n" + rout.takeRight(1500))
      val (qrc, qout) = psqlLive(dbName,
        "-c", "SELECT count(*), sum(val)::bigint FROM churn_acct")
      assert(qrc == 0, qout)
      assert(qout.trim == "200|0",
        s"restored snapshot must be internally consistent: ${qout.trim}")
    } finally {
      churning = false
      churner.join(30000)
      psqlSelf("-c", "DROP TABLE churn_acct")
    }
  }

  test("pg_dump output restores into graft itself (store tables)") {
    assume(bin("pg_dump").isDefined, "no pg_dump in this environment")
    assume(bin("psql").isDefined, "no psql in this environment")
    // nation (ints + text), events (timestamp/double/json-text) and
    // embeddings (float4[]) span the type surface; rename rt_* so the
    // restored store tables don't shadow the registered source views
    val (rc, out) = dump("-t", "nation", "-t", "events", "-t", "embeddings")
    assert(rc == 0, out.takeRight(1200))
    val renamed = out.replaceAll("\\bpublic\\.", "public.rt_")
    val f = java.nio.file.Files.createTempFile("graft-selfrestore", ".sql")
    java.nio.file.Files.write(f, renamed.getBytes("UTF-8"))
    def psqlSelf(args: String*): (Int, String) =
      run(Seq(bin("psql").get, "-h", "127.0.0.1", "-p", server.toString,
        "-U", "graft", "-d", "graft", "-X", "-A", "-t", "-v",
        "ON_ERROR_STOP=1") ++ args)
    val (rrc, rout) = psqlSelf("-f", f.toString)
    assert(rrc == 0, "self-restore failed:\n" + rout.takeRight(1500))
    // every comparison runs through our own server: restored store table
    // vs the original registered view must agree exactly
    for ((sql, orig) <- Seq(
      "SELECT count(*) FROM rt_nation" ->
        "SELECT count(*) FROM nation",
      "SELECT sum(n_nationkey), count(DISTINCT n_name) FROM rt_nation" ->
        "SELECT sum(n_nationkey), count(DISTINCT n_name) FROM nation",
      "SELECT count(*), sum(user_id), max(ts)::text FROM rt_events" ->
        "SELECT count(*), sum(user_id), max(ts)::text FROM events",
      "SELECT sum(cardinality(embedding)), max(label) FROM rt_embeddings" ->
        "SELECT sum(cardinality(embedding)), max(label) FROM embeddings",
      "SELECT sum(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) FROM rt_embeddings" ->
        "SELECT sum(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) FROM embeddings")) {
      val (arc, aout) = psqlSelf("-c", sql)
      val (brc, bout) = psqlSelf("-c", orig)
      assert(arc == 0, s"$sql\n$aout")
      assert(brc == 0, s"$orig\n$bout")
      assert(aout.trim == bout.trim, s"$sql\n  restored: ${aout.trim}\n  original: ${bout.trim}")
    }
  }
}
