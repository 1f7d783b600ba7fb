package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end smoke of the wire-protocol client + sync source against a
  * REAL PostgreSQL server ([[LivePg]] boots one when the container ships
  * the binaries; every test self-skips otherwise). This is the live half
  * of the contract-tested sync seam: real auth exchanges, real
  * introspection, real COPY framing, real exported-snapshot isolation.
  */
class LivePgSpec extends SparkSpecBase {

  private def pg = LivePg.info

  private def withClient[A](f: PgWireClient => A): A = {
    val c = pg.get.connect()
    try f(c) finally c.close()
  }

  private def source(tables: String*): PgWireSource =
    new PgWireSource(spark, pg.get, tables = tables.toSeq)

  test("trust auth + simple query: columns, rows, tags, parameters") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      assert(c.parameters.get("server_encoding").contains("UTF8"))
      val r = c.query("SELECT 1 AS one, 'x' AS t, NULL::int AS n")
      assert(r.cols.map(_.name) == Seq("one", "t", "n"))
      assert(r.rows.head.toSeq == Seq("1", "x", null))
      assert(r.tags == Seq("SELECT 1"))
      // multi-statement: sequential tags, like any simple-protocol client
      val m = c.query("SELECT 2; SELECT 3")
      assert(m.tags == Seq("SELECT 1", "SELECT 1"))
      // server errors surface with their SQLSTATE and don't wedge the link
      val e = intercept[PgClientException](c.query("SELECT no_such_col"))
      assert(e.sqlState == "42703")
      assert(c.query("SELECT 7").scalar == "7")
    }
  }

  test("SCRAM-SHA-256 auth succeeds with the right password, fails closed") {
    assume(pg.isDefined, "no live Postgres in this environment")
    val base = pg.get
    val ok = base.copy(user = "scram_user", password = Some("scrampw")).connect()
    try assert(ok.query("SELECT current_user").scalar == "scram_user")
    finally ok.close()
    val e = intercept[PgClientException] {
      base.copy(user = "scram_user", password = Some("wrong")).connect()
    }
    assert(e.sqlState == "28P01", s"wanted invalid_password, got $e")
  }

  test("md5 and cleartext auth paths") {
    assume(pg.isDefined, "no live Postgres in this environment")
    val base = pg.get
    val m = base.copy(user = "md5_user", password = Some("md5pw")).connect()
    try assert(m.query("SELECT current_user").scalar == "md5_user")
    finally m.close()
    val p = base.copy(user = "password_user", password = Some("plainpw")).connect()
    try assert(p.query("SELECT current_user").scalar == "password_user")
    finally p.close()
  }

  test("introspected schema maps through PgTypes like the reference") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_types")
      c.query("""CREATE TABLE t_types (
        id bigint PRIMARY KEY, small int, flag boolean, f8 double precision,
        price numeric(10,2), freeform numeric, body text, fixed char(8),
        payload bytea, d date, ts timestamp, tstz timestamptz,
        tags int4[], u uuid, j jsonb)""")
    }
    val s = source("t_types")
    val got = s.sparkSchema("t_types")
    def dt(n: String) = got(got.fieldIndex(n)).dataType
    assert(dt("id") == DecimalType(38, 0)) // int8 widens, unsigned-range safe
    assert(dt("small") == IntegerType)
    assert(dt("flag") == BooleanType)
    assert(dt("f8") == DoubleType)
    assert(dt("price") == DecimalType(10, 2)) // typmod unpacked
    assert(dt("freeform") == DecimalType(38, 6)) // unconstrained numeric clamps
    assert(dt("body") == StringType && dt("fixed") == StringType)
    assert(dt("payload") == BinaryType) // bytea -> binary
    assert(dt("d") == DateType)
    assert(dt("ts") == TimestampNTZType && dt("tstz") == TimestampType)
    assert(dt("tags") == ArrayType(IntegerType))
    assert(dt("u") == StringType && dt("j") == StringType)
    assert(s.uniqueKey("t_types").contains("id")) // PK introspected
  }

  test("snapshot-consistent partitioned sync: bounds, parallel COPY, isolation") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_big")
      c.query("CREATE TABLE t_big (k bigint PRIMARY KEY, v text)")
      c.query("INSERT INTO t_big SELECT g, 'v' || g FROM generate_series(1, 10000) g")
    }
    val s = source("t_big")
    val df = s.read("t_big") // snapshot exported HERE
    try {
      assert(df.rdd.getNumPartitions > 1, "keyed table must read in parallel")
      // rows inserted AFTER the export must be invisible to every partition,
      // no matter when its task runs — the repeatable-read sync contract
      withClient(_.query(
        "INSERT INTO t_big SELECT g, 'late' FROM generate_series(10001, 11000) g"))
      assert(df.count() == 10000)
      assert(df.agg(sum(col("k"))).head.getDecimal(0).longValueExact()
        == 10000L * 10001 / 2)
      // a fresh read (fresh snapshot) sees the late rows
      val again = s.read("t_big")
      assert(again.count() == 11000)
    } finally s.releaseStaging()
  }

  test("keyless table: single-COPY path round-trips hostile text exactly") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_text")
      c.query("CREATE TABLE t_text (v text)")
      c.query("INSERT INTO t_text VALUES " +
        "(E'tab\\there'), (E'nl\\nthere'), (E'back\\\\slash'), " +
        "('καλημέρα'), (''), (NULL)")
    }
    val s = source("t_text")
    val df = s.read("t_text")
    try {
      assert(df.rdd.getNumPartitions == 1, "keyless: one COPY stream")
      val got = df.collect().map(r => Option(r.getString(0)))
      assert(got.toSet == Set(Some("tab\there"), Some("nl\nthere"),
        Some("back\\slash"), Some("καλημέρα"), Some(""), None))
    } finally s.releaseStaging()
  }

  test("typed values survive the text protocol into Spark rows") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_vals")
      c.query("""CREATE TABLE t_vals (
        id bigint PRIMARY KEY, flag boolean, price numeric(10,2),
        f8 double precision, d date, ts timestamp, tstz timestamptz,
        payload bytea, tags int4[], words text[], fixed char(5))""")
      c.query("""INSERT INTO t_vals VALUES
        (1, true, 123.45, 2.5, '2026-08-14', '2026-08-14 10:30:00',
         '2026-08-14 10:30:00+02', E'\\x00ff10', '{1,2,3}',
         '{"a b","with,comma",NULL}', 'ab'),
        (2, false, -0.01, 'NaN', NULL, NULL, NULL, NULL, '{}', NULL, NULL)""")
    }
    val s = source("t_vals")
    val rows = try s.read("t_vals").orderBy("id").collect()
    finally s.releaseStaging()
    val r1 = rows(0)
    assert(r1.getAs[Boolean]("flag"))
    assert(r1.getAs[java.math.BigDecimal]("price").toString == "123.45")
    assert(r1.getAs[Double]("f8") == 2.5)
    assert(r1.getAs[java.sql.Date]("d").toString == "2026-08-14")
    assert(r1.getAs[java.time.LocalDateTime]("ts").toString == "2026-08-14T10:30")
    // +02 input, UTC session: instants agree
    assert(r1.getAs[java.sql.Timestamp]("tstz").toInstant
      == java.time.Instant.parse("2026-08-14T08:30:00Z"))
    assert(r1.getAs[Array[Byte]]("payload").toSeq == Seq(0x00, 0xff, 0x10).map(_.toByte))
    assert(r1.getSeq[Int](r1.fieldIndex("tags")) == Seq(1, 2, 3))
    assert(r1.getSeq[String](r1.fieldIndex("words")) == Seq("a b", "with,comma", null))
    assert(r1.getAs[String]("fixed") == "ab") // bpchar right-trimmed
    val r2 = rows(1)
    assert(!r2.getAs[Boolean]("flag"))
    assert(r2.getAs[Double]("f8").isNaN)
    assert(r2.isNullAt(r2.fieldIndex("d")) && r2.isNullAt(r2.fieldIndex("payload")))
    assert(r2.getSeq[Int](r2.fieldIndex("tags")) == Nil)
  }

  test("full refresh + cursor incremental sync land in the store") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_sync")
      c.query("CREATE TABLE t_sync (k bigint PRIMARY KEY, ts bigint, v text)")
      c.query("INSERT INTO t_sync SELECT g, g, 'a' || g FROM generate_series(1, 500) g")
    }
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-livepg-store").toString)
    val s = new PgWireSource(spark, pg.get, tables = Seq("t_sync"),
      cursors = Map("t_sync" -> "ts"))
    val syncer = new Syncer(store, s)
    assert(syncer.fullRefresh() == Seq("t_sync"))
    assert(store.read("t_sync").count() == 500)
    // upstream moves: overlap at the cursor frontier + fresh rows. The
    // cursor contract is APPEND-ONLY (the reference's event-stream shape):
    // re-fetched frontier rows dedup by key with the EXISTING row winning,
    // new keys land once.
    withClient { c =>
      c.query("UPDATE t_sync SET v = 'mutated' WHERE k = 500")
      c.query("INSERT INTO t_sync SELECT g, g, 'b' || g FROM generate_series(501, 700) g")
    }
    syncer.incrementalSync("t_sync")
    val after = store.read("t_sync")
    assert(after.count() == 700)
    assert(after.filter(col("k") === 500).head.getString(2) == "a500")
    assert(after.filter(col("k") === 700).head.getString(2) == "b700")
  }

  test("test_decoding change lines parse: quoting, nulls, colons, escapes") {
    val c = PgCdc.parseChange(
      "table public.t_cdc: INSERT: k[bigint]:7 v[text]:'a b: ''q'' c' n[integer]:null w[text]:x").get
    assert(c.table == "t_cdc" && c.op == "INSERT")
    assert(c.cols == Map("k" -> "7", "v" -> "a b: 'q' c", "w" -> "x")) // null omitted
    val d = PgCdc.parseChange("table public.t_cdc: DELETE: k[bigint]:7").get
    assert(d.op == "DELETE" && d.cols == Map("k" -> "7"))
    assert(PgCdc.parseChange("BEGIN 1234").isEmpty)
    assert(PgCdc.parseChange("COMMIT 1234").isEmpty)
  }

  test("key-changing UPDATE decodes as delete(old key) + upsert(new tuple)") {
    // test_decoding emits old-key:/new-tuple: segments when the replica
    // identity changes; merging them into one change (or dropping the
    // line) leaves the stale old-key row in the mirror forever
    val cs = PgCdc.parseChanges(
      "table public.t_cdc: UPDATE: old-key: k[integer]:1 new-tuple: k[integer]:2 v[text]:'x, y'")
    assert(cs.map(_.op) == Seq("DELETE", "UPDATE"), cs.toString)
    assert(cs.head.cols == Map("k" -> "1"), "old identity deletes")
    assert(cs(1).cols == Map("k" -> "2", "v" -> "x, y"), "new tuple upserts")
    // a non-key UPDATE (no segments) still decodes as one change
    val plain = PgCdc.parseChanges(
      "table public.t_cdc: UPDATE: k[integer]:3 v[text]:'z'")
    assert(plain.map(_.op) == Seq("UPDATE") &&
      plain.head.cols == Map("k" -> "3", "v" -> "z"))
    // marker text inside a quoted VALUE must not split segments
    val tricky = PgCdc.parseChanges(
      "table public.t_cdc: UPDATE: k[integer]:4 v[text]:'old-key: fake new-tuple: fake'")
    assert(tricky.map(_.op) == Seq("UPDATE") &&
      tricky.head.cols("v") == "old-key: fake new-tuple: fake")
  }

  test("CDC via logical decoding: slot-captured INSERT/UPDATE/DELETE converge the mirror") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_cdc")
      c.query("CREATE TABLE t_cdc (k bigint PRIMARY KEY, v text, q numeric(10,2))")
      c.query("INSERT INTO t_cdc SELECT g, 'v' || g, g * 1.5 FROM generate_series(1, 200) g")
    }
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-cdc-store").toString)
    val cdc = new PgCdc(spark, pg.get, store, slot = "graft_cdc_test")
    try {
      cdc.createSlot() // BEFORE the snapshot: nothing after it can be missed
      val src = source("t_cdc")
      cdc.initialSync(src, "t_cdc")
      assert(store.read("t_cdc").count() == 200)
      // upstream churn: inserts, updates, deletes — no cursor column needed
      withClient { c =>
        c.query("INSERT INTO t_cdc SELECT g, 'new' || g, 0 FROM generate_series(201, 250) g")
        c.query("UPDATE t_cdc SET v = 'upd' || k, q = q + 1 WHERE k <= 20")
        c.query("DELETE FROM t_cdc WHERE k BETWEEN 51 AND 70")
        // churn WITHIN one batch: insert then delete must land as absent,
        // delete then re-insert as present (slot-order last-wins)
        c.query("INSERT INTO t_cdc VALUES (999, 'ghost', 0)")
        c.query("DELETE FROM t_cdc WHERE k = 999")
        c.query("DELETE FROM t_cdc WHERE k = 100")
        c.query("INSERT INTO t_cdc VALUES (100, 'reborn', 7.25)")
      }
      val (u, d) = cdc.drain("t_cdc", "k")
      assert(u > 0 && d > 0, s"expected both upserts and deletes, got ($u, $d)")
      // mirror must now equal upstream exactly, value for value
      val upstream = withClient(_.query(
        "SELECT k, v, q::text FROM t_cdc ORDER BY k").rows.map(_.toList).toList)
      val mirror = store.read("t_cdc").orderBy("k").collect().toList
        .map(r => List(r.getAs[java.math.BigDecimal]("k").toBigInteger.toString,
          r.getString(1), r.getAs[java.math.BigDecimal]("q").toPlainString))
      assert(mirror.length == upstream.length,
        s"row counts differ: mirror ${mirror.length} vs upstream ${upstream.length}")
      upstream.zip(mirror).foreach { case (up, mi) =>
        assert(up == mi, s"row mismatch: upstream $up vs mirror $mi")
      }
      // slot drained: nothing further to apply
      assert(cdc.pump("t_cdc", "k") == ((0L, 0L)))
      // TRUNCATE decodes too: pre-truncate rows vanish, post-truncate
      // rows land — dropping the marker would strand the old rows forever
      withClient { c =>
        c.query("TRUNCATE t_cdc")
        c.query("INSERT INTO t_cdc VALUES (1, 'fresh', 1.00), (2, 'start', 2.00)")
      }
      cdc.drain("t_cdc", "k")
      val post = store.read("t_cdc").orderBy("k").collect()
      assert(post.length == 2, s"mirror must hold only post-truncate rows, got ${post.length}")
      assert(post.map(_.getString(1)).toSeq == Seq("fresh", "start"))
    } finally cdc.dropSlot()
  }

  test("CDC key-changing UPDATE on a live slot migrates the mirror row") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_keymove")
      c.query("CREATE TABLE t_keymove (k bigint PRIMARY KEY, v text)")
      c.query("INSERT INTO t_keymove VALUES (1, 'one'), (2, 'two'), (3, 'three')")
    }
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-cdc-keymove").toString)
    val cdc = new PgCdc(spark, pg.get, store, slot = "graft_cdc_keymove")
    try {
      cdc.createSlot()
      cdc.initialSync(source("t_keymove"), "t_keymove")
      // a PRIMARY KEY update: test_decoding emits old-key:/new-tuple:
      // segments — the mirror must DELETE key 2 and land key 2002, not
      // keep the stale row (the silent-divergence bug class)
      withClient(_.query("UPDATE t_keymove SET k = 2002, v = 'moved' WHERE k = 2"))
      cdc.drain("t_keymove", "k")
      val rows = store.read("t_keymove").orderBy("k").collect()
        .map(r => (r.getAs[java.math.BigDecimal]("k").longValue, r.getString(1))).toSeq
      assert(rows == Seq((1L, "one"), (3L, "three"), (2002L, "moved")),
        s"mirror after key move: $rows")
    } finally cdc.dropSlot()
  }

  test("CDC slot hygiene: restart_lsn advances as batches drain (WAL retention)") {
    assume(pg.isDefined, "no live Postgres in this environment")
    // the design risk the polling consumer carries: if draining never let
    // the slot's restart_lsn move, upstream WAL would grow without bound
    // (max_slot_wal_keep_size or disk-full kills the slot). Pin that each
    // peek→apply→advance cycle lets PG release WAL: restart_lsn strictly
    // advances once decoding passes a new restart point.
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_wal")
      c.query("CREATE TABLE t_wal (k bigint PRIMARY KEY, v text)")
    }
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-cdc-wal").toString)
    val cdc = new PgCdc(spark, pg.get, store, slot = "graft_cdc_wal")
    def lsn(col: String): Long = withClient { c =>
      val v = c.query(
        s"SELECT $col::text FROM pg_replication_slots WHERE slot_name = 'graft_cdc_wal'")
        .rows.head.head
      val Array(hi, lo) = v.split("/")
      (java.lang.Long.parseLong(hi, 16) << 32) | java.lang.Long.parseLong(lo, 16)
    }
    try {
      cdc.createSlot()
      cdc.initialSync(source("t_wal"), "t_wal")
      val restart0 = lsn("restart_lsn")
      val flush0 = lsn("confirmed_flush_lsn")
      // restart_lsn only moves when decoding crosses a later restart point
      // (xl_running_xacts, logged at checkpoints / by bgwriter) — force
      // checkpoints between drains and require a strict advance
      var advanced = false
      var i = 0
      while (!advanced && i < 10) {
        withClient { c =>
          c.query(s"INSERT INTO t_wal SELECT g, 'w' || g FROM " +
            s"generate_series(${i * 100 + 1}, ${i * 100 + 100}) g")
          c.query("CHECKPOINT")
        }
        cdc.drain("t_wal", "k")
        advanced = lsn("restart_lsn") > restart0
        i += 1
      }
      assert(advanced,
        s"restart_lsn never advanced past ${restart0} after $i drain cycles — " +
          "the slot would retain WAL forever")
      assert(lsn("confirmed_flush_lsn") > flush0,
        "confirmed_flush_lsn must advance with every drained batch")
      assert(store.read("t_wal").count() == i * 100L)
    } finally cdc.dropSlot()
  }

  test("CDC via START_REPLICATION: pushed stream converges the mirror, feedback advances the slot") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_stream")
      c.query("CREATE TABLE t_stream (k bigint PRIMARY KEY, v text)")
      c.query("INSERT INTO t_stream SELECT g, 'v' || g FROM generate_series(1, 100) g")
    }
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-cdc-stream").toString)
    val cdc = new PgCdc(spark, pg.get, store, slot = "graft_cdc_stream")
    def slotCol(col: String): String = withClient(_.query(
      s"SELECT $col::text FROM pg_replication_slots WHERE slot_name = 'graft_cdc_stream'")
      .rows.head.head)
    def lsnVal(v: String): Long = {
      val Array(hi, lo) = v.split("/")
      (java.lang.Long.parseLong(hi, 16) << 32) | java.lang.Long.parseLong(lo, 16)
    }
    try {
      cdc.createSlot()
      cdc.initialSync(source("t_stream"), "t_stream")
      val flush0 = lsnVal(slotCol("confirmed_flush_lsn"))
      withClient { c =>
        c.query("INSERT INTO t_stream SELECT g, 'new' || g FROM generate_series(101, 150) g")
        c.query("UPDATE t_stream SET v = 'upd' || k WHERE k <= 10")
        c.query("DELETE FROM t_stream WHERE k BETWEEN 41 AND 50")
        c.query("UPDATE t_stream SET k = 9001 WHERE k = 20") // key move
      }
      val (u, d) = cdc.streamDrain(Map("t_stream" -> "k"))
      assert(u > 0 && d > 0, s"pushed stream must apply upserts and deletes: ($u, $d)")
      // mirror equals upstream value-for-value
      val upstream = withClient(_.query(
        "SELECT k, v FROM t_stream ORDER BY k").rows.map(_.toList).toList)
      val mirror = store.read("t_stream").orderBy("k").collect().toList
        .map(r => List(r.getAs[java.math.BigDecimal]("k").toBigInteger.toString,
          r.getString(1)))
      assert(mirror == upstream, s"mirror $mirror vs upstream $upstream")
      // the streaming FEEDBACK alone advanced the slot (no SQL get_changes
      // ran): confirmed_flush must be past every applied commit, so the
      // polling path now sees nothing
      var advanced = false
      var i = 0
      while (!advanced && i < 20) { // walsender applies feedback async
        advanced = lsnVal(slotCol("confirmed_flush_lsn")) > flush0
        if (!advanced) Thread.sleep(250)
        i += 1
      }
      assert(advanced, "standby feedback must advance confirmed_flush_lsn")
      assert(cdc.pump("t_stream", "k") == ((0L, 0L)),
        "acknowledged WAL must not replay through the polling path")
    } finally cdc.dropSlot()
  }

  test("continuous streaming mirror (Syncer transport): WAL footprint stays bounded under churn") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_mirror")
      c.query("CREATE TABLE t_mirror (k bigint PRIMARY KEY, v text)")
      c.query("INSERT INTO t_mirror SELECT g, 'v' || g FROM generate_series(1, 50) g")
    }
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-cdc-mirror").toString)
    val cdc = new PgCdc(spark, pg.get, store, slot = "graft_cdc_mirror")
    def lsn(sql: String): Long = withClient { c =>
      val v = c.query(sql).rows.head.head
      val Array(hi, lo) = v.split("/")
      (java.lang.Long.parseLong(hi, 16) << 32) | java.lang.Long.parseLong(lo, 16)
    }
    def slotFlush(): Long = lsn("SELECT confirmed_flush_lsn::text FROM " +
      "pg_replication_slots WHERE slot_name = 'graft_cdc_mirror'")
    try {
      val src = source("t_mirror")
      val syncer = new Syncer(store, src)
      @volatile var stop = false
      @volatile var totals: (Long, Long) = null
      @volatile var err: Throwable = null
      // the long-running Syncer transport on its own thread: slot +
      // snapshot + continuous STREAMING apply (this server's pg_hba allows
      // replication, so PgCdc.mirror negotiates the streaming path)
      val t = new Thread(() => {
        try totals = syncer.cdcMirror(cdc, src,
          Map("t_mirror" -> "k"), () => stop, idleMillis = 200)
        catch { case x: Throwable => err = x }
      })
      t.start()
      var i = 0
      while (!store.exists("t_mirror") && err == null && i < 200) {
        Thread.sleep(100); i += 1
      }
      assert(err == null, s"mirror died during snapshot: $err")
      assert(store.exists("t_mirror"), "mirror never completed its snapshot load")
      // churn: after EVERY committed batch, the slot's confirmed_flush
      // must catch the WAL head captured at commit time — i.e. upstream
      // retained WAL is bounded by the in-flight batch, whatever the
      // churn volume, because standby feedback flows at apply speed
      (1 to 4).foreach { b =>
        withClient(_.query("INSERT INTO t_mirror SELECT g, 'c' || g FROM " +
          s"generate_series(${b * 1000 + 1}, ${b * 1000 + 300}) g"))
        val head = lsn("SELECT pg_current_wal_lsn()::text")
        var j = 0
        while (slotFlush() < head && err == null && j < 100) {
          Thread.sleep(150); j += 1
        }
        assert(err == null, s"mirror died mid-churn: $err")
        assert(slotFlush() >= head,
          s"batch $b: confirmed_flush ${slotFlush()} never caught the " +
            s"commit-time WAL head $head — the slot is retaining WAL")
      }
      stop = true
      t.join(30000)
      assert(!t.isAlive, "mirror thread must stop when asked")
      assert(err == null, s"mirror failed: $err")
      assert(totals != null && totals._1 >= 1200L,
        s"expected the 4x300 churned rows applied, got $totals")
      val upstream = withClient(_.query("SELECT count(*) FROM t_mirror").scalar).toLong
      assert(store.read("t_mirror").count() == upstream,
        "mirror must converge to the upstream row count")
    } finally cdc.dropSlot()
  }

  test("CDC multi-table: unmirrored changes raise BEFORE consumption; peek loses nothing") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP TABLE IF EXISTS t_g1; DROP TABLE IF EXISTS t_g2")
      c.query("CREATE TABLE t_g1 (k bigint PRIMARY KEY, v text)")
      c.query("CREATE TABLE t_g2 (k bigint PRIMARY KEY, v text)")
    }
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-cdc-guard").toString)
    val cdc = new PgCdc(spark, pg.get, store, slot = "graft_cdc_guard")
    try {
      cdc.createSlot()
      val src = new PgWireSource(spark, pg.get, tables = Seq("t_g1", "t_g2"))
      cdc.initialSync(src, "t_g1")
      cdc.initialSync(src, "t_g2")
      withClient { c =>
        c.query("INSERT INTO t_g1 SELECT g, 'a' || g FROM generate_series(1, 30) g")
        c.query("INSERT INTO t_g2 SELECT g, 'b' || g FROM generate_series(1, 40) g")
      }
      // the slot holds BOTH tables' changes: a single-table apply must
      // refuse rather than destructively skip t_g2's rows
      val e = intercept[IllegalArgumentException](cdc.pumpAll(Map("t_g1" -> "k")))
      assert(e.getMessage.contains("t_g2"), e.getMessage)
      // nothing was consumed by the refusal (peek-validate-apply-advance):
      // the full map now applies every change of both tables
      val (u, d) = cdc.drainAll(Map("t_g1" -> "k", "t_g2" -> "k"))
      assert(u == 70 && d == 0, s"expected all 70 inserts to survive, got ($u, $d)")
      assert(store.read("t_g1").count() == 30)
      assert(store.read("t_g2").count() == 40)
    } finally cdc.dropSlot()
  }

  test("table list excludes views; unique-index fallback when no PK") {
    assume(pg.isDefined, "no live Postgres in this environment")
    withClient { c =>
      c.query("DROP VIEW IF EXISTS v_masked")
      c.query("DROP TABLE IF EXISTS t_uniq")
      c.query("CREATE TABLE t_uniq (a bigint, b text)")
      c.query("CREATE UNIQUE INDEX ON t_uniq (a)")
      c.query("CREATE VIEW v_masked AS SELECT a FROM t_uniq")
    }
    val s = new PgWireSource(spark, pg.get)
    val ts = s.listTables()
    assert(ts.contains("t_uniq") && !ts.contains("v_masked"))
    assert(s.uniqueKey("t_uniq").contains("a"))
  }
}
