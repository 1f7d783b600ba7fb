package graft

import graft.PgDialect._

/** SQL write surface (PgDml + Store's copy-on-write DML engine): the
  * lifecycle a lakehouse client runs — CREATE TABLE / CTAS, INSERT,
  * UPDATE, DELETE, MERGE, TRUNCATE — plus the parity guard (writes on
  * non-store relations still error exactly like the reference,
  * query_remapper.go:180-184) and the file-level copy-on-write invariants
  * that make the surface scale-shaped. */
class DmlSpec extends SparkSpecBase {

  private lazy val store: Store =
    new Store(spark, java.nio.file.Files.createTempDirectory("graft-dml").toString)

  private def exec(sql: String): PgResult = PgDialect.execute(spark, store, sql)
  private def tag(sql: String): String = exec(sql) match {
    case Command(t) => t
    case other => fail(s"expected command, got $other")
  }
  private def rows(sql: String): Seq[org.apache.spark.sql.Row] = exec(sql) match {
    case Rows(df, _) => df.collect().toSeq
    case other => fail(s"expected rows, got $other")
  }

  test("create table, insert values, select back") {
    assert(tag("CREATE TABLE dml_t (k int8, name text, price numeric(10,2), ts timestamp)")
      == "CREATE TABLE")
    assert(tag("INSERT INTO dml_t VALUES (1, 'ann', 10.50, '2024-01-01 00:00:00'), " +
      "(2, 'bob', 20.00, '2024-01-02 00:00:00')") == "INSERT 0 2")
    // named-column insert: absent columns become NULL
    assert(tag("INSERT INTO dml_t (k, name) VALUES (3, 'cyn')") == "INSERT 0 1")
    val got = rows("SELECT k::int AS k, name, price FROM dml_t ORDER BY k")
    assert(got.map(r => (r.getInt(0), r.getString(1))) ==
      Seq((1, "ann"), (2, "bob"), (3, "cyn")))
    assert(got(2).isNullAt(2), "unlisted column must be NULL")
  }

  test("array-text ingest parses PG quoting: commas, escaped quotes, backslashes") {
    assert(tag("CREATE TABLE dml_arr (k int8, tags text[], ns int4[])")
      == "CREATE TABLE")
    // quoted elements with commas, '' (SQL) + \" (array) escapes, \\ escapes,
    // unquoted NULL vs quoted "NULL", whitespace around elements
    assert(tag("""INSERT INTO dml_arr VALUES
      (1, '{"a,b",c}', '{1, 2 ,3}'),
      (2, '{"he said \"hi\"","back\\slash"}', '{}'),
      (3, '{NULL,"NULL", plain }', NULL)""") == "INSERT 0 3")
    val got = rows("SELECT k::int AS k, tags, ns FROM dml_arr ORDER BY k")
    assert(got(0).getSeq[String](1) == Seq("a,b", "c"), got(0).toString)
    assert(got(0).getSeq[Int](2) == Seq(1, 2, 3), "whitespace-padded ints parse")
    assert(got(1).getSeq[String](1) == Seq("he said \"hi\"", "back\\slash"),
      got(1).toString)
    assert(got(1).getSeq[Int](2) == Seq.empty, "empty array")
    assert(got(2).getSeq[String](1) == Seq(null, "NULL", "plain"),
      "unquoted NULL is SQL NULL; quoted \"NULL\" is the string")
    assert(got(2).isNullAt(2), "NULL array stays NULL")
    // malformed literals raise PG's error, not an index-out-of-bounds from
    // the tokenizer (unterminated quote)
    val e = intercept[Exception](
      exec("""INSERT INTO dml_arr VALUES (9, '{"abc}', NULL)"""))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.toLowerCase.contains("malformed array literal")),
      s"unterminated quote must raise cleanly: ${messages(e).mkString(" | ")}")
    tag("DROP TABLE dml_arr")
  }

  test("ctas + insert select + truncate") {
    import spark.implicits._
    Tables.registerAll(spark, sfDir)
    val t = tag("CREATE TABLE dml_regions AS SELECT r_regionkey, r_name FROM region")
    assert(t.startsWith("SELECT "))
    val n0 = rows("SELECT count(*) AS n FROM dml_regions").head.getLong(0)
    assert(n0 == 5)
    assert(tag("INSERT INTO dml_regions SELECT r_regionkey + 100, upper(r_name) FROM region")
      == "INSERT 0 5")
    assert(rows("SELECT count(*) AS n FROM dml_regions").head.getLong(0) == 10)
    assert(tag("TRUNCATE dml_regions") == "TRUNCATE TABLE")
    assert(rows("SELECT count(*) AS n FROM dml_regions").head.getLong(0) == 0)
  }

  test("TRUNCATE accepts a table list and trailing options like PG " +
      "(pgbench -i issues `truncate table a, b, c, d`)") {
    import spark.implicits._
    tag("CREATE TABLE dml_tl1 AS SELECT r_regionkey FROM region")
    tag("CREATE TABLE dml_tl2 AS SELECT n_nationkey FROM nation")
    assert(tag("TRUNCATE TABLE dml_tl1, dml_tl2 RESTART IDENTITY CASCADE")
      == "TRUNCATE TABLE")
    assert(rows("SELECT count(*) AS n FROM dml_tl1").head.getLong(0) == 0)
    assert(rows("SELECT count(*) AS n FROM dml_tl2").head.getLong(0) == 0)
    // the whole list validates before any member truncates
    tag("INSERT INTO dml_tl1 SELECT r_regionkey FROM region")
    val e = intercept[PgDialect.UnsupportedQuery](
      exec("TRUNCATE dml_tl1, not_a_store_table"))
    assert(e.getMessage.contains("TRUNCATE"))
    assert(rows("SELECT count(*) AS n FROM dml_tl1").head.getLong(0) == 5)
    // constraint DDL is a recorded no-op (pgbench's ADD PRIMARY KEY),
    // never a mis-parsed ADD COLUMN named `primary`
    assert(tag("ALTER TABLE dml_tl1 ADD PRIMARY KEY (r_regionkey)")
      == "ALTER TABLE")
    assert(rows("SELECT * FROM dml_tl1").head.schema.fieldNames.toSeq
      == Seq("r_regionkey"))
  }

  test("update is copy-on-write: untouched files carry, SET sees the old row") {
    import spark.implicits._
    // 4 files keyed by disjoint ranges; update touches only one range
    val df = (1 to 400).map(i => (i.toLong, i.toLong, "x")).toDF("k", "v", "s")
    store.replaceSorted("dml_cow", df, "k", 4)
    val vBefore = store.currentVersion("dml_cow")
    assert(tag("UPDATE dml_cow SET v = v + 1000, s = 'hit' WHERE k BETWEEN 10 AND 20")
      == "UPDATE 11")
    // only the file holding k∈[10,20] was rewritten
    val dirAfter = new java.io.File(store.warehouse, s"dml_cow/v${vBefore + 1}")
    val carried = dirAfter.listFiles().filter(_.getName.endsWith(".parquet"))
      .count(!_.getName.startsWith("cow-"))
    assert(carried == 3, s"3 of 4 files must carry untouched, carried=$carried")
    val got = rows("SELECT v FROM dml_cow WHERE k = 15").head.getLong(0)
    assert(got == 1015L)
    assert(rows("SELECT count(*) AS n FROM dml_cow WHERE s = 'hit'").head.getLong(0) == 11)
    // SET sees the OLD row: swap semantics
    store.replace("dml_swap", Seq((1L, 2L)).toDF("a", "b"))
    assert(tag("UPDATE dml_swap SET a = b, b = a") == "UPDATE 1")
    val r = rows("SELECT a, b FROM dml_swap").head
    assert((r.getLong(0), r.getLong(1)) == (2L, 1L))
  }

  test("update from: join-update, multi-match picks one, tag counts targets") {
    exec("CREATE TABLE uf_t (id int8, v text)")
    exec("INSERT INTO uf_t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    exec("CREATE TABLE uf_s (id int8, nv text)")
    // id=1 has TWO source matches, id=2 one, id=3 none
    exec("INSERT INTO uf_s VALUES (1, 'x1'), (1, 'x2'), (2, 'y')")
    val t = tag("UPDATE uf_t SET v = uf_s.nv FROM uf_s WHERE uf_s.id = uf_t.id")
    assert(t == "UPDATE 2", t) // two TARGET rows updated, not three matches
    val got = rows("SELECT id::int AS id, v FROM uf_t ORDER BY id")
      .map(r => (r.getInt(0), r.getString(1)))
    assert(got(1) == (2, "y") && got(2) == (3, "c"))
    // multi-match picks the first by assigned value — deterministic
    assert(got(0) == (1, "x1"), got.toString)
    // expression assignments referencing both sides work
    tag("UPDATE uf_t SET v = v || '-' || uf_s.nv FROM uf_s " +
      "WHERE uf_s.id = uf_t.id AND uf_t.id = 2")
    assert(rows("SELECT v FROM uf_t WHERE id = 2")(0).getString(0) == "y-y")
    exec("DROP TABLE uf_t"); exec("DROP TABLE uf_s")
  }

  test("join-update and join-delete rewrite only the hit files") {
    import spark.implicits._
    // 4 disjoint-range files; the join source touches only k∈[10,20]
    val df = (1 to 400).map(i => (i.toLong, i.toLong, "x")).toDF("k", "v", "s")
    store.replaceSorted("jdml_t", df, "k", 4)
    store.replace("jdml_s", (10L to 20L).map(k => (k, k + 1000L)).toDF("k", "nv"))
    val v0 = store.currentVersion("jdml_t")
    assert(tag("UPDATE jdml_t SET v = jdml_s.nv FROM jdml_s WHERE jdml_s.k = jdml_t.k")
      == "UPDATE 11")
    val dir1 = new java.io.File(store.warehouse, s"jdml_t/v${v0 + 1}")
    val carried1 = dir1.listFiles().filter(_.getName.endsWith(".parquet"))
      .count(!_.getName.startsWith("cow-"))
    assert(carried1 == 3, s"3 of 4 files must carry through join-update, carried=$carried1")
    assert(rows("SELECT v FROM jdml_t WHERE k = 15").head.getLong(0) == 1015L)
    // join-delete: same pruning, same single-discovery count
    assert(tag("DELETE FROM jdml_t USING jdml_s WHERE jdml_s.k = jdml_t.k")
      == "DELETE 11")
    val dir2 = new java.io.File(store.warehouse, s"jdml_t/v${v0 + 2}")
    val carried2 = dir2.listFiles().filter(_.getName.endsWith(".parquet"))
      .count(!_.getName.startsWith("cow-"))
    assert(carried2 == 3, s"3 of 4 files must carry through join-delete, carried=$carried2")
    assert(rows("SELECT count(*) AS n FROM jdml_t").head.getLong(0) == 389)
    // no-match join DML: zero files rewritten, version unchanged
    store.replace("jdml_z", Seq((9999L, 0L)).toDF("k", "nv"))
    val v2 = store.currentVersion("jdml_t")
    assert(tag("UPDATE jdml_t SET v = jdml_z.nv FROM jdml_z WHERE jdml_z.k = jdml_t.k")
      == "UPDATE 0")
    assert(store.currentVersion("jdml_t") == v2, "no-op join-update must not version")
    exec("DROP TABLE jdml_t"); exec("DROP TABLE jdml_s"); exec("DROP TABLE jdml_z")
  }

  test("join DML with filtered subquery sources splits at the top-level WHERE") {
    exec("CREATE TABLE sq_t (id int8, v text)")
    exec("INSERT INTO sq_t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    exec("CREATE TABLE sq_s (id int8, nv text, keep int8)")
    exec("INSERT INTO sq_s VALUES (1, 'x', 1), (2, 'y', 0), (3, 'z', 1)")
    // the subquery's inner WHERE must not be mistaken for the join WHERE
    val t = tag("UPDATE sq_t SET v = s.nv FROM (SELECT id, nv FROM sq_s WHERE keep = 1) s " +
      "WHERE s.id = sq_t.id")
    assert(t == "UPDATE 2", t)
    assert(rows("SELECT v FROM sq_t ORDER BY id").map(_.getString(0))
      == Seq("x", "b", "z"))
    val d = tag("DELETE FROM sq_t USING (SELECT id FROM sq_s WHERE keep = 1) s " +
      "WHERE s.id = sq_t.id")
    assert(d == "DELETE 2", d)
    assert(rows("SELECT id::int AS id FROM sq_t").map(_.getInt(0)) == Seq(2))
    exec("DROP TABLE sq_t"); exec("DROP TABLE sq_s")
  }

  test("insert on conflict: do nothing and do update with excluded") {
    exec("CREATE TABLE oc_t (id int8, v text, n int8)")
    exec("INSERT INTO oc_t VALUES (1, 'a', 10), (2, 'b', 20)")
    // DO NOTHING: conflicting row skipped, fresh row lands, in-batch dup
    // of a fresh key inserts once
    val t1 = tag("INSERT INTO oc_t VALUES (1, 'x', 99), (3, 'c', 30), (3, 'cc', 33) " +
      "ON CONFLICT (id) DO NOTHING")
    assert(t1 == "INSERT 0 1", t1)
    assert(rows("SELECT v FROM oc_t WHERE id = 1")(0).getString(0) == "a")
    // DO UPDATE: excluded.* is the incoming row, existing cols readable
    val t2 = tag("INSERT INTO oc_t VALUES (1, 'A', 100), (4, 'd', 40) " +
      "ON CONFLICT (id) DO UPDATE SET v = excluded.v, n = oc_t.n + excluded.n")
    assert(t2 == "INSERT 0 2", t2)
    val got = rows("SELECT id::int AS id, v, n::int AS n FROM oc_t ORDER BY id")
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(got == Seq((1, "A", 110), (2, "b", 20), (3, "c", 30), (4, "d", 40)), got.toString)
    // DO UPDATE ... WHERE: rows failing the condition stay untouched
    val t3 = tag("INSERT INTO oc_t VALUES (2, 'B', 1), (3, 'C', 100) " +
      "ON CONFLICT (id) DO UPDATE SET v = excluded.v WHERE excluded.n > 50")
    assert(t3 == "INSERT 0 1", t3)
    assert(rows("SELECT v FROM oc_t WHERE id = 2")(0).getString(0) == "b")
    assert(rows("SELECT v FROM oc_t WHERE id = 3")(0).getString(0) == "C")
    // PG-legal unqualified target refs: SET n = n + 1 reads the OLD n,
    // never the ambiguous excluded.n
    val t4 = tag("INSERT INTO oc_t VALUES (1, 'ign', 5) " +
      "ON CONFLICT (id) DO UPDATE SET n = n + 1")
    assert(t4 == "INSERT 0 1", t4)
    assert(rows("SELECT n::int AS n FROM oc_t WHERE id = 1")(0).getInt(0) == 111)
    exec("DROP TABLE oc_t")
  }

  test("on conflict in-batch duplicate keys resolve deterministically") {
    exec("CREATE TABLE ocd_t (id int8, v text)")
    exec("INSERT INTO ocd_t VALUES (1, 'orig')")
    // two same-key rows in one batch: the smallest by the non-key columns
    // wins — stable across repartitions, not a scan-order accident
    val t = tag("INSERT INTO ocd_t VALUES (1, 'zz'), (1, 'aa'), (2, 'bb'), (2, 'ab') " +
      "ON CONFLICT (id) DO UPDATE SET v = excluded.v")
    assert(t == "INSERT 0 2", t)
    assert(rows("SELECT v FROM ocd_t ORDER BY id").map(_.getString(0))
      == Seq("aa", "ab"))
    exec("DROP TABLE ocd_t")
  }

  test("on conflict dedup tolerates unorderable column types") {
    import spark.implicits._
    // a MAP column has no ordering: the in-batch duplicate-key window must
    // order by the orderable non-key columns only (here: none besides the
    // map -> dropDuplicates fallback), not fail analysis
    store.replace("ocd_map", Seq((1L, Map("a" -> 1))).toDF("k", "m"))
    val t = tag("INSERT INTO ocd_map VALUES (2, map('b', 2)), (2, map('c', 3)) " +
      "ON CONFLICT (k) DO NOTHING")
    assert(t == "INSERT 0 1", t)
    assert(rows("SELECT count(*) AS n FROM ocd_map").head.getLong(0) == 2)
    exec("DROP TABLE ocd_map")
  }

  test("drop view/table tolerate trailing CASCADE/RESTRICT") {
    exec("CREATE TABLE casc_t (id int8)")
    exec("CREATE VIEW casc_v AS SELECT id FROM casc_t")
    assert(tag("DROP VIEW casc_v CASCADE") == "DROP VIEW")
    assert(store.viewDefinition("casc_v").isEmpty, "CASCADE view must actually drop")
    // without IF EXISTS a re-drop names the right relation
    val e = intercept[Exception] { exec("DROP VIEW casc_v RESTRICT") }
    assert(e.getMessage.contains("casc_v"), e.getMessage)
    assert(tag("DROP TABLE casc_t CASCADE") == "DROP TABLE")
    assert(!store.exists("casc_t"))
  }

  test("randomized DML sequences match an in-memory model exactly") {
    // model-based check over the whole write surface: 80 random
    // INSERT / upsert / UPDATE / DELETE / join-UPDATE / TRUNCATE
    // statements run through the SQL layer AND mirrored on a plain Map;
    // every command tag must equal the model's change count and the full
    // table state must equal the model after every statement. Seeded —
    // failures replay identically.
    exec("CREATE TABLE dml_rand (k int8, v int8, s text)")
    val rnd = new scala.util.Random(42)
    var model = Map.empty[Long, (Long, String)]
    def key(): Long = rnd.nextInt(40).toLong
    def stateMatches(step: Int, op: String): Unit = {
      // storage int8 is DECIMAL(38,0) by the engine's documented PG type
      // mapping (PgTypes) — cast on read like any client; the cast also
      // guards against type drift (a non-numeric v would fail here)
      val got = rows("SELECT k::int AS k, v::int AS v, s FROM dml_rand ORDER BY k")
        .map(r => r.getInt(0).toLong -> ((r.getInt(1).toLong, r.getString(2)))).toMap
      assert(got == model, s"step $step ($op) diverged: got=$got model=$model")
    }
    for (step <- 1 to 80) {
      val op = rnd.nextInt(7)
      op match {
        case 0 => // INSERT fresh keys only (table has no constraint; the
          // model is keyed, so plain INSERT stays collision-free)
          val fresh = (1 to 3).map(_ => key()).distinct.filterNot(model.contains)
          if (fresh.nonEmpty) {
            val vals = fresh.map(k => s"($k, ${k * 10}, 's$k')").mkString(", ")
            assert(tag(s"INSERT INTO dml_rand VALUES $vals")
              == s"INSERT 0 ${fresh.size}", s"step $step")
            model ++= fresh.map(k => k -> ((k * 10, s"s$k")))
          }
        case 1 => // upsert via ON CONFLICT DO UPDATE
          val ks = (1 to 3).map(_ => key()).distinct
          val vals = ks.map(k => s"($k, ${step * 100 + k}, 'u$step')").mkString(", ")
          assert(tag(s"INSERT INTO dml_rand VALUES $vals " +
            "ON CONFLICT (k) DO UPDATE SET v = excluded.v, s = excluded.s")
            == s"INSERT 0 ${ks.size}", s"step $step")
          model ++= ks.map(k => k -> ((step * 100L + k, s"u$step")))
        case 2 => // ON CONFLICT DO NOTHING: only fresh keys land
          val ks = (1 to 2).map(_ => key()).distinct
          val vals = ks.map(k => s"($k, ${step}, 'n$step')").mkString(", ")
          val fresh = ks.filterNot(model.contains)
          assert(tag(s"INSERT INTO dml_rand VALUES $vals ON CONFLICT (k) DO NOTHING")
            == s"INSERT 0 ${fresh.size}", s"step $step")
          model ++= fresh.map(k => k -> ((step.toLong, s"n$step")))
        case 3 => // range UPDATE reading the old row
          val (lo, hi) = { val a = key(); val b = key(); (a min b, a max b) }
          val hits = model.keys.count(k => k >= lo && k <= hi)
          assert(tag(s"UPDATE dml_rand SET v = v + 1, s = 'm$step' " +
            s"WHERE k BETWEEN $lo AND $hi") == s"UPDATE $hits", s"step $step")
          model = model.map { case (k, (v, s)) =>
            if (k >= lo && k <= hi) k -> ((v + 1, s"m$step")) else k -> ((v, s)) }
        case 4 => // range DELETE
          val (lo, hi) = { val a = key(); val b = key(); (a min b, a max b) }
          val hits = model.keys.count(k => k >= lo && k <= hi)
          assert(tag(s"DELETE FROM dml_rand WHERE k >= $lo AND k <= $hi")
            == s"DELETE $hits", s"step $step")
          model = model.filterNot { case (k, _) => k >= lo && k <= hi }
        case 5 =>
          if (rnd.nextInt(10) == 0) { // rare TRUNCATE
            assert(tag("TRUNCATE dml_rand") == "TRUNCATE TABLE", s"step $step")
            model = Map.empty
          } else { // join-UPDATE from a VALUES source
            val ks = (1 to 2).map(_ => key()).distinct
            val vals = ks.map(k => s"($k, ${step * 1000 + k})").mkString(", ")
            val hits = ks.count(model.contains)
            assert(tag(s"UPDATE dml_rand SET v = src.nv " +
              s"FROM (VALUES $vals) AS src(k2, nv) WHERE src.k2 = dml_rand.k")
              == s"UPDATE $hits", s"step $step")
            model = model.map { case (k, (v, s)) =>
              if (ks.contains(k)) k -> ((step * 1000L + k, s)) else k -> ((v, s)) }
          }
        case 6 => // join-DELETE from a VALUES source
          val ks = (1 to 2).map(_ => key()).distinct
          val vals = ks.map(k => s"($k)").mkString(", ")
          val hits = ks.count(model.contains)
          assert(tag(s"DELETE FROM dml_rand USING (VALUES $vals) AS src(k2) " +
            s"WHERE src.k2 = dml_rand.k") == s"DELETE $hits", s"step $step")
          model = model.filterNot { case (k, _) => ks.contains(k) }
      }
      stateMatches(step, op.toString)
    }
    assert(model.nonEmpty, "sequence should end with live rows (seed-dependent)")
    exec("DROP TABLE dml_rand")
  }

  test("comment on table/column persists and answers through descriptions") {
    exec("CREATE TABLE cmt_t (id int8, v text)")
    assert(tag("COMMENT ON TABLE cmt_t IS 'it''s a test table'") == "COMMENT")
    assert(tag("COMMENT ON COLUMN cmt_t.v IS 'payload'") == "COMMENT")
    // obj_description / col_description answer from live pg_description
    val od = rows("SELECT obj_description(c.oid, 'pg_class') AS d " +
      "FROM pg_class c WHERE c.relname = 'cmt_t'")
    assert(od.head.getString(0) == "it's a test table", od)
    val cd = rows("SELECT col_description(c.oid, 2) AS d " +
      "FROM pg_class c WHERE c.relname = 'cmt_t'")
    assert(cd.head.getString(0) == "payload", cd)
    // durable: a fresh Store over the same warehouse still has them
    val reopened = new Store(spark, store.warehouse)
    assert(reopened.comments.get("cmt_t").contains("it's a test table"))
    assert(reopened.comments.get("cmt_t.v").contains("payload"))
    // IS NULL clears
    assert(tag("COMMENT ON TABLE cmt_t IS NULL") == "COMMENT")
    val cleared = rows("SELECT obj_description(c.oid, 'pg_class') AS d " +
      "FROM pg_class c WHERE c.relname = 'cmt_t'")
    assert(cleared.head.isNullAt(0), cleared)
    // other COMMENT targets remain accepted no-ops
    assert(tag("COMMENT ON FUNCTION f(int) IS 'x'") == "COMMENT")
    exec("DROP TABLE cmt_t")
  }

  test("join-DML subquery sources evaluate once across discovery and rewrite") {
    import spark.implicits._
    // the translated FROM/USING subquery is persisted before the discovery
    // job, so an expensive source computes ONCE even though two jobs (hit
    // discovery + file rewrite) consume it — pinned with a counting UDF
    store.replace("jsrc_t", (1L to 100L).map(k => (k, k)).toDF("k", "v"))
    store.replace("jsrc_s", (10L to 19L).map(k => (k, k + 500L)).toDF("k", "nv"))
    DmlSpec.probeCalls.set(0)
    spark.udf.register("dml_probe", (x: Long) => {
      DmlSpec.probeCalls.incrementAndGet(); x
    })
    assert(tag("UPDATE jsrc_t SET v = s.nv FROM " +
      "(SELECT k, dml_probe(nv) AS nv FROM jsrc_s) s WHERE s.k = jsrc_t.k")
      == "UPDATE 10")
    assert(rows("SELECT v FROM jsrc_t WHERE k = 12").head.getLong(0) == 512L)
    val calls = DmlSpec.probeCalls.get
    assert(calls == 10, s"source must evaluate once per row (10), not $calls")
    // join-delete through the same path
    DmlSpec.probeCalls.set(0)
    assert(tag("DELETE FROM jsrc_t USING " +
      "(SELECT dml_probe(k) AS k FROM jsrc_s) s WHERE s.k = jsrc_t.k")
      == "DELETE 10")
    val dcalls = DmlSpec.probeCalls.get
    assert(dcalls == 10, s"delete source must evaluate once per row, got $dcalls")
    exec("DROP TABLE jsrc_t"); exec("DROP TABLE jsrc_s")
  }

  test("delete using: join-delete removes matched target rows once") {
    exec("CREATE TABLE du_t (id int8, v text)")
    exec("INSERT INTO du_t VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    exec("CREATE TABLE du_s (id int8)")
    exec("INSERT INTO du_s VALUES (1), (1), (3)") // duplicate match counts once
    val t = tag("DELETE FROM du_t USING du_s WHERE du_s.id = du_t.id")
    assert(t == "DELETE 2", t)
    assert(rows("SELECT id::int AS id FROM du_t ORDER BY id").map(_.getInt(0))
      == Seq(2, 4))
    exec("DROP TABLE du_t"); exec("DROP TABLE du_s")
  }

  test("delete where; null predicate keeps rows") {
    import spark.implicits._
    store.replace("dml_del",
      Seq((1L, Some(1L)), (2L, None), (3L, Some(3L))).toDF("k", "v"))
    // v > 2 is NULL for k=2 — SQL keeps it (not TRUE)
    assert(tag("DELETE FROM dml_del WHERE v > 2") == "DELETE 1")
    assert(rows("SELECT k FROM dml_del ORDER BY k").map(_.getLong(0)) == Seq(1L, 2L))
    assert(tag("DELETE FROM dml_del") == "DELETE 2")
    assert(rows("SELECT count(*) AS n FROM dml_del").head.getLong(0) == 0)
  }

  test("merge: update + delete + insert clauses in order, pruned rewrite") {
    import spark.implicits._
    store.replace("dml_m",
      Seq((1L, 10L, "keep"), (2L, 20L, "upd"), (3L, 30L, "del")).toDF("k", "v", "s"))
    store.replace("dml_src",
      Seq((2L, 200L), (3L, 0L), (4L, 400L)).toDF("k", "nv"))
    val t = tag("""MERGE INTO dml_m AS t USING dml_src AS s ON t.k = s.k
      WHEN MATCHED AND s.nv = 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.nv, s = 'merged'
      WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (s.k, s.nv, 'new')""")
    assert(t == "MERGE 3", s"got $t")
    val got = rows("SELECT k, v, s FROM dml_m ORDER BY k")
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got == Seq((1L, 10L, "keep"), (2L, 200L, "merged"), (4L, 400L, "new")))
    // duplicate source keys error like PG
    store.replace("dml_dup", Seq((2L, 1L), (2L, 2L)).toDF("k", "nv"))
    val e = intercept[Exception] {
      exec("MERGE INTO dml_m t USING dml_dup s ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.nv")
    }
    assert(e.getMessage.contains("second time"))
  }

  test("merge tag counts ride the write job — no extra count jobs") {
    import spark.implicits._
    // nUpd/nDel/nIns come from CollectMetrics observations on the write
    // plan itself; the old design re-ran the matched join and the insert
    // anti-join purely for the tag (+2 jobs). Expected jobs for a merge
    // with both legs: duplicate-key guard, prune probe, the single write
    // (both legs unioned) — anything beyond a small slack means a count
    // job crept back in.
    store.replace("mjc_t", (1L to 1000L).map(k => (k, k)).toDF("k", "v"))
    store.replace("mjc_s", (900L to 1100L).map(k => (k, k * 2L)).toDF("k", "nv"))
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.add(j.stageInfos.map(_.name).mkString("|")); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // matched keys 900..1000 (101 updates, nv <= 2000 so no deletes);
      // not-matched 1001..1100 (100 inserts) -> tag 201
      val t = tag("MERGE INTO mjc_t t USING mjc_s s ON t.k = s.k " +
        "WHEN MATCHED AND s.nv > 2100 THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET v = s.nv " +
        "WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.nv)")
      assert(t == "MERGE 201", t)
      // settle the async listener bus, then pin the job budget
      var tries = 0
      var last = -1
      while (tries < 20 && jobs.size != last) {
        last = jobs.size; Thread.sleep(100); tries += 1
      }
      // the only aggregate-to-driver job is the duplicate-key guard; the
      // old design added a matched-join groupBy.collect and an
      // inserts.count purely for the tag
      val sites = jobs.toArray.map(_.toString)
      val tagJobs = sites.count(s =>
        s.contains("count at Store") || s.contains("collect at Store"))
      assert(tagJobs <= 1,
        s"merge must not run tag-only count jobs, saw: " +
          sites.mkString("[", ", ", "]"))
      // remaining jobs are the write's AQE stage materializations plus at
      // most two first-read schema loads — a gross-regression backstop
      assert(sites.length <= 12,
        s"merge job count regressed, saw ${sites.length}: " +
          sites.mkString("[", ", ", "]"))
    } finally spark.sparkContext.removeSparkListener(listener)
    val n = rows("SELECT count(*) AS n FROM mjc_t").head.getLong(0)
    assert(n == 1100, s"1000 original + 100 inserts, got $n")
    exec("DROP TABLE mjc_t"); exec("DROP TABLE mjc_s")
  }

  test("merge using a subquery source") {
    import spark.implicits._
    store.replace("dml_m2", Seq((1L, 1L), (2L, 2L)).toDF("k", "v"))
    Tables.registerAll(spark, sfDir)
    assert(tag("""MERGE INTO dml_m2 t
      USING (SELECT r_regionkey AS k, r_regionkey * 10 AS nv FROM region) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.nv
      WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.nv)""") == "MERGE 5")
    val got = rows("SELECT k, v FROM dml_m2 ORDER BY k")
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
  }

  test("writes on non-store relations keep the reference error") {
    Tables.registerAll(spark, sfDir)
    // region IS a resolvable view, but not a store table: reference parity
    val e = intercept[UnsupportedQuery] {
      exec("INSERT INTO region VALUES (9, 'x', 'y')")
    }
    assert(e.getMessage.contains("unsupported query type"))
    intercept[UnsupportedQuery] { exec("UPDATE region SET r_name = 'x'") }
    intercept[UnsupportedQuery] { exec("DELETE FROM nosuch") }
    intercept[UnsupportedQuery] { exec("TRUNCATE region") }
    intercept[UnsupportedQuery] {
      exec("MERGE INTO region t USING region s ON t.r_regionkey = s.r_regionkey " +
        "WHEN MATCHED THEN UPDATE SET r_name = s.r_name")
    }
  }

  test("returning clause streams the affected rows with the DML tag") {
    import spark.implicits._
    store.replace("ret_t", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val ins = exec("INSERT INTO ret_t VALUES (3, 30), (4, 40) RETURNING k, v * 2 AS v2")
    ins match {
      case Rows(df, tag) =>
        assert(tag == "INSERT 0")
        assert(df.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
          == Seq((3L, 60L), (4L, 80L)))
      case other => fail(s"expected rows, got $other")
    }
    val upd = exec("UPDATE ret_t SET v = v + 1 WHERE k >= 3 RETURNING k, v")
    upd match {
      case Rows(df, tag) =>
        assert(tag == "UPDATE")
        // RETURNING shows the POST-update image
        assert(df.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
          == Seq((3L, 31L), (4L, 41L)))
      case other => fail(s"expected rows, got $other")
    }
    val del = exec("DELETE FROM ret_t WHERE v > 40 RETURNING *")
    del match {
      case Rows(df, tag) =>
        assert(tag == "DELETE")
        assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
          == Seq((4L, 41L)))
      case other => fail(s"expected rows, got $other")
    }
    assert(rows("SELECT k FROM ret_t ORDER BY k").map(_.getLong(0))
      == Seq(1L, 2L, 3L))
  }

  test("add column is metadata-only: no files touched, null-fill, writable") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"n$i")).toDF("k", "nm")
    store.replaceSorted("evo_t", df, "k", 4)
    val vBefore = store.currentVersion("evo_t")
    assert(tag("ALTER TABLE evo_t ADD COLUMN score float8") == "ALTER TABLE")
    assert(store.currentVersion("evo_t") == vBefore,
      "ADD COLUMN must not write a new version (zero data files touched)")
    assert(rows("SELECT count(*) AS n FROM evo_t WHERE score IS NULL")
      .head.getLong(0) == 100)
    assert(tag("INSERT INTO evo_t VALUES (101, 'new', 9.5)") == "INSERT 0 1")
    assert(tag("UPDATE evo_t SET score = k * 1.0 WHERE k <= 3") == "UPDATE 3")
    val got = rows("SELECT k, score FROM evo_t WHERE score IS NOT NULL ORDER BY k")
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (101L, 9.5)))
  }

  test("rename column is metadata-only; upsert by the renamed key still prunes") {
    import spark.implicits._
    store.replaceSorted("evo_r",
      (1 to 200).map(i => (i.toLong, i * 10L)).toDF("id", "v"), "id", 4)
    assert(tag("ALTER TABLE evo_r RENAME COLUMN id TO ext_id") == "ALTER TABLE")
    assert(rows("SELECT ext_id FROM evo_r WHERE ext_id = 7").head.getLong(0) == 7L)
    val (rewritten, total) =
      store.upsert("evo_r", Seq((5L, 999L)).toDF("ext_id", "v"), "ext_id")
    assert(total == 4 && rewritten == 1,
      s"footer pruning must survive the rename: $rewritten of $total")
    assert(rows("SELECT v FROM evo_r WHERE ext_id = 5").head.getLong(0) == 999L)
    // the old name is gone from the visible surface
    intercept[Exception] { rows("SELECT id FROM evo_r") }
  }

  test("drop column hides old bytes forever; re-added name starts fresh") {
    import spark.implicits._
    store.replace("evo_d", Seq((1L, "secret"), (2L, "hidden")).toDF("k", "s"))
    assert(tag("ALTER TABLE evo_d DROP COLUMN s") == "ALTER TABLE")
    assert(rows("SELECT * FROM evo_d ORDER BY k").head.length == 1)
    assert(tag("ALTER TABLE evo_d ADD COLUMN s text") == "ALTER TABLE")
    val got = rows("SELECT k, s FROM evo_d ORDER BY k")
    assert(got.forall(_.isNullAt(1)),
      "re-added column must NOT resurface dropped bytes")
    // evolution survives a store restart (catalog-persisted)
    val store2 = new Store(spark, store.warehouse)
    assert(store2.read("evo_d").columns.toSeq == Seq("k", "s"))
    assert(store2.read("evo_d").collect().forall(_.isNullAt(1)))
  }

  test("catalog views reflect evolved schemas") {
    import spark.implicits._
    store.replace("evo_cat", Seq((1L, "x")).toDF("k", "old_name"))
    exec("ALTER TABLE evo_cat RENAME COLUMN old_name TO new_name")
    exec("ALTER TABLE evo_cat ADD COLUMN extra int4")
    val cols = rows("""SELECT column_name FROM information_schema.columns
      WHERE table_name = 'evo_cat' ORDER BY ordinal_position""")
      .map(_.getString(0))
    assert(cols == Seq("k", "new_name", "extra"),
      s"information_schema must show the LOGICAL schema, got $cols")
    val att = rows("""SELECT a.attname FROM pg_attribute a
      JOIN pg_class c ON a.attrelid = c.oid
      WHERE c.relname = 'evo_cat' AND a.attnum > 0 ORDER BY a.attnum""")
      .map(_.getString(0))
    assert(att == Seq("k", "new_name", "extra"), s"pg_attribute: $att")
  }

  test("alter refuses when a matview depends on the table") {
    import spark.implicits._
    store.replace("evo_g", Seq((1L, 2L)).toDF("g", "x"))
    store.createMatview("evo_g_mv", "SELECT g, sum(x) AS sx FROM evo_g GROUP BY g")
    val e = intercept[Exception] { exec("ALTER TABLE evo_g ADD COLUMN y int4") }
    assert(e.getMessage.contains("depends"))
    store.dropMatview("evo_g_mv")
    assert(tag("ALTER TABLE evo_g ADD COLUMN y int4") == "ALTER TABLE")
  }

  test("vacuum compacts the small-file tail and expires old snapshots") {
    import spark.implicits._
    store.replace("vac_t", Seq((0L, "base")).toDF("k", "v"))
    (1 to 8).foreach(i =>
      exec(s"INSERT INTO vac_t VALUES ($i, 'row$i')"))
    val before = store.read("vac_t").count()
    val (_, filesAfter, expired) = store.vacuum("vac_t")
    assert(filesAfter <= 2, s"tail must compact, got $filesAfter files")
    assert(expired > 0, "superseded snapshots must expire")
    assert(store.read("vac_t").count() == before)
    assert(tag("VACUUM vac_t") == "VACUUM")
    intercept[UnsupportedQuery] { exec("VACUUM region") }
  }

  test("concurrent appends to one table serialize, none lost") {
    import spark.implicits._
    store.replace("conc_t", Seq((0L, 0L)).toDF("k", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val futures = (1 to 16).map { i =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          store.appendCompacting("conc_t", Seq((i.toLong, i.toLong)).toDF("k", "v"))
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    assert(store.read("conc_t").count() == 17,
      "every concurrent append must land exactly once")
    assert(store.read("conc_t").select("k").distinct().count() == 17)
  }

  test("incremental matviews refresh exactly across COW update/delete/merge") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    store.replace("ivmdml_t",
      (1 to 300).map(i => (i.toLong, (i % 5).toString, i.toLong)).toDF("k", "g", "x"))
    store.createIncrementalMatview("ivmdml_v", "ivmdml_t", Seq("g"), Seq("x"))
    def recompute() = store.read("ivmdml_t").groupBy("g")
      .agg(count(lit(1)).as("n_rows"), sum(col("x")).as("sum_x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def view() = store.read("ivmdml_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    exec("UPDATE ivmdml_t SET x = x + 100 WHERE k <= 50")
    store.incrementalRefresh("ivmdml_v")
    assert(view() == recompute(), "after COW update")

    exec("DELETE FROM ivmdml_t WHERE g = '3' AND k > 200")
    store.incrementalRefresh("ivmdml_v")
    assert(view() == recompute(), "after COW delete")

    store.replace("ivmdml_src", Seq((10L, "9", 999L), (1000L, "9", 1L))
      .toDF("k", "g", "x"))
    exec("""MERGE INTO ivmdml_t t USING ivmdml_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET g = s.g, x = s.x
      WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.g, s.x)""")
    store.incrementalRefresh("ivmdml_v")
    assert(view() == recompute(), "after MERGE")
  }

  test("dml invalidates cached plans and reflects in time travel") {
    import spark.implicits._
    store.replace("dml_tt", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val v1 = store.currentVersion("dml_tt")
    val q = "SELECT count(*) AS n FROM dml_tt"
    assert(rows(q).head.getLong(0) == 2)
    assert(tag("DELETE FROM dml_tt WHERE k = 1") == "DELETE 1")
    assert(rows(q).head.getLong(0) == 1, "cached plan must not serve stale data")
    assert(rows(s"SELECT count(*) AS n FROM dml_tt FOR VERSION AS OF $v1")
      .head.getLong(0) == 2, "pre-DML snapshot stays readable")
  }
}

object DmlSpec {
  /** Shared counter for the source-evaluated-once pin: the counting UDF
    * runs in executor threads of the local JVM, so a static atomic sees
    * every invocation. */
  val probeCalls = new java.util.concurrent.atomic.AtomicInteger(0)
}
