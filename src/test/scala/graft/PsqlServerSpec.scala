package graft

/** The wire server driven by a REAL libpq client: every test shells out to
  * `psql` (present in this container alongside the live server binaries)
  * and checks what an actual Postgres user would see. JdbcClientSpec
  * replays recorded pgjdbc byte sequences; this suite is the genuine
  * article for the libpq/simple-protocol side — startup, result
  * formatting, multi-statement, SQLSTATE surfacing, COPY framing,
  * cursors, catalog visibility. Self-skips when psql isn't installed.
  */
class PsqlServerSpec extends SparkSpecBase {

  private def psqlBin: Option[String] =
    Seq("/usr/bin/psql", "/usr/local/bin/psql")
      .find(p => java.nio.file.Files.isExecutable(java.nio.file.Paths.get(p)))

  private lazy val server: Int = {
    Tables.registerAll(spark, sfDir)
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-psql").toString)
    new PgWireServer(spark, store, 0).start()
  }

  /** Run psql -At (tuples-only, unaligned) over one -c argument; returns
    * (exit code, stdout+stderr). */
  private def psql(args: String*): (Int, String) = {
    val cmd = Seq(psqlBin.get, "-h", "127.0.0.1", "-p", server.toString,
      "-d", "graft", "-U", "graft", "-X", "-A", "-t") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("PGCONNECT_TIMEOUT", "10")
    pb.environment().put("PGCLIENTENCODING", "UTF8")
    pb.environment().put("LANG", "C.UTF-8")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  test("psql connects and evaluates expressions incl. multibyte output") {
    assume(psqlBin.isDefined, "no psql in this environment")
    // chr(233) = é built SERVER-side: the argv must stay ASCII because the
    // test JVM's native encoding (sun.jnu.encoding) may not be UTF-8, and
    // ProcessBuilder would mangle non-ASCII arguments before psql sees them
    val (rc, out) = psql("-c", "SELECT 1 + 2 AS s, 'h' || chr(233) || 'llo' AS t")
    assert(rc == 0, out)
    assert(out.trim == "3|héllo")
  }

  test("psql startup banner parameters satisfy libpq (server_version etc.)") {
    assume(psqlBin.isDefined, "no psql in this environment")
    val (rc, out) = psql("-c", "SHOW server_version")
    assert(rc == 0, out)
    assert(out.trim.nonEmpty)
  }

  test("multi-statement -c returns each result in order") {
    assume(psqlBin.isDefined, "no psql in this environment")
    val (rc, out) = psql("-c", "SELECT 1; SELECT 2; SELECT 'three'")
    assert(rc == 0, out)
    assert(out.split("\n").map(_.trim).filter(_.nonEmpty).toSeq == Seq("1", "2", "three"))
  }

  test("real tables are queryable through psql") {
    assume(psqlBin.isDefined, "no psql in this environment")
    val (rc, out) = psql("-c",
      "SELECT count(*) FROM lineitem WHERE l_quantity < 10")
    assert(rc == 0, out)
    val expected = spark.sql(
      "SELECT count(*) FROM lineitem WHERE l_quantity < 10").head.getLong(0)
    assert(out.trim == expected.toString)
  }

  test("errors surface as SQLSTATE-carrying psql diagnostics, link survives") {
    assume(psqlBin.isDefined, "no psql in this environment")
    val (rc, out) = psql("-c", "SELECT no_such_column")
    assert(rc != 0)
    assert(out.contains("ERROR"), out)
    // the next connection works — the failed statement wedged nothing
    val (rc2, out2) = psql("-c", "SELECT 42")
    assert(rc2 == 0 && out2.trim == "42", out2)
  }

  test("COPY TO STDOUT streams through a real libpq COPY state machine") {
    assume(psqlBin.isDefined, "no psql in this environment")
    val (rc, out) = psql("-c",
      "COPY (SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 3) TO STDOUT")
    assert(rc == 0, out)
    val lines = out.split("\n").filter(_.nonEmpty)
    assert(lines.length == 3)
    assert(lines(0).startsWith("0\t"), lines(0))
  }

  test("cursors: DECLARE / FETCH / CLOSE inside one session") {
    assume(psqlBin.isDefined, "no psql in this environment")
    val (rc, out) = psql("-c",
      "BEGIN; DECLARE c1 CURSOR FOR SELECT n_nationkey FROM nation ORDER BY 1; " +
        "FETCH 2 FROM c1; FETCH 1 FROM c1; CLOSE c1; COMMIT")
    assert(rc == 0, out)
    // psql prints the command tag of every non-row statement too — assert
    // the full sequence, tags included
    assert(out.split("\n").map(_.trim).filter(_.nonEmpty).toSeq ==
      Seq("BEGIN", "DECLARE CURSOR", "0", "1", "2", "CLOSE CURSOR", "COMMIT"))
  }

  test("catalog introspection: psql \\dt lists synced tables") {
    assume(psqlBin.isDefined, "no psql in this environment")
    val (rc, out) = psql("-c", "\\dt")
    assert(rc == 0, out)
    assert(out.contains("lineitem") && out.contains("nation"), out)
  }

  test("psql \\d describes a table off the live catalog") {
    assume(psqlBin.isDefined, "no psql in this environment")
    // \d fires psql's real introspection queries (regclass casts,
    // pg_attribute/format_type joins) — the catalog surface end-to-end
    val (rc, out) = psql("-c", "\\d nation")
    assert(rc == 0, out)
    assert(out.contains("n_nationkey") && out.contains("n_name"), out)
  }

  test("the psql describe-family meta-commands all succeed off the live catalog") {
    assume(psqlBin.isDefined, "no psql in this environment")
    // every one of these fires a distinct psql introspection query set
    // (E'' escape strings, pg_size_pretty, policy/ACL probes, unnest
    // aliasing, pg_database locale columns …) — a regression in any of
    // those rewrites turns the whole meta-command into an ERROR
    val expectations = Seq(
      "\\d+ nation" -> "n_nationkey", // describe+ with storage/stats cols
      "\\l" -> "graft",               // database list (encoding/collation)
      "\\z nation" -> "nation",       // ACL + policy probes
      "\\dp nation" -> "nation",
      "\\dn+" -> "public",            // schemas with E'\n' ACL joins
      "\\dt+" -> "lineitem",          // sizes via pg_size_pretty
      "\\df sum" -> "",               // empty set in -At mode: no-error is the point
      "\\dT int4" -> "integer",       // pg_type row formats through format_type
      "\\du" -> "graft",              // roles
      "\\dx" -> "",                   // no extensions installed: no-error
      "\\sv pg_tables" -> "CREATE OR REPLACE VIEW")
    for ((cmd, needle) <- expectations) {
      val (rc, out) = psql("-c", cmd)
      assert(rc == 0 && !out.contains("ERROR"), s"$cmd failed:\n$out")
      assert(out.contains(needle), s"$cmd output missing '$needle':\n$out")
    }
  }

  test("SQL-level PREPARE / EXECUTE round-trips through a real client") {
    assume(psqlBin.isDefined, "no psql in this environment")
    val (rc, out) = psql("-c",
      "PREPARE add2(int, int) AS SELECT $1 + $2; EXECUTE add2(20, 22)")
    assert(rc == 0, out)
    assert(out.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      == Seq("PREPARE", "42"), out)
  }
}
