package graft

/** The wire server driven by REAL `pgbench` — PostgreSQL's own OLTP
  * harness. `pgbench -i` exercises DROP/CREATE TABLE, multi-table
  * TRUNCATE, client-side COPY FROM STDIN of 100k rows, VACUUM and ADD
  * PRIMARY KEY; the TPC-B run then drives CONCURRENT read-write
  * transactions (BEGIN; 3 UPDATEs + SELECT + INSERT; END) from parallel
  * libpq connections. The balance invariant at the end is the point:
  * every client's delta must land exactly once in all three balance
  * tables AND the history table, so lost updates, dirty reads of
  * half-applied versions, or clobbered appends under the per-table COW
  * locking would all show up as a sum mismatch. Self-skips without
  * pgbench binaries.
  */
class PgBenchSpec extends SparkSpecBase {

  private def bin(name: String): Option[String] =
    Seq(s"/usr/bin/$name", s"/usr/local/bin/$name")
      .find(p => java.nio.file.Files.isExecutable(java.nio.file.Paths.get(p)))

  private lazy val server: Int = {
    Tables.registerAll(spark, sfDir)
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-pgbench").toString)
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

  private def pgbench(args: String*): (Int, String) =
    run(Seq(bin("pgbench").get, "-h", "127.0.0.1", "-p", server.toString,
      "-U", "graft") ++ args :+ "graft")

  private def sql(q: String): String = {
    val (rc, out) = run(Seq(bin("psql").get, "-h", "127.0.0.1",
      "-p", server.toString, "-U", "graft", "-d", "graft",
      "-X", "-A", "-t", "-c", q))
    assert(rc == 0, out)
    out.trim
  }

  test("pgbench initializes and a concurrent TPC-B run keeps the balance " +
      "invariant") {
    assume(bin("pgbench").isDefined, "no pgbench in this environment")
    assume(bin("psql").isDefined, "no psql in this environment")
    val (irc, iout) = pgbench("-i", "-s", "1")
    assert(irc == 0, iout.takeRight(1200))
    assert(sql("SELECT count(*) FROM pgbench_accounts") == "100000")
    assert(sql("SELECT count(*) FROM pgbench_branches") == "1")

    // 4 concurrent clients × 5 transactions; -n skips pgbench's own
    // VACUUM + history TRUNCATE so the ledger below starts from zero
    val (rc, out) = pgbench("-n", "-c", "4", "-t", "5")
    assert(rc == 0, out.takeRight(1200))
    assert(out.contains("number of transactions actually processed: 20/20"),
      out.takeRight(600))
    assert(out.contains("number of failed transactions: 0"), out.takeRight(600))

    // TPC-B ledger invariant: each committed transaction applied its delta
    // to accounts, tellers AND branches, and recorded it in history —
    // exactly once each, across interleaved connections
    val sums = sql("SELECT (SELECT sum(abalance) FROM pgbench_accounts), " +
      "(SELECT sum(tbalance) FROM pgbench_tellers), " +
      "(SELECT sum(bbalance) FROM pgbench_branches), " +
      "(SELECT sum(delta) FROM pgbench_history), " +
      "(SELECT count(*) FROM pgbench_history)").split("\\|")
    assert(sums.length == 5, sums.mkString("|"))
    assert(sums(4) == "20", s"history rows: ${sums(4)}")
    assert(sums.take(4).distinct.length == 1,
      s"ledger out of balance: accounts=${sums(0)} tellers=${sums(1)} " +
        s"branches=${sums(2)} history=${sums(3)}")
  }

  test("hot-table ingest: concurrent insert-only txns from parallel clients all commit") {
    assume(bin("pgbench").isDefined, "no pgbench in this environment")
    assume(bin("psql").isDefined, "no psql in this environment")
    sql("CREATE TABLE hot_ingest (client int, n int, payload text)")
    // a custom pgbench script that ONLY inserts into one table inside an
    // explicit txn — the shape a multi-client syncer fan-in drives. Before
    // the merge-commit path, same-table insert txns serialized on the
    // write gate (lock timeouts at any real client count); now they must
    // ALL commit, losing nothing.
    val script = java.nio.file.Files.createTempFile("ins", ".sql")
    java.nio.file.Files.writeString(script,
      """BEGIN;
        |INSERT INTO hot_ingest VALUES (:client_id, :scale, 'x');
        |INSERT INTO hot_ingest VALUES (:client_id, :scale + 1, 'y');
        |END;
        |""".stripMargin)
    val (rc, out) = pgbench("-n", "-c", "6", "-t", "4", "-f", script.toString)
    assert(rc == 0, out.takeRight(1200))
    assert(out.contains("number of transactions actually processed: 24/24"),
      out.takeRight(600))
    assert(out.contains("number of failed transactions: 0"), out.takeRight(600))
    assert(sql("SELECT count(*) FROM hot_ingest") == "48",
      "every concurrent insert txn's rows must land exactly once")
    sql("DROP TABLE hot_ingest")
  }
}
