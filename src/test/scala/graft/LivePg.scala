package graft

import java.nio.file.{Files, Paths}

/** Boots ONE scratch PostgreSQL server per test JVM when the container
  * ships server binaries (`initdb`), and tears it down on JVM exit.
  * Suites `assume` on [[info]], so everything self-skips in a container
  * without Postgres — the same env-gating contract as LiveBackendSpec,
  * but self-provisioning: no external endpoint needed, the smoke runs
  * the moment the image carries the binaries.
  *
  * Root containers can't run postgres directly (it refuses uid 0), so
  * every server command is wrapped with `setpriv` to uid 65534 (nobody)
  * over a nobody-owned data directory.
  */
object LivePg {

  /** Superuser coordinates of the live scratch server; None when the
    * environment can't host one. Role passwords for the auth-path tests:
    * scram_user/scrampw (SCRAM-SHA-256), md5_user/md5pw (MD5),
    * password_user/plainpw (cleartext). */
  lazy val info: Option[PgConnInfo] =
    try boot() catch { case e: Exception =>
      System.err.println(s"[LivePg] no live server: $e")
      None
    }

  private def findBin(name: String): Option[String] =
    (Seq(s"/usr/local/bin/$name") ++
      scala.util.Try(Files.list(Paths.get("/usr/lib/postgresql")).iterator())
        .map(it => scala.jdk.CollectionConverters.IteratorHasAsScala(it)
          .asScala.map(v => s"$v/bin/$name").toSeq).getOrElse(Nil))
      .find(p => Files.isExecutable(Paths.get(p)))

  private def sh(cmd: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    (p.waitFor(), out)
  }

  private def boot(): Option[PgConnInfo] = {
    val initdb = findBin("initdb").getOrElse(return None)
    val pgCtl = findBin("pg_ctl").getOrElse(return None)
    val asRoot = System.getProperty("user.name") == "root"
    def priv(cmd: Seq[String]): Seq[String] =
      if (asRoot) Seq("setpriv", "--reuid=65534", "--regid=65534",
        "--clear-groups") ++ cmd
      else cmd

    val dir = Files.createTempDirectory("graft-livepg").toString
    if (asRoot) sh(Seq("chown", "-R", "65534:65534", dir))
    val data = s"$dir/data"
    val (rc, out) = sh(priv(Seq(initdb, "-D", data, "-A", "trust",
      "-U", "graft", "-E", "UTF8", "--no-locale")))
    require(rc == 0, s"initdb failed: ${out.takeRight(400)}")

    // per-user auth methods FIRST (hba rules match top-down), then the
    // initdb-written trust rules for everything else
    val hba = Paths.get(s"$data/pg_hba.conf")
    val rules =
      """host all scram_user 127.0.0.1/32 scram-sha-256
        |host all md5_user 127.0.0.1/32 md5
        |host all password_user 127.0.0.1/32 password
        |""".stripMargin
    Files.write(hba, (rules + new String(Files.readAllBytes(hba))).getBytes)

    val port = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    val (src, sout) = sh(priv(Seq(pgCtl, "-D", data, "-l", s"$dir/log",
      "-o", s"-p $port -k $dir -c listen_addresses=127.0.0.1" +
        " -c wal_level=logical -c max_replication_slots=4 -c max_wal_senders=4",
      "start")))
    require(src == 0, s"pg_ctl start failed: ${sout.takeRight(400)}")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      sh(priv(Seq(pgCtl, "-D", data, "-m", "immediate", "stop")))
      ()
    }))

    val conn = PgConnInfo("127.0.0.1", port, "graft", "postgres")
    // connectivity check + auth-test roles (password_encryption decides
    // the STORED format; the hba rules above decide the wire method)
    val c = conn.connect()
    try {
      c.query("SET password_encryption = 'scram-sha-256'")
      c.query("CREATE ROLE scram_user LOGIN PASSWORD 'scrampw'")
      c.query("SET password_encryption = 'md5'")
      c.query("CREATE ROLE md5_user LOGIN PASSWORD 'md5pw'")
      c.query("CREATE ROLE password_user LOGIN PASSWORD 'plainpw'")
      c.query("SET password_encryption = 'scram-sha-256'")
    } finally c.close()
    Some(conn)
  }
}
