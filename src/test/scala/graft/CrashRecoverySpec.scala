package graft

import org.apache.spark.sql.functions._

/** Kill -9 a writer JVM mid-commit; the warehouse must recover.
  *
  * Forks graft.CrashWriter (real JVM, real SIGKILL — not an in-process
  * simulation), waits for a few acknowledged commits, kills it at a random
  * offset inside the next commit cycle, and remounts. The invariants are
  * the write path's whole durability contract:
  *   - atomicity: the surviving row count is a whole number of batches
  *     (a version publish is all-or-nothing; no partial batch visible),
  *     at or one past the last acknowledged commit (the ack line can die
  *     with the process after the publish won);
  *   - integrity: every surviving batch is complete and exact;
  *   - recoverability: a NEW writer over the crashed warehouse continues
  *     from the surviving state — including clearing any orphaned
  *     version dir the dead writer left mid-write (freshVersionDir's
  *     ghost-file contract).
  * Three kill rounds over the SAME warehouse compound the crash points. */
class CrashRecoverySpec extends SparkSpecBase {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("SIGKILL mid-commit: whole batches survive, a new writer resumes") {
    val wh = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val batch = 5000
    val rnd = new scala.util.Random(0xDEAD)
    var lastAcked = -1

    (1 to 3).foreach { round =>
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx3g", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.CrashWriter", wh, batch.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      // destroyForcibly closes the pipe and drops unread bytes, so acks
      // are drained CONTINUOUSLY on their own thread — lastAckedA tracks
      // every line flushed before the kill (modulo a scheduling sliver)
      val lastAckedA = new java.util.concurrent.atomic.AtomicInteger(lastAcked)
      val reader = new Thread(() => {
        try {
          val r = new java.io.BufferedReader(
            new java.io.InputStreamReader(proc.getInputStream))
          var line = r.readLine()
          while (line != null) {
            if (line.startsWith("COMMITTED "))
              lastAckedA.set(line.substring(10).trim.toInt)
            line = r.readLine()
          }
        } catch { case _: java.io.IOException => () }
      })
      reader.start()
      // wait for a few acknowledged commits past the recovery point
      val ackTarget = lastAcked + 2 + rnd.nextInt(2)
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (lastAckedA.get < ackTarget && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(lastAckedA.get >= ackTarget,
        s"round $round: writer reached only ${lastAckedA.get}/$ackTarget")
      // land the SIGKILL at a random point inside a commit cycle
      Thread.sleep(rnd.nextInt(400).toLong)
      proc.destroyForcibly()
      proc.waitFor()
      reader.join(5000)
      lastAcked = lastAckedA.get

      // remount and check the durability contract
      val st = new Store(spark, wh)
      val df = st.read("crash_t")
      val n = df.count()
      assert(n % batch == 0,
        s"round $round: $n rows is a PARTIAL batch — publish not atomic")
      val batches = (n / batch).toInt
      // one-sided hard invariant: every ACKNOWLEDGED commit must survive.
      // The upper side allows a small sliver (a publish can complete after
      // its ack was lost with the pipe); content checks below prove the
      // extras are whole, exact batches either way.
      assert(batches >= lastAcked + 1,
        s"round $round: only $batches whole batches survive but " +
          s"${lastAcked + 1} were acknowledged — lost a confirmed commit")
      assert(batches <= lastAcked + 3,
        s"round $round: $batches batches vs ${lastAcked + 1} acked — " +
          "ack pipeline broken")
      // every surviving batch complete and exact: per-batch row count and
      // the contiguous global key range
      val perBatch = df.groupBy("b").count()
        .filter(col("count") =!= batch).count()
      assert(perBatch == 0, s"round $round: incomplete batch content")
      val agg = df.agg(count("*"), min("k"), max("k")).head
      assert(agg.getLong(1) == 0L && agg.getLong(2) == n - 1,
        s"round $round: key range not contiguous after recovery")
      lastAcked = batches - 1 // the next writer resumes from here
    }

    // the warehouse stays fully writable through the spec's own session too
    val st = new Store(spark, wh)
    val before = st.read("crash_t").count()
    import spark.implicits._
    st.appendCompacting("crash_t",
      (0 until 10).map(k => (before + k, -1L)).toDF("k", "b"))
    assert(st.read("crash_t").count() == before + 10)
  }
}
