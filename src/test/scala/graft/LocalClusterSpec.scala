package graft

/** CI gate for [[LocalClusterSmoke]]: forks a JVM that runs the focused
  * engine suite on `local-cluster[2,2,1024]` — real Master/Worker, real
  * forked executor JVMs — because `local[n]` shares driver and executor in
  * one JVM and structurally cannot catch closure-serialization, broadcast
  * shipping or task-side classloading bugs. Requires a Spark distribution
  * (SPARK_HOME or /opt/spark) so the Worker can launch executors; cancels
  * cleanly where none exists. */
class LocalClusterSpec extends SparkSpecBase {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("engine smoke passes on local-cluster (forked executor JVMs)") {
    val sparkHome = sys.env.get("SPARK_HOME")
      .orElse(Option("/opt/spark").filter(p => new java.io.File(p, "jars").isDirectory))
    assume(sparkHome.isDefined, "no Spark distribution for local-cluster workers")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.LocalClusterSmoke", sfDir)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", sparkHome.get)
    // executor launch resolves the scala version from build dirs that a
    // binary distribution lacks; the env override is how the shell
    // launchers pin it
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val outBuf = new StringBuilder
    val reader = new Thread(() => {
      try {
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        var line = r.readLine()
        while (line != null) {
          outBuf.synchronized { outBuf.append(line).append('\n') }
          line = r.readLine()
        }
      } catch { case _: java.io.IOException => () }
    })
    reader.start()
    val finished = proc.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) proc.destroyForcibly()
    reader.join(5000)
    val out = outBuf.synchronized(outBuf.toString)
    val tail = out.linesIterator.toSeq.takeRight(60).mkString("\n")
    assert(finished, s"local-cluster smoke timed out; tail:\n$tail")
    assert(proc.exitValue() == 0, s"smoke exit ${proc.exitValue()}; tail:\n$tail")
    Seq("fork-isolation", "tpch-q01", "tpch-q05-broadcast", "staged-txn",
      "dedup-probe", "copy-out", "copy-in", "ALL").foreach { stage =>
      assert(out.contains(s"SMOKE $stage OK"), s"missing stage $stage; tail:\n$tail")
    }
  }
}
