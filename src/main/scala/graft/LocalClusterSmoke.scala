package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-JVM execution smoke: the same engine paths the test suite runs on
  * `local[n]` (driver and executors share one JVM there, hiding closure
  * serialization, broadcast shipping, task-side classloading and
  * executor-side state bugs), executed on `local-cluster[2,2,1024]` —
  * REAL forked executor JVMs behind a real Master/Worker pair.
  *
  * Forked by LocalClusterSpec (needs SPARK_HOME so the Worker can launch
  * executor processes). Covers the executor-heavy surfaces:
  *   - a TPC-H aggregate (Sum128: custom DeclarativeAggregate codegen
  *     compiled ON the executors);
  *   - a staged transaction commit (staging dirs + merge machinery driven
  *     through executor-written files);
  *   - an incremental dedup-index probe (custom shingle/minhash Catalyst
  *     expressions resolved task-side);
  *   - wire COPY out + COPY in (ChunkPump executor-side framing, CopyParse
  *     executor-side decode) through a real socket.
  *
  * Prints `SMOKE <name> OK` per stage; any throw fails the fork loudly.
  */
object LocalClusterSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-local-cluster-smoke")
      // the forked executor JVMs must see graft classes (expressions,
      // mapPartitions closures) — ship this JVM's classpath, ABSOLUTE
      // (executors run from a worker-owned cwd, so relative entries like
      // target/scala-2.13/classes would silently not resolve)
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path").split(java.io.File.pathSeparator)
          .map(p => new java.io.File(p).getAbsolutePath)
          .mkString(java.io.File.pathSeparator))
      .config("spark.executor.memory", "1024m")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    PgFunctions.register(spark) // sum128 + the engine expression extensions
    import spark.implicits._
    try {
      // executors really are separate JVMs: no task may share this pid
      val driverPid = ProcessHandle.current.pid
      val taskPids = spark.sparkContext.parallelize(1 to 8, 8)
        .map(_ => ProcessHandle.current.pid).collect().toSet
      require(!taskPids.contains(driverPid) && taskPids.nonEmpty,
        s"executors must be forked JVMs: driver=$driverPid tasks=$taskPids")
      println("SMOKE fork-isolation OK")

      // 1. TPC-H q01: whole-stage codegen + Sum128 on executor JVMs
      val q01 = TpchQueries.defs.find(_.name == "q01_pricing_summary").get
      val rows = q01.run(spark, sfDir).collect()
      require(rows.length >= 4, s"q01 groups: ${rows.length}")
      println("SMOKE tpch-q01 OK")

      // 1b. TPC-H q05: multi-join with size-gated BROADCAST hints —
      // broadcast variables actually ship over the wire to executor JVMs
      // here, which local[n] never exercises
      val q05 = TpchQueries.defs.find(_.name == "q05_local_supplier_volume").get
      require(q05.run(spark, sfDir).collect().nonEmpty, "q05 empty")
      println("SMOKE tpch-q05-broadcast OK")

      // 2. staged txn commit + concurrent insert merge through the store
      val wh = java.nio.file.Files.createTempDirectory("graft-lc").toString
      val store = new Store(spark, wh)
      store.replace("lc_t",
        (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v"))
      val t1 = new PgDialect.PgTxn; val t2 = new PgDialect.PgTxn
      def e1(sql: String) = PgDialect.execute(spark, store, sql, t1)
      def e2(sql: String) = PgDialect.execute(spark, store, sql, t2)
      e1("BEGIN"); e2("BEGIN")
      e1("INSERT INTO lc_t SELECT k + 100, v FROM lc_t")
      e2("INSERT INTO lc_t SELECT k + 200, v FROM lc_t")
      e1("COMMIT"); e2("COMMIT") // second lands on a moved base: merge
      require(store.read("lc_t").count() == 300,
        s"merge commit lost rows: ${store.read("lc_t").count()}")
      println("SMOKE staged-txn OK")

      // 3. incremental dedup-index probe (minhash expressions task-side)
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      store.replace("lc_docs", Seq(
        (1L, base), (2L, base + " lambda")).toDF("doc_id", "text"))
      store.enableDedupIndex("lc_docs", "doc_id", "text", 0.5)
      store.appendCompacting("lc_docs",
        Seq((3L, base + " mu")).toDF("doc_id", "text"))
      val pairs = store.dedupPairs("lc_docs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      require(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"pairs: $pairs")
      println("SMOKE dedup-probe OK")

      // 4. wire COPY out + COPY in over a real socket (executor-side
      // encode/decode pumps)
      Tables.registerAll(spark, sfDir)
      val server = new PgWireServer(spark, store, 0)
      val port = server.start()
      val sock = new java.net.Socket("127.0.0.1", port)
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val params = "user\u0000graft\u0000database\u0000graft\u0000\u0000"
        .getBytes("UTF-8")
      out.writeInt(8 + params.length); out.writeInt(196608)
      out.write(params); out.flush()
      def drainUntilReady(): Seq[(Char, Array[Byte])] = {
        val buf = scala.collection.mutable.ArrayBuffer[(Char, Array[Byte])]()
        var done = false
        while (!done) {
          val t = in.read().toChar; val n = in.readInt()
          val b = new Array[Byte](n - 4); in.readFully(b)
          buf += ((t, b))
          if (t == 'Z') done = true
        }
        buf.toSeq
      }
      drainUntilReady()
      def query(sql: String): Seq[(Char, Array[Byte])] = {
        val qb = (sql + "\u0000").getBytes("UTF-8")
        out.writeByte('Q'); out.writeInt(4 + qb.length); out.write(qb); out.flush()
        drainUntilReady()
      }
      val copyOut = query("COPY (SELECT k, v FROM lc_t ORDER BY k) TO STDOUT")
      val outRows = copyOut.count(_._1 == 'd')
      require(outRows == 300, s"COPY out rows: $outRows")
      println("SMOKE copy-out OK")
      // COPY IN: create a fresh table, feed rows back through CopyParse
      query("CREATE TABLE lc_in (k BIGINT, v TEXT)")
      val qb = ("COPY lc_in FROM STDIN\u0000").getBytes("UTF-8")
      out.writeByte('Q'); out.writeInt(4 + qb.length); out.write(qb); out.flush()
      val g = in.read().toChar // CopyInResponse
      require(g == 'G', s"expected CopyInResponse, got $g")
      val gn = in.readInt(); in.readFully(new Array[Byte](gn - 4))
      val payload = (1 to 5000).map(i => s"$i\tval$i\n").mkString.getBytes("UTF-8")
      out.writeByte('d'); out.writeInt(4 + payload.length); out.write(payload)
      out.writeByte('c'); out.writeInt(4); out.flush()
      val tail = drainUntilReady()
      require(tail.exists { case (t, b) =>
        t == 'C' && new String(b, "UTF-8").startsWith("COPY 5000") },
        s"COPY in tag missing: ${tail.map(_._1)}")
      require(store.read("lc_in").count() == 5000)
      println("SMOKE copy-in OK")
      sock.close()
      println("SMOKE ALL OK")
    } finally spark.stop()
  }
}
