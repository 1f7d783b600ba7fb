package graft

import org.apache.spark.sql.SparkSession

/** One-shot writer probe for multi-process lease races: attempts a single
  * small append against the given warehouse and reports the outcome on
  * stdout — `PROBE_COMMITTED <n>` (n = rows now in the table) or
  * `PROBE_REFUSED <message>`. LeaseSpec forks several of these
  * concurrently against one warehouse whose lease is stale; the
  * exclusive-create epoch claim must elect EXACTLY one winner, and every
  * loser must refuse cleanly (no partial writes, no torn catalog).
  *
  * After reporting, the process HOLDS for `holdMs` (arg 2, default 0) so
  * the spec's other contenders race a LIVE holder — exiting immediately
  * would legitimately surrender the lease (dead-pid steal) and let a late
  * prober commit too.
  *
  * With mode `stop-hold` (arg 3) the probe STOPS its SparkContext before
  * the hold: the JVM stays alive (pid probe says live) but the process
  * can no longer run a Spark job — the lease heartbeat must notice and
  * hand the lease off gracefully, which FollowerIngestSpec pins.
  *
  * Usage: graft.LeaseProbe <warehouseDir> [holdMs] [stop-hold]
  */
object LeaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val holdMs = if (args.length > 1) args(1).toLong else 0L
    val stopHold = args.length > 2 && args(2) == "stop-hold"
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-lease-probe")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val store = new Store(spark, dir)
    try {
      store.appendCompacting("probe_t",
        Seq((ProcessHandle.current.pid, 1L)).toDF("k", "b"))
      println(s"PROBE_COMMITTED ${store.read("probe_t").count()}")
    } catch {
      case e: Exception =>
        println(s"PROBE_REFUSED ${Option(e.getMessage).getOrElse(e.getClass.getName).replace('\n', ' ')}")
    }
    Console.flush()
    if (stopHold) {
      spark.stop()
      println("PROBE_STOPPED"); Console.flush()
      if (holdMs > 0) Thread.sleep(holdMs)
    } else {
      if (holdMs > 0) Thread.sleep(holdMs)
      spark.stop()
    }
  }
}
