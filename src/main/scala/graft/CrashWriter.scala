package graft

import org.apache.spark.sql.SparkSession

/** Crash-durability probe: appends fixed-size batches to one store table
  * in a loop, printing `COMMITTED <batchId>` after each publish returns.
  * CrashRecoverySpec forks this JVM, SIGKILLs it at a random point in a
  * commit cycle, remounts the warehouse and checks atomicity — the
  * surviving state must be a whole number of batches, each complete, with
  * the batch count at or one past the last acknowledged line (a commit
  * can complete after its ack line is lost with the process).
  *
  * Batch ids self-derive from the CURRENT table state, so relaunching
  * over a crashed warehouse IS the recovery path: the first append after
  * a crash must clear any orphaned version dir the dead writer left
  * (Store.freshVersionDir) instead of merging its ghost files.
  *
  * Usage: graft.CrashWriter <warehouseDir> <rowsPerBatch> [maxBatches]
  */
object CrashWriter {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batch = args(1).toInt
    val maxBatches = if (args.length > 2) args(2).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-crash-writer")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val store = new Store(spark, dir)
    var i =
      if (store.exists("crash_t")) (store.read("crash_t").count() / batch).toInt
      else { store.replace("crash_t", Seq.empty[(Long, Long)].toDF("k", "b")); 0 }
    println(s"READY $i"); Console.flush()
    while (i < maxBatches) {
      val rows = ((i.toLong * batch) until ((i + 1).toLong * batch))
        .map(k => (k, i.toLong)).toDF("k", "b")
      store.appendCompacting("crash_t", rows)
      println(s"COMMITTED $i"); Console.flush()
      i += 1
    }
  }
}
