package graft

import org.apache.spark.sql.SparkSession

/** Follower-ingest probe: mounts a warehouse WITHOUT taking the writer
  * lease role and commits `batches` pure-insert batches to `crash_t`
  * through the inbox adoption protocol (spark.graft.followerInserts),
  * printing `FWD_COMMITTED <tag> <i>` after each acknowledged commit.
  * FollowerIngestSpec forks several of these against one live writer to
  * prove multi-process ingest: every acked batch must be present and
  * whole in the final state, and the lease must still name the writer.
  *
  * Usage: graft.FollowerWriter <warehouseDir> <tag> <batches> <rowsPerBatch>
  */
object FollowerWriter {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tag = args(1).toLong
    val batches = args(2).toInt
    val rows = args(3).toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-follower-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.followerInserts", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val store = new Store(spark, dir)
    var i = 0
    while (i < batches) {
      val df = (0 until rows)
        .map(j => (tag * 1000000L + i.toLong * 10000L + j, tag)).toDF("k", "b")
      store.appendCompacting("crash_t", df)
      println(s"FWD_COMMITTED $tag $i"); Console.flush()
      i += 1
    }
    println(s"FWD_DONE $tag"); Console.flush()
    spark.stop()
  }
}
