package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming path (SURVEY §2.D — beyond-parity: the reference is
  * batch-only). The windowed aggregation pipeline over the events stream
  * must converge to the same result as the batch query st_window_hourly.
  */
class StreamingSpec extends SparkSpecBase {

  test("streaming hourly window agg equals batch result") {
    val batchDf = Tables.df(spark, sfDir, "events")
    val schema = spark.read
      .parquet(s"$sfDir/events.parquet").schema // ts as long nanos

    // the file-stream source wants a directory of files
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("events.parquet"))

    val stream = spark.readStream
      .schema(schema)
      .parquet(srcDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_stream")
      .orderBy("window_start", "event_type")
      .collect().toSeq
    val batch = batchDf
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
