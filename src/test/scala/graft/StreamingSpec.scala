package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming path (SURVEY §2.D — beyond-parity: the reference is
  * batch-only). The windowed aggregation pipeline over the events stream
  * must converge to the same result as the batch query st_window_hourly.
  */
class StreamingSpec extends SparkSpecBase {

  /** Events as a file-stream source (ts surfaced as a proper timestamp). */
  private def eventStream = {
    val schema = spark.read
      .parquet(s"$sfDir/events.parquet").schema
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("events.parquet"))
    Tables.normalizeEventsTs(spark.readStream
      .schema(schema)
      .parquet(srcDir.toString))
  }

  private def runToTable(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming hourly window agg equals batch result") {
    val batchDf = Tables.df(spark, sfDir, "events")
    val stream = eventStream
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
      // batch tables surface ts as NTZ (stored-column shape); the stream
      // side is session-tz TimestampType — same micros under UTC
      .select(col("window.start").cast("timestamp").as("window_start"),
        col("event_type"), col("n"))
      .orderBy("window_start", "event_type")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionization equals the batch operator") {
    Tables.registerAll(spark, sfDir)
    val streamed = runToTable(
        Streams.sessionize(eventStream).toDF(), "sessions_stream")
      .orderBy("user_id", "session_id")
      .collect().toSeq
    val batch = SparkEntry.queries("st_sessionize")(spark, sfDir)
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("session_start").cast("timestamp").as("session_start"))
      .orderBy("user_id", "session_id")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming funnel equals the batch chained-min funnel") {
    val streamed = runToTable(Streams.funnel(eventStream).toDF(), "funnel_stream")
      .select("user_id", "t_signup", "t_click", "t_purchase", "stage")
      .orderBy("user_id").collect().toSeq
    val batch = run("ev_funnel")
      .select(col("user_id"), col("t_signup").cast("timestamp").as("t_signup"),
        col("t_click").cast("timestamp").as("t_click"),
        col("t_purchase").cast("timestamp").as("t_purchase"),
        col("stage").cast("int"))
      .orderBy("user_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("watermarked dedup drops duplicate event ids with bounded state") {
    // duplicate the stream source file => every event arrives twice
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream-dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("b.parquet"))
    val doubled = Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(srcDir.toString))
    val streamed = runToTable(Streams.dedup(doubled), "dedup_stream")
    val exact = Tables.df(spark, sfDir, "events").count()
    assert(streamed.count() == exact)
  }

  test("checkpointed restart resumes incrementally, no reprocessing") {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ckpt-src")
    val outDir = java.nio.file.Files.createTempDirectory("graft-ckpt-out")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir.toString)
        .select("event_id", "user_id")
        .writeStream
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckptDir.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    val total = Tables.df(spark, sfDir, "events").count()
    // batch 1: file A
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), srcDir.resolve("a.parquet"))
    runOnce()
    assert(spark.read.parquet(outDir.toString).count() == total)
    // restart with file A STILL PRESENT plus new file B: the checkpoint's
    // file log must skip A entirely and process only B
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), srcDir.resolve("b.parquet"))
    runOnce()
    assert(spark.read.parquet(outDir.toString).count() == 2 * total) // not 3x
  }

  test("stream-static join enriches events against the customer dim") {
    val customer = Tables.df(spark, sfDir, "customer")
    val streamed = runToTable(
      Streams.enrich(eventStream, customer), "enrich_stream")
    val batch = Streams.enrich(Tables.df(spark, sfDir, "events"), customer)
    assert(streamed.count() == batch.count())
    assert(streamed.count() > 0)
  }

  test("stream-stream interval join equals the batch interval join") {
    val views = eventStream.filter(col("event_type") === "view")
    val purchases = eventStream.filter(col("event_type") === "purchase")
    val streamed = runToTable(Streams.correlate(views, purchases), "corr_stream")
    val batchEvents = Tables.df(spark, sfDir, "events")
    val batch = Streams.correlate(
      batchEvents.filter(col("event_type") === "view"),
      batchEvents.filter(col("event_type") === "purchase"))
    assert(streamed.count() > 0)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("streaming matview refreshes incrementally per micro-batch") {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val srcDir = java.nio.file.Files.createTempDirectory("graft-smv-src")
    // two source files + maxFilesPerTrigger=1 -> two micro-batches, so the
    // second batch exercises the retract-and-readd of the compacted tail
    for (i <- 1 to 2) java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve(s"events-$i.parquet"))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
      .select("event_type", "user_id", "value")
    val wh = java.nio.file.Files.createTempDirectory("graft-smv-wh")
    val store = new Store(spark, wh.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-smv-ck").toString
    val q = Streams.streamingMatview(stream, store, "sm_events", "sm_agg",
      Seq("event_type"), Seq("user_id"), ckpt, avgCols = Seq("user_id"))
    q.awaitTermination(120000)
    // the view equals a from-scratch aggregate of everything ingested
    // (exact long sums — no float dust across the retraction cycles; the
    // avg column divides exact hidden sums, so it is exact too)
    val expect = store.read("sm_events").groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("user_id")).as("sum_user_id"),
        avg(col("user_id")).as("avg_user_id"))
    assert(store.read("sm_agg").orderBy("event_type").collect().toSeq ==
      expect.orderBy("event_type").collect().toSeq)
    // and it is fully reflected: another refresh reads zero files
    assert(store.incrementalRefresh("sm_agg")._1 == 0)
    // serving integration: a dashboard GROUP BY over the INGESTED table
    // answers from the stream-maintained view (the rollup rewrite fires —
    // continuous ingest keeps the view fresh, so the fact table is never
    // re-scanned for covered aggregates)
    val r0 = RollupRewrite.rewrites.get
    val served = PgDialect.execute(spark, store,
      """SELECT event_type, count(*) AS n, sum(user_id) AS su
         FROM sm_events GROUP BY event_type ORDER BY event_type""") match {
      case PgDialect.Rows(df, _) => df.collect().toSeq
      case other => fail(s"expected rows, got $other")
    }
    assert(RollupRewrite.rewrites.get == r0 + 1,
      "stream-maintained view must serve the rollup")
    assert(served.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ==
      expect.orderBy("event_type").collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
  }

  test("replayed matview micro-batch never double-appends, creates the view if missing") {
    import spark.implicits._
    val st = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-replay").toString)
    def batchDf(r: Range) = r.map(k => (s"g${k % 3}", k.toLong)).toDF("g", "x")
    val key = "mv:test-ckpt@run1"
    // batch 0 applies normally: table appended, view created
    Streams.applyMatviewBatch(st, "rt", "rv", Seq("g"), Seq("x"), Nil, key, 0L, batchDf(1 to 50))
    val n0 = st.read("rt").count()
    assert(n0 == 50 && st.exists("rv"))
    // crash-replay of batch 0 (marker present, view present): NO re-append
    Streams.applyMatviewBatch(st, "rt", "rv", Seq("g"), Seq("x"), Nil, key, 0L, batchDf(1 to 50))
    assert(st.read("rt").count() == 50)
    // crash landed between append-commit and view creation: simulate by
    // dropping the view, replaying batch 0 — the view must be (re)created
    // from the table, not skipped
    st.drop("rv")
    Streams.applyMatviewBatch(st, "rt", "rv", Seq("g"), Seq("x"), Nil, key, 0L, batchDf(1 to 50))
    assert(st.exists("rv"))
    assert(st.read("rt").count() == 50, "replay with missing view must not re-append")
    assert(st.read("rv").agg(sum($"sum_x")).head.getLong(0) ==
      (1 to 50).map(_.toLong).sum)
    // batch 1 applies on top
    Streams.applyMatviewBatch(st, "rt", "rv", Seq("g"), Seq("x"), Nil, key, 1L, batchDf(51 to 60))
    assert(st.read("rt").count() == 60)
    assert(st.read("rv").agg(sum($"sum_x")).head.getLong(0) ==
      (1 to 60).map(_.toLong).sum)
    // a failed append rolls the marker back to the previous batch id, so a
    // retry of batch 2 is not silently skipped
    intercept[Exception] {
      Streams.applyMatviewBatch(st, "rt", "rv", Seq("g"), Seq("x"), Nil, key, 2L,
        batchDf(61 to 70).withColumn("x", expr("assert_true(x < 65, 'boom')")))
    }
    assert(st.lastStreamBatch(key).contains(1L), "marker must roll back on failed append")
    Streams.applyMatviewBatch(st, "rt", "rv", Seq("g"), Seq("x"), Nil, key, 2L, batchDf(61 to 70))
    assert(st.read("rt").count() == 70)
  }

  test("change-feed follower replicates a table through net deltas") {
    val wh = java.nio.file.Files.createTempDirectory("graft-cfrep").toString
    val st = new Store(spark, wh)
    st.replace("cf_src", spark.range(100)
      .select(col("id"), (col("id") % 10).as("v")))
    Streams.initMirror(st, "cf_src", "cf_mir", "id")
    val seeded = st.currentVersion("cf_src")
    // caught up: nothing to apply
    assert(Streams.applyChanges(st, "cf_src", "cf_mir", "id") == 0L)
    // mutate the source: update 5 rows, insert 10 new, delete 7 keys
    st.upsert("cf_src", spark.range(95, 110)
      .select(col("id"), lit(99L).as("v")), "id")
    st.deleteByKey("cf_src", spark.range(0, 7).toDF("id"), "id")
    def mirrored(): Boolean = {
      val s = st.read("cf_src"); val m = st.read("cf_mir")
      s.except(m).isEmpty && m.except(s).isEmpty
    }
    assert(!mirrored())
    assert(Streams.applyChanges(st, "cf_src", "cf_mir", "id") > 0L)
    assert(mirrored())
    assert(Streams.applyChanges(st, "cf_src", "cf_mir", "id") == 0L)
    // idempotent replay: rewinding the watermark re-applies the SAME net
    // delta and converges to the identical mirror (the crash-window story)
    st.commitStreamBatch("cf:cf_src->cf_mir", seeded.toLong)
    assert(Streams.applyChanges(st, "cf_src", "cf_mir", "id") > 0L)
    assert(mirrored())
    // watermark survives a fresh mount of the warehouse
    val st2 = new Store(spark, wh)
    assert(st2.lastStreamBatch("cf:cf_src->cf_mir")
      .contains(st2.currentVersion("cf_src").toLong))
    // always-on wrapper: the ticker-driven follower converges on its own
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cfckpt").toString
    val q = Streams.changeFeedStream(spark, st, "cf_src", "cf_mir", "id",
      ckpt, intervalMs = 200)
    try {
      st.upsert("cf_src", spark.range(200, 220)
        .select(col("id"), lit(7L).as("v")), "id")
      val deadline = System.currentTimeMillis + 30000
      while (!mirrored() && System.currentTimeMillis < deadline)
        Thread.sleep(250)
      assert(mirrored(), "follower did not converge within 30s")
    } finally q.stop()
    st.drop("cf_src"); st.drop("cf_mir")
  }

  test("CDC apply stream folds keyed changes into the store") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val st = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-cdc").toString)
    st.replace("t", (1L to 20L).map(k => (k, "old")).toDF("k", "v"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long, String)] // op, seq, k, v
    val changes = mem.toDF.toDF("op", "seq", "k", "v")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ck").toString
    mem.addData(("upsert", 1L, 1L, "a"), ("delete", 2L, 2L, null),
      ("upsert", 3L, 21L, "b"))
    Streams.cdcApply(changes, st, "t", "k", ckpt).awaitTermination(120000)
    assert(st.read("t").count() == 20) // +1 insert, -1 delete
    // within-batch conflict on k=3: the later (higher-seq) upsert wins over
    // the delete after batch compaction; k=2 comes back
    mem.addData(("upsert", 4L, 2L, "back"), ("delete", 5L, 3L, null),
      ("upsert", 6L, 3L, "win"))
    Streams.cdcApply(changes, st, "t", "k", ckpt).awaitTermination(120000)
    val out = st.read("t").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 21)
    assert(out(1L) == "a" && out(2L) == "back" && out(3L) == "win"
      && out(21L) == "b" && out(4L) == "old")
  }

  test("streaming ingest maintains the dedup index per micro-batch") {
    import spark.implicits._
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-sdd").toString)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // batch 0 seeds the table + index registration through the batch path
    store.replace("sdd_docs", Seq((1L, base)).toDF("doc_id", "text"))
    store.enableDedupIndex("sdd_docs", "doc_id", "text", 0.5)
    // two source files + maxFilesPerTrigger=1 -> two micro-batches, each
    // committing through appendCompacting, whose post-commit hook must
    // probe the batch against the standing index
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sdd-src")
    Seq((2L, base + " lambda")).toDF("doc_id", "text")
      .write.parquet(srcDir.resolve("b1").toString)
    Seq((3L, base + " mu"), (4L, "one two three four five six seven"))
      .toDF("doc_id", "text")
      .write.parquet(srcDir.resolve("b2").toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdd-ck").toString
    val q = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        store.appendCompacting("sdd_docs", batch); ()
      }
      .start()
    q.awaitTermination(120000)
    val pairs = store.read(store.dedupPairsTable("sdd_docs"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs.toString)
    // the index tracked every streamed doc; the unrelated doc pairs with
    // nothing
    val ids = store.read(store.dedupIdxTable("sdd_docs"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 4L), ids.toString)
  }
}
