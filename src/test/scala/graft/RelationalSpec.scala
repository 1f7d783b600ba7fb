package graft

import org.apache.spark.sql.functions._

/** Cross-operator consistency invariants (cheap complements to the DuckDB
  * oracle gate, which covers value-level correctness). */
class RelationalSpec extends SparkSpecBase {

  test("semi + anti partition the customer set") {
    val total = Tables.df(spark, sfDir, "customer").count()
    val withOrders = Tables.df(spark, sfDir, "customer")
      .join(Tables.df(spark, sfDir, "orders"),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    val without = run("op_join_anti").count()
    assert(withOrders + without == total)
  }

  test("distinct_on returns one row per customer with orders") {
    val df = run("op_distinct_on")
    val customers = df.select("o_custkey").distinct().count()
    assert(df.count() == customers)
  }

  test("rollup total row equals table count") {
    val li = Tables.df(spark, sfDir, "lineitem").count()
    val totalRow = run("op_rollup")
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .select("n").collect()
    assert(totalRow.length == 1 && totalRow(0).getLong(0) == li)
  }

  test("recursive cte produces 1..50") {
    val ns = run("op_cte_recursive").collect().map(_.getInt(0)).toSeq
    assert(ns == (1 to 50))
  }

  test("window running sum final value equals group sum") {
    val w = run("op_window_running_sum")
    val last = w.groupBy("o_custkey").agg(max("running_total").as("rt"))
    val direct = Tables.df(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(round(sum(col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double").as("expected"))
    val joined = last.join(direct, "o_custkey")
      .filter(abs(col("rt") - col("expected")) > 1e-6)
    assert(joined.count() == 0)
  }

  test("window ROWS frame contents: mov_sum over 3 PRECEDING recomputed by self-join") {
    // Independent recomputation of op_window_frames' moving sum: for each row,
    // sum the cents of the ≤4 rows of the same event_type whose row_number is
    // within [rn-3, rn]. Pins the frame semantics against engine drift.
    val e = Tables.df(spark, sfDir, "events").filter(col("event_id") < 3000)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("event_id")))
    val expected = e.as("a").join(e.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("b.rn").between(col("a.rn") - 3, col("a.rn")))
      .groupBy(col("a.event_id").as("event_id"))
      .agg(sum(col("b.c")).as("exp_sum"))
    val got = run("op_window_frames").select("event_id", "mov_sum_cents")
    val bad = got.join(expected, "event_id")
      .filter(col("mov_sum_cents") =!= col("exp_sum"))
    assert(bad.count() == 0)
  }

  test("window RANGE frame contents: band membership recomputed by self-join") {
    // op_window_range_frame: n_in_band must equal the count of same-type rows
    // whose cents lie in [cents-200, cents] (value-distance peers, not rows).
    val e = Tables.df(spark, sfDir, "events").filter(col("event_id") < 1500)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
    val expected = e.as("a").join(e.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("b.c").between(col("a.c") - 200, col("a.c")))
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(lit(1)).as("exp_n"), sum(col("b.c")).as("exp_cents"))
    val got = run("op_window_range_frame")
    val bad = got.join(expected, "event_id")
      .filter(col("n_in_band") =!= col("exp_n") ||
        col("band_cents") =!= col("exp_cents"))
    assert(bad.count() == 0)
  }

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("temporal normalization converges every writer encoding on ntz") {
    import spark.implicits._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val micros = 820454400000000L // 1996-01-01T00:00:00Z
    val expect = java.time.LocalDateTime.of(1996, 1, 1, 0, 0)
    def ntzOf(df: org.apache.spark.sql.DataFrame): java.time.LocalDateTime = {
      val out = Tables.normalizeTemporal(df, Seq("d"))
      assert(out.schema("d").dataType == TimestampNTZType)
      out.select(col("d")).head.getAs[java.time.LocalDateTime](0)
    }
    assert(ntzOf(Seq(micros * 1000).toDF("d")) == expect, "long nanos")
    assert(ntzOf(Seq(micros).toDF("d")) == expect, "long micros")
    assert(ntzOf(Seq(micros / 1000).toDF("d")) == expect, "long millis")
    assert(ntzOf(Seq(micros / 1000000).toDF("d")) == expect, "long seconds")
    assert(ntzOf(Seq("1996-01-01 00:00:00").toDF("d")) == expect, "iso string")
    assert(ntzOf(Seq(expect).toDF("d")) == expect, "ntz passthrough")
    assert(ntzOf(Seq(java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(micros / 1000000))).toDF("d")) == expect,
      "tz-tagged timestamp")
    // DateType passes through untouched; absent columns are a no-op
    val dated = Seq(java.sql.Date.valueOf("1996-01-01")).toDF("d")
    assert(Tables.normalizeTemporal(dated, Seq("d")).schema("d").dataType ==
      org.apache.spark.sql.types.DateType)
    assert(Tables.normalizeTemporal(dated, Seq("absent")).columns.sameElements(Array("d")))
    // the streaming variant converges on session-tz TimestampType instead
    // (typed Dataset encoders take java.sql.Timestamp)
    val fromNtz = Tables.normalizeEventsTs(Seq(expect).toDF("ts"))
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.head.getTimestamp(0).toInstant.getEpochSecond == micros / 1000000)
    val fromNanos = Tables.normalizeEventsTs(Seq(micros * 1000).toDF("ts"))
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.head.getTimestamp(0).toInstant.getEpochSecond == micros / 1000000)
  }
}
