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

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
