package graft

import graft.PgDialect._

/** ANALYZE → TableStats → pg_stats → broadcast size gate: the statistics
  * pipeline the size-gated hint planner consumes. */
class StatsSpec extends SparkSpecBase {

  private lazy val store: Store =
    new Store(spark, java.nio.file.Files.createTempDirectory("graft-stats").toString)

  private def exec(sql: String): PgResult = PgDialect.execute(spark, store, sql)

  test("ANALYZE computes real per-column statistics into pg_stats") {
    import spark.implicits._
    Tables.registerAll(spark, sfDir)
    store.replace("an_t",
      Seq((1L, Option("a")), (2L, Option.empty[String]),
        (3L, Option("bb")), (4L, Option("a"))).toDF("k", "v"))
    assert(exec("ANALYZE an_t") == Command("ANALYZE"))
    val rows = spark.sql(
      """SELECT attname, null_frac, n_distinct, min_val, max_val, avg_width
        |FROM pg_stats WHERE tablename = 'an_t' ORDER BY attname""".stripMargin)
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("k", "v"))
    val k = rows(0); val v = rows(1)
    assert(k.getDouble(1) == 0.0 && v.getDouble(1) == 0.25, "null_frac")
    assert(k.getLong(2) == 4L && v.getLong(2) == 2L, "n_distinct (exact at this size)")
    assert(k.getString(3) == "1" && k.getString(4) == "4", "key min/max")
    assert(v.getString(3) == "a" && v.getString(4) == "bb", "string min/max")
    assert(k.getDouble(5) == 8.0, "fixed-width column reports its type width")
    // mean of octet lengths over the 3 non-null strings: (1 + 2 + 1) / 3
    assert(math.abs(v.getDouble(5) - 4.0 / 3) < 1e-12, "string mean width")
  }

  test("ANALYZE t(col) restricts to the named columns; unknown relation raises") {
    import spark.implicits._
    store.replace("an_cols", Seq((1L, "x"), (2L, "y")).toDF("a", "b"))
    assert(exec("ANALYZE an_cols (b)") == Command("ANALYZE"))
    val attrs = TableStats.get("an_cols").get.cols.map(_.column)
    assert(attrs == Seq("b"), s"only the named column analyzes: $attrs")
    assert(intercept[UnsupportedQuery](exec("ANALYZE no_such_rel"))
      .getMessage.contains("does not exist"))
  }

  test("bare ANALYZE covers the store's tables") {
    import spark.implicits._
    store.replace("an_all1", Seq((1L, "p")).toDF("k", "s"))
    store.replace("an_all2", Seq((2L, "q")).toDF("k", "s"))
    assert(exec("ANALYZE") == Command("ANALYZE"))
    assert(TableStats.get("an_all1").isDefined && TableStats.get("an_all2").isDefined)
    assert(TableStats.get("an_all1").get.rows == 1L)
  }

  test("analyzed stats drive the broadcast size gate, on-disk bytes otherwise") {
    // no stats: the sf0.001 parquet is tiny -> gate approves the hint
    TableStats.drop("part", ns = sfDir)
    assert(Tables.broadcastSized(spark, sfDir, "part"),
      "tiny measured input must keep the broadcast hint")
    // analyzed-huge: stats take precedence over the file size and close
    // the gate — the 100x-scale-up protection the hint planner relies on.
    // Stats register under the DIR namespace the gate resolves.
    TableStats.put("part", TableStats.Stats(1L << 33,
      Seq(TableStats.ColStats("p_partkey", 0.0, 1L << 33, None, None, 64.0))),
      ns = sfDir)
    try {
      assert(!Tables.broadcastSized(spark, sfDir, "part"),
        "a table ANALYZE measured as multi-GB must not be hint-broadcast")
    } finally TableStats.drop("part", ns = sfDir)
    // conf override: a 1-byte ceiling closes the gate for any real input
    spark.conf.set("spark.graft.broadcastGateBytes", "1")
    try assert(!Tables.broadcastSized(spark, sfDir, "part"))
    finally spark.conf.unset("spark.graft.broadcastGateBytes")
  }

  test("same-named store stats cannot cross-contaminate the dir's broadcast gate") {
    import spark.implicits._
    // an ANALYZE of a STORE table that merely shares the name "part"
    // registers under the store namespace — the gate for the testdata dir
    // must keep reading ITS relation's measured size (tiny -> hint stays)
    store.replace("part", Seq((1L, "huge-elsewhere")).toDF("p", "x"))
    try {
      exec("ANALYZE part")
      assert(TableStats.get("part").isDefined, "store ns holds the analyzed stats")
      assert(TableStats.get("part", ns = sfDir).isEmpty,
        "dir ns untouched by the store table's ANALYZE")
      // even with absurd store-side stats the dir gate stays open
      TableStats.put("part", TableStats.Stats(1L << 33,
        Seq(TableStats.ColStats("p", 0.0, 1L << 33, None, None, 64.0))))
      assert(Tables.broadcastSized(spark, sfDir, "part"),
        "a same-named store relation's size must not close the dir's gate")
    } finally {
      TableStats.drop("part")
      store.drop("part")
      Tables.restoreView(spark, "part")
    }
  }

  test("write path auto-feeds size stats: fresh tables have rows/bytes sans ANALYZE") {
    import spark.implicits._
    TableStats.drop("an_auto")
    store.replace("an_auto", (1L to 500L).map(i => (i, s"row$i")).toDF("k", "v"))
    val s0 = TableStats.get("an_auto")
    assert(s0.isDefined, "replace must publish size stats at commit")
    assert(s0.get.rows == 500L, s"exact footer row count: ${s0.get.rows}")
    assert(s0.get.bytesEstimate > 0, "measured bytes feed the gate")
    // every later commit refreshes — append, delete
    store.append("an_auto", Seq((501L, "more")).toDF("k", "v"))
    assert(TableStats.get("an_auto").get.rows == 501L, "append refreshes rows")
    exec("DELETE FROM an_auto WHERE k > 400")
    assert(TableStats.get("an_auto").get.rows == 400L, "DML refreshes rows")
    // ANALYZE upgrades to column stats without losing freshness
    exec("ANALYZE an_auto")
    val s1 = TableStats.get("an_auto").get
    assert(s1.rows == 400L && s1.cols.nonEmpty)
    store.drop("an_auto")
    assert(TableStats.get("an_auto").isEmpty, "stats die with the relation")
  }

  test("stats registry survives into the catalog view across refreshes") {
    import spark.implicits._
    store.replace("an_keep", Seq((7L, "z")).toDF("k", "s"))
    exec("ANALYZE an_keep")
    // a dynamic catalog refresh (DDL trigger path) must not lose pg_stats
    PgCatalog.refreshDynamic(spark, store)
    PgCatalog.refreshStats(spark)
    val n = spark.sql(
      "SELECT count(*) AS n FROM pg_stats WHERE tablename = 'an_keep'")
      .collect()(0).getLong(0)
    assert(n == 2L)
  }
}
