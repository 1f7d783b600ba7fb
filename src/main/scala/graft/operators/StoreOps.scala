package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path semantics (SURVEY §2.E) as pure, oracle-checkable
  * transformations: each query computes the post-write table state the
  * Store produces for the same inputs (the stateful Store itself — atomic
  * replace, version dirs, matview catalog — is exercised by StoreSpec).
  */
object StoreOps {
  import Qdsl._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  val defs: Seq[Q] = Seq(

    // upsert-by-unique-key: incoming rows win over existing rows
    // (iceberg_table_writer.go:304-378)
    Q("st_upsert_by_key", Some("""
      WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
                    WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      incoming AS (SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
                          'U' AS o_orderstatus
                   FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM incoming
      UNION ALL
      SELECT b.o_orderkey, b.o_totalprice, b.o_orderstatus FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.o_orderkey = b.o_orderkey)
      ORDER BY o_orderkey""")) { (s, dir) =>
      val base = t(s, dir, "orders")
        .filter(col("o_orderdate") < ts("1999-01-01"))
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val incoming = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1998-01-01"))
        .select(col("o_orderkey"), (col("o_totalprice") + 1000.0).as("o_totalprice"),
          lit("U").as("o_orderstatus"))
      base.join(incoming.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
        .unionByName(incoming)
        .orderBy("o_orderkey")
    },

    // delete-by-unique-key (iceberg_table_writer.go:380-452)
    Q("st_delete_by_key", Some("""
      SELECT o_orderkey, o_orderstatus FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P')
      ORDER BY o_orderkey""")) { (s, dir) =>
      val base = t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      val doomed = base.filter(col("o_orderstatus") === "P").select("o_orderkey")
      base.join(doomed, Seq("o_orderkey"), "left_anti")
        .orderBy("o_orderkey")
    },

    // cursor-based incremental append with overlap trim: existing = events
    // in the first half-year; incoming batch overlaps the cursor hour;
    // appended = incoming at/after max(cursor) whose key is not present
    // (iceberg_table.go:93-117)
    Q("st_cursor_append", Some("""
      WITH existing AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
                        WHERE event_id % 3 <> 0),
      cur AS (SELECT max(ts) AS c FROM existing),
      incoming AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      appended AS (
        SELECT i.event_id, i.ts FROM incoming i, cur
        WHERE i.ts >= cur.c
          AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.event_id = i.event_id))
      SELECT event_id, ts FROM existing
      UNION ALL
      SELECT event_id, ts FROM appended
      ORDER BY event_id""")) { (s, dir) =>
      val all = t(s, dir, "events").select("event_id", "ts")
      val existing = all.filter(col("event_id") % 3 =!= 0)
      val cur = existing.agg(max("ts").as("c"))
      val appended = all.join(broadcast(cur), col("ts") >= col("c"))
        .select("event_id", "ts")
        .join(existing.select("event_id"), Seq("event_id"), "left_anti")
      existing.unionByName(appended).orderBy("event_id")
    },

    // full-refresh / matview definition result (query_remapper.go:146-152):
    // the content an MV over "revenue per nation" holds after REFRESH
    Q("st_matview_content", Some(s"""
      SELECT n_name, $sumDiscO AS revenue
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""")) { (s, dir) =>
      // supplier grows with SF: size-gated hint (nation is fixed 25 rows —
      // its unconditional broadcast is safe at any scale)
      t(s, dir, "lineitem")
        .join(Tables.bdim(s, dir, "supplier")(), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(msum(discProd, 1e4).as("revenue"))
        .orderBy("n_name")
    },

    // gap-based sessionization (30-min inactivity): lag -> new-session flag
    // -> running sum as session id. The per-user window partitioning is the
    // scale story: state never leaves a user's partition.
    Q("st_sessionize", Some("""
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      flagged AS (
        SELECT user_id, event_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, event_id, ts,
          CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, count(*) AS n_events, min(ts) AS session_start
      FROM sessions GROUP BY user_id, session_id
      ORDER BY user_id, session_id""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val flagged = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("new_sess",
          when(lag(col("ts"), 1).over(w).isNull
            || unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)) > 1800, 1)
            .otherwise(0))
      flagged
        .withColumn("session_id",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
        .orderBy("user_id", "session_id")
    },

    // hourly tumbling-window aggregation over the event stream's batch view
    // (the Structured Streaming pipeline in StreamingSpec computes the same
    // result incrementally with a watermark)
    Q("st_window_hourly", Some("""
      SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        event_type, count(*) AS n,
        round(CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 1e2, 2) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type""")) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(cents(col("value"))).cast("double") / 1e2, 2).as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"),
          col("total_value"))
        .orderBy("window_start", "event_type")
    },

    // snapshot (time-travel) read through a REAL Store in a temp warehouse:
    // publish v1, upsert on top of it (v2), then read the v1 snapshot —
    // which must still equal the original load even though the live table
    // changed. The oracle is just the v1 content.
    Q("st_time_travel", Some("""
      SELECT o_orderkey, o_orderstatus FROM orders
      WHERE o_orderkey <= 1000 ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-tt").toString
      val store = new Store(s, wh)
      val v1 = t(s, dir, "orders")
        .filter(col("o_orderkey") <= 1000)
        .select("o_orderkey", "o_orderstatus")
      store.replace("tt_orders", v1)
      val snap = store.currentVersion("tt_orders")
      store.upsert("tt_orders",
        v1.limit(10).withColumn("o_orderstatus", lit("X")), "o_orderkey")
      store.readVersion("tt_orders", snap).orderBy("o_orderkey")
    },

    // min/max file pruning through a REAL Store: four disjoint-range
    // appends make four stats-disjoint file sets; a range read must both
    // return exactly the filtered rows (oracle) and touch only the files
    // whose footer range overlaps (asserted in StoreSpec).
    Q("st_pruned_read", Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey BETWEEN 2000 AND 2999 ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-pr").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      for (b <- 0 until 4)
        store.append("pr_orders",
          orders.filter(col("o_orderkey") >= b * 2500 && col("o_orderkey") < (b + 1) * 2500)
            .coalesce(1))
      val (df, _, _) = store.readRange("pr_orders", "o_orderkey", 2000L, 2999L)
      df.orderBy("o_orderkey")
    },

    // Incremental matview maintenance: the view holds additive aggregates
    // (count + sums); after appends and deletes, refresh aggregates ONLY
    // the files that changed between store versions (additions with sign
    // +1, retractions with -1) and merges — O(changed files), not
    // O(table). The oracle recomputes the same aggregate from scratch over
    // the final table state; StoreSpec separately asserts the refresh
    // really touched fewer files than the table holds.
    Q("st_ivm_refresh", Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(o_custkey) AS BIGINT) AS sum_o_custkey
      FROM orders WHERE o_orderkey <= 7000 AND o_orderkey NOT IN (11, 12, 13)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
      import s.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft-ivm").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_custkey")
      store.replaceSorted("ivm_orders",
        orders.filter(col("o_orderkey") <= 5000), "o_orderkey", numFiles = 8)
      store.createIncrementalMatview("ivm_agg", "ivm_orders",
        Seq("o_orderpriority"), Seq("o_custkey"))
      store.appendCompacting("ivm_orders",
        orders.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 7000),
        maxFileBytes = 1L) // carry existing files: the delta is the appended files
      store.deleteByKey("ivm_orders", Seq(11L, 12L, 13L).toDF("o_orderkey"), "o_orderkey")
      store.incrementalRefresh("ivm_agg")
      store.read("ivm_agg").orderBy("o_orderpriority")
    },

    // min/max in the incremental view: maintained by min/max-merge on the
    // append (no retraction needed), then a delete of rows holding group
    // extrema forces the internal full rebuild — the result must still
    // equal the from-scratch aggregate either way.
    Q("st_ivm_minmax", Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(min(o_custkey) AS BIGINT) AS min_cust,
        CAST(max(o_custkey) AS BIGINT) AS max_cust
      FROM orders WHERE o_orderkey <= 6000 AND o_orderkey NOT IN (21, 22)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
      import s.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft-ivm2").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_custkey").cast("long").as("o_custkey"))
      store.replaceSorted("ivm2_orders",
        orders.filter(col("o_orderkey") <= 4000), "o_orderkey", numFiles = 8)
      store.createMatview("ivm2_agg", """SELECT o_orderpriority,
        count(*) AS n_rows, min(o_custkey) AS min_cust,
        max(o_custkey) AS max_cust FROM ivm2_orders GROUP BY o_orderpriority""")
      store.appendCompacting("ivm2_orders",
        orders.filter(col("o_orderkey") > 4000 && col("o_orderkey") <= 6000),
        maxFileBytes = 1L)
      store.refreshMatview("ivm2_agg") // append-only: min/max-merge path
      store.deleteByKey("ivm2_orders", Seq(21L, 22L).toDF("o_orderkey"), "o_orderkey")
      store.refreshMatview("ivm2_agg") // removal: internal full rebuild
      store.read("ivm2_agg").orderBy("o_orderpriority")
    },

    // avg in the incremental view: maintained through hidden sum +
    // non-null-count state, so unlike min/max it retracts EXACTLY — the
    // delete below stays on the O(changed files) merge path, no rebuild.
    // The oracle recomputes the aggregate from scratch over the final state.
    Q("st_ivm_avg", Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        avg(o_custkey) AS avg_cust
      FROM orders WHERE o_orderkey <= 6000 AND o_orderkey NOT IN (31, 32, 33)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
      import s.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft-ivm3").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_custkey").cast("long").as("o_custkey"))
      store.replaceSorted("ivm3_orders",
        orders.filter(col("o_orderkey") <= 4000), "o_orderkey", numFiles = 8)
      store.createMatview("ivm3_agg", """SELECT o_orderpriority,
        count(*) AS n_rows, avg(o_custkey) AS avg_cust
        FROM ivm3_orders GROUP BY o_orderpriority""")
      store.appendCompacting("ivm3_orders",
        orders.filter(col("o_orderkey") > 4000 && col("o_orderkey") <= 6000),
        maxFileBytes = 1L)
      store.refreshMatview("ivm3_agg") // registers + builds hidden state
      store.deleteByKey("ivm3_orders", Seq(31L, 32L, 33L).toDF("o_orderkey"), "o_orderkey")
      store.refreshMatview("ivm3_agg") // delete: exact retraction, no rebuild
      store.read("ivm3_agg").orderBy("o_orderpriority")
    },

    // Row-level WHERE in the incremental view: the filter commutes with the
    // version-dir file diff (each added/removed file is filtered before
    // aggregation), so retraction stays exact and the view refreshes
    // incrementally across append AND delete — the oracle recomputes the
    // filtered aggregate from scratch over the final state.
    Q("st_ivm_filtered", Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(o_custkey) AS BIGINT) AS sum_o_custkey
      FROM orders WHERE o_orderkey <= 7000 AND o_orderkey NOT IN (41, 42)
        AND o_custkey % 2 = 0
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
      import s.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft-ivm4").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_custkey")
      store.replaceSorted("ivm4_orders",
        orders.filter(col("o_orderkey") <= 5000), "o_orderkey", numFiles = 8)
      store.createMatview("ivm4_agg", """SELECT o_orderpriority,
        count(*) AS n_rows, sum(o_custkey) AS sum_o_custkey
        FROM ivm4_orders WHERE o_custkey % 2 = 0 GROUP BY o_orderpriority""")
      store.appendCompacting("ivm4_orders",
        orders.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 7000),
        maxFileBytes = 1L)
      store.refreshMatview("ivm4_agg") // append: filtered delta, incremental
      store.deleteByKey("ivm4_orders", Seq(41L, 42L).toDF("o_orderkey"), "o_orderkey")
      store.refreshMatview("ivm4_agg") // delete: filtered exact retraction
      store.read("ivm4_agg")
        .select(col("o_orderpriority"), col("n_rows"),
          col("sum_o_custkey").cast("long").as("sum_o_custkey"))
        .orderBy("o_orderpriority")
    },

    // Star-join incremental matview: the view aggregates fact ⋈ dims
    // (orders ⋈ customer here); refresh diffs only the FACT table's files
    // and joins the delta to the (unchanged) dims — O(changed fact files)
    // across both the append and the delete below, since INNER equi-joins
    // distribute over any partition of the fact rows. StoreSpec separately
    // pins the incremental path, the dim-change full-rebuild fallback, and
    // restart durability; the oracle recomputes the joined aggregate from
    // scratch over the final state.
    Q("st_ivm_join", Some("""
      SELECT c_mktsegment, o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(o_custkey) AS BIGINT) AS sum_cust
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderkey <= 7000 AND o_orderkey NOT IN (51, 52, 53)
      GROUP BY c_mktsegment, o_orderstatus
      ORDER BY c_mktsegment, o_orderstatus""")) { (s, dir) =>
      import s.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft-ivmj").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_custkey")
      store.replaceSorted("ivmj_orders",
        orders.filter(col("o_orderkey") <= 5000), "o_orderkey", numFiles = 8)
      store.replace("ivmj_customer",
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"))
      store.createMatview("ivmj_agg", """SELECT c_mktsegment, o_orderstatus,
        count(*) AS n_rows, sum(o_custkey) AS sum_cust
        FROM ivmj_orders JOIN ivmj_customer
          ON ivmj_orders.o_custkey = ivmj_customer.c_custkey
        GROUP BY c_mktsegment, o_orderstatus""")
      store.appendCompacting("ivmj_orders",
        orders.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 7000),
        maxFileBytes = 1L)
      store.refreshMatview("ivmj_agg") // append: joined delta, incremental
      store.deleteByKey("ivmj_orders", Seq(51L, 52L, 53L).toDF("o_orderkey"),
        "o_orderkey")
      store.refreshMatview("ivmj_agg") // delete: joined exact retraction
      store.read("ivmj_agg")
        .select(col("c_mktsegment"), col("o_orderstatus"), col("n_rows"),
          col("sum_cust").cast("long").as("sum_cust"))
        .orderBy("c_mktsegment", "o_orderstatus")
    },

    // Aggregate-rollup rewrite end-to-end: a matview holds per-(status,
    // priority) aggregates; the dialect answers the coarser per-priority
    // GROUP BY from the VIEW (RollupRewrite — PgDialectSpec asserts the
    // rewrite really fires and that stale views never shadow live data).
    // avg re-derives exactly from the view's hidden sum/count state. The
    // oracle recomputes from the base table.
    Q("st_rollup_rewrite", Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(o_custkey) AS BIGINT) AS sum_cust, avg(o_custkey) AS avg_cust
      FROM orders WHERE o_orderkey <= 6000
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-ru").toString
      val store = new Store(s, wh)
      store.replace("ru7_orders", t(s, dir, "orders")
        .filter(col("o_orderkey") <= 6000)
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("o_custkey").cast("long").as("o_custkey")))
      store.createMatview("ru7_mv", """SELECT o_orderstatus, o_orderpriority,
        count(*) AS n_rows, sum(o_custkey) AS sum_c, avg(o_custkey) AS avg_c
        FROM ru7_orders GROUP BY o_orderstatus, o_orderpriority""")
      PgDialect.execute(s, store, """SELECT o_orderpriority,
        count(*) AS n_orders, sum(o_custkey) AS sum_cust,
        avg(o_custkey) AS avg_cust
        FROM ru7_orders GROUP BY o_orderpriority
        ORDER BY o_orderpriority""") match {
        case PgDialect.Rows(df, _) =>
          df.select(col("o_orderpriority"), col("n_orders"),
            col("sum_cust").cast("long").as("sum_cust"), col("avg_cust"))
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // Approx-distinct matview: the view keeps a mergeable HLL sketch per
    // group as hidden state; appends union sketches incrementally, deletes
    // force a rebuild (sketches don't retract), and the visible column is
    // the estimate. DataSketches HLL has no cross-engine twin, so the
    // oracle follows the established approx pattern: exact distinct counts
    // plus an error-bound boolean the estimate must satisfy.
    Q("st_ivm_hll", Some("""
      SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_nd,
        TRUE AS within_5pct
      FROM orders WHERE o_orderkey <= 6000
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-hll").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_custkey")
      store.replaceSorted("hll_orders",
        orders.filter(col("o_orderkey") <= 4000), "o_orderkey", numFiles = 8)
      store.createMatview("hll_mv", """SELECT o_orderpriority,
        count(*) AS n_rows, approx_count_distinct(o_custkey) AS nd_cust
        FROM hll_orders GROUP BY o_orderpriority""")
      store.appendCompacting("hll_orders",
        orders.filter(col("o_orderkey") > 4000 && col("o_orderkey") <= 6000),
        maxFileBytes = 1L)
      store.refreshMatview("hll_mv") // append: sketch union, incremental
      val exact = store.read("hll_orders").groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("exact_nd"))
      store.read("hll_mv")
        .join(exact, "o_orderpriority")
        .select(col("o_orderpriority"), col("exact_nd"),
          (abs(col("nd_cust") - col("exact_nd")).cast("double") /
            col("exact_nd") <= 0.05).as("within_5pct"))
        .orderBy("o_orderpriority")
    },

    // Time-travel SQL surface end-to-end: v1 = orders subset, v2 = upsert
    // on top; the dialect statement `FROM t FOR VERSION AS OF v1` must
    // still see the pre-upsert rows (immutable version dirs). The oracle
    // recomputes v1's content from the base table.
    // hidden day-partitioned Iceberg layout: the query predicates on ts,
    // planning prunes via the day-transform partition values in the
    // manifest (bounds are relative to min(ts) so the oracle is stable
    // across driver-regenerated data)
    Q("st_iceberg_transform", Some("""
      SELECT event_id, user_id, CAST(ts AS VARCHAR) AS t
      FROM events
      WHERE ts >= (SELECT min(ts) + INTERVAL 2 DAY FROM events)
        AND ts <= (SELECT min(ts) + INTERVAL 4 DAY FROM events)
      ORDER BY event_id""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-icet").toString
      val store = new Store(s, wh)
      val ev = t(s, dir, "events").select("event_id", "user_id", "ts")
      store.replaceTransformPartitioned("icet_events", ev, "ts", "day")
      store.publishIceberg("icet_events")
      val minTs = ev.agg(min(col("ts"))).collect()(0)
        .getAs[java.time.LocalDateTime](0)
      val (df, scanned, total) = store.readIcebergTransformRange(
        "icet_events", "ts", minTs.plusDays(2), minTs.plusDays(4))
      require(scanned < total, s"day pruning must skip files: $scanned/$total")
      df.select(col("event_id"), col("user_id"),
        col("ts").cast("string").as("t")).orderBy("event_id")
    },

    Q("st_timetravel_sql", Some("""
      SELECT o_orderkey, o_orderstatus FROM orders
      WHERE o_orderkey <= 3000 ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-ttsql").toString
      val store = new Store(s, wh)
      val v1 = t(s, dir, "orders")
        .filter(col("o_orderkey") <= 3000)
        .select("o_orderkey", "o_orderstatus")
      store.replace("tts_orders", v1)
      val snap = store.currentVersion("tts_orders")
      store.upsert("tts_orders",
        v1.limit(20).withColumn("o_orderstatus", lit("X")), "o_orderkey")
      PgDialect.execute(s, store, s"""SELECT o_orderkey, o_orderstatus
        FROM tts_orders FOR VERSION AS OF $snap
        ORDER BY o_orderkey""") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // Star-join rollup end-to-end: the query joins fact ⋈ dim exactly like
    // the star matview's definition, so the dialect answers it from the
    // view (join chain canonicalized and matched; PgDialectSpec pins the
    // counter). The oracle recomputes the joined aggregate from the base
    // tables.
    Q("st_rollup_star", Some("""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(o_custkey) AS BIGINT) AS sum_cust
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderkey <= 6000
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-rus").toString
      val store = new Store(s, wh)
      store.replace("ru9_orders", t(s, dir, "orders")
        .filter(col("o_orderkey") <= 6000)
        .select(col("o_orderstatus"), col("o_custkey").cast("long").as("o_custkey")))
      store.replace("ru9_customer",
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"))
      store.createMatview("ru9_mv", """SELECT c_mktsegment, o_orderstatus,
        count(*) AS n_rows, sum(o_custkey) AS sum_c
        FROM ru9_orders JOIN ru9_customer
          ON ru9_orders.o_custkey = ru9_customer.c_custkey
        GROUP BY c_mktsegment, o_orderstatus""")
      PgDialect.execute(s, store, """SELECT c_mktsegment,
        count(*) AS n_orders, sum(o_custkey) AS sum_cust
        FROM ru9_orders JOIN ru9_customer
          ON ru9_orders.o_custkey = ru9_customer.c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""") match {
        case PgDialect.Rows(df, _) =>
          df.select(col("c_mktsegment"), col("n_orders"),
            col("sum_cust").cast("long").as("sum_cust"))
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // Time-hierarchy rollup: the view is day-grained (GROUP BY
    // o_orderdate); the month query's bucket is a deterministic function
    // of the day value, so the dialect answers it from the view —
    // date_trunc('month', …) re-applied over the view's group column, the
    // classic time-dimension rollup (PgDialectSpec asserts the rewrite
    // fires). The oracle recomputes from the base table.
    Q("st_rollup_time", Some("""
      SELECT date_trunc('month', o_orderdate) AS m,
        CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(o_custkey) AS BIGINT) AS sum_cust
      FROM orders WHERE o_orderkey <= 6000
      GROUP BY 1 ORDER BY m""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-rut").toString
      val store = new Store(s, wh)
      store.replace("ru8_orders", t(s, dir, "orders")
        .filter(col("o_orderkey") <= 6000)
        .select(col("o_orderdate"), col("o_custkey").cast("long").as("o_custkey")))
      store.createMatview("ru8_mv", """SELECT o_orderdate,
        count(*) AS n_rows, sum(o_custkey) AS sum_c
        FROM ru8_orders GROUP BY o_orderdate""")
      PgDialect.execute(s, store, """SELECT date_trunc('month', o_orderdate) AS m,
        count(*) AS n_orders, sum(o_custkey) AS sum_cust
        FROM ru8_orders GROUP BY date_trunc('month', o_orderdate)
        ORDER BY m""") match {
        case PgDialect.Rows(df, _) =>
          df.select(col("m"), col("n_orders"),
            col("sum_cust").cast("long").as("sum_cust"))
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // REAL Iceberg v2 round-trip: publish the store table as a
    // spec-conformant Iceberg snapshot (metadata.json + Avro manifest tree,
    // sources/Iceberg.scala), then read it back planning the scan purely
    // from that metadata — the file list comes from manifests, never a
    // directory listing (reference format: storage_utils.go:162-494).
    Q("st_iceberg_roundtrip", Some("""
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderkey <= 5000 ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-ice").toString
      val store = new Store(s, wh)
      val content = t(s, dir, "orders")
        .filter(col("o_orderkey") <= 5000)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      store.replace("ice_orders", content)
      store.publishIceberg("ice_orders")
      store.readIceberg("ice_orders").orderBy("o_orderkey")
    },

    // Reference-catalog interop: the table is published through a JDBC
    // catalog in the reference's iceberg_tables layout (scripts/
    // catalog.sql:1-16) — one row whose metadata_location points at the
    // emitted metadata.json — then served by a FRESH catalog instance that
    // resolves the pointer and plans the scan purely from that metadata,
    // exactly how a reference deployment's catalog is mounted.
    Q("st_iceberg_catalog", Some("""
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderkey <= 4000 ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-icc").toString
      val db = java.nio.file.Files.createTempDirectory("graft-icc-db").toString
      val url = s"jdbc:derby:$db/catalog;create=true"
      val store = new Store(s, wh)
      store.replace("icc_orders", t(s, dir, "orders")
        .filter(col("o_orderkey") <= 4000)
        .select("o_orderkey", "o_totalprice", "o_orderstatus"))
      val cat = new JdbcIcebergCatalog(url)
      cat.init()
      store.publishIcebergTo(cat, "public", "icc_orders")
      // fresh instance = another process mounting the shared catalog
      new JdbcIcebergCatalog(url)
        .readTable(s, "public", "icc_orders")
        .orderBy("o_orderkey")
    },

    // Iceberg manifest-bound pruning: a sorted layout gives each data file
    // a tight key range in its manifest entry; the range scan plans from
    // manifest lower/upper bounds alone (no parquet footers touched) and
    // must return exactly the filtered rows. File-skipping itself is
    // asserted in IcebergSpec.
    Q("st_iceberg_prune", Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey BETWEEN 3000 AND 5999 ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-icp").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      store.replaceSorted("icp_orders", orders, "o_orderkey", numFiles = 8)
      store.publishIceberg("icp_orders")
      val (df, _, _) = Iceberg.readRangePruned(s,
        new org.apache.hadoop.fs.Path(wh, "icp_orders"), orders.schema,
        "o_orderkey", 3000L, 5999L)
      df.orderBy("o_orderkey")
    },

    // z-order clustered layout through a REAL Store: a Morton-curve sort
    // over (o_orderkey, o_custkey) gives every file a tight range in BOTH
    // keys, so a range scan on the SECOND key (which a plain sort cannot
    // prune) returns exactly the filtered rows while skipping most files
    // (file-skip counts asserted in StoreSpec).
    Q("st_zorder_prune", Some("""
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_custkey BETWEEN 100 AND 199 ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-zo").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      store.replaceZOrdered("zo_orders", orders, Seq("o_orderkey", "o_custkey"),
        numFiles = 8)
      val (df, _, _) = store.readRange("zo_orders", "o_custkey", 100L, 199L)
      df.orderBy("o_orderkey")
    },

    // Layout-preserving maintenance: a SORTED table takes unsorted appends
    // (the clustering-decay tail), VACUUM FULL re-applies the declared
    // layout, and the pruned range read still returns exactly the right
    // rows. The oracle is the same union + range filter in plain SQL —
    // the hash gate proves maintenance rewrote without losing, duplicating
    // or reordering anything; the pruning effect itself is spec-pinned
    // (StoreSpec "VACUUM FULL re-applies the declared layout").
    Q("st_layout_vacuum", Some("""
      WITH all_rows AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_custkey FROM orders
        UNION ALL
        SELECT CAST(o_orderkey + 10000000 AS BIGINT), o_custkey FROM orders
        WHERE o_orderkey <= 500)
      SELECT o_orderkey, o_custkey FROM all_rows
      WHERE o_orderkey BETWEEN 2000 AND 3000 ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-layvac").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("o_orderkey"), col("o_custkey"))
      store.replaceSorted("lv_orders", orders, "o_orderkey", 6)
      store.appendCompacting("lv_orders",
        orders.filter(col("o_orderkey") <= 500)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_custkey")),
        maxFileBytes = 1L)
      store.vacuum("lv_orders", full = true)
      val (df, _, _) = store.readRange("lv_orders", "o_orderkey", 2000L, 3000L)
      df.orderBy("o_orderkey")
    },

    // Hive-partitioned write path end-to-end: append + partition-moving
    // UPDATE + DELETE on a partitionBy table, hash-compared against DuckDB
    // computing the same algebra. Every one of these ops silently LOST the
    // base rows before r12 (the non-recursive version listing enumerated a
    // hive version dir as empty, so nothing was carried).
    Q("st_partitioned_dml", Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus,
               CAST(o_custkey AS BIGINT) AS o_custkey
        FROM orders WHERE o_orderkey <= 2000),
      appended AS (
        SELECT o_orderkey, o_orderstatus, o_custkey FROM base
        UNION ALL
        SELECT o_orderkey + 5000000, o_orderstatus, o_custkey FROM base
        WHERE o_orderkey <= 200),
      updated AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey BETWEEN 100 AND 120 THEN 'Z'
               ELSE o_orderstatus END AS o_orderstatus,
          o_custkey
        FROM appended),
      final AS (
        SELECT * FROM updated WHERE o_orderkey NOT BETWEEN 300 AND 320)
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-pdml").toString
      val store = new Store(s, wh)
      val base = t(s, dir, "orders")
        .filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"), col("o_custkey").cast("long").as("o_custkey"))
      store.replacePartitioned("pd_orders", base, "o_orderstatus")
      store.appendCompacting("pd_orders",
        base.filter(col("o_orderkey") <= 200)
          .select((col("o_orderkey") + 5000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_custkey")))
      // the UPDATE moves rows ACROSS partition dirs (status -> 'Z')
      store.updateWhere("pd_orders", Seq("o_orderstatus" -> "'Z'"),
        Some("o_orderkey BETWEEN 100 AND 120"))
      store.deleteWhere("pd_orders", Some("o_orderkey BETWEEN 300 AND 320"))
      store.read("pd_orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").cast("long").as("key_sum"))
        .orderBy("o_orderstatus")
    },

    // SQL write surface end-to-end (PgDml → Store copy-on-write engine;
    // beyond the reference, which rejects every write): CTAS + INSERT
    // VALUES + INSERT SELECT, read back through the dialect. The oracle
    // recomputes the post-state as pure SQL over the base tables.
    // CREATE VIEW through the dialect: a plain SQL view over a store table,
    // proven to track the base across a later UPDATE (views re-bind on every
    // version flip — a pinned-plan temp view would serve the old snapshot)
    Q("st_sql_view", Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= 4000),
      cur AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey <= 200 THEN 'X' ELSE o_orderstatus END AS o_orderstatus
        FROM base)
      SELECT o_orderstatus, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM cur GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-sqlvw").toString
      val store = new Store(s, wh)
      store.replace("vw_orders", t(s, dir, "orders")
        .filter(col("o_orderkey") <= 4000)
        .select("o_orderkey", "o_orderstatus"))
      PgDialect.execute(s, store, """
        CREATE OR REPLACE VIEW vw_status AS
        SELECT o_orderstatus, count(*) AS n,
          CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        FROM vw_orders GROUP BY o_orderstatus""")
      PgDialect.execute(s, store,
        "UPDATE vw_orders SET o_orderstatus = 'X' WHERE o_orderkey <= 200")
      PgDialect.execute(s, store,
        "SELECT o_orderstatus, n, key_sum FROM vw_status ORDER BY o_orderstatus") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // PG's join-update (UPDATE … FROM): assignments taken from the joined
    // source row
    Q("st_sql_update_from", Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        WHERE o_orderkey <= 2000),
      upd AS (
        SELECT b.o_orderkey, b.o_custkey,
          CASE WHEN c.c_custkey IS NOT NULL THEN lower(c.c_mktsegment)
               ELSE b.o_orderstatus END AS o_orderstatus
        FROM base b LEFT JOIN customer c
          ON c.c_custkey = b.o_custkey AND c.c_custkey % 3 = 0)
      SELECT o_orderkey, o_custkey, o_orderstatus FROM upd
      ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-updfrom").toString
      val store = new Store(s, wh)
      store.replace("uf_orders", t(s, dir, "orders")
        .filter(col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_custkey", "o_orderstatus"))
      Tables.registerAll(s, dir)
      PgDialect.execute(s, store, """
        UPDATE uf_orders SET o_orderstatus = lower(customer.c_mktsegment)
        FROM customer
        WHERE customer.c_custkey = uf_orders.o_custkey
          AND customer.c_custkey % 3 = 0""")
      PgDialect.execute(s, store, """
        SELECT o_orderkey, o_custkey, o_orderstatus FROM uf_orders
        ORDER BY o_orderkey""") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // PG upsert: INSERT … ON CONFLICT DO UPDATE with the excluded row
    Q("st_sql_on_conflict", Some("""
      WITH base AS (SELECT r_regionkey, r_name FROM region),
      inc AS (SELECT CAST(0 AS BIGINT) AS r_regionkey, 'ZERO' AS r_name
              UNION ALL SELECT 90, 'NEW'),
      merged AS (
        SELECT b.r_regionkey,
          CASE WHEN i.r_regionkey IS NOT NULL
               THEN b.r_name || '/' || i.r_name ELSE b.r_name END AS r_name
        FROM base b LEFT JOIN inc i USING (r_regionkey)
        UNION ALL
        SELECT i.r_regionkey, i.r_name
        FROM inc i LEFT JOIN base b USING (r_regionkey)
        WHERE b.r_regionkey IS NULL)
      SELECT r_regionkey, r_name FROM merged ORDER BY r_regionkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-oc").toString
      val store = new Store(s, wh)
      store.replace("oc_region", t(s, dir, "region")
        .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name")))
      PgDialect.execute(s, store, """
        INSERT INTO oc_region VALUES (0, 'ZERO'), (90, 'NEW')
        ON CONFLICT (r_regionkey) DO UPDATE
        SET r_name = oc_region.r_name || '/' || excluded.r_name""")
      PgDialect.execute(s, store,
        "SELECT r_regionkey, r_name FROM oc_region ORDER BY r_regionkey") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    Q("st_sql_insert", Some("""
      WITH base AS (SELECT r_regionkey, r_name FROM region),
      ins AS (SELECT CAST(90 AS BIGINT) AS r_regionkey, 'ad-hoc' AS r_name
              UNION ALL
              SELECT r_regionkey + 100, lower(r_name) FROM region)
      SELECT r_regionkey, r_name FROM base
      UNION ALL SELECT r_regionkey, r_name FROM ins
      ORDER BY r_regionkey, r_name""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-sqlins").toString
      val store = new Store(s, wh)
      store.replace("sqlins_region", t(s, dir, "region")
        .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name")))
      Tables.registerAll(s, dir)
      PgDialect.execute(s, store,
        "INSERT INTO sqlins_region VALUES (90, 'ad-hoc')")
      PgDialect.execute(s, store,
        "INSERT INTO sqlins_region SELECT r_regionkey + 100, lower(r_name) FROM region")
      PgDialect.execute(s, store,
        "SELECT r_regionkey, r_name FROM sqlins_region ORDER BY r_regionkey, r_name") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // Transaction sequence end-state, oracle-gated: BEGIN (repeatable
    // read) -> INSERT..SELECT reading the table itself (the pin) ->
    // UPDATE touching only the txn's OWN staged rows (read-own-writes
    // feeding a write) -> DELETE one of them -> COMMIT. The oracle is the
    // same algebra composed as one DuckDB query over the seed parquet —
    // the gate hashes the PUBLISHED final state, so commit-publish
    // atomicity and the staged-read surface are what is being graded.
    Q("st_txn_commit", Some("""
      WITH base AS (SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region),
      ins AS (SELECT r_regionkey + 100 AS r_regionkey, upper(r_name) AS r_name
              FROM base WHERE r_regionkey + 100 <> 101)
      SELECT r_regionkey, r_name FROM base
      UNION ALL SELECT r_regionkey, r_name FROM ins
      ORDER BY r_regionkey, r_name""")) { (s, dir) =>
      val store = new Store(s,
        java.nio.file.Files.createTempDirectory("graft-txnc").toString)
      store.replace("txc_region", t(s, dir, "region")
        .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name")))
      Tables.registerAll(s, dir)
      val txn = new PgDialect.PgTxn
      def exec(sql: String) = PgDialect.execute(s, store, sql, txn)
      exec("BEGIN ISOLATION LEVEL REPEATABLE READ")
      exec("INSERT INTO txc_region SELECT r_regionkey + 100, lower(r_name) FROM txc_region")
      exec("UPDATE txc_region SET r_name = upper(r_name) WHERE r_regionkey >= 100")
      exec("DELETE FROM txc_region WHERE r_regionkey = 101")
      exec("COMMIT")
      PgDialect.execute(s, store,
        "SELECT r_regionkey, r_name FROM txc_region ORDER BY r_regionkey, r_name") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // ROLLBACK is a pure discard: the same staged write mix vanishes and
    // the table keeps serving (one autocommit row after proves the chain
    // is live). Oracle = seed + that row.
    Q("st_txn_rollback", Some("""
      WITH base AS (SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region)
      SELECT r_regionkey, r_name FROM base
      UNION ALL SELECT CAST(990 AS BIGINT), 'after-rollback'
      ORDER BY r_regionkey, r_name""")) { (s, dir) =>
      val store = new Store(s,
        java.nio.file.Files.createTempDirectory("graft-txnr").toString)
      store.replace("txr_region", t(s, dir, "region")
        .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name")))
      Tables.registerAll(s, dir)
      val txn = new PgDialect.PgTxn
      def exec(sql: String) = PgDialect.execute(s, store, sql, txn)
      exec("BEGIN")
      exec("INSERT INTO txr_region SELECT r_regionkey + 100, lower(r_name) FROM txr_region")
      exec("UPDATE txr_region SET r_name = upper(r_name) WHERE r_regionkey >= 100")
      exec("ROLLBACK")
      PgDialect.execute(s, store,
        "INSERT INTO txr_region VALUES (990, 'after-rollback')")
      PgDialect.execute(s, store,
        "SELECT r_regionkey, r_name FROM txr_region ORDER BY r_regionkey, r_name") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // Two interleaved insert-only transactions on ONE table, both
    // committing — the second commit lands on a moved base and MERGES
    // (r12 gateless insert path). Oracle = seed plus both slices; the
    // hash gate proves the merge loses and duplicates nothing.
    Q("st_txn_concurrent_insert", Some("""
      WITH base AS (SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation)
      SELECT n_nationkey, n_name FROM base
      UNION ALL SELECT n_nationkey + 100, lower(n_name) FROM base
      UNION ALL SELECT n_nationkey + 200, upper(n_name) FROM base
      ORDER BY n_nationkey, n_name""")) { (s, dir) =>
      val store = new Store(s,
        java.nio.file.Files.createTempDirectory("graft-txni").toString)
      store.replace("txi_nation", t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name")))
      Tables.registerAll(s, dir)
      val t1 = new PgDialect.PgTxn; val t2 = new PgDialect.PgTxn
      def e1(sql: String) = PgDialect.execute(s, store, sql, t1)
      def e2(sql: String) = PgDialect.execute(s, store, sql, t2)
      e1("BEGIN"); e2("BEGIN")
      e1("INSERT INTO txi_nation SELECT n_nationkey + 100, lower(n_name) FROM nation")
      e2("INSERT INTO txi_nation SELECT n_nationkey + 200, upper(n_name) FROM nation")
      e1("COMMIT")
      e2("COMMIT") // base moved: merge commit
      PgDialect.execute(s, store,
        "SELECT n_nationkey, n_name FROM txi_nation ORDER BY n_nationkey, n_name") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // Copy-on-write UPDATE through SQL: assignment-cast SET + WHERE, the
    // oracle is the CASE projection of the same predicate.
    Q("st_sql_update", Some("""
      SELECT o_orderkey,
        CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 100000.0
             ELSE o_totalprice END AS o_totalprice,
        CASE WHEN o_orderstatus = 'P' THEN 'X' ELSE o_orderstatus END AS o_orderstatus
      FROM orders WHERE o_orderkey <= 4000
      ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-sqlupd").toString
      val store = new Store(s, wh)
      store.replace("squ_orders", t(s, dir, "orders")
        .filter(col("o_orderkey") <= 4000)
        .select("o_orderkey", "o_totalprice", "o_orderstatus"))
      PgDialect.execute(s, store, """UPDATE squ_orders
        SET o_totalprice = o_totalprice + 100000.0, o_orderstatus = 'X'
        WHERE o_orderstatus = 'P'""")
      PgDialect.execute(s, store,
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM squ_orders ORDER BY o_orderkey") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // Copy-on-write DELETE through SQL.
    Q("st_sql_delete", Some("""
      SELECT o_orderkey, o_orderstatus FROM orders
      WHERE o_orderkey <= 4000 AND NOT (o_orderstatus = 'O' AND o_orderkey % 2 = 0)
      ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-sqldel").toString
      val store = new Store(s, wh)
      store.replace("sqd_orders", t(s, dir, "orders")
        .filter(col("o_orderkey") <= 4000)
        .select("o_orderkey", "o_orderstatus"))
      PgDialect.execute(s, store,
        "DELETE FROM sqd_orders WHERE o_orderstatus = 'O' AND o_orderkey % 2 = 0")
      PgDialect.execute(s, store,
        "SELECT o_orderkey, o_orderstatus FROM sqd_orders ORDER BY o_orderkey") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // Metadata-only schema evolution end-to-end: ADD COLUMN (null-fill on
    // old files, no rewrite), RENAME COLUMN, DROP COLUMN, then writes
    // through the evolved schema. The oracle recomputes the visible
    // post-state in pure SQL.
    Q("st_sql_evolve", Some("""
      WITH base AS (SELECT n_nationkey AS nation_id, n_name FROM nation),
      ins AS (SELECT CAST(90 AS BIGINT) AS nation_id, 'newland' AS n_name,
                     'extra' AS note)
      SELECT nation_id, n_name, CAST(NULL AS VARCHAR) AS note FROM base
      WHERE nation_id <> 3
      UNION ALL SELECT nation_id, n_name, note FROM ins
      ORDER BY nation_id""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-sqlevo").toString
      val store = new Store(s, wh)
      store.replace("sqe_nation", t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"), col("n_regionkey")))
      def run(q: String) = PgDialect.execute(s, store, q)
      run("ALTER TABLE sqe_nation ADD COLUMN note text")
      run("ALTER TABLE sqe_nation RENAME COLUMN n_nationkey TO nation_id")
      run("ALTER TABLE sqe_nation DROP COLUMN n_regionkey")
      run("INSERT INTO sqe_nation (nation_id, n_name, note) VALUES (90, 'newland', 'extra')")
      run("DELETE FROM sqe_nation WHERE nation_id = 3")
      run("SELECT nation_id, n_name, note FROM sqe_nation ORDER BY nation_id") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // MERGE INTO through SQL (equi-key, clause order, delete/update/insert
    // legs): target = orders ≤ 3000, source = orders in (2000, 4000] with
    // transformed totals; the oracle recomputes all three legs.
    Q("st_sql_merge", Some("""
      WITH tgt AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
                   WHERE o_orderkey <= 3000),
      src AS (SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderkey > 2000 AND o_orderkey <= 4000)
      SELECT t.o_orderkey,
             CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice * 2
                  ELSE t.o_totalprice END AS o_totalprice,
             CASE WHEN s.o_orderkey IS NOT NULL THEN 'M'
                  ELSE t.o_orderstatus END AS o_orderstatus
      FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
      WHERE NOT (s.o_orderkey IS NOT NULL AND s.o_totalprice < 50000)
      UNION ALL
      SELECT s.o_orderkey, s.o_totalprice, 'NEW'
      FROM src s WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM tgt)
      ORDER BY o_orderkey""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-sqlmrg").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders")
      store.replace("sqm_t", orders.filter(col("o_orderkey") <= 3000)
        .select("o_orderkey", "o_totalprice", "o_orderstatus"))
      store.replace("sqm_s", orders
        .filter(col("o_orderkey") > 2000 && col("o_orderkey") <= 4000)
        .select("o_orderkey", "o_totalprice"))
      PgDialect.execute(s, store, """MERGE INTO sqm_t t USING sqm_s s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.o_totalprice < 50000 THEN DELETE
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice * 2,
          o_orderstatus = 'M'
        WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice, o_orderstatus)
          VALUES (s.o_orderkey, s.o_totalprice, 'NEW')""")
      PgDialect.execute(s, store,
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM sqm_t ORDER BY o_orderkey") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
    },

    // Row-level change feed (Delta-CDF analog) through a REAL Store: from
    // a sorted multi-file base, append new keys (existing files carry by
    // name), delete three keys and upsert a status flip (each a COW
    // rewrite of only the hit files), then diff the two snapshots. The
    // feed must be the LOGICAL row diff — rows merely rewritten into new
    // files cancel — and reads only the changed files (pinned in
    // StoreSpec). The oracle computes the same diff as EXCEPT ALL between
    // the reconstructed before/after states.
    Q("st_changefeed", Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_custkey AS BIGINT) AS o_custkey
        FROM orders WHERE o_orderkey <= 3000),
      appended AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_custkey AS BIGINT) AS o_custkey
        FROM orders WHERE o_orderkey > 3000 AND o_orderkey <= 4000),
      fin AS (
        SELECT o_orderkey,
          CASE WHEN o_custkey % 17 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
          o_custkey
        FROM (SELECT * FROM base UNION ALL SELECT * FROM appended)
        WHERE o_orderkey NOT IN (11, 12, 13))
      SELECT * FROM (
        SELECT *, 'insert' AS _change_type FROM
          (SELECT * FROM fin EXCEPT ALL SELECT * FROM base)
        UNION ALL
        SELECT *, 'delete' AS _change_type FROM
          (SELECT * FROM base EXCEPT ALL SELECT * FROM fin))
      ORDER BY o_orderkey, _change_type""")) { (s, dir) =>
      import s.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft-cf").toString
      val store = new Store(s, wh)
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_custkey").cast("long").as("o_custkey"))
      store.replaceSorted("cf_orders",
        orders.filter(col("o_orderkey") <= 3000), "o_orderkey", numFiles = 8)
      val v0 = store.currentVersion("cf_orders")
      store.appendCompacting("cf_orders",
        orders.filter(col("o_orderkey") > 3000 && col("o_orderkey") <= 4000),
        maxFileBytes = 1L) // carry existing files: the delta is the appended files
      store.deleteByKey("cf_orders", Seq(11L, 12L, 13L).toDF("o_orderkey"), "o_orderkey")
      val ups = store.read("cf_orders").filter(col("o_custkey") % 17 === 0)
        .withColumn("o_orderstatus", lit("X"))
      store.upsert("cf_orders", ups, "o_orderkey")
      store.changesSince("cf_orders", v0)
        .orderBy("o_orderkey", "_change_type")
    },

    // Index-staleness lifecycle through the SQL surface: a failed ANN
    // refresh leaves a visible stale row in graft_index_stats (watermark
    // trailing the table version, failure recorded); the next commit's
    // hook repairs it from the cumulative change feed. Two snapshots of
    // the view, unioned — the oracle pins both states' exact versions.
    Q("st_index_staleness", Some("""
      SELECT * FROM (VALUES
        ('healed', 'ann', 3, 3, FALSE, FALSE),
        ('stale',  'ann', 1, 2, TRUE,  TRUE)
      ) AS t(phase, index_kind, indexed_version, current_version, stale, had_error)
      ORDER BY phase""")) { (s, dir) =>
      import s.implicits._
      val store = new Store(s,
        java.nio.file.Files.createTempDirectory("graft-stx").toString)
      Tables.registerAll(s, dir)
      def vec(id: Long, x: Double, y: Double) = (id, Seq(x, y))
      store.replace("stx_vecs",
        Seq(vec(1, 1.0, 0.0), vec(2, 0.0, 1.0)).toDF("vec_id", "embedding"))
      val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "cv")
      store.enableAnnIndex("stx_vecs", cents)
      def snap(phase: String): DataFrame = PgDialect.execute(s, store,
        s"SELECT '$phase' AS phase, index_kind, indexed_version, " +
          "current_version, stale, last_error <> '' AS had_error " +
          "FROM graft_index_stats WHERE relname = 'stx_vecs'") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
      // sabotage: the refresh hook needs the centroids table; kill it and
      // commit — the hook fails (warns), the watermark stays at v1
      store.drop(store.annCentsTable("stx_vecs"))
      store.appendCompacting("stx_vecs",
        Seq(vec(3, 0.9, 0.1)).toDF("vec_id", "embedding"))
      val staleSnap = snap("stale")
      // heal: restore centroids; the NEXT commit's hook covers both batches
      store.replace(store.annCentsTable("stx_vecs"), cents)
      store.appendCompacting("stx_vecs",
        Seq(vec(4, 0.1, 0.9)).toDF("vec_id", "embedding"))
      staleSnap.union(snap("healed")).orderBy("phase")
    },

    // Warehouse-coordination lifecycle through the SQL surface: a fresh
    // mount is a reader; the first write claims the writer lease (epoch
    // 1); a spooled follower manifest is a visible adoption backlog; the
    // sweep drains it (here by refusing an unknown table — cleanup
    // included). Four snapshots of graft_warehouse_stats, unioned;
    // host/pid/catalog-version columns are process-specific and stay out
    // of the pin.
    Q("st_warehouse_stats", Some("""
      SELECT phase, role, CAST(lease_epoch AS BIGINT) AS lease_epoch,
             CAST(inbox_pending AS BIGINT) AS inbox_pending
      FROM (VALUES
        ('a_fresh',  'reader', 0, 0),
        ('b_writer', 'writer', 1, 0),
        ('c_queued', 'writer', 1, 1),
        ('d_swept',  'writer', 1, 0)
      ) AS t(phase, role, lease_epoch, inbox_pending)
      ORDER BY phase""")) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("graft-stw").toString
      val store = new Store(s, wh)
      Tables.registerAll(s, dir)
      def snap(phase: String): DataFrame = PgDialect.execute(s, store,
        s"SELECT '$phase' AS phase, role, lease_epoch, inbox_pending " +
          "FROM graft_warehouse_stats") match {
        case PgDialect.Rows(df, _) => df
        case other => sys.error(s"expected rows, got $other")
      }
      val fresh = snap("a_fresh")
      import s.implicits._
      store.replace("stw_t", Seq((1L, "a")).toDF("k", "v"))
      val writer = snap("b_writer")
      val inbox = java.nio.file.Paths.get(wh, "_inbox")
      java.nio.file.Files.createDirectories(inbox)
      java.nio.file.Files.write(
        inbox.resolve("0000000000000-probe-0001.req.json"),
        """{"table":"stw_missing","rows":1,"files":["f.parquet"]}"""
          .getBytes("UTF-8"))
      val queued = snap("c_queued")
      store.sweepInbox()
      val swept = snap("d_swept")
      fresh.union(writer).union(queued).union(swept).orderBy("phase")
    }
  )
}
