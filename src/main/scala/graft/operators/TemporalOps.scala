package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / ordered-analytics operators beyond the reference's surface
  * (SURVEY §7.5 beyond-parity): as-of join, range join, window frames,
  * distribution windows, exact-moment statistics. Each is implemented the
  * way it should run on a 1000-executor cluster:
  *
  *  - As-of join: the sort-merge formulation — union both inputs, one
  *    shuffle by key, one window pass (`last(_, ignoreNulls)` over the
  *    time-ordered frame). No per-row subqueries, no broadcast of the big
  *    side, no skew blowup: cost is a single sort per key partition.
  *  - Range join: interval membership becomes an equi-join on overlapping
  *    hour buckets (interval expansion on the small side) + exact residual
  *    filter — turning an O(N*W) theta join into a hash join.
  *  - Moments/correlation: exact integer power sums (one map-side-combined
  *    aggregation) then closed-form doubles — deterministic at any
  *    parallelism, unlike streaming-fp variance.
  */
object TemporalOps {
  import Qdsl._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  val defs: Seq[Q] = Seq(

    // ---- as-of join ------------------------------------------------------
    // For each click, the user's most recent purchase at-or-before it.
    // Spark: tagged union + one window (scalable sort-based as-of). Oracle:
    // DuckDB's native ASOF LEFT JOIN.
    Q("op_join_asof", Some("""
      WITH purch AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
           clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      SELECT c.event_id, c.user_id, c.ts, p.ts AS last_purchase_ts,
             p.value AS last_purchase_value
      FROM clicks c ASOF LEFT JOIN purch p
        ON c.user_id = p.user_id AND p.ts <= c.ts
      ORDER BY c.event_id""")) { (s, dir) =>
      val ev = t(s, dir, "events")
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("ts").as("p_ts"),
          col("value").as("p_value"), lit(0).as("tag"), lit(null).cast("long").as("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(null).cast("timestamp").as("p_ts"),
          lit(null).cast("double").as("p_value"), lit(1).as("tag"), col("event_id"))
      // tag orders a purchase before a click at the same instant => `<=`
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purch.unionByName(clicks)
        .withColumn("last_purchase_ts", last(col("p_ts"), ignoreNulls = true).over(w))
        .withColumn("last_purchase_value", last(col("p_value"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select("event_id", "user_id", "ts", "last_purchase_ts", "last_purchase_value")
        .orderBy("event_id")
    },

    // ---- range join ------------------------------------------------------
    // Events falling inside ad-hoc (non-aligned) time windows. Spark: the
    // window list is expanded to its covered hour buckets and the join is an
    // equi-join on bucket + exact residual predicate; DuckDB oracles the
    // naive inequality join.
    Q("op_join_range", Some("""
      WITH w(w_id, w_start, w_end) AS (VALUES
        (1, TIMESTAMP '2024-01-02 02:17:00', TIMESTAMP '2024-01-02 06:43:00'),
        (2, TIMESTAMP '2024-01-05 11:05:00', TIMESTAMP '2024-01-05 19:40:00'),
        (3, TIMESTAMP '2024-01-09 00:30:00', TIMESTAMP '2024-01-10 03:15:00'),
        (4, TIMESTAMP '2024-01-14 22:01:00', TIMESTAMP '2024-01-15 01:59:00'),
        (5, TIMESTAMP '2024-01-20 08:00:00', TIMESTAMP '2024-01-20 08:05:00'),
        (6, TIMESTAMP '2024-01-23 13:13:00', TIMESTAMP '2024-01-24 13:13:00'))
      SELECT w_id, count(e.event_id) AS n_events,
        round(CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100, 2) AS total_value
      FROM w LEFT JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
      GROUP BY w_id ORDER BY w_id""")) { (s, dir) =>
      import s.implicits._
      val windows = Seq(
        (1, "2024-01-02 02:17:00", "2024-01-02 06:43:00"),
        (2, "2024-01-05 11:05:00", "2024-01-05 19:40:00"),
        (3, "2024-01-09 00:30:00", "2024-01-10 03:15:00"),
        (4, "2024-01-14 22:01:00", "2024-01-15 01:59:00"),
        (5, "2024-01-20 08:00:00", "2024-01-20 08:05:00"),
        (6, "2024-01-23 13:13:00", "2024-01-24 13:13:00"))
        .toDF("w_id", "w_start_s", "w_end_s")
        .select(col("w_id"), col("w_start_s").cast("timestamp").as("w_start"),
          col("w_end_s").cast("timestamp").as("w_end"))
      // expand each window to its covered hour buckets (small side only)
      val buckets = windows.withColumn("bucket",
        explode(expr("sequence(date_trunc('hour', w_start), date_trunc('hour', w_end), interval 1 hour)")))
      val ev = t(s, dir, "events")
        .withColumn("bucket", date_trunc("hour", col("ts")))
      broadcast(buckets).join(ev,
          buckets("bucket") === ev("bucket")
            && col("ts") >= col("w_start") && col("ts") < col("w_end"), "left")
        .groupBy("w_id")
        .agg(count(col("event_id")).as("n_events"),
          round(sum(cents(col("value"))).cast("double") / 100, 2).as("total_value"))
        .orderBy("w_id")
    },

    // ---- window frames ---------------------------------------------------
    // ROWS frames with moving aggregates and positional window functions.
    // The frame order must be TOTAL within each partition (event_id is
    // unique) — a non-unique ORDER BY makes ROWS-frame contents engine-
    // dependent. Sums are over exact integer cents.
    // IGNORE NULLS window navigation: LOCF (last non-null so far) and
    // back-fill (next non-null) in one window pass each
    Q("op_window_ignore_nulls", Some("""
      WITH e AS (
        SELECT event_id, user_id,
          CASE WHEN event_type = 'view'
               THEN CAST(round(value * 100) AS BIGINT) END AS v,
          ts FROM events)
      SELECT event_id, user_id, v,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS backfill
      FROM e ORDER BY event_id""")) { (s, dir) =>
      val wUp = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDown = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "view",
            round(col("value") * 100).cast("long")).as("v"))
        .select(col("event_id"), col("user_id"), col("v"),
          last(col("v"), ignoreNulls = true).over(wUp).as("locf"),
          first(col("v"), ignoreNulls = true).over(wDown).as("backfill"))
        .orderBy("event_id")
    },

    // Engine-drift hardening (round 3): DuckDB's windowed sum(BIGINT)
    // returns HUGEINT whose pandas dtype is duckdb-version-dependent, so
    // every windowed aggregate is wrapped in an outer CAST(.. AS BIGINT);
    // nth_value is replaced by a row_number-based pick (nth_value frame/null
    // semantics have drifted across engine versions).
    Q("op_window_frames", Some("""
      WITH e AS (
        SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS c,
          row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
        FROM events WHERE event_id < 3000)
      SELECT event_id, event_type,
        CAST(sum(c) OVER w4 AS BIGINT) AS mov_sum_cents,
        CAST(first_value(c) OVER wall AS BIGINT) AS first_cents,
        CAST(last_value(c) OVER wall AS BIGINT) AS last_cents,
        CAST(max(CASE WHEN rn = 2 THEN c END)
             OVER (PARTITION BY event_type) AS BIGINT) AS second_cents
      FROM e
      WINDOW
        w4 AS (PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
        wall AS (PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY event_id""")) { (s, dir) =>
      val base = Window.partitionBy("event_type").orderBy("event_id")
      val w4 = base.rowsBetween(-3, Window.currentRow)
      val wall = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wp = Window.partitionBy("event_type")
      t(s, dir, "events").filter(col("event_id") < 3000)
        .select(col("event_id"), col("event_type"), cents(col("value")).as("c"),
          row_number().over(base).as("rn"))
        .select(col("event_id"), col("event_type"),
          sum(col("c")).over(w4).cast("long").as("mov_sum_cents"),
          first(col("c")).over(wall).cast("long").as("first_cents"),
          last(col("c")).over(wall).cast("long").as("last_cents"),
          max(when(col("rn") === 2, col("c"))).over(wp).cast("long").as("second_cents"))
        .orderBy("event_id")
    },

    // RANGE frame over a numeric ordering: peers are by VALUE distance, so
    // ties are included as a group and the frame is well-defined even with
    // duplicate ordering values
    Q("op_window_range_frame", Some("""
      SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents,
        CAST(count(*) OVER wr AS BIGINT) AS n_in_band,
        CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER wr AS BIGINT) AS band_cents
      FROM events WHERE event_id < 1500
      WINDOW wr AS (PARTITION BY event_type
                    ORDER BY CAST(round(value * 100) AS BIGINT) ASC NULLS FIRST
                    RANGE BETWEEN 200 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")) { (s, dir) =>
      val wr = Window.partitionBy("event_type")
        .orderBy(cents(col("value")).asc_nulls_first)
        .rangeBetween(-200, Window.currentRow)
      t(s, dir, "events").filter(col("event_id") < 1500)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("cents"),
          count(lit(1)).over(wr).cast("long").as("n_in_band"),
          sum(cents(col("value"))).over(wr).cast("long").as("band_cents"))
        .orderBy("event_id")
    },

    // distribution windows: percent_rank / cume_dist (rank-derived, so
    // deterministic under ties; the division operands are identical on both
    // engines)
    Q("op_window_percent", Some("""
      SELECT c_custkey, c_mktsegment, c_acctbal,
        percent_rank() OVER ws AS pr,
        cume_dist() OVER ws AS cd
      FROM customer
      WINDOW ws AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
      ORDER BY c_custkey""")) { (s, dir) =>
      val ws = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          percent_rank().over(ws).as("pr"),
          cume_dist().over(ws).as("cd"))
        .orderBy("c_custkey")
    },

    // ---- exact-moment statistics ----------------------------------------
    // stddev/var/covar/corr from exact integer power sums: one map-side-
    // combined aggregation of BIGINT sums, then closed-form double math —
    // the parallelism-invariant formulation (streaming-fp variance is
    // order-dependent and could never hash-match across engines).
    Q("fn_stats_moments", Some("""
      WITH m AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
          CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
          CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sy,
          CAST(sum(CAST(round(l_discount * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS syy,
          CAST(sum(CAST(l_quantity AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        round(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1))), 6) AS sd_qty,
        round((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * n), 6) AS varp_qty,
        round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * n) / 100, 6) AS covp_qty_disc,
        round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS corr_qty_disc
      FROM m ORDER BY l_returnflag""")) { (s, dir) =>
      val q = col("l_quantity").cast("long")
      val d = cents(col("l_discount"))
      val m = t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(q).as("sx"), sum(q * q).as("sxx"),
          sum(d).as("sy"), sum(d * d).as("syy"), sum(q * d).as("sxy"))
      val nD = col("n").cast("double")
      m.select(col("l_returnflag"), col("n"),
          round(sqrt((nD * col("sxx") - col("sx").cast("double") * col("sx")) / (nD * (col("n") - 1))), 6).as("sd_qty"),
          round((nD * col("sxx") - col("sx").cast("double") * col("sx")) / (nD * col("n")), 6).as("varp_qty"),
          round((nD * col("sxy") - col("sx").cast("double") * col("sy")) / (nD * col("n")) / 100, 6).as("covp_qty_disc"),
          round((nD * col("sxy") - col("sx").cast("double") * col("sy"))
            / (sqrt(nD * col("sxx") - col("sx").cast("double") * col("sx"))
             * sqrt(nD * col("syy") - col("sy").cast("double") * col("sy"))), 6).as("corr_qty_disc"))
        .orderBy("l_returnflag")
    },

    // exact interpolated percentiles over fixed-point cents (integer lattice
    // => both engines' interpolation arithmetic is exact)
    Q("fn_percentile_exact", Some("""
      SELECT l_returnflag,
        quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) / 100 AS p25,
        quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) / 100 AS p50,
        quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) / 100 AS p75
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
      val c = cents(col("l_extendedprice"))
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg((expr("percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25)") / 100).as("p25"),
          (expr("percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)") / 100).as("p50"),
          (expr("percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75)") / 100).as("p75"))
        .orderBy("l_returnflag")
    },

    // boolean / bitwise aggregates
    Q("fn_bool_bit_agg", Some("""
      SELECT l_returnflag,
        bool_and(l_quantity > 0) AS all_pos,
        bool_or(l_discount > 0.09) AS any_high_disc,
        CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS band,
        CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS bor,
        CAST(bit_xor(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS bxor
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_high_disc"),
          bit_and(col("l_linenumber").cast("long")).as("band"),
          bit_or(col("l_linenumber").cast("long")).as("bor"),
          bit_xor(col("l_linenumber").cast("long")).as("bxor"))
        .orderBy("l_returnflag")
    },

    // ---- unpivot ---------------------------------------------------------
    // wide -> long reshape (SQL-standard UNPIVOT on both engines)
    Q("op_unpivot", Some("""
      WITH wide AS (
        SELECT r_name,
          CAST(count(DISTINCT n_nationkey) AS BIGINT) AS n_nations,
          CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        GROUP BY r_name)
      SELECT r_name, metric, val
      FROM wide UNPIVOT (val FOR metric IN (n_nations, n_customers))
      ORDER BY r_name, metric""")) { (s, dir) =>
      val wide = t(s, dir, "region")
        .join(broadcast(t(s, dir, "nation")), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("r_name")
        .agg(countDistinct(col("n_nationkey")).as("n_nations"),
          countDistinct(col("c_custkey")).as("n_customers"))
      wide.unpivot(Array(col("r_name")),
          Array(col("n_nations"), col("n_customers")), "metric", "val")
        .orderBy("r_name", "metric")
    }
  )
}
