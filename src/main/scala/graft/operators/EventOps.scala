package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the events stream (the reference syncs
  * Amplitude event exports — these are the queries that data serves;
  * SURVEY §3.3 Amplitude syncer, §7.5 beyond-parity).
  *
  * Scale shapes: funnel and retention are per-user conditional aggregates —
  * one shuffle by user_id each phase, map-side combinable, no self-joins
  * over the raw event log. The hopping window expands each event into its
  * covering windows scan-side (explode of a generated sequence), then one
  * hash aggregate — the batch formulation of a sliding-window stream agg.
  */
object EventOps {
  import Qdsl._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  val defs: Seq[Q] = Seq(

    // ordered funnel: signup -> click -> purchase, each stage's timestamp =
    // first qualifying event at/after the prior stage. Three conditional
    // min-aggregates chained by key joins (all on the same user_id
    // partitioning), never an event-log self-join.
    Q("ev_funnel", Some("""
      WITH s1 AS (
        SELECT user_id, min(ts) AS t_signup FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts >= s1.t_signup
        GROUP BY e.user_id),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t_click
        GROUP BY e.user_id)
      SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
        CASE WHEN s3.t_purchase IS NOT NULL THEN 3
             WHEN s2.t_click IS NOT NULL THEN 2 ELSE 1 END AS stage
      FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
              LEFT JOIN s3 ON s1.user_id = s3.user_id
      ORDER BY s1.user_id""")) { (s, dir) =>
      val ev = t(s, dir, "events")
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t_signup"))
      val s2 = ev.filter(col("event_type") === "click").as("e")
        .join(s1, "user_id")
        .filter(col("e.ts") >= col("t_signup"))
        .groupBy("user_id").agg(min(col("e.ts")).as("t_click"))
      val s3 = ev.filter(col("event_type") === "purchase").as("e")
        .join(s2, "user_id")
        .filter(col("e.ts") >= col("t_click"))
        .groupBy("user_id").agg(min(col("e.ts")).as("t_purchase"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .withColumn("stage",
          when(col("t_purchase").isNotNull, 3)
            .when(col("t_click").isNotNull, 2).otherwise(1))
        .select("user_id", "t_signup", "t_click", "t_purchase", "stage")
        .orderBy("user_id")
    },

    // weekly retention cohorts: users bucketed by first-seen week, counted
    // in each later week they were active. Two aggregates (first-seen, then
    // cohort x week), both hash aggregates over compact keys.
    Q("ev_retention", Some("""
      WITH first_seen AS (
        SELECT user_id, CAST(floor(min(epoch(ts)) / 604800) AS BIGINT) AS cohort_week
        FROM events GROUP BY user_id),
      active AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
          CAST(floor(epoch(e.ts) / 604800) AS BIGINT) AS active_week
        FROM events e JOIN first_seen f ON e.user_id = f.user_id)
      SELECT cohort_week, active_week - cohort_week AS week_offset,
        count(*) AS n_users
      FROM active GROUP BY cohort_week, week_offset
      ORDER BY cohort_week, week_offset""")) { (s, dir) =>
      val ev = t(s, dir, "events")
      val firstSeen = ev.groupBy("user_id")
        .agg((floor(min(unix_timestamp(col("ts"))) / 604800L)).cast("long").as("cohort_week"))
      // SafeOps.distinctRows: this dedup is an internal step the counted
      // output depends on, not the op's tested semantics (see SafeOps doc)
      val active = SafeOps.distinctRows(ev.join(firstSeen, "user_id")
        .select(col("user_id"), col("cohort_week"),
          floor(unix_timestamp(col("ts")) / 604800L).cast("long").as("active_week")))
      active
        .groupBy(col("cohort_week"), (col("active_week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },

    // DAU/WAU engagement: daily and weekly active counts plus the
    // stickiness ratio — exact integer counts, one division at the end
    Q("ev_dau_wau", Some("""
      WITH dau AS (
        SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau
        FROM events GROUP BY day),
      wau AS (
        SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT) AS week,
          count(DISTINCT user_id) AS wau
        FROM events GROUP BY week)
      SELECT CAST(d.day AS VARCHAR) AS day, d.dau, w.wau,
        round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
      FROM dau d
      JOIN wau w ON CAST(floor(epoch(CAST(d.day AS TIMESTAMP)) / 604800) AS BIGINT) = w.week
      ORDER BY day""")) { (s, dir) =>
      val ev = t(s, dir, "events")
      val dau = ev.groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = ev.groupBy(floor(unix_timestamp(col("ts")) / 604800L).cast("long").as("week"))
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau,
          floor(unix_timestamp(col("day").cast("timestamp")) / 604800L).cast("long") === col("week"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
        .orderBy("day")
    },

    // top user journeys: 3-step event-type paths via two leads over the
    // per-user total order — one shuffle on user_id, then a hash aggregate
    Q("ev_user_paths", Some("""
      WITH ordered AS (
        SELECT user_id, event_type,
          lead(event_type, 1) OVER w AS e2,
          lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
        CAST(count(*) AS BIGINT) AS n
      FROM ordered WHERE e3 IS NOT NULL
      GROUP BY path ORDER BY n DESC, path LIMIT 10""")) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_type"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e3").isNotNull)
        .select(concat_ws(" > ", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(10)
    },

    // time-weighted average value per user (LOCF integral): exact
    // cents x micros products summed as BIGINT, one division at the end
    Q("ev_time_weighted_avg", Some("""
      WITH seq AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
          epoch_us(CAST(ts AS TIMESTAMP)) AS t,
          lead(epoch_us(CAST(ts AS TIMESTAMP)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t_next
        FROM events)
      SELECT user_id,
        CAST(sum(cents * (t_next - t)) AS BIGINT) AS weighted,
        CAST(max(t) - min(t) AS BIGINT) AS span_us,
        round(CAST(sum(cents * (t_next - t)) AS DOUBLE)
          / (max(t) - min(t)) / 100, 6) AS twa
      FROM seq GROUP BY user_id HAVING count(*) > 1
      ORDER BY user_id""")) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"),
          // ts surfaces as NTZ (stored-column shape); unix_micros takes
          // session-tz timestamps only — under the UTC session the cast
          // preserves the stored micros exactly
          unix_micros(col("ts").cast("timestamp")).as("t"))
        .withColumn("t_next", lead(col("t"), 1).over(w))
        .groupBy("user_id")
        .agg(sum(col("cents") * (col("t_next") - col("t"))).as("weighted"),
          (max(col("t")) - min(col("t"))).as("span_us"),
          count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .select(col("user_id"), col("weighted"), col("span_us"),
          round(col("weighted").cast("double") / col("span_us") / 100, 6).as("twa"))
        .orderBy("user_id")
    },

    // z-score anomaly flagging per event type, decided entirely in integer
    // arithmetic: |x-mu| > 2*sigma_pop <=> (n*x - sx)^2 > 4*(n*sxx - sx^2)
    // on exact cents — no float compare, so the flag set is engine-invariant.
    // (Integer headroom: |n*x| < 2^63 up to ~1e5 rows/group at these value
    // ranges; beyond that the power sums upcast to sum128/DECIMAL.)
    Q("ev_anomaly", Some("""
      WITH c AS (
        SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      m AS (
        SELECT event_type, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sx,
          CAST(sum(cents * cents) AS BIGINT) AS sxx
        FROM c GROUP BY event_type)
      SELECT c.event_id, c.event_type, c.cents,
        round(CAST(m.sx AS DOUBLE) / m.n / 100, 6) AS mean_val
      FROM c JOIN m USING (event_type)
      WHERE (m.n * c.cents - m.sx) * (m.n * c.cents - m.sx)
          > 4 * (m.n * m.sxx - m.sx * m.sx)
      ORDER BY c.event_id""")) { (s, dir) =>
      val c = t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      val m = c.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
          sum(col("cents") * col("cents")).as("sxx"))
      val dev = col("n") * col("cents") - col("sx")
      c.join(broadcast(m), Seq("event_type"))
        .filter(dev * dev > lit(4) * (col("n") * col("sxx") - col("sx") * col("sx")))
        .select(col("event_id"), col("event_type"), col("cents"),
          round(col("sx").cast("double") / col("n") / 100, 6).as("mean_val"))
        .orderBy("event_id")
    },

    // fixed-width value histogram: bucket index computed scan-side on exact
    // cents (one hash aggregate; the shape of every distribution dashboard)
    Q("ev_histogram", Some("""
      SELECT event_type,
        CAST(floor(CAST(round(value * 100) AS BIGINT) / 200) AS BIGINT) AS bucket,
        count(*) AS n
      FROM events GROUP BY event_type, bucket
      ORDER BY event_type, bucket""")) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"),
          floor(cents(col("value")) / 200).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bucket")
    },

    // time-series gap fill with LOCF (last observation carried forward):
    // build the dense (user x day) grid — the grid is generated scan-side
    // and the small dimension broadcast — left-join sparse observations,
    // then one window pass carries values forward. The standard resample
    // shape for ML feature tables.
    Q("ev_gap_fill", Some("""
      WITH obs AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
        FROM events WHERE event_type = 'purchase' AND user_id < 10
        GROUP BY user_id, day),
      days AS (
        SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
          INTERVAL 1 DAY)) AS DATE) AS day),
      grid AS (SELECT u.user_id, d.day
        FROM (SELECT DISTINCT user_id FROM obs) u CROSS JOIN days d),
      joined AS (
        SELECT g.user_id, g.day, o.day_cents FROM grid g
        LEFT JOIN obs o ON o.user_id = g.user_id AND o.day = g.day),
      filled AS (
        SELECT user_id, day, day_cents,
          last_value(day_cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_cents
        FROM joined)
      SELECT user_id, CAST(day AS VARCHAR) AS day, day_cents IS NOT NULL AS observed,
        round(CAST(coalesce(locf_cents, 0) AS DOUBLE) / 100, 2) AS value_locf
      FROM filled ORDER BY user_id, day""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val obs = t(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("user_id") < 10)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("day_cents"))
      val days = s.range(1).select(explode(expr(
        "sequence(to_date('2024-01-01'), to_date('2024-01-30'), interval 1 day)")).as("day"))
      val grid = SafeOps.distinctRows(obs.select("user_id")).crossJoin(broadcast(days))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "day"), "left")
        .withColumn("locf_cents", last(col("day_cents"), ignoreNulls = true).over(w))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("day_cents").isNotNull.as("observed"),
          round(coalesce(col("locf_cents"), lit(0L)).cast("double") / 100, 2).as("value_locf"))
        .orderBy("user_id", "day")
    },

    // hopping (sliding) window aggregate: 1-hour windows every 15 minutes —
    // each event lands in 4 windows, generated scan-side and exploded, then
    // one hash aggregate (the batch form of Spark's window(ts, '1 hour',
    // '15 minutes') streaming aggregation)
    Q("ev_hopping_window", Some("""
      WITH expanded AS (
        SELECT e.event_type, CAST(round(e.value * 100) AS BIGINT) AS cents,
          CAST(to_timestamp(CAST(floor(epoch(e.ts) / 900) AS BIGINT) * 900 - g.off) AS TIMESTAMP) AS w_start
        FROM events e,
          (SELECT unnest([0, 900, 1800, 2700]) AS off) g
        WHERE epoch(e.ts) >= CAST(floor(epoch(e.ts) / 900) AS BIGINT) * 900 - g.off
          AND epoch(e.ts) < CAST(floor(epoch(e.ts) / 900) AS BIGINT) * 900 - g.off + 3600)
      SELECT w_start, event_type, count(*) AS n,
        round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS total_value
      FROM expanded
      WHERE w_start >= TIMESTAMP '2024-01-05 00:00:00'
        AND w_start < TIMESTAMP '2024-01-06 00:00:00'
      GROUP BY w_start, event_type
      ORDER BY w_start, event_type""")) { (s, dir) =>
      val ev = t(s, dir, "events")
        .withColumn("cents", cents(col("value")))
        .withColumn("base", (floor(unix_timestamp(col("ts")) / 900L) * 900).cast("long"))
        .withColumn("off", explode(typedLit(Seq(0L, 900L, 1800L, 2700L))))
        .withColumn("w_start_s", col("base") - col("off"))
        .filter(unix_timestamp(col("ts")) >= col("w_start_s")
          && unix_timestamp(col("ts")) < col("w_start_s") + 3600)
        .withColumn("w_start", to_timestamp(col("w_start_s")))
      ev.filter(col("w_start") >= lit("2024-01-05 00:00:00").cast("timestamp")
          && col("w_start") < lit("2024-01-06 00:00:00").cast("timestamp"))
        .groupBy("w_start", "event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("cents")).cast("double") / 100, 2).as("total_value"))
        .orderBy("w_start", "event_type")
    }
  )
}
