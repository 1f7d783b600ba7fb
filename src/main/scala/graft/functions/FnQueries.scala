package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries exercising the PG-compat function shim layer (SURVEY.md §2.C) and
  * the pg_catalog / information_schema emulation (§2.B), each against a
  * DuckDB oracle. SQL form on the Spark side wherever the shim itself is
  * SQL-facing (that is the surface BemiDB clients hit).
  */
object FnQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  val defs: Seq[Q] = Seq(

    // ---- constant/stub shims -------------------------------------------
    Q("fn_pg_shims", Some("""
      SELECT 'PostgreSQL 17.0, compiled by BemiDB' AS v, '17.0' AS sv,
             0 AS pid, false AS in_recovery, 'graft' AS owner,
             true AS can_connect, 'pg_catalog,public' AS schemas,
             '{' || chr(10) || '    "b": [' || chr(10) || '        1,'
               || chr(10) || '        2' || chr(10) || '    ],' || chr(10)
               || '    "a": "x"' || chr(10) || '}' AS pretty
      """)) { (s, dir) =>
      s.sql("""
        SELECT version() AS v, current_setting('server_version') AS sv,
               pg_backend_pid() AS pid, pg_is_in_recovery() AS in_recovery,
               pg_get_userbyid(10) AS owner,
               has_database_privilege('graft', 'graft', 'CONNECT') AS can_connect,
               array_join(current_schemas(true), ',') AS schemas,
               jsonb_pretty('{"b":[1,2],"a":"x"}') AS pretty""")
    },

    // age(ts, ts): calendar-aware interval text with PG's borrow rules —
    // the VALUES rows pin month-length borrowing (Jan vs Feb-leap), exact
    // negation, pluralization, fraction trimming, and the all-zero form
    Q("fn_age", Some("""
      SELECT i, age(a, b)::varchar AS ag FROM (VALUES
        (1, TIMESTAMP '2024-03-01 00:00:00', TIMESTAMP '2024-01-15 00:00:00'),
        (2, TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-03-01 00:00:00'),
        (3, TIMESTAMP '2024-03-30 14:30:15', TIMESTAMP '2024-01-31 10:00:00'),
        (4, TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00'),
        (5, TIMESTAMP '2025-07-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00'),
        (6, TIMESTAMP '2024-02-29 00:00:00', TIMESTAMP '2023-02-28 00:00:00'),
        (7, TIMESTAMP '2024-01-01 00:00:00.123', TIMESTAMP '2024-01-01 00:00:00'),
        (8, TIMESTAMP '2024-03-01 00:00:01', TIMESTAMP '2024-02-29 23:59:00'),
        (9, TIMESTAMP '2024-06-15 10:00:00', TIMESTAMP '2023-06-15 11:30:00')
      ) t(i, a, b) ORDER BY i""")) { (s, dir) =>
      s.sql("""
        SELECT i, age(a, b) AS ag FROM VALUES
          (1, TIMESTAMP_NTZ '2024-03-01 00:00:00', TIMESTAMP_NTZ '2024-01-15 00:00:00'),
          (2, TIMESTAMP_NTZ '2024-01-15 00:00:00', TIMESTAMP_NTZ '2024-03-01 00:00:00'),
          (3, TIMESTAMP_NTZ '2024-03-30 14:30:15', TIMESTAMP_NTZ '2024-01-31 10:00:00'),
          (4, TIMESTAMP_NTZ '2024-01-01 00:00:00', TIMESTAMP_NTZ '2024-01-01 00:00:00'),
          (5, TIMESTAMP_NTZ '2025-07-01 00:00:00', TIMESTAMP_NTZ '2024-01-01 00:00:00'),
          (6, TIMESTAMP_NTZ '2024-02-29 00:00:00', TIMESTAMP_NTZ '2023-02-28 00:00:00'),
          (7, TIMESTAMP_NTZ '2024-01-01 00:00:00.123', TIMESTAMP_NTZ '2024-01-01 00:00:00'),
          (8, TIMESTAMP_NTZ '2024-03-01 00:00:01', TIMESTAMP_NTZ '2024-02-29 23:59:00'),
          (9, TIMESTAMP_NTZ '2024-06-15 10:00:00', TIMESTAMP_NTZ '2023-06-15 11:30:00')
        AS t(i, a, b) ORDER BY i""")
    },

    Q("fn_quote_ident", Some("""
      SELECT '"' || replace(n_name, '"', '""') || '"' AS qname FROM nation ORDER BY qname""")) { (s, dir) =>
      s.sql("SELECT quote_ident(n_name) AS qname FROM nation ORDER BY qname")
    },

    Q("fn_format", Some("""
      SELECT printf('%s has key %d', r_name, r_regionkey) AS msg,
             printf('%2$s-%1$s', r_name, CAST(r_regionkey AS VARCHAR)) AS positional
      FROM region ORDER BY msg""")) { (s, dir) =>
      s.sql("""
        SELECT pg_format('%s has key %d', r_name, r_regionkey) AS msg,
               pg_format('%2$s-%1$s', r_name, CAST(r_regionkey AS STRING)) AS positional
        FROM region ORDER BY msg""")
    },

    Q("fn_to_char", Some("""
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
             strftime(o_orderdate, '%d %b %Y %H:%M:%S') AS pretty
      FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""")) { (s, dir) =>
      s.sql("""
        SELECT o_orderkey, to_char(o_orderdate, 'YYYY-MM-DD') AS iso_day,
               to_char(o_orderdate, 'DD Mon YYYY HH24:MI:SS') AS pretty
        FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""")
    },

    // encode(sha256(x),'hex') -> sha2(x,256) (reference AST rewrite,
    // parser_function.go:111-137); md5 passthrough
    Q("fn_hash", Some("""
      SELECT c_custkey, sha256(c_name) AS name_sha, md5(c_name) AS name_md5
      FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""")) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_custkey") < 100)
        .select(col("c_custkey"), sha2(col("c_name"), 256).as("name_sha"),
          md5(col("c_name")).as("name_md5"))
        .orderBy("c_custkey")
    },

    // ---- JSON operator mapping (parser_a_expr.go:29-77) -----------------
    Q("fn_json_ops", Some("""
      SELECT event_id, json_extract_string(props, '$.k') AS k_text,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
             json_extract(props, '$.k') IS NOT NULL AS has_k
      FROM events WHERE event_id < 500 ORDER BY event_id""")) { (s, dir) =>
      t(s, dir, "events").filter(col("event_id") < 500)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_text"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"),
          get_json_object(col("props"), "$.k").isNotNull.as("has_k"))
        .orderBy("event_id")
    },

    Q("fn_json_path_text", Some("""
      SELECT event_id, json_extract_string(props, '$.k') AS k
      FROM events WHERE event_id < 200 ORDER BY event_id""")) { (s, dir) =>
      s.sql("""
        SELECT event_id, jsonb_extract_path_text(props, 'k') AS k
        FROM events WHERE event_id < 200 ORDER BY event_id""")
    },

    Q("fn_jsonb_agg", Some("""
      SELECT event_type,
        to_json(list(CAST(json_extract_string(props, '$.k') AS INT) ORDER BY CAST(json_extract_string(props, '$.k') AS INT), event_id)) AS ks
      FROM events GROUP BY event_type ORDER BY event_type""")) { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(to_json(expr("transform(array_sort(collect_list(struct(k, event_id))), x -> x.k)")).as("ks"))
        .orderBy("event_type")
    },

    Q("fn_jsonb_object_agg", Some("""
      SELECT to_json(map(list(event_type ORDER BY event_type), list(n ORDER BY event_type))) AS by_type
      FROM (SELECT event_type, count(*) AS n FROM events GROUP BY event_type) t""")) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .agg(to_json(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n"))))))
          .as("by_type"))
    },

    Q("fn_json_build_object", Some("""
      SELECT to_json({'key': CAST(n_nationkey AS VARCHAR), 'name': n_name}) AS obj
      FROM nation ORDER BY obj""")) { (s, dir) =>
      // json_build_object output is Go-marshal-normalized (sorted keys,
      // like the reference's NullJson rendering), so the oracle struct is
      // written in sorted key order
      s.sql("""
        SELECT json_build_object('name', n_name, 'key', CAST(n_nationkey AS STRING)) AS obj
        FROM nation ORDER BY obj""")
    },

    Q("fn_json_array_elements", Some("""
      SELECT event_type, unnest(CAST(json_extract(js, '$[*]') AS VARCHAR[])) AS elem
      FROM (SELECT event_type,
              to_json(list(CAST(json_extract_string(props, '$.k') AS INT)
                ORDER BY CAST(json_extract_string(props, '$.k') AS INT), event_id)) AS js
            FROM events GROUP BY event_type) t
      ORDER BY event_type, elem""")) { (s, dir) =>
      s.sql("""
        SELECT event_type, json_array_elements(js) AS elem
        FROM (SELECT event_type,
                to_json(transform(array_sort(collect_list(struct(
                  CAST(get_json_object(props, '$.k') AS INT) AS k, event_id))),
                  x -> x.k)) AS js
              FROM events GROUP BY event_type) t
        ORDER BY event_type, elem""")
    },

    // approximate sketches (HLL count-distinct, quantile sketch): raw sketch
    // values differ across engines, so the gated row carries the EXACT
    // counts plus error-bound booleans — Spark computes |approx - exact| /
    // exact < 5% and percentile-rank containment, the oracle expects true.
    // The row hash-matches iff every sketch lands inside its bound.
    Q("fn_approx_sketches", Some("""
      SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             true AS approx_parts_ok, true AS approx_orders_ok,
             true AS p50_ok, true AS p90_ok, true AS p99_ok
      FROM lineitem""")) { (s, dir) =>
      t(s, dir, "lineitem")
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          // rsd 0.01: the default 0.05 sketch leaves no headroom against a
          // 5% assertion bound (observed 5.2% on l_orderkey at sf0.001)
          (abs(approx_count_distinct(col("l_partkey"), 0.01) - countDistinct(col("l_partkey")))
            .cast("double") / countDistinct(col("l_partkey")) < 0.05).as("approx_parts_ok"),
          (abs(approx_count_distinct(col("l_orderkey"), 0.01) - countDistinct(col("l_orderkey")))
            .cast("double") / countDistinct(col("l_orderkey")) < 0.05).as("approx_orders_ok"),
          expr("approx_percentile(l_extendedprice, 0.5) BETWEEN " +
            "percentile(l_extendedprice, 0.45) AND percentile(l_extendedprice, 0.55)")
            .as("p50_ok"),
          expr("approx_percentile(l_extendedprice, 0.9) BETWEEN " +
            "percentile(l_extendedprice, 0.85) AND percentile(l_extendedprice, 0.95)")
            .as("p90_ok"),
          expr("approx_percentile(l_extendedprice, 0.99) BETWEEN " +
            "percentile(l_extendedprice, 0.97) AND percentile(l_extendedprice, 1.0)")
            .as("p99_ok"))
    },

    // row_to_json(record) -> to_json(struct) (macro at
    // query_remapper_function.go:34)
    Q("fn_row_to_json", Some("""
      SELECT to_json({'r_regionkey': r_regionkey, 'r_name': r_name}) AS row_json
      FROM region ORDER BY row_json""")) { (s, dir) =>
      s.sql("""
        SELECT row_to_json(struct(r_regionkey, r_name)) AS row_json
        FROM region ORDER BY row_json""")
    },

    // datetime constructors (PG make_date/make_timestamp; both engines
    // build identical instants from integer fields)
    Q("fn_make_datetime", Some("""
      SELECT o_orderkey,
        CAST(make_date(CAST(extract(year FROM o_orderdate) AS INT),
                  CAST(extract(month FROM o_orderdate) AS INT), 1) AS VARCHAR) AS month_start,
        CAST(make_timestamp(CAST(extract(year FROM o_orderdate) AS BIGINT),
                  CAST(extract(month FROM o_orderdate) AS BIGINT), 15, 12, 0, 0.0)
             AS TIMESTAMP) AS mid_month_noon,
        CAST(date_diff('day', make_date(CAST(extract(year FROM o_orderdate) AS INT),
                  CAST(extract(month FROM o_orderdate) AS INT), 1),
             CAST(o_orderdate AS DATE)) AS INT) AS day_offset
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""")) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          expr("CAST(make_date(year(o_orderdate), month(o_orderdate), 1) AS STRING)")
            .as("month_start"),
          expr("make_timestamp_ntz(year(o_orderdate), month(o_orderdate), 15, 12, 0, 0)")
            .as("mid_month_noon"),
          datediff(to_date(col("o_orderdate")),
            expr("make_date(year(o_orderdate), month(o_orderdate), 1)")).as("day_offset"))
        .orderBy("o_orderkey")
    },

    // ---- strings --------------------------------------------------------
    Q("fn_string_suite", Some("""
      SELECT c_custkey, upper(c_name) AS uname, lower(c_name) AS lname,
        substr(c_name, 10, 5) AS mid, length(c_name) AS len,
        replace(c_name, 'Customer', 'C') AS repl,
        lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS padded,
        left(c_name, 8) AS l8, right(c_name, 3) AS r3, reverse(c_name) AS rev,
        concat_ws('|', c_name, c_mktsegment) AS joined,
        CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        split_part(c_name, '#', 2) AS num_part,
        trim(BOTH '0' FROM split_part(c_name, '#', 2)) AS trimmed
      FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""")) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_custkey") < 300)
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"), lower(col("c_name")).as("lname"),
          substring(col("c_name"), 10, 5).as("mid"), length(col("c_name")).as("len"),
          regexp_replace(col("c_name"), "Customer", "C").as("repl"),
          lpad(col("c_custkey").cast("string"), 6, "0").as("padded"),
          expr("left(c_name, 8)").as("l8"), expr("right(c_name, 3)").as("r3"),
          reverse(col("c_name")).as("rev"),
          concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
          instr(col("c_name"), "#").cast("long").as("hash_pos"),
          expr("split_part(c_name, '#', 2)").as("num_part"),
          expr("trim(BOTH '0' FROM split_part(c_name, '#', 2))").as("trimmed"))
        .orderBy("c_custkey")
    },

    // PG ~ operator (passthrough in reference, parser_a_expr.go:156-167)
    Q("fn_regexp_suite", Some("""
      SELECT n_name, regexp_matches(n_name, '^NATION_[0-9]+$') AS is_match,
        regexp_replace(n_name, '[0-9]', '#', 'g') AS masked,
        regexp_extract(n_name, 'NATION_([0-9]+)', 1) AS num
      FROM nation ORDER BY n_name""")) { (s, dir) =>
      t(s, dir, "nation")
        .select(col("n_name"),
          col("n_name").rlike("^NATION_[0-9]+$").as("is_match"),
          regexp_replace(col("n_name"), "[0-9]", "#").as("masked"),
          regexp_extract(col("n_name"), "NATION_([0-9]+)", 1).as("num"))
        .orderBy("n_name")
    },

    // ---- date/time ------------------------------------------------------
    Q("fn_date_suite", Some("""
      SELECT o_orderkey,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS year_start,
        CAST(extract(year FROM o_orderdate) AS INT) AS yr,
        CAST(extract(month FROM o_orderdate) AS INT) AS mon,
        CAST(extract(day FROM o_orderdate) AS INT) AS dom,
        CAST(extract(dow FROM o_orderdate) AS INT) AS dow,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        o_orderdate + INTERVAL 30 DAY AS plus_30d,
        CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since
      FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""")) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_trunc("year", col("o_orderdate")).as("year_start"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"),
          dayofmonth(col("o_orderdate")).as("dom"),
          expr("pg_dow(o_orderdate)").as("dow"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus_30d"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since"))
        .orderBy("o_orderkey")
    },

    // separate query: DuckDB's constant folding treats INTERVAL 1 MONTH and
    // INTERVAL 30 DAY literals as equal (its interval comparator considers
    // 1 mon == 30 days), silently merging them via CSE when both appear in
    // one SELECT — so month arithmetic gets its own query.
    Q("fn_month_add", Some("""
      SELECT o_orderkey, o_orderdate + INTERVAL 1 MONTH AS plus_1mo
      FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""")) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 1 MONTH")).as("plus_1mo"))
        .orderBy("o_orderkey")
    },

    // ---- math -----------------------------------------------------------
    Q("fn_math_suite", Some("""
      SELECT c_custkey, abs(c_acctbal) AS abs_bal,
        CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
        CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
        CAST(c_custkey % 7 AS BIGINT) AS mod7,
        sqrt(abs(c_acctbal)) AS sqrt_bal,
        round(c_acctbal, 1) AS bal_1dp,
        CAST(sign(c_acctbal) AS DOUBLE) AS sgn,
        power(2.0, 10.0) AS p2
      FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""")) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_custkey") < 300)
        .select(col("c_custkey"), abs(col("c_acctbal")).as("abs_bal"),
          ceil(col("c_acctbal")).as("ceil_bal"),
          floor(col("c_acctbal")).as("floor_bal"),
          (col("c_custkey") % 7).as("mod7"),
          sqrt(abs(col("c_acctbal"))).as("sqrt_bal"),
          round(col("c_acctbal"), 1).as("bal_1dp"),
          signum(col("c_acctbal")).as("sgn"),
          pow(lit(2.0), lit(10.0)).as("p2"))
        .orderBy("c_custkey")
    },

    Q("fn_least_greatest", Some("""
      SELECT c_custkey, least(c_acctbal, 5000.0) AS capped,
             greatest(c_acctbal, 0.0) AS floored,
             coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg
      FROM customer ORDER BY c_custkey""")) { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          least(col("c_acctbal"), lit(5000.0)).as("capped"),
          greatest(col("c_acctbal"), lit(0.0)).as("floored"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"))
        .orderBy("c_custkey")
    },

    // second to_char batch: quarter, "quoted literals", FM no-pad day
    // names, 12-hour clock with meridiem
    Q("fn_to_char2", Some("""
      SELECT o_orderkey,
        strftime(o_orderdate, '%Y ') || 'Q' || CAST(quarter(o_orderdate) AS VARCHAR) AS yq,
        strftime(o_orderdate, '%A') AS dayname,
        strftime(o_orderdate, '%I:%M %p') AS clock12
      FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""")) { (s, dir) =>
      s.sql("""
        SELECT o_orderkey,
          to_char(o_orderdate, 'YYYY "Q"Q') AS yq,
          to_char(o_orderdate, 'FMDay') AS dayname,
          to_char(o_orderdate, 'HH:MI AM') AS clock12
        FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""")
    },

    // to_date/to_timestamp with PG patterns (round-trip through to_char)
    Q("fn_to_date", Some("""
      SELECT o_orderkey,
        CAST(CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS DATE)
          AS VARCHAR) AS rt_day,
        CAST(CAST(strptime('2024-01-15 10:30:00', '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)
          AS VARCHAR) AS fixed_ts
      FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""")) { (s, dir) =>
      s.sql("""
        SELECT o_orderkey,
          CAST(to_date(to_char(o_orderdate, 'DD/MM/YYYY'), 'DD/MM/YYYY') AS STRING) AS rt_day,
          CAST(to_timestamp('2024-01-15 10:30:00', 'YYYY-MM-DD HH24:MI:SS') AS STRING) AS fixed_ts
        FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""")
    },

    // arg-extrema aggregates: Spark max_by/min_by == DuckDB arg_max/arg_min;
    // the ordering key (event_id) is unique so ties cannot occur
    Q("fn_arg_minmax", Some("""
      SELECT event_type,
        arg_max(CAST(round(value * 100) AS BIGINT), event_id) AS last_cents,
        arg_min(CAST(round(value * 100) AS BIGINT), event_id) AS first_cents,
        arg_max(user_id, event_id) AS last_user
      FROM events GROUP BY event_type ORDER BY event_type""")) { (s, dir) =>
      s.sql("""
        SELECT event_type,
          max_by(CAST(round(value * 100) AS BIGINT), event_id) AS last_cents,
          min_by(CAST(round(value * 100) AS BIGINT), event_id) AS first_cents,
          max_by(user_id, event_id) AS last_user
        FROM events GROUP BY event_type ORDER BY event_type""")
    },

    // width_bucket over the acctbal distribution — oracle replicates Spark's
    // exact op order (n*(x-lo) then /(hi-lo), trunc) so doubles bit-match
    Q("fn_width_bucket", Some("""
      SELECT c_custkey,
        CASE WHEN c_acctbal < CAST(-1000.0 AS DOUBLE) THEN 0
             WHEN c_acctbal >= CAST(10000.0 AS DOUBLE) THEN 12
             ELSE CAST(trunc(CAST(11 AS DOUBLE) * (c_acctbal - CAST(-1000.0 AS DOUBLE))
                  / (CAST(10000.0 AS DOUBLE) - CAST(-1000.0 AS DOUBLE))) AS BIGINT) + 1
        END AS wb
      FROM customer ORDER BY c_custkey""")) { (s, dir) =>
      s.sql("""
        SELECT c_custkey, width_bucket(c_acctbal, -1000.0D, 10000.0D, 11) AS wb
        FROM customer ORDER BY c_custkey""")
    },

    // ANSI OVERLAY ... PLACING (PG string splice) — Spark parses the PG form
    Q("fn_overlay", Some("""
      SELECT p_partkey,
        substr(p_name, 1, 2) || '###' || substr(p_name, 5) AS spliced,
        substr(p_name, 1, 3) || '[' || p_brand || ']' || substr(p_name, 4) AS inserted
      FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""")) { (s, dir) =>
      s.sql("""
        SELECT p_partkey,
          overlay(p_name PLACING '###' FROM 3 FOR 2) AS spliced,
          overlay(p_name PLACING '[' || p_brand || ']' FROM 4 FOR 0) AS inserted
        FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""")
    },

    // date_bin (PG 14) origin-anchored buckets == DuckDB time_bucket; origin
    // predates the data so truncating division equals flooring on both sides
    Q("fn_date_bin", Some("""
      SELECT CAST(time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP),
               TIMESTAMP '2000-01-01 00:00:00') AS VARCHAR) AS bucket,
        CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY bucket ORDER BY bucket""")) { (s, dir) =>
      s.sql("""
        SELECT CAST(date_bin(INTERVAL '15' MINUTE, ts,
                 TIMESTAMP '2000-01-01 00:00:00') AS STRING) AS bucket,
          count(*) AS n
        FROM events GROUP BY bucket ORDER BY bucket""")
    },

    // num_nulls / num_nonnulls variadic null counters (nulls synthesized
    // deterministically with nullif)
    Q("fn_num_nulls", Some("""
      SELECT event_id,
        (CASE WHEN nullif(event_type, 'click') IS NULL THEN 1 ELSE 0 END
         + CASE WHEN nullif(user_id, 0) IS NULL THEN 1 ELSE 0 END
         + CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS nn,
        (CASE WHEN nullif(event_type, 'click') IS NOT NULL THEN 1 ELSE 0 END
         + CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS nnn
      FROM events WHERE event_id < 500 ORDER BY event_id""")) { (s, dir) =>
      s.sql("""
        SELECT event_id,
          num_nulls(nullif(event_type, 'click'), nullif(user_id, 0), props) AS nn,
          num_nonnulls(nullif(event_type, 'click'), props) AS nnn
        FROM events WHERE event_id < 500 ORDER BY event_id""")
    },

    // IS [NOT] DISTINCT FROM null-safe comparison (both engines native)
    Q("fn_null_safe", Some("""
      SELECT event_id,
        nullif(event_type, 'click') IS DISTINCT FROM nullif(event_type, 'view') AS d,
        nullif(event_type, 'click') IS NOT DISTINCT FROM NULL AS was_click
      FROM events WHERE event_id < 500 ORDER BY event_id""")) { (s, dir) =>
      s.sql("""
        SELECT event_id,
          nullif(event_type, 'click') IS DISTINCT FROM nullif(event_type, 'view') AS d,
          nullif(event_type, 'click') IS NOT DISTINCT FROM NULL AS was_click
        FROM events WHERE event_id < 500 ORDER BY event_id""")
    },

    // ---- arrays (SURVEY §2.B array ops row) -----------------------------
    // head3 emitted as fixed-point micros text (floor, not round: floor of a
    // double is unambiguous across engines) — the driver comparator sorts by
    // every output column so arrays can't appear in results.
    Q("fn_array_ops", Some("""
      SELECT vec_id, list_contains(embedding, embedding[1]) AS has_first,
        len(embedding) AS n_dims,
        CAST(list_position(embedding, embedding[1]) AS BIGINT) AS first_pos,
        embedding[1] AS first_val,
        array_to_string(list_transform(list_slice(embedding, 1, 3),
          x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ',') AS head3
      FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""")) { (s, dir) =>
      t(s, dir, "embeddings").filter(col("vec_id") < 5)
        .select(col("vec_id"),
          array_contains(col("embedding"), element_at(col("embedding"), 1)).as("has_first"),
          size(col("embedding")).as("n_dims"),
          array_position(col("embedding"), element_at(col("embedding"), 1)).as("first_pos"),
          element_at(col("embedding"), 1).as("first_val"),
          array_join(transform(slice(col("embedding"), 1, 3),
            x => floor(x.cast("double") * 1000000).cast("long").cast("string")), ",").as("head3"))
        .orderBy("vec_id")
    },

    // second array batch: append/prepend/flatten/remove/reverse/dedup-sort,
    // all serialized to JSON text for the comparator
    Q("fn_array_ops2", Some("""
      SELECT n_nationkey,
        CAST(to_json(list_append([n_nationkey, n_regionkey], 99)) AS VARCHAR) AS appended,
        CAST(to_json(list_prepend(-1, [n_nationkey, n_regionkey])) AS VARCHAR) AS prepended,
        CAST(to_json(flatten([[n_nationkey], [n_regionkey, n_regionkey]])) AS VARCHAR) AS flat,
        CAST(to_json(list_filter([n_nationkey, n_regionkey, n_nationkey],
          x -> x <> n_regionkey)) AS VARCHAR) AS removed,
        CAST(to_json(list_reverse([n_nationkey, n_regionkey, 7])) AS VARCHAR) AS rev,
        CAST(to_json(list_sort(list_distinct([n_regionkey, n_nationkey, n_regionkey])))
          AS VARCHAR) AS uniq_sorted
      FROM nation ORDER BY n_nationkey""")) { (s, dir) =>
      t(s, dir, "nation").select(col("n_nationkey"),
          to_json(expr("array_append(array(n_nationkey, n_regionkey), 99)")).as("appended"),
          to_json(expr("array_prepend(array(n_nationkey, n_regionkey), -1)")).as("prepended"),
          to_json(flatten(expr("array(array(n_nationkey), array(n_regionkey, n_regionkey))"))).as("flat"),
          to_json(expr("filter(array(n_nationkey, n_regionkey, n_nationkey), x -> x != n_regionkey)")).as("removed"),
          to_json(reverse(expr("array(n_nationkey, n_regionkey, 7)"))).as("rev"),
          to_json(array_sort(array_distinct(expr("array(n_regionkey, n_nationkey, n_regionkey)")))).as("uniq_sorted"))
        .orderBy("n_nationkey")
    },

    // map construction + JSON serialization (same text format both engines)
    Q("fn_map_ops", Some("""
      SELECT r_regionkey,
        CAST(to_json(MAP {'key': r_regionkey, 'double': r_regionkey * 2}) AS VARCHAR) AS m
      FROM region ORDER BY r_regionkey""")) { (s, dir) =>
      t(s, dir, "region")
        .select(col("r_regionkey"),
          to_json(map(lit("key"), col("r_regionkey"),
            lit("double"), col("r_regionkey") * 2)).as("m"))
        .orderBy("r_regionkey")
    },

    // second regex batch: capture-group extraction and match counting
    Q("fn_regexp_suite2", Some("""
      SELECT n_nationkey,
        regexp_extract(n_name, 'NATION_(\d+)', 1) AS num_part,
        CAST(len(regexp_extract_all(n_name, '[AEIOU]')) AS INT) AS n_vowels,
        regexp_replace(n_name, '(\d)', '<\1>', 'g') AS marked
      FROM nation ORDER BY n_nationkey""")) { (s, dir) =>
      t(s, dir, "nation").select(col("n_nationkey"),
          regexp_extract(col("n_name"), "NATION_(\\d+)", 1).as("num_part"),
          expr("regexp_count(n_name, '[AEIOU]')").cast("int").as("n_vowels"),
          regexp_replace(col("n_name"), "(\\d)", "<$1>").as("marked"))
        .orderBy("n_nationkey")
    },

    // array_upper -> size shim (macro at query_remapper_function.go:53-57)
    Q("fn_array_upper", Some("""
      SELECT vec_id, len(embedding) AS upper_bound
      FROM embeddings WHERE vec_id < 20 ORDER BY vec_id""")) { (s, dir) =>
      s.sql("""
        SELECT vec_id, array_upper(embedding, 1) AS upper_bound
        FROM embeddings WHERE vec_id < 20 ORDER BY vec_id""")
    },

    // second string batch: ascii/chr/repeat/translate/md5/hex round-trips
    Q("fn_string_suite2", Some("""
      SELECT n_nationkey, ascii(n_name) AS first_code,
        chr(65 + CAST(n_nationkey % 26 AS INT)) AS letter,
        repeat('ab', CAST(n_nationkey % 3 AS INT)) AS rep,
        translate(n_name, 'AEIOU', 'aeiou') AS vowelled,
        md5(n_name) AS name_md5,
        lower(hex(CAST(n_nationkey AS BIGINT))) AS key_hex
      FROM nation ORDER BY n_nationkey""")) { (s, dir) =>
      t(s, dir, "nation")
        .select(col("n_nationkey"),
          ascii(col("n_name")).as("first_code"),
          expr("chr(65 + CAST(n_nationkey % 26 AS INT))").as("letter"),
          expr("repeat('ab', CAST(n_nationkey % 3 AS INT))").as("rep"),
          translate(col("n_name"), "AEIOU", "aeiou").as("vowelled"),
          md5(col("n_name")).as("name_md5"),
          lower(hex(col("n_nationkey").cast("long"))).as("key_hex"))
        .orderBy("n_nationkey")
    },

    // overflow-safe 128-bit fixed-point sum (custom DeclarativeAggregate);
    // equals the plain BIGINT sum at this scale, keeps working past 2^63
    Q("fn_sum128", Some(s"""
      SELECT l_returnflag, CAST(sum(${Qdsl.CHARGE_O}) AS DOUBLE) AS total_micros
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(call_function("sum128", Qdsl.chargeProd).cast("double").as("total_micros"))
        .orderBy("l_returnflag")
    },

    // ---- pg_catalog emulation ------------------------------------------
    Q("cat_pg_namespace", Some("""
      SELECT CAST(2200 AS BIGINT) AS oid, 'public' AS nspname""")) { (s, dir) =>
      s.sql("SELECT oid, nspname FROM pg_namespace ORDER BY oid")
    },

    Q("cat_pg_type", Some("""
      SELECT CAST(oid AS BIGINT) AS oid, typname
      FROM (VALUES (16, 'bool'), (23, 'int4'), (25, 'text'), (114, 'json'),
                   (701, 'float8'), (1184, 'timestamptz'), (3802, 'jsonb')) t(oid, typname)
      ORDER BY oid""")) { (s, dir) =>
      s.sql("""SELECT oid, typname FROM pg_type
               WHERE typname IN ('bool','int4','text','json','float8','timestamptz','jsonb')
               ORDER BY oid""")
    },

    Q("cat_pg_class", Some("""
      SELECT relname, relkind
      FROM (VALUES ('customer'), ('documents'), ('embeddings'), ('events'),
                   ('lineitem'), ('nation'), ('orders'), ('part'), ('region'),
                   ('supplier')) t(relname), (SELECT 'r' AS relkind) k
      ORDER BY relname""")) { (s, dir) =>
      // user tables only: system catalog relations live at oid 1978+ with
      // relkind 'v' (the reference's DuckDB-catalog rows)
      s.sql("SELECT relname, relkind FROM pg_class WHERE relkind = 'r' AND oid >= 16384 ORDER BY relname")
    },

    Q("cat_pg_tables", Some("""
      SELECT 'public' AS schemaname, t AS tablename, 'graft' AS tableowner
      FROM (VALUES ('customer'), ('documents'), ('embeddings'), ('events'),
                   ('lineitem'), ('nation'), ('orders'), ('part'), ('region'),
                   ('supplier')) x(t)
      ORDER BY tablename""")) { (s, dir) =>
      s.sql("""SELECT schemaname, tablename, tableowner
               FROM pg_tables ORDER BY tablename""")
    },

    // the static shells BI tools probe on connect: each resolves and has
    // the documented shape (one UNION-ALL count probe over all of them)
    Q("cat_static_shells", Some("""
      SELECT 'pg_am' AS rel, CAST(7 AS BIGINT) AS n UNION ALL
      SELECT 'pg_collation', 1 UNION ALL
      SELECT 'pg_constraint', 0 UNION ALL
      SELECT 'pg_description', 0 UNION ALL
      SELECT 'pg_inherits', 0 UNION ALL
      SELECT 'pg_proc', 0 UNION ALL
      SELECT 'pg_shadow', 1 UNION ALL
      SELECT 'pg_views', 0
      ORDER BY rel""")) { (s, dir) =>
      s.sql("""
        SELECT 'pg_am' AS rel, count(*) AS n FROM pg_am UNION ALL
        SELECT 'pg_collation', count(*) FROM pg_collation UNION ALL
        SELECT 'pg_constraint', count(*) FROM pg_constraint UNION ALL
        SELECT 'pg_description', count(*) FROM pg_description UNION ALL
        SELECT 'pg_inherits', count(*) FROM pg_inherits UNION ALL
        SELECT 'pg_proc', count(*) FROM pg_proc UNION ALL
        SELECT 'pg_shadow', count(*) FROM pg_shadow UNION ALL
        SELECT 'pg_views', count(*) FROM pg_views
        ORDER BY rel""")
    },

    Q("cat_is_constraints", Some("""
      SELECT 'key_column_usage' AS rel, CAST(0 AS BIGINT) AS n UNION ALL
      SELECT 'referential_constraints', 0 UNION ALL
      SELECT 'table_constraints', 0
      ORDER BY rel""")) { (s, dir) =>
      s.sql("""
        SELECT 'key_column_usage' AS rel, count(*) AS n
        FROM information_schema_key_column_usage UNION ALL
        SELECT 'referential_constraints', count(*)
        FROM information_schema_referential_constraints UNION ALL
        SELECT 'table_constraints', count(*)
        FROM information_schema_table_constraints
        ORDER BY rel""")
    },

    // regexp_count (PG 15) == len(regexp_extract_all)
    Q("fn_regexp_count", Some("""
      SELECT doc_id, CAST(len(regexp_extract_all(text, 'the')) AS INT) AS n_the,
        CAST(len(regexp_extract_all(text, '[aeiou]+')) AS INT) AS vowel_runs
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      s.sql("""
        SELECT doc_id, regexp_count(text, 'the') AS n_the,
          regexp_count(text, '[aeiou]+') AS vowel_runs
        FROM documents ORDER BY doc_id""")
    },

    Q("cat_information_schema_columns", Some("""
      SELECT * FROM (VALUES
        ('nation', 'n_nationkey', 1, 'integer'),
        ('nation', 'n_name', 2, 'text'),
        ('nation', 'n_regionkey', 3, 'integer'))
        t(table_name, column_name, ordinal_position, data_type)
      ORDER BY ordinal_position""")) { (s, dir) =>
      s.sql("""
        SELECT table_name, column_name, ordinal_position, data_type
        FROM information_schema_columns WHERE table_name = 'nation'
        ORDER BY ordinal_position""")
    },

    Q("cat_information_schema_tables", Some("""
      SELECT table_name, 'BASE TABLE' AS table_type
      FROM (VALUES ('customer'), ('documents'), ('embeddings'), ('events'),
                   ('lineitem'), ('nation'), ('orders'), ('part'), ('region'),
                   ('supplier')) t(table_name)
      ORDER BY table_name""")) { (s, dir) =>
      // filtered to the testdata relations: the view is now dynamic over
      // every live session relation (matviews, ad-hoc views), so the pinned
      // 10-row oracle names its rows explicitly
      s.sql("""SELECT table_name, table_type FROM information_schema_tables
               WHERE table_name IN ('customer', 'documents', 'embeddings',
                 'events', 'lineitem', 'nation', 'orders', 'part', 'region',
                 'supplier')
               ORDER BY table_name""")
    },

    Q("cat_pg_attribute_join", Some("""
      SELECT relname, attname, attnum FROM (VALUES
        ('region', 'r_regionkey', 1), ('region', 'r_name', 2)) t(relname, attname, attnum)
      ORDER BY attnum""")) { (s, dir) =>
      s.sql("""
        SELECT relname, attname, attnum
        FROM pg_class c JOIN pg_attribute a ON a.attrelid = c.oid
        WHERE relname = 'region' ORDER BY attnum""")
    },

    Q("cat_pg_stat_user_tables", Some("""
      SELECT relname, CAST(0 AS BIGINT) AS n_live_tup
      FROM (VALUES ('customer'), ('documents'), ('embeddings'), ('events'),
                   ('lineitem'), ('nation'), ('orders'), ('part'), ('region'),
                   ('supplier')) t(relname)
      ORDER BY relname""")) { (s, dir) =>
      s.sql("SELECT relname, n_live_tup FROM pg_stat_user_tables ORDER BY relname")
    },

    Q("cat_pg_matviews_empty", Some("""
      SELECT CAST(NULL AS VARCHAR) AS matviewname WHERE 1 = 0""")) { (s, dir) =>
      s.sql("SELECT matviewname FROM pg_matviews")
    },

    Q("cat_pg_settings", Some("""
      SELECT name, setting FROM (VALUES
        ('client_encoding', 'UTF8'), ('datestyle', 'ISO, MDY'),
        ('max_connections', '100'), ('search_path', '"$user", public'),
        ('server_encoding', 'UTF8'), ('server_version', '17.0'),
        ('server_version_num', '170000'),
        ('standard_conforming_strings', 'on'), ('timezone', 'UTC'),
        ('transaction_isolation', 'read committed')) t(name, setting)
      ORDER BY name""")) { (s, dir) =>
      s.sql("SELECT name, setting FROM pg_settings ORDER BY name")
    },

    // full pg_type rowset with typed metadata columns (~180 rows, the
    // reference's query_remapper_table.go:344-712 breadth); the oracle
    // VALUES list is generated from the same PgCatalog.typeRows constant —
    // the gate validates registration, column typing and ordering
    Q("cat_pg_type_full", Some {
      val rows = PgCatalog.typeRows.map { r =>
        s"(${r.oid}, '${r.typname}', ${r.typlen}, ${r.typbyval}, " +
          s"'${r.typtype}', '${r.typcategory}', ${r.typelem}, ${r.typarray})"
      }.mkString(", ")
      s"""
      SELECT CAST(oid AS BIGINT) AS oid, typname,
        CAST(typlen AS INTEGER) AS typlen, typbyval, typtype, typcategory,
        CAST(typelem AS BIGINT) AS typelem, CAST(typarray AS BIGINT) AS typarray
      FROM (VALUES $rows)
        t(oid, typname, typlen, typbyval, typtype, typcategory, typelem, typarray)
      ORDER BY oid"""
    }) { (s, dir) =>
      s.sql("""SELECT oid, typname, typlen, typbyval, typtype, typcategory,
                      typelem, typarray
               FROM pg_type ORDER BY oid""")
    },

    Q("cat_pg_am", Some("""
      SELECT amname, amtype FROM (VALUES
        ('brin', 'i'), ('btree', 'i'), ('gin', 'i'), ('gist', 'i'),
        ('hash', 'i'), ('heap', 't'), ('spgist', 'i')) t(amname, amtype)
      ORDER BY amname""")) { (s, dir) =>
      s.sql("SELECT amname, amtype FROM pg_am ORDER BY amname")
    },

    // ANALYZE produces REAL statistics (TableStats one-job aggregate) that
    // surface through the pg_stats-shaped view; the oracle recomputes the
    // deterministic columns (null_frac, min/max; avg_width for the
    // variable-width column) from the same parquet — identical single
    // divisions of exact integer aggregates, so the hash compare is exact.
    // n_distinct is HLL-approximate by design (PG's n_distinct is an
    // estimate too) and is pinned by StatsSpec instead.
    Q("cat_pg_stats", Some("""
      SELECT attname, null_frac, name_width, min_val, max_val FROM (
        SELECT 'r_name' AS attname,
          CAST(count(*) - count(r_name) AS DOUBLE) / count(*) AS null_frac,
          CAST(sum(strlen(r_name)) AS DOUBLE) / count(r_name) AS name_width,
          CAST(min(r_name) AS VARCHAR) AS min_val,
          CAST(max(r_name) AS VARCHAR) AS max_val
        FROM region
        UNION ALL
        SELECT 'r_regionkey',
          CAST(count(*) - count(r_regionkey) AS DOUBLE) / count(*),
          CAST(NULL AS DOUBLE),
          CAST(min(r_regionkey) AS VARCHAR), CAST(max(r_regionkey) AS VARCHAR)
        FROM region) s
      ORDER BY attname""")) { (s, dir) =>
      TableStats.analyze(s, "region", Tables.df(s, dir, "region"), ns = dir)
      PgCatalog.refreshStats(s)
      s.sql("""
        SELECT attname, null_frac,
          CASE WHEN attname = 'r_name' THEN avg_width END AS name_width,
          min_val, max_val
        FROM pg_stats WHERE tablename = 'region' ORDER BY attname""")
    },

    // the round-3 catalog additions: pg_index/pg_attrdef/pg_depend/
    // pg_sequence and the stat/statio view families all resolve with their
    // documented shapes
    Q("cat_catalog_breadth", Some("""
      SELECT * FROM (VALUES
        ('pg_attrdef', CAST(0 AS BIGINT)), ('pg_authid', 1), ('pg_cast', 0),
        ('pg_depend', 0), ('pg_enum', 0), ('pg_index', 0), ('pg_language', 3),
        ('pg_operator', 0), ('pg_publication', 0), ('pg_sequence', 0),
        ('pg_stat_activity', 1), ('pg_stat_all_tables', 10),
        ('pg_stat_database', 1), ('pg_stat_user_indexes', 0),
        ('pg_statio_user_tables', 0), ('pg_tablespace', 2), ('pg_trigger', 0))
        t(rel, n)
      ORDER BY rel""")) { (s, dir) =>
      s.sql("""
        SELECT 'pg_attrdef' AS rel, count(*) AS n FROM pg_attrdef UNION ALL
        SELECT 'pg_authid', count(*) FROM pg_authid UNION ALL
        SELECT 'pg_cast', count(*) FROM pg_cast UNION ALL
        SELECT 'pg_depend', count(*) FROM pg_depend UNION ALL
        SELECT 'pg_enum', count(*) FROM pg_enum UNION ALL
        SELECT 'pg_index', count(*) FROM pg_index UNION ALL
        SELECT 'pg_language', count(*) FROM pg_language UNION ALL
        SELECT 'pg_operator', count(*) FROM pg_operator UNION ALL
        SELECT 'pg_publication', count(*) FROM pg_publication UNION ALL
        SELECT 'pg_sequence', count(*) FROM pg_sequence UNION ALL
        SELECT 'pg_stat_activity', count(*) FROM pg_stat_activity UNION ALL
        SELECT 'pg_stat_all_tables', count(*) FROM pg_stat_all_tables UNION ALL
        SELECT 'pg_stat_database', count(*) FROM pg_stat_database UNION ALL
        SELECT 'pg_stat_user_indexes', count(*) FROM pg_stat_user_indexes UNION ALL
        SELECT 'pg_statio_user_tables', count(*) FROM pg_statio_user_tables UNION ALL
        SELECT 'pg_tablespace', count(*) FROM pg_tablespace UNION ALL
        SELECT 'pg_trigger', count(*) FROM pg_trigger
        ORDER BY rel""")
    }
  )
}
