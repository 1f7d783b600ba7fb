package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PG-flavored statements executed through the dialect front end, each with
  * a DuckDB oracle — the correctness gate proves the translation layer, not
  * just the underlying operators. */
object PgDialectOps {

  private def run(s: SparkSession, sql: String): DataFrame =
    s.sql(PgDialect.translateSelect(sql))

  val defs: Seq[Q] = Seq(

    Q("pd_cast_json_ops", Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
      ORDER BY event_id""")) { (s, dir) =>
      run(s, """
        SELECT event_id, (props ->> 'k')::int4 AS k
        FROM events
        WHERE (props ->> 'k')::int4 > 50
        ORDER BY event_id""")
    },

    Q("pd_any_list", Some("""
      SELECT event_id, event_type FROM events
      WHERE event_type IN ('click', 'view')
      ORDER BY event_id""")) { (s, dir) =>
      run(s, """
        SELECT event_id, event_type FROM events
        WHERE event_type = ANY('{click,view}')
        ORDER BY event_id""")
    },

    Q("pd_regex_op", Some("""
      SELECT n_name FROM nation
      WHERE regexp_matches(n_name, 'NATION_1[0-9]')
      ORDER BY n_name""")) { (s, dir) =>
      run(s, "SELECT n_name FROM nation WHERE n_name ~ 'NATION_1[0-9]' ORDER BY n_name")
    },

    // ANSI FETCH FIRST (PG's second LIMIT spelling) -> LIMIT
    Q("pd_fetch_first", Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""")) { (s, dir) =>
      run(s, """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        FETCH FIRST 15 ROWS ONLY""")
    },

    // the STANDARD pagination idiom: OFFSET before FETCH (Spark grammar
    // needs LIMIT-then-OFFSET, so the rewrite must reorder)
    Q("pd_offset_fetch", Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 5""")) { (s, dir) =>
      run(s, """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        OFFSET 5 ROWS FETCH NEXT 20 ROWS ONLY""")
    },

    // FILTER over a window -> CASE argument
    Q("pd_window_filter", Some("""
      SELECT event_id, user_id,
        count(CASE WHEN event_type = 'click' THEN 1 END) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS clicks_so_far
      FROM events WHERE event_id < 2000 ORDER BY event_id""")) { (s, dir) =>
      run(s, """
        SELECT event_id, user_id,
          count(*) FILTER (WHERE event_type = 'click') OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS clicks_so_far
        FROM events WHERE event_id < 2000 ORDER BY event_id""")
    },

    // PG numeric/bit operator spellings: ^ power, # xor, shifts, & |
    Q("pd_bit_ops", Some("""
      SELECT n_nationkey, xor(n_nationkey, 3) AS bxor,
        CAST(pow(n_nationkey, 2) AS DOUBLE) AS p2,
        n_nationkey << 2 AS shl, n_nationkey >> 1 AS shr,
        n_nationkey & 3 AS band, n_nationkey | 8 AS bor
      FROM nation ORDER BY n_nationkey""")) { (s, dir) =>
      run(s, """
        SELECT n_nationkey, n_nationkey # 3 AS bxor,
          n_nationkey ^ 2 AS p2,
          n_nationkey << 2 AS shl, n_nationkey >> 1 AS shr,
          n_nationkey & 3 AS band, n_nationkey | 8 AS bor
        FROM nation ORDER BY n_nationkey""")
    },

    // set-returning unnest + string_to_array through the dialect
    Q("pd_unnest", Some("""
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE doc_id < 3 ORDER BY doc_id, w""")) { (s, dir) =>
      run(s, """
        SELECT doc_id, unnest(string_to_array(text, ' ')) AS w
        FROM documents WHERE doc_id < 3 ORDER BY doc_id, w""")
    },

    // CTE materialization hint + ANSI OFFSET n ROWS + LIMIT ALL
    Q("pd_cte_hints", Some("""
      WITH big AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000)
      SELECT o_orderkey, o_totalprice FROM big
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5""")) { (s, dir) =>
      run(s, """
        WITH big AS MATERIALIZED (
          SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000)
        SELECT o_orderkey, o_totalprice FROM big
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5 ROWS""")
    },

    // PG 1-based array subscripts -> element_at
    Q("pd_array_subscript", Some("""
      SELECT vec_id, embedding[1] AS first_val, embedding[8] AS eighth
      FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""")) { (s, dir) =>
      run(s, """
        SELECT vec_id, embedding[1] AS first_val, embedding[8] AS eighth
        FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""")
    },

    // date-spine generate_series(date, date, interval) -> sequence explode
    Q("pd_date_spine", Some("""
      SELECT CAST(CAST(d AS DATE) AS VARCHAR) AS day
      FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-07',
            INTERVAL '1 day')) AS d) t
      ORDER BY day""")) { (s, dir) =>
      run(s, """
        SELECT d::text AS day
        FROM generate_series(DATE '2024-01-01', DATE '2024-01-07', INTERVAL '1 day') g(d)
        ORDER BY day""")
    },

    // FETCH FIRST n ROWS WITH TIES -> rank() window keeps the tied tail
    Q("pd_fetch_ties", Some("""
      SELECT o_orderkey, d FROM (
        SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS d,
          rank() OVER (ORDER BY CAST(o_orderdate AS VARCHAR)) AS rk
        FROM orders) t
      WHERE rk <= 5 ORDER BY d, o_orderkey""")) { (s, dir) =>
      run(s, """
        SELECT o_orderkey, o_orderdate::text AS d FROM orders
        ORDER BY d FETCH FIRST 5 ROWS WITH TIES""")
    },

    // BETWEEN SYMMETRIC reverses its bounds (PG); translated to least/greatest
    Q("pd_between_symmetric", Some("""
      SELECT n_nationkey, n_name FROM nation
      WHERE n_nationkey BETWEEN 3 AND 12 ORDER BY n_nationkey""")) { (s, dir) =>
      run(s, """
        SELECT n_nationkey, n_name FROM nation
        WHERE n_nationkey BETWEEN SYMMETRIC 12 AND 3 ORDER BY n_nationkey""")
    },

    // SIMILAR TO: PG's SQL-wildcard/regex hybrid, translated to an anchored
    // RLIKE. The oracle is regexp_full_match on the hand-translated regex
    // (DuckDB's own SIMILAR TO is a plain full-regex match — different
    // semantics from PG, so it cannot be the oracle).
    Q("pd_similar_to", Some("""
      SELECT n_name,
        regexp_full_match(n_name, 'NATION_1.*') AS m1,
        regexp_full_match(n_name, 'NATION_(1|2)') AS m2,
        NOT regexp_full_match(n_name, '(NATION|REGION).*') AS m3,
        regexp_full_match(n_name, 'NATION.1') AS m4
      FROM nation ORDER BY n_name""")) { (s, dir) =>
      run(s, """
        SELECT n_name,
          n_name SIMILAR TO 'NATION\_1%' AS m1,
          n_name SIMILAR TO 'NATION\_(1|2)' AS m2,
          n_name NOT SIMILAR TO '(NATION|REGION)%' AS m3,
          n_name SIMILAR TO 'NATION_1' AS m4
        FROM nation ORDER BY n_name""")
    },

    // ILIKE / NOT ILIKE: native in both engines; the gate pins that the
    // translator leaves them intact (and that `~~*` already maps here)
    Q("pd_ilike", Some("""
      SELECT doc_id, lang, source FROM documents
      WHERE lang ILIKE 'E%' AND source NOT ILIKE '%1%'
      ORDER BY doc_id LIMIT 50""")) { (s, dir) =>
      run(s, """
        SELECT doc_id, lang, source FROM documents
        WHERE lang ILIKE 'E%' AND source NOT ILIKE '%1%'
        ORDER BY doc_id LIMIT 50""")
    },

    // Ordered-set aggregates: percentile_cont/percentile_disc WITHIN GROUP
    // (native in Spark 4 and DuckDB). Inputs are integer-valued quantities
    // and quarter fractions so every interpolated value is exactly
    // representable — bit-equal across engines regardless of each engine's
    // interpolation formula.
    Q("pd_within_group", Some("""
      SELECT l_returnflag,
        percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(l_quantity AS DOUBLE)) AS p50,
        percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(l_quantity AS DOUBLE) DESC) AS p75_desc,
        percentile_disc(0.9) WITHIN GROUP (ORDER BY CAST(l_quantity AS DOUBLE)) AS p90d
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
      run(s, """
        SELECT l_returnflag,
          percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity::double precision) AS p50,
          percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity::double precision DESC) AS p75_desc,
          percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity::double precision) AS p90d
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    },

    // mode() WITHIN GROUP over constructed values with a unique per-group
    // mode (cross-engine tie-breaking is not contract-stable)
    Q("pd_mode", Some("""
      SELECT g, mode() WITHIN GROUP (ORDER BY v) AS m
      FROM (VALUES (1,10),(1,10),(1,20),(2,7),(2,7),(2,9)) t(g,v)
      GROUP BY g ORDER BY g""")) { (s, dir) =>
      run(s, """
        SELECT g, mode() WITHIN GROUP (ORDER BY v) AS m
        FROM (VALUES (1,10),(1,10),(1,20),(2,7),(2,7),(2,9)) t(g,v)
        GROUP BY g ORDER BY g""")
    },

    // correlated LATERAL subquery in FROM (top-2-per-group via LIMIT inside
    // the lateral): native in Spark 3.2+ and DuckDB — the gate pins that
    // the translator leaves the shape intact end-to-end
    Q("pd_lateral_subquery", Some("""
      SELECT c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c_custkey <= 200
      ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")) { (s, dir) =>
      run(s, """
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c_custkey <= 200
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
    },

    // GROUPS window frame -> RANGE over dense_rank (DuckDB lacks GROUPS
    // too, so the oracle hand-writes the peer-group semantics with its own
    // dense_rank + RANGE formulation — same math, independent execution)
    Q("pd_groups_frame", Some("""
      SELECT o_custkey, d, CAST(s AS BIGINT) AS s FROM (
        SELECT o_custkey, CAST(o_orderdate AS VARCHAR) AS d,
          sum(o_orderkey) OVER (PARTITION BY o_custkey
            ORDER BY gdr RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        FROM (SELECT o_custkey, o_orderdate, o_orderkey,
                dense_rank() OVER (PARTITION BY o_custkey
                  ORDER BY CAST(o_orderdate AS VARCHAR)) AS gdr
              FROM orders WHERE o_custkey <= 100) t) u
      ORDER BY o_custkey, d, s""")) { (s, dir) =>
      run(s, """
        SELECT o_custkey, o_orderdate::text AS d,
          CAST(sum(o_orderkey) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate::text
            GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS s
        FROM orders WHERE o_custkey <= 100
        ORDER BY o_custkey, d, s""")
    },

    // PG regexp_replace semantics (first match unless 'g', flags, \N
    // backrefs) and literal backslashes in strings (standard_conforming)
    Q("pd_regexp_flags", Some("""
      SELECT n_name,
        regexp_replace(n_name, 'N', '*') AS first_only,
        regexp_replace(n_name, 'n', '*', 'gi') AS all_ci,
        regexp_replace(n_name, '(\d)', '[\1]', 'g') AS digits
      FROM nation ORDER BY n_name""")) { (s, dir) =>
      run(s, """
        SELECT n_name,
          regexp_replace(n_name, 'N', '*') AS first_only,
          regexp_replace(n_name, 'n', '*', 'gi') AS all_ci,
          regexp_replace(n_name, '(\d)', '[\1]', 'g') AS digits
        FROM nation ORDER BY n_name""")
    },

    // extract(epoch), to_hex, single-argument numeric trunc
    Q("pd_fn_misc", Some("""
      SELECT CAST(extract(epoch from TIMESTAMP '2024-01-01 00:00:00.5') AS DOUBLE) AS ep,
        to_hex(255) AS hx,
        CAST(trunc(4.7) AS BIGINT) AS t1,
        CAST(trunc(-4.7) AS BIGINT) AS t2""")) { (s, dir) =>
      run(s, """
        SELECT CAST(extract(epoch from TIMESTAMP '2024-01-01 00:00:00.5') AS DOUBLE) AS ep,
          to_hex(255) AS hx,
          CAST(trunc(4.7) AS BIGINT) AS t1,
          CAST(trunc(-4.7) AS BIGINT) AS t2""")
    },

    // array_agg(DISTINCT x ORDER BY x) -> sorted set; DuckDB runs the PG
    // form natively so the oracle verifies the equivalence
    Q("pd_array_agg_distinct", Some("""
      SELECT l_returnflag,
        array_to_string(array_agg(DISTINCT l_linestatus ORDER BY l_linestatus), ',') AS st,
        array_to_string(array_agg(DISTINCT l_linestatus ORDER BY l_linestatus DESC), ',') AS st_desc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
      run(s, """
        SELECT l_returnflag,
          array_to_string(array_agg(DISTINCT l_linestatus ORDER BY l_linestatus), ',') AS st,
          array_to_string(array_agg(DISTINCT l_linestatus ORDER BY l_linestatus DESC), ',') AS st_desc
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    },

    // named WINDOW clause (PG surface; native in both engines — the gate
    // pins that the translator's null-ordering/alias passes leave it whole)
    Q("pd_named_window", Some("""
      SELECT o_custkey, o_orderkey,
        CAST(sum(o_orderkey) OVER w AS BIGINT) AS run,
        CAST(rank() OVER w AS BIGINT) AS rk
      FROM orders WHERE o_custkey <= 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      ORDER BY o_custkey, o_orderkey""")) { (s, dir) =>
      run(s, """
        SELECT o_custkey, o_orderkey,
          CAST(sum(o_orderkey) OVER w AS BIGINT) AS run,
          CAST(rank() OVER w AS BIGINT) AS rk
        FROM orders WHERE o_custkey <= 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        ORDER BY o_custkey, o_orderkey""")
    },

    // EXCLUDE CURRENT ROW frames (DuckDB runs EXCLUDE natively — the
    // oracle verifies the subtraction rewrite incl. the empty-frame NULL)
    Q("pd_exclude_frame", Some("""
      SELECT o_custkey, o_orderkey,
        CAST(sum(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS BIGINT) AS nbr_sum,
        CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS BIGINT) AS nbr_n,
        avg(CAST(o_orderkey AS DOUBLE)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS prev_avg
      FROM orders WHERE o_custkey <= 60
      ORDER BY o_custkey, o_orderkey""")) { (s, dir) =>
      run(s, """
        SELECT o_custkey, o_orderkey,
          CAST(sum(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS BIGINT) AS nbr_sum,
          CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS BIGINT) AS nbr_n,
          avg(CAST(o_orderkey AS DOUBLE)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS prev_avg
        FROM orders WHERE o_custkey <= 60
        ORDER BY o_custkey, o_orderkey""")
    },

    // PG array function family: array_cat -> concat; the rest share names
    // and 1-based indexing with Spark (DuckDB lacks array_remove and uses
    // len — the oracle re-expresses those)
    Q("pd_array_fns", Some("""
      SELECT array_to_string(array_cat([1,2],[3]), ',') AS cat,
        CAST(array_position([10,20,30], 20) AS BIGINT) AS pos,
        array_to_string(list_filter([1,2,1,3], x -> x <> 1), ',') AS rm,
        CAST(len([1,2,3]) AS INT) AS card,
        array_to_string(array_append([1,2], 3), ',') AS app,
        array_to_string(array_prepend(0, [1,2]), ',') AS pre""")) { (s, dir) =>
      run(s, """
        SELECT array_to_string(array_cat(ARRAY[1,2], ARRAY[3]), ',') AS cat,
          array_position(ARRAY[10,20,30], 20) AS pos,
          array_to_string(array_remove(ARRAY[1,2,1,3], 1), ',') AS rm,
          cardinality(ARRAY[1,2,3]) AS card,
          array_to_string(array_append(ARRAY[1,2], 3), ',') AS app,
          array_to_string(array_prepend(0, ARRAY[1,2]), ',') AS pre""")
    },

    // PG string functions: strpos -> instr, starts_with -> startswith,
    // quote_literal shim; btrim/repeat/translate/chr/ascii pass through
    // (DuckDB lacks btrim and quote_literal — the oracle re-expresses them)
    Q("pd_string_fns", Some("""
      SELECT strpos('abcdef', 'cd') AS sp, strpos('abc', 'x') AS sp0,
        trim('xxabcxx', 'x') AS bt,
        starts_with('abcdef', 'abc') AS sw,
        repeat('ab', 3) AS rp, translate('abc', 'ab', 'xy') AS tr,
        chr(65) AS ch, ascii('A') AS asc,
        '''' || replace('it''s', '''', '''''') || '''' AS ql""")) { (s, dir) =>
      run(s, """
        SELECT strpos('abcdef', 'cd') AS sp, strpos('abc', 'x') AS sp0,
          btrim('xxabcxx', 'x') AS bt,
          starts_with('abcdef', 'abc') AS sw,
          repeat('ab', 3) AS rp, translate('abc', 'ab', 'xy') AS tr,
          chr(65) AS ch, ascii('A') AS asc,
          quote_literal('it''s') AS ql""")
    },

    // LIKE with an explicit ESCAPE character (incl. PG's literal backslash,
    // which rides the standard_conforming_strings doubling)
    Q("pd_like_escape", Some("""
      SELECT v, v LIKE 'a\_%' ESCAPE '\' AS esc_bs,
        v LIKE 'a#_%' ESCAPE '#' AS esc_hash
      FROM (VALUES ('a_x'), ('abx'), ('a%x')) t(v) ORDER BY v""")) { (s, dir) =>
      run(s, """
        SELECT v, v LIKE 'a\_%' ESCAPE '\' AS esc_bs,
          v LIKE 'a#_%' ESCAPE '#' AS esc_hash
        FROM (VALUES ('a_x'), ('abx'), ('a%x')) t(v) ORDER BY v""")
    },

    Q("pd_distinct_on", Some("""
      SELECT DISTINCT ON (user_id) user_id, event_id
      FROM events ORDER BY user_id, event_id DESC""")) { (s, dir) =>
      run(s, """
        SELECT DISTINCT ON (user_id) user_id, event_id
        FROM events ORDER BY user_id, event_id DESC""")
    },

    Q("pd_catalog_probe", Some("""
      SELECT CAST(oid AS BIGINT) AS oid, typname
      FROM (VALUES (16, 'bool'), (3802, 'jsonb')) t(oid, typname)
      ORDER BY oid""")) { (s, dir) =>
      run(s, """
        SELECT oid, typname FROM pg_catalog.pg_type
        WHERE typname = ANY('{bool,jsonb}')
        ORDER BY oid""")
    },

    // correlated ANY subquery (query_remapper.go sublink traversal; DuckDB
    // needed the reference's =ANY->IN hack, Catalyst handles IN-subqueries)
    Q("pd_any_subquery", Some("""
      SELECT n_name FROM nation
      WHERE n_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)
      ORDER BY n_name""")) { (s, dir) =>
      run(s, """
        SELECT n_name FROM nation
        WHERE n_nationkey = ANY(SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)
        ORDER BY n_name""")
    },

    // LATERAL generate_series -> LATERAL VIEW explode(sequence(...))
    // (oracle uses scalar generate_series + unnest: DuckDB's table-function
    // form rejects lateral column arguments)
    Q("pd_lateral_series", Some("""
      SELECT r_name, CAST(unnest(generate_series(1, r_regionkey + 1)) AS BIGINT) AS n
      FROM region ORDER BY r_name, n""")) { (s, dir) =>
      run(s, """
        SELECT r_name, g.n FROM region, LATERAL generate_series(1, r_regionkey + 1) AS g(n)
        ORDER BY r_name, n""")
    },

    // identity + visibility probes BI tools issue right after connecting
    Q("pd_identity", Some("""
      SELECT 'graft' AS db, 'public' AS sch, true AS vis""")) { (s, dir) =>
      run(s, """
        SELECT current_database() AS db, current_schema() AS sch,
               pg_catalog.pg_table_is_visible(16390) AS vis""")
    },

    // pg_get_keywords() table function over the keywords rowset
    Q("pd_keywords", Some("""
      SELECT word FROM (VALUES ('select'), ('where'), ('group')) t(word)
      ORDER BY word""")) { (s, dir) =>
      run(s, """
        SELECT word FROM pg_get_keywords()
        WHERE word IN ('select', 'where', 'group') ORDER BY word""")
    },

    // the psql \d-style catalog probe (pg_class ⋈ pg_namespace with a ~
    // anchor regex and pg_catalog prefixes), straight through the translator
    Q("pd_psql_describe", Some("""
      SELECT 'public' AS nspname, 'orders' AS relname, 'r' AS relkind""")) { (s, dir) =>
      run(s, """
        SELECT n.nspname, c.relname, c.relkind
        FROM pg_catalog.pg_class c
        LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
        WHERE c.relname ~ '^(orders)$' ORDER BY 1, 2""")
    },

    // PG null-ordering defaults: NULLS LAST for ASC, FIRST for DESC — the
    // dialect injects them (Spark's defaults are the opposite); DuckDB's
    // defaults already match PG, so the oracle is the bare ORDER BY
    Q("pd_order_nulls", Some("""
      SELECT n_nationkey, nullif(n_regionkey, 2) AS maybe_null FROM nation
      ORDER BY maybe_null, n_nationkey DESC""")) { (s, dir) =>
      run(s, """
        SELECT n_nationkey, nullif(n_regionkey, 2) AS maybe_null FROM nation
        ORDER BY maybe_null, n_nationkey DESC""")
    },

    // flat JSON containment @> -> conjunction of path equality checks
    Q("pd_json_contains", Some("""
      SELECT event_id FROM events
      WHERE json_extract_string(props, '$.k') = '69'
      ORDER BY event_id""")) { (s, dir) =>
      run(s, """
        SELECT event_id FROM events
        WHERE props @> '{"k": 69}'
        ORDER BY event_id""")
    },

    // JSON existence operator ? -> get_json_object IS NOT NULL
    Q("pd_json_exists", Some("""
      SELECT event_id FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL AND event_id < 100
      ORDER BY event_id""")) { (s, dir) =>
      run(s, """
        SELECT event_id FROM events
        WHERE props ? 'k' AND event_id < 100
        ORDER BY event_id""")
    },

    // ::regclass -> oid-lookup subselect over the emulated pg_class
    // (deterministic oids: 16384 + position in the table registry)
    Q("pd_regclass", Some("""
      SELECT CAST(16390 AS BIGINT) AS li_oid, CAST(16389 AS BIGINT) AS ord_oid""")) { (s, dir) =>
      run(s, """
        SELECT 'lineitem'::regclass::oid AS li_oid,
               'public.orders'::regclass AS ord_oid""")
    },

    // quoted/mixed-case regclass names: unquoted folds to lowercase (PG
    // case-folding), "quoted" segments keep their exact spelling
    Q("pd_regclass_quoted", Some("""
      SELECT CAST(16390 AS BIGINT) AS li_oid, CAST(16389 AS BIGINT) AS ord_oid""")) { (s, dir) =>
      run(s, """
        SELECT '"lineitem"'::regclass::oid AS li_oid,
               'PUBLIC."orders"'::regclass AS ord_oid""")
    },

    // the psql \\di / \\ds probe shape: pg_class x pg_namespace x pg_index
    // filtered to index/sequence relkinds — resolves through the widened
    // catalog and returns the correct empty set (no indexes or sequences)
    Q("pd_psql_indexes", Some("""
      SELECT CAST(NULL AS VARCHAR) AS nspname, CAST(NULL AS VARCHAR) AS relname,
             CAST(NULL AS VARCHAR) AS relkind WHERE 1 = 0""")) { (s, dir) =>
      run(s, """
        SELECT n.nspname, c.relname, c.relkind
        FROM pg_catalog.pg_class c
        LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
        LEFT JOIN pg_catalog.pg_index i ON i.indexrelid = c.oid
        WHERE c.relkind IN ('i', 'I', 'S', 's') AND n.nspname <> 'pg_catalog'
        ORDER BY 1, 2""")
    },

    // projection auto-alias: unaliased `f(x)` is named after the function
    // like PG / the reference remapper (query_remapper_select.go:51-76)
    Q(
      "pd_auto_alias",
      Some("""
      SELECT c_custkey, upper(c_name) AS upper, round(c_acctbal) AS round
      FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey""")
    ) { (s, dir) =>
      run(
        s,
        """
        SELECT c_custkey, upper(c_name), round(c_acctbal)
        FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey"""
      )
    },

    // unaliased `col ->> 'k'` is named col_k (query_remapper_select.go:57-66)
    Q(
      "pd_auto_alias_json",
      Some("""
      SELECT event_id, json_extract_string(props, '$.k') AS props_k
      FROM events WHERE event_id <= 50 ORDER BY event_id""")
    ) { (s, dir) =>
      run(
        s,
        "SELECT event_id, props ->> 'k' FROM events WHERE event_id <= 50 ORDER BY event_id"
      )
    },

    // `t.col AS t` alias shadows the relation name: renamed to `t_` and the
    // rename follows into GROUP BY / ORDER BY (query_remapper_select.go:25-48)
    Q(
      "pd_alias_shadow",
      Some("""
      SELECT n.n_name AS n_, count(*) AS cnt
      FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name ORDER BY n_""")
    ) { (s, dir) =>
      run(
        s,
        """
        SELECT n.n_name AS n, count(*) AS cnt
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        GROUP BY n ORDER BY n"""
      )
    },

    // PG aggregate-internal ORDER BY -> Spark WITHIN GROUP rewrite
    Q(
      "pd_string_agg_order",
      Some("""
      SELECT n_regionkey, string_agg(n_name, ';' ORDER BY n_name DESC) AS names
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
    ) { (s, dir) =>
      run(
        s,
        """
        SELECT n_regionkey, string_agg(n_name, ';' ORDER BY n_name DESC) AS names
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""
      )
    },

    // multi-row scalar subquery tolerated in first-row mode — the reference
    // boots DuckDB with scalar_subquery_error_on_multiple_rows=false
    // (main.go:67), so this query returns rows there while PG-strict mode
    // (and the default here) raises a multi-row error. The sublink carries
    // ORDER BY, making the injected LIMIT 1 deterministic for the oracle.
    Q(
      "pd_scalar_multirow",
      Some("""
      SELECT c_custkey,
        (SELECT o_totalprice FROM orders
         WHERE o_custkey = c_custkey
         ORDER BY o_orderdate, o_orderkey LIMIT 1) AS first_price
      FROM customer
      ORDER BY c_custkey""")
    ) { (s, dir) =>
      SessionSettings.withSession(s) {
      SessionSettings.set("graft.scalar_subquery_first_row", "on")
      try run(
        s,
        """
        SELECT c_custkey,
          (SELECT o_totalprice FROM orders
           WHERE o_custkey = c_custkey
           ORDER BY o_orderdate, o_orderkey) AS first_price
        FROM customer
        ORDER BY c_custkey"""
      )
      finally SessionSettings.reset("graft.scalar_subquery_first_row")
      }
    }
  )
}
