package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Operator inventory — one query per relational construct from SURVEY.md
  * §2.B (the SELECT surface BemiDB's rewriter accepts; reference contract
  * pinned by /root/reference/src/server/query_handler_test.go, traversal in
  * /root/reference/src/server/query_remapper.go:205-517).
  *
  * DataFrame API where idiomatic; `spark.sql` where the construct is itself
  * SQL surface (sublinks, recursive CTE, VALUES, FILTER clause, grouping
  * sets) — exercising Catalyst's analyzer the way the PG-dialect front end
  * will drive it.
  */
object RelationalOps {
  import Qdsl._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  val defs: Seq[Q] = Seq(

    // ---- scans / projection / filter ------------------------------------
    Q("op_scan_project", Some("""
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      ORDER BY l_orderkey, l_linenumber LIMIT 500""")) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("2000-01-01"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    },

    Q("op_filter_complex", Some("""
      SELECT o_orderkey FROM orders
      WHERE (o_orderstatus IN ('F','P') AND o_totalprice BETWEEN 100000 AND 200000)
         OR (o_orderpriority LIKE '1-%' AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
      ORDER BY o_orderkey""")) { (s, dir) =>
      t(s, dir, "orders")
        .filter((col("o_orderstatus").isin("F", "P") && col("o_totalprice").between(100000, 200000))
          || (col("o_orderpriority").like("1-%") && col("o_orderdate") >= ts("2000-06-01")))
        .select("o_orderkey")
        .orderBy("o_orderkey")
    },

    // ---- joins ----------------------------------------------------------
    Q("op_join_inner", Some("""
      SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
      ORDER BY n_name""")) { (s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("n_name", "r_name").orderBy("n_name")
    },

    Q("op_join_left", Some("""
      SELECT c_custkey, o_orderkey FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      ORDER BY c_custkey, o_orderkey NULLS FIRST""")) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    Q("op_join_right", Some("""
      SELECT c_custkey, o_orderkey FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
      ORDER BY c_custkey, o_orderkey NULLS FIRST""")) { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"), "right")
        .select("c_custkey", "o_orderkey")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    Q("op_join_full", Some("""
      SELECT a.k AS big_supp, b.k AS poor_supp
      FROM (SELECT DISTINCT l_suppkey AS k FROM lineitem WHERE l_quantity >= 49) a
      FULL OUTER JOIN (SELECT s_suppkey AS k FROM supplier WHERE s_acctbal < 0) b
      ON a.k = b.k
      ORDER BY big_supp NULLS FIRST, poor_supp NULLS FIRST""")) { (s, dir) =>
      val a = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select(col("l_suppkey").as("big_supp")).distinct()
      val b = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("poor_supp"))
      a.join(b, col("big_supp") === col("poor_supp"), "full_outer")
        .orderBy(col("big_supp").asc_nulls_first, col("poor_supp").asc_nulls_first)
    },

    Q("op_join_cross", Some("""
      SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""")) { (s, dir) =>
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select("r_name", "n_name").orderBy("r_name", "n_name")
    },

    Q("op_join_semi", Some("""
      SELECT s_suppkey, s_name FROM supplier
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
      ORDER BY s_suppkey""")) { (s, dir) =>
      t(s, dir, "supplier")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") >= 49),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name").orderBy("s_suppkey")
    },

    Q("op_join_anti", Some("""
      SELECT c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    },

    // ---- aggregation ----------------------------------------------------
    Q("op_agg_basic", Some(s"""
      SELECT o_orderstatus, count(*) AS n,
        CAST(min(o_totalprice) AS DOUBLE) AS min_price,
        CAST(max(o_totalprice) AS DOUBLE) AS max_price,
        ${msumO("CAST(round(o_totalprice*100) AS BIGINT)", "1e2")} AS sum_price
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          msum(cents(col("o_totalprice")), 1e2).as("sum_price"))
        .orderBy("o_orderstatus")
    },

    Q("op_agg_count_distinct", Some("""
      SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT l_partkey) AS n_part
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy("l_returnflag")
    },

    // FILTER (WHERE ...) clause — reference preserves it through rewrites
    // (parser_function.go:71-98); Spark SQL supports it natively.
    Q("op_agg_filter_clause", Some("""
      SELECT o_orderstatus,
        count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, dir) =>
      s.sql("""
        SELECT o_orderstatus,
          count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
          count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },

    // string_agg / array_agg with deterministic intra-group order
    Q("op_agg_string_agg", Some("""
      SELECT r_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_regionkey ORDER BY r_regionkey""")) { (s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_regionkey")
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy("r_regionkey")
    },

    // Array result serialized to JSON text: the driver's comparator sorts
    // rows by every output column and cannot order raw array cells.
    Q("op_agg_array_agg", Some("""
      SELECT n_regionkey,
        CAST(to_json(list(n_nationkey ORDER BY n_nationkey)) AS VARCHAR) AS nation_keys
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")) { (s, dir) =>
      t(s, dir, "nation").groupBy("n_regionkey")
        .agg(to_json(sort_array(collect_list(col("n_nationkey")))).as("nation_keys"))
        .orderBy("n_regionkey")
    },

    // grouping sets / rollup / cube — free in Spark, untested-but-accepted
    // in the reference (SURVEY §2.B aggregation row)
    Q("op_rollup", Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // GROUPING() markers distinguish "NULL because subtotal row" from "NULL
    // in the data" — required by BI tools consuming rollup output
    Q("op_grouping_fn", Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(grouping(l_returnflag) AS INT) AS g_flag,
        CAST(grouping(l_linestatus) AS INT) AS g_status,
        count(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"))
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    Q("op_cube", Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")) { (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    Q("op_grouping_sets", Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")) { (s, dir) =>
      s.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    },

    // ---- distinct -------------------------------------------------------
    Q("op_distinct", Some("""
      SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      ORDER BY c_mktsegment, c_nationkey""")) { (s, dir) =>
      t(s, dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    },

    // DISTINCT ON (PG-ism; reference passes through to DuckDB which supports
    // it) — Spark lacks it, translated to a row_number window (SURVEY §2.B)
    Q("op_distinct_on", Some("""
      SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
      FROM orders ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC""")) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy(col("o_custkey"), col("o_orderdate").desc, col("o_orderkey").desc)
    },

    // ---- sort / limit / offset -----------------------------------------
    Q("op_sort_limit_offset", Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10""")) { (s, dir) =>
      t(s, dir, "orders").select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(10).limit(20)
    },

    // ---- set operations -------------------------------------------------
    Q("op_union_all", Some("""
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
      UNION ALL
      SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000
      ORDER BY k""")) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_acctbal") > 9000).select(col("c_nationkey").as("k"))
        .unionAll(t(s, dir, "supplier").filter(col("s_acctbal") > 9000).select(col("s_nationkey").as("k")))
        .orderBy("k")
    },

    Q("op_union", Some("""
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
      UNION
      SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000
      ORDER BY k""")) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_acctbal") > 9000).select(col("c_nationkey").as("k"))
        .union(t(s, dir, "supplier").filter(col("s_acctbal") > 9000).select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy("k")
    },

    Q("op_intersect", Some("""
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
      INTERSECT
      SELECT s_nationkey AS k FROM supplier
      ORDER BY k""")) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_acctbal") > 9000).select(col("c_nationkey").as("k"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k")
    },

    Q("op_except", Some("""
      SELECT n_nationkey AS k FROM nation
      EXCEPT
      SELECT s_nationkey AS k FROM supplier
      ORDER BY k""")) { (s, dir) =>
      t(s, dir, "nation").select(col("n_nationkey").as("k"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k")
    },

    // ---- CTEs -----------------------------------------------------------
    Q("op_cte", Some("""
      WITH big AS (SELECT o_custkey, count(*) AS n FROM orders
                   WHERE o_totalprice > 300000 GROUP BY o_custkey)
      SELECT c_custkey, n FROM customer JOIN big ON c_custkey = o_custkey
      ORDER BY c_custkey""")) { (s, dir) =>
      s.sql("""
        WITH big AS (SELECT o_custkey, count(*) AS n FROM orders
                     WHERE o_totalprice > 300000 GROUP BY o_custkey)
        SELECT c_custkey, n FROM customer JOIN big ON c_custkey = o_custkey
        ORDER BY c_custkey""")
    },

    // WITH RECURSIVE (reference test query_handler_test.go:1368; hard-part
    // #3 in SURVEY §7.4 — Spark 4 supports it natively)
    Q("op_cte_recursive", Some("""
      WITH RECURSIVE r(n) AS (
        SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 50)
      SELECT n FROM r ORDER BY n""")) { (s, dir) =>
      s.sql("""
        WITH RECURSIVE r(n) AS (
          SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 50)
        SELECT n FROM r ORDER BY n""")
    },

    // ---- subqueries -----------------------------------------------------
    Q("op_subquery_scalar", Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 2 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) FROM orders)
      ORDER BY o_orderkey""")) { (s, dir) =>
      s.sql("""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 2 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) FROM orders)
        ORDER BY o_orderkey""")
    },

    Q("op_subquery_correlated", Some("""
      SELECT s_suppkey, s_acctbal FROM supplier s
      WHERE s_acctbal > (SELECT CAST(sum(CAST(s2.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                         FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey)
      ORDER BY s_suppkey""")) { (s, dir) =>
      s.sql("""
        SELECT s_suppkey, s_acctbal FROM supplier s
        WHERE s_acctbal > (SELECT CAST(sum(CAST(s2.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                           FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY s_suppkey""")
    },

    Q("op_subquery_in", Some("""
      SELECT p_partkey, p_name FROM part
      WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      ORDER BY p_partkey""")) { (s, dir) =>
      s.sql("""
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        ORDER BY p_partkey""")
    },

    Q("op_subquery_not_in", Some("""
      SELECT n_nationkey FROM nation
      WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9900)
      ORDER BY n_nationkey""")) { (s, dir) =>
      s.sql("""
        SELECT n_nationkey FROM nation
        WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9900)
        ORDER BY n_nationkey""")
    },

    // ARRAY(SELECT ...) sublink (reference strips its ORDER BY,
    // query_remapper.go:482-494; here we keep deterministic order)
    // JSON-serialized like op_agg_array_agg (driver comparator sorts all cols)
    Q("op_subquery_array", Some("""
      SELECT r_regionkey,
        CAST(to_json((SELECT list(n_name ORDER BY n_name)
                      FROM nation WHERE n_regionkey = r_regionkey)) AS VARCHAR) AS nations
      FROM region ORDER BY r_regionkey""")) { (s, dir) =>
      t(s, dir, "region")
        .join(t(s, dir, "nation"), col("n_regionkey") === col("r_regionkey"), "left")
        .groupBy("r_regionkey")
        .agg(to_json(sort_array(collect_list(col("n_name")))).as("nations"))
        .orderBy("r_regionkey")
    },

    // bag-semantics set ops: duplicates preserved (ALL variants)
    Q("op_intersect_all", Some("""
      SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 300
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_orderkey >= 150 AND l_orderkey < 450
      ORDER BY k""")) { (s, dir) =>
      s.sql("""
        SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 300
        INTERSECT ALL
        SELECT l_suppkey FROM lineitem WHERE l_orderkey >= 150 AND l_orderkey < 450
        ORDER BY k""")
    },

    Q("op_except_all", Some("""
      SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 300
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_orderkey >= 150 AND l_orderkey < 450
      ORDER BY k""")) { (s, dir) =>
      s.sql("""
        SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 300
        EXCEPT ALL
        SELECT l_suppkey FROM lineitem WHERE l_orderkey >= 150 AND l_orderkey < 450
        ORDER BY k""")
    },

    // row-value IN subquery: (a, b) IN (SELECT x, y ...) — multi-column
    // membership, decorrelated by Catalyst into a semi join on both columns
    Q("op_subquery_row_in", Some("""
      SELECT o_orderkey FROM orders
      WHERE EXISTS (SELECT 1 FROM customer
        WHERE c_acctbal > 9500 AND c_custkey = o_custkey AND o_orderstatus = 'F')
      ORDER BY o_orderkey""")) { (s, dir) =>
      s.sql("""
        SELECT o_orderkey FROM orders
        WHERE (o_custkey, o_orderstatus) IN
          (SELECT c_custkey, 'F' FROM customer WHERE c_acctbal > 9500)
        ORDER BY o_orderkey""")
    },

    // ---- VALUES ---------------------------------------------------------
    Q("op_values", Some("""
      SELECT v.k, v.label, r_name
      FROM (VALUES (0, 'zero'), (2, 'two'), (4, 'four')) AS v(k, label)
      JOIN region ON r_regionkey = v.k
      ORDER BY v.k""")) { (s, dir) =>
      s.sql("""
        SELECT v.k, v.label, r_name
        FROM (VALUES (0, 'zero'), (2, 'two'), (4, 'four')) AS v(k, label)
        JOIN region ON r_regionkey = v.k
        ORDER BY v.k""")
    },

    // ---- window functions ----------------------------------------------
    Q("op_window_rank", Some("""
      SELECT o_custkey, o_orderkey,
        rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS drnk
      FROM orders ORDER BY o_custkey, rn""")) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(w).as("rnk"),
          row_number().over(w).as("rn"),
          dense_rank().over(w).as("drnk"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    Q("op_window_lag_lead", Some("""
      SELECT o_custkey, o_orderkey,
        lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
        lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
      FROM orders ORDER BY o_custkey, o_orderkey""")) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("op_window_running_sum", Some("""
      SELECT o_custkey, o_orderkey,
        round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e2, 2) AS running_total
      FROM orders ORDER BY o_custkey, o_orderkey""")) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(cents(col("o_totalprice"))).over(w).cast("double") / 1e2, 2)
            .as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("op_window_ntile", Some("""
      SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
      FROM customer ORDER BY c_custkey""")) { (s, dir) =>
      val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_custkey"), ntile(4).over(w).as("quartile"))
        .orderBy("c_custkey")
    },

    // ---- CASE -----------------------------------------------------------
    Q("op_case_searched", Some("""
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000 THEN 'big'
             WHEN o_totalprice > 100000 THEN 'medium'
             ELSE 'small' END AS bucket
      FROM orders ORDER BY o_orderkey""")) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "medium")
            .otherwise("small").as("bucket"))
        .orderBy("o_orderkey")
    },

    // simple-form CASE expr WHEN v THEN ... (reference tests :1281-1333)
    Q("op_case_simple", Some("""
      SELECT o_orderkey,
        CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'other' END AS status_name
      FROM orders ORDER BY o_orderkey""")) { (s, dir) =>
      s.sql("""
        SELECT o_orderkey,
          CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'other' END AS status_name
        FROM orders ORDER BY o_orderkey""")
    },

    // ---- casts (cross-engine-stable ones; PG-specific reg* casts live in
    // the dialect layer) --------------------------------------------------
    Q("op_cast", Some("""
      SELECT o_orderkey,
        CAST(o_orderkey AS VARCHAR) AS key_str,
        CAST(floor(o_totalprice) AS BIGINT) AS price_int,
        CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date_str,
        CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num
      FROM orders ORDER BY o_orderkey LIMIT 1000""")) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          floor(col("o_totalprice")).cast("long").as("price_int"),
          col("o_orderdate").cast("date").cast("string").as("order_date_str"),
          substring(col("o_orderpriority"), 1, 1).cast("int").as("prio_num"))
        .orderBy("o_orderkey").limit(1000)
    },

    // ---- null semantics -------------------------------------------------
    Q("op_null_semantics", Some("""
      SELECT c_custkey,
        o_orderkey IS NULL AS no_order,
        coalesce(o_orderkey, -1) AS order_or_default,
        nullif(c_acctbal, 0.0) AS bal_nullif
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      ORDER BY c_custkey, o_orderkey NULLS FIRST""")) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          col("o_orderkey").isNull.as("no_order"),
          coalesce(col("o_orderkey"), lit(-1L)).as("order_or_default"),
          nullif(col("c_acctbal"), lit(0.0)).as("bal_nullif"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    // ---- table functions in FROM ---------------------------------------
    // generate_series (query_remapper_table.go:113-134) -> sequence+explode
    Q("op_generate_series", Some("""
      SELECT s FROM generate_series(1, 100) t(s) ORDER BY s""")) { (s, dir) =>
      s.range(1).select(explode(sequence(lit(1L), lit(100L))).as("s")).orderBy("s")
    },

    // correlated table function in FROM (LATERAL VIEW) — generate_series
    // driven by an outer column (query_remapper_table.go:113-134 family)
    Q("op_lateral_series", Some("""
      SELECT r_name, CAST(unnest(generate_series(0, r_regionkey)) AS INT) AS nk
      FROM region ORDER BY r_name, nk""")) { (s, dir) =>
      s.sql("""
        SELECT r_name, nk FROM region
        LATERAL VIEW explode(sequence(0, r_regionkey)) t AS nk
        ORDER BY r_name, nk""")
    },

    // unnest / explode of a real array column with position
    Q("op_explode_array", Some("""
      SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             unnest(embedding) AS val
      FROM embeddings WHERE vec_id < 10 ORDER BY vec_id, pos""")) { (s, dir) =>
      t(s, dir, "embeddings")
        .filter(col("vec_id") < 10)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .orderBy("vec_id", "pos")
    },

    // skew mitigation: salted replication of a hot-key build side. The
    // per-flag keys are maximally skewed (3 values across all of lineitem);
    // salting fans each hot key across SALT partitions and the replicated
    // dimension restores correctness — the 100 TB recipe for skewed joins
    // (AQE skew-join handles sort-merge cases; salting covers broadcast-free
    // hash joins and groupBys).
    Q("op_join_salted", Some("""
      SELECT l_returnflag, label, count(*) AS n,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem
      JOIN (VALUES ('A', 'returned'), ('N', 'normal'), ('R', 'refused')) f(flag, label)
        ON f.flag = l_returnflag
      GROUP BY l_returnflag, label ORDER BY l_returnflag""")) { (s, dir) =>
      val SALT = 8
      import s.implicits._
      val dim = Seq(("A", "returned"), ("N", "normal"), ("R", "refused"))
        .toDF("flag", "label")
        .withColumn("d_salt", explode(sequence(lit(0), lit(SALT - 1))))
      t(s, dir, "lineitem")
        .withColumn("salt", pmod(hash(col("l_orderkey")), lit(SALT)))
        .join(dim, col("flag") === col("l_returnflag") && col("salt") === col("d_salt"))
        .groupBy("l_returnflag", "label")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // ---- pivot (conditional aggregation at the oracle) ------------------
    Q("op_pivot", Some("""
      SELECT c_nationkey,
        count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS AUTOMOBILE,
        count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS BUILDING,
        count(*) FILTER (WHERE c_mktsegment = 'FURNITURE') AS FURNITURE,
        count(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS HOUSEHOLD,
        count(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS MACHINERY
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .pivot("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .count()
        .na.fill(0)
        .orderBy("c_nationkey")
    }
  )
}
