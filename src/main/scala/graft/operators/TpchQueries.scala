package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named query with an optional DuckDB oracle (driver contract).
  *
  * Oracle-match conventions (hash-compare is exact, so arithmetic must be
  * bit-identical across Spark and DuckDB):
  *   - Monetary inputs are 2-dp doubles; all money math runs in exact
  *     fixed-point: cents as BIGINT, products of small integer factors
  *     (never overflowing at benchmark scales — |Σ| < 2^63 holds through
  *     TPC-H sf≈1000 per group; the 100 TB global-aggregate path upcasts
  *     the same products to DECIMAL at the final merge, one-line switch),
  *     summed exactly, rounded to 2 dp in INTEGER space (half away from
  *     zero — Spark's round() rounds the shortest decimal repr of a double
  *     while DuckDB rounds the exact binary value, so any double-side
  *     rounding of a .xx5-boundary sum diverges), then converted to DOUBLE.
  *     Both engines perform the identical op sequence, so results are
  *     bit-equal. Fixed-point longs also keep aggregation inside
  *     whole-stage codegen's fast path (a wide DecimalType sum falls back
  *     to BigDecimal buffers — ~3x slower).
  *   - Averages/ratios are a single double division of exact operands.
  *   - Integral sums go through BIGINT casts (DuckDB sum(int) is hugeint).
  *   - Every result has a total ORDER BY so row order is deterministic.
  */
final case class Q(name: String, oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

object Qdsl {
  /** Exact cents of a 2-dp double. The +0.5/floor form kills the fp
    * representation dust exactly like round() would — a 2-dp money value's
    * *100 product is an integer ± ~1e-10 dust, never near a .5 boundary, so
    * floor(x*100 + 0.5) lands on the same integer for either dust sign and
    * either value sign — but floor stays a codegen intrinsic. Spark's
    * round(double) allocates BigDecimal.valueOf per row, which measurably
    * drags the per-row money path (q01/q08/q09 compute 2-3 of these per
    * lineitem row). Only for true half-boundary doubles (e.g. an exact
    * -0.125) would the two differ; money columns cannot produce those. */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")
  /** extendedprice * (1-discount), exact, in units of 1e-4 dollars */
  val discProd: Column =
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
  /** extendedprice * (1-discount) * (1+tax), exact, units of 1e-6 dollars */
  val chargeProd: Column = discProd * (lit(100L) + cents(col("l_tax")))
  /** Integer-exact sum -> dollars at 2 dp as double; `unit` = units per $.
    * Contract: the SUM itself is exact to 1e38 (sum128, a two-long 128-bit
    * DeclarativeAggregate), and the +u/2 half-adjust happens on the exact
    * decimal sum — but the subsequent /u division and floor run in DOUBLE
    * after the cast, so above 2^53 the result is not exact in the absolute
    * sense; it is ENGINE-CONSISTENT: the single decimal->double conversion
    * sits at the same point as the DuckDB oracle's HUGEINT->double (same
    * IEEE op sequence), so hash compares stay boundary-proof at every SF.
    * Rounding in integer space before any division avoids the classic
    * `round(sum/unit, 2)` .xx5-boundary divergence (bit us on q09 at
    * sf0.001). */
  def msum(c: Column, unit: Double): Column = {
    val u = unit.toLong
    // sum128, not sum: a BIGINT sum of 1e-6-dollar units stays in range
    // to ~SF600 per group, but the rounding's *100 crossed 2^63 at SF10
    // (observed live: ARITHMETIC_OVERFLOW aborted 14 bench queries at
    // volume).
    val s = call_function("sum128", c)
    val cents = floor((abs(s) * 100 + lit(u / 2)).cast("double") / u).cast("long")
    (when(s < lit(0), -cents).otherwise(cents).cast("double") / 100.0)
  }
  def ts(s: String): Column = lit(s).cast("timestamp")

  // DuckDB oracle fragments mirroring the expressions above
  val C_EP = "CAST(round(l_extendedprice*100) AS BIGINT)"
  val DISC_O = s"$C_EP * (100 - CAST(round(l_discount*100) AS BIGINT))"
  val CHARGE_O = s"$DISC_O * (100 + CAST(round(l_tax*100) AS BIGINT))"
  /** oracle: the same integer-exact half-up rounding as [[msum]] — identical
    * IEEE op sequence, so the hash compare is boundary-proof. The half-up
    * offset uses `//` (DuckDB integer division): with `/` the offset is
    * DOUBLE, which promotes the whole sum to double BEFORE the cast — for
    * |sum|*100 >= 2^53 that order of rounding disagrees with Spark's
    * Long-space addition in ~0.07% of values. `//` keeps the addition in
    * HUGEINT space so the single integer->double cast matches Spark's
    * long->double cast bit-for-bit. */
  def msumO(expr: String, unit: String): String =
    s"(CAST(CASE WHEN sum($expr) < 0 THEN -1 ELSE 1 END * " +
      s"CAST(floor(CAST(abs(sum($expr)) * 100 + CAST($unit AS BIGINT) // 2 AS DOUBLE) / $unit) AS BIGINT) " +
      s"AS DOUBLE) / 100)"
  val sumDiscO: String = msumO(DISC_O, "1e4")
  val sumChargeO: String = msumO(CHARGE_O, "1e6")
}

/** TPC-H queries 1-22 adapted to the driver's synthetic star schema
  * (TESTDATA.md: no partsupp, no comment/phone/shipmode columns — those
  * predicates are re-targeted at existing columns, keeping each query's
  * operator shape: q2/q17 correlated scalar subqueries, q4/q21 EXISTS /
  * NOT EXISTS, q13 left join distribution, q18 IN over HAVING, q19
  * OR-of-ANDs, q22 anti join + scalar subquery).
  *
  * Reference workload: /root/reference/benchmark/query-templates/{1..22}.sql,
  * executed by BemiDB via DuckDB (/root/reference/src/server/query_handler.go:75-91).
  * Here each is declared with the DataFrame API so Catalyst plans scans with
  * pushed filters/pruned columns and AQE picks join strategies; small
  * dimensions are broadcast explicitly.
  */
object TpchQueries {
  import Qdsl._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  /** Size-gated broadcast hint for a scale-factor-growing dimension
    * (customer/part/supplier): apply `f` (filter/projection) and hint
    * broadcast ONLY when [[Tables.broadcastSized]] approves the base
    * table's measured size (analyzed stats first, on-disk bytes
    * otherwise). Above the gate the frame returns unhinted and
    * AQE/autoBroadcastJoinThreshold picks the join strategy at runtime —
    * an explicit hint would override both unconditionally, turning a 100x
    * scale-up into a forced multi-GB broadcast. Gating on the BASE size is
    * conservative: filters only shrink the input, and a gated-out filtered
    * dim can still broadcast at runtime once AQE sees its true size.
    * nation/region (fixed-cardinality) and tiny derived aggregates keep
    * their unconditional hints. */
  private def bdim(s: SparkSession, dir: String, n: String)(
      f: DataFrame => DataFrame = identity): DataFrame = Tables.bdim(s, dir, n)(f)

  val defs: Seq[Q] = Seq(
    Q("q01_pricing_summary", Some(s"""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        ${msumO(C_EP, "1e2")} AS sum_base_price,
        $sumDiscO AS sum_disc_price,
        $sumChargeO AS sum_charge,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
        ${msumO(C_EP, "1e2")} / count(*) AS avg_price,
        ${msumO("CAST(round(l_discount*100) AS BIGINT)", "1e2")} / count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          msum(cents(col("l_extendedprice")), 1e2).as("sum_base_price"),
          msum(discProd, 1e4).as("sum_disc_price"),
          msum(chargeProd, 1e6).as("sum_charge"),
          (sum(col("l_quantity").cast("long")).cast("double") / count(lit(1))).as("avg_qty"),
          (msum(cents(col("l_extendedprice")), 1e2) / count(lit(1))).as("avg_price"),
          (msum(cents(col("l_discount")), 1e2) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // q2 shape: correlated scalar subquery picking the best supplier per group
    Q("q02_top_supplier_per_nation", Some("""
      SELECT s_name, s_acctbal, n_name
      FROM supplier, nation, region
      WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
        AND s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = supplier.s_nationkey)
      ORDER BY s_name""")) { (s, dir) =>
      val sup = t(s, dir, "supplier")
      val maxBal = sup.groupBy(col("s_nationkey").as("mb_nationkey"))
        .agg(max("s_acctbal").as("max_bal"))
      sup
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .join(broadcast(maxBal),
          col("s_nationkey") === col("mb_nationkey") && col("s_acctbal") === col("max_bal"))
        .select("s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    },

    Q("q03_shipping_priority", Some(s"""
      SELECT l_orderkey, $sumDiscO AS revenue, o_orderdate
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10""")) { (s, dir) =>
      // r13: the o_orderdate < X window keeps ~95% of orders — the planner
      // still broadcast it (140k rows x 3 cols hash-built on the driver per
      // execution). SHUFFLE_HASH moves the build into the task: zero
      // exchange under the orderkey-clustered cache/bucketing, and at any
      // scale this near-unfiltered join is past the broadcast gate anyway
      // (guide §3.1: shuffled hash over sort-merge, no sort). r14: the hint
      // is size-gated on the PER-PARTITION build estimate (Tables.shj) —
      // §3.1's OOM caveat applies once a forced build partition outgrows
      // executor memory; above the gate the planner/AQE fall back to SMJ.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") > ts("1998-03-15"))
        .join(Tables.shj(s, dir, "orders")(
            _.filter(col("o_orderdate") < ts("1998-03-15"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(bdim(s, dir, "customer")(_.filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(msum(discProd, 1e4).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // q4 shape: EXISTS with a correlated extra predicate. r13: the literal
    // left-semi plan broadcast-built the WHOLE lineitem side (600k rows at
    // sf0.1 — a ~300 ms driver-side HashedRelation build per execution, and
    // a forced multi-GB broadcast the moment a scale-up crosses the 64m
    // gate). EXISTS(l_shipdate > o_orderdate) per order is exactly
    // max(l_shipdate) > o_orderdate (empty/all-null group -> NULL -> false,
    // same as EXISTS over no rows), so aggregate lineitem per order first —
    // exchange-free under the orderkey-clustered cache layout, one narrow
    // two-column shuffle at cluster scale — and join the 3-month order
    // window against it (guide §3.1: broadcast the side that is small,
    // never the fact table).
    Q("q04_order_priority", Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")) { (s, dir) =>
      // r14: the order window joins via size-gated in-task SHUFFLE_HASH
      // build instead of the auto-broadcast (a per-execution driver build).
      // Both sides sit on the orderkey clustering, so the SHJ is
      // exchange-free at every measured partition count (SF1 parts=6 plan
      // has one FEWER exchange than the broadcast variant). Measured A/B
      // (paired, interleaved, identical results): sf0.1 seq med
      // 0.212->0.199 / 16-way 0.791->0.742; SF1 seq 0.480->0.463 / 16-way
      // med 8.03->6.60. Above the gate the planner/AQE own the choice.
      val o = Tables.shj(s, dir, "orders")(
        _.filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01")))
      // Pre-filter before the aggregate (guide §2.3): any qualifying line
      // has l_shipdate > o_orderdate >= window start, so lines at or before
      // the window start can never satisfy the EXISTS — dropping them
      // changes no order's verdict and cuts the aggregate input ~4x.
      val latestShip = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > ts("1997-01-01"))
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("mx_ship"))
      latestShip.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("mx_ship") > col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    Q("q05_local_supplier_volume", Some(s"""
      SELECT n_name, $sumDiscO AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(bdim(s, dir, "customer")(), col("o_custkey") === col("c_custkey"))
        .join(bdim(s, dir, "supplier")(),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(msum(discProd, 1e4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    Q("q06_forecast_revenue", Some(s"""
      SELECT ${msumO(s"$C_EP * CAST(round(l_discount*100) AS BIGINT)", "1e4")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""")) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
          && col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
        .agg(msum(cents(col("l_extendedprice")) * cents(col("l_discount")), 1e4).as("revenue"))
    },

    Q("q07_volume_shipping", Some(s"""
      SELECT supp_nation, cust_nation, l_year,
        ${msumO("volume", "1e4")} AS revenue
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(extract(year FROM l_shipdate) AS INT) AS l_year,
              $DISC_O AS volume
            FROM supplier, lineitem, orders, customer, nation n1, nation n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
              AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
           ) shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year""")) { (s, dir) =>
      val n1 = t(s, dir, "nation").select(
        col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(
        col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      // r13: unfiltered orders side — SHUFFLE_HASH instead of a 150k-row
      // driver broadcast build per execution (zero exchange under the
      // orderkey clustering; SHJ-not-SMJ at shuffle scale, guide §3.1).
      // r14: size-gated per-partition (see q03 note).
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31")))
        .join(Tables.shj(s, dir, "orders")(),
          col("o_orderkey") === col("l_orderkey"))
        .join(bdim(s, dir, "supplier")(), col("s_suppkey") === col("l_suppkey"))
        .join(bdim(s, dir, "customer")(), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .withColumn("l_year", year(col("l_shipdate")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(msum(discProd, 1e4).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // q8 shape: conditional aggregation ratio (market share)
    Q("q08_market_share", Some(s"""
      SELECT o_year,
        ${msumO("CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END", "1e4")}
          / ${msumO("volume", "1e4")} AS mkt_share
      FROM (SELECT CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
              $DISC_O AS volume, n2.n_name AS nation
            FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
              AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
              AND s_nationkey = n2.n_nationkey
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
              AND p_type = 'ECONOMY') all_nations
      GROUP BY o_year
      ORDER BY o_year""")) { (s, dir) =>
      val n1 = t(s, dir, "nation").select(
        col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
      val n2 = t(s, dir, "nation").select(
        col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
      t(s, dir, "lineitem")
        .join(bdim(s, dir, "part")(_.filter(col("p_type") === "ECONOMY")),
          col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(bdim(s, dir, "customer")(), col("o_custkey") === col("c_custkey"))
        .join(bdim(s, dir, "supplier")(), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
        .join(broadcast(t(s, dir, "region")), col("n1_region") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
        .select(year(col("o_orderdate")).as("o_year"), discProd.as("volume"), col("nation"))
        .groupBy("o_year")
        .agg((msum(when(col("nation") === "NATION_5", col("volume")).otherwise(0L), 1e4)
          / msum(col("volume"), 1e4)).as("mkt_share"))
        .orderBy("o_year")
    },

    // q9 shape: profit per nation/year; supply cost proxied by p_retailprice.
    // amount in units of 1e-4 $: disc - retail_cents * qty * 100
    Q("q09_product_profit", Some(s"""
      SELECT nation, o_year, ${msumO("amount", "1e4")} AS sum_profit
      FROM (SELECT n_name AS nation, CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
              $DISC_O - CAST(round(p_retailprice*100) AS BIGINT) * CAST(l_quantity AS BIGINT) * 100 AS amount
            FROM part, supplier, lineitem, orders, nation
            WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
              AND s_nationkey = n_nationkey AND p_name LIKE '%widget%') profit
      GROUP BY nation, o_year
      ORDER BY nation, o_year DESC""")) { (s, dir) =>
      val amount = discProd -
        cents(col("p_retailprice")) * col("l_quantity").cast("long") * lit(100L)
      // r13: examined and deliberately left on the broadcast plan. The
      // 12.5%-selective part join runs first (guide §2.3), so by the time
      // the orders join happens the stream is ~75k rows; a SHUFFLE_HASH
      // hint here was measured 40% SLOWER control-normalized — with
      // broadcast joins interposed Spark 4.1 re-shuffles both shuffled-join
      // sides (ENSURE_REQUIREMENTS over SinglePartition children), and
      // those two exchanges cost more than the driver-side orders build
      // they remove. At scale the 64m auto-threshold retires the broadcast.
      t(s, dir, "lineitem")
        .join(bdim(s, dir, "part")(_.filter(col("p_name").like("%widget%"))),
          col("p_partkey") === col("l_partkey"))
        .join(bdim(s, dir, "supplier")(), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
          amount.as("amount"))
        .groupBy("nation", "o_year")
        .agg(msum(col("amount"), 1e4).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    Q("q10_returned_items", Some(s"""
      SELECT c_custkey, c_name, $sumDiscO AS revenue, c_acctbal, n_name
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""")) { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(bdim(s, dir, "customer")(), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(msum(discProd, 1e4).as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // q11 shape: HAVING against a scalar subquery aggregate. The threshold
    // derives from the exact integer grand total (per-part double sums would
    // reintroduce order-dependent fp error).
    Q("q11_important_parts", Some(s"""
      WITH pv AS (
        SELECT l_partkey, CAST(sum($DISC_O) AS DOUBLE) AS v4
        FROM lineitem GROUP BY l_partkey)
      SELECT l_partkey, round(v4 / 1e4, 2) AS value
      FROM pv
      WHERE v4 > (SELECT CAST(sum($DISC_O) AS DOUBLE) * 0.001 FROM lineitem)
      ORDER BY value DESC, l_partkey""")) { (s, dir) =>
      // r14: the threshold is a DIRECT global sum over lineitem — exact
      // integer sums are associative, so sum(discProd) == sum of pv's
      // per-part sums bit-for-bit (the DuckDB oracle computes it this way
      // too). r13 had it re-aggregate pv so the twin subtrees could share
      // one AQE runtime stage at parts>1; MEASURED this round (Profile at
      // SF1-volume, parts=6): AQE does NOT reuse the twin stages — the
      // 200k-key hash aggregate ran twice (2 x 6 tasks x ~2 s task time).
      // The direct form replaces that second hash pass with a 1-group
      // partial aggregate (no hash table, no exchange): measured A/B
      // (paired, interleaved, identical results) sf0.1 seq 0.193->0.149 /
      // 16-way 0.592->0.507; SF1 seq 0.781->0.574 / 16-way 7.00->4.22.
      // Still two lineitem scans at any scale, like before — but the
      // second now aggregates to one row scan-side. The one-pass global
      // window stays rejected (single-task funnel at 100 TB, r13 record).
      val pv = t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(discProd).as("v4i"))
      val threshold = t(s, dir, "lineitem")
        .agg((sum(discProd).cast("double") * 0.001).as("thr"))
      pv.join(broadcast(threshold))
        .filter(col("v4i").cast("double") > col("thr"))
        .select(col("l_partkey"), round(col("v4i").cast("double") / 1e4, 2).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },

    // q12 shape: two conditional sums (shipmode re-targeted at linestatus)
    Q("q12_priority_by_linestatus", Some("""
      SELECT l_linestatus,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_linestatus
      ORDER BY l_linestatus""")) { (s, dir) =>
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
        // r13: SHUFFLE_HASH — orders is unfiltered here; see q03 note
        // (r14: size-gated per-partition)
        .join(Tables.shj(s, dir, "orders")(),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!isHigh, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // q13 shape: left outer join + distribution of counts
    Q("q13_customer_distribution", Some("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""")) { (s, dir) =>
      // r13: SHUFFLE_HASH — the preserved-side outer join can only build
      // right (orders, the fact side); without the hint that is a 150k-row
      // driver broadcast build per execution, and at scale both sides are
      // big so the exchange happens regardless (SHJ-not-SMJ, guide §3.1).
      // r14: size-gated per-partition (see q03 note).
      t(s, dir, "customer")
        .join(Tables.shj(s, dir, "orders")(),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    Q("q14_promo_revenue", Some(s"""
      SELECT ${msumO(s"CASE WHEN p_type = 'PROMO' THEN $DISC_O ELSE 0 END", "1e4")} * 100.0
           / ${msumO(DISC_O, "1e4")} AS promo_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""")) { (s, dir) =>
      // r14: part joined via size-gated in-task SHUFFLE_HASH build instead
      // of a driver-built broadcast. The broadcast build was a per-execution
      // driver job (Profile: 17 ms stage + driver rest); the one-month
      // lineitem filter keeps ~1.25% of the fact side, so the exchange the
      // hint adds at parts>1 is of the REDUCED stream. Measured A/B
      // (paired, interleaved, identical results): sf0.1 seq med 0.148->0.141
      // / 16-way 0.428->0.363; SF1 (parts=6) seq 0.335->0.268 / 16-way flat
      // (0.972 vs 0.973). Above the shj gate the hint drops and
      // AQE/auto-broadcast own the choice, as everywhere else.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-03-01") && col("l_shipdate") < ts("1996-04-01"))
        .join(Tables.shj(s, dir, "part")(), col("l_partkey") === col("p_partkey"))
        .agg(((msum(when(col("p_type") === "PROMO", discProd).otherwise(0L), 1e4) * 100.0)
          / msum(discProd, 1e4)).as("promo_revenue"))
    },

    // q15 shape: CTE + scalar-subquery max
    Q("q15_top_supplier", Some(s"""
      WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no, $sumDiscO AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier, revenue0
      WHERE s_suppkey = supplier_no
        AND total_revenue = (SELECT max(total_revenue) FROM revenue0)
      ORDER BY s_suppkey""")) { (s, dir) =>
      val revenue0 = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(msum(discProd, 1e4).as("total_revenue"))
      val maxRev = revenue0.agg(max("total_revenue").as("max_rev"))
      t(s, dir, "supplier")
        .join(revenue0, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(maxRev))
        .filter(col("total_revenue") === col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // q16 shape: NOT IN subquery + count(distinct)
    Q("q16_supplier_part_counts", Some("""
      SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem, part
      WHERE p_partkey = l_partkey
        AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        AND p_size IN (1,5,10,15,20,25,30,35)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")) { (s, dir) =>
      // badSupp is ~10% of supplier and GROWS with SF — gate its broadcast
      // on the base table's measured size like every other sf-growing dim
      // (an ungated hint here is tens of millions of rows per executor at
      // 100 TB-class SF); above the gate the anti-join shuffles on the key
      val badSupp = bdim(s, dir, "supplier")(
        _.filter(col("s_acctbal") < 0).select("s_suppkey"))
      t(s, dir, "lineitem")
        .join(bdim(s, dir, "part")(_.filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
              && col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))),
          col("p_partkey") === col("l_partkey"))
        .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // q17 shape: correlated scalar subquery with aggregate (avg per part)
    Q("q17_small_quantity_revenue", Some(s"""
      SELECT ${msumO(C_EP, "1e2")} / 7.0 AS avg_yearly
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
        AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = part.p_partkey)""")) { (s, dir) =>
      // One lineitem scan, broadcast-pruned to Brand#3 lines BEFORE any
      // shuffle: the correlated avg only involves partkeys that survive the
      // part filter, and restricting rows to those partkeys drops no rows
      // of theirs, so the per-part avg is unchanged. The partition-only
      // window then computes the threshold in ONE exchange of the reduced
      // set — no full-table shuffle, no threshold join. At SF10 the old
      // plan shuffled all 60M rows on l_partkey; this shuffles ~1/25.
      // avg(l_quantity) is exact: integral doubles sum exactly in any order.
      import org.apache.spark.sql.expressions.Window
      val brandLines = t(s, dir, "lineitem")
        .join(bdim(s, dir, "part")(_.filter(col("p_brand") === "Brand#3").select("p_partkey")),
          col("p_partkey") === col("l_partkey"))
      brandLines
        .withColumn("qty_thr",
          lit(0.2) * avg(col("l_quantity")).over(Window.partitionBy("l_partkey")))
        .filter(col("l_quantity") < col("qty_thr"))
        .agg((msum(cents(col("l_extendedprice")), 1e2) / 7.0).as("avg_yearly"))
    },

    // q18 shape: IN over a HAVING subquery
    Q("q18_large_volume_customers", Some("""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM customer, orders, lineitem
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING sum(CAST(l_quantity AS BIGINT)) > 170)
        AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      LIMIT 100""")) { (s, dir) =>
      // single lineitem scan: the HAVING subquery and the outer sum are the
      // same per-order aggregate (the outer GROUP BY keys are unique per
      // order), so aggregate once and join — no second scan, no regroup
      // r13: without a hint the planner broadcast the whole ORDERS scan
      // (BuildLeft, 150k rows x 4 cols built on the driver per execution);
      // the filtered per-order aggregate is the genuinely small side —
      // |perOrder| <= |orders| rows and 2 long columns — so hint IT,
      // size-gated on the orders base table like every sf-growing dim
      // (above the gate AQE picks the strategy from true runtime sizes).
      val perOrder0 = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 170)
      val perOrder = if (Tables.broadcastSized(s, dir, "orders"))
        broadcast(perOrder0) else perOrder0
      t(s, dir, "orders")
        .join(perOrder, col("o_orderkey") === col("l_orderkey"))
        .join(bdim(s, dir, "customer")(), col("c_custkey") === col("o_custkey"))
        .select(
          col("c_name"),
          col("c_custkey"),
          col("o_orderkey"),
          col("o_orderdate"),
          col("o_totalprice"),
          col("total_qty")
        )
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    },

    // q19 shape: OR-of-ANDs multi-predicate join
    Q("q19_discounted_revenue", Some(s"""
      SELECT $sumDiscO AS revenue
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND (
           (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40))""")) { (s, dir) =>
      val pred =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) && col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) && col("l_quantity").between(20, 40))
      t(s, dir, "lineitem")
        .join(bdim(s, dir, "part")(), col("p_partkey") === col("l_partkey"))
        .filter(pred)
        .agg(msum(discProd, 1e4).as("revenue"))
    },

    // q20 shape: IN-subquery (semi join) over a join with value predicate
    Q("q20_potential_promotion", Some("""
      SELECT s_name, s_acctbal
      FROM supplier, nation
      WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
        AND s_suppkey IN (SELECT l_suppkey FROM lineitem, part
                          WHERE p_partkey = l_partkey AND p_name LIKE '%bolt%'
                            AND l_quantity > 30)
      ORDER BY s_name""")) { (s, dir) =>
      val shippers = t(s, dir, "lineitem").filter(col("l_quantity") > 30)
        .join(bdim(s, dir, "part")(_.filter(col("p_name").like("%bolt%"))),
          col("p_partkey") === col("l_partkey"))
        .select("l_suppkey")
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    },

    // q21 shape: EXISTS + NOT EXISTS with inequality correlation
    Q("q21_waiting_supplier", Some("""
      SELECT s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders, nation
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
        AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
      GROUP BY s_name
      ORDER BY numwait DESC, s_name""")) { (s, dir) =>
      // single-scan formulation: the EXISTS pair is a per-order condition —
      //   EXISTS l2 (other supplier in the order)      <=> nd_all > 1
      //   NOT EXISTS l3 (other supplier also flagged R) <=> nd_r = 1
      // and each qualifying order contributes its cnt_r R-rows (all by the
      // same supplier) to numwait. One lineitem scan + one shuffle on
      // l_orderkey replaces three scans and semi/anti self-joins.
      // distinct-counts as min/max (no Expand, plain map-side-combining
      // aggregates): >1 distinct suppliers <=> min != max; exactly one
      // distinct R-supplier <=> cnt_r >= 1 and min_r = max_r
      // r13: the o_orderstatus = 'F' restriction is per-ORDER, so semi-join
      // lineitem to the F-orderkeys BEFORE the 5-function aggregate — no
      // surviving order loses any of its lines, and the aggregate's input
      // drops to the F fraction (~33% here) instead of aggregating all of
      // lineitem and semi-joining after (guide §2.3: reduce before the
      // expensive operator). SHUFFLE_HASH puts the F-key hash build in the
      // task (it was a 50k-key driver broadcast per execution), and the
      // join sits DIRECTLY over the orderkey-clustered cache so it is
      // exchange-free; the aggregate reuses the same clustering.
      // (r14: the hint is size-gated per-partition, see q03 note)
      val fLines = t(s, dir, "lineitem")
        .join(
          Tables.shj(s, dir, "orders")(
            _.filter(col("o_orderstatus") === "F").select("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"),
          "left_semi"
        )
      val perOrder = fLines
        .groupBy(col("l_orderkey"))
        .agg(
          min(col("l_suppkey")).as("mn_all"),
          max(col("l_suppkey")).as("mx_all"),
          min(when(col("l_returnflag") === "R", col("l_suppkey"))).as("r_supp"),
          max(when(col("l_returnflag") === "R", col("l_suppkey"))).as("mx_r"),
          count(when(col("l_returnflag") === "R", lit(1))).as("cnt_r")
        )
        .filter(col("mn_all") =!= col("mx_all") && col("cnt_r") > 0 && col("r_supp") === col("mx_r"))
      perOrder
        .join(bdim(s, dir, "supplier")(), col("s_suppkey") === col("r_supp"))
        .join(
          broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey")
        )
        .groupBy("s_name")
        .agg(sum(col("cnt_r")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // q22 shape: anti join + uncorrelated scalar subquery threshold
    Q("q22_global_sales_opportunity", Some(s"""
      SELECT cntrycode, count(*) AS numcust,
        ${msumO("CAST(round(c_acctbal*100) AS BIGINT)", "1e2")} AS totacctbal
      FROM (SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, c_acctbal, c_custkey
            FROM customer
            WHERE c_nationkey % 5 IN (0, 1, 2)
              AND c_acctbal > (SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE) / 1e2 / count(*)
                               FROM customer WHERE c_acctbal > 0.0)) custsale
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY cntrycode
      ORDER BY cntrycode""")) { (s, dir) =>
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(cents(col("c_acctbal"))).cast("double") / 1e2 / count(lit(1))).as("avg_bal"))
      // r13: anti join FIRST (it commutes with the per-row filters), with
      // SHUFFLE_HASH — the anti join must build the orders side (150k keys
      // broadcast-built on the driver per execution before); placing it
      // directly over the custkey-clustered customer cache keeps that side
      // exchange-free, and the build runs in the task, not on the driver.
      // r14: size-gated per-partition (see q03 note); the VERDICT-flagged
      // ~15% sequential regression was re-measured this round — see
      // OPTIMIZATION_r14.md for the paired A/B that decided the hint's fate.
      cust
        .filter((col("c_nationkey") % 5).isin(0, 1, 2))
        .join(Tables.shj(s, dir, "orders")(),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .select((col("c_nationkey") % 5).cast("int").as("cntrycode"), col("c_acctbal"))
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"), msum(cents(col("c_acctbal")), 1e2).as("totacctbal"))
        .orderBy("cntrycode")
    }
  )
}
