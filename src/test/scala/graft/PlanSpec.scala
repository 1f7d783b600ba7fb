package graft

/** Physical-plan shape assertions for scale-critical operators: what the
  * oracle gate cannot see (it checks values) and what decides 100 TB
  * behavior — shuffle counts, broadcast choices, filter pushdown. A plan
  * regression here means a query that still returns the right rows but
  * would fall over at cluster scale. */
class PlanSpec extends SparkSpecBase {

  private def plan(name: String): String = {
    Tables.registerAll(spark, sfDir)
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
  }

  private def countOf(pattern: String, s: String): Int =
    pattern.r.findAllIn(s).length

  test("txn snapshot rebind swaps relation PATHS to the pinned version dirs") {
    import spark.implicits._
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-planpin").toString)
    def relPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Nil
          }
      }.flatten
    store.replace("pin_t", Seq((1L, "a")).toDF("k", "v")) // v1
    val txn = new PgDialect.PgTxn
    def execT(sql: String) = PgDialect.execute(spark, store, sql, txn)
    execT("BEGIN ISOLATION LEVEL REPEATABLE READ")
    execT("SELECT count(*) FROM pin_t") // pin at v1
    PgDialect.execute(spark, store, "INSERT INTO pin_t VALUES (2, 'b')") // v2
    // structural proof, not just values: the statement's ANALYZED plan must
    // scan the PINNED dir even though the session view now binds v2
    val pinned = execT("SELECT k FROM pin_t") match {
      case PgDialect.Rows(df, _) => relPaths(df)
      case other => fail(s"$other")
    }
    assert(pinned.nonEmpty && pinned.forall(_.endsWith("/pin_t/v1")),
      s"pinned statement must scan v1: $pinned")
    execT("COMMIT")
    val unpinned = PgDialect.execute(spark, store, "SELECT k FROM pin_t") match {
      case PgDialect.Rows(df, _) => relPaths(df)
      case other => fail(s"$other")
    }
    assert(unpinned.nonEmpty && unpinned.forall(_.endsWith("/pin_t/v2")),
      s"outside the txn the plan scans the current dir: $unpinned")
    // staged own-writes rebind to the txn-private dir
    val txn2 = new PgDialect.PgTxn
    def execT2(sql: String) = PgDialect.execute(spark, store, sql, txn2)
    execT2("BEGIN")
    execT2("INSERT INTO pin_t VALUES (3, 'c')")
    val staged = execT2("SELECT k FROM pin_t") match {
      case PgDialect.Rows(df, _) => relPaths(df)
      case other => fail(s"$other")
    }
    assert(staged.nonEmpty && staged.forall(_.contains("/pin_t/.txn")),
      s"a staging txn's plan must scan its private dir: $staged")
    execT2("ROLLBACK")
    store.drop("pin_t")
  }

  test("as-of join is one hash shuffle plus a window, no join node at all") {
    val p = plan("op_join_asof")
    assert(countOf("Exchange hashpartitioning", p) == 1, p)
    assert(p.contains("Window") || p.contains("RunningWindowFunction"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("range join is a broadcast equi-join on buckets, not a nested loop") {
    val p = plan("op_join_range")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("filter pushdown reaches the parquet scan") {
    // cache-less direct read so the scan node is visible
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(org.apache.spark.sql.functions.col("l_orderkey") < 100)
      .select("l_orderkey", "l_quantity")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("stratified sample is scan-side: no exchange before the sort") {
    val p = plan("txt_sample_stratified")
    assert(countOf("Exchange hashpartitioning", p) == 0, p)
  }

  test("classifier scoring is scan-side: no exchange before the sort") {
    val p = plan("txt_classifier_score")
    // the only exchange allowed is the final presentation ORDER BY's range
    // partitioning — scoring itself must be shuffle-free scan work
    assert(countOf("Exchange hashpartitioning", p) == 0, p)
  }

  test("rasterizing media decodes are scan-side: no exchange before the sort") {
    // pixel/PCM decode must run wherever the binary column lives — any
    // hash exchange would ship payload bytes across the cluster at 100 TB
    for (q <- Seq("mm_pixel_stats", "mm_audio_stats", "mm_video_samples")) {
      val p = plan(q)
      assert(countOf("Exchange hashpartitioning", p) == 0, s"$q: $p")
    }
  }

  test("perceptual media dedups shuffle only the 8-byte fingerprint") {
    // decode + hash stay scan-side; the ONLY hash exchange is the group
    // window keyed on the fingerprint scalar — payload bytes (now read
    // from the STORED binary column) never move
    for ((q, key) <- Seq("mm_image_dedup" -> "dhash", "mm_audio_dedup" -> "ahash",
        "mm_video_dedup" -> "vhash")) {
      val p = plan(q)
      val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(exchanges.nonEmpty, s"$q: expected the fingerprint window shuffle")
      exchanges.foreach(e => assert(e.contains(key), s"$q shuffled on: $e"))
    }
  }

  test("semantic decontamination broadcasts probes, aggregates scalars") {
    val p = plan("sim_semantic_decon")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the grouped max shuffles (vec_id, cos) scalars only — embedding
    // arrays never enter an exchange key or value
    val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.forall(k => !k.contains("pv") && !k.contains("cv")), p)
  }

  test("tfidf broadcasts the term dictionary") {
    val p = plan("txt_tfidf")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  // every hash exchange must partition on scalar cols only (no `v#` /
  // `va#` / `vb#` / `qv#` / `nv#` array columns in the partitioning
  // expressions) — the repo invariant "embedding arrays are never in a
  // shuffle key", pinned for every LSH/IVF candidate path.
  private def assertNoArrayShuffleKeys(p: String): Unit = {
    val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    val arrayCols = Seq("v#", "va#", "vb#", "qv#", "nv#")
    exchanges.foreach { e =>
      arrayCols.foreach(c =>
        assert(!e.contains(c), s"array column shuffled: $e"))
    }
  }

  test("ivf dedups on scalars, never shuffles embedding arrays") {
    val p = plan("sim_ivf")
    assert(p.contains("Exchange hashpartitioning"), p)
    assertNoArrayShuffleKeys(p)
  }

  test("embedding-LSH dedups candidates on scalar ids, never shuffles arrays") {
    val p = plan("dd_embedding_lsh")
    assert(p.contains("Exchange hashpartitioning"), p)
    assertNoArrayShuffleKeys(p)
    // the (id_a, id_b) distinct must not carry the va/vb payloads either:
    // HashAggregate keys are ids, vectors join back after the distinct
    assert(!"HashAggregate\\(keys=\\[[^\\]]*v[ab]#[^\\]]*\\]".r
      .findFirstIn(p).isDefined, p)
  }

  test("ann-LSH dedups candidates on scalar ids, never shuffles arrays") {
    val p = plan("sim_ann_lsh")
    assertNoArrayShuffleKeys(p)
    assert(!"HashAggregate\\(keys=\\[[^\\]]*[qn]v#[^\\]]*\\]".r
      .findFirstIn(p).isDefined, p)
  }

  test("ivfpq ADC scoring shuffles codes and norms, never embedding arrays") {
    val p = plan("sim_ivfpq")
    assert(p.contains("Exchange hashpartitioning"), p)
    assertNoArrayShuffleKeys(p)
    // the candidate dedup and the per-(query, neighbor) ADC aggregation key
    // on scalar ids; the 64-dim vectors appear only at the coarse assign
    // (broadcast centroids) and the SHORTLIST-bounded exact rerank join
    assert(!"HashAggregate\\(keys=\\[[^\\]]*[qn]v#[^\\]]*\\]".r
      .findFirstIn(p).isDefined, p)
  }

  test("bloom decontamination matches the exact broadcast-join operator") {
    // the Bloom bitset is a prefilter only: exact verify kills every false
    // positive, so the two operators must be row-identical
    val exact = SparkEntry.queries("txt_decontaminate")(spark, sfDir)
    val bloom = SparkEntry.queries("txt_bloom_decontaminate")(spark, sfDir)
    assert(bloom.count() == exact.count())
    assert(bloom.except(exact).count() == 0)
    assert(exact.except(bloom).count() == 0)
  }

  test("same-bucketed tables join and aggregate on the key with zero exchanges") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val store = new Store(spark, dir)
    store.replaceBucketed("b_orders",
      spark.read.parquet(s"$sfDir/orders.parquet"), "o_custkey", 4)
    store.replaceBucketed("b_customer",
      spark.read.parquet(s"$sfDir/customer.parquet"), "c_custkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("o_custkey").agg(sum("o_totalprice").as("spend"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p) // bucket layout replaces both shuffles
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("tpch q3 uses broadcast joins for the dimension side") {
    val p = plan("q03_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("broadcast hints are size-gated: over-threshold dims plan without a forced broadcast") {
    // with the gate forced shut (1-byte ceiling) and auto-broadcast off,
    // queries whose only hints are on SF-growing dims (q3: customer,
    // q14/q19: part) must plan WITHOUT any broadcast join — proving the
    // hint is genuinely absent, not merely superseded, so at real scale
    // AQE owns the choice instead of a forced multi-GB broadcast
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.graft.broadcastGateBytes", "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (q <- Seq("q03_shipping_priority", "q14_promo_revenue",
          "q19_discounted_revenue", "q16_supplier_part_counts")) {
        val p = plan(q)
        assert(!p.contains("BroadcastHashJoin"),
          s"$q kept a forced broadcast above the size gate: $p")
      }
      // st_matview_content: supplier (sf-growing) must lose its hint; the
      // one remaining BroadcastExchange is nation's (fixed 25 rows, its
      // unconditional hint is safe at any scale)
      locally {
        val p = plan("st_matview_content")
        assert(countOf("BroadcastExchange", p) == 1,
          s"st_matview_content must broadcast only nation above the gate: $p")
      }
    } finally {
      spark.conf.unset("spark.graft.broadcastGateBytes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
    // gate open again (default ceiling, tiny input): the exact broadcast
    // plans return — the pins above ("q3 uses broadcast joins", q9, q17)
    // re-verify this on the default path
    assert(plan("q03_shipping_priority").contains("BroadcastHashJoin"))
  }

  test("shuffle-hash hints are size-gated: oversized builds fall back to sort-merge") {
    // with the gate forced shut (1-byte ceiling) and auto-broadcast off,
    // every query carrying a SHUFFLE_HASH hint on the orders side must plan
    // WITHOUT a shuffled-hash join — proving the hint is genuinely absent
    // above the gate — and land on sort-merge, the strategy that spills
    // instead of OOMing when a forced build partition outgrows memory
    // (guide §3.1's caveat; the per-partition estimate is what the gate
    // checks, Tables.shjSized)
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.graft.shjGateBytes", "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (q <- Seq("q03_shipping_priority", "q07_volume_shipping",
          "q12_priority_by_linestatus", "q13_customer_distribution",
          "q21_waiting_supplier", "q22_global_sales_opportunity")) {
        val p = plan(q)
        assert(!p.contains("ShuffledHashJoin"),
          s"$q kept a forced shuffled-hash join above the size gate: $p")
        assert(p.contains("SortMergeJoin"),
          s"$q must fall back to sort-merge above the gate: $p")
      }
    } finally {
      spark.conf.unset("spark.graft.shjGateBytes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
    // gate open again (default ceiling, tiny input): the hinted
    // shuffled-hash plan returns
    val p = plan("q13_customer_distribution")
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("tpch q18 reads lineitem exactly once") {
    // the HAVING subquery and the outer per-order sum are one aggregate:
    // a second lineitem scan would double the dominant-table IO at scale
    val p = plan("q18_large_volume_customers")
    assert(countOf("lineitem\\.parquet", p) == 1, p)
  }

  test("tpch q21 reads lineitem exactly once") {
    val p = plan("q21_waiting_supplier")
    assert(countOf("lineitem\\.parquet", p) == 1, p)
  }

  test("tpch q17 prunes lineitem by broadcast before its only shuffle") {
    // one lineitem scan, broadcast part filter applied scan-side, and the
    // correlated avg computed by a partition window over the REDUCED set —
    // no full-table exchange on l_partkey, no threshold join
    val p = plan("q17_small_quantity_revenue")
    assert(countOf("lineitem\\.parquet", p) == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("rolled-up plan scans the matview state, never the fact table") {
    import spark.implicits._
    Tables.registerAll(spark, sfDir)
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-planru").toString)
    store.replace("pr_fact", (1L to 5000L).map(k =>
      (k, s"g${k % 11}", k * 2)).toDF("k", "g", "x"))
    store.createMatview("pr_mv",
      "SELECT g, count(*) AS n_rows, sum(x) AS sum_x FROM pr_fact GROUP BY g")
    val res = PgDialect.execute(spark, store,
      "SELECT g, sum(x) AS total FROM pr_fact GROUP BY g")
    val p = res match {
      case PgDialect.Rows(df, _) => df.queryExecution.executedPlan.toString
      case other => fail(s"expected rows, got $other")
    }
    // the physical scan reads the VIEW's version dir (pr_mv), not the
    // fact table's — the whole point of the rewrite at 100 TB
    assert(p.contains("pr_mv"), p)
    assert(!p.contains("pr_fact/"), p)
    // and the star-IVM delta join broadcasts the dims (scale shape of the
    // incremental refresh: fact delta shuffles, dims do not)
    store.replace("pr_dim", (0L to 10L).map(d => (d, s"bucket${d % 3}")).toDF("d_id", "b"))
    store.createMatview("pr_jmv", """SELECT b, count(*) AS n_rows, sum(x) AS sum_x
      FROM pr_fact JOIN pr_dim ON pr_fact.k = pr_dim.d_id GROUP BY b""")
    val jp = spark.table("pr_jmv").queryExecution.executedPlan.toString
    assert(jp.nonEmpty) // view materialized; the build plan is checked below
    import org.apache.spark.sql.functions.col
    store.append("pr_fact", Seq((9001L, "g1", 4L)).toDF("k", "g", "x"))
    // capture the refresh's delta plan shape via a fresh full-build frame
    // of the same formulation: fact ⋈ broadcast-sized dim
    val delta = store.read("pr_fact").as("pr_fact")
      .join(store.read("pr_dim").as("pr_dim"), col("pr_fact.k") === col("pr_dim.d_id"))
      .groupBy("b").count()
    assert(delta.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("AQE splits a skewed join partition: final plan carries skew=true") {
    // The hot-key story at 100 TB: one orderkey holding ~20% of lineitem
    // lands one shuffle partition far over its peers, and the q03/q18-shape
    // sort-merge join stalls on the straggler unless AQE's skew-join splits
    // it. Pin that it ENGAGES (the executed plan's SMJ is marked
    // skew=true), not just that the setting is on. Thresholds are scaled
    // to test volume the same way production would scale them to partition
    // size; the MECHANISM (OptimizeSkewedJoin splitting the oversized
    // partition into parallel sub-reads) is volume-independent.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // lineitem-shaped fact: hot orderkey 0 holds 50% of 200k rows — its
      // shuffle partition lands ~5x the median, far over factor 2
      val fact = spark.range(200000)
        .select(when(col("id") % 2 === 0, 0L).otherwise(col("id") % 997).as("okey"),
          col("id").as("qty"),
          lpad(col("id").cast("string"), 64, "x").as("pad"))
      val dim = spark.range(1000).select(col("id").as("okey"),
        concat(lit("prio"), col("id") % 5).as("prio"))
      val joined = fact.join(dim, "okey")
        .groupBy("prio").agg(sum("qty").as("s"), count(lit(1)).as("n"))
      assert(joined.collect().map(_.getLong(2)).sum == 200000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join must have split the hot partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
