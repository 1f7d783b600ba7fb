package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column (builder
  * brief). Two paths:
  *
  *  - `sim_cosine_topk`: brute-force cosine top-k — the correctness baseline.
  *    Fine for a handful of query vectors at any corpus size (one pass over
  *    the corpus per batch of queries, map-side only after the broadcast of
  *    the query set), but O(Q * N) overall.
  *  - `sim_ann_lsh`: random-hyperplane LSH — the 100 TB path. Signatures are
  *    scan-side; the candidate join shuffles only (bucket) keys, so cost
  *    scales with bucket occupancy, not N^2. Recall vs brute force is pinned
  *    by SimilaritySpec.
  */
object Similarity {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  private val queryIds = Seq(0L, 1L, 2L, 3L, 4L)
  private val TOPK = 10

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  // codegen'd one-pass expressions (functions/Expressions.scala) — same
  // sequential-fold arithmetic as aggregate(zip_with(...), 0D, +), zero
  // array allocations on the per-(query, candidate) hot path
  private def sparkDot(a: String, b: String): String = s"array_dot($a, $b)"
  private def sparkCos(a: String, b: String): String = s"array_cos($a, $b)"
  private val dotSql = sparkDot("qv", "nv")
  private val cosSql = sparkCos("qv", "nv")

  /** 8 hash tables x 4 deterministic hyperplanes (fixed seed), dim 64.
    * Few planes per table keeps per-bucket recall high for the moderate
    * cosines in this corpus; multiple tables union the candidates
    * (recall ≈ 1-(1-(1-θ/π)^4)^8 ≈ 0.8 at θ=60°). At 100 TB, tables/planes
    * are the knobs traded against bucket occupancy. */
  val TABLES = 8
  val PLANES_PER_TABLE = 4
  val planes: Seq[Seq[Seq[Double]]] = {
    val rng = new scala.util.Random(42)
    Seq.fill(TABLES)(Seq.fill(PLANES_PER_TABLE)(Seq.fill(64)(rng.nextGaussian())))
  }

  /** Per-table hyperplane signatures as one array<int> column: TABLES x
    * PLANES_PER_TABLE codegen'd `array_dot` calls against the literal
    * planes, folded into per-table bit masks with when/bitwiseOR.
    * Bit-identical to the interpreted `aggregate(zip_with(...))` SQL fold
    * (same left-to-right accumulation — the sim_cosine_topk oracle pins the
    * dot equivalence) but stays inside whole-stage codegen; the
    * lambda-per-element interpreter was the dominant cost of both LSH ops
    * in PipeBench at sf0.1. */
  private[graft] def hyperplaneSigs(v: Column): Column =
    array((0 until TABLES).map { t =>
      (0 until PLANES_PER_TABLE).map { i =>
        when(call_function("array_dot", typedLit(planes(t)(i)), v) > 0,
          lit(1 << i)).otherwise(lit(0))
      }.reduce((a, b) => a.bitwiseOR(b))
    }: _*)

  /** The deterministic hyperplanes as a DuckDB DOUBLE[][][] literal —
    * Double.toString round-trips exactly, so the oracle signs the very same
    * dot products. */
  private[graft] def planesSqlLiteral: String =
    planes.map(tbl => tbl.map(p => p.mkString("[", ", ", "]"))
        .mkString("[", ", ", "]"))
      .mkString("[", ", ", "]") + "::DOUBLE[][][]"

  /** DuckDB native dot product — a sequential left-to-right accumulate,
    * bit-identical to Spark's `aggregate(zip_with(...), 0D, +)` fold (the
    * sim_cosine_topk oracle pins the equivalence) and ~100x faster than an
    * interpreted list_reduce lambda, which keeps the quadratic oracles
    * feasible at sf0.1. */
  private[graft] def duckDot(a: String, b: String): String =
    s"list_dot_product($a, $b)"

  /** IVF cell count / seeds: deterministic "centroids" = the embeddings of
    * these vec_ids (a k-means iteration would drift per-engine; fixed seeds
    * keep the operator exactly reproducible while exercising the same
    * assign/probe/rerank plan). */
  val centroidIds: Seq[Long] = Seq(7L, 23L, 41L, 59L, 77L, 95L, 113L, 131L)
  val PROBES = 2
  /** ADC shortlist size per query before the exact rerank (sim_ivfpq). */
  val SHORTLIST = 20

  private[graft] def duckCos(a: String, b: String): String =
    s"${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  private def ivfOracleSql: String = s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id IN (${centroidIds.mkString(", ")})),
      sc AS (SELECT e.vec_id, e.v, c.cid,
          ${duckCos("e.v", "c.cv")} AS ccos,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY ${duckCos("e.v", "c.cv")} DESC, c.cid) AS rn
        FROM e CROSS JOIN c),
      assign AS (SELECT vec_id AS neighbor_id, v AS nv, cid FROM sc WHERE rn = 1),
      probes AS (SELECT vec_id AS query_id, v AS qv, cid FROM sc
        WHERE vec_id IN (${queryIds.mkString(", ")}) AND rn <= $PROBES),
      cand AS (SELECT DISTINCT p.query_id, p.qv, a.neighbor_id, a.nv
        FROM probes p JOIN assign a ON a.cid = p.cid AND a.neighbor_id <> p.query_id),
      scored AS (SELECT query_id, neighbor_id, ${duckCos("qv", "nv")} AS cos FROM cand),
      ranked AS (SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored)
      SELECT query_id, neighbor_id, CAST(rn AS INT) AS rnk, round(cos, 6) AS cos
      FROM ranked WHERE rn <= $TOPK ORDER BY query_id, rnk"""

  /** sim_ivfpq oracle: the identical coarse-assign / PQ-code / ADC-LUT /
    * shortlist / exact-rerank pipeline in DuckDB, every float fold the same
    * sequential accumulation as the Spark side. */
  private def ivfpqOracleSql: String = s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id IN (${centroidIds.mkString(", ")})),
      sc AS (SELECT e.vec_id, e.v, c.cid,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY ${duckCos("e.v", "c.cv")} DESC, c.cid) AS rn
        FROM e CROSS JOIN c),
      assign AS (SELECT vec_id AS neighbor_id, cid FROM sc WHERE rn = 1),
      probes AS (SELECT vec_id AS query_id, v AS qv, cid FROM sc
        WHERE vec_id IN (${queryIds.mkString(", ")}) AND rn <= $PROBES),
      pqc AS (
        SELECT e.vec_id, m.range AS m,
          CAST(list_position([${centroidIds.mkString(", ")}], c.cid) - 1 AS INT) AS code,
          c.cv[CAST(m.range AS INT) * 16 + 1 : CAST(m.range AS INT) * 16 + 16] AS csub,
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(list_zip(
              e.v[CAST(m.range AS INT) * 16 + 1 : CAST(m.range AS INT) * 16 + 16],
              c.cv[CAST(m.range AS INT) * 16 + 1 : CAST(m.range AS INT) * 16 + 16]),
              s -> (s[1] - s[2]) * (s[1] - s[2]))), (x, y) -> x + y) AS dist
        FROM e, c, range(0, 4) m),
      best AS (SELECT vec_id, m, code, csub,
          row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rn
        FROM pqc),
      codes AS (SELECT vec_id AS neighbor_id, list(code ORDER BY m) AS codes,
          sqrt(${duckDot("flatten(list(csub ORDER BY m))", "flatten(list(csub ORDER BY m))")}) AS recon_norm
        FROM best WHERE rn = 1 GROUP BY vec_id),
      q AS (SELECT DISTINCT query_id, qv FROM probes),
      lut AS (SELECT q.query_id, m.range AS m,
          CAST(list_position([${centroidIds.mkString(", ")}], c.cid) - 1 AS INT) AS code,
          ${duckDot(
            "q.qv[CAST(m.range AS INT) * 16 + 1 : CAST(m.range AS INT) * 16 + 16]",
            "c.cv[CAST(m.range AS INT) * 16 + 1 : CAST(m.range AS INT) * 16 + 16]")} AS pdot
        FROM q, c, range(0, 4) m),
      qn AS (SELECT query_id, sqrt(${duckDot("qv", "qv")}) AS qnorm FROM q),
      cand AS (SELECT DISTINCT p.query_id, a.neighbor_id
        FROM probes p JOIN assign a ON a.cid = p.cid AND a.neighbor_id <> p.query_id),
      candm AS (SELECT cd.query_id, cd.neighbor_id, co.recon_norm, m.range AS m,
          co.codes[CAST(m.range AS INT) + 1] AS code
        FROM cand cd JOIN codes co USING (neighbor_id), range(0, 4) m),
      adc AS (SELECT cm.query_id, cm.neighbor_id, max(cm.recon_norm) AS recon_norm,
          list_reduce(list_prepend(0.0::DOUBLE, list(l.pdot ORDER BY cm.m)),
            (x, y) -> x + y) AS lutsum
        FROM candm cm JOIN lut l
          ON l.query_id = cm.query_id AND l.m = cm.m AND l.code = cm.code
        GROUP BY cm.query_id, cm.neighbor_id),
      short AS (SELECT a.query_id, a.neighbor_id,
          a.lutsum / (qn.qnorm * a.recon_norm) AS adc_cos,
          row_number() OVER (PARTITION BY a.query_id
            ORDER BY a.lutsum / (qn.qnorm * a.recon_norm) DESC, a.neighbor_id) AS srn
        FROM adc a JOIN qn USING (query_id)),
      exact AS (SELECT s.query_id, s.neighbor_id, s.adc_cos,
          ${duckCos("q.qv", "e.v")} AS cos
        FROM short s JOIN q USING (query_id) JOIN e ON e.vec_id = s.neighbor_id
        WHERE s.srn <= $SHORTLIST),
      rankd AS (SELECT query_id, neighbor_id, adc_cos, cos,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rn
        FROM exact)
      SELECT query_id, neighbor_id, CAST(rn AS INT) AS rnk, round(cos, 6) AS cos,
        round(adc_cos, 6) AS adc_cos
      FROM rankd WHERE rn <= $TOPK ORDER BY query_id, rnk"""

  private def annOracleSql: String = s"""
      WITH pl AS (SELECT $planesSqlLiteral AS p),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      sig AS (SELECT vec_id, v, CAST(t.range AS INT) AS tbl,
          CAST(list_sum(list_transform(range(0, $PLANES_PER_TABLE), i ->
            CASE WHEN ${duckDot("p[t.range + 1][i + 1]", "v")} > 0
                 THEN (1 << CAST(i AS INT)) ELSE 0 END)) AS INT) AS bucket
        FROM e, pl, range(0, $TABLES) t),
      q AS (SELECT vec_id AS query_id, v AS qv, tbl, bucket
        FROM sig WHERE vec_id IN (${queryIds.mkString(", ")})),
      cand AS (SELECT DISTINCT q.query_id, q.qv, n.vec_id AS neighbor_id, n.v AS nv
        FROM q JOIN sig n ON n.tbl = q.tbl AND n.bucket = q.bucket AND n.vec_id <> q.query_id),
      scored AS (SELECT query_id, neighbor_id,
          ${duckDot("qv", "nv")} / (sqrt(${duckDot("qv", "qv")}) * sqrt(${duckDot("nv", "nv")})) AS cos
        FROM cand),
      ranked AS (SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored)
      SELECT query_id, neighbor_id, CAST(rn AS INT) AS rnk, round(cos, 6) AS cos
      FROM ranked WHERE rn <= $TOPK ORDER BY query_id, rnk"""

  val defs: Seq[Q] = Seq(

    // k-NN GRAPH (per-node top-k neighbor lists — the SemDeDup/cluster
    // pre-pass structure): exact graph over a deterministic bounded subset
    // as the oracle; [[knnGraphLsh]] is the LSH-bucketed scale path
    // (PipelineSpec recall pin; candidates dedup on scalar ids, arrays are
    // join payload only, never shuffle keys).
    Q("sim_knn_graph", Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                 WHERE vec_id % 5 = 0),
      scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
          list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        FROM e a JOIN e b ON a.vec_id <> b.vec_id),
      ranked AS (SELECT src, dst, cos,
          row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
        FROM scored)
      SELECT src, dst, CAST(rn AS INT) AS rnk, round(cos, 6) AS cos
      FROM ranked WHERE rn <= 3 ORDER BY src, rnk""")) { (s, dir) =>
      val e = t(s, dir, "embeddings").filter(col("vec_id") % 5 === 0)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val a = e.select(col("vec_id").as("src"), col("v").as("qv"))
      val b = e.select(col("vec_id").as("dst"), col("v").as("nv"))
      val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
      a.join(broadcast(b), col("src") =!= col("dst"))
        .select(col("src"), col("dst"), expr(cosSql).as("cos"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("src"), col("dst"), col("rn").cast("int").as("rnk"),
          round(col("cos"), 6).as("cos"))
        .orderBy("src", "rnk")
    },

    // Semantic decontamination: flag corpus docs whose embedding is within
    // cosine threshold of ANY probe (benchmark) embedding. Scale shape: the
    // probe set (an eval suite — thousands of rows at most) broadcasts; the
    // corpus is scanned once, the per-(doc, probe) scores partial-aggregate
    // map-side to one (vec_id, best) row per doc, so the only shuffle is
    // scalar and corpus-sized. 100 TB path: probe sets beyond broadcast
    // size route through the hyperplane-LSH bucketed join (dd_embedding_lsh
    // machinery) instead of the exact broadcast.
    Q("sim_semantic_decon", Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
      c AS (SELECT vec_id, v AS cv FROM e WHERE vec_id NOT IN (0, 1, 2, 3, 4)),
      hits AS (
        SELECT c.vec_id, max(list_dot_product(cv, pv)
          / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(pv, pv)))) AS best
        FROM c CROSS JOIN p GROUP BY c.vec_id)
      SELECT vec_id, round(best, 6) AS best,
        round(best, 6) >= 0.3 AS contaminated
      FROM hits ORDER BY vec_id""")) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val probes = e.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      val corpus = e.filter(!col("vec_id").isin(queryIds: _*))
        .select(col("vec_id"), col("v").as("cv"))
      corpus.crossJoin(broadcast(probes))
        .select(col("vec_id"), expr(sparkCos("cv", "pv")).as("cos"))
        .groupBy("vec_id").agg(max(col("cos")).as("b"))
        .select(col("vec_id"), round(col("b"), 6).as("best"),
          (round(col("b"), 6) >= 0.3).as("contaminated"))
        .orderBy("vec_id")
    },

    Q("sim_cosine_topk", Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
          list_dot_product(q.v, n.v)
            / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))) AS cos
        FROM e q JOIN e n ON n.vec_id <> q.vec_id
        WHERE q.vec_id IN (0, 1, 2, 3, 4)),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored)
      SELECT query_id, neighbor_id, CAST(rn AS INT) AS rnk, round(cos, 6) AS cos
      FROM ranked WHERE rn <= 10
      ORDER BY query_id, rnk""")) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = broadcast(q).join(
          e.select(col("vec_id").as("neighbor_id"), col("v").as("nv")),
          col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"), expr(cosSql).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TOPK)
        .select(col("query_id"), col("neighbor_id"), col("rn").as("rnk"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id", "rnk")
    },

    // random-hyperplane LSH: 16-bit signature -> same-bucket candidates ->
    // exact cosine within bucket -> top-k. Recall measured in SimilaritySpec;
    // the DuckDB oracle carries the same hyperplanes as a literal and folds
    // the same dot products, reproducing buckets and ranks exactly.
    Q("sim_ann_lsh", Some(annOracleSql)) { (s, dir) =>
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // Candidate generation and dedup carry SCALAR ids only — the
      // signature frame drops `v` after hashing, the multi-table duplicate
      // elimination keys on (query_id, neighbor_id), and both vector sides
      // re-join afterwards as broadcasts (candidates are bounded by
      // |queries| x bucket occupancy). No exchange carries an embedding
      // array as key or payload anywhere in this plan.
      val sig = base
        .select(col("vec_id"),
          posexplode(hyperplaneSigs(col("v"))).as(Seq("tbl", "bucket")))
      val qsig = sig.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"),
          col("tbl").as("qtbl"), col("bucket").as("qbucket"))
      val candIds = SafeOps.distinctRows(broadcast(qsig).join(
          sig.select(col("vec_id").as("neighbor_id"), col("tbl"), col("bucket")),
          col("tbl") === col("qtbl") && col("bucket") === col("qbucket")
            && col("neighbor_id") =!= col("query_id"))
        .select("query_id", "neighbor_id"))
      val qv = base.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val cand = broadcast(candIds)
        .join(base.select(col("vec_id").as("neighbor_id"), col("v").as("nv")),
          "neighbor_id")
        .join(broadcast(qv), "query_id")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      cand.select(col("query_id"), col("neighbor_id"), expr(cosSql).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TOPK)
        .select(col("query_id"), col("neighbor_id"), col("rn").as("rnk"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id", "rnk")
    },

    // per-label embedding centroids on the integer micros lattice:
    // posexplode -> one hash aggregate per (label, dim) -> reassemble the
    // ordered vector. Elementwise integer sums are exact at any parallelism
    // (summing raw floats would be partition-order-dependent), and
    // floor(sum/n) is cross-engine-safe: IEEE division of integers < 2^53
    // can't straddle an integer boundary. This is the aggregation step of
    // k-means/IVF training, shaped for 100 TB (shuffle carries (label, dim,
    // partial-sum) triples, never whole vectors).
    Q("sim_centroids", Some("""
      WITH ex AS (
        SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
          CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS micros
        FROM embeddings),
      sums AS (
        SELECT label, dim, CAST(sum(micros) AS BIGINT) AS s, count(*) AS n
        FROM ex GROUP BY label, dim),
      vecs AS (
        SELECT label, max(n) AS n_vectors,
          CAST(to_json(list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY dim))
            AS VARCHAR) AS centroid_micros
        FROM sums GROUP BY label)
      SELECT CAST(label AS INT) AS label, CAST(n_vectors AS BIGINT) AS n_vectors,
        centroid_micros
      FROM vecs ORDER BY label""")) { (s, dir) =>
      val ex = t(s, dir, "embeddings")
        .select(col("label"),
          posexplode(expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
            .as(Seq("dim", "micros")))
      ex.groupBy("label", "dim")
        .agg(sum(col("micros")).as("s"), count(lit(1)).as("n"))
        .groupBy("label")
        .agg(max(col("n")).as("n_vectors"),
          to_json(transform(
            array_sort(collect_list(struct(col("dim"),
              floor(col("s").cast("double") / col("n")).cast("long").as("c")))),
            x => x.getField("c"))).as("centroid_micros"))
        .select(col("label").cast("int").as("label"), col("n_vectors"), col("centroid_micros"))
        .orderBy("label")
    },

    // one Lloyd (k-means) iteration, exactly reproducible end-to-end:
    // cosine-assign every vector to its best seed centroid (deterministic
    // fold arithmetic + centroid-id tie-break), then recompute each cell's
    // centroid on the exact micros lattice. Composes the sim_ivf assignment
    // with the sim_centroids aggregation — the full training loop is this
    // operator iterated, with each round one broadcast join + one hash
    // aggregate over (cell, dim, partial-sum) triples.
    Q("sim_kmeans_iter", Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id IN (${centroidIds.mkString(", ")})),
      sc AS (SELECT e.vec_id, e.v, c.cid,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY ${duckCos("e.v", "c.cv")} DESC, c.cid) AS rn
        FROM e CROSS JOIN c),
      assign AS (SELECT vec_id, v, cid FROM sc WHERE rn = 1),
      ex AS (SELECT cid, generate_subscripts(v, 1) - 1 AS dim,
          CAST(floor(CAST(unnest(v) AS DOUBLE) * 1000000) AS BIGINT) AS micros
        FROM assign),
      sums AS (SELECT cid, dim, CAST(sum(micros) AS BIGINT) AS s, count(*) AS n
        FROM ex GROUP BY cid, dim)
      SELECT cid, CAST(max(n) AS BIGINT) AS cell_size,
        CAST(to_json(list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY dim))
          AS VARCHAR) AS new_centroid_micros
      FROM sums GROUP BY cid ORDER BY cid""")) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val cents = e.filter(col("vec_id").isin(centroidIds: _*))
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val wCell = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val assign = e.crossJoin(broadcast(cents))
        .withColumn("ccos", expr(sparkCos("v", "cv")))
        .withColumn("rn", row_number().over(wCell))
        .filter(col("rn") === 1)
        .select(col("cid"), col("v"))
      assign
        .select(col("cid"),
          posexplode(expr("transform(v, x -> CAST(floor(x * 1000000) AS BIGINT))"))
            .as(Seq("dim", "micros")))
        .groupBy("cid", "dim")
        .agg(sum(col("micros")).as("s"), count(lit(1)).as("n"))
        .groupBy("cid")
        .agg(max(col("n")).as("cell_size"),
          to_json(transform(
            array_sort(collect_list(struct(col("dim"),
              floor(col("s").cast("double") / col("n")).cast("long").as("c")))),
            x => x.getField("c"))).as("new_centroid_micros"))
        .orderBy("cid")
    },

    // IVF (inverted-file) ANN: deterministic seed centroids -> every vector
    // assigned to its best centroid (one broadcast join against the tiny
    // centroid set) -> queries probe their 2 best cells -> exact rerank
    // inside the probed cells. The 100 TB shape: the corpus shuffles once by
    // cell id, queries touch only probed cells. Oracle reproduces the
    // assignment and rerank with the identical fold arithmetic.
    Q("sim_ivf", Some(ivfOracleSql)) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val cents = e.filter(col("vec_id").isin(centroidIds: _*))
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val scoredAll = e.crossJoin(broadcast(cents))
        .withColumn("ccos", expr(sparkCos("v", "cv")))
      val wCell = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val ranked = scoredAll.withColumn("rn", row_number().over(wCell))
      val assign = ranked.filter(col("rn") === 1)
        .select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("cid"))
      val probes = ranked.filter(col("vec_id").isin(queryIds: _*) && col("rn") <= PROBES)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cid"))
      // broadcast the tiny probe set (queries x probed cells); score before
      // deduping so the dedup shuffles only (query, neighbor, cos) scalars,
      // never the embedding arrays
      val cand = broadcast(probes).join(assign, Seq("cid"))
        .filter(col("neighbor_id") =!= col("query_id"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      cand.select(col("query_id"), col("neighbor_id"), expr(cosSql).as("cos"))
        .groupBy("query_id", "neighbor_id").agg(max(col("cos")).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TOPK)
        .select(col("query_id"), col("neighbor_id"), col("rn").as("rnk"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id", "rnk")
    },

    // INCREMENTAL IVF through the write path: vectors arrive in three
    // ingest batches; centroids persist at enable time, each batch assigns
    // ONLY its own rows (map-only — the Store's post-commit hook), and the
    // query probes the persisted assignments with the top-nprobe cells
    // pushed down as an In(cid) scan filter. Must equal the one-shot
    // sim_ivf answer: a vector's cell depends only on itself and the fixed
    // centroids, so incremental build == full build by construction — the
    // oracle proves it end-to-end.
    Q("sim_incremental_ivf", Some(ivfOracleSql)) { (s, dir) =>
      val store = new Store(s,
        java.nio.file.Files.createTempDirectory("graft-ivfinc").toString)
      val e = t(s, dir, "embeddings")
      // range split keeps the centroid/query seed rows in the first batch
      store.replace("ivfinc_vecs", e.filter(col("vec_id") < 200))
      val cents = e.filter(col("vec_id").isin(centroidIds: _*))
        .select(col("vec_id").as("cid"), asDouble(col("embedding")).as("cv"))
      store.enableAnnIndex("ivfinc_vecs", cents)
      store.appendCompacting("ivfinc_vecs",
        e.filter(col("vec_id") >= 200 && col("vec_id") < 400))
      store.appendCompacting("ivfinc_vecs", e.filter(col("vec_id") >= 400))
      store.annQuery("ivfinc_vecs", e.filter(col("vec_id").isin(queryIds: _*)))
    },

    // product quantization (the IVF+PQ stack's compression half): 4
    // subspaces of 16 dims, 8 deterministic codewords per subspace (the
    // seed vectors' sub-slices, same fixed-seed convention as sim_ivf), per
    // subspace argmin by exact fold L2 — N x K x M candidate rows are
    // scan-side compute, one window per (vector, subspace) picks the code.
    // Output: the 4 codes plus the reconstruction cosine (ADC quality).
    Q("sim_pq", Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cb AS (SELECT vec_id AS cid, v AS cv FROM e
             WHERE vec_id IN (${centroidIds.mkString(", ")})),
      cand AS (
        SELECT e.vec_id, m.range AS m,
          CAST(list_position([${centroidIds.mkString(", ")}], cb.cid) - 1 AS INT) AS code,
          cb.cv[CAST(m.range AS INT) * 16 + 1 : CAST(m.range AS INT) * 16 + 16] AS csub,
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(list_zip(
              e.v[CAST(m.range AS INT) * 16 + 1 : CAST(m.range AS INT) * 16 + 16],
              cb.cv[CAST(m.range AS INT) * 16 + 1 : CAST(m.range AS INT) * 16 + 16]),
              s -> (s[1] - s[2]) * (s[1] - s[2]))), (x, y) -> x + y) AS dist
        FROM e, cb, range(0, 4) m),
      best AS (
        SELECT vec_id, m, code, csub,
          row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rn
        FROM cand),
      codes AS (
        SELECT vec_id,
          max(CASE WHEN m = 0 THEN code END) AS c0,
          max(CASE WHEN m = 1 THEN code END) AS c1,
          max(CASE WHEN m = 2 THEN code END) AS c2,
          max(CASE WHEN m = 3 THEN code END) AS c3,
          flatten(list(csub ORDER BY m)) AS recon
        FROM best WHERE rn = 1 GROUP BY vec_id)
      SELECT c.vec_id, c0, c1, c2, c3,
        round(${duckCos("e.v", "c.recon")}, 6) AS recon_cos
      FROM codes c JOIN e ON e.vec_id = c.vec_id
      ORDER BY c.vec_id""")) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val cb = e.filter(col("vec_id").isin(centroidIds: _*))
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val seedsArr = s"array(${centroidIds.mkString(", ")})"
      val cand = e.crossJoin(broadcast(cb))
        .select(col("vec_id"), col("v"), col("cv"),
          expr(s"CAST(array_position($seedsArr, cid) - 1 AS INT)").as("code"),
          explode(expr("sequence(0, 3)")).as("m"))
        .select(col("vec_id"), col("v"), col("m"), col("code"),
          expr("slice(cv, m * 16 + 1, 16)").as("csub"),
          expr("aggregate(zip_with(slice(v, m * 16 + 1, 16), slice(cv, m * 16 + 1, 16), " +
            "(x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)").as("dist"))
      // argmin via min_by on (dist, code): map-side-combining hash
      // aggregate instead of a row_number sort-shuffle of N x K x M rows;
      // (dist, code) unique per (vector, subspace) keeps it deterministic
      val codes = cand
        .groupBy("vec_id", "m")
        .agg(min_by(struct(col("code"), col("csub")),
          struct(col("dist"), col("code"))).as("best"))
        .select(col("vec_id"), col("m"),
          col("best.code").as("code"), col("best.csub").as("csub"))
        .groupBy("vec_id")
        .agg(
          max(when(col("m") === 0, col("code"))).as("c0"),
          max(when(col("m") === 1, col("code"))).as("c1"),
          max(when(col("m") === 2, col("code"))).as("c2"),
          max(when(col("m") === 3, col("code"))).as("c3"),
          expr("flatten(transform(array_sort(collect_list(struct(m, csub))), x -> x.csub))")
            .as("recon"))
      val dot = expr("array_dot(v, recon)")
      val nv = expr("sqrt(array_dot(v, v))")
      val nr = expr("sqrt(array_dot(recon, recon))")
      codes.join(e, Seq("vec_id"))
        .select(col("vec_id"), col("c0"), col("c1"), col("c2"), col("c3"),
          round(dot / (nv * nr), 6).as("recon_cos"))
        .orderBy("vec_id")
    },

    // IVF+PQ — the full production ANN stack: IVF coarse probe (sim_ivf's
    // assignment) -> PQ asymmetric-distance (ADC) shortlist -> exact rerank.
    // The 100 TB property this adds over sim_ivf: candidate scoring carries
    // ONLY each neighbor's 4 PQ codes and one precomputed norm — never the
    // 64-dim arrays. ADC is a per-query lookup table (queries x 4 subspaces
    // x 8 codewords, broadcast); the true vectors re-join by id for just
    // SHORTLIST candidates per query at the rerank. Every float fold is the
    // same sequential left-to-right accumulation on both engines, so the
    // ADC ordering (and thus the shortlist cut) is bit-reproducible.
    Q("sim_ivfpq", Some(ivfpqOracleSql)) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val cents = e.filter(col("vec_id").isin(centroidIds: _*))
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val seedsArr = s"array(${centroidIds.mkString(", ")})"
      // coarse quantizer: best cell per vector, top-PROBES cells per query
      val wCell = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val ranked = e.crossJoin(broadcast(cents))
        .withColumn("ccos", expr(sparkCos("v", "cv")))
        .withColumn("rn", row_number().over(wCell))
      val assignIds = ranked.filter(col("rn") === 1)
        .select(col("vec_id").as("neighbor_id"), col("cid"))
      val probes = ranked.filter(col("vec_id").isin(queryIds: _*) && col("rn") <= PROBES)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cid"))
      // PQ codes + reconstruction norm per vector (sim_pq's argmin), kept
      // as 4 ints + 1 double of scan-side state per corpus vector. The
      // argmin is min_by over (dist, code) — a hash aggregate with map-side
      // partial combine, NOT a row_number window (which would sort-shuffle
      // all N x 32 candidate rows); (dist, code) is unique per (vec, m) so
      // the pick is deterministic
      val codes = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("v"), col("cv"),
          expr(s"CAST(array_position($seedsArr, cid) - 1 AS INT)").as("code"),
          explode(expr("sequence(0, 3)")).as("m"))
        .select(col("vec_id"), col("m"), col("code"),
          expr("slice(cv, m * 16 + 1, 16)").as("csub"),
          expr("aggregate(zip_with(slice(v, m * 16 + 1, 16), slice(cv, m * 16 + 1, 16), " +
            "(x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)").as("dist"))
        .groupBy("vec_id", "m")
        .agg(min_by(struct(col("code"), col("csub")),
          struct(col("dist"), col("code"))).as("best"))
        .select(col("vec_id"), col("m"),
          col("best.code").as("code"), col("best.csub").as("csub"))
        .groupBy("vec_id")
        .agg(
          expr("transform(array_sort(collect_list(struct(m, code))), x -> x.code)")
            .as("codes"),
          expr("flatten(transform(array_sort(collect_list(struct(m, csub))), x -> x.csub))")
            .as("recon"))
        .select(col("vec_id").as("neighbor_id"), col("codes"),
          expr("sqrt(array_dot(recon, recon))").as("recon_norm"))
      // per-query ADC lookup table: partial dots of query sub-slices against
      // every codeword sub-slice (queries x 4 x 8 rows — broadcast).
      // NOTE: derived from e (unique vec_id), not probes.distinct() — a
      // distinct over (query_id, qv) would key a HashAggregate on the
      // array, which the PlanSpec no-array-keys pin rejects
      val q = e.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val lut = q.crossJoin(broadcast(cents))
        .select(col("query_id"),
          expr(s"CAST(array_position($seedsArr, cid) - 1 AS INT)").as("code"),
          explode(expr("sequence(0, 3)")).as("m"), col("qv"), col("cv"))
        .select(col("query_id"), col("m"), col("code"),
          expr("array_dot(slice(qv, m * 16 + 1, 16), slice(cv, m * 16 + 1, 16))").as("pdot"))
      val qnorm = q.select(col("query_id"), expr("sqrt(array_dot(qv, qv))").as("qnorm"))
      // candidates dedup on scalar ids; ADC score from codes + LUT only
      val candIds = SafeOps.distinctRows(
        broadcast(probes.select("query_id", "cid")).join(assignIds, Seq("cid"))
          .filter(col("neighbor_id") =!= col("query_id"))
          .select("query_id", "neighbor_id"))
      val adc = candIds.join(codes, Seq("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("recon_norm"),
          posexplode(col("codes")).as(Seq("m", "code")))
        .join(broadcast(lut), Seq("query_id", "m", "code"))
        .groupBy("query_id", "neighbor_id")
        .agg(max(col("recon_norm")).as("recon_norm"),
          expr("aggregate(transform(array_sort(collect_list(struct(m, pdot))), " +
            "x -> x.pdot), 0D, (acc, x) -> acc + x)").as("lutsum"))
        .join(broadcast(qnorm), Seq("query_id"))
        .withColumn("adc_cos", col("lutsum") / (col("qnorm") * col("recon_norm")))
      val wShort = Window.partitionBy("query_id")
        .orderBy(col("adc_cos").desc, col("neighbor_id"))
      val shortlist = adc.withColumn("srn", row_number().over(wShort))
        .filter(col("srn") <= SHORTLIST)
        .select("query_id", "neighbor_id", "adc_cos")
      // exact rerank: true vectors re-join by id for the shortlist only
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      shortlist
        .join(e.select(col("vec_id").as("neighbor_id"), col("v").as("nv")), Seq("neighbor_id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"), col("adc_cos"),
          expr(cosSql).as("cos"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= TOPK)
        .select(col("query_id"), col("neighbor_id"), col("rn").as("rnk"),
          round(col("cos"), 6).as("cos"), round(col("adc_cos"), 6).as("adc_cos"))
        .orderBy("query_id", "rnk")
    },

    // int8 scalar quantization of the embedding column (the memory-/IO-
    // compression step before ANN at scale): per-dim min/max over the
    // corpus -> 255-step linear code -> dequantize -> per-vector max
    // absolute error and cosine(original, dequantized). The min/max ranges
    // are a tiny broadcast; codes are scan-side; floor(x + 0.5) avoids
    // engine-specific round-half rules.
    Q("sim_int8_quant", Some("""
      WITH ex AS (SELECT generate_subscripts(embedding, 1) AS dim,
          CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
      rng AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM ex GROUP BY dim),
      arrs AS (SELECT list(lo ORDER BY dim) AS lo_a, list(hi ORDER BY dim) AS hi_a FROM rng),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id, v,
          list_transform(range(1, len(v) + 1), i ->
            CASE WHEN hi_a[i] = lo_a[i] THEN v[i]
                 ELSE lo_a[i] + floor((v[i] - lo_a[i]) / ((hi_a[i] - lo_a[i]) / 255.0) + 0.5)
                      * ((hi_a[i] - lo_a[i]) / 255.0) END) AS vq
        FROM e, arrs)
      SELECT vec_id,
        round(list_max(list_transform(range(1, len(v) + 1), i -> abs(vq[i] - v[i]))), 6) AS max_abs_err,
        round(list_dot_product(v, vq)
          / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(vq, vq))), 6) AS cos_orig_quant
      FROM q ORDER BY vec_id""")) { (s, dir) =>
      val rng = t(s, dir, "embeddings")
        .select(posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
          .as(Seq("dim0", "x")))
        .groupBy("dim0")
        .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      val arrs = rng
        .select(struct(col("dim0"), col("lo"), col("hi")).as("s"))
        .agg(sort_array(collect_list(col("s"))).as("arr"))
        .select(expr("transform(arr, s -> s.lo)").as("lo_a"),
          expr("transform(arr, s -> s.hi)").as("hi_a"))
      val quantized = t(s, dir, "embeddings")
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .crossJoin(broadcast(arrs))
        .withColumn("vq", expr(
          "transform(sequence(1, size(v)), i -> " +
            "IF(element_at(hi_a, i) = element_at(lo_a, i), element_at(v, i), " +
            "element_at(lo_a, i) + floor((element_at(v, i) - element_at(lo_a, i)) " +
            "/ ((element_at(hi_a, i) - element_at(lo_a, i)) / 255.0) + 0.5) " +
            "* ((element_at(hi_a, i) - element_at(lo_a, i)) / 255.0)))"))
      val dot = expr("aggregate(zip_with(v, vq, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
      val nv = expr("sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x))")
      val nq = expr("sqrt(aggregate(zip_with(vq, vq, (x, y) -> x * y), 0D, (acc, x) -> acc + x))")
      quantized.select(col("vec_id"),
        round(expr("array_max(transform(sequence(1, size(v)), i -> abs(element_at(vq, i) - element_at(v, i))))"), 6)
          .as("max_abs_err"),
        round(dot / (nv * nq), 6).as("cos_orig_quant"))
        .orderBy("vec_id")
    }
  )

  // ---- incremental IVF: assignment at ingest, cell-pruned probe ----------
  // The Faiss add-after-train contract over store tables: centroids are
  // trained ONCE (offline / kmeansTrain) and persisted; every ingest batch
  // assigns only its own vectors (a map-only fold against the broadcast
  // centroid literal — zero shuffle at any batch size); a query ranks the
  // k centroids, then scans ONLY the top-nprobe cells of the assignments
  // table. Incremental build == one-shot build by construction: a vector's
  // cell depends on nothing but the vector and the fixed centroids.

  /** Argmax-cosine cell assignment — (vec_id, cid, nv). The centroid set
    * collects to the driver (O(k·dims), the kmeansTrain bound) and folds
    * scan-side as a literal array: assignment is map-only. Ties break to
    * the lowest cid (cid-ordered fold with strict >), matching the
    * oracle's ORDER BY ccos DESC, cid. Output files cluster by cid
    * (sortWithinPartitions) so cell-filtered probes skip row groups via
    * parquet min/max footers. */
  private[graft] def ivfAssign(vecs: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    GraftExpressions.register(vecs.sparkSession)
    val cl = cents.select(col("cid").cast("long"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val centArr = array(cl.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.map(x => lit(x)): _*).as("cv"))
    }.toSeq: _*)
    vecs.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("nv"))
      .withColumn("__cents", centArr)
      .withColumn("cid", expr(
        """aggregate(__cents,
             named_struct('best', CAST(-2.0 AS DOUBLE), 'cid', CAST(-1 AS BIGINT)),
             (acc, c) -> if(array_cos(nv, c.cv) > acc.best,
                            named_struct('best', array_cos(nv, c.cv), 'cid', c.cid),
                            acc),
             acc -> acc.cid)"""))
      .select(col("vec_id"), col("cid"), col("nv"))
      .sortWithinPartitions("cid")
  }

  /** Probe the persisted IVF index: rank cells per query against the
    * centroid table, take the top `probes` cells, then scan ONLY those
    * cells of the assignments table — the probed cell ids collect
    * (O(queries × probes) scalars) and push down as an In(cid) filter, so
    * parquet footers skip every non-probed cell's files — and exact-cosine
    * rerank to the top `k`. Each vector lives in exactly one cell, so
    * (query, neighbor) candidates are already distinct. */
  private[graft] def ivfProbeQuery(assign: DataFrame, cents: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      probes: Int = PROBES, k: Int = TOPK): DataFrame = {
    GraftExpressions.register(assign.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val scored = q.crossJoin(broadcast(cents.select(col("cid"), col("cv"))))
      .withColumn("ccos", expr(sparkCos("qv", "cv")))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probeCells = scored.withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= probes)
      .select(col("query_id"), col("qv"), col("cid"))
    val cells = probeCells.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val cand = broadcast(probeCells)
      .join(assign.filter(col("cid").isin(cells: _*)), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(cosSql).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rn").as("rnk"),
        round(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rnk")
  }

  /** Multi-iteration Lloyd's k-means on the exact micros lattice: vectors
    * and centroids both live on the floor(x*1e6) integer grid, so distances
    * and inertia are exact BIGINT sums — every run is bit-reproducible with
    * no float-order sensitivity. Per iteration: one broadcast of the k
    * centroids, one scan-side assignment, one hash aggregate over
    * (cell, dim) partial sums; the k x dims update collapses to the driver
    * (tiny). That is the 100 TB shape — corpus never shuffles, per-round
    * traffic is O(k * dims * partitions). Deterministic init: the k lowest
    * vec_ids. Empty cells keep their previous centroid.
    *
    * Returns (final centroids, inertia per iteration) — inertia is the
    * exact integer sum of squared micros distances. */
  def kmeansTrain(e: DataFrame, k: Int, iters: Int): (Seq[Seq[Long]], Seq[Long]) = {
    val spark = e.sparkSession
    import spark.implicits._
    val vm = e.select(col("vec_id"),
        expr("transform(v, x -> CAST(floor(x * 1000000) AS BIGINT))").as("vm"))
      .persist()
    var centroids: Map[Int, Seq[Long]] = vm.orderBy("vec_id").limit(k).collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Long](1) }.toMap
    val inertias = Seq.newBuilder[Long]
    (1 to iters).foreach { _ =>
      val cdf = centroids.toSeq.sortBy(_._1).toDF("cid", "cm")
      val assigned = vm.crossJoin(broadcast(cdf))
        .withColumn("dist2", expr(
          "aggregate(zip_with(vm, cm, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
        .groupBy("vec_id")
        .agg(min(struct(col("dist2"), col("cid"), col("vm"))).as("best"))
        .select(col("best.dist2").as("dist2"), col("best.cid").as("cid"),
          col("best.vm").as("vm"))
        .persist()
      inertias += assigned.agg(sum(col("dist2"))).head().getLong(0)
      val sums = assigned
        .select(col("cid"), posexplode(col("vm")).as(Seq("dim", "m")))
        .groupBy("cid", "dim")
        .agg(sum(col("m")).as("s"), count(lit(1)).as("n"))
        .collect()
      assigned.unpersist()
      val updated = sums.groupBy(_.getInt(0)).map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1))
          .map(r => Math.floorDiv(r.getLong(2), r.getLong(3))).toSeq
      }
      centroids = centroids.map { case (cid, old) =>
        cid -> updated.getOrElse(cid, old)
      }
    }
    vm.unpersist()
    (centroids.toSeq.sortBy(_._1).map(_._2), inertias.result())
  }

  /** k-NN graph at scale: LSH-bucketed candidate edges, exact cosine
    * rerank, per-node top-k. Signatures are scan-side codegen; candidate
    * generation and dedup carry SCALAR (table, sig, id) keys only; the
    * rerank joins co-partition by vec_id, so embedding arrays travel as
    * join payload exactly once per side and never appear in a shuffle or
    * aggregation KEY (PipelineSpec pins recall; PlanSpec pins the key
    * shape). At 100 TB both joins become storage-partitioned over tables
    * bucketed by vec_id — zero extra array movement. */
  def knnGraphLsh(embeddings: DataFrame, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val sigs = e.select(col("vec_id"),
      posexplode(hyperplaneSigs(col("v"))).as(Seq("tbl", "sig")))
    val cands = sigs.alias("x").join(sigs.alias("y"),
        col("x.tbl") === col("y.tbl") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("src"), col("y.vec_id").as("dst"))
      .distinct()
    val scored = cands
      .join(e.select(col("vec_id").as("src"), col("v").as("qv")), "src")
      .join(e.select(col("vec_id").as("dst"), col("v").as("nv")), "dst")
      .select(col("src"), col("dst"), expr(cosSql).as("cos"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("src"), col("dst"), col("rnk").cast("int").as("rnk"), col("cos"))
  }
}
