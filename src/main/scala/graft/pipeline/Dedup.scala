package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline (builder brief):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard. Designed for 100 TB:
  *
  *  - Signatures (minhash/simhash/fingerprints) are computed scan-side with
  *    higher-order array expressions — one pass, no shuffle, codegen'd.
  *  - Candidate generation shuffles only (band, bucket) keys or shingles,
  *    never full documents; the verify step joins candidates back by key.
  *  - The shingle self-join (exact Jaccard) is the O(pairs-sharing-a-shingle)
  *    classic; at scale you cap ultra-frequent shingles (stop-shingle
  *    removal) to control skew — the LSH path is the primary at 100 TB, the
  *    exact path is the auditor on samples.
  */
object Dedup {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  /** docs with distinct word-3-gram shingles (docs with >=3 tokens). */
  private[graft] def shingleSets(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))").as("sh"))

  private def shingled(s: SparkSession, dir: String): DataFrame =
    shingleSets(t(s, dir, "documents"))

  /** Candidate (id_a, id_b) pairs sharing >=1 shingle whose document
    * frequency is <= maxDf — the stop-shingle cap that keeps one hot
    * boilerplate shingle from generating quadratic join rows on one key. */
  /** Eagerly materialize the (small) final frame of an op, so the big
    * cached intermediates feeding it can be unpersisted immediately after —
    * a long-lived server session re-running these ops must not accumulate
    * cached blocks until nondeterministic ContextCleaner GC. The checkpoint
    * holds only the result rows (pair lists — tiny) and is freed when the
    * returned frame is dropped. */
  private def materialized(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true)

  private[graft] def candidatePairs(shingles: DataFrame, maxDf: Int): DataFrame = {
    val sh = shingles.select(col("doc_id"), explode(col("sh")).as("s"))
    val rare = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("s")
    // cache: the self-join below would re-run the explode + df-count +
    // filter chain for BOTH sides (this op is the audit-scale auditor; the
    // scale path is minhash LSH, which caches its shingle frame the same way)
    val capped = sh.join(rare, "s").cache()
    // SafeOps.distinctRows, not .distinct(): this exact Distinct was once
    // elided from the executed plan under the concurrent verify sweep,
    // leaking per-shared-shingle pair multiplicities into the gate
    try materialized(SafeOps.distinctRows(
      capped.as("a").join(capped.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))))
    finally capped.unpersist(false)
  }

  private val shingleSetSql = """SELECT doc_id,
          list_distinct(list_transform(range(0, len(toks)-2),
            i -> toks[i+1] || chr(32) || toks[i+2] || chr(32) || toks[i+3])) AS sh
        FROM (SELECT doc_id, string_split(text, chr(32)) AS toks FROM documents) t
        WHERE len(toks) >= 3"""

  /** DuckDB: the >=0.9-Jaccard pair list (id_a < id_b), as a CTE body. */
  private val jaccardPairsCte = s"""
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ($shingleSetSql) a JOIN ($shingleSetSql) b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9"""

  private val jaccardOracle = s"""
      WITH d AS ($shingleSetSql)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9
      ORDER BY id_a, id_b"""

  // Shared by dd_simhash and dd_incremental_simhash: the chunk-banded
  // Hamming pair set is the same algebra whether computed in one pass or
  // accumulated batch-by-batch through the persisted index.
  private val simhashOracle = """
      WITH d AS (SELECT doc_id,
          list_distinct(list_transform(range(0, len(toks)-2),
            i -> toks[i+1] || chr(32) || toks[i+2] || chr(32) || toks[i+3])) AS sh
        FROM (SELECT doc_id, string_split(text, chr(32)) AS toks FROM documents) t
        WHERE len(toks) >= 3),
      h AS (SELECT doc_id,
          list_transform(sh, t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hashes
        FROM d),
      s AS (SELECT doc_id,
          CAST(list_sum(list_transform(range(0, 60), j ->
            CASE WHEN 2 * list_sum(list_transform(hashes, h -> (h >> CAST(j AS INT)) & 1))
                      > len(hashes)
                 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END))
            AS BIGINT) AS simhash
        FROM h),
      c AS (SELECT doc_id, simhash, CAST(r.range AS INT) AS chunk,
          (simhash >> CAST(r.range * 8 AS INT)) & 255 AS cval
        FROM s, range(0, 8) r)
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
        CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
      FROM c x JOIN c y ON x.chunk = y.chunk AND x.cval = y.cval AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 12
      ORDER BY id_a, id_b"""

  // Shared by dd_embedding_lsh and dd_incremental_embedding: the bucketed
  // cosine pair set is the same algebra whether computed in one pass or
  // accumulated batch-by-batch through the persisted (v, sigs) index.
  private lazy val embeddingLshOracle = s"""
      WITH pl AS (SELECT ${Similarity.planesSqlLiteral} AS p),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      sig AS (SELECT vec_id, v, CAST(t.range AS INT) AS tbl,
          CAST(list_sum(list_transform(range(0, ${Similarity.PLANES_PER_TABLE}), i ->
            CASE WHEN ${Similarity.duckDot("p[t.range + 1][i + 1]", "v")} > 0
                 THEN (1 << CAST(i AS INT)) ELSE 0 END)) AS INT) AS bucket
        FROM e, pl, range(0, ${Similarity.TABLES}) t),
      cand AS (SELECT DISTINCT a.vec_id AS id_a, a.v AS va, b.vec_id AS id_b, b.v AS vb
        FROM sig a JOIN sig b
          ON b.tbl = a.tbl AND b.bucket = a.bucket AND a.vec_id < b.vec_id),
      scored AS (SELECT id_a, id_b, ${Similarity.duckCos("va", "vb")} AS cos FROM cand)
      SELECT id_a, id_b, round(cos, 6) AS cos FROM scored
      WHERE cos >= 0.4 ORDER BY id_a, id_b"""

  /** Exact pairwise Jaccard >= tau via distributed shingle self-join, with
    * stop-shingle skew control: shingles whose document frequency exceeds
    * `maxDf` are dropped from CANDIDATE GENERATION only (one boilerplate
    * shingle shared by 1M docs would otherwise put 10^12 join rows on a
    * single key). Candidates are then verified EXACTLY on the full shingle
    * sets, so reported Jaccard values are unaffected by the cap; a true
    * >=tau pair is missed only if every shared shingle is ultra-frequent,
    * which near-identical documents (sharing almost all shingles) never hit
    * in practice. The DuckDB oracle does the same math with list ops + an
    * all-pairs join, which only works at oracle scale. */
  private[graft] def jaccardPairsExact(docs: DataFrame, tau: Double,
      maxDf: Int = 100): DataFrame = {
    val d = shingleSets(docs).cache()
    try {
      val cand = candidatePairs(d, maxDf)
      val inter = size(array_intersect(col("sha"), col("shb")))
      val j = inter.cast("double") /
        (size(col("sha")) + size(col("shb")) - inter)
      materialized(cand
        .join(d.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
        .join(d.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
        .filter(j >= tau)
        .select(col("id_a"), col("id_b"), round(j, 6).as("jaccard"))
        .orderBy("id_a", "id_b"))
    } finally d.unpersist(false)
  }

  /** N-gram Jaccard pairs with a SIZE GUARD (the symmetry twin of
    * [[embeddingCosinePairs]]): up to `exactMaxRows` documents the exact
    * capped-shingle auditor runs; above it the call auto-routes through
    * MinHash-LSH banding + exact verify, whose candidate join is keyed on
    * (band, bucket) and never quadratic in one key. At tau >= 0.9 the two
    * paths return the same pairs (band miss probability ~2e-12, and the
    * verify step removes false candidates), so routing is invisible to the
    * caller. The probe is LIMIT-bounded — it stops reading after
    * threshold+1 rows. */
  def ngramJaccardPairs(docs: DataFrame, tau: Double = 0.9,
      exactMaxRows: Long = 100000L): DataFrame =
    if (docs.limit(math.min(exactMaxRows + 1, Int.MaxValue).toInt).count() <= exactMaxRows)
      jaccardPairsExact(docs, tau)
    else minhashLshPairs(docs, tau)

  /** MinHash + LSH banding + exact verify over the shingle sets — the
    * 100 TB n-gram dedup path. Same output contract as
    * [[jaccardPairsExact]] at tau >= 0.9 (see [[ngramJaccardPairs]]). */
  private[graft] def minhashLshPairs(docs: DataFrame, tau: Double): DataFrame = {
    GraftExpressions.register(docs.sparkSession)
    val d = shingleSets(docs).cache()
    try {
      val cand = lshCandidates(d)
      // verify candidates with exact Jaccard (join sets back by key)
      val withSets = cand
        .join(d.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(d.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
      val j = inter / (size(col("sh_a")) + size(col("sh_b")) - inter)
      materialized(withSets.filter(j >= tau)
        .select(col("id_a"), col("id_b"), round(j, 6).as("jaccard"))
        .orderBy("id_a", "id_b"))
    } finally d.unpersist(false)
  }

  // MinHash parameters: K independent hashes via seeded xxhash64; 16 bands
  // of 2 rows -> P(candidate | j=0.9) ~ 1 - (1-0.81)^16 ≈ 1-2e-12.
  private val K = 32
  private val BANDS = 16
  private val R = K / BANDS
  // Bucket-occupancy guard: a band-bucket holding more than MaxBucket docs
  // switches from clique pair expansion (quadratic in occupancy) to STAR
  // linking against the bucket's min-id representative (linear). Web-scale
  // boilerplate makes this real: docs sharing ~half their shingles collide
  // in >=1 of 16 bands with ~99% probability, so one template shared by a
  // million pages would otherwise put ~10^12 rows on one bucket key. Star
  // pairs still pass the exact-Jaccard verify, and a true near-dup clique
  // keeps its connectivity (every member links to the same representative,
  // and redundant bands re-link any pair the star misses), so downstream
  // clustering (clusterPairs/cc) sees the same components.
  private val MaxBucket = 64

  /** LSH candidate pairs from the cached shingle frame: per-band bucket
    * hashing, clique expansion in small buckets, star linking in oversized
    * ones. Exposed for the skew spec, which pins the candidate volume. */
  private[graft] def lshCandidates(d: DataFrame): DataFrame =
    lshCandidatesFromBands(
      bandsFromSig(d.select(col("doc_id"), signatureCol.as("sig"))))

  /** (doc_id, band, bucket) from a (doc_id, sig) frame — a pure column
    * transform (16 hash slices of the stored signature), so re-deriving
    * bands from a PERSISTED signature index never re-shingles anything. */
  private[graft] def bandsFromSig(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
      posexplode(expr(s"transform(sequence(0, ${BANDS - 1}), " +
        s"b -> hash(slice(sig, b * $R + 1, $R)))")).as(Seq("band", "bucket")))

  private[graft] def lshCandidatesFromBands(bands: DataFrame): DataFrame = {
    // occupancy + representative in one pass, same (band, bucket) key as
    // the join below — co-partitioned, no extra shuffle stage shape
    val sizes = bands.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"), min(col("doc_id")).as("rep"))
    val tagged = bands.join(sizes, Seq("band", "bucket"))
    val small = tagged.filter(col("bsz") <= MaxBucket)
    val cliquePairs = small.as("x").join(small.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    val starPairs = tagged.filter(col("bsz") > MaxBucket)
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("doc_id").as("id_b"))
    SafeOps.distinctRows(cliquePairs.unionByName(starPairs))
  }

  /** Per-doc MinHash signature, computed scan-side (no shuffle): K seeded
    * XXH64 minima in one pass over the shingles via the codegen'd
    * [[MinHashSigs]] expression (one array walk instead of K, no per-
    * (seed, shingle) concat allocation — see MinHashUtil.sigs). */
  private def signatureCol: Column = GraftExpressions.minhash_sigs(col("sh"), K)

  // ---- incremental batch-vs-corpus dedup (persisted MinHash index) -------
  // A training-data pipeline dedups each ingest batch against the standing
  // corpus; re-shingling 100 TB per daily batch is the whole-corpus-
  // recompute anti-pattern. The persisted index row is
  // (doc_id, sh, sig): the signature drives LSH banding (bands re-derive
  // from sig by a column transform — bandsFromSig), the shingle set drives
  // the exact-Jaccard verify, so a batch probe touches ONLY the index and
  // the batch — never the corpus documents table. At 100 TB the sh column
  // dominates index size (~corpus text); the slim variant stores sig only
  // and verifies by signature agreement, trading exactness for space —
  // this one keeps the exact verify so probe output is bit-identical to a
  // full recompute (the correctness gate proves that equivalence).

  /** The per-doc index frame: (doc_id, sh, sig) from arbitrary id/text
    * column names. Scan-side only — no shuffle. */
  private[graft] def minhashIndexFrame(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    GraftExpressions.register(docs.sparkSession)
    shingleSets(docs.select(col(idCol).as("doc_id"), col(textCol).as("text")))
      .select(col("doc_id"), col("sh"), signatureCol.as("sig"))
  }

  /** Near-dup pairs INVOLVING the batch, against a persisted index: LSH
    * banding over (index ∪ batch) signatures — the index side is a column
    * transform over stored sigs, zero re-shingling — then the exact
    * Jaccard verify on the stored shingle sets. Corpus-internal pairs are
    * excluded (they were reported when THEIR batch arrived), so across an
    * ingest history the union of probe outputs equals a full recompute.
    * Scale shape: the only shuffles carry (band, bucket, doc_id) scalars
    * and the candidate id pairs; shingle arrays move only for matched ids.
    * The batch side is a broadcast-sized semi-join filter. */
  private[graft] def minhashProbe(idx: DataFrame, batch: DataFrame,
      tau: Double): DataFrame = {
    val all = idx.select("doc_id", "sh", "sig")
      .unionByName(batch.select("doc_id", "sh", "sig"))
    // Candidate generation only inside buckets the BATCH touches: the
    // batch's (band, bucket) keys broadcast as a semi-join filter over the
    // union's band rows, so the candidate exchange carries hot-bucket rows
    // only — O(batch × occupancy), not an O(corpus) band self-join. The
    // semi-join keeps every member of a hot bucket, so per-bucket occupancy
    // and min-id representative (the star-link guard) are computed on
    // exactly the full bucket — cold buckets would only have produced
    // pairs with no batch member, which pairsInvolving drops anyway.
    val batchKeys = bandsFromSig(batch.select("doc_id", "sig"))
      .select("band", "bucket").distinct()
    val hot = bandsFromSig(all.select("doc_id", "sig"))
      .join(broadcast(batchKeys), Seq("band", "bucket"), "left_semi")
    val withBatch = pairsInvolving(
      lshCandidatesFromBands(hot), batch.select("doc_id"))
    val withSets = withBatch
      .join(all.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(all.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val j = inter / (size(col("sh_a")) + size(col("sh_b")) - inter)
    withSets.filter(j >= tau)
      .select(col("id_a"), col("id_b"), round(j, 6).as("jaccard"))
  }

  /** Candidate pairs with at least one member of the batch id set (pair
    * order is id_a < id_b, so a cross pair can carry the batch id on
    * either side). The batch side broadcasts — no corpus-sized shuffle. */
  private def pairsInvolving(cand: DataFrame, batchIds: DataFrame): DataFrame = {
    val cols = cand.columns.map(col).toSeq
    SafeOps.distinctRows(
      cand.join(broadcast(batchIds.select(col("doc_id").as("id_a"))), Seq("id_a"), "left_semi")
        .select(cols: _*)
        .unionByName(
          cand.join(broadcast(batchIds.select(col("doc_id").as("id_b"))), Seq("id_b"), "left_semi")
            .select(cols: _*)))
  }

  // ---- simhash family: (doc_id, simhash) index, chunk-band probe ---------
  // Same incremental contract as the MinHash index, for the Hamming-space
  // near-dup definition: the persisted row is just (doc_id, simhash) — 8
  // bytes of signature per doc, no shingle storage — and a batch probe
  // touches only chunk buckets the batch occupies. Union of probe outputs
  // over an ingest history == the full dd_simhash recompute (pairs sharing
  // >=1 of 8 8-bit chunks at bit_count(xor) <= maxHamming).

  /** Per-doc 60-bit SimHash from arbitrary id/text columns: word-3-gram
    * shingles, md5-top-60-bit shingle hashes (oracle-reproducible), bit-
    * vote fold via the codegen'd SimHashUtil expression — all scan-side. */
  private[graft] def simhashIndexFrame(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    GraftExpressions.register(docs.sparkSession)
    shingleSets(docs.select(col(idCol).as("doc_id"), col(textCol).as("text")))
      .withColumn("hashes",
        expr("transform(sh, t -> cast(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT))"))
      .select(col("doc_id"), expr("simhash_sig(hashes)").as("simhash"))
  }

  /** Hamming near-dup pairs involving the batch, against a persisted
    * simhash index: 8-bit chunk equality generates candidates (pigeonhole:
    * hamming <= 7 always shares a chunk), verified at
    * bit_count(xor) <= maxHamming. Only chunk buckets the batch occupies
    * enter the candidate join (broadcast semi-join filter). */
  private[graft] def simhashProbe(idx: DataFrame, batch: DataFrame,
      maxHamming: Double): DataFrame = {
    val all = idx.select("doc_id", "simhash")
      .unionByName(batch.select("doc_id", "simhash"))
    def chunksOf(d: DataFrame): DataFrame = d.select(col("doc_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 7), " +
        "c -> shiftright(simhash, cast(c * 8 AS INT)) & 255)")).as(Seq("chunk", "cval")))
    val batchKeys = chunksOf(batch).select("chunk", "cval").distinct()
    val hot = chunksOf(all).join(broadcast(batchKeys), Seq("chunk", "cval"), "left_semi")
    val cand = SafeOps.distinctRows(hot.as("x").join(hot.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cval") === col("y.cval")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("int").as("hamming")))
      .filter(col("hamming") <= maxHamming.toInt)
    pairsInvolving(cand, batch.select("doc_id"))
  }

  // ---- phash family: (doc_id, fp) index, exact-match probe ---------------
  // Perceptual media dedup at ingest: the pipeline decodes each asset ONCE
  // when it arrives (dHash / audio energy-gradient / video frame-hash fold
  // — see Multimodal) and stores the 8-byte fingerprint as a column; the
  // index persists (doc_id, fp) and a batch probe is an equality join on
  // fingerprints the batch carries. Payload bytes never enter the index or
  // any exchange, and no asset is ever re-decoded.

  /** (doc_id, fp) from a table carrying a precomputed fingerprint column. */
  private[graft] def phashIndexFrame(docs: DataFrame, idCol: String,
      fpCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(fpCol).cast("long").as("fp"))

  /** Exact-fingerprint clone pairs involving the batch: only fingerprint
    * values the batch carries enter the join (broadcast semi-join). */
  private[graft] def phashProbe(idx: DataFrame, batch: DataFrame,
      tau: Double): DataFrame = {
    val all = idx.select("doc_id", "fp").unionByName(batch.select("doc_id", "fp"))
    val hot = all.join(broadcast(batch.select("fp").distinct()), Seq("fp"), "left_semi")
    val cand = SafeOps.distinctRows(hot.as("x").join(hot.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.fp").as("fp")))
    pairsInvolving(cand, batch.select("doc_id"))
  }

  // ---- embedding family: (doc_id, v, sigs) index, hyperplane-LSH probe ---
  // Semantic near-dup at ingest (the SemDeDup signal, incremental): the
  // persisted row carries the double-cast vector (for the exact cosine
  // verify) plus its precomputed random-hyperplane bucket per LSH table, so
  // a probe never re-hashes the corpus — candidate generation explodes the
  // STORED sigs column (parquet prunes the vector column out of that scan)
  // and semi-join-filters to (tbl, bucket) keys the batch occupies. Vectors
  // move only for matched ids. Union of probe outputs over an ingest
  // history == the full dd_embedding_lsh recompute at the same tau.

  /** Per-vector index frame: (doc_id, v, sigs) from arbitrary id/embedding
    * column names; sigs(t) = the vector's bucket in hyperplane table t.
    * Scan-side only — no shuffle. */
  private[graft] def embeddingIndexFrame(docs: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    GraftExpressions.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("sigs", Similarity.hyperplaneSigs(col("v")))
  }

  /** Cosine near-dup pairs involving the batch, against a persisted
    * embedding index: bucket equality over the STORED sigs generates
    * candidates (only buckets the batch occupies enter the join), the
    * exact cosine >= tau verify joins vectors for matched ids only. */
  private[graft] def embeddingProbe(idx: DataFrame, batch: DataFrame,
      tau: Double): DataFrame = {
    GraftExpressions.register(idx.sparkSession)
    val all = idx.select("doc_id", "v", "sigs")
      .unionByName(batch.select("doc_id", "v", "sigs"))
    def sigRows(d: DataFrame): DataFrame = d.select(col("doc_id"),
      posexplode(col("sigs")).as(Seq("tbl", "bucket")))
    val batchKeys = sigRows(batch).select("tbl", "bucket").distinct()
    val hot = sigRows(all).join(broadcast(batchKeys), Seq("tbl", "bucket"), "left_semi")
    val cand = SafeOps.distinctRows(hot.as("x").join(hot.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")))
    val withVecs = pairsInvolving(cand, batch.select("doc_id"))
      .join(all.select(col("doc_id").as("id_a"), col("v").as("va")), "id_a")
      .join(all.select(col("doc_id").as("id_b"), col("v").as("vb")), "id_b")
    val cos = expr("array_dot(va, vb)") /
      (expr("sqrt(array_dot(va, va))") * expr("sqrt(array_dot(vb, vb))"))
    withVecs.filter(cos >= tau)
      .select(col("id_a"), col("id_b"), round(cos, 6).as("cos"))
  }

  // ---- family dispatch (Store's incremental index hooks) -----------------

  /** Short table-name tag per fingerprint family. */
  private[graft] def familyTag(family: String): String = family match {
    case "minhash"   => "mh"
    case "simhash"   => "sh"
    case "phash"     => "ph"
    case "embedding" => "emb"
    case other => throw new IllegalArgumentException(s"unknown dedup family: $other")
  }

  /** Scan-side per-doc index frame for `family` (validates the family). */
  private[graft] def indexFrame(family: String, docs: DataFrame,
      idCol: String, valCol: String): DataFrame = family match {
    case "minhash"   => minhashIndexFrame(docs, idCol, valCol)
    case "simhash"   => simhashIndexFrame(docs, idCol, valCol)
    case "phash"     => phashIndexFrame(docs, idCol, valCol)
    case "embedding" => embeddingIndexFrame(docs, idCol, valCol)
    case other => throw new IllegalArgumentException(s"unknown dedup family: $other")
  }

  /** Batch-vs-index probe for `family`; tau is the family's threshold
    * (min Jaccard / max Hamming / unused for exact fingerprints /
    * min cosine). */
  private[graft] def probe(family: String, idx: DataFrame, batch: DataFrame,
      tau: Double): DataFrame = family match {
    case "minhash"   => minhashProbe(idx, batch, tau)
    case "simhash"   => simhashProbe(idx, batch, tau)
    case "phash"     => phashProbe(idx, batch, tau)
    case "embedding" => embeddingProbe(idx, batch, tau)
    case other => throw new IllegalArgumentException(s"unknown dedup family: $other")
  }

  /** (vec_id, v): embeddings double-cast for engine-identical arithmetic. */
  private def normalizedVecs(e: DataFrame): DataFrame =
    e.select(col("vec_id"), expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))

  /** Shared tail of both cosine paths: threshold, 6-dp round, stable order. */
  private def cosResult(pairs: DataFrame): DataFrame =
    pairs.filter(col("cos") >= 0.4)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy("id_a", "id_b")

  /** Exact all-pairs cosine pairs — the N^2 theta join. AUDIT SCALE ONLY:
    * callers go through [[embeddingCosinePairs]], which routes large inputs
    * to the LSH-bucketed path instead. */
  private[graft] def embeddingCosineAllPairs(e: DataFrame): DataFrame = {
    val n = normalizedVecs(e)
    val dot = expr("array_dot(a.v, b.v)")
    val norm = (side: String) => expr(s"sqrt(array_dot($side.v, $side.v))")
    val cos = dot / (norm("a") * norm("b"))
    cosResult(n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), cos.as("cos")))
  }

  /** Hyperplane-LSH candidate generation + exact cosine verify — the 100 TB
    * path: shuffles only (table, bucket) keys, cost scales with bucket
    * occupancy, never N^2; no cartesian/nested-loop join in the plan. */
  private[graft] def embeddingCosineLsh(e: DataFrame): DataFrame = {
    val n = normalizedVecs(e)
    // Candidate generation and dedup carry SCALAR columns only: the bucket
    // self-join shuffles on (tbl, bucket), the cross-table duplicate
    // elimination shuffles on (id_a, id_b), and the embedding vectors
    // re-join by id afterwards (the IVF shape). At dim-1024 this keeps
    // every exchange ~2000x smaller than keying/carrying the arrays.
    val sig = n
      .select(col("vec_id"),
        posexplode(Similarity.hyperplaneSigs(col("v"))).as(Seq("tbl", "bucket")))
    val cand = SafeOps.distinctRows(sig.as("a").join(sig.as("b"),
        col("b.tbl") === col("a.tbl") && col("b.bucket") === col("a.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b")))
      .join(n.select(col("vec_id").as("id_a"), col("v").as("va")), "id_a")
      .join(n.select(col("vec_id").as("id_b"), col("v").as("vb")), "id_b")
    val dot = expr("array_dot(va, vb)")
    val na = expr("sqrt(array_dot(va, va))")
    val nb = expr("sqrt(array_dot(vb, vb))")
    cosResult(cand.select(col("id_a"), col("id_b"), (dot / (na * nb)).as("cos")))
  }

  /** Intra-document repeated-line removal: cut each doc into fixed
    * `width`-token lines, drop within-doc repeats keeping first occurrence,
    * rebuild the text. Scan-local — zero shuffle at any scale. */
  def intraDocDedup(docs: DataFrame, width: Int = 2): DataFrame =
    docs
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"),
        expr(s"transform(sequence(0, cast(ceil(size(w) / $width.0) AS INT) - 1, 1), " +
          s"i -> concat_ws(' ', slice(w, i * $width + 1, $width)))").as("lines"))
      .withColumn("kept", array_distinct(col("lines")))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("dedup_text"),
        size(col("kept")).cast("long").as("kept_lines"))

  /** Embedding-space near-dup pairs with a SIZE GUARD: up to
    * `allPairsMaxRows` input vectors the exact all-pairs auditor runs
    * (O(N^2) — fine for samples/audits); above it the call auto-routes
    * through LSH candidates + exact verify, so nothing a caller does can
    * plan a cartesian over 10^9 vectors. The routing probe is a
    * limit-bounded count — it stops reading after threshold+1 rows instead
    * of scanning the whole input. */
  def embeddingCosinePairs(e: DataFrame,
      allPairsMaxRows: Long = 100000L): DataFrame =
    if (e.limit(math.min(allPairsMaxRows + 1, Int.MaxValue).toInt).count() <= allPairsMaxRows)
      embeddingCosineAllPairs(e)
    else embeddingCosineLsh(e)

  val defs: Seq[Q] = Seq(

    // Cross-document repeated-substring detection (the ExactSubstr signal
    // of "Deduplicating Training Data Makes Language Models Better",
    // Lee et al. 2022): CONTENT-DEFINED anchor sampling — every 24-char
    // gram whose md5 starts with '0' (1/16 rate) is an anchor, so two
    // documents sharing any ≥39-char run share the same anchors
    // regardless of alignment (no winnowing window needed). Docs sharing
    // ≥2 anchors are substring-duplicate candidates. Scale shape: grams
    // are scan-side, the only shuffle carries (md5, doc_id) scalars, and
    // the per-anchor df-cap (≤64 docs) kills boilerplate-anchor
    // quadratics exactly like the n-gram stop-shingle cap.
    Q("dd_substring", Some("""
      WITH g AS (
        SELECT doc_id, substr(text, CAST(i AS INT), 24) AS gram
        FROM (SELECT doc_id, text, unnest(range(1, length(text) - 22)) AS i
              FROM documents)),
      anchors AS (
        SELECT DISTINCT doc_id, md5(gram) AS h FROM g
        WHERE substr(md5(gram), 1, 1) = '0'),
      capped AS (
        SELECT h FROM anchors GROUP BY h
        HAVING count(*) BETWEEN 2 AND 64),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM anchors a JOIN capped USING (h) JOIN anchors b USING (h)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared_anchors
      FROM pairs WHERE shared >= 2 ORDER BY doc_a, doc_b""")) { (s, dir) =>
      val g = t(s, dir, "documents")
        .filter(length(col("text")) >= 24)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, length(text) - 23), i -> substring(text, i, 24))"))
          .as("gram"))
      val anchors = g.select(col("doc_id"), md5(col("gram")).as("h"))
        .filter(substring(col("h"), 1, 1) === "0")
        .distinct()
      val capped = anchors.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 64)
        .select("h")
      val aa = anchors.join(broadcast(capped), "h")
        .select(col("h"), col("doc_id").as("doc_a"))
      val bb = anchors.select(col("h"), col("doc_id").as("doc_b"))
      aa.join(bb, "h")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .select(col("doc_a"), col("doc_b"), col("shared").as("shared_anchors"))
        .orderBy("doc_a", "doc_b")
    },

    // exact dedup: hash-groupBy on a canonical fingerprint (prefix-80 canon
    // catches the boilerplate-prefix family in this corpus)
    Q("dd_exact_groups", Some("""
      SELECT md5(substr(text, 1, 80)) AS fp, count(*) AS n, min(doc_id) AS keeper
      FROM documents GROUP BY 1 HAVING count(*) > 1
      ORDER BY fp""")) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(substring(col("text"), 1, 80)).as("fp"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
        .filter(col("n") > 1)
        .orderBy("fp")
    },

    Q("dd_exact_dedup", Some("""
      SELECT min(doc_id) AS doc_id
      FROM documents GROUP BY md5(substr(text, 1, 80))
      ORDER BY doc_id""")) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(substring(col("text"), 1, 80)).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
        .orderBy("doc_id")
    },

    // exact dedup keeping the BEST doc per group (not the first): rank by
    // quality micros (unique-ratio proxy) with doc_id tie-break — what a
    // curation pipeline actually keeps. One window over the fingerprint key.
    Q("dd_exact_keep_best", Some("""
      WITH scored AS (
        SELECT doc_id, md5(substr(text, 1, 80)) AS fp,
          CAST(round(round(CAST(len(list_distinct(string_split(text, chr(32)))) AS DOUBLE)
            / len(string_split(text, chr(32))), 6) * 1000000) AS BIGINT) AS q_micros
        FROM documents),
      ranked AS (
        SELECT doc_id, fp, q_micros,
          row_number() OVER (PARTITION BY fp ORDER BY q_micros DESC, doc_id) AS rk
        FROM scored)
      SELECT doc_id, fp, q_micros FROM ranked WHERE rk = 1
      ORDER BY doc_id""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toks = split(col("text"), " ")
      val scored = t(s, dir, "documents")
        .select(col("doc_id"), md5(substring(col("text"), 1, 80)).as("fp"),
          round(round(size(array_distinct(toks)).cast("double") / size(toks), 6)
            * 1000000).cast("long").as("q_micros"))
      val w = Window.partitionBy("fp").orderBy(col("q_micros").desc, col("doc_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("doc_id", "fp", "q_micros")
        .orderBy("doc_id")
    },

    // exact n-gram Jaccard (distributed shingle join vs list-op oracle) —
    // size-guarded: the exact auditor at oracle scale, auto-LSH above the cap
    Q("dd_ngram_jaccard", Some(jaccardOracle)) { (s, dir) =>
      ngramJaccardPairs(t(s, dir, "documents"), 0.9)
    },

    // MinHash + LSH banding + exact verify. Same oracle as the exact query:
    // at j>=0.9 with 16 bands of 2 the miss probability is ~2e-12, and the
    // verify step removes false candidates, so LSH output == exact output.
    Q("dd_minhash_lsh", Some(jaccardOracle)) { (s, dir) =>
      minhashLshPairs(t(s, dir, "documents"), 0.9)
    },

    // Incremental batch-vs-corpus dedup, end to end through the WRITE
    // PATH: documents arrive in three ingest batches; the Store's dedup
    // hook keeps the persisted (sig, shingles) index and the verified
    // pair table current after each commit, each batch PROBING the index
    // (zero corpus re-shingling — PipelineSpec pins the probe plan reads
    // no documents scan). The accumulated pair table must equal a full
    // recompute over the union — the same exact-Jaccard oracle as
    // dd_minhash_lsh.
    Q("dd_incremental", Some(jaccardOracle)) { (s, dir) =>
      val store = new Store(s,
        java.nio.file.Files.createTempDirectory("graft-ddinc").toString)
      val docs = t(s, dir, "documents")
      store.replace("ddinc_docs", docs.filter(pmod(col("doc_id"), lit(3)) === 0))
      store.enableDedupIndex("ddinc_docs", "doc_id", "text", 0.9)
      (1L to 2L).foreach { i =>
        store.appendCompacting("ddinc_docs",
          docs.filter(pmod(col("doc_id"), lit(3)) === i))
      }
      store.read(store.dedupPairsTable("ddinc_docs")).orderBy("id_a", "id_b")
    },

    // Incremental SIMHASH index through the same write path: the persisted
    // row is 8 bytes of signature per doc (no shingle storage), each batch
    // probes only the chunk buckets it occupies, and the accumulated pair
    // table must equal the full dd_simhash recompute over the union.
    Q("dd_incremental_simhash", Some(simhashOracle)) { (s, dir) =>
      val store = new Store(s,
        java.nio.file.Files.createTempDirectory("graft-ddincsh").toString)
      val docs = t(s, dir, "documents")
      store.replace("ddincsh_docs", docs.filter(pmod(col("doc_id"), lit(3)) === 0))
      store.enableDedupIndex("ddincsh_docs", "doc_id", "text", 12,
        family = "simhash")
      (1L to 2L).foreach { i =>
        store.appendCompacting("ddincsh_docs",
          docs.filter(pmod(col("doc_id"), lit(3)) === i))
      }
      store.read(store.dedupPairsTable("ddincsh_docs", "simhash"))
        .orderBy("id_a", "id_b")
    },

    // SimHash: 60-bit signature from shingle-hash bit votes (shingles, not
    // bare tokens: the corpus vocabulary is tiny, so token-set simhash
    // cannot discriminate), candidates via 8-bit chunk banding (pigeonhole:
    // any hamming<=7 pair shares at least one of 8 chunks), verified with
    // bit_count(xor) <= 12. The shingle hash is the top 60 bits of md5 (not
    // xxhash64) so the DuckDB oracle can reproduce the signature bit-for-bit;
    // 60 bits also keeps every shift inside signed-i64 range on both engines.
    Q("dd_simhash", Some(simhashOracle)) { (s, dir) =>
      GraftExpressions.register(s)
      val d = shingled(s, dir)
        .withColumn("hashes",
          expr("transform(sh, t -> cast(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT))"))
      // bit-vote fold as a codegen'd expression (SimHashUtil): the HOF
      // formulation allocated a 60-long array per shingle — see Expressions.
      // cache: the chunk self-join below would otherwise recompute the
      // whole shingle+md5+signature pass for BOTH join sides
      val sim = d.select(col("doc_id"), expr("simhash_sig(hashes)").as("simhash"))
        .cache()
      try {
        val chunks = sim.select(col("doc_id"), col("simhash"),
          posexplode(expr("transform(sequence(0, 7), " +
            "c -> shiftright(simhash, cast(c * 8 AS INT)) & 255)")).as(Seq("chunk", "cval")))
        materialized(SafeOps.distinctRows(chunks.as("x").join(chunks.as("y"),
            col("x.chunk") === col("y.chunk") && col("x.cval") === col("y.cval")
              && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
            bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming")))
          .filter(col("hamming") <= 12)
          .orderBy("id_a", "id_b"))
      } finally sim.unpersist(false)
    },

    // Near-dup CLUSTERS: connected components over the >=0.9-Jaccard pair
    // graph (the step after pair mining in a dedup pipeline: each cluster
    // keeps one representative). Spark: iterative min-label propagation —
    // each round is one join + one aggregate, both map-side-combinable;
    // rounds = graph diameter (dup clusters are shallow). At 100 TB this is
    // the standard alternating large-star/small-star shape. Oracle: DuckDB
    // recursive CTE computing min reachable id.
    // Leakage-safe train/val/test split: a near-dup CLUSTER is assigned
    // atomically to one split (bucketing on the cluster representative,
    // not the doc), so two near-duplicate documents can never land in
    // train and test — the eval-contamination failure mode a per-doc
    // split has by construction. Same md5 buckets as txt_train_split.
    Q("dd_cluster_split", Some(s"""
      WITH RECURSIVE pairs AS (${jaccardPairsCte}),
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT doc_id FROM documents),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
      labels AS (SELECT src AS doc_id, min(node) AS cluster_id
                 FROM reach GROUP BY src),
      b AS (SELECT doc_id, cluster_id,
              CAST('0x' || substr(md5('cs-' || CAST(cluster_id AS VARCHAR)), 1, 4) AS INT) AS bucket
            FROM labels)
      SELECT doc_id, cluster_id,
        CASE WHEN bucket < 58982 THEN 'train'
             WHEN bucket < 62259 THEN 'val' ELSE 'test' END AS split
      FROM b ORDER BY doc_id""")) { (s, dir) =>
      clusterSplit(t(s, dir, "documents")).orderBy("doc_id")
    },

    Q("dd_cluster_cc", Some(s"""
      WITH RECURSIVE pairs AS (${jaccardPairsCte}),
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT doc_id FROM documents),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node)
      SELECT src AS doc_id, min(node) AS cluster_id
      FROM reach GROUP BY src ORDER BY doc_id""")) { (s, dir) =>
      clusterLabels(t(s, dir, "documents")).orderBy("doc_id")
    },

    // embedding-space near-dup: normalized cosine over double-cast vectors;
    // identical left-fold dot products on both engines
    Q("dd_embedding_cosine", Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
      ORDER BY id_a, id_b""")) { (s, dir) =>
      // size-guarded: all-pairs at oracle scale, auto-LSH above the cap
      embeddingCosinePairs(t(s, dir, "embeddings"))
    },

    // the 100 TB embedding near-dup path: random-hyperplane LSH buckets for
    // candidate generation (shuffles only (table, bucket) keys — cost scales
    // with bucket occupancy, not N^2), exact cosine verify on candidates.
    // dd_embedding_cosine above is the all-pairs auditor at oracle scale;
    // recall of this bucketed variant against it is pinned in PipelineSpec.
    // The oracle reproduces the same hyperplanes/buckets/folds in DuckDB.
    Q("dd_embedding_lsh", Some(embeddingLshOracle)) { (s, dir) =>
      embeddingCosineLsh(t(s, dir, "embeddings"))
    },

    // Incremental EMBEDDING index through the write path: vectors arrive in
    // three ingest batches; the persisted index row carries the vector plus
    // its precomputed hyperplane buckets (no probe ever re-hashes the
    // corpus), each batch probes only buckets it occupies, and the
    // accumulated pair table must equal the full dd_embedding_lsh recompute
    // over the union at the same tau.
    Q("dd_incremental_embedding", Some(embeddingLshOracle)) { (s, dir) =>
      val store = new Store(s,
        java.nio.file.Files.createTempDirectory("graft-ddincemb").toString)
      val vecs = t(s, dir, "embeddings")
      store.replace("ddincemb_vecs", vecs.filter(pmod(col("vec_id"), lit(3)) === 0))
      store.enableDedupIndex("ddincemb_vecs", "vec_id", "embedding", 0.4,
        family = "embedding")
      (1L to 2L).foreach { i =>
        store.appendCompacting("ddincemb_vecs",
          vecs.filter(pmod(col("vec_id"), lit(3)) === i))
      }
      store.read(store.dedupPairsTable("ddincemb_vecs", "embedding"))
        .orderBy("id_a", "id_b")
    },

    // line-level exact dedup (the RefinedWeb/CCNet pre-pass): cut each doc
    // into fixed 3-token lines, keep the globally first occurrence of every
    // line (order: doc_id, line_no), report kept/removed per doc. One
    // shuffle on the line text; the explode is scan-side. At 100 TB the
    // shuffle key is the line hash — same shape as exact doc dedup.
    Q("dd_line_dedup", Some("""
      WITH toks AS (SELECT doc_id, string_split(text, chr(32)) AS w FROM documents),
      idx AS (SELECT doc_id, w,
          unnest(range(0, CAST(ceil(len(w) / 3.0) AS BIGINT))) AS i
        FROM toks),
      lines AS (SELECT doc_id, CAST(i AS INT) AS line_no,
          array_to_string(w[i * 3 + 1 : i * 3 + 3], chr(32)) AS line
        FROM idx),
      ranked AS (SELECT doc_id, line,
          row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS occ
        FROM lines)
      SELECT doc_id,
        CAST(count(*) AS BIGINT) AS n_lines,
        CAST(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
        CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS removed
      FROM ranked GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
      val lines = t(s, dir, "documents")
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), posexplode(
          expr("transform(sequence(0, cast(ceil(size(w) / 3.0) AS INT) - 1, 1), " +
            "i -> concat_ws(' ', slice(w, i * 3 + 1, 3)))")).as(Seq("line_no", "line")))
      val occ = row_number().over(
        Window.partitionBy("line").orderBy("doc_id", "line_no"))
      lines.withColumn("occ", occ)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("occ") === 1, 1).otherwise(0)).as("kept"),
          sum(when(col("occ") > 1, 1).otherwise(0)).as("removed"))
        .orderBy("doc_id")
    },

    // intra-document repeated-line removal (the CCNet/RefinedWeb in-doc
    // pre-pass, distinct from the corpus-wide dd_line_dedup): repeats of a
    // line are dropped WITHIN their own document, first occurrence kept in
    // place, and the deduped text is rebuilt. Entirely scan-local — each
    // row rewrites itself via array_distinct (which preserves first-seen
    // order), so the op carries zero shuffle at any scale.
    Q("dd_intra_doc", Some("""
      WITH toks AS (SELECT doc_id, string_split(text, chr(32)) AS w FROM documents),
      idx AS (SELECT doc_id, w,
          unnest(range(0, CAST(ceil(len(w) / 2.0) AS BIGINT))) AS i
        FROM toks),
      lines AS (SELECT doc_id, CAST(i AS BIGINT) AS line_no,
          array_to_string(w[i * 2 + 1 : i * 2 + 2], chr(32)) AS line
        FROM idx),
      firsts AS (SELECT doc_id, line, min(line_no) AS pos
        FROM lines GROUP BY doc_id, line)
      SELECT doc_id,
        string_agg(line, chr(32) ORDER BY pos) AS dedup_text,
        CAST(count(*) AS BIGINT) AS kept_lines
      FROM firsts GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
      intraDocDedup(t(s, dir, "documents")).orderBy("doc_id")
    },

    // SemDeDup (semantic dedup): cluster-bounded pairwise cosine — a vector
    // is dropped when a lower-id vector in the SAME cluster is closer than
    // the threshold. Labels stand in for the k-means assignment here (the
    // sim_ivf path is the 100 TB clusterer); the quadratic is bounded by
    // cluster size, never all-pairs.
    Q("dd_semdedup", Some(s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dup AS (SELECT DISTINCT b.vec_id AS dropped
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ${Similarity.duckCos("a.v", "b.v")} >= 0.28)
      SELECT e.vec_id, CAST(e.label AS INT) AS label,
        e.vec_id NOT IN (SELECT dropped FROM dup) AS kept
      FROM e ORDER BY e.vec_id""")) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
      val dot = expr("array_dot(va, vb)")
      val na = expr("sqrt(array_dot(va, va))")
      val nb = expr("sqrt(array_dot(vb, vb))")
      val dropped = e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("b.vec_id").as("vec_id"), col("a.v").as("va"), col("b.v").as("vb"))
        .filter(dot / (na * nb) >= 0.28)
        .select("vec_id")
      val droppedIds = SafeOps.distinctRows(dropped)
        .withColumn("is_dup", lit(1))
      e.join(droppedIds, Seq("vec_id"), "left")
        .select(col("vec_id"), col("label").cast("int").as("label"),
          col("is_dup").isNull.as("kept"))
        .orderBy("vec_id")
    }
  )

  /** Connected-component labels over the near-dup pair graph: iterative
    * min-label propagation with localCheckpoint-truncated lineage. Edges
    * come from the SCALE-path pair miner (minhash-LSH + exact verify, the
    * same ≥0.9 pair set as the exact auditor at banded-join cost). */
  private[graft] def clusterLabels(docs: DataFrame): DataFrame = {
    val edges = minhashLshPairs(docs, 0.9).select("id_a", "id_b")
    val bidir = edges.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(edges.select(col("id_b").as("a"), col("id_a").as("b")))
      .cache()
    var labels = docs.select(col("doc_id"), col("doc_id").as("cluster_id"))
    var changed = 1L
    try {
      while (changed > 0) {
        // candidate label for each node: min over self and neighbors' labels
        val viaNeighbors = bidir
          .join(labels.withColumnRenamed("doc_id", "a"), "a")
          .groupBy(col("b").as("doc_id"))
          .agg(min(col("cluster_id")).as("n_label"))
        // localCheckpoint truncates the per-iteration lineage — without it
        // the plan (and task closures) grow linearly with rounds, which is
        // what kills long iterative jobs at scale
        val next = labels.join(viaNeighbors, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("cluster_id"), coalesce(col("n_label"), col("cluster_id"))).as("cluster_id"))
          .localCheckpoint()
        changed = next.join(labels.withColumnRenamed("cluster_id", "old"), "doc_id")
          .filter(col("cluster_id") =!= col("old")).count()
        labels = next
      }
      labels
    } finally { bidir.unpersist(false); () }
  }

  /** Leakage-safe split: buckets on the near-dup CLUSTER representative so
    * near-duplicates always share a split. Same md5 bucket thresholds as
    * the per-doc split operator. */
  private[graft] def clusterSplit(docs: DataFrame): DataFrame =
    clusterLabels(docs)
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(concat('cs-', CAST(cluster_id AS STRING))), 1, 4), 16, 10) AS INT)"))
      .select(col("doc_id"), col("cluster_id"),
        when(col("bucket") < 58982, "train")
          .when(col("bucket") < 62259, "val").otherwise("test").as("split"))
}
