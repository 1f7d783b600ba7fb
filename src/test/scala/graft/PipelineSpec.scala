package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Invariants for the no-oracle pipeline operators (LSH, simhash, lang-id,
  * rolling hash) — these are the checks the DuckDB gate can't express. */
class PipelineSpec extends SparkSpecBase {

  private def pairSet(name: String): Set[(Long, Long)] =
    run(name).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("video fingerprint: clones collapse, bases separate, frames real JPEG") {
    // ids 9,10 share base 3 (frame-identical, byte-distinct via the free
    // box); id 12 is base 4 — only a real frame slice + JPEG decode +
    // stable perceptual hash reproduces this structure
    val a = Multimodal.synthMjpegClone(9)
    val b = Multimodal.synthMjpegClone(10)
    val c = Multimodal.synthMjpegClone(12)
    assert(!java.util.Arrays.equals(a, b), "clones must be byte-distinct")
    val (na, fa) = Multimodal.videoFingerprint(a).get
    val (nb, fb) = Multimodal.videoFingerprint(b).get
    val (_, fc) = Multimodal.videoFingerprint(c).get
    assert(na == nb && fa == fb, "same-base clips must fingerprint identically")
    assert(fa != fc, "different bases must fingerprint apart")
    // the sliced frames are genuine JPEGs the JDK can decode
    val frames = Multimodal.decodeMjpegFrames(a).get
    assert(frames.length == na)
    frames.foreach { f =>
      assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8, "JPEG SOI marker")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 19 && img.getHeight == 15)
    }
  }

  test("multi-iteration kmeans is bit-reproducible with monotone inertia") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val (c1, in1) = Similarity.kmeansTrain(e, 5, 4)
    val (c2, in2) = Similarity.kmeansTrain(e, 5, 4)
    assert(c1 == c2 && in1 == in2) // exact lattice arithmetic: identical runs
    assert(c1.size == 5 && c1.forall(_.size == 64))
    // Lloyd's decreases exact inertia; the floor-lattice centroid rounding
    // can add at most dims * (2*|coord| + 1) per point ≈ 1.3e11 total here
    in1.zip(in1.tail).foreach { case (a, b) => assert(b <= a + 150000000000L, in1) }
  }

  test("cluster split is leakage-safe: every near-dup pair shares a split") {
    val docs = Tables.df(spark, sfDir, "documents")
    val split = Dedup.clusterSplit(docs)
    val pairs = Dedup.minhashLshPairs(docs, 0.9).select("id_a", "id_b")
    val leaked = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb"))
    assert(leaked.count() == 0, "near-dup pair split across train/test")
    // and the split covers every doc exactly once
    assert(split.count() == docs.count())
  }

  test("count-min heavy hitters match the exact top-k") {
    val docs = Tables.df(spark, sfDir, "documents")
    val exact = TextAnalysis.topTermsExact(docs, 25).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sketch = TextAnalysis.topTermsSketch(docs, 25).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // eps is sized for this volume: the ranking and the counts are exact
    assert(sketch.toSeq == exact.toSeq,
      s"sketch ${sketch.take(5).toSeq} vs exact ${exact.take(5).toSeq}")
    // CMS never underestimates: spot-probe some mid-frequency terms
    val mids = TextAnalysis.topTermsExact(docs, 200).collect().drop(150)
      .map(r => (r.getString(0), r.getLong(1)))
    val bySketch = TextAnalysis.topTermsSketch(docs, 100000).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    mids.foreach { case (t, n) =>
      bySketch.get(t).foreach(est => assert(est >= n, s"$t: $est < $n"))
    }
  }

  test("minhash LSH pairs equal exact jaccard pairs at this scale") {
    assert(pairSet("dd_minhash_lsh") == pairSet("dd_ngram_jaccard"))
  }

  test("simhash near-dup pairs cover the strongest jaccard dups") {
    val strong = run("dd_ngram_jaccard")
      .filter(col("jaccard") >= 0.97)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = pairSet("dd_simhash")
    assert(strong.nonEmpty)
    assert(strong.subsetOf(sim),
      s"missing from simhash: ${strong.diff(sim)}")
  }

  test("ANN LSH recall@10 vs brute force >= 0.5") {
    def topk(name: String): Map[Long, Set[Long]] =
      run(name).select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    val exact = topk("sim_cosine_topk")
    val ann = topk("sim_ann_lsh")
    val recalls = exact.map { case (q, ex) =>
      ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean")
  }

  test("kNN-graph LSH recall@3 vs the exact graph >= 0.5") {
    val exact = run("sim_knn_graph").select("src", "dst").collect()
      .groupBy(_.getLong(0)).map { case (s, rs) => s -> rs.map(_.getLong(1)).toSet }
    val sub = Tables.df(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 5 === 0)
    val lsh = Similarity.knnGraphLsh(sub, 3).select("src", "dst").collect()
      .groupBy(_.getLong(0)).map { case (s, rs) => s -> rs.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (s, ex) =>
      lsh.getOrElse(s, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean")
  }

  test("substring-anchor dedup is content-defined: shared runs survive a shift") {
    import spark.implicits._
    val subs = run("dd_substring").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(subs.nonEmpty, "no substring pairs found in the corpus")
    // alignment-independence: a doc sharing a long run at a DIFFERENT
    // offset still pairs (content-defined anchors need no winnowing sync)
    val shared = "x" * 30 + " the quick brown fox jumps over the lazy dog " + "y" * 30
    val synth = Seq(
      (1L, "AAAA " + shared),
      (2L, "a completely different and much longer prefix here " + shared))
      .toDF("doc_id", "text")
    val g = synth.select(col("doc_id"), explode(expr(
      "transform(sequence(1, length(text) - 23), i -> substring(text, i, 24))")).as("gram"))
    val anchors = g.select(col("doc_id"), md5(col("gram")).as("h"))
      .filter(substring(col("h"), 1, 1) === "0").distinct()
    val common = anchors.groupBy("h").count().filter(col("count") === 2).count()
    assert(common >= 2, s"shifted duplicates must share >= 2 anchors, got $common")
  }

  test("exact dedup keeps one doc per fingerprint group") {
    val total = Tables.df(spark, sfDir, "documents").count()
    val groups = run("dd_exact_groups")
      .agg(sum(col("n")).as("dup_docs"), count(lit(1)).as("ngroups"))
      .collect()(0)
    val kept = run("dd_exact_dedup").count()
    assert(kept == total - (groups.getLong(0) - groups.getLong(1)))
  }

  test("lang_id is deterministic and follows stopword profiles") {
    assert(TextAnalysis.langId("the a the cat") == "en")
    assert(TextAnalysis.langId("der und die das") == "de")
    assert(TextAnalysis.langId("le et les un") == "fr")
    assert(TextAnalysis.langId("xyzzy") == "en") // tie -> first profile
    val out1 = run("txt_lang_id").collect().toSeq
    val out2 = run("txt_lang_id").collect().toSeq
    assert(out1 == out2)
  }

  test("rolling_hash matches reference implementation, codegen and eval") {
    import org.apache.spark.unsafe.types.UTF8String
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, cp) => h * 1000003L + cp)
    assert(RollingHashUtil.hash(UTF8String.fromString("abc")) == ref("abc"))
    GraftExpressions.register(spark)
    val got = spark.sql("SELECT rolling_hash('hello world') AS h").collect()(0).getLong(0)
    assert(got == ref("hello world"))
    // stability across rows via the query path
    val rows = run("txt_fingerprint_rolling").limit(5).collect()
    val docs = Tables.df(spark, sfDir, "documents").orderBy("doc_id").limit(5).collect()
    rows.zip(docs).foreach { case (r, d) =>
      assert(r.getLong(1) == ref(d.getAs[String]("text")))
    }
  }

  test("minhash_sigs equals per-seed xxhash64 minima, codegen and eval") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    GraftExpressions.register(spark)
    // independent reference: hash each string's UTF-8 bytes with seed j
    def ref(shingles: Seq[String], k: Int): Seq[Long] =
      (0 until k).map { j =>
        shingles.map { s =>
          val u = UTF8String.fromString(s)
          XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, j)
        }.min
      }
    val sample = Seq("the quick fox", "jumps over", "the lazy dog")
    val got = spark.sql(
      s"SELECT minhash_sigs(array(${sample.map("'" + _ + "'").mkString(",")}), 8) AS s")
      .collect()(0).getSeq[Long](0)
    assert(got == ref(sample, 8))
    // the expression is deterministic through the full distributed query
    // path (signature -> banding) — two runs, identical buckets
    val q = () => SparkEntry.queries("dd_minhash_lsh")(spark, sfDir).collect().toSeq
    assert(q() == q())
  }

  test("quality score stays in [0,1] and penalizes stopword soup") {
    val rows = run("txt_quality_score").select("quality").collect().map(_.getDouble(0))
    assert(rows.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("bucketed embedding near-dup recall vs the all-pairs auditor") {
    val exact = run("dd_embedding_cosine").select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("dd_embedding_lsh").select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verified candidates are a subset of the true pair set (precision 1.0)
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("embedding cosine size guard routes large inputs off the N^2 plan") {
    val e = Tables.df(spark, sfDir, "embeddings")
    // force the route (threshold 0 = "every input is too big for all-pairs")
    val routed = Dedup.embeddingCosinePairs(e, allPairsMaxRows = 0L)
    val plan = routed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "routed path planned a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "routed path planned a nested-loop join")
    // the routed result is the LSH+verify pair set: subset of the auditor
    val exact = Dedup.embeddingCosinePairs(e).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = routed.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty && got.subsetOf(exact))
  }

  test("intra-doc dedup is scan-local and keeps first occurrences in order") {
    import spark.implicits._
    // no Exchange in the plan: the op must stay embarrassingly parallel
    val docs = Tables.df(spark, sfDir, "documents")
    val plan = Dedup.intraDocDedup(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"intra-doc dedup planned a shuffle:\n$plan")
    // semantic pin on a hand-built doc: 2-token lines, repeats dropped in place
    val one = Seq((1L, "a b c d a b e f c d")).toDF("doc_id", "text")
    val got = Dedup.intraDocDedup(one).as[(Long, String, Long)].collect().head
    assert(got == ((1L, "a b c d e f", 3L)))
  }

  test("ngram jaccard size guard routes large inputs to the LSH path") {
    val docs = Tables.df(spark, sfDir, "documents")
    // force the route (threshold 0 = "every input is too big for exact")
    val routed = Dedup.ngramJaccardPairs(docs, 0.9, exactMaxRows = 0L)
    val exact = Dedup.ngramJaccardPairs(docs, 0.9) // under the cap -> exact
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // at tau>=0.9 routing is invisible: LSH+verify == the exact auditor
    assert(pairs(routed) == pairs(exact))
    assert(pairs(routed).nonEmpty)
  }

  test("stop-shingle cap bounds candidate pairs under boilerplate skew") {
    import spark.implicits._
    // 200 docs all sharing ONE boilerplate shingle, with unique tails: the
    // uncapped self-join puts every pair on that key (quadratic blowup)
    val docs = (1 to 200)
      .map(i => (i.toLong, s"common boilerplate prefix u${i}a u${i}b u${i}c"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleSets(docs)
    val uncapped = Dedup.candidatePairs(sh, Int.MaxValue).count()
    val capped = Dedup.candidatePairs(sh, 100).count()
    assert(uncapped == 200L * 199 / 2, s"fixture not skewed: $uncapped")
    assert(capped == 0, s"hot shingle survived the cap: $capped pairs")
    // near-identical docs still become candidates under the cap: they share
    // plenty of rare shingles besides the boilerplate
    val nearDups = Seq(
      (1001L, "common boilerplate prefix alpha beta gamma delta epsilon"),
      (1002L, "common boilerplate prefix alpha beta gamma delta zeta"))
      .toDF("doc_id", "text")
    val cappedDups =
      Dedup.candidatePairs(Dedup.shingleSets(docs.unionByName(nearDups)), 100)
    assert(cappedDups.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1001L, 1002L)))
  }

  test("hot LSH bucket: boilerplate corpus stays sub-quadratic, dups still found") {
    import spark.implicits._
    // adversarial shape: 2000 docs share HALF their shingles (one template),
    // unique tails otherwise. j ~= 0.5 pairs collide in >=1 of 16 bands with
    // ~99% probability, so uncapped candidate generation approaches all
    // pairs (~2M); the bucket guard must keep candidates near-linear.
    val template = (1 to 12).map(i => s"tmpl$i").mkString(" ")
    val docs = (1 to 2000).map(i =>
      (i.toLong, s"$template u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f " +
        s"u${i}g u${i}h u${i}i u${i}j u${i}k u${i}l")).toDF("doc_id", "text")
    // plant true near-dup pairs that must survive the guard
    val dups = Seq(
      (9001L, s"$template alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (9002L, s"$template alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"))
      .toDF("doc_id", "text")
    val all = docs.unionByName(dups)
    val cand = Dedup.lshCandidates(Dedup.shingleSets(all)).count()
    val allPairs = 2002L * 2001 / 2
    assert(cand < allPairs / 50,
      s"bucket guard failed: $cand candidates of $allPairs possible")
    val found = Dedup.minhashLshPairs(all, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // exactly the planted pair: boilerplate-only pairs sit at j ~= 0.29,
    // far below tau, and the exact verify rejects every one of them
    assert(found == Seq((9001L, 9002L)),
      s"expected only the planted near-dup pair, got: $found")
  }

  test("elision-proof dedup: distinctRows == distinct and plans a live count") {
    import spark.implicits._
    // semantic equivalence on a frame with real duplicate multiplicity
    val df = Seq((1L, 2L), (1L, 2L), (1L, 2L), (3L, 4L), (3L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    assert(SafeOps.distinctRows(df).collect().toSet == df.distinct().collect().toSet)
    assert(SafeOps.distinctRows(df).count() == 3)
    // the optimized plan must keep an aggregate FUNCTION (count) — a
    // keys-only Distinct is the shape that was once elided under the
    // concurrent verify sweep, leaking pair multiplicities into the gate
    val opt = SafeOps.distinctRows(df).queryExecution.optimizedPlan.toString
    assert(opt.contains("count"), s"live count pruned from plan:\n$opt")
  }

  test("int8 quantization preserves cosine within 1e-3 on every vector") {
    val rows = SparkEntry.queries("sim_int8_quant")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("cos_orig_quant")) >= 0.999,
        s"vec ${r.getLong(0)} cos ${r.getDouble(r.fieldIndex("cos_orig_quant"))}")
      assert(r.getDouble(r.fieldIndex("max_abs_err")) <= 0.01)
    }
  }

  test("line dedup partitions every line into kept or removed, keeps firsts") {
    val rows = SparkEntry.queries("dd_line_dedup")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("kept")) + r.getLong(r.fieldIndex("removed"))
        == r.getLong(r.fieldIndex("n_lines")))
    }
    // the globally first doc loses nothing (its lines are all first
    // occurrences by the (doc_id, line_no) order)
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(first.fieldIndex("removed")) == 0L)
  }

  test("sequence packing is invariant to partition count (distributed prefix sum)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.df(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
    val a = TextAnalysis.seqPack(docs, 512L, 8).orderBy("doc_id").collect()
    val b = TextAnalysis.seqPack(docs, 512L, 3).orderBy("doc_id").collect()
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq, "prefix sums must not depend on partitioning")
    // offsets are dense: each start equals the previous start + len
    a.sliding(2).foreach {
      case Array(p, q) =>
        assert(q.getLong(q.fieldIndex("start"))
          == p.getLong(p.fieldIndex("start")) + p.getLong(p.fieldIndex("len")))
      case _ =>
    }
  }

  test("global shuffle rank is invariant to partition count and a permutation") {
    import org.apache.spark.sql.functions._
    val docs = Tables.df(spark, sfDir, "documents").select("doc_id")
    val a = TextAnalysis.globalShuffle(docs, "s7", 8, 8).orderBy("doc_id").collect()
    val b = TextAnalysis.globalShuffle(docs, "s7", 3, 8).orderBy("doc_id").collect()
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq, "distributed rank must not depend on partitioning")
    // pos is a permutation of 1..N and follows skey order
    val n = a.length
    assert(a.map(_.getLong(a.head.fieldIndex("pos"))).sorted.toSeq == (1L to n).toSeq)
    val bySkey = a.sortBy(_.getString(a.head.fieldIndex("skey")))
    assert(bySkey.map(_.getLong(a.head.fieldIndex("pos"))).toSeq == (1L to n).toSeq)
    // a different seed yields a different order
    val c = TextAnalysis.globalShuffle(docs, "s8", 8, 8).orderBy("doc_id").collect()
    assert(c.map(_.getLong(c.head.fieldIndex("pos"))).toSeq !=
      a.map(_.getLong(a.head.fieldIndex("pos"))).toSeq)
  }

  test("domain mix: every source is represented and big sources are down-weighted") {
    val rows = SparkEntry.queries("txt_domain_mix")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySource.size > 1, "more than one source survives the mix")
  }

  test("semdedup drops only vectors with a lower-id near neighbor in-cluster") {
    val rows = SparkEntry.queries("dd_semdedup")(spark, sfDir).collect()
    val dropped = rows.filter(!_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(dropped.nonEmpty, "threshold should drop some vectors at this SF")
    // the lowest vec_id overall can never be dropped
    assert(!dropped.contains(rows.map(_.getLong(0)).min))
  }

  test("incremental dedup probe plan never scans the corpus documents table") {
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-ddpin").toString)
    val docs = Tables.df(spark, sfDir, "documents")
    store.replace("ddpin_docs", docs.filter(pmod(col("doc_id"), lit(2)) === 0))
    store.enableDedupIndex("ddpin_docs", "doc_id", "text", 0.9)
    val batch = Dedup.minhashIndexFrame(
      docs.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text")
    val probe = Dedup.minhashProbe(
      store.read(store.dedupIdxTable("ddpin_docs")), batch, 0.9)
    // structural pin: the probe's scans read the INDEX table (and the
    // testdata batch), never any version dir of the corpus docs table
    val paths = probe.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten
    assert(paths.exists(_.contains("ddpin_docs__mh_idx")),
      s"probe must read the persisted index: $paths")
    assert(!paths.exists(p => p.contains("/ddpin_docs/") ),
      s"probe must NOT rescan the corpus docs table: $paths")
  }

  test("incremental probe past the broadcast-id gate still matches; retraction plans anti-joins, not In-literals") {
    import spark.implicits._
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-ddgate").toString)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    store.replace("ddg_docs", Seq(
      (1L, base), (2L, base + " lambda")).toDF("doc_id", "text"))
    store.enableDedupIndex("ddg_docs", "doc_id", "text", 0.5)
    val pairsT = store.dedupPairsTable("ddg_docs")
    def pairs(): Set[(Long, Long)] = store.read(pairsT)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs() == Set((1L, 2L)))
    // Record every plan the refresh executes so the retraction shape and
    // the join fallback are structurally pinned, not just behaviorally.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // shrink the gate to 1 id: the 2-doc batch MUST take the shuffle-join
      // fallback instead of broadcasting its id set
      spark.conf.set("spark.graft.dedupBroadcastIdRows", "1")
      store.appendCompacting("ddg_docs",
        Seq((3L, base + " mu"), (4L, base + " nu")).toDF("doc_id", "text"))
      assert(pairs() == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
        (2L, 4L), (3L, 4L)), s"gated probe must match full semantics: ${pairs()}")
      // retraction: delete one doc; its pairs die via anti-joins
      plans.clear()
      store.deleteByKey("ddg_docs", Seq(Tuple1(2L)).toDF("doc_id"), "doc_id")
      assert(pairs() == Set((1L, 3L), (1L, 4L), (3L, 4L)), pairs().toString)
      import scala.jdk.CollectionConverters._
      val pairPlans = plans.asScala.filter(_.contains("mh_pairs"))
      assert(pairPlans.exists(_.contains("LeftAnti")),
        "pair retraction must be an anti-join")
      assert(!pairPlans.exists(p => p.contains("id_a#") && p.contains(" IN (")),
        "pair retraction must not filter with an In-literal list")
    } finally {
      spark.conf.unset("spark.graft.dedupBroadcastIdRows")
      spark.listenerManager.unregister(listener)
    }
  }

  test("index staleness is visible, probes can refuse (opt-in), and the next commit heals") {
    import spark.implicits._
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-stale").toString)
    def vec(id: Long, x: Double, y: Double) = (id, Seq(x, y))
    store.replace("sv_vecs",
      Seq(vec(1, 1.0, 0.0), vec(2, 0.0, 1.0)).toDF("vec_id", "embedding"))
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "cv")
    store.enableAnnIndex("sv_vecs", cents)
    def staleRow() = store.indexStaleness.find(_._2 == "ann").get
    assert(!staleRow()._5, "fresh index must not read stale")
    // force a refresh failure: kill the centroids table the incremental
    // assign reads, then commit a batch — the hook fails, only warns
    store.drop(store.annCentsTable("sv_vecs"))
    store.appendCompacting("sv_vecs",
      Seq(vec(3, 0.9, 0.1)).toDF("vec_id", "embedding"))
    val r = staleRow()
    assert(r._5, s"failed refresh must surface as stale: $r")
    assert(r._3 < r._4, s"watermark must trail the table: $r")
    assert(r._6.nonEmpty, s"the failure reason must be recorded: $r")
    val q = Seq(vec(100, 1.0, 0.0)).toDF("vec_id", "embedding")
    // strict mode: the stale probe refuses, naming the recorded failure
    spark.conf.set("spark.graft.strictIndexProbes", "true")
    try {
      val e = intercept[IllegalStateException] {
        store.annQuery("sv_vecs", q, probes = 2, k = 2)
      }
      assert(e.getMessage.contains("stale"), e.getMessage)
      assert(e.getMessage.contains("last refresh error"), e.getMessage)
      // restore the centroids: the index is SERVABLE again but still
      // stale (the watermark trails until the next commit's hook runs)
      store.replace(store.annCentsTable("sv_vecs"), cents)
      assert(staleRow()._5, "restoring centroids alone must not clear staleness")
      spark.conf.set("spark.graft.strictIndexProbes", "false")
      // default mode: a stale probe serves (with a warning)
      assert(store.annQuery("sv_vecs", q, probes = 2, k = 2).count() > 0)
      spark.conf.set("spark.graft.strictIndexProbes", "true")
      // heal: the NEXT commit's hook repairs (the cumulative change feed
      // covers the missed batch too)
      store.appendCompacting("sv_vecs",
        Seq(vec(4, 0.1, 0.9)).toDF("vec_id", "embedding"))
      val healed = staleRow()
      assert(!healed._5 && healed._6.isEmpty, s"next commit must heal: $healed")
      // the repaired index covers BOTH batches (3 and 4), and strict
      // probes serve again
      assert(store.read(store.annIdxTable("sv_vecs")).count() == 4)
      assert(store.annQuery("sv_vecs", q, probes = 2, k = 2).count() > 0)
    } finally spark.conf.unset("spark.graft.strictIndexProbes")
  }

  test("repairIndexOnProbe: a stale probe read-repairs before serving") {
    import spark.implicits._
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-repair").toString)
    def vec(id: Long, x: Double, y: Double) = (id, Seq(x, y))
    store.replace("rp_vecs",
      Seq(vec(1, 1.0, 0.0), vec(2, 0.0, 1.0)).toDF("vec_id", "embedding"))
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "cv")
    store.enableAnnIndex("rp_vecs", cents)
    // go stale: break the refresh, commit, restore the centroids — the
    // watermark still trails (the hook only runs on rp_vecs commits)
    store.drop(store.annCentsTable("rp_vecs"))
    store.appendCompacting("rp_vecs",
      Seq(vec(3, 0.9, 0.1)).toDF("vec_id", "embedding"))
    store.replace(store.annCentsTable("rp_vecs"), cents)
    assert(store.indexStaleness.find(_._2 == "ann").get._5, "precondition: stale")
    // strict mode would refuse — but read-repair heals first and serves
    spark.conf.set("spark.graft.strictIndexProbes", "true")
    spark.conf.set("spark.graft.repairIndexOnProbe", "true")
    try {
      val q = Seq(vec(100, 1.0, 0.0)).toDF("vec_id", "embedding")
      assert(store.annQuery("rp_vecs", q, probes = 2, k = 3).count() > 0)
      val r = store.indexStaleness.find(_._2 == "ann").get
      assert(!r._5 && r._6.isEmpty, s"probe must have healed the index: $r")
      assert(store.read(store.annIdxTable("rp_vecs")).count() == 3)
    } finally {
      spark.conf.unset("spark.graft.strictIndexProbes")
      spark.conf.unset("spark.graft.repairIndexOnProbe")
    }
  }

  test("dedup index stays current through append, upsert and delete") {
    import spark.implicits._
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-ddmaint").toString)
    def doc(id: Long, text: String): (Long, String) = (id, text)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    store.replace("ddm_docs", Seq(
      doc(1, base), doc(2, base + " lambda")).toDF("doc_id", "text"))
    store.enableDedupIndex("ddm_docs", "doc_id", "text", 0.5)
    val pairsT = store.dedupPairsTable("ddm_docs")
    def pairs(): Set[(Long, Long)] = store.read(pairsT)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs() == Set((1L, 2L)), s"initial build finds the near-dup: ${pairs()}")
    // append a third near-dup: probe links it to both existing docs
    store.appendCompacting("ddm_docs", Seq(doc(3, base + " mu")).toDF("doc_id", "text"))
    assert(pairs() == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs().toString)
    // delete doc 2: its pairs die with it
    store.deleteByKey("ddm_docs", Seq(Tuple1(2L)).toDF("doc_id"), "doc_id")
    assert(pairs() == Set((1L, 3L)), pairs().toString)
    // upsert doc 3 to unrelated text: old pairs retract, no new ones
    store.upsert("ddm_docs",
      Seq(doc(3, "one two three four five six seven eight nine ten"))
        .toDF("doc_id", "text"), "doc_id")
    assert(pairs() == Set.empty, pairs().toString)
    // and the index itself tracked membership
    val idxIds = store.read(store.dedupIdxTable("ddm_docs"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idxIds == Set(1L, 3L), idxIds.toString)
  }

  test("concurrent insert txns into a REGISTERED table: deferred hooks keep the index current") {
    import spark.implicits._
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-ddconc").toString)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    store.replace("ddc_docs", Seq((1L, base)).toDF("doc_id", "text"))
    store.enableDedupIndex("ddc_docs", "doc_id", "text", 0.5)
    // Two insert-only txns from two threads: both must commit (the index
    // hooks run AFTER the commit lock chain releases, so neither queues
    // behind the other's Spark index jobs), and the per-table-serialized
    // watermark refresh must leave index + pair tables current whichever
    // drain order the race produces.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val futs = Seq((2L, base + " lambda"), (3L, base + " mu")).map {
      case (id, t) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            val s = store.newStaging()
            store.withStaging(s)(store.appendCompacting(
              "ddc_docs", Seq((id, t)).toDF("doc_id", "text")))
            store.commitStaging(s)
          }
        })
    }
    futs.foreach(_.get()); pool.shutdown()
    assert(store.read("ddc_docs").count() == 3)
    val idxIds = store.read(store.dedupIdxTable("ddc_docs"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idxIds == Set(1L, 2L, 3L), idxIds.toString)
    val pairs = store.read(store.dedupPairsTable("ddc_docs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs.toString)
  }

  test("simhash probe plan never scans the corpus documents table") {
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-shpin").toString)
    val docs = Tables.df(spark, sfDir, "documents")
    store.replace("shpin_docs", docs.filter(pmod(col("doc_id"), lit(2)) === 0))
    store.enableDedupIndex("shpin_docs", "doc_id", "text", 12, family = "simhash")
    val batch = Dedup.simhashIndexFrame(
      docs.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text")
    val probe = Dedup.simhashProbe(
      store.read(store.dedupIdxTable("shpin_docs", "simhash")), batch, 12)
    val paths = probe.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten
    assert(paths.exists(_.contains("shpin_docs__sh_idx")),
      s"probe must read the persisted simhash index: $paths")
    assert(!paths.exists(p => p.contains("/shpin_docs/")),
      s"probe must NOT rescan the corpus docs table: $paths")
  }

  test("embedding probe reads only the index; candidate gen never carries vectors") {
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-embpin").toString)
    val vecs = Tables.df(spark, sfDir, "embeddings")
    store.replace("embpin_vecs", vecs.filter(pmod(col("vec_id"), lit(2)) === 0))
    store.enableDedupIndex("embpin_vecs", "vec_id", "embedding", 0.4,
      family = "embedding")
    val batch = Dedup.embeddingIndexFrame(
      vecs.filter(pmod(col("vec_id"), lit(2)) === 1), "vec_id", "embedding")
    val probe = Dedup.embeddingProbe(
      store.read(store.dedupIdxTable("embpin_vecs", "embedding")), batch, 0.4)
    val paths = probe.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten
    assert(paths.exists(_.contains("embpin_vecs__emb_idx")),
      s"probe must read the persisted embedding index: $paths")
    assert(!paths.exists(p => p.contains("/embpin_vecs/")),
      s"probe must NOT rescan the corpus vectors table: $paths")
    // the repo invariant holds on the probe too: no shuffle KEYS on an
    // embedding array — candidates move (tbl, bucket, id) scalars, vectors
    // re-join by scalar id for the verify only
    val p = probe.queryExecution.executedPlan.toString
    "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).foreach { keys =>
        Seq("v#", "va#", "vb#", "sigs#").foreach(c =>
          assert(!keys.contains(c), s"array column in shuffle key: $keys"))
      }
  }

  test("ANN index probes only top-nprobe cells via pushed In(cid) filter") {
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-annpin").toString)
    val vecs = Tables.df(spark, sfDir, "embeddings")
    store.replace("annpin_vecs", vecs.filter(col("vec_id") < 200))
    val cents = vecs.filter(col("vec_id").isin(Similarity.centroidIds: _*))
      .select(col("vec_id").as("cid"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("cv"))
    store.enableAnnIndex("annpin_vecs", cents)
    store.appendCompacting("annpin_vecs", vecs.filter(col("vec_id") >= 200))
    val queries = vecs.filter(col("vec_id").isin(0L, 1L, 2L))
    val res = store.annQuery("annpin_vecs", queries)
    // the probe reads the assignments + centroid tables, never the corpus
    val paths = res.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten
    assert(paths.exists(_.contains("annpin_vecs__ivf_assign")), paths.toString)
    assert(!paths.exists(p => p.contains("/annpin_vecs/")),
      s"probe must NOT scan the corpus vector table: $paths")
    // the cell restriction reaches the parquet scan as a pushed In filter
    val formatted = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") && formatted.contains("In(cid"),
      formatted.take(4000))
    // correctness of the probe itself: top-1 neighbor of each query exists
    // and self never appears
    val rows = res.collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(r => r.getLong(0) == r.getLong(1)), "self-match leaked")

    // deletes retract assignment rows through the write path
    import spark.implicits._
    store.deleteByKey("annpin_vecs", Seq(Tuple1(1L)).toDF("vec_id"), "vec_id")
    val idxIds = store.read(store.annIdxTable("annpin_vecs"))
      .filter(col("vec_id") === 1L).count()
    assert(idxIds == 0L, "deleted vector still assigned")
  }

  test("index registrations survive a restart and resume incrementally") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-duridx").toString
    val s1 = new Store(spark, wh)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    s1.replace("dur_docs",
      Seq((1L, base), (2L, base + " lambda")).toDF("doc_id", "text"))
    s1.enableDedupIndex("dur_docs", "doc_id", "text", 0.5)
    val vecs = Tables.df(spark, sfDir, "embeddings")
    s1.replace("dur_vecs", vecs.filter(col("vec_id") < 200))
    val cents = vecs.filter(col("vec_id").isin(Similarity.centroidIds: _*))
      .select(col("vec_id").as("cid"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("cv"))
    s1.enableAnnIndex("dur_vecs", cents)

    // durability mechanics: the latest catalog snapshot carries both
    // registrations with a non-zero watermark
    val catFiles = new java.io.File(wh).listFiles()
      .filter(_.getName.matches("_catalog\\.v\\d+\\.json"))
      .sortBy(f => f.getName.stripPrefix("_catalog.v").stripSuffix(".json").toLong)
    val cat = new String(java.nio.file.Files.readAllBytes(
      catFiles.last.toPath), "UTF-8")
    assert(cat.contains("\"dedupIdx\"") && cat.contains("dur_docs/minhash"), cat)
    assert(cat.contains("\"annIdx\"") && cat.contains("\"dur_vecs\""), cat)

    // a FRESH mount (no enable calls): maintenance resumes through the
    // write path, and the ANN index answers queries immediately
    val s2 = new Store(spark, wh)
    s2.appendCompacting("dur_docs", Seq((3L, base + " mu")).toDF("doc_id", "text"))
    val pairs = s2.read(s2.dedupPairsTable("dur_docs"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs.toString)
    assert(s2.annQuery("dur_vecs",
      vecs.filter(col("vec_id").isin(0L, 1L))).count() > 0)
    // deletes retract through the restarted mount too
    s2.deleteByKey("dur_docs", Seq(Tuple1(1L)).toDF("doc_id"), "doc_id")
    val after = s2.read(s2.dedupPairsTable("dur_docs"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == Set((2L, 3L)), after.toString)
  }

  test("multi-family dedup indexes coexist and stay current on one table") {
    import spark.implicits._
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-ddfam").toString)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    store.replace("fam_docs", Seq(
      (1L, base, 100L), (2L, base + " lambda", 200L))
      .toDF("doc_id", "text", "fp"))
    // one table, two fingerprint families: text near-dups via minhash,
    // exact media clones via the stored fingerprint column
    store.enableDedupIndex("fam_docs", "doc_id", "text", 0.5)
    store.enableDedupIndex("fam_docs", "doc_id", "fp", 0, family = "phash")
    def pairs(family: String): Set[(Long, Long)] =
      store.read(store.dedupPairsTable("fam_docs", family))
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs("minhash") == Set((1L, 2L)), pairs("minhash").toString)
    assert(pairs("phash") == Set.empty, pairs("phash").toString)
    // doc 3 clones doc 1's fingerprint but carries unrelated text: the
    // phash index links it, the minhash index must not
    store.appendCompacting("fam_docs",
      Seq((3L, "one two three four five six seven eight nine ten", 100L))
        .toDF("doc_id", "text", "fp"))
    assert(pairs("minhash") == Set((1L, 2L)), pairs("minhash").toString)
    assert(pairs("phash") == Set((1L, 3L)), pairs("phash").toString)
    // deleting doc 1 retracts its pairs from BOTH families
    store.deleteByKey("fam_docs", Seq(Tuple1(1L)).toDF("doc_id"), "doc_id")
    assert(pairs("minhash") == Set.empty, pairs("minhash").toString)
    assert(pairs("phash") == Set.empty, pairs("phash").toString)
    // both indexes tracked membership through the delete
    Seq("minhash", "phash").foreach { fam =>
      val ids = store.read(store.dedupIdxTable("fam_docs", fam))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(2L, 3L), s"$fam index: $ids")
    }
  }
}
