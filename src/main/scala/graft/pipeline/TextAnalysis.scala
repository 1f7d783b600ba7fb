package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (builder brief +
  * SURVEY §7.5): token counting, quality scoring, language-ID heuristic,
  * document fingerprinting.
  *
  * All per-document features are pure scan-side expressions (whole-stage
  * codegen, no shuffle, no UDF except lang-ID) — at 100 TB these run at
  * parquet-scan speed and parallelize trivially across executors.
  */
object TextAnalysis {

  /** Whitespace tokens of the (already single-spaced) document text. */
  def tokens(c: Column): Column = split(c, " ")

  /** Word n-gram shingles (distinct), for Jaccard/MinHash dedup. */
  val shingleSql: String =
    "array_distinct(transform(sequence(0, size(split(text,' ')) - 3), " +
      "i -> concat_ws(' ', split(text,' ')[i], split(text,' ')[i+1], split(text,' ')[i+2])))"

  private val stopwords = Seq("the", "a")

  // PII regexes shared verbatim between the Spark side and the DuckDB
  // oracle (both engines speak the same basic-construct regex subset)
  private val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IP_RE = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  private val PHONE_RE = "\\+\\d{7,15}"

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  /** GPT-style sequence packing: documents are concatenated in doc_id order
    * and cut into fixed `window`-token contexts; each doc gets its global
    * token offset, pack id, and the number of packs it spans.
    *
    * The global offset is a distributed prefix sum, NOT a single-partition
    * window: range-partition by doc_id, per-partition token totals (one tiny
    * collect of numPartitions longs), broadcast the cumulative bases back,
    * then a per-partition window finishes the cumsum. At 100 TB this is one
    * pass plus a numPartitions-row driver exchange — no global sort, no
    * single-reducer window. The result is identical for ANY partition count
    * (prefix sums are associative), which PipelineSpec asserts. */
  def seqPack(docs: DataFrame, window: Long, parts: Int): DataFrame = {
    val spark = docs.sparkSession
    val parted = docs.repartitionByRange(parts, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // reused twice; ContextCleaner reclaims it, unlike cache()
    val psums = parted.groupBy("pid").agg(sum("len").as("psum")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = psums.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid + 1, acc + n) }
      .init.zip(psums).map { case ((_, base), (pid, _)) => (pid, base) }
    val basesDf = spark.createDataFrame(bases.toSeq).toDF("pid", "base")
    val w = Window.partitionBy("pid").orderBy("doc_id")
    parted.join(broadcast(basesDf), "pid")
      .withColumn("cum", sum("len").over(w))
      .withColumn("start", col("base") + col("cum") - col("len"))
      .withColumn("pack_id", expr(s"start div $window"))
      .withColumn("spans", expr(s"((start + len - 1) div $window) - (start div $window) + 1"))
      .select("doc_id", "len", "start", "pack_id", "spans")
  }

  /** Deterministic global shuffle: rank every row by md5(seed, doc_id) with
    * the same distributed prefix-sum shape as [[seqPack]] — range-partition
    * on the shuffle key, per-partition counts (a numPartitions-row driver
    * hop), broadcast cumulative bases, within-partition row_number + base.
    * No single-reducer global window; identical result for any partition
    * count. `shard` = (pos-1) % shards is the output file assignment. */
  def globalShuffle(docs: DataFrame, seed: String, parts: Int, shards: Int): DataFrame = {
    val spark = docs.sparkSession
    val keyed = docs.withColumn("skey",
      md5(concat(lit(seed + "-"), col("doc_id").cast("string"))))
    val parted = keyed.repartitionByRange(parts, col("skey"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // reused twice; ContextCleaner reclaims it, unlike cache()
    val counts = parted.groupBy("pid").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid + 1, acc + n) }
      .init.zip(counts).map { case ((_, base), (pid, _)) => (pid, base) }
    val basesDf = spark.createDataFrame(bases.toSeq).toDF("pid", "base")
    val w = Window.partitionBy("pid").orderBy("skey")
    parted.join(broadcast(basesDf), "pid")
      .withColumn("pos", col("base") + row_number().over(w).cast("long"))
      .withColumn("shard", (col("pos") - 1) % shards)
      .select("doc_id", "skey", "pos", "shard")
  }

  /** Stopword-profile language-ID heuristic. The honest classic approach
    * (n-gram/stopword profiles, argmax over languages, deterministic
    * tie-break); registered as a UDF because the profile lookup is genuinely
    * per-row imperative. */
  val langProfiles: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Set("der", "die", "das", "und", "ist", "ein"),
    "es" -> Set("el", "la", "de", "y", "en", "que"),
    "fr" -> Set("le", "la", "de", "et", "les", "un"),
    "zh" -> Set("的", "是", "了", "在", "和"))

  def langId(text: String): String = {
    if (text == null) return null
    val toks = text.split(' ')
    val scores = langProfiles.map { case (lang, words) =>
      (lang, toks.count(words.contains)) }
    scores.maxBy(_._2)._1 // Seq order breaks ties deterministically (en first)
  }

  def registerUdfs(spark: SparkSession): Unit =
    spark.udf.register("lang_id", (s: String) => langId(s))

  /** Expression form of [[langId]]: per-profile stopword hit count, argmax
    * with Seq-order tie-break (a chain of >= comparisons picks the first
    * maximum, exactly like maxBy). Requires a `toks` column. */
  def langIdCol: Column = {
    val scores = langProfiles.map { case (lang, words) =>
      val profile = array(words.toSeq.sorted.map(lit): _*)
      lang -> size(filter(col("toks"), x => array_contains(profile, x)))
    }
    val cases = scores.zipWithIndex.init.map { case ((lang, s), i) =>
      val rest = scores.drop(i + 1).map(_._2)
      (rest.map(s >= _).reduce(_ && _), lit(lang))
    }
    cases.foldRight(lit(scores.last._1): Column) { case ((cond, v), acc) =>
      when(cond, v).otherwise(acc)
    }
  }

  /** DuckDB replica of [[langIdCol]], generated from the same profiles. */
  def langIdOracleSql: String = {
    val scoreSel = langProfiles.map { case (lang, words) =>
      val arr = words.toSeq.sorted.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($arr, x))) AS s_$lang"
    }.mkString(",\n          ")
    val langs = langProfiles.map(_._1)
    val cases = langs.zipWithIndex.init.map { case (lang, i) =>
      val rest = langs.drop(i + 1).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN $rest THEN '$lang'"
    }.mkString(" ")
    s"""
      WITH d AS (SELECT doc_id, lang, string_split(text, chr(32)) AS toks FROM documents),
      s AS (SELECT doc_id, lang,
          $scoreSel
        FROM d),
      p AS (SELECT doc_id, lang,
          CASE $cases ELSE '${langs.last}' END AS predicted
        FROM s)
      SELECT doc_id, lang, predicted, lang = predicted AS agrees
      FROM p ORDER BY doc_id"""
  }

  val defs: Seq[Q] = Seq(

    // fixed-size token chunking with stride (the window every training
    // pipeline cuts documents into): chunk starts are a scan-side sequence
    // explode, the slice/join is per-row — no shuffle at all
    Q("txt_chunking", Some("""
      WITH d AS (SELECT doc_id, string_split(text, chr(32)) AS toks FROM documents),
      starts AS (
        SELECT doc_id, toks, unnest(range(0, len(toks), 20)) AS start FROM d)
      SELECT doc_id, CAST(start / 20 AS BIGINT) AS chunk_idx,
        CAST(least(30, len(toks) - start) AS BIGINT) AS n_tokens,
        array_to_string(list_slice(toks, start + 1, start + 30), chr(32)) AS chunk
      FROM starts ORDER BY doc_id, chunk_idx""")) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0, size(toks) - 1, 20)")).as("start"))
        .select(col("doc_id"),
          (col("start") / 20).cast("long").as("chunk_idx"),
          least(lit(30), size(col("toks")) - col("start")).cast("long").as("n_tokens"),
          array_join(expr("slice(toks, start + 1, 30)"), " ").as("chunk"))
        .orderBy("doc_id", "chunk_idx")
    },

    // benchmark decontamination: count distinct probe 3-gram shingles (from
    // a held-out probe set, here docs 0-2) appearing in each corpus doc.
    // Probe set broadcasts; the corpus only shuffles (doc_id, shingle) hits.
    Q("txt_decontaminate", Some("""
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(0, len(toks)-2),
          i -> toks[i+1] || chr(32) || toks[i+2] || chr(32) || toks[i+3]))) AS sh
        FROM (SELECT doc_id, string_split(text, chr(32)) AS toks FROM documents) t
        WHERE len(toks) >= 3),
      probes AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 3)
      SELECT s.doc_id, CAST(count(DISTINCT s.sh) AS BIGINT) AS hits
      FROM sh s JOIN probes p USING (sh)
      WHERE s.doc_id >= 3
      GROUP BY s.doc_id ORDER BY doc_id""")) { (s, dir) =>
      val sh = t(s, dir, "documents")
        .withColumn("toks", tokens(col("text")))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(0, size(toks)-3), " +
            "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))")).as("sh"))
      val probes = sh.filter(col("doc_id") < 3).select("sh").distinct()
      sh.filter(col("doc_id") >= 3)
        .join(broadcast(probes), Seq("sh"))
        .groupBy("doc_id").agg(countDistinct(col("sh")).as("hits"))
        .orderBy("doc_id")
    },

    // Bloom-prefiltered decontamination: same contract (and oracle) as
    // txt_decontaminate, but the probe side reaches the corpus scan as a
    // broadcast Bloom BITSET, not a broadcast hash relation. At 100 TB the
    // benchmark probe set can be 1e9+ shingles — ~100 GB as a broadcast
    // join relation (a non-starter) but ~1-2 GB as a Bloom at 1% fpp. The
    // bitset prunes the corpus scan-side to candidate shingles; the exact
    // join then runs only on survivors (|candidates| ≈ |true hits| +
    // fpp x |corpus shingles|), so false positives CANNOT reach the
    // result — output is row-identical to the exact operator, which
    // PipelineSpec asserts. Sizing: expectedNumItems from a cheap probe
    // count (here a fixed bound; at scale, the probe store's row count).
    Q("txt_bloom_decontaminate", Some("""
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(0, len(toks)-2),
          i -> toks[i+1] || chr(32) || toks[i+2] || chr(32) || toks[i+3]))) AS sh
        FROM (SELECT doc_id, string_split(text, chr(32)) AS toks FROM documents) t
        WHERE len(toks) >= 3),
      probes AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 3)
      SELECT s.doc_id, CAST(count(DISTINCT s.sh) AS BIGINT) AS hits
      FROM sh s JOIN probes p USING (sh)
      WHERE s.doc_id >= 3
      GROUP BY s.doc_id ORDER BY doc_id""")) { (s, dir) =>
      val sh = t(s, dir, "documents")
        .withColumn("toks", tokens(col("text")))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(0, size(toks)-3), " +
            "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))")).as("sh"))
      val probes = sh.filter(col("doc_id") < 3).select("sh").distinct()
      // the bloom builds DISTRIBUTED (BloomFilterAggregate: map-side
      // combined partial sketches), lands on the driver once as bytes, and
      // probes scan-side through the codegen'd BloomFilterMightContain over
      // xxhash64 — the exact machinery Catalyst's injected runtime filters
      // use, no UDF, no driver-side item loop
      GraftExpressions.register(s)
      val bloomBytes = probes
        .agg(call_function("bloom_agg", col("sh"), lit(1L << 16)).as("bf"))
        .collect()(0).getAs[Array[Byte]]("bf")
      sh.filter(col("doc_id") >= 3)
        .filter(call_function("bloom_might_contain", lit(bloomBytes), col("sh")))
        .join(broadcast(probes), Seq("sh"))        // exact verify: kills FPs
        .groupBy("doc_id").agg(countDistinct(col("sh")).as("hits"))
        .orderBy("doc_id")
    },

    // unigram commonness score — the exact-arithmetic analog of unigram-LM
    // quality filtering: docs built of corpus-rare words (OCR noise, spam)
    // score low. Corpus counts broadcast back onto the token stream; the
    // score is an exact integer sum with one division at the end.
    Q("txt_commonness", Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, chr(32))) AS w FROM documents),
      vocab AS (
        SELECT w, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY w)
      SELECT t.doc_id,
        CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(v.cf) AS BIGINT) AS cf_sum,
        round(CAST(sum(v.cf) AS DOUBLE) / count(*), 6) AS commonness
      FROM tok t JOIN vocab v USING (w)
      GROUP BY t.doc_id ORDER BY t.doc_id""")) { (s, dir) =>
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      val vocab = tok.groupBy("w").agg(count(lit(1)).as("cf"))
      tok.join(broadcast(vocab), Seq("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("cf")).as("cf_sum"))
        .select(col("doc_id"), col("n_words"), col("cf_sum"),
          round(col("cf_sum").cast("double") / col("n_words"), 6).as("commonness"))
        .orderBy("doc_id")
    },

    // Gopher-style repetition/diversity signals: type-token ratio, most-
    // common-word fraction, mean word length. Explode + two hash aggregates
    // (the scale path: no per-doc quadratic higher-order funcs); exact
    // integer counts, one division per ratio at the end.
    Q("txt_repetition", Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      grp AS (
        SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY doc_id, w),
      per AS (
        SELECT doc_id,
          CAST(sum(cnt) AS BIGINT) AS n_words,
          CAST(count(*) AS BIGINT) AS n_distinct,
          CAST(max(cnt) AS BIGINT) AS top_cnt,
          CAST(sum(cnt * length(w)) AS BIGINT) AS n_letters
        FROM grp GROUP BY doc_id)
      SELECT doc_id, n_words, n_distinct, top_cnt,
        round(CAST(n_distinct AS DOUBLE) / n_words, 6) AS ttr,
        round(CAST(top_cnt AS DOUBLE) / n_words, 6) AS top_frac,
        round(CAST(n_letters AS DOUBLE) / n_words, 6) AS mean_wlen
      FROM per ORDER BY doc_id""")) { (s, dir) =>
      val grp = t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      grp.groupBy("doc_id").agg(
          sum(col("cnt")).as("n_words"),
          count(lit(1)).as("n_distinct"),
          max(col("cnt")).as("top_cnt"),
          sum(col("cnt") * length(col("w"))).as("n_letters"))
        .select(col("doc_id"), col("n_words"), col("n_distinct"), col("top_cnt"),
          round(col("n_distinct").cast("double") / col("n_words"), 6).as("ttr"),
          round(col("top_cnt").cast("double") / col("n_words"), 6).as("top_frac"),
          round(col("n_letters").cast("double") / col("n_words"), 6).as("mean_wlen"))
        .orderBy("doc_id")
    },

    Q("txt_token_count", Some("""
      SELECT doc_id, length(text) AS n_chars_actual,
        len(string_split(text, chr(32))) AS n_tokens,
        len(list_distinct(string_split(text, chr(32)))) AS n_unique
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).as("n_chars_actual"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          size(array_distinct(tokens(col("text")))).cast("long").as("n_unique"))
        .orderBy("doc_id")
    },

    // quality score: identical arithmetic on both sides (ratios of exact
    // ints -> single double ops in a fixed order)
    // fastText-shaped hashed linear classifier: token -> hashed feature id
    // (md5 16-bit prefix mod D) -> weight lookup -> summed doc score + bias.
    // Weights here are a deterministic synthetic table (w[i] = i % 7 - 3,
    // integer) so the gate is exact; a trained model swaps in a broadcast
    // weight array with the identical plumbing. Scale shape: pure scan-side
    // higher-order functions (split/filter/aggregate), whole-stage codegen,
    // ZERO shuffle — the classifier runs at scan speed on any corpus size.
    Q("txt_classifier_score", Some("""
      SELECT doc_id,
        CAST(1 + coalesce(list_sum(list_transform(
          list_filter(string_split(lower(text), ' '), t -> t <> ''),
          t -> (CAST('0x' || substr(md5(t), 1, 4) AS INT) % 256) % 7 - 3)), 0)
          AS BIGINT) AS score,
        CAST(1 + coalesce(list_sum(list_transform(
          list_filter(string_split(lower(text), ' '), t -> t <> ''),
          t -> (CAST('0x' || substr(md5(t), 1, 4) AS INT) % 256) % 7 - 3)), 0)
          AS BIGINT) > 0 AS keep
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("score", expr("""
          CAST(aggregate(
            filter(split(lower(text), ' '), t -> t != ''),
            1L,
            (acc, t) -> acc +
              (CAST(conv(substr(md5(t), 1, 4), 16, 10) AS INT) % 256) % 7 - 3
          ) AS BIGINT)"""))
        .select(col("doc_id"), col("score"), (col("score") > 0).as("keep"))
        .orderBy("doc_id")
    },

    Q("txt_quality_score", Some("""
      SELECT doc_id,
        CAST(len(list_filter(toks, x -> list_contains(['the','a'], x))) AS DOUBLE) / len(toks) AS stop_ratio,
        CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
        CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks) AS avg_word_len,
        round(0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
            + 0.3 * (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a'], x))) AS DOUBLE) / len(toks))
            + 0.3 * least((CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks)) / 8.0, 1.0), 6) AS quality
      FROM (SELECT doc_id, text, string_split(text, chr(32)) AS toks FROM documents) d
      ORDER BY doc_id""")) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      val stopArr = array(stopwords.map(lit): _*)
      val nTok = size(col("toks"))
      val stopRatio = size(filter(col("toks"), x => array_contains(stopArr, x)))
        .cast("double") / nTok
      val uniqRatio = size(array_distinct(col("toks"))).cast("double") / nTok
      val avgLen = (length(col("text")) - nTok + 1).cast("double") / nTok
      d.select(col("doc_id"),
          stopRatio.as("stop_ratio"), uniqRatio.as("uniq_ratio"),
          avgLen.as("avg_word_len"),
          round(lit(0.4) * uniqRatio + lit(0.3) * (lit(1.0) - stopRatio)
            + lit(0.3) * least(avgLen / 8.0, lit(1.0)), 6).as("quality"))
        .orderBy("doc_id")
    },

    // heuristic lang-ID: stopword-profile argmax with first-profile
    // tie-break, expressed as native array expressions (scan-side codegen —
    // at 100 TB this runs at parquet-scan speed, unlike the boxed UDF form
    // kept in registerUdfs for API parity). The oracle mirrors the same
    // profiles via list_filter; both sides are generated from langProfiles.
    Q("txt_lang_id", Some(langIdOracleSql)) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", tokens(col("text")))
        .withColumn("predicted", langIdCol)
        .select(col("doc_id"), col("lang"), col("predicted"),
          (col("lang") === col("predicted")).as("agrees"))
        .orderBy("doc_id")
    },

    Q("txt_fingerprint", Some("""
      SELECT doc_id, md5(text) AS fp,
             md5(substr(text, 1, 80)) AS fp_prefix80
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("fp"),
          md5(substring(col("text"), 1, 80)).as("fp_prefix80"))
        .orderBy("doc_id")
    },

    // corpus statistics: top-5 word bigrams per language (count desc,
    // bigram asc tie-break) — the explode/aggregate/window shape of corpus
    // frequency analysis; shuffles only (lang, bigram) keys
    Q("txt_top_bigrams", Some("""
      WITH bg AS (
        SELECT lang, unnest(list_transform(range(0, len(toks) - 1),
                 i -> toks[i+1] || chr(32) || toks[i+2])) AS bigram
        FROM (SELECT lang, string_split(text, chr(32)) AS toks FROM documents) t
        WHERE len(toks) >= 2),
      counted AS (
        SELECT lang, bigram, count(*) AS n FROM bg GROUP BY lang, bigram),
      ranked AS (
        SELECT lang, bigram, n,
          row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
        FROM counted)
      SELECT lang, bigram, n, CAST(rk AS INT) AS rk
      FROM ranked WHERE rk <= 5 ORDER BY lang, rk""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val bg = t(s, dir, "documents")
        .withColumn("toks", tokens(col("text")))
        .filter(size(col("toks")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i+1]))"))
          .as("bigram"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
      bg.groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy("lang", "rk")
    },

    // character-trigram profiles per language (what statistical lang-ID
    // actually trains on): explode char 3-grams scan-side, one hash
    // aggregate, top-5 per language window
    Q("txt_char_ngrams", Some("""
      WITH grams AS (
        SELECT lang, unnest(list_transform(range(1, length(text) - 1),
          i -> substr(text, CAST(i AS INT), 3))) AS gram
        FROM documents WHERE length(text) >= 3),
      counted AS (SELECT lang, gram, count(*) AS n FROM grams GROUP BY lang, gram),
      ranked AS (SELECT lang, gram, n,
          row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS rk
        FROM counted)
      SELECT lang, gram, n, CAST(rk AS INT) AS rk
      FROM ranked WHERE rk <= 5 ORDER BY lang, rk""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val grams = t(s, dir, "documents")
        .filter(length(col("text")) >= 3)
        .select(col("lang"), explode(expr(
          "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
          .as("gram"))
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("gram"))
      grams.groupBy("lang", "gram").agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy("lang", "rk")
    },

    // end-to-end corpus curation: quality gate -> prefix-fingerprint dedup
    // (keep lowest doc_id) -> language filter -> per-source corpus stats.
    // The composition a training-data pipeline actually runs; every stage is
    // scan-side or a hash-groupBy, so the whole thing is two shuffles.
    Q("txt_corpus_curation", Some("""
      WITH scored AS (
        SELECT doc_id, lang, source, text,
          CAST(len(list_distinct(string_split(text, chr(32)))) AS DOUBLE)
            / len(string_split(text, chr(32))) AS uniq_ratio,
          len(string_split(text, chr(32))) AS n_tok
        FROM documents),
      deduped AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(substr(text, 1, 80))),
      kept AS (
        SELECT s.* FROM scored s JOIN deduped d ON s.doc_id = d.doc_id
        WHERE s.uniq_ratio >= 0.3 AND s.lang IN ('en', 'fr'))
      SELECT source, lang, count(*) AS n_docs,
        CAST(sum(CAST(n_tok AS BIGINT)) AS BIGINT) AS total_tokens,
        CAST(sum(CAST(n_tok AS BIGINT)) AS DOUBLE) / count(*) AS avg_tokens
      FROM kept GROUP BY source, lang
      ORDER BY source, lang""")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val scored = docs.select(col("doc_id"), col("lang"), col("source"),
        (size(array_distinct(tokens(col("text")))).cast("double")
          / size(tokens(col("text")))).as("uniq_ratio"),
        size(tokens(col("text"))).as("n_tok"))
      val deduped = docs
        .groupBy(md5(substring(col("text"), 1, 80)))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      scored.join(deduped, Seq("doc_id"))
        .filter(col("uniq_ratio") >= 0.3 && col("lang").isin("en", "fr"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("total_tokens"),
          (sum(col("n_tok").cast("long")).cast("double") / count(lit(1))).as("avg_tokens"))
        .orderBy("source", "lang")
    },

    // percentile-threshold quality gate: keep each language's top half by
    // quality score, rank-based (percent_rank needs no interpolation, so
    // there is no cross-engine float risk) — the "filter corpus to quality
    // >= per-language median" curation step. Aggregated quality uses exact
    // micros so the average is order-independent.
    Q("txt_quality_gate", Some("""
      WITH scored AS (
        SELECT doc_id, lang,
          CAST(round(round(0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
            + 0.3 * (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a'], x))) AS DOUBLE) / len(toks))
            + 0.3 * least((CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks)) / 8.0, 1.0), 6) * 1000000)
            AS BIGINT) AS q_micros
        FROM (SELECT doc_id, lang, text, string_split(text, chr(32)) AS toks FROM documents) d),
      ranked AS (
        SELECT doc_id, lang, q_micros,
          percent_rank() OVER (PARTITION BY lang ORDER BY q_micros, doc_id) AS pr
        FROM scored)
      SELECT lang, count(*) AS n_kept,
        round(CAST(sum(q_micros) AS DOUBLE) / count(*) / 1000000, 6) AS avg_quality
      FROM ranked WHERE pr >= 0.5
      GROUP BY lang ORDER BY lang""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"), tokens(col("text")).as("toks"))
      val stopArr = array(stopwords.map(lit): _*)
      val nTok = size(col("toks"))
      val stopRatio = size(filter(col("toks"), x => array_contains(stopArr, x)))
        .cast("double") / nTok
      val uniqRatio = size(array_distinct(col("toks"))).cast("double") / nTok
      val avgLen = (length(col("text")) - nTok + 1).cast("double") / nTok
      val quality = round(lit(0.4) * uniqRatio + lit(0.3) * (lit(1.0) - stopRatio)
        + lit(0.3) * least(avgLen / 8.0, lit(1.0)), 6)
      val scored = d.select(col("doc_id"), col("lang"),
        round(quality * 1000000).cast("long").as("q_micros"))
      val wq = Window.partitionBy("lang").orderBy(col("q_micros"), col("doc_id"))
      scored.withColumn("pr", percent_rank().over(wq))
        .filter(col("pr") >= 0.5)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          round(sum(col("q_micros")).cast("double") / count(lit(1)) / 1000000, 6).as("avg_quality"))
        .orderBy("lang")
    },

    // TF-IDF-style term salience: top-3 terms per document by
    // tf * (N/df), rank ties broken by term. The idf factor is the
    // RATIONAL form N/df rather than ln(N/df): both engines then compute
    // the score with two correctly-rounded IEEE ops (divide, multiply),
    // which hash-match exactly — libm log is not required to be
    // correctly rounded and can differ by 1 ulp across engines. Shape:
    // explode -> two hash aggregates (term df, doc tf) -> broadcast-join
    // df -> per-doc top-k window. At 100 TB the df side is a compact
    // term dictionary, broadcast or bucket-joined.
    Q("txt_tfidf", Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, chr(32))) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
          tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS score
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
      ranked AS (
        SELECT doc_id, term, tf, df, score,
          row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        FROM scored)
      SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        score, CAST(rk AS INT) AS rk
      FROM ranked WHERE rk <= 3 AND doc_id < 100
      ORDER BY doc_id, rk""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = toks.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val nDocs = t(s, dir, "documents").count()
      val scored = tf.join(broadcast(df), "term")
        .withColumn("score", col("tf") * (lit(nDocs.toDouble) / col("df")))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3 && col("doc_id") < 100)
        .select("doc_id", "term", "tf", "df", "score", "rk")
        .orderBy("doc_id", "rk")
    },

    // deterministic stratified sampling: per-language rates keyed on an
    // md5-derived uniform hash of the doc id — no RNG state, no shuffle,
    // reproducible on any engine/partitioning (the property that matters
    // when sampling a 100 TB corpus: the sample is a pure function of the
    // row, so re-runs and audits agree)
    Q("txt_sample_stratified", Some("""
      SELECT doc_id, lang,
        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) AS bucket
      FROM documents
      WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
          < CASE WHEN lang = 'en' THEN 19661 WHEN lang = 'zh' THEN 3277 ELSE 6554 END
      ORDER BY doc_id""")) { (s, dir) =>
      val bucket = expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT)")
      t(s, dir, "documents")
        .withColumn("bucket", bucket)
        .filter(col("bucket") < when(col("lang") === "en", 19661)
          .when(col("lang") === "zh", 3277).otherwise(6554))
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")
    },

    // codegen'd rolling-hash fingerprint (custom Catalyst Expression). The
    // DuckDB oracle folds the same codepoint sequence through HUGEINT
    // arithmetic mod 2^64 and maps back to signed i64 — bit-identical to the
    // wrapping-long loop in RollingHashUtil.
    Q("txt_fingerprint_rolling", Some("""
      WITH f AS (
        SELECT doc_id,
          list_reduce(list_prepend(0::HUGEINT,
            list_transform(string_split_regex(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
            (acc, c) -> (acc * 1000003 + c) % 18446744073709551616::HUGEINT) AS r,
          list_reduce(list_prepend(0::HUGEINT,
            list_transform(string_split_regex(substr(text, 1, 80), ''), c -> CAST(unicode(c) AS HUGEINT))),
            (acc, c) -> (acc * 1000003 + c) % 18446744073709551616::HUGEINT) AS rp
        FROM documents)
      SELECT doc_id,
        CAST(CASE WHEN r >= 9223372036854775808::HUGEINT
             THEN r - 18446744073709551616::HUGEINT ELSE r END AS BIGINT) AS fp64,
        CAST(CASE WHEN rp >= 9223372036854775808::HUGEINT
             THEN rp - 18446744073709551616::HUGEINT ELSE rp END AS BIGINT) AS fp64_prefix
      FROM f ORDER BY doc_id""")) { (s, dir) =>
      GraftExpressions.register(s)
      t(s, dir, "documents")
        .select(col("doc_id"), expr("rolling_hash(text)").as("fp64"),
          expr("rolling_hash(substring(text, 1, 80))").as("fp64_prefix"))
        .orderBy("doc_id")
    },

    // PII scrubbing: emails / IPv4s / phone numbers counted and redacted by
    // shared regexes. The synthetic corpus has no PII, so deterministic
    // fakes are appended first — the counts and the md5 of the scrubbed
    // text then prove the redaction logic, not just the plumbing. Pure
    // scan-side regex work: at 100 TB this runs at parquet-scan speed.
    Q("txt_pii_redact", Some(s"""
      WITH aug AS (SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR) ||
          '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
          '.7 call +1555' || CAST(1000000 + doc_id AS VARCHAR) AS t
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '$EMAIL_RE')) AS BIGINT) AS n_email,
        CAST(len(regexp_extract_all(t, '$IP_RE')) AS BIGINT) AS n_ip,
        CAST(len(regexp_extract_all(t, '$PHONE_RE')) AS BIGINT) AS n_phone,
        md5(regexp_replace(regexp_replace(regexp_replace(t,
          '$EMAIL_RE', '<EMAIL>', 'g'), '$IP_RE', '<IP>', 'g'),
          '$PHONE_RE', '<PHONE>', 'g')) AS redacted_md5
      FROM aug ORDER BY doc_id""")) { (s, dir) =>
      val aug = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7 call +1555"),
        (col("doc_id") + 1000000).cast("string"))
      t(s, dir, "documents")
        .withColumn("t", aug)
        .select(col("doc_id"),
          regexp_count(col("t"), lit(EMAIL_RE)).cast("long").as("n_email"),
          regexp_count(col("t"), lit(IP_RE)).cast("long").as("n_ip"),
          regexp_count(col("t"), lit(PHONE_RE)).cast("long").as("n_phone"),
          md5(regexp_replace(regexp_replace(regexp_replace(col("t"),
            EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"), PHONE_RE, "<PHONE>"))
            .as("redacted_md5"))
        .orderBy("doc_id")
    },

    // Gopher-style quality rules (word count, mean word length, fraction of
    // all-alpha words, stopword fraction -> one pass/fail gate). All
    // features are per-row array folds — scan-side, no shuffle.
    Q("txt_gopher_rules", Some("""
      WITH d AS (SELECT doc_id, string_split(text, chr(32)) AS toks FROM documents),
      f AS (SELECT doc_id,
          len(toks) AS n_words,
          round(CAST(list_sum(list_transform(toks, w -> len(w))) AS DOUBLE)
            / len(toks), 4) AS mean_word_len,
          round(CAST(len(list_filter(toks, w ->
            regexp_full_match(w, '[A-Za-z]+'))) AS DOUBLE) / len(toks), 4) AS alpha_frac,
          round(CAST(len(list_filter(toks, w ->
            list_contains(['the', 'a', 'of', 'and', 'to'], w))) AS DOUBLE)
            / len(toks), 4) AS stop_frac
        FROM d)
      SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
        alpha_frac, stop_frac,
        n_words >= 20 AND n_words <= 100000 AND mean_word_len >= 2
          AND mean_word_len <= 12 AND alpha_frac >= 0.8
          AND stop_frac >= 0.01 AS gopher_pass
      FROM f ORDER BY doc_id""")) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_words"),
          round(expr("CAST(aggregate(transform(toks, w -> length(w)), 0L, (a, x) -> a + x) AS DOUBLE)")
            / size(col("toks")), 4).as("mean_word_len"),
          round(expr("CAST(size(filter(toks, w -> w RLIKE '^[A-Za-z]+$')) AS DOUBLE)")
            / size(col("toks")), 4).as("alpha_frac"),
          round(expr("CAST(size(filter(toks, w -> array_contains(array('the', 'a', 'of', 'and', 'to'), w))) AS DOUBLE)")
            / size(col("toks")), 4).as("stop_frac"))
        .withColumn("gopher_pass",
          col("n_words").between(20, 100000) && col("mean_word_len").between(2, 12)
            && col("alpha_frac") >= 0.8 && col("stop_frac") >= 0.01)
        .orderBy("doc_id")
    },

    // bigram language-model score (the CCNet-style perplexity proxy): the
    // corpus trains add-one-smoothed bigram probabilities, every doc is
    // scored by its mean log-likelihood. Counts aggregate map-side; the
    // model (bigram + unigram counts) joins back broadcast-small — at
    // 100 TB the model tables stay tiny relative to the corpus, exactly
    // the shape of a real KenLM-filter stage.
    // DSIR-style importance resampling score (Xie et al. 2023: select
    // pretraining data whose hashed-unigram distribution matches a target
    // domain): per-doc avg log-ratio of add-one-smoothed unigram
    // likelihoods under the TARGET ('en' docs) vs the SOURCE (whole
    // corpus) distributions; selected = positive score. Scale shape: one
    // (word) shuffle for each distribution, both dictionaries broadcast
    // back — identical to the txt_lm_score plan, corpus-size-independent
    // driver state.
    Q("txt_dsir", Some("""
      WITH toks AS (SELECT doc_id, lang, string_split(text, chr(32)) AS w FROM documents),
      uni AS (SELECT doc_id, lang, unnest(w) AS u FROM toks),
      tgt AS (SELECT u, count(*) AS ct FROM uni WHERE lang = 'en' GROUP BY u),
      src AS (SELECT u, count(*) AS cs FROM uni GROUP BY u),
      tot AS (SELECT (SELECT count(*) FROM uni WHERE lang = 'en') AS t_tot,
                     (SELECT count(*) FROM uni) AS s_tot,
                     (SELECT count(DISTINCT u) FROM uni) AS vocab),
      scored AS (
        SELECT d.doc_id,
          ln(CAST(coalesce(tgt.ct, 0) + 1 AS DOUBLE) / (tot.t_tot + tot.vocab))
          - ln(CAST(src.cs + 1 AS DOUBLE) / (tot.s_tot + tot.vocab)) AS lr
        FROM uni d LEFT JOIN tgt ON tgt.u = d.u JOIN src ON src.u = d.u, tot)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        round(avg(lr), 4) + 0 AS dsir_score,
        (round(avg(lr), 4) > 0) AS selected
      FROM scored GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
      val uni = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("u"))
      val tgt = uni.filter(col("lang") === "en")
        .groupBy("u").agg(count(lit(1)).as("ct"))
      val src = uni.groupBy("u").agg(count(lit(1)).as("cs"))
      val tot = uni.agg(
        count(when(col("lang") === "en", 1)).as("t_tot"),
        count(lit(1)).as("s_tot"),
        countDistinct(col("u")).as("vocab"))
      uni.join(broadcast(tgt), Seq("u"), "left")
        .join(broadcast(src), Seq("u"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          (log((coalesce(col("ct"), lit(0)) + 1).cast("double") /
            (col("t_tot") + col("vocab"))) -
            log((col("cs") + 1).cast("double") /
              (col("s_tot") + col("vocab")))).as("lr"))
        .groupBy("doc_id")
        // `+ 0.0` normalizes IEEE -0.0 to +0.0 (and `+ 0` in the oracle SQL
        // does the same for DuckDB): a tiny-negative avg log-ratio rounds to
        // -0.0 in DuckDB but +0.0 via Spark's BigDecimal.setScale, and the
        // driver's comparator hashes bits, not values.
        .agg(count(lit(1)).as("n_words"),
          (round(avg(col("lr")), 4) + lit(0.0)).as("dsir_score"))
        .withColumn("selected", col("dsir_score") > 0)
        .orderBy("doc_id")
    },

    Q("txt_lm_score", Some("""
      WITH toks AS (SELECT doc_id, string_split(text, chr(32)) AS w FROM documents),
      bi AS (SELECT doc_id, w[CAST(i AS INT) + 1] AS w1, w[CAST(i AS INT) + 2] AS w2
             FROM (SELECT doc_id, w, unnest(range(0, len(w) - 1)) AS i FROM toks)),
      cb AS (SELECT w1, w2, count(*) AS cnt FROM bi GROUP BY w1, w2),
      cu AS (SELECT w1, count(*) AS tot FROM bi GROUP BY w1),
      v AS (SELECT count(DISTINCT x.u) AS vocab
            FROM (SELECT unnest(w) AS u FROM toks) x),
      scored AS (
        SELECT b.doc_id,
          ln(CAST(cb.cnt + 1 AS DOUBLE) / (cu.tot + v.vocab)) AS lp
        FROM bi b JOIN cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
                  JOIN cu ON cu.w1 = b.w1, v)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        round(avg(lp), 4) AS lm_score
      FROM scored GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val bi = toks.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))"))
        .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val cb = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      val cu = bi.groupBy("w1").agg(count(lit(1)).as("tot"))
      val v = toks.select(explode(col("w")).as("u"))
        .agg(countDistinct(col("u")).as("vocab"))
      bi.join(broadcast(cb), Seq("w1", "w2"))
        .join(broadcast(cu), Seq("w1"))
        .crossJoin(broadcast(v))
        .select(col("doc_id"),
          log((col("cnt") + 1).cast("double") / (col("tot") + col("vocab"))).as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 4).as("lm_score"))
        .orderBy("doc_id")
    },

    // domain (source) cap: keep at most K docs per source, chosen by a
    // deterministic md5 shuffle — the anti-over-representation mix step of
    // corpus curation. One shuffle on source; rank + filter.
    Q("txt_domain_cap", Some("""
      WITH r AS (SELECT doc_id, source,
          row_number() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
      SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
      FROM r WHERE rk <= 15 ORDER BY doc_id""")) { (s, dir) =>
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 15)
        .select("doc_id", "source", "rk")
        .orderBy("doc_id")
    },

    // sequence packing (concat-and-split into fixed 512-token contexts):
    // global token offsets via the distributed prefix sum in [[seqPack]];
    // the DuckDB oracle is the single-window cumsum formulation
    Q("txt_seq_pack", Some("""
      WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
                 FROM documents),
           c AS (SELECT doc_id, len,
                   CAST(sum(len) OVER (ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - len AS BIGINT) AS start
                 FROM d)
      SELECT doc_id, len, start,
        CAST(start // 512 AS BIGINT) AS pack_id,
        CAST((start + len - 1) // 512 - start // 512 + 1 AS BIGINT) AS spans
      FROM c ORDER BY doc_id""")) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      seqPack(docs, 512L, 8).orderBy("doc_id")
    },

    // temperature-flattened domain mixture (the training-mix reweighting
    // step: sample source s at rate ~ sqrt(n_s), so big domains are
    // down-weighted). All-integer thresholds — floor-sqrt per domain, one
    // tiny per-domain aggregate, md5 bucket accept — so Spark and DuckDB
    // agree bit-for-bit with no float summation-order hazard. One agg
    // shuffle on source + a broadcast join: scan-speed at 100 TB.
    Q("txt_domain_mix", Some("""
      WITH c AS (SELECT source, count(*) AS n,
                   CAST(floor(sqrt(count(*))) AS BIGINT) AS fsqrt
                 FROM documents GROUP BY source),
           s AS (SELECT sum(fsqrt) AS sq FROM c),
           r AS (SELECT source, CAST(least(65536, (65536 * 200 * fsqrt) // (sq * n))
                   AS BIGINT) AS thr
                 FROM c, s)
      SELECT d.doc_id, d.source, r.thr
      FROM documents d JOIN r USING (source)
      WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS INT) < r.thr
      ORDER BY d.doc_id""")) { (s, dir) =>
      val docs = t(s, dir, "documents").select("doc_id", "source")
      val counts = docs.groupBy("source")
        .agg(count(lit(1)).as("n"))
        .withColumn("fsqrt", floor(sqrt(col("n"))).cast("long"))
      val sq = counts.agg(sum("fsqrt")).first().getLong(0) // k domains -> 1 long
      val rates = counts.withColumn("thr",
        least(lit(65536L), expr(s"(65536L * 200 * fsqrt) div (${sq}L * n)")).cast("long"))
      docs.join(broadcast(rates.select("source", "thr")), "source")
        .filter(expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT)")
          < col("thr"))
        .select("doc_id", "source", "thr")
        .orderBy("doc_id")
    },

    // deterministic, salted train/val/test split (90/5/5): membership is a
    // pure function of (salt, doc_id), so any re-run — or any OTHER table
    // keyed by doc_id — reproduces the same assignment with zero state.
    // Scan-side expression, no shuffle: parquet-scan speed at 100 TB.
    Q("txt_train_split", Some("""
      WITH b AS (SELECT doc_id,
                   CAST('0x' || substr(md5('s1-' || CAST(doc_id AS VARCHAR)), 1, 4) AS INT) AS bucket
                 FROM documents)
      SELECT doc_id, bucket,
        CASE WHEN bucket < 58982 THEN 'train'
             WHEN bucket < 62259 THEN 'val' ELSE 'test' END AS split
      FROM b ORDER BY doc_id""")) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("bucket",
          expr("CAST(conv(substr(md5(concat('s1-', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS INT)"))
        .withColumn("split",
          when(col("bucket") < 58982, "train")
            .when(col("bucket") < 62259, "val").otherwise("test"))
        .select("doc_id", "bucket", "split")
        .orderBy("doc_id")
    },

    // deterministic global shuffle + shard assignment for training order:
    // sort key = md5(seed, doc_id); the global position is a distributed
    // rank (range-partition by key, per-partition counts -> prefix bases,
    // within-partition row_number + base), NOT a single-reducer window —
    // the same prefix-sum shape as seqPack, so a 100 TB shuffle costs one
    // range exchange + a numPartitions-row driver hop. shard = (pos-1) % 8
    // is the file a training job would write the doc into.
    Q("txt_global_shuffle", Some("""
      WITH k AS (SELECT doc_id, md5('s7-' || CAST(doc_id AS VARCHAR)) AS skey
                 FROM documents)
      SELECT doc_id, skey,
        CAST(row_number() OVER (ORDER BY skey) AS BIGINT) AS pos,
        CAST((row_number() OVER (ORDER BY skey) - 1) % 8 AS BIGINT) AS shard
      FROM k ORDER BY doc_id""")) { (s, dir) =>
      globalShuffle(t(s, dir, "documents").select("doc_id"), "s7", 8, 8)
        .orderBy("doc_id")
    },

    // one round of distributed BPE vocabulary induction: adjacent character
    // pair frequencies within whitespace tokens, top-20 by (count, pair).
    // The explode fans out to O(chars) rows but partial (map-side)
    // aggregation collapses them before the single shuffle on pair — the
    // canonical distributed-BPE counting step.
    Q("txt_bpe_pairs", Some("""
      WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
           lt AS (SELECT w FROM toks WHERE len(w) >= 2),
           pairs AS (SELECT substr(w, CAST(unnest(generate_series(1, len(w) - 1)) AS INT), 2) AS pair
                     FROM lt)
      SELECT pair, count(*) AS n FROM pairs
      GROUP BY pair ORDER BY n DESC, pair LIMIT 20""")) { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
        .select(expr("substr(w, i, 2)").as("pair"))
        .groupBy("pair")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    },

    // corpus heavy hitters: exact top-k terms by frequency, deterministic
    // tie-break on the term. One (term) shuffle with map-side combine —
    // this is the ORACLE formulation; topTermsSketch below is the
    // fixed-memory scale path pinned row-identical to it (PipelineSpec).
    Q("txt_heavy_hitters", Some("""
      WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
      SELECT term, count(*) AS n FROM w WHERE term <> ''
      GROUP BY term ORDER BY n DESC, term LIMIT 25""")) { (s, dir) =>
      topTermsExact(t(s, dir, "documents"), 25)
    }
  )

  /** Exact corpus top-k terms (the oracle formulation). */
  def topTermsExact(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(k)

  /** Heavy hitters via a count-min sketch — the 100 TB formulation. The
    * corpus aggregates into ONE mergeable fixed-size sketch (Spark's
    * CountMinSketch aggregate: d×w longs per partition, merged
    * associatively — no per-term shuffle keys at all); candidate terms
    * come from a deterministic md5 doc sample (a term with count ≥ N/k
    * appears in a 1/`sampleMod` doc sample with probability ≈ 1), and each
    * candidate's frequency is read from the broadcast sketch
    * executor-side. Memory is O(d·w + candidates), independent of the
    * corpus vocabulary — the regime where the exact groupBy's term shuffle
    * (billions of distinct keys) is the bottleneck. CMS overestimates only,
    * so the true top-k can never be displaced below rank k by noise; with
    * eps small enough for the data volume the ranking is exact
    * (PipelineSpec pins equality to [[topTermsExact]]). */
  def topTermsSketch(docs: DataFrame, k: Int, eps: Double = 0.00001,
      confidence: Double = 0.999, sampleMod: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
    val sketchBytes = words
      .select(expr(s"count_min_sketch(term, ${eps}d, ${confidence}d, 42)"))
      .head().getAs[Array[Byte]](0)
    val bc = spark.sparkContext.broadcast(sketchBytes)
    val candidates = docs
      .filter(expr(s"CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT) % $sampleMod = 0"))
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "").distinct()
    candidates.as[String].mapPartitions { it =>
      // one sketch deserialization per partition, probes are O(d) each
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bc.value))
      it.map(t => (t, cms.estimateCount(t)))
    }.toDF("term", "n")
      .orderBy(col("n").desc, col("term")).limit(k)
  }
}
