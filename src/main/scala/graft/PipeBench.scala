package graft

import org.apache.spark.sql.SparkSession

/** Dev-side timing sweep for the training-data pipeline operators (the
  * TPC-H sweep lives in [[Bench]], the driver contract). Times each named
  * query from SparkEntry.queries with a noop sink after one untimed warmup
  * and prints one JSON line — the numbers SCALE.md cites are produced here.
  *
  * Usage: graft.PipeBench [sfDir] [name ...]   (default: the headline ops)
  */
object PipeBench {
  private val DefaultOps = Seq(
    "dd_exact_dedup", "dd_minhash_lsh", "dd_simhash", "dd_ngram_jaccard",
    "dd_cluster_cc", "dd_embedding_lsh", "dd_semdedup", "dd_line_dedup",
    "dd_intra_doc", "sim_cosine_topk", "sim_ivf", "sim_ivfpq", "sim_kmeans_iter",
    "txt_token_count", "txt_lang_id", "txt_quality_score", "txt_gopher_rules",
    "txt_tfidf", "txt_decontaminate", "txt_bloom_decontaminate",
    "txt_global_shuffle", "txt_seq_pack", "mm_batch_infer")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else DefaultOps
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-pipebench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    def once(name: String): Double = {
      // construction INSIDE the timer: iterative ops (cluster_cc, kmeans)
      // execute their driver loop while the query function builds the plan
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val timed = names.map { n =>
      once(n) // warmup: JIT + codegen + footer reads
      n -> once(n)
    }
    val qs = timed.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"pipeline_ops","unit":"sec","sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}
