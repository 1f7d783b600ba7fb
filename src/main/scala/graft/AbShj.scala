package graft

import org.apache.spark.sql.SparkSession

/** Dev A/B harness (guide §1): paired, interleaved measurement of ONE query
  * under two plan variants in a single JVM — variant A built with the
  * session defaults (SHUFFLE_HASH hint present when the size gate passes),
  * variant B built with `spark.graft.shjGateBytes=1` (hint absent, planner
  * falls back per the session's join prefs). Because `Tables.shj` reads the
  * gate at BUILD time, both plans coexist in one session: same primed
  * cache, same JIT, samples interleaved A,B,A,B so host drift hits both
  * sides equally. Reports sequential (min + median of interleaved samples)
  * and a T-thread self-concurrent wall per variant (the contention regime
  * the r13 driver-offload trades targeted).
  *
  * Usage: graft.AbShj [sfDir] [query] [threads] [roundsPerThread] [samples]
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_PARTS
  */
object AbShj {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q22_global_sales_opportunity"
    val threads = if (args.length > 2) args(2).toInt else 16
    val rounds = if (args.length > 3) args(3).toInt else 3
    val samples = if (args.length > 4) args(4).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ab-shj")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        Tables.ShjGateBytes.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS",
      Tables.volumeParts(sfDir).toString).toInt
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    spark.conf.set("spark.sql.adaptive.enabled", (parts > 1).toString)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", (parts > 1).toString)
    Tables.prime(spark, sfDir, parts)

    val dfA = SparkEntry.queries(name)(spark, sfDir) // gate open: hint on
    spark.conf.set("spark.graft.shjGateBytes", "1")
    val dfB = SparkEntry.queries(name)(spark, sfDir) // gate shut: hint off
    spark.conf.unset("spark.graft.shjGateBytes")
    def joinNodes(df: org.apache.spark.sql.DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      Seq("ShuffledHashJoin", "SortMergeJoin", "BroadcastHashJoin")
        .map(j => s"$j=${j.r.findAllIn(p).length}").mkString(",")
    }
    println(s"""{"q":"$name","variantA":"${joinNodes(dfA)}","variantB":"${joinNodes(dfB)}"}""")

    def save(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmup both variants x2 (JIT + codegen)
    Seq(dfA, dfB, dfA, dfB).foreach(save)

    def seqSample(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); save(df); (System.nanoTime() - t0) / 1e9
    }
    def concSample(df: org.apache.spark.sql.DataFrame): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (1 to threads).map { _ =>
        pool.submit(new Runnable { def run(): Unit = (1 to rounds).foreach(_ => save(df)) })
      }
      futs.foreach(_.get()); pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    // interleaved sequential samples
    val seqA = collection.mutable.ArrayBuffer.empty[Double]
    val seqB = collection.mutable.ArrayBuffer.empty[Double]
    (1 to samples).foreach { _ => seqA += seqSample(dfA); seqB += seqSample(dfB) }
    // interleaved concurrent samples (one untimed warmup each)
    concSample(dfA); concSample(dfB)
    val concA = collection.mutable.ArrayBuffer.empty[Double]
    val concB = collection.mutable.ArrayBuffer.empty[Double]
    (1 to samples).foreach { _ => concA += concSample(dfA); concB += concSample(dfB) }
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(f"""{"q":"$name","seqA_min":${seqA.min}%.3f,"seqB_min":${seqB.min}%.3f,""" +
      f""""seqA_med":${med(seqA.toSeq)}%.3f,"seqB_med":${med(seqB.toSeq)}%.3f,""" +
      f""""concA_min":${concA.min}%.3f,"concB_min":${concB.min}%.3f,""" +
      f""""concA_med":${med(concA.toSeq)}%.3f,"concB_med":${med(concB.toSeq)}%.3f,""" +
      f""""threads":$threads,"rounds":$rounds,"parts":$parts,""" +
      f""""seqA":${fmt(seqA.toSeq)},"seqB":${fmt(seqB.toSeq)},""" +
      f""""concA":${fmt(concA.toSeq)},"concB":${fmt(concB.toSeq)}}""")
    spark.stop()
  }
}
