package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B harness for the r14 driver-cost experiments (r13 VERDICT asks
  * #6/#8). Same paired, interleaved, one-JVM method as [[AbShj]]:
  * variant A = the committed query, variant B = the candidate reshape.
  *
  *  - q11: threshold from a DIRECT global sum over lineitem (1 group, no
  *    hash table, no exchange) instead of re-running the per-partkey
  *    aggregate and summing it — measurement at parts=6 shows AQE does NOT
  *    reuse the twin pv stages, so the re-aggregate is a real second
  *    200k-key hash pass. Exact-integer sums are associative, so the two
  *    thresholds are bit-identical (the DuckDB oracle already computes it
  *    this way).
  *  - q14/q17: the part dimension joined via in-task SHUFFLE_HASH build
  *    instead of a driver-built broadcast (per-execution driver offload;
  *    the question is what it costs at parts>1 where it adds exchanges).
  *
  * Usage: graft.AbDriver [sfDir] [exp] [threads] [rounds] [samples]
  */
object AbDriver {
  import Qdsl._
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val exp = if (args.length > 1) args(1) else "q11"
    val threads = if (args.length > 2) args(2).toInt else 16
    val rounds = if (args.length > 3) args(3).toInt else 3
    val samples = if (args.length > 4) args(4).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ab-driver")
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
    def t(n: String) = Tables.df(spark, sfDir, n)
    def bdim(n: String)(f: DataFrame => DataFrame) = Tables.bdim(spark, sfDir, n)(f)

    val (nameA, dfA, dfB): (String, DataFrame, DataFrame) = exp match {
      case "q11" =>
        val a = SparkEntry.queries("q11_important_parts")(spark, sfDir)
        val pv = t("lineitem").groupBy("l_partkey").agg(sum(discProd).as("v4i"))
        val threshold = t("lineitem")
          .agg((sum(discProd).cast("double") * 0.001).as("thr"))
        val b = pv.join(broadcast(threshold))
          .filter(col("v4i").cast("double") > col("thr"))
          .select(col("l_partkey"), round(col("v4i").cast("double") / 1e4, 2).as("value"))
          .orderBy(col("value").desc, col("l_partkey"))
        ("q11_important_parts", a, b)
      case "q14" =>
        val a = SparkEntry.queries("q14_promo_revenue")(spark, sfDir)
        val b = t("lineitem")
          .filter(col("l_shipdate") >= ts("1996-03-01") && col("l_shipdate") < ts("1996-04-01"))
          .join(t("part").hint("shuffle_hash"), col("l_partkey") === col("p_partkey"))
          .agg(((msum(when(col("p_type") === "PROMO", discProd).otherwise(0L), 1e4) * 100.0)
            / msum(discProd, 1e4)).as("promo_revenue"))
        ("q14_promo_revenue", a, b)
      case "q17" =>
        val a = SparkEntry.queries("q17_small_quantity_revenue")(spark, sfDir)
        import org.apache.spark.sql.expressions.Window
        val brandLines = t("lineitem")
          .join(t("part").filter(col("p_brand") === "Brand#3").select("p_partkey")
              .hint("shuffle_hash"),
            col("p_partkey") === col("l_partkey"))
        val b = brandLines
          .withColumn("qty_thr",
            lit(0.2) * avg(col("l_quantity")).over(Window.partitionBy("l_partkey")))
          .filter(col("l_quantity") < col("qty_thr"))
          .agg((msum(cents(col("l_extendedprice")), 1e2) / 7.0).as("avg_yearly"))
        ("q17_small_quantity_revenue", a, b)
      case "q04" =>
        val a = SparkEntry.queries("q04_order_priority")(spark, sfDir)
        val o = t("orders")
          .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01"))
          .hint("shuffle_hash")
        val latestShip = t("lineitem")
          .filter(col("l_shipdate") > ts("1997-01-01"))
          .groupBy(col("l_orderkey"))
          .agg(max(col("l_shipdate")).as("mx_ship"))
        val b = latestShip.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("mx_ship") > col("o_orderdate"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
        ("q04_order_priority", a, b)
      case "q05" =>
        val a = SparkEntry.queries("q05_local_supplier_volume")(spark, sfDir)
        val b = t("lineitem")
          .join(t("orders")
              .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
              .hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .join(bdim("customer")(identity), col("o_custkey") === col("c_custkey"))
          .join(bdim("supplier")(identity),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(msum(discProd, 1e4).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
        ("q05_local_supplier_volume", a, b)
      case "q10" =>
        val a = SparkEntry.queries("q10_returned_items")(spark, sfDir)
        val b = t("lineitem").filter(col("l_returnflag") === "R")
          .join(t("orders")
              .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01"))
              .hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .join(bdim("customer")(identity), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(msum(discProd, 1e4).as("revenue"))
          .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
        ("q10_returned_items", a, b)
      case "q20" =>
        val a = SparkEntry.queries("q20_potential_promotion")(spark, sfDir)
        val shippers = t("lineitem").filter(col("l_quantity") > 30)
          .join(bdim("part")(_.filter(col("p_name").like("%bolt%"))),
            col("p_partkey") === col("l_partkey"))
          .select("l_suppkey")
          .hint("shuffle_hash")
        val b = t("supplier")
          .join(broadcast(t("nation").filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_name", "s_acctbal")
          .orderBy("s_name")
        ("q20_potential_promotion", a, b)
      case other => sys.error(s"unknown experiment $other")
    }
    def joinNodes(df: DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      Seq("ShuffledHashJoin", "SortMergeJoin", "BroadcastHashJoin", "Exchange")
        .map(j => s"$j=${j.r.findAllIn(p).length}").mkString(",")
    }
    println(s"""{"exp":"$exp","q":"$nameA","variantA":"${joinNodes(dfA)}","variantB":"${joinNodes(dfB)}"}""")
    val a = dfA.collect().map(_.toString).toSeq
    val b = dfB.collect().map(_.toString).toSeq
    println(s"""{"rowsA":${a.length},"rowsB":${b.length},"identical":${a == b}}""")
    require(a == b, "variant B diverges")

    def save(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    Seq(dfA, dfB, dfA, dfB).foreach(save)
    def seqSample(df: DataFrame): Double = {
      val t0 = System.nanoTime(); save(df); (System.nanoTime() - t0) / 1e9
    }
    def concSample(df: DataFrame): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (1 to threads).map { _ =>
        pool.submit(new Runnable { def run(): Unit = (1 to rounds).foreach(_ => save(df)) })
      }
      futs.foreach(_.get()); pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    val seqA = collection.mutable.ArrayBuffer.empty[Double]
    val seqB = collection.mutable.ArrayBuffer.empty[Double]
    (1 to samples).foreach { _ => seqA += seqSample(dfA); seqB += seqSample(dfB) }
    concSample(dfA); concSample(dfB)
    val concA = collection.mutable.ArrayBuffer.empty[Double]
    val concB = collection.mutable.ArrayBuffer.empty[Double]
    (1 to samples).foreach { _ => concA += concSample(dfA); concB += concSample(dfB) }
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(f"""{"exp":"$exp","seqA_min":${seqA.min}%.3f,"seqB_min":${seqB.min}%.3f,""" +
      f""""seqA_med":${med(seqA.toSeq)}%.3f,"seqB_med":${med(seqB.toSeq)}%.3f,""" +
      f""""concA_min":${concA.min}%.3f,"concB_min":${concB.min}%.3f,""" +
      f""""concA_med":${med(concA.toSeq)}%.3f,"concB_med":${med(concB.toSeq)}%.3f,""" +
      f""""threads":$threads,"rounds":$rounds,"parts":$parts,""" +
      f""""seqA":${fmt(seqA.toSeq)},"seqB":${fmt(seqB.toSeq)},""" +
      f""""concA":${fmt(concA.toSeq)},"concB":${fmt(concB.toSeq)}}""")
    spark.stop()
  }
}
