package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B harness for the q09 Bloom-filter pre-filter experiment
  * (r13 VERDICT ask #4; guide §3.2). Paired, interleaved, one JVM:
  *
  * A = committed q09: broadcast part-filter first (12.5% selective), then
  *     the orders join — planner broadcasts orders (150k-row HashedRelation
  *     built on the driver per execution; the 64m gate retires it at scale).
  * B = A plus a runtime Bloom filter: per execution, aggregate the
  *     part-filtered lineitem's orderkeys into bloom_filter_agg, broadcast
  *     the one-row filter, and drop non-matching orders BEFORE the join —
  *     the driver build shrinks to the ~matching fraction at the price of
  *     one extra pass over the part-filtered stream.
  *
  * Usage: graft.AbQ09 [sfDir] [threads] [rounds] [samples]
  */
object AbQ09 {
  import Qdsl._
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val threads = if (args.length > 1) args(1).toInt else 16
    val rounds = if (args.length > 2) args(2).toInt else 3
    val samples = if (args.length > 3) args(3).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ab-q09")
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
    def bdim(n: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      Tables.bdim(spark, sfDir, n)(f)

    val dfA = SparkEntry.queries("q09_product_profit")(spark, sfDir)

    // Variant B: Bloom-filter the orders side before its broadcast build
    val amount = discProd -
      cents(col("p_retailprice")) * col("l_quantity").cast("long") * lit(100L)
    val widgetLines = t("lineitem")
      .join(bdim("part")(_.filter(col("p_name").like("%widget%"))),
        col("p_partkey") === col("l_partkey"))
    // might_contain requires a constant or SCALAR SUBQUERY bloom (the same
    // shape SPARK-32268's automatic injection produces), so the pruned
    // orders side is expressed in SQL over the registered views: per
    // execution the subquery job aggregates the part-filtered orderkeys
    // into a bloom and the orders scan drops non-members before the join.
    val ordersPruned = spark.sql(
      """SELECT * FROM orders
         WHERE bloom_might_contain(
           (SELECT bloom_agg(l_orderkey, 100000L)
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%widget%'),
           o_orderkey)""")
    val dfB = widgetLines
      .join(bdim("supplier")(identity), col("s_suppkey") === col("l_suppkey"))
      .join(ordersPruned, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
        amount.as("amount"))
      .groupBy("nation", "o_year")
      .agg(msum(col("amount"), 1e4).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

    // equivalence check before timing (Bloom has no false negatives, so the
    // join result is unchanged; prove it anyway)
    val a = dfA.collect().map(_.toString).toSeq
    val b = dfB.collect().map(_.toString).toSeq
    println(s"""{"rowsA":${a.length},"rowsB":${b.length},"identical":${a == b}}""")
    require(a == b, "variant B diverges from committed q09")

    def save(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
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
    val seqA = collection.mutable.ArrayBuffer.empty[Double]
    val seqB = collection.mutable.ArrayBuffer.empty[Double]
    (1 to samples).foreach { _ => seqA += seqSample(dfA); seqB += seqSample(dfB) }
    concSample(dfA); concSample(dfB)
    val concA = collection.mutable.ArrayBuffer.empty[Double]
    val concB = collection.mutable.ArrayBuffer.empty[Double]
    (1 to samples).foreach { _ => concA += concSample(dfA); concB += concSample(dfB) }
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(f"""{"q":"q09_bloom_ab","seqA_min":${seqA.min}%.3f,"seqB_min":${seqB.min}%.3f,""" +
      f""""seqA_med":${med(seqA.toSeq)}%.3f,"seqB_med":${med(seqB.toSeq)}%.3f,""" +
      f""""concA_min":${concA.min}%.3f,"concB_min":${concB.min}%.3f,""" +
      f""""concA_med":${med(concA.toSeq)}%.3f,"concB_med":${med(concB.toSeq)}%.3f,""" +
      f""""threads":$threads,"rounds":$rounds,"parts":$parts,""" +
      f""""seqA":${fmt(seqA.toSeq)},"seqB":${fmt(seqB.toSeq)},""" +
      f""""concA":${fmt(concA.toSeq)},"concB":${fmt(concB.toSeq)}}""")
    spark.stop()
  }
}
