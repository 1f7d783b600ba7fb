package graft
import org.apache.spark.sql.SparkSession
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq(
      "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS med FROM VALUES (1.0),(2.0),(10.0) t(v)",
      "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS med FROM VALUES (1.0),(2.0),(10.0) t(v)",
      "SELECT mode() WITHIN GROUP (ORDER BY v) AS m FROM VALUES (1),(2),(2) t(v)",
      "SELECT mode(v) AS m FROM VALUES (1),(2),(2) t(v)",
      "SELECT 'Abc' ILIKE 'a%' AS x",
      "SELECT 'Abc' NOT ILIKE 'a%' AS x",
      "SELECT v FROM VALUES (1) t(v) TABLESAMPLE (50 PERCENT)",
      "SELECT 'abc' SIMILAR TO 'a%' AS x",
      "SELECT age(timestamp '2024-03-01', timestamp '2024-01-15') AS a",
      "SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY v DESC) AS q FROM VALUES (1.0),(2.0),(10.0) t(v)",
      "SELECT g, percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS med FROM VALUES (1,1.0),(1,3.0),(2,5.0) t(g,v) GROUP BY g ORDER BY g"
    ).foreach { q =>
      try println(q + "  ==> " + spark.sql(q).collect().mkString(","))
      catch { case e: Throwable => println(q + "  ==> ERR " + e.getMessage.take(150).replace('\n',' ')) }
    }
    spark.stop()
  }
}
