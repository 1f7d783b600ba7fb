package graft
import org.apache.spark.sql.SparkSession
object TmpProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    PgFunctions.register(spark)
    Seq(
      "SELECT regexp_replace('aXbXc', 'X', '-', 'g') AS r",
      "SELECT regexp_replace('aXbXc', 'x', '-', 'gi') AS r",
      "SELECT substring('abcdef' from 2 for 3) AS r",
      "SELECT substring('abcdef' from 2) AS r",
      "SELECT position('cd' in 'abcdef') AS r",
      "SELECT trim(both 'x' from 'xxabcxx') AS r",
      "SELECT trim(leading 'x' from 'xxabc') AS r",
      "SELECT extract(epoch from timestamp '2024-01-01 00:00:00') AS r",
      "SELECT extract(dow from date '2024-01-01') AS r",
      "SELECT date_part('hour', timestamp '2024-01-01 05:00:00') AS r",
      "SELECT 'abc' || null AS r",
      "SELECT left('abcdef', 3) AS r, right('abcdef', 2) AS r2, reverse('abc') AS r3",
      "SELECT initcap('hello world') AS r",
      "SELECT to_hex(255) AS r",
      "SELECT 5 % 3 AS r",
      "SELECT div(7, 2) AS r, mod(7, 2) AS r2",
      "SELECT ceil(4.3) AS r, ceiling(4.3) AS r2, trunc(4.7) AS r3, sign(-2) AS r4",
      "SELECT (date '2024-03-01' - date '2024-01-01') AS r",
      "SELECT date '2024-01-01' + 30 AS r",
      "SELECT now() IS NOT NULL AS r, current_timestamp IS NOT NULL AS r2",
      "SELECT timestamp '2024-01-01' + interval '1 day' AS r",
      "SELECT CASE WHEN 'abc' LIKE 'a%' ESCAPE '\\' THEN 1 ELSE 0 END AS r"
    ).foreach { q =>
      try {
        val out = spark.sql(PgDialect.translateSelect(q)).collect().mkString(",")
        println(q.take(60) + "  ==> " + out)
      } catch { case e: Throwable =>
        println(q.take(60) + "  ==> ERR " + e.getMessage.take(100).replace('\n',' ')) }
    }
    spark.stop()
  }
}
