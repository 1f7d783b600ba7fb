package graft

import scala.jdk.CollectionConverters._

/** Locks in the reference golden-corpus replay (see [[CompatAudit]]): every
  * one of the 271 extracted queries must keep executing through the dialect
  * front end. Value/column parity is reported by the standalone audit main;
  * this spec guards the execution surface against translator regressions.
  */
class CompatSpec extends SparkSpecBase {

  test("the reference's golden corpus executes 271/271 through the dialect") {
    val store = new Store(spark,
      java.nio.file.Files.createTempDirectory("graft-compat").toString)
    SessionSettings.set("graft.strip_schemas", "public,postgres,main")
    PgFunctions.register(spark)
    GraftExpressions.register(spark)
    PgCatalog.register(spark)
    CompatAudit.buildTestTable(spark).createOrReplaceTempView("test_table")
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
      .createOrReplaceTempView("test_empty_table")

    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val queries = om.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/golden_queries.json")))
      .elements.asScala.map(_.asText).toSeq
    assert(queries.size == 271)
    val failures = queries.flatMap { q =>
      try {
        PgDialect.executeAll(spark, store, q).foreach {
          case PgDialect.Rows(df, _) => df.collect()
          case _ =>
        }
        None
      } catch {
        case e: Throwable =>
          Some(q.take(120) + " => " + Option(e.getMessage).getOrElse("").take(120))
      }
    }
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }
}
