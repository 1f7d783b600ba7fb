package graft

import org.apache.spark.sql.SparkSession

/** Postgres-compat scalar/aggregate function shims (SURVEY.md §2.C; reference:
  * /root/reference/src/server/query_remapper_function.go — ~40 DuckDB macros).
  * Re-expressed as Spark SQL temp functions / UDF registrations so Spark SQL
  * accepts the same call surface BemiDB exposes to clients.
  *
  * Filled in incrementally; `register` is idempotent per session.
  */
object PgFunctions {
  private val registered =
    java.util.Collections.newSetFromMap(new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = synchronized {
    if (registered.add(spark)) registerAll(spark)
  }

  private def registerAll(spark: SparkSession): Unit = {
    // version() analog: reference reports a fixed PG banner
    // (query_remapper_function.go:36). Named pg_version to avoid clashing
    // with Spark's built-in version().
    spark.udf.register("pg_version", () => "PostgreSQL 17.0, compiled by graft-spark")
  }
}
