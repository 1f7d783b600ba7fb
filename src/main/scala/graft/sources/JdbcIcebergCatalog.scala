package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's Iceberg catalog layout — a JDBC database holding one row
  * per table in `iceberg_tables(table_namespace, table_name,
  * metadata_location, columns)` plus `iceberg_materialized_views(
  * schema_name, table_name, definition)` (scripts/catalog.sql:1-16,
  * src/common/iceberg_catalog.go:17-43) — readable AND writable from this
  * engine, so a deployment migrating from the reference can mount its
  * existing catalog unchanged, and tables this engine publishes are visible
  * to any other `iceberg_tables` reader.
  *
  * Commit protocol: metadata_location advances via a compare-and-swap
  * UPDATE (`... WHERE metadata_location = <expected>`), the standard
  * Iceberg JDBC-catalog optimistic commit — two writers racing the same
  * table can't silently clobber each other; the loser sees 0 rows updated
  * and must re-read.
  *
  * Works against any JDBC database: `columns` maps to JSONB on Postgres and
  * the widest portable LOB type elsewhere (Derby in-container). Only
  * driver-level SQL is used — no vendor dialects beyond that one type.
  */
class JdbcIcebergCatalog(url: String, connProps: Map[String, String] = Map.empty) {

  /** The reference hides its in-flight sync/delete staging tables by name
    * suffix (iceberg_catalog.go:11-13); listings exclude them the same way. */
  private val TempSuffixes = Seq("-bemidb-syncing", "-bemidb-deleting")

  private[graft] def urlForTest: String = url

  private def withConnection[A](f: java.sql.Connection => A): A = {
    val props = new java.util.Properties()
    connProps.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** Create the catalog tables if absent (idempotent; mirrors
    * scripts/catalog.sql semantics on engines without IF NOT EXISTS). */
  def init(): Unit = withConnection { c =>
    def tryExec(sql: String): Unit = {
      val st = c.createStatement()
      try st.execute(sql)
      catch {
        case e: java.sql.SQLException
            // Derby X0Y32 / PG 42P07 duplicate-relation; message fallback
            // for drivers with other states
            if e.getSQLState == "X0Y32" || e.getSQLState == "42P07" ||
              Option(e.getMessage).exists(_.toLowerCase.contains("already exists")) => ()
      } finally st.close()
    }
    val jsonType = if (url.startsWith("jdbc:postgresql")) "JSONB" else "CLOB"
    val textType = if (url.startsWith("jdbc:postgresql")) "TEXT" else "CLOB"
    tryExec(s"""CREATE TABLE iceberg_tables (
      table_namespace VARCHAR(255) NOT NULL,
      table_name VARCHAR(255) NOT NULL,
      metadata_location VARCHAR(1000),
      columns $jsonType)""")
    tryExec("CREATE UNIQUE INDEX idx_tables ON iceberg_tables (table_namespace, table_name)")
    tryExec(s"""CREATE TABLE iceberg_materialized_views (
      schema_name VARCHAR(255) NOT NULL,
      table_name VARCHAR(255) NOT NULL,
      definition $textType NOT NULL)""")
    tryExec("CREATE UNIQUE INDEX idx_materialized_views ON iceberg_materialized_views (schema_name, table_name)")
  }

  /** All (namespace, table) rows, excluding in-flight staging tables —
    * the reference's SchemaTables() (iceberg_catalog.go:59-83). */
  def tables(): Seq[(String, String)] = withConnection { c =>
    val rs = c.createStatement().executeQuery(
      "SELECT table_namespace, table_name FROM iceberg_tables")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (rs.next()) buf += ((rs.getString(1), rs.getString(2)))
    buf.toSeq.filterNot { case (_, t) => TempSuffixes.exists(t.endsWith) }.sorted
  }

  def metadataLocation(namespace: String, table: String): Option[String] =
    withConnection { c =>
      val ps = c.prepareStatement("SELECT metadata_location FROM iceberg_tables " +
        "WHERE table_namespace = ? AND table_name = ?")
      ps.setString(1, namespace); ps.setString(2, table)
      val rs = ps.executeQuery()
      if (rs.next()) Option(rs.getString(1)) else None
    }

  /** Register a new table row (fails on duplicate via the unique index —
    * use [[commitLocation]] to advance an existing one). */
  def register(namespace: String, table: String, metadataLocation: String,
      columnsJson: Option[String] = None): Unit = withConnection { c =>
    val ps = c.prepareStatement("INSERT INTO iceberg_tables " +
      "(table_namespace, table_name, metadata_location, columns) VALUES (?, ?, ?, ?)")
    ps.setString(1, namespace); ps.setString(2, table)
    ps.setString(3, metadataLocation); ps.setString(4, columnsJson.orNull)
    ps.executeUpdate()
    ()
  }

  /** Optimistic commit: advance metadata_location from `expected` to
    * `newLocation` atomically. `expected = None` matches a NULL location
    * (a registered-but-empty table). Returns false when another writer got
    * there first — caller re-reads and retries or aborts. */
  def commitLocation(namespace: String, table: String, newLocation: String,
      expected: Option[String]): Boolean = withConnection { c =>
    val sql = expected match {
      case Some(_) => "UPDATE iceberg_tables SET metadata_location = ? " +
        "WHERE table_namespace = ? AND table_name = ? AND metadata_location = ?"
      case None => "UPDATE iceberg_tables SET metadata_location = ? " +
        "WHERE table_namespace = ? AND table_name = ? AND metadata_location IS NULL"
    }
    val ps = c.prepareStatement(sql)
    ps.setString(1, newLocation); ps.setString(2, namespace); ps.setString(3, table)
    expected.foreach(ps.setString(4, _))
    ps.executeUpdate() == 1
  }

  def dropTable(namespace: String, table: String): Unit = withConnection { c =>
    val ps = c.prepareStatement(
      "DELETE FROM iceberg_tables WHERE table_namespace = ? AND table_name = ?")
    ps.setString(1, namespace); ps.setString(2, table)
    ps.executeUpdate()
    ()
  }

  /** (schema, table, definition) rows — the reference's
    * MaterializedViews() (iceberg_catalog.go:85-112). */
  def materializedViews(): Seq[(String, String, String)] = withConnection { c =>
    val rs = c.createStatement().executeQuery(
      "SELECT schema_name, table_name, definition FROM iceberg_materialized_views")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    while (rs.next()) buf += ((rs.getString(1), rs.getString(2), rs.getString(3)))
    buf.toSeq.filterNot { case (_, t, _) => TempSuffixes.exists(t.endsWith) }.sorted
  }

  def createMaterializedView(schema: String, table: String, definition: String): Unit =
    withConnection { c =>
      val ps = c.prepareStatement("INSERT INTO iceberg_materialized_views " +
        "(schema_name, table_name, definition) VALUES (?, ?, ?)")
      ps.setString(1, schema); ps.setString(2, table); ps.setString(3, definition)
      ps.executeUpdate()
      ()
    }

  def dropMaterializedView(schema: String, table: String): Unit = withConnection { c =>
    val ps = c.prepareStatement("DELETE FROM iceberg_materialized_views " +
      "WHERE schema_name = ? AND table_name = ?")
    ps.setString(1, schema); ps.setString(2, table)
    ps.executeUpdate()
    ()
  }

  /** SQL-visible name for a catalog row: the default namespace maps to the
    * bare table name (the reference serves `public.t` as `t`), any other
    * namespace prefixes with `_` (Spark temp views can't be dot-qualified). */
  def viewName(namespace: String, table: String): String =
    if (namespace == "public") table else s"${namespace}_$table"

  /** Mount every catalog table (and then every materialized view, which may
    * reference them) as session temp views, each table read purely through
    * its metadata_location. Rows with a NULL location (registered, no
    * committed snapshot yet) are skipped. Returns the registered view
    * names. */
  def mount(spark: SparkSession): Seq[String] = {
    val tableViews = tables().flatMap { case (ns, t) =>
      metadataLocation(ns, t).map { loc =>
        val name = viewName(ns, t)
        Iceberg.readTableAt(spark, new org.apache.hadoop.fs.Path(loc))
          .createOrReplaceTempView(name)
        name
      }
    }
    val mvViews = materializedViews().map { case (schema, t, defn) =>
      val name = viewName(schema, t)
      spark.sql(defn).createOrReplaceTempView(name)
      name
    }
    tableViews ++ mvViews
  }

  /** One table's current snapshot as a DataFrame, straight from the
    * catalog pointer. */
  def readTable(spark: SparkSession, namespace: String, table: String): DataFrame = {
    val loc = metadataLocation(namespace, table).getOrElse(
      throw new IllegalArgumentException(s"no metadata_location for $namespace.$table"))
    Iceberg.readTableAt(spark, new org.apache.hadoop.fs.Path(loc))
  }
}
