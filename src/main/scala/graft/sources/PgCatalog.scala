package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** pg_catalog / information_schema emulation (SURVEY.md §2.B "Scan:
  * pg_catalog" row; reference builds these as static rowsets + views over the
  * DuckDB catalog in /root/reference/src/server/query_remapper_table.go:
  * 41-110,275-775 and pg_constants.go:27-144).
  *
  * Spark-first: static tables are literal DataFrames registered as temp
  * views at session boot; dynamic views (pg_class, pg_attribute,
  * information_schema_*) derive from `spark.catalog` metadata so they stay
  * in sync with whatever tables are registered — the same pattern the
  * reference uses against DuckDB's catalog, minus the shell-table dance
  * (Spark's catalog is already visible to SQL).
  *
  * Temp views cannot contain '.', so `information_schema.columns` surfaces
  * as `information_schema_columns`; the dialect front end rewrites the
  * qualified names (same trick the reference uses for pg_catalog prefixes).
  */
object PgCatalog {

  /** PG type OIDs for Spark types — mirrors the reference's DuckDB-type ->
    * OID switch (/root/reference/src/server/response_handler.go:28-113). */
  def pgTypeOf(dt: DataType): (Int, String) = dt match {
    case BooleanType => (16, "boolean")
    case ByteType | ShortType => (21, "smallint")
    case IntegerType => (23, "integer")
    case LongType => (20, "bigint")
    case FloatType => (700, "real")
    case DoubleType => (701, "double precision")
    case _: DecimalType => (1700, "numeric")
    case StringType => (25, "text")
    case BinaryType => (17, "bytea")
    case DateType => (1082, "date")
    case TimestampType => (1184, "timestamp with time zone")
    case TimestampNTZType => (1114, "timestamp without time zone")
    case _: ArrayType => (2277, "ARRAY")
    case _: DayTimeIntervalType | _: YearMonthIntervalType => (1186, "interval")
    case _ => (25, "text")
  }

  private val registered =
    java.util.Collections.newSetFromMap(new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = synchronized {
    if (registered.add(spark)) registerAll(spark)
  }

  private def registerAll(spark: SparkSession): Unit = {
    import spark.implicits._

    // static 1-row / small views (query_remapper_table.go:275-712)
    Seq((11L, "pg_catalog"), (2200L, "public"), (13000L, "information_schema"))
      .toDF("oid", "nspname").createOrReplaceTempView("pg_namespace")
    Seq((1L, "graft", true)).toDF("oid", "datname", "datallowconn")
      .createOrReplaceTempView("pg_database")
    Seq((10L, "graft", true, false)).toDF("oid", "rolname", "rolsuper", "rolreplication")
      .createOrReplaceTempView("pg_roles")
    Seq((10L, "graft")).toDF("usesysid", "usename").createOrReplaceTempView("pg_user")
    spark.emptyDataFrame.withColumn("oid", lit(0L)).withColumn("extname", lit(""))
      .limit(0).createOrReplaceTempView("pg_extension")
    SessionSettings.defaults.toSeq.sorted.toDF("name", "setting")
      .createOrReplaceTempView("pg_settings")
    // pg_get_keywords() rowset (reference delegates to duckdb_keywords(),
    // query_remapper_function.go:75-100); catcode R=reserved, U=unreserved
    Seq(("all", "R"), ("and", "R"), ("any", "R"), ("as", "R"), ("asc", "R"),
      ("between", "U"), ("by", "U"), ("case", "R"), ("cast", "R"),
      ("distinct", "R"), ("else", "R"), ("end", "R"), ("false", "R"),
      ("from", "R"), ("group", "R"), ("having", "R"), ("in", "R"),
      ("join", "U"), ("limit", "R"), ("not", "R"), ("null", "R"),
      ("on", "R"), ("or", "R"), ("order", "R"), ("select", "R"),
      ("table", "R"), ("then", "R"), ("true", "R"), ("union", "R"),
      ("where", "R"), ("window", "R"), ("with", "R"))
      .toDF("word", "catcode").createOrReplaceTempView("pg_keywords")

    // pg_type: the common subset of the reference's static ~150-row rowset
    // (pg_constants.go / query_remapper_table.go pg_type UNION ALL)
    Seq(
      (16L, "bool"), (17L, "bytea"), (18L, "char"), (19L, "name"),
      (20L, "int8"), (21L, "int2"), (23L, "int4"), (24L, "regproc"),
      (25L, "text"), (26L, "oid"), (28L, "xid"), (29L, "cid"),
      (114L, "json"), (142L, "xml"), (600L, "point"), (601L, "lseg"),
      (602L, "path"), (603L, "box"), (604L, "polygon"), (628L, "line"),
      (650L, "cidr"), (700L, "float4"), (701L, "float8"), (705L, "unknown"),
      (718L, "circle"), (790L, "money"), (829L, "macaddr"), (869L, "inet"),
      (1042L, "bpchar"), (1043L, "varchar"), (1082L, "date"), (1083L, "time"),
      (1114L, "timestamp"), (1184L, "timestamptz"), (1186L, "interval"),
      (1266L, "timetz"), (1560L, "bit"), (1562L, "varbit"), (1700L, "numeric"),
      (1790L, "refcursor"), (2205L, "regclass"), (2206L, "regtype"),
      (2249L, "record"), (2278L, "void"), (2950L, "uuid"), (3802L, "jsonb"),
      // array types (_elem), oids per PG's catalog
      (199L, "_json"), (1000L, "_bool"), (1001L, "_bytea"), (1002L, "_char"),
      (1005L, "_int2"), (1007L, "_int4"), (1009L, "_text"), (1014L, "_bpchar"),
      (1015L, "_varchar"), (1016L, "_int8"), (1021L, "_float4"),
      (1022L, "_float8"), (1115L, "_timestamp"), (1182L, "_date"),
      (1183L, "_time"), (1231L, "_numeric"), (1270L, "_timetz"),
      (2951L, "_uuid"), (3807L, "_jsonb"))
      .toDF("oid", "typname").createOrReplaceTempView("pg_type")

    // dynamic: pg_class / pg_attribute / information_schema over the
    // registered user tables (Tables.names is our "catalog")
    val cols: Seq[(String, String, Int, String, Int)] = Tables.names.flatMap { tbl =>
      val schema = Tables.df(spark, lastDir(spark), tbl).schema
      schema.fields.zipWithIndex.map { case (f, i) =>
        val (oid, pgName) = pgTypeOf(f.dataType)
        (tbl, f.name, i + 1, pgName, oid)
      }
    }
    val classDf = Tables.names.zipWithIndex
      .map { case (n, i) => (16384L + i, n, 2200L, "r") }
      .toDF("oid", "relname", "relnamespace", "relkind")
    classDf.createOrReplaceTempView("pg_class")
    val relOid = Tables.names.zipWithIndex.map { case (n, i) => n -> (16384L + i) }.toMap
    cols.map { case (t, c, i, dt, oid) => (relOid(t), c, i, oid.toLong, dt) }
      .toDF("attrelid", "attname", "attnum", "atttypid", "data_type")
      .createOrReplaceTempView("pg_attribute")

    // remaining static probes BI tools and ORMs issue (the reference ships
    // these as empty shells or 1-row views, query_remapper_table.go:275-712
    // + pg_constants.go PG_SYSTEM_TABLES/VIEWS)
    Tables.names.map(n => ("public", n, "graft", false))
      .toDF("schemaname", "tablename", "tableowner", "hasindexes")
      .createOrReplaceTempView("pg_tables")
    Seq.empty[(String, String, String)].toDF("schemaname", "viewname", "definition")
      .createOrReplaceTempView("pg_views")
    Seq.empty[(Long, String, Long)].toDF("oid", "proname", "pronamespace")
      .createOrReplaceTempView("pg_proc")
    Seq.empty[(Long, String, String, Long)].toDF("oid", "conname", "contype", "conrelid")
      .createOrReplaceTempView("pg_constraint")
    Seq.empty[(Long, Long, String)].toDF("objoid", "objsubid", "description")
      .createOrReplaceTempView("pg_description")
    Seq((10L, "graft")).toDF("usesysid", "usename").createOrReplaceTempView("pg_shadow")
    Seq((2L, "heap", "t")).toDF("oid", "amname", "amtype")
      .createOrReplaceTempView("pg_am")
    Seq.empty[(Long, Long, Int)].toDF("inhrelid", "inhparent", "inhseqno")
      .createOrReplaceTempView("pg_inherits")
    Seq((100L, "default", 11L)).toDF("oid", "collname", "collnamespace")
      .createOrReplaceTempView("pg_collation")

    // information_schema constraint views: empty shells (the synthetic
    // tables carry no declared constraints; ORMs still introspect them)
    Seq.empty[(String, String, String, String)]
      .toDF("constraint_name", "table_schema", "table_name", "constraint_type")
      .createOrReplaceTempView("information_schema_table_constraints")
    Seq.empty[(String, String, String, String, Int)]
      .toDF("constraint_name", "table_schema", "table_name", "column_name", "ordinal_position")
      .createOrReplaceTempView("information_schema_key_column_usage")
    Seq.empty[(String, String)]
      .toDF("constraint_name", "unique_constraint_name")
      .createOrReplaceTempView("information_schema_referential_constraints")

    // matview / stats / index emulation (query_remapper_table.go:136-250):
    // fresh sessions have no matviews or indexes; stat rows are faked per
    // table like the reference's pg_stat_user_tables handling
    Seq.empty[(String, String, String)].toDF("schemaname", "matviewname", "definition")
      .createOrReplaceTempView("pg_matviews")
    Tables.names.map(n => ("public", n, 0L))
      .toDF("schemaname", "relname", "n_live_tup")
      .createOrReplaceTempView("pg_stat_user_tables")
    Seq.empty[(Long, Long, Boolean)].toDF("indexrelid", "indrelid", "indisunique")
      .createOrReplaceTempView("pg_index")

    cols.map { case (t, c, i, dt, _) => ("graft", "public", t, c, i, dt) }
      .toDF("table_catalog", "table_schema", "table_name", "column_name",
        "ordinal_position", "data_type")
      .createOrReplaceTempView("information_schema_columns")
    Tables.names.map(n => ("graft", "public", n, "BASE TABLE"))
      .toDF("table_catalog", "table_schema", "table_name", "table_type")
      .createOrReplaceTempView("information_schema_tables")
  }

  // the sf dir last registered by Tables — used to introspect schemas
  @volatile private var dir: String = "/root/testdata/sf0.001"
  def noteDir(d: String): Unit = dir = d
  private def lastDir(spark: SparkSession): String = dir

  /** Catalog refresh trigger (query_remapper_table.go:46-62,136-250): a
    * statement touching pg_class / pg_matviews / pg_stat_user_tables sees
    * the CURRENT table + matview population, so psql \dm and BI refresh
    * panes pick up DDL done in this session. */
  def refreshDynamic(spark: SparkSession, store: Store): Unit = synchronized {
    import spark.implicits._
    val mvs = store.matviewNames
    mvs.map(n => ("public", n, store.matviewDefinition(n).getOrElse("")))
      .toDF("schemaname", "matviewname", "definition")
      .createOrReplaceTempView("pg_matviews")
    (Tables.names.map(n => ("public", n, 0L)) ++ mvs.map(n => ("public", n, 0L)))
      .toDF("schemaname", "relname", "n_live_tup")
      .createOrReplaceTempView("pg_stat_user_tables")
    (Tables.names.zipWithIndex.map { case (n, i) => (16384L + i, n, 2200L, "r") } ++
        mvs.zipWithIndex.map { case (n, i) => (20000L + i, n, 2200L, "m") })
      .toDF("oid", "relname", "relnamespace", "relkind")
      .createOrReplaceTempView("pg_class")
  }
}
