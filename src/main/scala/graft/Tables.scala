package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-provided parquet tables (TESTDATA.md) and registers them
  * as temp views so queries can mix the DataFrame API and `spark.sql`.
  *
  * Scale note: at 100 TB these reads become Iceberg/parquet catalog tables
  * with partition pruning; the per-call `spark.read.parquet` here only reads
  * footers at planning time, so registration stays cheap at any scale, and
  * all filters/projections still push down to the scan (DataSource v1 parquet
  * relation with PushedFilters).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables a planner should broadcast in any join. */
  val broadcastable: Set[String] =
    Set("region", "nation", "supplier", "part", "customer")

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    primed.getOrElse((dir, name), load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet has shipped as TIMESTAMP(NANOS) (which Spark's parquet
    // reader rejects — read as long nanos) and as plain timestamp[us]
    // (surfacing as TIMESTAMP_NTZ). Normalize either to a session-tz
    // TimestampType so downstream Dataset[.. java.sql.Timestamp] encoders
    // and the UTC-pinned DuckDB oracle agree on the same micros.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventsTs(raw) else raw
  }

  /** Normalize an events-shaped frame's `ts` to session-tz TimestampType,
    * whatever the parquet writer emitted (long nanos under nanosAsLong, or
    * TIMESTAMP_NTZ from a plain timestamp[us] file). With the session tz
    * pinned to UTC the NTZ cast preserves the stored micros, matching the
    * DuckDB oracle's naive read of the same file. */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Partitioning keys for the hot-cache layout: fact tables hash-cluster on
    * their join key so joins and groupBys over that key reuse the cached
    * partitioning (Exchange elided). Cluster-scale analog: bucketed tables /
    * Iceberg hidden partitioning + storage-partitioned joins. */
  private val clusterKey: Map[String, String] = Map(
    "lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
    "customer" -> "c_custkey", "events" -> "user_id")

  @volatile private var primed: Map[(String, String), DataFrame] = Map.empty

  /** Pin all tables in the in-memory columnar cache, fact tables
    * repartitioned by join key (parallel cached scans; the driver data is
    * one parquet file per table = single-partition cold scans otherwise).
    * The long-running server calls this once at boot; queries then hit the
    * cache transparently via [[df]]. */
  def prime(spark: SparkSession, dir: String, parts: Int): Unit = synchronized {
    import org.apache.spark.storage.StorageLevel
    names.foreach { n =>
      val base = load(spark, dir, n)
      val laid = clusterKey.get(n) match {
        case Some(k) => base.repartition(parts, org.apache.spark.sql.functions.col(k))
        case None if broadcastable(n) => base.coalesce(1)
        case None => base.repartition(parts)
      }
      val cached = laid.persist(StorageLevel.MEMORY_ONLY)
      cached.count()
      primed += (dir, n) -> cached
    }
  }

  // Registration is idempotent and cheap, but skip re-registration for the
  // common case of many queries against the same sf dir in one session.
  @volatile private var registeredDir: String = ""

  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    if (registeredDir != dir) {
      PgDialect.catalogEpoch.incrementAndGet()
      names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
      PgFunctions.register(spark)
      GraftExpressions.register(spark)
      PgCatalog.noteDir(dir)
      PgCatalog.register(spark)
      registeredDir = dir
    }
  }

  /** Force the next registerAll to re-register (tests that publish store
    * tables shadowing a testdata view call this to restore it). */
  def invalidate(): Unit = synchronized { registeredDir = "" }
}
