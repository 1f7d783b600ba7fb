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

  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    // rejects; read it as long nanos and surface a proper µs timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }

  // Registration is idempotent and cheap, but skip re-registration for the
  // common case of many queries against the same sf dir in one session.
  @volatile private var registeredDir: String = ""

  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    if (registeredDir != dir) {
      names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
      PgFunctions.register(spark)
      PgCatalog.noteDir(dir)
      PgCatalog.register(spark)
      registeredDir = dir
    }
  }
}
