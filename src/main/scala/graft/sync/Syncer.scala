package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-sync layer (SURVEY §3.3; reference: the three syncers —
  * full-refresh Postgres, cursor-incremental Amplitude, full-refresh Attio).
  * Spark-first shape: a source exposes DataFrames; the Syncer writes them
  * through the Store's atomic-replace / cursor-append paths. Backpressure,
  * batching and parallel reads are Spark's job (the reference hand-rolls a
  * 32 MB capped buffer + goroutine; a partitioned DataFrame read subsumes
  * both).
  */
trait SyncSource {
  def listTables(): Seq[String]
  def read(table: String): DataFrame
  /** unique-key column, required for upsert/cursor sync (the reference
    * panics when absent — postgres.go:190-192; we surface an error). */
  def uniqueKey(table: String): Option[String]
  def cursorColumn(table: String): Option[String]
  /** Release any staging the last read() left behind (spool files etc.);
    * called by Syncer once the table is durably written. No-op by default. */
  def releaseStaging(): Unit = ()
}

/** Directory-of-parquet source (stands in for an external system in tests;
  * also the shape of a lake-to-lake sync). */
class ParquetDirSource(spark: SparkSession, dir: String,
    keys: Map[String, String] = Map.empty,
    cursors: Map[String, String] = Map.empty) extends SyncSource {
  def listTables(): Seq[String] =
    new java.io.File(dir).list().toSeq
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted
  def read(table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$table.parquet")
  }
  def uniqueKey(table: String): Option[String] = keys.get(table)
  def cursorColumn(table: String): Option[String] = cursors.get(table)
}

/** JDBC source (the Postgres-syncer analog). Reads are partitioned on the
  * unique key so a 1000-executor cluster pulls ranges in parallel;
  * `sessionInitStatement` pins the repeatable-read snapshot the reference
  * takes (postgres.go:203-223). Not exercised in-container (no external DB);
  * the Syncer is source-agnostic and tested through ParquetDirSource. */
class JdbcSource(spark: SparkSession, url: String, tables: Seq[String],
    keys: Map[String, String], cursors: Map[String, String] = Map.empty,
    numPartitions: Int = 16) extends SyncSource {
  def listTables(): Seq[String] = tables
  def read(table: String): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("sessionInitStatement",
        "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY")
    keys.get(table) match {
      case Some(k) =>
        // bounded partitioned read on the key column
        base.option("partitionColumn", k)
          .option("numPartitions", numPartitions)
          .option("lowerBound", "0")
          .option("upperBound", Long.MaxValue.toString)
          .load()
      case None => base.load()
    }
  }
  def uniqueKey(table: String): Option[String] = keys.get(table)
  def cursorColumn(table: String): Option[String] = cursors.get(table)
}

/** Orchestrates full-refresh and cursor-incremental syncs with
  * include/exclude filters (syncer_utils.go). */
class Syncer(store: Store, source: SyncSource,
    include: Seq[String] = Nil, exclude: Seq[String] = Nil) {

  def tables(): Seq[String] =
    source.listTables()
      .filter(t => include.isEmpty || include.contains(t))
      .filterNot(exclude.contains)

  /** Atomic replace of every selected table (the Postgres/Attio shape). */
  def fullRefresh(): Seq[String] = {
    val ts = tables()
    ts.foreach { t =>
      store.replace(t, source.read(t))
      source.releaseStaging() // table is durably written; spool can go
    }
    ts
  }

  /** Cursor-based append (the Amplitude shape): new rows at/after the stored
    * max(cursor), overlap deduplicated by unique key. First sync of a table
    * degenerates to full refresh. */
  def incrementalSync(table: String): Unit = {
    val cursor = source.cursorColumn(table).getOrElse(
      throw new IllegalArgumentException(s"no cursor column configured for $table"))
    val key = source.uniqueKey(table).getOrElse(
      throw new IllegalArgumentException(s"table $table has no unique key"))
    if (!store.exists(table)) store.replace(table, source.read(table))
    else store.cursorAppend(table, source.read(table), cursor, key)
    source.releaseStaging()
  }
}
