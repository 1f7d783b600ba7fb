package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.concurrent.TrieMap

/** ANALYZE-produced planner statistics.
  *
  * The reference delegates statistics to its embedded engine (ANALYZE
  * reaches DuckDB as a maintenance no-op); here ANALYZE is a real
  * statistics pass because the Spark side has a consumer the reference
  * doesn't: explicit broadcast hints must be gated on a MEASURED input
  * size to stay safe under unbounded scale-up (a hard `broadcast()` on a
  * table that grows with the data is an executor-OOM at 100 TB). Results
  * feed (a) the pg_stats-shaped catalog view and (b)
  * [[Tables.broadcastSized]], which prefers analyzed stats over the
  * on-disk fallback.
  *
  * Scale shape: one aggregate job per ANALYZE — a single scan with
  * map-side partial aggregation computing every column's null count,
  * approximate NDV (HLL++, the same sketch class PG/Spark ANALYZE use;
  * never an exact count(DISTINCT) whose Expand multiplies the scan by the
  * column count), min/max for orderable atomics, and mean byte width.
  * The driver receives exactly one row regardless of table size.
  */
object TableStats {
  final case class ColStats(column: String, nullFrac: Double, nDistinct: Long,
      minVal: Option[String], maxVal: Option[String], avgWidth: Double)

  final case class Stats(rows: Long, cols: Seq[ColStats],
      measuredBytes: Option[Long] = None) {
    /** Mean row width in bytes (sum of column mean widths). */
    def rowWidth: Double = cols.map(_.avgWidth).sum
    /** Estimated uncompressed bytes of the whole table — the quantity a
      * broadcast would materialize per executor. Write-path size stats
      * (no column pass) carry a measured-bytes estimate directly. */
    def bytesEstimate: Long =
      measuredBytes.getOrElse((rows * rowWidth).toLong)
  }

  /** zstd-parquet → in-memory expansion estimate applied to on-disk bytes
    * when no column-width pass ran (measured 3-4x on the testdata). */
  val ParquetExpansion = 4L

  /** Write-path size publication: exact rows + on-disk bytes from the
    * just-committed snapshot's footers. Keeps any ANALYZE-produced column
    * stats (they go stale like PG's until the next ANALYZE), refreshes
    * the row count and the size the broadcast gate reads. */
  def noteWriteSize(name: String, rows: Long, diskBytes: Long,
      ns: String = StoreNs): Unit = {
    val inMem = Some(diskBytes * ParquetExpansion)
    registry.get((ns, name)) match {
      case Some(prev) =>
        registry((ns, name)) = prev.copy(rows = rows, measuredBytes = inMem)
      case None => registry((ns, name)) = Stats(rows, Nil, inMem)
    }
    ()
  }

  /** Namespace of store-managed tables; testdata parquet views use their
    * dir path as the namespace. The split exists because the gate consumer
    * resolves by (dir, name): an ANALYZE of a store/synced table that
    * happens to share a name with a testdata table ("customer") must not
    * feed that unrelated relation's size into the broadcast decision. */
  val StoreNs = "store"

  // keyed (namespace, relation name)
  private val registry = TrieMap[(String, String), Stats]()

  def get(name: String, ns: String = StoreNs): Option[Stats] =
    registry.get((ns, name))
  def put(name: String, s: Stats, ns: String = StoreNs): Unit =
    { registry((ns, name)) = s; () }
  def drop(name: String, ns: String = StoreNs): Unit =
    { registry.remove((ns, name)); () }
  def clear(): Unit = registry.clear()
  def analyzedTables: Seq[String] = registry.keys.map(_._2).toSeq.distinct.sorted

  private def orderableAtomic(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType |
        TimestampNTZType | BooleanType => true
    case _ => false
  }

  // NDV sketching needs a hashable type; atomic + array-of-atomic qualify
  private def sketchable(dt: DataType): Boolean = dt match {
    case ArrayType(e, _) => sketchable(e)
    case MapType(_, _, _) => false
    case _: StructType => false
    case _ => true
  }

  private def widthExpr(f: StructField): Column = f.dataType match {
    // variable-width: measured mean payload bytes (null-safe: avg skips
    // nulls; an all-null column falls back to the fixed default)
    case StringType => coalesce(avg(octet_length(col(s"`${f.name}`"))),
      lit(f.dataType.defaultSize.toDouble))
    case BinaryType => coalesce(avg(octet_length(col(s"`${f.name}`"))),
      lit(f.dataType.defaultSize.toDouble))
    case dt => lit(dt.defaultSize.toDouble)
  }

  /** Run the one-job statistics pass over `df`, register and return the
    * result. `onlyCols` restricts to ANALYZE t(col, …)'s column list. */
  def analyze(spark: SparkSession, name: String, df: DataFrame,
      onlyCols: Seq[String] = Nil, ns: String = StoreNs): Stats = {
    val fields = df.schema.fields.toSeq.filter(f =>
      onlyCols.isEmpty || onlyCols.exists(_.equalsIgnoreCase(f.name)))
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: fields.zipWithIndex.flatMap {
      case (f, i) =>
        val c = col(s"`${f.name}`")
        Seq(
          count(c).as(s"__nn_$i"),
          (if (sketchable(f.dataType)) approx_count_distinct(c)
           else lit(-1L)).as(s"__nd_$i"),
          (if (orderableAtomic(f.dataType)) min(c).cast("string")
           else lit(null).cast("string")).as(s"__mn_$i"),
          (if (orderableAtomic(f.dataType)) max(c).cast("string")
           else lit(null).cast("string")).as(s"__mx_$i"),
          widthExpr(f).as(s"__w_$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(row.fieldIndex("__n"))
    val cols = fields.zipWithIndex.map { case (f, i) =>
      val nonNull = row.getLong(row.fieldIndex(s"__nn_$i"))
      ColStats(
        column = f.name,
        nullFrac = if (n == 0) 0.0 else (n - nonNull).toDouble / n,
        nDistinct = row.getLong(row.fieldIndex(s"__nd_$i")),
        minVal = Option(row.get(row.fieldIndex(s"__mn_$i"))).map(_.toString),
        maxVal = Option(row.get(row.fieldIndex(s"__mx_$i"))).map(_.toString),
        avgWidth = row.getDouble(row.fieldIndex(s"__w_$i")))
    }
    // a full-table ANALYZE supersedes any write-path size estimate (the
    // column pass measures true in-memory width); a column-RESTRICTED
    // ANALYZE keeps it — partial widths would understate the table
    val keepMeasured =
      if (onlyCols.nonEmpty) registry.get((ns, name)).flatMap(_.measuredBytes)
      else None
    val stats = Stats(n, cols, keepMeasured)
    registry((ns, name)) = stats
    stats
  }

  /** The registry as pg_stats-shaped rows:
    * (schemaname, tablename, attname, null_frac, avg_width, n_distinct,
    * min_val, max_val) — PG's view plus the min/max PG hides inside
    * histogram_bounds; n_distinct -1 means "not computable for this type"
    * like PG's negative-ratio convention marks estimates. */
  def pgStatsRows: Seq[(String, String, String, Double, Double, Long,
      Option[String], Option[String])] =
    registry.toSeq
      // one row set per relation NAME (the view has no namespace column);
      // on a collision the store relation wins — it also shadows the
      // same-named testdata view in name resolution
      .groupBy(_._1._2).toSeq
      .map { case (_, entries) =>
        entries.find(_._1._1 == StoreNs).getOrElse(entries.head) }
      .sortBy(_._1._2)
      .flatMap { case ((_, t), s) =>
      // raw doubles, no decorative rounding: null_frac/avg_width are single
      // divisions of exact integer aggregates, so they reproduce
      // bit-identically from the same data in any engine (the oracle gate
      // recomputes them in DuckDB and hash-compares)
      s.cols.map(c => ("public", t, c.column, c.nullFrac, c.avgWidth,
        c.nDistinct, c.minVal, c.maxVal))
    }
}
