package graft

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

import java.nio.file.{Files, Path, Paths}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Table store + materialized-view lifecycle (SURVEY §2.A matview rows,
  * §2.E write path; reference: /root/reference/src/server/query_remapper.go:
  * 146-169,566-711 + /root/reference/src/common/iceberg_writer.go:23-74).
  *
  * The reference swaps Iceberg tables through a `-syncing`/`-deleting`
  * rename dance; with a snapshot directory layout we get the same atomicity
  * by writing a new version directory and flipping an in-memory/on-disk
  * pointer (at cluster scale this is exactly an Iceberg `replace()` snapshot
  * commit — no Iceberg runtime ships in this container, so the layout is
  * parquet version dirs + a catalog map).
  *
  * Write-path semantics reproduced from the reference:
  *  - full refresh  = atomic replace (iceberg_table.go:46-70)
  *  - upsert        = per-key overwrite: old rows ∉ incoming keys ∪ incoming
  *                    (iceberg_table_writer.go:304-378)
  *  - delete by key = old rows ∉ keys (iceberg_table_writer.go:380-452)
  *  - cursor append = append rows with cursor >= max(cursor) of existing,
  *                    dropping overlap rows already present
  *                    (iceberg_table.go:93-117, syncer-amplitude/lib/syncer.go:43-72)
  */
class Store(spark: SparkSession, warehouse: String) {
  Files.createDirectories(Paths.get(warehouse))

  private val versions = TrieMap[String, Int]()
  private val matviewDefs = TrieMap[String, String]()

  // ---- catalog durability ------------------------------------------------
  // The reference keeps its catalog (table pointers + matview definitions)
  // in a PG JDBC database (iceberg_catalog.go); here the same durability is
  // a JSON sidecar in the warehouse root, rewritten atomically after every
  // mutation and reloaded on construction — a crashed or restarted process
  // sees every table and matview again.
  private val catalogFile = Paths.get(warehouse, "_catalog.json")

  private def persistCatalog(): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    val vs = root.putObject("versions")
    versions.toSeq.sortBy(_._1).foreach { case (k, v) => vs.put(k, v) }
    val mv = root.putObject("matviews")
    matviewDefs.toSeq.sortBy(_._1).foreach { case (k, d) => mv.put(k, d) }
    val tmp = Paths.get(warehouse, "._catalog.json.tmp")
    Files.write(tmp, om.writerWithDefaultPrettyPrinter.writeValueAsBytes(root))
    Files.move(tmp, catalogFile,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  if (Files.exists(catalogFile)) {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(Files.readAllBytes(catalogFile))
    root.get("versions").fields.asScala.foreach(e => versions(e.getKey) = e.getValue.asInt)
    root.get("matviews").fields.asScala.foreach(e => matviewDefs(e.getKey) = e.getValue.asText)
    // every catalog table (not just matviews) is SQL-resolvable, like the
    // reference's runtime shell tables (query_remapper_table.go:141-178)
    versions.keys.foreach(publish)
  }

  private def versionDir(name: String, v: Int): String = s"$warehouse/$name/v$v"

  def exists(name: String): Boolean = versions.contains(name)

  def read(name: String): DataFrame =
    spark.read.parquet(versionDir(name, versions(name)))

  def currentVersion(name: String): Int = versions(name)

  /** Snapshot (time-travel) read: every publish writes a NEW version dir
    * and old dirs stay immutable, so any prior version remains readable —
    * the Iceberg snapshot-read analog (iceberg snapshots keep data files
    * alive until expiry; here version dirs play that role). */
  def readVersion(name: String, v: Int): DataFrame = {
    require(Files.exists(Paths.get(versionDir(name, v))),
      s"table $name has no version $v")
    spark.read.parquet(versionDir(name, v))
  }

  /** Min/max-pruned range scan: parquet footer stats on `key` decide which
    * data files can contain [lo, hi] before Spark ever lists them — the
    * Iceberg manifest-pruning analog, same stats the upsert path uses.
    * Returns (filtered frame, files scanned, files total); at 100 TB the
    * win is skipping whole files, not just row groups. */
  def readRange(name: String, key: String, lo: Any, hi: Any): (DataFrame, Int, Int) = {
    val cur = Paths.get(versionDir(name, versions(name)))
    val stats = fileStats(cur, key)
    val lon = normKey(lo)
    val hin = normKey(hi)
    def overlaps(range: Option[(Any, Any)]): Boolean = range match {
      case None => true // no stats: must scan
      case Some((flo, fhi)) =>
        keyOrdering.compare(flo, hin) <= 0 && keyOrdering.compare(fhi, lon) >= 0
    }
    val hit =
      try stats.filter { case (_, r) => overlaps(r) }.map(_._1)
      catch { case _: ClassCastException => stats.map(_._1) }
    val base =
      if (hit.isEmpty) read(name).limit(0)
      else spark.read.parquet(hit.map(_.toString): _*)
    (base.filter(col(key) >= lit(lo) && col(key) <= lit(hi)), hit.length, stats.length)
  }

  /** Atomic replace: write v(n+1), then flip the pointer. */
  def replace(name: String, df: DataFrame): Unit = {
    val next = versions.getOrElse(name, 0) + 1
    df.write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(versionDir(name, next))
    versions(name) = next
    persistCatalog()
    publish(name)
  }

  /** Range-partitioned, sorted-within-partition replace: every output file
    * covers a tight, non-overlapping key range, which turns the footer
    * min/max pruning in [[readRange]] / upsert into near-perfect file
    * skipping (the Iceberg sort-order + manifest-stats combination). Use
    * for tables whose hot filter is a range on `key` — at 100 TB a point
    * or range query then touches O(range / file-span) files, not all. */
  def replaceSorted(name: String, df: DataFrame, key: String, numFiles: Int): Unit = {
    val next = versions.getOrElse(name, 0) + 1
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(versionDir(name, next))
    versions(name) = next
    persistCatalog()
    publish(name)
  }

  /** Z-order clustered replace: rows are laid out along a Morton curve over
    * `keys` (each key linearly scaled to 16-bit buckets from its min/max,
    * bits interleaved), range-partitioned and sorted by the interleaved
    * key. Every output file then covers a TIGHT range in every key
    * simultaneously, so footer/manifest min-max pruning works for range
    * predicates on ANY of the keys — the multi-column answer where a plain
    * sort only prunes its leading column (Iceberg/Delta expose the same
    * z-order clustering in their rewrite procedures). Cost: one extra
    * min/max aggregate (a 2-row driver hop) + the same range shuffle a
    * sorted write pays. */
  def replaceZOrdered(name: String, df: DataFrame, keys: Seq[String], numFiles: Int): Unit = {
    require(keys.size >= 2, "z-order needs at least two keys")
    val aggs = keys.flatMap(k =>
      Seq(min(col(k)).cast("double"), max(col(k)).cast("double")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val BITS = 16
    val scaled = keys.zipWithIndex.map { case (k, i) =>
      val lo = bounds.getDouble(2 * i)
      val hi = bounds.getDouble(2 * i + 1)
      val span = math.max(hi - lo, 1e-12)
      // bucket in [0, 2^BITS)
      least(lit((1 << BITS) - 1), greatest(lit(0),
        floor((col(k).cast("double") - lit(lo)) / lit(span) * lit(1 << BITS))))
        .cast("long")
    }
    // interleave: output bit (b * nKeys + j) = bit b of key j
    val n = keys.size
    val zkey = (0 until BITS).flatMap { b =>
      scaled.zipWithIndex.map { case (s, j) =>
        shiftleft(shiftright(s, b).bitwiseAND(lit(1L)), b * n + j)
      }
    }.reduce((a, c) => a.bitwiseOR(c))
    val next = versions.getOrElse(name, 0) + 1
    df.withColumn("__zkey", zkey)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(versionDir(name, next))
    versions(name) = next
    persistCatalog()
    publish(name)
  }

  /** Replace with hive-style partition directories on `partitionCols` —
    * scans with a partition-key predicate prune whole directories
    * (PartitionFilters in the physical plan). Cluster-scale analog of
    * Iceberg hidden partitioning; the reference leaves tables unpartitioned
    * (roadmap item), so this is a beyond-parity scale feature. */
  def replacePartitioned(name: String, df: DataFrame, partitionCols: String*): Unit = {
    val next = versions.getOrElse(name, 0) + 1
    df.write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .partitionBy(partitionCols: _*)
      .parquet(versionDir(name, next))
    versions(name) = next
    persistCatalog()
    publish(name)
  }

  /** Bucketed replace: pays one hash shuffle at write time to pin a fixed
    * bucket layout on `key`, so every later join or aggregation on `key`
    * between same-bucketed tables runs with ZERO exchanges — the 100 TB
    * pattern for fact tables that are repeatedly joined on the same key
    * (Iceberg bucket-transform partitioning / storage-partitioned joins are
    * the cluster-side equivalent). Registers in the session catalog because
    * bucket metadata lives there, not in the files. */
  def replaceBucketed(name: String, df: DataFrame, key: String, numBuckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    // clear any plain temp view published for this name (e.g. by a catalog
    // reload before the bucketed registration existed): the catalog table
    // must win resolution
    spark.catalog.dropTempView(name)
    val next = versions.getOrElse(name, 0) + 1
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .option("path", versionDir(name, next))
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(name)
    versions(name) = next
    persistCatalog()
  }

  def append(name: String, df: DataFrame): Unit =
    if (!exists(name)) replace(name, df)
    else replace(name, read(name).unionByName(df))

  /** Append with small-file compaction (iceberg_table_writer.go:231-302):
    * data files already at/above `maxFileBytes` are carried into the new
    * version untouched (a metadata-only move on an object store); the small
    * tail files are read back and rewritten TOGETHER with the incoming rows.
    * Steady-state incremental syncs therefore keep O(total/maxFileBytes)
    * files instead of one sliver per batch — at 100 TB this is the
    * difference between thousands and millions of manifest entries. */
  def appendCompacting(name: String, df: DataFrame, maxFileBytes: Long = 100L << 20): Unit = {
    if (!exists(name)) { replace(name, df); return }
    val cur = Paths.get(versionDir(name, versions(name)))
    val files = Files.list(cur).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    val (full, small) = files.partition(Files.size(_) >= maxFileBytes)
    val next = versions.getOrElse(name, 0) + 1
    val dir = Paths.get(versionDir(name, next))
    Files.createDirectories(dir)
    full.foreach(carryFile(_, dir))
    val tail =
      if (small.isEmpty) df
      else spark.read.schema(df.schema)
        .parquet(small.map(_.toString): _*).unionByName(df)
    // The compacted tail is sized to ~maxFileBytes output files, written by
    // that many parallel tasks — a coalesce(1) here would funnel the whole
    // tail + batch through one task (serial choke at the reference's 1 GB
    // batch cap). Catalyst plan stats give the incoming byte estimate; an
    // absurd estimate (stats unknown → 8 EiB default) falls back to one
    // target file's worth.
    val smallBytes = small.map(Files.size(_)).sum
    val incomingBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val targetBytes = math.max(maxFileBytes, 1L << 20)
    val est = smallBytes +
      (if (incomingBytes > BigInt(1L << 40)) targetBytes else incomingBytes.toLong)
    val nParts = math.max(1, math.ceil(est.toDouble / targetBytes).toInt)
    writeInto(tail.repartition(nParts), name, dir, s"compacted-$next")
    versions(name) = next
    persistCatalog()
    publish(name)
  }

  /** Carry a data file into a new version dir untouched: a hard link when
    * the filesystem allows it (the local analog of an object-store
    * metadata-only move / Iceberg manifest re-reference), copy otherwise. */
  private def carryFile(f: Path, dir: Path): Unit =
    try Files.createLink(dir.resolve(f.getFileName), f)
    catch { case _: Exception => Files.copy(f, dir.resolve(f.getFileName)) }

  /** Write `df` as parquet into `dir` beside any carried files, via a temp
    * dir so partial writes never land in a published version. */
  private def writeInto(df: DataFrame, name: String, dir: Path, prefix: String): Unit = {
    val tmp = s"$warehouse/$name/.$prefix-tmp"
    df.write.mode(SaveMode.Overwrite).option("compression", "zstd").parquet(tmp)
    Files.list(Paths.get(tmp)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        Files.move(f, dir.resolve(s"$prefix-$i.parquet"))
      }
    Files.list(Paths.get(tmp)).iterator().asScala.foreach(Files.delete)
    Files.delete(Paths.get(tmp))
  }

  /** Append tolerating schema evolution: columns new to either side are
    * null-filled (the incremental-sync reality — upstream tables grow
    * columns; the reference re-introspects and rewrites whole tables,
    * Iceberg handles it as metadata-only evolution). */
  def appendEvolving(name: String, df: DataFrame): Unit =
    if (!exists(name)) replace(name, df)
    else replace(name, read(name).unionByName(df, allowMissingColumns = true))

  /** MERGE-by-unique-key with file-level pruning (reference:
    * iceberg_table_writer.go:304-378): only data files whose parquet-footer
    * key range overlaps an incoming key are read back, anti-joined and
    * rewritten; every other file is carried into the new version untouched
    * (metadata-only at object-store scale). At 100 TB a small upsert batch
    * therefore rewrites O(touched files), not the table. Driver memory is
    * O(distinct incoming keys) — the same order as Iceberg's equality-delete
    * key set. Returns (filesRewritten, filesTotal) for observability. */
  def upsert(name: String, incoming: DataFrame, key: String): (Int, Int) = {
    if (!exists(name)) { replace(name, incoming); return (0, 0) }
    prunedRewrite(name, incoming, key, appendIncoming = true)
  }

  /** Delete rows matching `keys`, rewriting only footer-overlapping files
    * (iceberg_table_writer.go:380-452). Returns (filesRewritten, filesTotal). */
  def deleteByKey(name: String, keys: DataFrame, key: String): (Int, Int) =
    prunedRewrite(name, keys.select(col(key)), key, appendIncoming = false)

  /** Shared engine for upsert/deleteByKey: partition the current version's
    * data files into footer-overlap hits (rewritten without the incoming
    * keys) and misses (hard-linked into the new version by name). Pruning
    * runs only for integral/string keys with usable footer stats; anything
    * else degrades to rewrite-everything, which is the old (correct)
    * behavior. */
  private def prunedRewrite(name: String, incoming: DataFrame, key: String,
      appendIncoming: Boolean): (Int, Int) = {
    val cur = Paths.get(versionDir(name, versions(name)))
    val files = Files.list(cur).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    val prunable = incoming.schema(key).dataType match {
      case IntegerType | LongType | ShortType | ByteType | StringType => true
      case _ => false
    }
    // routing probe: ONE limit-bounded job collects at most threshold+1
    // distinct keys. If they all fit, those keys drive the driver-side
    // binary-search overlap test directly (no second pass); if the limit is
    // hit, the batch is "large" and the overlap test runs as a distributed
    // join against broadcast file stats instead — no key set ever
    // materializes on the driver (a 10^9-row upsert prunes with driver
    // memory O(threshold + files))
    val probe: Array[Any] =
      if (!prunable) Array.empty
      else incoming.select(col(key)).where(col(key).isNotNull).distinct()
        .limit(math.min(maxDriverPruneKeys + 1, Int.MaxValue).toInt).collect()
        .map(r => normKey(r.get(0)))
    lastPruneViaJoin = prunable && probe.length > maxDriverPruneKeys
    val (hit, carried) =
      if (!prunable) (files, Seq.empty[Path])
      else try {
        val stats = fileStats(cur, key).toMap
        if (!lastPruneViaJoin) {
          val inKeys: Array[Any] = probe.sorted(keyOrdering)
          def overlaps(range: Option[(Any, Any)]): Boolean = range match {
            case None => true // no usable stats: must assume the file is hit
            case Some((lo, hi)) =>
              val i = lowerBound(inKeys, lo)
              i < inKeys.length && keyOrdering.compare(inKeys(i), hi) <= 0
          }
          files.partition(f => overlaps(stats.getOrElse(f, None)))
        } else {
          val hits = overlapHitsByJoin(incoming, key,
            stats.collect { case (p, Some(r)) => (p, r) }.toSeq)
          files.partition(f => stats.getOrElse(f, None).isEmpty
            || hits.contains(f.getFileName.toString))
        }
      } catch { case _: ClassCastException => (files, Seq.empty[Path]) }
    val next = versions(name) + 1
    val dir = Paths.get(versionDir(name, next))
    Files.createDirectories(dir)
    carried.foreach(carryFile(_, dir))
    val kept =
      if (hit.isEmpty) None
      else Some(spark.read.parquet(hit.map(_.toString): _*)
        .join(incoming.select(col(key)).distinct(), Seq(key), "left_anti"))
    val out =
      if (appendIncoming) Some(kept.fold(incoming)(_.unionByName(incoming)))
      else kept
    out.foreach(writeInto(_, name, dir, s"rw-$next"))
    versions(name) = next
    persistCatalog()
    publish(name)
    (hit.length, files.length)
  }

  /** Per-file min/max stats for every prunable column of a version dir,
    * manifest-cached: the FIRST consultation scans each parquet footer once
    * and writes `_manifest.json` beside the data; every later pruned read
    * or upsert is one small JSON read instead of N footer opens — the
    * Iceberg manifest role (manifests carry per-file column bounds so
    * planning never touches data files). A stale manifest (file set
    * changed) rebuilds automatically; Spark ignores `_`-prefixed files. */
  private[graft] def fileStats(dir: Path, key: String): Seq[(Path, Option[(Any, Any)])] = {
    val files = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    val mf = dir.resolve("_manifest.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def decode(node: com.fasterxml.jackson.databind.JsonNode): Option[(Any, Any)] =
      Option(node).map { n =>
        if (n.get("t").asText == "l") (n.get("lo").asLong, n.get("hi").asLong)
        else (n.get("lo").asText, n.get("hi").asText)
      }
    if (Files.exists(mf)) {
      val root = om.readTree(Files.readAllBytes(mf))
      val known = root.fieldNames.asScala.toSet
      if (files.map(_.getFileName.toString).toSet == known)
        return files.map(f => f ->
          decode(root.get(f.getFileName.toString).get(key)))
    }
    // build (or rebuild) the manifest from one footer pass
    val perFile = files.map { f =>
      f -> footerAllRanges(f)
    }
    val root = om.createObjectNode()
    perFile.foreach { case (f, cols) =>
      val fn = root.putObject(f.getFileName.toString)
      cols.foreach { case (c, (lo, hi)) =>
        val cn = fn.putObject(c)
        (lo, hi) match {
          case (l: java.lang.Long, h: java.lang.Long) =>
            cn.put("t", "l"); cn.put("lo", l.longValue); cn.put("hi", h.longValue)
          case _ =>
            cn.put("t", "s"); cn.put("lo", lo.toString); cn.put("hi", hi.toString)
        }
      }
    }
    val tmp = dir.resolve("._manifest.json.tmp")
    Files.write(tmp, om.writerWithDefaultPrettyPrinter.writeValueAsBytes(root))
    Files.move(tmp, mf, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    perFile.map { case (f, cols) => f -> cols.get(key) }
  }

  /** (lo, hi) per prunable column of one file's footer (columns with any
    * stats-free or null-only row group are omitted). */
  private def footerAllRanges(file: Path): Map[String, (Any, Any)] = {
    val in = HadoopInputFile.fromPath(new HadoopPath(file.toString),
      spark.sessionState.newHadoopConf())
    val reader = ParquetFileReader.open(in)
    try {
      val acc = scala.collection.mutable.Map[String, (Any, Any)]()
      val bad = scala.collection.mutable.Set[String]()
      for (b <- reader.getFooter.getBlocks.asScala; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        if (!bad(name)) {
          val st = c.getStatistics
          val usable = st != null && st.hasNonNullValue &&
            (st.genericGetMin match {
              case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
                   _: java.lang.Byte | _: Binary => true
              case _ => false
            })
          if (!usable) { bad += name; acc.remove(name) }
          else {
            val mn = normKey(st.genericGetMin)
            val mx = normKey(st.genericGetMax)
            val cur = acc.get(name)
            acc(name) = cur.fold((mn, mx)) { case (lo, hi) =>
              (if (keyOrdering.compare(mn, lo) < 0) mn else lo,
                if (keyOrdering.compare(mx, hi) > 0) mx else hi)
            }
          }
        }
      }
      acc.toMap
    } finally reader.close()
  }

  /** Iceberg expire_snapshots analog: delete all but the `keep` most recent
    * version dirs (the current version always survives). Time travel to an
    * expired version then fails; kept snapshots are untouched. Returns the
    * expired version numbers. */
  def expireVersions(name: String, keep: Int = 2): Seq[Int] = {
    require(exists(name), s"unknown table $name")
    val tableDir = Paths.get(s"$warehouse/$name")
    val all = Files.list(tableDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("v\\d+")).map(_.drop(1).toInt).toSeq.sorted
    val doomed = all.filter(_ <= versions(name)).dropRight(math.max(keep, 1))
    doomed.foreach { v =>
      val d = Paths.get(versionDir(name, v))
      Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    // keep the Iceberg metadata tree consistent: snapshots over expired
    // version dirs reference deleted data files, so expire them too
    // (snapshot id == store version)
    val live = all.filterNot(doomed.contains).map(_.toLong).toSet
    Iceberg.expireSnapshots(Paths.get(s"$warehouse/$name"), live)
    doomed
  }

  /** Above this many incoming rows, upsert/delete overlap pruning switches
    * from a driver-side key collect to the stats join (tunable in tests). */
  private[graft] var maxDriverPruneKeys: Long = 100000L
  /** Whether the last prunedRewrite routed through the join-based overlap
    * test — observability for specs asserting the no-collect path. */
  @volatile private[graft] var lastPruneViaJoin: Boolean = false

  /** Distributed overlap test: incoming keys × broadcast (file, lo, hi)
    * ranges -> the set of hit file names. The only rows reaching the driver
    * are file names, never keys. */
  private def overlapHitsByJoin(incoming: DataFrame, key: String,
      ranges: Seq[(Path, (Any, Any))]): Set[String] = {
    import spark.implicits._
    val isStr = incoming.schema(key).dataType == StringType
    val statsDf =
      if (isStr) ranges.map { case (p, (lo, hi)) =>
        (p.getFileName.toString, lo.asInstanceOf[String], hi.asInstanceOf[String])
      }.toDF("__file", "__lo", "__hi")
      else ranges.map { case (p, (lo, hi)) =>
        (p.getFileName.toString,
          lo.asInstanceOf[Number].longValue, hi.asInstanceOf[Number].longValue)
      }.toDF("__file", "__lo", "__hi")
    val keyCol = if (isStr) col(key).cast("string") else col(key).cast("long")
    incoming.select(keyCol.as("__k")).where(col("__k").isNotNull).distinct()
      .join(broadcast(statsDf),
        col("__k") >= col("__lo") && col("__k") <= col("__hi"))
      .select("__file").distinct()
      .collect().map(_.getString(0)).toSet
  }

  /** Normalize footer-stat and DataFrame key values into one comparable
    * family per type (all integrals → Long, parquet Binary → String). */
  private def normKey(v: Any): Any = v match {
    case b: Binary => b.toStringUsingUTF8
    case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue)
    case s: java.lang.Short => java.lang.Long.valueOf(s.longValue)
    case b: java.lang.Byte => java.lang.Long.valueOf(b.longValue)
    case other => other
  }

  private val keyOrdering: Ordering[Any] =
    (a: Any, b: Any) => a.asInstanceOf[Comparable[Any]].compareTo(b)

  /** First index in sorted `a` whose value is >= x (a.length if none). */
  private def lowerBound(a: Array[Any], x: Any): Int = {
    var lo = 0
    var hi = a.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (keyOrdering.compare(a(m), x) < 0) lo = m + 1 else hi = m
    }
    lo
  }

  // ---- Iceberg v2 metadata ----------------------------------------------
  // The reference's tables ARE Iceberg tables (storage_utils.go:162-494);
  // here the format layer is optional per table: publishIceberg emits a
  // spec-conformant v2 snapshot commit (metadata.json + Avro manifest tree
  // with per-column footer stats) for the current version, and readIceberg
  // plans a scan purely from that metadata — no directory listing.

  /** Commit the table's current version as an Iceberg v2 snapshot; snapshot
    * id = store version (deterministic). Returns the metadata.json path. */
  def publishIceberg(name: String): Path = {
    val cur = Paths.get(versionDir(name, versions(name)))
    // recursive walk covers hive-partitioned layouts (key=value subdirs)
    val files = Files.walk(cur).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    require(files.nonEmpty, s"publishIceberg($name): no data files in $cur")
    val schema = read(name).schema
    // identity-partition spec from the path segments between the version
    // dir and the file (hive key=value encoding); values typed per schema
    def segs(f: Path): Seq[(String, String)] =
      cur.relativize(f.getParent).iterator().asScala
        .map(_.toString).filter(_.contains("="))
        .map { s =>
          val Array(k, v) = s.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toSeq
    val specCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
      segs(files.head).map { case (k, _) => k -> schema(k).dataType }
    def typed(k: String, v: String): Any = schema(k).dataType match {
      case IntegerType | ShortType | ByteType => v.toInt
      case LongType => v.toLong
      case _ => v
    }
    Iceberg.commit(spark, Paths.get(s"$warehouse/$name"), schema,
      files, versions(name), specCols,
      f => segs(f).map { case (k, v) => k -> typed(k, v) })
  }

  /** Read through the Iceberg metadata tree (optionally a past snapshot). */
  def readIceberg(name: String, snapshotId: Option[Long] = None): DataFrame =
    Iceberg.readTable(spark, Paths.get(s"$warehouse/$name"), snapshotId)

  /** Type-2 slowly-changing-dimension upsert: incoming (key, attrs,
    * effective ts) closes the open history row of each changed key
    * (valid_to = ts, is_current = false) and opens a new current row.
    * Unchanged keys keep their open row. The reference only replaces or
    * upserts in place (iceberg_table_writer.go:304-378); history tracking
    * is the warehouse-side extension. On Iceberg this is a single MERGE;
    * here: one anti/semi split + union, all hash joins on the key. */
  def scd2Upsert(name: String, incoming: DataFrame, key: String, tsCol: String): Unit = {
    if (!exists(name)) {
      replace(name, incoming
        .withColumn("valid_from", col(tsCol)).drop(tsCol)
        .withColumn("valid_to", lit(null).cast("timestamp"))
        .withColumn("is_current", lit(true)))
      return
    }
    val hist = read(name)
    val incomingKeys = incoming.select(col(key))
    val untouched = hist.join(incomingKeys, Seq(key), "left_anti")
    val closedAt = incoming.select(col(key), col(tsCol).as("__close_ts"))
    val closed = hist.filter(col("is_current"))
      .join(closedAt, Seq(key))
      .withColumn("valid_to", col("__close_ts")).drop("__close_ts")
      .withColumn("is_current", lit(false))
    val priorHistory = hist.filter(!col("is_current"))
      .join(incomingKeys, Seq(key), "left_semi")
    val opened = incoming
      .withColumn("valid_from", col(tsCol)).drop(tsCol)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    replace(name, untouched.unionByName(priorHistory).unionByName(closed)
      .unionByName(opened))
  }

  /** Cursor-based incremental append with overlap trim: rows of `incoming`
    * at/after the stored max(cursor) are appended unless their unique key is
    * already present (the reference's OverrideRows handling). */
  def cursorAppend(name: String, incoming: DataFrame, cursorCol: String, key: String): Unit = {
    val cursor = read(name).agg(max(col(cursorCol))).collect()(0).get(0)
    val fresh = incoming.filter(col(cursorCol) >= lit(cursor))
      .join(read(name).select(key), Seq(key), "left_anti")
    append(name, fresh)
  }

  // ---- SQL publication ---------------------------------------------------
  // Every store table (synced tables AND matviews) is queryable by name
  // through spark.sql / the wire front end: each version flip re-registers
  // the current snapshot as a session temp view — the reference registers
  // every catalog table as a DuckDB shell table the same way
  // (query_remapper_table.go:141-178). replaceBucketed is the exception:
  // it registers a real catalog table (bucket metadata lives there) and a
  // temp view would shadow it.
  private def publish(name: String): Unit =
    // a bucketed table lives in the session catalog (bucket metadata only
    // exists there) — registering a temp view over it would shadow the
    // bucket layout AND go stale on the next bucketed replace
    if (!spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(name)))
      read(name).createOrReplaceTempView(name)

  def createMatview(name: String, defn: String, withData: Boolean = true): Unit = {
    matviewDefs(name) = defn
    if (withData) replace(name, spark.sql(defn))
    else replace(name, spark.sql(defn).limit(0))
    publish(name)
  }

  def refreshMatview(name: String): Unit = {
    replace(name, spark.sql(matviewDefs(name)))
    publish(name)
  }

  def dropMatview(name: String): Unit = {
    matviewDefs.remove(name)
    drop(name)
    spark.catalog.dropTempView(name)
  }

  def renameMatview(from: String, to: String): Unit = {
    matviewDefs.get(from).foreach { d => matviewDefs(to) = d; matviewDefs.remove(from) }
    versions.get(from).foreach { v =>
      Files.move(Paths.get(s"$warehouse/$from"), Paths.get(s"$warehouse/$to"))
      versions(to) = v
      versions.remove(from)
      spark.catalog.dropTempView(from)
      publish(to)
    }
    persistCatalog()
  }

  def matviewDefinition(name: String): Option[String] = matviewDefs.get(name)

  /** Registered matview names (catalog listing order). */
  def matviewNames: Seq[String] = matviewDefs.keys.toSeq.sorted

  /** Plain (non-matview) table names — the synced-table population the
    * catalog emulation lists as relkind 'r'. */
  def tableNames: Seq[String] =
    (versions.keySet -- matviewDefs.keySet).toSeq.sorted

  def drop(name: String): Unit = {
    versions.remove(name)
    spark.catalog.dropTempView(name)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(rm)
      Files.deleteIfExists(p)
    }
    rm(Paths.get(s"$warehouse/$name"))
    persistCatalog()
  }
}
