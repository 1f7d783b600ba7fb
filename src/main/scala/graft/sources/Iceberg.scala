package graft

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Apache Iceberg v2 table metadata: a real, spec-conformant writer + reader
  * for the three-layer metadata tree (vN.metadata.json → manifest-list Avro →
  * manifest Avro → data files), with per-column stats harvested from parquet
  * footers — the same layout the reference hand-writes in Go
  * (/root/reference/src/common/storage_utils.go:162-494: WriteManifestFile,
  * WriteManifestListFile, WriteMetadataFile; Avro schemas at :570-900).
  *
  * No Iceberg runtime ships in this container, so this module implements the
  * FORMAT directly from the public Iceberg v2 spec using the Avro + parquet
  * jars Spark bundles. Scope matches the reference: unpartitioned tables,
  * parquet data files, full-snapshot commits (every commit's manifest lists
  * the complete file set — the reference writes the same shape: one new
  * manifest per sync listing all files).
  *
  * Scale notes (100 TB): planning reads O(manifests) small Avro files, never
  * data; [[planFiles]] prunes on manifest-entry lower/upper bounds before
  * Spark lists a single parquet footer — the mechanism that lets a
  * 1000-executor cluster open only the files a predicate can touch.
  *
  * All I/O goes through the Hadoop `FileSystem` resolved from each path
  * (same contract as the Store), so metadata trees live on any configured
  * `fs.*` scheme; data-file locations are written as fully-qualified URIs,
  * which is what the spec's `file_path` ("Location URI with FS scheme")
  * requires and what lets a reader on another host resolve them.
  */
object Iceberg {

  /** Parquet field-id offset for list element fields — the reference's
    * PARQUET_NESTED_FIELD_ID_PREFIX (iceberg_schema_column.go:44). */
  val NestedFieldIdPrefix = 1000

  // ---- Iceberg schema JSON (metadata.json "schemas" entry) ---------------

  /** Iceberg type string for a Spark type (reverse of the SURVEY §1.4 map). */
  def icebergType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case StringType => "string"
    case BinaryType => "binary"
    case other => throw new IllegalArgumentException(s"no iceberg mapping for $other")
  }

  private def om = new com.fasterxml.jackson.databind.ObjectMapper()

  // ---- Hadoop FS plumbing (any configured fs.* scheme, like the Store) ----

  /** FileSystem for a path. Metadata files are small rebuildable JSON/Avro:
    * skip the local ChecksumFileSystem's .crc shadows (no-op elsewhere). */
  private def fsOf(p: Path, conf: Configuration): FileSystem = {
    val fs = p.getFileSystem(conf)
    fs.setWriteChecksum(false)
    fs.setVerifyChecksum(false)
    fs
  }

  private def readBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private def writeBytes(fs: FileSystem, p: Path, bytes: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Iceberg struct-schema JSON with position-based field ids (1-based; list
    * elements at 1000+position, like the reference). */
  def schemaJson(schema: StructType): com.fasterxml.jackson.databind.node.ObjectNode = {
    val mapper = om
    val root = mapper.createObjectNode()
    root.put("type", "struct")
    root.put("schema-id", 0)
    val fields = root.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val id = i + 1
      val fn = fields.addObject()
      fn.put("id", id)
      fn.put("name", f.name)
      fn.put("required", false)
      f.dataType match {
        case ArrayType(elem, containsNull) =>
          val t = fn.putObject("type")
          t.put("type", "list")
          t.put("element-id", NestedFieldIdPrefix + id)
          t.put("element", icebergType(elem))
          t.put("element-required", !containsNull)
        case dt => fn.put("type", icebergType(dt))
      }
    }
    root.putArray("identifier-field-ids")
    root
  }

  // ---- per-file stats from parquet footers -------------------------------

  /** One data file's manifest stats. Bounds are kept only for types whose
    * parquet plain-encoded min/max bytes coincide with Iceberg's single-value
    * serialization (int32/int64/float/double little-endian, UTF-8 strings) —
    * exactly the set the reference harvests (storage_utils.go:93-160); other
    * columns legally omit bounds. */
  case class FileStats(path: String, fileSize: Long, recordCount: Long,
      columnSizes: Map[Int, Long], valueCounts: Map[Int, Long],
      nullCounts: Map[Int, Long], lowerBounds: Map[Int, Array[Byte]],
      upperBounds: Map[Int, Array[Byte]], splitOffsets: Seq[Long])

  def parquetStats(spark: SparkSession, file: Path, schema: StructType): FileStats = {
    val fieldIdByName = schema.fields.zipWithIndex.map { case (f, i) =>
      f.name.toLowerCase -> (f.dataType match {
        case _: ArrayType => NestedFieldIdPrefix + i + 1
        case _ => i + 1
      })
    }.toMap
    val stringCols = schema.fields.collect {
      case f if f.dataType == StringType => f.name.toLowerCase
    }.toSet
    val boundType: Map[String, DataType] = schema.fields.collect {
      case f if Set[DataType](IntegerType, LongType, FloatType, DoubleType,
        StringType, DateType, TimestampType, TimestampNTZType).contains(f.dataType) =>
        f.name.toLowerCase -> f.dataType
    }.toMap
    val hconf = spark.sessionState.newHadoopConf()
    val in = HadoopInputFile.fromPath(file, hconf)
    val reader = ParquetFileReader.open(in)
    try {
      val colSizes = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
      val valCounts = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
      val nullCounts = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
      val lower = scala.collection.mutable.Map[Int, Array[Byte]]()
      val upper = scala.collection.mutable.Map[Int, Array[Byte]]()
      val splits = scala.collection.mutable.ArrayBuffer[Long]()
      var records = 0L
      for (b <- reader.getFooter.getBlocks.asScala) {
        records += b.getRowCount
        splits += b.getStartingPos
        for (c <- b.getColumns.asScala) {
          val name = c.getPath.toDotString.split("\\.")(0).toLowerCase
          fieldIdByName.get(name).foreach { fid =>
            colSizes(fid) += c.getTotalSize
            valCounts(fid) += c.getValueCount
            val st = c.getStatistics
            if (st != null && !st.isEmpty) nullCounts(fid) += st.getNumNulls
            if (st != null && st.hasNonNullValue && boundType.contains(name)) {
              val dt = boundType(name)
              val mn = st.getMinBytes
              val mx = st.getMaxBytes
              // byte-compare only works for strings; numerics (esp. negative
              // IEEE-754 floats/doubles, whose bit patterns invert order)
              // need a typed decode-and-compare
              if ((stringCols(name) || mn.nonEmpty) &&
                  (!lower.contains(fid) || boundLt(mn, lower(fid), dt)))
                lower(fid) = mn
              if ((stringCols(name) || mx.nonEmpty) &&
                  (!upper.contains(fid) || boundLt(upper(fid), mx, dt)))
                upper(fid) = mx
            }
          }
        }
      }
      FileStats(file.toString,
        fsOf(file, hconf).getFileStatus(file).getLen, records, colSizes.toMap,
        valCounts.toMap, nullCounts.toMap, lower.toMap, upper.toMap, splits.toSeq)
    } finally reader.close()
  }

  /** Bound ordering: unsigned-lexicographic bytes for strings (UTF-8 sorts
    * like code points), TYPED little-endian decode for numerics — a raw
    * integer compare of float/double bits inverts for negatives. */
  private def boundLt(a: Array[Byte], b: Array[Byte], dt: DataType): Boolean = dt match {
    case StringType =>
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      a.length < b.length
    case DoubleType if a.length == 8 && b.length == 8 =>
      java.lang.Double.longBitsToDouble(leLong(a)) <
        java.lang.Double.longBitsToDouble(leLong(b))
    case FloatType if a.length == 4 && b.length == 4 =>
      java.lang.Float.intBitsToFloat(leInt(a)) < java.lang.Float.intBitsToFloat(leInt(b))
    case LongType | TimestampType | TimestampNTZType if a.length == 8 && b.length == 8 =>
      leLong(a) < leLong(b)
    case IntegerType | DateType if a.length == 4 && b.length == 4 =>
      leInt(a) < leInt(b)
    case _ => false
  }

  private def leLong(a: Array[Byte]): Long =
    ByteBuffer.wrap(a).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  private def leInt(a: Array[Byte]): Int =
    ByteBuffer.wrap(a).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt

  // ---- partition spec fields + transforms --------------------------------

  /** One partition-spec field. `name` is the spec field name (identity
    * fields use the column name; transformed fields use the
    * `<col>_<transform>` convention, with bucket/truncate widths inlined —
    * `ts_day`, `id_bucket16`, `s_trunc4` — so a hive layout is
    * self-describing), `transform` the Iceberg transform string (identity,
    * day, month, year, hour, bucket[N], truncate[W]), `sourceCol` the
    * schema column it derives from, `resultType` the transform result type
    * (controls the Avro partition-value encoding). */
  final case class SpecField(name: String, transform: String,
      sourceCol: String, sourceType: DataType) {
    def resultType: DataType = transformResultType(transform, sourceType)
  }
  object SpecField {
    def identity(n: String, dt: DataType): SpecField =
      SpecField(n, "identity", n, dt)
    /** Spec field name for a transform over a column (`ts_day`,
      * `id_bucket16`, `s_trunc4`) — also the hive dir key the writer emits,
      * so a layout is self-describing for [[Store.publishIceberg]]. */
    def fieldName(column: String, transform: String): String = transform match {
      case "identity" => column
      case bucketRe(n) => s"${column}_bucket$n"
      case truncRe(w) => s"${column}_trunc$w"
      case t => s"${column}_$t"
    }
  }

  private val bucketRe = "bucket\\[(\\d+)\\]".r
  private val truncRe = "truncate\\[(\\d+)\\]".r

  /** Iceberg bucket hash (spec Appendix B): murmur3_x86_32 with seed 0 over
    * the spec'd byte layout — ints/longs/dates/timestamps as 8-byte
    * little-endian longs, strings as UTF-8 bytes. Spark bundles the same
    * x86 32-bit murmur3; hashLong matches the 8-byte-LE layout directly and
    * hashUnsafeBytes2 is its Guava-compatible byte variant (the plain
    * hashUnsafeBytes mixes tail bytes one block each — NOT murmur3).
    * IcebergSpec pins the spec's published test vectors. */
  def bucketHash(v: Any, dt: DataType): Int = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    import org.apache.spark.unsafe.Platform
    dt match {
      case IntegerType | ShortType | ByteType | LongType =>
        Murmur3_x86_32.hashLong(v.asInstanceOf[Number].longValue, 0)
      case DateType => Murmur3_x86_32.hashLong(v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case d: java.time.LocalDate => d.toEpochDay
        case n: Number => n.longValue
      }, 0)
      case TimestampType | TimestampNTZType =>
        Murmur3_x86_32.hashLong(microsOf(v), 0)
      case StringType =>
        val b = v.toString.getBytes(UTF_8)
        Murmur3_x86_32.hashUnsafeBytes2(b, Platform.BYTE_ARRAY_OFFSET, b.length, 0)
      case other => throw new IllegalArgumentException(s"bucket over $other")
    }
  }

  private def microsOf(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      t.getTime / 1000 * 1000000 + t.getNanos / 1000
    case t: java.time.Instant =>
      t.getEpochSecond * 1000000L + t.getNano / 1000
    case t: java.time.LocalDateTime =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    case n: Number => n.longValue
  }

  private def epochDayOf(v: Any, dt: DataType): Long = dt match {
    case DateType => v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay
      case d: java.time.LocalDate => d.toEpochDay
      case n: Number => n.longValue
    }
    case _ => Math.floorDiv(microsOf(v), 86400000000L)
  }

  /** Apply a transform to a literal — the pruning-side twin of the layout
    * the writer produced. */
  def transformValue(transform: String, v: Any, dt: DataType): Any =
    transform match {
      case "identity" => v
      case "day" => epochDayOf(v, dt).toInt
      case "hour" => Math.floorDiv(microsOf(v), 3600000000L).toInt
      case "month" =>
        val d = java.time.LocalDate.ofEpochDay(epochDayOf(v, dt))
        (d.getYear - 1970) * 12 + d.getMonthValue - 1
      case "year" =>
        java.time.LocalDate.ofEpochDay(epochDayOf(v, dt)).getYear - 1970
      case bucketRe(n) => (bucketHash(v, dt) & Int.MaxValue) % n.toInt
      case truncRe(w) => dt match {
        case StringType =>
          val s = v.toString; s.substring(0, math.min(s.length, w.toInt))
        case LongType | IntegerType =>
          val l = v.asInstanceOf[Number].longValue
          val r = l - Math.floorMod(l, w.toLong)
          if (dt == IntegerType) r.toInt else r
        case other => throw new IllegalArgumentException(s"truncate over $other")
      }
      case other => throw new IllegalArgumentException(s"transform $other")
    }

  def transformResultType(transform: String, src: DataType): DataType =
    transform match {
      case "identity" => src
      case "day" | "hour" | "month" | "year" => IntegerType
      case bucketRe(_) => IntegerType
      case truncRe(_) => src
      case other => throw new IllegalArgumentException(s"transform $other")
    }

  /** Monotone transforms map a source range to a transform-value range, so
    * range predicates prune partitions; bucket does not (equality only). */
  def transformMonotone(transform: String): Boolean =
    transform match { case bucketRe(_) => false; case _ => true }

  // ---- Avro schemas (Iceberg v2 spec, field-ids as avro props) -----------

  private def kvArray(name: String, keyId: Int, valId: Int, valType: String) =
    s"""{"type": "array", "items": {"type": "record", "name": "$name", "fields": [
       |  {"name": "key", "type": "int", "field-id": $keyId},
       |  {"name": "value", "type": "$valType", "field-id": $valId}
       |]}}""".stripMargin

  /** Avro type for an identity-partition value (typed for integrals and
    * strings; everything else rides as its hive-encoded string form). */
  private def partAvroType(dt: DataType): String = dt match {
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case _ => "string"
  }

  /** manifest_entry (v2) — field ids per the Iceberg spec's Appendix;
    * identical structure to the reference's MANIFEST_SCHEMA
    * (storage_utils.go:570-800). The r102 partition record carries one
    * field per identity-partition column (field-ids 1000+i, like the
    * spec's partition-field id space). */
  private[graft] def manifestSchemaJson(specCols: Seq[(String, DataType)]): String = {
    val partFields = specCols.zipWithIndex.map { case ((n, dt), i) =>
      s"""{"name": "$n", "type": ["null", "${partAvroType(dt)}"], "default": null, "field-id": ${1000 + i}}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "manifest_entry", "fields": [
       | {"name": "status", "type": "int", "field-id": 0},
       | {"name": "snapshot_id", "type": ["null", "long"], "default": null, "field-id": 1},
       | {"name": "sequence_number", "type": ["null", "long"], "default": null, "field-id": 3},
       | {"name": "file_sequence_number", "type": ["null", "long"], "default": null, "field-id": 4},
       | {"name": "data_file", "field-id": 2, "type": {"type": "record", "name": "r2", "fields": [
       |   {"name": "content", "type": "int", "doc": "Contents of the file: 0=data, 1=position deletes, 2=equality deletes", "field-id": 134},
       |   {"name": "file_path", "type": "string", "doc": "Location URI with FS scheme", "field-id": 100},
       |   {"name": "file_format", "type": "string", "doc": "File format name: avro, orc, or parquet", "field-id": 101},
       |   {"name": "partition", "field-id": 102, "type": {"type": "record", "name": "r102", "fields": [$partFields]}},
       |   {"name": "record_count", "type": "long", "field-id": 103},
       |   {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
       |   {"name": "column_sizes", "type": ["null", ${kvArray("k117_v118", 117, 118, "long")}], "default": null, "field-id": 108},
       |   {"name": "value_counts", "type": ["null", ${kvArray("k119_v120", 119, 120, "long")}], "default": null, "field-id": 109},
       |   {"name": "null_value_counts", "type": ["null", ${kvArray("k121_v122", 121, 122, "long")}], "default": null, "field-id": 110},
       |   {"name": "nan_value_counts", "type": ["null", ${kvArray("k138_v139", 138, 139, "long")}], "default": null, "field-id": 137},
       |   {"name": "lower_bounds", "type": ["null", ${kvArray("k126_v127", 126, 127, "bytes")}], "default": null, "field-id": 125},
       |   {"name": "upper_bounds", "type": ["null", ${kvArray("k129_v130", 129, 130, "bytes")}], "default": null, "field-id": 128},
       |   {"name": "key_metadata", "type": ["null", "bytes"], "default": null, "field-id": 131},
       |   {"name": "split_offsets", "type": ["null", {"type": "array", "items": "long"}], "default": null, "field-id": 132},
       |   {"name": "equality_ids", "type": ["null", {"type": "array", "items": "int"}], "default": null, "field-id": 135},
       |   {"name": "sort_order_id", "type": ["null", "int"], "default": null, "field-id": 140}
       | ]}}
       |]}""".stripMargin
  }

  /** manifest_file (v2 manifest list) — spec field-ids 500-519. */
  private[graft] val manifestListSchemaJson: String =
    """{"type": "record", "name": "manifest_file", "fields": [
      | {"name": "manifest_path", "type": "string", "field-id": 500},
      | {"name": "manifest_length", "type": "long", "field-id": 501},
      | {"name": "partition_spec_id", "type": "int", "field-id": 502},
      | {"name": "content", "type": "int", "field-id": 517},
      | {"name": "sequence_number", "type": "long", "field-id": 515},
      | {"name": "min_sequence_number", "type": "long", "field-id": 516},
      | {"name": "added_snapshot_id", "type": "long", "field-id": 503},
      | {"name": "added_files_count", "type": "int", "field-id": 504},
      | {"name": "existing_files_count", "type": "int", "field-id": 505},
      | {"name": "deleted_files_count", "type": "int", "field-id": 506},
      | {"name": "added_rows_count", "type": "long", "field-id": 512},
      | {"name": "existing_rows_count", "type": "long", "field-id": 513},
      | {"name": "deleted_rows_count", "type": "long", "field-id": 514},
      | {"name": "partitions", "type": ["null", {"type": "array", "items": {
      |   "type": "record", "name": "r508", "fields": [
      |     {"name": "contains_null", "type": "boolean", "field-id": 509},
      |     {"name": "contains_nan", "type": ["null", "boolean"], "default": null, "field-id": 518},
      |     {"name": "lower_bound", "type": ["null", "bytes"], "default": null, "field-id": 510},
      |     {"name": "upper_bound", "type": ["null", "bytes"], "default": null, "field-id": 511}
      |   ]}}], "default": null, "field-id": 507},
      | {"name": "key_metadata", "type": ["null", "bytes"], "default": null, "field-id": 519}
      |]}""".stripMargin

  private val manifestSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()
  private def manifestSchema(specCols: Seq[(String, DataType)]): Schema =
    // key on name AND type: two tables may share a partition column name
    // with different types, and the Avro field type differs between them
    manifestSchemaCache.computeIfAbsent(
      specCols.map { case (n, dt) => s"$n:$dt" }.mkString(","),
      _ => new Schema.Parser().parse(manifestSchemaJson(specCols)))
  private lazy val manifestListSchema = new Schema.Parser().parse(manifestListSchemaJson)

  // ---- commit (write one snapshot) ---------------------------------------

  /** Write one snapshot commit for the complete current file set of a table:
    * manifest Avro + manifest-list Avro + vN.metadata.json + version-hint.
    * Prior snapshots accumulate (their manifest lists and data files stay
    * on disk until expiry), so metadata-level time travel works. Snapshot
    * ids are the table version number — deterministic, unlike the
    * reference's wall-clock ids, so tests and oracles can pin them. */
  def commit(spark: SparkSession, tableDir: Path, schema: StructType,
      dataFiles: Seq[Path], snapshotId: Long,
      spec: Seq[SpecField] = Nil,
      partitionOf: Path => Seq[(String, Any)] = _ => Nil): Path = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = fsOf(tableDir, conf)
    val metaDir = new Path(tableDir, "metadata")
    fs.mkdirs(metaDir)
    val sorted = dataFiles.sortBy(_.toString)
    val stats = sorted.map(parquetStats(spark, _, schema))
    val parts = sorted.map(partitionOf)
    val seq = snapshotId

    // manifest
    val manifestPath = new Path(metaDir, f"snap-$snapshotId-manifest.avro")
    writeManifest(fs, manifestPath, schema, stats, snapshotId, seq, spec, parts)
    val manifestLen = fs.getFileStatus(manifestPath).getLen

    // manifest list
    val listPath = new Path(metaDir, f"snap-$snapshotId.avro")
    val totalRows = stats.map(_.recordCount).sum
    writeManifestList(fs, listPath, manifestPath, manifestLen, snapshotId, seq,
      stats.length, totalRows)

    // metadata.json (accumulate prior snapshots)
    val mapper = om
    val prior = currentMetadataFile(tableDir, conf)
      .map(p => mapper.readTree(readBytes(fs, p)))
    val root = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", prior.map(_.get("table-uuid").asText)
      .getOrElse(java.util.UUID.nameUUIDFromBytes(tableDir.toString.getBytes(UTF_8)).toString))
    root.put("location", fs.makeQualified(tableDir).toUri.toString.stripSuffix("/"))
    root.put("last-sequence-number", seq)
    root.put("last-updated-ms", System.currentTimeMillis)
    root.put("last-column-id", lastColumnId(schema))
    val schemas = root.putArray("schemas")
    schemas.add(schemaJson(schema))
    root.put("current-schema-id", 0)
    val specs = root.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    val specFields = spec0.putArray("fields")
    spec.zipWithIndex.foreach { case (sf, i) =>
      val f = specFields.addObject()
      f.put("name", sf.name)
      f.put("transform", sf.transform)
      f.put("source-id", schema.fieldIndex(sf.sourceCol) + 1)
      f.put("field-id", 1000 + i)
    }
    root.put("default-spec-id", 0)
    root.put("last-partition-id", 999 + spec.size)
    val orders = root.putArray("sort-orders")
    val order0 = orders.addObject()
    order0.put("order-id", 0)
    order0.putArray("fields")
    root.put("default-sort-order-id", 0)
    root.putObject("properties")
    root.put("current-snapshot-id", snapshotId)
    val refs = root.putObject("refs")
    val main = refs.putObject("main")
    main.put("snapshot-id", snapshotId)
    main.put("type", "branch")
    val snaps = root.putArray("snapshots")
    val slog = root.putArray("snapshot-log")
    // re-publishing the same store version replaces its snapshot (idempotent
    // retry) instead of appending a duplicate id with a self-parent link
    var parent: Option[Long] = None
    prior.foreach { p =>
      p.get("snapshots").elements.asScala
        .filter(_.get("snapshot-id").asLong != snapshotId)
        .foreach { s =>
          snaps.add(s)
          parent = Some(s.get("snapshot-id").asLong)
        }
      p.get("snapshot-log").elements.asScala
        .filter(_.get("snapshot-id").asLong != snapshotId)
        .foreach(slog.add)
    }
    val snap = snaps.addObject()
    snap.put("snapshot-id", snapshotId)
    parent.foreach(snap.put("parent-snapshot-id", _))
    snap.put("sequence-number", seq)
    snap.put("timestamp-ms", System.currentTimeMillis)
    snap.put("manifest-list", fs.makeQualified(listPath).toUri.toString)
    snap.put("schema-id", 0)
    val summary = snap.putObject("summary")
    summary.put("operation", "overwrite")
    summary.put("total-data-files", stats.length.toString)
    summary.put("total-records", totalRows.toString)
    summary.put("total-files-size", stats.map(_.fileSize).sum.toString)
    summary.put("total-delete-files", "0")
    summary.put("total-equality-deletes", "0")
    summary.put("total-position-deletes", "0")
    val le = slog.addObject()
    le.put("snapshot-id", snapshotId)
    le.put("timestamp-ms", System.currentTimeMillis)
    root.putArray("metadata-log")
    root.putArray("statistics")

    val version = prior.map(_ => nextMetadataVersion(fs, metaDir)).getOrElse(1)
    val mdPath = new Path(metaDir, f"v$version.metadata.json")
    writeBytes(fs, mdPath, mapper.writerWithDefaultPrettyPrinter.writeValueAsBytes(root))
    writeBytes(fs, new Path(metaDir, "version-hint.text"),
      version.toString.getBytes(UTF_8))
    mdPath
  }

  private def lastColumnId(schema: StructType): Int =
    schema.fields.zipWithIndex.map {
      case (f, i) => f.dataType match {
        case _: ArrayType => NestedFieldIdPrefix + i + 1
        case _ => i + 1
      }
    }.foldLeft(0)(math.max)

  private def nextMetadataVersion(fs: FileSystem, metaDir: Path): Int =
    fs.listStatus(metaDir).iterator
      .map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+\\.metadata\\.json") =>
        s.stripPrefix("v").stripSuffix(".metadata.json").toInt }
      .foldLeft(0)(math.max) + 1

  /** Path of the table's current metadata.json: via version-hint when
    * present, else the highest vN.metadata.json — the reference's Go
    * emitter writes no hint file (storage_utils.go:28 names v1.metadata
    * .json directly), so a foreign tree resolves through the fallback. */
  def currentMetadataFile(tableDir: Path,
      conf: Configuration = new Configuration()): Option[Path] = {
    val fs = fsOf(tableDir, conf)
    val metaDir = new Path(tableDir, "metadata")
    val hint = new Path(metaDir, "version-hint.text")
    if (fs.exists(hint)) {
      val v = new String(readBytes(fs, hint), UTF_8).trim.toInt
      val p = new Path(metaDir, s"v$v.metadata.json")
      if (fs.exists(p)) Some(p) else None
    } else if (!fs.exists(metaDir)) None
    else fs.listStatus(metaDir).iterator
      .map(_.getPath)
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxByOption(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
  }

  private def kvRecord(schema: Schema, k: Int, v: Any): GenericRecord = {
    val r = new GenericData.Record(schema)
    r.put("key", k)
    r.put("value", v)
    r
  }

  private def kvArrayFor(dataFileSchema: Schema, field: String,
      m: Map[Int, _]): java.util.List[GenericRecord] = {
    val arrSchema = dataFileSchema.getField(field).schema.getTypes.get(1)
    val elemSchema = arrSchema.getElementType
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      kvRecord(elemSchema, k, v match {
        case b: Array[Byte] => ByteBuffer.wrap(b)
        case other => other
      })
    }.asJava
  }

  private def writeManifest(fs: FileSystem, path: Path, schema: StructType,
      stats: Seq[FileStats], snapshotId: Long, seq: Long,
      spec: Seq[SpecField], parts: Seq[Seq[(String, Any)]]): Unit = {
    val mSchema = manifestSchema(spec.map(sf => sf.name -> sf.resultType))
    val dataFileSchema = mSchema.getField("data_file").schema
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](mSchema))
    writer.setMeta("schema", om.writeValueAsString(schemaJson(schema)))
    val specJson = spec.zipWithIndex.map { case (sf, i) =>
      s"""{"name": "${sf.name}", "transform": "${sf.transform}", "source-id": ${schema.fieldIndex(sf.sourceCol) + 1}, "field-id": ${1000 + i}}"""
    }.mkString("[", ", ", "]")
    writer.setMeta("partition-spec", specJson)
    writer.setMeta("partition-spec-id", "0")
    writer.setMeta("format-version", "2")
    writer.setMeta("content", "data")
    writer.create(mSchema, fs.create(path, true))
    try stats.zip(parts).foreach { case (st, part) =>
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", 0)
      df.put("file_path", fs.makeQualified(new Path(st.path)).toUri.toString)
      df.put("file_format", "PARQUET")
      val pRec = new GenericData.Record(dataFileSchema.getField("partition").schema)
      part.foreach { case (n, v) => pRec.put(n, v match {
        case s: String => new org.apache.avro.util.Utf8(s)
        case other => other
      }) }
      df.put("partition", pRec)
      df.put("record_count", st.recordCount)
      df.put("file_size_in_bytes", st.fileSize)
      df.put("column_sizes", kvArrayFor(dataFileSchema, "column_sizes", st.columnSizes))
      df.put("value_counts", kvArrayFor(dataFileSchema, "value_counts", st.valueCounts))
      df.put("null_value_counts", kvArrayFor(dataFileSchema, "null_value_counts", st.nullCounts))
      df.put("nan_value_counts", kvArrayFor(dataFileSchema, "nan_value_counts", Map.empty[Int, Long]))
      df.put("lower_bounds", kvArrayFor(dataFileSchema, "lower_bounds", st.lowerBounds))
      df.put("upper_bounds", kvArrayFor(dataFileSchema, "upper_bounds", st.upperBounds))
      df.put("split_offsets", st.splitOffsets.map(java.lang.Long.valueOf).asJava)
      df.put("sort_order_id", 0)
      val entry = new GenericData.Record(mSchema)
      entry.put("status", 1) // ADDED in this snapshot
      entry.put("snapshot_id", snapshotId)
      entry.put("sequence_number", seq)
      entry.put("file_sequence_number", seq)
      entry.put("data_file", df)
      writer.append(entry)
    } finally writer.close()
  }

  /** One manifest-list row: content 0 = data manifest, 1 = delete
    * manifest (v2 merge-on-read). */
  private[graft] case class MLEntry(manifestPath: Path, length: Long,
      content: Int, fileCount: Int, rowCount: Long)

  private def writeManifestList(fs: FileSystem, path: Path, manifestPath: Path,
      manifestLen: Long, snapshotId: Long, seq: Long, fileCount: Int,
      rowCount: Long): Unit =
    writeManifestListEntries(fs, path, snapshotId, seq,
      Seq(MLEntry(manifestPath, manifestLen, 0, fileCount, rowCount)))

  private def writeManifestListEntries(fs: FileSystem, path: Path,
      snapshotId: Long, seq: Long, entries: Seq[MLEntry]): Unit = {
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](manifestListSchema))
    writer.setMeta("format-version", "2")
    writer.create(manifestListSchema, fs.create(path, true))
    try entries.foreach { e =>
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", fs.makeQualified(e.manifestPath).toUri.toString)
      r.put("manifest_length", e.length)
      r.put("partition_spec_id", 0)
      r.put("content", e.content)
      r.put("sequence_number", seq)
      r.put("min_sequence_number", seq)
      r.put("added_snapshot_id", snapshotId)
      r.put("added_files_count", e.fileCount)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", e.rowCount)
      r.put("existing_rows_count", 0L)
      r.put("deleted_rows_count", 0L)
      r.put("partitions", new java.util.ArrayList[GenericRecord]())
      writer.append(r)
    } finally writer.close()
  }

  // ---- v2 merge-on-read: position deletes --------------------------------

  /** Attach position deletes to the CURRENT snapshot — the v2 row-level
    * delete that removes rows WITHOUT rewriting data files: a delete
    * parquet of (file_path, pos) rows, a delete manifest (content=1), and
    * a rewritten manifest list + metadata version. At 100 TB this is the
    * low-latency delete path (GDPR erasure, CDC deletes) where rewriting a
    * multi-GB data file for a handful of rows is unaffordable; readers
    * apply the deletes as an anti-join at scan time and compaction folds
    * them in later. Scope: deletes apply to the whole current snapshot
    * (single-sequence tables — this emitter's commits always are). */
  def attachPositionDeletes(spark: SparkSession, tableDir: Path,
      deletes: Seq[(String, Seq[Long])]): Path = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = fsOf(tableDir, conf)
    val mdPath = currentMetadataFile(tableDir, conf)
      .getOrElse(throw new IllegalStateException(s"no iceberg metadata under $tableDir"))
    val md = om.readTree(readBytes(fs, mdPath)).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snapId = md.get("current-snapshot-id").asLong
    val snap = md.get("snapshots").elements.asScala
      .find(_.get("snapshot-id").asLong == snapId).get
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val metaDir = new Path(tableDir, "metadata")
    // the delete parquet (spec: file_path asc, pos asc ordering)
    import spark.implicits._
    val rows = deletes.flatMap { case (f, ps) => ps.sorted.map(p => (f, p)) }
      .sortBy(r => (r._1, r._2))
    val delDir = new Path(metaDir, s"delete-$snapId-${System.nanoTime}")
    rows.toDF("file_path", "pos").coalesce(1)
      .write.mode("overwrite").parquet(delDir.toString)
    val delParquet = fs.listStatus(delDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    // the delete manifest: same entry schema, data_file.content = 1
    val delManifest = new Path(metaDir, s"snap-$snapId-deletes-manifest.avro")
    val mSchema = manifestSchema(Nil)
    val dataFileSchema = mSchema.getField("data_file").schema
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](mSchema))
    writer.setMeta("partition-spec", "[]")
    writer.setMeta("partition-spec-id", "0")
    writer.setMeta("format-version", "2")
    writer.setMeta("content", "deletes")
    writer.create(mSchema, fs.create(delManifest, true))
    try {
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", 1) // POSITION_DELETES
      df.put("file_path", fs.makeQualified(delParquet).toUri.toString)
      df.put("file_format", "PARQUET")
      df.put("partition", new GenericData.Record(dataFileSchema.getField("partition").schema))
      df.put("record_count", rows.length.toLong)
      df.put("file_size_in_bytes", fs.getFileStatus(delParquet).getLen)
      df.put("sort_order_id", 0)
      val entry = new GenericData.Record(mSchema)
      entry.put("status", 1)
      entry.put("snapshot_id", snapId)
      entry.put("sequence_number", snapId)
      entry.put("file_sequence_number", snapId)
      entry.put("data_file", df)
      writer.append(entry)
    } finally writer.close()
    // rewrite the manifest list: keep existing entries, add the delete one
    val oldList = new Path(java.net.URI.create(snap.get("manifest-list").asText))
    val existing = readAvro(fs, oldList).map { r =>
      MLEntry(new Path(java.net.URI.create(r.get("manifest_path").toString)),
        r.get("manifest_length").asInstanceOf[Long],
        r.get("content").asInstanceOf[Int],
        r.get("added_files_count").asInstanceOf[Int],
        r.get("added_rows_count").asInstanceOf[Long])
    }
    val newList = new Path(metaDir, s"snap-$snapId-mor.avro")
    writeManifestListEntries(fs, newList, snapId, snapId,
      existing :+ MLEntry(delManifest, fs.getFileStatus(delManifest).getLen, 1,
        1, rows.length.toLong))
    snap.put("manifest-list", fs.makeQualified(newList).toUri.toString)
    val version = nextMetadataVersion(fs, metaDir)
    writeBytes(fs, new Path(metaDir, s"v$version.metadata.json"),
      om.writerWithDefaultPrettyPrinter.writeValueAsBytes(md))
    writeBytes(fs, new Path(metaDir, "version-hint.text"),
      version.toString.getBytes(UTF_8))
    new Path(metaDir, s"v$version.metadata.json")
  }

  /** expire_snapshots: drop snapshots not in `liveIds` from the metadata
    * tree — their manifest lists and manifests are deleted, a new
    * metadata.json version is written, and the version-hint advances.
    * `liveIds` is AUTHORITATIVE: a current snapshot whose data files were
    * expired is dropped too, and the newest surviving snapshot becomes
    * current (metadata must never reference deleted data). If nothing
    * survives, the whole metadata tree is removed. Mirrors Iceberg's
    * maintenance op; data-file deletion is the Store's job. Returns the
    * dropped snapshot ids. */
  def expireSnapshots(tableDir: Path, liveIds: Set[Long],
      conf: Configuration = new Configuration()): Seq[Long] = {
    val fs = fsOf(tableDir, conf)
    val mdPath = currentMetadataFile(tableDir, conf).getOrElse(return Nil)
    val mapper = om
    val md = mapper.readTree(readBytes(fs, mdPath)).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snaps = md.get("snapshots").elements.asScala.toVector
    val (keep, drop) = snaps.partition(s => liveIds.contains(s.get("snapshot-id").asLong))
    if (drop.isEmpty) return Nil
    drop.foreach { s =>
      val listPath = new Path(java.net.URI.create(s.get("manifest-list").asText))
      if (fs.exists(listPath)) {
        readAvro(fs, listPath).foreach { mf =>
          val mp = new Path(java.net.URI.create(mf.get("manifest_path").toString))
          // a manifest may be re-referenced by a kept snapshot's list; check
          val reReferenced = keep.exists { k =>
            val kl = new Path(java.net.URI.create(k.get("manifest-list").asText))
            fs.exists(kl) && readAvro(fs, kl).exists(
              _.get("manifest_path").toString == mf.get("manifest_path").toString)
          }
          if (!reReferenced && fs.exists(mp)) fs.delete(mp, false)
        }
        fs.delete(listPath, false)
      }
    }
    val dropped = drop.map(_.get("snapshot-id").asLong)
    val metaDir = new Path(tableDir, "metadata")
    if (keep.isEmpty) {
      // no surviving snapshot: remove the whole metadata tree rather than
      // publish metadata that references deleted data
      fs.delete(metaDir, true)
      return dropped
    }
    val newCurrent = keep.map(_.get("snapshot-id").asLong).max
    md.put("current-snapshot-id", newCurrent)
    md.putObject("refs").putObject("main")
      .put("snapshot-id", newCurrent).put("type", "branch")
    val newSnaps = md.putArray("snapshots")
    keep.foreach(newSnaps.add)
    val oldLog = md.get("snapshot-log").elements.asScala.toVector
    val newLog = md.putArray("snapshot-log")
    oldLog.filterNot(e => dropped.contains(e.get("snapshot-id").asLong)).foreach(newLog.add)
    val version = nextMetadataVersion(fs, metaDir)
    writeBytes(fs, new Path(metaDir, s"v$version.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter.writeValueAsBytes(md))
    writeBytes(fs, new Path(metaDir, "version-hint.text"),
      version.toString.getBytes(UTF_8))
    dropped
  }

  // ---- read path (plan a scan purely from metadata) ----------------------

  /** One manifest entry as planned from metadata (no data-file access). */
  case class PlannedFile(path: String, recordCount: Long, fileSize: Long,
      lowerBounds: Map[Int, Array[Byte]], upperBounds: Map[Int, Array[Byte]],
      partition: Map[String, Any],
      // v2 merge-on-read: 0 = data, 1 = position deletes, 2 = equality
      // deletes (equalityIds = the key columns' schema field ids)
      content: Int = 0, equalityIds: Seq[Int] = Nil)

  private def readAvro(fs: FileSystem, path: Path): Seq[GenericRecord] = {
    // manifests are small (KBs); buffer once, seek in memory
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(readBytes(fs, path)),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator.asScala.toVector finally reader.close()
  }

  private def bytesMap(v: Any): Map[Int, Array[Byte]] = v match {
    case null => Map.empty
    case l: java.util.List[_] => l.asScala.map { e =>
      val r = e.asInstanceOf[GenericRecord]
      val bb = r.get("value").asInstanceOf[ByteBuffer]
      val arr = new Array[Byte](bb.remaining)
      bb.duplicate.get(arr)
      r.get("key").asInstanceOf[Int] -> arr
    }.toMap
    case _ => Map.empty
  }

  /** All live data files of a snapshot (default: current), planned by
    * walking metadata.json → manifest list → manifests. */
  def planFiles(tableDir: Path, snapshotId: Option[Long] = None,
      conf: Configuration = new Configuration()): Seq[PlannedFile] =
    planFilesAt(currentMetadataFile(tableDir, conf)
        .getOrElse(throw new IllegalStateException(s"no iceberg metadata under $tableDir")),
      snapshotId, conf)

  /** Plan from an EXPLICIT metadata.json location — the entry point a
    * catalog (e.g. the reference's `iceberg_tables.metadata_location`
    * column) hands us, bypassing version-hint resolution. */
  def planFilesAt(mdPath: Path, snapshotId: Option[Long] = None,
      conf: Configuration = new Configuration()): Seq[PlannedFile] =
    planScanAt(mdPath, snapshotId, conf)._1

  /** Plan data AND position-delete files (v2 merge-on-read): entries with
    * data_file.content = 1 are delete parquets of (file_path, pos) rows the
    * reader must anti-join away. */
  def planScanAt(mdPath: Path, snapshotId: Option[Long] = None,
      conf: Configuration = new Configuration()): (Seq[PlannedFile], Seq[PlannedFile]) = {
    val fs = fsOf(mdPath, conf)
    val md = om.readTree(readBytes(fs, mdPath))
    val wanted = snapshotId.getOrElse(md.get("current-snapshot-id").asLong)
    val snap = md.get("snapshots").elements.asScala
      .find(_.get("snapshot-id").asLong == wanted)
      .getOrElse(throw new IllegalArgumentException(s"snapshot $wanted not found"))
    val listPath = new Path(java.net.URI.create(snap.get("manifest-list").asText))
    val all = readAvro(fs, listPath).flatMap { mf =>
      val manifestPath = new Path(java.net.URI.create(mf.get("manifest_path").toString))
      readAvro(fs, manifestPath).collect {
        case entry if entry.get("status").asInstanceOf[Int] != 2 => // not DELETED
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          // our emitter writes the spec's record-typed partition tuple; the
          // reference's Go emitter declares it as map<string, string?>
          // (storage_utils.go MANIFEST_SCHEMA) — accept either
          def cleanse(v: Any): Any = v match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case other => other
          }
          val part: Map[String, Any] = df.get("partition") match {
            case pRec: GenericRecord =>
              pRec.getSchema.getFields.asScala.map(f =>
                f.name -> cleanse(pRec.get(f.name))).toMap
            case m: java.util.Map[_, _] =>
              m.asScala.map { case (k, v) => k.toString -> cleanse(v) }.toMap
            case _ => Map.empty
          }
          val content = df.getSchema.getField("content") match {
            case null => 0
            case _ => Option(df.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
          }
          val eqIds = df.getSchema.getField("equality_ids") match {
            case null => Nil
            case _ => Option(df.get("equality_ids"))
              .map(_.asInstanceOf[java.util.List[_]].asScala.toSeq
                .map(_.asInstanceOf[Int])).getOrElse(Nil)
          }
          PlannedFile(
            new Path(java.net.URI.create(df.get("file_path").toString)).toString,
            df.get("record_count").asInstanceOf[Long],
            df.get("file_size_in_bytes").asInstanceOf[Long],
            bytesMap(df.get("lower_bounds")),
            bytesMap(df.get("upper_bounds")),
            part, content, eqIds)
      }
    }
    (all.filter(_.content == 0), all.filter(_.content != 0))
  }

  /** Attach EQUALITY deletes to the current snapshot — the v2 delete
    * flavor keyed by column VALUES (content=2): any data row matching a
    * delete-file row on the equality columns is removed at read time. The
    * CDC-sink shape: a stream of deleted keys lands as a small parquet of
    * key values, no positions needed, no data read at delete time at all
    * (position deletes still need the writer to know file/row). */
  def attachEqualityDeletes(spark: SparkSession, tableDir: Path,
      schema: StructType, keys: DataFrame): Path = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = fsOf(tableDir, conf)
    val mdPath = currentMetadataFile(tableDir, conf)
      .getOrElse(throw new IllegalStateException(s"no iceberg metadata under $tableDir"))
    val md = om.readTree(readBytes(fs, mdPath)).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snapId = md.get("current-snapshot-id").asLong
    val snap = md.get("snapshots").elements.asScala
      .find(_.get("snapshot-id").asLong == snapId).get
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val metaDir = new Path(tableDir, "metadata")
    val eqIds = keys.columns.toSeq.map(c => schema.fieldIndex(c) + 1)
    val delDir = new Path(metaDir, s"eqdelete-$snapId-${System.nanoTime}")
    val n = keys.count()
    keys.coalesce(1).write.mode("overwrite").parquet(delDir.toString)
    val delParquet = fs.listStatus(delDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val delManifest = new Path(metaDir, s"snap-$snapId-eqdeletes-manifest.avro")
    val mSchema = manifestSchema(Nil)
    val dataFileSchema = mSchema.getField("data_file").schema
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](mSchema))
    writer.setMeta("partition-spec", "[]")
    writer.setMeta("partition-spec-id", "0")
    writer.setMeta("format-version", "2")
    writer.setMeta("content", "deletes")
    writer.create(mSchema, fs.create(delManifest, true))
    try {
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", 2) // EQUALITY_DELETES
      df.put("file_path", fs.makeQualified(delParquet).toUri.toString)
      df.put("file_format", "PARQUET")
      df.put("partition", new GenericData.Record(dataFileSchema.getField("partition").schema))
      df.put("record_count", n)
      df.put("file_size_in_bytes", fs.getFileStatus(delParquet).getLen)
      df.put("equality_ids", eqIds.map(Int.box).asJava)
      df.put("sort_order_id", 0)
      val entry = new GenericData.Record(mSchema)
      entry.put("status", 1)
      entry.put("snapshot_id", snapId)
      entry.put("sequence_number", snapId)
      entry.put("file_sequence_number", snapId)
      entry.put("data_file", df)
      writer.append(entry)
    } finally writer.close()
    val oldList = new Path(java.net.URI.create(snap.get("manifest-list").asText))
    val existing = readAvro(fs, oldList).map { r =>
      MLEntry(new Path(java.net.URI.create(r.get("manifest_path").toString)),
        r.get("manifest_length").asInstanceOf[Long],
        r.get("content").asInstanceOf[Int],
        r.get("added_files_count").asInstanceOf[Int],
        r.get("added_rows_count").asInstanceOf[Long])
    }
    val newList = new Path(metaDir, s"snap-$snapId-eqmor.avro")
    writeManifestListEntries(fs, newList, snapId, snapId,
      existing :+ MLEntry(delManifest, fs.getFileStatus(delManifest).getLen, 1, 1, n))
    snap.put("manifest-list", fs.makeQualified(newList).toUri.toString)
    val version = nextMetadataVersion(fs, metaDir)
    writeBytes(fs, new Path(metaDir, s"v$version.metadata.json"),
      om.writerWithDefaultPrettyPrinter.writeValueAsBytes(md))
    writeBytes(fs, new Path(metaDir, "version-hint.text"),
      version.toString.getBytes(UTF_8))
    new Path(metaDir, s"v$version.metadata.json")
  }

  /** Schema field id -> name, from metadata.json (reader-side; works on
    * foreign metadata too). */
  private def fieldIdToName(mdPath: Path, conf: Configuration): Map[Int, String] = {
    val fs = fsOf(mdPath, conf)
    val md = om.readTree(readBytes(fs, mdPath))
    val schemaNode = Option(md.get("current-schema-id")).map(_.asInt) match {
      case Some(id) => md.get("schemas").elements.asScala
        .find(s => Option(s.get("schema-id")).exists(_.asInt == id))
        .getOrElse(md.get("schemas").get(0))
      case None => md.get("schemas").get(0)
    }
    schemaNode.get("fields").elements.asScala
      .map(f => f.get("id").asInt -> f.get("name").asText).toMap
  }

  /** Apply position (content=1) and equality (content=2) delete files:
    * positions anti-join on Spark's `_metadata` (file path, row index);
    * equality deletes anti-join on their key columns, grouped by id set. */
  private def applyDeletes(spark: SparkSession, df: DataFrame,
      deleteFiles: Seq[PlannedFile], idToName: Map[Int, String]): DataFrame = {
    val (eq, pos) = deleteFiles.partition(_.content == 2)
    val afterPos = applyPositionDeletes(spark, df, pos)
    eq.groupBy(_.equalityIds).foldLeft(afterPos) { case (d, (ids, files)) =>
      val cols = ids.map(idToName)
      val keys = spark.read.parquet(files.map(_.path): _*)
        .select(cols.map(col): _*).distinct()
      d.join(keys, cols, "left_anti")
    }
  }

  /** Apply position-delete files to a data scan: anti-join on
    * (file path, row position) using Spark's `_metadata` file columns.
    * Paths normalize to a scheme-stripped form on both sides (writers'
    * URI spellings differ in slash count). */
  private def applyPositionDeletes(spark: SparkSession, df: DataFrame,
      deleteFiles: Seq[PlannedFile]): DataFrame = {
    if (deleteFiles.isEmpty) return df
    import org.apache.spark.sql.functions.expr
    def norm(c: String) = expr(s"regexp_replace($c, '^[a-zA-Z0-9]+:/+', '/')")
    val dels = spark.read.parquet(deleteFiles.map(_.path): _*)
      .select(norm("file_path").as("__dfp"), col("pos").as("__dpos"))
    df.withColumn("__fp", norm("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
      .join(dels, col("__fp") === col("__dfp") && col("__pos") === col("__dpos"),
        "left_anti")
      .drop("__fp", "__pos")
  }

  /** Decode an Iceberg single-value bound for a field. */
  def decodeBound(bytes: Array[Byte], dt: DataType): Any = dt match {
    case LongType => leLong(bytes)
    case IntegerType => leInt(bytes)
    case DoubleType =>
      java.lang.Double.longBitsToDouble(leLong(bytes))
    case FloatType =>
      java.lang.Float.intBitsToFloat(leInt(bytes))
    case StringType => new String(bytes, UTF_8)
    case DateType => leInt(bytes) // days since epoch
    case TimestampType | TimestampNTZType => leLong(bytes) // micros
    case other => throw new IllegalArgumentException(s"bound decode for $other")
  }

  /** Base directory of a partitioned data file: ascend past key=value
    * segments. */
  private def baseOf(p: Path): Path = {
    var d = p.getParent
    while (d != null && d.getName.contains("=")) d = d.getParent
    d
  }

  /** Read a table (or a historical snapshot) through its Iceberg metadata:
    * the file list comes from manifests, never a directory listing. A
    * partitioned snapshot reads with basePath so the identity-partition
    * columns (present in paths, not data files) are restored. */
  def readTable(spark: SparkSession, tableDir: Path,
      snapshotId: Option[Long] = None): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    readTableAt(spark, currentMetadataFile(tableDir, conf)
      .getOrElse(throw new IllegalStateException(s"no iceberg metadata under $tableDir")),
      snapshotId)
  }

  /** Read through an explicit metadata.json location (what a JDBC catalog's
    * `metadata_location` column points at). Position-delete files in the
    * snapshot (v2 merge-on-read) are applied as a (path, pos) anti-join. */
  def readTableAt(spark: SparkSession, metadataLocation: Path,
      snapshotId: Option[Long] = None): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val (data, dels) = planScanAt(metadataLocation, snapshotId, conf)
    dropHidden(applyDeletes(spark,
      readFromPlan(spark, data, metadataLocation.toString), dels,
      fieldIdToName(metadataLocation, conf)),
      partitionSpecAt(metadataLocation, conf))
  }

  private def readFromPlan(spark: SparkSession, files: Seq[PlannedFile],
      what: String): DataFrame = {
    if (files.isEmpty) throw new IllegalStateException(s"empty snapshot in $what")
    if (files.head.partition.isEmpty) spark.read.parquet(files.map(_.path): _*)
    else spark.read.option("basePath", baseOf(new Path(files.head.path)).toString)
      .parquet(files.map(_.path): _*)
  }

  /** (data files, delete files, id->name) for a table's current snapshot —
    * what every pruned reader needs to stay merge-on-read-correct. */
  private def planForPruning(spark: SparkSession, tableDir: Path)
      : (Seq[PlannedFile], Seq[PlannedFile], Map[Int, String]) = {
    val conf = spark.sessionState.newHadoopConf()
    val mdPath = currentMetadataFile(tableDir, conf)
      .getOrElse(throw new IllegalStateException(s"no iceberg metadata under $tableDir"))
    val (data, dels) = planScanAt(mdPath, None, conf)
    (data, dels, if (dels.exists(_.content == 2)) fieldIdToName(mdPath, conf)
                 else Map.empty)
  }

  /** Partition-pruned read: keep only files whose manifest partition value
    * for `col` equals `value` — O(manifest entries) planning, then a
    * basePath read of just those files. Position/equality deletes apply
    * like any other read. */
  def readPartitionPruned(spark: SparkSession, tableDir: Path,
      col: String, value: Any): (DataFrame, Int, Int) = {
    val (files, dels, idToName) = planForPruning(spark, tableDir)
    if (files.isEmpty) throw new IllegalStateException(s"empty snapshot in $tableDir")
    val hit = files.filter(_.partition.get(col).contains(value))
    val df =
      if (hit.isEmpty)
        readTable(spark, tableDir).limit(0)
      else applyDeletes(spark,
        spark.read.option("basePath", baseOf(new Path(hit.head.path)).toString)
          .parquet(hit.map(_.path): _*), dels, idToName)
    (df, hit.length, files.length)
  }

  /** Manifest-pruned range scan: keep only files whose [lower, upper] bound
    * for `column` intersects [lo, hi] — planning cost is O(manifest
    * entries), zero parquet footers touched. Returns (df, filesScanned,
    * filesTotal) like Store.readRange. */
  def readRangePruned(spark: SparkSession, tableDir: Path, schema: StructType,
      column: String, lo: Any, hi: Any): (DataFrame, Int, Int) = {
    val fid = schema.fieldIndex(column) + 1
    val dt = schema(column).dataType
    val (files, dels, idToName) = planForPruning(spark, tableDir)
    def cmp(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    val hit = files.filter { f =>
      (f.lowerBounds.get(fid), f.upperBounds.get(fid)) match {
        case (Some(l), Some(u)) =>
          cmp(decodeBound(l, dt), hi) <= 0 && cmp(decodeBound(u, dt), lo) >= 0
        case _ => true // no bounds recorded: must scan
      }
    }
    if (files.isEmpty) throw new IllegalStateException(s"empty snapshot in $tableDir")
    import org.apache.spark.sql.functions.{col, lit}
    // mirror readTable: identity-partition columns live in paths, not data
    // files, so a partitioned snapshot must read with basePath or the range
    // column could be silently absent
    def readFiles(fs: Seq[PlannedFile]): DataFrame =
      if (fs.head.partition.isEmpty) spark.read.parquet(fs.map(_.path): _*)
      else spark.read.option("basePath", baseOf(new Path(fs.head.path)).toString)
        .parquet(fs.map(_.path): _*)
    val df =
      if (hit.isEmpty) readFiles(Seq(files.head)).limit(0)
      else applyDeletes(spark, readFiles(hit), dels, idToName)
    (df.filter(col(column) >= lit(lo) && col(column) <= lit(hi)),
      hit.length, files.length)
  }

  // ---- hidden partitioning (transform-aware planning) --------------------

  private def icebergTypeToSpark(t: com.fasterxml.jackson.databind.JsonNode): DataType =
    t.asText match {
      case "int" => IntegerType
      case "long" => LongType
      case "string" => StringType
      case "date" => DateType
      case "timestamp" | "timestamptz" => TimestampType
      case "double" => DoubleType
      case "float" => FloatType
      case "boolean" => org.apache.spark.sql.types.BooleanType
      case _ => StringType
    }

  /** The current partition spec, read back from metadata.json (the reader
    * side never assumes it wrote the table — foreign metadata works too). */
  def partitionSpecAt(mdPath: Path,
      conf: Configuration = new Configuration()): Seq[SpecField] = {
    val fs = fsOf(mdPath, conf)
    val md = om.readTree(readBytes(fs, mdPath))
    val schemaNode = Option(md.get("current-schema-id")).map(_.asInt) match {
      case Some(id) => md.get("schemas").elements.asScala
        .find(s => Option(s.get("schema-id")).exists(_.asInt == id))
        .getOrElse(md.get("schemas").get(0))
      case None => md.get("schemas").get(0)
    }
    val idToField = schemaNode.get("fields").elements.asScala
      .map(f => f.get("id").asInt -> (f.get("name").asText, f.get("type"))).toMap
    val specId = Option(md.get("default-spec-id")).map(_.asInt).getOrElse(0)
    md.get("partition-specs").elements.asScala
      .find(_.get("spec-id").asInt == specId)
      .map(_.get("fields").elements.asScala.map { f =>
        val (srcName, srcType) = idToField(f.get("source-id").asInt)
        SpecField(f.get("name").asText, f.get("transform").asText, srcName,
          icebergTypeToSpark(srcType))
      }.toSeq).getOrElse(Nil)
  }

  def partitionSpec(tableDir: Path,
      conf: Configuration = new Configuration()): Seq[SpecField] =
    currentMetadataFile(tableDir, conf)
      .map(partitionSpecAt(_, conf)).getOrElse(Nil)

  private def pvCompare(a: Any, b: Any): Int = (a, b) match {
    case (x: Number, y: Number) => java.lang.Long.compare(x.longValue, y.longValue)
    case _ => String.valueOf(a).compareTo(String.valueOf(b))
  }

  /** Drop hidden-partition columns (transform-derived hive dirs surface as
    * extra columns under a basePath read) so results keep the logical
    * schema. */
  private def dropHidden(df: DataFrame, spec: Seq[SpecField]): DataFrame = {
    val hidden = spec.filter(_.transform != "identity").map(_.name)
    if (hidden.isEmpty) df else df.drop(hidden: _*)
  }

  /** Transform-partition-pruned reads over a hidden-partitioned table: the
    * caller predicates on the SOURCE column; planning maps it through the
    * spec's transform and keeps only manifest entries whose partition value
    * matches — the Iceberg "hidden partitioning" contract, where queries
    * never mention the derived field. Equality works for any transform
    * (incl. bucket); range needs a monotone one. Residual filters re-apply
    * the exact predicate. Returns (df, filesScanned, filesTotal). */
  def readTransformEqPruned(spark: SparkSession, tableDir: Path,
      sourceCol: String, value: Any): (DataFrame, Int, Int) =
    transformPruned(spark, tableDir, sourceCol, requireMonotone = false) {
      (sf, pv) => pvCompare(pv, transformValue(sf.transform, value, sf.sourceType)) == 0
    }.map3(_.filter(col(sourceCol) === lit(value)))

  def readTransformRangePruned(spark: SparkSession, tableDir: Path,
      sourceCol: String, lo: Any, hi: Any): (DataFrame, Int, Int) =
    transformPruned(spark, tableDir, sourceCol, requireMonotone = true) {
      (sf, pv) =>
        pvCompare(pv, transformValue(sf.transform, lo, sf.sourceType)) >= 0 &&
        pvCompare(pv, transformValue(sf.transform, hi, sf.sourceType)) <= 0
    }.map3(_.filter(col(sourceCol) >= lit(lo) && col(sourceCol) <= lit(hi)))

  private implicit class Map3(t: (DataFrame, Int, Int)) {
    def map3(f: DataFrame => DataFrame): (DataFrame, Int, Int) =
      (f(t._1), t._2, t._3)
  }

  private def transformPruned(spark: SparkSession, tableDir: Path,
      sourceCol: String, requireMonotone: Boolean)(
      keep: (SpecField, Any) => Boolean): (DataFrame, Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val spec = partitionSpec(tableDir, conf)
    val sf = spec.find(s => s.sourceCol == sourceCol &&
        (!requireMonotone || transformMonotone(s.transform)))
      .getOrElse(throw new IllegalArgumentException(
        s"no usable partition transform over $sourceCol in $tableDir"))
    val (files, dels, idToName) = planForPruning(spark, tableDir)
    if (files.isEmpty) throw new IllegalStateException(s"empty snapshot in $tableDir")
    val hit = files.filter(f =>
      f.partition.get(sf.name).forall(pv => pv == null || keep(sf, pv)))
    def readFiles(fs: Seq[PlannedFile]): DataFrame =
      if (fs.head.partition.isEmpty) spark.read.parquet(fs.map(_.path): _*)
      else spark.read.option("basePath", baseOf(new Path(fs.head.path)).toString)
        .parquet(fs.map(_.path): _*)
    val df = dropHidden(
      if (hit.isEmpty) readFiles(Seq(files.head)).limit(0)
      else applyDeletes(spark, readFiles(hit), dels, idToName),
      spec)
    (df, hit.length, files.length)
  }
}
