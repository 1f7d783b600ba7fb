package graft

import org.apache.spark.sql.types._

/** PG type name -> Spark type mapping for the sync path — SURVEY §1.4's
  * load-bearing table (reference:
  * /root/reference/src/syncer-postgres/lib/pg_schema_column.go:49-99 and
  * iceberg_schema_column.go:118-130). Deliberate reference choices kept:
  * int8/xid8 widen to DECIMAL(38,0) for unsigned-range safety, numeric with
  * invalid/overflow precision clamps to DECIMAL(38,6), interval is stored as
  * microseconds (DECIMAL(38,6) + logical metadata), json/bpchar/point and
  * every textual/geometric/network type map to STRING.
  */
object PgTypes {

  /** Metadata key carrying the PG logical type end-to-end (wire OIDs,
    * interval rendering). */
  val LogicalKey = "pg_logical"

  /** Metadata key pinning an exact RowDescription type OID for a column —
    * used by pg_catalog relations whose reference wire types differ from
    * what their Spark storage type would imply (e.g. `oid` columns report
    * 26, pg_description.classoid reports text). */
  val OidKey = "pg_wire_oid"

  def toSpark(pgType: String, precision: Int = 0, scale: Int = 0): StructField = {
    val base = pgType.toLowerCase.stripPrefix("_")
    val (dt, logical) = base match {
      case "bool" | "boolean" => (BooleanType, "bool")
      case "bit" | "int2" | "int4" | "smallint" | "integer" | "int" => (IntegerType, base)
      case "xid" => (LongType, "xid")
      case "int8" | "bigint" | "xid8" => (DecimalType(38, 0), base) // unsigned-range safe
      case "interval" => (DecimalType(38, 6), "interval") // micros
      case "float4" | "real" => (FloatType, base)
      case "float8" | "double precision" => (DoubleType, base)
      case "numeric" | "decimal" =>
        if (precision <= 0 || precision > 38) (DecimalType(38, 6), "numeric")
        else (DecimalType(precision, math.min(scale max 0, precision)), "numeric")
      case "date" => (DateType, "date")
      case "time" | "timetz" => (LongType, base) // micros-of-day + logical tag
      case "timestamp" => (TimestampNTZType, "timestamp")
      case "timestamptz" => (TimestampType, "timestamptz")
      case "json" | "jsonb" => (StringType, base)
      case "bpchar" => (StringType, "bpchar") // values right-trimmed on ingest
      case "point" => (StringType, "point")
      case "bytea" => (BinaryType, "bytea")
      case "varchar" | "char" | "text" | "uuid" | "name" | "line" | "lseg" | "box" |
           "path" | "polygon" | "circle" | "cidr" | "inet" | "macaddr" | "macaddr8" |
           "ltree" | "tsvector" | "xml" | "pg_snapshot" => (StringType, base)
      case other => (StringType, s"user_defined:$other")
    }
    val field = StructField(base, dt, nullable = true,
      new MetadataBuilder().putString(LogicalKey, logical).build())
    // PG array types arrive prefixed with '_' -> single-level list
    if (pgType.startsWith("_")) field.copy(dataType = ArrayType(dt)) else field
  }
}
