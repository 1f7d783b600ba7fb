package graft

import org.apache.spark.sql.functions._

class SyncSpec extends SparkSpecBase {

  test("pg type mapping follows the reference's table (SURVEY 1.4)") {
    import org.apache.spark.sql.types._
    def dt(pg: String, p: Int = 0, s: Int = 0) = PgTypes.toSpark(pg, p, s).dataType
    assert(dt("bool") == BooleanType)
    assert(dt("int4") == IntegerType)
    assert(dt("xid") == LongType)
    assert(dt("int8") == DecimalType(38, 0))   // unsigned-range safety
    assert(dt("interval") == DecimalType(38, 6))
    assert(dt("float4") == FloatType && dt("float8") == DoubleType)
    assert(dt("numeric", 10, 2) == DecimalType(10, 2))
    assert(dt("numeric", 99, 2) == DecimalType(38, 6))  // clamp like reference
    assert(dt("numeric") == DecimalType(38, 6))
    assert(dt("timestamp") == TimestampNTZType && dt("timestamptz") == TimestampType)
    assert(dt("jsonb") == StringType && dt("uuid") == StringType)
    assert(dt("bytea") == BinaryType)
    assert(dt("_int4") == ArrayType(IntegerType)) // PG arrays: single-level list
    assert(dt("custom_enum") == StringType)
    assert(PgTypes.toSpark("jsonb").metadata.getString(PgTypes.LogicalKey) == "jsonb")
  }

  private def freshStore(): Store =
    new Store(spark, java.nio.file.Files.createTempDirectory("graft-sync").toString)

  test("full refresh replicates all source tables, honoring filters") {
    val st = freshStore()
    val src = new ParquetDirSource(spark, sfDir)
    val synced = new Syncer(st, src, include = Seq("region", "nation")).fullRefresh()
    assert(synced == Seq("nation", "region"))
    assert(st.read("nation").count() == 25)
    assert(st.read("region").count() == 5)

    val excluded = new Syncer(st, src, exclude = Seq("lineitem", "events", "orders",
      "customer", "supplier", "part", "documents", "embeddings")).tables()
    assert(excluded == Seq("nation", "region"))
  }

  test("incremental sync converges to the full table across batches") {
    val st = freshStore()
    val src = new ParquetDirSource(spark, sfDir,
      keys = Map("events" -> "event_id"), cursors = Map("events" -> "ts"))
    val full = src.read("events")

    // batch 1: seed with the earlier half only (ts is raw long nanos here)
    val cutoff = full.agg(expr("percentile_approx(cast(ts as double), 0.5)")).collect()(0).getDouble(0)
    st.replace("events", src.read("events")
      .filter(col("ts").cast("double") < cutoff))
    val before = st.read("events").count()
    assert(before > 0 && before < full.count())

    // batch 2: re-deliver everything; cursor + key dedup must converge
    new Syncer(st, src).incrementalSync("events")
    assert(st.read("events").count() == full.count())
    // no duplicates
    assert(st.read("events").select("event_id").distinct().count() == full.count())
  }

  test("incremental sync without key or cursor errors like the reference") {
    val st = freshStore()
    val src = new ParquetDirSource(spark, sfDir)
    val e = intercept[IllegalArgumentException] {
      new Syncer(st, src).incrementalSync("events")
    }
    assert(e.getMessage.contains("cursor"))
  }

  test("first incremental sync of a missing table is a full refresh") {
    val st = freshStore()
    val src = new ParquetDirSource(spark, sfDir,
      keys = Map("events" -> "event_id"), cursors = Map("events" -> "ts"))
    new Syncer(st, src).incrementalSync("events")
    assert(st.read("events").count() == src.read("events").count())
  }
}
