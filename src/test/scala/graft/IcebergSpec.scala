package graft

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Iceberg v2 metadata layer: spec conformance of the written tree
  * (metadata.json / manifest list / manifest), stats fidelity vs the data,
  * snapshot history, and metadata-planned (pruned) reads.
  * Reference behavior: /root/reference/src/common/storage_utils.go:162-494. */
class IcebergSpec extends SparkSpecBase {

  private def freshStore(): (Store, Path) = {
    val dir = Files.createTempDirectory("graft-iceberg")
    (new Store(spark, dir.toString), dir)
  }

  /** Iceberg's API takes Hadoop paths (any fs.* scheme); tests live on a
    * local temp dir, so bridge from nio. */
  private def hp(p: Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(p.toUri)

  private def mdJson(tdir: Path): com.fasterxml.jackson.databind.JsonNode = {
    val md = Iceberg.currentMetadataFile(hp(tdir)).get
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(Paths.get(md.toUri)))
  }

  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate", "l_returnflag")

  private def avroRecords(p: Path): Seq[GenericRecord] = {
    val r = new DataFileReader[GenericRecord](p.toFile,
      new GenericDatumReader[GenericRecord]())
    try r.iterator.asScala.toVector finally r.close()
  }

  test("iceberg round-trip: metadata-planned read equals direct read") {
    val (store, dir) = freshStore()
    store.replace("li", lineitem)
    val md = store.publishIceberg("li")
    assert(Files.exists(Paths.get(md.toUri)))
    val back = store.readIceberg("li")
    assert(back.count() == lineitem.count())
    assert(back.except(lineitem).count() == 0)
    assert(lineitem.except(back).count() == 0)
  }

  test("metadata.json carries the required v2 fields and a field-id schema") {
    val (store, dir) = freshStore()
    store.replace("li", lineitem)
    store.publishIceberg("li")
    val md = mdJson(dir.resolve("li"))
    assert(md.get("format-version").asInt == 2)
    for (k <- Seq("table-uuid", "location", "last-sequence-number", "last-column-id",
        "schemas", "current-schema-id", "partition-specs", "default-spec-id",
        "sort-orders", "default-sort-order-id", "current-snapshot-id",
        "snapshots", "snapshot-log", "refs"))
      assert(md.has(k), s"missing $k")
    val fields = md.get("schemas").get(0).get("fields").elements.asScala.toSeq
    assert(fields.map(_.get("id").asInt) == (1 to 5))
    assert(fields.map(_.get("name").asText) ==
      Seq("l_orderkey", "l_partkey", "l_quantity", "l_shipdate", "l_returnflag"))
    assert(md.get("refs").get("main").get("snapshot-id").asLong ==
      md.get("current-snapshot-id").asLong)
  }

  test("manifest stats match the data: record counts, null counts, bounds") {
    val (store, dir) = freshStore()
    store.replace("li", lineitem)
    store.publishIceberg("li")
    val planned = Iceberg.planFiles(hp(dir.resolve("li")))
    assert(planned.nonEmpty)
    assert(planned.map(_.recordCount).sum == lineitem.count())
    // decoded l_orderkey (field 1, long) bounds across files == table min/max
    val schema = lineitem.schema
    val lows = planned.flatMap(_.lowerBounds.get(1))
      .map(Iceberg.decodeBound(_, schema("l_orderkey").dataType).asInstanceOf[Long])
    val highs = planned.flatMap(_.upperBounds.get(1))
      .map(Iceberg.decodeBound(_, schema("l_orderkey").dataType).asInstanceOf[Long])
    val Array(mn, mx) = lineitem.agg(min("l_orderkey"), max("l_orderkey"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    assert(lows.min == mn)
    assert(highs.max == mx)
    // string bounds decode for l_comment (field 5)
    val sLow = planned.flatMap(_.lowerBounds.get(5))
      .map(Iceberg.decodeBound(_, org.apache.spark.sql.types.StringType).asInstanceOf[String])
    val minFlag = lineitem.agg(min("l_returnflag")).collect()(0).getString(0)
    assert(sLow.min == minFlag)
  }

  test("manifest avro carries the iceberg schema + v2 markers in its metadata") {
    val (store, dir) = freshStore()
    store.replace("li", lineitem)
    store.publishIceberg("li")
    val metaDir = dir.resolve("li").resolve("metadata")
    val manifest = Files.list(metaDir).iterator().asScala
      .find(_.getFileName.toString.endsWith("-manifest.avro")).get
    val r = new DataFileReader[GenericRecord](manifest.toFile,
      new GenericDatumReader[GenericRecord]())
    try {
      assert(r.getMetaString("format-version") == "2")
      assert(r.getMetaString("content") == "data")
      assert(r.getMetaString("partition-spec") == "[]")
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val sch = om.readTree(r.getMetaString("schema"))
      assert(sch.get("type").asText == "struct")
      val entries = r.iterator.asScala.toVector
      assert(entries.forall(_.get("status").asInstanceOf[Int] == 1)) // ADDED
      val df0 = entries.head.get("data_file").asInstanceOf[GenericRecord]
      assert(df0.get("file_format").toString == "PARQUET")
      assert(df0.get("content").asInstanceOf[Int] == 0)
    } finally r.close()
  }

  test("snapshots accumulate with parent links; time travel reads history") {
    val (store, dir) = freshStore()
    val v1 = lineitem.filter(col("l_orderkey") <= 1000)
    store.replace("li", v1)
    store.publishIceberg("li")
    store.replace("li", lineitem)
    store.publishIceberg("li")
    val md = mdJson(dir.resolve("li"))
    val snaps = md.get("snapshots").elements.asScala.toSeq
    assert(snaps.size == 2)
    assert(!snaps(0).has("parent-snapshot-id"))
    assert(snaps(1).get("parent-snapshot-id").asLong ==
      snaps(0).get("snapshot-id").asLong)
    assert(md.get("current-snapshot-id").asLong == snaps(1).get("snapshot-id").asLong)
    // read snapshot 1 through metadata: the pre-replace content
    val old = store.readIceberg("li", Some(snaps(0).get("snapshot-id").asLong))
    assert(old.count() == v1.count())
    assert(old.except(v1).count() == 0)
    // version-hint advanced to the second metadata file
    val hint = new String(Files.readAllBytes(
      dir.resolve("li").resolve("metadata").resolve("version-hint.text"))).trim
    assert(hint == "2")
  }

  test("upsert then publish: next snapshot reflects the merge, history intact") {
    val (store, dir) = freshStore()
    store.replaceSorted("li", lineitem, "l_orderkey", numFiles = 4)
    store.publishIceberg("li")
    val patch = lineitem.filter(col("l_orderkey") <= 50)
      .withColumn("l_quantity", lit(999.0))
    store.upsert("li", patch, "l_orderkey")
    store.publishIceberg("li")
    val now = store.readIceberg("li")
    val expect = lineitem.join(patch.select("l_orderkey").distinct,
      Seq("l_orderkey"), "left_anti").unionByName(patch)
    assert(now.count() == expect.count())
    assert(now.except(expect).count() == 0)
    // snapshot 1 still reads the pre-upsert content through metadata
    val before = store.readIceberg("li", Some(1L))
    assert(before.except(lineitem).count() == 0)
    assert(lineitem.except(before).count() == 0)
  }

  test("expireVersions expires iceberg snapshots and deletes their manifests") {
    val (store, dir) = freshStore()
    for (cut <- Seq(500, 1000, 2000)) {
      store.replace("li", lineitem.filter(col("l_orderkey") <= cut))
      store.publishIceberg("li")
    }
    val metaDir = dir.resolve("li").resolve("metadata")
    assert(Files.list(metaDir).iterator().asScala
      .count(_.getFileName.toString.endsWith("-manifest.avro")) == 3)
    val expired = store.expireVersions("li", keep = 2)
    assert(expired == Seq(1))
    val md = mdJson(dir.resolve("li"))
    val ids = md.get("snapshots").elements.asScala.map(_.get("snapshot-id").asLong).toSeq
    assert(ids == Seq(2L, 3L))
    // expired snapshot's manifest files are gone; kept ones remain readable
    assert(!Files.exists(metaDir.resolve("snap-1-manifest.avro")))
    assert(!Files.exists(metaDir.resolve("snap-1.avro")))
    assert(store.readIceberg("li").count() ==
      lineitem.filter(col("l_orderkey") <= 2000).count())
    assert(store.readIceberg("li", Some(2L)).count() ==
      lineitem.filter(col("l_orderkey") <= 1000).count())
    intercept[IllegalArgumentException] {
      Iceberg.planFiles(hp(dir.resolve("li")), Some(1L))
    }
  }

  test("identity-partitioned tables publish and read back through metadata") {
    import spark.implicits._
    val (store, dir) = freshStore()
    val df = (1L to 300L).map(i => (i, s"r$i", "p" + (i % 3))).toDF("id", "v", "part")
    store.replacePartitioned("pt", df, "part")
    store.publishIceberg("pt")
    // metadata carries an identity partition spec
    val md = mdJson(dir.resolve("pt"))
    val spec = md.get("partition-specs").get(0).get("fields")
    assert(spec.size == 1)
    assert(spec.get(0).get("name").asText == "part")
    assert(spec.get(0).get("transform").asText == "identity")
    // manifest entries carry the typed partition value
    val planned = Iceberg.planFiles(hp(dir.resolve("pt")))
    assert(planned.forall(_.partition.keySet == Set("part")))
    assert(planned.map(_.partition("part")).toSet == Set("p0", "p1", "p2"))
    // metadata-planned read restores the partition column
    val back = store.readIceberg("pt")
    assert(back.columns.contains("part"))
    assert(back.count() == 300)
    assert(back.select("id", "v", "part").except(df).count() == 0)
    // partition-pruned read touches only that partition's files
    val (one, hit, total) = Iceberg.readPartitionPruned(
      spark, hp(dir.resolve("pt")), "part", "p1")
    assert(hit < total)
    assert(one.count() == df.filter(col("part") === "p1").count())
  }

  test("negative float/double bounds order correctly (typed compare)") {
    import spark.implicits._
    val (store, dir) = freshStore()
    val df = Seq((-5.0, 1L), (-1.0, 2L), (3.5, 3L), (-2.25, 4L))
      .toDF("x", "id")
    store.replace("neg", df.repartition(1))
    store.publishIceberg("neg")
    val planned = Iceberg.planFiles(hp(dir.resolve("neg")))
    val lows = planned.flatMap(_.lowerBounds.get(1))
      .map(Iceberg.decodeBound(_, org.apache.spark.sql.types.DoubleType).asInstanceOf[Double])
    val highs = planned.flatMap(_.upperBounds.get(1))
      .map(Iceberg.decodeBound(_, org.apache.spark.sql.types.DoubleType).asInstanceOf[Double])
    assert(lows.min == -5.0, s"lower bound must be the true min, got ${lows.min}")
    assert(highs.max == 3.5)
    // a range over the negatives must NOT be pruned away
    val (d2, scanned, _) = Iceberg.readRangePruned(spark, hp(dir.resolve("neg")),
      df.schema, "x", -6.0, -4.0)
    assert(scanned == planned.size)
    assert(d2.count() == 1)
  }

  test("re-publishing the same version is idempotent (no duplicate snapshots)") {
    val (store, dir) = freshStore()
    store.replace("li", lineitem)
    store.publishIceberg("li")
    store.publishIceberg("li") // retried sync
    val md = mdJson(dir.resolve("li"))
    val snaps = md.get("snapshots").elements.asScala.toSeq
    assert(snaps.size == 1)
    assert(!snaps.head.has("parent-snapshot-id"))
    assert(store.readIceberg("li").count() == lineitem.count())
  }

  test("expiring the published version removes stale metadata entirely") {
    val (store, dir) = freshStore()
    store.replace("li", lineitem.limit(100))
    store.publishIceberg("li") // snapshot 1 only
    store.replace("li", lineitem.limit(200))
    store.replace("li", lineitem.limit(300))
    store.replace("li", lineitem.limit(400))
    store.expireVersions("li", keep = 2) // v1, v2 deleted; snapshot 1 now dangling
    // metadata must not reference deleted data: the whole tree is gone
    assert(Iceberg.currentMetadataFile(hp(dir.resolve("li"))).isEmpty)
    // and the store itself still serves the current version
    assert(store.read("li").count() == 400)
  }

  test("same-named partition columns of different types don't share a schema") {
    import spark.implicits._
    val (store, dir) = freshStore()
    // two tables, both identity-partitioned on "part" — string vs long; a
    // name-only manifest-schema cache would reuse the first Avro schema and
    // the second publish would fail (or mis-type the partition value)
    val a = (1L to 60L).map(i => (i, "p" + (i % 2))).toDF("id", "part")
    val b = (1L to 60L).map(i => (i, i % 2)).toDF("id", "part")
    store.replacePartitioned("pa", a, "part")
    store.replacePartitioned("pb", b, "part")
    store.publishIceberg("pa")
    store.publishIceberg("pb")
    assert(Iceberg.planFiles(hp(dir.resolve("pa")))
      .map(_.partition("part")).toSet == Set("p0", "p1"))
    assert(Iceberg.planFiles(hp(dir.resolve("pb")))
      .map(_.partition("part")).toSet == Set(0L, 1L))
    assert(store.readIceberg("pb").filter(col("part") === 1L).count() == 30)
  }

  test("range-pruned read of a partitioned table restores partition columns") {
    import spark.implicits._
    val (store, dir) = freshStore()
    val df = (1L to 300L).map(i => (i, s"r$i", "p" + (i % 3))).toDF("id", "v", "part")
    store.replacePartitioned("pt", df, "part")
    store.publishIceberg("pt")
    // the range column lives in the data files; "part" lives only in paths —
    // without a basePath read it would be silently absent from the result
    val (got, _, total) = Iceberg.readRangePruned(
      spark, hp(dir.resolve("pt")), df.schema, "id", 10L, 40L)
    assert(total > 1)
    assert(got.columns.contains("part"), "partition column missing from range read")
    assert(got.count() == 31)
    assert(got.filter(col("part") === "p0").count() ==
      df.filter(col("id").between(10, 40) && col("part") === "p0").count())
  }

  test("iceberg publish + metadata-planned read through a file:// URI warehouse") {
    // the emitter resolves the warehouse's FileSystem from the URI scheme:
    // the whole metadata tree (manifest Avro, metadata.json, version-hint)
    // must be written and replanned without touching java.nio paths, and
    // every recorded location must be a fully-qualified URI
    val dir = Files.createTempDirectory("graft-iceberg-uri")
    val store = new Store(spark, "file://" + dir.toString)
    store.replaceSorted("li", lineitem, "l_orderkey", numFiles = 4)
    val md = store.publishIceberg("li")
    assert(md.toUri.getScheme == "file", s"metadata path not qualified: $md")
    val planned = Iceberg.planFiles(hp(dir.resolve("li")))
    assert(planned.size == 4)
    assert(planned.forall(_.path.startsWith("file:")),
      s"data-file locations must carry the FS scheme: ${planned.head.path}")
    val back = store.readIceberg("li")
    assert(back.count() == lineitem.count())
    assert(back.except(lineitem).count() == 0)
    // manifest-bound range pruning plans through the same FS
    val (df, scanned, total) = Iceberg.readRangePruned(
      spark, hp(dir.resolve("li")), lineitem.schema, "l_orderkey", 100L, 400L)
    assert(total == 4 && scanned < total)
    assert(df.count() ==
      lineitem.filter(col("l_orderkey").between(100, 400)).count())
    // snapshot expiry walks URIs from the metadata itself
    store.replace("li", lineitem.limit(50))
    store.publishIceberg("li")
    store.expireVersions("li", keep = 1)
    val ids = mdJson(dir.resolve("li")).get("snapshots")
      .elements.asScala.map(_.get("snapshot-id").asLong).toSeq
    assert(ids == Seq(2L))
  }

  test("manifest-bound pruning skips files outside the range, result exact") {
    val (store, dir) = freshStore()
    // sorted layout -> tight non-overlapping per-file ranges
    store.replaceSorted("li", lineitem, "l_orderkey", numFiles = 8)
    store.publishIceberg("li")
    val schema = lineitem.schema
    val (df, scanned, total) = Iceberg.readRangePruned(
      spark, hp(dir.resolve("li")), schema, "l_orderkey", 100L, 400L)
    assert(total == 8)
    assert(scanned < total, s"expected pruning, scanned $scanned/$total")
    val expect = lineitem.filter(col("l_orderkey").between(100, 400))
    assert(df.count() == expect.count())
    assert(df.except(expect).count() == 0)
  }
}
