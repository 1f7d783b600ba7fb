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

  test("position deletes: rows vanish at read time without a data rewrite") {
    val (store, dir) = freshStore()
    val li = lineitem.limit(5000)
    store.replace("mor", li)
    store.publishIceberg("mor")
    val before = store.readIceberg("mor")
    assert(before.count() == li.count())
    // pick two data files and delete a few positions from each
    val (files, _) = Iceberg.planScanAt(
      Iceberg.currentMetadataFile(hp(dir.resolve("mor"))).get)
    assert(files.nonEmpty)
    val victims = files.take(2).map(f => f.path -> Seq(0L, 2L))
    val dataBytesBefore = files.map(_.fileSize).sum
    Iceberg.attachPositionDeletes(spark, hp(dir.resolve("mor")), victims)
    val after = Iceberg.readTable(spark, hp(dir.resolve("mor")))
    val removed = victims.map(_._2.size).sum
    assert(after.count() == li.count() - removed,
      s"expected ${li.count() - removed}, got ${after.count()}")
    // merge-on-read: the DATA files are untouched (no rewrite happened)
    val (files2, dels2) = Iceberg.planScanAt(
      Iceberg.currentMetadataFile(hp(dir.resolve("mor"))).get)
    assert(files2.map(_.path).sorted == files.map(_.path).sorted)
    assert(files2.map(_.fileSize).sum == dataBytesBefore)
    assert(dels2.nonEmpty && dels2.head.recordCount == removed)
    // the deleted rows are exactly the first/third rows of the victim files
    val kept = after.count()
    val again = Iceberg.readTable(spark, hp(dir.resolve("mor"))).count()
    assert(again == kept, "merge-on-read scan is deterministic")
    store.drop("mor")
  }

  test("pruned reads honor merge-on-read deletes") {
    val (store, dir) = freshStore()
    val ev = Tables.df(spark, sfDir, "events")
      .select("event_id", "user_id", "ts").limit(4000)
    store.replaceTransformPartitioned("morp", ev, "ts", "day")
    store.publishIceberg("morp")
    import org.apache.spark.sql.functions._
    val victims = ev.select("event_id").limit(5)
    Iceberg.attachEqualityDeletes(spark, hp(dir.resolve("morp")),
      store.readIceberg("morp").schema, victims)
    val minTs = ev.agg(min("ts")).collect()(0).getAs[java.time.LocalDateTime](0)
    val (df, _, _) = store.readIcebergTransformRange("morp", "ts",
      minTs, minTs.plusDays(400))
    val vset = victims.collect().map(_.getLong(0)).toSet
    assert(df.filter(col("event_id").isin(vset.toSeq: _*)).count() == 0,
      "transform-pruned read must not resurrect deleted rows")
    assert(df.count() == ev.count() - vset.size)
    store.drop("morp")
  }

  test("equality deletes: keyed rows vanish with no positions needed") {
    val (store, dir) = freshStore()
    val li = lineitem.limit(3000)
    store.replace("eqmor", li)
    store.publishIceberg("eqmor")
    import org.apache.spark.sql.functions._
    // delete all rows of three order keys, by VALUE only
    val victims = li.select("l_orderkey").distinct().limit(3)
    val victimKeys = victims.collect().map(_.getLong(0)).toSet
    Iceberg.attachEqualityDeletes(spark, hp(dir.resolve("eqmor")),
      li.schema, victims)
    val after = Iceberg.readTable(spark, hp(dir.resolve("eqmor")))
    val expect = li.filter(!col("l_orderkey").isin(victimKeys.toSeq: _*))
    assert(after.count() == expect.count(), s"${after.count()} vs ${expect.count()}")
    assert(after.filter(col("l_orderkey").isin(victimKeys.toSeq: _*)).count() == 0)
    // stacks with position deletes on the same snapshot
    val (files, _) = Iceberg.planScanAt(
      Iceberg.currentMetadataFile(hp(dir.resolve("eqmor"))).get)
    Iceberg.attachPositionDeletes(spark, hp(dir.resolve("eqmor")),
      Seq(files.head.path -> Seq(0L)))
    val boths = Iceberg.readTable(spark, hp(dir.resolve("eqmor"))).count()
    assert(boths == expect.count() - 1 || boths == expect.count(),
      s"position delete on top of equality deletes: $boths")
    store.drop("eqmor")
  }

  test("bucket hash matches the Iceberg spec's published test vectors") {
    import org.apache.spark.sql.types._
    assert(Iceberg.bucketHash(34, IntegerType) == 2017239379,
      s"int: ${Iceberg.bucketHash(34, IntegerType)}")
    assert(Iceberg.bucketHash(34L, LongType) == 2017239379,
      s"long: ${Iceberg.bucketHash(34L, LongType)}")
    assert(Iceberg.bucketHash("iceberg", StringType) == 1210000089,
      s"string: ${Iceberg.bucketHash("iceberg", StringType)}")
    assert(Iceberg.bucketHash(java.time.LocalDate.of(2017, 11, 16), DateType)
      == -653330422,
      s"date: ${Iceberg.bucketHash(java.time.LocalDate.of(2017, 11, 16), DateType)}")
    val ts = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
    assert(Iceberg.bucketHash(ts, TimestampNTZType) == -2047944441,
      s"timestamp: ${Iceberg.bucketHash(ts, TimestampNTZType)}")
  }

  test("hidden day partitioning: spec emission, logical schema, range prune") {
    val (store, dir) = freshStore()
    val ev = Tables.df(spark, sfDir, "events")
      .select("event_id", "user_id", "ts")
    store.replaceTransformPartitioned("evd", ev, "ts", "day")
    store.publishIceberg("evd")
    // spec carries the transform, named by convention, sourced to ts
    val spec = mdJson(dir.resolve("evd")).get("partition-specs").get(0)
      .get("fields").get(0)
    assert(spec.get("name").asText == "ts_day")
    assert(spec.get("transform").asText == "day")
    // metadata read keeps the LOGICAL schema (ts_day dropped) and the rows
    val back = store.readIceberg("evd")
    assert(back.columns.toSeq.sorted == Seq("event_id", "ts", "user_id"))
    assert(back.count() == ev.count())
    // range pruning: a 2-day slice plans a strict subset of files and the
    // result matches the exact filter
    import org.apache.spark.sql.functions._
    val minTs = ev.agg(min("ts")).collect()(0)
      .getAs[java.time.LocalDateTime](0)
    val lo = minTs.plusDays(2)
    val hi = minTs.plusDays(4)
    val (df, scanned, total) = store.readIcebergTransformRange("evd", "ts", lo, hi)
    assert(scanned < total, s"scanned $scanned of $total")
    val expect = ev.filter(col("ts") >= lit(lo) && col("ts") <= lit(hi))
    assert(df.count() == expect.count() && df.count() > 0)
    assert(df.except(expect).count() == 0)
    store.drop("evd")
  }

  test("hidden-partition writes are session-timezone proof") {
    // a client's SET timezone must not skew written partition values vs the
    // always-UTC pruner: write day- and month-partitioned under a shifted
    // session zone, then prune — boundary rows must all survive
    val (store, _) = freshStore()
    val ev = Tables.df(spark, sfDir, "events").select("event_id", "user_id", "ts")
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      store.replaceTransformPartitioned("evtz", ev, "ts", "day")
      store.publishIceberg("evtz")
      store.replaceTransformPartitioned("evtzm", ev, "ts", "month")
      store.publishIceberg("evtzm")
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
    import org.apache.spark.sql.functions._
    val minTs = ev.agg(min("ts")).collect()(0).getAs[java.time.LocalDateTime](0)
    // an exact one-day slice starting at a UTC midnight — the window a
    // NY-written layout silently clips near its 19:00 boundary
    val lo = minTs.toLocalDate.plusDays(1).atStartOfDay
    val hi = lo.plusDays(1).minusNanos(1000)
    val (d1, _, _) = store.readIcebergTransformRange("evtz", "ts", lo, hi)
    val expect = ev.filter(col("ts") >= lit(lo) && col("ts") <= lit(hi))
    assert(expect.count() > 0, "slice must be non-empty to prove anything")
    assert(d1.count() == expect.count(),
      s"day prune lost rows: ${d1.count()} vs ${expect.count()}")
    val (d2, _, _) = store.readIcebergTransformRange("evtzm", "ts", lo, hi)
    assert(d2.count() == expect.count(),
      s"month prune lost rows: ${d2.count()} vs ${expect.count()}")
    store.drop("evtz"); store.drop("evtzm")
  }

  test("bucket partitioning prunes an equality probe to one bucket") {
    val (store, dir) = freshStore()
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    store.replaceTransformPartitioned("ob", ord, "o_custkey", "bucket[8]")
    store.publishIceberg("ob")
    val spec = mdJson(dir.resolve("ob")).get("partition-specs").get(0)
      .get("fields").get(0)
    assert(spec.get("name").asText == "o_custkey_bucket8")
    assert(spec.get("transform").asText == "bucket[8]")
    import org.apache.spark.sql.functions._
    val key = ord.select("o_custkey").first().getLong(0)
    val (df, scanned, total) = store.readIcebergTransformEq("ob", "o_custkey", key)
    assert(scanned < total, s"scanned $scanned of $total")
    val expect = ord.filter(col("o_custkey") === key)
    assert(df.count() == expect.count() && df.count() > 0)
    assert(df.except(expect).count() == 0)
    store.drop("ob")
  }

  test("multi-field hidden partitioning prunes on either dimension") {
    val (store, dir) = freshStore()
    val ev = Tables.df(spark, sfDir, "events")
      .select("event_id", "user_id", "ts")
    store.replaceTransformPartitioned("evdb", ev,
      Seq("ts" -> "day", "user_id" -> "bucket[4]"))
    store.publishIceberg("evdb")
    val fields = mdJson(dir.resolve("evdb")).get("partition-specs").get(0)
      .get("fields")
    assert(fields.get(0).get("transform").asText == "day")
    assert(fields.get(1).get("transform").asText == "bucket[4]")
    import org.apache.spark.sql.functions._
    val back = store.readIceberg("evdb")
    assert(back.columns.toSeq.sorted == Seq("event_id", "ts", "user_id"))
    assert(back.count() == ev.count())
    // time-dimension range prune skips files
    val minTs = ev.agg(min("ts")).collect()(0)
      .getAs[java.time.LocalDateTime](0)
    val (d1, s1, t1) = store.readIcebergTransformRange("evdb", "ts",
      minTs.plusDays(1), minTs.plusDays(2))
    assert(s1 < t1, s"day prune $s1/$t1")
    assert(d1.count() == ev.filter(col("ts") >= lit(minTs.plusDays(1)) &&
      col("ts") <= lit(minTs.plusDays(2))).count())
    // key-dimension equality prune skips files of the other buckets
    val uid = ev.select("user_id").first().getLong(0)
    val (d2, s2, t2) = store.readIcebergTransformEq("evdb", "user_id", uid)
    assert(s2 < t2, s"bucket prune $s2/$t2")
    assert(d2.count() == ev.filter(col("user_id") === uid).count())
    store.drop("evdb")
  }

  test("string truncate partitioning prunes by prefix bucket") {
    val (store, dir) = freshStore()
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name")
    store.replaceTransformPartitioned("pt", part, "p_name", "truncate[4]")
    store.publishIceberg("pt")
    import org.apache.spark.sql.functions._
    val name = part.select("p_name").first().getString(0)
    val (df, scanned, total) = store.readIcebergTransformEq("pt", "p_name", name)
    assert(scanned < total, s"scanned $scanned of $total")
    val expect = part.filter(col("p_name") === name)
    assert(df.count() == expect.count() && df.count() > 0)
    store.drop("pt")
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

  // ---- foreign-written metadata (the reference's Go emitter layout) -------

  /** Manifest-entry Avro schema as the reference's Go emitter declares it
    * (storage_utils.go MANIFEST_SCHEMA): `partition` is a MAP of nullable
    * strings (our emitter writes the spec's record tuple), every optional
    * field is a null-union with a default, and ids/docs ride along. */
  private val goManifestSchema = new org.apache.avro.Schema.Parser().parse("""
    {"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","doc":"Location URI with FS scheme","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","type":{"type":"map","values":["null","string"],"key-id":10001,"value-id":10002},"field-id":102},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        {"name":"column_sizes","type":["null",{"type":"array","items":{"type":"record","name":"k117_v118","fields":[{"name":"key","type":"int","field-id":117},{"name":"value","type":"long","field-id":118}]},"logicalType":"map"}],"default":null,"field-id":108},
        {"name":"value_counts","type":["null",{"type":"array","items":{"type":"record","name":"k119_v120","fields":[{"name":"key","type":"int","field-id":119},{"name":"value","type":"long","field-id":120}]},"logicalType":"map"}],"default":null,"field-id":109},
        {"name":"null_value_counts","type":["null",{"type":"array","items":{"type":"record","name":"k121_v122","fields":[{"name":"key","type":"int","field-id":121},{"name":"value","type":"long","field-id":122}]},"logicalType":"map"}],"default":null,"field-id":110},
        {"name":"nan_value_counts","type":["null",{"type":"array","items":{"type":"record","name":"k138_v139","fields":[{"name":"key","type":"int","field-id":138},{"name":"value","type":"long","field-id":139}]},"logicalType":"map"}],"default":null,"field-id":137},
        {"name":"lower_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k126_v127","fields":[{"name":"key","type":"int","field-id":126},{"name":"value","type":"bytes","field-id":127}]},"logicalType":"map"}],"default":null,"field-id":125},
        {"name":"upper_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k129_v130","fields":[{"name":"key","type":"int","field-id":129},{"name":"value","type":"bytes","field-id":130}]},"logicalType":"map"}],"default":null,"field-id":128},
        {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":131},
        {"name":"split_offsets","type":["null",{"type":"array","items":"long"}],"default":null,"field-id":132},
        {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135},
        {"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140}
      ]},"field-id":2}]}""")

  private val goManifestListSchema = new org.apache.avro.Schema.Parser().parse("""
    {"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_files_count","type":"int","field-id":504},
      {"name":"existing_files_count","type":"int","field-id":505},
      {"name":"deleted_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514},
      {"name":"partitions","type":["null",{"type":"array","items":{"type":"record","name":"r508","fields":[
        {"name":"contains_null","type":"boolean","field-id":509},
        {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
        {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
        {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
      ]}}],"default":null,"field-id":507},
      {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":519}]}""")

  private def writeAvroFile(path: Path, schema: org.apache.avro.Schema,
      records: Seq[GenericRecord]): Unit = {
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    try records.foreach(w.append) finally w.close()
  }

  /** Build a metadata tree over `dataDir`'s parquet files exactly as the
    * reference's Go emitter lays it out: EXISTING-status manifest entries
    * with union-typed fields and a map-typed empty partition, a manifest
    * list with the Go field set, v1.metadata.json with alphabetically
    * ordered keys (Go's json.Encoder sorts map keys), string-valued
    * summary, and NO version-hint.text. */
  private def writeForeignTree(tableDir: Path, snapshotId: Long): Unit = {
    import org.apache.avro.generic.GenericData
    val metaDir = Files.createDirectories(tableDir.resolve("metadata"))
    val dataFiles = Files.list(tableDir.resolve("data")).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    def leLong(v: Long) = java.nio.ByteBuffer.wrap(
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array())
    val entries = dataFiles.zipWithIndex.map { case (p, i) =>
      val stats = spark.read.parquet(p.toString)
        .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey"))).head
      val df = new GenericData.Record(goManifestSchema.getField("data_file").schema)
      df.put("content", 0)
      df.put("file_path", p.toUri.toString)
      df.put("file_format", "PARQUET")
      df.put("partition", new java.util.HashMap[String, AnyRef]())
      df.put("record_count", stats.getLong(0))
      df.put("file_size_in_bytes", Files.size(p))
      def kv(field: String, value: java.nio.ByteBuffer): java.util.List[GenericRecord] = {
        val itemSchema = goManifestSchema.getField("data_file").schema
          .getField(field).schema.getTypes.get(1).getElementType
        val r = new GenericData.Record(itemSchema)
        r.put("key", 1) // l_orderkey field id
        r.put("value", value)
        java.util.List.of(r)
      }
      df.put("lower_bounds", kv("lower_bounds", leLong(stats.getLong(1))))
      df.put("upper_bounds", kv("upper_bounds", leLong(stats.getLong(2))))
      df.put("sort_order_id", 0)
      val e = new GenericData.Record(goManifestSchema)
      e.put("status", 1) // EXISTING — the reference writes 1, not ADDED
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", (i + 1).toLong)
      e.put("file_sequence_number", (i + 1).toLong)
      e.put("data_file", df)
      e.asInstanceOf[GenericRecord]
    }
    val manifestPath = metaDir.resolve("manifest.avro")
    writeAvroFile(manifestPath, goManifestSchema, entries)
    val ml = new GenericData.Record(goManifestListSchema)
    ml.put("manifest_path", manifestPath.toUri.toString)
    ml.put("manifest_length", Files.size(manifestPath))
    ml.put("partition_spec_id", 0)
    ml.put("content", 0)
    ml.put("sequence_number", 1L)
    ml.put("min_sequence_number", 1L)
    ml.put("added_snapshot_id", snapshotId)
    ml.put("added_files_count", 0)
    ml.put("existing_files_count", dataFiles.size)
    ml.put("deleted_files_count", 0)
    ml.put("added_rows_count", 0L)
    ml.put("existing_rows_count", entries.map(
      _.get("data_file").asInstanceOf[GenericRecord].get("record_count").asInstanceOf[Long]).sum)
    ml.put("deleted_rows_count", 0L)
    ml.put("partitions", java.util.List.of[GenericRecord]())
    val listPath = metaDir.resolve("snap-list.avro")
    writeAvroFile(listPath, goManifestListSchema, Seq(ml))
    // v1.metadata.json, keys in Go json.Encoder (alphabetical) order
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = om.createObjectNode()
    md.put("current-schema-id", 0)
    md.put("current-snapshot-id", snapshotId)
    md.put("default-sort-order-id", 0)
    md.put("default-spec-id", 0)
    md.put("format-version", 2)
    md.put("last-column-id", 5)
    md.put("last-partition-id", 999)
    md.put("last-sequence-number", 1)
    md.put("last-updated-ms", 1700000000000L)
    md.put("location", tableDir.toUri.toString.stripSuffix("/"))
    md.putArray("metadata-log")
    val specs = md.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0); spec0.putArray("fields")
    md.putObject("properties")
    md.putObject("refs").putObject("main")
      .put("snapshot-id", snapshotId).put("type", "branch")
    val schemas = md.putArray("schemas")
    val sc = schemas.addObject()
    sc.put("type", "struct"); sc.put("schema-id", 0)
    val fields = sc.putArray("fields")
    Seq(("l_orderkey", "long"), ("l_partkey", "long"), ("l_quantity", "double"),
      ("l_shipdate", "timestamp"), ("l_returnflag", "string")).zipWithIndex
      .foreach { case ((n, t), i) =>
        val f = fields.addObject()
        f.put("id", i + 1); f.put("name", n); f.put("required", false); f.put("type", t)
      }
    sc.putArray("identifier-field-ids")
    val slog = md.putArray("snapshot-log")
    val sl = slog.addObject()
    sl.put("snapshot-id", snapshotId); sl.put("timestamp-ms", 1700000000000L)
    val snaps = md.putArray("snapshots")
    val snap = snaps.addObject()
    snap.put("manifest-list", listPath.toUri.toString)
    snap.put("schema-id", 0)
    snap.put("sequence-number", 1)
    snap.put("snapshot-id", snapshotId)
    val summary = snap.putObject("summary")
    summary.put("operation", "replace")
    summary.put("total-data-files", dataFiles.size.toString)
    summary.put("total-records", ml.get("existing_rows_count").toString)
    snap.put("timestamp-ms", 1700000000000L)
    val orders = md.putArray("sort-orders")
    val o0 = orders.addObject()
    o0.put("order-id", 0); o0.putArray("fields")
    md.putArray("statistics")
    md.put("table-uuid", "c0ffee00-0000-4000-8000-000000000042")
    Files.write(metaDir.resolve("v1.metadata.json"),
      om.writerWithDefaultPrettyPrinter.writeValueAsBytes(md))
    // deliberately NO version-hint.text — the Go emitter never writes one
  }

  test("foreign Go-layout metadata tree reads and range-prunes") {
    val dir = Files.createTempDirectory("graft-foreign")
    val tdir = dir.resolve("t")
    val content = lineitem.filter(col("l_orderkey") <= 2000)
    // sorted files -> honest non-overlapping bounds for the prune assert
    content.repartitionByRange(4, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.parquet(tdir.resolve("data").toString)
    writeForeignTree(tdir, snapshotId = 7770001234567L)
    // resolves without a version-hint, tolerates the map-typed partition,
    // EXISTING status, union-typed fields
    val files = Iceberg.planFiles(hp(tdir))
    assert(files.size == 4)
    assert(files.forall(_.partition.isEmpty))
    val back = Iceberg.readTable(spark, hp(tdir))
    assert(back.count() == content.count())
    assert(back.except(content).count() == 0)
    // bounds written by the foreign writer drive file skipping
    val (pruned, scanned, total) = Iceberg.readRangePruned(
      spark, hp(tdir), content.schema, "l_orderkey", 10L, 300L)
    assert(total == 4 && scanned < total,
      s"expected pruning on foreign bounds, scanned $scanned/$total")
    val expect = content.filter(col("l_orderkey").between(10, 300))
    assert(pruned.count() == expect.count())
    assert(pruned.except(expect).count() == 0)
  }

  // ---- reference-layout JDBC catalog (iceberg_tables) ---------------------

  private def derbyCatalog(): JdbcIcebergCatalog = {
    val dir = Files.createTempDirectory("graft-icecat")
    val cat = new JdbcIcebergCatalog(s"jdbc:derby:$dir/db;create=true")
    cat.init()
    cat
  }

  test("jdbc catalog: publish registers the row, a fresh mount serves the table") {
    val (store, _) = freshStore()
    store.replace("cat_li", lineitem)
    val md = store.publishIcebergTo(derbyCatalog2, "public", "cat_li")
    // the row points at the emitted metadata.json
    val loc = derbyCatalog2.metadataLocation("public", "cat_li")
    assert(loc.exists(_.endsWith(md.getName)), s"$loc vs $md")
    assert(derbyCatalog2.tables().contains(("public", "cat_li")))
    // a FRESH catalog instance over the same database (another process)
    // mounts and serves the same rows, planned purely from the pointer
    val again = new JdbcIcebergCatalog(derbyCatalog2Url)
    val names = again.mount(spark)
    assert(names.contains("cat_li"))
    assert(spark.table("cat_li").count() == lineitem.count())
    assert(spark.table("cat_li").except(lineitem).count() == 0)
  }

  test("jdbc catalog: re-publish advances metadata_location via CAS") {
    val (store, _) = freshStore()
    val cat = derbyCatalog()
    store.replace("t2", lineitem.limit(100))
    store.publishIcebergTo(cat, "public", "t2")
    val loc1 = cat.metadataLocation("public", "t2").get
    store.appendCompacting("t2", lineitem.limit(20))
    store.publishIcebergTo(cat, "public", "t2")
    val loc2 = cat.metadataLocation("public", "t2").get
    assert(loc1 != loc2, "metadata_location must advance on re-publish")
    assert(cat.readTable(spark, "public", "t2").count() == 120)
    // a stale-expectation commit loses: nothing clobbered
    assert(!cat.commitLocation("public", "t2", "file:///nowhere", Some(loc1)))
    assert(cat.metadataLocation("public", "t2").contains(loc2))
  }

  test("jdbc catalog: a foreign-written row (reference shape) mounts and reads") {
    val (store, dir) = freshStore()
    store.replace("t3", lineitem.limit(50))
    val md = store.publishIceberg("t3")
    val cat = derbyCatalog()
    // simulate the reference writing the row itself: raw INSERT with its
    // columns JSON, non-default namespace
    val conn = java.sql.DriverManager.getConnection(
      cat.urlForTest)
    try {
      val ps = conn.prepareStatement("INSERT INTO iceberg_tables " +
        "(table_namespace, table_name, metadata_location, columns) VALUES (?, ?, ?, ?)")
      ps.setString(1, "analytics"); ps.setString(2, "t3")
      ps.setString(3, md.toUri.toString)
      ps.setString(4, """[{"name":"l_orderkey","type":"bigint"}]""")
      ps.executeUpdate()
    } finally conn.close()
    val names = cat.mount(spark)
    assert(names.contains("analytics_t3"))
    assert(spark.table("analytics_t3").count() == 50)
  }

  test("jdbc catalog: staging-suffix tables are hidden, matviews mount as views") {
    val (store, _) = freshStore()
    store.replace("t4", lineitem.limit(30))
    val cat = derbyCatalog()
    store.publishIcebergTo(cat, "public", "t4")
    cat.register("public", "t4-bemidb-syncing", "file:///staging")
    assert(!cat.tables().exists(_._2.endsWith("-bemidb-syncing")))
    cat.createMaterializedView("public", "t4_agg",
      "SELECT l_returnflag, count(*) AS n FROM t4 GROUP BY l_returnflag")
    val names = cat.mount(spark)
    assert(names.contains("t4") && names.contains("t4_agg"))
    assert(spark.table("t4_agg").count() ==
      spark.table("t4").select("l_returnflag").distinct().count())
    cat.dropMaterializedView("public", "t4_agg")
    assert(cat.materializedViews().isEmpty)
    cat.dropTable("public", "t4")
    assert(!cat.tables().contains(("public", "t4")))
  }

  // one Derby database shared by the fresh-instance test (Derby embedded
  // allows many connections to the same db path within a JVM)
  private lazy val derbyCatalog2Url = {
    val dir = Files.createTempDirectory("graft-icecat2")
    s"jdbc:derby:$dir/db;create=true"
  }
  private lazy val derbyCatalog2 = {
    val cat = new JdbcIcebergCatalog(derbyCatalog2Url)
    cat.init()
    cat
  }
}
