package graft

import org.apache.spark.sql.functions._

/** Exercises the stateful Store: atomic replace, upsert/delete by key,
  * cursor append, and the full matview lifecycle
  * (CREATE/REFRESH/DROP/RENAME). */
class StoreSpec extends SparkSpecBase {

  /** Warehouse URI mapping — the object-store twin suite overrides this
    * to re-run the whole lifecycle over `graftobj://` (S3A semantics). */
  protected def wh(dir: String): String = dir
  private def freshStore(): Store = {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    new Store(spark, wh(dir))
  }

  test("replace is versioned and atomic-by-pointer") {
    val st = freshStore()
    val o = Tables.df(spark, sfDir, "orders")
    st.replace("t", o.limit(10))
    assert(st.read("t").count() == 10)
    st.replace("t", o.limit(25))
    assert(st.read("t").count() == 25)
  }

  test("a join-inflated write estimate must not shred a small insert into slivers") {
    import spark.implicits._
    val st = freshStore()
    st.replace("shred_t", Seq(0L).toDF("n"))
    // stat-less multi-join: the plan estimate multiplies to ~GBs, the
    // leaf cap holds it to ~10 MB, but the ACTUAL output is 10 rows — the
    // pre-guard write shredded that into one near-empty file per
    // estimated megabyte
    val joined = spark.range(50000).toDF("a")
      .join(spark.range(50000).toDF("b"), $"a" === $"b")
      .join(spark.range(50000).toDF("c"), $"a" === $"c")
      .filter($"a" < 10).select($"a".as("n"))
    st.appendCompacting("shred_t", joined, maxFileBytes = 1L << 20)
    assert(st.read("shred_t").count() == 11)
    assert(st.read("shred_t").agg(sum($"n")).head.getLong(0) == 45)
    val files = st.read("shred_t").inputFiles
    assert(files.length <= 4,
      s"10-row append landed in ${files.length} files — shred guard lost")
  }

  test("appendCompacting rewrites small tail files, carries full ones") {
    import spark.implicits._
    val st = freshStore()
    st.replace("t", (1 to 100).toDF("n"))
    // five sliver appends: with a high byte threshold every file is "small",
    // so each append compacts the whole tail into ONE file
    (1 to 5).foreach { b =>
      st.appendCompacting("t", Seq(100 + b).toDF("n"), maxFileBytes = 1L << 30)
    }
    assert(st.read("t").count() == 105)
    assert(st.read("t").agg(sum($"n")).head.getLong(0)
      == (1 to 105).map(_.toLong).sum)
    val dir = java.nio.file.Paths.get(
      st.read("t").inputFiles.head).getParent
    val parquets = st.read("t").inputFiles.length
    assert(parquets == 1, s"expected one compacted file, got $parquets in $dir")
    // with threshold 0 every existing file counts as full: carried untouched,
    // the new batch lands as its own file
    st.appendCompacting("t", Seq(999).toDF("n"), maxFileBytes = 0L)
    assert(st.read("t").count() == 106)
    assert(st.read("t").inputFiles.length == 2)
  }

  test("wide binary rows split under the append file cap and round-trip exactly") {
    import spark.implicits._
    val st = freshStore()
    // the reference maps bytea -> binary (pg_schema_column.go:89-90): a
    // media table's payload column makes rows ~64 KB wide. The append
    // cap must size output files by BYTES (a row-count heuristic would
    // blow the 100 MB contract by orders of magnitude on wide rows), and
    // the payload must survive the parquet round-trip bit-exact.
    // SplitMix64-finalized bytes so zstd can't compress the payload away
    // (a linear-congruential ramp here deltas to near-constant bytes and
    // the whole 4 MB shrinks under the resplit threshold).
    def payload(i: Long): Array[Byte] = Array.tabulate(64 * 1024) { j =>
      var z = i * 65536L + j + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) & 0xff).toByte
    }
    st.replace("bin_t", Seq((0L, payload(0))).toDF("k", "payload"))
    st.appendCompacting("bin_t",
      (1L to 64L).map(i => (i, payload(i))).toDF("k", "payload"),
      maxFileBytes = 1L << 20)
    val files = st.read("bin_t").inputFiles.length
    assert(files >= 3, s"1 MB cap over ~4 MB of binary rows must split, got $files files")
    val got = st.read("bin_t").orderBy("k").collect()
    assert(got.length == 65)
    got.foreach { r =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](1), payload(r.getLong(0))),
        s"payload corrupted for k=${r.getLong(0)}")
    }
  }

  test("replace re-splits cap-overshooting files from a narrow-partitioned input") {
    import spark.implicits._
    val st = freshStore()
    def payload(i: Long): Array[Byte] = Array.tabulate(64 * 1024) { j =>
      var z = i * 65536L + j + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) & 0xff).toByte
    }
    // coalesce(1): the caller's partitioning would land ONE ~4 MB file;
    // the post-write cap check must catch the measured overshoot and
    // re-split without touching correctly-sized tables.
    st.replace("bin_r",
      (0L until 64L).map(i => (i, payload(i))).toDF("k", "payload").coalesce(1),
      maxFileBytes = 1L << 20)
    val files = st.read("bin_r").inputFiles.length
    assert(files >= 3, s"1 MB cap over ~4 MB in one input partition must split, got $files")
    val got = st.read("bin_r").orderBy("k").collect()
    assert(got.length == 64)
    got.foreach(r => assert(
      java.util.Arrays.equals(r.getAs[Array[Byte]](1), payload(r.getLong(0)))))
    // a table whose files respect the cap keeps its exact layout
    st.replace("ok_r", (0L until 100L).map(i => (i, i * 2)).toDF("k", "v").repartition(2))
    assert(st.read("ok_r").inputFiles.length == 2)
  }

  test("upsert by key: incoming wins, new keys appended") {
    val st = freshStore()
    import spark.implicits._
    st.replace("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    st.upsert("t", Seq((2L, "B"), (3L, "c")).toDF("k", "v"), "k")
    val got = st.read("t").orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("upsert rewrites only files whose key range overlaps incoming keys") {
    val st = freshStore()
    import spark.implicits._
    // range-partition 1..4000 into 4 files with disjoint key ranges
    st.replace("t", (1L to 4000L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(4, col("k")))
    val before = st.read("t").inputFiles.map(f =>
      java.nio.file.Paths.get(new java.net.URI(f).getPath)).toSeq
    assert(before.length == 4)
    // incoming keys all land in one file's range
    val (rewritten, total) =
      st.upsert("t", Seq((10L, "X"), (20L, "Y"), (4001L, "new")).toDF("k", "v"), "k")
    assert(total == 4, s"expected 4 files, saw $total")
    assert(rewritten == 1, s"expected 1 overlapping file rewritten, saw $rewritten")
    // the three untouched files are carried into the new version BY NAME
    val after = st.read("t").inputFiles.map(f =>
      java.nio.file.Paths.get(new java.net.URI(f).getPath).getFileName.toString).toSet
    val carried = before.map(_.getFileName.toString).filter(after.contains)
    assert(carried.size == 3, s"expected 3 carried files, got $carried")
    // and the merge semantics are intact
    assert(st.read("t").count() == 4001)
    assert(st.read("t").filter(col("k") === 10L).head.getString(1) == "X")
    assert(st.read("t").filter(col("k") === 3000L).head.getString(1) == "v3000")

    // delete prunes the same way
    val (dRewritten, dTotal) = st.deleteByKey("t", Seq(Tuple1(2500L)).toDF("k"), "k")
    assert(dRewritten < dTotal, s"delete rewrote all $dTotal files")
    assert(st.read("t").count() == 4000)
    assert(st.read("t").filter(col("k") === 2500L).count() == 0)
  }

  test("large-key-set upsert prunes via the stats join, never a driver collect") {
    val st = freshStore()
    import spark.implicits._
    st.replace("t", (1L to 4000L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(4, col("k")))
    // force the join route for any realistic batch, then upsert a key set
    // that would be "large": same pruning decision, no keys on the driver
    st.maxDriverPruneKeys = 10L
    val incoming = (1L to 500L).map(k => (k, s"X$k")).toDF("k", "v")
    val (rewritten, total) = st.upsert("t", incoming, "k")
    assert(st.lastPruneViaJoin, "expected the join-based overlap route")
    assert(total == 4 && rewritten == 1,
      s"join route must prune identically, saw $rewritten/$total")
    assert(st.read("t").count() == 4000)
    assert(st.read("t").filter(col("k") === 42L).head.getString(1) == "X42")
    assert(st.read("t").filter(col("k") === 3000L).head.getString(1) == "v3000")
    // delete routes the same way above the threshold
    val (dRewritten, dTotal) =
      st.deleteByKey("t", (3900L to 4000L).map(Tuple1(_)).toDF("k"), "k")
    assert(st.lastPruneViaJoin && dRewritten < dTotal,
      s"delete join route must still prune, saw $dRewritten/$dTotal")
    assert(st.read("t").count() == 3899)
    // a small batch still takes the driver binary-search route
    st.maxDriverPruneKeys = 100000L
    st.upsert("t", Seq((5L, "tiny")).toDF("k", "v"), "k")
    assert(!st.lastPruneViaJoin)
    assert(st.read("t").filter(col("k") === 5L).head.getString(1) == "tiny")
  }

  test("null keys don't shrink the routing probe below the threshold") {
    // threshold 3, incoming = 4 distinct non-null keys + a null-key row: a
    // probe that dropped nulls AFTER the limit could see 3 keys, believe
    // the sample complete, and miss overlapping files entirely
    val st = freshStore()
    import spark.implicits._
    st.replace("t", (1L to 4000L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(4, col("k")))
    st.maxDriverPruneKeys = 3L
    val incoming = Seq(
      (Some(100L), "A"), (Some(1100L), "B"), (Some(2100L), "C"),
      (Some(3100L), "D"), (Option.empty[Long], "nullrow")).toDF("k", "v")
    st.upsert("t", incoming, "k")
    assert(st.lastPruneViaJoin, "4 non-null keys over threshold 3 must join-route")
    Seq(100L -> "A", 1100L -> "B", 2100L -> "C", 3100L -> "D").foreach {
      case (k, v) =>
        assert(st.read("t").filter(col("k") === k).head.getString(1) == v, s"key $k")
    }
    assert(st.read("t").filter(col("k").isNull).count() == 1)
    assert(st.read("t").count() == 4001)
  }

  test("a reader planned before replace still sees its version afterwards") {
    // versioned dirs give snapshot isolation: replace flips the pointer and
    // leaves prior version files on disk (until expireVersions), so a
    // DataFrame planned against v1 collects v1 even after v2 is published —
    // the single-node analog of Iceberg's snapshot-isolated readers
    val st = freshStore()
    import spark.implicits._
    st.replace("t", (1L to 100L).map(k => (k, "old")).toDF("k", "v"))
    val reader = st.read("t") // plans against v1's files
    st.replace("t", (1L to 50L).map(k => (k, "new")).toDF("k", "v"))
    assert(reader.count() == 100)
    assert(reader.filter(col("v") === "old").count() == 100)
    assert(st.read("t").count() == 50) // new readers see v2
    assert(st.read("t").filter(col("v") === "new").count() == 50)
  }

  test("scd2 upsert tracks history: closes changed rows, keeps unchanged open") {
    val st = freshStore()
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // initial load at t1: keys 1, 2
    st.scd2Upsert("dim",
      Seq((1L, "a", ts("2024-01-01 00:00:00")), (2L, "b", ts("2024-01-01 00:00:00")))
        .toDF("k", "v", "ts"), "k", "ts")
    // t2: key 2 changes, key 3 arrives
    st.scd2Upsert("dim",
      Seq((2L, "B", ts("2024-02-01 00:00:00")), (3L, "c", ts("2024-02-01 00:00:00")))
        .toDF("k", "v", "ts"), "k", "ts")
    // t3: key 2 changes again
    st.scd2Upsert("dim",
      Seq((2L, "BB", ts("2024-03-01 00:00:00"))).toDF("k", "v", "ts"), "k", "ts")

    val rows = st.read("dim")
      .orderBy("k", "valid_from")
      .select("k", "v", "is_current")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(rows == Seq(
      (1L, "a", true),                       // never changed: still open
      (2L, "b", false), (2L, "B", false), (2L, "BB", true), // full history
      (3L, "c", true)))
    // exactly one open row per key, closed rows have valid_to set
    val open = st.read("dim").filter(col("is_current"))
    assert(open.count() == 3 && open.filter(col("valid_to").isNotNull).count() == 0)
    val closed = st.read("dim").filter(!col("is_current"))
    assert(closed.filter(col("valid_to").isNull).count() == 0)
  }

  test("append with schema evolution null-fills new and missing columns") {
    val st = freshStore()
    import spark.implicits._
    st.replace("t", Seq((1L, "a")).toDF("k", "v"))
    // incoming batch grew a column
    st.appendEvolving("t", Seq((2L, "b", 7.5)).toDF("k", "v", "score"))
    val got = st.read("t").orderBy("k")
      .select("k", "v", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSeq
    assert(got == Seq((1L, "a", None), (2L, "b", Some(7.5))))
  }

  test("delete by key") {
    val st = freshStore()
    import spark.implicits._
    st.replace("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    st.deleteByKey("t", Seq(Tuple1(2L)).toDF("k"), "k")
    assert(st.read("t").orderBy("k").as[(Long, String)].collect().toSeq
      == Seq((1L, "a"), (3L, "c")))
  }

  test("cursor append trims overlap by key") {
    val st = freshStore()
    import spark.implicits._
    val tsd = (s: String) => java.sql.Timestamp.valueOf(s)
    st.replace("t", Seq((1L, tsd("2024-01-01 10:00:00")), (2L, tsd("2024-01-01 11:00:00")))
      .toDF("k", "ts"))
    // incoming re-delivers key 2 at the cursor hour plus a new key 3
    st.cursorAppend("t", Seq(
      (2L, tsd("2024-01-01 11:00:00")),
      (3L, tsd("2024-01-01 12:00:00")),
      (0L, tsd("2024-01-01 09:00:00"))).toDF("k", "ts"), "ts", "k")
    assert(st.read("t").select("k").orderBy("k").as[Long].collect().toSeq == Seq(1L, 2L, 3L))
  }

  test("matview lifecycle: create, refresh picks up new data, rename, drop") {
    val st = freshStore()
    Tables.registerAll(spark, sfDir)
    spark.sql("SELECT * FROM nation").limit(5).createOrReplaceTempView("mv_src")
    st.createMatview("mv1", "SELECT count(*) AS n FROM mv_src")
    assert(st.read("mv1").collect()(0).getLong(0) == 5)
    spark.sql("SELECT * FROM nation").limit(7).createOrReplaceTempView("mv_src")
    assert(st.read("mv1").collect()(0).getLong(0) == 5) // stale until refresh
    st.refreshMatview("mv1")
    assert(st.read("mv1").collect()(0).getLong(0) == 7)
    st.renameMatview("mv1", "mv2")
    assert(st.matviewDefinition("mv2").isDefined && st.matviewDefinition("mv1").isEmpty)
    assert(st.read("mv2").collect()(0).getLong(0) == 7)
    st.dropMatview("mv2")
    assert(!st.exists("mv2"))
  }

  test("partitioned replace prunes partitions on key predicates") {
    val st = freshStore()
    val li = Tables.df(spark, sfDir, "lineitem")
      .withColumn("ship_year", year(col("l_shipdate")))
    st.replacePartitioned("li_part", li, "ship_year")
    val q = st.read("li_part").filter(col("ship_year") === 1997)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ship_year"),
      s"no partition pruning in plan:\n$plan")
    assert(q.count() == li.filter(col("ship_year") === 1997).count())
  }

  test("catalog survives restart: a new Store over the same warehouse sees everything") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    val st = new Store(spark, wh(dir))
    import spark.implicits._
    st.replace("t1", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    st.upsert("t1", Seq((3L, "c")).toDF("k", "v"), "k")
    Tables.registerAll(spark, sfDir)
    st.createMatview("mv_persist", "SELECT count(*) AS n FROM region")
    // simulate a crash/restart: fresh Store instance, no in-memory state
    val st2 = new Store(spark, wh(dir))
    assert(st2.exists("t1") && st2.read("t1").count() == 3)
    assert(st2.matviewDefinition("mv_persist")
      .contains("SELECT count(*) AS n FROM region"))
    assert(st2.read("mv_persist").head.getLong(0) == 5)
    // and the reloaded matview is queryable through spark.sql again
    assert(spark.sql("SELECT n FROM mv_persist").head.getLong(0) == 5)
    // mutations through the new instance persist too
    st2.drop("t1")
    val st3 = new Store(spark, wh(dir))
    assert(!st3.exists("t1") && st3.exists("mv_persist"))
  }

  test("write journal is per-thread: another session's concurrent commit " +
      "is never attributed to this thread's transaction") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wj").toString
    val st = new Store(spark, wh(dir))
    import spark.implicits._
    st.replace("wj_mine", Seq((1L, "a")).toDF("k", "v"))
    st.replace("wj_other", Seq((1L, "x")).toDF("k", "v"))
    st.beginWriteJournal()
    // another connection (thread) commits while this journal is open —
    // under the old global version-map diff this write would be blamed on
    // (and rolled back with) this thread's transaction
    val t = new Thread(() =>
      st.appendCompacting("wj_other", Seq((2L, "y")).toDF("k", "v")))
    t.start(); t.join()
    st.appendCompacting("wj_mine", Seq((2L, "b")).toDF("k", "v"))
    val mine = st.drainWriteJournal()
    assert(mine.map(_._1) == Seq("wj_mine"), mine.mkString(","))
    assert(st.read("wj_other").count() == 2)
  }

  test("crash orphans never resurface: unpublished version dirs and tmp " +
      "spools are invisible, cleared on the next write, reclaimed by vacuum") {
    val dir = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val st = new Store(spark, wh(dir))
    import spark.implicits._
    st.replace("ct", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    st.appendCompacting("ct", Seq((3L, "c")).toDF("k", "v")) // published v2
    // simulate a writer that died between its data write and the catalog
    // commit: a v3 dir full of ghost rows, plus a half-written tmp spool
    val ghost = new java.io.File(s"$dir/ct/v3"); ghost.mkdirs()
    Seq((100L, "ghost"), (101L, "ghost")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/ct/v3")
    new java.io.File(s"$dir/ct/.compacted-9-tmp").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/ct/.compacted-9-tmp/junk.parquet"),
      Array[Byte](1, 2, 3))
    // a fresh Store trusts the catalog pointer, not the directory listing
    val st2 = new Store(spark, wh(dir))
    assert(st2.read("ct").count() == 3, "ghost rows leaked into reads")
    // the next write reuses version number 3 and must CLEAR the orphan
    // rather than merge its files into the carried set
    st2.appendCompacting("ct", Seq((4L, "d")).toDF("k", "v"))
    val rows = st2.read("ct").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(1L, 2L, 3L, 4L), s"ghost resurrection: $rows")
    // vacuum reclaims crash artifacts: tmp spools and any orphan above
    // the published pointer
    new java.io.File(s"$dir/ct/v99").mkdirs()
    st2.vacuum("ct")
    val names = new java.io.File(s"$dir/ct").listFiles.map(_.getName).toSet
    assert(!names.contains(".compacted-9-tmp"), names.mkString(","))
    assert(!names.contains("v99"), names.mkString(","))
    assert(st2.read("ct").count() == 4)
  }

  test("create matview WITH NO DATA is empty until refresh") {
    val st = freshStore()
    Tables.registerAll(spark, sfDir)
    st.createMatview("mvnd", "SELECT r_regionkey FROM region", withData = false)
    assert(st.read("mvnd").count() == 0)
    st.refreshMatview("mvnd")
    assert(st.read("mvnd").count() == 5)
  }

  test("readVersion is an immutable snapshot across later upserts") {
    import spark.implicits._
    val st = freshStore()
    st.replace("t", (1 to 50).map(i => (i.toLong, "old")).toDF("k", "v"))
    val snap = st.currentVersion("t")
    st.upsert("t", Seq((1L, "new"), (99L, "new")).toDF("k", "v"), "k")
    // live table sees the upsert; the snapshot does not
    assert(st.read("t").filter(col("v") === "new").count() == 2)
    assert(st.read("t").count() == 51)
    val old = st.readVersion("t", snap)
    assert(old.count() == 50)
    assert(old.filter(col("v") === "new").count() == 0)
    intercept[IllegalArgumentException](st.readVersion("t", 99))
  }

  test("readRange scans only files whose footer range overlaps") {
    import spark.implicits._
    val st = freshStore()
    // four stats-disjoint files: keys [0,99], [100,199], [200,299], [300,399]
    for (b <- 0 until 4)
      st.append("t", (b * 100 until (b + 1) * 100).map(_.toLong).toDF("k").coalesce(1))
    val (df, scanned, total) = st.readRange("t", "k", 150L, 249L)
    assert(total == 4)
    assert(scanned == 2, s"expected 2 overlapping files, scanned $scanned")
    assert(df.count() == 100)
    assert(df.agg(min(col("k")), max(col("k"))).collect()(0).toSeq == Seq(150L, 249L))
    // an empty range prunes everything and still returns the right schema
    val (none, s0, _) = st.readRange("t", "k", 1000L, 2000L)
    assert(s0 == 0 && none.count() == 0 && none.columns.toSeq == Seq("k"))
  }

  test("VACUUM FULL re-applies the declared layout instead of heaping it") {
    import spark.implicits._
    val st = freshStore()
    st.replaceSorted("lay_t",
      (0L until 4000L).map(i => (i, s"v$i")).toDF("k", "v"), "k", 4)
    assert(st.declaredLayout("lay_t").map(_.kind).contains("sorted"))
    // unsorted appends decay the clustering: the tail file spans the whole
    // key domain, so a narrow range scan can no longer prune it
    // (maxFileBytes=1 carries the sorted files untouched — no compaction)
    st.appendCompacting("lay_t",
      Seq((99999L, "tail"), (-5L, "head")).toDF("k", "v"), maxFileBytes = 1L)
    val (_, scanBefore, totBefore) = st.readRange("lay_t", "k", 10L, 20L)
    assert(scanBefore >= 2,
      s"decayed tail should defeat pruning: $scanBefore/$totBefore")
    val (_, after, _) = st.vacuum("lay_t", full = true)
    // content intact, clustering restored: the narrow range hits ONE file
    assert(st.read("lay_t").count() == 4002)
    val (q, scanAfter, totAfter) = st.readRange("lay_t", "k", 10L, 20L)
    assert(totAfter == after && scanAfter == 1,
      s"FULL must restore the sorted layout: scanned $scanAfter/$totAfter")
    assert(q.count() == 11)
    // the declaration (table metadata) survives a restart via the catalog
    val st2 = new Store(spark, st.warehouse)
    assert(st2.declaredLayout("lay_t").map(_.keys).contains(Seq("k")))
    // a partitioned declaration routes FULL through partitionBy: the
    // hive key=value directories survive maintenance
    st.replacePartitioned("lay_p",
      (0L until 100L).map(i => (i, s"p${i % 3}")).toDF("k", "p"), "p")
    st.vacuum("lay_p", full = true)
    assert(st.read("lay_p").count() == 100)
    val vdir = new org.apache.hadoop.fs.Path(
      s"${st.warehouse}/lay_p/v${st.currentVersion("lay_p")}")
    val fs2 = vdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDirs = fs2.listStatus(vdir).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("p=")).sorted
    assert(partDirs.toSeq == Seq("p=p0", "p=p1", "p=p2"),
      s"FULL must keep hive partition dirs: ${partDirs.toSeq}")
    // a plain full refresh KEEPS the declaration (table metadata)…
    st.replace("lay_t", Seq((1L, "x")).toDF("k", "v"))
    assert(st.declaredLayout("lay_t").nonEmpty)
    // …unless the schema drops its keys
    st.replace("lay_t", Seq(Tuple1("only")).toDF("v"))
    assert(st.declaredLayout("lay_t").isEmpty)
  }

  test("first pruned read writes a manifest; stale manifests rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    val st = new Store(spark, wh(dir))
    for (b <- 0 until 3)
      st.append("t", (b * 100 until (b + 1) * 100).map(_.toLong).toDF("k").coalesce(1))
    val (_, s1, t1) = st.readRange("t", "k", 0L, 99L)
    assert(s1 == 1 && t1 == 3)
    // manifest now exists in the current version dir
    val vdir = java.nio.file.Paths.get(s"$dir/t/v${st.currentVersion("t")}")
    val mf = vdir.resolve("_manifest.json")
    assert(java.nio.file.Files.exists(mf))
    // consultations after the first come from the manifest, not footers:
    // corrupt a footer-irrelevant byte check — instead prove the cached
    // path by swapping the manifest's ranges and observing pruning follow it
    val txt = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      .replace("\"hi\" : 99", "\"hi\" : 9999")
    java.nio.file.Files.write(mf, txt.getBytes("UTF-8"))
    val (_, s2, _) = st.readRange("t", "k", 150L, 160L)
    // the doctored first file (0..9999) now overlaps everything -> 2 files
    assert(s2 == 2, s"manifest not consulted: scanned $s2")
    // a new version (append) changes the file set -> manifest rebuilds
    st.append("t", Seq(300L).toDF("k").coalesce(1))
    val (_, s3, t3) = st.readRange("t", "k", 0L, 99L)
    assert(t3 == 4 && s3 == 1, s"stale manifest survived: $s3/$t3")
  }

  test("expireVersions drops old snapshots, keeps recent and current") {
    import spark.implicits._
    val st = freshStore()
    for (v <- 1 to 4) st.replace("t", Seq(v.toLong).toDF("n"))
    assert(st.currentVersion("t") == 4)
    val expired = st.expireVersions("t", keep = 2)
    assert(expired == Seq(1, 2))
    intercept[IllegalArgumentException](st.readVersion("t", 1))
    assert(st.readVersion("t", 3).collect()(0).getLong(0) == 3L)
    assert(st.read("t").collect()(0).getLong(0) == 4L)
    // keep never drops the current version even when keep = 1
    assert(st.expireVersions("t", keep = 1) == Seq(3))
    assert(st.read("t").count() == 1)
  }

  test("replaceSorted makes range reads near-perfectly file-pruned") {
    import spark.implicits._
    val st = freshStore()
    // unsorted input; the sorted range write lays it out in 8 disjoint files
    val rnd = new scala.util.Random(7)
    st.replaceSorted("t", rnd.shuffle((0L until 8000L).toList).toDF("k"), "k", 8)
    val (df, scanned, total) = st.readRange("t", "k", 2500L, 3499L)
    assert(total == 8)
    assert(df.count() == 1000)
    // a 1/8th-width range on a sorted layout touches at most 2 of 8 files
    assert(scanned <= 2, s"sorted layout should prune to <=2 files, got $scanned")
    // same range over a hash-layout table scans everything — the contrast
    // that motivates the sorted write
    st.replace("h", rnd.shuffle((0L until 8000L).toList).toDF("k").repartition(8))
    val (_, scannedHash, totalHash) = st.readRange("h", "k", 2500L, 3499L)
    assert(totalHash == 8 && scannedHash == 8)
  }

  test("z-order layout prunes range scans on EITHER clustered key") {
    import spark.implicits._
    val st = freshStore()
    // two independent uniform keys: a plain sort on x leaves y ranges wide
    val rows = (0L until 40000L).map(i => (i % 200L, (i * 7919L) % 200L, i))
    st.replaceZOrdered("z", rows.toDF("x", "y", "payload"), Seq("x", "y"), numFiles = 16)
    val (dx, sx, tx) = st.readRange("z", "x", 10L, 29L)
    val (dy, sy, ty) = st.readRange("z", "y", 10L, 29L)
    assert(tx == 16 && ty == 16)
    // a 10% range on either key must skip most files (z-order tightness)
    assert(sx <= 8, s"x-range scanned $sx/16")
    assert(sy <= 8, s"y-range scanned $sy/16")
    // results exact
    assert(dx.count() == rows.count(r => r._1 >= 10 && r._1 <= 29))
    assert(dy.count() == rows.count(r => r._2 >= 10 && r._2 <= 29))
    // contrast: the same data merely SORTED by x cannot prune on y
    st.replaceSorted("s", rows.toDF("x", "y", "payload"), "x", numFiles = 16)
    val (_, sy2, _) = st.readRange("s", "y", 10L, 29L)
    assert(sy2 >= 14, s"sorted-by-x layout should barely prune y: $sy2")
  }

  test("warehouse accepts a file:// URI (Hadoop FileSystem commit path)") {
    import spark.implicits._
    // the commit path must run entirely through the Hadoop FileSystem API:
    // a URI warehouse exercises it end to end (replace, catalog snapshot
    // commit, upsert with carry/rewrite, compacting append, restart reload)
    val dir = java.nio.file.Files.createTempDirectory("graft-store-uri")
    val st = new Store(spark, s"file://$dir")
    st.replaceSorted("t", (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      "k", numFiles = 4)
    assert(st.read("t").count() == 400)
    val (rewritten, total) = st.upsert("t", Seq((5L, "x")).toDF("k", "v"), "k")
    assert(total == 4 && rewritten == 1, s"expected pruned upsert: $rewritten/$total")
    assert(st.read("t").filter($"k" === 5L).collect()(0).getString(1) == "x")
    st.appendCompacting("t", Seq((401L, "tail")).toDF("k", "v"))
    assert(st.read("t").count() == 401)
    // catalog snapshots committed as fresh immutable objects, no overwrite
    val cats = java.nio.file.Files.list(dir).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(cats).asScala
      .map(_.getFileName.toString).toSeq
    assert(names.count(_.matches("_catalog\\.v\\d+\\.json")) >= 1, names.toString)
    // restart over the same URI warehouse sees everything
    val st2 = new Store(spark, s"file://$dir")
    assert(st2.read("t").count() == 401)
    assert(st2.currentVersion("t") == 3)
  }

  test("catalog commit skips past a sequence taken by another writer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-store-race")
    val st = new Store(spark, wh(dir.toString))
    st.replace("t", Seq((1L, "a")).toDF("k", "v")) // commits _catalog.v1
    // simulate a second writer landing the next fresh name first
    java.nio.file.Files.write(dir.resolve("_catalog.v2.json"),
      java.nio.file.Files.readAllBytes(dir.resolve("_catalog.v1.json")))
    st.replace("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    // the commit must NOT overwrite v2: it re-syncs and lands a higher seq,
    // and a fresh reader takes the newest snapshot (2 rows, version 2)
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(
      java.nio.file.Files.list(dir).iterator()).asScala
      .map(_.getFileName.toString).toSeq
    assert(names.contains("_catalog.v2.json"), names.toString)
    assert(names.exists(_.matches("_catalog\\.v[3-9]\\.json")), names.toString)
    val st2 = new Store(spark, wh(dir.toString))
    assert(st2.currentVersion("t") == 2)
    assert(st2.read("t").count() == 2)
  }

  test("incremental matview refresh equals full recompute, touching only changed files") {
    import spark.implicits._
    val st = freshStore()
    def rows(r: Range) = r.map(k => (k.toLong, s"g${k % 5}", k.toLong * 3)).toDF("k", "g", "x")
    st.appendCompacting("base", rows(1 to 400), maxFileBytes = 1L)  // every file "full": carried
    st.createIncrementalMatview("agg", "base", Seq("g"), Seq("x"))
    def fullRecompute() = st.read("base").groupBy("g")
      .agg(count(lit(1)).cast("long").as("n_rows"), sum($"x").as("sum_x"))
    assert(st.read("agg").orderBy("g").collect().toSeq ==
      fullRecompute().orderBy("g").collect().toSeq)
    // append: only the new files aggregate (carried files skipped)
    st.appendCompacting("base", rows(401 to 450), maxFileBytes = 1L)
    val (read1, total1) = st.incrementalRefresh("agg")
    assert(read1 < total1, s"expected incremental: read $read1 of $total1")
    assert(st.read("agg").orderBy("g").collect().toSeq ==
      fullRecompute().orderBy("g").collect().toSeq)
    // upsert (rewrites overlapping files) and delete: retractions are exact
    st.upsert("base", Seq((7L, "g2", 999L)).toDF("k", "g", "x"), "k")
    st.deleteByKey("base", Seq(8L, 9L).toDF("k"), "k")
    val (read2, total2) = st.incrementalRefresh("agg")
    assert(read2 > 0)
    assert(st.read("agg").orderBy("g").collect().toSeq ==
      fullRecompute().orderBy("g").collect().toSeq)
    // no change -> zero files read; state survives a restart
    assert(st.incrementalRefresh("agg")._1 == 0)
    val wh = st.read("base").inputFiles.head
      .replaceAll("file:", "").replaceAll("/base/.*", "")
    val st2 = new Store(spark, wh)
    st2.appendCompacting("base", rows(451 to 460), maxFileBytes = 1L)
    val (read3, total3) = st2.incrementalRefresh("agg")
    assert(read3 < total3)
    assert(st2.read("agg").orderBy("g").collect().toSeq ==
      st2.read("base").groupBy("g")
        .agg(count(lit(1)).cast("long").as("n_rows"), sum($"x").as("sum_x"))
        .orderBy("g").collect().toSeq)
  }

  test("avg matviews retract exactly through hidden state, nulls and all") {
    import spark.implicits._
    val st = freshStore()
    // x is null on every 7th key: avg must divide by the NON-NULL count
    def rows(r: Range) = r.map(k => (k.toLong, s"g${k % 4}",
      if (k % 7 == 0) None else Some(k.toLong * 3))).toDF("k", "g", "x")
    st.appendCompacting("abase", rows(1 to 300), maxFileBytes = 1L)
    st.createMatview("aagg", """SELECT g, count(*) AS n_rows,
      avg(x) AS avg_x FROM abase GROUP BY g""")
    st.refreshMatview("aagg") // registers for IVM + builds hidden state
    def fullRecompute() = st.read("abase").groupBy("g")
      .agg(count(lit(1)).cast("long").as("n_rows"), avg($"x").as("avg_x"))
    def check() = {
      val got = st.read("aagg").orderBy("g").collect().toSeq
      val want = fullRecompute().orderBy("g").collect().toSeq
      got.zip(want).foreach { case (g, w) =>
        assert(g.getString(0) == w.getString(0) && g.getLong(1) == w.getLong(1))
        assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-9, s"$g vs $w")
      }
      // the hidden sum/count state never leaks into the public surface
      assert(!got.head.schema.fieldNames.exists(_.startsWith("__ivm_")))
      assert(!spark.table("aagg").columns.exists(_.startsWith("__ivm_")))
    }
    check()
    // append-only refresh stays O(new files)
    st.appendCompacting("abase", rows(301 to 340), maxFileBytes = 1L)
    st.refreshMatview("aagg")
    assert(st.lastRefreshIncremental)
    check()
    // deletion: avg retracts exactly — INCREMENTAL, unlike min/max
    st.deleteByKey("abase", Seq(3L, 14L, 21L).toDF("k"), "k")
    val (readN, totalN) = st.incrementalRefresh("aagg")
    assert(readN > 0 && readN < totalN,
      s"avg delete should stay incremental: read $readN of $totalN")
    check()
  }

  test("incremental matview refresh stays correct on a hive-partitioned base") {
    import spark.implicits._
    val st = freshStore()
    def rows(r: Range) = r.map(k => (k.toLong, s"g${k % 4}", k.toLong * 2)).toDF("k", "g", "x")
    st.replacePartitioned("pbase", rows(1 to 200), "g")
    st.createIncrementalMatview("pagg", "pbase", Seq("g"), Seq("x"))
    def fullRecompute() = st.read("pbase").groupBy("g")
      .agg(count(lit(1)).cast("long").as("n_rows"), sum($"x").as("sum_x"))
    assert(st.read("pagg").orderBy("g").collect().toSeq ==
      fullRecompute().orderBy("g").collect().toSeq)
    // a partitioned rewrite must neither silently no-op (the non-recursive
    // listing saw zero files in key=value subdirs) nor null out the
    // partition column (bare leaf-file reads lose hive dir values)
    st.replacePartitioned("pbase", rows(1 to 260), "g")
    val (read1, total1) = st.incrementalRefresh("pagg")
    assert(read1 > 0, "partitioned refresh silently no-opped")
    assert(total1 > 0)
    val got = st.read("pagg").orderBy("g").collect().toSeq
    assert(got == fullRecompute().orderBy("g").collect().toSeq, got.toString)
    assert(!got.exists(_.isNullAt(0)), "partition column nulled in delta agg")
  }

  test("SQL matviews with additive-aggregate shape refresh incrementally") {
    import spark.implicits._
    val st = freshStore()
    def rows(r: Range) = r.map(k => (k.toLong, s"g${k % 3}", k.toLong)).toDF("k", "g", "x")
    st.appendCompacting("ivt", rows(1 to 300), maxFileBytes = 1L)
    st.createMatview("ivt_mv",
      "SELECT g, count(*) AS n, sum(x) AS total FROM ivt GROUP BY g")
    assert(st.read("ivt_mv").columns.toSeq == Seq("g", "n", "total"))
    st.appendCompacting("ivt", rows(301 to 330), maxFileBytes = 1L)
    st.refreshMatview("ivt_mv")
    assert(st.lastRefreshIncremental, "additive defn must take the IVM path")
    assert(st.read("ivt_mv").orderBy("g").collect().toSeq ==
      spark.sql("SELECT g, count(*) AS n, sum(x) AS total FROM ivt GROUP BY g")
        .orderBy("g").collect().toSeq)
    // min/max maintain incrementally while refreshes are append-only...
    st.createMatview("ivt_mv2",
      "SELECT g, count(*) AS n, min(x) AS lo, max(x) AS hi FROM ivt GROUP BY g")
    st.appendCompacting("ivt", rows(331 to 360), maxFileBytes = 1L)
    st.refreshMatview("ivt_mv2")
    assert(st.lastRefreshIncremental)
    def recompute2() = spark.sql(
      "SELECT g, count(*) AS n, min(x) AS lo, max(x) AS hi FROM ivt GROUP BY g")
    assert(st.read("ivt_mv2").orderBy("g").collect().toSeq ==
      recompute2().orderBy("g").collect().toSeq)
    // ...and stay CORRECT when files are removed (internal full rebuild:
    // a deleted row can hold the current min)
    st.deleteByKey("ivt", Seq(1L, 2L, 3L).toDF("k"), "k")
    st.refreshMatview("ivt_mv2")
    assert(st.read("ivt_mv2").orderBy("g").collect().toSeq ==
      recompute2().orderBy("g").collect().toSeq)
    // a non-additive definition keeps the full-recompute path
    st.createMatview("ivt_mv3",
      "SELECT g, avg(x) AS ax FROM ivt GROUP BY g")
    st.refreshMatview("ivt_mv3")
    assert(!st.lastRefreshIncremental)
    assert(st.read("ivt_mv3").count() == 3)
  }

  test("stddev/variance matviews maintain through hidden sumsq state") {
    import spark.implicits._
    val st = freshStore()
    // x null on every 6th key: the (n-1) divisor must count non-null rows
    def rows(r: Range) = r.map(k => (k.toLong, s"g${k % 3}",
      if (k % 6 == 0) None else Some(k.toDouble * 1.5))).toDF("k", "g", "x")
    st.appendCompacting("dbase", rows(1 to 240), maxFileBytes = 1L)
    st.createMatview("dagg", """SELECT g, count(*) AS n_rows,
      stddev(x) AS sd_x, var_samp(x) AS var_x FROM dbase GROUP BY g""")
    def fullRecompute() = st.read("dbase").groupBy("g")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        stddev($"x").as("sd_x"), var_samp($"x").as("var_x"))
    def check() = {
      val got = st.read("dagg").orderBy("g").collect().toSeq
      val want = fullRecompute().orderBy("g").collect().toSeq
      got.zip(want).foreach { case (g, w) =>
        assert(g.getString(0) == w.getString(0) && g.getLong(1) == w.getLong(1))
        assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-6, s"$g vs $w")
        assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-6, s"$g vs $w")
      }
      assert(!spark.table("dagg").columns.exists(_.startsWith("__ivm_")))
    }
    check()
    // append-only refresh stays incremental
    st.appendCompacting("dbase", rows(241 to 280), maxFileBytes = 1L)
    st.refreshMatview("dagg")
    assert(st.lastRefreshIncremental, "stddev defn must take the IVM path")
    check()
    // retraction via delete (file rewrite): sumsq retracts exactly
    st.deleteByKey("dbase", Seq(5L, 12L, 30L).toDF("k"), "k")
    val (readN, totalN) = st.incrementalRefresh("dagg")
    assert(readN > 0 && readN < totalN,
      s"stddev delete should stay incremental: read $readN of $totalN")
    check()
  }

  test("WHERE-filtered matviews refresh incrementally") {
    import spark.implicits._
    val st = freshStore()
    def rows(r: Range) = r.map(k => (k.toLong, s"g${k % 3}", k.toLong)).toDF("k", "g", "x")
    st.appendCompacting("wbase", rows(1 to 300), maxFileBytes = 1L)
    val defn = "SELECT g, count(*) AS n, sum(x) AS total FROM wbase WHERE x % 2 = 0 GROUP BY g"
    st.createMatview("wagg", defn)
    def recompute() = spark.sql(defn)
    assert(st.read("wagg").orderBy("g").collect().toSeq ==
      recompute().orderBy("g").collect().toSeq)
    st.appendCompacting("wbase", rows(301 to 340), maxFileBytes = 1L)
    st.refreshMatview("wagg")
    assert(st.lastRefreshIncremental, "single-table WHERE must take the IVM path")
    assert(st.read("wagg").orderBy("g").collect().toSeq ==
      recompute().orderBy("g").collect().toSeq)
    // retraction: the filter commutes with the file diff
    st.deleteByKey("wbase", Seq(2L, 4L, 7L).toDF("k"), "k")
    val (readN, totalN) = st.incrementalRefresh("wagg")
    assert(readN > 0 && readN < totalN)
    assert(st.read("wagg").orderBy("g").collect().toSeq ==
      recompute().orderBy("g").collect().toSeq)
    // the API form takes a filter too
    st.createIncrementalMatview("wagg2", "wbase", Seq("g"), Seq("x"),
      where = Some("x > 100"))
    assert(st.read("wagg2").orderBy("g").collect().toSeq ==
      st.read("wbase").filter($"x" > 100).groupBy("g")
        .agg(count(lit(1)).cast("long").as("n_rows"), sum($"x").as("sum_x"))
        .orderBy("g").collect().toSeq)
    // a volatile filter must NOT register for incremental refresh
    st.createMatview("wagg3",
      "SELECT g, count(*) AS n FROM wbase WHERE rand() < 2 GROUP BY g")
    st.refreshMatview("wagg3")
    assert(!st.lastRefreshIncremental)
    intercept[IllegalArgumentException] {
      st.createIncrementalMatview("wagg4", "wbase", Seq("g"), Seq("x"),
        where = Some("rand() < 2"))
    }
  }

  test("change feed is the logical row diff, reading only changed files") {
    import spark.implicits._
    val st = freshStore()
    val base = (1L to 1000L).map(k => (k, s"v$k")).toDF("k", "v")
    st.replaceSorted("cf", base, "k", numFiles = 8)
    val v0 = st.currentVersion("cf")
    // no writes yet: empty feed (and the schema still carries _change_type)
    val empty = st.changesSince("cf", v0)
    assert(empty.isEmpty && empty.columns.contains("_change_type"))
    // append new keys (existing files carry by name), then COW-delete two
    // keys — the delete rewrites ONLY the file(s) holding them
    st.appendCompacting("cf",
      (1001L to 1100L).map(k => (k, s"v$k")).toDF("k", "v"), maxFileBytes = 1L)
    st.deleteByKey("cf", Seq(5L, 6L).toDF("k"), "k")
    val feed = st.readChanges("cf", v0, st.currentVersion("cf"))
    val ins = feed.filter($"_change_type" === "insert")
      .select("k").as[Long].collect().toSet
    val del = feed.filter($"_change_type" === "delete")
      .select("k").as[Long].collect().toSet
    assert(ins == (1001L to 1100L).toSet,
      s"rewritten-but-unchanged rows must cancel; got ${ins.size} inserts")
    assert(del == Set(5L, 6L))
    // O(delta), not O(table): the diff touched fewer files than the table
    val (changed, total) = st.lastChangeFiles
    assert(changed < total, s"change feed read $changed of $total files")
    // reversed bounds swap insert/delete (a rollback's view of the diff)
    val rev = st.readChanges("cf", st.currentVersion("cf"), v0)
    assert(rev.filter($"_change_type" === "insert")
      .select("k").as[Long].collect().toSet == Set(5L, 6L))
    // a rename between the snapshots is metadata-only: the feed reads both
    // sides under the physical union schema and surfaces LOGICAL names
    // (appendCompacting keeps the mapping; a full replace would reset it)
    st.renameColumn("cf", "v", "w")
    st.appendCompacting("cf", Seq((2000L, "new")).toDF("k", "w"))
    val evolved = st.changesSince("cf", v0)
    assert(evolved.columns.toSeq == Seq("k", "w", "_change_type"))
    assert(evolved.filter($"_change_type" === "insert" && $"k" === 2000L).count() == 1)
  }

  test("store tables are SQL-resolvable like the reference's shell tables") {
    import spark.implicits._
    val st = freshStore()
    st.replace("synced_tbl", (1L to 30L).map(k => (k, s"v$k")).toDF("k", "v"))
    assert(spark.sql("SELECT count(*) AS n FROM synced_tbl").collect()(0).getLong(0) == 30)
    // the view tracks version flips: an upsert is visible on the next query
    st.upsert("synced_tbl", Seq((31L, "new")).toDF("k", "v"), "k")
    assert(spark.sql("SELECT count(*) AS n FROM synced_tbl").collect()(0).getLong(0) == 31)
    // a NEW store over the same warehouse (process restart) republishes
    Tables.invalidate() // simulate a fresh session's registration pass
    val wh = st.read("synced_tbl").inputFiles.head
      .replaceAll("file:", "").replaceAll("/synced_tbl/.*", "")
    val st2 = new Store(spark, wh)
    assert(spark.sql("SELECT max(k) AS m FROM synced_tbl").collect()(0).getLong(0) == 31)
    // drop removes resolution
    st2.drop("synced_tbl")
    intercept[Exception] { spark.sql("SELECT 1 FROM synced_tbl").collect() }
  }

  test("approx-distinct matviews maintain mergeable HLL sketch state") {
    import spark.implicits._
    val st = freshStore()
    def rows(r: Range) = r.map(k => (k.toLong, s"g${k % 3}", s"u${k % 40}"))
      .toDF("k", "g", "u")
    st.appendCompacting("hbase", rows(1 to 200), maxFileBytes = 1L)
    st.createMatview("hagg", """SELECT g, count(*) AS n_rows,
      approx_count_distinct(u) AS nd_u FROM hbase GROUP BY g""")
    def check(tolerance: Double = 0.05) = {
      val got = st.read("hagg").orderBy("g").collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      val exact = st.read("hbase").groupBy("g")
        .agg(countDistinct($"u").as("nd")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (g, e) =>
        assert(math.abs(got(g) - e).toDouble / e <= tolerance,
          s"group $g: estimate ${got(g)} vs exact $e") }
      assert(!spark.table("hagg").columns.exists(_.startsWith("__ivm_")))
    }
    check()
    // append-only refresh merges sketches incrementally
    st.appendCompacting("hbase", rows(201 to 280), maxFileBytes = 1L)
    st.refreshMatview("hagg")
    assert(st.lastRefreshIncremental, "hll defn must take the IVM path")
    check()
    // a delete cannot retract a sketch: full rebuild, still correct
    st.deleteByKey("hbase", (1L to 150L).toSeq.toDF("k"), "k")
    val (readN, totalN) = st.incrementalRefresh("hagg")
    assert(readN == totalN, "removal must force a full rebuild for sketches")
    check()
    // restart durability: a fresh instance keeps maintaining
    val st2 = new Store(spark, st.warehouse)
    st2.appendCompacting("hbase", rows(281 to 300), maxFileBytes = 1L)
    st2.refreshMatview("hagg")
    assert(st2.lastRefreshIncremental)
  }

  test("star-join matviews maintain from fact-file diffs while dims hold") {
    import spark.implicits._
    val st = freshStore()
    def facts(r: Range) = r.map(k =>
      (k.toLong, k.toLong % 7, k.toLong % 5, k.toLong * 2)).toDF("k", "cust", "prod", "amt")
    st.appendCompacting("jfact", facts(1 to 300), maxFileBytes = 1L)
    st.replace("jcust", (0L to 6L).map(c => (c, s"region${c % 3}")).toDF("c_id", "region"))
    st.replace("jprod", (0L to 4L).map(p => (p, s"cat${p % 2}")).toDF("p_id", "cat"))
    st.createMatview("jagg", """SELECT region, cat, count(*) AS n_rows,
      sum(amt) AS sum_amt, avg(amt) AS avg_amt
      FROM jfact JOIN jcust ON jfact.cust = jcust.c_id
      JOIN jprod ON jfact.prod = jprod.p_id
      WHERE cat <> 'cat9' GROUP BY region, cat""")
    def fullRecompute(s: Store = st) = s.read("jfact").as("jfact")
      .join(s.read("jcust").as("jcust"), expr("jfact.cust = jcust.c_id"))
      .join(s.read("jprod").as("jprod"), expr("jfact.prod = jprod.p_id"))
      .filter("cat <> 'cat9'")
      .groupBy("region", "cat")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum($"amt").as("sum_amt"), avg($"amt").as("avg_amt"))
    def check() = assert(
      st.read("jagg").orderBy("region", "cat").collect().toSeq ==
        fullRecompute().orderBy("region", "cat").collect().toSeq)
    check()
    // append-only fact refresh: incremental, O(new fact files)
    st.appendCompacting("jfact", facts(301 to 360), maxFileBytes = 1L)
    st.refreshMatview("jagg")
    assert(st.lastRefreshIncremental, "star defn must take the IVM path")
    check()
    // fact delete: exact retraction through the joined delta (keys within
    // one file's range, so the diff touches that file, not the table)
    st.deleteByKey("jfact", Seq(3L, 5L, 77L).toDF("k"), "k")
    val (readN, totalN) = st.incrementalRefresh("jagg")
    assert(readN > 0 && readN < totalN,
      s"fact delete should stay incremental: read $readN of $totalN")
    check()
    // a DIM change invalidates joined rows everywhere: full rebuild, still
    // correct, and the next fact-only refresh is incremental again
    st.upsert("jcust", Seq((2L, "region9")).toDF("c_id", "region"), "c_id")
    val (readAll, totalAll) = st.incrementalRefresh("jagg")
    assert(readAll == totalAll, "dim change must force a full rebuild")
    check()
    st.appendCompacting("jfact", facts(361 to 380), maxFileBytes = 1L)
    st.refreshMatview("jagg")
    assert(st.lastRefreshIncremental, "fact-only refresh incremental after dim rebuild")
    check()
    // durability: a fresh store instance restores the join meta and keeps
    // maintaining incrementally
    val st2 = new Store(spark, st.warehouse)
    st2.appendCompacting("jfact", facts(381 to 400), maxFileBytes = 1L)
    st2.refreshMatview("jagg")
    assert(st2.lastRefreshIncremental, "restored join meta must stay incremental")
    assert(st2.read("jagg").orderBy("region", "cat").collect().toSeq ==
      fullRecompute(st2).orderBy("region", "cat").collect().toSeq)
  }

  test("concurrent insert-only stagings both COMMIT; the second merges") {
    import spark.implicits._
    val st = freshStore()
    st.replace("ci_t", Seq((1L, "a")).toDF("k", "v"))
    val s1 = st.newStaging(); val s2 = st.newStaging()
    st.withStaging(s1)(st.appendCompacting("ci_t", Seq((2L, "b")).toDF("k", "v")))
    st.withStaging(s2)(st.appendCompacting("ci_t", Seq((3L, "c")).toDF("k", "v")))
    assert(st.read("ci_t").count() == 1, "both stagings invisible")
    st.commitStaging(s1)
    assert(st.read("ci_t").count() == 2)
    // s2's base moved: the insert-only commit MERGES (links s1's delta
    // into its head) instead of raising a serialization failure
    st.commitStaging(s2)
    assert(st.read("ci_t").select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    val cur = st.currentVersion("ci_t")
    assert(st.readVersion("ci_t", cur - 1).count() == 2,
      "merged history stays contiguous (time travel to the mid version)")
    // a fresh mount resolves the merged version from the persisted catalog
    val st2 = new Store(spark, st.warehouse)
    assert(st2.read("ci_t").count() == 3)
  }

  test("an updater merges past interleaved registered insert commits (PG RR shape)") {
    import spark.implicits._
    val st = freshStore()
    st.replace("um_t", Seq((1L, "old"), (2L, "keep")).toDF("k", "v"))
    val u = st.newStaging()
    st.withStaging(u)(
      st.upsert("um_t", Seq((1L, "new")).toDF("k", "v"), "k")) // claims gate
    // two gateless insert txns commit while the updater is open
    Seq((3L, "i1"), (4L, "i2")).foreach { r =>
      val i = st.newStaging()
      st.withStaging(i)(st.appendCompacting("um_t", Seq(r).toDF("k", "v")))
      st.commitStaging(i)
    }
    assert(st.read("um_t").count() == 4)
    assert(st.read("um_t").filter(col("k") === 1L).head.getString(1) == "old",
      "updater still uncommitted")
    // base moved only past REGISTERED pure-insert deltas: the updater's
    // COMMIT links them into its COW head — PG RR: concurrently-inserted
    // rows are invisible to the update and survive it
    st.commitStaging(u)
    val got = st.read("um_t").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "new"), (2L, "keep"), (3L, "i1"), (4L, "i2")), got)
  }

  test("insert-only staging commits past an UNREGISTERED interleave via carry") {
    import spark.implicits._
    val st = freshStore()
    st.replace("cf_t", Seq((1L, "a")).toDF("k", "v"))
    val s = st.newStaging()
    st.withStaging(s)(st.appendCompacting("cf_t", Seq((2L, "b")).toDF("k", "v")))
    // a compacting autocommit append rewrites small files — its delta is
    // impure, so it does NOT register; the insert txn must fall back to
    // carrying the current version + its own delta files
    st.appendCompacting("cf_t", Seq((3L, "c")).toDF("k", "v"))
    st.commitStaging(s)
    assert(st.read("cf_t").select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }
}
