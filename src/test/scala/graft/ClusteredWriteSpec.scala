package graft

import org.apache.spark.sql.functions._

/** Write-path correctness on CLUSTERED (hive-partitioned / hidden-
  * partitioned / bucketed) tables — the r12 corruption class: the
  * non-recursive version-dir listing enumerated a hive version as EMPTY,
  * so appends/COW writes carried nothing (base rows silently vanished),
  * and an appended flat file beside a bucketed layout made Spark's
  * bucketed joins silently drop rows. Every case here failed before the
  * fix with data loss or wrong join results, not an error. */
class ClusteredWriteSpec extends SparkSpecBase {

  private def fresh(tag: String) = new Store(spark,
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString)

  test("append to a hive-partitioned table keeps every base row") {
    import spark.implicits._
    val st = fresh("cwap")
    st.replacePartitioned("cw_ap",
      (0L until 100L).map(i => (i, s"p${i % 3}")).toDF("k", "p"), "p")
    st.appendCompacting("cw_ap", Seq((200L, "p9")).toDF("k", "p"))
    val got = st.read("cw_ap")
    assert(got.count() == 101, s"base rows lost: ${got.count()}")
    assert(got.filter(col("p") === "p9").count() == 1)
    assert(got.filter(col("p").isNull).count() == 0,
      "partition values must come from the dir names, never null")
    // the delta landed IN a key=value dir — the version stays uniform hive
    val vdir = new org.apache.hadoop.fs.Path(
      s"${st.warehouse}/cw_ap/v${st.currentVersion("cw_ap")}")
    val fs = vdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(vdir).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")),
      "no flat data file may sit beside hive partition dirs")
    // footer row counts + time travel see the hive files
    assert(st.rowCountFast("cw_ap") == 101)
    assert(st.readVersion("cw_ap", st.currentVersion("cw_ap") - 1).count() == 100)
  }

  test("upsert / delete / update on a hive-partitioned table") {
    import spark.implicits._
    val st = fresh("cwup")
    st.replacePartitioned("cw_up",
      (0L until 100L).map(i => (i, s"p${i % 3}", i * 2)).toDF("k", "p", "x"), "p")
    // upsert moves a row ACROSS partitions (p2 -> p9)
    st.upsert("cw_up", Seq((5L, "p9", 999L)).toDF("k", "p", "x"), "k")
    val afterUp = st.read("cw_up")
    assert(afterUp.count() == 100, s"rows lost by upsert: ${afterUp.count()}")
    assert(afterUp.filter(col("k") === 5L).select("p", "x").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("p9", 999L)))
    assert(afterUp.filter(col("p").isNull).count() == 0)
    // delete by key
    st.deleteByKey("cw_up", Seq(Tuple1(7L)).toDF("k"), "k")
    assert(st.read("cw_up").count() == 99)
    assert(st.read("cw_up").filter(col("k") === 7L).count() == 0)
    // COW update through the WHERE path
    st.updateWhere("cw_up", Seq("x" -> "0"), Some("k >= 90"))
    val z = st.read("cw_up").filter(col("k") >= 90L)
    assert(z.count() == 10 && z.filter(col("x") =!= 0L).count() == 0)
    assert(st.read("cw_up").count() == 99, "update must not change row count")
  }

  test("append to a hidden-partitioned (transform) table re-derives dir fields") {
    import spark.implicits._
    val st = fresh("cwtr")
    val base = (0 until 60).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-${i % 3 + 1} 10:00:00"))
    }.toDF("id", "ts")
    st.replaceTransformPartitioned("cw_tr", base, "ts", "day")
    val delta = Seq((900L,
      java.sql.Timestamp.valueOf("2024-02-09 09:00:00"))).toDF("id", "ts")
    st.appendCompacting("cw_tr", delta)
    assert(st.read("cw_tr").count() == 61)
    assert(st.read("cw_tr")
      .filter(col("ts") >= lit("2024-02-01")).count() == 1)
    // the delta's derived day dir exists (re-computed from the source col)
    val vdir = new org.apache.hadoop.fs.Path(
      s"${st.warehouse}/cw_tr/v${st.currentVersion("cw_tr")}")
    val fs = vdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dayDirs = fs.listStatus(vdir).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("ts_day=")).sorted
    val wantDay = java.time.LocalDate.of(2024, 2, 9).toEpochDay
    assert(dayDirs.contains(s"ts_day=$wantDay"),
      s"delta must land in its derived epoch-day dir: ${dayDirs.toSeq}")
  }

  test("append to a bucketed table demotes the catalog layout; joins stay correct") {
    import spark.implicits._
    val st = fresh("cwbk")
    st.replaceBucketed("cw_b1",
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"), "k", 4)
    st.replaceBucketed("cw_b2",
      (0L until 300L by 2).map(i => (i, s"w$i")).toDF("k", "w"), "k", 4)
    // before any append: the bucketed catalog tables join exchange-free
    // (pinned in PlanSpec); here we only need RESULT correctness
    st.appendCompacting("cw_b1", Seq((200L, "x")).toDF("k", "v"))
    val j = spark.table("cw_b1").join(spark.table("cw_b2"), "k")
    val expected = ((0L until 100L) ++ Seq(200L))
      .toSet.intersect((0L until 300L by 2).toSet).size
    assert(j.count() == expected,
      s"bucketed join must see the appended row: ${j.count()} vs $expected")
    // the stale bucket registration is GONE (a plain view serves reads):
    // Spark planning a bucketed join over the mixed file set would have
    // silently dropped the appended row
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier("cw_b1")),
      "stale bucket layout must demote to a plain view")
    // VACUUM FULL re-applies the declared bucketing, catalog table returns
    st.vacuum("cw_b1", full = true)
    assert(spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier("cw_b1")),
      "VACUUM FULL must restore the bucketed registration")
    assert(spark.table("cw_b1").join(spark.table("cw_b2"), "k")
      .count() == expected)
  }

  test("hive edge cases: NULL / '='-bearing partition values, TRUNCATE, plain VACUUM") {
    import spark.implicits._
    val st = fresh("cwed")
    st.replacePartitioned("cw_ed",
      Seq((1L, "a"), (2L, null), (3L, "b c=d")).toDF("k", "p"), "p")
    val r = st.read("cw_ed")
    assert(r.count() == 3)
    assert(r.filter(col("p").isNull).count() == 1,
      "__HIVE_DEFAULT_PARTITION__ must round-trip as NULL")
    assert(r.filter(col("p") === "b c=d").count() == 1,
      "partition values escape '=' and spaces")
    st.appendCompacting("cw_ed", Seq((4L, null), (5L, "a")).toDF("k", "p"))
    assert(st.read("cw_ed").count() == 5)
    assert(st.read("cw_ed").filter(col("p").isNull).count() == 2)
    // TRUNCATE: an empty hive write has zero files and zero partition
    // dirs — the persisted schema marker keeps the version readable,
    // including from a FRESH mount (restart-safe)
    st.truncate("cw_ed")
    assert(st.read("cw_ed").count() == 0)
    assert(st.read("cw_ed").columns.toSeq == Seq("k", "p"))
    val st2 = new Store(spark, st.warehouse)
    assert(st2.read("cw_ed").count() == 0)
    st2.appendCompacting("cw_ed", Seq((9L, "z")).toDF("k", "p"))
    assert(st2.read("cw_ed").count() == 1)
    // plain (non-FULL) VACUUM walks the hive tree without corruption
    val st3 = fresh("cwvc")
    st3.replacePartitioned("cw_vc",
      (0L until 50L).map(i => (i, s"p${i % 2}")).toDF("k", "p"), "p")
    st3.appendCompacting("cw_vc", Seq((60L, "p0")).toDF("k", "p"))
    st3.vacuum("cw_vc")
    assert(st3.read("cw_vc").count() == 51)
    // footer-range pruning sees files inside the partition dirs
    val (rng, scanned, total) = st3.readRange("cw_vc", "k", 10L, 12L)
    assert(rng.count() == 3 && scanned < total,
      s"hive range read must prune: $scanned/$total")
  }

  test("hive layouts survive the change feed and a fresh mount") {
    import spark.implicits._
    val st = fresh("cwcf")
    st.replacePartitioned("cw_cf",
      (0L until 30L).map(i => (i, s"p${i % 2}")).toDF("k", "p"), "p")
    val v0 = st.currentVersion("cw_cf")
    st.appendCompacting("cw_cf", Seq((50L, "p1")).toDF("k", "p"))
    val ch = st.readChanges("cw_cf", v0, st.currentVersion("cw_cf"))
    val ins = ch.filter(col("_change_type") === "insert")
    assert(ins.count() == 1)
    assert(ins.select("p").head.getString(0) == "p1",
      "change feed must surface dir-borne partition values")
    val st2 = new Store(spark, st.warehouse)
    assert(st2.read("cw_cf").count() == 31)
    assert(st2.declaredLayout("cw_cf").map(_.kind).contains("partitioned"))
    st2.appendCompacting("cw_cf", Seq((51L, "p0")).toDF("k", "p"))
    assert(st2.read("cw_cf").count() == 32,
      "a restored mount must keep writing the hive layout")
  }
}
