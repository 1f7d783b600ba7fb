package graft

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.spark.sql.functions._

/** The Store/Iceberg core write/read/prune lifecycle over a NON-file
  * Hadoop FileSystem with object-store semantics (copy+delete rename, no
  * append, no hard links) — converting the "all IO tested only on
  * file://" risk into a tested contract without an s3a jar. Everything
  * here runs the exact same engine code paths as the posix suites; only
  * the `warehouse` scheme differs. */
class ObjectStoreFsSpec extends SparkSpecBase {

  private lazy val base: java.nio.file.Path = {
    ObjectStoreFs.register(spark)
    java.nio.file.Files.createTempDirectory("graft-objstore")
  }
  private def objPath(sub: String) = s"graftobj://${base.resolve(sub)}"
  private lazy val store: Store = new Store(spark, objPath("wh"))

  test("the scheme genuinely lacks posix shortcuts: append refused, rename copies") {
    val fs = new HadoopPath(objPath("probe")).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(fs.isInstanceOf[ObjectStoreFs], s"wrong fs resolved: ${fs.getClass}")
    val f = new HadoopPath(objPath("probe/a.txt"))
    val o = fs.create(f); o.writeBytes("x"); o.close()
    intercept[UnsupportedOperationException](fs.append(f))
    // rename never clobbers
    val g = new HadoopPath(objPath("probe/b.txt"))
    val o2 = fs.create(g); o2.writeBytes("y"); o2.close()
    assert(!fs.rename(f, g), "clobbering rename must refuse like S3A")
    assert(fs.rename(f, new HadoopPath(objPath("probe/c.txt"))))
    assert(!fs.exists(f))
  }

  test("writer lease lifecycle works on the object-store scheme: claim, refuse, fence") {
    import spark.implicits._
    val st = new Store(spark, objPath("leasewh"))
    st.replace("os_lease_t", Seq((1L, "a")).toDF("k", "v"))
    // the claim landed as a lease object on the scheme
    val fs = new HadoopPath(objPath("leasewh")).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(fs.exists(new HadoopPath(objPath("leasewh/_lease.e1.json"))))
    // a live foreign holder at a higher epoch fences this writer
    val o = fs.create(new HadoopPath(objPath("leasewh/_lease.e2.json")))
    o.writeBytes(s"""{"proc":"foreign","pid":${ProcessHandle.current.pid},"host":"${Store.hostName}","ts":0}""")
    o.close()
    val e = intercept[IllegalStateException] {
      st.appendCompacting("os_lease_t", Seq((2L, "b")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("lease lost"), e.getMessage)
    // retraction held on the scheme too: a fresh mount sees only the seed
    assert(new Store(spark, objPath("leasewh")).read("os_lease_t").count() == 1)
  }

  test("replace + read round-trips through the object-store scheme") {
    import spark.implicits._
    ObjectStoreFs.renames.set(0L)
    store.replace("os_t", (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v"))
    val got = store.read("os_t")
    assert(got.count() == 200L)
    assert(got.filter(col("k") === 137L).head.getString(1) == "v137")
    assert(ObjectStoreFs.renames.get > 0,
      "the write must have exercised this scheme's rename (commit protocol)")
  }

  test("append, upsert and delete-by-key COW over copy+delete renames") {
    import spark.implicits._
    store.replace("os_dml", (1L to 100L).map(i => (i, s"a$i")).toDF("k", "v"))
    store.append("os_dml", Seq((101L, "a101")).toDF("k", "v"))
    assert(store.read("os_dml").count() == 101L)
    store.upsert("os_dml", Seq((50L, "UPDATED"), (102L, "a102")).toDF("k", "v"), "k")
    val r = store.read("os_dml")
    assert(r.count() == 102L)
    assert(r.filter(col("k") === 50L).head.getString(1) == "UPDATED")
    store.deleteByKey("os_dml", Seq(Tuple1(102L)).toDF("k"), "k")
    assert(store.read("os_dml").count() == 101L)
  }

  test("footer-pruned range reads plan over the scheme's metadata IO") {
    import spark.implicits._
    store.replaceSorted("os_rng",
      (1L to 1000L).map(i => (i, i % 7)).toDF("k", "m"), "k", numFiles = 4)
    val (df, hit, total) = store.readRange("os_rng", "k", 10L, 40L)
    assert(df.count() == 31L)
    assert(hit < total, s"pruning must skip files: $hit/$total")
  }

  test("version history and rollback survive without atomic rename") {
    import spark.implicits._
    store.replace("os_tt", Seq((1L, "one")).toDF("k", "v"))
    store.append("os_tt", Seq((2L, "two")).toDF("k", "v"))
    assert(store.readVersion("os_tt", 1).count() == 1L)
    assert(store.read("os_tt").count() == 2L)
    store.restoreVersion("os_tt", 1, expectedCurrent = 2)
    assert(store.read("os_tt").count() == 1L, "rollback is a pointer flip")
  }

  test("iceberg metadata tree publishes and plans pruned reads on the scheme") {
    import spark.implicits._
    store.replaceSorted("os_ice",
      (1L to 500L).map(i => (i, s"r$i")).toDF("k", "v"), "k", numFiles = 4)
    store.publishIceberg("os_ice")
    val tdir = new HadoopPath(objPath("wh/os_ice"))
    // pass the session conf explicitly: a bare `new Configuration()` knows
    // nothing about the test scheme (same situation as a custom fs.s3a
    // endpoint — callers hand the configured conf down)
    val hconf = spark.sessionState.newHadoopConf()
    val md = Iceberg.currentMetadataFile(tdir, hconf)
    assert(md.isDefined, "metadata.json must exist under the table dir")
    val planned = Iceberg.planFiles(tdir, conf = hconf)
    assert(planned.nonEmpty && planned.size == 4, s"manifest plans files: $planned")
    val back = Iceberg.readTable(spark, tdir)
    assert(back.count() == 500L, "metadata-planned read over the scheme")
  }

  test("vacuum reclaims crash-orphaned dirs through FileSystem ops only") {
    import spark.implicits._
    store.replace("os_vac", (1L to 50L).map(i => (i, i)).toDF("k", "v"))
    store.append("os_vac", Seq((51L, 51L)).toDF("k", "v"))
    store.append("os_vac", Seq((52L, 52L)).toDF("k", "v"))
    val (_, _, _) = store.vacuum("os_vac", full = true)
    assert(store.read("os_vac").count() == 52L, "vacuum preserves the snapshot")
  }

  test("staged COMMIT is metadata-only on the object-store scheme (alias, no data copy)") {
    import spark.implicits._
    store.replace("os_txn", Seq((1L, "a")).toDF("k", "v"))
    val txn = new PgDialect.PgTxn
    def exec(sql: String) = PgDialect.execute(spark, store, sql, txn)
    exec("BEGIN")
    exec("INSERT INTO os_txn VALUES (2, 'b')")
    assert(store.read("os_txn").count() == 1,
      "staged writes stay invisible on this scheme too")
    ObjectStoreFs.renames.set(0L)
    exec("COMMIT")
    // rename = copy+delete here, so a data-moving commit would copy every
    // staged byte; the alias commit renames ONLY the catalog json (1)
    assert(ObjectStoreFs.renames.get <= 1,
      s"COMMIT must not copy staged data dirs: ${ObjectStoreFs.renames.get} renames")
    assert(store.read("os_txn").count() == 2)
    // structurally: the committed version still LIVES in its staged dir
    // (an alias), no v2 dir was materialized
    val fs = new HadoopPath(store.warehouse).getFileSystem(
      spark.sessionState.newHadoopConf())
    val names = fs.listStatus(new HadoopPath(store.warehouse + "/os_txn"))
      .map(_.getPath.getName).toSeq
    assert(names.exists(n => n.startsWith(".txn") && n.endsWith("-v2")),
      s"expected the aliased staged dir to remain: $names")
    assert(!names.contains("v2"), s"no copied v2 dir may exist: $names")
    // a FRESH mount resolves the alias from the persisted catalog
    val st2 = new Store(spark, store.warehouse)
    assert(st2.read("os_txn").count() == 2)
    assert(st2.readVersion("os_txn", st2.currentVersion("os_txn")).count() == 2,
      "time travel to the aliased version must resolve")
    // vacuum's staged-orphan sweep must NOT reclaim the aliased dir, and
    // post-vacuum reads stay whole
    store.vacuum("os_txn")
    assert(store.read("os_txn").count() == 2,
      "vacuum must not reclaim an aliased committed version")
  }

  test("RR pin + read-own-writes survive a table whose current version is ALIASED") {
    import spark.implicits._
    def execT(sql: String, t: PgDialect.PgTxn): PgDialect.PgResult =
      PgDialect.execute(spark, store, sql, t)
    def count(t: PgDialect.PgTxn): Long =
      execT("SELECT count(*) AS n FROM os_rr", t) match {
        case PgDialect.Rows(df, _) => df.collect()(0).getLong(0)
        case other => fail(s"expected rows: $other")
      }
    store.replace("os_rr", Seq((1L, "a")).toDF("k", "v"))
    // staged commit #1 leaves the CURRENT version in an aliased .txn dir
    val w1 = new PgDialect.PgTxn
    execT("BEGIN", w1)
    execT("INSERT INTO os_rr VALUES (2, 'b')", w1)
    execT("COMMIT", w1)
    val fs = new HadoopPath(store.warehouse).getFileSystem(
      spark.sessionState.newHadoopConf())
    val names = fs.listStatus(new HadoopPath(store.warehouse + "/os_rr"))
      .map(_.getPath.getName).toSeq
    assert(names.exists(n => n.startsWith(".txn") && n.endsWith("-v2")) &&
      !names.contains("v2"), s"precondition: v2 must be aliased, got $names")
    // an RR reader pins at the ALIASED v2 — parseVersionDir must map the
    // .txn dir back to (os_rr, 2) or this txn silently reads the live chain
    val rr = new PgDialect.PgTxn
    execT("BEGIN ISOLATION LEVEL REPEATABLE READ", rr)
    assert(count(rr) == 2L) // pin lands here
    // concurrent commit moves the table to another aliased version (v3)
    val w2 = new PgDialect.PgTxn
    execT("BEGIN", w2)
    execT("INSERT INTO os_rr VALUES (3, 'c')", w2)
    execT("COMMIT", w2)
    assert(store.read("os_rr").count() == 3L)
    assert(count(rr) == 2L,
      "RR must keep reading its aliased pin, not the live aliased chain")
    // read-own-writes with an aliased base: the statement's fresh plan
    // binds the aliased current dir; the staged overlay must still engage
    val w3 = new PgDialect.PgTxn
    execT("BEGIN", w3)
    execT("INSERT INTO os_rr VALUES (4, 'd')", w3)
    assert(count(w3) == 4L, "a txn over an aliased base sees its own writes")
    execT("ROLLBACK", w3)
    execT("COMMIT", rr)
    assert(store.read("os_rr").count() == 3L)
  }
}

/** The ENTIRE StoreSpec lifecycle suite re-run with the warehouse on the
  * object-store-semantics scheme: replace/append/upsert/COW/merge/matview/
  * IVM/time-travel/txn-staging machinery over copy+delete rename, refused
  * append and no hard links — the production write target's contract
  * (reference: src/common/storage_utils.go:75-91), promoted from the seven
  * targeted cases above to the full lifecycle suite. */
class StoreObjectStoreSpec extends StoreSpec {
  override protected def wh(dir: String): String = {
    ObjectStoreFs.register(spark)
    "graftobj://" + dir
  }
}
