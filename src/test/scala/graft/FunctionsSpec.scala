package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the pure parts of the PG-compat shim layer. */
class FunctionsSpec extends AnyFunSuite {

  test("to_char pattern translation") {
    assert(PgFunctions.translateToCharPattern("YYYY-MM-DD") == "yyyy-MM-dd")
    assert(PgFunctions.translateToCharPattern("HH24:MI:SS") == "HH:mm:ss")
    assert(PgFunctions.translateToCharPattern("DD Mon YYYY") == "dd MMM yyyy")
    assert(PgFunctions.translateToCharPattern("HH12 PM") == "hh a")
    // unknown letters are quoted, punctuation passes through
    assert(PgFunctions.translateToCharPattern("T") == "'T'")
  }

  test("session settings registry") {
    assert(SessionSettings.get("server_version").contains("17.0"))
    assert(SessionSettings.get("SEARCH_PATH").contains("\"$user\", public"))
    SessionSettings.set("my_knob", "42")
    assert(SessionSettings.get("my_knob").contains("42"))
    assert(SessionSettings.get("missing").isEmpty)
  }

  test("settings are scoped per session: one connection's SET is invisible to others") {
    val s1 = SparkSpecBase.session.newSession()
    val s2 = SparkSpecBase.session.newSession()
    SessionSettings.withSession(s1) {
      SessionSettings.set("graft.schema_label", "postgres")
      SessionSettings.set("application_name", "client_one")
    }
    SessionSettings.withSession(s2) {
      // s2 sees defaults, not s1's overrides — the PG per-connection contract
      assert(SessionSettings.get("graft.schema_label").isEmpty)
      assert(SessionSettings.get("application_name").isEmpty)
      SessionSettings.set("application_name", "client_two")
    }
    SessionSettings.withSession(s1) {
      assert(SessionSettings.get("application_name").contains("client_one"))
      assert(SessionSettings.get("graft.schema_label").contains("postgres"))
    }
    // the shared session's scope (active-session fallback) is untouched
    assert(SessionSettings.get("graft.schema_label").isEmpty)
  }

  test("pg type oids mirror the reference mapping") {
    assert(PgCatalog.pgTypeOf(IntegerType) == (23, "integer"))
    assert(PgCatalog.pgTypeOf(LongType) == (20, "bigint"))
    assert(PgCatalog.pgTypeOf(DoubleType) == (701, "double precision"))
    assert(PgCatalog.pgTypeOf(StringType) == (25, "text"))
    assert(PgCatalog.pgTypeOf(TimestampType)._1 == 1184)
    assert(PgCatalog.pgTypeOf(ArrayType(FloatType)) == (1021, "real[]"))
    assert(PgCatalog.pgTypeOf(ArrayType(StringType))._1 == 1009)
    assert(PgCatalog.pgTypeOf(DecimalType(12, 2)) == (1700, "numeric"))
  }
}

/** SQL-surface behavior of registered shims. */
class FunctionsSqlSpec extends SparkSpecBase {

  test("shims visible from SQL after registration") {
    Tables.registerAll(spark, sfDir)
    val r = spark.sql(
      "SELECT version() AS v, quote_ident('we\"ird') AS q, pg_format('%s=%d', 'x', 7) AS f")
      .collect()(0)
    assert(r.getString(0).startsWith("PostgreSQL 17.0"))
    assert(r.getString(1) == "\"we\"\"ird\"")
    assert(r.getString(2) == "x=7")
  }

  test("sum128 survives long overflow and matches plain sum below it") {
    Tables.registerAll(spark, sfDir)
    import spark.implicits._
    // 4 * 2^62 = 2^64 overflows a long sum (wraps to 0); sum128 is exact
    val big = Seq.fill(4)(Long.MaxValue / 2 + 1).toDF("x")
    big.createOrReplaceTempView("big_vals")
    val exact = spark.sql("SELECT CAST(sum128(x) AS STRING) AS s FROM big_vals")
      .collect()(0).getString(0)
    assert(exact == BigInt("18446744073709551616").toString)
    // the failure mode sum128 exists to avoid: builtin sum overflows (ANSI)
    intercept[Exception] {
      spark.sql("SELECT sum(x) AS s FROM big_vals").collect()
    }
    // negative mix + null handling
    Seq(Some(5L), None, Some(-7L), Some(100L)).toDF("x")
      .createOrReplaceTempView("mix_vals")
    val mixed = spark.sql("SELECT CAST(sum128(x) AS STRING) FROM mix_vals")
      .collect()(0).getString(0)
    assert(mixed == "98")
    // agrees with the builtin on in-range data
    val both = spark.sql("""
      SELECT CAST(sum128(CAST(l_quantity AS BIGINT)) AS STRING) AS a,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS STRING) AS b
      FROM lineitem""").collect()(0)
    assert(both.getString(0) == both.getString(1))
  }

  test("approx sketches land within tolerance of exact answers") {
    Tables.registerAll(spark, sfDir)
    val row = run("fn_approx_sketches").collect()(0)
    val exactParts = Tables.df(spark, sfDir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(row.getLong(row.fieldIndex("exact_parts")) == exactParts)
    // every sketch-vs-exact bound check must hold
    for (c <- Seq("approx_parts_ok", "approx_orders_ok", "p50_ok", "p90_ok", "p99_ok"))
      assert(row.getBoolean(row.fieldIndex(c)), s"$c is false")
  }

  test("set_config round-trips through current_setting") {
    Tables.registerAll(spark, sfDir)
    val v = spark.sql("SELECT set_config('app.name', 'graft', false) AS v")
      .collect()(0).getString(0)
    assert(v == "graft")
    val got = spark.sql("SELECT current_setting('app.name') AS v")
      .collect()(0).getString(0)
    assert(got == "graft")
  }

  test("array_dot/array_cos match the HOF fold incl. null and length cases") {
    Tables.registerAll(spark, sfDir)
    val hof = "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    val rows = spark.sql(
      s"""SELECT array_dot(a, b) AS fast, $hof AS slow,
         |  array_cos(a, b) AS fastc,
         |  $hof / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0D, (acc, x) -> acc + x))
         |        * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x))) AS slowc
         |FROM VALUES
         |  (array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)),
         |  (array(-1.5D, 0.0D),      array(2.0D, -7.25D)),
         |  (array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)),
         |  (array(1.0D, 2.0D), array(1.0D)),
         |  (CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))
         |AS t(a, b)""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"dot null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"dot: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"cos null mismatch: $r")
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3), s"cos: $r")
    }
    // non-numeric arrays are an analysis error, not garbage
    intercept[Exception] {
      spark.sql("SELECT array_dot(array(1, 2), array(3, 4))").collect()
    }
  }
}
