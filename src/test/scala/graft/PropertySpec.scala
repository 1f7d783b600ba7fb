package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the pure translation/hashing layers (no
  * SparkSession needed — these run in milliseconds and pin invariants the
  * golden tests can't enumerate). Generators are driven from a fixed seed so
  * failures reproduce. */
class PropertySpec extends AnyFunSuite {

  /** 200 deterministic samples of `gen`. */
  private def samples[A](gen: Gen[A]): Seq[A] = {
    var seed = Seed(42L)
    (1 to 200).flatMap { _ =>
      val v = gen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  private val ident: Gen[String] =
    for {
      h <- Gen.alphaChar
      t <- Gen.alphaNumStr
    } yield (h +: t.take(11)).mkString

  test("splitStatements preserves content and never splits inside quotes") {
    val stmt = for {
      tbl <- ident
      lit <- Gen.alphaNumStr.map(_.take(8))
    } yield s"SELECT '$lit;x' FROM $tbl"
    samples(Gen.listOfN(3, stmt)).foreach { stmts =>
      val joined = stmts.mkString("; ")
      val split = PgDialect.splitStatements(joined)
      assert(split.size == stmts.size)
      split.zip(stmts).foreach { case (got, want) => assert(got == want.trim) }
    }
  }

  test("scalar sublink rewrite is append-only and balance-preserving (property)") {
    // random queries mixing expression-position sublinks, table-position
    // subqueries, string literals containing '(SELECT', and nesting: the
    // rewrite may ONLY insert " LIMIT 1" tokens, never reorder or drop
    // text, and the result keeps parentheses balanced
    val lit = Gen.oneOf("'x'", "'(SELECT a FROM b)'", "'it''s'")
    val scalarPos = Gen.oneOf(
      "SELECT (SELECT v FROM t) AS a FROM o",
      "SELECT a, (SELECT max(v) FROM t WHERE k = a) FROM o",
      "SELECT * FROM o WHERE x = (SELECT v FROM t ORDER BY v)",
      "SELECT coalesce((SELECT v FROM t), 0) AS c FROM o")
    val tablePos = Gen.oneOf(
      "SELECT * FROM (SELECT v FROM t) s",
      "SELECT * FROM o WHERE x IN (SELECT v FROM t)",
      "SELECT * FROM o WHERE EXISTS (SELECT 1 FROM t WHERE t.k = o.k)",
      "SELECT * FROM o JOIN (SELECT v FROM t) s ON s.v = o.x")
    val q = for {
      base <- Gen.oneOf(scalarPos, tablePos).flatMap(g => g)
      l <- lit
      wrap <- Gen.oneOf(true, false)
    } yield {
      val withLit = base.replace("'x'", l)
      if (wrap) s"SELECT * FROM ($withLit) w WHERE 1 = (SELECT 1)" else withLit
    }
    def balance(s: String): Int = {
      var d = 0; var inQ = false
      s.foreach { c =>
        if (inQ) { if (c == '\'') inQ = false }
        else if (c == '\'') inQ = true
        else if (c == '(') d += 1
        else if (c == ')') d -= 1
      }
      d
    }
    samples(q).foreach { sql =>
      val out = PgDialect.rewriteScalarSublinks(sql)
      assert(out.replace(" LIMIT 1", "") == sql.replace(" LIMIT 1", ""),
        s"not append-only:\nin:  $sql\nout: $out")
      assert(balance(out) == balance(sql), s"unbalanced: $out")
      // idempotent: a second pass adds nothing (all sublinks now have LIMIT)
      assert(PgDialect.rewriteScalarSublinks(out) == out, s"not idempotent: $out")
    }
  }

  test("rolling hash equals the wrapping-fold reference on arbitrary strings") {
    import org.apache.spark.unsafe.types.UTF8String
    val cpGen = Gen.listOf(Gen.frequency(
      8 -> Gen.choose(1, 0x7f),          // ascii
      2 -> Gen.choose(0x80, 0xD7FF),     // BMP below surrogates
      1 -> Gen.choose(0x10000, 0x10FFFF) // astral
    ))
    samples(cpGen).foreach { cps =>
      val chars = cps.toArray.flatMap(Character.toChars)
      val s = new String(chars)
      val want = cps.foldLeft(0L)((h, cp) => h * 1000003L + cp)
      assert(RollingHashUtil.hash(UTF8String.fromString(s)) == want)
    }
  }

  test("to_char never throws, and renders every well-formed pattern") {
    val ts = java.sql.Timestamp.valueOf("2024-03-05 07:08:09")
    val fmtGen = Gen.listOf(Gen.oneOf(
      "YYYY", "MM", "DD", "HH24", "MI", "SS", "Mon", "Day",
      "-", " ", ":", "/", "T", "Q")).map(_.mkString)
    samples(fmtGen).foreach { fmt =>
      PgFunctions.formatTs(ts, fmt) // totality: null on inexpressible, no throw
    }
    assert(PgFunctions.formatTs(ts, "YYYY-MM-DD HH24:MI:SS") == "2024-03-05 07:08:09")
    assert(PgFunctions.formatTs(ts, "SSSS") == null) // PG seconds-past-midnight: inexpressible
  }

  test("cast rewrite always produces balanced parentheses and a CAST") {
    val castGen = for {
      id <- ident
      tpe <- Gen.oneOf("int4", "int8", "text", "numeric(10,2)", "bool", "float8")
    } yield s"SELECT $id::$tpe FROM t"
    samples(castGen).foreach { sql =>
      val out = PgDialect.translateSelect(sql)
      assert(out.count(_ == '(') == out.count(_ == ')'), out)
      assert(out.contains("CAST("), out)
    }
  }

  test("wire $n substitution never rewrites inside literals/comments (property)") {
    val srv = new PgWireServer(null, null, 0) // tokenizer only, no socket/session
    val litBody: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const("$1"), Gen.const("$2"),
      Gen.const("''"), Gen.const(" "), Gen.const("-- not a comment"),
      Gen.const("$tag$"))).map(_.mkString.take(40))
    val arg: Gen[String] = Gen.oneOf(Gen.const("42"), Gen.const("O'Brien"),
      Gen.alphaNumStr.map(_.take(8)))
    val cases = samples(Gen.zip(litBody, arg))
    cases.foreach { case (body, a) =>
      val lit = "'" + body.replace("'", "''") + "'"
      val sql = s"SELECT $lit AS c, $$1 WHERE x = $lit -- tail $$1\n"
      val out = srv.substituteParams(sql, Seq(a))
      val expectArg = if (a.matches("-?\\d+(\\.\\d+)?")) a
        else "'" + a.replace("'", "''") + "'"
      // the two literal occurrences survive byte-for-byte
      assert(out.startsWith(s"SELECT $lit AS c, "), out)
      assert(out.contains(s"WHERE x = $lit"), out)
      // the bare $1 was substituted; the commented $1 was not
      assert(out.contains(s"AS c, $expectArg WHERE"), out)
      assert(out.endsWith("-- tail $1\n"), out)
    }
    // dollar-quoted strings pass through verbatim
    val dq = srv.substituteParams("SELECT $body$ keep $1 here $body$, $1", Seq("7"))
    assert(dq == "SELECT $body$ keep $1 here $body$, 7", dq)
  }
}
