package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
import org.apache.spark.sql.types._

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Session settings registry — the analog of the reference's
  * `duckdb_settings()` surface plus its SET/SHOW no-op handling
  * (/root/reference/src/server/query_remapper.go:19-32,131-140,
  * parser_show.go:19-91). SET statements from the dialect layer land here.
  *
  * Overrides are scoped PER SparkSession (weakly keyed, so closed derived
  * sessions drop off): each wire connection runs its own derived session,
  * and PG semantics require one connection's `SET search_path`/`SET
  * timezone` to be invisible to every other connection. A process-global
  * map here was a real cross-session leak — CompatAudit's reference
  * identity (schema_label=postgres) bled into concurrently running
  * catalog queries on other sessions. The owning session resolves from
  * the entry-point scope ([[withSession]] — PgDialect.execute, the wire
  * server's connection loop, the audit) and falls back to the thread's
  * active Spark session, so the dozens of read sites inside the
  * translation pipeline stay signature-free.
  */
object SessionSettings {
  /** One override layer; reads fall through to `parent` (a wire
    * connection's scope chains to its serving session's scope, so
    * server-level identity settings stay visible while each connection's
    * own SETs stay private to it — the PG per-connection contract). */
  private final class Scope(val parent: Scope) {
    val map: TrieMap[String, String] = TrieMap[String, String]()
    def lookup(name: String): Option[String] =
      map.get(name).orElse(if (parent == null) None else parent.lookup(name))
    def merged: Map[String, String] =
      (if (parent == null) Map.empty[String, String] else parent.merged) ++ map
  }
  private val byKey = new java.util.WeakHashMap[AnyRef, Scope]()
  private val fallback = new Scope(null) // no session resolvable
  private val current = new ThreadLocal[Scope]

  private def scopeFor(key: AnyRef, parent: Scope): Scope = byKey.synchronized {
    var s = byKey.get(key)
    if (s == null) { s = new Scope(parent); byKey.put(key, s) }
    s
  }

  /** Bind the settings scope for `f` to session `s` (re-entrant). */
  def withSession[A](s: SparkSession)(f: => A): A = {
    val prev = current.get()
    current.set(scopeFor(s, null))
    try f finally current.set(prev)
  }

  /** Bind `s`'s scope only when this thread has none — entry points
    * reached from an already-scoped context (a wire connection thread)
    * keep the finer scope instead of clobbering it. */
  def withSessionIfUnbound[A](s: SparkSession)(f: => A): A =
    if (current.get() != null) f else withSession(s)(f)

  /** Bind a PER-CONNECTION scope (keyed by `connKey`'s identity, weakly
    * held) layered over `session`'s scope: the connection's own SETs are
    * invisible to every other connection, while settings established on
    * the serving session (catalog identity et al.) remain readable. */
  def withConnectionScope[A](connKey: AnyRef, session: SparkSession)(f: => A): A = {
    val prev = current.get()
    current.set(scopeFor(connKey, scopeFor(session, null)))
    try f finally current.set(prev)
  }

  private def resolveScope: Scope = {
    val c = current.get()
    if (c != null) c
    else {
      val s = SparkSession.getActiveSession
        .orElse(SparkSession.getDefaultSession).orNull
      if (s == null) fallback else scopeFor(s, null)
    }
  }

  private def overrides: TrieMap[String, String] = resolveScope.map

  val defaults: Map[String, String] = Map(
    "server_version" -> "17.0",
    "server_version_num" -> "170000", // JDBC/ORM numeric version probe
    "server_encoding" -> "UTF8",
    "client_encoding" -> "UTF8",
    "timezone" -> "UTC",
    "datestyle" -> "ISO, MDY",
    "search_path" -> "\"$user\", public",
    "max_connections" -> "100",
    "transaction_isolation" -> "read committed",
    "standard_conforming_strings" -> "on")
  def get(name: String): Option[String] =
    resolveScope.lookup(name.toLowerCase).orElse(defaults.get(name.toLowerCase))
  def set(name: String, value: String): Unit = overrides.put(name.toLowerCase, value)
  def reset(name: String): Unit = overrides.remove(name.toLowerCase)
  def resetAll(): Unit = overrides.clear()
  /** defaults merged with scope-chain overrides (SHOW ALL). */
  def all: Map[String, String] = defaults ++ resolveScope.merged
  /** Count of scopes holding overrides (hygiene tests). */
  private[graft] def sessionCount: Int = byKey.synchronized(byKey.size)
}

/** Postgres-compat scalar/aggregate function shims (SURVEY.md §2.C; the
  * reference implements these as ~40 DuckDB CREATE MACROs + 4 AST rewrites in
  * /root/reference/src/server/query_remapper_function.go).
  *
  * Re-expressed Spark-first: constant shims register as Catalyst `Literal`
  * builders in the session FunctionRegistry (arity-agnostic, codegen'd,
  * no UDF boxing); structural shims (row_to_json, jsonb_agg,
  * jsonb_extract_path_text, format) build native Catalyst expression trees;
  * only to_char (per-row pattern translation) is a Scala UDF.
  */
object PgFunctions {
  private val registered =
    java.util.Collections.newSetFromMap(new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = synchronized {
    if (registered.add(spark)) registerAll(spark)
  }

  private def fn(spark: SparkSession, name: String)(builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")

  private def const(spark: SparkSession, name: String, value: Any, dt: DataType): Unit =
    fn(spark, name)(_ => Literal.create(value, dt))

  /** Metadata marking an expression's result as a live JSON document, so the
    * wire layer advertises the JSON type OID (114) the way the reference's
    * DuckDB does for json functions / `->` / `::jsonb` — while STORED
    * json columns keep reporting text (25), matching the reference's
    * varchar storage. */
  private[graft] val jsonValMeta: Metadata =
    new MetadataBuilder().putString(PgTypes.LogicalKey, "jsonval").build()

  /** Wrap a function builder so its result carries [[jsonValMeta]]: the
    * analyzer's outermost projection Alias inherits metadata from a named
    * child, and CleanupAliases materializes it before trimming, so the tag
    * survives to the output schema; nested uses are trimmed harmlessly. */
  private def jsonFn(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    fn(spark, name)(exprs =>
      Alias(builder(exprs), name)(explicitMetadata = Some(jsonValMeta)))

  /** Whether an expression statically yields a JSON document (a `->`
    * extraction, json_build_object, ::jsonb normalization, row_to_json) —
    * the DuckDB JSON-typed surface in the reference. Children may still be
    * unresolved when a builder fires, so both shapes are matched. */
  private val jsonProducers = Set(
    "pg_json_extract", "jsonb_norm", "json_build_object", "jsonb_build_object",
    "row_to_json", "to_json")
  private def producesJson(e: Expression): Boolean = e match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      jsonProducers.contains(u.nameParts.last.toLowerCase)
    case u: ScalaUDF => u.udfName.exists(n => jsonProducers.contains(n.toLowerCase))
    case _: JsonNormalize | _: StructsToJson => true
    case a: Alias => producesJson(a.child)
    // the dialect turns `agg(x) FILTER (WHERE c)` into `agg(CASE WHEN c
    // THEN x END)` before parse — look through the CASE at its values
    case c: CaseWhen =>
      c.branches.exists(b => producesJson(b._2)) || c.elseValue.exists(producesJson)
    case _ => false
  }

  private def registerAll(spark: SparkSession): Unit = {
    // --- constant / stub shims (query_remapper_function.go:17-38) ---------
    const(spark, "version", "PostgreSQL 17.0, compiled by BemiDB", StringType)
    const(spark, "pg_backend_pid", 0, IntegerType) // reference macro: 0
    const(spark, "pg_is_in_recovery", false, BooleanType)
    const(spark, "pg_encoding_to_char", "UTF8", StringType)
    fn(spark, "pg_get_userbyid") { _ =>
      Literal.create(SessionSettings.get("graft.user").getOrElse("graft"), StringType) }
    const(spark, "pg_cancel_backend", true, BooleanType) // reference macro: true
    const(spark, "pg_table_size", 0L, LongType)
    const(spark, "pg_indexes_size", 0L, LongType)
    const(spark, "pg_total_relation_size", 0, IntegerType) // reference: int4
    const(spark, "pg_tablespace_location", "", StringType)
    const(spark, "pg_get_viewdef", "", StringType)
    const(spark, "pg_get_expr", "", StringType)
    const(spark, "pg_get_indexdef", "", StringType)
    // format_type(oid, typmod): JDBC getColumns / psql \d resolve column
    // type names through it (answers from the pg_type rowset)
    spark.udf.register("format_type",
      (oid: java.lang.Long, typmod: java.lang.Integer) =>
        PgCatalog.formatType(oid, typmod))
    const(spark, "pg_get_partkeydef", "", StringType)
    const(spark, "pg_get_function_identity_arguments", "", StringType)
    // pg_dump reads default ACLs as acldefault(objtype, owner); a null
    // means "built-in defaults apply" — same answer as our always-null
    // acl columns. STRING (the aclitem[] text rendering) so it unions
    // with the '{}' literals pg_dump CASEs it against.
    const(spark, "acldefault", null, StringType)
    // shared-object comments (pg_dump -Fc reads database/role comments);
    // none exist — same null contract as obj_description on unknown oids
    const(spark, "shobj_description", null, StringType)
    const(spark, "pg_get_function_result", "", StringType) // psql \df
    const(spark, "pg_get_constraintdef", "", StringType) // pg_dump indexes
    const(spark, "pg_get_triggerdef", "", StringType)
    const(spark, "pg_get_ruledef", "", StringType)
    const(spark, "pg_get_serial_sequence", null, StringType)
    const(spark, "pg_get_function_arguments", "", StringType)
    const(spark, "pg_function_is_visible", true, BooleanType)
    // psql \dt+ / \l+ size column — PG's bytes->human rendering
    // (dbsize.c public behavior: <10 of the next unit stays in the
    // current one, half-up rounding at each /1024 step)
    spark.udf.register("pg_size_pretty", (bytes: java.lang.Long) => {
      if (bytes == null) null
      else {
        var v = bytes.longValue
        val units = Seq("bytes", "kB", "MB", "GB", "TB", "PB")
        var u = 0
        while (math.abs(v) >= 10 * 1024 && u < units.length - 1) {
          v = (v + (if (v >= 0) 512 else -512)) / 1024
          u += 1
        }
        s"$v ${units(u)}"
      }
    })
    const(spark, "pg_get_statisticsobjdef_columns", null, IntegerType) // reference: null int4
    const(spark, "pg_relation_is_publishable", null, IntegerType) // reference: null int4
    const(spark, "has_database_privilege", true, BooleanType)
    const(spark, "has_schema_privilege", true, BooleanType)
    const(spark, "has_table_privilege", true, BooleanType)
    // aclexplode returns a typed-null acl record so `(aclexplode(x)).grantee`
    // style field access resolves (the reference stubs it to json null).
    // Both the record and its fields carry the json tag: the reference's
    // macro yields a JSON value, so `d` AND `(d).grantee` advertise OID 114
    // (Alias.metadata reads GetStructField's source-field metadata).
    jsonFn(spark, "aclexplode") { _ =>
      Literal.create(null, StructType(Seq(
        StructField("grantor", LongType, nullable = true, jsonValMeta),
        StructField("grantee", LongType, nullable = true, jsonValMeta),
        StructField("privilege_type", StringType, nullable = true, jsonValMeta),
        StructField("is_grantable", BooleanType, nullable = true, jsonValMeta))))
    }
    const(spark, "current_schemas", Seq("pg_catalog", "public"), ArrayType(StringType))
    // visibility probes psql's \d sends (query_remapper.go:519-564 strips
    // them for DuckDB; Catalyst just needs them to exist and say yes)
    const(spark, "pg_table_is_visible", true, BooleanType)
    const(spark, "pg_function_is_visible", true, BooleanType)
    const(spark, "pg_type_is_visible", true, BooleanType)
    // identity probes BI tools issue on connect — resolved from session
    // settings at query time (the reference reads its config the same way)
    fn(spark, "current_database") { _ =>
      Literal.create(SessionSettings.get("graft.database").getOrElse("graft"), StringType) }
    fn(spark, "current_schema") { _ =>
      Literal.create(SessionSettings.get("graft.schema_label").getOrElse("public"), StringType) }
    fn(spark, "session_user") { _ =>
      Literal.create(SessionSettings.get("graft.user").getOrElse("graft"), StringType) }
    fn(spark, "pg_current_user") { _ =>
      Literal.create(SessionSettings.get("graft.user").getOrElse("graft"), StringType) }

    // --- settings -------------------------------------------------------
    spark.udf.register("current_setting",
      (name: String) => SessionSettings.get(name).orNull)
    spark.udf.register("set_config", (name: String, value: String, _: Boolean) => {
      SessionSettings.set(name, value); value
    })

    // --- string shims ---------------------------------------------------
    // quote_ident (macro at query_remapper_function.go:33) with PG's
    // embedded-quote doubling
    spark.udf.register("quote_ident",
      (s: String) => if (s == null) null else "\"" + s.replace("\"", "\"\"") + "\"")

    // format('%s …') -> native FormatString (reference rewrites to printf,
    // parser_function.go:100-109). Java's Formatter already accepts the
    // %N$s positional forms PG emits.
    fn(spark, "pg_format") { exprs => FormatString(exprs: _*) }

    // quote_literal: PG's string-literal quoting (embedded quotes double)
    spark.udf.register("quote_literal",
      (s: String) => if (s == null) null else "'" + s.replace("'", "''") + "'")

    // regexp_replace with PG/DuckDB semantics: first match unless 'g',
    // i/m/n/s/x flags, \N backreferences (the dialect routes both the
    // 3- and 4-argument spellings here)
    spark.udf.register("pg_regexp_replace",
      (s: String, pat: String, repl: String, flags: String) =>
        pgRegexpReplace(s, pat, repl, flags))

    // age(ts, ts): PG's calendar-aware interval, rendered as the interval
    // TEXT the reference's embedded DuckDB produces over the wire
    // ("1 month 17 days 04:30:15", zero components omitted, trailing
    // fraction zeros trimmed, each component sign-prefixed when negative,
    // all-zero -> "00:00:00"). Field-wise diff with PG's borrow rules:
    // time borrows a day, days borrow the SECOND argument's month length.
    spark.udf.register("age",
      (a: java.time.LocalDateTime, b: java.time.LocalDateTime) => pgAge(a, b))

    // array_to_string / sha256 under their PG spellings (whitelisted
    // builtins in the reference, query_remapper_function.go:114-117)
    fn(spark, "array_to_string") { exprs =>
      // accepts a real array (any element type) or a JSON-ish text form
      // ('[1, 2, 3]'); children are resolved by the time the builder runs
      val arr = exprs(0).dataType match {
        case StringType => JsonToStructs(ArrayType(StringType), Map.empty, exprs(0))
        case ArrayType(StringType, _) => exprs(0)
        case _: ArrayType => Cast(exprs(0), ArrayType(StringType))
        case _ => exprs(0)
      }
      ArrayJoin(arr, exprs(1), None)
    }
    fn(spark, "sha256") { exprs => Sha2(exprs.head, Literal(256)) }
    // jsonb_object_agg(k, v) -> to_json(map(array_agg(k), array_agg(v)))
    // (macro at query_remapper_function.go:44)
    jsonFn(spark, "jsonb_object_agg") { exprs =>
      StructsToJson(Map.empty, MapFromArrays(
        CollectList(exprs(0)).toAggregateExpression(),
        CollectList(exprs(1)).toAggregateExpression()))
    }

    // --- JSON shims (query_remapper_function.go:39-52) -------------------
    jsonFn(spark, "row_to_json") { exprs => StructsToJson(Map.empty, exprs.head) }
    fn(spark, "jsonb_extract_path_text") { exprs =>
      val path = Concat(Literal("$") +: exprs.tail.flatMap(e => Seq(Literal("."), e)))
      GetJsonObject(exprs.head, path)
    }
    fn(spark, "json_extract_path_text") { exprs =>
      val path = Concat(Literal("$") +: exprs.tail.flatMap(e => Seq(Literal("."), e)))
      GetJsonObject(exprs.head, path)
    }
    fn(spark, "jsonb_array_length") { exprs => LengthOfJsonArray(exprs.head) }
    fn(spark, "json_array_length") { exprs => LengthOfJsonArray(exprs.head) }
    // PG `->` returns the JSON REPRESENTATION (strings keep their quotes,
    // objects stay json) where get_json_object strips scalar quotes —
    // single-step extract over Jackson, compact rendering like jsonb
    spark.udf.register("pg_json_extract", (j: String, path: String) => {
      if (j == null || path == null) null
      else try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(j)
        val node =
          if (path.startsWith("$[")) root.get(path.stripPrefix("$[").stripSuffix("]").toInt)
          else root.get(path.stripPrefix("$."))
        if (node == null || node.isMissingNode || node.isNull) null
        else om.writeValueAsString(node)
      } catch { case _: Exception => null }
    })
    // re-register wrapped so `col->'k'` results advertise the JSON OID
    locally {
      val reg = spark.sessionState.functionRegistry
      val orig = reg.lookupFunctionBuilder(FunctionIdentifier("pg_json_extract")).get
      reg.createOrReplaceTempFunction("pg_json_extract", exprs =>
        Alias(orig(exprs), "pg_json_extract")(explicitMetadata = Some(jsonValMeta)),
        "scala_udf")
    }
    // jsonb_pretty (macro at query_remapper_function.go:46): PG-style
    // 4-space-indent rendering (`"key": value`, arrays expanded)
    spark.udf.register("jsonb_pretty", (j: String) => prettyJson(j))
    // json_build_object(k1, v1, ...) -> to_json(map(...)) (macro at
    // query_remapper_function.go:45-52); args must share a value type.
    // The result is a COMPUTED json value, which the reference emits through
    // Go json.Marshal (sorted keys, compact) — JsonNormalize reproduces that.
    jsonFn(spark, "json_build_object") { exprs =>
      JsonNormalize(StructsToJson(Map.empty, CreateMap(exprs))) }
    jsonFn(spark, "jsonb_build_object") { exprs =>
      JsonNormalize(StructsToJson(Map.empty, CreateMap(exprs))) }
    // json[b]_array_elements table function -> explode over a parsed array
    // (query_remapper_table.go:113-134: unnest(json_extract(x,'$[*]')))
    // the output field is named `value` (PG's SRF convention) and carries
    // the json tag so RowDescription advertises the JSON type OID
    fn(spark, "json_array_elements") { exprs =>
      ExplodeTagged(JsonToStructs(ArrayType(StringType), Map.empty, exprs.head),
        "value", jsonValMeta)
    }
    fn(spark, "jsonb_array_elements") { exprs =>
      ExplodeTagged(JsonToStructs(ArrayType(StringType), Map.empty, exprs.head),
        "value", jsonValMeta)
    }
    // jsonb_agg(x) -> to_json(array_agg(x)) (reference AST rewrite at
    // query_remapper_function.go:168-172). When x is itself a JSON value
    // (`->` extraction, json_build_object, ::jsonb), DuckDB's to_json embeds
    // it RAW — `jsonb_agg(j->'k')` is `["value"]`, not `["\"value\""]` — so
    // json-producing args are joined verbatim instead of re-quoted.
    def jsonAgg(exprs: Seq[Expression]): Expression =
      if (producesJson(exprs.head))
        Concat(Seq(Literal("["),
          new ArrayJoin(CollectList(exprs.head).toAggregateExpression(), Literal(",")),
          Literal("]")))
      else StructsToJson(Map.empty, CollectList(exprs.head).toAggregateExpression())
    jsonFn(spark, "jsonb_agg")(jsonAgg)
    jsonFn(spark, "json_agg")(jsonAgg)

    // --- array shims ----------------------------------------------------
    // array_upper(a, 1) -> size(a) (macro at query_remapper_function.go:53-57)
    fn(spark, "array_upper") { exprs => Size(exprs.head) }

    // --- date/time: to_char with PG pattern translation ------------------
    // (macro table at query_remapper_function.go:58-69)
    spark.udf.register("to_char", (ts: java.sql.Timestamp, fmt: String) => formatTs(ts, fmt))

    // PG dow: Sunday=0 (Spark's dayofweek is Sunday=1)
    fn(spark, "pg_dow") { exprs => Subtract(DayOfWeek(exprs.head), Literal(1)) }

    // to_date/to_timestamp with PG patterns: the format literal is
    // translated to a java.time pattern at resolution time, then the native
    // parse expressions run codegen'd; single-arg forms keep Spark behavior
    fn(spark, "to_date") { exprs =>
      exprs match {
        case Seq(e) => new ParseToDate(e)
        case Seq(e, Literal(f: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
          new ParseToDate(e, Literal(translateToCharPattern(f.toString)))
        case Seq(e, f) => new ParseToDate(e, f)
        case _ => throw new IllegalArgumentException("to_date(expr[, fmt])")
      }
    }
    fn(spark, "to_timestamp") { exprs =>
      exprs match {
        case Seq(e) => new ParseToTimestamp(e)
        case Seq(e, Literal(f: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
          new ParseToTimestamp(e, Literal(translateToCharPattern(f.toString)))
        case Seq(e, f) => new ParseToTimestamp(e, f)
        case _ => throw new IllegalArgumentException("to_timestamp(expr[, fmt])")
      }
    }

    // num_nulls / num_nonnulls (PG variadic null counters) as codegen'd
    // conditional sums — no UDF boxing
    fn(spark, "num_nulls") { exprs =>
      exprs.map(e => If(IsNull(e), Literal(1), Literal(0)): Expression)
        .reduce(Add(_, _))
    }
    fn(spark, "num_nonnulls") { exprs =>
      exprs.map(e => If(IsNotNull(e), Literal(1), Literal(0)): Expression)
        .reduce(Add(_, _))
    }

    // date_bin(stride, ts, origin) (PG 14): origin-anchored bucket via exact
    // integer micros arithmetic; interval literal lowered to micros at
    // resolution time so the hot path is pure long math
    fn(spark, "date_bin") { exprs =>
      val stride: Expression = exprs.head match {
        case Literal(v: Long, _: DayTimeIntervalType) => Literal(v)
        case Literal(ci: org.apache.spark.unsafe.types.CalendarInterval, CalendarIntervalType) =>
          Literal(ci.days * 86400000000L + ci.microseconds)
        case other => other // already integral micros
      }
      val ts = UnixMicros(Cast(exprs(1), TimestampType))
      val origin = UnixMicros(Cast(exprs(2), TimestampType))
      val bucket = Multiply(IntegralDivide(Subtract(ts, origin), stride), stride)
      MicrosToTimestamp(Add(origin, bucket))
    }

    // engine extensions
    Sum128.register(spark)
    GraftExpressions.register(spark)
  }

  /** to_char body: null (never an exception) on a pattern java.time cannot
    * express — e.g. PG's SSSS seconds-past-midnight, or pathological token
    * repetitions like 'SSSS' parsing as ss+ss. */
  def formatTs(ts: java.sql.Timestamp, fmt: String): String =
    if (ts == null || fmt == null) null
    else try
      DateTimeFormatter.ofPattern(translateToCharPattern(fmt), java.util.Locale.ENGLISH)
        .format(Instant.ofEpochMilli(ts.getTime).atZone(ZoneOffset.UTC))
    catch { case _: IllegalArgumentException => null }

  private val toCharTokens: Seq[(String, String)] = Seq(
    "HH24" -> "HH", "HH12" -> "hh", "HH" -> "hh", "YYYY" -> "yyyy",
    "YY" -> "yy", "Month" -> "MMMM", "Mon" -> "MMM", "Day" -> "EEEE",
    "Dy" -> "EEE", "DDD" -> "DDD", "DD" -> "dd", "MM" -> "MM", "MI" -> "mm",
    "SS" -> "ss", "MS" -> "SSS", "US" -> "SSSSSS", "AM" -> "a", "PM" -> "a",
    "TZ" -> "z", "Q" -> "Q",
    // FM suppresses padding; java.time text fields are unpadded already
    "FM" -> "")

  /** Translate a PG to_char pattern to a java.time pattern, longest token
    * first, leaving unknown characters quoted where needed. */
  def translateToCharPattern(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '"') { // PG "quoted literal" -> java 'literal'
        val end = fmt.indexOf('"', i + 1)
        val lit = if (end < 0) fmt.substring(i + 1) else fmt.substring(i + 1, end)
        if (lit.nonEmpty) sb.append('\'').append(lit.replace("'", "''")).append('\'')
        i = if (end < 0) fmt.length else end + 1
      } else toCharTokens.find { case (pg, _) => fmt.startsWith(pg, i) } match {
        case Some((pg, java)) => sb.append(java); i += pg.length
        case None =>
          val c = fmt.charAt(i)
          if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
          i += 1
      }
    }
    sb.toString
  }

  /** PG jsonb_pretty rendering: 4-space indent, `"key": value`, arrays and
    * objects expanded one element per line, scalars in compact JSON form. */
  private[graft] def prettyJson(j: String): String = {
    if (j == null) return null
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(j)
    val sb = new StringBuilder
    def render(n: com.fasterxml.jackson.databind.JsonNode, ind: Int): Unit = {
      val padIn = "    " * (ind + 1)
      val pad = "    " * ind
      if (n.isObject) {
        val fields = n.fields.asScala.toSeq
        if (fields.isEmpty) sb.append("{}")
        else {
          sb.append("{\n")
          fields.zipWithIndex.foreach { case (e, i) =>
            sb.append(padIn).append(om.writeValueAsString(
              com.fasterxml.jackson.databind.node.TextNode.valueOf(e.getKey)))
              .append(": ")
            render(e.getValue, ind + 1)
            if (i < fields.size - 1) sb.append(',')
            sb.append('\n')
          }
          sb.append(pad).append('}')
        }
      } else if (n.isArray) {
        val els = n.elements.asScala.toSeq
        if (els.isEmpty) sb.append("[]")
        else {
          sb.append("[\n")
          els.zipWithIndex.foreach { case (e, i) =>
            sb.append(padIn)
            render(e, ind + 1)
            if (i < els.size - 1) sb.append(',')
            sb.append('\n')
          }
          sb.append(pad).append(']')
        }
      } else sb.append(om.writeValueAsString(n))
    }
    render(root, 0)
    sb.toString
  }

  /** PG regexp_replace: first match unless 'g'; flags i (case), m/n
    * (multiline), s (dotall), x (comments); \N backreferences in the
    * replacement (translated to Java's $N; literal $ escaped). */
  private[graft] def pgRegexpReplace(s: String, pat: String, repl: String,
      flags: String): String = {
    if (s == null || pat == null || repl == null) return null
    val fl = if (flags == null) "" else flags
    var f = 0
    if (fl.contains('i')) f |= java.util.regex.Pattern.CASE_INSENSITIVE
    if (fl.contains('m') || fl.contains('n')) f |= java.util.regex.Pattern.MULTILINE
    if (fl.contains('s')) f |= java.util.regex.Pattern.DOTALL
    if (fl.contains('x')) f |= java.util.regex.Pattern.COMMENTS
    val javaRepl = repl.replace("$", "\\$").replaceAll("\\\\(\\d)", "\\$$1")
    val m = java.util.regex.Pattern.compile(pat, f).matcher(s)
    if (fl.contains('g')) m.replaceAll(javaRepl) else m.replaceFirst(javaRepl)
  }

  /** PG `age(ts1, ts2)` semantics + the reference engine's interval text.
    * Sign handling: the negative direction is the exact negation of the
    * positive one (pinned against the embedded engine's output). */
  private[graft] def pgAge(a: java.time.LocalDateTime,
      b: java.time.LocalDateTime): String = {
    if (a == null || b == null) return null
    val neg = a.isBefore(b)
    val (t1, t2) = if (neg) (b, a) else (a, b)
    var years = t1.getYear - t2.getYear
    var months = t1.getMonthValue - t2.getMonthValue
    var days = t1.getDayOfMonth - t2.getDayOfMonth
    var micros = (t1.toLocalTime.toNanoOfDay - t2.toLocalTime.toNanoOfDay) / 1000
    if (micros < 0) { micros += 86400000000L; days -= 1 }
    if (days < 0) {
      days += java.time.YearMonth.of(t2.getYear, t2.getMonthValue).lengthOfMonth
      months -= 1
    }
    if (months < 0) { months += 12; years -= 1 }
    val sign = if (neg) "-" else ""
    val parts = Seq(years -> "year", months -> "month", days -> "day")
      .collect { case (v, u) if v != 0 =>
        s"$sign$v $u${if (v != 1) "s" else ""}" }
    val time =
      if (micros == 0 && parts.nonEmpty) None
      else {
        val s = micros / 1000000
        val f = micros % 1000000
        val base = f"$sign${s / 3600}%02d:${s / 60 % 60}%02d:${s % 60}%02d"
        Some(if (f == 0) base
        else base + "." + f"$f%06d".reverse.dropWhile(_ == '0').reverse)
      }
    (parts ++ time).mkString(" ")
  }
}
