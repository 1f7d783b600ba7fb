package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, col, input_file_name, lit, monotonically_increasing_id, regexp_replace, row_number, split, substring, transform, trim, unhex, when}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType, StructType}

/** SQL write surface over STORE tables — beyond the reference, which
  * rejects every write (`/root/reference/src/server/query_remapper.go:
  * 180-184`). The parity contract is preserved exactly: DML against
  * anything that is NOT a store-managed table (testdata views, catalog
  * relations, unknown names) still raises the reference's "unsupported
  * query type" error; store tables — the engine's own Iceberg-style
  * format — accept the full lifecycle:
  *
  *   CREATE TABLE t (col type, …) | CREATE TABLE t AS SELECT …
  *   INSERT INTO t [(cols)] VALUES …|SELECT …
  *   UPDATE t SET c = e[, …] [WHERE p]
  *   DELETE FROM t [WHERE p]
  *   MERGE INTO t [AS a] USING src|(query) [AS b] ON a.k = b.k WHEN …
  *   TRUNCATE [TABLE] t
  *
  * Execution is the Store's copy-on-write engine: UPDATE/DELETE rewrite
  * only the parquet files that contain matching rows (discovered by one
  * predicate-pushed scan), MERGE prunes by footer key stats like upsert,
  * INSERT appends with small-file compaction. Command tags match PG
  * (`INSERT 0 n`, `UPDATE n`, `MERGE n`, `SELECT n` for CTAS).
  */
object PgDml {
  import PgDialect.{Command, PgResult, Rows, UnsupportedQuery, unquoteName}

  /** Try to execute `stmt` as DML/DDL on a store table. None = not a DML
    * statement shape (caller falls through to its own error). */
  def execute(spark: SparkSession, store: Store, stmt: String): Option[PgResult] = {
    val s = stmt.trim.stripSuffix(";").trim
    firstWord(s).toUpperCase match {
      case "INSERT" => Some(forwardable(store, s)(insert(spark, store, s)))
      case "UPDATE" => Some(forwardable(store, s)(update(spark, store, s)))
      case "DELETE" => Some(forwardable(store, s)(delete(spark, store, s)))
      case "MERGE" => Some(forwardable(store, s)(merge(spark, store, s)))
      case "TRUNCATE" => Some(truncate(spark, store, s))
      case "VACUUM" => Some(vacuum(spark, store, s))
      case "CREATE" => createTable(spark, store, s)
      case "ALTER" => alterColumn(spark, store, s)
      case _ => None
    }
  }

  /** Statement forwarding (opt-in spark.graft.statementForwarding): when a
    * plain autocommit DML statement refuses because ANOTHER process holds
    * the warehouse writer lease, forward the statement text through the
    * inbox for the lease holder to execute and return ITS command tag.
    * Autocommit-only (a transaction's statements must all run on one
    * engine), and never for RETURNING (rows can't ride the inbox ack).
    * DDL (CREATE/ALTER/TRUNCATE/VACUUM) stays writer-only — schema
    * changes belong to the chain's author. */
  private def forwardable(store: Store, sql: String)(body: => PgResult): PgResult =
    try body
    catch {
      case e: IllegalStateException
          if store.statementForwardingEnabled && !store.stagingActive &&
            !"(?i)\\bRETURNING\\b".r.findFirstIn(sql).isDefined &&
            Option(e.getMessage)
              .exists(_.contains("another writer process holds the lease")) =>
        Command(store.forwardStatement(sql))
    }

  // ---- ALTER TABLE … COLUMN (metadata-only schema evolution) -------------

  private val addColRe =
    "(?is)ALTER\\s+TABLE\\s+(?:ONLY\\s+)?([\\w.\"]+)\\s+ADD\\s+(?:COLUMN\\s+)?(IF\\s+NOT\\s+EXISTS\\s+)?([\\w\"]+)\\s+(.+)".r
  private val dropColRe =
    "(?is)ALTER\\s+TABLE\\s+(?:ONLY\\s+)?([\\w.\"]+)\\s+DROP\\s+(?:COLUMN\\s+)?(IF\\s+EXISTS\\s+)?([\\w\"]+)\\s*".r
  private val renameColRe =
    "(?is)ALTER\\s+TABLE\\s+(?:ONLY\\s+)?([\\w.\"]+)\\s+RENAME\\s+(?:COLUMN\\s+)?([\\w\"]+)\\s+TO\\s+([\\w\"]+)\\s*".r

  /** ADD/DROP/RENAME COLUMN on store tables — zero data files touched
    * (Store's evolution record; `ALTER … RENAME TO` is table rename and
    * is handled upstream in PgDialect). */
  private def alterColumn(spark: SparkSession, store: Store,
      s: String): Option[PgResult] = s match {
    // constraint DDL (pgbench -i: `add primary key (bid)`) — the store
    // keeps no constraints (reference tables carry them only as
    // unique-index metadata), accepted as a no-op; MUST precede the ADD
    // COLUMN case, which would otherwise read `primary` as a column name
    case constraintRe(name) =>
      requireStoreTable(store, name, "ALTER")
      Some(Command("ALTER TABLE"))
    case addColRe(name, ifNot, colName, typeRaw) =>
      val t = requireStoreTable(store, name, "ALTER")
      val (tpe, p, sc) = parseTypeName(typeRaw)
      store.addColumn(t, unquoteName(colName),
        PgTypes.toSpark(tpe, p, sc).copy(name = unquoteName(colName)),
        ifNotExists = ifNot != null)
      Some(Command("ALTER TABLE"))
    case dropColRe(name, ifEx, colName) =>
      val t = requireStoreTable(store, name, "ALTER")
      store.dropColumn(t, unquoteName(colName), ifExists = ifEx != null)
      Some(Command("ALTER TABLE"))
    case renameColRe(name, from, to) =>
      val t = requireStoreTable(store, name, "ALTER")
      store.renameColumn(t, unquoteName(from), unquoteName(to))
      Some(Command("ALTER TABLE"))
    // pg_dump writes one per table; single-role store → nothing to record
    case ownerRe(name) =>
      requireStoreTable(store, name, "ALTER")
      Some(Command("ALTER TABLE"))
    // physical-layout knobs from foreign dumps (SET STORAGE/STATISTICS/
    // COMPRESSION) — parquet storage has no equivalent; accepted no-ops
    case storageRe(name) =>
      requireStoreTable(store, name, "ALTER")
      Some(Command("ALTER TABLE"))
    case _ => None
  }

  private val ownerRe =
    "(?is)ALTER\\s+TABLE\\s+(?:ONLY\\s+)?([\\w.\"]+)\\s+OWNER\\s+TO\\s+[\\w\"]+\\s*".r
  private val constraintRe =
    ("(?is)ALTER\\s+TABLE\\s+(?:ONLY\\s+)?([\\w.\"]+)\\s+ADD\\s+" +
      "(?:CONSTRAINT\\s+[\\w\"]+\\s+)?(?:PRIMARY\\s+KEY|UNIQUE|FOREIGN\\s+KEY|CHECK)\\b.*").r
  private val storageRe =
    "(?is)ALTER\\s+TABLE\\s+(?:ONLY\\s+)?([\\w.\"]+)\\s+ALTER\\s+(?:COLUMN\\s+)?[\\w\"]+\\s+SET\\s+(?:STORAGE|STATISTICS|COMPRESSION)\\s+.*".r

  private def firstWord(s: String): String = s.split("\\s+", 2)(0)

  /** A write may only touch a store table; everything else keeps the
    * reference's exact error (query_remapper.go:180-184). */
  private def requireStoreTable(store: Store, name: String, verb: String): String = {
    val t = unquoteName(name)
    if (!store.exists(t)) throw UnsupportedQuery(s"unsupported query type: $verb")
    t
  }

  // ---- CREATE TABLE ------------------------------------------------------

  private val ctasRe =
    "(?is)CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.\"]+)\\s+AS\\s+(.*)".r
  private val createRe =
    "(?is)CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.\"]+)\\s*\\((.*)\\)\\s*".r

  private def createTable(spark: SparkSession, store: Store,
      s: String): Option[PgResult] = s match {
    case ctasRe(ifNotExists, name, defn) =>
      val t = unquoteName(name)
      if (store.exists(t) && ifNotExists != null) return Some(Command("CREATE TABLE"))
      if (store.exists(t)) throw UnsupportedQuery(s"""relation "$t" already exists""")
      val df = PgDialect.bindCurrentTxn(spark.sql(PgDialect.translateSelect(defn)))
      // CREATE TABLE AS publishes DIRECTLY even inside a txn: the new
      // relation must be SQL-resolvable by the txn's own later statements,
      // which a never-published staged table cannot be. Its undo is the
      // journal + restoreVersion path — safe, the table has no concurrent
      // writers (the journal still records the publish for ROLLBACK).
      store.withoutStaging(store.replace(t, df))
      // footer-metadata count — never re-scan what was just written
      Some(Command(s"SELECT ${store.rowCountFast(t)}"))
    case createRe(ifNotExists, name, colDefs) =>
      val t = unquoteName(name)
      if (store.exists(t) && ifNotExists != null) return Some(Command("CREATE TABLE"))
      if (store.exists(t)) throw UnsupportedQuery(s"""relation "$t" already exists""")
      val fields = splitTop(colDefs).map { d =>
        val parts = d.trim.split("\\s+", 2)
        require(parts.length == 2, s"bad column definition: $d")
        val (tpe, prec, scale) = parseTypeName(parts(1))
        PgTypes.toSpark(tpe, prec, scale).copy(name = unquoteName(parts(0)))
      }
      store.withoutStaging(store.createEmpty(t, StructType(fields)))
      Some(Command("CREATE TABLE"))
    case _ => None // CREATE INDEX / VIEW / … — not ours
  }

  /** "numeric(10,2) not null" → ("numeric", 10, 2); constraint tail and
    * quoting dropped (the store keeps no constraints — reference tables
    * carry them only as unique-index metadata). PG's multi-word spellings
    * (pg_dump always writes them) normalize to the internal names, and an
    * array suffix comes back `_`-prefixed — PgTypes.toSpark's array
    * convention. */
  private def parseTypeName(raw: String): (String, Int, Int) = {
    val cleaned = raw.trim
      .replaceAll("(?i)\\s+(NOT\\s+NULL|NULL|PRIMARY\\s+KEY|UNIQUE|DEFAULT\\s+.*)$", "")
      .trim
      .replaceAll("(?i)^timestamp\\s+without\\s+time\\s+zone", "timestamp")
      .replaceAll("(?i)^timestamp\\s+with\\s+time\\s+zone", "timestamptz")
      .replaceAll("(?i)^time\\s+without\\s+time\\s+zone", "time")
      .replaceAll("(?i)^time\\s+with\\s+time\\s+zone", "timetz")
      .replaceAll("(?i)^character\\s+varying", "varchar")
      .replaceAll("(?i)^character\\b", "bpchar")
    val m = "([\\w ]+?)\\s*(?:\\(\\s*(\\d+)\\s*(?:,\\s*(\\d+))?\\s*\\))?\\s*(\\[\\s*\\])?".r
    cleaned match {
      case m(base, p, sc, arr) =>
        ((if (arr != null) "_" else "") + base.trim.toLowerCase,
          Option(p).map(_.toInt).getOrElse(0),
          Option(sc).map(_.toInt).getOrElse(0))
      case other => (other.toLowerCase, 0, 0)
    }
  }

  // ---- INSERT ------------------------------------------------------------

  private val insertRe =
    "(?is)INSERT\\s+INTO\\s+([\\w.\"]+)\\s*(\\([^)]*\\))?\\s*(VALUES\\b.*|SELECT\\s+.*|WITH\\s+.*|TABLE\\s+.*)".r

  private val onConflictRe =
    "(?is)(.*?)\\s+ON\\s+CONFLICT\\s*(?:\\(([^)]*)\\))?\\s+DO\\s+(NOTHING|UPDATE\\s+SET\\s+.*)$".r

  private def insert(spark: SparkSession, store: Store, s0: String): PgResult = {
    val (s, returning) = splitReturning(s0)
    s match {
      case insertRe(name, colsRaw, body0) =>
        val t = requireStoreTable(store, name, "INSERT")
        val target = store.read(t).schema
        val cols = Option(colsRaw).map(c =>
          splitTop(c.trim.stripPrefix("(").stripSuffix(")")).map(x => unquoteName(x.trim)))
          .getOrElse(Seq.empty)
        val (body, conflict) = body0 match {
          case onConflictRe(core, tgt, action) =>
            (core, Some((Option(tgt).map(_.trim).filter(_.nonEmpty), action)))
          case other => (other, None)
        }
        val src = PgDialect.bindCurrentTxn(
          if (body.trim.toUpperCase.startsWith("VALUES"))
            spark.sql("SELECT * FROM " + PgDialect.translateExpr(body))
          else spark.sql(PgDialect.translateSelect(body)))
        val aligned = align(src, target, cols)
        conflict match {
          case Some((tgt, action)) =>
            if (returning.isDefined)
              throw UnsupportedQuery("RETURNING is not supported with ON CONFLICT")
            return insertOnConflict(spark, store, t, target, aligned, tgt, action)
          case None =>
        }
        // tag count from parquet-footer metadata computed INSIDE the append's
        // table lock (compaction is row-preserving) — the insert SOURCE query
        // runs once, for the write, never a second time for the tag, and a
        // concurrent session's same-table write cannot leak into this tag
        val n = store.appendCompacting(t, aligned)
        returning match {
          case Some(rets) => Rows(aligned.selectExpr(rets: _*), "INSERT 0")
          case None => Command(s"INSERT 0 $n")
        }
      case _ => throw UnsupportedQuery("unsupported query type: INSERT")
    }
  }

  /** PG upsert: `INSERT … ON CONFLICT (key) DO NOTHING | DO UPDATE SET …
    * [WHERE cond]`. The conflict target must name ONE column (this store's
    * unique-key unit; PG infers from an index instead). DO UPDATE
    * assignments see the incoming row as `excluded` like PG; the batch is
    * first reduced to one row per key (PG raises on a second same-key row
    * mid-command — here the smallest row by the non-key columns' ordering
    * wins, deterministically). Unqualified column refs in SET/WHERE
    * resolve to the TARGET row like PG (`SET n = n + 1` reads the old n):
    * the incoming side is joined under mangled `__excl_*` names and only
    * explicit `excluded.c` refs are rewritten to them, so the target is
    * the sole relation carrying the user-visible names. The applied
    * post-image rows route through the footer-pruned upsert, so a small
    * conflict batch never rewrites the table. */
  private def insertOnConflict(spark: SparkSession, store: Store, t: String,
      target: org.apache.spark.sql.types.StructType,
      aligned: org.apache.spark.sql.DataFrame,
      tgt: Option[String], action: String): PgResult = {
    val key = tgt.map(c => unquoteName(c.split(",")(0).trim)).getOrElse(
      throw UnsupportedQuery(
        "ON CONFLICT requires an explicit single-column conflict target"))
    require(tgt.get.split(",").length == 1,
      "ON CONFLICT supports a single-column conflict target")
    // deterministic in-batch duplicate-key reduction: order by the
    // ORDERABLE non-key columns only (a MAP column has no ordering and
    // would fail window analysis); with none orderable, fall back to
    // dropDuplicates(key) — arbitrary-but-single row per key, like before
    val others = aligned.schema.fields.collect {
      case f if f.name != key &&
          org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(f.dataType) => f.name
    }.toSeq
    val incoming =
      if (others.isEmpty) aligned.dropDuplicates(key)
      else aligned.withColumn("__rn", row_number().over(
          Window.partitionBy(col(s"`$key`"))
            .orderBy(others.map(c => col(s"`$c`")): _*)))
        .filter(col("__rn") === 1).drop("__rn")
    if (action.equalsIgnoreCase("NOTHING")) {
      val fresh = incoming.join(store.read(t).select(key), Seq(key), "left_anti")
      // txnConcurrent=false: the conflict check above is only sound while
      // the base stays gate-frozen to COMMIT — a concurrent insert could
      // otherwise land a conflicting key between check and publish
      Command(s"INSERT 0 ${store.appendCompacting(t, fresh, txnConcurrent = false)}")
    } else {
      val setsAndWhere = action.replaceFirst("(?is)^UPDATE\\s+SET\\s+", "")
      val whereIdx = topLevelWordIndex(setsAndWhere, "WHERE")
      val (setsRaw, whereOpt) =
        if (whereIdx < 0) (setsAndWhere, None)
        else (setsAndWhere.substring(0, whereIdx),
          Some(PgDialect.translateExpr(
            rewriteExcluded(setsAndWhere.substring(whereIdx + 5).trim))))
      val sets = splitTop(setsRaw).map { a =>
        val eq = topLevelEq(a)
        require(eq > 0, s"bad SET assignment: $a")
        unquoteName(a.substring(0, eq).trim) ->
          PgDialect.translateExpr(rewriteExcluded(a.substring(eq + 1).trim))
      }
      val view = s"__conflict_src_${System.nanoTime}"
      incoming.select(incoming.columns.map(c =>
        col(s"`$c`").as(s"__excl_$c")).toSeq: _*).createOrReplaceTempView(view)
      try {
        val proj = target.fields.map { f =>
          sets.find(_._1 == f.name) match {
            // PG's assignment cast: SET expressions land as the column type
            case Some((_, e)) => s"CAST(($e) AS ${f.dataType.sql}) AS `${f.name}`"
            case None => s"`$t`.`${f.name}`"
          }
        }.mkString(", ")
        val updated = PgDialect.bindCurrentTxn(spark.sql(
          s"SELECT $proj FROM `$t` JOIN $view " +
            s"ON `$t`.`$key` = $view.`__excl_$key`" +
            whereOpt.map(w => s" WHERE $w").getOrElse("")))
        val fresh = incoming
          .join(store.read(t).select(key), Seq(key), "left_anti")
        val up = updated.unionByName(fresh)
        val n = up.count()
        store.upsert(t, up, key)
        Command(s"INSERT 0 $n")
      } finally { spark.catalog.dropTempView(view); () }
    }
  }

  /** Rewrite explicit `excluded.col` refs to the mangled `__excl_col`
    * names the conflict-source view carries (quote-aware: occurrences
    * inside string literals survive untouched). */
  private def rewriteExcluded(s: String): String = {
    val out = new StringBuilder
    var i = 0; var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { out.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { out.append(c); inStr = true; i += 1 }
      else if (s.regionMatches(true, i, "excluded.", 0, 9) &&
          (i == 0 || { val p = s.charAt(i - 1)
            !p.isLetterOrDigit && p != '_' && p != '.' && p != '"' })) {
        i += 9
        if (i < s.length && s.charAt(i) == '"') {
          val end = s.indexOf('"', i + 1)
          require(end > i, s"unterminated quoted identifier after excluded.")
          out.append(s"`__excl_${s.substring(i + 1, end)}`")
          i = end + 1
        } else {
          val start = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          require(i > start, "dangling excluded. reference")
          out.append(s"`__excl_${s.substring(start, i)}`")
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Position/name-align an insert source onto the target schema: named
    * columns map by name, everything absent becomes NULL, every value gets
    * PG's assignment cast to the column type. */
  private[graft] def align(src: DataFrame, target: StructType, cols: Seq[String]): DataFrame = {
    val names =
      if (cols.nonEmpty) cols
      else target.fields.map(_.name).take(src.columns.length).toSeq
    require(names.length == src.columns.length,
      s"INSERT has ${src.columns.length} expressions for ${names.length} target columns")
    val renamed = src.toDF(names: _*)
    renamed.select(target.fields.map { f =>
      if (names.exists(_.equalsIgnoreCase(f.name))) {
        val c = col(s"`${f.name}`")
        val srcIsString = renamed.schema.fields
          .find(_.name.equalsIgnoreCase(f.name)).exists(_.dataType == StringType)
        (if (srcIsString) pgTextCast(c, f.dataType)
         else c.cast(f.dataType)).as(f.name)
      } else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  /** PG's text rendering assigned onto a typed column — the COPY FROM /
    * VALUES ingest cast. Scalars use Spark's cast; `{a,"b",NULL}` array
    * text and `\x…` bytea hex need hand-parsing (Spark has no
    * string→array/binary cast). Array text goes through the PG-aware
    * tokenizer (PgWireSource.parseArray) — a split-on-comma would corrupt
    * quoted elements containing commas, escaped quotes, or backslash
    * escapes. The UDF is ingest-path-only (never in a read plan), so the
    * codegen break is confined to the row-arrival cast, exactly where the
    * reference also runs a per-row text parser. */
  private val parsePgArrayText =
    org.apache.spark.sql.functions.udf((s: String) =>
      if (s == null) null
      else graft.PgWireSource.parseArray(s.trim, trimUnquoted = true))

  private def pgTextCast(c: Column, dt: DataType): Column = dt match {
    case ArrayType(et, _) =>
      parsePgArrayText(c).cast(ArrayType(et))
    case BinaryType =>
      when(c.isNull, lit(null).cast(BinaryType))
        .when(substring(c, 1, 2) === "\\x",
          unhex(substring(c, 3, Int.MaxValue)))
        .otherwise(c.cast(BinaryType))
    case other => c.cast(other)
  }

  // ---- UPDATE / DELETE ---------------------------------------------------

  private val updateRe =
    "(?is)UPDATE\\s+(?:ONLY\\s+)?([\\w.\"]+)\\s+SET\\s+(.*)".r
  private val deleteRe =
    "(?is)DELETE\\s+FROM\\s+(?:ONLY\\s+)?([\\w.\"]+)(\\s+.*)?".r

  private def update(spark: SparkSession, store: Store, s0: String): PgResult = {
    val (s, returning) = splitReturning(s0)
    s match {
      // split at the TOP-LEVEL WHERE (not the regex's first textual one —
      // `SET c = x FROM (SELECT … WHERE …) s WHERE …` is PG-legal)
      case updateRe(name, rest) =>
        val wIdx = topLevelWordIndex(rest, "WHERE")
        val setRaw = (if (wIdx < 0) rest else rest.substring(0, wIdx)).trim
        val whereRaw = if (wIdx < 0) null else rest.substring(wIdx + 5).trim
        if (hasTopLevelWord(setRaw, "FROM"))
          return updateFrom(spark, store, name, setRaw, whereRaw, returning)
        val t = requireStoreTable(store, name, "UPDATE")
        val sets = splitTop(setRaw).map { a =>
          val eq = topLevelEq(a)
          require(eq > 0, s"bad SET assignment: $a")
          unquoteName(a.substring(0, eq).trim) ->
            PgDialect.translateExpr(a.substring(eq + 1).trim)
        }
        val where = Option(whereRaw).map(w => PgDialect.translateExpr(w.trim))
        // RETURNING reads the PRE-commit snapshot (immutable version dir)
        // with the SET projection applied — the post-update image
        val ret = returning.map(rs =>
          store.previewUpdate(t, sets, where).selectExpr(rs: _*))
        val (n, _, _) = store.updateWhere(t, sets, where)
        ret.map(Rows(_, "UPDATE")).getOrElse(Command(s"UPDATE $n"))
      case _ => throw UnsupportedQuery("unsupported query type: UPDATE")
    }
  }

  /** PG's join-update: `UPDATE t SET c = expr[, …] FROM src WHERE cond`.
    * Each target row with >= 1 match takes its assignments from ONE match
    * (PG leaves the pick unspecified on multi-match; here it is the first
    * by the assigned values' order — deterministic).
    *
    * Scale shape: ONE discovery job joins the target scan (tagged with
    * input_file_name) against the source and aggregates per-file distinct
    * matched rows — that single O(files)-row collect yields both the
    * hit-file set AND the command-tag count, so the count can never desync
    * from the rewrite and no second full scan runs. The rewrite then
    * copy-on-writes ONLY the hit files (Store.rewriteFiles): target rows
    * get a synthetic id, matches reduce to one per id, a left join applies
    * the assignments; every untouched file carries into the new version as
    * metadata. A 1%-selectivity join-update rewrites O(touched files), not
    * the table. The synthetic ids are used only WITHIN one action over one
    * deterministic file-list scan (never across jobs). */
  private def updateFrom(spark: SparkSession, store: Store, name: String,
      setRaw: String, whereRaw: String, returning: Option[Seq[String]]): PgResult = {
    require(whereRaw != null,
      "UPDATE … FROM requires a WHERE join condition")
    if (returning.isDefined)
      throw UnsupportedQuery("RETURNING is not supported with UPDATE … FROM")
    val t = requireStoreTable(store, name, "UPDATE")
    val fromIdx = topLevelWordIndex(setRaw, "FROM")
    val assignsRaw = setRaw.substring(0, fromIdx).trim
    val srcRaw = setRaw.substring(fromIdx + 4).trim
    val sets = splitTop(assignsRaw).map { a =>
      val eq = topLevelEq(a)
      require(eq > 0, s"bad SET assignment: $a")
      unquoteName(a.substring(0, eq).trim) ->
        PgDialect.translateExpr(a.substring(eq + 1).trim)
    }
    val (src, srcCleanup) = cacheJoinSources(spark, PgDialect.translateExpr(srcRaw))
    try {
    val cond = PgDialect.translateExpr(whereRaw.trim)
    val schema = store.read(t).schema
    val cols = schema.fieldNames.toSeq
    require(sets.forall(s => cols.contains(s._1)),
      s"UPDATE $t: unknown column in SET")
    val (hits, n) = joinDmlDiscover(spark, store, t, src, cond)
    if (n == 0) return Command("UPDATE 0")
    val vAliases = sets.zipWithIndex.map { case (_, i) => s"__v$i" }
    val setSelect = sets.zip(vAliases)
      .map { case ((_, e), a) => s"($e) AS $a" }.mkString(", ")
    // PG's assignment cast: the stored column type never drifts, however
    // wide the source expression's literal type is
    val proj = cols.map { c =>
      sets.indexWhere(_._1 == c) match {
        case -1 => s"__upd_t.`$c`"
        case i => s"CAST(CASE WHEN __m.__mrid IS NOT NULL THEN __m.__v$i " +
          s"ELSE __upd_t.`$c` END AS ${schema(c).dataType.sql}) AS `$c`"
      }
    }.mkString(", ")
    val view = s"__dml_back_${System.nanoTime}"
    try store.rewriteFiles(t, hits) { back =>
      back.withColumn("__rid", monotonically_increasing_id())
        .createOrReplaceTempView(view)
      PgDialect.bindCurrentTxn(spark.sql(
        s"""WITH __upd_t AS (SELECT * FROM $view),
           |__m0 AS (
           |  SELECT `$t`.__rid AS __mrid, $setSelect
           |  FROM __upd_t AS `$t`, $src WHERE $cond),
           |__m AS (
           |  SELECT * FROM (
           |    SELECT *, row_number() OVER (PARTITION BY __mrid
           |      ORDER BY ${vAliases.mkString(", ")}) AS __rn FROM __m0)
           |  WHERE __rn = 1)
           |SELECT $proj FROM __upd_t LEFT JOIN __m
           |  ON __upd_t.__rid = __m.__mrid""".stripMargin))
    } finally { spark.catalog.dropTempView(view); () }
    Command(s"UPDATE $n")
    } finally srcCleanup()
  }

  /** Persist the expensive part of a join-DML source across its TWO
    * consumers (the discovery job and the rewrite job): each top-level
    * parenthesized subquery in the FROM/USING list evaluates into a
    * persisted temp view — computed once, during discovery — and the
    * fragment is rewritten to reference the view. Plain table refs pass
    * through untouched (re-scanning a table is cheap, and its bare name
    * may qualify columns in the join condition). A subquery with a
    * column-alias list (`(SELECT …) s(a, b)`) also passes through — rare,
    * and the rename must stay inside the SQL. Returns the rewritten
    * fragment and a cleanup thunk (drop views + unpersist). */
  private def cacheJoinSources(spark: SparkSession, src: String)
      : (String, () => Unit) = {
    val cached = scala.collection.mutable.ArrayBuffer
      .empty[(String, org.apache.spark.sql.DataFrame)]
    val out = splitTop(src).map(_.trim).map { item =>
      if (!item.startsWith("(")) item
      else {
        // find the subquery's closing paren (quote-aware)
        var depth = 0; var inStr = false; var i = 0; var close = -1
        while (i < item.length && close < 0) {
          val ch = item.charAt(i)
          if (inStr) { if (ch == '\'') inStr = false }
          else ch match {
            case '\'' => inStr = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        val alias = if (close < 0) "" else
          item.substring(close + 1).trim.replaceFirst("(?i)^AS\\s+", "").trim
        if (close < 0 || alias.isEmpty || !alias.matches("[\\w\"]+")) item
        else {
          val view = s"__dml_src_${System.nanoTime}"
          val df = PgDialect.bindCurrentTxn(
            spark.sql(item.substring(1, close))).persist()
          df.createOrReplaceTempView(view)
          cached += ((view, df))
          s"$view AS $alias"
        }
      }
    }.mkString(", ")
    (out, () => cached.foreach { case (v, df) =>
      spark.catalog.dropTempView(v); df.unpersist(); () })
  }

  /** One discovery job for the join-DML paths: join the target scan —
    * tagged with its source file and an intra-job row id — against the
    * source, aggregate distinct matched rows per file. The driver sees
    * O(files) rows and gets the hit-file basenames AND the total affected
    * count from the same plan. */
  private def joinDmlDiscover(spark: SparkSession, store: Store, t: String,
      src: String, cond: String): (Set[String], Long) = {
    val view = s"__dml_scan_${System.nanoTime}"
    store.read(t)
      .withColumn("__file", input_file_name())
      .withColumn("__rid", monotonically_increasing_id())
      .createOrReplaceTempView(view)
    try {
      val perFile = PgDialect.bindCurrentTxn(spark.sql(
        s"SELECT `$t`.__file AS __f, count(DISTINCT `$t`.__rid) AS __n " +
          s"FROM $view AS `$t`, $src WHERE $cond GROUP BY `$t`.__file"))
        .collect().map(r => baseName(r.getString(0)) -> r.getLong(1))
      (perFile.map(_._1).toSet, perFile.map(_._2).sum)
    } finally { spark.catalog.dropTempView(view); () }
  }

  private def baseName(uri: String): String =
    uri.substring(uri.lastIndexOf('/') + 1)

  private def delete(spark: SparkSession, store: Store, s0: String): PgResult = {
    val (s, returning) = splitReturning(s0)
    s match {
      case deleteRe(name, restRaw) =>
        val rest = Option(restRaw).map(_.trim).getOrElse("")
        val up = rest.toUpperCase
        if (up.startsWith("USING") &&
            (rest.length == 5 || rest.charAt(5).isWhitespace)) {
          // split the USING body at the TOP-LEVEL WHERE — a filtered
          // subquery source (`USING (SELECT … WHERE …) s WHERE …`) must
          // not mis-split at its inner WHERE
          if (returning.isDefined)
            throw UnsupportedQuery("RETURNING is not supported with DELETE … USING")
          val body = rest.substring(5).trim
          val wIdx = topLevelWordIndex(body, "WHERE")
          val srcRaw = (if (wIdx < 0) body else body.substring(0, wIdx)).trim
          // PG allows USING without WHERE (cross-join delete)
          val condRaw = if (wIdx < 0) "true" else body.substring(wIdx + 5).trim
          deleteUsing(spark, store, name, srcRaw, condRaw)
        } else if (rest.isEmpty || (up.startsWith("WHERE") &&
            (rest.length == 5 || rest.charAt(5).isWhitespace))) {
          val t = requireStoreTable(store, name, "DELETE")
          val where =
            if (rest.isEmpty) None
            else Some(PgDialect.translateExpr(rest.substring(5).trim))
          val ret = returning.map(rs =>
            store.previewMatching(t, where).selectExpr(rs: _*))
          val (n, _, _) = store.deleteWhere(t, where)
          ret.map(Rows(_, "DELETE")).getOrElse(Command(s"DELETE $n"))
        } else throw UnsupportedQuery("unsupported query type: DELETE")
      case _ => throw UnsupportedQuery("unsupported query type: DELETE")
    }
  }

  /** PG's join-delete: rows with >= 1 source match go. Same scale shape as
    * [[updateFrom]]: one discovery job yields the hit files + the count,
    * then only hit files rewrite (synthetic-id anti-join, ids intra-job
    * only); untouched files carry as metadata. */
  private def deleteUsing(spark: SparkSession, store: Store, name: String,
      srcRaw: String, condRaw: String): PgResult = {
    val t = requireStoreTable(store, name, "DELETE")
    val (src, srcCleanup) = cacheJoinSources(spark, PgDialect.translateExpr(srcRaw))
    try {
    val cond = PgDialect.translateExpr(condRaw)
    val (hits, n) = joinDmlDiscover(spark, store, t, src, cond)
    if (n == 0) return Command("DELETE 0")
    val view = s"__dml_back_${System.nanoTime}"
    try store.rewriteFiles(t, hits) { back =>
      back.withColumn("__rid", monotonically_increasing_id())
        .createOrReplaceTempView(view)
      PgDialect.bindCurrentTxn(spark.sql(
        s"""WITH __del_t AS (SELECT * FROM $view),
           |__hit AS (
           |  SELECT DISTINCT `$t`.__rid AS __hrid
           |  FROM __del_t AS `$t`, $src WHERE $cond)
           |SELECT __del_t.* EXCEPT(__rid) FROM __del_t
           |LEFT ANTI JOIN __hit ON __del_t.__rid = __hit.__hrid""".stripMargin))
    } finally { spark.catalog.dropTempView(view); () }
    Command(s"DELETE $n")
    } finally srcCleanup()
  }

  /** Split a trailing top-level RETURNING list off a DML statement. */
  private def splitReturning(s: String): (String, Option[Seq[String]]) = {
    var depth = 0; var inStr = false; var i = 0; var at = -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 &&
            s.regionMatches(true, i, "RETURNING", 0, 9) &&
            (i == 0 || !s.charAt(i - 1).isLetterOrDigit) &&
            (i + 9 >= s.length || !s.charAt(i + 9).isLetterOrDigit) =>
          at = i
        case _ =>
      }
      i += 1
    }
    if (at < 0) (s, None)
    else (s.substring(0, at).trim,
      Some(splitTop(s.substring(at + 9))
        .map(x => PgDialect.translateExpr(x.trim))))
  }

  /** VACUUM [FULL] t — small-file compaction + snapshot expiry (the
    * Iceberg maintenance pair behind the familiar PG spelling). */
  private def vacuum(spark: SparkSession, store: Store, s: String): PgResult = {
    val m = "(?is)VACUUM\\s+(FULL\\s+)?(?:ANALYZE\\s+)?([\\w.\"]+)\\s*".r
    s match {
      case m(full, name) =>
        val t = requireStoreTable(store, name, "VACUUM")
        store.vacuum(t, full = full != null)
        Command("VACUUM")
      case _ => throw UnsupportedQuery("unsupported query type: VACUUM")
    }
  }

  private def truncate(spark: SparkSession, store: Store, s: String): PgResult = {
    // PG accepts a table LIST (pgbench -i: `truncate table a, b, c, d`)
    // plus trailing RESTART IDENTITY / CASCADE options (no sequences or
    // FKs in the store — accepted and inert, like PG with none defined)
    val m = ("(?is)TRUNCATE\\s+(?:TABLE\\s+)?(?:ONLY\\s+)?" +
      "([\\w.\"]+(?:\\s*,\\s*[\\w.\"]+)*)" +
      "(?:\\s+(?:RESTART|CONTINUE)\\s+IDENTITY)?(?:\\s+(?:CASCADE|RESTRICT))?\\s*").r
    s match {
      case m(names) =>
        // validate the whole list before truncating any member — PG's
        // statement atomicity for the common missing-table case
        val ts = names.split(",").map(n => requireStoreTable(store, n.trim, "TRUNCATE"))
        ts.foreach(store.truncate)
        Command("TRUNCATE TABLE")
      case _ => throw UnsupportedQuery("unsupported query type: TRUNCATE")
    }
  }

  // ---- MERGE -------------------------------------------------------------

  private val mergeRe =
    ("(?is)MERGE\\s+INTO\\s+([\\w.\"]+)(?:\\s+(?:AS\\s+)?(\\w+))?\\s+USING\\s+" +
      "(\\([^)]*(?:\\([^)]*\\)[^)]*)*\\)|[\\w.\"]+)(?:\\s+(?:AS\\s+)?(\\w+))?\\s+" +
      "ON\\s+(.*?)\\s+(WHEN\\s+.*)").r
  private val onRe =
    "(?is)\\s*([\\w\"]+)\\.([\\w\"]+)\\s*=\\s*([\\w\"]+)\\.([\\w\"]+)\\s*".r

  private def merge(spark: SparkSession, store: Store, s: String): PgResult = s match {
    case mergeRe(name, tAliasRaw, usingRaw, sAliasRaw, onRaw, whensRaw) =>
      val t = requireStoreTable(store, name, "MERGE")
      val tAlias = Option(tAliasRaw).getOrElse(unquoteName(name))
      val sAlias = Option(sAliasRaw).getOrElse(
        if (usingRaw.startsWith("(")) "__src" else unquoteName(usingRaw))
      val source =
        if (usingRaw.startsWith("(")) PgDialect.bindCurrentTxn(
          spark.sql(PgDialect.translateSelect(
            usingRaw.substring(1, usingRaw.length - 1))))
        else if (store.exists(unquoteName(usingRaw))) store.read(unquoteName(usingRaw))
        else spark.table(unquoteName(usingRaw))
      // equi-key ON (the mergeable shape; the reference's write model is
      // merge-by-unique-key): `a.k1 = b.k2` with one side per relation
      val (tKey, sKey) = PgDialect.translateExpr(onRaw) match {
        case onRe(q1, c1, q2, c2) =>
          if (unquoteName(q1).equalsIgnoreCase(tAlias) &&
            unquoteName(q2).equalsIgnoreCase(sAlias))
            (unquoteName(c1), unquoteName(c2))
          else if (unquoteName(q1).equalsIgnoreCase(sAlias) &&
            unquoteName(q2).equalsIgnoreCase(tAlias))
            (unquoteName(c2), unquoteName(c1))
          else throw UnsupportedQuery(
            s"MERGE ON must reference $tAlias and $sAlias")
        case _ => throw UnsupportedQuery(
          "MERGE supports an equi-join ON target.key = source.key")
      }
      val clauses = parseWhens(whensRaw, store.read(t).schema)
      val (u, d, i) = store.merge(t, source, tKey, sKey, clauses,
        targetAlias = tAlias, sourceAlias = sAlias)
      Command(s"MERGE ${u + d + i}")
    case _ => throw UnsupportedQuery("unsupported query type: MERGE")
  }

  private val whenRe =
    ("(?is)WHEN\\s+(NOT\\s+)?MATCHED\\s*(?:AND\\s+(.*?))?\\s*THEN\\s+" +
      "(UPDATE\\s+SET\\s+.*?|DELETE|INSERT\\s*.*?|DO\\s+NOTHING)\\s*(?=WHEN\\s+(?:NOT\\s+)?MATCHED|$)").r

  private def parseWhens(raw: String, target: StructType): Seq[Store.MergeClause] =
    whenRe.findAllMatchIn(raw).flatMap { m =>
      val notMatched = m.group(1) != null
      val cond = Option(m.group(2)).map(c => PgDialect.translateExpr(c.trim))
      val action = m.group(3).trim
      val up = action.toUpperCase
      if (up.startsWith("DO")) None
      else if (up == "DELETE") {
        require(!notMatched, "WHEN NOT MATCHED cannot DELETE")
        Some(Store.MatchedDelete(cond))
      } else if (up.startsWith("UPDATE")) {
        require(!notMatched, "WHEN NOT MATCHED cannot UPDATE")
        val sets = splitTop(action.replaceFirst("(?is)UPDATE\\s+SET\\s+", "")).map { a =>
          val eq = topLevelEq(a)
          require(eq > 0, s"bad SET assignment: $a")
          unquoteName(a.substring(0, eq).trim) ->
            PgDialect.translateExpr(a.substring(eq + 1).trim)
        }
        Some(Store.MatchedUpdate(cond, sets))
      } else {
        require(notMatched, "WHEN MATCHED cannot INSERT")
        val insRe = "(?is)INSERT\\s*(\\([^)]*\\))?\\s*VALUES\\s*\\((.*)\\)\\s*".r
        action match {
          case insRe(colsRaw, valsRaw) =>
            val vals = splitTop(valsRaw).map(v => PgDialect.translateExpr(v.trim))
            val cols = Option(colsRaw)
              .map(c => splitTop(c.stripPrefix("(").stripSuffix(")"))
                .map(x => unquoteName(x.trim)))
              .getOrElse(target.fields.map(_.name).take(vals.length).toSeq)
            require(cols.length == vals.length,
              s"INSERT has ${vals.length} values for ${cols.length} columns")
            Some(Store.NotMatchedInsert(cond, cols, vals))
          case _ => throw UnsupportedQuery(s"unparseable MERGE insert: $action")
        }
      }
    }.toSeq

  // ---- tiny lexers -------------------------------------------------------

  /** Split on top-level commas (paren- and quote-aware). */
  private[graft] def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var last = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(last, i); last = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(last)
    out.result().filter(_.trim.nonEmpty)
  }

  /** True when `word` appears outside every paren/string nesting level —
    * a FROM inside `(SELECT … FROM u)` does not count. */
  private def topLevelWordIndex(s: String, word: String): Int = {
    var depth = 0; var inStr = false
    var i = 0
    val w = word.toUpperCase
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && s.regionMatches(true, i, w, 0, w.length) &&
            (i == 0 || !s.charAt(i - 1).isLetterOrDigit) &&
            (i + w.length >= s.length || !s.charAt(i + w.length).isLetterOrDigit) =>
          return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def hasTopLevelWord(s: String, word: String): Boolean = {
    var depth = 0; var inStr = false
    var i = 0
    val w = word.toUpperCase
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && s.regionMatches(true, i, w, 0, w.length) &&
            (i == 0 || !s.charAt(i - 1).isLetterOrDigit) &&
            (i + w.length >= s.length || !s.charAt(i + w.length).isLetterOrDigit) =>
          return true
        case _ =>
      }
      i += 1
    }
    false
  }

  /** Index of the first top-level `=` that is an assignment (not part of
    * `<=`, `>=`, `!=`, `<>`). */
  private def topLevelEq(s: String): Int = {
    var depth = 0; var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case '=' if depth == 0 &&
            (i == 0 || !"<>!".contains(s.charAt(i - 1))) => return i
        case _ =>
      }
      i += 1
    }
    -1
  }
}
