package graft

/** Aggregate-rollup rewrite: answer a GROUP BY query over a base table from
  * a FRESH incrementally-maintained materialized view instead of the table
  * itself (Calcite/Materialize-style aggregate navigation, conservative).
  *
  * A dashboard query `SELECT g, sum(x) FROM fact GROUP BY g` re-scans the
  * fact table on every refresh; when an incremental matview already holds
  * `GROUP BY g, h` aggregates of the same table, the identical answer rolls
  * up from the view's few-thousand rows. At 100 TB this is the difference
  * between a full fact scan and a broadcast-sized read — and freshness is
  * free here because [[Store.incrementalRefresh]] keeps the view at the
  * base's current version for O(changed files) per sync.
  *
  * Correct by construction, not by hope:
  *  - only views that REFLECT THE BASE'S CURRENT VERSION qualify
  *    ([[Store.rollupViews]]); a stale view never shadows live data,
  *  - count/sum roll up additively; min/max roll up as min/max over the
  *    view's per-group extrema; avg and stddev/variance re-derive from the
  *    view's hidden sum/count/sumsq state columns (exact — a weighted
  *    average of visible averages would not be),
  *  - the WHERE clause may only reference the view's group columns (then it
  *    commutes with the view's aggregation); anything else falls through to
  *    the base-table plan — never a wrong answer, only a missed shortcut.
  *
  * Runs on the translated (Spark-dialect) SQL text, mirroring how the
  * reference's remapper layer rewrites statements before the engine sees
  * them; the relational work stays Catalyst's.
  */
object RollupRewrite {

  /** Instrumentation for specs: how many statements were answered from a
    * matview. */
  private[graft] val rewrites = new java.util.concurrent.atomic.AtomicLong()

  // reject outright: shapes whose semantics the rollup cannot preserve
  // (INNER equi-join chains are handled — they can match a star view)
  private val unsupported =
    ("(?is).*\\b(UNION|INTERSECT|EXCEPT|DISTINCT|OVER|WINDOW|WITH" +
      "|LATERAL|VALUES|LEFT|RIGHT|FULL|CROSS|OUTER|SEMI|ANTI|USING)\\b.*").r
  private val shape =
    ("(?is)\\s*SELECT\\s+(.*?)\\s+FROM\\s+([A-Za-z_]\\w*)" +
      "((?:\\s+(?:INNER\\s+)?JOIN\\s+\\w+\\s+ON\\s+\\w+\\.\\w+\\s*=\\s*\\w+\\.\\w+)*)" +
      "(?:\\s+WHERE\\s+(.*?))?\\s+GROUP\\s+BY\\s+(.*?)" +
      "(?:\\s+HAVING\\s+(.*?))?" +
      "(\\s+ORDER\\s+BY\\s+.*?)?(\\s+LIMIT\\s+\\d+)?\\s*;?\\s*").r
  private val joinRe =
    "(?is)JOIN\\s+(\\w+)\\s+ON\\s+(\\w+\\.\\w+)\\s*=\\s*(\\w+\\.\\w+)".r

  /** Canonical form of a join set: (dim, sorted ON sides), order-free. */
  private def joinKey(joins: Seq[(String, String)]): Set[(String, String)] =
    joins.map { case (dim, on) =>
      val sides = on.toLowerCase.split("=").map(_.trim).sorted
      (dim.toLowerCase, sides.mkString("="))
    }.toSet

  // columns may be table-qualified (fact.col) — the qualifier is dropped
  // after validating it names a table in the query's FROM (the view's
  // columns are the bare output names)
  private val BareCol = "(?is)(?:([A-Za-z_]\\w*)\\.)?([A-Za-z_]\\w*)".r
  private val CountStar = "(?is)count\\(\\s*\\*\\s*\\)(?:\\s+AS\\s+(\\w+))?".r
  private val AggCol = "(?is)(sum|min|max|avg|count|approx_count_distinct|stddev|stddev_samp|variance|var_samp)\\(\\s*(?:([A-Za-z_]\\w*)\\.)?([A-Za-z_]\\w*)\\s*\\)(?:\\s+AS\\s+(\\w+))?".r
  // time-hierarchy group expressions: deterministic scalar functions of ONE
  // group column (a month bucket is a function of the day value, so a
  // day-grained view rolls up to months exactly)
  private val GroupExpr =
    ("(?is)(?:date_trunc\\(\\s*('\\w+')\\s*,\\s*(?:([A-Za-z_]\\w*)\\.)?([A-Za-z_]\\w*)\\s*\\)" +
      "|(year|month|quarter|day|dayofweek|to_date)\\(\\s*(?:([A-Za-z_]\\w*)\\.)?([A-Za-z_]\\w*)\\s*\\))").r
  private val AliasedItem = "(?is)(.+?)\\s+AS\\s+([A-Za-z_]\\w*)".r

  /** One GROUP BY item: canonical (qualifier-stripped) text + the single
    * view group column it is a function of. */
  private case class GItem(text: String, src: String)

  // identifiers allowed in a WHERE clause besides the view's group columns
  private val whereKeywords = Set(
    "and", "or", "not", "in", "is", "null", "between", "like", "true",
    "false", "cast", "as", "int", "integer", "bigint", "smallint", "double",
    "float", "string", "varchar", "boolean", "decimal", "date", "timestamp")

  /** Attempt the rewrite; None = leave the statement alone. With
    * `autoRefresh` (SET graft.rollup_auto_refresh = on), a STALE matching
    * view is first brought to the base's current version through the
    * O(changed-files) incremental refresh and then answers — same result
    * as the base by construction, without the fact-table scan. */
  /** `columnsOf(table)` = that relation's column names (empty when
    * unresolvable): a qualified reference `t.c` only matches when `c`
    * really is a column of `t`, so a query the base plan would REJECT is
    * never silently answered by the view. */
  def apply(store: Store, sql: String, autoRefresh: Boolean = false,
      columnsOf: String => Set[String] = _ => Set.empty): Option[String] = {
    if (unsupported.matches(sql)) return None
    // exactly one SELECT (no subqueries anywhere)
    if ("(?i)\\bSELECT\\b".r.findAllIn(sql).size != 1) return None
    sql match {
      case shape(selectList, base, joinsRaw, whereRaw, groupRaw, havingRaw,
          orderTail, limitTail) =>
        val queryJoins = joinRe.findAllMatchIn(Option(joinsRaw).getOrElse(""))
          .map(m => (m.group(1), s"${m.group(2)} = ${m.group(3)}")).toSeq
        val tables = (base +: queryJoins.map(_._1)).map(_.toLowerCase).toSet
        // a qualifier must name a query table AND actually own the column
        // (a dangling t.c would error in the base plan; the rewrite must
        // not mask that)
        def known(q: String, c: String): Boolean = q == null ||
          (tables(q.toLowerCase) && columnsOf(q).contains(c))
        val selectItems = PgDialect.splitTopLevel(selectList).map(_.trim)
        def parseGroup(s: String): Option[GItem] = s.trim match {
          // positional (GROUP BY 1): resolve to the Nth select item's
          // expression (alias stripped)
          case pos if pos.matches("\\d+") =>
            val i = pos.toInt
            if (i < 1 || i > selectItems.size) None
            else {
              val resolved = selectItems(i - 1) match {
                case AliasedItem(e, _) => e.trim
                case e => e
              }
              // a numeric select item would recurse forever (SELECT 1 ...)
              if (resolved.matches("\\d+")) None else parseGroup(resolved)
            }
          case BareCol(q, c) if known(q, c) => Some(GItem(c, c))
          case GroupExpr(unit, q1, c1, fn, q2, c2) =>
            if (unit != null && known(q1, c1)) Some(GItem(s"date_trunc($unit, $c1)", c1))
            else if (fn != null && known(q2, c2)) Some(GItem(s"${fn.toLowerCase}($c2)", c2))
            else None
          case _ => None
        }
        // NOTE: split is safe for the accepted grammar — a comma inside
        // date_trunc('m', d) sits inside parens, so splitTopLevel is used
        val groupItems = PgDialect.splitTopLevel(groupRaw)
          .map(g => parseGroup(g).getOrElse(return None))
        val where = Option(whereRaw).map(_.trim).filter(_.nonEmpty)
        val having = Option(havingRaw).map(_.trim).filter(_.nonEmpty)
        val items = selectItems
        // an ORDER BY may only name select aliases / group columns — an
        // aggregate expression in it would reference base columns the
        // rewritten query no longer has
        val aliases = items.flatMap {
          case CountStar(a) => Option(a)
          case AggCol(_, _, _, a) => Option(a)
          case AliasedItem(_, a) => Some(a)
          case BareCol(q, c) if known(q, c) => Some(c)
          case _ => None
        }.toSet
        val plainGroupNames = groupItems.collect { case GItem(t, s) if t == s => t }
        if (!orderRefsOnly(Option(orderTail), aliases ++ plainGroupNames)) return None
        val qKey = joinKey(queryJoins)
        def attempt(views: Seq[Store.RollupView]): Option[(Store.RollupView, String)] =
          // the view must aggregate the SAME joined relation (identical
          // dim set and ON conditions — a differing join changes row
          // multiplicity); then smallest group set first
          views.filter(v => joinKey(v.joins) == qKey)
            .sortBy(_.groupCols.size).flatMap { v =>
              rewriteWith(v, items, groupItems, where, having, tables, columnsOf).map(v -> _)
            }.headOption
        attempt(store.rollupViews(base))
          .orElse {
            if (!autoRefresh) None
            else attempt(store.staleRollupViews(base)).map { case (v, sql) =>
              store.incrementalRefresh(v.view); (v, sql)
            }
          }
          .map { case (_, rewritten) =>
            rewrites.incrementAndGet()
            rewritten + Option(orderTail).getOrElse("") + Option(limitTail).getOrElse("")
          }
      case _ => None
    }
  }

  private val orderKeywords =
    Set("order", "by", "asc", "desc", "nulls", "first", "last")

  private def orderRefsOnly(tail: Option[String], names: Set[String]): Boolean =
    tail.forall { t =>
      !t.contains("(") &&
        "[A-Za-z_]\\w*".r.findAllIn(t).forall(id =>
          names(id) || orderKeywords(id.toLowerCase))
    }

  /** Derive an aggregate CALL (no alias) against the view's columns;
    * None when the view cannot supply it. */
  private def deriveAgg(v: Store.RollupView, fn: String, c: String): Option[String] =
    fn.toLowerCase match {
      case "count(*)" => Some(s"sum(${v.countAlias})")
      // count(col) = non-null count: the hidden avg/dev state keeps it
      case "count" =>
        v.avgs.get(c).orElse(v.devs.get(c).map(_._1))
          .map(a => s"sum(${Store.avgCntAlias(a)})")
      case "sum" => v.sums.get(c).map(a => s"sum($a)")
      // approx distinct re-derives by UNIONING the view's mergeable HLL
      // sketches — the estimate carries the sketch's documented error
      // bound at any rollup granularity, never a join-order artifact
      case "approx_count_distinct" =>
        v.hlls.get(c).map(a =>
          s"hll_sketch_estimate(hll_union_agg(${Store.hllAlias(a)}))")
      case "min" => v.mins.get(c).map(a => s"min($a)")
      case "max" => v.maxs.get(c).map(a => s"max($a)")
      case "avg" => v.avgs.get(c).map(avgSql)
      case "stddev" | "stddev_samp" =>
        v.devs.get(c).collect { case (a, "stddev") => devSql(a, sqrt = true) }
      case "variance" | "var_samp" =>
        v.devs.get(c).collect { case (a, "variance") => devSql(a, sqrt = false) }
      case _ => None
    }

  // aggregate calls embedded in a HAVING clause
  private val HavingAgg =
    ("(?is)\\b(?:count\\(\\s*\\*\\s*\\)" +
      "|(sum|min|max|avg|count|approx_count_distinct|stddev|stddev_samp|variance|var_samp)" +
      "\\(\\s*(?:([A-Za-z_]\\w*)\\.)?([A-Za-z_]\\w*)\\s*\\))").r

  /** Rewrite a HAVING clause onto the view: every aggregate call derives
    * like a select item; every remaining identifier must be a group column
    * or keyword. */
  private def rewriteHaving(v: Store.RollupView, h: String,
      viewGroups: Set[String]): Option[String] = {
    var ok = true
    // validate residue first: with agg calls blanked, only group
    // cols/keywords/literals may remain
    val blanked = HavingAgg.replaceAllIn(h, "0")
    if (!whereRefsOnly(blanked, viewGroups)) return None
    val rewritten = HavingAgg.replaceAllIn(h, m => {
      val derived =
        if (m.group(1) == null) deriveAgg(v, "count(*)", "")
        else deriveAgg(v, m.group(1), m.group(3))
      derived match {
        case Some(d) => scala.util.matching.Regex.quoteReplacement(s"($d)")
        case None => ok = false; "0"
      }
    })
    if (ok) Some(rewritten) else None
  }

  private def rewriteWith(v: Store.RollupView, items: Seq[String],
      groupItems: Seq[GItem], where0: Option[String], having0: Option[String],
      tables: Set[String], columnsOf: String => Set[String]): Option[String] = {
    val viewGroups = v.groupCols.toSet
    def known(q: String, c: String): Boolean = q == null ||
      (tables(q.toLowerCase) && columnsOf(q).contains(c))
    // strip known table qualifiers OUTSIDE string literals: the view's
    // columns are bare output names, so `fact.region` in a predicate must
    // become `region` — but 'fact.region' as DATA must survive untouched
    def strip(s: String): String =
      "'(?:[^']|'')*'".r.split(s).map(
        _.replaceAll("(?i)\\b(" + tables.mkString("|") + ")\\.", ""))
        .zipAll("'(?:[^']|'')*'".r.findAllIn(s).toSeq, "", "")
        .map { case (code, lit) => code + lit }.mkString
    val where = where0.map(strip)
    // every group item must be a (function of a) view group column
    if (!groupItems.forall(g => viewGroups(g.src))) return None
    if (!where.forall(w => whereRefsOnly(w, viewGroups))) return None
    val groupTexts = groupItems.map(_.text)
    val selects = items.map {
      case BareCol(q, c) if known(q, c) && groupTexts.contains(c) => Some(c)
      // aggregates must be explicitly aliased: an unaliased rewrite would
      // surface the view's internal column names
      case CountStar(alias) if alias != null =>
        deriveAgg(v, "count(*)", "").map(d => s"$d AS $alias")
      case AggCol(fn, q, c, alias) if alias != null && known(q, c) =>
        deriveAgg(v, fn, c).map(d => s"$d AS $alias")
      // an aliased group EXPRESSION (e.g. date_trunc('month', d) AS m):
      // must canonicalize to one of the GROUP BY items
      case AliasedItem(expr, alias) =>
        expr.trim match {
          case GroupExpr(unit, q1, c1, fn, q2, c2) =>
            val canon =
              if (unit != null && known(q1, c1)) Some(s"date_trunc($unit, $c1)")
              else if (fn != null && known(q2, c2)) Some(s"${fn.toLowerCase}($c2)")
              else None
            canon.filter(groupTexts.contains).map(t => s"$t AS $alias")
          case _ => None
        }
      case _ => None
    }
    if (selects.exists(_.isEmpty)) return None
    val wherePart = where.map(w => s" WHERE $w").getOrElse("")
    val havingPart = having0.map(strip) match {
      case None => ""
      case Some(h) => rewriteHaving(v, h, viewGroups) match {
        case Some(rh) => s" HAVING $rh"
        case None => return None
      }
    }
    // the companion __state view exposes the hidden sum/count/sumsq
    // columns alongside the visible ones (Store.publish)
    Some(s"SELECT ${selects.flatten.mkString(", ")} FROM ${v.view}__state$wherePart" +
      s" GROUP BY ${groupTexts.mkString(", ")}$havingPart")
  }

  /** avg re-derived from hidden sum/count state: exact at any rollup
    * granularity, NULL when the rolled-up group has no non-null rows
    * (Spark's non-ANSI x/0 is NULL, matching avg-of-empty). */
  private def avgSql(alias: String): String = {
    val s = Store.avgSumAlias(alias); val c = Store.avgCntAlias(alias)
    s"CAST(sum($s) AS DOUBLE) / CAST(sum($c) AS DOUBLE)"
  }

  /** Sample stddev/variance from hidden sum/count/sumsq state — the same
    * formula [[Store]]'s ivmFinish applies, over the rolled-up sums. */
  private def devSql(alias: String, sqrt: Boolean): String = {
    val s = s"CAST(sum(${Store.avgSumAlias(alias)}) AS DOUBLE)"
    val c = s"CAST(sum(${Store.avgCntAlias(alias)}) AS DOUBLE)"
    val q = s"sum(${Store.devSqAlias(alias)})"
    val variance = s"GREATEST(CAST(0 AS DOUBLE), ($q - $s * $s / $c) / ($c - 1.0))"
    val body = if (sqrt) s"SQRT($variance)" else variance
    s"CASE WHEN sum(${Store.avgCntAlias(alias)}) >= 2 THEN $body END"
  }

  /** Conservative identifier audit: every bare identifier in the WHERE text
    * (string literals stripped) must be a view group column or a known SQL
    * keyword; function calls (ident followed by `(`) disqualify. */
  private def whereRefsOnly(w: String, groupCols: Set[String]): Boolean = {
    val noStrings = w.replaceAll("'(?:[^']|'')*'", " ")
    // a function CALL disqualifies — but `IN (...)` / `NOT (...)` are
    // keyword-parenthesis sequences, not calls
    val calls = "([A-Za-z_]\\w*)\\s*\\(".r.findAllMatchIn(noStrings).map(_.group(1))
    if (calls.exists(id => !whereKeywords(id.toLowerCase))) return false
    "[A-Za-z_]\\w*".r.findAllIn(noStrings).forall { id =>
      groupCols(id) || whereKeywords(id.toLowerCase)
    }
  }
}
