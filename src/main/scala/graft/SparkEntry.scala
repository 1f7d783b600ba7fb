package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * operator from SURVEY.md §2 plus the training-data pipeline ops);
  * `oracleSql` holds the DuckDB-dialect equivalent for the hash-compare
  * correctness gate. Non-SQL-expressible ops (LSH, heuristic scorers) omit
  * the oracle and are covered by ScalaTest invariants instead.
  */
object SparkEntry {

  /** All query modules, in display order. */
  def all: Seq[Q] = TpchQueries.defs ++ RelationalOps.defs ++ TemporalOps.defs ++
    EventOps.defs ++ FnQueries.defs ++ TextAnalysis.defs ++ Dedup.defs ++
    Similarity.defs ++ Multimodal.defs ++ StoreOps.defs ++ PgDialectOps.defs

  /** Names of the headline queries Bench times (the TPC-H-adapted sweep). */
  def benchNames: Seq[String] = TpchQueries.defs.map(_.name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        Tables.registerAll(s, dir)
        q.run(s, dir)
      }
    }.toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
