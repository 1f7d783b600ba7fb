package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hardened building blocks for the pipeline ops whose OUTPUT correctness
  * depends on an intermediate duplicate-elimination step.
  *
  * Why not `.distinct()`: a keys-only Distinct is planned as an Aggregate
  * with no aggregate functions — the one aggregate shape optimizer rules
  * are allowed to ELIDE outright when they judge the child already
  * distinct on the grouping keys. Under a loaded concurrent session
  * (the driver's 233-query verify sweep) that elision was observed to
  * misfire once: the candidate self-join's Distinct vanished from the
  * executed plan and raw pair multiplicities (one row per shared shingle)
  * leaked into the gated result. A grouping that carries a live count()
  * kept alive by a filter cannot be removed by any elision rule — doing so
  * would change the count column — while keeping the exact same shuffle
  * shape (hash partial -> exchange on the keys -> final), so the 100 TB
  * cost profile is identical to distinct.
  */
object SafeOps {

  /** `df.distinct()` with elision-proof planning (see object doc). */
  def distinctRows(df: DataFrame): DataFrame = {
    // collision-free count alias: an input that already carries __mult must
    // not make the groupBy ambiguous or silently group on it
    var mult = "__mult"
    while (df.columns.contains(mult)) mult = mult + "_"
    val grouped = df.groupBy(df.columns.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as(mult))
      // references the count so column pruning cannot strip the aggregate
      .filter(col(mult) > 0)
    grouped.select(df.columns.map(c => col(s"`$c`")): _*)
  }
}
