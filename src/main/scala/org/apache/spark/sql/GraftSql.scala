package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql]` plan constructor: build a DataFrame
  * from a hand-assembled LogicalPlan. The transaction snapshot rebind
  * (graft.PgDialect.bindTxnReads) edits an ANALYZED plan — swapping pinned
  * or staged version-dir relations in for the current ones — and needs a
  * way back to the public Dataset surface. Lives under org.apache.spark.sql
  * solely for access; nothing in Spark is modified. */
object GraftSql {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
