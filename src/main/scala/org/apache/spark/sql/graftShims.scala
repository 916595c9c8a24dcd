package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for library-defined Catalyst expressions (the standard
  * pattern Spark extension libraries use): `Column ⇄ Expression`
  * conversion lives behind `private[sql]` in Spark 4
  * (`classic.ExpressionUtils`), so this one-file shim inside the
  * `org.apache.spark.sql` package exposes exactly the two calls graft
  * needs. Deliberately session-independent — unlike
  * `SparkSessionExtensions.injectFunction`, it works no matter who
  * built the `SparkSession` (the test harness, `Verify`/`Bench`, or an
  * external driver that knows nothing about graft's extensions).
  */
object graftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** True iff the session's cache registry holds no cached relations —
    * the observable contract of the DedupOps loan forms ("after f, the
    * cache is as it was"). `CacheManager` is `private[sql]`, hence the
    * shim; the check is registry-level (what `clearCache()` would
    * drop), not block-level. */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Register a temp SQL function on an EXISTING session (the runtime
    * path for sessions built without `spark.sql.extensions=…`; the
    * config path is [[graft.GraftExtensions]]). */
  def registerTempFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
