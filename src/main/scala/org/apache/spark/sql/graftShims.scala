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

  /** [[registerTempFunction]] for TABLE functions (round 20 — the SQL
    * surface for the persisted serving paths): the builder turns
    * bounded literal arguments into the serve's LogicalPlan, so
    * `SELECT * FROM graft_bm25('path')` plans exactly the DataFrame
    * serve. Same runtime/config duality as the scalar functions. */
  def registerTempTableFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** The logical plan of a DataFrame — the table-function builders'
    * return value (`queryExecution` is public but `classic`-typed). */
  def logicalPlan(df: Dataset[_])
    : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.logical
}
