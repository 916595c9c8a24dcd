package graft

import graft.functions.{DotProduct, HashedShingles, SimHash32}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for graft's custom Catalyst expressions, so
  * `spark.sql(...)` users reach them without the Scala API:
  *
  *   - `hashed_shingles(text, k)` — the single-pass shingle-hash
  *     Generator ([[graft.functions.HashedShingles]]); `k` must be an
  *     integer literal (it parameterizes the operator, it is not data).
  *   - `dot_product(a, b)` — the codegen'd similarity kernel
  *     ([[graft.functions.DotProduct]]).
  *   - `simhash32(hs)` — the codegen'd single-pass SimHash fingerprint
  *     fold ([[graft.functions.SimHash32]]).
  *
  * Two registration paths, same builders:
  *
  *   - Config (cluster/production):
  *     `--conf spark.sql.extensions=graft.GraftExtensions` — the
  *     standard `SparkSessionExtensions` injection every Spark
  *     extension library uses; applies to every session of the
  *     context.
  *   - Runtime (sessions already built, e.g. a test harness or an
  *     external driver): `GraftFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}

object GraftFunctions {

  /** Constant-fold `e` down to an Int. Any FOLDABLE integer expression
    * qualifies (`3`, `1 + 2`, `CAST(3 AS INT)`) — rejecting everything
    * but a bare `Literal` would refuse constants the analyzer itself
    * considers constant. Non-foldable, non-integer, or null arguments
    * raise an `AnalysisException` (the error surface SQL function
    * resolution reports to the user) under error conditions that EXIST
    * in this Spark version — the (errorClass, messageParameters)
    * constructor resolves the message template eagerly, so a
    * nonexistent class would turn every usage error into
    * `SparkException [INTERNAL_ERROR]` and hide the diagnostic. */
  private def intLit(e: Expression, funcName: String, paramName: String): Int =
    if (e.foldable && e.dataType == IntegerType) {
      e.eval() match {
        case v: Int => v
        case null => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "DATATYPE_MISMATCH.UNEXPECTED_NULL",
          messageParameters = Map(
            "sqlExpr" -> s"\"$funcName\"",
            "exprName" -> s"$funcName $paramName"))
      }
    } else {
      // covers BOTH failure modes (non-foldable, or foldable of the
      // wrong type) and prints the offending expression: "the input
      // `k` should be a foldable INT expression; however, got <sql>" —
      // NON_FOLDABLE_ARGUMENT would misdiagnose a foldable BIGINT/
      // STRING literal as "non-foldable"
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        messageParameters = Map(
          "sqlExpr" -> s"\"$funcName\"",
          "inputName" -> s"`$paramName`",
          "inputType" -> "\"INT\"",
          "inputExpr" -> s"\"${e.sql}\""))
    }

  /** (name, usage, builder) for every SQL-exposed function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("hashed_shingles",
      "hashed_shingles(text, k) - one row per distinct k-word shingle, hashed",
      args => {
        require(args.length == 2, "hashed_shingles(text, k) takes 2 arguments")
        HashedShingles(args.head, intLit(args(1), "hashed_shingles", "k"))
      }),
    ("dot_product",
      "dot_product(a, b) - double dot product of two float/double arrays",
      args => {
        require(args.length == 2, "dot_product(a, b) takes 2 arguments")
        DotProduct(args.head, args(1))
      }),
    ("simhash32",
      "simhash32(hs) - 32-bit SimHash fingerprint of a token-hash array",
      args => {
        require(args.length == 1, "simhash32(hs) takes 1 argument")
        SimHash32(args.head)
      }))

  /** Config-path injection (see [[GraftExtensions]]). */
  def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, null, name, usage, ""),
        builder))
    }

  /** Runtime-path registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftShims.registerTempFunction(spark, name, builder)
    }
}
