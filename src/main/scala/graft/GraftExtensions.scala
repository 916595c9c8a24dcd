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

  /** A foldable STRING argument (a path, typically), constant-folded;
    * anything else raises the analyzer's usage error surface. */
  private def strLit(e: Expression, funcName: String, paramName: String): String =
    if (e.foldable && e.dataType == org.apache.spark.sql.types.StringType &&
        e.eval() != null)
      e.eval().toString
    else throw new org.apache.spark.sql.AnalysisException(
      errorClass = "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
      messageParameters = Map(
        "sqlExpr" -> s"\"$funcName\"",
        "inputName" -> s"`$paramName`",
        "inputType" -> "\"STRING\"",
        "inputExpr" -> s"\"${e.sql}\""))

  /** A foldable INT/BIGINT argument (a generation, a k). */
  private def longLit(e: Expression, funcName: String, paramName: String): Long =
    if (e.foldable && e.eval() != null &&
        (e.dataType == org.apache.spark.sql.types.LongType ||
          e.dataType == IntegerType))
      e.eval() match {
        case v: Long => v
        case v: Int  => v.toLong
      }
    else throw new org.apache.spark.sql.AnalysisException(
      errorClass = "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
      messageParameters = Map(
        "sqlExpr" -> s"\"$funcName\"",
        "inputName" -> s"`$paramName`",
        "inputType" -> "\"BIGINT\"",
        "inputExpr" -> s"\"${e.sql}\""))

  /** SQL TABLE functions over the PERSISTED serving paths (round 20 —
    * the r19 verdict's #6: the index serves were DataFrame-only; now a
    * SQL user reaches them with bounded literal args and the plan IS
    * the DataFrame serve's, so every pushdown/broadcast property the
    * plan-shape specs pin carries over verbatim):
    *
    *   - `graft_bm25(path[, asOfGen])` — the persisted inverted
    *     index's BM25 top-k ([[graft.queries.RetrievalOps.bm25SearchIndex]]).
    *   - `graft_passage(path[, asOfGen])` — passage-level BM25 from
    *     the persisted passage index.
    *   - `graft_hybrid(path[, asOfGen])` — the hybrid store's joint
    *     as-of serve ([[graft.queries.RetrievalOps.hybridServeAt]]).
    *   - `graft_labels(path[, asOfGen])` — the duplicate-family label
    *     index ([[graft.queries.DedupOps.labelsServeAt]]).
    *   - `graft_ivfpq(indexPath, dataDir[, k, numProbes])` — the
    *     trained IVF-PQ two-stage serve with probes drawn from
    *     `dataDir`'s embeddings table
    *     ([[graft.queries.SimilarityOps.q84ServeTrained]]'s shape).
    *
    * `asOfGen` defaults to the committed head — the same time-travel
    * contract as the Scala serves. */
  val tableFunctions: Seq[(String, String,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    def plan(df: org.apache.spark.sql.Dataset[_]): LogicalPlan =
      org.apache.spark.sql.graftShims.logicalPlan(df)
    def serveAt(fname: String)(
        f: (SparkSession, String, Long) => org.apache.spark.sql.DataFrame)
      : Seq[Expression] => LogicalPlan = { args =>
      require(args.length == 1 || args.length == 2,
        s"$fname(path[, asOfGen]) takes 1 or 2 arguments")
      val path = strLit(args.head, fname, "path")
      val gen =
        if (args.length == 2) longLit(args(1), fname, "asOfGen")
        else Long.MaxValue
      plan(f(SparkSession.active, path, gen))
    }
    Seq(
      ("graft_bm25",
        "graft_bm25(path[, asOfGen]) - BM25 top-k from the persisted inverted index",
        serveAt("graft_bm25")(queries.RetrievalOps.bm25SearchIndex)),
      ("graft_passage",
        "graft_passage(path[, asOfGen]) - passage BM25 from the persisted passage index",
        serveAt("graft_passage")(queries.RetrievalOps.passageSearchIndex)),
      ("graft_hybrid",
        "graft_hybrid(path[, asOfGen]) - the hybrid store's joint as-of serve",
        serveAt("graft_hybrid")(queries.RetrievalOps.hybridServeAt)),
      ("graft_labels",
        "graft_labels(path[, asOfGen]) - duplicate-family labels from the sealed index",
        serveAt("graft_labels")((s, p, g) =>
          queries.DedupOps.labelsServeAt(s, p, g))),
      ("graft_ivfpq",
        "graft_ivfpq(indexPath, dataDir[, k, numProbes]) - trained IVF-PQ two-stage serve, probes from dataDir's embeddings",
        args => {
          require(args.length >= 2 && args.length <= 4,
            "graft_ivfpq(indexPath, dataDir[, k, numProbes]) takes 2-4 arguments")
          val idx = strLit(args(0), "graft_ivfpq", "indexPath")
          val dir = strLit(args(1), "graft_ivfpq", "dataDir")
          val k = if (args.length >= 3)
            longLit(args(2), "graft_ivfpq", "k").toInt else 10
          val np = if (args.length >= 4)
            longLit(args(3), "graft_ivfpq", "numProbes").toInt else 10
          plan(queries.SimilarityOps
            .q84ServeTrained(SparkSession.active, dir, idx, k, np))
        }))
  }

  /** Config-path injection (see [[GraftExtensions]]). */
  def inject(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, null, name, usage, ""),
        builder))
    }
    tableFunctions.foreach { case (name, usage, builder) =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, null, name, usage, ""),
        builder))
    }
  }

  /** Runtime-path registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftShims.registerTempFunction(spark, name, builder)
    }
    tableFunctions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftShims
        .registerTempTableFunction(spark, name, builder)
    }
  }
}
