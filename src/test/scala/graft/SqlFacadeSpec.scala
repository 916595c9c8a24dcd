package graft

import org.apache.spark.sql.functions._

/** The spark.sql surface: registered views behave identically to the
  * DataFrame API (same results, same pushdown), plus the DedupOps skew
  * guard.
  */
class SqlFacadeSpec extends SparkSuite {

  test("registered views: SQL == DataFrame API, pushdown intact") {
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang IN ('en','de') ORDER BY doc_id""".stripMargin)
    val viaDf = graft.queries.ReferenceOps.q01ScanFilter(spark, sf)
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
    // Catalyst sees through the view: the filter still reaches the scan
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(lang"), s"pushdown lost:\n$plan")
    // the events view carries the normalized timestamp type
    val tsType = spark.sql("SELECT ts FROM events").schema.head.dataType
    assert(tsType == org.apache.spark.sql.types.TimestampType)
  }

  test("SQL window query over views matches q08 formatting") {
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      """WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |r AS (SELECT event_type, n,
        |             row_number() OVER (ORDER BY n DESC, event_type) AS rank
        |      FROM c)
        |SELECT concat('Top10-', rank) AS key,
        |       concat(event_type, ', ', n) AS value
        |FROM r WHERE rank <= 10 ORDER BY key""".stripMargin)
    val viaDf = graft.queries.ReferenceOps.q08KvFormat(spark, sf)
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("custom expressions reachable from SQL via GraftFunctions/Extensions") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Tables.registerViews(spark, sf)
    // hashed_shingles generator from SQL == the Scala API path
    val viaSql = spark.sql(
      "SELECT doc_id, hashed_shingles(text, 3) AS hs FROM documents")
      .groupBy($"doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = Tables.documents(spark, sf)
      .select($"doc_id",
        graft.functions.HashedShingles.hashedShingles($"text", 3).as("hs"))
      .groupBy($"doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi && viaSql.nonEmpty)
    // dot_product kernel from SQL: self dot == squared norm > 0
    val norms = spark.sql(
      "SELECT vec_id, dot_product(embedding, embedding) AS n2 FROM embeddings")
      .collect()
    assert(norms.length == 500)
    norms.foreach(r => assert(r.getDouble(1) > 0))
    // simhash32 kernel from SQL == the Scala API path, bit for bit
    val fpSql = spark.sql(
      """SELECT doc_id, simhash32(transform(
        |  filter(split(lower(text), ' '), x -> length(x) > 0),
        |  t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))) AS fp
        |FROM documents""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fpApi = Tables.documents(spark, sf)
      .select($"doc_id",
        graft.queries.TextOps.simhashFromHashes(graft.queries.TextOps.hsCol($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fpSql == fpApi && fpSql.size == 500)
    // non-literal k is a usage error surfaced as an AnalysisException
    // whose message names the function — NOT a Spark INTERNAL_ERROR
    // (the round-6 regression: a nonexistent error class made the
    // exception constructor itself throw, and intercept[Exception]
    // couldn't tell the difference)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hashed_shingles(text, doc_id) FROM documents").collect()
    }
    assert(e.getMessage.contains("hashed_shingles"), s"got: ${e.getMessage}")
    assert(e.getCondition == "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT", e.getCondition)
    // a foldable argument of the WRONG TYPE gets the same both-modes
    // diagnostic naming the offending expression, not a false
    // "non-foldable" claim
    val eType = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hashed_shingles(text, 3L) FROM documents").collect()
    }
    assert(eType.getMessage.contains("foldable") &&
      eType.getMessage.contains("3"), s"got: ${eType.getMessage}")
    // a foldable-but-null k is equally an AnalysisException, not an NPE
    val eNull = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hashed_shingles(text, CAST(NULL AS INT)) FROM documents")
        .collect()
    }
    assert(eNull.getMessage.contains("hashed_shingles"), s"got: ${eNull.getMessage}")
    // the config-path injector registers the same function set
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders shared
  }

  test("SQL-only near-dup dedup == q21's DataFrame plan, with column pruning intact") {
    GraftFunctions.register(spark)
    Tables.registerViews(spark, sf)
    // the whole q21 banded SimHash screen written by a SQL user: the
    // per-row simhash32 kernel (spec-pinned bit-identical to the
    // aggregate form), 4×8-bit banding, band self-join, exact
    // bit_count hamming verify — the engine's SQL surface covers the
    // north-star dedup family, not just the reference shapes
    val viaSql = spark.sql(
      """WITH fp AS (
        |  SELECT doc_id, simhash32(transform(
        |    filter(split(lower(text), ' '), x -> length(x) > 0),
        |    t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))) AS fp
        |  FROM documents
        |), banded AS (
        |  SELECT doc_id, fp, b.pos, b.bv
        |  FROM fp
        |  LATERAL VIEW posexplode(array(
        |    shiftright(fp, 0) % 256, shiftright(fp, 8) % 256,
        |    shiftright(fp, 16) % 256, shiftright(fp, 24) % 256)) b AS pos, bv
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.fp AS fp_a, b.fp AS fp_b
        |  FROM banded a JOIN banded b
        |    ON a.pos = b.pos AND a.bv = b.bv AND a.doc_id < b.doc_id
        |)
        |SELECT doc_a, doc_b, CAST(bit_count(fp_a ^ fp_b) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(fp_a ^ fp_b) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin)
    val viaDf = graft.queries.TextOps.q21SimhashPairs(spark, sf)
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
    assert(viaSql.collect().nonEmpty, "fixture produced no near-dup pairs")
    // column pruning reaches the scan through view + kernel + lateral
    // view: only (doc_id, text) are read, never the other doc columns
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"column pruning lost through the SQL dedup plan:\n$plan")
  }

  test("SQL-only brute-force ANN == q12's DataFrame plan, with probe pushdown intact") {
    GraftFunctions.register(spark)
    Tables.registerViews(spark, sf)
    // q12's cosine top-k written by a SQL user over the dot_product
    // kernel — identical rounding, tie-break, and k
    val viaSql = spark.sql(
      """WITH probe AS (
        |  SELECT embedding AS p FROM embeddings WHERE vec_id = 0
        |)
        |SELECT vec_id, label,
        |       round(dot_product(embedding, p) /
        |             (sqrt(dot_product(embedding, embedding)) *
        |              sqrt(dot_product(p, p))), 6) AS sim
        |FROM embeddings, probe
        |ORDER BY sim DESC, vec_id
        |LIMIT 10""".stripMargin)
    val viaDf = graft.queries.PipelineOps.q12SimTopK(spark, sf)
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
    val plan = viaSql.queryExecution.executedPlan.toString
    // the probe's point filter reaches ITS scan (partition-pruned
    // probe load, never a second corpus pass)
    assert(plan.contains("EqualTo(vec_id,0)"),
      s"probe filter not pushed to the scan:\n$plan")
    // the corpus side still plans the brute-force shape: local top-k
    // merge (TakeOrderedAndProject), not a global sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"q12's local-top-k shape lost in SQL:\n$plan")
  }

  test("SQL table functions (r20): graft_bm25 / graft_passage / graft_hybrid / graft_labels / graft_ivfpq == the DataFrame serves, as-of included") {
    import graft.queries.{DedupOps, RetrievalOps, SimilarityOps}
    import spark.implicits._
    GraftFunctions.register(spark)
    def tmp(s: String) = java.nio.file.Files.createTempDirectory(s).toString
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    def sqlRows(q: String): Seq[String] = rows(spark.sql(q))

    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)

    // q77 shape: inverted index, two generations for the as-of case
    val inv = tmp("graft-sqlfn-inv")
    RetrievalOps.writeInvertedIndex(docs.filter($"doc_id" % 2 === 0), inv)
    RetrievalOps.appendInvertedIndex(docs.filter($"doc_id" % 2 === 1), inv)
    assert(sqlRows(s"SELECT * FROM graft_bm25('$inv')") ==
      rows(RetrievalOps.bm25SearchIndex(spark, inv)),
      "graft_bm25 head serve diverged")
    assert(sqlRows(s"SELECT * FROM graft_bm25('$inv', 1)") ==
      rows(RetrievalOps.bm25SearchIndex(spark, inv, asOfGen = 1L)),
      "graft_bm25 as-of serve diverged")
    // the SQL path is the SAME plan: projection pushdown to the
    // postings scan survives the facade
    val sqlPlan = spark.sql(s"SELECT * FROM graft_bm25('$inv')")
      .queryExecution.executedPlan.toString
    assert(!sqlPlan.contains("text"), s"facade plan reads text:\n$sqlPlan")

    // passage index
    val pas = tmp("graft-sqlfn-pas")
    RetrievalOps.writePassageIndex(docs, pas)
    assert(sqlRows(s"SELECT * FROM graft_passage('$pas')") ==
      rows(RetrievalOps.passageSearchIndex(spark, pas)),
      "graft_passage diverged")

    // q83 shape: the hybrid store's joint serve
    val hyb = tmp("graft-sqlfn-hyb")
    RetrievalOps.writeHybridIndex(docs, emb, hyb)
    assert(sqlRows(s"SELECT * FROM graft_hybrid('$hyb')") ==
      rows(RetrievalOps.hybridServeAt(spark, hyb)),
      "graft_hybrid diverged")

    // label index
    val lab = tmp("graft-sqlfn-lab")
    DedupOps.writeLabelIndex(docs, lab)
    assert(sqlRows(s"SELECT * FROM graft_labels('$lab')") ==
      rows(DedupOps.labelsServeAt(spark, lab, 1L)),
      "graft_labels diverged")

    // trained IVF-PQ two-stage serve, probes from the embeddings table
    val ivf = tmp("graft-sqlfn-ivfpq")
    SimilarityOps.trainIvfPq(emb, ivf, ivfIters = 2, pqIters = 2)
    assert(sqlRows(s"SELECT * FROM graft_ivfpq('$ivf', '$sf', 5, 4)") ==
      rows(SimilarityOps.q84ServeTrained(spark, sf, ivf, k = 5,
        numProbes = 4)),
      "graft_ivfpq diverged")

    // composability: the facade is a real relation — joins/filters work
    val joined = spark.sql(
      s"""SELECT b.doc_id FROM graft_bm25('$inv') b
         |JOIN graft_labels('$lab') l ON b.doc_id = l.doc_id
         |WHERE b.rank <= 3""".stripMargin).collect()
    assert(joined.nonEmpty, "facade relations did not compose")

    // a non-literal path refuses through the analyzer's usage surface
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_bm25(upper(rand()::string))").collect()
    }
    assert(e.getMessage.contains("NON_FOLDABLE_INPUT") ||
      e.getMessage.contains("foldable"), e.getMessage)
  }

  test("dedup skew guard drops degenerate buckets, bounded candidates") {
    import spark.implicits._
    val boiler = (0 until 40).map(i => s"same$i").mkString(" ")
    // 20 identical docs: every band bucket has size 20 -> 190 pairs
    val docs = (1L to 20L).map(id => (id, boiler)).toDF("doc_id", "text")
    val uncapped = graft.queries.DedupOps.candidatePairs(docs).count()
    assert(uncapped == 190L) // 20 choose 2
    val capped = graft.queries.DedupOps
      .candidatePairs(docs, maxBucketSize = 10).count()
    assert(capped == 0L, "oversized buckets must be skipped entirely")
    // guard leaves normal-size buckets alone
    val mixed = ((1L to 3L).map(id => (id, boiler)) :+
      (99L, (100 until 140).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cappedMixed = graft.queries.DedupOps
      .candidatePairs(mixed, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedMixed == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
