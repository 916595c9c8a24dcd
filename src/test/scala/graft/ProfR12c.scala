package graft

import graft.queries.{DedupOps, MultimodalOps, PipelineOps, SimilarityOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 session-3 scale probe: the excision family (q91 in-plan,
  * q95 index-served), the embedding decision ops (q92 kNN labels, q93
  * code outliers), and the vocab coverage curve (q94) at a 10× scale
  * step — each op's scaling claim checked against a real decade.
  *
  *   - documents: ProfScale's `~r`-suffixed replicas (replicas share
  *     no phrases, so each reproduces the base corpus's intra-replica
  *     dup structure — windows, dup phrases, and marked spans all
  *     scale ~10×: the clean scaling question for q91/q95).
  *   - q91 invariant under PLAIN replicas (texts shared): every window
  *     then lives in ≥ 10 docs, so every doc with ≥ L tokens must come
  *     back fully excised — the saturation regime, checked exactly.
  *   - embeddings: exact replicas with shifted ids (ProfScale's q88
  *     recipe). q93's copies must land IDENTICAL integer d2 — the
  *     order-independence the integer formulation promises, exercised
  *     across a 10× shuffle; flag counts must equal the ceil rule.
  *   - q92/q94: wall probes (probe set and vocab both grow ~10×).
  */
object ProfR12c {
  /** Under PROF_NEW_ONLY the embedding-replica corpus is not
    * synthesized — fall back to base so the q97 probe still runs. */
  private def embDirFor(newOnly: Boolean, embDir: String, base: String): String =
    if (newOnly) base else embDir

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val baseDir = sys.env.getOrElse("PROF_BASE", "/root/testdata/sf0.1")
    val scaleDir = sys.env.getOrElse("PROF_SCALE_DIR", "/tmp/scale10_s3")
    val replicas = sys.env.getOrElse("PROF_REPLICAS", "10").toInt
    val off = 10000000L

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[r12c] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }

    // PROF_NEW_ONLY: synthesize only the suffixed corpus and run only
    // the q91/q96/q98/q100 block — the post-fix re-probe loop (the
    // q96 packed-key and q98 prefix-bound fixes landed after the first
    // full run).
    val newOnly = sys.env.contains("PROF_NEW_ONLY")

    // --- synthesize: suffixed docs, plain docs, exact embedding dups --
    val base = Tables.documents(spark, baseDir)
    (0 until replicas).map { r =>
      if (r == 0) base
      else base.select(
        ($"doc_id" + lit(r * off)).as("doc_id"), $"lang", $"source",
        concat_ws(" ",
          transform(split($"text", " "), t => concat(t, lit(s"~$r"))))
          .as("text"),
        $"n_chars")
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$scaleDir/documents.parquet")
    val plainDir = s"$scaleDir/plain"
    val embDir = s"$scaleDir/embdup"
    if (!newOnly) {
    (0 until replicas).map { r =>
      if (r == 0) base
      else base.select(($"doc_id" + lit(r * off)).as("doc_id"),
        $"lang", $"source", $"text", $"n_chars")
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$plainDir/documents.parquet")
    val embBase = Tables.embeddings(spark, baseDir)
    (0 until replicas).map { r =>
      if (r == 0) embBase
      else embBase.select(($"vec_id" + lit(r * off)).as("vec_id"),
        $"embedding", $"label")
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$embDir/embeddings.parquet")
    println(s"[r12c] docs: ${Tables.documents(spark, scaleDir).count()}, " +
      s"vecs: ${Tables.embeddings(spark, embDir).count()}")
    } else println(s"[r12c] docs: ${Tables.documents(spark, scaleDir).count()}")

    // --- q91 / q95 wall at base and 10x (suffixed) -------------------
    if (!newOnly)
    Seq("base" -> baseDir, s"${replicas}x" -> scaleDir).foreach {
      case (tag, dir) =>
        time(s"q91 $tag") {
          DedupOps.q91SubstrExcise(spark, dir)
            .agg(sum($"n_removed"), sum($"n_spans")).collect(); 1L
        }
        time(s"q95 $tag") {
          DedupOps.q95ExciseIndexed(spark, dir)
            .agg(sum($"n_removed")).collect(); 1L
        }
    }

    if (!newOnly) {
    // --- q91 saturation invariant under PLAIN replicas ---------------
    val l = DedupOps.ExciseTokens
    time(s"q91 plain${replicas}x saturated") {
      val src = Tables.documents(spark, plainDir)
        .select($"doc_id", size(split($"text", " ")).as("n_toks"))
      val bad = DedupOps.q91SubstrExcise(spark, plainDir)
        .join(src, "doc_id")
        .filter($"n_toks" >= l && ($"clean_text" =!= "" || $"n_spans" =!= 1))
        .count()
      require(bad == 0, s"$bad docs escaped saturation excision")
      bad
    }
    println(s"[r12c] q91 saturation invariant held: every >=$l-token doc " +
      "fully excised under plain replication")

    // --- q92 wall at base and 10x ------------------------------------
    Seq("base" -> baseDir, s"dup${replicas}x" -> embDir).foreach {
      case (tag, dir) =>
        time(s"q92 $tag") {
          SimilarityOps.q92KnnLabel(spark, dir).count()
        }
    }

    // --- q93 at 10x: copies identical d2, exact ceil-rule flag counts -
    time(s"q93 dup${replicas}x") {
      val rows = SimilarityOps.q93CodeOutliers(spark, embDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      val byBase = rows.groupBy(r => r._1 % off)
      byBase.foreach { case (id, g) =>
        require(g.map(_._3).distinct.length == 1,
          s"copies of vec $id landed different integer d2: ${g.map(_._3).toSeq}")
      }
      val byLabel = rows.groupBy(_._2)
      byLabel.foreach { case (lab, g) =>
        val want = (g.length + SimilarityOps.OutlierDenom - 1) /
          SimilarityOps.OutlierDenom
        require(g.count(_._4 == 1) == want,
          s"label $lab flagged ${g.count(_._4 == 1)}, want $want")
      }
      rows.length.toLong
    }
    println(s"[r12c] q93 invariant held: replica copies share exact d2, " +
      "flag counts match the ceil rule per label")

    // --- q94 wall at base and 10x (suffixed => vocab x10) -------------
    Seq("base" -> baseDir, s"${replicas}x" -> scaleDir).foreach {
      case (tag, dir) =>
        time(s"q94 $tag") {
          TextOps.q94VocabCoverage(spark, dir).collect().length.toLong
        }
    }
    } // !newOnly

    // --- q96 / q98 / q100 wall at base and 10x (suffixed) -------------
    // q96: q91's shape, one aggregate swapped — must track q91's curve.
    // q98: the probe-the-inverted-index containment join — the
    // quadratic-hazard candidate stage; suffixed replicas keep probes
    // intra-replica, so candidates scale ~10×, the clean question.
    // q100: q95's probe side without the rewrite — must undercut q95.
    Seq("base" -> baseDir, s"${replicas}x" -> scaleDir).foreach {
      case (tag, dir) =>
        if (newOnly) time(s"q91 $tag") {
          DedupOps.q91SubstrExcise(spark, dir)
            .agg(sum($"n_removed"), sum($"n_spans")).collect(); 1L
        }
        time(s"q96 $tag") {
          DedupOps.q96ExciseKeepFirst(spark, dir)
            .agg(sum($"n_removed")).collect(); 1L
        }
        time(s"q98 $tag") {
          DedupOps.withQ98Containment(spark, dir)(_.count())
        }
        time(s"q100 $tag") {
          DedupOps.q100NoveltyScore(spark, dir)
            .agg(sum($"n_known")).collect(); 1L
        }
    }

    // --- q97 / q99 / q101 wall at base and Nx ------------------------
    // q97: eager bounded-histogram form — one aggregate pass, the rest
    // driver-side. q99: one full-outer hash join of 24-byte rows.
    // q101: media-keyed aggregate over executor-generated patch rows.
    Seq("base" -> baseDir, s"${replicas}x" -> scaleDir).foreach {
      case (tag, dir) =>
        time(s"q99 $tag") {
          PipelineOps.q99SnapshotDiff(spark, dir).collect().length.toLong
        }
        time(s"q101 $tag") {
          MultimodalOps.q101PatchPool(spark, dir).count()
        }
    }
    Seq("base" -> baseDir, s"dup${replicas}x" -> embDirFor(newOnly, embDir, baseDir)).foreach {
      case (tag, dir) =>
        time(s"q97 $tag") {
          SimilarityOps.q97CellBalance(spark, dir).count()
        }
    }
    spark.stop()
  }
}
