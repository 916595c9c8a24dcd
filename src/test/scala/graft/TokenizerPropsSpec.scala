package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants of the tokenize pipeline used by
  * q03/q04 (`explode(split(lower(text), " ")) … filter(length > 0)`),
  * mirroring the reference's tokenizer guarantees: every emitted token is
  * non-empty and lowercase, and empty splits are dropped
  * (/root/reference/src/main/java/TopNHashtags.java:202,236-238).
  *
  * scalacheck generates the corpus; the invariants are asserted on the
  * Spark expressions themselves in ONE job (per-case Spark jobs would be
  * seconds each), with a fixed seed for reproducibility.
  */
class TokenizerPropsSpec extends SparkSuite {

  private val wordChar = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('#', '@', '!', 'Ä', 'ß', 'λ'))
  private val rawText: Gen[String] = for {
    n <- Gen.choose(0, 12)
    words <- Gen.listOfN(n, Gen.stringOfN(4, wordChar))
    extraSpaces <- Gen.choose(1, 3)
  } yield words.mkString(" " * extraSpaces)

  private def corpus(n: Int): Seq[String] =
    (0 until n).flatMap(i => rawText.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("every emitted token is non-empty, lowercase, and space-free") {
    import spark.implicits._
    val tokens = corpus(200).toDF("text")
      .select(explode(split(lower($"text"), " ")).as("token"))
      .filter(length($"token") > 0)
      .as[String].collect()
    assert(tokens.nonEmpty)
    assert(tokens.forall(_.nonEmpty))
    assert(tokens.forall(t => t == t.toLowerCase))
    assert(tokens.forall(!_.contains(" ")))
  }

  test("HashedShingles == built-in chain on random unicode corpora") {
    import spark.implicits._
    // the custom Generator must match the declarative chain on inputs
    // far outside the ASCII fixture: unicode letters, multi-space runs,
    // empty and sub-k-token strings
    val df = corpus(300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaGen = df.select($"doc_id",
      graft.functions.HashedShingles.hashedShingles($"text", 3).as("hs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val viaChain = df
      .select($"doc_id",
        explode(graft.queries.DedupOps.shingles($"text", 3)).as("s"))
      .select($"doc_id", xxhash64($"s").as("hs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(viaGen == viaChain)
    assert(viaGen.nonEmpty)
  }

  test("tfidfTopTerms == naive in-memory reference on random unicode corpora") {
    import spark.implicits._
    // small vocabulary forces real df collisions and score ties, so the
    // deterministic (rounded-score desc, token asc) tie-break is
    // genuinely exercised — not just distinct-score happy paths
    val smallVocab = Gen.oneOf("aa", "bb", "cc", "dd", "Ää", "λλ", "e!", "#f")
    val doc: Gen[String] = for {
      n <- Gen.choose(0, 10)
      words <- Gen.listOfN(n, smallVocab)
    } yield words.mkString(" ")
    val docs = (0 until 120)
      .flatMap(i => doc.apply(Gen.Parameters.default, Seed(1000L + i)))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")

    val got = graft.queries.TextOps.tfidfTopTerms(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .toSeq

    // naive reference: plain Scala maps, same rounding-before-ranking
    def toks(t: String): Seq[String] =
      t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    val tf = docs.flatMap { case (id, t) => toks(t).map(id -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfCount = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nDocs = tf.keys.map(_._1).toSet.size
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = tf.keys.groupBy(_._1).toSeq.flatMap { case (id, keys) =>
      keys.toSeq
        .map { case (_, tok) =>
          (tok, round6(tf((id, tok)) * math.log(nDocs.toDouble / dfCount(tok))))
        }
        .sortBy { case (tok, s) => (-s, tok) }
        .take(graft.queries.TextOps.TfidfTopK)
        .zipWithIndex
        .map { case ((tok, s), i) => (id, i + 1, tok, s) }
    }.sortBy(t => (t._1, t._2))

    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("token multiset is preserved: n_tokens equals exploded count per doc") {
    import spark.implicits._
    val df = corpus(200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaSize = df.select($"doc_id",
      size(filter(split(lower($"text"), " "), t => length(t) > 0)).as("n"))
    val viaExplode = df
      .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"doc_id").count()
    val joined = viaSize.join(viaExplode, Seq("doc_id"), "left")
      .select($"doc_id", $"n", coalesce($"count", lit(0L)).as("c"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getInt(1).toLong == r.getLong(2),
      s"doc ${r.getLong(0)}: size=${r.getInt(1)} explode=${r.getLong(2)}"))
  }

  test("chunking properties hold for generated corpora across window geometries") {
    import spark.implicits._
    // generated docs (including empties and heavy whitespace) through
    // the q75 transform at several (size, stride) geometries — the
    // coverage/reconstruction contract must hold for ALL of them, not
    // just the fixture's 32/24
    val docs = corpus(150).zipWithIndex
      .map { case (text, i) => (i.toLong, text) }
    val docsDf = docs.toDF("doc_id", "text")
    val ref = docs.map { case (id, text) =>
      id -> text.toLowerCase.split(" ").filter(_.nonEmpty).toVector }.toMap
    for ((size, stride) <- Seq((4, 3), (8, 8), (5, 2))) {
      val chunks = graft.queries.TextOps.chunkTokens(docsDf, size, stride)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .groupBy(_._1)
      // docs with tokens chunk; token-less docs are absent
      assert(chunks.keySet == ref.filter(_._2.nonEmpty).keySet,
        s"($size,$stride): doc set mismatch")
      chunks.foreach { case (id, cs) =>
        val toks = ref(id)
        val sorted = cs.sortBy(_._2)
        assert(sorted.map(_._2).toSeq == (0L until sorted.length.toLong))
        sorted.foreach { case (_, idx, start, n, text) =>
          assert(start == idx * stride)
          assert(n == math.min(size.toLong, toks.length - start))
          assert(text == toks.slice(start.toInt, start.toInt + size).mkString(" "))
        }
        // coverage: last chunk reaches the final token
        val (_, _, ls, ln, _) = sorted.last
        assert(ls + ln == toks.length.toLong, s"($size,$stride) doc $id: tail lost")
        // stride-prefix reconstruction is lossless for every geometry
        val rebuilt = sorted.flatMap { case (_, idx, _, _, text) =>
          val ts = text.split(" ").toVector
          if (idx == sorted.length - 1) ts else ts.take(stride)
        }.toVector
        assert(rebuilt == toks, s"($size,$stride) doc $id: reconstruction broke")
      }
    }
  }

  test("batched BPE trainer: an adversarial adjacency vocabulary SPILLS past the driver ceiling and still trains exactly (r20)") {
    import spark.implicits._
    // every word distinct, every adjacent pair distinct -> the (a,b,c)
    // stats relation has ~3 rows per word and nothing ever merges
    // early: the worst realistic shape for the per-round driver pull.
    // Pre-r20 this REFUSED past the ceiling; now the trainer spills
    // the stats to a persisted frame and admits merges by a 1-row
    // distributed argmax — byte-identical to the sequential loop
    val docs = (0 until 120)
      .map(i => f"w${i}%03d${('a' + i % 26).toChar}x${('a' + (i * 7) % 26).toChar}")
      .toDF("text")
    val words = docs.select(explode(split(lower($"text"), " ")).as("t"))
      .filter(length($"t") > 0).groupBy($"t").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = graft.queries.TextOps.bpeTrainLocal(words, 4)
    // the adversarial cap: the initial count overflows 64 rows, so the
    // ENTIRE training runs on the spilled path — where the r19 trainer
    // threw, this must now produce the exact merge table
    val spilledGot = graft.queries.TextOps
      .bpeTrainBatched(docs, merges = 4, statsCap = 64)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(spilledGot == want,
      s"spilled trainer diverged from the sequential loop: $spilledGot")
    // the same corpus under the default ceiling trains on the driver
    // fast path and matches too (the spec-pinned identity)
    val got = graft.queries.TextOps.bpeTrainBatched(docs, merges = 4)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == want, "capped trainer diverged from the sequential loop")
  }
}
