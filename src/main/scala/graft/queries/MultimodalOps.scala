package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with typed metadata, and the
  * compute-heavy steps (decode, model inference) run as BATCHED
  * per-partition operators — the Scala/Dataset analog of a vectorized
  * Python `mapInPandas` stage. The fixture has no real media, so the
  * media table derives deterministic fake payloads from `documents`
  * (text bytes as the "pixel buffer", metadata from `n_chars`): the
  * codec behind [[decodeByte]] is a stub, but the schema, partitioning,
  * operator signature, and batch shape are the real product.
  *
  * Scale shape: everything is a narrow per-row or per-partition map —
  * media bytes NEVER shuffle; only ids, metadata, and fixed-size
  * feature vectors leave the scan stage. Batching inside
  * [[q20MediaEmbed]]'s `mapPartitions` is what lets a real deployment
  * amortize model-inference calls (GPU/ONNX batch) exactly like a
  * pandas-batch UDF.
  */
object MultimodalOps {

  /** Rows per inference batch inside a partition — the knob a real
    * vectorized decoder/model would tune (pandas-UDF batch-size
    * equivalent). */
  val BatchSize = 32

  /** Feature positions: first [[EmbedSpan]] bytes folded into
    * [[EmbedDim]] strided sums. */
  val EmbedDim = 8
  val EmbedSpan = 64

  /** Fake media table: payload = utf-8 text bytes, metadata derived
    * deterministically from `n_chars`. Schema is the product: an
    * opaque binary column plus typed metadata the planner can prune
    * and filter WITHOUT touching the payload. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      $"doc_id".as("media_id"),
      $"text".cast("binary").as("bytes"),
      $"source".as("format"),
      (($"n_chars" % 512) + 32).cast("int").as("width"),
      ((($"n_chars" * 7) % 512) + 32).cast("int").as("height"),
      // size comes from STORED metadata (n_chars == payload bytes for
      // the ASCII fixture), never from the payload — deriving it via
      // length(bytes) would drag the binary column into every scan
      // and defeat payload pruning (caught by the q19 pruning spec)
      $"n_chars".as("n_bytes"))
  }

  /** q19 — media metadata + resize planning: fit each media into a
    * 224×224 box preserving aspect ratio, in EXACT integer arithmetic
    * (`div`), plus the payload size. Pure codegen'd projection; the
    * binary column is pruned away by Catalyst — the parquet scan reads
    * only the metadata columns.
    */
  def q19MediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .withColumn("longest", greatest($"width", $"height"))
      .select(
        $"media_id", $"format", $"width", $"height", $"n_bytes",
        expr("CAST((width * 224) div longest AS INT)").as("out_w"),
        expr("CAST((height * 224) div longest AS INT)").as("out_h"))
      .orderBy($"media_id")
  }

  def q19OracleSql: String =
    """SELECT media_id, format, width, height, n_bytes,
      |       ((width * 224) // greatest(width, height))::INT AS out_w,
      |       ((height * 224) // greatest(width, height))::INT AS out_h
      |FROM (
      |  SELECT doc_id AS media_id, source AS format,
      |         ((n_chars % 512) + 32)::INT AS width,
      |         (((n_chars * 7) % 512) + 32)::INT AS height,
      |         len(text)::BIGINT AS n_bytes
      |  FROM documents
      |) ORDER BY media_id""".stripMargin

  /** The "decode" stub: one byte of the payload as an unsigned int.
    * A real codec (JPEG/PCM/video frame) plugs in here; the fixture
    * payload is ASCII text so the oracle can reproduce the value with
    * `ord()`. */
  @inline private def decodeByte(bytes: Array[Byte], i: Int): Long =
    (bytes(i) & 0xffL)

  /** Deterministic fake encoder: EmbedDim strided byte-sums over the
    * first EmbedSpan payload bytes — stands in for a model forward
    * pass; the signature (batch of rows in, fixed-dim vectors out) is
    * the real contract. */
  private[graft] def encodeOne(bytes: Array[Byte]): Seq[Long] = {
    val span = math.min(bytes.length, EmbedSpan)
    (0 until EmbedDim).map { k =>
      var s = 0L; var i = k
      while (i < span) { s += decodeByte(bytes, i); i += EmbedDim }
      s
    }
  }

  /** Batch a partition's rows and run the encoder batch-at-a-time —
    * the mapInPandas-shaped loop a vectorized model call slots into. */
  private[graft] def encodeBatched(
      it: Iterator[(Long, Array[Byte])]): Iterator[(Long, Seq[Long], Long)] =
    it.grouped(BatchSize).flatMap { batch =>
      // a real deployment hands `batch` to one vectorized decode +
      // model-forward call; the stub encodes row-wise
      batch.iterator.map { case (id, bytes) =>
        (id, encodeOne(bytes), bytes.length.toLong)
      }
    }

  /** q20 — batched media embedding over the binary payload via
    * `mapPartitions` (Dataset-typed, executor-side, batch-shaped).
    * Output is (media_id, embedding dims e0..e7 as FLAT BIGINT columns,
    * payload size) — the honest columnar shape for a fixed-dim feature
    * vector, and one generic comparison harnesses can sort on (an
    * `array` column here broke the driver's lexsort in round 4). The
    * DuckDB oracle reproduces the strided sums with `ord()` arithmetic
    * over the ASCII fixture payload, so even the imperative path is
    * hash-verified.
    */
  def q20MediaEmbed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = (0 until EmbedDim).map(k => $"embedding" (k).as(s"e$k"))
    mediaTable(spark, dir)
      .select($"media_id", $"bytes")
      .as[(Long, Array[Byte])]
      .mapPartitions(encodeBatched)
      .toDF("media_id", "embedding", "n_bytes")
      .select(($"media_id" +: dims :+ $"n_bytes"): _*)
      .orderBy($"media_id")
  }

  /** Frame geometry for [[q34FrameSample]]: the payload is treated as
    * `n_bytes / FrameSize` fixed-size frames; every `FrameStride`-th
    * frame is sampled (a real video pipeline samples keyframes/every
    * k-th frame before the expensive decode+embed). */
  val FrameSize = 16
  val FrameStride = 4

  /** Per-payload frame sampling: (n_frames, n_sampled, checksum of each
    * sampled frame's first byte). The "read the frame" step is the same
    * [[decodeByte]] stub q20 uses; the geometry arithmetic and batching
    * are the product. */
  private[graft] def sampleOne(bytes: Array[Byte]): (Long, Long, Long) = {
    val nFrames = bytes.length / FrameSize
    var i = 0; var n = 0L; var sum = 0L
    while (i < nFrames) {
      sum += decodeByte(bytes, i * FrameSize)
      n += 1
      i += FrameStride
    }
    (nFrames.toLong, n, sum)
  }

  /** q34 — frame sampling over the binary payload, batched like q20
    * (`mapPartitions`, [[BatchSize]] rows per inference batch): emit
    * per-media frame counts and an integer checksum over the sampled
    * frames, all reproduced by the oracle's `ord()` arithmetic over the
    * ASCII fixture payload. Completes the multimodal set: metadata/
    * resize planning (q19), decode+embed (q20), frame-sample (here) —
    * and like the others, payload bytes never shuffle; only ids and
    * fixed-size summaries leave the scan stage.
    */
  def q34FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"media_id", $"bytes")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { case (id, bytes) =>
          val (nf, ns, cs) = sampleOne(bytes)
          (id, nf, ns, cs)
        }
      })
      .toDF("media_id", "n_frames", "n_sampled", "checksum")
      .orderBy($"media_id")
  }

  def q34OracleSql: String = {
    // sampled byte positions (1-based): 1, 1+FrameSize*Stride, … up to
    // frame (n_frames-1); empty series when the payload has no frames
    val step = FrameSize * FrameStride
    s"""SELECT doc_id AS media_id,
       |       (len(text) // $FrameSize)::BIGINT AS n_frames,
       |       len(ps)::BIGINT AS n_sampled,
       |       coalesce(list_sum(list_transform(ps, p -> ord(substr(text, p, 1)))), 0)::BIGINT AS checksum
       |FROM (
       |  SELECT doc_id, text,
       |         generate_series(1, (len(text) // $FrameSize) * $FrameSize - ${FrameSize - 1}, $step) AS ps
       |  FROM documents
       |) ORDER BY media_id""".stripMargin
  }

  /** Chunk geometry for [[q73AudioChunks]]: fixed-size windows with
    * OVERLAP (stride < size — the Whisper-style segmentation audio
    * pipelines run before the encoder, where overlap preserves context
    * across cut points). The payload stands in for a PCM buffer. */
  val ChunkBytes = 48
  val ChunkStride = 32

  /** Per-payload overlapping chunking: one output row PER CHUNK —
    * `(chunk_idx, start_byte, n_bytes, first byte)` — including the
    * partial tail window (real pipelines pad it). The generator-shaped
    * sibling of [[sampleOne]]: media in, MANY rows out. */
  private[graft] def chunkOne(
      id: Long, bytes: Array[Byte]): Iterator[(Long, Long, Long, Long, Long)] =
    Iterator.range(0, bytes.length, ChunkStride).map { s =>
      (id, (s / ChunkStride).toLong, s.toLong,
        math.min(ChunkBytes, bytes.length - s).toLong, decodeByte(bytes, s))
    }

  /** q73 — overlapping audio-chunk table: the EXPLODED per-chunk
    * relation a training pipeline hands to the audio encoder (q34
    * emits one summary row per media; here each media fans out to its
    * chunk rows — the flatMap-shaped batch operator, the third and
    * last `mapInPandas` signature class after map (q20) and aggregate
    * (q34)). Chunks overlap by [[ChunkBytes]]−[[ChunkStride]] bytes;
    * the tail partial chunk ships with its true length. Payload bytes
    * still never shuffle — each chunk row carries offsets, lengths,
    * and a first-byte probe (the decode stub), not the slice itself;
    * the downstream encoder re-reads its slice payload-local, exactly
    * how a real pipeline keeps the bytes on the scan side. */
  def q73AudioChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"media_id", $"bytes")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { case (id, bytes) => chunkOne(id, bytes) }
      })
      .toDF("media_id", "chunk_idx", "start_byte", "n_bytes", "first_byte")
      .orderBy($"media_id", $"chunk_idx")
  }

  /** Ground truth for [[q73AudioChunks]] — the same stride series and
    * `ord()` first-byte probe over the ASCII fixture payload. */
  def q73OracleSql: String =
    s"""SELECT doc_id AS media_id,
       |       (s // $ChunkStride)::BIGINT AS chunk_idx,
       |       s::BIGINT AS start_byte,
       |       least($ChunkBytes, len(text) - s)::BIGINT AS n_bytes,
       |       ord(substr(text, s + 1, 1))::BIGINT AS first_byte
       |FROM (
       |  SELECT doc_id, text,
       |         unnest(generate_series(0, len(text) - 1, $ChunkStride)) AS s
       |  FROM documents WHERE len(text) > 0
       |) ORDER BY media_id, chunk_idx""".stripMargin

  /** Patch edge for [[q81PatchGrid]] — ViT-style square patches. 64
    * keeps the fixture's patch tables small while the edge-clip logic
    * still exercises (fixture widths/heights are not multiples). */
  val PatchPx = 64

  /** Per-media patch grid: one row per (x0, y0) patch origin over the
    * METADATA (width × height) grid, edge patches clipped to their
    * true extent; the probe decodes the patch's top-left byte under a
    * row-major 1-byte-per-pixel layout iff that offset exists in the
    * payload (−1 otherwise — the fixture's metadata grid can exceed
    * its stand-in payload). The 2-D generator sibling of [[chunkOne]].
    */
  private[graft] def patchOne(
      id: Long, bytes: Array[Byte], width: Int, height: Int)
      : Iterator[(Long, Long, Long, Long, Long, Long, Long)] = {
    val patchesX = (width + PatchPx - 1) / PatchPx
    for {
      y0 <- Iterator.range(0, height, PatchPx)
      x0 <- Iterator.range(0, width, PatchPx)
    } yield {
      val off = y0.toLong * width + x0
      val probe = if (off < bytes.length) decodeByte(bytes, off.toInt) else -1L
      (id, (y0 / PatchPx).toLong * patchesX + (x0 / PatchPx),
        x0.toLong, y0.toLong,
        math.min(PatchPx, width - x0).toLong,
        math.min(PatchPx, height - y0).toLong,
        probe)
    }
  }

  /** q81 — ViT-style image PATCH table: each media fans out to its
    * 2-D patch grid — `(patch_idx, x0, y0, pw, ph, probe)` — the
    * patchify step a vision-language pipeline runs before the image
    * encoder (q73's 2-D sibling; with q75's token windows this
    * completes the chunking family across modalities). Geometry is
    * pure integer arithmetic over STORED metadata (the q19 rule:
    * width/height never derive from the payload, so the binary column
    * stays out of the geometry computation); edge patches clip to
    * their true extent rather than padding, keeping every emitted
    * number exact. The rows route through the same batched
    * `mapPartitions` operator as q20/q34/q73 because the probe column
    * touches payload bytes — offsets and extents ride the row, the
    * pixels never shuffle.
    */
  def q81PatchGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    patchRows(spark, dir).orderBy($"media_id", $"patch_idx")
  }

  /** The shared patch-row frame (q81's batched `mapPartitions` grid,
    * unordered) — consumed by the q81 table and the q101 pool so the
    * two cannot drift. */
  private def patchRows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"media_id", $"bytes", $"width", $"height")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions(_.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { case (id, bytes, w, h) =>
          patchOne(id, bytes, w, h)
        }
      })
      .toDF("media_id", "patch_idx", "x0", "y0", "pw", "ph", "probe")
  }

  /** Ground truth for [[q81PatchGrid]] — q19's width/height metadata
    * arithmetic, a nested x/y stride unnest, and the same row-major
    * offset probe over the ASCII payload. */
  def q81OracleSql: String =
    s"""SELECT media_id,
       |       ((y0 // $PatchPx) * ((width + ${PatchPx - 1}) // $PatchPx)
       |        + (x0 // $PatchPx))::BIGINT AS patch_idx,
       |       x0::BIGINT AS x0, y0::BIGINT AS y0,
       |       least($PatchPx, width - x0)::BIGINT AS pw,
       |       least($PatchPx, height - y0)::BIGINT AS ph,
       |       (CASE WHEN y0 * width + x0 < n_bytes
       |             THEN ord(substr(text, y0 * width + x0 + 1, 1))
       |             ELSE -1 END)::BIGINT AS probe
       |FROM (
       |  SELECT media_id, width, height, n_bytes, text, y0,
       |         unnest(generate_series(0, width - 1, $PatchPx)) AS x0
       |  FROM (
       |    SELECT doc_id AS media_id,
       |           ((n_chars % 512) + 32)::INT AS width,
       |           (((n_chars * 7) % 512) + 32)::INT AS height,
       |           n_chars AS n_bytes, text,
       |           unnest(generate_series(0, (((n_chars * 7) % 512) + 32)::INT - 1, $PatchPx)) AS y0
       |    FROM documents
       |  )
       |) ORDER BY media_id, patch_idx""".stripMargin

  def q20OracleSql: String = {
    val dims = (0 until EmbedDim).map { k =>
      s"coalesce(list_sum(list_transform(generate_series(${k + 1}, least(len(text), $EmbedSpan), $EmbedDim), i -> ord(substr(text, i, 1)))), 0)::BIGINT AS e$k"
    }.mkString(",\n       ")
    s"""SELECT doc_id AS media_id,
       |       $dims,
       |       len(text)::BIGINT AS n_bytes
       |FROM documents ORDER BY media_id""".stripMargin
  }

  // ---------------------------------------------------------------- q101

  /** q101 — patch POOLING: collapse each media's q81 patch-feature
    * rows into one fixed-width media representation — the pooling
    * step a ViT-style encoder runs after patchify (patch features →
    * mean/max pool → the media vector retrieval and dedup consume;
    * completes the image plumbing: q19 plan → q81 patchify → q20/q101
    * featurize+pool). The per-patch feature is the decode-stub probe
    * (the contract is the shape — a real model's patch vectors slot
    * into the same aggregate); pooling is EXACT integer arithmetic:
    * mean = `sum DIV n_valid` over the in-payload patches, max over
    * the same, −1 sentinels when no patch reaches the payload.
    *
    * Scale shape: the grid is generated executor-side (q81's batched
    * `mapPartitions` — pixels never shuffle); the pool is ONE
    * media_id-keyed hash aggregate of fixed-width rows, map-side
    * combined. Output is one row per media. */
  def q101PatchPool(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    patchRows(spark, dir)
      .groupBy($"media_id")
      .agg(
        count(lit(1)).as("n_patches"),
        count(when($"probe" >= 0, 1)).as("n_valid"),
        coalesce(expr(
          "CAST(sum(CASE WHEN probe >= 0 THEN probe END) DIV " +
            "nullif(count(CASE WHEN probe >= 0 THEN 1 END), 0) AS BIGINT)"),
          lit(-1L)).as("mean_probe"),
        coalesce(max(when($"probe" >= 0, $"probe")), lit(-1L)).as("max_probe"))
      .orderBy($"media_id")
  }

  /** Ground truth for [[q101PatchPool]]: q81's oracle text as a CTE,
    * the same integer pool. */
  def q101OracleSql: String =
    s"""WITH grid AS (
       |${q81OracleSql.linesIterator.map("  " + _).mkString("\n")}
       |)
       |SELECT media_id,
       |       count(*) AS n_patches,
       |       count(CASE WHEN probe >= 0 THEN 1 END) AS n_valid,
       |       coalesce(CAST(sum(CASE WHEN probe >= 0 THEN probe END) //
       |                     nullif(count(CASE WHEN probe >= 0 THEN 1 END), 0)
       |                     AS BIGINT), -1) AS mean_probe,
       |       coalesce(max(CASE WHEN probe >= 0 THEN probe END), -1)
       |         AS max_probe
       |FROM grid GROUP BY media_id ORDER BY media_id""".stripMargin
}
