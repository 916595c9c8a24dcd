package graft

import graft.queries.MultimodalOps

/** Multimodal plumbing specs: typed media schema, payload pruning,
  * batch shape of the partition encoder, and embedding determinism.
  */
class MultimodalOpsSpec extends SparkSuite {

  test("media table: opaque binary payload + typed metadata schema") {
    val df = MultimodalOps.mediaTable(spark, sf)
    val fields = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("bytes") == "binary")
    assert(fields("media_id") == "long" && fields("n_bytes") == "long")
    assert(fields("width") == "integer" && fields("height") == "integer")
    assert(df.count() == 500)
  }

  test("q19 prunes the binary payload: scan reads metadata only") {
    val df = MultimodalOps.q19MediaMeta(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scan.contains("text"), s"payload column not pruned:\n$scan")
    val rows = df.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(2), r.getInt(3), r.getInt(5), r.getInt(6))
      assert(ow <= 224 && oh <= 224 && (ow == 224 || oh == 224),
        s"resize must pin the longest side to 224: $r")
      // exact integer arithmetic, aspect preserved within rounding
      assert(ow == w * 224 / math.max(w, h) && oh == h * 224 / math.max(w, h))
    }
  }

  test("encodeBatched consumes partitions in batches of BatchSize") {
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rows = (1L to 100L).map(i => (i, Array.fill(16)(i.toByte)))
    // instrument via a wrapping iterator that records pull boundaries
    val it = new Iterator[(Long, Array[Byte])] {
      val inner = rows.iterator
      var pulled = 0
      def hasNext = inner.hasNext
      def next() = { pulled += 1; inner.next() }
    }
    val out = MultimodalOps.encodeBatched(it).toVector
    assert(out.length == 100)
    assert(out.map(_._1) == (1L to 100L).toVector)
    // grouped(BatchSize) pulls exactly BatchSize rows before emitting:
    // after forcing the stream, everything was consumed
    assert(it.pulled == 100)
    out.foreach { case (_, emb, n) =>
      assert(emb.length == MultimodalOps.EmbedDim)
      assert(n == 16L)
    }
  }

  test("encodeOne: strided unsigned byte sums over the first 64 bytes") {
    val bytes = (0 until 80).map(_.toByte).toArray
    val emb = MultimodalOps.encodeOne(bytes)
    // dim k sums bytes k, k+8, ..., k+56 (span caps at 64)
    val expected = (0 until 8).map(k => (k until 64 by 8).map(_.toLong).sum)
    assert(emb == expected)
    // unsigned interpretation: byte 0x80.toByte = 128, not -128
    val neg = MultimodalOps.encodeOne(Array(0x80.toByte))
    assert(neg.head == 128L && neg.tail.forall(_ == 0L))
  }

  test("q34 frame sampling: geometry exact, stride honored, short payloads empty") {
    // unit geometry: 80 bytes -> 5 frames of 16; stride 4 samples frames 0 and 4
    val bytes = (0 until 80).map(_.toByte).toArray
    val (nf, ns, cs) = MultimodalOps.sampleOne(bytes)
    assert(nf == 5L && ns == 2L)
    assert(cs == (bytes(0) & 0xffL) + (bytes(64) & 0xffL))
    // payload shorter than one frame -> zero frames, zero checksum
    assert(MultimodalOps.sampleOne(Array[Byte](1, 2, 3)) == (0L, 0L, 0L))
    // full query: one row per media, n_sampled = ceil(n_frames/stride)
    val rows = MultimodalOps.q34FrameSample(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nFrames, nSampled) = (r.getLong(1), r.getLong(2))
      val expected = (nFrames + MultimodalOps.FrameStride - 1) / MultimodalOps.FrameStride
      assert(nSampled == expected, s"row $r")
      assert(r.getLong(3) >= 0)
    }
  }

  test("q73 chunking: payload fully covered, overlap honored, tail partial") {
    import graft.queries.MultimodalOps._
    // unit geometry on planted payloads
    val empty = chunkOne(1L, Array.emptyByteArray).toSeq
    assert(empty.isEmpty, "empty payload must produce no chunks")
    val one = chunkOne(2L, Array.fill[Byte](10)(65)).toSeq
    assert(one == Seq((2L, 0L, 0L, 10L, 65L)), s"short payload: $one")
    val bytes = Array.tabulate[Byte](100)(i => (i % 127).toByte)
    val chunks = chunkOne(3L, bytes).toSeq
    // starts advance by the stride; every byte position falls inside
    // at least one chunk (full coverage despite the stub decode)
    chunks.zipWithIndex.foreach { case ((_, idx, start, n, fb), i) =>
      assert(idx == i && start == i.toLong * ChunkStride)
      assert(n == math.min(ChunkBytes, 100 - start))
      assert(fb == (bytes(start.toInt) & 0xffL))
    }
    val covered = chunks.flatMap { case (_, _, s, n, _) => s until (s + n) }.toSet
    assert(covered == (0L until 100L).toSet, "chunk coverage gap")
    // consecutive full chunks overlap by size - stride
    chunks.sliding(2).foreach {
      case Seq((_, _, s1, n1, _), (_, _, s2, _, _)) if s1 + n1 >= s2 + ChunkBytes - ChunkStride =>
        assert(s2 - s1 == ChunkStride)
      case _ =>
    }
    // the query agrees with the per-payload rule on the fixture
    val got = MultimodalOps.q73AudioChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val want = mediaTable(spark, sf).select("media_id", "bytes").collect()
      .flatMap(r => chunkOne(r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
  }

  test("q81 patch grid: exact tiling, dense indices, probe matches payload") {
    import spark.implicits._
    val meta = MultimodalOps.mediaTable(spark, sf)
      .select($"media_id", $"width", $"height", $"n_bytes", $"bytes")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getAs[Array[Byte]](4)))
      .toMap
    val rows = MultimodalOps.q81PatchGrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val p = MultimodalOps.PatchPx
    rows.groupBy(_._1).foreach { case (id, patches) =>
      val (w, h, nBytes, bytes) = meta(id)
      // the patch extents tile the metadata grid EXACTLY — no gap, no
      // overlap: total patch area equals the image area
      assert(patches.map(pr => pr._5 * pr._6).sum == w.toLong * h,
        s"media $id: patches do not tile ${w}x$h")
      // indices dense row-major 0..n-1
      val px = (w + p - 1) / p; val py = (h + p - 1) / p
      assert(patches.map(_._2).sorted.toSeq == (0L until px.toLong * py),
        s"media $id: patch indices not dense")
      patches.foreach { case (_, idx, x0, y0, pw, ph, probe) =>
        assert(x0 % p == 0 && y0 % p == 0)
        assert(pw == math.min(p, w - x0) && ph == math.min(p, h - y0))
        assert(idx == (y0 / p) * px + x0 / p)
        val off = y0 * w + x0
        val expectProbe =
          if (off < nBytes) (bytes(off.toInt) & 0xff).toLong else -1L
        assert(probe == expectProbe, s"media $id patch $idx probe")
      }
    }
    // both probe regimes occur on the fixture (offset inside and
    // beyond the stand-in payload) — the clip logic is exercised
    assert(rows.exists(_._7 >= 0) && rows.exists(_._7 == -1L))
  }

  test("q20 embedding is deterministic and batch-independent") {
    import org.apache.spark.sql.functions._
    val a = MultimodalOps.q20MediaEmbed(spark, sf).collect()
    assert(a.length == 500)
    // flat scalar dim columns, not an array (generic comparison
    // harnesses can sort scalars; an array column cannot be lexsorted)
    assert(MultimodalOps.q20MediaEmbed(spark, sf).columns.toSeq ==
      "media_id" +: (0 until MultimodalOps.EmbedDim).map(k => s"e$k") :+ "n_bytes")
    // repartitioning must not change results (partition/batch shape
    // independence — the core mapInPandas-equivalence property)
    val b = MultimodalOps.mediaTable(spark, sf)
      .repartition(7, col("media_id"))
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions(MultimodalOps.encodeBatched)(
        org.apache.spark.sql.Encoders.product[(Long, Seq[Long], Long)])
      .toDF("media_id", "embedding", "n_bytes")
      .orderBy("media_id").collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    // q20's flat e0..e7 columns == the raw encoder's array dims
    assert(a.map(r => (1 to MultimodalOps.EmbedDim).map(r.getLong).toVector).toSeq ==
      b.map(_.getSeq[Long](1).toVector).toSeq)
  }

  test("q101 pool == recount over the q81 grid; both sentinel regimes present") {
    val grid = MultimodalOps.q81PatchGrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(6)))
    val expected = grid.groupBy(_._1).toSeq.map { case (id, g) =>
      val valid = g.map(_._2).filter(_ >= 0)
      (id, g.length.toLong, valid.length.toLong,
        if (valid.nonEmpty) valid.sum / valid.length else -1L,
        if (valid.nonEmpty) valid.max else -1L)
    }.sortBy(_._1)
    val got = MultimodalOps.q101PatchPool(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // the fixture exercises both regimes: media whose grid outruns the
    // stand-in payload (n_valid < n_patches) and fully-covered media
    assert(got.exists(r => r._3 < r._2))
    assert(got.exists(r => r._3 == r._2 && r._2 > 0))
  }
}
