package graft.queries

/** The crash-atomic generation-window protocol shared by every
  * persisted multi-artifact index in the library (the inverted/passage
  * indexes' postings+stats pair, the dedup index's buckets+shingles
  * pair): all of an operation's writes land under generation
  * partitions OUTSIDE the committed window `[lo, hi]` recorded in the
  * index root's `_GENERATION` manifest, and ONE atomic manifest rename
  * makes them (jointly) visible — appends extend `hi`, compactions
  * flip to `[hi+1, hi+1]` which simultaneously reveals the snapshot
  * and hides every generation it replaced. Readers scope every scan to
  * the window (partition filters), so a torn write is never
  * observable; debris outside the window is purged at the start of the
  * next mutating operation.
  *
  * Single-number manifests (the pre-window format) read as `[1, n]`.
  */
private[graft] object GenerationManifest {

  /** The committed window `[lo, hi]`. Absent manifest = the index was
    * never fully built: refuse loudly rather than serve torn state. */
  def window(path: String): (Long, Long) = {
    val p = java.nio.file.Paths.get(path, "_GENERATION")
    require(java.nio.file.Files.exists(p),
      s"no _GENERATION manifest at $path — index incomplete or never " +
        "committed (the index writer finishes by committing gen 1)")
    val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .trim.split("\\s+")
    raw match {
      case Array(hi)     => (1L, hi.toLong)
      case Array(lo, hi) => (lo.toLong, hi.toLong)
      case _ => sys.error(s"malformed _GENERATION manifest at $path: " +
        raw.mkString(" "))
    }
  }

  /** Atomically flip the manifest: write `_GENERATION.tmp`, rename
    * over `_GENERATION`. The rename is the ONLY point a mutation
    * becomes visible. */
  def commit(path: String, lo: Long, hi: Long): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Paths.get(path, "_GENERATION.tmp")
    Files.write(tmp, s"$lo $hi".getBytes("UTF-8"))
    Files.move(tmp, Paths.get(path, "_GENERATION"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Delete any `gen=N` partition directories OUTSIDE the committed
    * window in each of the index's artifact roots (`subRoots` are
    * paths relative to `path`; `""` is the root itself): above `hi` is
    * a crashed mutation's debris, below `lo` a committed compaction's
    * replaced history. Run at the start of every mutating operation so
    * a retry starts clean. */
  def purgeOutside(
      path: String, subRoots: Seq[String], lo: Long, hi: Long): Unit = {
    import java.nio.file.{Files, Paths, Path}
    def rmTree(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rmTree(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    def purge(root: Path): Unit = if (Files.isDirectory(root)) {
      val s = Files.list(root)
      try s.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("gen=")) {
          val g = name.stripPrefix("gen=").toLong
          if (g > hi || g < lo) rmTree(p)
        }
      } finally s.close()
    }
    subRoots.foreach { sub =>
      purge(if (sub.isEmpty) Paths.get(path) else Paths.get(path, sub))
    }
  }
}
