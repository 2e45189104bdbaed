package graft.sources

/** Shared Hadoop-FS plumbing for the grid DSv2 sources
  * ([[TiffGridSource]], [[NcGridSource]]) — one place for glob
  * semantics and byte reads, so a fix propagates to every codec
  * connector (r9 review: the two sources had drifted copies). */
object GridFiles {

  /** Expand a path/glob to concrete file paths; a bare directory lists
    * its `*.$ext` leaves. A gz-wrapped file whose UNWRAPPED sibling is
    * co-listed (`x.grb.gz` beside `x.grb`) is dropped: the pair is one
    * archive twice — [[Gz.gunzipLanding]]'s crash window between its
    * atomic move and the wrapped-original delete legally leaves both
    * twins on disk momentarily, and a listing that kept both would
    * double-read every record of that archive. The unwrapped twin wins
    * (it is the complete post-move output and the one whose planner
    * fans out per record).
    *
    * Freshness caveat (r16 advice): in the CONDITIONAL re-download
    * path a fresh `.gz` can land over a STALE unwrapped twin before
    * the unwrap completes, so a listing taken in that window reads the
    * previous generation — consistent but stale. The guard trades that
    * momentary stale read for never double-reading; callers needing
    * freshness must sequence listing after
    * [[HttpFetcher.fetchGunzippedIfChanged]] returns (which only
    * returns after the unwrap has atomically landed). */
  def list(pathOrGlob: String, exts: String*): Seq[String] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(pathOrGlob)
    val fs = p.getFileSystem(conf)
    val expanded =
      if (fs.isDirectory(p))
        exts.flatMap(ext => Option(
          fs.globStatus(new org.apache.hadoop.fs.Path(p, s"*.$ext")))
          .toSeq.flatten)
      else Option(fs.globStatus(p)).toSeq.flatten
    val all = expanded.filter(_.isFile).map(_.getPath.toString).distinct
    // suffix test case-insensitive to match what gunzip-on-landing
    // accepts (`X.GRB.GZ` unwraps too); the SIBLING lookup stays
    // case-exact because the unwrap strips exactly three characters
    // and preserves the stem verbatim (r16 review)
    def isGzName(f: String) = f.length > 3 && f.toLowerCase.endsWith(".gz")
    val plain = all.filterNot(isGzName).toSet
    all.filterNot(f => isGzName(f) && plain.contains(f.dropRight(3)))
      .sorted
  }

  /** Whole-file bytes (codec decode is in-memory by design — grid
    * files are slice-sized, not corpus-sized). */
  def readBytes(file: String): Array[Byte] = {
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(hp)
    try in.readAllBytes() finally in.close()
  }

  /** Last `n` bytes of the file (fewer when the file is shorter) —
    * the gzip ISIZE trailer read the gz-wrapped planning path uses. */
  def readTail(file: String, n: Int): Array[Byte] = {
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val len = fs.getFileStatus(hp).getLen
    val take = math.min(len, n.toLong).toInt
    val buf = new Array[Byte](take)
    val in = fs.open(hp)
    try in.readFully(len - take, buf) finally in.close()
    buf
  }

  /** First `maxLen` bytes plus the file's true length — the bounded
    * header read a planner uses instead of buffering whole cubes. */
  def readPrefix(file: String, maxLen: Int): (Array[Byte], Long) = {
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val len = fs.getFileStatus(hp).getLen
    val n = math.min(len, maxLen.toLong).toInt
    val buf = new Array[Byte](n)
    val in = fs.open(hp)
    try in.readFully(0L, buf) finally in.close()
    (buf, len)
  }

  /** Shared (file × layer) split planning for the layer-grouped grid
    * connectors ([[HdfGridSource]]/[[H5GridSource]]): path-pruned
    * files; per-file layer names from `namesOf` (a throw ⇒ ONE
    * unprunable whole-file split, `None` layers, so corrupt files
    * fail loudly task-side); layer predicates prune at planning; and
    * interleaved grouping caps a wide file at `maxSplitsPerFile`
    * splits so each split pays one file read. */
  def layerSplits(files: Seq[String], pathPred: String => Boolean,
      namesOf: String => Seq[String], layerPred: String => Boolean,
      maxSplitsPerFile: Int): Seq[(String, Option[Seq[String]])] =
    files.filter(pathPred).flatMap { f =>
      val namesKnown =
        try Some(namesOf(f))
        catch { case _: Exception => None }
      namesKnown match {
        case None => Seq((f, None))
        case Some(names) =>
          val matching = names.filter(layerPred)
          val nSplits = math.max(1, math.min(matching.size, maxSplitsPerFile))
          (0 until nSplits).flatMap { k =>
            val group = matching.zipWithIndex
              .collect { case (n, i) if i % nSplits == k => n }
            if (group.isEmpty) None else Some((f, Some(group)))
          }
      }
    }
}
