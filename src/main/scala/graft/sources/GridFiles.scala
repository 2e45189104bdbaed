package graft.sources

/** Shared Hadoop-FS plumbing for the grid DSv2 sources
  * ([[TiffGridSource]], [[NcGridSource]]) — one place for glob
  * semantics and byte reads, so a fix propagates to every codec
  * connector (r9 review: the two sources had drifted copies). */
object GridFiles {

  /** Expand a path/glob to concrete file paths; a bare directory lists
    * its `*.$ext` leaves. */
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
    expanded.filter(_.isFile).map(_.getPath.toString).distinct.sorted
  }

  /** Whole-file bytes (codec decode is in-memory by design — grid
    * files are slice-sized, not corpus-sized). */
  def readBytes(file: String): Array[Byte] = {
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(hp)
    try in.readAllBytes() finally in.close()
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
}
