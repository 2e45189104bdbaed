package graft

/** Dev profiler: run ONE named SparkEntry query against a data dir and
  * print its wall clock — the isolated re-bench the contended-machine
  * discipline calls for before concluding any regression.
  * Usage: runMain graft.ProfileQuery <queryName> [sfDir] [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: ProfileQuery <query> [dir] [reps]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"no query '$name'"))
    val spark = GraftConf.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"$name rep$i rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
