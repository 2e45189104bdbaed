package graft

/** Profiling main for q36's delta-gated power iteration: runs the real
  * operator under conf overrides so partition counts / block sizes /
  * tolerances can be swept without touching the implementation.
  * Usage: runMain graft.ProfileQ36 [sfDir] [loopPartitions] [blockRounds]
  */
object ProfileQ36 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftConf.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.lift(1).foreach(p => spark.conf.set("graft.q36.loopPartitions", p))
    args.lift(2).foreach(b => spark.conf.set("graft.q36.blockRounds", b))
    // 4th arg "noaqe": measure the loop without per-stage re-planning
    if (args.lift(3).contains("noaqe"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    // 5th arg: warm repetitions — single cold-JVM runs carry ±3 s of
    // JIT/codegen noise; A/B compares the warm minimum
    val reps = args.lift(4).map(_.toInt).getOrElse(1)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.operators.Relational.q36.fn(spark, sfDir).count()
      println(f"rep$i rows=$n rounds=${graft.operators.Relational.q36RoundsFor(sfDir)} " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"(parts=${args.lift(1).getOrElse("auto")} block=${args.lift(2).getOrElse("4")})")
    }
    spark.stop()
  }
}
