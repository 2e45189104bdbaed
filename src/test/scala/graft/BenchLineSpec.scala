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

  test("failure list is capped so errors can't blow the budget") {
    val failed = (1 to 50).map(i => f"q${i}%03d_some_rather_long_operator_name")
    val line = Bench.renderJson(fakeResults(200), failed, "sfdir")
    assert(line.length <= Bench.LineBudget, s"line ${line.length} chars")
    assert(line.contains("more"))
  }
}
