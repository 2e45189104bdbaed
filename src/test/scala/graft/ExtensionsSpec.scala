package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers the native function set") {
    // apply against a fresh SparkSessionExtensions: each descriptor must
    // produce a working expression
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    GraftExtensions.functions.foreach { case (ident, _, builder) =>
      val e = builder(Seq(org.apache.spark.sql.catalyst.expressions.Literal("ab")))
      assert(e.dataType != null, s"${ident.funcName} built no expression")
    }
    // and the expression evaluates to the known fingerprint
    val lit = org.apache.spark.sql.catalyst.expressions.Literal("ab")
    val got = graft.functions.RollingFingerprintExpr(lit).eval(null)
    assert(got == 3105L)
  }

  test("compact rewrites into the expected number of range partitions") {
    val events = Tables(spark, sf).events
    val total = events.count()
    val compacted = Scale.compact(events, "ts", targetRowsPerFile = 400, totalRows = total)
    assert(compacted.rdd.getNumPartitions == math.ceil(total / 400.0).toInt)
    assert(compacted.count() == total)
  }
}
