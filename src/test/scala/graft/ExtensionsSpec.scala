package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers the native function set") {
    // apply against a fresh SparkSessionExtensions: each descriptor must
    // produce a working expression
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
    val arr = Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType))
    val toks = Literal.create(Seq("a", "b", "c"), ArrayType(StringType))
    val argsFor = Map(
      "graft_rolling_fp" -> Seq(Literal("ab")),
      "graft_dot" -> Seq(arr, arr),
      "graft_norm" -> Seq(arr),
      "graft_cosine" -> Seq(arr, arr),
      "graft_hyperplane_bucket" -> Seq(arr, Literal(4), Literal(2)),
      "graft_word_shingles" -> Seq(toks, Literal(2)),
      "graft_xx_shingles" -> Seq(toks, Literal(2)),
      "graft_md5_seeded" -> Seq(Literal("ab"), Literal(4)),
      "graft_minhash_sig" -> Seq(toks, Literal(4)),
      "graft_xx_minhash_sig" -> Seq(toks, Literal(4)),
      "graft_simhash_mask" -> Seq(toks),
      "graft_topk" -> Seq(Literal(1.0), Literal(2L), Literal(3)),
      "graft_char_entropy_stats" -> Seq(Literal("ab")),
      "graft_token_counts" -> Seq(toks),
      "graft_repetition_stats" -> Seq(toks),
      "graft_winnow_fps" -> Seq(Literal("abcdefghijklm")))
    GraftExtensions.functions.foreach { case (ident, _, builder) =>
      val e = builder(argsFor(ident.funcName))
      assert(e.dataType != null, s"${ident.funcName} built no expression")
      assert(e.checkInputDataTypes().isSuccess, s"${ident.funcName} rejected valid input")
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
