package graft

import graft.functions.{CharEntropyStatsExpr, CosineSimExpr, DotExpr, HyperplaneBucketExpr, Md5SeededExpr, MinHashSigExpr, NormExpr, RepetitionStatsExpr, RollingFingerprintExpr, SimhashMaskExpr, TokenCountsExpr, TopKAggregate, WinnowFingerprintsExpr, WordShinglesExpr, XxMinhashSigExpr, XxShinglesExpr}
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native functions
  * available to ANY session (including pure-SQL users) via
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *
  * This is the library's production registration path; the per-session
  * `RollingFingerprintExpr.register` helper exists for sessions that
  * are already running.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def intArg(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_rolling_fp"),
      new ExpressionInfo(classOf[RollingFingerprintExpr].getName, "graft_rolling_fp"),
      (exprs: Seq[Expression]) => RollingFingerprintExpr(exprs.head)),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotExpr].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotExpr(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[NormExpr].getName, "graft_norm"),
      (exprs: Seq[Expression]) => NormExpr(exprs.head)),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimExpr(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucketExpr].getName, "graft_hyperplane_bucket"),
      (exprs: Seq[Expression]) =>
        HyperplaneBucketExpr(exprs(0), intArg(exprs(1)), intArg(exprs(2)))),
    (FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "graft_word_shingles"),
      (exprs: Seq[Expression]) => WordShinglesExpr(exprs(0), intArg(exprs(1)))),
    (FunctionIdentifier("graft_xx_shingles"),
      new ExpressionInfo(classOf[XxShinglesExpr].getName, "graft_xx_shingles"),
      (exprs: Seq[Expression]) => XxShinglesExpr(exprs(0), intArg(exprs(1)))),
    (FunctionIdentifier("graft_md5_seeded"),
      new ExpressionInfo(classOf[Md5SeededExpr].getName, "graft_md5_seeded"),
      (exprs: Seq[Expression]) => Md5SeededExpr(exprs(0), intArg(exprs(1)))),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSigExpr(exprs(0), intArg(exprs(1)))),
    (FunctionIdentifier("graft_xx_minhash_sig"),
      new ExpressionInfo(classOf[XxMinhashSigExpr].getName, "graft_xx_minhash_sig"),
      (exprs: Seq[Expression]) => XxMinhashSigExpr(exprs(0), intArg(exprs(1)))),
    (FunctionIdentifier("graft_simhash_mask"),
      new ExpressionInfo(classOf[SimhashMaskExpr].getName, "graft_simhash_mask"),
      (exprs: Seq[Expression]) => SimhashMaskExpr(exprs(0))),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAggregate].getName, "graft_topk"),
      (exprs: Seq[Expression]) => TopKAggregate(
        Cast(exprs(0), DoubleType), Cast(exprs(1), LongType), intArg(exprs(2)))),
    (FunctionIdentifier("graft_char_entropy_stats"),
      new ExpressionInfo(classOf[CharEntropyStatsExpr].getName,
        "graft_char_entropy_stats"),
      (exprs: Seq[Expression]) => CharEntropyStatsExpr(exprs.head)),
    (FunctionIdentifier("graft_token_counts"),
      new ExpressionInfo(classOf[TokenCountsExpr].getName, "graft_token_counts"),
      (exprs: Seq[Expression]) => TokenCountsExpr(exprs.head)),
    (FunctionIdentifier("graft_repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStatsExpr].getName,
        "graft_repetition_stats"),
      (exprs: Seq[Expression]) => RepetitionStatsExpr(exprs.head)),
    (FunctionIdentifier("graft_winnow_fps"),
      new ExpressionInfo(classOf[WinnowFingerprintsExpr].getName,
        "graft_winnow_fps"),
      (exprs: Seq[Expression]) =>
        if (exprs.length >= 3)
          WinnowFingerprintsExpr(exprs(0), intArg(exprs(1)), intArg(exprs(2)))
        else WinnowFingerprintsExpr(exprs.head)))
}
