package graft.operators

import graft.functions.Text
import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** p01: the end-to-end training-data curation pipeline — the
  * composition story for the C-family operators (SURVEY.md §2.C):
  *
  *   documents → quality gate → language gate → exact dedup →
  *   near-dup candidate pruning (MinHash-LSH) → corpus statistics.
  *
  * Every stage is one of the already-verified operators; the pipeline
  * is pure DataFrame composition, so Catalyst fuses the scalar gates
  * into a single scan pass and the only shuffles are the two dedup
  * key-shuffles.
  */
object TrainingPipeline {

  /** The curated corpus (before stats): one row per kept doc. */
  def curate(docs: DataFrame): DataFrame = {
    val toksOf = docs
      .select(col("doc_id"), col("text"), col("source"), Text.tokens(col("text")).as("toks"))
    val gated = toksOf
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_ratio",
        Text.countIn(col("toks"), Seq("a", "the")).cast("double") / col("n_tokens"))
      // quality gate: enough tokens, not stopword-soup
      .filter(col("n_tokens") >= 20 && col("stop_ratio") < 0.5)
      // language gate: must hit at least one english marker
      .filter(Text.countIn(col("toks"), Seq("the", "a", "is")) > 0)
    // exact dedup: keep min doc_id per content hash
    val exactKept = gated
      .withColumn("content_hash", md5(col("text")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_hash")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn", "content_hash")
    // near-dup prune: drop the higher doc_id of every confirmed pair
    val sh = exactKept.select(col("doc_id"),
        array_distinct(Text.shingles(col("toks"), 3)).as("sh")).persist()
    val sigs = Text.minhashSignatures(sh, "doc_id", col("sh"), 64).persist()
    val bands = sigs.select(col("doc_id"), explode(array(
      (0 until 8).map(b => struct(lit(b).as("band_idx"),
        xxhash64(slice(col("sig"), b * 8 + 1, 8), lit(b)).as("band_hash"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band_idx"), col("bs.band_hash"))
    val cand = bands.toDF("id1", "band_idx", "band_hash")
      .join(bands.toDF("id2", "band_idx", "band_hash"), Seq("band_idx", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val confirmedDrops = cand
      .join(sh.toDF("id1", "sh1"), "id1")
      .join(sh.toDF("id2", "sh2"), "id2")
      .filter(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
        size(array_union(col("sh1"), col("sh2"))) >= 0.3)
      .select(col("id2").as("doc_id")).distinct()
    exactKept.join(confirmedDrops, Seq("doc_id"), "left_anti")
  }

  /** Rows-only summary query: corpus stats per source after curation. */
  val p01 = QueryDef.rowsOnly("p01_training_pipeline") { (spark, dir) =>
    curate(Tables(spark, dir).documents)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("stop_ratio")), 4).as("avg_stop_ratio"))
      .orderBy(col("source"))
  }

  val all: Seq[QueryDef] = Seq(p01)
}
