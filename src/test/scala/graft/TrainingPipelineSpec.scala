package graft

import graft.operators.TrainingPipeline
import org.apache.spark.sql.functions._

class TrainingPipelineSpec extends SparkSpec {

  test("p02 fates are exhaustive and token mass only counts kept docs") {
    val rows = TrainingPipeline.p02.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    var totalDocs = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_rep_drop") + r.getAs[Long]("n_contam_drop") +
        r.getAs[Long]("n_kept") == n, s"${r.getAs[String]("source")}: fates don't partition")
      assert(r.getAs[Long]("kept_tokens") >= r.getAs[Long]("n_kept"),
        "kept docs must carry at least one token each")
      totalDocs += n
    }
    // every non-eval doc appears in exactly one source row
    val want = Tables(spark, sf).documents
      .filter(col("doc_id") % 97 =!= 0).count()
    assert(totalDocs == want)
  }

  test("p03 sampling is deterministic and tracks the per-source target rate") {
    val run1 = TrainingPipeline.p03.fn(spark, sf).collect()
    val run2 = TrainingPipeline.p03.fn(spark, sf).collect()
    assert(run1.sameElements(run2))
    assert(run1.map(_.getAs[Long]("n_sampled")).sum > 0)
    run1.foreach { r =>
      val (target, realized) =
        (r.getAs[Double]("target_rate"), r.getAs[Double]("realized_rate"))
      assert(target > 0 && target <= 1.0)
      // 25–2500 docs/source: generous binomial tolerance
      assert(math.abs(realized - target) < 0.2,
        s"${r.getAs[String]("source")}: realized=$realized target=$target")
    }
  }

  test("curation keeps a nonempty, deduplicated, quality-gated subset") {
    val docs = Tables(spark, sf).documents
    val curated = TrainingPipeline.curate(docs).cache()
    val n = curated.count()
    assert(n > 0 && n <= docs.count())
    // gates hold on every surviving row
    assert(curated.filter(col("n_tokens") < 20).count() == 0)
    assert(curated.filter(col("stop_ratio") >= 0.5).count() == 0)
    // no exact duplicates survive
    val distinctTexts = curated.select(md5(col("text"))).distinct().count()
    assert(distinctTexts == n)
  }

  test("p01 summary aggregates per source") {
    val out = TrainingPipeline.p01.fn(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_docs") > 0))
  }

  test("multi-batch streaming upsert converges to the batch result") {
    import java.nio.file.Files
    val srcDir = Files.createTempDirectory("graft_multi").toString
    val events = Tables(spark, sf).events
    // 4 source files → 4 micro-batches with maxFilesPerTrigger=1
    events.repartition(4).write.mode("overwrite").parquet(s"$srcDir/in")
    val schema = spark.read.parquet(s"$srcDir/in").schema
    val sinkDir = s"$srcDir/sink"
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/in")
      .withColumn("d_key", date_format(col("ts"), "yyyy-MM-dd"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.write.mode("append").partitionBy("d_key").parquet(sinkDir)
      }
      .option("checkpointLocation", s"$srcDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(sinkDir)
    assert(got.count() == events.count())
    val gotSum = got.agg(round(sum("value"), 2)).collect()(0).getDouble(0)
    val wantSum = events.agg(round(sum("value"), 2)).collect()(0).getDouble(0)
    assert(gotSum == wantSum)
  }

  test("p04 shuffle shard: partitions the corpus, keys consistent with shards") {
    val rows = TrainingPipeline.p04.fn(spark, sf).collect()
    assert(rows.length == 16, "md5 nibble sharding must populate all 16 shards")
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables(spark, sf).documents.count())
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val shard = r.getAs[Int]("shard")
      val hex = "0123456789abcdef"(shard).toString
      assert(r.getAs[String]("first_key").startsWith(hex))
      // ARG_MIN consistency: the first doc's md5 IS the shard's min key
      val k = md.digest(r.getAs[Long]("first_doc").toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(k == r.getAs[String]("first_key"))
      // uniform hashing keeps shards balanced
      assert(r.getAs[Long]("n_docs") <= 3 * total / 16,
        s"shard $shard is pathologically skewed")
    }
  }

  test("p05 semantic curation: fates exhaustive, drops = members minus components") {
    val rows = TrainingPipeline.p05.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sem_dup") + r.getAs[Long]("n_kept") ==
        r.getAs[Long]("n_docs"))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables(spark, sf).documents.count())
    // connected-components semantics: each cluster keeps exactly ONE
    // representative, so drops = (docs in any pair) - (#components)
    val pairs = graft.operators.Similarity.semanticPairs(spark, sf)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    // union-find over the collected pair list (test-side ground truth)
    val parent = scala.collection.mutable.Map(members.map(m => m -> m).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val nComponents = members.map(find).size
    assert(rows.map(_.getAs[Long]("n_sem_dup")).sum == members.size - nComponents)
  }

  test("p06 split: disjoint, complete, stable under corpus growth, roughly 80/10/10") {
    val rows = TrainingPipeline.p06.fn(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables(spark, sf).documents.count(), "split must be complete")
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .map { case (k, g) => k -> g.map(_.getAs[Long]("n_docs")).sum }
    assert(bySplit.keySet == Set("train", "val", "test"))
    val trainFrac = bySplit("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
    // stability: a doc's split is a pure function of its id — the same
    // ids split identically when evaluated on a shrunken corpus
    val sub = TrainingPipeline.p06.fn(spark, sf)
    val md = java.security.MessageDigest.getInstance("MD5")
    def splitOf(id: Long): String = {
      val pk = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(2)
      if (pk < "cc") "train" else if (pk < "e6") "val" else "test"
    }
    val docIds = Tables(spark, sf).documents.select("doc_id").collect().map(_.getLong(0))
    val expected = docIds.groupBy(splitOf).map { case (k, v) => k -> v.length.toLong }
    assert(bySplit == expected, "engine split disagrees with the pure md5 function")
  }

  test("p08 curriculum: monotone length phases, near-equal sizes, stable shuffle") {
    val rows = TrainingPipeline.p08.fn(spark, sf).collect()
    val total = rows.length
    assert(total > 0)
    val byPhase = rows.groupBy(_.getAs[Int]("phase"))
    assert(byPhase.keySet == Set(1, 2, 3, 4))
    // phases are DISJOINT length intervals, in order
    val bounds = byPhase.toSeq.sortBy(_._1).map { case (p, rs) =>
      (p, rs.map(_.getAs[Long]("n_tok")).min, rs.map(_.getAs[Long]("n_tok")).max)
    }
    bounds.sliding(2).foreach { case Seq((_, _, hi), (_, lo, _)) =>
      assert(hi < lo, s"phase intervals overlap: $bounds")
    }
    // equal-frequency up to boundary ties: every phase within ±10% + ties
    val maxTie = rows.groupBy(_.getAs[Long]("n_tok")).values.map(_.length).max
    byPhase.values.foreach(rs =>
      assert(math.abs(rs.length - total / 4.0) <= total * 0.1 + maxTie,
        s"unbalanced phases: ${byPhase.view.mapValues(_.length).toMap}"))
    // the within-phase order key is a pure function of the id → the
    // curriculum is run-stable
    val again = TrainingPipeline.p08.fn(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getString(3))).toSeq ==
      again.map(r => (r.getLong(0), r.getInt(1), r.getString(3))).toSeq)
  }

  test("p07 three-phase budget selection equals the naive global cumsum") {
    import org.apache.spark.sql.expressions.Window
    val kept = TrainingPipeline.p07.fn(spark, sf).collect()
    assert(kept.nonEmpty)
    // naive formulation: ONE global window cumsum (what the oracle runs,
    // and what the histogram→threshold→boundary phases must equal)
    val toks = split(col("text"), " ")
    val nToks = size(toks)
    val stopRatio = size(filter(toks, t => t === "a" || t === "the")).cast("double") / nToks
    val scored = Tables(spark, sf).documents
      .select(col("doc_id"), nToks.cast("long").as("n_tokens"),
        graft.QueryDef.roundBiased(
          least(nToks / lit(200.0), lit(1.0)) * 0.4 + (lit(1.0) - stopRatio) * 0.6, 4)
          .as("quality"))
    val budget = math.floor(
      0.25 * scored.agg(sum("n_tokens")).collect()(0).getLong(0)).toLong
    val w = Window.orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = scored.withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") - col("n_tokens") < budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.map(_.getAs[Long]("doc_id")).toSet == naive)
    // boundary property: the budget is crossed by the last doc, no earlier
    val totalKept = kept.map(_.getAs[Long]("n_tokens")).sum
    val lastKept = kept.maxBy(r => (-r.getAs[Double]("quality"), r.getAs[Long]("doc_id")))
    assert(totalKept >= budget, "selection stopped before the budget was spent")
    assert(totalKept - lastKept.getAs[Long]("n_tokens") < budget,
      "a doc before the boundary already crossed the budget")
  }

  test("p07 plan shape: broadcast threshold join, corpus window key-partitioned") {
    val plan = TrainingPipeline.p07.fn(spark, sf).queryExecution.executedPlan.toString()
    // the under-budget quality groups reach the corpus via broadcast
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold table must broadcast to the corpus:\n$plan")
    // global (single-partition) work is confined to the grid-bounded
    // histogram cumsum and the scalar budget — never the corpus
    assert("Exchange SinglePartition".r.findAllIn(plan).length <= 2,
      s"unexpected corpus-sized single-partition stage:\n$plan")
    // the per-doc prefix window partitions by quality, not a global sort
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join expected:\n$plan")
  }

  test("p04/p06 plan shape: map-side assignment, no join anywhere") {
    Seq(TrainingPipeline.p04, TrainingPipeline.p06).foreach { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString()
      assert(!plan.contains("Join"), s"${q.name} should be join-free:\n$plan")
      // min_by is not hash-aggregable, so p04 plans a SortAggregate —
      // still partial-agg + one exchange
      assert(plan.contains("Aggregate"), s"${q.name} missing the tally agg")
      assert(plan.contains("partial_"), s"${q.name} missing map-side partial agg")
    }
  }

  test("p09 allocation sums exactly to the budget and respects the epoch cap") {
    import org.apache.spark.sql.functions.col
    val rows = TrainingPipeline.p09.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getLong(1)).sum
    assert(rows.map(_.getLong(3)).sum == 2 * totalTokens, "sum(alloc) must equal B")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"alloc above 4-epoch cap: $r")
      assert(r.getDouble(4) <= 4.0 + 1e-9)
    }
    // survivors' allocations are even to within the 1-token remainder
    val uncapped = rows.filter(r => r.getLong(3) < r.getLong(2)).map(_.getLong(3))
    if (uncapped.nonEmpty) assert(uncapped.max - uncapped.min <= 1)

    // crafted skew: the tiny domain caps at 4 epochs, the rest split evenly
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_p09").toString
    def doc(id: Long, src: String, nTok: Int) =
      (id, Seq.fill(nTok)("w").mkString(" "), "en", src, nTok.toLong)
    val docs = Seq(doc(0L, "tiny", 10)) ++
      (1L to 10L).map(doc(_, "bigA", 100)) ++ (11L to 20L).map(doc(_, "bigB", 100))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TrainingPipeline.p09.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // B = 2*2010 = 4020; tiny caps at 40; survivors split 3980 → 1990 each
    assert(got == Map("tiny" -> 40L, "bigA" -> 1990L, "bigB" -> 1990L), s"$got")
  }

  test("p10 temperature mix up-weights the tail, weights normalize, rates capped") {
    val rows = TrainingPipeline.p10.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // weights are a (grid-rounded) distribution, every rate in (0, 1]
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum to $wSum")
    rows.foreach { r =>
      val rate = r.getAs[Double]("target_rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
    }
    // the temperature property: τ=0.5 compresses the weight ratio to
    // the square root of the token ratio, so every smaller source gets
    // a HIGHER sampling rate than every larger one
    val byTokens = rows.sortBy(_.getAs[Long]("n_tokens"))
    byTokens.sliding(2).foreach {
      case Array(small, large) =>
        assert(small.getAs[Double]("target_rate") >=
          large.getAs[Double]("target_rate"),
          s"${small.getAs[String]("source")} rate below " +
            s"${large.getAs[String]("source")}")
      case _ =>
    }
    // realized sampling tracks the target within binomial noise
    rows.foreach { r =>
      val expected = r.getAs[Double]("target_rate") * r.getAs[Long]("n_docs")
      val got = r.getAs[Long]("n_sampled").toDouble
      val sd = math.sqrt(expected max 1.0)
      assert(math.abs(got - expected) <= 5 * sd + 2,
        s"${r.getAs[String]("source")}: sampled $got vs expected $expected")
    }
  }

  test("p11 dedup mixture: duplicated mass buys no weight; rates stay valid") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val dir = java.nio.file.Files.createTempDirectory("graft_p11").toString
    // source A: one unique 100-token doc (eff = 100 × 1e6 = 1e8 micro).
    // source B: TEN byte-identical copies of a 100-token doc — raw
    // tokens 10×, but soft-dedup mass 100 × (1e6 // 10) × 10 = 1e8:
    // identical effective mass ⇒ identical weight and rate, though
    // p10 (raw counts) would hand B √10× the weight.
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text + " ua", "en", "A", 0L)) ++
      (1 to 10).map(i => (100L + i, text, "en", "B", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = TrainingPipeline.p11.fn(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // A's extra token ("ua") makes 101 vs 100 raw tokens; effective
    // mass 1.01e8 vs 1.0e8 — nearly equal weights despite 10× raw
    assert(got("A").getAs[Long]("n_tokens") == 101L)
    assert(got("B").getAs[Long]("n_tokens") == 1000L)
    assert(got("A").getAs[Long]("eff_micro") == 101000000L)
    // B: 10 copies × 100 tok × (1e6 // 10) ppm = 1e8 micro-tokens
    assert(got("B").getAs[Long]("eff_micro") == 100000000L)
    // weights reflect effective, not raw, mass
    val wA = got("A").getAs[Double]("weight")
    val wB = got("B").getAs[Double]("weight")
    assert(math.abs(wA + wB - 1.0) < 1e-3)
    // corpus sanity: weights normalize, rates valid, sampling bounded
    val rows = TrainingPipeline.p11.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-3)
    rows.foreach { r =>
      val rate = r.getAs[Double]("target_rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("eff_micro") <= r.getAs[Long]("n_tokens") * 1000000L)
    }
  }

  test("p13 dataset card: totals, shares, and dup ratio exact on a crafted source") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val dir = java.nio.file.Files.createTempDirectory("graft_p13").toString
    // source A: 4 docs — two identical (one dup), three English
    val txt = "the quick brown fox jumps"
    Seq((1L, txt, "en", "A", 0L), (2L, txt, "en", "A", 0L),
      (3L, "a b c d", "en", "A", 0L), (4L, "x y z", "de", "A", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val r = TrainingPipeline.p13.fn(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_tokens") == 5L + 5L + 4L + 3L)
    assert(r.getAs[Long]("en_ppm") == 750000L)
    assert(r.getAs[Long]("dup_ppm") == 250000L)
    val mq = r.getAs[Double]("mean_quality")
    assert(mq > 0.0 && mq <= 1.0, s"mean quality $mq")
    // corpus: every source carded once, ratios in range
    val rows = TrainingPipeline.p13.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { c =>
      assert(c.getAs[Long]("en_ppm") <= 1000000L)
      assert(c.getAs[Long]("dup_ppm") < 1000000L)
      assert(c.getAs[Double]("mean_quality") <= 1.0)
    }
  }

  test("p12 logreg: first-step gradient exact, separable corpus learned by step 2") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val dir = java.nio.file.Files.createTempDirectory("graft_p12").toString
    // 10 long en docs (x1 = x2 = 1.0) vs 10 short de docs
    // (x1 = 0.04, x2 = 0.0295) — linearly separable.
    val en = ("word " * 500).trim
    val de = ("de " * 20).trim
    val docs = (1 to 10).map(i => (i.toLong, en, "en", "A", 0L)) ++
      (1 to 10).map(i => (100L + i, de, "de", "B", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val rows = TrainingPipeline.p12.fn(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    // w = 0 ⇒ p = 0.5 ∀; g_x1 = (10·0.5·0.04 − 10·0.5·1)/20 = −0.24
    assert(rows(1).getAs[Double]("w1") == 0.24)
    assert(rows(1).getAs[Double]("w2") == 0.242625)
    assert(rows(1).getAs[Double]("w0") == 0.0)
    // after one step everything predicts 1 (en right, de wrong);
    // the bias correction flips de negative by step 2
    assert(rows(1).getAs[Long]("n_correct") == 10L)
    assert(rows(2).getAs[Long]("n_correct") == 20L)
    assert(rows(3).getAs[Long]("n_correct") == 20L)
    // corpus: three iterations, accuracy bounded, weights finite
    val corpus = TrainingPipeline.p12.fn(spark, sf).collect()
    assert(corpus.length == 3)
    val n = Tables(spark, sf).documents.count()
    corpus.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= n)
      assert(!r.getAs[Double]("w1").isNaN && !r.getAs[Double]("w1").isInfinite)
    }
  }

  test("p14 calibration bins partition the corpus, ordered and self-consistent") {
    val rows = TrainingPipeline.p14.fn(spark, sf).collect()
    val n = Tables(spark, sf).documents.count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n, "bins must partition")
    assert(rows.map(_.getAs[Int]("bin")).forall(b => b >= 0 && b <= 9))
    // range-normalized equal-width bins ⇒ mean predictions non-decreasing
    val means = rows.sortBy(_.getAs[Int]("bin")).map(_.getAs[Double]("mean_pred"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b }, means.toSeq)
    rows.foreach { r =>
      val gap = math.abs(r.getAs[Double]("mean_pred") - r.getAs[Double]("frac_pos"))
      assert(math.abs(gap - r.getAs[Double]("gap")) < 1e-12, r.toString)
      assert(r.getAs[Double]("frac_pos") >= 0.0 && r.getAs[Double]("frac_pos") <= 1.0)
    }
    // degenerate range (identical docs): one bin 0 carrying everything
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_p14").toString
    Seq.tabulate(8)(i => (i.toLong, "same text for every doc here ok", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val degen = TrainingPipeline.p14.fn(spark, dir).collect()
    assert(degen.length == 1 && degen(0).getAs[Int]("bin") == 0 &&
      degen(0).getAs[Long]("n_docs") == 8L, degen.toSeq)
  }

  test("p15 contamination card ties out to d08 and keeps zero-flag sources") {
    import org.apache.spark.sql.functions._
    val card = graft.operators.TrainingPipeline.p15.fn(spark, sf).collect()
    val d08rows = graft.operators.Dedup.d08.fn(spark, sf).count()
    assert(card.map(_.getAs[Long]("n_flagged")).sum == d08rows)
    // all 20 sources present even when nothing is flagged; ppm = floor
    assert(card.length == spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count().toInt)
    card.foreach { r =>
      assert(r.getAs[Long]("flagged_ppm") ==
        r.getAs[Long]("n_flagged") * 1000000L / r.getAs[Long]("n_docs"), r.toString)
      if (r.getAs[Long]("n_flagged") == 0L)
        assert(r.getAs[Long]("max_overlap") == 0L, r.toString)
    }
  }
}
