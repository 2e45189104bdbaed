package graft.operators

import graft.functions.Text
import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** p01: the end-to-end training-data curation pipeline — the
  * composition story for the C-family operators (SURVEY.md §2.C):
  *
  *   documents → quality gate → language gate → exact dedup →
  *   near-dup candidate pruning (MinHash-LSH, capped buckets) →
  *   corpus statistics.
  *
  * Every stage is one of the already-verified operators; the pipeline
  * is pure DataFrame composition, so Catalyst fuses the scalar gates
  * into a single scan pass and the only shuffles are the dedup
  * key-shuffles. The near-dup stage runs on the portable md5 MinHash
  * path ([[Dedup.md5MinhashBands]], the d02b shape), which makes the
  * WHOLE pipeline expressible in ANSI SQL — so the driver's DuckDB
  * oracle hash-checks it end-to-end rather than just counting rows.
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
    // exact dedup: keep min doc_id per content hash. Persisted AND
    // eagerly materialized: the deduped set feeds BOTH the
    // shingle/near-dup subtree and the final anti-join, and a lazily
    // filled cache would let the two branches race and re-run the
    // gate+window stages (measured 9.5 s → 3.2 s at sf0.1).
    val exactKept = gated
      .withColumn("content_hash", md5(col("text")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn", "content_hash")
      .persist()
    exactKept.count()
    // near-dup prune: drop the higher doc_id of every confirmed pair.
    // Bucket join capped (Dedup.BucketCap) — a boilerplate-heavy corpus
    // must not go quadratic inside one hot band bucket. Confirm in two
    // tiers (the d02 shape): estimate J from FIXED-WIDTH signature
    // agreement first, ship the variable-width shingle arrays only for
    // pairs that plausibly pass — a doc in k candidate pairs no longer
    // has its whole shingle set shuffled k times. The 0.15 cutoff is
    // ~2.6σ below the 0.3 confirm threshold at 16 hashes, and the
    // oracle applies the identical gate, so parity holds exactly.
    val sh = exactKept.select(col("doc_id"),
        array_distinct(Text.shingles(col("toks"), 3)).as("sh")).persist()
    val sigs = Dedup.md5MinhashSigTable(sh, "doc_id", "sh").persist()
    val cand = Dedup.bucketPairs(Dedup.bandsFromSigs(sigs, "doc_id"))
    val estKept = cand
      .join(sigs.toDF("id1", "sv1"), "id1")
      .join(sigs.toDF("id2", "sv2"), "id2")
      .filter(size(filter(zip_with(col("sv1"), col("sv2"), (a, b) => a === b), x => x))
        .cast("double") / 16 >= 0.15)
      .select(col("id1"), col("id2"))
    val confirmedDrops = estKept
      .join(sh.toDF("id1", "sh1"), "id1")
      .join(sh.toDF("id2", "sh2"), "id2")
      .filter(Dedup.jaccard(col("sh1"), col("sh2")) >= 0.3)
      .select(col("id2").as("doc_id")).distinct()
    exactKept.join(confirmedDrops, Seq("doc_id"), "left_anti")
  }

  /** Corpus stats per source after curation — DuckDB-oracled across
    * every stage (gates, exact dedup, md5-minhash banding with the
    * 64-cap, Jaccard confirm, anti-join, aggregation). */
  val p01 = QueryDef(
    "p01_training_pipeline",
    """WITH toks AS (
      |  SELECT doc_id, source, text, STRING_SPLIT(text, ' ') AS tk FROM documents),
      |gate AS (
      |  SELECT doc_id, source, text, tk, LEN(tk) AS n_tokens,
      |    CAST(LEN(LIST_FILTER(tk, t -> t = 'a' OR t = 'the')) AS DOUBLE) / LEN(tk) AS stop_ratio
      |  FROM toks
      |  WHERE LEN(tk) >= 20
      |    AND CAST(LEN(LIST_FILTER(tk, t -> t = 'a' OR t = 'the')) AS DOUBLE) / LEN(tk) < 0.5
      |    AND LEN(LIST_FILTER(tk, t -> t = 'the' OR t = 'a' OR t = 'is')) > 0),
      |exact AS (
      |  SELECT * FROM gate
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) = 1),
      |sh AS (SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(
      |  RANGE(1, GREATEST(LEN(tk) - 1, 1)),
      |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM exact),
      |ex AS (SELECT doc_id, UNNEST(sh) AS s FROM sh),
      |sig AS (SELECT doc_id, j, MIN(MD5(s || '#' || j)) AS m
      |        FROM ex, RANGE(16) r(j) GROUP BY doc_id, j),
      |band AS (SELECT doc_id, j // 4 AS band_idx,
      |         MD5(STRING_AGG(m, '|' ORDER BY j)) AS band_hash
      |         FROM sig GROUP BY doc_id, j // 4),
      |bandc AS (SELECT doc_id, band_idx, band_hash FROM (
      |         SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_hash) AS bsz
      |         FROM band) t WHERE bsz <= 64),
      |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |         FROM bandc a JOIN bandc b
      |           ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
      |          AND a.doc_id < b.doc_id),
      |est AS (SELECT c.id1, c.id2
      |        FROM cand c JOIN sig a ON a.doc_id = c.id1
      |                    JOIN sig b ON b.doc_id = c.id2 AND b.j = a.j
      |        GROUP BY c.id1, c.id2
      |        HAVING COUNT(*) FILTER (WHERE a.m = b.m) / 16.0 >= 0.15),
      |drops AS (SELECT DISTINCT id2 AS doc_id
      |  FROM est JOIN sh x ON x.doc_id = id1 JOIN sh y ON y.doc_id = id2
      |  WHERE CAST(LEN(LIST_INTERSECT(x.sh, y.sh)) AS DOUBLE) /
      |        LEN(LIST_DISTINCT(LIST_CONCAT(x.sh, y.sh))) >= 0.3),
      |kept AS (SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM drops))
      |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  ROUND(AVG(stop_ratio) + 1e-9, 4) AS avg_stop_ratio
      |FROM kept GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    curate(Tables(spark, dir).documents)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        graft.QueryDef.roundBiased(avg(col("stop_ratio")), 4).as("avg_stop_ratio"))
      .orderBy(col("source"))
  }

  /** p02: curation v2 — the round-3 gates composed: repetition-quality
    * gate (t09's metrics and thresholds, verbatim via
    * [[TextAnalysis.repetitionMetrics]]) then benchmark decontamination
    * (d08's broadcast contamination join via [[Dedup.contamination]],
    * run only on repetition survivors — cheap per-doc gates first, the
    * join tier after), reduced to per-source fate counts. Gate order is
    * the 100 TB cost story: the scalar gates drop rows before any
    * shingle is shuffled, and the eval side stays broadcast. */
  val p02 = QueryDef(
    "p02_curation_v2",
    """WITH train AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 97 <> 0),
      |toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM train),
      |n AS (SELECT doc_id, CAST(LEN(tk) AS INTEGER) AS n_tokens FROM toks),
      |bi AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(tk), 1)),
      |         i -> tk[i] || ' ' || tk[i+1])) AS g FROM toks),
      |bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g),
      |btop AS (SELECT doc_id, MAX(c) AS top2_cnt FROM bc GROUP BY doc_id),
      |tri AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(tk) - 1, 1)),
      |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g FROM toks),
      |tc AS (SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY doc_id, g),
      |tagg AS (SELECT doc_id,
      |         SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3_occ,
      |         SUM(c) AS tri_total FROM tc GROUP BY doc_id),
      |gated AS (SELECT n.doc_id, tr.source, n.n_tokens,
      |    CASE WHEN ROUND(top2_cnt * 2.0 / n_tokens + 1e-9, 4) <= 0.10
      |          AND ROUND(CAST(dup3_occ AS DOUBLE) / tri_total + 1e-9, 4) <= 0.10
      |         THEN 1 ELSE 0 END AS rep_keep
      |  FROM n JOIN btop USING (doc_id) JOIN tagg USING (doc_id)
      |       JOIN train tr ON tr.doc_id = n.doc_id),
      |shsv AS (SELECT toks.doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
      |         RANGE(1, GREATEST(LEN(tk) - 1, 1)),
      |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS g
      |  FROM toks JOIN gated USING (doc_id) WHERE rep_keep = 1),
      |evsh AS (SELECT e.doc_id AS eval_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
      |         RANGE(1, GREATEST(LEN(tk) - 1, 1)),
      |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS g
      |  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents
      |        WHERE doc_id % 97 = 0) e),
      |contam AS (SELECT s.doc_id FROM shsv s JOIN evsh ON s.g = evsh.g
      |           GROUP BY s.doc_id HAVING COUNT(DISTINCT s.g) >= 2)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN rep_keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_drop,
      |  CAST(SUM(CASE WHEN rep_keep = 1 AND c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_drop,
      |  CAST(SUM(CASE WHEN rep_keep = 1 AND c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rep_keep = 1 AND c.doc_id IS NULL THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM gated g LEFT JOIN contam c ON g.doc_id = c.doc_id
      |GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir).documents
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val evalDocs = docs.filter(col("doc_id") % 97 === 0)
    // persisted + eagerly materialized: `gated` feeds both the
    // survivor-shingle subtree and the final fate aggregation (the p01
    // lazy-cache-race lesson applies unchanged)
    val gated = train.select(col("doc_id"), col("source"), col("text"))
      .join(TextAnalysis.repetitionMetrics(train), "doc_id")
      .withColumn("rep_keep", TextAnalysis.repKeep)
      .persist()
    gated.count()
    val contamIds = Dedup.contamination(
        gated.filter(col("rep_keep") === 1).select(col("doc_id"), col("text")),
        evalDocs)
      .select(col("doc_id"), lit(1).as("cm"))
    gated.join(contamIds, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rep_keep") === 0, 1).otherwise(0)).as("n_rep_drop"),
        sum(when(col("rep_keep") === 1 && col("cm").isNotNull, 1).otherwise(0)).as("n_contam_drop"),
        sum(when(col("rep_keep") === 1 && col("cm").isNull, 1).otherwise(0)).as("n_kept"),
        sum(when(col("rep_keep") === 1 && col("cm").isNull, col("n_tokens")).otherwise(0)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** p03: mixture sampling EXECUTION — t07 computes the
    * mixture-equalizing weights; p03 realizes them: each source's
    * target rate derives from its token share (half the equalizing
    * weight, capped at 1), and docs are picked by the q21 deterministic
    * md5 sampler — same rows on any engine, cluster, or run.
    *
    * The s06 two-phase shape: the rate table is a tiny aggregation
    * prepass (sources × 1 row, broadcast back), and the sampling pass
    * is a map-side projection over the corpus — no shuffle of the
    * 100 TB side beyond the final per-source tally. Rates are rounded
    * to 4 decimals BEFORE the 16-bit threshold floor so both engines
    * compare against the identical integer cutoff. */
  val p03 = QueryDef(
    "p03_mixture_sample",
    """WITH tok AS (SELECT doc_id, source, LEN(STRING_SPLIT(text, ' ')) AS n_tok FROM documents),
      |src AS (SELECT source, COUNT(*) AS n_docs,
      |        CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM tok GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total, COUNT(*) AS n_sources FROM src),
      |rates AS (SELECT source, n_docs,
      |    ROUND(LEAST(0.5 * (1.0 / n_sources) / (n_tokens * 1.0 / total), 1.0) + 1e-9, 4) AS target_rate
      |  FROM src, tot),
      |samp AS (SELECT t.doc_id, t.source, r.target_rate,
      |    CASE WHEN CAST(CONCAT('0x', SUBSTR(MD5(CAST(t.doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
      |         < FLOOR(r.target_rate * 65536 + 1e-9) THEN 1 ELSE 0 END AS picked
      |  FROM tok t JOIN rates r ON t.source = r.source)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(picked) AS BIGINT) AS n_sampled,
      |  MAX(target_rate) AS target_rate,
      |  ROUND(SUM(picked) * 1.0 / COUNT(*) + 1e-9, 4) AS realized_rate
      |FROM samp GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    val tok = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        size(graft.functions.Text.tokens(col("text"))).as("n_tok"))
    // persisted + eagerly materialized: src feeds BOTH the totals and
    // the rate table — without the cache each branch re-scans documents
    // (sources-sized: ~1 row per source)
    val src = tok.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .persist()
    src.count()
    val tot = src.agg(sum(col("n_tokens")).as("total"), count(lit(1)).as("n_sources"))
    val rates = src.join(broadcast(tot))
      .select(col("source"), graft.QueryDef.roundBiased(
        least(lit(0.5) * (lit(1.0) / col("n_sources")) /
          (col("n_tokens") * lit(1.0) / col("total")), lit(1.0)), 4).as("target_rate"))
    val hex4 = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long")
    val picked = when(hex4 < floor(col("target_rate") * 65536 + 1e-9), 1).otherwise(0)
    tok.join(broadcast(rates), "source")
      .select(col("source"), col("target_rate"), picked.as("picked"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("picked")).as("n_sampled"),
        max(col("target_rate")).as("target_rate"),
        graft.QueryDef.roundBiased(sum(col("picked")) * lit(1.0) / count(lit(1)), 4)
          .as("realized_rate"))
      .orderBy(col("source"))
  }

  /** p04: deterministic global SHUFFLE + SHARD layout — the last step
    * of a curation pipeline: training wants documents in pseudo-random
    * order, split into fixed shards, reproducibly on any engine/run
    * (no RNG state, like q21's sampler). The shuffle key is
    * md5(doc_id); the shard is the key's first hex nibble (16 shards);
    * within a shard the key ordering IS the shuffled read order.
    *
    * 100 TB shape: shard assignment is a zero-shuffle map-side
    * projection; the physical layout is one repartitionByRange on
    * (shard, key) with in-partition sort — a single range shuffle
    * writes every shard already in shuffled order. Never a global
    * single-partition ROW_NUMBER: the within-shard order is carried by
    * the sort key itself, not a counter. The md5 key is uniform, so
    * shards are balanced by construction (the per-shard counts this
    * query emits are the balance check). */
  val p04 = QueryDef(
    "p04_shuffle_shard",
    """WITH d AS (SELECT doc_id, source,
      |    LEN(STRING_SPLIT(text, ' ')) AS n_tok,
      |    MD5(CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents),
      |s AS (SELECT *,
      |    CAST(STRPOS('0123456789abcdef', SUBSTR(k, 1, 1)) - 1 AS INTEGER) AS shard
      |  FROM d)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  MIN(k) AS first_key, ARG_MIN(doc_id, k) AS first_doc
      |FROM s GROUP BY shard ORDER BY shard""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        size(Text.tokens(col("text"))).as("n_tok"),
        md5(col("doc_id").cast("string")).as("k"))
      .withColumn("shard", conv(substring(col("k"), 1, 1), 16, 10).cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("k")).as("first_key"), min_by(col("doc_id"), col("k")).as("first_doc"))
      .orderBy(col("shard"))
  }

  /** p05: cross-modal SEMANTIC curation — the SemDeDup pipeline end to
    * end: documents are deduplicated by the MEANING of their paired
    * embeddings (vec_id ≡ doc_id in the test corpus), composing s09's
    * cell-bounded cosine pairs with d06's min-label connected
    * components so transitive paraphrase chains A~B~C collapse to ONE
    * representative (pair-dropping would over-prune B AND C). Output
    * is the per-source fate tally of the corpus.
    *
    * 100 TB shape: inherits s09's zero-shuffle cell assignment and
    * capped within-cell pairing, plus d06's edge-sized iterative
    * shuffles; the final fate join is a broadcast of the dropped-id
    * list (bounded by the pair population, ≪ corpus). Oracle: the s09
    * assignment/pairing SQL + the d06 recursive reachability CTE. */
  val p05 = QueryDef(
    "p05_semantic_curation",
    """WITH RECURSIVE
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
      |assign AS (SELECT vec_id, v, cid FROM (
      |  SELECT e.vec_id, e.v, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                       ORDER BY LIST_COSINE_SIMILARITY(e.v, c.cv) DESC, c.cid) AS rn
      |  FROM e CROSS JOIN cent c) t WHERE rn = 1),
      |capped AS (SELECT vec_id, v, cid FROM (
      |  SELECT *, COUNT(*) OVER (PARTITION BY cid) AS csz FROM assign) t
      |  WHERE csz <= 256),
      |pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2
      |  FROM capped a JOIN capped b ON a.cid = b.cid AND a.vec_id < b.vec_id
      |  WHERE LIST_COSINE_SIMILARITY(a.v, b.v) >= 0.4),
      |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
      |          UNION SELECT id2, id1 FROM pairs),
      |reach AS (
      |  SELECT DISTINCT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT reach.id, e2.dst AS r FROM reach JOIN edges e2 ON reach.r = e2.src),
      |clusters AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      |dropped AS (SELECT id FROM clusters WHERE cluster_id < id)
      |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(dr.id) AS BIGINT) AS n_sem_dup,
      |  CAST(COUNT(*) - COUNT(dr.id) AS BIGINT) AS n_kept
      |FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.id
      |GROUP BY d.source ORDER BY d.source""".stripMargin) { (spark, dir) =>
    val pairs = Similarity.semanticPairs(spark, dir).select(col("id1"), col("id2"))
    // min-label connected components: the cluster representative is the
    // min id, every other member is a semantic duplicate
    val clusters = Dedup.dupClusters(pairs)
    val dropped = clusters.filter(col("cluster_id") < col("doc_id"))
      .select(col("doc_id"), lit(1).as("dr"))
    Tables(spark, dir).documents.select(col("doc_id"), col("source"))
      .join(broadcast(dropped), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("dr")).as("n_sem_dup"),
        (count(lit(1)) - count(col("dr"))).as("n_kept"))
      .orderBy(col("source"))
  }

  /** p06: deterministic train/val/test SPLIT — the q21 sampler turned
    * into a partition: each document lands in a split by the
    * lexicographic range of its md5(doc_id) prefix (train < 'cc' ≈
    * 80%, val < 'e6' ≈ 10%, test otherwise), so membership is a pure
    * function of the id — stable when the corpus grows, reproducible
    * on any engine, and disjoint/complete by construction (spec).
    * Per-source tallies surface stratification balance.
    *
    * 100 TB shape: the split is a map-side projection (no RNG state,
    * no global count prepass — percentile-based splits need one);
    * only the (source, split) tally shuffles. */
  val p06 = QueryDef(
    "p06_dataset_split",
    """WITH d AS (SELECT source, SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) AS pk
      |  FROM documents),
      |s AS (SELECT source,
      |    CASE WHEN pk < 'cc' THEN 'train'
      |         WHEN pk < 'e6' THEN 'val' ELSE 'test' END AS split
      |  FROM d)
      |SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM s GROUP BY source, split ORDER BY source, split""".stripMargin) { (spark, dir) =>
    val pk = substring(md5(col("doc_id").cast("string")), 1, 2)
    Tables(spark, dir).documents
      .select(col("source"),
        when(pk < "cc", "train").when(pk < "e6", "val").otherwise("test").as("split"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("split"))
  }

  /** p07: TOKEN-BUDGET selection — "take the best documents until the
    * token budget is spent", the data-selection step that turns scores
    * (t02 quality here; t16 DSIR weights in production) into an actual
    * training set. A doc is kept iff the docs strictly before it in
    * (quality DESC, doc_id) order total fewer tokens than the budget
    * (25% of corpus tokens), so the boundary doc that crosses the
    * budget is the last one in.
    *
    * 100 TB shape — the naive formulation is a GLOBAL window cumsum
    * (one partition = one executor does all the work). Instead, the
    * selection runs as histogram → threshold → boundary refinement:
    * (1) one partial-agg shuffle builds the token mass per quality
    * VALUE — the 1e-4 rounding grid bounds this table at ~10k rows
    * regardless of corpus size, so its cumsum is driver-scale;
    * (2) groups whose preceding mass already fits the budget are kept
    * wholesale via a broadcast join (map-side); (3) only the in-group
    * prefix sum runs as a real window, partitioned by quality — never
    * a single-partition global sort. The spec proves the three-phase
    * answer equals the naive global cumsum; the DuckDB oracle IS the
    * naive global cumsum. */
  val p07 = QueryDef(
    "p07_token_budget",
    """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS n_tokens,
      |    ROUND(LEAST(LEN(toks) / 200.0, 1.0) * 0.4 +
      |      (1.0 - CAST(LEN(LIST_FILTER(toks, x -> x IN ('a', 'the'))) AS DOUBLE)
      |        / LEN(toks)) * 0.6 + 1e-9, 4) AS quality
      |  FROM t),
      |b AS (SELECT CAST(FLOOR(0.25 * SUM(n_tokens)) AS BIGINT) AS budget FROM s),
      |c AS (SELECT *, SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
      |    ROWS UNBOUNDED PRECEDING) AS cum FROM s)
      |SELECT doc_id, n_tokens, quality FROM c, b
      |WHERE cum - n_tokens < budget ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val toks = Text.tokens(col("text"))
    val nToks = size(toks)
    val stopRatio = Text.countIn(toks, Seq("a", "the")).cast("double") / nToks
    val scored = Tables(spark, dir).documents
      .select(col("doc_id"), nToks.cast("long").as("n_tokens"),
        graft.QueryDef.roundBiased(
          least(nToks / lit(200.0), lit(1.0)) * 0.4 + (lit(1.0) - stopRatio) * 0.6, 4)
          .as("quality"))
      .persist() // feeds the histogram AND the per-doc selection
    // (1) token mass per quality value — bounded by the 1e-4 grid
    val hist = scored.groupBy(col("quality")).agg(sum(col("n_tokens")).as("mass"))
    // single-partition window is safe HERE: hist is grid-bounded (~10k
    // rows at any corpus size), not corpus-sized
    val wq = Window.orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = hist.agg(floor(lit(0.25) * sum(col("mass"))).cast("long").as("budget"))
    val qualifying = hist
      .withColumn("cum_before", coalesce(sum(col("mass")).over(wq), lit(0L)))
      .crossJoin(broadcast(budget))
      .filter(col("cum_before") < col("budget"))
      .select(col("quality"), col("cum_before"), col("budget"))
    // (2)+(3) groups under budget join map-side; only the in-group
    // prefix needs a (quality-partitioned) window
    val wd = Window.partitionBy(col("quality")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.join(broadcast(qualifying), "quality")
      .withColumn("s_incl", sum(col("n_tokens")).over(wd))
      .filter(col("cum_before") + col("s_incl") - col("n_tokens") < col("budget"))
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** p08: CURRICULUM ordering (Bengio et al. 2009 — public): lay the
    * corpus out easy → hard for training, here by document length
    * (the classic simple curriculum), in four equal-frequency PHASES
    * with a deterministic shuffle inside each phase.
    *
    * Scale shape — no global sort anywhere: phase boundaries come from
    * an exact INTEGER histogram of token counts (bounded by distinct
    * lengths, not corpus size — p07's grid trick with no rounding at
    * all), cumulative counts stay integer (cum·4 ≥ N·k, never a
    * fractional quantile), the three thresholds broadcast, and phase
    * assignment is a map-side comparison. Within-phase order is
    * CARRIED BY THE SORT KEY (md5 of the doc id — p04's discipline:
    * position materializes at write time via repartitionByRange(phase,
    * key), never a corpus-wide row_number). Docs sharing a boundary
    * length always land in the lower phase, so phases are clean
    * disjoint length intervals. */
  val p08 = QueryDef(
    "p08_curriculum",
    """WITH s AS (SELECT doc_id,
      |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok FROM documents),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM s),
      |h AS (SELECT n_tok, COUNT(*) AS cnt FROM s GROUP BY n_tok),
      |c AS (SELECT n_tok, SUM(cnt) OVER (ORDER BY n_tok
      |    ROWS UNBOUNDED PRECEDING) AS cum FROM h),
      |t AS (SELECT
      |    MIN(CASE WHEN cum * 4 >= total * 1 THEN n_tok END) AS t1,
      |    MIN(CASE WHEN cum * 4 >= total * 2 THEN n_tok END) AS t2,
      |    MIN(CASE WHEN cum * 4 >= total * 3 THEN n_tok END) AS t3
      |  FROM c, n)
      |SELECT s.doc_id,
      |  CAST(1 + (s.n_tok > t.t1)::INT + (s.n_tok > t.t2)::INT
      |    + (s.n_tok > t.t3)::INT AS INTEGER) AS phase,
      |  s.n_tok, MD5(CAST(s.doc_id AS VARCHAR)) AS ord
      |FROM s, t ORDER BY phase, ord, doc_id""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir).documents
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tok"))
      .persist() // feeds the histogram AND the per-doc assignment
    val hist = s.groupBy(col("n_tok")).agg(count(lit(1)).as("cnt"))
    // single-partition window is safe HERE: the histogram is bounded
    // by distinct lengths (~thousands), not corpus size
    val wc = Window.orderBy(col("n_tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(wc))
      .crossJoin(broadcast(s.agg(count(lit(1)).as("total"))))
    val thresholds = cum.agg(
      min(when(col("cum") * 4 >= col("total") * 1, col("n_tok"))).as("t1"),
      min(when(col("cum") * 4 >= col("total") * 2, col("n_tok"))).as("t2"),
      min(when(col("cum") * 4 >= col("total") * 3, col("n_tok"))).as("t3"))
    s.crossJoin(broadcast(thresholds))
      .select(col("doc_id"),
        (lit(1) + (col("n_tok") > col("t1")).cast("int")
          + (col("n_tok") > col("t2")).cast("int")
          + (col("n_tok") > col("t3")).cast("int")).as("phase"),
        col("n_tok"), md5(col("doc_id").cast("string")).as("ord"))
      .orderBy(col("phase"), col("ord"), col("doc_id"))
  }

  /** p09: EPOCH-CAPPED token allocation — "Scaling Data-Constrained
    * Language Models" (Muennighoff et al. 2023) operationalized: a
    * token budget (2× the corpus here) is spread across domains as
    * evenly as possible, but no domain may repeat beyond 4 epochs —
    * beyond that, repetition stops helping, so a small domain's
    * surplus share must REDISTRIBUTE to the domains that still have
    * headroom (water-filling with per-domain caps).
    *
    * Exactness: the entire allocation is INTEGER arithmetic. Sorting
    * domains by cap (= 4·n_d), the capped set is provably a PREFIX:
    * domain k caps iff cap_k·(D−k+1) + cumcap_{k−1} ≤ B (giving every
    * remaining domain cap_k still fits), all integers. The survivors
    * split the remaining budget by integer division, the remainder
    * going one token each to the first (cap, source)-ranked survivors
    * — so Σalloc = B exactly and both engines agree bit-for-bit.
    *
    * 100 TB shape: ONE corpus partial-agg shuffle to domain token
    * counts; every window runs on the DOMAIN-cardinality table (tens
    * of rows — p07's bounded-grid argument), never the corpus. */
  val p09 = QueryDef(
    "p09_epoch_alloc",
    """WITH s AS (SELECT source,
      |    CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n
      |  FROM documents GROUP BY source),
      |g AS (SELECT CAST(2 * SUM(n) AS BIGINT) AS b,
      |    CAST(COUNT(*) AS BIGINT) AS d FROM s),
      |o AS (SELECT source, n, 4 * n AS cap,
      |    CAST(ROW_NUMBER() OVER (ORDER BY 4 * n, source) AS BIGINT) AS k,
      |    CAST(SUM(4 * n) OVER (ORDER BY 4 * n, source
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumcap
      |  FROM s),
      |f AS (SELECT o.*, b, d,
      |    (cap * (d - k + 1) + cumcap - cap <= b) AS capped FROM o, g),
      |a AS (SELECT COALESCE(MAX(CASE WHEN capped THEN k END), 0) AS kk,
      |    COALESCE(MAX(CASE WHEN capped THEN cumcap END), 0) AS cc FROM f),
      |r AS (SELECT source, n, cap,
      |    CAST(CASE WHEN capped OR d = kk THEN cap
      |      ELSE (b - cc) // (d - kk)
      |        + CASE WHEN k - kk <= (b - cc) % (d - kk) THEN 1 ELSE 0 END
      |    END AS BIGINT) AS alloc
      |  FROM f, a)
      |SELECT source, n AS n_tokens, cap, alloc,
      |  ROUND(CAST(alloc AS DOUBLE) / n + 1e-9, 4) AS epochs
      |FROM r ORDER BY source""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir).documents
      .groupBy(col("source"))
      .agg(sum(size(Text.tokens(col("text")))).cast("long").as("n"))
    val g = s.agg((lit(2) * sum(col("n"))).cast("long").as("b"),
      count(lit(1)).cast("long").as("d"))
    // single-partition window is safe HERE: the table is domain-sized
    // (tens of rows at any corpus scale), not corpus-sized
    val wo = Window.orderBy(col("cap"), col("source"))
    val o = s.withColumn("cap", col("n") * 4)
      .withColumn("k", row_number().over(wo).cast("long"))
      .withColumn("cumcap",
        sum(col("cap")).over(wo.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val f = o.crossJoin(broadcast(g))
      .withColumn("capped",
        col("cap") * (col("d") - col("k") + 1) + col("cumcap") - col("cap") <= col("b"))
      .persist() // domain-sized; feeds the boundary agg AND the output
    val a = f.agg(
      coalesce(max(when(col("capped"), col("k"))), lit(0L)).as("kk"),
      coalesce(max(when(col("capped"), col("cumcap"))), lit(0L)).as("cc"))
    f.crossJoin(broadcast(a))
      .withColumn("alloc",
        when(col("capped") || col("d") === col("kk"), col("cap"))
          .otherwise(expr("(b - cc) div (d - kk)") +
            when(col("k") - col("kk") <= expr("(b - cc) % (d - kk)"), 1L)
              .otherwise(0L)).cast("long"))
      .select(col("source"), col("n").as("n_tokens"), col("cap"), col("alloc"),
        graft.QueryDef.roundBiased(col("alloc").cast("double") / col("n"), 4)
          .as("epochs"))
      .orderBy(col("source"))
  }

  /** p10: TEMPERATURE-scaled mixture sampling — the multilingual /
    * multi-source mixing recipe (mT5's τ-smoothed multinomial):
    * source weights w_s ∝ (tokens_s)^τ with τ = 0.5, so
    * low-resource sources are up-weighted relative to their natural
    * share without drowning the head. The token budget is 50% of the
    * corpus; each source's target rate is min(1, B·w_s/(Σw·tokens_s))
    * and realization is p03's deterministic md5 threshold coin —
    * reproducible on any engine, no RNG state.
    *
    * p03 is the UNIFORM-target special case (τ = 0); p10 is the tuned
    * production knob between natural sampling (τ = 1) and uniform.
    * Same scale shape as p03: per-source stats are a sources-sized
    * table, rates broadcast back, the coin is map-side. The rate is
    * fixed on the 1e-4 decimal grid BEFORE the coin so the threshold
    * comparison is integer-exact cross-engine (sqrt itself is IEEE
    * correctly-rounded on both engines). */
  val p10 = QueryDef(
    "p10_temperature_mix",
    """WITH tok AS (SELECT doc_id, source,
      |    LEN(STRING_SPLIT(text, ' ')) AS n_tok FROM documents),
      |src AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM tok GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
      |    CAST(SUM(CAST(ROUND(SQRT(n_tokens) + 1e-9, 6)
      |      AS DECIMAL(38,6))) AS DOUBLE) AS sum_w FROM src),
      |rates AS (SELECT source, n_docs, n_tokens,
      |    ROUND(SQRT(n_tokens) / sum_w + 1e-9, 6) AS weight,
      |    ROUND(LEAST((0.5 * total) * (SQRT(n_tokens) / sum_w)
      |      / n_tokens, 1.0) + 1e-9, 4) AS target_rate
      |  FROM src, tot),
      |samp AS (SELECT t.doc_id, t.source, t.n_tok, r.target_rate,
      |    CASE WHEN CAST(CONCAT('0x', SUBSTR(MD5(CAST(t.doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
      |         < FLOOR(r.target_rate * 65536 + 1e-9) THEN 1 ELSE 0 END AS picked
      |  FROM tok t JOIN rates r ON t.source = r.source)
      |SELECT s.source, r.n_docs, r.n_tokens, r.weight, r.target_rate,
      |  CAST(SUM(s.picked) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN s.picked = 1 THEN s.n_tok ELSE 0 END) AS BIGINT)
      |    AS sampled_tokens
      |FROM samp s JOIN rates r ON s.source = r.source
      |GROUP BY s.source, r.n_docs, r.n_tokens, r.weight, r.target_rate
      |ORDER BY s.source""".stripMargin) { (spark, dir) =>
    val tok = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        size(graft.functions.Text.tokens(col("text"))).as("n_tok"))
    val src = tok.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .persist()
    src.count()
    val tot = src.agg(sum(col("n_tokens")).as("total"),
      // each sqrt term on the 6-dec grid, summed as DECIMAL — the
      // t24/q35 order-free discipline (a raw double sum's value
      // depends on accumulation order, which differs cross-engine)
      sum(round(sqrt(col("n_tokens")) + 1e-9, 6).cast("decimal(38,6)"))
        .cast("double").as("sum_w"))
    val rates = src.join(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        graft.QueryDef.roundBiased(sqrt(col("n_tokens")) / col("sum_w"), 6)
          .as("weight"),
        graft.QueryDef.roundBiased(
          least(lit(0.5) * col("total") * (sqrt(col("n_tokens")) / col("sum_w"))
            / col("n_tokens"), lit(1.0)), 4).as("target_rate"))
    val hex4 = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long")
    val picked = when(hex4 < floor(col("target_rate") * 65536 + 1e-9), 1).otherwise(0)
    tok.join(broadcast(rates), "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        col("target_rate"), picked.as("picked"), col("n_tok"))
      .groupBy(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        col("target_rate"))
      .agg(sum(col("picked")).cast("long").as("n_sampled"),
        sum(when(col("picked") === 1, col("n_tok")).otherwise(0L)).as("sampled_tokens"))
      .orderBy(col("source"))
  }

  /** p11: DEDUP-AWARE temperature mixture — p10's τ=0.5 multinomial
    * with the per-source mass measured in EFFECTIVE tokens: every
    * doc's tokens are weighted by d14's soft-dedup mass (1/n_copies in
    * integer ppm, floor-exact), so a source bloated by boilerplate
    * duplicates no longer buys rate with repeated content — the
    * production wiring between the dedup index and the mixture
    * sampler (a crawl with 10× copies of one page contributes that
    * page's tokens once to its source's weight). Effective mass stays
    * in exact integer MICRO-tokens (n_tok × ppm — products of
    * integers) all the way to the one SQRT both engines evaluate on
    * the same bigint; rates land on the 4-decimal grid BEFORE the
    * p03/p10 md5 coin.
    *
    * Plan: ONE md5-group partial agg (d14's), corpus equi-join on the
    * content hash (AQE-split, never a hash window), source-sized
    * stats, broadcast totals/rates, map-side coin + final source agg. */
  val p11 = QueryDef(
    "p11_dedup_mixture",
    """WITH tok AS (SELECT doc_id, source, MD5(text) AS h,
      |    LEN(STRING_SPLIT(text, ' ')) AS n_tok FROM documents),
      |g AS (SELECT MD5(text) AS h, COUNT(*) AS n_copies
      |  FROM documents GROUP BY 1),
      |d AS (SELECT t.doc_id, t.source, t.n_tok,
      |    CAST(t.n_tok * (1000000 // g.n_copies) AS BIGINT) AS eff
      |  FROM tok t JOIN g USING (h)),
      |src AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |    CAST(SUM(eff) AS BIGINT) AS eff_micro FROM d GROUP BY source),
      |tot AS (SELECT CAST(SUM(eff_micro) AS BIGINT) AS total_eff,
      |    CAST(SUM(CAST(ROUND(SQRT(eff_micro) + 1e-9, 6)
      |      AS DECIMAL(38,6))) AS DOUBLE) AS sum_w FROM src),
      |rates AS (SELECT source, n_docs, n_tokens, eff_micro,
      |    ROUND(SQRT(eff_micro) / sum_w + 1e-9, 6) AS weight,
      |    ROUND(LEAST((0.5 * total_eff) * (SQRT(eff_micro) / sum_w)
      |      / eff_micro, 1.0) + 1e-9, 4) AS target_rate
      |  FROM src, tot),
      |samp AS (SELECT dd.doc_id, dd.source, dd.n_tok, r.target_rate,
      |    CASE WHEN CAST(CONCAT('0x', SUBSTR(MD5(CAST(dd.doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
      |         < FLOOR(r.target_rate * 65536 + 1e-9) THEN 1 ELSE 0 END AS picked
      |  FROM d dd JOIN rates r ON dd.source = r.source)
      |SELECT s.source, r.n_docs, r.n_tokens, r.eff_micro, r.weight,
      |  r.target_rate,
      |  CAST(SUM(s.picked) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN s.picked = 1 THEN s.n_tok ELSE 0 END) AS BIGINT)
      |    AS sampled_tokens
      |FROM samp s JOIN rates r ON s.source = r.source
      |GROUP BY s.source, r.n_docs, r.n_tokens, r.eff_micro, r.weight,
      |  r.target_rate
      |ORDER BY s.source""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir).documents
    val tok = docs.select(col("doc_id"), col("source"),
      md5(col("text")).as("h"),
      size(graft.functions.Text.tokens(col("text"))).as("n_tok"))
    val g = docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_copies"))
    val d = tok.join(g, "h")
      .select(col("doc_id"), col("source"), col("n_tok"),
        (col("n_tok").cast("long") *
          floor(lit(1000000L) / col("n_copies"))).as("eff"))
      .persist()
    val src = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("eff")).as("eff_micro"))
      .persist()
    src.count()
    val tot = src.agg(sum(col("eff_micro")).as("total_eff"),
      // 6-dec grid per sqrt term, DECIMAL sum (order-free, see p10)
      sum(round(sqrt(col("eff_micro")) + 1e-9, 6).cast("decimal(38,6)"))
        .cast("double").as("sum_w"))
    val rates = src.join(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("eff_micro"),
        graft.QueryDef.roundBiased(sqrt(col("eff_micro")) / col("sum_w"), 6)
          .as("weight"),
        graft.QueryDef.roundBiased(
          least(lit(0.5) * col("total_eff") *
            (sqrt(col("eff_micro")) / col("sum_w")) / col("eff_micro"),
            lit(1.0)), 4).as("target_rate"))
    val hex4 = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long")
    val picked = when(hex4 < floor(col("target_rate") * 65536 + 1e-9), 1).otherwise(0)
    d.join(broadcast(rates), "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("eff_micro"),
        col("weight"), col("target_rate"), picked.as("picked"), col("n_tok"))
      .groupBy(col("source"), col("n_docs"), col("n_tokens"), col("eff_micro"),
        col("weight"), col("target_rate"))
      .agg(sum(col("picked")).cast("long").as("n_sampled"),
        sum(when(col("picked") === 1, col("n_tok")).otherwise(0L))
          .as("sampled_tokens"))
      .orderBy(col("source"))
  }

  /** p12: LOGISTIC-REGRESSION quality model — distributed batch
    * gradient descent, the supervised counterpart to t19's
    * count-based classifier and the second trained model beside s05's
    * k-means: 3 full-batch GD steps (lr = 1) on two grid-rounded doc
    * features (token count / 500, char count / 2000, both capped) with
    * label `lang = 'en'`, emitting each iteration's weights and
    * training accuracy — the convergence trajectory, not just the fit.
    *
    * Iteration discipline (s05's): every cross-engine float hazard is
    * pinned to a grid — features biased-rounded to 4 decimals;
    * per-row gradient terms (p − y)·x to 8 decimals then summed as
    * DECIMAL(18,8) (order-free — t24's stance); the mean gradient and
    * updated weights to 6 decimals per step (drift cannot compound);
    * accuracy compares the 6-dec-rounded probability against 0.5.
    * EXP parity is the t08 ln convention.
    *
    * Plan: the feature table persists and is scanned once per step
    * (gradient agg) plus once for accuracy — each a map-side-combined
    * partial agg to ONE row; weights travel as literals (s05's
    * collect-and-inline), so no join, no shuffle beyond the 1-row
    * aggs. 100 TB story: each GD step is one pass of pure codegen'd
    * arithmetic — exactly how full-batch distributed GD should look. */
  /** SQL sigmoid over the p12 feature columns. Shared by p12/p14. */
  private def logregSigmoidSql(w1: String, w2: String, w0: String) =
    s"1.0 / (1.0 + EXP(-($w1 * x1 + $w2 * x2 + $w0)))"

  /** The p12 gradient-descent CTE chain — features `f`, corpus count
    * `n`, three grid-pinned GD rounds ending in weights `wt3`. Shared
    * VERBATIM by the p12 (training trajectory) and p14 (calibration)
    * oracles so the model they evaluate can never drift apart. */
  private val logregChainSql: String = {
    def p = logregSigmoidSql _
    def gradCte(name: String, w1: String, w2: String, w0: String,
        prevTable: String) =
      s"""$name AS (SELECT
         |    ROUND(CAST(SUM(CAST(ROUND((${p(w1, w2, w0)} - y) * x1 + 1e-9, 8)
         |      AS DECIMAL(18,8))) AS DOUBLE) / n.n + 1e-9, 6) AS gx1,
         |    ROUND(CAST(SUM(CAST(ROUND((${p(w1, w2, w0)} - y) * x2 + 1e-9, 8)
         |      AS DECIMAL(18,8))) AS DOUBLE) / n.n + 1e-9, 6) AS gx2,
         |    ROUND(CAST(SUM(CAST(ROUND((${p(w1, w2, w0)} - y) + 1e-9, 8)
         |      AS DECIMAL(18,8))) AS DOUBLE) / n.n + 1e-9, 6) AS gx0
         |  FROM f, n${if (prevTable.isEmpty) "" else ", " + prevTable}
         |  GROUP BY n.n)""".stripMargin
    // (prevTable threads the prior iteration's weight CTE into each
    // gradient's FROM clause)
    s"""f AS (SELECT
       |    ROUND(LEAST(LEN(STRING_SPLIT(text, ' ')), 500) / 500.0 + 1e-9, 4)
       |      AS x1,
       |    ROUND(LEAST(LENGTH(text), 2000) / 2000.0 + 1e-9, 4) AS x2,
       |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents),
       |n AS (SELECT COUNT(*) AS n FROM f),
       |${gradCte("g1", "0.0", "0.0", "0.0", "")},
       |wt1 AS (SELECT ROUND(0.0 - gx1 + 1e-9, 6) + 0.0 AS w1,
       |  ROUND(0.0 - gx2 + 1e-9, 6) + 0.0 AS w2,
       |  ROUND(0.0 - gx0 + 1e-9, 6) + 0.0 AS w0 FROM g1),
       |${gradCte("g2", "wt1.w1", "wt1.w2", "wt1.w0", "wt1")},
       |wt2 AS (SELECT ROUND(wt1.w1 - gx1 + 1e-9, 6) + 0.0 AS w1,
       |  ROUND(wt1.w2 - gx2 + 1e-9, 6) + 0.0 AS w2,
       |  ROUND(wt1.w0 - gx0 + 1e-9, 6) + 0.0 AS w0 FROM wt1, g2),
       |${gradCte("g3", "wt2.w1", "wt2.w2", "wt2.w0", "wt2")},
       |wt3 AS (SELECT ROUND(wt2.w1 - gx1 + 1e-9, 6) + 0.0 AS w1,
       |  ROUND(wt2.w2 - gx2 + 1e-9, 6) + 0.0 AS w2,
       |  ROUND(wt2.w0 - gx0 + 1e-9, 6) + 0.0 AS w0 FROM wt2, g3)""".stripMargin
  }

  /** The p12 feature frame (x1, x2, y) over a documents table. */
  private def logregFeatures(docs: DataFrame): DataFrame =
    docs.select(
      graft.QueryDef.roundBiased(
        least(size(graft.functions.Text.tokens(col("text"))), lit(500))
          .cast("double") / 500.0, 4).as("x1"),
      graft.QueryDef.roundBiased(
        least(length(col("text")), lit(2000)).cast("double") / 2000.0, 4)
        .as("x2"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))

  private def logregRound6(x: Double): Double =
    java.math.BigDecimal.valueOf(x + 1e-9)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Sigmoid Column for driver-held weights (s05's collect-and-inline
    * trainer-state discipline). */
  private def logregProb(w: (Double, Double, Double)) =
    lit(1.0) / (lit(1.0) +
      exp(-(lit(w._1) * col("x1") + lit(w._2) * col("x2") + lit(w._3))))

  /** Run the 3-round grid-pinned GD over a PERSISTED feature frame;
    * returns the weight trajectory. Each round is one map-side-combined
    * 1-row gradient agg; weights travel back as literals. */
  private def logregTrain(f: DataFrame, n: Long,
      iters: Int = 3): Seq[(Int, (Double, Double, Double))] = {
    var w = (0.0, 0.0, 0.0)
    (1 to iters).map { it =>
      val pc = logregProb(w)
      def term(xc: org.apache.spark.sql.Column) =
        sum(round((pc - col("y")) * xc + 1e-9, 8).cast("decimal(18,8)"))
      val g = f.agg(term(col("x1")).as("s1"), term(col("x2")).as("s2"),
          term(lit(1.0)).as("s0")).collect()(0)
      def grad(i: Int) = logregRound6(g.getDecimal(i).doubleValue() / n)
      w = (logregRound6(w._1 - grad(0)), logregRound6(w._2 - grad(1)),
        logregRound6(w._3 - grad(2)))
      (it, w)
    }
  }

  val p12 = QueryDef(
    "p12_quality_logreg",
    {
      def p = logregSigmoidSql _
      def accCte(name: String, wt: String) =
        s"""$name AS (SELECT CAST(COUNT(*) FILTER (WHERE
           |    (CASE WHEN ROUND(${p(s"$wt.w1", s"$wt.w2", s"$wt.w0")} + 1e-9, 6)
           |       >= 0.5 THEN 1.0 ELSE 0.0 END) = y) AS BIGINT) AS n_correct
           |  FROM f, $wt)""".stripMargin
      s"""WITH $logregChainSql,
         |${accCte("a1", "wt1")},
         |${accCte("a2", "wt2")},
         |${accCte("a3", "wt3")}
         |SELECT 1 AS iter, w1, w2, w0,
         |  (SELECT n_correct FROM a1) AS n_correct FROM wt1
         |UNION ALL SELECT 2, w1, w2, w0, (SELECT n_correct FROM a2) FROM wt2
         |UNION ALL SELECT 3, w1, w2, w0, (SELECT n_correct FROM a3) FROM wt3
         |ORDER BY iter""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    val f = logregFeatures(Tables(spark, dir).documents).persist()
    val n = f.count()
    val rows = logregTrain(f, n).map { case (it, w) =>
      val nCorrect = f.filter(
        when(graft.QueryDef.roundBiased(logregProb(w), 6) >= 0.5, 1.0)
          .otherwise(0.0) === col("y")).count()
      (it, w._1, w._2, w._3, nCorrect)
    }
    f.unpersist()
    rows.toDF("iter", "w1", "w2", "w0", "n_correct")
      .orderBy(col("iter"))
  }

  /** p14: CALIBRATION of p12's trained classifier — the reliability
    * diagram + per-bin gap behind Expected Calibration Error (the
    * standard eval before a quality score gates real data: a model
    * predicting 0.9 must be right ~90% of the time, or its threshold
    * means nothing): score every doc with the round-3 weights, bin the
    * 6-dec-grid probability into 10 equal bins over the model's
    * OBSERVED score range (a weakly-trained model concentrates — this
    * one spans ~0.002 around 0.46, so absolute deciles collapse to one
    * row; range-normalized bins resolve the operating band while
    * staying a MAP-SIDE floor against one broadcast (lo, hi) row —
    * never the global NTILE sort q34's design note forbids), and
    * report each bin's count, mean predicted probability, empirical
    * positive rate, and their gap. ECE is the n-weighted sum of the
    * gap column.
    *
    * The oracle re-derives the FULL training chain ([[logregChainSql]],
    * shared verbatim with p12) then replays scoring and binning — the
    * evaluated model is the proven-identical one, not a re-fit.
    *
    * Determinism: phat sits on the 6-dec grid (the accCte convention)
    * before the decile floor, bin mean sums DECIMAL(18,6) grid terms
    * (order-free), y-sums are exact 0/1 doubles, gap =
    * |mean_pred − frac_pos| of two already-4-dec-rounded values
    * (exact). Plan: ONE corpus feature scan persisted (3 gradient
    * 1-row aggs + the scoring pass), then a 10-group agg. */
  val p14 = QueryDef(
    "p14_calibration",
    {
      val p = logregSigmoidSql("wt3.w1", "wt3.w2", "wt3.w0")
      s"""WITH $logregChainSql,
         |scored AS (SELECT ROUND($p + 1e-9, 6) AS phat, y FROM f, wt3),
         |r AS (SELECT MIN(phat) AS lo, MAX(phat) AS hi FROM scored),
         |b AS (SELECT CASE WHEN hi = lo THEN 0 ELSE
         |      LEAST(CAST(FLOOR((phat - lo) / (hi - lo) * 10) AS INTEGER), 9)
         |    END AS bin, phat, y FROM scored, r)
         |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  ROUND(CAST(SUM(CAST(ROUND(phat + 1e-9, 6) AS DECIMAL(18,6)))
         |    AS DOUBLE) / COUNT(*) + 1e-9, 4) AS mean_pred,
         |  ROUND(SUM(y) / COUNT(*) + 1e-9, 4) AS frac_pos,
         |  ABS(ROUND(CAST(SUM(CAST(ROUND(phat + 1e-9, 6) AS DECIMAL(18,6)))
         |      AS DOUBLE) / COUNT(*) + 1e-9, 4)
         |    - ROUND(SUM(y) / COUNT(*) + 1e-9, 4)) AS gap
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin
    }) { (spark, dir) =>
    val f = logregFeatures(Tables(spark, dir).documents).persist()
    val n = f.count()
    val w3 = logregTrain(f, n).last._2
    val scored = f.select(
      graft.QueryDef.roundBiased(logregProb(w3), 6).as("phat"), col("y"))
    val meanPred = graft.QueryDef.roundBiased(
      sum(round(col("phat") + 1e-9, 6).cast("decimal(18,6)")).cast("double") /
        count(lit(1)), 4)
    val fracPos = graft.QueryDef.roundBiased(sum(col("y")) / count(lit(1)), 4)
    val range = scored.agg(min(col("phat")).as("lo"), max(col("phat")).as("hi"))
    val out = scored
      .join(broadcast(range))
      .withColumn("bin",
        when(col("hi") === col("lo"), 0).otherwise(
          least(floor((col("phat") - col("lo")) / (col("hi") - col("lo")) * 10)
            .cast("int"), lit(9))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), meanPred.as("mean_pred"),
        fracPos.as("frac_pos"), abs(meanPred - fracPos).as("gap"))
      .orderBy(col("bin"))
    // no eager unpersist: `out` is lazy and scores f twice (range row +
    // binning pass) — the harness owns the between-queries cache sweep
    out
  }

  /** p13: DATASET CARD — the per-source release-stats bundle every
    * corpus publication ships (HF dataset cards / data statements):
    * doc/token/char totals, English share and INTRA-source duplicate
    * ratio in floor-division ppm (exact), and mean t02 quality on the
    * t24 DECIMAL-grid discipline. The capstone composition: one corpus
    * scan computes every per-doc signal map-side, one source-keyed
    * agg (exact distinct-hash count rides Spark's two-phase distinct
    * aggregation) — the whole card in a single pass. */
  val p13 = QueryDef(
    "p13_dataset_card",
    """WITH t AS (SELECT doc_id, source, lang, MD5(text) AS h,
      |    LEN(STRING_SPLIT(text, ' ')) AS n_tok,
      |    LENGTH(text) AS n_chars,
      |    ROUND(LEAST(LEN(STRING_SPLIT(text, ' ')) / 200.0, 1.0) * 0.4 +
      |      (1.0 - CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
      |        x -> x IN ('a', 'the'))) AS DOUBLE)
      |        / LEN(STRING_SPLIT(text, ' '))) * 0.6 + 1e-9, 4) AS q
      |  FROM documents)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |  CAST(COUNT(*) FILTER (WHERE lang = 'en') * 1000000 // COUNT(*)
      |    AS BIGINT) AS en_ppm,
      |  CAST((COUNT(*) - COUNT(DISTINCT h)) * 1000000 // COUNT(*)
      |    AS BIGINT) AS dup_ppm,
      |  ROUND(CAST(SUM(CAST(q AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |    + 1e-9, 4) AS mean_quality
      |FROM t GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    val toks = Text.tokens(col("text"))
    val nToks = size(toks)
    val stopRatio = Text.countIn(toks, Seq("a", "the")).cast("double") / nToks
    val q = graft.QueryDef.roundBiased(
      least(nToks / 200.0, lit(1.0)) * 0.4 + (lit(1.0) - stopRatio) * 0.6, 4)
    val t = Tables(spark, dir).documents
      .select(col("source"), col("lang"), md5(col("text")).as("h"),
        nToks.as("n_tok"), length(col("text")).as("n_chars"), q.as("q"))
    t.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        count(when(col("lang") === "en", 1)).as("n_en"),
        countDistinct(col("h")).as("n_distinct"),
        sum(col("q").cast("decimal(18,4)")).as("q_sum"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        expr("CAST((n_en * 1000000) div n_docs AS BIGINT)").as("en_ppm"),
        expr("CAST(((n_docs - n_distinct) * 1000000) div n_docs AS BIGINT)")
          .as("dup_ppm"),
        graft.QueryDef.roundBiased(
          col("q_sum").cast("double") / col("n_docs"), 4).as("mean_quality"))
      .orderBy(col("source"))
  }

  /** p15: CONTAMINATION CARD — d08's decontamination scan rolled up
    * to the per-source audit table every dataset release ships (the
    * "benchmark overlap" section of a dataset card, p13's sibling):
    * per source, train-side doc count, how many documents d08 flags
    * (≥2 distinct eval 3-grams shared), the flagged rate as integer
    * ppm, and the worst document's overlap width. The oracle embeds
    * d08's SQL VERBATIM as a CTE and the Spark side aggregates d08's
    * definition — card and scan cannot disagree (the s20/p14 sharing
    * discipline).
    *
    * Scale rides d08's (gram equi-join, never all-pairs); the card
    * adds one doc-keyed join to recover sources and two source-sized
    * aggs. Sources with zero flags stay visible (LEFT join,
    * zero-filled). All-integer + floor-division ppm. */
  val p15 = QueryDef(
    "p15_contamination_card",
    s"""WITH fl AS (
       |${graft.operators.Dedup.d08.oracle.get}
       |),
       |src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM documents WHERE doc_id % 97 <> 0 GROUP BY 1),
       |fs AS (SELECT d.source AS source, CAST(COUNT(*) AS BIGINT) AS n_flagged,
       |    CAST(MAX(fl.n_overlap) AS BIGINT) AS max_overlap
       |  FROM fl JOIN documents d ON d.doc_id = fl.doc_id GROUP BY 1)
       |SELECT src.source AS source, src.n_docs,
       |  CAST(COALESCE(fs.n_flagged, 0) AS BIGINT) AS n_flagged,
       |  CAST(COALESCE(fs.n_flagged, 0) * 1000000 // src.n_docs AS BIGINT)
       |    AS flagged_ppm,
       |  CAST(COALESCE(fs.max_overlap, 0) AS BIGINT) AS max_overlap
       |FROM src LEFT JOIN fs USING (source)
       |ORDER BY source""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir).documents
    val fl = graft.operators.Dedup.d08.fn(spark, dir)
    val src = docs.filter(col("doc_id") % 97 =!= 0)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val fs = fl.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_flagged"), max(col("n_overlap")).as("max_overlap"))
    src.join(fs, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        expr("CAST((coalesce(n_flagged, 0) * 1000000) div n_docs AS BIGINT)")
          .as("flagged_ppm"),
        coalesce(col("max_overlap"), lit(0L)).as("max_overlap"))
      .orderBy(col("source"))
  }

  val all: Seq[QueryDef] = Seq(p01, p02, p03, p04, p05, p06, p07, p08, p09,
    p10, p11, p12, p13, p14, p15)
}
