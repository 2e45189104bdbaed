package graft

import graft.operators.{Scale, Temporal}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("scale-regression artifact: flagged set is empty (no super-linear query)") {
    // the artifact is produced by the dev-tool double-suite run
    // (runMain graft.BenchScale — sf0.1 AND the uniform ×10 corpus);
    // this spec gates on its RESULT so a super-linear regression fails
    // the build without paying the ~30 min run per test cycle
    // current round's artifact when rolled, else the committed
    // previous round's — the same resolution as the stall-gate twin
    // (r17 review: gating on the current path alone left the whole
    // bump-to-roll stretch ungated while the previous artifact could
    // still catch a super-linear regression)
    val f = BenchScale.newestArtifact()
      .getOrElse(fail(s"no bench-scale artifact in the tree — run " +
        s"graft.BenchScale to generate ${BenchScale.ArtifactPath}"))
    val txt = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
    val flagged = "\"flagged\":\\[(.*?)\\]".r
      .findFirstMatchIn(txt).map(_.group(1)).getOrElse("MISSING")
    assert(flagged == "",
      s"super-linear growth on the ×10 corpus (ratio > ${BenchScale.RatioGate}): $flagged")
    // and the in-round tripwire: no query slipped >2× vs the baseline
    // the RESOLVED artifact was diffed against (its embedded "prev"
    // field — when the gate falls back to the previous round's
    // artifact, ITS slips were measured against the round before it,
    // so citing this test run's PrevArtifactPath would point a
    // developer at the wrong baseline file; r17 review)
    val baseline = "\"prev\":\"(.*?)\"".r
      .findFirstMatchIn(txt).map(_.group(1)).getOrElse("<unstamped>")
    val slipped = "\"slipped\":\\[(.*?)\\]".r
      .findFirstMatchIn(txt).map(_.group(1)).getOrElse("MISSING")
    assert(slipped == "",
      s"per-query slip in ${f.getFileName} vs its baseline $baseline " +
        s"(> ${BenchScale.SlipGate}x): $slipped")
  }

  test("bench tripwire: slips() flags >2x per-query growth vs the previous artifact") {
    // parseQueries reads the artifact's per-query triples, NaN-tolerant
    val prevJson = """{"sf01_total":9.9,"flagged":[],"queries":{
      |"q_fast":[0.40,0.90,2.2],"q_big":[4.00,8.00,2.0],
      |"q_err":[1.00,NaN,NaN]}}""".stripMargin.replace("\n", "")
    val prev = BenchScale.parseQueries(prevJson)
    assert(prev == Map("q_fast" -> (0.40, 0.90), "q_big" -> (4.00, 8.00),
      "q_err" -> (1.00, Double.NaN)) ||
      (prev("q_err")._1 == 1.00 && prev("q_err")._2.isNaN && prev.size == 3))
    // a genuine 3x slip at sf0.1 flags; sub-floor noise and new
    // queries never do; a NaN baseline column is ignored
    val cur = Map(
      "q_big" -> (12.0, 9.0),   // 3x at sf0.1 → slipped
      "q_fast" -> (1.5, 1.8),   // grew but below the 2s floor at both
      "q_new" -> (50.0, 99.0),  // no baseline → never slips
      "q_err" -> (1.1, 500.0))  // only the NaN column grew → ignored
    assert(BenchScale.slips(cur, prev) == Seq("q_big"))
    // growth at the x10 scale alone also trips
    assert(BenchScale.slips(Map("q_big" -> (4.0, 17.0)), prev) == Seq("q_big"))
    // at or under the gate: quiet
    assert(BenchScale.slips(Map("q_big" -> (7.9, 15.9)), prev).isEmpty)
  }

  test("clean-twin resolution: current round's artifact wins, previous is the fallback") {
    // cleanTwinSf01 is the ONE resolution order Bench's stall gate and
    // the coverage gate below share (r15 verdict item 7: the logic
    // existed twice; a drift between the copies would arm the stall
    // tripwire against the wrong baseline)
    val dir = java.nio.file.Files.createTempDirectory("graft_twin_")
    val cur = dir.resolve("cur.json")
    val prev = dir.resolve("prev.json")
    java.nio.file.Files.write(prev,
      """{"queries":{"qa":[1.00,2.00,2.0],"qb":[3.00,6.00,2.0]}}""".getBytes("UTF-8"))
    // current missing → previous round's column is the twin
    assert(BenchScale.cleanTwinSf01(Seq(cur.toString, prev.toString)) ==
      Map("qa" -> 1.00, "qb" -> 3.00))
    // current present → it wins even when previous also exists
    java.nio.file.Files.write(cur,
      """{"queries":{"qa":[1.50,3.00,2.0]}}""".getBytes("UTF-8"))
    assert(BenchScale.cleanTwinSf01(Seq(cur.toString, prev.toString)) ==
      Map("qa" -> 1.50))
    // neither present → empty map, the stall check disarms quietly
    assert(BenchScale.cleanTwinSf01(
      Seq(dir.resolve("nope1.json").toString, dir.resolve("nope2.json").toString)).isEmpty)
  }

  test("a load-flagged driver bench artifact must be covered by a clean " +
      "same-round-or-newer BenchScale artifact") {
    // the driver's BENCH_rN run happens AFTER the session on a machine
    // the session can't keep quiet; when its in-run tripwire fires
    // (load_flag=true — the r15 artifact did, correctly), the round's
    // perf evidence must instead be a committed clean BenchScale twin
    // of the same round or newer — a contended driver run must never
    // stand as a round's ONLY performance artifact (r15 verdict item 7)
    val root = new java.io.File(".")
    val driverArtifacts = root.listFiles()
      .flatMap(f => "^BENCH_r(\\d+)\\.json$".r
        .findFirstMatchIn(f.getName).map(m => (m.group(1).toInt, f)))
    assume(driverArtifacts.nonEmpty, "no driver bench artifact in the tree")
    val (n, newest) = driverArtifacts.maxBy(_._1)
    val txt = new String(
      java.nio.file.Files.readAllBytes(newest.toPath), "UTF-8")
    // the driver wraps our one-line JSON in a "tail" string, so the
    // flag appears quote-escaped; accept both encodings
    val flagged = """load_flag\\?":\s*(true|false)""".r
      .findFirstMatchIn(txt).exists(_.group(1) == "true")
    if (flagged) {
      val cover = root.listFiles()
        .flatMap(f => "^BENCH_sf1_r(\\d+)\\.json$".r
          .findFirstMatchIn(f.getName).map(m => (m.group(1).toInt, f)))
        .filter(_._1 >= n)
      assert(cover.nonEmpty,
        s"driver artifact BENCH_r$n.json is load-flagged and no BenchScale " +
          "artifact of the same round or newer exists to stand in for it")
      val (_, coverFile) = cover.maxBy(_._1)
      val coverTxt = new String(
        java.nio.file.Files.readAllBytes(coverFile.toPath), "UTF-8")
      Seq("flagged", "slipped").foreach { k =>
        val v = ("\"" + k + "\":\\[(.*?)\\]").r
          .findFirstMatchIn(coverTxt).map(_.group(1)).getOrElse("MISSING")
        assert(v == "",
          s"${coverFile.getName} must be clean to cover the load-flagged " +
            s"BENCH_r$n.json, but $k=[$v]")
      }
    }
  }

  test("bench provenance: the artifact records the product-source hash " +
      "it was rolled on; round-end enforcement pins it to the tree") {
    // mechanizes the bench-last invariant the r15/r16 rounds broke by
    // hand (clean artifact predating the last product commit): the
    // artifact itself carries srcHash(src/main) from roll time, so
    // "rolled on exactly the shipped product sources" is an equality
    // check, not a git-timestamp audit. The equality half only arms
    // at round end (GRAFT_ENFORCE_BENCH_PROVENANCE=1, run via
    // testOnly AFTER the final roll) — mid-round the tree is always
    // ahead of the artifact and a hard gate would keep the suite red
    // during normal development.
    val enforce = sys.env.get("GRAFT_ENFORCE_BENCH_PROVENANCE").contains("1")
    val f = new java.io.File(BenchScale.ArtifactPath)
    if (enforce)
      // round-end mode: a missing artifact is the WORST provenance
      // violation (nothing was rolled at all) — it must fail loudly,
      // never cancel into a green report (r17 review)
      assert(f.exists(),
        s"${BenchScale.ArtifactPath} does not exist — the round's final " +
          "BenchScale roll never happened")
    else
      assume(f.exists(), s"run graft.BenchScale to generate ${BenchScale.ArtifactPath}")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val stamped = "\"src_hash\":\"([0-9a-f]{64})\"".r
      .findFirstMatchIn(txt).map(_.group(1))
    assert(stamped.nonEmpty,
      s"${BenchScale.ArtifactPath} carries no src_hash stamp — re-roll " +
        "BenchScale (provenance unknowable without it)")
    if (enforce)
      assert(stamped.contains(BenchScale.srcHash()),
        s"${BenchScale.ArtifactPath} was rolled on DIFFERENT product " +
          "sources than this tree — re-roll BenchScale as the round's " +
          "last act (the r15/r16 bench-last invariant)")
  }

  test("srcHash: deterministic, and sensitive to content, rename, and new files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_srchash_")
    def w(name: String, body: String): Unit = {
      val p = dir.resolve(name)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
    }
    w("a/One.scala", "object One")
    w("b/Two.scala", "object Two")
    val h0 = BenchScale.srcHash(dir.toString)
    assert(h0.matches("[0-9a-f]{64}"))
    assert(BenchScale.srcHash(dir.toString) == h0) // deterministic
    w("b/Two.scala", "object Two2") // content change
    val h1 = BenchScale.srcHash(dir.toString)
    assert(h1 != h0)
    w("b/Two.scala", "object Two")
    assert(BenchScale.srcHash(dir.toString) == h0) // restored == original
    w("c/Three.scala", "object Three") // new file
    val h2 = BenchScale.srcHash(dir.toString)
    assert(h2 != h0)
    // rename: same bytes under a different path must change the hash
    java.nio.file.Files.move(
      dir.resolve("c/Three.scala"), dir.resolve("c/Moved.scala"))
    assert(BenchScale.srcHash(dir.toString) != h2)
    // framing: under the OLD path+NUL+bytes scheme these two trees
    // digest the IDENTICAL stream d/x NUL X d/y NUL Y — the first
    // file's content embeds the NUL and the second file's path — so
    // reverting the length frame fails exactly here (r17 review: the
    // first counterexample differed under both schemes and protected
    // nothing)
    w("d/x", "Xd/y\u0000Y")
    val hJoined = BenchScale.srcHash(dir.toString)
    java.nio.file.Files.delete(dir.resolve("d/x"))
    w("d/x", "X")
    w("d/y", "Y")
    assert(BenchScale.srcHash(dir.toString) != hJoined)
  }

  test("salted join equals the plain join") {
    val t = Tables(spark, sf)
    val plain = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val salted = Scale.q15.fn(spark, sf).select(col("o_orderpriority"), col("n"))
    assert(plain.exceptAll(salted).count() == 0 && salted.exceptAll(plain).count() == 0)
  }

  test("hot-key-targeted salting equals the plain join on a skewed corpus") {
    import spark.implicits._
    // one melting key (5000 fact rows on key 1) plus a cold tail — the
    // hot slice must salt, the cold slice must join plainly, and the
    // union must be exactly the plain join
    val fact = ((1 to 5000).map(i => (1L, i)) ++ (1 to 500).map(i => (i.toLong + 1, i)))
      .toDF("k", "payload")
    val dim = (1L to 501L).map(k => (k, s"d$k")).toDF("dk", "attr")
    val salted = Scale.saltedJoin(fact, dim, "k", "dk",
      Seq(col("payload")), numSalts = 8, hotThreshold = 1000L)
    val plain = fact.join(dim, col("k") === col("dk"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
    // and the hot slice really spread: the salted plan replicates only
    // the single hot dim row, never the whole dimension
    val hotOnly = Scale.saltedJoin(fact.filter(col("k") === 1), dim, "k", "dk",
      Seq(col("payload")), numSalts = 8, hotThreshold = 1000L)
    assert(hotOnly.count() == 5000)
  }

  test("bucketed tables join without a shuffle exchange") {
    val t = Tables(spark, sf)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // a previously crashed run can leave the managed location behind
    import scala.reflect.io.Directory
    Seq("li_bucketed", "o_bucketed").foreach(n =>
      new Directory(new java.io.File(s"/tmp/graft_warehouse/$n")).deleteRecursively())
    t.lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    t.orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("asof join: every purchase gets the latest prior click value") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10), (1L, 200L, 20), (2L, 50L, 30)).toDF("k", "t", "eid")
    val right = Seq((1L, 90L, 1.0), (1L, 150L, 2.0), (1L, 201L, 3.0), (3L, 1L, 9.0))
      .toDF("k", "t", "v")
    val got = Temporal.asofJoin(
        left.select(col("k"), col("eid"), col("t")),
        right.select(col("k"), col("t"), col("v")),
        "k", "t", "t", Seq("v"))
      .orderBy("eid")
      .select("eid", "v").collect()
      .map(r => (r.getInt(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    // eid 10 @t=100 → click @90 (1.0); eid 20 @t=200 → click @150 (2.0);
    // eid 30 (k=2) → no click → null
    assert(got.sameElements(Array((10, Some(1.0)), (20, Some(2.0)), (30, None))))
  }

  test("asof join is inclusive at equal timestamps") {
    import spark.implicits._
    val left = Seq((1L, 100L, 1)).toDF("k", "t", "eid")
    val right = Seq((1L, 100L, 42.0)).toDF("k", "t", "v")
    val got = Temporal.asofJoin(
        left.select(col("k"), col("eid"), col("t")),
        right.select(col("k"), col("t"), col("v")),
        "k", "t", "t", Seq("v"))
      .select("v").collect()(0).getDouble(0)
    assert(got == 42.0)
  }

  test("sessionize splits on gaps greater than the threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L), (1L, "2024-01-01 00:10:00", 2L),
      (1L, "2024-01-01 01:00:00", 3L), (2L, "2024-01-01 00:00:00", 4L)
    ).toDF("user_id", "ts", "event_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Temporal.sessionize(df, col("user_id"), col("ts"), col("event_id"),
        30L * 60 * 1000000)
      .orderBy("event_id")
      .select("session_num").collect().map(_.getInt(0))
    assert(got.sameElements(Array(1, 1, 2, 1)))
  }

  test("vector expressions match the interpreted HOF folds bit-for-bit and are codegen'd") {
    import graft.functions.Vectors
    import org.apache.spark.sql.functions.{aggregate, lit, typedlit, zip_with}
    val emb = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // interpreted reference formulations (the pre-codegen versions)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def hofNorm(a: org.apache.spark.sql.Column) =
      sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    def hofBucket(v: org.apache.spark.sql.Column) =
      (0 until 8).map { p =>
        val proj = aggregate(zip_with(v, typedlit(Vectors.planeSigns(p, 64)), (x, s) => x * s),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
    val rows = emb.limit(50).select(
      Vectors.dot(col("v"), col("v")).as("fast_dot"), hofDot(col("v"), col("v")).as("hof_dot"),
      Vectors.norm(col("v")).as("fast_norm"), hofNorm(col("v")).as("hof_norm"),
      Vectors.cosine(col("v"), col("v")).as("fast_cos"),
      Vectors.hyperplaneBucket(col("v"), 8).as("fast_b"), hofBucket(col("v")).as("hof_b"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot mismatch")   // bit-exact
      assert(r.getDouble(2) == r.getDouble(3), "norm mismatch")
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-12, "self-cosine != 1")
      assert(r.getInt(5) == r.getInt(6), "bucket mismatch")
    }
    // whole-stage codegen must cover the vector projection on a real scan
    val plan = emb.select(Vectors.cosine(col("v"), col("v")))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }

  test("shingle expressions match the interpreted compositions bit-for-bit") {
    import spark.implicits._
    import graft.functions.{Text, XxShinglesExpr}
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.functions.{element_at, sequence, transform, xxhash64}
    val df = Seq("a b c d e", "one two three", "a b", "").toDF("text")
      .select(Text.tokens(col("text")).as("toks"))
    // string shingles: new codegen expr vs the old transform+concat_ws form
    val oldShingles = when(size(col("toks")) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("toks")) - 2),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
    // hashed shingles: new codegen expr vs the chained xxhash64 form
    val oldHashes = when(size(col("toks")) < 3, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), size(col("toks")) - 2),
        i => xxhash64(element_at(col("toks"), i),
          element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
    val rows = df.select(
      Text.shingles(col("toks"), 3).as("ns"), oldShingles.as("os"),
      ColumnBridge.column(XxShinglesExpr(
        ColumnBridge.expression(col("toks")), 3)).as("nh"), oldHashes.as("oh"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), "string shingles diverge")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), "hashed shingles diverge")
    }
  }

  test("custom rolling fingerprint expression matches the HOF fold and is codegen'd") {
    import spark.implicits._
    graft.functions.RollingFingerprintExpr.register(spark)
    val df = Seq("ab", "key agg row scan", "").toDF("text")
    val rows = df.select(
      expr("graft_rolling_fp(text)").as("fast"),
      graft.functions.Text.rollingFingerprint(col("text")).as("slow")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows(0).getLong(0) == 3105L)
    // local relations constant-fold to LocalTableScan; assert codegen
    // on a real parquet-backed scan
    // "*(n)" marks WholeStageCodegen stages in the plan string
    val plan = Tables(spark, sf).documents.select(expr("graft_rolling_fp(text)"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }

  test("int8 quantize expression matches the interpreted composition bit-for-bit and is codegen'd") {
    import org.apache.spark.sql.graft.ColumnBridge
    val emb = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val stats = emb.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("pos")).collect()
    val mins = stats.map(_.getDouble(1))
    val spans = stats.map(r => r.getDouble(2) - r.getDouble(1))
    val minsLit = typedlit(mins)
    val spansLit = typedlit(spans)
    // the interpreted reference formulation (pre-codegen s06)
    def codeOf(x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) = {
      val mn = element_at(minsLit, i + 1)
      val sp = element_at(spansLit, i + 1)
      when(sp === 0.0, lit(0.0))
        .otherwise(least(greatest(floor((x - mn) / sp * 255.0), lit(0.0)), lit(255.0)))
    }
    def errOf(x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) = {
      val mn = element_at(minsLit, i + 1)
      val sp = element_at(spansLit, i + 1)
      mn + (codeOf(x, i) + 0.5) * sp / 255.0 - x
    }
    val qs = ColumnBridge.column(graft.functions.Int8QuantExpr(
      ColumnBridge.expression(col("v")), mins, spans))
    val rows = emb.limit(100).select(
        qs.getField("code_sum").as("fast_cs"),
        aggregate(transform(col("v"), (x, i) => codeOf(x, i) * (i + 1).cast("double")),
          lit(0.0), (a, c) => a + c).cast("long").as("hof_cs"),
        qs.getField("err2_sum").as("fast_es"),
        aggregate(transform(col("v"), (x, i) => { val e = errOf(x, i); e * e }),
          lit(0.0), (a, c) => a + c).as("hof_es"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "code_sum mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "err2_sum mismatch") // bit-exact
    }
    val plan = emb.select(qs)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }

  test("q21 hash sampling is a single partial-agg pass, no join or extra exchange") {
    val plan = physicalPlan(graft.operators.Relational.q21.fn(spark, sf))
    assert(!plan.contains("Join"), s"sampling must not join:\n$plan")
    // one exchange for the groupBy, one for the oracle ORDER BY — the
    // sampling predicate itself adds nothing
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$plan")
  }

  test("s05 assignment stage is map-side: no exchange below the centroid agg") {
    // the literal-centroid argmax is a pure projection over the scan —
    // the ONLY shuffles in an iteration are the per-dim mean agg and
    // nothing else (broadcast/literal centroids, zero join exchanges)
    val t = Tables(spark, sf)
    val emb = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = Seq((0, Array(1.0) ++ Array.fill(63)(0.0)), (1, Array.fill(64)(0.5)))
    val best = array_max(array(cents.map { case (cid, cv) =>
      struct(graft.functions.Vectors.cosine(col("v"), typedlit(cv)).as("c"),
        lit(-cid).as("n")) }: _*))
    val assigned = emb.withColumn("cid", -best.getField("n"))
    val plan = physicalPlan(assigned)
    assert(!plan.contains("Exchange"), s"assignment should be map-only:\n$plan")
  }

  test("zorderCompact lays out files whose bboxes are collectively tight") {
    val out = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val pts = Tables(spark, sf).events
      .select((col("user_id") * 1.7 - 95.0).as("lon"),
        (col("value") * 0.35 - 80.0).as("lat"))
    graft.operators.Scale.zorderCompact(
      pts, col("lon"), col("lat"), 180.0, 360.0, 90.0, 180.0,
      numFiles = 8, out = out)
    val files = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(min(col("lon")).as("x0"), max(col("lon")).as("x1"),
        min(col("lat")).as("y0"), max(col("lat")).as("y1"),
        count(lit(1)).as("n"))
      .collect()
    assert(files.length == 8, s"expected 8 output files, got ${files.length}")
    assert(files.map(_.getAs[Long]("n")).sum == pts.count())
    val global = pts.agg(min(col("lon")), max(col("lon")),
      min(col("lat")), max(col("lat"))).collect()(0)
    val globalArea = (global.getDouble(1) - global.getDouble(0)) *
      (global.getDouble(3) - global.getDouble(2))
    val sumArea = files.map { r =>
      (r.getAs[Double]("x1") - r.getAs[Double]("x0")) *
        (r.getAs[Double]("y1") - r.getAs[Double]("y0"))
    }.sum
    // an unclustered write gives ~numFiles × globalArea of total bbox
    // cover; Z-ordering must do at least 2× better — that factor is the
    // whole point of the layout (each file's stats prune most queries)
    assert(sumArea < 0.5 * files.length * globalArea,
      s"z-layout not tight: files cover $sumArea vs global $globalArea")
  }
}
