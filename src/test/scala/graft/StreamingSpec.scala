package graft

import graft.streaming.Streaming
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("staging fingerprint is content-based: same length + mtime, different bytes → different key") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp").toString
    def write(name: String, bytes: Array[Byte], mtime: Long): java.io.File = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.write(f.toPath, bytes)
      f.setLastModified(mtime)
      f
    }
    val t0 = 1700000000000L
    val a = write("a", Array.fill[Byte](1000)(1), t0)
    val b = write("b", Array.fill[Byte](1000)(1), t0)
    // regenerated in place: identical length, identical mtime, one byte
    // of content differs (the failure mode mtime ^ length missed)
    val c = write("c", Array.fill[Byte](1000)(1).updated(999, 2: Byte), t0)
    assert(Streaming.contentFingerprint(a) == Streaming.contentFingerprint(b))
    assert(Streaming.contentFingerprint(a) != Streaming.contentFingerprint(c))
    // a large file differing only in its FOOTER region still re-keys
    val big1 = write("d", Array.fill[Byte](200000)(7), t0)
    val big2 = write("e", Array.fill[Byte](200000)(7).updated(199999, 8: Byte), t0)
    assert(Streaming.contentFingerprint(big1) != Streaming.contentFingerprint(big2))
    // DIRECTORY layout (a Spark-written table of part files): content
    // keys the digest, a one-byte part edit re-keys, and identical
    // content fingerprints identically across directories
    def mkdir(name: String, parts: (String, Array[Byte])*): java.io.File = {
      val d = new java.io.File(dir, name); d.mkdirs()
      parts.foreach { case (n, bytes) =>
        java.nio.file.Files.write(new java.io.File(d, n).toPath, bytes)
      }
      d
    }
    val p1 = Array.fill[Byte](500)(3); val p2 = Array.fill[Byte](500)(4)
    val d1 = mkdir("t1", "part-00000.parquet" -> p1, "part-00001.parquet" -> p2)
    val d2 = mkdir("t2", "part-00000.parquet" -> p1, "part-00001.parquet" -> p2)
    val d3 = mkdir("t3", "part-00000.parquet" -> p1,
      "part-00001.parquet" -> p2.updated(499, 5: Byte))
    assert(Streaming.contentFingerprint(d1) == Streaming.contentFingerprint(d2))
    assert(Streaming.contentFingerprint(d1) != Streaming.contentFingerprint(d3))
    // empty dir / missing path both fail with the configuration error
    val e1 = intercept[IllegalArgumentException] {
      Streaming.contentFingerprint(mkdir("t4"))
    }
    assert(e1.getMessage.contains("cannot derive a content fingerprint"))
  }

  test("st11 top-k state folds across micro-batches, bounded at k rows per key") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
    import spark.implicits._
    import java.nio.file.Files
    // two slice files → two real micro-batches; the leaderboard after
    // epoch 2 must equal the batch top-3 over BOTH slices even though
    // epoch 2's state held only 3 rows of epoch 1
    val dir = Files.createTempDirectory("graft_st11").toString
    val slice1 = Seq(("A", 1L, 10.0), ("A", 2L, 50.0), ("A", 3L, 30.0),
      ("A", 4L, 40.0), ("B", 5L, 5.0))
    val slice2 = Seq(("A", 6L, 45.0), ("A", 7L, 1.0), ("B", 8L, 99.0),
      ("A", 9L, 50.0)) // ties with id 2: id order breaks it
    slice1.toDF("event_type", "event_id", "value")
      .coalesce(1).write.parquet(s"$dir/s1")
    slice2.toDF("event_type", "event_id", "value")
      .coalesce(1).write.parquet(s"$dir/s2")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val updates = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(Streaming.topKFold(3))
    val q = updates.toDF("event_type", "rnk", "event_id", "value", "epoch")
      .writeStream
      .outputMode("update").format("memory").queryName("st11_spec")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the memory sink accumulates every epoch's emission; the bound
    // holds on all of them, and the leaderboard reflecting BOTH slices
    // must have been emitted — including the cross-batch merge where
    // epoch 2's (id 9, 50.0) ties epoch 1's champion and (id 6, 45.0)
    // displaces epoch 1's (id 4, 40.0) out of a state that only ever
    // held 3 rows
    val all = spark.table("st11_spec").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(all.forall(_._2 <= 3), s"state exceeded k: $all")
    val expectedFinal = Set(
      ("A", 1, 2L, 50.0), ("A", 2, 9L, 50.0), ("A", 3, 6L, 45.0),
      ("B", 1, 8L, 99.0), ("B", 2, 5L, 5.0))
    assert(expectedFinal.subsetOf(all), s"missing final rows: ${expectedFinal.diff(all)}")
    // the per-key epoch makes the multi-batch read unambiguous: keeping
    // only max-epoch rows per key recovers EXACTLY the final leaderboard
    // (the stale epoch-1 "A" rows drop out)
    val latest = spark.table("st11_spec")
      .withColumn("mx", max(col("epoch")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
      .filter(col("epoch") === col("mx")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(latest == expectedFinal, s"latest-epoch read diverges: $latest")
  }

  test("st01 streaming window agg equals the batch plan") {
    val streamed = Streaming.st01.fn(spark, sf)
    val batch = graft.operators.Ingest.i17.fn(spark, sf)
    assert(streamed.count() == batch.count())
    val diff = streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()
    assert(diff == 0, s"streaming/batch window agg diverge by $diff rows")
  }

  test("st02 dedup keeps one row per event_id") {
    val total = Streaming.st02.fn(spark, sf).agg(sum("n")).collect()(0).getLong(0)
    val distinctIds = Tables(spark, sf).events.select("event_id").distinct().count()
    assert(total == distinctIds)
  }

  test("st03 upsert sink is idempotent across re-runs") {
    val first = Streaming.st03.fn(spark, sf).collect()
    val second = Streaming.st03.fn(spark, sf).collect()
    assert(first.sameElements(second))
  }

  test("st08 streamed corpus dedup equals the batch anti-join") {
    val streamed = Streaming.st08.fn(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_landed"), r.getAs[Long]("chars_landed"))).toMap
    val pk = md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
    val docs = Tables(spark, sf).documents.withColumn("pk", pk)
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .join(docs.filter(col("doc_id") % 2 === 0).select(col("pk")), Seq("pk"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("c"))).toMap
    assert(streamed == batch)
    // the dedup actually dropped the cross-corpus prefix dups
    val landedTotal = streamed.values.map(_._1).sum
    val batchTotal = Tables(spark, sf).documents.filter(col("doc_id") % 2 === 1).count()
    assert(landedTotal < batchTotal, "anti-join dropped nothing")
  }

  test("st09 streamed quality gate equals the batch gate") {
    val streamed = Streaming.st09.fn(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pass"), r.getAs[Long]("tokens_landed"))).toMap
    val tk = split(col("text"), " ")
    val stopCount = size(filter(tk, t => t === "a" || t === "the"))
    val markCount = size(filter(tk, t => t === "the" || t === "a" || t === "is"))
    val batch = Tables(spark, sf).documents
      .withColumn("n_tok", size(tk))
      .withColumn("pass",
        col("n_tok") >= 20 && stopCount.cast("double") / col("n_tok") < 0.5 && markCount > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), count(when(col("pass"), 1)).as("p"),
        coalesce(sum(when(col("pass"), col("n_tok"))), lit(0L)).as("t"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("p"), r.getAs[Long]("t"))).toMap
    assert(streamed == batch)
    // the gate actually rejects something on this corpus
    assert(streamed.values.map(_._2).sum < streamed.values.map(_._1).sum)
  }

  test("stream partition sizing never touches the caller's session conf") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    // run a sized stateful stream while polling the caller's conf from
    // another thread — the isolated-session design means no window in
    // which a concurrent batch query could see the stream's sizing
    @volatile var observed = Set.empty[String]
    val poller = new Thread(() => {
      (1 to 200).foreach { _ =>
        observed += spark.conf.get("spark.sql.shuffle.partitions")
        Thread.sleep(5)
      }
    })
    poller.start()
    Streaming.st01.fn(spark, sf).collect()
    poller.join()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    assert(observed == Set(before),
      s"caller session observed foreign conf values: $observed")
  }

  test("st10 incremental state merge equals the one-shot batch aggregate") {
    val streamed = Streaming.st10.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("d")) ->
        (r.getAs[Double]("total_v"), r.getAs[Long]("n"))).toMap
    val batch = Tables(spark, sf).events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(round(sum(col("value")), 2).as("t"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("d")) ->
        (r.getAs[Double]("t"), r.getAs[Long]("n"))).toMap
    assert(streamed == batch)
    // the merge really ran incrementally: one state version per epoch,
    // three staged slice files → at least versions v0..v2 on disk
    val fp = Streaming.contentFingerprint(new java.io.File(s"$sf/events.parquet"))
    val stateRoot = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_st10stage_${sf.hashCode.toHexString}_$fp-state")
    val versions = stateRoot.listFiles().map(_.getName).filter(_.startsWith("state_v"))
    assert(versions.length >= 3,
      s"expected one state version per micro-batch epoch, found ${versions.toSeq}")
  }

  test("st12 streamed funnel enforces stage order and horizon like the batch path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st12").toString
    val h = 3600L * 1000000000L
    val t0 = 1704067200L * 1000000000L
    Seq(
      (0L, t0, 1L, "view", 1.0, "{}"),         // user 1: full funnel
      (1L, t0 + h, 1L, "click", 1.0, "{}"),
      (2L, t0 + 2 * h, 1L, "purchase", 1.0, "{}"),
      (3L, t0 + 2 * h, 2L, "click", 1.0, "{}"), // user 2: click precedes view
      (4L, t0 + 3 * h, 2L, "view", 1.0, "{}"),
      (6L, t0, 3L, "view", 1.0, "{}"),          // user 3: purchase past horizon
      (7L, t0 + h, 3L, "click", 1.0, "{}"),
      (8L, t0 + 240 * h, 3L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/_stage")
    // the file stream's pathGlobFilter matches leaf FILE names — stage
    // a single part file and move it to $dir/events.parquet
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    val got = Streaming.st12.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val us = 3600L * 1000000L
    val b = 1704067200L * 1000000L
    assert(got(1L) == ((b, b + us, b + 2 * us)))
    assert(got(2L) == ((b + 3 * us, -1L, -1L)), s"${got(2L)}")
    assert(got(3L) == ((b, b + us, -1L)), s"${got(3L)}")
  }

  test("st12 funnel state is evicted once the watermark passes the 7-day horizon") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st12evict").toString
    val us = 3600L * 1000000L // one hour in micros
    val t0 = 1704067200L * 1000000L
    val day = 24 * us
    // slice 1: three funnels starting at t0 (deadline t0 + 7 d);
    // slice 2: user 99's view at t0 + 30 d advances the watermark past
    // every slice-1 deadline; slice 3: user 100's view at t0 + 31 d is
    // the DATA batch during which the expired slice-1 keys time out
    // (no reliance on a trailing no-data batch). 99 and 100 stay
    // unfinalized: their deadlines sit beyond the final watermark.
    val slices = Seq(
      Seq((1L, "view", 0L, 0L), (1L, "click", us, 1L),
        (2L, "view", 0L, 2L), (2L, "click", us, 3L), (2L, "purchase", 2 * us, 4L),
        (3L, "view", 0L, 5L)),
      Seq((99L, "view", 30 * day, 6L)),
      Seq((100L, "view", 31 * day, 7L)))
    slices.zipWithIndex.foreach { case (rows, k) =>
      rows.map { case (u, ty, off, id) => (u, ty, id) -> (t0 + off) }
        .map { case ((u, ty, id), m) => (u, ty, id, m) }
        .toDF("user_id", "event_type", "event_id", "m")
        .select(col("user_id"), col("event_type"), col("event_id"),
          timestamp_micros(col("m")).as("ts"))
        .coalesce(1).write.parquet(s"$dir/s$k")
      // deterministic batch order: mtime AND path both ascend with k
      new java.io.File(s"$dir/s$k").listFiles().foreach(_.setLastModified(
        1700000000000L + k * 60000L))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val updates = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("m"),
        col("event_id"), col("ts"))
      .as[(Long, String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(Streaming.funnelFold)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_st12ckpt").toString
    val q = updates.toDF().writeStream
      .outputMode("update").format("memory").queryName("st12_evict")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the store holds ONLY the unfinalized funnels (99, 100) — the
    // three slice-1 keys were emitted-on-final and removed
    val stateKeys = spark.read.format("statestore").load(ckpt)
      .select(col("key.*")).collect().map(_.getLong(0)).toSet
    assert(stateKeys == Set(99L, 100L),
      s"expected only unfinalized users in the state store, got $stateKeys")
    // the min-agg final read still recovers every funnel exactly
    // (update emissions + the expiry re-emissions are monotone snapshots)
    val got = spark.table("st12_evict")
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("t3")).as("t3"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val U = Long.MaxValue
    assert(got(1L) == ((t0, t0 + us, U)))
    assert(got(2L) == ((t0, t0 + us, t0 + 2 * us)))
    assert(got(3L) == ((t0, U, U)))
    assert(got(99L) == ((t0 + 30 * day, U, U)))
    assert(got(100L) == ((t0 + 31 * day, U, U)))
  }

  test("st13 drift matches the hand-computed TV distance on a crafted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st13").toString
    Seq(
      (0L, "x y", "en", "A", 3L),
      (1L, "x z", "en", "B", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "documents.parquet"))
    val got = Streaming.st13.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // global = {x: 1/2, y: 1/4, z: 1/4}; each source = {x: 1/2, own: 1/2}
    // → TV = (|.5-.5| + |.5-.25| + .25) / 2 = 0.25
    assert(got == Map("A" -> 0.25, "B" -> 0.25), s"$got")
  }

  test("st15 streamed alerts equal the batch hysteresis walk on the corpus") {
    import org.apache.spark.sql.functions.col
    val got = Streaming.st15.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = graft.operators.Ingest.i50.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == batch, s"stream/batch diverge: ${got.size} vs ${batch.size}")
  }

  test("st15 dead band holds alert state across a crafted stream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st15").toString
    val day = 24L * 3600 * 1000000000L
    val t0 = 1704067200L * 1000000000L
    // ON day 1 (30.0), dead band day 2 HOLDS (20.0), OFF day 3 (10.0),
    // ON again day 4 → 3 alert days, 2 episodes, longest 2
    Seq((1L, t0, 1L, "obs", 30.0, "{}"), (2L, t0 + day, 1L, "obs", 20.0, "{}"),
      (3L, t0 + 2 * day, 1L, "obs", 10.0, "{}"),
      (4L, t0 + 3 * day, 1L, "obs", 26.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    val got = Streaming.st15.fn(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 3L && got(0).getLong(2) == 2L &&
      got(0).getLong(3) == 2L, s"${got(0)}")
  }

  test("SortedMatchCountExpr equals capped array_intersect, interpreted and codegen'd") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.unsafe.types.UTF8String
    val arr = Seq("a b c", "c d e", "x y z").map(UTF8String.fromString).toArray
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
    val bc = spark.sparkContext.broadcast(arr)
    val df = Seq(
      Seq("a b c", "q q q"),             // 1 hit
      Seq("a b c", "c d e", "x y z"),    // 3 hits, capped at 2
      Seq("none here"),                  // 0 hits
      Seq.empty[String])
      .toDF("sh")
    val cnt = ColumnBridge.column(
      graft.functions.SortedMatchCountExpr(ColumnBridge.expression(col("sh")), bc, 2))
    val ref = least(size(array_intersect(col("sh"),
      typedlit(Seq("a b c", "c d e", "x y z")))), lit(2))
    val rows = df.select(cnt.as("got"), ref.as("want")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), s"$r"))
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 0, 0))
    // the plan stays inside whole-stage codegen (no interpreted
    // fallback) — asserted over a parquet scan, not a local relation
    val onScan = Tables(spark, sf).documents
      .withColumn("sh", graft.functions.Text.tokens(col("text")))
      .select(ColumnBridge.column(graft.functions.SortedMatchCountExpr(
        ColumnBridge.expression(col("sh")), bc, 2)).as("got"))
    val plan = onScan.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project [graft_sorted_match_count"),
      s"codegen must fire (the *(n) whole-stage marker):\n$plan")
    assert(onScan.agg(sum("got")).collect()(0).get(0) != null)
  }

  test("BloomMatchCountExpr: no false negatives, capped, codegen'd, blob-only driver state") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // blob built executor-side by Spark's own BloomFilterAggregate over
    // xxhash64 — the probe must agree with that hashing exactly
    val blob = Seq("a b c", "c d e", "x y z").toDF("g")
      .agg(ColumnBridge.column(new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("g"))), 1000L)
        .toAggregateExpression()).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val df = Seq(
      Seq("a b c", "q q q"),             // ≥1 true hit
      Seq("a b c", "c d e", "x y z"),    // 3 true hits, capped at 2
      Seq("none here"),                  // ~0 (fp-free at this size)
      Seq.empty[String])
      .toDF("sh")
    val cnt = ColumnBridge.column(graft.functions.BloomMatchCountExpr(
      ColumnBridge.expression(col("sh")), blob, 2))
    val got = df.select(cnt.as("got")).collect().map(_.getInt(0)).toSeq
    // no-false-negative side is the hard guarantee: counts are ≥ the
    // true capped intersection; at 3 items / 1000 expected, fp ≈ 0 so
    // equality is deterministic here
    assert(got == Seq(1, 2, 0, 0), got.toString)
    val onScan = Tables(spark, sf).documents
      .withColumn("sh", graft.functions.Text.tokens(col("text")))
      .select(ColumnBridge.column(graft.functions.BloomMatchCountExpr(
        ColumnBridge.expression(col("sh")), blob, 2)).as("got"))
    val plan = onScan.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project [graft_bloom_match_count"),
      s"codegen must fire (the *(n) whole-stage marker):\n$plan")
    // interpreted path agrees with codegen
    val interp = df.select(ColumnBridge.column(graft.functions.BloomMatchCountExpr(
      ColumnBridge.expression(col("sh")), blob, 2)).as("g"))
      .collect().map(_.getInt(0)).toSeq
    assert(interp == got)
  }


  test("st14 streamed decontamination flags exactly the leaked documents") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st14").toString
    Seq(
      // doc 0 (id % 97 == 0) is the benchmark: grams "a b c", "b c d"
      (0L, "a b c d", "en", "eval", 7L),
      // doc 1 copies the benchmark verbatim → 2 shared grams → dirty
      (1L, "a b c d", "en", "A", 7L),
      // doc 2 shares ONE gram ("a b c") → below the ≥2 threshold
      (2L, "a b c x", "en", "A", 7L),
      // doc 3 is clean
      (3L, "p q r s t", "en", "B", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "documents.parquet"))
    val got = Streaming.st14.fn(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_contaminated"),
          r.getAs[Long]("tokens_clean")))).toMap
    // A: 2 docs, only the verbatim copy dirty, clean tokens = doc 2's 4;
    // B: untouched; the eval doc itself never appears
    assert(got == Map("A" -> ((2L, 1L, 4L)), "B" -> ((1L, 0L, 5L))), s"$got")
  }

  test("stateful streams are provider-agnostic: RocksDB state store equals the default") {
    // the durability rung (SURVEY §5): HDFSBacked snapshots the full
    // store per maintenance pass; RocksDB is the 100 TB-rate choice.
    // Same queries, both providers, identical rows — windowed agg
    // (st01), within-watermark dedup state (st02), custom
    // mapGroupsWithState (st04), event-time-evicted funnel (st12).
    val qs = Seq(Streaming.st01, Streaming.st02, Streaming.st04, Streaming.st12)
    def run() = qs.map(q => q.fn(spark, sf).collect().toSeq)
    val defaults = run()
    spark.conf.set(Streaming.StateStoreProviderConf, "rocksdb")
    val rocks = try run()
    finally spark.conf.unset(Streaming.StateStoreProviderConf)
    qs.zip(defaults.zip(rocks)).foreach { case (q, (d, r)) =>
      assert(d == r, s"${q.name}: providers diverge (${d.size} vs ${r.size} rows)")
    }
  }

  test("st16/st17/st19 state stays key-bounded across 3 epochs, both providers") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
    // r7 verdict item: the r7 streams hold per-key state — prove over
    // ≥3 micro-batches that state ROWS track the KEY count (2 users /
    // 2 sources), never the event count (slices grow 10→20→30 rows),
    // and that st17's per-day map stays span-bounded, under BOTH
    // state-store providers. The folds under test are the operators'
    // own state logic (barFold, coverageFold, the st16-shape agg);
    // the harness adds only explicit checkpoints so the state source
    // can be read back per batch.
    val providers = Seq(
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def stateRows(sess: org.apache.spark.sql.SparkSession,
        ckpt: String, batch: Int): Long =
      sess.read.format("statestore").option("batchId", batch).load(ckpt).count()
    for (provider <- providers) {
      val s = spark.newSession()
      s.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      s.conf.set("spark.sql.shuffle.partitions", "2")
      import s.implicits._

      // ---- st17 shape: barFold over (user_id, day, tsu, event_id, value)
      val barDir = java.nio.file.Files.createTempDirectory("graft_barst").toString
      var eid = 0L
      for (k <- 0 until 3) {
        val rows = for {
          u <- Seq(1L, 2L); i <- 0 until (k + 1) * 10
        } yield {
          eid += 1
          // append-ordered across slices; two days per user total
          (u, k.min(1), k * 1000000L + i * 1000L + eid, eid, 1.0 + i)
        }
        rows.toDF("user_id", "day", "tsu", "event_id", "value")
          .coalesce(1).write.parquet(s"$barDir/s$k")
        new java.io.File(s"$barDir/s$k").listFiles()
          .foreach(_.setLastModified(1700000000000L + k * 60000L))
      }
      val barCkpt = java.nio.file.Files.createTempDirectory("graft_barck").toString
      val barQ = s.readStream
        .schema("user_id LONG, day INT, tsu LONG, event_id LONG, value DOUBLE")
        .option("recursiveFileLookup", "true").option("maxFilesPerTrigger", "1")
        .parquet(barDir)
        .as[(Long, Int, Long, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.NoTimeout)(Streaming.barFold)
        .toDF().writeStream.outputMode("update").format("memory")
        .queryName(s"barst_${provider.hashCode.abs}")
        .option("checkpointLocation", barCkpt)
        .trigger(Trigger.AvailableNow()).start()
      barQ.awaitTermination()
      for (b <- 0 to 2)
        assert(stateRows(s, barCkpt, b) == 2L,
          s"$provider st17 batch $b: state rows != users")
      // the per-user day map is bounded by the SPAN (2 days), not the
      // 60 events folded into it
      val maxDays = s.read.format("statestore").load(barCkpt)
        .selectExpr("cardinality(value.groupState.days) AS nd")
        .collect().map(_.getInt(0)).max
      assert(maxDays <= 2, s"$provider st17: day map grew to $maxDays")

      // ---- st19 shape: coverageFold over (user_id, sm, em, event_id)
      val covDir = java.nio.file.Files.createTempDirectory("graft_covst").toString
      eid = 0L
      for (k <- 0 until 3) {
        val rows = for {
          u <- Seq(1L, 2L); i <- 0 until (k + 1) * 10
        } yield {
          eid += 1
          val sm = k * 10000000L + i * 1000L
          (u, sm, sm + 500L, eid)
        }
        rows.toDF("user_id", "sm", "em", "event_id")
          .coalesce(1).write.parquet(s"$covDir/s$k")
        new java.io.File(s"$covDir/s$k").listFiles()
          .foreach(_.setLastModified(1700000000000L + k * 60000L))
      }
      val covCkpt = java.nio.file.Files.createTempDirectory("graft_covck").toString
      val covQ = s.readStream
        .schema("user_id LONG, sm LONG, em LONG, event_id LONG")
        .option("recursiveFileLookup", "true").option("maxFilesPerTrigger", "1")
        .parquet(covDir)
        .as[(Long, Long, Long, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.NoTimeout)(Streaming.coverageFold)
        .toDF().writeStream.outputMode("update").format("memory")
        .queryName(s"covst_${provider.hashCode.abs}")
        .option("checkpointLocation", covCkpt)
        .trigger(Trigger.AvailableNow()).start()
      covQ.awaitTermination()
      for (b <- 0 to 2)
        assert(stateRows(s, covCkpt, b) == 2L,
          s"$provider st19 batch $b: state rows != users")

      // ---- st16 shape: the per-source landed/neardup streaming agg —
      // built-in agg state, one row per GROUP independent of volume
      val gateDir = java.nio.file.Files.createTempDirectory("graft_gatest").toString
      for (k <- 0 until 3) {
        val rows = for {
          src <- Seq("A", "B"); i <- 0 until (k + 1) * 10
        } yield (src, (k * 100 + i).toLong)
        rows.toDF("source", "n_chars")
          .coalesce(1).write.parquet(s"$gateDir/s$k")
        new java.io.File(s"$gateDir/s$k").listFiles()
          .foreach(_.setLastModified(1700000000000L + k * 60000L))
      }
      val gateCkpt = java.nio.file.Files.createTempDirectory("graft_gateck").toString
      val gateQ = s.readStream
        .schema("source STRING, n_chars LONG")
        .option("recursiveFileLookup", "true").option("maxFilesPerTrigger", "1")
        .parquet(gateDir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_landed"), sum(col("n_chars")).as("chars_landed"))
        .writeStream.outputMode("complete").format("memory")
        .queryName(s"gatest_${provider.hashCode.abs}")
        .option("checkpointLocation", gateCkpt)
        .trigger(Trigger.AvailableNow()).start()
      gateQ.awaitTermination()
      for (b <- 0 to 2)
        assert(stateRows(s, gateCkpt, b) == 2L,
          s"$provider st16 batch $b: state rows != sources")
    }
  }

  test("state-store conf is actually wired: a bogus provider class fails the stream") {
    spark.conf.set(Streaming.StateStoreProviderConf, "graft.NoSuchProvider")
    try intercept[Exception] { Streaming.st02.fn(spark, sf).collect() }
    finally spark.conf.unset(Streaming.StateStoreProviderConf)
  }

  test("st17 streamed OHLC/TWAP equals batch j06; cross-batch hold merges exactly") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
    import spark.implicits._
    // corpus equality: the live bars must BE j06's bars
    val streamed = Streaming.st17.fn(spark, sf).collect().map(_.toSeq).toSet
    val batch = graft.operators.Temporal.j06.fn(spark, sf).collect().map(_.toSeq).toSet
    assert(streamed == batch, s"${streamed.diff(batch).take(3)}")
    // two time-split slices → the 12:00 observation of slice 2 must
    // close slice 1's hold ACROSS the batch boundary: v=10 holds
    // [00:00, 12:00), v=20 holds [12:00, 24:00) → twap 15 exactly
    val dir = java.nio.file.Files.createTempDirectory("graft_st17").toString
    val half = 43200000000L // µs
    Seq((1L, 0, 0L, 1L, 10.0), (2L, 0, half / 2, 2L, 30.0))
      .toDF("user_id", "day", "tsu", "event_id", "value")
      .coalesce(1).write.parquet(s"$dir/s1")
    Seq((1L, 0, half, 3L, 20.0))
      .toDF("user_id", "day", "tsu", "event_id", "value")
      .coalesce(1).write.parquet(s"$dir/s2")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("tsu",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val updates = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[(Long, Int, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(Streaming.barFold)
    val q = updates.toDF().writeStream
      .outputMode("update").format("memory").queryName("st17_spec")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val latest = spark.table("st17_spec")
      .groupBy(col("user_id"))
      .agg(max(struct(col("version"), col("n_events"), col("open"),
        col("close"), col("twap"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val u1 = latest(1L)
    assert(u1.getAs[Long]("n_events") == 2L && u1.getAs[Double]("open") == 10.0 &&
      u1.getAs[Double]("close") == 20.0 && u1.getAs[Double]("twap") == 15.0, u1)
    // the single-observation bar held to bar end in BOTH epochs
    assert(latest(2L).getAs[Double]("twap") == 30.0, latest(2L))
  }

  test("st16 streamed near-dup gate equals the batch band probe; verbatim copy drops") {
    import graft.operators.Dedup
    // corpus equivalence: recompute the gate in batch from the same
    // band machinery the stored index uses
    val streamed = Streaming.st16.fn(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_landed"), r.getAs[Long]("n_neardup")))).toMap
    val docs = Tables(spark, sf).documents
    val sh = docs.select(col("doc_id"),
      array_distinct(graft.functions.Text.shingles(
        graft.functions.Text.tokens(col("text")), 3)).as("sh"))
    val bands = Dedup.md5MinhashBands(sh, "doc_id", "sh")
    val corpus = bands.filter(col("doc_id") % 2 === 0)
      .select(col("band_idx"), col("band_hash")).distinct()
    val hits = bands.filter(col("doc_id") % 2 === 1)
      .join(corpus, Seq("band_idx", "band_hash"))
      .select(col("doc_id")).distinct().withColumn("dup", lit(true))
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .join(hits, Seq("doc_id"), "left_outer")
      .groupBy(col("source"))
      .agg(count(when(col("dup").isNull, 1)).as("n_landed"),
        count(col("dup")).as("n_neardup"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_landed"), r.getAs[Long]("n_neardup")))).toMap
    assert(streamed == batch)
    assert(streamed.values.map(_._2).sum > 0, "gate caught no near-dups at sf0.001")
    // crafted scenario: a verbatim copy of published content is caught,
    // unrelated and shingle-less docs land
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st16").toString
    val t = (1 to 30).map(i => s"tok$i").mkString(" ")
    val other = (1 to 30).map(i => s"alt$i").mkString(" ")
    // the content fingerprint (and the driver layout) want ONE parquet
    // FILE named documents.parquet — stage the write, move the part
    val stage = s"$dir/__stage"
    Seq((0L, t, "en", "s", t.length.toLong),
      (1L, t, "en", "s", t.length.toLong),
      (3L, other, "en", "s", other.length.toLong),
      (5L, "x y", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val got = Streaming.st16.fn(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("n_landed") == 2L && r.getAs[Long]("n_neardup") == 1L &&
      r.getAs[Long]("chars_landed") == other.length + 3L, r.toString)
  }

  test("st18 streamed classify equals batch s19 row-for-row; plan is stateless") {
    val batch = graft.operators.Similarity.s19.fn(spark, sf).collect()
    val streamed = graft.streaming.Streaming.st18.fn(spark, sf).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
      s"streamed ${streamed.mkString(";")} vs batch ${batch.mkString(";")}")
    // the scoring stream holds no state: every probe is decided map-side
    streamed.foreach { r =>
      assert((r.getAs[Int]("pred_label") == r.getAs[Int]("true_label")) ==
        (r.getAs[Int]("correct") == 1))
    }
  }

  test("st19 streamed coverage equals batch j08; islands merge across batches") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
    import spark.implicits._
    // corpus equality: the live counters must BE j08's islands
    val streamed = Streaming.st19.fn(spark, sf).collect().map(_.toSeq).toSet
    val batch = graft.operators.Temporal.j08.fn(spark, sf).collect().map(_.toSeq).toSet
    assert(streamed == batch, s"${streamed.diff(batch).take(3)}")
    // two slices: slice 2's span OVERLAPS the island still open at the
    // batch boundary -> one island spanning both epochs; a later
    // disjoint span then opens island 2
    val m = 60L * 1000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_st19").toString
    Seq((1L, 0L * m, 10L * m, 1L))
      .toDF("user_id", "sm", "em", "event_id").coalesce(1).write.parquet(s"$dir/s1")
    Seq((1L, 5L * m, 15L * m, 2L), (1L, 30L * m, 35L * m, 3L))
      .toDF("user_id", "sm", "em", "event_id").coalesce(1).write.parquet(s"$dir/s2")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sm",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("em",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType)))
    val updates = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(Streaming.coverageFold)
    val q = updates.toDF().writeStream
      .outputMode("update").format("memory").queryName("st19_spec")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val latest = spark.table("st19_spec")
      .groupBy(col("user_id"))
      .agg(max(struct(col("version"), col("n_islands"), col("n_intervals"),
        col("covered_us"), col("longest_us"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val u1 = latest(1L)
    assert(u1.getAs[Long]("n_islands") == 2L &&
      u1.getAs[Long]("n_intervals") == 3L &&
      u1.getAs[Long]("covered_us") == 20L * m &&
      u1.getAs[Long]("longest_us") == 15L * m, u1)
  }
}
