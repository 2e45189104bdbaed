package graft

import graft.sources.HttpFetcher

/** The HTTP acquisition shim: atomic landing, conditional-GET
  * watermark, retry policy, and the newest-first availability walk —
  * all against a local in-process HTTP server (no network). */
class HttpFetcherSpec extends SparkSpec {

  private def withServer[T](
      handler: com.sun.net.httpserver.HttpExchange => Unit)(body: String => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try handler(ex) finally ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("fetch lands bytes atomically: full content, no temp residue") {
    val payload = Array.tabulate[Byte](100000)(i => (i % 251).toByte)
    withServer { ex =>
      ex.sendResponseHeaders(200, payload.length.toLong)
      ex.getResponseBody.write(payload)
    } { base =>
      val dir = java.nio.file.Files.createTempDirectory("graft_fetch").toString
      val dest = s"$dir/slices/2024-06-01.bin"
      val landed = new HttpFetcher().fetch(s"$base/f", dest)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(landed), payload))
      val residue = new java.io.File(s"$dir/slices").listFiles()
        .map(_.getName).filter(_.startsWith(".tmp-"))
      assert(residue.isEmpty, residue.mkString(","))
    }
  }

  test("fetchIfChanged is the HTTP watermark: 304 skips, new ETag re-lands") {
    @volatile var etag = "\"v1\""
    @volatile var content = "generation-1".getBytes("UTF-8")
    val hits = new java.util.concurrent.atomic.AtomicInteger
    withServer { ex =>
      hits.incrementAndGet()
      val sent = Option(ex.getRequestHeaders.getFirst("If-None-Match"))
      if (sent.contains(etag)) ex.sendResponseHeaders(304, -1)
      else {
        ex.getResponseHeaders.set("ETag", etag)
        ex.sendResponseHeaders(200, content.length.toLong)
        ex.getResponseBody.write(content)
      }
    } { base =>
      val dir = java.nio.file.Files.createTempDirectory("graft_cond").toString
      val dest = s"$dir/latest.bin"
      val f = new HttpFetcher()
      // first cycle: lands generation 1 and stores the validator
      assert(f.fetchIfChanged(s"$base/f", dest).isDefined)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dest)), "UTF-8") == "generation-1")
      // second cycle, nothing new: 304 — the reference's
      // "No update required. Skipping"; file untouched
      assert(f.fetchIfChanged(s"$base/f", dest).isEmpty)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dest)), "UTF-8") == "generation-1")
      // remote publishes a new slice: validator mismatch → re-land
      etag = "\"v2\""
      content = "generation-2".getBytes("UTF-8")
      assert(f.fetchIfChanged(s"$base/f", dest).isDefined)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dest)), "UTF-8") == "generation-2")
      assert(hits.get() == 3)
    }
  }

  test("transient 5xx retries then succeeds; 404 fails without retry churn") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    withServer { ex =>
      val n = calls.incrementAndGet()
      if (ex.getRequestURI.getPath.endsWith("flaky")) {
        if (n <= 2) ex.sendResponseHeaders(500, -1)
        else {
          val ok = "finally".getBytes("UTF-8")
          ex.sendResponseHeaders(200, ok.length.toLong)
          ex.getResponseBody.write(ok)
        }
      } else ex.sendResponseHeaders(404, -1)
    } { base =>
      val dir = java.nio.file.Files.createTempDirectory("graft_retry").toString
      val f = new HttpFetcher(maxRetries = 3, retryBackoffMs = 10L)
      val landed = f.fetch(s"$base/flaky", s"$dir/a.bin")
      assert(new String(java.nio.file.Files.readAllBytes(landed), "UTF-8") == "finally")
      assert(calls.get() == 3) // two 500s + the success
      // a permanent 404 fails loudly with exactly ONE request
      calls.set(0)
      intercept[java.io.IOException] { f.fetch(s"$base/missing", s"$dir/b.bin") }
      assert(calls.get() == 1, s"404 must not retry, saw ${calls.get()}")
    }
  }

  test("exhausted retries leave no temp residue — atomic landing includes failure") {
    withServer { ex => ex.sendResponseHeaders(500, -1) } { base =>
      val dir = java.nio.file.Files.createTempDirectory("graft_fail").toString
      val f = new HttpFetcher(maxRetries = 2, retryBackoffMs = 5L)
      intercept[java.io.IOException] { f.fetch(s"$base/down", s"$dir/a.bin") }
      intercept[java.io.IOException] { f.fetchIfChanged(s"$base/down", s"$dir/b.bin") }
      val residue = new java.io.File(dir).listFiles().map(_.getName)
      assert(residue.isEmpty, residue.mkString(","))
    }
  }

  test("latestAvailable walks candidates newest-first to the first live slice") {
    withServer { ex =>
      val ok = ex.getRequestURI.getPath.contains("2024-06-02")
      ex.sendResponseHeaders(if (ok) 200 else 404, -1)
    } { base =>
      val f = new HttpFetcher()
      // newest (06-04, 06-03) not yet published; 06-02 is the latest live
      val cands = Seq("2024-06-04", "2024-06-03", "2024-06-02", "2024-06-01")
        .map(d => d -> s"$base/slices/$d.grib")
      assert(f.latestAvailable(cands).contains("2024-06-02"))
    }
  }

  test("Basic and Bearer auth: 401 without credentials, 200 with; secrets redacted") {
    import graft.sources.{BasicAuth, BearerAuth}
    val basicOk = "Basic " + java.util.Base64.getEncoder
      .encodeToString("alice:s3cret".getBytes("UTF-8"))
    withServer { ex =>
      val got = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val want =
        if (ex.getRequestURI.getPath.endsWith("basic")) basicOk
        else "Bearer tok-123"
      if (!got.contains(want)) {
        // 401 is non-retryable: must fail on the FIRST attempt, like 404
        ex.sendResponseHeaders(401, -1)
      } else if (ex.getRequestMethod == "HEAD") {
        ex.sendResponseHeaders(200, -1)
      } else {
        ex.sendResponseHeaders(200, 2L); ex.getResponseBody.write("ok".getBytes)
      }
    } { base =>
      val dir = java.nio.file.Files.createTempDirectory("graft_auth").toString
      // unauthenticated → 401, no content lands
      intercept[java.io.IOException] {
        new HttpFetcher().fetch(s"$base/basic", s"$dir/x.bin")
      }
      assert(!new java.io.File(s"$dir/x.bin").exists())
      // the reference's two auth shapes (utils.py auth=(u,p); auth.py
      // BearerAuth): credentials ride every request the fetcher issues
      val fb = new HttpFetcher(auth = Some(BasicAuth("alice", "s3cret")))
      fb.fetch(s"$base/basic", s"$dir/b.bin")
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/b.bin"))) == "ok")
      assert(fb.latestAvailable(Seq("d" -> s"$base/bearer", "c" -> s"$base/basic"))
        .contains("c"), "HEAD probes must carry the credential too")
      val ft = new HttpFetcher(auth = Some(BearerAuth("tok-123")))
      assert(ft.fetchIfChanged(s"$base/bearer", s"$dir/t.bin").isDefined)
      // secrets never appear in toString/log surfaces
      assert(!BasicAuth("alice", "s3cret").toString.contains("s3cret"))
      assert(!BearerAuth("tok-123").toString.contains("tok-123"))
    }
  }

  test("conditional-GET with auth: validators and credentials compose") {
    import graft.sources.BearerAuth
    @volatile var etag = "\"e1\""
    withServer { ex =>
      if (!Option(ex.getRequestHeaders.getFirst("Authorization"))
        .contains("Bearer t")) ex.sendResponseHeaders(401, -1)
      else if (Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains(etag))
        ex.sendResponseHeaders(304, -1)
      else {
        ex.getResponseHeaders.set("ETag", etag)
        ex.sendResponseHeaders(200, 1L); ex.getResponseBody.write("x".getBytes)
      }
    } { base =>
      val dir = java.nio.file.Files.createTempDirectory("graft_condauth").toString
      val f = new HttpFetcher(auth = Some(BearerAuth("t")))
      assert(f.fetchIfChanged(s"$base/f", s"$dir/f.bin").isDefined)
      assert(f.fetchIfChanged(s"$base/f", s"$dir/f.bin").isEmpty, "304 path")
    }
  }

  test("validator sidecar lands atomically and never outlives its content") {
    // crash-ordering contract (r8 advice): after every 200-land the
    // sidecar matches the content; no .tmp- residue from the sidecar's
    // own tmp→move; and re-landing first RETIRES the old validators
    // (stale-validator windows force a re-download, never a bad 304)
    @volatile var etag = "\"g1\""
    withServer { ex =>
      ex.getResponseHeaders.set("ETag", etag)
      ex.sendResponseHeaders(200, 1L); ex.getResponseBody.write("x".getBytes)
    } { base =>
      val dir = java.nio.file.Files.createTempDirectory("graft_sidecar").toString
      val f = new HttpFetcher()
      f.fetchIfChanged(s"$base/f", s"$dir/f.bin")
      val sidecar = java.nio.file.Paths.get(s"$dir/f.bin.http-state")
      assert(new String(java.nio.file.Files.readAllBytes(sidecar))
        .contains("\"g1\""))
      etag = "\"g2\""
      // no If-None-Match match server-side → re-land, sidecar rolls
      f.fetchIfChanged(s"$base/f", s"$dir/f.bin")
      assert(new String(java.nio.file.Files.readAllBytes(sidecar))
        .contains("\"g2\""))
      val residue = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith(".tmp-"))
      assert(residue.isEmpty, residue.mkString(","))
    }
  }

  test("redirects: auth stays on the original origin, never forwarded cross-origin") {
    import graft.sources.BearerAuth
    // two local servers = two origins (different ports)
    val seenAtB = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val serverB = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    serverB.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      seenAtB.add(Option(ex.getRequestHeaders.getFirst("Authorization"))
        .getOrElse("<none>"))
      val body = "mirror".getBytes
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    })
    serverB.start()
    try {
      val baseB = s"http://127.0.0.1:${serverB.getAddress.getPort}"
      withServer { ex =>
        val p = ex.getRequestURI.getPath
        if (p.endsWith("cross")) {
          ex.getResponseHeaders.set("Location", s"$baseB/data.bin")
          ex.sendResponseHeaders(302, -1)
        } else if (p.endsWith("hop")) {
          ex.getResponseHeaders.set("Location", "/final")
          ex.sendResponseHeaders(302, -1)
        } else if (p.endsWith("final")) {
          // same-origin hop KEEPS the credential
          if (!Option(ex.getRequestHeaders.getFirst("Authorization"))
            .contains("Bearer t1")) ex.sendResponseHeaders(401, -1)
          else {
            val body = "home".getBytes
            ex.sendResponseHeaders(200, body.length.toLong)
            ex.getResponseBody.write(body)
          }
        } else if (p.endsWith("loop")) {
          ex.getResponseHeaders.set("Location", "/loop")
          ex.sendResponseHeaders(302, -1)
        } else ex.sendResponseHeaders(404, -1)
      } { base =>
        val dir = java.nio.file.Files.createTempDirectory("graft_redir").toString
        val f = new HttpFetcher(auth = Some(BearerAuth("t1")), maxRetries = 0)
        // cross-origin redirect: content lands, credential does NOT travel
        f.fetch(s"$base/cross", s"$dir/c.bin")
        assert(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$dir/c.bin"))) == "mirror")
        assert(seenAtB.size() == 1 && seenAtB.peek() == "<none>",
          s"credential leaked cross-origin: $seenAtB")
        // same-origin redirect chain: credential re-attached each hop
        f.fetch(s"$base/hop", s"$dir/h.bin")
        assert(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$dir/h.bin"))) == "home")
        // redirect loops terminate loudly
        val e = intercept[java.io.IOException] {
          f.fetch(s"$base/loop", s"$dir/l.bin")
        }
        assert(e.getMessage.contains("redirects"), e.getMessage)
      }
    } finally serverB.stop(0)
  }

  test("fetchAll lands a file set with bounded concurrency; partial failure is loud") {
    val inFlight = new java.util.concurrent.atomic.AtomicInteger
    val peak = new java.util.concurrent.atomic.AtomicInteger
    withServer { ex =>
      val n = inFlight.incrementAndGet()
      peak.getAndUpdate(p => math.max(p, n))
      try {
        if (ex.getRequestURI.getPath.endsWith("bad")) ex.sendResponseHeaders(404, -1)
        else {
          Thread.sleep(30)
          val body = ex.getRequestURI.getPath.getBytes("UTF-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          ex.getResponseBody.write(body)
        }
      } finally inFlight.decrementAndGet()
    } { base =>
      val dir = java.nio.file.Files.createTempDirectory("graft_fetchall").toString
      val f = new HttpFetcher(maxRetries = 0)
      // the happy path: 8 slices, parallelism 3 — all land, in order,
      // and the server never sees more than 3 concurrent requests
      val landed = f.fetchAll(
        (1 to 8).map(i => s"$base/step$i" -> s"$dir/step$i.bin"), parallelism = 3)
      assert(landed.map(_.getFileName.toString) == (1 to 8).map(i => s"step$i.bin"))
      assert(peak.get() <= 3, s"peak concurrency ${peak.get()}")
      (1 to 8).foreach(i => assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/step$i.bin"))) == s"/step$i"))
      // one failing slice: every other download still lands (idempotent
      // retry next cycle), the failure is rethrown with the count
      val e = intercept[java.io.IOException] {
        f.fetchAll(Seq(
          s"$base/ok1" -> s"$dir/ok1.bin",
          s"$base/bad" -> s"$dir/bad.bin",
          s"$base/ok2" -> s"$dir/ok2.bin"))
      }
      assert(e.getMessage.startsWith("1/3"), e.getMessage)
      assert(new java.io.File(s"$dir/ok1.bin").exists())
      assert(new java.io.File(s"$dir/ok2.bin").exists())
      assert(!new java.io.File(s"$dir/bad.bin").exists())
      val residue = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith(".tmp-"))
      assert(residue.isEmpty, residue.mkString(","))
    }
  }

  test("fetched slices compose with Jobs: land → incremental ingest cycle") {
    import spark.implicits._
    import graft.sources.{JobConfig, Jobs, Notifier}
    val root = java.nio.file.Files.createTempDirectory("graft_fetchjob").toString
    // a "remote" serving one parquet slice; the job's source fn lands
    // it via the fetcher then reads the landing dir — the acquisition
    // boundary the reference's DataIngest subclasses implement
    val slice = s"$root/remote_slice"
    Seq((java.sql.Timestamp.valueOf("2024-05-01 06:00:00"), 1.0))
      .toDF("ts", "v").coalesce(1).write.parquet(slice)
    val part = new java.io.File(slice).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    withServer { ex =>
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    } { base =>
      val landing = s"$root/landing"
      val jobs = new Jobs(spark, s"$root/state", Notifier.Noop)
        .register(JobConfig("dsF",
          s => {
            new HttpFetcher().fetch(s"$base/slice", s"$landing/s.parquet")
            s.read.parquet(landing)
          },
          "ts", identity, s"$root/out", retentionDays = 30))
      val r = jobs.runAll(1)
      assert(r.head.publishedDates == Seq("2024-05-01"), r.toString)
    }
  }

  test("gunzip-on-landing: a .grb.gz acquisition lands UNWRAPPED " +
      "through a Jobs cycle, so the GRIB planner fans out per message " +
      "(a wrapped landing would plan one serial whole-file split); a " +
      "corrupt download refuses by name and keeps the wrapped file " +
      "for the retry") {
    import graft.sources.{GribMeta, Gz, JobConfig, Jobs, Notifier}
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // three-message GRIB2 archive — the open-data shape (one message
    // per variable/step) whose parallelism gunzip-on-landing preserves
    val plain = (0 until 3).toArray.flatMap { k =>
      GribMeta.encodeSimple(2, 2, 2, 5 + k, 0f, 0, 0, 8,
        Array(1L + k, 2L, 3L, 4L))
    }
    val gz = Gz.gzip(plain)
    val root = java.nio.file.Files.createTempDirectory("graft_gzland").toString
    withServer { ex =>
      ex.sendResponseHeaders(200, gz.length.toLong)
      ex.getResponseBody.write(gz)
    } { base =>
      val landing = s"$root/landing"
      val jobs = new Jobs(spark, s"$root/state", Notifier.Noop)
        .register(JobConfig("dsG",
          s => {
            // the acquisition step the reference's chirps job runs:
            // download the wrapped archive, land it unwrapped
            new HttpFetcher().fetchGunzipped(
              s"$base/d.grb.gz", s"$landing/d.grb.gz")
            s.read.format("graft.sources.GribGridSource")
              .option("path", landing).load()
              .withColumn("ts",
                to_timestamp(col("ref_time"), "yyyy-MM-dd'T'HH:mm"))
          },
          "ts", identity, s"$root/out", retentionDays = 30))
      val r = jobs.runAll(1)
      assert(r.head.error.isEmpty, r.toString)
      assert(r.head.ingested == 12L, r.toString) // 3 messages × 4 points
      assert(r.head.publishedDates == Seq("2000-01-01"), r.toString)
      // the landing dir holds ONLY the unwrapped twin…
      val names = new java.io.File(landing).listFiles().map(_.getName).toSet
      assert(names == Set("d.grb"), names)
      // …so the DSv2 plan over it fans out PER MESSAGE — the scale
      // point of unwrapping on landing (wrapped: 1 serial split)
      val parts = spark.read.format("graft.sources.GribGridSource")
        .option("path", landing).load().rdd.getNumPartitions
      assert(parts == 3, s"expected 3 per-message splits, got $parts")
    }
    // corrupt download: the unwrap refuses BY NAME, no unwrapped or
    // tmp residue appears, and the wrapped file survives for the
    // next cycle's retry (watermark semantics stay intact upstream)
    val bad = java.util.Arrays.copyOf(gz, gz.length - 5)
    withServer { ex =>
      ex.sendResponseHeaders(200, bad.length.toLong)
      ex.getResponseBody.write(bad)
    } { base =>
      val landing2 = s"$root/landing2"
      val e = intercept[IllegalArgumentException] {
        new HttpFetcher().fetchGunzipped(
          s"$base/d.grb.gz", s"$landing2/d.grb.gz")
      }
      assert(e.getMessage.contains("gzip"), e.getMessage)
      val left = new java.io.File(landing2).listFiles().map(_.getName).toSet
      assert(left == Set("d.grb.gz"), left)
    }
    // a non-.gz name refuses up front — nothing to strip
    val eName = intercept[IllegalArgumentException] {
      Gz.gunzipLanding(java.nio.file.Paths.get(s"$root/plain.grb"))
    }
    assert(eName.getMessage.contains(".gz"), eName.getMessage)
  }

  test("deleteWrapped: a concurrently-removed wrapped original is a quiet " +
      "no-op; a genuine delete failure names BOTH twins for the operator") {
    import graft.sources.Gz
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_delw")
    // the gz already gone (another cycle unwrapped the same file):
    // that cycle's landing SUCCEEDED — deleteIfExists, never a
    // NoSuchFileException failing a completed landing (r15 advice)
    Gz.deleteWrapped(dir.resolve("gone.grb.gz"), dir.resolve("gone.grb"))
    // an un-deletable path (a non-empty directory bearing the wrapped
    // name) rethrows WITH the both-twins context the raw IO error
    // lacks (r15 verdict item 3a)
    val gzDir = dir.resolve("x.grb.gz")
    Files.createDirectory(gzDir)
    Files.write(gzDir.resolve("child"), Array[Byte](1))
    val e = intercept[java.io.IOException] {
      Gz.deleteWrapped(gzDir, dir.resolve("x.grb"))
    }
    assert(e.getMessage.contains("both twins co-exist"), e.getMessage)
    assert(e.getMessage.contains("x.grb.gz"), e.getMessage)
    assert(e.getCause.isInstanceOf[java.io.IOException], String.valueOf(e.getCause))
  }

  test("fetchGunzippedIfChanged: 200 lands UNWRAPPED and stores the validator; " +
      "304 skips without touching the landing dir or re-unwrapping; a corrupt " +
      "landing never wedges the watermark") {
    import graft.sources.Gz
    import java.nio.file.{Files, Paths}
    @volatile var etag = "\"v1\""
    @volatile var content = Gz.gzip("generation-1 content".getBytes("UTF-8"))
    withServer { ex =>
      val sent = Option(ex.getRequestHeaders.getFirst("If-None-Match"))
      if (sent.contains(etag)) ex.sendResponseHeaders(304, -1)
      else {
        ex.getResponseHeaders.set("ETag", etag)
        ex.sendResponseHeaders(200, content.length.toLong)
        ex.getResponseBody.write(content)
      }
    } { base =>
      val dir = Files.createTempDirectory("graft_condgz").toString
      val dest = s"$dir/slice.bin.gz"
      val f = new HttpFetcher()
      def names = new java.io.File(dir).listFiles().map(_.getName).toSet
      // cycle 1: lands + unwraps; the wrapped file is gone, the
      // returned path is the UNWRAPPED twin
      val p1 = f.fetchGunzippedIfChanged(s"$base/f", dest)
      assert(p1.map(_.getFileName.toString).contains("slice.bin"), p1.toString)
      assert(new String(Files.readAllBytes(p1.get), "UTF-8") ==
        "generation-1 content")
      assert(names == Set("slice.bin", "slice.bin.gz.http-state"), names)
      // cycle 2, nothing new: 304 → None, landing dir byte-identical —
      // in particular NO re-unwrap attempt of the (absent) wrapped file
      // (r15 verdict item 3b)
      assert(f.fetchGunzippedIfChanged(s"$base/f", dest).isEmpty)
      assert(names == Set("slice.bin", "slice.bin.gz.http-state"), names)
      assert(new String(Files.readAllBytes(Paths.get(s"$dir/slice.bin")),
        "UTF-8") == "generation-1 content")
      // remote publishes generation 2: validator mismatch → re-land,
      // re-unwrap, new validator stored
      etag = "\"v2\""
      content = Gz.gzip("generation-2!".getBytes("UTF-8"))
      val p3 = f.fetchGunzippedIfChanged(s"$base/f", dest)
      assert(p3.isDefined)
      assert(new String(Files.readAllBytes(p3.get), "UTF-8") == "generation-2!")
      assert(f.fetchGunzippedIfChanged(s"$base/f", dest).isEmpty, "304 on v2")
      // a non-.gz dest refuses up front, before any network call
      val eName = intercept[IllegalArgumentException] {
        f.fetchGunzippedIfChanged(s"$base/f", s"$dir/plain.bin")
      }
      assert(eName.getMessage.contains(".gz"), eName.getMessage)
    }
    // corrupt download: the unwrap refuses by name and the NEXT cycle
    // re-downloads in FULL — the stored validator must not be replayed
    // while the unwrapped twin is missing (a 304 would bless content
    // that never landed)
    val goodGz = Gz.gzip("finally whole".getBytes("UTF-8"))
    val badGz = java.util.Arrays.copyOf(goodGz, goodGz.length - 5)
    @volatile var serveBad = true
    withServer { ex =>
      val sent = Option(ex.getRequestHeaders.getFirst("If-None-Match"))
      if (sent.contains("\"vX\"")) ex.sendResponseHeaders(304, -1)
      else {
        val body = if (serveBad) badGz else goodGz
        ex.getResponseHeaders.set("ETag", "\"vX\"")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
      }
    } { base =>
      val dir = Files.createTempDirectory("graft_condgz2").toString
      val dest = s"$dir/slice.bin.gz"
      val f = new HttpFetcher()
      val e = intercept[IllegalArgumentException] {
        f.fetchGunzippedIfChanged(s"$base/f", dest)
      }
      assert(e.getMessage.contains("gzip"), e.getMessage)
      assert(!Files.exists(Paths.get(s"$dir/slice.bin")), "nothing landed")
      // the no-validators crash contract: validators are written only
      // AFTER the unwrap, so a refused landing stores none — there is
      // no window where new validators sit beside stale/absent content
      assert(!Files.exists(Paths.get(s"$dir/slice.bin.gz.http-state")),
        "no validators may be stored for content that never unwrapped")
      // retry cycle: the server now has the whole file; a wrongly
      // replayed validator would 304 and return None here
      serveBad = false
      val p = f.fetchGunzippedIfChanged(s"$base/f", dest)
      assert(p.isDefined, "validator must not be replayed without the unwrapped twin")
      assert(new String(Files.readAllBytes(p.get), "UTF-8") == "finally whole")
    }
  }
}
