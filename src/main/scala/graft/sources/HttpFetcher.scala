package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Duration

/** Thin HTTP acquisition client — the "bytes landed" boundary the rest
  * of the engine starts from, closing the reference's remote-download
  * path (`ingest/utils.py:121` download_file_temp / `:130`
  * download_to_file: streamed GET to a temp file, then moved into
  * place; `ecmwf_opendata/client.py:25` latest(): HEAD-probe candidate
  * URLs NEWEST-FIRST until one answers 200, with bounded retries).
  * Re-expressed on java.net.http — no library dependency, and the
  * landing contract matches what [[Jobs]]/[[Publish]] already assume:
  *
  *   - downloads stream to a `.tmp-*` sibling and are MOVED into place
  *     (atomic on the same filesystem), so a reader — including a
  *     Spark file source listing the landing dir — can never observe a
  *     partial file;
  *   - [[fetchIfChanged]] is the HTTP-level watermark: it replays the
  *     stored ETag / Last-Modified validators as If-None-Match /
  *     If-Modified-Since and treats 304 as the reference's
  *     "No update required. Skipping" — no bytes move, the caller's
  *     ingest cycle skips idempotently;
  *   - transient failures (connect/read errors, 5xx, 429) retry with
  *     linear backoff up to `maxRetries` (the reference's `robust()`
  *     wrapper); 4xx other than 404/429 fail immediately — retrying a
  *     permanent rejection just hides a config error.
  *
  * Scale shape: acquisition is DRIVER-side by design — the reference
  * ingests one bounded slice per cycle (a forecast run, a dekad), not
  * data-plane volume. Corpus-scale transfer belongs to the cluster's
  * distributed copy, not this shim. */
final class HttpFetcher(
    timeoutMs: Long = 30000L,
    maxRetries: Int = 3,
    retryBackoffMs: Long = 200L,
    auth: Option[HttpAuth] = None) {

  // redirects are followed MANUALLY (Redirect.NEVER): the JDK client
  // re-issues caller-set headers on redirect, which would forward the
  // Authorization credential to whatever origin a 302 points at — a
  // compromised mirror would harvest tokens (r9 review). sendFollowing
  // re-attaches auth only when the hop stays on the ORIGINAL origin
  // (curl's credential-scoping rule).
  private val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NEVER)
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()

  private val MaxRedirects = 5

  private def sameOrigin(a: URI, b: URI): Boolean =
    a.getScheme == b.getScheme && a.getHost == b.getHost &&
      a.getPort == b.getPort

  /** Send with manual redirect-following: `build` applies the method
    * and request headers to each hop's builder; auth rides only
    * same-origin hops. GET/HEAD is preserved across 301/302/303/307/
    * 308 (the only methods this client issues). */
  private def sendFollowing[T](url: String,
      build: HttpRequest.Builder => HttpRequest.Builder,
      handler: HttpResponse.BodyHandler[T]): HttpResponse[T] = {
    val original = URI.create(url)
    var current = original
    var hops = 0
    while (true) {
      val b = HttpRequest.newBuilder(current)
        .timeout(Duration.ofMillis(timeoutMs))
      if (sameOrigin(current, original))
        auth.foreach(a => b.header("Authorization", a.headerValue))
      val resp = client.send(build(b).build(), handler)
      resp.statusCode() match {
        case 301 | 302 | 303 | 307 | 308 =>
          hops += 1
          if (hops > MaxRedirects) throw new HttpFetcher.RedirectLoop(
            s"$url: more than $MaxRedirects redirects")
          val loc = resp.headers().firstValue("Location")
          if (!loc.isPresent) return resp // malformed: surface as-is
          current = current.resolve(loc.get)
        case _ => return resp
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Retry transient failures (IO, 5xx, 429) with linear backoff;
    * return the first conclusive response. */
  private def robust[T](send: () => HttpResponse[T]): HttpResponse[T] = {
    var attempt = 0
    var last: Either[Throwable, HttpResponse[T]] = null
    while (attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(retryBackoffMs * attempt)
      attempt += 1
      last =
        try {
          val r = send()
          val transient = r.statusCode() >= 500 || r.statusCode() == 429
          if (!transient) return r
          Right(r)
        } catch {
          // a redirect loop is a permanent server misconfiguration,
          // not a transient failure — retrying just replays the loop
          case e: HttpFetcher.RedirectLoop => throw e
          case e: java.io.IOException => Left(e)
        }
    }
    last match {
      case Right(r) => r
      case Left(e) => throw new java.io.IOException(
        s"fetch failed after $maxRetries retries", e)
    }
  }

  /** HEAD status of a URL (200 = slice available — the probe the
    * reference's latest() walk issues per candidate). */
  def head(url: String): Int =
    robust(() => sendFollowing(url,
      _.method("HEAD", HttpRequest.BodyPublishers.noBody()),
      HttpResponse.BodyHandlers.discarding())).statusCode()

  /** Walk candidate slices NEWEST-FIRST and return the first whose
    * HEAD answers 200 — the reference's latest-date establishment
    * (`client.py:25`): step back through candidate dates until the
    * remote actually has the data. `candidates` must be ordered
    * newest-first; None if nothing is available. */
  def latestAvailable[K](candidates: Seq[(K, String)]): Option[K] =
    candidates.collectFirst { case (k, url) if head(url) == 200 => k }

  /** Streamed GET → `.tmp-*` sibling → atomic move. Throws on any
    * non-2xx final status; the destination is either the complete new
    * content or untouched. Returns the landed path. */
  def fetch(url: String, dest: String): Path = {
    val destPath = Paths.get(dest)
    Option(destPath.getParent).foreach(Files.createDirectories(_))
    val tmp = destPath.resolveSibling(
      s".tmp-${java.util.UUID.randomUUID()}")
    // retries exhausted ⇒ robust() throws from inside the send — the
    // partially-written temp must not accumulate in the landing dir
    // (review finding r8: the atomic-landing contract includes the
    // FAILURE path)
    val resp =
      try robust(() => sendFollowing(url, _.GET(),
        HttpResponse.BodyHandlers.ofFile(tmp,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)))
      catch { case e: Throwable => Files.deleteIfExists(tmp); throw e }
    if (resp.statusCode() / 100 != 2) {
      Files.deleteIfExists(tmp)
      throw new java.io.IOException(
        s"GET $url failed: HTTP ${resp.statusCode()}")
    }
    try Files.move(tmp, destPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, destPath, StandardCopyOption.REPLACE_EXISTING)
    }
    destPath
  }

  /** [[fetch]] + gunzip-on-landing: stream the download to `dest`
    * (whose name must end `.gz`), then inflate it to the unwrapped
    * sibling via [[Gz.gunzipLanding]] and drop the wrapped file — the
    * reference's own download path for gz-distributed products
    * (`chirps_rainfall/__init__.py:334` gunzips `*.tif.gz` on fetch).
    * Landing unwrapped keeps per-record DSv2 planners fanning out:
    * [[GribGridSource]] plans ONE whole-file split for a `.grb.gz`
    * but per-message splits for its unwrapped twin. Returns the
    * UNWRAPPED path; both the download and the inflation keep the
    * atomic tmp→move contract, so a crash at any point retries
    * cleanly next cycle. */
  def fetchGunzipped(url: String, dest: String,
      cap: Long = 1L << 33): Path =
    Gz.gunzipLanding(fetch(url, dest), cap)

  /** Land a SET of slices with bounded concurrency — the reference's
    * per-cycle multi-file walk (`ecmwf_opendata/client.py` downloads
    * one file per forecast step; a date's file set lands together).
    * Each download keeps the atomic tmp→move contract; results return
    * in input order. ALL downloads are attempted even when one fails
    * (a partial forecast is retried idempotently next cycle), then the
    * first failure is rethrown with the failed count — a silent
    * partial landing is exactly what the atomic contract exists to
    * prevent. */
  def fetchAll(urlsToDests: Seq[(String, String)],
      parallelism: Int = 4): Seq[Path] = {
    require(parallelism >= 1, s"bad parallelism $parallelism")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, math.max(1, urlsToDests.size)))
    try {
      val futures = urlsToDests.map { case (url, dest) =>
        pool.submit(new java.util.concurrent.Callable[Path] {
          override def call(): Path = fetch(url, dest)
        })
      }
      val results = futures.map { f =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left(Option(e.getCause).getOrElse(e))
        }
      }
      val failures = results.collect { case Left(e) => e }
      if (failures.nonEmpty)
        throw new java.io.IOException(
          s"${failures.size}/${urlsToDests.size} downloads failed; first: " +
            failures.head.getMessage, failures.head)
      results.collect { case Right(p) => p }
    } finally pool.shutdown()
  }

  /** Conditional fetch — the HTTP-level incremental-watermark rung:
    * stored validators (ETag, Last-Modified — kept in a sidecar file
    * next to `dest`, the read_state/update_state shape of
    * `ingest/utils.py:96`) are replayed as If-None-Match /
    * If-Modified-Since; 304 returns None (nothing moved, cycle
    * skips), 200 lands the new content atomically and stores the new
    * validators. */
  def fetchIfChanged(url: String, dest: String): Option[Path] = {
    val destPath = Paths.get(dest)
    fetchIfChangedAt(url, destPath, contentAt = destPath)
  }

  /** [[fetchIfChanged]] + gunzip-on-landing: the conditional-GET
    * watermark for gz-distributed products. 304 returns None WITHOUT
    * touching the landing dir — nothing downloaded, so there is no
    * temp to unwrap and the previously-landed unwrapped twin stands
    * (r15 review: the skip path must never attempt a re-unwrap of a
    * missing file). 200 lands `dest` (whose name must end `.gz`)
    * atomically, inflates it to the unwrapped sibling via
    * [[Gz.gunzipLanding]], and returns the UNWRAPPED path.
    *
    * The stored validators are replayed only while the UNWRAPPED twin
    * exists — the `.gz` itself is deleted as gunzip-on-landing's last
    * step, so keying the replay on it (as the plain [[fetchIfChanged]]
    * does on its dest) would re-download every cycle. And they are
    * written only AFTER the unwrap lands (the `postLand` ordering
    * below): a corrupt download refuses mid-unwrap and leaves the
    * wrapped file but NO validators, so the next cycle re-downloads
    * in full rather than 304-skipping content that never landed. */
  def fetchGunzippedIfChanged(url: String, dest: String,
      cap: Long = 1L << 33): Option[Path] = {
    val destPath = Paths.get(dest)
    // ONE sibling derivation (and '.gz' gate), shared with the unwrap
    // itself — a drifted anchor would silently disable the 304 skip
    fetchIfChangedAt(url, destPath,
      contentAt = Gz.unwrappedSibling(destPath),
      postLand = Gz.gunzipLanding(_, cap))
  }

  /** Core of the conditional fetch: `contentAt` is the path whose
    * presence proves the PREVIOUS cycle's content actually landed —
    * the stored validators are replayed only then, so a 304 can never
    * bless content that is gone (retention-deleted, or a gz whose
    * unwrap failed). The plain fetch keys on its own dest; the
    * gunzipped fetch keys on the unwrapped twin.
    *
    * `postLand` runs between the content move and the NEW-validator
    * write, and its result is what the caller gets back — for the
    * gunzipped flavor it is the unwrap. The ordering is load-bearing:
    * the validators attest `contentAt`, which for a wrapped download
    * only becomes current once the unwrap lands, so writing them
    * before `postLand` would open a crash window (landed `.gz`, new
    * validators, STALE unwrapped twin) where the next cycle's 304
    * blesses the stale content. With the unwrap inside, every crash
    * window leaves either no validators (redundant re-download next
    * cycle) or validators beside their own content — the same
    * contract the plain fetch documents. A `postLand` throw (corrupt
    * stream) likewise leaves no validators, so the retry re-downloads
    * in full. */
  private def fetchIfChangedAt(url: String, destPath: Path,
      contentAt: Path, postLand: Path => Path = identity): Option[Path] = {
    val sidecar = destPath.resolveSibling(destPath.getFileName.toString + ".http-state")
    val validators: Map[String, String] =
      if (Files.exists(sidecar) && Files.exists(contentAt))
        Files.readAllLines(sidecar).toArray(Array.empty[String]).flatMap { l =>
          l.split("\t", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
        }.toMap
      else Map.empty
    Option(destPath.getParent).foreach(Files.createDirectories(_))
    val tmp = destPath.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
    val resp =
      try robust(() => sendFollowing(url, b => {
        validators.get("etag").foreach(b.header("If-None-Match", _))
        validators.get("last-modified").foreach(b.header("If-Modified-Since", _))
        b.GET()
      },
        HttpResponse.BodyHandlers.ofFile(tmp,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)))
      catch { case e: Throwable => Files.deleteIfExists(tmp); throw e }
    resp.statusCode() match {
      case 304 =>
        Files.deleteIfExists(tmp)
        None
      case ok if ok / 100 == 2 =>
        // Crash-ordering contract (r8 advice): the OLD validators are
        // removed BEFORE the new content lands, and the NEW validators
        // are written (tmp → atomic move, never torn) only AFTER it.
        // Every crash window therefore leaves content with either no
        // validators or its own — the worst outcome is a redundant
        // re-download, never a 304 that wrongly skips new remote
        // content because stale validators sat beside it.
        Files.deleteIfExists(sidecar)
        try Files.move(tmp, destPath, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(tmp, destPath, StandardCopyOption.REPLACE_EXISTING)
        }
        // postLand (the gunzipped flavor's unwrap) BEFORE the new
        // validators: they attest contentAt, which is only current
        // once this step lands — see the Scaladoc ordering note
        val landed = postLand(destPath)
        val lines = Seq(
          resp.headers().firstValue("ETag").map(v => s"etag\t$v"),
          resp.headers().firstValue("Last-Modified").map(v => s"last-modified\t$v"))
          .flatMap(o => if (o.isPresent) Some(o.get) else None)
        val scTmp = sidecar.resolveSibling(
          s".tmp-${java.util.UUID.randomUUID()}")
        Files.write(scTmp, lines.mkString("\n").getBytes("UTF-8"))
        try Files.move(scTmp, sidecar, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(scTmp, sidecar, StandardCopyOption.REPLACE_EXISTING)
        }
        Some(landed)
      case bad =>
        Files.deleteIfExists(tmp)
        throw new java.io.IOException(s"GET $url failed: HTTP $bad")
    }
  }
}

object HttpFetcher {
  /** Non-retryable: a redirect chain exceeding the hop cap. */
  private[sources] final class RedirectLoop(msg: String)
    extends java.io.IOException(msg)
}

/** Credential carried on every request the fetcher issues — the
  * reference's two download auth shapes (`ingest/utils.py:121`
  * `download_file_temp(url, auth=(user, password))` → HTTP Basic;
  * `ingest/auth.py:4` BearerAuth / `modis/__init__.py:35` auth_token →
  * `Authorization: Bearer <token>`). Secrets NEVER appear in
  * toString/logs — both carriers redact. */
sealed trait HttpAuth {
  /** The `Authorization` header value. */
  def headerValue: String
}

final case class BasicAuth(username: String, password: String) extends HttpAuth {
  def headerValue: String = "Basic " + java.util.Base64.getEncoder
    .encodeToString(s"$username:$password".getBytes("UTF-8"))
  override def toString: String = s"BasicAuth($username, ****)"
}

final case class BearerAuth(token: String) extends HttpAuth {
  def headerValue: String = s"Bearer $token"
  override def toString: String = "BearerAuth(****)"
}
