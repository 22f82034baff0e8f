package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.sql.Timestamp
import java.time.{Duration, Instant}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec
import graft.ingest.{ParquetSource, SyncManager}
import graft.query.{QueryEngine, RateLimiter}
import graft.snapshot.{SnapshotReader, SnapshotStore, SnapshotUnavailableException}

/** Boot policy inside a torn-pointer window (the one state r10's
  * pointer specs left undefined): a serving process that comes up COLD
  * while `current/manifest.json` is garbage must neither crash-loop nor
  * storm 5xx stack traces — it retries with backoff and recovers the
  * moment the pointer heals.
  *
  * Pinned contract:
  *  - the HTTP server boots and stays up (no crash-loop);
  *  - /query and /schema answer a controlled 503 + Retry-After with the
  *    standard error envelope (not a stack-trace 500);
  *  - however hard clients hammer, the store's pointer is probed at
  *    most once per backoff period (a request storm ≠ a store storm);
  *  - /health stays 200 (liveness ≠ readiness — the scheduler keeps the
  *    process alive so its own sync loop can heal the pointer);
  *  - the first probe after the pointer heals loads the generation and
  *    serving flips to 200 with data, no restart needed.
  */
class ServeBootSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  test("concurrent cold storm: the backoff bounds store probes across threads") {
    // the sequential test below pins the behavior; this one pins its
    // THREAD-SAFETY — 8 request threads hammering a cold reader inside
    // one frozen backoff window must produce exactly one store probe
    // (refreshIfStale is synchronized; the cached failure replays), and
    // every caller must get the typed unavailability, never a raw
    // parse error or a half-registered catalog
    val srcDir = Files.createTempDirectory("graft-boot2-src").toString
    val snapDir = Files.createTempDirectory("graft-boot2-snap").toString
    Seq((1L, 5L, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "quantity", "updated_at")
      .write.parquet(s"$srcDir/inventory.parquet")
    val store = new SnapshotStore(spark, snapDir)
    val sync = new SyncManager(spark,
      new ParquetSource(srcDir, Seq("inventory")), store)
    assert(sync.runCycle(Instant.parse("2024-11-02T00:00:00Z")).success)
    store.writeString(store.currentManifestPath, "{torn")
    val now = Instant.parse("2024-11-02T01:00:00Z")
    val reader = new SnapshotReader(store, clock = () => now,
      coldRetryBackoff = Duration.ofSeconds(1))
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 8).map(_ => new Thread(() =>
      (1 to 50).foreach { _ =>
        try { reader.refreshIfStale(); outcomes.add("no-throw") }
        catch {
          case _: SnapshotUnavailableException => outcomes.add("typed")
          case e: Throwable => outcomes.add(s"raw:${e.getClass.getName}")
        }
      }))
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(outcomes.size == 400, s"threads hung: ${outcomes.size}")
    val byKind = outcomes.toArray.groupBy(identity).view.mapValues(_.length)
    assert(byKind.keySet == Set("typed"),
      s"non-typed outcomes under the storm: ${byKind.toMap}")
    assert(reader.pointerProbes.get() == 1,
      s"400-call concurrent storm probed the store " +
        s"${reader.pointerProbes.get()} times — backoff not thread-safe")
  }

  test("Retry-After derives from the configured cold-retry backoff") {
    // r11 verdict item 4 / ADVICE low: a hardcoded Retry-After of 1
    // with a 30 s backoff tells clients to retry 30× per window — 29
    // of them replayed cached failures that still burn rate-limit
    // tokens. The header must echo the reader's configured backoff.
    val snapDir = Files.createTempDirectory("graft-ra-snap").toString
    val store = new SnapshotStore(spark, snapDir) // nothing ever published
    val now = Instant.parse("2024-11-03T00:00:00Z")

    // exception-level: ceil to whole seconds, floor 1
    val r30 = new SnapshotReader(store, clock = () => now,
      coldRetryBackoff = Duration.ofMillis(29500))
    assert(intercept[SnapshotUnavailableException](r30.refreshIfStale())
      .retryAfterSeconds == 30L)
    val rSub = new SnapshotReader(store, clock = () => now,
      coldRetryBackoff = Duration.ofMillis(250))
    assert(intercept[SnapshotUnavailableException](rSub.refreshIfStale())
      .retryAfterSeconds == 1L)

    // HTTP-level: the header is the reader's value, end to end
    val reader = new SnapshotReader(store, clock = () => now,
      coldRetryBackoff = Duration.ofSeconds(30))
    val api = new HttpApi(new QueryEngine(spark, reader),
      rateLimiter = new RateLimiter(maxRequests = 100000))
    val port = api.start()
    try {
      val r = http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/query?q=" +
          java.net.URLEncoder.encode(
            "SELECT id, name FROM inventory ORDER BY id", "UTF-8")))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 503, s"${r.statusCode()}: ${r.body()}")
      assert(r.headers().firstValue("Retry-After").orElse("") == "30",
        s"Retry-After did not echo the configured backoff: ${r.headers()}")
    } finally api.stop()
  }

  test("cold boot under a torn pointer: controlled 503s, throttled probes, heal recovers") {
    val srcDir = Files.createTempDirectory("graft-boot-src").toString
    val snapDir = Files.createTempDirectory("graft-boot-snap").toString
    Seq((1L, "widget", 5L, 9.99, Timestamp.valueOf("2024-01-01 00:00:00")),
        (2L, "gadget", 3L, 19.50, Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("id", "name", "quantity", "price", "updated_at")
      .write.parquet(s"$srcDir/inventory.parquet")
    val store = new SnapshotStore(spark, snapDir)
    val sync = new SyncManager(spark,
      new ParquetSource(srcDir, Seq("inventory")), store)
    val r1 = sync.runCycle(Instant.parse("2024-11-01T00:00:00Z"))
    assert(r1.success, r1.error)

    // a foreign non-rename writer tears the pointer, THEN the serving
    // process boots — nothing is loaded, nothing to fall back to
    store.writeString(store.currentManifestPath, "{torn mid-writ")

    var now = Instant.parse("2024-11-01T01:00:00Z")
    val reader = new SnapshotReader(store,
      ttl = Duration.ofSeconds(120), clock = () => now,
      coldRetryBackoff = Duration.ofSeconds(1))
    val api = new HttpApi(new QueryEngine(spark, reader),
      rateLimiter = new RateLimiter(maxRequests = 100000))
    val port = api.start()
    def get(path: String): (Int, String, Option[String]) = {
      val r = http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body(),
        Option(r.headers().firstValue("Retry-After").orElse(null)))
    }
    val q = "/query?q=" + java.net.URLEncoder.encode(
      "SELECT id, name FROM inventory ORDER BY id", "UTF-8")

    try {
      // ── the storm: 25 rapid requests inside one backoff window ────
      val storm = (1 to 25).map(_ => get(q))
      storm.foreach { case (code, body, retryAfter) =>
        assert(code == 503, s"expected controlled 503, got $code: $body")
        val n = mapper.readTree(body)
        assert(!n.get("success").asBoolean() &&
          n.get("detail").asText().contains("unavailable"),
          s"not the standard error envelope: $body")
        assert(retryAfter.contains("1"), "Retry-After header missing")
      }
      assert(reader.pointerProbes.get() == 1,
        s"25-request storm probed the pointer " +
          s"${reader.pointerProbes.get()} times — backoff not biting")

      // /schema degrades the same controlled way; /health stays alive
      assert(get("/schema")._1 == 503)
      assert(get("/health")._1 == 200,
        "liveness must not couple to snapshot readiness")

      // ── backoff lapses: exactly one more probe per window ─────────
      now = now.plusMillis(1500)
      assert(get(q)._1 == 503)
      assert(reader.pointerProbes.get() == 2)

      // ── heal: the publisher's next cycle rewrites the pointer ─────
      val r2 = sync.runCycle(Instant.parse("2024-11-01T02:00:00Z"))
      assert(r2.success, r2.error)
      now = now.plusMillis(1500) // past the backoff window
      val (code, body, _) = get(q)
      assert(code == 200, s"heal did not recover serving: $code $body")
      val n = mapper.readTree(body)
      assert(n.get("success").asBoolean() && n.get("row_count").asLong() == 2L)
      assert(reader.currentManifest.get.version == r2.manifest.get.version)

      // and the engine-level surface is the typed exception, not a raw
      // parse error (what a non-HTTP embedder would catch):
      store.writeString(store.currentManifestPath, "{torn again")
      val cold2 = new SnapshotReader(store, clock = () => now)
      intercept[SnapshotUnavailableException](cold2.refreshIfStale())

      // an ABSENT pointer at cold boot (fresh deployment, first publish
      // pending) gets the same retryable policy — previously a raw
      // "table not found" 500 with an unthrottled exists() probe per
      // request; probes are bounded by the same backoff
      assert(store.fs.delete(store.currentManifestPath, false))
      val cold3 = new SnapshotReader(store, clock = () => now,
        coldRetryBackoff = Duration.ofSeconds(1))
      (1 to 20).foreach { _ =>
        val e = intercept[SnapshotUnavailableException](cold3.refreshIfStale())
        assert(e.getMessage.contains("publish pointer is absent") ||
          e.getMessage.contains("not yet available"), e.getMessage)
      }
      assert(cold3.pointerProbes.get() == 1,
        s"absent-cold storm probed ${cold3.pointerProbes.get()} times")
      // the first publish flips it to served, no restart
      val r3 = sync.runCycle(Instant.parse("2024-11-01T03:00:00Z"))
      assert(r3.success, r3.error)
      now = now.plusMillis(1500)
      assert(cold3.refreshIfStale(), "first publish was not adopted")
      assert(cold3.currentManifest.get.version == r3.manifest.get.version)
    } finally api.stop()
  }

  test("cold boot during a non-taxonomy store fault: the bug surfaces as itself, probes stay capped") {
    // r12 ADVICE: object-store client shims wrap transient IO faults in
    // RuntimeException subclasses no taxonomy can enumerate. Cold, such
    // a fault must PROPAGATE (there is no safe degraded state and a bug
    // must not masquerade as "not published yet") — but it must still
    // arm the backoff, or a request storm during the fault drives one
    // store probe per request: the exact storm coldRetryBackoff caps.
    val snapDir = Files.createTempDirectory("graft-boot-shim").toString
    class ShimFaultStore extends SnapshotStore(spark, snapDir) {
      override def readCurrentManifest(): Option[graft.model.Manifest] =
        throw new RuntimeException("shim-wrapped transient store fault")
    }
    val t0 = Instant.parse("2024-11-03T00:00:00Z")
    var now = t0
    val reader = new SnapshotReader(new ShimFaultStore, clock = () => now,
      coldRetryBackoff = Duration.ofSeconds(30))
    val e1 = intercept[RuntimeException](reader.refreshIfStale())
    assert(e1.getMessage.contains("shim-wrapped"), e1.getMessage)
    assert(!e1.isInstanceOf[SnapshotUnavailableException],
      "a cold non-taxonomy fault was re-typed into the retryable 503")
    assert(reader.pointerProbes.get() == 1)
    // a storm inside the window replays the SAME throwable, same type,
    // without touching the store
    (1 to 25).foreach { i =>
      now = t0.plusSeconds(i.toLong) // all < the 30 s window
      val e = intercept[RuntimeException](reader.refreshIfStale())
      assert(!e.isInstanceOf[SnapshotUnavailableException],
        s"replay $i re-typed the fault: ${e.getClass.getName}")
      assert(e.getMessage.contains("shim-wrapped"), e.getMessage)
    }
    assert(reader.pointerProbes.get() == 1,
      s"25-request cold storm probed the store " +
        s"${reader.pointerProbes.get()} times — backoff not armed for " +
        "non-taxonomy faults")
    // window lapses: exactly one fresh probe
    now = t0.plusSeconds(35)
    intercept[RuntimeException](reader.refreshIfStale())
    assert(reader.pointerProbes.get() == 2)
  }
}
