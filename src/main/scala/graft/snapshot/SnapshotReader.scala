package graft.snapshot

import java.time.{Duration, Instant}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{MalformedManifest, Manifest}

/** A query arrived while no snapshot generation is loaded AND the
  * publish pointer yields nothing adoptable — unreadable (torn by a
  * non-atomic foreign writer, or an IO error) or simply absent (fresh
  * deployment, first publish pending). Typed so the serving layer can
  * answer 503 + Retry-After (a controlled "come back shortly") instead
  * of a stack-trace 500: a running publisher's next cycle writes the
  * pointer, so this is always transient.
  *
  * `retryAfterSeconds` carries the reader's CONFIGURED cold-retry
  * backoff (ceiled to whole seconds, floor 1) so the HTTP layer's
  * Retry-After header tells clients the truth: with a hardcoded "1"
  * and a 30 s backoff, 29 of every 30 advised retries would burn a
  * rate-limit token on a replayed cached failure.
  */
final class SnapshotUnavailableException(msg: String,
                                         cause: Throwable = null,
                                         val retryAfterSeconds: Long = 1L)
  extends RuntimeException(msg, cause)

/** Serving-side snapshot resolution with the reference's freshness
  * contract (api-service/src/query_engine.py:78-115): a TTL-cached view
  * of `current/manifest.json`; when the TTL lapses the manifest is
  * re-read and, if the version moved, the temp views are re-registered
  * against the new generation's parquet dirs. No data download step —
  * executors read the (possibly remote) parquet directly.
  *
  * Also recreates the reference's built-in derived view
  * `v_inventory_summary` (etl-service/src/sync.py:105-114) whenever an
  * `inventory` table is present.
  */
/** One adopted generation: the manifest plus the CHILD SparkSession
  * whose temp-view catalog holds exactly that generation's tables.
  * Swapped as a single volatile reference (round 15) — see
  * `SnapshotReader.register` for why this closes the mixed-catalog
  * window the per-view swap loop used to have.
  */
private[snapshot] final case class Served(manifest: Manifest,
                                          session: SparkSession)

final class SnapshotReader(store: SnapshotStore,
                           ttl: Duration = Duration.ofSeconds(120),
                           clock: () => Instant = () => Instant.now(),
                           coldRetryBackoff: Duration = Duration.ofSeconds(1)) {

  // what Retry-After should advise: the next probe is no sooner than
  // the backoff, so advising anything shorter schedules guaranteed
  // cache-hit failures
  private val retryAfterSeconds: Long =
    math.max(1L, (coldRetryBackoff.toMillis + 999L) / 1000L)

  @volatile private var served: Option[Served] = None
  @volatile private var loadedAt: Option[Instant] = None
  private def loadedVersion: Option[String] = served.map(_.manifest.version)
  // cold-boot failed-probe state, for backoff: (at, cause, retryable).
  // retryable=true → taxonomy failures, replayed as the 503-shaped
  // SnapshotUnavailableException; false → a bug-shaped fault, replayed
  // AS ITSELF so it keeps surfacing as a 500 — but still without
  // re-probing the store inside the window
  @volatile private var lastColdFailure:
    Option[(Instant, Throwable, Boolean)] = None
  // test observability: how many times the pointer was actually read
  private[graft] val pointerProbes =
    new java.util.concurrent.atomic.AtomicLong(0)

  def currentManifest: Option[Manifest] = served.map(_.manifest)

  def tableNames: Seq[String] =
    currentManifest.map(_.tables.keys.toSeq.sorted).getOrElse(Seq.empty)

  /** The serving session: a query executed against it (`session.sql`,
    * `session.table`) sees ONE generation's tables, atomically. Capture
    * it ONCE per query — a single volatile read — and run the whole
    * query against the captured session; a refresh landing mid-query
    * publishes a NEW session and never mutates this one, so an
    * in-flight query keeps a consistent catalog for its whole life
    * (the serving analog of snapshot isolation). Falls back to the
    * store's session when nothing is adopted yet, where the catalog is
    * simply empty — refreshIfStale throws before any query reaches SQL
    * in that state.
    */
  def session: SparkSession = served.map(_.session).getOrElse(store.spark)

  /** Re-resolve the manifest if the TTL has lapsed — or on EVERY call
    * while nothing is loaded yet (reference parity: `_get_connection`
    * always downloads when it has no open snapshot,
    * api-service/src/query_engine.py:98-108; only a loaded snapshot is
    * TTL-cached).
    *
    * Absent or unreadable pointer while a snapshot IS loaded: keep
    * serving the loaded generation. The publish pointer swap is
    * rename-based; on object stores (s3a rename = copy+delete) a
    * crashed publisher can leave `current/manifest.json` momentarily
    * absent, and that window must degrade to staleness, never to an
    * outage — the generation's data and manifest are always complete
    * before the pointer moves (SnapshotWriter orders them), so the
    * last-registered views stay valid. The next TTL lapse retries.
    *
    * Cold boot with no adoptable snapshot — pointer torn/unreadable OR
    * simply absent (fresh deployment, first publish pending): retry-
    * with-backoff, not crash-loop. Each failed probe
    * raises a typed [[SnapshotUnavailableException]] (the serving layer
    * maps it to 503 + Retry-After) and arms `coldRetryBackoff`; calls
    * inside the backoff window replay the cached failure WITHOUT
    * re-reading the store, so a request storm during the torn window
    * costs one pointer read per backoff period, not one per request.
    * The pointer self-heals on the publisher's next cycle; the first
    * probe after it does loads and serves normally.
    *
    * Failure typing is asymmetric by state (r11 ADVICE):
    *  - WHILE LOADED, any non-fatal refresh failure degrades to serving
    *    the loaded generation as stale, LOGGED — store clients (Hadoop
    *    s3a, object-store SDK shims) surface transient faults as
    *    RuntimeException subclasses no taxonomy can enumerate, and
    *    flipping a working deployment from "stale for one TTL" to
    *    "500 per query" over an unrecognized exception class is the
    *    wrong trade. The log line keeps a genuine bug from hiding: it
    *    prints every TTL lapse until fixed.
    *  - COLD, only parse-shaped (MalformedManifest) and IO failures
    *    map to the retryable 503 — anything else propagates AS ITSELF.
    *    With nothing loaded there is no safe degraded state, so a bug
    *    must surface as a bug, not masquerade as "not published yet".
    *    BOTH arms arm the backoff (r12 ADVICE): the same shim-wrapped
    *    RuntimeException a store client throws transiently would
    *    otherwise drive one store probe per request during a cold boot
    *    — the exact storm the backoff exists to cap. Inside the window
    *    the cached throwable is replayed without touching the store;
    *    the response shape (500 vs 503) is unchanged by the cap.
    */
  def refreshIfStale(): Boolean = synchronized {
    val now = clock()
    val stale = loadedVersion.isEmpty || loadedAt.forall(t =>
      Duration.between(t, now).compareTo(ttl) >= 0)
    if (!stale) return false
    if (loadedVersion.isEmpty) lastColdFailure match {
      case Some((t, e, retryable))
          if Duration.between(t, now).compareTo(coldRetryBackoff) < 0 =>
        if (retryable) throw new SnapshotUnavailableException(
          s"snapshot not yet available (retrying with backoff): " +
            s"${e.getMessage}", e, retryAfterSeconds)
        else throw e // a bug replays as a bug — throttled, not re-typed
      case _ => ()
    }
    loadedAt = Some(now)
    val read = try {
      pointerProbes.incrementAndGet()
      store.readCurrentManifest()
    } catch {
      // torn/garbage pointer (a non-rename writer mid-overwrite) or an
      // IO blip: while loaded, identical to absent; first load has
      // nothing to fall back to, so surface it — typed, with backoff
      case e @ (_: MalformedManifest | _: java.io.IOException) =>
        if (loadedVersion.nonEmpty) None
        else {
          lastColdFailure = Some((now, e, true))
          throw new SnapshotUnavailableException(
            s"no snapshot loaded and the publish pointer is unreadable" +
              s" — transient if a publisher is running (it rewrites the" +
              s" pointer every cycle): ${e.getMessage}", e,
            retryAfterSeconds)
        }
      // loaded + an exception outside the taxonomy (store-client shims
      // wrap IO faults in RuntimeExceptions): degrade to stale, loudly
      // — a genuine bug keeps printing every TTL lapse, but a working
      // deployment never flips to a 500 storm over a refresh blip
      case e if loadedVersion.nonEmpty &&
          scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[snapshot] WARNING: manifest refresh failed with " +
            s"${e.getClass.getName}: ${e.getMessage} — continuing to " +
            s"serve loaded generation ${loadedVersion.get} as stale; " +
            "if this is not a transient store fault, it is a bug")
        None
      // cold + outside the taxonomy: surface the bug AS ITSELF, but arm
      // the backoff first — a cold boot during a shim-wrapped transient
      // store fault must not probe the store once per request (the 500s
      // inside the window are throttled replays of THIS throwable)
      case e if loadedVersion.isEmpty &&
          scala.util.control.NonFatal(e) =>
        lastColdFailure = Some((now, e, false))
        throw e
    }
    read match {
      case Some(m) if !loadedVersion.contains(m.version) =>
        // adopting the generation can itself fail — a damaged dir
        // behind a valid manifest (foreign partial delete; the writer
        // always completes data before the swap). Same state-dependent
        // policy as the pointer probe: loaded degrades to serving the
        // loaded generation as stale, loudly (register is
        // all-or-nothing, so the catalog still serves it consistently);
        // cold surfaces the fault as itself but arms the backoff so a
        // request storm replays it instead of re-reading footers per
        // request. Either way the publisher's next cycle writes a
        // fresh generation and the next lapse adopts it.
        try { register(m); lastColdFailure = None; true }
        catch {
          case e if loadedVersion.nonEmpty &&
              scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[snapshot] WARNING: generation ${m.version} is " +
                s"unreadable (${e.getClass.getName}: ${e.getMessage}) — " +
                s"continuing to serve loaded generation " +
                s"${loadedVersion.get} as stale; if no foreign writer " +
                "damaged the store, this is a bug")
            false
          case e if loadedVersion.isEmpty &&
              scala.util.control.NonFatal(e) =>
            lastColdFailure = Some((now, e, false))
            throw e
        }
      case Some(_) =>
        lastColdFailure = None
        false
      case None if loadedVersion.isEmpty =>
        // cold + ABSENT pointer (fresh deployment, nothing published
        // yet): the same retryable-503 policy as the torn window — a
        // plain `false` here used to let the query proceed into a raw
        // "table not found" 500 storm with an unthrottled exists()
        // probe per request. The publisher's FIRST cycle creates the
        // pointer, so this too is always transient.
        val e = new SnapshotUnavailableException(
          "no snapshot published yet — the publish pointer is absent;" +
            " transient if a publisher is running (its first cycle" +
            " creates it)", null, retryAfterSeconds)
        lastColdFailure = Some((now, e, true))
        throw e
      case None => false // loaded: absent pointer degrades to staleness
    }
  }

  def table(name: String): DataFrame =
    session.table(name)

  private def register(m: Manifest): Unit = {
    // Zero-width swap (round 15; closes the r14-documented limitation):
    // the generation's views are registered in a FRESH child session
    // (same SparkContext, its own temp-view catalog) that no query can
    // see until the single volatile write of `served` below. The old
    // per-view createOrReplaceTempView loop over the SHARED session
    // meant a query racing a successful refresh could resolve some
    // tables against the new generation and some against the old —
    // cross-generation joins in a microseconds-but-nonzero window.
    // Now: adoption failure-atomic (a damaged dir fails the parquet
    // footer/schema read here, `served` untouched, the loaded
    // generation keeps serving) AND publication atomic (one reference
    // write); an in-flight query that captured the previous session
    // keeps its complete old catalog — nothing is ever mutated behind
    // it. Old sessions are unreferenced once their queries finish and
    // are GC'd; a child session is a driver-side metadata object
    // (shared SparkContext/executors), so one per adoption at a 60 s
    // publish cadence is noise.
    val s = store.spark.newSession()
    m.tables.keys.toSeq.foreach { t =>
      s.read.parquet(store.tableDir(m.version, t).toString)
        .createOrReplaceTempView(t)
    }
    if (m.tables.contains("inventory")) {
      s.sql(
        """CREATE OR REPLACE TEMP VIEW v_inventory_summary AS
          |SELECT COUNT(*)        AS total_items,
          |       SUM(quantity)   AS total_quantity,
          |       AVG(price)      AS avg_price,
          |       MIN(updated_at) AS oldest_update,
          |       MAX(updated_at) AS latest_update
          |FROM inventory""".stripMargin)
    }
    served = Some(Served(m, s))
  }
}
