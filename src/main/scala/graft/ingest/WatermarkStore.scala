package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.Path
import scala.jdk.CollectionConverters._

import graft.snapshot.SnapshotStore

/** Durable per-table high-watermark state `{table → max(updated_at)}`,
  * stored as ISO timestamp strings (type-agnostic across TIMESTAMP /
  * TIMESTAMP_NTZ sources).
  *
  * The reference keeps this in memory only (`self._state`,
  * etl-service/src/sync.py:25) and therefore loses it on restart — its
  * config declares a `postgres_url` for state tracking that is never
  * used (config.py:23-24). Persisting to a JSON file next to the
  * snapshots implements that declared intent (SURVEY.md §2.9 T2).
  */
final class WatermarkStore(store: SnapshotStore) {
  private val path = new Path(store.rootPath, "state/watermarks.json")
  private val mapper = new ObjectMapper()

  private def warn(what: String): Unit = System.err.println(
    s"[watermarks] WARNING: $path $what — treating the affected " +
      "watermark(s) as absent; the next cycle re-reads those tables in " +
      "full and a successful publish rewrites the file (self-heal). If " +
      "this is not a torn foreign write, it is a bug.")

  /** True iff the stored text is a shape `save` can actually have
    * produced — i.e. `max(watermarkCol).cast("string")` over a SUPPORTED
    * watermark column type. `readChangedSince` casts the literal back to
    * the COLUMN's type, so the accepted set must cover every column type
    * the delta contract supports, not just TIMESTAMP (round 14 — the
    * timestamp-only check silently dropped legitimately-saved DATE and
    * numeric/rowversion watermarks on every load, permanently degrading
    * those tables to full re-reads each cycle while warning about
    * corruption that never happened):
    *  - TIMESTAMP / TIMESTAMP_NTZ: Spark's space-separated cast with
    *    optional fraction, plus ISO-8601 `T`/offset forms for tolerance;
    *  - DATE: `yyyy-MM-dd` (Spark's date→string cast);
    *  - numeric (int/long/decimal version counters, rowversion): an
    *    optionally-signed decimal literal. Bounded length so a garbage
    *    blob of digits still heals rather than round-tripping.
    *  - FLOAT/DOUBLE (round 15): Spark's double→string cast emits Java
    *    `Double.toString` shapes — scientific notation ("1.2345678E7",
    *    "1.0E-4") past the plain-decimal range — which the bare
    *    NumericLiteral missed, so a legitimately-saved double watermark
    *    was dropped on every load: the exact eternal-full-re-read
    *    degradation the r14 DATE/numeric fix closed. The optional
    *    bounded exponent suffix covers every FINITE double; the
    *    NON-finite casts ("NaN", "Infinity") are rejected at SAVE time
    *    instead (see [[updateAll]]) — a NaN watermark would make the
    *    strict-`>` delta predicate eternally false and silently skip
    *    every future row, so it must never be persisted at all.
    * Anything else cannot have come from `save` and is dropped as
    * garbage (see `load`'s torn-state policy).
    */
  private def parseableWatermark(s: String): Boolean =
    scala.util.Try(java.sql.Timestamp.valueOf(s)).isSuccess ||
      scala.util.Try(java.time.Instant.parse(s)).isSuccess ||
      scala.util.Try(java.time.LocalDateTime.parse(s)).isSuccess ||
      scala.util.Try(java.sql.Date.valueOf(s)).isSuccess ||
      WatermarkStore.NumericLiteral.matches(s)

  /** Loads the persisted state. Torn-state policy (round 13 — same
    * threat model as the publish pointer: tmp+rename writes, but a
    * foreign non-rename writer or partial store failure can still
    * leave garbage): a GARBAGE watermark is strictly worse than a LOST
    * one. Garbage either wedges the publisher forever — the cycle
    * fails at load (ANSI cast) and only a successful cycle rewrites
    * the file — or, where the value casts to NULL, makes the strict-`>`
    * delta predicate eternally false and silently skips every future
    * row of that table. A lost watermark is merely expensive: the next
    * delta scan degrades to a full table read whose stats re-establish
    * it, and the publish rewrites the file — self-healing, exactly like
    * the torn-pointer bootstrap. So: an unparseable file or non-object
    * root heals to empty, and a non-textual or non-timestamp value
    * drops THAT entry — each loudly logged, so an operator seeing a
    * surprisingly expensive cycle can find its cause. IO errors
    * propagate to the cycle's fail-soft catch and retry next tick: a
    * store blip is not corruption and must not trigger a 100 TB
    * re-read.
    */
  def load(): Map[String, String] = {
    // size guard first (same policy as the manifest reads): a foreign
    // blob at this path must heal like any other corruption, not OOM
    // the publisher slurping it
    store.oversized(path).foreach { len =>
      warn(s"is $len bytes — far above any real watermark state")
      return Map.empty
    }
    store.readString(path) match {
      case None => Map.empty
      case Some(json) =>
        val root =
          try Some(mapper.readTree(json))
          catch {
            case e: com.fasterxml.jackson.core.JacksonException =>
              warn(s"is unparseable (${e.getMessage})"); None
          }
        root match {
          case Some(o: ObjectNode) =>
            o.properties().asScala.flatMap { e =>
              val v = e.getValue
              if (v.isTextual && parseableWatermark(v.asText()))
                Some(e.getKey -> v.asText())
              else {
                warn(s"entry '${e.getKey}' holds a value no supported " +
                  s"watermark column type can produce: " +
                  s"${v.toString.take(48)}")
                None
              }
            }.toMap
          case Some(other) =>
            warn(s"root is ${other.getNodeType}, not an object")
            Map.empty
          case None => Map.empty
        }
    }
  }

  def save(state: Map[String, String]): Unit = {
    val root = mapper.createObjectNode()
    state.toSeq.sortBy(_._1).foreach { case (k, v) =>
      root.put(k, v)
    }
    store.writeString(path,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  /** Advance several watermarks with ONE store round-trip (round 14 —
    * the per-table `update` loop was N loads + N saves + N renames per
    * cycle: chatty against an object store at 60 s cycles with many
    * tables, and each rename a tiny torn-write window of the exact
    * class `load`'s heal policy exists for). The caller's ordering
    * guarantee is unchanged: one call, strictly after the publish.
    * No advances → no write at all (the old loop's behavior for an
    * all-empty-delta cycle; an untouched file is one fewer torn-write
    * window than a rewritten identical one).
    */
  def updateAll(advances: Map[String, String]): Map[String, String] = {
    // save-side mirror of `parseableWatermark` (round 15): an advance
    // the loader would drop must never be PERSISTED in the first place
    // — otherwise it ships, gets dropped on the next load with a
    // "corruption" warning, and the table silently degrades to full
    // re-reads. The one real producer is a FLOAT/DOUBLE watermark
    // column containing NaN/Infinity (max() propagates NaN as the
    // greatest value under Spark's ordering; persisted, it would make
    // the strict-`>` delta predicate eternally FALSE and skip every
    // future row). Refusing loudly keeps the PREVIOUS watermark: rows
    // past it are re-read each cycle — correct and expensive, with
    // this warning naming the cause every time — until the source
    // value becomes finite again.
    val (ok, bad) = advances.partition {
      case (_, v) => parseableWatermark(v)
    }
    bad.foreach { case (t, v) =>
      warn(s"advance for '$t' is not a round-trippable watermark " +
        s"(${v.take(48)} — e.g. NaN/Infinity from a float column); NOT" +
        " persisted — the previous watermark holds")
    }
    if (ok.isEmpty) load()
    else {
      val next = load() ++ ok
      save(next)
      next
    }
  }
}

object WatermarkStore {
  /** Optionally-signed decimal literal with an optional bounded
    * exponent — the string cast of any numeric watermark column.
    * 38 digits covers DECIMAL(38)'s full range; the `[eE]±ddd` suffix
    * covers Java `Double.toString`'s scientific notation for every
    * finite FLOAT/DOUBLE (exponents max out at 3 digits: |e| ≤ 324).
    */
  private val NumericLiteral =
    "^-?[0-9]{1,38}(\\.[0-9]{1,38})?([eE][+-]?[0-9]{1,3})?$".r
}
