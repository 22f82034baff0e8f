package graft.model

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._

/** Snapshot manifest — the atomic-publish pointer for a snapshot
  * generation (reference: current/manifest.json,
  * etl-service/src/s3_uploader.py:72-88: {version, timestamp,
  * database_key, tables: {name: rowCount}, metadata}).
  *
  * Unlike the reference (which overwrites a monolithic DB file and then
  * writes the manifest), here the manifest IS the publish: readers
  * resolve `current/manifest.json` → `history/<key>/<table>` parquet
  * dirs, so a new snapshot becomes visible atomically when the manifest
  * swap lands (SURVEY.md §2.9 T6).
  *
  * `publisherEpoch` is the fencing token for the single-publisher
  * contract: the reference enforces one publisher with APScheduler
  * `max_instances=1` inside ONE process (etl-service/src/main.py:80-91)
  * — a multi-node deployment loses that, and a rolling deploy routinely
  * overlaps an old publisher with its replacement. Each deployment
  * claims a strictly larger epoch ([[graft.ingest.SyncManager.claimEpoch]]);
  * the writer refuses to swap the pointer, and retention refuses to
  * prune, once a manifest with a HIGHER epoch is visible — so a stale
  * publisher can neither regress the pointer to an older generation nor
  * GC the generation its successor is serving. Absent in pre-epoch
  * manifests → 0 (every claimed epoch outranks it).
  */
final case class Manifest(
    version: String,
    timestamp: String,
    snapshotKey: String,
    tables: Map[String, Long],
    metadata: Map[String, String] = Map.empty,
    publisherEpoch: Long = 0L)

/** Parse-shaped manifest failure: the bytes at the pointer are not a
  * complete manifest — invalid JSON (a torn non-atomic overwrite), or
  * valid JSON missing/mistyping a required field. Typed so callers can
  * distinguish "the pointer is garbage" (self-healable by the next
  * publish) from an IO error (retry) and from a genuine code bug
  * (propagate) — a blanket NPE/NonFatal catch classified all three the
  * same way and could silently turn a bug into an expensive bootstrap
  * full read at 100 TB.
  */
final class MalformedManifest(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

object Manifest {
  // Jackson ships with Spark (public dependency) — no extra resolution.
  private val mapper = new ObjectMapper()

  def toJson(m: Manifest): String = {
    val root = mapper.createObjectNode()
    root.put("version", m.version)
    root.put("timestamp", m.timestamp)
    root.put("snapshot_key", m.snapshotKey)
    root.put("publisher_epoch", m.publisherEpoch)
    val t = root.putObject("tables")
    m.tables.toSeq.sortBy(_._1).foreach { case (k, v) => t.put(k, v) }
    val md = root.putObject("metadata")
    m.metadata.toSeq.sortBy(_._1).foreach { case (k, v) => md.put(k, v) }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Strict, validated parse: any shape defect — unparseable JSON, a
    * non-object root, a missing or non-string required field, a
    * non-object `tables`/`metadata`, a non-integral table row count, a
    * non-textual metadata value, a non-integral or negative
    * `publisher_epoch` — raises [[MalformedManifest]]. Nothing else is
    * caught or converted: an exception of any other type escaping this
    * method is by construction a code bug, not a torn pointer.
    * A merely ABSENT optional field is fine (`tables`/`metadata` empty,
    * epoch 0 — pre-epoch manifests); a PRESENT-but-mistyped one is not:
    * valid-JSON corruption (`"tables": []`) must classify as torn, or
    * the reader would adopt a zero-table manifest and answer "table not
    * found" 500s instead of the retryable-503 taxonomy.
    */
  def fromJson(json: String): Manifest = {
    val n = try mapper.readTree(json) catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        throw new MalformedManifest(
          s"manifest is not parseable JSON: ${e.getMessage}", e)
    }
    if (n == null || !n.isObject)
      throw new MalformedManifest(
        s"manifest root is not a JSON object: ${String.valueOf(n)}")
    def reqString(field: String): String = {
      val v = n.get(field)
      if (v == null || !v.isTextual)
        throw new MalformedManifest(
          s"manifest is missing required string field '$field'")
      v.asText()
    }
    // present-but-not-an-object is a shape defect, not absence: a
    // valid-JSON-corrupted pointer must classify as torn
    def optObject(field: String): Option[ObjectNode] =
      Option(n.get(field)).map {
        case o: ObjectNode => o
        case other => throw new MalformedManifest(
          s"manifest field '$field' is not a JSON object: " +
            other.getNodeType.toString)
      }
    val epoch = Option(n.get("publisher_epoch")).map { v =>
      if (!v.isNumber || !v.canConvertToExactIntegral ||
        !v.canConvertToLong || v.asLong() < 0L)
        throw new MalformedManifest(
          "manifest publisher_epoch is not a non-negative integer: " +
            v.toString)
      v.asLong()
    }.getOrElse(0L) // pre-epoch manifest: every claimed epoch outranks it
    Manifest(
      version = reqString("version"),
      timestamp = reqString("timestamp"),
      snapshotKey = reqString("snapshot_key"),
      tables = optObject("tables").map {
        _.properties().asScala.map { e =>
          // canConvertToExactIntegral: rejects 1.5 (canConvertToLong
          // alone would silently truncate a fractional count to 1)
          if (!e.getValue.isNumber || !e.getValue.canConvertToExactIntegral
            || !e.getValue.canConvertToLong)
            throw new MalformedManifest(
              s"manifest table '${e.getKey}' row count is not integral: " +
                e.getValue.toString)
          e.getKey -> e.getValue.asLong()
        }.toMap
      }.getOrElse(Map.empty),
      metadata = optObject("metadata").map {
        _.properties().asScala.map { e =>
          if (!e.getValue.isTextual)
            throw new MalformedManifest(
              s"manifest metadata '${e.getKey}' is not a string: " +
                e.getValue.toString)
          e.getKey -> e.getValue.asText()
        }.toMap
      }.getOrElse(Map.empty),
      publisherEpoch = epoch)
  }
}
