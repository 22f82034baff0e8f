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
  */
final case class Manifest(
    version: String,
    timestamp: String,
    snapshotKey: String,
    tables: Map[String, Long],
    metadata: Map[String, String] = Map.empty)

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
    val t = root.putObject("tables")
    m.tables.toSeq.sortBy(_._1).foreach { case (k, v) => t.put(k, v) }
    val md = root.putObject("metadata")
    m.metadata.toSeq.sortBy(_._1).foreach { case (k, v) => md.put(k, v) }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Strict, validated parse: any shape defect — unparseable JSON, a
    * non-object root, a missing or non-string required field, a
    * non-integral table row count — raises [[MalformedManifest]].
    * Nothing else is caught or converted: an exception of any other
    * type escaping this method is by construction a code bug, not a
    * torn pointer.
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
    def strMap(field: String): Map[String, String] =
      Option(n.get(field)).collect { case o: ObjectNode =>
        o.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.getOrElse(Map.empty)
    Manifest(
      version = reqString("version"),
      timestamp = reqString("timestamp"),
      snapshotKey = reqString("snapshot_key"),
      tables = Option(n.get("tables")).collect { case o: ObjectNode =>
        o.properties().asScala.map { e =>
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
      metadata = strMap("metadata"))
  }
}
