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

  def fromJson(json: String): Manifest = {
    val n = mapper.readTree(json)
    def strMap(field: String): Map[String, String] =
      Option(n.get(field)).collect { case o: ObjectNode =>
        o.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.getOrElse(Map.empty)
    Manifest(
      version = n.get("version").asText(),
      timestamp = n.get("timestamp").asText(),
      snapshotKey = n.get("snapshot_key").asText(),
      tables = Option(n.get("tables")).collect { case o: ObjectNode =>
        o.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
      }.getOrElse(Map.empty),
      metadata = strMap("metadata"))
  }
}
