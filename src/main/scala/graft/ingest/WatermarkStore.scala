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

  def load(): Map[String, String] =
    store.readString(path).map { json =>
      mapper.readTree(json) match {
        case o: ObjectNode =>
          o.properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
        case _ => Map.empty[String, String]
      }
    }.getOrElse(Map.empty)

  def save(state: Map[String, String]): Unit = {
    val root = mapper.createObjectNode()
    state.toSeq.sortBy(_._1).foreach { case (k, v) =>
      root.put(k, v)
    }
    store.writeString(path,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  def update(table: String, wm: String): Map[String, String] = {
    val next = load() + (table -> wm)
    save(next)
    next
  }
}
