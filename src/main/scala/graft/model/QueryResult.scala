package graft.model

/** Serving-layer result envelope (reference: QueryResult +
  * api-service/src/main.py:115-123 / README.md:170-179):
  * {success, data (row dicts), columns, row_count, execution_time_ms,
  * cached}. `cached` exists in the reference but is never set true
  * (query_engine.py:27) — carried for parity.
  */
final case class QueryResult(
    success: Boolean,
    data: Seq[Map[String, Any]],
    columns: Seq[String],
    rowCount: Long,
    executionTimeMs: Double,
    cached: Boolean = false)
