package graft

/** Session-memo registry. Several modules memoize shared frames per
  * (SparkSession, source dir) — the per-user aggregate spine
  * ([[graft.queries.EventQueries]]), the minhash edge list + cluster
  * labels + winnowing fingerprints ([[graft.queries.TextQueries]]),
  * and the serve-tier grants/attempts frames
  * ([[graft.operators.AccessService]]). The memos pin cached
  * DataFrames (and their SparkSession) for the JVM lifetime, and they
  * key on the PATH, so a long-lived session accumulates cache memory
  * and a test that rewrites a fixture dir in place would read stale
  * results. `clearAll()` unpersists and drops every memo — call it
  * between logical sessions, after rewriting fixture data under a
  * previously-queried path, or whenever executor storage memory should
  * be reclaimed.
  */
object Caches {
  def clearAll(): Unit = {
    queries.EventQueries.clearCaches()
    queries.TextQueries.clearCaches()
    queries.EmbeddingQueries.clearCaches()
    queries.LmQueries.clearCaches()
    queries.RelationalQueries.clearCaches()
    queries.AnalyticsQueries.clearCaches()
    operators.AccessService.clearCaches()
  }
}
