package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization (SURVEY.md §2.9 extension): the streaming
  * form of the batch `sessionization` query — per-user sessions with a
  * 30-minute inactivity gap, as a `session_window` aggregation.
  *
  * `session_window` keeps ONE merging window state per (user, open
  * session); the watermark both bounds that state and decides
  * finality: a session is emitted (append mode) once the watermark
  * passes its close, i.e. once no late event could still extend it.
  * State is keyed (user_id, window), hash-partitioned — at 100 TB/day
  * the state size is O(active users), not O(events), because events
  * merge into their session as they arrive.
  *
  * Batch/stream parity: the same aggregation over a static frame
  * plans the ordinary session_window aggregate with identical rows
  * (asserted in SessionizeSpec).
  */
object Sessionize {

  /** events `[ts, user_id, ...]` → closed sessions
    * `[user_id, session_start_us, n_events]` (same projection as the
    * batch `sessionization` oracle query). */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "45 minutes"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("session"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session.start")).as("session_start_us"),
        col("n_events"))
  }
}
