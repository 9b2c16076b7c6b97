package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the event operators (SURVEY.md §2.11
  * X6 + the north-star streaming surface). The reference is batch-only —
  * its freshness model is per-date re-runs (dags/retail_pipeline_dag
  * .py:19,35) — so these are the additive streaming counterparts of
  * `graft.ext.Events`: the SAME transformations expressed over an
  * unbounded source, sharing semantics with the batch forms (asserted in
  * tests against `Events.hourlyRollup`).
  *
  * Scale notes: both are keyed stateful aggregations — state is
  * partitioned by (window, event_type) / (user_id, session_window) across
  * executors, bounded by the watermark which lets Spark drop state for
  * windows older than the lateness bound. Output mode `update`/`append`
  * works against any sink; checkpointing gives exactly-once.
  */
object StreamingOps {

  /** Tumbling 1-hour rollup by event type over a stream, 30-minute
    * watermark for late data. Streaming twin of `Events.hourlyRollup`.
    */
  def hourlyRollupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup — the X1 twin for unbounded sources: an
    * at-least-once stream becomes effectively-once by key.
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes the key's first-seen event time, so state is
    * bounded by (arrival rate × lateness bound) instead of growing with
    * the stream — the property that makes exact dedup viable on an
    * unbounded 100 TB/day feed where batch X1 would need the full
    * history.
    */
  def dedupStream(events: DataFrame, keys: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark(keys)

  /** Session aggregation via the native `session_window` (6h gap to
    * mirror `Events.SessionGapSeconds`): sessions close when no event
    * arrives within the gap; the watermark bounds session state.
    * Streaming twin of `Events.sessionize`.
    */
  def sessionizeStream(events: DataFrame, gap: String = "6 hours"): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        round(sum("value"), 4).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("n_purchases"),
        col("sum_value"))
}
