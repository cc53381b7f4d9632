package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types._

/** Structured-Streaming forms of the engine's event operators
  * (SURVEY.md §2.12): the same semantics as the batch EventQueries
  * (q31-q33), expressed over `readStream` with event-time watermarks.
  * The batch forms are the oracle-checkable twins; these are the
  * production shape for unbounded input — state is bounded by the
  * watermark, aggregation is incremental, and each operator scales
  * with the shuffle partitioning like its batch twin.
  */
object StreamingOps {

  /** Typed event row for the stateful operators and test sources. */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Schema for file-based streaming reads of the events table
    * (ts read as nanosecond longs — the streaming twin of
    * EventQueries.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** `readStream` over a directory of events parquet files (the
    * streaming source tails the directory for new files — the
    * production ingestion shape). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema).parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** q31's streaming twin: tumbling 1-hour event-time window per
    * event type, 1-hour watermark bounding state. Values quantized to
    * exact integer cents like the batch form, so incremental
    * aggregation order cannot perturb the sum. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100.0).cast("long")).cast("double") / 100.0)
          .as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** q32's streaming twin: keep-first dedup per (user_id, event_type)
    * with watermark-bounded dedup state. */
  def dedupFirst(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))

  /** q33's streaming twin: native session windows (30-minute gap). */
  def sessionized(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Stream-static join (SURVEY.md §2.12: "the neighbor index as a
    * batch-built, stream-joined static side"): enrich a live event
    * stream with a batch-built per-key dimension. The static side is
    * broadcast when small; Spark re-plans it per micro-batch so a
    * refreshed static table is picked up. */
  def enrichWithStatic(events: DataFrame, static: DataFrame,
      key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(static), Seq(key), "left")

  /** Custom streaming state via KeyValueGroupedDataset: running
    * per-user event count (the minimal stateful-map shape a user
    * extends for bespoke state machines). Per-user state expires
    * after `stateTtlMs` of processing-time inactivity (default 30 min)
    * so an unbounded user population cannot grow state forever; a user
    * returning after expiry restarts from zero. `stateTtlMs = 0`
    * disables expiry (exact mode for bounded replays — see
    * [[graft.streaming.StreamingDedup.candidates]] on why
    * drain-and-assert harnesses need NoTimeout).
    *
    * r22 (output contract fix): expiry emits NOTHING. The r21 form
    * (mapGroupsWithState) had to return a value from the timeout
    * invocation and emitted a duplicate final `(uid, last)` record
    * NoTimeout mode never produced; as flatMapGroupsWithState the
    * timeout path returns an empty iterator, so the emitted stream is
    * identical in both modes — TTL only bounds state size. */
  def runningUserCounts(events: Dataset[Event],
      stateTtlMs: Long = 30L * 60 * 1000): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Update, timeoutConf) {
        (uid, rows, state) =>
          if (state.hasTimedOut) {
            state.remove() // idle user: drop the count, emit nothing
            Iterator.empty
          } else {
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            Iterator((uid, n))
          }
      }
  }
}
