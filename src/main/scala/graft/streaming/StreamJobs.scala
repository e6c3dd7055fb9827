package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import graft.kernel.{Calculate, Conform, Modes}

/** Structured Streaming wrappers (SURVEY.md §2.8: the reference is
  * batch-only — its daily `schedule` loop is cron, not streaming — so these
  * are engine extensions, built on the same pure kernel).
  *
  *  - [[windowedEventCounts]]: event-time tumbling-window aggregation with a
  *    watermark — the streaming twin of the batch q13 query; late data
  *    beyond the watermark is dropped, state is bounded.
  *  - [[streamingKernel]]: micro-batch billing: each incoming fact batch
  *    runs the full rule-match + modes kernel against a static dim via
  *    `foreachBatch`. Because the kernel is a pure DataFrame→DataFrame
  *    function, batch and streaming share one code path — no semantics
  *    drift between the nightly job and the live feed.
  */
object StreamJobs {

  /** Tumbling-window counts/sums per event_type over a streaming `events`
    * source (schema: ts timestamp, event_type string, value double). */
  def windowedEventCounts(
      events: DataFrame,
      windowLength: String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Run the billing kernel per micro-batch against a static dim, writing
    * each conformed batch to the idempotent partitioned sink. */
  def streamingKernel(
      factStream: DataFrame,
      dim: DataFrame,
      targetPath: String,
      checkpoint: String,
      extraDiscount: Map[String, Double] = Modes.DefaultExtraDiscount): DataStreamWriter[org.apache.spark.sql.Row] =
    factStream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val out = Conform.conformToTarget(
          Calculate.calculateWithCredits(batch, dim, extraDiscount))
        graft.pipeline.Sink.writePartitioned(out, targetPath)
      }
}
