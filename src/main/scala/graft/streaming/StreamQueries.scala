package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.queries.{QueryDef, Stable}
import graft.tables.Tables

/** Streaming queries declared as ORACLE-CHECKED entries (SURVEY §2.8).
  *
  * q39 made the streaming KERNEL a standing cross-engine hash check; q44
  * does the same for the windowed-aggregation wrapper
  * ([[StreamJobs.windowedEventCounts]]): the events table is staged as a
  * file source, drained with `AvailableNow` through the tumbling-window
  * aggregation, and the drained result must hash-match DuckDB's batch
  * `date_trunc` aggregation over the same rows — proving the streaming
  * window semantics (epoch-aligned tumbling windows, event-time grouping)
  * agree with the relational definition, not just with our own batch twin
  * (q13).
  *
  * Sink shapes: q44 drains into a COMPLETE-mode memory sink — the bounded
  * harness shape (|windows|·|event types| rows; complete mode re-emits
  * final window states so the drain cannot under-report trailing windows
  * the watermark never closed). q46 (round-8 verdict #4) declares the
  * PRODUCTION shape: APPEND mode + watermark into a parquet sink — only
  * watermark-closed windows are emitted, and the oracle states exactly
  * that: the same `date_trunc` aggregation restricted to windows whose end
  * precedes the final watermark (max event time − the delay). Together
  * they pin both halves: q44 the window values, q46 the emission contract.
  */
object StreamQueries {

  /** Per-(JVM, data dir, variant) staged events parquet — written once
    * (ONE file so the drain is one micro-batch, the q39 staging pattern).
    * The staging WRITE runs OUTSIDE the monitor (ADVICE r8: the shutdown
    * hook synchronizes on the same lock, so a write under it would block
    * JVM exit for the length of a Spark job): write to a private temp
    * root, publish under the lock, losers delete their root. Run-scoped
    * checkpoints are deleted as soon as their drain finishes (ADVICE r8 —
    * they used to accumulate one per invocation until shutdown); the hook
    * sweeps whatever a crash leaves behind. */
  private val staged = scala.collection.mutable.Map.empty[String, String]
  private val roots = scala.collection.mutable.Set.empty[String]
  private val token = new java.util.concurrent.atomic.AtomicInteger(0)
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val rs = staged.synchronized(roots.toList)
      rs.foreach { r =>
        try graft.operators.Reconcile.deleteRecursively(r)
        catch { case _: Exception => () }
      }
    }))
  }

  private def ensureStaged(key: String, write: String => Unit): String =
    staged.synchronized(staged.get(key)) match {
      case Some(p) => p
      case None =>
        val root = java.nio.file.Files.createTempDirectory("graft_q44_staged").toString
        write(s"$root/staged")
        staged.synchronized {
          staged.get(key) match {
            case Some(winner) => // lost the publish race — ours is redundant
              try graft.operators.Reconcile.deleteRecursively(root)
              catch { case _: Exception => () }
              winner
            case None =>
              roots += root
              staged(key) = s"$root/staged"
              s"$root/staged"
          }
        }
    }

  private def ensureStagedEvents(s: SparkSession, d: String): String =
    ensureStaged(d, p =>
      Tables.events(s, d).coalesce(1).write.mode("overwrite").parquet(p))

  /** A run-scoped temp dir registered for crash-time sweep; normal paths
    * delete it explicitly the moment it is no longer needed. */
  private def runDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    staged.synchronized { roots += p }
    p
  }

  private def dropDir(p: String): Unit = {
    try graft.operators.Reconcile.deleteRecursively(p)
    catch { case _: Exception => () }
    staged.synchronized { roots -= p }
  }

  private val WindowLength = "1 day"
  private val WatermarkDelay = "1 hour"
  private val WatermarkDelayUs = 3600000000L
  private val WindowLengthUs = 86400000000L

  /** The drain behind q44: complete-mode memory sink, fresh checkpoint per
    * run (deleted right after the drain), result read from the driver-side
    * memory table. */
  private def drainWindowedComplete(s: SparkSession, stagedPath: String): DataFrame = {
    val ckpt = runDir("graft_q44_run")
    val schema = s.read.parquet(stagedPath).schema
    val stream = s.readStream.schema(schema).parquet(stagedPath)
    val n = token.incrementAndGet()
    val table = s"graft_q44_out_$n"
    // a long-lived JVM (Bench's round-robin) would otherwise accumulate one
    // driver-resident memory-sink table per run — drop the PREVIOUS run's
    // view (its rows die with it); the current result stays readable
    s.catalog.dropTempView(s"graft_q44_out_${n - 1}")
    val q = StreamJobs.windowedEventCounts(stream, WindowLength)
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(table)
      .option("checkpointLocation", s"$ckpt/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(600000), "q44: streaming drain did not finish within 600s")
    finally dropDir(ckpt)
    s.table(table)
      .select(unix_micros(col("window_start")).as("window_us"), col("event_type"),
        col("n_events"), Stable.r4(col("sum_value")).as("sum_value"))
  }

  /** q44 — STREAMING tumbling-window aggregation, drained and read back:
    * per (epoch-aligned day window, event_type) counts and sums. Spark's
    * `window(ts, '1 day')` starts windows at the epoch, so the batch
    * relational statement is exactly `date_trunc('day', ts)` under the
    * engine-wide UTC session timezone. */
  val q44WindowedStreaming = QueryDef(
    "q44_windowed_streaming",
    s"""SELECT epoch_us(date_trunc('day', ts)) AS window_us, event_type,
       |  count(*) AS n_events,
       |  ${Stable.sqlR4("sum(value)")} AS sum_value
       |FROM events GROUP BY window_us, event_type""".stripMargin) { (s, d) =>
    drainWindowedComplete(s, ensureStagedEvents(s, d))
  }

  /** Bench-only machinery calibration for q44 (round-8 verdict #1): the
    * identical complete-mode drain over a 1-row staged source — its cost
    * is the fixed streaming machinery (checkpoint init, trigger planning,
    * commit log) plus one row of work. Bench subtracts its minimum from
    * q44's timed runs; see [[graft.Bench]]. */
  val q44MachineryProbe: (SparkSession, String) => DataFrame =
    (s, d) => drainWindowedComplete(s,
      ensureStaged(s"$d#probe", p =>
        Tables.events(s, d).limit(1).coalesce(1).write.mode("overwrite").parquet(p)))

  /** q46 — the PRODUCTION streaming sink shape, oracle-checked (round-8
    * verdict #4): the same tumbling-window aggregation in APPEND mode with
    * a 1-hour watermark, drained `AvailableNow` into a partitioned PARQUET
    * sink and read back. Append emits a window exactly once, when the
    * watermark passes its end — so the drained sink must equal the batch
    * `date_trunc` aggregation RESTRICTED to watermark-closed windows:
    * `window_end ≤ max(event time) − delay`, with Spark's watermark
    * truncated to milliseconds (EventTimeStats tracks ms). The unbounded
    * tail (windows the final watermark never closed) is absent BY
    * CONTRACT, and the oracle's HAVING clause states that contract in
    * foreign SQL — this is what q44's complete-mode harness cannot check.
    * 100 TB: state is bounded by the watermark, the sink is the same
    * idempotent partitioned layout as every batch sink here. */
  val q46WindowedAppendSink = QueryDef(
    "q46_windowed_append_sink",
    s"""SELECT epoch_us(date_trunc('day', ts)) AS window_us, event_type,
       |  count(*) AS n_events,
       |  ${Stable.sqlR4("sum(value)")} AS sum_value
       |FROM events
       |GROUP BY window_us, event_type
       |HAVING window_us + $WindowLengthUs <=
       |  (SELECT (epoch_us(max(ts)) // 1000 * 1000) - $WatermarkDelayUs FROM events)"""
      .stripMargin) { (s, d) =>
    val stagedPath = ensureStagedEvents(s, d)
    val run = runDir("graft_q46_run")
    val schema = s.read.parquet(stagedPath).schema
    val stream = s.readStream.schema(schema).parquet(stagedPath)
    val q = StreamJobs.windowedEventCounts(stream, WindowLength, WatermarkDelay)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", s"$run/out")
      .option("checkpointLocation", s"$run/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(600000), "q46: streaming drain did not finish within 600s")
    // checkpoint is dead once the drain committed; the out dir stays for
    // the lazy read-back (shutdown hook owns it)
    try graft.operators.Reconcile.deleteRecursively(s"$run/ckpt")
    catch { case _: Exception => () }
    s.read.parquet(s"$run/out")
      .select(unix_micros(col("window_start")).as("window_us"), col("event_type"),
        col("n_events"), Stable.r4(col("sum_value")).as("sum_value"))
  }

  val all: Seq[QueryDef] = Seq(q44WindowedStreaming, q46WindowedAppendSink)
}
