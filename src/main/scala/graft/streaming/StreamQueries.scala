package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.queries.{QueryDef, Stable}
import graft.tables.Tables

/** Streaming queries declared as ORACLE-CHECKED entries (SURVEY §2.8).
  *
  * q39 made the streaming KERNEL a standing cross-engine hash check; q44
  * does the same for the windowed-aggregation wrapper
  * ([[StreamJobs.windowedEventCounts]], until now unit-tested only): the
  * events table is staged as a file source, drained with `AvailableNow`
  * through the tumbling-window aggregation, and the drained result must
  * hash-match DuckDB's batch `date_trunc` aggregation over the same rows —
  * proving the streaming window semantics (epoch-aligned tumbling windows,
  * event-time grouping) agree with the relational definition, not just
  * with our own batch twin (q13).
  *
  * Sink note: the drain lands in a COMPLETE-mode memory sink — the right
  * harness shape for an oracle row (bounded: |windows|·|event types| rows,
  * and complete mode re-emits final window states so an AvailableNow drain
  * cannot under-report trailing windows the watermark never closed). The
  * production path at 100 TB is append mode + watermark into the
  * partitioned parquet sink, which StreamingSpec exercises — state is
  * bounded by the watermark either way; only the sink differs.
  */
object StreamQueries {

  /** Per-(JVM, data dir) staged events parquet — written once under a lock
    * (the q39 staging pattern: ONE file so the drain is one micro-batch);
    * run-scoped checkpoints are fresh per invocation; a shutdown hook
    * removes every root (snapshot under the writers' lock). */
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

  private def ensureStagedEvents(s: SparkSession, d: String): String =
    staged.synchronized {
      staged.getOrElse(d, {
        val root = java.nio.file.Files.createTempDirectory("graft_q44_staged").toString
        roots += root
        Tables.events(s, d).coalesce(1)
          .write.mode("overwrite").parquet(s"$root/staged")
        staged(d) = s"$root/staged"
        s"$root/staged"
      })
    }

  private val WindowLength = "1 day"

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
    val stagedPath = ensureStagedEvents(s, d)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_q44_run").toString
    staged.synchronized { roots += ckpt }
    val schema = Tables.events(s, d).schema
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
    require(q.awaitTermination(600000), "q44: streaming drain did not finish within 600s")
    s.table(table)
      .select(unix_micros(col("window_start")).as("window_us"), col("event_type"),
        col("n_events"), Stable.r4(col("sum_value")).as("sum_value"))
  }

  val all: Seq[QueryDef] = Seq(q44WindowedStreaming)
}
