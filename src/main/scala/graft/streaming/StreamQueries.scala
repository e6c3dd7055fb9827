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

  /** Staged 2-row source for the APPEND-sink machinery probes: the rows
    * are 4 days apart so the final watermark CLOSES the first day-window /
    * first session — a 1-row probe (q44's) would emit nothing in append
    * mode and the read-back would die on an empty sink's missing schema. */
  private def ensureProbeEvents(s: SparkSession, d: String): String =
    ensureStaged(s"$d#append-probe", p => {
      import s.implicits._
      Seq(
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "probe", 1.0, 1L),
        (java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), "probe", 1.0, 1L))
        .toDF("ts", "event_type", "value", "user_id")
        .coalesce(1).write.mode("overwrite").parquet(p)
    })

  /** A run-scoped temp dir registered for crash-time sweep; normal paths
    * delete it explicitly the moment it is no longer needed. */
  private def runDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    staged.synchronized { roots += p }
    p
  }

  /** q50/q51's batch-join oracles are valid ONLY under the documented
    * single-micro-batch drain: one staged part file means every row
    * co-arrives, so no watermark eviction can happen between rows. A
    * future staging change to multiple files would otherwise surface as an
    * opaque oracle hash mismatch — assert the contract by name instead. */
  private def requireSingleBatchStaging(stagedPath: String, who: String): Unit = {
    val parts = Option(new java.io.File(stagedPath).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("part-"))
    require(parts.length == 1,
      s"$who: staged source $stagedPath holds ${parts.length} part files — " +
        "the single-micro-batch contract behind the batch-join oracle is broken")
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
  private val SessionGapUs = 3600000000L

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
    drainWindowedAppend(s, ensureStagedEvents(s, d))
  }

  /** The drain behind q46 (and its machinery probe): append-mode windowed
    * aggregation into a parquet sink, read back. The checkpoint is dead
    * once the drain committed; the out dir stays for the lazy read-back
    * (shutdown hook owns it). */
  private def drainWindowedAppend(s: SparkSession, stagedPath: String): DataFrame = {
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
    try graft.operators.Reconcile.deleteRecursively(s"$run/ckpt")
    catch { case _: Exception => () }
    s.read.parquet(s"$run/out")
      .select(unix_micros(col("window_start")).as("window_us"), col("event_type"),
        col("n_events"), Stable.r4(col("sum_value")).as("sum_value"))
  }

  /** Bench-only machinery calibration for q46: the identical append drain
    * over a staged 2-row source (4 days apart, so the watermark closes one
    * window and the sink is non-empty) — fixed streaming machinery plus
    * two rows of work; Bench subtracts its minimum from q46's timed runs. */
  val q46MachineryProbe: (SparkSession, String) => DataFrame =
    (s, d) => drainWindowedAppend(s, ensureProbeEvents(s, d))

  /** q48 — CUSTOM-STATE streaming sessionization, oracle-checked: the
    * `flatMapGroupsWithState` operator ([[StreamJobs.sessionizeStream]],
    * until now unit-only) drained `AvailableNow` through an append parquet
    * sink and read back, against q15's batch gap-session SQL in DuckDB.
    *
    * Emission contract (what the oracle's WHERE states in foreign SQL):
    * with the whole staged file in one micro-batch, every non-final
    * session per user closes IN-BATCH (a later event of the same user
    * observes the gap) and emits unconditionally; each user's FINAL
    * session sits in state with an event-time timeout at
    * `last_ms + gap_ms`, which fires in the AvailableNow flush batch iff
    * it is strictly below the final watermark (ms-truncated max event
    * time − delay). Session identity is (user_id, first_us) — the
    * streaming side has no running session counter, so the oracle drops
    * q15's session_id from the projection after using it to find each
    * user's last session.
    *
    * This is the third streaming emission surface pinned cross-engine:
    * q39 foreachBatch, q44/q46 windowed agg, q48 arbitrary keyed state —
    * and it is exact only because the state handler works in full MICROS
    * ([[StreamJobs.epochMicros]]); `Timestamp.getTime`-millis state would
    * hash-mismatch this oracle on the micro-resolution events table.
    * 100 TB: state is one open session per active user (bounded by
    * concurrent users, not history), keyed on the same user_id shuffle
    * the batch twin uses. */
  val q48SessionizeAppendSink = QueryDef(
    "q48_sessionize_append_sink",
    s"""WITH lagged AS (
       |  SELECT user_id, value, event_id, epoch_us(ts) AS us,
       |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
       |  FROM events),
       |flagged AS (
       |  SELECT user_id, value, event_id, us,
       |         CASE WHEN prev_us IS NULL OR us - prev_us > $SessionGapUs THEN 1 ELSE 0 END AS new_sess
       |  FROM lagged),
       |sess AS (
       |  SELECT user_id, value, us,
       |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |  FROM flagged),
       |agg AS (
       |  SELECT user_id, session_id, count(*) AS n_events,
       |         ${Stable.sqlR4("sum(value)")} AS sum_value,
       |         min(us) AS first_us, max(us) AS last_us
       |  FROM sess GROUP BY user_id, session_id),
       |ranked AS (
       |  SELECT *, max(session_id) OVER (PARTITION BY user_id) AS last_sid FROM agg)
       |SELECT user_id, first_us, last_us, n_events, sum_value
       |FROM ranked
       |WHERE session_id < last_sid
       |   OR last_us // 1000 + ${SessionGapUs / 1000} <
       |      (SELECT epoch_us(max(ts)) // 1000 - ${WatermarkDelayUs / 1000} FROM events)"""
      .stripMargin) { (s, d) =>
    drainSessionAppend(s, ensureStagedEvents(s, d))
  }

  /** The drain behind q48 (and its machinery probe). */
  private def drainSessionAppend(s: SparkSession, stagedPath: String): DataFrame = {
    val run = runDir("graft_q48_run")
    val schema = s.read.parquet(stagedPath).schema
    import s.implicits._
    val stream = s.readStream.schema(schema).parquet(stagedPath)
      .select(col("user_id"), col("ts"), col("value"))
      .as[StreamJobs.SessionEvent]
    val q = StreamJobs
      .sessionizeStream(stream,
        gap = java.time.Duration.ofHours(1), watermark = WatermarkDelay)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", s"$run/out")
      .option("checkpointLocation", s"$run/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(600000), "q48: streaming drain did not finish within 600s")
    try graft.operators.Reconcile.deleteRecursively(s"$run/ckpt")
    catch { case _: Exception => () }
    s.read.parquet(s"$run/out")
      .select(col("user_id"), col("first_us"), col("last_us"),
        col("n_events"), Stable.r4(col("sum_value")).as("sum_value"))
  }

  /** Bench-only machinery calibration for q48 — the identical session
    * drain over the staged 2-row source (the 4-day gap closes one session
    * in-batch, so the sink is non-empty). */
  val q48MachineryProbe: (SparkSession, String) => DataFrame =
    (s, d) => drainSessionAppend(s, ensureProbeEvents(s, d))

  private val JoinWithin = "6 hours"

  /** The drain behind q50 (and its probe): two independent file-source
    * streams over the SAME staged single-file events parquet (each with
    * its own offsets in the shared checkpoint), filtered to the two sides,
    * joined by [[StreamJobs.intervalJoinStream]], appended to a parquet
    * sink and read back. The single staged file keeps the whole drain one
    * micro-batch, so every qualifying pair co-arrives and the inner join
    * emits ALL of them — no watermark-eviction restriction is needed in
    * the oracle (state eviction only happens between batches). */
  private def drainIntervalJoin(s: SparkSession, stagedPath: String): DataFrame = {
    val run = runDir("graft_q50_run")
    requireSingleBatchStaging(stagedPath, "q50")
    val schema = s.read.parquet(stagedPath).schema
    def side(tpe: String) = s.readStream.schema(schema).parquet(stagedPath)
      .filter(col("event_type") === tpe)
    val views = side("view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val purchases = side("purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    val q = StreamJobs
      .intervalJoinStream(views, purchases, key = "user_id",
        leftTs = "v_ts", rightTs = "p_ts", within = JoinWithin)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", s"$run/out")
      .option("checkpointLocation", s"$run/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(600000), "q50: streaming drain did not finish within 600s")
    try graft.operators.Reconcile.deleteRecursively(s"$run/ckpt")
    catch { case _: Exception => () }
    s.read.parquet(s"$run/out")
      .select(col("user_id"), col("view_id"), col("r_purchase_id").as("purchase_id"),
        unix_micros(col("v_ts")).as("view_us"), unix_micros(col("p_ts")).as("purchase_us"),
        Stable.r4(col("r_value")).as("purchase_value"))
  }

  /** q50 — STREAM-STREAM interval join, oracle-checked: pair every view
    * with the same user's purchases within [[JoinWithin]] after it —
    * [[StreamJobs.intervalJoinStream]] (until now unit-only) drained
    * `AvailableNow` through an append parquet sink against the plain batch
    * join in DuckDB. The fourth streaming surface pinned cross-engine
    * (q39 foreachBatch, q44/q46 windowed agg, q48 keyed state — this one
    * two-sided join state). 100 TB: both sides are watermarked AND the
    * join carries the time-range conjunct, so Spark bounds each side's
    * buffered state to the horizon — attribution joins run forever on
    * unbounded streams precisely because of that pair. */
  val q50IntervalJoinStream = QueryDef(
    "q50_interval_join_stream",
    s"""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       |  epoch_us(v.ts) AS view_us, epoch_us(p.ts) AS purchase_us,
       |  ${Stable.sqlR4("p.value")} AS purchase_value
       |FROM events v JOIN events p
       |  ON v.user_id = p.user_id
       | AND v.event_type = 'view' AND p.event_type = 'purchase'
       | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 6 HOUR""".stripMargin) { (s, d) =>
    drainIntervalJoin(s, ensureStagedEvents(s, d))
  }

  /** Bench-only machinery calibration for q50: the identical two-stream
    * join drain over a staged 2-row source holding one view and one
    * purchase a minute apart — one pair emits, so the sink is non-empty. */
  val q50MachineryProbe: (SparkSession, String) => DataFrame =
    (s, d) => drainIntervalJoin(s,
      ensureStaged(s"$d#join-probe", p => {
        import s.implicits._
        Seq(
          (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "view", 1.0, "{}"),
          (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7L, "purchase", 2.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("overwrite").parquet(p)
      }))

  /** Staged documents with a synthesized deterministic arrival time
    * (`2024-01-01 + doc_id seconds`) — the dedup-at-the-door stream needs
    * an event-time column and the batch table has none. One file, one
    * micro-batch. */
  private def ensureStagedDocs(s: SparkSession, d: String): String =
    ensureStaged(s"$d#docs", p =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          timestamp_seconds(lit(1704067200L) + col("doc_id")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(p))

  /** The drain behind q51 (and its probe). */
  private def drainDedupStream(s: SparkSession, stagedPath: String): DataFrame = {
    val run = runDir("graft_q51_run")
    requireSingleBatchStaging(stagedPath, "q51")
    val schema = s.read.parquet(stagedPath).schema
    val stream = s.readStream.schema(schema).parquet(stagedPath)
    val q = StreamJobs.dedupStream(stream, textCol = "text", tsCol = "ts")
      .select(md5(col("text").cast("binary")).as("text_md5"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", s"$run/out")
      .option("checkpointLocation", s"$run/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(600000), "q51: streaming drain did not finish within 600s")
    try graft.operators.Reconcile.deleteRecursively(s"$run/ckpt")
    catch { case _: Exception => () }
    s.read.parquet(s"$run/out")
  }

  /** q51 — STREAMING exact dedup at the door, oracle-checked:
    * [[StreamJobs.dedupStream]] (`dropDuplicatesWithinWatermark` on the
    * content hash, until now unit-only) drained `AvailableNow` over the
    * staged corpus and read back. WHICH copy survives a duplicate set is
    * arrival-order-dependent, so the declared projection keeps only the
    * content hash itself — a column every survivor determines identically —
    * making the emitted SET deterministic: exactly DuckDB's
    * `DISTINCT md5(text)`. d01 is the batch twin (keep min doc_id); this
    * pins the streaming emission contract. 100 TB: state is keyed by the
    * same content hash the batch groupBy shuffles on, and the watermark
    * bounds it by (ingest rate × delay), not corpus size. */
  val q51DedupStream = QueryDef(
    "q51_dedup_stream",
    "SELECT DISTINCT md5(text) AS text_md5 FROM documents") { (s, d) =>
    drainDedupStream(s, ensureStagedDocs(s, d))
  }

  /** Bench-only machinery calibration for q51: the identical dedup drain
    * over a staged 1-row corpus. */
  val q51MachineryProbe: (SparkSession, String) => DataFrame =
    (s, d) => drainDedupStream(s,
      ensureStaged(s"$d#docs-probe", p => {
        import s.implicits._
        Seq((1L, "probe text",
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
          .toDF("doc_id", "text", "ts")
          .coalesce(1).write.mode("overwrite").parquet(p)
      }))

  /** The drain behind q55: stream-STATIC equi-join (the streaming
    * enrichment shape — a batch dimension joined into a stream without
    * any stream-side state) into a complete-mode aggregation. The static
    * side is marked broadcast: each micro-batch hash-joins against the
    * driver-shipped dim, no shuffle of the stream at the join, exactly
    * how a 1000-executor cluster enriches an event firehose against a
    * dimension table. */
  private def drainStaticEnrich(s: SparkSession, d: String, stagedPath: String): DataFrame = {
    val ckpt = runDir("graft_q55_run")
    val schema = s.read.parquet(stagedPath).schema
    val stream = s.readStream.schema(schema).parquet(stagedPath)
    val dim = broadcast(
      Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")))
    val n = token.incrementAndGet()
    val table = s"graft_q55_out_$n"
    s.catalog.dropTempView(s"graft_q55_out_${n - 1}")
    val q = stream
      .join(dim, stream("user_id") === dim("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(table)
      .option("checkpointLocation", s"$ckpt/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(600000), "q55: streaming drain did not finish within 600s")
    finally dropDir(ckpt)
    s.table(table)
      .select(col("c_mktsegment"), col("event_type"),
        col("n_events"), Stable.r4(col("sum_value")).as("sum_value"))
  }

  /** q55 — stream-static enrichment join, drained and read back: the
    * events stream joined against the static customer dimension
    * (broadcast — no stream-side shuffle, no watermark state; the static
    * side is re-planned per micro-batch, which is the entire point of the
    * stream-static contract) and aggregated per (segment, event type).
    * The oracle is the identical batch join+aggregate — proving the
    * enrichment path loses and duplicates nothing. */
  val q55StreamStaticJoin = QueryDef(
    "q55_stream_static_join",
    s"""SELECT c.c_mktsegment, e.event_type,
       |  count(*) AS n_events,
       |  ${Stable.sqlR4("sum(e.value)")} AS sum_value
       |FROM events e JOIN customer c ON e.user_id = c.c_custkey
       |GROUP BY c.c_mktsegment, e.event_type""".stripMargin) { (s, d) =>
    drainStaticEnrich(s, d, ensureStagedEvents(s, d))
  }

  /** Bench-only machinery calibration for q55: the identical
    * stream-static drain over a staged 1-row events source (user 0 exists
    * in every customer fixture, so the joined sink is non-empty). */
  val q55MachineryProbe: (SparkSession, String) => DataFrame =
    (s, d) => drainStaticEnrich(s, d,
      ensureStaged(s"$d#enrich-probe", p => {
        import s.implicits._
        Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0L, "view", 1.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("overwrite").parquet(p)
      }))

  /** Staged incoming batch for q57: d16's deterministic twins (id+100000,
    * first 14 chars cut, pre-normalized to `t`) with a synthesized arrival
    * time. One file, one micro-batch. */
  private def ensureStagedTwins(s: SparkSession, d: String): String =
    ensureStaged(s"$d#twins", p => {
      val t0 = lower(trim(col("text")))
      Tables.documents(s, d)
        .select((col("doc_id") + 100000).as("doc_id"),
          t0.substr(lit(15), length(t0)).as("t"),
          timestamp_seconds(lit(1704067200L) + col("doc_id")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(p)
    })

  /** The drain behind q57 (and its probe): each micro-batch runs the d16
    * machinery against the PERSISTED history index — batch shingles +
    * signatures (map-only), a batch-bands ⋈ index band equi-join, exact
    * Jaccard verify, then a left-anti of the batch against its verified
    * matches; survivors append to the sink. The history side arrives
    * PREBUILT: q57 reloads the stored bucketed index
    * ([[graft.operators.Dedup.nearDupStoredIndex]] — round-11 verdict #5:
    * the index is now actually written once and read back, so every
    * micro-batch pays batch-side cost only), the machinery probe passes
    * an inline 1-row side. There is NO stream state at all: the "state"
    * is the static index, so nothing grows with stream length. */
  private def drainNearDupGate(
      s: SparkSession, stagedPath: String,
      h: graft.operators.Dedup.NearDupSide,
      bp: graft.operators.Dedup.BandParams): DataFrame = {
    import graft.operators.Dedup
    val run = runDir("graft_q57_run")
    requireSingleBatchStaging(stagedPath, "q57")
    val schema = s.read.parquet(stagedPath).schema
    val stream = s.readStream.schema(schema).parquet(stagedPath)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val inc = batch.select(col("doc_id"), col("t"))
        val i = Dedup.nearDupPipeline(inc, bp)
        val matches = Dedup.nearDupMatches(h.sh, h.bands, i.sh, i.bands)
        try inc.select(col("doc_id").as("in_id"))
          .join(matches.select("in_id").distinct(), Seq("in_id"), "left_anti")
          .write.mode("append").parquet(s"$run/out")
        // the batch's survivors are durably in the sink — its two cached
        // frames are dead weight for the rest of the drain (and the
        // harness-level clearCache between measurements can't reach
        // inside one): release per batch, or a long drain accumulates a
        // block-manager pair per micro-batch under the 4 GiB gate heap
        finally i.release()
      }
      .option("checkpointLocation", s"$run/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(600000), "q57: streaming drain did not finish within 600s")
    // same for the drain-scoped history side once the drain is over
    finally h.release()
    try graft.operators.Reconcile.deleteRecursively(s"$run/ckpt")
    catch { case _: Exception => () }
    s.read.parquet(s"$run/out")
  }

  /** q57 — streaming NEAR-dup gate at the door, oracle-checked: the
    * streaming twin of d16 (as q51 is of d01) — each arriving micro-batch
    * is checked for near-duplicates against the historical corpus's
    * MinHash band index and only the documents with NO verified match
    * survive into the sink. The survivor SET is batch-deterministic (a
    * doc's membership depends only on itself vs history, never on
    * arrival order), so the oracle is d16's match CTEs with the verified
    * in_ids anti-joined away. 100 TB: the index side is computed once and
    * persisted; per-batch cost is the batch's signature build plus a
    * delta-sized band equi-join — and unlike q48/q51 there is zero
    * watermark state, so stream length never grows anything. */
  val q57NearDupStreamGate = QueryDef(
    "q57_neardup_stream_gate",
    s"""WITH ${graft.operators.Dedup.nearDupVerCtes}
       |SELECT i.doc_id AS in_id
       |FROM inc i LEFT JOIN (SELECT DISTINCT in_id FROM ver) v
       |  ON i.doc_id = v.in_id
       |WHERE v.in_id IS NULL""".stripMargin) { (s, d) =>
    import graft.operators.Dedup
    val bp = Dedup.bandParamsFor(Dedup.corpusDocsFor(s, d))
    drainNearDupGate(s, ensureStagedTwins(s, d),
      Dedup.nearDupStoredIndex(s, d, bp), bp)
  }

  /** Bench-only machinery calibration for q57: the identical gate drain
    * over a staged 1-row batch against a 1-row disjoint-vocab history
    * (fixture band parameters) — the survivor sink is non-empty. */
  val q57MachineryProbe: (SparkSession, String) => DataFrame =
    (s, d) => {
      import s.implicits._
      val bp = graft.operators.Dedup.bandParamsFor(1L)
      val hist = Seq((1L, "zulu yankee xray whiskey victor uniform tango sierra"))
        .toDF("doc_id", "t")
      drainNearDupGate(s,
        ensureStaged(s"$d#twins-probe", p => {
          Seq((100001L, "alpha bravo charlie delta echo foxtrot golf hotel",
            java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
            .toDF("doc_id", "t", "ts")
            .coalesce(1).write.mode("overwrite").parquet(p)
        }),
        graft.operators.Dedup.nearDupPipeline(hist, bp), bp)
    }

  /** Staged probe stream for q58: exactly s17's probe slice — base ∪
    * appended delta vectors with vec_id % ProbeMod == 0 — with a
    * synthesized arrival time. One file, one micro-batch. The delta
    * probes are the round-15 verdict's "serve what you appended" claim
    * made oracle-checkable: an online path still reading the base-only
    * index ranks them against a corpus that excludes their own segment
    * and hash-mismatches s17's oracle. */
  private def ensureStagedProbeVecs(s: SparkSession, d: String): String =
    ensureStaged(s"$d#vecprobes-union", p =>
      graft.operators.Similarity.unionProbeVecs(s, d)
        .select(col("vec_id"), col("embedding"),
          timestamp_seconds(lit(1704067200L) + col("vec_id")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(p))

  /** The drain behind q58 (and its probe): each micro-batch's vectors are
    * ANN-enriched against the PERSISTED vector index
    * ([[graft.operators.Similarity.annEnrichBatch]] — probe residuals
    * derived map-only from the spec literals, ADC rank against the stored
    * codes) and the top-k rows append to the sink. The index side is
    * static and prebuilt; there is no watermark state. */
  private def drainAnnEnrich(
      s: SparkSession, d: String, stagedPath: String,
      langFilter: Option[String] = None): DataFrame = {
    val tag = if (langFilter.isEmpty) "q58" else "q59"
    val run = runDir(s"graft_${tag}_run")
    requireSingleBatchStaging(stagedPath, tag)
    val schema = s.read.parquet(stagedPath).schema
    val stream = s.readStream.schema(schema).parquet(stagedPath)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity
          .annEnrichBatch(s, d, batch.select(col("vec_id"), col("embedding")),
            langFilter = langFilter)
          .write.mode("append").parquet(s"$run/out")
      }
      .option("checkpointLocation", s"$run/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(600000), s"$tag: streaming drain did not finish within 600s")
    finally {
      try graft.operators.Reconcile.deleteRecursively(s"$run/ckpt")
      catch { case _: Exception => () }
    }
    s.read.parquet(s"$run/out")
  }

  /** q58 — streaming ANN enrichment against the persisted vector index,
    * drained and read back: the vector twin of q57 (q55's stream-static
    * shape with the stored-index candidate join). Each arriving vector
    * is ranked against the stored PQ codes of base ∪ delta segment —
    * the index s17 maintains, served online — with the candidate read
    * CELL-PRUNED to the batch's touched cellrs before any shuffle
    * ([[graft.operators.Similarity.annEnrichBatch]]). Per-probe top-k
    * depends only on the probe vs the static index — never on batch
    * boundaries or arrival order — so the emitted set is deterministic
    * and the oracle is s17's verbatim (the staged stream IS s17's probe
    * slice, appended vectors included). 100 TB: the index is built once
    * (s16), appended daily (s17), and served online; per-batch cost is
    * the batch's map-only residual projection plus a bucket-pruned cellr
    * equi-join ∝ touched cells — zero stream state, zero training, zero
    * corpus scans per batch. */
  val q58AnnStreamEnrich = QueryDef(
    "q58_ann_stream_enrich",
    graft.operators.Similarity.s17IvfPqAppend.oracle.get) { (s, d) =>
    drainAnnEnrich(s, d, ensureStagedProbeVecs(s, d))
  }

  /** q59 — q58's online serving × s20's metadata predicate: each arriving
    * vector is ranked against the QUALIFYING (`lang = 'en'`) stored codes
    * of base ∪ delta segment — the filtered-retrieval composition a
    * production stack actually runs (serve only candidates passing a
    * license/language/source predicate, online). The predicate rides the
    * persisted `lang` column of the cell-pruned candidate read
    * ([[graft.operators.Similarity.annEnrichBatch]]'s `langFilter` — one
    * more pushed scan predicate, never a per-batch join); semantics are
    * true pre-filter (top-k = best k qualifying neighbors, batch-
    * boundary-independent like q58's). A delta candidate qualifies by its
    * SOURCE document's attribute. Oracle: s17's chain with the
    * candidate-side documents join
    * ([[graft.operators.Similarity.ivfPqAppendOracleSql]]) — attribute
    * attached by join against the source of truth, checking the persisted
    * column row-for-row, delta offset mapping included. */
  val q59AnnStreamFiltered = QueryDef(
    "q59_ann_stream_filtered",
    graft.operators.Similarity.ivfPqAppendOracleSql(
      Some(graft.operators.Similarity.FilterLang))) { (s, d) =>
    drainAnnEnrich(s, d, ensureStagedProbeVecs(s, d),
      Some(graft.operators.Similarity.FilterLang))
  }

  /** Bench-only machinery calibration for q58: the identical enrichment
    * drain over a staged 1-row probe (vec_id 0's slot, deterministic
    * nonzero vector) against the same prebuilt index — one probe touches
    * one cellr ring, so the measured floor is drain machinery, not
    * candidate work. */
  val q58MachineryProbe: (SparkSession, String) => DataFrame =
    (s, d) => drainAnnEnrich(s, d, ensureStagedOneProbe(s, d))

  /** q59's twin probe: the identical 1-row drain WITH the predicate —
    * same machinery floor, so the calibrated q59 reading isolates the
    * filtered candidate work exactly like q58's isolates the unfiltered. */
  val q59MachineryProbe: (SparkSession, String) => DataFrame =
    (s, d) => drainAnnEnrich(s, d, ensureStagedOneProbe(s, d),
      Some(graft.operators.Similarity.FilterLang))

  private def ensureStagedOneProbe(s: SparkSession, d: String): String =
    ensureStaged(s"$d#vecprobes-probe", p =>
      s.range(1).select(
        lit(0L).as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          i => (i.cast("double") / lit(64.0)).cast("float")).as("embedding"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(p))

  val all: Seq[QueryDef] = Seq(q44WindowedStreaming, q46WindowedAppendSink,
    q48SessionizeAppendSink, q50IntervalJoinStream, q51DedupStream,
    q55StreamStaticJoin, q57NearDupStreamGate, q58AnnStreamEnrich,
    q59AnnStreamFiltered)
}
