package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.{QueryDef, Stable}
import graft.tables.Tables

/** Snapshot reconciliation — diff two keyed snapshots of a table into
  * added / removed / changed rows (the data-lake audit op: "what did
  * yesterday's load actually change?"). An engine extension: the reference
  * overwrites partitions blindly; a reconciliation pass is how an operator
  * VERIFIES an idempotent re-run changed nothing, or audits an upstream
  * restatement.
  *
  * 100 TB shape: one full-outer equi-join keyed by the row key — each side
  * shuffles once on the same key, so two snapshots written with
  * [[graft.pipeline.Bucketing]] on the key reconcile with ZERO shuffle.
  * Never a cartesian; the classification is a row-local projection.
  */
object Reconcile {

  /** All (key, status) rows where the snapshots differ; `unchanged` rows
    * are dropped (at scale they are ~everything — emitting them would make
    * the diff as big as the table). `compareCols` are the value columns
    * equality is judged on (null-safe: null == null). Output: keys,
    * `status` (added/removed/changed), and each compare column as
    * `old_<c>` / `new_<c>`. Keys must be unique per snapshot — a dup-key
    * snapshot makes "changed" ill-defined (the q21 dup-dim lesson). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty)
    val o = oldSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(1))
    val n = newSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(1))
    val renamedO = compareCols.foldLeft(o)((df, c) => df.withColumnRenamed(c, s"old_$c"))
    val renamedN = compareCols.foldLeft(n)((df, c) => df.withColumnRenamed(c, s"new_$c"))
    val joined = renamedO.join(renamedN, keys, "full_outer")
    val anyDiff: Column = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(anyDiff, "changed"))
      .filter(col("status").isNotNull)
      .select((keys.map(col) :+ col("status")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** The two deterministically-derived `events` snapshots q33/q36 diff:
    * new drops event_id % 13 == 0 (removed), doubles `value` where
    * event_id % 7 == 0 (changed), and appends shifted ids where
    * event_id % 11 == 0 (added). */
  private def demoSnapshots(s: org.apache.spark.sql.SparkSession,
                            d: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d).select(col("event_id"), col("value"))
    val newSnap = ev.filter(col("event_id") % 13 =!= 0)
      .withColumn("value",
        when(col("event_id") % 7 === 0, col("value") * 2.0).otherwise(col("value")))
      .unionAll(ev.filter(col("event_id") % 11 === 0)
        .select((col("event_id") + 10000000L).as("event_id"), col("value")))
    (ev, newSnap)
  }

  /** Shared oracle: rebuilds both snapshots and diffs them with an
    * independent FULL JOIN + CASE formulation. */
  private val demoDiffSql: String = {
    val newSnap =
      """SELECT event_id, CASE WHEN event_id % 7 = 0 THEN value * 2.0 ELSE value END AS value
        |  FROM events WHERE event_id % 13 <> 0
        |UNION ALL
        |SELECT event_id + 10000000, value FROM events WHERE event_id % 11 = 0""".stripMargin
    s"""WITH o AS (SELECT event_id, value FROM events),
       |n AS (${newSnap.replace("\n", "\n  ")})
       |SELECT
       |  COALESCE(o.event_id, n.event_id) AS event_id,
       |  CASE WHEN o.event_id IS NULL THEN 'added'
       |       WHEN n.event_id IS NULL THEN 'removed'
       |       ELSE 'changed' END AS status,
       |  ${Stable.sqlR4("o.value")} AS old_value,
       |  ${Stable.sqlR4("n.value")} AS new_value
       |FROM o FULL JOIN n ON o.event_id = n.event_id
       |WHERE o.event_id IS NULL OR n.event_id IS NULL
       |   OR o.value IS DISTINCT FROM n.value""".stripMargin
  }

  private def roundedDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame =
    snapshotDiff(oldSnap, newSnap, keys = Seq("event_id"), compareCols = Seq("value"))
      .select(col("event_id"), col("status"),
        Stable.r4(col("old_value")).as("old_value"),
        Stable.r4(col("new_value")).as("new_value"))

  /** q33 — reconcile the two derived snapshots directly (each side shuffles
    * once on the key for the full-outer join). */
  val q33SnapshotDiff = QueryDef("q33_snapshot_diff", demoDiffSql) { (s, d) =>
    val (oldSnap, newSnap) = demoSnapshots(s, d)
    roundedDiff(oldSnap, newSnap)
  }

  /** q36 — the SAME reconciliation executed through CO-BUCKETED snapshot
    * tables: both snapshots are written with
    * [[graft.pipeline.Bucketing.writeBucketed]] keyed by event_id, read
    * back through the catalog (a path read would drop the bucket spec),
    * and diffed. This executes the zero-shuffle claim in this file's
    * header end-to-end: each side's scan already reports the join key's
    * hash partitioning, so the full-outer join plans with ZERO Exchange —
    * PlanSpec pins that. At 100 TB this is the difference between a daily
    * audit that re-shuffles two full table snapshots and one that only
    * streams co-located bucket pairs through the join. Results are
    * identical to q33 (bucketing is a layout choice), hence the same
    * oracle. */
  /** q36's bucketed snapshot tables are written ONCE per (JVM, data dir)
    * and reused by every subsequent invocation — the operational shape the
    * operator models (snapshots are bucketed at ingest, the daily audit
    * only reads), and what lets Bench time the zero-Exchange reconcile
    * itself instead of excluding q36 for its writes. Names carry the data
    * dir + pid, so concurrent JVMs sharing /tmp and a warehouse never
    * clobber each other; within a JVM the ensure is synchronized and the
    * pair is NEVER dropped (the round-6 drop-previous-on-next-call scheme
    * could pull tables out from under a concurrent caller's lazy frame —
    * ADVICE r6). A JVM-exit hook removes the temp bucket files. */
  private val q36Written = scala.collection.mutable.Map.empty[String, (String, String)]
  private val q36Roots = scala.collection.mutable.Set.empty[String]
  private val q36Token = new java.util.concurrent.atomic.AtomicInteger(0)
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      // snapshot under the SAME lock ensureBucketedSnapshots mutates under —
      // mutable.Set is not thread-safe and an exit can race a first write
      // (ADVICE r7)
      val roots = q36Written.synchronized(q36Roots.toList)
      roots.foreach { r =>
        try deleteRecursively(r) catch { case _: Exception => () }
      }
    }))
  }

  private[graft] def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val it = java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      try it.forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally it.close()
    }
  }

  /** Write (if not already written in this JVM) and name the co-bucketed
    * snapshot pair for data dir `d`. Synchronized: first caller pays the
    * write, everyone else reuses the catalog entries.
    *
    * A cache MISS with a stale map entry (a second SparkSession in the
    * same JVM with a fresh in-memory catalog no longer holding the tables)
    * writes under a FRESH token — the old root is never deleted or reused,
    * so a lazy frame from the earlier session can still read its files
    * until JVM exit (the shutdown hook cleans every root). Assumes the
    * in-memory catalog: the pid+counter-suffixed table names are per-JVM
    * throwaways; a persistent metastore would need explicit DROPs
    * (ADVICE r7). */
  private def ensureBucketedSnapshots(s: org.apache.spark.sql.SparkSession,
                                      d: String): (String, String) =
    q36Written.synchronized {
      val cached = q36Written.get(d).filter { case (o, n) =>
        s.catalog.tableExists(o) && s.catalog.tableExists(n)
      }
      cached.getOrElse {
        import graft.pipeline.Bucketing
        val token = s"${d.replaceAll("[^A-Za-z0-9]+", "_")}_" +
          s"${ProcessHandle.current.pid}_${q36Token.incrementAndGet()}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_q36_$token"
        val (tblOld, tblNew) = (s"graft_q36_old_$token", s"graft_q36_new_$token")
        // the counter makes the root fresh within this JVM; stale
        // same-token files can only come from a pid-reuse collision
        deleteRecursively(root)
        val (oldSnap, newSnap) = demoSnapshots(s, d)
        Bucketing.writeBucketed(oldSnap, tblOld, Seq("event_id"), 8, Some(s"$root/old"))
        Bucketing.writeBucketed(newSnap, tblNew, Seq("event_id"), 8, Some(s"$root/new"))
        q36Roots += root
        q36Written(d) = (tblOld, tblNew)
        (tblOld, tblNew)
      }
    }

  /** q36 — q33's reconciliation through CO-BUCKETED snapshot tables: both sides pre-bucketed by event_id, so the full-outer diff join plans with ZERO Exchange (PlanSpec-pinned; results equal q33). Snapshots are bucketed once per JVM at first use — the audit itself is read-only. */
  val q36BucketedReconcile = QueryDef("q36_bucketed_reconcile", demoDiffSql) { (s, d) =>
    import graft.pipeline.Bucketing
    val (tblOld, tblNew) = ensureBucketedSnapshots(s, d)
    roundedDiff(
      Bucketing.readBucketed(s, tblOld),
      Bucketing.readBucketed(s, tblNew))
  }

  val all: Seq[QueryDef] = Seq(q33SnapshotDiff, q36BucketedReconcile)
}
