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

  /** q33 — reconcile two deterministically-derived snapshots of `events`:
    * new drops event_id % 13 == 0 (removed), doubles `value` where
    * event_id % 7 == 0 (changed), and appends shifted ids where
    * event_id % 11 == 0 (added). The oracle rebuilds both snapshots and
    * diffs them with an independent FULL JOIN + CASE formulation. */
  val q33SnapshotDiff = QueryDef(
    "q33_snapshot_diff", {
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
    }) { (s, d) =>
    val ev = Tables.events(s, d).select(col("event_id"), col("value"))
    val oldSnap = ev
    val newSnap = ev.filter(col("event_id") % 13 =!= 0)
      .withColumn("value",
        when(col("event_id") % 7 === 0, col("value") * 2.0).otherwise(col("value")))
      .unionAll(ev.filter(col("event_id") % 11 === 0)
        .select((col("event_id") + 10000000L).as("event_id"), col("value")))
    snapshotDiff(oldSnap, newSnap, keys = Seq("event_id"), compareCols = Seq("value"))
      .select(col("event_id"), col("status"),
        Stable.r4(col("old_value")).as("old_value"),
        Stable.r4(col("new_value")).as("new_value"))
  }

  val all: Seq[QueryDef] = Seq(q33SnapshotDiff)
}
