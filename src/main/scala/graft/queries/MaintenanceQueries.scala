package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Stable.r4
import graft.tables.Tables

/** Table-maintenance operators: the mutation/upkeep half of a warehouse
  * pipeline that the reference performs imperatively (delete-partition +
  * re-insert, `main.py:177-191`; tmp-table swap, `excute_month_task.py:
  * 167-186`) re-expressed as DECLARED relational plans — CDC MERGE
  * application, time-spine gap filling, and incremental materialized-view
  * maintenance. Each is one equi-shuffle on its natural key, so the shapes
  * hold at 100 TB: MERGE is a key-partitioned full-outer join (in
  * production pruned to the touched key-range partitions), the spine
  * explode is per-key map work, and the MV merge touches only
  * |grain| + |delta| rows — never the full history.
  */
object MaintenanceQueries {

  /** Synthetic-but-deterministic change feed derived from the snapshot
    * itself: deletes (key % 13 = 0), updates (else key % 7 = 0, price
    * uplift + status rewrite), and inserts (else key % 11 = 0, re-keyed
    * past the live key space). The op CASE and the re-key share ONE
    * precedence (13 > 7 > 11): a key in an overlap class (e.g. 143 =
    * 11·13, 77 = 7·11) keeps its ORIGINAL key, so its D actually deletes
    * the snapshot row and its U rewrites it in place — re-keying every
    * key%11 row regardless of op would orphan those changes (the round-11
    * ADVICE defect: surviving "kept" rows a declared D should have
    * removed, plus phantom "updated" rows at keys that never existed).
    * Derived, not random, so the oracle can rebuild the identical feed. */
  private val InsertOffset = 1000000000000L

  /** q53 — CDC MERGE application (the declarative form of the reference's
    * delete-then-reinsert idempotent write, `main.py:177-191`): apply a
    * change feed (insert/update/delete ops) to a snapshot in ONE
    * key-partitioned full-outer join — matched+U rewrites, matched+D
    * drops, unmatched-I inserts, untouched snapshot rows pass through.
    *
    * 100 TB shape: the join shuffles both sides on the snapshot key once;
    * with a bucketed snapshot the exchange disappears on that side, and
    * AQE broadcasts the feed when a day's changes are small. No window,
    * no second pass — the same plan Delta/Iceberg MERGE lowers to. */
  val q53MergeApply = QueryDef(
    "q53_merge_apply",
    s"""WITH changes AS (
       |  SELECT CASE WHEN o_orderkey % 11 = 0 AND o_orderkey % 13 <> 0
       |                   AND o_orderkey % 7 <> 0
       |              THEN o_orderkey + $InsertOffset
       |              ELSE o_orderkey END AS ck,
       |         CASE WHEN o_orderkey % 13 = 0 THEN 'D'
       |              WHEN o_orderkey % 7 = 0 THEN 'U'
       |              WHEN o_orderkey % 11 = 0 THEN 'I' END AS op,
       |         CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
       |              THEN o_totalprice * 1.05 ELSE o_totalprice END AS new_total,
       |         CASE WHEN o_orderkey % 13 = 0 THEN o_orderstatus
       |              WHEN o_orderkey % 7 = 0 THEN 'X'
       |              ELSE 'N' END AS new_status
       |  FROM orders
       |  WHERE o_orderkey % 13 = 0 OR o_orderkey % 7 = 0 OR o_orderkey % 11 = 0)
       |SELECT coalesce(s.o_orderkey, c.ck) AS o_orderkey,
       |       CASE WHEN c.op = 'U' THEN c.new_status
       |            WHEN c.op = 'I' AND s.o_orderkey IS NULL THEN c.new_status
       |            ELSE s.o_orderstatus END AS status,
       |       ${Stable.sqlR4(
        """CASE WHEN c.op = 'U' THEN c.new_total
          |     WHEN c.op = 'I' AND s.o_orderkey IS NULL THEN c.new_total
          |     ELSE s.o_totalprice END""".stripMargin)} AS total,
       |       CASE WHEN c.op = 'U' THEN 'updated'
       |            WHEN c.op = 'I' AND s.o_orderkey IS NULL THEN 'inserted'
       |            ELSE 'kept' END AS src
       |FROM orders s FULL OUTER JOIN changes c ON s.o_orderkey = c.ck
       |WHERE c.op IS NULL OR c.op <> 'D'""".stripMargin) { (s, d) =>
    val snap = Tables.orders(s, d)
    val k = col("o_orderkey")
    val changes = snap
      .filter(k % 13 === 0 || k % 7 === 0 || k % 11 === 0)
      .select(
        when(k % 11 === 0 && k % 13 =!= 0 && k % 7 =!= 0, k + InsertOffset)
          .otherwise(k).as("o_orderkey"),
        when(k % 13 === 0, "D").when(k % 7 === 0, "U").when(k % 11 === 0, "I").as("op"),
        when(k % 7 === 0 && k % 13 =!= 0, col("o_totalprice") * 1.05)
          .otherwise(col("o_totalprice")).as("new_total"),
        when(k % 13 === 0, col("o_orderstatus"))
          .when(k % 7 === 0, lit("X")).otherwise(lit("N")).as("new_status"))
    val insertedNew = col("op") === "I" && snap("o_orderkey").isNull
    snap.join(changes, snap("o_orderkey") === changes("o_orderkey"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(snap("o_orderkey"), changes("o_orderkey")).as("o_orderkey"),
        when(col("op") === "U", col("new_status"))
          .when(insertedNew, col("new_status"))
          .otherwise(col("o_orderstatus")).as("status"),
        r4(when(col("op") === "U", col("new_total"))
          .when(insertedNew, col("new_total"))
          .otherwise(col("o_totalprice"))).as("total"),
        when(col("op") === "U", "updated")
          .when(insertedNew, "inserted")
          .otherwise("kept").as("src"))
  }

  /** q54 — time-spine gap filling with forward fill: per user, a dense
    * daily spine from first to last activity, daily value sums joined on,
    * gaps carried forward from the last observed day (the reference
    * iterates days imperatively in its driver loop, `main.py:53-56`; this
    * is that loop as data).
    *
    * 100 TB shape: the spine explode is per-key map work (no shuffle —
    * sequence() materializes ≤ span rows per user inline), the daily agg
    * and the spine⋈daily join share the (user, day) key, and the
    * forward-fill window's state is one user's days. Skew bound = the
    * longest per-user span, not the table size. */
  val q54GapFill = QueryDef(
    "q54_gap_fill",
    s"""WITH daily AS (
       |  SELECT user_id, cast(date_trunc('day', ts) AS DATE) AS day,
       |         sum(value) AS day_value
       |  FROM events GROUP BY 1, 2),
       |spine AS (
       |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
       |  FROM (SELECT user_id, min(day) AS mn, max(day) AS mx
       |        FROM daily GROUP BY user_id)),
       |joined AS (
       |  SELECT sp.user_id, sp.day, dl.day_value FROM spine sp
       |  LEFT JOIN daily dl ON sp.user_id = dl.user_id AND sp.day = dl.day)
       |SELECT user_id, day,
       |  ${Stable.sqlR4(
        """last_value(day_value IGNORE NULLS)
          |  OVER (PARTITION BY user_id ORDER BY day
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)} AS filled_value,
       |  (day_value IS NULL) AS is_gap
       |FROM joined""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum("value").as("day_value"))
    val spine = daily
      .groupBy("user_id")
      .agg(min("day").as("mn"), max("day").as("mx"))
      .select(col("user_id"),
        explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(
        col("user_id"), col("day"),
        r4(last(col("day_value"), ignoreNulls = true).over(w)).as("filled_value"),
        col("day_value").isNull.as("is_gap"))
  }

  private val MvCutoff = "2001-06-01 00:00:00"
  private val DeltaEnd = "2001-09-01 00:00:00"

  /** q56 — incremental materialized-view maintenance: yesterday's
    * pre-aggregated MV (history < cutoff) merged with the new delta
    * partition (cutoff ≤ day < end) by RE-AGGREGATING THE PARTIALS —
    * sum-of-sums, sum-of-counts — instead of recomputing from history.
    * The oracle IS the full recompute over the union window, so the gate
    * proves the partial-merge algebra equals the one-pass aggregate.
    *
    * 100 TB shape: the daily refresh touches |grain| + |delta| rows —
    * the MV side is already aggregated (in production read back from the
    * sink, here rebuilt inline so the query is self-contained), the
    * delta scan partition-prunes to the new days, and the merge groupBy
    * shuffles only grain-sized inputs. This is the reference's
    * delete-month-recompute-month loop (`excute_month_task.py:167-186`)
    * replaced by monoid re-aggregation. */
  val q56IncrementalAgg = QueryDef(
    "q56_incremental_agg",
    s"""SELECT l_returnflag, l_linestatus,
       |       ${Stable.sqlR4("sum(l_quantity)")} AS sum_qty,
       |       ${Stable.sqlR4("sum(l_extendedprice)")} AS sum_price,
       |       count(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate < TIMESTAMP '$DeltaEnd'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    def partial(cond: org.apache.spark.sql.Column): DataFrame =
      li.filter(cond)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("p_qty"),
          sum("l_extendedprice").as("p_price"),
          count(lit(1)).as("p_rows"))
    val mv = partial(col("l_shipdate") < lit(MvCutoff).cast("timestamp"))
    val delta = partial(
      col("l_shipdate") >= lit(MvCutoff).cast("timestamp") &&
        col("l_shipdate") < lit(DeltaEnd).cast("timestamp"))
    mv.unionByName(delta)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        r4(sum("p_qty")).as("sum_qty"),
        r4(sum("p_price")).as("sum_price"),
        sum("p_rows").as("n_rows"))
  }

  val all: Seq[QueryDef] = Seq(q53MergeApply, q54GapFill, q56IncrementalAgg)
}
