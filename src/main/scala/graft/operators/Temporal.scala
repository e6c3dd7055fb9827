package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.{QueryDef, Stable}
import graft.tables.Tables

/** Temporal joins Spark lacks as built-ins — as-of join and range
  * (interval) join — engine extensions (the reference is a daily batch with
  * no temporal join surface; these are table stakes for an events/billing
  * analytics library).
  *
  * Both are implemented in the shape that survives 100 TB, where the naive
  * formulations (`ON r.ts <= e.ts` / `ON e.ts BETWEEN lo AND hi`) plan as
  * BroadcastNestedLoop/cartesian joins:
  *
  *  - [[asofJoin]]: union both sides and take a running `last` over a
  *    per-key window — ONE shuffle on the key, NO join operator at all
  *    (the kdb/Flink temporal-join shape). Cost is the same as sorting
  *    each key group once; no right-side broadcast requirement.
  *  - [[rangeJoin]]: explode each interval into fixed-width bucket keys
  *    and equi-join on the bucket, then apply the exact range predicate as
  *    a residual filter. Each event carries exactly one bucket, so a
  *    matching pair is produced exactly once — no post-join dedup. The
  *    bucket width bounds the replication factor at
  *    `ceil(interval / width) + 1` rows per interval.
  */
object Temporal {

  /** As-of join: for each `left` row, the single latest `right` row with
    * `right.ts <= left.ts` on the same `keys` (at-or-before semantics —
    * a right row at exactly the left timestamp matches).
    *
    * Output: every left column, plus each right payload column (right
    * columns minus keys minus ts) as `asof_<col>`. With `innerOnly` (the
    * default) left rows with no matching right row are dropped; pass
    * `innerOnly = false` for left-outer semantics (null payload instead).
    *
    * Ties: among right rows sharing the maximal timestamp, the one with
    * the lexicographically greatest payload struct wins (field order =
    * right-side column order) — deterministic regardless of partitioning.
    *
    * `ts` must be the same numeric/orderable type on both sides (use
    * micros-since-epoch longs for timestamp data; see [[q25AsofJoin]]). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               ts: String, innerOnly: Boolean = true): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == ts)
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    require(!(left.columns ++ right.columns).exists(_.startsWith("__")),
      "column names starting with __ collide with asofJoin internals")
    val leftOthers = left.columns.filterNot(c => keys.contains(c) || c == ts)
    val payloadT = StructType(
      right.schema.fields.filter(f => payloadCols.contains(f.name)))
    val leftT = left.schema

    val l = left.select(
      keys.map(col) ++ Seq(col(ts).as("__ts"), lit(1).as("__src"),
        lit(null).cast(payloadT).as("__p")) ++ leftOthers.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(ts).as("__ts"), lit(0).as("__src"),
        struct(payloadCols.map(col).toIndexedSeq: _*).as("__p")) ++
        leftOthers.map(c => lit(null).cast(leftT(c).dataType).as(c)): _*)

    // right rows (__src=0) sort before left rows at equal ts, so an
    // at-the-same-instant right row is visible to the left row; among
    // equal-ts right rows the greatest payload struct is last, hence wins
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__src").asc, col("__p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1 &&
        (if (innerOnly) col("__asof").isNotNull else lit(true)))
      .select(
        keys.map(col) ++ Seq(col("__ts").as(ts)) ++ leftOthers.map(col) ++
          payloadCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Range (interval) join: all (range, event) pairs with
    * `lo <= event.ts < hi` — no equi-key required. `lo`/`hi`/`ts` are
    * micros-since-epoch longs; `bucketMicros` is the bucketing width (pick
    * it near the typical interval length so each interval explodes into
    * ~2-3 bucket keys). Output: every `ranges` column plus every `events`
    * column (names must not collide). */
  def rangeJoin(ranges: DataFrame, events: DataFrame,
                lo: String, hi: String, ts: String,
                bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    require(!(ranges.columns ++ events.columns).contains("__bucket"),
      "column name __bucket collides with rangeJoin internals")
    // [lo, hi) covers buckets lo/w .. (hi-1)/w; an event has exactly ONE
    // bucket, so each qualifying pair joins exactly once. Empty/inverted
    // intervals (hi <= lo) are dropped UP FRONT: they can match nothing
    // under the [lo, hi) contract, but sequence(a, b) with a > b would
    // generate a DESCENDING bucket range — one junk row per bucket between
    // hi and lo on dirty interval data, all discarded later by the residual
    // filter at pure row-explosion cost.
    val rb = ranges.filter(col(hi) > col(lo)).withColumn("__bucket",
      explode(sequence(floorDiv(col(lo), bucketMicros),
        floorDiv(col(hi) - 1, bucketMicros))))
    val eb = events.withColumn("__bucket", floorDiv(col(ts), bucketMicros))
    rb.join(eb, Seq("__bucket"))
      .filter(col(ts) >= col(lo) && col(ts) < col(hi))
      .drop("__bucket")
  }

  /** Exact floor-division for non-negative longs: `(c - c%d)/d` divides an
    * exact multiple, so the intermediate double is exact for any value
    * ≤ 2^53 (plain `floor(c/d)` is also safe at micros magnitudes but
    * relies on the rounding error staying under the 1µs grid). */
  private def floorDiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast("long")

  // ---------- q25: as-of join over the events stream ----------

  /** q25 — join every non-purchase event to the user's latest purchase at
    * or before it ("prevailing rate" lookup). Both sides compare micros
    * (epoch_us / unix_micros) so the nanos-source truncation is identical.
    * The oracle states the same semantics as an inequality join + top-1
    * window — an independently-shaped formulation, so the union+window
    * implementation is cross-checked, not restated. */
  val q25AsofJoin = QueryDef(
    "q25_asof_join",
    s"""SELECT event_id, us, user_id, value, asof_event_id, asof_value FROM (
       |  SELECT e.event_id, epoch_us(e.ts) AS us, e.user_id,
       |         ${Stable.sqlR4("e.value")} AS value,
       |         p.event_id AS asof_event_id,
       |         ${Stable.sqlR4("p.value")} AS asof_value,
       |         row_number() OVER (
       |           PARTITION BY e.event_id
       |           ORDER BY epoch_us(p.ts) DESC, p.event_id DESC) AS rn
       |  FROM events e JOIN events p
       |    ON p.user_id = e.user_id
       |   AND p.event_type = 'purchase'
       |   AND epoch_us(p.ts) <= epoch_us(e.ts)
       |  WHERE e.event_type <> 'purchase') WHERE rn = 1""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"), unix_micros(col("ts")).as("us"), col("user_id"),
      col("event_type"), col("value"))
    val left = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("us"), col("event_id"), col("value"))
    // payload column order (event_id, value) makes the tie-break "greatest
    // event_id among equal-ts purchases" — mirrored by the oracle's
    // ORDER BY p.event_id DESC
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"), col("value"))
    asofJoin(left, right, keys = Seq("user_id"), ts = "us")
      .select(col("event_id"), col("us"), col("user_id"),
        Stable.r4(col("value")).as("value"),
        col("asof_event_id"), Stable.r4(col("asof_value")).as("asof_value"))
  }

  // ---------- q26: range join, no equi-key ----------

  private val TwoHoursUs = 2L * 3600L * 1000000L
  private val HourUs = 3600L * 1000000L

  /** q26 — per "incident" (each error event opens a [ts, ts+2h) window),
    * count and sum ALL events falling in the window — a pure range join
    * with NO equi-key, the case where a naive BETWEEN join plans as a
    * nested-loop over the full corpus (PlanSpec asserts it doesn't). */
  val q26RangeJoin = QueryDef(
    "q26_range_join",
    s"""WITH r AS (
       |  SELECT event_id AS range_id, epoch_us(ts) AS lo,
       |         epoch_us(ts) + $TwoHoursUs AS hi
       |  FROM events WHERE event_type = 'error'),
       |e AS (SELECT epoch_us(ts) AS us, value FROM events)
       |SELECT r.range_id, count(*) AS n_events,
       |       ${Stable.sqlR4("sum(e.value)")} AS sum_value
       |FROM r JOIN e ON e.us >= r.lo AND e.us < r.hi
       |GROUP BY r.range_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"), unix_micros(col("ts")).as("us"),
      col("event_type"), col("value"))
    val ranges = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("range_id"), col("us").as("lo"),
        (col("us") + lit(TwoHoursUs)).as("hi"))
    rangeJoin(ranges, ev.select(col("us"), col("value")),
      lo = "lo", hi = "hi", ts = "us", bucketMicros = HourUs)
      .groupBy("range_id")
      .agg(count(lit(1)).as("n_events"),
        Stable.r4(sum("value")).as("sum_value"))
  }

  val all: Seq[QueryDef] = Seq(q25AsofJoin, q26RangeJoin)
}
