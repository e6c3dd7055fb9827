package graft.queries

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** The generic relational operator inventory (SURVEY.md §2.1–§2.6) expressed
  * over the driver testdata tables. Each query is the idiomatic Spark
  * DataFrame formulation — declarative, so Catalyst gets pushdown / pruning /
  * partial aggregation for free — paired with a DuckDB oracle.
  *
  * Money/double aggregates are rounded to 4 decimals on BOTH sides so the
  * driver's value-hash compare is stable across summation orders.
  */
object CoreQueries {

  private def r4(c: org.apache.spark.sql.Column) = Stable.r4(c)

  /** A1 (billing_calculation_service.py:164-187): grouped sum at a fixed
    * grain — Spark hash-aggregates with partial+final split automatically. */
  val q01AggGrain = QueryDef(
    "q01_agg_grain",
    """SELECT l_returnflag, l_linestatus,
      |       floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0                         AS sum_qty,
      |       floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0                    AS sum_base,
      |       floor((sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0 AS sum_disc_price,
      |       floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0                         AS avg_disc,
      |       count(*)                                          AS n_rows
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        r4(sum("l_quantity")).as("sum_qty"),
        r4(sum("l_extendedprice")).as("sum_base"),
        r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        r4(avg("l_discount")).as("avg_disc"),
        count(lit(1)).as("n_rows"))
  }

  /** A2 (billing_calculation_service.py:238-284): the same aggregation at a
    * wider (13-key-style) grain — grain widening is just more groupBy keys. */
  val q02AggWide = QueryDef(
    "q02_agg_wide",
    """SELECT l_returnflag, l_linestatus, l_suppkey,
      |       strftime(l_shipdate, '%Y%m')       AS ship_month,
      |       floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0          AS sum_qty,
      |       floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0     AS sum_base,
      |       count(*)                           AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus, l_suppkey, strftime(l_shipdate, '%Y%m')""".stripMargin) { (s, d) =>
    // group on the INT year-month and derive the string per GROUP
    // (optimization round 17, the batch-1 kernel-agg trick): yyyyMM for a
    // 4-digit year is exactly `year*100 + month` rendered as decimal, so
    // the bijection holds and the 600k-row partial aggregate hashes an
    // int instead of running a per-row DateTimeFormatter + hashing a
    // string; the format lands on the 34k GROUPS after the exchange.
    Tables.lineitem(s, d)
      .groupBy(
        col("l_returnflag"), col("l_linestatus"), col("l_suppkey"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ship_ym"))
      .agg(
        r4(sum("l_quantity")).as("sum_qty"),
        r4(sum("l_extendedprice")).as("sum_base"),
        count(lit(1)).as("n_rows"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("l_suppkey"),
        col("ship_ym").cast("string").as("ship_month"),
        col("sum_qty"), col("sum_base"), col("n_rows"))
  }

  /** A3 (billing_calculation_service.py:96-106): global min/max of the date
    * column that drives the day-loop in the reference. */
  val q03MinMax = QueryDef(
    "q03_minmax_day",
    """SELECT cast(min(o_orderdate) AS DATE) AS min_day,
      |       cast(max(o_orderdate) AS DATE) AS max_day,
      |       count(*) AS n_rows
      |FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .agg(
        min(col("o_orderdate")).cast("date").as("min_day"),
        max(col("o_orderdate")).cast("date").as("max_day"),
        count(lit(1)).as("n_rows"))
  }

  /** A4 (billing_calculation_service.py:139-155): SELECT DISTINCT key. */
  val q04Distinct = QueryDef(
    "q04_distinct_accounts",
    "SELECT DISTINCT l_suppkey FROM lineitem") { (s, d) =>
    Tables.lineitem(s, d).select("l_suppkey").distinct()
  }

  /** P1/P2/P4: projection + equality predicate — both push to the parquet
    * scan (PushedFilters + ReadSchema in .explain). */
  val q05Filter = QueryDef(
    "q05_filter_eq",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |       floor((l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS price
      |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 30)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        r4(col("l_extendedprice")).as("price"))
  }

  /** P3 (billing_calculation_service.py:147-148): half-open date-range
    * predicate, the reference's usage_day window shape. */
  val q06Range = QueryDef(
    "q06_range_day",
    """SELECT o_orderkey, o_custkey, floor((o_totalprice) * 10000.0 + 0.5) / 10000.0 AS total
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(
        col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), r4(col("o_totalprice")).as("total"))
  }

  /** P6 (calculate/sql_template.py:106-110): IN-list membership + agg. */
  val q07In = QueryDef(
    "q07_in_members",
    """SELECT l_suppkey, count(*) AS n_rows, floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sum_qty
      |FROM lineitem WHERE l_suppkey IN (1, 3, 5, 7)
      |GROUP BY l_suppkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_suppkey").isin(1, 3, 5, 7))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_rows"), r4(sum("l_quantity")).as("sum_qty"))
  }

  /** Broadcast-join shape (J1-family building block): fact × small dim.
    * The dim side is tiny ⇒ `broadcast()` keeps the fact un-shuffled. */
  val q08Join = QueryDef(
    "q08_join_dim",
    """SELECT n.n_name AS nation, count(*) AS n_cust,
      |       floor((sum(c.c_acctbal)) * 10000.0 + 0.5) / 10000.0 AS sum_bal
      |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .groupBy(n("n_name").as("nation"))
      .agg(count(lit(1)).as("n_cust"), r4(sum(c("c_acctbal"))).as("sum_bal"))
  }

  /** Left-semi join (P8: the reference's manual dim-pruning `isin`). */
  val q09SemiJoin = QueryDef(
    "q09_semi_join",
    """SELECT count(*) AS n_rows, floor((sum(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS sum_total
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM customer c
      |              WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_rows"), r4(sum("o_totalprice")).as("sum_total"))
  }

  /** Set op (S5-style union of two slices, then re-aggregate). */
  val q10Union = QueryDef(
    "q10_union",
    """SELECT l_returnflag, count(*) AS n_rows FROM (
      |  SELECT l_returnflag FROM lineitem WHERE l_quantity < 5
      |  UNION ALL
      |  SELECT l_returnflag FROM lineitem WHERE l_quantity > 45
      |) GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    li.filter(col("l_quantity") < 5).select("l_returnflag")
      .unionAll(li.filter(col("l_quantity") > 45).select("l_returnflag"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
  }

  /** Deterministic LIMIT (README.md:44 usage shape, made order-stable). */
  val q11Limit = QueryDef(
    "q11_limit",
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 3") { (s, d) =>
    Tables.region(s, d).orderBy("r_regionkey").limit(3)
  }

  /** F8 (main.py:34-36): 'YYYYMM' ↔ 'YYYY-MM' month-format surgery. */
  val q12MonthFmt = QueryDef(
    "q12_month_fmt",
    """SELECT DISTINCT strftime(l_shipdate, '%Y%m') AS invoice_month,
      |       strftime(l_shipdate, '%Y-%m')        AS dim_month
      |FROM lineitem""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(
        date_format(col("l_shipdate"), "yyyyMM").as("invoice_month"),
        date_format(col("l_shipdate"), "yyyy-MM").as("dim_month"))
      .distinct()
  }

  /** Time-bucketed aggregation over the events table (tumbling day window —
    * the batch twin of the Structured Streaming windowed agg). */
  val q13EventsWindow = QueryDef(
    "q13_events_window",
    """SELECT cast(date_trunc('day', ts) AS DATE) AS day, event_type,
      |       count(*) AS n_events, floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(
        date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), r4(sum("value")).as("sum_value"))
  }

  /** Window function: top-1 order per customer by price (engine extension —
    * the reference has none; ranking is table stakes for an analytics lib). */
  val q14TopPerKey = QueryDef(
    "q14_top_per_key",
    """SELECT o_custkey, o_orderkey, floor((o_totalprice) * 10000.0 + 0.5) / 10000.0 AS total FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn = 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), r4(col("o_totalprice")).as("total"))
  }

  /** Gap-based sessionization (engine extension): a new session starts when
    * a user is idle > 1 hour. lag → boundary flags → running sum = session
    * id → per-session aggregates. Micros-epoch arithmetic on both sides
    * (identical integer truncation from the nanos source). */
  val q15Sessionize = QueryDef(
    "q15_sessionize",
    """WITH lagged AS (
      |  SELECT user_id, value, event_id, epoch_us(ts) AS us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, value, event_id, us,
      |         CASE WHEN prev_us IS NULL OR us - prev_us > 3600000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM lagged),
      |sess AS (
      |  SELECT user_id, value, us,
      |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value,
      |       min(us) AS first_us, max(us) AS last_us
      |FROM sess GROUP BY user_id, session_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"), col("event_id"))
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    ev
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 3600000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(
          Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        r4(sum("value")).as("sum_value"),
        min(col("us")).as("first_us"),
        max(col("us")).as("last_us"))
  }

  /** Exact interpolated quantiles per group (engine extension — Spark
    * `percentile` and DuckDB `quantile_cont` share the linear-interpolation
    * definition; interpolation ulp absorbed by stable rounding). */
  val q16Quantiles = QueryDef(
    "q16_quantiles",
    """SELECT l_returnflag,
      |  floor((quantile_cont(l_extendedprice, 0.5)) * 10000.0 + 0.5) / 10000.0  AS median_price,
      |  floor((quantile_cont(l_extendedprice, 0.95)) * 10000.0 + 0.5) / 10000.0 AS p95_price,
      |  floor((quantile_cont(l_quantity, 0.5)) * 10000.0 + 0.5) / 10000.0       AS median_qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    // both price percentiles from ONE buffer (optimization round 17):
    // `percentile(c, array(...))` evaluates every fraction against the
    // same per-group value histogram a single-fraction call builds, so two
    // separate aggregates were buffering (and shuffling) l_extendedprice
    // twice for bit-identical results — guide §2.3, shuffle fewer bytes
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.95))").as("pp"),
        r4(expr("percentile(l_quantity, 0.5)")).as("median_qty"))
      .select(col("l_returnflag"),
        r4(element_at(col("pp"), 1)).as("median_price"),
        r4(element_at(col("pp"), 2)).as("p95_price"),
        col("median_qty"))
  }

  /** q19's raw frame: exact AND sketch quantiles side by side, unrounded —
    * shared by the declared query (which folds the sketch into error-bound
    * flags) and QuantilesSketchSpec (which pins the sketch values tighter).
    * One aggregate computes both, so the sketch is exercised on the exact
    * same grouped stream it would see alone. */
  private[queries] def quantileSketchRaw(
      s: org.apache.spark.sql.SparkSession, d: String) =
    // the two price fractions share one exact buffer and one sketch
    // (optimization round 17, same move as q16): `percentile`/
    // `approx_percentile` with an array of fractions query the identical
    // histogram/sketch a single-fraction call builds — half the
    // l_extendedprice buffer bytes through the exchange, same values
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.5, 0.95))").as("ex_price"),
        expr("percentile(l_quantity, 0.5)").as("ex_median_qty"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").as("ap_price"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").cast("double").as("ap_median_qty"))
      .select(col("l_returnflag"),
        element_at(col("ex_price"), 1).as("ex_median_price"),
        element_at(col("ex_price"), 2).as("ex_p95_price"),
        col("ex_median_qty"),
        element_at(col("ap_price"), 1).cast("double").as("ap_median_price"),
        element_at(col("ap_price"), 2).cast("double").as("ap_p95_price"),
        col("ap_median_qty"))

  /** q19 — the 100 TB companion to q16: `approx_percentile` is a one-pass
    * MERGEABLE fixed-size sketch (map-side partials combine), where exact
    * `percentile` buffers every group value on one reducer — at scale the
    * sketch is the only viable production shape (call `approx_percentile`
    * alone there). A foreign engine's sketch can never hash-match Spark's
    * (DuckDB uses t-digest), so the DECLARED result is the error-bound
    * statement both engines CAN agree on: the rounded exact quantiles plus
    * a per-column flag that the sketch landed within its documented bound
    * (1% relative + 1.0 absolute — accuracy=10000 keeps rank error at
    * n/10000, far inside). The oracle computes the identical exact side
    * and literal-true flags, so a sketch drifting out of bound flips a
    * flag and fails the hash. QuantilesSketchSpec pins the sketch values
    * tighter (2%) on the raw frame. */
  val q19QuantilesApprox = QueryDef(
    "q19_quantiles_approx",
    """SELECT l_returnflag,
      |  floor((quantile_cont(l_extendedprice, 0.5)) * 10000.0 + 0.5) / 10000.0  AS median_price,
      |  floor((quantile_cont(l_extendedprice, 0.95)) * 10000.0 + 0.5) / 10000.0 AS p95_price,
      |  floor((quantile_cont(l_quantity, 0.5)) * 10000.0 + 0.5) / 10000.0       AS median_qty,
      |  CAST(1 AS BIGINT) AS median_price_in_bound,
      |  CAST(1 AS BIGINT) AS p95_price_in_bound,
      |  CAST(1 AS BIGINT) AS median_qty_in_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    def inBound(c: String) =
      (abs(col(s"ap_$c") - col(s"ex_$c")) <= abs(col(s"ex_$c")) * 0.01 + 1.0)
        .cast("long").as(s"${c}_in_bound")
    quantileSketchRaw(s, d).select(
      col("l_returnflag"),
      r4(col("ex_median_price")).as("median_price"),
      r4(col("ex_p95_price")).as("p95_price"),
      r4(col("ex_median_qty")).as("median_qty"),
      inBound("median_price"), inBound("p95_price"), inBound("median_qty"))
  }

  /** Salted two-phase aggregation (hot-key skew tooling, SURVEY §4): group
    * on (key + salt) then merge — a hot user's rows spread over 8 reducers
    * instead of one. Semantically identical to the direct groupBy, which is
    * exactly what the oracle pins (the extra association level lands on the
    * same 4-decimal rounding both sides). */
  val q17SaltedAgg = QueryDef(
    "q17_salted_agg",
    """SELECT user_id,
      |  floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
      |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
    graft.pipeline.Skew.saltedSum(
      Tables.events(s, d).select(col("user_id"), col("value")),
      keys = Seq("user_id"), salt = 8, sumCols = Seq("value"))
      .select(col("user_id"), r4(col("value")).as("sum_value"))
  }

  /** q37 — [[graft.pipeline.Skew.saltedJoin]] as a declared, oracle-checked
    * operator (q17 covers saltedSum; this covers the join half of the skew
    * toolkit). The fixture is GENUINELY skewed: ~90% of events collapse
    * onto one hot key, the shape where a plain shuffle join serializes the
    * hot key's rows through a single reducer. The right side (per-key
    * stats) carries a merge-join hint so it is non-broadcastable by
    * construction — exactly the regime salting exists for (a broadcastable
    * right side never needs it) — and the salted plan spreads the hot key
    * over 8 reducers via the (key, salt) shuffle. The oracle is the PLAIN
    * join: salting must be invisible in the result. PlanSpec pins the
    * salted shuffle; SkewSpec pins the actual hot-key spread. */
  val q37SaltedJoin = QueryDef(
    "q37_salted_join",
    s"""WITH l AS (
       |  SELECT event_id,
       |         CASE WHEN event_id % 10 < 9 THEN 7 ELSE user_id % 50 END AS skew_key,
       |         value
       |  FROM events),
       |r AS (
       |  SELECT user_id % 50 AS skew_key, count(*) AS key_n,
       |         ${Stable.sqlR4("sum(value)")} AS key_sum
       |  FROM events GROUP BY user_id % 50)
       |SELECT l.event_id, l.skew_key, ${Stable.sqlR4("l.value")} AS value,
       |       r.key_n, r.key_sum
       |FROM l JOIN r USING (skew_key)""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val left = ev.select(
      col("event_id"),
      when(col("event_id") % 10 < 9, lit(7L))
        .otherwise(col("user_id") % 50).as("skew_key"),
      col("value"))
    val right = ev
      .groupBy((col("user_id") % 50).as("skew_key"))
      .agg(count(lit(1)).as("key_n"), r4(sum("value")).as("key_sum"))
      .hint("merge") // non-broadcastable right side: the salting regime
    graft.pipeline.Skew.saltedJoin(left, right, keys = Seq("skew_key"), salt = 8)
      .select(col("event_id"), col("skew_key"), r4(col("value")).as("value"),
        col("key_n"), col("key_sum"))
  }

  /** Semi-structured payload extraction (the `props` JSON column): parse →
    * typed field → aggregate. Spark's `get_json_object` is a codegen'd
    * per-row scalar (path evaluated against each string, no UDF); at scale
    * the parse cost is the map side of the one aggregation shuffle. */
  val q18JsonExtract = QueryDef(
    "q18_json_extract",
    s"""SELECT event_type,
       |  count(*) AS n_events,
       |  ${Stable.sqlSumBig("CAST(json_extract(props, '$.k') AS BIGINT)")} AS sum_k,
       |  ${Stable.sqlR4("avg(CAST(json_extract(props, '$.k') AS BIGINT))")} AS avg_k
       |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(k).as("sum_k"),
        r4(avg(k)).as("avg_k"))
  }

  /** Multi-level aggregation in one pass (ROLLUP): per (returnflag,
    * linestatus), per returnflag, and the grand total. Spark expands the
    * rollup into an Expand node feeding ONE hash aggregate — one shuffle
    * for all three levels, vs three scans + three shuffles hand-unioned.
    * `grouping_id` (standard SQL bitmask, identical in DuckDB) disambiguates
    * a rolled-up NULL from NULL-as-data. The measure is integral quantity
    * summed as BIGINT, so every level — including the grand total over the
    * whole table — is exact, not float-association-order-dependent. */
  val q27Rollup = QueryDef(
    "q27_rollup",
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
       |  count(*) AS n_rows,
       |  ${Stable.sqlSumBig("CAST(l_quantity AS BIGINT)")} AS sum_qty
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("long").as("lvl"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
  }

  /** q52 — full CUBE over three dimensions (q27's rollup walks ONE
    * hierarchy; the cube materializes the whole 2³ aggregation lattice in
    * one pass — the OLAP mart build behind slice-and-dice dashboards).
    * Catalyst plans it as a single scan + one Expand (8 replicas tagged
    * by grouping set) + ONE shuffle on the expanded keys; output is
    * bounded by the product of dimension cardinalities, independent of
    * fact rows. `grouping_id` (the standard bitmask, identical in DuckDB,
    * q27's convention) separates rolled-up NULLs from NULL data; the
    * measure is integral, so every lattice cell is exact. */
  val q52Cube = QueryDef(
    "q52_cube",
    s"""SELECT l_returnflag, l_linestatus,
       |  strftime(l_shipdate, '%Y-%m') AS ship_month,
       |  CAST(grouping_id(l_returnflag, l_linestatus,
       |                   strftime(l_shipdate, '%Y-%m')) AS BIGINT) AS lvl,
       |  count(*) AS n_rows,
       |  ${Stable.sqlSumBig("CAST(l_quantity AS BIGINT)")} AS sum_qty
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus, strftime(l_shipdate, '%Y-%m'))""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .cube("l_returnflag", "l_linestatus", "ship_month")
      .agg(
        grouping_id().cast("long").as("lvl"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
  }

  /** q28 — top-10 hottest user_ids via the Misra-Gries sketch aggregator
    * ([[graft.functions.HeavyHitters]]). The sketch capacity (4096) exceeds
    * the distinct-user count at every test SF — sf0.1's events carry 1500
    * distinct users, so 512 would silently go approximate there and break
    * the exact oracle if the gate ever runs above sf0.01 — keeping the
    * sketch EXACT (hash-matches the plain groupBy-count oracle) while
    * staying bounded-memory mergeable: at 1e9 keys the shuffle carries
    * numPartitions × 4096 entries instead of every key. HeavyHittersSpec
    * pins the approximation bound when capacity < distinct.
    *
    * The top-10 is read off the sketch by sorting its ≤capacity entries
    * with `array_sort` + `slice` — a pure projection over one row. A
    * global `Window.orderBy` here would be semantically fine (the input is
    * the bounded exploded sketch) but spams `WARN WindowExec: No Partition
    * Defined` on every run, training readers to ignore the one warning
    * that elsewhere flags a genuine serialize-everything hazard. */
  val q28HeavyHitters = QueryDef(
    "q28_heavy_hitters",
    """SELECT user_id, cnt FROM (
      |  SELECT user_id, count(*) AS cnt,
      |         row_number() OVER (ORDER BY count(*) DESC, user_id) AS rn
      |  FROM events GROUP BY user_id) WHERE rn <= 10""".stripMargin) { (s, d) =>
    val sketch = udaf(new graft.functions.HeavyHitters(4096))
    // comparator: count desc, then user_id asc — same tie-break as the
    // oracle's ORDER BY count(*) DESC, user_id
    val byCountDesc = (l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =>
      when(l.getField("value") > r.getField("value"), -1)
        .when(l.getField("value") < r.getField("value"), 1)
        .when(l.getField("key") < r.getField("key"), -1)
        .when(l.getField("key") > r.getField("key"), 1)
        .otherwise(0)
    Tables.events(s, d)
      .agg(sketch(col("user_id")).as("hh"))
      .select(explode(slice(array_sort(map_entries(col("hh")), byCountDesc),
        1, 10)).as("e"))
      .select(col("e.key").as("user_id"), col("e.value").as("cnt"))
  }

  /** q29 — time-based moving aggregates: per user, the count and sum of
    * their events in the trailing 6 hours at each event — a RANGE frame
    * (value-based bounds over micros), not a ROWS frame: the window spans
    * however many rows fall inside the time interval. One shuffle keyed by
    * user; the frame scan is linear per partition (Spark keeps a sliding
    * frame, not a re-scan per row). Micros arithmetic on both sides. */
  val q29MovingAgg = QueryDef(
    "q29_moving_agg",
    s"""SELECT user_id, event_id, us,
       |  count(*) OVER w AS n_6h,
       |  ${Stable.sqlR4("sum(value) OVER w")} AS sum_6h
       |FROM (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
       |WINDOW w AS (PARTITION BY user_id ORDER BY us
       |             RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-21600000000L, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .select(col("user_id"), col("event_id"), col("us"),
        count(lit(1)).over(w).as("n_6h"),
        r4(sum("value").over(w)).as("sum_6h"))
  }

  /** q30's raw frame: exact count_distinct and the HLL++ estimate side by
    * side — shared by the declared query (error-bound flag) and
    * QuantilesSketchSpec (tighter 2% pin). */
  private[queries] def distinctSketchRaw(
      s: org.apache.spark.sql.SparkSession, d: String) =
    // DEDUP FIRST, sketch second (optimization round 17): the single-agg
    // form made the distinct rewrite evaluate the HLL partial at the
    // (type, user) grain — one 2^14-register sketch PER DISTINCT PAIR
    // (flattened to ~1,640 buffer columns per row) — before merging them
    // per type. HLL insertion is idempotent, so building the sketch over
    // the already-distinct pairs gives BIT-IDENTICAL registers (hence the
    // identical estimate) with |types| sketches instead of |pairs|; the
    // exact count is the deduped rows per type. Same two exchanges
    // (PlanSpec-pinned ≤2), same values, a fraction of the aggregate
    // state. (A widen-before-aggregate was also tried and REVERTED: it
    // fused three 1,640-column HashAggregates into one stage and
    // measured 3× SLOWER.)
    Tables.events(s, d)
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_users_exact"),
        approx_count_distinct(col("user_id"), rsd = 0.01).as("n_users_approx"))

  /** q30 — approximate distinct count (HyperLogLog++): distinct users per
    * event_type as a fixed-size mergeable sketch. Completes the sketch trio
    * (q19 percentile, q28 top-k): exact count_distinct shuffles every
    * (type, user) pair; the HLL register array is KBs per group regardless
    * of cardinality — at 100 TB call `approx_count_distinct` alone.
    * DuckDB's HLL can never hash-match Spark's, so (like q19) the DECLARED
    * result is the cross-engine-checkable error-bound statement: the exact
    * count plus a flag that the estimate landed within 5× its configured
    * rsd (0.01). The oracle computes the identical exact count and a
    * literal-true flag — an estimate drifting past 5% flips the flag and
    * fails the hash. QuantilesSketchSpec pins the estimate tighter (2%)
    * on the raw frame. */
  val q30DistinctApprox = QueryDef(
    "q30_distinct_approx",
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_users_exact,
      |  CAST(1 AS BIGINT) AS approx_in_bound
      |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    distinctSketchRaw(s, d).select(
      col("event_type"),
      col("n_users_exact"),
      (abs(col("n_users_approx") - col("n_users_exact"))
        <= col("n_users_exact").cast("double") * 0.05)
        .cast("long").as("approx_in_bound"))
  }

  private val UnpivotMeasures = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** q31 — UNPIVOT (melt): the four lineitem measures to long form
    * (measure, val) — the inverse of q20's pivot, and the shape feature
    * stores/metric pipelines want wide fact tables in. Spark's native
    * `unpivot` plans as an Expand (one scan, rows × measures output, no
    * shuffle); the oracle melts by the portable UNION ALL formulation —
    * an independent shape, so the Expand path is cross-checked. */
  val q31Unpivot = QueryDef(
    "q31_unpivot",
    UnpivotMeasures.map(m =>
      s"""SELECT l_orderkey, l_linenumber, '$m' AS measure,
         |  ${Stable.sqlR4(m)} AS val FROM lineitem""".stripMargin)
      .mkString("\nUNION ALL\n")) { (s, d) =>
    Tables.lineitem(s, d)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        UnpivotMeasures.map(col).toArray,
        "measure", "val")
      .select(col("l_orderkey"), col("l_linenumber"), col("measure"),
        r4(col("val")).as("val"))
  }

  /** q32 — event-sequence assembly: each user's event ids in time order as
    * one row (the behavioral-sequence shape session-mining and training-
    * data pipelines build). `collect_list` has NO deterministic order under
    * parallel merge, so the sort key rides INSIDE the collected struct and
    * `array_sort` imposes the order after collection — partition-layout-
    * independent. Joined to a string (ids are integral, so the rendering
    * is engine-stable — never do this with floats). One shuffle keyed by
    * user; per-group state is the user's own events. */
  val q32EventSequence = QueryDef(
    "q32_event_sequence",
    """SELECT user_id,
      |  count(*) AS n_events,
      |  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY epoch_us(ts), event_id)
      |    AS id_sequence
      |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("us"), col("event_id")))),
            e => e.getField("event_id").cast("string")),
          ",").as("id_sequence"))
  }

  /** q34 — INTERSECT / EXCEPT (q10 covers UNION): cohort membership
    * algebra — users who both clicked and purchased, vs clicked only.
    * Spark plans both as aggregate-free left-semi / left-anti joins over
    * the distinct sets — one shuffle per side, no row explosion. */
  val q34SetOps = QueryDef(
    "q34_set_ops",
    """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT user_id, 'both' AS rel FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
      |UNION ALL
      |SELECT user_id, 'click_only' AS rel FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p)""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    def ids(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id")).distinct()
    val c = ids("click")
    val p = ids("purchase")
    c.intersect(p).withColumn("rel", lit("both"))
      .unionAll(c.except(p).withColumn("rel", lit("click_only")))
  }

  /** q35 — correlated-subquery semantics: orders strictly above their own
    * customer's average price. The oracle states it AS a correlated scalar
    * subquery; the Spark side uses the decorrelated form Catalyst itself
    * would rewrite to — an unpartitioned-safe window average per customer
    * and a row-local comparison (one shuffle keyed by customer, no
    * re-aggregation join). The comparison itself runs on r4-ROUNDED values
    * on both sides: the per-customer average is a double sum whose
    * association order differs between Spark's partial aggregation and
    * DuckDB's fold, so a price sitting epsilon from its group average could
    * flip inclusion between engines if compared raw — the same
    * oracle-stability convention every other query applies to its OUTPUT,
    * applied here to the predicate too. */
  val q35AboveAvg = QueryDef(
    "q35_above_avg",
    s"""SELECT o_orderkey, o_custkey, ${Stable.sqlR4("o_totalprice")} AS total
       |FROM orders o
       |WHERE ${Stable.sqlR4("o_totalprice")} >
       |      (SELECT ${Stable.sqlR4("avg(o_totalprice)")} FROM orders i
       |       WHERE i.o_custkey = o.o_custkey)""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
    Tables.orders(s, d)
      .withColumn("cavg", avg("o_totalprice").over(w))
      .filter(r4(col("o_totalprice")) > r4(col("cavg")))
      .select(col("o_orderkey"), col("o_custkey"),
        r4(col("o_totalprice")).as("total"))
  }

  /** q42 — cohort retention (engine extension): users cohorted by the WEEK
    * of their first activity; each cell counts the distinct users of a
    * cohort active `week_offset` weeks later — the classic triangular
    * retention matrix every behavioral-analytics store ships. All
    * arithmetic is int64 epoch-microsecond division (no doubles anywhere),
    * so the cross-engine hash is exact by construction.
    *
    * 100 TB shape: the per-user first-activity timestamp is an
    * unpartitioned-safe window min over ONE shuffle keyed by user; the
    * (cohort, offset, user) distinct then reuses that clustering for its
    * partial phase (user_id ⊆ the grouping key set), and the final
    * (cohort, offset) count aggregates the already-deduplicated rows —
    * bounded by |users|·|weeks|, not |events|. */
  val q42CohortRetention = QueryDef(
    "q42_cohort_retention",
    """WITH a AS (
      |  SELECT user_id,
      |         epoch_us(ts) // 86400000000 AS day,
      |         min(epoch_us(ts)) OVER (PARTITION BY user_id) // 86400000000 AS cohort_day
      |  FROM events),
      |cell AS (
      |  SELECT DISTINCT cohort_day // 7 AS cohort_week,
      |         (day - cohort_day) // 7 AS week_offset, user_id
      |  FROM a)
      |SELECT cohort_week, week_offset, count(*) AS n_users
      |FROM cell GROUP BY cohort_week, week_offset""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val DayUs = 86400000000L
    val byUser = Window.partitionBy("user_id")
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("day", expr(s"us DIV $DayUs"))
      .withColumn("cohort_day", expr(s"min(us) OVER (PARTITION BY user_id) DIV $DayUs"))
      .select(
        expr("cohort_day DIV 7").as("cohort_week"),
        expr("(day - cohort_day) DIV 7").as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** q43 — strict-order funnel (engine extension): how many users performed
    * view → click → purchase IN THAT ORDER (a later stage only counts when
    * a qualifying earlier stage strictly precedes it). Ordering-sensitive
    * semantics that a plain conditional-min aggregation gets wrong (it
    * would accept a click before the first view); instead each event sees
    * the stage state strictly before it via a frame-bounded window min —
    * `ROWS … AND 1 PRECEDING` over (us, event_id) — so "click after a
    * view" and "purchase after such a click" are row-local predicates.
    *
    * Both window passes share one (user) partitioning and one (us,
    * event_id) sort — a single shuffle, two Window operators, then a
    * per-user max-flag rollup (int64 only → exact hash).
    *
    * 100 TB shape: state per user is its own event list (the same bound as
    * any per-user window); the final aggregate is 4 counters. */
  val q43Funnel = QueryDef(
    "q43_funnel",
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
      |w1 AS (
      |  SELECT user_id, event_type, us, event_id,
      |         min(CASE WHEN event_type = 'view' THEN us END) OVER (
      |           PARTITION BY user_id ORDER BY us, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_before
      |  FROM e),
      |w2 AS (
      |  SELECT user_id, event_type, us, event_id,
      |         CASE WHEN event_type = 'click' AND view_before IS NOT NULL
      |              THEN us END AS qclick_us
      |  FROM w1),
      |w3 AS (
      |  SELECT user_id, event_type, qclick_us,
      |         min(qclick_us) OVER (
      |           PARTITION BY user_id ORDER BY us, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS qclick_before
      |  FROM w2),
      |per_user AS (
      |  SELECT user_id,
      |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
      |         max(CASE WHEN qclick_us IS NOT NULL THEN 1 ELSE 0 END) AS s2,
      |         max(CASE WHEN event_type = 'purchase' AND qclick_before IS NOT NULL
      |                  THEN 1 ELSE 0 END) AS s3
      |  FROM w3 GROUP BY user_id)
      |SELECT count(*) AS n_users,
      |       CAST(sum(s1) AS BIGINT) AS n_view,
      |       CAST(sum(s2) AS BIGINT) AS n_view_click,
      |       CAST(sum(s3) AS BIGINT) AS n_full_funnel
      |FROM per_user""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ordered = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val strictlyBefore = ordered.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("view_before",
        min(when(col("event_type") === "view", col("us"))).over(strictlyBefore))
      .withColumn("qclick_us",
        when(col("event_type") === "click" && col("view_before").isNotNull, col("us")))
      .withColumn("qclick_before", min(col("qclick_us")).over(strictlyBefore))
      .groupBy("user_id")
      .agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("s1"),
        max(when(col("qclick_us").isNotNull, 1).otherwise(0)).as("s2"),
        max(when(col("event_type") === "purchase" && col("qclick_before").isNotNull, 1)
          .otherwise(0)).as("s3"))
      .agg(
        count(lit(1)).as("n_users"),
        sum("s1").cast("long").as("n_view"),
        sum("s2").cast("long").as("n_view_click"),
        sum("s3").cast("long").as("n_full_funnel"))
  }

  /** q45 — event-transition matrix (engine extension): Markov transition
    * counts and row-normalized probabilities over each user's time-ordered
    * event stream — the sequence-mining summary behavioral models train
    * on (q32 assembles the raw sequences; this is their first-order
    * statistic). `lead` over the same (us, event_id) ordering every
    * behavioral query uses; the probability is each count's share of its
    * from-state row, r4-rounded (the ONLY double in the query — counts
    * are exact int64).
    *
    * 100 TB shape: one shuffle keyed by user for the lead window; the
    * pair aggregation is bounded by |event types|² (25 here) regardless
    * of event volume, and the per-from-state share is a window over that
    * tiny aggregate. */
  val q45TransitionMatrix = QueryDef(
    "q45_transition_matrix",
    s"""WITH seq AS (
       |  SELECT user_id, event_type AS from_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY epoch_us(ts), event_id) AS to_type
       |  FROM events),
       |pairs AS (
       |  SELECT from_type, to_type, count(*) AS n
       |  FROM seq WHERE to_type IS NOT NULL
       |  GROUP BY from_type, to_type)
       |SELECT from_type, to_type, n,
       |       ${Stable.sqlR4("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)")} AS p
       |FROM pairs""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("from_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("to_type", lead(col("from_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        r4(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("from_type"))))
  }

  /** q49 — SCD2 effective-dated history (engine extension): collapse each
    * customer's order-status observations into type-2 slowly-changing-
    * dimension rows — contiguous runs of one status become one
    * `[effective_from, effective_to)` version, `effective_to` NULL on the
    * open current version. The classic gaps-and-islands build every
    * warehouse runs to historize a mutable dimension: `lag` change
    * detection → running-sum version numbering → per-run collapse →
    * `lead` to close each interval. Dates and counts only — the
    * cross-engine hash is exact by construction.
    *
    * 100 TB shape: ONE shuffle keyed by customer serves all three window
    * passes AND the collapse — the run aggregation groups on
    * (customer, version), a SUPERSET of the hash keys, so the existing
    * clustering satisfies it (q41's subset rule), and the closing `lead`
    * re-uses it again. Output is bounded by status changes, not
    * observations. */
  val q49Scd2History = QueryDef(
    "q49_scd2_history",
    """WITH obs AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
      |         lag(o_orderstatus) OVER (PARTITION BY o_custkey
      |                                  ORDER BY o_orderdate, o_orderkey) AS prev_status
      |  FROM orders),
      |runs AS (
      |  SELECT o_custkey, o_orderdate, o_orderstatus,
      |         CAST(sum(CASE WHEN prev_status IS NULL
      |                         OR prev_status <> o_orderstatus THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      |  FROM obs),
      |hist AS (
      |  SELECT o_custkey, version, min(o_orderstatus) AS status,
      |         min(o_orderdate) AS effective_from,
      |         max(o_orderdate) AS last_observed,
      |         count(*) AS n_obs
      |  FROM runs GROUP BY o_custkey, version)
      |SELECT o_custkey, version, status, effective_from,
      |       lead(effective_from) OVER (PARTITION BY o_custkey
      |                                  ORDER BY version) AS effective_to,
      |       last_observed, n_obs
      |FROM hist""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val prev = lag(col("o_orderstatus"), 1).over(byKey)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_orderstatus"))
      .withColumn("chg", when(prev.isNull || prev =!= col("o_orderstatus"), 1).otherwise(0))
      .withColumn("version",
        sum(col("chg")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy("o_custkey", "version")
      .agg(
        min("o_orderstatus").as("status"),
        min("o_orderdate").as("effective_from"),
        max("o_orderdate").as("last_observed"),
        count(lit(1)).as("n_obs"))
      .withColumn("effective_to",
        lead(col("effective_from"), 1)
          .over(Window.partitionBy("o_custkey").orderBy("version")))
      .select(col("o_custkey"), col("version"), col("status"), col("effective_from"),
        col("effective_to"), col("last_observed"), col("n_obs"))
  }

  /** q19s — q19's SKETCH-ONLY shape: `approx_percentile` alone, the literal
    * production call at 100 TB (q19's declared twin adds the exact side for
    * the cross-engine error-bound oracle; ADVICE r7 asked that the scalable
    * shape itself stay executed and timed). Bench-only: a foreign engine
    * cannot hash-match Spark's sketch, so there is no oracle — the values
    * are spec-pinned instead (QuantilesSketchSpec, 2%) and the
    * single-aggregation plan is PlanSpec-pinned. */
  val q19sQuantilesSketchOnly: QueryDef =
    QueryDef.noOracle("q19s_quantiles_sketch_only") { (s, d) =>
      // both price fractions from ONE sketch (optimization round 17, the
      // q16/q19 move): identical estimates, half the price-sketch bytes
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").as("pp"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").cast("double").as("median_qty"))
        .select(col("l_returnflag"),
          element_at(col("pp"), 1).cast("double").as("median_price"),
          element_at(col("pp"), 2).cast("double").as("p95_price"),
          col("median_qty"))
    }

  /** q30s — q30's SKETCH-ONLY shape: `approx_count_distinct` alone (HLL++
    * registers, KBs per group, no (type, user) shuffle) — the 100 TB
    * production call, kept executed/timed like q19s. Bench-only, spec- and
    * PlanSpec-pinned. */
  val q30sDistinctSketchOnly: QueryDef =
    QueryDef.noOracle("q30s_distinct_sketch_only") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("n_users_approx"))
    }

  /** Bench-only registry (timed, never oracle-compared — see q19s/q30s). */
  val benchOnly: Seq[QueryDef] = Seq(q19sQuantilesSketchOnly, q30sDistinctSketchOnly)

  val all: Seq[QueryDef] = Seq(
    q01AggGrain, q02AggWide, q03MinMax, q04Distinct, q05Filter, q06Range,
    q07In, q08Join, q09SemiJoin, q10Union, q11Limit, q12MonthFmt,
    q13EventsWindow, q14TopPerKey, q15Sessionize, q16Quantiles, q17SaltedAgg,
    q18JsonExtract, q19QuantilesApprox, q27Rollup, q28HeavyHitters,
    q29MovingAgg, q30DistinctApprox, q31Unpivot, q32EventSequence, q34SetOps,
    q35AboveAvg, q37SaltedJoin, q42CohortRetention, q43Funnel,
    q45TransitionMatrix, q49Scd2History, q52Cube)
}
