package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.kernel.SparkSpec

/** Semantics pins for the maintenance operators (q53/q54/q56) that the
  * sf0.01 oracle hash can't isolate: MERGE's four per-row outcomes need a
  * fixture hitting each mod-class exactly once, the spine fill needs a
  * crafted gap, and the MV merge needs a case where partial-merge and
  * full-recompute could plausibly diverge (rows past the delta window).
  */
class MaintenanceSpec extends SparkSpec {

  private def ordersFixture(rows: Seq[(Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_maint").toString
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_orderdate", lit("1995-01-01 00:00:00").cast("timestamp"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q53 MERGE: kept / updated / deleted / inserted, one key per outcome") {
    val d = ordersFixture(Seq(
      (1L, "O", 100.0), // untouched → kept
      (7L, "O", 100.0), // %7 → updated: price ×1.05, status X
      (13L, "O", 100.0), // %13 → deleted
      (11L, "O", 100.0))) // %11 → kept AND re-keyed insert (status N)
    val out = MaintenanceQueries.q53MergeApply.fn(spark, d).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2), r.getString(3))))
      .toMap
    assert(out(1L) == (("O", 100.0, "kept")))
    assert(out(7L) == (("X", 105.0, "updated")))
    assert(!out.contains(13L), "deleted key survived the merge")
    assert(out(11L) == (("O", 100.0, "kept")))
    assert(out(11L + 1000000000000L) == (("N", 100.0, "inserted")))
    assert(out.size == 4)
  }

  test("q53 MERGE overlap classes: op precedence (13 > 7 > 11) and the re-key agree") {
    // round-11 ADVICE: re-keying EVERY key%11 row orphaned the D/U ops of
    // overlap keys — 143 (11·13) survived as 'kept' with its delete never
    // applied, and 77 (7·11) emitted a phantom 'updated' row at key+1e12
    // while the real row stayed 'kept'. The re-key now fires only for
    // actual inserts, so the overlap keys mutate in place.
    val d = ordersFixture(Seq(
      (77L, "O", 100.0), // 7·11 → op U wins: updated IN PLACE, no phantom
      (143L, "O", 100.0), // 11·13 → op D wins: deleted, no survivor
      (91L, "O", 100.0), // 7·13 → op D wins (no re-key ever applied here)
      (1001L, "O", 100.0))) // 7·11·13 → op D wins
    val out = MaintenanceQueries.q53MergeApply.fn(spark, d).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2), r.getString(3))))
      .toMap
    assert(out(77L) == (("X", 105.0, "updated")), s"77 must update in place: $out")
    assert(!out.contains(77L + 1000000000000L), "phantom insert for 7·11 overlap key")
    assert(!out.contains(143L), "11·13 overlap key's delete did not apply")
    assert(!out.contains(143L + 1000000000000L), "phantom row for 11·13 overlap key")
    assert(!out.contains(91L) && !out.contains(1001L), "D-class overlap keys survived")
    assert(out.size == 1)
  }

  private def eventsFixture(rows: Seq[(Long, Long, Long, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_maint_ev").toString
    rows.toDF("event_id", "us", "user_id", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), lit("view").as("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q54 gap fill: missing days carry the last observed value, spine stays per-user") {
    val D = 86400000000L
    val d = eventsFixture(Seq(
      (1L, 0 * D, 1L, 1.0), // u1 day0
      (2L, 2 * D, 1L, 5.0), // u1 day2 — day1 is a gap
      (3L, 5 * D, 2L, 7.0))) // u2 single day — spine must NOT reach days 0–4
    val rows = MaintenanceQueries.q54GapFill.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
    assert(rows.toSeq == Seq(
      (1L, "1970-01-01", 1.0, false),
      (1L, "1970-01-02", 1.0, true), // the gap: filled with day0's value
      (1L, "1970-01-03", 5.0, false),
      (2L, "1970-01-06", 7.0, false)))
  }

  private def lineitemFixture(rows: Seq[(String, String, Double, Double, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_maint_li").toString
    rows.toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp")).drop("ship")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q56 incremental MV merge = full recompute; rows past the delta window excluded") {
    val d = lineitemFixture(Seq(
      ("A", "F", 1.0, 10.0, "1995-01-01 00:00:00"), // history (MV side)
      ("A", "F", 2.0, 20.0, "2001-07-01 00:00:00"), // delta window
      ("A", "F", 4.0, 40.0, "2001-10-01 00:00:00"), // past DeltaEnd — excluded
      ("B", "O", 8.0, 80.0, "2001-06-15 00:00:00"))) // delta-only grain
    val out = MaintenanceQueries.q56IncrementalAgg.fn(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // merged partials: history 1+delta 2 (the 4.0 row is beyond the window)
    assert(out(("A", "F")) == ((3.0, 30.0, 2L)))
    // a grain present only in the delta must still appear
    assert(out(("B", "O")) == ((8.0, 80.0, 1L)))
    assert(out.size == 2)
  }
}
