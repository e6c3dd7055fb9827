package graft.operators

import graft.kernel.SparkSpec
import org.apache.spark.sql.functions._

class ReconcileSpec extends SparkSpec {

  test("snapshotDiff classifies added/removed/changed and ignores unchanged") {
    import spark.implicits._
    val oldSnap = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"),
      (4L, Double.NaN, "d")).toDF("k", "v", "s")
    val newSnap = Seq((1L, 10.0, "a"), (2L, 21.0, "b"), (5L, 50.0, "e"),
      (4L, Double.NaN, "d")).toDF("k", "v", "s")
    val diff = Reconcile.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("v", "s"))
      .select("k", "status").as[(Long, String)].collect().toMap
    // 1 unchanged (dropped), 4 unchanged (NaN <=> NaN is true — null-safe
    // equality treats identical NaNs as equal, so a float NaN column
    // doesn't spuriously mark every row changed)
    assert(diff == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
  }

  test("an idempotent re-run reconciles to an EMPTY diff — the audit the sink promises") {
    val ev = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("value"), col("event_type"))
    assert(Reconcile.snapshotDiff(ev, ev, Seq("event_id"),
      Seq("value", "event_type")).count() == 0)
  }
}
