package graft.queries

import graft.kernel.SparkSpec

/** q19's correctness statement: the mergeable sketch tracks the exact
  * per-group quantiles. (No DuckDB oracle exists for q19 — engines use
  * different sketch algorithms — so the cross-engine gate is rows-only and
  * THIS spec carries the value check.) */
class QuantilesSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q19 approx quantiles track the exact q16 values per group") {
    def byFlag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag(CoreQueries.q16Quantiles.fn(spark, sf))
    val approx = byFlag(CoreQueries.q19QuantilesApprox.fn(spark, sf))
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (m, p95, mq)) =>
      val (em, ep, emq) = exact(k)
      // accuracy=10000 bounds rank error at n/10000; the sketch also returns
      // an actual data value where exact `percentile` interpolates — both
      // effects stay well inside these tolerances unless the sketch breaks
      assert(math.abs(m - em) / em < 0.02, s"$k median: approx $m vs exact $em")
      assert(math.abs(p95 - ep) / ep < 0.02, s"$k p95: approx $p95 vs exact $ep")
      assert(math.abs(mq - emq) / emq < 0.1, s"$k qty median: approx $mq vs exact $emq")
    }
  }

  test("q30 HLL distinct-user estimates track the exact counts per event_type") {
    import org.apache.spark.sql.functions._
    val exact = graft.tables.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = CoreQueries.q30DistinctApprox.fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, est) =>
      val e = exact(k)
      assert(math.abs(est - e).toDouble / e < 0.02,
        s"$k: approx $est vs exact $e (rsd=0.01 sketch drifted past 2%)")
    }
  }
}
