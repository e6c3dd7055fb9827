package graft.queries

import graft.kernel.SparkSpec

/** The sketch-accuracy value pins behind q19/q30. The DECLARED queries
  * fold the sketch into cross-engine-checkable error-bound flags (1%/5%,
  * hash-matched against the DuckDB oracle's exact side); THIS spec pins
  * the raw sketch values tighter (2%) against the exact aggregates, on
  * the shared raw frames the declared queries are built from. */
class QuantilesSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q19 approx quantiles track the exact values per group (raw frame)") {
    val rows = CoreQueries.quantileSketchRaw(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getString(0)
      val (em, ep, emq) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val (m, p95, mq) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      // accuracy=10000 bounds rank error at n/10000; the sketch also returns
      // an actual data value where exact `percentile` interpolates — both
      // effects stay well inside these tolerances unless the sketch breaks
      assert(math.abs(m - em) / em < 0.02, s"$k median: approx $m vs exact $em")
      assert(math.abs(p95 - ep) / ep < 0.02, s"$k p95: approx $p95 vs exact $ep")
      assert(math.abs(mq - emq) / emq < 0.1, s"$k qty median: approx $mq vs exact $emq")
    }
  }

  test("q19 declared flags are all in-bound (the hash the oracle checks)") {
    val df = CoreQueries.q19QuantilesApprox.fn(spark, sf)
    val flags = df.columns.filter(_.endsWith("_in_bound"))
    assert(flags.length == 3)
    df.collect().foreach { r =>
      flags.foreach(f => assert(r.getAs[Long](f) == 1L,
        s"${r.getString(0)}: $f is 0 — sketch drifted past the declared bound"))
    }
  }

  test("q30 HLL distinct-user estimates track the exact counts per event_type") {
    val rows = CoreQueries.distinctSketchRaw(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, e, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(math.abs(est - e).toDouble / e < 0.02,
        s"$k: approx $est vs exact $e (rsd=0.01 sketch drifted past 2%)")
    }
  }

  test("q30 declared flag is in-bound for every group") {
    CoreQueries.q30DistinctApprox.fn(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("approx_in_bound") == 1L,
        s"${r.getString(0)}: estimate drifted past 5%")
    }
  }

  test("the bench-only sketch-only entries (q19s/q30s) stay value-pinned at 2%") {
    // these carry no oracle (a foreign engine can't hash-match a sketch) —
    // THIS is their correctness pin, against the exact aggregates computed
    // independently (ADVICE r7: the scalable shape stays executed AND held
    // to a bound, not just timed)
    import org.apache.spark.sql.functions.{col, countDistinct, expr}
    val exactQ = graft.tables.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("em"),
        expr("percentile(l_extendedprice, 0.95)").as("ep"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    CoreQueries.q19sQuantilesSketchOnly.fn(spark, sf).collect().foreach { r =>
      val (em, ep) = exactQ(r.getString(0))
      assert(math.abs(r.getAs[Double]("median_price") - em) / em < 0.02)
      assert(math.abs(r.getAs[Double]("p95_price") - ep) / ep < 0.02)
    }
    val exactD = graft.tables.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    CoreQueries.q30sDistinctSketchOnly.fn(spark, sf).collect().foreach { r =>
      val e = exactD(r.getString(0))
      assert(math.abs(r.getAs[Long]("n_users_approx") - e).toDouble / e < 0.02)
    }
  }
}
