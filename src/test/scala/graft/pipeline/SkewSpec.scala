package graft.pipeline

import graft.kernel.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedSum equals plain groupBy sum (hot key spread over salts)") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").sum("v").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), salt = 8, sumCols = Seq("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6) }
  }

  test("saltedJoin equals plain join for inner and left") {
    import spark.implicits._
    val left = (1 to 500).map(i => (if (i % 5 == 0) "miss" + i else "HOT", i)).toDF("k", "lv")
    val right = Seq(("HOT", 1.0), ("other", 2.0)).toDF("k", "rv")
    Seq("inner", "left").foreach { jt =>
      val plain = left.join(right, Seq("k"), jt)
        .selectExpr("k", "lv", "rv").collect()
        .map(r => (r.getString(0), r.getInt(1), if (r.isNullAt(2)) null else r.getDouble(2)))
        .toSet
      val salted = Skew.saltedJoin(left, right, Seq("k"), salt = 4, joinType = jt)
        .selectExpr("k", "lv", "rv").collect()
        .map(r => (r.getString(0), r.getInt(1), if (r.isNullAt(2)) null else r.getDouble(2)))
        .toSet
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("q37 fixture: the hot key's rows actually spread across the salt space") {
    import org.apache.spark.sql.functions._
    import graft.tables.Tables
    // the q37 left side: ~90% of events collapse onto skew_key 7 — assert
    // the content salt scatters those rows over (nearly) all 8 reducers,
    // i.e. the declared query's skew relief is real, not just plan shape
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val left = ev.select(
      col("event_id"),
      when(col("event_id") % 10 < 9, lit(7L))
        .otherwise(col("user_id") % 50).as("skew_key"),
      col("value"))
    val hot = left.filter(col("skew_key") === 7L)
    assert(hot.count() > left.count() * 8 / 10, "fixture lost its skew")
    val spread = hot.select(Skew.contentSalt(left, 8).as("s"))
      .distinct().count()
    assert(spread >= 6, s"hot key only reached $spread of 8 salts")
  }

  test("saltedJoin collapseDuplicates preserves multiset semantics exactly") {
    import spark.implicits._
    // the shape the content salt can't spread: a hot key whose volume is
    // exact duplicate rows (all columns identical)
    val left = (Seq.fill(300)(("HOT", 1)) ++ Seq(("HOT", 2), ("miss", 3),
      ("miss", 3))).toDF("k", "lv")
    val right = Seq(("HOT", 1.0), ("other", 2.0)).toDF("k", "rv")
    Seq("inner", "left").foreach { jt =>
      def multiset(df: org.apache.spark.sql.DataFrame) =
        df.selectExpr("k", "lv", "rv").collect()
          .map(r => (r.getString(0), r.getInt(1),
            if (r.isNullAt(2)) null else r.getDouble(2)))
          .groupBy(identity).view.mapValues(_.size).toMap
      val plain = multiset(left.join(right, Seq("k"), jt))
      val salted = multiset(Skew.saltedJoin(left, right, Seq("k"), salt = 4,
        joinType = jt, collapseDuplicates = true))
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("AQE skew-join splits the q37 hot partition on a PLAIN join (when manual salting is unneeded)") {
    import org.apache.spark.sql.functions._
    import graft.tables.Tables
    // Skew.scala's header claims "AQE's skew-join handles most cases at
    // runtime" — execute that claim on the q37 fixture and pin its exact
    // BOUNDARY. OptimizeSkewedJoin splits a hot reducer partition only
    // when BOTH join children are Sort-over-ShuffleQueryStage: splitting
    // the left partition requires REPLICATING the right's matching
    // partition, which needs direct access to the right shuffle. Two
    // consequences, both asserted here by construction:
    //  - q37's literal shape (right side aggregated in the same query —
    //    Sort > HashAggregate > shuffle) is NOT AQE-splittable; that and a
    //    non-broadcastable right side is precisely when manual salting is
    //    needed (verified while building this test: the agg-fed plain join
    //    keeps skew=false even with the hot partition 10× the median);
    //  - the same join against a MATERIALIZED stats table (the realistic
    //    dim-on-disk shape) is split by AQE, salting not needed.
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // AQE splits a skewed reducer partition by MAPPER ranges — a one-file
    // test input produces one map task, leaving nothing to split. At
    // production scale the fact arrives in thousands of splits; mirror
    // that with an upstream repartition so the skew shuffle has >1 mapper.
    val left = ev.repartition(8).select(
      col("event_id"),
      when(col("event_id") % 10 < 9, lit(7L))
        .otherwise(col("user_id") % 50).as("skew_key"),
      col("value"))
    val rightDir = java.nio.file.Files.createTempDirectory("graft-aqe-right").toString
    ev.groupBy((col("user_id") % 50).as("skew_key"))
      .agg(count(lit(1)).as("key_n"))
      .write.mode("overwrite").parquet(rightDir)
    val right = spark.read.parquet(rightDir)
      .hint("merge") // the q37 regime: non-broadcastable right side
    val conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: the sf0.001 hot partition is a few tens of
      // KB of compressed shuffle bytes, vs 256MB production defaults
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b",
      // keep AQE from demoting the (tiny) test join to broadcast — at real
      // scale the right side is non-broadcastable by size
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val plain = left.join(right, Seq("skew_key"))
      val got = plain.collect() // AQE finalizes the plan on execution
      val plan = plain.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not split the hot partition:\n$plan")
      val salted = Skew.saltedJoin(left, right, Seq("skew_key"), salt = 8)
        .select(plain.columns.map(col): _*).collect()
      assert(got.map(_.toString).sorted.toSeq == salted.map(_.toString).sorted.toSeq,
        "AQE-split plain join and salted join disagree")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("saltedJoin collapseDuplicates re-expands a >64k multiplicity in chunks") {
    import spark.implicits._
    // multiplicity past the 64k per-array chunk: the two-level re-expansion
    // must emit every copy without ever building one multiplicity-sized array
    val n = 200000
    val left = (Seq.fill(n)(("HOT", 1)) :+ ("miss", 2)).toDF("k", "lv")
    val right = Seq(("HOT", 1.0)).toDF("k", "rv")
    val out = Skew.saltedJoin(left, right, Seq("k"), salt = 4,
      joinType = "left", collapseDuplicates = true)
    assert(out.count() == n + 1)
    assert(out.filter($"k" === "HOT" && $"rv" === 1.0).count() == n)
  }
}
