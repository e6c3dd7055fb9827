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
