package graft.operators

import graft.kernel.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  test("asofJoin equals the naive inequality join: before/at-instant/tie/no-match rows") {
    import spark.implicits._
    // right rows: before, exactly-at, after; equal-ts duplicates with
    // distinct payloads (tie); a key with no right row at all
    val left = Seq(
      ("a", 100L, 1L), // strictly after rights at 50/90
      ("a", 90L, 2L),  // exactly at a right row's ts — at-or-before includes it
      ("a", 40L, 3L),  // before every right row — dropped (inner)
      ("b", 10L, 4L),  // key with no right rows — dropped
      ("c", 70L, 5L)   // tie: two right rows at ts=60 — greater rid wins
    ).toDF("k", "us", "lid")
    val right = Seq(
      ("a", 50L, 10L, 1.5), ("a", 90L, 11L, 2.5), ("a", 120L, 12L, 3.5),
      ("c", 60L, 20L, 4.5), ("c", 60L, 21L, 5.5)
    ).toDF("k", "us", "rid", "rv")

    val got = Temporal.asofJoin(left, right, keys = Seq("k"), ts = "us")
      .select("k", "us", "lid", "asof_rid", "asof_rv").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet

    // naive: inequality join + top-1 by (us desc, rid desc)
    import org.apache.spark.sql.expressions.Window
    val naive = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.us") <= col("l.us"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l.lid"))
          .orderBy(col("r.us").desc, col("r.rid").desc)))
      .filter(col("rn") === 1)
      .select(col("l.k"), col("l.us"), col("l.lid"), col("r.rid"), col("r.rv"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet

    assert(got == naive)
    assert(got.map(_._3) == Set(1L, 2L, 5L)) // 3 (too early) and 4 (no key) dropped
    assert(got.find(_._3 == 2L).get._4 == 11L) // at-instant right row visible
    assert(got.find(_._3 == 5L).get._4 == 21L) // tie broken to greater rid

    // left-outer variant keeps the unmatched rows with null payload
    val outer = Temporal.asofJoin(left, right, Seq("k"), "us", innerOnly = false)
    assert(outer.count() == 5)
    assert(outer.filter(col("asof_rid").isNull).select("lid").collect()
      .map(_.getLong(0)).toSet == Set(3L, 4L))
  }

  test("asofJoin equals the naive join on seeded random data (500 left x 300 right)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // small ts range forces heavy key/ts collisions — the tie paths get hit
    val left = (1 to 500).map(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(40).toLong, i.toLong)).toDF("k", "us", "lid")
    val right = (1 to 300).map(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(40).toLong, i.toLong, rnd.nextInt(100) / 10.0))
      .toDF("k", "us", "rid", "rv")

    import org.apache.spark.sql.expressions.Window
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rid").collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val got = canon(Temporal.asofJoin(left, right, Seq("k"), "us")
      .select(col("lid"), col("asof_rid").as("rid")))
    val naive = canon(left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.us") <= col("l.us"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l.lid"))
          .orderBy(col("r.us").desc, col("r.rid").desc, col("r.rv").desc)))
      .filter(col("rn") === 1))
    assert(got == naive)
  }

  test("rangeJoin equals the naive join on seeded random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ranges = (1 to 200).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(300).toLong) // widths 1..300 vs bucket 100
    }.toDF("range_id", "lo", "hi")
    val events = (1 to 800).map(i => (rnd.nextInt(1100).toLong, i.toLong))
      .toDF("us", "eid")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("range_id", "eid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs(Temporal.rangeJoin(ranges, events, "lo", "hi", "us", bucketMicros = 100L))
    val naive = pairs(ranges.crossJoin(events)
      .filter(col("us") >= col("lo") && col("us") < col("hi")))
    assert(got == naive)
  }

  test("rangeJoin equals the naive BETWEEN join: boundaries, bucket spans, overlaps") {
    import spark.implicits._
    val w = 100L // bucket width
    val ranges = Seq(
      (1L, 100L, 300L), // exactly 2 buckets, lo/hi on bucket boundaries
      (2L, 150L, 160L), // sub-bucket interval
      (3L, 250L, 520L), // spans 4 buckets
      (4L, 140L, 290L)  // overlaps ranges 1 and 2 — events count in both
    ).toDF("range_id", "lo", "hi")
    val events = Seq(
      (100L, 1.0), // == lo of r1: included (closed lower bound)
      (300L, 2.0), // == hi of r1: excluded (open upper bound)
      (155L, 3.0), (299L, 4.0), (519L, 5.0), (520L, 6.0), (99L, 7.0)
    ).toDF("us", "v")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("range_id", "us").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val got = pairs(Temporal.rangeJoin(ranges, events,
      lo = "lo", hi = "hi", ts = "us", bucketMicros = w))
    val naive = pairs(ranges.crossJoin(events)
      .filter(col("us") >= col("lo") && col("us") < col("hi")))

    assert(got == naive)
    assert(got.contains((1L, 100L)) && !got.contains((1L, 300L)))
    assert(got.contains((3L, 519L)) && !got.contains((3L, 520L)))
    // overlap: 155 falls in ranges 1, 2 AND 4 — exactly once each
    assert(got.count(_._2 == 155L) == 3)
  }
}
