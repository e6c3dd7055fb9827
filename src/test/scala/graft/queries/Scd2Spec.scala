package graft.queries

import java.nio.file.Files
import graft.kernel.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for q49 SCD2 history that the sf0.01 oracle hash can't
  * isolate: a FLIP-FLOPPING status must open a fresh version each time it
  * changes (a groupBy-status dedup would merge the two 'O' runs into one),
  * and the emitted intervals must chain — each version's `effective_to`
  * is exactly the next version's `effective_from`, NULL only on the open
  * current version. */
class Scd2Spec extends SparkSpec {

  /** Minimal orders table (only the columns q49 reads) in a temp dir. */
  private def ordersFixture(rows: Seq[(Long, Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_scd2").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "d")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        to_date(col("d")).as("o_orderdate"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("a status flip-flop opens a NEW version each change; plain runs collapse") {
    val d = ordersFixture(Seq(
      // cust 1 flip-flops O → F → O: three versions, never merged
      (1L, 1L, "O", "2024-01-01"),
      (2L, 1L, "F", "2024-01-05"),
      (3L, 1L, "O", "2024-01-09"),
      // cust 2 holds O twice then F: the O run collapses to one version
      (4L, 2L, "O", "2024-02-01"),
      (5L, 2L, "O", "2024-02-03"),
      (6L, 2L, "F", "2024-02-07")))
    val out = CoreQueries.q49Scd2History.fn(spark, d)
      .orderBy("o_custkey", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        String.valueOf(r.getDate(3)), Option(r.getDate(4)).map(String.valueOf).orNull,
        String.valueOf(r.getDate(5)), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 1L, "O", "2024-01-01", "2024-01-05", "2024-01-01", 1L),
      (1L, 2L, "F", "2024-01-05", "2024-01-09", "2024-01-05", 1L),
      (1L, 3L, "O", "2024-01-09", null, "2024-01-09", 1L),
      (2L, 1L, "O", "2024-02-01", "2024-02-07", "2024-02-03", 2L),
      (2L, 2L, "F", "2024-02-07", null, "2024-02-07", 1L)))
  }

  test("same-date observations order by o_orderkey — runs stay deterministic") {
    val d = ordersFixture(Seq(
      (10L, 3L, "O", "2024-03-01"),
      (11L, 3L, "F", "2024-03-01"), // same date, higher key → observed second
      (12L, 3L, "F", "2024-03-02")))
    val out = CoreQueries.q49Scd2History.fn(spark, d)
      .orderBy("version").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(6)))
    assert(out.toSeq == Seq((1L, "O", 1L), (2L, "F", 2L)))
  }

  test("on real data: versions are dense from 1, intervals chain, statuses alternate") {
    val out = CoreQueries.q49Scd2History.fn(spark, "/root/testdata/sf0.001").cache()
    try {
      assert(out.count() > 0)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("version")
      val checked = out
        .withColumn("next_from", lead(col("effective_from"), 1).over(w))
        .withColumn("next_status", lead(col("status"), 1).over(w))
        .withColumn("prev_version", lag(col("version"), 1).over(w))
      // dense numbering: first version is 1, each next is +1
      assert(checked.filter(col("prev_version").isNull && col("version") =!= 1).count() == 0)
      assert(checked.filter(col("prev_version").isNotNull &&
        col("version") =!= col("prev_version") + 1).count() == 0)
      // chaining: effective_to == next version's effective_from; NULL iff last
      assert(checked.filter(col("next_from").isNotNull &&
        col("effective_to") =!= col("next_from")).count() == 0)
      assert(checked.filter(col("next_from").isNull &&
        col("effective_to").isNotNull).count() == 0)
      // maximal runs: consecutive versions never share a status
      assert(checked.filter(col("next_status").isNotNull &&
        col("status") === col("next_status")).count() == 0,
        "adjacent versions with one status — runs were not maximal")
      // and the flip-flop path is actually exercised by the real data
      assert(out.groupBy("o_custkey", "status")
        .count().filter(col("count") > 1).count() > 0,
        "no customer revisits a status at sf0.001 — the flip-flop path is vacuous here")
    } finally out.unpersist()
  }
}
