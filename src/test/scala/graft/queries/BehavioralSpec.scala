package graft.queries

import java.nio.file.Files
import graft.kernel.SparkSpec

/** Semantics pins for the behavioral queries (q42/q43) and the k-means
  * round (s08) that the sf0.01 oracle hash alone can't isolate: the funnel's
  * ORDER-strictness needs a crafted fixture (real event streams rarely
  * contain the adversarial orderings), and s08's determinism needs a
  * run-twice check (its centroids pass through driver-side collects).
  */
class BehavioralSpec extends SparkSpec {

  /** Write a minimal events table (the driver schema) to a temp dir. */
  private def eventsFixture(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_behavioral").toString
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q43 funnel only counts stages in strict event order") {
    val H = 3600000000L // 1h in micros
    val d = eventsFixture(Seq(
      // u1: view → click → purchase — the full funnel
      (1L, 1 * H, 1L, "view"), (2L, 2 * H, 1L, "click"), (3L, 3 * H, 1L, "purchase"),
      // u2: click BEFORE first view — click must not qualify, purchase must not count
      (4L, 1 * H, 2L, "click"), (5L, 2 * H, 2L, "view"), (6L, 3 * H, 2L, "purchase"),
      // u3: purchase BEFORE the qualifying click — reaches view+click only
      (7L, 1 * H, 3L, "view"), (8L, 2 * H, 3L, "purchase"), (9L, 3 * H, 3L, "click")))
    val row = CoreQueries.q43Funnel.fn(spark, d).collect().head
    assert(row.getLong(row.fieldIndex("n_users")) == 3)
    assert(row.getLong(row.fieldIndex("n_view")) == 3)
    assert(row.getLong(row.fieldIndex("n_view_click")) == 2, "u2's early click leaked in")
    assert(row.getLong(row.fieldIndex("n_full_funnel")) == 1, "u3's early purchase leaked in")
  }

  test("q42 cohort retention cells are (first-activity week, offset) distinct-user counts") {
    val D = 86400000000L // 1 day in micros
    val d = eventsFixture(Seq(
      // u1: first active day 0 (week 0), active again day 8 (offset week 1) twice
      (1L, 0 * D, 1L, "view"), (2L, 8 * D, 1L, "view"), (3L, 8 * D + 1, 1L, "click"),
      // u2: first active day 1 (week 0), never returns
      (4L, 1 * D, 2L, "view")))
    val cells = CoreQueries.q42CohortRetention.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // day-8 activity for u1 must be ONE user in (cohort week 0, offset 1)
    assert(cells == Set((0L, 0L, 2L), (0L, 1L, 1L)), s"got $cells")
  }

  test("s08 k-means is deterministic across invocations and partitions the corpus") {
    val sf = "/root/testdata/sf0.001"
    val a = graft.operators.Similarity.s08KmeansLloyd.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = graft.operators.Similarity.s08KmeansLloyd.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b), "two s08 runs diverged — the collect path is nondeterministic")
    assert(a.map(_._2).sum == 500L, "cluster sizes must partition the corpus")
    assert(a.length <= 8 && a.nonEmpty)
  }
}
