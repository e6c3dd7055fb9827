package graft.pipeline

import java.nio.file.Files
import java.time.LocalDate

import graft.kernel.{Fixtures, SparkSpec}

class OpsSpec extends SparkSpec {
  import Fixtures._

  test("runDays isolates a failing day: others land, failure is logged + alerted") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-iso").toString
    val facts = Seq(
      fact("A").copy(usage_day = java.sql.Date.valueOf("2026-01-10")),
      fact("A").copy(usage_day = java.sql.Date.valueOf("2026-01-11")))
    val rules = Seq(Rule("2026-01", "A", mode = Some(2), price = Some(2.0)))
    val alerts = scala.collection.mutable.ArrayBuffer[String]()
    val alerter = new Alerter { def send(m: String): Unit = alerts += m }

    // poison the 2026-01-11 slice: its per-day compute throws
    val failCsv = s"$dir/failures.csv"
    val f = facts.toDF(); val r = rules.toDF()
    val failed = IsolatedRun.runDays(
      spark, f, r, s"$dir/out", "202601",
      Seq(LocalDate.parse("2026-01-10"), LocalDate.parse("2026-01-11")),
      failureCsv = failCsv, alerter = alerter, extraDiscount = Map.empty,
      computeDay = Some { day =>
        if (day.toString == "2026-01-11") throw new RuntimeException("boom")
        Jobs.computeMonth(f, r, "202601",
          dayRange = Some((day, day.plusDays(1))), extraDiscount = Map.empty)
      })

    assert(failed == Seq(LocalDate.parse("2026-01-11")))
    assert(spark.read.parquet(s"$dir/out").count() == 1) // good day landed
    val csv = new String(Files.readAllBytes(java.nio.file.Paths.get(failCsv)))
    assert(csv.startsWith("invoice_month,usage_day,error"))
    assert(csv.contains("2026-01-11"))
    assert(alerts.exists(_.contains("2026-01-11")))
  }

  test("registered SQL functions evaluate like their Column twins") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_polyhash('abc') AS h, graft_dot(array(cast(1.0 as float), cast(2.0 as float)), array(cast(3.0 as float), cast(4.0 as float))) AS d, size(graft_shingles('a b c d')) AS s")
      .collect().head
    assert(r.getAs[Long]("h") == ((('a' * 31 + 'b') % 1000000007L) * 31 + 'c') % 1000000007L)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Int]("s") == 2)
  }
}
