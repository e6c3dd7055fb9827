package graft.pipeline

import java.nio.file.Files
import java.time.LocalDate

import graft.kernel.{Fixtures, SparkSpec}

class LauncherSpec extends SparkSpec {
  import Fixtures._

  test("runDaily end-to-end: lookback window days land, out-of-window days don't") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-launcher").toString
    val today = LocalDate.parse("2026-01-15") // window = [2026-01-11, 2026-01-16)
    val facts = Seq(
      fact("A").copy(usage_day = java.sql.Date.valueOf("2026-01-12")), // in window
      fact("A").copy(usage_day = java.sql.Date.valueOf("2026-01-05"))) // outside
    val rules = Seq(Rule("2026-01", "A", mode = Some(2), price = Some(2.0)))
    facts.toDF().write.parquet(s"$dir/ods")
    rules.toDF().write.parquet(s"$dir/dim")
    val alerts = scala.collection.mutable.ArrayBuffer[String]()
    val alerter = new Alerter { def send(m: String): Unit = alerts += m }

    val failed = Launcher.runDaily(
      spark,
      Launcher.Config(s"$dir/ods", s"$dir/dim", s"$dir/out",
        failureCsv = s"$dir/failures.csv", alerter = alerter,
        extraDiscount = Map.empty),
      today)

    assert(failed.isEmpty)
    val out = spark.read.parquet(s"$dir/out")
    val days = out.select("usage_day").collect().map(_.get(0).toString).toSet
    assert(days == Set("2026-01-12"))
    assert(out.count() == 1)
    assert(alerts.exists(_.contains("complete")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/failures.csv")))
  }

  test("--backfill yyyyMM recomputes the whole named month (E2 CLI)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-backfill").toString
    val facts = Seq(
      fact("A").copy(usage_day = java.sql.Date.valueOf("2026-01-05")),
      fact("A").copy(usage_day = java.sql.Date.valueOf("2026-01-28")),
      fact("A").copy(invoice_month = "202602",
        usage_day = java.sql.Date.valueOf("2026-02-02"))) // other month: excluded
    val rules = Seq(Rule("2026-01", "A", mode = Some(2), price = Some(2.0)))
    facts.toDF().write.parquet(s"$dir/ods")
    rules.toDF().write.parquet(s"$dir/dim")

    val code = Launcher.run(spark,
      Array(s"$dir/ods", s"$dir/dim", s"$dir/out", "--backfill", "202601"))

    assert(code == 0)
    val out = spark.read.parquet(s"$dir/out")
    // whole month, no lookback clamp — both January days land
    assert(out.select("usage_day").collect().map(_.get(0).toString).toSet ==
      Set("2026-01-05", "2026-01-28"))
  }

  test("--accounts repairs only the named accounts in the named month (E3 CLI)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-repair").toString
    val facts = Seq(fact("A"), fact("B"), fact("C")) // all on 2026-01-15
    val rules = Seq(
      Rule("2026-01", "A", mode = Some(2), price = Some(2.0)),
      Rule("2026-01", "B", mode = Some(2), price = Some(3.0)))
    facts.toDF().write.parquet(s"$dir/ods")
    rules.toDF().write.parquet(s"$dir/dim")

    val code = Launcher.run(spark,
      Array(s"$dir/ods", s"$dir/dim", s"$dir/out",
        "--accounts", "A,B", "--month", "202601"))

    assert(code == 0)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.select("billing_account_id").collect()
      .map(_.getString(0)).toSet == Set("A", "B"))
  }

  test("--accounts with --window restricts the repair to the lookback days") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-repair-window").toString
    val facts = Seq(
      fact("A").copy(usage_day = java.sql.Date.valueOf("2026-01-14")), // in window
      fact("A").copy(usage_day = java.sql.Date.valueOf("2026-01-02"))) // outside
    val rules = Seq(Rule("2026-01", "A", mode = Some(2), price = Some(2.0)))
    facts.toDF().write.parquet(s"$dir/ods")
    rules.toDF().write.parquet(s"$dir/dim")

    val code = Launcher.run(spark,
      Array(s"$dir/ods", s"$dir/dim", s"$dir/out",
        "--accounts", "A", "--month", "202601",
        "--window", "3", "--today", "2026-01-15"))

    assert(code == 0)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.select("usage_day").collect().map(_.get(0).toString).toSet ==
      Set("2026-01-14"))
  }

  test("contradictory CLI flags are rejected, not silently dropped") {
    // each of these used to drop one flag and alert "complete" on work
    // that never ran
    intercept[IllegalArgumentException] {
      Launcher.run(spark, Array("a", "b", "c", "--backfill", "202601", "--accounts", "A"))
    }
    intercept[IllegalArgumentException] {
      Launcher.run(spark, Array("a", "b", "c", "--window", "3"))
    }
    intercept[IllegalArgumentException] { // window anchored to today, month in the past
      Launcher.run(spark, Array("a", "b", "c",
        "--accounts", "A", "--month", "190001", "--window", "3"))
    }
    intercept[IllegalArgumentException] { // daemon loop vs one-shot backfill
      Launcher.run(spark, Array("a", "b", "c",
        "--backfill", "202601", "--daemon", "02:00"))
    }
    intercept[IllegalArgumentException] { // daemon loop vs one-shot repair
      Launcher.run(spark, Array("a", "b", "c",
        "--accounts", "A", "--daemon", "02:00"))
    }
  }

  test("malformed month arguments fail fast instead of matching zero partitions") {
    intercept[IllegalArgumentException] {
      Launcher.run(spark, Array("a", "b", "c", "--backfill", "2026-01"))
    }
    intercept[IllegalArgumentException] {
      Launcher.run(spark, Array("a", "b", "c", "--backfill", "20261"))
    }
    intercept[IllegalArgumentException] {
      Launcher.run(spark, Array("a", "b", "c", "--accounts", "A", "--month", "jan26"))
    }
  }

  test("daemon nextTick: today if still ahead, tomorrow once passed, never 'now' itself") {
    import java.time.{LocalDateTime, LocalTime}
    val at = LocalTime.parse("05:00")
    assert(Launcher.nextTick(LocalDateTime.parse("2026-01-15T03:00:00"), at) ==
      LocalDateTime.parse("2026-01-15T05:00:00"))
    assert(Launcher.nextTick(LocalDateTime.parse("2026-01-15T06:00:00"), at) ==
      LocalDateTime.parse("2026-01-16T05:00:00"))
    // firing exactly at the tick must schedule TOMORROW, not re-fire now
    // (the reference's schedule lib has the same no-immediate-refire rule)
    assert(Launcher.nextTick(LocalDateTime.parse("2026-01-15T05:00:00"), at) ==
      LocalDateTime.parse("2026-01-16T05:00:00"))
    // month/year rollover
    assert(Launcher.nextTick(LocalDateTime.parse("2026-12-31T23:59:59"), at) ==
      LocalDateTime.parse("2027-01-01T05:00:00"))
  }

  test("HttpAlerter builds the reference webhook JSON shape with escaping") {
    val a = new HttpAlerter("http://localhost:1/unused")
    assert(a.payload("hi") == """{"msg_type":"text","content":{"text":"hi"}}""")
    assert(a.payload("a\"b\\c\nd") ==
      """{"msg_type":"text","content":{"text":"a\"b\\c\nd"}}""")
  }

  test("HttpAlerter failure is swallowed (alerting never fails the day)") {
    // port 1 refuses connections — send must return normally
    new HttpAlerter("http://127.0.0.1:1/x").send("m")
  }
}
