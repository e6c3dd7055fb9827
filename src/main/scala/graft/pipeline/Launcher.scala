package graft.pipeline

import java.time.format.DateTimeFormatter
import java.time.{Duration, LocalDate, LocalDateTime, LocalTime}

import org.apache.spark.sql.SparkSession

/** E1 — the daily entry point (ref: main.py:164-215: a scheduler fires
  * `daily_cron_work` at 05:00, which computes the 4-day lookback window
  * clamped to the month start and recomputes those partitions).
  *
  * One tick = [[runDaily]]: lookback window → per-day isolated kernel runs →
  * idempotent partition overwrite → completion/failure alerts. The
  * reference's tmp-table/double-DELETE dance collapses into
  * [[Sink.writePartitioned]]'s atomic dynamic-partition overwrite.
  *
  * The `main` runs one tick by default (cron owns scheduling in a real
  * deployment — one process per tick is the operable shape); `--daemon
  * HH:mm` reproduces the reference's self-scheduling loop for parity.
  */
object Launcher {

  final case class Config(
      odsPath: String,
      dimPath: String,
      targetPath: String,
      failureCsv: String = "failures.csv",
      lookbackDays: Int = 4,
      alerter: Alerter = LogAlerter,
      extraDiscount: Map[String, Double] = Map.empty)

  /** One E1 tick for `today`: returns the failed days (empty = clean run). */
  def runDaily(spark: SparkSession, config: Config,
               today: LocalDate = LocalDate.now()): Seq[LocalDate] = {
    val (start, endExclusive) = Jobs.lookbackWindow(today, config.lookbackDays)
    val invoiceMonth = today.format(DateTimeFormatter.ofPattern("yyyyMM"))
    val days = Iterator.iterate(start)(_.plusDays(1))
      .takeWhile(_.isBefore(endExclusive)).toSeq
    val fact = spark.read.parquet(config.odsPath)
    val dim = spark.read.parquet(config.dimPath)
    IsolatedRun.runDays(
      spark, fact, dim, config.targetPath, invoiceMonth, days,
      config.failureCsv, config.alerter, config.extraDiscount)
  }

  /** Sleep until the next `at` (today or tomorrow), run a tick, repeat —
    * the reference's `schedule.every().day.at("05:00")` loop. */
  def daemon(spark: SparkSession, config: Config, at: LocalTime): Nothing = {
    while (true) {
      val now = LocalDateTime.now()
      val todayAt = now.toLocalDate.atTime(at)
      val next = if (todayAt.isAfter(now)) todayAt else todayAt.plusDays(1)
      Thread.sleep(math.max(0L, Duration.between(now, next).toMillis))
      runDaily(spark, config)
    }
    throw new IllegalStateException("unreachable")
  }

  /** args: odsPath dimPath targetPath [--today yyyy-MM-dd] [--daemon HH:mm]
    * [--webhook url]. Default: one tick for the current date. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: Launcher <odsPath> <dimPath> <targetPath> [--today yyyy-MM-dd] [--daemon HH:mm] [--webhook url]")
    def flag(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val alerter = flag("--webhook").map(new HttpAlerter(_)).getOrElse(LogAlerter)
    val config = Config(args(0), args(1), args(2), alerter = alerter)
    val spark = SparkSession.builder()
      .appName("graft-daily")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try flag("--daemon") match {
      case Some(t) => daemon(spark, config, LocalTime.parse(t))
      case None =>
        val today = flag("--today").map(LocalDate.parse).getOrElse(LocalDate.now())
        val failed = runDaily(spark, config, today)
        if (failed.nonEmpty) sys.exit(1)
    } finally spark.stop()
  }
}
