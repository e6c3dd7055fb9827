package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: run named queries from [[SparkEntry.queries]] in one JVM,
  * print executed-plan size and 2 timed runs each (cache cleared between
  * runs). The minimal harness for "is this query slow, or was the bench
  * contaminated?" — e.g. `runMain graft.Probe q22_kernel_full
  * q24_kernel_sql_variant` with `SPARK_GRAFT_SF_DIR` set. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runNoop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // `--explain` prints each query's formatted physical plan (codegen
    // span numbering included) instead of only the plan size
    val explain = args.contains("--explain")
    val names = args.toSeq.filterNot(_ == "--explain")
    // warmup
    runNoop(SparkEntry.entry(spark))
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val df = fn(spark, sfDir)
      println(s"===== $n plan size: ${df.queryExecution.executedPlan.toString.length}")
      if (explain) df.explain("formatted")
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        runNoop(fn(spark, sfDir))
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
