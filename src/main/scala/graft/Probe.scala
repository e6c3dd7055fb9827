package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: run named queries from [[SparkEntry.queries]] in one JVM,
  * print executed-plan size and 2 timed runs each (cache cleared between
  * runs). The minimal harness for "is this query slow, or was the bench
  * contaminated?" — e.g. `runMain graft.Probe q22_kernel_full
  * q24_kernel_sql_variant` with `SPARK_GRAFT_SF_DIR` set.
  *
  * `--jobs` additionally prints, for the SECOND timed run of each query,
  * every Spark job it launched (wall seconds + summed task time + job
  * group/description) — the optimization guide's §1 "where is the time
  * going" empirical loop without a UI: broadcast-build jobs, window dedup
  * jobs, driver-side estimate jobs, and the main noop job all show up as
  * separate lines. `--explain` prints each query's formatted physical plan.
  */
object Probe {

  /** Per-job record collected by the listener. */
  private final case class JobRow(
      id: Int, wallSec: Double, taskSec: Double, tasks: Int, desc: String)

  private final class JobListener extends org.apache.spark.scheduler.SparkListener {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[JobRow]()
    private val started =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    private val taskNs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    private val nTasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
    private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var enabled = false

    override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      if (!enabled) return
      val desc = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      started.put(js.jobId, (js.time, desc))
      js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
      taskNs.put(js.jobId, new java.util.concurrent.atomic.AtomicLong(0L))
      nTasks.put(js.jobId, new java.util.concurrent.atomic.AtomicInteger(0))
    }
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val jid = stageToJob.get(te.stageId)
      if (jid != null && te.taskMetrics != null) {
        Option(taskNs.get(jid)).foreach(_.addAndGet(te.taskMetrics.executorRunTime * 1000000L))
        Option(nTasks.get(jid)).foreach(_.incrementAndGet())
      }
    }
    override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val s = started.remove(je.jobId)
      if (s != null) {
        val t = Option(taskNs.remove(je.jobId)).map(_.get).getOrElse(0L)
        val n = Option(nTasks.remove(je.jobId)).map(_.get).getOrElse(0)
        rows.add(JobRow(je.jobId, (je.time - s._1) / 1e3, t / 1e9, n, s._2))
      }
    }
    def drain(): Seq[JobRow] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[JobRow]
      var r = rows.poll()
      while (r != null) { out += r; r = rows.poll() }
      out.toSeq.sortBy(_.id)
    }
  }

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
    val jobs = args.contains("--jobs")
    val names = args.toSeq.filterNot(a => a == "--explain" || a == "--jobs")
    val listener = new JobListener
    if (jobs) spark.sparkContext.addSparkListener(listener)
    // warmup
    runNoop(SparkEntry.entry(spark))
    names.foreach { n =>
      val fn = SparkEntry.benchQueries(n)
      val df = fn(spark, sfDir)
      println(s"===== $n plan size: ${df.queryExecution.executedPlan.toString.length}")
      if (explain) df.explain("formatted")
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        if (jobs && i == 2) { listener.drain(); listener.enabled = true }
        val t0 = System.nanoTime()
        runNoop(fn(spark, sfDir))
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        if (jobs && i == 2) {
          listener.enabled = false
          // listener events are async — give the bus a moment to drain
          Thread.sleep(300)
          listener.drain().foreach { r =>
            val d = if (r.desc.length > 90) r.desc.take(90) + "…" else r.desc
            println(f"  job ${r.id}%4d wall=${r.wallSec}%7.3fs task=${r.taskSec}%8.3fs n=${r.tasks}%4d  $d")
          }
        }
      }
    }
    spark.stop()
  }
}
