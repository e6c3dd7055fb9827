package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.SparkSpec
import graft.tables.Tables

/** Z-order layout: the claim is FILE-SKIPPING ON BOTH COLUMNS — each
  * output file's footer (min, max) must cover a narrow slice of EACH
  * dimension, where a single-column sort gives narrow A-ranges but every
  * file spans B's whole domain. Verified by simulating parquet footer
  * pruning: per-partition (min, max) stats + point predicates, measuring
  * the fraction of files a reader would have to open.
  */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val NumFiles = 16

  /** Per-partition (minA, maxA, minB, maxB) — what parquet footers would
    * record per file. */
  private def stats(df: DataFrame, a: String, b: String): Array[(Double, Double, Double, Double)] =
    df.select(spark_partition_id().as("__pid"),
        col(a).cast("double").as("a"), col(b).cast("double").as("b"))
      .groupBy("__pid")
      .agg(min("a"), max("a"), min("b"), max("b"))
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))

  /** Average fraction of files whose [min, max] contains a probe value —
    * the scan fraction a min/max-skipping reader pays for `col = v`. */
  private def scanFraction(st: Array[(Double, Double, Double, Double)],
      probes: Seq[Double], useA: Boolean): Double = {
    val fracs = probes.map { v =>
      st.count { case (la, ha, lb, hb) =>
        if (useA) la <= v && v <= ha else lb <= v && v <= hb
      }.toDouble / st.length
    }
    fracs.sum / fracs.size
  }

  test("z-order files cover a narrow slice of BOTH dimensions; a plain sort only one") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val probesA = li.select("l_orderkey").distinct().orderBy("l_orderkey")
      .collect().map(_.getLong(0).toDouble).grouped(40).map(_.head).toSeq
    val probesB = li.select("l_partkey").distinct().orderBy("l_partkey")
      .collect().map(_.getLong(0).toDouble).grouped(10).map(_.head).toSeq

    val zStats = stats(Layout.zOrderBy(li, "l_orderkey", "l_partkey", NumFiles),
      "l_orderkey", "l_partkey")
    val aStats = stats(
      li.repartitionByRange(NumFiles, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"),
      "l_orderkey", "l_partkey")
    assert(zStats.length == NumFiles && aStats.length == NumFiles)

    val zA = scanFraction(zStats, probesA, useA = true)
    val zB = scanFraction(zStats, probesB, useA = false)
    val sortA = scanFraction(aStats, probesA, useA = true)
    val sortB = scanFraction(aStats, probesB, useA = false)

    // the single-column sort: perfect on A, USELESS on B (every file spans it)
    assert(sortA <= 0.25, s"range sort should prune A hard, scanned $sortA")
    assert(sortB >= 0.9, s"expected no B pruning under the A sort, got $sortB")
    // z-order: BOTH dimensions prune — strictly better than the sort's B,
    // and each bounded away from full scans
    assert(zA <= 0.6, s"z-order A scan fraction too high: $zA")
    assert(zB <= 0.6, s"z-order B scan fraction too high: $zB")
    assert(zB < sortB / 1.5, s"z-order must beat the plain sort on B: $zB vs $sortB")
  }

  /** Per-FILE (minA, maxA, minB, maxB) read from the REAL parquet footers
    * (round-8 verdict #6: the simulation above predicts; this measures).
    * Row-group stats are aggregated to file level — the granularity a
    * file-skipping reader prunes at. */
  private def footerStats(dir: String, a: String, b: String): Array[(Double, Double, Double, Double)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    files.map { f =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        val blocks = rd.getFooter.getBlocks.asScala.toSeq
        assert(blocks.nonEmpty, s"${f.getName}: no row groups")
        def mm(name: String): (Double, Double) = {
          val perGroup = blocks.map { blk =>
            val c = blk.getColumns.asScala
              .find(_.getPath.toDotString == name)
              .getOrElse(fail(s"${f.getName}: no column $name in footer"))
            val st = c.getStatistics
            assert(st != null && !st.isEmpty, s"${f.getName}: $name has no footer stats")
            (st.genericGetMin.asInstanceOf[Number].doubleValue(),
              st.genericGetMax.asInstanceOf[Number].doubleValue())
          }
          (perGroup.map(_._1).min, perGroup.map(_._2).max)
        }
        val (la, ha) = mm(a); val (lb, hb) = mm(b)
        (la, ha, lb, hb)
      } finally rd.close()
    }
  }

  test("on-disk parquet footers prune BOTH dimensions under z-order (real files, not simulation)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val probesA = li.select("l_orderkey").distinct().orderBy("l_orderkey")
      .collect().map(_.getLong(0).toDouble).grouped(40).map(_.head).toSeq
    val probesB = li.select("l_partkey").distinct().orderBy("l_partkey")
      .collect().map(_.getLong(0).toDouble).grouped(10).map(_.head).toSeq

    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft-asort").toString
    Layout.zOrderBy(li, "l_orderkey", "l_partkey", NumFiles)
      .write.mode("overwrite").parquet(zDir)
    li.repartitionByRange(NumFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sDir)

    val zStats = footerStats(zDir, "l_orderkey", "l_partkey")
    val aStats = footerStats(sDir, "l_orderkey", "l_partkey")
    assert(zStats.length == NumFiles && aStats.length == NumFiles)

    val zA = scanFraction(zStats, probesA, useA = true)
    val zB = scanFraction(zStats, probesB, useA = false)
    val sortA = scanFraction(aStats, probesA, useA = true)
    val sortB = scanFraction(aStats, probesB, useA = false)

    // same thresholds as the simulation — now measured from what parquet
    // actually wrote: the footer min/max a reader skips on
    assert(sortA <= 0.25, s"range sort should prune A on-disk, scanned $sortA")
    assert(sortB >= 0.9, s"expected no on-disk B pruning under the A sort, got $sortB")
    assert(zA <= 0.6, s"z-order on-disk A scan fraction too high: $zA")
    assert(zB <= 0.6, s"z-order on-disk B scan fraction too high: $zB")
    assert(zB < sortB / 1.5, s"z-order must beat the plain sort on B on-disk: $zB vs $sortB")
  }

  test("morton interleave is monotone in each cell and bounded to 2·Bits bits") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.morton2(col("a"), col("b")).as("z"))
    val zs = df.collect().map(_.getLong(0))
    assert(zs(0) == 0L && zs(1) == 1L && zs(2) == 2L)
    assert(zs(3) == (1L << 32) - 1, s"full cells must give 2^32−1, got ${zs(3)}")
  }
}
