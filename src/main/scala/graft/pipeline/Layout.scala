package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (z-order) — the file-skipping story for
  * predicates on MORE THAN ONE column (SURVEY.md §4 scale notes;
  * complements [[Bucketing]], which accelerates joins/aggs on one key set).
  *
  * A 100 TB table range-sorted on column A prunes scans filtered on A
  * (each file covers a narrow A-range, parquet footer min/max skip the
  * rest) but NOT on B — every file spans B's whole domain. Interleaving
  * the bits of A's and B's normalized ranks into one Morton (z) value and
  * range-partitioning + sorting on IT gives every file a narrow range in
  * BOTH dimensions (~1/√F of each domain for F files, vs 1/F and 1/1),
  * so min/max skipping works for either predicate — the layout Delta's
  * `OPTIMIZE ZORDER BY` and Iceberg's sort orders apply at table scale.
  *
  * Everything here is pure Catalyst integer arithmetic (min/max
  * normalization to 16-bit cells, a compiled bit-interleave expression
  * tree, `repartitionByRange` + `sortWithinPartitions`): codegen'd, one
  * range exchange — the same cost class as any ingest-time sort.
  */
object Layout {

  private val Bits = 16 // cells per dimension: 65536 — footer-stat granularity

  /** Normalize a numeric column to a [0, 65535] int64 cell index given the
    * column's (min, max). Integer output, identical on any engine; a
    * constant column maps to cell 0. */
  private[pipeline] def cell(c: Column, lo: Double, hi: Double): Column = {
    val span = hi - lo
    if (span <= 0) lit(0L)
    else least(lit((1L << Bits) - 1),
      floor((c.cast("double") - lit(lo)) / lit(span) * lit((1 << Bits).toDouble))
        .cast("long"))
  }

  /** Interleave the low [[Bits]] bits of two cell indices into a Morton
    * code (a even bits, b odd bits) — an unrolled shift/mask expression
    * tree, fully codegen'd. */
  private[pipeline] def morton2(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      val abit = shiftright(a, i) % 2 * lit(1L << (2 * i))
      val bbit = shiftright(b, i) % 2 * lit(1L << (2 * i + 1))
      abit + bbit
    }.reduce(_ + _)

  /** Rewrite `df` in z-order on two numeric columns: compute each
    * column's (min, max) in ONE aggregate (two scalars to the driver),
    * add the Morton value, range-partition into `numFiles` and sort each
    * partition by it, and drop the helper column. Writing the result
    * yields `numFiles` files whose parquet footer (min, max) cover
    * ~1/√numFiles of EACH column's domain — LayoutSpec asserts the
    * resulting skip fractions against the single-column sort. */
  def zOrderBy(df: DataFrame, colA: String, colB: String, numFiles: Int): DataFrame = {
    val Array(loA, hiA, loB, hiB) = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double")))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    df.withColumn("__z", morton2(cell(col(colA), loA, hiA), cell(col(colB), loB, hiB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
