package graft.pipeline

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Bucketed-table tooling — the shuffle-elimination story for REPEATED
  * joins/aggregations on the same key (SURVEY.md §4 scale notes).
  *
  * A fact written with `bucketBy(n, keys)` is hash-partitioned on disk;
  * Spark records the bucket spec in the catalog and plans joins between
  * two tables bucketed on the same keys with the SAME bucket count — and
  * aggregations on the bucket keys — WITHOUT an Exchange. At 100 TB the
  * payoff is paying the fact's shuffle once at ingest instead of on every
  * downstream join (the billing kernel avoids this differently — its dim
  * broadcasts — but corpus-scale doc_id joins, d07/c01, are exactly this
  * shape).
  *
  * Bucket pruning: equality filters on the first bucket key scan only the
  * matching bucket files (1/n of the data) — the partition-pruning analog
  * for high-cardinality keys that would explode a directory-partition
  * scheme.
  *
  * Spark-specific caveats encoded here rather than in every call site:
  * bucketed writes MUST go through `saveAsTable` (the bucket spec lives in
  * the catalog, not the parquet footers); both join sides need the
  * same bucket count (or a multiple, with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`); and
  * `DisableUnnecessaryBucketedScan` silently turns the bucketed scan —
  * including bucket pruning — OFF for plans with no distribution
  * requirement (set `spark.sql.sources.bucketing.autoBucketedScan.enabled`
  * to false to force it, as the pruning spec does).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table. `path` makes it an
    * external table (data at the given location, spec in the catalog).
    * Sorting by the bucket keys lets a sort-merge join skip its sort. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, path: Option[String] = None,
                    format: String = "parquet"): Unit = {
    require(keys.nonEmpty && numBuckets > 0)
    val w0: DataFrameWriter[Row] = df.write.format(format)
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    path.fold(w0)(p => w0.option("path", p)).saveAsTable(table)
  }

  /** Read a bucketed table back (plain catalog read — the bucket spec rides
    * along automatically; exists so call sites don't scatter `spark.table`
    * vs `read.parquet(path)`, which would silently DROP the bucket info). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
