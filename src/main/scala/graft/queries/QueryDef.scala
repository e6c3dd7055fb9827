package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases MUST match between the two — the
  * driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}

/** Engine-stable 4-decimal rounding for oracle parity.
  *
  * `round()` half-way behavior differs between Spark (BigDecimal HALF_UP on
  * the exact binary value) and DuckDB (scaled-multiply) — values landing on
  * a .00005 boundary flip. `floor(x*1e4 + 0.5)/1e4` uses the SAME IEEE ops
  * in both engines, so identical inputs give identical bits, and ulp-level
  * aggregation-order differences still collapse to the same result.
  */
object Stable {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{floor, lit}
  def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
  def sqlR4(e: String): String = s"floor(($e) * 10000.0 + 0.5) / 10000.0"

  /** Integer sum for oracle SQL. DuckDB widens `sum(BIGINT)` to HUGEINT
    * (int128), which the driver's typed hash distinguishes from Spark's
    * BIGINT even when every value is identical — this cost q15 (round 1)
    * and q18/t06 (round 2). Route EVERY integer-valued oracle sum through
    * this so the artifact cannot recur. */
  def sqlSumBig(e: String): String = s"CAST(sum($e) AS BIGINT)"
}
