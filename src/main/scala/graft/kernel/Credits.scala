package graft.kernel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A7 — per-row credits pivot (ref: calculate/service.py:11-43).
  *
  * The raw fact carries parallel arrays `credits_type: array<string>` /
  * `credits_amount: array<double>`. The reference zips them per row in a
  * pandas row-UDF; here it is pure Catalyst higher-order functions
  * (`arrays_zip` → `filter` → `aggregate`) so whole-stage codegen survives —
  * no Scala UDF, no explode/shuffle.
  *
  * Semantics preserved exactly:
  *  - a known credit type sums into its `c_*` column;
  *  - unknown types contribute ONLY to `internal_credits_cost` (the total);
  *  - `internal_credits_consumption = internal_credits_cost - c_rm`;
  *  - null/empty arrays ⇒ all zeros.
  */
object Credits {

  private def zipped: Column =
    arrays_zip(
      coalesce(col("credits_type"), array().cast("array<string>")).as("t"),
      coalesce(col("credits_amount"), array().cast("array<double>")).as("a"))

  private def sumWhere(typeName: String): Column =
    aggregate(
      filter(zipped, s => s.getField("t") === typeName),
      lit(0.0),
      (acc, s) => acc + s.getField("a"))

  /** Adds the 8 `c_*` columns plus the two internal-credit totals. */
  def deriveCredits(df: DataFrame): DataFrame = {
    val withTyped = BillingSchema.CreditTypeToColumn.foldLeft(df) {
      case (acc, (typeName, colName)) =>
        acc.withColumn(colName, sumWhere(typeName))
    }
    withTyped
      .withColumn(
        "internal_credits_cost",
        aggregate(
          coalesce(col("credits_amount"), array().cast("array<double>")),
          lit(0.0), (acc, x) => acc + x))
      .withColumn(
        "internal_credits_consumption",
        col("internal_credits_cost") - col("c_rm"))
  }
}
