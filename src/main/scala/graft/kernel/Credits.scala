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

  /** Adds the 8 `c_*` columns plus the two internal-credit totals. The pivot
    * itself is one compiled pass (VectorFunctions.CreditsPivot) — the
    * composed filter/aggregate form walks the interpreted expression tree
    * once per array element per credit type. */
  def deriveCredits(df: DataFrame): DataFrame = {
    val piv = graft.functions.VectorFunctions.creditsPivot(
      coalesce(col("credits_type"), array().cast("array<string>")),
      coalesce(col("credits_amount"), array().cast("array<double>")))
    val withPiv = df.withColumn("__piv", piv)
    val withTyped = BillingSchema.CreditColumns.zipWithIndex.foldLeft(withPiv) {
      case (acc, (colName, idx)) =>
        acc.withColumn(colName, element_at(col("__piv"), idx + 1))
    }
    withTyped
      .withColumn("internal_credits_cost", element_at(col("__piv"), 9))
      .withColumn(
        "internal_credits_consumption",
        col("internal_credits_cost") - col("c_rm"))
      .drop("__piv")
  }
}
