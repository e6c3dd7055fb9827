package graft.kernel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J1–J9 — hierarchical most-specific-wins contract-rule lookup
  * (ref: calculate/service.py:102-138; SQL twin calculate/sql_template.py:47-122).
  *
  * The dimension has three OPTIONAL specializer keys (`project_id`,
  * `service_description`, `sku_id`); a null means "wildcard". That yields
  * 2³ = 8 rule families. Each family left-joins the fact on
  * (invoice_month, billing_account_id) + its present specializers, and the
  * winning payload per fact row is resolved per-column by precedence
  *
  *     8 > 4 > 6 > 2 > 7 > 3 > 5 > 1
  *
  * (more keys win; at equal key-count project > service > sku — derived from
  * the reference's ascending overwrite order [1,5,3,7,2,6,4,8] with
  * last-write-wins, calculate/service.py:126-138). Resolution is PER PAYLOAD
  * COLUMN (`coalesce` across families), matching both pandas `df.update`
  * (skips NaN per cell) and the SQL template's per-column COALESCE
  * (calculate/sql_template.py:93-98).
  *
  * Scale design: the dim is contract metadata — small by construction — so
  * all 8 joins are `broadcast()` hash joins: the 100 TB fact is never
  * shuffled, and the 8 joins fuse into one codegen stage.
  *
  * Defined-away reference quirk (SURVEY.md §2.3): duplicate keys inside one
  * rule family silently misalign rows in pandas. Here each family is
  * deterministically deduplicated (first row under an explicit payload sort)
  * before joining — documented first-match semantics.
  */
object RuleMatch {

  val PayloadCols: Seq[String] =
    Seq("mode", "discount", "price", "credit_fields", "customer_id", "contract_id")

  /** family id → (project?, service?, sku?) presence flags. */
  val Presence: Map[Int, (Boolean, Boolean, Boolean)] = Map(
    1 -> (false, false, false),
    2 -> (true, false, false),
    3 -> (false, true, false),
    4 -> (true, true, false),
    5 -> (false, false, true),
    6 -> (true, false, true),
    7 -> (false, true, true),
    8 -> (true, true, true))

  /** most-specific-wins order for the output coalesce. */
  val Precedence: Seq[Int] = Seq(8, 4, 6, 2, 7, 3, 5, 1)

  def keysFor(i: Int): Seq[String] = {
    val (p, s, k) = Presence(i)
    Seq("invoice_month", "billing_account_id") ++
      (if (p) Seq("project_id") else Nil) ++
      (if (s) Seq("service_description") else Nil) ++
      (if (k) Seq("sku_id") else Nil)
  }

  /** dim `month` is 'YYYY-MM' while fact `invoice_month` is 'YYYYMM'
    * (ref: main.py:34-36) — align the dim to the fact's format. */
  def withInvoiceMonth(dim: DataFrame): DataFrame =
    if (dim.columns.contains("invoice_month")) dim
    else dim.withColumn(
      "invoice_month",
      concat(substring(col("month"), 1, 4), substring(col("month"), 6, 2)))

  private def family(dim: DataFrame, i: Int): DataFrame = {
    val (p, s, k) = Presence(i)
    def pred(c: String, present: Boolean): Column =
      if (present) col(c).isNotNull else col(c).isNull
    val keys = keysFor(i)
    val filtered = dim
      .filter(
        pred("project_id", p) && pred("service_description", s) && pred("sku_id", k))
      .select((keys ++ PayloadCols).map(col): _*)
    // deterministic first-match dedup (nulls first in the payload sort)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(PayloadCols.map(col): _*)
    filtered
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .select(keys.map(col) ++ PayloadCols.map(c => col(c).as(s"${c}_r$i")): _*)
  }

  /** Fact + the 6 payload columns resolved by the rule hierarchy. */
  def addRuleTag(fact: DataFrame, dimRaw: DataFrame): DataFrame = {
    val dim = withInvoiceMonth(dimRaw)
    val joined = (1 to 8).foldLeft(fact) { (acc, i) =>
      acc.join(broadcast(family(dim, i)), keysFor(i), "left")
    }
    PayloadCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, coalesce(Precedence.map(i => col(s"${c}_r$i")): _*))
    }.drop((for (i <- 1 to 8; c <- PayloadCols) yield s"${c}_r$i"): _*)
  }
}
