package graft.kernel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.7 steps 3–6 — cost derivations, per-account extra discount, and the
  * 4-mode external-consumption dispatch (ref: calculate/service.py:45-100,
  * 150-161, 187-209). One `when` tree per derived column: a single codegen'd
  * projection, no UDFs, no shuffles.
  */
object Modes {

  /** E4 SQL-variant flag (SURVEY.md §4): what mode 4 writes to
    * `discount_amount`. The live pandas path computes `credit_part` but then
    * projects only `external_consumption` out of the row-apply
    * (calculate/service.py:79-81), silently dropping the
    * `row["discount_amount"] = credit_part` assignment (:98) — so in
    * production `discount_amount` stays 0.0 for mode 4. The SQL template
    * (calculate/sql_template.py:184-190) keeps it. Per SURVEY §4's rule
    * ("the Python path is live, so Python wins"), [[LivePython]] is the
    * default and [[SqlTemplate]] is the opt-in. */
  sealed trait Mode4DiscountAmount
  object Mode4DiscountAmount {
    /** mode 4 leaves discount_amount = 0.0 (live behavior). */
    case object LivePython extends Mode4DiscountAmount
    /** mode 4 writes discount_amount = credit_part (SQL-template behavior). */
    case object SqlTemplate extends Mode4DiscountAmount
  }

  /** E4 SQL-variant flag #2 (SURVEY.md §4 discrepancy 1): WHICH base the
    * per-account extra-discount rate multiplies. The live pandas path
    * multiplies `internal_cost` (calculate/service.py:209). The SQL template
    * instead leaves `internal_cost` alone and folds the rate into the mode-1
    * consumption base: `internal_consumption_final = internal_consumption_base
    * * extra_discount_factor` (calculate/sql_template.py:130), which only
    * mode 1's `external_consumption` consumes (sql_template.py:175) — the
    * exported `internal_consumption` column stays the un-discounted base.
    * Python is live, so [[LivePython]] is the default; [[SqlTemplate]] is
    * the opt-in twin so the E4 statement can be reproduced exactly. */
  sealed trait ExtraDiscountBase
  object ExtraDiscountBase {
    /** rate × internal_cost (live behavior, calculate/service.py:209). */
    case object LivePython extends ExtraDiscountBase
    /** rate × mode-1 consumption base (calculate/sql_template.py:130,175);
      * internal_cost is left un-discounted. */
    case object SqlTemplate extends ExtraDiscountBase
  }

  /** The reference's per-account extra-discount rates
    * (calculate/service.py:189-199), kept as a PARITY FIXTURE — this is
    * deployment config, not engine code (SURVEY §7.1), so no API defaults
    * to it: every entry point defaults to an EMPTY map (rate 1.0) and a
    * deployment passes its own rates (e.g. from a config file or dim
    * table). Use this constant only to reproduce the reference's exact
    * output. */
  val ReferenceExtraDiscount: Map[String, Double] = {
    val tiers: Seq[(Double, Seq[String])] = Seq(
      0.975 -> Seq(
        "01F0DC-F91DC5-0F0CAB", "0143DC-442DB6-FDE892", "01FEE2-46994F-B32CB9",
        "01D111-877AA6-FC9006", "01368B-077E67-C11E2D", "01EB13-0127DF-324A48",
        "013EEC-7ED413-0F0733", "018D1D-AEDA58-9E382C"),
      0.965 -> Seq("01ACBD-4B4CE4-2D688D"),
      0.95 -> Seq(
        "01281B-3D24E6-B4D363", "01587C-263C61-84FBDB", "015C37-EF4FBF-AE3E2C",
        "015336-4C0FAA-732523"),
      0.88 -> Seq(
        "01BE65-4D6A90-81C9C9", "01AEFA-0E57C7-5D22AF", "012980-39DCA3-6B08CF",
        "01D80B-3126BB-D0C7C1", "01D977-BDDE3C-14BE03", "01EFBF-FE25D9-1F8A1C",
        "01B528-640F36-FF1F84", "013A21-83F145-1DE13D", "0134F7-148D6A-A3E367",
        "016577-4C47C6-43BEE5"),
      (28.5 / 27.2) -> Seq("010EDC-72FE2A-79D4CC"))
    tiers.flatMap { case (rate, accounts) => accounts.map(_ -> rate) }.toMap
  }

  /** Decimal fixed-point money opt-in (SURVEY §1.2 names exact decimal
    * money as the sanctioned improvement over the reference's float money).
    * OFF by default — the default path must stay bit-identical to the
    * reference and the DuckDB oracles (q22–q24), which both compute in
    * IEEE doubles. With the flag on, every money OPERAND, LITERAL, and
    * intermediate RESULT in the kernel arithmetic is DECIMAL(18,9), so
    * sums like 0.1 + 0.2 are exactly 0.3 — DecimalMoneySpec pins one such
    * divergence, and q38 pins the whole kernel against an independent
    * DECIMAL oracle. (The cast must cover the literals too: Spark coerces
    * decimal-vs-double arithmetic back to double, so a single stray
    * `lit(0.0)` would silently collapse the whole expression tree.)
    *
    * Why (18,9) and not (38,9): a (18,9)×(18,9) product is decimal(37,18)
    * in Spark and decimal(36,18) in portable DECIMAL engines — EXACT in
    * both, so re-fixing each operation's result to the money scale is the
    * only rounding anywhere and cross-engine runs agree digit-for-digit
    * (that is what q38's DuckDB oracle checks). (38,9) operands instead
    * overflow the 38-digit product: Spark silently truncates to scale 6
    * via its precision-loss rule and a DECIMAL oracle cannot multiply at
    * all. The price is range: |money| < 10^9 per VALUE (not per sum —
    * aggregation happens on doubles before/after the kernel), which covers
    * billing rows by ~6 orders of magnitude; beyond it the cast fails
    * LOUDLY under ANSI mode (Spark 4's default — DecimalMoneySpec pins
    * the error, and that with ansi off it would be a silent null). */
  private[kernel] val MoneyDecimal = org.apache.spark.sql.types.DecimalType(18, 9)

  /** mode-4 credit part: Σ (selected credit column / price), selection by the
    * slash-delimited `credit_fields` (ref: calculate/service.py:84-100).
    * Guards: price=0 ⇒ term dropped; null price ⇒ 1.0; null discount ⇒ 1.0. */
  private def mode4CreditPart(m: Column => Column, mlit: Double => Column,
                              mdiv: (Column, Column) => Column): Column = {
    val priceEff = coalesce(m(col("price")), mlit(1.0))
    val selected = split(coalesce(col("credit_fields"), lit("")), "/")
    val selectedSum = BillingSchema.CreditColumns
      .map(c => when(array_contains(selected, c), m(col(c))).otherwise(mlit(0.0)))
      .reduce((a, b) => m(a + b))
    when(priceEff =!= 0.0, mdiv(selectedSum, priceEff)).otherwise(mlit(0.0))
  }

  /** Applies steps 3–6 to a rule-tagged fact. Expects the fact measures plus
    * the 6 payload columns from [[RuleMatch.addRuleTag]].
    *
    * Which base the extra-discount rate multiplies is governed by
    * [[ExtraDiscountBase]]: `internal_cost` under the default LivePython
    * (calculate/service.py:209), or the mode-1 consumption base under the
    * SqlTemplate opt-in (calculate/sql_template.py:130,175). Mode 4's
    * `discount_amount` is governed by [[Mode4DiscountAmount]] (live-Python
    * default: stays 0.0).
    */
  def apply(tagged: DataFrame,
            extraDiscount: Map[String, Double] = Map.empty,
            mode4DiscountAmount: Mode4DiscountAmount =
              Mode4DiscountAmount.LivePython,
            extraDiscountBase: ExtraDiscountBase =
              ExtraDiscountBase.LivePython,
            decimalMoney: Boolean = false): DataFrame = {
    // money operand / money literal: identity+lit by default (the
    // reference- and oracle-parity path), DECIMAL(18,9) under the flag.
    // Under the flag, `m` also wraps every operation RESULT: each op is
    // exact at Spark's widened intermediate type (see MoneyDecimal), then
    // re-fixed to the money scale — the one, well-defined rounding point.
    // With identity `m` the wraps vanish, so the default expression tree is
    // unchanged.
    val m: Column => Column =
      if (decimalMoney) c => c.cast(MoneyDecimal) else identity
    val mlit: Double => Column =
      if (decimalMoney) d => lit(BigDecimal(d)).cast(MoneyDecimal) else d => lit(d)
    // division is the one op with no exact decimal result; engine-native
    // decimal-division rules (result scale, rounding) are NOT portable, so
    // compute the quotient in IEEE doubles — bit-identical across engines —
    // and re-fix it to the money scale
    val mdiv: (Column, Column) => Column =
      if (decimalMoney) (a, b) => m(a.cast("double") / b.cast("double"))
      else (a, b) => a / b

    val rate: Column =
      if (extraDiscount.isEmpty) mlit(1.0)
      else coalesce(
        m(element_at(typedlit(extraDiscount), col("billing_account_id"))), mlit(1.0))
    val (costRate, mode1Rate) = extraDiscountBase match {
      case ExtraDiscountBase.LivePython  => (rate, mlit(1.0))
      case ExtraDiscountBase.SqlTemplate => (mlit(1.0), rate)
    }

    val m4Part = mode4CreditPart(m, mlit, mdiv)
    val discEff = coalesce(m(col("discount")), mlit(1.0))

    tagged
      .withColumn("internal_cost",
        m(m(m(col("cost")) + m(col("internal_credits_cost"))) * costRate))
      .withColumn("internal_consumption",
        m(m(col("cost")) + m(col("internal_credits_consumption"))))
      .withColumn(
        "external_consumption",
        when(col("mode") === 1,
          m(m(col("internal_consumption") * mode1Rate) * m(col("discount"))))
          .when(col("mode") === 2,
            m(m(col("usage_amount_in_pricing_units")) * m(col("price"))))
          .when(col("mode") === 3,
            m(m(m(col("usage_amount_in_pricing_units")) * m(col("price"))) * m(col("discount"))))
          .when(col("mode") === 4,
            m(m(m(col("cost_at_list")) * discEff) + m(m4Part * discEff)))
          .otherwise(mlit(0.0)))
      .withColumn(
        "discount_amount", {
          val m1 = when(col("mode") === 1, m(col("internal_credits_consumption")))
          (mode4DiscountAmount match {
            case Mode4DiscountAmount.SqlTemplate => m1.when(col("mode") === 4, m4Part)
            case Mode4DiscountAmount.LivePython  => m1
          }).otherwise(mlit(0.0))
        })
  }
}
