package graft.kernel

import graft.kernel.{Fixtures => F}

/** The DECIMAL(18,9) fixed-point money opt-in (SURVEY §1.2's sanctioned improvement
  * over the reference's float money): OFF by default — the double path must
  * stay bit-identical to the reference and the DuckDB oracles — and exact
  * under the flag. This spec pins ONE case where the two visibly diverge,
  * so the flag provably changes the arithmetic rather than being a no-op.
  */
class DecimalMoneySpec extends SparkSpec {

  // mode 1, discount 1.0: external_consumption = cost + credits_consumption
  // = 0.1 + 0.2 — THE canonical IEEE non-associativity artifact
  private def run(decimalMoney: Boolean) = {
    import spark.implicits._
    val facts = Seq(F.fact("A").copy(
      cost = 0.1, internal_credits_cost = 0.2,
      internal_credits_consumption = 0.2)).toDF()
    val rules = Seq(F.Rule("2026-01", "A",
      mode = Some(1), discount = Some(1.0))).toDF()
    Calculate.calculateWithCredits(facts, rules, decimalMoney = decimalMoney)
  }

  test("default double path shows the 0.1 + 0.2 artifact (reference parity)") {
    val ext = run(decimalMoney = false)
      .select("external_consumption").collect().head.getDouble(0)
    assert(ext == 0.1 + 0.2)       // = 0.30000000000000004
    assert(ext != 0.3, "double money unexpectedly exact — flag default changed?")
  }

  test("decimalMoney range boundary: |value| >= 1e9 fails LOUDLY under ANSI (Spark 4 default)") {
    // the price of 18-digit fixed-point (exact cross-engine products) is
    // range: 9 integer digits per VALUE. Beyond it the cast overflows —
    // loudly under ANSI mode (Spark 4's default; with ansi off it would be
    // a silent null, which is why this pin matters). Deployments with
    // larger per-row money need a wider type and must give up the exact
    // DECIMAL-oracle property (see Modes.MoneyDecimal).
    import spark.implicits._
    val facts = Seq(F.fact("A").copy(
      cost = 2e9, internal_credits_cost = 0.0,
      internal_credits_consumption = 0.0)).toDF()
    val rules = Seq(F.Rule("2026-01", "A",
      mode = Some(1), discount = Some(1.0))).toDF()
    val ex = intercept[Exception] {
      Calculate.calculateWithCredits(facts, rules, decimalMoney = true)
        .select("internal_cost").collect()
    }
    assert(ex.getMessage.contains("Decimal(18, 9)"),
      s"expected a Decimal(18, 9) overflow error, got: ${ex.getMessage.take(200)}")
    // the default double path is unaffected by the boundary
    val dbl = Calculate.calculateWithCredits(facts, rules)
      .select("internal_cost").collect().head.getDouble(0)
    assert(dbl == 2e9)
  }

  test("decimalMoney computes exactly 0.3, and conform returns it as the closest double") {
    val df = run(decimalMoney = true)
    val ext = df.select("external_consumption").collect().head
    val dec = ext.getDecimal(0)
    assert(dec.compareTo(new java.math.BigDecimal("0.3")) == 0,
      s"decimal money not exact: $dec")
    // conform's double cast lands on the nearest double to the EXACT value
    val conformed = Conform.conformToTarget(df)
      .select("external_consumption").collect().head.getDouble(0)
    assert(conformed == 0.3)
  }
}
