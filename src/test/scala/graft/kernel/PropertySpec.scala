package graft.kernel

import scala.util.Random

/** Property-style invariants (SURVEY.md §5.2) over the pure kernel, with
  * seeded deterministic case generation (the scalatestplus-scalacheck
  * bridge isn't in the offline cache; plain seeded sampling keeps the same
  * coverage without the dependency). */
class PropertySpec extends SparkSpec {
  import Fixtures._

  private val rnd = new Random(42)
  private def money(): Double = math.rint(rnd.nextDouble() * 1000000) / 100.0

  test("internal cost/consumption identities hold across random measures") {
    import spark.implicits._
    val cases = Seq.fill(8)((money(), money(), money(), money()))
    val facts = cases.zipWithIndex.map { case ((cost, icc, crm, usage), i) =>
      fact(s"A$i").copy(
        cost = cost, usage_amount_in_pricing_units = usage,
        c_rm = crm, internal_credits_cost = icc,
        internal_credits_consumption = icc - crm)
    }
    val rules = cases.indices.map(i => Rule("2026-01", s"A$i", mode = Some(1), discount = Some(0.8)))
    val out = Calculate.calculateWithCredits(facts.toDF(), rules.toDF(), Map.empty)
      .select("billing_account_id", "internal_cost", "internal_consumption")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    cases.zipWithIndex.foreach { case ((cost, icc, crm, _), i) =>
      val (ic, icons) = out(s"A$i")
      assert(math.abs(ic - (cost + icc)) < 1e-9)
      assert(math.abs(icons - (cost + icc - crm)) < 1e-9)
    }
  }

  test("precedence monotonicity: a more specific matching rule always wins") {
    import spark.implicits._
    (2 to 8).foreach { pat =>
      val (p, sv, k) = RuleMatch.Presence(pat)
      val base = Rule("2026-01", "A", mode = Some(1), contract_id = Some("BASE"))
      val specific = Rule("2026-01", "A",
        project_id = if (p) Some("p1") else None,
        service_description = if (sv) Some("s1") else None,
        sku_id = if (k) Some("k1") else None,
        mode = Some(2), contract_id = Some("SPEC"))
      val out = RuleMatch.addRuleTag(Seq(fact("A")).toDF(), Seq(base, specific).toDF())
        .select("contract_id").collect().head.getString(0)
      assert(out == "SPEC", s"pattern $pat did not beat pattern 1")
    }
  }

  test("credits pivot invariants for arbitrary (incl. unknown) type labels") {
    import spark.implicits._
    val labels = BillingSchema.CreditTypeToColumn.map(_._1) ++ Seq("UNKNOWN_X", "JUNK")
    val cases = Seq.fill(10)(
      (Seq.fill(5)(labels(rnd.nextInt(labels.size))), Seq.fill(5)(money())))
    val rows = Credits.deriveCredits(
      cases.zipWithIndex.map { case ((t, a), i) => (i, t, a) }
        .toDF("id", "credits_type", "credits_amount"))
      .collect().map(r => r.getAs[Int]("id") -> r).toMap
    cases.zipWithIndex.foreach { case ((types, amounts), i) =>
      val r = rows(i)
      val total = amounts.sum
      assert(math.abs(r.getAs[Double]("internal_credits_cost") - total) < 1e-6)
      assert(math.abs(
        r.getAs[Double]("internal_credits_consumption") -
          (total - r.getAs[Double]("c_rm"))) < 1e-6)
      val known = BillingSchema.CreditColumns.map(r.getAs[Double]).sum
      val unknown = types.zip(amounts)
        .filterNot { case (t, _) => BillingSchema.CreditTypeToColumn.exists(_._1 == t) }
        .map(_._2).sum
      assert(math.abs(known + unknown - total) < 1e-6)
    }
  }

  test("extra-discount base variants differ ONLY where the reference paths differ") {
    import spark.implicits._
    // SURVEY §4 discrepancy 1: the rate touches internal_cost on the live
    // path and the mode-1 external base on the SQL path — nothing else.
    val f = Seq(
      fact("A").copy(internal_credits_cost = 11.0, internal_credits_consumption = 9.0))
      .toDF()
    def run(base: Modes.ExtraDiscountBase, mode: Int) = {
      val rules = Seq(Rule("2026-01", "A", mode = Some(mode),
        price = Some(2.0), discount = Some(0.8))).toDF()
      Calculate.calculateWithCredits(f, rules, Map("A" -> 0.9),
        extraDiscountBase = base)
        .select("internal_cost", "internal_consumption", "external_consumption")
        .collect().head
    }
    Seq(1, 2, 3).foreach { m =>
      val live = run(Modes.ExtraDiscountBase.LivePython, m)
      val sqlt = run(Modes.ExtraDiscountBase.SqlTemplate, m)
      // internal_cost: only the live path discounts it
      assert(math.abs(live.getDouble(0) - 111.0 * 0.9) < 1e-9)
      assert(sqlt.getDouble(0) == 111.0)
      // internal_consumption: neither path discounts the exported column
      assert(live.getDouble(1) == 109.0 && sqlt.getDouble(1) == 109.0)
      // external: only mode 1 under SqlTemplate sees the rate
      if (m == 1) {
        assert(math.abs(live.getDouble(2) - 109.0 * 0.8) < 1e-9)
        assert(math.abs(sqlt.getDouble(2) - 109.0 * 0.9 * 0.8) < 1e-9)
      } else assert(live.getDouble(2) == sqlt.getDouble(2))
    }
  }

  test("kernel is deterministic: two runs over the same input are identical") {
    import spark.implicits._
    val f = Seq(fact("A")).toDF()
    val r = Seq(Rule("2026-01", "A", mode = Some(3), price = Some(2.0), discount = Some(0.9))).toDF()
    def run() = Conform.conformToTarget(
      Calculate.calculateWithCredits(f, r, Map.empty),
      org.apache.spark.sql.functions.lit("2026-02-01 00:00:00").cast("timestamp"))
    assert(run().unionAll(run()).distinct().count() == 1)
  }
}
