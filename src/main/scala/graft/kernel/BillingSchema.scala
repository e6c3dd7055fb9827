package graft.kernel

import org.apache.spark.sql.types._

/** Schemas of the three billing tables, inferred from the reference's queries
  * and coercions (FIXTURES.md; ref: billing_calculation_service.py:239-283,
  * calculate/service.py:115, billing_calculation_service.py:335-352).
  * Money is Double on purpose — the reference uses Float64 throughout, never
  * decimal (ref: calculate/sql_template.py:175-189).
  */
object BillingSchema {

  /** credit enum → pivoted column name (ref: calculate/service.py:12-21). */
  val CreditTypeToColumn: Seq[(String, String)] = Seq(
    "COMMITTED_USAGE_DISCOUNT" -> "c_cud",
    "COMMITTED_USAGE_DISCOUNT_DOLLAR_BASE" -> "c_cud_db",
    "DISCOUNT" -> "c_discount",
    "FREE_TIER" -> "c_free_tier",
    "PROMOTION" -> "c_promotion",
    "RESELLER_MARGIN" -> "c_rm",
    "SUBSCRIPTION_BENEFIT" -> "c_sub_benefit",
    "SUSTAINED_USAGE_DISCOUNT" -> "c_sud")

  val CreditColumns: Seq[String] = CreditTypeToColumn.map(_._2)

  /** 8-key pre-aggregation grain (ref: billing_calculation_service.py:185-186). */
  val Grain8: Seq[String] = Seq(
    "invoice_month", "billing_account_id", "usage_day", "project_id",
    "service_id", "service_description", "sku_id", "cost_type")

  /** 13-key grain incl. descriptive attrs (ref: billing_calculation_service.py:270-283). */
  val Grain13: Seq[String] = Grain8 ++ Seq(
    "project_name", "sku_description", "usage_pricing_unit", "currency",
    "currency_conversion_rate")

  /** Measures summed at either grain (ref: billing_calculation_service.py:166-179). */
  val Measures: Seq[String] =
    Seq("usage_amount_in_pricing_units", "cost", "cost_at_list") ++
      CreditColumns ++ Seq("internal_credits_cost", "internal_credits_consumption")

  /** The 37 output columns, order is law (ref: billing_calculation_service.py:335-352). */
  val TargetColumns: Seq[String] = Seq(
    "usage_day", "invoice_month", "billing_account_id",
    "customer_id", "contract_id",
    "service_id", "service_description",
    "sku_id", "sku_description",
    "project_id", "project_name",
    "usage_pricing_unit", "usage_amount_in_pricing_units",
    "currency", "currency_conversion_rate",
    "cost_type",
    "cost", "cost_at_list",
    "c_cud", "c_cud_db", "c_discount", "c_free_tier",
    "c_promotion", "c_rm", "c_sub_benefit", "c_sud",
    "internal_credits_cost", "internal_credits_consumption",
    "internal_cost", "internal_consumption",
    "external_consumption", "discount_amount",
    "mode", "price", "discount",
    "credit_fields", "etl_time")

  /** Non-nullable string cols defaulted to '' on conform
    * (ref: billing_calculation_service.py:383-388). */
  val StringDefaultCols: Seq[String] = Seq(
    "billing_account_id", "service_id", "service_description", "sku_id",
    "sku_description", "project_id", "project_name", "usage_pricing_unit",
    "currency", "cost_type", "credit_fields", "invoice_month")

  /** Nullable passthrough strings — stay null (ref: billing_calculation_service.py:359-361). */
  val NullableStringCols: Seq[String] = Seq("customer_id", "contract_id")

  val odsSchema: StructType = {
    val grainFields = Seq(
      StructField("invoice_month", StringType, nullable = false),
      StructField("billing_account_id", StringType, nullable = false),
      StructField("usage_day", DateType, nullable = false),
      StructField("project_id", StringType, nullable = false),
      StructField("project_name", StringType, nullable = false),
      StructField("service_id", StringType, nullable = false),
      StructField("service_description", StringType, nullable = false),
      StructField("sku_id", StringType, nullable = false),
      StructField("sku_description", StringType, nullable = false),
      StructField("usage_pricing_unit", StringType, nullable = false),
      StructField("currency", StringType, nullable = false),
      StructField("currency_conversion_rate", DoubleType, nullable = false),
      StructField("cost_type", StringType, nullable = false))
    val measureFields = Measures.map(StructField(_, DoubleType, nullable = false))
    val arrayFields = Seq(
      StructField("credits_type", ArrayType(StringType), nullable = true),
      StructField("credits_amount", ArrayType(DoubleType), nullable = true))
    StructType(grainFields ++ measureFields ++ arrayFields)
  }

  val dimSchema: StructType = StructType(Seq(
    StructField("month", StringType, nullable = false), // 'YYYY-MM'
    StructField("billing_account_id", StringType, nullable = false),
    StructField("project_id", StringType, nullable = true), // null ⇒ wildcard
    StructField("service_description", StringType, nullable = true),
    StructField("sku_id", StringType, nullable = true),
    StructField("mode", IntegerType, nullable = true),
    StructField("discount", DoubleType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("credit_fields", StringType, nullable = true),
    StructField("customer_id", StringType, nullable = true),
    StructField("contract_id", StringType, nullable = true)))
}
