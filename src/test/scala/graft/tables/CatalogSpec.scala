package graft.tables

import graft.kernel.SparkSpec

/** S9 — catalog operations (ref: README.md:35-39 `--list-tables`,
  * check_schema.py:19-22 DESCRIBE). Spark's native catalog IS the
  * implementation — these pin that the surface works against our tables. */
class CatalogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("list / describe / schema cover the reference's catalog surface") {
    val df = Tables.lineitem(spark, sf)
    df.createOrReplaceTempView("lineitem_v")

    // --list-tables
    assert(spark.catalog.listTables().collect().exists(_.name == "lineitem_v"))

    // DESCRIBE table → (name, type) rows
    val desc = spark.sql("DESCRIBE TABLE lineitem_v").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("l_orderkey") == "bigint")
    assert(desc("l_extendedprice") == "double")
    assert(desc("l_shipdate").nonEmpty)

    // programmatic schema access (check_schema.py's shape)
    assert(df.schema.fieldNames.toSet.contains("l_quantity"))
    spark.catalog.dropTempView("lineitem_v")
  }
}
