package graft.io

import org.apache.spark.sql.functions._
import graft.kernel.SparkSpec

/** JDBC source/sink against in-memory Derby (ships in the Spark
  * distribution) — proves the pushdown/partitioning plumbing without a live
  * warehouse. Derby uppercases unquoted identifiers, hence ID/CATEGORY. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private lazy val seeded: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE billing_rows") catch { case _: java.sql.SQLException => () }
      st.execute("CREATE TABLE billing_rows(id BIGINT, category VARCHAR(10), amount DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO billing_rows VALUES (?, ?, ?)")
      (0 until 20).foreach { i =>
        ins.setLong(1, i.toLong)
        ins.setString(2, if (i % 2 == 0) "even" else "odd")
        ins.setDouble(3, i * 1.5)
        ins.executeUpdate()
      }
      st.close(); ins.close()
    } finally conn.close()
  }

  test("filters and projection push into the JDBC scan (remote WHERE, not local filter)") {
    seeded
    val df = Sources.readTable(spark, url, "billing_rows")
      .filter(col("ID") > 5 && col("CATEGORY") === "even")
      .select("ID", "AMOUNT")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(ID,5)"), plan)
    assert(plan.contains("EqualTo(CATEGORY,even)"), plan)
    assert(df.count() == 7) // 6, 8, 10, 12, 14, 16, 18
  }

  test("range partitioning yields N parallel slices with correct union of rows") {
    seeded
    val df = Sources.readTable(spark, url, "billing_rows",
      partitioning = Some(Sources.Partitioning("ID", 0, 20, 4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 20)
  }

  test("writeTable round-trips through the batched JDBC sink") {
    seeded
    import spark.implicits._
    val out = Seq((100L, "x", 1.0), (101L, "y", 2.0)).toDF("id", "category", "amount")
    Sources.writeTable(out, url, "written_rows",
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    val back = Sources.readTable(spark, url, "written_rows")
    assert(back.count() == 2)
    assert(back.select(sum(col("amount"))).collect().head.getDouble(0) == 3.0)
  }
}
