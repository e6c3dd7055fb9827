package graft.functions

import graft.kernel.SparkSpec

/** The shared test session is built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (SparkSpec) —
  * this spec proves config-driven loading actually installed the family. */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions installs the graft function family") {
    val r = spark.sql(
      "SELECT graft_polyhash('abc') AS h, size(graft_shingles('a b c d e')) AS s, " +
        "graft_dot(array(cast(1.0 AS float), cast(2.0 AS float)), " +
        "          array(cast(3.0 AS float), cast(4.0 AS float))) AS d")
      .collect().head
    assert(r.getAs[Long]("h") == ((('a' * 31 + 'b') % 1000000007L) * 31 + 'c') % 1000000007L)
    assert(r.getAs[Int]("s") == 3)
    assert(r.getAs[Double]("d") == 11.0)
  }

  test("misuse fails analysis instead of reading garbage (strict input types)") {
    // graft_dot over array<double> would silently read wrong bytes via
    // getFloat without the ExpectsInputTypes guard
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array(1.0, 2.0), array(3.0, 4.0))").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("type"))
    // and a wrong-typed polyhash input (array instead of string)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_polyhash(array(1))").collect()
    }
  }
}
