package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for graft's custom expressions, so `spark.sql` users
  * get them too:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_polyhash(text) FROM docs")
  * }}}
  */
object GraftFunctions {

  import VectorFunctions._

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "graft_polyhash", exprs => PolyHash(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "graft_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "graft_shingles", exprs => WordShingles(exprs.head, 3), "scala_udf")
    registry.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHash28(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "graft_minhash_sig", exprs => MinHashSig(exprs.head, 16), "scala_udf")
    registry.createOrReplaceTempFunction(
      "graft_credits_pivot", exprs => CreditsPivot(exprs(0), exprs(1)), "scala_udf")
  }
}
