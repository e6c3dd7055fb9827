package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key skew tooling (SURVEY.md §4: the reference's 15-day/1-day window
  * split for 14 hot accounts, main.py:86-104, is hand-rolled skew
  * accommodation — here it's a general salted join).
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is for
  * the shuffle AQE can't split — a hot key in a shuffle-hash/sort-merge
  * join against a non-broadcastable side, or a groupBy where one key
  * dominates. `saltedJoin` replicates the (smaller) right side `salt` ways
  * and scatters the left side uniformly, so a hot key's rows spread over
  * `salt` reducers instead of one.
  */
object Skew {

  /** Two-phase aggregation for a skewed groupBy: group on (keys + salt)
    * first — hot keys spread across `salt` partial groups — then merge.
    * `aggs` must be algebraic (sum/count/min/max style) for the merge to be
    * exact; pass the merge expression per output column. */
  /** Row-content salt: deterministic for a given row regardless of partition
    * layout — `monotonically_increasing_id`/`rand` are seeded per partition,
    * so a repartitioned retry could re-salt rows mid-stage (non-deterministic
    * shuffle keys are a known double-count/loss hazard under partial stage
    * retry). Known boundary: rows that are byte-identical in EVERY column
    * share one salt, so a hot key made of exact duplicate rows is not spread
    * — but that case is already handled upstream of the shuffle by map-side
    * partial aggregation (identical rows combine within each map task), so
    * the salt only needs to spread DISTINCT rows, which content hashing
    * does. */
  private def contentSalt(df: DataFrame, salt: Int): Column =
    pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salt))

  def saltedSum(df: DataFrame, keys: Seq[String], salt: Int,
                sumCols: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt", contentSalt(df, salt))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(sumCols.head).as(sumCols.head),
        sumCols.tail.map(c => sum(c).as(c)): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(sumCols.head).as(sumCols.head),
        sumCols.tail.map(c => sum(c).as(c)): _*)
  }

  /** Equi-join with the left side salted and the right side replicated
    * `salt` ways. Semantics equal `left.join(right, keys, joinType)` for
    * row-preserving join types (inner/left). Use when the right side is too
    * big to broadcast and the left's key distribution is skewed. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salted join is row-preserving only for inner/left, got $joinType")
    val saltedLeft = left.withColumn("__salt", contentSalt(left, salt))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft
      .join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
