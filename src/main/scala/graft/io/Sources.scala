package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S1–S4/S6 — database source/sink parity (SURVEY.md §2.1). The reference's
  * primary I/O is a database client: query→rows / query→DataFrame reads
  * (client/clickhouse_client.py:43-53) and a chunked 37-column insert
  * (client/clickhouse_client.py:84-129). On Spark the same surface is the
  * built-in JDBC relation, which replaces the reference's hand-rolled
  * plumbing wholesale:
  *
  *  - predicate/column pushdown: filters on the DataFrame compile into the
  *    remote WHERE clause (`PushedFilters` in the plan) and only selected
  *    columns are fetched — the reference re-sends full SQL text per query;
  *  - S3's 10k-row cursor chunking: reads stream via `fetchsize`, writes
  *    batch via `batchsize` — both per-partition, not per-connection;
  *  - S4's second-connection workaround: connections are per-task by
  *    construction, so concurrent reads never share a cursor;
  *  - parallelism: [[Partitioning]] splits the table into range predicates,
  *    one connection per partition — the scale knob a single-node client
  *    fundamentally lacks.
  */
object Sources {

  /** Range-partitioned read: `numPartitions` parallel connections, each
    * scanning `column` over one slice of [lowerBound, upperBound]. */
  final case class Partitioning(
      column: String, lowerBound: Long, upperBound: Long, numPartitions: Int)

  private def props(user: Option[String], password: Option[String],
                    fetchSize: Int): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    p.setProperty("fetchsize", fetchSize.toString)
    p
  }

  /** S1/S2 — table (or `(subquery) alias`) → DataFrame. */
  def readTable(
      spark: SparkSession,
      url: String,
      table: String,
      partitioning: Option[Partitioning] = None,
      user: Option[String] = None,
      password: Option[String] = None,
      fetchSize: Int = 10000): DataFrame = {
    val p = props(user, password, fetchSize)
    partitioning match {
      case Some(Partitioning(c, lo, hi, n)) =>
        spark.read.jdbc(url, table, c, lo, hi, n, p)
      case None =>
        spark.read.jdbc(url, table, p)
    }
  }

  /** S6 — batched insert (the reference's 10k-row chunk loop, as the JDBC
    * writer's per-partition `batchsize`). `SaveMode.Append` is the
    * reference's INSERT semantics; idempotency comes from the partition
    * delete-then-insert pattern upstream ([[graft.pipeline.Sink]]), not from
    * the insert itself. */
  def writeTable(
      df: DataFrame,
      url: String,
      table: String,
      user: Option[String] = None,
      password: Option[String] = None,
      batchSize: Int = 10000,
      mode: SaveMode = SaveMode.Append): Unit = {
    val p = props(user, password, fetchSize = batchSize)
    p.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, p)
  }
}
