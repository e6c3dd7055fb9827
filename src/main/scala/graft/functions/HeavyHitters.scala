package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]] — the §2.9
  * custom-aggregate surface (the reference needs none; this is the engine
  * extension a 100 TB pipeline does need).
  *
  * Finding the top-k hottest keys with `groupBy(key).count()` shuffles
  * EVERY distinct key — at 1e9 keys that's the whole corpus re-keyed just
  * to read off 10 rows. The sketch aggregates each partition into a
  * bounded `capacity`-entry summary and merges summaries: one shuffle of
  * (numPartitions × capacity) entries, independent of key cardinality.
  *
  * Guarantees (standard Misra-Gries): every key with true frequency
  * > n/capacity survives, and each reported count is an underestimate by
  * at most n/capacity. With `capacity` ≥ distinct-key-count the sketch is
  * EXACT — which is what lets the q28 query hash-match a plain-SQL oracle
  * at test scale while keeping the bounded-memory shape for real scale.
  *
  * Runs under ObjectHashAggregate (not whole-stage codegen) — the same
  * engine tier as `approx_percentile`/`collect_list`; map-side partial
  * aggregation still applies, which is the point.
  */
final class HeavyHitters(capacity: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(capacity > 0)

  def zero: Map[Long, Long] = Map.empty

  def reduce(b: Map[Long, Long], key: Long): Map[Long, Long] =
    b.get(key) match {
      case Some(c) => b.updated(key, c + 1L)
      case None if b.size < capacity => b.updated(key, 1L)
      case None =>
        // decrement-all: drop one "vote" from every tracked key
        b.iterator.map { case (k, c) => k -> (c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val combined = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest count from everything — the
      // standard mergeable-MG step, preserving the n/capacity error bound
      val cut = combined.valuesIterator.toIndexedSeq.sorted(
        Ordering[Long].reverse)(capacity)
      combined.iterator.map { case (k, c) => k -> (c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  def finish(b: Map[Long, Long]): Map[Long, Long] = b

  // ExpressionEncoder keeps both as real Catalyst MapType values (kryo
  // would make the output an opaque binary blob the query couldn't explode)
  def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
}
