package graft.functions

import scala.collection.mutable

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
  * The buffer is a MUTABLE HashMap, updated in place — the Aggregator
  * contract explicitly allows `reduce`/`merge` to modify and return their
  * buffer. A decrement round is still O(capacity) traversal (inherent to
  * Misra-Gries; amortized O(1) per row, since rounds happen at most
  * n/capacity times), but it no longer ALLOCATES a fresh capacity-entry
  * map per untracked row the way an immutable `.map(...).toMap` rebuild
  * did — on an adversarial mostly-distinct stream that rebuild made every
  * input row pay capacity allocations.
  *
  * Runs under ObjectHashAggregate (not whole-stage codegen) — the same
  * engine tier as `approx_percentile`/`collect_list`; map-side partial
  * aggregation still applies, which is the point.
  */
final class HeavyHitters(capacity: Int)
    extends Aggregator[Long, mutable.HashMap[Long, Long], Map[Long, Long]] {
  require(capacity > 0)

  def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty

  def reduce(b: mutable.HashMap[Long, Long], key: Long): mutable.HashMap[Long, Long] = {
    b.get(key) match {
      case Some(c) => b.update(key, c + 1L)
      case None if b.size < capacity => b.update(key, 1L)
      case None =>
        // decrement-all: drop one "vote" from every tracked key, in place
        b.mapValuesInPlace((_, c) => c - 1L)
        b.filterInPlace((_, c) => c > 0L)
    }
    b
  }

  def merge(a: mutable.HashMap[Long, Long],
            b: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    // fold the smaller side into the larger — merge cost tracks the
    // smaller summary, and either argument may be mutated per the contract
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    from.foreach { case (k, c) => into.update(k, into.getOrElse(k, 0L) + c) }
    if (into.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything — the
      // standard mergeable-MG step, preserving the n/capacity error bound
      val cut = into.valuesIterator.toIndexedSeq.sorted(
        Ordering[Long].reverse)(capacity)
      into.mapValuesInPlace((_, c) => c - cut)
      into.filterInPlace((_, c) => c > 0L)
    }
    into
  }

  def finish(b: mutable.HashMap[Long, Long]): Map[Long, Long] = b.toMap

  // ExpressionEncoder keeps both as real Catalyst MapType values (kryo
  // would make the output an opaque binary blob the query couldn't explode)
  def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
}
