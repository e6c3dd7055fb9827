package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives used by the text-analysis and dedup operators.
  *
  * Every helper has an exact DuckDB twin (the `Sql` variants) so oracle
  * queries stay engine-stable: identical integer arithmetic, identical
  * tokenization. Hashing is a 31-base polynomial over codepoints mod 1e9+7 —
  * pure int64 arithmetic that both engines evaluate exactly, unlike their
  * (different) built-in hash functions.
  */
object TextOps {

  val HashMod = 1000000007L

  /** lower+trim+whitespace-split tokenization. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")
  def tokensSql(e: String): String = s"string_split_regex(lower(trim($e)), '\\s+')"

  /** codepoints of a string as array<long> (split("") may yield a trailing
    * empty element in Spark — filtered; DuckDB's split never does). */
  def codepoints(c: Column): Column =
    transform(filter(split(c, ""), ch => length(ch) > 0), ch => ascii(ch).cast("long"))

  /** polynomial rolling hash: fold (acc*31 + codepoint) % (1e9+7). */
  def polyHash(c: Column): Column =
    aggregate(codepoints(c), lit(0L), (acc, x) => (acc * 31 + x) % HashMod)

  def polyHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(split($e, ''), ch -> CAST(unicode(ch) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $HashMod)"

  /** distinct word w-shingles (w consecutive tokens joined by one space);
    * empty when the doc has fewer than w tokens. */
  def shingles(toks: Column, w: Int = 3): Column =
    when(size(toks) >= w,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", (0 until w).map(o => element_at(toks, i + o)): _*))))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(toksE: String, w: Int = 3): String = {
    val parts = (0 until w).map(o => s"$toksE[i + $o]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(generate_series(1, len($toksE) - ${w - 1}), i -> $parts))"
  }

  /** Sum of a double-list; both sides fold left with a prepended 0. */
  def sumSql(listE: String): String =
    s"list_reduce(list_prepend(0.0, $listE), (sx, sy) -> sx + sy)"
}
