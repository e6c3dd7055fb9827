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

  /** polynomial rolling hash: fold (acc*31 + codepoint) % (1e9+7).
    * Implemented as a custom expression (one compiled loop per row) — the
    * higher-order-function fold walks the interpreted tree per character. */
  def polyHash(c: Column): Column = graft.functions.VectorFunctions.polyHashFast(c)

  def polyHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(split($e, ''), ch -> CAST(unicode(ch) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $HashMod)"

  /** distinct word w-shingles (w consecutive tokens joined by one space);
    * empty when the doc has fewer than w tokens. Takes the NORMALIZED TEXT
    * (not a token array): one compiled pass — see
    * VectorFunctions.WordShingles for why the composed form is pathological. */
  def shingles(normalizedText: Column, w: Int = 3): Column =
    graft.functions.VectorFunctions.wordShingles(normalizedText, w)

  def shinglesSql(toksE: String, w: Int = 3): String = {
    val parts = (0 until w).map(o => s"$toksE[i + $o]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(generate_series(1, len($toksE) - ${w - 1}), i -> $parts))"
  }

  /** Sum of a double-list; both sides fold left with a prepended 0. */
  def sumSql(listE: String): String =
    s"list_reduce(list_prepend(0.0, $listE), (sx, sy) -> sx + sy)"

  /** The fixed query term set shared by t18's BM25 ranking and s15's
    * hybrid fusion. Lives here (not in TextAnalysis) because Similarity's
    * initializer needs it: TextAnalysis → Dedup → Similarity is the object
    * init order, so a Similarity val reading a TextAnalysis val would
    * observe null mid-initialization. */
  private[operators] val Bm25Terms = Seq("vector", "stream", "hash", "window")
}
