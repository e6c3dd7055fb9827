package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

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

  /** The integer-BM25 scoring chain shared by t18 (ranks with it) and s15
    * (fuses its top-N list), SQL side: the docs_t/st/tf/df/dl CTEs plus
    * the scored agg, returned as a WITH-body fragment the caller embeds
    * (no leading `WITH` — s15 prepends its vector CTEs). Factored here
    * (ADVICE r13 #2) so the quantized constants (1e6 idf scale, 44/20/6/18
    * from clearing k1 = 1.2, b = 0.75 by 20·T, 1e3 tf scale) and the
    * chain's shape live in ONE place per engine — an adjustment to t18's
    * formula now reaches s15 by construction instead of by diligence.
    * See t18's scaladoc for the arithmetic's derivation. */
  private[operators] def bm25Sql(scoredCte: String, withHitCount: Boolean): String = {
    val toks = tokensSql("text")
    val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    val hit = if (withHitCount) "\n    CAST(count(*) AS BIGINT) AS n_terms_hit," else ""
    s"""docs_t AS (SELECT doc_id, $toks AS toks FROM documents),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(len(toks)) AS BIGINT) AS tt FROM docs_t),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM docs_t)
       |  WHERE term IN ($termList) GROUP BY doc_id, term),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs_t),
       |$scoredCte AS (
       |  SELECT tf.doc_id,$hit
       |    CAST(sum(
       |      (((2 * st.n - 2 * df.df + 1) * 1000000) // (2 * df.df + 1)) *
       |      ((44 * st.tt * tf.tf * 1000) //
       |       (20 * st.tt * tf.tf + 6 * st.tt + 18 * dl.dl * st.n))
       |    ) AS BIGINT) AS score
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       |  GROUP BY tf.doc_id)""".stripMargin
  }

  /** Spark twin of [[bm25Sql]]: the scored frame
    * `(doc_id, n_terms_hit, score)` — callers rank/trim it (t18 top-k
    * with the hit count, s15 top-N dropping it; column pruning removes
    * what a caller does not project). The tf agg filters query terms AT
    * THE EXPLODE (map-side, before any shuffle); df is |terms| rows
    * (broadcast); N and T are two bounded scan-agg scalars inlined as
    * literals (t13's convention — a 1-row cross join would plan as the
    * BNLJ the gate forbids). An EMPTY corpus makes sum(len) NULL — tt
    * degrades to 0 (the frame is empty anyway, nothing divides) so the
    * builder mirrors the oracle's graceful empty-CTE semantics instead of
    * NPEing at plan-build time (ADVICE r13 #4). */
  private[operators] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    // materialized tokenized frame (optimization round 17): docsT feeds
    // the corpus-stats scalar, the tf branch AND the doc-length branch —
    // un-cached, the tokenize pass ran three times per invocation
    val docsT = Dedup.materialized(Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks")))
    val st = docsT.agg(count(lit(1)), sum(size(col("toks")).cast("long"))).head()
    val n = st.getLong(0)
    val tt = if (st.isNullAt(1)) 0L else st.getLong(1)
    val tf = docsT.select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfF = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = docsT.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val idfQ = expr(s"((${2 * n}L - 2L * df + 1L) * 1000000L) DIV (2L * df + 1L)")
    val tfnQ = expr(s"(${44 * tt}L * tf * 1000L) DIV " +
      s"(${20 * tt}L * tf + ${6 * tt}L + 18L * dl * ${n}L)")
    tf.join(broadcast(dfF), Seq("term"))
      .join(dl, Seq("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(idfQ * tfnQ).as("score"))
  }
}
