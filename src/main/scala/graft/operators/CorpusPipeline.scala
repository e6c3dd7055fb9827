package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.tables.Tables

/** End-to-end corpus cleaning — the composition a training-data pipeline
  * actually ships: near-dup KEEPER selection (d07: MinHash pairs → connected
  * components → min-id keeper) ∩ quality filter (t02's score ≥ threshold).
  * Output is the cleaned corpus membership: one row per surviving document.
  *
  * Composes the existing operators' own oracles (the d07 recursive-CTE
  * closure nests inside a CTE), so correctness of the composition is checked
  * end-to-end, not just per stage. 100 TB shape: both inputs are keyed by
  * doc_id; the join is a plain equi-join shuffle on doc_id (or co-partitioned
  * for free if both sides persist bucketed by doc_id).
  */
object CorpusPipeline {

  /** Keep threshold for t02's quality_score. The synthetic corpus's score
    * mass sits ≈0.3–0.45 (stop_ratio is low for random-vocab text), so 0.35
    * keeps a real fraction of documents — a cutoff above the mass (e.g. 0.5)
    * makes the keeper∩quality join vacuously empty and the oracle check
    * proves only schema. PlanSpec pins non-emptiness on the fixture. */
  private[operators] val QualityThreshold = 0.35

  /** c01 — cleaned-corpus membership: d07 near-dup keepers ∩ t02 quality ≥
    * threshold, one equi-join on doc_id. The keeper side carries a
    * `shuffle_hash` hint: both sides are corpus-scale (a keeper per
    * surviving doc), so letting stats pick a broadcast here builds a
    * corpus-sized hash relation on the driver — observed as transient
    * broadcast-build OOMs in the ×10 gate's tight 4 GiB heap, and flatly
    * wrong at 100 TB. A doc_id-keyed shuffle join is the honest shape
    * (co-partitioned for free if both sides persist bucketed by doc_id). */
  val c01CorpusClean = QueryDef(
    "c01_corpus_clean",
    s"""WITH q AS (${TextAnalysis.t02Quality.oracle.get.replace("\n", "\n  ")}),
       |k AS (${Dedup.d07DedupKeeper.oracle.get.replace("\n", "\n  ")})
       |SELECT q.doc_id, q.quality_score
       |FROM q JOIN k ON k.doc_id = q.doc_id
       |WHERE k.is_keeper = 1 AND q.quality_score >= $QualityThreshold""".stripMargin) { (s, d) =>
    val keepers = Dedup.d07DedupKeeper.fn(s, d)
      .filter(col("is_keeper") === 1).select(col("doc_id"))
    val quality = TextAnalysis.t02Quality.fn(s, d)
      .select(col("doc_id"), col("quality_score"))
    quality
      .join(keepers.hint("shuffle_hash"), Seq("doc_id"))
      .filter(col("quality_score") >= QualityThreshold)
      .select(col("doc_id"), col("quality_score"))
  }

  private val RepetitionCap = 0.08
  private val GateLang = "en"

  /** c02 — the Gopher-style per-document quality GATE: quality score ≥
    * threshold ∧ repetition ≤ cap ∧ language-ID agreement, all from ONE
    * materialized token array in ONE scan — zero joins, zero shuffles
    * (PlanSpec asserts no Exchange). This is the other half of corpus
    * cleaning: c01 removes near-DUPLICATES (needs the pair/cluster joins),
    * c02 removes low-QUALITY rows (pure row-local signals — at 100 TB this
    * is a map-only pass, the cheapest possible shape). The oracle composes
    * the t02/t09/t03 oracles by doc_id join, pinning that the fused
    * single-pass signals equal the standalone operators'. */
  val c02QualityGate = QueryDef(
    "c02_quality_gate",
    s"""WITH q AS (${TextAnalysis.t02Quality.oracle.get.replace("\n", "\n  ")}),
       |r AS (${TextAnalysis.t09Repetition.oracle.get.replace("\n", "\n  ")}),
       |l AS (${TextAnalysis.t03LangId.oracle.get.replace("\n", "\n  ")})
       |SELECT q.doc_id, q.quality_score, r.rep_ratio, l.predicted_lang
       |FROM q JOIN r ON r.doc_id = q.doc_id JOIN l ON l.doc_id = q.doc_id
       |WHERE q.quality_score >= $QualityThreshold
       |  AND r.rep_ratio <= $RepetitionCap
       |  AND l.predicted_lang = '$GateLang'""".stripMargin) { (s, d) =>
    import graft.queries.Stable
    import TextAnalysis.{langMarkers, stopwords}
    val toks = col("toks")
    val n = size(toks)
    // t02's quality formula, verbatim over the shared token array
    val nTok = n.cast("double")
    val stopRatio = size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / n
    val diversity = size(array_distinct(toks)).cast("double") / n
    val lengthPrior = least(nTok / 100.0, lit(1.0))
    val quality = Stable.r4(
      lit(0.4) * stopRatio + lit(0.3) * diversity + lit(0.3) * lengthPrior)
    // t09's repetition formula
    val dups = when(n >= 2,
      size(filter(sequence(lit(1), n - 1),
        i => element_at(toks, i) === element_at(toks, i + 1))))
      .otherwise(lit(0))
    val rep = Stable.r4(
      when(n > 1, dups.cast("double") / (n - 1)).otherwise(lit(0.0)))
    // t03's marker-score language ID (scores materialized once, as in t03)
    def score(ws: Seq[String]) = size(filter(toks, t => t.isin(ws: _*))).cast("long")
    // __barrier (non-deterministic, always ≥ 0, dropped below) pins the
    // gate ABOVE this projection: predicate pushdown otherwise rewrites the
    // filter through both projects, re-inlining the tokenizing split ~10×
    // into one giant scan-level condition (observed 5s vs ~1s at sf0.1).
    // Pushdown requires every project field to be deterministic, so the
    // barrier blocks it — but ONLY while the column is referenced (unused ⇒
    // pruned ⇒ project deterministic again), hence the no-op `>= 0`
    // conjunct in the filter (isNotNull would constant-fold away).
    val scored = graft.tables.Tables.documents(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select((Seq(col("doc_id"), toks, quality.as("quality_score"), rep.as("rep_ratio")) ++
        langMarkers.map { case (l, ws) => score(ws).as(s"score_$l") } :+
        monotonically_increasing_id().as("__barrier")): _*)
    val g = greatest(langMarkers.map(l => col(s"score_${l._1}")): _*)
    val predicted = langMarkers.tail.foldLeft(
      when(col("score_en") === g, "en")) { case (acc, (l, _)) =>
      acc.when(col(s"score_$l") === g, l)
    }
    scored
      .withColumn("predicted_lang", predicted)
      .filter(col("quality_score") >= QualityThreshold &&
        col("rep_ratio") <= RepetitionCap &&
        col("predicted_lang") === GateLang &&
        col("__barrier") >= 0)
      .select(col("doc_id"), col("quality_score"), col("rep_ratio"),
        col("predicted_lang"))
  }

  /** c03 — the FULL pre-training data pipeline as ONE declared plan:
    * quality gate (c02, map-only) ∩ exact-dedup keepers (d01, one
    * content-hash shuffle) → context-window chunking of the survivors
    * (t14, per-row explode) → shard packing of the CHUNKS (t08's
    * two-level bucketed running sum). A user of this library runs their
    * whole corpus-to-shards flow as one `DataFrame`; Catalyst fuses the
    * stages (the gate's row-local predicates evaluate in the same stage
    * as the chunk explode — nothing materializes between operators), and
    * the oracle composes the stage oracles verbatim, so the COMPOSITION
    * is hash-checked end-to-end, not just each stage alone.
    *
    * 100 TB shape, stage by stage: gate = zero-shuffle map; keeper
    * semi-join = one equi-join on doc_id against the md5-group keepers
    * (the d01 aggregate is corpus-sized pre-agg, Zipf-free keys); chunk =
    * no shuffle, rides the survivors; packing = one bucket-keyed window
    * (ShardBuckets-way parallel, never a global sort). Chunking AFTER the
    * gate+dedup matters at scale: the explode multiplies rows ~n/stride,
    * so filtering first keeps the widest stage the smallest. */
  val c03PipelineToShards = QueryDef(
    "c03_pipeline_to_shards", {
      import TextAnalysis.{ChunkStride, ChunkTokens, ShardBuckets, ShardTokenBudget}
      val toks = graft.operators.TextOps.tokensSql("text")
      s"""WITH gate AS (${c02QualityGate.oracle.get.replace("\n", "\n  ")}),
         |keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |surv AS (SELECT gate.doc_id FROM gate JOIN keep ON keep.doc_id = gate.doc_id),
         |chunked AS (
         |  SELECT doc_id,
         |    start // $ChunkStride AS chunk_idx,
         |    len(($toks)[start + 1 : start + $ChunkTokens]) AS n_chunk_tokens
         |  FROM (
         |    SELECT doc_id, text,
         |           unnest(generate_series(0, len($toks) - 1, $ChunkStride)) AS start
         |    FROM documents JOIN surv USING (doc_id))),
         |packed AS (
         |  SELECT doc_id, chunk_idx, n_chunk_tokens,
         |         doc_id % $ShardBuckets AS bucket,
         |         CAST(sum(n_chunk_tokens) OVER (PARTITION BY doc_id % $ShardBuckets
         |                                        ORDER BY doc_id, chunk_idx) AS BIGINT) AS cum
         |  FROM chunked)
         |SELECT doc_id, chunk_idx, n_chunk_tokens,
         |  CAST(floor((cum - n_chunk_tokens) / $ShardTokenBudget) * $ShardBuckets + bucket AS BIGINT) AS shard_id
         |FROM packed""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import TextAnalysis.{ShardBuckets, ShardTokenBudget}
    // every side of these joins is corpus-scale (one row per surviving
    // doc) — shuffle_hash pins the shape that cannot OOM a driver build
    // (the c01 lesson); all three shuffles share the doc_id key
    val gate = c02QualityGate.fn(s, d).select(col("doc_id"))
    val keepers = Dedup.d01Exact.fn(s, d).select(col("keeper").as("doc_id"))
    val surviving = gate.join(keepers.hint("shuffle_hash"), Seq("doc_id"))
    val docs = Tables.documents(s, d).join(surviving.hint("shuffle_hash"), Seq("doc_id"))
    val chunks = TextAnalysis.chunkDocs(docs)
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"))
    val w = Window.partitionBy("bucket").orderBy("doc_id", "chunk_idx")
    chunks
      .withColumn("bucket", col("doc_id") % ShardBuckets)
      .withColumn("cum", sum(col("n_chunk_tokens")).over(w))
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
        (floor((col("cum") - col("n_chunk_tokens")) / ShardTokenBudget) * ShardBuckets +
          col("bucket")).cast("long").as("shard_id"))
  }

  /** c03's OPTIONAL HTML PRE-STAGE (round-13 verdict #5 — the stage a
    * real web-corpus pipeline runs before any quality gate): given raw
    * pages (doc_id, html, lang, source), t26's extraction yields the
    * documents-shaped frame the pipeline stages consume — extracted main
    * text (boilerplate lines already pruned) in place of `text`. Pure
    * per-row projection: Catalyst fuses it into the gate's scan stage, so
    * running corpus-to-shards over HTML input costs one regex chain per
    * page on top of c03's own plan, zero extra shuffles.
    * CorpusPipelineSpec pins round-trip fidelity: pages synthesized from
    * clean text ([[TextAnalysis.htmlPage]]) recover the identical token
    * stream through this stage. */
  private[graft] def htmlPreStage(pages: DataFrame): DataFrame =
    pages.select(
      col("doc_id"),
      TextAnalysis.htmlExtractText(col("html")).as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  val all: Seq[QueryDef] = Seq(c01CorpusClean, c02QualityGate, c03PipelineToShards)
}
