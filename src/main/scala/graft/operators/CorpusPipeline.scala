package graft.operators

import org.apache.spark.sql.functions._
import graft.queries.QueryDef

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
      .join(keepers, Seq("doc_id"))
      .filter(col("quality_score") >= QualityThreshold)
      .select(col("doc_id"), col("quality_score"))
  }

  val all: Seq[QueryDef] = Seq(c01CorpusClean)
}
