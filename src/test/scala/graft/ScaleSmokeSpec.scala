package graft

import graft.kernel.SparkSpec

/** Test-the-test for the ×10 scale gate (round-7 verdict item #3): the
  * ratcheted per-query bounds must actually FAIL on the regression the
  * blanket `1.2 × Copies` bound waved through. Pure-function checks —
  * the full gate run lives in `runMain graft.ScaleSmoke`. */
class ScaleSmokeSpec extends SparkSpec {

  test("an injected superlinear regression fails the ratcheted gate") {
    // the round-6 verdict's concrete example: d03 recorded 4.8×; a drift
    // to 11× is a real quadratic-ish regression and must now trip
    assert(ScaleSmoke.ratioViolation("d03_dedup_minhash", 11.0).isDefined,
      "d03 at 11× passed the gate — the ratchet is not biting")
    // every recorded ratio (the committed quiet-run history) still passes
    val recorded = Map(
      "q22_kernel_full" -> 1.395, "q21_rule_match" -> 1.707,
      "d02_dedup_ngram" -> 3.167, "d03_dedup_minhash" -> 4.810,
      "d07_dedup_keeper" -> 3.239, "c01_corpus_clean" -> 2.600,
      "q29_moving_agg" -> 2.086, "q15_sessionize" -> 1.650)
    recorded.foreach { case (n, r) =>
      assert(ScaleSmoke.ratioViolation(n, r).isEmpty, s"$n at its recorded $r× fails its own bound")
    }
    // round-7 entries are ratcheted from their first committed run
    // (1.614 / 1.244 → floor 3.0)
    assert(ScaleSmoke.ratioViolation("d12_keeper_star_deep", 2.9).isEmpty)
    assert(ScaleSmoke.ratioViolation("d12_keeper_star_deep", 3.1).isDefined)
    assert(ScaleSmoke.ratioViolation("e1_write_month", 3.1).isDefined)
    assert(ScaleSmoke.ratioViolation("s02_ann_lsh", 3.1).isDefined)
    // unknown queries (no history) fall back to the blanket linear bound
    assert(ScaleSmoke.ratioViolation("not_a_gate_query", 11.9).isEmpty)
    assert(ScaleSmoke.ratioViolation("not_a_gate_query", 12.1).isDefined)
  }

  test("docs/SCALE.md is current (generated from the code that writes the artifacts)") {
    val p = java.nio.file.Paths.get("docs/SCALE.md")
    assert(java.nio.file.Files.exists(p),
      "docs/SCALE.md missing — run `sbt \"runMain graft.CatalogDoc\"`")
    assert(java.nio.file.Files.readString(p) == ScaleSmoke.scaleDoc,
      "docs/SCALE.md is stale — regenerate with `sbt \"runMain graft.CatalogDoc\"`")
  }

  test("candidate-pair accounting: stop-list can only shrink the candidate mass") {
    val (naive, stopped, docs) =
      graft.operators.Dedup.candidatePairStats(spark, "/root/testdata/sf0.001")
    assert(docs > 0 && naive >= stopped && stopped >= 0)
    // calibration for the adversarial gate's 128/doc bound: candidate
    // mass counts per-shingle multiplicity, so each doc's ~70-shingle
    // twin overlap puts the HEALTHY corpus at ~74/doc — inside 128/doc,
    // with the adversarial regime (×Copies per doc) far outside it
    assert(stopped <= 128L * docs, s"base corpus exceeds 128 pairs/doc: $stopped / $docs")
    assert(stopped >= 32L * docs,
      s"base candidate mass $stopped is far below the expected twin-overlap scale — calibration drifted")
  }
}
