package graft.operators

import graft.kernel.SparkSpec
import org.apache.spark.sql.functions._

/** Quality and structure pins for s09 IVF-PQ that the oracle hash can't
  * isolate: the hash proves Spark and DuckDB agree, not that the
  * quantizer is any good — recall against the exact-in-cell ranking is
  * the quality statement (the s07 lesson, applied to PQ), and it only
  * holds because the codebooks quantize RESIDUALS (the label-mean
  * codebook variant measured 0.19 here before the residual rewrite). */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s09 ADC top-k recalls the exact-in-cell ranking well above the naive-PQ floor") {
    val adc = Similarity.s09IvfPqAdc.fn(spark, sf)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("__hit"))
    // s05 ranks the SAME candidate set (the probe's cell) by exact cosine —
    // the ground truth ADC approximates; recall@5 against it isolates the
    // quantization error from the cell-pruning error (s07 owns the latter)
    val exact = Similarity.s05IvfSearch.fn(spark, sf)
      .select(col("probe_id"), col("neighbor_id"))
    val n = exact.count()
    assert(n > 0, "no exact-in-cell neighbors — recall is vacuous")
    val hits = exact.join(adc, Seq("probe_id", "neighbor_id"), "left")
      .agg(sum(coalesce(col("__hit"), lit(0L)))).head.getLong(0)
    val recall = hits.toDouble / n
    // measured 0.46 at sf0.001 with M=8, k=16 residual codebooks (vs 0.19
    // for label-mean codebooks); the margin absorbs codebook retuning, not
    // a quantizer regression
    assert(recall >= 0.35, f"s09 recall@5 vs exact-in-cell fell to $recall%.3f (< 0.35)")
  }

  test("s13 SQ8 integer ranking recalls the exact-in-cell cosine ranking") {
    val sq = Similarity.s13Sq8Search.fn(spark, sf)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("__hit"))
    // s05 ranks the SAME candidate set (the probe's cell) by exact cosine —
    // recall against it isolates the 8-bit quantization error from the
    // cell-pruning error (s14/s07 own the latter)
    val exact = Similarity.s05IvfSearch.fn(spark, sf)
      .select(col("probe_id"), col("neighbor_id"))
    val n = exact.count()
    assert(n > 0, "no exact-in-cell neighbors — recall is vacuous")
    val hits = exact.join(sq, Seq("probe_id", "neighbor_id"), "left")
      .agg(sum(coalesce(col("__hit"), lit(0L)))).head.getLong(0)
    val recall = hits.toDouble / n
    // 8 bits/dim on normalized vectors loses far less than PQ's 4-bit
    // subspaces (s09 pins 0.35 here; the per-dim AFFINE quantizer this
    // replaced measured 0.20 — offsets don't cancel in a dot product);
    // s14 confirms end-to-end: SQ8 recall vs global truth ≈ the exact
    // in-cell families' (0.23 vs s10's 0.21 at sf0.01)
    assert(recall >= 0.75, f"s13 recall@5 vs exact-in-cell fell to $recall%.3f (< 0.75)")
  }

  test("s13 SQ8 scores stay in the integer envelope and are deterministic") {
    val out = Similarity.s13Sq8Search.fn(spark, sf).cache()
    try {
      assert(out.count() > 0)
      // symmetric 8-bit dot: |qdot| ≤ dims·127² — a violation means the
      // quantizer left the int8 range (both engines would agree on garbage)
      val mm = out.agg(min(col("qdot")), max(col("qdot"))).head
      assert(mm.getLong(0) >= -64L * 127 * 127 && mm.getLong(1) <= 64L * 127 * 127,
        s"qdot out of the int8 envelope: $mm")
      val again = Similarity.s13Sq8Search.fn(spark, sf)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty,
        "s13 is not deterministic across invocations")
    } finally out.unpersist()
  }

  test("s09 quantization is non-vacuous and deterministic") {
    val out = Similarity.s09IvfPqAdc.fn(spark, sf).cache()
    try {
      assert(out.count() > 0)
      // every subspace actually uses MULTIPLE codes (a collapsed codebook
      // would still hash-match the oracle — both engines would agree on
      // garbage)
      (0 until 8).foreach { m =>
        val used = out.select(col(s"c$m")).distinct().count()
        assert(used > 1, s"subspace $m uses $used code(s) — codebook collapsed")
      }
      // run-twice determinism: codebook training passes through driver-side
      // collects (the s08 hazard) — a second invocation must pick the
      // identical neighbors and codes
      val again = Similarity.s09IvfPqAdc.fn(spark, sf)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty,
        "s09 is not deterministic across invocations")
    } finally out.unpersist()
  }
}
