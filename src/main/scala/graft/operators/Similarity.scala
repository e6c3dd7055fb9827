package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.{QueryDef, Stable}
import graft.tables.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *  - s01 brute-force cosine top-k: the exact baseline. Probes × corpus via
  *    a broadcast of the (small) probe set — the corpus side never shuffles;
  *    ranking is a per-probe window.
  *  - s02 LSH-bucketed ANN: deterministic random-hyperplane bits → bucket
  *    (plane count corpus-scaled, 8 at the fixtures — see [[planesFor]]);
  *    probes only compare against same-bucket candidates (≈TargetBucket
  *    rows per probe at uniform spread), then exact cosine re-rank.
  *
  * 100 TB design: s01 is O(|probes|·|corpus|) — correct but only viable for
  * small probe sets; s02 is the scale path (bucket join = shuffle on an
  * 8-bit key; multi-probe/bit-flip variants raise recall the same way).
  * Vector math is `zip_with`/`aggregate` in double — codegen'd, no UDFs.
  */
object Similarity {

  import Dedup.{dotCol, dotSql, normCol, normSql}

  private[graft] val ProbeMod = 25 // vec_id % 25 == 0 ⇒ 4% of vectors are probes
  private val TopK = 5

  private[operators] def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), normCol(col("embedding")).as("nrm"))

  private[operators] val vecsSql =
    s"SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings"

  /** s01 — exact top-k neighbors for each probe vector. */
  val s01KnnBrute = QueryDef(
    "s01_knn_brute",
    s"""WITH e AS ($vecsSql),
       |p AS (SELECT * FROM e WHERE vec_id % $ProbeMod = 0),
       |scored AS (
       |  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
       |         ${dotSql("p.embedding", "e.embedding")} / (p.nrm * e.nrm) AS cos
       |  FROM p JOIN e ON p.vec_id <> e.vec_id),
       |ranked AS (
       |  SELECT probe_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT probe_id, rank, neighbor_id, ${Stable.sqlR4("cos")} AS cosine
       |FROM ranked WHERE rank <= $TopK""".stripMargin) { (s, d) =>
    val e = vecs(s, d)
    val p = e.filter(col("vec_id") % ProbeMod === 0)
    val cos = dotCol(col("p.embedding"), col("e.embedding")) / (col("p.nrm") * col("e.nrm"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(p.as("p")).join(e.as("e"), col("p.vec_id") =!= col("e.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("e.vec_id").as("neighbor_id"),
        cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        Stable.r4(col("cos")).as("cosine"))
  }

  // ---------- s02: random-hyperplane LSH buckets + exact re-rank ----------

  private val NumPlanes = 8
  private val Dims = 64

  /** Corpus-scaled hyperplane count (round-9 verdict #2): planes =
    * ceil(log2(corpus / [[TargetBucket]])) floored at the fixture's
    * [[NumPlanes]], so per-bucket occupancy stays ≈[[TargetBucket]] as the
    * corpus grows. A FIXED plane count is the recorded ×100 scale-killer:
    * candidates per probe grow linearly with the corpus (total candidate
    * mass quadratically) — s02 hit ratio 22.5 at ×100 vs ~3 for the linear
    * cohort. At the oracle fixtures (≤2000 vectors) this IS 8, so the
    * pinned DuckDB SQL stays valid; the ×10 gate corpus (20k) gets 12, the
    * ×100 demonstration (200k) 15. One cached parquet-metadata count job
    * per directory; the bucket join shape is unchanged — only the key
    * space widens. */
  private val TargetBucket = 8
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private[graft] def planesFor(s: SparkSession, d: String): Int =
    planeCache.computeIfAbsent(d, _ => {
      val n = Tables.embeddings(s, d).count()
      math.max(NumPlanes, math.ceil(
        math.log(math.max(1.0, n.toDouble / TargetBucket)) / math.log(2.0) - 1e-9).toInt)
    })

  /** Drop the cached corpus-scaled parameters for `d` (ADVICE r10: the
    * caches key by path alone, so a path whose embeddings are REGENERATED
    * with a different row count within one JVM — a scale-data rebuild, a
    * reused temp dir — would silently reuse the stale plane/bit count, and
    * on a fixture-sized corpus a stale >8 value reads as an opaque
    * cross-engine mismatch). Every writer of an embeddings table
    * (ScaleSmoke.ensureData, test data generators) calls this after the
    * write. */
  private[graft] def invalidateParamCaches(d: String): Unit = {
    planeCache.remove(d)
    cellBitsCache.remove(d)
    invalidatePqIndex(d)
  }

  /** Deterministic ±1 hyperplane matrix, SplitMix64-mixed per (plane, dim)
    * and MATERIALIZED AS LITERALS in both engines — the sign matrix is
    * planes×[[Dims]] values, tiny metadata, so neither engine needs the
    * mixing arithmetic in-plan. The round-10 lesson behind this: the old
    * "pure integer arithmetic" entry `((j·64+d)·2654435761) % 97` is a
    * LINEAR WALK with period 97 — consecutive planes were shifted copies
    * of each other (the top buckets were literally runs of 1-bits:
    * 4032, 504, 63), so a few sign-run buckets captured a constant
    * fraction of ANY corpus and occupancy grew linearly no matter how
    * many planes were added. The gate's `lsh_occupancy` assertion caught
    * it: 75 → 600 candidates/probe at ×10 under 12 planes; SplitMix
    * planes measure 10.8 → 8.4 — flat. */
  private def planeSign(j: Int, d: Int): Double = {
    var z = (j.toLong << 32) + d + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    if (z >= 0L) 1.0 else -1.0
  }
  private def planeRow(j: Int): Seq[Double] = (0 until Dims).map(planeSign(j, _))
  private def planeRowSql(j: Int): String =
    planeRow(j).map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  private[graft] def bucketCol(v: Column, planes: Int = NumPlanes): Column =
    (0 until planes).map { j =>
      val dot = aggregate(
        zip_with(v, typedlit(planeRow(j)), (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  private[operators] def bucketSql(v: String): String =
    (0 until NumPlanes).map { j =>
      val dot = TextOps.sumSql(
        s"list_transform(generate_series(0, ${Dims - 1}), " +
          s"dd -> CAST($v[dd + 1] AS DOUBLE) * (${planeRowSql(j)})[dd + 1])")
      s"(CASE WHEN ($dot) > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", "\n + ", ")")

  /** s02 — ANN: compare probes only to same-bucket candidates. */
  val s02AnnLsh = QueryDef(
    "s02_ann_lsh",
    s"""WITH e AS (
       |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
       |         ${bucketSql("embedding")} AS bucket
       |  FROM embeddings),
       |p AS (SELECT * FROM e WHERE vec_id % $ProbeMod = 0),
       |scored AS (
       |  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id, p.bucket,
       |         ${dotSql("p.embedding", "e.embedding")} / (p.nrm * e.nrm) AS cos
       |  FROM p JOIN e ON p.bucket = e.bucket AND p.vec_id <> e.vec_id),
       |ranked AS (
       |  SELECT probe_id, bucket, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT probe_id, bucket, rank, neighbor_id, ${Stable.sqlR4("cos")} AS cosine
       |FROM ranked WHERE rank <= $TopK""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d).select(
      col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"),
      bucketCol(col("embedding"), planesFor(s, d)).as("bucket"))
    val p = e.filter(col("vec_id") % ProbeMod === 0)
    val cos = dotCol(col("p.embedding"), col("e.embedding")) / (col("p.nrm") * col("e.nrm"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(p.as("p"))
      .join(e.as("e"),
        col("p.bucket") === col("e.bucket") && col("p.vec_id") =!= col("e.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("p.bucket").as("bucket"),
        col("e.vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("bucket"), col("rank"), col("neighbor_id"),
        Stable.r4(col("cos")).as("cosine"))
  }

  /** s04 — multi-probe ANN: each probe searches its own bucket PLUS the 8
    * buckets at hamming distance 1 (one hyperplane bit flipped) — the
    * standard recall knob for hyperplane LSH (a near neighbor lands across
    * a plane with probability θ/π per plane; probing 1-flip buckets
    * recovers exactly those). Still a bucket equi-join — the probe side
    * just carries 9 rows per probe instead of 1; candidate work scales
    * ≈9/256 of the corpus per probe, vs s01's full scan. The 9 probe
    * buckets are distinct, so no pair dedup is needed. */
  val s04AnnMultiProbe = QueryDef(
    "s04_ann_multiprobe",
    s"""WITH e AS (
       |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
       |         ${bucketSql("embedding")} AS bucket
       |  FROM embeddings),
       |p AS (SELECT * FROM e WHERE vec_id % $ProbeMod = 0),
       |pb AS (
       |  SELECT vec_id, embedding, nrm,
       |         CASE WHEN f = 0 THEN bucket
       |              ELSE xor(bucket, CAST(1 AS BIGINT) << (f - 1)) END AS pbucket
       |  FROM p CROSS JOIN (SELECT unnest(generate_series(0, $NumPlanes)) AS f)),
       |scored AS (
       |  SELECT pb.vec_id AS probe_id, e.vec_id AS neighbor_id,
       |         ${dotSql("pb.embedding", "e.embedding")} / (pb.nrm * e.nrm) AS cos
       |  FROM pb JOIN e ON pb.pbucket = e.bucket AND pb.vec_id <> e.vec_id),
       |ranked AS (
       |  SELECT probe_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT probe_id, rank, neighbor_id, ${Stable.sqlR4("cos")} AS cosine
       |FROM ranked WHERE rank <= $TopK""".stripMargin) { (s, d) =>
    val planes = planesFor(s, d)
    val e = Tables.embeddings(s, d).select(
      col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"),
      bucketCol(col("embedding"), planes).as("bucket"))
    val p = e.filter(col("vec_id") % ProbeMod === 0)
    val probeBuckets = col("bucket") +:
      (0 until planes).map(j => col("bucket").bitwiseXOR(lit(1L << j)))
    val pb = p.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(array(probeBuckets: _*)).as("pbucket"))
    val cos = dotCol(col("p.embedding"), col("e.embedding")) / (col("p.nrm") * col("e.nrm"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(pb.as("p"))
      .join(e.as("e"),
        col("p.pbucket") === col("e.bucket") && col("p.vec_id") =!= col("e.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("e.vec_id").as("neighbor_id"),
        cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        Stable.r4(col("cos")).as("cosine"))
  }

  /** s03 — per-label centroids (dimension-wise mean), the training step of a
    * real IVF index: posexplode → groupBy (label, dim) → mean. One shuffle
    * keyed by (label, dim) — 64·|labels| groups regardless of corpus size,
    * so this scales to any vector count. */
  val s03Centroids = QueryDef(
    "s03_centroids",
    s"""SELECT label, p AS dim_pos,
       |  ${Stable.sqlR4("avg(v)")} AS centroid
       |FROM (
       |  SELECT label, unnest(embedding) AS v,
       |         unnest(generate_series(1, len(embedding))) AS p
       |  FROM embeddings)
       |GROUP BY label, p""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).as("dim_pos"))
      .agg(Stable.r4(avg(col("v"))).as("centroid"))
  }

  /** Per-(vec row) scored centroid cells for IVF assignment. The ≤k
    * per-label centroids are bounded metadata (k·64 floats), so they are
    * collected ONCE at plan-build time (the monthsCache pattern) and inlined
    * as a literal array — assignment is then a pure per-row argmax
    * projection: no cross join, no window, no shuffle. Each array entry is
    * struct(c = cosine to that centroid, negCell = -label); struct ordering
    * compares (c, negCell) lexicographically, so max/sort give "cos DESC,
    * label ASC" — the oracle's tie-break — and `-negCell` recovers the
    * label. */
  private[operators] def centroidScoredCells(s: SparkSession, d: String): Column =
    scoredCellsFrom(centroidRows(s, d))

  /** The trained coarse quantizer as driver-side rows: (label, cvec,
    * cnorm) per cell, cnorm computed by the SAME Spark expression the
    * in-plan variant uses so a persisted copy (s16's spec file) replays
    * bit-identical literals. ONE s03 job — residualFrame and the scored
    * cells share the collect instead of each re-running the centroid agg. */
  /** Training-job call counters (test hooks): [[centroidRows]] runs the
    * s03 centroid jobs, [[trainSubCodebooks]] the Lloyd jobs. The s17
    * no-Lloyd pin snapshots both around a forced delta append — the
    * frozen-spec encode path must move NEITHER. */
  private[graft] val pqTrainCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] val centroidJobCalls = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The trained coarse quantizer, READ THROUGH the persisted index spec
    * when a valid one exists (round-14 verdict #5: s05/s06/s09/s13 re-ran
    * the s03 centroid jobs per JVM although s16's spec file already
    * persists the same values): spec present + fingerprint matching ⇒
    * the deserialized rows, which are raw-IEEE-bit round-trips of exactly
    * this function's training output — the plans built from either source
    * are literal-identical, so results cannot move. No spec (or a stale
    * one) ⇒ train as before; the fallback keeps every query standalone. */
  private[operators] def centroidRows(
      s: SparkSession, d: String): Seq[(Int, Seq[Float], Double)] =
    specMetaIfValid(s, d).map(_.cents).getOrElse(trainCentroidRows(s, d))

  private def trainCentroidRows(
      s: SparkSession, d: String): Seq[(Int, Seq[Float], Double)] = {
    centroidJobCalls.incrementAndGet()
    s03Centroids.fn(s, d)
      .groupBy("label")
      .agg(transform(
        sort_array(collect_list(struct(col("dim_pos"), col("centroid")))),
        x => x.getField("centroid").cast("float")).as("cvec"))
      .select(col("label"), col("cvec"), normCol(col("cvec")).as("cnorm"))
      .collect()
      .toIndexedSeq
      .map(r => (r.getInt(0), r.getSeq[Float](1).toSeq, r.getDouble(2)))
      .sortBy(_._1) // argmax/CASE are order-independent; the sort makes the persisted spec deterministic
  }

  /** [[centroidScoredCells]]'s literal-argmax column built from
    * already-materialized centroid rows (fresh from [[centroidRows]] or
    * deserialized from s16's index spec — the two sources carry identical
    * bits by construction). */
  private[operators] def scoredCellsFrom(
      cents: Seq[(Int, Seq[Float], Double)]): Column = {
    val centArr = array(cents.map { case (lab, cv, cn) =>
      struct(
        lit(lab).as("cell"),
        typedlit(cv).as("cvec"),
        lit(cn).as("cnorm"))
    }: _*)
    transform(centArr, cn => struct(
      (dotCol(col("embedding"), cn.getField("cvec")) /
        (col("nrm") * cn.getField("cnorm"))).as("c"),
      (-cn.getField("cell")).as("negCell")))
  }

  /** s05 — IVF search, completing s03's training step: build per-label
    * centroid vectors (4-decimal-stable means, cast to float so both engines
    * carry identical bits into the dot products), assign every vector to its
    * nearest centroid (k centroids broadcast — the ONLY cross join, constant
    * k rows), then each probe searches only its own cell + exact re-rank.
    *
    * 100 TB shape: assignment is a per-row map against a broadcast k-row
    * table (no shuffle of the corpus); the candidate join shuffles by cell
    * id — with k cells each probe touches ≈1/k of the corpus. Recall rises
    * with multi-cell probing exactly like s04's bucket flips. */
  /** Corpus-scaled SECOND-LEVEL coarse quantizer for the IVF family
    * (round-10, the s09 ×100 finding — same disease as the fixed LSH
    * plane count): with a FIXED 8-label cell set, per-cell occupancy
    * grows linearly with the corpus, so every probe's in-cell scan grows
    * linearly and total candidate work quadratically (s09 hit ratio 44 at
    * ×100). Each label cell is refined by `bits` extra SplitMix
    * hyperplane signs of the RAW vector — random-hyperplane partitioning
    * is itself a coarse quantizer, assignment stays a pure per-row
    * projection (no training, no join), and near neighbors co-locate
    * with the usual LSH probability. `bits` scales so refined-cell
    * occupancy stays ≈[[TargetCell]]: 0 at every oracle fixture (the
    * declared results are bit-identical there), 3 at ×10, 6 at ×100.
    * The RESIDUAL geometry is untouched — residuals still subtract the
    * LABEL centroid; only the candidate-join key refines. */
  private val TargetCell = 512
  private val RefinePlaneBase = 1000
  private val cellBitsCache = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private[operators] def cellRefineBits(s: SparkSession, d: String): Int =
    // read through the persisted index spec like [[centroidRows]]: the
    // recorded bit count was derived from the same (fingerprint-checked)
    // corpus, so it equals what the count job would recompute
    specMetaIfValid(s, d).map(_.bits).getOrElse(
      cellBitsCache.computeIfAbsent(d, _ => {
        val n = Tables.embeddings(s, d).count()
        math.max(0, math.ceil(math.log(
          math.max(1.0, n.toDouble / (8.0 * TargetCell))) / math.log(2.0) - 1e-9).toInt)
      }).intValue())
  /** Probe-side REFINEMENT multi-probe (round-11, from the gate's new
    * `ivf_recall` gauge): restricting a probe to its own refinement
    * sub-bucket costs recall the hyperplane way — a true neighbor lands
    * across a refinement plane with probability θ/π per bit, so at ×10
    * (bits=3) sampled recall read 0.21→0.08. The standard remedy is the
    * s04 pattern applied to the refinement bits: each probe row expands to
    * its own refined cell PLUS flip sub-buckets — all inside the SAME
    * label cell, so the IVF semantics (search your cell(s)) are unchanged
    * and the index side stays single-bucket.
    *
    * The flip RADIUS scales with the measured per-bit loss (round-12
    * verdict #3): one-bit flips hold recall at its fixture level through
    * bits = 3 (×10 read 0.20 ≈ base 0.21) but the miss probability
    * compounds per bit — at bits = 6 (×100) a true neighbor crosses ≥ 2
    * planes often enough that single-flip recall halved (0.108 vs 0.21).
    * From [[TwoBitFlipMinBits]] the probe ring therefore widens to
    * hamming radius 2 over the refinement bits: 1 + bits + C(bits,2)
    * sub-buckets — at bits = 6 that is 22/64 of the label cell (~3× the
    * single-flip candidate work, still shrinking as the corpus grows).
    * Below the threshold nothing changes, so every oracle fixture
    * (bits = 0) and the ×10 gate shape (bits = 3) keep their pinned plans,
    * results and ratchets; only the ×100 regime pays for the recall it
    * was measured to need. */
  private val TwoBitFlipMinBits = 5

  /** Corpus-gated nprobe for the BASE IVF entry (round-13 verdict #6):
    * radius-2 refinement flips recovered the within-cell loss at ×100
    * (s05 0.108 → 0.178) but the remaining gap to s06 (0.302) is the
    * nprobe=1 restriction itself — a true neighbor near a label-cell
    * boundary is simply in the other cell, which no refinement flip can
    * reach. From this bit count (the ×100 regime; every oracle fixture
    * has bits = 0 and the ×10 gate 3, so their pinned plans/results/
    * ratchets are untouched) each s05 probe searches its top-2 label
    * cells — s06's standard knob applied to the base entry, ~2× the
    * candidate work, still shrinking as a corpus fraction. */
  private val NProbe2MinBits = 5
  private def refineMultiProbe(df: DataFrame, bits: Int): DataFrame =
    if (bits == 0) df
    else {
      val oneBit = (0 until bits).map(j => 1L << j)
      val flips =
        if (bits >= TwoBitFlipMinBits)
          oneBit ++ (for (i <- 0 until bits; j <- i + 1 until bits)
            yield (1L << i) | (1L << j))
        else oneBit
      df.withColumn("cellr", explode(array(
        col("cellr") +: flips.map(m => col("cellr").bitwiseXOR(lit(m))): _*)))
    }

  private[operators] def refinedCellCol(cell: Column, v: Column, bits: Int): Column =
    if (bits == 0) cell
    else (0 until bits).map { i =>
      val dot = aggregate(
        zip_with(v, typedlit(planeRow(RefinePlaneBase + i)), (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _) + cell * lit(1L << bits)

  val s05IvfSearch = QueryDef(
    "s05_ivf_search", {
      val centroidSql = s03Centroids.oracle.get
      s"""WITH cents0 AS (${centroidSql.replace("\n", "\n  ")}),
         |cents AS (
         |  SELECT label,
         |         list_transform(list(centroid ORDER BY dim_pos), x -> CAST(x AS REAL)) AS cvec
         |  FROM cents0 GROUP BY label),
         |cn AS (SELECT label, cvec, ${normSql("cvec")} AS cnorm FROM cents),
         |e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
         |assigned AS (
         |  SELECT vec_id, embedding, nrm, cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, cn.label AS cell,
         |           row_number() OVER (
         |             PARTITION BY e.vec_id
         |             ORDER BY ${dotSql("e.embedding", "cn.cvec")} / (e.nrm * cn.cnorm) DESC,
         |                      cn.label) AS rn
         |    FROM e CROSS JOIN cn) WHERE rn = 1),
         |p AS (SELECT * FROM assigned WHERE vec_id % $ProbeMod = 0),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, p.cell, e2.vec_id AS neighbor_id,
         |         ${dotSql("p.embedding", "e2.embedding")} / (p.nrm * e2.nrm) AS cos
         |  FROM p JOIN assigned e2 ON p.cell = e2.cell AND p.vec_id <> e2.vec_id),
         |ranked AS (
         |  SELECT probe_id, cell, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY probe_id
         |                            ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT probe_id, cell, rank, neighbor_id, ${Stable.sqlR4("cos")} AS cosine
         |FROM ranked WHERE rank <= $TopK""".stripMargin
    }) { (s, d) =>
    val scoredCells = centroidScoredCells(s, d)
    val bits = cellRefineBits(s, d)
    val e = vecs(s, d)
    val assigned = e.select(col("vec_id"), col("embedding"), col("nrm"),
      (-array_max(scoredCells).getField("negCell")).as("cell"))
      .withColumn("cellr", refinedCellCol(col("cell"), col("embedding"), bits))
    // [[NProbe2MinBits]]: in the ×100 regime the probe side widens to its
    // top-2 label cells (the s06 explode); below it, the pinned
    // single-cell shape. Probed cells are distinct and every corpus
    // vector lives in exactly one, so no candidate dedup is needed.
    // The PROBED cell drives only the candidate-join key (cellr); the
    // output `cell` column keeps its declared meaning — the probe's
    // ASSIGNED cell — in both branches (ADVICE r14: the explode branch
    // used to leak the probed cell into the output column).
    val pBase =
      if (bits >= NProbe2MinBits)
        e.filter(col("vec_id") % ProbeMod === 0)
          .select(col("vec_id"), col("embedding"), col("nrm"),
            (-array_max(scoredCells).getField("negCell")).as("cell"),
            explode(transform(slice(array_sort(scoredCells), -NProbe, NProbe),
              x => -x.getField("negCell"))).as("probed_cell"))
          .withColumn("cellr", refinedCellCol(col("probed_cell"), col("embedding"), bits))
          .drop("probed_cell")
      else assigned.filter(col("vec_id") % ProbeMod === 0)
    val p = refineMultiProbe(pBase, bits)
    val cos = dotCol(col("p.embedding"), col("e.embedding")) / (col("p.nrm") * col("e.nrm"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(p.as("p"))
      .join(assigned.as("e"),
        col("p.cellr") === col("e.cellr") && col("p.vec_id") =!= col("e.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("p.cell").as("cell"),
        col("e.vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("cell"), col("rank"), col("neighbor_id"),
        Stable.r4(col("cos")).as("cosine"))
  }

  private val NProbe = 2

  /** s06 — IVF search with multi-cell probing (`nprobe` = 2): the corpus
    * keeps its single-cell assignment, but each probe searches its NProbe
    * NEAREST cells — the standard IVF recall knob (a true neighbor near a
    * cell boundary lands in the probe's 2nd-closest cell). Same plan shape
    * as s05: assignment is still a literal-centroid argmax projection (the
    * probe side just explodes its top-NProbe cells, NProbe rows per probe),
    * and the candidate join is still a cell equi-join touching ≈NProbe/k of
    * the corpus per probe. Probe cells are distinct and each corpus vector
    * lives in exactly one cell, so no candidate dedup is needed. */
  val s06IvfMultiProbe = QueryDef(
    "s06_ivf_multiprobe", {
      val centroidSql = s03Centroids.oracle.get
      s"""WITH cents0 AS (${centroidSql.replace("\n", "\n  ")}),
         |cents AS (
         |  SELECT label,
         |         list_transform(list(centroid ORDER BY dim_pos), x -> CAST(x AS REAL)) AS cvec
         |  FROM cents0 GROUP BY label),
         |cn AS (SELECT label, cvec, ${normSql("cvec")} AS cnorm FROM cents),
         |e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
         |assigned AS (
         |  SELECT vec_id, embedding, nrm, cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, cn.label AS cell,
         |           row_number() OVER (
         |             PARTITION BY e.vec_id
         |             ORDER BY ${dotSql("e.embedding", "cn.cvec")} / (e.nrm * cn.cnorm) DESC,
         |                      cn.label) AS rn
         |    FROM e CROSS JOIN cn) WHERE rn = 1),
         |pcells AS (
         |  SELECT vec_id, embedding, nrm, cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, cn.label AS cell,
         |           row_number() OVER (
         |             PARTITION BY e.vec_id
         |             ORDER BY ${dotSql("e.embedding", "cn.cvec")} / (e.nrm * cn.cnorm) DESC,
         |                      cn.label) AS rn
         |    FROM e CROSS JOIN cn
         |    WHERE e.vec_id % $ProbeMod = 0) WHERE rn <= $NProbe),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, e2.vec_id AS neighbor_id,
         |         ${dotSql("p.embedding", "e2.embedding")} / (p.nrm * e2.nrm) AS cos
         |  FROM pcells p JOIN assigned e2 ON p.cell = e2.cell AND p.vec_id <> e2.vec_id),
         |ranked AS (
         |  SELECT probe_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY probe_id
         |                            ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT probe_id, rank, neighbor_id, ${Stable.sqlR4("cos")} AS cosine
         |FROM ranked WHERE rank <= $TopK""".stripMargin
    }) { (s, d) =>
    val scoredCells = centroidScoredCells(s, d)
    val bits = cellRefineBits(s, d)
    val e = vecs(s, d)
    val assigned = e.select(col("vec_id"), col("embedding"), col("nrm"),
      (-array_max(scoredCells).getField("negCell")).as("cell"))
      .withColumn("cellr", refinedCellCol(col("cell"), col("embedding"), bits))
    // ascending struct sort ends with the best (cos DESC, label ASC) cells —
    // the last NProbe entries are exactly the oracle's rn <= NProbe
    val topCells = slice(array_sort(scoredCells), -NProbe, NProbe)
    val p = refineMultiProbe(
      e.filter(col("vec_id") % ProbeMod === 0)
        .select(col("vec_id"), col("embedding"), col("nrm"),
          explode(transform(topCells, x => -x.getField("negCell"))).as("cell"))
        .withColumn("cellr", refinedCellCol(col("cell"), col("embedding"), bits)),
      bits)
    val cos = dotCol(col("p.embedding"), col("e.embedding")) / (col("p.nrm") * col("e.nrm"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(p.as("p"))
      .join(assigned.as("e"),
        col("p.cellr") === col("e.cellr") && col("p.vec_id") =!= col("e.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("e.vec_id").as("neighbor_id"),
        cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        Stable.r4(col("cos")).as("cosine"))
  }

  // ---------- s07: ANN recall accounting (s02 measured against s01) ----------

  /** s07 — recall@k of the LSH ANN path (s02) against the exact top-k
    * ground truth (s01), per probe: `hits` = |exact ∩ ann|, `recall` =
    * hits/k. An approximate index without a standing recall measurement is
    * a guess — this makes the ANN quality a DECLARED, oracle-checked query
    * (both engines recompute the measurement end-to-end from the raw
    * embeddings), so an LSH regression (bad planes, broken bucketing)
    * trips the correctness gate, not just a benchmark eyeball.
    *
    * Both inputs are declared queries joined on (probe_id, neighbor_id) —
    * an equi-join over probes×k rows, negligible next to producing them.
    * The expensive side is s01's sanctioned brute-force subtree (broadcast
    * probes × corpus BNLJ, the d05-class baseline); at 100 TB recall is
    * measured the same way on a PROBE SAMPLE — the ground-truth scan
    * prices the measurement, the measurement stays O(sample × corpus),
    * and the ANN path under test (s02) keeps its bucket equi-join. */
  /** The s07 shape parameterized over the ANN surface under test (round-9
    * verdict #6): every approximate index family keeps a STANDING
    * oracle-checked recall gauge — without one, an IVF/PQ quality
    * regression (bad centroids, broken residuals) can't trip the
    * correctness gate. The ann query only needs (probe_id, neighbor_id)
    * columns; extra columns are projected away on both sides. */
  private def recallDef(name: String, ann: => QueryDef): QueryDef = QueryDef(
    name, {
      val exactSql = s01KnnBrute.oracle.get
      val annSql = ann.oracle.get
      s"""WITH ex AS (${exactSql.replace("\n", "\n  ")}),
         |ann0 AS (${annSql.replace("\n", "\n  ")}),
         |ann AS (SELECT probe_id, neighbor_id FROM ann0),
         |j AS (
         |  SELECT ex.probe_id,
         |         CASE WHEN ann.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM ex LEFT JOIN ann
         |    ON ex.probe_id = ann.probe_id AND ex.neighbor_id = ann.neighbor_id)
         |SELECT probe_id, CAST(sum(hit) AS BIGINT) AS hits,
         |       CAST($TopK AS BIGINT) AS k,
         |       ${Stable.sqlR4(s"sum(hit) / $TopK.0")} AS recall
         |FROM j GROUP BY probe_id""".stripMargin
    }) { (s, d) =>
    val exact = s01KnnBrute.fn(s, d).select(col("probe_id"), col("neighbor_id"))
    val annDf = ann.fn(s, d)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("__hit"))
    exact
      .join(annDf, Seq("probe_id", "neighbor_id"), "left")
      .groupBy("probe_id")
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .select(col("probe_id"), col("hits"), lit(TopK.toLong).as("k"),
        Stable.r4(col("hits") / lit(TopK.toDouble)).as("recall"))
  }

  val s07AnnRecall = recallDef("s07_ann_recall", s02AnnLsh)

  /** SAMPLED recall@[[TopK]] of the IVF family at an arbitrary corpus size
    * (ADVICE r10: the s10–s12 gauges only ever execute where
    * `cellRefineBits` = 0, so the recall cost of the refined-cell join at
    * ×10/×100 — bits 3/6, multi-probe restricted to the probe's own
    * refinement sub-bucket — was never measured; occupancy/time gates
    * could pass while at-scale recall silently collapsed). Ground truth is
    * the exact brute-force top-k for ~`targetProbes` sampled probes (the
    * s07 design: the measurement prices O(sample × corpus), the path
    * under test keeps its bucket equi-join); returns mean recall of
    * (s05 single-cell, s06 multi-probe). The scale gate records both per
    * side and asserts the scaled corpus keeps ≥ half the base recall. */
  private[graft] def ivfSampleRecall(
      s: SparkSession, d: String, targetProbes: Int = 20): (Double, Double) = {
    val n = Tables.embeddings(s, d).count()
    val every = math.max(1L, (n / ProbeMod) / targetProbes) * ProbeMod
    val e = vecs(s, d)
    val p = e.filter(col("vec_id") % every === 0)
    val cos = dotCol(col("p.embedding"), col("e.embedding")) / (col("p.nrm") * col("e.nrm"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    val exact = broadcast(p.as("p"))
      .join(e.as("e"), col("p.vec_id") =!= col("e.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("e.vec_id").as("neighbor_id"),
        cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("neighbor_id"))
      .cache() // ground truth feeds both family joins
    def recallOf(ann: DataFrame): Double = {
      val r = exact
        .join(ann.filter(col("probe_id") % every === 0)
            .select(col("probe_id"), col("neighbor_id"), lit(1L).as("__hit")),
          Seq("probe_id", "neighbor_id"), "left")
        .agg(avg(coalesce(col("__hit"), lit(0L)).cast("double")))
        .head()
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
    try (recallOf(s05IvfSearch.fn(s, d)), recallOf(s06IvfMultiProbe.fn(s, d)))
    finally exact.unpersist(blocking = false)
  }

  // ---------- s08: k-means, two unrolled Lloyd rounds ----------

  private val KmeansK = 8

  private def sqdSql(a: String, c: String): String =
    TextOps.sumSql(
      s"list_transform(list_zip($a, $c), " +
        "pp -> (CAST(pp[1] AS DOUBLE) - CAST(pp[2] AS DOUBLE)) * " +
        "(CAST(pp[1] AS DOUBLE) - CAST(pp[2] AS DOUBLE)))")

  /** One oracle-side Lloyd round: assign `e` to the nearest centroid in
    * `cents` (squared L2, ties on cid), then rebuild per-cluster
    * dimension-wise r4-rounded means. */
  private def lloydRoundSql(assignCte: String, meansCte: String, centsCte: String,
      prevCents: String): String =
    s"""$assignCte AS (
       |  SELECT e.vec_id, c.cid, ${sqdSql("e.embedding", "c.cvec")} AS dist
       |  FROM e CROSS JOIN $prevCents c
       |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dist, c.cid) = 1),
       |$meansCte AS (
       |  SELECT a.cid, ex.p AS dim, ${Stable.sqlR4("avg(ex.v)")} AS cv
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |               unnest(generate_series(1, len(embedding))) AS p
       |        FROM e) ex
       |  JOIN $assignCte a USING (vec_id)
       |  GROUP BY a.cid, ex.p),
       |$centsCte AS (SELECT cid, list(cv ORDER BY dim) AS cvec FROM $meansCte GROUP BY cid)""".stripMargin

  /** s08 — k-means via two UNROLLED Lloyd rounds (the unsupervised twin of
    * s03/s05's label-seeded IVF training): deterministic seeds (the k
    * lowest vec_ids), assign → recompute → assign → recompute → final
    * assignment, reporting per-cluster size and mean squared distance.
    *
    * Engine stability: centroids are r4-rounded after EVERY mean update —
    * both engines then carry bit-identical centroid literals into the next
    * round's distance folds (the same convention s03/s05 apply once,
    * applied per round), so assignments are deterministic; only the final
    * avg_sqdist is a cross-row double sum, r4-rounded like every other
    * aggregate. Squared L2 (no sqrt) keeps the fold a pure (x−y)² chain.
    *
    * 100 TB shape: each round is (a) one per-row argmin against k
    * BROADCAST-LITERAL centroids — `array_min` over a k-entry struct
    * array, no join, no shuffle of the corpus; (b) one posexplode +
    * (cid, dim)-keyed aggregation — k·64 groups regardless of corpus
    * size. The only driver traffic is the k×64 centroid matrix per round
    * (the s05 bounded-metadata pattern); rounds are unrolled, so the whole
    * loop is a fixed 3-job pipeline, not a convergence loop. */
  val s08KmeansLloyd = QueryDef(
    "s08_kmeans_lloyd",
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (
       |  SELECT vec_id AS cid,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
       |  FROM e WHERE vec_id < $KmeansK),
       |${lloydRoundSql("a0", "m1", "c1", "c0")},
       |${lloydRoundSql("a1", "m2", "c2", "c1")},
       |a2 AS (
       |  SELECT e.vec_id, c.cid, ${sqdSql("e.embedding", "c.cvec")} AS dist
       |  FROM e CROSS JOIN c2 c
       |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dist, c.cid) = 1)
       |SELECT cid AS cluster_id, count(*) AS n_members,
       |       ${Stable.sqlR4("avg(dist)")} AS avg_sqdist
       |FROM a2 GROUP BY cid""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))

    def sqd(v: Column, c: Column): Column =
      aggregate(
        zip_with(v, c, (x, y) => {
          val dd = x.cast("double") - y
          dd * dd
        }),
        lit(0.0), (acc, x) => acc + x)

    // struct ordering is lexicographic on (dist, cid) — array_min IS the
    // oracle's "ORDER BY dist, cid LIMIT 1"
    def assignStruct(cents: Seq[(Long, Seq[Double])]): Column =
      array_min(array(cents.map { case (cid, cv) =>
        struct(sqd(col("embedding"), typedlit(cv)).as("dist"), lit(cid).as("cid"))
      }: _*))

    val seeds: Seq[(Long, Seq[Double])] = e.filter(col("vec_id") < KmeansK)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .toSeq.sortBy(_._1)

    def lloydRound(cents: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] =
      e.withColumn("cid", assignStruct(cents).getField("cid"))
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(Stable.r4(avg(col("v"))).as("cv"))
        .groupBy("cid")
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("cv")))),
          x => x.getField("cv")).as("cvec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        .toSeq.sortBy(_._1)

    val c2 = lloydRound(lloydRound(seeds))
    val am = assignStruct(c2)
    e.select(am.getField("cid").as("cluster_id"), am.getField("dist").as("dist"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"), Stable.r4(avg(col("dist"))).as("avg_sqdist"))
  }

  // ---------- s09: IVF-PQ — residual product quantization + ADC inside the probe's cell ----------

  private val SubSpaces = 8
  private val SubDim = Dims / SubSpaces // 8
  private val PqK = 16 // codes per sub-codebook

  /** Squared L2 between two double arrays — s08's fold, shared by the
    * per-subspace Lloyd rounds, the encoding argmin and the ADC ranking.
    * A compiled expression since round 14 (VectorFunctions.DoubleVecSqDist,
    * bit-identical fold order): the interpreted HOF form measured ~1 µs
    * per evaluation inside the ×100 ADC join — 57 s of a 64 s query spent
    * in lambda/boxing machinery, the §2.9 zero-UDF-hot-path rule's exact
    * target. */
  private def sqdCol(v: Column, c: Column): Column =
    graft.functions.VectorFunctions.sqDistD(v, c)

  /** The literal full-centroid vector of the row's assigned `cell`
    * (chained CASE over the ≤k cells — bounded metadata, no join). */
  private def cellCentroidCol(cents: Seq[(Int, Seq[Float])]): Column =
    cents.tail.foldLeft(
      when(col("cell") === cents.head._1, typedlit(cents.head._2))) {
      case (acc, (lab, cv)) => acc.when(col("cell") === lab, typedlit(cv))
    }

  /** The (vec_id, cell, res) residual frame behind s09: every vector
    * assigned to its nearest coarse centroid (s05's literal-argmax
    * projection), residual = v − centroid(cell) in double — float minus
    * float is EXACT in double, so both engines carry bit-identical
    * residuals into codebook training, encoding and ranking. */
  private def residualFrame(s: SparkSession, d: String): DataFrame =
    residualFrameFrom(s, d, centroidRows(s, d), cellRefineBits(s, d))

  /** [[residualFrame]] parameterized by materialized centroid rows +
    * refine bits, so s16's index path can replay the EXACT assignment/
    * residual pipeline from its persisted spec (no s03 job, no count job)
    * while s09 keeps deriving both per session. */
  private def residualFrameFrom(
      s: SparkSession, d: String,
      cr: Seq[(Int, Seq[Float], Double)], bits: Int): DataFrame =
    residualFrameOf(vecs(s, d), cr, bits)

  /** [[residualFrameFrom]] over an arbitrary (vec_id, embedding, nrm)
    * source frame — s17's frozen-spec delta encode runs this chain over
    * the DELTA batch (and the probe side over the unioned corpus) with
    * centroids/bits deserialized from the index spec, so the delta path
    * touches no training job of any kind. */
  private def residualFrameOf(
      src: DataFrame,
      cr: Seq[(Int, Seq[Float], Double)], bits: Int): DataFrame = {
    val cents: Seq[(Int, Seq[Float])] = cr.map { case (lab, cv, _) => (lab, cv) }
    val scoredCells = scoredCellsFrom(cr)
    // conditional widen (optimization round 17, the Dedup.corpus
    // discipline): the per-row work below — k full-dimension dots for the
    // cell argmax, the refine projections, the residual zip — inherits the
    // SOURCE layout, and the sf0.1 embeddings parquet is ONE split, so the
    // whole encode chain (and s09's two Lloyd training rounds over it) ran
    // on 1 of 32 cores. One narrow (vec_id-hashed) exchange restores full
    // width; skipped when the scan is already wide (a 100 TB corpus
    // arrives as thousands of splits). Per-row results are unaffected.
    val s = src.sparkSession
    val parts = s.sessionState.conf.numShufflePartitions
    val wide =
      if (src.rdd.getNumPartitions * 2 < parts)
        src.repartition(parts, col("vec_id"))
      else src
    wide
      .select(col("vec_id"), col("embedding"),
        (-array_max(scoredCells).getField("negCell")).as("cell"))
      .withColumn("cellr", refinedCellCol(col("cell"), col("embedding"), bits))
      .withColumn("cvec_cell", cellCentroidCol(cents))
      .withColumn("res",
        zip_with(col("embedding"), col("cvec_cell"),
          (x, y) => x.cast("double") - y.cast("double")))
      .select(col("vec_id"), col("cell"), col("cellr"), col("res"))
  }

  /** Two deterministic Lloyd rounds for ALL [[SubSpaces]] sub-codebooks in
    * ONE plan per round (round-9 verdict #5 — previously 8 sequential
    * per-subspace trainings ≈ 24 driver job round-trips): `rsub` explodes
    * every residual into (vec_id, sub, sv); each round assigns a row by an
    * argmin dispatched on `sub` over THAT subspace's literal centroids and
    * re-averages keyed by (sub, cid, pos). Seeds = the [[PqK]] lowest
    * vec_ids' subvectors; means r4-rounded after EVERY update — s08's
    * cross-engine stability convention. Same math, same codebooks, ~8×
    * fewer jobs. Returns sub-codebooks indexed by subspace, each ordered
    * by cid. */
  private def trainSubCodebooks(rf: DataFrame): Seq[Seq[(Long, Seq[Double])]] = {
    pqTrainCalls.incrementAndGet()
    val rsub = rf.select(col("vec_id"),
      explode(array((0 until SubSpaces).map(m =>
        struct(lit(m).as("sub"),
          slice(col("res"), m * SubDim + 1, SubDim).as("sv"))): _*)).as("x"))
      .select(col("vec_id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
    def bySub(rows: Array[(Int, Long, Seq[Double])]): Seq[Seq[(Long, Seq[Double])]] =
      (0 until SubSpaces).map(m =>
        rows.filter(_._1 == m).map(t => (t._2, t._3)).toSeq.sortBy(_._1))
    def assignCid(cbs: Seq[Seq[(Long, Seq[Double])]]): Column = {
      val cases = cbs.zipWithIndex.map { case (cents, m) =>
        m -> array_min(array(cents.map { case (cid, cv) =>
          struct(sqdCol(col("sv"), typedlit(cv)).as("dist"), lit(cid).as("cid"))
        }: _*)).getField("cid")
      }
      cases.tail.foldLeft(when(col("sub") === cases.head._1, cases.head._2)) {
        case (acc, (m, c)) => acc.when(col("sub") === m, c)
      }
    }
    def round(cbs: Seq[Seq[(Long, Seq[Double])]]): Seq[Seq[(Long, Seq[Double])]] =
      bySub(rsub.withColumn("cid", assignCid(cbs))
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(Stable.r4(avg(col("v"))).as("cv"))
        .groupBy("sub", "cid")
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("cv")))),
          x => x.getField("cv")).as("cvec"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq)))
    val seeds = bySub(rsub.filter(col("vec_id") < PqK)
      .collect().map(r => (r.getInt(1), r.getLong(0), r.getSeq[Double](2).toSeq)))
    round(round(seeds))
  }

  /** Per-subspace nearest-code struct for a row's `res` column: entry m is
    * argmin over sub-codebook m's literal centroids, carrying (dist, cid,
    * cvec) — `.getField("cid")` is the PQ code, `.getField("cvec")` the
    * reconstructed sub-vector. Shared by s09's inline encode and s16's
    * index build so the stored codes are s09's by construction. */
  private def pqBests(cbs: Seq[Seq[(Long, Seq[Double])]]): Seq[Column] =
    (0 until SubSpaces).map { m =>
      val sv = slice(col("res"), m * SubDim + 1, SubDim)
      array_min(array(cbs(m).map { case (cid, cv) =>
        val cvec = typedlit(cv)
        struct(sqdCol(sv, cvec).as("dist"), lit(cid).as("cid"), cvec.as("cvec"))
      }: _*))
    }

  /** One oracle-side PQ block for subspace `m`: seed, two Lloyd rounds,
    * and the final encoding — the s08 `lloydRoundSql` shape restricted to
    * `rsub WHERE sub = m`. */
  private def pqSubBlockSql(m: Int): String = {
    val rs = s"(SELECT vec_id, sv FROM rsub WHERE sub = $m)"
    val ex = s"""(SELECT vec_id, unnest(sv) AS v,
                |               unnest(generate_series(1, len(sv))) AS p
                |        FROM rsub WHERE sub = $m)""".stripMargin
    s"""s${m}c0 AS (SELECT vec_id AS cid, sv AS cvec FROM rsub WHERE sub = $m AND vec_id < $PqK),
       |s${m}a0 AS (
       |  SELECT r.vec_id, c.cid FROM $rs r CROSS JOIN s${m}c0 c
       |  QUALIFY row_number() OVER (PARTITION BY r.vec_id
       |                             ORDER BY ${sqdSql("r.sv", "c.cvec")}, c.cid) = 1),
       |s${m}m1 AS (
       |  SELECT a.cid, ex.p AS dim, ${Stable.sqlR4("avg(ex.v)")} AS cv
       |  FROM $ex ex JOIN s${m}a0 a USING (vec_id) GROUP BY a.cid, ex.p),
       |s${m}c1 AS (SELECT cid, list(cv ORDER BY dim) AS cvec FROM s${m}m1 GROUP BY cid),
       |s${m}a1 AS (
       |  SELECT r.vec_id, c.cid FROM $rs r CROSS JOIN s${m}c1 c
       |  QUALIFY row_number() OVER (PARTITION BY r.vec_id
       |                             ORDER BY ${sqdSql("r.sv", "c.cvec")}, c.cid) = 1),
       |s${m}m2 AS (
       |  SELECT a.cid, ex.p AS dim, ${Stable.sqlR4("avg(ex.v)")} AS cv
       |  FROM $ex ex JOIN s${m}a1 a USING (vec_id) GROUP BY a.cid, ex.p),
       |s${m}c2 AS (SELECT cid, list(cv ORDER BY dim) AS cvec FROM s${m}m2 GROUP BY cid),
       |s${m}enc AS (
       |  SELECT r.vec_id, $m AS sub, c.cid AS code, c.cvec
       |  FROM $rs r CROSS JOIN s${m}c2 c
       |  QUALIFY row_number() OVER (PARTITION BY r.vec_id
       |                             ORDER BY ${sqdSql("r.sv", "c.cvec")}, c.cid) = 1)""".stripMargin
  }

  /** s09 — IVF-PQ with RESIDUAL quantization, the production ANN index
    * shape at vector-corpus scale: each vector's residual against its IVF
    * cell centroid is split into [[SubSpaces]] subspaces and encoded by
    * per-subspace k-means codebooks ([[PqK]] codes, two deterministic
    * Lloyd rounds on the residuals themselves — quantizing the RESIDUAL,
    * not the raw vector, is what preserves within-cell discrimination);
    * the corpus is then [[SubSpaces]] small codebook CODES per vector
    * (8 bytes vs 256 bytes of floats — the ~32× memory compression that
    * fits a trillion-vector index on a cluster; k and M are the
    * precision/compression knobs), candidates are pruned to the probe's
    * cell, and ranking is
    * asymmetric distance computation: the probe's exact residual against
    * each candidate's reconstructed residual.
    *
    * 100 TB shape: codebooks are bounded literal metadata (M·k·SubDim
    * doubles) trained with s08's corpus-safe Lloyd jobs (argmin against
    * literal centroids — no join, no corpus shuffle; k·SubDim groups per
    * mean); encoding is a PER-ROW PROJECTION; the only join is the cell
    * equi-join (PlanSpec pins it), touching ≈1/k of the corpus per probe.
    * A production kernel folds the probe×codebook products into an M×k
    * lookup table instead of reconstructing — same candidate set, same
    * ranking; this declaration pins both, and the emitted codes make the
    * quantization itself oracle-checked, not just the ranking. */
  /** s09's oracle chain, parameterized by an optional candidate-side
    * language restriction (s20: filter BEFORE rank — the joined predicate
    * thins `scored`, so the window ranks qualifying candidates only). */
  private def ivfPqAdcOracleSql(langFilter: Option[String]): String = {
      val langJoin = langFilter.fold("")(l =>
        s"\n  JOIN documents dd ON c.vec_id = dd.doc_id AND dd.lang = '$l'")
      val centroidSql = s03Centroids.oracle.get
      s"""WITH cents0 AS (${centroidSql.replace("\n", "\n  ")}),
         |cents AS (
         |  SELECT label,
         |         list_transform(list(centroid ORDER BY dim_pos), x -> CAST(x AS REAL)) AS cvec
         |  FROM cents0 GROUP BY label),
         |cn AS (SELECT label, cvec, ${normSql("cvec")} AS cnorm FROM cents),
         |e AS ($vecsSql),
         |assigned AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, cn.label AS cell,
         |           row_number() OVER (
         |             PARTITION BY e.vec_id
         |             ORDER BY ${dotSql("e.embedding", "cn.cvec")} / (e.nrm * cn.cnorm) DESC,
         |                      cn.label) AS rn
         |    FROM e CROSS JOIN cn) WHERE rn = 1),
         |res AS (
         |  SELECT a.vec_id, a.cell,
         |         list_transform(list_zip(a.embedding, cc.cvec),
         |                        pp -> CAST(pp[1] AS DOUBLE) - CAST(pp[2] AS DOUBLE)) AS res
         |  FROM assigned a JOIN cents cc ON a.cell = cc.label),
         |rsub AS (
         |  SELECT vec_id, sub, res[sub * $SubDim + 1 : sub * $SubDim + $SubDim] AS sv
         |  FROM res CROSS JOIN (SELECT unnest(generate_series(0, ${SubSpaces - 1})) AS sub) ss),
         |${(0 until SubSpaces).map(pqSubBlockSql).mkString(",\n")},
         |encoded AS (${(0 until SubSpaces).map(m => s"SELECT * FROM s${m}enc")
           .mkString("\n  ", "\n  UNION ALL ", "")}),
         |recon AS (
         |  SELECT vec_id, flatten(list(cvec ORDER BY sub)) AS rres,
         |         list(code ORDER BY sub) AS codes
         |  FROM encoded GROUP BY vec_id),
         |cand AS (
         |  SELECT r.vec_id, r.cell, rc.rres, rc.codes
         |  FROM res r JOIN recon rc USING (vec_id)),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, p.cell, c.vec_id AS neighbor_id, c.codes,
         |         ${sqdSql("p.res", "c.rres")} AS adc
         |  FROM (SELECT * FROM res WHERE vec_id % $ProbeMod = 0) p
         |  JOIN cand c ON p.cell = c.cell AND p.vec_id <> c.vec_id$langJoin),
         |ranked AS (
         |  SELECT probe_id, cell, neighbor_id, codes, adc,
         |         row_number() OVER (PARTITION BY probe_id
         |                            ORDER BY adc, neighbor_id) AS rank
         |  FROM scored)
         |SELECT probe_id, cell, rank, neighbor_id,
         |       ${(0 until SubSpaces).map(m => s"codes[${m + 1}] AS c$m").mkString(", ")},
         |       ${Stable.sqlR4("adc")} AS adc_sqdist
         |FROM ranked WHERE rank <= $TopK""".stripMargin
  }

  val s09IvfPqAdc = QueryDef(
    "s09_ivfpq_adc", ivfPqAdcOracleSql(None)) { (s, d) =>
    val rf = residualFrame(s, d)
    // train over a LINEAGE-TRUNCATED copy (optimization round 17): persist
    // alone stops recompute but every training round (seeds + 2 Lloyd
    // collects) still re-ANALYZES the full residual pipeline — the
    // literal-centroid argmax + refine + zip expression tree — under its
    // own explode/argmin/aggregate; localCheckpoint makes the rounds plan
    // against a leaf. Blocks are pinned (the d07 lesson), so they are
    // released explicitly once training is done; the final plan below
    // derives rf fresh, so the declared query still owns its own encode
    // cost (and PlanSpec still sees both embeddings scans).
    val sc = s.sparkContext
    val beforeCp = sc.getPersistentRDDs.keySet.toSet
    val rfT = rf.localCheckpoint()
    val cbs =
      try trainSubCodebooks(rfT)
      finally (sc.getPersistentRDDs.keySet.toSet -- beforeCp)
        .foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    val bests = pqBests(cbs)
    val cand = rf.select(Seq(
      col("vec_id"), col("cell"), col("cellr"), col("res"),
      concat(bests.map(_.getField("cvec")): _*).as("rres")) ++
      bests.zipWithIndex.map { case (b, m) => b.getField("cid").as(s"c$m") }: _*)
    val p = refineMultiProbe(
      rf.filter(col("vec_id") % ProbeMod === 0), cellRefineBits(s, d))
    val adc = sqdCol(col("p.res"), col("e.rres"))
    val w = Window.partitionBy("probe_id").orderBy(col("adc"), col("neighbor_id"))
    broadcast(p.as("p"))
      .join(cand.as("e"),
        col("p.cellr") === col("e.cellr") && col("p.vec_id") =!= col("e.vec_id"))
      .select(Seq(col("p.vec_id").as("probe_id"), col("p.cell").as("cell"),
        col("e.vec_id").as("neighbor_id")) ++
        (0 until SubSpaces).map(m => col(s"e.c$m").as(s"c$m")) :+
        adc.as("adc"): _*)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(Seq(col("probe_id"), col("cell"), col("rank"), col("neighbor_id")) ++
        (0 until SubSpaces).map(m => col(s"c$m")) :+
        Stable.r4(col("adc")).as("adc_sqdist"): _*)
  }

  // ---------- s16: IVF-PQ against the PERSISTED vector index ----------

  private val PqIdxBuckets = 32
  private val PqIdxSpecFile = "_GRAFT_PQIDX_SPEC"

  /** Identity of the TRAINING PARAMETERS baked into persisted specs
    * (ADVICE r15 #3): the spec fingerprint previously covered only
    * embeddings.parquet, so a CODE change to any constant that shapes the
    * persisted training — cell refinement target, refine-plane seed base,
    * subspace count/width, codebook size — left a matching-fingerprint
    * spec serving bits/centroids/codebooks computed by older code, with
    * the read-through ([[specMetaIfValid]]) spreading the staleness to
    * the whole IVF family. Folding the constants into the fingerprint
    * invalidates persisted training on a params change exactly the way a
    * corpus change does. Query-side-only knobs (multi-probe radius,
    * nprobe threshold) are deliberately absent — they don't affect what
    * the spec STORES. */
  private val PqParamsTag =
    s"params dims=$Dims cell=$TargetCell rpb=$RefinePlaneBase " +
      s"M=$SubSpaces sd=$SubDim k=$PqK attrs=lang"

  /** The persisted-index fingerprint for `d`: corpus identity
    * (embeddings.parquet size/mtime signature) + the attribute source
    * (documents.parquet — the stored `lang` column is INDEX CONTENT, so a
    * regenerated documents table must invalidate the codes exactly like a
    * regenerated embeddings table; "absent" for attribute-less corpora) +
    * [[PqParamsTag]]. Every spec writer records it and every reader
    * re-checks it. */
  private def pqSpecFingerprint(d: String): String =
    Dedup.sourceFingerprint(d, "embeddings.parquet") + "|" +
      Dedup.sourceFingerprint(d, "documents.parquet") + "|" + PqParamsTag

  /** Attach the document attribute (`lang`) to a code frame — the
    * filtered-search column persisted WITH the codes (s20's scaladoc:
    * a bucketed index row is `(vec_id, cell, cellr, c0..cM, attrs…)`, so
    * a metadata predicate is a pushed scan predicate on the cell-pruned
    * candidate read, zero per-query joins). Paid once per build/append/
    * fold, never per query. A DELTA vector inherits its SOURCE document's
    * attribute: source id = vec_id stripped of the segment offset — local
    * ids sit in [seg·[[PqDeltaIdOffset]], (seg+1)·[[PqDeltaIdOffset]])
    * within their [[PqDeltaBlockSpan]] block (the disjointness invariant
    * [[pqDeltaSegment]] asserts), so one integer expression serves base
    * rows (offset 0) and every segment alike. Corpora without a
    * documents table (attribute-less vector fixtures) store a null
    * attribute — filters simply match nothing, and the fingerprint
    * records "absent" so adding the table later rebuilds. */
  private def withSourceLang(s: SparkSession, d: String, codes: DataFrame): DataFrame =
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(d, "documents.parquet")))
      codes.withColumn("lang", lit(null).cast("string"))
    else {
      val srcId = (col("vec_id") -
        lit(PqDeltaIdOffset) * ((col("vec_id") % PqDeltaBlockSpan) / PqDeltaIdOffset)
          .cast("long")).as("__src_id")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      codes.withColumn("__src_id", srcId)
        .join(docs, col("__src_id") === col("doc_id"), "left")
        .drop("__src_id", "doc_id")
    }

  /** Exact float/double serialization for the index spec file: raw IEEE
    * bits in hex, so the deserialized literals are the trained values to
    * the last bit (Float.toString would also round-trip, but raw bits
    * make the invariant self-evident). */
  private def fHex(f: Float): String =
    java.lang.Integer.toHexString(java.lang.Float.floatToRawIntBits(f))
  private def fUnhex(s: String): Float =
    java.lang.Float.intBitsToFloat(java.lang.Integer.parseUnsignedInt(s, 16))
  private def dHex(x: Double): String =
    java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(x))
  private def dUnhex(s: String): Double =
    java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(s, 16))

  /** The persisted index's bounded metadata: refine bits + coarse
    * centroids (label, cvec, cnorm) + the [[SubSpaces]] residual
    * sub-codebooks — everything the query path needs besides the codes
    * table. ~(cells·64 floats + 8·16·8 doubles): driver/spec-file scale,
    * never corpus scale. */
  private[graft] final case class PqIndexMeta(
      bits: Int,
      cents: Seq[(Int, Seq[Float], Double)],
      cbs: Seq[Seq[(Long, Seq[Double])]])

  private val pqMetaCache =
    new java.util.concurrent.ConcurrentHashMap[String, PqIndexMeta]()
  /** Test hook: forget the in-memory spec metadata for `d` WITHOUT
    * touching catalog or files — the restart-reuse specs use it to
    * simulate a fresh JVM faithfully (a real restart loses this map, and
    * the refine-bit cache with it). */
  private[graft] def forgetPqMetaForTest(d: String): Unit = {
    pqMetaCache.remove(d)
    cellBitsCache.remove(d)
    Seq(PqDelta1, PqDelta2).foreach(dd => pqDeltaFpCache.remove(deltaKey(d, dd)))
    pqCompactFpCache.remove(d)
  }

  /** The persisted index spec's metadata when a VALID one exists for `d`:
    * the in-memory map first (writers invalidate it), else the warehouse
    * spec file with its recorded fingerprint re-checked against
    * embeddings.parquet — the read-through that lets the WHOLE IVF family
    * (s05/s06/s09/s13 and the index paths) skip centroid/count jobs in
    * any JVM that can see a completed build. None ⇒ no trustworthy
    * persisted training; callers fall back to training inline. */
  private def specMetaIfValid(s: SparkSession, d: String): Option[PqIndexMeta] =
    Option(pqMetaCache.get(d)).orElse {
      val specPath = java.nio.file.Paths.get(
        s"${Dedup.warehouseDir(s)}/${pqCodesTable(d)}", PqIdxSpecFile)
      if (!java.nio.file.Files.exists(specPath)) None
      else parsePqSpec(java.nio.file.Files.readString(specPath)) match {
        case Some((sfp, _, meta)) if sfp == pqSpecFingerprint(d) =>
          pqMetaCache.put(d, meta)
          Some(meta)
        case _ => None
      }
    }
  /** What the last [[pqStoredIndex]] call did per directory ("cached" /
    * "reregistered" / "built") and the build seconds when "built" — the
    * d17 `indexBuildMode` contract, read by the gate's timed
    * `s16_index_build` entry and the restart-reuse spec. */
  private[graft] val vecIndexBuildMode =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] val vecIndexBuildSec =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  private def pqCodesTable(d: String): String =
    s"graft_pqidx_codes_${Dedup.pathKey(d)}"

  private def renderPqSpec(fp: String, ddl: String, meta: PqIndexMeta): String = {
    val sb = new StringBuilder
    sb.append(fp).append('\n').append(ddl).append('\n')
    sb.append("bits=").append(meta.bits).append('\n')
    meta.cents.foreach { case (lab, cv, cn) =>
      sb.append("c ").append(lab).append(' ').append(dHex(cn)).append(' ')
        .append(cv.map(fHex).mkString(",")).append('\n')
    }
    for ((cb, m) <- meta.cbs.zipWithIndex; (cid, cv) <- cb)
      sb.append("b ").append(m).append(' ').append(cid).append(' ')
        .append(cv.map(dHex).mkString(",")).append('\n')
    sb.result()
  }

  /** Parse a spec file: (fingerprint, schema DDL, meta). None on any
    * malformed content — the caller then rebuilds (a torn spec is the
    * crashed-build case the marker-last write protocol makes safe). */
  private def parsePqSpec(text: String): Option[(String, String, PqIndexMeta)] =
    try {
      val lines = text.split("\n")
      val fp = lines(0)
      val ddl = lines(1)
      val bits = lines(2).stripPrefix("bits=").toInt
      val cents = Seq.newBuilder[(Int, Seq[Float], Double)]
      val cbs = Array.fill(SubSpaces)(Seq.newBuilder[(Long, Seq[Double])])
      lines.drop(3).filter(_.nonEmpty).foreach { ln =>
        val p = ln.split(" ")
        p(0) match {
          case "c" =>
            cents += ((p(1).toInt, p(3).split(",").toSeq.map(fUnhex), dUnhex(p(2))))
          case "b" =>
            cbs(p(1).toInt) += ((p(2).toLong, p(3).split(",").toSeq.map(dUnhex)))
        }
      }
      Some((fp, ddl, PqIndexMeta(bits, cents.result(), cbs.toSeq.map(_.result()))))
    } catch { case _: Exception => None }

  /** Build-once PERSISTED vector index — d17's treatment applied to the
    * s-family (round-13 verdict #1: s05/s06/s09/s13 re-train centroids
    * and codebooks and re-encode the whole corpus EVERY SESSION; at
    * 100 TB that converts "build an index once" into 16 Lloyd jobs + a
    * corpus-wide encode per process). The corpus's PQ CODES land in ONE
    * bucketed EXTERNAL table keyed by `cellr` (the candidate join's key)
    * — [[SubSpaces]] small ints per vector, the ~32× compression that is
    * the index's entire reason to exist — and the bounded training
    * artifacts (refine bits, coarse centroids, residual sub-codebooks)
    * in a spec file next to it, serialized as raw IEEE bits so a fresh
    * JVM replays literal-identical plans. Same lifecycle as
    * [[Dedup.nearDupStoredIndex]]: in-catalog hit = "cached"; fresh
    * catalog + valid warehouse files (spec fingerprint still matches
    * embeddings.parquet) = "reregistered" (CREATE TABLE ... CLUSTERED BY
    * ... LOCATION — catalog metadata only, zero data touched); missing/
    * stale = "built" (the one path that trains and encodes). The spec
    * file is written LAST, so a crashed build self-heals into a rebuild. */
  private[graft] def pqStoredIndex(
      s: SparkSession, d: String): (DataFrame, PqIndexMeta) = {
    val codesT = pqCodesTable(d)
    val loc = s"${Dedup.warehouseDir(s)}/$codesT"
    val specPath = java.nio.file.Paths.get(loc, PqIdxSpecFile)
    val fp = pqSpecFingerprint(d)
    val cached = Option(pqMetaCache.get(d))
    if (s.catalog.tableExists(codesT) && cached.isDefined) {
      vecIndexBuildMode.put(d, "cached")
      (graft.pipeline.Bucketing.readBucketed(s, codesT), cached.get)
    } else {
      val onDisk =
        if (java.nio.file.Files.exists(specPath))
          parsePqSpec(java.nio.file.Files.readString(specPath))
        else None
      onDisk match {
        case Some((sfp, ddl, meta)) if sfp == fp =>
          if (s.catalog.tableExists(codesT)) vecIndexBuildMode.put(d, "cached")
          else {
            s.sql(s"""CREATE TABLE $codesT ($ddl) USING parquet
                     |CLUSTERED BY (cellr) SORTED BY (cellr)
                     |INTO $PqIdxBuckets BUCKETS
                     |LOCATION '$loc'""".stripMargin)
            vecIndexBuildMode.put(d, "reregistered")
          }
          pqMetaCache.put(d, meta)
          (graft.pipeline.Bucketing.readBucketed(s, codesT), meta)
        case _ =>
          val t0 = System.nanoTime()
          s.sql(s"DROP TABLE IF EXISTS $codesT")
          try Reconcile.deleteRecursively(loc)
          catch { case _: Exception => () }
          // a rebuild means the on-disk spec is absent/stale — any
          // lingering in-memory meta/bits for `d` is the same vintage and
          // must not be read through by the training calls below
          pqMetaCache.remove(d)
          cellBitsCache.remove(d)
          // ADVICE r15 (medium): the DERIVED layers — delta segments
          // encoded against the codebooks this branch is about to drop,
          // and the compacted generation that folded them — are the same
          // vintage; with a persistent metastore they would otherwise
          // keep serving stale codes after the base self-heals
          invalidatePqDelta(d)
          invalidatePqCompact(d)
          val bits = cellRefineBits(s, d)
          val cr = centroidRows(s, d)
          def mark(tag: String, since: Long): Long = {
            val now = System.nanoTime()
            System.err.println(f"[pqidx] $tag: ${(now - since) / 1e9}%.1f s")
            now
          }
          val t1 = mark("centroids", t0)
          val rf = residualFrameFrom(s, d, cr, bits).persist()
          try {
            val cbs = trainSubCodebooks(rf)
            val t2 = mark("train", t1)
            val bests = pqBests(cbs)
            val codes = withSourceLang(s, d, rf.select(
              Seq(col("vec_id"), col("cell"), col("cellr")) ++
                bests.zipWithIndex.map { case (b, m) => b.getField("cid").as(s"c$m") }: _*))
            graft.pipeline.Bucketing.writeBucketed(
              codes, codesT, Seq("cellr"), PqIdxBuckets, Some(loc))
            mark("encode+write", t2)
            val meta = PqIndexMeta(bits, cr, cbs)
            java.nio.file.Files.writeString(
              specPath, renderPqSpec(fp, codes.schema.toDDL, meta))
            pqMetaCache.put(d, meta)
            vecIndexBuildMode.put(d, "built")
            vecIndexBuildSec.put(d, (System.nanoTime() - t0) / 1e9)
            (graft.pipeline.Bucketing.readBucketed(s, codesT), meta)
          } finally rf.unpersist(blocking = false)
      }
    }
  }

  /** Drop the persisted vector index for `d` — both catalog layers and
    * the warehouse files. Called by [[invalidateParamCaches]] (writers
    * regenerating embeddings) and by the gate's forced-build timing. */
  private[graft] def invalidatePqIndex(d: String): Unit = {
    pqMetaCache.remove(d)
    invalidatePqDelta(d) // a delta segment encoded against dropped codebooks is undefined
    val t = pqCodesTable(d)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach { s =>
      try {
        s.sql(s"DROP TABLE IF EXISTS $t")
        try Reconcile.deleteRecursively(s"${Dedup.warehouseDir(s)}/$t")
        catch { case _: Exception => () }
      } catch { case _: Exception => () }
    }
  }

  /** Force-or-ensure the persisted vector index, returning (mode, build
    * seconds — 0 unless "built"): the gate's `s16_index_build` timing
    * hook, d17's [[Dedup.ensureNearDupIndex]] contract verbatim. */
  private[graft] def ensurePqIndex(
      s: SparkSession, d: String, force: Boolean = false): (String, Double) = {
    if (force) { invalidatePqIndex(d); cellBitsCache.remove(d) }
    pqStoredIndex(s, d)
    val mode = vecIndexBuildMode.getOrDefault(d, "none")
    (mode,
      if (mode == "built") Option(vecIndexBuildSec.get(d)).fold(0.0)(_.doubleValue())
      else 0.0)
  }

  private[graft] def codeVecColForTest(meta: PqIndexMeta, m: Int, code: Column): Column =
    codeVecCol(meta.cbs(m), code)
  private[graft] def probeSideForTest(s: SparkSession, d: String, meta: PqIndexMeta): DataFrame =
    refineMultiProbe(
      residualFrameFrom(s, d, meta.cents, meta.bits)
        .filter(col("vec_id") % ProbeMod === 0),
      meta.bits)

  /** Reconstructed sub-vector for a stored code column: chained CASE over
    * sub-codebook `cb`'s ≤[[PqK]] literal vectors — bounded metadata, no
    * join, the decode mirror of [[pqBests]]'s encode argmin. */
  private def codeVecCol(cb: Seq[(Long, Seq[Double])], code: Column): Column =
    cb.tail.foldLeft(when(code === cb.head._1, typedlit(cb.head._2))) {
      case (acc, (cid, cv)) => acc.when(code === cid, typedlit(cv))
    }

  /** The stored-index ADC search tail shared by s16/s17/s18 and q58's
    * per-batch serving path: codes (any layout — base table, base ∪
    * segments, compacted generation) × exploded probe residuals →
    * broadcast-probe cellr equi-join → per-probe ADC top-k.
    *
    * ROUND-ROBIN spread before the broadcast-probe join: a bucketed scan
    * plans ONE task per bucket, and this join's work rides the SQUARE of
    * each cellr's population (pair mass = rows × ring hits, both ∝ the
    * cell count; measured 28–1608 rows/cellr at ×100 — 26× the mean pair
    * mass at the top), so hash-of-cellr task assignment convoys the hot
    * cells into a few tasks (measured: 136 s vs s09's 80 on IDENTICAL
    * pair counts — s09's candidate scan interleaves cellrs across file
    * splits and never sees the skew). The exchange moves only the codes
    * themselves (~10 small ints per vector, the compressed index — the
    * cheapest possible shuffle of this corpus) and decouples pair-work
    * parallelism from bucket count. The bucketed layout still serves the
    * shuffle-join regime (probe sets too large to broadcast), where
    * cellr co-location pays and per-bucket skew is the usual salting
    * problem, not this plan's.
    *
    * rres is reconstructed BELOW the exchange on purpose: whole-stage
    * codegen defers non-join-key streamed columns into the match loop,
    * so a fully-codegen-able reconstruction fused into the join stage
    * re-evaluates PER PAIR (measured: 62M CASE-chain+concat evaluations,
    * 390 s) — the exchange materializes it once per candidate row and
    * the join then reads a plain array column. The shuffle carries
    * codes + the 64-double rres (~0.6 KB/row of THIS corpus's rows —
    * still the cheapest stage of the query by far). */
  private def adcSearch(
      s: SparkSession, codes: DataFrame, p: DataFrame,
      meta: PqIndexMeta): DataFrame = {
    val rres = concat(
      (0 until SubSpaces).map(m => codeVecCol(meta.cbs(m), col(s"c$m"))): _*)
    val cand = codes.select(
      Seq(col("vec_id"), col("cellr"), rres.as("rres")) ++
        (0 until SubSpaces).map(m => col(s"c$m")): _*)
      .repartition(s.sparkContext.defaultParallelism * 4)
    val adc = sqdCol(col("p.res"), col("e.rres"))
    val w = Window.partitionBy("probe_id").orderBy(col("adc"), col("neighbor_id"))
    broadcast(p.as("p"))
      .join(cand.as("e"),
        col("p.cellr") === col("e.cellr") && col("p.vec_id") =!= col("e.vec_id"))
      .select(Seq(col("p.vec_id").as("probe_id"), col("p.cell").as("cell"),
        col("e.vec_id").as("neighbor_id")) ++
        (0 until SubSpaces).map(m => col(s"e.c$m").as(s"c$m")) :+
        adc.as("adc"): _*)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(Seq(col("probe_id"), col("cell"), col("rank"), col("neighbor_id")) ++
        (0 until SubSpaces).map(m => col(s"c$m")) :+
        Stable.r4(col("adc")).as("adc_sqdist"): _*)
  }

  /** s16 — s09 served from the PERSISTED index: the candidate side reads
    * the bucketed codes table (vec_id, cell, cellr, c0..c7 — no floats)
    * and reconstructs each residual from the spec file's codebook
    * literals as a map-only projection; the probe side re-derives exact
    * residuals for the ≈1/[[ProbeMod]] probe rows from the spec's
    * centroid literals (map-only over the embeddings scan — the query's
    * vectors must come from the query, only the INDEX is precomputed).
    * No s03 job, no Lloyd jobs, no corpus-wide encode — the 16-job
    * training pipeline runs at BUILD time once per corpus, across JVMs
    * (round-13 verdict #1). Result-identical to s09 by construction
    * (same oracle SQL verbatim): the stored codes/cells are s09's own
    * encode output, the spec literals are raw-bit round-trips of the
    * trained values, and the join/rank tail is s09's ([[adcSearch]]). */
  val s16IvfPqIndexed = QueryDef(
    "s16_ivfpq_indexed", s09IvfPqAdc.oracle.get) { (s, d) =>
    val (codes, meta) = pqStoredIndex(s, d)
    val p = refineMultiProbe(
      residualFrameFrom(s, d, meta.cents, meta.bits)
        .filter(col("vec_id") % ProbeMod === 0),
      meta.bits)
    adcSearch(s, codes, p, meta)
  }

  // ---------- s17: incremental APPEND to the persisted vector index ----------

  /** Delta ids = source id + segment offset. Disjointness from REAL ids
    * (and between segments) holds ONLY while every [[PqDeltaBlockSpan]]-id
    * block of the corpus keeps its local ids under [[PqDeltaIdOffset]]
    * (ADVICE r15 #4 — previously an unstated assumption): the scale
    * gate's disjoint-copy corpora space copy blocks [[PqDeltaBlockSpan]]
    * apart, so a block's delta ids land in [off, off+1M) ⊂ the same
    * block, colliding with nothing as long as local ids stay < 1M. The
    * append path ASSERTS this (one vec_id-only column-pruned agg per
    * append — never per read) instead of trusting it. */
  private[graft] val PqDeltaIdOffset = 1000000L
  // the scale gate's copy-block IdShift references THIS constant
  // (ADVICE r16: one shared value, no twin literal to drift)
  private[graft] val PqDeltaBlockSpan = 10000000L
  private val PqDeltaMod = 10
  private val PqDeltaRes = 5
  private val PqDeltaRes2 = 7

  /** A deterministic DELTA-batch definition — one "day" of synthesized
    * vector ingest (d16's convention for the vector family): every corpus
    * vector with vec_id % [[PqDeltaMod]] == `res`, re-identified past
    * `offset`, its embedding passed through an EXACT element permutation
    * (no float arithmetic, so both engines carry bit-identical vectors;
    * the norm is computed on the permuted array in both, bit-identical).
    * Segment 1 REVERSES (offset keeps a probe slice inside the delta:
    * ids ≡ 25 mod 50 hit vec_id % [[ProbeMod]] == 0 after the shift);
    * segment 2 ROTATES by half — a second independent permutation, so a
    * second day's vectors land in unrelated cells. `tag` is the segment's
    * identity, recorded in its spec file so a changed delta convention
    * invalidates the segment the same way a changed corpus does. */
  private[graft] final case class PqDeltaDef(seg: Int, res: Int, offset: Long) {
    def tag: String =
      s"seg=$seg xf=${if (seg == 1) "rev" else "rot"} mod=$PqDeltaMod res=$res off=$offset"
    def xform(c: Column): Column =
      if (seg == 1) reverse(c)
      else concat(slice(c, Dims / 2 + 1, Dims / 2), slice(c, 1, Dims / 2))
    /** DuckDB twin of [[xform]]. */
    def xformSql(e: String): String =
      if (seg == 1) s"list_reverse($e)"
      else s"($e[${Dims / 2 + 1}:$Dims] || $e[1:${Dims / 2}])"
  }
  private[graft] val PqDelta1 = PqDeltaDef(1, PqDeltaRes, PqDeltaIdOffset)
  private[graft] val PqDelta2 = PqDeltaDef(2, PqDeltaRes2, 2 * PqDeltaIdOffset)

  /** The segment's synthesized incoming vectors: (vec_id, embedding, nrm). */
  private[operators] def deltaVecs(
      s: SparkSession, d: String, dd: PqDeltaDef = PqDelta1): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") % PqDeltaMod === dd.res)
      .select((col("vec_id") + dd.offset).as("vec_id"),
        dd.xform(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), normCol(col("embedding")).as("nrm"))

  private def pqDeltaTable(d: String, dd: PqDeltaDef): String =
    if (dd.seg == 1) s"graft_pqidx_delta_${Dedup.pathKey(d)}"
    else s"graft_pqidx_delta${dd.seg}_${Dedup.pathKey(d)}"

  /** Mode/seconds map key for segment `dd` of directory `d` — segment 1
    * keeps the bare directory key (the gate and the r15 specs read it). */
  private def deltaKey(d: String, dd: PqDeltaDef): String =
    if (dd.seg == 1) d else s"$d#seg${dd.seg}"

  /** What the last [[pqDeltaSegment]] call did per directory ("cached" /
    * "reregistered" / "appended") and the append seconds when "appended"
    * — the delta twin of [[vecIndexBuildMode]], read by the gate's timed
    * `s17_delta_append` entry and the no-Lloyd spec. */
  private[graft] val vecDeltaMode =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] val vecDeltaSec =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Incremental APPEND to the persisted vector index (round-14 verdict
    * #1 — the index's one missing lifecycle step: any corpus change
    * forced a FULL retrain + re-encode, turning a daily vector ingest
    * into a daily 16-Lloyd-job retrain at 100 TB; d16/d17 closed exactly
    * this for text near-dup). Standard IVF practice: NEW vectors are
    * encoded with the FROZEN spec-file centroids/codebooks — cell argmax,
    * residual, per-subspace code argmin, all against literals, a MAP-ONLY
    * delta-sized projection with zero training jobs (the no-Lloyd spec
    * pins [[pqTrainCalls]]/[[centroidJobCalls]] unmoved) — and land in a
    * DELTA SEGMENT: a second bucketed EXTERNAL table with the same
    * `cellr` bucketing as the base codes table, its spec file written
    * LAST (fingerprint = base corpus+params fp + the segment's tag), so a
    * crashed append self-heals into a re-append and the base table is
    * never mutated in place (the LSM/Faiss-shard shape;
    * [[pqCompactedIndex]] folds segments into a new base GENERATION at
    * leisure). Readers union base + segments. A changed base corpus (or
    * training params) flips the recorded fingerprint and re-encodes the
    * delta against the REBUILT spec — frozen-codebook reuse never
    * outlives the codebooks themselves. ADVICE r15 (medium): the cached
    * path re-validates the recorded fingerprint (the in-memory
    * [[pqDeltaFpCache]], populated only by paths that checked or wrote
    * the on-disk spec) instead of trusting catalog existence alone — a
    * persistent metastore can hold a table whose codes predate a base
    * rebuild. */
  private[graft] def pqDeltaSegment(
      s: SparkSession, d: String, meta: PqIndexMeta,
      dd: PqDeltaDef = PqDelta1): DataFrame = {
    val deltaT = pqDeltaTable(d, dd)
    val k = deltaKey(d, dd)
    val loc = s"${Dedup.warehouseDir(s)}/$deltaT"
    val specPath = java.nio.file.Paths.get(loc, PqIdxSpecFile)
    val fp = pqSpecFingerprint(d) + "|" + dd.tag
    if (s.catalog.tableExists(deltaT) && Option(pqDeltaFpCache.get(k)).contains(fp)) {
      vecDeltaMode.put(k, "cached")
      graft.pipeline.Bucketing.readBucketed(s, deltaT)
    } else {
      val onDisk =
        if (java.nio.file.Files.exists(specPath))
          Some(java.nio.file.Files.readString(specPath).split("\n", 2))
        else None
      onDisk match {
        case Some(Array(sfp, ddl)) if sfp == fp =>
          if (s.catalog.tableExists(deltaT)) vecDeltaMode.put(k, "cached")
          else {
            s.sql(s"""CREATE TABLE $deltaT ($ddl) USING parquet
                     |CLUSTERED BY (cellr) SORTED BY (cellr)
                     |INTO $PqIdxBuckets BUCKETS
                     |LOCATION '$loc'""".stripMargin)
            vecDeltaMode.put(k, "reregistered")
          }
          pqDeltaFpCache.put(k, fp)
          graft.pipeline.Bucketing.readBucketed(s, deltaT)
        case _ =>
          val t0 = System.nanoTime()
          s.sql(s"DROP TABLE IF EXISTS $deltaT")
          try Reconcile.deleteRecursively(loc)
          catch { case _: Exception => () }
          // the <1M-local-ids disjointness assumption, asserted (see
          // [[PqDeltaIdOffset]]) — a vec_id-only column-pruned agg, paid
          // once per APPEND, never per read
          val maxLocal = Tables.embeddings(s, d)
            .agg(max(col("vec_id") % PqDeltaBlockSpan)).head.getLong(0)
          require(maxLocal < PqDeltaIdOffset,
            s"delta-id disjointness violated: max local vec_id $maxLocal >= " +
              s"$PqDeltaIdOffset — delta ids would collide with real vectors " +
              s"(raise PqDeltaIdOffset / re-space id blocks)")
          val rf = residualFrameOf(deltaVecs(s, d, dd), meta.cents, meta.bits)
          val bests = pqBests(meta.cbs)
          val codes = withSourceLang(s, d, rf.select(
            Seq(col("vec_id"), col("cell"), col("cellr")) ++
              bests.zipWithIndex.map { case (b, m) => b.getField("cid").as(s"c$m") }: _*))
          graft.pipeline.Bucketing.writeBucketed(
            codes, deltaT, Seq("cellr"), PqIdxBuckets, Some(loc))
          java.nio.file.Files.writeString(
            specPath, fp + "\n" + codes.schema.toDDL)
          pqDeltaFpCache.put(k, fp)
          vecDeltaMode.put(k, "appended")
          vecDeltaSec.put(k, (System.nanoTime() - t0) / 1e9)
          graft.pipeline.Bucketing.readBucketed(s, deltaT)
      }
    }
  }

  /** Recorded-and-validated spec fingerprint per delta segment — the
    * in-memory gate on [[pqDeltaSegment]]'s cached path. Populated ONLY
    * after the on-disk spec was read (or written) with a matching
    * fingerprint; cleared by every invalidation. */
  private val pqDeltaFpCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Drop the DELTA segments for `d` (the base index survives) — the
    * forced-append timing's invalidation hook, and [[pqStoredIndex]]'s
    * rebuild-branch cleanup. Folding generations are derived from the
    * segments, so the compacted table falls with them. */
  private[graft] def invalidatePqDelta(d: String): Unit = {
    Seq(PqDelta1, PqDelta2).foreach { dd =>
      val k = deltaKey(d, dd)
      vecDeltaMode.remove(k)
      pqDeltaFpCache.remove(k)
      val t = pqDeltaTable(d, dd)
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach { s =>
        try {
          s.sql(s"DROP TABLE IF EXISTS $t")
          try Reconcile.deleteRecursively(s"${Dedup.warehouseDir(s)}/$t")
          catch { case _: Exception => () }
        } catch { case _: Exception => () }
      }
    }
    invalidatePqCompact(d)
  }

  /** Force-or-ensure the delta segment, returning (mode, append seconds —
    * 0 unless "appended"): the gate's `s17_delta_append` timing hook.
    * The base index is ensured first (never forced here — the forced
    * BUILD timing is [[ensurePqIndex]]'s), so the returned seconds time
    * the DELTA-SIZED append alone. */
  private[graft] def ensurePqDelta(
      s: SparkSession, d: String, force: Boolean = false): (String, Double) = {
    val (_, meta) = pqStoredIndex(s, d)
    if (force) invalidatePqDelta(d)
    pqDeltaSegment(s, d, meta)
    val mode = vecDeltaMode.getOrDefault(d, "none")
    (mode,
      if (mode == "appended") Option(vecDeltaSec.get(d)).fold(0.0)(_.doubleValue())
      else 0.0)
  }

  // ---------- s18: segment COMPACTION into a new base generation ----------

  private def pqCompactTable(d: String): String =
    s"graft_pqidx_compact_${Dedup.pathKey(d)}"

  /** What the last [[pqCompactedIndex]] call did per directory ("cached" /
    * "reregistered" / "compacted") and the fold seconds when "compacted" —
    * the compaction twin of [[vecIndexBuildMode]], read by the gate's
    * timed `s18_compact` entry. */
  private[graft] val vecCompactMode =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] val vecCompactSec =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  private val pqCompactFpCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** COMPACTION — the LSM fold that completes the index lifecycle
    * (round-15 verdict #3: build → append → ??? had no third step; a
    * year of daily appends would accumulate 365 segments and every
    * search would union them all). Folds the base codes table plus the
    * given delta segments into ONE new bucketed table — a bucketed
    * REWRITE of already-frozen codes: zero Lloyd jobs, zero encode work,
    * zero float math (the no-retrain spec pins [[pqTrainCalls]]/
    * [[centroidJobCalls]] unmoved across a forced compaction), so the
    * result is row-identical to the union it replaces BY CONSTRUCTION —
    * s18 declares exactly s17's oracle, verbatim. The LSM discipline:
    * the fold writes a new GENERATION (its own external table + spec,
    * marker-last, fingerprint = base fp + the ordered segment tags) and
    * never mutates the base in place — s16/s17 keep serving their own
    * layouts unchanged, readers of the compacted generation get the
    * single-table scan (no per-query union, segment-count-independent
    * plans), and retiring the folded segments is the operator's separate
    * choice ([[invalidatePqDelta]]). 100 TB: compaction cost is one
    * corpus-compressed shuffle-free bucketed rewrite (~10 small ints per
    * vector — the cheapest possible rewrite of the index), scheduled at
    * leisure, amortized over every search that follows. */
  private[graft] def pqCompactedIndex(
      s: SparkSession, d: String,
      segs: Seq[PqDeltaDef] = Seq(PqDelta1)): (DataFrame, PqIndexMeta) = {
    val (base, meta) = pqStoredIndex(s, d)
    val compT = pqCompactTable(d)
    val loc = s"${Dedup.warehouseDir(s)}/$compT"
    val specPath = java.nio.file.Paths.get(loc, PqIdxSpecFile)
    val fp = pqSpecFingerprint(d) +
      segs.sortBy(_.seg).map(dd => "|" + dd.tag).mkString
    if (s.catalog.tableExists(compT) && Option(pqCompactFpCache.get(d)).contains(fp)) {
      vecCompactMode.put(d, "cached")
      (graft.pipeline.Bucketing.readBucketed(s, compT), meta)
    } else {
      val onDisk =
        if (java.nio.file.Files.exists(specPath))
          Some(java.nio.file.Files.readString(specPath).split("\n", 2))
        else None
      onDisk match {
        case Some(Array(sfp, ddl)) if sfp == fp =>
          if (s.catalog.tableExists(compT)) vecCompactMode.put(d, "cached")
          else {
            s.sql(s"""CREATE TABLE $compT ($ddl) USING parquet
                     |CLUSTERED BY (cellr) SORTED BY (cellr)
                     |INTO $PqIdxBuckets BUCKETS
                     |LOCATION '$loc'""".stripMargin)
            vecCompactMode.put(d, "reregistered")
          }
          pqCompactFpCache.put(d, fp)
          (graft.pipeline.Bucketing.readBucketed(s, compT), meta)
        case _ =>
          val t0 = System.nanoTime()
          s.sql(s"DROP TABLE IF EXISTS $compT")
          try Reconcile.deleteRecursively(loc)
          catch { case _: Exception => () }
          val folded = segs.sortBy(_.seg)
            .map(dd => pqDeltaSegment(s, d, meta, dd))
            .foldLeft(base)(_ unionByName _)
          graft.pipeline.Bucketing.writeBucketed(
            folded, compT, Seq("cellr"), PqIdxBuckets, Some(loc))
          java.nio.file.Files.writeString(
            specPath, fp + "\n" + folded.schema.toDDL)
          pqCompactFpCache.put(d, fp)
          vecCompactMode.put(d, "compacted")
          vecCompactSec.put(d, (System.nanoTime() - t0) / 1e9)
          (graft.pipeline.Bucketing.readBucketed(s, compT), meta)
      }
    }
  }

  /** Drop only the COMPACTED generation for `d` (base + segments
    * survive) — the forced-compaction timing's invalidation hook, and
    * the derived-layer cleanup called by every base/segment
    * invalidation. */
  private[graft] def invalidatePqCompact(d: String): Unit = {
    vecCompactMode.remove(d)
    pqCompactFpCache.remove(d)
    val t = pqCompactTable(d)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach { s =>
      try {
        s.sql(s"DROP TABLE IF EXISTS $t")
        try Reconcile.deleteRecursively(s"${Dedup.warehouseDir(s)}/$t")
        catch { case _: Exception => () }
      } catch { case _: Exception => () }
    }
  }

  /** Force-or-ensure the compacted generation, returning (mode, fold
    * seconds — 0 unless "compacted"): the gate's `s18_compact` timing
    * hook, [[ensurePqDelta]]'s contract. Base and segments are ensured,
    * never forced, so the returned seconds time the FOLD alone. */
  private[graft] def ensurePqCompact(
      s: SparkSession, d: String, force: Boolean = false): (String, Double) = {
    if (force) invalidatePqCompact(d)
    pqCompactedIndex(s, d)
    val mode = vecCompactMode.getOrDefault(d, "none")
    (mode,
      if (mode == "compacted") Option(vecCompactSec.get(d)).fold(0.0)(_.doubleValue())
      else 0.0)
  }

  /** Per-micro-batch ANN enrichment against the PERSISTED index — q58's
    * foreachBatch body: every arriving row is a PROBE (exact residual
    * derived map-only from the spec's centroid literals), ranked by ADC
    * against the stored codes. Two serving disciplines close the
    * round-15 verdict's two q58 findings:
    *
    *  - **The candidate read is CELL-PRUNED per batch.** The batch's
    *    distinct probe `cellr`s — a bounded driver collect, ≤ |batch| ×
    *    (1 + bits + C(bits,2)) longs — become an `isin` filter on the
    *    bucketed codes read BEFORE reconstruction and the round-robin
    *    exchange, so bucket pruning (BucketingSpec) reduces the scan to
    *    the touched buckets and the shuffle moves only touched-cell
    *    codes. The prune is a semantic no-op (the join key equality
    *    implies every surviving candidate's cellr ∈ the probe set); what
    *    it removes is the previous shape's per-batch FULL-INDEX scan +
    *    repartition — a corpus-compressed shuffle per micro-batch at
    *    100 TB. Per-batch cost is now ∝ touched cells, which is what an
    *    online serving path must be.
    *  - **The index side is base ∪ delta segment** ([[pqDeltaSegment]]) —
    *    vectors appended since the last full build are visible online,
    *    the s17 lifecycle served rather than contradicted.
    *
    * The index side is static (reloaded from the catalog per batch plan,
    * the q55 stream-static contract); there is ZERO stream state, so
    * stream length never grows anything.
    *
    * `layout` selects which PHYSICAL arrangement of the same logical
    * index serves the batch — the LSM parity contract (round-15 verdict
    * #7): `"union"` (the default, q58's declared shape) reads base codes
    * table ∪ delta segment; `"compacted"` reads the [[pqCompactedIndex]]
    * generation; `"oneshot"` ranks against the from-scratch frozen-spec
    * encode of the unioned corpus ([[oneShotUnionCodesForTest]]). All
    * three are row-identical by construction (codes are frozen-spec
    * deterministic, compaction is a pure rewrite), so an operator may
    * compact mid-stream without a result change — SimilaritySpec pins
    * the three-way equality on a served batch. */
  /** `langFilter`: q58 × s19 — FILTERED online serving (verdict r16 #7,
    * the composition a production retrieval stack actually runs). The
    * predicate lands on the persisted `lang` column of the CELL-PRUNED
    * candidate read — conjoined with the `isin` prune it is one more
    * pushed scan predicate on the bucketed codes (PlanSpec pins
    * PushedFilters), never a per-batch join; semantics are s19's true
    * pre-filter (top-k = best k QUALIFYING neighbors). */
  private[graft] def annEnrichBatch(
      s: SparkSession, d: String, batch: DataFrame,
      layout: String = "union", langFilter: Option[String] = None): DataFrame = {
    val (codes0, meta) = layout match {
      case "compacted" => pqCompactedIndex(s, d)
      case "oneshot" =>
        val (_, m) = pqStoredIndex(s, d)
        (oneShotUnionCodesForTest(s, d), m)
      case _ =>
        val (b, m) = pqStoredIndex(s, d)
        (b.unionByName(pqDeltaSegment(s, d, m)), m)
    }
    val codes = langFilter.fold(codes0)(l => codes0.filter(col("lang") === lit(l)))
    val src = batch.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"))
    val p = refineMultiProbe(
      residualFrameOf(src, meta.cents, meta.bits), meta.bits)
    val touched = p.select(col("cellr")).distinct()
      .collect().map(_.get(0)).toSeq
    adcSearch(s, codes.filter(col("cellr").isin(touched: _*)), p, meta)
  }

  /** Serve `batch` against each of the three physical layouts of the same
    * logical index ([[annEnrichBatch]]'s `layout`), returning the collected
    * row-sets — the parity test's hook, kept here so the layout names stay
    * next to their dispatch. */
  private[graft] def annServeAllLayoutsForTest(
      s: SparkSession, d: String, batch: DataFrame,
      langFilter: Option[String] = None): Map[String, Seq[String]] =
    Seq("union", "compacted", "oneshot").map { lay =>
      lay -> annEnrichBatch(s, d, batch, lay, langFilter)
        .collect().map(_.toString).sorted.toSeq
    }.toMap

  /** q58's staged-stream source: the probe slice of base ∪ delta — the
    * same probe population as s17's, so q58 declares s17's oracle
    * verbatim, and some probes ARE appended vectors: the online path's
    * visibility of the delta segment is oracle-exercised, not asserted. */
  private[graft] def unionProbeVecs(s: SparkSession, d: String): DataFrame =
    vecs(s, d).unionByName(deltaVecs(s, d))
      .filter(col("vec_id") % ProbeMod === 0)
      .select(col("vec_id"), col("embedding"))

  /** Serving-occupancy gauge for the gate (the lsh_occupancy discipline
    * applied to q58's online path): candidate JOIN rows per probe for
    * `batch` — the per-batch work driver, which must stay ~flat as the
    * corpus grows because both the ring size and the per-cell population
    * are corpus-scaled ([[cellRefineBits]]). */
  private[graft] def annServeCandPerProbe(
      s: SparkSession, d: String, batch: DataFrame): (Double, Double) = {
    val (base, meta) = pqStoredIndex(s, d)
    val codes = base.unionByName(pqDeltaSegment(s, d, meta))
    val src = batch.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"))
    val p = refineMultiProbe(
      residualFrameOf(src, meta.cents, meta.bits), meta.bits)
    val touched = p.select(col("cellr")).distinct()
      .collect().map(_.get(0)).toSeq
    val probes = math.max(1L, batch.select(col("vec_id")).distinct().count())
    // ring rows = probes × (1 + bits [+ C(bits,2) past TwoBitFlipMinBits])
    // — the DELIBERATE log-factor recall remedy (refineMultiProbe). The
    // flatness claim the index design actually makes is per-RING-ROW
    // occupancy ≈ the corpus-scaled refined-cell population (TargetCell):
    // dividing by probes alone folds the ring factor into the gauge and
    // reads the designed log growth as corpus-scale growth (the first
    // ever ×10 reading: 225 → 1152/probe, which is 4-ring × a FLAT ~280
    // per ring row). Returns (perProbe, perRingRow): the former recorded
    // raw, the latter carries the 3× flatness bound.
    val ringRows = math.max(1L, p.count())
    val pairs = broadcast(p.as("p"))
      .join(codes.filter(col("cellr").isin(touched: _*)).as("e"),
        col("p.cellr") === col("e.cellr") && col("p.vec_id") =!= col("e.vec_id"))
      .count()
    (pairs.toDouble / probes, pairs.toDouble / ringRows)
  }

  /** Test hook (append-vs-rebuild equivalence): the ONE-SHOT frozen-spec
    * encode of the UNIONED corpus — what a from-scratch encode with the
    * same spec would store. The append path must agree with this row-set
    * exactly (same codes, no duplicates, nothing missing), which is what
    * makes "append" a pure storage optimization rather than a semantics
    * change. */
  private[graft] def oneShotUnionCodesForTest(
      s: SparkSession, d: String,
      segs: Seq[PqDeltaDef] = Seq(PqDelta1)): DataFrame = {
    val (_, meta) = pqStoredIndex(s, d)
    val rf = residualFrameOf(
      segs.map(deltaVecs(s, d, _)).foldLeft(vecs(s, d))(_ unionByName _),
      meta.cents, meta.bits)
    val bests = pqBests(meta.cbs)
    withSourceLang(s, d, rf.select(
      Seq(col("vec_id"), col("cell"), col("cellr")) ++
        bests.zipWithIndex.map { case (b, m) => b.getField("cid").as(s"c$m") }: _*))
  }

  /** Test hook: base codes table ∪ delta segment, as s17's candidate side
    * reads them (before reconstruction). */
  private[graft] def storedUnionCodesForTest(s: SparkSession, d: String): DataFrame = {
    val (base, meta) = pqStoredIndex(s, d)
    base.unionByName(pqDeltaSegment(s, d, meta))
  }

  /** Encode-only oracle block for subspace `m` over the delta rsub CTE:
    * the [[pqSubBlockSql]] final step against the FROZEN s{m}c2 codebook
    * — no seed, no Lloyd rounds, exactly the frozen-spec reuse the Spark
    * append path performs. */
  private def pqSubEncodeSql(m: Int): String =
    s"""d${m}enc AS (
       |  SELECT r.vec_id, $m AS sub, c.cid AS code, c.cvec
       |  FROM (SELECT vec_id, sv FROM drsub WHERE sub = $m) r CROSS JOIN s${m}c2 c
       |  QUALIFY row_number() OVER (PARTITION BY r.vec_id
       |                             ORDER BY ${sqdSql("r.sv", "c.cvec")}, c.cid) = 1)""".stripMargin

  /** s17 — s16 over the index PLUS an incrementally APPENDED delta batch:
    * the corpus is base ∪ delta ([[deltaVecs]] — reversed-embedding twins
    * past [[PqDeltaIdOffset]]); training (coarse centroids + sub-
    * codebooks) runs on the BASE only, the delta is encoded with those
    * FROZEN codebooks, probes come from the union (some probes ARE new
    * vectors), and the candidate side reads base codes table ∪ delta
    * segment. Oracle = s09's chain verbatim for training + base encode,
    * plus a frozen-codebook encode of the delta (QUALIFY argmin against
    * s{m}c2 — no retraining CTEs), search over the union.
    *
    * 100 TB shape: the recurring cost of a daily vector ingest is the
    * delta-sized map-only encode + one delta-segment bucketed write —
    * never a Lloyd job, never a corpus-scale scan ([[pqDeltaSegment]]'s
    * scaladoc; the gate times the forced append next to the forced full
    * build). */
  /** s17's oracle chain (train on base, frozen-encode the delta, search
    * the union), parameterized by an optional candidate-side language
    * restriction (q59's filtered online serving). A DELTA candidate's
    * attribute is its SOURCE document's — the filtered variant threads
    * `src` (vec_id stripped of the segment offset) through `acand` and
    * joins documents on it, the oracle-side mirror of
    * [[withSourceLang]]'s persisted column. */
  private[graft] def ivfPqAppendOracleSql(langFilter: Option[String]): String = {
      val acandSql = langFilter match {
        case None => "acand AS (SELECT * FROM cand UNION ALL SELECT * FROM dcand)"
        case Some(_) =>
          s"""acand AS (
             |  SELECT vec_id, cell, rres, codes, vec_id AS src FROM cand
             |  UNION ALL
             |  SELECT vec_id, cell, rres, codes, vec_id - $PqDeltaIdOffset AS src FROM dcand)"""
            .stripMargin
      }
      val langJoin = langFilter.fold("")(l =>
        s"\n  JOIN documents dd ON c.src = dd.doc_id AND dd.lang = '$l'")
      val centroidSql = s03Centroids.oracle.get
      s"""WITH cents0 AS (${centroidSql.replace("\n", "\n  ")}),
         |cents AS (
         |  SELECT label,
         |         list_transform(list(centroid ORDER BY dim_pos), x -> CAST(x AS REAL)) AS cvec
         |  FROM cents0 GROUP BY label),
         |cn AS (SELECT label, cvec, ${normSql("cvec")} AS cnorm FROM cents),
         |e AS ($vecsSql),
         |assigned AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, cn.label AS cell,
         |           row_number() OVER (
         |             PARTITION BY e.vec_id
         |             ORDER BY ${dotSql("e.embedding", "cn.cvec")} / (e.nrm * cn.cnorm) DESC,
         |                      cn.label) AS rn
         |    FROM e CROSS JOIN cn) WHERE rn = 1),
         |res AS (
         |  SELECT a.vec_id, a.cell,
         |         list_transform(list_zip(a.embedding, cc.cvec),
         |                        pp -> CAST(pp[1] AS DOUBLE) - CAST(pp[2] AS DOUBLE)) AS res
         |  FROM assigned a JOIN cents cc ON a.cell = cc.label),
         |rsub AS (
         |  SELECT vec_id, sub, res[sub * $SubDim + 1 : sub * $SubDim + $SubDim] AS sv
         |  FROM res CROSS JOIN (SELECT unnest(generate_series(0, ${SubSpaces - 1})) AS sub) ss),
         |${(0 until SubSpaces).map(pqSubBlockSql).mkString(",\n")},
         |encoded AS (${(0 until SubSpaces).map(m => s"SELECT * FROM s${m}enc")
           .mkString("\n  ", "\n  UNION ALL ", "")}),
         |recon AS (
         |  SELECT vec_id, flatten(list(cvec ORDER BY sub)) AS rres,
         |         list(code ORDER BY sub) AS codes
         |  FROM encoded GROUP BY vec_id),
         |cand AS (
         |  SELECT r.vec_id, r.cell, rc.rres, rc.codes
         |  FROM res r JOIN recon rc USING (vec_id)),
         |de AS (SELECT vec_id + $PqDeltaIdOffset AS vec_id, list_reverse(embedding) AS embedding
         |       FROM embeddings WHERE vec_id % $PqDeltaMod = $PqDeltaRes),
         |den AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM de),
         |dassigned AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT den.vec_id, den.embedding, cn.label AS cell,
         |           row_number() OVER (
         |             PARTITION BY den.vec_id
         |             ORDER BY ${dotSql("den.embedding", "cn.cvec")} / (den.nrm * cn.cnorm) DESC,
         |                      cn.label) AS rn
         |    FROM den CROSS JOIN cn) WHERE rn = 1),
         |dres AS (
         |  SELECT a.vec_id, a.cell,
         |         list_transform(list_zip(a.embedding, cc.cvec),
         |                        pp -> CAST(pp[1] AS DOUBLE) - CAST(pp[2] AS DOUBLE)) AS res
         |  FROM dassigned a JOIN cents cc ON a.cell = cc.label),
         |drsub AS (
         |  SELECT vec_id, sub, res[sub * $SubDim + 1 : sub * $SubDim + $SubDim] AS sv
         |  FROM dres CROSS JOIN (SELECT unnest(generate_series(0, ${SubSpaces - 1})) AS sub) ss2),
         |${(0 until SubSpaces).map(pqSubEncodeSql).mkString(",\n")},
         |dencoded AS (${(0 until SubSpaces).map(m => s"SELECT * FROM d${m}enc")
           .mkString("\n  ", "\n  UNION ALL ", "")}),
         |drecon AS (
         |  SELECT vec_id, flatten(list(cvec ORDER BY sub)) AS rres,
         |         list(code ORDER BY sub) AS codes
         |  FROM dencoded GROUP BY vec_id),
         |dcand AS (
         |  SELECT r.vec_id, r.cell, rc.rres, rc.codes
         |  FROM dres r JOIN drecon rc USING (vec_id)),
         |ares AS (SELECT vec_id, cell, res FROM res
         |         UNION ALL SELECT vec_id, cell, res FROM dres),
         |$acandSql,
         |scored AS (
         |  SELECT p.vec_id AS probe_id, p.cell, c.vec_id AS neighbor_id, c.codes,
         |         ${sqdSql("p.res", "c.rres")} AS adc
         |  FROM (SELECT * FROM ares WHERE vec_id % $ProbeMod = 0) p
         |  JOIN acand c ON p.cell = c.cell AND p.vec_id <> c.vec_id$langJoin),
         |ranked AS (
         |  SELECT probe_id, cell, neighbor_id, codes, adc,
         |         row_number() OVER (PARTITION BY probe_id
         |                            ORDER BY adc, neighbor_id) AS rank
         |  FROM scored)
         |SELECT probe_id, cell, rank, neighbor_id,
         |       ${(0 until SubSpaces).map(m => s"codes[${m + 1}] AS c$m").mkString(", ")},
         |       ${Stable.sqlR4("adc")} AS adc_sqdist
         |FROM ranked WHERE rank <= $TopK""".stripMargin
  }

  val s17IvfPqAppend = QueryDef(
    "s17_ivfpq_append", ivfPqAppendOracleSql(None)) { (s, d) =>
    val (base, meta) = pqStoredIndex(s, d)
    val codes = base.unionByName(pqDeltaSegment(s, d, meta))
    // same read-path discipline as s16 ([[adcSearch]]): reconstruct rres
    // once per candidate row BELOW the round-robin exchange, then the
    // broadcast-probe join reads a plain array column
    val p = refineMultiProbe(
      residualFrameOf(vecs(s, d).unionByName(deltaVecs(s, d)), meta.cents, meta.bits)
        .filter(col("vec_id") % ProbeMod === 0),
      meta.bits)
    adcSearch(s, codes, p, meta)
  }

  /** s18 — s17's search served from the COMPACTED generation
    * ([[pqCompactedIndex]]: base + delta segment folded into ONE bucketed
    * table — the LSM lifecycle's third step, closing build → append →
    * compact). The candidate side is a single-table scan: no per-query
    * union, plan shape independent of how many segments have ever been
    * appended. Result-identical to s17 BY CONSTRUCTION — the fold is a
    * bucketed rewrite of the very rows s17 unions, with zero training
    * and zero re-encoding (spec-pinned) — so the oracle is s17's
    * verbatim. 100 TB: a year of daily appends stays one table + the
    * not-yet-folded tail instead of 365 unioned segments; the fold
    * itself is a corpus-compressed rewrite (~10 small ints per vector),
    * timed and gated like s16's build. */
  val s18IvfPqCompact = QueryDef(
    "s18_ivfpq_compact", s17IvfPqAppend.oracle.get) { (s, d) =>
    val (codes, meta) = pqCompactedIndex(s, d)
    val p = refineMultiProbe(
      residualFrameOf(vecs(s, d).unionByName(deltaVecs(s, d)), meta.cents, meta.bits)
        .filter(col("vec_id") % ProbeMod === 0),
      meta.bits)
    adcSearch(s, codes, p, meta)
  }

  // ---------- s13: scalar-quantized (SQ8) in-cell search ----------

  /** Global |x| bound of the NORMALIZED corpus — the SQ8 training step.
    * SYMMETRIC quantization on purpose: the per-dim affine form
    * (q = (x−mn)·255/(mx−mn)) looks tighter but its offsets do NOT cancel
    * in a dot product — Σ q_p·q_c acquires per-candidate cross-terms and
    * ranks by a different inner product entirely (measured recall@5
    * in-cell: 0.20). With one global scale, q = round(x·127/am) gives
    * Σ q_p·q_c ∝ Σ x_p·x_c up to quantization noise — the int8-GEMM
    * convention. max(|·|) is order-independent and the normalized values
    * are single IEEE divisions of exact inputs, so both engines derive
    * the bit-identical scalar independently — no literal crosses engines. */
  private[operators] def sq8Scale(s: SparkSession, d: String): Double =
    vecs(s, d)
      .select(array_max(transform(
        transform(col("embedding"), x => x.cast("double") / col("nrm")),
        x => abs(x))).as("m"))
      .agg(max(col("m"))).head.getDouble(0)

  /** SQ8 code of a normalized vector: q_i = floor(x_i·127/am + 0.5) ∈
    * [−127, 127]. Operand order matches the SQL twin exactly, so codes are
    * bit-identical cross-engine. */
  private def sq8Code(nv: Column, am: Double): Column =
    transform(nv, x => floor(x * lit(127.0) / lit(am) + lit(0.5)).cast("long"))

  /** s13 — scalar-quantized (SQ8) vector search, the THIRD production
    * index compression next to s02/s04's LSH and s09's PQ: each vector is
    * normalized, then every dimension quantized to 8 bits against ONE
    * global scale (training = a single max(|x|) scalar — vs s09's 16
    * Lloyd jobs; see [[sq8Scale]] for why symmetric, not per-dim affine).
    * The index stores ONLY (vec_id, cell, codes) — 8× smaller than
    * float32 — and ranking is the SYMMETRIC quantized dot product: an
    * all-INTEGER fold (|·| ≤ 64·127² per pair, int64-safe), so scores and
    * ranks hash exactly cross-engine with no rounding convention at all
    * (the t13/t18 ln-avoidance discipline applied to ANN ranking).
    * Normalizing BEFORE quantization makes the integer dot a cosine
    * surrogate (unnormalized SQ dot would favor long vectors — s14 gauges
    * exactly what the quantization costs vs exact cosine truth).
    *
    * Candidate structure is s05's verbatim: literal-centroid argmax cell
    * assignment (map-only), corpus-scaled refined cells, probe-side
    * refinement multi-probe — the only join is the refined-cell equi-join.
    * 100 TB: training is one tiny agg, encoding is map-only, candidate
    * work ≈1/k of the corpus per probe with occupancy pinned by
    * `cellRefineBits`. */
  val s13Sq8Search = QueryDef(
    "s13_sq8_search", {
      val centroidSql = s03Centroids.oracle.get
      val qdot = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, len(p.qc)), i -> p.qc[i] * e2.qc[i])), " +
        "(a, b) -> a + b)"
      s"""WITH cents0 AS (${centroidSql.replace("\n", "\n  ")}),
         |cents AS (
         |  SELECT label,
         |         list_transform(list(centroid ORDER BY dim_pos), x -> CAST(x AS REAL)) AS cvec
         |  FROM cents0 GROUP BY label),
         |cn AS (SELECT label, cvec, ${normSql("cvec")} AS cnorm FROM cents),
         |e AS ($vecsSql),
         |nv AS (
         |  SELECT vec_id, embedding, nrm,
         |         list_transform(generate_series(1, len(embedding)),
         |                        i -> CAST(embedding[i] AS DOUBLE) / nrm) AS nev
         |  FROM e),
         |sc AS (
         |  SELECT max(list_max(list_transform(nev, x -> abs(x)))) AS am FROM nv),
         |q AS (
         |  SELECT vec_id,
         |         list_transform(nev, x -> CAST(floor(x * 127.0 / am + 0.5) AS BIGINT)) AS qc
         |  FROM nv CROSS JOIN sc),
         |assigned AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, cn.label AS cell,
         |           row_number() OVER (
         |             PARTITION BY e.vec_id
         |             ORDER BY ${dotSql("e.embedding", "cn.cvec")} / (e.nrm * cn.cnorm) DESC,
         |                      cn.label) AS rn
         |    FROM e CROSS JOIN cn) WHERE rn = 1),
         |aq AS (
         |  SELECT a.vec_id, a.cell, q.qc FROM assigned a JOIN q ON q.vec_id = a.vec_id),
         |p AS (SELECT * FROM aq WHERE vec_id % $ProbeMod = 0),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, p.cell, e2.vec_id AS neighbor_id, $qdot AS qdot
         |  FROM p JOIN aq e2 ON p.cell = e2.cell AND p.vec_id <> e2.vec_id),
         |ranked AS (
         |  SELECT probe_id, cell, neighbor_id, qdot,
         |         row_number() OVER (PARTITION BY probe_id
         |                            ORDER BY qdot DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT probe_id, cell, rank, neighbor_id, qdot
         |FROM ranked WHERE rank <= $TopK""".stripMargin
    }) { (s, d) =>
    val am = sq8Scale(s, d)
    val scoredCells = centroidScoredCells(s, d)
    val bits = cellRefineBits(s, d)
    // the SQ8 INDEX: codes + cell only — embeddings are dropped (8×
    // compression is the point; s09 keeps the same discipline)
    val assigned = vecs(s, d)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (-array_max(scoredCells).getField("negCell")).as("cell"))
      .withColumn("cellr", refinedCellCol(col("cell"), col("embedding"), bits))
      .withColumn("qc",
        sq8Code(transform(col("embedding"), x => x.cast("double") / col("nrm")), am))
      .select("vec_id", "cell", "cellr", "qc")
    val p = refineMultiProbe(assigned.filter(col("vec_id") % ProbeMod === 0), bits)
    val qdot = aggregate(zip_with(col("p.qc"), col("e.qc"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("probe_id").orderBy(col("qdot").desc, col("neighbor_id"))
    broadcast(p.as("p"))
      .join(assigned.as("e"),
        col("p.cellr") === col("e.cellr") && col("p.vec_id") =!= col("e.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("p.cell").as("cell"),
        col("e.vec_id").as("neighbor_id"), qdot.as("qdot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("cell"), col("rank"), col("neighbor_id"), col("qdot"))
  }

  // ---------- s10–s12: recall accounting for the IVF family (verdict #6) ----------

  /** Recall@k of the IVF single-cell search (s05) vs exact ground truth. */
  val s10IvfRecall = recallDef("s10_ivf_recall", s05IvfSearch)
  /** Recall@k of the IVF multi-probe search (s06) — must dominate s10's
    * per-probe recall (more cells can only add candidates). */
  val s11IvfMultiProbeRecall = recallDef("s11_ivf_multiprobe_recall", s06IvfMultiProbe)
  /** Recall@k of IVF-PQ with ADC ranking (s09) — quantization error costs
    * ranking precision inside the cell; this pins how much. */
  val s12IvfPqRecall = recallDef("s12_ivfpq_recall", s09IvfPqAdc)

  /** Recall@k of the SQ8 integer-dot search (s13) — the standing gauge of
    * what 8-bit scalar quantization costs vs exact cosine truth (the
    * every-approximate-family-has-a-recall-entry convention). */
  val s14Sq8Recall = recallDef("s14_sq8_recall", s13Sq8Search)

  // ---------- s15: hybrid retrieval — lexical + vector rank fusion ----------

  /** Depth of each ranked list entering the fusion (the standard "fuse the
    * top-N of each retriever" contract — RRF is defined over ranked LISTS,
    * not full corpora). */
  private val RrfDepth = 100
  /** The RRF smoothing constant from Cormack/Clarke/Buettcher (SIGIR '09);
    * 60 is the published default every production fusion ships. */
  private val RrfK = 60
  private val RrfTopK = 20
  private val RrfProbeId = 0L

  /** s15 — HYBRID retrieval with reciprocal-rank fusion, the production
    * RAG/search-serving shape next to the pure retrievers (t18 ranks
    * lexically, s01/s02/s05 rank by embedding — nothing fused them): a
    * lexical top-[[RrfDepth]] list (t18's all-integer BM25 surrogate over
    * its fixed query term set) and a vector top-[[RrfDepth]] list (exact
    * cosine against probe vector [[RrfProbeId]], the query's embedding)
    * are joined on document id and scored by integer RRF —
    * `1e6 div (60 + rank)` summed over the lists that ranked the doc
    * (absent rank contributes 0, the standard convention). Ranks are
    * exact (integer lexical scores; the cosine side reuses s01's proven
    * bit-identical dot/norm arithmetic), so the fused score is exact
    * int64 and the cross-engine hash is byte-stable.
    *
    * 100 TB shape: each list is a global top-N — `ORDER BY … LIMIT n`
    * plans as TakeOrderedAndProject (per-partition top-N + driver merge
    * of N·partitions rows, no global sort); the rank window and the
    * fusion join then run over ≤2·[[RrfDepth]] rows — bounded metadata,
    * the s03-centroid discipline. The vector list scores the corpus
    * against the probe INLINED AS LITERALS (the s05 centroid-literal
    * discipline — one bounded head() at plan-build time), so the scan is
    * a pure map with no join at all (a 1-row broadcast `<>` join would
    * plan as the BNLJ the gate forbids); the fusion stage is
    * list-source-agnostic, so at index scale the same join takes
    * s02/s05/s09's candidate lists instead. Lexical corpus stats (N,
    * total tokens) are two bounded scan-agg scalars inlined as literals
    * (t13's convention). */
  val s15HybridRrf = QueryDef(
    "s15_hybrid_rrf", {
      s"""WITH e AS ($vecsSql),
         |p AS (SELECT * FROM e WHERE vec_id = $RrfProbeId),
         |vscored AS (
         |  SELECT e.vec_id AS doc_id,
         |         ${dotSql("p.embedding", "e.embedding")} / (p.nrm * e.nrm) AS cos
         |  FROM p JOIN e ON p.vec_id <> e.vec_id),
         |vtop AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS vec_rank
         |  FROM vscored ORDER BY cos DESC, doc_id LIMIT $RrfDepth),
         |${TextOps.bm25Sql("lscored", withHitCount = false)},
         |ltop AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
         |  FROM lscored ORDER BY score DESC, doc_id LIMIT $RrfDepth)
         |SELECT coalesce(v.doc_id, l.doc_id) AS doc_id,
         |       l.lex_rank AS lex_rank, v.vec_rank AS vec_rank,
         |       CAST(coalesce(1000000 // ($RrfK + l.lex_rank), 0) +
         |            coalesce(1000000 // ($RrfK + v.vec_rank), 0) AS BIGINT) AS rrf_score
         |FROM vtop v FULL OUTER JOIN ltop l ON v.doc_id = l.doc_id
         |ORDER BY rrf_score DESC, doc_id LIMIT $RrfTopK""".stripMargin
    }) { (s, d) =>
    // vector list: the probe is ONE bounded row, so it is collected at
    // plan-build time and inlined as literals (the s05 centroid-literal
    // discipline) — scoring is then a pure per-row map over the corpus
    // with NO join of any kind, and the global top-N is orderBy+limit.
    // A MISSING probe row degrades to an empty vector list — the
    // oracle's empty-CTE semantics (p → vscored → vtop all empty), not a
    // plan-build NoSuchElementException (ADVICE r13 #4); fusion then
    // returns the lexical-only ranking on both engines.
    val vTop = vecs(s, d).filter(col("vec_id") === RrfProbeId)
      .select(col("embedding"), col("nrm")).limit(1).collect().headOption match {
      case Some(pr) =>
        val pVec = typedlit(pr.getSeq[Float](0))
        val pNrm = lit(pr.getDouble(1))
        vecs(s, d).filter(col("vec_id") =!= RrfProbeId)
          .select(col("vec_id").as("doc_id"),
            (dotCol(pVec, col("embedding")) / (pNrm * col("nrm"))).as("cos"))
          .orderBy(col("cos").desc, col("doc_id")).limit(RrfDepth)
          .withColumn("vec_rank",
            row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
          .select("doc_id", "vec_rank")
      case None =>
        s.range(0).select(col("id").as("doc_id"), col("id").as("vec_rank"))
    }
    // lexical list: t18's integer BM25 over the fixed query term set —
    // the scoring chain is TextOps.bm25Scored, shared verbatim with t18
    // (ADVICE r13 #2: one definition per engine, consumers cannot drift)
    val lTop = TextOps.bm25Scored(s, d)
      .orderBy(col("score").desc, col("doc_id")).limit(RrfDepth)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "lex_rank")
    // fusion: ≤2·RrfDepth rows — integer RRF, absent list contributes 0
    vTop.as("v").join(lTop.as("l"), col("v.doc_id") === col("l.doc_id"), "full_outer")
      .select(
        coalesce(col("v.doc_id"), col("l.doc_id")).as("doc_id"),
        col("l.lex_rank").as("lex_rank"),
        col("v.vec_rank").as("vec_rank"),
        (coalesce(expr(s"1000000L DIV (${RrfK}L + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000L DIV (${RrfK}L + vec_rank)"), lit(0L))).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id")).limit(RrfTopK)
  }

  // ---------- s19: FILTERED vector search (metadata predicate) ----------

  /** The attribute predicate served by s19 — a candidate qualifies only if
    * its document row carries this language. 'en' is the corpus majority
    * (~40% of the fixtures), so the filter is selective without being
    * vacuous. */
  private[graft] val FilterLang = "en"

  /** s19 — FILTERED ANN: s05's IVF search where the CANDIDATE set is
    * restricted by a metadata predicate (`documents.lang = 'en'`) — the
    * "filtered vector search" every production retrieval stack needs
    * (serve only candidates passing a license/language/source predicate).
    * Probes are unrestricted; ranking happens AFTER the filter (true
    * pre-filter semantics — the top-k is the best k QUALIFYING neighbors,
    * not the qualifying subset of an unfiltered top-k, which can return
    * fewer than k and misses qualifying near-neighbors ranked k+1..n).
    *
    * Plan shape: the attribute attaches to the candidate side by one
    * vec_id = doc_id equi-join BEFORE the cell join — at the declared
    * chain's fixtures a one-job semi-join; in the stored-index lifecycle
    * (s16) the attribute column is persisted WITH the codes at build time
    * (a bucketed index row is `(vec_id, cellr, c0..cM, attrs…)`), making
    * the filter a pushed scan predicate on the cell-pruned candidate
    * read — zero per-query joins at 100 TB. The probe side and the
    * cell-equi-join candidate discipline are s05's verbatim; the filter
    * only thins the candidate mass (≈ the predicate's selectivity ×
    * occupancy), never widens it.
    *
    * Reference scope: the reference engine has no vector surface at all
    * (SURVEY §2) — s19, like s01–s18, is part of the LLM-pipeline
    * extension catalog. */
  val s19AnnFiltered = QueryDef(
    "s19_ann_filtered", {
      val centroidSql = s03Centroids.oracle.get
      s"""WITH cents0 AS (${centroidSql.replace("\n", "\n  ")}),
         |cents AS (
         |  SELECT label,
         |         list_transform(list(centroid ORDER BY dim_pos), x -> CAST(x AS REAL)) AS cvec
         |  FROM cents0 GROUP BY label),
         |cn AS (SELECT label, cvec, ${normSql("cvec")} AS cnorm FROM cents),
         |e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
         |assigned AS (
         |  SELECT vec_id, embedding, nrm, cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, cn.label AS cell,
         |           row_number() OVER (
         |             PARTITION BY e.vec_id
         |             ORDER BY ${dotSql("e.embedding", "cn.cvec")} / (e.nrm * cn.cnorm) DESC,
         |                      cn.label) AS rn
         |    FROM e CROSS JOIN cn) WHERE rn = 1),
         |p AS (SELECT * FROM assigned WHERE vec_id % $ProbeMod = 0),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, p.cell, e2.vec_id AS neighbor_id,
         |         ${dotSql("p.embedding", "e2.embedding")} / (p.nrm * e2.nrm) AS cos
         |  FROM p
         |  JOIN assigned e2 ON p.cell = e2.cell AND p.vec_id <> e2.vec_id
         |  JOIN documents dd ON e2.vec_id = dd.doc_id AND dd.lang = '$FilterLang'),
         |ranked AS (
         |  SELECT probe_id, cell, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY probe_id
         |                            ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT probe_id, cell, rank, neighbor_id, ${Stable.sqlR4("cos")} AS cosine
         |FROM ranked WHERE rank <= $TopK""".stripMargin
    }) { (s, d) =>
    val scoredCells = centroidScoredCells(s, d)
    val bits = cellRefineBits(s, d)
    val e = vecs(s, d)
    val assigned = e.select(col("vec_id"), col("embedding"), col("nrm"),
      (-array_max(scoredCells).getField("negCell")).as("cell"))
      .withColumn("cellr", refinedCellCol(col("cell"), col("embedding"), bits))
    // metadata attach: a semi-join thins the candidate side to qualifying
    // documents (the stored-index lifecycle persists this column with the
    // codes instead — scaladoc above); the probe side stays unrestricted
    val allowed = Tables.documents(s, d)
      .filter(col("lang") === lit(FilterLang)).select(col("doc_id"))
    val cand = assigned.join(
      allowed, assigned("vec_id") === allowed("doc_id"), "left_semi")
    // probe side: s05's verbatim — single assigned cell below
    // NProbe2MinBits, top-NProbe explode at the ×100 regime
    val pBase =
      if (bits >= NProbe2MinBits)
        e.filter(col("vec_id") % ProbeMod === 0)
          .select(col("vec_id"), col("embedding"), col("nrm"),
            (-array_max(scoredCells).getField("negCell")).as("cell"),
            explode(transform(slice(array_sort(scoredCells), -NProbe, NProbe),
              x => -x.getField("negCell"))).as("probed_cell"))
          .withColumn("cellr", refinedCellCol(col("probed_cell"), col("embedding"), bits))
          .drop("probed_cell")
      else assigned.filter(col("vec_id") % ProbeMod === 0)
    val p = refineMultiProbe(pBase, bits)
    val cos = dotCol(col("p.embedding"), col("e.embedding")) / (col("p.nrm") * col("e.nrm"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(p.as("p"))
      .join(cand.as("e"),
        col("p.cellr") === col("e.cellr") && col("p.vec_id") =!= col("e.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("p.cell").as("cell"),
        col("e.vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("cell"), col("rank"), col("neighbor_id"),
        Stable.r4(col("cos")).as("cosine"))
  }

  // ---------- s20: FILTERED search on the PERSISTED index ----------

  /** s20 — s19's metadata predicate served from the STORED index (verdict
    * r16 #6): the attribute (`lang`) is persisted WITH the codes at
    * build/append time ([[withSourceLang]] — a bucketed index row is
    * `(vec_id, cell, cellr, c0..cM, lang)`), so the filter is a PUSHED
    * SCAN PREDICATE on the candidate read — PlanSpec pins
    * `PushedFilters: [EqualTo(lang,…)]` and NO join anywhere on the
    * candidate side. Search tail is s16's ([[adcSearch]] — ADC over the
    * stored codes); semantics are s19's true pre-filter: the filter thins
    * the candidate set BEFORE the per-probe window, so top-k is the best
    * k QUALIFYING neighbors. Oracle = s09's chain + the candidate-side
    * documents join ([[ivfPqAdcOracleSql]]) — an independent DuckDB
    * formulation that attaches the attribute by join, checking the
    * persisted column against the source of truth row-for-row. 100 TB:
    * zero per-query joins for attribute filtering — the predicate rides
    * the same cell-pruned bucketed scan every unfiltered search uses,
    * paid for once per index build. */
  val s20AnnFilteredIndexed = QueryDef(
    "s20_ann_filtered_indexed", ivfPqAdcOracleSql(Some(FilterLang))) { (s, d) =>
    val (codes, meta) = pqStoredIndex(s, d)
    val p = refineMultiProbe(
      residualFrameFrom(s, d, meta.cents, meta.bits)
        .filter(col("vec_id") % ProbeMod === 0),
      meta.bits)
    adcSearch(s, codes.filter(col("lang") === lit(FilterLang)), p, meta)
  }

  val all: Seq[QueryDef] =
    Seq(s01KnnBrute, s02AnnLsh, s03Centroids, s04AnnMultiProbe, s05IvfSearch,
      s06IvfMultiProbe, s07AnnRecall, s08KmeansLloyd, s09IvfPqAdc,
      s10IvfRecall, s11IvfMultiProbeRecall, s12IvfPqRecall,
      s13Sq8Search, s14Sq8Recall, s15HybridRrf, s16IvfPqIndexed, s17IvfPqAppend,
      s18IvfPqCompact, s19AnnFiltered, s20AnnFilteredIndexed)
}
