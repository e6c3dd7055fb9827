package graft.operators

import org.apache.spark.sql.functions._
import graft.kernel.SparkSpec

class DedupSpec extends SparkSpec {

  private def run(
      fn: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)(
      nodeIds: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val nodes = nodeIds.toDF("doc_id")
    val edges = pairs.toDF("id_a", "id_b")
    fn(nodes, edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def keepers(nodeIds: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] =
    run(Dedup.keeperSelection(_, _))(nodeIds, pairs)

  private def starKeepers(nodeIds: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] =
    run(Dedup.keeperSelectionStar(_, _))(nodeIds, pairs)

  test("keeperSelection: chain component collapses to its min id") {
    // 1-2, 2-3, 3-4 is one component; 10 is a singleton
    val m = keepers(Seq(1L, 2L, 3L, 4L, 10L), Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L))
  }

  test("keeperSelection: disjoint components keep separate keepers") {
    val m = keepers(Seq(1L, 2L, 5L, 6L, 7L), Seq((1L, 2L), (6L, 5L), (6L, 7L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("keeperSelection: min id propagates across a long path (multi-round fixpoint)") {
    // path 9-8-7-...-1: min label 1 must travel 8 hops
    val ids = (1L to 9L)
    val path = ids.sliding(2).map(s => (s(1), s.head)).toSeq
    val m = keepers(ids, path)
    assert(m.values.toSet == Set(1L))
  }

  test("keeperSelection: no edges means every node keeps itself") {
    val m = keepers(Seq(3L, 7L), Seq.empty)
    assert(m == Map(3L -> 3L, 7L -> 7L))
  }

  test("keeperSelection equals union-find on random graphs (seeded property)") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 30
      val ids = (0L until n).toSeq
      val pairs = Seq.fill(25) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a == b) (a, (b + 1) % n) else (a, b)
      }
      // driver-side union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = ids.map { i =>
        // component min: repeatedly find root, which is min by construction
        i -> find(i.toInt).toLong
      }.toMap
      assert(keepers(ids, pairs) == expected)
      // the O(log d) large-star/small-star variant must agree exactly
      assert(starKeepers(ids, pairs) == expected)
    }
  }

  test("keeperSelectionStar: long chain and singletons (the deep-graph case it exists for)") {
    val ids = (1L to 17L) :+ 40L
    val path = (1L to 17L).sliding(2).map(s => (s(1), s.head)).toSeq
    val m = starKeepers(ids, path)
    assert((1L to 17L).forall(m(_) == 1L))
    assert(m(40L) == 40L) // isolated node keeps itself
  }

  test("d12: per-lang chain keepers = min doc_id per lang; depth defeats round-budgeted propagation") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = Dedup.d12KeeperStarDeep.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent expectation from the FIXTURE's semantics (each lang is
    // one path component): keeper = the language's minimum doc_id
    val expected = graft.tables.Tables.documents(spark, sf)
      .groupBy("lang").agg(min("doc_id").as("m"))
      .join(graft.tables.Tables.documents(spark, sf), "lang")
      .select(col("doc_id"), col("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // the depth claim: min-label propagation moves one hop per round, so
    // on the deepest chain a 5-round budget CANNOT converge — the star
    // variant's O(log d) contraction is what makes d12 viable
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"))
    val byLang = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
    val pairs = docs.withColumn("prev", lag(col("doc_id"), 1).over(byLang))
      .filter(col("prev").isNotNull)
      .select(col("prev").as("id_a"), col("doc_id").as("id_b"))
    val budgeted = Dedup.keeperSelection(
      docs.select(col("doc_id")), pairs, maxIter = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(budgeted != expected,
      "a 5-round propagation converged on the deep chain — fixture lost its depth")
  }

  test("d13: verdict matches an independent driver-side SemDeDup recomputation") {
    val sf = "/root/testdata/sf0.001"
    val out = Dedup.d13SemanticDedup.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getLong(3))))
      .toMap

    // independent recomputation with plain Scala loops (same double fold
    // order as FloatVecDot): centroids from s03's declared result, argmax
    // assignment, within-cell domination under the keep-furthest rule
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        acc += a(i).toDouble * b(i).toDouble; i += 1
      }
      acc
    }
    val cents = Similarity.s03Centroids.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (label, rows) =>
        label -> rows.sortBy(_._2).map(_._3.toFloat)
      }
      .toSeq.sortBy(_._1)
    val vecs = graft.tables.Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val assigned = vecs.map { case (id, v) =>
      val nrm = math.sqrt(dot(v, v))
      val (cell, c) = cents.map { case (label, cv) =>
        label -> dot(v, cv) / (nrm * math.sqrt(dot(cv, cv)))
      }.maxBy { case (label, c) => (c, -label) } // cos DESC, label ASC
      (id, v, nrm, cell, r4(c))
    }
    val expected = assigned.map { case (id, v, nrm, cell, ccos) =>
      val dropped = assigned.exists { case (id2, v2, nrm2, cell2, ccos2) =>
        id2 != id && cell2 == cell &&
          (ccos2 < ccos || (ccos2 == ccos && id2 < id)) &&
          dot(v, v2) / (nrm * nrm2) >= 0.4
      }
      id -> ((cell, ccos, if (dropped) 1L else 0L))
    }.toMap
    assert(out == expected)
    // non-vacuous: the verdict must actually split the corpus
    val drops = out.values.count(_._3 == 1L)
    assert(drops > 0, "fixture produced no semantic duplicates")
    assert(drops < out.size, "fixture dropped every vector")
  }

  test("incrementalDedupBloom: false positives survive via the anti-join backstop") {
    import spark.implicits._
    val existing = Seq("a", "b", "c").toDF("h")
    val incoming = Seq((1L, "a"), (2L, "b"), (3L, "x"), (4L, "y"), (5L, "z"))
      .toDF("doc_id", "h")
    val plain = incoming.join(existing, Seq("h"), "left_anti")
      .select(col("doc_id"), col("h").as("content_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // a 64-bit bloom saturates on 3 inserts (~42 bits set): most or all of
    // the definitely-new rows read as "might contain" and are forced down
    // the backstop — the output must STILL be exactly the plain anti-join
    val saturated = Dedup.incrementalDedupBloom(incoming, existing, numBits = 64L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(saturated == plain)
    assert(plain == Set((3L, "x"), (4L, "y"), (5L, "z")))
    // and at the default sizing (false positives rare) the same equality
    val sized = Dedup.incrementalDedupBloom(incoming, existing)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sized == plain)
  }

  test("bandParamsFor / blockBitsFor: fixture values under the threshold, scaled above") {
    // every oracle fixture corpus (≤ 10k docs with twins) keeps (r=4, b=4)
    // and 7-bit blocks — the pinned DuckDB SQL stays valid
    for (n <- Seq(100L, 1000L, 10000L, 16384L)) {
      assert(Dedup.bandParamsFor(n) == Dedup.BandParams(4, 4), s"n=$n")
      assert(Dedup.blockBitsFor(n) == 7, s"n=$n")
    }
    // ×10 gate corpus (100k incl. twins): r=6, b=7; 10-bit blocks (the
    // p=0.54 growth rate agrees with the old log2 rate here)
    assert(Dedup.bandParamsFor(100000L) == Dedup.BandParams(6, 7))
    assert(Dedup.blockBitsFor(100000L) == 10)
    // ×100 (1M): r=8, b=12; 14-bit blocks — one more than the round-11
    // log2 rate gave (13), from the measured p=0.54 bit agreement; 4×14 =
    // 56 still fits ONE signature word
    assert(Dedup.bandParamsFor(1000000L) == Dedup.BandParams(8, 12))
    assert(Dedup.blockBitsFor(1000000L) == 14)
    // past ~2.3M docs the width crosses 14 bits and the TWO-WORD signature
    // layout activates; the 28-bit cap (112 virtual sign-bits) binds only
    // past ~7e9 docs — the round-11 13-bit cap went linear at ~1M
    assert(Dedup.blockBitsFor(1000000000L) == 25)
    assert(Dedup.blockBitsFor(100000000000L) == 28)
    // monotone: a bigger corpus never gets LOOSER banding
    val rs = Seq(2e4, 5e4, 1e5, 5e5, 1e6, 1e7).map(n => Dedup.bandParamsFor(n.toLong).bandSize)
    assert(rs == rs.sorted)
    // recall at the mutated-twin operating point (j=0.8) holds the
    // fixture's 0.878 under every scaled (r, b)
    for (n <- Seq(1e5, 1e6, 1e8).map(_.toLong)) {
      val bp = Dedup.bandParamsFor(n)
      val recall = 1.0 - math.pow(1.0 - math.pow(0.8, bp.bandSize), bp.nBands)
      assert(recall >= 0.878, s"n=$n recall=$recall")
    }
  }

  test("SimHashWide: bits=28 is bit-identical to SimHash28; wider keeps the low 28") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs % 1000000007L))
    val df = rows.toDF("th")
    val out = df.select(
      VectorFunctions.simHash28(col("th")).as("s28"),
      VectorFunctions.simHashWide(col("th"), 28).as("w28"),
      VectorFunctions.simHashWide(col("th"), 52).as("w52")).collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1)) // bits=28 ≡ SimHash28
      assert((r.getLong(2) & ((1L << 28) - 1)) == r.getLong(0)) // low 28 preserved
      assert(r.getLong(2) >>> 52 == 0L) // no bits beyond the requested width
    }
    // the remixed high bits are not degenerate: across 50 docs some high
    // bit must differ between signatures (a constant high half would make
    // wider blocks vacuous)
    assert(out.map(_.getLong(2) >>> 28).distinct.length > 1)
  }

  test("SimHashWide word 1: independent of word 0, non-degenerate, width-bounded") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(60)(Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs % 1000000007L))
    val out = rows.toDF("th").select(
      VectorFunctions.simHashWide(col("th"), 32, 0).as("w0"),
      VectorFunctions.simHashWide(col("th"), 32, 1).as("w1")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    out.foreach { case (_, w1) => assert(w1 >>> 32 == 0L) }
    // word 1 must not just replay word 0 (a copied stream would make the
    // two-word layout's blocks 2-3 redundant with 0-1)
    assert(out.count { case (w0, w1) => w0 == w1 } < out.length / 4)
    assert(out.map(_._2).distinct.length > 1)
  }

  test("simhashBlockPairs two-word layout (bb>14) = brute-force hamming filter") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    // 30 base docs of 24 random token hashes; 10 near-twins sharing all
    // but 2 elements with their origin (high signature agreement) — the
    // forced bb=16 (4×16 = 64 > 56 sign-bits) exercises the two-word
    // path that no fixture or gate corpus reaches (it activates past
    // ~2.3M docs). Pigeonhole: hamming ≤ 3 over the 64-bit virtual
    // signature guarantees a shared block, so the operator's output must
    // EQUAL the brute-force all-pairs filter, not just contain it.
    val rnd = new scala.util.Random(13)
    val base = (0 until 30).map { i =>
      (i.toLong, Seq.fill(24)(rnd.nextLong().abs % 1000000007L))
    }
    val twins = base.take(10).map { case (id, th) =>
      (id + 1000L, th.dropRight(2) ++ Seq.fill(2)(rnd.nextLong().abs % 1000000007L))
    }
    val src = (base ++ twins).toDF("doc_id", "th")
    val bb = 16
    val got = Dedup.simhashBlockPairs(src, bb, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // brute force via the same signature expressions (both words)
    val sigs = src.select(col("doc_id"),
      VectorFunctions.simHashWide(col("th"), 2 * bb, 0).as("w0"),
      VectorFunctions.simHashWide(col("th"), 2 * bb, 1).as("w1")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (ia, w0a, w1a) <- sigs; (ib, w0b, w1b) <- sigs if ia < ib
      h = java.lang.Long.bitCount(w0a ^ w0b) + java.lang.Long.bitCount(w1a ^ w1b)
      if h <= 3
    } yield ((ia, ib), h.toLong)).toMap
    assert(want.nonEmpty, "fixture produced no near-dup pairs — vacuous")
    assert(got == want)
  }

  test("incrementalDedupBloom: empty history keeps every incoming row") {
    import spark.implicits._
    // BloomFilterAggregate over zero rows evals to NULL; MightContain on a
    // null bloom is null, which fails BOTH filter branches — without the
    // null-bloom fallback this returned EMPTY where the correct answer is
    // all incoming rows (ADVICE r10 medium)
    val existing = Seq.empty[String].toDF("h")
    val incoming = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "h")
    val out = Dedup.incrementalDedupBloom(incoming, existing)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "b")))
  }

  test("d14 span stop-list: boilerplate windows out, pair signal kept, fixture-inert") {
    import spark.implicits._
    // cutoff gating (round-11 verdict #6): inert at fixture corpora so
    // the pinned oracle holds, active past them
    assert(Dedup.spanDfCutoffFor(16384L) == Long.MaxValue)
    assert(Dedup.spanDfCutoffFor(16385L) == 8L)
    // 12 docs sharing one 8-token boilerplate block (df = 12 + 12 twins =
    // 24 > SpanMaxDf → stop-listed) + 2 docs sharing a genuine copied
    // span (df = 2 + 2 twins = 4 ≤ 8 → kept). Prefix token is exactly 14
    // chars so each twin (first-14-chars cut) keeps the block verbatim.
    val boiler = (1 to 12).map(i => (i.toLong, f"p$i%02dxxxxxxxxxxx b1 b2 b3 b4 b5 b6 b7 b8"))
    val pair = Seq((13L, "q13yyyyyyyyyyy c1 c2 c3 c4 c5 c6 c7 c8"),
      (14L, "q14yyyyyyyyyyy c1 c2 c3 c4 c5 c6 c7 c8"))
    val dir = java.nio.file.Files.createTempDirectory("graft_span").toString
    (boiler ++ pair).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (naive, stopped, docs) = Dedup.spanPairMassStats(spark, dir)
    assert(docs == 28L)
    // boilerplate window: C(24,2) = 276; copied span: C(4,2) = 6;
    // per-doc unique windows: df = 1 → 0 mass
    assert(naive == 282L, s"naive=$naive")
    assert(stopped == 6L, s"stopped=$stopped")
  }

  test("d14 spanWindows: n-w+1 windows, rolling overlap, and the short-doc empty guard") {
    import spark.implicits._
    // token-hash arrays directly (the spanWindows contract is over hashes)
    val rows = Seq(
      (1L, (1L to 10L).toSeq), // 10 tokens → 3 windows
      (2L, (3L to 10L).toSeq), // suffix of doc 1 → its single window = doc 1's LAST window
      (3L, (1L to 7L).toSeq), // 7 < w: Spark's sequence(1,0) descends — must be EMPTY, not [1,0]
      (4L, Seq.empty[Long]))
    val out = rows.toDF("doc_id", "hh")
      .select(col("doc_id"), Dedup.spanWindows(col("hh")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L).length == 3, s"expected n-w+1 windows: ${out(1L)}")
    assert(out(2L).length == 1)
    assert(out(2L).head == out(1L).last, "identical 8-token span must hash identically")
    assert(out(1L).distinct.length == 3, "distinct spans must not collide on this fixture")
    assert(out(3L).isEmpty, "doc shorter than the window must emit NO windows")
    assert(out(4L).isEmpty)
  }

  test("d14 on a crafted corpus: a copied paragraph marks both docs, unique text stays clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d14_fix").toString
    // corpus() doubles each doc with a 14-char-prefix-cut twin, so every
    // span past the cut is shared doc↔twin; the assert targets the
    // CROSS-document copy (1 vs 2), which shares exactly the pasted block's
    // windows and nothing else
    val para = "one two three four five six seven eight nine ten eleven twelve"
    Seq(
      (1L, s"$para unique tail alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$para other ending iota kappa lambda mu nu xi omicron pi"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val m = Dedup.d14SpanDedup.fn(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // the pasted 12-token block yields 5 shared 8-token windows between
      // docs 1 and 2; both must report ≥ those 5 (twins add more)
      assert(m(1L)._2 >= 5, s"doc 1 under-reports shared spans: ${m(1L)}")
      assert(m(2L)._2 >= 5, s"doc 2 under-reports shared spans: ${m(2L)}")
      // neither doc is fully duplicated cross-corpus at the BASE ids: some
      // spans bridging paragraph→unique-tail exist in only one doc+twin...
      // but twins share those too. The sharp assert: windows counts match
      // n_tokens - 7 per doc (22 tokens → 15 windows, all distinct here)
      assert(m(1L)._1 == 15L, s"doc 1 span count: ${m(1L)}")
    } finally graft.operators.Reconcile.deleteRecursively(dir)
  }

  test("d16 incremental near-dup: twins match their origin, degenerate batch rows report 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d16_fix").toString
    Seq(
      // long doc: its prefix-cut twin keeps ~90% of shingles → must match ITS origin
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi " +
        "omicron pi rho sigma tau upsilon phi chi psi omega aleph beth gimel daleth"),
      // disjoint-vocab long doc: twin matches origin 2, never origin 1
      (2L, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce trece " +
        "catorce quince dieciseis diecisiete dieciocho diecinueve veinte treinta " +
        "cuarenta cincuenta sesenta setenta ochenta noventa cien"),
      // tiny doc: the 14-char cut leaves its twin without a full 3-shingle → no match
      (3L, "aa bb cc dd"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val m = Dedup.d16IncrementalNearDup.fn(spark, dir)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
        .toMap
      assert(m.keySet == Set(100001L, 100002L, 100003L), s"one row per incoming doc: $m")
      assert(m(100001L)._1 >= 1 && m(100001L)._2 == 1L,
        s"twin of 1 must best-match history doc 1: ${m(100001L)}")
      assert(m(100002L)._1 >= 1 && m(100002L)._2 == 2L,
        s"twin of 2 must best-match history doc 2: ${m(100002L)}")
      assert(m(100003L) == ((0L, -1L)),
        s"degenerate twin must report no matches: ${m(100003L)}")
    } finally graft.operators.Reconcile.deleteRecursively(dir)
  }

  test("d17 stored-index variant returns exactly d16's rows") {
    val sf = "/root/testdata/sf0.001"
    def rows(q: graft.queries.QueryDef) =
      q.fn(spark, sf).collect().map(_.toSeq).toSet
    // the persisted index holds nearDupPipeline's output verbatim, so the
    // indexed plan must be result-indistinguishable from the inline one
    assert(rows(Dedup.d17NearDupIndexed) == rows(Dedup.d16IncrementalNearDup))
  }

  test("d17 index survives a catalog restart: re-registered from warehouse files, not rebuilt") {
    val sf = "/root/testdata/sf0.001"
    val d16 = Dedup.d16IncrementalNearDup.fn(spark, sf).collect().map(_.toSeq).toSet
    // first build (or reuse of an earlier suite's)
    Dedup.ensureNearDupIndex(spark, sf)
    // simulate a fresh JVM: the in-memory catalog loses the tables but
    // the EXTERNAL tables' warehouse files (and spec markers) remain —
    // DROP TABLE on an external table deletes metadata only
    val ndidx = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_ndidx_"))
    assert(ndidx.length >= 2, s"expected the two index tables, saw: ${ndidx.toSeq}")
    ndidx.foreach(t => spark.sql(s"DROP TABLE $t"))
    val (mode, sec) = Dedup.ensureNearDupIndex(spark, sf)
    // "reregistered" is the claim: catalog metadata re-declared over the
    // existing files, documents.parquet NEVER rescanned (the build branch
    // is the only path that reads it, and mode proves which branch ran)
    assert(mode == "reregistered",
      s"restart must reuse the persisted build, not pay history again (got $mode)")
    assert(sec == 0.0, "re-registration must not report a build cost")
    // and the re-registered index serves d17 byte-identically
    assert(Dedup.d17NearDupIndexed.fn(spark, sf).collect().map(_.toSeq).toSet == d16)
  }

  test("d17 index invalidates on corpus change: stale fingerprint forces a rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d17_fp").toString
    def write(texts: Seq[(Long, String)]): Unit =
      texts.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      write(Seq(1L -> ("alpha beta gamma delta " * 8), 2L -> ("omega psi chi phi " * 8)))
      Dedup.invalidateParamCaches(dir)
      val (m1, _) = Dedup.ensureNearDupIndex(spark, dir)
      assert(m1 == "built")
      // same JVM, same catalog: a second call is free
      assert(Dedup.ensureNearDupIndex(spark, dir)._1 == "cached")
      // corpus regenerated BETWEEN "JVMs": rewrite the parquet, drop the
      // catalog entries (files + spec survive), re-ensure — the source
      // fingerprint no longer matches, so serving the old files would be
      // the stale-history bug; it must REBUILD
      write(Seq(1L -> ("one two three four " * 8), 3L -> ("five six seven eight " * 8)))
      Dedup.invalidateDocsCountOnly(dir)
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.contains("graft_ndidx")).filter(_.contains("graft_d17_fp"))
        .foreach(t => spark.sql(s"DROP TABLE $t"))
      val (m2, _) = Dedup.ensureNearDupIndex(spark, dir)
      assert(m2 == "built",
        s"a changed corpus fingerprint must force a rebuild, got $m2")
    } finally {
      Dedup.invalidateParamCaches(dir)
      graft.operators.Reconcile.deleteRecursively(dir)
    }
  }

  test("d15 fuzzy join: near-identical prefixes pair up, distant prefixes stay apart") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d15_fix").toString
    // docs 1/2: same 64-char prefix except one token swap (edit distance 4);
    // doc 3: unrelated vocabulary — must never appear in any pair with 1/2
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (3L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm lll kkk"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val pairs = Dedup.d15FuzzyJoin.fn(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(pairs.contains((1L, 2L)), s"near-identical prefixes missed: ${pairs.keySet}")
      assert(pairs((1L, 2L)) <= 4, s"swap distance too large: ${pairs((1L, 2L))}")
      val with3 = pairs.keySet.filter(p =>
        (p._1 % 100000 == 3) || (p._2 % 100000 == 3))
      assert(with3.forall(p => p._1 % 100000 == 3 && p._2 % 100000 == 3),
        s"unrelated doc 3 paired outside its own twin: $with3")
    } finally graft.operators.Reconcile.deleteRecursively(dir)
  }
}
