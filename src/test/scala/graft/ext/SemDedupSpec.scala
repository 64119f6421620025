package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the round's newest operators: SemDeDup's verdict rule
  * (d21), the hashed linear classifier (t14), the per-source token budget
  * (x24), and the exact-moment z-score gate (e4's arithmetic).
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on orthogonal axes; within each, one vector sits
  // exactly on the axis (closest to the cluster mean) and one slightly off
  private def emb = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.96f, 0.28f, 0.0f)), // ~16° off axis 1
    (3L, Seq(0.0f, 0.0f, 1.0f)),
    (4L, Seq(0.0f, 0.28f, 0.96f)), // ~16° off axis 3
    (5L, Seq(0.0f, 1.0f, 0.0f))    // alone on axis 2
  ).toDF("vec_id", "embedding")

  // centroids = the two axis vectors plus axis 2 (so clusters are clean)
  private def cents = Seq(
    (1L, Seq(1.0f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.0f, 0.1f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("semDedup removes the member CLOSER to its centroid (D21)") {
    val out = Similarity.semDedup(emb, cents, "vec_id", "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // cos(v1,v2) = .96 ≥ .9: a qualifying pair. Centroid 1 is (1,.1,0);
    // v1=(1,0,0) has ccos ≈ .995, v2 ≈ .983 → v1 is CLOSER → v1 removed.
    assert(out(1L) === 1)
    assert(out(2L) === 0)
    // same geometry in cluster 3: v3 closer to centroid 3 than v4
    assert(out(3L) === 1)
    assert(out(4L) === 0)
    // v5 alone in its cluster → kept
    assert(out(5L) === 0)
    assert(out.size === 5) // verdict covers every vector
  }

  test("semDedup with no qualifying pairs keeps everything (D21)") {
    val out = Similarity.semDedup(emb, cents, "vec_id", "embedding", 0.999)
      .agg(sum($"is_dup")).head().getLong(0)
    assert(out === 0L)
  }

  test("lshRowsPerBand: the measured r(τ) — 24 at the dup bar, 8 at 0.9, floor at low bars, bucket-packing cap") {
    import graft.ext.Similarity
    // τ=0.99: p=0.955 → ln0.3/ln p ≈ 26.1, capped at 24 (Int bucket packs
    // 1 << r); the BENCH_LOCAL_r16.md §3 value that turned the backfill
    // LSH from slower-than-exact (454 s) into the real prune (307 s)
    assert(Similarity.lshRowsPerBand(0.99) === 24)
    // τ=0.9: p ≈ 0.8565 → r = 8 — still a real prune (random pairs 8·2⁻⁸)
    assert(Similarity.lshRowsPerBand(0.9) === 8)
    // τ=0.8: p ≈ 0.7952 → r = 6 — random pairs collide at 8/64: sign-LSH
    // stops pruning hard here, the reason low bars route elsewhere
    assert(Similarity.lshRowsPerBand(0.8) === 6)
    // the floor: τ→0.5 would want r→small/negative; 4 is the narrowest
    // band that is still a bucket at all
    assert(Similarity.lshRowsPerBand(0.5) === 4)
    assert(Similarity.lshRowsPerBand(0.0) === 4)
    // τ=1.0 (verbatim copies) stays inside the cap, acos-domain safe
    assert(Similarity.lshRowsPerBand(1.0) === 24)
  }

  test("cosinePairsClusteredMultiProbe clusterCap: hot clusters star-pair with the min-id rep; cold behavior unchanged") {
    import graft.ext.Similarity
    def oneHot(i: Int): Seq[Float] =
      (0 until 8).map(d => if (d == i) 1.0f else 0.0f)
    // a 6-copy verbatim flood (one cluster) + 4 mutually-orthogonal docs
    val docs = ((1L to 6L).map(i => (i, oneHot(0))) ++
      (11L to 14L).map(i => (i, oneHot((i - 9).toInt)))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansTrain(docs, "vec_id", "embedding", k = 3, iters = 2)
      .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
    def pairs(cap: Int) = Similarity.cosinePairsClusteredMultiProbe(
        docs, cents, "vec_id", "embedding", threshold = 0.9, nprobe = 2,
        clusterCap = cap)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    // uncapped: the flood cluster emits all 15 within-flood pairs
    val full = pairs(Int.MaxValue)
    assert(full === (for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)).toSet)
    // capped below the flood: STAR pairs only — every member pairs the
    // min-id rep (5 pairs, linear), which is sufficient for a greedy
    // earlier-id drop to remove the flood whole
    val star = pairs(3)
    assert(star === (2L to 6L).map(b => (1L, b)).toSet)
  }

  test("cosinePairsClusteredMultiProbe uncapped short-circuit: only the distinct aggregate, no vector-column groupBy (r17 d11 regression)") {
    import graft.ext.Similarity
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    def oneHot(i: Int): Seq[Float] =
      (0 until 8).map(d => if (d == i) 1.0f else 0.0f)
    val docs = ((1L to 6L).map(i => (i, oneHot(0))) ++
      (11L to 14L).map(i => (i, oneHot((i - 9).toInt)))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansTrain(docs, "vec_id", "embedding", k = 3, iters = 2)
      .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
    def aggs(cap: Int) = Similarity.cosinePairsClusteredMultiProbe(
        docs, cents, "vec_id", "embedding", threshold = 0.9, nprobe = 2,
        clusterCap = cap)
      .queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    // at the default cap the star-cap machinery (sizes aggregate, size
    // join, hot branches, identity groupBy on the raw vector column) must
    // be absent: the only aggregate left is the final distinct, and
    // nothing groups by the embedding column
    val un = aggs(Int.MaxValue)
    assert(un.size === 1, s"uncapped plan should carry ONLY the distinct, got ${un.size}")
    un.foreach { a =>
      val refs = a.groupingExpressions.flatMap(_.references.map(_.name)).toSet
      assert(!refs.contains("embedding"), s"vector-column groupBy in uncapped plan: $refs")
    }
    // contrast: the capped plan pays them (sizes agg + identity groupBy +
    // distinct), including a grouping that references the vector column
    val capped = aggs(3)
    assert(capped.size > 1)
    assert(capped.exists(_.groupingExpressions
      .flatMap(_.references.map(_.name)).contains("embedding")))
  }

  test("cosinePairsClusteredMultiProbe clusterCap: a FOREIGN min-id cluster rep cannot mask a verbatim flood (identity-group stars)") {
    import graft.ext.Similarity
    def oneHot(i: Int): Seq[Float] =
      (0 until 8).map(d => if (d == i) 1.0f else 0.0f)
    // doc 1 is orthogonal to the 6-copy flood; with k=2 seeds (ids 1,
    // 100) and nprobe=2, EVERY doc probes both clusters, so the flood's
    // hot cluster carries min id 1 — a rep whose star pairs are all
    // cos 0. Without identity-group stars the flood would be admitted
    // whole; with them every copy pairs the flood's OWN min id at cos 1
    val docs = (Seq((1L, oneHot(7))) ++
      (100L to 105L).map(i => (i, oneHot(0)))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansTrain(docs, "vec_id", "embedding", k = 2, iters = 2)
      .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
    val star = Similarity.cosinePairsClusteredMultiProbe(
        docs, cents, "vec_id", "embedding", threshold = 0.9, nprobe = 2,
        clusterCap = 3)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(star === (101L to 105L).map(b => (100L, b)).toSet, s"got $star")
  }

  test("semanticDecontaminate flags train vectors near ANY eval vector (C7)") {
    // eval = the axis-1 and axis-2 vectors; train contains a near-copy of
    // axis 1 (flagged, cos ~0.96), an exact copy (flagged, cos 1.0, and
    // with axis-1 AND the near-axis eval both above a loose threshold the
    // nearest id is the higher-cos one), and an orthogonal vector (clean)
    val evalSet = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Seq(0.96f, 0.28f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(train, evalSet,
        "vec_id", "embedding", threshold = 0.9)
      .orderBy("vec_id")
      .select("vec_id", "n_eval_hits", "nearest_eval_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 100L), (2L, 1L, 100L)))
    // a looser threshold exposes multi-hit counting and the max-cos
    // nearest pick: train 1 sits 0.96 from eval 100 and 0.28 from 101
    val loose = Similarity.semanticDecontaminate(train, evalSet,
        "vec_id", "embedding", threshold = 0.2)
      .filter($"vec_id" === 1L)
      .select("n_eval_hits", "nearest_eval_id").as[(Long, Long)].head()
    assert(loose === ((2L, 100L)))
  }

  test("classifier weights are multiples of 1/64 in [-0.5, 0.5) (T14)") {
    // replay the query's weight expression over distinct corpus tokens
    val toks = Seq("alpha", "beta", "gamma", "the", "x").toDF("t")
    val w = ((conv(substring(md5($"t"), 1, 4), 16, 10).cast("int") % 64 * 37 + 11) % 64)
      .cast("double") / 64.0 - 0.5
    val vals = toks.select(w.as("w")).collect().map(_.getDouble(0))
    vals.foreach { v =>
      assert(v >= -0.5 && v < 0.5)
      assert((v * 64).isWhole, s"$v not a 1/64 multiple")
    }
    // deterministic: same token, same weight, every run
    val again = toks.select(w.as("w")).collect().map(_.getDouble(0))
    assert(vals.toSeq === again.toSeq)
  }

  test("token budget closes each source at the cap, in md5 order (X24)") {
    val docs = Seq(
      (1L, "s1", "a b c d"), (2L, "s1", "e f g"), (3L, "s1", "h i"),
      (4L, "s2", "one two three four five six")
    ).toDF("doc_id", "source", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .rowsBetween(Long.MinValue, 0)
    val cum = docs
      .select($"doc_id", $"source",
        size(split(trim($"text"), "\\s+")).as("n_tok"))
      .select($"doc_id", $"source", $"n_tok",
        sum($"n_tok").over(w).cast("long").as("cum_tok"))
    val kept = cum.filter($"cum_tok" <= 5).collect()
      .map(r => r.getLong(0)).toSet
    // md5 order within s1 is a fixed permutation; whatever it is, the
    // kept prefix must be a PREFIX: total tokens kept ≤ 5 and adding the
    // first dropped doc would exceed 5
    val all = cum.orderBy($"source", $"cum_tok").collect()
    val s1 = all.filter(_.getString(1) == "s1")
    val keptTok = s1.filter(r => kept(r.getLong(0))).map(_.getInt(2)).sum
    assert(keptTok <= 5)
    val firstDropped = s1.find(r => !kept(r.getLong(0)))
    firstDropped.foreach(r => assert(keptTok + r.getInt(2) > 5))
    // s2's single 6-token doc blows the cap immediately → nothing kept
    assert(!kept(4L))
  }

  test("z-score moments from exact decimal sums flag the planted outlier (E4)") {
    import org.apache.spark.sql.types.DecimalType
    // |z| is bounded by (n-1)/√n, so a small-n fixture can't flag anything:
    // 10 tight inliers + 1 far outlier gives the outlier z ≈ 3
    val inliers = (1L to 10L).map(i => (i, 10L, 5.0 + 0.1 * (i % 3)))
    val ev = (inliers ++ Seq(
      (11L, 10L, 50.0), // the outlier
      (12L, 11L, 1.0), // n=1 user: no σ, silently excluded
      // constant-value user: the exact moments land an ulp below zero in
      // double (s2/n − μ² = −2e−20 for three 0.01s) — the clamp must pin
      // σ to 0 (excluded), never sqrt(−ε) = NaN (which would flag ALL)
      (13L, 12L, 0.01), (14L, 12L, 0.01), (15L, 12L, 0.01)
    )).toDF("event_id", "user_id", "value")
    val dv = $"value".cast(DecimalType(18, 2))
    val stats = ev.groupBy($"user_id").agg(
      count(lit(1)).as("n"), sum(dv).as("s1"), sum(dv * dv).as("s2"))
    val mu = $"s1".cast("double") / $"n"
    val sig = sqrt(greatest(lit(0.0), ($"s2".cast("double") / $"n" - mu * mu) *
      ($"n".cast("double") / ($"n" - 1))))
    val ms = stats.filter($"n" >= 2)
      .select($"user_id", mu.as("mu"), sig.as("sig")).filter($"sig" > 0.0)
    val flagged = ev.join(ms, Seq("user_id"))
      .select($"event_id", (($"value" - $"mu") / $"sig").as("z"))
      .filter(abs($"z") > 2.0)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(11L))
  }
}
