package graft.ext

import graft.SparkSpec
import graft.tables.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The durable ANN index contract: append encodes against FROZEN stored
  * artifacts without ever touching previously indexed vectors, the result
  * equals a single-batch build-encode, takedown is partition-scoped over
  * the codes table, and search reads codes only.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal families in 16 dims (the PqSpec fixture, interleaved
  // ids so coarse seeding spans both families)
  private def vec(base: Int, i: Int): Seq[Float] =
    (0 until 16).map { d =>
      val on = d >= base && d < base + 4
      (if (on) 1.0f + 0.01f * ((i * 7 + d) % 5) else 0.001f * ((i * 3 + d) % 7))
    }
  private def corpus = (1 to 40).map(i =>
    (i.toLong, vec(if (i % 2 == 1) 0 else 8, i))).toDF("vec_id", "embedding")

  private def newStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_annidx").toString)

  private def codesOf(store: TableStore, name: String): Map[Long, (Long, Seq[Int])] =
    store.read(s"${name}_codes")
      .select(col("vec_id"), col("cluster"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("append against frozen artifacts equals single-batch encode; base vectors never re-read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_anncorpus").toString
    val isInc = col("vec_id") % 3 === 0
    corpus.filter(!isInc).write.parquet(s"$tmp/base")
    corpus.filter(isInc).write.parquet(s"$tmp/inc")

    // ground truth: one index built over everything, quantizers trained on
    // the same base slice (sampleMod off — tiny corpus)
    val storeAll = newStore()
    AnnIndex.build(storeAll, "idx", corpus.filter(!isInc), "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)
    AnnIndex.append(storeAll, "idx", corpus.filter(isInc), "vec_id", "embedding")
    val want = codesOf(storeAll, "idx")

    // incremental path over parquet, base DELETED before the append: any
    // plan that re-reads or re-encodes a base vector fails at action time
    val store = newStore()
    AnnIndex.build(store, "idx", spark.read.parquet(s"$tmp/base"),
      "vec_id", "embedding", dim = 16, nlist = 2, m = 4, k = 4)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/base"))
    AnnIndex.append(store, "idx", spark.read.parquet(s"$tmp/inc"),
      "vec_id", "embedding")
    assert(codesOf(store, "idx") === want)
    assert(codesOf(store, "idx").keySet === (1L to 40L).toSet)

    // search over the stored index finds the query's family
    val out = AnnIndex.search(store, "idx", corpus.filter(col("vec_id") === 1),
        "vec_id", "embedding", k = 10, nprobe = 1)
      .select("neighbor_id").as[Long].collect()
    assert(out.length === 10)
    assert(out.forall(_ % 2 === 1), s"cross-family neighbors: ${out.toSeq}")
  }

  test("searchRefined: exact-cosine order, output ⊆ shortlist, never a shortlist repair") {
    val store = newStore()
    AnnIndex.build(store, "idx", corpus, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)
    val q = corpus.filter(col("vec_id") === 1)

    // the refined top-k re-ranks EXACTLY the ADC shortlist — membership
    // must match the kShort search, order must be exact cosine
    val shortIds = AnnIndex.search(store, "idx", q, "vec_id", "embedding",
        k = 12, nprobe = 1)
      .select("neighbor_id").as[Long].collect().toSet
    val refined = AnnIndex.searchRefined(store, "idx", q, corpus,
        "vec_id", "embedding", k = 5, kShort = 12, nprobe = 1)
      .orderBy(col("rnk"))
      .select(col("neighbor_id"), col("cos")).as[(Long, Double)].collect()
    assert(refined.length === 5)
    assert(refined.map(_._1).toSet.subsetOf(shortIds))
    // exact cosine recomputed independently driver-side, strict left fold
    val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
    def cosOf(a: Seq[Float], b: Seq[Float]): Double = {
      def dotD(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (s, (p, r)) => s + p.toDouble * r.toDouble }
      dotD(a, b) / (math.sqrt(dotD(a, a)) * math.sqrt(dotD(b, b)))
    }
    val want = shortIds.toSeq
      .map(id => (id, cosOf(vecs(1L), vecs(id))))
      .sortBy { case (id, c) => (-c, id) }.take(5)
    assert(refined.map(_._1).toSeq === want.map(_._1))

    // contract pin: refine repairs ORDER, not RECALL — with the shortlist
    // restricted to one probe, an exact-closer vector from the unprobed
    // cluster must NOT appear (it was never a candidate)
    assert(refined.map(_._1).forall(_ % 2 === 1))
  }

  test("property: refineExact == driver-side exact re-rank of the shortlist, random corpora") {
    for (seed <- Seq(7, 19)) {
      val rnd = new scala.util.Random(seed)
      val vecs = (1 to 60).map(i =>
        (i.toLong, Seq.fill(12)((rnd.nextInt(2001) - 1000) / 1000.0f)))
      val df = vecs.toDF("vec_id", "embedding")
      val vmap = vecs.toMap
      def cosOf(a: Seq[Float], b: Seq[Float]): Double = {
        def d(x: Seq[Float], y: Seq[Float]) =
          x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p.toDouble * q.toDouble }
        d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
      }
      // arbitrary shortlists: 15 candidates per query, seed-drawn
      val qids = Seq(1L, 2L, 3L)
      val short = qids.flatMap { q =>
        rnd.shuffle((1L to 60L).filter(_ != q).toList).take(15).map(n => (q, n))
      }
      val refined = Similarity.refineExact(
          short.toDF("query_id", "neighbor_id"),
          df.filter(col("vec_id").isin(qids: _*)), df,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
        .as[(Long, Long, Int)].collect().toSet
      val want = short.groupBy(_._1).flatMap { case (q, ns) =>
        ns.map(_._2).map(n => (n, cosOf(vmap(q), vmap(n))))
          .sortBy { case (n, c) => (-c, n) }.take(5).zipWithIndex
          .map { case ((n, _), i) => (q, n, i + 1) }
      }.toSet
      assert(refined === want, s"seed $seed")
    }
  }

  test("maintainIfNeeded compacts a fragmented codes table; prune layout and content survive") {
    val store = newStore()
    AnnIndex.build(store, "idx", corpus.filter(col("vec_id") <= 10),
      "vec_id", "embedding", dim = 16, nlist = 2, m = 4, k = 4)
    // fragment: one append per doc, like a long-lived one-doc-batch stream
    (11 to 20).foreach { i =>
      AnnIndex.append(store, "idx", corpus.filter(col("vec_id") === i),
        "vec_id", "embedding")
    }
    val before = codesOf(store, "idx")
    assert(AnnIndex.maintainIfNeeded(store, "idx", maxFiles = 4).isDefined)
    assert(codesOf(store, "idx") === before)
    // cluster partition dirs survive (the probe-prune layout), and a
    // healthy index reports nothing to do
    val dirs = new java.io.File(store.path("idx_codes")).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cluster="))
    assert(dirs.nonEmpty)
    assert(AnnIndex.maintainIfNeeded(store, "idx", maxFiles = 64).isEmpty)
  }

  test("drift record: in-distribution appends hold the build baseline, a drifted increment rings the bell") {
    val store = newStore()
    // train ONLY on family A (odd ids): the frozen quantizers describe
    // that distribution and nothing else
    val famA = corpus.filter(col("vec_id") % 2 === 1)
    AnnIndex.build(store, "idx", famA.filter(col("vec_id") <= 20),
      "vec_id", "embedding", dim = 16, nlist = 2, m = 4, k = 4)
    // in-distribution increment: more family-A vectors
    AnnIndex.append(store, "idx", famA.filter(col("vec_id") > 20),
      "vec_id", "embedding")
    // drifted increment: family B lives in the orthogonal subspace the
    // codebooks never saw
    AnnIndex.append(store, "idx", corpus.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding")

    val d = AnnIndex.drift(store, "idx")
      .select(col("seq"), col("phase"), col("n_rows"), col("mean_err"))
      .as[(Long, String, Long, Double)].collect()
    assert(d.map(r => (r._1, r._2)).toSeq ===
      Seq((0L, "build"), (1L, "append"), (2L, "append")))
    val Array(base, inDist, drifted) = d.map(_._4)
    // the frozen stack encodes its own distribution within noise of the
    // build baseline (same order of magnitude); the foreign one ORDERS
    // worse — the retrain signal is a magnitude jump, not a wiggle
    assert(inDist < base * 10.0,
      s"in-distribution append err $inDist vs baseline $base")
    assert(drifted > base * 100.0,
      s"drifted append err $drifted not orders above baseline $base")
    assert(drifted > inDist * 100.0)
  }

  test("build default auto-scales nlist to ceil(sqrt(n)) — pinned at two corpus sizes") {
    // 40 vectors → ceil(√40) = 7 clusters; 9 vectors → 3: cluster size
    // tracks √n instead of n (the production knob annTracking documents)
    val s40 = newStore()
    AnnIndex.build(s40, "idx", corpus, "vec_id", "embedding", dim = 16, m = 4, k = 4)
    assert(s40.read("idx_centroids").count() === 7L)
    val s9 = newStore()
    AnnIndex.build(s9, "idx", corpus.filter(col("vec_id") <= 9),
      "vec_id", "embedding", dim = 16, m = 4, k = 4)
    assert(s9.read("idx_centroids").count() === 3L)
    // m default auto-scales to dim/2 (the measured r16 capacity curve):
    // dim 16 → 8 subspaces in the books table
    val sm = newStore()
    AnnIndex.build(sm, "idx", corpus.filter(col("vec_id") <= 9),
      "vec_id", "embedding", dim = 16, k = 4)
    assert(sm.read("idx_books").select(col("sub")).distinct().count() === 8L)
    // the auto-built index searches end-to-end
    val out = AnnIndex.search(s40, "idx", corpus.filter(col("vec_id") === 1),
        "vec_id", "embedding", k = 5, nprobe = 3)
      .select("neighbor_id").as[Long].collect()
    assert(out.length === 5)
  }

  test("decontaminate: nprobe=nlist equals the exact scrub; narrow nprobe is a recall dial") {
    val store = newStore()
    val isEval = col("vec_id") % 5 === 0
    val train = corpus.filter(!isEval)
    val evalSet = corpus.filter(isEval)
    AnnIndex.build(store, "idx", train, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)

    def rows(df: DataFrame): Set[(Long, Long, Double, Long)] = df
      .select(col("vec_id"), col("n_eval_hits").cast("long"),
        col("max_cos"), col("nearest_eval_id").cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet

    // nprobe = nlist: every (train, eval) pair is a candidate — the pruned
    // scrub must reproduce the exact audit record bit-for-bit
    val exact = rows(Similarity.semanticDecontaminate(
      train, evalSet, "vec_id", "embedding", threshold = 0.5))
    assert(exact.nonEmpty)
    assert(rows(AnnIndex.decontaminate(store, "idx", train, evalSet,
      "vec_id", "embedding", threshold = 0.5, nprobe = 2)) === exact)

    // cluster-aligned structure: within-family hits survive nprobe=1
    // (each eval vector's top probe is its own family's centroid and the
    // 0.5 bar only passes within-family pairs on this fixture)
    assert(rows(AnnIndex.decontaminate(store, "idx", train, evalSet,
      "vec_id", "embedding", threshold = 0.5, nprobe = 1)) === exact)

    // and the honest flip side: drop the bar below the cross-family
    // cosine and nprobe=1 UNDERCOUNTS hits (pairs meeting in the unprobed
    // cluster are never confirmed) while nprobe=nlist restores exactness —
    // the recall dial the scaladoc documents
    val exactAll = rows(Similarity.semanticDecontaminate(
      train, evalSet, "vec_id", "embedding", threshold = -1.0))
    val narrow = rows(AnnIndex.decontaminate(store, "idx", train, evalSet,
      "vec_id", "embedding", threshold = -1.0, nprobe = 1))
    assert(rows(AnnIndex.decontaminate(store, "idx", train, evalSet,
      "vec_id", "embedding", threshold = -1.0, nprobe = 2)) === exactAll)
    assert(narrow.map(_._1).subsetOf(exactAll.map(_._1)))
    assert(narrow.forall { case (id, n, _, _) =>
      n < exactAll.find(_._1 == id).get._2 })
  }

  test("search auto-nprobe default: max(2, ceil(sqrt(nlist))) of the stored geometry — pinned at two nlists") {
    def ranked(df: DataFrame): Seq[(Long, Long, Int)] = df
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .as[(Long, Long, Int)].collect().sorted.toSeq
    // nlist=9 → auto 3
    val s9 = newStore()
    AnnIndex.build(s9, "idx", corpus, "vec_id", "embedding",
      dim = 16, nlist = 9, m = 4, k = 4)
    val qs = corpus.filter(col("vec_id") <= 4)
    assert(ranked(AnnIndex.search(s9, "idx", qs, "vec_id", "embedding", k = 5)) ===
      ranked(AnnIndex.search(s9, "idx", qs, "vec_id", "embedding", k = 5, nprobe = 3)))
    // nlist=2 → auto max(2, ceil(sqrt 2)) = 2 = nlist (probe everything)
    val s2 = newStore()
    AnnIndex.build(s2, "idx", corpus, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)
    assert(ranked(AnnIndex.search(s2, "idx", qs, "vec_id", "embedding", k = 5)) ===
      ranked(AnnIndex.search(s2, "idx", qs, "vec_id", "embedding", k = 5, nprobe = 2)))
  }

  test("decontaminateCalibrated: binary search lands on the minimal exact-parity nprobe") {
    val store = newStore()
    val isEval = col("vec_id") % 5 === 0
    val train = corpus.filter(!isEval)
    val evalSet = corpus.filter(isEval)
    AnnIndex.build(store, "idx", train, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)

    def rows(df: DataFrame): Set[(Long, Long, Double, Long)] = df
      .select(col("vec_id"), col("n_eval_hits").cast("long"),
        col("max_cos"), col("nearest_eval_id").cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet

    // cluster-aligned bar (0.5): parity already holds at nprobe=1, and a
    // full-slice margin-0 calibration must find exactly that minimum —
    // with ⌈log₂ 2⌉ = 1 pruned replay, not an nlist sweep
    val exactAligned = rows(Similarity.semanticDecontaminate(
      train, evalSet, "vec_id", "embedding", threshold = 0.5))
    val (s1, c1) = AnnIndex.decontaminateCalibrated(store, "idx", train,
      evalSet, "vec_id", "embedding", threshold = 0.5, sampleMod = 1, margin = 0)
    assert(c1.nprobe === 1)
    assert(c1.nlist === 2)
    assert(c1.checks === 1)
    assert(c1.slicePairs > 0)
    assert(rows(s1) === exactAligned)

    // bar below the cross-family cosine (-1): nprobe=1 provably
    // undercounts (the recall-dial test above), so calibration must
    // escalate to 2 — and the returned scrub is exact by construction
    val exactAll = rows(Similarity.semanticDecontaminate(
      train, evalSet, "vec_id", "embedding", threshold = -1.0))
    val (s2, c2) = AnnIndex.decontaminateCalibrated(store, "idx", train,
      evalSet, "vec_id", "embedding", threshold = -1.0, sampleMod = 1, margin = 0)
    assert(c2.nprobe === 2)
    assert(rows(s2) === exactAll)

    // margin rides on top of the calibrated minimum, capped at nlist
    val (s3, c3) = AnnIndex.decontaminateCalibrated(store, "idx", train,
      evalSet, "vec_id", "embedding", threshold = 0.5, sampleMod = 1, margin = 1)
    assert(c3.nprobe === 2)
    assert(rows(s3) === exactAligned)

    // sampled slice: deterministic md5-bucket subset, still calibrates
    // (aligned structure holds on any subset) and the record is honest
    // about how many pairs the slice actually saw
    val (s4, c4) = AnnIndex.decontaminateCalibrated(store, "idx", train,
      evalSet, "vec_id", "embedding", threshold = 0.5, sampleMod = 3, margin = 0)
    assert(c4.slicePairs <= c1.slicePairs)
    assert(rows(s4) === exactAligned)

    // a slice that saw NO hits proves nothing: the record says so
    // (slicePairs = 0) and the scrub itself is empty at that bar
    val (s5, c5) = AnnIndex.decontaminateCalibrated(store, "idx", train,
      evalSet, "vec_id", "embedding", threshold = 2.0, sampleMod = 1, margin = 0)
    assert(c5.slicePairs === 0L)
    assert(c5.nprobe === 1)
    assert(s5.count() === 0L)
  }

  test("property: calibrated nprobe is MINIMAL — binary search equals a linear scan, random corpora") {
    val rnd = new scala.util.Random(41)
    def rvec(dim: Int): Seq[Float] = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    for (trial <- 1 to 4) {
      val store = newStore()
      val train = (1 to 30).map(i => (i.toLong, rvec(8))).toDF("vec_id", "embedding")
      val evalSet = (101 to 106).map(i => (i.toLong, rvec(8))).toDF("vec_id", "embedding")
      val nlist = 2 + trial // 3..6
      AnnIndex.build(store, "idx", train, "vec_id", "embedding",
        dim = 8, nlist = nlist, m = 4, k = 4)
      // a bar low enough that random gaussians produce hits (cos > 0.3
      // is common at dim 8) but high enough that narrow probing misses some
      val tau = 0.3
      def pairsAt(np: Int): Long = AnnIndex.decontaminate(store, "idx",
          train, evalSet, "vec_id", "embedding", threshold = tau, nprobe = np)
        .agg(coalesce(sum(col("n_eval_hits")), lit(0L))).collect()(0).getLong(0)
      val exact = pairsAt(nlist) // nprobe = nlist ≡ exact by construction
      val linearMin = (1 to nlist).find(pairsAt(_) == exact).get
      val (scrub, cal) = AnnIndex.decontaminateCalibrated(store, "idx",
        train, evalSet, "vec_id", "embedding", threshold = tau,
        sampleMod = 1, margin = 0)
      assert(cal.nprobe === linearMin,
        s"trial $trial nlist=$nlist: binary ${cal.nprobe} != linear $linearMin")
      assert(cal.checks <= math.ceil(math.log(nlist.toDouble) / math.log(2.0)).toInt + 1)
      assert(scrub.agg(coalesce(sum(col("n_eval_hits")), lit(0L)))
        .collect()(0).getLong(0) === exact)
    }
  }

  test("health: counts, cluster-skew fraction, file count, drift trend from the stored tables") {
    val store = newStore()
    AnnIndex.build(store, "idx", corpus, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)
    val h = AnnIndex.health(store, "idx")
    assert(h.nCodes === 40L)
    assert(h.nClusters === 2)
    assert(h.autoNlist === 7) // ceil(sqrt(40)) — what a rebuild would pick
    // two balanced orthogonal families → each cluster holds half
    assert(h.maxClusterFrac === 0.5)
    assert(h.codesFiles >= 1)
    assert(h.driftBaseline === h.driftLast) // build only: one drift row
    // an append moves the trend's LAST point, never the baseline
    AnnIndex.append(store, "idx",
      (101 to 110).map(i => (i.toLong, vec(0, i))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val h2 = AnnIndex.health(store, "idx")
    assert(h2.nCodes === 50L)
    assert(h2.driftBaseline === h.driftBaseline)
    assert(h2.maxClusterFrac > 0.5) // the family-0 cluster grew
    // a FULL takedown empties the codes table — health must report
    // zeros, not NPE on the null sum/max of a zero-cluster aggregate
    AnnIndex.deleteIds(store, "idx",
      AnnIndex.knownIds(store, "idx", "vec_id"), "vec_id")
    val h3 = AnnIndex.health(store, "idx")
    assert(h3.nCodes === 0L)
    assert(h3.nClusters === 0)
    assert(h3.maxClusterFrac === 0.0)
  }

  test("search join path (data-sized queries, no driver collect) equals the pruned path exactly") {
    val store = newStore()
    AnnIndex.build(store, "idx", corpus, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)
    val qs = corpus.filter(col("vec_id") <= 8)
    // nprobe=1 so the per-query probe CHOICE matters, not just the rank
    def res(maxQ: Int) = AnnIndex.search(store, "idx", qs,
        "vec_id", "embedding", k = 6, nprobe = 1,
        maxPrunedQueries = maxQ)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .as[(Long, Long, Int)].collect().toSet
    assert(res(0) === res(Int.MaxValue))
    assert(res(0).nonEmpty)
  }

  test("searchBudgeted: budget >= n equals probe-everything; a one-code budget probes only the top cluster") {
    val store = newStore()
    AnnIndex.build(store, "idx", corpus, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)
    val q = corpus.filter(col("vec_id") === 1)
    def rows(df: DataFrame) = df.select(col("neighbor_id"), col("rnk"))
      .as[(Long, Int)].collect().toSet
    // budget covers the whole corpus → identical to nprobe = nlist
    assert(rows(AnnIndex.searchBudgeted(store, "idx", q, "vec_id", "embedding",
        k = 10, codesBudget = 1000L)) ===
      rows(AnnIndex.search(store, "idx", q, "vec_id", "embedding",
        k = 10, nprobe = 2)))
    // budget below any cluster size → the guaranteed top-1 probe only,
    // i.e. nprobe = 1 semantics (the scan bound holds, recall degrades
    // nearest-first)
    assert(rows(AnnIndex.searchBudgeted(store, "idx", q, "vec_id", "embedding",
        k = 10, codesBudget = 1L)) ===
      rows(AnnIndex.search(store, "idx", q, "vec_id", "embedding",
        k = 10, nprobe = 1)))
    // codesBudget = 0 → auto ceil(n/sqrt(nlist)) from the stored tables
    // (40 codes, 2 clusters → 29), the balanced-scan price auto-nprobe
    // pays — identical to passing the derived value explicitly
    assert(rows(AnnIndex.searchBudgeted(store, "idx", q, "vec_id", "embedding",
        k = 10)) ===
      rows(AnnIndex.searchBudgeted(store, "idx", q, "vec_id", "embedding",
        k = 10, codesBudget = 29L)))
    // the two-stage dial: at full coverage the budgeted refine equals the
    // fixed-nprobe refine exactly (same shortlist, same exact re-rank)
    def rrows(df: DataFrame) = df
      .select(col("neighbor_id"), col("cos"), col("rnk"))
      .as[(Long, Double, Int)].collect().toSet
    assert(rrows(AnnIndex.searchBudgetedRefined(store, "idx", q, corpus,
        "vec_id", "embedding", k = 5, kShort = 10, codesBudget = 1000L)) ===
      rrows(AnnIndex.searchRefined(store, "idx", q, corpus,
        "vec_id", "embedding", k = 5, kShort = 10, nprobe = 2)))
  }

  test("selfPairs: equals exact all-pairs at full probes/shortlist; verbatim floods pair with the min-id rep under a tiny kShort") {
    val store = newStore()
    AnnIndex.build(store, "idx", corpus, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)
    // full recall regime (kShort ≥ |batch|, nprobe = nlist): the ADC
    // shortlist proposes every batch-mate in a probed cluster and the
    // exact confirm makes the pair set identical to brute-force all-pairs
    val batch = corpus.filter(col("vec_id") <= 24)
    def pairSet(df: DataFrame) = df.select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    val got = pairSet(AnnIndex.selfPairs(store, "idx", batch,
      "vec_id", "embedding", threshold = 0.8, kShort = 100, nprobe = 2))
    val want = pairSet(Similarity.cosinePairs(batch,
      "vec_id", "embedding", threshold = 0.8))
    assert(got === want)
    assert(got.nonEmpty) // same-family cosines ≈ 0.9999 — pairs exist
    // a flood bigger than kShort still resolves greedily: identical
    // vectors tie at max ADC and the (adc DESC, neighbor_id) tiebreak
    // fills every copy's shortlist with the SMALLEST-id copies, so each
    // non-min member pairs with the min-id rep
    val oneHot = (i: Int) => (0 until 16).map(d => if (d == i) 1.0f else 0.0f)
    val flood = (1L to 5L).map(i => (i, vec(0, 999))) ++
      (6L to 13L).map(i => (i, oneHot(4 + (i.toInt - 6))))
    val fp = pairSet(AnnIndex.selfPairs(store, "idx",
      flood.toDF("vec_id", "embedding"), "vec_id", "embedding",
      threshold = 0.99, kShort = 2, nprobe = 2))
    assert((2L to 5L).forall(x => fp.contains((1L, x))),
      s"flood members not condemned by the min-id rep: $fp")
    assert(fp.forall { case (a, b) => a <= 5L && b <= 5L },
      s"orthogonal one-hots paired: $fp")
  }

  test("cluster-size cache: build warms it, mutations invalidate by fingerprint, contents track the codes table exactly") {
    val store = newStore()
    def actualSizes() = store.read("idx_codes")
      .groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
      .as[(Long, Long)].collect().toMap
    def cachedSizes() = store.read("idx_csizes")
      .select(col("cluster"), col("csize"))
      .as[(Long, Long)].collect().toMap
    AnnIndex.build(store, "idx", corpus.filter(col("vec_id") <= 30),
      "vec_id", "embedding", dim = 16, nlist = 2, m = 4, k = 4)
    // build warmed the cache: no recompute on first ask, contents exact
    assert(!AnnIndex.refreshClusterSizes(store, "idx"))
    assert(cachedSizes() === actualSizes())
    // append: the increment's exact cluster counts FOLD into the cache
    // (r19 — reading back only the new part files), so the fingerprint
    // moves WITH the cache and no recount ever runs; contents exact
    AnnIndex.append(store, "idx", corpus.filter(col("vec_id") > 30),
      "vec_id", "embedding")
    assert(!AnnIndex.refreshClusterSizes(store, "idx"),
      "append must fold csizes, not stale them")
    assert(cachedSizes() === actualSizes())
    // takedown: same contract (health() validates it on its own path)
    AnnIndex.deleteIds(store, "idx", Seq(1L, 2L, 3L).toDF("vec_id"), "vec_id")
    val h = AnnIndex.health(store, "idx")
    assert(h.nCodes === 37L)
    assert(!AnnIndex.refreshClusterSizes(store, "idx")) // health refreshed it
    assert(cachedSizes() === actualSizes())
    // a budgeted search in the steady state reads the cache — its result
    // stays identical to the probe-count contract pinned above
    val q = corpus.filter(col("vec_id") === 5)
    val out = AnnIndex.searchBudgeted(store, "idx", q, "vec_id", "embedding",
      k = 5, codesBudget = 1000L)
    assert(out.count() === 5L)
    // compaction is content-neutral: a FRESH cache is re-stamped to the
    // new fingerprint without a recount (refresh stays false), contents
    // still exact
    assert(AnnIndex.maintainIfNeeded(store, "idx", maxFiles = 1).nonEmpty)
    assert(!AnnIndex.refreshClusterSizes(store, "idx"))
    assert(cachedSizes() === actualSizes())
    // ... but a cache that was STALE going into the compaction is left
    // stale (re-stamping would freeze wrong sizes) and recounts once —
    // staleness simulated as an EXTERNAL codes mutation the fold never
    // saw (appends themselves no longer stale the cache)
    store.append("idx_codes",
      store.read("idx_codes").filter(col("vec_id") === 4L),
      partitionBy = Seq("cluster"))
    assert(AnnIndex.maintainIfNeeded(store, "idx", maxFiles = 1).nonEmpty)
    assert(AnnIndex.refreshClusterSizes(store, "idx"))
    assert(cachedSizes() === actualSizes())
    AnnIndex.deleteIds(store, "idx", Seq(4L).toDF("vec_id"), "vec_id")
    // full takedown: empty codes table round-trips (no fp row to read)
    AnnIndex.deleteIds(store, "idx",
      AnnIndex.knownIds(store, "idx", "vec_id"), "vec_id")
    assert(AnnIndex.refreshClusterSizes(store, "idx"))
    assert(!AnnIndex.refreshClusterSizes(store, "idx"))
    assert(AnnIndex.health(store, "idx").nCodes === 0L)
  }

  test("rebuildIfDrifted: in-bar appends decline; a drifted increment triggers rebuild, resets the baseline, recalibrates") {
    val store = newStore()
    val famA = corpus.filter(col("vec_id") % 2 === 1)
    val famB = corpus.filter(col("vec_id") % 2 === 0)
    AnnIndex.build(store, "idx", famA.filter(col("vec_id") <= 20),
      "vec_id", "embedding", dim = 16, nlist = 2, m = 4, k = 4)
    AnnIndex.append(store, "idx", famA.filter(col("vec_id") > 20),
      "vec_id", "embedding")
    // in-distribution trend: the bell stays silent and nothing rewrites
    val codesBefore = codesOf(store, "idx")
    val d0 = AnnIndex.rebuildIfDrifted(store, "idx", famA,
      "vec_id", "embedding", dim = 16, factor = 10.0, nlist = 2, m = 4, k = 4)
    assert(!d0.triggered)
    assert(d0.recalibration.isEmpty)
    assert(codesOf(store, "idx") === codesBefore)
    // the orthogonal family rings it: rebuild from the full corpus,
    // recalibrate the scrub against the fresh quantizers
    AnnIndex.append(store, "idx", famB, "vec_id", "embedding")
    // m/k OMITTED: the rebuild must preserve the STORED code geometry
    // (m=4, k=4), not jump to the auto dim/2 default — code width is a
    // storage contract
    val dec = AnnIndex.rebuildIfDrifted(store, "idx", corpus,
      "vec_id", "embedding", dim = 16, factor = 10.0, nlist = 2,
      recal = Some(AnnIndex.RecalSpec(corpus,
        corpus.filter(col("vec_id") <= 4), threshold = 0.99,
        sampleMod = 1, margin = 0)))
    assert(dec.triggered)
    assert(dec.driftLast >= 10.0 * dec.driftBaseline)
    assert(codesOf(store, "idx").keySet === (1L to 40L).toSet)
    assert(store.read("idx_books").select(col("sub")).distinct().count() === 4L)
    assert(store.read("idx_books").select(col("cid")).distinct().count() === 4L)
    // two-family fixture: same-family cosines ≈0.9999, so the exact
    // calibration slice sees pairs and the chosen nprobe is usable
    assert(dec.recalibration.exists(c =>
      c.slicePairs > 0L && c.nprobe >= 1 && c.nprobe <= c.nlist))
    // the drift BASELINE reset: one fresh build row, and asking again
    // declines — the bell re-armed instead of ringing forever
    val d = AnnIndex.drift(store, "idx")
      .select(col("seq"), col("phase")).as[(Long, String)].collect()
    assert(d.toSeq === Seq((0L, "build")))
    val d2 = AnnIndex.rebuildIfDrifted(store, "idx", corpus,
      "vec_id", "embedding", dim = 16, factor = 10.0, nlist = 2, m = 4, k = 4)
    assert(!d2.triggered)

    // zero-baseline bell: identical build vectors quantize exactly
    // (mean_err 0.0) — a drifted append must STILL trigger (any finite
    // factor bar is exceeded), not be disarmed like a missing trend
    val s0 = newStore()
    val flat = (1L to 10L).map(i => (i, vec(0, 3))).toDF("vec_id", "embedding")
    AnnIndex.build(s0, "idx", flat, "vec_id", "embedding",
      dim = 16, nlist = 1, m = 4, k = 4)
    assert(AnnIndex.health(s0, "idx").driftBaseline === 0.0)
    AnnIndex.append(s0, "idx",
      (21L to 30L).map(i => (i, vec(8, i.toInt))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val d0flat = AnnIndex.rebuildIfDrifted(s0, "idx",
      flat.unionByName((21L to 30L).map(i => (i, vec(8, i.toInt)))
        .toDF("vec_id", "embedding")),
      "vec_id", "embedding", dim = 16, factor = 10.0, nlist = 2)
    assert(d0flat.triggered)
  }

  test("rebuildIfUnhealthy: collapse triggers; a futile rebuild disarms the repeat; rearmFactor=0 + cleaned corpus restores sqrt-n; balanced declines") {
    val store = newStore()
    // 48 verbatim copies of one vector + 16 distinct rows: auto nlist is
    // ceil(sqrt(64)) = 8, but all 8 smallest-id seeds are flood copies, so
    // Lloyd collapses the populated clusters — the 142→20 k-means collapse
    // of BENCH_LOCAL_r16.md §4, in miniature
    val flood = (1 to 48).map(i => (i.toLong, vec(0, 999)))
    val distinct = (49 to 64).map(i =>
      (i.toLong, vec(if (i % 2 == 1) 0 else 8, i)))
    val flooded = (flood ++ distinct).toDF("vec_id", "embedding")
    AnnIndex.build(store, "idx", flooded,
      "vec_id", "embedding", dim = 16, m = 4, k = 4)
    val h = AnnIndex.health(store, "idx")
    assert(h.nClusters <= 3, s"expected collapse, got ${h.nClusters}")
    assert(h.autoNlist === 8)
    // FUTILE rebuild: the caller's corpus is still flooded, so the
    // rebuild re-collapses — triggered (zero drift: collapse bell only),
    // and `post` reports the geometry stayed collapsed
    val dec = AnnIndex.rebuildIfUnhealthy(store, "idx", flooded,
      "vec_id", "embedding", dim = 16)
    assert(dec.triggered && dec.collapseTriggered && !dec.driftTriggered)
    assert(dec.nClusters === h.nClusters && dec.autoNlist === 8)
    assert(dec.post.exists(p =>
      p.autoNlist >= 2.0 * p.nClusters), s"flooded rebuild cleared?: $dec")
    // THRASH GUARD: the futile rebuild wrote the fresh geometry as the
    // baseline — an immediate second ask (per-batch cadence) declines
    // instead of paying another full rebuild
    val dec2 = AnnIndex.rebuildIfUnhealthy(store, "idx", flooded,
      "vec_id", "embedding", dim = 16)
    assert(!dec2.triggered, s"futile rebuild thrashed: $dec2")
    // escape hatch: corpus cleaned upstream, rearmFactor = 0 forces the
    // absolute bars — rebuild from the cleaned corpus restores geometry
    // near ceil(sqrt(17)) = 5 and resets the drift baseline
    val cleaned = (Seq((1L, vec(0, 999))) ++ distinct)
      .toDF("vec_id", "embedding")
    val dec3 = AnnIndex.rebuildIfUnhealthy(store, "idx", cleaned,
      "vec_id", "embedding", dim = 16, rearmFactor = 0)
    assert(dec3.triggered && dec3.collapseTriggered)
    assert(dec3.post.exists(p => p.nCodes == 17L && p.autoNlist == 5 &&
      p.nClusters >= 3), s"cleaned rebuild stayed collapsed: $dec3")
    val d = AnnIndex.drift(store, "idx")
      .select(col("seq"), col("phase")).as[(Long, String)].collect()
    assert(d.toSeq === Seq((0L, "build")))
    // healthy now: the next ask declines on every bell (absolute bars,
    // not the guard — the cleaned rebuild re-armed the bell fully)
    val dec4 = AnnIndex.rebuildIfUnhealthy(store, "idx", cleaned,
      "vec_id", "embedding", dim = 16)
    assert(!dec4.triggered)
    assert(!dec4.skewTriggered && !dec4.collapseTriggered && !dec4.driftTriggered)

    // a balanced auto-geometry index never pages: all three bells silent
    val s2 = newStore()
    AnnIndex.build(s2, "idx", corpus, "vec_id", "embedding",
      dim = 16, m = 4, k = 4)
    val db = AnnIndex.rebuildIfUnhealthy(s2, "idx", corpus,
      "vec_id", "embedding", dim = 16)
    assert(!db.triggered, s"balanced index paged: $db")
  }

  test("dropIndex: the full seven-table teardown; a fresh build on the same name works") {
    val store = newStore()
    AnnIndex.build(store, "idx", corpus, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)
    AnnIndex.append(store, "idx", // drift row beyond the baseline
      Seq((200L, vec(8, 200))).toDF("vec_id", "embedding"), "vec_id", "embedding")
    // materialize the geometry baseline too (a triggered unhealthy ask)
    AnnIndex.rebuildIfUnhealthy(store, "idx", corpus, "vec_id", "embedding",
      dim = 16, driftFactor = 1.0001)
    val tables = Seq("idx_codes", "idx_centroids", "idx_centers",
      "idx_books", "idx_drift", "idx_csizes", "idx_geom_base")
    assert(tables.count(store.exists) >= 6) // geom_base only if it rang
    AnnIndex.dropIndex(store, "idx")
    tables.foreach(t => assert(!store.exists(t), s"$t survived dropIndex"))
    // the name is reusable
    AnnIndex.build(store, "idx", corpus, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)
    assert(AnnIndex.health(store, "idx").nCodes === 40L)
  }

  test("takedown rewrites only the deleted ids' clusters; artifacts stay frozen") {
    val store = newStore()
    AnnIndex.build(store, "idx", corpus, "vec_id", "embedding",
      dim = 16, nlist = 2, m = 4, k = 4)
    val before = codesOf(store, "idx")
    val booksBefore = store.read("idx_books").collect().map(_.toSeq).toSet

    AnnIndex.deleteIds(store, "idx", Seq(2L, 4L, 6L).toDF("vec_id"), "vec_id")
    val after = codesOf(store, "idx")
    assert(after === before -- Seq(2L, 4L, 6L))
    assert(AnnIndex.knownIds(store, "idx", "vec_id")
      .as[Long].collect().toSet === before.keySet -- Seq(2L, 4L, 6L))
    // quantizers untouched — a takedown must not retrain what the
    // surviving codes were encoded with
    assert(store.read("idx_books").collect().map(_.toSeq).toSet === booksBefore)
    // deleted ids no longer reachable from search
    val out = AnnIndex.search(store, "idx", corpus.filter(col("vec_id") === 8),
        "vec_id", "embedding", k = 15, nprobe = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out.intersect(Set(2L, 4L, 6L)).isEmpty)
  }
}
