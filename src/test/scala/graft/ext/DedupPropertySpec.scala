package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property tests for the sub-quadratic dedup paths against their
  * brute-force definitions on generated corpora: the scale paths must never
  * invent pairs, and their completeness guarantees must hold.
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus: word-soup docs + planted near-dup pairs
  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (0 until nDocs).map { i =>
      (i.toLong, Seq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // plant near-dups: copy of doc i with one word changed
    val planted = (0 until nDocs by 7).map { i =>
      val words = base(i)._2.split(" ")
      words(words.length - 1) = vocab(rnd.nextInt(vocab.size))
      ((nDocs + i).toLong, words.mkString(" "))
    }
    base ++ planted
  }

  test("minhashDedup reports only true pairs (jaccard >= threshold), incl. every exact dup") {
    for (seed <- Seq(1, 2)) {
      val df = corpus(seed, 40).toDF("doc_id", "text")
      val sh = Dedup.shingleIndex(df, "doc_id", "text", 3)
      val truth = Dedup.jaccardPairs(sh, "doc_id").filter($"jaccard" >= 0.7)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Dedup.minhashDedup(df, "doc_id", "text", threshold = 0.7)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(lsh.subsetOf(truth), s"LSH invented pairs: ${lsh -- truth}")
      // identical texts (jaccard 1.0) can never be missed: every band collides
      val exactDups = truth.filter { case (a, b) =>
        val byId = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        byId(a) == byId(b)
      }
      assert(exactDups.subsetOf(lsh))
    }
  }

  test("minhashDedupIncremental == full pairs restricted to increment-touching (no recall loss)") {
    for (seed <- Seq(5, 6)) {
      val df = corpus(seed, 40).toDF("doc_id", "text")
      val full = Dedup.minhashDedup(df, "doc_id", "text", threshold = 0.7)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // increment = every third doc (planted copies land on both sides)
      val isInc = col("doc_id") % 3 === 0
      val incIds = df.filter(isInc).select("doc_id").collect().map(_.getLong(0)).toSet
      val incr = Dedup.minhashDedupIncremental(
          df.filter(!isInc), df.filter(isInc), "doc_id", "text", threshold = 0.7)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = full.filter { case (a, b) => incIds(a) || incIds(b) }
      assert(incr === expected)
      assert(incr.nonEmpty, "fixture should plant at least one increment-touching pair")
    }
  }

  test("simhashPairs bucket join == brute-force Hamming <= 3 (pigeonhole completeness)") {
    for (seed <- Seq(3, 4)) {
      val df = corpus(seed, 35).toDF("doc_id", "text")
      val sims = Dedup.simhash(Dedup.shingleIndex(df, "doc_id", "text", 3), "doc_id")
      val vals = sims.collect().map(r => r.getLong(0) -> r.getLong(1))
      val brute = (for {
        (a, sa) <- vals; (b, sb) <- vals if a < b
        if java.lang.Long.bitCount(sa ^ sb) <= 3
      } yield (a, b)).toSet
      val bucketed = Dedup.simhashPairs(sims, "doc_id", maxHamming = 3)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketed === brute)
    }
  }

  test("hot bucket: m identical docs ⇒ O(m) capped candidates, group connected") {
    val m = 30
    val base = corpus(11, 20)
    val hot = (0 until m).map(i => ((1000 + i).toLong, ("omega " * 15).trim))
    val df = (base ++ hot).toDF("doc_id", "text")
    val sh = Dedup.shingleIndex(df, "doc_id", "text", 3)
    val sig = Dedup.minhashSignature(sh, "doc_id", 12)

    val capped = Dedup.minhashCandidates(sig, "doc_id", 3, 4, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hotPairs = capped.filter { case (a, b) => a >= 1000 && b >= 1000 }
    // star pairing: exactly m-1 pairs (rep 1000 with each other member),
    // not m(m-1)/2 = 435
    assert(hotPairs.length === m - 1, s"expected ${m - 1} star pairs, got ${hotPairs.length}")
    assert(hotPairs.forall(_._1 === 1000L))
    assert(hotPairs.map(_._2).toSet === (1001 until 1000 + m).map(_.toLong).toSet)

    // uncapped on the same corpus: the full quadratic set, for contrast
    val uncapped = Dedup.minhashCandidates(sig, "doc_id", 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .count { case (a, b) => a >= 1000 && b >= 1000 }
    assert(uncapped === m * (m - 1) / 2)
  }

  test("hot bucket: capped simhashPairs keeps identical docs connected in O(m)") {
    val m = 25
    val base = corpus(12, 20)
    val hot = (0 until m).map(i => ((2000 + i).toLong, ("sigma tau upsilon " * 6).trim))
    val df = (base ++ hot).toDF("doc_id", "text")
    val sims = Dedup.simhash(Dedup.shingleIndex(df, "doc_id", "text", 3), "doc_id")
    val pairs = Dedup.simhashPairs(sims, "doc_id", maxHamming = 3, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hotPairs = pairs.filter { case (a, b) => a >= 2000 && b >= 2000 }
    // identical docs: hamming 0, all 4 chunk buckets hold all m docs —
    // star pairs only, deduped across chunks
    assert(hotPairs.length === m - 1)
    assert(hotPairs.forall(_._1 === 2000L))
  }

  test("incremental probe cap: hot stored bucket fans out O(1) per probe, flood stays connected") {
    // history carries an m-doc boilerplate flood; the crawl increment adds
    // 3 more copies. Uncapped, every inc copy pairs with all m stored
    // members; capped, each pairs only with the flood's rep.
    val m = 30
    val flood = (0 until m).map(i => ((3000 + i).toLong, ("rho phi chi " * 6).trim))
    val base = (corpus(14, 20) ++ flood).toDF("doc_id", "text")
    val inc = (0 until 3).map(i => ((9000 + i).toLong, ("rho phi chi " * 6).trim))
      .toDF("doc_id", "text")

    val capped = Dedup.minhashDedupIncremental(base, inc, "doc_id", "text",
        threshold = 0.8, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // each inc doc pairs exactly with the flood rep (3000) and, through
    // least/greatest ordering, possibly the other inc docs via the rep —
    // never with every stored flood member
    val incTouching = capped.filter { case (a, b) => a >= 9000 || b >= 9000 }
    assert(incTouching.nonEmpty, "flood must stay reachable from the increment")
    assert(incTouching.forall { case (a, b) => a === 3000L || b === 3000L },
      s"capped probe must star-pair with the rep only: $incTouching")
    assert(incTouching.size === 3)

    // uncapped for contrast: every inc copy pairs with all m members + each other
    val un = Dedup.minhashDedupIncremental(base, inc, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .count { case (a, b) => a >= 9000 || b >= 9000 }
    assert(un === 3 * m + 3, s"uncapped inc-touching pairs: $un")
  }

  test("contamination: a planted eval copy is found at overlap 1.0; maxDf kills boilerplate fan-out") {
    val train = corpus(15, 30).toDF("doc_id", "text")
    // eval doc 9001 is an exact copy of train doc 3; 9002 is unrelated
    val copied = train.filter($"doc_id" === 3L).head().getString(1)
    val eval = Seq((9001L, copied), (9002L, "totally unrelated eval words here today"))
      .toDF("doc_id", "text")
    val got = Dedup.contamination(train, eval, "doc_id", "text", n = 3, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val hit = got.filter(p => p._1 == 3L && p._2 == 9001L)
    assert(hit.length === 1 && hit.head._3 === 1.0,
      s"exact copy must surface at overlap 1.0: ${got.toSeq}")
    assert(!got.exists(_._2 == 9002L), "unrelated eval doc must not pair")

    // boilerplate: one shingle present in EVERY train doc fans each eval doc
    // into |train| pairs; the train-side df-cap removes it
    val boiler = train.withColumn("text", concat(lit("zz yy xx "), $"text"))
    val evalB = Seq((9003L, "zz yy xx nothing else in common")).toDF("doc_id", "text")
    val un = Dedup.contamination(boiler, evalB, "doc_id", "text", n = 3, minShared = 1).count()
    val capped = Dedup.contamination(boiler, evalB, "doc_id", "text", n = 3,
      minShared = 1, maxDf = 5).count()
    assert(un >= 30L, s"uncapped boilerplate should fan out, got $un")
    assert(capped === 0L, s"df-capped boilerplate must not pair, got $capped")

    // the cap hits numerator AND denominator: a verbatim copy of a
    // boilerplate-carrying train doc still scores 1.0 under the cap
    val copiedB = boiler.filter($"doc_id" === 3L).head().getString(1)
    val evalCopy = Seq((9004L, copiedB)).toDF("doc_id", "text")
    val cappedCopy = Dedup.contamination(boiler, evalCopy, "doc_id", "text",
        n = 3, minShared = 1, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(cappedCopy.exists(p => p._1 == 3L && p._2 === 1.0),
      s"capped verbatim copy must stay at overlap 1.0: ${cappedCopy.toSeq}")
  }

  test("charShingleIndex: distinct q-grams, whole-text fallback, feeds the LSH path unchanged") {
    val df = Seq(
      (1L, "abcdef"), (2L, "abcdefg"), (3L, "xy"), (4L, "abcdef") // 4 ≡ 1
    ).toDF("doc_id", "text")
    val sh = Dedup.charShingleIndex(df, "doc_id", "text", q = 4)
    val by = sh.collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    assert(by(1L) === Set("abcd", "bcde", "cdef"))
    assert(by(2L) === Set("abcd", "bcde", "cdef", "defg"))
    assert(by(3L) === Set("xy")) // shorter than q → one whole-text shingle
    // exact jaccard over the char-gram frame: identical docs score 1.0
    val j = Dedup.jaccardPairs(sh, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 4L)) === 1.0)
    assert(j((1L, 2L)) === 3.0 / 4.0)
    // the MinHash/LSH scale path accepts the same frame unchanged;
    // identical shingle sets always share every band bucket
    val cands = Dedup.minhashCandidates(Dedup.minhashSignature(sh, "doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 4L)))
  }

  test("containmentPairs: containment >= jaccard on every pair; a strict subset doc scores 1.0") {
    val docs = corpus(11, 40).toDF("doc_id", "text")
    // strict subset: first 6 tokens of doc 0 as a new doc — its 3-gram set
    // is a prefix subset of doc 0's, so containment is exactly 1.0 while
    // jaccard is |A|/|B| < 1
    val sub = docs.filter(col("doc_id") === 0L)
      .select(lit(9000L).as("doc_id"),
        array_join(slice(TextAnalysis.wsTokens(col("text")), lit(1), lit(6)), " ").as("text"))
    val sh = Dedup.shingleIndex(docs.unionByName(sub), "doc_id", "text", 3)
    val cont = Dedup.containmentPairs(sh, "doc_id")
      .select(col("id_a"), col("id_b"), col("containment"))
    val jac = Dedup.jaccardPairs(sh, "doc_id")
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val joined = cont.join(jac, Seq("id_a", "id_b"))
      .as[(Long, Long, Double, Double)].collect()
    assert(joined.nonEmpty)
    // same pair universe (both ride the same inverted-index join), and
    // n_inter/min >= n_inter/union pointwise
    assert(joined.forall { case (_, _, c, j) => c >= j - 1e-12 })
    val subRow = cont.filter(col("id_a") === 0L && col("id_b") === 9000L)
      .as[(Long, Long, Double)].collect()
    assert(subRow.toSeq.map(_._3) === Seq(1.0))
  }

  test("contamination's DEFAULT df-cap bounds a boilerplate flood (no explicit maxDf)") {
    // ContaminationMaxDf+1 train docs that are all the same boilerplate
    // shingle: the default call must drop the hot shingle (0 pairs), while
    // the explicit uncapped opt-in fans the eval doc into |train| pairs
    val nTrain = Dedup.ContaminationMaxDf + 1
    val train = spark.range(nTrain.toLong)
      .select($"id".as("doc_id"), lit("zz yy xx").as("text"))
    val eval = Seq((-1L, "zz yy xx")).toDF("doc_id", "text")
    assert(Dedup.contamination(train, eval, "doc_id", "text",
      n = 5, minShared = 1).count() === 0L)
    assert(Dedup.contamination(train, eval, "doc_id", "text",
      n = 5, minShared = 1, maxDf = Int.MaxValue).count() === nTrain.toLong)
  }

  test("capped == uncapped when no bucket exceeds the cap") {
    val df = corpus(13, 40).toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(Dedup.shingleIndex(df, "doc_id", "text", 3), "doc_id")
    val un = Dedup.minhashCandidates(sig, "doc_id", 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cap = Dedup.minhashCandidates(sig, "doc_id", 3, 4, bucketCap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cap === un)
  }

  test("jaccardPairs maxDf drops boilerplate shingles from sizes and intersections") {
    // 3 docs share the hot shingle "x y z"; docs 0,1 also share "p q r"
    val df = Seq(
      (0L, "x y z p q r"),
      (1L, "x y z p q r"),
      (2L, "x y z a b c")).toDF("doc_id", "text")
    val sh = Dedup.shingleIndex(df, "doc_id", "text", 3)
    // maxDf=2: shingles present in all 3 docs ("x y z") are dropped
    val capped = Dedup.jaccardPairs(sh, "doc_id", maxDf = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // docs 0,1 identical: all retained shingles shared → jaccard 1.0
    assert(capped((0L, 1L)) === 1.0)
    // doc 2 shares only dropped shingles with 0/1 → no pair emitted
    assert(!capped.contains((0L, 2L)) && !capped.contains((1L, 2L)))
  }

  test("kmeansTrain is bit-identical across partitionings (quantized exact sums)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def centroids(df: org.apache.spark.sql.DataFrame): Seq[(Int, Seq[Double])] =
      Similarity.kmeansTrain(df, "vec_id", "embedding", k = 6, iters = 2)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
        .sortBy(_._1).toSeq
    val base = centroids(emb)
    // different partition count AND different row order: per-cluster sums
    // must not depend on aggregation order — quantization makes them exact
    val shuffled = centroids(emb.repartition(7).sortWithinPartitions(col("vec_id").desc))
    assert(base === shuffled)
    assert(base.map(_._1) === (1 to 6))
  }

  test("components: min-label propagation groups chains, keeps components apart") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, pair 20-21 sharing nothing
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Dedup.components(pairs, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("components: a diameter-d chain converges within d rounds, not before") {
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    val full = Dedup.components(chain, iters = 8)
      .collect().map(r => r.getLong(1)).toSet
    assert(full === Set(1L)) // diameter 8 fully labeled in 8 rounds
    // after t rounds a node holds the min id within t hops: node 9 sees 7
    val partial = Dedup.components(chain, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial(9L) === 7L)
    assert(partial(3L) === 1L)
  }

  test("componentsConverged labels a 1000-node path in O(log n) rounds (adversarial diameter)") {
    // the documented limitation of fixed-round components: a diameter-999
    // chain would need 999 min-label rounds; the pointer-jumping variant
    // must fully label it inside its default 30-round budget (~log2 n)
    val chain = (1L to 1000L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    val got = Dedup.componentsConverged(chain).collect().map(r => r.getLong(1)).toSet
    assert(got === Set(1L))
  }

  test("componentsConverged refuses to return unconverged labels when maxRounds exhausts") {
    // a 200-chain needs ~log2(200) ≈ 8 pointer-jump rounds; a 2-round
    // budget must throw, not silently hand back coarse labels
    val chain = (1L to 200L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.componentsConverged(chain, maxRounds = 2)
    }
    assert(ex.getMessage.contains("maxRounds"))
  }

  test("componentsConverged agrees with fixed-round components on small-diameter graphs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val fixed = Dedup.components(pairs, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val conv = Dedup.componentsConverged(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv === fixed)
  }

  test("kmeansTrain sampleMod trains on exactly the md5-bucket sample") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sampled = Similarity.kmeansTrain(emb, "vec_id", "embedding",
        k = 4, iters = 2, sampleMod = Some(4))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).sortBy(_._1).toSeq
    // hand-filtered equivalent: same bucket filter applied up front
    val manual = Similarity.kmeansTrain(
        emb.filter(Similarity.sampleBucket(col("vec_id")) % 4 === 0),
        "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).sortBy(_._1).toSeq
    assert(sampled === manual)
    // the sample is real: training on it diverges from full-corpus training
    val full = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).sortBy(_._1).toSeq
    assert(sampled !== full)
  }

  test("ivfAssign: null embedding falls to the lowest centroid id, never a null cluster") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val cents = vecs.filter($"vec_id" < 2)
    val assigned = Similarity.ivfAssign(vecs, cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // the windowed form (DESC ranks nulls last, centroid-id tiebreak) and
    // the DuckDB oracles both resolve a degenerate row to the lowest id
    assert(assigned(2L) === Some(0L))
    assert(assigned(0L) === Some(0L) && assigned(1L) === Some(1L))
  }

  test("ivfSearchPruned returns exactly what ivfSearch returns (pruning is plan-only)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 4, iters = 2)
      .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
    val assigned = graft.tables.Scratch.stage(
      Similarity.ivfAssign(emb, cents, "vec_id", "embedding"), "prune_eq_index", Seq("cluster"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cos", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val full = rows(Similarity.ivfSearch(emb.filter($"vec_id" < 3), assigned, cents,
      "vec_id", "embedding", k = 5, nprobe = 2))
    val pruned = rows(Similarity.ivfSearchPruned(emb.filter($"vec_id" < 3), assigned, cents,
      "vec_id", "embedding", k = 5, nprobe = 2))
    assert(pruned === full)
    assert(full.nonEmpty)
  }

  test("ivfSearchPruned tolerates Int-typed cluster ids (kmeansTrain's natural output)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // centroid_id used as-is — INT, not cast to long as the other specs do.
    // probesOf inherits that type into the probe rows' `cluster` column, so
    // the driver-side collect must read it type-agnostically (the old
    // getAs[Long] threw ClassCastException here)
    val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 4, iters = 2)
      .select(col("centroid_id").as("vec_id"), col("embedding"))
    val assignedInt = graft.tables.Scratch.stage(
      Similarity.ivfAssign(emb, cents, "vec_id", "embedding"), "prune_int_index", Seq("cluster"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pruned = rows(Similarity.ivfSearchPruned(emb.filter($"vec_id" < 3), assignedInt, cents,
      "vec_id", "embedding", k = 5, nprobe = 2))
    val full = rows(Similarity.ivfSearch(emb.filter($"vec_id" < 3), assignedInt, cents,
      "vec_id", "embedding", k = 5, nprobe = 2))
    assert(pruned === full)
    assert(pruned.nonEmpty)
  }

  test("cosinePairsLsh ⊆ cosinePairs; identical vectors always collide") {
    val rnd = new Random(9)
    val vecs = ((0 until 40).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))) :+
      (200L, Array.fill(16)(0.25f)) :+ (201L, Array.fill(16)(0.25f))
    ).toDF("vec_id", "embedding")
    val all = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosinePairsLsh(vecs, "vec_id", "embedding", dim = 16, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(all))
    assert(lsh.contains((200L, 201L))) // every sign agrees → collide in every band
  }

  test("cosinePairsClustered ⊆ cosinePairs; identical vectors always pair") {
    val rnd = new Random(7)
    val vecs = ((0 until 40).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))) :+
      (100L, Array.fill(16)(0.5f)) :+ (101L, Array.fill(16)(0.5f))
    ).toDF("vec_id", "embedding")
    val all = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clustered = Similarity.cosinePairsClustered(vecs, vecs.filter($"vec_id" < 4),
        "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clustered.subsetOf(all))
    assert(clustered.contains((100L, 101L))) // identical → same cluster, cos 1.0
  }

  test("multi-probe IVF: single-probe ⊆ multi-probe ⊆ exact, recall strictly improves (sf0.01)") {
    import graft.Td
    val emb = Td(spark, "/root/testdata/sf0.01", "embeddings")
    val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8, iters = 2)
      .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.cosinePairs(emb, "vec_id", "embedding", 0.45))
    val single = pairs(Similarity.cosinePairsClustered(emb, cents, "vec_id", "embedding", 0.45))
    val multi = pairs(Similarity.cosinePairsClusteredMultiProbe(
      emb, cents, "vec_id", "embedding", 0.45, nprobe = 2))
    // containment by construction: probe-1 buckets are a subset of probe-2's
    assert(single.subsetOf(multi), s"single-probe pairs lost: ${single -- multi}")
    // never invents pairs: every emission is an exact cosine ≥ threshold
    assert(multi.subsetOf(truth), s"multi-probe invented: ${multi -- truth}")
    // the point: Voronoi-boundary pairs the single probe loses are caught
    assert(multi.size > single.size,
      s"no recall gain: single=${single.size}, multi=${multi.size}, exact=${truth.size}")
  }
}
