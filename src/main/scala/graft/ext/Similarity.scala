package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector-similarity operators over embedding columns (`array<float>`):
  * exact cosine, brute-force top-k (the correctness baseline), IVF-bucketed
  * approximate search (the scale path), and cosine near-dup pairs.
  *
  * Numeric parity with the DuckDB oracle: float→double casts are exact; the
  * dot product is a strict LEFT FOLD over the array (Spark `aggregate` ≡
  * DuckDB `list_reduce`) so double rounding happens in the same order in
  * both engines — results are bit-identical, and IEEE sqrt/divide are
  * correctly rounded. No UDFs: `zip_with`/`aggregate` are Catalyst
  * expressions and stay inside codegen.
  *
  * Scale: brute-force kNN is O(|Q|×|C|) — fine for a broadcast query set
  * against a partitioned corpus (each executor scans its corpus slice; no
  * shuffle until the per-query top-k agg). IVF cuts the scanned fraction to
  * nprobe/nlist by pre-clustering the corpus; the cluster assignment is a
  * one-off broadcast-join pass, then searches touch only probed clusters
  * (partition-prune by `cluster` when the corpus is written bucketed).
  */
object Similarity {

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Strict left-fold sum of element products — deterministic order.
    * Backed by the codegen'd [[graft.functions.DotProduct]] expression (the
    * equivalent `aggregate(zip_with(…))` fold is interpreted per element —
    * ~10× slower in the similarity hot loops, same bits).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(asDouble(a), asDouble(b))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Corpus with a precomputed norm column (one pass, reused by every
    * query batch — at scale this is materialized alongside the vectors).
    */
  def withNorm(df: DataFrame, vecCol: String, normCol: String = "nrm"): DataFrame =
    df.withColumn(normCol, norm(col(vecCol)))

  /** Exact top-k cosine neighbors of each query vector (self-match
    * excluded). `queries` is expected to be small → broadcast side of the
    * cross join; the corpus scan parallelizes per partition.
    */
  def knnBrute(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val q = withNorm(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv", "qn")
    val c = withNorm(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "cv", "cn")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** SEMANTIC decontamination — the embedding-space twin of the n-gram
    * scrub (c3/c4): flag every train document whose vector sits within
    * `threshold` cosine of ANY eval document — paraphrased or reformatted
    * benchmark leakage that shares no 13-gram survives the lexical scrub
    * and lands exactly here. Returns one row per CONTAMINATED train doc:
    * `(idCol, n_eval_hits, max_cos, nearest_eval_id)` — the audit record
    * a curation run publishes before dropping them.
    *
    * Scale shape: eval sets are small by nature (benchmarks, not
    * corpora), so the eval side broadcasts whole and the train side is
    * ONE map-only scan — no shuffle touches the corpus; the only exchange
    * groups the matched pairs (contamination-sized, not train-sized).
    * With a large eval set, bucket it and loop — or build an
    * [[AnnIndex]] on train and probe eval through
    * [[AnnIndex.searchRefined]]; this exact form is also the correctness
    * baseline those approximations are judged against.
    *
    * Determinism: exact cosine via the strict-left-fold [[dot]];
    * `nearest_eval_id` breaks cosine ties by smallest eval id.
    */
  def semanticDecontaminate(train: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double = 0.8): DataFrame = {
    val ev = withNorm(
      evalSet.select(col(idCol).as("eval_id"), col(vecCol).as("ev")), "ev", "en")
    val tr = withNorm(
      train.select(col(idCol), col(vecCol).as("tv")), "tv", "tn")
    val hits = tr.crossJoin(broadcast(ev))
      .select(col(idCol), col("eval_id"),
        (dot(col("tv"), col("ev")) / (col("tn") * col("en"))).as("cos"))
      .filter(col("cos") >= threshold)
    auditAgg(hits, idCol)
  }

  /** [[semanticDecontaminate]]'s hit set aggregated the OTHER way — one
    * row per LEAKED EVAL item: `(eval_id, n_train_hits, max_cos,
    * nearest_train_id)`. The per-train audit says what to DROP; this is
    * the report a benchmark owner reads — which eval items leaked into
    * the corpus at all, how many train documents carry each, and the
    * closest copy. Same hits, same plan shape (eval broadcasts, train is
    * one map-only scan; the group-by is leakage-sized, keyed on the
    * small side).
    */
  def evalLeakReport(train: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double = 0.8): DataFrame = {
    val ev = withNorm(
      evalSet.select(col(idCol).as("eval_id"), col(vecCol).as("ev")), "ev", "en")
    val tr = withNorm(
      train.select(col(idCol), col(vecCol).as("tv")), "tv", "tn")
    tr.crossJoin(broadcast(ev))
      .select(col(idCol), col("eval_id"),
        (dot(col("tv"), col("ev")) / (col("tn") * col("en"))).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_train_hits"),
        max(col("cos")).as("max_cos"),
        min_by(col(idCol), struct(-col("cos"), col(idCol)))
          .as("nearest_train_id"))
  }

  /** The c7 audit record over a `(idCol, eval_id, cos)` hit set — shared
    * by the exact and cluster-pruned scrubs so their outputs agree
    * row-for-row whenever their hit sets do.
    */
  private def auditAgg(hits: DataFrame, idCol: String): DataFrame =
    hits.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_eval_hits"),
        max(col("cos")).as("max_cos"),
        min_by(col("eval_id"), struct(-col("cos"), col("eval_id")))
          .as("nearest_eval_id"))

  /** [[semanticDecontaminate]] with the per-train-row eval fan-out PRUNED
    * by a coarse quantizer — the scrub a 100 TB corpus pass actually
    * runs, because the exact form pays O(|eval|·dim) per train row on
    * every pass. Here each train vector is assigned map-only to its
    * nearest centroid (codegen'd dots against ≤nlist broadcast literals —
    * the SAME assignment [[graft.ext.AnnIndex]] froze at build time, so
    * an already-indexed corpus could equally join its codes table), each
    * eval vector probes its `nprobe` nearest clusters, and only
    * (train, eval) pairs that MEET IN A PROBED CLUSTER pay the exact
    * cosine. Per-train-row cost drops from |eval| dots to
    * nlist + |eval|·nprobe/nlist expected dots; no shuffle touches the
    * corpus (eval probes broadcast onto the train scan, exactly like the
    * exact form).
    *
    * The c4 bloom contract, embedding-space: survivors are confirmed by
    * EXACT cosine, so every emitted row is bit-identical to the exact
    * scrub's row for that pair — the prune can only lose pairs whose
    * train cluster no probing eval reached. Retention is the nprobe/nlist
    * dial: nprobe = nlist degrades gracefully to exact semantics (every
    * pair is a candidate); the c8 oracle pins a smaller nprobe against
    * the EXACT oracle on the planted corpus, proving the prune invisible
    * there. Production guidance: pick nprobe by replaying a sampled slice
    * against [[semanticDecontaminate]] until the audit records match.
    */
  def semanticDecontaminatePruned(train: DataFrame, evalSet: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.8, nprobe: Int = 2): DataFrame = {
    val tr = ivfAssign(train, centroids, idCol, vecCol)
      .select(col(idCol), col(vecCol).as("tv"), col("nrm").as("tn"), col("cluster"))
    // probesOf's (query_id, qv, qn, cluster): each eval row appears once
    // per probed cluster and each train row sits in exactly one cluster,
    // so the cluster join yields each (train, eval) pair at most once —
    // no dedup needed before the audit aggregation
    val ev = probesOf(evalSet, centroids, idCol, vecCol, nprobe)
    val hits = tr.join(broadcast(ev), Seq("cluster"))
      .select(col(idCol), col("query_id").as("eval_id"),
        (dot(col("tv"), col("qv")) / (col("tn") * col("qn"))).as("cos"))
      .filter(col("cos") >= threshold)
    auditAgg(hits, idCol)
  }

  /** Quantized brute kNN — the search path over an int8-compressed store
    * ([[org.apache.spark.sql.graft.QuantizeI8]]): rank by the quantized
    * inner-product estimate `dot(q̂, ĉ) · s_q · s_c`. At scale the corpus
    * side reads 4×-smaller codes (plus one scale per vector) instead of
    * float32 — the IO cut IS the win; the integer dot is exact in IEEE
    * doubles (|code| ≤ 127, so a 64-dim dot ≤ ~10^6 ≪ 2^53), making the
    * ranking deterministic and oracle-replayable with no tolerance.
    * Ranking is by inner product, not cosine — the usual contract of a
    * quantized store (norms are folded into the scales).
    */
  def knnQuantized(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.graft.QuantizeI8
    def codes(df: DataFrame, id: String, sc: String, q: String): DataFrame = {
      val v = col(vecCol).cast("array<double>")
      df.select(col(idCol).as(id), QuantizeI8.scale(v).as(sc),
        QuantizeI8.quantize(v).cast("array<double>").as(q))
    }
    val qs = codes(queries, "query_id", "q_scale", "qq")
    val cs = codes(corpus, "neighbor_id", "c_scale", "cq")
    val scored = cs.crossJoin(broadcast(qs))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qq"), col("cq")) * col("q_scale") * col("c_scale")).as("ip"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ip").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** IVF cluster assignment: nearest (max-cosine) centroid per corpus
    * vector; ties broken by the LOWER centroid id.
    *
    * Map-only plan: the k centroids (bounded by k, never by data) are
    * collected and inlined as literals — one codegen'd dot column per
    * centroid plus a chained-`when` argmax, NO cross join, NO window, NO
    * shuffle. At 100 TB this is the difference between a projection over
    * the corpus scan and shuffling n×k rows to rank them; the equivalent
    * windowed form is what the DuckDB oracles replay, with identical
    * results (exact IEEE comparisons, same tie rule).
    */
  def ivfAssign(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, keepScore: Boolean = false): DataFrame = {
    val cents: Seq[(Long, Seq[Double], Double)] = centroids
      .select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toSeq
        (r.getLong(0), v, normOf(v))
      }.sortBy(_._1).toSeq
    // NOT fanned out ([[Fan]]): measured 2× SLOWER with a fan here — the
    // k-dot argmax is ~0.3 s of single-task work at bench scale, under the
    // cost of the extra exchange+stages the fan adds per action (unlike
    // the md5-heavy shingle paths, where the same fan wins 3-4×)
    assignToCentroids(withNorm(corpus.select(col(idCol), col(vecCol)), vecCol, "nrm"),
      cents, idCol, vecCol, keepScore)
  }

  /** Strict left fold ‖v‖ — same operation order as the DotProduct
    * expression, so a driver-side norm is bit-identical to an engine-side
    * one.
    */
  private def normOf(v: Seq[Double]): Double =
    math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))

  /** Nearest-centroid assignment as a map-only projection: one codegen'd
    * dot column per centroid literal plus a chained-`when` argmax. Ties go
    * to the LOWER centroid id: candidates are processed in ascending id
    * order and only a STRICT `>` displaces the running best — exactly
    * `ORDER BY ccos DESC, centroid_id LIMIT 1`. `corpus` must already
    * carry a `nrm` column.
    */
  private def assignToCentroids(
      corpus: DataFrame, cents: Seq[(Long, Seq[Double], Double)],
      idCol: String, vecCol: String, keepScore: Boolean = false): DataFrame = {
    require(cents.nonEmpty, "assignment needs at least one centroid")
    val ccosCols = cents.map { case (cid, v, cn) =>
      (dot(col(vecCol), lit(v.toArray)) / (col("nrm") * lit(cn))).as(s"_ccos$cid")
    }
    val scored = corpus.select(col(idCol) +: col(vecCol) +: col("nrm") +: ccosCols: _*)
    // two flat steps, both linear in k (a nested best-so-far fold would
    // reference its accumulator twice per level — 2^k codegen blowup):
    // best = greatest(ccos…), then the FIRST column equal to it in
    // ascending id order wins ties (Spark: NaN = NaN is true, NaN sorts
    // greatest — consistent on degenerate zero-norm vectors)
    val bestCol =
      if (cents.size == 1) col(s"_ccos${cents.head._1}")
      else greatest(cents.map { case (cid, _, _) => col(s"_ccos$cid") }: _*)
    val withBest = scored.withColumn("_bestc", bestCol)
    val cluster = cents.tail.foldLeft(
      when(col(s"_ccos${cents.head._1}") === col("_bestc"), lit(cents.head._1))) {
      case (acc, (cid, _, _)) => acc.when(col(s"_ccos$cid") === col("_bestc"), lit(cid))
    // degenerate rows (null embedding → every ccos null): both the old
    // windowed form (DESC sorts nulls last, centroid-id tiebreak) and the
    // DuckDB oracle resolve to the lowest centroid id — keep that here
    // instead of a null cluster falling out of downstream joins
    }.otherwise(lit(cents.head._1))
    val base = Seq(col(idCol), col(vecCol), col("nrm"), cluster.as("cluster"))
    val outCols = if (keepScore) base :+ col("_bestc").as("ccos") else base
    withBest.select(outCols: _*)
  }

  /** Probe set shared by [[ivfSearch]] and [[ivfSearchPruned]]: per query,
    * the `nprobe` max-cosine centroids (ties to the lower centroid id),
    * with the query vector and norm carried for the downstream rank.
    */
  private def probesOf(
      queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nprobe: Int): DataFrame = {
    val q = withNorm(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv", "qn")
    val cent = withNorm(
      centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("centv")), "centv", "centn")
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("centroid_id"))
    q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id"),
        (dot(col("qv"), col("centv")) / (col("qn") * col("centn"))).as("ccos"))
      .withColumn("rnk", row_number().over(probeW)).filter(col("rnk") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id").as("cluster"))
  }

  /** IVF approximate top-k: probe the `nprobe` nearest clusters per query,
    * rank only vectors assigned to those clusters. Recall < 1 by design;
    * the tradeoff knob is nprobe/nlist.
    */
  def ivfSearch(
      queries: DataFrame, assigned: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int = 5, nprobe: Int = 2): DataFrame = {
    val probes = probesOf(queries, centroids, idCol, vecCol, nprobe)
    val scored = assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (dot(col("qv"), col(vecCol)) / (col("qn") * col("nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** IVF approximate top-k for a SMALL query set (interactive search):
    * same semantics as [[ivfSearch]], but the probed cluster ids — bounded
    * by |Q|×nprobe BY CONTRACT, never by data size — are resolved on the
    * driver first and pushed as a static `isin` partition filter on the
    * cluster-partitioned index, so the scan reads the probed cluster
    * directories and nothing else. (The dynamic-partition-pruning route
    * falls back to a full scan here: the probe side's broadcast is not
    * reusable for pruning under AQE — `dynamicpruningexpression(true)` —
    * so the explicit prune is the reliable 100 TB shape. PlanSpec pins it:
    * partitions read == probed clusters.) The collected probe rows are
    * re-broadcast as a local relation, so the probe subplan runs exactly
    * once. Use [[ivfSearch]] when the query set is itself data-sized —
    * a single full index scan with a broadcast join is the right plan
    * there, and nothing driver-side may depend on |Q|.
    */
  def ivfSearchPruned(
      queries: DataFrame, assigned: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int = 5, nprobe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val probes = probesOf(queries, centroids, idCol, vecCol, nprobe)
    val probeRows = probes.collect() // |Q|×nprobe rows — driver-bounded by contract
    // cluster ids arrive as Int straight from kmeansTrain output or Long from a
    // cast index — read type-agnostically so callers need not remember to cast
    val probedClusters =
      probeRows.map(_.getAs[Number]("cluster").longValue()).distinct.sorted.toSeq
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probes.schema)
    val scored = assigned
      .filter(col("cluster").isInCollection(probedClusters)) // static partition prune
      .join(broadcast(probesLocal), Seq("cluster"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (dot(col("qv"), col(vecCol)) / (col("qn") * col("nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Quantize vector components to the 2^-20 binary grid. Quantized sums
    * are EXACT in double arithmetic (components |x|≤~1 scale to ≤2^20-grid
    * integers; up to 2^33 of them sum inside the 53-bit mantissa), so
    * per-cluster component sums are independent of aggregation order —
    * plain partial-aggregated SUMs, bit-reproducible across engines and
    * cluster topologies, no decimal types and no sorted folds.
    */
  private val QuantScale = 1048576.0 // 2^20

  def quantize(c: Column): Column =
    transform(asDouble(c), x => round(x * QuantScale) / QuantScale)

  /** Deterministic, engine-independent sampling bucket over an id column:
    * the first two hex nibbles of md5(id-as-string), an integer in [0, 256).
    * `sampleBucket(col(id)) % m === 0` keeps a ~1/m pseudo-random,
    * content-independent sample — replayable bit-for-bit by any engine with
    * md5 (DuckDB: `(strpos('0123456789abcdef', substr(md5(CAST(id AS
    * VARCHAR)), 1, 1)) - 1) * 16 + (strpos(…, 2, 1) - 1)`).
    */
  def sampleBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("int")

  /** Deterministic fixed-iteration Lloyd k-means over 2^-20-quantized
    * embeddings — IVF centroid training (replaces any "first k vectors as
    * centroids" demo seeding with actual cluster structure).
    *
    *   - seeding: the k smallest-id vectors (deterministic, no RNG);
    *   - assignment: max cosine, ties to the lower centroid id;
    *   - update: component mean via exact quantized SUM / COUNT — empty
    *     clusters keep their previous centroid;
    *   - per iteration the k×dim centroid matrix (bounded by k, never by
    *     data size) is collected and re-broadcast as literals, so each
    *     Lloyd pass is ONE distributed job with a broadcast cross join and
    *     one shuffle on (cluster, pos).
    *
    * Returns (centroid_id ∈ [1,k], `vecCol` array<double>). Training at
    * 100 TB runs on a sample: `sampleMod = Some(m)` trains on the
    * deterministic ~1/m md5-bucket sample of the corpus
    * ([[sampleBucket]] % m == 0 — engine-independent, so the oracle replays
    * the identical subset as a WHERE clause); assignment of the full corpus
    * is the broadcast-join pass in [[ivfAssign]].
    */
  def kmeansTrain(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, sampleMod: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = sampleMod.fold(df)(m => df.filter(sampleBucket(col(idCol)) % m === 0))
    // NOT fanned out ([[Fan]]): x2 measured 1.4 → 3.0 s with the training
    // frame fanned — every Lloyd action re-pays the repartition exchange
    // and the per-pass dot work is too small to amortize it (see
    // ivfAssign's note)
    val corpus = withNorm(
      src.select(col(idCol), quantize(col(vecCol)).as(vecCol)), vecCol, "nrm")

    // Seed with the k smallest-id vectors via orderBy + limit: Spark plans
    // TakeOrderedAndProject — a parallel per-partition top-k with a driver
    // merge of k rows — instead of the former no-partition Window, which
    // sorted the ENTIRE training frame into a single partition just to pick
    // k rows (disqualifying at 100 TB, even on a sample). Centroid ids 1..k
    // are assigned on the driver in ascending id order — bit-identical to
    // row_number() seeding, so the DuckDB oracle's QUALIFY form is unchanged.
    var centroids: Seq[(Int, Seq[Double])] = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol))
      .limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i + 1) -> r.getSeq[Double](1).toSeq }
      .toSeq

    for (_ <- 0 until iters) {
      // map-only nearest-centroid projection (no cross join, no window —
      // see assignToCentroids): each Lloyd pass is one scan + one shuffle
      // on (cluster, pos) for the mean
      val assigned = assignToCentroids(corpus,
        centroids.map { case (id, v) => (id.toLong, v, normOf(v)) }, idCol, vecCol)
      val sums = assigned
        .select(col("cluster"), posexplode(col(vecCol)))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getInt(1), r.getDouble(2), r.getLong(3)))
      val means: Map[Int, Seq[Double]] = sums.groupBy(_._1).map { case (cl, rows) =>
        cl -> rows.sortBy(_._2).map(t => t._3 / t._4).toSeq
      }
      centroids = centroids.map { case (id, old) => id -> means.getOrElse(id, old) }
    }
    centroids.toDF("centroid_id", vecCol)
  }

  /** Embedding-cosine near-dup pairs within IVF clusters — the scale path
    * for [[cosinePairs]]: the pair space shrinks from n² to Σ|cluster|²,
    * trading recall for the cross-cluster pairs (near-dups almost always
    * share a nearest centroid; increase centroid count to tighten buckets).
    */
  def cosinePairsClustered(
      df: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // materialize the assignment as a cluster-partitioned index stage —
    // building the IVF index IS a materialization step in any real system.
    // It evaluates the per-row argmax exactly once, and keeps the join's
    // isnotnull(cluster) constraint from being pushdown-substituted with
    // the full k-dot argmax expression (a measured 3× regression).
    val assigned = graft.tables.Scratch.stage(
      ivfAssign(df, centroids, idCol, vecCol), "ivf_pairs_index", Seq("cluster"))
    val a = assigned.select(col("cluster"),
      col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cluster"),
      col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Semantic dedup (the SemDeDup pass, Abbas et al. 2023): cluster the
    * corpus with trained centroids, pair only WITHIN clusters, and emit a
    * per-vector keep/remove verdict instead of raw pairs. The removal rule
    * is the paper's diversity-preserving one, made deterministic: of a
    * qualifying pair (cosine ≥ `threshold`), the vector CLOSER to its
    * centroid is removed (higher centroid-cosine loses; ties to the higher
    * id) — the kept representatives are the cluster's outskirts, which is
    * what keeps semantic coverage. One-pass set semantics: a vector is a
    * dup iff ANY same-cluster neighbor at ≥ threshold beats it on
    * (centroid-cosine asc, id asc) priority — order-free, so the oracle
    * can state it as a join, and a 1000-executor run gives the same answer
    * as a sequential greedy sweep gives on each pair.
    *
    * Scale shape: identical to [[cosinePairsClustered]] (assignment is a
    * staged map-only pass; pairing is an equi-join on `cluster`, so work
    * is Σ|cluster|² — bounded by training k ∝ N/target-cluster-size, never
    * all-pairs), plus one distinct over loser ids and a left join back.
    */
  def semDedup(
      df: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val assigned = graft.tables.Scratch.stage(
      ivfAssign(df, centroids, idCol, vecCol, keepScore = true),
      "semdedup_index", Seq("cluster"))
    val a = assigned.select(col("cluster"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("nrm").as("na"), col("ccos").as("ca"))
    val b = assigned.select(col("cluster"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("nrm").as("nb"), col("ccos").as("cb"))
    // per qualifying pair the LOSER is the vector nearer its centroid
    // (ties to the higher id); collecting distinct losers = "has some
    // higher-priority neighbor", the order-free one-pass rule
    val losers = a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select(when(col("ca") < col("cb") ||
          (col("ca") === col("cb") && col("id_a") < col("id_b")), col("id_b"))
        .otherwise(col("id_a")).as(idCol))
      .distinct()
    assigned.select(col(idCol), col("cluster"))
      .join(losers.withColumn("_dup", lit(1)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("_dup"), lit(0)).cast("int").as("is_dup"))
  }

  /** Top-`nprobe` centroid assignment: like [[ivfAssign]], but each vector
    * lands in its `nprobe` nearest clusters (ranked by cosine DESC, ties to
    * the lower centroid id — exactly `ROW_NUMBER() OVER (ORDER BY ccos
    * DESC, centroid_id) <= nprobe`). Same map-only shape: centroids inlined
    * as literals, the per-rank argmax is an iterated flat when-chain that
    * masks already-chosen centroids to -∞, and the final explode of the
    * rank array is a generate — still NO cross join, NO window, NO shuffle.
    * Output carries one row per (vector, probed cluster): |corpus| × nprobe
    * rows.
    */
  def ivfAssignMulti(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nprobe: Int = 2): DataFrame = {
    val cents: Seq[(Long, Seq[Double], Double)] = centroids
      .select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toSeq
        (r.getLong(0), v, normOf(v))
      }.sortBy(_._1).toSeq
    require(cents.nonEmpty, "assignment needs at least one centroid")
    val np = math.min(nprobe, cents.size)
    val ccosCols = cents.map { case (cid, v, cn) =>
      (dot(col(vecCol), lit(v.toArray)) / (col("nrm") * lit(cn))).as(s"_ccos$cid")
    }
    // NOT fanned out — see [[ivfAssign]]'s measured note
    var scored = withNorm(corpus.select(col(idCol), col(vecCol)), vecCol, "nrm")
      .select(col(idCol) +: col(vecCol) +: col("nrm") +: ccosCols: _*)
    for (p <- 0 until np) {
      val chosen = (0 until p).map(i => col(s"_cl$i"))
      def taken(cid: Long): Column =
        chosen.map(_ === cid).reduceOption(_ || _).getOrElse(lit(false))
      // rank-p candidate score: already-chosen centroids masked out; the
      // ccos columns are materialized projections, so the mask is a cheap
      // column reference, not a re-evaluated dot
      val masked = cents.map { case (cid, _, _) =>
        if (p == 0) col(s"_ccos$cid")
        else when(taken(cid), lit(Double.NegativeInfinity)).otherwise(col(s"_ccos$cid"))
      }
      val best = if (masked.size == 1) masked.head else greatest(masked: _*)
      scored = scored.withColumn(s"_best$p", best)
      // first unmasked column equal to best, ascending centroid id = the
      // (ccos DESC, centroid_id ASC) rank-p winner; degenerate rows (null
      // embedding → every ccos null → no strict match) fall through to the
      // lowest not-yet-chosen id, matching the oracle's NULLS LAST order
      val eqChain = cents.zip(masked).foldLeft(Option.empty[Column]) {
        case (acc, ((cid, _, _), m)) =>
          val hit = m === col(s"_best$p") && !taken(cid)
          Some(acc.fold(when(hit, lit(cid)))(_.when(hit, lit(cid))))
      }.get
      val fallback = cents.foldLeft(Option.empty[Column]) {
        case (acc, (cid, _, _)) =>
          val hit = !taken(cid)
          Some(acc.fold(when(hit, lit(cid)))(_.when(hit, lit(cid))))
      }.get
      scored = scored.withColumn(s"_cl$p", coalesce(eqChain, fallback))
    }
    scored.select(col(idCol), col(vecCol), col("nrm"),
      explode(array((0 until np).map(i => col(s"_cl$i")): _*)).as("cluster"))
  }

  /** Multi-probe variant of [[cosinePairsClustered]]: each vector is
    * indexed under its `nprobe` nearest centroids, so near-dup pairs
    * straddling a Voronoi boundary — the recall loss the single-probe path
    * documents — are caught whenever the two vectors share ANY probed
    * cluster. Pair space grows to at most nprobe² × Σ|cluster|² in the
    * worst case (still ≪ n²); duplicate emissions from multiply-shared
    * clusters are removed by the final distinct (cos is computed
    * identically on every emission, so the distinct collapses them
    * exactly). Recall strictly contains the single-probe result by
    * construction — DedupPropertySpec measures both against the exact
    * [[cosinePairs]] ground truth.
    */
  def cosinePairsClusteredMultiProbe(
      df: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, threshold: Double, nprobe: Int = 2,
      clusterCap: Int = Int.MaxValue): DataFrame = {
    require(clusterCap >= 1, s"clusterCap must be >= 1, got $clusterCap")
    val assigned = graft.tables.Scratch.stage(
      ivfAssignMulti(df, centroids, idCol, vecCol, nprobe),
      "ivf_mp_index", Seq("cluster"))
    // Uncapped short-circuit: at clusterCap = Int.MaxValue no cluster can
    // ever be hot, so the sizes aggregate, the broadcast size join, both
    // hot-side branches (including the identity groupBy on the raw vector
    // column), and the 3-way union are pure overhead — they cost a
    // measured 1.15× on the benched uncapped d11 call. Emit the plain
    // within-cluster pair join directly; the capped path below is
    // plan-identical for inputs with no over-cap cluster.
    if (clusterCap == Int.MaxValue) {
      val a = assigned.select(col("cluster"),
        col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"))
      val b = assigned.select(col("cluster"),
        col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"))
      return a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
        .filter(col("cos") >= threshold)
        .distinct()
    }
    // clusterCap bounds the flood quadratic exactly as [[graft.ext
    // .DedupIndex]]'s bucketCap bounds the lexical one: a cluster holding
    // m > cap members would emit O(m²) within-cluster pairs — a verbatim
    // embedding flood lands whole in ONE cluster (identical vectors share
    // every probe) — so hot clusters STAR-pair with their min-id member
    // instead: every member pairs with the rep at exact cosine, a flood
    // over the cap drops whole under greedy earlier-id resolution (m−1
    // pairs, linear), and only the hot cluster's NEAR-dup (non-verbatim)
    // recall coarsens to rep-only confirms — the documented bucketCap
    // trade, embedding side
    val sizes = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("_csz"), min(col(idCol)).as("_rep"))
    val withSz = assigned.join(broadcast(sizes), Seq("cluster"))
    val cold = withSz.filter(col("_csz") <= clusterCap)
    val a = cold.select(col("cluster"),
      col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"))
    val b = cold.select(col("cluster"),
      col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    val coldPairs = a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    val hot = withSz.filter(col("_csz") > clusterCap)
    val hotReps = hot.select(col("cluster"), col("_rep")).distinct()
      .join(assigned.select(col("cluster"), col(idCol), col(vecCol), col("nrm")),
        Seq("cluster"))
      .filter(col(idCol) === col("_rep"))
      .select(col("cluster"), col(idCol).as("id_a"),
        col(vecCol).as("va"), col("nrm").as("na"))
    val hotPairs = hot
      .filter(col(idCol) =!= col("_rep"))
      .select(col("cluster"), col(idCol).as("id_b"),
        col(vecCol).as("vb"), col("nrm").as("nb"))
      .join(hotReps, Seq("cluster"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    // the flood guarantee must not hinge on WHO the hot cluster's min-id
    // member is: a Voronoi cluster is not a near-dup bucket (unlike the
    // lexical band bucket this cap imitates), so the cluster rep can be
    // a FOREIGN vector whose star pairs all fall below the threshold —
    // admitting the flood whole. Exact-IDENTITY groups inside a hot
    // cluster therefore star to their OWN min-id member too: verbatim
    // copies pair at cosine 1 in m−1 rows at any cap, whoever the
    // cluster rep is (SemDedupSpec pins the foreign-rep scenario).
    val idGroups = hot.groupBy(col("cluster"), col(vecCol))
      .agg(min(col(idCol)).as("_grep"), count(lit(1)).as("_gn"))
      .filter(col("_gn") > 1)
      .select(col("cluster"), col(vecCol), col("_grep"))
    val identityPairs = hot.join(idGroups, Seq("cluster", vecCol))
      .filter(col(idCol) =!= col("_grep"))
      .select(col("_grep").as("id_a"), col(idCol).as("id_b"),
        (dot(col(vecCol), col(vecCol)) / (col("nrm") * col("nrm"))).as("cos"))
    coldPairs.unionByName(hotPairs).unionByName(identityPairs)
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** Deterministic sign-LSH hyperplanes: `h`×`dim` components on the 1/128
    * grid, derived from md5 of the (plane, dim) index — no RNG, and the
    * values are short dyadic rationals that print exactly in decimal, so
    * the SAME literals drive both the Spark plan and the DuckDB oracle.
    */
  def lshHyperplanes(h: Int, dim: Int): Seq[Seq[Double]] =
    (0 until h).map { i =>
      (0 until dim).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"hp:$i:$d".getBytes("UTF-8"))
        ((md(0) & 0xff) - 128) / 128.0
      }
    }

  /** The MEASURED band width for [[cosinePairsLsh]] at a cosine bar τ —
    * the derivation BENCH_LOCAL_r16.md §3 paid for: a cos-τ pair agrees
    * with a random hyperplane with p = 1 − acos(τ)/π per bit (Charikar
    * '02), so r = ⌈ln 0.3 / ln p⌉ targets ~0.3 per-band τ-pair collision
    * — 8 bands give ~95% τ-pair recall (1 − 0.7⁸) while a RANDOM pair
    * collides at only bands·2⁻ʳ. Fixed narrow bands are a trap the same
    * battery measured: 4-bit bands admit ~40% of ALL pairs and the
    * "prune" ran SLOWER than exact brute force (454 s vs 431 s at ×10;
    * τ-adaptive r=24 → 307 s, bit-identical output). Capped at 24 so the
    * packed bucket Int never overflows (1 << r); floored at 4 — sign-LSH
    * cannot prune hard at τ ≤ ~0.8 without losing τ-pairs, so low-bar
    * batch pairing belongs on an ADC shortlist or a raised exact cap,
    * not on wider bands.
    */
  def lshRowsPerBand(tau: Double): Int = {
    val pTau = 1.0 - math.acos(math.min(1.0, tau)) / math.Pi
    math.max(4, math.min(24, math.ceil(
      math.log(0.3) / math.log(math.min(0.99, math.max(0.51, pTau)))).toInt))
  }

  /** Sign-LSH bucketed cosine near-dup pairs — the second ANN scale path
    * beside [[cosinePairsClustered]], with no training step: each vector's
    * band bucket packs the signs of `rowsPerBand` hyperplane dots
    * (sign-random-projection LSH, Charikar '02 — here with deterministic
    * md5-derived planes); vectors sharing any band bucket become
    * candidates, then candidates are verified with the exact cosine.
    * Sub-quadratic like the IVF path (Σ|bucket|² pairs, not n²) and
    * embarrassingly parallel to bucket: 16 codegen'd dots per row, one
    * shuffle on (band, bucket). Recall < 1 by design — a pair collides
    * with probability (1-θ/π)^rowsPerBand per band; raise bands for
    * recall, rowsPerBand for precision ([[lshRowsPerBand]] is the
    * measured τ-adaptive choice). Identical vectors always collide
    * (every sign agrees).
    */
  def cosinePairsLsh(
      df: DataFrame, idCol: String, vecCol: String, dim: Int, threshold: Double,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val planes = lshHyperplanes(bands * rowsPerBand, dim)
    // fan a one-split scan: 16 codegen'd dots per row for the bucketing,
    // plus the verify-side dot — map-bound work (Fan: no-op at scale)
    val n = withNorm(Fan.out(df.select(col(idCol), col(vecCol)), col(idCol)),
      vecCol, "nrm")
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      (when(dot(col(vecCol), lit(p.toArray)) >= 0, lit(1 << (i % rowsPerBand)))
        .otherwise(lit(0))).as(s"_sb$i")
    }
    val withBits = n.select(col(idCol) +: bitCols: _*)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        (0 until rowsPerBand).map(r => col(s"_sb${b * rowsPerBand + r}")).reduce(_ + _).as("bucket"))
    }
    val ex = withBits.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
    val cands = ex.select(col(idCol).as("id_a"), col("band"), col("bucket"))
      .join(ex.select(col(idCol).as("id_b"), col("band"), col("bucket")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val a = n.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"))
    val b = n.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    cands.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).
    * All-pairs — correctness baseline for small/medium corpora; at scale
    * route through [[cosinePairsClustered]].
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val n = withNorm(df.select(col(idCol), col(vecCol)), vecCol, "nrm")
    val a = n.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"))
    val b = n.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  // --- Product quantization (PQ) ADC search --------------------------------
  //
  // The compression tier below int8 (knnQuantized): each L2-NORMALIZED
  // vector becomes m codebook indices — 16 bytes for a 64-dim float vector
  // at m=16, a 16× cut vs float32 — and search never reconstructs: a
  // query's dot against a coded vector is a sum of m table lookups
  // (asymmetric distance computation, Jégou et al. 2011, "Product
  // Quantization for Nearest Neighbor Search"). At 100 TB the coded corpus
  // is what fits a cluster's memory; the float vectors stay cold.
  //
  // Determinism contract (same as kmeansTrain): 2^-20-quantized inputs,
  // strict left-fold dots, k-smallest-id seeding, fixed Lloyd iterations,
  // first-minimum tie-breaks — the DuckDB oracle replays training, encode,
  // and ADC ranking exactly.

  /** Per-subspace codebooks: `books(j)` = k codewords for subspace j, each
    * (cid 1..k, codeword, ‖codeword‖² as a strict fold).
    */
  type PqBooks = Seq[Seq[(Int, Seq[Double], Double)]]

  private def sqNormOf(v: Seq[Double]): Double =
    v.foldLeft(0.0)((a, x) => a + x * x)

  /** 2^-20-quantized, L2-normalized, RE-quantized double vector (zero
    * vectors pass through) — PQ operates on the unit sphere so ADC dots
    * approximate cosine directly. The post-division round back onto the
    * 2^-20 grid is load-bearing: Lloyd's codeword means sum these values
    * with plain partial-aggregated SUMs, and only grid values sum exactly
    * regardless of order (the kmeansTrain argument) — off-grid unit
    * components would make the codebooks summation-order-dependent and the
    * oracle replay intermittently divergent.
    */
  private def unitVec(c: Column): Column = {
    val q = quantize(c)
    val n = norm(q)
    when(n === 0.0, q).otherwise(quantize(transform(q, x => x / n)))
  }

  /** (id, _u): the unit vector projected in stages — quantized array, then
    * its norm, then the division + grid re-round — so each piece evaluates
    * once per row instead of once per lambda element on the interpreted
    * HOF path. Arithmetic identical to [[unitVec]] (`norm(q)` IS
    * `sqrt(dot(q, q))`).
    */
  private def withUnit(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), quantize(col(vecCol)).as("_q"))
      .select(col(idCol), col("_q"), sqrt(dot(col("_q"), col("_q"))).as("_n"))
      .select(col(idCol), when(col("_n") === 0.0, col("_q"))
        .otherwise(quantize(transform(col("_q"), x => x / col("_n")))).as("_u"))

  /** (id, sub, sv): the m dsub-dim slices of each normalized vector. The
    * unit vector is projected ONCE per row before the explode — inlined in
    * the slice lambda it would re-run the quantize+norm+divide chain per
    * subspace through the interpreted higher-order path (~8× the work;
    * measured 33 s → 4 s at sf0.1 for the downstream encode).
    */
  private def subVectors(df: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int): DataFrame =
    slicedSubs(withUnit(df, idCol, vecCol), idCol, m, dsub)

  /** (id, sub, sv) slices of a prepared `(id, _u)` frame — the slicing
    * half of [[subVectors]], shared with the residual path (whose `_u` is
    * a residual, not a unit vector).
    */
  private def slicedSubs(pre: DataFrame, idCol: String, m: Int, dsub: Int): DataFrame =
    pre.select(col(idCol), posexplode(transform(sequence(lit(0), lit(m - 1)),
      j => slice(col("_u"), j * dsub + 1, lit(dsub)))).as(Seq("sub", "sv")))

  /** Per-row squared-L2 argmin against this row's subspace codebook, as a
    * map-only projection. The codebooks ride as nested literals indexed by
    * `sub` at runtime (no per-centroid expression unrolling: the unrolled
    * m×k form compiled to a codegen unit so large that JIT time dwarfed
    * the data — ~100 s at sf0.1 — while this tree is a dozen nodes). The
    * distance is ‖c‖² − 2·v·c (the ‖v‖² term is rank-invariant), the
    * argmin is `array_min` over (dist, cid) structs — lexicographic struct
    * ordering IS the tie rule: ties to the lower cid.
    */
  private def nearestCand(books: PqBooks, sv: Column, sub: Column): Column = {
    val k = books.head.length
    val bookLit = typedLit(books.map(_.map(_._2)))
    val ccLit = typedLit(books.map(_.map(_._3)))
    val kbook = element_at(bookLit, sub + 1) // this subspace's k codewords
    val ccs = element_at(ccLit, sub + 1)     // and their ‖c‖² values
    val cands = transform(sequence(lit(1), lit(k)), c =>
      struct(
        (element_at(ccs, c) - lit(2.0) * dot(sv, element_at(kbook, c))).as("d"),
        c.as("c")))
    array_min(cands)
  }

  private def nearestCode(books: PqBooks, sv: Column, sub: Column): Column =
    nearestCand(books, sv, sub).getField("c").cast("int")

  /** Mean squared quantization error of encoding `df`'s residuals with
    * the given (frozen) quantizer stack — the drift statistic behind
    * [[AnnIndex]]'s retrain trigger. Per row the error is
    * Σ_sub ‖sv − cw_chosen‖² = Σ_sub (‖sv‖² + min_c(‖c‖² − 2·sv·c)) —
    * the same candidate structs the encode's argmin already builds, so
    * the measurement is one map pass + one global aggregate, never a
    * second ranking. Returns (rows measured, mean per-row error).
    */
  def encodeErrorResidual(df: DataFrame, centroids: DataFrame,
      centers: ResidualCenters, idCol: String, vecCol: String,
      books: PqBooks): (Long, Double) = {
    val m = books.length
    val dsub = books.head.head._2.length
    val res = residuals(df, centroids, centers, idCol, vecCol)
    val r = slicedSubs(res.select(col(idCol), col("_r").as("_u")), idCol, m, dsub)
      .select((dot(col("sv"), col("sv")) +
        nearestCand(books, col("sv"), col("sub")).getField("d")).as("e"))
      .agg(count(lit(1)).as("n"), sum(col("e")).as("se"))
      .collect()(0)
    val nRows = r.getLong(0) / m
    (nRows, if (nRows == 0) 0.0 else r.getDouble(1) / nRows)
  }

  /** Train PQ codebooks: m subspaces × k codewords, all subspaces in ONE
    * Lloyd pass per iteration (a single scan + one (sub, cluster, pos)
    * aggregation — not m separate trainings). Seeded per subspace with the
    * k smallest-id subvectors; empty clusters keep their previous codeword.
    */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int = 8, k: Int = 16, iters: Int = 2,
      sampleMod: Option[Int] = None): PqBooks = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(k >= 1 && iters >= 0, s"need k >= 1 codewords, iters >= 0")
    // the 100 TB path trains on the deterministic md5-bucket sample (same
    // knob as kmeansTrain) — codebook quality needs corpus statistics, not
    // the corpus; encode still covers every vector
    val src = sampleMod.fold(df)(s => df.filter(sampleBucket(col(idCol)) % s === 0))
    pqLloyd(withUnit(src, idCol, vecCol), idCol, m, dim / m, k, iters)
  }

  /** The per-subspace Lloyd loop over a prepared `(id, _u)` frame —
    * shared by [[pqTrain]] (unit vectors) and [[pqTrainResidual]]
    * (coarse-centroid residuals); `_u` components must sit on the 2^-20
    * grid (the summation-order-independence contract).
    */
  private def pqLloyd(pre: DataFrame, idCol: String,
      m: Int, dsub: Int, k: Int, iters: Int): PqBooks = {
    // each Lloyd pass re-reads the subvector frame — cache it instead of
    // re-running scan + prepare + explode per iteration
    val sv = slicedSubs(pre, idCol, m, dsub).persist()

    // seed: subvectors of the k smallest-id vectors (TakeOrderedAndProject
    // on the driver side of a k-row collect — never a global sort)
    val seeds = pre.orderBy(col(idCol)).limit(k).collect()
      .map(_.getSeq[Double](1).toSeq)
    var books: PqBooks = (0 until m).map { j =>
      seeds.zipWithIndex.map { case (u, i) =>
        val cw = u.slice(j * dsub, j * dsub + dsub)
        (i + 1, cw, sqNormOf(cw))
      }.toSeq
    }

    for (_ <- 0 until iters) {
      val assigned = sv.select(col("sub"),
        nearestCode(books, col("sv"), col("sub")).as("cluster"), col("sv"))
      val sums = assigned
        .select(col("sub"), col("cluster"), posexplode(col("sv")))
        .groupBy(col("sub"), col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3), r.getLong(4))))
        .groupBy(_._1)
        .map { case (key, rows) =>
          key -> rows.map(_._2).sortBy(_._1).map(t => t._2 / t._3).toSeq
        }
      books = books.zipWithIndex.map { case (cws, j) =>
        cws.map { case (cid, old, oldcc) =>
          sums.get((j, cid)) match {
            case Some(cw) => (cid, cw, sqNormOf(cw))
            case None => (cid, old, oldcc)
          }
        }
      }
    }
    sv.unpersist(false)
    books
  }

  /** PQ-encode: (id, codes) where `codes(j)` ∈ 1..k names the nearest
    * codeword of subspace j. Map-only — the 100 TB index build is a
    * projection over the scan, written once; 16 bytes/vector at m=16.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String, books: PqBooks): DataFrame = {
    val m = books.length
    val dsub = books.head.head._2.length
    subVectors(df, idCol, vecCol, m, dsub)
      .select(col(idCol), col("sub"),
        nearestCode(books, col("sv"), col("sub")).as("code"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("_sc"))
      .select(col(idCol), transform(col("_sc"), s => s.getField("code")).as("codes"))
  }

  /** ADC score of a coded vector against a unit query: Σ_j dot(q's
    * subspace j, the codeword `codes(j)` names). The codebooks ride as ONE
    * nested literal (m × k × dsub doubles — bounded by geometry, never
    * data), so the score is a pure codegen projection.
    */
  private def adcExpr(books: PqBooks, qu: Column, codes: Column): Column = {
    val m = books.length
    val dsub = books.head.head._2.length
    val bookLit = typedLit(books.map(_.map(_._2)))
    (0 until m).map { j =>
      dot(slice(qu, lit(j * dsub + 1), lit(dsub)),
        element_at(element_at(bookLit, j + 1), element_at(codes, j + 1)))
    }.reduce(_ + _)
  }

  /** ADC top-k: rank the COMPRESSED corpus against each query by
    * Σ_j dot(q_j, codeword(codes_j)) — m dsub-dim lookups+dots per
    * (query, vector), never a reconstruction, never the float corpus.
    * Queries broadcast (small by contract); per-query top-k is the same
    * window as [[knnBrute]]. Scores approximate cosine (both sides unit).
    */
  def pqSearch(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, books: PqBooks, k: Int = 10): DataFrame = {
    val coded = pqEncode(corpus, idCol, vecCol, books)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val q = queries.select(col(idCol).as("query_id"), unitVec(col(vecCol)).as("qu"))
    val scored = coded.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        adcExpr(books, col("qu"), col("codes")).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most similar corpus vectors with a DIFFERENT label — the negatives
    * that actually move a contrastive loss (random negatives are trivially
    * far). Same broadcast-query/partitioned-corpus shape as [[knnBrute]];
    * the label inequality rides the join filter, so at scale this is one
    * corpus scan per query batch. Route through IVF probes first when the
    * corpus outgrows a scan-per-batch.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int = 5): DataFrame = {
    val q = withNorm(queries.select(col(idCol).as("query_id"),
      col(labelCol).as("q_label"), col(vecCol).as("qv")), "qv", "qn")
    val c = withNorm(corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("n_label"), col(vecCol).as("cv")), "cv", "cn")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_label") =!= col("n_label"))
      .select(col("query_id"), col("neighbor_id"), col("n_label"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** IVF+PQ — the full 100 TB ANN stack in one search: the coarse
    * quantizer prunes candidates to nprobe/nlist of the corpus (static
    * partition prune on the cluster-partitioned index, the
    * [[ivfSearchPruned]] mechanism), and PQ compresses what remains so
    * ranking reads codes, not floats. `index` is the materialized
    * (id, cluster, codes) table — floats appear nowhere in the search.
    * Simplification vs Jégou et al.'s residual coding: codebooks quantize
    * the unit vectors directly (no per-cluster residuals), trading a
    * little in-cluster resolution for a residual-free, oracle-replayable
    * encode; recall is recovered by raising nprobe or k (codebook size).
    */
  def ivfPqSearch(
      queries: DataFrame, index: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, books: PqBooks,
      k: Int = 5, nprobe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val probes = probesOf(queries, centroids, idCol, vecCol, nprobe)
      .select(col("query_id"), unitVec(col("qv")).as("qu"), col("cluster"))
    val probeRows = probes.collect() // |Q|×nprobe rows — driver-bounded by contract
    val probedClusters =
      probeRows.map(_.getAs[Number]("cluster").longValue()).distinct.sorted.toSeq
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probes.schema)
    val scored = index
      .filter(col("cluster").isInCollection(probedClusters)) // static partition prune
      .join(broadcast(probesLocal), Seq("cluster"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        adcExpr(books, col("qu"), col("codes")).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  // --- residual IVF+PQ (IVFADC, Jégou et al. 2011 §IV) ----------------------

  /** Residual centers as a trained artifact (the [[PqBooks]] of the
    * coarse stage): `centers(c − 1)` is cluster c's center in residual
    * space, indexed by [[kmeansTrain]]'s 1..k cluster ids; empty clusters
    * hold the zero vector (never read — an empty cluster contributes no
    * candidates, so its center reaches no score in either engine).
    */
  type ResidualCenters = Seq[Seq[Double]]

  /** Train the residual centers: per cluster, the component MEAN of its
    * members' UNIT vectors — the variance-minimizing center in the space
    * PQ actually quantizes, which is neither the raw [[kmeansTrain]]
    * centroid (its norm tracks the corpus scale — subtracting it leaves
    * residuals as large as the unit vectors) nor that centroid normalized
    * (|u − ĉ|² = 2 − 2cosθ EXCEEDS 1 at the wide assignment angles a
    * diffuse corpus produces; both dead ends measured in r13's recall
    * smoke runs, and PqSpec pins the jitter-ball bound that caught the
    * first). Against the mean c̄ the average residual power is
    * 1 − ‖c̄‖² ≤ 1 by construction — residual coding can only break even
    * or win. One assignment pass + one (cluster, pos) aggregation over
    * grid values (exact partial-agg sums, the kmeansTrain argument);
    * k×dim doubles collect — bounded by geometry, never data.
    */
  def residualCenters(df: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): ResidualCenters = {
    val nClusters = centroids.count().toInt
    val assigned = ivfAssign(df, centroids, idCol, vecCol)
      .select(col(idCol), col("cluster"))
    val means = withUnit(df, idCol, vecCol)
      .join(assigned, Seq(idCol))
      .select(col("cluster"), posexplode(col("_u")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Number]("cluster").longValue(),
        r.getInt(1), r.getDouble(2) / r.getLong(3)))
      .groupBy(_._1)
      .map { case (c, rows) => c -> rows.sortBy(_._2).map(_._3).toSeq }
    val dim = means.values.headOption.map(_.length).getOrElse(0)
    (1 to nClusters).map(c => means.getOrElse(c.toLong, Seq.fill(dim)(0.0)))
  }

  /** (id, cluster, _r): each vector's 2^-20-grid RESIDUAL against its
    * cluster's [[residualCenters]] center — `_r = quantize(unit(v) − c̄)`.
    * The re-quantization onto the grid is load-bearing for the same
    * reason as [[unitVec]]'s: Lloyd's codeword means sum these components
    * with plain partial-aggregated SUMs, and only grid values sum exactly
    * regardless of order. Assignment is [[ivfAssign]] verbatim; the
    * center lookup is hoisted to its own projected column so the
    * `zip_with` lambda reads a row-local array instead of re-evaluating
    * `element_at` per element (the interpreted-HOF pitfall).
    */
  def residuals(df: DataFrame, centroids: DataFrame, centers: ResidualCenters,
      idCol: String, vecCol: String): DataFrame = {
    val centLit = typedLit(centers)
    val assigned = ivfAssign(df, centroids, idCol, vecCol)
      .select(col(idCol), col("cluster"))
    withUnit(df, idCol, vecCol)
      .join(assigned, Seq(idCol))
      .select(col(idCol), col("cluster"), col("_u"),
        element_at(centLit, col("cluster").cast("int")).as("_cv"))
      .select(col(idCol), col("cluster"),
        quantize(zip_with(col("_u"), col("_cv"), (a, b) => a - b)).as("_r"))
  }

  /** PQ codebooks trained on RESIDUALS (unit vector − cluster center)
    * instead of the unit vectors themselves — Jégou et al.'s IVFADC form.
    * Why it wins at the same bits/vector: after coarse assignment every
    * vector's residual lives in a ball around the origin whose radius is
    * the in-cluster spread, so the m×k codewords spend their resolution
    * on WITHIN-cluster structure instead of re-describing the cluster
    * layout the coarse stage already encodes — the r12 recall grid showed
    * codebook resolution is the limiter, and this raises it without
    * raising storage. `centers` must come from ONE [[residualCenters]]
    * call over the full corpus and be shared with encode and search — a
    * sample-local center set would put train and encode in different
    * residual spaces. Same determinism contract as [[pqTrain]]; the s13
    * oracle replays centers+train+encode+search end-to-end.
    */
  def pqTrainResidual(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centers: ResidualCenters,
      dim: Int, m: Int = 8, k: Int = 16, iters: Int = 2,
      sampleMod: Option[Int] = None): PqBooks = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(k >= 1 && iters >= 0, s"need k >= 1 codewords, iters >= 0")
    val src = sampleMod.fold(df)(s => df.filter(sampleBucket(col(idCol)) % s === 0))
    pqLloyd(residuals(src, centroids, centers, idCol, vecCol)
      .select(col(idCol), col("_r").as("_u")), idCol, m, dim / m, k, iters)
  }

  /** Residual PQ encode: the complete (id, cluster, codes) index frame —
    * cluster rides along because the residual is only decodable WITH its
    * cluster center, so the pair is the index row by construction (and
    * the single [[ivfAssign]] pass serves both). Map-only like
    * [[pqEncode]]; stage partitioned by `cluster` for the probe-prune.
    */
  def pqEncodeResidual(df: DataFrame, centroids: DataFrame,
      centers: ResidualCenters, idCol: String, vecCol: String,
      books: PqBooks): DataFrame = {
    val m = books.length
    val dsub = books.head.head._2.length
    val res = residuals(df, centroids, centers, idCol, vecCol)
    slicedSubs(res.select(col(idCol), col("_r").as("_u")), idCol, m, dsub)
      .select(col(idCol), col("sub"),
        nearestCode(books, col("sv"), col("sub")).as("code"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("_sc"))
      .select(col(idCol), transform(col("_sc"), s => s.getField("code")).as("codes"))
      .join(res.select(col(idCol), col("cluster")), Seq(idCol))
  }

  /** Residual IVF+PQ search ([[ivfPqSearch]]'s scoring upgraded to the
    * IVFADC decomposition): a candidate in cluster c scores
    * `dot(q, center_c) + Σ_j dot(q_j, residual-codeword_j)` — the coarse
    * term re-adds what the residual encode subtracted (the decomposition
    * dot(q,c̄) + dot(q, u−c̄) = dot(q,u) is exact for any center), so the
    * sum approximates `dot(q, unit(v))` with the codebooks only paying
    * for the in-cluster part. Same probe machinery, partition prune, and
    * 8 B/vector float-free scan as the non-residual path; the coarse term
    * is one extra codegen'd dot against a k-bounded literal.
    */
  def ivfPqResidualSearch(
      queries: DataFrame, index: DataFrame, centroids: DataFrame,
      centers: ResidualCenters, idCol: String, vecCol: String, books: PqBooks,
      k: Int = 5, nprobe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val centLit = typedLit(centers)
    val probes = probesOf(queries, centroids, idCol, vecCol, nprobe)
      .select(col("query_id"), unitVec(col("qv")).as("qu"), col("cluster"))
    val probeRows = probes.collect() // |Q|×nprobe rows — driver-bounded by contract
    val probedClusters =
      probeRows.map(_.getAs[Number]("cluster").longValue()).distinct.sorted.toSeq
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probes.schema)
    val scored = index
      .filter(col("cluster").isInCollection(probedClusters)) // static partition prune
      .join(broadcast(probesLocal), Seq("cluster"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (dot(col("qu"), element_at(centLit, col("cluster").cast("int"))) +
          adcExpr(books, col("qu"), col("codes"))).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** [[ivfPqResidualSearch]] with the probe count replaced by a
    * SCANNED-CODES BUDGET — the latency-SLO dial the healthskew battery
    * showed fixed-nprobe search lacks (BENCH_LOCAL_r16.md §4: a hot
    * cluster at maxClusterFrac 0.47 made every probe that touched it
    * scan 34× its share and latency +46%; with a budget the hot cluster
    * EATS the budget instead of blowing it). Per query, centroids are
    * ranked by cosine (all nlist — geometry-bounded) and the probed set
    * is the ranked PREFIX whose cumulative cluster size stays ≤
    * `codesBudget`, top-1 always included — so per-query scanned codes
    * ≤ max(budget, largest single probed cluster), a bound the data
    * cannot break, at the price of recall that degrades (gracefully,
    * nearest-first) exactly where the geometry is skewed. Deterministic:
    * the prefix rule is a window over the same (ccos desc, centroid_id)
    * order every engine replays. Collect-and-prune tail like
    * [[ivfSearchPruned]] — |Q|×nlist driver rows by contract, so this is
    * the INTERACTIVE shape; data-sized query sets belong on
    * [[ivfPqResidualSearchJoin]] with a caller-chosen nprobe.
    */
  def ivfPqResidualSearchBudgeted(
      queries: DataFrame, index: DataFrame, centroids: DataFrame,
      centers: ResidualCenters, idCol: String, vecCol: String, books: PqBooks,
      k: Int, codesBudget: Long, clusterSizes: DataFrame): DataFrame = {
    require(codesBudget >= 1, s"codesBudget must be >= 1, got $codesBudget")
    val spark = queries.sparkSession
    val centLit = typedLit(centers)
    val q = withNorm(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv", "qn")
    val cent = withNorm(centroids.select(
      col(idCol).as("centroid_id"), col(vecCol).as("centv")), "centv", "centn")
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("centroid_id"))
    val ranked = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("centroid_id"),
        (dot(col("qv"), col("centv")) / (col("qn") * col("centn"))).as("ccos"))
      .withColumn("rnk", row_number().over(rankW))
      .join(broadcast(clusterSizes.select(
        col("cluster").as("centroid_id"), col("csize"))),
        Seq("centroid_id"), "left")
      .withColumn("csize", coalesce(col("csize"), lit(0L)))
    val cumW = Window.partitionBy(col("query_id")).orderBy(col("rnk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val probes = ranked.withColumn("cum", sum(col("csize")).over(cumW))
      .filter(col("rnk") === 1 || col("cum") <= codesBudget)
      .select(col("query_id"), unitVec(col("qv")).as("qu"), col("centroid_id").as("cluster"))
    val probeRows = probes.collect() // ≤ |Q|×nlist rows — interactive contract
    val probedClusters =
      probeRows.map(_.getAs[Number]("cluster").longValue()).distinct.sorted.toSeq
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probes.schema)
    val scored = index
      .filter(col("cluster").isInCollection(probedClusters)) // static partition prune
      .join(broadcast(probesLocal), Seq("cluster"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (dot(col("qu"), element_at(centLit, col("cluster").cast("int"))) +
          adcExpr(books, col("qu"), col("codes"))).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** [[ivfPqResidualSearch]] for a DATA-SIZED query set: identical
    * semantics (same probes, same ADC expression, same rank/tiebreak),
    * but nothing driver-side depends on |Q| — the probe frame stays
    * distributed and joins the codes table on `cluster` (the
    * [[ivfSearch]]-vs-[[ivfSearchPruned]] split, applied to the PQ
    * tier). The price is the prune: with the probed cluster ids unknown
    * to the driver, the scan reads every cluster partition once instead
    * of only the probed directories — the right trade exactly when |Q|
    * is large enough that most clusters are probed by SOMEONE anyway
    * (and the collect would be |Q|×nprobe rows CARRYING QUERY VECTORS —
    * gigabytes at a backfill-sized batch). No broadcast hint on either
    * side: a data-sized probe frame must be allowed to shuffle; AQE
    * still promotes small sides at runtime.
    */
  def ivfPqResidualSearchJoin(
      queries: DataFrame, index: DataFrame, centroids: DataFrame,
      centers: ResidualCenters, idCol: String, vecCol: String, books: PqBooks,
      k: Int = 5, nprobe: Int = 2): DataFrame = {
    val centLit = typedLit(centers)
    val probes = probesOf(queries, centroids, idCol, vecCol, nprobe)
      .select(col("query_id"), unitVec(col("qv")).as("qu"), col("cluster"))
    val scored = index
      .join(probes, Seq("cluster"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (dot(col("qu"), element_at(centLit, col("cluster").cast("int"))) +
          adcExpr(books, col("qu"), col("codes"))).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Exact re-rank of an ANN shortlist (the "+R" of IVFADC+R, Jégou et
    * al. §V reduced to its modern production form): the quantized stage
    * proposes `kShort` candidates per query, and only THOSE rows pay an
    * exact cosine against the original vectors — the two-stage shape
    * every large retrieval deployment runs, because ADC error only has to
    * keep the true neighbors inside the shortlist, not rank them.
    *
    * Contract: output ⊆ shortlist by construction (an exact-closer vector
    * the ANN stage missed can never appear — refine repairs ORDER, not
    * RECALL; recall repairs belong to nprobe/kShort). Ranks by exact
    * cosine desc, neighbor_id tiebreak; rows with `cos` ties replay
    * identically in any engine because [[dot]] is a strict left fold.
    *
    * Scale shape: the shortlist is |Q|×kShort rows — broadcast it into
    * the corpus scan, so fetching candidate vectors is ONE map-only pass
    * over the vector table (broadcast hash join, no corpus shuffle, scan
    * pruned to the id and vector columns); norms are computed on the
    * |Q|×kShort fetched rows only. Queries broadcast likewise. Nothing
    * downstream of the scan exceeds |Q|×kShort rows.
    */
  def refineExact(shortlist: DataFrame, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 5,
      broadcastHints: Boolean = true): DataFrame = {
    // broadcastHints = false is the DATA-SIZED query-set shape (a backfill
    // batch refined through the semantic ingest gate): |Q|×kShort shortlist
    // rows and |Q| query vectors must be allowed to shuffle instead of
    // being forced driver-through as broadcasts; AQE still promotes small
    // sides at runtime, so the small-|Q| plan is unchanged in effect.
    def maybeB(df: DataFrame) = if (broadcastHints) broadcast(df) else df
    val q = withNorm(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv", "qn")
    val cand = shortlist.select(col("query_id"), col("neighbor_id"))
    val fetched = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(maybeB(cand), Seq("neighbor_id"))
    val scored = withNorm(fetched, "cv", "cn")
      .join(maybeB(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  // --- per-dimension standardization (whitening-lite) -----------------------

  /** Per-DIMENSION corpus moments of an embedding column — the statistics
    * pass behind [[standardize]]: per dim, the mean and sample-σ of the
    * values QUANTIZED TO MICROS (`round(x·10⁶)` — integer-valued doubles,
    * so the e4 exact-moment pattern applies on the dimension axis: Σ and
    * Σ² accumulate in DECIMAL(18,0)/DECIMAL(38,0) with zero rounding, and
    * μ/σ derive in doubles with the identical expression tree in any
    * engine). One explode + one 64-group aggregation with map-side
    * combine; output is |dim| rows — broadcast-sized by construction.
    */
  def dimStats(df: DataFrame, vecCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val xm = col("_xm").cast(DecimalType(18, 0))
    val st = df.select(posexplode(col(vecCol)).as(Seq("dim", "_x")))
      .select(col("dim"), round(col("_x").cast("double") * 1e6).as("_xm"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).cast("long").as("n_vals"),
        sum(xm).as("_s1"),
        sum((xm * xm).cast(DecimalType(38, 0))).as("_s2"))
    val mu = col("_s1").cast("double") / col("n_vals")
    // Bessel factor guarded by n_vals > 1: with one row the n/(n-1)
    // correction is 0·∞ = NaN, and NaN > 0 in Spark's ordering would leak
    // through standardize()'s σ>0 guard — a one-row corpus must
    // standardize to the documented 0.0, so σ is pinned to 0 there.
    val sg = when(col("n_vals") > 1, sqrt(greatest(
      (col("_s2").cast("double") / col("n_vals") - mu * mu) *
        (col("n_vals").cast("double") / (col("n_vals") - 1).cast("double")),
      lit(0.0)))).otherwise(lit(0.0))
    st.select(col("dim"), col("n_vals"), mu.as("mu_micros"), sg.as("sigma_micros"))
  }

  /** Standardize (z-score per dimension) an embedding column — the
    * whitening-lite post-processing a retrieval stack runs when raw
    * dimensions have wildly different scales (a dominant dimension
    * swamps every PQ subspace and cosine alike). Adds `<vecCol>_std`:
    * element i becomes (micros − μᵢ)/σᵢ, 0.0 where σᵢ = 0 (a constant
    * dimension carries no information). The |dim|-row stats table rides
    * the expression as array literals (the centroid collect idiom —
    * driver-bounded by construction); the transform itself is per-row map
    * work riding the scan.
    */
  def standardize(df: DataFrame, vecCol: String): DataFrame = {
    val stats = dimStats(df, vecCol).orderBy(col("dim")).collect()
    val mus = array(stats.map(r => lit(r.getAs[Double]("mu_micros"))).toSeq: _*)
    val sgs = array(stats.map(r => lit(r.getAs[Double]("sigma_micros"))).toSeq: _*)
    df.withColumn(vecCol + "_std",
      transform(col(vecCol), (x, i) => {
        val sg = element_at(sgs, i + 1)
        when(sg > 0,
          (round(x.cast("double") * 1e6) - element_at(mus, i + 1)) / sg)
          .otherwise(lit(0.0))
      }))
  }
}
