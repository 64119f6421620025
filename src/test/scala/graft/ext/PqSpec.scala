package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization ADC search (S5): codes well-formed, duplicates
  * share codes, ADC ranking respects coarse cluster structure.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal families in 16 dims: ids 1-20 point along dims 0-3,
  // ids 101-120 along dims 8-11, with deterministic per-id jitter
  private lazy val corpus = {
    def vec(base: Int, i: Int): Seq[Float] =
      (0 until 16).map { d =>
        val on = d >= base && d < base + 4
        (if (on) 1.0f + 0.01f * ((i * 7 + d) % 5) else 0.001f * ((i * 3 + d) % 7))
      }
    val rows =
      (1 to 20).map(i => (i.toLong, vec(0, i))) ++
      (101 to 120).map(i => (i.toLong, vec(8, i)))
    rows.toDF("vec_id", "embedding")
  }

  private lazy val books =
    Similarity.pqTrain(corpus, "vec_id", "embedding", dim = 16, m = 4, k = 4, iters = 2)

  test("codebooks: m subspaces x k codewords of dsub dims") {
    assert(books.length === 4)
    assert(books.forall(_.length === 4))
    assert(books.forall(_.forall(_._2.length === 4)))
    assert(books.forall(_.map(_._1) === Seq(1, 2, 3, 4)))
  }

  test("encode: codes in 1..k, one per subspace; same vector -> same codes") {
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", books)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.size === 40)
    assert(codes.values.forall(c => c.length === 4 && c.forall(x => x >= 1 && x <= 4)))
    // append an exact duplicate of vector 1 -> identical code word
    val dup = corpus.filter(col("vec_id") === 1).withColumn("vec_id", lit(999L))
    val codes2 = Similarity.pqEncode(corpus.union(dup), "vec_id", "embedding", books)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes2(999L) === codes2(1L))
  }

  test("ADC search ranks the query's family above the orthogonal one") {
    val out = Similarity.pqSearch(
        corpus.filter(col("vec_id") === 1), corpus, "vec_id", "embedding", books, k = 15)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length === 15)
    val top10 = out.filter(_._4 <= 10).map(_._2)
    // every top-10 neighbor of an id-1 query is from the id<=20 family
    assert(top10.forall(_ <= 20), s"cross-family neighbors in top-10: ${top10.toSeq}")
    // ADC approximates cosine: same-family scores near 1, cross-family near 0
    val sameFam = out.filter(_._2 <= 20).map(_._3)
    val crossFam = out.filter(_._2 > 100).map(_._3)
    assert(sameFam.forall(_ > 0.9))
    assert(crossFam.forall(_ < 0.2))
  }

  test("search output shape matches knnBrute's contract") {
    val pq = Similarity.pqSearch(
      corpus.filter(col("vec_id") < 3), corpus, "vec_id", "embedding", books, k = 5)
    assert(pq.columns.toSeq === Seq("query_id", "neighbor_id", "adc", "rnk"))
    val perQ = pq.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(perQ === Map(1L -> 5L, 2L -> 5L))
  }

  test("ivfPqSearch: ranks only within probed coarse clusters, never reads floats") {
    val cents = Similarity.kmeansTrain(corpus, "vec_id", "embedding", k = 2, iters = 2)
      .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
    val index = Similarity.ivfAssign(corpus, cents, "vec_id", "embedding")
      .select(col("vec_id"), col("cluster"))
      .join(Similarity.pqEncode(corpus, "vec_id", "embedding", books), Seq("vec_id"))
    assert(index.columns.toSet === Set("vec_id", "cluster", "codes")) // no embedding
    val clusterOf = index.select("vec_id", "cluster")
      .as[(Long, Long)].collect().toMap
    val out = Similarity.ivfPqSearch(
        corpus.filter(col("vec_id") === 1), index, cents,
        "vec_id", "embedding", books, k = 10, nprobe = 1)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length === 10)
    // nprobe=1: every neighbor shares the query's coarse cluster
    val qCluster = clusterOf(1L)
    assert(out.forall(r => clusterOf(r._2) === qCluster), s"out-of-probe neighbor in $out")
    // with two well-separated families, that cluster IS the query's family
    assert(out.forall(_._2 <= 20))
  }

  test("invalid geometry rejected") {
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(corpus, "vec_id", "embedding", dim = 16, m = 5)
    }
  }

  test("residual IVF+PQ: index carries (cluster, codes), ranking respects family structure") {
    val cents = Similarity.kmeansTrain(corpus, "vec_id", "embedding", k = 2, iters = 2)
      .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
    val centers = Similarity.residualCenters(corpus, cents, "vec_id", "embedding")
    val rbooks = Similarity.pqTrainResidual(corpus, "vec_id", "embedding", cents,
      centers, dim = 16, m = 4, k = 4, iters = 2)
    assert(rbooks.length === 4 && rbooks.forall(_.length === 4))
    val index = Similarity.pqEncodeResidual(corpus, cents, centers,
      "vec_id", "embedding", rbooks)
    assert(index.columns.toSet === Set("vec_id", "cluster", "codes")) // no embedding
    assert(index.count() === 40)
    // exact duplicates land in the same cluster with identical codes
    val dup = corpus.filter(col("vec_id") === 1).withColumn("vec_id", lit(999L))
    val withDup = Similarity
      .pqEncodeResidual(corpus.union(dup), cents, centers, "vec_id", "embedding", rbooks)
      .as[(Long, Seq[Int], Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(withDup(999L) === withDup(1L))
    // two-term ADC: the query's own family fills the top-10, and the
    // score approximates cosine (same-family near 1, cross-family small)
    val out = Similarity.ivfPqResidualSearch(
        corpus.filter(col("vec_id") === 1), index, cents, centers,
        "vec_id", "embedding", rbooks, k = 15, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length === 15)
    assert(out.filter(_._4 <= 10).forall(_._2 <= 20),
      s"cross-family neighbor in top-10: ${out.toSeq}")
    assert(out.filter(_._2 <= 20).forall(_._3 > 0.9))
    assert(out.filter(_._2 > 100).forall(_._3 < 0.2))
  }

  test("residual codebooks describe IN-cluster spread: tighter than unit codebooks on clustered data") {
    // interleaved ids (odd → family A, even → family B) so the two
    // k-means seeds — the smallest ids — land one per family and the
    // coarse centroids are family-aligned by construction
    def vec(base: Int, i: Int): Seq[Float] =
      (0 until 16).map { d =>
        val on = d >= base && d < base + 4
        (if (on) 1.0f + 0.01f * ((i * 7 + d) % 5) else 0.001f * ((i * 3 + d) % 7))
      }
    val inter = (1 to 40).map(i =>
      (i.toLong, vec(if (i % 2 == 1) 0 else 8, i))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansTrain(inter, "vec_id", "embedding", k = 2, iters = 2)
      .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
    val centers = Similarity.residualCenters(inter, cents, "vec_id", "embedding")
    val ubooks = Similarity.pqTrain(inter, "vec_id", "embedding",
      dim = 16, m = 4, k = 4, iters = 2)
    val rbooks = Similarity.pqTrainResidual(inter, "vec_id", "embedding", cents,
      centers, dim = 16, m = 4, k = 4, iters = 2)
    // unit codewords must span the families (the active subspace holds
    // ~all of a unit vector's mass); residual codewords live in the small
    // in-cluster jitter ball around each family's unit-mean center —
    // exactly the bound that caught the raw-centroid and unit-centroid
    // subtraction bugs (residual norms ~1 instead of jitter-scale)
    def maxSqNorm(b: Similarity.PqBooks) = b.flatMap(_.map(_._3)).max
    assert(maxSqNorm(ubooks) > 0.5, s"unit codewords span families: ${maxSqNorm(ubooks)}")
    assert(maxSqNorm(rbooks) < 0.01,
      s"residual codewords should sit in the jitter ball: ${maxSqNorm(rbooks)}")
  }
}
