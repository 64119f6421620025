package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-dimension embedding standardization (X31). */
class StandardizeSpec extends SparkSpec {
  import spark.implicits._

  // dim 0: scale 1000 (dominant), dim 1: unit scale, dim 2: CONSTANT
  private def emb = Seq(
    (1L, Seq(1000.0f, 1.0f, 7.0f)),
    (2L, Seq(2000.0f, 2.0f, 7.0f)),
    (3L, Seq(3000.0f, 3.0f, 7.0f)),
    (4L, Seq(4000.0f, 4.0f, 7.0f))).toDF("vec_id", "embedding")

  test("standardized dims have mean 0 and sample variance 1; constant dims zero out") {
    val out = Similarity.standardize(emb, "embedding")
      .select(col("vec_id"), col("embedding_std")).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1))
    (0 to 1).foreach { d =>
      val xs = out.map(_(d))
      assert(math.abs(xs.sum) < 1e-9, s"dim $d mean: ${xs.sum / xs.length}")
      val v = xs.map(x => x * x).sum / (xs.length - 1)
      assert(math.abs(v - 1.0) < 1e-9, s"dim $d variance: $v")
    }
    // the dominant dim no longer dominates: same z-profile as the unit dim
    assert(out.map(_(0)).zip(out.map(_(1))).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // σ = 0 → 0.0, never NaN/Inf
    assert(out.forall(_(2) === 0.0))
  }

  test("single-row corpus standardizes to 0.0, never NaN (Bessel 0*Inf guard)") {
    val one = Seq((1L, Seq(3.5f, -2.0f))).toDF("vec_id", "embedding")
    val st = Similarity.dimStats(one, "embedding").orderBy("dim").collect()
    assert(st.forall(r => r.getAs[Double]("sigma_micros") === 0.0))
    val out = Similarity.standardize(one, "embedding")
      .select(col("embedding_std")).head.getSeq[Double](0)
    assert(out.forall(_ === 0.0))
  }

  test("dimStats moments are exact: hand-computed micros") {
    val st = Similarity.dimStats(emb, "embedding").orderBy("dim").collect()
    val d1 = st(1) // values 1..4 → micros 1e6..4e6
    assert(d1.getAs[Long]("n_vals") === 4L)
    assert(d1.getAs[Double]("mu_micros") === 2.5e6)
    // sample σ of {1,2,3,4}·1e6 = sqrt(5/3)·1e6
    assert(math.abs(d1.getAs[Double]("sigma_micros") - math.sqrt(5.0 / 3.0) * 1e6) < 1e-3)
  }
}
