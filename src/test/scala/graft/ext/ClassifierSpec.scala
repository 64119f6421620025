package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge contracts of the trained-weight linear classifier (T15):
  * OOV → bias-only, empty documents, token multiplicity.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def weights = Seq(
    ("fast", "0.500000"), ("slow", "-0.250000"), ("ghost", "0.125000"))
    .toDF("term", "weight")

  private def score(docs: Seq[(Long, String)], bias: Double = 0.0) =
    TextAnalysis.linearScore(
        docs.toDF("id", "text"), "id", "text", weights, bias = bias)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("all-OOV and empty documents score exactly the bias") {
    val r = score(Seq(1L -> "unknown tokens only", 2L -> "", 3L -> "   "), bias = -0.03125)
    assert(r(1L) === ((3L, 0L, -0.03125)))
    // empty/whitespace text splits to the single "" token (the cross-engine
    // convention), which is OOV → bias, never NaN or a lost row
    assert(r(2L) === ((1L, 0L, -0.03125)))
    assert(r(3L) === ((1L, 0L, -0.03125)))
  }

  test("tokens carry multiplicity and OOV tokens dilute the mean") {
    val r = score(Seq(1L -> "fast fast slow", 2L -> "fast unknown"))
    // (0.5 + 0.5 - 0.25) / 3 = 0.25
    assert(r(1L) === ((3L, 3L, 0.25)))
    // (0.5 + 0) / 2 = 0.25 — OOV contributes 0 but still counts in n
    assert(r(2L) === ((2L, 1L, 0.25)))
  }

  test("weight rows for terms absent from the corpus are inert") {
    val r = score(Seq(1L -> "fast fast"))
    assert(r(1L) === ((2L, 2L, 0.5)))
  }

  test("bias shifts every score uniformly") {
    val a = score(Seq(1L -> "fast slow"))(1L)._3
    val b = score(Seq(1L -> "fast slow"), bias = 0.125)(1L)._3
    assert(b === a + 0.125)
  }
}
