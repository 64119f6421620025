package graft.ext

import graft.SparkSpec

class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("identical groups estimate 1.0, disjoint groups 0.0") {
    val doc1 = "alpha beta gamma delta epsilon zeta eta theta"
    val doc2 = "one two three four five six seven eight nine"
    val df = Seq(
      ("sA", doc1), ("sA", doc2),
      ("sB", doc1), ("sB", doc2),  // sB ≡ sA
      ("sC", "completely different words nowhere else used ever again")
    ).toDF("src", "text")
    val out = Dedup.sourceOverlap(df, "src", "text", numHashes = 16)
      .as[(String, String, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(out(("sA", "sB")) === 1.0) // identical shingle sets: every cell matches
    assert(out(("sA", "sC")) === 0.0) // disjoint sets: a shared min is ~impossible
    assert(out(("sB", "sC")) === 0.0)
    assert(out.size === 3) // each unordered pair once
  }

  test("estimate tracks true overlap directionally on half-shared sets") {
    // sX and sY share doc1; each adds a distinct doc — true Jaccard ~ 1/3..1/2
    val doc1 = "the quick brown fox jumps over the lazy dog today"
    val df = Seq(
      ("sX", doc1), ("sX", "unique ex one two three four five six seven"),
      ("sY", doc1), ("sY", "unique wye nine ten eleven twelve thirteen fourteen fifteen")
    ).toDF("src", "text")
    val j = Dedup.sourceOverlap(df, "src", "text", numHashes = 16)
      .as[(String, String, Double)].head()._3
    assert(j > 0.0 && j < 1.0, s"expected partial overlap estimate, got $j")
  }
}
