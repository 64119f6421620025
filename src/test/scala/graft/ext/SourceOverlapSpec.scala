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

  test("snapshot diff classifies added/removed/changed/unchanged exactly") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val next = Seq((2L, "b"), (3L, "c CHANGED"), (4L, "d")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(base, next, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("snapshot diff joins digests, not document bodies") {
    val base = Seq((1L, "a")).toDF("doc_id", "text")
    val next = Seq((1L, "a")).toDF("doc_id", "text")
    val plan = Dedup.snapshotDiff(base, next, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    // the join's inputs carry (id, md5) only — raw text must be pruned
    // below the join, so 'text' appears nowhere above the leaf projections
    val joinLine = plan.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(joinLine.nonEmpty && !joinLine.contains("text"), plan)
  }
}
