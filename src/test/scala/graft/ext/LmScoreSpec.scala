package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stupid-backoff chain of the exported-LM scorer (T17). */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private def bt = Seq(("big ram", "-0.250000")).toDF("bigram", "logp")
  private def ut = Seq(("ram", "-0.500000"), ("big", "-0.125000")).toDF("word", "logp")

  private def score(docs: Seq[(Long, String)]) =
    TextAnalysis.lmScore(docs.toDF("id", "text"), "id", "text", bt, ut,
        oovLogp = -1.0, backoffLogp = -0.0625)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("bigram hit beats backoff; unigram backoff beats OOV") {
    // "big ram" → bigram hit -0.25; "xxx ram" → unigram(ram) -0.5 + backoff
    // -0.0625 = -0.5625; "xxx yyy" → OOV -1.0
    val r = score(Seq(1L -> "big ram", 2L -> "xxx ram", 3L -> "xxx yyy"))
    assert(r(1L) === ((1L, 1L, -0.25)))
    assert(r(2L) === ((1L, 0L, -0.5625)))
    assert(r(3L) === ((1L, 0L, -1.0)))
  }

  test("mean pools over all bigrams of the document") {
    // bigrams: "big ram" (-0.25), "ram big" (uni big -0.125 + -0.0625),
    // "big zzz" (OOV -1.0) → avg = (-0.25 - 0.1875 - 1.0) / 3
    val r = score(Seq(1L -> "big ram big zzz"))
    assert(r(1L)._1 === 3L && r(1L)._2 === 1L)
    assert(r(1L)._3 === (-0.25 - 0.1875 - 1.0) / 3)
  }

  test("documents with fewer than two tokens are absent (caller outer-joins)") {
    val r = score(Seq(1L -> "solo", 2L -> "", 3L -> "two words"))
    assert(!r.contains(1L) && !r.contains(2L) && r.contains(3L))
  }
}
