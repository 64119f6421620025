package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** In-engine model training: lmTrain (T24) and nbTrain (T25), plus their
  * end-to-end composition with the existing scoring surfaces.
  */
class TrainedModelsSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // --- lmTrain ---------------------------------------------------------------

  private def refCorpus = Seq((1L, "a b a b c"), (2L, "a b")).toDF("id", "text")

  test("lmTrain: bigram logp = ln(c2 / c1), c1 = bigrams starting at w1") {
    val (bt, _) = TextAnalysis.lmTrain(refCorpus, "text")
    val m = bt.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // bigrams: "a b"×3 ("a b a b c" has two, "a b" one), "b a"×1, "b c"×1
    // c1: a→3, b→2
    assert(m === Map(
      "a b" -> math.log(3.0 / 3.0),
      "b a" -> math.log(1.0 / 2.0),
      "b c" -> math.log(1.0 / 2.0)))
  }

  test("lmTrain: unigram logp = ln(c / N) over reference tokens") {
    val (_, ut) = TextAnalysis.lmTrain(refCorpus, "text")
    val m = ut.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // tokens: a×3, b×3, c×1; N = 7
    assert(m === Map(
      "a" -> math.log(3.0 / 7.0),
      "b" -> math.log(3.0 / 7.0),
      "c" -> math.log(1.0 / 7.0)))
  }

  test("lmTrain: minCount prunes the bigram table, not the unigram backoff") {
    val (bt, ut) = TextAnalysis.lmTrain(refCorpus, "text", minCount = 2)
    assert(bt.collect().map(_.getString(0)).toSeq === Seq("a b"))
    assert(ut.count() === 3L)
  }

  test("lmTrain → lmScore: held-out doc scores hit / backoff / OOV legs") {
    val (bt, ut) = TextAnalysis.lmTrain(refCorpus, "text")
    val scored = TextAnalysis.lmScore(
      Seq((9L, "a b z")).toDF("id", "text"), "id", "text", bt, ut,
      oovLogp = -10.0, backoffLogp = math.log(0.4))
    val r = scored.collect()(0)
    // "a b" → bigram hit ln(1)=0; "b z" → z unseen anywhere → OOV -10
    assert(r.getLong(1) === 2L && r.getLong(2) === 1L)
    assert(r.getDouble(3) === (0.0 + -10.0) / 2)
  }

  test("lmTrain → lmScore: unseen bigram of seen words takes the backoff leg") {
    val (bt, ut) = TextAnalysis.lmTrain(refCorpus, "text")
    val scored = TextAnalysis.lmScore(
      Seq((9L, "c a")).toDF("id", "text"), "id", "text", bt, ut,
      oovLogp = -10.0, backoffLogp = math.log(0.4))
    val r = scored.collect()(0)
    // "c a": no bigram row; w2 = a seen → ln(3/7) rounded + ln(0.4) rounded
    assert(r.getLong(2) === 0L)
    assert(r.getDouble(3) === round6(math.log(3.0 / 7.0)) + round6(math.log(0.4)))
  }

  // --- nbTrain ---------------------------------------------------------------

  private def seed = Seq(
    ("good good nice", true), ("bad bad", false), ("good bad", true)
  ).toDF("text", "y")

  test("nbTrain: add-1 log-likelihood-ratio weights and log-prior bias") {
    val (wts, bias) = TextAnalysis.nbTrain(seed, "text", "y")
    val m = wts.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // c1: good 3, nice 1, bad 1; c0: bad 2; N1 = 5, N0 = 2, V = 3
    def w(c1: Long, c0: Long) =
      math.log((c1 + 1.0) / (5 + 3)) - math.log((c0 + 1.0) / (2 + 3))
    assert(m === Map("good" -> w(3, 0), "nice" -> w(1, 0), "bad" -> w(1, 2)))
    assert(bias === math.log(2.0 / 1.0))
  }

  test("nbTrain rejects a single-class seed") {
    val oneClass = Seq(("good", true), ("nice", true)).toDF("text", "y")
    assertThrows[IllegalArgumentException] {
      TextAnalysis.nbTrain(oneClass, "text", "y")
    }
  }

  test("nbTrain → linearScore: mean-pooled NB log-odds, OOV contributes 0") {
    val (wts, bias) = TextAnalysis.nbTrain(seed, "text", "y")
    val m = wts.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val scored = TextAnalysis.linearScore(
      Seq((1L, "good nice zzz")).toDF("id", "text"), "id", "text", wts, bias = bias)
    val r = scored.collect()(0)
    assert(r.getLong(1) === 3L && r.getLong(2) === 2L)
    assert(r.getDouble(3) === bias + (round6(m("good")) + round6(m("nice"))) / 3.0)
  }

  test("nbTrain → linearScore separates the classes on the seed itself") {
    val (wts, bias) = TextAnalysis.nbTrain(seed, "text", "y")
    val docs = Seq((1L, "good good nice"), (2L, "bad bad")).toDF("id", "text")
    val s = TextAnalysis.linearScore(docs, "id", "text", wts, bias = bias)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s(1L) > 0.0 && s(2L) < s(1L))
  }
}
