package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def strings(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix-$i")

  test("no false negatives: every built item passes mightContain") {
    val members = strings("in", 2000)
    val bloom = Bloom.build(members.toDF("s"), col("s"), Bloom.sizeFor(2000))
    val missed = members.toDF("s")
      .filter(!bloom.mightContain(col("s"))).count()
    assert(missed === 0L)
  }

  test("false-positive rate on a disjoint set stays near the design point") {
    val bloom = Bloom.build(strings("in", 2000).toDF("s"), col("s"),
      Bloom.sizeFor(2000))
    // 16 bits/item, 5 hashes -> fpp ~ 1e-3; assert an order of magnitude of
    // slack so the bound is hash-realization-robust, while still failing on
    // any structural bug (a dead hash lane or a short bit array reads ~1)
    val fp = strings("out", 20000).toDF("s")
      .filter(bloom.mightContain(col("s"))).count()
    assert(fp < 200, s"false-positive count $fp / 20000 is far above design fpp")
  }

  test("empty build side -> constant-false membership; tiny numBits rejected") {
    val empty = spark.emptyDataset[String].toDF("s")
    val bloom = Bloom.build(empty, col("s"), 1 << 14)
    assert(bloom.bits.forall(_ == 0L))
    assert(strings("x", 100).toDF("s").filter(bloom.mightContain(col("s"))).count() === 0L)
    assertThrows[IllegalArgumentException](Bloom.build(empty, col("s"), 32))
  }

  test("contamination with a bloom trainPrefilter returns exactly the unfiltered result") {
    // 40 train docs: 3 share >=3 5-grams with an eval doc (verbatim copies
    // with small edits), the rest are disjoint; plus one bloom-stressing
    // near-member family so false positives are plausibly exercised
    val evalDocs = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1001L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val train = ((0 until 37).map(i =>
      (i.toLong, s"filler$i words that never overlap eval suite number $i pad pad")) ++ Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  // verbatim
      (101L, "alpha beta gamma delta epsilon zeta eta theta X kappa"),     // 1 edit
      (102L, "one two three four five six seven eight nine ten")           // verbatim
    )).toDF("doc_id", "text")

    val shE = Dedup.shingleIndex(evalDocs, "doc_id", "text", n = 5)
      .select(col("shingle")).distinct()
    val bloom = Bloom.build(shE, col("shingle"), Bloom.sizeFor(shE.count()))

    def rows(pre: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column]) =
      Dedup.contamination(train, evalDocs, "doc_id", "text", n = 5,
          minShared = 3, maxDf = Int.MaxValue, trainPrefilter = pre)
        .orderBy("train_id", "eval_id")
        .as[(Long, Long, Long, Double)].collect().toSeq

    val plain = rows(None)
    val bloomed = rows(Some(bloom.mightContain))
    assert(plain.nonEmpty && plain.map(_._1).toSet === Set(100L, 101L, 102L))
    assert(bloomed === plain)
  }
}
