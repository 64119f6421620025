package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.ext.{TextAnalysis => TA}

/** Gopher-style composite filter (T11): each rule individually decidable,
  * conjunction at the published thresholds.
  */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  // 60 natural-ish words incl. several required stopwords — passes all rules
  private val cleanText =
    (("the quick brown fox jumps over and over to the side of that lazy dog " +
      "it would have stayed asleep with the sun warm on its back every day") * 2).trim

  private def rulesOf(text: String) = {
    val t = col("text")
    Seq(("x", text)).toDF("id", "text")
      .select(
        TA.tokenCount(t).as("n_words"),
        TA.meanTokenLen(t).as("mean_len"),
        TA.symbolWordRatio(t).as("symbol"),
        TA.bulletLineFrac(t).as("bullet"),
        TA.ellipsisLineFrac(t).as("ellipsis"),
        TA.alphaWordFrac(t).as("alpha"),
        TA.requiredStopCount(t).as("n_stop"),
        TA.gopherKeep(t).as("keep"))
      .as[(Int, Double, Double, Double, Double, Double, Int, Boolean)]
      .head()
  }

  test("a clean long document passes every rule") {
    val r = rulesOf(cleanText)
    assert(r._1 >= 50 && r._2 >= 3.0 && r._2 <= 10.0)
    assert(r._3 == 0.0 && r._4 == 0.0 && r._5 == 0.0)
    assert(r._6 == 1.0 && r._7 >= 2)
    assert(r._8, s"expected keep, got $r")
  }

  test("each rule fails in isolation on targeted dirt") {
    // word count below the floor
    assert(!rulesOf("the dog and that cat have fun with it")._8)
    // bullet lines >= 90%
    val bullets = cleanText + "\n" + Seq.fill(12)("- item").mkString("\n")
    val rb = rulesOf(bullets)
    assert(rb._4 >= 0.9 && !rb._8)
    // ellipsis line fraction >= 30%
    val dots = cleanText + "\nwait for it...\nand more…"
    val rd = rulesOf(dots)
    assert(rd._5 >= 0.3 && !rd._8)
    // symbol-to-word ratio >= 10%
    val hash = cleanText + " " + Seq.fill(14)("#").mkString(" ")
    val rh = rulesOf(hash)
    assert(rh._3 >= 0.1 && !rh._8)
    // alphabetic-word fraction <= 80%
    val nums = cleanText + Seq.fill(40)(" 12345").mkString
    val rn = rulesOf(nums)
    assert(rn._6 <= 0.8 && !rn._8)
    // mean word length < 3
    val shorts = cleanText + Seq.fill(200)(" q").mkString
    val rs = rulesOf(shorts)
    assert(rs._2 < 3.0 && !rs._8)
    // no required stopwords (counts distinct PRESENCE, not occurrences)
    val salad = Seq.fill(60)("lorem ipsum dolor").mkString(" ")
    val rp = rulesOf(salad)
    assert(rp._7 === 0 && !rp._8)
  }

  test("required stopwords count distinct membership with case folding") {
    val two = Seq.fill(25)("The dog runs TO town").mkString(" ")
    assert(rulesOf(two)._7 === 2) // "the" and "to", each many times -> 2
  }
}
