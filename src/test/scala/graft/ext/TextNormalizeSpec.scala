package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NormalizeText
import org.apache.spark.unsafe.types.UTF8String

class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def viaSpark(s: String): String =
    Seq(s).toDF("t").select(NormalizeText.normalizeText(col("t")).as("n"))
      .head().getString(0)

  test("NFC composes combining marks") {
    // 'e' + COMBINING ACUTE must become precomposed U+00E9 - otherwise
    // dedup treats visually identical documents as distinct
    assert(viaSpark("He\u0301llo") === "H\u00E9llo")
    // already-composed input is untouched
    assert(viaSpark("H\u00E9llo") === "H\u00E9llo")
  }

  test("strips controls and zero-widths, collapses Unicode whitespace") {
    assert(viaSpark("a\u0001b\u007Fc  c") === "abc c")
    assert(viaSpark("x\u200By \u202Fz") === "xy z")
    assert(viaSpark("p\u00A0q\u3000r   ") === "p q r")
    assert(viaSpark("  He\u0301llo\t\tWorld  ") === "H\u00E9llo World")
    assert(viaSpark("\u200B a") === "a")
    assert(viaSpark(" \t \n ") === "")
    assert(viaSpark("") === "")
  }

  test("clean ASCII rides the zero-copy fast path") {
    val s = UTF8String.fromString("clean ascii text, one space each.")
    // reference equality: the fast path must return the input buffer itself
    assert(NormalizeText.compute(s) eq s)
    // near-misses fall off the fast path but still normalize correctly
    assert(viaSpark("trailing ") === "trailing")
    assert(viaSpark(" leading") === "leading")
    assert(viaSpark("dou  ble") === "dou ble")
  }

  test("supplementary characters (surrogate pairs) survive intact") {
    // U+1F600 and U+2A6A5 as explicit surrogate pairs
    val s = "emoji \uD83D\uDE00 and CJK-ext \uD869\uDEA5 kept"
    assert(viaSpark(s) === s)
  }

  test("normalize_text stays inside whole-stage codegen") {
    // a real file scan — a local relation gets constant-folded away
    val df = graft.Td(spark, "/root/testdata/sf0.001", "documents")
      .select(NormalizeText.normalizeText(col("text")).as("n"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined, p)
  }

  test("null in, null out") {
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(NormalizeText.normalizeText(col("t")).as("n")).head()
    assert(r.isNullAt(0))
  }
}
