package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.ext.{TextAnalysis => TA}

class ScriptDetectSpec extends SparkSpec {
  import spark.implicits._

  private def detect(s: String): (Long, Long, Long, Long, String) = {
    val r = Seq(s).toDF("t").select(
      TA.scriptCount(col("t"), "\\p{IsLatin}").as("l"),
      TA.scriptCount(col("t"), "\\p{IsCyrillic}").as("c"),
      TA.scriptCount(col("t"), "\\p{IsHan}").as("h"),
      TA.scriptCount(col("t"), "\\p{IsArabic}").as("a"),
      TA.dominantScript(col("t")).as("s")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("counts chars per script; digits/punct/space never vote") {
    // "abc 123! \u0416\u0438 \u4E2D" - 3 latin, 2 cyrillic, 1 han
    val (l, c, h, a, s) = detect("abc 123! \u0416\u0438 \u4E2D")
    assert((l, c, h, a) === ((3L, 2L, 1L, 0L)))
    assert(s === "latin")
  }

  test("dominance follows the max count; ties break in Scripts order") {
    assert(detect("\u4E2D\u6587\u6D4B ok")._5 === "han") // 3 han vs 2 latin
    assert(detect("\u0627\u0644\u0639\u0631")._5 === "arabic")
    // exact tie latin/cyrillic -> latin (listed first)
    assert(detect("ab \u0416\u0438")._5 === "latin")
  }

  test("no script chars at all -> none") {
    assert(detect("123 !?  ")._5 === "none")
    assert(detect("")._5 === "none")
  }
}
