package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CharShingles => CS}

/** Direct specs for the native CharShingles expression: equivalence with
  * the lambda-chain formulation it replaced (the exact expression
  * Dedup.charShingleIndex used before going native), multi-byte
  * correctness, edge cases, codegen vs interpreted parity.
  */
class CharShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def lambdaShingles(text: org.apache.spark.sql.Column, q: Int) =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - (q - 1), lit(1))),
        i => text.substr(i, lit(q))))

  test("same shingle arrays as the lambda-chain formulation on varied inputs") {
    val docs = Seq(
      "abcdef",          // longer than q
      "abcd",            // exactly q
      "ab",              // shorter than q → whole-text fallback
      "",                // empty → one "" shingle
      "aaaaaaa",         // repeats collapse under distinct
      "héllo wörld déjà" // multi-byte: char slicing, not byte slicing
    ).toDF("text")
    val rows = docs.select(
      CS.shingles(col("text"), 4).as("native"),
      lambdaShingles(col("text"), 4).as("lambda")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1),
        s"mismatch for native=${r.getSeq[String](0)} lambda=${r.getSeq[String](1)}")
    }
  }

  test("null text yields null (word-shingle contract), NOT the lambda form's [null]") {
    // deliberate divergence: Spark's greatest() skips nulls, so the lambda
    // chain yields [null] on null text — one junk null-shingle row after
    // explode that inflates the doc's set size. The native expression is
    // null-in-null-out like its WordShingles sibling (null text → no
    // shingle rows), which is the contract every consumer wants.
    val df = Seq(Some("abcde"), None).toDF("text")
    val rows = df.select(
      CS.shingles(col("text"), 3).as("native"),
      lambdaShingles(col("text"), 3).as("lambda")).collect()
    assert(rows(1).isNullAt(0), "native must be null for null text")
    assert(!rows(1).isNullAt(1) && rows(1).getSeq[String](1) === Seq(null),
      "positive control: the lambda form yields [null], the junk this expression fixes")
    assert(rows(0).getSeq[String](0) === rows(0).getSeq[String](1))
  }

  test("multi-byte slices are codepoint-exact") {
    // 6 chars, 12 UTF-8 bytes — byte slicing would split codepoints
    val out = Seq("ααββγγ").toDF("text")
      .select(CS.shingles(col("text"), 3).as("sh"))
      .head().getSeq[String](0)
    assert(out.toSeq === Seq("ααβ", "αββ", "ββγ", "βγγ"))
  }

  test("interpreted eval matches codegen result") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val direct = CS.compute(UTF8String.fromString("abcde"), 3)
      .asInstanceOf[ArrayData]
      .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
    assert(direct.toSeq === Seq("abc", "bcd", "cde"))
    // through a DataFrame (whole-stage codegen path)
    val viaDf = Seq("abcde").toDF("text")
      .select(CS.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(viaDf.toSeq === direct.toSeq)
    // non-ASCII exercises the offset-table path under codegen too
    val multi = CS.compute(UTF8String.fromString("ααββ"), 2)
      .asInstanceOf[ArrayData]
      .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
    assert(multi.toSeq === Seq("αα", "αβ", "ββ"))
  }
}
