package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{WordShingles => WS}

/** Direct specs for the native WordShingles expression: equivalence with
  * the lambda-chain formulation it replaced, edge cases, codegen vs
  * interpreted parity.
  */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def lambdaShingles(toksCol: org.apache.spark.sql.Column, n: Int) = {
    val toks = toksCol
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }

  test("same shingle sets as the lambda-chain formulation on varied inputs") {
    val docs = Seq(
      "a b c d e", "a b c", "a b", "x", "a a a a", "one two three four five six"
    ).toDF("text")
    val toks = split(trim(col("text")), "\\s+")
    val rows = docs.select(
      sort_array(WS.shingles(toks, 3)).as("native"),
      sort_array(lambdaShingles(toks, 3)).as("lambda")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("distinct semantics: repeated n-grams collapse") {
    val out = Seq("a b a b a b").toDF("text")
      .select(WS.shingles(split(col("text"), " "), 2).as("sh"))
      .head().getSeq[String](0)
    assert(out.toSet === Set("a b", "b a"))
  }

  test("non-distinct mode keeps multiplicity in positional order") {
    val out = Seq("a b a b a b").toDF("text")
      .select(WS.shinglesAll(split(col("text"), " "), 2).as("sh"))
      .head().getSeq[String](0)
    assert(out.toSeq === Seq("a b", "b a", "a b", "b a", "a b"))
    // equivalent lambda form (non-distinct) on a generic sentence
    val df = Seq("one two three two three").toDF("text")
    val toks = split(col("text"), " ")
    val native = df.select(WS.shinglesAll(toks, 2)).head().getSeq[String](0)
    val lambda = df.select(transform(sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))).head().getSeq[String](0)
    assert(native.toSeq === lambda.toSeq)
  }

  test("interpreted eval matches codegen result") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val toks = new GenericArrayData(
      Array("w1", "w2", "w3", "w4").map(s => UTF8String.fromString(s): Any))
    val direct = WS.compute(toks, 3).asInstanceOf[ArrayData]
      .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
    assert(direct.toSeq === Seq("w1 w2 w3", "w2 w3 w4"))
    // through a DataFrame (whole-stage codegen path)
    val viaDf = Seq("w1 w2 w3 w4").toDF("text")
      .select(WS.shingles(split(col("text"), " "), 3)).head().getSeq[String](0)
    assert(viaDf.toSeq === direct.toSeq)
  }
}
