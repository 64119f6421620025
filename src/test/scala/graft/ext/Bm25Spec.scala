package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], terms: Seq[String]) =
    Bm25.score(docs.toDF("doc_id", "text"), "doc_id", "text", terms, topK = 10)
      .select("doc_id", "score", "rnk").as[(Long, Double, Int)]
      .collect().sortBy(_._3)

  test("higher term frequency outranks lower at equal length") {
    val out = run(Seq(
      (1L, "cat cat cat dog bird fish"),
      (2L, "cat dog bird fish mouse wolf"),
      (3L, "dog bird fish mouse wolf bear")), Seq("cat"))
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // doc 3 has no match at all
    assert(out(0)._2 > out(1)._2)
  }

  test("length normalization: same tf in a longer document scores lower") {
    val out = run(Seq(
      (1L, "cat dog"),
      (2L, "cat dog bird fish mouse wolf bear lion tiger otter")), Seq("cat"))
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
  }

  test("rational idf: a rarer term outweighs a common one at equal tf") {
    val docs = Seq(
      (1L, "rare filler filler"),
      (2L, "common filler filler"),
      (3L, "common filler filler"),
      (4L, "common filler filler"))
    val out = run(docs, Seq("rare", "common"))
    assert(out.head._1 === 1L, s"rare-term doc should rank first: ${out.toSeq}")
  }

  test("duplicate or empty query vocab rejected") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Bm25.score(df, "doc_id", "text", Nil) }
    intercept[IllegalArgumentException] { Bm25.score(df, "doc_id", "text", Seq("a", "a")) }
  }
}
