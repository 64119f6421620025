package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val words = {
    // skewed corpus: "hot" 50×, "warm" 10×, 200 singletons
    val occ = Seq.fill(50)("hot") ++ Seq.fill(10)("warm") ++
      (0 until 200).map(i => s"rare$i")
    occ.toDF("term")
  }

  test("estimates never underestimate, and are exact for every key when w is large") {
    val exact = words.groupBy("term").agg(count(lit(1)).as("n_exact"))
    // w = 65536: 202 keys over 4 rows — collisions essentially impossible
    val cms = CountMin.build(words, "term", d = 4, w = 65536)
    val est = CountMin.lookup(cms, exact, "term", d = 4, w = 65536)
    assert(est.filter(col("n_est") < col("n_exact")).isEmpty, "CM must never underestimate")
    assert(est.filter(col("n_est") =!= col("n_exact")).isEmpty,
      "collision-free sketch must be exact")
  }

  test("tiny sketch still upper-bounds under heavy collision pressure") {
    val exact = words.groupBy("term").agg(count(lit(1)).as("n_exact"))
    val cms = CountMin.build(words, "term", d = 2, w = 8) // forced collisions
    val est = CountMin.lookup(cms, exact, "term", d = 2, w = 8)
    assert(est.filter(col("n_est") < col("n_exact")).isEmpty)
    // the hot key stays detectable: its estimate dominates the singletons'
    val hot = est.filter(col("term") === "hot").head().getAs[Long]("n_est")
    assert(hot >= 50L)
  }

  test("sketch size is d x w rows at most, independent of corpus size") {
    val cms = CountMin.build(words, "term", d = 4, w = 32)
    assert(cms.count() <= 4L * 32)
    val bigger = words.union(words).union(words)
    assert(CountMin.build(bigger, "term", d = 4, w = 32).count() <= 4L * 32)
  }

  test("probe columns named row/bucket/cnt pass through untouched") {
    val exact = words.groupBy("term").agg(count(lit(1)).as("cnt"))
      .withColumn("row", lit(7)).withColumn("bucket", lit(9))
    val cms = CountMin.build(words, "term", d = 4, w = 65536)
    val est = CountMin.lookup(cms, exact, "term", d = 4, w = 65536)
    assert(est.filter(col("n_est") =!= col("cnt")).isEmpty) // still exact per key
    assert(est.filter(col("row") =!= 7 || col("bucket") =!= 9).isEmpty)
    assert(est.count() === 202) // one output row per probe, not d
  }

  test("sketches merge by counter addition (shard-and-add == build-on-union)") {
    val shard1 = words.limit(100)
    val shard2 = words.exceptAll(shard1)
    val merged = CountMin.merge(
      CountMin.build(shard1, "term", 4, 256),
      CountMin.build(shard2, "term", 4, 256))
    val direct = CountMin.build(words, "term", 4, 256)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
    // and merged sketches answer lookups like the direct build
    val probes = words.select("term").distinct()
    val viaMerged = CountMin.lookup(merged, probes, "term", 4, 256)
    val viaDirect = CountMin.lookup(direct, probes, "term", 4, 256)
    assert(viaMerged.exceptAll(viaDirect).isEmpty && viaDirect.exceptAll(viaMerged).isEmpty)
  }
}
