package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  // scores engineered so range partitions must split mid-score-run and the
  // cross-partition offset recomposition is what's actually under test
  private lazy val df = (1L to 1000L).map(i => (i, (i * 37 % 101).toDouble))
    .toDF("id", "score")

  test("rank is the exact global total order across range partitions") {
    val out = Ranking.globalRankTiles(df, "score", "id", tiles = 4)
      .select("id", "score", "rank").as[(Long, Double, Long)].collect()
    val expected = out.map(r => (r._2, r._1)).sortBy(identity).map(_._2)
    val byRank = out.sortBy(_._3).map(_._1)
    assert(byRank.toSeq === expected.toSeq)
    assert(out.map(_._3).sorted.toSeq === (1L to 1000L).toSeq) // dense 1..N
  }

  test("tiers are equal-count quantile buckets aligned with rank") {
    val out = Ranking.globalRankTiles(df, "score", "id", tiles = 4)
      .select("rank", "tier").as[(Long, Int)].collect()
    out.foreach { case (rank, tier) => assert(tier === ((rank - 1) * 4 / 1000).toInt) }
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes === Map(0 -> 250, 1 -> 250, 2 -> 250, 3 -> 250))
  }

  test("descending mode ranks the highest score first") {
    val out = Ranking.globalRankTiles(df, "score", "id", tiles = 2, ascending = false)
      .select("id", "score", "rank").as[(Long, Double, Long)].collect()
    val top = out.minBy(_._3)
    assert(top._2 === out.map(_._2).max)
  }

  test("the ranked data is never collapsed to one partition") {
    val ranked = Ranking.globalRankTiles(df, "score", "id", tiles = 4)
    // the big-side exchange is a range partitioning, not SinglePartition
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected range exchange in:\n$plan")
  }

  test("salted top-k per group equals the direct window, ties broken by id") {
    // one hot group (700 rows) + small groups, scores with heavy ties
    val rows = (1L to 700L).map(i => (i, "hot", (i % 7).toDouble)) ++
      (701L to 720L).map(i => (i, "small", (i % 5).toDouble)) ++
      Seq((721L, "single", 1.0))
    val data = rows.toDF("id", "grp", "score")
    val got = Ranking.topKPerGroup(data, "grp", "score", "id", k = 5)
      .select("grp", "id", "grp_rank").as[(String, Long, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val direct = data.withColumn("grp_rank",
        row_number().over(Window.partitionBy(col("grp"))
          .orderBy(col("score").desc, col("id").asc)).cast("long"))
      .filter(col("grp_rank") <= 5)
      .select("grp", "id", "grp_rank").as[(String, Long, Long)].collect().toSet
    assert(got === direct)
    assert(got.count(_._1 == "hot") === 5)
    assert(got.count(_._1 == "single") === 1) // groups smaller than k kept whole
  }

  test("salted top-k with one salt bucket degenerates to the direct window") {
    val data = (1L to 50L).map(i => (i, "g", i.toDouble)).toDF("id", "grp", "score")
    val got = Ranking.topKPerGroup(data, "grp", "score", "id", k = 3, saltBuckets = 1)
      .select("id").as[Long].collect().toSet
    assert(got === Set(50L, 49L, 48L))
  }

  test("rrfFuse: 1/(k+rank) per list, absent lists contribute zero, ties to lower id") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rnk")
    val dense = Seq((20L, 1), (40L, 2)).toDF("id", "rnk")
    val out = Ranking.rrfFuse(Seq(lex, dense), "id", k = 60, topK = 10)
      .select("id", "rrf", "rnk").as[(Long, Double, Int)].collect().sortBy(_._3)
    // doc 20 appears in both lists -> highest fused score
    assert(out.head._1 === 20L)
    assert(math.abs(out.head._2 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    // doc in only one list gets exactly its single reciprocal
    val d10 = out.find(_._1 == 10L).get
    assert(math.abs(d10._2 - 1.0 / 61) < 1e-15)
    // equal fused scores (rank 2 lex vs rank 2 dense would tie) break by id:
    // docs 30 (lex rank 3) and 40 (dense rank 2) -> 40 scores higher; then 30
    assert(out.map(_._1).toSeq === Seq(20L, 10L, 40L, 30L))
  }
}
