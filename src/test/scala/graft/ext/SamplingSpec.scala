package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // strata sized in exact powers of 4 so the alpha=0.5 keep fractions are
  // exact: f = (c/c_min)^-0.5 in {1/4, 1/2, 1} -> k in {64, 128, 256}
  private lazy val corpus = {
    val rows =
      (1L to 1600L).map(i => (i, "big")) ++
      (10001L to 10400L).map(i => (i, "mid")) ++
      (20001L to 20100L).map(i => (i, "rare"))
    rows.toDF("id", "lang")
  }

  test("keep thresholds quantize to k/256 and the rarest stratum keeps all") {
    val kept = Sampling.temperatureMix(corpus, "id", "lang", alpha = 0.5)
      .select("id", "lang").as[(Long, String)].collect().toSet
    val bucketOf = corpus
      .select(col("id"), Similarity.sampleBucket(col("id")).as("b"), col("lang"))
      .as[(Long, Int, String)].collect()
    val k = Map("big" -> 64, "mid" -> 128, "rare" -> 256)
    val expected = bucketOf.collect { case (id, b, g) if b < k(g) => (id, g) }.toSet
    assert(kept === expected)
    // rare stratum is never downsampled
    assert(kept.count(_._2 == "rare") === 100)
    // and the big stratum actually shed rows toward c^alpha
    assert(kept.count(_._2 == "big") < 1600)
  }

  test("alpha = 1 keeps every row") {
    assert(Sampling.temperatureMix(corpus, "id", "lang", alpha = 1.0).count() === 2100)
  }

  test("recipe join is a broadcast, filter rides the scan") {
    val plan = Sampling.temperatureMix(corpus, "id", "lang", alpha = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast recipe join in:\n$plan")
  }

  test("invalid alpha is rejected") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(corpus, "id", "lang", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(corpus, "id", "lang", alpha = 1.5)
    }
  }

  test("shardShuffle: positions dense per shard, order a pure function of (seed, id)") {
    val df = (1L to 500L).toDF("id")
    val out = Sampling.shardShuffle(df, "id", nShards = 4, seed = "s1")
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(out.length === 500)
    assert(out.map(_._2).toSet.subsetOf((0 until 4).toSet))
    // dense 1..n positions within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // same seed replays the identical permutation regardless of partitioning
    val re = Sampling.shardShuffle(df.repartition(13), "id", nShards = 4, seed = "s1")
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(re.toSet === out.toSet)
    // a different seed is a genuinely different permutation
    val other = Sampling.shardShuffle(df, "id", nShards = 4, seed = "s2")
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(other.toSet !== out.toSet)
  }

  test("shardShuffle: md5 key balances shards even on clustered ids") {
    // sequential ids (worst case for naive range-sharding) still spread
    val sizes = Sampling.shardShuffle((1L to 4000L).toDF("id"), "id", 8, "s")
      .groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(sizes.size === 8)
    assert(sizes.values.min > 300 && sizes.values.max < 700, s"skewed: $sizes")
  }

  test("shardShuffle rejects out-of-range shard counts") {
    intercept[IllegalArgumentException] {
      Sampling.shardShuffle(corpus, "id", nShards = 0, seed = "s")
    }
    intercept[IllegalArgumentException] {
      Sampling.shardShuffle(corpus, "id", nShards = 70000, seed = "s")
    }
  }
}
