package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.QuantizeI8

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def one(v: Seq[Double]): (Double, Seq[Int]) = {
    val r = Seq(Tuple1(v)).toDF("v").select(
      QuantizeI8.scale(col("v")).as("s"),
      QuantizeI8.quantize(col("v")).as("q")).head()
    (r.getDouble(0), r.getSeq[Int](1))
  }

  test("max element maps to ±127, zero to 0, signs preserved") {
    val (s, q) = one(Seq(2.0, -2.0, 0.0, 1.0))
    assert(s === 2.0 / 127.0)
    assert(q === Seq(127, -127, 0, 64)) // 1.0/s = 63.5 -> floor(64.0) = 64
  }

  test("all-zero vector quantizes to zeros with scale 0, no division") {
    val (s, q) = one(Seq(0.0, 0.0, 0.0))
    assert(s === 0.0)
    assert(q === Seq(0, 0, 0))
  }

  test("reconstruction error is bounded by half a step") {
    val v = Seq(0.93, -0.41, 0.07, 0.555, -0.999)
    val (s, q) = one(v)
    v.zip(q).foreach { case (x, qi) =>
      assert(math.abs(x - qi * s) <= s / 2 + 1e-12, s"x=$x q=$qi s=$s")
    }
  }

  test("quantized kNN matches a driver-side recomputation of the ranking") {
    val emb = graft.Td(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Similarity.knnQuantized(emb.filter(col("vec_id") === 0), emb,
        "vec_id", "embedding", k = 10)
      .select("neighbor_id", "rnk").as[(Long, Int)].collect()
      .sortBy(_._2).map(_._1)
    // recompute the same quantized inner products on the driver
    val vecs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def q(v: Seq[Double]): (Double, Seq[Int]) = {
      val s = v.map(math.abs).max / 127.0
      (s, if (s == 0) v.map(_ => 0) else v.map(x => math.floor(x / s + 0.5).toInt))
    }
    val (s0, q0) = q(vecs(0L))
    val expect = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val (sc, qc) = q(v)
      val ip = q0.zip(qc).map { case (a, b) => (a * b).toDouble }.sum * s0 * sc
      (id, ip)
    }.sortBy { case (id, ip) => (-ip, id) }.take(10).map(_._1)
    assert(got.toSeq === expect)
  }

  test("quantization rides whole-stage codegen over a file scan") {
    val df = graft.Td(spark, "/root/testdata/sf0.001", "embeddings")
      .select(QuantizeI8.quantize(col("embedding").cast("array<double>")).as("q"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined, p)
  }
}
