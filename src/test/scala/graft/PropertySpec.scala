package graft

import graft.clean.Dates
import graft.tables.Upsert
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5 item 4): upsert algebra, rollup
  * conservation, date-parser totality. Raw ScalaCheck generators with a
  * fixed seed drive small frames through the real distributed operators
  * (the scalatest-scalacheck bridge isn't in the offline cache — sampling
  * is done manually, deterministically).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowGen: Gen[(Int, Double)] = for {
    k <- Gen.choose(0, 20)
    v <- Gen.choose(-1000.0, 1000.0)
  } yield (k, v)

  private val tableGen: Gen[List[(Int, Double)]] = for {
    n <- Gen.choose(0, 25)
    rows <- Gen.listOfN(n, rowGen)
  } yield rows.distinctBy(_._1) // unique merge keys per side

  test("upsert is idempotent: merge(merge(T,S),S) == merge(T,S)") {
    samples(Gen.zip(tableGen, tableGen), 8).foreach { case (t, s) =>
      val target = t.toDF("k", "v")
      val source = s.toDF("k", "v")
      val once = Upsert.merge(target, source, Seq("k"))
      val twice = Upsert.merge(once, source, Seq("k"))
      assert(once.orderBy("k").collect().toSeq === twice.orderBy("k").collect().toSeq,
        s"t=$t s=$s")
    }
  }

  test("upsert covers exactly target-keys ∪ source-keys; source wins on overlap") {
    samples(Gen.zip(tableGen, tableGen), 8).foreach { case (t, s) =>
      val merged = Upsert.merge(t.toDF("k", "v"), s.toDF("k", "v"), Seq("k"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val expected = t.toMap ++ s.toMap
      assert(merged === expected, s"t=$t s=$s")
    }
  }

  test("monthly rollup conserves the total of parsed-date rows") {
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 365), Gen.choose(1.0, 50.0)))
    samples(rowsGen, 6).foreach { rows =>
      val df = rows.toDF("day", "qty")
        .withColumn("date", date_add(lit("2025-01-01").cast("date"), col("day")))
      val daily = df.agg(sum(col("qty"))).head().getDouble(0)
      val monthly = df.groupBy(Dates.monthStart(col("date")))
        .agg(sum(col("qty")).as("q"))
        .agg(sum(col("q"))).head().getDouble(0)
      assert(math.abs(daily - monthly) < 1e-6, s"rows=$rows")
    }
  }

  test("order-date parser is total: any string yields date or null, never throws") {
    val strGen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf("12-11-2025", "31/02/2025", "2025/13/40", "Monday, Foo 99, 2025",
        "", "   ", "1/1/1", "9999-99-99", "Saturday, January 3, 2026"),
      Gen.listOfN(8, Gen.oneOf('0' to '9')).map(_.mkString("-")))
    val all = samples(strGen, 40)
    val out = all.toDF("d").select(Dates.parseOrderDate(col("d"))).collect()
    assert(out.length === all.length) // no exception; each value is Date or null
    // and the four supported formats round-trip correctly
    val good = Seq("12-11-2025", "12/11/2025", "2025/11/12", "Wednesday, November 12, 2025")
      .toDF("d").select(Dates.parseOrderDate(col("d")).cast("string")).collect()
    assert(good.forall(_.getString(0) === "2025-11-12"))
  }
}
