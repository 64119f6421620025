package graft.clean

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleanSpec extends SparkSpec {
  import spark.implicits._

  test("cleanName trims + title-cases, null-guarded (F1/F2)") {
    val got = Seq(Some("  sprintX nutrition "), Some("CHAMPION'S CHOICE"), None)
      .toDF("n").select(Normalize.cleanName(col("n"))).as[Option[String]].collect().toSeq
    assert(got === Seq(Some("Sprintx Nutrition"), Some("Champion's Choice"), None))
  }

  test("fixSpelling is case-insensitive (F3: Protien→Protein)") {
    val got = Seq("Whey PROTIEN bar", "protien shake").toDF("n")
      .select(Normalize.fixSpelling(col("n"), "protien", "Protein")).as[String].collect().toSeq
    assert(got === Seq("Whey Protein bar", "Protein shake"))
  }

  test("normalizeViaMap: valid pass, fixes map, unknown→null (F8/F9 city fix)") {
    val fixes = Map("Austn" -> "Austin", "Newyork" -> "New York", "Chicagoo" -> "Chicago")
    val got = Seq("Austin", "Austn", "Newyork", "Gotham").toDF("c")
      .select(Normalize.normalizeViaMap(col("c"), Seq("Austin", "New York", "Chicago"), fixes))
      .as[Option[String]].collect().toSeq
    assert(got === Seq(Some("Austin"), Some("Austin"), Some("New York"), None))
  }

  test("numericIdOrFallback: noise ids → 999999 (F9)") {
    val got = Seq("789403", "ABC987", "XYZ123", "INVALID").toDF("id")
      .select(Normalize.numericIdOrFallback(col("id"))).as[String].collect().toSeq
    assert(got === Seq("789403", "999999", "999999", "999999"))
  }

  test("sanitizePrice: non-numeric→0, negative→abs (F5/F9/F17)") {
    val got = Seq("12.5", "-8.4", "unknown", "not_available", "0")
      .toDF("p").select(Normalize.sanitizePrice(col("p"))).as[Double].collect().toSeq
    assert(got === Seq(12.5, 8.4, 0.0, 0.0, 0.0))
  }

  test("labelWithFallback: name-city, Unknown when city null (F7)") {
    val got = Seq(("HydroBoost", Some("Austin")), ("SprintX", None))
      .toDF("n", "c").select(Normalize.labelWithFallback(col("n"), col("c")))
      .as[String].collect().toSeq
    assert(got === Seq("HydroBoost-Austin", "SprintX-Unknown"))
  }

  test("parseOrderDate: 4 formats parse, single-digit-day long form → null (F11)") {
    val got = Seq(
      "01-12-2025", "01/12/2025", "2025/12/01",
      "Monday, December 01, 2025", "Saturday, January 3, 2026", "garbage")
      .toDF("d").select(Dates.parseOrderDate(col("d")).cast("string"))
      .as[Option[String]].collect().toSeq
    assert(got === Seq(Some("2025-12-01"), Some("2025-12-01"), Some("2025-12-01"),
      Some("2025-12-01"), None, None))
  }

  test("parsePriceMonth: reference coalesce order (3_pricing:100-114)") {
    // single-digit forms skip the fixed-width dd/MM/yyyy and land on M/d/yy
    // (7/1/25 → Jul 1, 1/8/25 → Jan 8); two-digit 4-year forms are claimed
    // by dd/MM/yyyy first (05/06/2025 → Jun 5, NOT May 6)
    val got = Seq("7/1/25", "1/8/25", "05/06/2025", "2025-03-01").toDF("d")
      .select(Dates.parsePriceMonth(col("d")).cast("string")).as[String].collect().toSeq
    assert(got === Seq("2025-07-01", "2025-01-08", "2025-06-05", "2025-03-01"))
  }

  test("monthSpine: 24 months with keys/quarters (dim_date)") {
    val spine = Dates.monthSpine(spark, "2024-01-01", "2025-12-01")
    assert(spine.count() === 24)
    val jan24 = spine.filter(col("date_key") === 202401)
      .select("month_name", "quarter", "year_quarter").as[(String, String, String)].head()
    assert(jan24 === (("January", "Q1", "2024-Q1")))
  }

  test("sha2Key matches Spark builtin sha2 hex (F6)") {
    val got = Seq("Whey Protein (60g)").toDF("n")
      .select(Keys.sha2Key(col("n"))).as[String].head()
    assert(got.length === 64 && got.matches("[0-9a-f]{64}"))
  }

  test("compositeKey distinguishes null layouts") {
    val df = Seq((Some("a"), Option.empty[String]), (Option.empty[String], Some("a")))
      .toDF("x", "y").select(Keys.compositeKey(col("x"), col("y")).as("k"))
    assert(df.distinct().count() === 2)
  }

  test("dedupKeep is deterministic (A2 pinned)") {
    val df = Seq(("k1", 2, "b"), ("k1", 1, "a"), ("k2", 5, "z")).toDF("k", "o", "v")
    val got = Normalize.dedupKeep(df, Seq("k"), Seq(col("o")))
      .as[(String, Int, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("k1", 1, "a"), ("k2", 5, "z")))
  }
}
