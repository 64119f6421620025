package graft.tables

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame

/** MERGE INTO semantics per SURVEY.md §2.6. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def t: DataFrame =
    Seq(("k1", 1, "t"), ("k2", 2, "t"), ("k3", 3, "t")).toDF("k", "v", "src")

  private def sorted(df: DataFrame): Seq[(String, Int, String)] =
    df.as[(String, Int, String)].collect().sortBy(_._1).toSeq

  test("matched rows updated, unmatched source inserted, unmatched target untouched") {
    val s = Seq(("k2", 20, "s"), ("k9", 90, "s")).toDF("k", "v", "src")
    val out = sorted(Upsert.merge(t, s, Seq("k")))
    assert(out === Seq(("k1", 1, "t"), ("k2", 20, "s"), ("k3", 3, "t"), ("k9", 90, "s")))
  }

  test("update=false (insert-only, reference full-load sb_fact 1_full_load_fact:182-186)") {
    val s = Seq(("k2", 20, "s"), ("k9", 90, "s")).toDF("k", "v", "src")
    val out = sorted(Upsert.merge(t, s, Seq("k"), update = false))
    assert(out === Seq(("k1", 1, "t"), ("k2", 2, "t"), ("k3", 3, "t"), ("k9", 90, "s")))
  }

  test("insert=false (update-only merge)") {
    val s = Seq(("k2", 20, "s"), ("k9", 90, "s")).toDF("k", "v", "src")
    val out = sorted(Upsert.merge(t, s, Seq("k"), insert = false))
    assert(out === Seq(("k1", 1, "t"), ("k2", 20, "s"), ("k3", 3, "t")))
  }

  test("explicit updateCols subset keeps other target columns (2_products:245-263)") {
    val s = Seq(("k2", 20, "s")).toDF("k", "v", "src")
    val out = sorted(Upsert.merge(t, s, Seq("k"), updateCols = Some(Seq("v"))))
    assert(out === Seq(("k1", 1, "t"), ("k2", 20, "t"), ("k3", 3, "t")))
  }

  test("multi-column merge keys (reference fact merges on 3-4 cols)") {
    val t2 = Seq(("a", 1, "t"), ("a", 2, "t")).toDF("k", "v", "src")
    val s2 = Seq(("a", 2, "s"), ("b", 9, "s")).toDF("k", "v", "src")
    val out = sorted(Upsert.merge(t2, s2, Seq("k", "v")))
    assert(out === Seq(("a", 1, "t"), ("a", 2, "s"), ("b", 9, "s")))
  }

  test("duplicate source keys raise under DuplicatePolicy.Error (Delta parity)") {
    val s = Seq(("k2", 20, "s"), ("k2", 21, "s")).toDF("k", "v", "src")
    val e = intercept[Exception] {
      Upsert.merge(t, s, Seq("k")).collect()
    }
    assert(e.getMessage.contains("multiple source rows") ||
      Option(e.getCause).exists(_.getMessage.contains("multiple source rows")))
  }

  test("duplicate source keys resolved by KeepLatest") {
    val s = Seq(("k2", 20, "s"), ("k2", 21, "s")).toDF("k", "v", "src")
    val out = sorted(Upsert.merge(t, s, Seq("k"),
      onDuplicate = Upsert.DuplicatePolicy.KeepLatest("v")))
    assert(out.find(_._1 == "k2").get === (("k2", 21, "s")))
  }

  test("idempotence: merge(merge(T,S),S) == merge(T,S) (SURVEY §5 property)") {
    val s = Seq(("k2", 20, "s"), ("k9", 90, "s")).toDF("k", "v", "src")
    val once = Upsert.merge(t, s, Seq("k"))
    val twice = Upsert.merge(once, s, Seq("k"))
    assert(sorted(once) === sorted(twice))
  }

  test("null keys never match (SQL equality semantics)") {
    val t2 = Seq((Option.empty[String], 1, "t")).toDF("k", "v", "src")
    val s2 = Seq((Option.empty[String], 9, "s")).toDF("k", "v", "src")
    val out = Upsert.merge(t2, s2, Seq("k")).as[(Option[String], Int, String)].collect()
    assert(out.length === 2) // both null-key rows survive, no match
  }
}
