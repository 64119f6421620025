package graft.tables

import graft.SparkSpec
import java.nio.file.Files

class TableStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() =
    new TableStore(spark, Files.createTempDirectory("graft_store").toString)

  test("overwrite + read roundtrip, exists, drop") {
    val store = newStore()
    assert(!store.exists("t1"))
    store.overwrite("t1", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(store.exists("t1"))
    assert(store.read("t1").count() === 2)
    store.drop("t1")
    assert(!store.exists("t1"))
  }

  test("overwrite is safe when the new value reads the old table (MERGE pattern)") {
    val store = newStore()
    store.overwrite("t", Seq((1, "a")).toDF("id", "v"))
    val merged = Upsert.merge(store.read("t"), Seq((2, "b")).toDF("id", "v"), Seq("id"))
    store.overwrite("t", merged) // would crash with naive saveAsTable(Overwrite)
    assert(store.read("t").as[(Int, String)].collect().sortBy(_._1).toSeq
      === Seq((1, "a"), (2, "b")))
  }

  test("append accumulates (bronze fact pattern)") {
    val store = newStore()
    store.append("b", Seq(1).toDF("id"))
    store.append("b", Seq(2).toDF("id"))
    assert(store.read("b").count() === 2)
  }

  test("append with added column null-fills history (S7 schema evolution)") {
    val store = newStore()
    store.append("ev", Seq((1, "a")).toDF("id", "v"))
    // drifted frame adds `extra` — old files must read back NULL there,
    // not vanish or corrupt (the mixed-footer failure mode)
    store.append("ev", Seq((2, "b", 9.5)).toDF("id", "v", "extra"))
    val back = store.read("ev")
    assert(back.columns.toSeq === Seq("id", "v", "extra"))
    assert(back.as[(Int, String, Option[Double])].collect().sortBy(_._1).toSeq
      === Seq((1, "a", None), (2, "b", Some(9.5))))
  }

  test("append with missing column null-fills the incoming rows (S7)") {
    val store = newStore()
    store.append("ev2", Seq((1, "a", 1.0)).toDF("id", "v", "extra"))
    store.append("ev2", Seq((2, "b")).toDF("id", "v"))
    assert(store.read("ev2").as[(Int, String, Option[Double])].collect().sortBy(_._1).toSeq
      === Seq((1, "a", Some(1.0)), (2, "b", None)))
  }

  test("append rejects same-name type conflicts instead of writing mixed footers (S7)") {
    val store = newStore()
    store.append("ev3", Seq((1, "a")).toDF("id", "v"))
    val ex = intercept[IllegalArgumentException] {
      store.append("ev3", Seq((2, 7)).toDF("id", "v")) // v: string → int
    }
    assert(ex.getMessage.contains("schema conflict"))
    // strict mode rejects ANY drift
    intercept[IllegalArgumentException] {
      store.append("ev3", Seq((2, "b", 1.0)).toDF("id", "v", "extra"), mergeSchema = false)
    }
    assert(store.read("ev3").count() === 1) // table unharmed
  }

  test("overwrite mergeSchema=true keeps columns the new frame dropped (Delta parity)") {
    val store = newStore()
    store.overwrite("ow", Seq((1, "a", 2.0)).toDF("id", "v", "extra"))
    store.overwrite("ow", Seq((9, "z")).toDF("id", "v"), mergeSchema = true)
    val back = store.read("ow")
    assert(back.columns.toSeq === Seq("id", "v", "extra"))
    assert(back.as[(Int, String, Option[Double])].collect().toSeq === Seq((9, "z", None)))
    // default overwrite still replaces the schema outright
    store.overwrite("ow", Seq((3, "c")).toDF("id", "v"))
    assert(store.read("ow").columns.toSeq === Seq("id", "v"))
  }

  test("overwriteIfAbsentElse create-or-merge branch (S18)") {
    val store = newStore()
    store.overwriteIfAbsentElse("t", Seq((1, "a")).toDF("id", "v"))(identity)
    store.overwriteIfAbsentElse("t", Seq((1, "NEW")).toDF("id", "v")) { existing =>
      Upsert.merge(existing, Seq((1, "NEW"), (2, "b")).toDF("id", "v"), Seq("id"))
    }
    assert(store.read("t").as[(Int, String)].collect().sortBy(_._1).toSeq
      === Seq((1, "NEW"), (2, "b")))
  }
}
