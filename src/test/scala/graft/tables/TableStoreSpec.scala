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
