package graft.tables

import graft.SparkSpec

/** Time-travel reads over versioned TableStore tables. */
class VersionsSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_versions").toString)

  test("each overwrite is a new addressable version; latest wins by default") {
    val store = newStore()
    assert(Versions.versions(store, "t") === Seq.empty)
    assert(Versions.overwrite(store, "t", Seq(1).toDF("x")) === 1L)
    assert(Versions.overwrite(store, "t", Seq(2).toDF("x")) === 2L)
    assert(Versions.overwrite(store, "t", Seq(3).toDF("x")) === 3L)
    assert(Versions.versions(store, "t") === Seq(1L, 2L, 3L))
    assert(Versions.read(store, "t").collect().map(_.getInt(0)).toSeq === Seq(3))
    assert(Versions.read(store, "t", Some(1L)).collect().map(_.getInt(0)).toSeq === Seq(1))
    assert(Versions.read(store, "t", Some(2L)).collect().map(_.getInt(0)).toSeq === Seq(2))
  }

  test("retention prunes the oldest; pruned versions fail fast, never read stale") {
    val store = newStore()
    (1 to 5).foreach(i => Versions.overwrite(store, "t", Seq(i).toDF("x"), keep = 2))
    assert(Versions.versions(store, "t") === Seq(4L, 5L))
    assert(Versions.read(store, "t", Some(5L)).collect().map(_.getInt(0)).toSeq === Seq(5))
    val e = intercept[IllegalArgumentException] { Versions.read(store, "t", Some(2L)) }
    assert(e.getMessage.contains("not retained"))
    // the pruned version's files are actually gone, not just unlisted
    assert(!store.exists("t__v2"))
  }

  test("schema can evolve across versions; old snapshots keep their schema") {
    val store = newStore()
    Versions.overwrite(store, "t", Seq((1, "a")).toDF("x", "s"))
    Versions.overwrite(store, "t", Seq((2, "b", 9.0)).toDF("x", "s", "extra"))
    assert(Versions.read(store, "t", Some(1L)).columns.toSeq === Seq("x", "s"))
    assert(Versions.read(store, "t").columns.toSeq === Seq("x", "s", "extra"))
  }

  test("diff between versions: added/removed/changed/unchanged per id") {
    val store = newStore()
    Versions.overwrite(store, "t",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    Versions.overwrite(store, "t",
      Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v"))
    val d = Versions.diff(store, "t", 1L, 2L, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("missing table and bad keep fail fast; drop removes everything") {
    val store = newStore()
    intercept[IllegalArgumentException] { Versions.read(store, "nope") }
    intercept[IllegalArgumentException] {
      Versions.overwrite(store, "t", Seq(1).toDF("x"), keep = 0)
    }
    Versions.overwrite(store, "t", Seq(1).toDF("x"))
    Versions.drop(store, "t")
    assert(Versions.versions(store, "t") === Seq.empty)
    assert(!store.exists("t__v1"))
  }
}
