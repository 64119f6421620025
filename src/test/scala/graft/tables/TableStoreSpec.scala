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

  test("overwrite swap crash recovery: a sidecar-complete staging is promoted, trash cleaned") {
    val root = Files.createTempDirectory("graft_store").toString
    val store = new TableStore(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")

    // build the crash-window state between overwrite's two renames:
    // live ABSENT, old content in .trash_, the complete new table (data +
    // sidecar, exactly what overwrite stages before any rename) in .staging_
    store.overwrite("t", Seq((1, "old")).toDF("id", "v"))
    assert(fs.rename(p("t"), p(".trash_t_aaaa1111")))
    store.overwrite("tmpnew", Seq((2, "new")).toDF("id", "v"))
    assert(fs.rename(p("tmpnew"), p(".staging_t_bbbb2222")))

    // the table is never observably missing: exists() recovers by
    // promoting the committed staging, and both swap dirs are gone
    assert(store.exists("t"))
    assert(store.read("t").as[(Int, String)].collect().toSeq === Seq((2, "new")))
    assert(!fs.exists(p(".trash_t_aaaa1111")))
    assert(!fs.exists(p(".staging_t_bbbb2222")))
  }

  test("overwrite swap crash recovery: trash-only state restores; neighbors' dirs untouched") {
    val root = Files.createTempDirectory("graft_store").toString
    val store = new TableStore(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")

    // trash-only (defensive branch): restore the old content
    store.overwrite("u", Seq((1, "old")).toDF("id", "v"))
    assert(fs.rename(p("u"), p(".trash_u_cccc3333")))
    assert(store.exists("u"))
    assert(store.read("u").as[(Int, String)].collect().toSeq === Seq((1, "old")))

    // prefix neighbor: table "w" is absent and only "w_codes" has a
    // staged dir — recovery of "w" must NOT promote the neighbor's
    // staging (the 8-hex-uuid suffix rule), and "w_codes" recovery works
    store.overwrite("tmpn", Seq((9, "n")).toDF("id", "v"))
    assert(fs.rename(p("tmpn"), p(".staging_w_codes_dddd4444")))
    assert(!store.exists("w"))
    assert(fs.exists(p(".staging_w_codes_dddd4444")))
    assert(store.exists("w_codes"))
    assert(store.read("w_codes").as[(Int, String)].collect().toSeq === Seq((9, "n")))
  }

  test("overwrite sweeps this table's stale swap dirs, never a neighbor's") {
    val root = Files.createTempDirectory("graft_store").toString
    val store = new TableStore(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")
    store.overwrite("t", Seq((1, "a")).toDF("id", "v"))
    // stale trash from a crash after promote + a neighbor's staging
    fs.mkdirs(p(".trash_t_eeee5555"))
    fs.mkdirs(p(".staging_t_codes_ffff6666"))
    store.overwrite("t", Seq((2, "b")).toDF("id", "v"))
    assert(!fs.exists(p(".trash_t_eeee5555")))
    assert(fs.exists(p(".staging_t_codes_ffff6666")))
    assert(store.read("t").as[(Int, String)].collect().toSeq === Seq((2, "b")))
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
