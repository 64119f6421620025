package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.io.File
import java.nio.file.Files

class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() =
    new TableStore(spark, Files.createTempDirectory("graft_compact").toString)

  private def parquetFiles(store: TableStore, name: String): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_")) Seq(f)
      else Nil
    walk(new File(store.path(name)))
  }

  test("compaction bin-packs micro-batch appends; data and schema unchanged") {
    val store = newStore()
    (0 until 12).foreach { b =>
      store.append("fact", Seq.tabulate(50)(i => (b * 50 + i, s"v$i")).toDF("id", "v"))
    }
    val before = parquetFiles(store, "fact")
    assert(before.size >= 12, s"expected >=12 small files, got ${before.size}")
    val orig = store.read("fact").as[(Int, String)].collect().sortBy(_._1).toSeq

    val stats = Compact.compact(store, "fact", numFiles = Some(2))
    assert(stats.filesBefore === before.size)
    assert(stats.filesAfter === 2, stats.toString)
    assert(parquetFiles(store, "fact").size === 2)
    assert(store.read("fact").as[(Int, String)].collect().sortBy(_._1).toSeq === orig)
    assert(store.schemaOf("fact").get.fieldNames.toSeq === Seq("id", "v"))
  }

  test("compactIfFragmented: no-op below maxFiles, compacts above, content unchanged") {
    val store = newStore()
    (0 until 10).foreach { b =>
      store.append("t", Seq.tabulate(20)(i => (b * 20 + i, s"v$i")).toDF("id", "v"))
    }
    val orig = store.read("t").as[(Int, String)].collect().sortBy(_._1).toSeq
    // healthy: file count within bound — nothing happens
    assert(Compact.compactIfFragmented(store, "t", maxFiles = 64).isEmpty)
    assert(parquetFiles(store, "t").size >= 10)
    // fragmented past the bound: one compaction, data identical
    val stats = Compact.compactIfFragmented(store, "t", maxFiles = 4)
    assert(stats.nonEmpty)
    assert(parquetFiles(store, "t").size <= 4)
    assert(store.read("t").as[(Int, String)].collect().sortBy(_._1).toSeq === orig)
  }

  test("targetBytes sizes the output file count from the table's bytes") {
    val store = newStore()
    (0 until 8).foreach { b =>
      store.append("t", Seq.tabulate(100)(i => (b * 100 + i, i.toDouble)).toDF("id", "x"))
    }
    val bytes = parquetFiles(store, "t").map(_.length()).sum
    val stats = Compact.compact(store, "t", targetBytes = (bytes + 3) / 4)
    assert(stats.filesAfter === 4, stats.toString)
  }

  test("Z-order clusters every zorder dimension, not just the leading one") {
    val store = newStore()
    // a 64x64 uniform grid, appended in row-major slices (so the raw layout
    // is perfectly clustered in x and catastrophically unclustered in y)
    (0 until 8).foreach { s =>
      store.append("grid",
        (s * 8 until (s + 1) * 8).flatMap(x => (0 until 64).map(y => (x, y))).toDF("x", "y"))
    }
    Compact.compact(store, "grid", numFiles = Some(4), zorderBy = Seq("x", "y"))

    val files = parquetFiles(store, "grid")
    assert(files.size === 4)
    def spanSum(c: String): Double = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      r.getDouble(1) - r.getDouble(0)
    }.sum
    // 4 Morton quadrants of a 64x64 grid: each file spans about half of each
    // axis, so the per-file span sum is ~2x the global span on BOTH axes
    // (~124) — an unclustered axis sums to 4x (252; a plain sort by x leaves
    // spanSum("y") there). RangePartitioner boundaries come from sampling,
    // so quadrants are approximate: assert well under unclustered, with
    // slack above the ideal.
    assert(spanSum("x") <= 0.8 * 4 * 63, s"x not clustered: ${spanSum("x")}")
    assert(spanSum("y") <= 0.8 * 4 * 63, s"y not clustered: ${spanSum("y")}")
    // and the rewrite is lossless
    assert(store.read("grid").count() === 64L * 64)
    assert(store.read("grid").distinct().count() === 64L * 64)
  }

  test("compacting a hive-partitioned table preserves the layout and prunes") {
    val store = newStore()
    (0 until 6).foreach { b =>
      store.append("pt",
        Seq.tabulate(40)(i => (b * 40 + i, s"m${i % 3}")).toDF("id", "month"),
        partitionBy = Seq("month"))
    }
    val orig = store.read("pt").as[(Int, String)].collect().sortBy(_._1).toSeq
    val stats = Compact.compact(store, "pt", numFiles = Some(3), partitionBy = Seq("month"))
    assert(stats.filesAfter < stats.filesBefore)
    assert(new File(store.path("pt")).listFiles().map(_.getName).count(_.startsWith("month=")) === 3)
    assert(store.read("pt").as[(Int, String)].collect().sortBy(_._1).toSeq === orig)
  }

  test("zorder handles date columns and NaN/null doubles without poisoning the scale") {
    val store = newStore()
    val rows = (0 until 100).map { i =>
      (i, java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"),
        if (i == 7) Double.NaN else if (i == 13) Double.PositiveInfinity else i.toDouble)
    } :+ ((100, null.asInstanceOf[java.sql.Date], 50.0))
    store.append("dz", rows.toDF("id", "d", "x"))
    Compact.compact(store, "dz", numFiles = Some(2), zorderBy = Seq("d", "x"))
    assert(store.read("dz").count() === 101) // lossless despite NaN/Inf/null
    // the NaN row must not have flattened every lane: the two files differ
    val spans = parquetFiles(store, "dz").map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("id")), max(col("id"))).head()
      (r.getInt(0), r.getInt(1))
    }
    assert(spans.size === 2 && spans.distinct.size === 2)
  }

  test("zorder double lane survives a +Inf row (non-finite must not collapse the scale)") {
    val store = newStore()
    // x is the ONLY zorder lane, so a collapse (mx=+Inf → every finite row
    // scales to bucket 0) has nowhere to hide behind another lane: all keys
    // equal → one range partition → the file x-spans overlap fully
    val rows = (0 until 100).map(i => (i, i.toDouble)) :+
      ((100, Double.PositiveInfinity)) :+ ((101, Double.NaN))
    store.append("zi", rows.toDF("id", "x"))
    Compact.compact(store, "zi", numFiles = Some(2), zorderBy = Seq("x"))
    assert(store.read("zi").count() === 102) // lossless
    val spans = parquetFiles(store, "zi").flatMap { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .filter(!isnan(col("x")) && abs(col("x")) =!= lit(Double.PositiveInfinity))
        .agg(min(col("x")), max(col("x")), count(lit(1))).head()
      if (r.getLong(2) == 0L) None else Some((r.getDouble(0), r.getDouble(1)))
    }.sortBy(_._1)
    assert(spans.size === 2, s"finite rows must split across both files, got $spans")
    assert(spans(0)._2 < spans(1)._1, s"x lane collapsed: file spans overlap $spans")
  }

  test("string zorder lanes hash-bucket instead of range-scaling") {
    val store = newStore()
    store.append("s", Seq.tabulate(100)(i => (i, s"k${i % 5}")).toDF("id", "k"))
    Compact.compact(store, "s", numFiles = Some(2), zorderBy = Seq("k", "id"))
    assert(store.read("s").count() === 100)
  }
}
