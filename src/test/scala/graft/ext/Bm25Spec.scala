package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], terms: Seq[String]) =
    Bm25.score(docs.toDF("doc_id", "text"), "doc_id", "text", terms, topK = 10)
      .select("doc_id", "score", "rnk").as[(Long, Double, Int)]
      .collect().sortBy(_._3)

  test("higher term frequency outranks lower at equal length") {
    val out = run(Seq(
      (1L, "cat cat cat dog bird fish"),
      (2L, "cat dog bird fish mouse wolf"),
      (3L, "dog bird fish mouse wolf bear")), Seq("cat"))
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // doc 3 has no match at all
    assert(out(0)._2 > out(1)._2)
  }

  test("length normalization: same tf in a longer document scores lower") {
    val out = run(Seq(
      (1L, "cat dog"),
      (2L, "cat dog bird fish mouse wolf bear lion tiger otter")), Seq("cat"))
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
  }

  test("rational idf: a rarer term outweighs a common one at equal tf") {
    val docs = Seq(
      (1L, "rare filler filler"),
      (2L, "common filler filler"),
      (3L, "common filler filler"),
      (4L, "common filler filler"))
    val out = run(docs, Seq("rare", "common"))
    assert(out.head._1 === 1L, s"rare-term doc should rank first: ${out.toSeq}")
  }

  test("duplicate or empty query vocab rejected") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Bm25.score(df, "doc_id", "text", Nil) }
    intercept[IllegalArgumentException] { Bm25.score(df, "doc_id", "text", Seq("a", "a")) }
  }

  test("health: doc/posting/vocab counts, hot-term fraction, stale-stats flag") {
    val store = new graft.tables.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_bm25h").toString)
    val docs = Seq(
      (1L, "spark table merge"),
      (2L, "spark rows"),
      (3L, "spark other words")).toDF("doc_id", "text")
    Bm25.buildIndex(store, "bm", docs, "doc_id", "text")
    val h = Bm25.health(store, "bm")
    assert(h.nDocs === 3L)
    assert(h.nPostings === 8L) // 8 distinct (doc, term) pairs
    assert(h.vocab === 6L)     // spark table merge rows other words
    assert(h.maxTermFrac === 1.0) // 'spark' is in every doc — the skew flag
    assert(!h.staleStats)
    assert(h.postingsFiles >= 1 && h.doclenFiles >= 1)
    // a repeat poll serves from the fingerprint-keyed 1-row cache and
    // must agree exactly
    assert(Bm25.health(store, "bm") === h)
    // simulate the externally-touched-tables case the flag exists for —
    // the external append also moves the fingerprint, so the recomputed
    // nDocs reflects the touched doclen table
    store.append("bm_doclen", Seq((9L, 2L)).toDF("doc_id", "dlen"))
    val hs = Bm25.health(store, "bm")
    assert(hs.staleStats)
    assert(hs.nDocs === 4L)
    Bm25.refreshStats(store, "bm")
    assert(!Bm25.health(store, "bm").staleStats)
  }

  test("dropIndex: full teardown including stats and the health cache; the name is reusable") {
    val store = new graft.tables.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_bmdrop").toString)
    val docs = Seq((1L, "spark table"), (2L, "spark rows")).toDF("doc_id", "text")
    Bm25.buildIndex(store, "bm", docs, "doc_id", "text")
    Bm25.health(store, "bm") // materialize the cache
    val tables = Seq("bm_postings", "bm_doclen", "bm_stats", "bm_health_cache")
    assert(tables.forall(store.exists))
    Bm25.dropIndex(store, "bm")
    tables.foreach(t => assert(!store.exists(t), s"$t survived dropIndex"))
    Bm25.buildIndex(store, "bm", docs, "doc_id", "text")
    assert(Bm25.health(store, "bm").nDocs === 2L)
  }

  test("append: increment indexes without re-reading the base; equals a union rebuild exactly") {
    val store = new graft.tables.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_bm25idx").toString)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25corpus").toString
    val docs = Seq(
      (1L, "spark table merge table"),
      (2L, "merge spark spark"),
      (3L, "table table table noise"),
      (4L, "spark merge table words here"),
      (5L, "unrelated text entirely")).toDF("doc_id", "text")
    val isInc = col("doc_id") >= 4
    docs.filter(!isInc).write.parquet(s"$tmp/base")
    docs.filter(isInc).write.parquet(s"$tmp/inc")

    Bm25.buildIndex(store, "bm", spark.read.parquet(s"$tmp/base"), "doc_id", "text")
    // base corpus DELETED before the append: any plan that re-reads or
    // re-tokenizes base text fails at action time (the AnnIndexSpec pin)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/base"))
    Bm25.append(store, "bm", spark.read.parquet(s"$tmp/inc"), "doc_id", "text")

    // df of 'spark'/'table' shifts, N 3→5, avgdl shifts — all derived, so
    // the appended index must match a from-scratch union build exactly
    Bm25.buildIndex(store, "bm_union", docs, "doc_id", "text")
    def res(n: String) = Bm25.searchIndex(store, n, "doc_id",
        Seq("spark", "table"), topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    assert(res("bm") === res("bm_union"),
      "append must score identically to a union rebuild")
    assert(Bm25.knownIds(store, "bm", "doc_id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 4L, 5L))

    // a stream of one-doc appends fragments the tables; maintenance
    // compacts without touching content, and a healthy index is a no-op
    (6L to 12L).foreach { i =>
      Bm25.append(store, "bm", Seq((i, s"spark extra doc$i")).toDF("doc_id", "text"),
        "doc_id", "text")
    }
    val before = res("bm")
    assert(Bm25.maintainIfNeeded(store, "bm", maxFiles = 4).isDefined)
    assert(res("bm") === before)
    assert(Bm25.maintainIfNeeded(store, "bm", maxFiles = 64).isEmpty)
  }
}
