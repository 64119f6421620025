package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("prefix-sum packing: boundaries, straddles, offsets") {
    // shard A: tokens 1000, 1000, 100 with budget 2048
    //   doc 1 starts at 0    -> pack 0, offset 0
    //   doc 2 starts at 1000 -> pack 0, offset 1000
    //   doc 3 starts at 2000 -> pack 0, offset 2000 (straddles into pack 1)
    //   doc 4 starts at 2100 -> pack 1, offset 52
    val docs = Seq(
      ("A", 1L, 1000L), ("A", 2L, 1000L), ("A", 3L, 100L), ("A", 4L, 500L),
      ("B", 5L, 3000L), ("B", 6L, 10L) // oversized doc: starts pack 0, next doc pack 1
    ).toDF("source", "doc_id", "n")
    val got = Packing.assign(docs, "doc_id", "n", Seq("source"), 2048L)
      .select("doc_id", "pack_id", "pack_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((0L, 0L)))
    assert(got(2L) === ((0L, 1000L)))
    assert(got(3L) === ((0L, 2000L)))
    assert(got(4L) === ((1L, 52L)))
    assert(got(5L) === ((0L, 0L)))
    assert(got(6L) === ((1L, 952L))) // 3000 div/mod 2048
  }

  test("shards pack independently and packs never cross shards") {
    val docs = (0 until 300).map(i => (s"s${i % 3}", i.toLong, 700L)).toDF("source", "doc_id", "n")
    val out = Packing.assign(docs, "doc_id", "n", Seq("source"), 2048L)
    // per shard: last of 100 docs starts at 99 x 700 = 69300 -> pack 33;
    // every shard identical
    val perShard = out.groupBy("source").agg(max(col("pack_id")).as("mx"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(perShard === Set(("s0", 33L, 100L), ("s1", 33L, 100L), ("s2", 33L, 100L)))
    // conservation both ways: no pack exceeds budget + one doc tail, and
    // every NON-FINAL pack is near-full (>= budget - one doc) — a broken
    // prefix sum that fragments packs fails the lower bound
    val full = out.groupBy("source", "pack_id")
      .agg(sum(col("n")).as("tok"), max(col("pack_id")).as("pid"))
      .join(out.groupBy("source").agg(max(col("pack_id")).as("last")), Seq("source"))
      .collect()
    assert(full.forall(_.getAs[Long]("tok") <= 2048 + 700), "pack exceeds budget + one doc")
    assert(full.filter(r => r.getAs[Long]("pid") < r.getAs[Long]("last"))
      .forall(_.getAs[Long]("tok") >= 2048 - 700), "non-final pack under-filled")
  }

  test("a NULL or negative token count fails fast instead of corrupting the shard") {
    val withNull = Seq(("A", 1L, Option(10L)), ("A", 2L, None: Option[Long]))
      .toDF("source", "doc_id", "n")
    val e1 = intercept[Exception] {
      Packing.assign(withNull, "doc_id", "n", Seq("source"), 2048L).collect()
    }
    assert(e1.getMessage != null && e1.getMessage.contains("Packing"))
    val negative = Seq(("A", 1L, 10L), ("A", 2L, -1L)).toDF("source", "doc_id", "n")
    val e2 = intercept[Exception] {
      Packing.assign(negative, "doc_id", "n", Seq("source"), 2048L).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("Packing"))
  }

  test("a keyless global pack is refused") {
    val docs = Seq(("A", 1L, 10L)).toDF("source", "doc_id", "n")
    assertThrows[IllegalArgumentException] {
      Packing.assign(docs, "doc_id", "n", Nil, 2048L)
    }
  }

  test("lengthBatches: per-shard (length, id) sort, fixed cuts, pads less than arrival order") {
    // two shards; lengths deliberately interleaved in id order
    val docs = Seq(
      ("A", 1L, 100L), ("A", 2L, 1L), ("A", 3L, 99L), ("A", 4L, 2L),
      ("B", 5L, 50L), ("B", 6L, 49L))
      .toDF("source", "doc_id", "n")
    val out = Packing.lengthBatches(docs, "doc_id", "n", Seq("source"), 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("batch_id")).toMap
    // shard A sorted by length: 2(1),4(2) | 3(99),1(100) — similar lengths
    // batch together, which is the whole point
    assert(out(2L) === 0L && out(4L) === 0L)
    assert(out(3L) === 1L && out(1L) === 1L)
    assert(out(5L) === 0L && out(6L) === 0L)
    // padding efficiency of sorted batches beats arrival-order batches
    def eff(batches: Seq[Seq[Long]]): Double =
      batches.map(b => b.sum.toDouble / (b.max * b.size)).sum / batches.size
    val sortedEff = eff(Seq(Seq(1L, 2L), Seq(99L, 100L)))
    val arrivalEff = eff(Seq(Seq(100L, 1L), Seq(99L, 2L)))
    assert(sortedEff > arrivalEff)
    assertThrows[IllegalArgumentException] {
      Packing.lengthBatches(docs, "doc_id", "n", Nil, 2)
    }
    assertThrows[IllegalArgumentException] {
      Packing.lengthBatches(docs, "doc_id", "n", Seq("source"), 0)
    }
  }

  test("spanCorrupt: substituting targets back into the input reproduces the original") {
    val docs = Seq(
      (1L, (1 to 47).map(i => s"t$i").mkString(" ")), // 3 blocks, short tail
      (2L, "short doc here"),                          // single short block
      (3L, "")                                         // empty → one "" chunk
    ).toDF("doc_id", "text")
    val out = Packing.spanCorrupt(docs, "doc_id", "text", block = 20, maxSpan = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_blocks"), r.getAs[Long]("n_corrupt"),
          r.getAs[String]("input_text"), r.getAs[String]("target_text"))))
      .toMap
    assert(out(1L)._1 === 3L && out(2L)._1 === 1L && out(3L)._1 === 1L)
    // the denoising invariant: replace each <Xk> in the input by target
    // span k → the original text, token for token
    val original = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, (_, nCorrupt, inp, tgt)) =>
      val spanMap = "<X(\\d+)>([^<]*)".r.findAllMatchIn(tgt)
        .map(m => m.group(1).toInt -> m.group(2).trim).toMap
      val rebuilt = "<X(\\d+)>".r.replaceAllIn(inp,
        m => java.util.regex.Matcher.quoteReplacement(
          spanMap.getOrElse(m.group(1).toInt, "")))
        .trim.replaceAll(" +", " ")
      assert(rebuilt === original(id).trim.replaceAll("\\s+", " "),
        s"doc $id: '$rebuilt' != '${original(id)}'")
      assert(nCorrupt >= 1L) // every block drops at least one token
      // sentinels appear exactly once in input AND target, numbered by block
      assert("<X\\d+>".r.findAllIn(inp).toSeq === "<X\\d+>".r.findAllIn(tgt).toSeq)
    }
  }

  test("fimTransform: segments partition the tokens; untransformed rows byte-identical") {
    val docs = (0L until 64L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e"))
      .toDF("doc_id", "text")
    val out = Packing.fimTransform(docs, "doc_id", "text", rateMod = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("fim"), r.getAs[Long]("n_prefix"), r.getAs[Long]("n_middle"),
          r.getAs[Long]("n_suffix"), r.getAs[String]("out_text"))))
      .toMap
    assert(out.values.exists(_._1 == 1) && out.values.exists(_._1 == 0),
      "rateMod=2 must transform some docs and leave others")
    out.foreach { case (id, (fim, p, m, sfx, text)) =>
      // counts always partition the 5 tokens
      assert(p + m + sfx === 5L, s"doc $id: $p+$m+$sfx")
      if (fim == 1) {
        assert(text.startsWith("<PRE> ") && text.contains(" <SUF> ")
          && text.contains(" <MID> "), s"doc $id: $text")
        // every original token survives somewhere in the PSM text
        (0 until 5).foreach(j => assert(text.contains(s"w$id" + ('a' + j).toChar)))
      } else {
        assert(p === 0L && sfx === 0L && m === 5L)
        assert(text === s"w${id}a w${id}b w${id}c w${id}d w${id}e")
      }
    }
    // deterministic: the same frame transforms identically on a second run
    val again = Packing.fimTransform(docs, "doc_id", "text", rateMod = 2).collect()
      .map(r => r.getAs[String]("out_text")).toSeq
    assert(again === out.toSeq.sortBy(_._1).map(_._2._5) ||
      again.sorted === out.values.map(_._5).toSeq.sorted)
  }

  test("packSequences: docs flow across row boundaries, exact budget rows, ordered tail") {
    import spark.implicits._
    // shard A: docs of 3, 4, 2 ids -> stream 1..9 cut at 4:
    //   [1,2,3,4] [5,6,7,8] [9]; shard B: one 2-id doc -> [21,22]
    val docs = Seq(
      (1L, "A", Seq(1, 2, 3)),
      (2L, "A", Seq(4, 5, 6, 7)),
      (3L, "A", Seq(8, 9)),
      (9L, "B", Seq(21, 22))).toDF("doc_id", "shard", "ids")
    val out = Packing.packSequences(docs, "doc_id", "ids", Seq("shard"), 4L)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getSeq[Int](3)))).toMap
    assert(out === Map(
      ("A", 0L) -> (4L, Seq(1, 2, 3, 4)),
      ("A", 1L) -> (4L, Seq(5, 6, 7, 8)),
      ("A", 2L) -> (1L, Seq(9)),
      ("B", 0L) -> (2L, Seq(21, 22))))
  }
}
