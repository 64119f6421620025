package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParagraphsSpec extends SparkSpec {
  import spark.implicits._

  test("chunks: fixed windows, short tail, empty text -> one empty chunk") {
    val df = Seq(
      (1L, "a b c d e"), // 5 tokens -> "a b", "c d", "e"
      (2L, "x y"),       // exactly one window
      (3L, "")           // [""]
    ).toDF("doc_id", "text")
    val out = Paragraphs.chunks(df, "doc_id", "text", chunkTokens = 2)
      .orderBy("doc_id", "pos")
      .as[(Long, Int, String)].collect().toSeq
    assert(out === Seq(
      (1L, 0, "a b"), (1L, 1, "c d"), (1L, 2, "e"),
      (2L, 0, "x y"),
      (3L, 0, "")))
  }

  test("chunksBySplit separators are LITERAL: '.' and '|' split like DuckDB string_split") {
    val df = Seq((1L, "a.b|c")).toDF("doc_id", "text")
    // regex-interpreted '.' would split between every character; literal
    // '.' (= DuckDB string_split semantics) yields exactly two chunks
    val byDot = Paragraphs.chunksBySplit(df, "doc_id", "text", sep = ".")
      .orderBy("pos").as[(Long, Int, String)].collect().toSeq
    assert(byDot === Seq((1L, 0, "a"), (1L, 1, "b|c")))
    // regex-interpreted '|' is an empty alternation (splits everywhere)
    val byPipe = Paragraphs.chunksBySplit(df, "doc_id", "text", sep = "|")
      .orderBy("pos").as[(Long, Int, String)].collect().toSeq
    assert(byPipe === Seq((1L, 0, "a.b"), (1L, 1, "c")))
  }

  test("chunksBySplit: \\n\\n boundaries, no separator -> one chunk, feeds boilerplateClean") {
    val df = Seq(
      (1L, "real text one\n\ncookie banner"),
      (2L, "other words\n\ncookie banner"),
      (3L, "no paragraphs here")
    ).toDF("doc_id", "text")
    val out = Paragraphs.chunksBySplit(df, "doc_id", "text")
      .orderBy("doc_id", "pos")
      .as[(Long, Int, String)].collect().toSeq
    assert(out === Seq(
      (1L, 0, "real text one"), (1L, 1, "cookie banner"),
      (2L, 0, "other words"), (2L, 1, "cookie banner"),
      (3L, 0, "no paragraphs here")))

    // same (id, pos, chunk) contract: boilerplateClean consumes it as-is —
    // 3 docs, threshold max(2, ceil(3/50)) = 2, the banner df=2 is flagged
    val cleaned = Paragraphs.boilerplateClean(
        Paragraphs.chunksBySplit(df, "doc_id", "text"), "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(cleaned === Seq(
      (1L, 2L, 1L, m("real text one")),
      (2L, 2L, 1L, m("other words")),
      (3L, 1L, 0L, m("no paragraphs here"))))
  }

  test("boilerplateClean: proportional threshold flags shared chunks, rebuilds survivors in order") {
    // 4 docs -> threshold max(2, ceil(4/50)) = 2: any chunk in >= 2 docs is
    // boilerplate. "cookie banner" repeats in docs 1-3; each doc also has
    // unique content; doc 4 is pure boilerplate and cleans to "".
    val df = Seq(
      (1L, "cookie banner real text one"),
      (2L, "cookie banner other words here"),
      // window-aligned: fixed-window segmentation only matches boilerplate
      // that lands on a chunk boundary (real paragraph splits align by
      // construction; token windows only when offsets agree)
      (3L, "cookie banner more unique stuff"),
      (4L, "cookie banner cookie banner")
    ).toDF("doc_id", "text")
    val ch = Paragraphs.chunks(df, "doc_id", "text", chunkTokens = 2)
    val out = Paragraphs.boilerplateClean(ch, "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out === Seq(
      (1L, 3L, 1L, m("real text one")),
      (2L, 3L, 1L, m("other words here")),
      (3L, 3L, 1L, m("more unique stuff")),
      (4L, 2L, 2L, m(""))))
  }

  test("df counts documents, not occurrences: within-doc repeats alone are kept") {
    // "echo echo" appears twice in doc 1 but in no other doc: df = 1 < 2,
    // so countDistinct-based df keeps it; an occurrence count would flag it.
    val df = Seq(
      (1L, "echo echo echo echo tail word"),
      (2L, "totally different words here")
    ).toDF("doc_id", "text")
    val ch = Paragraphs.chunks(df, "doc_id", "text", chunkTokens = 2)
    val out = Paragraphs.boilerplateClean(ch, "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) === Seq((1L, 3L, 0L), (2L, 2L, 0L)))
  }

  test("dedupWithinDoc: keeps first occurrence in order, counts removals, leaves unique docs alone") {
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    val df = Seq(
      // "nav" repeats at pos 0, 2, 4 -> kept once at pos 0; reading order
      // of survivors is nav, body, tail
      (1L, "nav\n\nbody\n\nnav\n\ntail\n\nnav"),
      (2L, "all\n\nunique\n\nparagraphs"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val ch = Paragraphs.chunksBySplit(df, "doc_id", "text")
    val out = Paragraphs.dedupWithinDoc(ch, "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 5L, 2L, m("nav body tail")),
      (2L, 3L, 0L, m("all unique paragraphs")),
      (3L, 1L, 0L, m("solo"))))
  }

  test("chunkTokens must be positive") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Paragraphs.chunks(df, "doc_id", "text", chunkTokens = 0)
    }
  }

  test("tokenWindows: overlap of window-stride tokens, short tail, empty doc") {
    val df = Seq(
      (1L, "a b c d e f g h"), // 8 tokens, window 5 stride 3
      (2L, "x y"),             // shorter than one window
      (3L, "")                 // [""] -> one empty window
    ).toDF("doc_id", "text")
    val out = Paragraphs.tokenWindows(df, "doc_id", "text", window = 5, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 0, 0, 5L, "a b c d e"),
      (1L, 1, 3, 5L, "d e f g h"), // overlaps "d e" with the previous window
      (1L, 2, 6, 2L, "g h"),       // short tail, not padded
      (2L, 0, 0, 2L, "x y"),
      (3L, 0, 0, 1L, "")))
    // every adjacent pair overlaps by exactly window - stride tokens
    val doc1 = out.filter(_._1 == 1L).map(_._5.split(" ").toSeq)
    doc1.sliding(2).foreach {
      case Seq(a, b) => assert(a.takeRight(2).forall(b.contains), s"$a / $b")
      case _         =>
    }
  }

  test("dupSpans: aligned shared block flags across docs, unique prefixes stay clean") {
    val block = (1 to 12).map(i => s"w$i").mkString(" ") // 12 shared tokens
    val df = Seq(
      (1L, s"aaa bbb ccc $block"),      // 15 tokens: windows at 0 (mixed) and...
      (2L, s"ddd eee fff $block"),      // same alignment, different prefix
      (3L, "unrelated words only here five six seven eight nine ten"),
      (4L, "shorty")                    // < window -> absent from output
    ).toDF("doc_id", "text")
    val out = Paragraphs.dupSpans(df, "doc_id", "text", window = 10, stride = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L)) // doc 4 has no full window
    val byId = out.map(r => r._1 -> r).toMap
    // docs 1 and 2 share the aligned all-block window(s); doc 3 flags nothing
    assert(byId(1L)._3 > 0 && byId(2L)._3 > 0)
    assert(byId(1L)._3 === byId(2L)._3) // symmetric
    assert(byId(3L)._3 === 0L && byId(3L)._4 === 0.0)
    // windows containing the doc-specific prefix never flag
    assert(byId(1L)._3 < byId(1L)._2)
  }

  test("dupSpansExact: off-stride shared block that dupSpans misses is caught") {
    val block = (1 to 12).map(i => s"w$i").mkString(" ") // 12 shared tokens
    val df = Seq(
      (1L, s"aaa bbb $block"),         // block at offset 2
      (2L, s"ccc ddd eee fff $block"), // block at offset 4 — 2 ≠ 4 (mod 3)
      (3L, "unrelated words only here five six seven eight nine ten")
    ).toDF("doc_id", "text")
    // the stride pass samples each doc's OWN positional grid: offsets 2 and
    // 4 never agree mod stride=3, so no shared window is ever emitted —
    // the documented blind spot
    val approx = Paragraphs.dupSpans(df, "doc_id", "text", window = 10, stride = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(approx.forall(_._3 === 0L),
      s"stride pass must miss the off-stride block: ${approx.toSeq}")
    // content-defined anchors don't care about offsets: both docs become
    // candidates and the stride-1 confirm flags the 3 in-block windows
    val exact = Paragraphs
      .dupSpansExact(df, "doc_id", "text", window = 10, anchor = 4, anchorMod = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(exact.map(_._1).toSeq === Seq(1L, 2L),
      s"only the two span-sharing docs are candidates: ${exact.toSeq}")
    val byId = exact.map(r => r._1 -> r).toMap
    // block 12 tokens, window 10 → shared contents [w1..w10] [w2..w11] [w3..w12]
    assert(byId(1L)._3 === 3L && byId(2L)._3 === 3L)
    // windows straddling the doc-specific prefix never flag
    assert(byId(1L)._3 < byId(1L)._2 && byId(2L)._3 < byId(2L)._2)
  }

  test("dupSpansGuaranteed: a MINIMAL window-length span is caught at any alignment") {
    // shared block of EXACTLY window=10 tokens — the smallest span the
    // contract covers — at three different offsets, none stride-aligned
    val block = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, s"aaa $block"),
      (2L, s"bbb ccc ddd $block"),
      (3L, s"eee fff $block tail1 tail2"),
      (4L, "unrelated words only here five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = Paragraphs
      .dupSpansGuaranteed(df, "doc_id", "text", window = 10, anchor = 4)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L),
      s"all three span holders must be candidates: ${out.toSeq}")
    // each doc holds exactly one full copy of the block → exactly one
    // shared window flags; prefix/suffix windows stay clean
    out.foreach { case (id, _, nd, _) => assert(nd === 1L, s"doc $id: $nd") }
    // winnowing theorem: NO dependence on selection luck — shrinking the
    // block by one token ends the guarantee (span < window is out of scope)
    val short = (1 to 9).map(i => s"w$i").mkString(" ")
    val df2 = Seq((1L, s"aaa $short"), (2L, s"bbb ccc $short")).toDF("doc_id", "text")
    val out2 = Paragraphs
      .dupSpansGuaranteed(df2, "doc_id", "text", window = 10, anchor = 4)
      .collect()
    assert(out2.forall(_.getAs[Long]("n_dup_windows") === 0L))
  }

  test("tokenWindows rejects stride outside [1, window]") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Paragraphs.tokenWindows(df, "doc_id", "text", window = 4, stride = 5)
    }
    intercept[IllegalArgumentException] {
      Paragraphs.tokenWindows(df, "doc_id", "text", window = 4, stride = 0)
    }
  }
}
