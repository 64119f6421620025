package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BpeEncodeTokens

/** Greedy BPE encode against a caller-supplied merge table (T16). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val merges = Seq(
    ("t", "a"), ("l", "e"), ("ta", "b"), ("tab", "le"), ("a", "a"))

  private def enc(text: String): Seq[String] =
    Seq(text).toDF("t")
      .select(BpeEncodeTokens.bpeEncode(
        TextAnalysis.wsTokens(col("t")), merges).as("p"))
      .head().getSeq[String](0)

  test("merges chain in rank order to the full word") {
    // t a b l e → [ta,b,l,e] → [ta,b,le] → [tab,le] → [table]
    assert(enc("table") === Seq("table"))
    // partial chains stop where the table stops
    assert(enc("tale") === Seq("ta", "le"))
    assert(enc("bat") === Seq("b", "a", "t")) // no (b,a)/(a,t) in table
  }

  test("rank order decides, not text order") {
    // "leta": (l,e) rank 1 beats (t,a) rank 0? No — (t,a) is rank 0, so it
    // merges FIRST even though (l,e) appears earlier in the word
    assert(enc("leta") === Seq("le", "ta"))
    // after (t,a) all-merged, (l,e) is next best — both end merged; the
    // pair (le,ta)/(ta,le) is absent so the chain stops
    assert(enc("tale leta") === Seq("ta", "le", "le", "ta"))
  }

  test("overlapping occurrences merge alternately from the left") {
    assert(enc("aaa") === Seq("aa", "a"))
    assert(enc("aaaa") === Seq("aa", "aa"))
    assert(enc("aaaaa") === Seq("aa", "aa", "a"))
  }

  test("multiple words flatten in order; empty words contribute nothing") {
    assert(enc("table aaa") === Seq("table", "aa", "a"))
    assert(enc("") === Seq.empty) // [""] token → no pieces
    assert(enc("   ") === Seq.empty)
  }

  test("all occurrences of the best pair merge in one round") {
    // t a t a: (t,a) merges BOTH occurrences before any other rank runs
    assert(enc("tata") === Seq("ta", "ta"))
  }

  test("words with no table pairs pass through as code points") {
    assert(enc("xyz") === Seq("x", "y", "z"))
  }

  test("bpeTrain: argmax merges with deterministic ties, early stop, encode round-trip") {
    val docs = Seq("abab abab abc").toDF("text")
    val learned = TextAnalysis.bpeTrain(docs, "text", nMerges = 5)
    // round 1: (a,b)×5 beats (b,a)×2, (b,c)×1; round 2: (ab,ab)×2;
    // round 3: only (ab,c)×1 < minCount → early stop at 2 merges
    assert(learned === Seq(("a", "b", 5L), ("ab", "ab", 2L)))
    // the learned table drives the encoder to the trained segmentation
    val enc = Seq("abab abc").toDF("t")
      .select(org.apache.spark.sql.graft.BpeEncodeTokens.bpeEncode(
        TextAnalysis.wsTokens(col("t")), learned.map(m => (m._1, m._2))).as("p"))
      .head().getSeq[String](0)
    assert(enc === Seq("abab", "ab", "c"))
  }

  test("bpeTrain tie-break is the lexicographically smallest pair") {
    // (a,b) and (c,d) both occur twice; "a b" < "c d"
    val docs = Seq("ab cd ab cd").toDF("text")
    val learned = TextAnalysis.bpeTrain(docs, "text", nMerges = 1)
    assert(learned === Seq(("a", "b", 2L)))
  }

  test("empty merge table encodes to code points") {
    val enc = Seq("ab c").toDF("t")
      .select(org.apache.spark.sql.graft.BpeEncodeTokens.bpeEncode(
        TextAnalysis.wsTokens(col("t")), Nil).as("p"))
      .head().getSeq[String](0)
    assert(enc === Seq("a", "b", "c"))
  }

  test("property: native encode matches an independent reference on random inputs") {
    // structurally different Scala reference of the same greedy contract —
    // catches expression/codegen/boundary bugs the hand-picked cases miss
    def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val ranks = merges.zipWithIndex.toMap
      var p = word.map(_.toString).toVector
      var go = p.size > 1
      while (go) {
        val cands = p.indices.dropRight(1)
          .flatMap(i => ranks.get((p(i), p(i + 1))))
        if (cands.isEmpty) go = false
        else {
          val (a, b) = merges(cands.min)
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < p.size) {
            if (i + 1 < p.size && p(i) == a && p(i + 1) == b) { nb += a + b; i += 2 }
            else { nb += p(i); i += 1 }
          }
          p = nb.result()
          go = p.size > 1
        }
      }
      p
    }
    val rnd = new scala.util.Random(20260814L)
    (1 to 25).foreach { trial =>
      val vocab = scala.collection.mutable.ArrayBuffer("a", "b", "c", "d")
      val ms = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
      while (ms.size < 6) {
        val pair = (vocab(rnd.nextInt(vocab.size)), vocab(rnd.nextInt(vocab.size)))
        if (ms.add(pair)) vocab += pair._1 + pair._2
      }
      val merges2 = ms.toSeq
      val words = (1 to 8).map(_ =>
        Seq.fill(1 + rnd.nextInt(10))("abcd" (rnd.nextInt(4))).mkString)
      val got = Seq(words.mkString(" ")).toDF("t")
        .select(org.apache.spark.sql.graft.BpeEncodeTokens.bpeEncode(
          TextAnalysis.wsTokens(col("t")), merges2).as("p"))
        .head().getSeq[String](0)
      val want = words.flatMap(w => refEncode(w, merges2))
      assert(got === want, s"trial $trial: words=$words merges=$merges2")
    }
  }

  test("duplicate merge pairs are rejected") {
    intercept[IllegalArgumentException] {
      Seq("x").toDF("t")
        .select(BpeEncodeTokens.bpeEncode(
          TextAnalysis.wsTokens(col("t")), Seq(("a", "b"), ("a", "b"))))
        .head()
    }
  }

  // ---- byte-level mode (T20) ----

  private def bEnc(text: String, merges: Seq[(String, String)],
      specials: Seq[String] = Seq("<|endoftext|>")): Seq[String] =
    Seq(text).toDF("t")
      .select(TextAnalysis.byteBpeEncode(col("t"), merges, specials).as("p"))
      .head().getSeq[String](0)

  test("byte-to-unicode table matches the GPT-2 algorithm's fixed points") {
    import org.apache.spark.sql.graft.ByteBpeEncodeTokens.ByteToUnicode
    assert(ByteToUnicode.length === 256)
    assert(ByteToUnicode.distinct.length === 256) // a bijection
    assert(ByteToUnicode('A'.toInt) === "A") // printable ASCII: identity
    assert(ByteToUnicode(0xa9) === "©") // latin range: identity
    // hand-computed non-self points: 0x20 is the 33rd non-self byte
    // (0..31 and then itself) → 256+32 = Ġ; 0x0A similarly → 256+10 = Ċ
    assert(ByteToUnicode(0x20) === "Ġ") // Ġ
    assert(ByteToUnicode(0x0a) === "Ċ") // Ċ
    assert(ByteToUnicode(0x7f) === "ġ") // DEL: 33 non-self below it → 256+33
  }

  test("byte-level round-trip against a hand-computed encode (multi-byte chars, Ġ tokens)") {
    // merges over the mapped alphabet, GPT-2 merges.txt shapes
    val m = Seq(("Ġ", "t"), ("h", "e"), ("Ġt", "he"),
      ("Ã", "©"), ("c", "a"), ("ca", "f"), ("caf", "Ã©"))
    // "the café" pretokenizes to ["the", " café"]:
    //  the  → t,h,e → (h,e) → [t, he]
    //  " café" → UTF-8 20 63 61 66 C3 A9 → Ġ,c,a,f,Ã,© → (Ã,©) fuses é's
    //  bytes, then (c,a),(ca,f),(caf,Ã©) chain → [Ġ, cafÃ©]... rank order:
    //  (Ã,©)=3 < (c,a)=4 — greedy takes 3 first, same end state
    assert(bEnc("the café", m) ===
      Seq("t", "he", "Ġ", "cafÃ©"))
    // " the" keeps its space → Ġ,t,h,e → (Ġ,t) rank 0 first → Ġt,h,e →
    // (h,e) → Ġt,he → (Ġt,he) → Ġthe: the exported-vocab "Ġthe" entry
    assert(bEnc("x the", m).last === "Ġthe")
  }

  test("special tokens stay atomic; the attached pre-tokenizer space still encodes") {
    val m = Seq(("h", "i"))
    // mid-text special: its token arrives as " <|endoftext|>" — the space
    // emits its own Ġ piece, the special passes through verbatim; the
    // following " hi" is Ġ,h,i → (h,i) merges, (Ġ,hi) absent
    assert(bEnc("hi <|endoftext|> hi", m) ===
      Seq("hi", "Ġ", "<|endoftext|>", "Ġ", "hi"))
    // leading special (first token, no space): atomic, nothing else
    assert(bEnc("<|endoftext|> hi", m) ===
      Seq("<|endoftext|>", "Ġ", "hi"))
  }

  test("byte-level training: hand-computed merges, Ġ learnable, learned table round-trips") {
    val docs = Seq("the the cat <|endoftext|>", "the cat <|endoftext|>").toDF("text")
    val learned = TextAnalysis.bpeTrainBytes(docs, "text", nMerges = 3,
      specials = Seq("<|endoftext|>"))
    // round 0: (h,e)x3 ties (t,h)x3 → lexicographic "h e" wins;
    // round 1: (t,he)x3; round 2: (a,t)/(c,a)/(Ġ,c) all x2 → "a t" wins
    assert(learned === Seq(("h", "e", 3L), ("t", "he", 3L), ("a", "t", 2L)))
    // the trained table drives the byte encoder directly
    assert(bEnc("the cat", learned.map(m => (m._1, m._2))) ===
      Seq("the", "Ġ", "c", "at"))
  }

  test("byte-level training excludes specials even when their pair would win the argmax") {
    // words: "a" (no pairs) and " b" → (Ġ,b)x1; if the special leaked,
    // " <|endoftext|>" → (Ġ,<|endoftext|>)x1 ties it and "Ġ <" sorts
    // BEFORE "Ġ b" — so a filtering bug flips rank 0
    val docs = Seq("a b <|endoftext|>").toDF("text")
    val learned = TextAnalysis.bpeTrainBytes(docs, "text", nMerges = 1,
      minCount = 1L, specials = Seq("<|endoftext|>"))
    assert(learned === Seq(("Ġ", "b", 1L)))
  }

  test("token ids: GPT-2 vocab layout, hand-computed id stream, collisions rejected") {
    import org.apache.spark.sql.graft.ByteBpeEncodeTokens.{byteBpeVocab, ByteToUnicode}
    val m = Seq(("h", "e"), ("t", "he"))
    val v = byteBpeVocab(m, Seq("<|endoftext|>")).toMap
    assert(v("A") === 'A'.toInt)          // byte symbols keep their byte id
    assert(v(ByteToUnicode(0x20)) === 32) // Ġ is byte 0x20's symbol
    assert(v("he") === 256 && v("the") === 257) // products at 256+rank
    assert(v("<|endoftext|>") === 258)    // specials last
    // two merges whose products collide must be rejected
    intercept[IllegalArgumentException] {
      byteBpeVocab(Seq(("a", "bc"), ("ab", "c")), Nil)
    }
    // hand-computed id stream: "the <|endoftext|>" → [the, Ġ, special]
    val ids = Seq("the <|endoftext|>").toDF("t")
      .select(TextAnalysis.byteBpeEncodeIds(col("t"), m, Seq("<|endoftext|>")).as("i"))
      .head().getSeq[Int](0)
    assert(ids === Seq(257, 32, 258))
  }

  test("an exported merges.txt loads verbatim") {
    val file =
      """#version: 0.2
        |Ġ t
        |h e
        |Ġt he
        |""".stripMargin
    val m = TextAnalysis.parseMerges(file)
    assert(m === Seq(("Ġ", "t"), ("h", "e"), ("Ġt", "he")))
    assert(bEnc("x the", m).last === "Ġthe")
    // malformed line fails loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.parseMerges("a b c")
    }
  }

  private def gsplit(text: String, specials: Seq[String] = Seq("<|endoftext|>")): Seq[String] =
    Seq(text).toDF("t")
      .select(org.apache.spark.sql.graft.Gpt2SplitText.gpt2Split(col("t"), specials).as("w"))
      .head().getSeq[String](0)

  test("gpt2Split: the published pattern's alternatives, hand-checked") {
    // space attaches forward; contractions split at the apostrophe
    assert(gsplit("Hello world") === Seq("Hello", " world"))
    assert(gsplit("don't stop") === Seq("don", "'t", " stop"))
    assert(gsplit("I'll we're you've he's it'd I'm") ===
      Seq("I", "'ll", " we", "'re", " you", "'ve", " he", "'s", " it", "'d", " I", "'m"))
    // letter/digit/punct seams split even with no whitespace
    assert(gsplit("abc123def") === Seq("abc", "123", "def"))
    assert(gsplit("Hello, world!!!") === Seq("Hello", ",", " world", "!!!"))
    assert(gsplit("12,50") === Seq("12", ",", "50"))
    // multi-space runs: all but the last space are their own token
    assert(gsplit("a  b") === Seq("a", " ", " b"))
    assert(gsplit("a   b") === Seq("a", "  ", " b"))
    // trailing whitespace keeps the whole run ((?!\S) at end)
    assert(gsplit("a  ") === Seq("a", "  "))
    // non-space whitespace never attaches (the ` ?` is a literal space)
    assert(gsplit("\na") === Seq("\n", "a"))
    // a \n before a word stays alone (`\s+`), unlike a space which attaches
    assert(gsplit("a\n\nb") === Seq("a", "\n", "\n", "b"))
    // uppercase contraction quirk: GPT-2's set is lowercase-only
    assert(gsplit("DON'T") === Seq("DON", "'", "T"))
    // apostrophe after a space goes through ` ?punct+`, not the contraction
    assert(gsplit(" 'twas") === Seq(" '", "twas"))
    // multi-byte letters are letters
    assert(gsplit("café au") === Seq("café", " au"))
  }

  test("gpt2Split: specials cut first, regex never matches across them") {
    assert(gsplit("x<|endoftext|>y") === Seq("x", "<|endoftext|>", "y"))
    // the space before a special is ITS OWN token: the segment 'a ' ends
    // at the special, so the trailing run stays whole
    assert(gsplit("a <|endoftext|>") === Seq("a", " ", "<|endoftext|>"))
    // with no specials registered the same text splits as plain punct/words
    assert(gsplit("x<|endoftext|>y", Nil) ===
      Seq("x", "<|", "endoftext", "|>", "y"))
    // longest special wins a shared prefix at the same position
    assert(gsplit("<|eot|>!", Seq("<|eot|>", "<|eot|>!")) === Seq("<|eot|>!"))
  }

  test("byteBpeDecode: exact round-trip inverse of byteBpeIdsGpt2") {
    val m = Seq(("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("Ã", "©"), ("l", "l"))
    val sp = Seq("<|endoftext|>")
    // multi-byte chars, contractions, specials, multi-space runs, newlines,
    // digit seams — everything the splitter treats specially must survive
    val texts = Seq(
      "the café au lait",
      "don't stop<|endoftext|>DON'T",
      "a  b   c\n\nd\te",
      "hello, world!!! 12,50 abc123def",
      " 'twas ø€𝄞 mixed", // 2-, 3-, and 4-byte UTF-8
      "")
    val got = texts.toDF("t")
      .select(TextAnalysis.byteBpeDecode(
        TextAnalysis.byteBpeIdsGpt2(col("t"), m, sp), m, sp).as("d"))
      .as[String].collect().toSeq
    assert(got === texts)
  }

  test("byteBpeDecode: codegen-compiles; OOV id and non-byte-level table fail loudly") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val m = Seq(("Ġ", "t"), ("h", "e"))
    val expr = org.apache.spark.sql.graft.ByteBpeDecodeIds(
      BoundReference(0, ArrayType(IntegerType), nullable = true), m, Seq("<|eot|>"))
    // the byte[][] reference-object cast must be Janino-parseable
    val proj = GenerateMutableProjection.generate(Seq(expr))
    // ids: 'h'=104, 'i'=105, merge product 'he'=257, special=258
    val ok = proj(InternalRow(ArrayData.toArrayData(Array(257, 105, 258))))
      .getUTF8String(0).toString
    assert(ok === "hei<|eot|>")
    val e = intercept[IllegalArgumentException] {
      proj(InternalRow(ArrayData.toArrayData(Array(259))))
    }
    assert(e.getMessage.contains("259"))
    // a merge spelling outside the byte alphabet can't be byte-level
    val bad = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.ByteBpeDecodeIds.decodeTable(
        Seq(("あ", "x")), Nil)
    }
    assert(bad.getMessage.contains("byte alphabet"))
  }

  test("byteBpeDecode: an id stream sliced mid-character decodes to exactly those bytes") {
    // 'é' is 0xC3 0xA9 → mapped chars Ã © → ids 195, 169; taking only the
    // first id yields the lone 0xC3 byte (the packing-boundary contract:
    // decode emits bytes as-is, boundaries are the caller's business).
    // Observed at the expression level — any Column path through a Java
    // String would sanitize the orphan byte to U+FFFD.
    import org.apache.spark.sql.catalyst.util.ArrayData
    val table = org.apache.spark.sql.graft.ByteBpeDecodeIds.decodeTable(Nil, Nil)
    val got = org.apache.spark.sql.graft.ByteBpeDecodeIds.compute(
      ArrayData.toArrayData(Array(195)), table)
    assert(got.getBytes.toSeq === Seq(0xC3.toByte))
    // ...and the full pair round-trips to the real character
    val full = org.apache.spark.sql.graft.ByteBpeDecodeIds.compute(
      ArrayData.toArrayData(Array(195, 169)), table)
    assert(full.toString === "é")
  }

  test("gpt2Split codegen-compiles: Janino accepts the reference-object cast") {
    // GenerateMutableProjection compiles through Janino with NO interpreted
    // fallback — this throws if doGenCode emits anything Janino can't parse.
    // Regression pin: addReferenceObj with classOf[Array[String]].getName
    // emitted the JVM-internal "[Ljava.lang.String;" cast, which Janino
    // rejected ("Unexpected token [ in primary") and every t23 plan silently
    // ran interpreted.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = org.apache.spark.sql.graft.Gpt2SplitText(
      BoundReference(0, StringType, nullable = true), Seq("<|endoftext|>"))
    val proj = GenerateMutableProjection.generate(Seq(expr))
    val out = proj(InternalRow(UTF8String.fromString("don't<|endoftext|>")))
      .getArray(0).asInstanceOf[ArrayData]
    assert(out.toObjectArray(StringType).map(_.toString).toSeq ===
      Seq("don", "'t", "<|endoftext|>"))
  }

  test("gpt2Split feeds the byte encode: raw text to production ids") {
    // 'the café' through T20-style merges: Ġt+he fuse via ranks, é's two
    // mapped bytes fuse via (Ã,©) — checked end-to-end from RAW text
    val m = Seq(("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("Ã", "©"))
    val got = Seq("the café").toDF("t")
      .select(TextAnalysis.byteBpeEncodeGpt2(col("t"), m, Nil).as("p"))
      .head().getSeq[String](0)
    assert(got === Seq("t", "he", "Ġ", "c", "a", "f", "Ã©"))
  }

  test("byte training over the regex split learns split-consistent merges") {
    // corpus: "don't" appears 3x. The whitespace trainer sees [d,o,n,',t]
    // words and eventually learns the boundary-crossing merge (don, 't);
    // the regex-split trainer sees "don" / "'t" as SEPARATE pre-tokens, so
    // that merge is unlearnable — exactly the train/encode consistency the
    // splitter parameter exists for (an encoder splitting at 't can never
    // apply a merge that crosses it).
    val docs = Seq("don't stop don't go", "don't mind").toDF("text")
    val ws = TextAnalysis.bpeTrainBytes(docs, "text", nMerges = 4, minCount = 2L)
      .map(m => (m._1, m._2))
    assert(ws.contains(("don", "'t")),
      s"whitespace training should cross the contraction boundary: $ws")
    val rx = TextAnalysis.bpeTrainBytes(docs, "text", nMerges = 4, minCount = 2L,
      splitter = c => TextAnalysis.gpt2Split(c, Nil))
    // hand-computed: ("'","t") x3 wins round 1 (lexicographic tie-break
    // among the count-3 pairs), then (d,o), then (do,n); round 4 has no
    // pair reaching minCount — early stop
    assert(rx === Seq(("'", "t", 3L), ("d", "o", 3L), ("do", "n", 3L)))
    // the learned table IS what the regex-split encoder consumes: "don't"
    // encodes through gpt2Split + the learned merges to [don, 't]
    val enc = Seq("don't").toDF("t")
      .select(TextAnalysis.byteBpeEncodeGpt2(col("t"),
        rx.map(m => (m._1, m._2)), Nil).as("p"))
      .head().getSeq[String](0)
    assert(enc === Seq("don", "'t"))
  }

  test("merges whose first symbol is '#' are merges, not comments") {
    // real HF merges.txt files contain lines like "# #" (the ## token);
    // only a FIRST-line "#version" header is skippable — dropping any
    // other '#'-leading line would shift every later merge's rank/id
    val file =
      """#version: 0.2
        |# #
        |h e
        |## #
        |""".stripMargin
    val m = TextAnalysis.parseMerges(file)
    assert(m === Seq(("#", "#"), ("h", "e"), ("##", "#")))
    // and the ranks feed the vocab ids: ## at 256, he at 257, ### at 258
    import org.apache.spark.sql.graft.ByteBpeEncodeTokens.byteBpeVocab
    val v = byteBpeVocab(m, Nil).toMap
    assert(v("##") === 256 && v("he") === 257 && v("###") === 258)
    // a "#version" line NOT at the top is NOT a header — it parses as a
    // (weird but well-formed) merge pair rather than silently vanishing
    assert(TextAnalysis.parseMerges("h e\n#version: 0.2") ===
      Seq(("h", "e"), ("#version:", "0.2")))
  }
}
