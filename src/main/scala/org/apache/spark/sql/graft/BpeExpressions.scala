/** Native BPE-encode expression (same packaging rationale as
  * [[org.apache.spark.sql.graft.VectorExpressions]]).
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(tokens, merges)` — greedy byte-pair encoding of each
  * whitespace token against a CALLER-SUPPLIED merge table, flattened into
  * one subword array per row. This is the real-tokenizer surface behind
  * [[graft.ext.TextAnalysis.bpeTokenCount]]'s regex approximation: token
  * budgeting, packing, and context-window math in a training pipeline are
  * only as good as the tokenizer they count with, and a production vocab
  * is an exported merge list, not a regex.
  *
  * Semantics (the standard greedy encode, GPT-2 `bpe()` shape): per word,
  * start from single code-point pieces; repeatedly find the adjacent pair
  * with the LOWEST merge rank (= index in `merges`) present in the word
  * and merge ALL its non-overlapping occurrences left-to-right; stop when
  * no adjacent pair is in the table. Overlapping occurrences (only
  * possible when both halves are equal, `aaa` with pair `(a,a)`) merge
  * alternately from the left — `[aa, a]`. Empty words contribute no
  * pieces. Null tokens array → null.
  *
  * Deterministic: ranks are unique by construction (list position), both
  * the best-pair choice and the left-to-right merge order are total, so a
  * round-unrolled SQL replay is exact. The merge table rides the
  * expression (codegen references it as a constant object — no join, no
  * UDF, no broadcast plumbing); one native pass per row, inside
  * whole-stage codegen.
  */
case class BpeEncodeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  // empty table is legal: the encode degenerates to code-point pieces —
  // exactly what round 0 of BPE TRAINING needs
  require(merges.distinct.length == merges.length, "merge table has duplicate pairs")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // Pair-key separator is a plain space: pieces are substrings of
  // whitespace-split tokens, so no piece can ever contain one (a NUL
  // could — pathological, but legal in a token).
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    BpeEncodeTokens.compute(input.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BpeEncodeTokens.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeTokens =
    copy(child = newChild)
}

object BpeEncodeTokens {

  /** Flattened greedy-BPE pieces of every token, in token order. */
  def compute(toks: ArrayData, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var w = 0
    val n = toks.numElements()
    while (w < n) {
      val word = toks.getUTF8String(w)
      if (word != null && word.numChars() > 0) encodeWord(word.toString, ranks, out)
      w += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  private def encodeWord(word: String,
      ranks: java.util.HashMap[String, Integer],
      out: java.util.ArrayList[UTF8String]): Unit = {
    // single code-point pieces (surrogate-pair safe)
    val pieces = new java.util.ArrayList[String]()
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val cc = Character.charCount(cp)
      pieces.add(word.substring(ci, ci + cc))
      ci += cc
    }
    mergePieces(pieces, ranks, out)
  }

  /** The greedy merge loop shared by the code-point and byte-level
    * encodes: repeatedly fuse the best-ranked adjacent pair (all
    * non-overlapping occurrences, left to right) until none remains, then
    * flush the pieces.
    */
  private[graft] def mergePieces(pieces0: java.util.ArrayList[String],
      ranks: java.util.HashMap[String, Integer],
      out: java.util.ArrayList[UTF8String]): Unit = {
    var pieces = pieces0
    var done = false
    while (!done && pieces.size() > 1) {
      // the word's best-ranked adjacent pair
      var best = Integer.MAX_VALUE
      var ba: String = null
      var bb: String = null
      var i = 0
      while (i < pieces.size() - 1) {
        val r = ranks.get(pieces.get(i) + " " + pieces.get(i + 1))
        if (r != null && r.intValue() < best) {
          best = r.intValue(); ba = pieces.get(i); bb = pieces.get(i + 1)
        }
        i += 1
      }
      if (ba == null) done = true
      else {
        // merge ALL non-overlapping occurrences, left to right
        val next = new java.util.ArrayList[String](pieces.size())
        var j = 0
        while (j < pieces.size()) {
          if (j < pieces.size() - 1 && pieces.get(j) == ba && pieces.get(j + 1) == bb) {
            next.add(ba + bb); j += 2
          } else {
            next.add(pieces.get(j)); j += 1
          }
        }
        pieces = next
      }
    }
    var k = 0
    while (k < pieces.size()) {
      out.add(UTF8String.fromString(pieces.get(k))); k += 1
    }
  }

  /** Column API over a token array. */
  def bpeEncode(tokens: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(
      BpeEncodeTokens(ExpressionUtils.expression(tokens), merges))
}

/** `byte_bpe_encode(tokens, merges, specials)` — BYTE-LEVEL greedy BPE
  * with never-merged special tokens: the [[BpeEncodeTokens]] merge
  * dynamics over GPT-2's byte alphabet, so an EXPORTED merge file
  * (tiktoken/HF `merges.txt`, whose entries are byte-to-unicode mapped
  * strings like `Ġ t`) loads verbatim instead of needing a code-point
  * re-derivation.
  *
  * Per token: if it IS a special token (or a pre-tokenizer-attached
  * leading space plus one — see
  * [[graft.ext.TextAnalysis.gpt2Pretokens]]), it bypasses encoding
  * entirely — specials are atomic by contract, the space contributing its
  * own mapped piece; otherwise the token's UTF-8 BYTES map through the
  * GPT-2 byte-to-unicode table ([[ByteBpeEncodeTokens.ByteToUnicode]] —
  * printable/latin bytes to themselves, the rest to 256+n in order; the
  * public `bytes_to_unicode` algorithm of GPT-2's encoder) into the
  * initial pieces, and the shared greedy merge loop runs unchanged. Every
  * rank/tie rule is [[BpeEncodeTokens]]'s, so the t16/t18 semantics carry
  * over byte-exactly.
  */
case class ByteBpeEncodeTokens(child: Expression, merges: Seq[(String, String)],
    specials: Seq[String]) extends UnaryExpression with ExpectsInputTypes {

  require(merges.distinct.length == merges.length, "merge table has duplicate pairs")
  require(specials.distinct.length == specials.length, "duplicate special tokens")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "byte_bpe_encode"

  // same space separator as BpeEncodeTokens: mapped pieces never contain
  // a raw space (byte 0x20 maps to Ġ), and specials never enter the map
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, Integer.valueOf(i))
    }
    m
  }

  @transient private lazy val specialSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    specials.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    ByteBpeEncodeTokens.compute(input.asInstanceOf[ArrayData], ranks, specialSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rref = ctx.addReferenceObj("byteBpeRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    val sref = ctx.addReferenceObj("byteBpeSpecials", specialSet,
      classOf[java.util.HashSet[String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ByteBpeEncodeTokens.compute($c, $rref, $sref)")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeEncodeTokens =
    copy(child = newChild)
}

object ByteBpeEncodeTokens {

  /** GPT-2's byte→unicode table: bytes that are printable ASCII or the
    * latin ¡..¬ / ®..ÿ ranges map to their own code point; the remaining
    * 68 bytes map to 256+n in ascending byte order (so every byte gets a
    * PRINTABLE single-char spelling — 0x20 becomes Ġ, 0x0A becomes Ċ).
    */
  val ByteToUnicode: Array[String] = {
    val self = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (self(b)) String.valueOf(b.toChar)
      else { val s = String.valueOf((256 + n).toChar); n += 1; s }
    }.toArray
  }

  def compute(toks: ArrayData,
      ranks: java.util.HashMap[String, Integer],
      specials: java.util.HashSet[String]): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var w = 0
    val n = toks.numElements()
    while (w < n) {
      val tok = toks.getUTF8String(w)
      if (tok != null && tok.numBytes() > 0) {
        val word = tok.toString
        if (specials.contains(word)) {
          out.add(UTF8String.fromString(word)) // atomic, never merged
        } else if (word.length > 1 && word.charAt(0) == ' ' &&
            specials.contains(word.substring(1))) {
          // the pre-tokenizer attached the separating space to this token:
          // the space still encodes (its mapped char — alone, no merges
          // can apply), the special stays atomic
          out.add(UTF8String.fromString(ByteToUnicode(32)))
          out.add(UTF8String.fromString(word.substring(1)))
        } else {
          encodeWordBytes(word, ranks, out)
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  private def encodeWordBytes(word: String,
      ranks: java.util.HashMap[String, Integer],
      out: java.util.ArrayList[UTF8String]): Unit = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val pieces = new java.util.ArrayList[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      pieces.add(ByteToUnicode(bytes(i) & 0xff))
      i += 1
    }
    BpeEncodeTokens.mergePieces(pieces, ranks, out)
  }

  /** Column API over a token array. */
  def byteBpeEncode(tokens: Column, merges: Seq[(String, String)],
      specials: Seq[String]): Column =
    ExpressionUtils.column(
      ByteBpeEncodeTokens(ExpressionUtils.expression(tokens), merges, specials))

  /** The deterministic vocabulary a byte-level merge table induces — the
    * GPT-2 layout: ids 0..255 are the mapped byte symbols in byte order,
    * each merge's product takes 256 + rank, specials follow at the end.
    * Every piece [[ByteBpeEncodeTokens]] can emit is covered by
    * construction (initial pieces are byte symbols; the merge loop only
    * produces products in the table; specials bypass). Colliding symbol
    * spellings — two merges whose products concatenate to the same string,
    * or a special equal to a product — are rejected loudly: they would
    * silently conflate token ids.
    */
  def byteBpeVocab(merges: Seq[(String, String)],
      specials: Seq[String]): Seq[(String, Int)] = {
    val bytes = ByteToUnicode.zipWithIndex.map { case (s, i) => (s, i) }.toSeq
    val prods = merges.zipWithIndex.map { case ((a, b), r) => (a + b, 256 + r) }
    val specs = specials.zipWithIndex.map { case (s, i) => (s, 256 + merges.length + i) }
    val all = bytes ++ prods ++ specs
    require(all.map(_._1).distinct.length == all.length,
      "vocabulary collision: two symbols share a spelling — " +
        all.groupBy(_._1).filter(_._2.length > 1).keys.mkString(", "))
    all
  }
}

/** `gpt2_split(text, specials)` — the GPT-2 PRE-TOKENIZER: splits RAW
  * text into the pre-token array [[ByteBpeEncodeTokens]] merges within,
  * using the published GPT-2/tiktoken pattern
  * `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+`
  * with findall (leftmost, alternatives in order) semantics. This is the
  * last seam between "replays the merge dynamics" and "drop-in tokenizer
  * replica": an exported vocab loads verbatim into the merge loop (t20),
  * but ids only match production wherever the SPLIT matches too — the
  * whitespace splitter ([[graft.ext.TextAnalysis.gpt2Pretokens]]) differs
  * on punctuation boundaries ("don't", "a,b"), digit/letter seams
  * ("abc123"), multi-space runs, and non-space whitespace.
  *
  * Special tokens are cut FIRST (tiktoken's split-on-specials): the text
  * is segmented at every literal special occurrence (leftmost scan;
  * longest special wins a shared prefix), each segment is regex-split
  * independently — so the pattern never matches across a special
  * boundary and `(?!\S)` at a segment end succeeds — and the special
  * itself is emitted as one atomic pre-token, exactly the form the
  * encode expressions bypass.
  *
  * Implemented as a hand-written one-pass scanner, not java.util.regex:
  * the alternation order and the `\s+(?!\S)` backtrack are a fixed
  * 6-case decision per position (contraction → ` ?\p{L}+` → ` ?\p{N}+`
  * → ` ?[^\s\p{L}\p{N}]+` → whitespace-run minus its last char when a
  * non-space follows → whole whitespace run), so a scanner is both
  * faster (no NFA, no per-row Matcher) and exact by construction.
  * Class contract (Unicode, code-point safe): letters = `\p{L}`
  * (Character.isLetter), numbers = `\p{N}` (Nd|Nl|No), whitespace =
  * Python-regex `\s` (Java isWhitespace plus NBSP-family U+0085/U+00A0/
  * U+2007/U+202F — Java excludes non-breaking spaces, Python does not).
  * Contractions are the seven lowercase ASCII-apostrophe forms only —
  * GPT-2's published quirk ("DON'T" does not split at `'T`).
  */
case class Gpt2SplitText(child: Expression, specials: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(specials.distinct.length == specials.length, "duplicate special tokens")
  require(specials.forall(_.nonEmpty), "empty special token")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "gpt2_split"

  // longest-first so a shared-prefix pair ("<|eot|>", "<|eot|>X") resolves
  // to the longer literal at the same scan position
  @transient private lazy val specialsByLen: Array[String] =
    specials.sortBy(-_.length).toArray

  override def nullSafeEval(input: Any): Any =
    Gpt2SplitText.compute(input.asInstanceOf[UTF8String], specialsByLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Java SOURCE syntax, not classOf[Array[String]].getName: getName yields
    // the JVM-internal "[Ljava.lang.String;" which Janino cannot parse in the
    // cast addReferenceObj emits, silently dropping the whole stage to the
    // interpreted path ("Unexpected token [ in primary").
    val sref = ctx.addReferenceObj("gpt2Specials", specialsByLen,
      "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Gpt2SplitText.compute($c, $sref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Gpt2SplitText =
    copy(child = newChild)
}

object Gpt2SplitText {

  /** Python-regex `\s` (NOT Java's isWhitespace, which excludes the
    * non-breaking family).
    */
  private def isSpace(cp: Int): Boolean =
    Character.isWhitespace(cp) || cp == 0x85 || cp == 0xA0 ||
      cp == 0x2007 || cp == 0x202F

  /** `\p{N}` = Nd | Nl | No (Character.isDigit is Nd only). */
  private def isNumber(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  /** The seven GPT-2 contraction alternatives; returns the match length at
    * `i` (0 = none). The set is prefix-free, so first-match = the
    * pattern's leftmost-alternative semantics.
    */
  private def contractionLen(s: String, i: Int): Int = {
    if (i + 1 >= s.length || s.charAt(i) != '\'') return 0
    s.charAt(i + 1) match {
      case 's' | 't' | 'm' | 'd' => 2
      case 'r' | 'v' => if (i + 2 < s.length && s.charAt(i + 2) == 'e') 3 else 0
      case 'l' => if (i + 2 < s.length && s.charAt(i + 2) == 'l') 3 else 0
      case _ => 0
    }
  }

  def compute(text: UTF8String, specialsByLen: Array[String]): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String]()
    var pos = 0
    while (pos < s.length) {
      // earliest special occurrence at or after pos (longest wins a tie
      // because specialsByLen is longest-first and ties keep the first hit)
      var segEnd = s.length
      var hit: String = null
      var si = 0
      while (si < specialsByLen.length) {
        val idx = s.indexOf(specialsByLen(si), pos)
        if (idx >= 0 && idx < segEnd) { segEnd = idx; hit = specialsByLen(si) }
        si += 1
      }
      if (hit != null && segEnd == pos) {
        out.add(UTF8String.fromString(hit))
        pos += hit.length
      } else {
        scanSegment(s, pos, segEnd, out)
        pos = segEnd
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** findall over `s[from, until)` — one pre-token per iteration, each
    * case mirroring one pattern alternative in order.
    */
  private def scanSegment(s: String, from: Int, until: Int,
      out: java.util.ArrayList[UTF8String]): Unit = {
    var i = from
    while (i < until) {
      val cl = contractionLen(s, i)
      var end = i
      if (cl > 0 && i + cl <= until) {
        end = i + cl
      } else {
        // ` ?` — the optional leading char is a literal space only
        val k = if (s.charAt(i) == ' ' && i + 1 < until) i + 1 else i
        val cp = s.codePointAt(k)
        if (k > i || !isSpace(cp)) {
          if (Character.isLetter(cp)) {
            end = k; while (end < until && Character.isLetter(s.codePointAt(end))) end += Character.charCount(s.codePointAt(end))
          } else if (isNumber(cp)) {
            end = k; while (end < until && isNumber(s.codePointAt(end))) end += Character.charCount(s.codePointAt(end))
          } else if (!isSpace(cp)) {
            end = k
            while (end < until && { val c = s.codePointAt(end)
              !isSpace(c) && !Character.isLetter(c) && !isNumber(c) }) end += Character.charCount(s.codePointAt(end))
          }
        }
        if (end == i) {
          // whitespace alternatives: maximal run from i; `(?!\S)` keeps
          // the whole run at segment end, else backtracks one char so the
          // last space attaches forward; a single-char run followed by
          // non-space (only reachable for non-' ' whitespace) stays whole
          var j = i
          var lastStart = i
          while (j < until && isSpace(s.codePointAt(j))) {
            lastStart = j; j += Character.charCount(s.codePointAt(j))
          }
          end = if (j == until) j else if (lastStart > i) lastStart else j
        }
      }
      out.add(UTF8String.fromString(s.substring(i, end)))
      i = end
    }
  }

  /** Column API over raw text. */
  def gpt2Split(text: Column, specials: Seq[String]): Column =
    ExpressionUtils.column(
      Gpt2SplitText(ExpressionUtils.expression(text), specials))
}

/** `byte_bpe_encode_ids(tokens, merges, specials)` — the TOKEN-ID form of
  * [[ByteBpeEncodeTokens]]: the same byte-level greedy encode, but each
  * piece maps to its [[ByteBpeEncodeTokens.byteBpeVocab]] id in the same
  * native pass — what a training pipeline actually materializes (packing,
  * context-window math and the model all consume ids, not spellings). An
  * O(1) hash lookup per piece inside codegen; the HOF alternative
  * (`transform` over a map literal) would pay an interpreted linear map
  * scan per token.
  */
case class ByteBpeEncodeIds(child: Expression, merges: Seq[(String, String)],
    specials: Seq[String]) extends UnaryExpression with ExpectsInputTypes {

  require(merges.distinct.length == merges.length, "merge table has duplicate pairs")
  require(specials.distinct.length == specials.length, "duplicate special tokens")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "byte_bpe_encode_ids"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, Integer.valueOf(i))
    }
    m
  }

  @transient private lazy val specialSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    specials.foreach(s.add)
    s
  }

  @transient private lazy val vocab: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    ByteBpeEncodeTokens.byteBpeVocab(merges, specials)
      .foreach { case (s, i) => m.put(s, Integer.valueOf(i)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    ByteBpeEncodeIds.compute(input.asInstanceOf[ArrayData], ranks, specialSet, vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rref = ctx.addReferenceObj("byteBpeRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    val sref = ctx.addReferenceObj("byteBpeSpecials", specialSet,
      classOf[java.util.HashSet[String]].getName)
    val vref = ctx.addReferenceObj("byteBpeVocab", vocab,
      classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ByteBpeEncodeIds.compute($c, $rref, $sref, $vref)")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeEncodeIds =
    copy(child = newChild)
}

object ByteBpeEncodeIds {

  def compute(toks: ArrayData,
      ranks: java.util.HashMap[String, Integer],
      specials: java.util.HashSet[String],
      vocab: java.util.HashMap[String, Integer]): ArrayData = {
    val pieces = ByteBpeEncodeTokens.compute(toks, ranks, specials)
    val n = pieces.numElements()
    val ids = new Array[Int](n)
    var i = 0
    while (i < n) {
      // total by construction — every emitted piece is a byte symbol, a
      // merge product, or a special
      ids(i) = vocab.get(pieces.getUTF8String(i).toString).intValue()
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ids)
  }

  /** Column API over a token array. */
  def byteBpeEncodeIds(tokens: Column, merges: Seq[(String, String)],
      specials: Seq[String]): Column =
    ExpressionUtils.column(
      ByteBpeEncodeIds(ExpressionUtils.expression(tokens), merges, specials))
}

/** `byte_bpe_decode(ids, merges, specials)` — the exact inverse of
  * [[ByteBpeEncodeIds]]: an id stream back to text. GPT-2 byte-level
  * tokenization is LOSSLESS by construction (every byte has a spelling,
  * specials are atomic literals), so
  * `decode(encode_ids(gpt2_split(text))) = text` for any input — the
  * detokenization leg an eval/inspection pipeline needs after packing.
  *
  * Each id resolves through a dense id→bytes table built once from the
  * SAME vocab layout as the encoder (bytes 0..255, merge products at
  * 256+rank, specials last): byte-alphabet spellings map each char back
  * through the inverse byte↔unicode table to its raw byte; specials emit
  * their literal UTF-8 text. The output is the raw byte concatenation —
  * an id stream that slices a multi-byte character (a fixed-length
  * packing boundary mid-é) decodes to exactly those bytes, as production
  * detokenizers do; it is the caller's contract that sequence boundaries
  * land where they land. Out-of-vocabulary ids fail loudly with the id
  * and position, never silently skip.
  */
case class ByteBpeDecodeIds(child: Expression, merges: Seq[(String, String)],
    specials: Seq[String]) extends UnaryExpression with ExpectsInputTypes {

  require(merges.distinct.length == merges.length, "merge table has duplicate pairs")
  require(specials.distinct.length == specials.length, "duplicate special tokens")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = StringType
  override def prettyName: String = "byte_bpe_decode"

  @transient private lazy val table: Array[Array[Byte]] =
    ByteBpeDecodeIds.decodeTable(merges, specials)

  override def nullSafeEval(input: Any): Any =
    ByteBpeDecodeIds.compute(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Java SOURCE syntax for the array-of-array cast — getName would emit
    // the JVM-internal "[[B" Janino cannot parse (the Gpt2SplitText lesson)
    val tref = ctx.addReferenceObj("byteBpeDecodeTable", table, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ByteBpeDecodeIds.compute($c, $tref)")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeDecodeIds =
    copy(child = newChild)
}

object ByteBpeDecodeIds {

  /** Dense id→bytes table in [[ByteBpeEncodeTokens.byteBpeVocab]] order —
    * its ids are 0..size-1 by construction, so position IS the id. Fails
    * at build time if a merge spelling carries a char outside the
    * byte-unicode image (such a table could never have come from a
    * byte-level encoder).
    */
  def decodeTable(merges: Seq[(String, String)],
      specials: Seq[String]): Array[Array[Byte]] = {
    val u2b = new java.util.HashMap[Character, java.lang.Byte]()
    ByteBpeEncodeTokens.ByteToUnicode.zipWithIndex.foreach { case (s, b) =>
      u2b.put(Character.valueOf(s.charAt(0)), java.lang.Byte.valueOf(b.toByte))
    }
    val nSymbols = 256 + merges.length
    ByteBpeEncodeTokens.byteBpeVocab(merges, specials).map { case (spelling, id) =>
      if (id >= nSymbols) spelling.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      else spelling.toCharArray.map { ch =>
        val b = u2b.get(Character.valueOf(ch))
        require(b != null,
          s"merge spelling char U+${ch.toInt.toHexString} is outside the " +
            "GPT-2 byte alphabet — not a byte-level merge table")
        b.byteValue()
      }
    }.toArray
  }

  def compute(ids: ArrayData, table: Array[Array[Byte]]): UTF8String = {
    val n = ids.numElements()
    var total = 0
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id < 0 || id >= table.length)
        throw new IllegalArgumentException(
          s"byte_bpe_decode: id $id at position $i outside vocabulary of ${table.length}")
      total += table(id).length
      i += 1
    }
    val out = new Array[Byte](total)
    var o = 0
    i = 0
    while (i < n) {
      val b = table(ids.getInt(i))
      System.arraycopy(b, 0, out, o, b.length)
      o += b.length
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column API over an id array. */
  def byteBpeDecodeIds(ids: Column, merges: Seq[(String, String)],
      specials: Seq[String]): Column =
    ExpressionUtils.column(
      ByteBpeDecodeIds(ExpressionUtils.expression(ids), merges, specials))
}
