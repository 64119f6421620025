/** Native text-normalization expression (same packaging rationale as
  * [[org.apache.spark.sql.graft.VectorExpressions]]).
  */
package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `normalize_text(s)` — the canonical text-cleaning pass a crawl corpus
  * gets before tokenization/shingling/hashing, as ONE codegen'd expression:
  *
  *   1. Unicode NFC (composed form — `e`+U+0301 and `é` must hash/shingle
  *      identically or every dedup operator sees two different documents);
  *   2. strip non-semantic invisibles: C0 controls except TAB/LF/CR, DEL,
  *      zero-widths U+200B..U+200D, BOM U+FEFF;
  *   3. collapse every run of Unicode whitespace (ASCII TAB/LF/CR/space,
  *      NBSP, U+2000..U+200A, LS/PS, U+202F, U+205F, U+3000) to one ASCII
  *      space and trim the ends.
  *
  * Spark has no NFC surface at all (`lower`/`trim` don't touch combining
  * marks), so the usual fallback is a Scala UDF — which breaks whole-stage
  * codegen on the hottest map in the pipeline. This expression stays inside
  * codegen (static call, same pattern as [[CharShingles]]) and takes a
  * zero-allocation fast path for already-clean printable ASCII — the
  * overwhelmingly common row at 100 TB, where the scan cost must stay
  * "look at the bytes once, keep the original buffer".
  *
  * Reference behavior: notebooks clean text with trim/regexp chains
  * (2_clean_conform.py) — this is the same normalization family, extended
  * to the Unicode cases real crawl data carries. Null → null.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** Chars deleted outright (never whitespace-collapsed). */
  private def isStripped(c: Char): Boolean =
    (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7f ||
      (c >= 0x200b && c <= 0x200d) || c == 0xfeff

  /** Whitespace classes collapsed to a single ASCII space. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0xa0 ||
      (c >= 0x2000 && c <= 0x200a) || c == 0x2028 || c == 0x2029 ||
      c == 0x202f || c == 0x205f || c == 0x3000

  def compute(s: UTF8String): UTF8String = {
    // Fast path: printable single-spaced trimmed ASCII is NFC-fixed and
    // normalization-fixed — return the input buffer untouched. One byte
    // scan, no allocation.
    val bytes = s.getBytes
    var i = 0
    var clean = true
    var prevSpace = true // doubles as the leading-space check
    while (clean && i < bytes.length) {
      val b = bytes(i)
      if (b < 0x20 || b == 0x7f || b < 0) clean = false // control / non-ASCII
      else if (b == ' ') { if (prevSpace) clean = false; prevSpace = true }
      else prevSpace = false
      i += 1
    }
    if (clean && !prevSpace) return s // prevSpace at end = trailing space (or empty)
    if (clean && bytes.length == 0) return s

    var str = s.toString
    // ASCII never changes under NFC; skip the normalizer's table walk
    if (!isAsciiOnly(str) && !Normalizer.isNormalized(str, Normalizer.Form.NFC))
      str = Normalizer.normalize(str, Normalizer.Form.NFC)
    val n = str.length
    val out = new java.lang.StringBuilder(n)
    var j = 0
    var pendingSpace = false
    while (j < n) {
      val c = str.charAt(j)
      if (isStripped(c)) () // dropped
      else if (isWs(c)) { if (out.length > 0) pendingSpace = true } // no leading space
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c) // surrogate pairs copied char-by-char, untouched
      }
      j += 1
    }
    UTF8String.fromString(out.toString) // pendingSpace at end = trailing ws, dropped
  }

  private def isAsciiOnly(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  /** Column API. */
  def normalizeText(c: Column): Column =
    ExpressionUtils.column(NormalizeText(ExpressionUtils.expression(c)))

  /** The identical normalization as a DuckDB SQL fragment over column
    * expression `c` — NFC via `nfc_normalize`, strip + collapse via RE2
    * classes mirroring [[isStripped]]/[[isWs]] exactly.
    */
  def duckSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(nfc_normalize($c), " +
      "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{200B}-\\x{200D}\\x{FEFF}]', '', 'g'), " +
      "'[\\t\\n\\r \\x{A0}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+', ' ', 'g'), ' ')"
}

/** `idn_host_unicode(host)` — decode IDN (`xn--` punycode, RFC 3490/3492)
  * labels of a hostname to Unicode so `münchen.de` and `xn--mnchen-3ya.de`
  * canonicalize into ONE dedup/quota group (an international crawl sees
  * both spellings: raw IRIs in hrefs, punycode on the wire).
  *
  * Decoding punycode in pure Column/SQL expressions is infeasible (the
  * RFC 3492 generalized-variable-length integer state machine), so this is
  * a native codegen'd expression over the JDK's embedded, network-free
  * `java.net.IDN` — the same packaging rationale as [[NormalizeText]], and
  * NOT a Scala UDF (which would break whole-stage codegen on the
  * canonicalize hot path). Contract: a host with no `xn--` byte sequence
  * returns the INPUT buffer untouched (zero-allocation — the
  * overwhelmingly common row); malformed punycode passes through verbatim
  * (`IDN.toUnicode` returns its input on any label that fails to decode —
  * conservative, like the canonicalizer's garbage pass-through); null →
  * null. Callers pass already-lowercased hosts ([[graft.ext.Urls.host]]);
  * mixed case would decode but is not part of the contract.
  */
case class IdnHostUnicode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "idn_host_unicode"

  override def nullSafeEval(input: Any): Any =
    IdnHostUnicode.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.IdnHostUnicode.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): IdnHostUnicode =
    copy(child = newChild)
}

object IdnHostUnicode {

  def compute(s: UTF8String): UTF8String = {
    // fast path: no "xn--" anywhere → return the input buffer untouched
    val bytes = s.getBytes
    var i = 0
    var found = false
    while (!found && i + 3 < bytes.length) {
      if (bytes(i) == 'x' && bytes(i + 1) == 'n' &&
        bytes(i + 2) == '-' && bytes(i + 3) == '-') found = true
      i += 1
    }
    if (!found) return s
    val str = s.toString
    val out =
      try java.net.IDN.toUnicode(str)
      catch { case _: Exception => str } // total: garbage passes through
    if (out == str) s else UTF8String.fromString(out)
  }

  /** Column API. */
  def idnHostUnicode(c: Column): Column =
    ExpressionUtils.column(IdnHostUnicode(ExpressionUtils.expression(c)))
}
