/** graft's native Catalyst expressions.
  *
  * Lives under org.apache.spark.sql because the surfaces an Expression
  * implementation needs — `AbstractDataType` for ExpectsInputTypes and
  * `classic.ExpressionUtils` for Expression↔Column bridging — are
  * `private[sql]` in Spark 4; this is the standard packaging for third-party
  * native expressions built against stock Spark.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native codegen'd vector dot product.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: higher-order
  * functions are evaluated INTERPRETED (per-element lambda closures outside
  * whole-stage codegen) — the hot inner loop of every similarity operator.
  * This expression generates a tight `for` loop over the two `ArrayData`
  * buffers inside codegen: no per-element allocation, no virtual calls.
  *
  * Semantics match the interpreted fold bit-for-bit: strict left-to-right
  * summation in index order (IEEE double addition in the same order ⇒
  * identical bits; the DuckDB oracle's `list_reduce` does the same), null
  * or length-mismatched inputs → null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for [[DotProduct]] — cast arrays to array<double> upstream
    * (float→double is exact).
    */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Symmetric per-vector int8 quantization — the 4× storage cut an
  * embedding store takes at 100 TB (float32 → int8 + one double scale per
  * vector). `quantize_scale(v)` = max|v_i| / 127; `quantize_i8(v)` maps
  * each element to `floor(v_i/scale + 0.5)` — round-half-toward-+inf
  * spelled as floor arithmetic, because BOTH engines' floor/division are
  * IEEE-exact while their `round()` built-ins disagree on tie handling.
  * All-zero vectors quantize to zeros with scale 0 (no division occurs).
  * The max element maps to exactly ±127 up to one final-division ulp,
  * which floor absorbs — no clamp needed.
  *
  * Same codegen discipline as [[DotProduct]]: tight loops over `ArrayData`
  * inside whole-stage codegen, no per-element boxing.
  */
case class QuantizeScale(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantize_scale"
  override def nullSafeEval(input: Any): Any =
    QuantizeI8.scaleOf(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.QuantizeI8.scaleOf($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeScale =
    copy(child = newChild)
}

case class QuantizeI8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "quantize_i8"
  override def nullSafeEval(input: Any): Any =
    QuantizeI8.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.QuantizeI8.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)
}

object QuantizeI8 {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def scaleOf(v: ArrayData): Double = {
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { val a = math.abs(v.getDouble(i)); if (a > m) m = a; i += 1 }
    m / 127.0
  }

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val s = scaleOf(v)
    val out = new Array[Int](n)
    if (s != 0.0) {
      var i = 0
      while (i < n) {
        out(i) = math.floor(v.getDouble(i) / s + 0.5).toInt
        i += 1
      }
    }
    new GenericArrayData(out.map(Int.box).asInstanceOf[Array[Any]])
  }

  def scale(v: Column): Column =
    ExpressionUtils.column(QuantizeScale(ExpressionUtils.expression(v)))
  def quantize(v: Column): Column =
    ExpressionUtils.column(QuantizeI8(ExpressionUtils.expression(v)))
}

/** Native word-n-gram shingling: `word_shingles(tokens, n)` ≡
  * `array_distinct(transform(sequence(1, size-n+1), i -> array_join(
  * slice(tokens, i, n), " ")))` with a whole-tokens fallback when
  * size < n — but in ONE pass per row instead of interpreted per-element
  * lambda chains. Beyond being non-codegen, a captured subexpression
  * inside a higher-order lambda (e.g. the `split` producing the token
  * array) is RE-EVALUATED per element — O(n²) regex work per document;
  * this is the hot path of every shingle-based operator.
  *
  * `distinct = false` keeps multiplicity (repetition analysis needs the
  * counts the set form deliberately discards).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.StringType

  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShingles.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Native character q-gram shingling: `char_shingles(text, q)` ≡
  * `array_distinct(transform(sequence(1, greatest(length(text)-q+1, 1)),
  * i -> substr(text, i, q)))` — but in one pass per row. The lambda form
  * is doubly bad at scale: higher-order functions evaluate interpreted,
  * and each `substr(text, i, q)` re-walks the string's UTF-8 bytes from
  * offset 0 to find character `i` — O(len²) byte-walking per document.
  * This expression computes the char→byte offset table once and slices
  * every q-gram from it.
  *
  * Char-based like `substr` (codepoints, not bytes), with the same
  * whole-text fallback when `length(text) <= q` (including the empty
  * string → one "" shingle). One deliberate divergence from the lambda
  * form: null text → null (the [[WordShingles]] contract), where the
  * lambda chain yields `[null]` because `greatest` skips nulls — a junk
  * null-shingle row after explode.
  */
case class CharShingles(child: Expression, q: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  require(q >= 1, "char shingle width must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    CharShingles.compute(input.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharShingles.compute($c, $q)")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  /** One-pass distinct q-grams in first-occurrence order (set semantics —
    * callers aggregate/join, order-free). Slices wrap the shared byte
    * buffer without copying; consumers (explode → unsafe row writers)
    * copy on materialization, so the buffer's lifetime is one row.
    */
  def compute(text: UTF8String, q: Int): ArrayData = {
    val nChars = text.numChars()
    if (nChars <= q) return new GenericArrayData(Array[Any](text))
    val bytes = text.getBytes
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (bytes.length == nChars) {
      // ASCII fast path: char index == byte index, no offset table
      var i = 0
      while (i <= nChars - q) {
        out.add(UTF8String.fromBytes(bytes, i, q))
        i += 1
      }
    } else {
      // char c starts at byte starts(c); one walk, then O(1) slices
      val starts = new Array[Int](nChars + 1)
      var b = 0
      var c = 0
      while (c < nChars) {
        starts(c) = b
        b += UTF8String.numBytesForFirstByte(bytes(b))
        c += 1
      }
      starts(nChars) = bytes.length
      var i = 0
      while (i <= nChars - q) {
        out.add(UTF8String.fromBytes(bytes, starts(i), starts(i + q) - starts(i)))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  def shingles(text: Column, q: Int): Column =
    ExpressionUtils.column(CharShingles(ExpressionUtils.expression(text), q))
}

/** Winnowing fingerprint selection (Schleimer et al. 2003): md5 each gram
  * and emit the DISTINCT minima of every `winSel`-wide sliding window of
  * consecutive gram hashes (one degenerate window when the doc has fewer
  * grams). The df-level alternative — explode all hashes and run a
  * per-doc sliding-min WINDOW — forces a hash exchange of every gram
  * digest to re-group rows that were co-located all along (they came from
  * ONE input row); this expression computes the same selection in one
  * native pass inside the scan's codegen: O(n) via a monotonic deque,
  * zero shuffle, zero interpreted lambdas. Hash order is lowercase-hex
  * lexicographic — identical to SQL `min()` over `md5()` VARCHARs, so an
  * oracle can replay the selection with a window function.
  */
case class WinnowMins(child: Expression, winSel: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.StringType

  require(winSel >= 1, "winnow window must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_mins"

  override def nullSafeEval(input: Any): Any =
    WinnowMins.compute(input.asInstanceOf[ArrayData], winSel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WinnowMins.compute($c, $winSel)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

object WinnowMins {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val Hex = "0123456789abcdef".toCharArray
  private val Md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private def md5Hex(s: UTF8String): String = {
    val d = Md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def compute(grams: ArrayData, winSel: Int): ArrayData = {
    val m = grams.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val h = new Array[String](m)
    var i = 0
    while (i < m) { h(i) = md5Hex(grams.getUTF8String(i)); i += 1 }
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (m <= winSel) {
      var best = h(0)
      var j = 1
      while (j < m) { if (h(j).compareTo(best) < 0) best = h(j); j += 1 }
      out.add(UTF8String.fromString(best))
    } else {
      // monotonic deque of candidate indices, increasing hash order
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // [head, tail)
      var j = 0
      while (j < m) {
        while (tail > head && h(deque(tail - 1)).compareTo(h(j)) >= 0) tail -= 1
        deque(tail) = j; tail += 1
        if (deque(head) <= j - winSel) head += 1
        if (j >= winSel - 1) out.add(UTF8String.fromString(h(deque(head))))
        j += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Column API. */
  def winnowMins(grams: Column, winSel: Int): Column =
    ExpressionUtils.column(WinnowMins(ExpressionUtils.expression(grams), winSel))
}

object WordShingles {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")

  /** One-pass n-gram computation. Distinct form: first-occurrence order —
    * set semantics match array_distinct; callers aggregate/join, order-free.
    * Non-distinct form: positional order with multiplicity.
    */
  def compute(toks: ArrayData, n: Int, distinct: Boolean = true): ArrayData = {
    val len = toks.numElements()
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](math.max(len - n + 1, 1))
    if (len < n) {
      val parts = new Array[UTF8String](len)
      var j = 0
      while (j < len) { parts(j) = toks.getUTF8String(j); j += 1 }
      out.add(UTF8String.concatWs(Space, parts: _*))
    } else {
      var i = 0
      while (i <= len - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out.add(UTF8String.concatWs(Space, parts: _*))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  def shingles(tokens: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(tokens), n))

  /** Non-distinct positional n-grams (multiplicity preserved). */
  def shinglesAll(tokens: Column, n: Int): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(tokens), n, distinct = false))
}
