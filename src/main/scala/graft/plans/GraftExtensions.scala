package graft.plans

import org.apache.spark.sql.graft.{BpeEncodeTokens, ByteBpeDecodeIds, ByteBpeEncodeIds, ByteBpeEncodeTokens, CharShingles, Gpt2SplitText, DotProduct, IdnHostUnicode, NormalizeText, QuantizeI8, QuantizeScale, WinnowMins, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions injector: registers graft's native expressions in
  * the SQL function registry, so `spark.sql("SELECT graft_dot(a, b)")` (and
  * the whole family below) resolves like a built-in — the SQL-user surface
  * of the codegen'd expression layer. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * Shape/config parameters (shingle width, winnow window, the BPE merge
  * list) must be LITERALS — they parameterize expression construction, not
  * per-row evaluation, exactly like a built-in's `substr(x, 1, 2)` bounds.
  * The SQL merge-list encoding is `'a b,c d'` (space inside a pair, comma
  * between pairs) — vocabularies whose pieces contain commas should use
  * the Scala API, which takes the pairs structurally.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def litBool(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be a boolean literal, got $other")
  }

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, _) => v.toString
    case other =>
      throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  private def arity(children: Seq[Expression], lo: Int, hi: Int, sig: String): Unit =
    require(children.length >= lo && children.length <= hi, s"usage: $sig")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def fn(name: String, clazz: Class[_])(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))

    fn("graft_dot", classOf[DotProduct]) { c =>
      arity(c, 2, 2, "graft_dot(arrayA, arrayB)")
      DotProduct(c.head, c(1))
    }
    fn("graft_word_shingles", classOf[WordShingles]) { c =>
      arity(c, 2, 3, "graft_word_shingles(tokens, n[, distinct])")
      WordShingles(c.head, litInt(c(1), "n"),
        if (c.length == 3) litBool(c(2), "distinct") else true)
    }
    fn("graft_char_shingles", classOf[CharShingles]) { c =>
      arity(c, 2, 2, "graft_char_shingles(text, q)")
      CharShingles(c.head, litInt(c(1), "q"))
    }
    fn("graft_normalize_text", classOf[NormalizeText]) { c =>
      arity(c, 1, 1, "graft_normalize_text(text)")
      NormalizeText(c.head)
    }
    fn("graft_idn_host", classOf[IdnHostUnicode]) { c =>
      arity(c, 1, 1, "graft_idn_host(host)")
      IdnHostUnicode(c.head)
    }
    fn("graft_winnow_mins", classOf[WinnowMins]) { c =>
      arity(c, 2, 2, "graft_winnow_mins(grams, winSel)")
      WinnowMins(c.head, litInt(c(1), "winSel"))
    }
    fn("graft_quantize_scale", classOf[QuantizeScale]) { c =>
      arity(c, 1, 1, "graft_quantize_scale(vec)")
      QuantizeScale(c.head)
    }
    fn("graft_quantize_i8", classOf[QuantizeI8]) { c =>
      arity(c, 1, 1, "graft_quantize_i8(vec)")
      QuantizeI8(c.head)
    }
    def parseMergeArg(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[(String, String)] =
      litStr(e, "merges").split(",").filter(_.nonEmpty).toSeq
        .map { pair =>
          val parts = pair.split(" ", 2)
          require(parts.length == 2, s"merge pair must be 'a b': '$pair'")
          (parts(0), parts(1))
        }
    fn("graft_bpe_encode", classOf[BpeEncodeTokens]) { c =>
      arity(c, 2, 2, "graft_bpe_encode(tokens, 'a b,c d')")
      BpeEncodeTokens(c.head, parseMergeArg(c(1)))
    }
    // byte-level twins: merges over the mapped byte alphabet, optional
    // comma-joined never-merge specials (a special containing a comma is
    // not addressable through the SQL surface — use the Column API)
    fn("graft_byte_bpe_encode", classOf[ByteBpeEncodeTokens]) { c =>
      arity(c, 2, 3, "graft_byte_bpe_encode(tokens, 'a b,c d'[, 'sp1,sp2'])")
      val specials =
        if (c.length > 2) litStr(c(2), "specials").split(",").filter(_.nonEmpty).toSeq
        else Nil
      ByteBpeEncodeTokens(c.head, parseMergeArg(c(1)), specials)
    }
    fn("graft_byte_bpe_ids", classOf[ByteBpeEncodeIds]) { c =>
      arity(c, 2, 3, "graft_byte_bpe_ids(tokens, 'a b,c d'[, 'sp1,sp2'])")
      val specials =
        if (c.length > 2) litStr(c(2), "specials").split(",").filter(_.nonEmpty).toSeq
        else Nil
      ByteBpeEncodeIds(c.head, parseMergeArg(c(1)), specials)
    }
    fn("graft_gpt2_split", classOf[Gpt2SplitText]) { c =>
      arity(c, 1, 2, "graft_gpt2_split(text[, 'sp1,sp2'])")
      val specials =
        if (c.length > 1) litStr(c(1), "specials").split(",").filter(_.nonEmpty).toSeq
        else Nil
      Gpt2SplitText(c.head, specials)
    }
    fn("graft_byte_bpe_decode", classOf[ByteBpeDecodeIds]) { c =>
      arity(c, 2, 3, "graft_byte_bpe_decode(ids, 'a b,c d'[, 'sp1,sp2'])")
      val specials =
        if (c.length > 2) litStr(c(2), "specials").split(",").filter(_.nonEmpty).toSeq
        else Nil
      ByteBpeDecodeIds(c.head, parseMergeArg(c(1)), specials)
    }
  }
}
