package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** The whole native-expression family resolves in SQL via GraftExtensions. */
class SqlFunctionsSpec extends SparkSpec {

  private def withExtSession[A](body: SparkSession => A): A = {
    // getOrCreate reuses the suite session (extensions only apply at session
    // construction) — clear defaults so a fresh session is built on the same
    // SparkContext, then restore.
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try body(SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate())
    finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("every graft_* function resolves and computes in SQL") {
    withExtSession { s =>
      assert(s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .head().getDouble(0) === 11.0)
      assert(s.sql("SELECT graft_word_shingles(array('a','b','c'), 2)")
        .head().getSeq[String](0) === Seq("a b", "b c"))
      assert(s.sql("SELECT graft_word_shingles(array('a','a','a'), 2, false)")
        .head().getSeq[String](0) === Seq("a a", "a a"))
      assert(s.sql("SELECT graft_char_shingles('abc', 2)")
        .head().getSeq[String](0) === Seq("ab", "bc"))
      assert(s.sql("SELECT graft_normalize_text('  a  b  ')")
        .head().getString(0) === "a b")
      assert(s.sql("SELECT graft_idn_host('xn--mnchen-3ya.de')")
        .head().getString(0) === "münchen.de")
      // winnow of [md5(a), md5(b), md5(c)] windows of 2 → the two window minima
      val wm = s.sql("SELECT graft_winnow_mins(array('a','b','c'), 2)")
        .head().getSeq[String](0)
      assert(wm.nonEmpty && wm.size <= 2)
      assert(s.sql("SELECT graft_quantize_scale(array(0.0d, -2.54d))")
        .head().getDouble(0) === 0.02)
      assert(s.sql("SELECT graft_bpe_encode(array('table'), 't a,ta b')")
        .head().getSeq[String](0) === Seq("tab", "l", "e"))
      // byte-level: ' the' maps its space to Ġ and the exported-vocab
      // entries fire; the special stays atomic
      assert(s.sql("SELECT graft_byte_bpe_encode(array('x', ' the'), 'Ġ t,h e,Ġt he')")
        .head().getSeq[String](0) === Seq("x", "Ġthe"))
      assert(s.sql("SELECT graft_byte_bpe_encode(array('<|eot|>'), 'h e', '<|eot|>')")
        .head().getSeq[String](0) === Seq("<|eot|>"))
      // ids: bytes keep their byte id, products at 256+rank, specials last
      assert(s.sql("SELECT graft_byte_bpe_ids(array('the', '<|eot|>'), 'h e,t he', '<|eot|>')")
        .head().getSeq[Int](0) === Seq(257, 258))
      // decode is the exact inverse of the ids surface
      assert(s.sql(
        "SELECT graft_byte_bpe_decode(array(257, 258), 'h e,t he', '<|eot|>')")
        .head().getString(0) === "the<|eot|>")
    }
  }

  test("shape parameters must be literals — clear error otherwise") {
    withExtSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT graft_word_shingles(array('a'), cast(id AS INT)) FROM range(1)")
          .head()
      }
      assert(e.getMessage != null && e.getMessage.contains("literal"))
    }
  }
}
