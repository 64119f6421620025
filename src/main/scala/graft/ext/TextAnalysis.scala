package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * Beyond the reference's own surface (BASELINE.json north-star: "add the
  * LLM-data-pipeline operators"); the reference supplies only the relational
  * substrate (SURVEY.md §2). Every helper is a pure `Column` expression —
  * whole-stage-codegen-friendly, no UDFs — so the operators scale to 100 TB
  * as embarrassingly-parallel per-row map work with no shuffle.
  *
  * Cross-engine parity (DuckDB oracle): only correctly-rounded IEEE ops
  * (+ - * / sqrt), md5 (identical hex), and regex primitives shared by both
  * engines; no libm transcendentals (exp/log differ in final ulp across
  * implementations).
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty → single empty token, same as
    * DuckDB `regexp_split_to_array`).
    */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(wsTokens(c))

  /** BPE-ish subword count: runs of letters, single digits, single
    * punctuation — the pre-tokenizer split GPT-style BPE vocabularies start
    * from. Counts pieces without needing a vocab.
    */
  val BpePattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(BpePattern), lit(0)))

  def punctCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[^a-z0-9\\s]"), lit(0)))

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Tokens ∈ stopword list, with multiplicity. */
  def stopwordCount(c: Column): Column =
    size(filter(wsTokens(c), t => t.isInCollection(Stopwords)))

  /** Mean token length = non-whitespace chars / token count. */
  def meanTokenLen(c: Column): Column =
    length(regexp_replace(c, "\\s", "")).cast("double") / tokenCount(c)

  /** Heuristic quality score in ~[0,1]: length credit, penalized by
    * punctuation density and stopword-free (unnatural) text. Linear —
    * rational arithmetic only, bit-identical across engines.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lenCredit = least(nTok / lit(64.0), lit(1.0))
    val punctRatio = punctCount(c).cast("double") / greatest(length(c), lit(1)).cast("double")
    val stopRatio = stopwordCount(c).cast("double") / nTok
    lit(0.5) * lenCredit + lit(0.5) * least(stopRatio * lit(4.0), lit(1.0)) - punctRatio * lit(2.0)
  }

  /** Language marker words (token-exact match, multiplicity counted). The
    * classic fasttext-style n-gram model needs trained weights; a marker-word
    * vote is the deterministic, dependency-free heuristic.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "有"))

  def langScore(c: Column, markers: Seq[String]): Column =
    size(filter(wsTokens(c), t => t.isInCollection(markers)))

  /** Predicted language: argmax marker count, ties broken by LangMarkers
    * order; all-zero → "und".
    */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (l, m) => l -> langScore(c, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight nests later langs in the otherwise-branch, so the CASE tests
    // langs in LangMarkers order — first max wins.
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Unicode scripts profiled by [[scriptCount]]/[[dominantScript]] —
    * name → Java regex script class. The RE2 oracle twin uses `\p{Name}`
    * (same Unicode script property, both engines count identical chars).
    * Order is the dominance tie-break, most common scripts first.
    */
  val Scripts: Seq[(String, String)] = Seq(
    "latin" -> "\\p{IsLatin}",
    "cyrillic" -> "\\p{IsCyrillic}",
    "han" -> "\\p{IsHan}",
    "arabic" -> "\\p{IsArabic}",
    "devanagari" -> "\\p{IsDevanagari}")

  /** Chars of one script in `c` — a codegen'd regexp count, rides the scan. */
  def scriptCount(c: Column, javaClass: String): Column =
    regexp_count(c, lit(s"[$javaClass]")).cast("long")

  /** Char-level script detection — the pass run BEFORE word-level language
    * ID ([[langId]]) in a crawl pipeline: script decides the tokenizer and
    * whether whitespace tokens exist at all; digits/punctuation/whitespace
    * belong to no script and never vote. Argmax char count, ties broken by
    * [[Scripts]] order; no script chars at all → "none".
    */
  def dominantScript(c: Column): Column = {
    val counts = Scripts.map { case (n, cls) => n -> scriptCount(c, cls) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("none"): Column) { case ((n, s), acc) =>
      when(s === best && best > 0, lit(n)).otherwise(acc)
    }
  }

  /** Non-distinct word bigrams — repetition analysis needs multiplicity,
    * which the (deliberately deduplicating) shingle expression discards.
    * Empty array for texts under two tokens. Native one-pass expression:
    * the `transform(sequence(…), i -> …element_at(toks, i)…)` form
    * re-evaluates the captured split per element (O(n²) regex work per
    * document — measured ~10× slower at sf0.1).
    */
  def bigramsAll(c: Column): Column = {
    val toks = wsTokens(c)
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(org.apache.spark.sql.graft.WordShingles.shinglesAll(toks, 2))
  }

  /** PII patterns — restricted to regex constructs with identical semantics
    * in Java regex and RE2 (char classes, bounded repetition, `\b`, `\d`):
    * the redaction then replays exactly in the DuckDB oracle. Conservative
    * by design — high-precision patterns a production pipeline would extend,
    * not a recall-complete PII model.
    */
  val PiiEmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhonePattern = "\\+\\d{1,2} \\d{3}-\\d{4}"
  val PiiIpv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiSsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PiiCardPattern = "\\b\\d{16}\\b"

  def piiEmailCount(c: Column): Column = regexp_count(c, lit(PiiEmailPattern))
  def piiPhoneCount(c: Column): Column = regexp_count(c, lit(PiiPhonePattern))
  def piiIpv4Count(c: Column): Column = regexp_count(c, lit(PiiIpv4Pattern))
  def piiSsnCount(c: Column): Column = regexp_count(c, lit(PiiSsnPattern))
  def piiCardCount(c: Column): Column = regexp_count(c, lit(PiiCardPattern))

  // --- Gopher-style repetition/format document filter -----------------------
  //
  // The composite rule set from Rae et al. 2021 ("Scaling Language Models:
  // Methods, Analysis & Insights from Training Gopher", Table A1), the
  // standard pre-filter every web-scale corpus build runs before dedup:
  // word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  // bullet/ellipsis line fractions, alphabetic-word fraction, and a
  // required-stopword floor. All pure Column expressions — per-row map work
  // inside the scan's codegen, no shuffle, which is exactly why this filter
  // is cheap enough to run over 100 TB before anything else.

  /** Gopher's "required words": a document must contain >= 2 of these. */
  val RequiredStopwords: Seq[String] = Seq(
    "the", "be", "to", "of", "and", "that", "have", "with")

  /** Lines of the raw text (literal newline split, same both engines). */
  def textLines(c: Column): Column = split(c, "\n")

  /** Fraction of words containing at least one alphabetic character. */
  def alphaWordFrac(c: Column): Column =
    size(filter(wsTokens(c), w => w.rlike("[A-Za-z]"))).cast("double") /
      greatest(tokenCount(c), lit(1)).cast("double")

  /** Hash-or-ellipsis symbols per word (Gopher caps this at 0.1). */
  def symbolWordRatio(c: Column): Column =
    size(regexp_extract_all(c, lit("#|\\.\\.\\.|…"), lit(0))).cast("double") /
      greatest(tokenCount(c), lit(1)).cast("double")

  /** Fraction of lines starting with a bullet marker. */
  def bulletLineFrac(c: Column): Column =
    size(filter(textLines(c), l => l.rlike("^\\s*[-*•]"))).cast("double") /
      greatest(size(textLines(c)), lit(1)).cast("double")

  /** Fraction of lines ending in an ellipsis. */
  def ellipsisLineFrac(c: Column): Column =
    size(filter(textLines(c), l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") /
      greatest(size(textLines(c)), lit(1)).cast("double")

  /** How many distinct required stopwords appear as (lowercased) tokens. */
  def requiredStopCount(c: Column): Column =
    RequiredStopwords
      .map(w => array_contains(wsTokens(lower(c)), w).cast("int"))
      .reduce(_ + _)

  /** The conjunction of all Gopher rules at the published thresholds.
    * Threshold comparisons are on exact count/count doubles — identical
    * bits in any IEEE engine, so the boolean replays in the oracle.
    */
  def gopherKeep(c: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val n = tokenCount(c)
    (n >= minWords) && (n <= maxWords) &&
      (meanTokenLen(c) >= 3.0) && (meanTokenLen(c) <= 10.0) &&
      (symbolWordRatio(c) < 0.1) &&
      (bulletLineFrac(c) < 0.9) &&
      (ellipsisLineFrac(c) < 0.3) &&
      (alphaWordFrac(c) > 0.8) &&
      (requiredStopCount(c) >= 2)
  }

  /** Redact PII in place with typed placeholders. Email first: its body can
    * contain digit runs and dotted quads, so redacting it up front keeps the
    * later passes from matching inside an address. SSN before phone: both
    * use `ddd-dd…` digit-dash shapes, and a `\+d ddd-dddd` phone tail can
    * never complete an SSN (needs a second dash) while an already-redacted
    * SSN can never complete a phone (needs a leading `+d `), so this order
    * is conflict-free; card and IP match digit runs the earlier redactions
    * have already broken. Pure per-row map work — no shuffle,
    * codegen-resident.
    */
  def redactPii(c: Column): Column = {
    val e = regexp_replace(c, PiiEmailPattern, "[EMAIL]")
    val s = regexp_replace(e, PiiSsnPattern, "[SSN]")
    val p = regexp_replace(s, PiiPhonePattern, "[PHONE]")
    val k = regexp_replace(p, PiiCardPattern, "[CARD]")
    regexp_replace(k, PiiIpv4Pattern, "[IP]")
  }

  /** Greedy BPE pieces of every whitespace token against a caller-supplied
    * merge table, flattened in token order — the REAL-tokenizer surface
    * behind [[bpeTokenCount]]'s regex estimate
    * ([[org.apache.spark.sql.graft.BpeEncodeTokens]]): token budgets,
    * packing, and context-window math count with the production vocab's
    * exported merge list, not an approximation. One codegen'd native pass
    * per row; the merge table rides the expression as a constant.
    */
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.BpeEncodeTokens.bpeEncode(wsTokens(c), merges)

  /** GPT-2-ish pre-tokens: whitespace tokens where every NON-FIRST token
    * carries its separating space — the piece of GPT-2's pre-tokenizer
    * that matters for an exported merge table (its `Ġx` entries only ever
    * fire on tokens that kept their leading space; byte-mapping turns
    * that space into Ġ). The full regex pre-tokenizer also splits
    * letter/digit/punct runs — out of scope here; tokens stay
    * whitespace-delimited.
    */
  def gpt2Pretokens(c: Column): Column =
    transform(wsTokens(c), (w, i) => when(i === 0, w).otherwise(concat(lit(" "), w)))

  /** Byte-level BPE encode with never-merged special tokens
    * ([[org.apache.spark.sql.graft.ByteBpeEncodeTokens]]) over
    * [[gpt2Pretokens]] — the surface that loads an exported
    * tiktoken/HF merge file verbatim.
    */
  def byteBpeEncode(c: Column, merges: Seq[(String, String)],
      specials: Seq[String]): Column =
    org.apache.spark.sql.graft.ByteBpeEncodeTokens.byteBpeEncode(
      gpt2Pretokens(c), merges, specials)

  /** Token-ID byte-level encode
    * ([[org.apache.spark.sql.graft.ByteBpeEncodeIds]]) — the artifact a
    * training pipeline materializes: the same encode as [[byteBpeEncode]]
    * with each piece mapped to its deterministic vocab id (bytes 0..255,
    * merge products at 256+rank, specials last) in one native pass.
    */
  def byteBpeEncodeIds(c: Column, merges: Seq[(String, String)],
      specials: Seq[String]): Column =
    org.apache.spark.sql.graft.ByteBpeEncodeIds.byteBpeEncodeIds(
      gpt2Pretokens(c), merges, specials)

  /** The REAL GPT-2 pre-tokenizer over raw text
    * ([[org.apache.spark.sql.graft.Gpt2SplitText]]): the published
    * contraction/letter/number/punct/whitespace pattern with
    * split-on-specials, replacing [[gpt2Pretokens]]'s whitespace
    * approximation where production tokenizer parity matters.
    */
  def gpt2Split(c: Column, specials: Seq[String]): Column =
    org.apache.spark.sql.graft.Gpt2SplitText.gpt2Split(c, specials)

  /** Byte-level BPE over the REAL GPT-2 split — [[byteBpeEncode]] with
    * [[gpt2Split]] in place of the whitespace pre-tokenizer: raw text in,
    * production-faithful pieces out (an exported merges.txt + this =
    * drop-in tokenizer replica).
    */
  def byteBpeEncodeGpt2(c: Column, merges: Seq[(String, String)],
      specials: Seq[String]): Column =
    org.apache.spark.sql.graft.ByteBpeEncodeTokens.byteBpeEncode(
      gpt2Split(c, specials), merges, specials)

  /** Token-ID form of [[byteBpeEncodeGpt2]] — raw text to the id stream
    * training consumes, split and merged exactly as the exported
    * tokenizer would.
    */
  def byteBpeIdsGpt2(c: Column, merges: Seq[(String, String)],
      specials: Seq[String]): Column =
    org.apache.spark.sql.graft.ByteBpeEncodeIds.byteBpeEncodeIds(
      gpt2Split(c, specials), merges, specials)

  /** Detokenize: id stream → text, the exact inverse of
    * [[byteBpeIdsGpt2]] (byte-level BPE is lossless, so
    * `byteBpeDecode(byteBpeIdsGpt2(text)) = text` for any input) — the
    * inspection/eval leg after packing, and the round-trip check that
    * catches a wrong-vocab load before a training run does.
    */
  def byteBpeDecode(ids: Column, merges: Seq[(String, String)],
      specials: Seq[String]): Column =
    org.apache.spark.sql.graft.ByteBpeDecodeIds.byteBpeDecodeIds(
      ids, merges, specials)

  /** Parse an exported HF/GPT-2 `merges.txt` into the merge table
    * [[byteBpeEncode]] consumes verbatim: one `a b` pair per line in rank
    * order, an optional `#version` FIRST line (the only comment convention
    * the format has) and blank lines skipped. Every other line — including
    * ones whose first symbol is literally `#`, e.g. the `# #` merge that
    * produces the `##` token — is a merge; skipping them would silently
    * shift every later rank, exactly the failure this parser exists to
    * prevent. Fails loudly on a malformed line instead.
    */
  def parseMerges(content: String): Seq[(String, String)] = {
    val lines = content.linesIterator.toIndexedSeq
    val body = lines match {
      case head +: rest if head.trim.startsWith("#version") => rest
      case other => other
    }
    body.map(_.trim).filter(_.nonEmpty).map { l =>
      val sp = l.split(" ")
      require(sp.length == 2, s"malformed merges.txt line: '$l'")
      (sp(0), sp(1))
    }
  }

  /** Train a BPE merge table ON the corpus — the learning side of
    * [[bpeEncode]] (Sennrich et al. 2016): each round re-encodes every
    * word with the merges learned so far (round 0 = code points), counts
    * ADJACENT piece pairs within words (multiplicity, never across word
    * boundaries), and adopts the most frequent pair — ties broken by the
    * lexicographically smallest `"a b"` pair string, so the table is
    * deterministic. Stops early when no pair reaches `minCount`.
    *
    * Each round is one distributed scan + one pair-count aggregation; the
    * argmax row collects to the driver (1 row/round — the PageRank-loop
    * idiom, K driver-bounded jobs for K merges). At 100 TB, train on the
    * md5-bucket sample (`sampleFilter` — the k-means/PQ convention:
    * codebook quality needs corpus STATISTICS, not the corpus) and encode
    * everything with the result.
    *
    * Returns (a, b, count) per adopted merge, in rank order — feed
    * `.map(m => (m._1, m._2))` to [[bpeEncode]].
    */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[(String, String, Long)] = {
    require(nMerges >= 1, s"need at least one merge, got $nMerges")
    import org.apache.spark.sql.graft.{BpeEncodeTokens, WordShingles}
    val words = df.select(explode(wsTokens(col(textCol))).as("_w"))
      .filter(length(col("_w")) > 0)
    val out = Vector.newBuilder[(String, String, Long)]
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val pieces = BpeEncodeTokens.bpeEncode(array(col("_w")), merges)
      val pairs = when(size(pieces) >= 2, WordShingles.shinglesAll(pieces, 2))
        .otherwise(array().cast("array<string>"))
      val top = words.select(explode(pairs).as("_p"))
        .groupBy(col("_p")).agg(count(lit(1)).as("_c"))
        .filter(col("_c") >= minCount)
        .orderBy(col("_c").desc, col("_p"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        // pieces are whitespace-free (they come from whitespace tokens),
        // so the shingle's single space splits the pair exactly
        val Array(a, b) = top.head.getString(0).split(" ", 2)
        merges :+= ((a, b))
        out += ((a, b, top.head.getLong(1)))
      }
    }
    out.result()
  }

  /** Byte-level twin of [[bpeTrain]]: each round encodes with
    * [[org.apache.spark.sql.graft.ByteBpeEncodeTokens]] over
    * [[gpt2Pretokens]] — so Ġ-carrying merges (the entries an exported
    * vocab is made of) are LEARNABLE, because non-first tokens train with
    * their attached space — counts within-word adjacent pairs and adopts
    * the deterministic argmax (count desc, pair asc), exactly [[bpeTrain]]'s
    * loop. `specials` never enter the training stream, neither bare nor
    * behind their attached space, so no merge can capture one (the t21
    * plant makes this decisive: an every-doc special would otherwise be
    * the top pair). The learned table drives [[byteBpeEncode]] directly
    * and round-trips through [[parseMerges]]' merges.txt format — train
    * here, export, reload verbatim.
    *
    * `splitter` selects the pre-tokenizer the training stream flows
    * through — [[gpt2Pretokens]] (whitespace + attached space, the t21
    * oracle contract) by default, or `gpt2Split(_, specials)` for the
    * published regex ([[org.apache.spark.sql.graft.Gpt2SplitText]]), which
    * closes the lifecycle loop: merges LEARNED over the real split are
    * exactly the entries [[byteBpeEncodeGpt2]] consumes, so
    * train → export → reload → encode uses one consistent pre-tokenizer
    * end to end (a split mismatch between train and encode silently skews
    * pair statistics toward boundaries the encoder never produces). The
    * specials filter already covers both conventions: bare tokens (the
    * regex splitter's form) and space-attached ones (the whitespace
    * splitter's).
    */
  def bpeTrainBytes(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, specials: Seq[String] = Nil,
      splitter: Column => Column = gpt2Pretokens): Seq[(String, String, Long)] = {
    require(nMerges >= 1, s"need at least one merge, got $nMerges")
    import org.apache.spark.sql.graft.{ByteBpeEncodeTokens, WordShingles}
    val words0 = df.select(explode(splitter(col(textCol))).as("_w"))
      .filter(length(col("_w")) > 0)
    val words =
      if (specials.isEmpty) words0
      else words0.filter(!regexp_replace(col("_w"), "^ ", "").isin(specials: _*))
    val out = Vector.newBuilder[(String, String, Long)]
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val pieces = ByteBpeEncodeTokens.byteBpeEncode(
        array(col("_w")), merges, specials)
      // byte-mapped pieces never contain a raw space (0x20 maps to Ġ), so
      // the bigram shingle's separator splits the pair exactly
      val pairs = when(size(pieces) >= 2, WordShingles.shinglesAll(pieces, 2))
        .otherwise(array().cast("array<string>"))
      val top = words.select(explode(pairs).as("_p"))
        .groupBy(col("_p")).agg(count(lit(1)).as("_c"))
        .filter(col("_c") >= minCount)
        .orderBy(col("_c").desc, col("_p"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top.head.getString(0).split(" ", 2)
        merges :+= ((a, b))
        out += ((a, b, top.head.getLong(1)))
      }
    }
    out.result()
  }

  // --- trained-weight linear classifier -------------------------------------

  /** Score documents with a TRAINED weight table — the production surface
    * behind the t14 demo (whose weights are synthesized arithmetic): a
    * curation pipeline exports its fastText/DCLM-style linear model as
    * (term, weight) rows and gates on the score. Mean-pooled linear model:
    *
    *   score = bias + (Σ_t w(t)) / n_tokens
    *
    * over whitespace tokens, with w(t) = 0 for out-of-vocabulary tokens — a
    * document whose tokens are all OOV (including the empty document, whose
    * single token is `""`) scores exactly `bias`. Tokens carry multiplicity
    * (a term appearing k times contributes k·w).
    *
    * Determinism: weights are cast to DECIMAL(18,6) and summed exactly
    * (order-free), then ONE cast to double before the division — so the
    * score is bit-identical across engines and partitionings, unlike a
    * double-summed pool whose value depends on aggregation order.
    *
    * Contract: `weights` has one row per term (duplicate terms would
    * multiply matched tokens through the join). Weight magnitudes must fit
    * DECIMAL(18,6); exported model weights are O(1) floats, so the cast is
    * lossless at 6 decimals of precision or rounds deterministically
    * (half-up) beyond.
    *
    * Scale shape: a narrow token explode riding the scan, a BROADCAST hash
    * join against the weight table (exported vocabularies are bounded — a
    * few million rows of (term, double) — by model construction, not by
    * hope), then one map-side-combining groupBy on the id. No windows, no
    * doc×doc, no driver collect; 100 TB of documents is just more
    * partitions probing the same broadcast.
    */
  def linearScore(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, termCol: String = "term", weightCol: String = "weight",
      bias: Double = 0.0): DataFrame = {
    val w = weights.select(
      col(termCol).as("_t"),
      col(weightCol).cast(DecimalType(18, 6)).as("_w"))
    df.select(col(idCol), explode(wsTokens(col(textCol))).as("_t"))
      .join(broadcast(w), Seq("_t"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        count(col("_w")).cast("long").as("n_hits"),
        (lit(bias) +
          coalesce(sum(col("_w")).cast("double"), lit(0.0)) /
            count(lit(1)).cast("double")).as("score"))
  }

  /** Score documents against an EXPORTED n-gram language model — the
    * trained-artifact twin of [[linearScore]] for t8's self-trained
    * mechanism: a curation pipeline ships its KenLM-style model as
    * (bigram, logp) + (word, logp) tables and gates on the mean log-prob.
    * Per word-bigram of the document, the log-prob is the first hit of
    *
    *   bigram table  →  unigram table (second word) + `backoffLogp`  →
    *   `oovLogp`
    *
    * — stupid-backoff shape with caller-supplied penalties. The score is
    * (Σ logp) / n_bigrams; documents with fewer than two tokens have no
    * bigrams and are ABSENT from the output (callers outer-join and decide
    * their fate — a gate usually drops them anyway).
    *
    * Determinism: the caller's logp values cast to DECIMAL(18,6), the
    * backoff addition and the sum stay decimal-exact (order-free), ONE
    * cast to double before the division — no transcendentals anywhere in
    * the engine (the caller took the logs at export time), so the score is
    * bit-identical across engines. Actual perplexity is `exp(-avg_logp)`
    * — a display transform, deliberately left to the caller.
    *
    * Scale shape: narrow bigram explode riding the scan
    * ([[bigramsAll]] — native shingles, not an interpreted lambda), two
    * BROADCAST joins (exported LM tables are bounded by model size), one
    * map-side-combining groupBy on the id. 100 TB = more partitions
    * probing the same broadcasts.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
      bigrams: DataFrame, unigrams: DataFrame,
      oovLogp: Double, backoffLogp: Double = 0.0,
      bigramCol: String = "bigram", wordCol: String = "word",
      logpCol: String = "logp"): DataFrame = {
    val bt = broadcast(bigrams.select(
      col(bigramCol).as("_bg"), col(logpCol).cast(DecimalType(18, 6)).as("_blp")))
    val ut = broadcast(unigrams.select(
      col(wordCol).as("_w2"), col(logpCol).cast(DecimalType(18, 6)).as("_ulp")))
    df.select(col(idCol), explode(bigramsAll(col(textCol))).as("_bg"))
      .join(bt, Seq("_bg"), "left")
      .withColumn("_w2", substring_index(col("_bg"), " ", -1))
      .join(ut, Seq("_w2"), "left")
      .withColumn("_lp", coalesce(
        col("_blp"),
        col("_ulp") + lit(BigDecimal(backoffLogp).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .cast(DecimalType(18, 6)),
        lit(BigDecimal(oovLogp).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .cast(DecimalType(18, 6))))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        count(col("_blp")).cast("long").as("n_hits"),
        (sum(col("_lp")).cast("double") / count(lit(1)).cast("double")).as("avg_logp"))
  }

  /** Train the stupid-backoff bigram LM [[lmScore]] consumes — the
    * IN-ENGINE half of the CCNet workflow (train a reference LM on an
    * in-domain slice, score everything else by how well it fits): returns
    * `(bigrams(bigram, logp), unigrams(word, logp))` ready to pass to
    * [[lmScore]] with `backoffLogp = ln(α)` (Brants et al.'s stupid
    * backoff, α = 0.4 canonically — the score S(w2|w1) = C(w1w2)/C(w1·)
    * when the bigram was seen, else α·C(w2)/N, unnormalized by design;
    * at web scale the unnormalized backoff is indistinguishable from
    * Kneser-Ney for ranking/filtering and needs only counts).
    *
    *   bigram logp  = ln(C(w1 w2) / C(w1 ·))   C(w1 ·) = Σ bigrams from w1
    *   unigram logp = ln(C(w) / N)             N = total reference tokens
    *
    * `minCount` prunes bigrams below a count floor (the standard model-size
    * cap — pruned mass falls through to the backoff leg [[lmScore]] already
    * charges), keeping the bigram table broadcastable no matter how large
    * the reference corpus grows: model size is bounded by the KEPT vocab,
    * not the corpus.
    *
    * Determinism: counts are exact integers in any engine; logp is one ln
    * of a ratio of integers in IEEE double (cross-engine ulp-stable, the
    * t8 precedent), rounded ONCE to DECIMAL(18,6) inside [[lmScore]].
    *
    * Scale shape: one bigram explode riding the scan into a map-side-
    * combining groupBy; C(w1 ·) aggregates the already-model-sized count
    * table (not the corpus) and N is a 1-row broadcast cross join — the
    * corpus is read once, everything downstream is model-sized.
    */
  def lmTrain(df: DataFrame, textCol: String, minCount: Int = 1)
      : (DataFrame, DataFrame) = {
    val bg = df.select(explode(bigramsAll(col(textCol))).as("bigram"))
    val c2 = bg.groupBy(col("bigram")).agg(count(lit(1)).as("_c2"))
      .withColumn("_w1", substring_index(col("bigram"), " ", 1))
    val c1 = c2.groupBy(col("_w1")).agg(sum(col("_c2")).as("_c1"))
    val bigrams = c2.join(c1, Seq("_w1"))
      .where(col("_c2") >= minCount)
      .select(col("bigram"),
        log(col("_c2").cast("double") / col("_c1").cast("double")).as("logp"))
    val uc = df.select(explode(wsTokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("_c"))
    val unigrams = uc.crossJoin(broadcast(uc.agg(sum(col("_c")).as("_n"))))
      .select(col("word"),
        log(col("_c").cast("double") / col("_n").cast("double")).as("logp"))
    (bigrams, unigrams)
  }

  /** Train the multinomial Naive Bayes weights [[linearScore]] consumes —
    * the IN-ENGINE half of the seed-labeled quality-classifier workflow
    * (label a seed slice with cheap heuristics or metadata, train, score
    * the whole corpus — the fastText/DCLM recipe t14/t15 only LOAD the
    * exported artifact of). Returns the `(term, weight)` table plus the
    * log-prior bias, ready to pass to [[linearScore]]:
    *
    *   weight(t) = ln((c⁺(t)+1)/(N⁺+V)) − ln((c⁻(t)+1)/(N⁻+V))   (add-1)
    *   bias      = ln(n⁺/n⁻)                                  (doc prior)
    *
    * [[linearScore]] mean-pools (bias + Σ weight / n_tokens), so the score
    * is the LENGTH-NORMALIZED NB log-odds — the standard curation variant
    * (raw NB log-odds grow linearly with length, which would gate on
    * document size, not quality). OOV terms at scoring time contribute 0
    * via the left join: unseen evidence moves nothing.
    *
    * Determinism: all counts exact integers; each weight is two ln of
    * integer ratios in IEEE double, rounded ONCE to DECIMAL(18,6) inside
    * [[linearScore]]. The only driver materialization is the two class
    * doc-counts behind `bias` — one 2-column row, geometry-bounded.
    *
    * Scale shape: one token explode into a map-side-combining groupBy on
    * term (the model table, vocab-sized); totals are a 1-row broadcast
    * cross join. Both classes must be non-empty — enforced, because an
    * empty class makes the prior undefined rather than silently ±∞.
    */
  def nbTrain(df: DataFrame, textCol: String, labelCol: String)
      : (DataFrame, Double) = {
    val y = col(labelCol)
    val tc = df.select(y.as("_y"), explode(wsTokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(
        sum(when(col("_y"), 1L).otherwise(0L)).as("_c1"),
        sum(when(col("_y"), 0L).otherwise(1L)).as("_c0"))
    val tot = tc.agg(sum(col("_c1")).as("_n1"), sum(col("_c0")).as("_n0"),
      count(lit(1)).as("_v"))
    val weights = tc.crossJoin(broadcast(tot)).select(col("term"),
      (log((col("_c1") + 1).cast("double") / (col("_n1") + col("_v")).cast("double")) -
        log((col("_c0") + 1).cast("double") / (col("_n0") + col("_v")).cast("double")))
        .as("weight"))
    val prior = df.agg(
      sum(when(y, 1L).otherwise(0L)).as("np"),
      sum(when(y, 0L).otherwise(1L)).as("nn")).collect()(0)
    val (np, nn) = (prior.getLong(0), prior.getLong(1))
    require(np > 0 && nn > 0,
      s"nbTrain needs both classes non-empty (got $np positive / $nn negative)")
    (weights, math.log(np.toDouble / nn.toDouble))
  }

  /** Canonical form for fingerprinting: lowercase, whitespace collapsed. */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** md5 content fingerprint of the normalized text. */
  def fingerprintMd5(c: Column): Column = md5(normalized(c))

  /** Polynomial rolling hash over the normalized text's character codes:
    * left fold h = (h*31 + code) mod 1e9+7, seeded with the first code
    * (DuckDB `list_reduce` semantics so the oracle matches). Values stay
    * < 2^35 — no overflow in either engine.
    */
  def fingerprintRolling(c: Column): Column = {
    val codes = transform(
      filter(split(normalized(c), ""), ch => length(ch) > 0),
      ch => ascii(ch).cast("long"))
    aggregate(
      slice(codes, lit(2), greatest(size(codes) - 1, lit(0))),
      element_at(codes, 1),
      (acc, x) => (acc * 31 + x) % 1000000007L)
  }
}
