package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (extension tier,
  * BASELINE.json north star): language ID, quality scoring, token
  * counting, fingerprinting.
  *
  * Everything is pure Catalyst expressions (`split`/`filter`/`aggregate`/
  * `regexp_*` — whole-stage codegen, no UDFs), so each operator is a
  * narrow per-row map: embarrassingly parallel, no shuffle, scales
  * linearly to any corpus size and pushes column pruning down to the scan.
  */
object TextAnalysis {

  /** Lower-cased whitespace tokens, empties removed. */
  def tokens(text: Column): Column = rawTokens(lower(text))

  /** [[tokens]] WITHOUT the case fold — the ONE canonical whitespace
    * tokenization ([[tokens]] is defined as rawTokens∘lower, so the
    * position alignment the excision reassembly relies on is
    * structural, not argued; [[Chunking.rawTokens]] delegates here
    * too). For operators that MATCH case-insensitively but must
    * REASSEMBLE the original text ([[exciseDupSpans]]). */
  def rawTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy count: GPT-2-style pre-tokenizer regex —
    * contractions, letter runs, digit runs, punctuation runs (each with
    * optional leading space). A cheap, deterministic stand-in for a real
    * tokenizer's token count. */
  val BpeishPattern = "'s|'t|'re|'ve|'m|'ll|'d| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Small English function-word list for quality/langid scoring. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
      "for", "on", "with", "as", "at", "by", "it", "this", "that")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Per-document quality metrics (length / punctuation / stopword /
    * digit ratios + a composite score). All ratios are exact integer
    * divisions — deterministic across engines. */
  def qualityMetrics(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    df.withColumn("char_len", length(t))
      .withColumn("word_cnt", size(toks))
      .withColumn("punct_cnt", size(regexp_extract_all(t, lit("[\\p{Punct}]"), lit(0))))
      .withColumn("digit_cnt", size(regexp_extract_all(t, lit("[0-9]"), lit(0))))
      .withColumn("stopword_cnt", countIn(toks, EnStopwords))
      .withColumn("stopword_ratio",
        col("stopword_cnt").cast("double") / greatest(col("word_cnt"), lit(1)))
      .withColumn("punct_ratio",
        col("punct_cnt").cast("double") / greatest(col("char_len"), lit(1)))
      .withColumn("avg_word_len",
        (col("char_len") - col("word_cnt") + 1).cast("double") / greatest(col("word_cnt"), lit(1)))
  }

  /** Language-ID profiles: tiny function-word lists + script ranges.
    * A heuristic n-gram/stopword scorer, not a trained model. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> EnStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "auf", "für"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "no", "un", "una", "de", "en", "que", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "ne", "un", "une", "de", "en", "que", "pour", "dans"),
    "it" -> Seq("il", "la", "le", "e", "è", "non", "un", "una", "di", "in", "che", "per", "con"))

  /** Predict a language per row: score = matching function words per
    * profile (ties broken by profile order); CJK/Cyrillic/Arabic script
    * presence short-circuits. Returns df + `lang_pred`, `lang_score`. */
  def languageId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = LangProfiles.toSeq.map { case (lang, words) =>
      struct(countIn(toks, words).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    val scripted =
      when(col(textCol).rlike("[\\u4e00-\\u9fff]"), struct(lit(1000).as("score"), lit("zh").as("lang")))
        .when(col(textCol).rlike("[\\u3040-\\u30ff]"), struct(lit(1000).as("score"), lit("ja").as("lang")))
        .when(col(textCol).rlike("[\\u0400-\\u04ff]"), struct(lit(1000).as("score"), lit("ru").as("lang")))
        .when(col(textCol).rlike("[\\u0600-\\u06ff]"), struct(lit(1000).as("score"), lit("ar").as("lang")))
        .otherwise(best)
    df.withColumn("lang_pred", scripted.getField("lang"))
      .withColumn("lang_score", scripted.getField("score"))
  }

  /** Raw-web text extraction patterns (shared verbatim with the t29
    * DuckDB oracle, which interpolates these constants — one source of
    * truth for both engines). All RE2-safe: inline `(?is)` flags,
    * non-greedy `.*?`, no lookaround/backrefs, so java.util.regex
    * (Spark codegen) and RE2-family engines match identically. */
  val ScriptBlock = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  val StyleBlock = "(?is)<style\\b[^>]*>.*?</style\\s*>"
  val CommentBlock = "(?s)<!--.*?-->"
  val CdataBlock = "(?s)<!\\[CDATA\\[(.*?)\\]\\]>"
  val AnyTag = "<[^>]*>"

  /** Common HTML entities, decoded with LITERAL replace (cross-engine
    * exact) in this order — `&amp;` LAST, so double-escaped text like
    * `&amp;lt;` decodes exactly one level per pass (`&lt;`), matching
    * single-pass HTML semantics. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&#39;" -> "'", "&#34;" -> "\"", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Raw-web text extraction: strip HTML/XML markup down to visible
    * text — the step BEFORE every other text operator in a real
    * pretraining pipeline (CCNet/RefinedWeb presume extracted input;
    * cf. reference scope in SURVEY §2 — this is extension tier).
    *
    * Chain (order is load-bearing):
    *   1. `<script>`/`<style>` blocks removed WHOLE (their content is
    *      code — tags/comments inside them must not leak as text);
    *   2. comments `<!-- … -->` removed;
    *   3. CDATA sections unwrapped (content kept — but see deviation);
    *   4. every remaining tag replaced by a SPACE (block tags are word
    *      boundaries: `<p>a</p><p>b</p>` reads "a b", never "ab");
    *   5. [[Entities]] decoded (after tag-strip, so a decoded `<` is
    *      never re-parsed as markup);
    *   6. whitespace collapsed to single spaces, trimmed.
    *
    * Pure per-row `regexp_replace`/`replace`: whole-stage codegen, no
    * shuffle — extracting 100 TB is one pass over the scan with column
    * pruning intact.
    *
    * Documented conservative deviations (spec-pinned): CDATA content is
    * unwrapped BEFORE tag-stripping, so markup-like text inside CDATA
    * is also stripped (strict XML would preserve it verbatim); an
    * unclosed comment/script loses only its tags (HTML5 would swallow
    * to EOF); a bare `<` with no subsequent `>` passes through. */
  def extractText(html: Column): Column = {
    val noBlocks = Seq(ScriptBlock, StyleBlock, CommentBlock)
      .foldLeft(html)((c, p) => regexp_replace(c, p, " "))
    val unwrapped = regexp_replace(noBlocks, CdataBlock, "$1")
    val noTags = regexp_replace(unwrapped, AnyTag, " ")
    val decoded = Entities.foldLeft(noTags) {
      case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Canonical text form for fingerprinting: lower-case, collapse
    * whitespace, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Aggressive dedup-normalization (the CCNet/RefinedWeb-style key for
    * hashing): ASCII lower-case, strip ASCII punctuation, collapse
    * whitespace, trim — so "Hello, World!" and "hello world" hash
    * identically. Case folds via `translate` (ASCII-only), NOT `lower()`:
    * Java's full case mapping (İ→i+U+0307) and utf8proc engines (İ→i)
    * disagree on non-ASCII, and a dedup KEY needs cross-engine/cross-run
    * determinism more than linguistic folding — non-ASCII passes through
    * verbatim. `\p{Punct}` and RE2's `[[:punct:]]` name the same ASCII
    * set (the t02 oracle already relies on this pairing), so an external
    * engine reproduces the key exactly on any text. */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      translate(text, AsciiUpper, AsciiLower), "[\\p{Punct}]", " "), "\\s+", " "))

  /** ASCII alphabet pair for engine-independent case folding. */
  val AsciiLower = "abcdefghijklmnopqrstuvwxyz"
  val AsciiUpper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"

  /** Zero-width and direction-control codepoints an adversarial web
    * corpus stuffs into text to defeat hash-keyed dedup: soft hyphen,
    * ZWSP/ZWNJ/ZWJ, LRM/RLM, bidi embeddings/overrides/isolates, word
    * joiner, BOM-as-ZWNBSP. Removed outright by [[foldConfusables]] —
    * they carry no visible content. All BMP codepoints, written as a
    * literal character class (identical bytes in java.util.regex and
    * RE2-family engines — the t29 literal-pattern rule). */
  val ZeroWidthChars: String =
    "\u00AD\u200B\u200C\u200D\u200E\u200F" + // shy, ZWSP/ZWNJ/ZWJ, LRM/RLM
      "\u202A\u202B\u202C\u202D\u202E" + // bidi embeddings/overrides + pop
      "\u2060\u2066\u2067\u2068\u2069" + // word joiner, bidi isolates + pop
      "\uFEFF" // BOM as ZWNBSP

  /** Single-codepoint -> single-codepoint confusable fold table, applied
    * by ONE `translate` (codepoint-aware in both Spark and DuckDB --
    * probe-verified on full-width/NBSP/ideographic-space inputs):
    * space-family codepoints -> ASCII space, the full-width ASCII block
    * U+FF01-U+FF5E -> its ASCII originals, curly/angled quotes ->
    * ASCII quotes, dash/minus family -> `-`, fraction slash -> `/`,
    * ideographic full stop -> `.`. */
  val ConfusableFrom: String =
    "\u00A0\u1680" + (0x2000 to 0x200A).map(_.toChar).mkString +
      "\u202F\u205F\u3000" + // space family (16 codepoints total)
      (0xFF01 to 0xFF5E).map(_.toChar).mkString + // full-width ASCII block
      "\u2018\u2019\u201A\u201B\u2032" + // single quotes / prime
      "\u201C\u201D\u201E\u201F\u2033" + // double quotes / double prime
      "\u2010\u2011\u2012\u2013\u2014\u2015\u2212" + // hyphen/dash/minus
      "\u2044\u3002" // fraction slash, ideographic full stop
  val ConfusableTo: String =
    " " * 16 +
      (0x21 to 0x7E).map(_.toChar).mkString +
      "'''''" + "\"\"\"\"\"" + "-------" + "/."

  /** Multi-codepoint compatibility expansions (a `translate` cannot grow
    * a character): the Latin ligature block U+FB00-U+FB06 and horizontal
    * ellipsis, decoded with LITERAL `replace` (cross-engine exact, the
    * [[Entities]] precedent). */
  val LigatureFolds: Seq[(String, String)] = Seq(
    "\uFB00" -> "ff", "\uFB01" -> "fi", "\uFB02" -> "fl",
    "\uFB03" -> "ffi", "\uFB04" -> "ffl", "\uFB05" -> "st",
    "\uFB06" -> "st", "\u2026" -> "...")

  /** Unicode confusable/zero-width folding for dedup keys — the layer
    * BEFORE [[normalizeForDedup]] when the corpus is adversarial web
    * text: `ﬁle` vs `file`, full-width `ｗｏｒｄ`, U+200B stuffing and
    * NBSP substitution all defeat a byte-keyed normalization today
    * (they are DIFFERENT bytes that render identically). Full NFKC is
    * explicitly out of scope (not expressible as a cross-engine literal
    * chain); this folds the high-frequency confusable classes:
    *
    *   1. [[ZeroWidthChars]] removed (one literal-class regex),
    *   2. [[ConfusableFrom]] → [[ConfusableTo]] (one codepoint
    *      `translate`: spaces, full-width block, quotes, dashes),
    *   3. [[LigatureFolds]] expanded (literal `replace` chain).
    *
    * Order is load-bearing: zero-width removal first (a ZWSP between
    * full-width letters must not survive as a word break), ligatures
    * last (their expansions are plain ASCII the earlier steps never
    * touch). Idempotent: every output codepoint is a fixed point of
    * the chain (spec-pinned). Pure per-row codegen — no shuffle, scales
    * like every other normalization. Cross-engine: the identical chain
    * replays in DuckDB with literal interpolation of these constants
    * (translate codepoint-awareness probe-verified; the d15 oracle). */
  def foldConfusables(text: Column): Column = {
    val deZeroed = regexp_replace(text, "[" + ZeroWidthChars + "]", "")
    val mapped = translate(deZeroed, ConfusableFrom, ConfusableTo)
    LigatureFolds.foldLeft(mapped) {
      case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /** CCNet-style PARAGRAPH-level dedup — the granularity real web
    * pipelines dedup at (boilerplate repeats across pages even when no
    * two full documents match): split each document into paragraphs
    * (`sepRe` runs, blank paragraphs dropped), keep a paragraph only at
    * its FIRST occurrence corpus-wide — ordered by `(idCol, position)`,
    * keyed on the md5 digest of [[normalizeForDedup]] so near-identical
    * whitespace/case/punctuation variants collapse — and reassemble
    * each document from its kept paragraphs (original text, original
    * order, canonical "\n\n" separators). Returns
    * `(idCol, textCol, n_paras, n_kept)`; a document whose every
    * paragraph was seen earlier keeps its row with empty text.
    *
    * Shape at 100 TB: one paragraph explode (narrow rows) → one shuffle
    * on the fixed-width digest for the first-occurrence window → one
    * doc-keyed shuffle to reassemble. No self-join, no corpus×corpus
    * anything; both shuffles carry each paragraph exactly once.
    * `idCol` must be unique (it breaks first-occurrence ties);
    * documents with no non-blank paragraphs are dropped. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      sepRe: String = "\\n{2,}"): DataFrame = {
    val paras = df
      .select(col(idCol),
        posexplode(split(col(textCol), sepRe)).as(Seq("__pos", "__p")))
      .filter(length(trim(col("__p"))) > 0)
    val w = Window.partitionBy(col("__key")).orderBy(col(idCol), col("__pos"))
    paras
      .withColumn("__key", md5(normalizeForDedup(col("__p")).cast("binary")))
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(
        concat_ws("\n\n", transform(array_sort(collect_list(
          when(col("__rn") === 1, struct(col("__pos"), col("__p"))))),
          s => s.getField("__p"))).as(textCol),
        count(lit(1)).as("n_paras"),
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"))
  }

  /** Exact-content fingerprint (md5 of normalized text). */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** Rolling-hash-style robust fingerprint: min xxhash64 over character
    * n-gram shingles of the normalized text (winnowing's min-sampling with
    * window = whole doc). Near-identical docs collide with high
    * probability; any single-char edit far from the minimum shingle keeps
    * the fingerprint stable. */
  def fingerprintShingleMin(text: Column, n: Int = 8): Column = {
    val shingles = Dedup.charShingles(normalized(text), n)
    array_min(transform(shingles, s => xxhash64(s)))
  }

  /** Document frequency per distinct lower-cased token — the vocabulary
    * statistic behind rare-token filters, stopword discovery, and IDF.
    * One explode + one hash aggregation (map-side combine); at 100 TB the
    * shuffle carries (term, partial-count) rows only. */
  def documentFrequency(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(array_distinct(tokens(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))

  /** Repetition metrics (Gopher-style quality filters): per-doc duplicate-
    * line fraction and the share of word 2-grams taken by the single most
    * repeated 2-gram — the two signals that catch boilerplate/spam docs.
    * Formulated relationally (explode → two hash aggregations keyed on
    * (doc, gram) then doc) so the per-gram counting distributes with
    * map-side combine instead of sorting arrays per row. */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => length(l) > 0)
    val lineStats = df.select(col(idCol).as("doc_id"),
        size(lines).as("n_lines"), size(array_distinct(lines)).as("n_distinct"))
      .withColumn("dup_line_ratio",
        (col("n_lines") - col("n_distinct")).cast("double") / greatest(col("n_lines"), lit(1)))
      .select(col("doc_id"), col("n_lines"), col("dup_line_ratio"))
    // token array bound ONCE — referencing tokens(t) inside the transform
    // lambda would re-tokenize the whole text per 2-gram element (the
    // higher-order-function CSE blocker; measured 5-6× on shingling)
    val gramsArr = Dedup.bindOnce(tokens(t)) { tk =>
      when(size(tk) < 2, array(concat_ws(" ", tk)))
        .otherwise(transform(sequence(lit(0), size(tk) - 2),
          i => concat_ws(" ", slice(tk, i + 1, lit(2)))))
    }
    val grams = df.select(col(idCol).as("doc_id"), explode(gramsArr).as("gram"))
    val gramStats = grams.groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("total"), max(col("c")).as("mx"))
      .select(col("doc_id"),
        (col("mx").cast("double") / col("total")).as("top_gram_frac"))
    lineStats.join(gramStats, Seq("doc_id"))
  }

  /** Adjacent-bigram struct array of `textCol`'s tokens — bound once
    * (the HOF-CSE trap); shared by [[bigramPlausibility]] and
    * [[collocations]] so the two gram definitions cannot drift. */
  private def bigramStructs(textCol: String): Column =
    Dedup.bindOnce(tokens(col(textCol))) { tk =>
      when(size(tk) < 2, array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(transform(sequence(lit(0), size(tk) - 2),
          i => struct(element_at(tk, i + 1).as("w1"), element_at(tk, i + 2).as("w2"))))
    }

  /** Corpus-LM plausibility score (CCNet-style quality signal without an
    * external model): the corpus itself is the language model — per-doc
    * mean conditional bigram probability P(w2|w1) = C(w1 w2) / C(w1·),
    * where counts come from the whole corpus. Docs full of unusual word
    * transitions (spam, boilerplate keyword stuffing, wrong-language
    * fragments) score low; fluent in-distribution text scores high.
    *
    * Relational shape: one explode into (doc, w1, w2); bigram and
    * first-position-unigram counts are hash aggregates of that same
    * table (map-side combine); the probability join is keyed on the
    * bigram/unigram — all narrow rows. Probabilities are exact rational
    * doubles summed as DECIMAL(18,12), so the score is order-independent
    * and cross-engine reproducible. Returns (doc_id, n_bigrams, plaus).
    */
  def bigramPlausibility(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // ONE corpus tokenization: the per-(doc, bigram) multiplicity table
    // is cut (it feeds the corpus-count derivation AND the scoring
    // join), corpus counts derive from it, and the leading-word counts
    // derive from the bigram counts (c1 = Σ_w2 c12 — identical to
    // counting w1 occurrences among grams). The previous shape
    // referenced the raw gram explode from three branches, so the
    // tokenize+explode pass executed three times. Scoring weights each
    // distinct (doc, bigram) row by its multiplicity n — a DECIMAL
    // p·n is exactly p summed n times, so psum (and the output double)
    // is bit-identical to the per-instance sum.
    val tgd = Lineage.cut(
      df.select(col(idCol).as("doc_id"), explode(bigramStructs(textCol)).as("g"))
        .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
        .groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("n")))
    val bigramCnt = Lineage.cut(
      tgd.groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("c12")))
    val unigramCnt = bigramCnt.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    tgd.join(bigramCnt, Seq("w1", "w2")).join(unigramCnt, Seq("w1"))
      .withColumn("p", (col("c12").cast("double") / col("c1").cast("double"))
        .cast("decimal(18,12)"))
      .groupBy(col("doc_id"))
      // n as DECIMAL(18,0): a raw LONG multiplicand makes the product
      // decimal(39,12), which Spark trims to precision 38 by CUTTING
      // SCALE (rounds p·n at the 11th dp — caught live by the oracle);
      // (18,12)×(18,0) stays at (37,12), exact
      .agg(sum(col("n")).as("n_bigrams"),
        sum(col("p") * col("n").cast("decimal(18,0)")).as("psum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("psum").cast("double") / col("n_bigrams").cast("double")).as("plaus"))
  }

  /** Collocation mining: adjacent bigrams ranked by integer-scaled
    * LIFT — `lift_ppm = round(c12·Nu²·10⁶ / (Nb·c1·c2))`, the
    * log-free PMI surrogate (same ordering as PMI; transcendental-free,
    * so DuckDB replays it bitwise via the round(x·scale) stable
    * conversion on a rational of exact longs with a PINNED evaluation
    * tree — the r3 shape rule). `c12` = bigram count, `c1`/`c2` =
    * unigram counts, `Nu`/`Nb` = unigram/bigram totals.
    *
    * Shape: two narrow hash aggregates (grams, unigrams), two
    * broadcast-able joins of the ≥`minCount` bigram table against the
    * unigram counts, totals as TWO 1-row broadcast rows (the benign t08
    * scalar-subquery shape). `minCount` is the noise floor — lift on a
    * hapax bigram is meaningless and the filter keeps the joined frame
    * vocabulary-sized, not corpus-sized.
    *
    * @return (w1, w2, c12, lift_ppm) */
  def collocations(df: DataFrame, textCol: String,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"collocations minCount must be >= 1, got $minCount")
    val grams = df.select(explode(bigramStructs(textCol)).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
    val uni = df.select(explode(tokens(col(textCol))).as("w"))
    // cut: each count table feeds BOTH a join side and its total —
    // materializing the vocabulary-sized aggregates pins the corpus
    // tokenization at exactly two passes (grams + unigrams)
    val cu = Lineage.cut(uni.groupBy(col("w")).agg(count(lit(1)).as("c")))
    val c12 = Lineage.cut(
      grams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
    c12.filter(col("c12") >= minCount)
      .join(cu.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(cu.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      // totals derived from the ALREADY-AGGREGATED count tables — the
      // corpus is tokenized twice (grams + unigrams), not four times
      .crossJoin(broadcast(cu.agg(sum(col("c")).as("nu"))))
      .crossJoin(broadcast(c12.agg(sum(col("c12")).as("nb"))))
      .select(col("w1"), col("w2"), col("c12"),
        round(col("c12").cast("double") * col("nu") * col("nu") * lit(1000000.0)
          / (col("nb").cast("double") * col("c1") * col("c2")))
          .cast("long").as("lift_ppm"))
  }

  /** Exact-substring decontamination (train/test overlap): documents
    * containing any probe string. AVOIDS the docs × probes nested loop:
    * a document containing a probe necessarily contains the probe's
    * first word-n-gram, so that shingle is an equi-join key against the
    * docs' exploded shingle sets; only the candidates are verified with
    * `instr` on whitespace-normalized text. Probes are broadcast (they
    * are benchmark suites — small by nature); candidate volume ≈ docs
    * sharing a probe's opening n-gram, not the cross product. */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeIdCol: String, probeCol: String, n: Int = 3): DataFrame = {
    // a probe with fewer than n tokens has no n-gram: its whole-probe
    // shingle can never equal a doc's n-gram join key, so its matches
    // would be dropped SILENTLY — reject loudly instead (probes are a
    // small benchmark set, so this eager check is one tiny job)
    val short = probes
      .filter(size(tokens(col(probeCol))) < n)
      .select(col(probeIdCol)).limit(3).collect()
    require(short.isEmpty,
      s"probes with fewer than n=$n tokens can never match via the n-gram join key " +
        s"(e.g. probe id ${short.headOption.map(_.get(0)).orNull}); lower n or drop them")
    val d = docs.select(col(idCol).as("doc_id"), normalized(col(textCol)).as("norm_text"))
      .withColumn("shingle", explode(Dedup.textShingles(col("norm_text"), n)))
    val p = probes.select(col(probeIdCol).as("probe_id"),
        normalized(col(probeCol)).as("probe"))
      .withColumn("shingle", element_at(Dedup.textShingles(col("probe"), n), 1))
    d.join(broadcast(p), Seq("shingle"))
      .filter(instr(col("norm_text"), col("probe")) > 0)
      .select(col("probe_id"), col("doc_id"))
  }

  /** Benchmark decontamination screen at n-gram granularity — the
    * GPT-3/Gopher recipe: build a Bloom filter over the benchmark set's
    * word n-grams ONCE, then score every training document by the
    * fraction of its distinct n-grams the filter may contain.
    * `(doc_id, n_grams, n_hit, flagged)` with
    * `flagged ⇔ n_hit ≥ flagFrac·n_grams`. [[contaminated]] answers
    * "which docs contain this exact probe span"; this answers the
    * doc-level "how much of this doc overlaps the benchmark AT ALL" —
    * the screen real pretraining pipelines run before a release.
    *
    * One-sided like every screen in the tier: Bloom has NO false
    * negatives, so `n_hit` never undercounts the true overlap and
    * `flagged` never misses a truly-contaminated doc at the threshold;
    * collision false positives can only over-flag (rate set by
    * `numBits`, observable in-gate against the exact hit count).
    *
    * Scale shape: the benchmark pass happens once into a BOUNDED
    * artifact (numBits/63 long words) that is collected and inlined as
    * a literal bitmap, so membership is a pure per-row codegen
    * expression over the training gram stream — the corpus is scanned
    * ONCE and the only shuffle is the final per-doc hash aggregation
    * (map-side combined). The previous shape deduped the gram stream
    * and joined hits back (two extra full-width exchanges of the gram
    * strings plus a second scan); the bit positions are decomposed by
    * the exact [[graft.ops.Sketch.cmBucket]] chain the Bloom build
    * uses, so `may_contain` (and every downstream count) is
    * bit-identical to the join form. */
  def ngramOverlapScreen(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 5,
      numBits: Int = 1 << 16, numHashes: Int = 4,
      flagFrac: Double = 0.5): DataFrame = {
    require(n >= 1 && flagFrac >= 0.0, s"ngramOverlapScreen: n=$n flagFrac=$flagFrac")
    // The inlined-literal path holds numBits/63 longs in the driver AND in
    // every task's serialized plan — fine at the default 2^16 bits (~8 KB),
    // unbounded at caller-controlled sizes (2^30 would be a ~17M-element
    // per-task literal). Cap it where the literal stays plan-cheap (2^24 ≈
    // 2 MB); a benchmark set needing more bits should go through
    // [[Sketch.writeBloomIndex]] + the join form instead.
    require(numBits >= 1 && numBits <= (1 << 24),
      s"ngramOverlapScreen: numBits=$numBits exceeds the inlined-bitmap bound 2^24; " +
        "use Sketch.writeBloomIndex + a join for larger filters")
    val bg = bench.filter(col(benchTextCol).isNotNull)
      .select(lit("b").as("k"),
        explode(Dedup.wordShingles(tokens(col(benchTextCol)), n)).as("g"))
    // bounded collect: ≤ numBits/63 rows regardless of benchmark size
    val words = new Array[Long]((numBits + 62) / 63)
    Sketch.bloomSketch(bg, "k", "g", numBits, numHashes).collect()
      .foreach(r => words(r.getAs[Int]("word_idx")) = r.getAs[Long]("bits"))
    val wordsLit = typedlit(words.toSeq)
    // same decomposition as the build path's bloomBits: pos → word/bit
    // via the identical (pos/63, pos%63) casts
    val mayContain = (0 until numHashes).map { i =>
      val pos = Sketch.cmBucket(col("g"), i, numBits)
      element_at(wordsLit, (pos / 63).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (pos % 63).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)
    train.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(Dedup.wordShingles(tokens(col(textCol)), n)).as("g"))
      .withColumn("__hit", mayContain)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_hit"))
      .withColumn("flagged", col("n_hit").cast("double") >=
        lit(flagFrac) * col("n_grams").cast("double"))
  }

  /** Corpus composition report for mixture planning: per domain (source,
    * language, …) the document count, total whitespace-token count, the
    * domain's share of all tokens, and the cumulative share walking
    * domains largest-first — the table you read before choosing
    * [[graft.ops.Sampling.mixtureByHash]] fractions.
    *
    * The heavy pass is a hash aggregation with map-side combine (one
    * shuffle of #domains tiny rows); the share windows then run over
    * ONE row per domain — a driver-sized frame at any corpus scale, so
    * the unpartitioned window is not a scale risk. Shares are single
    * double divisions of exact BIGINT sums (deterministic across engines
    * and partitionings); the cumulative sum is taken on the exact counts
    * BEFORE the one division. */
  def corpusComposition(df: DataFrame, domainCol: String,
      textCol: String = "text"): DataFrame = {
    val agg = df.groupBy(col(domainCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    // unique ordering (domain tie-break) so RANGE/ROWS frames agree
    val cum = Window.orderBy(col("n_tokens").desc, col(domainCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    agg
      .withColumn("token_share",
        col("n_tokens").cast("double") / sum("n_tokens").over(all).cast("double"))
      .withColumn("cum_share",
        sum("n_tokens").over(cum).cast("double") / sum("n_tokens").over(all).cast("double"))
  }

  /** Remove boilerplate LINES — lines whose exact content recurs in at
    * least `minDocs` distinct documents (cookie banners, nav bars,
    * footers: the CCNet/RefinedWeb line-dedup pass). Returns one row
    * per input document: (idCol, clean_text, removed_lines,
    * kept_lines). A document whose every line is boilerplate survives
    * with an empty `clean_text`.
    *
    * Shape at 100 TB: one explode + hash-aggregate over (line-hash)
    * with map-side combine to find frequent lines (narrow 16-byte keys
    * — line text never enters that shuffle), one join of the exploded
    * lines against the frequent set (broadcastable when the frequent
    * set is small — it is, by construction: lines repeated ≥ minDocs
    * times), one per-doc rebuild aggregation. */
  def removeBoilerplateLines(df: DataFrame, idCol: String,
      textCol: String = "text", minDocs: Long = 30): DataFrame = {
    // NULL text → one empty line, so the document still comes back (the
    // "one row per input document" contract); split of NULL would emit
    // no generator rows and silently drop the doc
    val lines = df.select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("pos", "line")))
      .withColumn("lh", md5(col("line")))
    // distinct docs per line content; two-phase (partial distinct) agg
    val frequent = lines.select(col("lh"), col(idCol)).distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("lh"), lit(true).as("bp"))
    lines.join(frequent, Seq("lh"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("bp").isNull,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"),
        sum(when(col("bp").isNotNull, 1L).otherwise(0L)).as("removed_lines"),
        sum(when(col("bp").isNull, 1L).otherwise(0L)).as("kept_lines"))
  }

  /** Top-k most frequent terms per group — heavy hitters per
    * domain/language, the standard corpus-composition drill-down.
    *
    * Shape at 100 TB: explode + one hash aggregate on (group, word)
    * with map-side combine, then a TWO-STAGE per-group top-k (partial
    * rank inside each partition first), so one giant group's vocabulary
    * never funnels into a single sort task — the same guard as
    * [[graft.ops.Similarity.topKPerQuery]]. Ties break
    * lexicographically for determinism. */
  def topTermsPerGroup(df: DataFrame, groupCol: String,
      textCol: String = "text", k: Int = 10): DataFrame = {
    val counts = df
      .select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("word"))
      .groupBy(col("grp"), col("word")).agg(count(lit(1)).as("n"))
    Similarity.topKPerGroup(counts, Seq(col("grp")),
        Seq(col("n").desc, col("word")), k)
      .select(col("grp").as(groupCol), col("rank"), col("word"), col("n"))
  }

  /** Duplicated SPANS: word n-grams appearing in at least `minDocs`
    * distinct documents — the exact-substring cross-document duplication
    * signal (long shared spans = copied passages; n ≈ 8-13 words is the
    * usual training-data-dedup window). Returns
    * (gram, n_docs, first_doc). Per-doc shingles are DISTINCT
    * ([[Dedup.textShingles]] — the fused codegen kernel; a doc shorter
    * than n words contributes its whole text as one span), so a plain
    * count is a document frequency.
    *
    * Shape at 100 TB: explode + one hash aggregate with map-side
    * combine. The gram string must cross the shuffle (it IS the
    * output); partial aggregation collapses per-partition repeats
    * first, and the ≥ minDocs filter makes the result tiny. */
  def duplicatedSpans(df: DataFrame, idCol: String,
      textCol: String = "text", n: Int = 8, minDocs: Long = 2): DataFrame =
    df.select(col(idCol).as("id"),
        explode(Dedup.textShingles(col(textCol), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)

  /** Maximal duplicated SPANS: merge a document's cross-document-
    * duplicated word n-grams ([[duplicatedSpans]]' signal) into maximal
    * copied passages — two duplicated n-grams merge when their token
    * windows overlap or touch (next start ≤ prev start + n). This is
    * the span-level view of exact-substring training-data dedup (Lee
    * et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better"): a long copied passage shows up as ONE
    * (doc, start, end) row instead of end−start−n+2 gram rows, ready
    * for span excision or doc-level length-of-copy filters. Returns
    * (idCol, span_start, span_end, span_tokens, n_dup_grams) in
    * 0-based token positions, span_end inclusive.
    *
    * Shape at 100 TB: one positional-shingle explode; gram strings are
    * md5'd to 16-byte keys immediately, so the document-frequency
    * aggregate and the membership join both shuffle narrow hashes
    * (never gram text). The merge windows partition by document — each
    * partition is one doc's duplicated positions, bounded by doc
    * length, so no skew risk at any corpus size. */
  def maximalDupSpans(df: DataFrame, idCol: String,
      textCol: String = "text", n: Int = 8, minDocs: Long = 2): DataFrame = {
    require(n >= 1, "n must be >= 1")
    // positional n-grams (NOT distinct — positions matter); token array
    // bound once per the HOF-CSE rule
    val posGrams = Dedup.bindOnce(tokens(col(textCol))) { tk =>
      when(size(tk) < n, array().cast("array<struct<pos:int,gh:string>>"))
        .otherwise(transform(sequence(lit(0), size(tk) - n),
          i => struct(i.cast("int").as("pos"),
            md5(concat_ws(" ", slice(tk, i + 1, lit(n)))).as("gh"))))
    }
    val exploded = df.select(col(idCol).as("__id"), explode(posGrams).as("g"))
      .select(col("__id"), col("g.pos").as("pos"), col("g.gh").as("gh"))
    // document frequency on the 16-byte hash; two-phase distinct agg
    val dup = exploded.select(col("gh"), col("__id")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select(col("gh"))
    val marked = exploded.join(dup, Seq("gh")).select(col("__id"), col("pos"))
    val w = Window.partitionBy(col("__id")).orderBy(col("pos"))
    marked
      // new island when this gram's window no longer overlaps/touches
      // the previous one's [lag(pos), lag(pos)+n-1]
      .withColumn("__brk",
        when(col("pos") > lag(col("pos"), 1).over(w) + n, 1).otherwise(0))
      .withColumn("__isl", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__id"), col("__isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1)).as("span_end"),
        count(lit(1)).as("n_dup_grams"))
      .select(col("__id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_dup_grams"))
  }

  /** Exact-substring EXCISION — the removal half of Lee et al. 2022's
    * exact-substring dedup ([[maximalDupSpans]] is the detection
    * half): every token covered by a cross-document-duplicated word
    * n-gram is REMOVED from every document except the gram's keeper
    * (the minimum doc id containing it — "all but one occurrence
    * survives"), and the survivors are reassembled in order. Returns
    * (idCol, clean_text, n_tokens_kept, n_tokens_removed); documents
    * with nothing duplicated pass through with their ORIGINAL-case
    * tokens rejoined by single spaces (matching is case-insensitive —
    * [[tokens]] folds — but reassembly reads the position-aligned
    * [[rawTokens]], so the only rewrite survivors see is whitespace
    * normalization; a reviewer caught the first cut silently
    * lowercasing every document). Intra-document repeats are NOT excised
    * (the duplication signal is distinct-document frequency, matching
    * [[duplicatedSpans]]); a document shorter than n tokens carries no
    * grams and is never cut.
    *
    * CONTRACT: `idCol` must uniquely identify rows AND be non-null
    * (stricter than [[Bpe.encodeViaDict]]'s unique-only contract:
    * every grouping stage here merges on the id, so a duplicate would
    * interleave two documents' token positions and even drive
    * `n_tokens_removed` negative, and a NULL id would silently vanish
    * from every internal equi-join). Duplicate or null ids raise a
    * typed error at execution instead — the duplicate case caught by
    * a ScaleProbe run whose synthetic corpus silently violated its
    * own uniqueness claim.
    *
    * Shape at 100 TB: gram strings are md5'd to 16-byte keys
    * immediately (the [[maximalDupSpans]] move — the document-
    * frequency aggregate and the membership join shuffle narrow
    * hashes, never gram text); the keeper rides the SAME aggregate as
    * the frequency, so no second pass; coverage positions explode to
    * at most n × (duplicated grams) narrow (id, int) rows; the final
    * per-document reassembly groups by document, bounded by document
    * length — no skew risk at any corpus size. */
  def exciseDupSpans(df: DataFrame, idCol: String,
      textCol: String = "text", n: Int = 8, minDocs: Long = 2): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val posGrams = Dedup.bindOnce(tokens(col(textCol))) { tk =>
      when(size(tk) < n, array().cast("array<struct<pos:int,gh:string>>"))
        .otherwise(transform(sequence(lit(0), size(tk) - n),
          i => struct(i.cast("int").as("pos"),
            md5(concat_ws(" ", slice(tk, i + 1, lit(n)))).as("gh"))))
    }
    val grams = df.select(col(idCol).as("__id"), explode(posGrams).as("g"))
      .select(col("__id"), col("g.pos").as("pos"), col("g.gh").as("gh"))
    // distinct-doc frequency + keeper in ONE aggregate over the
    // distinct (gh, id) pairs (no countDistinct two-exchange expansion)
    val dup = grams.select(col("gh"), col("__id")).distinct()
      .groupBy(col("gh"))
      .agg(count(lit(1)).as("nd"), min(col("__id")).as("__keeper"))
      .filter(col("nd") >= minDocs)
      .select(col("gh"), col("__keeper"))
    val marked = grams.join(dup, Seq("gh"))
      .filter(col("__id") =!= col("__keeper"))
    val covered = marked
      .select(col("__id").as("__cid"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("cpos"))
      .distinct()
    // rawTokens: positions align with the (lowercased) gram side, but
    // the reassembled text keeps its original case
    val toks = df
      .select(col(idCol).as("__id"), posexplode(rawTokens(col(textCol))))
      .withColumnRenamed("col", "tok")
    val kept = toks.join(covered,
      toks("__id") === covered("__cid") && toks("pos") === covered("cpos"),
      "left_anti")
    val cleaned = kept.groupBy(col("__id"))
      .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_tokens_kept"))
    // fully-excised (or token-free) documents surface with empty text,
    // not silently dropped — the left join + coalesce is load-bearing.
    // The totals aggregate doubles as the duplicate-id detector (the
    // Bpe.encodeViaDict lazy-raise pattern): its narrow (id, long)
    // rows shuffle on the same key as `cleaned`, so the contract check
    // costs no extra wide pass
    // null text counts as token-free (0 tokens), matching the empty
    // string — size(tokens(null)) is NULL, which would leak a NULL
    // n_tokens_removed past every coalesce and silently drop the row
    // from downstream sums (the same silent-metric class the id
    // contract raise exists for)
    df.select(col(idCol).as("__id"),
        when(col(textCol).isNull, lit(0L))
          .otherwise(size(tokens(col(textCol))).cast("long")).as("__nt"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__nrows"), max(col("__nt")).as("__nt"))
      .join(cleaned, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        // null ids raise too (not just duplicates): every internal
        // equi-join here drops a NULL key, which would silently report
        // the document as fully excised — the round-6 null-key class
        when(col("__nrows") =!= 1L || col("__id").isNull, raise_error(concat(
          lit("TextAnalysis.exciseDupSpans: duplicate or null doc id "),
          coalesce(col("__id").cast("string"), lit("NULL")),
          lit(" - ids must be unique and non-null"))))
          .otherwise(coalesce(col("clean_text"), lit(""))).as("clean_text"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        (col("__nt") - coalesce(col("n_tokens_kept"), lit(0L)))
          .as("n_tokens_removed"))
  }

  /** Top-`size` token vocabulary over the corpus: (token, n, id) with
    * ids 1..size assigned by (count desc, token asc) — id 0 is reserved
    * for OOV in [[encodeTokenIds]]. The global top-N is a distributed
    * TakeOrderedAndProject (per-partition top-k, no full sort); the
    * id-assigning window then runs over ≤ `size` rows, so its single
    * partition is bounded by the vocabulary, never the corpus. */
  def buildVocab(docs: DataFrame, textCol: String, size: Int): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(size)
      .withColumn("id",
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("int"))

  /** The stopword set Gopher's "must contain ≥ minStopHits of these"
    * rule checks (Rae et al. 2021, Appendix A). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Appendix A) —
    * the standard composite document filter for web-scale training
    * corpora. Emits the raw per-document metrics, one flag per rule,
    * and `gopher_pass` (all rules hold):
    *
    *   - `words_ok`      minWords ≤ word count ≤ maxWords
    *   - `word_len_ok`   mean word length in [minMeanWordLen, maxMeanWordLen]
    *   - `symbol_ok`     (# + "..." occurrences) / words < maxSymbolToWord
    *   - `bullet_ok`     lines starting with a bullet < maxBulletFrac
    *   - `ellipsis_ok`   lines ending with "..."/"…" < maxEllipsisFrac
    *   - `alpha_ok`      words containing a letter ≥ minAlphaFrac
    *   - `stop_ok`       ≥ minStopHits distinct [[GopherStopwords]] present
    *
    * Every flag compares SCALED exact integers (`cnt < frac · total` is
    * one double multiply of an exact int against an exact int — no
    * division), so rule outcomes are bitwise reproducible across engines
    * and partitionings; the reported ratio columns are single divisions
    * of the same exact integers. Pure per-row codegen (split/filter/
    * aggregate/regexp) — no shuffle, embarrassingly parallel at 100 TB,
    * column pruning reaches the scan. */
  def gopherQuality(df: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolToWord: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => length(l) > 0)
    val base = df
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("sum_word_len",
        aggregate(toks, lit(0L), (acc, w) => acc + length(w)))
      .withColumn("symbol_cnt",
        size(regexp_extract_all(t, lit("#|\\.\\.\\."), lit(0))).cast("long"))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("bullet_lines",
        size(filter(lines, l => l.rlike("^[-*•]"))).cast("long"))
      .withColumn("ellipsis_lines",
        size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))).cast("long"))
      .withColumn("alpha_words",
        size(filter(toks, w => w.rlike("[a-zA-Z]"))).cast("long"))
      .withColumn("stop_hits",
        size(filter(array(GopherStopwords.map(lit(_)): _*),
          w => array_contains(toks, w))).cast("long"))
    val w = greatest(col("n_words"), lit(1L))
    val nl = greatest(col("n_lines"), lit(1L))
    base
      .withColumn("mean_word_len", col("sum_word_len").cast("double") / w)
      .withColumn("words_ok",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("word_len_ok",
        col("sum_word_len") >= lit(minMeanWordLen) * w &&
          col("sum_word_len") <= lit(maxMeanWordLen) * w)
      .withColumn("symbol_ok", col("symbol_cnt") < lit(maxSymbolToWord) * w)
      .withColumn("bullet_ok", col("bullet_lines") < lit(maxBulletFrac) * nl)
      .withColumn("ellipsis_ok",
        col("ellipsis_lines") < lit(maxEllipsisFrac) * nl)
      .withColumn("alpha_ok", col("alpha_words") >= lit(minAlphaFrac) * w)
      .withColumn("stop_ok", col("stop_hits") >= minStopHits)
      .withColumn("gopher_pass",
        col("words_ok") && col("word_len_ok") && col("symbol_ok") &&
          col("bullet_ok") && col("ellipsis_ok") && col("alpha_ok") &&
          col("stop_ok"))
  }

  /** Encode each document's tokens as vocabulary ids (OOV → 0),
    * preserving token order — the step between cleaned text and packed
    * training sequences. Returns (idCol, token_ids array<int>); docs
    * with no tokens get an empty array.
    *
    * Shape at 100 TB: ONE corpus scan — posexplode_outer (tokenless
    * docs keep their row) → BROADCAST vocab join (the vocab is small by
    * construction) → one doc-keyed shuffle to reassemble; collect_list
    * drops the outer row's null entry, so empty docs come back as empty
    * arrays without a second scan or restore join. Never a per-token
    * scan of a map literal (element_at on a map literal is O(|vocab|)
    * per token) and never a corpus-side sort: array_sort orders each
    * doc's own (pos, id) pairs in memory. */
  def encodeTokenIds(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame =
    idsFromExploded(docs.select(col(idCol),
      posexplode_outer(tokens(col(textCol))).as(Seq("__pos", "__tok"))), idCol, vocab)

  /** Shared id-reassembly for token encoders (word-level above, BPE
    * subwords in [[Bpe.encodeToIds]]): `exploded` carries `(idCol,
    * __pos, __tok)` from a `posexplode_outer`, `vocab` is `(token, id)`.
    * Broadcast vocab join (OOV → 0), order restored by position,
    * tokenless docs (null pos) → empty array. The vocab columns are
    * aliased so a caller's idCol named "id"/"token" cannot collide. */
  private[ops] def idsFromExploded(exploded: DataFrame, idCol: String,
      vocab: DataFrame): DataFrame = {
    val v = broadcast(vocab.select(col("token").as("__tok"), col("id").as("__vid")))
    exploded
      .join(v, Seq("__tok"), "left")
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(when(col("__pos").isNotNull,
          struct(col("__pos"), coalesce(col("__vid"), lit(0)).as("tid"))))),
        s => s.getField("tid")).as("token_ids"))
  }
}
