package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer learning and encoding
  * (Sennrich et al. 2016) — the subword-vocabulary step of a training-data
  * pipeline, complementing the word-level [[TextAnalysis.buildVocab]].
  *
  * Learning runs on the word-frequency DICTIONARY, not the corpus: the
  * corpus is read once to count words (one hash aggregate with map-side
  * combine over exploded tokens), and every merge iteration is a narrow
  * `(left, right, weight)` aggregate over the vocabulary-sized dict plus a
  * driver-side argmax of one row (`TakeOrderedAndProject`, no global sort).
  * At 100 TB the dict is vocab-sized (millions of rows, not billions), so
  * k merges cost k tiny shuffles after the single corpus pass. Encoding is
  * embarrassingly parallel: a per-row chain of literal `replace` calls, no
  * shuffle at all.
  *
  * Determinism, cross-engine: a word's working form wraps every symbol
  * in single spaces, so adjacent symbols are separated by TWO spaces and
  * the word by one sentinel space per end (`" h  e  l  l  o "`). Applying
  * merge `(l, r)` is `replace(form, " l  r ", " lr ")`: each occurrence
  * consumes only its own wrapper characters, so back-to-back occurrences
  * of the same pair all merge in ONE left-to-right pass — `"aaaa"` with
  * merge `(a,a)` becomes `[aa, aa]`, exactly Sennrich's
  * lookaround-regex semantics (a single-space form would under-merge
  * runs: the shared separator is consumed by the first match). Literal
  * `replace` scans left-to-right non-overlapping identically in Java and
  * DuckDB, which makes the greedy merge order (and therefore the whole
  * learned table) reproducible by the oracle. Pair weights are exact
  * integer sums; ties break on `(left, right)` lexicographically —
  * ASCII-only symbols compare identically everywhere. Learning is scoped
  * to lowercase-ASCII words (`^[a-z]+$`): multi-byte codepoints would hit
  * the Java-vs-utf8proc case/char divergences documented in CLAUDE.md,
  * and production BPE is byte-level anyway.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  private val AsciiWord = "^[a-z]+$"

  /** `" h  e  l  l  o "` — every symbol wrapped in single spaces. */
  private def spaced(w: Column): Column =
    concat(lit(" "), rtrim(regexp_replace(w, "(.)", "$1  ")), lit(" "))

  /** Word-frequency dict of the learnable (lowercase-ASCII) words:
    * `(word, freq, repr)` where `repr` starts as spaced characters. */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike(AsciiWord))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("repr", spaced(col("word")))

  /** Adjacent-symbol pair weights of a dict state: `(left, right, weight)`.
    * One narrow aggregate; words of one symbol contribute nothing. The
    * symbol array is bound once OUTSIDE the pair lambda (the
    * HOF-blocks-CSE trap — see CLAUDE.md / `Dedup.bindOnce`). */
  private def pairWeights(dict: DataFrame): DataFrame =
    dict
      .select(col("freq"), explode(Dedup.bindOnce(split(trim(col("repr")), "  ")) { syms =>
        when(size(syms) < 2, array().cast("array<struct<l:string,r:string>>"))
          .otherwise(transform(sequence(lit(0), size(syms) - 2),
            i => struct(element_at(syms, i + 1).as("l"), element_at(syms, i + 2).as("r"))))
      }).as("pair"))
      .select(col("pair.l").as("left_sym"), col("pair.r").as("right_sym"), col("freq"))
      .groupBy(col("left_sym"), col("right_sym"))
      .agg(sum(col("freq")).as("pair_count"))

  /** One literal merge application on a spaced form (one pass merges
    * every occurrence, including back-to-back runs — wrappers overlap
    * only on characters the pattern does not consume). */
  private def applyMerge(form: Column, l: String, r: String): Column =
    call_function("replace", form, lit(s" $l  $r "), lit(s" $l$r "))

  /** Learn `numMerges` BPE merges from the corpus. Driver loop of
    * `numMerges` argmax steps (each an eager one-row top-1, like the
    * k-means Lloyd loop); the dict's lineage — one `replace` per applied
    * merge — is cut every 8 merges. */
  def learn(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    var dict = Lineage.cut(wordDict(docs, textCol))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = pairWeights(dict)
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word fused to one symbol
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, c)
        dict = dict.withColumn("repr", applyMerge(col("repr"), l, r))
        if (rank % 8 == 0) dict = Lineage.cut(dict)
        rank += 1
      }
    }
    merges.result()
  }

  /** Learned merges as a DataFrame `(merge_rank, left_sym, right_sym,
    * pair_count)` — the persistable tokenizer artifact. */
  def learnTable(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    import spark.implicits._
    learn(docs, textCol, numMerges)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** Rehydrate a merge list from a persisted [[learnTable]] frame (e.g.
    * written with `Dump.writeDistributed(t, path)` and read back) — the
    * tokenizer artifact is tiny (numMerges rows), so this collect is a
    * metadata read, not a data pass. */
  def mergesFrom(table: DataFrame): Seq[Merge] =
    table.select(col("merge_rank"), col("left_sym"), col("right_sym"), col("pair_count"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq

  /** Symbol inventory of a merge list: ids 1–26 are `a`–`z`, id
    * `26 + rank` is merge `rank`'s output symbol; 0 is reserved for
    * everything else (non-learnable tokens). Two merges can produce the
    * same string (e.g. `(a,bc)` and `(ab,c)`) — the lowest id wins, so
    * the symbol→id map is a function. */
  def vocab(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val rows = ('a' to 'z').zipWithIndex.map { case (c, i) => (i + 1, c.toString) } ++
      merges.sortBy(_.rank).map(m => (26 + m.rank, m.left + m.right))
    // dedupe on the driver — 26 + numMerges rows never justify a shuffle
    rows.groupBy(_._2).map { case (sym, xs) => (xs.map(_._1).min, sym) }
      .toSeq.sortBy(_._1).toDF("id", "symbol")
  }

  /** Encode to training-ready id sequences: `(idCol, token_ids
    * array<int>)` — [[encodeViaDict]]'s subwords joined against the
    * broadcast [[vocab]] (unknown → 0), order preserved, tokenless docs
    * → empty. Same reassembly shape as `TextAnalysis.encodeTokenIds`. */
  def encodeToIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    TextAnalysis.idsFromExploded(
      encodeViaDict(docs, idCol, textCol, merges)
        .select(col(idCol), posexplode_outer(col("subwords")).as(Seq("__pos", "__tok"))),
      idCol,
      vocab(docs.sparkSession, merges).select(col("symbol").as("token"), col("id")))

  /** Segment `textCol` into subword tokens with a learned merge list:
    * `(idCol, subwords array<string>)`. Learnable words fold through the
    * merge chain in rank order; other tokens (digits, punctuation, mixed)
    * pass through atomically. Pure per-row codegen — no joins, no
    * shuffles — BUT the chained-`replace` expression tree is linear in
    * the merge count and re-runs the whole chain on every token
    * OCCURRENCE: use only for small merge tables (≲64). The production
    * path is [[encodeViaDict]]; `BpeSpec`'s mixed-corpus parity test
    * pins them equal. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val sorted = merges.sortBy(_.rank)
    val segmented = transform(TextAnalysis.tokens(col(textCol)), w =>
      when(w.rlike(AsciiWord),
        split(trim(sorted.foldLeft(spaced(w))((f, m) => applyMerge(f, m.left, m.right))), "  "))
        .otherwise(array(w)))
    docs.select(col(idCol), flatten(segmented).as("subwords"))
  }

  /** Production-scale encode — same output contract as [[encode]]
    * (`(idCol, subwords array<string>)`, bitwise-identical results), but
    * shaped for real merge tables and 100 TB corpora:
    *
    *  1. the DISTINCT learnable-word dictionary is segmented ONCE through
    *     the merge chain (vocab-sized frame — merges amortize over
    *     distinct words, not token occurrences; Zipf makes this ~100–1000×
    *     less segmentation work than the per-occurrence fold), via the
    *     [[graft.functions.BpeSegment]] kernel — a loop, not an
    *     expression tree, so codegen stays constant-size at 32k merges
    *     where the chained-`replace` fold falls back to interpretation;
    *  2. each document's tokens broadcast-join to their subword arrays
    *     (the dict is words × avg-bytes — tens of MB at a 1M vocab;
    *     pass `broadcastDict = false` to let the planner shuffle-join a
    *     larger-than-broadcast dictionary);
    *  3. subwords reassemble in token order (position sort inside one
    *     hash aggregate), non-learnable tokens passing through atomically.
    *
    * Costs one distinct + one join + one aggregate shuffle vs [[encode]]'s
    * zero — the price of dict amortization, paid in narrow rows.
    *
    * CONTRACT: `idCol` must uniquely identify rows (the same contract as
    * every id-keyed op in this library — reassembly groups on it).
    * Duplicate ids raise a typed error at execution rather than
    * interleaving two documents' tokens; a duplicate-id corpus belongs
    * on [[encode]] (per-row, no grouping). [[encodeToIds]] inherits the
    * same contract. */
  def encodeViaDict(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], broadcastDict: Boolean = true): DataFrame = {
    val reserved = Seq("__notext", "__pos", "__word", "__subs", "__cnt", "__maxp", "__items")
    require(!reserved.contains(idCol),
      s"encodeViaDict: idCol $idCol collides with an internal column name")
    val dict = segmentedDict(docs, textCol, merges)
    val dictSide = if (broadcastDict) broadcast(dict) else dict
    docs
      .select(col(idCol), col(textCol).isNull.as("__notext"),
        posexplode_outer(TextAnalysis.tokens(col(textCol))).as(Seq("__pos", "__word")))
      .join(dictSide, Seq("__word"), "left")
      .groupBy(col(idCol))
      .agg(
        // duplicate-id detection: ONE input row contributes positions
        // 0..n-1 (so count(*) = max(pos)+1) or a single null-pos marker
        // (count(*) = 1, max null); two rows sharing an id make the
        // counts ADD while the max stays at the longer row's n-1, so
        // count(*) == coalesce(max(pos)+1, 1) holds iff the group is one
        // row — an exact detector from plain count/max (a countDistinct
        // here forces Spark's two-exchange distinct-agg expansion), and
        // a TYPED error instead of silently interleaving two documents'
        // token arrays. (A per-row discriminator cannot fix this
        // distributedly: any synthetic row id is unstable under partial
        // stage re-execution — see Mutations' MIID note. Duplicate-id
        // corpora belong on [[encode]], a pure per-row projection.)
        count(lit(1)).as("__cnt"),
        max(col("__pos")).as("__maxp"),
        max(col("__notext")).as("__notext"),
        collect_list(when(col("__pos").isNotNull,
          struct(col("__pos"), coalesce(col("__subs"), array(col("__word"))).as("subs"))))
          .as("__items"))
      .select(col(idCol),
        when(col("__cnt") =!= coalesce(col("__maxp").cast("long") + 1L, lit(1L)),
          raise_error(concat(
          lit(s"Bpe.encodeViaDict: duplicate rows for $idCol="), col(idCol).cast("string"),
          lit(" - ids must be unique (use Bpe.encode for duplicate-id corpora)"))))
        // null text → null subwords (the [[encode]] contract);
        // empty/tokenless text → empty array
        .otherwise(when(col("__notext"), lit(null))
          .otherwise(flatten(transform(array_sort(col("__items")),
            s => s.getField("subs"))))).as("subwords"))
  }

  /** The ONE distinct-word segmented dictionary both [[encodeViaDict]]
    * and [[fertilityReport]] join against: learnable ([a-z]+) words
    * segmented once through the merge chain via the
    * [[graft.functions.BpeSegment]] kernel — `(__word, __subs)`. */
  private def segmentedDict(docs: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right))
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__word"))
      .filter(col("__word").rlike(AsciiWord))
      .distinct()
      .withColumn("__subs",
        graft.functions.BpeSegment.segment(col("__word"), pairs))
  }

  /** Per-document tokenizer-fertility report — the "how well does this
    * tokenizer fit this corpus" health check run before committing a
    * vocabulary to a training run: `n_words` (whitespace tokens),
    * `n_chars` (codepoints across those tokens), `n_subwords` (pieces
    * after the learned merges; non-[a-z]+ words fall back to one piece,
    * the [[encodeViaDict]] contract), `fertility_centi` (subwords per
    * 100 words) and `cps_centi` (chars per 100 subwords) — all exact
    * integer arithmetic (truncating division), so the report is
    * bit-reproducible at any parallelism and DuckDB replays it.
    *
    * Same dict-join plan as [[encodeViaDict]]: the per-WORD segment
    * count is computed once on the (tiny, broadcast) distinct-word dict
    * and joined back, so the corpus pays one scan + one narrow
    * aggregate — no per-document re-segmentation. Documents with no
    * tokens (null/empty text) are omitted; duplicate ids raise typed
    * (two documents' stats silently summing is the id-grouped-operator
    * hazard). */
  def fertilityReport(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], broadcastDict: Boolean = true): DataFrame = {
    val reserved = Seq("__pos", "__word", "__nsubs", "__cnt", "__maxp",
      "__chars", "__subs")
    require(!reserved.contains(idCol),
      s"fertilityReport: idCol $idCol collides with an internal column name")
    val dict = segmentedDict(docs, textCol, merges)
      .select(col("__word"), size(col("__subs")).as("__nsubs"))
    val dictSide = if (broadcastDict) broadcast(dict) else dict
    docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__pos", "__word")))
      .join(dictSide, Seq("__word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__cnt"), max(col("__pos")).as("__maxp"),
        sum(length(col("__word")).cast("long")).as("__chars"),
        sum(coalesce(col("__nsubs").cast("long"), lit(1L))).as("__subs"))
      .select(col(idCol),
        // the encodeViaDict duplicate-id detector: one doc contributes
        // positions 0..n-1, so count(*) == max(pos)+1 iff the group is
        // a single document
        when(col("__cnt") =!= col("__maxp").cast("long") + 1L,
          raise_error(concat(
            lit(s"Bpe.fertilityReport: duplicate rows for $idCol="),
            col(idCol).cast("string"), lit(" - ids must be unique"))))
          .otherwise(col("__cnt")).as("n_words"),
        col("__chars").as("n_chars"), col("__subs").as("n_subwords"),
        call_function("div", col("__subs") * 100L, col("__cnt"))
          .as("fertility_centi"),
        call_function("div", col("__chars") * 100L, col("__subs"))
          .as("cps_centi"))
  }

}
