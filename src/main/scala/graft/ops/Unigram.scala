package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM (SentencePiece-style) subword tokenizer —
  * the second mainstream subword trainer next to [[Bpe]] (Kudo 2018:
  * seed a large candidate vocabulary, EM-estimate piece probabilities
  * under the unigram language model, prune to the target size; encode
  * = min-cost segmentation). Like BPE here, learning runs on the
  * word-frequency DICTIONARY: the corpus is read once to count words,
  * every later pass is vocabulary-sized.
  *
  * Exact-arithmetic variant (the repo envelope; the t08 `logIdf` /
  * t36 DSIR precedent): piece scores are integer INVERSE-FREQUENCY
  * costs `cost = (T·Scale) div (c+1)` with `T = Σ(c+1)` — monotone in
  * −log(p) = −log((c+1)/T), so min-cost segmentation prefers the same
  * high-probability pieces, while every comparison stays exact Long
  * arithmetic an independent engine replays bit-for-bit (a true −log
  * variant would hang the gate on cross-engine transcendental ulps).
  * The +1 smoothing keeps never-used alphabet pieces finite — they are
  * the coverage floor that makes every learnable word segmentable.
  * EM is HARD (Viterbi counts, not expected counts): each round
  * re-segments the dict under current costs (one kernel pass —
  * [[graft.functions.UnigramSegment]], model as array literals),
  * recounts piece uses weighted by word frequency (one narrow
  * aggregate + a model-sized collect), drops unused multi-character
  * pieces, keeps the best `vocabSize − |alphabet|` by (count, piece)
  * and re-costs. Fixed `iterations` rounds — both engines run exactly
  * the same waves (the waterfilling/unrolled-oracle contract), so
  * convergence is a quality concern, never a determinism one.
  *
  * Learning scope: lowercase-ASCII words of length ≤ `maxWordLen`
  * (the [[Bpe]] scope plus a length cap — the cap is what bounds the
  * oracle's unrolled DP waves; longer words pass through encoding
  * atomically, like every non-learnable token).
  *
  * Tie-breaks, all engine-portable: segmentation prefers min cost
  * then the LONGEST piece; seeding and pruning rank by (count DESC,
  * piece ASC) — ASCII-only strings compare identically everywhere.
  */
object Unigram {

  /** Fixed-point scale of the integer cost surrogate. */
  val Scale: Long = 1000000L

  private val AsciiWord = "^[a-z]+$"

  final case class Piece(piece: String, count: Long, cost: Long)

  /** Learnable word-frequency dict: `(word, freq)`, occurrences
    * counted over [[TextAnalysis.tokens]]. */
  def wordDict(docs: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike(AsciiWord) && length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** All substrings of length 1..maxPieceLen, one entry per occurrence
    * position (so `"aaa"` yields `a` three times — occurrence-weighted
    * seed counts, the standard unigram seeding). */
  private def substringsOf(w: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(w)), s =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(w) - s + 1)),
        l => w.substr(s, l))))

  /** Integer costs for a (piece, count) vocabulary: `(T·Scale) div
    * (c+1)` with `T = Σ(c+1)`; typed raise before the arithmetic can
    * overflow anywhere on the value path (cost ≤ T·Scale and a DP sum
    * adds ≤ maxWordLen of them — the r8 trace-the-whole-path rule). */
  private[ops] def costsOf(vocab: Seq[(String, Long)],
      maxWordLen: Int): Seq[(String, Long)] = {
    val t = vocab.map(_._2 + 1L).sum
    require(t <= Long.MaxValue / Scale / (maxWordLen + 1),
      s"Unigram: total smoothed count $t overflows the cost scale — " +
        s"shrink Scale or the seed vocabulary")
    vocab.map { case (p, c) => (p, t * Scale / (c + 1L)) }
      .sortBy(_._1)
  }

  /** Learn a unigram piece vocabulary from the corpus. Driver loop of
    * `iterations` hard-EM rounds; every collect is model-sized (the
    * k-means / BPE-argmax class). Returns pieces with their final
    * Viterbi counts and costs, sorted by piece. */
  def learn(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 8, maxWordLen: Int = 16, seedMulti: Int = 200,
      iterations: Int = 2): Seq[Piece] = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(maxPieceLen >= 1 && maxPieceLen <= maxWordLen,
      s"maxPieceLen $maxPieceLen not in [1, $maxWordLen]")
    require(maxWordLen >= 1 && maxWordLen <= 64,
      s"maxWordLen $maxWordLen not in [1, 64] (bounds the oracle's DP unroll)")
    require(seedMulti >= 0 && iterations >= 1, "seedMulti/iterations")
    val dict = Lineage.cut(wordDict(docs, textCol, maxWordLen))
    val seeds = dict
      .select(col("freq"),
        explode(substringsOf(col("word"), maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .persist()
    var vocab: Seq[(String, Long)] =
      try {
        // the alphabet (all length-1 substrings) is the coverage floor:
        // always in the vocabulary, never pruned
        val chars = seeds.filter(length(col("piece")) === 1)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        val multi = seeds.filter(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece")).limit(seedMulti)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        chars ++ multi
      } finally { seeds.unpersist(); () }
    // a corpus with no learnable words must fail HERE with a corpus-
    // level message, not deep in the EM loop with the kernel's
    // empty-model require
    require(vocab.nonEmpty,
      "Unigram.learn: no learnable words in the corpus (lowercase-ASCII " +
        s"words of length <= $maxWordLen)")
    val nChars = vocab.count(_._1.length == 1)
    var it = 0
    while (it < iterations) {
      val costs = costsOf(vocab, maxWordLen)
      val counts = dict
        .select(col("freq"), explode(graft.functions.UnigramSegment
          .segment(col("word"), costs)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val chars = vocab.filter(_._1.length == 1)
        .map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
      val multi = vocab.filter(_._1.length > 1)
        .flatMap { case (p, _) => counts.get(p).map(c => (p, c)) }
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(vocabSize - nChars, 0))
      vocab = chars ++ multi
      it += 1
    }
    val costs = costsOf(vocab, maxWordLen).toMap
    vocab.map { case (p, c) => Piece(p, c, costs(p)) }.sortBy(_.piece)
  }

  /** Learned model as a DataFrame `(piece, n_count, cost)` — the
    * persistable tokenizer artifact (model-sized). */
  def modelTable(spark: SparkSession, pieces: Seq[Piece]): DataFrame = {
    import spark.implicits._
    pieces.map(p => (p.piece, p.count, p.cost))
      .toDF("piece", "n_count", "cost")
  }

  /** Rehydrate a model from a persisted [[modelTable]] frame —
    * model-sized metadata read, like [[Bpe.mergesFrom]]. */
  def piecesFrom(table: DataFrame): Seq[Piece] =
    table.select(col("piece"), col("n_count"), col("cost")).collect()
      .map(r => Piece(r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.piece).toSeq

  /** Segment `textCol` into unigram pieces: `(idCol, pieces
    * array<string>)`. Learnable words within the length cap go through
    * the min-cost DP; everything else passes atomically (and a word
    * with an out-of-alphabet character comes back whole — the kernel's
    * unreachable contract). Pure per-row codegen, no joins; the model
    * rides as array literals. Null text → null, tokenless → empty. */
  def encodePieces(docs: DataFrame, idCol: String, textCol: String,
      model: Seq[Piece], maxWordLen: Int = 16): DataFrame = {
    val m = model.map(p => (p.piece, p.cost))
    val segmented = transform(TextAnalysis.tokens(col(textCol)), w =>
      when(w.rlike(AsciiWord) && length(w) <= maxWordLen,
        graft.functions.UnigramSegment.segment(w, m))
        .otherwise(array(w)))
    docs.select(col(idCol), flatten(segmented).as("pieces"))
  }
}
