package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window chunking for LLM training-data preparation: split each
  * document's token sequence into fixed-size windows with a configurable
  * stride (stride < window ⇒ overlapping chunks, the usual pretraining
  * shape; stride = window ⇒ disjoint).
  *
  * The whole operator is per-row Catalyst expressions
  * (`split`/`sequence`/`explode`/`slice` — whole-stage codegen, no UDFs,
  * no shuffle): chunking 100 TB is a single embarrassingly-parallel map
  * whose output row count is ≈ tokens/stride. Chunk boundaries depend
  * only on the document text, never on partitioning, so re-runs and
  * retried stages emit identical chunks (and an external engine can
  * recompute them — the gate's DuckDB oracle does).
  */
object Chunking {

  /** Original-case whitespace tokens, empties removed (chunking must
    * preserve the text verbatim — unlike [[TextAnalysis.tokens]], no
    * lower-casing). Delegates to the one canonical definition so chunk
    * boundaries can never desynchronize from excision positions. */
  def rawTokens(text: Column): Column = TextAnalysis.rawTokens(text)

  /** Explode each document into token windows.
    *
    * Chunk `i` covers tokens `[i·stride, i·stride + window)`, for every
    * `i` with `i·stride < n` — so trailing chunks clip at the document
    * end (standard pretraining practice) and a document shorter than
    * `window` still yields its one partial chunk. Documents with no
    * tokens yield no chunks.
    *
    * Output: the id column plus `chunk_idx`, `n_tokens`, `chunk_text`.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0, s"stride must be positive, got $stride")
    val toks = rawTokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      // last chunk index = floor((n-1)/stride); sequence is inclusive
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          floor((col("__n") - 1) / lit(stride)).cast("int"), lit(1))))
      .withColumn("__chunk",
        slice(col("__toks"), col("chunk_idx") * stride + 1, lit(window)))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Greedy concat-packing of sequences into fixed token-budget bins —
    * the GPT-style pretraining shape: within a shard, sequences are laid
    * end-to-end in a deterministic order and `bin_id` is the context
    * window in which each sequence STARTS (a sequence may roll over into
    * the next bin; readers treat a shard's bins as one contiguous token
    * stream).
    *
    * Shard-parallel by design: the running total is a window per shard,
    * so each shard is one task — the caller picks a shard key sized to
    * the cluster (e.g. `pmod(hash(doc_id), nShards)`, which also keeps a
    * document's chunks together). Within a shard the assignment is a
    * pure function of (order, token counts): partitioning-invariant,
    * resumable, and recomputable by an external engine (the gate's
    * DuckDB oracle does).
    *
    * Adds `bin_id` and `bin_offset` (token offset of the sequence start
    * within its bin) to the input columns. */
  def packGreedy(df: DataFrame, shardCol: Column, tokenCol: Column,
      budget: Int, orderCols: Seq[Column]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(orderCols.nonEmpty, "orderCols must order rows uniquely within a shard")
    val w = Window.partitionBy(shardCol).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__start", sum(tokenCol).over(w) - tokenCol)
      .withColumn("bin_id", floor(col("__start") / budget).cast("int"))
      .withColumn("bin_offset", (col("__start") % budget).cast("int"))
      .drop("__start")
  }
}
