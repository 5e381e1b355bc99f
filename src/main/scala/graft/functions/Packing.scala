package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: the concat-and-chunk
  * formulation used by GPT-style pretraining — documents are concatenated
  * in a stable order (by id) and the token stream is chunked at a fixed
  * `budget`, so each document lands at a deterministic (pack, offset) and
  * straddlers are split by the trainer at chunk boundaries.
  */
object Packing {

  /** Non-negative-id guard (the same loud-failure contract
    * [[DedupFunctions.dupClusters]] enforces): block math uses integer
    * division, whose floor/truncate semantics diverge on negative
    * operands — fail at the first evaluated row instead of mis-bucketing.
    * `raise_error` is codegen'd and rides the existing projection: no
    * extra action, no shuffle.
    */
  private def nonNegId(c: Column, fn: String): Column =
    when(c >= 0, c.cast("long")).otherwise(raise_error(concat(
      lit(s"$fn: ids must be non-negative, got "), c.cast("string"))))

  /** `cum_before` via the two-level distributed prefix sum, shared by
    * [[packSequences]] and [[packChunks]]. Input must carry
    * (doc_id: long non-negative, n_tok) plus any columns to pass through;
    * output adds `cum_before` and drops the internal block columns.
    *
    * The global prefix sum is the scale hazard: a bare
    * `Window.orderBy(doc_id)` funnels the corpus through ONE partition.
    * This runs the classic two-level decomposition instead: documents
    * bucket into contiguous id blocks (`blk = doc_id div blockSize` —
    * INTEGER division on longs, so ids above 2^53 cannot silently
    * mis-bucket through a double), per-block token sums aggregate map-side
    * (one tiny exchange of ~blocks×partitions partial rows), the
    * block-level exclusive cumsum runs single-partition over ONLY n_blocks
    * rows, block offsets broadcast back, and the per-document cumsum
    * windows WITHIN each block — the corpus-sized exchange is the one
    * block-keyed window shuffle, embarrassingly parallel and skew-free
    * because blocks are uniform id ranges.
    *
    * `maxBlocks` keeps the "metadata" tier honest: the block table feeds a
    * single-partition window AND a broadcast, so it must never grow to
    * data scale. Any block index ≥ `maxBlocks` raises (codegen'd, rides
    * the bucketing projection). Pick `blockSize` so
    * maxId/blockSize ≪ maxBlocks and corpus/blockSize ≫ cores — e.g.
    * 10^10 docs at blockSize 65536 is ~153k blocks (≈2.4 MB of offsets).
    */
  private def withCumBefore(toks: DataFrame, blockSize: Long,
                            maxBlocks: Long): DataFrame = {
    val bucketed = toks
      .withColumn("blk", expr(s"doc_id div $blockSize"))
      .withColumn("blk", when(col("blk") < maxBlocks, col("blk"))
        .otherwise(raise_error(concat(
          lit(s"packSequences: block index >= $maxBlocks for doc_id "),
          col("doc_id").cast("string"),
          lit(s" (blockSize=$blockSize) — raise blockSize or maxBlocks")))))
    val blockSums = bucketed.groupBy("blk").agg(sum("n_tok").as("bsum"))
    // n_blocks rows only (<= maxBlocks, enforced) — the single-partition
    // window is deliberate here
    val wBlocks = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blockSums.select(col("blk"),
      coalesce(sum("bsum").over(wBlocks), lit(0L)).as("boff"))
    val wInBlk = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed.join(broadcast(offsets), "blk")
      .withColumn("cum_before",
        col("boff") + sum("n_tok").over(wInBlk) - col("n_tok"))
      .drop("blk", "boff")
  }

  /** Assign every document a pack id and intra-pack offset.
    *
    * Returns `(doc_id, n_tok, cum_before, pack_id, pack_offset)` where
    * `cum_before` is the global running token total over all lower-id
    * documents, `pack_id = cum_before div budget` (the chunk the document
    * STARTS in), `pack_offset = cum_before % budget`. All chunk math is
    * integer-on-longs (no double `floor` path), so token totals and ids
    * beyond 2^53 stay exact.
    *
    * Token counts use the BPE-ish [[TextFunctions.tokenCountBpe]] regex —
    * RE2-replicable, so an external engine can replay pack boundaries.
    * Ids must be non-negative (raises otherwise); block indices are
    * bounded by `maxBlocks` (raises otherwise) — see [[withCumBefore]]
    * for the two-level prefix-sum shape and sizing rules.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Long = 2048L, blockSize: Long = 4096L,
                    maxBlocks: Long = 1L << 22): DataFrame = {
    require(budget > 0, s"pack budget must be positive: $budget")
    require(blockSize > 0, s"block size must be positive: $blockSize")
    require(maxBlocks > 0, s"max blocks must be positive: $maxBlocks")
    val toks = df.select(nonNegId(col(idCol), "packSequences").as("doc_id"),
      TextFunctions.tokenCountBpe(col(textCol)).as("n_tok"))
    withCumBefore(toks, blockSize, maxBlocks)
      .withColumn("pack_id", expr(s"cum_before div $budget"))
      .select(col("doc_id"), col("n_tok"), col("cum_before"),
        col("pack_id"), (col("cum_before") % budget).as("pack_offset"))
  }

  /** Emit the packed chunks themselves: each document explodes into one
    * row per `budget`-sized pack it overlaps, carrying the token slice
    * that lands in that pack — the straddler split a trainer consumes.
    *
    * Returns `(doc_id, pack_id, slice_start, slice_len, pack_offset,
    * chunk_text)`: `slice_start` is the 0-based token offset WITHIN the
    * document, `pack_offset` the 0-based position of the slice WITHIN the
    * pack (nonzero only for the document's first pack), and `chunk_text`
    * the space-joined token slice under the same RE2-replicable
    * [[TextFunctions.BpeTokenPattern]] tokenizer the prefix sum counts
    * with, so an external engine replays the exact slices. Zero-token
    * documents occupy no chunk and emit nothing.
    *
    * Scale shape: everything after [[withCumBefore]] is map-only — the
    * explode is `sequence(first_pack, last_pack)`, BOUNDED at
    * n_tok/budget + 1 rows per document (a document spans that many packs
    * by construction), so no skew-prone flatten and no extra exchange
    * beyond the prefix sum's audited three.
    */
  def packChunks(df: DataFrame, idCol: String, textCol: String,
                 budget: Long = 2048L, blockSize: Long = 4096L,
                 maxBlocks: Long = 1L << 22): DataFrame = {
    require(budget > 0, s"pack budget must be positive: $budget")
    require(blockSize > 0, s"block size must be positive: $blockSize")
    require(maxBlocks > 0, s"max blocks must be positive: $maxBlocks")
    val toks = df.select(nonNegId(col(idCol), "packChunks").as("doc_id"),
      regexp_extract_all(col(textCol), lit(TextFunctions.BpeTokenPattern),
        lit(0)).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
    withCumBefore(toks, blockSize, maxBlocks)
      .filter(col("n_tok") > 0)
      .withColumn("first_pack", expr(s"cum_before div $budget"))
      .withColumn("last_pack", expr(s"(cum_before + n_tok - 1) div $budget"))
      .withColumn("pack_id", explode(sequence(col("first_pack"), col("last_pack"))))
      .withColumn("slice_start", greatest(col("pack_id") * budget - col("cum_before"), lit(0L)))
      .withColumn("slice_end", least(col("n_tok"), (col("pack_id") + 1) * budget - col("cum_before")))
      .select(col("doc_id"), col("pack_id"), col("slice_start"),
        (col("slice_end") - col("slice_start")).as("slice_len"),
        greatest(col("cum_before") - col("pack_id") * budget, lit(0L)).as("pack_offset"),
        array_join(slice(col("toks"), (col("slice_start") + 1).cast("int"),
          (col("slice_end") - col("slice_start")).cast("int")), " ").as("chunk_text"))
  }
}
