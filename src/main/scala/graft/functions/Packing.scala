package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: the concat-and-chunk
  * formulation used by GPT-style pretraining — documents are concatenated
  * in a stable order (by id) and the token stream is chunked at a fixed
  * `budget`, so each document lands at a deterministic (pack, offset) and
  * straddlers are split by the trainer at chunk boundaries.
  */
object Packing {

  /** Assign every document a pack id and intra-pack offset.
    *
    * Returns `(doc_id, n_tok, cum_before, pack_id, pack_offset)` where
    * `cum_before` is the global running token total over all lower-id
    * documents, `pack_id = cum_before / budget` (the chunk the document
    * STARTS in), `pack_offset = cum_before % budget`.
    *
    * The global prefix sum is the scale hazard: a bare
    * `Window.orderBy(doc_id)` funnels the corpus through ONE partition.
    * This runs the classic two-level distributed prefix sum instead:
    * documents bucket into contiguous id blocks (`blk = doc_id /
    * blockSize`), per-block token sums aggregate map-side (one tiny
    * exchange of ~blocks×partitions partial rows), the block-level
    * exclusive cumsum runs single-partition over ONLY n_blocks rows, block
    * offsets broadcast back, and the per-document cumsum windows WITHIN
    * each block — the corpus-sized exchange is the one block-keyed window
    * shuffle, embarrassingly parallel and skew-free because blocks are
    * uniform id ranges. Pick `blockSize` so corpus/blockSize ≫ cores at
    * the target scale.
    *
    * Token counts use the BPE-ish [[TextFunctions.tokenCountBpe]] regex —
    * RE2-replicable, so an external engine can replay pack boundaries.
    * Ids must be non-negative (block math uses floor division).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Long = 2048L, blockSize: Long = 4096L): DataFrame = {
    require(budget > 0, s"pack budget must be positive: $budget")
    require(blockSize > 0, s"block size must be positive: $blockSize")
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokenCountBpe(col(textCol)).as("n_tok"),
      floor(col(idCol) / blockSize).cast("long").as("blk"))
    val blockSums = toks.groupBy("blk").agg(sum("n_tok").as("bsum"))
    // n_blocks rows only — the single-partition window is deliberate here
    val wBlocks = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blockSums.select(col("blk"),
      coalesce(sum("bsum").over(wBlocks), lit(0L)).as("boff"))
    val wInBlk = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    toks.join(broadcast(offsets), "blk")
      .select(col("doc_id"), col("n_tok"),
        (col("boff") + sum("n_tok").over(wInBlk) - col("n_tok")).as("cum_before"))
      .select(col("doc_id"), col("n_tok"), col("cum_before"),
        floor(col("cum_before") / budget).cast("long").as("pack_id"),
        (col("cum_before") % budget).as("pack_offset"))
  }
}
