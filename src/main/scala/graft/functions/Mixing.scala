package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixture shaping: per-domain sampling weights and
  * per-conversation loss-mask statistics — the two knobs a pretraining /
  * SFT pipeline turns after filtering and dedup have settled WHAT is in
  * the corpus (no reference analog; designed Spark-first for the
  * transcript/documents tables).
  */
object Mixing {

  /** Temperature-scaled domain sampling weights — the standard data-mixing
    * rule (weight ∝ share^α, renormalized): α = 1 reproduces natural
    * proportions, α → 0 approaches uniform, the usual 0.2–0.5 band
    * upsamples tail domains without letting a mega-domain dominate.
    *
    * Returns `(domain, n_docs, share, weight)`, rounded to 6 decimals.
    *
    * Scale shape: ONE corpus exchange (the domain count aggregate,
    * map-side combinable); everything after runs over #domains rows —
    * metadata tier, so the two whole-frame windows are deliberately
    * single-partition. Both window sums ORDER BY domain, pinning the
    * double-summation order so the rounded weights are bit-stable across
    * runs and replayable by an external engine.
    */
  def domainWeights(df: DataFrame, domainCol: String,
                    alpha: Double): DataFrame = {
    require(alpha > 0, s"mixing temperature must be positive: $alpha")
    val whole = Window.orderBy("domain")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share", col("n_docs") / sum("n_docs").over(whole))
      .withColumn("wraw", pow(col("share"), alpha))
      .select(col("domain"), col("n_docs"),
        round(col("share"), 6).as("share"),
        round(col("wraw") / sum("wraw").over(whole), 6).as("weight"))
  }

  /** Per-conversation loss-mask statistics: SFT on agent transcripts
    * trains only on the turns whose `role` is in `trainRoles` (the rest
    * provide context with the loss masked out). Reports turn and token
    * counts on both sides of the mask plus the trainable-token fraction,
    * using the same RE2-replicable BPE-ish tokenizer the packing ops
    * count with — so downstream budget math (x13/x14) agrees with the
    * mask accounting.
    *
    * Returns `(conv_id, n_turns, n_trainable_turns, total_tokens,
    * trainable_tokens, trainable_fraction)`.
    *
    * Scale shape: one conv-keyed hash aggregate (map-side partials), all
    * counters integer-exact; the fraction is a single double division per
    * group. Mega-conversation skew lands on the same conv_id key the rest
    * of the pipeline already salts/AQE-handles.
    */
  def lossMaskStats(tr: DataFrame, trainRoles: Seq[String]): DataFrame = {
    require(trainRoles.nonEmpty, "at least one trainable role required")
    tr.select(col("conv_id"), col("role"),
        TextFunctions.tokenCountBpe(col("text")).cast("long").as("n_tok"))
      .withColumn("trainable", col("role").isin(trainRoles: _*))
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("trainable"), lit(1L)).otherwise(lit(0L))).as("n_trainable_turns"),
        sum(col("n_tok")).as("total_tokens"),
        sum(when(col("trainable"), col("n_tok")).otherwise(lit(0L))).as("trainable_tokens"))
      .withColumn("trainable_fraction",
        round(col("trainable_tokens") / greatest(col("total_tokens"), lit(1L)), 6))
  }
}
