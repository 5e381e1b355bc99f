package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Executable evidence for the north rule's "AQE skew-join splitting"
  * criterion: a mega-conversation join (one conversation holding ~60% of
  * the rows — the generator's skew model, `TranscriptGen.transcripts`)
  * must come back from AQE with the skewed shuffle partition split at
  * runtime, visible as `skew=true` on the SortMergeJoin of the FINAL
  * adaptive plan. Complements `Salting` (plan-time skew control, k1) —
  * this pins the runtime half of the story.
  *
  * Thresholds are scaled to the test corpus (a few hundred KB of shuffle
  * data); on a real cluster the defaults (256 MB / factor 5) play the
  * same role.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  lazy val spark = graft.mapper.TestSpark.spark

  private val tuned = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.minPartitionNum" -> "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "800",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "800",
    "spark.sql.shuffle.partitions" -> "100",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("mega-conversation join is skew-split at runtime (skew=true in the final plan)") {
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t = graft.sources.TranscriptGen.transcripts(spark, 100000L)
      // one mega conversation + a thin uniform slice: the exact hot-key
      // shape AQE must catch (a salted-repartition fix is the PLAN-time
      // alternative; here the skew is discovered at RUNTIME). Materialized
      // to parquet first — the realistic join-two-tables shape, and the
      // window inside the generator would otherwise sit between the join
      // and its shuffle, blocking the skew-split pattern match.
      val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
      t.filter(col("conv_id").startsWith("mega_") ||
          abs(xxhash64(col("conv_id"))) % 50 === 0)
        .write.mode("overwrite").parquet(dir)
      // round-robin repartition so the join's shuffle has several map
      // tasks: AQE splits a skewed reduce partition at map-block
      // granularity, and a single-map-task shuffle (the default for a
      // file scan this small) is unsplittable no matter how skewed
      val turns = spark.read.parquet(dir).repartition(8)
      // materialize the per-conversation stats as a table as well: the
      // skew-split pattern needs BOTH join children to be sort-over-shuffle
      // (an aggregate between the sort and the shuffle blocks the rewrite)
      val statsDir = java.nio.file.Files.createTempDirectory("graft_skew_dim").toString
      turns.groupBy("conv_id").agg(count(lit(1)).as("n_turns"))
        .write.mode("overwrite").parquet(statsDir)
      val convStats = spark.read.parquet(statsDir)
      val joined = turns.join(convStats, "conv_id")
      // collect() drives THIS DataFrame's QueryExecution (count() would
      // plan a separate tree and leave joined's adaptive plan unexecuted)
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      val finalPlan = (joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }) match {
        case r: org.apache.spark.sql.execution.adaptive.ResultQueryStageExec => r.plan
        case p => p
      }
      val sizes = finalPlan.collect {
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
          s"stage ${s.id} origin=${s.shuffle.shuffleOrigin} sizes=" +
            s.mapStats.map(_.bytesByPartitionId.mkString(",")).getOrElse("none")
      }
      assert(plan.contains("skew=true"),
        s"expected a runtime skew-split SortMergeJoin; shuffle sizes:\n${sizes.mkString("\n")}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
