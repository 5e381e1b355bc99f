package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity linking over emitted text (north_star: "batched mention-detection +
  * entity-link scoring via broadcast-dictionary hash joins"). No analog in
  * the reference (nearest: cross-table `valueUrl` IRIs,
  * `/root/reference/spec/data/countries.json`); designed Spark-first.
  */
object EntityLink {

  /** Detect dictionary mentions in a text column.
    *
    * Scale design: the dictionary is the small side — broadcast hash join, no
    * shuffle of the corpus. Mentions are extracted by tokenizing
    * (`split` + `posexplode`) so the join key is a single token; candidate
    * scoring is exact-match + length-normalized and fully codegen'd.
    *
    * @param corpus  rows with (`keyCol`, `textCol`)
    * @param dictionary rows with (`entity_id`, `surface`) — small
    * @return (keyCol, mention, pos, entity_id, score)
    */
  def mentions(corpus: DataFrame, dictionary: DataFrame,
               keyCol: String, textCol: String): DataFrame = {
    val toks = corpus
      .select(col(keyCol), posexplode(split(lower(col(textCol)), "[^a-z0-9]+")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 1)
    val dict = dictionary
      .select(col("entity_id"), lower(col("surface")).as("tok"))
      .dropDuplicates("tok", "entity_id")
    toks.join(broadcast(dict), Seq("tok"))
      .select(
        col(keyCol), col("tok").as("mention"), col("pos"), col("entity_id"),
        (length(col("tok")) / lit(20.0)).as("score"))
  }

  /** Candidate-match edges between rows that share a linked entity —
    * input to [[ConnectedComponents]] for canonicalization.
    * Self-joins on entity_id with pair ordering to halve the edge set.
    */
  def candidateEdges(mentionsDf: DataFrame, keyCol: String): DataFrame = {
    val a = mentionsDf.select(col("entity_id"), col(keyCol).as("src")).dropDuplicates()
    val b = mentionsDf.select(col("entity_id"), col(keyCol).as("dst")).dropDuplicates()
    a.join(b, Seq("entity_id"))
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"))
      .dropDuplicates()
  }
}

/** Iterative min-label-propagation connected components over an edge
  * DataFrame — hand-rolled (no GraphX), deterministic, checkpointed per
  * iteration so the plan lineage stays bounded (north_star
  * "canonicalization through iterative connected-components").
  *
  * Scale notes: each iteration is one shuffle (groupBy node) after a
  * symmetric edge expansion; `localCheckpoint` truncates lineage; hot
  * components behave like skewed keys and are covered by AQE skew handling.
  * Converges in O(graph diameter) iterations; `maxIterations` bounds
  * runaway chains (SURVEY.md §7.4 hard part 5).
  */
object ConnectedComponents {

  /** @param edges (src, dst) string columns
    * @return (id, component) where component = min node id in the component
    */
  def run(spark: SparkSession, edges: DataFrame, maxIterations: Int = 20): DataFrame = {
    import spark.implicits._
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates()
      .localCheckpoint()

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIterations && !converged) {
      // neighbor minimum + own label, one shuffle
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(msgs)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
