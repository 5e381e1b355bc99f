package graft.materialize

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Graph materialization + checkpoint/resume (north_rule: "graph
  * materialization as sorted, deduplicated (subj, pred, obj) tables …
  * resumable from checkpoint with per-partition lineage + metrics").
  *
  * The container ships no Iceberg runtime, so the snapshot layer is
  * parquet-backed with an explicit stage manifest (documented divergence,
  * SURVEY.md §7.5): each stage directory carries `_MANIFEST.json` recording
  * row count + timestamp; `lineage/` holds per-partition row counts. On a
  * real cluster the same API maps 1:1 onto Iceberg snapshot ids.
  */
object GraphWriter {

  /** Two-stage dedup + sort + write (SURVEY.md §2.8): `dropDuplicates` over
    * ALL columns plans as a group-only hash aggregate — the partial
    * (map-side) stage dedups before its own exchange, so the shuffle
    * carries ~distinct rows. (Round 1 repartitioned explicitly first — the
    * user exchange shipped every duplicate AND blocked the partial — and
    * deduped on (s,p,o) only, which forced first()-carrier SortAggregates
    * for the remaining columns; full-row distinct is also the RDF-correct
    * key, since identical (s,p,o) strings with different lang/datatype are
    * different statements.) `sortWithinPartitions` then sorts the
    * agg-partitioned output per file — the ordering guarantee Iceberg
    * sorted writes give at scale; no global orderBy range exchange.
    */
  def writeTriples(triples: DataFrame, path: String, partitions: Int = 0,
                   metrics: Map[String, Long] = Map.empty): Unit = {
    val spark = triples.sparkSession
    val deduped0 = triples.dropDuplicates()
    val deduped =
      (if (partitions > 0) deduped0.repartition(partitions) else deduped0)
        .sortWithinPartitions("subj", "pred", "obj")
    deduped.write.mode(SaveMode.Overwrite).parquet(path)
    writeLineage(spark, path, metrics)
  }

  private def writeLineage(spark: SparkSession, path: String,
                           metrics: Map[String, Long] = Map.empty): Unit = {
    val written = spark.read.parquet(path)
    val lineage = written
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"),
           min(col("subj")).as("min_subj"), max(col("subj")).as("max_subj"))
    lineage.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path.lineage")
    val total = written.count()
    // run metrics (e.g. ValidateGate severity counts) ride in the manifest so
    // a resume can see whether the producing run was clean
    val metricsJson =
      if (metrics.isEmpty) ""
      else metrics.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString(""","metrics":{""", ",", "}")
    val manifest = s"""{"path":"$path","rows":$total,"stage_complete":true$metricsJson}"""
    Files.writeString(Paths.get(s"${dirOf(path)}/_MANIFEST_${nameOf(path)}.json"), manifest)
  }

  private def dirOf(p: String) = Option(Paths.get(p).getParent).map(_.toString).getOrElse(".")
  private def nameOf(p: String) = Paths.get(p).getFileName.toString

  /** Checkpoint-or-compute: if `path`'s manifest exists, resume by reading
    * it back; else compute, materialize with lineage, and return the
    * re-read (so downstream stages cut lineage at the stage boundary).
    */
  def stage(spark: SparkSession, path: String)(compute: => DataFrame): DataFrame = {
    val manifest = Paths.get(s"${dirOf(path)}/_MANIFEST_${nameOf(path)}.json")
    if (Files.exists(manifest)) spark.read.parquet(path)
    else {
      compute.write.mode(SaveMode.Overwrite).parquet(path)
      writeLineage(spark, path)
      spark.read.parquet(path)
    }
  }

  /** Render triples as canonical N-Triples lines (for golden-file diffs).
    * Escapes the full N-Triples string-literal set: backslash, quote, LF,
    * CR and TAB (round 1 missed \r/\t — a carriage return in a literal
    * produced an invalid line).
    */
  def toNTriples(triples: DataFrame): DataFrame = {
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
        lit("\\\\"), lit("\\\\\\\\")), lit("\""), lit("\\\\\"")), lit("\n"), lit("\\\\n")),
        lit("\r"), lit("\\\\r")), lit("\t"), lit("\\\\t"))
    val term = (c: org.apache.spark.sql.Column) =>
      when(c.startsWith("_:"), c).otherwise(concat(lit("<"), c, lit(">")))
    val objTerm =
      when(col("obj_iri"), term(col("obj")))
        .otherwise(concat(
          lit("\""), esc(col("obj")), lit("\""),
          when(col("lang").isNotNull, concat(lit("@"), col("lang")))
            .when(col("dtype").isNotNull, concat(lit("^^<"), col("dtype"), lit(">")))
            .otherwise(lit(""))))
    triples.select(concat(
      term(col("subj")), lit(" "), term(col("pred")), lit(" "), objTerm, lit(" .")).as("ntriple"))
  }
}
