package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transcript corpus (FIXTURES.md §1/§5): row content
  * is a pure function of the global turn id, so any parallelism level and any
  * partitioning reads the identical dataset (required for the N vs 4N
  * scaling comparison). Skew is built in: ~10% of turns land in 3 mega
  * conversations to exercise salting/AQE.
  */
object TranscriptGen {

  /** Schema per BASELINE.json input_hint:
    * (conv_id string, turn_idx int, role string, text string, tool string, ts timestamp).
    */
  def transcripts(spark: SparkSession, totalTurns: Long, nConvs: Long = 1000): DataFrame = {
    val base = spark.range(0, totalTurns, 1,
      spark.sparkContext.defaultParallelism)
    val id = col("id")
    val h = abs(xxhash64(id, lit(42)))
    // skewed conversation assignment: every 10th turn goes to one of 3 mega convs
    val conv = when(id % 10 === 0, concat(lit("mega_"), (id / 10) % 3))
      .otherwise(concat(lit("c"), h % nConvs))
    val roles = array(lit("user"), lit("assistant"), lit("system"), lit("tool"))
    val words = array(lit("alpha"), lit("beta"), lit("gamma  spaced"), lit("delta;eta;zeta"),
      lit(" padded "), lit("42.5"), lit("naïve"), lit("done"))
    val text = concat_ws(" ",
      element_at(words, (h % 8 + 1).cast("int")),
      element_at(words, ((h / 8) % 8 + 1).cast("int")),
      element_at(words, ((h / 64) % 8 + 1).cast("int")))
    val df = base.select(
      conv.as("conv_id"),
      id.as("gid"),
      element_at(roles, (id % 4 + 1).cast("int")).as("role"),
      text.as("text"),
      when(h % 5 === 0, concat(lit("tool_"), h % 7)).otherwise(lit("")).as("tool"),
      (lit(1704067200L) + id).cast("timestamp").as("ts"))
    // turn_idx: dense 0-based order within conversation (deterministic via gid)
    import org.apache.spark.sql.expressions.Window
    df.withColumn("turn_idx",
        (row_number().over(Window.partitionBy(col("conv_id")).orderBy(col("gid"))) - 1).cast("int"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"))
  }

  /** Derive a transcript-shaped table from the driver-provided `events`
    * parquet (TESTDATA.md) with pure SQL-expressible transforms, so the same
    * derivation can run in the DuckDB oracle. Deterministic: total order by
    * (ts, event_id) within each user.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(
        concat(lit("c"), col("user_id")).as("conv_id"),
        (row_number().over(w) - 1).cast("int").as("turn_idx"),
        col("event_type").as("role"),
        col("props").as("text"),
        when(col("value") > 50, concat(lit("tool_"), (col("event_id") % 5))).otherwise(lit("")).as("tool"),
        col("ts"))
  }

  /** The same derivation as [[fromEvents]], as a DuckDB CTE for oracle SQL. */
  val fromEventsSql: String =
    """transcripts AS (
      |  SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
      |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |         event_type AS role,
      |         props AS text,
      |         CASE WHEN value > 50 THEN 'tool_' || CAST(event_id % 5 AS VARCHAR) ELSE '' END AS tool,
      |         ts
      |  FROM events
      |)""".stripMargin
}
