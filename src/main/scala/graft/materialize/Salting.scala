package graft.materialize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (north rule: "skew from hot entities and
  * mega-conversations is handled explicitly with salted repartitioning").
  * Complements AQE: AQE splits skewed *shuffle* partitions at runtime;
  * salting fixes skew *before* a wide transform whose key distribution is
  * known to be pathological (mega-conversations, hot entities).
  */
object Salting {

  /** Repartition by (key, salt) so one hot key spreads over `saltBuckets`
    * partitions. Deterministic: the salt derives from a hash of the whole
    * row's stable id, not a RNG.
    */
  def repartitionSalted(df: DataFrame, key: Column, stableId: Column,
                        saltBuckets: Int, numPartitions: Int = 0): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(stableId), lit(saltBuckets)))
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    salted.repartition(n, key, col("__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase group-by for a skewed key — partial
    * aggregate on (key, salt), then final on key. `agg` must be decomposable
    * (sum/count/min/max); pass the partial and merge expressions.
    */
  def saltedCount(df: DataFrame, key: Column, stableId: Column,
                  saltBuckets: Int): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(stableId), lit(saltBuckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("key"))
      .agg(sum("__partial").as("cnt"))
  }

  /** Broadcast-salt pattern for joining a skewed fact to a small dimension:
    * explode the dimension `saltBuckets` ways so the salted fact keys match.
    */
  def saltDimension(dim: DataFrame, saltBuckets: Int): DataFrame =
    dim.withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
}
