package graft.pipeline

import graft.materialize.Salting
import graft.sources.TranscriptGen

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-time skew control (`Salting`) pinned on the generator's
  * mega-conversation model: salted repartitioning actually SPREADS a hot
  * key where plain key-repartitioning provably cannot, and the
  * salted-dimension join is semantics-preserving. Runtime-half
  * counterpart: `AqeSkewJoinSpec`.
  */
class SaltingSpec extends AnyFunSuite {
  lazy val spark = graft.mapper.TestSpark.spark
  import spark.implicits._

  private lazy val turns = TranscriptGen.transcripts(spark, 20000L)

  test("repartitionSalted spreads mega-conversations over multiple partitions, losing nothing") {
    val n = turns.count()
    val salted = Salting.repartitionSalted(turns, col("conv_id"),
      concat(col("conv_id"), lit("-"), col("turn_idx")),
      saltBuckets = 8, numPartitions = 8)
    assert(salted.count() == n)

    def spreadOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] = df
      .select(col("conv_id"), spark_partition_id().as("p"))
      .filter(col("conv_id").startsWith("mega_"))
      .groupBy("conv_id").agg(countDistinct("p").as("np"))
      .as[(String, Long)].collect().toMap

    val saltedSpread = spreadOf(salted)
    assert(saltedSpread.nonEmpty && saltedSpread.values.forall(_ > 1),
      s"mega conversations must spread across partitions: $saltedSpread")
    // the thing salting fixes: plain key-repartitioning pins each hot key
    // to exactly ONE partition no matter how large it is
    val plainSpread = spreadOf(turns.repartition(8, col("conv_id")))
    assert(plainSpread.values.forall(_ == 1), s"unsalted control: $plainSpread")
  }

  test("saltDimension join is semantics-preserving vs the plain join") {
    val dim = turns.select(col("conv_id")).distinct()
      .withColumn("label", substring(col("conv_id"), 1, 4))
    val plain = turns.join(dim, "conv_id")
      .select(col("conv_id"), col("turn_idx"), col("label"))
      .as[(String, Int, String)].collect().toSet

    val buckets = 8
    val saltedFact = turns.withColumn("__salt",
      pmod(xxhash64(concat(col("conv_id"), lit("-"), col("turn_idx"))), lit(buckets)))
    val salted = saltedFact.join(Salting.saltDimension(dim, buckets), Seq("conv_id", "__salt"))
      .select(col("conv_id"), col("turn_idx"), col("label"))
      .as[(String, Int, String)].collect().toSet
    assert(salted == plain && salted.size == plain.size)
  }
}
