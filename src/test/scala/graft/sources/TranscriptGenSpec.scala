package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The determinism property underpinning the N vs 4N scaling claim
  * (FIXTURES.md §5): corpus content is a pure function of the global turn
  * id, so every parallelism level and partitioning reads the identical
  * dataset; and the per-turn invariant ((conv_id, turn_idx) is a key) holds.
  */
class TranscriptGenSpec extends AnyFunSuite {
  lazy val spark = graft.mapper.TestSpark.spark

  test("generator is partitioning-invariant") {
    val a = TranscriptGen.transcripts(spark, 5000, nConvs = 37)
      .repartition(3)
    val b = TranscriptGen.transcripts(spark, 5000, nConvs = 37)
      .repartition(13)
    assert(a.count() == 5000)
    // set-difference both ways == empty ⇒ identical multisets (rows unique by key)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("(conv_id, turn_idx) is a key and turn_idx is dense from 0") {
    val df = TranscriptGen.transcripts(spark, 3000, nConvs = 11)
    val dup = df.groupBy("conv_id", "turn_idx").count().filter(col("count") > 1).count()
    assert(dup == 0)
    val perConv = df.groupBy("conv_id")
      .agg(count(lit(1)).as("n"), min("turn_idx").as("lo"), max("turn_idx").as("hi"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(perConv.count() == 0)
  }

  test("skew is present: mega conversations dominate") {
    val df = TranscriptGen.transcripts(spark, 10000, nConvs = 100)
    val mega = df.filter(col("conv_id").startsWith("mega_")).count()
    assert(mega == 1000) // every 10th turn
    val biggest = df.groupBy("conv_id").count().orderBy(col("count").desc)
      .limit(1).collect()(0)
    assert(biggest.getString(0).startsWith("mega_"))
  }

  test("events-derived transcripts satisfy the per-turn invariant") {
    val tr = TranscriptGen.fromEvents(spark, "/root/testdata/sf0.001")
    assert(graft.validate.Validations.turnTextConsistency(tr).count() == 0)
    assert(tr.groupBy("conv_id", "turn_idx").count().filter(col("count") > 1).count() == 0)
  }
}
